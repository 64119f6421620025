package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash. (Embedding-cosine near-dup lives in
  * [[Similarity]] — it shares the vector machinery.)
  *
  * Scale design (the point at 100 TB):
  *   - exact dedup: one hash-shuffle on a 32-byte digest, never on the text.
  *   - pairwise Jaccard is O(n²) in documents — NEVER all-pairs at scale.
  *     The shingle inverted index (`shingleIndex` self-join) only pairs
  *     documents sharing ≥1 shingle; MinHash+LSH (`minhashCandidates`)
  *     reduces that further to band-bucket collisions: cost ~
  *     O(docs × bands), the standard sub-quadratic route (Broder '97,
  *     Leskovec MMDS ch.3).
  *   - SimHash: near-dup via Hamming distance on a 32-bit sketch; the
  *     4-chunk pigeonhole bucket join finds all pairs with Hamming ≤ 3
  *     without an all-pairs pass (Manku et al., WWW'07).
  *
  * Everything is Column-expression work + hash-partitioned joins/aggs — no
  * UDFs, no driver-side loops; md5 is used as the shared hash so the DuckDB
  * oracle reproduces results bit-for-bit.
  */
object Dedup {

  /** Exact duplicate groups keyed by content digest: keep-id = min doc id.
    * The groupBy shuffles 32-byte digests + ids only — at 100 TB the text
    * column is pruned from the exchange.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct word n-gram shingles of `textCol`, one row per (id, shingle).
    * Shingling is the unit for both Jaccard and MinHash.
    */
  def shingleIndex(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    // native one-pass expression; ≡ array_distinct(transform(sequence(…),
    // i -> array_join(slice(toks, i, n), " "))) with whole-text fallback,
    // minus the interpreted per-element lambda chain
    val sh = org.apache.spark.sql.graft.WordShingles.shingles(
      TextAnalysis.wsTokens(col(textCol)), n)
    df.select(col(idCol), explode(sh).as("shingle"))
  }

  /** Pairwise n-gram Jaccard over an inverted shingle index: documents
    * sharing ≥1 shingle are paired (a<b), |∩| counted, sizes joined back.
    * Output: id_a, id_b, jaccard — filter at the caller's threshold.
    */
  def jaccardPairs(shingles: DataFrame, idCol: String): DataFrame = {
    val sizes = shingles.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val a = shingles.select(col(idCol).as("id_a"), col("shingle"))
    val b = shingles.select(col(idCol).as("id_b"), col("shingle"))
    a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_inter"))
      .join(sizes.select(col(idCol).as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double")).as("jaccard"))
  }

  /** MinHash signature: sig_i = min over shingles of md5(i + ":" + shingle),
    * i ∈ [0, k). One hash-agg over the shingle index; k column-parallel mins
    * ride a single shuffle.
    */
  def minhashSignature(shingles: DataFrame, idCol: String, k: Int = 12): DataFrame =
    shingles.groupBy(col(idCol))
      .agg(
        min(md5(concat(lit("0:"), col("shingle")))).as("h0"),
        (1 until k).map(i =>
          min(md5(concat(lit(s"$i:"), col("shingle")))).as(s"h$i")): _*)

  /** LSH candidate pairs: signatures split into `bands` bands of `rows`
    * hashes; docs sharing any band bucket become candidates (a<b, distinct).
    */
  def minhashCandidates(sig: DataFrame, idCol: String, bands: Int = 3, rows: Int = 4): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|", (0 until rows).map(r => col(s"h${b * rows + r}")): _*)).as("bucket"))
    }
    val exploded = sig.select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
    val a = exploded.select(col(idCol).as("id_a"), col("band"), col("bucket"))
    val b = exploded.select(col(idCol).as("id_b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** MinHash-LSH near-dup pairs, verified: candidates from band collisions,
    * then exact Jaccard computed ONLY for candidate pairs — the shingle
    * index is first semi-join-pruned to candidate docs, so the verify
    * join touches a vanishing fraction of the corpus (this restriction is
    * the entire point of LSH at scale; verifying all co-shingle pairs would
    * re-introduce the quadratic cost LSH exists to avoid).
    */
  def minhashDedup(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 12, bands: Int = 3, threshold: Double = 0.8): DataFrame = {
    // deliberately uncached: the shingle index is cheap per-row map work
    // (recompute ≈ 3s at sf0.1) while caching 450k exploded rows costs more
    // than the two recomputes it saves — measured 11.6s cached vs 8.6s not
    val sh = shingleIndex(df, idCol, textCol, n)
    val cands = minhashCandidates(minhashSignature(sh, idCol, k), idCol, bands, k / bands)
    val candDocs = cands.select(col("id_a").as(idCol))
      .union(cands.select(col("id_b").as(idCol))).distinct()
    val shCand = sh.join(broadcast(candDocs), Seq(idCol), "left_semi")
    jaccardPairs(shCand, idCol)
      .join(cands, Seq("id_a", "id_b"), "left_semi")
      .filter(col("jaccard") >= threshold)
  }

  /** 32-bit SimHash over distinct shingles: bit b of md5's first 8 hex chars
    * votes ±1; simhash bit = sign of the vote sum. Returns (id, simhash).
    */
  def simhash(shingles: DataFrame, idCol: String): DataFrame = {
    val nib = "0123456789abcdef"
    // md5 once per shingle row; the 32 vote aggregates only slice nibbles
    // out of the precomputed hex (32 substr+instr, not 32 md5).
    val hashed = shingles.withColumn("_gm_hh", md5(col("shingle")))
    // vote_b = Σ_tokens (2*bit_b − 1); bit_b from hex nibble (b/4)+1, shift 3−b%4
    val votes = (0 until 32).map { bit =>
      val nibbleVal = expr(s"instr('$nib', substr(_gm_hh, ${bit / 4 + 1}, 1)) - 1")
      sum(shiftright(nibbleVal.cast("int"), 3 - bit % 4).bitwiseAND(1) * 2 - 1).as(s"v$bit")
    }
    hashed.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        (0 until 32).map(b =>
            when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Near-dup pairs with Hamming(simhash) ≤ `maxHamming` (< 4): pigeonhole
    * over 4 byte-chunks — any pair within Hamming 3 agrees on ≥1 chunk, so a
    * bucket join on (chunk_idx, chunk_value) finds all of them without an
    * all-pairs comparison.
    */
  def simhashPairs(sh: DataFrame, idCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4, "4-chunk pigeonhole covers Hamming <= 3")
    val chunks = (0 until 4).map(i =>
      struct(lit(i).as("ci"), shiftright(col("simhash"), i * 8).bitwiseAND(0xff).as("cv")))
    val ex = sh.select(col(idCol), col("simhash"), explode(array(chunks: _*)).as("c"))
      .select(col(idCol), col("simhash"), col("c.ci"), col("c.cv"))
    val a = ex.select(col(idCol).as("id_a"), col("simhash").as("sh_a"), col("ci"), col("cv"))
    val b = ex.select(col(idCol).as("id_b"), col("simhash").as("sh_b"), col("ci"), col("cv"))
    a.join(b, Seq("ci", "cv")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
