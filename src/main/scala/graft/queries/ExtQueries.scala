package graft.queries

import graft.Td
import graft.ext.{Bloom, Dedup, DedupIndex, Multimodal, Sampling, Similarity, TextAnalysis => TA}
import org.apache.spark.sql.functions._

/** Training-data-pipeline extension queries (BASELINE.json north-star):
  * text analysis, dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash /
  * embedding-cosine), similarity search (brute kNN + IVF ANN), multimodal
  * binary plumbing — each oracle-checked against DuckDB.
  *
  * Cross-engine parity strategy: md5 for all content hashing (identical hex
  * in both engines), strict left-fold double summation for vector math
  * (Spark `aggregate` ≡ DuckDB `list_reduce` — same rounding order, so
  * bit-identical doubles), counts cast to BIGINT on the Spark side.
  */
object ExtQueries {

  // Shared oracle CTEs: whitespace tokens and distinct 3-gram shingles.
  private val shingleCte =
    """w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(
      |         CASE WHEN len(ws) >= 3
      |           THEN list_transform(generate_series(1, len(ws)-2), i -> array_to_string(ws[i:i+2], ' '))
      |           ELSE [array_to_string(ws, ' ')] END)) AS shingle FROM w)""".stripMargin

  /** T1 — token counting: whitespace tokens, BPE-ish pieces, length stats. */
  val t1TextTokens = QueryDef(
    "t1_text_tokens",
    (s, dir) => {
      val t = col("text")
      Td(s, dir, "documents")
        .select(col("doc_id"),
          length(t).cast("long").as("n_chars_txt"),
          TA.tokenCount(t).cast("long").as("n_tokens"),
          TA.bpeTokenCount(t).cast("long").as("n_bpe"),
          TA.meanTokenLen(t).as("mean_token_len"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars_txt,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
             CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) AS BIGINT) AS n_bpe,
             CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
               / len(regexp_split_to_array(trim(text), '\s+')) AS mean_token_len
      FROM documents ORDER BY doc_id
    """),
    // sub-0.2 s at sf0.1: the Spark task-scheduling floor, zero scale
    // signal - timed coverage lives in the correctness gate; dropping it
    // from the bench preserves the compact stdout line's precision budget
    benchmark = false)
  /** T2 — quality scoring: punctuation/stopword ratios + linear score. */
  val t2TextQuality = QueryDef(
    "t2_text_quality",
    (s, dir) => {
      val t = col("text")
      Td(s, dir, "documents")
        .select(col("doc_id"),
          TA.punctCount(t).cast("long").as("n_punct"),
          TA.stopwordCount(t).cast("long").as("n_stop"),
          (TA.punctCount(t).cast("double") / greatest(length(t), lit(1)).cast("double")).as("punct_ratio"),
          (TA.stopwordCount(t).cast("double") / TA.tokenCount(t).cast("double")).as("stop_ratio"),
          TA.qualityScore(t).as("quality"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH b AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(lower(text), '[^a-z0-9\\s]')) AS BIGINT) AS n_punct,
               CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                 x -> list_contains(${sqlList(TA.Stopwords)}, x))) AS BIGINT) AS n_stop,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS n_tok,
               CAST(greatest(length(text), 1) AS DOUBLE) AS n_len
        FROM documents)
      SELECT doc_id, n_punct, n_stop,
             CAST(n_punct AS DOUBLE) / n_len AS punct_ratio,
             CAST(n_stop AS DOUBLE) / n_tok AS stop_ratio,
             0.5 * least(n_tok / 64.0, 1.0)
               + 0.5 * least((CAST(n_stop AS DOUBLE) / n_tok) * 4.0, 1.0)
               - (CAST(n_punct AS DOUBLE) / n_len) * 2.0 AS quality
      FROM b ORDER BY doc_id
    """),
    // sub-0.2 s at sf0.1: the Spark task-scheduling floor, zero scale
    // signal - timed coverage lives in the correctness gate; dropping it
    // from the bench preserves the compact stdout line's precision budget
    benchmark = false)
  /** T3 — language ID: marker-word vote per language, first-max argmax. */
  val t3LangId = QueryDef(
    "t3_lang_id",
    (s, dir) => {
      val t = col("text")
      val scoreCols = TA.LangMarkers.map { case (l, m) =>
        TA.langScore(t, m).cast("long").as(s"${l}_n")
      }
      Td(s, dir, "documents")
        .select((col("doc_id") +: scoreCols :+ TA.langId(t).as("lang_pred")): _*)
        .orderBy(col("doc_id"))
    },
    Some {
      val counts = TA.LangMarkers.map { case (l, m) =>
        s"CAST(len(list_filter(ws, x -> list_contains(${sqlList(m)}, x))) AS BIGINT) AS ${l}_n"
      }.mkString(",\n               ")
      val langs = TA.LangMarkers.map(_._1)
      val best = s"greatest(${langs.map(_ + "_n").mkString(", ")})"
      val caseArm = langs.map(l => s"WHEN ${l}_n = $best AND $best > 0 THEN '$l'").mkString(" ")
      s"""
      WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents),
      sc AS (SELECT doc_id,
               $counts
             FROM w)
      SELECT doc_id, ${langs.map(_ + "_n").mkString(", ")},
             CASE $caseArm ELSE 'und' END AS lang_pred
      FROM sc ORDER BY doc_id
    """
    },
    // sub-0.2 s at sf0.1: the Spark task-scheduling floor, zero scale
    // signal - timed coverage lives in the correctness gate; dropping it
    // from the bench preserves the compact stdout line's precision budget
    benchmark = false)
  /** T27 — paragraph-level language mix (the CCNet per-paragraph pass):
    * language-ID each `\n\n` paragraph ([[graft.ext.Paragraphs
    * .chunksBySplit]] + [[graft.ext.TextAnalysis.langId]] — t3's vote,
    * paragraph-grained), take the doc's majority language (count argmax,
    * ties by language code), and report the MINORITY fraction — the
    * mixed-language signal CCNet filters on, because a doc-level lang ID
    * happily averages an English page with embedded Spanish boilerplate
    * into "en" and ships the Spanish into an English corpus. The corpus
    * is single-line, so structure is planted (the d16 idiom): every
    * doc_id % 5 == 0 document gains one Spanish-marker paragraph. Scale
    * shape: one narrow posexplode + codegen'd marker counts riding the
    * scan, one doc-keyed count shuffle — paragraph-grained rows never
    * carry text past the langId projection.
    */
  val t27ParagraphLangmix = QueryDef(
    "t27_paragraph_langmix",
    (s, dir) => {
      val planted = Td(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 5 === 0,
          concat(col("text"), lit("\n\nel la de que y el la de")))
          .otherwise(col("text")).as("text"))
      val ch = graft.ext.Paragraphs.chunksBySplit(planted, "doc_id", "text")
        .select(col("doc_id"), TA.langId(col("chunk")).as("plang"))
      val counts = ch.groupBy(col("doc_id"), col("plang"))
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("n").desc, col("plang"))
      val major = counts.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("plang").as("majority_lang"),
          col("n").as("n_major"))
      ch.groupBy(col("doc_id")).agg(count(lit(1)).as("n_par"))
        .join(major, Seq("doc_id"))
        .select(col("doc_id"), col("n_par"), col("majority_lang"),
          (col("n_par") - col("n_major")).cast("long").as("n_minority"),
          ((col("n_par") - col("n_major")).cast("double") / col("n_par"))
            .as("mix_frac"))
        .orderBy(col("doc_id"))
    },
    Some {
      val counts = TA.LangMarkers.map { case (l, m) =>
        s"CAST(len(list_filter(ws, x -> list_contains(${sqlList(m)}, x))) AS BIGINT) AS ${l}_n"
      }.mkString(",\n               ")
      val langs = TA.LangMarkers.map(_._1)
      val best = s"greatest(${langs.map(_ + "_n").mkString(", ")})"
      val caseArm = langs.map(l => s"WHEN ${l}_n = $best AND $best > 0 THEN '$l'").mkString(" ")
      s"""
      WITH aug AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0
                 THEN text || chr(10) || chr(10) || 'el la de que y el la de'
                 ELSE text END AS t
        FROM documents),
      w AS (SELECT doc_id, string_split(t, chr(10) || chr(10)) AS ps FROM aug),
      c AS (SELECT doc_id, unnest(generate_series(1, len(ps))) AS i, ps FROM w),
      tok AS (SELECT doc_id, regexp_split_to_array(trim(ps[i]), '\\s+') AS ws FROM c),
      sc AS (SELECT doc_id,
               $counts
             FROM tok),
      lang AS (SELECT doc_id, CASE $caseArm ELSE 'und' END AS plang FROM sc),
      cnt AS (SELECT doc_id, plang, count(*) AS n FROM lang GROUP BY 1, 2),
      maj AS (SELECT doc_id, plang AS majority_lang, n AS n_major,
                row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, plang) AS rk
              FROM cnt),
      tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_par FROM lang GROUP BY 1)
      SELECT t.doc_id, t.n_par, m.majority_lang,
             CAST(t.n_par - m.n_major AS BIGINT) AS n_minority,
             CAST(t.n_par - m.n_major AS DOUBLE) / t.n_par AS mix_frac
      FROM tot t JOIN maj m ON m.doc_id = t.doc_id AND m.rk = 1
      ORDER BY t.doc_id
    """
    },
    // paragraph-grained marker counting rides the scan; sub-0.2 s at
    // sf0.1 — correctness-gated, not benched (the t2/t3 rationale)
    benchmark = false)

  /** T4 — document fingerprinting: md5 of normalized text + polynomial
    * rolling hash over character codes.
    */
  val t4Fingerprint = QueryDef(
    "t4_fingerprint",
    (s, dir) => {
      val t = col("text")
      Td(s, dir, "documents")
        .select(col("doc_id"),
          TA.fingerprintMd5(t).as("fp_md5"),
          TA.fingerprintRolling(t).as("fp_roll"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt FROM documents)
      SELECT doc_id, md5(nt) AS fp_md5,
             list_reduce(list_transform(str_split(nt, ''), x -> CAST(ascii(x) AS BIGINT)),
               (a, b) -> (a * 31 + b) % 1000000007) AS fp_roll
      FROM n ORDER BY doc_id
    """),
    // sub-0.2 s at sf0.1: the Spark task-scheduling floor, zero scale
    // signal - timed coverage lives in the correctness gate; dropping it
    // from the bench preserves the compact stdout line's precision budget
    benchmark = false)
  /** D1 — exact dedup: duplicate groups by content digest. */
  val d1DedupExact = QueryDef(
    "d1_dedup_exact",
    (s, dir) =>
      Dedup.exactGroups(Td(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("content_md5")),
    Some("""
      SELECT md5(text) AS content_md5, min(doc_id) AS keep_id, count(*) AS n_copies
      FROM documents GROUP BY 1 ORDER BY content_md5
    """))

  /** D2 — n-gram Jaccard near-dup pairs via shingle inverted index, with a
    * document-frequency cap: shingles in >6 docs (p99.9 of this corpus) are
    * boilerplate and excluded from both intersections and sizes, bounding
    * the hot-shingle self-join blowup. The cap is live at sf0.01 (4
    * shingles have df 7).
    */
  val d2DedupNgram = QueryDef(
    "d2_dedup_ngram",
    (s, dir) => {
      val sh = Dedup.shingleIndex(Td(s, dir, "documents"), "doc_id", "text", 3)
      Dedup.jaccardPairs(sh, "doc_id", maxDf = 6)
        .filter(col("jaccard") >= 0.5)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(s"""
      WITH $shingleCte,
      shf AS (SELECT * FROM sh
              WHERE shingle IN (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 6)),
      sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY 1),
      inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
                FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT id_a, id_b,
             CAST(n_inter AS DOUBLE) / CAST(x.n + y.n - n_inter AS DOUBLE) AS jaccard
      FROM inter JOIN sizes x ON id_a = x.doc_id JOIN sizes y ON id_b = y.doc_id
      WHERE CAST(n_inter AS DOUBLE) / CAST(x.n + y.n - n_inter AS DOUBLE) >= 0.5
      ORDER BY id_a, id_b
    """),
    // all-co-shingle-pairs correctness baseline — the bench covers near-dup
    // text dedup via d3_dedup_minhash (the sub-quadratic LSH scale path)
    benchmark = false)

  /** D14 — character q-gram Jaccard near-dup ([[Dedup.charShingleIndex]]):
    * the tokenizer-free shingle domain (code, URLs, CJK). All-pairs
    * co-shingle baseline like d2; the LSH scale path accepts the same
    * shingle frame unchanged (DedupPropertySpec pins the composition).
    * `substr` is char-based in both engines, so the oracle needs no
    * encoding assumption.
    */
  val d14DedupChargram = QueryDef(
    "d14_dedup_chargram",
    (s, dir) => {
      val sh = Dedup.charShingleIndex(Td(s, dir, "documents"), "doc_id", "text", q = 12)
      Dedup.jaccardPairs(sh, "doc_id", maxDf = 20)
        .filter(col("jaccard") >= 0.5)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""
      WITH sh AS (SELECT doc_id, unnest(list_distinct(
                   list_transform(generate_series(1, greatest(length(text) - 11, 1)),
                     i -> substr(text, i, 12)))) AS shingle FROM documents),
      shf AS (SELECT * FROM sh
              WHERE shingle IN (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 20)),
      sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY 1),
      inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
                FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT id_a, id_b,
             CAST(n_inter AS DOUBLE) / CAST(x.n + y.n - n_inter AS DOUBLE) AS jaccard
      FROM inter JOIN sizes x ON id_a = x.doc_id JOIN sizes y ON id_b = y.doc_id
      WHERE CAST(n_inter AS DOUBLE) / CAST(x.n + y.n - n_inter AS DOUBLE) >= 0.5
      ORDER BY id_a, id_b
    """),
    // all-co-shingle-pairs correctness baseline, like d2 — the bench covers
    // near-dup dedup via d3's LSH path, which consumes this same frame
    benchmark = false)

  /** Oracle fragment: capped band-bucket candidate pairs over an `eb`
    * (doc_id, band, bucket) CTE — buckets ≤ cap emit all (a<b) pairs,
    * larger buckets star-pair with the min-id representative. Mirrors
    * [[Dedup.cappedPairs]].
    */
  private def cappedCandSql(cap: Int): String =
    s"""ebw AS (SELECT doc_id, band, bucket,
               count(*) OVER (PARTITION BY band, bucket) AS sz,
               min(doc_id) OVER (PARTITION BY band, bucket) AS rep FROM eb),
      cand AS (SELECT DISTINCT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM ebw a JOIN ebw b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        WHERE a.sz <= $cap
        UNION ALL
        SELECT rep AS id_a, doc_id AS id_b FROM ebw WHERE sz > $cap AND doc_id <> rep))"""

  /** D3 — MinHash+LSH near-dup: band-bucket candidates (hot buckets capped
    * at 32 members — see [[Dedup.minhashCandidates]]), Jaccard-verified.
    */
  val d3DedupMinhash = QueryDef(
    "d3_dedup_minhash",
    (s, dir) =>
      Dedup.minhashDedup(Td(s, dir, "documents"), "doc_id", "text",
          n = 3, k = 12, bands = 3, threshold = 0.8, bucketCap = 32)
        .orderBy(col("id_a"), col("id_b")),
    Some {
      val sigs = (0 until 12).map(i => s"min(md5('$i:' || shingle)) AS h$i").mkString(", ")
      val bandSelects = (0 until 3).map { b =>
        val cat = (0 until 4).map(r => s"h${b * 4 + r}").mkString(" || '|' || ")
        s"SELECT doc_id, $b AS band, md5($cat) AS bucket FROM sig"
      }.mkString("\n        UNION ALL ")
      s"""
      WITH $shingleCte,
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      sig AS (SELECT doc_id, $sigs FROM sh GROUP BY doc_id),
      eb AS ($bandSelects),
      ${cappedCandSql(32)},
      inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
                FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT i.id_a, i.id_b,
             CAST(n_inter AS DOUBLE) / CAST(x.n + y.n - n_inter AS DOUBLE) AS jaccard
      FROM inter i JOIN cand c ON i.id_a = c.id_a AND i.id_b = c.id_b
      JOIN sizes x ON i.id_a = x.doc_id JOIN sizes y ON i.id_b = y.doc_id
      WHERE CAST(n_inter AS DOUBLE) / CAST(x.n + y.n - n_inter AS DOUBLE) >= 0.8
      ORDER BY i.id_a, i.id_b
    """
    })

  /** D7 — hot-bucket cap end-to-end: the corpus plus 40 exact copies of its
    * min-id document. All 41 copies collide in every LSH band; with
    * bucketCap=8 the bucket star-pairs against the representative — 40
    * pairs instead of 820, proving O(m) candidate growth on an m-doc hot
    * bucket with the group still connected.
    */
  val d7DedupHotbucket = QueryDef(
    "d7_dedup_hotbucket",
    (s, dir) => {
      val docs = Td(s, dir, "documents").select(col("doc_id"), col("text"))
      val seed = docs.orderBy(col("doc_id")).limit(1)
      val copies = seed.select(
        explode(sequence(lit(1), lit(40))).as("i"), col("text"))
        .select((col("i") + lit(1000000)).cast("long").as("doc_id"), col("text"))
      val corpus = docs.union(copies)
      val sh = Dedup.shingleIndex(corpus, "doc_id", "text", 3)
      Dedup.minhashCandidates(Dedup.minhashSignature(sh, "doc_id", 12),
          "doc_id", bands = 3, rows = 4, bucketCap = 8)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some {
      val sigs = (0 until 12).map(i => s"min(md5('$i:' || shingle)) AS h$i").mkString(", ")
      val bandSelects = (0 until 3).map { b =>
        val cat = (0 until 4).map(r => s"h${b * 4 + r}").mkString(" || '|' || ")
        s"SELECT doc_id, $b AS band, md5($cat) AS bucket FROM sig"
      }.mkString("\n        UNION ALL ")
      s"""
      WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT CAST(1000000 + i AS BIGINT) AS doc_id,
               (SELECT text FROM documents ORDER BY doc_id LIMIT 1) AS text
        FROM generate_series(1, 40) t(i)),
      w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM corpus),
      sh AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(ws) >= 3
                 THEN list_transform(generate_series(1, len(ws)-2), i -> array_to_string(ws[i:i+2], ' '))
                 ELSE [array_to_string(ws, ' ')] END)) AS shingle FROM w),
      sig AS (SELECT doc_id, $sigs FROM sh GROUP BY doc_id),
      eb AS ($bandSelects),
      ${cappedCandSql(8)}
      SELECT id_a, id_b FROM cand ORDER BY id_a, id_b
    """
    },
    // synthetic planted-copies prove-out of the capped path — the bench
    // covers LSH dedup on the real corpus via d3_dedup_minhash
    benchmark = false)

  /** D8 — incremental dedup: the "increment" is a deterministic ~1/4
    * md5-bucket slice of the corpus (standing in for today's crawl), the
    * rest is the existing base. Verified near-dup pairs touching the
    * increment, found by probing only the increment's band buckets against
    * the staged index — never re-pairing base against base. The oracle
    * computes the FULL verified pair set and restricts it to
    * increment-touching pairs: the incremental path must find exactly
    * those, proving no recall is lost by skipping the base-base space.
    */
  val d8DedupIncremental = QueryDef(
    "d8_dedup_incremental",
    (s, dir) => {
      val docs = Td(s, dir, "documents")
      val isInc = Similarity.sampleBucket(col("doc_id")) % 4 === 0
      Dedup.minhashDedupIncremental(
          docs.filter(!isInc), docs.filter(isInc), "doc_id", "text",
          n = 3, k = 12, bands = 3, threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(s"""
      WITH ${minhashPairsSql("documents", 0.8)},
      inc AS (SELECT doc_id FROM documents WHERE ${sampleFilterSql("doc_id", 4)})
      SELECT id_a, id_b, jaccard FROM mh_pairs
      WHERE id_a IN (SELECT doc_id FROM inc) OR id_b IN (SELECT doc_id FROM inc)
      ORDER BY id_a, id_b
    """))

  /** D10 — durable-index incremental dedup: the same split and output
    * contract as [[d8DedupIncremental]], but through [[DedupIndex]]: the
    * base corpus is indexed ONCE into TableStore tables (bands, shingles,
    * sizes), and the incremental run shingles only the increment, probes
    * the stored band table, and verifies against the stored shingle rows —
    * the base text is never re-read (DedupIndexSpec pins that at the
    * executed-plan level). The oracle is d8's: the durable path must find
    * exactly the pair set the recompute-everything path finds.
    */
  val d10DedupIndexReuse = QueryDef(
    "d10_dedup_index_reuse",
    (s, dir) => {
      val docs = Td(s, dir, "documents")
      val isInc = Similarity.sampleBucket(col("doc_id")) % 4 === 0
      val store = graft.tables.Scratch.store(s)
      // build is the once-ever cost; each query invocation rebuilds so the
      // run is self-contained and idempotent (appends land on a fresh index)
      DedupIndex.build(store, "d10_mhidx", docs.filter(!isInc), "doc_id", "text",
        n = 3, k = 12, bands = 3)
      DedupIndex.dedupIncrement(store, "d10_mhidx", docs.filter(isInc),
          "doc_id", "text", n = 3, k = 12, bands = 3, threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(s"""
      WITH ${minhashPairsSql("documents", 0.8)},
      inc AS (SELECT doc_id FROM documents WHERE ${sampleFilterSql("doc_id", 4)})
      SELECT id_a, id_b, jaccard FROM mh_pairs
      WHERE id_a IN (SELECT doc_id FROM inc) OR id_b IN (SELECT doc_id FROM inc)
      ORDER BY id_a, id_b
    """))

  /** D13 — the durable index in digest storage mode ([[DedupIndex]] with
    * `digest = true`): same incremental contract as d10, but the shingle
    * table persists 16-byte md5 digests instead of raw strings — the 100 TB
    * storage shape. The oracle replays the whole MinHash pipeline over
    * `md5(shingle)` (signatures, buckets, intersections, sizes), so the
    * comparison stays exact even at a digest collision: neither engine
    * dedupes digests, so both see the same multiset.
    */
  val d13DedupIndexDigest = QueryDef(
    "d13_dedup_index_digest",
    (s, dir) => {
      val docs = Td(s, dir, "documents")
      val isInc = Similarity.sampleBucket(col("doc_id")) % 4 === 0
      val store = graft.tables.Scratch.store(s)
      DedupIndex.build(store, "d13_mhidx", docs.filter(!isInc), "doc_id", "text",
        n = 3, k = 12, bands = 3, digest = true)
      DedupIndex.dedupIncrement(store, "d13_mhidx", docs.filter(isInc),
          "doc_id", "text", n = 3, k = 12, bands = 3, threshold = 0.8, digest = true)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(s"""
      WITH ${minhashPairsSql("documents", 0.8, digest = true)},
      inc AS (SELECT doc_id FROM documents WHERE ${sampleFilterSql("doc_id", 4)})
      SELECT id_a, id_b, jaccard FROM mh_pairs
      WHERE id_a IN (SELECT doc_id FROM inc) OR id_b IN (SELECT doc_id FROM inc)
      ORDER BY id_a, id_b
    """))

  /** D17 — the durable index in its id-bucketed layout ([[DedupIndex]]
    * with `idBuckets = 8`): same incremental contract and oracle as d10,
    * but the shingle table is hive-partitioned on the id hash and
    * candidate verification scans only candidate buckets (partition
    * pruning pinned in DedupIndexSpec). The layout is a PLAN choice — the
    * d8/d10 recompute-path SQL must stay the exact answer, which is what
    * this row gates.
    */
  val d17DedupIndexBucketed = QueryDef(
    "d17_dedup_index_bucketed",
    (s, dir) => {
      val docs = Td(s, dir, "documents")
      val isInc = Similarity.sampleBucket(col("doc_id")) % 4 === 0
      val store = graft.tables.Scratch.store(s)
      DedupIndex.build(store, "d17_mhidx", docs.filter(!isInc), "doc_id", "text",
        n = 3, k = 12, bands = 3, idBuckets = 8)
      DedupIndex.dedupIncrement(store, "d17_mhidx", docs.filter(isInc),
          "doc_id", "text", n = 3, k = 12, bands = 3, threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(s"""
      WITH ${minhashPairsSql("documents", 0.8)},
      inc AS (SELECT doc_id FROM documents WHERE ${sampleFilterSql("doc_id", 4)})
      SELECT id_a, id_b, jaccard FROM mh_pairs
      WHERE id_a IN (SELECT doc_id FROM inc) OR id_b IN (SELECT doc_id FROM inc)
      ORDER BY id_a, id_b
    """),
    // layout prove-out over the identical d10 contract — d10 is the
    // benched durable-index row; timing both would double-count the build
    benchmark = false)

  /** D19 — containment dedup ([[graft.ext.Dedup.containmentPairs]]): the
    * subset-duplication predicate Jaccard misses. The corpus has no
    * natural truncations, so the query plants them (the t7/d16 pattern):
    * every fifth document gains a twin holding its FIRST HALF of tokens —
    * containment 1.0 against its source (prefix 3-grams are a subset)
    * while Jaccard sits near 0.5, invisible at any usual threshold. The
    * ≥ 0.9 filter then returns exactly the planted truncations plus any
    * organic high-overlap family pairs, with raw n_inter/n_a/n_b alongside
    * for re-thresholding.
    */
  val d19DedupContainment = QueryDef(
    "d19_dedup_containment",
    (s, dir) => {
      val t = TA.wsTokens(col("text"))
      val docs = Td(s, dir, "documents").select(col("doc_id"), col("text"))
      // twin ids sit far above any real doc_id at any plausible SF (the
      // ScaleStress.Off convention) — a collision would silently merge the
      // twin's shingles with an unrelated doc's in BOTH engines, so the
      // oracle could never catch it
      val halves = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000000L).as("doc_id"),
          array_join(slice(t, lit(1), (size(t) / lit(2)).cast("int")), " ").as("text"))
      val sh = Dedup.shingleIndex(docs.unionByName(halves), "doc_id", "text", 3)
      // df-capped like d2: a boilerplate 3-gram in df docs would otherwise
      // put df² rows through the self-join; planted-pair recall survives the
      // cap because truncation twins share their source's RARE shingles too
      Dedup.containmentPairs(sh, "doc_id", maxDf = 6)
        .filter(col("containment") >= 0.9)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""
      WITH h0 AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
                  FROM documents WHERE doc_id % 5 = 0),
      halves AS (SELECT doc_id + 100000000 AS doc_id,
                        array_to_string(ws[1:len(ws)//2], ' ') AS text FROM h0),
      alld AS (SELECT doc_id, text FROM documents
               UNION ALL SELECT doc_id, text FROM halves),
      w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM alld),
      sh0 AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(ws) >= 3
                 THEN list_transform(generate_series(1, len(ws)-2), i -> array_to_string(ws[i:i+2], ' '))
                 ELSE [array_to_string(ws, ' ')] END)) AS shingle FROM w),
      sh AS (SELECT * FROM sh0
             WHERE shingle IN (SELECT shingle FROM sh0 GROUP BY 1 HAVING count(*) <= 6)),
      sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
            FROM sh a JOIN sh b USING (shingle)
            WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
      SELECT id_a, id_b, CAST(p.n_inter AS BIGINT) AS n_inter,
             CAST(sa.n_sh AS BIGINT) AS n_a, CAST(sb.n_sh AS BIGINT) AS n_b,
             CAST(p.n_inter AS DOUBLE) / CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE)
               AS containment
      FROM p JOIN sz sa ON p.id_a = sa.doc_id JOIN sz sb ON p.id_b = sb.doc_id
      WHERE CAST(p.n_inter AS DOUBLE) / CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE) >= 0.9
      ORDER BY id_a, id_b
    """))

  /** D4 — SimHash near-dup: 64-bit sketch, Hamming ≤ 3 via 16-bit-chunk
    * pigeonhole, hot chunk-buckets capped at 32 members.
    */
  val d4DedupSimhash = QueryDef(
    "d4_dedup_simhash",
    (s, dir) => {
      val sh = Dedup.shingleIndex(Td(s, dir, "documents"), "doc_id", "text", 3)
      Dedup.simhashPairs(Dedup.simhash(sh, "doc_id"), "doc_id", maxHamming = 3,
          bucketCap = 32)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some {
      val votes = (0 until 64).map { bit =>
        s"sum((((strpos('0123456789abcdef', substr(hh, ${bit / 4 + 1}, 1)) - 1) >> ${3 - bit % 4}) & 1) * 2 - 1) AS v$bit"
      }.mkString(",\n               ")
      // bit 63 is the sign bit: emit Long.MinValue as (-MAX - 1) so the
      // literal stays in BIGINT range; partial sums of the remaining
      // positive terms peak at 2^63-1, so the addition chain never overflows
      val simBits = (0 until 64).map { b =>
        val term = if (b == 63) "-9223372036854775807 - 1" else s"CAST(${1L << b} AS BIGINT)"
        s"(CASE WHEN v$b > 0 THEN $term ELSE 0 END)"
      }.mkString(" + ")
      s"""
      WITH $shingleCte,
      h AS (SELECT doc_id, md5(shingle) AS hh FROM sh),
      votes AS (SELECT doc_id,
               $votes
             FROM h GROUP BY doc_id),
      sim AS (SELECT doc_id, $simBits AS simhash FROM votes),
      exc AS (SELECT doc_id, simhash, unnest([0, 1, 2, 3]) AS ci FROM sim),
      ex2 AS (SELECT doc_id, simhash, ci, (simhash >> (ci * 16)) & 65535 AS cv FROM exc),
      ex2w AS (SELECT *, count(*) OVER (PARTITION BY ci, cv) AS sz,
                      min(doc_id) OVER (PARTITION BY ci, cv) AS rep FROM ex2),
      rawp AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.simhash AS sh_a, b.simhash AS sh_b
        FROM ex2w a JOIN ex2w b ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id
        WHERE a.sz <= 32
        UNION ALL
        SELECT r.rep, m.doc_id, r.simhash, m.simhash
        FROM ex2w m JOIN (SELECT DISTINCT ci, cv, rep, simhash FROM ex2w WHERE doc_id = rep) r
          ON m.ci = r.ci AND m.cv = r.cv
        WHERE m.sz > 32 AND m.doc_id <> m.rep),
      pairs AS (SELECT DISTINCT id_a, id_b,
                  CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming FROM rawp)
      SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3 ORDER BY id_a, id_b
    """
    })

  // Oracle CTE: embeddings as double vectors with left-fold norms.
  private val vecCte =
    """e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |n AS (SELECT vec_id, v,
      |        sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm FROM e)""".stripMargin
  private val dotSql =
    "list_reduce(list_transform(list_zip(%s, %s), p -> p[1] * p[2]), (a, b) -> a + b)"

  /** D5 — embedding-cosine near-dup pairs (all-pairs baseline; IVF is the
    * scale path, see s2).
    */
  val d5DedupEmbed = QueryDef(
    "d5_dedup_embed",
    (s, dir) =>
      Similarity.cosinePairs(Td(s, dir, "embeddings"), "vec_id", "embedding", 0.45)
        .orderBy(col("id_a"), col("id_b")),
    Some(s"""
      WITH $vecCte
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ${dotSql.format("a.v", "b.v")} / (a.nrm * b.nrm) AS cos
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE ${dotSql.format("a.v", "b.v")} / (a.nrm * b.nrm) >= 0.45
      ORDER BY id_a, id_b
    """),
    // all-pairs O(n²) correctness baseline — the bench covers vector search
    // via s2_ann_ivf (the scale path)
    benchmark = false)

  /** D6 — embedding near-dup at scale: pair only within IVF clusters
    * (centroid seeds vec_id < 8). Approximate by design — misses
    * cross-cluster pairs; the bench path for what d5 does exhaustively.
    */
  /** Oracle CTE chain replaying [[Similarity.kmeansTrain]] exactly:
    * quantized corpus (2^-20 grid — sums exact in double, so SUM order
    * can't matter in either engine), row_number seed, then per Lloyd
    * iteration assignment (max cosine, ties to lower centroid id) and
    * exact-sum component means with empty-cluster carry-over. Final
    * centroids are CTE `c<iters>` (centroid_id, cv).
    */
  private def kmeansCte(k: Int, iters: Int, srcWhere: String = ""): String = {
    val base =
      s"""q AS (SELECT vec_id, list_transform(embedding,
           x -> round(CAST(x AS DOUBLE) * 1048576.0) / 1048576.0) AS qv FROM embeddings$srcWhere),
      qn AS (SELECT vec_id, qv,
               sqrt(list_reduce(list_transform(qv, x -> x * x), (a, b) -> a + b)) AS qnrm FROM q),
      c0 AS (SELECT row_number() OVER (ORDER BY vec_id) AS centroid_id, qv AS cv
             FROM qn QUALIFY centroid_id <= $k)"""
    val steps = (1 to iters).map { i =>
      val p = i - 1
      s"""s$i AS (SELECT e.vec_id, e.qv, e.qnrm, c.centroid_id,
               ${dotSql.format("e.qv", "c.cv")} /
                 (e.qnrm * sqrt(list_reduce(list_transform(c.cv, x -> x * x), (a, b) -> a + b))) AS ccos
             FROM qn e CROSS JOIN c$p c),
      a$i AS (SELECT vec_id, qv, centroid_id AS cluster FROM (
               SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, centroid_id) AS rnk
               FROM s$i) WHERE rnk = 1),
      m$i AS (SELECT cluster, unnest(range(len(qv))) AS pos, unnest(qv) AS val FROM a$i),
      g$i AS (SELECT cluster AS centroid_id, pos, sum(val) / count(*) AS mval FROM m$i GROUP BY 1, 2),
      u$i AS (SELECT centroid_id, list(mval ORDER BY pos) AS cv FROM g$i GROUP BY 1),
      c$i AS (SELECT centroid_id, cv FROM u$i UNION ALL
              SELECT centroid_id, cv FROM c$p WHERE centroid_id NOT IN (SELECT centroid_id FROM u$i))"""
    }
    (base +: steps).mkString(",\n      ")
  }

  /** Oracle fragment: trained centroids as (centroid_id, centv, centn). */
  private def trainedCentSql(iters: Int): String =
    s"""cent AS (SELECT centroid_id, cv AS centv,
             sqrt(list_reduce(list_transform(cv, x -> x * x), (a, b) -> a + b)) AS centn
           FROM c$iters)"""

  val d6DedupEmbedIvf = QueryDef(
    "d6_dedup_embed_ivf",
    (s, dir) => {
      val emb = Td(s, dir, "embeddings")
      val cents = Similarity.kmeansTrain(emb, "vec_id", "embedding", k = 8, iters = 2)
        .select(col("centroid_id").cast("long").as("vec_id"), col("embedding"))
      Similarity.cosinePairsClustered(emb, cents, "vec_id", "embedding", 0.45)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(s"""
      WITH $vecCte,
      ${kmeansCte(8, 2)},
      ${trainedCentSql(2)},
      asg0 AS (SELECT n.vec_id, n.v, n.nrm, cent.centroid_id,
                 ${dotSql.format("n.v", "centv")} / (n.nrm * centn) AS ccos
               FROM n CROSS JOIN cent),
      asg AS (SELECT vec_id, v, nrm, centroid_id AS cluster FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, centroid_id) AS rnk
                FROM asg0) WHERE rnk = 1)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ${dotSql.format("a.v", "b.v")} / (a.nrm * b.nrm) AS cos
      FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      WHERE ${dotSql.format("a.v", "b.v")} / (a.nrm * b.nrm) >= 0.45
      ORDER BY id_a, id_b
    """))

  /** D11 — multi-probe IVF near-dup: d6's clustered pair search with each
    * vector indexed under its TWO nearest centroids, closing the
    * Voronoi-boundary recall loss the single-probe path documents (a pair
    * is caught when the vectors share ANY probed cluster). The oracle
    * replays the same top-2 assignment windowed (`rnk <= 2`) and dedups
    * multiply-shared emissions with DISTINCT — results must match the
    * map-only masked-argmax chain bit-for-bit, including ties and
    * degenerate rows.
    */
  val d11DedupIvfMultiprobe = QueryDef(
    "d11_dedup_ivf_multiprobe",
    (s, dir) => {
      val emb = Td(s, dir, "embeddings")
      val cents = Similarity.kmeansTrain(emb, "vec_id", "embedding", k = 8, iters = 2)
        .select(col("centroid_id").cast("long").as("vec_id"), col("embedding"))
      Similarity.cosinePairsClusteredMultiProbe(emb, cents, "vec_id", "embedding",
          0.45, nprobe = 2)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(s"""
      WITH $vecCte,
      ${kmeansCte(8, 2)},
      ${trainedCentSql(2)},
      asg0 AS (SELECT n.vec_id, n.v, n.nrm, cent.centroid_id,
                 ${dotSql.format("n.v", "centv")} / (n.nrm * centn) AS ccos
               FROM n CROSS JOIN cent),
      asg AS (SELECT vec_id, v, nrm, centroid_id AS cluster FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, centroid_id) AS rnk
                FROM asg0) WHERE rnk <= 2)
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
             ${dotSql.format("a.v", "b.v")} / (a.nrm * b.nrm) AS cos
      FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      WHERE ${dotSql.format("a.v", "b.v")} / (a.nrm * b.nrm) >= 0.45
      ORDER BY id_a, id_b
    """))

  /** D9 — sign-LSH bucketed embedding near-dup: the training-free ANN
    * scale path (vs d6's IVF, which needs k-means). The 16 hyperplanes are
    * md5-derived dyadic rationals, so the IDENTICAL literals drive both
    * engines — the oracle replays bucketing, candidate join, and exact
    * verification with the same constants. Approximate by design (misses
    * pairs that collide in no band); every reported pair is exact-verified.
    */
  val d9DedupEmbedLsh = QueryDef(
    "d9_dedup_embed_lsh",
    (s, dir) =>
      Similarity.cosinePairsLsh(Td(s, dir, "embeddings"), "vec_id", "embedding",
          dim = 64, threshold = 0.45, bands = 4, rowsPerBand = 4)
        .orderBy(col("id_a"), col("id_b")),
    Some {
      val planes = Similarity.lshHyperplanes(16, 64)
      val bitExprs = planes.zipWithIndex.map { case (p, i) =>
        val lits = p.mkString("[", ", ", "]")
        s"(CASE WHEN ${dotSql.format("v", lits)} >= 0 THEN ${1 << (i % 4)} ELSE 0 END) AS sb$i"
      }.mkString(",\n               ")
      val bandSelects = (0 until 4).map { b =>
        val sum = (0 until 4).map(r => s"sb${b * 4 + r}").mkString(" + ")
        s"SELECT vec_id, $b AS band, $sum AS bucket FROM bits"
      }.mkString("\n        UNION ALL ")
      s"""
      WITH $vecCte,
      bits AS (SELECT vec_id, v, nrm,
               $bitExprs
             FROM n),
      eb AS ($bandSelects),
      cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
               FROM eb a JOIN eb b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
      SELECT c.id_a, c.id_b, ${dotSql.format("x.v", "y.v")} / (x.nrm * y.nrm) AS cos
      FROM cand c JOIN n x ON c.id_a = x.vec_id JOIN n y ON c.id_b = y.vec_id
      WHERE ${dotSql.format("x.v", "y.v")} / (x.nrm * y.nrm) >= 0.45
      ORDER BY id_a, id_b
    """
    })

  /** S1 — brute-force cosine top-10 for query vectors vec_id < 5. */
  val s1KnnBrute = QueryDef(
    "s1_knn_brute",
    (s, dir) => {
      val emb = Td(s, dir, "embeddings")
      Similarity.knnBrute(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rnk").cast("long").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    },
    Some(s"""
      WITH $vecCte,
      scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ${dotSql.format("q.v", "c.v")} / (q.nrm * c.nrm) AS cos
                 FROM n q JOIN n c ON c.vec_id <> q.vec_id WHERE q.vec_id < 5),
      r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
            FROM scored)
      SELECT query_id, neighbor_id, cos, rnk FROM r WHERE rnk <= 10 ORDER BY query_id, rnk
    """))

  /** S3 — quantized kNN ([[graft.ext.Similarity.knnQuantized]]): the
    * search path over the int8-compressed store — integer dots rescaled
    * by the two per-vector scales, exact in doubles, so the approximate
    * RANKING is still deterministic and the oracle replays it with no
    * tolerance. Demonstrates x17's codes are queryable, not just smaller.
    */
  val s3KnnQuantized = QueryDef(
    "s3_knn_quantized",
    (s, dir) => {
      val emb = Td(s, dir, "embeddings")
      Similarity.knnQuantized(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id"), col("ip"),
          col("rnk").cast("long").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    },
    Some(s"""
      WITH b AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS sc
        FROM embeddings),
      q8 AS (
        SELECT vec_id, sc,
               CASE WHEN sc = 0 THEN list_transform(v, x -> 0.0)
                 ELSE list_transform(v, x -> CAST(CAST(floor(x / sc + 0.5) AS INTEGER) AS DOUBLE))
               END AS qv
        FROM b),
      scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ${dotSql.format("q.qv", "c.qv")} * q.sc * c.sc AS ip
                 FROM q8 q JOIN q8 c ON c.vec_id <> q.vec_id WHERE q.vec_id < 5),
      r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ip DESC, neighbor_id) AS rnk
            FROM scored)
      SELECT query_id, neighbor_id, ip, rnk FROM r WHERE rnk <= 10 ORDER BY query_id, rnk
    """),
    // same cross-join+window shape s1 already times —
    // keeping it out preserves the compact bench line's headroom
    benchmark = false)

  /** S2 — IVF approximate search: k-means-trained centroids (k=8, 2 Lloyd
    * iterations), nprobe=2, top-5 within probed clusters.
    */
  val s2AnnIvf = QueryDef(
    "s2_ann_ivf",
    (s, dir) => {
      val emb = Td(s, dir, "embeddings")
      val centroids = Similarity.kmeansTrain(emb, "vec_id", "embedding", k = 8, iters = 2)
        .select(col("centroid_id").cast("long").as("vec_id"), col("embedding"))
      // the IVF index build is a materialization: cluster-partitioned stage
      // (probe joins can prune to nprobe cluster directories at scale)
      val assigned = graft.tables.Scratch.stage(
        Similarity.ivfAssign(emb, centroids, "vec_id", "embedding"),
        "s2_ivf_index", Seq("cluster"))
      // pruned variant: the 5-query probe set resolves driver-side and the
      // index scan reads only the probed cluster directories (PlanSpec pins
      // partitions-read == probed clusters)
      Similarity.ivfSearchPruned(emb.filter(col("vec_id") < 5), assigned, centroids,
          "vec_id", "embedding", k = 5, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rnk").cast("long").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    },
    Some(s"""
      WITH $vecCte,
      ${kmeansCte(8, 2)},
      ${trainedCentSql(2)},
      asg0 AS (SELECT n.vec_id, n.v, n.nrm, cent.centroid_id,
                 ${dotSql.format("n.v", "centv")} / (n.nrm * centn) AS ccos
               FROM n CROSS JOIN cent),
      asg AS (SELECT vec_id, v, nrm, centroid_id AS cluster FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, centroid_id) AS rnk
                FROM asg0) WHERE rnk = 1),
      probes0 AS (SELECT n.vec_id AS query_id, n.v AS qv, n.nrm AS qn, cent.centroid_id,
                    ${dotSql.format("n.v", "centv")} / (n.nrm * centn) AS ccos
                  FROM n CROSS JOIN cent WHERE n.vec_id < 5),
      probes AS (SELECT query_id, qv, qn, centroid_id AS cluster FROM (
                   SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ccos DESC, centroid_id) AS rnk
                   FROM probes0) WHERE rnk <= 2),
      scored AS (SELECT p.query_id, a.vec_id AS neighbor_id,
                   ${dotSql.format("p.qv", "a.v")} / (p.qn * a.nrm) AS cos
                 FROM asg a JOIN probes p ON a.cluster = p.cluster AND p.query_id <> a.vec_id),
      r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
            FROM scored)
      SELECT query_id, neighbor_id, cos, rnk FROM r WHERE rnk <= 5 ORDER BY query_id, rnk
    """))

  /** M1 — multimodal plumbing: documents' UTF-8 bytes as opaque media blobs
    * through the typed-Dataset decode stage (mapPartitions + stub codec),
    * plus pure byte slicing as Column work. The oracle replays the stub
    * codec's arithmetic over the UTF-8 BYTES — `hex(encode(text))` gives
    * two hex chars per byte, so byte k is `('0x' || substr(hx, 2k-1, 2))`
    * — byte-exact for any encoding, no chars≡bytes assumption (ADVICE r6).
    */
  val m1MediaMeta = QueryDef(
    "m1_media_meta",
    (s, dir) => {
      val docs = Td(s, dir, "documents")
      val meta = Multimodal.decodeMeta(Multimodal.fromText(s, docs, "doc_id", "text")).toDF()
      val slices = docs.select(col("doc_id").cast("long").as("media_id"),
        hex(substring(encode(col("text"), "UTF-8"), 1, 16)).as("head_hex"))
      meta.join(slices, Seq("media_id"))
        .select(col("media_id"), col("kind"), col("n_bytes"),
          col("width").cast("long").as("width"), col("height").cast("long").as("height"),
          col("channels").cast("long").as("channels"), col("mean_byte"), col("head_hex"))
        .orderBy(col("media_id"))
    },
    Some("""
      WITH h AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
                   octet_length(encode(text)) AS n
                 FROM documents)
      SELECT media_id, 'image' AS kind,
             CAST(n AS BIGINT) AS n_bytes,
             CAST(CASE WHEN n >= 2
               THEN ('0x' || substr(hx, 1, 2))::INT * 16 + (('0x' || substr(hx, 3, 2))::INT >> 4) + 1
               ELSE 1 END AS BIGINT) AS width,
             CAST(CASE WHEN n >= 4
               THEN ('0x' || substr(hx, 5, 2))::INT * 16 + (('0x' || substr(hx, 7, 2))::INT >> 4) + 1
               ELSE 1 END AS BIGINT) AS height,
             CAST(3 AS BIGINT) AS channels,
             CASE WHEN n > 0
               THEN CAST(list_reduce(list_transform(range(1, n + 1), k -> ('0x' || substr(hx, 2 * k - 1, 2))::BIGINT),
                 (a, b) -> a + b) AS DOUBLE) / n
               ELSE 0.0 END AS mean_byte,
             substr(hx, 1, 32) AS head_hex
      FROM h ORDER BY media_id
    """))

  /** M2 — multimodal frame sampling: 4 fixed-width byte windows at an even
    * floored stride through each media blob ([[Multimodal.sampleFrames]] —
    * pure byte slicing, no decode), frames surfaced as hex. Documents'
    * UTF-8 text stands in for the blob; the oracle replays the integer
    * stride/offset arithmetic with `//` and slices the HEX of the UTF-8
    * bytes (2 hex chars per byte), so the comparison is byte-exact even
    * for non-ASCII text (ADVICE r6).
    */
  val m2FrameSample = QueryDef(
    "m2_frame_sample",
    (s, dir) => {
      val docs = Td(s, dir, "documents")
      val media = Multimodal.fromText(s, docs, "doc_id", "text").toDF()
      Multimodal.sampleFrames(media, "media", nFrames = 4, frameBytes = 8)
        .select(col("media_id"), posexplode(col("frames")).as(Seq("frame_idx", "frame")))
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
          hex(col("frame")).as("frame_hex"))
        .orderBy(col("media_id"), col("frame_idx"))
    },
    Some("""
      WITH f AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
                   octet_length(encode(text)) AS n,
                   unnest(range(0, 4)) AS frame_idx
                 FROM documents)
      SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
             substr(hx,
               CAST(2 * (frame_idx * ((CASE WHEN n - 8 > 0 THEN n - 8 ELSE 0 END) // 3)) + 1 AS INT),
               16) AS frame_hex
      FROM f ORDER BY media_id, frame_idx
    """))

  /** M3 — REAL video container decode under the hash gate: each document
    * row gets a minimal but VALID MP4 header (moov{mvhd, trak{tkhd}})
    * built from doc_id with pure Column byte arithmetic —
    * `unhex(lpad(hex(…), 8, '0'))` is a big-endian u32, the t7 planting
    * pattern in its binary edition — then decoded by
    * [[graft.ext.Multimodal.decodeVideoMeta]]'s executor-side box walk.
    * The oracle does NOT parse: it independently states what the parse
    * MUST yield from the same doc_id arithmetic, so a single misread
    * offset in the walk (mvhd timescale at payload+12, tkhd 16.16 dims at
    * payload+76/+80) hash-mismatches every row. Timescale 600 with
    * duration 600·k makes duration_sec = k exactly — no float-division
    * noise in the compare.
    */
  /** m4's deterministic gradient raster: 32×24 single-byte pixels,
    * `v(x,y) = (a·x + b·y + c) mod 256` with coefficients drawn from the
    * source id. Variants: 1 = exact copy; 2 = one pixel at (1,1) bumped —
    * a position the 9×8 dHash grid never samples, so the hash must come
    * out IDENTICAL (the resampling-invariance dHash exists for); 3 = the
    * SAMPLED cell (14,12) inverted-ish (+128), flipping at most the two
    * comparisons that read it.
    */
  private def m4Bytes(sid: Long, variant: Int): Array[Byte] = {
    val (w, h) = (32, 24)
    val a = 1 + (sid % 3).toInt
    val b = 2 + (sid % 5).toInt
    val c = (sid % 251).toInt
    val bs = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var v = (a * x + b * y + c) % 256
        if (variant == 2 && x == 1 && y == 1) v = (v + 100) % 256
        if (variant == 3 && x == 14 && y == 12) v = (v + 128) % 256
        bs(y * w + x) = v.toByte
        x += 1
      }
      y += 1
    }
    bs
  }

  /** M4 — image near-dup dedup via dHash
    * ([[graft.ext.Multimodal.dhashRaster]] → [[Dedup.simhashPairs]]
    * UNCHANGED): synthetic gradient rasters with planted exact copies
    * (variant 1, Hamming 0), a non-sampled-pixel edit that must hash
    * identically (variant 2 — the perceptual-invariance property), and a
    * sampled-cell perturbation (variant 3, ≤ 2 bits). The oracle
    * recomputes every dHash from the GENERATION FORMULA (sampled grid
    * positions, strict-greater bits, the bit-63 min-long emission) and
    * replays the d4 capped chunk-pigeonhole pairing — a drift in the grid
    * arithmetic, the bit rule, or the bucket caps flips pairs.
    */
  val m4ImageDedup = QueryDef(
    "m4_image_dedup",
    (s, dir) => {
      import s.implicits._
      val ids = Td(s, dir, "documents").select(col("doc_id"))
      val variants = ids.select(col("doc_id").as("sid"), lit(0).as("vr"))
        .unionByName(ids.filter(col("doc_id") % 7 === 0)
          .select(col("doc_id").as("sid"), lit(1).as("vr")))
        .unionByName(ids.filter(col("doc_id") % 7 === 0)
          .select(col("doc_id").as("sid"), lit(2).as("vr")))
        .unionByName(ids.filter(col("doc_id") % 11 === 0)
          .select(col("doc_id").as("sid"), lit(3).as("vr")))
      val media = variants
        .select((col("sid") + col("vr").cast("long") * 100000000L).as("media_id"),
          col("sid"), col("vr"))
        .as[(Long, Long, Int)]
        .map { case (mid, sid, vr) => Multimodal.MediaRow(mid, "image", m4Bytes(sid, vr)) }
      val sh = Multimodal.dhashRaster(media, 32, 24).toDF()
        .select(col("media_id"), col("dhash").as("simhash"))
      Dedup.simhashPairs(sh, "media_id", maxHamming = 3, bucketCap = 32)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""
      WITH imgs AS (
        SELECT doc_id AS media_id, doc_id AS sid, 0 AS vr FROM documents
        UNION ALL SELECT doc_id + 100000000, doc_id, 1 FROM documents WHERE doc_id % 7 = 0
        UNION ALL SELECT doc_id + 200000000, doc_id, 2 FROM documents WHERE doc_id % 7 = 0
        UNION ALL SELECT doc_id + 300000000, doc_id, 3 FROM documents WHERE doc_id % 11 = 0),
      grid AS (SELECT gx, gy, (gx * 32) // 9 AS x, (gy * 24) // 8 AS y
               FROM (SELECT unnest(generate_series(0, 8)) AS gx),
                    (SELECT unnest(generate_series(0, 7)) AS gy)),
      cells AS (SELECT i.media_id, g.gx, g.gy,
                  CASE WHEN i.vr = 3 AND g.x = 14 AND g.y = 12
                    THEN ((1 + sid % 3) * g.x + (2 + sid % 5) * g.y + sid % 251 + 128) % 256
                    ELSE ((1 + sid % 3) * g.x + (2 + sid % 5) * g.y + sid % 251) % 256
                  END AS v
                FROM imgs i CROSS JOIN grid g),
      bitrows AS (SELECT a.media_id, a.gy * 8 + a.gx AS bi
                  FROM cells a JOIN cells b
                    ON b.media_id = a.media_id AND b.gy = a.gy AND b.gx = a.gx + 1
                  WHERE a.gx < 8 AND b.v > a.v),
      sim AS (SELECT i.media_id, CAST(coalesce(sum(
                CASE WHEN bi = 63 THEN -9223372036854775807 - 1
                     ELSE CAST(1 AS BIGINT) << CAST(bi AS INTEGER) END), 0) AS BIGINT) AS simhash
              FROM imgs i LEFT JOIN bitrows br ON br.media_id = i.media_id
              GROUP BY 1),
      exc AS (SELECT media_id, simhash, unnest([0, 1, 2, 3]) AS ci FROM sim),
      ex2 AS (SELECT media_id, simhash, ci, (simhash >> (ci * 16)) & 65535 AS cv FROM exc),
      ex2w AS (SELECT *, count(*) OVER (PARTITION BY ci, cv) AS sz,
                      min(media_id) OVER (PARTITION BY ci, cv) AS rep FROM ex2),
      rawp AS (
        SELECT a.media_id AS id_a, b.media_id AS id_b, a.simhash AS sh_a, b.simhash AS sh_b
        FROM ex2w a JOIN ex2w b ON a.ci = b.ci AND a.cv = b.cv AND a.media_id < b.media_id
        WHERE a.sz <= 32
        UNION ALL
        SELECT r.rep, m.media_id, r.simhash, m.simhash
        FROM ex2w m JOIN (SELECT DISTINCT ci, cv, rep, simhash FROM ex2w WHERE media_id = rep) r
          ON m.ci = r.ci AND m.cv = r.cv
        WHERE m.sz > 32 AND m.media_id <> m.rep),
      pairs AS (SELECT DISTINCT id_a, id_b,
                  CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming FROM rawp)
      SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3 ORDER BY id_a, id_b
    """),
    // hash is map-only over the synthetic rasters; the pairing shape is
    // d4's, which the bench already times on the real corpus
    benchmark = false)

  /** m5's deterministic PCM fixture: 650 signed 16-bit LE mono samples,
    * `s(t) = ((a·t² + b·t + c) mod 4001) − 2000` with coefficients drawn
    * from the source id — quadratic so segment energies genuinely vary.
    * Variants: 1 = gain ×2 (every energy scales by 4, every comparison —
    * and the hash — unchanged: the invariance the energy-gradient sketch
    * exists for); 2 = exact copy; 3 = +400 on samples 300..309 — exactly
    * segment 30, so only the e(29)<e(30) and e(30)<e(31) comparisons can
    * flip (≤2 Hamming bits).
    */
  private def m5Bytes(sid: Long, variant: Int): Array[Byte] = {
    val n = 650
    val a = 1 + (sid % 7)
    val b = 1 + (sid % 13)
    val c = sid % 101
    val bs = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      var v = (a * t * t + b * t + c) % 4001 - 2000
      if (variant == 3 && t >= 300 && t < 310) v += 400
      if (variant == 1) v *= 2
      bs(2 * t) = (v & 0xff).toByte
      bs(2 * t + 1) = ((v >> 8) & 0xff).toByte
      t += 1
    }
    bs
  }

  /** M5 — audio near-dup dedup ([[Multimodal.audioHashPcm]] →
    * [[Dedup.simhashPairs]] UNCHANGED — the m4 pattern on the audio
    * column): the 64-bit energy-gradient fingerprint (65 segment energies,
    * bit = strictly-increasing step) over deterministic synthetic PCM,
    * then the same Hamming-bucket pairing machinery as SimHash/dHash. The
    * oracle re-derives every sample value from the fixture FORMULA (never
    * parsing bytes — a byte-packing bug in the encode or the decode seam
    * mismatches every row), integer-sums the segment energies, assembles
    * the hash with the m4 bit machinery, and replays the pairing. Gain
    * copies must pair at Hamming 0 (volume invariance), the one-segment
    * edit within ≤2.
    */
  val m5AudioDedup = QueryDef(
    "m5_audio_dedup",
    (s, dir) => {
      import s.implicits._
      val ids = Td(s, dir, "documents").select(col("doc_id"))
      val variants = ids.select(col("doc_id").as("sid"), lit(0).as("vr"))
        .unionByName(ids.filter(col("doc_id") % 7 === 0)
          .select(col("doc_id").as("sid"), lit(1).as("vr")))
        .unionByName(ids.filter(col("doc_id") % 7 === 0)
          .select(col("doc_id").as("sid"), lit(2).as("vr")))
        .unionByName(ids.filter(col("doc_id") % 11 === 0)
          .select(col("doc_id").as("sid"), lit(3).as("vr")))
      val media = variants
        .select((col("sid") + col("vr").cast("long") * 100000000L).as("media_id"),
          col("sid"), col("vr"))
        .as[(Long, Long, Int)]
        .map { case (mid, sid, vr) => Multimodal.MediaRow(mid, "audio", m5Bytes(sid, vr)) }
      val sh = Multimodal.audioHashPcm(media).toDF()
        .select(col("media_id"), col("dhash").as("simhash"))
      Dedup.simhashPairs(sh, "media_id", maxHamming = 3, bucketCap = 32)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""
      WITH auds AS (
        SELECT doc_id AS media_id, doc_id AS sid, 0 AS vr FROM documents
        UNION ALL SELECT doc_id + 100000000, doc_id, 1 FROM documents WHERE doc_id % 7 = 0
        UNION ALL SELECT doc_id + 200000000, doc_id, 2 FROM documents WHERE doc_id % 7 = 0
        UNION ALL SELECT doc_id + 300000000, doc_id, 3 FROM documents WHERE doc_id % 11 = 0),
      ts AS (SELECT unnest(generate_series(0, 649)) AS t),
      sm AS (SELECT a.media_id, ts.t // 10 AS seg,
               (CASE WHEN a.vr = 3 AND ts.t BETWEEN 300 AND 309
                  THEN ((1 + sid % 7) * ts.t * ts.t + (1 + sid % 13) * ts.t + sid % 101) % 4001 - 2000 + 400
                  ELSE ((1 + sid % 7) * ts.t * ts.t + (1 + sid % 13) * ts.t + sid % 101) % 4001 - 2000
                END) * (CASE WHEN a.vr = 1 THEN 2 ELSE 1 END) AS v
             FROM auds a CROSS JOIN ts),
      en AS (SELECT media_id, seg, sum(v * v) AS e FROM sm GROUP BY 1, 2),
      bitrows AS (SELECT a.media_id, a.seg AS bi
                  FROM en a JOIN en b ON b.media_id = a.media_id AND b.seg = a.seg + 1
                  WHERE a.seg < 64 AND b.e > a.e),
      sim AS (SELECT x.media_id, CAST(coalesce(sum(
                CASE WHEN bi = 63 THEN -9223372036854775807 - 1
                     ELSE CAST(1 AS BIGINT) << CAST(bi AS INTEGER) END), 0) AS BIGINT) AS simhash
              FROM auds x LEFT JOIN bitrows br ON br.media_id = x.media_id
              GROUP BY 1),
      exc AS (SELECT media_id, simhash, unnest([0, 1, 2, 3]) AS ci FROM sim),
      ex2 AS (SELECT media_id, simhash, ci, (simhash >> (ci * 16)) & 65535 AS cv FROM exc),
      ex2w AS (SELECT *, count(*) OVER (PARTITION BY ci, cv) AS sz,
                      min(media_id) OVER (PARTITION BY ci, cv) AS rep FROM ex2),
      rawp AS (
        SELECT a.media_id AS id_a, b.media_id AS id_b, a.simhash AS sh_a, b.simhash AS sh_b
        FROM ex2w a JOIN ex2w b ON a.ci = b.ci AND a.cv = b.cv AND a.media_id < b.media_id
        WHERE a.sz <= 32
        UNION ALL
        SELECT r.rep, m.media_id, r.simhash, m.simhash
        FROM ex2w m JOIN (SELECT DISTINCT ci, cv, rep, simhash FROM ex2w WHERE media_id = rep) r
          ON m.ci = r.ci AND m.cv = r.cv
        WHERE m.sz > 32 AND m.media_id <> m.rep),
      pairs AS (SELECT DISTINCT id_a, id_b,
                  CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming FROM rawp)
      SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3 ORDER BY id_a, id_b
    """),
    // hash is map-only over synthetic PCM; the pairing shape is d4's,
    // which the bench already times on the real corpus
    benchmark = false)

  val m3VideoMeta = QueryDef(
    "m3_video_meta",
    (s, dir) => {
      import s.implicits._
      def be32(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        unhex(lpad(hex(c), 8, "0"))
      def tag(t: String): org.apache.spark.sql.Column = encode(lit(t), "UTF-8")
      val secs = col("doc_id") % 50 + 1 // duration in seconds, exact
      val wpx = (col("doc_id") % 64 + 1) * 16
      val hpx = (col("doc_id") % 64 + 1) * 9
      val mvhd = concat(be32(lit(28)), tag("mvhd"),
        be32(lit(0)), be32(lit(0)), be32(lit(0)), // v0 verflags, ctime, mtime
        be32(lit(600)), be32(secs * 600)) // timescale, duration
      val tkhd = concat(be32(lit(92)), tag("tkhd"),
        unhex(lit("00" * 76)), // v0 verflags..matrix, all zero
        be32(wpx * 65536), be32(hpx * 65536)) // 16.16 fixed-point dims
      val mp4 = concat(be32(lit(136)), tag("moov"), mvhd,
        be32(lit(100)), tag("trak"), tkhd)
      val media = Td(s, dir, "documents")
        .select(col("doc_id").cast("long").as("media_id"),
          lit("video").as("kind"), mp4.as("media"))
        .as[Multimodal.MediaRow]
      Multimodal.decodeVideoMeta(media).toDF()
        .select(col("media_id"), col("n_bytes"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("timescale"), col("duration_sec"))
        .orderBy(col("media_id"))
    },
    Some("""
      SELECT doc_id AS media_id,
             CAST(136 AS BIGINT) AS n_bytes,
             CAST((doc_id % 64 + 1) * 16 AS BIGINT) AS width,
             CAST((doc_id % 64 + 1) * 9 AS BIGINT) AS height,
             CAST(600 AS BIGINT) AS timescale,
             CAST(doc_id % 50 + 1 AS DOUBLE) AS duration_sec
      FROM documents ORDER BY media_id
    """),
    // synthetic planted prove-out (like d7): correctness row only — the
    // bench covers the multimodal surface via m1/m2 on real corpus bytes
    benchmark = false)

  /** M6 — REAL video FRAME decode ([[Multimodal.decodeVideoFrames]] over
    * [[Multimodal.Avi]]): the m3 pattern one level deeper — each doc_id
    * gets a complete Column-built RIFF/AVI container (avih + strl + movi,
    * little-endian sizes) holding THREE uncompressed 8×4 BI_RGB DIB
    * frames whose every pixel byte is the formula constant
    * `(doc_id·7 + f·13) % 200 + 10`, and the engine decodes the frames
    * on executors through the same parser + pixel walk that handles real
    * MJPEG files (ExtSpec round-trips ImageIO-encoded MJPEG AVIs through
    * it). The oracle states the expected per-frame rows independently by
    * the same formulas: dims from the header, mean_px exactly the
    * constant (the raster-sample mean over identical bytes), dhash 0 (a
    * uniform frame has no strictly-brighter right neighbor at any of the
    * 9×8 grid points).
    */
  val m6VideoFrames = QueryDef(
    "m6_video_frames",
    (s, dir) => {
      import s.implicits._
      def le32(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
        val hx = lpad(hex(c), 8, "0")
        concat(unhex(substring(hx, 7, 2)), unhex(substring(hx, 5, 2)),
          unhex(substring(hx, 3, 2)), unhex(substring(hx, 1, 2)))
      }
      def tag(t: String): org.apache.spark.sql.Column = encode(lit(t), "UTF-8")
      def z(n: Int): org.apache.spark.sql.Column = unhex(lit("00" * n))
      // one 96-byte frame payload: the per-frame constant byte repeated
      // (8×4 px × 3 channels; row bytes 24 are already 4-aligned)
      def frame(f: Int): org.apache.spark.sql.Column = {
        val cByte = (col("doc_id") * 7 + f * 13) % 200 + 10
        concat(tag("00db"), le32(lit(96)),
          unhex(repeat(lpad(hex(cByte), 2, "0"), 96)))
      }
      val avih = concat(tag("avih"), le32(lit(56)),
        le32(lit(40000)), z(12), le32(lit(3)), z(4), le32(lit(1)), z(4),
        le32(lit(8)), le32(lit(4)), z(16))
      val strh = concat(tag("strh"), le32(lit(56)),
        tag("vids"), tag("DIB "), z(48))
      val strf = concat(tag("strf"), le32(lit(40)),
        le32(lit(40)), le32(lit(8)), le32(lit(4)),
        unhex(lit("01001800")), // biPlanes = 1, biBitCount = 24 (LE u16s)
        z(4), le32(lit(96)), z(16))
      val strl = concat(tag("LIST"), le32(lit(116)), tag("strl"), strh, strf)
      val hdrl = concat(tag("LIST"), le32(lit(192)), tag("hdrl"), avih, strl)
      val movi = concat(tag("LIST"), le32(lit(316)), tag("movi"),
        frame(0), frame(1), frame(2))
      val avi = concat(tag("RIFF"), le32(lit(528)), tag("AVI "), hdrl, movi)
      val media = Td(s, dir, "documents")
        .select(col("doc_id").cast("long").as("media_id"),
          lit("video").as("kind"), avi.as("media"))
        .as[Multimodal.MediaRow]
      Multimodal.decodeVideoFrames(media, nFrames = 3).toDF()
        .select(col("media_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("mean_px"), col("dhash"))
        .orderBy(col("media_id"), col("frame_idx"))
    },
    Some("""
      SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_idx,
             CAST(8 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
             CAST((doc_id * 7 + f * 13) % 200 + 10 AS DOUBLE) AS mean_px,
             CAST(0 AS BIGINT) AS dhash
      FROM documents CROSS JOIN (SELECT unnest([0, 1, 2]) AS f) fr
      ORDER BY media_id, frame_idx
    """),
    // synthetic planted prove-out like m3: correctness row only
    benchmark = false)

  /** m7's video fixture: a complete 3-frame BI_RGB AVI whose frame
    * rasters follow the m4 gradient formula per frame —
    * `v(x, y, f) = (a·x + b·y + c + 17·f) mod 256`, with WRAP-HEAVY
    * per-sid coefficients (a = 3 + sid % 97, b = 5 + sid % 89) so dhash
    * comparison patterns diverge across sids — tame gradients would
    * hash most videos identically and make the fixture all-pairs
    * quadratic; all three channels equal so the decoded gray IS v.
    * Variants: 1 = a twin sharing frames 0/1 exactly with frame 2
    * perturbed at the SAMPLED cell (14,12) (+128 → ≤ 2 dhash bits);
    * 2 = a twin whose frames 1/2 shift the base constant by +50 (frame
    * 0 shared exactly; the shifted frames' hashes drift with the mod
    * wrap — whatever they drift to, the oracle replays it);
    * 3 = a ONE-FRAME-TRIMMED twin (m8): the base's frames 1 and 2 only,
    * bit-identical content at shifted positions — the case the
    * positional mode structurally misses and the unordered containment
    * mode exists for.
    */
  private def m7Avi(sid: Long, variant: Int): Array[Byte] = {
    val (w, h) = (32, 24)
    // coefficients big enough that the mod-256 wrap flips comparisons
    // differently per sid: tame m4-style gradients make most videos hash
    // IDENTICALLY (the dhash sees only neighbor comparisons), and a
    // near-all-pairs fixture is quadratic in the corpus on both engines
    val a = 3 + (sid % 97).toInt
    val b0 = 5 + (sid % 89).toInt
    val c0 = (sid % 251).toInt
    def frame(f: Int): Array[Byte] = {
      val rowBytes = w * 3 // 96 — already 4-aligned
      val out = new Array[Byte](rowBytes * h)
      var sy = 0
      while (sy < h) {
        val y = h - 1 - sy // bottom-up storage
        var x = 0
        while (x < w) {
          val cBase = c0 + (if (variant == 2 && f >= 1) 50 else 0)
          var v = (a * x + b0 * y + cBase + 17 * f) % 256
          if (variant == 1 && f == 2 && x == 14 && y == 12) v = (v + 128) % 256
          val o = sy * rowBytes + x * 3
          out(o) = v.toByte; out(o + 1) = v.toByte; out(o + 2) = v.toByte
          x += 1
        }
        sy += 1
      }
      out
    }
    // variant 3 trims the leading frame: the container holds the BASE
    // formula's frames 1 and 2 (frame() takes the content index f, so
    // the trimmed twin's bytes are bit-identical to the base's at a
    // shifted position)
    val frameIdxs = if (variant == 3) Seq(1, 2) else Seq(0, 1, 2)
    graft.ext.AviFixture.container(w, h, "DIB ", frameIdxs.map(frame))
  }

  /** M7 — video near-dup dedup ([[Multimodal.decodeVideoFrames]] →
    * per-frame dHash → [[Multimodal.videoNearDupPairs]], the positional
    * frame-scoped [[Dedup.simhashPairs]]): real container walk + frame
    * decode on executors, then videos pair when ≥ 2 of their 3 sampled
    * positions match within Hamming 3. Planted variant-1 twins share
    * frames 0/1 exactly and a ≤-2-bit frame 2 (pair, n_shared 3);
    * variant-2 twins share only frame 0 exactly with drifted frames 1/2
    * — kept or dropped exactly as the replayed hashes decide. The
    * oracle recomputes every per-frame dHash from the generation
    * formula (the m4 machinery with a frame dimension) and replays the
    * frame-scoped pairing and the ≥ minShared aggregation.
    */
  val m7VideoDedup = QueryDef(
    "m7_video_dedup",
    (s, dir) => {
      import s.implicits._
      val ids = Td(s, dir, "documents").select(col("doc_id"))
      val variants = ids.select(col("doc_id").as("sid"), lit(0).as("vr"))
        .unionByName(ids.filter(col("doc_id") % 7 === 0)
          .select(col("doc_id").as("sid"), lit(1).as("vr")))
        .unionByName(ids.filter(col("doc_id") % 11 === 0)
          .select(col("doc_id").as("sid"), lit(2).as("vr")))
      val media = variants
        .select((col("sid") + col("vr").cast("long") * 100000000L).as("media_id"),
          col("sid"), col("vr"))
        .as[(Long, Long, Int)]
        .map { case (mid, sid, vr) => Multimodal.MediaRow(mid, "video", m7Avi(sid, vr)) }
      val frames = Multimodal.decodeVideoFrames(media, nFrames = 3)
      Multimodal.videoNearDupPairs(frames, maxHamming = 3, minShared = 2)
        .select(col("id_a"), col("id_b"), col("n_shared"),
          col("max_hamming").cast("int").as("max_hamming"))
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""
      WITH vids AS (
        SELECT doc_id AS media_id, doc_id AS sid, 0 AS vr FROM documents
        UNION ALL SELECT doc_id + 100000000, doc_id, 1 FROM documents WHERE doc_id % 7 = 0
        UNION ALL SELECT doc_id + 200000000, doc_id, 2 FROM documents WHERE doc_id % 11 = 0),
      grid AS (SELECT f, gx, gy, (gx * 32) // 9 AS x, (gy * 24) // 8 AS y
               FROM (SELECT unnest([0, 1, 2]) AS f),
                    (SELECT unnest(generate_series(0, 8)) AS gx),
                    (SELECT unnest(generate_series(0, 7)) AS gy)),
      cells AS (SELECT i.media_id, g.f, g.gx, g.gy,
                  CASE WHEN i.vr = 1 AND g.f = 2 AND g.x = 14 AND g.y = 12
                    THEN ((3 + sid % 97) * g.x + (5 + sid % 89) * g.y + sid % 251 + 17 * g.f + 128) % 256
                    WHEN i.vr = 2 AND g.f >= 1
                    THEN ((3 + sid % 97) * g.x + (5 + sid % 89) * g.y + sid % 251 + 50 + 17 * g.f) % 256
                    ELSE ((3 + sid % 97) * g.x + (5 + sid % 89) * g.y + sid % 251 + 17 * g.f) % 256
                  END AS v
                FROM vids i CROSS JOIN grid g),
      bitrows AS (SELECT a.media_id, a.f, a.gy * 8 + a.gx AS bi
                  FROM cells a JOIN cells b
                    ON b.media_id = a.media_id AND b.f = a.f
                      AND b.gy = a.gy AND b.gx = a.gx + 1
                  WHERE a.gx < 8 AND b.v > a.v),
      fr AS (SELECT media_id, f FROM vids, (SELECT unnest([0, 1, 2]) AS f)),
      sim AS (SELECT fr.media_id, fr.f, CAST(coalesce(sum(
                CASE WHEN bi = 63 THEN -9223372036854775807 - 1
                     ELSE CAST(1 AS BIGINT) << CAST(bi AS INTEGER) END), 0) AS BIGINT) AS simhash
              FROM fr LEFT JOIN bitrows br
                ON br.media_id = fr.media_id AND br.f = fr.f
              GROUP BY 1, 2),
      exc AS (SELECT media_id, f, simhash, unnest([0, 1, 2, 3]) AS ci FROM sim),
      ex2 AS (SELECT media_id, f, simhash, ci, (simhash >> (ci * 16)) & 65535 AS cv FROM exc),
      rawp AS (SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b, a.f,
                  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
               FROM ex2 a JOIN ex2 b
                 ON a.f = b.f AND a.ci = b.ci AND a.cv = b.cv
                   AND a.media_id < b.media_id),
      fpairs AS (SELECT id_a, id_b, f, hamming FROM rawp WHERE hamming <= 3)
      SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_shared,
             CAST(max(hamming) AS INT) AS max_hamming
      FROM fpairs GROUP BY id_a, id_b HAVING count(*) >= 2
      ORDER BY id_a, id_b
    """),
    // hash is map-only over synthetic containers; the pairing shape is
    // d4's, which the bench already times on the real corpus
    benchmark = false)

  /** M8 — OFFSET-TOLERANT video near-dup
    * ([[Multimodal.videoNearDupPairsUnordered]]): the m7 fixture plus
    * variant-3 twins — the base video TRIMMED by its leading frame
    * (frames 1/2 bit-identical at shifted positions). Positional m7
    * pairing structurally misses them (every position compares different
    * content); the unordered mode sets-then-contains: distinct per-video
    * frame-hash sets, tolerant hash matching through the same pigeonhole,
    * and `containment = greatest(m_a/n_a, m_b/n_b) ≥ 0.9` — the trimmed
    * twin's 2-hash set is fully contained in its base's 3-hash set
    * (containment 1.0). The oracle recomputes every frame hash from the
    * generation formula and replays the set pairing end-to-end, so
    * incidental cross-sid matches are stated identically on both engines.
    */
  val m8VideoDedupUnordered = QueryDef(
    "m8_video_dedup_unordered",
    (s, dir) => {
      import s.implicits._
      val ids = Td(s, dir, "documents").select(col("doc_id"))
      val variants = ids.select(col("doc_id").as("sid"), lit(0).as("vr"))
        .unionByName(ids.filter(col("doc_id") % 13 === 0)
          .select(col("doc_id").as("sid"), lit(3).as("vr")))
      val media = variants
        .select((col("sid") + col("vr").cast("long") * 100000000L).as("media_id"),
          col("sid"), col("vr"))
        .as[(Long, Long, Int)]
        .map { case (mid, sid, vr) => Multimodal.MediaRow(mid, "video", m7Avi(sid, vr)) }
      val frames = Multimodal.decodeVideoFrames(media, nFrames = 3)
      Multimodal.videoNearDupPairsUnordered(frames, maxHamming = 3,
          minContainment = 0.9)
        .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"),
          col("n_matched_a"), col("n_matched_b"), col("containment"))
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""
      WITH vids AS (
        SELECT doc_id AS media_id, doc_id AS sid, 0 AS vr FROM documents
        UNION ALL SELECT doc_id + 300000000, doc_id, 3 FROM documents WHERE doc_id % 13 = 0),
      grid AS (SELECT f, gx, gy, (gx * 32) // 9 AS x, (gy * 24) // 8 AS y
               FROM (SELECT unnest([0, 1, 2]) AS f),
                    (SELECT unnest(generate_series(0, 8)) AS gx),
                    (SELECT unnest(generate_series(0, 7)) AS gy)),
      vf AS (SELECT media_id, sid, f FROM vids, (SELECT unnest([0, 1, 2]) AS f) fs
             WHERE vr = 0 OR f >= 1),
      cells AS (SELECT i.media_id, g.f, g.gx, g.gy,
                  ((3 + i.sid % 97) * g.x + (5 + i.sid % 89) * g.y + i.sid % 251 + 17 * g.f) % 256 AS v
                FROM vf i JOIN grid g ON g.f = i.f),
      bitrows AS (SELECT a.media_id, a.f, a.gy * 8 + a.gx AS bi
                  FROM cells a JOIN cells b
                    ON b.media_id = a.media_id AND b.f = a.f
                      AND b.gy = a.gy AND b.gx = a.gx + 1
                  WHERE a.gx < 8 AND b.v > a.v),
      sim AS (SELECT vf.media_id, vf.f, CAST(coalesce(sum(
                CASE WHEN bi = 63 THEN -9223372036854775807 - 1
                     ELSE CAST(1 AS BIGINT) << CAST(bi AS INTEGER) END), 0) AS BIGINT) AS simhash
              FROM vf LEFT JOIN bitrows br
                ON br.media_id = vf.media_id AND br.f = vf.f
              GROUP BY 1, 2),
      hs AS (SELECT DISTINCT media_id, simhash FROM sim),
      sizes AS (SELECT media_id, CAST(count(*) AS BIGINT) AS n_h FROM hs GROUP BY 1),
      exc AS (SELECT media_id, simhash, unnest([0, 1, 2, 3]) AS ci FROM hs),
      ex2 AS (SELECT media_id, simhash, ci, (simhash >> (ci * 16)) & 65535 AS cv FROM exc),
      rawp AS (SELECT DISTINCT a.media_id AS id_a, a.simhash AS h_a,
                      b.media_id AS id_b, b.simhash AS h_b
               FROM ex2 a JOIN ex2 b
                 ON a.ci = b.ci AND a.cv = b.cv AND a.media_id < b.media_id),
      mp AS (SELECT id_a, h_a, id_b, h_b FROM rawp
             WHERE bit_count(xor(h_a, h_b)) <= 3),
      cov AS (SELECT id_a, id_b,
                CAST(count(DISTINCT h_a) AS BIGINT) AS n_matched_a,
                CAST(count(DISTINCT h_b) AS BIGINT) AS n_matched_b
              FROM mp GROUP BY 1, 2),
      scored AS (SELECT c.id_a, c.id_b, sa.n_h AS n_a, sb.n_h AS n_b,
                   c.n_matched_a, c.n_matched_b,
                   greatest(CAST(c.n_matched_a AS DOUBLE) / CAST(sa.n_h AS DOUBLE),
                            CAST(c.n_matched_b AS DOUBLE) / CAST(sb.n_h AS DOUBLE)) AS containment
                 FROM cov c JOIN sizes sa ON sa.media_id = c.id_a
                            JOIN sizes sb ON sb.media_id = c.id_b)
      SELECT id_a, id_b, n_a, n_b, n_matched_a, n_matched_b, containment
      FROM scored WHERE containment >= 0.9 ORDER BY id_a, id_b
    """),
    // same fixture family as m7: correctness row only
    benchmark = false)

  /** m9's PCM fixture: the m5 quadratic stream at 1300 samples; the
    * trimmed twin (variant 1) is the SAME stream minus its first 325
    * samples — one hop — so its window w holds bit-identical content to
    * the base's window w+1.
    */
  private def m9Bytes(sid: Long, variant: Int): Array[Byte] = {
    val off = if (variant == 1) 325 else 0
    val n = if (variant == 1) 975 else 1300
    val a = 1 + (sid % 7)
    val b = 1 + (sid % 13)
    val c = sid % 101
    val bs = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val at = t + off
      val v = (a * at * at + b * at + c) % 4001 - 2000
      bs(2 * t) = (v & 0xff).toByte
      bs(2 * t + 1) = ((v >> 8) & 0xff).toByte
      t += 1
    }
    bs
  }

  /** M9 — OFFSET-TOLERANT audio near-dup
    * ([[Multimodal.audioWindowHashes]] →
    * [[Multimodal.audioNearDupPairsUnordered]], i.e.
    * [[Dedup.sketchSetPairs]] over per-window energy hashes): the m8
    * trim story on the audio column. The whole-clip m5 fingerprint
    * divides the entire stream into 65 segments, so trimming shifts
    * every boundary and the hash is unrecognizable; windowed hashing
    * (650-sample windows every 325) gives a hop-aligned trimmed twin
    * bit-identical hashes at shifted indices, and set containment pairs
    * it at 1.0. The oracle recomputes every window hash from the
    * generation formula (the m5 energy machinery with a window
    * dimension) and replays the set pairing end-to-end.
    */
  val m9AudioDedupOffset = QueryDef(
    "m9_audio_dedup_offset",
    (s, dir) => {
      import s.implicits._
      val ids = Td(s, dir, "documents").select(col("doc_id"))
      val variants = ids.select(col("doc_id").as("sid"), lit(0).as("vr"))
        .unionByName(ids.filter(col("doc_id") % 13 === 0)
          .select(col("doc_id").as("sid"), lit(1).as("vr")))
      val media = variants
        .select((col("sid") + col("vr").cast("long") * 100000000L).as("media_id"),
          col("sid"), col("vr"))
        .as[(Long, Long, Int)]
        .map { case (mid, sid, vr) => Multimodal.MediaRow(mid, "audio", m9Bytes(sid, vr)) }
      val wins = Multimodal.audioWindowHashes(media,
        windowSamples = 650, hopSamples = 325)
      Multimodal.audioNearDupPairsUnordered(wins, maxHamming = 3,
          minContainment = 0.9)
        .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"),
          col("n_matched_a"), col("n_matched_b"), col("containment"))
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""
      WITH auds AS (
        SELECT doc_id AS media_id, doc_id AS sid, 0 AS vr FROM documents
        UNION ALL SELECT doc_id + 100000000, doc_id, 1 FROM documents WHERE doc_id % 13 = 0),
      wins AS (SELECT media_id, sid, vr,
                 unnest(CASE WHEN vr = 1 THEN [0, 1] ELSE [0, 1, 2] END) AS w
               FROM auds),
      ts AS (SELECT unnest(generate_series(0, 649)) AS tr),
      sm0 AS (SELECT ws.media_id, ws.sid, ws.w, ts.tr,
                325 * ws.w + ts.tr + CASE WHEN ws.vr = 1 THEN 325 ELSE 0 END AS at
              FROM wins ws CROSS JOIN ts),
      sm AS (SELECT media_id, w, tr // 10 AS seg,
               ((1 + sid % 7) * at * at + (1 + sid % 13) * at + sid % 101) % 4001 - 2000 AS v
             FROM sm0),
      en AS (SELECT media_id, w, seg, sum(v * v) AS e FROM sm GROUP BY 1, 2, 3),
      bitrows AS (SELECT a.media_id, a.w, a.seg AS bi
                  FROM en a JOIN en b
                    ON b.media_id = a.media_id AND b.w = a.w AND b.seg = a.seg + 1
                  WHERE a.seg < 64 AND b.e > a.e),
      sim AS (SELECT x.media_id, x.w, CAST(coalesce(sum(
                CASE WHEN bi = 63 THEN -9223372036854775807 - 1
                     ELSE CAST(1 AS BIGINT) << CAST(bi AS INTEGER) END), 0) AS BIGINT) AS simhash
              FROM wins x LEFT JOIN bitrows br
                ON br.media_id = x.media_id AND br.w = x.w
              GROUP BY 1, 2),
      hs AS (SELECT DISTINCT media_id, simhash FROM sim),
      sizes AS (SELECT media_id, CAST(count(*) AS BIGINT) AS n_h FROM hs GROUP BY 1),
      exc AS (SELECT media_id, simhash, unnest([0, 1, 2, 3]) AS ci FROM hs),
      ex2 AS (SELECT media_id, simhash, ci, (simhash >> (ci * 16)) & 65535 AS cv FROM exc),
      rawp AS (SELECT DISTINCT a.media_id AS id_a, a.simhash AS h_a,
                      b.media_id AS id_b, b.simhash AS h_b
               FROM ex2 a JOIN ex2 b
                 ON a.ci = b.ci AND a.cv = b.cv AND a.media_id < b.media_id),
      mp AS (SELECT id_a, h_a, id_b, h_b FROM rawp
             WHERE bit_count(xor(h_a, h_b)) <= 3),
      cov AS (SELECT id_a, id_b,
                CAST(count(DISTINCT h_a) AS BIGINT) AS n_matched_a,
                CAST(count(DISTINCT h_b) AS BIGINT) AS n_matched_b
              FROM mp GROUP BY 1, 2),
      scored AS (SELECT c.id_a, c.id_b, sa.n_h AS n_a, sb.n_h AS n_b,
                   c.n_matched_a, c.n_matched_b,
                   greatest(CAST(c.n_matched_a AS DOUBLE) / CAST(sa.n_h AS DOUBLE),
                            CAST(c.n_matched_b AS DOUBLE) / CAST(sb.n_h AS DOUBLE)) AS containment
                 FROM cov c JOIN sizes sa ON sa.media_id = c.id_a
                            JOIN sizes sb ON sb.media_id = c.id_b)
      SELECT id_a, id_b, n_a, n_b, n_matched_a, n_matched_b, containment
      FROM scored WHERE containment >= 0.9 ORDER BY id_a, id_b
    """),
    // synthetic PCM like m5: correctness row only
    benchmark = false)

  /** T5 — TF-IDF-style salient terms: top-3 terms per doc by
    * tf × (N/df). Rational arithmetic only (no log — libm transcendentals
    * differ across engines in the last ulp); same parenthesization both
    * sides ⇒ bit-identical scores ⇒ identical ranks.
    */
  val t5Tfidf = QueryDef(
    "t5_tfidf",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // NOT fanned ([[graft.ext.Fan]] measured +0.5 s here): the tf table
      // re-shuffles on term for the df join regardless, so the fan's
      // exchange bought nothing the plan could keep
      val docs = Td(s, dir, "documents")
      val terms = docs.select(col("doc_id"),
          explode(graft.ext.TextAnalysis.wsTokens(col("text"))).as("term"))
      val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tcnt"))
      val docLen = terms.groupBy("doc_id").agg(count(lit(1)).as("dlen"))
      val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
      // N folds in as a cross-joined single-row aggregate (exactly like the
      // oracle's `CROSS JOIN n`): one plan, one job — a driver-side .count()
      // here would force an extra scan + job before the main query runs.
      val nDf = docs.agg(count(lit(1)).cast("double").as("_gm_n"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      tf.join(docLen, Seq("doc_id")).join(df_, Seq("term")).crossJoin(nDf)
        .withColumn("score",
          (col("tcnt").cast("double") / col("dlen").cast("double")) *
            (col("_gm_n") / col("df").cast("double")))
        .drop("_gm_n")
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
        .select(col("doc_id"), col("term"), col("score"), col("rnk").cast("long").as("rnk"))
        .orderBy(col("doc_id"), col("rnk"))
    },
    Some("""
      WITH terms AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term FROM documents),
      tf AS (SELECT doc_id, term, COUNT(*) AS tcnt FROM terms GROUP BY 1, 2),
      dl AS (SELECT doc_id, COUNT(*) AS dlen FROM terms GROUP BY 1),
      df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
      scored AS (
        SELECT tf.doc_id, tf.term,
               (CAST(tcnt AS DOUBLE) / CAST(dlen AS DOUBLE)) * (n.n / CAST(df.df AS DOUBLE)) AS score
        FROM tf JOIN dl ON tf.doc_id = dl.doc_id JOIN df ON tf.term = df.term CROSS JOIN n),
      r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk FROM scored)
      SELECT doc_id, term, score, rnk FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk
    """))

  /** T6 — repetition scoring (Gopher-style quality rule): the fraction of a
    * document's word bigrams taken by its single most frequent bigram.
    * Boilerplate and degenerate generations repeat n-grams; natural text
    * doesn't. Non-distinct bigrams (multiplicity is the signal), one
    * explode + two aggregations, single exact division.
    */
  val t6Repetition = QueryDef(
    "t6_repetition",
    (s, dir) => {
      val bg = Td(s, dir, "documents")
        .select(col("doc_id"), explode(TA.bigramsAll(col("text"))).as("bigram"))
      bg.groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_bigrams"), max(col("cnt")).as("top_count"))
        .select(col("doc_id"), col("n_bigrams"), col("top_count"),
          (col("top_count").cast("double") / col("n_bigrams").cast("double")).as("rep_ratio"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ws)-1),
               i -> ws[i] || ' ' || ws[i+1])) AS bigram
             FROM w WHERE len(ws) >= 2),
      c AS (SELECT doc_id, bigram, count(*) AS cnt FROM bg GROUP BY 1, 2)
      SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams, CAST(MAX(cnt) AS BIGINT) AS top_count,
             CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS rep_ratio
      FROM c GROUP BY doc_id ORDER BY doc_id
    """))

  /** T7 — PII detection + redaction. The synthetic corpus is PII-free, so
    * the query first plants one email / phone / IPv4 / SSN / 16-digit card
    * per document, deterministically derived from doc_id by the identical
    * concat in both engines — the redaction pass is then genuinely
    * exercised and hash-checked, not vacuously counting zeros. Patterns are
    * restricted to the Java-regex ∩ RE2 common subset
    * (TextAnalysis.Pii*Pattern) so replace semantics agree; the oracle
    * replays the engine's exact redaction order (email, SSN, phone, card,
    * IP — see [[graft.ext.TextAnalysis.redactPii]] for why that order is
    * conflict-free). Per-row map work only: at 100 TB this rides the scan
    * with no shuffle.
    */
  val t7PiiRedact = QueryDef(
    "t7_pii_redact",
    (s, dir) => {
      val planted = concat(col("text"),
        lit(" Contact user"), col("doc_id").cast("string"),
        lit("@example.com or +1 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
        lit("."), (col("doc_id") % 100).cast("string"), lit("."),
        lit(" SSN "), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
        lit("-"), lpad((col("doc_id") % 100).cast("string"), 2, "0"),
        lit("-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" card 4111"),
        lpad((col("doc_id") % 10000).cast("string"), 12, "0"), lit("."))
      Td(s, dir, "documents")
        .select(col("doc_id"), planted.as("t"))
        .select(col("doc_id"),
          TA.piiEmailCount(col("t")).cast("long").as("n_email"),
          TA.piiPhoneCount(col("t")).cast("long").as("n_phone"),
          TA.piiIpv4Count(col("t")).cast("long").as("n_ip"),
          TA.piiSsnCount(col("t")).cast("long").as("n_ssn"),
          TA.piiCardCount(col("t")).cast("long").as("n_card"),
          md5(TA.redactPii(col("t"))).as("redacted_md5"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH aug AS (
        SELECT doc_id,
               text || ' Contact user' || CAST(doc_id AS VARCHAR) || '@example.com or +1 555-' ||
               lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' from 10.0.' ||
               CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR) || '.' ||
               ' SSN ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
               lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-' ||
               lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
               ' card 4111' || lpad(CAST(doc_id % 10000 AS VARCHAR), 12, '0') || '.' AS t
        FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(t, '${TA.PiiEmailPattern}')) AS BIGINT) AS n_email,
             CAST(len(regexp_extract_all(t, '${TA.PiiPhonePattern}')) AS BIGINT) AS n_phone,
             CAST(len(regexp_extract_all(t, '${TA.PiiIpv4Pattern}')) AS BIGINT) AS n_ip,
             CAST(len(regexp_extract_all(t, '${TA.PiiSsnPattern}')) AS BIGINT) AS n_ssn,
             CAST(len(regexp_extract_all(t, '${TA.PiiCardPattern}')) AS BIGINT) AS n_card,
             md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
               '${TA.PiiEmailPattern}', '[EMAIL]', 'g'),
               '${TA.PiiSsnPattern}', '[SSN]', 'g'),
               '${TA.PiiPhonePattern}', '[PHONE]', 'g'),
               '${TA.PiiCardPattern}', '[CARD]', 'g'),
               '${TA.PiiIpv4Pattern}', '[IP]', 'g')) AS redacted_md5
      FROM aug ORDER BY doc_id
    """),
    // sub-0.2 s at sf0.1: the Spark task-scheduling floor, zero scale
    // signal - timed coverage lives in the correctness gate; dropping it
    // from the bench preserves the compact stdout line's precision budget
    benchmark = false)
  /** T8 — LM-perplexity quality scoring (the CCNet/Gopher filter): score
    * each document under a bigram language model trained on the corpus
    * itself — boilerplate and templated text sits in high-probability
    * regions (low avg negative log-likelihood), gibberish and mis-extracted
    * content in the tail, and a curation pass keeps the middle. Self-scored,
    * every document bigram has corpus count ≥ 1 (its own occurrence), so
    * P(w2|w1) = C(w1 w2)/C(w1 ·) needs no smoothing and stays in (0, 1].
    *
    * Scale shape: two bigram-keyed count aggregations (map-side partial
    * over the explode) and two joins back — the t5 tfidf pattern. At 100 TB
    * the LM tables are the aggregated model, orders smaller than the
    * corpus; a production pass would top-K-prune them and broadcast (rare
    * bigrams → a floor probability), which only re-scores the tail this
    * filter drops anyway.
    *
    * Determinism: per-bigram ln in IEEE double (both engines agree to ~ulp),
    * then the per-doc sum through DECIMAL(18,12) — exact, order-free — so
    * shuffle/partitioning can't move the 6-decimal-rounded compare.
    */
  val t8LmPerplexity = QueryDef(
    "t8_lm_perplexity",
    (s, dir) => {
      val bg = Td(s, dir, "documents")
        .select(col("doc_id"), explode(TA.bigramsAll(col("text"))).as("bigram"))
      val c2 = bg.groupBy(col("bigram")).agg(count(lit(1)).as("c2"))
      val c1 = bg.groupBy(substring_index(col("bigram"), " ", 1).as("w1"))
        .agg(count(lit(1)).as("c1"))
      val lp = log(col("c2") / col("c1"))
      bg.join(c2, Seq("bigram"))
        .withColumn("w1", substring_index(col("bigram"), " ", 1))
        .join(c1, Seq("w1"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_bigrams"),
          (-sum(lp.cast(org.apache.spark.sql.types.DecimalType(18, 12)))
            .cast("double") / count(lit(1))).as("avg_nll"))
        .withColumn("ppl", exp(col("avg_nll")))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ws)-1),
               i -> ws[i] || ' ' || ws[i+1])) AS bigram
             FROM w WHERE len(ws) >= 2),
      c2 AS (SELECT bigram, count(*) AS c2 FROM bg GROUP BY 1),
      c1 AS (SELECT split_part(bigram, ' ', 1) AS w1, count(*) AS c1 FROM bg GROUP BY 1),
      j AS (SELECT doc_id, ln(CAST(c2.c2 AS DOUBLE) / CAST(c1.c1 AS DOUBLE)) AS lp
            FROM bg JOIN c2 USING (bigram)
                    JOIN c1 ON split_part(bg.bigram, ' ', 1) = c1.w1),
      d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                   CAST(-SUM(CAST(lp AS DECIMAL(18,12))) AS DOUBLE) / count(*) AS avg_nll
            FROM j GROUP BY doc_id)
      SELECT doc_id, n_bigrams, avg_nll, exp(avg_nll) AS ppl
      FROM d ORDER BY doc_id
    """))

  /** D15 — paragraph-level (sub-document) dedup, Dolma/CCNet-style: flag
    * chunks whose document frequency clears a corpus-proportional threshold
    * (df ≥ ceil(|docs|/50), integer math both engines) as boilerplate and
    * hash the cleaned reconstruction. The single-line synthetic corpus has
    * no \\n\\n paragraph boundaries, so segmentation is 2-token windows —
    * the boundary rule is a parameter of [[graft.ext.Paragraphs.chunks]],
    * the df/reconstruction machinery is boundary-agnostic.
    */
  val d15ParagraphDedup = QueryDef(
    "d15_paragraph_dedup",
    (s, dir) => {
      val ch = graft.ext.Paragraphs.chunks(
        Td(s, dir, "documents"), "doc_id", "text", chunkTokens = 2)
      graft.ext.Paragraphs.boilerplateClean(ch, "doc_id")
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      c AS (SELECT doc_id, unnest(generate_series(0, (len(ws)-1)//2)) AS pos, ws FROM w),
      ch AS (SELECT doc_id, pos, array_to_string(ws[pos*2+1:pos*2+2], ' ') AS chunk FROM c),
      dfq AS (SELECT md5(chunk) AS h, count(DISTINCT doc_id) AS df FROM ch GROUP BY 1),
      n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM ch),
      j AS (SELECT ch.doc_id, ch.pos, ch.chunk,
                   (dfq.df >= greatest(2, (n.n_docs + 49) // 50)) AS boiler
            FROM ch JOIN dfq ON md5(ch.chunk) = dfq.h CROSS JOIN n)
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
             md5(coalesce(string_agg(chunk, ' ' ORDER BY pos) FILTER (WHERE NOT boiler), ''))
               AS clean_md5
      FROM j GROUP BY doc_id ORDER BY doc_id
    """))

  /** D16 — paragraph dedup under the REAL boundary rule: `\n\n` splitting
    * ([[graft.ext.Paragraphs.chunksBySplit]]), not d15's synthetic token
    * windows. The single-line corpus has no paragraph boundaries, so the
    * query plants them (the t7 planting pattern): every document gains a
    * universal "subscribe" paragraph (df = |docs|, always boilerplate) and
    * a footer shared by its doc_id % 7 class (df ≈ |docs|/7, above the
    * ceil(|docs|/50) threshold), while the original text stays the first
    * paragraph. The df/reconstruction machinery is d15's, unchanged — only
    * the segmentation differs, which is exactly what this row pins.
    */
  val d16ParagraphSplit = QueryDef(
    "d16_paragraph_split",
    (s, dir) => {
      val planted = Td(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit("\n\nSubscribe to our newsletter today\n\nFooter "),
          (col("doc_id") % 7).cast("string")).as("text"))
      val ch = graft.ext.Paragraphs.chunksBySplit(planted, "doc_id", "text")
      graft.ext.Paragraphs.boilerplateClean(ch, "doc_id")
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH aug AS (
        SELECT doc_id,
               text || chr(10) || chr(10) || 'Subscribe to our newsletter today' ||
               chr(10) || chr(10) || 'Footer ' || CAST(doc_id % 7 AS VARCHAR) AS t
        FROM documents),
      w AS (SELECT doc_id, string_split(t, chr(10) || chr(10)) AS ps FROM aug),
      c AS (SELECT doc_id, unnest(generate_series(1, len(ps))) AS i, ps FROM w),
      ch AS (SELECT doc_id, i - 1 AS pos, ps[i] AS chunk FROM c),
      dfq AS (SELECT md5(chunk) AS h, count(DISTINCT doc_id) AS df FROM ch GROUP BY 1),
      n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM ch),
      j AS (SELECT ch.doc_id, ch.pos, ch.chunk,
                   (dfq.df >= greatest(2, (n.n_docs + 49) // 50)) AS boiler
            FROM ch JOIN dfq ON md5(ch.chunk) = dfq.h CROSS JOIN n)
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
             md5(coalesce(string_agg(chunk, ' ' ORDER BY pos) FILTER (WHERE NOT boiler), ''))
               AS clean_md5
      FROM j GROUP BY doc_id ORDER BY doc_id
    """),
    // d15 times the chunk-df shape; the only delta is the splitter expr —
    // keeping it out preserves the compact bench line's headroom
    benchmark = false)

  /** D18 — WITHIN-document chunk dedup ([[graft.ext.Paragraphs.dedupWithinDoc]]):
    * the intra-doc pass d15/d16 deliberately do NOT perform (their df counts
    * documents, so a chunk repeated only inside one document survives).
    * Real pages repeat their own nav/share/footer blocks; this strips the
    * repeats keeping the first occurrence in reading order. The single-line
    * corpus has no intra-doc repeats, so the query plants them on a third
    * of the documents (doc_id % 3 = 0 gains the same "share" paragraph
    * twice; everyone else once — both populations present, so kept-vs-
    * removed behavior is non-vacuous in one artifact row).
    */
  val d18DedupWithinDoc = QueryDef(
    "d18_dedup_withindoc",
    (s, dir) => {
      val planted = Td(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit("\n\nShare this page with your friends"),
          when(col("doc_id") % 3 === 0,
            lit("\n\nShare this page with your friends")).otherwise(lit("")))
          .as("text"))
      val ch = graft.ext.Paragraphs.chunksBySplit(planted, "doc_id", "text")
      graft.ext.Paragraphs.dedupWithinDoc(ch, "doc_id")
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH aug AS (
        SELECT doc_id,
               text || chr(10) || chr(10) || 'Share this page with your friends' ||
               CASE WHEN doc_id % 3 = 0
                 THEN chr(10) || chr(10) || 'Share this page with your friends'
                 ELSE '' END AS t
        FROM documents),
      w AS (SELECT doc_id, string_split(t, chr(10) || chr(10)) AS ps FROM aug),
      c AS (SELECT doc_id, unnest(generate_series(1, len(ps))) AS i, ps FROM w),
      ch AS (SELECT doc_id, i - 1 AS pos, ps[i] AS chunk FROM c),
      f AS (SELECT doc_id, chunk, min(pos) AS pos, count(*) AS n_occ
            FROM ch GROUP BY 1, 2)
      SELECT doc_id,
             CAST(sum(n_occ) AS BIGINT) AS n_chunks,
             CAST(sum(n_occ) - count(*) AS BIGINT) AS n_dupes,
             md5(string_agg(chunk, ' ' ORDER BY pos)) AS clean_md5
      FROM f GROUP BY doc_id ORDER BY doc_id
    """))

  /** X7 — stratified deterministic sampling (the data-mixing op): keep 1/2
    * of English docs and 1/4 of everything else, selected by md5 id-bucket
    * — content-independent, partitioning-independent, and replayable as a
    * plain WHERE in any engine (no RNG anywhere). At 100 TB this is a
    * codegen'd filter riding the scan: no shuffle, no per-stratum pass.
    */
  val x7StratifiedSample = QueryDef(
    "x7_stratified_sample",
    (s, dir) =>
      Sampling.stratified(Td(s, dir, "documents"), "doc_id", "lang",
          rates = Seq("en" -> 2), defaultRate = 4)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id")),
    Some(s"""
      SELECT doc_id, lang, source FROM documents
      WHERE ${sampleBucketSql("doc_id")} % (CASE WHEN lang = 'en' THEN 2 ELSE 4 END) = 0
      ORDER BY doc_id
    """),
    // 0.1 s at sf0.1 — pure scheduling floor, zero scale signal; trimmed
    // from the bench when s19 joined so the compact stdout line stays
    // inside the driver's 2000-char tail (r14 protocol: timed coverage
    // lives in the correctness gate)
    benchmark = false)

  /** T10 — Unicode script detection ([[graft.ext.TextAnalysis
    * .dominantScript]]): char-level script profile + argmax, the pass a
    * crawl pipeline runs BEFORE word-level language ID (script picks the
    * tokenizer). Plants splice Cyrillic/Han/Arabic runs into the Latin
    * corpus; the oracle counts the same Unicode script properties via RE2
    * `\p{Script}` classes and replays the same first-max CASE chain —
    * whichever side of a near-tie wins, it wins identically in both
    * engines.
    */
  val t10ScriptDetect = QueryDef(
    "t10_script_detect",
    (s, dir) => {
      val id = col("doc_id")
      val head = col("text").substr(1, 20)
      val planted = when(id % 4 === 0, concat(head, lit(" \u0416\u0438\u0437\u043D\u044C")))
        .when(id % 4 === 1,
          concat(lit("\u4E2D\u6587\u6D4B\u8BD5\u4E2D\u6587\u6D4B\u8BD5 "), head))
        .when(id % 4 === 2,
          concat(lit("\u0627\u0644\u0639\u0631\u0628\u064A\u0629 "), head))
        .otherwise(col("text"))
      Td(s, dir, "documents")
        .select(col("doc_id"),
          TA.scriptCount(planted, "\\p{IsLatin}").as("n_latin"),
          TA.scriptCount(planted, "\\p{IsCyrillic}").as("n_cyrillic"),
          TA.scriptCount(planted, "\\p{IsHan}").as("n_han"),
          TA.scriptCount(planted, "\\p{IsArabic}").as("n_arabic"),
          TA.dominantScript(planted).as("script"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH aug AS (SELECT doc_id, CASE doc_id % 4
        WHEN 0 THEN substr(text, 1, 20) || ' ' ||
                    chr(1046) || chr(1080) || chr(1079) || chr(1085) || chr(1100)
        WHEN 1 THEN chr(20013) || chr(25991) || chr(27979) || chr(35797) ||
                    chr(20013) || chr(25991) || chr(27979) || chr(35797) || ' ' ||
                    substr(text, 1, 20)
        WHEN 2 THEN chr(1575) || chr(1604) || chr(1593) || chr(1585) ||
                    chr(1576) || chr(1610) || chr(1577) || ' ' || substr(text, 1, 20)
        ELSE text END AS s
        FROM documents),
      c AS (SELECT doc_id,
        CAST(len(regexp_extract_all(s, '[\p{Latin}]')) AS BIGINT) AS n_latin,
        CAST(len(regexp_extract_all(s, '[\p{Cyrillic}]')) AS BIGINT) AS n_cyrillic,
        CAST(len(regexp_extract_all(s, '[\p{Han}]')) AS BIGINT) AS n_han,
        CAST(len(regexp_extract_all(s, '[\p{Arabic}]')) AS BIGINT) AS n_arabic,
        CAST(len(regexp_extract_all(s, '[\p{Devanagari}]')) AS BIGINT) AS n_dev
        FROM aug),
      m AS (SELECT *, greatest(n_latin, n_cyrillic, n_han, n_arabic, n_dev) AS best FROM c)
      SELECT doc_id, n_latin, n_cyrillic, n_han, n_arabic,
             CASE WHEN best = 0 THEN 'none'
                  WHEN n_latin = best THEN 'latin'
                  WHEN n_cyrillic = best THEN 'cyrillic'
                  WHEN n_han = best THEN 'han'
                  WHEN n_arabic = best THEN 'arabic'
                  ELSE 'devanagari' END AS script
      FROM m ORDER BY doc_id
    """),
    // per-row regex count map — t3 already times the char-class scan
    // pattern; keeping it out preserves the compact bench line's headroom
    benchmark = false)

  /** X12 — temperature-weighted mixture sampling
    * ([[graft.ext.Sampling.temperatureMix]]): the recipe is DERIVED from
    * per-stratum counts (kept docs ∝ c^0.5), not hand-written — the
    * standard flattening pass over a multilingual corpus. The oracle
    * replays the exact arithmetic: same count, same floored k/256 bucket
    * quantization, same md5-nibble membership, so any drift in the rate
    * computation or the join flips rows.
    */
  val x12TemperatureMix = QueryDef(
    "x12_temperature_mix",
    (s, dir) =>
      Sampling.temperatureMix(Td(s, dir, "documents"), "doc_id", "lang", alpha = 0.5)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id")),
    Some(s"""
      WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
      r AS (SELECT lang, GREATEST(1, LEAST(256,
              CAST(floor(pow(CAST(n AS DOUBLE) / (SELECT MIN(n) FROM c), -0.5) * 256) AS INTEGER)
            )) AS k FROM c)
      SELECT d.doc_id, d.lang, d.source
      FROM documents d JOIN r ON d.lang = r.lang
      WHERE ${sampleBucketSql("d.doc_id")} < r.k
      ORDER BY d.doc_id
    """),
    // map-side count + broadcast-joined filter — x7 already times the
    // pattern; keeping it out preserves the compact bench line's headroom
    benchmark = false)

  /** X13 — curriculum tiling ([[graft.ext.Ranking.globalRankTiles]]):
    * exact global quality rank + equal-count tier buckets over the corpus,
    * WITHOUT the single-task global window (range repartition → local
    * row_number → tiny offset broadcast; see Ranking's scaladoc). The
    * score is t2's already-oracle-proven quality expression, so cross-
    * engine double equality is established; the oracle's plain
    * `row_number() OVER (ORDER BY quality, doc_id)` must then agree with
    * the distributed recomposition rank-for-rank.
    */
  val x13CurriculumTiles = QueryDef(
    "x13_curriculum_tiles",
    (s, dir) => {
      val scored = Td(s, dir, "documents")
        .select(col("doc_id"), TA.qualityScore(col("text")).as("quality"))
      graft.ext.Ranking.globalRankTiles(scored, "quality", "doc_id", tiles = 4)
        .select(col("doc_id"), col("quality"), col("rank"), col("tier"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH b AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(lower(text), '[^a-z0-9\\s]')) AS DOUBLE)
                 / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio,
               CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                 x -> list_contains(${sqlList(TA.Stopwords)}, x))) AS DOUBLE)
                 / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS stop_ratio,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS n_tok
        FROM documents),
      q AS (SELECT doc_id,
              0.5 * least(n_tok / 64.0, 1.0) + 0.5 * least(stop_ratio * 4.0, 1.0)
                - punct_ratio * 2.0 AS quality
            FROM b),
      r AS (SELECT doc_id, quality,
              row_number() OVER (ORDER BY quality, doc_id) AS rank,
              count(*) OVER () AS total
            FROM q)
      SELECT doc_id, quality, CAST(rank AS BIGINT) AS rank,
             CAST((rank - 1) * 4 // total AS INTEGER) AS tier
      FROM r ORDER BY doc_id
    """),
    // range shuffle + per-partition window — o1/w1 time both halves;
    // keeping it out preserves the compact bench line's headroom
    benchmark = false)

  /** X14 — per-source quality quota ([[graft.ext.Ranking.topKPerGroup]]):
    * keep the 3 best-quality docs per crawl source, via the salted
    * two-phase top-k that caps any one group's work at
    * k·saltBuckets rows per task regardless of group size (w1 times the
    * direct single-window form; this is its hot-domain-proof twin). The
    * oracle is the definitional single window — the salted recomposition
    * must match it row-for-row.
    */
  val x14DomainQuota = QueryDef(
    "x14_domain_quota",
    (s, dir) => {
      val scored = Td(s, dir, "documents")
        .select(col("doc_id"), col("source"), TA.qualityScore(col("text")).as("quality"))
      graft.ext.Ranking.topKPerGroup(scored, "source", "quality", "doc_id", k = 3)
        .select(col("doc_id"), col("source"), col("quality"), col("grp_rank"))
        .orderBy(col("source"), col("grp_rank"))
    },
    Some(s"""
      WITH b AS (
        SELECT doc_id, source,
               CAST(len(regexp_extract_all(lower(text), '[^a-z0-9\\s]')) AS DOUBLE)
                 / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio,
               CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                 x -> list_contains(${sqlList(TA.Stopwords)}, x))) AS DOUBLE)
                 / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS stop_ratio,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS n_tok
        FROM documents),
      q AS (SELECT doc_id, source,
              0.5 * least(n_tok / 64.0, 1.0) + 0.5 * least(stop_ratio * 4.0, 1.0)
                - punct_ratio * 2.0 AS quality
            FROM b),
      r AS (SELECT doc_id, source, quality,
              row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS grp_rank
            FROM q)
      SELECT doc_id, source, quality, CAST(grp_rank AS BIGINT) AS grp_rank
      FROM r WHERE grp_rank <= 3 ORDER BY source, grp_rank
    """),
    // two chained ranking windows — w1 times the pattern's hot half;
    // keeping it out preserves the compact bench line's headroom
    benchmark = false)

  /** X15 — corpus-overlap matrix ([[graft.ext.Dedup.sourceOverlap]]):
    * estimated shingle-set Jaccard between every crawl-source pair from
    * per-source MinHash signatures — corpus-size work is one distinct +
    * one aggregation; the quadratic pair step runs on a |sources|-row
    * broadcast table. The oracle replays signature and estimate exactly
    * (same md5 family, integer match-count / numHashes).
    */
  val x15SourceOverlap = QueryDef(
    "x15_source_overlap",
    (s, dir) =>
      Dedup.sourceOverlap(Td(s, dir, "documents"), "source", "text", numHashes = 16)
        .orderBy(col("src_a"), col("src_b")),
    Some {
      val sigs = (0 until 16).map(i => s"min(md5('$i:' || shingle)) AS h$i").mkString(", ")
      val m = (0 until 16).map(i => s"CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""
      WITH w AS (SELECT source, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents),
      sh0 AS (SELECT source, unnest(list_distinct(
               CASE WHEN len(ws) >= 3
                 THEN list_transform(generate_series(1, len(ws)-2), i -> array_to_string(ws[i:i+2], ' '))
                 ELSE [array_to_string(ws, ' ')] END)) AS shingle FROM w),
      sh AS (SELECT DISTINCT source, shingle FROM sh0),
      sig AS (SELECT source, $sigs FROM sh GROUP BY source)
      SELECT a.source AS src_a, b.source AS src_b,
             CAST($m AS DOUBLE) / 16 AS est_jaccard
      FROM sig a JOIN sig b ON a.source < b.source
      ORDER BY src_a, src_b
    """
    },
    // one distinct + one agg + tiny broadcast self-join — d1/d3 time the
    // corpus-scale halves; keeping it out preserves the bench line's headroom
    benchmark = false)

  /** X16 — crawl snapshot diff ([[graft.ext.Dedup.snapshotDiff]]): the
    * "next crawl" is derived from the base deterministically (every 7th id
    * vanishes, every remaining 5th mutates, every 3rd spawns a new id), so
    * the expected status of every id is ground truth the oracle rebuilds
    * with the same arithmetic — added/removed/changed/unchanged must land
    * exactly.
    */
  val x16SnapshotDiff = QueryDef(
    "x16_snapshot_diff",
    (s, dir) => {
      val id = col("doc_id")
      val base = Td(s, dir, "documents").select(id, col("text"))
      val next = base.filter(id % 7 =!= 0)
        .select(id, when(id % 5 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
        .unionByName(base.filter(id % 3 === 0)
          .select((id + 9000000L).as("doc_id"), concat(lit("new "), col("text")).as("text")))
      Dedup.snapshotDiff(base, next, "doc_id", "text")
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH base AS (SELECT doc_id, text FROM documents),
      nxt AS (
        SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
        FROM base WHERE doc_id % 7 <> 0
        UNION ALL
        SELECT doc_id + 9000000, 'new ' || text FROM base WHERE doc_id % 3 = 0),
      b AS (SELECT doc_id, md5(text) AS hb FROM base),
      n AS (SELECT doc_id, md5(text) AS hn FROM nxt)
      SELECT COALESCE(b.doc_id, n.doc_id) AS doc_id,
             CASE WHEN b.doc_id IS NULL THEN 'added'
                  WHEN n.doc_id IS NULL THEN 'removed'
                  WHEN hb = hn THEN 'unchanged'
                  ELSE 'changed' END AS status
      FROM b FULL OUTER JOIN n ON b.doc_id = n.doc_id
      ORDER BY doc_id
    """),
    // digest-projected full-outer join — j6/d1 time the join/digest halves;
    // keeping it out preserves the compact bench line's headroom
    benchmark = false)

  /** X17 — int8 embedding quantization
    * ([[org.apache.spark.sql.graft.QuantizeI8]]): the 4× storage cut of a
    * 100 TB vector store, as native codegen'd expressions. Per vector:
    * the scale (max|x|/127), the EXACT integer L1 mass of the quantized
    * codes, their min/max (must reach ±127 on the max element), and the
    * reconstruction MSE via the strict left-fold both engines share. The
    * oracle replays quantization arithmetic exactly — floor-based
    * round-half-up, because the engines' `round()` built-ins disagree on
    * ties while floor and IEEE division are bit-identical.
    */
  val x17EmbedQuantize = QueryDef(
    "x17_embed_quantize",
    (s, dir) => {
      import org.apache.spark.sql.graft.QuantizeI8
      val v = col("embedding").cast("array<double>")
      val sc = QuantizeI8.scale(v)
      val q = QuantizeI8.quantize(v)
      Td(s, dir, "embeddings")
        .select(col("vec_id"), sc.as("scale"), q.as("q"), v.as("v"))
        .select(col("vec_id"), col("scale"),
          aggregate(col("q"), lit(0L), (acc, x) => acc + abs(x)).as("q_l1"),
          array_min(col("q")).as("q_min"), array_max(col("q")).as("q_max"),
          (aggregate(
            zip_with(col("v"), col("q"), (a, b) =>
              (a - b * col("scale")) * (a - b * col("scale"))),
            lit(0.0), (acc, x) => acc + x) / size(col("v"))).as("mse"))
        .orderBy(col("vec_id"))
    },
    Some("""
      WITH b AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
        FROM embeddings),
      qq AS (
        SELECT vec_id, v, scale,
               CASE WHEN scale = 0
                 THEN list_transform(v, x -> 0)
                 ELSE list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INTEGER)) END AS q
        FROM b)
      SELECT vec_id, scale,
             CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS q_l1,
             list_min(q) AS q_min, list_max(q) AS q_max,
             list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(v)),
                 i -> (v[i] - q[i] * scale) * (v[i] - q[i] * scale))),
               (a, x) -> a + x) / len(v) AS mse
      FROM qq ORDER BY vec_id
    """),
    // two codegen'd per-row maps + fold — t1/d5 time the shapes;
    // keeping it out preserves the compact bench line's headroom
    benchmark = false)

  /** The MinHash-LSH verified-pairs CTE chain (mirrors Dedup.minhashDedup)
    * over any source CTE exposing (doc_id, text). Yields CTE `mh_pairs`
    * with (id_a, id_b, jaccard ≥ threshold).
    */
  private def minhashPairsSql(src: String, threshold: Double,
      digest: Boolean = false): String = {
    val sigs = (0 until 12).map(i => s"min(md5('$i:' || shingle)) AS h$i").mkString(", ")
    val bandSelects = (0 until 3).map { b =>
      val cat = (0 until 4).map(r => s"h${b * 4 + r}").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($cat) AS bucket FROM mh_sig"
    }.mkString("\n        UNION ALL ")
    // digest mode: downstream CTEs hash/join/count md5(shingle) — the exact
    // lowercase hex the engine's digest-stored index hashes — instead of
    // the raw shingle (neither engine dedupes digests: identical multisets)
    val shCte =
      if (digest)
        """mh_sh0 AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(ws) >= 3
                 THEN list_transform(generate_series(1, len(ws)-2), i -> array_to_string(ws[i:i+2], ' '))
                 ELSE [array_to_string(ws, ' ')] END)) AS shingle FROM mh_w),
      mh_sh AS (SELECT doc_id, md5(shingle) AS shingle FROM mh_sh0),"""
      else
        """mh_sh AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(ws) >= 3
                 THEN list_transform(generate_series(1, len(ws)-2), i -> array_to_string(ws[i:i+2], ' '))
                 ELSE [array_to_string(ws, ' ')] END)) AS shingle FROM mh_w),"""
    s"""mh_w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM $src),
      $shCte
      mh_sizes AS (SELECT doc_id, count(*) AS n FROM mh_sh GROUP BY 1),
      mh_sig AS (SELECT doc_id, $sigs FROM mh_sh GROUP BY doc_id),
      mh_eb AS ($bandSelects),
      mh_cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
               FROM mh_eb a JOIN mh_eb b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
      mh_inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
                FROM mh_sh a JOIN mh_sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
      mh_pairs AS (
        SELECT i.id_a, i.id_b,
               CAST(n_inter AS DOUBLE) / CAST(x.n + y.n - n_inter AS DOUBLE) AS jaccard
        FROM mh_inter i JOIN mh_cand c ON i.id_a = c.id_a AND i.id_b = c.id_b
        JOIN mh_sizes x ON i.id_a = x.doc_id JOIN mh_sizes y ON i.id_b = y.doc_id
        WHERE CAST(n_inter AS DOUBLE) / CAST(x.n + y.n - n_inter AS DOUBLE) >= $threshold)"""
  }

  /** C1 — the composed curation pipeline, the training-data use case
    * end-to-end: quality filter → exact dedup (keep min id per digest) →
    * MinHash near-dup drop (keep the lower id of each pair) → kept docs.
    * Every stage is the already-verified operator; the oracle replays the
    * same composition.
    */
  /** C5 — the crawl FRONT-END composed end-to-end: Unicode normalization
    * → script gate (keep Latin-dominant) → quality gate → exact dedup on
    * the NORMALIZED text (so `e`+U+0301 and `é` spellings of the same page
    * collapse — the reason normalization precedes dedup). Plants force
    * each gate to act: every 6th doc becomes Han-dominant (script gate
    * drops it), every 6th+2 arrives dirty (NFC/controls/double spaces —
    * normalization must repair it before the digest). The oracle replays
    * all four stages with the already-verified t9/t10/t2/d1 fragments.
    */
  val c5NormalizedCuration = QueryDef(
    "c5_normalized_curation",
    (s, dir) => {
      import org.apache.spark.sql.graft.NormalizeText
      val id = col("doc_id")
      val head = col("text").substr(1, 10)
      val planted = when(id % 6 === 1,
          concat(lit("\u4E2D\u6587\u6D4B\u8BD5\u4E2D\u6587\u6D4B\u8BD5\u4E2D\u6587\u6D4B\u8BD5\u4E2D\u6587\u6D4B\u8BD5\u4E2D\u6587\u6D4B\u8BD5\u4E2D\u6587\u6D4B\u8BD5 "), head))
        .when(id % 6 === 2, concat(lit("  He\u0301llo\t"), col("text")))
        .otherwise(col("text"))
      val normed = Td(s, dir, "documents")
        .select(id, NormalizeText.normalizeText(planted).as("text"))
      val gated = normed
        .filter(TA.dominantScript(col("text")) === "latin")
        .filter(TA.qualityScore(col("text")) >= 0.3)
      gated.groupBy(md5(col("text")).as("content_md5"))
        .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("keep_id"))
    },
    Some {
      val han = (1 to 6).map(_ => "chr(20013) || chr(25991) || chr(27979) || chr(35797)")
        .mkString(" || ")
      s"""
      WITH aug AS (SELECT doc_id, CASE doc_id % 6
        WHEN 1 THEN $han || ' ' || substr(text, 1, 10)
        WHEN 2 THEN '  H' || 'e' || chr(769) || 'llo' || chr(9) || text
        ELSE text END AS s
        FROM documents),
      norm AS (SELECT doc_id, ${org.apache.spark.sql.graft.NormalizeText.duckSql("s")} AS text
               FROM aug),
      sc AS (SELECT doc_id, text,
        CAST(len(regexp_extract_all(text, '[\\p{Latin}]')) AS BIGINT) AS n_lat,
        CAST(len(regexp_extract_all(text, '[\\p{Cyrillic}]')) AS BIGINT) AS n_cyr,
        CAST(len(regexp_extract_all(text, '[\\p{Han}]')) AS BIGINT) AS n_han,
        CAST(len(regexp_extract_all(text, '[\\p{Arabic}]')) AS BIGINT) AS n_ara,
        CAST(len(regexp_extract_all(text, '[\\p{Devanagari}]')) AS BIGINT) AS n_dev
        FROM norm),
      lat AS (SELECT doc_id, text FROM sc
        WHERE greatest(n_lat, n_cyr, n_han, n_ara, n_dev) > 0
          AND n_lat = greatest(n_lat, n_cyr, n_han, n_ara, n_dev)),
      q AS (SELECT doc_id, text,
               0.5 * least(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) / 64.0, 1.0)
                 + 0.5 * least((CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                     x -> list_contains(${sqlList(TA.Stopwords)}, x))) AS DOUBLE)
                   / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE)) * 4.0, 1.0)
                 - (CAST(len(regexp_extract_all(lower(text), '[^a-z0-9\\s]')) AS DOUBLE)
                   / CAST(greatest(length(text), 1) AS DOUBLE)) * 2.0 AS quality
        FROM lat)
      SELECT md5(text) AS content_md5, min(doc_id) AS keep_id, count(*) AS n_copies
      FROM q WHERE quality >= 0.3
      GROUP BY md5(text) ORDER BY keep_id
    """
    },
    // composes already-benched stages (t9/t10/t2/d1 shapes) —
    // keeping it out preserves the compact bench line's headroom
    benchmark = false)

  val c1Curation = QueryDef(
    "c1_curation",
    (s, dir) => {
      val scored = Td(s, dir, "documents")
        .select(col("doc_id"), col("text"), TA.qualityScore(col("text")).as("quality"))
      val kept = scored.filter(col("quality") >= 0.4)
      // exact dedup as ONE windowed pass (rank by doc_id within digest):
      // the groupBy-min + semi-join form evaluates the regex-heavy `kept`
      // subtree twice before the stage write — same result, double the
      // pre-stage scoring work
      val digestW = org.apache.spark.sql.expressions.Window
        .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      // ek feeds three downstream passes (signature, candidate verify,
      // final anti-join); within one plan Spark re-evaluates the shared
      // subtree each time. Stage it to parquet — the at-scale pattern (an
      // intermediate stage table) and the measured winner: 4.4s vs 5.8s
      // plain vs 8.2s block-manager cache at sf0.1 (cache serializes
      // text rows more expensively than a columnar write+read). The stage
      // lives in shared-FS scratch (Scratch.store), NOT a driver-local temp
      // dir, so executor shards land where every node can read them. The
      // stage name is per-invocation (generation counter, no wall clock) so
      // interleaved c1 runs can't clobber each other; gc() drops stale
      // generations, bounding what bench loops leave behind.
      val ek = graft.tables.Scratch.stage(
        kept.withColumn("_gm_rn", row_number().over(digestW))
          .filter(col("_gm_rn") === 1).drop("_gm_rn"),
        "c1_ek_stage")
      val dropIds = Dedup.minhashDedup(ek, "doc_id", "text", n = 3, k = 12, bands = 3, threshold = 0.8)
        .select(col("id_b").as("doc_id")).distinct()
      ek.join(dropIds, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("quality"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH q AS (
        SELECT doc_id, text,
               0.5 * least(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) / 64.0, 1.0)
                 + 0.5 * least((CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                     x -> list_contains(${sqlList(TA.Stopwords)}, x))) AS DOUBLE)
                   / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE)) * 4.0, 1.0)
                 - (CAST(len(regexp_extract_all(lower(text), '[^a-z0-9\\s]')) AS DOUBLE)
                   / CAST(greatest(length(text), 1) AS DOUBLE)) * 2.0 AS quality
        FROM documents),
      kept AS (SELECT * FROM q WHERE quality >= 0.4),
      exact AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
      ek AS (SELECT k.* FROM kept k JOIN exact e ON k.doc_id = e.doc_id),
      ${minhashPairsSql("ek", 0.8)},
      drops AS (SELECT DISTINCT id_b AS doc_id FROM mh_pairs)
      SELECT ek.doc_id, ek.quality
      FROM ek LEFT JOIN drops d ON ek.doc_id = d.doc_id
      WHERE d.doc_id IS NULL
      ORDER BY ek.doc_id
    """))

  /** C2 — the full curation RECIPE end-to-end (complements c1's near-dup
    * focus): quality score + predicted language + repetition ratio as
    * filters → exact dedup (keep min id per digest) → stratified
    * deterministic sampling by source (keep all of src0, half of the
    * rest — the data-mixing step). Every stage is an already-verified
    * operator (t2, t3, t6, d1, x7); the oracle replays the identical
    * composition, so filter thresholds, classifier tie-breaks, digest
    * grouping, and the mixing recipe are all pinned cross-engine at once.
    */
  val c2CurationRecipe = QueryDef(
    "c2_curation_recipe",
    (s, dir) => {
      val docs = Td(s, dir, "documents")
      val scored = docs.select(col("doc_id"), col("text"), col("source"),
        TA.qualityScore(col("text")).as("quality"),
        TA.langId(col("text")).as("lang_pred"))
      val rep = docs
        .select(col("doc_id"), explode(TA.bigramsAll(col("text"))).as("bigram"))
        .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg((max(col("cnt")).cast("double") / sum(col("cnt")).cast("double")).as("rep_ratio"))
      val kept = scored.join(rep, Seq("doc_id"))
        .filter(col("quality") >= 0.4 && col("lang_pred") === "en" && col("rep_ratio") <= 0.1)
      // windowed exact dedup — one pass over kept, no self-join (see c1)
      val digestW = org.apache.spark.sql.expressions.Window
        .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val ek = kept.withColumn("_gm_rn", row_number().over(digestW))
        .filter(col("_gm_rn") === 1).drop("_gm_rn")
      Sampling.stratified(ek, "doc_id", "source", rates = Seq("src0" -> 1), defaultRate = 2)
        .select(col("doc_id"), col("source"), col("quality"), col("rep_ratio"))
        .orderBy(col("doc_id"))
    },
    Some {
      val counts = TA.LangMarkers.map { case (l, m) =>
        s"CAST(len(list_filter(ws, x -> list_contains(${sqlList(m)}, x))) AS BIGINT) AS ${l}_n"
      }.mkString(",\n               ")
      val langs = TA.LangMarkers.map(_._1)
      val best = s"greatest(${langs.map(_ + "_n").mkString(", ")})"
      val caseArm = langs.map(l => s"WHEN ${l}_n = $best AND $best > 0 THEN '$l'").mkString(" ")
      s"""
      WITH w AS (SELECT doc_id, text, source, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents),
      scored AS (SELECT doc_id, text, source,
               0.5 * least(CAST(len(ws) AS DOUBLE) / 64.0, 1.0)
                 + 0.5 * least((CAST(len(list_filter(ws, x -> list_contains(${sqlList(TA.Stopwords)}, x))) AS DOUBLE)
                     / CAST(len(ws) AS DOUBLE)) * 4.0, 1.0)
                 - (CAST(len(regexp_extract_all(lower(text), '[^a-z0-9\\s]')) AS DOUBLE)
                   / CAST(greatest(length(text), 1) AS DOUBLE)) * 2.0 AS quality,
               CASE $caseArm ELSE 'und' END AS lang_pred
             FROM (SELECT *, $counts FROM w) langcounts),
      bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ws)-1),
               i -> ws[i] || ' ' || ws[i+1])) AS bigram FROM w WHERE len(ws) >= 2),
      bc AS (SELECT doc_id, bigram, count(*) AS cnt FROM bg GROUP BY 1, 2),
      rep AS (SELECT doc_id, CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS rep_ratio
              FROM bc GROUP BY 1),
      kept AS (SELECT s.*, rep.rep_ratio FROM scored s JOIN rep ON s.doc_id = rep.doc_id
               WHERE s.quality >= 0.4 AND s.lang_pred = 'en' AND rep.rep_ratio <= 0.1),
      exact AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
      ek AS (SELECT k.* FROM kept k JOIN exact e ON k.doc_id = e.doc_id)
      SELECT doc_id, source, quality, rep_ratio FROM ek
      WHERE ${sampleBucketSql("doc_id")} % (CASE WHEN source = 'src0' THEN 1 ELSE 2 END) = 0
      ORDER BY doc_id
    """
    })

  /** X1 — deterministic HyperLogLog sketch (m=64 registers, md5-based):
    * the "novel sketch" operator class. Unlike approx_count_distinct (whose
    * xxhash/HLL++ internals differ per engine), every step here is
    * cross-engine exact: md5 registers, nibble-CASE leading-zero count,
    * power-of-two register terms (all partial sums exact in 53-bit
    * mantissa ⇒ order-independent), raw Flajolet estimate with no
    * transcendental correction. ONE SQL text runs on both engines — the
    * Spark side executes it via spark.sql over a temp view.
    */
  val x1HllDistinct: QueryDef = {
    val nib = "'0123456789abcdef'"
    def nv(i: Int) = s"(instr($nib, substr(h, $i, 1)) - 1)"
    // leading zeros of one hex nibble (0..15) given its char
    def lzNibble(i: Int) =
      s"(CASE WHEN ${nv(i)} = 0 THEN 4 WHEN ${nv(i)} = 1 THEN 3 WHEN ${nv(i)} <= 3 THEN 2 WHEN ${nv(i)} <= 7 THEN 1 ELSE 0 END)"
    // rho over the 32 bits in hex chars 3..10: 4*(k-1) + lz(nibble_k) + 1
    val rho = (3 to 10).map { i =>
      s"WHEN substr(h, $i, 1) <> '0' THEN ${4 * (i - 3)} + ${lzNibble(i)} + 1"
    }.mkString("CASE ", " ", " ELSE 33 END")
    // 2^-M as exact double literals (M = 1..33)
    val term = (1 to 33).map(m =>
      s"WHEN M = $m THEN ${math.pow(2.0, -m)}").mkString("CASE ", " ", " ELSE 1.0 END")
    val sql = s"""
      WITH h AS (SELECT md5(CAST(o_custkey AS STRING)) AS h FROM %s),
      buck AS (SELECT ((${nv(1)} * 16 + ${nv(2)}) %% 64) AS bucket, $rho AS rho FROM h),
      regs AS (SELECT bucket, MAX(rho) AS M FROM buck GROUP BY bucket),
      terms AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_regs, SUM($term) AS reg_sum FROM regs),
      exact AS (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact FROM %s)
      SELECT n_exact, n_regs,
             0.709 * 64.0 * 64.0 / (reg_sum + (64.0 - n_regs) * 1.0) AS hll_estimate
      FROM terms CROSS JOIN exact
    """
    QueryDef(
      "x1_hll_distinct",
      (s, dir) => {
        Td(s, dir, "orders").createOrReplaceTempView("x1_orders")
        s.sql(sql.format("x1_orders", "x1_orders"))
      },
      Some(sql.format("orders", "orders")))
  }

  /** X2 — deterministic Lloyd k-means (3 iterations, k=8) over quantized
    * embeddings, then full-corpus IVF assignment to the trained centroids.
    * Oracles the entire training replay: any drift in seeding, tie-breaks,
    * mean arithmetic, or empty-cluster handling flips assignments.
    */
  val x2KmeansIvf = QueryDef(
    "x2_kmeans_ivf",
    (s, dir) => {
      val emb = Td(s, dir, "embeddings")
      val cents = Similarity.kmeansTrain(emb, "vec_id", "embedding", k = 8, iters = 3)
        .select(col("centroid_id").cast("long").as("vec_id"), col("embedding"))
      Similarity.ivfAssign(emb, cents, "vec_id", "embedding")
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"))
        .orderBy(col("vec_id"))
    },
    Some(s"""
      WITH $vecCte,
      ${kmeansCte(8, 3)},
      ${trainedCentSql(3)},
      asg0 AS (SELECT n.vec_id, cent.centroid_id,
                 ${dotSql.format("n.v", "centv")} / (n.nrm * centn) AS ccos
               FROM n CROSS JOIN cent),
      asg AS (SELECT vec_id, centroid_id AS cluster FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, centroid_id) AS rnk
                FROM asg0) WHERE rnk = 1)
      SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM asg ORDER BY vec_id
    """))

  /** DuckDB twin of [[Similarity.sampleBucket]]: first two md5 hex nibbles
    * of the id as an integer in [0, 256). Same md5, same nibble arithmetic
    * ⇒ the identical buckets in both engines. The ONE definition every
    * sampling oracle interpolates (x5/x7/c2/d8) — a drift here would
    * desync them all at once, loudly.
    */
  private def sampleBucketSql(idCol: String): String =
    s"((strpos('0123456789abcdef', substr(md5(CAST($idCol AS VARCHAR)), 1, 1)) - 1) * 16 + " +
      s"(strpos('0123456789abcdef', substr(md5(CAST($idCol AS VARCHAR)), 2, 1)) - 1))"

  /** Uniform-rate form: bucket % m == 0. */
  private def sampleFilterSql(idCol: String, m: Int): String =
    s"${sampleBucketSql(idCol)} % $m = 0"

  /** X5 — sampled k-means training, the documented 100 TB path in code:
    * centroids train on the deterministic ~1/4 md5-bucket sample of the
    * corpus, then the FULL corpus is IVF-assigned to them. The sample filter
    * is engine-independent (md5 nibbles, no RNG), so the oracle replays the
    * identical training subset — any drift in the sampling, seeding, or
    * Lloyd arithmetic flips assignments.
    */
  val x5KmeansSample = QueryDef(
    "x5_kmeans_sample",
    (s, dir) => {
      val emb = Td(s, dir, "embeddings")
      val cents = Similarity.kmeansTrain(emb, "vec_id", "embedding", k = 8, iters = 2,
          sampleMod = Some(4))
        .select(col("centroid_id").cast("long").as("vec_id"), col("embedding"))
      Similarity.ivfAssign(emb, cents, "vec_id", "embedding")
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"))
        .orderBy(col("vec_id"))
    },
    Some(s"""
      WITH $vecCte,
      ${kmeansCte(8, 2, srcWhere = s" WHERE ${sampleFilterSql("vec_id", 4)}")},
      ${trainedCentSql(2)},
      asg0 AS (SELECT n.vec_id, cent.centroid_id,
                 ${dotSql.format("n.v", "centv")} / (n.nrm * centn) AS ccos
               FROM n CROSS JOIN cent),
      asg AS (SELECT vec_id, centroid_id AS cluster FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, centroid_id) AS rnk
                FROM asg0) WHERE rnk = 1)
      SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM asg ORDER BY vec_id
    """),
    // x2 times the kmeans+assign shape (x5 is its cheaper sampled twin) —
    // keeping it out preserves the compact bench line's headroom
    benchmark = false)

  /** X3 — dedup-group formation: connected components over the verified
    * MinHash near-dup pairs (4 rounds of min-label propagation — a
    * jaccard-0.8 near-dup cluster with graph diameter over 4 does not
    * occur in practice, and the fixed round count is part of the query's
    * semantics: the oracle unrolls the identical rounds as chained CTEs,
    * so both engines agree converged or not).
    */
  val x3DedupGroups = QueryDef(
    "x3_dedup_groups",
    (s, dir) => {
      val pairs = Dedup.minhashDedup(Td(s, dir, "documents"), "doc_id", "text",
        n = 3, k = 12, bands = 3, threshold = 0.8)
      Dedup.components(pairs, iters = 4)
        .select(col("id").as("doc_id"), col("label").as("group_id"))
        .orderBy(col("doc_id"))
    },
    Some {
      // every round references its predecessor twice — MATERIALIZED stops
      // DuckDB's CTE inlining from expanding the whole minhash pipeline
      // 2^8 times (mirrors the Spark side's every-other-round staging)
      val rounds = (1 to 4).map { t =>
        s"""l$t AS MATERIALIZED (SELECT id, min(label) AS label FROM (
              SELECT id, label FROM l${t - 1}
              UNION ALL
              SELECT e.src AS id, l${t - 1}.label FROM e JOIN l${t - 1} ON e.dst = l${t - 1}.id
            ) u GROUP BY id)"""
      }.mkString(",\n      ")
      s"""
      WITH ${minhashPairsSql("documents", 0.8)},
      e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM mh_pairs
            UNION ALL SELECT id_b AS src, id_a AS dst FROM mh_pairs),
      n0 AS (SELECT DISTINCT src AS id FROM e),
      l0 AS MATERIALIZED (SELECT id, id AS label FROM n0),
      $rounds
      SELECT id AS doc_id, label AS group_id FROM l4 ORDER BY doc_id
    """
    })

  /** X6 — dedup groups to CONVERGENCE: [[Dedup.componentsConverged]]
    * (pointer-jumping min-label, O(log n) rounds) over the same verified
    * MinHash pair set as x3. Unlike x3's fixed-round contract, the output
    * here is the true component minimum for every node regardless of
    * diameter — which a recursive CTE expresses exactly (the transitive
    * closure's min reachable id), so even the convergent variant is
    * oracle-checked, not just property-tested.
    */
  val x6DedupGroupsConv = QueryDef(
    "x6_dedup_groups_conv",
    (s, dir) => {
      val pairs = Dedup.minhashDedup(Td(s, dir, "documents"), "doc_id", "text",
        n = 3, k = 12, bands = 3, threshold = 0.8)
      Dedup.componentsConverged(pairs)
        .select(col("id").as("doc_id"), col("label").as("group_id"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH RECURSIVE ${minhashPairsSql("documents", 0.8)},
      e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM mh_pairs
            UNION ALL SELECT id_b AS src, id_a AS dst FROM mh_pairs),
      reach AS (
        SELECT src AS id, src AS label FROM e
        UNION
        SELECT e.src AS id, reach.label FROM e JOIN reach ON e.dst = reach.id)
      SELECT id AS doc_id, min(label) AS group_id FROM reach GROUP BY id ORDER BY doc_id
    """),
    // the bench covers group formation via x3_dedup_groups (same pair set,
    // fixed rounds); this convergence variant is correctness surface
    benchmark = false)

  /** X11 — quality-aware representative selection over near-dup groups:
    * the decision a curation pipeline actually makes after group formation.
    * Min-id keeps (a2, exact dedup) are right when members are identical;
    * NEAR-dup members differ, and keeping the first-crawled copy of a page
    * whose later crawl is cleaner throws quality away — so the
    * representative is the quality-argmax ([[graft.ext.TextAnalysis.qualityScore]],
    * doc_id tie-break), emitted as a `keep` flag per member. One window
    * over the (tiny) grouped membership riding x3's group labels; the
    * quality expression is per-row scan work. Double ORDER BY determinism
    * holds because both engines compute bit-identical scores (t2's
    * hash-matched expression) and ties fall to doc_id.
    */
  val x11DedupRepresentative = QueryDef(
    "x11_dedup_representative",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Td(s, dir, "documents")
      val pairs = Dedup.minhashDedup(docs, "doc_id", "text",
        n = 3, k = 12, bands = 3, threshold = 0.8)
      val groups = Dedup.components(pairs, iters = 4)
        .select(col("id").as("doc_id"), col("label").as("group_id"))
      val scored = docs.join(groups, Seq("doc_id"))
        .select(col("doc_id"), col("group_id"),
          TA.qualityScore(col("text")).as("quality"))
      val w = Window.partitionBy(col("group_id"))
        .orderBy(col("quality").desc, col("doc_id").asc)
      scored.withColumn("keep", row_number().over(w) === 1)
        .orderBy(col("doc_id"))
    },
    Some {
      val rounds = (1 to 4).map { t =>
        s"""l$t AS MATERIALIZED (SELECT id, min(label) AS label FROM (
              SELECT id, label FROM l${t - 1}
              UNION ALL
              SELECT e.src AS id, l${t - 1}.label FROM e JOIN l${t - 1} ON e.dst = l${t - 1}.id
            ) u GROUP BY id)"""
      }.mkString(",\n      ")
      s"""
      WITH ${minhashPairsSql("documents", 0.8)},
      e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM mh_pairs
            UNION ALL SELECT id_b AS src, id_a AS dst FROM mh_pairs),
      n0 AS (SELECT DISTINCT src AS id FROM e),
      l0 AS MATERIALIZED (SELECT id, id AS label FROM n0),
      $rounds,
      qb AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(lower(text), '[^a-z0-9\\s]')) AS BIGINT) AS n_punct,
               CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                 x -> list_contains(${sqlList(TA.Stopwords)}, x))) AS BIGINT) AS n_stop,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS n_tok,
               CAST(greatest(length(text), 1) AS DOUBLE) AS n_len
        FROM documents),
      q AS (
        SELECT doc_id,
               0.5 * least(n_tok / 64.0, 1.0)
                 + 0.5 * least((CAST(n_stop AS DOUBLE) / n_tok) * 4.0, 1.0)
                 - (CAST(n_punct AS DOUBLE) / n_len) * 2.0 AS quality
        FROM qb),
      j AS (SELECT l4.id AS doc_id, l4.label AS group_id, q.quality
            FROM l4 JOIN q ON l4.id = q.doc_id)
      SELECT doc_id, group_id, quality,
             (row_number() OVER (PARTITION BY group_id
                ORDER BY quality DESC, doc_id ASC) = 1) AS keep
      FROM j ORDER BY doc_id
    """
    },
    // x3 (benched) already times the pair-formation + components chain this
    // query reruns; the added quality window is per-member scan work —
    // benching both would double-count the dominant cost
    benchmark = false)

  private def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")

  /** X9 — deterministic Count-Min heavy hitters: the counts sketch
    * completing the trio (x1 HLL distinct, f9 grid quantiles). Builds a
    * 4×1024 md5-hashed counter grid over every token occurrence in the
    * corpus, then reads back estimates for the exact top-20 tokens. The
    * oracle replays the identical construction (same md5 row-salts, same
    * 4-hex-digit bucket arithmetic) in SQL — integer math end to end, so
    * the estimates hash-match exactly, and `n_est >= n_exact` by the CM
    * overestimate property (spec-pinned corpus-wide).
    */
  val x9CmsHeavyHitters: QueryDef = {
    val (d, w) = (4, 1024)
    QueryDef(
      "x9_cms_heavyhitters",
      (s, dir) => {
        val terms = Td(s, dir, "documents")
          .select(explode(graft.ext.TextAnalysis.wsTokens(col("text"))).as("term"))
        val cms = graft.functions.CountMin.build(terms, "term", d, w)
        val top = terms.groupBy("term").agg(count(lit(1)).as("n_exact"))
          .orderBy(col("n_exact").desc, col("term")).limit(20)
        graft.functions.CountMin.lookup(cms, top, "term", d, w)
          .select(col("term"), col("n_exact"), col("n_est"))
          .orderBy(col("n_exact").desc, col("term"))
      },
      Some {
        // int value of the first 4 md5 hex digits of "<row>:<term>", mod w —
        // the DuckDB twin of CountMin.bucket (Spark's conv(hex, 16, 10))
        def nib(i: Int) =
          s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1)"
        val bucket =
          s"((((${nib(1)} * 16 + ${nib(2)}) * 16 + ${nib(3)}) * 16 + ${nib(4)}) % $w)"
        val rowsVals = (0 until d).map(i => s"($i)").mkString(", ")
        s"""
        WITH terms AS (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term FROM documents),
        rws AS (SELECT r FROM (VALUES $rowsVals) t(r)),
        tb AS (SELECT r, bucket, COUNT(*) AS cnt FROM (
                 SELECT r, $bucket AS bucket FROM (
                   SELECT r, md5(CAST(r AS VARCHAR) || ':' || term) AS h
                   FROM terms CROSS JOIN rws))
               GROUP BY 1, 2),
        top AS (SELECT term, COUNT(*) AS n_exact FROM terms GROUP BY 1
                ORDER BY n_exact DESC, term LIMIT 20),
        probe AS (SELECT term, n_exact, r, $bucket AS bucket FROM (
                    SELECT term, n_exact, r, md5(CAST(r AS VARCHAR) || ':' || term) AS h
                    FROM top CROSS JOIN rws))
        SELECT p.term, p.n_exact, MIN(COALESCE(tb.cnt, 0)) AS n_est
        FROM probe p LEFT JOIN tb ON tb.r = p.r AND tb.bucket = p.bucket
        GROUP BY 1, 2 ORDER BY n_exact DESC, term
      """
      })
  }

  /** D12 — train/eval contamination: the d8 split replayed as a
    * decontamination probe — training docs sharing ≥3 distinct word
    * 5-grams with an "eval" doc, plus the shared fraction of the eval
    * doc's 5-grams ([[graft.ext.Dedup.contamination]]). The oracle builds
    * the same 5-gram inverted indexes and join, INCLUDING the default
    * train-side df-cap ([[graft.ext.Dedup.ContaminationMaxDf]]) — no
    * shingle crosses it at test scale, but the twin must mirror the
    * operator's real semantics, not its no-flood special case.
    */
  val d12Contamination = QueryDef(
    "d12_contamination",
    (s, dir) => {
      val docs = Td(s, dir, "documents")
      val isEval = Similarity.sampleBucket(col("doc_id")) % 4 === 0
      Dedup.contamination(docs.filter(!isEval), docs.filter(isEval),
          "doc_id", "text", n = 5, minShared = 3)
        .orderBy(col("train_id"), col("eval_id"))
    },
    Some(s"""
      WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents),
      sh5 AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(ws) >= 5
                 THEN list_transform(generate_series(1, len(ws)-4), i -> array_to_string(ws[i:i+4], ' '))
                 ELSE [array_to_string(ws, ' ')] END)) AS shingle FROM w),
      tr0 AS (SELECT doc_id AS train_id, shingle FROM sh5
             WHERE NOT ${sampleFilterSql("doc_id", 4)}),
      ev0 AS (SELECT doc_id AS eval_id, shingle FROM sh5
             WHERE ${sampleFilterSql("doc_id", 4)}),
      hot AS (SELECT shingle FROM tr0 GROUP BY 1
              HAVING COUNT(*) > ${Dedup.ContaminationMaxDf}),
      tr AS (SELECT * FROM tr0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
      ev AS (SELECT * FROM ev0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
      sz AS (SELECT eval_id, COUNT(*) AS n_ev FROM ev GROUP BY 1),
      p AS (SELECT train_id, eval_id, COUNT(*) AS n_shared
            FROM tr JOIN ev USING (shingle) GROUP BY 1, 2)
      SELECT p.train_id, p.eval_id, p.n_shared,
             CAST(p.n_shared AS DOUBLE) / CAST(sz.n_ev AS DOUBLE) AS overlap_frac
      FROM p JOIN sz USING (eval_id)
      WHERE n_shared >= 3
      ORDER BY train_id, eval_id
    """))

  /** C3 — decontamination as a FILTER (d12 detects, this removes): train
    * docs whose 5-gram overlap with any eval doc reaches 50% of that eval
    * doc's shingles are dropped; the survivors are the cleaned corpus.
    * The flagged set is tiny by construction (contaminated docs are the
    * pathology, not the norm), so at 100 TB the anti-join broadcasts and
    * the pass rides the train scan — detection cost is d12's inverted
    * index join, already df-capped and scale-stressed at 100×.
    */
  val c3Decontaminate = QueryDef(
    "c3_decontaminate",
    (s, dir) => {
      val docs = Td(s, dir, "documents")
      val isEval = Similarity.sampleBucket(col("doc_id")) % 4 === 0
      val train = docs.filter(!isEval)
      val flagged = Dedup.contamination(train, docs.filter(isEval),
          "doc_id", "text", n = 5, minShared = 3)
        .filter(col("overlap_frac") >= 0.5)
        .select(col("train_id").as("doc_id")).distinct()
      train.join(flagged, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents),
      sh5 AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(ws) >= 5
                 THEN list_transform(generate_series(1, len(ws)-4), i -> array_to_string(ws[i:i+4], ' '))
                 ELSE [array_to_string(ws, ' ')] END)) AS shingle FROM w),
      tr0 AS (SELECT doc_id AS train_id, shingle FROM sh5
             WHERE NOT ${sampleFilterSql("doc_id", 4)}),
      ev0 AS (SELECT doc_id AS eval_id, shingle FROM sh5
             WHERE ${sampleFilterSql("doc_id", 4)}),
      hot AS (SELECT shingle FROM tr0 GROUP BY 1
              HAVING COUNT(*) > ${Dedup.ContaminationMaxDf}),
      tr AS (SELECT * FROM tr0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
      ev AS (SELECT * FROM ev0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
      sz AS (SELECT eval_id, COUNT(*) AS n_ev FROM ev GROUP BY 1),
      p AS (SELECT train_id, eval_id, COUNT(*) AS n_shared
            FROM tr JOIN ev USING (shingle) GROUP BY 1, 2),
      flagged AS (SELECT DISTINCT train_id FROM p JOIN sz USING (eval_id)
                  WHERE n_shared >= 3
                    AND CAST(n_shared AS DOUBLE) / CAST(n_ev AS DOUBLE) >= 0.5)
      SELECT doc_id, lang, source FROM documents
      WHERE NOT ${sampleFilterSql("doc_id", 4)}
        AND doc_id NOT IN (SELECT train_id FROM flagged)
      ORDER BY doc_id
    """),
    // the bench times detection via d12 (the dominant cost); this row adds
    // one broadcast anti-join on top — correctness-gated, not re-timed
    benchmark = false)

  /** C7 — SEMANTIC decontamination
    * ([[graft.ext.Similarity.semanticDecontaminate]]): the embedding-space
    * twin of c3/c4 — paraphrased or reformatted benchmark leakage shares
    * no 13-gram, so the lexical scrub misses it; here every train vector
    * within 0.45 cosine of ANY eval vector is flagged with its hit count,
    * max cosine, and nearest eval id (the audit record published before
    * the drop). Eval = the vec_id % 10 slice (benchmarks are small — the
    * eval side broadcasts whole, train is one map-only scan, no corpus
    * shuffle); 0.45 is the corpus's planted near-dup bar, so the flags
    * are exactly the planted structure that straddles the split.
    */
  val c7SemanticDecon = QueryDef(
    "c7_semantic_decon",
    (s, dir) => {
      val emb = Td(s, dir, "embeddings")
      val isEval = col("vec_id") % 10 === 0
      Similarity.semanticDecontaminate(emb.filter(!isEval), emb.filter(isEval),
          "vec_id", "embedding", threshold = 0.45)
        .select(col("vec_id"), col("n_eval_hits").cast("long").as("n_eval_hits"),
          col("max_cos"), col("nearest_eval_id"))
        .orderBy(col("vec_id"))
    },
    Some(s"""
      WITH $vecCte,
      ev AS (SELECT vec_id AS eval_id, v, nrm FROM n WHERE vec_id % 10 = 0),
      tr AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % 10 <> 0),
      h AS (SELECT tr.vec_id, ev.eval_id,
              ${dotSql.format("tr.v", "ev.v")} / (tr.nrm * ev.nrm) AS cos
            FROM tr CROSS JOIN ev
            WHERE ${dotSql.format("tr.v", "ev.v")} / (tr.nrm * ev.nrm) >= 0.45),
      g AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS n_eval_hits,
              max(cos) AS max_cos FROM h GROUP BY 1),
      nr AS (SELECT vec_id, eval_id,
               row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, eval_id) AS rk
             FROM h)
      SELECT g.vec_id, g.n_eval_hits, g.max_cos, nr.eval_id AS nearest_eval_id
      FROM g JOIN nr ON nr.vec_id = g.vec_id AND nr.rk = 1
      ORDER BY g.vec_id
    """),
    // the d5/s1 cross-join+window shape the bench already times
    benchmark = false)

  /** C8 — semantic decontamination routed through the DURABLE ANN index
    * ([[graft.ext.AnnIndex.decontaminate]]): c7's exact scrub pays
    * O(|eval|·dim) per train row on every corpus pass — the one plan in
    * the repo whose cost is linear in the eval-suite size. Here the index
    * already maintained on the training corpus prunes it: eval vectors
    * probe their `nprobe` nearest FROZEN centroids (geometry-bounded
    * read — the codes table is never touched), train rows assign
    * map-only to the same centroids, and only pairs meeting in a probed
    * cluster pay the exact-cosine confirm. The c4 bloom idiom in
    * embedding space: the prune is invisible in the result — the ORACLE
    * IS c7's EXACT SQL, so the hash match proves nprobe=4 of nlist=8
    * retains every planted 0.45-cosine pair at this SF while each train
    * row now meets only the eval vectors probing its own cluster
    * (expected |eval|·nprobe/nlist = half the exact fan-out; ScaleStress
    * `decon` records the measured cost tracking nprobe×cluster, not
    * |eval|). Same audit schema as c7, bit-identical rows.
    *
    * Measured retention curve (BENCH_LOCAL_r15.md): sf0.01 needs probe
    * rank ≤ 3 (nprobe=4 retains with margin); sf0.1's 23 pairs spread
    * their needed rank over 1..7 — a 0.45 bar sits deep in the
    * prune-hostile regime (hit cosines 0.45-0.53 vs median train
    * assignment cosine ~0.20), so there nprobe IS a recall dial, not a
    * free prune, and the production recipe in
    * [[graft.ext.Similarity.semanticDecontaminatePruned]]'s scaladoc
    * (replay a sampled slice against the exact scrub until audits match)
    * is the honest way to set it. At the near-dup bars real scrubs run
    * (≥0.8) the same machinery prunes far harder.
    */
  val c8SemanticDeconIndexed = QueryDef(
    "c8_semantic_decon_indexed",
    (s, dir) => {
      import graft.ext.AnnIndex
      val emb = Td(s, dir, "embeddings")
      val isEval = col("vec_id") % 10 === 0
      val store = graft.tables.Scratch.store(s)
      if (!store.exists("c8_ann_codes"))
        AnnIndex.build(store, "c8_ann", emb.filter(!isEval), "vec_id", "embedding",
          dim = 64, nlist = 8, coarseIters = 2, m = 8, k = 16, pqIters = 2,
          sampleMod = Some(4))
      AnnIndex.decontaminate(store, "c8_ann", emb.filter(!isEval),
          emb.filter(isEval), "vec_id", "embedding",
          threshold = 0.45, nprobe = 4)
        .select(col("vec_id"), col("n_eval_hits").cast("long").as("n_eval_hits"),
          col("max_cos"), col("nearest_eval_id"))
        .orderBy(col("vec_id"))
    },
    // deliberately c7's EXACT oracle, verbatim: a hash match means the
    // cluster prune lost nothing on this corpus
    Some(s"""
      WITH $vecCte,
      ev AS (SELECT vec_id AS eval_id, v, nrm FROM n WHERE vec_id % 10 = 0),
      tr AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % 10 <> 0),
      h AS (SELECT tr.vec_id, ev.eval_id,
              ${dotSql.format("tr.v", "ev.v")} / (tr.nrm * ev.nrm) AS cos
            FROM tr CROSS JOIN ev
            WHERE ${dotSql.format("tr.v", "ev.v")} / (tr.nrm * ev.nrm) >= 0.45),
      g AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS n_eval_hits,
              max(cos) AS max_cos FROM h GROUP BY 1),
      nr AS (SELECT vec_id, eval_id,
               row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, eval_id) AS rk
             FROM h)
      SELECT g.vec_id, g.n_eval_hits, g.max_cos, nr.eval_id AS nearest_eval_id
      FROM g JOIN nr ON nr.vec_id = g.vec_id AND nr.rk = 1
      ORDER BY g.vec_id
    """),
    // prune cost is measured by ScaleStress `decon` (per-row candidate
    // counts), not wall time on a 500-vector SF
    benchmark = false)

  /** C9 — CALIBRATED indexed decontamination
    * ([[graft.ext.AnnIndex.decontaminateCalibrated]]): c8 proves the
    * cluster prune CAN be invisible, but its nprobe=4 is a hand-picked
    * constant that happens to retain every planted pair at this SF — the
    * measured retention curve (BENCH_LOCAL_r15.md §2: needed probe rank
    * ≤3 of 8 at sf0.01, 1..7 of 8 at sf0.1) shows the right value is
    * corpus-specific, which is exactly what a hardcoded dial gets wrong
    * on the next corpus. Here the probe count is MEASURED: the scrub
    * replays a deterministic slice of train against the exact scrub and
    * binary-searches the smallest nprobe whose pruned slice audit
    * retains every exact hit (parity = one Σn_eval_hits aggregate per
    * try, sound because the pruned hit set is a subset of the exact one
    * and probe lists are prefixes — monotone, so ⌈log₂ nlist⌉ replays).
    * This query calibrates on the FULL slice (sampleMod=1, margin=0), so
    * the chosen nprobe is provably exact-retaining and the ORACLE IS
    * c7's EXACT SQL — the hash match certifies the calibration loop
    * terminated at true parity, not at a lucky constant. Production runs
    * sample the slice (sampleMod≈10) and keep the default margin; the
    * returned [[graft.ext.AnnIndex.DeconCalibration]] record is the
    * audit row a curation pass publishes next to c7/c8's per-doc flags.
    */
  val c9SemanticDeconCalibrated = QueryDef(
    "c9_semantic_decon_calibrated",
    (s, dir) => {
      import graft.ext.AnnIndex
      val emb = Td(s, dir, "embeddings")
      val isEval = col("vec_id") % 10 === 0
      val store = graft.tables.Scratch.store(s)
      if (!store.exists("c8_ann_codes"))
        AnnIndex.build(store, "c8_ann", emb.filter(!isEval), "vec_id", "embedding",
          dim = 64, nlist = 8, coarseIters = 2, m = 8, k = 16, pqIters = 2,
          sampleMod = Some(4))
      val (scrub, _) = AnnIndex.decontaminateCalibrated(store, "c8_ann",
        emb.filter(!isEval), emb.filter(isEval), "vec_id", "embedding",
        threshold = 0.45, sampleMod = 1, margin = 0)
      scrub
        .select(col("vec_id"), col("n_eval_hits").cast("long").as("n_eval_hits"),
          col("max_cos"), col("nearest_eval_id"))
        .orderBy(col("vec_id"))
    },
    // c7's EXACT oracle, verbatim (the c8 contract): a hash match means
    // the CALIBRATED probe count lost nothing — proven here by
    // construction (full-slice calibration), measured by sampled replay
    // in production
    Some(s"""
      WITH $vecCte,
      ev AS (SELECT vec_id AS eval_id, v, nrm FROM n WHERE vec_id % 10 = 0),
      tr AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % 10 <> 0),
      h AS (SELECT tr.vec_id, ev.eval_id,
              ${dotSql.format("tr.v", "ev.v")} / (tr.nrm * ev.nrm) AS cos
            FROM tr CROSS JOIN ev
            WHERE ${dotSql.format("tr.v", "ev.v")} / (tr.nrm * ev.nrm) >= 0.45),
      g AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS n_eval_hits,
              max(cos) AS max_cos FROM h GROUP BY 1),
      nr AS (SELECT vec_id, eval_id,
               row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, eval_id) AS rk
             FROM h)
      SELECT g.vec_id, g.n_eval_hits, g.max_cos, nr.eval_id AS nearest_eval_id
      FROM g JOIN nr ON nr.vec_id = g.vec_id AND nr.rk = 1
      ORDER BY g.vec_id
    """),
    // calibration cost is measured by ScaleStress `decononly` (chosen
    // nprobe + replay count vs the exact scrub), not wall time at gate SF
    benchmark = false)

  /** C10 — the eval-owner's leak report ([[graft.ext.Similarity
    * .evalLeakReport]]): c7's hit set aggregated per EVAL item instead of
    * per train document — which benchmark items leaked into the training
    * corpus at all, how many train documents carry each, and the closest
    * copy. The per-train audit (c7/c8/c9) says what to drop; this is what
    * gets REPORTED upstream, because a benchmark item with thousands of
    * train-side copies is compromised even after the drop (its answer
    * pattern saturated the corpus before this snapshot). Same broadcast
    * map-only plan as c7; the group-by keys on the small side.
    */
  val c10EvalLeakReport = QueryDef(
    "c10_eval_leak_report",
    (s, dir) => {
      val emb = Td(s, dir, "embeddings")
      val isEval = col("vec_id") % 10 === 0
      Similarity.evalLeakReport(emb.filter(!isEval), emb.filter(isEval),
          "vec_id", "embedding", threshold = 0.45)
        .select(col("eval_id"), col("n_train_hits").cast("long").as("n_train_hits"),
          col("max_cos"), col("nearest_train_id"))
        .orderBy(col("eval_id"))
    },
    Some(s"""
      WITH $vecCte,
      ev AS (SELECT vec_id AS eval_id, v, nrm FROM n WHERE vec_id % 10 = 0),
      tr AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % 10 <> 0),
      h AS (SELECT tr.vec_id, ev.eval_id,
              ${dotSql.format("tr.v", "ev.v")} / (tr.nrm * ev.nrm) AS cos
            FROM tr CROSS JOIN ev
            WHERE ${dotSql.format("tr.v", "ev.v")} / (tr.nrm * ev.nrm) >= 0.45),
      g AS (SELECT eval_id, CAST(count(*) AS BIGINT) AS n_train_hits,
              max(cos) AS max_cos FROM h GROUP BY 1),
      nr AS (SELECT eval_id, vec_id,
               row_number() OVER (PARTITION BY eval_id ORDER BY cos DESC, vec_id) AS rk
             FROM h)
      SELECT g.eval_id, g.n_train_hits, g.max_cos, nr.vec_id AS nearest_train_id
      FROM g JOIN nr ON nr.eval_id = g.eval_id AND nr.rk = 1
      ORDER BY g.eval_id
    """),
    // c7's plan, re-keyed — not separately benched
    benchmark = false)

  /** C11 — the LEXICAL leak report: c10's per-eval-item view over the
    * n-gram contamination hit set (c3's bars: ≥3 shared df-capped
    * 5-shingles covering ≥50% of the eval doc). Together with c10 the
    * report matrix is complete — lexical/semantic × per-train (what to
    * drop: c3/c7) and per-eval (what to report upstream: c11/c10).
    */
  val c11LexicalLeakReport = QueryDef(
    "c11_lexical_leak_report",
    (s, dir) => {
      val docs = Td(s, dir, "documents")
      val isEval = Similarity.sampleBucket(col("doc_id")) % 4 === 0
      Dedup.contamination(docs.filter(!isEval), docs.filter(isEval),
          "doc_id", "text", n = 5, minShared = 3)
        .filter(col("overlap_frac") >= 0.5)
        .groupBy(col("eval_id"))
        .agg(count(lit(1)).cast("long").as("n_train_hits"),
          max(col("overlap_frac")).as("max_overlap"),
          min_by(col("train_id"), struct(-col("overlap_frac"), col("train_id")))
            .as("nearest_train_id"))
        .orderBy(col("eval_id"))
    },
    Some(s"""
      WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents),
      sh5 AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(ws) >= 5
                 THEN list_transform(generate_series(1, len(ws)-4), i -> array_to_string(ws[i:i+4], ' '))
                 ELSE [array_to_string(ws, ' ')] END)) AS shingle FROM w),
      tr0 AS (SELECT doc_id AS train_id, shingle FROM sh5
             WHERE NOT ${sampleFilterSql("doc_id", 4)}),
      ev0 AS (SELECT doc_id AS eval_id, shingle FROM sh5
             WHERE ${sampleFilterSql("doc_id", 4)}),
      hot AS (SELECT shingle FROM tr0 GROUP BY 1
              HAVING COUNT(*) > ${Dedup.ContaminationMaxDf}),
      tr AS (SELECT * FROM tr0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
      ev AS (SELECT * FROM ev0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
      sz AS (SELECT eval_id, COUNT(*) AS n_ev FROM ev GROUP BY 1),
      p AS (SELECT train_id, eval_id, COUNT(*) AS n_shared
            FROM tr JOIN ev USING (shingle) GROUP BY 1, 2),
      hits AS (SELECT train_id, eval_id,
                 CAST(n_shared AS DOUBLE) / CAST(n_ev AS DOUBLE) AS ofrac
               FROM p JOIN sz USING (eval_id)
               WHERE n_shared >= 3
                 AND CAST(n_shared AS DOUBLE) / CAST(n_ev AS DOUBLE) >= 0.5),
      g AS (SELECT eval_id, CAST(count(*) AS BIGINT) AS n_train_hits,
              max(ofrac) AS max_overlap FROM hits GROUP BY 1),
      nr AS (SELECT eval_id, train_id,
               row_number() OVER (PARTITION BY eval_id ORDER BY ofrac DESC, train_id) AS rk
             FROM hits)
      SELECT g.eval_id, g.n_train_hits, g.max_overlap, nr.train_id AS nearest_train_id
      FROM g JOIN nr ON nr.eval_id = g.eval_id AND nr.rk = 1
      ORDER BY g.eval_id
    """),
    // c3's detection plan re-keyed — detection cost is benched via d12
    benchmark = false)

  /** C4 — bloom-prefiltered decontamination ([[graft.ext.Bloom]]): the
    * GPT-3-style benchmark scrub (Brown et al. 2020 appendix C runs 13-gram
    * bloom membership over the whole corpus). Same cleaned-corpus contract
    * as c3, computed the way a 100 TB pass actually runs it: the EVAL
    * shingle set is hashed once into a broadcast bloom (16 bits/item,
    * fpp ≈ 10⁻³), every TRAIN shingle is tested map-side ON ITS OWN SCAN,
    * and only probable hits reach the exact inverted-index join — the join
    * that c3/d12 feed with the full train shingle volume. False positives
    * are removed by that exact join, so the bloom is invisible in the
    * result and the DuckDB oracle replays plain exact semantics. Uncapped
    * (maxDf = ∞): the bloom already bounds the join's hot-key exposure to
    * n-grams genuinely present in the (small, curated) eval suite, making
    * this the trusted-eval twin of c3's df-capped general path.
    */
  val c4DecontaminateBloom = QueryDef(
    "c4_decontaminate_bloom",
    (s, dir) => {
      val docs = Td(s, dir, "documents")
      val isEval = Similarity.sampleBucket(col("doc_id")) % 4 === 0
      val train = docs.filter(!isEval)
      val evalDf = docs.filter(isEval)
      // the eval shingle set feeds BOTH the bloom build and the exact join:
      // stage it once (columnar scratch parquet) so the eval corpus is
      // shingled exactly once, the sizing count is parquet-metadata-cheap,
      // and both consumers read the staged files. No distinct needed —
      // bloom positions are idempotent and sizeFor over the per-doc-distinct
      // row count only oversizes, never undersizes.
      val shE = graft.tables.Scratch.stage(
        Dedup.shingleIndex(evalDf, "doc_id", "text", n = 5)
          .withColumnRenamed("doc_id", "eval_id"), "c4_evsh")
      val bloom = Bloom.build(shE, col("shingle"), Bloom.sizeFor(shE.count()))
      val flagged = Dedup.contaminationFromShingles(
          Dedup.shingleIndex(train, "doc_id", "text", n = 5)
            .withColumnRenamed("doc_id", "train_id"),
          shE, minShared = 3, maxDf = Int.MaxValue,
          trainPrefilter = Some(bloom.mightContain))
        .filter(col("overlap_frac") >= 0.5)
        .select(col("train_id").as("doc_id")).distinct()
      train.join(flagged, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents),
      sh5 AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(ws) >= 5
                 THEN list_transform(generate_series(1, len(ws)-4), i -> array_to_string(ws[i:i+4], ' '))
                 ELSE [array_to_string(ws, ' ')] END)) AS shingle FROM w),
      tr AS (SELECT doc_id AS train_id, shingle FROM sh5
             WHERE NOT ${sampleFilterSql("doc_id", 4)}),
      ev AS (SELECT doc_id AS eval_id, shingle FROM sh5
             WHERE ${sampleFilterSql("doc_id", 4)}),
      sz AS (SELECT eval_id, COUNT(*) AS n_ev FROM ev GROUP BY 1),
      p AS (SELECT train_id, eval_id, COUNT(*) AS n_shared
            FROM tr JOIN ev USING (shingle) GROUP BY 1, 2),
      flagged AS (SELECT DISTINCT train_id FROM p JOIN sz USING (eval_id)
                  WHERE n_shared >= 3
                    AND CAST(n_shared AS DOUBLE) / CAST(n_ev AS DOUBLE) >= 0.5)
      SELECT doc_id, lang, source FROM documents
      WHERE NOT ${sampleFilterSql("doc_id", 4)}
        AND doc_id NOT IN (SELECT train_id FROM flagged)
      ORDER BY doc_id
    """))

  /** U1 — URL canonicalization ([[graft.ext.Urls]]): the pass a crawl
    * pipeline runs before url-level dedup. The corpus has no URL column,
    * so one is planted per document from doc_id (the t7 pattern), cycling
    * six DIRTY shapes: mixed case + `:80` + utm params; `.co.uk` host with
    * a dot-segment, `%7E`, and `fbclid`; `/./` + `%41` + `gclid`/`ref`
    * beside a `referrer=` that must SURVIVE; userinfo + `github.io` +
    * `%2f` (reserved — hex uppercased, NOT decoded); an unreserved escape
    * with a ref-only query that empties; and a non-URL passthrough. The
    * oracle rebuilds the same URLs and replays the normalization through
    * [[graft.ext.Urls]]'s generated `…Sql` twins — both engines run the
    * SAME constants, so any engine-side semantic drift (regex dialect,
    * split behavior, slicing) hash-fails; ground-truth outputs are pinned
    * per shape in UrlsSpec, and u2 asserts them end-to-end.
    */
  val u1UrlNormalize = QueryDef(
    "u1_url_normalize",
    (s, dir) => {
      val id = col("doc_id")
      def st(c: org.apache.spark.sql.Column) = c.cast("string")
      val planted = when(id % 6 === 0, concat(
          lit("HTTP://WWW.Sub"), st(id % 5), lit(".Example"), st(id % 20),
          lit(".COM:80/Path/"), st(id), lit("?utm_source=feed&id="), st(id),
          lit("&utm_campaign=x#sec"), st(id)))
        .when(id % 6 === 1, concat(
          lit("https://Shop"), st(id % 7), lit(".Example.CO.UK/a/../b/%7Ehome/"),
          st(id), lit("?fbclid=f"), st(id), lit("&id="), st(id)))
        .when(id % 6 === 2, concat(
          lit("https://news"), st(id % 9), lit(".example.com/./x/%41rticle/"),
          st(id), lit("?gclid=g"), st(id), lit("&ref=tw&referrer=keep"), st(id),
          lit("&q="), st(id)))
        .when(id % 6 === 3, concat(
          lit("http://u"), st(id), lit("@blog"), st(id % 4),
          lit(".github.io:8080/p%2fq/"), st(id)))
        .when(id % 6 === 4, concat(
          lit("https://site"), st(id % 11), lit(".org/AB%63/"), st(id),
          lit("?ref=feed")))
        // IDN plant: punycode host with www/port/tracking noise — canon
        // and domain must carry the DECODED Unicode host
        .when(id % 12 === 5, concat(
          lit("HTTPS://WWW.XN--MNCHEN-3YA.DE:443/pfad/"), st(id),
          lit("?ref=x&id="), st(id)))
        .otherwise(concat(lit("not a url "), st(id)))
      Td(s, dir, "documents")
        .select(col("doc_id"), planted.as("url"))
        .select(col("doc_id"),
          graft.ext.Urls.hostNoWww(col("url")).as("host"),
          graft.ext.Urls.canonicalize(col("url")).as("canon_url"),
          graft.ext.Urls.domain(col("url")).as("domain"))
        .orderBy(col("doc_id"))
    },
    Some({
      val U = graft.ext.Urls
      s"""
      WITH aug AS (SELECT doc_id, CASE doc_id % 6
        WHEN 0 THEN 'HTTP://WWW.Sub' || CAST(doc_id % 5 AS VARCHAR) ||
          '.Example' || CAST(doc_id % 20 AS VARCHAR) ||
          '.COM:80/Path/' || CAST(doc_id AS VARCHAR) ||
          '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR) ||
          '&utm_campaign=x#sec' || CAST(doc_id AS VARCHAR)
        WHEN 1 THEN 'https://Shop' || CAST(doc_id % 7 AS VARCHAR) ||
          '.Example.CO.UK/a/../b/%7Ehome/' || CAST(doc_id AS VARCHAR) ||
          '?fbclid=f' || CAST(doc_id AS VARCHAR) || '&id=' || CAST(doc_id AS VARCHAR)
        WHEN 2 THEN 'https://news' || CAST(doc_id % 9 AS VARCHAR) ||
          '.example.com/./x/%41rticle/' || CAST(doc_id AS VARCHAR) ||
          '?gclid=g' || CAST(doc_id AS VARCHAR) ||
          '&ref=tw&referrer=keep' || CAST(doc_id AS VARCHAR) ||
          '&q=' || CAST(doc_id AS VARCHAR)
        WHEN 3 THEN 'http://u' || CAST(doc_id AS VARCHAR) ||
          '@blog' || CAST(doc_id % 4 AS VARCHAR) ||
          '.github.io:8080/p%2fq/' || CAST(doc_id AS VARCHAR)
        WHEN 4 THEN 'https://site' || CAST(doc_id % 11 AS VARCHAR) ||
          '.org/AB%63/' || CAST(doc_id AS VARCHAR) || '?ref=feed'
        ELSE (CASE WHEN doc_id % 12 = 5
          THEN 'HTTPS://WWW.XN--MNCHEN-3YA.DE:443/pfad/' || CAST(doc_id AS VARCHAR) ||
            '?ref=x&id=' || CAST(doc_id AS VARCHAR)
          ELSE 'not a url ' || CAST(doc_id AS VARCHAR) END) END AS url
        FROM documents),
      n1 AS (SELECT doc_id, url, ${U.hostNoWwwSql("url")} AS h,
        ${U.pathSql("url")} AS p0, ${U.rawQuerySql("url")} AS q0 FROM aug),
      -- DuckDB has no punycode surface: the IDN step's twin is a
      -- hand-verified decode TABLE over the planted hosts (ground truth
      -- for the engine's RFC 3492 decode, not a replay of it)
      n1b AS (SELECT doc_id, url, h, p0, q0,
        CASE WHEN h = 'xn--mnchen-3ya.de' THEN 'münchen.de' ELSE h END AS hu
        FROM n1),
      n2 AS (SELECT doc_id, url, h, hu, ${U.pctNormalizeSql("p0")} AS p1,
        ${U.pctNormalizeSql("q0")} AS q1 FROM n1b),
      n3 AS (SELECT doc_id, url, h, hu, ${U.removeDotSegmentsSql("p1")} AS p2,
        ${U.trackingFilterSql("q1")} AS q2 FROM n2)
      SELECT doc_id, h AS host,
             ${U.assembleSql("url", "hu", "p2", "q2")} AS canon_url,
             ${U.domainSql("hu")} AS domain
      FROM n3 ORDER BY doc_id
    """
    }),
    // sub-0.2 s at sf0.1: the Spark task-scheduling floor, zero scale
    // signal - timed coverage lives in the correctness gate; dropping it
    // from the bench preserves the compact stdout line's precision budget
    benchmark = false)
  /** U2 — url-level dedup, the pass that composes u1 with d1: canonicalize
    * → group by canonical form → keep the min-doc_id representative. Three
    * dirty spellings of each of 50 pages (case/www/utm/fragment,
    * dot-segment + fbclid, clean) must collapse to ONE group each. The
    * oracle builds the expected canonical DIRECTLY from the plant key —
    * ground truth, not a replay of the normalizer — so a normalization bug
    * that u1's twin-implementation oracle would mirror on both sides fails
    * HERE instead of passing twice. Group-by on a per-row derived key:
    * one hash shuffle, broadcast-free, the d1 pattern at any scale.
    */
  val u2UrlDedup = QueryDef(
    "u2_url_dedup",
    (s, dir) => {
      val id = col("doc_id")
      def st(c: org.apache.spark.sql.Column) = c.cast("string")
      val k = st(id % 50)
      val planted = when(id % 3 === 0, concat(
          lit("HTTP://WWW.Dup"), k, lit(".Example.COM/Page/"), k,
          lit("?utm_x=1&id="), k, lit("#f")))
        .when(id % 3 === 1, concat(
          lit("https://dup"), k, lit(".example.com/a/../Page/"), k,
          lit("?id="), k, lit("&fbclid=z"), st(id)))
        .otherwise(concat(
          lit("https://dup"), k, lit(".example.com/Page/"), k, lit("?id="), k))
      Td(s, dir, "documents")
        .select(col("doc_id"), graft.ext.Urls.canonicalize(planted).as("canon_url"))
        .groupBy(col("canon_url"))
        .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_urls"))
        .orderBy(col("canon_url"))
    },
    Some("""
      WITH c AS (SELECT doc_id,
        'https://dup' || CAST(doc_id % 50 AS VARCHAR) || '.example.com/Page/' ||
        CAST(doc_id % 50 AS VARCHAR) || '?id=' || CAST(doc_id % 50 AS VARCHAR)
          AS canon_url
        FROM documents)
      SELECT canon_url, MIN(doc_id) AS rep_id, COUNT(*) AS n_urls
      FROM c GROUP BY canon_url ORDER BY canon_url
    """),
    // one map-side canonicalize + one groupBy — d1 already times the
    // pattern; keeping it out preserves the compact bench line's headroom
    benchmark = false)

  /** X10 — sequence packing: documents concat-and-chunked into 2048-token
    * packs per source shard ([[graft.ext.Packing]]), the training-batch
    * assembly step. The oracle replays the identical prefix-sum arithmetic
    * (window sum over the same order, integer div/mod) — any drift in
    * ordering, token counting, or boundary handling flips pack ids.
    */
  val x10SequencePack = QueryDef(
    "x10_sequence_pack",
    (s, dir) => {
      val docs = Td(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          graft.ext.TextAnalysis.bpeTokenCount(col("text")).cast("long").as("n_bpe"))
      graft.ext.Packing.assign(docs, "doc_id", "n_bpe", Seq("source"), budget = 2048L)
        .select(col("doc_id"), col("source"), col("n_bpe"),
          col("pack_id"), col("pack_offset"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH d AS (
        SELECT doc_id, source,
               CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) AS BIGINT) AS n_bpe
        FROM documents),
      p AS (
        SELECT doc_id, source, n_bpe,
               COALESCE(SUM(n_bpe) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
        FROM d)
      SELECT doc_id, source, n_bpe,
             CAST(pre // 2048 AS BIGINT) AS pack_id,
             CAST(pre % 2048 AS BIGINT) AS pack_offset
      FROM p ORDER BY doc_id
    """))

  /** T9 — Unicode text normalization
    * ([[org.apache.spark.sql.graft.NormalizeText]]): NFC + invisible-strip
    * + whitespace-collapse as ONE codegen'd map over the scan. Plants force
    * every normalization class (combining marks that must compose, C0/DEL
    * controls, zero-widths, exotic Unicode spaces, untrimmed edges); the
    * pass-through case rides real corpus text through the zero-allocation
    * ASCII fast path. The oracle replays the identical pipeline in DuckDB
    * (`nfc_normalize` + the same RE2 classes, [[NormalizeText.duckSql]]).
    */
  val t9TextNormalize = QueryDef(
    "t9_text_normalize",
    (s, dir) => {
      import org.apache.spark.sql.graft.NormalizeText
      val id = col("doc_id")
      val head = col("text").substr(1, 20)
      val planted = when(id % 5 === 0,
          concat(lit("  He\u0301llo\t\tW"), head, lit("orld  ")))
        .when(id % 5 === 1, concat(lit("a\u0001b\u007Fc  c:"), head))
        .when(id % 5 === 2, concat(lit("x\u200By \u202Fz:"), head))
        .when(id % 5 === 3, concat(lit("p\u00A0q\u3000r:"), head, lit("   ")))
        .otherwise(col("text"))
      Td(s, dir, "documents")
        .select(col("doc_id"), NormalizeText.normalizeText(planted).as("norm_text"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH aug AS (SELECT doc_id, CASE doc_id % 5
        WHEN 0 THEN '  H' || 'e' || chr(769) || 'llo' || chr(9) || chr(9) ||
                    'W' || substr(text, 1, 20) || 'orld  '
        WHEN 1 THEN 'a' || chr(1) || 'b' || chr(127) || 'c  c:' || substr(text, 1, 20)
        WHEN 2 THEN 'x' || chr(8203) || 'y ' || chr(8239) || 'z:' || substr(text, 1, 20)
        WHEN 3 THEN 'p' || chr(160) || 'q' || chr(12288) || 'r:' || substr(text, 1, 20) || '   '
        ELSE text END AS s
        FROM documents)
      SELECT doc_id, ${org.apache.spark.sql.graft.NormalizeText.duckSql("s")} AS norm_text
      FROM aug ORDER BY doc_id
    """),
    // sub-0.2 s at sf0.1: the Spark task-scheduling floor, zero scale
    // signal - timed coverage lives in the correctness gate; dropping it
    // from the bench preserves the compact stdout line's precision budget
    benchmark = false)
  /** DuckDB twin of the PQ pipeline ([[Similarity.pqTrain]]/pqEncode/
    * pqSearch): normalized 2^-20-quantized vectors, per-subspace Lloyd
    * with k-smallest-id seeding, squared-L2 argmin (‖c‖² − 2·v·c) with
    * lower-cid ties, and the ADC sum as an ordered left fold. Mirrors
    * [[kmeansCte]]'s structure with `sub` as an extra key everywhere.
    */
  /** The unit-vector CTE shared by both PQ variants: 2^-20-quantized,
    * normalized, re-quantized (mirrors Similarity.withUnit). */
  private val pqUnitCte =
    """pq_u AS (SELECT vec_id, CASE WHEN nrm0 = 0 THEN qv
             ELSE list_transform(qv, x -> round(x / nrm0 * 1048576.0) / 1048576.0) END AS uv FROM (
           SELECT vec_id, qv,
                  sqrt(list_reduce(list_transform(qv, x -> x * x), (a, b) -> a + b)) AS nrm0
           FROM (SELECT vec_id, list_transform(embedding,
                   x -> round(CAST(x AS DOUBLE) * 1048576.0) / 1048576.0) AS qv
                 FROM embeddings)))"""

  /** The per-subspace Lloyd iteration CTEs (pd/pa/pm/pg/pu/pc chains over
    * `pq_svt`/`pc0`) — identical for unit-vector and residual training. */
  private def pqIterSteps(iters: Int): Seq[String] = {
    val dist = s"list_reduce(list_transform(c.cv, x -> x * x), (a, b) -> a + b) - " +
      s"2 * ${dotSql.format("s.sv", "c.cv")}"
    (1 to iters).map { i =>
      val p = i - 1
      s"""pd$i AS (SELECT s.vec_id, s.sub, s.sv, c.cid, $dist AS dist
               FROM pq_svt s JOIN pc$p c ON c.sub = s.sub),
      pa$i AS (SELECT vec_id, sub, sv, cid AS cluster FROM (
               SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rnk
               FROM pd$i) WHERE rnk = 1),
      pm$i AS (SELECT sub, cluster, unnest(range(len(sv))) AS pos, unnest(sv) AS val FROM pa$i),
      pg$i AS (SELECT sub, cluster AS cid, pos, sum(val) / count(*) AS mval FROM pm$i GROUP BY 1, 2, 3),
      pu$i AS (SELECT sub, cid, list(mval ORDER BY pos) AS cv FROM pg$i GROUP BY 1, 2),
      pc$i AS (SELECT sub, cid, cv FROM pu$i UNION ALL
               SELECT c.sub, c.cid, c.cv FROM pc$p c WHERE NOT EXISTS (
                 SELECT 1 FROM pu$i u WHERE u.sub = c.sub AND u.cid = c.cid))"""
    }
  }

  private def pqCte(m: Int, k: Int, iters: Int, dsub: Int,
      trainWhere: String = ""): String = {
    val base =
      s"""$pqUnitCte,
      pq_sv AS (SELECT vec_id, sub, uv[sub*$dsub+1 : sub*$dsub+$dsub] AS sv
                FROM pq_u CROSS JOIN (SELECT unnest(range($m)) AS sub) subs),
      pq_svt AS (SELECT * FROM pq_sv$trainWhere),
      pc0 AS (SELECT sub, row_number() OVER (PARTITION BY sub ORDER BY vec_id) AS cid, sv AS cv
              FROM pq_svt QUALIFY cid <= $k)"""
    (base +: pqIterSteps(iters)).mkString(",\n      ")
  }

  /** Residual variant ([[Similarity.pqTrainResidual]]'s twin): subvectors
    * come from `pq_r` — the 2^-20-re-quantized residual of each unit
    * vector against its assigned coarse centroid — so it must appear AFTER
    * `asg`/`cent` CTEs in the WITH chain; `pq_qsv` keeps the UNIT
    * subvectors for the query-side ADC lookup table.
    */
  private def pqResCte(m: Int, k: Int, iters: Int, dsub: Int,
      trainWhere: String = "", centersWhere: String = ""): String = {
    val base =
      s"""$pqUnitCte,
      cm AS (SELECT a.cluster, unnest(generate_series(1, len(u.uv))) AS pos,
                    unnest(u.uv) AS x
             FROM pq_u u JOIN asg a ON a.vec_id = u.vec_id$centersWhere),
      centu AS (SELECT cluster AS centroid_id, list(mval ORDER BY pos) AS centuv
                FROM (SELECT cluster, pos, sum(x) / count(*) AS mval
                      FROM cm GROUP BY 1, 2)
                GROUP BY 1),
      pq_r AS (SELECT u.vec_id, a.cluster,
                 list_transform(generate_series(1, len(u.uv)),
                   i -> round((u.uv[i] - c.centuv[i]) * 1048576.0) / 1048576.0) AS rv
               FROM pq_u u JOIN asg a ON a.vec_id = u.vec_id
               JOIN centu c ON c.centroid_id = a.cluster),
      pq_sv AS (SELECT vec_id, sub, rv[sub*$dsub+1 : sub*$dsub+$dsub] AS sv
                FROM pq_r CROSS JOIN (SELECT unnest(range($m)) AS sub) subs),
      pq_qsv AS (SELECT vec_id, sub, uv[sub*$dsub+1 : sub*$dsub+$dsub] AS sv
                FROM pq_u CROSS JOIN (SELECT unnest(range($m)) AS sub) subs),
      pq_svt AS (SELECT * FROM pq_sv$trainWhere),
      pc0 AS (SELECT sub, row_number() OVER (PARTITION BY sub ORDER BY vec_id) AS cid, sv AS cv
              FROM pq_svt QUALIFY cid <= $k)"""
    (base +: pqIterSteps(iters)).mkString(",\n      ")
  }

  /** S5 — product-quantization ADC search ([[Similarity.pqTrain]] →
    * pqEncode → pqSearch): the compression tier below s3's int8 — 64-dim
    * floats become m=8 codebook indices (8 bytes/vector, 32×), and search
    * sums 8 codeword dots per candidate instead of touching floats. The
    * oracle replays training, encode, and the ADC ranking end-to-end.
    */
  val s5KnnPq = QueryDef(
    "s5_knn_pq",
    (s, dir) => {
      val emb = Td(s, dir, "embeddings")
      val books = Similarity.pqTrain(emb, "vec_id", "embedding", dim = 64, m = 8, k = 16,
        iters = 2, sampleMod = Some(4))
      Similarity.pqSearch(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", books, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("adc"),
          col("rnk").cast("long").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    },
    Some(s"""
      WITH ${pqCte(m = 8, k = 16, iters = 2, dsub = 8, trainWhere = s" WHERE ${sampleFilterSql("vec_id", 4)}")},
      pe AS (SELECT s.vec_id, s.sub, c.cid,
               list_reduce(list_transform(c.cv, x -> x * x), (a, b) -> a + b) -
                 2 * ${dotSql.format("s.sv", "c.cv")} AS dist
             FROM pq_sv s JOIN pc2 c ON c.sub = s.sub),
      penc AS (SELECT vec_id, sub, cid FROM (
               SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rnk
               FROM pe) WHERE rnk = 1),
      plut AS (SELECT s.vec_id AS query_id, s.sub, c.cid,
                 ${dotSql.format("s.sv", "c.cv")} AS ip
               FROM pq_sv s JOIN pc2 c ON c.sub = s.sub WHERE s.vec_id < 5),
      psc0 AS (SELECT l.query_id, e.vec_id AS neighbor_id, e.sub, l.ip
               FROM penc e JOIN plut l ON l.sub = e.sub AND l.cid = e.cid
               WHERE e.vec_id <> l.query_id),
      psc AS (SELECT query_id, neighbor_id,
                list_reduce(list(ip ORDER BY sub), (a, b) -> a + b) AS adc
              FROM psc0 GROUP BY 1, 2),
      pr AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rnk
             FROM psc)
      SELECT query_id, neighbor_id, adc, rnk FROM pr WHERE rnk <= 10 ORDER BY query_id, rnk
    """))

  /** S6 — IVF+PQ, the composed 100 TB ANN stack ([[Similarity
    * .ivfPqSearch]]): coarse k-means clusters prune the candidate set
    * (static partition prune on the staged cluster-partitioned index, the
    * s2 mechanism), PQ codes replace floats for the ranking (the s5
    * mechanism). The staged index carries (vec_id, cluster, codes) — the
    * search never reads an embedding. Oracle replays coarse training,
    * probe selection, PQ training/encode, and the ADC ranking end-to-end.
    */
  val s6AnnIvfPq = QueryDef(
    "s6_ann_ivfpq",
    (s, dir) => {
      val emb = Td(s, dir, "embeddings")
      val centroids = Similarity.kmeansTrain(emb, "vec_id", "embedding", k = 8, iters = 2)
        .select(col("centroid_id").cast("long").as("vec_id"), col("embedding"))
      val books = Similarity.pqTrain(emb, "vec_id", "embedding", dim = 64, m = 8, k = 16,
        iters = 2, sampleMod = Some(4))
      val index = graft.tables.Scratch.stage(
        Similarity.ivfAssign(emb, centroids, "vec_id", "embedding")
          .select(col("vec_id"), col("cluster"))
          .join(Similarity.pqEncode(emb, "vec_id", "embedding", books), Seq("vec_id")),
        "s6_ivfpq_index", Seq("cluster"))
      Similarity.ivfPqSearch(emb.filter(col("vec_id") < 5), index, centroids,
          "vec_id", "embedding", books, k = 5, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"), col("adc"),
          col("rnk").cast("long").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    },
    Some(s"""
      WITH $vecCte,
      ${kmeansCte(8, 2)},
      ${trainedCentSql(2)},
      asg0 AS (SELECT n.vec_id, cent.centroid_id,
                 ${dotSql.format("n.v", "centv")} / (n.nrm * centn) AS ccos
               FROM n CROSS JOIN cent),
      asg AS (SELECT vec_id, centroid_id AS cluster FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, centroid_id) AS rnk
                FROM asg0) WHERE rnk = 1),
      probes0 AS (SELECT n.vec_id AS query_id, cent.centroid_id,
                    ${dotSql.format("n.v", "centv")} / (n.nrm * centn) AS ccos
                  FROM n CROSS JOIN cent WHERE n.vec_id < 5),
      probes AS (SELECT query_id, centroid_id AS cluster FROM (
                   SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ccos DESC, centroid_id) AS rnk
                   FROM probes0) WHERE rnk <= 2),
      ${pqCte(m = 8, k = 16, iters = 2, dsub = 8, trainWhere = s" WHERE ${sampleFilterSql("vec_id", 4)}")},
      pe AS (SELECT s.vec_id, s.sub, c.cid,
               list_reduce(list_transform(c.cv, x -> x * x), (a, b) -> a + b) -
                 2 * ${dotSql.format("s.sv", "c.cv")} AS dist
             FROM pq_sv s JOIN pc2 c ON c.sub = s.sub),
      penc AS (SELECT vec_id, sub, cid FROM (
               SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rnk
               FROM pe) WHERE rnk = 1),
      plut AS (SELECT s.vec_id AS query_id, s.sub, c.cid,
                 ${dotSql.format("s.sv", "c.cv")} AS ip
               FROM pq_sv s JOIN pc2 c ON c.sub = s.sub WHERE s.vec_id < 5),
      cand AS (SELECT p.query_id, a.vec_id FROM asg a JOIN probes p ON a.cluster = p.cluster
               WHERE a.vec_id <> p.query_id),
      psc0 AS (SELECT cd.query_id, cd.vec_id AS neighbor_id, e.sub, l.ip
               FROM cand cd
               JOIN penc e ON e.vec_id = cd.vec_id
               JOIN plut l ON l.query_id = cd.query_id AND l.sub = e.sub AND l.cid = e.cid),
      psc AS (SELECT query_id, neighbor_id,
                list_reduce(list(ip ORDER BY sub), (a, b) -> a + b) AS adc
              FROM psc0 GROUP BY 1, 2),
      pr AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rnk
             FROM psc)
      SELECT query_id, neighbor_id, adc, rnk FROM pr WHERE rnk <= 5 ORDER BY query_id, rnk
    """))

  /** S13 — RESIDUAL IVF+PQ ([[Similarity.pqTrainResidual]] →
    * pqEncodeResidual → ivfPqResidualSearch): s6's stack with codebooks
    * trained on (unit vector − assigned coarse centroid) residuals and the
    * ADC score decomposed as coarse-dot + residual-codeword sum — Jégou et
    * al.'s IVFADC at the same 8 bytes/vector. The oracle replays coarse
    * training, assignment, residual subtraction (grid re-quantized),
    * residual codebook training, encode, and the two-term ranking
    * end-to-end — any drift in the subtraction, the grid round, or the
    * coarse-term pairing flips rows.
    */
  val s13AnnIvfPqResidual = QueryDef(
    "s13_ann_ivfpq_residual",
    (s, dir) => {
      val emb = Td(s, dir, "embeddings")
      val centroids = Similarity.kmeansTrain(emb, "vec_id", "embedding", k = 8, iters = 2)
        .select(col("centroid_id").cast("long").as("vec_id"), col("embedding"))
      // centers come from ONE pass over the FULL corpus and are shared by
      // train, encode, and search — the residual-space consistency contract
      val centers = Similarity.residualCenters(emb, centroids, "vec_id", "embedding")
      val books = Similarity.pqTrainResidual(emb, "vec_id", "embedding", centroids,
        centers, dim = 64, m = 8, k = 16, iters = 2, sampleMod = Some(4))
      val index = graft.tables.Scratch.stage(
        Similarity.pqEncodeResidual(emb, centroids, centers, "vec_id", "embedding", books),
        "s13_ivfpqr_index", Seq("cluster"))
      Similarity.ivfPqResidualSearch(emb.filter(col("vec_id") < 5), index, centroids,
          centers, "vec_id", "embedding", books, k = 5, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"), col("adc"),
          col("rnk").cast("long").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    },
    Some(s"""
      WITH $vecCte,
      ${kmeansCte(8, 2)},
      ${trainedCentSql(2)},
      asg0 AS (SELECT n.vec_id, cent.centroid_id,
                 ${dotSql.format("n.v", "centv")} / (n.nrm * centn) AS ccos
               FROM n CROSS JOIN cent),
      asg AS (SELECT vec_id, centroid_id AS cluster FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, centroid_id) AS rnk
                FROM asg0) WHERE rnk = 1),
      probes0 AS (SELECT n.vec_id AS query_id, cent.centroid_id,
                    ${dotSql.format("n.v", "centv")} / (n.nrm * centn) AS ccos
                  FROM n CROSS JOIN cent WHERE n.vec_id < 5),
      probes AS (SELECT query_id, centroid_id AS cluster FROM (
                   SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ccos DESC, centroid_id) AS rnk
                   FROM probes0) WHERE rnk <= 2),
      ${pqResCte(m = 8, k = 16, iters = 2, dsub = 8, trainWhere = s" WHERE ${sampleFilterSql("vec_id", 4)}")},
      pe AS (SELECT s.vec_id, s.sub, c.cid,
               list_reduce(list_transform(c.cv, x -> x * x), (a, b) -> a + b) -
                 2 * ${dotSql.format("s.sv", "c.cv")} AS dist
             FROM pq_sv s JOIN pc2 c ON c.sub = s.sub),
      penc AS (SELECT vec_id, sub, cid FROM (
               SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rnk
               FROM pe) WHERE rnk = 1),
      plut AS (SELECT s.vec_id AS query_id, s.sub, c.cid,
                 ${dotSql.format("s.sv", "c.cv")} AS ip
               FROM pq_qsv s JOIN pc2 c ON c.sub = s.sub WHERE s.vec_id < 5),
      coarse AS (SELECT u.vec_id AS query_id, cu.centroid_id AS cluster,
                   ${dotSql.format("u.uv", "cu.centuv")} AS cip
                 FROM pq_u u CROSS JOIN centu cu WHERE u.vec_id < 5),
      cand AS (SELECT p.query_id, a.vec_id, a.cluster
               FROM asg a JOIN probes p ON a.cluster = p.cluster
               WHERE a.vec_id <> p.query_id),
      psc0 AS (SELECT cd.query_id, cd.vec_id AS neighbor_id, cd.cluster, e.sub, l.ip
               FROM cand cd
               JOIN penc e ON e.vec_id = cd.vec_id
               JOIN plut l ON l.query_id = cd.query_id AND l.sub = e.sub AND l.cid = e.cid),
      psc AS (SELECT query_id, neighbor_id, cluster,
                list_reduce(list(ip ORDER BY sub), (a, b) -> a + b) AS radc
              FROM psc0 GROUP BY 1, 2, 3),
      pscf AS (SELECT p.query_id, p.neighbor_id, co.cip + p.radc AS adc
               FROM psc p JOIN coarse co ON co.query_id = p.query_id AND co.cluster = p.cluster),
      pr AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rnk
             FROM pscf)
      SELECT query_id, neighbor_id, adc, rnk FROM pr WHERE rnk <= 5 ORDER BY query_id, rnk
    """),
    // the full train+encode+search pipeline: correctness-only — a bench
    // entry dominated by one-time training masks search-path regressions
    // (r13 verdict); s15_ann_search times the recurring path against the
    // durable index, and ScaleStress --ann tracks the build cost
    benchmark = false)

  /** S17 — BUDGETED residual IVF+PQ search ([[Similarity
    * .ivfPqResidualSearchBudgeted]]): s13's stack with the probe count
    * replaced by a scanned-codes budget — per query, the cosine-ranked
    * centroid prefix whose cumulative cluster size stays ≤ the budget
    * (top-1 always) is probed, so per-query scan cost is bounded even
    * when the cluster histogram is skewed (the healthskew battery's
    * motivation, BENCH_LOCAL_r16.md §4). The oracle replays the prefix
    * rule as a windowed running sum over the same (ccos DESC,
    * centroid_id) order plus s13's full IVFADC pipeline — a drift in the
    * budget arithmetic or the tie order flips which clusters are probed
    * and therefore whole result rows.
    */
  val s17AnnBudgeted = QueryDef(
    "s17_ann_budgeted",
    (s, dir) => {
      val emb = Td(s, dir, "embeddings")
      val centroids = Similarity.kmeansTrain(emb, "vec_id", "embedding", k = 8, iters = 2)
        .select(col("centroid_id").cast("long").as("vec_id"), col("embedding"))
      val centers = Similarity.residualCenters(emb, centroids, "vec_id", "embedding")
      val books = Similarity.pqTrainResidual(emb, "vec_id", "embedding", centroids,
        centers, dim = 64, m = 8, k = 16, iters = 2, sampleMod = Some(4))
      val index = graft.tables.Scratch.stage(
        Similarity.pqEncodeResidual(emb, centroids, centers, "vec_id", "embedding", books),
        "s17_budget_index", Seq("cluster"))
      val sizes = index.groupBy(col("cluster")).agg(count(lit(1)).as("csize"))
      Similarity.ivfPqResidualSearchBudgeted(emb.filter(col("vec_id") < 5), index,
          centroids, centers, "vec_id", "embedding", books, k = 5,
          codesBudget = 60L, clusterSizes = sizes)
        .select(col("query_id"), col("neighbor_id"), col("adc"),
          col("rnk").cast("long").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    },
    Some(s"""
      WITH $vecCte,
      ${kmeansCte(8, 2)},
      ${trainedCentSql(2)},
      asg0 AS (SELECT n.vec_id, cent.centroid_id,
                 ${dotSql.format("n.v", "centv")} / (n.nrm * centn) AS ccos
               FROM n CROSS JOIN cent),
      asg AS (SELECT vec_id, centroid_id AS cluster FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, centroid_id) AS rnk
                FROM asg0) WHERE rnk = 1),
      csz AS (SELECT cluster, count(*) AS csize FROM asg GROUP BY 1),
      probes0 AS (SELECT n.vec_id AS query_id, cent.centroid_id,
                    ${dotSql.format("n.v", "centv")} / (n.nrm * centn) AS ccos
                  FROM n CROSS JOIN cent WHERE n.vec_id < 5),
      probes AS (SELECT query_id, cluster FROM (
                   SELECT p.query_id, p.centroid_id AS cluster,
                     ROW_NUMBER() OVER (PARTITION BY p.query_id ORDER BY p.ccos DESC, p.centroid_id) AS rnk,
                     SUM(coalesce(c.csize, 0)) OVER (PARTITION BY p.query_id ORDER BY p.ccos DESC, p.centroid_id
                       ROWS UNBOUNDED PRECEDING) AS cum
                   FROM probes0 p LEFT JOIN csz c ON c.cluster = p.centroid_id)
                 WHERE rnk = 1 OR cum <= 60),
      ${pqResCte(m = 8, k = 16, iters = 2, dsub = 8, trainWhere = s" WHERE ${sampleFilterSql("vec_id", 4)}")},
      pe AS (SELECT s.vec_id, s.sub, c.cid,
               list_reduce(list_transform(c.cv, x -> x * x), (a, b) -> a + b) -
                 2 * ${dotSql.format("s.sv", "c.cv")} AS dist
             FROM pq_sv s JOIN pc2 c ON c.sub = s.sub),
      penc AS (SELECT vec_id, sub, cid FROM (
               SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rnk
               FROM pe) WHERE rnk = 1),
      plut AS (SELECT s.vec_id AS query_id, s.sub, c.cid,
                 ${dotSql.format("s.sv", "c.cv")} AS ip
               FROM pq_qsv s JOIN pc2 c ON c.sub = s.sub WHERE s.vec_id < 5),
      coarse AS (SELECT u.vec_id AS query_id, cu.centroid_id AS cluster,
                   ${dotSql.format("u.uv", "cu.centuv")} AS cip
                 FROM pq_u u CROSS JOIN centu cu WHERE u.vec_id < 5),
      cand AS (SELECT p.query_id, a.vec_id, a.cluster
               FROM asg a JOIN probes p ON a.cluster = p.cluster
               WHERE a.vec_id <> p.query_id),
      psc0 AS (SELECT cd.query_id, cd.vec_id AS neighbor_id, cd.cluster, e.sub, l.ip
               FROM cand cd
               JOIN penc e ON e.vec_id = cd.vec_id
               JOIN plut l ON l.query_id = cd.query_id AND l.sub = e.sub AND l.cid = e.cid),
      psc AS (SELECT query_id, neighbor_id, cluster,
                list_reduce(list(ip ORDER BY sub), (a, b) -> a + b) AS radc
              FROM psc0 GROUP BY 1, 2, 3),
      pscf AS (SELECT p.query_id, p.neighbor_id, co.cip + p.radc AS adc
               FROM psc p JOIN coarse co ON co.query_id = p.query_id AND co.cluster = p.cluster),
      pr AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rnk
             FROM pscf)
      SELECT query_id, neighbor_id, adc, rnk FROM pr WHERE rnk <= 5 ORDER BY query_id, rnk
    """),
    // correctness-only, the s13 rationale: training dominates the timing
    benchmark = false)

  /** S18 — batch SELF-pairing through the stored quantizers
    * ([[graft.ext.AnnIndex.selfPairs]]): the sub-quadratic all-pairs
    * route for thresholds where sign-LSH stops pruning (τ < 0.9 floors
    * [[Similarity.lshRowsPerBand]] at r = 4) — the batch encodes
    * map-only against s15's FROZEN index artifacts, each row proposes
    * its kShort nearest batch-mates by float-free ADC over the batch's
    * OWN codes, and only those candidates pay the exact-cosine confirm.
    * Candidates are |B|×kShort at ANY τ. Shares s15's durable index
    * (existence probe — whichever query runs first pays the build). The
    * oracle replays the whole stack: s15's training split, batch-only
    * encode/probes/ADC rank, the kShort cut, exact re-score, threshold,
    * and the min/max pair orientation with both-orientations dedup — a
    * drift in any stage flips whole pair rows.
    */
  val s18AnnSelfPairs = QueryDef(
    "s18_ann_self_pairs",
    (s, dir) => {
      import graft.ext.AnnIndex
      val emb = Td(s, dir, "embeddings")
      val store = graft.tables.Scratch.store(s)
      if (!store.exists("s15_ann_codes"))
        AnnIndex.build(store, "s15_ann", emb, "vec_id", "embedding",
          dim = 64, nlist = 8, coarseIters = 2, m = 8, k = 16, pqIters = 2,
          sampleMod = Some(4))
      AnnIndex.selfPairs(store, "s15_ann", emb.filter(col("vec_id") < 40),
          "vec_id", "embedding", threshold = 0.3, kShort = 10, nprobe = 2)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(s"""
      WITH $vecCte,
      ${kmeansCte(8, 2, srcWhere = s" WHERE ${sampleFilterSql("vec_id", 4)}")},
      ${trainedCentSql(2)},
      asg0 AS (SELECT n.vec_id, cent.centroid_id,
                 ${dotSql.format("n.v", "centv")} / (n.nrm * centn) AS ccos
               FROM n CROSS JOIN cent),
      asg AS (SELECT vec_id, centroid_id AS cluster FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, centroid_id) AS rnk
                FROM asg0) WHERE rnk = 1),
      probes AS (SELECT vec_id AS query_id, centroid_id AS cluster FROM (
                   SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, centroid_id) AS rnk
                   FROM asg0 WHERE vec_id < 40) WHERE rnk <= 2),
      ${pqResCte(m = 8, k = 16, iters = 2, dsub = 8,
        trainWhere = s" WHERE ${sampleFilterSql("vec_id", 4)}")},
      pe AS (SELECT s.vec_id, s.sub, c.cid,
               list_reduce(list_transform(c.cv, x -> x * x), (a, b) -> a + b) -
                 2 * ${dotSql.format("s.sv", "c.cv")} AS dist
             FROM pq_sv s JOIN pc2 c ON c.sub = s.sub WHERE s.vec_id < 40),
      penc AS (SELECT vec_id, sub, cid FROM (
               SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rnk
               FROM pe) WHERE rnk = 1),
      plut AS (SELECT s.vec_id AS query_id, s.sub, c.cid,
                 ${dotSql.format("s.sv", "c.cv")} AS ip
               FROM pq_qsv s JOIN pc2 c ON c.sub = s.sub WHERE s.vec_id < 40),
      coarse AS (SELECT u.vec_id AS query_id, cu.centroid_id AS cluster,
                   ${dotSql.format("u.uv", "cu.centuv")} AS cip
                 FROM pq_u u CROSS JOIN centu cu WHERE u.vec_id < 40),
      cand AS (SELECT p.query_id, a.vec_id, a.cluster
               FROM asg a JOIN probes p ON a.cluster = p.cluster
               WHERE a.vec_id < 40 AND a.vec_id <> p.query_id),
      psc0 AS (SELECT cd.query_id, cd.vec_id AS neighbor_id, cd.cluster, e.sub, l.ip
               FROM cand cd
               JOIN penc e ON e.vec_id = cd.vec_id
               JOIN plut l ON l.query_id = cd.query_id AND l.sub = e.sub AND l.cid = e.cid),
      psc AS (SELECT query_id, neighbor_id, cluster,
                list_reduce(list(ip ORDER BY sub), (a, b) -> a + b) AS radc
              FROM psc0 GROUP BY 1, 2, 3),
      pscf AS (SELECT p.query_id, p.neighbor_id, co.cip + p.radc AS adc
               FROM psc p JOIN coarse co ON co.query_id = p.query_id AND co.cluster = p.cluster),
      pr AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rnk
             FROM pscf),
      short AS (SELECT query_id, neighbor_id FROM pr WHERE rnk <= 10),
      -- the verbatim-flood star leg: code-identical (cluster, code-list)
      -- groups pair min-id -> member, bypassing the ADC rank cut
      pcl AS (SELECT e.vec_id, a.cluster, list(e.cid ORDER BY e.sub) AS cl
              FROM penc e JOIN asg a ON a.vec_id = e.vec_id GROUP BY 1, 2),
      prep AS (SELECT cluster, cl, min(vec_id) AS rep, count(*) AS grp_n
               FROM pcl GROUP BY 1, 2),
      pstar AS (SELECT p.rep AS query_id, c.vec_id AS neighbor_id
                FROM pcl c JOIN prep p ON p.cluster = c.cluster AND p.cl = c.cl
                WHERE p.grp_n > 1 AND c.vec_id <> p.rep),
      cand2 AS (SELECT query_id, neighbor_id FROM short
                UNION ALL SELECT query_id, neighbor_id FROM pstar),
      rf AS (SELECT sh.query_id, sh.neighbor_id,
               ${dotSql.format("q.v", "c.v")} / (q.nrm * c.nrm) AS cos
             FROM cand2 sh
             JOIN n q ON q.vec_id = sh.query_id
             JOIN n c ON c.vec_id = sh.neighbor_id)
      SELECT DISTINCT least(query_id, neighbor_id) AS id_a,
             greatest(query_id, neighbor_id) AS id_b, cos
      FROM rf WHERE cos >= 0.3
      ORDER BY id_a, id_b
    """),
    // correctness-only, the s13 rationale: training dominates the timing
    benchmark = false)

  /** S19 — two-stage BUDGETED search against the durable index
    * ([[graft.ext.AnnIndex.searchBudgetedRefined]]): s17's scanned-codes
    * prefix rule applied to s15's STORED index (sizes from the csizes
    * cache), then s16's exact re-rank over the shortlist — the
    * production shape of the latency-SLO dial, measured in
    * BENCH_LOCAL_r17.md §2 (equal to fixed-nprobe on balanced geometry,
    * strictly better per scanned code under skew). Shares s15's index
    * (existence probe); benched, so the dial's stored-index path has a
    * recorded number next to s15/s16. The oracle replays s15's training
    * split + the budget-prefix probe selection + the ADC kShort cut +
    * the exact re-score.
    */
  val s19AnnBudgetRefine = QueryDef(
    "s19_ann_budget_refine",
    (s, dir) => {
      import graft.ext.AnnIndex
      val emb = Td(s, dir, "embeddings")
      val store = graft.tables.Scratch.store(s)
      if (!store.exists("s15_ann_codes"))
        AnnIndex.build(store, "s15_ann", emb, "vec_id", "embedding",
          dim = 64, nlist = 8, coarseIters = 2, m = 8, k = 16, pqIters = 2,
          sampleMod = Some(4))
      AnnIndex.searchBudgetedRefined(store, "s15_ann",
          emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding",
          k = 5, kShort = 10, codesBudget = 150)
        .select(col("query_id"), col("neighbor_id"), col("cos"),
          col("rnk").cast("long").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    },
    Some(s"""
      WITH $vecCte,
      ${kmeansCte(8, 2, srcWhere = s" WHERE ${sampleFilterSql("vec_id", 4)}")},
      ${trainedCentSql(2)},
      asg0 AS (SELECT n.vec_id, cent.centroid_id,
                 ${dotSql.format("n.v", "centv")} / (n.nrm * centn) AS ccos
               FROM n CROSS JOIN cent),
      asg AS (SELECT vec_id, centroid_id AS cluster FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, centroid_id) AS rnk
                FROM asg0) WHERE rnk = 1),
      csz AS (SELECT cluster, count(*) AS csize FROM asg GROUP BY 1),
      probes AS (SELECT query_id, cluster FROM (
                   SELECT p.vec_id AS query_id, p.centroid_id AS cluster,
                     ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY p.ccos DESC, p.centroid_id) AS rnk,
                     SUM(coalesce(c.csize, 0)) OVER (PARTITION BY p.vec_id ORDER BY p.ccos DESC, p.centroid_id
                       ROWS UNBOUNDED PRECEDING) AS cum
                   FROM asg0 p LEFT JOIN csz c ON c.cluster = p.centroid_id
                   WHERE p.vec_id < 5)
                 WHERE rnk = 1 OR cum <= 150),
      ${pqResCte(m = 8, k = 16, iters = 2, dsub = 8,
        trainWhere = s" WHERE ${sampleFilterSql("vec_id", 4)}")},
      pe AS (SELECT s.vec_id, s.sub, c.cid,
               list_reduce(list_transform(c.cv, x -> x * x), (a, b) -> a + b) -
                 2 * ${dotSql.format("s.sv", "c.cv")} AS dist
             FROM pq_sv s JOIN pc2 c ON c.sub = s.sub),
      penc AS (SELECT vec_id, sub, cid FROM (
               SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rnk
               FROM pe) WHERE rnk = 1),
      plut AS (SELECT s.vec_id AS query_id, s.sub, c.cid,
                 ${dotSql.format("s.sv", "c.cv")} AS ip
               FROM pq_qsv s JOIN pc2 c ON c.sub = s.sub WHERE s.vec_id < 5),
      coarse AS (SELECT u.vec_id AS query_id, cu.centroid_id AS cluster,
                   ${dotSql.format("u.uv", "cu.centuv")} AS cip
                 FROM pq_u u CROSS JOIN centu cu WHERE u.vec_id < 5),
      cand AS (SELECT p.query_id, a.vec_id, a.cluster
               FROM asg a JOIN probes p ON a.cluster = p.cluster
               WHERE a.vec_id <> p.query_id),
      psc0 AS (SELECT cd.query_id, cd.vec_id AS neighbor_id, cd.cluster, e.sub, l.ip
               FROM cand cd
               JOIN penc e ON e.vec_id = cd.vec_id
               JOIN plut l ON l.query_id = cd.query_id AND l.sub = e.sub AND l.cid = e.cid),
      psc AS (SELECT query_id, neighbor_id, cluster,
                list_reduce(list(ip ORDER BY sub), (a, b) -> a + b) AS radc
              FROM psc0 GROUP BY 1, 2, 3),
      pscf AS (SELECT p.query_id, p.neighbor_id, co.cip + p.radc AS adc
               FROM psc p JOIN coarse co ON co.query_id = p.query_id AND co.cluster = p.cluster),
      pr AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rnk
             FROM pscf),
      short AS (SELECT query_id, neighbor_id FROM pr WHERE rnk <= 10),
      rf AS (SELECT sh.query_id, sh.neighbor_id,
               ${dotSql.format("q.v", "c.v")} / (q.nrm * c.nrm) AS cos
             FROM short sh
             JOIN n q ON q.vec_id = sh.query_id
             JOIN n c ON c.vec_id = sh.neighbor_id),
      rr AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
             FROM rf)
      SELECT query_id, neighbor_id, cos, rnk FROM rr WHERE rnk <= 5 ORDER BY query_id, rnk
    """))

  /** S15 — search against the DURABLE residual-IVF+PQ index, benched
    * SEARCH-ONLY: [[graft.ext.AnnIndex.build]] runs once per process
    * (guarded by a codes-table existence probe — the index is the durable
    * artifact, exactly like production), and the timed path is
    * [[graft.ext.AnnIndex.search]]: artifact loads bounded by geometry
    * (k + k + m·k rows), probed-cluster partition prune on the codes
    * table, float-free ADC ranking. Bench takes the min of two in-session
    * passes, so the recorded number is the pass that found the index
    * already built — the s6 cost class, where a search regression is
    * visible instead of drowned by training.
    *
    * Training differs from s13 in ONE knob: coarse k-means trains on the
    * md5 %4 sample (the [[graft.ext.AnnIndex.build]] contract routes
    * `sampleMod` to both trainers — the documented 100 TB path), where
    * s13 trains coarse on the full corpus. The oracle replays that
    * training split; everything downstream (centers, encode, probe,
    * two-term ADC) is s13's machinery verbatim.
    */
  val s15AnnSearch = QueryDef(
    "s15_ann_search",
    (s, dir) => {
      import graft.ext.AnnIndex
      val emb = Td(s, dir, "embeddings")
      val store = graft.tables.Scratch.store(s)
      if (!store.exists("s15_ann_codes"))
        AnnIndex.build(store, "s15_ann", emb, "vec_id", "embedding",
          dim = 64, nlist = 8, coarseIters = 2, m = 8, k = 16, pqIters = 2,
          sampleMod = Some(4))
      AnnIndex.search(store, "s15_ann", emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 5, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"), col("adc"),
          col("rnk").cast("long").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    },
    Some(s"""
      WITH $vecCte,
      ${kmeansCte(8, 2, srcWhere = s" WHERE ${sampleFilterSql("vec_id", 4)}")},
      ${trainedCentSql(2)},
      asg0 AS (SELECT n.vec_id, cent.centroid_id,
                 ${dotSql.format("n.v", "centv")} / (n.nrm * centn) AS ccos
               FROM n CROSS JOIN cent),
      asg AS (SELECT vec_id, centroid_id AS cluster FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, centroid_id) AS rnk
                FROM asg0) WHERE rnk = 1),
      probes0 AS (SELECT n.vec_id AS query_id, cent.centroid_id,
                    ${dotSql.format("n.v", "centv")} / (n.nrm * centn) AS ccos
                  FROM n CROSS JOIN cent WHERE n.vec_id < 5),
      probes AS (SELECT query_id, centroid_id AS cluster FROM (
                   SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ccos DESC, centroid_id) AS rnk
                   FROM probes0) WHERE rnk <= 2),
      ${pqResCte(m = 8, k = 16, iters = 2, dsub = 8,
        trainWhere = s" WHERE ${sampleFilterSql("vec_id", 4)}")},
      pe AS (SELECT s.vec_id, s.sub, c.cid,
               list_reduce(list_transform(c.cv, x -> x * x), (a, b) -> a + b) -
                 2 * ${dotSql.format("s.sv", "c.cv")} AS dist
             FROM pq_sv s JOIN pc2 c ON c.sub = s.sub),
      penc AS (SELECT vec_id, sub, cid FROM (
               SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rnk
               FROM pe) WHERE rnk = 1),
      plut AS (SELECT s.vec_id AS query_id, s.sub, c.cid,
                 ${dotSql.format("s.sv", "c.cv")} AS ip
               FROM pq_qsv s JOIN pc2 c ON c.sub = s.sub WHERE s.vec_id < 5),
      coarse AS (SELECT u.vec_id AS query_id, cu.centroid_id AS cluster,
                   ${dotSql.format("u.uv", "cu.centuv")} AS cip
                 FROM pq_u u CROSS JOIN centu cu WHERE u.vec_id < 5),
      cand AS (SELECT p.query_id, a.vec_id, a.cluster
               FROM asg a JOIN probes p ON a.cluster = p.cluster
               WHERE a.vec_id <> p.query_id),
      psc0 AS (SELECT cd.query_id, cd.vec_id AS neighbor_id, cd.cluster, e.sub, l.ip
               FROM cand cd
               JOIN penc e ON e.vec_id = cd.vec_id
               JOIN plut l ON l.query_id = cd.query_id AND l.sub = e.sub AND l.cid = e.cid),
      psc AS (SELECT query_id, neighbor_id, cluster,
                list_reduce(list(ip ORDER BY sub), (a, b) -> a + b) AS radc
              FROM psc0 GROUP BY 1, 2, 3),
      pscf AS (SELECT p.query_id, p.neighbor_id, co.cip + p.radc AS adc
               FROM psc p JOIN coarse co ON co.query_id = p.query_id AND co.cluster = p.cluster),
      pr AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rnk
             FROM pscf)
      SELECT query_id, neighbor_id, adc, rnk FROM pr WHERE rnk <= 5 ORDER BY query_id, rnk
    """))

  /** S16 — two-stage ANN: ADC shortlist + EXACT re-rank (IVFADC+R,
    * [[graft.ext.AnnIndex.searchRefined]]) — the production retrieval
    * shape: the stored float-free index proposes kShort=25 candidates per
    * query, and only those 25 rows pay an exact cosine against the
    * original vectors (one broadcast-pruned map pass over the embeddings
    * scan — the corpus never shuffles and never stores floats twice).
    * Shares s15's durable index verbatim (same name, same build params,
    * existence probe — whichever query runs first pays the build), so the
    * bench delta s16 − s15 IS the refine cost. Output is ⊆ the shortlist
    * by construction: refine repairs ORDER, not RECALL — the oracle's
    * exact ranks come from re-scoring `pr rnk ≤ 25`, never from a fresh
    * brute-force, so a shortlist miss stays missed in both engines.
    */
  val s16AnnRefine = QueryDef(
    "s16_ann_refine",
    (s, dir) => {
      import graft.ext.AnnIndex
      val emb = Td(s, dir, "embeddings")
      val store = graft.tables.Scratch.store(s)
      if (!store.exists("s15_ann_codes"))
        AnnIndex.build(store, "s15_ann", emb, "vec_id", "embedding",
          dim = 64, nlist = 8, coarseIters = 2, m = 8, k = 16, pqIters = 2,
          sampleMod = Some(4))
      AnnIndex.searchRefined(store, "s15_ann", emb.filter(col("vec_id") < 5),
          emb, "vec_id", "embedding", k = 5, kShort = 25, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"), col("cos"),
          col("rnk").cast("long").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    },
    Some(s"""
      WITH $vecCte,
      ${kmeansCte(8, 2, srcWhere = s" WHERE ${sampleFilterSql("vec_id", 4)}")},
      ${trainedCentSql(2)},
      asg0 AS (SELECT n.vec_id, cent.centroid_id,
                 ${dotSql.format("n.v", "centv")} / (n.nrm * centn) AS ccos
               FROM n CROSS JOIN cent),
      asg AS (SELECT vec_id, centroid_id AS cluster FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, centroid_id) AS rnk
                FROM asg0) WHERE rnk = 1),
      probes0 AS (SELECT n.vec_id AS query_id, cent.centroid_id,
                    ${dotSql.format("n.v", "centv")} / (n.nrm * centn) AS ccos
                  FROM n CROSS JOIN cent WHERE n.vec_id < 5),
      probes AS (SELECT query_id, centroid_id AS cluster FROM (
                   SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ccos DESC, centroid_id) AS rnk
                   FROM probes0) WHERE rnk <= 2),
      ${pqResCte(m = 8, k = 16, iters = 2, dsub = 8,
        trainWhere = s" WHERE ${sampleFilterSql("vec_id", 4)}")},
      pe AS (SELECT s.vec_id, s.sub, c.cid,
               list_reduce(list_transform(c.cv, x -> x * x), (a, b) -> a + b) -
                 2 * ${dotSql.format("s.sv", "c.cv")} AS dist
             FROM pq_sv s JOIN pc2 c ON c.sub = s.sub),
      penc AS (SELECT vec_id, sub, cid FROM (
               SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rnk
               FROM pe) WHERE rnk = 1),
      plut AS (SELECT s.vec_id AS query_id, s.sub, c.cid,
                 ${dotSql.format("s.sv", "c.cv")} AS ip
               FROM pq_qsv s JOIN pc2 c ON c.sub = s.sub WHERE s.vec_id < 5),
      coarse AS (SELECT u.vec_id AS query_id, cu.centroid_id AS cluster,
                   ${dotSql.format("u.uv", "cu.centuv")} AS cip
                 FROM pq_u u CROSS JOIN centu cu WHERE u.vec_id < 5),
      cand AS (SELECT p.query_id, a.vec_id, a.cluster
               FROM asg a JOIN probes p ON a.cluster = p.cluster
               WHERE a.vec_id <> p.query_id),
      psc0 AS (SELECT cd.query_id, cd.vec_id AS neighbor_id, cd.cluster, e.sub, l.ip
               FROM cand cd
               JOIN penc e ON e.vec_id = cd.vec_id
               JOIN plut l ON l.query_id = cd.query_id AND l.sub = e.sub AND l.cid = e.cid),
      psc AS (SELECT query_id, neighbor_id, cluster,
                list_reduce(list(ip ORDER BY sub), (a, b) -> a + b) AS radc
              FROM psc0 GROUP BY 1, 2, 3),
      pscf AS (SELECT p.query_id, p.neighbor_id, co.cip + p.radc AS adc
               FROM psc p JOIN coarse co ON co.query_id = p.query_id AND co.cluster = p.cluster),
      pr AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rnk
             FROM pscf),
      short AS (SELECT query_id, neighbor_id FROM pr WHERE rnk <= 25),
      rf AS (SELECT sh.query_id, sh.neighbor_id,
               ${dotSql.format("q.v", "c.v")} / (q.nrm * c.nrm) AS cos
             FROM short sh
             JOIN n q ON q.vec_id = sh.query_id
             JOIN n c ON c.vec_id = sh.neighbor_id),
      rr AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
             FROM rf)
      SELECT query_id, neighbor_id, cos, rnk FROM rr WHERE rnk <= 5 ORDER BY query_id, rnk
    """))

  /** S14 — DURABLE ANN index, incremental ([[graft.ext.AnnIndex]]):
    * build the residual-IVF+PQ index on the ~4/5 base slice (quantizers
    * trained on the base's md5 sample), APPEND the ~1/5 increment against
    * the STORED artifacts — no retraining, no re-encode of the base —
    * then search the stored codes table. The oracle replays the whole
    * stack with the build/append split folded into WHERE clauses: coarse
    * and codebook training restricted to the base sample, residual
    * centers to the base, encode and ranking over EVERYTHING — because
    * append-with-frozen-artifacts must be byte-identical to having
    * encoded the increment in the build batch. Any leak of increment
    * vectors into training, or any artifact drift across the
    * persist/reload round-trip, flips rows.
    */
  val s14AnnIndexIncremental = QueryDef(
    "s14_ann_index_incremental",
    (s, dir) => {
      import graft.ext.AnnIndex
      val emb = Td(s, dir, "embeddings")
      val isInc = Similarity.sampleBucket(col("vec_id")) % 5 === 0
      val store = graft.tables.Scratch.store(s)
      AnnIndex.build(store, "s14_ann", emb.filter(!isInc), "vec_id", "embedding",
        dim = 64, nlist = 8, coarseIters = 2, m = 8, k = 16, pqIters = 2,
        sampleMod = Some(4))
      AnnIndex.append(store, "s14_ann", emb.filter(isInc), "vec_id", "embedding")
      AnnIndex.search(store, "s14_ann", emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 5, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"), col("adc"),
          col("rnk").cast("long").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    },
    Some {
      val baseWhere = s"NOT (${sampleFilterSql("vec_id", 5)})"
      s"""
      WITH $vecCte,
      ${kmeansCte(8, 2, srcWhere = s" WHERE $baseWhere AND ${sampleFilterSql("vec_id", 4)}")},
      ${trainedCentSql(2)},
      asg0 AS (SELECT n.vec_id, cent.centroid_id,
                 ${dotSql.format("n.v", "centv")} / (n.nrm * centn) AS ccos
               FROM n CROSS JOIN cent),
      asg AS (SELECT vec_id, centroid_id AS cluster FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, centroid_id) AS rnk
                FROM asg0) WHERE rnk = 1),
      probes0 AS (SELECT n.vec_id AS query_id, cent.centroid_id,
                    ${dotSql.format("n.v", "centv")} / (n.nrm * centn) AS ccos
                  FROM n CROSS JOIN cent WHERE n.vec_id < 5),
      probes AS (SELECT query_id, centroid_id AS cluster FROM (
                   SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ccos DESC, centroid_id) AS rnk
                   FROM probes0) WHERE rnk <= 2),
      ${pqResCte(m = 8, k = 16, iters = 2, dsub = 8,
        trainWhere = s" WHERE NOT (${sampleFilterSql("vec_id", 5)}) AND ${sampleFilterSql("vec_id", 4)}",
        centersWhere = s" WHERE NOT (${sampleFilterSql("u.vec_id", 5)})")},
      pe AS (SELECT s.vec_id, s.sub, c.cid,
               list_reduce(list_transform(c.cv, x -> x * x), (a, b) -> a + b) -
                 2 * ${dotSql.format("s.sv", "c.cv")} AS dist
             FROM pq_sv s JOIN pc2 c ON c.sub = s.sub),
      penc AS (SELECT vec_id, sub, cid FROM (
               SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rnk
               FROM pe) WHERE rnk = 1),
      plut AS (SELECT s.vec_id AS query_id, s.sub, c.cid,
                 ${dotSql.format("s.sv", "c.cv")} AS ip
               FROM pq_qsv s JOIN pc2 c ON c.sub = s.sub WHERE s.vec_id < 5),
      coarse AS (SELECT u.vec_id AS query_id, cu.centroid_id AS cluster,
                   ${dotSql.format("u.uv", "cu.centuv")} AS cip
                 FROM pq_u u CROSS JOIN centu cu WHERE u.vec_id < 5),
      cand AS (SELECT p.query_id, a.vec_id, a.cluster
               FROM asg a JOIN probes p ON a.cluster = p.cluster
               WHERE a.vec_id <> p.query_id),
      psc0 AS (SELECT cd.query_id, cd.vec_id AS neighbor_id, cd.cluster, e.sub, l.ip
               FROM cand cd
               JOIN penc e ON e.vec_id = cd.vec_id
               JOIN plut l ON l.query_id = cd.query_id AND l.sub = e.sub AND l.cid = e.cid),
      psc AS (SELECT query_id, neighbor_id, cluster,
                list_reduce(list(ip ORDER BY sub), (a, b) -> a + b) AS radc
              FROM psc0 GROUP BY 1, 2, 3),
      pscf AS (SELECT p.query_id, p.neighbor_id, co.cip + p.radc AS adc
               FROM psc p JOIN coarse co ON co.query_id = p.query_id AND co.cluster = p.cluster),
      pr AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rnk
             FROM pscf)
      SELECT query_id, neighbor_id, adc, rnk FROM pr WHERE rnk <= 5 ORDER BY query_id, rnk
    """
    },
    // build+append+search end-to-end: the search shape is s13's (benched
    // via s6's identical machinery); build is the once-ever cost
    benchmark = false)

  /** S7 — hard-negative mining ([[Similarity.hardNegatives]]): top-5
    * nearest OTHER-label vectors per query — the contrastive-training
    * negatives that actually carry gradient. Label inequality rides the
    * join filter on the s1 scan shape.
    */
  val s7HardNegatives = QueryDef(
    "s7_hard_negatives",
    (s, dir) => {
      val emb = Td(s, dir, "embeddings")
      Similarity.hardNegatives(emb.filter(col("vec_id") < 5), emb,
          "vec_id", "embedding", "label", k = 5)
        .select(col("query_id"), col("neighbor_id"),
          col("n_label").cast("long").as("n_label"), col("cos"),
          col("rnk").cast("long").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    },
    Some(s"""
      WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      n2 AS (SELECT vec_id, label, v,
               sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm FROM e),
      scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   CAST(c.label AS BIGINT) AS n_label,
                   ${dotSql.format("q.v", "c.v")} / (q.nrm * c.nrm) AS cos
                 FROM n2 q JOIN n2 c ON c.label <> q.label WHERE q.vec_id < 5),
      r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
            FROM scored)
      SELECT query_id, neighbor_id, n_label, cos, rnk FROM r WHERE rnk <= 5
      ORDER BY query_id, rnk
    """),
    // the s1 cross-join+window scan shape, plus one filter — stays out of
    // the bench set like s3
    benchmark = false)

  /** X20 — per-source corpus report: the curation dashboard a corpus owner
    * reads before choosing mixing weights — documents, token mass, quality
    * band, and the Gopher keep rate per source, one aggregation pass.
    */
  val x20CorpusReport = QueryDef(
    "x20_corpus_report",
    (s, dir) => {
      val t = col("text")
      Td(s, dir, "documents")
        .select(col("source"), TA.tokenCount(t).cast("long").as("n_tok"),
          TA.qualityScore(t).as("q"), TA.gopherKeep(t).cast("int").as("keep"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_tok")).cast("long").as("n_tokens"),
          min(col("q")).as("min_quality"),
          max(col("q")).as("max_quality"),
          (sum(col("keep")).cast("double") / count(lit(1))).as("keep_rate"))
        .orderBy(col("source"))
    },
    Some {
      s"""
      WITH m AS (SELECT source, text AS t,
              regexp_split_to_array(trim(text), '\\s+') AS ws,
              regexp_split_to_array(trim(lower(text)), '\\s+') AS lws,
              string_split(text, chr(10)) AS ls
            FROM documents),
      d AS (SELECT source,
              CAST(len(ws) AS BIGINT) AS n_tok,
              0.5 * least(CAST(len(ws) AS DOUBLE) / 64.0, 1.0)
                + 0.5 * least((CAST(len(list_filter(ws,
                    x -> list_contains(${sqlList(TA.Stopwords)}, x))) AS DOUBLE)
                    / len(ws)) * 4.0, 1.0)
                - (CAST(len(regexp_extract_all(lower(t), '[^a-z0-9\\s]')) AS DOUBLE)
                    / greatest(length(t), 1)) * 2.0 AS q,
              CAST(${gopherCondSql("t", minWords = 50)} AS INT) AS keep
            FROM m)
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             min(q) AS min_quality,
             max(q) AS max_quality,
             CAST(sum(keep) AS DOUBLE) / count(*) AS keep_rate
      FROM d GROUP BY source ORDER BY source
    """
    },
    // e1/q1 time the scan+agg shape; compact-line headroom (see e2)
    benchmark = false)

  /** Shared oracle fragment: the Gopher keep condition over a CTE exposing
    * `ws`/`lws`/`ls` (token / lowercased-token / line arrays) plus the raw
    * text expression `t` — ONE definition of the 8 rules and their
    * thresholds for every replay (t11 additionally reports the per-rule
    * columns, so it keeps its expanded form over the same arithmetic).
    */
  private def gopherCondSql(t: String, minWords: Int): String = {
    val req = TA.RequiredStopwords
      .map(w => s"list_contains(lws, '$w')::INT").mkString(" + ")
    s"""len(ws) BETWEEN $minWords AND 100000
          AND CAST(length(regexp_replace($t, '\\s', '', 'g')) AS DOUBLE) / len(ws) >= 3.0
          AND CAST(length(regexp_replace($t, '\\s', '', 'g')) AS DOUBLE) / len(ws) <= 10.0
          AND CAST(len(regexp_extract_all($t, '#|\\.\\.\\.|…')) AS DOUBLE)
              / greatest(len(ws), 1) < 0.1
          AND CAST(len(list_filter(ls, l -> regexp_matches(l, '^\\s*[-*•]'))) AS DOUBLE)
              / greatest(len(ls), 1) < 0.9
          AND CAST(len(list_filter(ls, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$$'))) AS DOUBLE)
              / greatest(len(ls), 1) < 0.3
          AND CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
              / greatest(len(ws), 1) > 0.8
          AND ($req) >= 2"""
  }

  /** C6 — the crawl pipeline end-to-end: HTML page → [[graft.ext.Html]]
    * text extraction → Gopher keep gate → exact dedup on the CLEANED text
    * (two pages differing only in markup share a digest only after the
    * strip). Every doc wears constant page chrome with an id-varying href
    * (markup varies, visible text doesn't); docs with id%10==7 carry one
    * shared body that passes the Gopher gate, so the pipeline must
    * collapse them into a single surviving group.
    */
  val c6CrawlPipeline = QueryDef(
    "c6_crawl_pipeline",
    (s, dir) => {
      val H = graft.ext.Html
      val id = col("doc_id")
      val SharedBody =
        "the crawler kept this page and that body will appear again and " +
          "again with the same words so the dedup stage must fold every copy " +
          "of it into one group for the corpus to stay clean and the count " +
          "of tokens here is kept past the gopher floor by a tail of plain " +
          "words like table row value part key line sort merge batch scan"
      // the corpus vocabulary carries only "the" from the required-stopword
      // list, so raw docs can never reach the >=2 floor — give a third of
      // them a natural-language tail so the gate passes AND fails real rows
      val body = when(id % 10 === 7, lit(SharedBody))
        .when(id % 3 === 0, concat(col("text"), lit(" and that is how it has to be")))
        .otherwise(col("text"))
      val page = concat(
        lit("<html><head><title>Crawl Page</title><style>p{margin:0}</style>" +
          "<script>track(1 < 2);</script></head><body><p>"),
        body,
        lit("</p><a href=\"/p/"), id.cast("string"), lit("\">next</a></body></html>"))
      Td(s, dir, "documents")
        .select(id, H.stripHtml(page).as("clean"))
        // crawl-tuned floor: the corpus's short word-salad docs sit around
        // the published 50-word floor, which together with the stopword
        // rule would annihilate the natural rows and leave the gate
        // one-sided; 20 keeps both outcomes populated
        .filter(TA.gopherKeep(col("clean"), minWords = 20))
        .groupBy(md5(col("clean")).as("content_md5"))
        .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("keep_id"))
    },
    Some {
      val H = graft.ext.Html
      val req = TA.RequiredStopwords
        .map(w => s"list_contains(lws, '$w')::INT").mkString(" + ")
      val shared =
        "the crawler kept this page and that body will appear again and " +
          "again with the same words so the dedup stage must fold every copy " +
          "of it into one group for the corpus to stay clean and the count " +
          "of tokens here is kept past the gopher floor by a tail of plain " +
          "words like table row value part key line sort merge batch scan"
      s"""
      WITH aug AS (SELECT doc_id,
        '<html><head><title>Crawl Page</title><style>p{margin:0}</style>' ||
        '<script>track(1 < 2);</script></head><body><p>' ||
        CASE WHEN doc_id % 10 = 7 THEN '$shared'
             WHEN doc_id % 3 = 0 THEN text || ' and that is how it has to be'
             ELSE text END ||
        '</p><a href="/p/' || CAST(doc_id AS VARCHAR) || '">next</a></body></html>' AS html
        FROM documents),
      cl AS (SELECT doc_id, ${H.stripHtmlSql("html")} AS clean FROM aug),
      m AS (SELECT doc_id, clean,
              regexp_split_to_array(trim(clean), '\\s+') AS ws,
              regexp_split_to_array(trim(lower(clean)), '\\s+') AS lws,
              string_split(clean, chr(10)) AS ls
            FROM cl),
      kept AS (SELECT doc_id, clean FROM m
        WHERE ${gopherCondSql("clean", minWords = 20)})
      SELECT md5(clean) AS content_md5, min(doc_id) AS keep_id, count(*) AS n_copies
      FROM kept GROUP BY md5(clean) ORDER BY keep_id
    """
    },
    // composes already-benched stages (t13 regex chain, t11 gate, d1
    // digest dedup) — stays out of the bench set like c5
    benchmark = false)

  /** Shared oracle fragment: the BM25 scoring chain over `documents` for
    * a fixed term list — lens/stats/postings/df/per-term scores/fixed-order
    * fused score, ending in `bscore(doc_id, score)`. ONE definition for the
    * s9 and s10 replays (a threshold or formula change must not be
    * hand-synced across copies).
    */
  private def bm25Cte(terms: Seq[String], where: String = "",
      dfCap: Option[Long] = None): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    val arms = terms.map(t =>
      s"max(CASE WHEN term = '$t' THEN tscore END) AS \"_t_$t\"").mkString(",\n                 ")
    val total = terms.map(t => s"COALESCE(\"_t_$t\", 0.0)").mkString(" + ")
    // the df-cap prune (s20): a capped term's rows drop BEFORE the wide
    // pivot, so docs matched only by capped terms vanish — the engine's
    // stored-stop-list semantics exactly
    val capPred = dfCap.map(c => s"WHERE bdf.df < $c").getOrElse("")
    s"""lens AS (SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS dlen
             FROM documents $where),
      stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(dlen) / count(*) AS avgdl FROM lens),
      bp AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tcnt FROM (
              SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
              FROM documents $where)
            WHERE term IN ($inList) GROUP BY 1, 2),
      bdf AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM bp GROUP BY 1),
      bts AS (SELECT bp.doc_id, bp.term,
               ((stats.n - bdf.df + 0.5) / (bdf.df + 0.5)) *
                 ((bp.tcnt * (1.2 + 1.0)) /
                  (bp.tcnt + 1.2 * (1.0 - 0.75 + 0.75 * lens.dlen / stats.avgdl))) AS tscore
             FROM bp JOIN bdf ON bp.term = bdf.term
                    JOIN lens ON bp.doc_id = lens.doc_id
                    CROSS JOIN stats
             $capPred),
      bwide AS (SELECT doc_id,
                 $arms
               FROM bts GROUP BY 1),
      bscore AS (SELECT doc_id, $total AS score FROM bwide)"""
  }

  /** S9 — BM25 lexical retrieval ([[graft.ext.Bm25]]): rational-idf BM25
    * top-20 for a fixed query over the corpus — postings filtered to the
    * query vocabulary at the explode, doc length from a no-explode
    * `size()`, N/avgdl as a broadcast 1-row aggregate, per-term scores
    * summed in FIXED query-term order (no float aggregation-order drift).
    */
  val s9Bm25 = QueryDef(
    "s9_bm25",
    (s, dir) =>
      graft.ext.Bm25.score(Td(s, dir, "documents"), "doc_id", "text",
          queryTerms = Seq("table", "merge", "spark"), topK = 20)
        .select(col("doc_id"), col("score"), col("rnk").cast("long").as("rnk"))
        .orderBy(col("rnk")),
    Some(s"""
      WITH ${bm25Cte(Seq("table", "merge", "spark"))},
      r AS (SELECT doc_id, score,
              row_number() OVER (ORDER BY score DESC, doc_id) AS rnk FROM bscore)
      SELECT doc_id, score, rnk FROM r WHERE rnk <= 20 ORDER BY rnk
    """),
    // s1/t5 already time the explode+agg+join scan shapes
    benchmark = false)

  /** S20 — BM25 under the hot-term cap policy ([[graft.ext.Bm25
    * .capIfUnhealthy]] → [[graft.ext.Bm25.searchIndex]] `termDfCap = 0`):
    * the clapper rings on the corpus' stopword-scale terms (this
    * vocabulary's common terms sit at df ≈ 0.78 · N vs the budget 100)
    * and persists the df-cap + stop-term list; the search then prunes
    * 'merge' and 'spark' BEFORE the postings scan and scores 'dup'
    * (df 25) alone — docs matched only by pruned terms drop out. The
    * oracle recomputes the same rule as SQL (per-term df over the
    * corpus, capped terms' rows filtered before the pivot), so the
    * policy's scoring semantics — not just the plumbing — are
    * hash-gated.
    */
  val s20Bm25Capped = QueryDef(
    "s20_bm25_capped",
    (s, dir) => {
      val docs = Td(s, dir, "documents").select(col("doc_id"), col("text"))
      val store = graft.tables.Scratch.store(s)
      graft.ext.Bm25.buildIndex(store, "s20_bm", docs, "doc_id", "text")
      val dec = graft.ext.Bm25.capIfUnhealthy(store, "s20_bm",
        hotTermBudget = 100)
      require(dec.triggered, s"s20 fixture drifted: bell declined at $dec")
      graft.ext.Bm25.searchIndex(store, "s20_bm", "doc_id",
          queryTerms = Seq("dup", "merge", "spark"), topK = 20)
        .select(col("doc_id"), col("score"), col("rnk").cast("long").as("rnk"))
        .orderBy(col("rnk"))
    },
    Some(s"""
      WITH ${bm25Cte(Seq("dup", "merge", "spark"), dfCap = Some(100L))},
      r AS (SELECT doc_id, score,
              row_number() OVER (ORDER BY score DESC, doc_id) AS rnk FROM bscore)
      SELECT doc_id, score, rnk FROM r WHERE rnk <= 20 ORDER BY rnk
    """),
    // the s9 scan shapes plus a vocabulary aggregate — nothing new to time
    benchmark = false)

  /** S10 — hybrid retrieval via reciprocal-rank fusion
    * ([[graft.ext.Ranking.rrfFuse]]): the s9 lexical top-20 fused with a
    * dense cosine top-20 (vec 0 as the dense query, vec_id ≡ doc_id) by
    * `1/(60+rank)` summed in fixed list order — the modern
    * retrieval-stack combiner, calibration-free and fully rational.
    */
  val s10HybridRrf = QueryDef(
    "s10_hybrid_rrf",
    (s, dir) => {
      val lex = graft.ext.Bm25.score(Td(s, dir, "documents"), "doc_id", "text",
        queryTerms = Seq("table", "merge", "spark"), topK = 20)
      val emb = Td(s, dir, "embeddings")
      val dense = Similarity.knnBrute(emb.filter(col("vec_id") === 0), emb,
          "vec_id", "embedding", k = 20)
        .select(col("neighbor_id").as("doc_id"), col("rnk"))
      graft.ext.Ranking.rrfFuse(Seq(lex.select(col("doc_id"), col("rnk")), dense),
          "doc_id", k = 60, topK = 10)
        .select(col("doc_id"), col("rrf"), col("rnk").cast("long").as("rnk"))
        .orderBy(col("rnk"))
    },
    Some(s"""
      WITH ${bm25Cte(Seq("table", "merge", "spark"))},
      lex AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
              FROM bscore QUALIFY rnk <= 20),
      ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      nv AS (SELECT vec_id, v,
               sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm FROM ev),
      dense AS (SELECT doc_id, rnk FROM (
               SELECT c.vec_id AS doc_id,
                 row_number() OVER (ORDER BY
                   list_reduce(list_transform(list_zip(q.v, c.v), p2 -> p2[1] * p2[2]), (a, b) -> a + b)
                     / (q.nrm * c.nrm) DESC, c.vec_id) AS rnk
               FROM nv c CROSS JOIN (SELECT v, nrm FROM nv WHERE vec_id = 0) q
               WHERE c.vec_id <> 0)
              WHERE rnk <= 20),
      fused AS (SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
                 (CASE WHEN l.rnk IS NOT NULL THEN 1.0 / (60.0 + l.rnk) ELSE 0.0 END) +
                 (CASE WHEN d.rnk IS NOT NULL THEN 1.0 / (60.0 + d.rnk) ELSE 0.0 END) AS rrf
               FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id)
      SELECT doc_id, rrf, row_number() OVER (ORDER BY rrf DESC, doc_id) AS rnk
      FROM fused QUALIFY rnk <= 10 ORDER BY rnk
    """),
    // fuses two already-timed retrieval shapes over top-k-bounded lists
    benchmark = false)

  /** S11 — ANN quality gate as DATA: recall@10 of the PQ ADC ranking
    * against the exact brute-force ranking (s1), per query. Approximation
    * quality is measured inside the engine, not assumed — the number a
    * production deployment alerts on when codebooks drift. Both rankings
    * replay in the oracle, so the recall itself is hash-checked. Measured
    * at m=16 (4-dim subspaces): 0.3-0.6 on this corpus, vs a flat 0.3 at
    * s5's m=8 — the synthetic embeddings have diffuse cosines (near-random
    * directions), the hard case for any 8-16-byte code; m is the recall
    * knob, and this query is the gate that watches it.
    */
  val s11PqRecall = QueryDef(
    "s11_pq_recall",
    (s, dir) => {
      val emb = Td(s, dir, "embeddings")
      val exact = Similarity.knnBrute(emb.filter(col("vec_id") < 5), emb,
          "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val books = Similarity.pqTrain(emb, "vec_id", "embedding", dim = 64, m = 16, k = 16,
        iters = 2, sampleMod = Some(4))
      val approx = Similarity.pqSearch(emb.filter(col("vec_id") < 5), emb,
          "vec_id", "embedding", books, k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).cast("long").as("n_hit"))
      // a query whose approx top-10 misses the exact set entirely must
      // report recall 0.0, not vanish — vanishing IS the alarm condition
      exact.select(col("query_id")).distinct()
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"), coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          (coalesce(col("n_hit"), lit(0L)).cast("double") / lit(10.0)).as("recall_at_10"))
        .orderBy(col("query_id"))
    },
    Some(s"""
      WITH $vecCte,
      exact AS (SELECT query_id, neighbor_id FROM (
               SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY q.vec_id ORDER BY
                   ${dotSql.format("q.v", "c.v")} / (q.nrm * c.nrm) DESC, c.vec_id) AS rnk
               FROM n q JOIN n c ON c.vec_id <> q.vec_id WHERE q.vec_id < 5)
              WHERE rnk <= 10),
      ${pqCte(m = 16, k = 16, iters = 2, dsub = 4, trainWhere = s" WHERE ${sampleFilterSql("vec_id", 4)}")},
      pe AS (SELECT s.vec_id, s.sub, c.cid,
               list_reduce(list_transform(c.cv, x -> x * x), (a, b) -> a + b) -
                 2 * ${dotSql.format("s.sv", "c.cv")} AS dist
             FROM pq_sv s JOIN pc2 c ON c.sub = s.sub),
      penc AS (SELECT vec_id, sub, cid FROM (
               SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rnk
               FROM pe) WHERE rnk = 1),
      plut AS (SELECT s.vec_id AS query_id, s.sub, c.cid,
                 ${dotSql.format("s.sv", "c.cv")} AS ip
               FROM pq_sv s JOIN pc2 c ON c.sub = s.sub WHERE s.vec_id < 5),
      psc0 AS (SELECT l.query_id, e.vec_id AS neighbor_id, e.sub, l.ip
               FROM penc e JOIN plut l ON l.sub = e.sub AND l.cid = e.cid
               WHERE e.vec_id <> l.query_id),
      approx AS (SELECT query_id, neighbor_id FROM (
               SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rnk
               FROM (SELECT query_id, neighbor_id,
                       list_reduce(list(ip ORDER BY sub), (a, b) -> a + b) AS adc
                     FROM psc0 GROUP BY 1, 2) g0
               ) WHERE rnk <= 10),
      hits AS (SELECT e.query_id, count(*) AS n_hit
               FROM exact e JOIN approx a
                 ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
               GROUP BY 1),
      qs AS (SELECT DISTINCT query_id FROM exact)
      SELECT qs.query_id, CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
             CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / 10.0 AS recall_at_10
      FROM qs LEFT JOIN hits h ON qs.query_id = h.query_id
      ORDER BY qs.query_id
    """),
    benchmark = false)

  /** S12 — MRR of the TRUE nearest neighbor under the PQ ranking: per
    * query, where the exact top-1 neighbor (the one answer that matters
    * for retrieval) lands in the approximate top-10 — reciprocal rank,
    * 0.0 on a miss. Recall@10 (s11) says "how much of the exact set
    * survives"; this says "does the headline answer surface, and how
    * high" — the second number an ANN deployment alerts on. Same
    * codebooks, same query set, both rankings replayed in the oracle, so
    * the metric itself is hash-checked.
    */
  val s12PqMrr = QueryDef(
    "s12_pq_mrr",
    (s, dir) => {
      val emb = Td(s, dir, "embeddings")
      val exact1 = Similarity.knnBrute(emb.filter(col("vec_id") < 5), emb,
          "vec_id", "embedding", k = 1)
        .select(col("query_id"), col("neighbor_id"))
      val books = Similarity.pqTrain(emb, "vec_id", "embedding", dim = 64, m = 16, k = 16,
        iters = 2, sampleMod = Some(4))
      val approx = Similarity.pqSearch(emb.filter(col("vec_id") < 5), emb,
          "vec_id", "embedding", books, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rnk"))
      exact1.join(approx, Seq("query_id", "neighbor_id"), "left")
        .select(col("query_id"), col("neighbor_id").as("true_nn"),
          coalesce(col("rnk").cast("long"), lit(0L)).as("nn_rank"),
          when(col("rnk").isNotNull, lit(1.0) / col("rnk")).otherwise(lit(0.0)).as("rr"))
        .orderBy(col("query_id"))
    },
    Some(s"""
      WITH $vecCte,
      exact1 AS (SELECT query_id, neighbor_id FROM (
               SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY q.vec_id ORDER BY
                   ${dotSql.format("q.v", "c.v")} / (q.nrm * c.nrm) DESC, c.vec_id) AS rnk
               FROM n q JOIN n c ON c.vec_id <> q.vec_id WHERE q.vec_id < 5)
              WHERE rnk = 1),
      ${pqCte(m = 16, k = 16, iters = 2, dsub = 4, trainWhere = s" WHERE ${sampleFilterSql("vec_id", 4)}")},
      pe AS (SELECT s.vec_id, s.sub, c.cid,
               list_reduce(list_transform(c.cv, x -> x * x), (a, b) -> a + b) -
                 2 * ${dotSql.format("s.sv", "c.cv")} AS dist
             FROM pq_sv s JOIN pc2 c ON c.sub = s.sub),
      penc AS (SELECT vec_id, sub, cid FROM (
               SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rnk
               FROM pe) WHERE rnk = 1),
      plut AS (SELECT s.vec_id AS query_id, s.sub, c.cid,
                 ${dotSql.format("s.sv", "c.cv")} AS ip
               FROM pq_sv s JOIN pc2 c ON c.sub = s.sub WHERE s.vec_id < 5),
      psc0 AS (SELECT l.query_id, e.vec_id AS neighbor_id, e.sub, l.ip
               FROM penc e JOIN plut l ON l.sub = e.sub AND l.cid = e.cid
               WHERE e.vec_id <> l.query_id),
      approxr AS (SELECT query_id, neighbor_id, rnk FROM (
               SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rnk
               FROM (SELECT query_id, neighbor_id,
                       list_reduce(list(ip ORDER BY sub), (a, b) -> a + b) AS adc
                     FROM psc0 GROUP BY 1, 2) g0
               ) WHERE rnk <= 10)
      SELECT e.query_id, e.neighbor_id AS true_nn,
             CAST(COALESCE(a.rnk, 0) AS BIGINT) AS nn_rank,
             CASE WHEN a.rnk IS NOT NULL THEN 1.0 / a.rnk ELSE 0.0 END AS rr
      FROM exact1 e LEFT JOIN approxr a
        ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
      ORDER BY e.query_id
    """),
    benchmark = false)

  /** D20 — cross-document duplicated spans ([[graft.ext.Paragraphs
    * .dupSpans]]): every doc's 30-token windows at stride 10, hashed and
    * document-frequency-counted; windows shared across docs flag verbatim
    * reuse. Docs with id%17==3 keep their own 5-word prefix (alignment
    * preserved, content varies) and then carry one shared 40-token block —
    * the aligned window inside it must flag in every such doc while the
    * prefix windows stay clean.
    */
  val d20SpanDedup = QueryDef(
    "d20_span_dedup",
    (s, dir) => {
      val id = col("doc_id")
      val SharedSpan =
        "license text follows this work is provided as is without warranty " +
          "of any kind either express or implied including but not limited " +
          "to the implied warranties of merchantability and fitness for a " +
          "particular purpose and noninfringement of rights"
      val ws = TA.wsTokens(col("text"))
      val planted = when(id % 17 === 3,
          concat(array_join(slice(ws, 1, 5), " "), lit(" " + SharedSpan)))
        .otherwise(col("text"))
      graft.ext.Paragraphs.dupSpans(
          Td(s, dir, "documents").select(id, planted.as("text")),
          "doc_id", "text", window = 30, stride = 10)
        .orderBy(col("doc_id"))
    },
    Some {
      val span =
        "license text follows this work is provided as is without warranty " +
          "of any kind either express or implied including but not limited " +
          "to the implied warranties of merchantability and fitness for a " +
          "particular purpose and noninfringement of rights"
      s"""
      WITH aug AS (SELECT doc_id, CASE WHEN doc_id % 17 = 3
          THEN array_to_string(regexp_split_to_array(trim(text), '\\s+')[1:5], ' ') || ' $span'
          ELSE text END AS t
        FROM documents),
      w AS (SELECT doc_id, regexp_split_to_array(trim(t), '\\s+') AS ws FROM aug),
      st AS (SELECT doc_id, ws,
               unnest(generate_series(0, greatest(len(ws) - 1, 0), 10)) AS s
             FROM w),
      wins AS (SELECT doc_id, md5(array_to_string(ws[s+1:s+30], ' ')) AS span_md5
               FROM st WHERE len(ws[s+1:s+30]) = 30),
      shared AS (SELECT span_md5, count(*) AS n_docs FROM (
                   SELECT DISTINCT doc_id, span_md5 FROM wins)
                 GROUP BY 1 HAVING count(*) >= 2)
      SELECT w2.doc_id,
             CAST(count(*) AS BIGINT) AS n_windows,
             CAST(sum(CASE WHEN sh.span_md5 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
             CAST(sum(CASE WHEN sh.span_md5 IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / greatest(count(*), 1) AS dup_span_frac
      FROM wins w2 LEFT JOIN shared sh ON w2.span_md5 = sh.span_md5
      GROUP BY 1 ORDER BY 1
    """
    },
    // d15 times the digest df-agg + tail-join shape; x19's explode is m2's
    benchmark = false)

  /** D22 — ALIGNMENT-FREE duplicated spans ([[graft.ext.Paragraphs
    * .dupSpansExact]]), the exact-confirm successor to d20's stride
    * approximation: content-defined 8-gram anchors (digest ≡ 0 mod 4)
    * nominate candidate documents, then every 30-token window at EVERY
    * offset is df-flagged within the candidates only. Docs with id%19==4
    * keep a (1 + id%10)-token prefix of their own text and then carry one
    * shared 38-token block — the prefix lengths differ, so most planted
    * pairs are OFF-stride (offsets differing mod 10) and the d20 stride
    * pass would never match them; here every planted doc must flag its 9
    * in-span windows against every other planted doc regardless of
    * alignment. The oracle replays both stages from the same constants.
    */
  val d22SpanExact = QueryDef(
    "d22_span_exact",
    (s, dir) => {
      val id = col("doc_id")
      val SharedSpan =
        "license text follows this work is provided as is without warranty " +
          "of any kind either express or implied including but not limited " +
          "to the implied warranties of merchantability and fitness for a " +
          "particular purpose and noninfringement of rights"
      val ws = TA.wsTokens(col("text"))
      val planted = when(id % 19 === 4,
          concat(array_join(slice(ws, lit(1), (id % 10 + 1).cast("int")), " "),
            lit(" " + SharedSpan)))
        .otherwise(col("text"))
      graft.ext.Paragraphs.dupSpansExact(
          Td(s, dir, "documents").select(id, planted.as("text")),
          "doc_id", "text", window = 30, anchor = 8, anchorMod = 4)
        .orderBy(col("doc_id"))
    },
    Some {
      val span =
        "license text follows this work is provided as is without warranty " +
          "of any kind either express or implied including but not limited " +
          "to the implied warranties of merchantability and fitness for a " +
          "particular purpose and noninfringement of rights"
      s"""
      WITH aug AS (SELECT doc_id, CASE WHEN doc_id % 19 = 4
          THEN array_to_string(regexp_split_to_array(trim(text), '\\s+')[1:(CAST(doc_id % 10 AS INT) + 1)], ' ') || ' $span'
          ELSE text END AS t
        FROM documents),
      w AS (SELECT doc_id, regexp_split_to_array(trim(t), '\\s+') AS ws FROM aug),
      ag AS (SELECT doc_id, md5(array_to_string(ws[s+1:s+8], ' ')) AS ah
             FROM (SELECT doc_id, ws, unnest(generate_series(0, len(ws) - 8)) AS s FROM w)),
      asel AS (SELECT DISTINCT doc_id, ah FROM ag
               WHERE ('0x' || substr(ah, 1, 4))::BIGINT % 4 = 0),
      ash AS (SELECT ah FROM asel GROUP BY ah HAVING count(*) >= 2),
      cand AS (SELECT DISTINCT doc_id FROM asel JOIN ash USING (ah)),
      wst AS (SELECT w.doc_id, ws, unnest(generate_series(0, len(ws) - 30)) AS s
              FROM w JOIN cand USING (doc_id)),
      wins AS (SELECT doc_id, md5(array_to_string(ws[s+1:s+30], ' ')) AS h FROM wst),
      shared AS (SELECT h, count(*) AS n_docs FROM (
                   SELECT DISTINCT doc_id, h FROM wins)
                 GROUP BY 1 HAVING count(*) >= 2)
      SELECT wins.doc_id,
             CAST(count(*) AS BIGINT) AS n_windows,
             CAST(sum(CASE WHEN sh.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
             CAST(sum(CASE WHEN sh.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / greatest(count(*), 1) AS dup_span_frac
      FROM wins LEFT JOIN shared sh ON wins.h = sh.h
      GROUP BY 1 ORDER BY 1
    """
    },
    // d20/d15 time the digest df-agg + tail-join shapes — compact-line
    // headroom
    benchmark = false)

  /** D23 — GUARANTEED duplicated spans ([[graft.ext.Paragraphs
    * .dupSpansGuaranteed]]): winnowed anchors (per-doc sliding MIN over
    * 23 consecutive 8-gram hashes) + the stride-1 confirm — by the
    * winnowing theorem every shared span of ≥ 30 tokens is found at ANY
    * alignment, deterministically. The plant is adversarially minimal:
    * docs with id%29==11 carry a (1 + id%13)-token prefix of their own
    * text and then a shared block of EXACTLY 30 tokens — the smallest
    * span the contract covers, at 13 different alignments — and every
    * planted doc must flag its single in-span window. The oracle replays
    * the winnow selection (same window min, same full-window bound) and
    * both stages.
    */
  val d23SpanGuaranteed = QueryDef(
    "d23_span_guaranteed",
    (s, dir) => {
      val id = col("doc_id")
      val Span30 =
        "license text follows this work is provided as is without warranty " +
          "of any kind either express or implied including but not limited " +
          "to the implied warranties of merchantability and fitness"
      val ws = TA.wsTokens(col("text"))
      val planted = when(id % 29 === 11,
          concat(array_join(slice(ws, lit(1), (id % 13 + 1).cast("int")), " "),
            lit(" " + Span30)))
        .otherwise(col("text"))
      graft.ext.Paragraphs.dupSpansGuaranteed(
          Td(s, dir, "documents").select(id, planted.as("text")),
          "doc_id", "text", window = 30, anchor = 8)
        .orderBy(col("doc_id"))
    },
    Some {
      val span =
        "license text follows this work is provided as is without warranty " +
          "of any kind either express or implied including but not limited " +
          "to the implied warranties of merchantability and fitness"
      s"""
      WITH aug AS (SELECT doc_id, CASE WHEN doc_id % 29 = 11
          THEN array_to_string(regexp_split_to_array(trim(text), '\\s+')[1:(CAST(doc_id % 13 AS INT) + 1)], ' ') || ' $span'
          ELSE text END AS t
        FROM documents),
      w AS (SELECT doc_id, regexp_split_to_array(trim(t), '\\s+') AS ws FROM aug),
      ag AS (SELECT doc_id, s + 1 AS i, md5(array_to_string(ws[s+1:s+8], ' ')) AS h
             FROM (SELECT doc_id, ws, unnest(generate_series(0, len(ws) - 8)) AS s FROM w)),
      wm AS (SELECT doc_id, i,
               min(h) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN CURRENT ROW AND 22 FOLLOWING) AS wmh,
               count(*) OVER (PARTITION BY doc_id) AS m
             FROM ag),
      asel AS (SELECT DISTINCT doc_id, wmh AS ah FROM wm
               WHERE i <= greatest(m - 22, 1)),
      ash AS (SELECT ah FROM asel GROUP BY ah HAVING count(*) >= 2),
      cand AS (SELECT DISTINCT doc_id FROM asel JOIN ash USING (ah)),
      wst AS (SELECT w.doc_id, ws, unnest(generate_series(0, len(ws) - 30)) AS s
              FROM w JOIN cand USING (doc_id)),
      wins AS (SELECT doc_id, md5(array_to_string(ws[s+1:s+30], ' ')) AS h FROM wst),
      shared AS (SELECT h, count(*) AS n_docs FROM (
                   SELECT DISTINCT doc_id, h FROM wins)
                 GROUP BY 1 HAVING count(*) >= 2)
      SELECT wins.doc_id,
             CAST(count(*) AS BIGINT) AS n_windows,
             CAST(sum(CASE WHEN sh.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
             CAST(sum(CASE WHEN sh.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / greatest(count(*), 1) AS dup_span_frac
      FROM wins LEFT JOIN shared sh ON wins.h = sh.h
      GROUP BY 1 ORDER BY 1
    """
    },
    // winnow adds one per-doc sliding-min window to d22's shapes (w1's
    // per-group window) — compact-line headroom
    benchmark = false)

  /** X23 — per-source corpus fingerprint: an ORDER-FREE content digest
    * (sum of the two 32-bit halves of each doc's md5, exact in BIGINT)
    * plus the doc count — the manifest line a pipeline writes per snapshot
    * so "did anything change in source S" is one row compare, no doc-level
    * diff (x16 is the doc-level drill-down when it did). Summation is
    * commutative, so the fingerprint is independent of partitioning,
    * ordering, and engine — unlike any first/collect_list digest.
    */
  val x23CorpusFingerprint = QueryDef(
    "x23_corpus_fingerprint",
    (s, dir) => {
      val h = md5(col("text"))
      Td(s, dir, "documents")
        .select(col("source"),
          conv(substring(h, 1, 8), 16, 10).cast("long").as("lo"),
          conv(substring(h, 9, 8), 16, 10).cast("long").as("hi"))
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("lo")).cast("long").as("fp_lo"),
          sum(col("hi")).cast("long").as("fp_hi"))
        .orderBy(col("source"))
    },
    Some("""
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(('0x' || substr(md5(text), 1, 8))::BIGINT) AS BIGINT) AS fp_lo,
             CAST(sum(('0x' || substr(md5(text), 9, 8))::BIGINT) AS BIGINT) AS fp_hi
      FROM documents GROUP BY source ORDER BY source
    """),
    // e1/q1 time the scan+agg shape
    benchmark = false)

  /** X21 — training-prep composition: quality gate → per-source sequence
    * packing (x10's prefix-sum) → deterministic shard assignment of the
    * PACKS (x18's md5 permutation keyed on (source, pack_id)) — the
    * gate→pack→shuffle chain that turns a curated corpus into training
    * shards. Every stage is an already-oracle-checked operator; this pins
    * the composition itself (offsets must survive the gate's row drops,
    * shards must key on packs, not docs).
    */
  val x21TrainingPrep = QueryDef(
    "x21_training_prep",
    (s, dir) => {
      val docs = Td(s, dir, "documents")
        .filter(TA.qualityScore(col("text")) >= 0.3)
        .select(col("doc_id"), col("source"),
          TA.bpeTokenCount(col("text")).cast("long").as("n_bpe"))
      val packed = graft.ext.Packing.assign(docs, "doc_id", "n_bpe", Seq("source"), budget = 2048L)
      val packKey = md5(concat_ws(":", lit("prep"), col("source"), col("pack_id").cast("string")))
      val packs = packed.select(col("source"), col("pack_id")).distinct()
        .withColumn("_k", packKey)
        .withColumn("shard",
          (conv(substring(col("_k"), 1, 4), 16, 10).cast("int") % 4))
        .drop("_k")
      packed.join(broadcast(packs), Seq("source", "pack_id"))
        .select(col("doc_id"), col("source"), col("n_bpe"),
          col("pack_id"), col("pack_offset"), col("shard"))
        .orderBy(col("doc_id"))
    },
    Some {
      def nib(i: Int) = s"(strpos('0123456789abcdef', substr(k, $i, 1)) - 1)"
      val shard =
        s"CAST(((((${nib(1)} * 16 + ${nib(2)}) * 16 + ${nib(3)}) * 16 + ${nib(4)}) % 4) AS INT)"
      s"""
      WITH d AS (
        SELECT doc_id, source,
               CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\s]')) AS BIGINT) AS n_bpe
        FROM documents
        WHERE 0.5 * least(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) / 64.0, 1.0)
            + 0.5 * least((CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                x -> list_contains(${sqlList(TA.Stopwords)}, x))) AS DOUBLE)
              / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE)) * 4.0, 1.0)
            - (CAST(len(regexp_extract_all(lower(text), '[^a-z0-9\\s]')) AS DOUBLE)
              / CAST(greatest(length(text), 1) AS DOUBLE)) * 2.0 >= 0.3),
      p AS (
        SELECT doc_id, source, n_bpe,
               COALESCE(SUM(n_bpe) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
        FROM d),
      pk AS (
        SELECT doc_id, source, n_bpe,
               CAST(pre // 2048 AS BIGINT) AS pack_id,
               CAST(pre % 2048 AS BIGINT) AS pack_offset
        FROM p),
      sh AS (
        SELECT source, pack_id,
               md5('prep:' || source || ':' || CAST(pack_id AS VARCHAR)) AS k
        FROM (SELECT DISTINCT source, pack_id FROM pk)),
      shd AS (SELECT source, pack_id, $shard AS shard FROM sh)
      SELECT pk.doc_id, pk.source, pk.n_bpe, pk.pack_id, pk.pack_offset, shd.shard
      FROM pk JOIN shd ON pk.source = shd.source AND pk.pack_id = shd.pack_id
      ORDER BY pk.doc_id
    """
    },
    // composes three already-benched/timed stages (t2 gate, x10 pack, x18
    // shard) — stays out of the bench set like c5/c6
    benchmark = false)

  /** T11 — Gopher-style composite document filter ([[TA.gopherKeep]]):
    * word-count bounds, mean word length, symbol ratio, bullet/ellipsis
    * line fractions, alphabetic-word fraction, required-stopword floor.
    * The corpus is newline-free word salad, so each format rule gets a
    * planted arm that FAILS it and (for the line rules) one that passes
    * with dirt present; word-count and stopword rules split the natural
    * corpus on their own (docs run 10-99 words around the 50-word floor).
    */
  val t11GopherRules = QueryDef(
    "t11_gopher_rules",
    (s, dir) => {
      val id = col("doc_id")
      val t0 = col("text")
      val planted = when(id % 8 === 0, concat(t0, lit("\n- b" * 10)))
        .when(id % 8 === 1, concat(t0, lit("\n- b\n- b\n* b")))
        .when(id % 8 === 2, concat(t0, lit("\nmore soon...\nto be continued…")))
        .when(id % 8 === 3,
          concat(t0, lit("\nends with dots...\nplain one\nplain two\nplain three")))
        .when(id % 8 === 4, concat(t0, lit(" # ## ### #### ...")))
        .when(id % 8 === 5, concat(t0, lit(" 12345" * 30)))
        .when(id % 8 === 6, concat(t0, lit(" q" * 60)))
        .otherwise(t0)
      val t = col("t")
      Td(s, dir, "documents")
        .select(id, planted.as("t"))
        .select(col("doc_id"),
          TA.tokenCount(t).cast("long").as("n_words"),
          TA.meanTokenLen(t).as("mean_word_len"),
          TA.symbolWordRatio(t).as("symbol_ratio"),
          TA.bulletLineFrac(t).as("bullet_frac"),
          TA.ellipsisLineFrac(t).as("ellipsis_frac"),
          TA.alphaWordFrac(t).as("alpha_frac"),
          TA.requiredStopCount(t).as("n_req_stop"),
          TA.gopherKeep(t).cast("int").as("keep"))
        .orderBy(col("doc_id"))
    },
    Some {
      val req = TA.RequiredStopwords
        .map(w => s"list_contains(lws, '$w')::INT").mkString(" + ")
      s"""
      WITH aug AS (SELECT doc_id, CASE doc_id % 8
        WHEN 0 THEN text || repeat(chr(10) || '- b', 10)
        WHEN 1 THEN text || chr(10) || '- b' || chr(10) || '- b' || chr(10) || '* b'
        WHEN 2 THEN text || chr(10) || 'more soon...' || chr(10) || 'to be continued…'
        WHEN 3 THEN text || chr(10) || 'ends with dots...' || chr(10) || 'plain one' ||
                    chr(10) || 'plain two' || chr(10) || 'plain three'
        WHEN 4 THEN text || ' # ## ### #### ...'
        WHEN 5 THEN text || repeat(' 12345', 30)
        WHEN 6 THEN text || repeat(' q', 60)
        ELSE text END AS t
        FROM documents),
      m AS (SELECT doc_id, t,
              regexp_split_to_array(trim(t), '\\s+') AS ws,
              regexp_split_to_array(trim(lower(t)), '\\s+') AS lws,
              string_split(t, chr(10)) AS ls
            FROM aug),
      r AS (SELECT doc_id,
              CAST(len(ws) AS BIGINT) AS n_words,
              CAST(length(regexp_replace(t, '\\s', '', 'g')) AS DOUBLE) / len(ws) AS mean_word_len,
              CAST(len(regexp_extract_all(t, '#|\\.\\.\\.|…')) AS DOUBLE)
                / greatest(len(ws), 1) AS symbol_ratio,
              CAST(len(list_filter(ls, l -> regexp_matches(l, '^\\s*[-*•]'))) AS DOUBLE)
                / greatest(len(ls), 1) AS bullet_frac,
              CAST(len(list_filter(ls, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$$'))) AS DOUBLE)
                / greatest(len(ls), 1) AS ellipsis_frac,
              CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
                / greatest(len(ws), 1) AS alpha_frac,
              CAST($req AS INT) AS n_req_stop
            FROM m)
      SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
             ellipsis_frac, alpha_frac, n_req_stop,
             CAST(n_words BETWEEN 50 AND 100000
               AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
               AND symbol_ratio < 0.1 AND bullet_frac < 0.9
               AND ellipsis_frac < 0.3 AND alpha_frac > 0.8
               AND n_req_stop >= 2 AS INT) AS keep
      FROM r ORDER BY doc_id
    """
    },
    // sub-0.2 s at sf0.1: the Spark task-scheduling floor, zero scale
    // signal - timed coverage lives in the correctness gate; dropping it
    // from the bench preserves the compact stdout line's precision budget
    benchmark = false)
  /** T12 — Gopher repetition battery (Rae et al. 2021 Table A1, the
    * within-document half t6's top-bigram ratio doesn't cover): duplicate
    * LINE fraction, duplicate line CHARACTER fraction, and duplicate
    * 5-gram character fraction, each with its published threshold folded
    * into a keep flag. The corpus is single-line low-repeat word salad, so
    * the plants supply both failure modes (dup lines, repeated phrases)
    * and a near-miss (a phrase occurring once). All ratios are exact
    * integer-count divisions — bit-identical cross-engine.
    */
  val t12GopherRepetition = QueryDef(
    "t12_gopher_repetition",
    (s, dir) => {
      val id = col("doc_id")
      val t0 = col("text")
      val planted = when(id % 4 === 0,
          concat(t0, lit("\nrepeat line\nrepeat line\nrepeat line")))
        .when(id % 4 === 1,
          concat(t0, lit(" alpha beta gamma delta epsilon alpha beta gamma delta epsilon")))
        .when(id % 4 === 2, concat(t0, lit(" zeta eta theta iota kappa")))
        .otherwise(t0)
      val aug = Td(s, dir, "documents").select(id, planted.as("t"))
      val lines = aug.select(id, explode(split(col("t"), "\n")).as("line"))
        .groupBy(id, col("line")).agg(count(lit(1)).as("cnt"))
        .groupBy(id).agg(
          sum(col("cnt")).cast("long").as("n_lines"),
          sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).cast("long").as("n_dup_lines"),
          sum(length(col("line")) * col("cnt")).cast("long").as("line_chars"),
          sum(when(col("cnt") > 1, length(col("line")) * col("cnt")).otherwise(0L))
            .cast("long").as("dup_line_chars"))
      val ws = TA.wsTokens(col("t"))
      val grams = aug
        .filter(size(ws) >= 5)
        .select(id, explode(transform(sequence(lit(1), size(ws) - 4),
          i => array_join(slice(ws, i, lit(5)), " "))).as("gram"))
        .groupBy(id, col("gram")).agg(count(lit(1)).as("cnt"))
        .groupBy(id).agg(
          sum(when(col("cnt") > 1, length(col("gram")) * col("cnt")).otherwise(0L))
            .cast("long").as("dup_gram_chars"))
      aug.select(id, length(col("t")).cast("long").as("n_chars_doc"))
        .join(lines, Seq("doc_id"))
        .join(grams, Seq("doc_id"), "left")
        .select(id, col("n_lines"),
          (col("n_dup_lines").cast("double") / col("n_lines")).as("dup_line_frac"),
          (col("dup_line_chars").cast("double") / col("line_chars")).as("dup_line_char_frac"),
          (coalesce(col("dup_gram_chars"), lit(0L)).cast("double") / col("n_chars_doc"))
            .as("dup_5gram_char_frac"))
        .withColumn("keep",
          ((col("dup_line_frac") <= 0.30) && (col("dup_line_char_frac") <= 0.20) &&
            (col("dup_5gram_char_frac") <= 0.15)).cast("int"))
        .orderBy(id)
    },
    Some("""
      WITH aug AS (SELECT doc_id, CASE doc_id % 4
        WHEN 0 THEN text || chr(10) || 'repeat line' || chr(10) || 'repeat line' || chr(10) || 'repeat line'
        WHEN 1 THEN text || ' alpha beta gamma delta epsilon alpha beta gamma delta epsilon'
        WHEN 2 THEN text || ' zeta eta theta iota kappa'
        ELSE text END AS t
        FROM documents),
      lc AS (SELECT doc_id, line, count(*) AS cnt FROM (
               SELECT doc_id, unnest(string_split(t, chr(10))) AS line FROM aug) GROUP BY 1, 2),
      la AS (SELECT doc_id,
               CAST(sum(cnt) AS BIGINT) AS n_lines,
               CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS n_dup_lines,
               CAST(sum(length(line) * cnt) AS BIGINT) AS line_chars,
               CAST(sum(CASE WHEN cnt > 1 THEN length(line) * cnt ELSE 0 END) AS BIGINT) AS dup_line_chars
             FROM lc GROUP BY 1),
      gc AS (SELECT doc_id, gram, count(*) AS cnt FROM (
               SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 4),
                 i -> array_to_string(ws[i:i+4], ' '))) AS gram
               FROM (SELECT doc_id, regexp_split_to_array(trim(t), '\s+') AS ws FROM aug)
               WHERE len(ws) >= 5) GROUP BY 1, 2),
      ga AS (SELECT doc_id,
               CAST(sum(CASE WHEN cnt > 1 THEN length(gram) * cnt ELSE 0 END) AS BIGINT) AS dup_gram_chars
             FROM gc GROUP BY 1),
      base AS (SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars_doc FROM aug)
      SELECT b.doc_id, la.n_lines,
             CAST(la.n_dup_lines AS DOUBLE) / la.n_lines AS dup_line_frac,
             CAST(la.dup_line_chars AS DOUBLE) / la.line_chars AS dup_line_char_frac,
             CAST(COALESCE(ga.dup_gram_chars, 0) AS DOUBLE) / b.n_chars_doc AS dup_5gram_char_frac,
             CAST(CAST(la.n_dup_lines AS DOUBLE) / la.n_lines <= 0.30
               AND CAST(la.dup_line_chars AS DOUBLE) / la.line_chars <= 0.20
               AND CAST(COALESCE(ga.dup_gram_chars, 0) AS DOUBLE) / b.n_chars_doc <= 0.15 AS INT) AS keep
      FROM base b JOIN la USING (doc_id) LEFT JOIN ga USING (doc_id)
      ORDER BY doc_id
    """),
    // t6 already times the word-gram explode + two-level agg shape —
    // keeping t12 out preserves compact-line headroom for s5/s6
    benchmark = false)

  /** T13 — HTML → text extraction ([[graft.ext.Html]]): the first
    * transform a crawled page sees. Each document is wrapped into a full
    * page (title, style/script blocks, comments, anchors, entities —
    * including the `&amp;lt;` double-decode trap) so every strip stage is
    * exercised; the oracle replays the identical regex chain.
    */
  val t13HtmlExtract = QueryDef(
    "t13_html_extract",
    (s, dir) => {
      val H = graft.ext.Html
      val id = col("doc_id")
      def st(c: org.apache.spark.sql.Column) = c.cast("string")
      val page = concat(
        lit("<html><head><title> Doc "), st(id), lit(" \n news</title>"),
        lit("<style type=\"text/css\">p { color: red; }</style>"),
        lit("<script>var x = 1 < 2 && true;</script></head>"),
        lit("<!-- comment\nspanning lines --><body><h1>Doc "), st(id), lit("</h1><p>"),
        col("text"),
        lit("</p><a href=\"/a/"), st(id), lit("\">first</a> &amp;lt; literal"),
        lit(" &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end"),
        when(id % 3 === 0, lit("<A HREF=\"/b\">second</A>")).otherwise(lit("")),
        lit("</body></html>"))
      Td(s, dir, "documents")
        .select(id, page.as("html"))
        .select(id,
          H.title(col("html")).as("page_title"),
          H.linkCount(col("html")).as("n_links"),
          H.stripHtml(col("html")).as("clean_text"))
        .orderBy(id)
    },
    Some {
      val H = graft.ext.Html
      s"""
      WITH aug AS (SELECT doc_id,
        '<html><head><title> Doc ' || CAST(doc_id AS VARCHAR) || ' ' || chr(10) ||
        ' news</title><style type="text/css">p { color: red; }</style>' ||
        '<script>var x = 1 < 2 && true;</script></head>' ||
        '<!-- comment' || chr(10) || 'spanning lines --><body><h1>Doc ' ||
        CAST(doc_id AS VARCHAR) || '</h1><p>' || text ||
        '</p><a href="/a/' || CAST(doc_id AS VARCHAR) || '">first</a> &amp;lt; literal' ||
        ' &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end' ||
        CASE WHEN doc_id % 3 = 0 THEN '<A HREF="/b">second</A>' ELSE '' END ||
        '</body></html>' AS html
        FROM documents)
      SELECT doc_id,
             ${H.titleSql("html")} AS page_title,
             ${H.linkCountSql("html")} AS n_links,
             ${H.stripHtmlSql("html")} AS clean_text
      FROM aug ORDER BY doc_id
    """
    },
    // t9 times the regex-chain map shape; compact-line headroom (see e2)
    benchmark = false)

  /** X18 — deterministic shard shuffle ([[Sampling.shardShuffle]]): the
    * "shuffle once, stream shards" epoch permutation, as a pure function
    * of (seed, doc_id) — replayable in any md5-capable engine, no RNG, no
    * global sort (one hash exchange + per-shard sorts).
    */
  val x18ShardShuffle = QueryDef(
    "x18_shard_shuffle",
    (s, dir) =>
      Sampling.shardShuffle(Td(s, dir, "documents"), "doc_id", nShards = 8, seed = "r11")
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy(col("shard"), col("pos")),
    Some {
      def nib(i: Int) = s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1)"
      val shard =
        s"CAST(((((${nib(1)} * 16 + ${nib(2)}) * 16 + ${nib(3)}) * 16 + ${nib(4)}) % 8) AS INT)"
      s"""
      WITH k AS (SELECT doc_id, md5('r11:' || CAST(doc_id AS VARCHAR)) AS h FROM documents),
      b AS (SELECT doc_id, h, $shard AS shard FROM k)
      SELECT doc_id, shard,
             CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
      FROM b ORDER BY shard, pos
    """
    },
    // w1 already times the hash-exchange + per-partition-window shape —
    // keeping x18 out preserves compact-line headroom for s5/s6
    benchmark = false)

  /** X19 — sliding token windows ([[graft.ext.Paragraphs.tokenWindows]]):
    * overlapping 32-token chunks at stride 24 — retrieval/embedding
    * chunking as one narrow posexplode pass, no shuffle.
    */
  val x19ChunkWindows = QueryDef(
    "x19_chunk_windows",
    (s, dir) =>
      graft.ext.Paragraphs.tokenWindows(
          Td(s, dir, "documents"), "doc_id", "text", window = 32, stride = 24)
        .orderBy(col("doc_id"), col("chunk_idx")),
    Some("""
      WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      st AS (SELECT doc_id, ws,
               unnest(generate_series(0, greatest(len(ws) - 1, 0), 24)) AS s
             FROM w)
      SELECT doc_id,
             CAST(s // 24 AS INT) AS chunk_idx,
             CAST(s AS INT) AS chunk_start,
             CAST(len(ws[s+1:s+32]) AS BIGINT) AS n_chunk_tokens,
             array_to_string(ws[s+1:s+32], ' ') AS chunk_text
      FROM st ORDER BY doc_id, chunk_idx
    """),
    // m2 already times the explode+slice map shape (and d16 sat out for
    // the same reason) — keeping x19 out preserves compact-line headroom
    benchmark = false)

  /** D21 — semantic dedup ([[Similarity.semDedup]], the SemDeDup pass):
    * trained k-means clusters, within-cluster cosine pairs, and a
    * per-vector keep/remove verdict — remove the member of a qualifying
    * pair that sits CLOSER to its centroid (diversity-preserving; ties to
    * the higher id). The oracle replays training (x2's proven CTE chain),
    * assignment (with the winning centroid-cosine carried), the loser rule
    * per pair, and the distinct+left-join recomposition — any drift in
    * priority arithmetic or tie-breaks flips verdicts.
    */
  val d21SemDedup = QueryDef(
    "d21_semdedup",
    (s, dir) => {
      val emb = Td(s, dir, "embeddings")
      val cents = Similarity.kmeansTrain(emb, "vec_id", "embedding", k = 8, iters = 2)
        .select(col("centroid_id").cast("long").as("vec_id"), col("embedding"))
      Similarity.semDedup(emb, cents, "vec_id", "embedding", 0.45)
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"), col("is_dup"))
        .orderBy(col("vec_id"))
    },
    Some(s"""
      WITH $vecCte,
      ${kmeansCte(8, 2)},
      ${trainedCentSql(2)},
      asg0 AS (SELECT n.vec_id, n.v, n.nrm, cent.centroid_id,
                 ${dotSql.format("n.v", "centv")} / (n.nrm * centn) AS ccos
               FROM n CROSS JOIN cent),
      asg AS (SELECT vec_id, v, nrm, ccos, centroid_id AS cluster FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, centroid_id) AS rnk
                FROM asg0) WHERE rnk = 1),
      lose AS (SELECT DISTINCT
                 CASE WHEN a.ccos < b.ccos OR (a.ccos = b.ccos AND a.vec_id < b.vec_id)
                      THEN b.vec_id ELSE a.vec_id END AS vec_id
               FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
               WHERE ${dotSql.format("a.v", "b.v")} / (a.nrm * b.nrm) >= 0.45)
      SELECT g.vec_id, CAST(g.cluster AS BIGINT) AS cluster,
             CAST(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END AS INT) AS is_dup
      FROM asg g LEFT JOIN lose l ON g.vec_id = l.vec_id ORDER BY g.vec_id
    """),
    // d6 times the identical cluster+pair exchange shape (this adds one
    // distinct + a broadcast-size left join) — compact-line headroom
    benchmark = false)

  /** T14 — hashed-feature linear quality classifier (the fastText-style
    * gate production filters run, with a deterministic weight table):
    * every token hashes to one of 64 buckets (md5 nibbles — the engine's
    * one hash family), the bucket indexes a weight derived arithmetically
    * from it (so the "model" is replayable in any md5-capable engine with
    * no side table), and the doc score is the mean token weight via a
    * strict left fold. All multiples of 1/64 — double-exact at any corpus
    * size; the label threshold can't sit on a rounding boundary.
    *
    * Scale shape: map-only (no shuffle, no UDF) — the fold runs inside
    * the scan projection, same as t2/t9.
    */
  val t14ClassifierScore = QueryDef(
    "t14_classifier_score",
    (s, dir) => {
      val toks = split(trim(col("text")), "\\s+")
      // w(t) = ((bucket(t) * 37 + 11) % 64) / 64 - 0.5, bucket = md5 % 64
      val weight = (t: org.apache.spark.sql.Column) =>
        ((conv(substring(md5(t), 1, 4), 16, 10).cast("int") % 64 * 37 + 11) % 64)
          .cast("double") / 64.0 - 0.5
      Td(s, dir, "documents")
        .select(col("doc_id"),
          (aggregate(transform(toks, weight), lit(0.0), (acc, x) => acc + x)
            / size(toks)).as("score"))
        .select(col("doc_id"), col("score"),
          (col("score") > 0.0).cast("int").as("label"))
        .orderBy(col("doc_id"))
    },
    Some {
      def nib(i: Int) = s"(strpos('0123456789abcdef', substr(md5(t), $i, 1)) - 1)"
      val bucket = s"((((${nib(1)} * 16 + ${nib(2)}) * 16 + ${nib(3)}) * 16 + ${nib(4)}) % 64)"
      val wT = s"(CAST((($bucket * 37 + 11) % 64) AS DOUBLE) / 64.0 - 0.5)"
      s"""
      WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents),
      sc AS (SELECT doc_id,
               list_reduce(list_transform(ws, t -> $wT), (a, b) -> a + b) / len(ws) AS score
             FROM w)
      SELECT doc_id, score, CAST(score > 0 AS INT) AS label FROM sc ORDER BY doc_id
    """
    },
    // t9/t2 time the map-only scan-projection shape — compact-line headroom
    benchmark = false)

  /** Shared (term, weight·64) table for T15 — weights are k/64, rendered as
    * exact 6-decimal strings on BOTH sides (1/64 = 0.015625: finite at scale
    * 6, so DECIMAL(18,6) carries them exactly and the decimal sums match
    * bit-for-bit). `zebra`/`quux` never occur in the corpus: weight rows for
    * absent terms must be inert.
    */
  private val T15Weights: Seq[(String, Int)] = Seq(
    "table" -> 12, "fast" -> 9, "slow" -> -7, "scan" -> 5, "value" -> -4,
    "key" -> 8, "agg" -> -6, "row" -> 3, "the" -> 2, "a" -> -1,
    "window" -> -9, "merge" -> 11, "zebra" -> 31, "quux" -> -17)
  private def t15w64(k: Int): String = f"${k / 64.0}%.6f"
  private val T15Bias = -0.03125 // -2/64, exact in double and DECIMAL(18,6)

  /** T15 — TRAINED-weight linear classifier
    * ([[graft.ext.TextAnalysis.linearScore]]): t14 proves the hashed-linear
    * scoring shape with synthesized weights; this is the production surface
    * — score with a REAL (term, weight) table, the broadcast join a
    * fastText/DCLM export rides. The planted table mixes corpus vocabulary,
    * both signs, and terms absent from the corpus; docs with id%13==7 are
    * replanted all-OOV and must score exactly `bias` with n_hits = 0. The
    * oracle replays the identical decimal-sum mean pool from the same
    * constants — any drift in OOV handling, multiplicity, or pooling
    * arithmetic flips scores or labels.
    */
  val t15ClassifierWeighted = QueryDef(
    "t15_classifier_weighted",
    (s, dir) => {
      import s.implicits._
      val id = col("doc_id")
      def st(c: org.apache.spark.sql.Column) = c.cast("string")
      val wdf = T15Weights.map { case (t, k) => (t, t15w64(k)) }.toDF("term", "weight")
      val planted = when(id % 13 === 7,
          concat(lit("qqq"), st(id), lit(" zzz"), st(id)))
        .otherwise(col("text"))
      TA.linearScore(
          Td(s, dir, "documents").select(id, planted.as("text")),
          "doc_id", "text", wdf, bias = T15Bias)
        .select(col("doc_id"), col("n_tokens"), col("n_hits"), col("score"),
          (col("score") > 0.0).cast("int").as("label"))
        .orderBy(col("doc_id"))
    },
    Some {
      val vals = T15Weights
        .map { case (t, k) => s"('$t', CAST('${t15w64(k)}' AS DECIMAL(18,6)))" }
        .mkString(", ")
      val score = "(-0.03125 + coalesce(CAST(sum(wt) AS DOUBLE), 0.0) / count(*))"
      s"""
      WITH aug AS (SELECT doc_id, CASE WHEN doc_id % 13 = 7
          THEN 'qqq' || CAST(doc_id AS VARCHAR) || ' zzz' || CAST(doc_id AS VARCHAR)
          ELSE text END AS t FROM documents),
      w(term, weight) AS (VALUES $vals),
      tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(t), '\\s+')) AS tk FROM aug),
      j AS (SELECT doc_id, w.weight AS wt FROM tok LEFT JOIN w ON tok.tk = w.term)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(count(wt) AS BIGINT) AS n_hits,
             $score AS score,
             CAST($score > 0 AS INT) AS label
      FROM j GROUP BY doc_id ORDER BY doc_id
    """
    },
    // t5's explode + broadcast-join + keyed agg times the shape —
    // compact-line headroom
    benchmark = false)

  /** Shared merge table for T16 — rank = list position. Chains exercise
    * multi-round merges (t+a → ta+b → tab+le), the overlapping-pair case
    * (a,a), and competing ranks inside one word.
    */
  private val T16Merges: Seq[(String, String)] = Seq(
    "t" -> "a", "l" -> "e", "ta" -> "b", "tab" -> "le", "a" -> "a",
    "s" -> "c", "a" -> "n", "sc" -> "an", "o" -> "r", "e" -> "y")

  /** T16 — greedy BPE encode against a caller-supplied merge table
    * ([[graft.ext.TextAnalysis.bpeEncode]], native expression): per word,
    * repeatedly merge ALL left-to-right non-overlapping occurrences of the
    * lowest-ranked adjacent pair until no table pair remains. Docs with
    * id%11==6 append " aaa baab tata" — the overlap (`aaa` → [aa, a]) and
    * multi-occurrence (`tata` → [ta, ta]) edges must replay. The oracle
    * unrolls one round per table entry (a pair can be a word's best at
    * most once: merges only create LONGER pieces, so consumed adjacencies
    * never re-form — 10 rounds is exact, later rounds are identity) with
    * the alternating-run rule for overlaps; any drift in rank choice,
    * merge order, or flattening flips the per-doc piece digest.
    */
  val t16BpeEncode = QueryDef(
    "t16_bpe_encode",
    (s, dir) => {
      val id = col("doc_id")
      val planted = when(id % 11 === 6, concat(col("text"), lit(" aaa baab tata")))
        .otherwise(col("text"))
      val pieces = TA.bpeEncode(col("_t16"), T16Merges)
      Td(s, dir, "documents").select(id, planted.as("_t16"))
        .select(id,
          size(pieces).cast("long").as("n_pieces"),
          md5(array_join(pieces, " ")).as("pieces_md5"))
        .orderBy(id)
    },
    Some {
      val mtVals = T16Merges.zipWithIndex
        .map { case ((a, b), i) => s"('$a','$b',$i)" }.mkString(", ")
      val rounds = (1 to T16Merges.length).map { n =>
        val prev = s"r${n - 1}"
        s"""u$n AS MATERIALIZED (SELECT doc_id, wi, unnest(p) AS piece,
                 unnest(generate_series(1, len(p))) AS i FROM $prev),
      p$n AS MATERIALIZED (SELECT x.doc_id, x.wi, x.i, mt.rk
             FROM u$n x JOIN u$n y ON y.doc_id = x.doc_id AND y.wi = x.wi AND y.i = x.i + 1
             JOIN mt ON mt.a = x.piece AND mt.b = y.piece),
      b$n AS (SELECT doc_id, wi, min(rk) AS best FROM p$n GROUP BY 1, 2),
      s$n AS MATERIALIZED (SELECT p.doc_id, p.wi, p.i,
               row_number() OVER (PARTITION BY p.doc_id, p.wi ORDER BY p.i) AS rn
             FROM p$n p JOIN b$n b ON b.doc_id = p.doc_id AND b.wi = p.wi AND p.rk = b.best),
      a$n AS MATERIALIZED (SELECT doc_id, wi, i FROM (
               SELECT doc_id, wi, i,
                 row_number() OVER (PARTITION BY doc_id, wi, i - rn ORDER BY i) AS pr
               FROM s$n) WHERE pr % 2 = 1),
      r$n AS MATERIALIZED (SELECT u.doc_id, u.wi,
               list(CASE WHEN a1.i IS NOT NULL THEN u.piece || nx.piece ELSE u.piece END
                    ORDER BY u.i) AS p
             FROM u$n u
             LEFT JOIN a$n a1 ON a1.doc_id = u.doc_id AND a1.wi = u.wi AND a1.i = u.i
             LEFT JOIN a$n a2 ON a2.doc_id = u.doc_id AND a2.wi = u.wi AND a2.i = u.i - 1
             LEFT JOIN u$n nx ON nx.doc_id = u.doc_id AND nx.wi = u.wi AND nx.i = u.i + 1
             WHERE a2.i IS NULL
             GROUP BY u.doc_id, u.wi)"""
      }.mkString(",\n      ")
      val last = s"r${T16Merges.length}"
      s"""
      WITH aug AS (SELECT doc_id, CASE WHEN doc_id % 11 = 6
          THEN text || ' aaa baab tata' ELSE text END AS t FROM documents),
      mt(a, b, rk) AS (VALUES $mtVals),
      w AS (SELECT doc_id, regexp_split_to_array(trim(t), '\\s+') AS ws FROM aug),
      wd AS MATERIALIZED (SELECT doc_id, unnest(generate_series(1, len(ws))) AS wi,
               unnest(ws) AS word FROM w),
      r0 AS MATERIALIZED (SELECT doc_id, wi,
               list_transform(generate_series(1, length(word)), i -> word[i:i]) AS p
             FROM wd),
      $rounds,
      fin AS MATERIALIZED (SELECT doc_id, wi, unnest(p) AS piece,
                unnest(generate_series(1, len(p))) AS i FROM $last),
      agg AS (SELECT doc_id, count(*) AS n_pieces,
                md5(string_agg(piece, ' ' ORDER BY wi, i)) AS pieces_md5
              FROM fin GROUP BY 1)
      SELECT d.doc_id, CAST(coalesce(a.n_pieces, 0) AS BIGINT) AS n_pieces,
             coalesce(a.pieces_md5, md5('')) AS pieces_md5
      FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id
    """
    },
    // native one-pass encode rides the scan (t9's shape) — the oracle's
    // round unrolling is DuckDB-side only; compact-line headroom
    benchmark = false)

  // byte-level merge table over GPT-2-mapped chars (Ġ = mapped 0x20,
  // Ã/© = the mapped UTF-8 bytes of é) — the entry shapes an exported
  // merges.txt carries; ranks deliberately interleave so greedy order
  // (lowest rank first) is load-bearing
  private val T20Merges: Seq[(String, String)] = Seq(
    ("Ġ", "t"), ("h", "e"), ("Ġt", "he"), ("Ã", "©"),
    ("a", "f"), ("c", "af"), ("caf", "Ã©"), ("t", "h"), ("Ġ", "a"))
  private val T20Specials = Seq("<|endoftext|>")

  /** T20 — BYTE-LEVEL BPE with special tokens
    * ([[org.apache.spark.sql.graft.ByteBpeEncodeTokens]] over
    * [[TA.gpt2Pretokens]]): corpus text sanitized to printable ASCII plus
    * plants that force every byte-level surface — a multi-byte UTF-8 char
    * whose two mapped bytes must fuse (café/thé), the Ġ-carrying
    * space-attached tokens an exported merge file keys on (" the" →
    * "Ġthe"), a special token that must stay atomic mid-text with its
    * pre-tokenizer space contributing its own Ġ piece, and greedy
    * rank-order interleaving. The oracle derives the byte→unicode table
    * INDEPENDENTLY from the public algorithm (self-mapped ranges, 256+n
    * for the rest), expands each word's chars to UTF-8 bytes in SQL, and
    * replays the t16 merge-round chain over the mapped alphabet — so a
    * drift in the byte mapping, the special bypass, or the space
    * attachment flips per-doc digests.
    */
  val t20ByteBpe = QueryDef(
    "t20_byte_bpe",
    (s, dir) => {
      val sanitized = regexp_replace(col("text"), "[^ -~]", "")
      val planted = concat(sanitized,
        lit(" café the <|endoftext|> thé attic"))
      val pieces = TA.byteBpeEncode(col("_t20"), T20Merges, T20Specials)
      Td(s, dir, "documents").select(col("doc_id"), planted.as("_t20"))
        .select(col("doc_id"),
          size(pieces).cast("long").as("n_pieces"),
          md5(array_join(pieces, " ")).as("pieces_md5"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $byteBpeFinCte,
      agg AS (SELECT doc_id, count(*) AS n_pieces,
                md5(string_agg(piece, ' ' ORDER BY wi, i)) AS pieces_md5
              FROM fin GROUP BY 1)
      SELECT d.doc_id, CAST(coalesce(a.n_pieces, 0) AS BIGINT) AS n_pieces,
             coalesce(a.pieces_md5, md5('')) AS pieces_md5
      FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id
    """),
    // same native-scan shape as t16; oracle round unrolling is DuckDB-only
    benchmark = false)

  /** Shared t20/t22 oracle core: the sanitized+planted corpus's byte-level
    * encode replay, through CTE `fin` (doc_id, wi, i, piece), with `mt`
    * and `bt` available downstream.
    */
  /** The shared greedy-merge round unrolling (t16's machinery): rounds
    * 1..nRounds over `r0(doc_id, wi, p)` against `mt(a, b, rk)`, ending at
    * CTE `r$$nRounds`. MATERIALIZED per the multi-reference CTE rule (see
    * graft-build-protocols): DuckDB inlines non-trivial CTEs and each round
    * references the previous 4-6×, so an unmaterialized chain re-evaluates
    * exponentially.
    */
  private def bpeRoundsSql(nRounds: Int): String =
    (1 to nRounds).map { n =>
      val prev = s"r${n - 1}"
      s"""u$n AS MATERIALIZED (SELECT doc_id, wi, unnest(p) AS piece,
                 unnest(generate_series(1, len(p))) AS i FROM $prev),
      p$n AS MATERIALIZED (SELECT x.doc_id, x.wi, x.i, mt.rk
             FROM u$n x JOIN u$n y ON y.doc_id = x.doc_id AND y.wi = x.wi AND y.i = x.i + 1
             JOIN mt ON mt.a = x.piece AND mt.b = y.piece),
      b$n AS (SELECT doc_id, wi, min(rk) AS best FROM p$n GROUP BY 1, 2),
      s$n AS MATERIALIZED (SELECT p.doc_id, p.wi, p.i,
               row_number() OVER (PARTITION BY p.doc_id, p.wi ORDER BY p.i) AS rn
             FROM p$n p JOIN b$n b ON b.doc_id = p.doc_id AND b.wi = p.wi AND p.rk = b.best),
      a$n AS MATERIALIZED (SELECT doc_id, wi, i FROM (
               SELECT doc_id, wi, i,
                 row_number() OVER (PARTITION BY doc_id, wi, i - rn ORDER BY i) AS pr
               FROM s$n) WHERE pr % 2 = 1),
      r$n AS MATERIALIZED (SELECT u.doc_id, u.wi,
               list(CASE WHEN a1.i IS NOT NULL THEN u.piece || nx.piece ELSE u.piece END
                    ORDER BY u.i) AS p
             FROM u$n u
             LEFT JOIN a$n a1 ON a1.doc_id = u.doc_id AND a1.wi = u.wi AND a1.i = u.i
             LEFT JOIN a$n a2 ON a2.doc_id = u.doc_id AND a2.wi = u.wi AND a2.i = u.i - 1
             LEFT JOIN u$n nx ON nx.doc_id = u.doc_id AND nx.wi = u.wi AND nx.i = u.i + 1
             WHERE a2.i IS NULL
             GROUP BY u.doc_id, u.wi)"""
    }.mkString(",\n      ")

  /** The independently-derived GPT-2 byte→unicode table as CTE `bt(b2u)`
    * (self ranges keep their code point, the rest get 256+n in byte
    * order) plus the UTF-8 byte expansion of `ch(doc_id, wi, ci, c)` into
    * `r0(doc_id, wi, p)` — shared by every byte-level replay. Chars must
    * stay under U+0800 (the 1- and 2-byte branches cover the domain).
    */
  private lazy val byteExpandSql: String = {
    val selfRange = "((x BETWEEN 33 AND 126) OR (x BETWEEN 161 AND 172) " +
      "OR (x BETWEEN 174 AND 255))"
    s"""bt AS (SELECT list_transform(generate_series(0, 255), x ->
               CASE WHEN $selfRange THEN chr(CAST(x AS INTEGER))
                 ELSE chr(CAST(256 + len(list_filter(generate_series(0, x - 1),
                   y -> NOT ${selfRange.replace("x", "y")})) AS INTEGER))
               END) AS b2u),
      by0 AS (SELECT doc_id, wi, ci,
               unnest(CASE WHEN unicode(c) < 128 THEN [unicode(c)]
                 ELSE [192 + unicode(c) // 64, 128 + unicode(c) % 64] END) AS b,
               unnest(CASE WHEN unicode(c) < 128 THEN [1] ELSE [1, 2] END) AS bi
             FROM ch),
      r0 AS MATERIALIZED (SELECT doc_id, wi,
               list(bt.b2u[b + 1] ORDER BY ci, bi) AS p
             FROM by0 CROSS JOIN bt GROUP BY 1, 2)"""
  }

  private lazy val byteBpeFinCte: String = {
    val mtVals = T20Merges.zipWithIndex
      .map { case ((a, b), i) => s"('$a','$b',$i)" }.mkString(", ")
    val nRounds = T20Merges.length + 1 // one identity round of slack
    val rounds = bpeRoundsSql(nRounds)
    s"""aug AS (SELECT doc_id,
          regexp_replace(text, '[^ -~]', '', 'g') ||
            ' café the <|endoftext|> thé attic' AS t
        FROM documents),
      mt(a, b, rk) AS (VALUES $mtVals),
      w AS (SELECT doc_id, regexp_split_to_array(trim(t), '\\s+') AS ws FROM aug),
      wd0 AS MATERIALIZED (SELECT doc_id, unnest(generate_series(1, len(ws))) AS wi,
               unnest(ws) AS word0 FROM w),
      wd AS (SELECT doc_id, wi,
               CASE WHEN wi = 1 THEN word0 ELSE ' ' || word0 END AS word
             FROM wd0),
      sp AS (SELECT doc_id, wi, word,
               (word = '<|endoftext|>') AS sp_bare,
               (word = ' <|endoftext|>') AS sp_sp
             FROM wd),
      ch AS MATERIALIZED (SELECT doc_id, wi,
               unnest(generate_series(1, length(word))) AS ci,
               unnest(str_split(word, '')) AS c
             FROM sp WHERE NOT sp_bare AND NOT sp_sp),
      $byteExpandSql,
      $rounds,
      finenc AS MATERIALIZED (SELECT doc_id, wi, unnest(p) AS piece,
                unnest(generate_series(1, len(p))) AS i FROM r$nRounds),
      finsp AS (SELECT doc_id, wi, chr(288) AS piece, 1 AS i FROM sp WHERE sp_sp
                UNION ALL
                SELECT doc_id, wi, '<|endoftext|>' AS piece, 2 AS i FROM sp WHERE sp_sp
                UNION ALL
                SELECT doc_id, wi, '<|endoftext|>' AS piece, 1 AS i FROM sp WHERE sp_bare),
      fin AS (SELECT * FROM finenc UNION ALL SELECT * FROM finsp)"""
  }

  /** T22 — token-ID emission ([[org.apache.spark.sql.graft
    * .ByteBpeEncodeIds]]): t20's exact encode with every piece mapped to
    * its deterministic vocab id (bytes 0..255 in byte order, merge
    * products at 256+rank, specials last) in the same native pass — the
    * artifact packing and training actually consume. The oracle builds
    * the vocab INDEPENDENTLY (byte symbols from the SQL-derived table,
    * products from the merge VALUES, the special appended) and joins the
    * t20 piece replay against it, so an id-assignment drift or a piece/id
    * mismatch flips per-doc digests.
    */
  val t22ByteBpeIds = QueryDef(
    "t22_byte_bpe_ids",
    (s, dir) => {
      val sanitized = regexp_replace(col("text"), "[^ -~]", "")
      val planted = concat(sanitized,
        lit(" café the <|endoftext|> thé attic"))
      val ids = TA.byteBpeEncodeIds(col("_t22"), T20Merges, T20Specials)
      Td(s, dir, "documents").select(col("doc_id"), planted.as("_t22"))
        .select(col("doc_id"),
          size(ids).cast("long").as("n_ids"),
          md5(array_join(transform(ids, _.cast("string")), ",")).as("ids_md5"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $byteBpeFinCte,
      vocab AS (
        SELECT bt.b2u[b + 1] AS piece, b AS id
        FROM (SELECT unnest(generate_series(0, 255)) AS b) bs CROSS JOIN bt
        UNION ALL SELECT a || b AS piece, 256 + rk AS id FROM mt
        UNION ALL SELECT '<|endoftext|>' AS piece, ${256 + T20Merges.length} AS id),
      idr AS (SELECT f.doc_id, f.wi, f.i, v.id
              FROM fin f JOIN vocab v ON v.piece = f.piece),
      agg AS (SELECT doc_id, count(*) AS n_ids,
                md5(string_agg(CAST(id AS VARCHAR), ',' ORDER BY wi, i)) AS ids_md5
              FROM idr GROUP BY 1)
      SELECT d.doc_id, CAST(coalesce(a.n_ids, 0) AS BIGINT) AS n_ids,
             coalesce(a.ids_md5, md5('')) AS ids_md5
      FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id
    """),
    // identical native-scan shape as t20 with one extra hash probe/piece
    benchmark = false)

  /** T21 — byte-level BPE TRAINING
    * ([[graft.ext.TextAnalysis.bpeTrainBytes]]): t18's three-round
    * training loop on the GPT-2 byte alphabet over space-attached
    * pre-tokens, with a planted every-document special token that the
    * trainer must EXCLUDE — `' <|endoftext|>'` appears once per doc, so
    * if special filtering broke, (Ġ, <|endoftext|>) would be the top pair
    * and rank 0 would flip. The oracle rebuilds the byte→unicode table
    * from the algorithm, byte-expands the pre-tokens (with the attached
    * space, minus specials), and replays all three training rounds with
    * the shared round/argmax machinery — the learned table is what
    * [[graft.ext.TextAnalysis.byteBpeEncode]] consumes and
    * `parseMerges`/merges.txt exports verbatim.
    */
  val t21ByteBpeTrain = QueryDef(
    "t21_byte_bpe_train",
    (s, dir) => {
      import s.implicits._
      val docs = Td(s, dir, "documents").select(
        concat(regexp_replace(col("text"), "[^ -~]", ""),
          lit(" <|endoftext|>")).as("text"))
      val learned = TA.bpeTrainBytes(docs, "text", nMerges = 3,
        specials = Seq("<|endoftext|>"))
      learned.zipWithIndex
        .map { case ((a, b, c), i) => (i, a, b, c) }
        .toDF("rank", "a", "b", "n_occ")
        .select(col("rank").cast("int").as("rank"), col("a"), col("b"),
          col("n_occ").cast("long").as("n_occ"))
        .orderBy(col("rank"))
    },
    Some {
      import BpeOracle.{pick, round}
      val selfRange = "((x BETWEEN 33 AND 126) OR (x BETWEEN 161 AND 172) " +
        "OR (x BETWEEN 174 AND 255))"
      val enc2 = (1 to 3).map(n => round(2, n, "mt1")).mkString(",\n      ")
      val enc3 = (1 to 4).map(n => round(3, n, "mt2")).mkString(",\n      ")
      s"""
      WITH aug AS (SELECT doc_id,
          regexp_replace(text, '[^ -~]', '', 'g') || ' <|endoftext|>' AS t
        FROM documents),
      bt AS (SELECT list_transform(generate_series(0, 255), x ->
               CASE WHEN $selfRange THEN chr(CAST(x AS INTEGER))
                 ELSE chr(CAST(256 + len(list_filter(generate_series(0, x - 1),
                   y -> NOT ${selfRange.replace("x", "y")})) AS INTEGER))
               END) AS b2u),
      wd AS MATERIALIZED (SELECT doc_id, wi, word FROM (
             SELECT doc_id, wi, CASE WHEN wi = 1 THEN word0 ELSE ' ' || word0 END AS word
             FROM (SELECT doc_id, unnest(generate_series(1, len(ws))) AS wi,
                     unnest(ws) AS word0
                   FROM (SELECT doc_id, regexp_split_to_array(trim(t), '\\s+') AS ws
                         FROM aug)))
           WHERE length(word) > 0
             AND regexp_replace(word, '^ ', '') <> '<|endoftext|>'),
      ch AS MATERIALIZED (SELECT doc_id, wi,
             unnest(generate_series(1, length(word))) AS ci,
             unnest(str_split(word, '')) AS c FROM wd),
      by0 AS (SELECT doc_id, wi, ci,
               unnest(CASE WHEN unicode(c) < 128 THEN [unicode(c)]
                 ELSE [192 + unicode(c) // 64, 128 + unicode(c) % 64] END) AS b,
               unnest(CASE WHEN unicode(c) < 128 THEN [1] ELSE [1, 2] END) AS bi
             FROM ch),
      p0 AS MATERIALIZED (SELECT doc_id, wi,
             list(bt.b2u[b + 1] ORDER BY ci, bi) AS p
           FROM by0 CROSS JOIN bt GROUP BY 1, 2),
      ${pick(1, "p0")},
      mt1 AS (SELECT split_part(pr, ' ', 1) AS a, split_part(pr, ' ', 2) AS b, 0 AS rk FROM cb1),
      $enc2,
      ${pick(2, "r2_3")},
      mt2 AS (SELECT a, b, rk FROM mt1 UNION ALL
              SELECT split_part(pr, ' ', 1), split_part(pr, ' ', 2), 1 FROM cb2),
      $enc3,
      ${pick(3, "r3_4")}
      SELECT * FROM (
        SELECT CAST(0 AS INT) AS rank, split_part(pr, ' ', 1) AS a,
               split_part(pr, ' ', 2) AS b, CAST(c AS BIGINT) AS n_occ FROM cb1
        UNION ALL
        SELECT CAST(1 AS INT), split_part(pr, ' ', 1), split_part(pr, ' ', 2),
               CAST(c AS BIGINT) FROM cb2
        UNION ALL
        SELECT CAST(2 AS INT), split_part(pr, ' ', 1), split_part(pr, ' ', 2),
               CAST(c AS BIGINT) FROM cb3)
      ORDER BY rank
    """
    },
    // same K scan+agg rounds as t18 (benched there); byte expansion is
    // oracle-side only
    benchmark = false)

  /** X36 — materialized training sequences
    * ([[graft.ext.Packing.packSequences]] over
    * [[TA.byteBpeEncodeIds]]): the END of the tokenize→pack chain — per
    * source shard, every document's token-id stream (t22's ids, separator
    * special included) concatenates in doc order and cuts into exact
    * 512-id rows, documents flowing across row boundaries. The oracle
    * replays t22's per-token id derivation, the shard prefix sum over doc
    * token counts, the global-position div/mod, and the ordered
    * reassembly — an off-by-one anywhere in the chain shifts every later
    * sequence digest in the shard.
    */
  val x36PackSequences = QueryDef(
    "x36_pack_sequences",
    (s, dir) => {
      val sanitized = regexp_replace(col("text"), "[^ -~]", "")
      val planted = concat(sanitized,
        lit(" café the <|endoftext|> thé attic"))
      val docs = Td(s, dir, "documents")
        .select(col("doc_id"), col("source"), planted.as("_t"))
        .select(col("doc_id"), col("source"),
          TA.byteBpeEncodeIds(col("_t"), T20Merges, T20Specials).as("ids"))
      graft.ext.Packing.packSequences(docs, "doc_id", "ids", Seq("source"), 512L)
        .select(col("source"), col("seq_id"), col("n_ids"),
          md5(array_join(transform(col("ids"), _.cast("string")), ",")).as("ids_md5"))
        .orderBy(col("source"), col("seq_id"))
    },
    Some(s"""
      WITH $byteBpeFinCte,
      vocab AS (
        SELECT bt.b2u[b + 1] AS piece, b AS id
        FROM (SELECT unnest(generate_series(0, 255)) AS b) bs CROSS JOIN bt
        UNION ALL SELECT a || b AS piece, 256 + rk AS id FROM mt
        UNION ALL SELECT '<|endoftext|>' AS piece, ${256 + T20Merges.length} AS id),
      tok AS MATERIALIZED (SELECT f.doc_id, v.id,
               row_number() OVER (PARTITION BY f.doc_id ORDER BY f.wi, f.i) - 1 AS ti
             FROM fin f JOIN vocab v ON v.piece = f.piece),
      cnt AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
      pre AS (SELECT d.doc_id, d.source,
                coalesce(sum(c.n) OVER (PARTITION BY d.source ORDER BY d.doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
              FROM documents d JOIN cnt c ON c.doc_id = d.doc_id),
      g AS (SELECT p.source, t.id, p.pre + t.ti AS gpos
            FROM tok t JOIN pre p ON p.doc_id = t.doc_id)
      SELECT source, CAST(gpos // 512 AS BIGINT) AS seq_id,
             CAST(count(*) AS BIGINT) AS n_ids,
             md5(string_agg(CAST(id AS VARCHAR), ',' ORDER BY gpos)) AS ids_md5
      FROM g GROUP BY 1, 2 ORDER BY 1, 2
    """),
    // window prefix + token explode + (shard, seq) agg — x10/x19 time the
    // shapes; the t22 id chain is oracle-side only
    benchmark = false)

  /** X37 — predicate DML over a partitioned managed table
    * ([[graft.tables.Deletes.deleteWhere]]/`updateWhere`): stage a
    * source-partitioned token-stats table, DELETE the short docs, UPDATE
    * the long ones to a cap, read back the final state. The oracle
    * derives the end state directly from the two predicates (NULL
    * semantics included by construction of the count column), so a
    * row leaked by the delete, an assignment applied where the condition
    * was not TRUE, or a partition dropped wrongly all flip rows.
    */
  val x37Dml = QueryDef(
    "x37_dml",
    (s, dir) => {
      import graft.tables.Deletes
      val store = graft.tables.Scratch.store(s)
      store.overwrite("x37_t",
        Td(s, dir, "documents").select(col("doc_id"), col("source"),
          TA.tokenCount(col("text")).cast("long").as("n_tok")),
        partitionBy = Seq("source"))
      Deletes.deleteWhere(store, "x37_t", col("n_tok") < 20, Some("source"))
      Deletes.updateWhere(store, "x37_t", col("n_tok") > 150,
        Map("n_tok" -> lit(150L)), Some("source"))
      store.read("x37_t").select(col("doc_id"), col("source"), col("n_tok"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH d AS (SELECT doc_id, source,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
             FROM documents)
      SELECT doc_id, source, least(n_tok, 150) AS n_tok
      FROM d WHERE NOT (n_tok < 20) ORDER BY doc_id
    """),
    // two partition-scoped rewrites of a staged table — s8/s4 time the
    // shapes on the live star pipeline
    benchmark = false)

  /** X38 — tokenizer fertility report: per source, the bytes-per-token
    * ratio of the byte-level tokenizer over the sanitized corpus — THE
    * number a tokenizer change is judged by (a merge table that lowers
    * fertility buys context window for free), published per source
    * because fertility is domain-dependent (code vs prose vs tables).
    * Exact integer sums (UTF-8 byte counts and id counts) + one
    * engine-identical double division; the oracle recomputes byte counts
    * from the chars and replays the t22 id chain.
    */
  val x38TokenizerFertility = QueryDef(
    "x38_tokenizer_fertility",
    (s, dir) => {
      val sanitized = regexp_replace(col("text"), "[^ -~]", "")
      val planted = concat(sanitized,
        lit(" café the <|endoftext|> thé attic"))
      val ids = TA.byteBpeEncodeIds(col("_t"), T20Merges, T20Specials)
      Td(s, dir, "documents")
        .select(col("doc_id"), col("source"), planted.as("_t"))
        .select(col("source"),
          octet_length(trim(col("_t"))).cast("long").as("_nb"),
          size(ids).cast("long").as("_ni"))
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("_nb")).cast("long").as("n_bytes"),
          sum(col("_ni")).cast("long").as("n_ids"),
          (sum(col("_nb")).cast("double") / sum(col("_ni")).cast("double"))
            .as("bytes_per_token"))
        .orderBy(col("source"))
    },
    Some(s"""
      WITH $byteBpeFinCte,
      vocab AS (
        SELECT bt.b2u[b + 1] AS piece, b AS id
        FROM (SELECT unnest(generate_series(0, 255)) AS b) bs CROSS JOIN bt
        UNION ALL SELECT a || b AS piece, 256 + rk AS id FROM mt
        UNION ALL SELECT '<|endoftext|>' AS piece, ${256 + T20Merges.length} AS id),
      nid AS (SELECT f.doc_id, count(*) AS ni
              FROM fin f JOIN vocab v ON v.piece = f.piece GROUP BY 1),
      nb AS (SELECT doc_id, strlen(trim(t)) AS nb FROM aug)
      SELECT d.source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nb.nb) AS BIGINT) AS n_bytes,
             CAST(sum(nid.ni) AS BIGINT) AS n_ids,
             CAST(sum(nb.nb) AS DOUBLE) / CAST(sum(nid.ni) AS DOUBLE) AS bytes_per_token
      FROM documents d JOIN nb ON nb.doc_id = d.doc_id
      JOIN nid ON nid.doc_id = d.doc_id
      GROUP BY 1 ORDER BY 1
    """),
    // one scan + per-source agg over the t1/x20 shape
    benchmark = false)

  /** T23 — the REAL GPT-2 pre-tokenizer end-to-end
    * ([[org.apache.spark.sql.graft.Gpt2SplitText]] →
    * [[org.apache.spark.sql.graft.ByteBpeEncodeIds]] via
    * [[TA.byteBpeIdsGpt2]]): RAW text in, production token ids out — the
    * seam t20/t22 left open (they consume whitespace pre-tokens; the
    * published pattern differs on every contraction, punct boundary,
    * digit/letter seam, multi-space run, and un-spaced special). The
    * plant forces each divergent alternative: `don't` (contraction),
    * `stop<|endoftext|>the` (special cut with NO whitespace — the regex
    * must not match across it), `café` (multi-byte letter), a double
    * space (run-minus-last-char backtrack), `12,50!!!` (number/punct
    * seams), `DON'T` (the lowercase-only contraction quirk), ` 'twas`
    * (apostrophe reached via ` ?punct+`, not the contraction branch),
    * `x3` (letter→digit boundary), and a trailing space (`\\s+(?!\\S)` at
    * segment end).
    *
    * The oracle re-implements findall INDEPENDENTLY as a DuckDB
    * RECURSIVE scan — one token consumed per step, the six alternatives
    * tried in pattern order as anchored RE2 extracts, the `(?!\\S)`
    * backtrack as the run-minus-last-char CASE, specials segmented
    * before the regex (leftmost literal scan) — then replays the byte
    * mapping, merge rounds, and vocab ids with the t20/t22 machinery.
    * Corpus text truncates to 120 chars so recursion depth stays
    * ~O(100); the plant rides after the cut.
    */
  val t23Gpt2Tokenizer = QueryDef(
    "t23_gpt2_tokenizer",
    (s, dir) => {
      val sanitized = regexp_replace(col("text"), "[^ -~]", "")
      val planted = concat(substring(sanitized, 1, 120),
        lit(" don't stop<|endoftext|>the café  costs 12,50!!! DON'T 'twas x3<|endoftext|> "))
      val ids = TA.byteBpeIdsGpt2(col("_t23"), T20Merges, T20Specials)
      Td(s, dir, "documents").select(col("doc_id"), planted.as("_t23"))
        .select(col("doc_id"),
          size(ids).cast("long").as("n_ids"),
          md5(array_join(transform(ids, _.cast("string")), ",")).as("ids_md5"))
        .orderBy(col("doc_id"))
    },
    Some {
      val mtVals = T20Merges.zipWithIndex
        .map { case ((a, b), i) => s"('$a','$b',$i)" }.mkString(", ")
      val nRounds = T20Merges.length + 1
      s"""
      WITH RECURSIVE
      aug AS (SELECT doc_id, left(regexp_replace(text, '[^ -~]', '', 'g'), 120) ||
            ' don''t stop<|endoftext|>the café  costs 12,50!!! DON''T ''twas x3<|endoftext|> ' AS t
        FROM documents),
      mt(a, b, rk) AS (VALUES $mtVals),
      -- findall, one pre-token per recursion step: specials segmented
      -- first, then the pattern alternatives IN ORDER as anchored
      -- extracts; the whitespace CASEs encode \\s+(?!\\S) vs \\s+
      tok(doc_id, rest, wi, word) AS (
        SELECT doc_id, t, 0, CAST(NULL AS VARCHAR) FROM aug
        UNION ALL
        SELECT doc_id, substr(rest, length(nxt) + 1), wi + 1, nxt FROM (
          SELECT doc_id, rest, wi,
            CASE WHEN spos = 1 THEN '<|endoftext|>'
                 WHEN ctr <> '' THEN ctr
                 WHEN ltr <> '' THEN ltr
                 WHEN num <> '' THEN num
                 WHEN pnc <> '' THEN pnc
                 WHEN ws = seg THEN ws
                 WHEN length(ws) >= 2 THEN substr(ws, 1, length(ws) - 1)
                 ELSE ws END AS nxt
          FROM (
            SELECT doc_id, rest, wi, spos, seg,
              regexp_extract(seg, '^(''s|''t|''re|''ve|''m|''ll|''d)') AS ctr,
              regexp_extract(seg, '^( ?\\p{L}+)') AS ltr,
              regexp_extract(seg, '^( ?\\p{N}+)') AS num,
              regexp_extract(seg, '^( ?[^\\s\\p{L}\\p{N}]+)') AS pnc,
              regexp_extract(seg, '^(\\s+)') AS ws
            FROM (
              SELECT doc_id, rest, wi, strpos(rest, '<|endoftext|>') AS spos,
                CASE WHEN strpos(rest, '<|endoftext|>') > 0
                     THEN substr(rest, 1, strpos(rest, '<|endoftext|>') - 1)
                     ELSE rest END AS seg
              FROM tok WHERE rest <> '')))),
      wd AS MATERIALIZED (SELECT doc_id, wi, word FROM tok WHERE word IS NOT NULL),
      sp AS (SELECT doc_id, wi, word, (word = '<|endoftext|>') AS is_sp FROM wd),
      ch AS MATERIALIZED (SELECT doc_id, wi,
               unnest(generate_series(1, length(word))) AS ci,
               unnest(str_split(word, '')) AS c
             FROM sp WHERE NOT is_sp),
      $byteExpandSql,
      ${bpeRoundsSql(nRounds)},
      finenc AS MATERIALIZED (SELECT doc_id, wi, unnest(p) AS piece,
                unnest(generate_series(1, len(p))) AS i FROM r$nRounds),
      finsp AS (SELECT doc_id, wi, '<|endoftext|>' AS piece, 1 AS i FROM sp WHERE is_sp),
      fin AS (SELECT * FROM finenc UNION ALL SELECT * FROM finsp),
      vocab AS (
        SELECT bt.b2u[b + 1] AS piece, b AS id
        FROM (SELECT unnest(generate_series(0, 255)) AS b) bs CROSS JOIN bt
        UNION ALL SELECT a || b AS piece, 256 + rk AS id FROM mt
        UNION ALL SELECT '<|endoftext|>' AS piece, ${256 + T20Merges.length} AS id),
      idr AS (SELECT f.doc_id, f.wi, f.i, v.id
              FROM fin f JOIN vocab v ON v.piece = f.piece),
      agg AS (SELECT doc_id, count(*) AS n_ids,
                md5(string_agg(CAST(id AS VARCHAR), ',' ORDER BY wi, i)) AS ids_md5
              FROM idr GROUP BY 1)
      SELECT d.doc_id, CAST(coalesce(a.n_ids, 0) AS BIGINT) AS n_ids,
             coalesce(a.ids_md5, md5('')) AS ids_md5
      FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id
    """
    },
    // same native-scan shape as t22 plus the one-pass splitter; the
    // recursive findall is DuckDB-side only
    benchmark = false)

  /** T26 — tokenizer ROUND-TRIP: `byteBpeDecode(byteBpeIdsGpt2(text))`
    * must return the input byte-for-byte ([[TA.byteBpeDecode]], the exact
    * inverse of the t22/t23 id emission — byte-level BPE is lossless by
    * construction). The oracle does NOT replay the tokenizer: identity is
    * the whole claim, so it hashes the PLANTED text directly — any
    * decode-side defect (wrong vocab layout, byte-table inversion error,
    * special mishandling, lost whitespace run) flips `round_trip` or the
    * md5. The planted tail exercises contractions, specials, multi-space
    * runs, multi-byte chars, and digit/punct seams on every row; the
    * sanitized document prefix varies per doc. This is the wrong-vocab
    * tripwire an id-producing pipeline runs before a training job does.
    */
  val t26BpeRoundTrip = QueryDef(
    "t26_bpe_round_trip",
    (s, dir) => {
      val sanitized = regexp_replace(col("text"), "[^ -~]", "")
      val planted = concat(substring(sanitized, 1, 120),
        lit(" don't stop<|endoftext|>the café  costs 12,50!!! DON'T 'twas x3<|endoftext|> "))
      val ids = TA.byteBpeIdsGpt2(col("_t26"), T20Merges, T20Specials)
      val decoded = TA.byteBpeDecode(ids, T20Merges, T20Specials)
      Td(s, dir, "documents").select(col("doc_id"), planted.as("_t26"))
        .select(col("doc_id"),
          length(col("_t26")).cast("long").as("n_chars"),
          (decoded === col("_t26")).as("round_trip"),
          md5(decoded.cast("binary")).as("decoded_md5"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH aug AS (SELECT doc_id, left(regexp_replace(text, '[^ -~]', '', 'g'), 120) ||
            ' don''t stop<|endoftext|>the café  costs 12,50!!! DON''T ''twas x3<|endoftext|> ' AS t
        FROM documents)
      SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars, TRUE AS round_trip,
             md5(t) AS decoded_md5
      FROM aug ORDER BY doc_id
    """),
    // the t23 encode shape plus a map-only decode — nothing new to time
    benchmark = false)

  /** T24 — held-out LM scoring with an IN-ENGINE-trained stupid-backoff
    * bigram model ([[TA.lmTrain]] → [[TA.lmScore]]): the CCNet in-domain
    * filter end to end. The model trains on the English half-slice
    * (md5-bucket even ∧ lang = 'en' — a deterministic stand-in for "the
    * clean wiki-like reference corpus"), then EVERY document is scored
    * under it — including the reference's own complement, where unseen
    * bigrams fall to the α·C(w)/N unigram leg (α = 0.4, Brants et al.)
    * and OOV words to the −20 floor. In-domain (English) docs land in the
    * high-avg_logp region, other-language docs in the tail — exactly the
    * separation the filter gates on; `lang` rides along so the split is
    * visible in the output. t8 is the no-smoothing SELF-scored variant;
    * this is the train/score SPLIT that needs the backoff t8 avoids.
    *
    * Determinism: integer counts → one ln per model row (ulp-stable
    * cross-engine) → DECIMAL(18,6) rounding once inside lmScore → exact
    * decimal sums. ln(0.4) enters pre-rounded to −0.916291 on both sides.
    */
  val t24LmBackoff = QueryDef(
    "t24_lm_backoff",
    (s, dir) => {
      val docs = Td(s, dir, "documents")
      val ref = docs.where(col("lang") === "en" &&
        Similarity.sampleBucket(col("doc_id")) % 2 === 0)
      val (bt, ut) = TA.lmTrain(ref, "text")
      val scored = TA.lmScore(docs, "doc_id", "text", bt, ut,
        oovLogp = -20.0, backoffLogp = math.log(0.4))
      docs.select(col("doc_id"), col("lang"))
        .join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          col("avg_logp"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH ref AS (SELECT text FROM documents
                   WHERE lang = 'en' AND ${sampleBucketSql("doc_id")} % 2 = 0),
      rw AS (SELECT regexp_split_to_array(trim(text), '\\s+') AS ws FROM ref),
      rbg AS (SELECT unnest(list_transform(generate_series(1, len(ws)-1),
                i -> ws[i] || ' ' || ws[i+1])) AS bigram
              FROM rw WHERE len(ws) >= 2),
      c2 AS (SELECT bigram, count(*) AS c2 FROM rbg GROUP BY 1),
      c1 AS (SELECT split_part(bigram, ' ', 1) AS w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
      bt AS (SELECT c2.bigram,
               CAST(ln(CAST(c2.c2 AS DOUBLE) / CAST(c1.c1 AS DOUBLE)) AS DECIMAL(18,6)) AS blp
             FROM c2 JOIN c1 ON split_part(c2.bigram, ' ', 1) = c1.w1),
      rt AS (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word FROM ref),
      uc AS (SELECT word, count(*) AS c FROM rt GROUP BY 1),
      ut AS (SELECT word,
               CAST(ln(CAST(c AS DOUBLE) / (SELECT CAST(sum(c) AS DOUBLE) FROM uc))
                 AS DECIMAL(18,6)) AS ulp
             FROM uc),
      w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents),
      bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ws)-1),
               i -> ws[i] || ' ' || ws[i+1])) AS g
             FROM w WHERE len(ws) >= 2),
      j AS (SELECT bg.doc_id, bt.blp,
              coalesce(bt.blp,
                ut.ulp + CAST('-0.916291' AS DECIMAL(18,6)),
                CAST('-20.0' AS DECIMAL(18,6))) AS lp
            FROM bg LEFT JOIN bt ON bt.bigram = bg.g
                    LEFT JOIN ut ON ut.word = split_part(bg.g, ' ', 2)),
      agg AS (SELECT doc_id, count(*) AS n_bigrams, count(blp) AS n_hits,
                CAST(sum(lp) AS DOUBLE) / count(*) AS avg_logp
              FROM j GROUP BY 1)
      SELECT d.doc_id, d.lang,
             CAST(coalesce(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
             CAST(coalesce(a.n_hits, 0) AS BIGINT) AS n_hits,
             a.avg_logp
      FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id
    """),
    // t8 times the identical explode + model joins + keyed agg shape on
    // the same table — compact-line headroom
    benchmark = false)

  /** T25 — seed-labeled Naive Bayes quality classifier, trained IN-ENGINE
    * ([[TA.nbTrain]] → [[TA.linearScore]]): the other half of the t14/t15
    * surface, which loads exported weights but never produces them. The
    * seed is the deterministic md5-bucket half of the corpus, labeled from
    * metadata (lang = 'en' — the stand-in for "labels from cheap
    * heuristics or a reference corpus", the fastText/DCLM recipe); the
    * trained (term, weight) table then scores EVERY document — seed and
    * held-out alike — through the unchanged t15 scoring path. `is_en`
    * rides along as ground truth, so the output IS the eval table
    * (pred vs is_en) a curation pipeline thresholds on.
    *
    * Determinism: integer counts → two ln per term (ulp-stable) →
    * DECIMAL(18,6) rounding once inside linearScore → exact decimal sums;
    * the bias is ln of the two collected class counts (one 2-column driver
    * row), recomputed identically by the oracle.
    */
  val t25NbClassifier = QueryDef(
    "t25_nb_classifier",
    (s, dir) => {
      val docs = Td(s, dir, "documents")
      val seed = docs.where(Similarity.sampleBucket(col("doc_id")) < 128)
        .select(col("text"), (col("lang") === "en").as("_y"))
      val (wts, bias) = TA.nbTrain(seed, "text", "_y")
      val scored = TA.linearScore(docs, "doc_id", "text", wts, bias = bias)
      docs.select(col("doc_id"), (col("lang") === "en").as("is_en"))
        .join(scored, Seq("doc_id"))
        .select(col("doc_id"), col("is_en"), col("n_tokens"), col("n_hits"),
          col("score"), (col("score") > 0.0).as("pred"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH seed AS (SELECT (lang = 'en') AS y, text FROM documents
                    WHERE ${sampleBucketSql("doc_id")} < 128),
      st AS (SELECT y, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term FROM seed),
      tc AS (SELECT term,
               sum(CASE WHEN y THEN 1 ELSE 0 END) AS c1,
               sum(CASE WHEN y THEN 0 ELSE 1 END) AS c0
             FROM st GROUP BY 1),
      tot AS (SELECT sum(c1) AS n1, sum(c0) AS n0, count(*) AS v FROM tc),
      wt AS (SELECT term,
               CAST(ln(CAST(c1 + 1 AS DOUBLE) / CAST(n1 + v AS DOUBLE))
                  - ln(CAST(c0 + 1 AS DOUBLE) / CAST(n0 + v AS DOUBLE))
                 AS DECIMAL(18,6)) AS w
             FROM tc CROSS JOIN tot),
      bias AS (SELECT ln(CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE)
                       / CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS DOUBLE)) AS b
               FROM seed),
      dt AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
             FROM documents),
      j AS (SELECT dt.doc_id, wt.w FROM dt LEFT JOIN wt USING (term)),
      agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(count(w) AS BIGINT) AS n_hits,
                (SELECT b FROM bias)
                  + coalesce(CAST(sum(w) AS DOUBLE), 0.0) / CAST(count(*) AS DOUBLE) AS score
              FROM j GROUP BY 1)
      SELECT d.doc_id, (d.lang = 'en') AS is_en, a.n_tokens, a.n_hits,
             a.score, (a.score > 0.0) AS pred
      FROM documents d JOIN agg a USING (doc_id) ORDER BY d.doc_id
    """),
    // t15/t5 time the explode + broadcast-weight join + keyed agg shape —
    // compact-line headroom
    benchmark = false)

  /** X39 — takedown through the durable BM25 index
    * ([[graft.ext.Bm25.buildIndex]] → [[graft.tables.Deletes.cascade]]
    * `bm25Indexes` leg → [[graft.ext.Bm25.searchIndex]]): build the
    * full-vocabulary postings artifact, cascade-delete the md5-bucket %5
    * ids, then search the ADJUSTED index. The oracle computes BM25 from
    * scratch on the surviving documents only — so the x34 criterion
    * applies to the retrieval shape: post-delete scores (df, N, avgdl all
    * shifted by the deletions) must hash-match a from-scratch rebuild,
    * double-for-double. The index derives df from term-filtered postings
    * and recomputes stats from surviving doclen rows (never adjusts
    * persisted counters), so this equality holds by construction — the
    * oracle is the proof.
    */
  val x39Bm25Takedown = QueryDef(
    "x39_bm25_takedown",
    (s, dir) => {
      val docs = Td(s, dir, "documents").select(col("doc_id"), col("text"))
      val store = graft.tables.Scratch.store(s)
      graft.ext.Bm25.buildIndex(store, "x39_bm", docs, "doc_id", "text")
      val deleted = docs
        .filter(Similarity.sampleBucket(col("doc_id")) % 5 === 0)
        .select(col("doc_id"))
      graft.tables.Deletes.cascade(store, deleted, "doc_id",
        bm25Indexes = Seq("x39_bm"))
      graft.ext.Bm25.searchIndex(store, "x39_bm", "doc_id",
          queryTerms = Seq("table", "merge", "spark"), topK = 20)
        .select(col("doc_id"), col("score"), col("rnk").cast("long").as("rnk"))
        .orderBy(col("rnk"))
    },
    Some(s"""
      WITH ${bm25Cte(Seq("table", "merge", "spark"),
        where = s"WHERE NOT (${sampleFilterSql("doc_id", 5)})")},
      r AS (SELECT doc_id, score,
              row_number() OVER (ORDER BY score DESC, doc_id) AS rnk FROM bscore)
      SELECT doc_id, score, rnk FROM r WHERE rnk <= 20 ORDER BY rnk
    """),
    // build dominates (one explode+groupBy, the s9/t5 scan shape); the
    // delete leg is doc-local anti-joins
    benchmark = false)

  /** X40 — incremental BM25 index append ([[graft.ext.Bm25.append]]):
    * build the durable index on the ~4/5 md5-bucket base, APPEND the ~1/5
    * increment — postings/doclen rows are doc-local, so the base is never
    * re-read or re-tokenized (Bm25Spec deletes the base corpus first to
    * enforce it) — then search the appended index. The oracle is the
    * FULL-corpus BM25 search with no split at all: because df/N/avgdl are
    * derived from the rows present rather than persisted counters,
    * append ≡ union-rebuild ≡ never-split, double-for-double — the s14
    * frozen-artifact criterion in the regime where there is no artifact
    * to freeze. Any leak of split state into scoring flips rows.
    */
  val x40Bm25Append = QueryDef(
    "x40_bm25_append",
    (s, dir) => {
      val docs = Td(s, dir, "documents").select(col("doc_id"), col("text"))
      val store = graft.tables.Scratch.store(s)
      val isInc = Similarity.sampleBucket(col("doc_id")) % 5 === 0
      graft.ext.Bm25.buildIndex(store, "x40_bm", docs.filter(!isInc),
        "doc_id", "text")
      graft.ext.Bm25.append(store, "x40_bm", docs.filter(isInc),
        "doc_id", "text")
      graft.ext.Bm25.searchIndex(store, "x40_bm", "doc_id",
          queryTerms = Seq("table", "merge", "spark"), topK = 20)
        .select(col("doc_id"), col("score"), col("rnk").cast("long").as("rnk"))
        .orderBy(col("rnk"))
    },
    Some(s"""
      WITH ${bm25Cte(Seq("table", "merge", "spark"))},
      r AS (SELECT doc_id, score,
              row_number() OVER (ORDER BY score DESC, doc_id) AS rnk FROM bscore)
      SELECT doc_id, score, rnk FROM r WHERE rnk <= 20 ORDER BY rnk
    """),
    // the x39 build shape plus a smaller one — nothing new to time
    benchmark = false)

  /** T18 — BPE merge-table TRAINING ([[graft.ext.TextAnalysis.bpeTrain]],
    * the learning side of t16): three rounds of encode-with-learned-merges
    * → within-word adjacent-pair counts → deterministic argmax (count
    * desc, pair asc). The oracle replays all three training rounds — each
    * round's encode is a t16-style unrolled chain over the merge table the
    * PREVIOUS rounds' argmaxes produced (computed in CTEs, not planted),
    * so the learned table, the counts, and the rank order are all
    * hash-gated. Encode chains unroll merges+2 rounds (two identity
    * rounds of slack over the ≤-one-round-per-pair bound).
    */
  val t18BpeTrain = QueryDef(
    "t18_bpe_train",
    (s, dir) => {
      import s.implicits._
      val learned = TA.bpeTrain(
        Td(s, dir, "documents").select(col("text")), "text", nMerges = 3)
      learned.zipWithIndex
        .map { case ((a, b, c), i) => (i, a, b, c) }
        .toDF("rank", "a", "b", "n_occ")
        .select(col("rank").cast("int").as("rank"), col("a"), col("b"),
          col("n_occ").cast("long").as("n_occ"))
        .orderBy(col("rank"))
    },
    Some {
      import BpeOracle.{round, pick}
      val enc2 = (1 to 3).map(n => round(2, n, "mt1")).mkString(",\n      ")
      val enc3 = (1 to 4).map(n => round(3, n, "mt2")).mkString(",\n      ")
      s"""
      WITH ${BpeOracle.base},
      ${pick(1, "p0")},
      mt1 AS (SELECT split_part(pr, ' ', 1) AS a, split_part(pr, ' ', 2) AS b, 0 AS rk FROM cb1),
      $enc2,
      ${pick(2, "r2_3")},
      mt2 AS (SELECT a, b, rk FROM mt1 UNION ALL
              SELECT split_part(pr, ' ', 1), split_part(pr, ' ', 2), 1 FROM cb2),
      $enc3,
      ${pick(3, "r3_4")}
      SELECT * FROM (
        SELECT CAST(0 AS INT) AS rank, split_part(pr, ' ', 1) AS a,
               split_part(pr, ' ', 2) AS b, CAST(c AS BIGINT) AS n_occ FROM cb1
        UNION ALL
        SELECT CAST(1 AS INT), split_part(pr, ' ', 1), split_part(pr, ' ', 2),
               CAST(c AS BIGINT) FROM cb2
        UNION ALL
        SELECT CAST(2 AS INT), split_part(pr, ' ', 1), split_part(pr, ' ', 2),
               CAST(c AS BIGINT) FROM cb3)
      ORDER BY rank
    """
    },
    // K driver-bounded scan+agg rounds — d3/x3 time comparable shapes;
    // the unrolled training replay is DuckDB-side only
    benchmark = false)

  /** Shared DuckDB generators for the BPE training/encode replays (t18,
    * t19): per-word piece tables, one encode round against a computed
    * merge-table CTE, and the pair-count argmax of a training round. Every
    * multi-referenced CTE is MATERIALIZED — DuckDB inlines CTEs and the
    * chained rounds would otherwise re-evaluate exponentially.
    */
  private object BpeOracle {
    /** Tokenize + char-piece base CTEs (`wd`, `p0`). */
    val base: String =
      """wd AS MATERIALIZED (SELECT doc_id, wi, word FROM (
             SELECT doc_id, unnest(ws) AS word, unnest(generate_series(1, len(ws))) AS wi
             FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents))
           WHERE length(word) > 0),
      p0 AS MATERIALIZED (SELECT doc_id, wi,
             list_transform(generate_series(1, length(word)), i -> word[i:i]) AS p FROM wd)"""

    /** One t16-style encode round: pieces `prev` → `r<t>_<n>`, merging
      * against computed merge-table CTE `mt`.
      */
    def round(t: Int, n: Int, mt: String): String = {
      val prev = if (n == 1) "p0" else s"r${t}_${n - 1}"
      s"""u${t}_$n AS MATERIALIZED (SELECT doc_id, wi, unnest(p) AS piece,
                 unnest(generate_series(1, len(p))) AS i FROM $prev),
      p${t}_$n AS MATERIALIZED (SELECT x.doc_id, x.wi, x.i, mt.rk
             FROM u${t}_$n x JOIN u${t}_$n y ON y.doc_id = x.doc_id AND y.wi = x.wi AND y.i = x.i + 1
             JOIN $mt mt ON mt.a = x.piece AND mt.b = y.piece),
      b${t}_$n AS MATERIALIZED (SELECT doc_id, wi, min(rk) AS best FROM p${t}_$n GROUP BY 1, 2),
      s${t}_$n AS MATERIALIZED (SELECT p.doc_id, p.wi, p.i,
               row_number() OVER (PARTITION BY p.doc_id, p.wi ORDER BY p.i) AS rn
             FROM p${t}_$n p JOIN b${t}_$n b ON b.doc_id = p.doc_id AND b.wi = p.wi AND p.rk = b.best),
      a${t}_$n AS MATERIALIZED (SELECT doc_id, wi, i FROM (
               SELECT doc_id, wi, i,
                 row_number() OVER (PARTITION BY doc_id, wi, i - rn ORDER BY i) AS pr
               FROM s${t}_$n) WHERE pr % 2 = 1),
      r${t}_$n AS MATERIALIZED (SELECT u.doc_id, u.wi,
               list(CASE WHEN a1.i IS NOT NULL THEN u.piece || nx.piece ELSE u.piece END
                    ORDER BY u.i) AS p
             FROM u${t}_$n u
             LEFT JOIN a${t}_$n a1 ON a1.doc_id = u.doc_id AND a1.wi = u.wi AND a1.i = u.i
             LEFT JOIN a${t}_$n a2 ON a2.doc_id = u.doc_id AND a2.wi = u.wi AND a2.i = u.i - 1
             LEFT JOIN u${t}_$n nx ON nx.doc_id = u.doc_id AND nx.wi = u.wi AND nx.i = u.i + 1
             WHERE a2.i IS NULL
             GROUP BY u.doc_id, u.wi)"""
      }
      // training round t: pair counts over pieces table `from`, argmax
      def pick(t: Int, from: String): String =
        s"""pr$t AS MATERIALIZED (SELECT unnest(list_transform(generate_series(1, len(p) - 1),
                 i -> p[i] || ' ' || p[i+1])) AS pr FROM $from),
      cb$t AS MATERIALIZED (SELECT pr, count(*) AS c FROM pr$t GROUP BY 1
             HAVING count(*) >= 2 ORDER BY c DESC, pr LIMIT 1)"""
  }

  /** T19 — the full tokenizer LIFECYCLE as one pipeline: train 3 merges
    * on the corpus ([[graft.ext.TextAnalysis.bpeTrain]]), encode EVERY
    * document with the LEARNED table ([[graft.ext.TextAnalysis
    * .bpeEncode]]), and report per-source document and piece counts — the
    * budget numbers a mixing plan consumes. Pins the composition t18 and
    * t16 prove separately: the trained artifact must round-trip into the
    * encoder and the counts must survive per-source aggregation. The
    * oracle re-trains from scratch in CTEs (t18's replay), then unrolls a
    * 5-round encode of the whole corpus against the learned table; empty
    * documents have no words but must still count as documents.
    */
  val t19BpePipeline = QueryDef(
    "t19_bpe_pipeline",
    (s, dir) => {
      val docs = Td(s, dir, "documents")
      val learned = TA.bpeTrain(docs.select(col("text")), "text", nMerges = 3)
        .map(m => (m._1, m._2))
      docs.select(col("source"), TA.bpeEncode(col("text"), learned).as("_p"))
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(size(col("_p"))).cast("long").as("n_pieces"))
        .orderBy(col("source"))
    },
    Some {
      import BpeOracle.{round, pick}
      val enc2 = (1 to 3).map(n => round(2, n, "mt1")).mkString(",\n      ")
      val enc3 = (1 to 4).map(n => round(3, n, "mt2")).mkString(",\n      ")
      val enc4 = (1 to 5).map(n => round(4, n, "mt3")).mkString(",\n      ")
      s"""
      WITH ${BpeOracle.base},
      ${pick(1, "p0")},
      mt1 AS (SELECT split_part(pr, ' ', 1) AS a, split_part(pr, ' ', 2) AS b, 0 AS rk FROM cb1),
      $enc2,
      ${pick(2, "r2_3")},
      mt2 AS (SELECT a, b, rk FROM mt1 UNION ALL
              SELECT split_part(pr, ' ', 1), split_part(pr, ' ', 2), 1 FROM cb2),
      $enc3,
      ${pick(3, "r3_4")},
      mt3 AS (SELECT a, b, rk FROM mt2 UNION ALL
              SELECT split_part(pr, ' ', 1), split_part(pr, ' ', 2), 2 FROM cb3),
      $enc4,
      agg AS (SELECT doc_id, sum(len(p)) AS np FROM r4_5 GROUP BY 1)
      SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(coalesce(sum(a.np), 0) AS BIGINT) AS n_pieces
      FROM documents d LEFT JOIN agg a USING (doc_id)
      GROUP BY 1 ORDER BY 1
    """
    },
    // t18's rounds + one corpus-wide encode pass — compact-line headroom
    benchmark = false)

  /** Q4 — declarative data-quality expectations
    * ([[graft.tables.Expectations.metrics]]): four named rules over
    * lineitem — one that always passes (the zero-violation row must
    * report 0, not vanish), two that split the data, one domain check —
    * with the DLT-style strict null semantics (NULL predicate =
    * violation). One scan, one aggregation; the oracle replays each
    * rule's violation count and the declaration-order funnel rows.
    */
  val q4Expectations = QueryDef(
    "q4_expectations",
    (s, dir) => {
      import graft.tables.Expectations.{Rule, metrics}
      metrics(Td(s, dir, "lineitem"), Seq(
        Rule("qty_positive", col("l_quantity") > 0),
        Rule("qty_le_25", col("l_quantity") <= 25),
        Rule("discount_le_5pct", col("l_discount") <= 0.05),
        Rule("flag_known", col("l_returnflag").isin("A", "N"))))
    },
    Some {
      val preds = Seq(
        "l_quantity > 0", "l_quantity <= 25", "l_discount <= 0.05",
        "l_returnflag IN ('A', 'N')")
      val sums = preds.zipWithIndex.map { case (p, i) =>
        s"sum(CASE WHEN NOT coalesce($p, FALSE) THEN 1 ELSE 0 END) AS v$i"
      }.mkString(", ")
      val pickV = "CASE st.rule_idx WHEN 0 THEN v0 WHEN 1 THEN v1 WHEN 2 THEN v2 ELSE v3 END"
      s"""
      WITH a AS (SELECT count(*) AS n, $sums FROM lineitem),
      st(rule_idx, rule) AS (VALUES (0, 'qty_positive'), (1, 'qty_le_25'),
        (2, 'discount_le_5pct'), (3, 'flag_known'))
      SELECT CAST(st.rule_idx AS INT) AS rule_idx, st.rule,
             CAST(a.n AS BIGINT) AS n_rows,
             CAST($pickV AS BIGINT) AS n_viol,
             CAST($pickV AS DOUBLE) / CAST(greatest(a.n, 1) AS DOUBLE) AS viol_frac
      FROM st CROSS JOIN a ORDER BY st.rule_idx
    """
    },
    // one scan + 1-row agg — q2/q3 time the shape
    benchmark = false)

  /** Shared LM tables for T17 — log-probs are k/64 decimals (exact at
    * scale 6 on both engines), negative as log-probs are. The bigram rows
    * hit only when the exact word pair occurs; unigrams back off on the
    * SECOND word; everything else takes the OOV floor.
    */
  private val T17Bigrams: Seq[(String, Int)] = Seq(
    "table scan" -> -8, "fast key" -> -6, "value table" -> -4,
    "the line" -> -10, "a row" -> -3, "key agg" -> -7)
  private val T17Unigrams: Seq[(String, Int)] = Seq(
    "table" -> -20, "scan" -> -24, "key" -> -16, "value" -> -18,
    "the" -> -12, "a" -> -10, "row" -> -22, "fast" -> -26, "agg" -> -14)
  private val T17Oov = -0.75    // -48/64
  private val T17Backoff = -0.09375 // -6/64

  /** T17 — exported-LM scoring ([[graft.ext.TextAnalysis.lmScore]]): the
    * trained-artifact surface for t8's self-trained mechanism — score with
    * a SHIPPED bigram/unigram log-prob table under stupid backoff
    * (bigram → unigram(w2) + backoff → OOV floor). Docs with id%17==9 are
    * replanted all-OOV (avg_logp = the exact OOV constant, n_hits = 0);
    * docs with id%23==21 become single-token (no bigrams → NULL score,
    * zero counts — the row must survive, not vanish). The oracle replays
    * the identical decimal backoff chain from the same constants.
    */
  val t17LmScored = QueryDef(
    "t17_lm_scored",
    (s, dir) => {
      import s.implicits._
      val id = col("doc_id")
      def st(c: org.apache.spark.sql.Column) = c.cast("string")
      val bt = T17Bigrams.map { case (g, k) => (g, t15w64(k)) }.toDF("bigram", "logp")
      val ut = T17Unigrams.map { case (w, k) => (w, t15w64(k)) }.toDF("word", "logp")
      val planted = when(id % 17 === 9,
          concat(lit("qq"), st(id), lit(" zz"), st(id), lit(" qq"), st(id)))
        .when(id % 23 === 21, lit("solo"))
        .otherwise(col("text"))
      val docs = Td(s, dir, "documents").select(id, planted.as("text"))
      val scored = TA.lmScore(docs, "doc_id", "text", bt, ut,
        oovLogp = T17Oov, backoffLogp = T17Backoff)
      docs.select(id)
        .join(scored, Seq("doc_id"), "left")
        .select(id,
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          col("avg_logp"))
        .orderBy(id)
    },
    Some {
      val btVals = T17Bigrams
        .map { case (g, k) => s"('$g', CAST('${t15w64(k)}' AS DECIMAL(18,6)))" }
        .mkString(", ")
      val utVals = T17Unigrams
        .map { case (w, k) => s"('$w', CAST('${t15w64(k)}' AS DECIMAL(18,6)))" }
        .mkString(", ")
      s"""
      WITH aug AS (SELECT doc_id, CASE
          WHEN doc_id % 17 = 9 THEN 'qq' || CAST(doc_id AS VARCHAR) ||
            ' zz' || CAST(doc_id AS VARCHAR) || ' qq' || CAST(doc_id AS VARCHAR)
          WHEN doc_id % 23 = 21 THEN 'solo'
          ELSE text END AS t FROM documents),
      bt(bigram, blp) AS (VALUES $btVals),
      ut(word, ulp) AS (VALUES $utVals),
      w AS (SELECT doc_id, regexp_split_to_array(trim(t), '\\s+') AS ws FROM aug),
      bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ws)-1),
               i -> ws[i] || ' ' || ws[i+1])) AS g
             FROM w WHERE len(ws) >= 2),
      j AS (SELECT bg.doc_id, bt.blp,
              coalesce(bt.blp,
                ut.ulp + CAST('${t15w64(-6)}' AS DECIMAL(18,6)),
                CAST('${t15w64(-48)}' AS DECIMAL(18,6))) AS lp
            FROM bg LEFT JOIN bt ON bt.bigram = bg.g
                    LEFT JOIN ut ON ut.word = split_part(bg.g, ' ', 2)),
      agg AS (SELECT doc_id, count(*) AS n_bigrams, count(blp) AS n_hits,
                CAST(sum(lp) AS DOUBLE) / count(*) AS avg_logp
              FROM j GROUP BY 1)
      SELECT d.doc_id,
             CAST(coalesce(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
             CAST(coalesce(a.n_hits, 0) AS BIGINT) AS n_hits,
             a.avg_logp
      FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id
    """
    },
    // t5's explode + broadcast joins + keyed agg time the shape —
    // compact-line headroom
    benchmark = false)

  /** X24 — per-source token-budget cap: the exact-budget companion to
    * x12's rate-based temperature mix. Docs take a deterministic
    * per-source order (md5 of the id — x18's epoch-shuffle convention), a
    * running token total accumulates, and the source's intake closes at
    * `budget` tokens. Integer cumsum — no fp anywhere.
    *
    * Scale shape: one hash exchange on `source` + a per-source sort; the
    * running sum slides linearly per partition (w1's window shape). A
    * pathological mega-source serializes its own partition only — and the
    * two-phase recomposition [[graft.ext.Ranking.globalRankTiles]] uses is
    * the drop-in fix if one source ever dominates a crawl.
    */
  val x24TokenBudget = QueryDef(
    "x24_token_budget",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = Td(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(split(trim(col("text")), "\\s+")).as("n_tok"),
          md5(col("doc_id").cast("string")).as("_k"))
      val w = Window.partitionBy(col("source")).orderBy(col("_k"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      d.select(col("doc_id"), col("source"), col("n_tok"),
          sum(col("n_tok")).over(w).cast("long").as("cum_tok"))
        .filter(col("cum_tok") <= 600)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH d AS (SELECT doc_id, source,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tok,
               md5(CAST(doc_id AS VARCHAR)) AS k
             FROM documents),
      c AS (SELECT doc_id, source, n_tok,
              CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY k, doc_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
            FROM d)
      SELECT doc_id, source, n_tok, cum_tok FROM c WHERE cum_tok <= 600 ORDER BY doc_id
    """),
    // w1 times the hash-exchange + per-partition running window —
    // compact-line headroom
    benchmark = false)

  /** X27 — cross-source quantile normalization: each doc's quality score
    * becomes its PERCENTILE within its own source ((rank − 0.5)/n — the
    * midrank convention), so "good for src3" and "good for src17" mean the
    * same number even when the sources' raw score distributions differ —
    * the calibration pass a mixing recipe needs before comparing quality
    * across crawls. Rank ties break on doc_id (total order), n is exact,
    * and the percentile arithmetic is the identical IEEE expression both
    * engines.
    *
    * Scale shape: ONE hash exchange on source + a per-source sort; rank
    * and count ride the same window partitioning (w1's shape — and
    * [[graft.ext.Ranking.topKPerGroup]]'s salted recomposition is the
    * drop-in if one source ever dominates).
    */
  val x27QuantileNorm = QueryDef(
    "x27_quantile_norm",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val scored = Td(s, dir, "documents")
        .select(col("doc_id"), col("source"), TA.qualityScore(col("text")).as("quality"))
      val w = Window.partitionBy(col("source")).orderBy(col("quality"), col("doc_id"))
      val wn = Window.partitionBy(col("source"))
      scored
        .select(col("doc_id"), col("source"), col("quality"),
          ((row_number().over(w).cast("double") - 0.5) /
            count(lit(1)).over(wn)).as("pct"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH b AS (
        SELECT doc_id, source,
               CAST(len(regexp_extract_all(lower(text), '[^a-z0-9\\s]')) AS DOUBLE)
                 / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio,
               CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                 x -> list_contains(${sqlList(TA.Stopwords)}, x))) AS DOUBLE)
                 / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS stop_ratio,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS n_tok
        FROM documents),
      q AS (SELECT doc_id, source,
              0.5 * least(n_tok / 64.0, 1.0) + 0.5 * least(stop_ratio * 4.0, 1.0)
                - punct_ratio * 2.0 AS quality
            FROM b)
      SELECT doc_id, source, quality,
             (CAST(row_number() OVER (PARTITION BY source ORDER BY quality, doc_id) AS DOUBLE) - 0.5)
               / count(*) OVER (PARTITION BY source) AS pct
      FROM q ORDER BY doc_id
    """),
    // w1/x14 time the per-source window exchange — compact-line headroom
    benchmark = false)

  /** X26 — deterministic train/val/test split: every doc lands in exactly
    * one of three fixed-rate partitions (train 240/256 ≈ 93.75%, val and
    * test 8/256 ≈ 3.125% each) as a pure function of its id's md5 bucket
    * — the [[Similarity.sampleBucket]] convention every sampling oracle
    * shares, so the split is content-independent, stable across runs and
    * engines, and a re-crawled doc keeps its assignment (eval can never
    * leak into train on a refresh). Map-only, rides the scan.
    */
  val x26TrainSplit = QueryDef(
    "x26_train_split",
    (s, dir) => {
      val b = Similarity.sampleBucket(col("doc_id"))
      Td(s, dir, "documents")
        .select(col("doc_id"),
          when(b < 240, "train").when(b < 248, "val").otherwise("test").as("split"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      SELECT doc_id,
             CASE WHEN ${sampleBucketSql("doc_id")} < 240 THEN 'train'
                  WHEN ${sampleBucketSql("doc_id")} < 248 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents ORDER BY doc_id
    """),
    // x7 times the md5-bucket map filter shape — compact-line headroom
    benchmark = false)

  /** X25 — link-graph centrality ([[graft.ext.Graphs.pageRank]]): 3-round
    * damped PageRank over a deterministic synthetic link graph (each doc
    * endorses (7·id + 13j + 1) mod N for j ∈ 0..2, self-loops dropped) —
    * the crawl-quality signal that weights pages by who endorses them.
    * Every contribution and rank snaps to the 2^-20 grid, so the sums are
    * order-free exact and the oracle's unrolled rounds replay the exact
    * doubles; any drift in the update formula, teleport arithmetic, or
    * round count flips ranks.
    */
  val x25LinkRank = QueryDef(
    "x25_link_rank",
    (s, dir) => {
      val base = Td(s, dir, "documents").select(col("doc_id"))
      val n1 = base.agg(count(lit(1)).as("_ni"))
      val edges = base.crossJoin(broadcast(n1))
        .select(col("doc_id").as("src"),
          explode(array(lit(0), lit(1), lit(2))).as("j"), col("_ni"))
        .select(col("src"), ((col("src") * 7 + col("j") * 13 + 1) % col("_ni")).as("dst"))
        .filter(col("dst") =!= col("src"))
      graft.ext.Graphs.pageRank(base, edges, "doc_id", iters = 3)
        .orderBy(col("doc_id"))
    },
    Some {
      val rounds = (1 to 3).map { i =>
        val p = i - 1
        s"""c$i AS (SELECT e.dst, sum(round((r$p.rank / deg.deg) * 1048576.0) / 1048576.0) AS m
             FROM e JOIN r$p ON e.src = r$p.id JOIN deg ON e.src = deg.src GROUP BY 1),
      r$i AS (SELECT d.doc_id AS id,
               round(((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n + 0.85 * COALESCE(c$i.m, 0.0)) * 1048576.0) / 1048576.0 AS rank
             FROM documents d CROSS JOIN nn LEFT JOIN c$i ON d.doc_id = c$i.dst)"""
      }.mkString(",\n      ")
      s"""
      WITH nn AS (SELECT CAST(count(*) AS DOUBLE) AS n, count(*) AS ni FROM documents),
      e AS (SELECT d.doc_id AS src, (d.doc_id * 7 + j.j * 13 + 1) % nn.ni AS dst
            FROM documents d CROSS JOIN nn CROSS JOIN (VALUES (0), (1), (2)) j(j)
            WHERE (d.doc_id * 7 + j.j * 13 + 1) % nn.ni <> d.doc_id),
      deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM e GROUP BY 1),
      r0 AS (SELECT doc_id AS id, round((1.0 / nn.n) * 1048576.0) / 1048576.0 AS rank
             FROM documents CROSS JOIN nn),
      $rounds
      SELECT id AS doc_id, rank FROM r3 ORDER BY doc_id
    """
    },
    // per round: edge-keyed join + partial agg + node left join — j2/x3
    // time the shapes; compact-line headroom
    benchmark = false)

  /** X28 — COMPLETE damped PageRank ([[graft.ext.Graphs.pageRankFull]]):
    * x25's graph minus every out-edge of nodes ≡ 0 (mod 5), which makes
    * those nodes DANGLING (in-links, no out-links). Their per-round rank
    * mass redistributes uniformly instead of decaying — the classic
    * formulation; total mass is conserved to grid rounding. The oracle
    * unrolls the same rounds with the dangling-mass CTE in the exact IEEE
    * order (dm summed exactly, ONE snap of dm/N, added inside the damped
    * term) — any drift in the redistribution arithmetic flips ranks.
    */
  val x28LinkRankFull = QueryDef(
    "x28_link_rank_full",
    (s, dir) => {
      val base = Td(s, dir, "documents").select(col("doc_id"))
      val n1 = base.agg(count(lit(1)).as("_ni"))
      val edges = base.crossJoin(broadcast(n1))
        .select(col("doc_id").as("src"),
          explode(array(lit(0), lit(1), lit(2))).as("j"), col("_ni"))
        .select(col("src"), ((col("src") * 7 + col("j") * 13 + 1) % col("_ni")).as("dst"))
        .filter(col("dst") =!= col("src"))
        .filter(col("src") % 5 =!= 0) // ≡0 (mod 5) → dangling
      graft.ext.Graphs.pageRankFull(base, edges, "doc_id", iters = 3)
        .orderBy(col("doc_id"))
    },
    Some {
      val rounds = (1 to 3).map { i =>
        val p = i - 1
        s"""dm$i AS (SELECT round(((SELECT coalesce(sum(r.rank), 0.0)
                 FROM r$p r LEFT JOIN deg d ON r.id = d.src
                 WHERE d.src IS NULL) / nn.n) * 1048576.0) / 1048576.0 AS dmn
             FROM nn),
      c$i AS (SELECT e.dst, sum(round((r$p.rank / deg.deg) * 1048576.0) / 1048576.0) AS m
             FROM e JOIN r$p ON e.src = r$p.id JOIN deg ON e.src = deg.src GROUP BY 1),
      r$i AS (SELECT d.doc_id AS id,
               round(((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
                 + 0.85 * (COALESCE(c$i.m, 0.0) + dm$i.dmn)) * 1048576.0) / 1048576.0 AS rank
             FROM documents d CROSS JOIN nn CROSS JOIN dm$i
             LEFT JOIN c$i ON d.doc_id = c$i.dst)"""
      }.mkString(",\n      ")
      s"""
      WITH nn AS (SELECT CAST(count(*) AS DOUBLE) AS n, count(*) AS ni FROM documents),
      e AS (SELECT d.doc_id AS src, (d.doc_id * 7 + j.j * 13 + 1) % nn.ni AS dst
            FROM documents d CROSS JOIN nn CROSS JOIN (VALUES (0), (1), (2)) j(j)
            WHERE (d.doc_id * 7 + j.j * 13 + 1) % nn.ni <> d.doc_id
              AND d.doc_id % 5 <> 0),
      deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM e GROUP BY 1),
      r0 AS (SELECT doc_id AS id, round((1.0 / nn.n) * 1048576.0) / 1048576.0 AS rank
             FROM documents CROSS JOIN nn),
      $rounds
      SELECT id AS doc_id, rank FROM r3 ORDER BY doc_id
    """
    },
    // same exchange shapes as x25 plus a 1-row dangling aggregate —
    // compact-line headroom
    benchmark = false)

  /** X29 — fill-in-the-middle transform ([[graft.ext.Packing
    * .fimTransform]]): a deterministic quarter of the corpus (sample
    * bucket ≡ 0 mod 4) rewrites to `<PRE> prefix <SUF> suffix <MID>
    * middle` with md5-drawn token cut points — the code-model infilling
    * prep. The oracle replays the selection, both draws, the ordered
    * cuts, and the PSM assembly; any drift in slicing boundaries or
    * segment order flips the per-doc digest.
    */
  val x29Fim = QueryDef(
    "x29_fim",
    (s, dir) => {
      graft.ext.Packing.fimTransform(
          Td(s, dir, "documents").select(col("doc_id"), col("text")),
          "doc_id", "text", rateMod = 4)
        .select(col("doc_id"), col("fim"),
          col("n_prefix"), col("n_middle"), col("n_suffix"),
          md5(col("out_text")).as("out_md5"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH w AS (SELECT doc_id, text,
               regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      d AS (SELECT doc_id, text, ws, len(ws) AS n,
              ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'fim1'), 1, 6))::BIGINT
                % (len(ws) + 1) AS h1,
              ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'fim2'), 1, 6))::BIGINT
                % (len(ws) + 1) AS h2,
              ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT % 4 AS b4
            FROM w),
      c AS (SELECT doc_id, text, ws, n, least(h1, h2) AS c1, greatest(h1, h2) AS c2,
              (b4 = 0) AS isfim FROM d)
      SELECT doc_id, CAST(isfim AS INT) AS fim,
             CAST(CASE WHEN isfim THEN c1 ELSE 0 END AS BIGINT) AS n_prefix,
             CAST(CASE WHEN isfim THEN c2 - c1 ELSE n END AS BIGINT) AS n_middle,
             CAST(CASE WHEN isfim THEN n - c2 ELSE 0 END AS BIGINT) AS n_suffix,
             md5(CASE WHEN isfim THEN
               '<PRE> ' || coalesce(array_to_string(ws[1:c1], ' '), '') ||
               ' <SUF> ' || coalesce(array_to_string(ws[c2+1:n], ' '), '') ||
               ' <MID> ' || coalesce(array_to_string(ws[c1+1:c2], ' '), '')
               ELSE text END) AS out_md5
      FROM c ORDER BY doc_id
    """),
    // pure per-row map work riding the scan — t9 times the shape
    benchmark = false)

  /** X30 — length-bucketed inference batching
    * ([[graft.ext.Packing.lengthBatches]]): per source, docs sorted by
    * (token count, id) and cut into 32-doc batches; per batch the padding
    * efficiency Σlen/(max·n) is reported — the number an inference fleet
    * watches (sorted batching pushes it toward 1). Exact integer stats +
    * one engine-identical double division; the oracle replays the total
    * (length, id) sort, so an off-by-one in the batch cut or a tie-order
    * drift flips rows.
    */
  val x30LengthBatches = QueryDef(
    "x30_length_batches",
    (s, dir) => {
      val docs = Td(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TA.tokenCount(col("text")).cast("long").as("n_tok"))
      graft.ext.Packing.lengthBatches(docs, "doc_id", "n_tok", Seq("source"), 32)
        .groupBy(col("source"), col("batch_id"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          max(col("n_tok")).as("max_len"),
          sum(col("n_tok")).as("sum_len"),
          (sum(col("n_tok")).cast("double") /
            (max(col("n_tok")) * count(lit(1))).cast("double")).as("pad_eff"))
        .orderBy(col("source"), col("batch_id"))
    },
    Some("""
      WITH d AS (SELECT doc_id, source,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
             FROM documents),
      r AS (SELECT doc_id, source, n_tok,
              (row_number() OVER (PARTITION BY source ORDER BY n_tok, doc_id) - 1) // 32
                AS batch_id
            FROM d)
      SELECT source, batch_id,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(max(n_tok) AS BIGINT) AS max_len,
             CAST(sum(n_tok) AS BIGINT) AS sum_len,
             CAST(sum(n_tok) AS DOUBLE) / CAST(max(n_tok) * count(*) AS DOUBLE) AS pad_eff
      FROM r GROUP BY 1, 2 ORDER BY 1, 2
    """),
    // shard exchange + per-shard sort window — w1/x24 time the shape
    benchmark = false)

  /** X31 — embedding standardization statistics
    * ([[graft.ext.Similarity.dimStats]]): per dimension, exact
    * micro-quantized moments (the e4 pattern on the dimension axis) plus
    * the |z| > 2 outlier count — the calibration pass behind
    * [[graft.ext.Similarity.standardize]]'s whitening-lite transform.
    * μ/σ/z replay in the oracle with the identical expression tree; any
    * drift in quantization, the σ clamp, or the z threshold flips counts.
    */
  val x31EmbedStandardize = QueryDef(
    "x31_embed_standardize",
    (s, dir) => {
      val emb = Td(s, dir, "embeddings")
      val ex = emb.select(posexplode(col("embedding")).as(Seq("dim", "_x")))
        .select(col("dim"), round(col("_x").cast("double") * 1e6).as("_xm"))
      val ms = graft.ext.Similarity.dimStats(emb, "embedding")
      ex.join(broadcast(ms), Seq("dim"))
        .groupBy(col("dim"))
        .agg(
          min(col("n_vals")).as("n_vals"),
          min(col("mu_micros")).as("mu_micros"),
          min(col("sigma_micros")).as("sigma_micros"),
          sum(when(col("sigma_micros") > 0 &&
            abs((col("_xm") - col("mu_micros")) / col("sigma_micros")) > 2,
            1L).otherwise(0L)).cast("long").as("n_outliers"))
        .orderBy(col("dim"))
    },
    Some("""
      WITH ex AS (SELECT CAST(dim - 1 AS INT) AS dim, round(CAST(x AS DOUBLE) * 1e6) AS xm
             FROM (SELECT unnest(embedding) AS x,
                     unnest(generate_series(1, len(embedding))) AS dim
                   FROM embeddings)),
      st AS (SELECT dim, count(*) AS n,
               sum(CAST(xm AS DECIMAL(18,0))) AS s1,
               sum(CAST(CAST(xm AS DECIMAL(18,0)) * CAST(xm AS DECIMAL(18,0)) AS DECIMAL(38,0))) AS s2
             FROM ex GROUP BY 1),
      ms AS (SELECT dim, n, CAST(s1 AS DOUBLE) / n AS mu,
               CASE WHEN n > 1 THEN sqrt(greatest(
                 (CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                   * (CAST(n AS DOUBLE) / (n - 1)), 0.0)) ELSE 0.0 END AS sg
             FROM st)
      SELECT ex.dim,
             CAST(min(ms.n) AS BIGINT) AS n_vals,
             min(ms.mu) AS mu_micros,
             min(ms.sg) AS sigma_micros,
             CAST(sum(CASE WHEN ms.sg > 0 AND abs((ex.xm - ms.mu) / ms.sg) > 2
               THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM ex JOIN ms USING (dim)
      GROUP BY 1 ORDER BY 1
    """),
    // explode + 64-group agg + broadcast join back — e4/t5 time the shapes
    benchmark = false)

  /** X32 — T5-style span corruption ([[graft.ext.Packing.spanCorrupt]]):
    * every 20-token block drops one md5-drawn span behind a numbered
    * sentinel; inputs and the sentinel-keyed target sequence rebuild per
    * doc. The oracle replays the chunking, both draws, the cap, the
    * empty-segment concat_ws/nullif collapse, and both ordered
    * reconstructions — any drift flips the per-doc digests.
    */
  val x32SpanCorrupt = QueryDef(
    "x32_span_corrupt",
    (s, dir) => {
      graft.ext.Packing.spanCorrupt(
          Td(s, dir, "documents").select(col("doc_id"), col("text")),
          "doc_id", "text", block = 20, maxSpan = 5)
        .select(col("doc_id"), col("n_blocks"), col("n_corrupt"),
          md5(col("input_text")).as("input_md5"),
          md5(col("target_text")).as("target_md5"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      b AS (SELECT doc_id, unnest(generate_series(0, (len(ws) - 1) // 20)) AS pos, ws FROM w),
      c AS (SELECT doc_id, pos, ws[pos*20+1 : pos*20+20] AS tb FROM b),
      d AS (SELECT doc_id, pos, tb, len(tb) AS bs,
              ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'scl' || CAST(pos AS VARCHAR)), 1, 6))::BIGINT AS h1,
              ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'scs' || CAST(pos AS VARCHAR)), 1, 6))::BIGINT AS h2
            FROM c),
      e AS (SELECT doc_id, pos, tb, bs, h2, least(h1 % 5 + 1, bs) AS l FROM d),
      f AS (SELECT doc_id, pos, tb, bs, l, h2 % (bs - l + 1) AS s FROM e),
      g AS (SELECT doc_id, pos, l,
              concat_ws(' ',
                nullif(coalesce(array_to_string(tb[1:s], ' '), ''), ''),
                '<X' || CAST(pos AS VARCHAR) || '>',
                nullif(coalesce(array_to_string(tb[s+l+1:bs], ' '), ''), '')) AS inp,
              concat_ws(' ',
                '<X' || CAST(pos AS VARCHAR) || '>',
                nullif(coalesce(array_to_string(tb[s+1:s+l], ' '), ''), '')) AS tgt
            FROM f)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
             CAST(sum(l) AS BIGINT) AS n_corrupt,
             md5(string_agg(inp, ' ' ORDER BY pos)) AS input_md5,
             md5(string_agg(tgt, ' ' ORDER BY pos)) AS target_md5
      FROM g GROUP BY 1 ORDER BY 1
    """),
    // chunk explode + per-doc regroup — d15/x19 time the shapes
    benchmark = false)

  /** X33 — curation gate ATTRITION funnel: the pipeline-observability
    * report behind every c1-style curation run — per gate (Gopher format
    * rules → language → PII-free → exact-dedup representative), how many
    * documents entered, survived, and what fraction dropped, with the
    * gates applied CUMULATIVELY in pipeline order (each stage's n_in is
    * the previous stage's n_out — the funnel shape, e3's idea applied to
    * the curation pipeline itself). Stage 1 is a token-length floor
    * rather than the full Gopher battery (t11): the synthetic vocabulary
    * carries one required stopword, so Gopher's ≥2-stopword floor drops
    * the whole corpus and every later stage would read 0 — a length gate
    * keeps each stage's attrition observable while the machinery (flag
    * conjunction, funnel recursion) stays identical. One corpus scan computes every flag,
    * one digest groupBy resolves dedup winners, a single aggregation
    * yields all four rows — no per-stage re-scan.
    */
  val x33GateAttrition = QueryDef(
    "x33_gate_attrition",
    (s, dir) => {
      val docs = Td(s, dir, "documents")
      val winners = docs.groupBy(md5(col("text")).as("_h"))
        .agg(min(col("doc_id")).as("_rep"))
      val flags = docs
        .join(winners, md5(col("text")) === col("_h"))
        .select(
          (TA.tokenCount(col("text")) >= 30).cast("long").as("f1"),
          (TA.langId(col("text")) === "en").cast("long").as("f2"),
          (TA.piiEmailCount(col("text")) === 0).cast("long").as("f3"),
          (col("doc_id") === col("_rep")).cast("long").as("f4"))
      val agg = flags.agg(
        count(lit(1)).cast("long").as("n0"),
        sum(col("f1")).cast("long").as("n1"),
        sum(col("f1") * col("f2")).cast("long").as("n2"),
        sum(col("f1") * col("f2") * col("f3")).cast("long").as("n3"),
        sum(col("f1") * col("f2") * col("f3") * col("f4")).cast("long").as("n4"))
      agg.selectExpr(
          """stack(4,
             0, 'min_len', n0, n1,
             1, 'lang_en', n1, n2,
             2, 'pii_free', n2, n3,
             3, 'dedup_rep', n3, n4) AS (stage_idx, stage, n_in, n_out)""")
        .select(col("stage_idx").cast("int").as("stage_idx"), col("stage"),
          col("n_in"), col("n_out"),
          ((col("n_in") - col("n_out")).cast("double") /
            greatest(col("n_in"), lit(1L)).cast("double")).as("drop_frac"))
        .orderBy(col("stage_idx"))
    },
    Some {
      val langEn = {
        // mirror TextAnalysis.langId == 'en': en markers strictly beat
        // every other language's marker count (ties at the max go to the
        // EARLIER language in LangMarkers order — en is first, so en wins
        // ties it participates in; en also needs count > 0)
        def cnt(ms: Seq[String]) = {
          val lst = ms.map(m => s"'$m'").mkString("[", ", ", "]")
          s"len(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> list_contains($lst, t)))"
        }
        val en = cnt(graft.ext.TextAnalysis.LangMarkers.head._2)
        val others = graft.ext.TextAnalysis.LangMarkers.tail
          .map { case (_, ms) => cnt(ms) }
        s"($en > 0 AND ${others.map(o => s"$en >= $o").mkString(" AND ")})"
      }
      s"""
      WITH reps AS (SELECT md5(text) AS h, min(doc_id) AS rep FROM documents GROUP BY 1),
      f AS (SELECT
              CAST(len(regexp_split_to_array(trim(text), '\\s+')) >= 30 AS INT) AS f1,
              CAST($langEn AS INT) AS f2,
              CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) = 0 AS INT) AS f3,
              CAST(d.doc_id = r.rep AS INT) AS f4
            FROM documents d JOIN reps r ON md5(d.text) = r.h),
      a AS (SELECT count(*) AS n0, sum(f1) AS n1, sum(f1*f2) AS n2,
              sum(f1*f2*f3) AS n3, sum(f1*f2*f3*f4) AS n4 FROM f),
      st(stage_idx, stage) AS (VALUES (0, 'min_len'), (1, 'lang_en'), (2, 'pii_free'), (3, 'dedup_rep'))
      SELECT st.stage_idx, st.stage,
             CAST(CASE st.stage_idx WHEN 0 THEN a.n0 WHEN 1 THEN a.n1 WHEN 2 THEN a.n2 ELSE a.n3 END AS BIGINT) AS n_in,
             CAST(CASE st.stage_idx WHEN 0 THEN a.n1 WHEN 1 THEN a.n2 WHEN 2 THEN a.n3 ELSE a.n4 END AS BIGINT) AS n_out,
             CAST((CASE st.stage_idx WHEN 0 THEN a.n0 WHEN 1 THEN a.n1 WHEN 2 THEN a.n2 ELSE a.n3 END)
               - (CASE st.stage_idx WHEN 0 THEN a.n1 WHEN 1 THEN a.n2 WHEN 2 THEN a.n3 ELSE a.n4 END) AS DOUBLE)
               / CAST(greatest(CASE st.stage_idx WHEN 0 THEN a.n0 WHEN 1 THEN a.n1 WHEN 2 THEN a.n2 ELSE a.n3 END, 1) AS DOUBLE) AS drop_frac
      FROM st CROSS JOIN a ORDER BY st.stage_idx
    """
    },
    // one scan + digest agg + 1-row funnel — q2/x20 time the shapes
    benchmark = false)

  /** X34 — takedown cascade against the durable dedup index
    * ([[graft.tables.Deletes.cascade]] → [[DedupIndex.deleteIds]]): build
    * the index over the full corpus, delete a deterministic ~1/5 md5-bucket
    * slice of doc ids through the cascade, then dump the surviving index
    * content per doc — size row, shingle rows (count + order-free digest),
    * and all three band buckets. The oracle REBUILDS the index from
    * scratch over the survivors: hash-equality proves the delete leaves
    * exactly the index a survivors-only build produces (per-doc rows are
    * doc-local, so anti-join deletion must be lossless AND residue-free in
    * all three tables), while the engine-side path never re-shingles a
    * survivor — deleteIds takes no text input, by construction.
    */
  val x34DeleteCascade = QueryDef(
    "x34_delete_cascade",
    (s, dir) => {
      val docs = Td(s, dir, "documents").select(col("doc_id"), col("text"))
      val store = graft.tables.Scratch.store(s)
      DedupIndex.build(store, "x34_idx", docs, "doc_id", "text",
        n = 3, k = 12, bands = 3)
      val deleted = docs
        .filter(Similarity.sampleBucket(col("doc_id")) % 5 === 0)
        .select(col("doc_id"))
      graft.tables.Deletes.cascade(store, deleted, "doc_id",
        indexes = Seq("x34_idx"))
      val shAgg = DedupIndex.shinglesOf(store, "x34_idx", "doc_id")
        .groupBy(col("doc_id")).agg(
          count(lit(1)).cast("long").as("n_rows"),
          md5(concat_ws("|", array_sort(collect_list(col("shingle"))))).as("sh_md5"))
      val bands = DedupIndex.bandsOf(store, "x34_idx")
        .groupBy(col("doc_id")).agg(
          min(when(col("band") === 0, col("bucket"))).as("b0"),
          min(when(col("band") === 1, col("bucket"))).as("b1"),
          min(when(col("band") === 2, col("bucket"))).as("b2"))
      DedupIndex.sizesOf(store, "x34_idx")
        .join(shAgg, Seq("doc_id")).join(bands, Seq("doc_id"))
        .select(col("doc_id"), col("n_sh").cast("long").as("n_sh"),
          col("n_rows"), col("sh_md5"), col("b0"), col("b1"), col("b2"))
        .orderBy(col("doc_id"))
    },
    Some {
      val sigs = (0 until 12).map(i => s"min(md5('$i:' || shingle)) AS h$i").mkString(", ")
      def bkt(b: Int) = (0 until 4).map(r => s"h${b * 4 + r}").mkString(" || '|' || ")
      s"""
      WITH corpus AS (SELECT doc_id, text FROM documents
                      WHERE NOT (${sampleFilterSql("doc_id", 5)})),
      w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM corpus),
      sh AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(ws) >= 3
                 THEN list_transform(generate_series(1, len(ws)-2), i -> array_to_string(ws[i:i+2], ' '))
                 ELSE [array_to_string(ws, ' ')] END)) AS shingle FROM w),
      sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
      agg AS (SELECT doc_id, count(*) AS n_rows,
                md5(array_to_string(list(shingle ORDER BY shingle), '|')) AS sh_md5
              FROM sh GROUP BY 1),
      sig AS (SELECT doc_id, $sigs FROM sh GROUP BY doc_id),
      eb AS (SELECT doc_id, md5(${bkt(0)}) AS b0, md5(${bkt(1)}) AS b1,
                    md5(${bkt(2)}) AS b2 FROM sig)
      SELECT s.doc_id, CAST(s.n_sh AS BIGINT) AS n_sh,
             CAST(a.n_rows AS BIGINT) AS n_rows, a.sh_md5, e.b0, e.b1, e.b2
      FROM sz s JOIN agg a USING (doc_id) JOIN eb e USING (doc_id)
      ORDER BY s.doc_id
    """
    },
    // the timing is dominated by the index BUILD, which d10 already
    // benches; the delete leg itself is index-table anti-joins measured in
    // the ScaleStress sweep
    benchmark = false)

  /** X35 — versioned time-travel diff ([[graft.tables.Versions.diff]]):
    * two planted versions of a snapshot table (v2 removes the %7 ids,
    * bumps the %5 survivors' token count, and appends fresh %11-derived
    * ids), then the row-level drill-down between them. The oracle derives
    * each id's expected status independently from the plant rules —
    * added / removed / changed / unchanged must each surface exactly, so
    * a digest drift, a join-side swap, or a pruned-version misread all
    * flip rows.
    */
  val x35VersionDiff = QueryDef(
    "x35_version_diff",
    (s, dir) => {
      import graft.tables.Versions
      val docs = Td(s, dir, "documents").select(col("doc_id"),
        TA.tokenCount(col("text")).cast("long").as("n_tok"), col("source"))
      val store = graft.tables.Scratch.store(s)
      // version numbering restarts at 1 so a re-run stays self-contained
      Versions.drop(store, "x35_t")
      Versions.overwrite(store, "x35_t", docs)
      val v2 = docs.filter(col("doc_id") % 7 =!= 0)
        .withColumn("n_tok", when(col("doc_id") % 5 === 0,
          col("n_tok") + 1000L).otherwise(col("n_tok")))
        .unionByName(docs.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 100000000L).as("doc_id"),
            col("n_tok"), col("source")))
      Versions.overwrite(store, "x35_t", v2)
      Versions.diff(store, "x35_t", 1L, 2L, "doc_id").orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN 'removed'
                  WHEN doc_id % 5 = 0 THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM documents
      UNION ALL
      SELECT doc_id + 100000000 AS doc_id, 'added' AS status
      FROM documents WHERE doc_id % 11 = 0
      ORDER BY doc_id
    """),
    // two snapshot writes dominate; x16_snapshot_diff times the
    // digest-diff shape on the live path
    benchmark = false)

  val all: Seq[QueryDef] = Seq(
    t1TextTokens, t2TextQuality, t3LangId, t4Fingerprint, t5Tfidf, t6Repetition,
    t7PiiRedact, t8LmPerplexity, t9TextNormalize, t10ScriptDetect, t11GopherRules,
    t12GopherRepetition, t13HtmlExtract, t14ClassifierScore, t15ClassifierWeighted,
    t16BpeEncode, t17LmScored, t18BpeTrain, t19BpePipeline, t20ByteBpe,
    t21ByteBpeTrain, t22ByteBpeIds, t23Gpt2Tokenizer, t26BpeRoundTrip,
    t27ParagraphLangmix, t24LmBackoff,
    t25NbClassifier, x36PackSequences, x37Dml,
    x38TokenizerFertility,
    d15ParagraphDedup, d16ParagraphSplit, d18DedupWithinDoc, d21SemDedup, x24TokenBudget,
    x25LinkRank, x26TrainSplit, x27QuantileNorm, x28LinkRankFull, x29Fim,
    x30LengthBatches, x31EmbedStandardize, x32SpanCorrupt, x33GateAttrition,
    x34DeleteCascade, x35VersionDiff, x39Bm25Takedown, x40Bm25Append,
    s15AnnSearch, s16AnnRefine,
    d1DedupExact, d2DedupNgram, d3DedupMinhash, d4DedupSimhash, d5DedupEmbed,
    d6DedupEmbedIvf, d7DedupHotbucket, d8DedupIncremental, d9DedupEmbedLsh,
    d10DedupIndexReuse, d11DedupIvfMultiprobe, d12Contamination, d13DedupIndexDigest,
    d14DedupChargram, d17DedupIndexBucketed, d19DedupContainment, d20SpanDedup,
    d22SpanExact, d23SpanGuaranteed,
    s1KnnBrute, s2AnnIvf, s3KnnQuantized, s5KnnPq, s6AnnIvfPq, s13AnnIvfPqResidual,
    s17AnnBudgeted, s18AnnSelfPairs, s19AnnBudgetRefine,
    s14AnnIndexIncremental, s7HardNegatives, x20CorpusReport,
    m1MediaMeta, m2FrameSample, m3VideoMeta, m4ImageDedup, m5AudioDedup,
    m6VideoFrames, m7VideoDedup, m8VideoDedupUnordered, m9AudioDedupOffset,
    c1Curation, c2CurationRecipe, c3Decontaminate, c4DecontaminateBloom,
    c7SemanticDecon, c8SemanticDeconIndexed, c9SemanticDeconCalibrated,
    c10EvalLeakReport, c11LexicalLeakReport,
    c5NormalizedCuration, c6CrawlPipeline,
    u1UrlNormalize, u2UrlDedup, q4Expectations,
    x1HllDistinct, x2KmeansIvf,
    x3DedupGroups, x5KmeansSample, x6DedupGroupsConv, x7StratifiedSample, x9CmsHeavyHitters,
    x12TemperatureMix, x13CurriculumTiles, x14DomainQuota, x15SourceOverlap,
    x16SnapshotDiff, x17EmbedQuantize, x18ShardShuffle, x19ChunkWindows, x23CorpusFingerprint,
    x11DedupRepresentative,
    x10SequencePack, x21TrainingPrep, s9Bm25, s20Bm25Capped, s10HybridRrf,
    s11PqRecall, s12PqMrr)
}
