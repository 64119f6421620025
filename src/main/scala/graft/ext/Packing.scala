package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the batch-assembly step of a training-data pipeline:
  * concatenate documents in a deterministic order and cut the stream into
  * fixed token-budget packs (GPT-style "concat and chunk": document
  * boundaries may straddle packs; the attention mask downstream handles
  * that). Each document is assigned the pack its first token falls in,
  * plus its offset within the pack — enough for a writer to materialize
  * the packed sequences without re-scanning.
  *
  * Pure prefix-sum form: pack_id = floor(tokens_before / budget), with
  * tokens_before a running window sum — one shuffle on the shard keys, no
  * stateful scan, deterministic for a given (keys, orderCol).
  *
  * Packing is sequential BY DEFINITION within a shard, so `keys` is
  * mandatory: shards (source, id-hash bucket, …) pack independently and in
  * parallel, and a pack never crosses a shard. A keyless global pack would
  * be one sequential scan over the corpus (and Spark's no-partition window
  * warning at scale) — refuse it rather than ship it.
  */
object Packing {

  /** Per-document pack assignment: input columns plus `pack_id` (0-based
    * within the shard) and `pack_offset` (token offset of the doc's start
    * inside its pack). `nTokCol` must be a non-negative integral token
    * count; `orderCol` must be unique within a shard for a deterministic
    * stream order.
    */
  def assign(docs: DataFrame, orderCol: String, nTokCol: String,
      keys: Seq[String], budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1 token, got $budget")
    require(keys.nonEmpty,
      "pack within explicit shard keys — a global pack is a single sequential scan")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      // fail fast on a NULL/negative count (e.g. Spark's size(NULL) = -1):
      // it would silently shift every later prefix sum in the shard; the
      // isNull filter keeps the assertion referenced so it can't be pruned
      .filter(assert_true(col(nTokCol) >= 0,
        concat(lit(s"Packing: $nTokCol must be a non-negative token count, got "),
          coalesce(col(nTokCol).cast("string"), lit("NULL")), // a NULL operand
          // would NULL the whole concat and blank the error message
          lit(s" at $orderCol="),
          coalesce(col(orderCol).cast("string"), lit("NULL")))).isNull)
      .withColumn("_pre", coalesce(sum(col(nTokCol)).over(w), lit(0L)))
      // `div`, not `/`: integer division — float division of big prefix
      // sums would round above 2^53 before the floor
      .withColumn("pack_id", expr(s"_pre div $budget"))
      .withColumn("pack_offset", col("_pre") % budget)
      .drop("_pre")
  }

  /** Materialize fixed-length TRAINING SEQUENCES from per-document
    * token-id arrays — the final artifact a pretraining loader reads:
    * within each shard, documents concatenate in `orderCol` order and the
    * id stream cuts into `budget`-length rows, documents flowing ACROSS
    * row boundaries (the GPT convention — [[assign]] keeps documents
    * whole and lets packs overflow; this splits exactly, so every row but
    * a shard's last holds precisely `budget` ids). Output: shard keys,
    * `seq_id` (0-based), `n_ids` (= budget except the tail), `ids`.
    *
    * Plan shape: one shard-keyed window (the [[assign]] prefix sum over
    * array sizes), one token explode, one (shard, seq) aggregation with
    * the ordered-struct rebuild — the explode is the materialization cost
    * itself (every token is written out), so the pass is ∝ total tokens
    * by construction; nothing is quadratic and nothing collects.
    */
  def packSequences(docs: DataFrame, orderCol: String, idsCol: String,
      keys: Seq[String], budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1 token, got $budget")
    require(keys.nonEmpty,
      "pack within explicit shard keys — a global pack is a single sequential scan")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val kc = keys.map(col)
    docs
      .withColumn("_n", size(col(idsCol)).cast("long"))
      .withColumn("_pre", coalesce(sum(col("_n")).over(w), lit(0L)))
      .select(kc :+ col("_pre") :+ posexplode(col(idsCol)).as(Seq("_i", "_id")): _*)
      .withColumn("_g", col("_pre") + col("_i"))
      // div, not /: the float quotient would round above 2^53 (see assign)
      .withColumn("seq_id", expr(s"_g div $budget"))
      .withColumn("_p", col("_g") % budget)
      .groupBy(kc :+ col("seq_id"): _*)
      .agg(count(lit(1)).cast("long").as("n_ids"),
        array_sort(collect_list(struct(col("_p"), col("_id")))).as("_s"))
      .select(kc ++ Seq(col("seq_id"), col("n_ids"),
        transform(col("_s"), s => s.getField("_id")).as("ids")): _*)
  }

  /** Fill-in-the-middle transform (Bavarian et al. 2022, "Efficient
    * Training of Language Models to Fill in the Middle") — the code-model
    * data-prep pass that rewrites a `rate`-fraction of documents into
    * PSM order so the trained model learns infilling:
    *
    *   `<PRE> prefix <SUF> suffix <MID> middle`
    *
    * Selection and cut points are md5-DERIVED, not random: a doc is
    * transformed iff its id's sample bucket ≡ 0 (mod `rateMod`) (the
    * engine-wide [[Similarity.sampleBucket]] convention — refresh-stable,
    * the same docs transform on every run), and the two token cut points
    * are independent md5 draws in [0, n] (salted `fim1`/`fim2`), ordered.
    * Token-level splits on the whitespace tokens — the published
    * character-level variant needs only a different split column.
    *
    * Output: input columns plus `fim` (1 = transformed), `n_prefix` /
    * `n_middle` / `n_suffix` token counts (untransformed rows report
    * (0, n, 0) — the whole doc is "middle"), and `out_text` (PSM form, or
    * the original text untouched).
    * Pure per-row map work — no shuffle, rides the scan at any corpus
    * size; every draw replays exactly in a SQL oracle.
    */
  /** Length-bucketed inference batching: within each shard, documents are
    * ordered by (token count, id) and cut into fixed-size batches — the
    * standard padding-waste reducer for batched inference/scoring over a
    * corpus (a batch pads every member to its longest member; sorting by
    * length makes batch members near-equal, so padding efficiency
    * Σlen/(max·n) approaches 1 instead of the ~0.5 of arrival order).
    * Deterministic: the (length, id) sort is total.
    *
    * Scale shape: one hash exchange on the shard keys + a per-shard sort
    * window — the w1/x24 pattern; a pathological mega-shard serializes its
    * own partition only, and [[graft.ext.Ranking.globalRankTiles]]'s
    * range-repartition recomposition is the drop-in fix if one shard ever
    * dominates.
    */
  def lengthBatches(docs: DataFrame, idCol: String, nTokCol: String,
      keys: Seq[String], batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(keys.nonEmpty,
      "batch within explicit shard keys — a global sort is a single sequential scan")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(nTokCol), col(idCol))
    docs.withColumn("_rn", row_number().over(w))
      .withColumn("batch_id", expr(s"(_rn - 1) div $batchSize"))
      .drop("_rn")
  }

  /** T5/UL2-style SPAN CORRUPTION (Raffel et al. 2020): the denoising
    * objective's data prep — replace spans of tokens with numbered
    * sentinels and emit the removed spans as the target sequence:
    *
    *   input:  `tok tok <X0> tok … <X1> tok`
    *   target: `<X0> dropped toks <X1> dropped toks`
    *
    * Deterministic md5-derived variant of the paper's random corruption:
    * tokens split into fixed `block`-token blocks ([[graft.ext.Paragraphs
    * .chunks]]), each block drops ONE span — length 1 + md5(id,blk) mod
    * `maxSpan` (capped at the block), start md5-drawn over the valid
    * range — giving ≈ (maxSpan+1)/2 corrupted tokens per `block` (the
    * paper's ~15% at the 20/5 defaults), refresh-stable. Sentinel number
    * = block index, so inputs and targets align by construction.
    *
    * Scale shape: one narrow chunk explode riding the scan, per-block
    * Column arithmetic (no higher-order lambdas — the chunk EXPLODE is
    * what keeps the md5 draws and slices top-level codegen'd expressions),
    * then one per-doc regroup using the ordered-struct reconstruction
    * idiom. Empty segments vanish via concat_ws-over-nullif, so no double
    * spaces anywhere.
    */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
      block: Int = 20, maxSpan: Int = 5): DataFrame = {
    require(block >= 1, s"block must be >= 1, got $block")
    require(maxSpan >= 1, s"maxSpan must be >= 1, got $maxSpan")
    val ch = Paragraphs.chunks(docs, idCol, textCol, chunkTokens = block)
    val toks = TextAnalysis.wsTokens(col("chunk"))
    val bs = size(toks)
    def draw(salt: String) =
      conv(substring(md5(concat(col(idCol).cast("string"), lit(salt),
        col("pos").cast("string"))), 1, 6), 16, 10).cast("int")
    val l = least(draw("scl") % maxSpan + 1, bs)
    val s = draw("scs") % (bs - l + 1)
    val sentinel = concat(lit("<X"), col("pos").cast("string"), lit(">"))
    def nz(c: Column) = nullif(c, lit(""))
    val inputPiece = concat_ws(" ",
      nz(array_join(slice(toks, lit(1), s), " ")),
      sentinel,
      nz(array_join(slice(toks, s + l + 1, bs - s - l), " ")))
    val targetPiece = concat_ws(" ",
      sentinel,
      nz(array_join(slice(toks, s + 1, l), " ")))
    def rebuild(c: String) = array_join(
      transform(array_sort(collect_list(struct(col("pos"), col(c)))),
        st => st.getField(c)), " ")
    ch.select(col(idCol), col("pos"),
        inputPiece.as("_in"), targetPiece.as("_tg"), l.as("_l"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("long").as("n_blocks"),
        sum(col("_l")).cast("long").as("n_corrupt"),
        rebuild("_in").as("input_text"),
        rebuild("_tg").as("target_text"))
  }

  def fimTransform(docs: DataFrame, idCol: String, textCol: String,
      rateMod: Int = 4): DataFrame = {
    require(rateMod >= 1, s"rateMod must be >= 1, got $rateMod")
    val toks = TextAnalysis.wsTokens(col(textCol))
    val n = size(toks)
    def draw(salt: String) =
      conv(substring(md5(concat(col(idCol).cast("string"), lit(salt))), 1, 6), 16, 10)
        .cast("int") % (n + 1)
    val h1 = draw("fim1")
    val h2 = draw("fim2")
    val c1 = least(h1, h2)
    val c2 = greatest(h1, h2)
    val prefix = array_join(slice(toks, lit(1), c1), " ")
    val middle = array_join(slice(toks, c1 + 1, c2 - c1), " ")
    val suffix = array_join(slice(toks, c2 + 1, n - c2), " ")
    val isFim = Similarity.sampleBucket(col(idCol)) % rateMod === 0
    docs
      .withColumn("fim", isFim.cast("int"))
      .withColumn("n_prefix", when(isFim, c1).otherwise(lit(0)).cast("long"))
      .withColumn("n_middle", when(isFim, c2 - c1).otherwise(n).cast("long"))
      .withColumn("n_suffix", when(isFim, n - c2).otherwise(lit(0)).cast("long"))
      .withColumn("out_text",
        when(isFim, concat(lit("<PRE> "), prefix, lit(" <SUF> "), suffix,
          lit(" <MID> "), middle))
          .otherwise(col(textCol)))
  }
}
