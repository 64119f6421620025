package graft.ext

import org.apache.spark.sql.DataFrame
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
}
