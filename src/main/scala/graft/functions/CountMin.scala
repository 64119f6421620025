package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Count-Min sketch: fixed-size frequency estimation for
  * heavy-hitter / boilerplate detection over unbounded key domains — the
  * counts sibling of the HLL distinct sketch (x1) and the grid quantile
  * sketch (f9).
  *
  * `d` hash rows × `w` buckets of exact integer counters.
  * `bucket(i, key) = int(first 4 md5 hex digits of "i:" + key) mod w`;
  * estimate(key) = min over rows of the key's bucket counter. Collisions
  * only ADD counts, so the estimate never underestimates, and the error is
  * bounded by the colliding mass (≈ 2N/w with probability 1 − 2^−d, the
  * standard CM bound).
  *
  * Everything is md5 + integer arithmetic (no engine-private hash, no
  * floats), so a DuckDB replay of the same construction is bit-identical —
  * the cross-engine-exact sketch pattern of x1_hll_distinct. At 100 TB the
  * sketch table is d×w rows regardless of corpus size, built in ONE
  * map-side-combined aggregation pass; merging shards/streams is counter
  * addition.
  */
object CountMin {

  /** Bucket of `key` in hash row `row` (both as columns). */
  def bucket(row: Column, key: Column, w: Int): Column =
    conv(substring(md5(concat(row.cast("string"), lit(":"), key)), 1, 4), 16, 10)
      .cast("long") % w

  /** Sketch table (row, bucket, cnt) over every occurrence of `keyCol`
    * (multiplicity counts — pre-aggregate upstream to sketch distinct
    * keys). One pass: each occurrence explodes to its d row-buckets, one
    * partial-aggregated groupBy does the rest.
    */
  def build(keys: DataFrame, keyCol: String, d: Int = 4, w: Int = 1024): DataFrame = {
    require(d >= 1 && w >= 2, s"need d >= 1, w >= 2; got d=$d w=$w")
    keys
      .select(explode(array((0 until d).map(i => lit(i)): _*)).as("row"), col(keyCol))
      .select(col("row"), bucket(col("row"), col(keyCol), w).as("bucket"))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketches built with the SAME (d, w): plain counter addition —
    * build(A) ⊕ build(B) == build(A ∪ B) exactly, by linearity of the
    * bucket counts. This is how shards, partitions, or stream micro-batches
    * combine without re-reading data (CountMinSpec pins the equality).
    *
    * CALLER CONTRACT, unvalidatable here: the frames carry no (d, w) — a
    * (4, 256) sketch and a (4, 1024) sketch have identical schemas, merge
    * without error, and yield silently wrong estimates (shard-b keys were
    * bucketed mod a different w). Track each sketch's geometry alongside
    * the frame (table property, path naming) and merge only like with
    * like; a cheap post-hoc sanity probe is
    * `agg(max("row"), max("bucket"))` strictly below your (d, w).
    */
  def merge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "merge: at least one sketch required")
    sketches.reduce(_.unionByName(_))
      .groupBy("row", "bucket").agg(sum(col("cnt")).as("cnt"))
  }

  /** Point estimates for `probes` (distinct keys; other columns carried
    * through): min over the d row counters. A key the sketch never saw can
    * still read a colliding bucket — CM estimates are upper bounds, never
    * proofs of presence.
    */
  def lookup(cms: DataFrame, probes: DataFrame, keyCol: String,
      d: Int = 4, w: Int = 1024): DataFrame = {
    val carried = probes.columns.toSeq
    // internal names are _cm_-prefixed so probe columns named row/bucket/cnt
    // survive; only the prefix itself (and the output name) is reserved
    val bad = carried.filter(c => c.startsWith("_cm_") || c == "n_est")
    require(bad.isEmpty, s"lookup: reserved probe column names: $bad")
    val c = cms.select(col("row").as("_cm_row"), col("bucket").as("_cm_bucket"),
      col("cnt").as("_cm_cnt"))
    probes
      .withColumn("_cm_row", explode(array((0 until d).map(i => lit(i)): _*)))
      .withColumn("_cm_bucket", bucket(col("_cm_row"), col(keyCol), w))
      .join(c, Seq("_cm_row", "_cm_bucket"), "left")
      .groupBy(carried.map(col): _*)
      .agg(min(coalesce(col("_cm_cnt"), lit(0L))).as("n_est"))
  }
}
