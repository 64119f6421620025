package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation.
  *
  * Data mixing — downsampling over-represented strata (a language, a crawl
  * source) to a target recipe — is a core corpus-building op at 100 TB. The
  * usual `df.sample(fraction)` is RNG-seeded per partition: results change
  * with partitioning and reruns, which breaks replayable pipelines and
  * cross-engine verification. These operators sample by md5 bucket of the
  * row id ([[Similarity.sampleBucket]]): content-independent,
  * partitioning-independent, replayable bit-for-bit in any engine with md5
  * — pure per-row map work, no shuffle, no state.
  */
object Sampling {

  /** Keep ~1/m of rows, deterministically: md5-bucket(id) % m == 0. */
  def uniform(df: DataFrame, idCol: String, m: Int): DataFrame = {
    // m=0 would make `bucket % 0` NULL in Spark (silently dropping every
    // row) while the oracle engines error on modulo-by-zero
    require(m >= 1, s"sampling rate must be >= 1, got $m")
    df.filter(Similarity.sampleBucket(col(idCol)) % m === 0)
  }

  /** Per-stratum sampling rate as a Column: rows whose `strataCol` matches
    * a key of `rates` keep ~1/rate, everything else ~1/defaultRate.
    * `rates` is ordered (first match wins) so the expression is
    * deterministic and replayable as a SQL CASE.
    */
  def strataRate(strataCol: Column, rates: Seq[(String, Int)], defaultRate: Int): Column = {
    // any 0 rate → `% 0` → NULL in Spark (rows silently dropped) vs an
    // error in the oracle — reject the invalid recipe up front
    require(defaultRate >= 1, s"default sampling rate must be >= 1, got $defaultRate")
    rates.foreach { case (k, m) =>
      require(m >= 1, s"sampling rate for stratum '$k' must be >= 1, got $m")
    }
    rates.foldRight(lit(defaultRate): Column) { case ((k, m), acc) =>
      when(strataCol === k, lit(m)).otherwise(acc)
    }
  }

  /** Stratified deterministic sample: per-stratum keep rates (data-mixing
    * recipe), md5-bucket membership. One codegen'd filter over the scan —
    * the 100 TB shape: no shuffle, no per-stratum pass, no RNG.
    */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
      rates: Seq[(String, Int)], defaultRate: Int): DataFrame =
    df.filter(
      Similarity.sampleBucket(col(idCol)) % strataRate(col(strataCol), rates, defaultRate) === 0)

  /** Temperature-weighted mixture sampling — [[stratified]]'s recipe derived
    * from the DATA instead of hand-written: rebalance strata (languages,
    * domains, crawl sources) toward counts ∝ c^alpha, the standard
    * temperature flattening of multilingual/multi-source corpora. Pure
    * downsampling realization: stratum g keeps fraction
    *
    *   f_g = (c_g / c_min)^(alpha-1)   (alpha in (0,1]; alpha=1 ≡ keep all)
    *
    * so the rarest stratum keeps everything, over-represented strata shed
    * rows, and kept counts are ∝ c_g^alpha exactly. Membership is the same
    * deterministic md5 bucket as every sampler here; keep fractions are
    * quantized to the bucket resolution k_g/256 (floored, min 1/256 so no
    * stratum ever vanishes) — which also makes the accept test an INT
    * comparison, immune to cross-engine `pow` last-ulp drift.
    *
    * Scale shape: pass 1 is a map-side-combined count (shuffles |strata|
    * rows); pass 2 broadcast-joins the tiny rate table and filters inside
    * the scan's codegen. No global sort, no skew sensitivity: the recipe
    * table is a handful of rows regardless of data size.
    */
  def temperatureMix(df: DataFrame, idCol: String, strataCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("_n"))
    val nmin = counts.agg(min(col("_n")).as("_nmin"))
    val rates = counts.crossJoin(broadcast(nmin))
      .select(col(strataCol),
        greatest(lit(1), least(lit(256),
          floor(pow(col("_n").cast("double") / col("_nmin"), alpha - 1.0) * 256)
            .cast("int"))).as("_k"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(Similarity.sampleBucket(col(idCol)) < col("_k"))
      .drop("_k")
  }

  /** Deterministic global shuffle into training shards: every row gets a
    * `shard` (md5-keyed, seed-parameterized) and a dense 1-based `pos`
    * within its shard, ordered by the same md5 key. This is the "shuffle
    * the corpus once, then stream shards sequentially" step every training
    * run needs — and doing it with an RNG (`orderBy(rand())`) is both
    * non-replayable and a single global sort. Here the order is a pure
    * function of (seed, id): re-running, re-partitioning, or re-sharding
    * with the same seed reproduces the exact byte order, and changing the
    * seed is a fresh epoch-level permutation.
    *
    * Scale shape: one hash-partitioned exchange into `nShards` groups plus
    * a per-shard sort — no global ordering anywhere. At 100 TB pick
    * nShards = corpusBytes / targetShardBytes (thousands), so each shard is
    * one task's sort and shards write out as independent files. The md5
    * key is uniform, so shards are balanced regardless of id clustering or
    * data skew; the 4-hex-digit prefix (16 bits) that picks the shard caps
    * nShards at 65536, plenty ahead of per-shard sizing.
    */
  def shardShuffle(df: DataFrame, idCol: String, nShards: Int, seed: String): DataFrame = {
    require(nShards >= 1 && nShards <= 65536,
      s"nShards must be in [1, 65536], got $nShards")
    val key = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    val byShard = Window.partitionBy(col("shard")).orderBy(col("_key"), col(idCol))
    df.withColumn("_key", key)
      .withColumn("shard", (conv(substring(col("_key"), 1, 4), 16, 10).cast("int") % nShards))
      .withColumn("pos", row_number().over(byShard).cast("long"))
      .drop("_key")
  }
}
