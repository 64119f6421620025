package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranking and tile (curriculum-bucket) assignment at scale.
  *
  * The naive `row_number().over(Window.orderBy(score))` collapses the whole
  * dataset into ONE task — the classic global-window trap; at 100 TB it
  * simply never finishes. The distributed shape used here is the standard
  * sort-rank decomposition:
  *
  *   1. range-repartition on (score, id) — contiguous, ordered key ranges
  *      per partition (the same machinery `orderBy` uses), skew-sampled by
  *      Spark's RangePartitioner;
  *   2. per-partition `row_number` — parallel local windows, no data moves;
  *   3. per-partition counts → cumulative offsets — a |partitions|-row
  *      aggregate, windowed and broadcast back (the only single-partition
  *      step runs over dozens of rows, not the corpus);
  *   4. `rank = offset + local_rank`, `tier = (rank-1)*T / N` in integer
  *      arithmetic (exact, engine-portable).
  *
  * The two consumers of the range exchange (the ranked rows and the count
  * aggregate) are identical subplans, so Catalyst's ReuseExchange runs the
  * shuffle ONCE. No driver collect anywhere. Rank is boundary-independent:
  * even if the sampler drew different range bounds, offsets+local ranks
  * recompose the same total order, because (score, id) is unique per row.
  *
  * Training-data use: curriculum ordering (easy→hard by a quality/length
  * score) and quantile bucketing (drop the bottom tier, oversample the top)
  * without ever materializing a global sort on one executor.
  */
object Ranking {

  /** Append `rank` (1-based, total order by (`scoreCol`, `idCol`)) and
    * `tier` (0..tiles-1, equal-count quantile buckets) to `df`.
    * `ascending = false` ranks highest score first. `idCol` must be unique
    * — it makes the order total and the result deterministic.
    */
  def globalRankTiles(df: DataFrame, scoreCol: String, idCol: String, tiles: Int,
      ascending: Boolean = true): DataFrame = {
    require(tiles >= 1, s"tiles must be >= 1, got $tiles")
    require(!df.columns.exists(Set("_pid", "_lrank", "_cnt", "_off", "_total", "rank", "tier")),
      "reserved column present: _pid/_lrank/_cnt/_off/_total/rank/tier")
    val sortCols =
      if (ascending) Seq(col(scoreCol).asc, col(idCol).asc)
      else Seq(col(scoreCol).desc, col(idCol).asc)
    val ranged = df.repartitionByRange(sortCols: _*)
      .withColumn("_pid", spark_partition_id())
    val local = ranged.withColumn("_lrank",
      row_number().over(Window.partitionBy(col("_pid")).orderBy(sortCols: _*)))
    val cnts = ranged.groupBy(col("_pid")).agg(count(lit(1)).as("_cnt"))
    val w = Window.orderBy(col("_pid"))
    val offs = cnts
      .withColumn("_off", coalesce(
        sum(col("_cnt")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_total",
        sum(col("_cnt")).over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("_pid"), col("_off"), col("_total"))
    local.join(broadcast(offs), "_pid")
      .withColumn("rank", (col("_off") + col("_lrank")).cast("long"))
      // integral `div`, not `/`: Spark's `/` is DOUBLE division, whose
      // rounding can flip floor() at large N — div is exact like DuckDB //
      .withColumn("tier", expr(s"CAST((rank - 1) * $tiles DIV _total AS INT)"))
      .drop("_pid", "_lrank", "_off", "_total")
  }

  /** Per-group top-k quota — "keep at most k docs per domain, best
    * quality first" — SKEW-ROBUST. The direct window
    * (`row_number().over(partitionBy(group).orderBy(...)) <= k`) puts an
    * entire group in one task; one hot domain (half a crawl is always a
    * handful of giants) turns that task into the stage. Two phases fix it:
    *
    *   1. salt: rank within (group, id-hash salt) — the hot group spreads
    *      over `saltBuckets` tasks; keep each bucket's local top-k (any
    *      global top-k row is necessarily in its own bucket's top-k, so no
    *      survivor is lost);
    *   2. re-rank the ≤ k·saltBuckets survivors per group and keep the
    *      true top-k. The second shuffle moves only survivors — k·buckets
    *      rows per group, independent of group size.
    *
    * Output = input columns + `grp_rank` (1..k, total order by
    * (`scoreCol` desc, `idCol` asc) — quota keeps the BEST rows, ties
    * broken deterministically by id). Result is identical to the direct
    * window; only the physical shape changes.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: String, idCol: String,
      k: Int, saltBuckets: Int = 16): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    require(!df.columns.exists(Set("_salt", "_srank", "grp_rank")),
      "reserved column present: _salt/_srank/grp_rank")
    val order = Seq(col(scoreCol).desc, col(idCol).asc)
    val salted = df.withColumn("_salt", pmod(hash(col(idCol)), lit(saltBuckets)))
      .withColumn("_srank", row_number().over(
        Window.partitionBy(col(groupCol), col("_salt")).orderBy(order: _*)))
      .filter(col("_srank") <= k)
      .drop("_salt", "_srank")
    salted.withColumn("grp_rank", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(order: _*)).cast("long"))
      .filter(col("grp_rank") <= k)
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009): combine rankings from
    * heterogeneous retrievers — lexical BM25, dense kNN — without score
    * calibration, by summing `1/(k + rank)` per list (absent → 0). Pure
    * rational arithmetic in FIXED list order, so the fused scores are
    * bit-replayable; candidate lists are already top-k-bounded, so the
    * full-outer join chain runs over |lists|·topN rows regardless of
    * corpus size — fusion is driver-scale work by construction.
    *
    * Each input must carry (`idCol`, `rnk`); ties in the fused score break
    * to the lower id.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String,
      k: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: need at least one ranking")
    val renamed = rankings.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol), col("rnk").as(s"_r$i"))
    }
    val joined = renamed.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = rankings.indices.map { i =>
      when(col(s"_r$i").isNotNull,
        lit(1.0) / (lit(k.toDouble) + col(s"_r$i").cast("double"))).otherwise(lit(0.0))
    }.reduce(_ + _)
    val w = Window.orderBy(col("rrf").desc, col(idCol))
    joined.select(col(idCol), score.as("rrf"))
      .orderBy(col("rrf").desc, col(idCol)).limit(topK)
      .withColumn("rnk", row_number().over(w))
  }
}
