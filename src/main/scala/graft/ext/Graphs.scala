package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph operators over id-keyed tables — the link-centrality family of
  * crawl-quality signals (a page endorsed by many well-endorsed pages is
  * worth more training mass than an orphan).
  *
  * Determinism contract: every per-edge contribution and every updated
  * rank snaps to the 2^-20 grid ([[snap]]). Grid multiples below 2^33 sum
  * EXACTLY in a 53-bit double, so aggregation ORDER cannot change a sum —
  * the same convention that makes the quantized k-means (x2) replayable —
  * and a DuckDB replay of the same rounds is bit-identical.
  *
  * Scale shape (per round): one join of the rank vector to the edge list
  * on `src` (both hash-partitioned on the same key after the first
  * exchange — AQE reuses it), a partial-then-final SUM by `dst`, and a
  * left join back to the node list. Work per round is O(|E| + |V|); the
  * round count is a fixed parameter, not data-dependent. No collect, no
  * windows, no per-node loops — 100 TB of edges is just more partitions.
  */
object Graphs {

  private val Grid = 1048576.0 // 2^20

  /** Snap a double to the 2^-20 grid so sums are order-free exact. */
  def snap(c: Column): Column = round(c * Grid) / Grid

  /** Fixed-round damped PageRank over `edges(src, dst)` for the node set
    * `nodes(idCol)`. Classic update r' = (1−d)/N + d·Σ_in snap(r/outdeg),
    * run for exactly `iters` rounds from the uniform vector — the fixed
    * round count is part of the semantics (an oracle unrolls the same
    * rounds; convergence-to-tolerance would make the result depend on fp
    * stopping tests). Nodes without in-links keep the teleport mass;
    * self-loops should be filtered by the caller (they would self-endorse).
    */
  def pageRank(
      nodes: DataFrame, edges: DataFrame, idCol: String,
      iters: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"need at least one round, got $iters")
    // 1-row aggregates ride every round as a broadcast (the t5/x1 idiom)
    val n = nodes.agg(count(lit(1)).cast("double").as("_n"))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).cast("double").as("_deg"))
    val ids = nodes.select(col(idCol).as("id"))
    var ranks = ids.crossJoin(broadcast(n))
      .select(col("id"), snap(lit(1.0) / col("_n")).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(ranks, edges("src") === ranks("id"))
        .join(deg, Seq("src"))
        .select(col("dst"), snap(col("rank") / col("_deg")).as("_c"))
        .groupBy(col("dst")).agg(sum(col("_c")).as("_m"))
      ranks = ids.crossJoin(broadcast(n))
        .join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          // the teleport constant is the IEEE-folded 1.0 − damping
          // (0.15000000000000002 at d = 0.85) — a replay must subtract in
          // DOUBLE too, not in decimal (where 1.0 − 0.85 is exactly 0.15,
          // one ulp away: enough to flip a grid cell at a round midpoint)
          snap(lit(1.0 - damping) / col("_n") +
            lit(damping) * coalesce(col("_m"), lit(0.0))).as("rank"))
    }
    ranks.select(col("id").as(idCol), col("rank"))
  }
}
