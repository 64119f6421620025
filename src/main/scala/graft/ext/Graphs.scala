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
  * Scale shape (per round): one join of the rank vector to the staged
  * edge+degree table on `src`, a partial-then-final SUM by `dst`, and a
  * left join back to the node list. Work per round is O(|E| + |V|); the
  * round count is a fixed parameter, not data-dependent. No collect, no
  * windows, no per-node loops — 100 TB of edges is just more partitions.
  *
  * Both the edge+degree table (once) and each round's rank vector are
  * MATERIALIZED via [[graft.tables.Scratch.stage]]: round r+1 joins a
  * columnar parquet table, not a depth-r nested plan — at iters=10 on a
  * 100 TB edge list an unrolled plan would pay analyzer/optimizer time
  * quadratic in rounds and re-execute the edge-producing subplan every
  * round. The staging is semantically invisible (identical doubles), so
  * an oracle still replays the unrolled rounds.
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
    *
    * DANGLING nodes (in-links but no out-links) ABSORB rank: their rank is
    * never redistributed, so total rank mass decays by damping × (dangling
    * rank) each round — the simplified static variant this operator
    * deliberately implements (and the oracle mirrors). The classic remedy
    * — redistribute the dangling mass uniformly each round — needs one
    * extra 1-row aggregate per round; add it only with a matching oracle,
    * since it changes every rank.
    */
  def pageRank(
      nodes: DataFrame, edges: DataFrame, idCol: String,
      iters: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"need at least one round, got $iters")
    // 1-row aggregate rides every round as a broadcast (the t5/x1 idiom)
    val n = nodes.agg(count(lit(1)).cast("double").as("_n"))
    val ids = nodes.select(col(idCol).as("id"))
    // Stage the edge list ONCE with each source's out-degree attached:
    // every round then scans columnar parquet instead of re-executing the
    // (possibly expensive) edge-producing plan and its degree shuffle.
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).cast("double").as("_deg"))
    val edgesDeg = graft.tables.Scratch.stage(
      edges.join(deg, Seq("src")).select(col("src"), col("dst"), col("_deg")),
      "pagerank_edges")
    var ranks = ids.crossJoin(broadcast(n))
      .select(col("id"), snap(lit(1.0) / col("_n")).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = edgesDeg
        .join(ranks, edgesDeg("src") === ranks("id"))
        .select(col("dst"), snap(col("rank") / col("_deg")).as("_c"))
        .groupBy(col("dst")).agg(sum(col("_c")).as("_m"))
      val next = ids.crossJoin(broadcast(n))
        .join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          // the teleport constant is the IEEE-folded 1.0 − damping
          // (0.15000000000000002 at d = 0.85) — a replay must subtract in
          // DOUBLE too, not in decimal (where 1.0 − 0.85 is exactly 0.15,
          // one ulp away: enough to flip a grid cell at a round midpoint)
          snap(lit(1.0 - damping) / col("_n") +
            lit(damping) * coalesce(col("_m"), lit(0.0))).as("rank"))
      // Stage each round's |V|-row rank vector: the next round (and the
      // caller) joins a materialized table, not a depth-r nested plan.
      ranks = graft.tables.Scratch.stage(next, "pagerank_rank")
    }
    ranks.select(col("id").as(idCol), col("rank"))
  }

  /** [[pageRank]] with DANGLING-MASS REDISTRIBUTION — the classic complete
    * formulation: each round, the summed rank of nodes with no out-links
    * (which [[pageRank]] lets decay) is redistributed uniformly,
    *
    *   r' = (1−d)/N + d·(Σ_in snap(r/outdeg) + snap(DM/N)),
    *
    * so total rank mass is conserved (up to grid rounding, ≤ N·2⁻²⁰).
    * DM is a sum of grid multiples — exact and order-free — and DM/N snaps
    * before entering the update, so the whole pass stays bit-replayable.
    * On a graph with no dangling nodes this reduces exactly to
    * [[pageRank]] (DM = 0 every round).
    *
    * Scale shape: [[pageRank]]'s per-round work plus one left join of the
    * |V|-row rank vector against the degree table (same `src` hash key —
    * no new exchange shape) and a 1-row aggregate that rides the next
    * round as a broadcast.
    */
  def pageRankFull(
      nodes: DataFrame, edges: DataFrame, idCol: String,
      iters: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"need at least one round, got $iters")
    val n = nodes.agg(count(lit(1)).cast("double").as("_n"))
    val ids = nodes.select(col(idCol).as("id"))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).cast("double").as("_deg"))
    val edgesDeg = graft.tables.Scratch.stage(
      edges.join(deg, Seq("src")).select(col("src"), col("dst"), col("_deg")),
      "pagerank_edges")
    // degree table for the dangling test — staged once, |V|-bounded
    val degIds = graft.tables.Scratch.stage(deg.select(col("src")), "pagerank_deg")
    var ranks = ids.crossJoin(broadcast(n))
      .select(col("id"), snap(lit(1.0) / col("_n")).as("rank"))
    for (_ <- 1 to iters) {
      // dangling mass this round: exact sum of grid multiples, then ONE
      // snap of the per-node share
      val dmn = ranks.join(degIds, ranks("id") === degIds("src"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("_dm"))
        .crossJoin(broadcast(n))
        .select(snap(col("_dm") / col("_n")).as("_dmn"))
      val contrib = edgesDeg
        .join(ranks, edgesDeg("src") === ranks("id"))
        .select(col("dst"), snap(col("rank") / col("_deg")).as("_c"))
        .groupBy(col("dst")).agg(sum(col("_c")).as("_m"))
      val next = ids.crossJoin(broadcast(n)).crossJoin(broadcast(dmn))
        .join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          // same IEEE shape as pageRank, with the dangling share inside
          // the damped term (a replay must add in this exact order)
          snap(lit(1.0 - damping) / col("_n") +
            lit(damping) * (coalesce(col("_m"), lit(0.0)) + col("_dmn"))).as("rank"))
      ranks = graft.tables.Scratch.stage(next, "pagerank_rank")
    }
    ranks.select(col("id").as(idCol), col("rank"))
  }
}
