package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the fixed-round PageRank (X25). */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private def nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
  // everyone endorses 1; 1 endorses 2; nobody endorses 4
  private def edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L)).toDF("src", "dst")

  test("the most-endorsed node ranks highest; orphans keep only teleport mass") {
    val r = Graphs.pageRank(nodes, edges, "id", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) > r(2L) && r(2L) > r(3L),
      s"endorsement order must show in ranks: $r")
    // nodes 3 and 4 have NO in-links: their rank is exactly the teleport
    // floor (1-d)/N after round 1, and stays there every later round
    val floor = math.round(((1.0 - 0.85) / 4.0) * 1048576.0) / 1048576.0
    assert(r(3L) === floor && r(4L) === floor,
      s"orphans must sit on the teleport floor: $r vs $floor")
  }

  test("ranks are grid multiples and the pass is deterministic") {
    val a = Graphs.pageRank(nodes, edges, "id", iters = 2)
      .orderBy($"id").collect().map(_.getDouble(1)).toSeq
    val b = Graphs.pageRank(nodes, edges, "id", iters = 2)
      .orderBy($"id").collect().map(_.getDouble(1)).toSeq
    assert(a === b)
    a.foreach(v => assert((v * 1048576.0).isWhole, s"$v not on the 2^-20 grid"))
  }

  test("rounds are staged: deep iteration yields a materialized scan, not a nested plan") {
    val r = Graphs.pageRank(nodes, edges, "id", iters = 10)
    // each round staged its rank vector, so the RETURNED frame is a project
    // over a parquet scan of the last stage — zero joins survive in the
    // plan (an unrolled implementation would carry ~2 joins per round)
    val joins = r.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.isEmpty, s"expected a materialized rank scan, got joins:\n$joins")
    val scans = r.queryExecution.optimizedPlan.collect {
      case rel: org.apache.spark.sql.execution.datasources.LogicalRelation => rel
    }
    assert(scans.nonEmpty, "expected a staged-table relation in the plan")
    // and the deep run still produces grid-snapped, deterministic ranks
    val a = r.orderBy($"id").collect().map(_.getDouble(1)).toSeq
    a.foreach(v => assert((v * 1048576.0).isWhole, s"$v not on the 2^-20 grid"))
  }

  test("dangling nodes absorb rank: total mass decays by the absorbed share") {
    // 1 → 2 → 3; node 3 has in-links but NO out-links (dangling)
    val ns = Seq(1L, 2L, 3L).toDF("id")
    val es = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    def snap(x: Double) = math.round(x * 1048576.0) / 1048576.0
    val r = Graphs.pageRank(ns, es, "id", iters = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val r0 = snap(1.0 / 3.0)
    val floor = snap((1.0 - 0.85) / 3.0)
    assert(r(1L) === floor) // no in-links: teleport only
    assert(r(2L) === snap((1.0 - 0.85) / 3.0 + 0.85 * snap(r0)))
    assert(r(3L) === snap((1.0 - 0.85) / 3.0 + 0.85 * snap(r0)))
    // node 3's r0 was never redistributed: the documented simplified-static
    // semantics — total rank after the round is below 1 by ~0.85·r0
    val total = r.values.sum
    assert(total < 1.0 - 0.8 * r0, s"dangling mass must decay the total: $total")
  }

  test("pageRankFull conserves mass on dangling graphs and reduces to pageRank without them") {
    // 1 → 2 → 3, node 3 dangling
    val ns = Seq(1L, 2L, 3L).toDF("id")
    val es = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val full = Graphs.pageRankFull(ns, es, "id", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // total mass conserved up to grid rounding (N snaps per round)
    assert(math.abs(full.values.sum - 1.0) < 3 * 3 * (1.0 / 1048576.0),
      s"mass must be conserved: ${full.values.sum}")
    // the simplified variant decays — the two must genuinely differ here
    val simple = Graphs.pageRank(ns, es, "id", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(simple.values.sum < full.values.sum - 0.1)
    // and on a dangling-free graph they are IDENTICAL (DM = 0 each round)
    val es2 = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val a = Graphs.pageRank(ns, es2, "id", iters = 3)
      .orderBy($"id").collect().map(_.getDouble(1)).toSeq
    val b = Graphs.pageRankFull(ns, es2, "id", iters = 3)
      .orderBy($"id").collect().map(_.getDouble(1)).toSeq
    assert(a === b)
  }

  test("one round from uniform matches the hand-computed update") {
    val r = Graphs.pageRank(nodes, edges, "id", iters = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    def snap(x: Double) = math.round(x * 1048576.0) / 1048576.0
    val r0 = snap(0.25)
    // node 1 receives from 2, 3, 4 (deg 1 each): m = 3·snap(r0/1)
    val exp1 = snap((1.0 - 0.85) / 4.0 + 0.85 * (3 * snap(r0)))
    // node 2 receives from 1 (deg 1)
    val exp2 = snap((1.0 - 0.85) / 4.0 + 0.85 * snap(r0))
    assert(r(1L) === exp1)
    assert(r(2L) === exp2)
  }
}
