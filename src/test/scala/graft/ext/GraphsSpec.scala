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
