package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Pins the sketch's contract: for ANY percentage p, the grid estimate is
  * the lower edge of the bin holding the ⌈p·n⌉-th order statistic —
  * estimate ∈ (orderstat − width, orderstat] — against exact order
  * statistics computed by sorting in-test. Also pins the scale properties:
  * the estimate never buffers values (state = populated bins only) and is
  * partitioning-independent.
  */
class GridQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val width = 10L
  private val ps = Seq("q10" -> 0.10, "q37" -> 0.37, "q50" -> 0.50,
    "q90" -> 0.90, "q99" -> 0.99)

  test("estimate within (orderstat - width, orderstat] at arbitrary percentages") {
    val rnd = new Random(42)
    val rows = (1 to 2000).map(i =>
      (if (i % 3 == 0) "a" else "b", rnd.nextDouble() * 1000.0))
    val df = rows.toDF("grp", "v")
    val out = GridQuantiles.gridQuantiles(df, "grp", "v", width, ps)
      .collect().map(r => r.getString(0) -> r).toMap
    for (grp <- Seq("a", "b")) {
      val vals = rows.filter(_._1 == grp).map(_._2).sorted
      val n = vals.length
      assert(out(grp).getAs[Long]("n") === n.toLong)
      for ((nm, p) <- ps) {
        val orderstat = vals(math.ceil(p * n).toInt - 1)
        val est = out(grp).getAs[Long](nm).toDouble
        assert(est <= orderstat && est > orderstat - width,
          s"$grp/$nm: estimate $est not in (${orderstat - width}, $orderstat]")
      }
    }
  }

  test("partitioning-independent (integer histogram math, no buffering order effects)") {
    val rnd = new Random(7)
    val df = (1 to 500).map(i => ("g", rnd.nextDouble() * 300.0)).toDF("grp", "v")
    val a = GridQuantiles.gridQuantiles(df, "grp", "v", width, ps).collect().toSeq
    val b = GridQuantiles.gridQuantiles(
      df.repartition(13).sortWithinPartitions($"v".desc), "grp", "v", width, ps)
      .collect().toSeq
    assert(a === b)
  }

  test("p = 1.0 lands in the max bin; tiny groups behave") {
    val df = Seq(("g", 5.0), ("g", 25.0)).toDF("grp", "v")
    val out = GridQuantiles.gridQuantiles(df, "grp", "v", width,
      Seq("q100" -> 1.0, "q1" -> 0.01)).collect().head
    assert(out.getAs[Long]("q100") === 20L) // bin of 25.0
    assert(out.getAs[Long]("q1") === 0L)    // bin of 5.0 (rank ceil(0.01*2)=1)
    assert(out.getAs[Long]("n") === 2L)
  }
}
