package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** E5's epoch-week index must FLOOR-divide: pre-epoch timestamps get
  * negative week indices instead of sharing week 0 with the first
  * post-epoch part-week (truncating `div` would fold both onto 0).
  */
class CohortWeekSpec extends SparkSpec {
  import spark.implicits._

  test("epoch-week floor division is Math.floorDiv on both signs") {
    val W = 604800000L
    val ems = Seq(-2L * W - 1, -W, -1L, 0L, 1L, W - 1, W, 2L * W + 5)
    val got = ems.toDF("_ems")
      .select(col("_ems"),
        expr("(_ems - pmod(_ems, 604800000)) div 604800000").as("wk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ems.foreach { e =>
      assert(got(e) === Math.floorDiv(e, W), s"ems=$e")
    }
  }
}
