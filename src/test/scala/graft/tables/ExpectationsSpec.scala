package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Declarative expectations: strict null semantics, quarantine split,
  * metric counts (Q4).
  */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import Expectations.{Rule, annotate, metrics, split}

  private def df = Seq(
    (1L, Some(5), "ok"),
    (2L, Some(-1), "ok"),      // violates positive
    (3L, None, "ok"),          // NULL predicate → violation, never a pass
    (4L, Some(7), "bad")       // violates domain
  ).toDF("id", "v", "status")

  private def rules = Seq(
    Rule("positive", col("v") > 0),
    Rule("status_ok", col("status") === "ok"))

  test("NULL predicates are violations; quarantine carries reasons") {
    val (clean, bad) = split(df, rules)
    assert(clean.collect().map(_.getLong(0)).toSeq === Seq(1L))
    val reasons = bad.collect()
      .map(r => r.getAs[Long]("id") -> r.getSeq[String](3).toSet).toMap
    assert(reasons === Map(
      2L -> Set("positive"), 3L -> Set("positive"), 4L -> Set("status_ok")))
  }

  test("metrics count per rule, zero-violation rules report 0, order preserved") {
    val m = metrics(df, rules :+ Rule("id_positive", col("id") > 0))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(m.toSeq === Seq(
      (0, "positive", 4L, 2L), (1, "status_ok", 4L, 1L), (2, "id_positive", 4L, 0L)))
  }

  test("annotate leaves clean rows with an empty violation list") {
    val a = annotate(df, rules).filter(col("id") === 1).head()
    assert(a.getSeq[String](3).isEmpty)
  }

  test("unsafe and duplicate rule names are rejected") {
    intercept[IllegalArgumentException] {
      metrics(df, Seq(Rule("a'); DROP", col("v") > 0)))
    }
    intercept[IllegalArgumentException] {
      annotate(df, Seq(Rule("r", col("v") > 0), Rule("r", col("v") < 9)))
    }
  }
}
