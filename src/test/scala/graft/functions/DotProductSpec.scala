package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Specs for the native DotProduct expression: bit-parity with the
  * interpreted fold, null semantics, codegen execution, SQL registration
  * via SparkSessionExtensions.
  */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private def asD(c: org.apache.spark.sql.Column) = c.cast(ArrayType(DoubleType))

  test("bit-identical to the interpreted aggregate/zip_with fold") {
    val vecs = (0 until 200).map { i =>
      (i.toLong,
        Array.tabulate(64)(j => math.sin(i * 64 + j).toFloat),
        Array.tabulate(64)(j => math.cos(i * 64 + j).toFloat))
    }.toDF("id", "a", "b")
    val both = vecs.select(
      VectorExpressions.dotProduct(asD($"a"), asD($"b")).as("native"),
      aggregate(zip_with(asD($"a"), asD($"b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("interp"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("null inputs and length mismatch yield null") {
    val df = Seq(
      (1L, Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0))),
      (2L, None, Some(Array(3.0, 4.0))),
      (3L, Some(Array(1.0, 2.0, 5.0)), Some(Array(3.0, 4.0)))
    ).toDF("id", "a", "b")
    val out = df.select($"id", VectorExpressions.dotProduct($"a", $"b").as("d"))
      .orderBy("id").collect()
    assert(out(0).getDouble(1) === 11.0)
    assert(out(1).isNullAt(1))
    assert(out(2).isNullAt(1))
  }

  test("graft_dot resolves in SQL via GraftExtensions") {
    // getOrCreate reuses the suite session (extensions only apply at session
    // construction) — clear defaults so a fresh session is built on the same
    // SparkContext, then restore.
    val prev = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head()
      assert(r.getDouble(0) === 11.0)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
