package graft.serve

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the data-quality probe library (reference README.md:257-266
  * acceptance checks).
  */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def fact = Seq(
    ("P1", "C1", 10.0), ("P1", "C2", 5.0), ("P2", "C1", 3.0),
    ("PX", "C1", 7.0), ("PX", "C9", 2.0), ("PY", "C9", 1.0)
  ).toDF("product_code", "customer_code", "qty")
  private def dim = Seq("P1", "P2", "P3").toDF("product_code")

  test("duplicateKeys flags only keys with >1 row") {
    val d = Quality.duplicateKeys(fact, Seq("product_code")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d === Map("P1" -> 2L, "PX" -> 2L))
  }

  test("joinCoverage reports matched/missing/ratio") {
    val r = Quality.joinCoverage(fact, dim, Seq("product_code")).head()
    assert(r.getLong(0) === 6L && r.getLong(1) === 3L && r.getLong(2) === 3L)
    assert(r.getDouble(3) === 0.5)
  }

  test("joinCoverage is lazy: building it runs zero jobs (single-aggregation form)") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val cov = Quality.joinCoverage(fact, dim, Seq("product_code"))
      Thread.sleep(1000) // listener delivery is async; any eager job has long started
      // the old implementation ran two eager count() actions right here
      assert(jobs.get() === 0, "building the coverage frame must not run jobs")
      assert(cov.head().getDouble(3) === 0.5)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("missingKeys surfaces top offenders by frequency") {
    val m = Quality.missingKeys(fact, dim, Seq("product_code")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(m.toSeq === Seq(("PX", 2L), ("PY", 1L)))
  }

  test("nullRates profiles per-column null fraction") {
    val df = Seq((Some(1), Some("a")), (None, Some("b")), (Some(3), None), (None, None))
      .toDF("x", "y")
    val r = Quality.nullRates(df).head()
    assert(r.getDouble(0) === 0.5 && r.getDouble(1) === 0.5)
  }
}
