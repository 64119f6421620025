package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Co-located joins over bucketed managed tables: the join and the keyed
  * aggregation must plan with ZERO shuffle exchange, and results must match
  * the unbucketed plan exactly.
  */
class BucketsSpec extends SparkSpec {
  import spark.implicits._

  private def exchanges(df: org.apache.spark.sql.DataFrame): Seq[ShuffleExchangeExec] = {
    // force execution so AQE finalizes the physical plan it actually ran
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case e: ShuffleExchangeExec => e }
  }

  private def withNoBroadcast[A](body: => A): A = {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("co-bucketed equi-join and keyed agg plan with zero exchange; results exact") {
    val left = (0L until 2000L).map(i => (i % 97, i, s"l$i")).toDF("user_id", "event_id", "l")
    val right = (0L until 1500L).map(i => (i % 97, s"r$i")).toDF("user_id", "r")
    Buckets.overwriteBucketed("b_left", left, Seq("user_id"), 8)
    Buckets.overwriteBucketed("b_right", right, Seq("user_id"), 8)
    try withNoBroadcast {
      val bl = Buckets.read(spark, "b_left")
      val br = Buckets.read(spark, "b_right")
      val joined = bl.join(br, Seq("user_id"))
      assert(exchanges(joined).isEmpty,
        s"co-bucketed join must not shuffle:\n${joined.queryExecution.executedPlan}")
      // same rows as the unbucketed join
      assert(joined.count() === left.join(right, Seq("user_id")).count())
      val agg = bl.groupBy($"user_id").agg(count(lit(1)).as("n"))
      assert(exchanges(agg).isEmpty,
        s"bucket-keyed agg must not shuffle:\n${agg.queryExecution.executedPlan}")
      val got = agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = left.groupBy($"user_id").agg(count(lit(1)))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want)
    } finally {
      Buckets.drop(spark, "b_left"); Buckets.drop(spark, "b_right")
    }
  }

  test("mismatched bucket counts still join correctly (planner may re-shuffle one side)") {
    val left = (0L until 500L).map(i => (i % 13, i)).toDF("k", "v")
    val right = (0L until 400L).map(i => (i % 13, i * 2)).toDF("k", "w")
    Buckets.overwriteBucketed("b_l13", left, Seq("k"), 8)
    Buckets.overwriteBucketed("b_r13", right, Seq("k"), 4)
    try withNoBroadcast {
      val j = Buckets.read(spark, "b_l13").join(Buckets.read(spark, "b_r13"), Seq("k"))
      assert(j.count() === left.join(right, Seq("k")).count())
    } finally {
      Buckets.drop(spark, "b_l13"); Buckets.drop(spark, "b_r13")
    }
  }

  test("maxRecordsPerFile splits bucket files but keeps the join exchange-free") {
    val left = (0L until 2000L).map(i => (i % 17, i)).toDF("k", "v")
    val right = (0L until 1000L).map(i => (i % 17, i * 3)).toDF("k", "w")
    Buckets.overwriteBucketed("b_mrf_l", left, Seq("k"), 4, maxRecordsPerFile = 100L)
    Buckets.overwriteBucketed("b_mrf_r", right, Seq("k"), 4, maxRecordsPerFile = 100L)
    try withNoBroadcast {
      // the escape actually fired: more data files than buckets
      val loc = spark.sql("DESCRIBE EXTENDED b_mrf_l").filter($"col_name" === "Location")
        .head.getString(1).stripPrefix("file:")
      val nFiles = new java.io.File(loc).listFiles()
        .count(f => f.getName.startsWith("part-"))
      assert(nFiles > 4, s"expected >4 bucket files, got $nFiles")
      val j = Buckets.read(spark, "b_mrf_l").join(Buckets.read(spark, "b_mrf_r"), Seq("k"))
      // hash layout survives the split: still no shuffle (sorts may return)
      assert(exchanges(j).isEmpty,
        s"split-bucket join must not shuffle:\n${j.queryExecution.executedPlan}")
      assert(j.count() === left.join(right, Seq("k")).count())
    } finally {
      Buckets.drop(spark, "b_mrf_l"); Buckets.drop(spark, "b_mrf_r")
    }
  }

  test("overwrite replaces contents; one file per bucket") {
    val a = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val b = Seq((3L, "c")).toDF("k", "v")
    Buckets.overwriteBucketed("b_ow", a, Seq("k"), 4)
    Buckets.overwriteBucketed("b_ow", b, Seq("k"), 4)
    try {
      assert(Buckets.read(spark, "b_ow").collect().map(_.getLong(0)).toSeq === Seq(3L))
    } finally Buckets.drop(spark, "b_ow")
  }
}
