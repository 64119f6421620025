package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness: dump `explain("formatted")` for
  * named declared queries (the plans/rNN/_before|_after evidence files) and
  * optionally time them with EXACTLY the bench's methodology (same session
  * config as [[Bench]], same `.count()` action, min over passes) — so a
  * single query can be iterated on without paying the full 69-query bench.
  *
  * Usage: `runMain graft.PlanDump <query> [<query> ...]`
  *   - SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
  *   - SPARK_GRAFT_CPUS     local core count (default 4)
  *   - SPARK_GRAFT_PLAN_DIR where to write `<query>_<tag>.txt` (default
  *                          plans/dev; set plans/r21 + tag before/after for
  *                          the committed artifacts)
  *   - SPARK_GRAFT_PLAN_TAG suffix tag (default "plan")
  *   - SPARK_GRAFT_TIME     timing passes (default 2; 0 = plan only)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val planDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/dev")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "plan")
    val passes = sys.env.getOrElse("SPARK_GRAFT_TIME", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      // mirrors Bench exactly (see the rationale there) — this harness
      // exists to measure with the bench's config
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "8m")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Td.tables.foreach { t =>
      try graft.Td(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(planDir))
    val qmap = graft.queries.Registry.queryMap
    args.foreach { name =>
      val fn = qmap.getOrElse(name,
        throw new IllegalArgumentException(s"no declared query named $name"))
      spark.sparkContext.setJobDescription(s"plandump: $name")
      val df = fn(spark, sfDir)
      // NOTE: for queries that mutate scratch/store state, building the
      // frame already ran the side-effecting part; the explain below is the
      // returned frame's plan (the same frame Bench counts)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(planDir, s"${name}_$tag.txt"),
        plan.getBytes("UTF-8"))
      if (passes > 0) {
        // a failing query must fail LOUDLY (this harness produces the
        // committed plans/rNN evidence — a silent -1 would print as if
        // measured); the exception propagates with the query named
        val times = (1 to passes).map { _ =>
          val t0 = System.nanoTime()
          try fn(spark, sfDir).count() catch { case e: Throwable =>
            throw new RuntimeException(s"PLANDUMP $name FAILED", e) }
          (System.nanoTime() - t0) / 1e9
        }
        println(f"PLANDUMP $name%-32s min=${times.min}%.3f  passes=${times.map(t => f"$t%.3f").mkString(",")}")
      } else println(s"PLANDUMP $name plan-only")
    }
    graft.tables.Scratch.cleanup(spark)
    spark.stop()
  }
}
