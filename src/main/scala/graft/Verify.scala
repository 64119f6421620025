package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [onlyNames] — the optional comma-separated
    // name filter is a builder-side iteration aid; the driver passes 2 args.
    val Array(sfDir, outDir) = args.take(2)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // failures must surface as DATA, not silent absence: a query that throws
    // writes no parquet, and the driver's checker would otherwise read the
    // round as "fewer queries" (exactly how r10's j8/x4 vanished). Collect
    // name → message here and emit _errors.json beside oracle_sql.json.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        errors(name) = msg.take(500)
        System.err.println(s"[verify] $name failed: $msg")
      }
    }
    // c8's oracle is c7's EXACT SQL, so its hash match silently depends on
    // nprobe=4 (nlist=8) retaining every 0.45-cosine pair on the CURRENT
    // testdata (measured margin: needed probe rank <= 3 of 8 at sf0.01).
    // Guard that dependency here, where the dumps are fresh: pruned ⊆
    // exact makes Σ n_eval_hits equality ⟺ hit-SET equality, so one
    // aggregate per side detects any retention loss and names it — the
    // alternative is a mystery hash mismatch in the driver's compare.
    // Skipped under a name filter that excluded either side, AND when
    // either query FAILED this run (its old parquet may survive a reused
    // outDir): the guard must never compare a fresh dump against a stale
    // cross-run one. Guard failures land in `errors` like any query
    // failure — this check must never crash main before the JSON
    // sidecars are written (the silent-zero mode the collection stops).
    if (only.forall(o => o.contains("c7_semantic_decon") &&
        o.contains("c8_semantic_decon_indexed")) &&
        !errors.contains("c7_semantic_decon") &&
        !errors.contains("c8_semantic_decon_indexed"))
      try {
        for {
          c7 <- scala.util.Try(
            spark.read.parquet(s"$outDir/c7_semantic_decon")).toOption
          c8 <- scala.util.Try(
            spark.read.parquet(s"$outDir/c8_semantic_decon_indexed")).toOption
        } {
          import org.apache.spark.sql.functions.{coalesce, count, lit, sum}
          def hits(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
            val r = df.agg(coalesce(sum("n_eval_hits"), lit(0L)),
              count(lit(1))).collect()(0)
            (r.getLong(0), r.getLong(1))
          }
          val (h7, n7) = hits(c7)
          val (h8, n8) = hits(c8)
          if (h7 != h8 || n7 != n8) {
            val msg = s"c8 retention guard: the pruned scrub retains $h8/$h7 " +
              s"exact hits ($n8/$n7 flagged rows) — nprobe=4 of nlist=8 no " +
              "longer retains every 0.45-cosine pair on the CURRENT testdata " +
              "(regenerated parquet, or touched c8 geometry?). Recalibrate " +
              "(AnnIndex.decontaminateCalibrated) or raise c8's nprobe before " +
              "trusting its oracle."
            errors("c8_retention_guard") = msg
            System.err.println(s"[verify] $msg")
          }
        }
      } catch { case scala.util.control.NonFatal(e) =>
        errors("c8_retention_guard") =
          s"guard itself failed: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(400)}"
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/_errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    // Attribution line + sidecar: the repo DECLARES its query count at dump
    // time, so a zero-entry driver artifact (r18's empty {}) is attributable
    // on sight — if _declared.json says 177 and the round record says 0, the
    // loss happened downstream of this process, not in the repo.
    // `dumped` counts the queries this RUN attempted (the name filter is
    // a builder iteration aid; the driver's 2-arg run attempts all)
    val attempted =
      SparkEntry.queries.keysIterator.count(n => only.forall(_.contains(n)))
    val dumped =
      attempted - errors.keysIterator.count(SparkEntry.queries.contains)
    val declared = s"""{"queries_declared": ${SparkEntry.queries.size}, """ +
      s""""dumped": $dumped, "errors": ${errors.size}}"""
    Files.writeString(Paths.get(s"$outDir/_declared.json"), declared)
    println(s"[verify] $declared")
    graft.tables.Scratch.cleanup(spark) // drop stage tables (all actions done)
    spark.stop()
  }
}
