package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSON-Lines ingestion with lineage columns — the arrival format of crawl
  * dumps, API exports, and annotation deliveries (one JSON object per line,
  * splittable, so a 100 TB drop parallelizes by byte range the same way CSV
  * does). Companion to [[CsvIngest]] (SURVEY.md §2.1 S1-S3): same lineage
  * contract (`_metadata` file name/size + ingest timestamp), same
  * explicit-schema-first policy — inference reads every byte twice, which
  * at 100 TB is a second full scan before work starts.
  *
  * Corrupt lines are DATA, not crashes: real JSONL deliveries carry
  * truncated tails and encoding garbage, and dropping them silently skews
  * the corpus while failing the whole job on line 40 billion wastes a
  * cluster-day. The PERMISSIVE path reads lines via the text source and
  * parses with `from_json`, parking unparseable lines in `corruptCol` —
  * deliberately NOT `spark.read.json`'s internal corrupt column, which
  * Spark refuses to let a query reference on its own (the quarantine
  * projection "corrupt line + source file" is exactly such a query).
  * `failFast = true` switches to the native strict reader for curated
  * inputs.
  */
object JsonlIngest {

  val DefaultCorruptCol = "_corrupt_record"

  def read(
      spark: SparkSession,
      path: String,
      schema: Option[StructType] = None,
      lineage: Boolean = true,
      failFast: Boolean = false,
      corruptCol: String = DefaultCorruptCol): DataFrame = {
    def withLineage(df: DataFrame): DataFrame =
      if (!lineage) df
      else df.select(col("*"),
        col("_metadata.file_name").as("file_name"),
        col("_metadata.file_size").as("file_size"))
        .withColumn("read_timestamp", current_timestamp())

    schema match {
      case Some(s) if !failFast =>
        val parseSchema =
          if (s.fieldNames.contains(corruptCol)) s
          else s.add(corruptCol, StringType, nullable = true)
        val raw = spark.read.text(path)
          // the native JSONL reader skips blank lines; match it
          .filter(length(trim(col("value"))) > 0)
        withLineage(raw)
          .withColumn("_j", from_json(col("value"), parseSchema,
            Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol)))
          // from_json returns a NULL struct (not a corrupt-col row) for
          // inputs like a bare JSON `null` — still quarantine the line.
          // The fallback mirrors parseSchema's fields IN ORDER, swapping in
          // the raw line at the corrupt slot — a caller schema may already
          // carry the corrupt column (at any position), and a rebuilt
          // struct with a duplicated or reordered field would fail the
          // CaseWhen's struct-type analysis
          .withColumn("_j", when(col("_j").isNull,
            struct(parseSchema.fields.toSeq.map { f =>
              if (f.name == corruptCol) col("value").as(corruptCol)
              else lit(null).cast(f.dataType).as(f.name)
            }: _*)).otherwise(col("_j")))
          .select((parseSchema.fieldNames.map(f => col(s"_j.$f").as(f)) ++
            Seq("file_name", "file_size", "read_timestamp").filter(_ => lineage).map(col)): _*)
      case other =>
        val r0 = spark.read.option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
        val r = other match {
          case Some(s) => r0.schema(s)
          case None => r0 // schema inference: extra full pass over the data
        }
        withLineage(r.json(path))
    }
  }

  /** Split a PERMISSIVE read into (clean rows, quarantined raw lines).
    * The quarantine frame keeps lineage columns when present so a re-ship
    * can name the exact files that need regeneration.
    */
  def quarantine(df: DataFrame, corruptCol: String = DefaultCorruptCol): (DataFrame, DataFrame) = {
    require(df.columns.contains(corruptCol),
      s"quarantine: column '$corruptCol' not present — read with an explicit " +
        "schema via JsonlIngest.read so corrupt lines are captured")
    val keep = corruptCol +: df.columns.filter(c => c == "file_name" || c == "file_size").toSeq
    val bad = df.filter(col(corruptCol).isNotNull).select(keep.map(col): _*)
    val good = df.filter(col(corruptCol).isNull).drop(corruptCol)
    (good, bad)
  }
}
