package graft.ingest

import graft.SparkSpec
import graft.tables.TableStore
import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def writeCsv(dir: Path, name: String, lines: String*): Unit =
    Files.write(dir.resolve(name), lines.mkString("\n").getBytes)

  test("CsvIngest attaches lineage columns (S1-S3)") {
    val dir = Files.createTempDirectory("graft_csv")
    writeCsv(dir, "a.csv", "id,v", "1,x", "2,y")
    val df = CsvIngest.read(spark, dir.toString, inferSchema = true)
    assert(df.columns.toSet === Set("id", "v", "file_name", "file_size", "read_timestamp"))
    val rows = df.select("id", "file_name").as[(Int, String)].collect()
    assert(rows.forall(_._2 == "a.csv") && rows.length === 2)
  }

  test("JsonlIngest: explicit schema, corrupt lines captured not crashed, lineage attached") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_jsonl")
    writeCsv(dir, "a.jsonl",
      """{"doc_id": 1, "text": "hello world"}""",
      """{"doc_id": 2, "text": "second line"}""",
      """{"doc_id": 3, "text": "truncated""", // corrupt: unterminated string
      """not json at all""")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val df = JsonlIngest.read(spark, dir.toString, Some(schema))
    assert(df.columns.toSet === Set("doc_id", "text", "_corrupt_record",
      "file_name", "file_size", "read_timestamp"))
    val (good, bad) = JsonlIngest.quarantine(df)
    assert(good.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    assert(!good.columns.contains("_corrupt_record"))
    val badRows = bad.select("_corrupt_record", "file_name").as[(String, String)].collect()
    assert(badRows.length === 2 && badRows.forall(_._2 == "a.jsonl"))
    assert(badRows.exists(_._1.contains("not json at all")))
  }

  test("JsonlIngest: valid lines with unknown fields are rows, not quarantine; blank lines skipped") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_jsonl_shape")
    writeCsv(dir, "c.jsonl",
      """{"doc_id": 1}""",
      """{"other_field": 99}""", // valid JSON, none of our fields -> all-null row
      "",                       // blank line -> skipped like the native reader
      "null")                   // bare JSON null -> quarantined
    val schema = StructType(Seq(StructField("doc_id", LongType)))
    val (good, bad) = JsonlIngest.quarantine(
      JsonlIngest.read(spark, dir.toString, Some(schema)))
    assert(good.count() === 2) // doc 1 + the all-null row
    assert(bad.as[(String, String, Long)].collect().map(_._1).toSeq === Seq("null"))
  }

  test("JsonlIngest: caller schema that already contains the corrupt column works") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_jsonl_cc")
    writeCsv(dir, "d.jsonl", """{"doc_id": 1}""", """broken {""")
    // corrupt column deliberately NOT last — field order must survive
    val schema = StructType(Seq(
      StructField("_corrupt_record", StringType), StructField("doc_id", LongType)))
    val (good, bad) = JsonlIngest.quarantine(
      JsonlIngest.read(spark, dir.toString, Some(schema)))
    assert(good.select("doc_id").as[Long].collect().toSeq === Seq(1L))
    assert(bad.count() === 1)
  }

  test("JsonlIngest failFast raises on the first corrupt line") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_jsonl_ff")
    writeCsv(dir, "b.jsonl", """{"doc_id": 1}""", """{"doc_id":""")
    val schema = StructType(Seq(StructField("doc_id", LongType)))
    val thrown = intercept[Exception] {
      JsonlIngest.read(spark, dir.toString, Some(schema), failFast = true)
        .select("doc_id").collect()
    }
    assert(thrown.getMessage != null)
  }

  test("Landing.archive moves files landing→processed (S10)") {
    val root = Files.createTempDirectory("graft_landing")
    val landing = root.resolve("landing"); Files.createDirectories(landing)
    writeCsv(landing, "f1.csv", "id", "1")
    writeCsv(landing, "f2.csv", "id", "2")
    val moved = Landing.archive(spark, landing.toString, root.resolve("processed").toString)
    assert(moved === Seq("f1.csv", "f2.csv"))
    assert(Landing.list(spark, landing.toString).isEmpty)
    assert(Landing.list(spark, root.resolve("processed").toString).size === 2)
  }

  test("Landing.archive leaves hidden/marker files (in-flight uploads) alone") {
    val root = Files.createTempDirectory("graft_landing_hidden")
    val landing = root.resolve("landing"); Files.createDirectories(landing)
    writeCsv(landing, "f1.csv", "id", "1")
    writeCsv(landing, ".f2.csv.tmp", "id", "2") // in-flight upload
    writeCsv(landing, "_SUCCESS", "", "")       // marker
    val moved = Landing.archive(spark, landing.toString, root.resolve("processed").toString)
    assert(moved === Seq("f1.csv"))
    assert(Files.exists(landing.resolve(".f2.csv.tmp")))
    assert(Files.exists(landing.resolve("_SUCCESS")))
  }

  test("IdempotentCopy matches old triple-slash (file:///p) log entries") {
    val root = Files.createTempDirectory("graft_copy_uri")
    val src = root.resolve("src"); Files.createDirectories(src)
    writeCsv(src, "a.csv", "id,q", "1,10")
    val store = new TableStore(spark, root.resolve("tables").toString)
    def load() = IdempotentCopy.copyInto(spark, store, "fact", src.toString,
      df => df.select(col("id").cast("long"), col("q").cast("long")))
    assert(load() === 1)
    // rewrite the log as an older pipeline would have recorded it:
    // _metadata.file_path's empty-authority rendering "file:///p"
    import spark.implicits._
    val rewritten = store.read("fact__copy_log").as[String].collect()
      .map(p => "file://" + new org.apache.hadoop.fs.Path(p).toUri.getPath)
    store.overwrite("fact__copy_log", rewritten.toSeq.toDF("_file_path"))
    assert(load() === 0, "triple-slash log entry must still mark the file as seen")
    assert(store.read("fact").count() === 1)
  }

  test("IdempotentCopy loads each file exactly once (S9 COPY INTO)") {
    val root = Files.createTempDirectory("graft_copy")
    val src = root.resolve("src"); Files.createDirectories(src)
    writeCsv(src, "a.csv", "id,q", "1,10")
    val store = new TableStore(spark, root.resolve("tables").toString)
    def load() = IdempotentCopy.copyInto(spark, store, "fact", src.toString,
      df => df.select(col("id").cast("long"), col("q").cast("long")))
    assert(load() === 1)
    assert(load() === 0) // rerun: nothing new
    writeCsv(src, "b.csv", "id,q", "2,20")
    assert(load() === 1) // only the new file
    assert(store.read("fact").count() === 2)
  }
}
