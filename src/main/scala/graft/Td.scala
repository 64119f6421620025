package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loader for the driver's read-only parquet testdata (TESTDATA.md).
  *
  * Tables: region nation customer supplier part orders lineitem events
  * documents embeddings — one parquet per table under the sf dir.
  *
  * `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
  * reader rejects outright ([PARQUET_TYPE_ILLEGAL]); read it as a long via
  * the legacy conf and convert nanos→microsecond timestamp (DuckDB sees the
  * same instants — sub-µs precision is zero in the generated data).
  */
object Td {
  val tables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df =
      if (name == "events") {
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(s"$sfDir/$name.parquet")
      } else spark.read.parquet(s"$sfDir/$name.parquet")
    // Integral `div`, not `/`: epoch nanos (~1.7e18) exceed a double's 53-bit
    // mantissa, so IEEE division would round the value before truncation and
    // could land one microsecond low — a cross-engine parity break vs DuckDB's
    // exact TIMESTAMP(NANOS) read for instants on bucket boundaries.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
