package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CSV ingestion with lineage columns — SURVEY.md §2.1 S1-S3.
  *
  * Reference: `spark.read.format("csv").option("header", True)
  * .option("inferSchema", True).load(path)` plus `_metadata.file_name`,
  * `_metadata.file_size`, `current_timestamp()` (1_customer_data_processing
  * .py:31-38). Explicit schemas preferred for determinism (SURVEY §4:
  * inference costs an extra full scan — at 100 TB that is a second read of
  * every byte); inference kept as an option for parity.
  */
object CsvIngest {

  def read(
      spark: SparkSession,
      path: String,
      schema: Option[StructType] = None,
      header: Boolean = true,
      inferSchema: Boolean = false,
      lineage: Boolean = true): DataFrame = {
    val r0 = spark.read.option("header", header.toString)
    val r = schema match {
      case Some(s) => r0.schema(s)
      case None => r0.option("inferSchema", inferSchema.toString)
    }
    val df = r.csv(path)
    if (!lineage) df
    else df.select(col("*"),
      col("_metadata.file_name").as("file_name"),
      col("_metadata.file_size").as("file_size"))
      .withColumn("read_timestamp", current_timestamp())
  }
}
