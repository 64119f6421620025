package graft.ingest

import graft.tables.TableStore
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `COPY INTO`-style idempotent file append — SURVEY.md §2.1 S9.
  *
  * Reference: the parent incremental fact load
  * (Summit_Sporting_Goods_parent_company/incremental_load/
  * incremental_data_parent_company_query.txt:2-12) uses Databricks
  * `COPY INTO … FILEFORMAT = CSV`, which loads each file at most once.
  * Emulated here by tracking loaded file paths in a `<table>__copy_log`
  * sidecar table and anti-joining new file paths against it: re-running the
  * load after a partial failure or with a mix of old and new files appends
  * only the unseen files' rows.
  */
object IdempotentCopy {

  /** Append rows from CSV files under `srcDir` into `table`, skipping files
    * already recorded in the copy log. `project` applies the COPY INTO
    * select-list (casts/renames). Returns number of newly loaded files.
    */
  def copyInto(
      spark: SparkSession,
      store: TableStore,
      table: String,
      srcDir: String,
      project: DataFrame => DataFrame,
      header: Boolean = true,
      partitionBy: Seq[String] = Nil): Long = {
    val logTable = s"${table}__copy_log"
    val raw = spark.read.option("header", header.toString).csv(srcDir)
      .select(col("*"), col("_metadata.file_path").as("_file_path"))
    val unseen =
      if (!store.exists(logTable)) raw
      else raw.join(store.read(logTable), Seq("_file_path"), "left_anti")
    val newFiles = unseen.select("_file_path").distinct().cache()
    val n = newFiles.count()
    if (n > 0) {
      store.append(table, project(unseen.drop("_file_path")), partitionBy)
      if (store.exists(logTable)) store.append(logTable, newFiles)
      else store.overwrite(logTable, newFiles)
    }
    newFiles.unpersist()
    n
  }
}
