package graft.tables

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Parquet-backed managed tables with atomic overwrite.
  *
  * Replaces the reference's Delta managed tables (SURVEY.md §2.1 S4/S5;
  * reference: `df.write.format("delta").mode("overwrite").saveAsTable(t)` at
  * e.g. consolidated_pipeline/2_dimension_data_processing/
  * 1_customer_data_processing.py:50-53). Vanilla Spark's
  * `saveAsTable(Overwrite)` cannot overwrite a table that feeds its own input
  * (it truncates before the read completes), which the MERGE rewrite needs —
  * so overwrite here materializes to a staging dir first, then swaps via
  * filesystem rename (atomic on HDFS/local; on object stores pair with a
  * manifest or committer). Single-writer semantics, matching the reference's
  * one-notebook-at-a-time pipeline.
  *
  * At cluster scale the staging write is fully distributed (executors write
  * parquet parts); only the final rename is a driver-side metadata operation.
  */
final class TableStore(spark: SparkSession, root: String) {

  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def path(name: String): String = s"$root/$name"

  def exists(name: String): Boolean = fs.exists(new Path(path(name)))

  def read(name: String): DataFrame = spark.read.parquet(path(name))

  /** Atomic overwrite: write staging, swap, drop previous. Safe when `df`
    * reads from the table being replaced.
    *
    * `partitionBy` lays the table out hive-style (e.g. month partitions for
    * the consolidated fact): partition-pruned scans + dynamic partition
    * pruning on dim-filtered star joins come free from Catalyst, and the
    * incremental affected-month rewrite touches only the changed
    * directories.
    */
  def overwrite(name: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    val staging = new Path(s"$root/.staging_${name}_${java.util.UUID.randomUUID().toString.take(8)}")
    val live = new Path(path(name))
    val trash = new Path(s"$root/.trash_${name}_${java.util.UUID.randomUUID().toString.take(8)}")
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(staging.toString)
    val f = fs
    if (f.exists(live)) {
      if (!f.rename(live, trash))
        throw new IllegalStateException(s"TableStore: could not stage out $live")
    }
    if (!f.rename(staging, live))
      throw new IllegalStateException(s"TableStore: could not promote $staging to $live")
    f.delete(trash, true)
    spark.catalog.refreshByPath(live.toString)
  }

  /** Append (reference S5: fact bronze accumulates landed files,
    * 1_full_load_fact.py:59-63). `partitionBy` must match the table's
    * existing layout.
    */
  def append(name: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Append)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path(name))
  }

  /** Replace ONLY the partitions present in `df`, leaving all other
    * partition directories untouched (dynamic-partition-overwrite
    * semantics, catalog-free). This is what makes incremental recompute
    * partition-local at scale: an increment touching 2 months moves 2
    * directories, not a 10-year table.
    */
  def overwritePartitions(name: String, df: DataFrame, partitionBy: Seq[String]): Unit = {
    require(partitionBy.nonEmpty, "overwritePartitions needs partition columns")
    if (!exists(name)) { overwrite(name, df, partitionBy); return }
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val staging = new Path(s"$root/.staging_${name}_$stamp")
    val trash = new Path(s"$root/.trash_${name}_$stamp")
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*).parquet(staging.toString)
    val f = fs
    def leafDirs(base: Path, depth: Int): Seq[Path] =
      if (depth == 0) Seq(base)
      else f.listStatus(base).filter(_.isDirectory).toSeq
        .flatMap(st => leafDirs(st.getPath, depth - 1))
    val live = new Path(path(name))
    f.mkdirs(trash)
    val stagingPath = f.makeQualified(staging).toUri.getPath
    leafDirs(staging, partitionBy.length).foreach { sp =>
      val rel = sp.toUri.getPath.stripPrefix(stagingPath).stripPrefix("/")
      val lp = new Path(live, rel)
      if (f.exists(lp) && !f.rename(lp, new Path(trash, rel.replace("/", "_"))))
        throw new IllegalStateException(s"TableStore: could not stage out partition $lp")
      if (!f.exists(lp.getParent)) f.mkdirs(lp.getParent)
      if (!f.rename(sp, lp))
        throw new IllegalStateException(s"TableStore: could not promote partition $sp")
    }
    f.delete(staging, true)
    f.delete(trash, true)
    spark.catalog.refreshByPath(live.toString)
  }

  /** DROP TABLE (reference S15: staging teardown, 2_incremental:300-306). */
  def drop(name: String): Unit = fs.delete(new Path(path(name)), true)

  /** Create-or-merge decision support (reference S18:
    * `spark.catalog.tableExists`, 1_full_load_fact:155).
    */
  def overwriteIfAbsentElse(name: String, df: DataFrame)(merge: DataFrame => DataFrame): Unit =
    if (!exists(name)) overwrite(name, df)
    else overwrite(name, merge(read(name)))
}
