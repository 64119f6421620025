package graft.ingest

import graft.tables.TableStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `COPY INTO`-style idempotent file append — SURVEY.md §2.1 S9.
  *
  * Reference: the parent incremental fact load
  * (Summit_Sporting_Goods_parent_company/incremental_load/
  * incremental_data_parent_company_query.txt:2-12) uses Databricks
  * `COPY INTO … FILEFORMAT = CSV`, which loads each file at most once.
  * Emulated here by tracking loaded file paths in a `<table>__copy_log`
  * sidecar table.
  *
  * Pruning happens at the LISTING level: the directory file list (driver
  * metadata op) is compared against the copy log and only unseen files are
  * ever opened. An anti-join over row-level `_metadata.file_path` would drop
  * the duplicate rows but still re-parse every historical byte on every
  * incremental run — at 100 TB that turns a 2-file increment into a full
  * table re-scan. The log side is never collected: the (small) listing
  * broadcasts into a semi-join against the log, so driver memory is bounded
  * by the directory size, not load history.
  *
  * Failure semantics: the data append commits before the copy log does, so
  * a crash between the two re-loads those files on the next run —
  * at-least-once under partial failure, exactly-once otherwise. The order
  * is deliberate: logging first would silently LOSE files on the same
  * crash. Downstream keyed upserts (the reference's consumption pattern)
  * absorb re-loaded rows; true exactly-once needs an atomic multi-table
  * commit, which plain parquet does not offer.
  */
object IdempotentCopy {

  /** Every URI rendering a path may have been logged under: the raw listing
    * string, the normalized URI (`file:///p` vs `file:/p` agree here), and
    * the bare path. Older logs recorded `_metadata.file_path`, whose
    * rendering can differ from `FileStatus.getPath.toString` — matching the
    * log against all renderings keeps already-loaded files seen across that
    * change (re-appending them would duplicate rows in append-only
    * consumers).
    */
  private def renderings(p: String): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(p)
    val uri = path.toUri
    // empty-authority form ("file:///p") — java.net.URI renders a null
    // authority as "file:/p", but Spark's _metadata.file_path logs the
    // triple-slash form; a log entry in either must still match
    val emptyAuthority =
      if (uri.getScheme != null && uri.getAuthority == null)
        Seq(s"${uri.getScheme}://${uri.getPath}")
      else Seq.empty
    (Seq(p, uri.toString, uri.getPath) ++ emptyAuthority).distinct
  }

  /** Append rows from CSV files under `srcDir` into `table`, skipping files
    * already recorded in the copy log. `project` applies the COPY INTO
    * select-list (casts/renames); `pattern` is the COPY INTO `PATTERN`
    * clause (a glob on the file name, e.g. `*.csv`). Returns number of
    * newly loaded files.
    */
  def copyInto(
      spark: SparkSession,
      store: TableStore,
      table: String,
      srcDir: String,
      project: DataFrame => DataFrame,
      header: Boolean = true,
      partitionBy: Seq[String] = Nil,
      pattern: Option[String] = None): Long = {
    import spark.implicits._
    val logTable = s"${table}__copy_log"
    val matcher = pattern.map(g =>
      java.nio.file.FileSystems.getDefault.getPathMatcher(s"glob:$g"))
    val listed = Landing.list(spark, srcDir).filter(p => matcher.forall(m =>
      m.matches(java.nio.file.Paths.get(new org.apache.hadoop.fs.Path(p).getName))))
    if (listed.isEmpty) return 0L
    // rendering → the listed path it belongs to
    val byRendering: Map[String, String] =
      listed.flatMap(p => renderings(p).map(_ -> p)).toMap
    val seen: Set[String] =
      if (!store.exists(logTable)) Set.empty
      else store.read(logTable)
        .join(broadcast(byRendering.keys.toSeq.toDF("_file_path")), Seq("_file_path"), "left_semi")
        .as[String].collect().toSet // bounded: ≤ |listing| × renderings
        .map(byRendering)
    val unseen = listed.filterNot(seen)
    if (unseen.isEmpty) return 0L
    val raw = spark.read.option("header", header.toString).csv(unseen: _*)
    store.append(table, project(raw), partitionBy)
    val logDf = unseen.toDF("_file_path")
    if (store.exists(logTable)) store.append(logTable, logDf)
    else store.overwrite(logTable, logDf)
    unseen.size.toLong
  }
}
