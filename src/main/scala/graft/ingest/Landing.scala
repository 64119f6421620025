package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Landing-zone file archival — SURVEY.md §2.1 S10.
  *
  * Reference: `dbutils.fs.ls` + `dbutils.fs.mv` loop moving processed CSVs
  * landing→processed after ingest (1_full_load_fact.py:72-78,
  * 2_incremental_load_fact.py:95-101). Driver-side metadata ops only — file
  * bytes never move through Spark.
  */
object Landing {

  /** Plain files under `dir`, excluding hidden/marker names (`_SUCCESS`,
    * `.tmp` in-flight uploads) — the same filter Spark's own directory
    * listing applies; passing explicit paths to `spark.read` bypasses it,
    * so it must happen here.
    */
  def list(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isFile)
      .filterNot(st => st.getPath.getName.startsWith("_") || st.getPath.getName.startsWith("."))
      .map(_.getPath.toString).toSeq.sorted
  }

  /** Move every plain file in `landing` into `processed`, creating it if
    * needed. Returns the moved file names.
    *
    * The same hidden/marker filter as [[list]] applies: an in-flight
    * `.tmp`/`._*` upload or a `_SUCCESS` marker is never swept into
    * `processed` without having been ingested. Files [[list]] DID return
    * but a COPY INTO `PATTERN` excluded are still archived — that mirrors
    * the reference's sweep-everything move (1_full_load_fact.py:72-78),
    * where the landing dir is owned by exactly one load and anything
    * non-matching is debris by definition.
    */
  def archive(spark: SparkSession, landing: String, processed: String): Seq[String] = {
    val lp = new Path(landing)
    val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(lp)) return Seq.empty
    val pp = new Path(processed)
    if (!fs.exists(pp)) fs.mkdirs(pp)
    fs.listStatus(lp).filter(_.isFile)
      .filterNot(st => st.getPath.getName.startsWith("_") || st.getPath.getName.startsWith("."))
      .map { st =>
        val dst = new Path(pp, st.getPath.getName)
        if (!fs.rename(st.getPath, dst))
          throw new IllegalStateException(s"Landing: could not archive ${st.getPath}")
        st.getPath.getName
      }.toSeq.sorted
  }
}
