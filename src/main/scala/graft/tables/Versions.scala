package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Versioned tables — Delta-style TIME TRAVEL over plain parquet
  * [[TableStore]] tables: every overwrite lands as a NEW immutable version
  * directory (`<name>__v<N>`), a one-row-per-version manifest tracks what
  * exists, and reads resolve either the latest or any retained version.
  * The reference platform gets this from Delta (`VERSION AS OF`); this is
  * the storage-agnostic re-expression — what a reproducibility audit or a
  * bad-deploy rollback needs from a curation pipeline's output tables
  * ("which corpus snapshot trained run 47?").
  *
  * Semantics:
  *  - [[overwrite]] writes version latest+1 ATOMICALLY (the TableStore
  *    staging+rename), THEN appends the manifest row, then prunes versions
  *    beyond `keep` — a crash between steps leaves either an orphan
  *    version dir (invisible: never entered the manifest; the next
  *    overwrite of that slot replaces it) or an unpruned old version
  *    (harmless, pruned next time). Readers never see a half-written
  *    version.
  *  - [[read]] with no version = latest; with a version = that snapshot,
  *    failing fast if it was pruned or never existed.
  *  - Single-writer per table, like the rest of [[TableStore]] — version
  *    numbering comes from the manifest, not a lock service.
  *
  * Scale notes: versions are whole immutable snapshots (the overwrite
  * tables this targets are serving outputs, not the 100 TB fact store —
  * for those, [[Upsert.mergePartitioned]] + partition-level retention is
  * the right tool); the manifest is O(versions) rows and reads as one
  * tiny scan.
  */
object Versions {

  private def manifest(name: String) = s"${name}__vmanifest"
  private def vtable(name: String, v: Long) = s"${name}__v$v"

  /** Retained versions, ascending (empty → never written). */
  def versions(store: TableStore, name: String): Seq[Long] =
    if (!store.exists(manifest(name))) Seq.empty
    else store.read(manifest(name)).select(col("version"))
      .collect().map(_.getLong(0)).sorted.toSeq

  /** Latest version number, if any. */
  def latest(store: TableStore, name: String): Option[Long] =
    versions(store, name).lastOption

  /** Write `df` as the next version; returns the new version number. */
  def overwrite(store: TableStore, name: String, df: DataFrame,
      keep: Int = 3): Long = {
    require(keep >= 1, s"must keep at least the latest version, got $keep")
    val spark = df.sparkSession
    import spark.implicits._
    val vs = versions(store, name)
    val v = vs.lastOption.getOrElse(0L) + 1
    store.overwrite(vtable(name, v), df)
    val kept = (vs :+ v).takeRight(keep)
    // manifest rewrite is the COMMIT point: the new version becomes
    // visible and pruned versions stop being addressable in one swap
    store.overwrite(manifest(name), kept.toDF("version"))
    (vs :+ v).dropRight(keep).foreach(old => store.drop(vtable(name, old)))
    v
  }

  /** Read the latest (default) or a specific retained version. */
  def read(store: TableStore, name: String, version: Option[Long] = None): DataFrame = {
    val vs = versions(store, name)
    require(vs.nonEmpty, s"Versions: no versions of '$name' exist")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v),
      s"Versions: version $v of '$name' is not retained (have: ${vs.mkString(",")})")
    store.read(vtable(name, v))
  }

  /** Delta-style RESTORE: re-publish a retained snapshot's content as the
    * NEW latest version (never a rollback of the manifest — the restore
    * itself is an audited, diffable event, and the bad version stays
    * addressable until retention ages it out). Returns the new version
    * number; `diff(bad, restored)` then reads as the exact undo.
    */
  def restore(store: TableStore, name: String, version: Long,
      keep: Int = 3): Long =
    overwrite(store, name, read(store, name, Some(version)), keep)

  /** Drop every version and the manifest. */
  def drop(store: TableStore, name: String): Unit = {
    versions(store, name).foreach(v => store.drop(vtable(name, v)))
    store.drop(manifest(name))
  }

  /** Row-level diff between two retained versions keyed by `idCol`:
    * added / removed / changed / unchanged per id — the drill-down behind
    * "what changed between the snapshot run 46 trained on and run 47's".
    * Each side projects to (id, md5 of the sorted-column row JSON) BEFORE
    * the full-outer join, so 16-byte digests shuffle, never row bodies
    * (the [[graft.ext.Dedup.snapshotDiff]] shape generalized from one
    * text column to whole rows; sorting column names makes the digest
    * stable under projection order, and both sides hash in the SAME
    * engine, so serialization quirks cancel).
    */
  def diff(store: TableStore, name: String, vOld: Long, vNew: Long,
      idCol: String): DataFrame = {
    def dig(df: DataFrame, out: String) = {
      val cols = df.columns.filterNot(_ == idCol).sorted.map(col)
      df.select(col(idCol), md5(to_json(struct(cols: _*))).as(out))
    }
    dig(read(store, name, Some(vOld)), "_h_base")
      .join(dig(read(store, name, Some(vNew)), "_h_next"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_h_base").isNull, "added")
          .when(col("_h_next").isNull, "removed")
          .when(col("_h_base") === col("_h_next"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
