package graft.tables

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

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

  def exists(name: String): Boolean = {
    val p = new Path(path(name))
    if (fs.exists(p)) true
    else { recoverIfInterrupted(name); fs.exists(p) }
  }

  /** Crash recovery for [[overwrite]]'s two-rename swap. The swap is
    * live→trash then staging→live; a crash between the renames leaves the
    * table observably missing even though the staging dir holds the
    * complete new table (data + schema sidecar are fully durable before
    * any rename starts — the overwrite is logically committed at that
    * point). So: live absent + a sidecar-complete staging dir → promote
    * the staging (finishing the interrupted overwrite); live absent + only
    * a trash dir (unreachable under the rename order, defended anyway) →
    * restore the trash. Runs lazily from [[exists]] (which [[read]] and
    * [[schemaOf]] route through), so no caller ever observes the missing
    * window; a staging dir without its sidecar is an abandoned mid-write
    * crash and is left for [[overwrite]]'s sweep. No-op in the normal
    * case beyond one exists() probe.
    */
  private def recoverIfInterrupted(name: String): Unit = {
    val live = new Path(path(name))
    def dirs(prefix: String) = swapDirs(prefix, name)
    val staged = dirs("staging").filter(st => fs.exists(schemaSidecar(st.getPath)))
    val candidate =
      if (staged.nonEmpty) Some(staged.maxBy(_.getModificationTime).getPath)
      else dirs("trash") match {
        case t if t.nonEmpty => Some(t.maxBy(_.getModificationTime).getPath)
        case _ => None
      }
    candidate.foreach { c =>
      if (fs.rename(c, live)) {
        (dirs("trash") ++ dirs("staging")).foreach(st => fs.delete(st.getPath, true))
        spark.catalog.refreshByPath(live.toString)
      }
    }
  }

  /** The swap dirs belonging to exactly table `name`: the suffix must be
    * the 8-hex-char UUID [[overwrite]] appends — a bare `{name}_*` glob
    * would also match tables that merely share the prefix (`idx` vs
    * `idx_codes`), and recovery/sweep must never touch a neighbor's dirs.
    */
  private def swapDirs(prefix: String, name: String): Array[org.apache.hadoop.fs.FileStatus] = {
    val re = ("\\." + prefix + "_" + java.util.regex.Pattern.quote(name) +
      "_[0-9a-f]{8}").r
    Option(fs.globStatus(new Path(s"$root/.${prefix}_${name}_*")))
      .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
      .filter(st => re.pattern.matcher(st.getPath.getName).matches())
  }

  /** Read with the table's recorded schema when one exists: files written
    * before a schema evolution lack the newer columns in their footers, and
    * an explicit read schema null-fills them (parquet reads missing columns
    * as NULL) — without paying a mergeSchema footer sweep over every file,
    * which is the 100 TB-hostile alternative.
    */
  def read(name: String): DataFrame = schemaOf(name) match {
    case Some(st) => spark.read.schema(st).parquet(path(name))
    case None => spark.read.parquet(path(name))
  }

  // ---- schema evolution (reference S7: `option("mergeSchema", true)` on
  // every silver write, e.g. 1_customer_data_processing.py:255) ----

  /** Sidecar file inside the table dir recording the authoritative table
    * schema. Underscore-prefixed, so Spark's file listing ignores it (same
    * convention as `_SUCCESS`). Rewritten by every write that can change
    * the schema; swapped atomically with the data on overwrite.
    */
  private def schemaSidecar(dir: Path): Path = new Path(dir, "_graft_schema.json")

  /** The table's recorded schema (sidecar), or footer-inferred for tables
    * predating the sidecar, or None when the table doesn't exist.
    */
  def schemaOf(name: String): Option[StructType] = {
    if (!exists(name)) None
    else {
      val sc = schemaSidecar(new Path(path(name)))
      if (fs.exists(sc)) {
        val in = fs.open(sc)
        val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        Some(DataType.fromJson(json).asInstanceOf[StructType])
      } else Some(spark.read.parquet(path(name)).schema)
    }
  }

  private def writeSidecar(dir: Path, schema: StructType): Unit = {
    val out = fs.create(schemaSidecar(dir), true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
  }

  /** Union of table and incoming schemas: table columns keep their position,
    * brand-new incoming columns append at the end (Delta mergeSchema order);
    * same-name columns must agree on type — conflicting types are rejected
    * rather than silently written as mixed parquet footers.
    */
  /** Recursively force every nested nullability flag to true (StructField
    * nullable, ArrayType containsNull, MapType valueContainsNull) so types
    * differing only in those flags compare equal. Spark's own
    * `DataType.asNullable` is `private[sql]`, so this is a local equivalent.
    */
  private def permissive(dt: DataType): DataType = dt match {
    case st: StructType =>
      StructType(st.fields.map(f => f.copy(dataType = permissive(f.dataType), nullable = true)))
    case at: org.apache.spark.sql.types.ArrayType =>
      at.copy(elementType = permissive(at.elementType), containsNull = true)
    case mt: org.apache.spark.sql.types.MapType =>
      mt.copy(keyType = permissive(mt.keyType), valueType = permissive(mt.valueType),
        valueContainsNull = true)
    case other => other
  }

  private def unionSchema(table: String, existing: StructType, incoming: StructType): StructType = {
    val byName = incoming.fields.map(f => f.name -> f).toMap
    val merged = existing.fields.map { ef =>
      byName.get(ef.name) match {
        // nested types differing only in inner-field nullability /
        // containsNull (CSV-inferred all-nullable vs computed frames) are
        // compatible — merge to the permissive shape instead of rejecting
        case Some(inf) if permissive(inf.dataType) != permissive(ef.dataType) =>
          throw new IllegalArgumentException(
            s"TableStore: schema conflict on $table.${ef.name}: " +
              s"table has ${ef.dataType.simpleString}, incoming has ${inf.dataType.simpleString}")
        case Some(inf) =>
          val dt = if (inf.dataType == ef.dataType) ef.dataType else permissive(ef.dataType)
          ef.copy(dataType = dt, nullable = ef.nullable || inf.nullable)
        case None => ef.copy(nullable = true) // incoming lacks it → null-filled
      }
    }
    val existingNames = existing.fieldNames.toSet
    val added = incoming.fields.filterNot(f => existingNames(f.name))
      .map(_.copy(nullable = true)) // older files lack it → reads as NULL
    StructType(merged ++ added)
  }

  /** Project `df` onto `target`: matching columns pass through, columns the
    * frame lacks are null-filled at the target type.
    */
  private def alignTo(df: DataFrame, target: StructType): DataFrame = {
    val have = df.columns.toSet
    df.select(target.fields.toIndexedSeq.map { (f: StructField) =>
      if (have(f.name)) col(f.name) else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** Atomic overwrite: write staging, swap, drop previous. Safe when `df`
    * reads from the table being replaced.
    *
    * `partitionBy` lays the table out hive-style (e.g. month partitions for
    * the consolidated fact): partition-pruned scans + dynamic partition
    * pruning on dim-filtered star joins come free from Catalyst, and the
    * incremental affected-month rewrite touches only the changed
    * directories.
    */
  def overwrite(name: String, df: DataFrame, partitionBy: Seq[String] = Nil,
      mergeSchema: Boolean = false): Unit = {
    // mergeSchema: Delta's overwrite+mergeSchema keeps columns the new frame
    // dropped (null-filled) instead of narrowing the table (reference S7).
    val toWrite =
      if (mergeSchema) schemaOf(name).fold(df)(ex => alignTo(df, unionSchema(name, ex, df.schema)))
      else df
    // sweep leftovers of crashed swaps on this table: stale trash from a
    // crash after the promote, abandoned staging from a crash mid-write —
    // whatever is still here is superseded by this overwrite
    (swapDirs("staging", name) ++ swapDirs("trash", name))
      .foreach(st => fs.delete(st.getPath, true))
    val staging = new Path(s"$root/.staging_${name}_${java.util.UUID.randomUUID().toString.take(8)}")
    val live = new Path(path(name))
    val trash = new Path(s"$root/.trash_${name}_${java.util.UUID.randomUUID().toString.take(8)}")
    val w = toWrite.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(staging.toString)
    writeSidecar(staging, toWrite.schema)
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
    *
    * Schema evolution (reference S7, mergeSchema=true default to match the
    * reference's silver writes): an appended frame may add columns (older
    * files read back NULL there via the recorded union schema) or omit
    * columns (null-filled at write). Same-name/different-type conflicts are
    * rejected — the failure mode this replaces was silently appending mixed
    * parquet footers that read back wrong. With `mergeSchema=false` any
    * schema drift is rejected outright (Delta's strict default).
    */
  def append(name: String, df: DataFrame, partitionBy: Seq[String] = Nil,
      mergeSchema: Boolean = true): Unit = {
    val toWrite = schemaOf(name) match {
      case Some(existing) if mergeSchema =>
        val union = unionSchema(name, existing, df.schema)
        writeSidecar(new Path(path(name)), union)
        alignTo(df, union)
      case Some(existing) =>
        require(StructType(existing.map(_.copy(nullable = true))) ==
            StructType(df.schema.map(_.copy(nullable = true))),
          s"TableStore: append schema mismatch on $name (mergeSchema=false): " +
            s"table ${existing.simpleString} vs incoming ${df.schema.simpleString}")
        df
      case None => df
    }
    val w = toWrite.write.mode(SaveMode.Append)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path(name))
    if (!exists(name) || !fs.exists(schemaSidecar(new Path(path(name)))))
      writeSidecar(new Path(path(name)), toWrite.schema)
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
    // Same sidecar discipline as append: validate the incoming schema
    // against the recorded one (type drift rejected), align to the union,
    // and record the union — otherwise a partition rewrite adding a column
    // would write files whose column every subsequent sidecar-schema'd read
    // silently drops.
    val union = schemaOf(name).fold(df.schema)(ex => unionSchema(name, ex, df.schema))
    val aligned = alignTo(df, union)
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val staging = new Path(s"$root/.staging_${name}_$stamp")
    val trash = new Path(s"$root/.trash_${name}_$stamp")
    aligned.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*).parquet(staging.toString)
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
    writeSidecar(live, union)
    spark.catalog.refreshByPath(live.toString)
  }

  /** Remove the listed partition directories outright — DELETE of whole
    * partitions. The complement [[overwritePartitions]] cannot express: it
    * replaces only partitions PRESENT in the incoming frame, so a delete
    * that empties a partition would leave the old directory — and every
    * "deleted" row in it — live. Driver-side metadata operation: one
    * listing plus one rename-to-nothing per dropped directory, independent
    * of table size. Values match against the hive dir name after undoing
    * Spark's %-hex path escaping via `valueOf` equality (longs, dates and
    * plain strings — the partition-key types this store uses); NULL
    * partitions (`__HIVE_DEFAULT_PARTITION__`) are not addressable here.
    */
  def dropPartitions(name: String, partitionCol: String, values: Seq[Any]): Unit = {
    val base = new Path(path(name))
    if (values.isEmpty || !fs.exists(base)) return
    val want = values.map(String.valueOf).toSet
    def unescape(s: String): String = {
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '%' && i + 2 < s.length) {
          try { sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar); i += 3 }
          catch { case _: NumberFormatException => sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }
    fs.listStatus(base).filter(_.isDirectory).foreach { st =>
      val n = st.getPath.getName
      val eq = n.indexOf('=')
      if (eq > 0 && n.substring(0, eq) == partitionCol && want(unescape(n.substring(eq + 1))))
        fs.delete(st.getPath, true)
    }
    spark.catalog.refreshByPath(base.toString)
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
