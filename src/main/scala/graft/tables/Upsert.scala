package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Delta-style `MERGE INTO` semantics as a DataFrame rewrite — the
  * consolidation primitive the reference uses at six call sites
  * (SURVEY.md §2.6; e.g. 1_customer_data_processing.py:315-318,
  * 3_pricing_data_processing.py:263-277, 2_incremental_load_fact.py:290-291).
  *
  * Semantics replicated: rows are matched by equality on `keys`; matched
  * target rows get `updateCols` (default: all non-key columns) replaced by
  * source values; unmatched source rows are inserted (when `insert`);
  * unmatched target rows pass through untouched; NULL keys never match
  * (same as SQL equality / Delta). More than one source row matching one
  * target key is an error in Delta — policy configurable via
  * [[Upsert.DuplicatePolicy]] (SURVEY §7.5: dedup-first or document).
  *
  * Scale notes: single shuffled full-outer join on the merge keys (no
  * repeated semi/anti passes over the target); with AQE on, skewed keys
  * split automatically. For a small source vs huge target, Catalyst
  * broadcasts the source side of the join.
  */
object Upsert {

  sealed trait DuplicatePolicy
  object DuplicatePolicy {
    /** Lazily raise at execution time if >1 source row shares a merge key
      * (Delta's behavior, kept distributed via `raise_error`).
      */
    case object Error extends DuplicatePolicy
    /** Keep one arbitrary-but-deterministic row per key (ordered by all
      * non-key columns) before merging.
      */
    case object DedupDeterministic extends DuplicatePolicy
    /** Keep the last row per key by `orderCol` descending. */
    final case class KeepLatest(orderCol: String) extends DuplicatePolicy
  }

  /** MERGE INTO target USING source ON keys
    * WHEN MATCHED THEN UPDATE SET updateCols (when `update`)
    * WHEN NOT MATCHED THEN INSERT * (when `insert`)
    */
  def merge(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      updateCols: Option[Seq[String]] = None,
      update: Boolean = true,
      insert: Boolean = true,
      onDuplicate: DuplicatePolicy = DuplicatePolicy.Error): DataFrame = {
    require(keys.nonEmpty, "merge keys must be non-empty")
    val tCols = target.columns.toSeq
    require(source.columns.toSet == tCols.toSet,
      s"source/target column mismatch: ${source.columns.toSeq} vs $tCols")

    val keyW = Window.partitionBy(keys.map(col): _*)
    val src0 = source.select(tCols.map(col): _*)
    val src = onDuplicate match {
      case DuplicatePolicy.Error =>
        // Distributed lazy check — no extra driver action; the count window
        // rides the same shuffle as the merge join key.
        val err = raise_error(concat(
          lit(s"Upsert: multiple source rows share merge key ${keys.mkString(",")}: "),
          concat_ws(",", keys.map(k => col(k).cast("string")): _*)))
        val chk = src0.withColumn("_gm_cnt", count(lit(1)).over(keyW))
        tCols.find(!keys.contains(_)) match {
          case Some(guarded) =>
            // The raise_error guard wraps a NON-key column: rewriting a key
            // expression would hide the window's hashpartitioning(keys) from
            // the planner and force a second source shuffle before the join.
            chk.withColumn(guarded,
                when(col("_gm_cnt") > 1, err.cast(src0.schema(guarded).dataType))
                  .otherwise(col(guarded)))
              .drop("_gm_cnt")
          case None =>
            // Every column is a merge key: guard via a Filter instead of a
            // column rewrite, so no key expression is touched and the window's
            // hashpartitioning(keys) still reaches the merge join intact
            // (Filter preserves child output partitioning).
            chk.filter(when(col("_gm_cnt") > 1, err.cast("boolean"))
                .otherwise(lit(true)))
              .drop("_gm_cnt")
        }
      case DuplicatePolicy.DedupDeterministic =>
        val nonKeys = tCols.filterNot(keys.contains)
        val w = keyW.orderBy(nonKeys.map(c => col(c).asc_nulls_last): _*)
        src0.withColumn("_gm_rn", row_number().over(w))
          .filter(col("_gm_rn") === 1).drop("_gm_rn")
      case DuplicatePolicy.KeepLatest(orderCol) =>
        val w = keyW.orderBy(col(orderCol).desc_nulls_last)
        src0.withColumn("_gm_rn", row_number().over(w))
          .filter(col("_gm_rn") === 1).drop("_gm_rn")
    }

    // Presence markers — key nullability cannot signal side presence (a
    // null-key row exists on one side without matching anything).
    val t = target.withColumn("_gm_t", lit(true)).alias("t")
    val s = src.withColumn("_gm_s", lit(true)).alias("s")
    // NULL never matches: plain === (null keys fall out of both match sets,
    // landing as target-pass-through / source-insert rows — Delta-compatible).
    val cond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val joined = t.join(s, cond, "full_outer")

    val sMatched = col("s._gm_s").isNotNull
    val tMatched = col("t._gm_t").isNotNull
    val toUpdate = updateCols.getOrElse(tCols.filterNot(keys.contains)).toSet

    val out = tCols.map { c =>
      val fromS = col(s"s.$c")
      val fromT = col(s"t.$c")
      val v =
        if (keys.contains(c)) coalesce(fromT, fromS) // key: whichever side exists
        else when(tMatched && sMatched,
            if (update && toUpdate.contains(c)) fromS else fromT) // matched
          .when(tMatched && !sMatched, fromT) // target-only
          .otherwise(fromS) // source-only (insert candidate)
      v.as(c)
    }

    val merged = joined.select(out: _*)
    if (insert) merged
    else joined.filter(tMatched).select(out: _*)
  }

  /** Partition-scoped MERGE into a partitioned table: only the partitions
    * the source touches are read (static partition pruning via a collected
    * value list — partition counts are small by construction) and only
    * those directories are rewritten. The 100 TB incremental path: an
    * increment touching 2 months costs 2 partition scans + 2 directory
    * swaps, independent of table history length.
    */
  def mergePartitioned(
      store: TableStore,
      table: String,
      source: DataFrame,
      keys: Seq[String],
      partitionCol: String,
      update: Boolean = true,
      insert: Boolean = true,
      onDuplicate: DuplicatePolicy = DuplicatePolicy.Error): Unit = {
    require(keys.contains(partitionCol),
      s"partition column $partitionCol must be part of the merge keys " +
        "(otherwise a matched row could move across partitions)")
    if (!store.exists(table)) {
      store.overwrite(table, source, Seq(partitionCol))
      return
    }
    val touched = source.select(col(partitionCol)).distinct().collect().map(_.get(0))
    if (touched.isEmpty) return
    val slice = store.read(table)
      .filter(col(partitionCol).isin(touched.toIndexedSeq: _*))
    val merged = merge(slice, source, keys, None, update, insert, onDuplicate)
    store.overwritePartitions(table, merged, Seq(partitionCol))
  }
}
