package graft.ext

import graft.tables.TableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ONE implementation of the fingerprint-keyed hot-key CMS that bounds
  * a clapper's routine poll by the batch instead of the corpus — shared by
  * [[DedupIndex.capIfUnhealthy]] (hot band buckets) and
  * [[Bm25.capIfUnhealthy]] (hot terms), the same drift-risk rationale as
  * [[Clapper]]: two hand-kept mirrors of upper-bound arbitration state
  * WILL diverge, and this state has a correctness-critical invariant.
  *
  * Mechanics: a fixed-geometry [[graft.functions.CountMin]] sketch of the
  * index's hot-key occurrences (d = 4 × w = 8192), persisted as a table
  * with a constant `fp` column stamping the SOURCE table's listing
  * fingerprint at write time. [[upperBound]] reads min over hash rows of
  * the row max — for the true-max key every row holds a cell ≥ its count,
  * so each row's max dominates the true hot count. One-sided by
  * construction: collisions only ADD, so the bound never underestimates
  * the counts it saw.
  *
  * The INVARIANT the fingerprint enforces: the sketch must never reflect
  * FEWER occurrences than the source table holds (an undercount could
  * prove a decline that isn't true). Any mutation the fold did not see —
  * a crash between a source append and its fold, an external delete, a
  * rebuild — moves the source listing away from the stamped fp, and the
  * sketch reads as absent; the caller then pays the exact aggregate and
  * [[rebuild]]s. Deletes folded nowhere leave the sketch OVER-counting
  * only via a full rebuild's absence — and a stale fp forces that rebuild.
  *
  * Single-writer contract (the same one every index mutation here already
  * has): folds and rebuilds are read-merge-overwrite.
  *
  * Sizing rule, documented once: the bound inflates by ≈ total source
  * rows / width of background mass, so routine polls stay short-circuited
  * while source rows ≲ width × the caller's budget; past that the poll
  * degrades to the exact aggregate it replaces — never to a wrong
  * decision. Shard the index at that boundary.
  */
private[graft] object HotKeySketch {

  private val Depth = 4
  private val Width = 8192

  /** Rebuild the sketch from the full key stream (one occurrence per
    * row of `keys`, single column `k`) — the re-baseline every
    * exact-pay moment performs, shedding delete inflation and collision
    * drift. `fp` is the source listing captured by the caller.
    */
  def rebuild(store: TableStore, sketchT: String, keys: DataFrame,
      fp: String): Unit =
    store.overwrite(sketchT,
      graft.functions.CountMin.build(keys, "k", d = Depth, w = Width)
        .withColumn("fp", lit(fp)))

  /** Fold a committed increment's keys into an existing sketch. The
    * caller captures `fpBefore` (the source listing its append extends)
    * BEFORE mutating and `fpAfter` after: a sketch stamped with anything
    * but `fpBefore` missed a mutation and is dropped rather than
    * extended; a failed fold also drops — an absent sketch costs one
    * exact poll, a wrong one costs correctness. No-op when no sketch
    * exists (it is built lazily by the clapper — an index nobody polls
    * never pays the fold).
    */
  def fold(store: TableStore, sketchT: String, newKeys: DataFrame,
      fpBefore: String, fpAfter: String): Unit =
    if (store.exists(sketchT))
      try {
        val cur = store.read(sketchT)
        val fresh = cur.select(col("fp")).limit(1).collect()
          .headOption.exists(_.getString(0) == fpBefore)
        if (!fresh) store.drop(sketchT)
        else store.overwrite(sketchT,
          graft.functions.CountMin.merge(
            cur.select(col("row"), col("bucket"), col("cnt")),
            graft.functions.CountMin.build(newKeys, "k",
              d = Depth, w = Width))
            .withColumn("fp", lit(fpAfter)))
      } catch { case scala.util.control.NonFatal(_) =>
        try store.drop(sketchT)
        catch { case scala.util.control.NonFatal(_) => () }
      }

  /** The sketch's upper bound on the hottest key's occurrence count, or
    * None when no sketch exists, its fp mismatches `fp` (the live source
    * listing), or the read raced a swap — the caller falls back to the
    * exact aggregate.
    */
  def upperBound(store: TableStore, sketchT: String,
      fp: String): Option[Long] =
    try {
      if (!store.exists(sketchT)) None
      else {
        val cur = store.read(sketchT)
        val fresh = cur.select(col("fp")).limit(1).collect()
          .headOption.exists(_.getString(0) == fp)
        if (!fresh) None
        else cur.groupBy(col("row")).agg(max(col("cnt")).as("m"))
          .agg(min(col("m"))).collect()
          .headOption.map(row => if (row.isNullAt(0)) 0L else row.getLong(0))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Re-stamp a FRESH sketch to a new fingerprint after a content-
    * neutral rewrite (compaction) — the health-cache re-stamp idea. The
    * caller checks freshness against the PRE-rewrite listing and passes
    * the post-rewrite one; a stale sketch is left stale.
    */
  def restamp(store: TableStore, sketchT: String, fp: String): Unit =
    try store.overwrite(sketchT,
      store.read(sketchT).withColumn("fp", lit(fp)))
    catch { case scala.util.control.NonFatal(_) => () }

  /** Is the stored sketch stamped exactly `fp`? (The pre-compaction
    * freshness probe for [[restamp]].) */
  def isFresh(store: TableStore, sketchT: String, fp: String): Boolean =
    try store.exists(sketchT) &&
      store.read(sketchT).select(col("fp")).limit(1).collect()
        .headOption.exists(_.getString(0) == fp)
    catch { case scala.util.control.NonFatal(_) => false }
}
