package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the payload of the
  * single right row with the greatest `rightTime` at-or-before (`inclusive`)
  * or strictly-before the left row's `leftTime`, within the same key group —
  * the lookup a training-data pipeline does when it joins facts to the
  * feature/dimension state that was current when the fact happened, without
  * leaking future data.
  *
  * == Why not a join? ==
  * The naive form — `left JOIN right ON key AND rt <= lt`, then argmax per
  * left row — materializes every (left row × earlier right row) pair before
  * discarding all but one: O(|L| × avg right rows per key) intermediate rows,
  * quadratic on an active key and the classic as-of scale trap. This
  * implementation never builds that product. Both sides are tagged and
  * UNIONed, shuffled ONCE on the key, and sorted within each key by
  * (time, side, tieBreak); a running `last(payload, ignoreNulls)` window then
  * carries the most recent right payload forward into each left row. Cost is
  * one exchange + one sort of |L| + |R| rows — the same class as any per-key
  * ordered operator, with no pairwise blow-up. (A per-key hot spot is a hot
  * spot for ANY per-key ordered semantics; [[asOfBucketed]] is the 100 TB
  * composition for that case — it range-buckets time WITHIN each key and
  * carries bucket-boundary state, so no partition ever holds a whole hot
  * key. Use plain [[asOf]] below millions of rows per key.)
  *
  * == Determinism ==
  * Right rows tied on (key, time) are resolved by `tieBreak` columns,
  * ascending, last wins — pass a unique id to make the result a function of
  * the data. Right rows with a NULL time cannot be ordered and are dropped;
  * so are right rows with a NULL key (NULL = NULL never matches in a join,
  * and a left row with a NULL key carries a NULL payload).
  * The payload is carried as ONE struct, so a right row whose payload
  * columns are themselves NULL still wins over an older row (the struct is
  * non-null; `ignoreNulls` skips only rows from the left side).
  *
  * `tolerance`: optional maximum staleness (e.g. `expr("INTERVAL 30 DAYS")`)
  * — a carried payload older than `leftTime - tolerance` is nulled out, the
  * `merge_asof(tolerance=…)` contract.
  */
object AsOfJoin {

  /** Left as-of join. Output = every `left` row (unchanged, in full) plus
    * `rightCols` from the matched right row (NULL when no right row
    * qualifies). `rightCols` must not collide with left column names —
    * rename on the right side first.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightCols: Seq[String],
      tieBreak: Seq[String] = Nil, inclusive: Boolean = true,
      tolerance: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "asOf: at least one key column required")
    require(rightCols.nonEmpty, "asOf: rightCols must name the payload to carry")
    val collide = rightCols.toSet intersect left.columns.toSet
    require(collide.isEmpty, s"asOf: rightCols collide with left columns: $collide")
    val reserved = Set("_rt", "_t", "_side", "_p", "_tb", "_c")
    val hit = (left.columns.toSet ++ right.columns.toSet ++ rightCols) intersect reserved
    require(hit.isEmpty, s"asOf: reserved column names in use: $hit")

    // side ordering encodes the time predicate: inclusive (rt <= lt) sorts an
    // equal-time right row BEFORE the left row (visible); strict (rt < lt)
    // sorts it after (invisible). tieBreak only ever orders right rows, so it
    // is constant (empty struct fields dropped) on the left side.
    val (rightSide, leftSide) = if (inclusive) (0, 1) else (1, 0)
    val payload = struct(
      col(rightTime).as("_rt") +: rightCols.map(col): _*)
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(leftSide))
    val r = right
      // a NULL time cannot be ordered; a NULL key never matches under join
      // semantics — without this filter the window's NULL-safe partitioning
      // would hand NULL-key left rows a NULL-key right payload
      .filter(col(rightTime).isNotNull &&
        keys.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keys.map(col) :+
          col(rightTime).as("_t") :+
          lit(rightSide).as("_side") :+
          payload.as("_p") :+
          (if (tieBreak.nonEmpty) struct(tieBreak.map(col): _*) else lit(null))
            .as("_tb"): _*)

    // unionByName(allowMissingColumns): left rows read NULL for the right
    // payload; right rows read NULL for every left-only column.
    val tagged = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_side"), col("_tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carriedRaw = last(col("_p"), ignoreNulls = true).over(w)
    val carried = tolerance match {
      case Some(tol) => when(carriedRaw("_rt") >= col("_t") - tol, carriedRaw)
      case None => carriedRaw
    }

    tagged
      .withColumn("_c", carried)
      .filter(col("_side") === leftSide)
      .select(left.columns.map(col) ++ rightCols.map(c => col(s"_c.$c").as(c)): _*)
  }

  /** [[asOf]] for hot keys: identical contract and output, different plan.
    *
    * Plain [[asOf]] sorts each key group inside ONE partition — a key with
    * hundreds of millions of rows (one celebrity user, one instrument) is a
    * single-task sort however large the cluster. This variant composes the
    * documented escape hatch: rows shuffle on `(keys, bucketOf(time))`, so
    * a hot key splits across as many partitions as it has live time
    * buckets, and per-bucket carry state is reconciled through a
    * bucket-granular boundary pass:
    *
    *   1. the same union + running-`last` window as [[asOf]], but
    *      partitioned by (keys, bucket) — each left row learns the latest
    *      in-bucket right payload;
    *   2. per (key, bucket), the bucket's FINAL right payload (argmax by
    *      time + tieBreak — one row per non-empty bucket);
    *   3. a running-`last` window over the per-key BUCKET SPINE (one row
    *      per distinct bucket, `rowsBetween(…, -1)` so a bucket sees only
    *      strictly-earlier buckets) assigns every bucket its carry-in;
    *   4. each left row takes `coalesce(in-bucket, carry-in)`.
    *
    * Step 3's sort is over bucket summaries, not rows — the hot key's cost
    * is spread; nothing is ever per-pair. Earlier-bucket payloads satisfy
    * both inclusive and strict time predicates outright (bucket(rt) <
    * bucket(lt) ⇒ rt < lt), so `inclusive` only shapes the in-bucket
    * window, exactly as in [[asOf]].
    *
    * `bucketOf` maps a time column to a bucket id that must be
    * monotonically non-decreasing in time (e.g.
    * `t => floor(unix_timestamp(t) / lit(86400))` for daily buckets over
    * timestamps, or integer division for long times). Size it so one
    * bucket of the hottest key fits a partition; every other key pays one
    * cheap extra column and a bucket-spine window of its own bucket count.
    */
  def asOfBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightCols: Seq[String],
      bucketOf: Column => Column,
      tieBreak: Seq[String] = Nil, inclusive: Boolean = true,
      tolerance: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "asOfBucketed: at least one key column required")
    require(rightCols.nonEmpty, "asOfBucketed: rightCols must name the payload to carry")
    val collide = rightCols.toSet intersect left.columns.toSet
    require(collide.isEmpty, s"asOfBucketed: rightCols collide with left columns: $collide")
    val reserved = Set("_rt", "_t", "_side", "_p", "_tb", "_c", "_bk", "_rn", "_bf", "_bc")
    val hit = (left.columns.toSet ++ right.columns.toSet ++ rightCols) intersect reserved
    require(hit.isEmpty, s"asOfBucketed: reserved column names in use: $hit")

    val (rightSide, leftSide) = if (inclusive) (0, 1) else (1, 0)
    val payload = struct(col(rightTime).as("_rt") +: rightCols.map(col): _*)
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(leftSide))
    val r = right
      .filter(col(rightTime).isNotNull && keys.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keys.map(col) :+
          col(rightTime).as("_t") :+
          lit(rightSide).as("_side") :+
          payload.as("_p") :+
          (if (tieBreak.nonEmpty) struct(tieBreak.map(col): _*) else lit(null))
            .as("_tb"): _*)

    val tagged = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_bk", bucketOf(col("_t")))
    val bkeys = keys.map(col) :+ col("_bk")

    // 1. in-bucket carry — asOf's window, partitioned one bucket finer
    val wIn = Window.partitionBy(bkeys: _*)
      .orderBy(col("_t").asc, col("_side"), col("_tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = tagged.withColumn("_c", last(col("_p"), ignoreNulls = true).over(wIn))

    // 2. bucket-final right payload: deterministic argmax by (time, tieBreak)
    val wFin = Window.partitionBy(bkeys: _*)
      .orderBy(col("_t").desc, col("_tb").desc)
    val bucketFinal = r.withColumn("_bk", bucketOf(col("_t")))
      .withColumn("_rn", row_number().over(wFin))
      .filter(col("_rn") === 1)
      .select(keys.map(col) :+ col("_bk") :+ col("_p").as("_bf"): _*)

    // 3. carry-in over the bucket spine: one row per (key, live bucket);
    // rowsBetween(…, -1) excludes the bucket's own final (in-bucket rows
    // already saw it when it applies)
    val spine = tagged.select(bkeys: _*).distinct()
    val wCarry = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_bk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = spine
      .join(bucketFinal, keys :+ "_bk", "left")
      .withColumn("_bc", last(col("_bf"), ignoreNulls = true).over(wCarry))
      .select(keys.map(col) :+ col("_bk") :+ col("_bc"): _*)

    // 4. resolve + tolerance, exactly asOf's tail
    val chosenRaw = coalesce(col("_c"), col("_bc"))
    val chosen = tolerance match {
      case Some(tol) => when(chosenRaw("_rt") >= col("_t") - tol, chosenRaw)
      case None => chosenRaw
    }
    inBucket
      .join(carryIn, keys :+ "_bk", "left")
      .withColumn("_c", chosen)
      .filter(col("_side") === leftSide)
      .select(left.columns.map(col) ++ rightCols.map(c => col(s"_c.$c").as(c)): _*)
  }
}
