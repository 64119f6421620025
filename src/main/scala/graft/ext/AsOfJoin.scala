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
  * spot for ANY per-key ordered semantics; at 100 TB you would additionally
  * range-bucket time within the hot key and carry bucket boundaries, which
  * composes with this plan but is not needed below millions of rows per key.)
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
}
