package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range (interval) join: pair every point row with every interval
  * row whose `[lo, hi]` contains the point — attribution windows, session
  * containment, calendar/maintenance-window lookup.
  *
  * == Why not write the predicate directly? ==
  * `points.join(intervals, t >= lo && t <= hi)` has no equi-condition, so
  * Catalyst plans BroadcastNestedLoopJoin — |P|×|I| comparisons, the
  * quadratic trap. With an equi-key prefix (`user_id` etc.) Spark shuffles
  * on the key but still pairs everything within a key group, which a hot
  * key turns back into the same trap.
  *
  * == The binning trick ==
  * Time is cut into fixed `binWidth`-second bins. Each interval row is
  * exploded to the bins it covers (`sequence(floor(lo/w), floor(hi/w))`);
  * each point row maps to exactly ONE bin. An ordinary equi-join on
  * (keys…, bin) then meets every qualifying pair — a point inside [lo, hi]
  * is necessarily in one of the interval's bins — and the exact predicate
  * filters bin-edge false positives. Because the point side maps to a
  * single bin, each (point, interval) pair meets exactly once: no dedup.
  *
  * Cost: |I| × (avg interval length / binWidth + 1) exploded rows + one
  * hash shuffle, instead of a nested loop. Size `binWidth` near the typical
  * interval length: one-to-few bins per interval, and a bin holds only
  * co-temporal rows, so even the keyless join stays linear-ish. Exactness
  * never depends on the bin width — only the pruning efficiency does.
  */
object RangeJoin {

  /** Join `points` (timestamp `tCol`) to `intervals` (`loCol`/`hiCol`
    * timestamps, inclusive ends) on containment, equi-restricted by `keys`
    * (present in both sides; may be empty for a global interval lookup).
    * Output columns: both sides' columns (keys once); names must not
    * otherwise collide — rename before joining.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      tCol: String, loCol: String, hiCol: String, binWidth: Long = 3600L,
      maxBinsPerInterval: Long = 100000L): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1 second, got $binWidth")
    require(maxBinsPerInterval >= 1, s"maxBinsPerInterval must be >= 1")
    val overlap = (points.columns.toSet intersect intervals.columns.toSet) -- keys
    require(overlap.isEmpty, s"non-key columns collide across sides: $overlap")
    require(!points.columns.contains("_bin") && !intervals.columns.contains("_bin"),
      "_bin is reserved")
    // epoch extraction is resolved-type-aware: TIMESTAMP and TIMESTAMP_NTZ
    // both bin on epoch seconds (NTZ parquet is the normal arrival flavor
    // for pandas-written event data), numeric axes stay on a plain double
    // cast — each side/bound dispatches on its own schema so a ts-points /
    // numeric-intervals mismatch fails in epochSeconds, not mid-join
    def binOf(dt: org.apache.spark.sql.types.DataType)(c: Column): Column =
      floor(graft.clean.Dates.epochSeconds(c, dt) / binWidth).cast("long")
    val binT = binOf(points.schema(tCol).dataType) _
    val binLo = binOf(intervals.schema(loCol).dataType) _
    val binHi = binOf(intervals.schema(hiCol).dataType) _
    val p = points.withColumn("_bin", binT(col(tCol)))
    val i = intervals
      // hi < lo matches nothing under the definitional predicate — drop it
      // here rather than let sequence() step BACKWARD and emit junk bins
      .filter(col(hiCol) >= col(loCol))
      // fail fast on runaway spans (an open-ended 9999-12-31 sentinel would
      // allocate a ~70M-element bin array PER ROW): assert_true throws at
      // action time with the offending bounds; the isNull filter keeps the
      // assertion referenced (it is NULL on success) so it cannot be pruned
      .filter(assert_true(
        binHi(col(hiCol)) - binLo(col(loCol)) < lit(maxBinsPerInterval),
        concat(lit(s"RangeJoin: interval spans >= $maxBinsPerInterval bins of $binWidth s — " +
          "raise binWidth or close the interval: lo="),
          col(loCol).cast("string"), lit(" hi="), col(hiCol).cast("string"))).isNull)
      .withColumn("_bin", explode(sequence(binLo(col(loCol)), binHi(col(hiCol)))))
    p.join(i, keys :+ "_bin")
      .filter(col(tCol) >= col(loCol) && col(tCol) <= col(hiCol))
      .drop("_bin")
  }

  /** Interval×interval OVERLAP join: pair every `left` interval
    * `[aLo, aHi]` with every `right` interval `[bLo, bHi]` that overlaps it
    * (`aLo <= bHi && bLo <= aHi`, inclusive ends), equi-restricted by
    * `keys` — concurrent-session detection, campaign/window attribution,
    * outage-vs-job blame.
    *
    * Same binning discipline as [[pointInInterval]], except BOTH sides
    * explode to their covered bins — so a pair sharing k bins would meet k
    * times. Rather than a `dropDuplicates` (a second shuffle over the full
    * output), each pair is emitted exactly once by the OWNER-BIN rule: keep
    * the meeting whose bin is the first bin of the overlap region,
    * `floor(max(aLo, bLo) / w)` — a codegen'd filter, no extra exchange.
    * Every overlapping pair has exactly one such bin, and both sides cover
    * it (it's within each interval's own [lo, hi] bin span).
    */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
      loL: String, hiL: String, loR: String, hiR: String, binWidth: Long = 3600L,
      maxBinsPerInterval: Long = 100000L): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1 second, got $binWidth")
    require(maxBinsPerInterval >= 1, s"maxBinsPerInterval must be >= 1")
    val overlapCols = (left.columns.toSet intersect right.columns.toSet) -- keys
    require(overlapCols.isEmpty, s"non-key columns collide across sides: $overlapCols")
    require(!left.columns.contains("_bin") && !right.columns.contains("_bin"),
      "_bin is reserved")
    def epochOf(df: DataFrame, c: String): Column =
      graft.clean.Dates.epochSeconds(col(c), df.schema(c).dataType)
    def binned(df: DataFrame, lo: String, hi: String): DataFrame = {
      def bin(c: String): Column = floor(epochOf(df, c) / binWidth).cast("long")
      df.filter(col(hi) >= col(lo))
        .filter(assert_true(
          bin(hi) - bin(lo) < lit(maxBinsPerInterval),
          concat(lit(s"RangeJoin: interval spans >= $maxBinsPerInterval bins of $binWidth s — " +
            "raise binWidth or close the interval: lo="),
            col(lo).cast("string"), lit(" hi="), col(hi).cast("string"))).isNull)
        .withColumn("_bin", explode(sequence(bin(lo), bin(hi))))
    }
    val a = binned(left, loL, hiL)
    val b = binned(right, loR, hiR)
    // exact predicate and owner bin both compare EPOCHS, not raw columns —
    // the sides may carry different axis flavors (TIMESTAMP vs NTZ vs
    // numeric) that Spark won't compare directly; micros/1e6 doubles keep
    // microsecond ordering exactly (double resolution at epoch scale is
    // ~0.5 µs, finer than the data)
    val (loLE, hiLE) = (epochOf(left, loL), epochOf(left, hiL))
    val (loRE, hiRE) = (epochOf(right, loR), epochOf(right, hiR))
    a.join(b, keys :+ "_bin")
      .filter(loLE <= hiRE && loRE <= hiLE)
      .filter(col("_bin") === floor(greatest(loLE, loRE) / binWidth).cast("long"))
      .drop("_bin")
  }
}
