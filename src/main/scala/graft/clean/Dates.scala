package graft.clean

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Date parsing + calendar spine — SURVEY.md §2.3 F11-F15.
  *
  * Key semantic (F11): multi-format parse where an unparseable string yields
  * NULL, never an error — reference coalesces `try_to_date` over format
  * lists (3_pricing_data_processing.py:100-114 — 8 formats;
  * 1_full_load_fact.py:117-125 — 4 formats with weekday-prefix strip).
  * Coalesce order is semantic: for `1/8/25`, `M/d/yy` before `d/M/yy` decides
  * Jan 8 vs Aug 1 — preserve the caller's order.
  */
object Dates {

  /** F3 — strip long-form weekday prefix `"Monday, "` before parsing
    * (1_full_load_fact:111-114).
    */
  def stripWeekday(c: Column): Column =
    regexp_replace(c, "^[A-Za-z]+,\\s*", "")

  /** F11 — first-format-wins multi-format parse; all-fail → NULL. */
  def multiFormatDate(c: Column, formats: Seq[String]): Column =
    coalesce(formats.map(f => try_to_date(c, f)): _*)

  /** The reference's order-date parser: weekday strip + 4 formats in the
    * reference's exact coalesce order (1_full_load_fact:117-125).
    * Single-digit-day long forms ("Saturday, January 3, 2026")
    * intentionally fall to NULL — observed reference behavior (SURVEY §7.5).
    */
  val orderDateFormats: Seq[String] =
    Seq("yyyy/MM/dd", "dd-MM-yyyy", "dd/MM/yyyy", "MMMM dd, yyyy")

  def parseOrderDate(c: Column): Column =
    multiFormatDate(stripWeekday(c), orderDateFormats)

  /** The reference's price-month parser, exact coalesce order
    * (3_pricing:100-114). Order is load-bearing twice over: fixed-width
    * `dd/MM/yyyy` rejects single-digit "7/1/25" (falls through to `M/d/yy`
    * → Jul 1) but claims "05/06/2025" as Jun 5 before `M/d/yyyy` could read
    * May 6.
    */
  val priceMonthFormats: Seq[String] =
    Seq("yyyy/MM/dd", "dd/MM/yyyy", "yyyy-MM-dd", "dd-MM-yyyy",
      "M/d/yy", "MM/dd/yy", "M/d/yyyy", "MM/dd/yyyy")

  def parsePriceMonth(c: Column): Column = multiFormatDate(c, priceMonthFormats)

  /** F15 — daily→month-start alignment (1_full_load_fact:217). */
  def monthStart(c: Column): Column = trunc(c, "MM")

  /** Epoch milliseconds of either timestamp flavor. Parquet written by
    * pandas/pyarrow without a timezone arrives as TIMESTAMP_NTZ — the most
    * common flavor in real crawl/event data — and `unix_millis` rejects it,
    * so every epoch-arithmetic operator must route through here instead of
    * calling `unix_millis` directly. NTZ goes through a cast to TIMESTAMP
    * (interpreted in the session timezone, pinned UTC by Verify/Bench, so
    * NTZ ≡ LTZ numerically and oracle replays are unchanged); exact integer
    * millis either way. `dt` is the column's resolved type
    * (`df.schema(name).dataType`) — Column alone carries no type before
    * analysis, so the caller supplies it.
    */
  def epochMillis(c: Column, dt: DataType): Column = dt match {
    case TimestampType => unix_millis(c)
    case TimestampNTZType | DateType => unix_millis(wallClockAsUtc(c))
    case other =>
      throw new IllegalArgumentException(
        s"epochMillis: expected a timestamp/date column, got $other")
  }

  /** A naive (NTZ/DATE) wall clock as a TIMESTAMP carrying that wall time
    * AS IF UTC, independent of the session timezone: the session-zone cast
    * is inverted by adding the zone offset back (`from_utc_timestamp`), so
    * epoch arithmetic over naive timestamps cannot skew gaps or fold/split
    * sessions across DST transitions when a library caller runs in a
    * non-UTC session. Within a transition hour itself the offset is
    * evaluated at the shifted instant — the irreducible ambiguity of naive
    * local times; in UTC sessions (Verify/Bench pin one) the wrapper is an
    * exact identity, so every oracle replay is unchanged.
    */
  private def wallClockAsUtc(c: Column): Column =
    from_utc_timestamp(c.cast(TimestampType), expr("current_timezone()"))

  /** Epoch seconds (fractional, DOUBLE) of either timestamp flavor; plain
    * numeric columns pass through a double cast unchanged — the contract
    * range/bin operators need when one call site takes either a time axis
    * or a numeric axis. Micros-through-double is exact to well past 2100
    * (2^53 µs ≈ year 2255).
    */
  def epochSeconds(c: Column, dt: DataType): Column = dt match {
    case TimestampType => unix_micros(c) / 1e6
    case TimestampNTZType | DateType => unix_micros(wallClockAsUtc(c)) / 1e6
    case _ => c.cast("double")
  }

  /** F12-F14 — dim_date month spine (dim_date_table_creation.py:17-46):
    * one row per month start in [start, end], with yyyyMM int key, names,
    * quarter labels.
    */
  def monthSpine(spark: SparkSession, start: String, end: String): DataFrame = {
    val spine = spark.sql(
      s"SELECT explode(sequence(to_date('$start'), to_date('$end'), interval 1 month)) AS month_start_date")
    spine
      .withColumn("date_key", date_format(col("month_start_date"), "yyyyMM").cast("int"))
      .withColumn("year", year(col("month_start_date")))
      .withColumn("month_name", date_format(col("month_start_date"), "MMMM"))
      .withColumn("month_short_name", date_format(col("month_start_date"), "MMM"))
      .withColumn("quarter", concat(lit("Q"), quarter(col("month_start_date"))))
      .withColumn("year_quarter",
        concat(col("year"), lit("-Q"), quarter(col("month_start_date"))))
  }
}
