package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // quotes: (key, time, quote_id, px); trades: (key, time, trade_id)
  private lazy val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 1L, 100.0),
    ("A", ts("2024-01-01 10:00:02"), 2L, 101.0),
    ("A", ts("2024-01-01 10:00:02"), 3L, 102.0), // tie on ts with quote 2
    ("A", ts("2024-01-01 10:00:05"), 4L, 103.0),
    ("B", ts("2024-01-01 10:00:03"), 5L, 200.0)
  ).toDF("key", "qts", "quote_id", "px")

  private lazy val trades = Seq(
    ("A", ts("2024-01-01 09:59:59"), 10L), // before any quote
    ("A", ts("2024-01-01 10:00:02"), 11L), // equal-time boundary
    ("A", ts("2024-01-01 10:00:04"), 12L),
    ("B", ts("2024-01-01 10:00:10"), 13L),
    ("C", ts("2024-01-01 10:00:10"), 14L)  // key with no quotes at all
  ).toDF("key", "tts", "trade_id")

  private def byTrade(df: DataFrame): Map[Long, (Any, Any)] =
    df.collect().map(r => r.getAs[Long]("trade_id") ->
      (r.getAs[Any]("quote_id"), r.getAs[Any]("px"))).toMap

  test("inclusive as-of picks the latest right row at-or-before, ties by tieBreak") {
    val got = byTrade(AsOfJoin.asOf(trades, quotes, Seq("key"), "tts", "qts",
      rightCols = Seq("quote_id", "px"), tieBreak = Seq("quote_id")))
    assert(got(10L) == ((null, null)))         // nothing at-or-before
    assert(got(11L) == ((3L, 102.0)))          // equal ts visible; tie -> max quote_id
    assert(got(12L) == ((3L, 102.0)))
    assert(got(13L) == ((5L, 200.0)))
    assert(got(14L) == ((null, null)))         // key never quoted
  }

  test("strict as-of excludes equal-time right rows") {
    val got = byTrade(AsOfJoin.asOf(trades, quotes, Seq("key"), "tts", "qts",
      rightCols = Seq("quote_id", "px"), tieBreak = Seq("quote_id"),
      inclusive = false))
    assert(got(11L) == ((1L, 100.0)))          // 10:00:02 quotes invisible
    assert(got(12L) == ((3L, 102.0)))
  }

  test("a matched row with NULL payload fields wins; it does not fall back to older rows") {
    val q = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1L, Some(100.0)),
      ("A", ts("2024-01-01 10:00:02"), 2L, None: Option[Double])
    ).toDF("key", "qts", "quote_id", "px")
    val t = Seq(("A", ts("2024-01-01 10:00:03"), 11L)).toDF("key", "tts", "trade_id")
    val got = byTrade(AsOfJoin.asOf(t, q, Seq("key"), "tts", "qts",
      rightCols = Seq("quote_id", "px"), tieBreak = Seq("quote_id")))
    assert(got(11L) == ((2L, null))) // quote 2 matched, its NULL px carried as-is
  }

  test("tolerance nulls out payloads older than the window") {
    val got = byTrade(AsOfJoin.asOf(trades, quotes, Seq("key"), "tts", "qts",
      rightCols = Seq("quote_id", "px"), tieBreak = Seq("quote_id"),
      tolerance = Some(expr("INTERVAL 3 SECONDS"))))
    assert(got(13L) == ((null, null))) // B's only quote is 7s stale
    assert(got(11L) == ((3L, 102.0)))  // 0s stale, kept
  }

  test("right rows with NULL time are dropped, not sorted first") {
    val q = Seq(
      ("A", Option(ts("2024-01-01 10:00:00")), 1L, 100.0),
      ("A", None: Option[Timestamp], 2L, 999.0)
    ).toDF("key", "qts", "quote_id", "px")
    val t = Seq(("A", ts("2024-01-01 10:00:03"), 11L)).toDF("key", "tts", "trade_id")
    val got = byTrade(AsOfJoin.asOf(t, q, Seq("key"), "tts", "qts",
      rightCols = Seq("quote_id", "px"), tieBreak = Seq("quote_id")))
    assert(got(11L) == ((1L, 100.0)))
  }

  test("NULL keys follow join semantics: no NULL = NULL match on either side") {
    val q = Seq(
      (Option("A"), ts("2024-01-01 10:00:00"), 1L, 100.0),
      (None: Option[String], ts("2024-01-01 10:00:01"), 2L, 999.0)
    ).toDF("key", "qts", "quote_id", "px")
    val t = Seq(
      (Option("A"), ts("2024-01-01 10:00:03"), 11L),
      (None: Option[String], ts("2024-01-01 10:00:03"), 12L)
    ).toDF("key", "tts", "trade_id")
    val got = byTrade(AsOfJoin.asOf(t, q, Seq("key"), "tts", "qts",
      rightCols = Seq("quote_id", "px"), tieBreak = Seq("quote_id")))
    assert(got(11L) == ((1L, 100.0))) // normal match unaffected
    assert(got(12L) == ((null, null))) // NULL-key trade never sees the NULL-key quote
  }

  test("reserved internal names are rejected, not silently clobbered") {
    val t = trades.withColumnRenamed("trade_id", "_t")
    assertThrows[IllegalArgumentException] {
      AsOfJoin.asOf(t, quotes, Seq("key"), "tts", "qts", rightCols = Seq("px"))
    }
  }

  test("agrees with the definitional quadratic join+argmax on the events table") {
    val events = graft.Td(spark, "/root/testdata/sf0.001", "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("pid"), col("value").as("pval"))

    val fast = AsOfJoin.asOf(
      events.select(col("event_id"), col("user_id"), col("ts")),
      purchases, Seq("user_id"), "ts", "ts",
      rightCols = Seq("pid", "pval"), tieBreak = Seq("pid"), inclusive = false)
      .select(col("event_id"), col("user_id"), col("pid"), col("pval"))

    val pr = purchases.withColumnRenamed("ts", "pts").withColumnRenamed("user_id", "puid")
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("pts").desc, col("pid").desc)
    val naive = events.select(col("event_id"), col("user_id"), col("ts"))
      .join(pr, col("puid") === col("user_id") && col("pts") < col("ts"), "left")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1) // unmatched events keep their single null row
      .select(col("event_id"), col("user_id"), col("pid"), col("pval"))

    assert(fast.count() === events.count())
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  // 2-second buckets split the 10:00:00–10:00:05 fixture into several
  // buckets, exercising in-bucket, cross-bucket, and empty-bucket carry
  private val twoSecBuckets: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    t => floor(unix_timestamp(t) / 2)

  test("asOfBucketed matches asOf on every fixture contract (inclusive/strict/tolerance)") {
    def both(inclusive: Boolean, tol: Option[org.apache.spark.sql.Column]) = {
      val plain = byTrade(AsOfJoin.asOf(trades, quotes, Seq("key"), "tts", "qts",
        rightCols = Seq("quote_id", "px"), tieBreak = Seq("quote_id"),
        inclusive = inclusive, tolerance = tol))
      val bucketed = byTrade(AsOfJoin.asOfBucketed(trades, quotes, Seq("key"), "tts", "qts",
        rightCols = Seq("quote_id", "px"), bucketOf = twoSecBuckets,
        tieBreak = Seq("quote_id"), inclusive = inclusive, tolerance = tol))
      assert(bucketed === plain, s"inclusive=$inclusive tol=${tol.isDefined}")
    }
    both(inclusive = true, None)
    both(inclusive = false, None)
    both(inclusive = true, Some(expr("INTERVAL 2 SECONDS")))
  }

  test("asOfBucketed equals asOf on a million-row hot key") {
    // one celebrity key holding 1M right rows + a normal key, bucketed
    // hourly: the hot key spreads over ~28 buckets instead of one partition
    val base = lit(1704103200L) // 2024-01-01 10:00:00 UTC
    val quotesHot = spark.range(1000000L).select(
      when($"id" % 50 === 0, "N").otherwise("H").as("key"),
      timestamp_seconds(base + ($"id" * 7 % 100000)).as("qts"),
      $"id".as("quote_id"),
      ($"id" % 997).cast("double").as("px"))
    val tradesHot = spark.range(50000L).select(
      when($"id" % 50 === 0, "N").otherwise("H").as("key"),
      timestamp_seconds(base + ($"id" * 13 % 100000)).as("tts"),
      $"id".as("trade_id"))
    val hourBuckets: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => floor(unix_timestamp(t) / 3600)

    val plain = AsOfJoin.asOf(tradesHot, quotesHot, Seq("key"), "tts", "qts",
      rightCols = Seq("quote_id", "px"), tieBreak = Seq("quote_id"))
    val bucketed = AsOfJoin.asOfBucketed(tradesHot, quotesHot, Seq("key"), "tts", "qts",
      rightCols = Seq("quote_id", "px"), bucketOf = hourBuckets,
      tieBreak = Seq("quote_id"))
    assert(bucketed.count() === 50000L)
    assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty)
  }

  test("asOfBucketed's windows partition one bucket finer; plain asOf has no bucket stage") {
    val bucketedPlan = AsOfJoin.asOfBucketed(trades, quotes, Seq("key"), "tts", "qts",
      rightCols = Seq("quote_id", "px"), bucketOf = twoSecBuckets)
      .queryExecution.executedPlan.toString
    val plainPlan = AsOfJoin.asOf(trades, quotes, Seq("key"), "tts", "qts",
      rightCols = Seq("quote_id", "px"))
      .queryExecution.executedPlan.toString
    assert(bucketedPlan.contains("_bk"), "bucketed plan must shuffle/sort on (key, _bk)")
    assert(!plainPlan.contains("_bk"), "plain asOf must not pay the bucket stage")
    // like plain asOf, the bucketed plan never builds a pairwise product:
    // its only joins are the equi-joins on (keys, _bk)
    assert(!bucketedPlan.toLowerCase.contains("nestedloop"),
      "bucketed as-of must not degrade to a nested-loop join")
    assert(!bucketedPlan.toLowerCase.contains("cartesian"),
      "bucketed as-of must not build a cross product")
  }
}
