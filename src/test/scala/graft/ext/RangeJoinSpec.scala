package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("binned containment equals the definitional inequality join, incl. bin-edge cases") {
    // intervals deliberately cross bin boundaries and end exactly on them
    val intervals = Seq(
      ("A", 1L, ts("2024-01-01 10:00:30"), ts("2024-01-01 10:02:30")), // spans 3 one-minute bins
      ("A", 2L, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:06:00")), // ends ON a bin edge
      ("B", 3L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:59"))
    ).toDF("k", "iid", "lo", "hi")
    val points = Seq(
      ("A", 10L, ts("2024-01-01 10:00:29")), // before interval 1, same bin
      ("A", 11L, ts("2024-01-01 10:01:15")), // inside interval 1
      ("A", 12L, ts("2024-01-01 10:02:30")), // ON hi boundary (inclusive)
      ("A", 13L, ts("2024-01-01 10:06:00")), // ON interval 2's hi, edge bin
      ("A", 14L, ts("2024-01-01 10:06:01")), // just past
      ("B", 15L, ts("2024-01-01 10:00:30")), // other key
      ("A", 16L, ts("2024-01-01 10:00:30"))  // interval 1's lo, inclusive
    ).toDF("k", "pid", "t")

    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"), "t", "lo", "hi",
        binWidth = 60L)
      .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals, Seq("k"))
      .filter(col("t") >= col("lo") && col("t") <= col("hi"))
      .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === naive)
    assert(got === Set((1L, 11L), (1L, 12L), (1L, 16L), (2L, 13L), (3L, 15L)))
  }

  test("each qualifying pair is emitted exactly once (point maps to one bin)") {
    val intervals = Seq(("A", 1L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")))
      .toDF("k", "iid", "lo", "hi") // spans many small bins
    val points = Seq(("A", 10L, ts("2024-01-01 12:00:00"))).toDF("k", "pid", "t")
    val out = RangeJoin.pointInInterval(points, intervals, Seq("k"), "t", "lo", "hi",
      binWidth = 60L)
    assert(out.count() === 1)
  }

  test("keyless interval lookup works and agrees with naive") {
    val windows = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-01 10:30:00"), ts("2024-01-01 12:00:00"))
    ).toDF("wid", "lo", "hi")
    val points = (0 until 20).map(i => (100L + i, ts(f"2024-01-01 10:${i * 3}%02d:00")))
      .toDF("pid", "t")
    val got = RangeJoin.pointInInterval(points, windows, Nil, "t", "lo", "hi", 1800L)
      .select("wid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.crossJoin(windows)
      .filter(col("t") >= col("lo") && col("t") <= col("hi"))
      .select("wid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === naive && got.nonEmpty)
  }

  test("hi < lo intervals match nothing (dropped, not a backward sequence)") {
    val intervals = Seq(("A", 1L, ts("2024-01-01 11:00:00"), ts("2024-01-01 10:00:00")))
      .toDF("k", "iid", "lo", "hi")
    val points = Seq(("A", 10L, ts("2024-01-01 10:30:00"))).toDF("k", "pid", "t")
    assert(RangeJoin.pointInInterval(points, intervals, Seq("k"), "t", "lo", "hi", 60L)
      .count() === 0)
  }

  test("runaway interval spans fail fast with the offending bounds") {
    val intervals = Seq(("A", 1L, ts("2024-01-01 00:00:00"), ts("9999-12-31 00:00:00")))
      .toDF("k", "iid", "lo", "hi")
    val points = Seq(("A", 10L, ts("2024-01-02 00:00:00"))).toDF("k", "pid", "t")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, intervals, Seq("k"), "t", "lo", "hi",
        binWidth = 3600L, maxBinsPerInterval = 1000L).count()
    }
    assert(e.getMessage != null && e.getMessage.contains("RangeJoin"),
      s"expected the span guard, got: ${e.getMessage}")
  }

  test("agrees with the inequality join on the events table (attribution shape)") {
    val events = graft.Td(spark, "/root/testdata/sf0.001", "events")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("cid"), col("ts").as("lo"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("hi"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"), col("ts"))
    val fast = RangeJoin.pointInInterval(purchases, clicks, Seq("user_id"),
        "ts", "lo", "hi", 3600L)
      .select("cid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = purchases.join(clicks, Seq("user_id"))
      .filter(col("ts") >= col("lo") && col("ts") <= col("hi"))
      .select("cid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast === naive && fast.nonEmpty)
  }

  test("interval overlap equals the definitional join; multi-bin pairs emit once") {
    val a = Seq(
      ("A", 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 14:00:00")), // 5 hour-bins
      ("A", 2L, ts("2024-01-01 16:00:00"), ts("2024-01-01 16:30:00")),
      ("B", 3L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))
    ).toDF("k", "aid", "a_lo", "a_hi")
    val b = Seq(
      ("A", 10L, ts("2024-01-01 11:00:00"), ts("2024-01-01 13:00:00")), // nested in 1 (3 shared bins)
      ("A", 11L, ts("2024-01-01 13:59:00"), ts("2024-01-01 18:00:00")), // tail-overlaps 1, covers 2
      ("A", 12L, ts("2024-01-01 14:00:00"), ts("2024-01-01 15:00:00")), // touches 1's hi exactly
      ("A", 13L, ts("2024-01-01 15:00:00"), ts("2024-01-01 15:30:00")), // gap: no overlap with 1 or 2
      ("B", 14L, ts("2024-01-01 10:30:00"), ts("2024-01-01 10:45:00"))
    ).toDF("k", "bid", "b_lo", "b_hi")
    val out = RangeJoin.intervalOverlap(a, b, Seq("k"),
      "a_lo", "a_hi", "b_lo", "b_hi", binWidth = 3600L)
    val got = out.select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    // exactly once each, even for pairs sharing several bins
    assert(got.length === got.toSet.size, s"duplicate pairs in ${got.toSeq}")
    val naive = a.join(b, Seq("k"))
      .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.toSet === naive)
    assert(got.toSet === Set((1L, 10L), (1L, 11L), (1L, 12L), (2L, 11L), (3L, 14L)))
  }

  test("interval overlap on a numeric axis") {
    val a = Seq((1L, 0.0, 10.0), (2L, 20.0, 30.0)).toDF("aid", "a_lo", "a_hi")
    val b = Seq((10L, 5.0, 25.0), (11L, 31.0, 40.0)).toDF("bid", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(a, b, Nil, "a_lo", "a_hi", "b_lo", "b_hi",
        binWidth = 7L)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 10L)))
  }

  test("interval overlap accepts TIMESTAMP_NTZ sides") {
    val a = Seq((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")))
      .toDF("aid", "a_lo", "a_hi")
      .select(col("aid"), col("a_lo").cast("timestamp_ntz"), col("a_hi").cast("timestamp_ntz"))
    val b = Seq((10L, ts("2024-01-01 11:00:00"), ts("2024-01-01 13:00:00")))
      .toDF("bid", "b_lo", "b_hi") // mixed flavors: plain TIMESTAMP side
    val got = RangeJoin.intervalOverlap(a, b, Nil, "a_lo", "a_hi", "b_lo", "b_hi")
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L)))
  }
}
