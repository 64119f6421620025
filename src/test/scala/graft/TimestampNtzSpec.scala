package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import java.nio.file.Files
import java.sql.Timestamp

/** Regression class: parquet written without a timezone (the pandas/pyarrow
  * default, and what the driver's testdata generator emits) reads back as
  * TIMESTAMP_NTZ, and every epoch-arithmetic operator must accept it —
  * round 10 lost j8_range_join and x4_sessionize to exactly this. Each test
  * round-trips an NTZ parquet FIXTURE (not an in-memory cast) so the
  * arrival path matches production, then asserts the operator's NTZ answer
  * equals its TIMESTAMP answer (session TZ pinned UTC, so the flavors are
  * numerically identical).
  */
class TimestampNtzSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Write df with `cols` cast to NTZ, read back, assert NTZ survived. */
  private def ntzRoundTrip(df: DataFrame, cols: String*): DataFrame = {
    val dir = Files.createTempDirectory("graft_ntz").toString + "/t"
    cols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(TimestampNTZType)))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    cols.foreach(c => assert(back.schema(c).dataType === TimestampNTZType,
      s"fixture must arrive as NTZ, got ${back.schema(c).dataType} for $c"))
    back
  }

  private val events = Seq(
    (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
    (2L, ts("2024-01-01 10:10:00"), 7L, "view", 2.0),
    (3L, ts("2024-01-01 11:30:00"), 7L, "click", 3.0), // > 30 min gap: new session
    (4L, ts("2024-01-01 10:05:00"), 8L, "purchase", 4.0)
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("sessionizeBatch accepts an NTZ-written parquet and matches TIMESTAMP") {
    def run(df: DataFrame) =
      graft.streaming.Streams.sessionizeBatch(df, gapMs = 30L * 60 * 1000)
        .orderBy("user_id", "session_id").collect().toSeq
    val fromNtz = run(ntzRoundTrip(events, "ts"))
    assert(fromNtz === run(events))
    assert(fromNtz.size === 3) // user 7 splits at the 80-min gap
  }

  test("RangeJoin.pointInInterval accepts NTZ on both sides and matches TIMESTAMP") {
    val intervals = Seq(
      ("A", 1L, ts("2024-01-01 10:00:30"), ts("2024-01-01 10:02:30")),
      ("B", 2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:59"))
    ).toDF("k", "iid", "lo", "hi")
    val points = Seq(
      ("A", 10L, ts("2024-01-01 10:01:15")),
      ("A", 11L, ts("2024-01-01 10:02:31")),
      ("B", 12L, ts("2024-01-01 10:00:30"))
    ).toDF("k", "pid", "t")
    def run(p: DataFrame, i: DataFrame) =
      graft.ext.RangeJoin.pointInInterval(p, i, Seq("k"), "t", "lo", "hi", binWidth = 60L)
        .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = run(ntzRoundTrip(points, "t"), ntzRoundTrip(intervals, "lo", "hi"))
    assert(got === run(points, intervals))
    assert(got === Set((1L, 10L), (2L, 12L)))
  }

  test("Z-order compaction accepts an NTZ time lane") {
    val store = new graft.tables.TableStore(
      spark, Files.createTempDirectory("graft_ntz_z").toString)
    (0 until 3).foreach { b =>
      store.append("ev", ntzRoundTrip(events, "ts").withColumn("b", lit(b)))
    }
    assert(store.read("ev").schema("ts").dataType === TimestampNTZType)
    graft.tables.Compact.compact(store, "ev", numFiles = Some(1),
      zorderBy = Seq("ts", "user_id"))
    assert(store.read("ev").count() === events.count() * 3)
  }

  test("Dates.epochMillis/epochSeconds agree across flavors and keep numerics") {
    val df = events.select(col("ts"), col("ts").cast(TimestampNTZType).as("tsn"),
      col("value"))
    val out = df.select(
      graft.clean.Dates.epochMillis(col("ts"), TimestampType).as("m1"),
      graft.clean.Dates.epochMillis(col("tsn"), TimestampNTZType).as("m2"),
      graft.clean.Dates.epochSeconds(col("ts"), TimestampType).as("s1"),
      graft.clean.Dates.epochSeconds(col("tsn"), TimestampNTZType).as("s2"),
      graft.clean.Dates.epochSeconds(col("value"),
        org.apache.spark.sql.types.DoubleType).as("v")).collect()
    out.foreach { r =>
      assert(r.getLong(0) === r.getLong(1))
      assert(r.getDouble(2) === r.getDouble(3))
      assert(r.getLong(0).toDouble / 1000.0 === r.getDouble(2))
    }
    assert(out.map(_.getDouble(4)).toSet === Set(1.0, 2.0, 3.0, 4.0))
  }

  test("epochMillis of NTZ is session-timezone independent (DST zone = UTC answer)") {
    // naive wall times on a US spring-forward day: under the old
    // session-zone cast, a New York session would compute these two
    // (01:30, 03:30 — really 60 wall-clock minutes apart across the
    // skipped hour) as 60 REAL minutes apart too, while a UTC session
    // said 120 — operators then sessionized/binned differently per
    // deployment timezone. NTZ-as-UTC semantics pin one answer everywhere.
    val df = ntzRoundTrip(Seq(
      (1L, ts("2024-03-10 01:30:00")),
      (2L, ts("2024-03-10 03:30:00"))).toDF("id", "ts"), "ts")
    def epochs(): Seq[Long] = {
      val dt = df.schema("ts").dataType
      df.select(col("id"), graft.clean.Dates.epochMillis(col("ts"), dt).as("e"))
        .orderBy("id").collect().map(_.getLong(1)).toSeq
    }
    val tzConf = "spark.sql.session.timeZone"
    val utc = epochs()
    val prev = spark.conf.get(tzConf)
    try {
      spark.conf.set(tzConf, "America/New_York")
      assert(epochs() === utc, "NTZ epoch must not depend on session timezone")
    } finally spark.conf.set(tzConf, prev)
    // and the values ARE the wall clock as UTC: 2h apart, exact instants
    assert(utc(1) - utc(0) === 2L * 3600 * 1000)
    assert(utc(0) === 1710034200000L) // 2024-03-10T01:30:00Z
  }
}
