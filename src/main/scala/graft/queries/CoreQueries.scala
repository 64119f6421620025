package graft.queries

import graft.Td
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import QueryDef.dsum

/** Core aggregation / window / ordering queries — SURVEY.md §2.5 (A1-A6, W1,
  * O1-O2) re-expressed over the harness testdata (TESTDATA.md).
  * Reference analogs cited per query.
  */
object CoreQueries {

  /** Flagship: pricing summary (reference A3 rollup style, 1_full_load_fact
    * :214-227 — grouped sums over a fact table).
    */
  val q1PricingSummary = QueryDef(
    "q1_pricing_summary",
    (s, dir) => {
      Td(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("n_rows"))
        .withColumn("avg_qty", col("sum_qty") / col("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             COUNT(*) AS n_rows,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """))

  /** A1 — duplicate detection by group-count (1_customer:69). */
  val a1DupDetect = QueryDef(
    "a1_dup_detect",
    (s, dir) => {
      Td(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .orderBy(col("l_orderkey"))
    },
    Some("""
      SELECT l_orderkey, COUNT(*) AS n
      FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > 1
      ORDER BY l_orderkey
    """))

  /** A2 — keyed dedup with a deterministic winner (reference dropDuplicates,
    * 1_customer:77 / 1_full_load_fact:128, made deterministic per SURVEY §7.5
    * via explicit row_number ordering).
    */
  val a2DedupKeyed = QueryDef(
    "a2_dedup_keyed",
    (s, dir) => {
      // l_linenumber is not unique per order in the synthetic data — break
      // ties on (partkey, suppkey) so the kept row is fully deterministic.
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      Td(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
        .orderBy(col("l_orderkey"))
    },
    Some("""
      SELECT l_orderkey, l_partkey, l_quantity FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
        FROM lineitem) WHERE rn = 1
      ORDER BY l_orderkey
    """))

  /** A3 — the core daily→monthly rollup (1_full_load_fact:214-227). */
  val a3MonthlyRollup = QueryDef(
    "a3_monthly_rollup",
    (s, dir) => {
      Td(s, dir, "lineitem")
        .withColumn("ship_month", trunc(to_date(col("l_shipdate")), "MM"))
        .groupBy(col("ship_month"), col("l_returnflag"))
        .agg(dsum(col("l_quantity")).as("sold_quantity"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("ship_month"), col("l_returnflag"))
    },
    Some("""
      SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month, l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sold_quantity,
             COUNT(*) AS n_lines
      FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
    """))

  /** A4 — min/max range probe (1_full_load_fact:136-139). */
  val a4MinMax = QueryDef(
    "a4_minmax_range",
    (s, dir) => {
      Td(s, dir, "orders")
        .agg(min(to_date(col("o_orderdate"))).as("min_date"),
          max(to_date(col("o_orderdate"))).as("max_date"),
          count(lit(1)).as("n"))
    },
    Some("""
      SELECT CAST(MIN(o_orderdate) AS DATE) AS min_date,
             CAST(MAX(o_orderdate) AS DATE) AS max_date,
             COUNT(*) AS n
      FROM orders
    """),
    // sub-0.2 s at sf0.1: the Spark task-scheduling floor, zero scale
    // signal - timed coverage lives in the correctness gate; dropping it
    // from the bench preserves the compact stdout line's precision budget
    benchmark = false)
  /** A5 — distinct projection probe (1_customer:97; 2_incremental:248-251). */
  val a5Distinct = QueryDef(
    "a5_distinct_projection",
    (s, dir) => {
      Td(s, dir, "customer")
        .select(col("c_mktsegment")).distinct()
        .orderBy(col("c_mktsegment"))
    },
    Some("SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"))

  /** A6 — row counts across layers (1_full_load_fact:53, 210, 233). */
  val a6Counts = QueryDef(
    "a6_counts",
    (s, dir) => {
      val li = Td(s, dir, "lineitem").agg(count(lit(1)).as("n")).withColumn("table_name", lit("lineitem"))
      val o = Td(s, dir, "orders").agg(count(lit(1)).as("n")).withColumn("table_name", lit("orders"))
      val c = Td(s, dir, "customer").agg(count(lit(1)).as("n")).withColumn("table_name", lit("customer"))
      li.unionByName(o).unionByName(c).select(col("table_name"), col("n")).orderBy(col("table_name"))
    },
    Some("""
      SELECT 'customer' AS table_name, COUNT(*) AS n FROM customer
      UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
      UNION ALL SELECT 'orders', COUNT(*) FROM orders
      ORDER BY table_name
    """))

  /** W1 — latest-per-group ranking window (3_pricing:225-236: latest non-zero
    * price per product-year; here: latest order per customer).
    */
  val w1LatestPerGroup = QueryDef(
    "w1_latest_per_group",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(to_date(col("o_orderdate")).desc, col("o_orderkey").desc)
      Td(s, dir, "orders")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("latest_date"))
        .orderBy(col("o_custkey"))
    },
    Some("""
      SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS latest_date FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE) DESC, o_orderkey DESC) AS rnk
        FROM orders) WHERE rnk = 1
      ORDER BY o_custkey
    """))

  /** O1/O2 — deterministic top-k (orderBy + limit, 2_incremental:270). */
  val o1TopK = QueryDef(
    "o1_topk",
    (s, dir) => {
      Td(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .limit(10)
    },
    Some("""
      SELECT c_custkey, c_name, c_acctbal FROM customer
      ORDER BY c_acctbal DESC, c_custkey LIMIT 10
    """),
    // sub-0.2 s at sf0.1: the Spark task-scheduling floor, zero scale
    // signal - timed coverage lives in the correctness gate; dropping it
    // from the bench preserves the compact stdout line's precision budget
    benchmark = false)
  /** A7 — ROLLUP hierarchy totals (engine surface beyond the reference's
    * flat groupBys; the dashboard's division→category drill-down shape).
    * grouping_id disambiguates NULL-as-total from NULL data.
    */
  val a7Rollup = QueryDef(
    "a7_rollup",
    (s, dir) => {
      Td(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sales"),
          grouping_id().cast("long").as("gid"))
        .select(
          coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
          coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
          col("gid"), col("n"), col("sales"))
        .orderBy(col("gid"), col("status"), col("priority"))
    },
    Some("""
      SELECT COALESCE(o_orderstatus, '<all>') AS status,
             COALESCE(o_orderpriority, '<all>') AS priority,
             CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sales
      FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      ORDER BY gid, status, priority
    """))

  /** A8 — pivot: status × priority matrix (Spark `pivot`; oracle via
    * conditional aggregation — the relational core of pivot).
    */
  val a8Pivot = QueryDef(
    "a8_pivot",
    (s, dir) => {
      Td(s, dir, "orders")
        .withColumn("prio", substring(col("o_orderpriority"), 1, 1))
        .groupBy(col("o_orderstatus"))
        .pivot("prio", Seq("1", "2", "3", "4", "5"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("o_orderstatus").as("status"),
          col("1").as("p1"), col("2").as("p2"), col("3").as("p3"),
          col("4").as("p4"), col("5").as("p5"))
        .orderBy(col("status"))
    },
    Some("""
      SELECT o_orderstatus AS status,
             COUNT(*) FILTER (substr(o_orderpriority, 1, 1) = '1') AS p1,
             COUNT(*) FILTER (substr(o_orderpriority, 1, 1) = '2') AS p2,
             COUNT(*) FILTER (substr(o_orderpriority, 1, 1) = '3') AS p3,
             COUNT(*) FILTER (substr(o_orderpriority, 1, 1) = '4') AS p4,
             COUNT(*) FILTER (substr(o_orderpriority, 1, 1) = '5') AS p5
      FROM orders GROUP BY o_orderstatus ORDER BY status
    """))

  /** A9 — CUBE: all four grouping combinations of (status, priority) in
    * one pass — rollup's lattice completion, the last OLAP grouping shape
    * the suite lacked. Same map-side-partial-then-exchange plan as a7;
    * Spark expands the grouping sets before the partial agg.
    */
  val a9Cube = QueryDef(
    "a9_cube",
    (s, dir) => {
      Td(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sales"),
          grouping_id().cast("long").as("gid"))
        .select(
          coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
          coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
          col("gid"), col("n"), col("sales"))
        .orderBy(col("gid"), col("status"), col("priority"))
    },
    Some("""
      SELECT COALESCE(o_orderstatus, '<all>') AS status,
             COALESCE(o_orderpriority, '<all>') AS priority,
             CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sales
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY gid, status, priority
    """),
    // a7 already times the grouping-set expansion + exchange shape
    benchmark = false)

  /** W2 — lag/lead inter-event gaps: per user, event count and the
    * mean/max gap between consecutive events (lag over the user's
    * time-ordered stream, event_id tiebreak for total order). Gaps are
    * integer millis, so mean = sum/count is exact in both engines. One
    * user exchange + per-user sort, same plan family as e2's frame.
    */
  val w2UserGaps = QueryDef(
    "w2_user_gaps",
    (s, dir) => {
      val ev = Td(s, dir, "events")
      val ems = graft.clean.Dates.epochMillis(col("ts"), ev.schema("ts").dataType)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ems"), col("event_id"))
      ev.select(col("user_id"), col("event_id"), ems.as("ems"))
        .withColumn("gap", col("ems") - lag(col("ems"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).cast("long").as("n_events"),
          max(col("gap")).as("max_gap_ms"),
          (sum(col("gap")).cast("double") / count(col("gap"))).as("mean_gap_ms"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH g AS (SELECT user_id, event_id,
               epoch_ms(ts) - lag(epoch_ms(ts), 1) OVER (
                 PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS gap
             FROM events)
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             CAST(max(gap) AS BIGINT) AS max_gap_ms,
             CAST(sum(gap) AS DOUBLE) / count(gap) AS mean_gap_ms
      FROM g GROUP BY user_id ORDER BY user_id
    """),
    // w1/e2 already time the per-user window exchange shape
    benchmark = false)

  val all: Seq[QueryDef] = Seq(
    q1PricingSummary, a1DupDetect, a2DedupKeyed, a3MonthlyRollup,
    a4MinMax, a5Distinct, a6Counts, a7Rollup, a8Pivot, a9Cube,
    w1LatestPerGroup, w2UserGaps, o1TopK)
}
