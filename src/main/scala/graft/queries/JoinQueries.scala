package graft.queries

import graft.Td
import graft.clean.Dates
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import QueryDef.dsum

/** Join / set-operation queries — SURVEY.md §2.4 (J1-J6) + union/except
  * engine surface.
  */
object JoinQueries {

  /** J1 — left join to a small lookup + coalesce fallback (1_customer:203-210
    * city-fix join). Customer dim is broadcast by Catalyst (assert in
    * PlanSpec).
    */
  val j1LeftBroadcast = QueryDef(
    "j1_left_broadcast",
    (s, dir) => {
      val cust = Td(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      Td(s, dir, "orders")
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left")
        .select(
          col("o_orderkey"),
          coalesce(col("c_name"), lit("Unknown")).as("customer_name"),
          coalesce(col("c_mktsegment"), lit("Unknown")).as("segment"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey,
             COALESCE(c_name, 'Unknown') AS customer_name,
             COALESCE(c_mktsegment, 'Unknown') AS segment
      FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      ORDER BY o_orderkey
    """))

  /** J2/J3 — inner join to a dim silently drops unmatched fact rows
    * (1_full_load_fact:148-149: orders ⋈ products on product_id), then
    * aggregates per dim attribute.
    */
  val j2InnerDimAgg = QueryDef(
    "j2_inner_dim_agg",
    (s, dir) => {
      val part = Td(s, dir, "part").select(col("p_partkey"), col("p_brand"))
      Td(s, dir, "lineitem")
        .join(broadcast(part), col("l_partkey") === col("p_partkey"), "inner")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("p_brand"))
    },
    Some("""
      SELECT p_brand, COUNT(*) AS n_lines,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand ORDER BY p_brand
    """))

  /** J4 — equi-join on a derived expression: affected-months restriction
    * (2_incremental_load_fact.py:258-263: `trunc(date,'MM') = start_month`).
    */
  val j4JoinOnExpr = QueryDef(
    "j4_join_on_expr",
    (s, dir) => {
      val spine = Dates.monthSpine(s, "1995-01-01", "2001-12-01")
        .select(col("month_start_date"))
      Td(s, dir, "orders")
        .join(spine,
          trunc(to_date(col("o_orderdate")), "MM") === col("month_start_date"), "inner")
        .groupBy(col("month_start_date"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("month_sales"))
        .orderBy(col("month_start_date"))
    },
    Some("""
      SELECT month_start_date, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS month_sales
      FROM orders
      JOIN (SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '2001-12-01', INTERVAL 1 MONTH)) AS DATE) AS month_start_date) spine
        ON CAST(date_trunc('month', o_orderdate) AS DATE) = month_start_date
      GROUP BY month_start_date ORDER BY month_start_date
    """))

  /** J5 — the 4-way star enrichment with derived revenue
    * (Tableu dashboard/denormalise_table_query_fmcg.txt:34-52), aggregated
    * to the dashboard's region/nation/month trend.
    */
  val j5StarEnriched = QueryDef(
    "j5_star_enriched",
    (s, dir) => {
      val orders = Td(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), to_date(col("o_orderdate")).as("o_date"))
      val cust = Td(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val nation = Td(s, dir, "nation")
      val region = Td(s, dir, "region")
      Td(s, dir, "lineitem")
        .join(orders, col("l_orderkey") === col("o_orderkey"), "inner")
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left")
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"), "left")
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"), "left")
        .groupBy(col("r_name"), col("n_name"), trunc(col("o_date"), "MM").as("order_month"))
        .agg(
          sum((col("l_extendedprice").cast(DecimalType(18, 2))) *
            (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
            .cast("double").as("revenue"),
          dsum(col("l_quantity")).as("quantity"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("r_name"), col("n_name"), col("order_month"))
    },
    Some("""
      SELECT r_name, n_name,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS quantity,
             COUNT(*) AS n_lines
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      LEFT JOIN customer ON o_custkey = c_custkey
      LEFT JOIN nation ON c_nationkey = n_nationkey
      LEFT JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """))

  /** Left-semi / left-anti — free in Spark, used inside the MERGE rewrite
    * (SURVEY §2.4 note).
    */
  val j6SemiAnti = QueryDef(
    "j6_semi_anti",
    (s, dir) => {
      val cust = Td(s, dir, "customer")
      val orders = Td(s, dir, "orders").select(col("o_custkey"))
      val withO = cust.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n")).withColumn("kind", lit("with_orders"))
      val withoutO = cust.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n")).withColumn("kind", lit("without_orders"))
      withO.unionByName(withoutO).select(col("kind"), col("n")).orderBy(col("kind"))
    },
    Some("""
      SELECT 'with_orders' AS kind, COUNT(*) AS n FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      UNION ALL
      SELECT 'without_orders', COUNT(*) FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY kind
    """))

  /** Set operations — union / intersect / except engine surface (SURVEY §2.5:
    * none in the reference, surfaced by the engine; except/intersect are
    * set-distinct in both engines).
    */
  val setOps = QueryDef(
    "set_ops",
    (s, dir) => {
      val c = Td(s, dir, "customer").select(col("c_custkey").as("k"))
      val o = Td(s, dir, "orders").select(col("o_custkey").as("k"))
      val onlyC = c.except(o).withColumn("kind", lit("customer_only"))
      val both = c.intersect(o).withColumn("kind", lit("both"))
      onlyC.unionByName(both).select(col("kind"), col("k"))
        .orderBy(col("kind"), col("k"))
    },
    Some("""
      SELECT 'both' AS kind, k FROM (
        SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey FROM orders)
      UNION ALL
      SELECT 'customer_only', k FROM (
        SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey FROM orders)
      ORDER BY kind, k
    """))

  /** J7 — as-of (point-in-time) join, engine surface beyond the reference:
    * each event is joined to the same user's most recent STRICTLY-earlier
    * purchase event — the no-future-leakage feature lookup. The engine path
    * ([[graft.ext.AsOfJoin.asOf]]) is the single-shuffle union+window form
    * (never materializes the per-key event×purchase product); the oracle
    * deliberately IS that quadratic product + argmax, so the linear plan is
    * checked against the definitional semantics, ties (same user, same ts)
    * pinned by the event-id tie-break on both sides.
    */
  val j7AsofJoin = QueryDef(
    "j7_asof_join",
    (s, dir) => {
      val events = Td(s, dir, "events")
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("prev_purchase_id"),
          col("value").as("prev_purchase_value"))
      graft.ext.AsOfJoin.asOf(
          events.select(col("event_id"), col("user_id"), col("ts")),
          purchases, keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
          rightCols = Seq("prev_purchase_id", "prev_purchase_value"),
          tieBreak = Seq("prev_purchase_id"), inclusive = false)
        .select(col("event_id"), col("user_id"),
          col("prev_purchase_id"), col("prev_purchase_value"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH p AS (
        SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
      r AS (
        SELECT e.event_id, p.event_id AS prev_purchase_id, p.value AS prev_purchase_value,
               ROW_NUMBER() OVER (PARTITION BY e.event_id ORDER BY p.ts DESC, p.event_id DESC) AS rnk
        FROM events e JOIN p ON p.user_id = e.user_id AND p.ts < e.ts)
      SELECT e.event_id, e.user_id, r.prev_purchase_id, r.prev_purchase_value
      FROM events e LEFT JOIN (SELECT * FROM r WHERE rnk = 1) r USING (event_id)
      ORDER BY event_id
    """))

  /** J9 — the hot-key as-of join ([[graft.ext.AsOfJoin.asOfBucketed]])
    * under the DuckDB hash gate: the identical contract as [[j7AsofJoin]]
    * (same events/purchases split, strict time predicate, same tie-break)
    * routed through the time-bucketed plan — rows shuffle on
    * (user, day-bucket) and per-bucket carry state reconciles through the
    * bucket spine, so no partition ever holds a whole hot key. Bucketing
    * is a PLAN choice, not a semantics choice, so the oracle is j7's
    * definitional product+argmax SQL verbatim: any bucket-boundary bug
    * (carry-in off by one bucket, inclusive/strict leak at an equal-time
    * boundary) hash-mismatches here.
    */
  val j9AsofBucketed = QueryDef(
    "j9_asof_bucketed",
    (s, dir) => {
      val events = Td(s, dir, "events")
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("prev_purchase_id"),
          col("value").as("prev_purchase_value"))
      graft.ext.AsOfJoin.asOfBucketed(
          events.select(col("event_id"), col("user_id"), col("ts")),
          purchases, keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
          rightCols = Seq("prev_purchase_id", "prev_purchase_value"),
          bucketOf = t => floor(unix_timestamp(t) / lit(86400L)),
          tieBreak = Seq("prev_purchase_id"), inclusive = false)
        .select(col("event_id"), col("user_id"),
          col("prev_purchase_id"), col("prev_purchase_value"))
        .orderBy(col("event_id"))
    },
    // j7's oracle BY REFERENCE, not a copy: the "identical contract" claim
    // is structural — a future fix to j7's definitional SQL gates j9 too
    j7AsofJoin.oracle)

  /** J8 — binned range (interval) join, engine surface beyond the reference:
    * click→purchase attribution, each click paired with the same user's
    * purchases inside [click, click + 1 hour]. The engine path
    * ([[graft.ext.RangeJoin.pointInInterval]]) explodes intervals to
    * fixed-width time bins and equi-joins on (user, bin) — never a
    * nested-loop pair scan; the oracle is the definitional inequality join.
    */
  val j8RangeJoin = QueryDef(
    "j8_range_join",
    (s, dir) => {
      val events = Td(s, dir, "events")
      val clicks = events.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("click_hi"))
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts"), col("value").as("purchase_value"))
      graft.ext.RangeJoin.pointInInterval(purchases, clicks, Seq("user_id"),
          tCol = "ts", loCol = "click_ts", hiCol = "click_hi", binWidth = 3600L)
        .select(col("click_id"), col("purchase_id"), col("user_id"),
          col("purchase_value"))
        .orderBy(col("click_id"), col("purchase_id"))
    },
    Some("""
      SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
             p.value AS purchase_value
      FROM events c JOIN events p
        ON p.user_id = c.user_id
       AND c.event_type = 'click' AND p.event_type = 'purchase'
       AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
      ORDER BY click_id, purchase_id
    """))

  /** J10 — interval-OVERLAP join ([[graft.ext.RangeJoin.intervalOverlap]]):
    * concurrent-activity detection — every (click-hour, view-half-hour)
    * window pair of the same user that overlaps in time. Both sides explode
    * to time bins, equi-join on (user, bin), and the owner-bin rule emits
    * each pair exactly once with NO dedup shuffle; the oracle is the
    * definitional pairwise inequality join.
    */
  val j10IntervalOverlap = QueryDef(
    "j10_interval_overlap",
    (s, dir) => {
      val events = Td(s, dir, "events")
      val clicks = events.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("c_lo"), (col("ts") + expr("INTERVAL 1 HOUR")).as("c_hi"))
      val views = events.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("v_lo"), (col("ts") + expr("INTERVAL 30 MINUTES")).as("v_hi"))
      graft.ext.RangeJoin.intervalOverlap(clicks, views, Seq("user_id"),
          loL = "c_lo", hiL = "c_hi", loR = "v_lo", hiR = "v_hi", binWidth = 3600L)
        .select(col("click_id"), col("view_id"), col("user_id"))
        .orderBy(col("click_id"), col("view_id"))
    },
    Some("""
      SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id
      FROM events c JOIN events v
        ON v.user_id = c.user_id
       AND c.event_type = 'click' AND v.event_type = 'view'
       AND c.ts <= v.ts + INTERVAL 30 MINUTES
       AND v.ts <= c.ts + INTERVAL 1 HOUR
      ORDER BY click_id, view_id
    """))

  /** S12/S13 — SQL-text surface: temp-view registration + `spark.sql`
    * (reference: CREATE OR REPLACE VIEW denormalise_table_query_fmcg.txt:1,
    * temp-view handoff 2_incremental_load_fact.py:254). Same engine path the
    * BI dashboards use.
    */
  val v1SqlView = QueryDef(
    "v1_sql_view",
    (s, dir) => {
      Td(s, dir, "orders").createOrReplaceTempView("v_orders")
      Td(s, dir, "customer").createOrReplaceTempView("v_customer")
      s.sql("""
        SELECT c_mktsegment AS segment,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sales
        FROM v_orders JOIN v_customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY segment
      """)
    },
    Some("""
      SELECT c_mktsegment AS segment,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sales
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY segment
    """))

  val all: Seq[QueryDef] = Seq(
    j1LeftBroadcast, j2InnerDimAgg, j4JoinOnExpr, j5StarEnriched,
    j6SemiAnti, j7AsofJoin, j8RangeJoin, j9AsofBucketed, j10IntervalOverlap,
    setOps, v1SqlView)
}
