package graft.queries

import graft.Td
import graft.serve.{EnrichedView, Quality}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The serving workload as first-class oracle queries: the reference's
  * dashboard library (EnrichedView kpis/topProducts/topCustomers/revenueBy/
  * monthlyTrend — README.md:194-208) and its documented acceptance probes
  * (Quality joinCoverage/nullRates — README.md:257-266), each pinned
  * cross-engine instead of only transitively via j5/v1.
  *
  * The fixture maps the TPC-H tables onto the enriched-view column contract
  * (date, product_code/product, customer_code/customer, market,
  * sold_quantity, total_amount) with DECIMAL(18,2) measures, so the
  * dashboard functions' sums are exact and order-independent — the same
  * dsum discipline every other oracle query uses.
  */
object ServeQueries {

  /** TPC-H → enriched-view shape. Amounts/quantities as DECIMAL(18,2): the
    * library sums keep the column type, so aggregates replay bit-for-bit.
    */
  private def enrichedFixture(s: SparkSession, dir: String): DataFrame = {
    val ord = Td(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), to_date(col("o_orderdate")).as("o_date"))
    val cust = Td(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    val part = Td(s, dir, "part").select(col("p_partkey"), col("p_name"))
    Td(s, dir, "lineitem")
      .join(ord, col("l_orderkey") === col("o_orderkey"), "inner")
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"), "left")
      .select(
        trunc(col("o_date"), "MM").as("date"),
        col("l_partkey").as("product_code"), col("p_name").as("product"),
        col("c_custkey").as("customer_code"), col("c_name").as("customer"),
        col("c_mktsegment").as("market"),
        col("l_quantity").cast(DecimalType(18, 2)).as("sold_quantity"),
        col("l_extendedprice").cast(DecimalType(18, 2)).as("total_amount"))
  }

  private val enrichedCte = """
      enr AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS date,
               l_partkey AS product_code, p_name AS product,
               c_custkey AS customer_code, c_name AS customer,
               c_mktsegment AS market,
               CAST(l_quantity AS DECIMAL(18,2)) AS sold_quantity,
               CAST(l_extendedprice AS DECIMAL(18,2)) AS total_amount
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        LEFT JOIN customer ON o_custkey = c_custkey
        LEFT JOIN part ON l_partkey = p_partkey)"""

  /** K1 — the KPI cards. */
  val k1Kpis = QueryDef(
    "k1_kpis",
    (s, dir) =>
      EnrichedView.kpis(enrichedFixture(s, dir))
        .select(col("revenue").cast("double").as("revenue"),
          col("quantity").cast("double").as("quantity"),
          col("n_customers"), col("asp")),
    Some(s"""
      WITH $enrichedCte
      SELECT CAST(SUM(total_amount) AS DOUBLE) AS revenue,
             CAST(SUM(sold_quantity) AS DOUBLE) AS quantity,
             COUNT(DISTINCT customer_code) AS n_customers,
             CAST(SUM(total_amount) AS DOUBLE) / CAST(SUM(sold_quantity) AS DOUBLE) AS asp
      FROM enr
    """))

  /** K2 — top products by revenue (ties to the lower product_code). */
  val k2TopProducts = QueryDef(
    "k2_top_products",
    (s, dir) =>
      EnrichedView.topProducts(enrichedFixture(s, dir), n = 10)
        .select(col("product_code"), col("product"),
          col("revenue").cast("double").as("revenue")),
    Some(s"""
      WITH $enrichedCte
      SELECT product_code, product, CAST(SUM(total_amount) AS DOUBLE) AS revenue
      FROM enr GROUP BY 1, 2
      ORDER BY SUM(total_amount) DESC, product_code LIMIT 10
    """))

  /** K3 — top customers by revenue. */
  val k3TopCustomers = QueryDef(
    "k3_top_customers",
    (s, dir) =>
      EnrichedView.topCustomers(enrichedFixture(s, dir), n = 10)
        .select(col("customer_code"), col("customer"),
          col("revenue").cast("double").as("revenue")),
    Some(s"""
      WITH $enrichedCte
      SELECT customer_code, customer, CAST(SUM(total_amount) AS DOUBLE) AS revenue
      FROM enr GROUP BY 1, 2
      ORDER BY SUM(total_amount) DESC, customer_code LIMIT 10
    """))

  /** K4 — revenue by market (the dashboard's dimension pie). */
  val k4RevenueByMarket = QueryDef(
    "k4_revenue_by_market",
    (s, dir) =>
      EnrichedView.revenueBy(enrichedFixture(s, dir), "market")
        .select(col("market"),
          col("revenue").cast("double").as("revenue"),
          col("quantity").cast("double").as("quantity")),
    Some(s"""
      WITH $enrichedCte
      SELECT market, CAST(SUM(total_amount) AS DOUBLE) AS revenue,
             CAST(SUM(sold_quantity) AS DOUBLE) AS quantity
      FROM enr GROUP BY 1 ORDER BY SUM(total_amount) DESC, market
    """))

  /** K5 — monthly revenue/quantity trend. */
  val k5MonthlyTrend = QueryDef(
    "k5_monthly_trend",
    (s, dir) =>
      EnrichedView.monthlyTrend(enrichedFixture(s, dir))
        .select(col("date"),
          col("revenue").cast("double").as("revenue"),
          col("quantity").cast("double").as("quantity")),
    Some(s"""
      WITH $enrichedCte
      SELECT date, CAST(SUM(total_amount) AS DOUBLE) AS revenue,
             CAST(SUM(sold_quantity) AS DOUBLE) AS quantity
      FROM enr GROUP BY 1 ORDER BY date
    """))

  /** Q2 — join coverage: the reference's fact→dim acceptance probe. The
    * dim is deliberately restricted to even part keys so the missing-key
    * arithmetic (matched/missing/coverage ratio) is actually exercised;
    * the count-based coverage division is long→double IEEE, identical in
    * both engines.
    */
  val q2JoinCoverage = QueryDef(
    "q2_join_coverage",
    (s, dir) => {
      val fact = Td(s, dir, "lineitem").withColumnRenamed("l_partkey", "p_partkey")
      val partDim = Td(s, dir, "part").filter(col("p_partkey") % 2 === 0)
      Quality.joinCoverage(fact, partDim, Seq("p_partkey"))
    },
    Some("""
      WITH d AS (SELECT DISTINCT p_partkey FROM part WHERE p_partkey % 2 = 0)
      SELECT COUNT(*) AS fact_rows,
             COUNT(d.p_partkey) AS matched,
             COUNT(*) - COUNT(d.p_partkey) AS missing,
             CAST(COUNT(d.p_partkey) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS coverage
      FROM lineitem l LEFT JOIN d ON l.l_partkey = d.p_partkey
    """),
    // cheap probe over the j2-timed join shape —
    // keeping it out preserves the compact bench line's headroom
    benchmark = false)

  /** Q3 — column null-rate profile over a frame with real nulls (the
    * left-join miss side of the restricted part dim), the reference's
    * schema-drift tripwire.
    */
  val q3NullRates = QueryDef(
    "q3_null_rates",
    (s, dir) => {
      val partDim = Td(s, dir, "part")
        .filter(col("p_partkey") % 2 === 0)
        .select(col("p_partkey"), col("p_name"))
      val joined = Td(s, dir, "lineitem")
        .join(broadcast(partDim), col("l_partkey") === col("p_partkey"), "left")
        .select(col("l_orderkey"), col("p_partkey").as("matched_key"),
          col("p_name").as("product"))
      Quality.nullRates(joined)
    },
    Some("""
      WITH d AS (SELECT p_partkey, p_name FROM part WHERE p_partkey % 2 = 0),
      f AS (SELECT l.l_orderkey, d.p_partkey AS matched_key, d.p_name AS product
            FROM lineitem l LEFT JOIN d ON l.l_partkey = d.p_partkey)
      SELECT CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(GREATEST(COUNT(*), 1) AS DOUBLE) AS l_orderkey,
             CAST(SUM(CASE WHEN matched_key IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(GREATEST(COUNT(*), 1) AS DOUBLE) AS matched_key,
             CAST(SUM(CASE WHEN product IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(GREATEST(COUNT(*), 1) AS DOUBLE) AS product
      FROM f
    """),
    // cheap probe over the j1-timed broadcast-left shape —
    // keeping it out preserves the compact bench line's headroom
    benchmark = false)

  /** X22 — generic per-column profile ([[graft.serve.Profile]]): rows /
    * non-null / null / exact distinct per column in long format. The
    * testdata is null-free, so two columns get deterministic planted nulls
    * (error types, every-7th user) — the null accounting is then exercised
    * beside genuinely null-free columns.
    */
  private val profileCols = Seq("event_id", "event_type", "user_id", "value")

  val x22Profile = QueryDef(
    "x22_profile",
    (s, dir) => {
      val planted = Td(s, dir, "events").select(
        col("event_id"),
        nullif(col("event_type"), lit("error")).as("event_type"),
        when(col("user_id") % 7 === 0, lit(null)).otherwise(col("user_id")).as("user_id"),
        col("value"))
      graft.serve.Profile.profile(planted, profileCols)
    },
    Some {
      val per = profileCols.map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows, count($c) AS n_nonnull,
               count(*) - count($c) AS n_null, count(DISTINCT $c) AS n_distinct
            FROM aug"""
      }.mkString("\n      UNION ALL\n      ")
      s"""
      WITH aug AS (SELECT event_id,
               nullif(event_type, 'error') AS event_type,
               CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id END AS user_id,
               value
             FROM events)
      SELECT CAST(n_rows AS BIGINT) AS n_rows, col_name,
             CAST(n_nonnull AS BIGINT) AS n_nonnull,
             CAST(n_null AS BIGINT) AS n_null,
             CAST(n_distinct AS BIGINT) AS n_distinct
      FROM ($per)
      ORDER BY col_name
    """
    },
    // one Expand-aggregation — the q3 null-rates agg shape, already timed
    benchmark = false)

  val all: Seq[QueryDef] = Seq(
    k1Kpis, k2TopProducts, k3TopCustomers, k4RevenueByMarket, k5MonthlyTrend,
    q2JoinCoverage, q3NullRates, x22Profile)
}
