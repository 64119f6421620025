package graft.queries

import graft.Td
import graft.clean.{Dates, Keys, Normalize}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import QueryDef.dsum

/** Projection / filter / scalar-function queries — SURVEY.md §2.2 (P1-P11)
  * and §2.3 (F1-F19) over the harness testdata.
  */
object FuncQueries {

  /** P1/P2/P3/P10 — select, rename, cast at a layer boundary
    * (1_full_load_fact.py:170: `order_placement_date as date, customer_id as
    * customer_code, order_qty as sold_quantity`).
    */
  val p1ProjectCastRename = QueryDef(
    "p1_project_cast_rename",
    (s, dir) => {
      Td(s, dir, "orders")
        .select(
          col("o_orderkey"),
          col("o_custkey").cast("string").as("customer_code"),
          to_date(col("o_orderdate")).as("order_date"),
          col("o_totalprice").cast(DecimalType(18, 2)).cast("double").as("total_price"),
          col("o_orderstatus").as("status"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey,
             CAST(o_custkey AS VARCHAR) AS customer_code,
             CAST(o_orderdate AS DATE) AS order_date,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
             o_orderstatus AS status
      FROM orders ORDER BY o_orderkey
    """),
    // sub-0.2 s at sf0.1: the Spark task-scheduling floor, zero scale
    // signal - timed coverage lives in the correctness gate; dropping it
    // from the bench preserves the compact stdout line's precision budget
    benchmark = false)
  /** P5-P9 + F5 — predicate battery: isin, inequality, null checks, rlike,
    * range (1_customer:88, 119; 1_full_load_fact:98, 104; 3_pricing:137).
    */
  val p2FilterPredicates = QueryDef(
    "p2_filter_predicates",
    (s, dir) => {
      Td(s, dir, "orders")
        .filter(col("o_orderstatus").isin("O", "F"))
        .filter(col("o_orderstatus") =!= "P")
        .filter(col("o_custkey").isNotNull)
        .filter(col("o_orderpriority").rlike("^[1-3]-"))
        .filter(col("o_totalprice") > 1000.0 && col("o_totalprice") <= 50000.0)
        .filter(to_date(col("o_orderdate")) >= lit("1996-01-01"))
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey, o_orderpriority, o_totalprice
      FROM orders
      WHERE o_orderstatus IN ('O','F') AND o_orderstatus <> 'P'
        AND o_custkey IS NOT NULL
        AND regexp_matches(o_orderpriority, '^[1-3]-')
        AND o_totalprice > 1000.0 AND o_totalprice <= 50000.0
        AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      ORDER BY o_orderkey
    """))

  /** F1-F5 — string cleaning: trim+initcap, case-insensitive regexp_replace,
    * regexp_extract, rlike flag (1_customer:93, 151-157; 2_products:126-136,
    * 167-170).
    */
  val f1StringClean = QueryDef(
    "f1_string_clean",
    (s, dir) => {
      Td(s, dir, "part")
        .select(
          col("p_partkey"),
          Normalize.cleanName(col("p_name")).as("clean_name"),
          regexp_replace(col("p_type"), "(?i)economy", "Econ").as("fixed_type"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
          col("p_brand").rlike("^Brand#[0-9]+$").as("valid_brand"),
          lower(col("p_type")).as("type_lc"))
        .orderBy(col("p_partkey"))
    },
    Some("""
      SELECT p_partkey,
             array_to_string(list_transform(str_split(trim(p_name), ' '),
               x -> upper(x[1]) || lower(x[2:])), ' ') AS clean_name,
             regexp_replace(p_type, '(?i)economy', 'Econ') AS fixed_type,
             regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
             regexp_matches(p_brand, '^Brand#[0-9]+$') AS valid_brand,
             lower(p_type) AS type_lc
      FROM part ORDER BY p_partkey
    """),
    // sub-0.2 s at sf0.1: the Spark task-scheduling floor, zero scale
    // signal - timed coverage lives in the correctness gate; dropping it
    // from the bench preserves the compact stdout line's precision budget
    benchmark = false)
  /** F6 — sha2-256 surrogate keys + md5 fingerprints
    * (2_products:177-183: `product_code = sha2(product_name, 256)`).
    */
  val f2HashKeys = QueryDef(
    "f2_hash_keys",
    (s, dir) => {
      Td(s, dir, "part")
        .select(
          col("p_partkey"),
          Keys.sha2Key(col("p_name")).as("product_code"),
          md5(col("p_name")).as("fingerprint"),
          length(col("p_name")).as("name_len"),
          substring(col("p_name"), 1, 4).as("name_prefix"))
        .orderBy(col("p_partkey"))
    },
    Some("""
      SELECT p_partkey,
             sha256(p_name) AS product_code,
             md5(p_name) AS fingerprint,
             length(p_name) AS name_len,
             substr(p_name, 1, 4) AS name_prefix
      FROM part ORDER BY p_partkey
    """),
    // sub-0.2 s at sf0.1: the Spark task-scheduling floor, zero scale
    // signal - timed coverage lives in the correctness gate; dropping it
    // from the bench preserves the compact stdout line's precision budget
    benchmark = false)
  /** F11+F3 — the multi-format date parse with weekday strip: formats
    * round-trip through strings styled like the reference's four order-date
    * formats (1_full_load_fact:111-125); unparseable → NULL, never error.
    */
  val f3DatesMultiformat = QueryDef(
    "f3_dates_multiformat",
    (s, dir) => {
      val d = to_date(col("o_orderdate"))
      Td(s, dir, "orders")
        .withColumn("date_str",
          when(pmod(col("o_orderkey"), lit(4)) === 0, date_format(d, "dd-MM-yyyy"))
            .when(pmod(col("o_orderkey"), lit(4)) === 1, date_format(d, "dd/MM/yyyy"))
            .when(pmod(col("o_orderkey"), lit(4)) === 2, date_format(d, "yyyy/MM/dd"))
            .otherwise(date_format(d, "EEEE, MMMM dd, yyyy")))
        .select(col("o_orderkey"), col("date_str"),
          Dates.parseOrderDate(col("date_str")).as("parsed_date"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      WITH styled AS (
        SELECT o_orderkey,
               CASE o_orderkey % 4
                 WHEN 0 THEN strftime(o_orderdate, '%d-%m-%Y')
                 WHEN 1 THEN strftime(o_orderdate, '%d/%m/%Y')
                 WHEN 2 THEN strftime(o_orderdate, '%Y/%m/%d')
                 ELSE strftime(o_orderdate, '%A, %B %d, %Y') END AS date_str
        FROM orders)
      SELECT o_orderkey, date_str,
             CAST(COALESCE(
               try_strptime(regexp_replace(date_str, '^[A-Za-z]+,\s*', ''), '%d-%m-%Y'),
               try_strptime(regexp_replace(date_str, '^[A-Za-z]+,\s*', ''), '%d/%m/%Y'),
               try_strptime(regexp_replace(date_str, '^[A-Za-z]+,\s*', ''), '%Y/%m/%d'),
               try_strptime(regexp_replace(date_str, '^[A-Za-z]+,\s*', ''), '%B %d, %Y')) AS DATE) AS parsed_date
      FROM styled ORDER BY o_orderkey
    """),
    // sub-0.2 s at sf0.1: the Spark task-scheduling floor, zero scale
    // signal - timed coverage lives in the correctness gate; dropping it
    // from the bench preserves the compact stdout line's precision budget
    benchmark = false)
  /** F12-F14 — dim_date month spine: sequence/explode + date_format/year/
    * quarter (dim_date_table_creation.py:17-46).
    */
  val f4MonthSpine = QueryDef(
    "f4_month_spine",
    (s, dir) => Dates.monthSpine(s, "2024-01-01", "2025-12-01")
      .orderBy(col("month_start_date")),
    Some("""
      SELECT CAST(gs AS DATE) AS month_start_date,
             CAST(strftime(gs, '%Y%m') AS INT) AS date_key,
             CAST(year(gs) AS INT) AS year,
             strftime(gs, '%B') AS month_name,
             strftime(gs, '%b') AS month_short_name,
             'Q' || quarter(gs) AS quarter,
             year(gs) || '-Q' || quarter(gs) AS year_quarter
      FROM (SELECT unnest(generate_series(DATE '2024-01-01', DATE '2025-12-01', INTERVAL 1 MONTH)) AS gs)
      ORDER BY month_start_date
    """),
    benchmark = false)

  /** F17+F19 — per-row arithmetic: negative flip via abs, revenue expression
    * (3_pricing:135-141; denormalise_table_query_fmcg.txt:32). Raw IEEE
    * double ops are bit-identical across engines — no rounding needed.
    */
  val f5MathArith = QueryDef(
    "f5_math_arith",
    (s, dir) => {
      Td(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          abs(col("l_extendedprice") - lit(50000.0)).as("price_dev"),
          (col("l_quantity") * col("l_extendedprice")).as("qty_value"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("qty_value"))
    },
    Some("""
      SELECT l_orderkey, l_linenumber, l_partkey,
             l_extendedprice * (1.0 - l_discount) AS revenue,
             abs(l_extendedprice - 50000.0) AS price_dev,
             l_quantity * l_extendedprice AS qty_value
      FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, qty_value
    """),
    // sub-0.2 s at sf0.1: the Spark task-scheduling floor, zero scale
    // signal - timed coverage lives in the correctness gate; dropping it
    // from the bench preserves the compact stdout line's precision budget
    benchmark = false)
  /** F9+F10 + JSON — when/otherwise chains, coalesce, JSON field extraction
    * over the events table (reference F9 city/market/division chains,
    * 1_customer:233-240; JSON is engine surface beyond the reference).
    */
  val f6CaseJson = QueryDef(
    "f6_case_json",
    (s, dir) => {
      Td(s, dir, "events")
        .select(
          col("event_id"),
          when(col("event_type") === "purchase", lit("revenue"))
            .when(col("event_type").isin("click", "view"), lit("engagement"))
            .otherwise(lit("other")).as("bucket"),
          coalesce(col("value"), lit(0.0)).as("value_filled"),
          get_json_object(col("props"), "$.k").cast("int").as("k_val"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id,
             CASE WHEN event_type = 'purchase' THEN 'revenue'
                  WHEN event_type IN ('click','view') THEN 'engagement'
                  ELSE 'other' END AS bucket,
             COALESCE(value, 0.0) AS value_filled,
             CAST(json_extract_string(props, '$.k') AS INT) AS k_val
      FROM events ORDER BY event_id
    """),
    // sub-0.2 s at sf0.1: the Spark task-scheduling floor, zero scale
    // signal - timed coverage lives in the correctness gate; dropping it
    // from the bench preserves the compact stdout line's precision budget
    benchmark = false)
  /** A-extras — group stats with countDistinct (A6 + dashboard KPI
    * "#Customers", README.md:194-208).
    */
  val f7AggStats = QueryDef(
    "f7_agg_stats",
    (s, dir) => {
      Td(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_customers"),
          dsum(col("o_totalprice")).as("total_sales"),
          min(to_date(col("o_orderdate"))).as("first_date"),
          max(to_date(col("o_orderdate"))).as("last_date"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""
      SELECT o_orderstatus,
             COUNT(*) AS n_orders,
             COUNT(DISTINCT o_custkey) AS n_customers,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
             CAST(MIN(o_orderdate) AS DATE) AS first_date,
             CAST(MAX(o_orderdate) AS DATE) AS last_date
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """))

  /** F8 — exact quantiles per group (interpolating percentile). The
    * percentages are dyadic rationals (0.25/0.5/0.75) ON PURPOSE: the rank
    * position p×(n−1) and interpolation fraction stay exact in double, and
    * both engines use lower + (upper−lower)×fraction, so results are
    * bit-identical. Non-dyadic percentages (0.9) can land one ulp apart
    * between engines — use approx sketches for those at scale.
    */
  val f8Quantiles = QueryDef(
    "f8_quantiles",
    (s, dir) =>
      Td(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25)").as("q25"),
          expr("percentile(l_quantity, 0.5)").as("q50"),
          expr("percentile(l_quantity, 0.75)").as("q75"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag")),
    Some("""
      SELECT l_returnflag,
             quantile_cont(l_quantity, 0.25) AS q25,
             quantile_cont(l_quantity, 0.5) AS q50,
             quantile_cont(l_quantity, 0.75) AS q75,
             COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """))

  /** F9 — grid-sketch quantiles at ARBITRARY (non-dyadic) percentages:
    * the bounded-error path f8's exact `percentile` scaladoc routes large
    * or skewed groups to. Per-group state is a fixed-grid counting
    * histogram (map-side combinable), never the buffered values; the
    * estimate is the lower edge of the bin holding the ⌈p·n⌉-th order
    * statistic — error < grid width (1000 here, on a ~[900, 105000] price
    * range), and every step is integer math or a single IEEE
    * multiply/floor, so the oracle replays it bit-for-bit at any
    * percentage (0.1/0.9/0.99 included — exactly where the exact path
    * loses cross-engine parity to interpolation rounding).
    */
  val f9QuantilesSketch = QueryDef(
    "f9_quantiles_sketch",
    (s, dir) =>
      graft.functions.GridQuantiles.gridQuantiles(
          Td(s, dir, "lineitem"), "l_returnflag", "l_extendedprice", width = 1000,
          ps = Seq("q10" -> 0.10, "q50" -> 0.50, "q90" -> 0.90, "q99" -> 0.99))
        .orderBy(col("l_returnflag")),
    Some("""
      WITH hist AS (
        SELECT l_returnflag, CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS bin,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY 1, 2),
      cum AS (
        SELECT l_returnflag, bin,
               SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin) AS c,
               SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
        FROM hist)
      SELECT l_returnflag,
             CAST(MIN(CASE WHEN c >= ceil(0.1 * n) THEN bin END) * 1000 AS BIGINT) AS q10,
             CAST(MIN(CASE WHEN c >= ceil(0.5 * n) THEN bin END) * 1000 AS BIGINT) AS q50,
             CAST(MIN(CASE WHEN c >= ceil(0.9 * n) THEN bin END) * 1000 AS BIGINT) AS q90,
             CAST(MIN(CASE WHEN c >= ceil(0.99 * n) THEN bin END) * 1000 AS BIGINT) AS q99,
             CAST(MAX(n) AS BIGINT) AS n
      FROM cum GROUP BY l_returnflag ORDER BY l_returnflag
    """))

  /** X8 — histogram binning: fixed-width bins via integer floor division
    * (exact in both engines; width_bucket's float boundary math is not
    * guaranteed bit-stable cross-engine). The shape behind every length /
    * score distribution panel in a curation dashboard.
    */
  val x8LengthHist = QueryDef(
    "x8_length_hist",
    (s, dir) =>
      Td(s, dir, "documents")
        .groupBy(expr("n_chars div 50").as("bin")) // integer div — `/` on longs is double division in Spark
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).cast("long").as("min_chars"),
          max(col("n_chars")).cast("long").as("max_chars"))
        .orderBy(col("bin")),
    Some("""
      SELECT CAST(n_chars // 50 AS BIGINT) AS bin, COUNT(*) AS n_docs,
             CAST(MIN(n_chars) AS BIGINT) AS min_chars,
             CAST(MAX(n_chars) AS BIGINT) AS max_chars
      FROM documents GROUP BY 1 ORDER BY bin
    """))

  val all: Seq[QueryDef] = Seq(
    p1ProjectCastRename, p2FilterPredicates, f1StringClean, f2HashKeys,
    f3DatesMultiformat, f4MonthSpine, f5MathArith, f6CaseJson, f7AggStats,
    f8Quantiles, f9QuantilesSketch, x8LengthHist)
}
