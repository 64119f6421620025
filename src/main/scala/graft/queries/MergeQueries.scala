package graft.queries

import graft.Td
import graft.tables.Upsert
import org.apache.spark.sql.functions._

/** MERGE INTO (S8) and events-rollup queries exercising the engine's upsert
  * primitive through the driver surface — SURVEY.md §2.6.
  */
object MergeQueries {

  /** S8 — MERGE semantics (UpdateAll + InsertAll, the reference's dominant
    * clause shape, e.g. 1_customer_data_processing.py:315-318): target is an
    * "old" customer snapshot, source an overlapping "new" snapshot; matched
    * rows take source values, new keys insert, unmatched targets pass
    * through. Oracle expresses the same via FULL OUTER JOIN + CASE.
    */
  val s8MergeUpsert = QueryDef(
    "s8_merge_upsert",
    (s, dir) => {
      val cust = Td(s, dir, "customer")
      val target = cust.filter(col("c_custkey") <= 1000)
        .select(col("c_custkey"), col("c_acctbal"), lit("t").as("src"))
      val source = cust.filter(col("c_custkey") > 500 && col("c_custkey") <= 1500)
        .select(col("c_custkey"), (col("c_acctbal") * 2).as("c_acctbal"), lit("s").as("src"))
      Upsert.merge(target, source, Seq("c_custkey"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      WITH t AS (SELECT c_custkey, c_acctbal, 't' AS src FROM customer WHERE c_custkey <= 1000),
           s AS (SELECT c_custkey, c_acctbal * 2 AS c_acctbal, 's' AS src FROM customer
                 WHERE c_custkey > 500 AND c_custkey <= 1500)
      SELECT COALESCE(t.c_custkey, s.c_custkey) AS c_custkey,
             CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
             CASE WHEN s.c_custkey IS NOT NULL THEN s.src ELSE t.src END AS src
      FROM t FULL OUTER JOIN s ON t.c_custkey = s.c_custkey
      ORDER BY c_custkey
    """))

  /** S8 insert-only variant (full-load sb_fact merge: InsertAll only,
    * 1_full_load_fact.py:182-186 — matched rows keep target values).
    */
  val s8MergeInsertOnly = QueryDef(
    "s8_merge_insert_only",
    (s, dir) => {
      val cust = Td(s, dir, "customer")
      val target = cust.filter(col("c_custkey") <= 1000)
        .select(col("c_custkey"), col("c_acctbal"), lit("t").as("src"))
      val source = cust.filter(col("c_custkey") > 500 && col("c_custkey") <= 1500)
        .select(col("c_custkey"), (col("c_acctbal") * 2).as("c_acctbal"), lit("s").as("src"))
      Upsert.merge(target, source, Seq("c_custkey"), update = false)
        .orderBy(col("c_custkey"))
    },
    Some("""
      WITH t AS (SELECT c_custkey, c_acctbal, 't' AS src FROM customer WHERE c_custkey <= 1000),
           s AS (SELECT c_custkey, c_acctbal * 2 AS c_acctbal, 's' AS src FROM customer
                 WHERE c_custkey > 500 AND c_custkey <= 1500)
      SELECT COALESCE(t.c_custkey, s.c_custkey) AS c_custkey,
             CASE WHEN t.c_custkey IS NOT NULL THEN t.c_acctbal ELSE s.c_acctbal END AS c_acctbal,
             CASE WHEN t.c_custkey IS NOT NULL THEN t.src ELSE s.src END AS src
      FROM t FULL OUTER JOIN s ON t.c_custkey = s.c_custkey
      ORDER BY c_custkey
    """))

  /** Affected-month incremental recompute (§2.7 step 4,
    * 2_incremental_load_fact.py:246-291): treat post-2000 orders as the
    * increment, recompute only the touched months' rollups, and merge them
    * over the full-history monthly rollup.
    */
  val s8AffectedMonths = QueryDef(
    "s8_affected_months",
    (s, dir) => {
      val orders = Td(s, dir, "orders")
        .withColumn("month", trunc(to_date(col("o_orderdate")), "MM"))
      val base = orders.filter(col("month") < lit("2000-01-01"))
        .groupBy(col("month"))
        .agg(count(lit(1)).cast("long").as("n_orders"))
      val increment = orders.filter(col("month") >= lit("2000-01-01"))
      // distinct touched months, then recompute those months from all rows
      val touched = increment.select(col("month")).distinct()
      val recomputed = orders.join(touched, Seq("month"), "left_semi")
        .groupBy(col("month"))
        .agg(count(lit(1)).cast("long").as("n_orders"))
      Upsert.merge(base, recomputed, Seq("month")).orderBy(col("month"))
    },
    Some("""
      WITH m AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month FROM orders),
           base AS (SELECT month, COUNT(*) AS n_orders FROM m WHERE month < DATE '2000-01-01' GROUP BY month),
           touched AS (SELECT DISTINCT month FROM m WHERE month >= DATE '2000-01-01'),
           recomputed AS (SELECT month, COUNT(*) AS n_orders FROM m
                          WHERE month IN (SELECT month FROM touched) GROUP BY month)
      SELECT COALESCE(r.month, b.month) AS month,
             CASE WHEN r.month IS NOT NULL THEN r.n_orders ELSE b.n_orders END AS n_orders
      FROM base b FULL OUTER JOIN recomputed r ON b.month = r.month
      ORDER BY month
    """))

  /** Structured-Streaming-shaped windowed aggregation over the events table
    * (batch equivalent of the streaming query in graft.streaming; tumbling
    * hour windows + per-type counts/sums).
    */
  val e1EventHourly = QueryDef(
    "e1_event_hourly",
    (s, dir) => {
      Td(s, dir, "events")
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          QueryDef.dsum(col("value"), 28, 10).as("sum_value"))
        .orderBy(col("hour_start"), col("event_type"))
    },
    Some("""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
             event_type,
             COUNT(*) AS n_events,
             COUNT(DISTINCT user_id) AS n_users,
             CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """))

  /** S4@scale — partition-prune proof at the query surface: stage orders
    * month-partitioned through the TableStore layout (hive-style
    * `month=…/` directories — the same `partitionBy` path that lays out
    * `gold_fact_orders`), then read back with a month-equality predicate.
    * At 100 TB this is THE access pattern for the fact table: the scan must
    * touch one month's directory, not 10 years of history. PlanSpec pins
    * the physical proof (PartitionFilters + partitions-read metric = 1);
    * this query pins the result itself against the oracle.
    */
  val s4PartitionPrune = QueryDef(
    "s4_partition_prune",
    (s, dir) => {
      val monthly = Td(s, dir, "orders").select(
        trunc(col("o_orderdate").cast("date"), "MM").as("month"),
        col("o_orderkey"), col("o_totalprice"))
      graft.tables.Scratch.stage(monthly, "s4_fact_stage", Seq("month"))
        .filter(col("month") === lit("1995-02-01").cast("date"))
        .groupBy(col("month"))
        .agg(QueryDef.dsum(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("month"))
    },
    Some("""
      SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             count(*) AS n_orders
      FROM orders
      WHERE date_trunc('month', CAST(o_orderdate AS DATE)) = DATE '1995-02-01'
      GROUP BY 1 ORDER BY 1
    """))

  /** X4 — sessionization, batch twin of the streaming
    * `flatMapGroupsWithState` sessionizer ([[graft.streaming.Streams
    * .sessionize]]): per-user sessions closing after 30 minutes of
    * event-time inactivity, as gaps-and-islands (lag + cumulative sum of
    * session opens). Oracles the one streaming operator that previously had
    * only a spec: same gap, same tie rule (ts, event_id), so the streaming
    * path, this batch path, and the DuckDB replay all agree on session
    * boundaries and aggregates.
    */
  val x4Sessionize = QueryDef(
    "x4_sessionize",
    (s, dir) =>
      graft.streaming.Streams.sessionizeBatch(Td(s, dir, "events"), gapMs = 30L * 60 * 1000)
        .orderBy(col("user_id"), col("session_id")),
    Some("""
      WITH f AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                    THEN 1 ELSE 0 END AS opens
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT *, SUM(opens) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM f)
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value,
             strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
      FROM sess GROUP BY 1, 2 ORDER BY user_id, session_id
    """))

  val all: Seq[QueryDef] = Seq(
    s8MergeUpsert, s8MergeInsertOnly, s8AffectedMonths, e1EventHourly,
    s4PartitionPrune, x4Sessionize)
}
