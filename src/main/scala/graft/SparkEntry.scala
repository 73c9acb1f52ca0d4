package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Relational, TripEtl}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator/pipeline from SURVEY.md §2 (or
  * an LLM-pipeline extension), and every SQL-expressible one has a matching
  * DuckDB oracle in [[oracleSql]] over the same parquet tables. Column names
  * and types are aligned on both sides (the driver sorts columns by name and
  * hash-compares values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core computation (SURVEY.md §7.2): enrich the event
    * stream with the static station dimension, aggregate per (station, day).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    TripEtl.stationDayAgg(
      TripEtl.enrichTrips(Tables.events(spark, dir), Tables.supplier(spark, dir)))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference parity: ETL pipeline (SURVEY.md §2.2-§2.5) ---
    "trip_enrich" -> ((s, dir) =>
      TripEtl.enrichTrips(Tables.events(s, dir), Tables.supplier(s, dir))),
    "station_day_agg" -> ((s, dir) =>
      TripEtl.stationDayAgg(
        TripEtl.enrichTrips(Tables.events(s, dir), Tables.supplier(s, dir)))),
    "dangling_station_fks" -> ((s, dir) =>
      TripEtl.danglingStationFks(Tables.events(s, dir), Tables.supplier(s, dir))),
    "window_counts" -> ((s, dir) =>
      TripEtl.windowCounts(
        TripEtl.enrichTrips(Tables.events(s, dir), Tables.supplier(s, dir)), 360)),
    "window_anomalies" -> ((s, dir) =>
      TripEtl.windowAnomalies(
        TripEtl.enrichTrips(Tables.events(s, dir), Tables.supplier(s, dir)), 360, 50)),

    // --- relational coverage (SURVEY.md §2.8) / bench headliners ---
    "pricing_summary" -> ((s, dir) => Relational.pricingSummary(Tables.lineitem(s, dir))),
    "region_revenue" -> ((s, dir) =>
      Relational.regionRevenue(Tables.orders(s, dir), Tables.customer(s, dir),
        Tables.nation(s, dir), Tables.region(s, dir))),
    "top_customers" -> ((s, dir) =>
      Relational.topCustomers(Tables.orders(s, dir), Tables.customer(s, dir), 10)),
    "order_sequence" -> ((s, dir) => Relational.orderSequence(Tables.orders(s, dir))),
    "user_activity" -> ((s, dir) => Relational.userActivity(Tables.events(s, dir))),
    "purchasers_without_errors" -> ((s, dir) =>
      Relational.purchasersWithoutErrors(Tables.events(s, dir)))
  )

  /** DuckDB oracles, one per SQL-expressible query; tables are registered by
    * file name. Column aliases match the Spark side exactly.
    */
  def oracleSql: Map[String, String] = Map(
    "trip_enrich" ->
      """SELECT e.event_id AS trip_id, e.ts AS trip_time, e.event_type AS trip_type,
         e.user_id % 10 AS station_id, e.value AS temperature,
         CAST(json_extract_string(e.props, '$.k') AS INT) AS prop_k,
         s.s_name AS station_name, s.s_nationkey AS station_nation,
         s.s_acctbal AS station_acctbal
         FROM events e JOIN supplier s ON e.user_id % 10 = s.s_suppkey""",
    "station_day_agg" ->
      """SELECT s.s_name AS station_name, CAST(e.ts AS DATE) AS event_day,
         COUNT(*) FILTER (WHERE e.event_type = 'purchase') AS started_trips,
         COUNT(*) FILTER (WHERE e.event_type <> 'purchase') AS ended_trips,
         ROUND(CAST(SUM(CAST(e.value AS DECIMAL(38,10))) AS DOUBLE) / COUNT(e.value), 4) AS avg_temperature,
         MAX(e.ts) AS update_time
         FROM events e JOIN supplier s ON e.user_id % 10 = s.s_suppkey
         GROUP BY 1, 2""",
    "dangling_station_fks" ->
      """SELECT e.user_id, COUNT(*) AS n_dangling
         FROM events e
         WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = e.user_id)
         GROUP BY 1""",
    "window_counts" ->
      """SELECT time_bucket(INTERVAL '360 minutes', e.ts) AS window_start,
         time_bucket(INTERVAL '360 minutes', e.ts) + INTERVAL '360 minutes' AS window_end,
         s.s_name AS station_name,
         CAST(s.s_nationkey AS BIGINT) + 1 AS total_docks,
         COUNT(*) FILTER (WHERE e.event_type = 'purchase') AS started,
         COUNT(*) FILTER (WHERE e.event_type <> 'purchase') AS ended,
         list_sort(list(e.ts)) AS event_times
         FROM events e JOIN supplier s ON e.user_id % 10 = s.s_suppkey
         GROUP BY 1, 2, 3, 4""",
    "window_anomalies" ->
      """SELECT window_start, station_name,
         GREATEST(0, ended - started) AS returned_over_rented,
         GREATEST(0, started - ended) AS rented_over_returned,
         total_docks,
         ROUND(ABS(ended - started) / CAST(total_docks AS DOUBLE), 4) AS n_to_docks_ratio,
         (ABS(ended - started) / CAST(total_docks AS DOUBLE)) > 0.5 AS is_anomaly
         FROM (
           SELECT time_bucket(INTERVAL '360 minutes', e.ts) AS window_start,
             s.s_name AS station_name,
             CAST(s.s_nationkey AS BIGINT) + 1 AS total_docks,
             COUNT(*) FILTER (WHERE e.event_type = 'purchase') AS started,
             COUNT(*) FILTER (WHERE e.event_type <> 'purchase') AS ended
           FROM events e JOIN supplier s ON e.user_id % 10 = s.s_suppkey
           GROUP BY 1, 2, 3)""",
    "pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         SUM(l_quantity) AS sum_qty,
         ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE), 2) AS sum_base_price,
         ROUND(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,10))) AS DOUBLE), 2) AS sum_disc_price,
         ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) / COUNT(l_quantity), 4) AS avg_qty,
         ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) / COUNT(l_extendedprice), 4) AS avg_price,
         COUNT(*) AS count_order
         FROM lineitem GROUP BY 1, 2""",
    "region_revenue" ->
      """SELECT r.r_name, n.n_name,
         ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,10))) AS DOUBLE), 2) AS revenue, COUNT(*) AS n_orders
         FROM orders o
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         GROUP BY 1, 2""",
    "top_customers" ->
      """SELECT c.c_custkey, c.c_name,
         ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,10))) AS DOUBLE), 2) AS revenue, COUNT(*) AS n_orders
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY 1, 2
         ORDER BY revenue DESC, c_custkey ASC LIMIT 10""",
    "order_sequence" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, order_seq, price_delta FROM (
           SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER w AS order_seq,
             ROUND(o_totalprice -
               COALESCE(LAG(o_totalprice, 1) OVER w, 0.0), 2) AS price_delta
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC))
         WHERE order_seq <= 3""",
    "user_activity" ->
      """SELECT user_id, COUNT(*) AS n_events,
         COUNT(DISTINCT CAST(ts AS DATE)) AS active_days,
         ROUND(CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(38,10))) AS DOUBLE), 2)
           AS purchase_value,
         MAX(ts) AS last_seen
         FROM events GROUP BY 1""",
    "purchasers_without_errors" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
         EXCEPT
         SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
         ORDER BY user_id"""
  )
}
