package graft

/** DuckDB oracle SQL, one per entry in [[SparkEntry.queries]].
  *
  * Rules (driver hash-compares column-name-sorted values — builder prompt):
  *  - every computed column aliased to the SAME name as the Spark side;
  *  - deterministic ORDER BY with unique tie-breakers, mirrored both sides;
  *  - float aggregates rounded identically both sides;
  *  - integer sums CAST to BIGINT (DuckDB sum(int) is HUGEINT, Spark is long);
  *  - DuckDB `regexp_replace` needs the 'g' flag to match Spark's
  *    replace-all; DuckDB `log` is log10 so `ln` is used; DuckDB `year()`
  *    returns BIGINT so the Spark side casts to long.
  */
object Oracles {

  val relational: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 6) AS avg_qty,
        | round(avg(l_extendedprice), 6) AS avg_price,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-06-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem
        |WHERE l_quantity < 5.0 AND l_discount >= 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_broadcast_join" ->
      """SELECT r_name, n_name,
        | count(*) AS n_customers,
        | round(sum(c_acctbal), 2) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q04_fact_join" ->
      """SELECT o_orderpriority,
        | count(*) AS n_lines,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q05_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_active_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q06_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_inactive_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q07_distinct_agg" ->
      """SELECT o_orderstatus,
        | count(DISTINCT o_custkey) AS n_distinct_customers,
        | count(*) AS n_orders
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q08_rollup_agg" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | count(*) AS n_rows
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q09_window_rank" ->
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice
        |FROM (
        | SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderpriority
        |                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin,

    "q10_window_lag" ->
      """SELECT o_custkey, o_orderkey,
        | round(o_totalprice - coalesce(prev_price, 0.0), 2) AS price_delta,
        | coalesce(next_orderkey, -1) AS next_orderkey
        |FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice) OVER w AS prev_price,
        |  lead(o_orderkey) OVER w AS next_orderkey
        | FROM orders
        | WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)) t
        |WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q11_window_frame" ->
      """SELECT o_custkey, o_orderkey, moving_avg FROM (
        | SELECT o_custkey, o_orderkey,
        |  round(avg(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg
        | FROM orders) t
        |WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q12_topk_per_group" ->
      """SELECT p_brand, rn, p_partkey, p_retailprice
        |FROM (
        | SELECT p_brand, p_partkey, p_retailprice,
        |  row_number() OVER (PARTITION BY p_brand
        |                     ORDER BY p_retailprice DESC, p_partkey) AS rn
        | FROM part) t
        |WHERE rn <= 2
        |ORDER BY p_brand, rn""".stripMargin,

    "q13_set_ops" ->
      """WITH cust AS (SELECT c_nationkey AS nationkey FROM customer),
        |     supp AS (SELECT s_nationkey AS nationkey FROM supplier)
        |SELECT nationkey, relation FROM (
        | SELECT nationkey, 'both' AS relation
        |   FROM (SELECT nationkey FROM cust INTERSECT SELECT nationkey FROM supp)
        | UNION ALL
        | SELECT nationkey, 'customers_only' AS relation
        |   FROM (SELECT nationkey FROM cust EXCEPT SELECT nationkey FROM supp)
        | UNION ALL
        | SELECT DISTINCT nationkey, 'any' AS relation
        |   FROM (SELECT nationkey FROM cust UNION ALL SELECT nationkey FROM supp)
        |) u
        |ORDER BY relation, nationkey""".stripMargin,

    "q14_string_fns" ->
      """SELECT p_partkey,
        | lower(p_name) AS name_lower,
        | upper(p_brand) AS brand_upper,
        | length(p_type) AS type_len,
        | regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled,
        | concat_ws('|', p_brand, p_type) AS brand_type,
        | substring(p_name, 1, 5) AS name_prefix
        |FROM part
        |WHERE p_partkey <= 200
        |ORDER BY p_partkey""".stripMargin,

    "q15_datetime_fns" ->
      """SELECT o_orderkey,
        | strftime(o_orderdate, '%Y%m%dT%H%M%S') AS ts_key,
        | CAST(year(o_orderdate) AS BIGINT) AS order_year,
        | CAST(month(o_orderdate) AS BIGINT) AS order_month,
        | CAST(day(o_orderdate) AS BIGINT) AS order_day,
        | strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        | CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders
        |WHERE o_orderkey <= 300
        |ORDER BY o_orderkey""".stripMargin,

    "q16_math_fns" ->
      """SELECT l_orderkey, l_linenumber,
        | round(sqrt(l_extendedprice), 6) AS sqrt_price,
        | round(ln(l_extendedprice), 6) AS ln_price,
        | round(power(l_discount, 2.0), 6) AS disc_sq,
        | round(sin(l_quantity), 6) AS sin_qty,
        | round(atan(l_tax), 6) AS atan_tax,
        | CAST(floor(l_quantity / 7.0) AS BIGINT) AS qty_div7,
        | abs(l_quantity - 25.0) AS qty_dev
        |FROM lineitem
        |WHERE l_orderkey <= 50
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q17_case_when" ->
      """SELECT class, count(*) AS n_parts, CAST(sum(p_size) AS BIGINT) AS total_size
        |FROM (
        | SELECT CASE WHEN p_type LIKE 'STANDARD%' THEN 'std'
        |             WHEN p_size >= 40 THEN 'large'
        |             ELSE 'other' END AS class,
        |        p_size
        | FROM part) t
        |GROUP BY class
        |ORDER BY class""".stripMargin,

    "q18_json_extract" ->
      """SELECT event_type,
        | CAST(sum(k) AS BIGINT) AS sum_k,
        | max(k) AS max_k,
        | count(*) AS n_events
        |FROM (
        | SELECT event_type,
        |  CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
        | FROM events) t
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
  )

  val temporal: Map[String, String] = Map(
    "q20_tumbling_window" ->
      """SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS window_start,
        | event_type,
        | count(*) AS n_events,
        | round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin,

    "q21_sliding_window" ->
      """SELECT CAST(floor(epoch(ts) / 300) * 300 - k * 300 AS BIGINT) AS window_start,
        | count(*) AS n_events,
        | round(avg(value), 6) AS avg_value
        |FROM events, (VALUES (0), (1)) offs(k)
        |GROUP BY window_start
        |ORDER BY window_start""".stripMargin,

    "q22_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch(ts) AS t, value FROM events),
        | l AS (SELECT *, lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS prev_t FROM e),
        | f AS (SELECT *, CASE WHEN prev_t IS NULL OR t - prev_t > 1800.0
        |                      THEN 1 ELSE 0 END AS new_session FROM l),
        | s AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY t, event_id
        |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM f)
        |SELECT user_id, session_seq,
        | CAST(floor(min(t)) AS BIGINT) AS session_start,
        | count(*) AS n_events,
        | round(sum(value), 2) AS sum_value,
        | CAST(floor(max(t) - min(t)) AS BIGINT) AS duration_s
        |FROM s
        |GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,

    "q23_late_data" ->
      """WITH m AS (SELECT max(epoch(ts)) AS max_ts FROM events)
        |SELECT event_type,
        | CAST(sum(CASE WHEN epoch(ts) < max_ts - 7200.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
        | count(*) AS n_total
        |FROM events, m
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q24_time_partition_keys" ->
      """SELECT strftime(ts, '%Y%m%dT%H') AS time_key,
        | count(*) AS n_rows,
        | round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY time_key
        |ORDER BY time_key""".stripMargin,

    "q25_manifest_agg" ->
      """SELECT event_type, count(*) AS n_bands,
        | string_agg(entry, ',' ORDER BY entry) AS manifest
        |FROM (
        | SELECT event_type,
        |  strftime(ts, '%Y%m%dT%H%M%S') || '=' ||
        |  printf('https://bucket.example/forecasts/%s/%s_%d.tif',
        |         event_type, strftime(ts, '%Y%m%dT%H%M%S'), event_id) AS entry
        | FROM events) t
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
  )

  /** Geo oracles embed the exact same cone-constant doubles as the Spark
    * plan (Scala Double.toString round-trips bit-exactly through DuckDB's
    * parser), so both engines run identical IEEE arithmetic except for
    * libm trig ulps — absorbed by the rounding. */
  val geo: Map[String, String] = {
    import graft.functions.Lcc.{F, R, lambda0, n, rho0}
    val rf = (R * F).toString
    val pi4 = (math.Pi / 4).toString
    val pi2 = (math.Pi / 2).toString
    val grid =
      s"""(SELECT p_partkey,
         |  CAST(p_partkey % 40 AS DOUBLE) * 0.05 + 54.0 AS lat,
         |  CAST(CAST(floor(p_partkey / 40.0) AS BIGINT) % 40 AS DOUBLE) * 0.1 - 10.0 AS lon,
         |  CAST(p_partkey % 100 AS DOUBLE) * 0.5 AS value
         | FROM part)""".stripMargin
    val fwd =
      s"""(SELECT *,
         |  $rf / power(tan($pi4 + radians(lat) / 2), $n) AS rho,
         |  $n * (radians(lon) - ${lambda0.toString}) AS theta
         | FROM $grid g)""".stripMargin
    Map(
      "q26_lcc_forward" ->
        s"""SELECT p_partkey,
           | round(lat, 6) AS lat, round(lon, 6) AS lon,
           | round(rho * sin(theta), 4) AS x_m,
           | round($rho0 - rho * cos(theta), 4) AS y_m
           |FROM $fwd t
           |ORDER BY p_partkey""".stripMargin,

      "q27_lcc_roundtrip" ->
        s"""WITH proj AS (
           | SELECT p_partkey, lat, lon,
           |  rho * sin(theta) AS x_m,
           |  $rho0 - rho * cos(theta) AS y_m
           | FROM $fwd t),
           |inv AS (
           | SELECT p_partkey, lat, lon,
           |  sqrt(x_m * x_m + ($rho0 - y_m) * ($rho0 - y_m)) AS rho2,
           |  atan2(x_m, $rho0 - y_m) AS theta2
           | FROM proj)
           |SELECT p_partkey,
           | round(abs(degrees(${lambda0.toString} + theta2 / $n) - lon), 6) AS lon_err,
           | round(abs(degrees(2.0 * atan(power($rf / rho2, ${(1.0 / n).toString})) - $pi2) - lat), 6) AS lat_err
           |FROM inv
           |ORDER BY p_partkey""".stripMargin,

      "q28_regrid" ->
        s"""SELECT CAST(floor(lat * 4) / 4 AS DOUBLE) AS lat_bin,
           | CAST(floor(lon * 4) / 4 AS DOUBLE) AS lon_bin,
           | count(*) AS n_cells,
           | round(avg(value), 6) AS avg_value,
           | round(min(value), 2) AS min_value,
           | round(max(value), 2) AS max_value
           |FROM $grid g
           |GROUP BY lat_bin, lon_bin
           |ORDER BY lat_bin, lon_bin""".stripMargin,
    )
  }
}
