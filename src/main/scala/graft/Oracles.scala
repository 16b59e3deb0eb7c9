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
}
