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
        | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
        | floor(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) * 100) / 100 AS sum_disc_price,
        | round(avg(l_quantity), 6) AS avg_qty,
        | floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 1e6) / 1e6 AS avg_price,
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
        | round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q04_fact_join" ->
      """SELECT o_orderpriority,
        | count(*) AS n_lines,
        | floor(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) * 100) / 100 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // q92's oracle is deliberately the PLAIN join: salting is a physical
    // rewrite that must not change the result.
    "q92_salted_join" ->
      """SELECT s_nationkey, count(*) AS n_items,
        | round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey""".stripMargin,

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
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 350000.0)
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
        |  floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) /
        |    count(*) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 1e4) / 1e4 AS moving_avg
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

    // Each engine judges its OWN HLL sketch against its own exact count —
    // the boolean (not the engine-specific estimate) is what's compared.
    "q19_approx_distinct" ->
      """SELECT o_orderstatus,
        | count(DISTINCT o_custkey) AS n_exact,
        | abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey))
        |   <= count(DISTINCT o_custkey) * 0.15 AS within_15pct
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

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
    // q107: q54's union-sort shape with the matched click's time carried
    // forward so the tolerance is a post-window filter — floor() before
    // the BIGINT cast on both sides (DuckDB CAST rounds, Spark truncates).
    "q107_asof_tolerance" ->
      """WITH u AS (
        | SELECT user_id AS k, epoch(ts) AS t, 0 AS side, event_id AS eid
        | FROM events WHERE event_type = 'click'
        | UNION ALL
        | SELECT user_id, epoch(ts), 1, event_id
        | FROM events WHERE event_type = 'purchase'),
        | w AS (SELECT *,
        |   last_value(CASE WHEN side = 0 THEN eid END IGNORE NULLS) OVER
        |     (PARTITION BY k ORDER BY t, side, eid ROWS UNBOUNDED PRECEDING) AS asof_click,
        |   last_value(CASE WHEN side = 0 THEN t END IGNORE NULLS) OVER
        |     (PARTITION BY k ORDER BY t, side, eid ROWS UNBOUNDED PRECEDING) AS asof_t
        |  FROM u)
        |SELECT eid AS event_id, k AS user_id, asof_click,
        | CAST(floor(t - asof_t) AS BIGINT) AS gap_s
        |FROM w WHERE side = 1 AND asof_click IS NOT NULL AND t - asof_t <= 3600
        |ORDER BY event_id""".stripMargin,

    "q20_tumbling_window" ->
      """SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS window_start,
        | event_type,
        | count(*) AS n_events,
        | round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
        |FROM events
        |GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin,

    "q21_sliding_window" ->
      """SELECT CAST(floor(epoch(ts) / 300) * 300 - k * 300 AS BIGINT) AS window_start,
        | count(*) AS n_events,
        | floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 1e6) / 1e6 AS avg_value
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
        | round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value,
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
        | round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
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
           | floor(avg(value) * 1e6) / 1e6 AS avg_value,
           | round(min(value), 2) AS min_value,
           | round(max(value), 2) AS max_value
           |FROM $grid g
           |GROUP BY lat_bin, lon_bin
           |ORDER BY lat_bin, lon_bin""".stripMargin,

      // q111: 2D cell-bucketed proximity self-join; nearest-neighbor
      // argmin orders by the ROUNDED distance then id (see Geo scaladoc).
      "q111_spatial_join" ->
        s"""WITH pts AS (SELECT p_partkey AS pid,
           |  rho * sin(theta) AS x, $rho0 - rho * cos(theta) AS y
           | FROM $fwd t),
           | cells AS (SELECT *, CAST(floor(x / 11700.0) AS BIGINT) AS cx,
           |   CAST(floor(y / 11700.0) AS BIGINT) AS cy FROM pts),
           | r AS (SELECT pid AS p2, x AS x2, y AS y2,
           |   cx + dx.d AS cx, cy + dy.d AS cy
           |  FROM cells, (VALUES (-1), (0), (1)) dx(d),
           |       (VALUES (-1), (0), (1)) dy(d)),
           | p AS (SELECT l.pid AS p1, r.p2,
           |   (l.x - r.x2) * (l.x - r.x2) + (l.y - r.y2) * (l.y - r.y2) AS d2
           |  FROM cells l JOIN r ON l.cx = r.cx AND l.cy = r.cy
           |                     AND l.pid <> r.p2),
           | f AS (SELECT p1, p2, round(sqrt(d2), 4) AS dist FROM p
           |  WHERE d2 <= 11700.0 * 11700.0),
           | nn AS (SELECT p1, p2, dist,
           |   count(*) OVER (PARTITION BY p1) AS n_neighbors,
           |   row_number() OVER (PARTITION BY p1 ORDER BY dist, p2) AS rn
           |  FROM f)
           |SELECT p1 AS p_partkey, CAST(n_neighbors AS BIGINT) AS n_neighbors,
           | p2 AS nn_id, dist AS nn_dist_m
           |FROM nn WHERE rn = 1 ORDER BY p_partkey""".stripMargin,
    )
  }

  // ---- text / dedup oracle generation ------------------------------------

  /** DuckDB mirror of Hashing.h32: first 8 hex chars of sha256 parsed as a
    * base-16 BIGINT (DuckDB has no `conv`, so the parse is an explicit
    * 8-term polynomial). */
  private def dHash(e: String): String =
    (0 until 8).map { i =>
      val mult = math.pow(16, 7 - i).toLong
      s"CAST(strpos('0123456789abcdef', substr(sha256($e), ${i + 1}, 1)) - 1 AS BIGINT) * ${mult}"
    }.mkString("(", " + ", ")")

  private val P = graft.functions.Hashing.P
  private val Bbase = graft.functions.Hashing.B

  /** Shared CTE fragments: filtered tokens and 3-token shingles. */
  private val toksCte =
    "t AS (SELECT doc_id, text, n_chars, lang, list_filter(string_split(text, ' '), s -> len(s) > 0) AS toks FROM documents)"
  private val shCte =
    "sh AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))) AS s FROM t WHERE len(toks) >= 3)"

  /** Shared BPE CTE chain (q32/q138): mirrors Text.bpeMergeTable /
    * bpeDocCounts — BpeRounds rounds of adjacent-pair counting over the
    * current vocabulary segmentation, each applying that round's top
    * BpeMergesPerRound merges through the same space-bounded literal
    * replaces (JVM and DuckDB replace() share the left-to-right
    * non-overlapping scan — verified on symbol runs). Rank lookups are
    * scalar subqueries; ranks past the pair population coalesce to a
    * \x01 sentinel that cannot occur in a segmentation. MATERIALIZED
    * keeps DuckDB from re-inlining each round's CTEs into the 32 scalar
    * subqueries of the next round (exponential re-evaluation otherwise).
    * Ends with per-doc BPE token counts in `bpedoc`. */
  private val bpeCtes: String = {
    val R = graft.operators.Text.BpeRounds
    val M = graft.operators.Text.BpeMergesPerRound
    def nest(r: Int): String = (1 to M).foldLeft("seg") { (acc, k) =>
      s"replace($acc, ' ' || coalesce((SELECT p FROM r$r WHERE rn = $k), chr(1)) || ' ', " +
        s"' ' || coalesce((SELECT replace(p, ' ', '') FROM r$r WHERE rn = $k), chr(1)) || ' ')"
    }
    val rounds = (0 until R).map { r =>
      s""" p$r AS MATERIALIZED (SELECT p, sum(wcount) AS w FROM (
         |   SELECT wcount, unnest(list_transform(range(1, len(sy)), i -> sy[i] || ' ' || sy[i+1])) AS p
         |   FROM (SELECT wcount, string_split(trim(seg), ' ') AS sy FROM vocab$r) s$r) g$r
         |  GROUP BY p),
         | r$r AS MATERIALIZED (SELECT p, row_number() OVER (ORDER BY w DESC, p) AS rn FROM p$r),
         | vocab${r + 1} AS MATERIALIZED (SELECT tok, wcount, ${nest(r)} AS seg FROM vocab$r),""".stripMargin
    }.mkString("\n")
    val segInitSql = "' ' || regexp_replace(tok, '(.)', '\\1 ', 'g')"
    s"""tokens AS MATERIALIZED (SELECT doc_id, unnest(list_filter(string_split(text, ' '), s -> len(s) > 0)) AS tok FROM documents),
       | vocab0 AS MATERIALIZED (SELECT tok, CAST(count(*) AS BIGINT) AS wcount,
       |   $segInitSql AS seg
       |  FROM tokens GROUP BY tok),
       |$rounds
       | bpev AS (SELECT tok, CAST(len(string_split(trim(seg), ' ')) AS BIGINT) AS n_sym FROM vocab$R),
       | bpedoc AS (SELECT doc_id, CAST(sum(n_sym) AS BIGINT) AS n_bpe
       |  FROM tokens JOIN bpev USING (tok) GROUP BY doc_id)""".stripMargin
  }

  private val stopList = graft.operators.Text.stopwords.mkString("['", "', '", "']")
  private val lexValues = graft.operators.Text.lexicon
    .map { case (m, l) => s"('$m', '$l')" }.mkString(", ")

  val text: Map[String, String] = Map(
    "q29_word_count" ->
      """SELECT token, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |WHERE len(token) > 0
        |GROUP BY token
        |ORDER BY cnt DESC, token
        |LIMIT 100""".stripMargin,

    "q30_text_quality" ->
      s"""WITH $toksCte,
         | m AS (SELECT doc_id, text,
         |   CAST(len(toks) AS BIGINT) AS n_tokens,
         |   CAST(list_aggregate(list_transform(toks, s -> len(s)), 'sum') AS BIGINT) AS sum_len,
         |   CAST(len(list_filter(toks, s -> list_contains($stopList, s))) AS BIGINT) AS stop_hits
         |  FROM t)
         |SELECT doc_id, n_tokens,
         | round(CAST(sum_len AS DOUBLE) / n_tokens, 6) AS avg_token_len,
         | round(CAST(stop_hits AS DOUBLE) / n_tokens, 6) AS stop_ratio,
         | CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS punct_count,
         | round(0.5 * (CAST(stop_hits AS DOUBLE) / n_tokens)
         |   + 0.3 / (1.0 + abs(CAST(sum_len AS DOUBLE) / n_tokens - 5.0))
         |   + 0.2 * least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0), 6) AS quality
         |FROM m ORDER BY doc_id""".stripMargin,

    "q31_lang_id" ->
      s"""WITH lex(marker, cand_lang) AS (VALUES $lexValues),
         | tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         | hits AS (SELECT doc_id, cand_lang, count(*) AS hits
         |          FROM tok JOIN lex ON token = marker GROUP BY doc_id, cand_lang),
         | pred AS (SELECT doc_id, cand_lang AS pred0 FROM (
         |   SELECT *, row_number() OVER (PARTITION BY doc_id
         |     ORDER BY hits DESC, cand_lang) AS rn FROM hits) r WHERE rn = 1)
         |SELECT lang, coalesce(pred0, 'und') AS pred_lang, count(*) AS n_docs
         |FROM documents LEFT JOIN pred USING (doc_id)
         |GROUP BY lang, pred_lang
         |ORDER BY lang, pred_lang""".stripMargin,

    // q32: the corpus-learned BPE (bpeCtes) — n_bpe_tokens is the real
    // merge-table tokenizer's output, chars_per_token its fertility
    // (integer-first floor-truncation).
    "q32_token_bpe" ->
      s"""WITH $bpeCtes
         |SELECT d.doc_id,
         | CAST(len(list_filter(string_split(text, ' '), s -> len(s) > 0)) AS BIGINT) AS n_ws_tokens,
         | CAST(coalesce(n_bpe, 0) AS BIGINT) AS n_bpe_tokens,
         | CASE WHEN n_bpe > 0
         |   THEN floor(n_chars * 1e6 / n_bpe) / 1e6 END AS chars_per_token
         |FROM documents d LEFT JOIN bpedoc USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q65_tfidf" ->
      """WITH tok AS (SELECT doc_id,
        |   unnest(list_filter(string_split(text, ' '), s -> len(s) > 0)) AS token
        |  FROM documents),
        | tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
        | idf AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
        | n AS (SELECT count(*) AS n_docs FROM documents),
        | s AS (SELECT doc_id, token, tf, df,
        |   floor(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) * 1e6) / 1e6 AS tfidf
        |  FROM tf JOIN idf USING (token), n),
        | r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |         ORDER BY tfidf DESC, token) AS rn
        |  FROM s WHERE doc_id < 50)
        |SELECT doc_id, CAST(rn AS BIGINT) AS rn, token, tf, df, tfidf
        |FROM r WHERE rn <= 5 ORDER BY doc_id, rn""".stripMargin,

    "q33_fingerprint" ->
      s"""WITH $toksCte,
         | hh AS (SELECT doc_id, text,
         |   list_transform(toks, s -> ${dHash("s")} % ${P}) AS hs FROM t)
         |SELECT doc_id,
         | list_reduce(hs, (acc, x) -> (acc * ${Bbase} + x) % ${P}) AS rolling_fp,
         | substr(sha256(text), 1, 16) AS sha_fp
         |FROM hh ORDER BY doc_id""".stripMargin,

    // q138: tokenizer fertility — ratios floor-truncated on the
    // integer-first form (n * 1e6 / d), one IEEE rounding, identical
    // both engines. LEFT join from the per-doc census with coalesced
    // zero token counts + null ratios (ADVICE r15: a zero-token
    // language must keep its document volumes).
    "q138_token_fertility" ->
      s"""WITH $toksCte,
         | $bpeCtes,
         | pd AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(n_chars) AS BIGINT) AS n_chars FROM t GROUP BY lang),
         | tk AS (SELECT lang, unnest(toks) AS token FROM t),
         | pt AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
         |         CAST(count(DISTINCT token) AS BIGINT) AS n_vocab,
         |         CAST(sum(len(token)) AS BIGINT) AS sum_tok_len
         |        FROM tk GROUP BY lang),
         | pb AS (SELECT lang, CAST(sum(n_bpe) AS BIGINT) AS bpe_toks
         |        FROM documents LEFT JOIN bpedoc USING (doc_id) GROUP BY lang)
         |SELECT pd.lang, n_docs, n_chars,
         | coalesce(n_tokens, 0) AS n_tokens,
         | coalesce(n_vocab, 0) AS n_vocab,
         | CASE WHEN n_tokens > 0
         |   THEN floor(n_chars * 1e6 / n_tokens) / 1e6 END AS chars_per_token,
         | CASE WHEN n_tokens > 0
         |   THEN floor(sum_tok_len * 1e6 / n_tokens) / 1e6 END AS mean_tok_len,
         | CASE WHEN n_tokens > 0
         |   THEN floor(n_vocab * 1e6 / n_tokens) / 1e6 END AS ttr,
         | coalesce(bpe_toks, 0) AS bpe_tokens,
         | CASE WHEN bpe_toks > 0
         |   THEN floor(n_chars * 1e6 / bpe_toks) / 1e6 END AS chars_per_bpe_token
         |FROM pd LEFT JOIN pt ON pd.lang = pt.lang
         | LEFT JOIN pb ON pd.lang = pb.lang ORDER BY pd.lang""".stripMargin,
  )

  private val sigSelect: String = {
    import graft.functions.Hashing.{aCoef, bCoef, K}
    val minExprs = (0 until K).map(i =>
      f"min((${aCoef(i)}%d * hp + ${bCoef(i)}%d) %% ${P}) AS mh$i%02d").mkString(",\n   ")
    s"""SELECT doc_id,
       |   $minExprs
       |  FROM hh GROUP BY doc_id""".stripMargin
  }

  private val sigCtes: String =
    s"""$toksCte,
       | $shCte,
       | hh AS (SELECT doc_id, ${dHash("s")} % ${P} AS hp FROM sh),
       | sig AS ($sigSelect)""".stripMargin

  /** MinHash-LSH verified near-dup pairs (J ≥ 0.6) as a `pairs` CTE —
    * shared by q37 (the pair report) and q80 (cluster formation). */
  private val lshPairCtes: String = {
    val bandEq = (0 until graft.functions.Hashing.Bands).map { bnd =>
      (0 until graft.functions.Hashing.RowsPerBand)
        .map { r => val c = f"mh${bnd * graft.functions.Hashing.RowsPerBand + r}%02d"; s"a.$c = b.$c" }
        .mkString("(", " AND ", ")")
    }.mkString(" OR ")
    // The verify intersects 32-bit HASHED shingles (DISTINCT doc_id, hp),
    // mirroring Dedup.lshNearDup's per-row hash-array formulation — a
    // within-pair collision perturbs both engines identically.
    s"""$sigCtes,
       | cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |          FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ($bandEq)),
       | ds AS (SELECT DISTINCT doc_id, hp FROM hh),
       | sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
       | com AS (SELECT d1, d2, count(*) AS common
       |         FROM cand JOIN ds s1 ON d1 = s1.doc_id
       |                   JOIN ds s2 ON d2 = s2.doc_id AND s1.hp = s2.hp
       |         GROUP BY d1, d2),
       | pairs AS (SELECT d1, d2,
       |   round(CAST(common AS DOUBLE) / (n1.n + n2.n - common), 6) AS jaccard
       |  FROM com JOIN sizes n1 ON n1.doc_id = d1 JOIN sizes n2 ON n2.doc_id = d2
       |  WHERE round(CAST(common AS DOUBLE) / (n1.n + n2.n - common), 6) >= 0.6)""".stripMargin
  }

  /** Connected components over the LSH pair graph as a `comp (id,
    * cluster)` CTE chain (requires WITH RECURSIVE) — shared by q80
    * (cluster report) and q82 (representative selection). */
  private val componentCtes: String =
    s"""$lshPairCtes,
       | edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
       |   UNION ALL SELECT d2, d1 FROM pairs),
       | nodes AS (SELECT DISTINCT src AS id FROM edges),
       | reach(id, label) AS (
       |   SELECT id, id FROM nodes
       |   UNION
       |   SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
       | comp AS (SELECT id, min(label) AS cluster FROM reach GROUP BY id)""".stripMargin

  private val simhashBits: String = {
    val sums = (0 until 32)
      .map(b => s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(",\n   ")
    val combine = (0 until 32)
      .map(b => s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""tok AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), s -> len(s) > 0)) AS token FROM documents),
       | hh2 AS (SELECT doc_id, ${dHash("token")} AS h FROM tok),
       | bits AS (SELECT doc_id,
       |   $sums
       |  FROM hh2 GROUP BY doc_id),
       | sim AS (SELECT doc_id, CAST($combine AS BIGINT) AS simhash FROM bits)""".stripMargin
  }

  val dedup: Map[String, String] = Map(
    "q34_dedup_exact" ->
      """SELECT fp, min(doc_id) AS keeper_doc_id, count(*) AS n_copies
        |FROM (SELECT doc_id,
        |  sha256(trim(lower(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        | FROM documents) t
        |GROUP BY fp ORDER BY fp""".stripMargin,

    // The df <= cap window filter mirrors Dedup.ShingleDfCap — the skew
    // guard is part of the declared query semantics, so both engines drop
    // the same (boilerplate) shingles and the hashes still match.
    "q35_jaccard_neardup" ->
      s"""WITH $toksCte,
         | $shCte,
         | ds0 AS (SELECT DISTINCT doc_id, s FROM sh),
         | ds AS (SELECT doc_id, s FROM (
         |   SELECT *, count(*) OVER (PARTITION BY s) AS df FROM ds0) t
         |  WHERE df <= ${graft.operators.Dedup.ShingleDfCap}),
         | sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
         | com AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
         |         FROM ds a JOIN ds b ON a.s = b.s AND a.doc_id < b.doc_id
         |         GROUP BY d1, d2)
         |SELECT d1, d2, common, n1.n AS n1, n2.n AS n2,
         | round(CAST(common AS DOUBLE) / (n1.n + n2.n - common), 6) AS jaccard
         |FROM com JOIN sizes n1 ON n1.doc_id = d1 JOIN sizes n2 ON n2.doc_id = d2
         |WHERE round(CAST(common AS DOUBLE) / (n1.n + n2.n - common), 6) >= 0.6
         |ORDER BY d1, d2""".stripMargin,

    "q36_minhash_sig" ->
      s"""WITH $sigCtes
         |SELECT * FROM sig ORDER BY doc_id""".stripMargin,

    "q37_lsh_neardup" ->
      s"""WITH $lshPairCtes
         |SELECT d1, d2, jaccard FROM pairs ORDER BY d1, d2""".stripMargin,

    "q60_chargram_neardup" ->
      """WITH t AS (SELECT doc_id, text FROM documents
        |           WHERE doc_id < 1000 AND length(text) >= 4),
        | g AS (SELECT DISTINCT doc_id,
        |        unnest(list_transform(range(1, length(text) - 2),
        |                              i -> substr(text, i, 4))) AS s FROM t),
        | sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        | com AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
        |         FROM g a JOIN g b ON a.s = b.s AND a.doc_id < b.doc_id
        |         GROUP BY d1, d2)
        |SELECT d1, d2,
        | round(CAST(common AS DOUBLE) / (n1.n + n2.n - common), 6) AS jaccard
        |FROM com JOIN sizes n1 ON n1.doc_id = d1 JOIN sizes n2 ON n2.doc_id = d2
        |WHERE round(CAST(common AS DOUBLE) / (n1.n + n2.n - common), 6) >= 0.5
        |ORDER BY d1, d2""".stripMargin,

    "q38_simhash" ->
      s"""WITH $simhashBits
         |SELECT doc_id, simhash FROM sim ORDER BY doc_id""".stripMargin,

    "q39_simhash_pairs" ->
      s"""WITH $simhashBits,
         | sub AS (SELECT * FROM sim WHERE doc_id < ${graft.operators.Dedup.PairProbeBound})
         |SELECT a.doc_id AS d1, b.doc_id AS d2,
         | CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sub a JOIN sub b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
         |ORDER BY d1, d2""".stripMargin,

    // q132: the q37 pair CTEs + the q61 pair CTEs full-joined on the
    // pair key, swept over a 4-threshold grid; ratio floors on the 1e-6
    // grid, pair samples as zero-padded MIN strings so string order is
    // numeric pair order in both engines.
    "q132_crossmodal_agreement" ->
      s"""WITH $lshPairCtes,
         | $embCte,
         | ee AS (SELECT * FROM e WHERE vec_id < ${graft.operators.Dedup.PairProbeBound}),
         | ep AS (SELECT a.vec_id AS v1, b.vec_id AS v2,
         |   round((${dotSql("a.embedding", "b.embedding")}) / (a.nrm * b.nrm), 6) AS cosine
         |  FROM ee a JOIN ee b ON a.vec_id < b.vec_id
         |  WHERE round((${dotSql("a.embedding", "b.embedding")}) / (a.nrm * b.nrm), 6) >= 0.35),
         | lx AS (SELECT d1 AS a, d2 AS b FROM pairs WHERE d1 < ${graft.operators.Dedup.PairProbeBound} AND d2 < ${graft.operators.Dedup.PairProbeBound}),
         | j AS (SELECT coalesce(lx.a, ep.v1) AS a, coalesce(lx.b, ep.v2) AS b,
         |   lx.a IS NOT NULL AS in_lex, ep.cosine AS cosine
         |  FROM lx FULL JOIN ep ON lx.a = ep.v1 AND lx.b = ep.v2),
         | pk AS (SELECT *, lpad(CAST(a AS VARCHAR), 6, '0') || '-' ||
         |    lpad(CAST(b AS VARCHAR), 6, '0') AS pair_key FROM j),
         | th AS (SELECT CAST(unnest([0.35, 0.5, 0.65, 0.8]) AS DOUBLE) AS thr),
         | ag AS (SELECT thr,
         |   sum(CASE WHEN in_lex THEN 1 ELSE 0 END) AS n_lex,
         |   sum(CASE WHEN cosine >= thr THEN 1 ELSE 0 END) AS n_emb,
         |   sum(CASE WHEN in_lex AND cosine >= thr THEN 1 ELSE 0 END) AS n_both,
         |   min(CASE WHEN cosine >= thr AND NOT in_lex THEN pair_key END) AS min_emb_only_pair,
         |   min(CASE WHEN in_lex AND (cosine IS NULL OR cosine < thr) THEN pair_key END) AS min_lex_only_pair
         |  FROM pk, th GROUP BY thr)
         |SELECT thr, CAST(n_lex AS BIGINT) AS n_lex, CAST(n_emb AS BIGINT) AS n_emb,
         | CAST(n_both AS BIGINT) AS n_both,
         | CASE WHEN n_emb > 0 THEN floor(n_both * 1e6 / n_emb) / 1e6 END AS emb_precision,
         | CASE WHEN n_lex > 0 THEN floor(n_both * 1e6 / n_lex) / 1e6 END AS emb_recall,
         | min_emb_only_pair, min_lex_only_pair
         |FROM ag ORDER BY thr""".stripMargin,
  )

  // ---- similarity / multimodal -------------------------------------------

  /** Explicit left-assoc 64-term dot product — identical accumulation
    * order to Spark's zip_with+aggregate fold. */
  private def dotSql(a: String, b: String): String =
    (1 to 64).map(i => s"CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE)")
      .mkString(" + ")

  private def embCte =
    s"""e AS (SELECT vec_id, label, embedding,
       |   sqrt(${dotSql("embedding", "embedding")}) AS nrm FROM embeddings)""".stripMargin

  val similarity: Map[String, String] = Map(
    "q40_cosine_topk" ->
      s"""WITH $embCte,
         | pairs AS (SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
         |    (${dotSql("p.embedding", "c.embedding")}) / (p.nrm * c.nrm) AS cosine
         |   FROM e p JOIN e c ON p.vec_id % 97 = 0 AND p.vec_id < 2048 AND p.vec_id <> c.vec_id),
         | r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |         ORDER BY cosine DESC, cand_id) AS rnk FROM pairs)
         |SELECT probe_id, CAST(rnk AS BIGINT) AS "rank", cand_id,
         | round(cosine, 6) AS cosine
         |FROM r WHERE rnk <= 10 ORDER BY probe_id, rnk""".stripMargin,

    "q41_ann_bucketed" -> {
      val bucket = (0 until 4)
        .map(i => s"CASE WHEN embedding[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END")
        .mkString("CAST(", " + ", " AS BIGINT)")
      s"""WITH $embCte,
         | eb AS (SELECT *, $bucket AS bucket FROM e),
         | pairs AS (SELECT p.vec_id AS probe_id, p.bucket, c.vec_id AS cand_id,
         |    (${dotSql("p.embedding", "c.embedding")}) / (p.nrm * c.nrm) AS cosine
         |   FROM eb p JOIN eb c ON p.vec_id % 97 = 0 AND p.vec_id < 2048 AND p.bucket = c.bucket
         |                      AND p.vec_id <> c.vec_id),
         | r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |         ORDER BY cosine DESC, cand_id) AS rnk FROM pairs)
         |SELECT probe_id, bucket, CAST(rnk AS BIGINT) AS "rank", cand_id,
         | round(cosine, 6) AS cosine
         |FROM r WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin
    },

    "q42_embedding_stats" ->
      s"""WITH $embCte,
         | m AS (SELECT label, count(*) AS n_vectors,
         |   sum(CAST(floor(nrm * 1e9) AS DECIMAL(28,9))) AS nrm_s,
         |   round(min(nrm), 6) AS min_norm,
         |   round(max(nrm), 6) AS max_norm,
         |   sum(CAST(floor(CAST(embedding[1] AS DOUBLE) * 1e9) AS DECIMAL(28,9))) AS c0_s
         |  FROM e GROUP BY label)
         |SELECT label, n_vectors,
         | floor(CAST(nrm_s AS DOUBLE) / 1e9 / n_vectors * 1e6) / 1e6 AS avg_norm,
         | min_norm, max_norm,
         | floor(CAST(c0_s AS DOUBLE) / 1e9 / n_vectors * 1e6) / 1e6 AS avg_c0
         |FROM m ORDER BY label""".stripMargin,
  )

  /** q58: signature expression generated from the same hyperplane
    * constants (identical literals, identical left-assoc order). */
  private def rpSigSql(emb: String): String =
    graft.operators.Similarity.hyperplanes.zipWithIndex.map { case (h, j) =>
      val dotH = h.zipWithIndex
        .map { case (w, i) => s"CAST($emb[${i + 1}] AS DOUBLE) * ${w}" }
        .mkString(" + ")
      s"CASE WHEN ($dotH) > 0.0 THEN ${1L << j} ELSE 0 END"
    }.mkString("CAST(", " + ", " AS BIGINT)")

  val similarity2: Map[String, String] = Map(
    "q58_rp_lsh_ann" ->
      s"""WITH $embCte,
         | es AS (SELECT *, ${rpSigSql("embedding")} AS sig FROM e),
         | pairs AS (SELECT p.vec_id AS probe_id, p.sig, c.vec_id AS cand_id,
         |    (${dotSql("p.embedding", "c.embedding")}) / (p.nrm * c.nrm) AS cosine
         |   FROM es p JOIN es c ON p.vec_id % 97 = 0 AND p.vec_id < 2048 AND p.sig = c.sig
         |                      AND p.vec_id <> c.vec_id),
         | r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |         ORDER BY cosine DESC, cand_id) AS rnk FROM pairs)
         |SELECT probe_id, sig, CAST(rnk AS BIGINT) AS "rank", cand_id,
         | round(cosine, 6) AS cosine
         |FROM r WHERE rnk <= 3 ORDER BY probe_id, rnk""".stripMargin,

    // IVF: cell assignment reuses q70's argmax-by-window shape; the
    // probe side ranks its top-4 cells the same way, exact cosine
    // inside the probed cells only.
    "q102_ivf_ann" ->
      s"""WITH $embCte,
         | cent AS (SELECT vec_id AS cell, embedding AS cvec, nrm AS cnrm
         |   FROM e WHERE vec_id < 16),
         | ac AS (SELECT v.vec_id, v.embedding, v.nrm, c.cell,
         |   row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |     (${dotSql("v.embedding", "c.cvec")}) / (v.nrm * c.cnrm) DESC,
         |     c.cell) AS rn
         |  FROM e v, cent c),
         | asg AS (SELECT vec_id, embedding, nrm, cell FROM ac WHERE rn = 1),
         | pr AS (SELECT p.vec_id AS probe_id, p.embedding AS p_emb,
         |   p.nrm AS p_nrm, c.cell,
         |   row_number() OVER (PARTITION BY p.vec_id ORDER BY
         |     (${dotSql("p.embedding", "c.cvec")}) / (p.nrm * c.cnrm) DESC,
         |     c.cell) AS prn
         |  FROM e p, cent c WHERE p.vec_id % 97 = 0 AND p.vec_id < 2048),
         | pcells AS (SELECT probe_id, p_emb, p_nrm, cell FROM pr WHERE prn <= 4),
         | pairs AS (SELECT pc.probe_id, pc.cell, a.vec_id AS cand_id,
         |    (${dotSql("pc.p_emb", "a.embedding")}) / (pc.p_nrm * a.nrm) AS cosine
         |   FROM pcells pc JOIN asg a ON pc.cell = a.cell
         |                             AND pc.probe_id <> a.vec_id),
         | r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |         ORDER BY cosine DESC, cand_id) AS rnk FROM pairs)
         |SELECT probe_id, cell, CAST(rnk AS BIGINT) AS "rank", cand_id,
         | round(cosine, 6) AS cosine
         |FROM r WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin,

    // Trained IVF: q102 with the seed-centroid CTE replaced by one Lloyd
    // step — seeded E-step assignment, q77's decimal-exact M-step mean
    // per (cell, dim), re-narrowed to FLOAT so both engines feed the
    // identical float vectors into the identical left-assoc dot chain.
    "q104_ivf_trained" ->
      s"""WITH $embCte,
         | seed AS (SELECT vec_id AS cell, embedding AS cvec, nrm AS cnrm
         |   FROM e WHERE vec_id < 16),
         | a0 AS (SELECT v.vec_id, v.embedding, c.cell,
         |   row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |     (${dotSql("v.embedding", "c.cvec")}) / (v.nrm * c.cnrm) DESC,
         |     c.cell) AS rn
         |  FROM e v, seed c),
         | x AS (SELECT cell,
         |   unnest(range(len(embedding))) AS dim,
         |   unnest(embedding) AS v
         |  FROM a0 WHERE rn = 1),
         | m AS (SELECT cell, dim,
         |   floor(CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1e9)
         |       AS DECIMAL(28,9))) AS DOUBLE) / 1e9 / count(*) * 1e6) / 1e6 AS cm
         |  FROM x GROUP BY cell, dim),
         | tc0 AS (SELECT cell, list(CAST(cm AS FLOAT) ORDER BY dim) AS cvec
         |  FROM m GROUP BY cell),
         | cent AS (SELECT cell, cvec,
         |   sqrt(${dotSql("cvec", "cvec")}) AS cnrm FROM tc0),
         | ac AS (SELECT v.vec_id, v.embedding, v.nrm, c.cell,
         |   row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |     (${dotSql("v.embedding", "c.cvec")}) / (v.nrm * c.cnrm) DESC,
         |     c.cell) AS rn
         |  FROM e v, cent c),
         | asg AS (SELECT vec_id, embedding, nrm, cell FROM ac WHERE rn = 1),
         | pr AS (SELECT p.vec_id AS probe_id, p.embedding AS p_emb,
         |   p.nrm AS p_nrm, c.cell,
         |   row_number() OVER (PARTITION BY p.vec_id ORDER BY
         |     (${dotSql("p.embedding", "c.cvec")}) / (p.nrm * c.cnrm) DESC,
         |     c.cell) AS prn
         |  FROM e p, cent c WHERE p.vec_id % 97 = 0 AND p.vec_id < 2048),
         | pcells AS (SELECT probe_id, p_emb, p_nrm, cell FROM pr WHERE prn <= 4),
         | pairs AS (SELECT pc.probe_id, pc.cell, a.vec_id AS cand_id,
         |    (${dotSql("pc.p_emb", "a.embedding")}) / (pc.p_nrm * a.nrm) AS cosine
         |   FROM pcells pc JOIN asg a ON pc.cell = a.cell
         |                             AND pc.probe_id <> a.vec_id),
         | r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |         ORDER BY cosine DESC, cand_id) AS rnk FROM pairs)
         |SELECT probe_id, cell, CAST(rnk AS BIGINT) AS "rank", cand_id,
         | round(cosine, 6) AS cosine
         |FROM r WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin,

    // PQ-ADC: per-(vector, subspace) argmin against the 16 seed
    // codebooks (same window-argmin shape as the IVF cell assignment),
    // then ADC = decimal-exact sum of the probe's precomputed subspace
    // distances at the candidate's codes — order-independent, so the
    // engines agree regardless of join/aggregation order.
    "q106_pq_ann" ->
      s"""WITH $embCte,
         | cb AS (SELECT CAST(vec_id AS INT) AS code, embedding AS cvec
         |   FROM e WHERE vec_id < 16),
         | vs AS (SELECT vec_id, embedding, unnest(range(0, 8)) AS sub FROM e),
         | ecd AS (SELECT v.vec_id, v.sub, c.code,
         |    (${pqDistSql("v.embedding", "c.cvec", "v.sub")}) AS d
         |   FROM vs v, cb c),
         | ec AS (SELECT *, row_number() OVER (PARTITION BY vec_id, sub
         |         ORDER BY d, code) AS rn FROM ecd),
         | codes AS (SELECT vec_id, sub, code FROM ec WHERE rn = 1),
         | ps AS (SELECT vec_id AS probe_id, embedding,
         |   unnest(range(0, 8)) AS sub FROM e WHERE vec_id % 97 = 0 AND vec_id < 2048),
         | lut AS (SELECT p.probe_id, p.sub, c.code,
         |    (${pqDistSql("p.embedding", "c.cvec", "p.sub")}) AS d
         |   FROM ps p, cb c),
         | sc AS (SELECT l.probe_id, k.vec_id AS cand_id,
         |    CAST(sum(CAST(floor(l.d * 1e9) AS DECIMAL(28,9))) AS DOUBLE) / 1e9 AS adc
         |   FROM codes k JOIN lut l ON l.sub = k.sub AND l.code = k.code
         |                          AND l.probe_id <> k.vec_id
         |   GROUP BY 1, 2),
         | r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |         ORDER BY adc, cand_id) AS rnk FROM sc)
         |SELECT probe_id, CAST(rnk AS BIGINT) AS "rank", cand_id,
         | round(adc, 6) AS adc
         |FROM r WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin,
  )

  val similarity3: Map[String, String] = Map(
    // IVF-PQ: q102's cell routing (ac/asg/pr/pcells) composed with
    // q106's PQ machinery (cb/codes/lut) — candidates are the probed
    // cells' members, scored by the decimal-exact ADC sum.
    "q108_ivfpq_ann" ->
      s"""WITH $embCte,
         | cent AS (SELECT vec_id AS cell, embedding AS cvec, nrm AS cnrm
         |   FROM e WHERE vec_id < 16),
         | ac AS (SELECT v.vec_id, c.cell,
         |   row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |     (${dotSql("v.embedding", "c.cvec")}) / (v.nrm * c.cnrm) DESC,
         |     c.cell) AS rn
         |  FROM e v, cent c),
         | asg AS (SELECT vec_id, cell FROM ac WHERE rn = 1),
         | pr AS (SELECT p.vec_id AS probe_id, c.cell,
         |   row_number() OVER (PARTITION BY p.vec_id ORDER BY
         |     (${dotSql("p.embedding", "c.cvec")}) / (p.nrm * c.cnrm) DESC,
         |     c.cell) AS prn
         |  FROM e p, cent c WHERE p.vec_id % 97 = 0 AND p.vec_id < 2048),
         | pcells AS (SELECT probe_id, cell FROM pr WHERE prn <= 4),
         | cb AS (SELECT CAST(vec_id AS INT) AS code, embedding AS cvec
         |   FROM e WHERE vec_id < 16),
         | vs AS (SELECT vec_id, embedding, unnest(range(0, 8)) AS sub FROM e),
         | ecd AS (SELECT v.vec_id, v.sub, c.code,
         |    (${pqDistSql("v.embedding", "c.cvec", "v.sub")}) AS d
         |   FROM vs v, cb c),
         | ec AS (SELECT *, row_number() OVER (PARTITION BY vec_id, sub
         |         ORDER BY d, code) AS rn FROM ecd),
         | codes AS (SELECT vec_id, sub, code FROM ec WHERE rn = 1),
         | ps AS (SELECT vec_id AS probe_id, embedding,
         |   unnest(range(0, 8)) AS sub FROM e WHERE vec_id % 97 = 0 AND vec_id < 2048),
         | lut AS (SELECT p.probe_id, p.sub, c.code,
         |    (${pqDistSql("p.embedding", "c.cvec", "p.sub")}) AS d
         |   FROM ps p, cb c),
         | cand AS (SELECT pc.probe_id, a.vec_id, pc.cell
         |   FROM pcells pc JOIN asg a ON pc.cell = a.cell
         |                           AND pc.probe_id <> a.vec_id),
         | sc AS (SELECT cd.probe_id, cd.vec_id AS cand_id, cd.cell,
         |    CAST(sum(CAST(floor(l.d * 1e9) AS DECIMAL(28,9))) AS DOUBLE) / 1e9 AS adc
         |   FROM cand cd
         |   JOIN codes k ON k.vec_id = cd.vec_id
         |   JOIN lut l ON l.probe_id = cd.probe_id AND l.sub = k.sub
         |             AND l.code = k.code
         |   GROUP BY 1, 2, 3),
         | r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |         ORDER BY adc, cand_id) AS rnk FROM sc)
         |SELECT probe_id, cell, CAST(rnk AS BIGINT) AS "rank", cand_id,
         | round(adc, 6) AS adc
         |FROM r WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin,

    // PQ recall audit: q88's hits/probes shape with the approximate side
    // replaced by the full q108 IVF-PQ stack.
    "q109_pq_recall" ->
      s"""WITH $embCte,
         | ex AS (SELECT probe_id, cand_id FROM (
         |   SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
         |    row_number() OVER (PARTITION BY p.vec_id
         |     ORDER BY (${dotSql("p.embedding", "c.embedding")}) / (p.nrm * c.nrm) DESC,
         |       c.vec_id) AS rnk
         |   FROM e p JOIN e c ON p.vec_id % 97 = 0 AND p.vec_id < 2048 AND p.vec_id <> c.vec_id)
         |  WHERE rnk <= 5),
         | cent AS (SELECT vec_id AS cell, embedding AS cvec, nrm AS cnrm
         |   FROM e WHERE vec_id < 16),
         | ac AS (SELECT v.vec_id, c.cell,
         |   row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |     (${dotSql("v.embedding", "c.cvec")}) / (v.nrm * c.cnrm) DESC,
         |     c.cell) AS rn
         |  FROM e v, cent c),
         | asg AS (SELECT vec_id, cell FROM ac WHERE rn = 1),
         | pr AS (SELECT p.vec_id AS probe_id, c.cell,
         |   row_number() OVER (PARTITION BY p.vec_id ORDER BY
         |     (${dotSql("p.embedding", "c.cvec")}) / (p.nrm * c.cnrm) DESC,
         |     c.cell) AS prn
         |  FROM e p, cent c WHERE p.vec_id % 97 = 0 AND p.vec_id < 2048),
         | pcells AS (SELECT probe_id, cell FROM pr WHERE prn <= 4),
         | cb AS (SELECT CAST(vec_id AS INT) AS code, embedding AS cvec
         |   FROM e WHERE vec_id < 16),
         | vs AS (SELECT vec_id, embedding, unnest(range(0, 8)) AS sub FROM e),
         | ecd AS (SELECT v.vec_id, v.sub, c.code,
         |    (${pqDistSql("v.embedding", "c.cvec", "v.sub")}) AS d
         |   FROM vs v, cb c),
         | ec AS (SELECT *, row_number() OVER (PARTITION BY vec_id, sub
         |         ORDER BY d, code) AS rn FROM ecd),
         | codes AS (SELECT vec_id, sub, code FROM ec WHERE rn = 1),
         | ps AS (SELECT vec_id AS probe_id, embedding,
         |   unnest(range(0, 8)) AS sub FROM e WHERE vec_id % 97 = 0 AND vec_id < 2048),
         | lut AS (SELECT p.probe_id, p.sub, c.code,
         |    (${pqDistSql("p.embedding", "c.cvec", "p.sub")}) AS d
         |   FROM ps p, cb c),
         | cand AS (SELECT pc.probe_id, a.vec_id
         |   FROM pcells pc JOIN asg a ON pc.cell = a.cell
         |                           AND pc.probe_id <> a.vec_id),
         | sc AS (SELECT cd.probe_id, cd.vec_id AS cand_id,
         |    CAST(sum(CAST(floor(l.d * 1e9) AS DECIMAL(28,9))) AS DOUBLE) / 1e9 AS adc
         |   FROM cand cd
         |   JOIN codes k ON k.vec_id = cd.vec_id
         |   JOIN lut l ON l.probe_id = cd.probe_id AND l.sub = k.sub
         |             AND l.code = k.code
         |   GROUP BY 1, 2),
         | ap AS (SELECT probe_id, cand_id FROM (
         |   SELECT *, row_number() OVER (PARTITION BY probe_id
         |     ORDER BY adc, cand_id) AS rnk FROM sc) WHERE rnk <= 5),
         | hits AS (SELECT ex.probe_id, count(*) AS n
         |   FROM ex JOIN ap ON ex.probe_id = ap.probe_id AND ex.cand_id = ap.cand_id
         |   GROUP BY ex.probe_id),
         | probes AS (SELECT DISTINCT vec_id AS probe_id FROM e WHERE vec_id % 97 = 0 AND vec_id < 2048)
         |SELECT p.probe_id, CAST(coalesce(n, 0) AS BIGINT) AS n_hits,
         | coalesce(n, 0) / 5.0 AS recall_at_5
         |FROM probes p LEFT JOIN hits h ON p.probe_id = h.probe_id
         |ORDER BY p.probe_id""".stripMargin,

    // IVF refresh: q102's assignment CTE, split by the q94 %7
    // corpus/batch convention, per-cell occupancy census.
    "q110_ivf_refresh" ->
      s"""WITH $embCte,
         | cent AS (SELECT vec_id AS cell, embedding AS cvec, nrm AS cnrm
         |   FROM e WHERE vec_id < 16),
         | ac AS (SELECT v.vec_id, c.cell,
         |   row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |     (${dotSql("v.embedding", "c.cvec")}) / (v.nrm * c.cnrm) DESC,
         |     c.cell) AS rn
         |  FROM e v, cent c),
         | t AS (SELECT cell,
         |   CASE WHEN vec_id % 7 = 0 THEN 1 ELSE 0 END AS is_batch
         |  FROM ac WHERE rn = 1)
         |SELECT cell, CAST(sum(1 - is_batch) AS BIGINT) AS n_corpus,
         | CAST(sum(is_batch) AS BIGINT) AS n_batch,
         | floor(CAST(sum(is_batch) AS DOUBLE) / count(*) * 1e6) / 1e6 AS frac_new
         |FROM t GROUP BY cell ORDER BY cell""".stripMargin,

    // Fully-trained IVF-PQ: q104's one-Lloyd-step centroid CTEs (seed/
    // a0/x/m/tc0/cent), residuals = v − centroid(cell(v)) narrowed to
    // FLOAT (exact-in-double subtraction, so both engines produce the
    // identical float32), PQ codebook = one Lloyd step on per-subspace
    // residuals (E-step vs the first-16 residual seeds, decimal-exact
    // M-step), cell-specific probe residuals for the ADC tables.
    "q112_ivfpq_trained" ->
      s"""WITH $embCte,
         | seed AS (SELECT vec_id AS cell, embedding AS cvec, nrm AS cnrm
         |   FROM e WHERE vec_id < 16),
         | a0 AS (SELECT v.vec_id, v.embedding, c.cell,
         |   row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |     (${dotSql("v.embedding", "c.cvec")}) / (v.nrm * c.cnrm) DESC,
         |     c.cell) AS rn
         |  FROM e v, seed c),
         | x AS (SELECT cell,
         |   unnest(range(len(embedding))) AS dim,
         |   unnest(embedding) AS v
         |  FROM a0 WHERE rn = 1),
         | m AS (SELECT cell, dim,
         |   floor(CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1e9)
         |       AS DECIMAL(28,9))) AS DOUBLE) / 1e9 / count(*) * 1e6) / 1e6 AS cm
         |  FROM x GROUP BY cell, dim),
         | tc0 AS MATERIALIZED (SELECT cell, list(CAST(cm AS FLOAT) ORDER BY dim) AS cvec
         |  FROM m GROUP BY cell),
         | cent AS MATERIALIZED (SELECT cell, cvec,
         |   sqrt(${dotSql("cvec", "cvec")}) AS cnrm FROM tc0),
         | ac AS (SELECT v.vec_id, v.embedding, c.cell,
         |   row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |     (${dotSql("v.embedding", "c.cvec")}) / (v.nrm * c.cnrm) DESC,
         |     c.cell) AS rn
         |  FROM e v, cent c),
         | asg AS MATERIALIZED (SELECT vec_id, embedding, cell FROM ac WHERE rn = 1),
         | resid AS MATERIALIZED (SELECT a.vec_id, a.cell,
         |   list_transform(range(1, 65), i ->
         |     CAST(CAST(a.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE)
         |       AS FLOAT)) AS resid
         |  FROM asg a JOIN cent c ON a.cell = c.cell),
         | scb AS (SELECT CAST(vec_id AS INT) AS code, resid AS cvec
         |   FROM resid WHERE vec_id < 16),
         | vs AS MATERIALIZED (SELECT vec_id, resid, unnest(range(0, 8)) AS sub FROM resid),
         | ecd AS (SELECT v.vec_id, v.sub, c.code,
         |    (${pqDistSql("v.resid", "c.cvec", "v.sub")}) AS d
         |   FROM vs v, scb c),
         | ec AS (SELECT *, row_number() OVER (PARTITION BY vec_id, sub
         |         ORDER BY d, code) AS rn FROM ecd),
         | c0 AS MATERIALIZED (SELECT vec_id, sub, code FROM ec WHERE rn = 1),
         | xr AS (SELECT c0.sub, c0.code, ii.i, r.resid[c0.sub * 8 + ii.i] AS v
         |   FROM c0 JOIN resid r ON c0.vec_id = r.vec_id
         |   CROSS JOIN (SELECT unnest(range(1, 9)) AS i) ii),
         | mr AS (SELECT sub, code, i,
         |   floor(CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1e9)
         |       AS DECIMAL(28,9))) AS DOUBLE) / 1e9 / count(*) * 1e6) / 1e6 AS cm
         |  FROM xr GROUP BY sub, code, i),
         | tcb AS MATERIALIZED (SELECT sub, code, list(CAST(cm AS FLOAT) ORDER BY i) AS scvec
         |  FROM mr GROUP BY sub, code),
         | ecd2 AS (SELECT v.vec_id, t.sub, t.code,
         |    (${pqDistSegSql("v.resid", "t.scvec", "t.sub")}) AS d
         |   FROM vs v JOIN tcb t ON v.sub = t.sub),
         | ec2 AS (SELECT *, row_number() OVER (PARTITION BY vec_id, sub
         |         ORDER BY d, code) AS rn FROM ecd2),
         | codes AS MATERIALIZED (SELECT vec_id, sub, code FROM ec2 WHERE rn = 1),
         | pr AS (SELECT p.vec_id AS probe_id, p.embedding AS p_emb,
         |   c.cell, c.cvec,
         |   row_number() OVER (PARTITION BY p.vec_id ORDER BY
         |     (${dotSql("p.embedding", "c.cvec")}) / (p.nrm * c.cnrm) DESC,
         |     c.cell) AS prn
         |  FROM e p, cent c WHERE p.vec_id % 97 = 0 AND p.vec_id < 2048),
         | pcells AS MATERIALIZED (SELECT probe_id, cell,
         |   list_transform(range(1, 65), i ->
         |     CAST(CAST(p_emb[i] AS DOUBLE) - CAST(cvec[i] AS DOUBLE)
         |       AS FLOAT)) AS p_resid
         |  FROM pr WHERE prn <= 4),
         | lut AS (SELECT pc.probe_id, pc.cell, t.sub, t.code,
         |    (${pqDistSegSql("pc.p_resid", "t.scvec", "t.sub")}) AS d
         |   FROM pcells pc, tcb t),
         | cand AS (SELECT pc.probe_id, r.vec_id, pc.cell
         |   FROM pcells pc JOIN resid r ON pc.cell = r.cell
         |                             AND pc.probe_id <> r.vec_id),
         | sc AS (SELECT cd.probe_id, cd.vec_id AS cand_id, cd.cell,
         |    CAST(sum(CAST(floor(l.d * 1e9) AS DECIMAL(28,9))) AS DOUBLE) / 1e9 AS adc
         |   FROM cand cd
         |   JOIN codes k ON k.vec_id = cd.vec_id
         |   JOIN lut l ON l.probe_id = cd.probe_id AND l.cell = cd.cell
         |             AND l.sub = k.sub AND l.code = k.code
         |   GROUP BY 1, 2, 3),
         | r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |         ORDER BY adc, cand_id) AS rnk FROM sc)
         |SELECT probe_id, cell, CAST(rnk AS BIGINT) AS "rank", cand_id,
         | round(adc, 6) AS adc
         |FROM r WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin,
  )

  /** q106: subspace-dispatched squared L2 — one CASE branch per subspace,
    * each an explicit left-assoc 8-term chain, mirroring
    * [[graft.operators.Similarity]]'s `pqDist`/`subL2` term order
    * exactly. */
  private def pqDistSql(a: String, b: String, sub: String): String =
    (0 until 8).map { s =>
      val terms = (0 until 8).map { i =>
        val idx = s * 8 + i + 1
        s"(CAST($a[$idx] AS DOUBLE) - CAST($b[$idx] AS DOUBLE)) * " +
          s"(CAST($a[$idx] AS DOUBLE) - CAST($b[$idx] AS DOUBLE))"
      }.mkString(" + ")
      s"WHEN $sub = $s THEN ($terms)"
    }.mkString("CASE ", " ", " END")

  /** q112: [[pqDistSql]] against a dsub-dim SUB-codebook entry (`b`
    * holds only its own subspace's dims) — mirrors `pqDistSeg`/
    * `subL2Seg`'s term order exactly. */
  private def pqDistSegSql(a: String, b: String, sub: String): String =
    (0 until 8).map { s =>
      val terms = (0 until 8).map { i =>
        val ai = s * 8 + i + 1
        val bi = i + 1
        s"(CAST($a[$ai] AS DOUBLE) - CAST($b[$bi] AS DOUBLE)) * " +
          s"(CAST($a[$ai] AS DOUBLE) - CAST($b[$bi] AS DOUBLE))"
      }.mkString(" + ")
      s"WHEN $sub = $s THEN ($terms)"
    }.mkString("CASE ", " ", " END")

  val multimodal: Map[String, String] = Map(
    "q43_multimodal_meta" ->
      s"""SELECT doc_id,
         | CAST(strlen(text) AS BIGINT) AS n_bytes,
         | ${dHash("text")} % 1000 AS fake_feature,
         | CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte,
         | CASE WHEN n_chars >= 300 THEN 'video'
         |      WHEN n_chars >= 150 THEN 'image'
         |      ELSE 'audio' END AS media_class
         |FROM documents ORDER BY doc_id""".stripMargin,

    // q44 frames mirror q131's sizedDocs ceil framing (one "frames of a
    // payload" definition per file — VERDICT r15 #3).
    "q44_frame_sample" ->
      s"""WITH d AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes FROM documents),
         | s AS (SELECT doc_id,
         |   greatest(CAST(ceil(n_bytes / 256.0) AS BIGINT), 1) AS n_frames FROM d),
         | f AS (SELECT doc_id, unnest(range(0, CAST(n_frames AS INT))) AS frame_id FROM s)
         |SELECT doc_id, frame_id,
         | (${dHash("CAST(doc_id AS VARCHAR)")} + frame_id * 2654435761) % 2147483647 AS phash
         |FROM f ORDER BY doc_id, frame_id""".stripMargin,

    // The mapPartitions stub kernel is a pure byte fold (sum of UTF-8
    // bytes); documents text is ASCII-only (verified: strlen == length at
    // every SF), so a per-character ascii() fold reproduces it in SQL.
    "q45_media_decode" ->
      """WITH b AS (
        | SELECT doc_id,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(coalesce(list_aggregate(
        |    list_transform(range(1, strlen(text) + 1), i -> ascii(substr(text, i, 1))),
        |    'sum'), 0) AS BIGINT) AS byte_sum
        | FROM documents)
        |SELECT doc_id, n_bytes, byte_sum, byte_sum % 4096 AS stub_feature
        |FROM b ORDER BY doc_id""".stripMargin,

    // q131: aligned 256-byte frames, content-derived frame hash (dHash
    // of the slice — Spark's h32 of the identical substring), q95's
    // coverage semantics at frame granularity.
    "q131_frame_dedup" ->
      s"""WITH d AS (SELECT doc_id, text,
         |   CAST(length(text) AS BIGINT) AS nc FROM documents),
         | s AS (SELECT doc_id, text,
         |   greatest(CAST(ceil(nc / 256.0) AS BIGINT), 1) AS n_frames FROM d),
         | f AS (SELECT doc_id, n_frames,
         |   unnest(range(0, CAST(n_frames AS INT))) AS frame_id, text FROM s),
         | h AS (SELECT doc_id, frame_id,
         |   ${dHash("substring(text, CAST(frame_id * 256 + 1 AS INT), 256)")} AS fhash
         |  FROM f),
         | dup AS (SELECT fhash FROM h GROUP BY fhash HAVING count(*) >= 2),
         | hits AS (SELECT doc_id, count(*) AS ndf
         |  FROM h JOIN dup USING (fhash) GROUP BY doc_id)
         |SELECT s.doc_id, s.n_frames,
         | CAST(coalesce(ndf, 0) AS BIGINT) AS n_dup_frames,
         | floor(coalesce(ndf, 0) * 1.0 / s.n_frames * 1e6) / 1e6 AS dup_ratio
         |FROM s LEFT JOIN hits USING (doc_id) ORDER BY s.doc_id""".stripMargin,
  )

  val dedup2: Map[String, String] = Map(
    "q61_embedding_neardup" ->
      s"""WITH $embCte,
         | p AS (SELECT * FROM e WHERE vec_id < ${graft.operators.Dedup.PairProbeBound})
         |SELECT a.vec_id AS v1, b.vec_id AS v2,
         | round((${dotSql("a.embedding", "b.embedding")}) / (a.nrm * b.nrm), 6) AS cosine
         |FROM p a JOIN p b ON a.vec_id < b.vec_id
         |WHERE round((${dotSql("a.embedding", "b.embedding")}) / (a.nrm * b.nrm), 6) >= 0.35
         |ORDER BY v1, v2""".stripMargin,
  )

  val advanced: Map[String, String] = Map(
    "q46_cube_agg" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | count(*) AS n_orders,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q47_pivot" ->
      """SELECT o_orderpriority,
        | CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        | CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        | CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q48_above_nation_avg" ->
      """WITH na AS (SELECT c_nationkey AS nk,
        |             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS nation_avg
        |            FROM customer GROUP BY c_nationkey)
        |SELECT c_custkey, c_nationkey,
        | floor((c_acctbal - nation_avg) * 100) / 100 AS above_by
        |FROM customer JOIN na ON c_nationkey = nk
        |WHERE c_acctbal > nation_avg
        |ORDER BY c_custkey""".stripMargin,

    "q49_near_max" ->
      """WITH m AS (SELECT max(o_totalprice) AS max_price FROM orders)
        |SELECT o_orderkey, o_totalprice,
        | round(max_price - o_totalprice, 2) AS below_max
        |FROM orders, m
        |WHERE o_totalprice >= max_price * 0.9
        |ORDER BY o_orderkey""".stripMargin,

    "q50_percentiles" ->
      """SELECT c_mktsegment, count(*) AS n,
        | round(CAST(quantile_cont(c_acctbal, 0.5) AS DOUBLE), 6) AS p50,
        | round(CAST(quantile_cont(c_acctbal, 0.9) AS DOUBLE), 6) AS p90,
        | round(CAST(quantile_cont(c_acctbal, 0.99) AS DOUBLE), 6) AS p99
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q51_latest_per_key" ->
      """SELECT user_id, event_id AS latest_event_id, event_type AS latest_type,
        | CAST(floor(epoch(ts)) AS BIGINT) AS latest_epoch
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events) t
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    "q52_array_ops" ->
      """WITH s AS (SELECT vec_id, embedding,
        |   list_sort(embedding, 'DESC') AS sorted FROM embeddings
        |  WHERE vec_id < 200)
        |SELECT vec_id,
        | CAST(len(embedding) AS BIGINT) AS dim,
        | round(CAST(sorted[1] AS DOUBLE) + CAST(sorted[2] AS DOUBLE) + CAST(sorted[3] AS DOUBLE), 6) AS sum_top3,
        | round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
        | round(CAST(sorted[1] AS DOUBLE), 6) AS max_val,
        | round(CAST(sorted[64] AS DOUBLE), 6) AS min_val
        |FROM s ORDER BY vec_id""".stripMargin,

    "q53_map_ops" ->
      """SELECT event_id,
        | event_type AS type_from_map,
        | CAST(user_id AS VARCHAR) AS uid_from_map,
        | CAST(2 AS BIGINT) AS n_keys
        |FROM events
        |WHERE event_id < 500
        |ORDER BY event_id""".stripMargin,

    "q59_topk_aggregator" ->
      """SELECT p_brand, rn, p_partkey, p_retailprice
        |FROM (
        | SELECT p_brand, p_partkey, p_retailprice,
        |  CAST(row_number() OVER (PARTITION BY p_brand
        |       ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS rn
        | FROM part) t
        |WHERE rn <= 2
        |ORDER BY p_brand, rn""".stripMargin,

    "q56_null_handling" ->
      """SELECT l_linestatus,
        | count(*) AS n_all,
        | count(nullif(l_returnflag, 'N')) AS n_flag_not_n,
        | CAST(sum(CASE WHEN nullif(l_returnflag, 'N') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_n
        |FROM lineitem
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,

    "q57_hash_sample" ->
      s"""SELECT o_orderstatus,
         | count(*) AS n_sampled,
         | round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sampled_total
         |FROM orders
         |WHERE ${dHash("CAST(o_orderkey AS VARCHAR)")} % 100 < 10
         |GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin,

    "q54_asof_join" ->
      """WITH u AS (
        | SELECT user_id AS k, epoch(ts) AS t, 1 AS side, event_id, event_type,
        |        NULL::BIGINT AS o_orderkey, NULL::DOUBLE AS o_totalprice
        | FROM events
        | UNION ALL
        | SELECT o_custkey, epoch(o_orderdate), 0, NULL, NULL, o_orderkey, o_totalprice
        | FROM orders),
        | w AS (SELECT *,
        |   last_value(o_orderkey IGNORE NULLS) OVER
        |     (PARTITION BY k ORDER BY t, side, o_orderkey ROWS UNBOUNDED PRECEDING) AS asof_orderkey,
        |   last_value(o_totalprice IGNORE NULLS) OVER
        |     (PARTITION BY k ORDER BY t, side, o_orderkey ROWS UNBOUNDED PRECEDING) AS asof_price
        |  FROM u)
        |SELECT event_id, k AS user_id, event_type, asof_orderkey, asof_price
        |FROM w WHERE side = 1 AND asof_orderkey IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    "q55_range_join" ->
      """SELECT type1, type2, count(*) AS n_pairs FROM (
        | SELECT a.event_id AS e1, b.event_id AS e2,
        |        a.event_type AS type1, b.event_type AS type2
        | FROM events a JOIN events b
        |   ON a.event_id < b.event_id AND a.event_type <> b.event_type
        |  AND abs(epoch(b.ts) - epoch(a.ts)) <= 60.0) t
        |GROUP BY type1, type2
        |ORDER BY type1, type2""".stripMargin,
  )

  // ---- round 2: analytic wave --------------------------------------------

  val analytic: Map[String, String] = Map(
    "q62_window_family" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        | floor(percent_rank() OVER w * 1e6) / 1e6 AS pct_rank,
        | floor(cume_dist() OVER w * 1e6) / 1e6 AS cume,
        | first_value(o_orderkey) OVER wall AS cheapest_order,
        | last_value(o_orderkey) OVER wall AS priciest_order
        |FROM orders WHERE o_custkey < 500
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey),
        | wall AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q63_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        | coalesce(l_linestatus, 'ALL') AS status,
        | count(*) AS n,
        | round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
        |ORDER BY flag, status""".stripMargin,

    "q64_unpivot" ->
      """WITH m AS (
        | SELECT 'l_quantity' AS measure, CAST(l_quantity AS DOUBLE) AS val FROM lineitem
        | UNION ALL SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM lineitem
        | UNION ALL SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem
        | UNION ALL SELECT 'l_tax', CAST(l_tax AS DOUBLE) FROM lineitem)
        |SELECT measure, count(*) AS n,
        | round(CAST(sum(CAST(val AS DECIMAL(18,4))) AS DOUBLE), 4) AS total,
        | round(min(val), 4) AS lo,
        | round(max(val), 4) AS hi
        |FROM m GROUP BY measure ORDER BY measure""".stripMargin,
  )

  /** Training-data curation operators (Curation.scala). */
  private val curationBase: Map[String, String] = Map(
    "q66_quality_gate" ->
      s"""WITH $toksCte,
         | tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
         | cnt AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY doc_id, token),
         | st AS (SELECT doc_id,
         |   CAST(sum(c) AS BIGINT) AS n_tokens,
         |   CAST(count(*) AS BIGINT) AS n_distinct,
         |   max(c) AS max_tok,
         |   CAST(sum(len(token) * c) AS BIGINT) AS sum_len
         |  FROM cnt GROUP BY doc_id)
         |SELECT doc_id, n_tokens, n_distinct,
         | floor(sum_len * 1.0 / n_tokens * 1e6) / 1e6 AS mean_tok_len,
         | floor(n_distinct * 1.0 / n_tokens * 1e6) / 1e6 AS ttr,
         | floor(max_tok * 1.0 / n_tokens * 1e6) / 1e6 AS top_ratio,
         | (n_tokens >= 30
         |   AND floor(n_distinct * 1.0 / n_tokens * 1e6) / 1e6 >= 0.45
         |   AND floor(max_tok * 1.0 / n_tokens * 1e6) / 1e6 <= 0.15) AS keep
         |FROM st ORDER BY doc_id""".stripMargin,

    "q67_repetition" ->
      s"""WITH $toksCte,
         | g AS (SELECT doc_id,
         |   list_transform(range(1, len(toks)),
         |     i -> array_to_string(toks[i:i+1], ' ')) AS grams
         |  FROM t WHERE len(toks) >= 2),
         | r AS (SELECT doc_id,
         |   CAST(len(grams) AS BIGINT) AS n_grams,
         |   CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct
         |  FROM g)
         |SELECT doc_id, n_grams, n_distinct,
         | floor((1.0 - n_distinct * 1.0 / n_grams) * 1e6) / 1e6 AS dup_ratio,
         | (floor((1.0 - n_distinct * 1.0 / n_grams) * 1e6) / 1e6 > 0.05) AS repetitive
         |FROM r ORDER BY doc_id""".stripMargin,

    "q68_boilerplate_census" ->
      s"""WITH $toksCte,
         | g AS (SELECT doc_id,
         |   unnest(list_transform(range(1, len(toks) - 1),
         |     i -> array_to_string(toks[i:i+2], ' '))) AS gram
         |  FROM t WHERE len(toks) >= 3)
         |SELECT gram,
         | CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
         | CAST(count(*) AS BIGINT) AS occ
         |FROM g GROUP BY gram
         |ORDER BY df DESC, occ DESC, gram LIMIT 20""".stripMargin,

    // q97: the sketch is deterministic (sha256-derived buckets), so the
    // oracle rebuilds the exact same CMS and the estimates hash-match.
    "q97_cms_census" ->
      s"""WITH $toksCte,
         | g AS (SELECT doc_id,
         |   unnest(list_transform(range(1, len(toks) - 1),
         |     i -> array_to_string(toks[i:i+2], ' '))) AS gram
         |  FROM t WHERE len(toks) >= 3),
         | ins AS (SELECT DISTINCT doc_id, gram FROM g),
         | cells AS (SELECT r, b, CAST(count(*) AS BIGINT) AS cnt FROM (
         |   SELECT 0 AS r, ${dHash("'0|' || gram")} % 65536 AS b FROM ins
         |   UNION ALL SELECT 1, ${dHash("'1|' || gram")} % 65536 FROM ins
         |   UNION ALL SELECT 2, ${dHash("'2|' || gram")} % 65536 FROM ins
         |   UNION ALL SELECT 3, ${dHash("'3|' || gram")} % 65536 FROM ins)
         |  GROUP BY r, b),
         | top AS (SELECT gram,
         |   CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
         |   CAST(count(*) AS BIGINT) AS occ
         |  FROM g GROUP BY gram ORDER BY df DESC, occ DESC, gram LIMIT 20)
         |SELECT t.gram, t.df, t.occ,
         | least(c0.cnt, c1.cnt, c2.cnt, c3.cnt) AS cms_df,
         | least(c0.cnt, c1.cnt, c2.cnt, c3.cnt) - t.df AS overestimate
         |FROM top t
         | JOIN cells c0 ON c0.r = 0 AND c0.b = ${dHash("'0|' || t.gram")} % 65536
         | JOIN cells c1 ON c1.r = 1 AND c1.b = ${dHash("'1|' || t.gram")} % 65536
         | JOIN cells c2 ON c2.r = 2 AND c2.b = ${dHash("'2|' || t.gram")} % 65536
         | JOIN cells c3 ON c3.r = 3 AND c3.b = ${dHash("'3|' || t.gram")} % 65536
         |ORDER BY t.df DESC, t.occ DESC, t.gram""".stripMargin,

    // q98: distinct (source, span-hash) rows on both sides, so count(*)
    // per pair IS the distinct shared-span count.
    "q98_span_provenance" ->
      s"""WITH $toksCte,
         | ds AS (SELECT t.doc_id, dd.source, t.toks,
         |   CAST(len(t.toks) AS BIGINT) AS n
         |  FROM t JOIN documents dd ON t.doc_id = dd.doc_id
         |  WHERE len(t.toks) >= 8),
         | s AS (SELECT source, unnest(range(0, CAST(n AS INT) - 7)) AS i, toks FROM ds),
         | sp AS (SELECT DISTINCT source,
         |   array_to_string(toks[i+1:i+8], ' ') AS hh FROM s)
         |SELECT a.source AS source_a, b.source AS source_b,
         | CAST(count(*) AS BIGINT) AS n_shared_spans
         |FROM sp a JOIN sp b ON a.hh = b.hh AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q69_stratified_sample" ->
      s"""WITH r AS (SELECT lang, source, doc_id,
         |   row_number() OVER (PARTITION BY lang, source
         |     ORDER BY ${dHash("CAST(doc_id AS VARCHAR)")}, doc_id) AS rk
         |  FROM documents)
         |SELECT lang, source, CAST(rk AS BIGINT) AS rk, doc_id
         |FROM r WHERE rk <= 3 ORDER BY lang, source, rk""".stripMargin,

    // q93: the coin divides the 32-bit hash by 2^32 (exact in doubles),
    // and quality is rounded to 6 dp on both sides, so the comparison is
    // engine-identical — same determinism defense as q89's epoch coin.
    "q93_weighted_sample" ->
      s"""WITH $toksCte,
         | m AS (SELECT doc_id,
         |   CAST(len(toks) AS BIGINT) AS n_tokens,
         |   CAST(list_aggregate(list_transform(toks, s -> len(s)), 'sum') AS BIGINT) AS sum_len,
         |   CAST(len(list_filter(toks, s -> list_contains($stopList, s))) AS BIGINT) AS stop_hits
         |  FROM t),
         | q AS (SELECT doc_id,
         |   round(0.5 * (CAST(stop_hits AS DOUBLE) / n_tokens)
         |     + 0.3 / (1.0 + abs(CAST(sum_len AS DOUBLE) / n_tokens - 5.0))
         |     + 0.2 * least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0), 6) AS quality
         |  FROM m)
         |SELECT doc_id, quality FROM q
         |WHERE CAST(${dHash("CAST(doc_id AS VARCHAR)")} AS DOUBLE) / 4294967296.0 < quality
         |ORDER BY doc_id""".stripMargin,

    // q94: the Bloom sketch only decides how little of the batch the
    // exact verify touches — bloom negatives are definitive, so the
    // ADMITTED set is plan-independent and the oracle is the pure exact
    // formulation (first-in-batch AND not in the corpus index).
    "q94_bloom_increment" ->
      """WITH f AS (SELECT doc_id, source,
        |   sha256(trim(lower(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |  FROM documents),
        | corpus AS (SELECT DISTINCT fp FROM f WHERE doc_id % 7 <> 0),
        | batch AS (SELECT doc_id, source, fp,
        |   min(doc_id) OVER (PARTITION BY fp) AS first_in_batch
        |  FROM f WHERE doc_id % 7 = 0)
        |SELECT b.doc_id, b.source FROM batch b
        |WHERE b.doc_id = b.first_in_batch
        |  AND NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = b.fp)
        |ORDER BY b.doc_id""".stripMargin,

    // q95: span identity on the DuckDB side is the raw span STRING (the
    // engine's 64-bit fingerprint never needs mirroring — only its
    // equality classes, which match the string's; no 32-bit
    // truncation → no collision asymmetry); keep_ratio floors at 6 dp.
    "q95_span_dedup" ->
      s"""WITH $toksCte,
         | d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
         |  FROM t WHERE len(toks) >= 8),
         | s AS (SELECT doc_id, n, unnest(range(0, CAST(n AS INT) - 7)) AS i, toks FROM d),
         | h AS (SELECT doc_id, n, i,
         |   array_to_string(toks[i+1:i+8], ' ') AS hh FROM s),
         | o AS (SELECT doc_id, n, i, count(*) OVER (PARTITION BY hh) AS occ FROM h),
         | hits AS (SELECT doc_id, i FROM o WHERE occ >= 2),
         | cov AS (SELECT doc_id,
         |   CAST(count(DISTINCT i) AS BIGINT) AS n_dup_spans,
         |   CAST(count(DISTINCT pos) AS BIGINT) AS n_covered
         |  FROM (SELECT doc_id, i, unnest(range(i, i + 8)) AS pos FROM hits)
         |  GROUP BY doc_id)
         |SELECT d.doc_id, d.n AS n_tokens,
         | coalesce(cov.n_dup_spans, 0) AS n_dup_spans,
         | coalesce(cov.n_covered, 0) AS n_covered,
         | floor((1.0 - coalesce(cov.n_covered, 0) * 1.0 / d.n) * 1e6) / 1e6 AS keep_ratio
         |FROM d LEFT JOIN cov USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    // q96: same span pipeline as q95, applied — covered positions are
    // cut and survivors rejoin in order; string output compares exactly.
    "q96_span_trim" ->
      s"""WITH $toksCte,
         | d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
         |  FROM t WHERE len(toks) >= 8),
         | s AS (SELECT doc_id, n, unnest(range(0, CAST(n AS INT) - 7)) AS i, toks FROM d),
         | h AS (SELECT doc_id, n, i,
         |   array_to_string(toks[i+1:i+8], ' ') AS hh FROM s),
         | o AS (SELECT doc_id, i, count(*) OVER (PARTITION BY hh) AS occ FROM h),
         | hits AS (SELECT doc_id, i FROM o WHERE occ >= 2),
         | cut AS (SELECT doc_id, array_agg(DISTINCT pos) AS cut
         |  FROM (SELECT doc_id, i, unnest(range(i, i + 8)) AS pos FROM hits)
         |  GROUP BY doc_id)
         |SELECT d.doc_id, d.n AS n_tokens,
         | CAST(d.n - coalesce(len(cut.cut), 0) AS BIGINT) AS n_kept,
         | coalesce(array_to_string(
         |   list_transform(
         |     list_filter(range(0, CAST(d.n AS INT)),
         |       p -> cut.cut IS NULL OR NOT list_contains(cut.cut, p)),
         |     p -> d.toks[p + 1]),
         |   ' '), '') AS text_trimmed
         |FROM d LEFT JOIN cut USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    "q70_kmeans_assign" ->
      s"""WITH $embCte,
         | c AS (SELECT vec_id AS cluster_id, embedding AS cvec, nrm AS cnrm
         |   FROM e WHERE vec_id < 8),
         | p AS (SELECT e.vec_id, c.cluster_id,
         |   (${dotSql("e.embedding", "c.cvec")}) / (e.nrm * c.cnrm) AS cos
         |  FROM e, c),
         | a AS (SELECT *, row_number() OVER (PARTITION BY vec_id
         |         ORDER BY cos DESC, cluster_id) AS rn FROM p)
         |SELECT cluster_id,
         | CAST(count(*) AS BIGINT) AS n_assigned,
         | round(min(cos), 6) AS min_cos,
         | round(max(cos), 6) AS max_cos
         |FROM a WHERE rn = 1 GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,

    "q71_chunk_tokens" ->
      s"""WITH $toksCte,
         | ch AS (SELECT doc_id,
         |   list_transform(range(1, len(toks) + 1, 24), s -> toks[s:s+31]) AS chunks
         |  FROM t),
         | u AS (SELECT doc_id, unnest(chunks) AS chunk,
         |   unnest(range(len(chunks))) AS chunk_id FROM ch)
         |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         | CAST(len(chunk) AS BIGINT) AS n_in_chunk,
         | chunk[1] AS first_tok,
         | chunk[-1] AS last_tok,
         | ${dHash("array_to_string(chunk, ' ')")} AS chunk_fp
         |FROM u ORDER BY doc_id, chunk_id""".stripMargin,

    "q72_inverted_index" ->
      s"""WITH $toksCte,
         | tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
         | td AS (SELECT DISTINCT doc_id, token FROM tok),
         | stats AS (SELECT token,
         |   CAST(count(*) AS BIGINT) AS occ FROM tok GROUP BY token),
         | dfs AS (SELECT token,
         |   CAST(count(*) AS BIGINT) AS df FROM td GROUP BY token),
         | rtop AS (SELECT token, doc_id, row_number() OVER (PARTITION BY token
         |     ORDER BY doc_id) AS rn FROM td),
         | post AS (SELECT token,
         |   string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
         |  FROM rtop WHERE rn <= 10 GROUP BY token)
         |SELECT token, df, occ, postings
         |FROM dfs JOIN stats USING (token) JOIN post USING (token)
         |ORDER BY token""".stripMargin,

    "q73_decontaminate" ->
      s"""WITH $toksCte,
         | sh AS (SELECT DISTINCT doc_id,
         |   unnest(list_transform(range(1, len(toks) - 1),
         |     i -> array_to_string(toks[i:i+2], ' '))) AS gram
         |  FROM t WHERE len(toks) >= 3),
         | ev AS (SELECT doc_id AS eval_id, gram FROM sh WHERE doc_id % 97 = 0 AND doc_id < 2048),
         | ov AS (SELECT s.doc_id, e.eval_id,
         |   CAST(count(*) AS BIGINT) AS n_shared
         |  FROM sh s JOIN ev e USING (gram)
         |  WHERE s.doc_id <> e.eval_id
         |  GROUP BY s.doc_id, e.eval_id)
         |SELECT doc_id, eval_id, n_shared FROM ov
         |WHERE n_shared >= 2 ORDER BY doc_id, eval_id""".stripMargin,

    "q74_pack_sequences" ->
      s"""WITH d AS (SELECT source, doc_id,
         |   CAST(len(list_filter(string_split(text, ' '), s -> len(s) > 0)) AS BIGINT) AS n_tokens
         |  FROM documents),
         | r AS (SELECT source, doc_id, n_tokens,
         |   sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
         |  FROM d)
         |SELECT source,
         | CAST(floor((running - n_tokens) / 256.0) AS BIGINT) AS bin_id,
         | CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(n_tokens) AS BIGINT) AS n_tokens_in_bin
         |FROM r GROUP BY source, floor((running - n_tokens) / 256.0)
         |ORDER BY source, bin_id""".stripMargin,

    "q75_unigram_surprisal" ->
      s"""WITH $toksCte,
         | tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
         | tot AS (SELECT count(*) AS total_toks FROM tok),
         | lm AS (SELECT token, -ln(count(*) * 1.0 / total_toks) AS nll
         |   FROM tok, tot GROUP BY token, total_toks),
         | sc AS (SELECT doc_id,
         |   CAST(count(*) AS BIGINT) AS n_tokens,
         |   sum(CAST(floor(nll * 1e9) AS DECIMAL(28,9))) AS nll_sum
         |  FROM tok JOIN lm USING (token) GROUP BY doc_id)
         |SELECT doc_id, n_tokens,
         | floor(CAST(nll_sum AS DOUBLE) / 1e9 / n_tokens * 1e6) / 1e6 AS mean_nll,
         | floor(exp(floor(CAST(nll_sum AS DOUBLE) / 1e9 / n_tokens * 1e6) / 1e6) * 1e6) / 1e6
         |   AS perplexity
         |FROM sc ORDER BY doc_id""".stripMargin,

    "q76_mixture_weights" ->
      s"""WITH s AS (SELECT source,
         |   CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT) AS n_toks
         |  FROM documents),
         | per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |   CAST(sum(n_toks) AS BIGINT) AS n_tokens FROM s GROUP BY source),
         | tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |   CAST(count(*) AS BIGINT) AS n_sources FROM per)
         |SELECT source, n_docs, n_tokens,
         | floor(n_tokens * 1.0 / total_tokens * 1e6) / 1e6 AS token_share,
         | floor((1.0 / n_sources) / (n_tokens * 1.0 / total_tokens) * 1e6) / 1e6
         |   AS uniform_weight
         |FROM per, tot ORDER BY source""".stripMargin,

    "q77_kmeans_update" ->
      s"""WITH $embCte,
         | c AS (SELECT vec_id AS cluster_id, embedding AS cvec, nrm AS cnrm
         |   FROM e WHERE vec_id < 8),
         | p AS (SELECT e.vec_id, e.embedding, c.cluster_id,
         |   (${dotSql("e.embedding", "c.cvec")}) / (e.nrm * c.cnrm) AS cos
         |  FROM e, c),
         | a AS (SELECT *, row_number() OVER (PARTITION BY vec_id
         |         ORDER BY cos DESC, cluster_id) AS rn FROM p),
         | x AS (SELECT cluster_id,
         |   unnest(range(len(embedding))) AS dim,
         |   unnest(embedding) AS v
         |  FROM a WHERE rn = 1),
         | m AS (SELECT cluster_id, dim,
         |   CAST(count(*) AS BIGINT) AS n,
         |   sum(CAST(floor(CAST(v AS DOUBLE) * 1e9) AS DECIMAL(28,9))) AS s
         |  FROM x GROUP BY cluster_id, dim)
         |SELECT cluster_id, CAST(dim AS BIGINT) AS dim, n,
         | floor(CAST(s AS DOUBLE) / 1e9 / n * 1e6) / 1e6 AS centroid_mean
         |FROM m ORDER BY cluster_id, dim""".stripMargin,

    "q78_curation_funnel" ->
      s"""WITH $toksCte,
         | tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
         | cnt AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY doc_id, token),
         | st AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS d,
         |   max(c) AS mx FROM cnt GROUP BY doc_id),
         | gate AS (SELECT doc_id, (n >= 30
         |   AND floor(d * 1.0 / n * 1e6) / 1e6 >= 0.45
         |   AND floor(mx * 1.0 / n * 1e6) / 1e6 <= 0.15) AS keep FROM st),
         | sh AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
         |     i -> array_to_string(toks[i:i+2], ' '))) AS gram
         |  FROM t WHERE len(toks) >= 3),
         | ev AS (SELECT DISTINCT doc_id AS eval_id, gram FROM sh WHERE doc_id % 97 = 0 AND doc_id < 2048),
         | ov AS (SELECT s.doc_id, e.eval_id, count(DISTINCT s.gram) AS n_shared
         |  FROM sh s JOIN ev e USING (gram) WHERE s.doc_id <> e.eval_id
         |  GROUP BY s.doc_id, e.eval_id),
         | contam AS (SELECT DISTINCT doc_id FROM ov WHERE n_shared >= 2),
         | base AS (SELECT d.source, d.doc_id,
         |   CAST(len(t.toks) AS BIGINT) AS n_toks,
         |   sha256(trim(lower(regexp_replace(d.text, '\\s+', ' ', 'g')))) AS fp,
         |   g.keep, (c.doc_id IS NOT NULL) AS contaminated
         |  FROM documents d
         |  JOIN t ON d.doc_id = t.doc_id
         |  JOIN gate g ON d.doc_id = g.doc_id
         |  LEFT JOIN contam c ON d.doc_id = c.doc_id),
         | staged AS (SELECT *,
         |   (keep AND doc_id <> min(CASE WHEN keep THEN doc_id END)
         |     OVER (PARTITION BY fp)) AS is_dup,
         |   (keep AND NOT (keep AND doc_id <> min(CASE WHEN keep THEN doc_id END)
         |     OVER (PARTITION BY fp)) AND NOT contaminated) AS survivor
         |  FROM base),
         | packed AS (SELECT *,
         |   sum(CASE WHEN survivor THEN n_toks ELSE 0 END)
         |     OVER (PARTITION BY source ORDER BY doc_id
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
         |  FROM staged)
         |SELECT source,
         | CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(count(CASE WHEN keep THEN 1 END) AS BIGINT) AS n_after_gate,
         | CAST(count(CASE WHEN keep AND NOT is_dup THEN 1 END) AS BIGINT) AS n_after_dedup,
         | CAST(count(CASE WHEN survivor THEN 1 END) AS BIGINT) AS n_after_decontam,
         | CAST(coalesce(max(CASE WHEN survivor
         |   THEN CAST(floor((running - n_toks) / 256.0) AS BIGINT) END) + 1, 0) AS BIGINT) AS n_bins,
         | CAST(coalesce(sum(CASE WHEN survivor THEN n_toks END), 0) AS BIGINT) AS n_tokens_packed
         |FROM packed GROUP BY source ORDER BY source""".stripMargin,

    "q79_incremental_dedup" ->
      """WITH f AS (SELECT doc_id,
        |   sha256(trim(lower(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |  FROM documents),
        | corpus AS (SELECT DISTINCT fp FROM f WHERE doc_id % 7 <> 0),
        | batch AS (SELECT doc_id, fp,
        |   min(doc_id) OVER (PARTITION BY fp) AS first_in_batch
        |  FROM f WHERE doc_id % 7 = 0)
        |SELECT b.doc_id,
        | CASE WHEN c.fp IS NOT NULL THEN 'dup_of_corpus'
        |      WHEN b.doc_id <> b.first_in_batch THEN 'dup_in_batch'
        |      ELSE 'novel' END AS status
        |FROM batch b LEFT JOIN corpus c ON b.fp = c.fp
        |ORDER BY b.doc_id""".stripMargin,

    "q80_neardup_clusters" ->
      s"""WITH RECURSIVE $componentCtes
         |SELECT cluster AS cluster_rep,
         | CAST(count(*) AS BIGINT) AS size,
         | string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS members
         |FROM comp GROUP BY cluster ORDER BY cluster_rep""".stripMargin,

    "q81_redact_census" ->
      """SELECT source,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(CASE WHEN len(regexp_extract_all(text, '\b(customer|supplier)\b')) > 0
        |   THEN 1 ELSE 0 END) AS BIGINT) AS docs_flagged,
        | CAST(sum(len(regexp_extract_all(text, '\b(customer|supplier)\b'))) AS BIGINT) AS block_hits,
        | CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |        + len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))) AS BIGINT) AS pii_hits,
        | CAST(sum(len(regexp_replace(text, '\b(customer|supplier)\b', '[REDACTED]', 'g')) - len(text)) AS BIGINT) AS masked_delta
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q82_cluster_reps" ->
      s"""WITH RECURSIVE $componentCtes
         |SELECT comp.cluster AS cluster_rep, d.doc_id, d.n_chars, d.source,
         | (row_number() OVER (PARTITION BY comp.cluster
         |    ORDER BY d.n_chars DESC, d.doc_id) = 1) AS keep
         |FROM comp JOIN documents d ON d.doc_id = comp.id
         |ORDER BY cluster_rep, doc_id""".stripMargin,

    // seed count mirrors Curation.semDedupClusterCount: corpus-
    // proportional k = max(8, n // 256) as a scalar subquery (VERDICT
    // r14 #2) — both test SFs land on the k=8 floor
    "q83_semdedup" ->
      s"""WITH $embCte,
         | c AS (SELECT vec_id AS cluster_id, embedding AS cvec, nrm AS cnrm
         |   FROM e WHERE vec_id < (SELECT greatest(8, count(*) // 256) FROM e)),
         | p AS (SELECT e.vec_id, c.cluster_id,
         |   (${dotSql("e.embedding", "c.cvec")}) / (e.nrm * c.cnrm) AS cos
         |  FROM e, c),
         | a AS (SELECT *, row_number() OVER (PARTITION BY vec_id
         |         ORDER BY cos DESC, cluster_id) AS rn FROM p),
         | m AS (SELECT a.cluster_id, a.vec_id, e.embedding, e.nrm
         |   FROM a JOIN e ON a.vec_id = e.vec_id WHERE a.rn = 1),
         | pr AS (SELECT x.cluster_id, x.vec_id AS v1, y.vec_id AS v2,
         |   (${dotSql("x.embedding", "y.embedding")}) / (x.nrm * y.nrm) AS cos
         |  FROM m x JOIN m y ON x.cluster_id = y.cluster_id AND x.vec_id < y.vec_id),
         | q AS (SELECT cluster_id, count(*) AS n_dup_pairs,
         |   count(DISTINCT v2) AS n_pruned
         |  FROM pr WHERE round(cos, 6) >= 0.3 GROUP BY cluster_id),
         | mem AS (SELECT cluster_id, count(*) AS n_members FROM m GROUP BY cluster_id)
         |SELECT mem.cluster_id,
         | CAST(n_members AS BIGINT) AS n_members,
         | CAST(coalesce(n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs,
         | CAST(coalesce(n_pruned, 0) AS BIGINT) AS n_pruned,
         | CAST(n_members - coalesce(n_pruned, 0) AS BIGINT) AS n_kept
         |FROM mem LEFT JOIN q USING (cluster_id) ORDER BY cluster_id""".stripMargin,

    "q84_split_manifest" ->
      s"""WITH b AS (SELECT source,
         |   len(list_filter(string_split(text, ' '), s -> len(s) > 0)) AS n_toks,
         |   ${dHash("CAST(doc_id AS VARCHAR)")} % 100 AS bkt FROM documents),
         | s AS (SELECT source, n_toks,
         |   CASE WHEN bkt < 90 THEN 'train' WHEN bkt < 95 THEN 'val'
         |        ELSE 'test' END AS split FROM b)
         |SELECT source, split,
         | CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         | floor(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY source) * 1e6) / 1e6 AS pct_docs
         |FROM s GROUP BY source, split ORDER BY source, split""".stripMargin,

    "q85_length_outliers" ->
      """WITH med AS (SELECT source,
        |   CAST(quantile_cont(n_chars, 0.5) AS DOUBLE) AS med
        |  FROM documents GROUP BY source),
        | mad AS (SELECT d.source,
        |   CAST(quantile_cont(abs(d.n_chars - m.med), 0.5) AS DOUBLE) AS mad
        |  FROM documents d JOIN med m ON d.source = m.source GROUP BY d.source)
        |SELECT d.source,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(CASE WHEN abs(d.n_chars - m.med) > 3.0 * a.mad
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        | any_value(m.med) AS median_len,
        | any_value(a.mad) AS mad
        |FROM documents d JOIN med m ON d.source = m.source
        |                 JOIN mad a ON d.source = a.source
        |GROUP BY d.source ORDER BY d.source""".stripMargin,

    "q86_zipf_census" ->
      """WITH tok AS (SELECT lang,
        |   unnest(list_filter(string_split(text, ' '), s -> len(s) > 0)) AS token
        |  FROM documents),
        | freq AS (SELECT lang, token, count(*) AS f FROM tok GROUP BY lang, token),
        | vocab AS (SELECT lang, CAST(count(*) AS BIGINT) AS vocab_size,
        |   CAST(sum(f) AS BIGINT) AS n_tokens FROM freq GROUP BY lang),
        | top AS (SELECT lang, f,
        |   row_number() OVER (PARTITION BY lang ORDER BY f DESC, token) AS rank
        |  FROM freq QUALIFY rank <= 100),
        | t2 AS (SELECT lang,
        |   CAST(floor(ln(rank) * 1e9) AS DECIMAL(28,9)) AS x,
        |   CAST(floor(ln(f) * 1e9) AS DECIMAL(28,9)) AS y,
        |   CAST(floor(ln(rank) * ln(f) * 1e9) AS DECIMAL(28,9)) AS xy,
        |   CAST(floor(ln(rank) * ln(rank) * 1e9) AS DECIMAL(28,9)) AS xx
        |  FROM top),
        | fit AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n,
        |   CAST(sum(x) AS DOUBLE) / 1e9 AS sx, CAST(sum(y) AS DOUBLE) / 1e9 AS sy,
        |   CAST(sum(xy) AS DOUBLE) / 1e9 AS sxy, CAST(sum(xx) AS DOUBLE) / 1e9 AS sxx
        |  FROM t2 GROUP BY lang)
        |SELECT v.lang, v.vocab_size, v.n_tokens,
        | floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1e6) / 1e6 AS zipf_slope
        |FROM vocab v JOIN fit ON v.lang = fit.lang ORDER BY v.lang""".stripMargin,

    "q88_ann_recall" -> {
      val bucket = (0 until 4)
        .map(i => s"CASE WHEN embedding[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END")
        .mkString("CAST(", " + ", " AS BIGINT)")
      s"""WITH $embCte,
         | eb AS (SELECT *, $bucket AS bucket FROM e),
         | ex AS (SELECT probe_id, cand_id FROM (
         |   SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
         |    row_number() OVER (PARTITION BY p.vec_id
         |     ORDER BY (${dotSql("p.embedding", "c.embedding")}) / (p.nrm * c.nrm) DESC,
         |       c.vec_id) AS rnk
         |   FROM e p JOIN e c ON p.vec_id % 97 = 0 AND p.vec_id < 2048 AND p.vec_id <> c.vec_id)
         |  WHERE rnk <= 5),
         | ap AS (SELECT probe_id, cand_id FROM (
         |   SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
         |    row_number() OVER (PARTITION BY p.vec_id
         |     ORDER BY (${dotSql("p.embedding", "c.embedding")}) / (p.nrm * c.nrm) DESC,
         |       c.vec_id) AS rnk
         |   FROM eb p JOIN eb c ON p.vec_id % 97 = 0 AND p.vec_id < 2048 AND p.bucket = c.bucket
         |                      AND p.vec_id <> c.vec_id)
         |  WHERE rnk <= 5),
         | hits AS (SELECT ex.probe_id, count(*) AS n
         |   FROM ex JOIN ap ON ex.probe_id = ap.probe_id AND ex.cand_id = ap.cand_id
         |   GROUP BY ex.probe_id),
         | probes AS (SELECT DISTINCT vec_id AS probe_id FROM e WHERE vec_id % 97 = 0 AND vec_id < 2048)
         |SELECT p.probe_id, CAST(coalesce(n, 0) AS BIGINT) AS n_hits,
         | coalesce(n, 0) / 5.0 AS recall_at_5
         |FROM probes p LEFT JOIN hits h ON p.probe_id = h.probe_id
         |ORDER BY p.probe_id""".stripMargin
    },

    "q89_epoch_plan" ->
      s"""WITH s AS (SELECT source, doc_id,
         |   CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT) AS n_toks
         |  FROM documents),
         | per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |   CAST(sum(n_toks) AS BIGINT) AS n_tokens FROM s GROUP BY source),
         | tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |   CAST(count(*) AS BIGINT) AS n_sources FROM per),
         | wt AS (SELECT source,
         |   floor((1.0 / n_sources) / (n_tokens * 1.0 / total_tokens) * 1e6) / 1e6 AS w
         |  FROM per, tot),
         | r AS (SELECT s.source, s.n_toks, wt.w,
         |   CAST(floor(wt.w) AS BIGINT) +
         |   CASE WHEN ${dHash("CAST(s.doc_id AS VARCHAR)")} <
         |     CAST(floor((wt.w - floor(wt.w)) * 4294967296.0) AS BIGINT)
         |    THEN 1 ELSE 0 END AS repeats
         |  FROM s JOIN wt ON s.source = wt.source)
         |SELECT source,
         | any_value(w) AS weight,
         | CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(repeats) AS BIGINT) AS n_copies,
         | CAST(sum(n_toks * repeats) AS BIGINT) AS n_tokens_out,
         | floor(sum(repeats) * 1.0 / count(*) * 1e6) / 1e6 AS realized_factor
         |FROM r GROUP BY source ORDER BY source""".stripMargin,

    "q91_chunk_dedup" ->
      s"""WITH $toksCte,
         | tk AS (SELECT doc_id, unnest(range(1, len(toks) + 1)) AS pos, toks
         |  FROM t WHERE len(toks) > 0),
         | tok AS (SELECT doc_id, pos, toks[pos] AS tok FROM tk),
         | b AS (SELECT doc_id, pos, tok,
         |   CASE WHEN ${dHash("tok")} % 8 = 0 THEN 1 ELSE 0 END AS be FROM tok),
         | c AS (SELECT doc_id, pos, tok,
         |   sum(be) OVER (PARTITION BY doc_id ORDER BY pos
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - be AS chunk_id
         |  FROM b),
         | ch AS (SELECT doc_id, chunk_id,
         |   string_agg(tok, ' ' ORDER BY pos) AS chunk
         |  FROM c GROUP BY doc_id, chunk_id),
         | fp AS (SELECT doc_id, sha256(chunk) AS f FROM ch),
         | df AS (SELECT f, count(DISTINCT doc_id) AS d FROM fp GROUP BY f)
         |SELECT fp.doc_id,
         | CAST(count(*) AS BIGINT) AS n_chunks,
         | CAST(sum(CASE WHEN d >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
         | floor(sum(CASE WHEN d >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*) * 1e6) / 1e6
         |   AS dup_fraction
         |FROM fp JOIN df ON fp.f = df.f GROUP BY fp.doc_id
         |ORDER BY fp.doc_id""".stripMargin,

    "q90_filter_calibration" ->
      s"""WITH $toksCte,
         | tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
         | cnt AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY doc_id, token),
         | st AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |   CAST(count(*) AS BIGINT) AS n_distinct, max(c) AS max_tok
         |  FROM cnt GROUP BY doc_id),
         | g AS (SELECT doc_id, (n_tokens >= 30
         |   AND floor(n_distinct * 1.0 / n_tokens * 1e6) / 1e6 >= 0.45
         |   AND floor(max_tok * 1.0 / n_tokens * 1e6) / 1e6 <= 0.15) AS keep FROM st),
         | tot AS (SELECT count(*) AS total_toks FROM tok),
         | lm AS (SELECT token, -ln(count(*) * 1.0 / total_toks) AS nll
         |   FROM tok, tot GROUP BY token, total_toks),
         | sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |   sum(CAST(floor(nll * 1e9) AS DECIMAL(28,9))) AS nll_sum
         |  FROM tok JOIN lm USING (token) GROUP BY doc_id),
         | ml AS (SELECT doc_id,
         |   floor(CAST(nll_sum AS DOUBLE) / 1e9 / n_tokens * 1e6) / 1e6 AS mean_nll
         |  FROM sc),
         | med AS (SELECT CAST(quantile_cont(mean_nll, 0.5) AS DOUBLE) AS med FROM ml),
         | j AS (SELECT d.source, g.keep, (ml.mean_nll <= med.med) AS lm_good
         |   FROM g JOIN ml USING (doc_id) JOIN documents d USING (doc_id), med)
         |SELECT source,
         | CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(CASE WHEN keep AND lm_good THEN 1 ELSE 0 END) AS BIGINT) AS keep_good,
         | CAST(sum(CASE WHEN keep AND NOT lm_good THEN 1 ELSE 0 END) AS BIGINT) AS keep_bad,
         | CAST(sum(CASE WHEN NOT keep AND lm_good THEN 1 ELSE 0 END) AS BIGINT) AS drop_good,
         | CAST(sum(CASE WHEN NOT keep AND NOT lm_good THEN 1 ELSE 0 END) AS BIGINT) AS drop_bad,
         | floor((sum(CASE WHEN keep AND lm_good THEN 1 ELSE 0 END)
         |      + sum(CASE WHEN NOT keep AND NOT lm_good THEN 1 ELSE 0 END)) * 1.0
         |   / count(*) * 1e6) / 1e6 AS agreement
         |FROM j GROUP BY source ORDER BY source""".stripMargin,

    "q87_cross_source_dups" ->
      s"""WITH $lshPairCtes,
         | withsrc AS (SELECT least(da.source, db.source) AS s1,
         |   greatest(da.source, db.source) AS s2, jaccard
         |  FROM pairs JOIN documents da ON da.doc_id = d1
         |             JOIN documents db ON db.doc_id = d2)
         |SELECT s1, s2, CAST(count(*) AS BIGINT) AS n_pairs,
         | max(jaccard) AS max_jaccard
         |FROM withsrc GROUP BY s1, s2 ORDER BY s1, s2""".stripMargin,
  )

  // q99/q100/q101 bind the deployment paths (staged span table +
  // two-phase marker; sharded bloom; sharded span-index gate) to the
  // SAME oracle SQL as their isolation duals q95/q94 — identical
  // declared semantics, so the hash gate then proves the deployment
  // machinery itself, not just the isolation plans.
  val curation: Map[String, String] = curationBase ++ Map(
    "q99_span_dedup_staged" -> curationBase("q95_span_dedup"),
    "q100_bloom_increment_sharded" -> curationBase("q94_bloom_increment"),
    "q101_span_gate_sharded" -> curationBase("q95_span_dedup"),
    // q103/q105: the past-broadcast regimes — same results by
    // construction (a broadcast hint changes the physical join strategy,
    // never the rows), so the broadcast queries' oracles bind verbatim
    "q103_span_gate_shuffled" -> curationBase("q95_span_dedup"),
    // q113/q114: the sketch-phase marker and the incremental span table
    // — same results as q95 by construction (sketch negatives are
    // definitive + exact verify; union-additive occurrence counts), so
    // q95's oracle binds verbatim and "by construction" is hash-checked
    "q113_span_dedup_sketch" -> curationBase("q95_span_dedup"),
    "q114_span_dedup_increment" -> curationBase("q95_span_dedup"),
    "q105_bloom_shuffled" -> curationBase("q94_bloom_increment"),

    // q125: q66's feature CTEs + the logistic head — same floored
    // features, literal weights in the same left-assoc order, sigmoid
    // floored to 1e-6 (the q116 convention for transcendental math).
    "q125_quality_scorer" ->
      s"""WITH $toksCte,
         | tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
         | cnt AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY doc_id, token),
         | st AS (SELECT doc_id,
         |   CAST(sum(c) AS BIGINT) AS n_tokens,
         |   CAST(count(*) AS BIGINT) AS n_distinct,
         |   max(c) AS max_tok,
         |   CAST(sum(len(token) * c) AS BIGINT) AS sum_len
         |  FROM cnt GROUP BY doc_id),
         | f AS (SELECT doc_id, n_tokens,
         |   floor(n_distinct * 1.0 / n_tokens * 1e6) / 1e6 AS ttr,
         |   floor(max_tok * 1.0 / n_tokens * 1e6) / 1e6 AS top_ratio,
         |   floor(sum_len * 1.0 / n_tokens * 1e6) / 1e6 AS mean_tok_len,
         |   (n_tokens >= 30
         |     AND floor(n_distinct * 1.0 / n_tokens * 1e6) / 1e6 >= 0.45
         |     AND floor(max_tok * 1.0 / n_tokens * 1e6) / 1e6 <= 0.15) AS keep_rules
         |  FROM st),
         | z AS (SELECT *,
         |   -7.0 + 1.0 * ln(n_tokens) + 10.0 * ttr + (-16.0) * top_ratio
         |     + (-0.5) * abs(mean_tok_len - 5.0) AS zz FROM f)
         |SELECT doc_id, n_tokens, ttr, top_ratio, mean_tok_len, keep_rules,
         | floor(1.0 / (1.0 + exp(-zz)) * 1e6) / 1e6 AS ml_score,
         | (floor(1.0 / (1.0 + exp(-zz)) * 1e6) / 1e6 >= 0.5) AS keep_ml
         |FROM z ORDER BY doc_id""".stripMargin,

    // q126: q95's span/hit CTEs + gaps-and-islands — a break when the
    // start gap exceeds SpanW (lag NULL on the first hit -> break), a
    // running sum numbering the islands, min/max per island.
    "q126_span_runs" ->
      s"""WITH $toksCte,
         | d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
         |  FROM t WHERE len(toks) >= 8),
         | s AS (SELECT doc_id, n, unnest(range(0, CAST(n AS INT) - 7)) AS i, toks FROM d),
         | h AS (SELECT doc_id, i, array_to_string(toks[i+1:i+8], ' ') AS hh FROM s),
         | o AS (SELECT doc_id, i, count(*) OVER (PARTITION BY hh) AS occ FROM h),
         | hits AS (SELECT doc_id, i FROM o WHERE occ >= 2),
         | g AS (SELECT doc_id, i,
         |   CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) <= 8
         |     THEN 0 ELSE 1 END AS brk FROM hits),
         | isl AS (SELECT doc_id, i,
         |   sum(brk) OVER (PARTITION BY doc_id ORDER BY i
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id FROM g)
         |SELECT doc_id, CAST(run_id AS BIGINT) AS run_id,
         | CAST(min(i) AS BIGINT) AS run_start,
         | CAST(max(i) + 7 AS BIGINT) AS run_end,
         | CAST(max(i) + 8 - min(i) AS BIGINT) AS run_len,
         | CAST(count(*) AS BIGINT) AS n_spans
         |FROM isl GROUP BY doc_id, run_id ORDER BY doc_id, run_id""".stripMargin,

    // q128: DSIR — q66's keep slice as the target, q73's shingle
    // definition hashed into 1024 buckets, add-1-smoothed bucket
    // distributions, decimal-exact per-occurrence log-ratio sums, and
    // the value-derived Gumbel top-50 (same dHash coin as q93).
    "q128_dsir_select" ->
      s"""WITH $toksCte,
         | tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
         | cnt AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY doc_id, token),
         | st AS (SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct,
         |   max(c) AS max_tok FROM cnt GROUP BY doc_id),
         | keepers AS (SELECT doc_id FROM st WHERE n_tokens >= 30
         |   AND floor(n_distinct * 1.0 / n_tokens * 1e6) / 1e6 >= 0.45
         |   AND floor(max_tok * 1.0 / n_tokens * 1e6) / 1e6 <= 0.15),
         | f AS (SELECT doc_id, ${dHash("gram")} % 1024 AS b FROM (
         |   SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
         |     i -> array_to_string(toks[i:i+2], ' '))) AS gram
         |  FROM t WHERE len(toks) >= 3)),
         | raw AS (SELECT b, count(*) AS c_r FROM f GROUP BY b),
         | tgt AS (SELECT b, count(*) AS c_t
         |  FROM f JOIN keepers USING (doc_id) GROUP BY b),
         | nr AS (SELECT sum(c_r) AS n_r FROM raw),
         | nt AS (SELECT sum(c_t) AS n_t FROM tgt),
         | lr AS (SELECT r.b,
         |   ln((coalesce(tg.c_t, 0) + 1.0) / (nt.n_t + 1024)) -
         |   ln((r.c_r + 1.0) / (nr.n_r + 1024)) AS llr
         |  FROM raw r LEFT JOIN tgt tg USING (b), nr, nt),
         | sc AS (SELECT f.doc_id, count(*) AS n_feats,
         |   CAST(sum(CAST(floor(llr * 1e9) AS DECIMAL(28,9))) AS DOUBLE) / 1e9 AS lw
         |  FROM f JOIN lr ON f.b = lr.b GROUP BY f.doc_id),
         | sel AS (SELECT doc_id, CAST(n_feats AS BIGINT) AS n_feats,
         |   floor(lw * 1e6) / 1e6 AS log_w,
         |   floor((lw - ln(-ln(
         |     (${dHash("CAST(doc_id AS VARCHAR)")} + 0.5) / 4294967296.0)))
         |     * 1e6) / 1e6 AS sel_key
         |  FROM sc)
         |SELECT doc_id, n_feats, log_w, sel_key FROM sel
         |ORDER BY sel_key DESC, doc_id LIMIT 50""".stripMargin,

    // q129: q75's CTE shapes one model order up — zipped unnests build
    // the bigram rows, Jelinek-Mercer interpolation with the unigram
    // backoff, identical decimal-exact summation and projections.
    "q129_bigram_surprisal" ->
      s"""WITH $toksCte,
         | tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
         | uni AS (SELECT token, count(*) AS c1 FROM tok GROUP BY token),
         | tot AS (SELECT count(*) AS ntot FROM tok),
         | bg AS (SELECT doc_id,
         |   unnest(toks[1:len(toks) - 1]) AS prev,
         |   unnest(toks[2:len(toks)]) AS w
         |  FROM t WHERE len(toks) >= 2),
         | c2 AS (SELECT prev, w, count(*) AS c2 FROM bg GROUP BY prev, w),
         | cp AS (SELECT prev, count(*) AS cp FROM bg GROUP BY prev),
         | lm AS (SELECT c2.prev, c2.w,
         |   -ln(0.75 * (c2.c2 * 1.0 / cp.cp) + 0.25 * (u.c1 * 1.0 / tot.ntot)) AS nll
         |  FROM c2 JOIN cp USING (prev) JOIN uni u ON u.token = c2.w, tot),
         | sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |   sum(CAST(floor(nll * 1e9) AS DECIMAL(28,9))) AS s
         |  FROM bg JOIN lm ON bg.prev = lm.prev AND bg.w = lm.w
         |  GROUP BY doc_id)
         |SELECT doc_id, n_bigrams,
         | floor(CAST(s AS DOUBLE) / 1e9 / n_bigrams * 1e6) / 1e6 AS mean_nll,
         | floor(exp(floor(CAST(s AS DOUBLE) / 1e9 / n_bigrams * 1e6) / 1e6) * 1e6) / 1e6
         |   AS perplexity
         |FROM sc ORDER BY doc_id""".stripMargin,

    // q130: q95's span CTEs with the occurrence count PARTITIONED BY
    // (doc_id, hh) — within-document self-repetition only.
    "q130_self_repeat" ->
      s"""WITH $toksCte,
         | d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
         |  FROM t WHERE len(toks) >= 8),
         | s AS (SELECT doc_id, n, unnest(range(0, CAST(n AS INT) - 7)) AS i, toks FROM d),
         | h AS (SELECT doc_id, n, i,
         |   array_to_string(toks[i+1:i+8], ' ') AS hh FROM s),
         | o AS (SELECT doc_id, i,
         |   count(*) OVER (PARTITION BY doc_id, hh) AS occ FROM h),
         | hits AS (SELECT doc_id, i FROM o WHERE occ >= 2),
         | cov AS (SELECT doc_id,
         |   CAST(count(DISTINCT i) AS BIGINT) AS n_self_spans,
         |   CAST(count(DISTINCT pos) AS BIGINT) AS n_covered
         |  FROM (SELECT doc_id, i, unnest(range(i, i + 8)) AS pos FROM hits)
         |  GROUP BY doc_id)
         |SELECT d.doc_id, d.n AS n_tokens,
         | coalesce(cov.n_self_spans, 0) AS n_self_spans,
         | coalesce(cov.n_covered, 0) AS n_covered,
         | floor(coalesce(cov.n_covered, 0) * 1.0 / d.n * 1e6) / 1e6 AS self_ratio
         |FROM d LEFT JOIN cov USING (doc_id) ORDER BY d.doc_id""".stripMargin)

  val retrieval: Map[String, String] = Map(
    // q115: the full q108 IVF-PQ chain producing a rnk<=20 ADC
    // shortlist, then an exact-cosine re-rank over that sliver only
    // (FAISS IndexRefineFlat).
    "q115_pq_refine" ->
      s"""WITH $embCte,
         | cent AS (SELECT vec_id AS cell, embedding AS cvec, nrm AS cnrm
         |   FROM e WHERE vec_id < 16),
         | ac AS (SELECT v.vec_id, c.cell,
         |   row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |     (${dotSql("v.embedding", "c.cvec")}) / (v.nrm * c.cnrm) DESC,
         |     c.cell) AS rn
         |  FROM e v, cent c),
         | asg AS (SELECT vec_id, cell FROM ac WHERE rn = 1),
         | pr AS (SELECT p.vec_id AS probe_id, c.cell,
         |   row_number() OVER (PARTITION BY p.vec_id ORDER BY
         |     (${dotSql("p.embedding", "c.cvec")}) / (p.nrm * c.cnrm) DESC,
         |     c.cell) AS prn
         |  FROM e p, cent c WHERE p.vec_id % 97 = 0 AND p.vec_id < 2048),
         | pcells AS (SELECT probe_id, cell FROM pr WHERE prn <= 4),
         | cb AS (SELECT CAST(vec_id AS INT) AS code, embedding AS cvec
         |   FROM e WHERE vec_id < 16),
         | vs AS (SELECT vec_id, embedding, unnest(range(0, 8)) AS sub FROM e),
         | ecd AS (SELECT v.vec_id, v.sub, c.code,
         |    (${pqDistSql("v.embedding", "c.cvec", "v.sub")}) AS d
         |   FROM vs v, cb c),
         | ec AS (SELECT *, row_number() OVER (PARTITION BY vec_id, sub
         |         ORDER BY d, code) AS rn FROM ecd),
         | codes AS (SELECT vec_id, sub, code FROM ec WHERE rn = 1),
         | ps AS (SELECT vec_id AS probe_id, embedding,
         |   unnest(range(0, 8)) AS sub FROM e WHERE vec_id % 97 = 0 AND vec_id < 2048),
         | lut AS (SELECT p.probe_id, p.sub, c.code,
         |    (${pqDistSql("p.embedding", "c.cvec", "p.sub")}) AS d
         |   FROM ps p, cb c),
         | cand AS (SELECT pc.probe_id, a.vec_id, pc.cell
         |   FROM pcells pc JOIN asg a ON pc.cell = a.cell
         |                           AND pc.probe_id <> a.vec_id),
         | sc AS (SELECT cd.probe_id, cd.vec_id AS cand_id, cd.cell,
         |    CAST(sum(CAST(floor(l.d * 1e9) AS DECIMAL(28,9))) AS DOUBLE) / 1e9 AS adc
         |   FROM cand cd
         |   JOIN codes k ON k.vec_id = cd.vec_id
         |   JOIN lut l ON l.probe_id = cd.probe_id AND l.sub = k.sub
         |             AND l.code = k.code
         |   GROUP BY 1, 2, 3),
         | r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |         ORDER BY adc, cand_id) AS rnk FROM sc),
         | short AS (SELECT probe_id, cand_id FROM r WHERE rnk <= 20),
         | ex AS (SELECT s.probe_id, s.cand_id,
         |    (${dotSql("p.embedding", "c.embedding")}) / (p.nrm * c.nrm) AS cosine
         |   FROM short s JOIN e p ON p.vec_id = s.probe_id
         |                JOIN e c ON c.vec_id = s.cand_id),
         | rr AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |         ORDER BY cosine DESC, cand_id) AS rk FROM ex)
         |SELECT probe_id, CAST(rk AS BIGINT) AS "rank", cand_id,
         | round(cosine, 6) AS cosine
         |FROM rr WHERE rk <= 5 ORDER BY probe_id, rk""".stripMargin,

    // q116: BM25 more-like-this — probe docs' top-3 TF-IDF terms (q65's
    // scoring and tie-break) queried against the corpus tf/df/dl tables
    // with Lucene-style idf; per-term scores sum decimal-exactly.
    "q116_bm25" -> bm25Sql(k = 10),

    // q117: reciprocal-rank fusion of the BM25 top-20 with the exact
    // cosine top-20 (doc_id ≡ vec_id); each list contributes the
    // INTEGER floor(1e9/(60+rank)), so fusion is exact arithmetic.
    "q117_rrf_fusion" ->
      s"""WITH $embCte,
         | $bm25Ctes,
         | bm AS (SELECT probe_id, cand_id, CAST(rnk AS BIGINT) AS bm25_rank
         |   FROM bmr WHERE rnk <= 20),
         | cosr AS (SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
         |   row_number() OVER (PARTITION BY p.vec_id ORDER BY
         |     (${dotSql("p.embedding", "c.embedding")}) / (p.nrm * c.nrm) DESC,
         |     c.vec_id) AS crn
         |  FROM e p JOIN e c ON p.vec_id % 97 = 0 AND p.vec_id < 2048 AND p.vec_id <> c.vec_id),
         | cos AS (SELECT probe_id, cand_id, CAST(crn AS BIGINT) AS cos_rank
         |   FROM cosr WHERE crn <= 20),
         | fused AS (SELECT probe_id, cand_id, bm25_rank, cos_rank,
         |   COALESCE(CAST(floor(1e9 / (60 + bm25_rank)) AS BIGINT), 0) +
         |   COALESCE(CAST(floor(1e9 / (60 + cos_rank)) AS BIGINT), 0) AS rrf_scaled
         |  FROM bm FULL OUTER JOIN cos USING (probe_id, cand_id)),
         | fr AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |         ORDER BY rrf_scaled DESC, cand_id) AS rk FROM fused)
         |SELECT probe_id, CAST(rk AS BIGINT) AS "rank", cand_id,
         | bm25_rank, cos_rank, rrf_scaled
         |FROM fr WHERE rk <= 5 ORDER BY probe_id, rk""".stripMargin,

    // q119: multi-probe LSH — q58's bucket search extended to the
    // nFlip=2 lowest-|margin| bit-flip cells; the margin chains use the
    // same hyperplane literals in the same left-assoc order as the
    // signature, so cell routing replays bit-identically.
    "q119_multiprobe_lsh" -> {
      val dChains = graft.operators.Similarity.hyperplanes.zipWithIndex
        .map { case (h, j) =>
          h.zipWithIndex
            .map { case (w, i) => s"CAST(embedding[${i + 1}] AS DOUBLE) * ${w}" }
            .mkString(" + ") + s" AS d$j"
        }.mkString(",\n         |   ")
      val pmArms = (0 until 8).map(j =>
        s"SELECT probe_id, sig, $j AS j, CAST(${1L << j} AS BIGINT) AS bit, abs(d$j) AS a FROM pd")
        .mkString("\n         |  UNION ALL ")
      s"""WITH $embCte,
         | es AS (SELECT *, ${rpSigSql("embedding")} AS sig FROM e),
         | pd AS (SELECT vec_id AS probe_id, embedding, nrm, sig,
         |   $dChains
         |  FROM es WHERE vec_id % 97 = 0 AND vec_id < 2048),
         | pm AS ($pmArms),
         | flips AS (SELECT probe_id, xor(sig, bit) AS pcell
         |   FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
         |           ORDER BY a, j) AS rn FROM pm)
         |   WHERE rn <= 2),
         | pcells AS (SELECT probe_id, sig AS pcell FROM pd
         |   UNION ALL SELECT probe_id, pcell FROM flips),
         | pairs AS (SELECT pc.probe_id, c.sig AS cell, c.vec_id AS cand_id,
         |    (${dotSql("pp.embedding", "c.embedding")}) / (pp.nrm * c.nrm) AS cosine
         |   FROM pcells pc
         |   JOIN pd pp ON pp.probe_id = pc.probe_id
         |   JOIN es c ON c.sig = pc.pcell AND c.vec_id <> pc.probe_id),
         | r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |         ORDER BY cosine DESC, cand_id) AS rnk FROM pairs)
         |SELECT probe_id, CAST(rnk AS BIGINT) AS "rank", cand_id, cell,
         | round(cosine, 6) AS cosine
         |FROM r WHERE rnk <= 3 ORDER BY probe_id, rnk""".stripMargin
    },

    // q120: SQ8 scalar-quantization ANN — per-dimension 8-bit codes
    // against the corpus [min, max] range, asymmetric L2 on the
    // reconstruction; every arithmetic shape mirrors the Column
    // formulation so codes and distances replay bit-identically.
    "q120_sq8_ann" -> {
      def mn(i: Int) = s"CAST(mn$i AS DOUBLE)"
      def dl(i: Int) = s"(CAST(mx$i AS DOUBLE) - ${mn(i)})"
      val rngCols = ((0 until 64).map(i => s"min(embedding[${i + 1}]) AS mn$i") ++
        (0 until 64).map(i => s"max(embedding[${i + 1}]) AS mx$i")).mkString(", ")
      val codeCols = (0 until 64).map { i =>
        s"CASE WHEN ${dl(i)} = 0.0 THEN 0 ELSE CAST(floor((CAST(embedding[${i + 1}] " +
          s"AS DOUBLE) - ${mn(i)}) / ${dl(i)} * 255.0) AS BIGINT) END AS c$i"
      }.mkString(",\n         |    ")
      val distChain = (0 until 64).map { i =>
        val rec = s"(${mn(i)} + (c.c$i + 0.5) * ${dl(i)} / 256.0)"
        s"(CAST(p.embedding[${i + 1}] AS DOUBLE) - $rec) * " +
          s"(CAST(p.embedding[${i + 1}] AS DOUBLE) - $rec)"
      }.mkString(" + ")
      s"""WITH rng AS (SELECT $rngCols FROM embeddings),
         | codes AS (SELECT vec_id AS cand_id,
         |    $codeCols
         |   FROM embeddings, rng),
         | pairs AS (SELECT p.vec_id AS probe_id, c.cand_id,
         |    ($distChain) AS sqdist
         |   FROM embeddings p, codes c, rng
         |   WHERE p.vec_id % 97 = 0 AND p.vec_id < 2048 AND p.vec_id <> c.cand_id),
         | r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |         ORDER BY sqdist, cand_id) AS rnk FROM pairs)
         |SELECT probe_id, CAST(rnk AS BIGINT) AS "rank", cand_id,
         | round(sqdist, 6) AS sqdist
         |FROM r WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin
    },

    // q121: LSH pair-recall audit — the verified LSH pair set (q37's
    // `pairs` CTE chain) LEFT-joined under the df-blocked exact pair
    // set; both sides share ds/sizes so the jaccard judgment is one
    // definition.
    "q121_lsh_recall" ->
      s"""WITH $lshPairCtes,
         | dfc AS (SELECT hp FROM ds GROUP BY hp
         |         HAVING count(*) <= ${graft.operators.Dedup.ShingleDfCap}),
         | bl AS (SELECT doc_id, hp FROM ds JOIN dfc USING (hp)),
         | ec AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |        FROM bl a JOIN bl b ON a.hp = b.hp AND a.doc_id < b.doc_id),
         | ecom AS (SELECT d1, d2, count(*) AS common
         |         FROM ec JOIN ds s1 ON d1 = s1.doc_id
         |                 JOIN ds s2 ON d2 = s2.doc_id AND s1.hp = s2.hp
         |         GROUP BY d1, d2),
         | ep AS (SELECT d1, d2,
         |   round(CAST(common AS DOUBLE) / (n1.n + n2.n - common), 6) AS jaccard
         |  FROM ecom JOIN sizes n1 ON n1.doc_id = d1 JOIN sizes n2 ON n2.doc_id = d2
         |  WHERE round(CAST(common AS DOUBLE) / (n1.n + n2.n - common), 6) >= 0.6)
         |SELECT ep.d1, ep.d2, ep.jaccard, (p.d1 IS NOT NULL) AS caught
         |FROM ep LEFT JOIN pairs p ON ep.d1 = p.d1 AND ep.d2 = p.d2
         |ORDER BY ep.d1, ep.d2""".stripMargin,

    // q122: IVF-SQ8 — q108's cell-routing CTEs composed with q120's
    // range/code/reconstruction chain, candidates restricted to probed
    // cells.
    "q122_ivf_sq8" -> {
      def mn(i: Int) = s"CAST(mn$i AS DOUBLE)"
      def dl(i: Int) = s"(CAST(mx$i AS DOUBLE) - ${mn(i)})"
      val rngCols = ((0 until 64).map(i => s"min(embedding[${i + 1}]) AS mn$i") ++
        (0 until 64).map(i => s"max(embedding[${i + 1}]) AS mx$i")).mkString(", ")
      val codeCols = (0 until 64).map { i =>
        s"CASE WHEN ${dl(i)} = 0.0 THEN 0 ELSE CAST(floor((CAST(embedding[${i + 1}] " +
          s"AS DOUBLE) - ${mn(i)}) / ${dl(i)} * 255.0) AS BIGINT) END AS c$i"
      }.mkString(",\n         |    ")
      val distChain = (0 until 64).map { i =>
        val rec = s"(${mn(i)} + (c.c$i + 0.5) * ${dl(i)} / 256.0)"
        s"(CAST(p.embedding[${i + 1}] AS DOUBLE) - $rec) * " +
          s"(CAST(p.embedding[${i + 1}] AS DOUBLE) - $rec)"
      }.mkString(" + ")
      s"""WITH $embCte,
         | cent AS (SELECT vec_id AS cell, embedding AS cvec, nrm AS cnrm
         |   FROM e WHERE vec_id < 16),
         | ac AS (SELECT v.vec_id, c.cell,
         |   row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |     (${dotSql("v.embedding", "c.cvec")}) / (v.nrm * c.cnrm) DESC,
         |     c.cell) AS rn
         |  FROM e v, cent c),
         | asg AS (SELECT vec_id, cell FROM ac WHERE rn = 1),
         | pr AS (SELECT p.vec_id AS probe_id, c.cell,
         |   row_number() OVER (PARTITION BY p.vec_id ORDER BY
         |     (${dotSql("p.embedding", "c.cvec")}) / (p.nrm * c.cnrm) DESC,
         |     c.cell) AS prn
         |  FROM e p, cent c WHERE p.vec_id % 97 = 0 AND p.vec_id < 2048),
         | pcells AS (SELECT probe_id, cell FROM pr WHERE prn <= 4),
         | rng AS (SELECT $rngCols FROM embeddings),
         | codes AS (SELECT vec_id AS cand_id,
         |    $codeCols
         |   FROM embeddings, rng),
         | pairs AS (SELECT pc.probe_id, pc.cell, c.cand_id,
         |    ($distChain) AS sqdist
         |   FROM pcells pc
         |   JOIN asg a ON a.cell = pc.cell AND a.vec_id <> pc.probe_id
         |   JOIN codes c ON c.cand_id = a.vec_id
         |   JOIN e p ON p.vec_id = pc.probe_id, rng),
         | r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |         ORDER BY sqdist, cand_id) AS rnk FROM pairs)
         |SELECT probe_id, cell, CAST(rnk AS BIGINT) AS "rank", cand_id,
         | round(sqdist, 6) AS sqdist
         |FROM r WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin
    },

    // q123: PageRank over the near-dup graph — q37's verified pairs as
    // symmetric edges, 5 unrolled iterations. Every literal is CAST to
    // DOUBLE: DuckDB's bare 1.0/0.85 are DECIMALs, and decimal-exact
    // (1.0 - 0.85) = 0.15 is a DIFFERENT double than the engine's
    // 1.0 - 0.85 fold; contributions floor to the 1e-12 grid before
    // each order-independent integer sum, mirroring the Column side.
    "q123_dup_pagerank" -> {
      val iterCtes = (1 to 5).map { k =>
        s""" c$k AS (SELECT e.dst, CAST(floor(r.r / d.deg * 1e12) AS BIGINT) AS c
           |   FROM r${k - 1} r JOIN ed e ON e.src = r.id JOIN dg d ON d.src = e.src),
           | r$k AS (SELECT n.id,
           |   floor(((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n +
           |     CAST(0.85 AS DOUBLE) * (CAST(COALESCE(s.s, 0) AS DOUBLE) / 1e12)) * 1e12)
           |     / 1e12 AS r
           |  FROM nodes n LEFT JOIN (SELECT dst, sum(c) AS s FROM c$k GROUP BY dst) s
           |    ON s.dst = n.id, nn)""".stripMargin
      }.mkString(",\n")
      s"""WITH $lshPairCtes,
         | ed AS (SELECT d1 AS src, d2 AS dst FROM pairs
         |        UNION ALL SELECT d2 AS src, d1 AS dst FROM pairs),
         | nodes AS (SELECT DISTINCT src AS id FROM ed),
         | nn AS (SELECT count(*) AS n FROM nodes),
         | dg AS (SELECT src, count(*) AS deg FROM ed GROUP BY src),
         | r0 AS (SELECT id, CAST(1.0 AS DOUBLE) / nn.n AS r FROM nodes, nn),
         |$iterCtes
         |SELECT r5.id AS doc_id, CAST(dg.deg AS BIGINT) AS deg,
         | round(r5.r, 6) AS pagerank
         |FROM r5 JOIN dg ON dg.src = r5.id
         |ORDER BY doc_id""".stripMargin
    },

    // q124: contrastive triplet manifest — per-anchor hardest same-label
    // positive and hardest different-label negative with their margin.
    "q124_triplet_mining" ->
      s"""WITH $embCte,
         | pr AS (SELECT p.vec_id AS probe_id, p.label AS plabel,
         |   c.vec_id AS cand_id, c.label AS clabel,
         |   (${dotSql("p.embedding", "c.embedding")}) / (p.nrm * c.nrm) AS cosine
         |  FROM e p JOIN e c ON p.vec_id % 97 = 0 AND p.vec_id < 2048 AND p.vec_id <> c.vec_id),
         | pos AS (SELECT probe_id, cand_id AS pos_id, cosine AS pc FROM (
         |   SELECT *, row_number() OVER (PARTITION BY probe_id
         |     ORDER BY cosine DESC, cand_id) AS rn
         |   FROM pr WHERE plabel = clabel) WHERE rn = 1),
         | neg AS (SELECT probe_id, cand_id AS neg_id, cosine AS nc FROM (
         |   SELECT *, row_number() OVER (PARTITION BY probe_id
         |     ORDER BY cosine DESC, cand_id) AS rn
         |   FROM pr WHERE plabel <> clabel) WHERE rn = 1)
         |SELECT p.probe_id AS anchor_id, e.label AS probe_label,
         | p.pos_id, round(p.pc, 6) AS pos_cos,
         | n.neg_id, round(n.nc, 6) AS neg_cos,
         | round(p.pc - n.nc, 6) AS margin
         |FROM pos p JOIN neg n ON n.probe_id = p.probe_id
         |JOIN e ON e.vec_id = p.probe_id
         |ORDER BY anchor_id""".stripMargin,

    // q118: hard-negative mining — cosine top-5 restricted to
    // DIFFERENT-label candidates.
    "q118_hard_negatives" ->
      s"""WITH $embCte,
         | pr AS (SELECT p.vec_id AS probe_id, p.label AS probe_label,
         |   c.vec_id AS cand_id, c.label AS cand_label,
         |   (${dotSql("p.embedding", "c.embedding")}) / (p.nrm * c.nrm) AS cosine
         |  FROM e p JOIN e c ON p.vec_id % 97 = 0 AND p.vec_id < 2048 AND p.label <> c.label),
         | r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |         ORDER BY cosine DESC, cand_id) AS rnk FROM pr)
         |SELECT probe_id, probe_label, CAST(rnk AS BIGINT) AS "rank",
         | cand_id, cand_label, round(cosine, 6) AS cosine
         |FROM r WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin,

    // q127: the drift audit — q108's seeded cells + residuals shared,
    // q112's residual-codebook training/encode/LUT/ADC chain
    // instantiated TWICE (fresh = full training set, stale = the even-id
    // half with its first-16 seeds in ids < 32), q109's exact/recall
    // join per variant.
    "q127_pq_drift" ->
      s"""WITH $embCte,
         | cent AS (SELECT vec_id AS cell, embedding AS cvec, nrm AS cnrm
         |   FROM e WHERE vec_id < 16),
         | ex AS (SELECT probe_id, cand_id FROM (
         |   SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
         |    row_number() OVER (PARTITION BY p.vec_id
         |     ORDER BY (${dotSql("p.embedding", "c.embedding")}) / (p.nrm * c.nrm) DESC,
         |       c.vec_id) AS rnk
         |   FROM e p JOIN e c ON p.vec_id % 97 = 0 AND p.vec_id < 2048
         |                    AND p.vec_id <> c.vec_id)
         |  WHERE rnk <= 5),
         | ac AS (SELECT v.vec_id, v.embedding, c.cell,
         |   row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |     (${dotSql("v.embedding", "c.cvec")}) / (v.nrm * c.cnrm) DESC,
         |     c.cell) AS rn
         |  FROM e v, cent c),
         | asg AS MATERIALIZED (SELECT vec_id, embedding, cell FROM ac WHERE rn = 1),
         | resid AS MATERIALIZED (SELECT a.vec_id, a.cell,
         |   list_transform(range(1, 65), i ->
         |     CAST(CAST(a.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE)
         |       AS FLOAT)) AS resid
         |  FROM asg a JOIN cent c ON a.cell = c.cell),
         | vs AS MATERIALIZED (SELECT vec_id, resid, unnest(range(0, 8)) AS sub FROM resid),
         | pr AS (SELECT p.vec_id AS probe_id, p.embedding AS p_emb,
         |   c.cell, c.cvec,
         |   row_number() OVER (PARTITION BY p.vec_id ORDER BY
         |     (${dotSql("p.embedding", "c.cvec")}) / (p.nrm * c.cnrm) DESC,
         |     c.cell) AS prn
         |  FROM e p, cent c WHERE p.vec_id % 97 = 0 AND p.vec_id < 2048),
         | pcells AS MATERIALIZED (SELECT probe_id, cell,
         |   list_transform(range(1, 65), i ->
         |     CAST(CAST(p_emb[i] AS DOUBLE) - CAST(cvec[i] AS DOUBLE)
         |       AS FLOAT)) AS p_resid
         |  FROM pr WHERE prn <= 4),
         | cand AS (SELECT pc.probe_id, r.vec_id, pc.cell
         |   FROM pcells pc JOIN resid r ON pc.cell = r.cell
         |                             AND pc.probe_id <> r.vec_id),
         |${pqCbChain("f", "1 = 1", "vec_id < 16")},
         |${pqCbChain("s", "vec_id % 2 = 0", "vec_id % 2 = 0 AND vec_id < 32")},
         | probes AS (SELECT DISTINCT vec_id AS probe_id FROM e
         |   WHERE vec_id % 97 = 0 AND vec_id < 2048)
         |SELECT p.probe_id,
         | CAST(coalesce(hf.n, 0) AS BIGINT) AS n_hits_fresh,
         | CAST(coalesce(hs.n, 0) AS BIGINT) AS n_hits_stale,
         | coalesce(hf.n, 0) / 5.0 AS recall_fresh,
         | coalesce(hs.n, 0) / 5.0 AS recall_stale,
         | (coalesce(hf.n, 0) - coalesce(hs.n, 0)) / 5.0 AS drift
         |FROM probes p LEFT JOIN hitsf hf ON p.probe_id = hf.probe_id
         | LEFT JOIN hitss hs ON p.probe_id = hs.probe_id
         |ORDER BY p.probe_id""".stripMargin,

    // q133: drop-reason provenance — the q66 rule evaluation, q34
    // fingerprint window, q37 pair CTEs (near-dup keeper = min verified
    // partner), and q73 overlap CTEs, each reduced to its doc-aligned
    // drop rows and UNION ALLed. Detail strings concatenate BIGINT
    // casts, so both engines print identical evidence.
    "q133_drop_provenance" ->
      s"""WITH $lshPairCtes,
         | qtok AS (SELECT doc_id, unnest(toks) AS token FROM t),
         | qcnt AS (SELECT doc_id, token, count(*) AS c
         |  FROM qtok GROUP BY doc_id, token),
         | qst AS (SELECT doc_id,
         |   CAST(sum(c) AS BIGINT) AS n_tokens,
         |   CAST(count(*) AS BIGINT) AS n_distinct,
         |   max(c) AS max_tok
         |  FROM qcnt GROUP BY doc_id),
         | qg AS (SELECT doc_id, n_tokens,
         |   floor(n_distinct * 1.0 / n_tokens * 1e6) / 1e6 AS ttr,
         |   floor(max_tok * 1.0 / n_tokens * 1e6) / 1e6 AS top_ratio FROM qst),
         | fpd AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY
         |    sha256(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))))) AS keeper
         |  FROM documents),
         | nd AS (SELECT d2 AS doc_id, min(d1) AS dup_of, count(*) AS n_pairs
         |  FROM pairs GROUP BY d2),
         | dsh AS (SELECT DISTINCT doc_id,
         |   unnest(list_transform(range(1, len(toks) - 1),
         |     i -> array_to_string(toks[i:i+2], ' '))) AS gram
         |  FROM t WHERE len(toks) >= 3),
         | dev AS (SELECT doc_id AS eval_id, gram FROM dsh
         |   WHERE doc_id % 97 = 0 AND doc_id < 2048),
         | dov AS (SELECT s.doc_id, e.eval_id, count(*) AS n_shared
         |  FROM dsh s JOIN dev e USING (gram) WHERE s.doc_id <> e.eval_id
         |  GROUP BY s.doc_id, e.eval_id),
         | dct AS (SELECT doc_id, count(*) AS n_eval, min(eval_id) AS first_eval
         |  FROM dov WHERE n_shared >= 2 GROUP BY doc_id),
         | un AS (
         |  SELECT doc_id, 'quality' AS stage, 'failed_rule' AS reason,
         |   concat_ws(',',
         |     CASE WHEN n_tokens < 30 THEN 'min_tokens' END,
         |     CASE WHEN ttr < 0.45 THEN 'low_ttr' END,
         |     CASE WHEN top_ratio > 0.15 THEN 'dominant_token' END) AS detail
         |  FROM qg
         |  WHERE NOT (n_tokens >= 30 AND ttr >= 0.45 AND top_ratio <= 0.15)
         |  UNION ALL
         |  SELECT doc_id, 'exact_dedup', 'duplicate',
         |   'keeper=' || CAST(keeper AS VARCHAR)
         |  FROM fpd WHERE doc_id <> keeper
         |  UNION ALL
         |  SELECT doc_id, 'near_dedup', 'near_duplicate',
         |   'dup_of=' || CAST(dup_of AS VARCHAR) ||
         |     ',n_pairs=' || CAST(n_pairs AS VARCHAR)
         |  FROM nd
         |  UNION ALL
         |  SELECT doc_id, 'decontamination', 'eval_overlap',
         |   'n_eval=' || CAST(n_eval AS VARCHAR) ||
         |     ',first_eval=' || CAST(first_eval AS VARCHAR)
         |  FROM dct)
         |SELECT doc_id, stage, reason, detail FROM un
         |ORDER BY doc_id, stage""".stripMargin,

    // q134: cross-split leakage — the q37 pair CTEs doubled to both
    // orientations, each end labeled with q84's h32 % 100 split rule
    // (the same dHash mirror), reduced to the val/test docs that have a
    // train-side partner.
    "q134_split_leakage" ->
      s"""WITH $lshPairCtes,
         | dp AS (SELECT d1 AS doc_id, d2 AS partner, jaccard FROM pairs
         |        UNION ALL SELECT d2, d1, jaccard FROM pairs),
         | lab AS (SELECT doc_id, partner, jaccard,
         |   CASE WHEN ${dHash("CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'train'
         |        WHEN ${dHash("CAST(doc_id AS VARCHAR)")} % 100 < 95 THEN 'val'
         |        ELSE 'test' END AS split,
         |   CASE WHEN ${dHash("CAST(partner AS VARCHAR)")} % 100 < 90
         |        THEN 'train' ELSE 'other' END AS psplit
         |  FROM dp)
         |SELECT doc_id, split,
         | CAST(count(*) AS BIGINT) AS n_train_partners,
         | max(jaccard) AS max_jaccard,
         | min(partner) AS min_train_partner
         |FROM lab WHERE split IN ('val', 'test') AND psplit = 'train'
         |GROUP BY doc_id, split ORDER BY doc_id""".stripMargin,

    // q135: dedup-savings census — q34's fingerprint window flags exact
    // drops; a survivor is near-dropped iff a smaller exact-surviving
    // partner verifies against it in the q37 pair CTEs; census to
    // source granularity.
    "q135_dedup_savings" ->
      s"""WITH $lshPairCtes,
         | fpt AS (SELECT doc_id, source,
         |   CAST(len(list_filter(string_split(text, ' '), s -> len(s) > 0)) AS BIGINT) AS n_toks,
         |   sha256(trim(lower(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
         |  FROM documents),
         | fl AS (SELECT *, doc_id <> min(doc_id) OVER (PARTITION BY fp) AS exact_drop
         |  FROM fpt),
         | nd AS (SELECT DISTINCT p.d2 AS doc_id
         |  FROM pairs p JOIN fl s ON p.d1 = s.doc_id AND NOT s.exact_drop),
         | lab AS (SELECT fl.source, fl.n_toks, fl.exact_drop,
         |   (NOT fl.exact_drop AND nd.doc_id IS NOT NULL) AS near_drop
         |  FROM fl LEFT JOIN nd ON fl.doc_id = nd.doc_id)
         |SELECT source,
         | CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         | CAST(sum(CASE WHEN exact_drop THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dropped,
         | CAST(sum(CASE WHEN exact_drop THEN n_toks ELSE 0 END) AS BIGINT) AS tok_exact_dropped,
         | CAST(sum(CASE WHEN near_drop THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup_dropped,
         | CAST(sum(CASE WHEN near_drop THEN n_toks ELSE 0 END) AS BIGINT) AS tok_neardup_dropped,
         | CAST(sum(CASE WHEN NOT exact_drop AND NOT near_drop THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         | CAST(sum(CASE WHEN NOT exact_drop AND NOT near_drop THEN n_toks ELSE 0 END) AS BIGINT) AS tok_kept,
         | floor(sum(CASE WHEN NOT exact_drop AND NOT near_drop THEN n_toks ELSE 0 END) * 1.0
         |   / sum(n_toks) * 1e6) / 1e6 AS pct_tokens_kept
         |FROM lab GROUP BY source ORDER BY source""".stripMargin,

    // q136: semantic decontamination — corpus × capped eval grid cosine,
    // flagged on the 6-decimal ROUNDED value (q61's boundary-determinism
    // convention; dotSql mirrors the Spark fold order term for term).
    "q136_semantic_decontam" ->
      s"""WITH $embCte,
         | ev AS (SELECT vec_id AS eval_id, embedding, nrm FROM e
         |        WHERE vec_id % 97 = 0 AND vec_id < 2048)
         |SELECT c.vec_id, ev.eval_id,
         | round((${dotSql("c.embedding", "ev.embedding")}) / (c.nrm * ev.nrm), 6) AS cosine
         |FROM e c JOIN ev ON c.vec_id <> ev.eval_id
         |WHERE round((${dotSql("c.embedding", "ev.embedding")}) / (c.nrm * ev.nrm), 6) >= 0.30
         |ORDER BY vec_id, eval_id""".stripMargin,

    // q137: quality-aware keeper — the q37 pair CTEs doubled to both
    // orientations, each end scored by (distinct-token richness, n_chars,
    // lower id) dominance; best_partner coalesced to -1 so the column
    // stays a non-null BIGINT in both engines.
    "q137_quality_keeper" ->
      s"""WITH $lshPairCtes,
         | sc AS (SELECT doc_id, n_chars,
         |   CAST(len(list_distinct(list_filter(string_split(text, ' '),
         |     s -> len(s) > 0))) AS BIGINT) AS rich
         |  FROM documents),
         | dp AS (SELECT d1 AS doc_id, d2 AS partner FROM pairs
         |        UNION ALL SELECT d2, d1 FROM pairs),
         | j AS (SELECT dp.doc_id, a.rich, a.n_chars, dp.partner,
         |         b.rich AS p_rich, b.n_chars AS p_chars
         |  FROM dp JOIN sc a ON a.doc_id = dp.doc_id
         |          JOIN sc b ON b.doc_id = dp.partner),
         | v AS (SELECT *,
         |   (p_rich > rich OR (p_rich = rich AND p_chars > n_chars)
         |     OR (p_rich = rich AND p_chars = n_chars AND partner < doc_id)) AS beats
         |  FROM j)
         |SELECT doc_id, rich, n_chars,
         | CAST(count(*) AS BIGINT) AS n_partners,
         | CAST(sum(CASE WHEN beats THEN 1 ELSE 0 END) AS BIGINT) AS n_better,
         | coalesce(min(CASE WHEN beats THEN partner END), -1) AS best_partner,
         | CAST(CASE WHEN sum(CASE WHEN beats THEN 1 ELSE 0 END) = 0
         |      THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM v GROUP BY doc_id, rich, n_chars ORDER BY doc_id""".stripMargin,

    // q139: drift PSI — parity split, three feature binnings as a
    // UNION ALL (the Spark side explodes one scan; same rows), +0.5
    // Laplace smoothing over the per-feature observed-bin universe.
    "q139_drift_psi" ->
      """WITH d AS (SELECT CASE WHEN doc_id % 2 = 0 THEN 'ref' ELSE 'cand' END AS half,
        |   n_chars, lang,
        |   len(list_filter(string_split(text, ' '), s -> len(s) > 0)) AS n_toks
        |  FROM documents),
        | b AS (
        |  SELECT half, 'len' AS feature,
        |   CAST(least(9, CAST(floor(n_chars / 64.0) AS BIGINT)) AS VARCHAR) AS bin FROM d
        |  UNION ALL
        |  SELECT half, 'tok',
        |   CAST(least(9, CAST(floor(n_toks / 16.0) AS BIGINT)) AS VARCHAR) FROM d
        |  UNION ALL
        |  SELECT half, 'lang', lang FROM d),
        | g AS (SELECT feature, bin,
        |   CAST(sum(CASE WHEN half = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
        |   CAST(sum(CASE WHEN half = 'cand' THEN 1 ELSE 0 END) AS BIGINT) AS c_cand
        |  FROM b GROUP BY feature, bin),
        | w AS (SELECT *, count(*) OVER (PARTITION BY feature) AS k,
        |   sum(c_ref) OVER (PARTITION BY feature) AS n_ref,
        |   sum(c_cand) OVER (PARTITION BY feature) AS n_cand FROM g),
        | terms AS (SELECT feature, k,
        |   ((c_ref + 0.5) / (n_ref + 0.5 * k) - (c_cand + 0.5) / (n_cand + 0.5 * k))
        |    * ln(((c_ref + 0.5) / (n_ref + 0.5 * k))
        |         / ((c_cand + 0.5) / (n_cand + 0.5 * k))) AS term
        |  FROM w),
        | tu AS (SELECT feature, k,
        |   CAST(floor(term * 1e9) AS DECIMAL(28,9)) AS tu FROM terms)
        |SELECT feature, CAST(k AS BIGINT) AS n_bins,
        | floor((sum(tu) + 500) / 1000) / 1e6 AS psi
        |FROM tu GROUP BY feature, k ORDER BY feature""".stripMargin,

    // q140: per-dimension moments via the decimal-exact-sum rule
    // (floor to 1e-9 → DECIMAL sum → truncate), q75's idiom; variance
    // from the truncated first/second moments through one shared chain.
    "q140_dimension_stats" ->
      """WITH v AS (SELECT t.i AS dim,
        |   CAST(embedding[t.i + 1] AS DOUBLE) AS vd
        |  FROM embeddings, range(64) t(i)),
        | g AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |   sum(CAST(floor(vd * 1e9) AS DECIMAL(28,9))) AS s1,
        |   sum(CAST(floor(vd * vd * 1e9) AS DECIMAL(28,9))) AS s2,
        |   floor(min(vd) * 1e6) / 1e6 AS min_v,
        |   floor(max(vd) * 1e6) / 1e6 AS max_v
        |  FROM v GROUP BY dim)
        |SELECT CAST(dim AS BIGINT) AS dim, n,
        | floor(CAST(s1 AS DOUBLE) / 1e9 / n * 1e6) / 1e6 AS mean_v,
        | floor((CAST(s2 AS DOUBLE) / 1e9 / n
        |   - (CAST(s1 AS DOUBLE) / 1e9 / n) * (CAST(s1 AS DOUBLE) / 1e9 / n))
        |   * 1e6) / 1e6 AS var_v,
        | min_v, max_v
        |FROM g ORDER BY dim""".stripMargin,

    // q141: q70's assignment chain + the label cross-tab; purity on the
    // shared floor-truncation.
    "q141_cluster_purity" ->
      s"""WITH $embCte,
         | c AS (SELECT vec_id AS cluster_id, embedding AS cvec, nrm AS cnrm
         |   FROM e WHERE vec_id < 8),
         | p AS (SELECT e.vec_id, c.cluster_id,
         |   (${dotSql("e.embedding", "c.cvec")}) / (e.nrm * c.cnrm) AS cos
         |  FROM e, c),
         | a AS (SELECT *, row_number() OVER (PARTITION BY vec_id
         |         ORDER BY cos DESC, cluster_id) AS rn FROM p),
         | asg AS (SELECT vec_id, cluster_id FROM a WHERE rn = 1),
         | lc AS (SELECT cluster_id, label, count(*) AS cnt
         |   FROM asg JOIN e USING (vec_id) GROUP BY cluster_id, label),
         | r AS (SELECT *, sum(cnt) OVER (PARTITION BY cluster_id) AS n_assigned,
         |   row_number() OVER (PARTITION BY cluster_id
         |     ORDER BY cnt DESC, label) AS rn2 FROM lc)
         |SELECT cluster_id, CAST(n_assigned AS BIGINT) AS n_assigned,
         | CAST(label AS BIGINT) AS top_label, CAST(cnt AS BIGINT) AS n_top,
         | floor(cnt * 1.0 / n_assigned * 1e6) / 1e6 AS purity
         |FROM r WHERE rn2 = 1 ORDER BY cluster_id""".stripMargin,

    // q142: decile rule from the broadcast max-id scalar (mirrors the
    // Spark 1-row crossJoin), shingling identical to shCte.
    "q142_novelty_curve" ->
      s"""WITH $toksCte,
         | mx AS (SELECT max(doc_id) AS mx FROM documents),
         | b AS (SELECT least(9, CAST(floor(doc_id * 10.0 / (mx + 1)) AS BIGINT))
         |         AS bucket, toks FROM t, mx WHERE len(toks) >= 3),
         | sh0 AS (SELECT bucket,
         |   unnest(list_transform(range(1, len(toks) - 1),
         |     i -> array_to_string(toks[i:i+2], ' '))) AS gram FROM b),
         | sh AS (SELECT DISTINCT bucket, gram FROM sh0),
         | pb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_distinct_grams
         |   FROM sh GROUP BY bucket),
         | fs AS (SELECT gram, min(bucket) AS bucket FROM sh GROUP BY gram),
         | nw AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_new_grams
         |   FROM fs GROUP BY bucket),
         | j AS (SELECT pb.bucket, n_distinct_grams,
         |   coalesce(n_new_grams, 0) AS n_new_grams
         |  FROM pb LEFT JOIN nw USING (bucket))
         |SELECT bucket, n_distinct_grams, n_new_grams,
         | CAST(sum(n_new_grams) OVER (ORDER BY bucket
         |   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_new_grams,
         | floor(n_new_grams * 1.0 / n_distinct_grams * 1e6) / 1e6
         |   AS novelty_ratio
         |FROM j ORDER BY bucket""".stripMargin,

    // q143: three gram widths as a UNION ALL (the Spark side explodes a
    // struct array from one scan; same rows); per-distinct-gram counts
    // via nested list lambdas, occurrence-weighted fractions truncated.
    "q143_ngram_repetition" ->
      s"""WITH $toksCte,
         | u AS (
         |  SELECT doc_id, CAST(2 AS BIGINT) AS n,
         |   list_transform(range(1, len(toks)),
         |     i -> array_to_string(toks[i:i+1], ' ')) AS g
         |  FROM t WHERE len(toks) >= 2
         |  UNION ALL
         |  SELECT doc_id, 3, list_transform(range(1, len(toks) - 1),
         |     i -> array_to_string(toks[i:i+2], ' '))
         |  FROM t WHERE len(toks) >= 2
         |  UNION ALL
         |  SELECT doc_id, 4, list_transform(range(1, len(toks) - 2),
         |     i -> array_to_string(toks[i:i+3], ' '))
         |  FROM t WHERE len(toks) >= 2),
         | s AS (SELECT doc_id, n, CAST(len(g) AS BIGINT) AS n_grams,
         |   list_transform(list_distinct(g),
         |     x -> len(list_filter(g, y -> y = x))) AS counts FROM u),
         | f AS (SELECT doc_id, n, n_grams,
         |   CAST(list_max(counts) AS BIGINT) AS top_occ,
         |   CAST(coalesce(list_sum(list_filter(counts, c -> c >= 2)), 0)
         |     AS BIGINT) AS dup_occ
         |  FROM s WHERE n_grams >= 1)
         |SELECT doc_id, n, n_grams,
         | floor(top_occ * 1.0 / n_grams * 1e6) / 1e6 AS top_frac,
         | floor(dup_occ * 1.0 / n_grams * 1e6) / 1e6 AS dup_frac
         |FROM f ORDER BY doc_id, n""".stripMargin,

    // q144: q95's span-hash chain; eval set = the capped probe grid on
    // doc_id (q73's convention), span identity by raw span string.
    "q144_eval_span_overlap" ->
      s"""WITH $toksCte,
         | d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
         |  FROM t WHERE len(toks) >= 8),
         | s AS (SELECT doc_id, n, unnest(range(0, CAST(n AS INT) - 7)) AS i,
         |   toks FROM d),
         | h AS (SELECT doc_id, n, i,
         |   array_to_string(toks[i+1:i+8], ' ') AS hh FROM s),
         | ev AS (SELECT DISTINCT hh FROM h
         |   WHERE doc_id % 7 = 0 AND doc_id < ${graft.operators.Similarity.ProbeCap}),
         | c AS (SELECT doc_id, n, CAST(count(*) AS BIGINT) AS n_eval_spans
         |  FROM h JOIN ev USING (hh)
         |  WHERE NOT (doc_id % 7 = 0 AND doc_id < ${graft.operators.Similarity.ProbeCap})
         |  GROUP BY doc_id, n)
         |SELECT doc_id, n AS n_tokens, n - 7 AS n_spans, n_eval_spans,
         | floor(n_eval_spans * 1.0 / (n - 7) * 1e6) / 1e6 AS contamination
         |FROM c ORDER BY doc_id""".stripMargin,

    // q145: q34's fingerprint window for exact multiplicity, pair-table
    // degree for the near-dup discount.
    "q145_soft_dedup_weights" ->
      s"""WITH $lshPairCtes,
         | f AS (SELECT doc_id,
         |   sha256(trim(lower(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
         |  FROM documents),
         | cnt AS (SELECT doc_id,
         |   count(*) OVER (PARTITION BY fp) AS n_copies FROM f),
         | dg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_near FROM (
         |    SELECT d1 AS doc_id FROM pairs
         |    UNION ALL SELECT d2 FROM pairs) GROUP BY doc_id)
         |SELECT c.doc_id, CAST(c.n_copies AS BIGINT) AS n_copies,
         | coalesce(dg.n_near, 0) AS n_near,
         | floor(1.0 / c.n_copies * 1e6) / 1e6 AS weight,
         | floor(1.0 / (c.n_copies + coalesce(dg.n_near, 0)) * 1e6) / 1e6
         |   AS weight_discounted
         |FROM cnt c LEFT JOIN dg USING (doc_id) ORDER BY c.doc_id""".stripMargin,

    // q146: 4-width bucketing sweep as a VALUES lateral (the Spark side
    // explodes a literal array); padding = Σ per bin (max − len).
    "q146_padding_waste" ->
      """WITH l AS (SELECT CAST(len(list_filter(string_split(text, ' '),
        |     s -> len(s) > 0)) AS BIGINT) AS len FROM documents),
        | w AS (SELECT len, width FROM l,
        |   (VALUES (1000000), (256), (64), (16)) AS v(width)),
        | b AS (SELECT width, CAST(floor(len / width) AS BIGINT) AS bin,
        |   CAST(count(*) AS BIGINT) AS n_docs, max(len) AS mx,
        |   CAST(sum(len) AS BIGINT) AS toks
        |  FROM w GROUP BY width, bin),
        | g AS (SELECT width, CAST(count(*) AS BIGINT) AS n_bins,
        |   CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |   CAST(sum(toks) AS BIGINT) AS n_tokens,
        |   CAST(sum(mx * n_docs - toks) AS BIGINT) AS padding_tokens
        |  FROM b GROUP BY width)
        |SELECT CAST(width AS BIGINT) AS width, n_bins, n_docs, n_tokens,
        | padding_tokens,
        | floor(padding_tokens * 1.0 / (padding_tokens + n_tokens) * 1e6) / 1e6
        |   AS padding_frac
        |FROM g ORDER BY width""".stripMargin,

    // q147: per-label decimal-exact means floored to integer micro-units,
    // then pairwise dot/norms as exact BIGINT sums — no float summation,
    // so accumulation order cannot matter in either engine.
    "q147_label_centroid_sim" ->
      """WITH v AS (SELECT label, t.i AS dim,
        |   CAST(embedding[t.i + 1] AS DOUBLE) AS vd
        |  FROM embeddings, range(64) t(i)),
        | c AS (SELECT label, dim,
        |   CAST(floor(CAST(sum(CAST(floor(vd * 1e9) AS DECIMAL(28,9))) AS DOUBLE)
        |     / 1e9 / count(*) * 1e6) AS BIGINT) AS mi
        |  FROM v GROUP BY label, dim),
        | p AS (SELECT a.label AS l1, b.label AS l2,
        |   CAST(sum(a.mi * b.mi) AS BIGINT) AS dot,
        |   CAST(sum(a.mi * a.mi) AS BIGINT) AS n1,
        |   CAST(sum(b.mi * b.mi) AS BIGINT) AS n2
        |  FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
        |  GROUP BY l1, l2)
        |SELECT CAST(l1 AS BIGINT) AS l1, CAST(l2 AS BIGINT) AS l2,
        | round(dot / (sqrt(n1) * sqrt(n2)), 6) AS cosine
        |FROM p ORDER BY l1, l2""".stripMargin,

    // q148: q40's exact chain (k=10) as the relevant set, q41's bucketed
    // chain (k=10) as the ranked list; DCG weights floored to integer
    // 1e-9 units (q75's ln precedent) so per-probe sums are exact.
    "q148_rank_quality" -> {
      val bucket = (0 until 4)
        .map(i => s"CASE WHEN embedding[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END")
        .mkString("CAST(", " + ", " AS BIGINT)")
      s"""WITH $embCte,
         | probes AS (SELECT vec_id AS probe_id FROM e
         |   WHERE vec_id % 97 = 0 AND vec_id < 2048),
         | ep AS (SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
         |    (${dotSql("p.embedding", "c.embedding")}) / (p.nrm * c.nrm) AS cosine
         |   FROM e p JOIN e c ON p.vec_id % 97 = 0 AND p.vec_id < 2048
         |                    AND p.vec_id <> c.vec_id),
         | ex AS (SELECT probe_id, cand_id FROM (SELECT *, row_number()
         |     OVER (PARTITION BY probe_id ORDER BY cosine DESC, cand_id) AS rnk
         |    FROM ep) WHERE rnk <= 10),
         | eb AS (SELECT *, $bucket AS bucket FROM e),
         | ap AS (SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
         |    (${dotSql("p.embedding", "c.embedding")}) / (p.nrm * c.nrm) AS cosine
         |   FROM eb p JOIN eb c ON p.vec_id % 97 = 0 AND p.vec_id < 2048
         |     AND p.bucket = c.bucket AND p.vec_id <> c.vec_id),
         | an AS (SELECT probe_id, cand_id, rnk FROM (SELECT *, row_number()
         |     OVER (PARTITION BY probe_id ORDER BY cosine DESC, cand_id) AS rnk
         |    FROM ap) WHERE rnk <= 10),
         | h AS (SELECT an.probe_id, CAST(count(*) AS BIGINT) AS n_hits,
         |    CAST(min(rnk) AS BIGINT) AS first_rank,
         |    CAST(sum(CAST(floor(1e9 / (ln(rnk + 1.0) / ln(2.0))) AS BIGINT))
         |      AS BIGINT) AS dcg9
         |   FROM an JOIN ex USING (probe_id, cand_id) GROUP BY an.probe_id),
         | wt AS (SELECT i, CAST(floor(1e9 / (ln(i + 1.0) / ln(2.0))) AS BIGINT)
         |     AS iw9 FROM range(1, 11) t(i)),
         | sc AS (SELECT probe_id, n_hits, first_rank, dcg9,
         |    CAST(sum(iw9) AS BIGINT) AS idcg9
         |   FROM h JOIN wt ON wt.i <= h.n_hits
         |   GROUP BY probe_id, n_hits, first_rank, dcg9)
         |SELECT p.probe_id,
         | coalesce(sc.n_hits, 0) AS n_hits,
         | floor(coalesce(sc.n_hits, 0) * 1.0 / 10 * 1e6) / 1e6 AS recall_at_10,
         | coalesce(floor(1.0 / sc.first_rank * 1e6) / 1e6, 0.0) AS mrr,
         | coalesce(floor(sc.dcg9 * 1.0 / sc.idcg9 * 1e6) / 1e6, 0.0) AS ndcg
         |FROM probes p LEFT JOIN sc USING (probe_id)
         |ORDER BY p.probe_id""".stripMargin
    },

    // q149: q94's %7 increment convention at shingle grain; the corpus
    // vocabulary distinct-reduces before the join (q60's DISTINCT+unnest
    // shape).
    "q149_increment_novelty" ->
      s"""WITH $toksCte,
         | g AS (SELECT DISTINCT doc_id,
         |   unnest(list_transform(range(1, len(toks) - 1),
         |     i -> array_to_string(toks[i:i+2], ' '))) AS gram
         |  FROM t WHERE len(toks) >= 3),
         | cv AS (SELECT DISTINCT gram FROM g WHERE doc_id % 7 <> 0),
         | bg AS (SELECT doc_id, gram FROM g WHERE doc_id % 7 = 0)
         |SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         | CAST(sum(CASE WHEN cv.gram IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_novel,
         | floor(sum(CASE WHEN cv.gram IS NULL THEN 1 ELSE 0 END) * 1.0
         |   / count(*) * 1e6) / 1e6 AS novelty
         |FROM bg LEFT JOIN cv USING (gram)
         |GROUP BY bg.doc_id ORDER BY bg.doc_id""".stripMargin,

    // q150: q66's gate chain + q34's fingerprint window summarized to
    // source grain — every stage definition mirrored from its own
    // oracle so the scorecard cannot disagree with the stages.
    "q150_source_scorecard" ->
      s"""WITH $toksCte,
         | tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
         | cnt AS (SELECT doc_id, token, count(*) AS c FROM tok
         |   GROUP BY doc_id, token),
         | st AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |   CAST(count(*) AS BIGINT) AS n_distinct, max(c) AS max_tok
         |  FROM cnt GROUP BY doc_id),
         | g AS (SELECT doc_id, n_tokens,
         |   (n_tokens >= 30
         |     AND floor(n_distinct * 1.0 / n_tokens * 1e6) / 1e6 >= 0.45
         |     AND floor(max_tok * 1.0 / n_tokens * 1e6) / 1e6 <= 0.15) AS keep
         |  FROM st),
         | f AS (SELECT doc_id, source, n_chars,
         |   doc_id <> min(doc_id) OVER (PARTITION BY
         |     sha256(trim(lower(regexp_replace(text, '\\s+', ' ', 'g')))))
         |     AS exact_drop
         |  FROM documents)
         |SELECT f.source, CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(coalesce(sum(g.n_tokens), 0) AS BIGINT) AS n_tokens,
         | floor(sum(CASE WHEN g.keep THEN 1 ELSE 0 END) * 1.0
         |   / count(*) * 1e6) / 1e6 AS pass_rate,
         | floor(sum(CASE WHEN f.exact_drop THEN 1 ELSE 0 END) * 1.0
         |   / count(*) * 1e6) / 1e6 AS dup_rate,
         | floor(sum(f.n_chars) * 1.0 / count(*) * 1e6) / 1e6 AS mean_chars
         |FROM f LEFT JOIN g USING (doc_id)
         |GROUP BY f.source ORDER BY f.source""".stripMargin,
  )

  /** q127: one residual-PQ codebook variant's CTE chain (train → encode
    * → LUT → ADC → top-5 → recall hits), suffixed so two variants
    * coexist in one query. `trainPred` restricts the TRAINING set (the
    * E/M-step inputs); `seedPred` picks the seed residuals. Mirrors the
    * q112 oracle's chain (and `Similarity.trainedSubCodebook` /
    * `pqCodesSeg` / `ivfPqScoreWith`) expression-for-expression. */
  private def pqCbChain(sfx: String, trainPred: String, seedPred: String): String =
    s""" scb$sfx AS (SELECT CAST(vec_id AS INT) AS code, resid AS cvec
       |   FROM resid WHERE $seedPred),
       | ecd$sfx AS (SELECT v.vec_id, v.sub, c.code,
       |    (${pqDistSql("v.resid", "c.cvec", "v.sub")}) AS d
       |   FROM (SELECT * FROM vs WHERE $trainPred) v, scb$sfx c),
       | ec$sfx AS (SELECT *, row_number() OVER (PARTITION BY vec_id, sub
       |         ORDER BY d, code) AS rn FROM ecd$sfx),
       | c0$sfx AS MATERIALIZED (SELECT vec_id, sub, code FROM ec$sfx WHERE rn = 1),
       | xr$sfx AS (SELECT c0.sub, c0.code, ii.i, r.resid[c0.sub * 8 + ii.i] AS v
       |   FROM c0$sfx c0 JOIN resid r ON c0.vec_id = r.vec_id
       |   CROSS JOIN (SELECT unnest(range(1, 9)) AS i) ii),
       | mr$sfx AS (SELECT sub, code, i,
       |   floor(CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1e9)
       |       AS DECIMAL(28,9))) AS DOUBLE) / 1e9 / count(*) * 1e6) / 1e6 AS cm
       |  FROM xr$sfx GROUP BY sub, code, i),
       | tcb$sfx AS MATERIALIZED (SELECT sub, code, list(CAST(cm AS FLOAT) ORDER BY i) AS scvec
       |  FROM mr$sfx GROUP BY sub, code),
       | ecd2$sfx AS (SELECT v.vec_id, t.sub, t.code,
       |    (${pqDistSegSql("v.resid", "t.scvec", "t.sub")}) AS d
       |   FROM vs v JOIN tcb$sfx t ON v.sub = t.sub),
       | ec2$sfx AS (SELECT *, row_number() OVER (PARTITION BY vec_id, sub
       |         ORDER BY d, code) AS rn FROM ecd2$sfx),
       | codes$sfx AS MATERIALIZED (SELECT vec_id, sub, code FROM ec2$sfx WHERE rn = 1),
       | lut$sfx AS (SELECT pc.probe_id, pc.cell, t.sub, t.code,
       |    (${pqDistSegSql("pc.p_resid", "t.scvec", "t.sub")}) AS d
       |   FROM pcells pc, tcb$sfx t),
       | sc$sfx AS (SELECT cd.probe_id, cd.vec_id AS cand_id,
       |    CAST(sum(CAST(floor(l.d * 1e9) AS DECIMAL(28,9))) AS DOUBLE) / 1e9 AS adc
       |   FROM cand cd
       |   JOIN codes$sfx k ON k.vec_id = cd.vec_id
       |   JOIN lut$sfx l ON l.probe_id = cd.probe_id AND l.cell = cd.cell
       |             AND l.sub = k.sub AND l.code = k.code
       |   GROUP BY 1, 2),
       | ap$sfx AS (SELECT probe_id, cand_id FROM (
       |   SELECT *, row_number() OVER (PARTITION BY probe_id
       |     ORDER BY adc, cand_id) AS rnk FROM sc$sfx) WHERE rnk <= 5),
       | hits$sfx AS (SELECT ex.probe_id, count(*) AS n
       |   FROM ex JOIN ap$sfx ap ON ex.probe_id = ap.probe_id
       |                         AND ex.cand_id = ap.cand_id
       |   GROUP BY ex.probe_id)""".stripMargin

  /** The BM25 CTE chain through the ranked candidate table `bmr` —
    * shared by q116 (the report) and q117 (the fusion input). Mirrors
    * `Retrieval.bm25From` expression-for-expression: same tokenizer,
    * q65's tfidf/tie-break for the query terms, Lucene idf, k1=1.2,
    * b=0.75, decimal-exact term summation. */
  private def bm25Ctes: String =
    s"""tok AS (SELECT doc_id,
       |   unnest(list_filter(string_split(text, ' '), s -> len(s) > 0)) AS token
       |  FROM documents),
       | tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
       | dft AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
       | dlen AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
       | nd AS (SELECT count(*) AS n_docs FROM documents),
       | consts AS (SELECT n_docs,
       |    CAST(t.tot AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl
       |   FROM nd, (SELECT sum(dl) AS tot FROM dlen) t),
       | qt0 AS (SELECT f.doc_id AS probe_id, f.token,
       |    floor(f.tf * (ln((n.n_docs + 1.0) / (d.df + 1.0)) + 1.0) * 1e6) / 1e6 AS tfidf
       |   FROM tf f JOIN dft d USING (token), nd n
       |   WHERE f.doc_id % 97 = 0 AND f.doc_id < 2048),
       | qt AS (SELECT probe_id, token FROM (
       |    SELECT *, row_number() OVER (PARTITION BY probe_id
       |      ORDER BY tfidf DESC, token) AS rn FROM qt0) WHERE rn <= 3),
       | term AS (SELECT q.probe_id, f.doc_id AS cand_id,
       |    ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5)) *
       |    (f.tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)) /
       |     (f.tf + 1.2 * ((1.0 - 0.75) + 0.75 * CAST(l.dl AS DOUBLE) / c.avgdl))) AS term_score
       |   FROM qt q
       |   JOIN tf f ON q.token = f.token AND f.doc_id <> q.probe_id
       |   JOIN dft d ON d.token = q.token
       |   JOIN dlen l ON l.doc_id = f.doc_id, consts c),
       | bms AS (SELECT probe_id, cand_id, count(*) AS n_terms,
       |    CAST(sum(CAST(floor(term_score * 1e9) AS DECIMAL(28,9))) AS DOUBLE) / 1e9 AS score
       |   FROM term GROUP BY 1, 2),
       | bmr AS (SELECT *, row_number() OVER (PARTITION BY probe_id
       |         ORDER BY score DESC, cand_id) AS rnk FROM bms)""".stripMargin

  private def bm25Sql(k: Int): String =
    s"""WITH $bm25Ctes
       |SELECT probe_id, CAST(rnk AS BIGINT) AS "rank", cand_id,
       | CAST(n_terms AS BIGINT) AS n_terms, round(score, 6) AS score
       |FROM bmr WHERE rnk <= $k ORDER BY probe_id, rnk""".stripMargin
}
