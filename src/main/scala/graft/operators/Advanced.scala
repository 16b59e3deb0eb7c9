package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.MoneySum
import graft.sources.Tables

/** Second relational wave: multi-dimensional aggregates, pivot, subquery
  * patterns, exact percentiles, latest-per-key dedup, and array/map
  * function showcases (SURVEY.md §2 Table B rows Aggregations, Window,
  * Array fns, Map fns).
  */
object Advanced {

  /** CUBE over two dimensions — all 4 grouping sets in one shuffle. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(MoneySum.sumAsDouble(col("o_totalprice"), 1e2), 2).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("total"))
      .orderBy(col("status"), col("priority"))

  /** Pivot: order counts per priority × status matrix. Declared with the
    * DataFrame pivot API (explicit value list → no extra distinct-values
    * job); missing cells coalesced to 0 to match the oracle's conditional
    * aggregation. */
  def pivotAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(
        col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy(col("o_orderpriority"))

  /** Correlated-subquery pattern: customers above their nation's average
    * balance. Declared as join-with-aggregate — the shape the optimizer
    * decorrelates subqueries into, and the only shape that scales (one
    * shuffle on nationkey, no per-row subquery execution). */
  def aboveNationAvg(spark: SparkSession, dir: String): DataFrame = {
    // decimal-exact sum so both engines derive the identical average double
    val navg = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").as("nk"))
      .agg((MoneySum.sumAsDouble(col("c_acctbal"), 1e2) / count(lit(1)))
        .as("nation_avg"))
    Tables.customer(spark, dir)
      .join(broadcast(navg), col("c_nationkey") === col("nk"))
      .filter(col("c_acctbal") > col("nation_avg"))
      .select(col("c_custkey"), col("c_nationkey"),
        (floor((col("c_acctbal") - col("nation_avg")) * 100) / 100).as("above_by"))
      .orderBy(col("c_custkey"))
  }

  /** Scalar-subquery pattern: orders within 10% of the global max price.
    * The global aggregate is broadcast back — no driver collect. */
  def nearMaxOrders(spark: SparkSession, dir: String): DataFrame = {
    val mx = Tables.orders(spark, dir).agg(max(col("o_totalprice")).as("max_price"))
    Tables.orders(spark, dir)
      .crossJoin(broadcast(mx))
      .filter(col("o_totalprice") >= col("max_price") * 0.9)
      .select(col("o_orderkey"), col("o_totalprice"),
        round(col("max_price") - col("o_totalprice"), 2).as("below_max"))
      .orderBy(col("o_orderkey"))
  }

  /** Exact interpolated percentiles per segment (Spark `percentile` ==
    * DuckDB `quantile_cont`: index p·(n−1), linear interpolation). */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n"),
        round(expr("percentile(c_acctbal, 0.5)"), 6).as("p50"),
        round(expr("percentile(c_acctbal, 0.9)"), 6).as("p90"),
        round(expr("percentile(c_acctbal, 0.99)"), 6).as("p99"))
      .orderBy(col("c_mktsegment"))

  /** Latest-event-per-user dedup — the "latest forecast run wins" idiom
    * from the ingestion domain (SURVEY Table B window row), expressed as
    * the standard ranking-window dedup. */
  def latestPerKey(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("latest_event_id"),
        col("event_type").as("latest_type"),
        col("ts").cast("double").cast("long").as("latest_epoch"))
      .orderBy(col("user_id"))
  }

  /** Array-function showcase over embeddings: sort/slice/fold composition. */
  def arrayOps(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 200)
      .withColumn("top3",
        slice(sort_array(col("embedding"), asc = false), 1, 3))
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(aggregate(col("top3"), lit(0.0), (acc, x) => acc + x.cast("double")), 6)
          .as("sum_top3"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("first_val"),
        round(array_max(col("embedding")).cast("double"), 6).as("max_val"),
        round(array_min(col("embedding")).cast("double"), 6).as("min_val"))
      .orderBy(col("vec_id"))

  /** Null-handling semantics: nullif/coalesce and count(col)-skips-nulls.
    * (The driver tables are null-free, so nulls are introduced with
    * nullif — same function both engines.) */
  def nullHandling(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("flag_or_null", nullif(col("l_returnflag"), lit("N")))
      .groupBy(col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_all"),
        count(col("flag_or_null")).as("n_flag_not_n"),
        sum(when(col("flag_or_null").isNull, 1L).otherwise(0L)).as("n_flag_n"),
        first(coalesce(col("flag_or_null"), lit("defaulted")), ignoreNulls = false).as("sample_coalesce"))
      .drop("sample_coalesce") // first() is order-dependent; counts are the check
      .orderBy(col("l_linestatus"))

  /** Deterministic hash sampling: the scalable, reproducible alternative
    * to rand()-based TABLESAMPLE — membership is a pure function of the
    * key, so the same ~10% sample falls out on any engine, any cluster,
    * any day. */
  def deterministicSample(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(graft.functions.Hashing.h32(col("o_orderkey").cast("string")) % 100 < 10)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_sampled"),
        round(MoneySum.sumAsDouble(col("o_totalprice"), 1e2), 2).as("sampled_total"))
      .orderBy(col("o_orderstatus"))

  /** Top-2 parts per brand via the typed bounded-heap
    * [[graft.functions.TopKAggregator]] (UDAF surface) — result-identical
    * to the window formulation (q12), but carries only k elements through
    * partial aggregation instead of sorting whole groups. */
  def topKAggregator(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val agg = new graft.functions.TopKAggregator(2).toColumn
    Tables.part(spark, dir)
      .select(col("p_brand"), col("p_retailprice"), col("p_partkey"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.name("topk"))
      .toDF("p_brand", "topk")
      .select(col("p_brand"), posexplode(col("topk")))
      .select(
        col("p_brand"),
        (col("pos") + 1).cast("int").as("rn"),
        col("col._2").as("p_partkey"),
        col("col._1").as("p_retailprice"))
      .orderBy(col("p_brand"), col("rn"))
  }

  /** Map-function showcase: build a map column, read it back. The oracle
    * mirrors the extracted values (DuckDB's MAP type differs; the check is
    * on the scalar results, which is what matters). */
  def mapOps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_id") < 500)
      .withColumn("m", map(
        lit("type"), col("event_type"),
        lit("uid"), col("user_id").cast("string")))
      .select(
        col("event_id"),
        element_at(col("m"), "type").as("type_from_map"),
        element_at(col("m"), "uid").as("uid_from_map"),
        size(map_keys(col("m"))).cast("long").as("n_keys"))
      .orderBy(col("event_id"))
}
