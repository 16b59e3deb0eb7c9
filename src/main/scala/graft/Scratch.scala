package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway A/B timing harness for candidate expression rewrites —
  * NOT part of any deliverable; deleted before the round commits. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.Tables

    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s median=${ts.sorted.apply(1)}%.3f  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = Tables.lineitem(spark, sfDir)
    // warm
    li.count(); noop(li.groupBy(col("l_returnflag")).agg(count(lit(1))))

    // q64 variants
    val base = li.select(col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("double").as("l_quantity"),
      col("l_extendedprice").cast("double").as("l_extendedprice"),
      col("l_discount").cast("double").as("l_discount"),
      col("l_tax").cast("double").as("l_tax"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "measure", "val")
    time("q64 decimal sum") {
      noop(base.groupBy(col("measure")).agg(
        count(lit(1)).as("n"),
        round(sum(col("val").cast("decimal(18,4)")).cast("double"), 4).as("total"),
        round(min(col("val")), 4).as("lo"),
        round(max(col("val")), 4).as("hi")).orderBy(col("measure")))
    }
    time("q64 scaled-long sum") {
      noop(base.groupBy(col("measure")).agg(
        count(lit(1)).as("n"),
        round((sum((col("val") * 1e4 + 0.5).cast("long")) / 1e4), 4).as("total"),
        round(min(col("val")), 4).as("lo"),
        round(max(col("val")), 4).as("hi")).orderBy(col("measure")))
    }
    // value-equality check
    val a = base.groupBy(col("measure")).agg(
      round(sum(col("val").cast("decimal(18,4)")).cast("double"), 4).as("t")).orderBy("measure").collect()
    val b = base.groupBy(col("measure")).agg(
      round((sum((col("val") * 1e4 + 0.5).cast("long")) / 1e4), 4).as("t")).orderBy("measure").collect()
    println("q64 equal: " + a.zip(b).forall { case (x, y) => x.getDouble(1) == y.getDouble(1) })
    println(a.map(_.toString).mkString(" "))
    println(b.map(_.toString).mkString(" "))

    // q01 variants
    time("q01 as-is") {
      noop(graft.operators.Relational.pricingSummary(spark, sfDir))
    }
    val fil = li.filter(col("l_shipdate") <= lit("2000-06-01").cast("timestamp"))
    time("q01 scaled-long") {
      noop(fil.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round((sum((col("l_extendedprice") * 1e2 + 0.5).cast("long")) / 1e2), 2).as("sum_base_price"),
        (floor((sum(((col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * 1e6 + 0.5).cast("long")) / 1e6) * 100) / 100).as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        (floor((sum((col("l_extendedprice") * 1e2 + 0.5).cast("long")) / 1e2) / count(lit(1)) * 1e6) / 1e6).as("avg_price"),
        count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")))
    }
    val qa = graft.operators.Relational.pricingSummary(spark, sfDir).collect()
    val qb = fil.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
      round(sum(col("l_quantity")), 2).as("sum_qty"),
      round((sum((col("l_extendedprice") * 1e2 + 0.5).cast("long")) / 1e2), 2).as("sum_base_price"),
      (floor((sum(((col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * 1e6 + 0.5).cast("long")) / 1e6) * 100) / 100).as("sum_disc_price"),
      round(avg(col("l_quantity")), 6).as("avg_qty"),
      (floor((sum((col("l_extendedprice") * 1e2 + 0.5).cast("long")) / 1e2) / count(lit(1)) * 1e6) / 1e6).as("avg_price"),
      count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus")).collect()
    println("q01 equal: " + qa.zip(qb).forall { case (x, y) => x == y })
    println(qa.map(_.toString).mkString(" "))
    println(qb.map(_.toString).mkString(" "))

    spark.stop()
  }
}
