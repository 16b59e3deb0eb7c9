package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: one JSON line with per-query seconds.
  *
  * Methodology:
  *  - queries run in sorted name order after a warmup pass (tables
  *    counted + one full query) so JVM/codegen warmup isn't attributed
  *    to whichever query happens to run first;
  *  - results are materialized with a noop-format write, which evaluates
  *    every output column — `count()` would let Catalyst prune the very
  *    expressions being benchmarked.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Dev-only subset filter (comma-separated name prefixes); the driver
    // sets neither env var and always benches the full surface.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))

    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // warmup: touch every table (schema-declared readers — the raw events
    // file has a nanos timestamp Spark won't infer), exercise codegen once
    import graft.sources.Tables
    Seq(Tables.region _, Tables.nation _, Tables.customer _, Tables.supplier _,
      Tables.part _, Tables.orders _, Tables.lineitem _, Tables.events _,
      Tables.documents _, Tables.embeddings _)
      .foreach(t => t(spark, sfDir).count())
    run(names.min)

    // A failed query must surface as an err entry, never as a (fast) time —
    // a silent catch would let a crash *improve* the bench total.
    val results: Seq[(String, Either[String, Double])] = names.map { name =>
      val t0 = System.nanoTime()
      try {
        run(name)
        name -> Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          name -> Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    val qs = results.map {
      case (k, Right(v)) => "\"" + k + "\":" + v
      case (k, Left(err)) =>
        "\"" + k + "\":{\"err\":\"" + err.replaceAll("[\"\\\\\\n\\r\\t]", " ") + "\"}"
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right(v)) => v }.sum
    val nErr = results.count(_._2.isLeft)
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_err":$nErr,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
