package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan of declared queries —
  * `runMain graft.PlanAudit q04_fact_join q58_rp_lsh_ann` (no args = the
  * bench's historically slowest queries). Used to verify pushdown
  * (`PushedFilters`/`ReadSchema`), codegen spans, broadcast vs shuffle
  * joins, and WindowGroupLimit top-k planning after each change. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q35_jaccard_neardup", "q37_lsh_neardup", "q04_fact_join",
        "q60_chargram_neardup", "q58_rp_lsh_ann")
    names.foreach { q =>
      println(s"===== $q")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
