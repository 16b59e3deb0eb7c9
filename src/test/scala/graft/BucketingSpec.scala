package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Bucketed-table co-located join (SURVEY.md §7.4 "fact-fact joins
  * pre-partitioned on key"): writing both fact tables bucketed by the join
  * key lets the sort-merge join run with ZERO exchanges — at 100 TB this
  * removes the dominant shuffle of the pipeline for repeated joins. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val li = "graft_li_bucketed"
    val ord = "graft_ord_bucketed"
    try {
      Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(li)
      Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(ord)

      val joined = spark.table(li)
        .join(spark.table(ord).hint("merge"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"), plan.take(600))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n${plan.take(1200)}")

      // and it returns the same rows as the plain join
      val expected = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() == expected)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $li")
      spark.sql(s"DROP TABLE IF EXISTS $ord")
    }
  }
}
