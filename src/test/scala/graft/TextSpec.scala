package graft

import org.apache.spark.sql.functions._
import graft.operators.Text
import graft.sources.Tables

class TextSpec extends SparkSpec {

  test("token fertility: per-lang volumes reconcile with the corpus") {
    val out = Text.tokenFertility(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir).cache()
    assert(out.map(_.getString(0)).distinct.length == out.length)
    assert(out.map(_.getLong(1)).sum == docs.count())
    assert(out.map(_.getLong(2)).sum ==
      docs.agg(sum(col("n_chars"))).head().getLong(0))
    // token totals against an independent whole-corpus count
    val totalToks = docs
      .select(size(filter(split(col("text"), " "), t => length(t) > 0))
        .cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(out.map(_.getLong(3)).sum == totalToks)
    out.foreach { r =>
      val (nToks, nVocab) = (r.getLong(3), r.getLong(4))
      assert(nVocab >= 1L && nVocab <= nToks, s"vocab out of range: $r")
      // whitespace separators make raw chars/token exceed mean token
      // length whenever any document has >1 token
      assert(r.getDouble(5) >= r.getDouble(6), s"fertility < token len: $r")
      assert(r.getDouble(7) > 0.0 && r.getDouble(7) <= 1.0, s"ttr: $r")
    }
    docs.unpersist()
    ()
  }
}
