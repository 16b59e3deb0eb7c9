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

  test("token fertility: a zero-token language keeps its doc volumes (left join)") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c", "en", 5L),
      (1L, "   ", "xx", 3L), // whitespace-only: zero tokens
      (2L, "", "xx", 0L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val out = Text.tokenFertilityFrom(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("en", "xx"))
    val xx = out("xx")
    assert(xx.getLong(1) == 2L && xx.getLong(2) == 3L) // n_docs, n_chars kept
    assert(xx.getLong(3) == 0L && xx.getLong(4) == 0L) // tokens coalesced to 0
    assert(xx.isNullAt(5) && xx.isNullAt(6) && xx.isNullAt(7)) // null-safe ratios
    assert(xx.getLong(8) == 0L && xx.isNullAt(9)) // BPE columns null-safe too
    val en = out("en")
    assert(en.getLong(3) == 3L && en.getDouble(7) == 1.0)
    // 1-char words have no pairs: merge table is empty, 1 symbol per word
    assert(en.getLong(8) == 3L)
    assert(en.getDouble(9) == math.floor(5L * 1e6 / 3) / 1e6)
  }
}
