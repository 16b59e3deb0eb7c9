package graft

import org.apache.spark.sql.functions._
import graft.operators.{Retrieval, Similarity}
import graft.sources.Tables

class RetrievalSpec extends SparkSpec {

  test("bm25: candidates share 1..3 query terms, scores positive and ranked") {
    val out = Retrieval.bm25Search(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(3) >= 1L && r.getLong(3) <= 3L) // n_terms
      assert(r.getDouble(4) > 0.0, s"non-positive BM25 score: $r")
      assert(r.getLong(0) != r.getLong(2), "self-retrieval not excluded")
    }
    out.groupBy(_.getLong(0)).foreach { case (_, g) =>
      assert(g.map(_.getLong(1)).sorted.sameElements(1L to g.length))
      val ss = g.sortBy(_.getLong(1)).map(_.getDouble(4))
      assert(ss.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    }
  }

  test("bm25: every candidate contains at least one of the probe's query terms") {
    // independent recomputation of the query-term contract from raw text
    val docs = Tables.documents(spark, sfDir)
    val tokensOf = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSet)
      .toMap
    // probe query terms recomputed via the q65 tfidf path
    val probeTerms = graft.operators.Text.tfidf(spark, sfDir) // doc_id<50 includes probe 0
      .filter(col("doc_id") % 97 === 0 && col("rn") <= 3)
      .collect().groupBy(_.getLong(0))
      .map { case (d, g) => d -> g.map(_.getString(2)).toSet }
    Retrieval.bm25Search(spark, sfDir).collect().foreach { r =>
      val (probe, cand) = (r.getLong(0), r.getLong(2))
      probeTerms.get(probe).foreach { qs =>
        assert(tokensOf(cand).intersect(qs).nonEmpty,
          s"cand $cand of probe $probe shares no query term of $qs")
      }
    }
  }

  test("rrf fusion: candidates come from a source list, score recomputes from ranks") {
    val out = Retrieval.rrfFusion(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val bm = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val cos = if (r.isNullAt(4)) None else Some(r.getLong(4))
      assert(bm.nonEmpty || cos.nonEmpty, "fused row from neither list")
      val expect = bm.map(x => math.floor(1e9 / (60 + x)).toLong).getOrElse(0L) +
        cos.map(x => math.floor(1e9 / (60 + x)).toLong).getOrElse(0L)
      assert(r.getLong(5) == expect, s"rrf_scaled mismatch: $r")
    }
    out.groupBy(_.getLong(0)).foreach { case (_, g) =>
      assert(g.map(_.getLong(1)).sorted.sameElements(1L to g.length))
      val ss = g.sortBy(_.getLong(1)).map(_.getLong(5))
      assert(ss.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    }
  }

  test("rrf fusion: a doc ranked #1 by both lists tops the fused ranking") {
    // construct the property from the component lists directly
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val probes = docs.filter(col("doc_id") % 97 === 0)
    val bm = Retrieval.bm25From(docs, probes, nTerms = 3, k = 20)
      .filter(col("rank") === 1).select("probe_id", "cand_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cos = Similarity.cosineTopKFrom(emb,
        emb.join(probes.select(col("doc_id").as("vec_id")), Seq("vec_id")), k = 20)
      .filter(col("rank") === 1).select("probe_id", "cand_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fusedTop = Retrieval.rrfFusion(spark, sfDir)
      .filter(col("rank") === 1).select("probe_id", "cand_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((p, b) <- bm; c <- cos.get(p) if b == c)
      assert(fusedTop(p) == b, s"probe $p: both lists rank $b first, fused picked ${fusedTop(p)}")
  }
}
