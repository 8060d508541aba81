package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RetrievalSpec extends SparkTestBase {

  private def docs = {
    import spark.implicits._
    Seq(
      (0L, "spark shuffle join"),        // query doc
      (1L, "spark shuffle shuffle sort"),
      (2L, "join join join spark"),
      (3L, "completely unrelated words"),
      (4L, "")
    ).toDF("doc_id", "text")
  }

  test("bm25TopK: hand-computed scores, self excluded, no-overlap and " +
       "empty docs absent") {
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
        col("doc_id") === 0L, k = 10)
      .orderBy("qid", "rn").collect()
    // candidates: docs 1 and 2 share terms with doc 0; 3 and 4 never appear
    assert(out.map(_.getLong(2)).toSet === Set(1L, 2L))

    // hand BM25: N=5, totalTokens=3+4+4+3=14, avgdl=14/5=2.8
    val N = 5.0; val avgdl = 14.0 / 5.0; val k1 = 1.2; val b = 0.75
    def idf(df: Long) = math.log((N - df + 0.5) / (df + 0.5) + 1.0)
    def w(tf: Long, dl: Long, df: Long) =
      idf(df) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    // doc1 (dl 4): spark tf1 df3, shuffle tf2 df2 ; join absent
    val s1 = BigDecimal(w(1, 4, 3) + w(2, 4, 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc2 (dl 4): spark tf1 df3, join tf3 df2
    val s2 = BigDecimal(w(1, 4, 3) + w(3, 4, 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byDid = out.map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(math.abs(byDid(1L) - s1) < 1e-9, s"doc1: ${byDid(1L)} vs $s1")
    assert(math.abs(byDid(2L) - s2) < 1e-9, s"doc2: ${byDid(2L)} vs $s2")
    // ranks ordered by score desc
    assert(out.map(_.getInt(1)).toSeq === Seq(1, 2))
  }

  test("bm25TopK: k caps results and queries with no token overlap " +
       "return nothing") {
    val capped = Retrieval.bm25TopK(docs, "doc_id", "text",
      col("doc_id") === 0L, k = 1).collect()
    assert(capped.length === 1)
    val none = Retrieval.bm25TopK(docs, "doc_id", "text",
      col("doc_id") === 3L, k = 5).collect()
    assert(none.isEmpty, "doc 3 shares no terms")
  }

  test("rrfFuse: scores sum 1/(k+rn) across rankings, ties break on did") {
    import spark.implicits._
    val a = Seq((0L, 10L, 1), (0L, 11L, 2)).toDF("qid", "did", "rn")
    val b = Seq((0L, 11L, 1), (0L, 12L, 2)).toDF("qid", "did", "rn")
    val out = Retrieval.rrfFuse(Seq(a, b), kConst = 60, topK = 3)
      .orderBy("rn").collect()
    // doc 11 appears in both (rn 2 and 1) -> 1/62 + 1/61; wins
    val expected11 = BigDecimal(1.0 / 62 + 1.0 / 61)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.head.getLong(2) === 11L)
    assert(math.abs(out.head.getDouble(3) - expected11) < 1e-9)
    // docs 10 and 12 tie at 1/61 vs 1/62 -> 10 (1/61) above 12 (1/62)
    assert(out.map(_.getLong(2)).toSeq === Seq(11L, 10L, 12L))
  }

  test("rankingMetrics: hand-computed MRR / recall@k / nDCG@k, " +
       "no-relevant query gets rr=0 and null recall/ndcg") {
    import spark.implicits._
    // corpus labels: query 0 -> label A (3 corpus docs share it: 1,2,3);
    // query 100 -> label Z (no other doc has it)
    val labels = Seq(
      (0L, "A"), (1L, "A"), (2L, "A"), (3L, "A"),
      (4L, "B"), (5L, "B"), (100L, "Z")
    ).toDF("id", "label")
    // query 0 retrieved: rel at rn 1 and 3, miss at rn 2;
    // query 100 retrieved two docs, none relevant
    val ranking = Seq(
      (0L, 1, 1L), (0L, 2, 4L), (0L, 3, 2L),
      (100L, 1, 5L), (100L, 2, 3L)
    ).toDF("qid", "rn", "did")
    val out = Retrieval.rankingMetrics(ranking, labels, "id", "label", k = 2)
      .orderBy("qid").collect()

    val q0 = out(0)
    assert(q0.getLong(1) === 3L, "n_rel: docs 1,2,3 (self excluded)")
    assert(q0.getLong(2) === 2L, "hits: rn 1 and rn 3")
    assert(q0.getDouble(3) === 1.0, "first relevant at rank 1")
    // m = min(k=2, n_rel=3) = 2; recall = 2/2
    assert(q0.getDouble(4) === 1.0)
    // dcg = 1/log2(2) + 1/log2(4) = 1 + 0.5; idcg = 1/log2(2) + 1/log2(3)
    val expNdcg = BigDecimal(1.5 / (1.0 + 1.0 / (math.log(3.0) / math.log(2.0))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(q0.getDouble(5) - expNdcg) < 1e-9, s"${q0.getDouble(5)}")

    val q100 = out(1)
    assert(q100.getLong(1) === 0L && q100.getLong(2) === 0L)
    assert(q100.getDouble(3) === 0.0, "no relevant -> rr 0")
    assert(q100.isNullAt(4) && q100.isNullAt(5),
      "n_rel = 0 -> null recall/ndcg")
  }

  test("rrfFuse: exact tie broken by ascending did") {
    import spark.implicits._
    val a = Seq((0L, 20L, 1), (0L, 7L, 1)).toDF("qid", "did", "rn")
    // both docs score 1/61 — doc 7 must rank first
    val out = Retrieval.rrfFuse(Seq(a), kConst = 60, topK = 2)
      .orderBy("rn").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(7L, 20L))
  }

  test("phraseOccurrences: consecutive runs only, 3-term chains, " +
       "self-overlapping starts all count, non-matching docs absent") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c a b c"), // the 3-gram twice
      (2L, "a c b"),       // all terms present, never consecutive
      (3L, "x x x")        // "x x" starts at positions 0 AND 1
    ).toDF("doc_id", "text")
    val abc = Retrieval.phraseOccurrences(d, "doc_id", "text", "a b c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(abc.toSeq === Seq((1L, 2L)))
    val xx = Retrieval.phraseOccurrences(d, "doc_id", "text", "x x")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(xx.toSeq === Seq((3L, 2L)))
  }
}
