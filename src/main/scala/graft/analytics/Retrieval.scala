package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval and rank fusion — the serving-side counterpart of the
  * corpus-curation operators: BM25 scoring over an inverted posting list and
  * reciprocal-rank fusion of heterogeneous rankings (the standard hybrid
  * lexical + vector retrieval pattern for RAG-style pipelines).
  *
  * Scale shape: every corpus-sized table is keyed (posting lists by word,
  * document lengths by doc id); only genuinely bounded tables — the
  * query-term set, the 1-row corpus stats — are broadcast. Nothing
  * corpus-sized crosses a broadcast or a driver collect.
  *
  * Reference anchor: the reference's TF-IDF cosine classifier
  * (main.py:1482-1530) is its only ranking primitive; BM25 + RRF are the
  * retrieval-layer extension a training-data pipeline needs for hard-negative
  * mining and eval-set construction.
  */
object Retrieval {

  /** BM25 top-k retrieval: for each query document (rows matching
    * `queryPred`), the `k` highest-BM25 corpus documents sharing at least
    * one term (excluding the query document itself).
    *
    * Scoring is textbook Robertson/Lucene BM25 with non-negative IDF:
    * {{{
    *   idf(t)      = ln((N - df + 0.5) / (df + 0.5) + 1)
    *   score(q, d) = sum over distinct t in q:
    *                 idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b*dl/avgdl))
    * }}}
    * with `N` = total corpus documents (empty ones included), `dl` the
    * document token count, and `avgdl = totalTokens / N` (an exact
    * long/long double division, bit-equal cross-engine). Query terms are
    * DISTINCT (Lucene semantics — query-side tf is ignored).
    *
    * Plan shape for 100 TB: everything query-independent and bounded —
    * per-term idf (from the vocabulary-sized df table) and the 1-row
    * corpus stats — is folded into the query-term table BEFORE it meets
    * the corpus, so the only broadcast is |queries| × query length rows
    * and candidate generation is a map-side probe of the posting list.
    * Document length rides a did-partitioned window over the postings
    * (per-partition size = one document's distinct words). The candidate
    * intermediate — Σ df(t) over query terms, the classic posting-list
    * cost — is never shuffled raw: it partial-aggregates map-side into
    * (qid, did) groups before its one exchange. The per-query top-k
    * window is bounded by the same Σ df(t). `round(,6)` before ranking
    * absorbs cross-engine summation-order ulps; ties break on doc id.
    */
  def bm25TopK(docs0: DataFrame, idCol: String, textCol: String,
               queryPred: Column, k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    // memoized per session (Memo.scala): the q135 gate and the
    // retrieval-metrics gate run this IDENTICAL call, and each must stay
    // independently verifiable — the engine caches the deterministic
    // top-k (round-6 scores, id tie-breaks) instead of rebuilding the
    // posting lists from raw text per consumer. The key includes the
    // filtered-plan canonical form, so a different queryPred or k
    // computes its own ranking.
    rankMemo.getOrCompute(
      Seq(docs0.select(col(idCol), col(textCol)),
        docs0.filter(queryPred).select(col(idCol))),
      s"k=$k,k1=$k1,b=$b") {
      bm25TopKCompute(docs0, idCol, textCol, queryPred, k, k1, b)
    }

  private[graft] val rankMemo = new FrameMemo("bm25_topk")

  /** The un-memoized [[bm25TopK]] pipeline — plan-shape specs target
    * this directly (the memo hit is a parquet scan with no plan to
    * audit). */
  private[graft] def bm25TopKCompute(
      docs0: DataFrame, idCol: String, textCol: String,
      queryPred: Column, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val docs = Par.ensure(docs0)

    // (did, word, tf) postings — the one corpus-sized aggregation — plus
    // dl via a did-partitioned window (no join, partition = one doc)
    val toks = docs.select(col(idCol).as("did"),
        explode(Dedup.tokens(col(textCol))).as("word"))
      .groupBy("did", "word").agg(count(lit(1)).as("tf"))
      .withColumn("dl", sum(col("tf")).over(Window.partitionBy(col("did"))))

    val dfTab = toks.groupBy("word").agg(count(lit(1)).as("df"))
    // N counts ALL docs (empty ones too); avgdl = totalTokens / N
    val stats = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(toks.agg(sum(col("tf")).as("total_tokens")))

    // bounded: |queries| x |query terms|, then enriched with idf + avgdl
    // (df join is qterms-keyed — the vocab itself is never broadcast)
    val qterms = docs.filter(queryPred)
      .select(col(idCol).as("qid"),
        explode(array_distinct(Dedup.tokens(col(textCol)))).as("word"))
    val idf = log(
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)) + lit(1.0))
    val avgdl = col("total_tokens").cast("double") /
      col("n_docs").cast("double")
    val qtermsIdf = qterms.join(dfTab, Seq("word"))
      .crossJoin(broadcast(stats))
      .select(col("word"), col("qid"), idf.as("idf"), avgdl.as("avgdl"))

    val tfD = col("tf").cast("double")
    val term = col("idf") * tfD * lit(k1 + 1.0) /
      (tfD + lit(k1) * (lit(1.0) - lit(b) +
        lit(b) * col("dl").cast("double") / col("avgdl")))

    val scored = toks
      .join(broadcast(qtermsIdf), Seq("word"))
      .filter(col("did") =!= col("qid"))
      .groupBy("qid", "did")
      .agg(round(sum(term), 6).as("bm25"))

    val w = Window.partitionBy(col("qid"))
      .orderBy(col("bm25").desc, col("did"))
    scored.withColumn("rn", row_number().over(w).cast("int"))
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("did"), col("bm25"))
  }

  /** Reciprocal-rank fusion: merge per-query rankings into one list scored
    * by `sum over rankings r of 1 / (kConst + rank_r(d))` (Cormack et al.
    * — the standard way to combine lexical and vector retrieval without
    * score calibration). Each input must carry `(qid, did, rn)`; documents
    * absent from a ranking simply contribute nothing. The fused score is a
    * sum of at most `rankings.size` exactly-representable reciprocals —
    * `round(,6)` keeps the ranking convention; ties break on doc id.
    *
    * Scale shape: inputs are already top-k-bounded per query, so the union
    * + (qid, did) aggregation + per-query window all run over
    * |queries| × k × rankings rows — tiny next to the corpus work that
    * produced the rankings.
    */
  def rrfFuse(rankings: Seq[DataFrame], kConst: Int, topK: Int): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(kConst >= 1 && topK >= 1, "kConst and topK must be >= 1")
    val shaped = rankings.map(_.select(col("qid"), col("did"), col("rn")))
    val fused = shaped.reduce(_.unionByName(_))
      .groupBy("qid", "did")
      .agg(round(sum(lit(1.0) / (lit(kConst.toDouble) +
        col("rn").cast("double"))), 6).as("rrf_score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rrf_score").desc, col("did"))
    fused.withColumn("rn", row_number().over(w).cast("int"))
      .filter(col("rn") <= topK)
      .select(col("qid"), col("rn"), col("did"), col("rrf_score"))
  }

  /** Ranking-quality metrics for a retrieval run — the eval side of the
    * retrieval layer (retrieval QA before the rankings feed hard-negative
    * mining or RAG eval sets). For each query in `ranking` (`(qid, rn,
    * did)` rows, rn 1-based), judged against label agreement (a retrieved
    * doc is relevant iff its label IS NOT DISTINCT FROM the query's).
    * Labels-coverage contract: retrieved docs MISSING from `labels` are
    * judged non-relevant (they stay in the ranking with is_rel = 0);
    * queries missing from `labels` are excluded from the eval entirely
    * (there is nothing to judge against). Metrics per query:
    *
    *  - `n_rel`: relevant docs in the whole corpus (query itself
    *    excluded — it is never a candidate);
    *  - `hits`: relevant docs retrieved;
    *  - `rr`: reciprocal rank of the first relevant result, 0 if none
    *    (mean over queries = MRR);
    *  - `recall_at_k`: hits / min(k, n_rel), null when n_rel = 0;
    *  - `ndcg_at_k`: binary-gain DCG / ideal DCG with the standard
    *    1/log2(i+1) discount, null when n_rel = 0.
    *
    * Scale shape: the ranking table is |queries| × k by construction, so
    * every join here is bounded — doc labels attach id-keyed, the
    * per-label corpus totals are a dictionary-sized broadcast, and the
    * ideal-DCG sum is a ≤ k-element fold per query row. Only the label
    * lookup touches corpus-sized data, keyed on its id. `rr` and
    * `recall` are exact divisions; the log2 discounts are `round(,6)`
    * pinned. */
  def rankingMetrics(ranking: DataFrame, labels: DataFrame,
                     idCol: String, labelCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val lab = labels.select(col(idCol).as("_id"), col(labelCol).as("_lbl"))
    val relTotals = lab.groupBy(col("_lbl").as("_rlbl"))
      .agg(count(lit(1)).as("_cnt"))

    // doc labels attach with a LEFT join: a retrieved doc absent from the
    // labels table is judged NON-RELEVANT (is_rel = 0) instead of being
    // silently dropped from the query's ranking — an inner join here
    // would shrink hits/rr denominators invisibly and delete any query
    // whose whole top-k is unlabeled. Queries, by contrast, need a label
    // to be judged at all, so unlabeled queries stay excluded — that
    // join is deliberately inner.
    val j = ranking.select(col("qid"), col("rn"), col("did"))
      .join(lab.select(col("_id").as("did"), col("_lbl").as("_dlbl"),
        lit(1).as("_dhas")), Seq("did"), "left")
      .join(lab.select(col("_id").as("qid"), col("_lbl").as("_qlbl")),
        Seq("qid"))
      .withColumn("is_rel",
        when(col("_dhas").isNull, lit(0))
          .otherwise((col("_dlbl") <=> col("_qlbl")).cast("int")))

    val per = j.groupBy(col("qid"), col("_qlbl")).agg(
      sum(col("is_rel")).cast("long").as("hits"),
      min(when(col("is_rel") === 1, col("rn"))).as("first_rel"),
      sum(when(col("is_rel") === 1,
        lit(1.0) / log2(col("rn").cast("double") + lit(1.0)))
        .otherwise(lit(0.0))).as("dcg"))

    val m = least(lit(k.toLong), col("n_rel"))
    val idcg = aggregate(sequence(lit(1L), m), lit(0.0),
      (acc, i) => acc + lit(1.0) / log2(i.cast("double") + lit(1.0)))
    per
      .join(broadcast(relTotals), col("_qlbl") <=> col("_rlbl"), "left")
      .withColumn("n_rel", coalesce(col("_cnt"), lit(1L)) - lit(1L))
      .select(
        col("qid"), col("n_rel"), col("hits"),
        coalesce(lit(1.0) / col("first_rel").cast("double"), lit(0.0))
          .as("rr"),
        when(col("n_rel") > 0,
          round(col("hits").cast("double") / m.cast("double"), 6))
          .as("recall_at_k"),
        when(col("n_rel") > 0, round(col("dcg") / idcg, 6))
          .as("ndcg_at_k"))
  }

  /** Hybrid lexical + vector retrieval: BM25 over `docs` fused with
    * embedding-cosine over `emb` (joined on `docs.idCol` = `emb.vecIdCol`)
    * by reciprocal rank — each branch retrieves its own top-`poolK`, RRF
    * keeps the consensus top-`k`. The canonical RAG retrieval stack, here
    * as one operator so the branch plans stay independently optimal (the
    * BM25 branch never touches vectors, the ANN branch never touches
    * text). */
  def hybridTopK(docs: DataFrame, idCol: String, textCol: String,
                 emb: DataFrame, vecIdCol: String, vecCol: String,
                 docQueryPred: Column, embQueryPred: Column,
                 k: Int, poolK: Int,
                 kConst: Int = 60): DataFrame = {
    val lexical = bm25TopK(docs, idCol, textCol, docQueryPred, poolK)
      .select(col("qid"), col("did"), col("rn"))
    val vector = Similarity.bruteForceTopK(emb, vecIdCol, vecCol,
        embQueryPred, poolK)
      .select(col("qid"), col("neighbor_id").as("did"), col("rn"))
    rrfFuse(Seq(lexical, vector), kConst, k)
  }

  /** Exact-phrase search via positional posting-list intersection:
    * documents where the phrase's tokens appear CONSECUTIVELY, with
    * the occurrence count. This is how a search engine answers phrase
    * queries — intersect the phrase terms' positional postings with a
    * fixed offset between them — and the plan is the point at scale:
    * postings are FILTERED to the phrase's own terms before anything
    * joins, so a 100 TB corpus moves only the phrase's posting lists
    * (a prebuilt term-keyed positional index makes even the scan a
    * keyed probe; here one scan builds them inline). The naive form —
    * a regex scan of every document — touches all bytes instead.
    *
    * Joins chain on (doc, pos - i): term i must sit exactly i tokens
    * after term 0. Tokenization is a plain single-space split, matching
    * the corpus format. Output: (id, n_occurrences), matching docs
    * only. */
  def phraseOccurrences(docs0: DataFrame, idCol: String, textCol: String,
                        phrase: String): DataFrame = {
    val terms = phrase.trim.split("\\s+").toSeq
    require(terms.nonEmpty && terms.head.nonEmpty, "phrase must be non-empty")
    val docs = Par.ensure(docs0)
    val spark = docs.sparkSession
    import spark.implicits._
    val post = docs.select(col(idCol).as("doc"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
      .filter($"w".isin(terms: _*))
    val head = post.filter($"w" === terms.head).select($"doc", $"pos")
    val matched = terms.zipWithIndex.drop(1).foldLeft(head) {
      case (acc, (t, i)) =>
        acc.join(post.filter($"w" === t)
          .select($"doc", ($"pos" - i).as("pos")), Seq("doc", "pos"))
    }
    matched.groupBy($"doc")
      .agg(count(lit(1)).cast("long").as("n_occurrences"))
      .select($"doc".as(idCol), $"n_occurrences")
  }
}
