package graft.analytics

import Par.Mat

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: quality scoring,
  * language-ID heuristic, token counting, document fingerprinting.
  * (Extension surface per SURVEY.md §7 step 5; the reference's text handling
  * is limited to cleaning, main.py:57-95.)
  *
  * Every metric is integer/exact arithmetic or a single double division of
  * two integers, so the DuckDB oracle reproduces values bit-for-bit.
  */
object TextAnalysis {

  /** Whitespace token count: NULL for NULL text (matching SQL-engine
    * semantics so oracles agree), 0 for empty/whitespace-only text (a bare
    * `split` would report 1 because `split("") == [""]`). Empty fragments
    * are dropped explicitly: `trim` strips only ASCII spaces, so text
    * ending in a tab/newline would otherwise leave a trailing "" in the
    * split and overcount by one (the oracles all count the FILTERED list). */
  def nTokens(text: Column): Column =
    when(text.isNull, lit(null).cast("int"))
      .when(trim(text) === "", 0)
      .otherwise(size(filter(split(trim(text), "\\s+"), t => t =!= "")))

  /** BPE-ish token count: letter runs, digit runs, single other non-space. */
  val bpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def nBpeTokens(text: Column): Column =
    regexp_count(lower(text), lit(bpeishPattern))

  /** Punctuation count / ratio. */
  def nPunct(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  /** Stopword hits for a word set (word-boundary matches). */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    regexp_count(lower(text), lit("\\b(" + words.mkString("|") + ")\\b"))

  private val enStop = Seq("the", "a", "of", "and", "to", "in", "is")
  private val deStop = Seq("der", "die", "das", "und", "ist", "nicht")
  private val esStop = Seq("el", "la", "de", "que", "y", "en")
  private val frStop = Seq("le", "la", "les", "et", "est", "que")

  /** Quality metrics per document: token counts, avg token length, punct
    * ratio, stopword ratio, plus a categorical quality flag. */
  def quality(docs0: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docs = Par.ensure(docs0)
    val spark = docs.sparkSession
    import spark.implicits._
    val t = col(textCol)
    // nullif guards: empty/whitespace-only docs have length 0 / 0 tokens,
    // and Spark's Divide THROWS on /0 under default ANSI mode — ratios
    // degrade to null instead (real corpora are full of empty docs)
    val len  = nullif(length(t), lit(0))
    val ntok = nullif(nTokens(t), lit(0))
    docs.select(
      col(idCol),
      // counts as long: the cross-engine contract types counts BIGINT
      length(t).cast("long").as("n_chars"),
      nTokens(t).cast("long").as("n_tokens"),
      nBpeTokens(t).cast("long").as("n_bpe_tokens"),
      nPunct(t).cast("long").as("n_punct"),
      (nPunct(t).cast("double") / len).as("punct_ratio"),
      (stopwordHits(t, enStop).cast("double") / ntok).as("stopword_ratio"),
      when(nTokens(t) >= 10 && nPunct(t).cast("double") / len < lit(0.2),
           "ok").otherwise("low").as("quality"))
  }

  /** Language-ID heuristic: stopword-set scoring with deterministic argmax
    * (ties broken by fixed language order en > de > es > fr > und). */
  def langId(docs0: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docs = Par.ensure(docs0)
    val spark = docs.sparkSession
    import spark.implicits._
    val t = col(textCol)
    val en = stopwordHits(t, enStop)
    val de = stopwordHits(t, deStop)
    val es = stopwordHits(t, esStop)
    val fr = stopwordHits(t, frStop)
    val m  = greatest(en, de, es, fr)
    docs.select(
      col(idCol),
      en.cast("long").as("en_hits"), de.cast("long").as("de_hits"),
      es.cast("long").as("es_hits"), fr.cast("long").as("fr_hits"),
      when(m === 0, "und")
        .when(en === m, "en").when(de === m, "de")
        .when(es === m, "es").otherwise("fr").as("lang_guess"))
  }

  /** Language-ID confusion matrix: the [[langId]] detector evaluated
    * against the corpus's DECLARED language labels — per (declared,
    * detected) cell the count and its share of the declared row.
    * Detectors drift silently (new sources, new scripts); the
    * confusion matrix is the eval artifact that says WHICH languages
    * leak where (here: zh has no stopword set, so its row landing in
    * 'und'/misdetections is the finding, not a bug). Same shape as the
    * q239 model-eval loop: an operator's output audited against
    * ground truth.
    *
    * Shape: detection is map-side ([[langId]] expressions), then one
    * (declared, detected) keyed agg; row totals re-aggregate the CELLS
    * (language-dictionary-sized). Output: (declared, detected, n,
    * row_share). */
  def langConfusion(docs: DataFrame, declaredCol: String,
                    textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cells = langId(docs, declaredCol, textCol)
      .groupBy(col(declaredCol).as("declared"),
        col("lang_guess").as("detected"))
      .agg(count(lit(1)).cast("long").as("n"))
    val rowTot = cells.groupBy($"declared")
      .agg(sum($"n").cast("long").as("row_n"))
    cells.join(broadcast(rowTot), Seq("declared"))
      .select($"declared", $"detected", $"n",
        (round(Par.safeDiv($"n".cast("double"), $"row_n".cast("double"))
          * 1e6) / 1e6).as("row_share"))
  }

  /** Vocabulary coverage curve: what share of ALL corpus tokens the
    * top-k most frequent types cover, at the requested ranks — the
    * Zipf-tail readout that sizes tokenizer vocabularies and
    * stopword lists (English-like corpora cover ~50% with ~100
    * types). Ranks tie-break by word so the curve replays exactly.
    *
    * Shape: one word-keyed count agg absorbs raw volume; the top-k
    * selection is `orderBy.limit` — Spark's TakeOrderedAndProject,
    * a map-side partial top-k merged at the driver, NEVER a global
    * sort of the vocabulary (fine for k <= ~10^4; the vocab itself is
    * never assumed broadcastable) — and the rank/cumulative windows
    * run over the <= max(ks) surviving rows only. Output per k:
    * (k, top_k_tokens, total_tokens, coverage). */
  def vocabCoverage(docs: DataFrame, textCol: String,
                    ks: Seq[Int] = Seq(5, 10, 20)): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), "ranks must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val c = Par.ensure(docs)
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter($"word" =!= "")
      .groupBy($"word").agg(count(lit(1)).cast("long").as("cnt"))
    val tot = c.agg(sum($"cnt").cast("long").as("total_tokens"))
    val w = Window.orderBy($"cnt".desc, $"word")
    val ranked = c.orderBy($"cnt".desc, $"word").limit(ks.max)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("covered", sum($"cnt")
        .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
    ranked.filter($"rnk".isin(ks.map(_.toLong): _*))
      .join(broadcast(tot), lit(true))
      .select($"rnk".as("k"), $"covered".as("top_k_tokens"),
        $"total_tokens",
        (round(Par.safeDiv($"covered".cast("double"),
          $"total_tokens".cast("double")) * 1e6) / 1e6).as("coverage"))
  }

  /** Vocabulary richness and unseen mass: Good-Turing's estimate of
    * the probability the NEXT token is a never-seen type
    * (singletons/tokens) and the bias-corrected Chao1 estimate of how
    * many types exist beyond the sample
    * (types + n1(n1-1)/(2(n2+1)), always defined) — the "is this
    * corpus slice saturated" readout that tells a crawl whether more
    * of the same source still buys new vocabulary. Exact integer
    * frequency-of-frequency counts; one word-keyed agg then ONE 1-row
    * rollup. Output: 1 row (n_types, n_tokens, singletons, doubletons,
    * unseen_mass, chao1_types). */
  def vocabRichness(docs: DataFrame, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val c = Par.ensure(docs)
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter($"word" =!= "")
      .groupBy($"word").agg(count(lit(1)).cast("long").as("cnt"))
    val a = c.agg(
      count(lit(1)).cast("long").as("n_types"),
      sum($"cnt").cast("long").as("n_tokens"),
      sum(when($"cnt" === 1L, 1L).otherwise(0L)).cast("long")
        .as("singletons"),
      sum(when($"cnt" === 2L, 1L).otherwise(0L)).cast("long")
        .as("doubletons"))
    a.select($"n_types", $"n_tokens", $"singletons", $"doubletons",
      (round(Par.safeDiv($"singletons".cast("double"),
        $"n_tokens".cast("double")) * 1e6) / 1e6).as("unseen_mass"),
      (round(($"n_types".cast("double") +
        $"singletons".cast("double") * ($"singletons" - 1L) /
          (lit(2.0) * ($"doubletons" + 1L))) * 1e6) / 1e6)
        .as("chao1_types"))
  }

  /** Hill tail-index estimator over the word-frequency distribution:
    * `alpha = 1 + k / sum over top-k of ln(f_i / f_(k+1))` — the
    * order-statistics MLE for a power-law tail (Hill 1975; the Clauset
    * et al. recommendation over q155's log-log regression, whose slope
    * is biased by the head). The is-it-really-Zipf receipt: alpha ~ 2
    * for natural text; a synthetic or template-stuffed corpus drifts.
    *
    * Scale shape: one word-keyed agg absorbs the corpus; the top
    * (k+1) types arrive via a bounded TakeOrdered (map-side partial
    * top-k, ties to the lexicographically smaller word — never a
    * global vocab sort), and everything after runs over <= k+1 rows.
    * Log terms round to 9 and sum as scaled integers. A corpus with
    * fewer types shrinks k honestly; an all-tied top (sum 0) nulls
    * alpha. Output: 1 row (n_types, k_used, xmin, sum_log, alpha). */
  def hillEstimator(docs: DataFrame, textCol: String,
                    k: Int = 100): DataFrame = {
    require(k >= 2, "need k >= 2")
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val c = Par.ensure(docs)
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter($"word" =!= "")
      .groupBy($"word").agg(count(lit(1)).cast("long").as("cnt"))
    val nTypes = c.agg(count(lit(1)).cast("long").as("n_types"))
    val top = c.orderBy($"cnt".desc, $"word").limit(k + 1)
    val wr = Window.orderBy($"cnt".desc, $"word")
    val r = top.withColumn("rn", row_number().over(wr))
    val thr = r.crossJoin(broadcast(r.agg(max($"rn").as("m"))))
      .filter($"rn" === $"m")
      .select($"cnt".as("xmin"), $"m")
    val agg = r.crossJoin(broadcast(thr))
      .filter($"rn" < $"m")
      .agg(max($"m").as("m"), max($"xmin").as("xmin"),
        sum(round(log($"cnt".cast("double") /
          $"xmin".cast("double")) * 1e9).cast("long")).as("slog"))
    agg.crossJoin(broadcast(nTypes))
      .select($"n_types", ($"m" - 1).cast("long").as("k_used"),
        $"xmin",
        (round($"slog" / 1e9 * 1e6) / 1e6).as("sum_log"),
        (round((lit(1.0) + ($"m" - 1).cast("double") /
          when($"slog" > 0L, $"slog" / 1e9)) * 1e6) / 1e6).as("alpha"))
  }

  /** The composed corpus-cleaning decision — what a training-data pipeline
    * actually ships: exact-dup removal + quality gate + language gate fused
    * into ONE scan and ONE exchange. All flag expressions evaluate in the
    * scan projection; the only shuffle is the dedup window keyed on the
    * md5 fingerprint and carrying ~50 bytes/row (never the text). Verdict
    * precedence mirrors pipeline practice: drop dups first (cheapest
    * signal), then quality, then language.
    */
  /** Per-source corpus scorecard — the domain-curation rollup every
    * crawl pipeline runs before deciding which SOURCES (domains,
    * feeds, dumps) to keep, upweight, or drop wholesale: per source,
    * document count, exact-duplicate rate (the q46 min-id-per-
    * fingerprint rule — a source full of dups is a mirror), mean
    * tokens per doc (thin-content signal), and the source's share of
    * total corpus tokens (what dropping it would actually cost).
    *
    * Scale shape: one scan computes fingerprints and token counts
    * map-side; the dup flag is the ~50-byte/row fingerprint window
    * (text never shuffles); the rollup is one source-keyed agg joined
    * against the broadcast ONE-ROW corpus token total (the q77
    * bracket). Output: (source, n_docs, dup_rate, mean_tokens,
    * token_share), rates rounded 6 via the scaled-double pattern. */
  def sourceScorecard(docs0: DataFrame, idCol: String, textCol: String,
                      sourceCol: String): DataFrame = {
    val docs = Par.ensure(docs0)
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val t = col(textCol)
    val flagged = docs.select(col(sourceCol).as("source"), col(idCol),
        md5(t).as("fp"), nTokens(t).cast("long").as("ntok"))
      .withColumn("is_dup",
        when(col(idCol) =!= min(col(idCol)).over(Window.partitionBy($"fp")),
          1L).otherwise(0L))
    val perSource = flagged.groupBy($"source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum($"is_dup").cast("long").as("n_dups"),
        sum($"ntok").cast("long").as("toks"))
    val total = perSource.agg(sum($"toks").cast("long").as("total_toks"))
    perSource.crossJoin(broadcast(total))
      .select($"source", $"n_docs",
        (round($"n_dups".cast("double") /
          when($"n_docs" > 0, $"n_docs".cast("double")) * 1e6) / 1e6)
          .as("dup_rate"),
        (round($"toks".cast("double") /
          when($"n_docs" > 0, $"n_docs".cast("double")) * 1e6) / 1e6)
          .as("mean_tokens"),
        (round($"toks".cast("double") /
          when($"total_toks" > 0, $"total_toks".cast("double")) * 1e6) / 1e6)
          .as("token_share"))
  }

  def corpusFilter(docs0: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docs = Par.ensure(docs0)
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val flagged = corpusFlags(docs, textCol).select(
      col(idCol), col("fp"), col("q_ok"), col("lang_guess"))
    val verdict =
      when(col(idCol) =!= min(col(idCol)).over(Window.partitionBy($"fp")), "dup")
        .when(!$"q_ok", "low_quality")
        .when($"lang_guess" =!= "en", "non_en")
        .otherwise("keep")
    flagged
      .select(col(idCol), verdict.as("verdict"),
              when(verdict === "keep", 1).otherwise(0).as("keep"))
  }

  /** The fused per-row gate flags behind [[corpusFilter]] — fingerprint,
    * quality, language guess — as ADDED columns `fp`, `q_ok`,
    * `lang_guess`, so the same expressions serve the batch verdict and
    * the streaming ingest gate ([[graft.streaming.CorpusIngest]]). The
    * names are RESERVED: an input column of the same name is replaced
    * (`lang_guess` rather than `lang` precisely so a source-metadata
    * `lang` column — the documents table has one — survives untouched).
    * Pure map-side; safe on a streaming DataFrame. */
  def corpusFlags(docs: DataFrame, textCol: String): DataFrame = {
    val t  = col(textCol)
    val en = stopwordHits(t, enStop)
    val de = stopwordHits(t, deStop)
    val es = stopwordHits(t, esStop)
    val fr = stopwordHits(t, frStop)
    val m  = greatest(en, de, es, fr)
    val lang = when(m === 0, "und")
      .when(en === m, "en").when(de === m, "de")
      .when(es === m, "es").otherwise("fr")
    val qualityOk =
      nTokens(t) >= 10 &&
        nPunct(t).cast("double") / nullif(length(t), lit(0)) < lit(0.2)
    docs.withColumn("fp", md5(t))
      .withColumn("q_ok", qualityOk)
      .withColumn("lang_guess", lang)
  }

  /** Within-document repetition (Gopher-style boilerplate signal): the
    * fraction of a document's word n-grams that are repeats of an earlier
    * n-gram in the same document. Entirely map-side — the shingle array
    * never leaves its row, nothing shuffles. Documents shorter than n
    * tokens (0 n-grams) get a null ratio; null text propagates null. */
  def repetition(docs0: DataFrame, idCol: String, textCol: String,
                 n: Int = 3): DataFrame = {
    val docs = Par.ensure(docs0)
    val t = col(textCol)
    val total = when(t.isNull, lit(null).cast("long"))
      .otherwise(greatest(nTokens(t).cast("long") - (n - 1), lit(0L)))
    val distinct =
      size(graft.functions.WordNgrams.wordNgrams(t, n)).cast("long")
    docs.select(
      col(idCol),
      total.as("n_ngrams"),
      distinct.as("n_distinct"),
      round(lit(1.0) - distinct.cast("double") /
        nullif(total, lit(0L)).cast("double"), 6).as("rep_ratio"))
  }

  /** PII redaction patterns — RE2-compatible (shared with SQL oracles):
    * email, then phone (emails are replaced first so their digit runs
    * can't also match as phones). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9() \\-]{6,}[0-9]"

  /** Redact emails/phone numbers to typed placeholder tokens — the scrub a
    * training pipeline applies before text ships. Pure map-side
    * `regexp_replace` chain (codegen'd, no UDF). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** Pre-redaction PII hit counts (audit metric per document). */
  def piiCounts(docs0: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docs = Par.ensure(docs0)
    val t = col(textCol)
    docs.select(
      col(idCol),
      regexp_count(t, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(regexp_replace(t, EmailRe, "<EMAIL>"), lit(PhoneRe))
        .cast("long").as("n_phones"),
      redactPii(t).as("redacted"))
  }

  /** Document fingerprint: md5 of the whitespace-normalized, lowercased text,
    * plus a 16-way shard bucket derived from the first hex nibble. */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val norm = regexp_replace(trim(lower(col(textCol))), "\\s+", " ")
    docs.select(
      col(idCol),
      md5(norm).as("fp"),
      substring(md5(norm), 1, 1).as("shard"))
  }

  /** Per-document (doc, word) occurrence counts over [[Dedup.tokens]] — the
    * shared base of the vocabulary/OOV/surprisal family. One explode plus
    * one (doc, word)-keyed aggregation with map-side partials; the text
    * column itself never shuffles (only tokens do). */
  private def docWordCounts(docs: DataFrame, idCol: String,
                            textCol: String): DataFrame =
    docs.select(col(idCol).as("did"),
        explode(Dedup.tokens(col(textCol))).as("word"))
      .groupBy("did", "word").agg(count(lit(1)).as("n"))

  /** Corpus vocabulary: the top-N words by corpus occurrence count, ties
    * broken lexicographically — the vocabulary-construction step of a
    * tokenizer/coverage pipeline. Scale shape: the word-keyed count
    * aggregation is partial-aggregable (map-side combine), and the top-N
    * is a bounded TakeOrdered — N rows reach the driver, never the corpus.
    * The rank window runs over those N rows only (bounded by
    * construction, so the single-partition WindowExec is fine). */
  def vocabulary(docs0: DataFrame, idCol: String, textCol: String,
                 topN: Int): DataFrame = {
    require(topN >= 1, "topN must be >= 1")
    val docs = Par.ensure(docs0)
    import org.apache.spark.sql.expressions.Window
    docs.select(explode(Dedup.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word")).limit(topN)
      .withColumn("vocab_rank",
        row_number().over(Window.orderBy(col("c").desc, col("word")))
          .cast("int"))
  }

  /** Zipf fit of the corpus frequency-rank curve: OLS slope/intercept of
    * `ln(freq)` on `ln(rank)` over the top-N vocabulary — the one-glance
    * corpus-health diagnostic (natural text sits near slope −1; a flat
    * slope means synthetic/templated text, a cliff means boilerplate
    * domination). Rides [[vocabulary]]'s distributed top-N (TakeOrdered,
    * never a full-vocab window), so the regression runs over a table
    * bounded at N rows regardless of vocabulary size; the OLS moments are
    * one partial-aggregable `regr_slope`/`regr_intercept` pass.
    *
    * Output: 1 row (n_words, zipf_slope, log_intercept). */
  def zipfSlope(docs0: DataFrame, idCol: String, textCol: String,
                topN: Int = 1000): DataFrame =
    vocabulary(docs0, idCol, textCol, topN)
      .select(log(col("vocab_rank").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
      .agg(count(lit(1)).cast("long").as("n_words"),
        round(expr("regr_slope(y, x)"), 6).as("zipf_slope"),
        round(expr("regr_intercept(y, x)"), 6).as("log_intercept"))

  /** Per-document out-of-vocabulary rate against the top-N corpus
    * vocabulary — the tokenizer-coverage gate of a training pipeline
    * (docs full of unknown tokens are dropped or routed to vocab
    * expansion). The vocab side is bounded by N, so it broadcasts; the
    * fact side pays one (doc, word) aggregation and one doc-keyed final
    * aggregation. `oov_rate` is a single int/int division — bit-exact
    * cross-engine. Docs with no tokens keep n_tokens=0 and a null rate. */
  def oovRate(docs0: DataFrame, idCol: String, textCol: String,
              topN: Int): DataFrame = {
    val docs = Par.ensure(docs0)
    val vocab = vocabulary(docs0, idCol, textCol, topN).select(col("word"))
      .withColumn("in_vocab", lit(1))
    val perDoc = docWordCounts(docs, idCol, textCol)
      .join(broadcast(vocab), Seq("word"), "left")
      .groupBy("did").agg(
        sum(col("n")).as("nt"),
        sum(when(col("in_vocab").isNotNull, col("n")).otherwise(lit(0L)))
          .as("iv"))
    docs.select(col(idCol))
      .join(perDoc.withColumnRenamed("did", idCol), Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("nt"), lit(0L)).cast("long").as("n_tokens"),
        (coalesce(col("nt"), lit(0L)) - coalesce(col("iv"), lit(0L)))
          .cast("long").as("n_oov"),
        ((coalesce(col("nt"), lit(0L)) - coalesce(col("iv"), lit(0L)))
          .cast("double") /
          nullif(coalesce(col("nt"), lit(0L)), lit(0L))).as("oov_rate"))
  }

  /** CCNet-style unigram-LM surprisal score: the per-document mean of
    * −ln p(w), with p(w) the corpus MLE unigram probability c(w)/T. High
    * scores mark rare-word-heavy documents — the perplexity-proxy quality
    * filter of CCNet/C4-class pipelines (swap in a real LM when one is
    * available; the plan shape is identical). Scale shape: per-(doc, word)
    * counts partial-aggregate before their one shuffle; the corpus
    * frequency table joins word-keyed (NOT assumed broadcastable — at
    * web scale the vocabulary alone can exceed the broadcast budget, so
    * this stays a shuffled equi-join that AQE may downgrade to broadcast
    * when small); T is a one-row aggregate broadcast via crossJoin. The
    * doc-word subtree feeds both join sides and is planned once via
    * exchange reuse. `round(,6)` absorbs cross-engine summation-order
    * ulps in the double sum (counts and the division itself are exact). */
  def unigramSurprisal(docs0: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val docs = Par.ensure(docs0)
    val dw = docWordCounts(docs, idCol, textCol)
    val wf = dw.groupBy("word").agg(sum(col("n")).as("c"))
    val tot = wf.agg(sum(col("c")).as("t"))
    val scored = dw.join(wf, Seq("word"))
      .crossJoin(broadcast(tot))
      .groupBy("did").agg(
        sum(col("n")).as("nt"),
        sum(col("n").cast("double") *
          -log(col("c").cast("double") / col("t").cast("double"))).as("s"))
    docs.select(col(idCol))
      .join(scored.withColumnRenamed("did", idCol), Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("nt"), lit(0L)).cast("long").as("n_tokens"),
        when(col("nt") > 0,
          round(col("s") / col("nt").cast("double"), 6))
          .as("avg_surprisal"))
  }

  /** Per-document mean bigram surprisal −ln P(w2|w1) under the corpus MLE
    * bigram model, P(w2|w1) = c(w1,w2) / Σ_w c(w1,w) — one model order up
    * from [[unigramSurprisal]], the shape of the CCNet/KenLM perplexity
    * filter (scoring the corpus under its own model, so every observed
    * bigram has c >= 1 and no backoff is needed). Docs with < 2 tokens
    * have no bigrams: count 0, score null.
    *
    * Scale shape: the per-(doc, bigram) counts shuffle once and the
    * subtree feeds BOTH the model aggregation and the scoring join
    * (exchange reuse, as in unigramSurprisal); the prefix-count table is
    * an aggregate of the model table, never a second corpus pass.
    * `round(,6)` absorbs cross-engine summation-order ulps. */
  def bigramSurprisal(docs0: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val docs = Par.ensure(docs0)
    val db = docs
      .select(col(idCol).as("did"), Dedup.tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("did"), explode(transform(
        sequence(lit(1), size(col("t")) - 1),
        i => struct(element_at(col("t"), i).as("w1"),
                    element_at(col("t"), i + 1).as("w2")))).as("bg"))
      .select(col("did"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("did", "w1", "w2").agg(count(lit(1)).as("n"))
    val bf = db.groupBy("w1", "w2").agg(sum(col("n")).as("c"))
    val pf = bf.groupBy("w1").agg(sum(col("c")).as("p"))
    val sc = db.join(bf, Seq("w1", "w2")).join(pf, Seq("w1"))
      .groupBy("did").agg(
        sum(col("n")).as("nb"),
        sum(col("n").cast("double") *
          -log(col("c").cast("double") / col("p").cast("double"))).as("s"))
    docs.select(col(idCol))
      .join(sc.withColumnRenamed("did", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("nb"), lit(0L)).cast("long").as("n_bigrams"),
        when(col("nb") > 0, round(col("s") / col("nb").cast("double"), 6))
          .as("avg_surprisal"))
  }

  /** Stupid-Backoff bigram surprisal with a REAL train/score split — the
    * backoff actually fires, unlike [[bigramSurprisal]]'s self-scored
    * model where every observed bigram has c >= 1. The model (bigram
    * counts c(w1,w2), prefix counts c(w1·), unigram counts c(w), total T)
    * is trained on the md5-hashed `trainFrac` of documents (the
    * [[Sampling]] threshold pattern — deterministic, partition-invariant)
    * and EVERY document is scored under it:
    * `S(w2|w1) = c(w1,w2)/c(w1·)` when the train model saw the bigram,
    * else `alpha · c(w2)/T` (Brants et al. 2007's score, alpha = 0.4),
    * with unseen words floored at c = 1. Output per doc: bigram count,
    * the fraction of bigram occurrences that backed off (an OOV-ish
    * novelty signal in its own right), and mean −ln S rounded to 6.
    * Docs with < 2 tokens score null.
    *
    * Scale shape: two corpus scans (doc-bigram counts, train word
    * counts), each partial-aggregated before its one shuffle; all model
    * joins are word-keyed shuffled equi-joins (vocabulary NOT assumed
    * broadcastable, as in [[unigramSurprisal]] — AQE downgrades to
    * broadcast when small); T is a 1-row broadcast. Nothing corpus-sized
    * ever sits in a window or on the driver. */
  /** The md5-threshold train-split predicate the bigram-LM family
    * shares (deterministic, partition-invariant — the [[Sampling]]
    * pattern). */
  private def trainPredicate(idCol: String, trainFrac: Double): Column =
    substring(md5(col(idCol).cast("string")), 1, 8) <
      lit(Sampling.hexThreshold(trainFrac))

  /** Train-tagged per-(doc, bigram) counts `(did, tr, w1, w2, n)` — the
    * shared prologue of [[stupidBackoffSurprisal]] and
    * [[kneserNeySurprisal]]: ONE tokenization, one (doc, bigram)
    * partial-agg exchange, feeding both each model's aggregation and
    * its scoring join. Kept in one place so a tokenization or
    * train-split fix can never desynchronize the two LM gates. */
  private def docBigramCounts(docs: DataFrame, idCol: String,
                              textCol: String,
                              trainFrac: Double): DataFrame =
    docs
      .select(col(idCol).as("did"),
        trainPredicate(idCol, trainFrac).as("tr"),
        Dedup.tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("did"), col("tr"), explode(transform(
        sequence(lit(1), size(col("t")) - 1),
        i => struct(element_at(col("t"), i).as("w1"),
                    element_at(col("t"), i + 1).as("w2")))).as("bg"))
      .select(col("did"), col("tr"), col("bg.w1").as("w1"),
        col("bg.w2").as("w2"))
      .groupBy("did", "tr", "w1", "w2").agg(count(lit(1)).as("n"))

  def stupidBackoffSurprisal(docs0: DataFrame, idCol: String,
                             textCol: String, alpha: Double = 0.4,
                             trainFrac: Double = 0.5): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    require(trainFrac > 0.0 && trainFrac <= 1.0,
      "trainFrac must be in (0, 1]")
    val docs = Par.ensure(docs0)
    val isTrain = trainPredicate(idCol, trainFrac)
    val db = docBigramCounts(docs, idCol, textCol, trainFrac)
    val bf = db.filter(col("tr")).groupBy("w1", "w2")
      .agg(sum(col("n")).as("c12"))
    val pf = bf.groupBy("w1").agg(sum(col("c12")).as("c1"))
    // unigram model: raw word counts over train docs (every token, not
    // the bigram table's prefix-truncated counts)
    val uf = docs.filter(isTrain)
      .select(explode(Dedup.tokens(col(textCol))).as("w2"))
      .groupBy("w2").agg(count(lit(1)).as("cw"))
    val tot = uf.agg(sum(col("cw")).as("t"))
    val prob = when(col("c12").isNotNull,
        col("c12").cast("double") / col("c1").cast("double"))
      .otherwise(lit(alpha) *
        coalesce(col("cw"), lit(1L)).cast("double") / col("t").cast("double"))
    val sc = db.join(bf, Seq("w1", "w2"), "left")
      .join(pf, Seq("w1"), "left")
      .join(uf, Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      .groupBy("did").agg(
        sum(col("n")).as("nb"),
        sum(when(col("c12").isNull, col("n")).otherwise(lit(0L))).as("nbk"),
        sum(col("n").cast("double") * -log(prob)).as("s"))
    docs.select(col(idCol))
      .join(sc.withColumnRenamed("did", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("nb"), lit(0L)).cast("long").as("n_bigrams"),
        when(col("nb") > 0,
          round(col("nbk").cast("double") / col("nb").cast("double"), 6))
          .as("backoff_rate"),
        when(col("nb") > 0, round(col("s") / col("nb").cast("double"), 6))
          .as("avg_surprisal"))
  }

  /** Interpolated Kneser-Ney bigram surprisal — the canonical
    * count-based LM smoothing (Kneser & Ney 1995; the standard against
    * which Stupid Backoff was benchmarked), with the same md5-half
    * train/score split as [[stupidBackoffSurprisal]]:
    *
    * `P(w2|w1) = max(c(w1,w2) − d, 0)/c(w1·)
    *             + d · N1+(w1,·)/c(w1·) · Pcont(w2)`
    *
    * where `Pcont(w2) = N1+(·,w2) / N1+(··)` is the CONTINUATION
    * probability — how many distinct contexts w2 completes, not how
    * often it occurs (the insight that makes "francisco" cheap despite
    * its frequency). Unseen prefixes fall back to `Pcont(w2)` alone;
    * unseen continuations floor at `1/N1+(··)` (the [[
    * stupidBackoffSurprisal]] unseen-word rule). Everything is exact
    * integer-count ratios combined in a FIXED expression order, so the
    * DuckDB oracle reproduces the doubles bit-for-bit; only the final
    * per-doc mean is round(,6).
    *
    * Output per doc: bigram count, unseen rate (fraction of bigram
    * occurrences the train model never saw — full or partial backoff),
    * mean −ln P. Docs with < 2 tokens score null.
    *
    * Scale shape: identical to [[stupidBackoffSurprisal]] — the
    * (doc, bigram) counts shuffle once and feed both the model
    * aggregation and the scoring join; all model tables (pair counts,
    * prefix totals + fan-outs, continuation counts) are aggregates of
    * that one table, word-keyed joins back (vocabulary NOT assumed
    * broadcastable); the distinct-bigram total is a 1-row broadcast. */
  def kneserNeySurprisal(docs0: DataFrame, idCol: String,
                         textCol: String, discount: Double = 0.75,
                         trainFrac: Double = 0.5): DataFrame = {
    require(discount > 0.0 && discount < 1.0, "discount must be in (0, 1)")
    require(trainFrac > 0.0 && trainFrac <= 1.0,
      "trainFrac must be in (0, 1]")
    val docs = Par.ensure(docs0)
    val db = docBigramCounts(docs, idCol, textCol, trainFrac)
    // train model: every table below is an aggregate of bf — the corpus
    // is never re-scanned
    val bf = db.filter(col("tr")).groupBy("w1", "w2")
      .agg(sum(col("n")).as("c12"))
    // per-prefix total AND fan-out from one pass over the pair table
    val pf = bf.groupBy("w1")
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1p"))
    val cc = bf.groupBy("w2").agg(count(lit(1)).as("n1c"))
    val nbi = bf.agg(count(lit(1)).as("nbi"))
    val d = lit(discount)
    val pcont = coalesce(col("n1c"), lit(1L)).cast("double") /
      nullif(col("nbi").cast("double"), lit(0.0))
    val prob = when(col("c1").isNotNull,
        greatest(coalesce(col("c12"), lit(0L)).cast("double") - d, lit(0.0)) /
          col("c1").cast("double") +
        d * col("n1p").cast("double") / col("c1").cast("double") * pcont)
      .otherwise(pcont)
    val sc = db.join(bf, Seq("w1", "w2"), "left")
      .join(pf, Seq("w1"), "left")
      .join(cc, Seq("w2"), "left")
      .crossJoin(broadcast(nbi))
      .groupBy("did").agg(
        sum(col("n")).as("nb"),
        sum(when(col("c12").isNull, col("n")).otherwise(lit(0L))).as("nun"),
        sum(col("n").cast("double") * -log(prob)).as("s"))
    docs.select(col(idCol))
      .join(sc.withColumnRenamed("did", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("nb"), lit(0L)).cast("long").as("n_bigrams"),
        when(col("nb") > 0,
          round(col("nun").cast("double") / col("nb").cast("double"), 6))
          .as("unseen_rate"),
        when(col("nb") > 0, round(col("s") / col("nb").cast("double"), 6))
          .as("avg_surprisal"))
  }

  /** Character-entropy gibberish filter: per-doc Shannon entropy of the
    * non-whitespace character distribution, via the count identity
    * `H = log2(n) − (Σ k_c·log2 k_c)/n` — exact integer counts into a
    * FIXED double expression, so the oracle reproduces it bit-for-bit
    * (round(,6) only on the emitted entropy). Low entropy flags
    * repeated-character spam ("aaaa…", ASCII-art padding); anomalously
    * high entropy flags base64/hex blobs and binary-in-text — the two
    * tails a compression-based quality gate trims. Whitespace is the
    * explicit `[ \t\n\x0B\f\r]` class (the [[scriptRatios]] rule — bare
    * `\s` diverges between regex engines). Docs with no non-whitespace
    * characters emit n_chars 0 with null entropy.
    *
    * Scale shape: one explode → (doc, char)-keyed partial agg (each
    * partition pre-compresses to ≤ alphabet-size rows per doc before
    * the exchange) → one doc-keyed agg; nothing corpus-sized on the
    * driver, no windows. Output: (id, n_chars, n_distinct, entropy). */
  def charEntropy(docs0: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val docs = Par.ensure(docs0)
    val ws = Seq(" ", "\t", "\n", "\u000B", "\f", "\r", "")
    val ch = docs.select(col(idCol).as("did"),
        explode(filter(split(col(textCol), ""),
          c => !c.isin(ws: _*))).as("c"))
      .groupBy("did", "c").agg(count(lit(1)).as("k"))
    val sc = ch.groupBy("did").agg(
        sum(col("k")).as("n"),
        count(lit(1)).as("nd"),
        sum(col("k").cast("double") * log2(col("k").cast("double")))
          .as("slk"))
      .select(col("did"), col("n"), col("nd"),
        round(log2(col("n").cast("double")) -
          col("slk") / col("n").cast("double"), 6).as("entropy"))
    docs.select(col(idCol))
      .join(sc.withColumnRenamed("did", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n"), lit(0L)).cast("long").as("n_chars"),
        coalesce(col("nd"), lit(0L)).cast("long").as("n_distinct"),
        col("entropy"))
  }

  /** Unicode-script character ratios + dominant script — the lang-id
    * pre-filter that works where stopword scoring is blind (CJK,
    * Cyrillic, mixed-script spam). Counts are per CHARACTER CLASS via
    * explicit code-point ranges (`\x{…}` syntax, the form Java regex and
    * RE2 read identically — named script classes differ between the
    * engines); ratios are over non-whitespace characters, where
    * whitespace is the EXPLICIT class `[ \t\n\x0B\f\r]` — bare `\s`
    * itself diverges (Java includes U+000B, RE2 does not). Dominant
    * script is the argmax with ties broken latin > cyrillic > cjk,
    * "und" for empty docs. Entirely map-side. */
  /** Per-group vocabulary drift: KL(P_group || P_corpus) over the
    * unigram distributions — the corpus-monitoring statistic that flags
    * a source whose word mix diverges from the blend (new crawl snapshot
    * gone weird, a source drifting into boilerplate). Restricted to
    * words the group actually uses (p_g > 0), where the corpus
    * probability is also > 0, so no smoothing is needed and the sum is
    * a true KL. Also emits token and distinct-word counts per group.
    *
    * Scale shape: one (group, word) aggregation feeds the group totals,
    * the corpus word table, and the scoring join — MATERIALIZED,
    * because the four consumers' plans differ (join-pushed not-null
    * filters break exchange-reuse canonical equality, verified in the
    * physical plan: four full tokenize+explode+agg subtrees, zero
    * ReusedExchange), so a lazy grid re-tokenized the corpus per
    * consumer; the word-keyed corpus join is never assumed
    * broadcastable; the 1-row corpus total rides the allowlisted
    * crossJoin(broadcast). Raw text is tokenized exactly once.
    * Output is group-cardinality-sized. round(,6) absorbs sum-order
    * ulps in the KL sum (all ratios are exact-count divisions). */
  def vocabDrift(docs0: DataFrame, textCol: String,
                 groupCol: String): DataFrame = {
    import Par.Mat
    val docs = Par.ensure(docs0)
    val sw = docs.select(col(groupCol).as("grp"),
        explode(Dedup.tokens(col(textCol))).as("word"))
      .groupBy("grp", "word").agg(count(lit(1)).as("c"))
      .materialized()
    val st = sw.groupBy("grp").agg(sum(col("c")).as("t"))
    val cw = sw.groupBy("word").agg(sum(col("c")).as("cw"))
    val ct = cw.agg(sum(col("cw")).cast("double").as("tt"))
    val ps = col("c").cast("double") / col("t").cast("double")
    val pc = col("cw").cast("double") / col("tt")
    sw.join(st, Seq("grp")).join(cw, Seq("word"))
      .crossJoin(broadcast(ct))
      .groupBy(col("grp"), col("t"))
      .agg(count(lit(1)).as("n_distinct"),
        round(sum(ps * log(ps / pc)), 6).as("kl_vs_corpus"))
      .select(col("grp").as(groupCol), col("t").as("n_tokens"),
        col("n_distinct"), col("kl_vs_corpus"))
  }

  /** Per-language tokenizer fertility: the corpus-level subword-per-word
    * ratio (BPE-ish tokens / whitespace words) plus chars-per-subword —
    * the standard measure of how expensively a tokenizer encodes each
    * language (fertility ≫ 1 marks languages the vocab underserves; the
    * basis for vocab-budget and sampling-temperature decisions). Scale
    * shape: one map-side projection of three counters per document, one
    * partial-aggregable groupBy(lang) — the text column never shuffles,
    * only 3 longs per row do. All emitted ratios are single long/long
    * double divisions of exactly-represented sums — bit-equal
    * cross-engine, no rounding needed. */
  def fertility(docs0: DataFrame, idCol: String, textCol: String,
                langCol: String): DataFrame = {
    val docs = Par.ensure(docs0)
    val t = col(textCol)
    docs
      .select(col(langCol).as("lang"), nTokens(t).cast("long").as("w"),
        nBpeTokens(t).cast("long").as("bt"),
        length(t).cast("long").as("nc"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w")).as("n_words"),
        sum(col("bt")).as("n_bpe_tokens"),
        sum(col("nc")).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_words"),
        col("n_bpe_tokens"),
        (col("n_bpe_tokens").cast("double") /
          nullif(col("n_words"), lit(0L))).as("fertility"),
        (col("n_chars").cast("double") /
          nullif(col("n_bpe_tokens"), lit(0L))).as("chars_per_token"))
  }

  def scriptRatios(docs0: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docs = Par.ensure(docs0)
    val t = col(textCol)
    val nonSpace =
      nullif(length(regexp_replace(t, "[ \\t\\n\\x0B\\f\\r]", "")), lit(0))
    def cnt(cls: String) = regexp_count(t, lit(cls))
    val latin = cnt("[A-Za-z]")
    val cyr   = cnt("[\\x{0400}-\\x{04FF}]")
    val cjk   = cnt("[\\x{4E00}-\\x{9FFF}]")
    val m = greatest(latin, cyr, cjk)
    val dominant = when(nonSpace.isNull || m === 0, "und")
      .when(latin === m, "latin")
      .when(cyr === m, "cyrillic")
      .otherwise("cjk")
    docs.select(
      col(idCol),
      (latin.cast("double") / nonSpace).as("latin_ratio"),
      (cyr.cast("double") / nonSpace).as("cyrillic_ratio"),
      (cjk.cast("double") / nonSpace).as("cjk_ratio"),
      dominant.as("script"))
  }

  /** Perplexity-percentile gate: keep documents whose mean unigram
    * surprisal sits at or below the corpus `p`-quantile — the CCNet
    * "head/middle" selection, where the threshold is data-driven rather
    * than fixed. The threshold is ONE row (exact interpolated percentile,
    * round-6 like the scores) broadcast back over the scored corpus;
    * docs with no tokens have a null score and fail closed.
    *
    * Scale note: `percentile` is an exact aggregate — it buffers the
    * score column per partition, which is fine while scores fit executor
    * memory (they are doc-count-sized, not corpus-sized); at extreme doc
    * counts swap in `approx_percentile` at the same call site. */
  def surprisalGate(docs0: DataFrame, idCol: String, textCol: String,
                    p: Double = 0.75): DataFrame = {
    require(p > 0.0 && p < 1.0, "p must be in (0, 1)")
    // checkpoint: scores feeds the threshold aggregate AND the output
    // projection — without it the scoring join runs twice per action
    val scores = unigramSurprisal(docs0, idCol, textCol).materialized()
    val thr = scores.filter(col("avg_surprisal").isNotNull)
      .agg(round(expr(s"percentile(avg_surprisal, $p)"), 6).as("thr"))
    scores.crossJoin(broadcast(thr))
      .select(col(idCol), col("avg_surprisal"),
        coalesce(col("avg_surprisal") <= col("thr"), lit(false)).as("keep"))
  }

  /** [[surprisalGate]] scored under a CALLER-SUPPLIED language model
    * instead of the corpus MLE: `model` is a `(word, logp)` table —
    * ln-probabilities from a real LM (KenLM dump, tokenizer-vocab
    * unigram table, domain LM) — and completes the CCNet story whose
    * plan shape [[unigramSurprisal]] documents: score the corpus under
    * an EXTERNAL model, gate at the corpus `p`-quantile. Every token
    * contributes: in-model words score −logp, out-of-vocabulary words
    * score −`oovLogp` (the model's floor/backoff mass), so the mean is
    * over ALL tokens and OOV-heavy docs rank as the low-quality tail
    * instead of being silently excused. Empty docs score null and fail
    * closed.
    *
    * Scale shape: identical to [[unigramSurprisal]] except the model
    * join — `broadcastModel=true` (default) pins a broadcast hint for
    * vocabulary-sized models; set it false for web-scale models, where
    * the word-keyed shuffled equi-join is the right plan (AQE may still
    * downgrade it to broadcast when the model turns out small). */
  def externalSurprisalGate(docs0: DataFrame, idCol: String,
                            textCol: String, model: DataFrame,
                            oovLogp: Double, p: Double = 0.75,
                            broadcastModel: Boolean = true): DataFrame = {
    require(p > 0.0 && p < 1.0, "p must be in (0, 1)")
    val docs = Par.ensure(docs0)
    val m0 = model.select(col("word"),
      col("logp").cast("double").as("logp"))
    val m = if (broadcastModel) broadcast(m0) else m0
    val sc = docWordCounts(docs, idCol, textCol)
      .join(m, Seq("word"), "left")
      .groupBy("did").agg(
        sum(col("n")).as("nt"),
        sum(col("n").cast("double") *
          -coalesce(col("logp"), lit(oovLogp))).as("s"))
    // checkpoint: scores feed the threshold aggregate AND the output
    // projection (same reuse rule as surprisalGate)
    val scores = docs.select(col(idCol))
      .join(sc.withColumnRenamed("did", idCol), Seq(idCol), "left")
      .select(col(idCol),
        when(col("nt") > 0,
          round(col("s") / col("nt").cast("double"), 6))
          .as("avg_surprisal"))
      .materialized()
    val thr = scores.filter(col("avg_surprisal").isNotNull)
      .agg(round(expr(s"percentile(avg_surprisal, $p)"), 6).as("thr"))
    scores.crossJoin(broadcast(thr))
      .select(col(idCol), col("avg_surprisal"),
        coalesce(col("avg_surprisal") <= col("thr"), lit(false)).as("keep"))
  }

  /** The LINE-LEVEL Gopher rules (Rae et al. 2021 appendix A1's other
    * half — [[gopherRules]] covers the word-level subset and documents
    * this one): per-doc fractions of lines that start with a bullet
    * (• - *) or end in an ellipsis (... or …), and the within-doc
    * duplicate-line signals — fraction of repeated non-empty lines and
    * fraction of characters living in repeated lines. `pass` applies
    * the published thresholds (bullet ≤ 0.90, ellipsis ≤ 0.30,
    * dup-line ≤ 0.30, dup-char ≤ 0.20), nulls (no lines) failing
    * closed. Single-line corpora get structure from [[Dedup.
    * reflowLines]] first (the q99 rule).
    *
    * Entirely MAP-SIDE: the line array never leaves its row — dup
    * detection is per-DOC (array_distinct + an O(distinct × lines)
    * occurrence fold over the row's own array), unlike [[Dedup.
    * removeBoilerplateLines]]'s corpus-wide df. Exact integer counts
    * into round(,6) fractions — oracle-reproducible. */
  def gopherLineRules(docs0: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val docs = Par.ensure(docs0)
    val t = col(textCol)
    val lines = filter(
      transform(split(t, "\n"), l => trim(l, " \t\f\r")), l => l =!= "")
    val n = size(lines)
    val nNz = nullif(n, lit(0)).cast("double")
    val bullet = size(filter(lines, l =>
      l.startsWith("•") || l.startsWith("-") || l.startsWith("*")))
    val ell = size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("…")))
    val dinct = array_distinct(lines)
    val dupLines = n - size(dinct)
    val totChars = aggregate(lines, lit(0), (a, l) => a + length(l))
    val dupChars = aggregate(dinct, lit(0), (a, d) => {
      val cnt = size(filter(lines, l => l === d))
      a + when(cnt > 1, cnt * length(d)).otherwise(lit(0))
    })
    val fb = round(bullet.cast("double") / nNz, 6)
    val fe = round(ell.cast("double") / nNz, 6)
    val fd = round(dupLines.cast("double") / nNz, 6)
    val fc = round(dupChars.cast("double") /
      nullif(totChars, lit(0)).cast("double"), 6)
    docs.select(col(idCol),
      coalesce(n, lit(0)).cast("long").as("n_lines"),
      fb.as("frac_bullet"), fe.as("frac_ellipsis"),
      fd.as("frac_dup_lines"), fc.as("frac_dup_chars"),
      coalesce(fb <= 0.9 && fe <= 0.3 && fd <= 0.3 && fc <= 0.2,
        lit(false)).as("pass"))
  }

  /** The C4 cleaning heuristics (Raffel et al. 2020 §2.2 — the filter
    * set behind the most-used open pretraining corpus), line-level:
    * keep only lines that END IN TERMINAL PUNCTUATION (. ! ? ") and
    * have ≥ 5 words, drop any line containing "javascript" (the
    * cookie/JS-warning tell); then page-level: discard documents with
    * fewer than 3 surviving lines, any "{" (code), or the phrase
    * "lorem ipsum". Output: (id, cleaned text from the kept lines,
    * n_lines, n_kept, keep). The paper's dirty-word list and langdetect
    * steps live in their own operators ([[corpusFilter]]'s gates,
    * [[langId]]); its 3-sentence-span dedup is the [[Dedup]] family.
    *
    * Entirely MAP-SIDE (line array folds within the row, page flags are
    * substring probes); exact counts, no shuffles. Single-line corpora
    * get structure from [[Dedup.reflowLines]] first (the q99 rule). */
  def c4Filters(docs0: DataFrame, idCol: String,
                textCol: String): DataFrame = {
    val docs = Par.ensure(docs0)
    val t = col(textCol)
    val lines = filter(
      transform(split(t, "\n"), l => trim(l, " \t\f\r")), l => l =!= "")
    val keptLines = filter(lines, l =>
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
        l.endsWith("\"")) &&
      size(filter(split(l, " "), w => w =!= "")) >= 5 &&
      !lower(l).contains("javascript"))
    val hasBrace = t.contains("{")
    val hasLorem = lower(t).contains("lorem ipsum")
    val nKept = size(keptLines)
    docs.select(col(idCol),
      concat_ws("\n", keptLines).as("clean_text"),
      coalesce(size(lines), lit(0)).cast("long").as("n_lines"),
      coalesce(nKept, lit(0)).cast("long").as("n_kept"),
      coalesce(nKept >= 3 && !hasBrace && !hasLorem, lit(false))
        .as("keep"))
  }

  /** Gopher-style quality rule flags (the published repetition-free subset
    * of the Gopher data-filter rules, Rae et al. 2021 appendix A1):
    * word-count bounds [50, 100000], mean-word-length band [3, 10],
    * alphabetic-word fraction >= 0.8, symbol-to-word ratio ("#"/"...")
    * <= 0.1, and >= 2 stopword hits; `pass` is the conjunction with nulls
    * (empty docs) failing closed. The line-level rules live in
    * [[gopherLineRules]] (single-line corpora get structure from
    * [[Dedup.reflowLines]] first, the q99 rule).
    *
    * Entirely MAP-SIDE: every metric reads one row, mean word length is
    * non-space chars / tokens (no explode), and ratios are single double
    * divisions of exact integers — bit-reproducible in the oracle. */
  def gopherRules(docs0: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docs = Par.ensure(docs0)
    val t = col(textCol)
    val toks = Dedup.tokens(t)
    val ntok = when(t.isNull, lit(null).cast("long"))
      .otherwise(size(toks).cast("long"))
    val ntokNz = nullif(ntok, lit(0L))
    // explicit whitespace class (not \s): Java's \s includes U+000B where
    // RE2's does not — scriptRatios pins the same portable class
    val meanLen = length(regexp_replace(t, "[ \\t\\n\\x0B\\f\\r]+", ""))
      .cast("double") / ntokNz
    val alphaFrac = size(filter(toks, w => w.rlike("[a-z]")))
      .cast("double") / ntokNz
    val symbolRatio = (regexp_count(t, lit("#")) +
      regexp_count(t, lit("\\.\\.\\."))).cast("double") / ntokNz
    val stopHits = when(t.isNull, lit(null).cast("long"))
      .otherwise(stopwordHits(t, enStop).cast("long"))
    val pass = coalesce(
      ntok.between(50L, 100000L) && meanLen.between(3.0, 10.0) &&
        alphaFrac >= 0.8 && symbolRatio <= 0.1 && stopHits >= 2L,
      lit(false))
    docs.select(
      col(idCol),
      ntok.as("n_tokens"),
      meanLen.as("mean_word_len"),
      alphaFrac.as("alpha_frac"),
      symbolRatio.as("symbol_ratio"),
      stopHits.as("stop_hits"),
      pass.as("pass"))
  }

  /** PMI collocations: adjacent-bigram pointwise mutual information,
    * `ln(c(w1,w2) · N / (c1(w1) · c2(w2)))` with marginals counted in
    * POSITION (left counts over bigram-firsts, right over bigram-
    * seconds — the textbook contingency normalization; a doc's last
    * token is never a w1), filtered to `minCount` co-occurrences so
    * one-off pairs can't post infinite-looking scores. THE collocation
    * extractor ("new york", "machine learning") a phrase-aware
    * tokenizer or stopword-pair auditor runs before training.
    *
    * Scale shape (r15): ONE bigram pass into the (w1, w2) count grid —
    * vocab²-bounded, materialized — and every other table folds off the
    * GRID: the left/right marginals are grid sums grouped by w1/w2
    * (integer-exact: Σ_w2 c(w1,w2) ≡ count of bigrams with that w1) and
    * the total is the grid's one-row sum. The pre-r15 shape cached the
    * corpus-sized bigram table and aggregated it three more times —
    * 3 extra corpus-volume shuffles that the grid fold replaces with
    * dictionary-volume ones (guide §2.3 aggregate-before-shuffle, §2.4).
    * Top-k by SCALED-integer PMI with (w1, w2) ties so a replayed
    * oracle lands the same cut. Output: (w1, w2, c12, pmi). */
  def pmiCollocations(docs0: DataFrame, idCol: String, textCol: String,
                      minCount: Long = 5L, topK: Int = 100): DataFrame = {
    require(minCount >= 1L && topK >= 1, "need minCount >= 1, topK >= 1")
    val docs = Par.ensure(docs0)
    val spark = docs.sparkSession
    import spark.implicits._
    import Par.Mat
    // one corpus pass: bigrams aggregate straight into the (w1, w2)
    // grid; the grid is materialized because four consumers read it
    // (pair counts, both marginals, the total) — left lazy, join-pushed
    // not-null filters defeat plan canonicalization and each consumer
    // re-runs the corpus explode (the r14 multi-consumer-grid class)
    val cbAll = docs
      .select(Dedup.tokens(col(textCol)).as("t"))
      .filter(size($"t") >= 2)
      .select(explode(transform(
        sequence(lit(1), size($"t") - 1),
        i => struct(element_at($"t", i).as("w1"),
          element_at($"t", i + 1).as("w2")))).as("bg"))
      .groupBy($"bg.w1".as("w1"), $"bg.w2".as("w2"))
      .agg(count(lit(1)).cast("long").as("c"))
      .materialized()
    // marginals and total fold off the grid, integer-exact:
    // Σ_{w2} c(w1,w2) ≡ count of bigrams whose first token is w1 (the
    // old corpus-volume groupBy), and Σ c ≡ the bigram total
    val cb = cbAll.filter($"c" >= minCount)
      .select($"w1", $"w2", $"c".as("c12"))
    val u1 = cbAll.groupBy($"w1").agg(sum($"c").as("c1"))
    val u2 = cbAll.groupBy($"w2").agg(sum($"c").as("c2"))
    val nt = cbAll.agg(sum($"c").as("n"))
    val scored = cb.join(u1, Seq("w1")).join(u2, Seq("w2"))
      .crossJoin(broadcast(nt))
      .select($"w1", $"w2", $"c12",
        log($"c12".cast("double") * $"n" /
          ($"c1".cast("double") * $"c2")).as("pmi"))
    scored
      .orderBy(round($"pmi" * 1e6).desc, $"w1", $"w2")
      .limit(topK)
      .select($"w1", $"w2", $"c12",
        (round($"pmi" * 1e6) / 1e6).as("pmi"))
  }

  /** Flesch reading-ease + Flesch-Kincaid grade per document — the
    * classic curation signal separating prose from listings/boilerplate
    * (keyword-stuffed pages score absurdly "easy", legalese absurdly
    * "hard"; both are filter fodder). Heuristic components, all
    * map-side single-regex counts (no per-word explode):
    *  - words: [[nTokens]] (the corpus-wide tokenizer);
    *  - sentences: runs of `[.!?]+`, floored at 1 so headline-style
    *    fragments divide by one sentence instead of zero;
    *  - syllables: vowel-GROUP runs `[aeiouy]+` over the lowered text —
    *    whitespace breaks groups, so the whole-text count equals the
    *    per-word sum without ever splitting.
    * Standard coefficients (Flesch 1948 / Kincaid 1975); zero-word docs
    * emit null scores via the guarded denominator. Scores round by the
    * scaled-double rule; the arithmetic tree is division + multiply +
    * subtract on small integers, deterministic across engines.
    *
    * Output: (id, n_words, n_sentences, n_syllables, flesch, fk_grade).
    */
  def readability(docs: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val t = col(textCol)
    val wordsD = col("n_words").cast("double")
    val wps = wordsD / col("n_sentences").cast("double")
    val spw = col("n_syllables").cast("double") /
      when(col("n_words") > 0L, wordsD)
    docs.select(col(idCol),
        nTokens(t).cast("long").as("n_words"),
        greatest(regexp_count(t, lit("[.!?]+")), lit(1)).cast("long")
          .as("n_sentences"),
        regexp_count(lower(t), lit("[aeiouy]+")).cast("long")
          .as("n_syllables"))
      .select(col(idCol), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        (round((lit(206.835) - lit(1.015) * wps - lit(84.6) * spw) * 1e6)
          / 1e6).as("flesch"),
        (round((lit(0.39) * wps + lit(11.8) * spw - lit(15.59)) * 1e6)
          / 1e6).as("fk_grade"))
  }

  /** Pairwise Jensen-Shannon divergence matrix between groups' unigram
    * distributions — "which sources are near-clones of each other",
    * the pre-dedup mix audit that q143's per-source-vs-corpus KL can't
    * answer (two mirrored dumps both look mildly drifted from the
    * blend but IDENTICAL to each other). JS in nats, plus the /ln 2
    * normalization to [0, 1]; symmetric, so only key_a < key_b rows
    * emit.
    *
    * The disjoint-support mass needs no word-level rows: for words on
    * one side only the JS term is (p/2) ln 2, so
    * `JS = co-support terms + ln2/2 ((1 - sumP_co) + (1 - sumQ_co))`
    * — the word-level join carries ONLY co-occurring words, and pairs
    * sharing nothing still score exactly ln 2 via the completion
    * cross. Per-word terms and the co-support masses round to
    * 1e9-scaled integers before their pair-keyed sums, so partition
    * order cannot move the 6th decimal.
    *
    * Scale shape: one (group, word) agg absorbs the corpus; the
    * word-keyed self-join carries (groups-per-word choose 2) rows per
    * word — bounded by the group DICTIONARY squared per word, never by
    * corpus volume; the completion cross is dictionary x dictionary.
    * Output: (key_a, key_b, n_words_shared, js_nats, js_normalized). */
  def jsDivergenceMatrix(docs: DataFrame, keyCol: String,
                         textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = Par.ensure(docs)
      .filter(col(keyCol).isNotNull)
      .select(col(keyCol).as("key"),
        explode(Dedup.tokens(col(textCol))).as("word"))
      .groupBy($"key", $"word")
      .agg(count(lit(1)).cast("long").as("cnt"))
    val kt = w.groupBy($"key").agg(sum($"cnt").cast("long").as("tot"))
    val p = w.join(kt, Seq("key"))
      .select($"key", $"word",
        ($"cnt".cast("double") / $"tot".cast("double")).as("p"))
    val a = p.select($"key".as("key_a"), $"word", $"p".as("pa"))
    val b = p.select($"key".as("key_b"), $"word", $"p".as("pb"))
    val ln2 = math.log(2.0)
    // per-word JS contribution on co-support, 1e9-scaled
    val term = round((lit(0.5) * $"pa" * log(lit(2.0) * $"pa" /
      ($"pa" + $"pb")) + lit(0.5) * $"pb" * log(lit(2.0) * $"pb" /
      ($"pa" + $"pb"))) * 1e9).cast("long")
    val co = a.join(b, Seq("word"))
      .filter($"key_a" < $"key_b")
      .groupBy($"key_a", $"key_b")
      .agg(count(lit(1)).cast("long").as("n_words_shared"),
        sum(term).as("s"),
        sum(round($"pa" * 1e9).cast("long")).as("spa"),
        sum(round($"pb" * 1e9).cast("long")).as("spb"))
    // complete the pair grid: groups sharing NO word score exactly ln 2
    val keys = kt.select($"key")
    val grid = keys.select($"key".as("key_a"))
      .join(keys.select($"key".as("key_b")), $"key_a" < $"key_b")
    grid.join(co, Seq("key_a", "key_b"), "left")
      .select($"key_a", $"key_b",
        coalesce($"n_words_shared", lit(0L)).as("n_words_shared"),
        (round((coalesce($"s", lit(0L)).cast("double") / 1e9 +
          lit(ln2 / 2.0) *
            ((lit(1.0) - coalesce($"spa", lit(0L)).cast("double") / 1e9) +
             (lit(1.0) - coalesce($"spb", lit(0L)).cast("double") / 1e9)))
          * 1e6) / 1e6).as("js_nats"))
      .withColumn("js_normalized",
        round($"js_nats" / ln2, 6))
  }
}
