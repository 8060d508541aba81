package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training + application — the
  * subword vocabulary step of an LLM data pipeline (Sennrich et al. 2016
  * semantics: greedy highest-count pair merges, `</w>` end-of-word
  * marker).
  *
  * Scale shape: the corpus is scanned ONCE to build the word-frequency
  * table; every training iteration afterwards runs over that vocab table
  * (distinct words — orders of magnitude smaller than the corpus and
  * independent of corpus growth once saturated). Each merge iteration is
  * one partial-aggregable pair-count shuffle over the vocab plus a 1-row
  * TakeOrdered to the driver (the bounded model exchange); the merge
  * rewrite itself is a codegen'd string `replace` — no UDF anywhere.
  * Token counting joins the corpus words against the final vocab by key
  * (broadcast when the vocab is small, shuffle join otherwise — AQE
  * decides); the text is never re-segmented per document.
  *
  * Determinism: pair ties break lexicographically (count desc, left asc,
  * right asc); symbol state is a canonical space-padded string, so a SQL
  * oracle replays the identical `replace` algebra.
  */
object Bpe {

  /** Vocab symbol state for `word`: `" w o r d </w> "` — every symbol
    * space-separated with leading/trailing pads so a merge of pair (a, b)
    * is exactly `replace(s, " a b ", " ab ")` (greedy left-to-right
    * non-overlapping, the classic merge order). */
  private def initialSyms(w: Column): Column =
    concat(lit(" "), array_join(filter(split(w, ""), c => c =!= ""), " "),
      lit(" </w> "))

  /** The distributed word-frequency table with initial symbol state:
    * `(w, f, s)`. One corpus scan. */
  private def wordTable(docs: DataFrame, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(explode(Dedup.tokens(col(textCol))).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("f"))
      .withColumn("s", initialSyms($"w"))
  }

  /** Adjacent symbol pairs of the padded state `s`, as (a, b) structs. */
  private def adjacentPairs(s: Column): Column = {
    val l = filter(split(s, " "), x => x =!= "")
    zip_with(slice(l, lit(1), greatest(size(l) - 1, lit(0))),
             slice(l, lit(2), greatest(size(l) - 1, lit(0))),
             (x, y) => struct(x.as("a"), y.as("b")))
  }

  /** Train `numMerges` BPE merges over the corpus. Returns
    * `(merges, vocab)`:
    *  - `merges`: `(rank, left_sym, right_sym, pair_count)` — the model,
    *    one row per learned merge in rank order;
    *  - `vocab`: `(w, f, n_tokens)` — every corpus word with its token
    *    count under the final merge table (the segmentation join table
    *    [[tokenCounts]] uses).
    * Training stops early if the corpus runs out of adjacent pairs. */
  def train(docs: DataFrame, textCol: String,
            numMerges: Int): (DataFrame, DataFrame) = {
    require(numMerges >= 1, "numMerges must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    // each iteration's state is materialized (localCheckpoint): the next
    // pair count must not recompute the whole merge chain from the raw
    // corpus — 20 merges would otherwise cost O(20²) corpus scans
    var vocab = wordTable(docs, textCol).localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      val best = vocab
        .select(explode(adjacentPairs($"s")).as("p"), $"f")
        .groupBy($"p.a".as("a"), $"p.b".as("b"))
        .agg(sum($"f").as("c"))
        .orderBy($"c".desc, $"a", $"b")
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, c) =
          (best.head.getString(0), best.head.getString(1),
           best.head.getLong(2))
        merges += ((r, a, b, c))
        vocab = vocab
          // literal (non-regex) replace: symbols may contain any corpus
          // punctuation; semantics = greedy left-to-right non-overlapping,
          // identical to the oracle's replace()
          .withColumn("s", replace($"s", lit(s" $a $b "), lit(s" $a$b ")))
          .localCheckpoint()
        r += 1
      }
    }
    val mergeDf = spark.createDataFrame(merges.result())
      .toDF("rank", "left_sym", "right_sym", "pair_count")
    val vocabDf = vocab.select($"w", $"f",
      size(filter(split($"s", " "), x => x =!= "")).as("n_tokens"))
    (mergeDf, vocabDf)
  }

  /** Greedy left-to-right merge of one pair — the driver-side reference
    * of the `replace` rewrite, for segmenting out-of-corpus words. */
  private[analytics] def mergePair(syms: Seq[String], a: String,
                                   b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Segment one word under a trained merge list (rank order replay —
    * the original subword-nmt application rule). For words seen in
    * training this reproduces the vocab table's segmentation exactly. */
  def segment(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val init = word.toCharArray.map(_.toString).toSeq :+ "</w>"
    merges.foldLeft(init) { case (s, (a, b)) => mergePair(s, a, b) }
  }

  /** Per-document token counts under the trained vocab: `(id, n_words,
    * n_tokens)`. Pure joins — the corpus explodes to words, each word
    * looks up its trained token count, one partial-aggregable groupBy
    * back to documents. Documents with no tokens produce no row (same
    * rule as every tokenizing op here). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  vocab: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).as("id"),
        explode(Dedup.tokens(col(textCol))).as("w"))
      .join(vocab.select($"w", $"n_tokens"), "w")
      .groupBy($"id")
      .agg(count(lit(1)).as("n_words"),
        sum($"n_tokens").cast("long").as("n_tokens"))
  }
}
