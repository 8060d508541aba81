package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions._

/** `SparkSessionExtensions` hook registering the engine's native codegen
  * kernels as SQL functions, so `spark.sql("SELECT cosine_sim(a, b) …")`
  * works anywhere the DataFrame wrappers do — the standard way a library
  * ships Catalyst expressions to a cluster session:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * Registered: cosine_sim, dot_product, word_ngrams(text, n),
  * xml_escape_text, xml_escape_attr, csv_quote,
  * dedup_delimited(text, delim), nfc_normalize, winnow_fp(text, k, w),
  * and the native aggregates kmv_sketch(h, k) / cov_moments(vec) /
  * misra_gries(s, k) / top_k_by(score, id, k) / log_hist(x, s). The PQ
  * kernels are not
  * SQL-registered — their codebook argument is a model, not a literal.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def arity(name: String, n: Int)(args: Seq[Expression]): Unit =
    require(args.length == n, s"$name expects $n arguments, got ${args.length}")

  private def litInt(name: String, e: Expression): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"$name expects a literal INT here, got $other")
  }

  private def litString(name: String, e: Expression): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"$name expects a literal STRING here, got $other")
  }

  /** (name, info, builder) rows — one per SQL-exposed kernel. */
  private[graft] val registrations: Seq[(String, ExpressionInfo, FunctionBuilder)] = Seq(
    ("cosine_sim",
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two double arrays"),
      (args: Seq[Expression]) => {
        arity("cosine_sim", 2)(args); CosineSimilarity(args(0), args(1))
      }),
    ("dot_product",
      info("dot_product", "dot_product(a, b) - dot product of two double arrays"),
      (args: Seq[Expression]) => {
        arity("dot_product", 2)(args); DotProduct(args(0), args(1))
      }),
    ("word_ngrams",
      info("word_ngrams", "word_ngrams(text, n) - distinct word n-gram shingles"),
      (args: Seq[Expression]) => {
        arity("word_ngrams", 2)(args)
        WordNgrams(args(0), litInt("word_ngrams", args(1)))
      }),
    ("xml_escape_text",
      info("xml_escape_text", "xml_escape_text(s) - escape XML text content"),
      (args: Seq[Expression]) => {
        arity("xml_escape_text", 1)(args); XmlEscape(args(0), attr = false)
      }),
    ("xml_escape_attr",
      info("xml_escape_attr", "xml_escape_attr(s) - escape an XML attribute value"),
      (args: Seq[Expression]) => {
        arity("xml_escape_attr", 1)(args); XmlEscape(args(0), attr = true)
      }),
    ("csv_quote",
      info("csv_quote", "csv_quote(s) - QUOTE_MINIMAL CSV cell quoting"),
      (args: Seq[Expression]) => {
        arity("csv_quote", 1)(args); CsvQuote(args(0))
      }),
    ("dedup_delimited",
      info("dedup_delimited",
        "dedup_delimited(s, delim) - order-preserving dedup of a delimited string"),
      (args: Seq[Expression]) => {
        arity("dedup_delimited", 2)(args)
        DedupDelimited(args(0), litString("dedup_delimited", args(1)))
      }),
    ("nfc_normalize",
      info("nfc_normalize", "nfc_normalize(s) - Unicode NFC normalization"),
      (args: Seq[Expression]) => {
        arity("nfc_normalize", 1)(args); NfcNormalize(args(0))
      }),
    ("fix_mojibake",
      info("fix_mojibake",
        "fix_mojibake(s) - repair UTF-8 text mis-decoded as " +
          "Latin-1/cp1252 (strict re-decode; non-mojibake passes through)"),
      (args: Seq[Expression]) => {
        arity("fix_mojibake", 1)(args); FixMojibake(args(0))
      }),
    ("winnow_fp",
      info("winnow_fp",
        "winnow_fp(text, k, w) - winnowing fingerprints (MOSS): distinct " +
          "window-minima of positional k-gram hashes"),
      (args: Seq[Expression]) => {
        arity("winnow_fp", 3)(args)
        WinnowFp(args(0), litInt("winnow_fp", args(1)),
          litInt("winnow_fp", args(2)))
      }),
    ("kmv_sketch",
      info("kmv_sketch",
        "kmv_sketch(h, k) - aggregate: the k smallest distinct int64 " +
          "values, ascending (KMV distinct-count sketch state)"),
      (args: Seq[Expression]) => {
        arity("kmv_sketch", 2)(args)
        KmvSketch(args(0), litInt("kmv_sketch", args(1)))
          .toAggregateExpression()
      }),
    ("cov_moments",
      info("cov_moments",
        "cov_moments(vec) - aggregate: [d, n, sums, upper-triangle cross " +
          "products] covariance moments of a double-array column"),
      (args: Seq[Expression]) => {
        arity("cov_moments", 1)(args)
        CovMoments(args(0)).toAggregateExpression()
      }),
    ("misra_gries",
      info("misra_gries",
        "misra_gries(s, k) - aggregate: <= k Misra-Gries candidate keys, " +
          "a guaranteed superset of every item with frequency > N/k"),
      (args: Seq[Expression]) => {
        arity("misra_gries", 2)(args)
        MisraGries(args(0), litInt("misra_gries", args(1)))
          .toAggregateExpression()
      }),
    ("top_k_by",
      info("top_k_by",
        "top_k_by(score, id, k) - aggregate: the k smallest (score, id) " +
          "pairs ascending as array<struct<score, id>> (bounded per-group " +
          "top-k, no window sort)"),
      (args: Seq[Expression]) => {
        arity("top_k_by", 3)(args)
        TopKBy(args(0), args(1), litInt("top_k_by", args(2)))
          .toAggregateExpression()
      }),
    ("log_hist",
      info("log_hist",
        "log_hist(x, s) - aggregate: dense (64-s)*2^s bucket counts of " +
          "the base-2 log-linear histogram (HDR-style mergeable quantile " +
          "sketch, 2^s sub-buckets per octave, integer boundaries)"),
      (args: Seq[Expression]) => {
        arity("log_hist", 2)(args)
        LogHist(args(0), litInt("log_hist", args(1)))
          .toAggregateExpression()
      }))
}
