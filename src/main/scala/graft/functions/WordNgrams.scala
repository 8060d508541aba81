package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Imperative kernel for distinct word n-gram shingles, callable from
  * generated code. Semantics mirror the composed pipeline in
  * [[graft.analytics.Dedup]] exactly:
  * `lower` -> `trim` -> split on `\s+` -> drop empties -> consecutive
  * n-grams joined by one space -> first-occurrence-stable distinct.
  * The composed form interprets a transform/sequence/element_at/concat_ws
  * higher-order chain per token position; this is one static call inside
  * whole-stage codegen.
  */
object WordNgramsUtil {
  private val WS = java.util.regex.Pattern.compile("\\s+")

  def shingles(text: UTF8String, n: Int): ArrayData = {
    // toLowerCase on UTF8String == Spark's lower(); trim() == Spark's trim
    // (ASCII space only); WS.split == the regexp_replace("\s+")+split pair
    val s = text.toLowerCase.trim().toString
    val raw = WS.split(s)
    var nTok = 0
    val toks = new Array[String](raw.length)
    var i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) { toks(nTok) = raw(i); nTok += 1 }
      i += 1
    }
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    i = 0
    while (i <= nTok - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }
}

/** Distinct word n-gram shingles as a native expression (codegen'd). */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    WordNgramsUtil.shingles(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordNgramsUtil.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  def wordNgrams(c: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(c), n))
}
