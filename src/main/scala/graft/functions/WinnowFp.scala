package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Imperative kernel for winnowing fingerprints (Schleimer, Wilkerson &
  * Aiken, SIGMOD 2003): tokenize -> positional k-gram md5 hashes ->
  * sliding-window minima (monotone deque, O(m)) -> first-occurrence
  * distinct, in ONE pass per document.
  *
  * Exists because the composed HOF form re-evaluates its hash-array
  * subexpression INSIDE the per-window lambda (Catalyst inlines the
  * projection alias and interpreted lambdas get no loop-invariant
  * hoisting), turning the operator O(m² k) per document — measured 312 s
  * at sf0.1 where this kernel runs the same corpus in under a second.
  * Semantics are pinned to the composed reference form
  * ([[graft.analytics.Dedup.winnowFingerprintsComposed]]) by a
  * differential spec: same tokens rule as [[WordNgramsUtil.shingles]],
  * hash = first 4 md5 bytes of the gram as an unsigned int64 (the
  * `conv(substring(md5(g),1,8),16,10)` rule), windows `i in
  * 0..max(m-w, 0)` each contributing `min(h[i..i+w-1])` (clamped), ties
  * keep earliest, duplicates dropped first-occurrence-stable.
  */
object WinnowFpUtil {
  private val WS = java.util.regex.Pattern.compile("\\s+")

  def fingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toLowerCase.trim().toString
    val raw = WS.split(s)
    var nTok = 0
    val toks = new Array[String](raw.length)
    var i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) { toks(nTok) = raw(i); nTok += 1 }
      i += 1
    }
    if (nTok < k) return new GenericArrayData(Array.empty[Any])
    val m = nTok - k + 1
    val md = MessageDigest.getInstance("MD5")
    val hs = new Array[Long](m)
    i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
      val d = md.digest(sb.toString.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      // first 4 md5 bytes as an unsigned 32-bit value in an int64 —
      // identical to conv(substring(md5(g), 1, 8), 16, 10)::long
      hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      md.reset()
      i += 1
    }
    // monotone deque of indices: front = argmin of the current window
    val dq = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i < m) {
      while (tail > head && hs(dq(tail - 1)) > hs(i)) tail -= 1
      dq(tail) = i; tail += 1
      val winStart = i - w + 1
      while (dq(head) < winStart) head += 1
      // window i-w+1..i is complete once i >= w-1; when m < w the single
      // clamped window is emitted at the final element
      if (i >= w - 1 || i == m - 1) seen.add(hs(dq(head)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }
}

/** Winnowing fingerprints as a native expression (codegen'd). */
case class WinnowFp(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, "k and w must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fp"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    WinnowFpUtil.fingerprints(v.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowFpUtil.fingerprints($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFp =
    copy(child = newChild)
}

object WinnowFp {
  def winnowFp(c: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFp(ColumnBridge.expression(c), k, w))
}
