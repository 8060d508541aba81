package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Imperative kernel for F3, callable from generated code — a static call
  * keeps the operator inside whole-stage codegen without interpreting the
  * five-deep higher-order-function chain the composed form builds. */
object DedupDelimitedUtil {
  /** Split on the literal delimiter, trim items (ASCII-space semantics,
    * matching Spark's `trim`), drop empties, stable-dedup, rejoin. */
  def dedup(s: UTF8String, quotedPattern: UTF8String, delim: UTF8String): UTF8String = {
    val parts = s.split(quotedPattern, -1)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i < parts.length) {
      val t = parts(i).trim()
      if (t.numBytes() > 0) seen.add(t)
      i += 1
    }
    UTF8String.concatWs(delim, seen.toArray(new Array[UTF8String](0)): _*)
  }
}

/** F3 `remove_duplicates_from_delimited_string` (main.py:87-95) as a native
  * expression: same semantics as the composed
  * `array_join(array_distinct(filter(transform(split(...)))))` pipeline,
  * executed as one static call inside generated code. */
case class DedupDelimited(child: Expression, delimiter: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "dedup_delimited"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  private lazy val quoted =
    UTF8String.fromString(java.util.regex.Pattern.quote(delimiter))
  private lazy val delimU = UTF8String.fromString(delimiter)

  override def nullSafeEval(v: Any): Any =
    DedupDelimitedUtil.dedup(v.asInstanceOf[UTF8String], quoted, delimU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val q = ctx.addReferenceObj("quotedPattern", quoted, classOf[UTF8String].getName)
    val d = ctx.addReferenceObj("delim", delimU, classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DedupDelimitedUtil.dedup($c, $q, $d)")
  }

  override protected def withNewChildInternal(newChild: Expression): DedupDelimited =
    copy(child = newChild)
}

object DedupDelimited {
  def dedupDelimited(c: Column, delimiter: String): Column =
    ColumnBridge.column(DedupDelimited(ColumnBridge.expression(c), delimiter))
}
