package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass XML text escaping (ET.tostring semantics: `& < >`, plus
  * `"` for attribute values). The composed `replace(replace(replace(...)))`
  * chain walks and re-allocates the string three (four) times per field
  * per row — in the YML sink that chain runs for every offer field, so the
  * serialization stage is dominated by escape allocations. This kernel is
  * one scan with a fast no-op path (returns the INPUT object unchanged
  * when nothing needs escaping, the common case for product feeds). */
object XmlEscapeUtil {
  def escape(s: UTF8String, attr: Boolean): UTF8String = {
    // probe the UTF-8 BYTES: all escape targets are ASCII, and ASCII byte
    // values never occur inside a multibyte UTF-8 sequence — so the clean
    // common case returns the input object with ZERO decoding/allocation
    val n = s.numBytes()
    var needs = false
    var i = 0
    while (i < n && !needs) {
      val b = s.getByte(i)
      needs = b == '&' || b == '<' || b == '>' || (attr && b == '"')
      i += 1
    }
    if (!needs) return s
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length + 16)
    i = 0
    while (i < str.length) {
      str.charAt(i) match {
        case '&'              => sb.append("&amp;")
        case '<'              => sb.append("&lt;")
        case '>'              => sb.append("&gt;")
        case '"' if attr      => sb.append("&quot;")
        case c                => sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Codegen'd single-pass XML escape; `attr=true` also escapes `"`. */
case class XmlEscape(child: Expression, attr: Boolean) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "xml_escape"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    XmlEscapeUtil.escape(v.asInstanceOf[UTF8String], attr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.XmlEscapeUtil.escape($c, $attr)")

  override protected def withNewChildInternal(newChild: Expression): XmlEscape =
    copy(child = newChild)
}

object XmlEscape {
  def escapeText(c: Column): Column =
    ColumnBridge.column(XmlEscape(ColumnBridge.expression(c), attr = false))
  def escapeAttr(c: Column): Column =
    ColumnBridge.column(XmlEscape(ColumnBridge.expression(c), attr = true))
}
