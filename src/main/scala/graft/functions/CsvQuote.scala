package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** csv.QUOTE_MINIMAL quoting for the `;`-delimited single-file sink: wrap
  * in quotes (doubling embedded `"`) only when the cell contains the
  * delimiter, a quote, or a newline. The composed form ran TWO regex
  * passes per cell (rlike probe + regexp_replace); this kernel is one
  * scan with a no-op fast path returning the input object. */
object CsvQuoteUtil {
  def quote(s: UTF8String): UTF8String = {
    // probe the UTF-8 BYTES (all trigger chars are ASCII and ASCII bytes
    // never occur inside multibyte sequences) — the clean common case
    // returns the input object with zero decoding/allocation
    val n = s.numBytes()
    var needs = false
    var i = 0
    while (i < n && !needs) {
      val b = s.getByte(i)
      needs = b == ';' || b == '"' || b == '\n' || b == '\r'
      i += 1
    }
    if (!needs) return s
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length + 8)
    sb.append('"')
    i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c == '"') sb.append("\"\"") else sb.append(c)
      i += 1
    }
    sb.append('"')
    UTF8String.fromString(sb.toString)
  }
}

/** Codegen'd QUOTE_MINIMAL cell quoting (`;` delimiter). */
case class CsvQuote(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "csv_quote"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    CsvQuoteUtil.quote(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CsvQuoteUtil.quote($c)")

  override protected def withNewChildInternal(newChild: Expression): CsvQuote =
    copy(child = newChild)
}

object CsvQuote {
  def quoteCell(c: Column): Column =
    ColumnBridge.column(CsvQuote(ColumnBridge.expression(c)))
}
