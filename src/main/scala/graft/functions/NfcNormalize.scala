package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical first step of a
  * training-data text pipeline (C4/CCNet-style corpora normalize before
  * tokenization and dedup, or visually-identical strings like e-acute
  * composed vs e + combining-acute hash as different documents). Spark has
  * no builtin; a UDF would break codegen. The kernel has a fast no-op
  * path: `Normalizer.isNormalized` over pure-ASCII (the overwhelmingly
  * common case — the ASCII probe below is cheaper still and avoids
  * decoding) returns the input object untouched with zero allocation.
  * Oracle equivalent: DuckDB's `nfc_normalize`. */
object NfcNormalizeUtil {
  def normalize(s: UTF8String): UTF8String = {
    // pure-ASCII bytes are always NFC: probe the UTF-8 bytes and return
    // the input object unchanged without ever decoding (sign bit set =
    // non-ASCII lead/continuation byte)
    val n = s.numBytes()
    var ascii = true
    var i = 0
    while (i < n && ascii) {
      ascii = s.getByte(i) >= 0
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Codegen'd NFC normalization kernel. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    NfcNormalizeUtil.normalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalizeUtil.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def nfc(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
