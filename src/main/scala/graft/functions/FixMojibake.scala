package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair (the ftfy core rule): text whose UTF-8 bytes were once
  * mis-decoded as Latin-1/Windows-1252 — "Ð¿Ñ€Ð¸Ð²ÐµÑ‚" for "привет",
  * "cafÃ©" for "café" — is detected and re-decoded. A crawl corpus is
  * full of this (double-encoded feeds, charset-lying servers), and
  * dedup/LM scoring treat the broken and fixed forms as unrelated
  * documents, so repair belongs BEFORE fingerprinting in the cleaning
  * order (with [[NfcNormalize]]).
  *
  * Rule: if every char maps back to a single byte under
  * Latin-1/cp1252 (chars ≤ 0xFF directly; the 27 cp1252 specials like
  * € ‚ ƒ „ … — ™ by table) AND those bytes decode as STRICT UTF-8
  * (CharsetDecoder REPORT — never replacement chars) AND the decode
  * actually shrinks the text (a multibyte sequence collapsed), return
  * the re-decoded text; otherwise return the input unchanged. Strictness
  * is what keeps false positives out: genuine Latin-1 prose ("café",
  * "über") has isolated high bytes that are malformed as UTF-8 and
  * passes through untouched. Single-pass — nested double-encodings fix
  * one layer per application. Pure ASCII short-circuits on the raw
  * bytes with zero allocation. Not SQL-expressible in DuckDB (no
  * byte-level charset round-trip), so verification is spec-based
  * (known mojibake/clean pairs), per the non-SQL-op contract. */
object FixMojibakeUtil {

  // cp1252 0x80-0x9F specials: Unicode char -> original byte, as a
  // compiler-generated lookupswitch (no boxed Map.get in the hot
  // kernel). Chars whose cp1252 slot is undefined (0x81, 0x8D, 0x8F,
  // 0x90, 0x9D) return -1 — a char outside both this switch and the
  // Latin-1 range means "not mojibake".
  private def cp1252Inverse(c: Char): Int = c match {
    case '€' => 0x80; case '‚' => 0x82; case 'ƒ' => 0x83
    case '„' => 0x84; case '…' => 0x85; case '†' => 0x86
    case '‡' => 0x87; case 'ˆ' => 0x88; case '‰' => 0x89
    case 'Š' => 0x8A; case '‹' => 0x8B; case 'Œ' => 0x8C
    case 'Ž' => 0x8E; case '‘' => 0x91; case '’' => 0x92
    case '“' => 0x93; case '”' => 0x94; case '•' => 0x95
    case '–' => 0x96; case '—' => 0x97; case '˜' => 0x98
    case '™' => 0x99; case 'š' => 0x9A; case '›' => 0x9B
    case 'œ' => 0x9C; case 'ž' => 0x9E; case 'Ÿ' => 0x9F
    case _ => -1
  }

  // CharsetDecoder is stateful (not thread-safe) but reusable after
  // reset(): one per task thread instead of one per garbled row
  private val decoders =
    ThreadLocal.withInitial[java.nio.charset.CharsetDecoder](() =>
      java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT))

  def fix(s: UTF8String): UTF8String = {
    // pure-ASCII fast path on the raw bytes (sign bit = non-ASCII)
    val nb = s.numBytes()
    var ascii = true
    var bi = 0
    while (bi < nb && ascii) {
      ascii = s.getByte(bi) >= 0
      bi += 1
    }
    if (ascii) return s
    val str = s.toString
    val bytes = new Array[Byte](str.length)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c <= 0xFF) bytes(i) = c.toByte
      else {
        val b = cp1252Inverse(c)
        if (b < 0) return s // char has no single-byte origin
        bytes(i) = b.toByte
      }
      i += 1
    }
    val dec = decoders.get()
    dec.reset()
    try {
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      // a real double-encoding always shrinks (some multibyte sequence
      // collapsed); equal length means the bytes were plain ASCII-ish
      // and there was nothing to fix
      if (out.length < str.length) UTF8String.fromString(out) else s
    } catch {
      case _: java.nio.charset.CharacterCodingException => s
    }
  }
}

/** Codegen'd mojibake-repair kernel. */
case class FixMojibake(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "fix_mojibake"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    FixMojibakeUtil.fix(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.FixMojibakeUtil.fix($c)")

  override protected def withNewChildInternal(newChild: Expression): FixMojibake =
    copy(child = newChild)
}

object FixMojibake {
  def fixMojibake(c: Column): Column =
    ColumnBridge.column(FixMojibake(ColumnBridge.expression(c)))
}
