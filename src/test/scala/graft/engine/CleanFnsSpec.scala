package graft.engine

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Edge cases lifted from the reference's own functions (file:line cites in
  * CleanFns scaladoc). */
class CleanFnsSpec extends SparkTestBase {

  // ----- F2 sanitize_name (main.py:79-85) -----
  test("F2 keeps the reference allowlist incl «»№°") {
    assert(evalStr(CleanFns.sanitizeName(lit("Люстра «Пример» №5, 30°C")))
      === "Люстра «Пример» №5, 30°C")
  }
  test("F2 strips disallowed symbols and collapses whitespace") {
    assert(evalStr(CleanFns.sanitizeName(lit("{Chair}™   ©  x")))
      === "Chair x")
  }
  test("F2 trims leading space inside parens (trailing kept: the reference's " +
       "greedy [^)]+ capture eats it, main.py:84)") {
    assert(evalStr(CleanFns.sanitizeName(lit("name ( padded )")))
      === "name (padded )")
  }
  test("F2 null -> empty string") {
    assert(evalStr(CleanFns.sanitizeName(lit(null).cast("string"))) === "")
  }

  // ----- F3 dedup delimited (main.py:87-95) -----
  test("F3 dedups keeping first occurrence, drops empties, trims") {
    assert(evalStr(CleanFns.dedupDelimited(lit("b/// a ///b/// ///a")))
      === "b///a")
  }
  test("F3 is idempotent") {
    val once  = evalStr(CleanFns.dedupDelimited(lit("x///y///x///z///y")))
    val twice = evalStr(CleanFns.dedupDelimited(lit(once)))
    assert(once === twice && once === "x///y///z")
  }

  // ----- F1 clean_description (main.py:57-76) -----
  test("F1 keeps p/br, unwraps other tags, wraps bare text") {
    assert(evalStr(CleanFns.cleanDescription(lit("<div><b>Bold</b> text<br>line</div>")))
      === "<p>Bold text<br>line</p>")
  }
  test("F1 preserves existing leading <p>") {
    assert(evalStr(CleanFns.cleanDescription(lit("<p>already</p>")))
      === "<p>already</p>")
  }
  test("F1 input that cleans to empty yields empty (not <p></p>)") {
    assert(evalStr(CleanFns.cleanDescription(lit("<div></div>"))) === "")
  }

  // ----- F4/F5/F7 -----
  test("F4 decimal comma") {
    assert(evalStr(CleanFns.decimalComma(lit("4.5"))) === "4,5")
  }
  test("F5 strips ? and trims") {
    assert(evalStr(CleanFns.stripQuestion(lit("52? см"))) === "52 см")
  }
  test("F5 size-key heuristic matches Размер and size") {
    assert(evalBool(CleanFns.sizeKeyish(lit("Размер"))))
    assert(evalBool(CleanFns.sizeKeyish(lit("shoeSize"))))
    assert(!evalBool(CleanFns.sizeKeyish(lit("цвет"))))
  }
  test("F7 re-delimits ', ' to ///") {
    assert(evalStr(CleanFns.redelimit(lit("a, b, c"))) === "a///b///c")
  }

  // ----- F6/F8 -----
  test("F6 scrubs newlines to spaces") {
    assert(evalStr(CleanFns.scrubCell(lit("a\nb\rc"))) === "a b c")
  }
  test("F8 strips control chars and BOM") {
    assert(evalStr(CleanFns.stripControlChars(lit("﻿ab"))) === "ab")
  }

  // ----- F11 image-URL predicate (main.py:201-210) -----
  test("F11 accepts extensions, img/ paths, http") {
    assert(evalBool(CleanFns.isImageUrl(lit("x/photo.JPG"))))
    assert(evalBool(CleanFns.isImageUrl(lit("cdn/img/123"))))
    assert(evalBool(CleanFns.isImageUrl(lit("http://x/y"))))
    assert(!evalBool(CleanFns.isImageUrl(lit("ftp://nope.txt"))))
  }

  // ----- F13/F14 -----
  test("F13 md5 short id: upper 8 hex chars") {
    val v = evalStr(CleanFns.shortMd5(lit("1.2.3.4")))
    assert(v.length === 8 && v === v.toUpperCase)
  }
  test("F14 numeric-string matches reference isdigit-after-one-dot") {
    assert(evalBool(CleanFns.isNumericString(lit("5"))))
    assert(evalBool(CleanFns.isNumericString(lit("5.5"))))
    assert(evalBool(CleanFns.isNumericString(lit(".5"))))
    assert(evalBool(CleanFns.isNumericString(lit("5."))))
    assert(!evalBool(CleanFns.isNumericString(lit("5.5.5"))))
    assert(!evalBool(CleanFns.isNumericString(lit("a5"))))
    assert(!evalBool(CleanFns.isNumericString(lit("."))))
  }

  // ----- P8 -----
  test("P8 availability defaulting") {
    assert(evalStr(CleanFns.defaultAvailable(lit(null).cast("string"))) === "1")
    assert(evalStr(CleanFns.defaultAvailable(lit("0"))) === "0")
  }
}
