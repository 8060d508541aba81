package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Machine-locks source-level contracts that audits discovered the hard
  * way — each rule here is a regression a grep once caught in a LIVE
  * round and would silently reappear without a failing test:
  *
  *  - every lineage truncation routes through Par.materialize (the one
  *    deployment dial for local-vs-reliable checkpointing) — a direct
  *    `.localCheckpoint(` call elsewhere silently opts out of the
  *    reliable path and reintroduces the lost-executor failure mode;
  *  - no raw control bytes in source: grep classifies such a file as
  *    BINARY and every text-based audit sweep (leak checks included)
  *    silently skips it (found live: a NUL literal in Excel.scala);
  *  - no Scala UDFs (`udf(`), no `???` stubs, no TODO/FIXME — the
  *    codegen-or-native rule and the no-padding rule, kept hard.
  */
class SourceHygieneSpec extends AnyFunSuite {

  private def mainSources: Seq[Path] = {
    val root = Paths.get("src/main/scala")
    val walk = Files.walk(root)
    try walk.iterator().asScala.filter(_.toString.endsWith(".scala")).toSeq
    finally walk.close()
  }

  test("no direct localCheckpoint outside Par.materialize") {
    val offenders = mainSources.filterNot(_.endsWith("Par.scala"))
      .filter(p => Files.readString(p).contains(".localCheckpoint("))
    assert(offenders.isEmpty,
      s"route lineage truncation through Par.materialize: $offenders")
  }

  test("no raw control bytes in main source (audit sweeps must see " +
       "every file as text)") {
    val offenders = mainSources.filter { p =>
      // mask to unsigned: UTF-8 continuation bytes are NEGATIVE as JVM
      // bytes and must not read as control characters
      Files.readAllBytes(p).exists { b =>
        val ub = b & 0xff
        ub < 32 && ub != '\n' && ub != '\t' && ub != '\r'
      }
    }
    assert(offenders.isEmpty,
      s"escape control chars as \\uXXXX: $offenders")
  }

  test("no Scala UDFs, stubs, or TODO markers in main source") {
    val bad = for {
      p <- mainSources
      text = Files.readString(p)
      pat <- Seq("udf(", "???", "TODO", "FIXME")
      // allow the literal strings inside this spec's own patterns and
      // doc mentions like "no udf(" — require the pattern OUTSIDE a
      // comment-looking line for the call forms
      if text.linesIterator.exists { l =>
        val t = l.trim
        t.contains(pat) && !t.startsWith("//") && !t.startsWith("*") &&
          !t.startsWith("/*")
      }
    } yield s"$p: $pat"
    assert(bad.isEmpty, s"banned markers in main source: $bad")
  }
}
