package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Source-inventory gate for the TIMESTAMP_NTZ regression class.
  *
  * The driver's parquet fixtures store `ts` as TIMESTAMP(NANOS); depending
  * on session config it can surface as TIMESTAMP_NTZ, on which
  * `unix_micros`/`unix_timestamp` throw at analysis and `Row.getTimestamp`
  * throws a ClassCastException at runtime (NTZ maps to LocalDateTime).
  * This class of bug shipped twice (round 9's StreamingJobsSpec call site,
  * re-missed once in round 10), both times because a NEW call site landed
  * without the cast guard the fixed sites carry. This spec makes the
  * guard mechanical: every `getTimestamp(` / `unix_micros(` /
  * `unix_timestamp(` call site in src/ must, on the same line or the three
  * lines above it, either cast to timestamp, read LocalDateTime, or carry
  * an explicit `NTZ-safe:` comment stating why NTZ cannot reach it.
  * Comment-only mentions (scaladoc discussion) are skipped.
  */
class TimestampGuardSpec extends AnyFunSuite {

  private val patterns = Seq("getTimestamp(", "unix_micros(", "unix_timestamp(")
  private val guards = Seq("cast", "Cast", "CAST", "getLocalDateTime", "NTZ-safe")

  private def scalaFiles(root: String): Seq[Path] = {
    val p = Paths.get(root)
    if (!Files.exists(p)) Seq.empty
    else Files.walk(p).iterator().asScala
      .filter(f => f.toString.endsWith(".scala"))
      .filterNot(_.getFileName.toString == "TimestampGuardSpec.scala")
      .toSeq
  }

  private def isCommentLine(l: String): Boolean = {
    val t = l.trim
    t.startsWith("//") || t.startsWith("*") || t.startsWith("/*")
  }

  test("every timestamp-extraction call site is cast-guarded or annotated NTZ-safe") {
    val offenders = for {
      file <- scalaFiles("src/main/scala") ++ scalaFiles("src/test/scala")
      lines = Files.readAllLines(file).asScala.toVector
      i <- lines.indices
      if !isCommentLine(lines(i)) && patterns.exists(lines(i).contains)
      window = lines.slice(math.max(0, i - 3), i + 1)
      if !window.exists(l => guards.exists(l.contains))
    } yield s"$file:${i + 1}: ${lines(i).trim}"
    assert(offenders.isEmpty,
      "unguarded timestamp-extraction call sites (cast to timestamp, read " +
        "LocalDateTime, or add an `// NTZ-safe: <why>` comment within the " +
        s"three preceding lines):\n${offenders.mkString("\n")}")
  }
}
