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
  * 2. A tiny-negative double rounds to IEEE -0.0 in DuckDB (whose
  *    `round` preserves sign) and to +0.0 in Spark (whose `round` goes
  *    through BigDecimal and never emits -0.0); stringified compare
  *    splits them. Round 8 caught the cumulative-sum form (q243);
  *    the round-9 sf0.1 audit proved the class GENERALIZES to any
  *    signed rounded output that can land on exact zero (q248 per-dim
  *    means, q410 modularity contributions). Since round 10 the rule
  *    is three-armed — a `round(` call is flagged when its first
  *    argument
  *      (a) contains an aggregate AND a window marker (cumulative
  *          class, minus not required: the summand's sign is data),
  *      (b) contains an aggregate AND an arithmetic `-` (signed
  *          aggregate arithmetic: diffs of means, slopes, Ginis), or
  *      (c) references a file-local ALIAS of an aggregate expression
  *          (the parked-aggregate q248 shape: `avg(v).as("__ma")` …
  *          `round(col("__ma"), 4)`),
  *    and the round's close paren is not immediately followed by the
  *    normalizer (`+ lit(0.0)` in Scala, `+ 0.0` in SQL). HEAD holds
  *    the rule with ZERO waivers: every flagged site was normalized in
  *    BOTH engines in round 10 (the normalizer is a semantic no-op on
  *    doubles except on -0.0 — exactly the divergence), and the full
  *    sf0.01 oracle gate re-verified each. The waiver mechanism stays
  *    (summand-keyed) for future non-double sites where `+ lit(0.0)`
  *    would change the output type. Known residual (documented, not
  *    lintable): an aggregate parked in one FRAME and rounded after a
  *    join in another file/frame has no same-file syntactic trail —
  *    that shape stays the cross-SF audit's job (PERF_NOTES R9.1).
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

  private val AggRe =
    ("(?i)(?<![\\w.])(sum|avg|mean|stddev_samp|stddev_pop|var_samp|" +
      "var_pop|covar_samp|covar_pop|corr|list_sum)\\s*\\(").r
  private val RoundRe = "(?<![\\w.])round\\s*\\(".r
  private val OverRe = "(?i)(?<!\\w)over\\s*\\(".r
  private val ColRefRe = """col\("(\w+)"\)""".r
  private val IdentRe = "[A-Za-z_]\\w*".r

  /** Summand-keyed waivers (stripped first-arg text): reviewed sites
    * where the `+ lit(0.0)` normalizer would be WRONG (e.g. it would
    * widen a non-double output type). Empty at HEAD — every flagged
    * double site was normalized instead.
    */
  private val signedRoundWaivers: Set[String] = Set()

  /** Index AFTER the matching close paren, and the end of the FIRST
    * argument (the depth-0 comma, or the close if single-arg), for a
    * call body starting at `i0` (just past the open paren). */
  private[graft] def firstArgSpan(text: String, i0: Int): (Int, Int) = {
    var d = 0; var j = i0; var argEnd = -1; var done = false
    while (j < text.length && !done) {
      text(j) match {
        case '(' => d += 1
        case ')' => if (d == 0) done = true else d -= 1
        case ',' if d == 0 && argEnd < 0 => argEnd = j
        case _ =>
      }
      if (!done) j += 1
    }
    (if (argEnd >= 0) argEnd else j, j + 1)
  }

  /** Balanced backward walk: the expression ending just before `end`
    * (a `)`-closed call with its function name, or a bare token). */
  private def backExpr(text: String, end: Int): String = {
    var i = end - 1
    while (i >= 0 && text(i).isWhitespace) i -= 1
    if (i < 0) ""
    else if (text(i) == ')') {
      var d = 1; i -= 1
      while (i >= 0 && d > 0) {
        if (text(i) == ')') d += 1 else if (text(i) == '(') d -= 1
        i -= 1
      }
      while (i >= 0 && (text(i).isLetterOrDigit ||
        text(i) == '_' || text(i) == '.')) i -= 1
      text.substring(i + 1, end)
    } else {
      var j = i
      while (j >= 0 && (text(j).isLetterOrDigit ||
        "_.:'[]".contains(text(j)))) j -= 1
      text.substring(j + 1, i + 1)
    }
  }

  /** File-local aliases TRANSITIVELY bound to aggregate expressions,
    * from all three binding forms — `EXPR.as("N")` / `.alias`,
    * `.withColumn("N", EXPR)`, SQL `EXPR AS n` — propagated to a
    * fixpoint: an alias is aggregate-derived if its defining text
    * contains an aggregate call OR references an aggregate-derived
    * alias (q248's `__ma` = `__sa / __na` where `__sa` is the sum). */
  private[graft] def aggAliases(text: String): Set[String] = {
    // taint propagates ONLY through precise col("N") references: SQL
    // bare identifiers (short CTE/column names shared across a file's
    // many queries) would over-taint, flagging integer ids and ranks
    def exprRefs(e: String): Set[String] =
      ColRefRe.findAllMatchIn(e).map(_.group(1)).toSet
    val bindings: Seq[(String, String)] =
      """\.(?:as|alias)\(\s*"(\w+)"\s*\)""".r.findAllMatchIn(text)
        .map(m => m.group(1) -> backExpr(text, m.start)).toSeq ++
      """\.withColumn\(\s*"(\w+)"\s*,""".r.findAllMatchIn(text)
        .map { m =>
          val (argEnd, _) = firstArgSpan(text, m.end)
          m.group(1) -> text.substring(m.end, argEnd)
        }.toSeq ++
      "(?i)\\sAS\\s+(\\w+)".r.findAllMatchIn(text)
        .map(m => m.group(1) -> backExpr(text, m.start)).toSeq
    var tainted = bindings
      .filter { case (_, e) => AggRe.findFirstIn(e).nonEmpty }
      .map(_._1).toSet
    var grew = true
    while (grew) {
      val next = tainted ++ bindings.collect {
        case (n, e) if !tainted(n) &&
          exprRefs(e).intersect(tainted).nonEmpty => n
      }
      grew = next.size > tainted.size
      tainted = next
    }
    tainted
  }

  /** (strippedFirstArg, charOffset, arm) of every flagged `round(`
    * site — see the class doc for the three arms. */
  private[graft] def unnormalizedSignedRoundSites(
      text: String): Seq[(String, Int, String)] = {
    val aliases = aggAliases(text)
    RoundRe.findAllMatchIn(text).flatMap { m =>
      val (argEnd, closeEnd) = firstArgSpan(text, m.end)
      val arg = text.substring(m.end, argEnd)
      val stripped = arg.replaceAll("\\s+", "")
      val after = text.substring(closeEnd,
        math.min(text.length, closeEnd + 30))
      val normalized =
        "^\\s*\\+\\s*(lit\\(\\s*0\\.0\\s*\\)|0\\.0)".r
          .findFirstIn(after).nonEmpty
      if (normalized || signedRoundWaivers(stripped)) None
      else {
        val cleaned = stripped.replace("->", "")
          .replace("'-'", "").replace("\"-\"", "")
        val hasAgg = AggRe.findFirstIn(arg).nonEmpty
        val windowed = hasAgg && (OverRe.findFirstIn(arg).nonEmpty ||
          stripped.contains(".over("))
        val signedAgg = hasAgg && cleaned.contains('-')
        val refs =
          ColRefRe.findAllMatchIn(arg).map(_.group(1)).toSet ++
            IdentRe.findAllIn(
              arg.replaceAll("\"[^\"]*\"|'[^']*'", "")).toSet
        val parked = refs.intersect(aliases).nonEmpty
        if (windowed) Some((stripped, m.start, "windowed"))
        else if (signedAgg) Some((stripped, m.start, "signed_agg"))
        else if (parked) Some((stripped, m.start, "parked"))
        else None
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

  test("rule 2a: a seeded unnormalized signed cumulative round is " +
    "flagged, whitespace-robustly; the normalized form passes") {
    val bad =
      """.withColumn("cum", round (sum(col("signed_llr")) . over(
        |  Window.orderBy(col("day"))), 4))""".stripMargin
    assert(unnormalizedSignedRoundSites(bad).map(_._3) == Seq("windowed"))
    val normalized =
      """.withColumn("cum", round(sum(col("signed_llr")).over(
        |  Window.orderBy(col("day"))), 4) + lit(0.0))""".stripMargin
    assert(unnormalizedSignedRoundSites(normalized).isEmpty)
  }

  test("rule 2b: a seeded round over signed aggregate arithmetic is " +
    "flagged in both Scala and SQL forms") {
    val scala =
      """.agg(round(avg(when(col("t"), col("y"))) -
        |  avg(when(!col("t"), col("y"))), 4).as("did"))""".stripMargin
    assert(unnormalizedSignedRoundSites(scala).map(_._3) ==
      Seq("signed_agg"))
    val sql = "SELECT round(avg(a) - avg(b), 4) AS did FROM t"
    assert(unnormalizedSignedRoundSites(sql).map(_._3).contains("signed_agg"))
    val sqlNorm = "SELECT round(avg(a) - avg(b), 4) + 0.0 AS did FROM t"
    assert(unnormalizedSignedRoundSites(sqlNorm).isEmpty)
  }

  test("rule 2c: the seeded q248 shape — an aggregate parked in an " +
    "alias and rounded later — is flagged through the alias hop") {
    val scala =
      """.agg(sum(when(col("__isA"), col("__v"))).as("__sa"),
        |  count(lit(1)).cast("double").as("__na"))
        |.withColumn("__ma", col("__sa") / col("__na"))
        |.select((round(col("__ma"), 4)).as("mean_a"))""".stripMargin
    assert(unnormalizedSignedRoundSites(scala).map(_._3) == Seq("parked"))
    val scalaNorm = scala.replace("round(col(\"__ma\"), 4)",
      "round(col(\"__ma\"), 4) + lit(0.0)")
    assert(unnormalizedSignedRoundSites(scalaNorm).isEmpty)
    val sql =
      """WITH m AS (SELECT dim, avg(val) AS ma FROM e GROUP BY dim)
        |SELECT dim, round(ma, 4) AS mean_a FROM m""".stripMargin
    assert(unnormalizedSignedRoundSites(sql).map(_._3) == Seq("parked"))
    val sqlNorm = sql.replace("round(ma, 4)", "round(ma, 4) + 0.0")
    assert(unnormalizedSignedRoundSites(sqlNorm).isEmpty)
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

  test("HEAD: every signed/aggregate-derived round is -0.0-normalized " +
    "(or summand-waived) in both engines") {
    val hits = mainSources.flatMap { case (f, t) =>
      unnormalizedSignedRoundSites(t).map { case (s, at, arm) =>
        s"$f@${t.take(at).count(_ == '\n') + 1} [$arm]: round($s)"
      }
    }
    assert(hits.isEmpty,
      "unnormalized signed rounds (R9.1 generalized -0.0 rule; append " +
        s"`+ lit(0.0)` / `+ 0.0` in BOTH engines or waive): $hits")
  }
}
