package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.head().getAs[T](0)

  test("tokens lowercases, splits on whitespace, drops empties") {
    val df = Seq("  Hello   WORLD\tfoo\n").toDF("t")
      .select(TextOps.tokens(col("t")))
    assert(one[scala.collection.Seq[String]](df) == Seq("hello", "world", "foo"))
  }

  test("tokenSet is distinct, tokenCount counts multiplicity") {
    val df = Seq("a b a c b").toDF("t")
    assert(one[scala.collection.Seq[String]](df.select(TextOps.tokenSet(col("t")))).sorted
      == Seq("a", "b", "c"))
    assert(one[Int](df.select(TextOps.tokenCount(col("t")))) == 5)
  }

  test("stopwordRatio on known mix") {
    // "the cat and the dog": stopwords the, and, the = 3 of 5
    val df = Seq("the cat and the dog").toDF("t")
      .select(TextOps.stopwordRatio(col("t")))
    assert(one[Double](df) == 0.6)
  }

  test("avgTokenLen and punctRatio") {
    val df = Seq("ab cdef!?").toDF("t")
    // tokens: ab (2), cdef!? (6) → avg 4.0
    assert(one[Double](df.select(TextOps.avgTokenLen(col("t")))) == 4.0)
    // 2 punct chars of 9 total
    assert(one[Double](df.select(TextOps.punctRatio(col("t")))) == 0.2222)
  }

  test("fingerprint is order- and multiplicity-insensitive") {
    val fps = Seq("b a a c", "c b a", "a  b\tc")
      .toDF("t").select(TextOps.fingerprint(col("t")))
      .collect().map(_.getString(0)).toSet
    assert(fps.size == 1)
    assert(one[String](Seq("a b d").toDF("t")
      .select(TextOps.fingerprint(col("t")))) != fps.head)
  }

  test("charShingles/wordShingles produce n-grams") {
    val cs = one[scala.collection.Seq[String]](Seq("abcd").toDF("t")
      .select(TextOps.charShingles(col("t"), 3)))
    assert(cs == Seq("abc", "bcd"))
    val ws = one[scala.collection.Seq[String]](Seq("a b c d").toDF("t")
      .select(TextOps.wordShingles(col("t"), 2)))
    assert(ws == Seq("a b", "b c", "c d"))
  }

  test("hash32 is deterministic, seed-sensitive, 32-bit range") {
    val df = Seq("token").toDF("t")
    val h1 = one[Long](df.select(TextOps.hash32(col("t"))))
    val h2 = one[Long](df.select(TextOps.hash32(col("t"))))
    val h3 = one[Long](df.select(TextOps.hash32(col("t"), "1:")))
    assert(h1 == h2 && h1 != h3)
    assert(h1 >= 0L && h1 <= 0xffffffffL)
  }

  test("codegen formulations match the lambda-HOF originals on random text") {
    // tokens/stopwordRatio/avgTokenLen/langIdScore were rewritten from
    // filter/aggregate HOFs (CodegenFallback) to array_remove/array_join
    // forms (PERF_NOTES R3.2); prove output identity on adversarial
    // text: unicode, tabs/newlines, leading/trailing/multi whitespace,
    // empty and whitespace-only strings, stopwords glued to punctuation
    val rnd = new scala.util.Random(7)
    val vocab = TextOps.stopwords ++ TextOps.langProfiles.values.flatten ++
      Seq("Şeker", "ĆafÉ", "x!y", "", "the,", "42", "ab cd")
    val ws = Seq(" ", "  ", "\t", "\n", " \t ")
    val texts = (1 to 60).map { _ =>
      (0 to rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(ws(rnd.nextInt(ws.size)),
          ws(rnd.nextInt(ws.size)), ws(rnd.nextInt(ws.size)))
    } :+ "" :+ "   " :+ "\t\n"
    val df = texts.toDF("t")
    def hofTokens(c: org.apache.spark.sql.Column) =
      filter(split(lower(c), "\\s+"), t => length(t) > 0)
    val got = df.select(
      TextOps.tokens(col("t")).as("toks"),
      TextOps.stopwordRatio(col("t")).as("swr"),
      TextOps.avgTokenLen(col("t")).as("atl"),
      TextOps.langIdScore(col("t"), "en").as("en"))
    val want = df.select(
      hofTokens(col("t")).as("toks"),
      round(size(filter(hofTokens(col("t")),
          t => t.isin(TextOps.stopwords.map(lit): _*))).cast("double") /
        greatest(size(hofTokens(col("t"))), lit(1)), 4).as("swr"),
      round(aggregate(hofTokens(col("t")), lit(0L), (a, t) => a + length(t))
        .cast("double") / greatest(size(hofTokens(col("t"))), lit(1)), 4)
        .as("atl"),
      size(filter(hofTokens(col("t")),
        t => t.isin(TextOps.langProfiles("en").map(lit): _*))).as("en"))
    assert(got.collect().toSeq == want.collect().toSeq)
  }

  test("langIdScore picks the right language on clean samples") {
    val samples = Seq(
      ("the cat is on the mat and it is happy", "en"),
      ("der hund und die katze das ist gut", "de"),
      ("el perro y la casa que es grande", "es"),
      ("le chat et les chiens est grand", "fr"))
    samples.foreach { case (text, expected) =>
      val scores = TextOps.langProfiles.keys.map { l =>
        l -> one[Int](Seq(text).toDF("t")
          .select(TextOps.langIdScore(col("t"), l)))
      }.toMap
      assert(scores.maxBy(_._2)._1 == expected, s"for $text got $scores")
    }
  }

  test("postingLists caps postings and counts full df") {
    val df = (1L to 15L).map(i => (i, "common w" + i)).toDF("doc_id", "text")
    val out = RetrievalOps.postingLists(df, "doc_id", "text", cap = 10)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getString(2))))
      .toMap
    val (dfc, postings) = out("common")
    assert(dfc == 15L) // df counts ALL docs
    assert(postings == (1L to 10L).mkString(" ")) // postings capped at 10
  }

  test("bm25TopK ranks multi-term matches above single-term, respects k") {
    val df = Seq(
      (1L, "spark sql engine"),     // 2 query terms
      (2L, "spark only here"),      // 1 term
      (3L, "nothing relevant"),     // 0 terms → absent
      (4L, "sql sql sql spark"))    // 2 terms, higher tf
      .toDF("doc_id", "text")
    val out = RetrievalOps.bm25TopK(df, "doc_id", "text",
        Seq("spark", "sql"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out.map(_._1).toSet == Set(1L, 2L, 4L))
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(1L)._2 == 2L && byId(2L)._2 == 1L)
    assert(byId(1L)._3 > byId(2L)._3) // two matched terms beat one
    // scores descend in output order
    assert(out.map(_._3).sliding(2).forall(s => s.head >= s.last))
  }
}
