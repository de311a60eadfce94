package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("withRepetition scores duplicated n-grams, 0 for short docs") {
    val df = Seq(
      (1L, "a b a b a b"),        // 3-grams: aba, bab, aba, bab → 2/4 distinct
      (2L, "one two three four"), // all distinct → 0.0
      (3L, "a b")                 // < n tokens → n_ngrams 0, rep 0.0
    ).toDF("doc_id", "text")
    val out = CurationOps.withRepetition(df, "text", n = 3)
      .select("doc_id", "n_ngrams", "rep_frac")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      .sortBy(_._1)
    assert(out == Seq((1L, 4L, 0.5), (2L, 2L, 0.0), (3L, 0L, 0.0)))
  }

  test("tokenBudgetSelect keeps top-score docs until the group budget") {
    // scores: doc 1 = 1.0 (all stopwords), doc 2 = 0.5, doc 3 = 0.0;
    // budget 5 tokens → doc 1 (3) + doc 2 (2) = 5, doc 3 would overflow
    val df = Seq(
      ("en", 1L, "the and of"),
      ("en", 2L, "the zebra"),
      ("en", 3L, "zebra quagga"),
      ("de", 4L, "wort")
    ).toDF("lang", "doc_id", "text")
    val out = CurationOps.tokenBudgetSelect(df, "lang", "doc_id", "text",
        TextOps.stopwordRatio(col("text")), budget = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq
      .sortBy(t => (t._1, t._2))
    assert(out == Seq(("de", 4L, 1L), ("en", 1L, 3L), ("en", 2L, 5L)))
  }

  test("shardShuffle keeps every row, bounds shards, ranks contiguously") {
    val df = (0L until 100L).toDF("id")
    val out = CurationOps.shardShuffle(df, "id", numShards = 4)
      .select("id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(out.map(_._1).sorted == (0L until 100L)) // permutation, no loss
    assert(out.forall(t => t._2 >= 0 && t._2 < 4))
    // per-shard positions are contiguous 1..n
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted == (1 to rows.size))
    }
    // deterministic: a second run yields the identical assignment
    val again = CurationOps.shardShuffle(df, "id", numShards = 4)
      .select("id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(out.sortBy(_._1) == again.sortBy(_._1))
    // hash-balanced: no shard is empty or hogs the corpus
    val sizes = out.groupBy(_._2).view.mapValues(_.size)
    assert(sizes.values.min > 10 && sizes.values.max < 40, sizes.toMap)
  }

  test("docFrequency counts docs (not occurrences) and applies the cutoff") {
    val df = Seq(
      (1L, "common common rare1"),
      (2L, "common rare2"),
      (3L, "common other"),
      (4L, "other only")
    ).toDF("doc_id", "text")
    val out = CurationOps.docFrequency(df, "text", minFrac = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      .sortBy(_._1)
    // common: 3 docs (multiplicity in doc 1 counted once) = 0.75; other: 2 = 0.5
    assert(out == Seq(("common", 3L, 0.75), ("other", 2L, 0.5)))
  }
}
