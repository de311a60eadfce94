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

  test("tokenBudgetSelect orders NULL scores LAST (the window form's " +
    "DESC NULLS LAST), not into the sharded family's NULLS-FIRST shard") {
    // doc 9 has real tokens but a NULL score (q87's stopword ratio on
    // NULL text is the realistic source): it must be considered AFTER
    // every scored doc — routed to rangeSharded's shard 0 instead, it
    // would be selected FIRST and eat the whole budget
    val df = Seq(
      ("en", 1L, "a b c", Option(1.0)),
      ("en", 2L, "d e", Option(0.5)),
      ("en", 9L, "w x y z", Option.empty[Double])
    ).toDF("lang", "doc_id", "text", "score")
    val out = CurationOps.tokenBudgetSelect(df, "lang", "doc_id", "text",
        col("score"), budget = 5L)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSeq.sortBy(_._1)
    // order is 1 (cum 3), 2 (cum 5), 9 (cum 9 > 5, excluded); the
    // pre-fix NULLS-FIRST placement selected exactly {9} instead
    assert(out == Seq((1L, 3L), (2L, 5L)),
      s"NULL-score doc not ordered last: $out")
    // with headroom the NULL-score doc IS selected — last
    val wide = CurationOps.tokenBudgetSelect(df, "lang", "doc_id", "text",
        col("score"), budget = 100L)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSeq.sortBy(_._1)
    assert(wide == Seq((1L, 3L), (2L, 5L), (9L, 9L)), s"got: $wide")
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

  test("chunkTokens windows cover all tokens with the given stride") {
    // 10 tokens, size 4, stride 3 → starts 0,3,6 cover to 10? start 6
    // covers 7..10 → last needed start = ceil((10-4)/3) = 2 → 3 chunks
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")),
                 (2L, "a b"),   // shorter than chunk → 1 chunk of 2
                 (3L, " ")      // no tokens → dropped
    ).toDF("doc_id", "text")
    val out = CurationOps.chunkTokens(df, "doc_id", "text", 4, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      .sortBy(t => (t._1, t._2))
    assert(out == Seq((1L, 0, 4L), (1L, 1, 4L), (1L, 2, 4L),
      (2L, 0, 2L)))
    // chunk hashes of identical windows are identical across docs
    val dup = Seq((1L, "x y z w"), (2L, "x y z w")).toDF("doc_id", "text")
    val hs = CurationOps.chunkTokens(dup, "doc_id", "text", 4, 3)
      .select("chunk_hash").collect().map(_.getLong(0)).toSeq
    assert(hs.distinct.size == 1)
  }

  test("chunkTokens coverage identity holds on the real corpus") {
    // last chunk always ends exactly at the doc's token count:
    // (max chunk_idx) · stride + len(last chunk) == n_tokens, for every
    // (chunkSize, stride) — windows cover all tokens, nothing beyond
    val docs = graft.Tables.documents(spark, sf0001)
    for ((size, stride) <- Seq((32, 24), (16, 16), (8, 3))) {
      val got = CurationOps.chunkTokens(docs, "doc_id", "text", size, stride)
        .groupBy("doc_id")
        .agg(max(col("chunk_idx")).as("mi"),
          max_by(col("n_tokens"), col("chunk_idx")).as("lastLen"))
      val n = docs.select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("n"))
      val bad = got.join(n, "doc_id")
        .filter(col("mi") * stride + col("lastLen") =!= col("n"))
      assert(bad.count() == 0, s"coverage identity broken at ($size, $stride)")
    }
  }

  test("chunkDedupStats keeps first occurrence corpus-wide") {
    // doc 1 and doc 2 are identical → doc 1 keeps its chunk, doc 2 none;
    // doc 3 is unique → keeps all
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val out = CurationOps.chunkDedupStats(df, "doc_id", "text", 4, 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(_._1)
    assert(out == Seq((1L, 1L, 1L, 1.0), (2L, 1L, 0L, 0.0),
      (3L, 1L, 1L, 1.0)))
  }

  test("mixtureSelect respects per-group budgets and drops unweighted groups") {
    val df = Seq(
      ("en", 1L, "one two three"), ("en", 2L, "four five six"),
      ("en", 3L, "seven eight nine"),
      ("de", 4L, "eins zwei"), ("xx", 5L, "dropped lang")
    ).toDF("lang", "doc_id", "text")
    val out = CurationOps.mixtureSelect(df, "lang", "doc_id", "text",
        Map("en" -> 0.6, "de" -> 0.4), totalBudget = 10L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
      .toSeq.sortBy(t => (t._1, t._2))
    // en budget 6 → exactly two 3-token docs fit; de budget 4 → doc 4
    assert(out.count(_._1 == "en") == 2)
    assert(out.filter(_._1 == "en").forall(t => t._3 <= 6 && t._4 == 6L))
    assert(out.filter(_._1 == "de") == Seq(("de", 4L, 2L, 4L)))
    assert(!out.exists(_._1 == "xx"))
  }

  test("packBins partitions every doc and bounds bin token ranges") {
    val df = (0L until 60L).map(i => (i, ("w " * 10).trim)).toDF("doc_id", "text")
    val out = CurationOps.packBins(df, "doc_id", "text",
        shards = 3, capacity = 50L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(out.map(_._3).sum == 60L)      // every doc lands in one bin
    assert(out.map(_._4).sum == 600L)     // every token accounted for
    // equal 10-token docs divide capacity 50 → exact packing: every
    // bin except possibly each shard's last holds exactly 5 docs
    out.groupBy(_._1).foreach { case (_, bins) =>
      val sorted = bins.sortBy(_._2)
      assert(sorted.map(_._2) == (0L until sorted.size.toLong)) // dense ids
      sorted.dropRight(1).foreach(b => assert(b._3 == 5L && b._4 == 50L))
    }
  }

  test("vocabEncode assigns rank ids and flags OOV as -1") {
    val df = Seq(
      (1L, "b b b a a c"),
      (2L, "c c d")
    ).toDF("doc_id", "text")
    // corpus counts: b=3, c=3, a=2, d=1 → vocab(2) ties 3/3 break
    // token-asc: b=0, c=1; a and d are OOV
    val out = CurationOps.vocabEncode(df, "doc_id", "text", vocabSize = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4))).toSeq.sortBy(_._1)
    assert(out == Seq(
      (1L, 6L, 2L, 0.3333, "0 0 0 -1 -1 1"),
      (2L, 3L, 1L, 0.3333, "1 1 -1")))
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

  test("bigramLogProb matches the hand-computed add-one model") {
    // corpus bigrams: d1 = (a b)(b a)(a b), d2 = (a b)
    // c2(a,b)=3 c2(b,a)=1; c1(a)=3 c1(b)=1; V=3 (corpus vocab counts
    // ALL docs' tokens, including bigram-less d3's "solo")
    // p(b|a) = (3+1)/(3+3) = 2/3, p(a|b) = (1+1)/(1+3) = 1/2
    val df = Seq((1L, "a b a b"), (2L, "a b"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = CurationOps.bigramLogProb(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pba = math.log(2.0 / 3.0)
    val pab = math.log(1.0 / 2.0)
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    // doc 3 has one token -> no bigrams -> omitted
    assert(out.map(t => (t._1, t._2)).toSeq == Seq((1L, 3L), (2L, 1L)))
    assert(out(0)._3 == r4((pba + pab + pba) / 3))
    assert(out(1)._3 == r4(pba))
  }

  test("bpeTrain: greedy argmax chain with nested-bracket rendering") {
    // round 1: th (100+50+30=180) beats he (150); round 2: [th]e
    // (100+50=150); round 3 merges round 2's OUTPUT with m -> the
    // rendered pair must nest as [[th]e]m with count 50
    val words = Seq(("the", 100L), ("them", 50L), ("this", 30L))
      .toDF("w", "f")
    val out = CurationOps.bpeTrain(words, rounds = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1, "th", 180L), (2, "[th]e", 150L), (3, "[[th]e]m", 50L)))
  }

  test("bpeTrain: stops early on a fully-merged vocabulary and keeps " +
    "the completed rounds (advice r8)") {
    // one 2-char word: round 1 merges "ab" -> char(1) (1 symbol), so
    // round 2's pair frame is EMPTY. Without the early stop, the 0-row
    // argmax crossJoin-annihilates the merge table and round 1 is lost.
    val words = Seq(("ab", 7L)).toDF("w", "f")
    val out = CurationOps.bpeTrain(words, rounds = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1, "ab", 7L)),
      s"only the completed round must survive: ${out.toSeq}")
    // sentinel contract bounds
    intercept[IllegalArgumentException] {
      CurationOps.bpeTrain(words, rounds = 0)
    }
    intercept[IllegalArgumentException] {
      CurationOps.bpeTrain(words, rounds = 32)
    }
  }

  test("featureHash: tf sums to token count, buckets bounded, " +
    "same token same bucket") {
    val df = Seq((1L, "alpha beta alpha gamma"), (2L, "alpha alpha"))
      .toDF("doc_id", "text")
    val out = CurationOps.featureHash(df, "doc_id", "text", dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.forall { case (_, b, _) => b >= 0 && b < 8 })
    assert(out.filter(_._1 == 1L).map(_._3).sum == 4) // 4 tokens
    assert(out.filter(_._1 == 2L).map(_._3).sum == 2)
    // doc 2 is all-"alpha": exactly one bucket, tf 2 — and that same
    // bucket must carry alpha's mass (tf >= 2) in doc 1 too
    val a2 = out.filter(_._1 == 2L)
    assert(a2.length == 1 && a2.head._3 == 2L)
    val alphaBucket = a2.head._2
    assert(out.exists(t => t._1 == 1L && t._2 == alphaBucket && t._3 >= 2L))
    intercept[IllegalArgumentException] {
      CurationOps.featureHash(df, "doc_id", "text", dim = 0)
    }
  }
}
