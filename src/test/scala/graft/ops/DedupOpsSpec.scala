package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  test("exactDedup groups identical content, keeps min id") {
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"))
      .toDF("id", "text")
    val out = DedupOps.exactDedup(df, "text", "id")
      .orderBy("keep_id").collect()
    assert(out.length == 2)
    assert(out.map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_copies")))
      .toSeq == Seq((1L, 3L), (2L, 1L)))
  }

  test("keepFirst retains exactly one row per key, deterministically") {
    val df = Seq((1, 10, "x"), (1, 5, "y"), (2, 7, "z")).toDF("k", "ord", "v")
    val out = DedupOps.keepFirst(df, Seq("k"), Seq(col("ord")))
      .orderBy("k").collect()
    assert(out.map(r => (r.getInt(0), r.getString(2))).toSeq
      == Seq((1, "y"), (2, "z")))
  }

  test("jaccard matches hand-computed overlap and bounds") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(DedupOps.jaccard(col("x"), col("y"))).head().getDouble(0)
    assert(j == 0.5) // |{b,c}| / |{a,b,c,d}|
    val same = df.select(DedupOps.jaccard(col("x"), col("x"))).head().getDouble(0)
    assert(same == 1.0)
  }

  test("minhash: identical sets share full signature; estimates Jaccard") {
    val df = DedupOps.withMinhash(
      Seq(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the quick brown fox jumps over the lazy dog"),
        (3L, "entirely different words appear here today friends"))
        .toDF("id", "text")
        .select(col("id"), TextOps.tokenSet(col("text")).as("toks")),
      col("toks"), 16).drop("toks")
    val rows = df.orderBy("id").collect()
    val sig = (r: org.apache.spark.sql.Row) => (1 to 16).map(r.getLong)
    assert(sig(rows(0)) == sig(rows(1)))
    // disjoint token sets: expected matches = J = 0; with 16 hashes the
    // chance of any collision is negligible for md5-derived 32-bit hashes
    assert(sig(rows(0)) != sig(rows(2)))
    // slices are genuinely distinct hash functions
    assert(sig(rows(0)).distinct.size > 1)
  }

  test("minhashBands + candidatePairs find the duplicate pair only") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six"))
      .toDF("id", "text")
      .select(col("id"), TextOps.tokenSet(col("text")).as("toks"))
    val sig = DedupOps.withMinhash(docs, col("toks"), 8).drop("toks")
    val banded = DedupOps.minhashBands(sig, "id",
      (0 until 8).map(i => s"mh$i"), rowsPerBand = 2)
    assert(banded.count() == 3 * 4) // 4 bands per doc
    val pairs = DedupOps.candidatePairs(banded, "id").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("simhash: near-identical docs are Hamming-close, disjoint docs far") {
    val df = DedupOps.withSimhash(
      Seq(
        (1L, "spark catalyst optimizer rewrites logical plans efficiently"),
        (2L, "spark catalyst optimizer rewrites logical plans quickly"),
        (3L, "unrelated culinary recipes involve butter sugar flour eggs"))
        .toDF("id", "text")
        .select(col("id"), TextOps.tokenSet(col("text")).as("toks")),
      col("toks"), 64, "sh").select("id", "sh")
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(2L)) < ham(m(1L), m(3L)))
  }

  test("native minhash/simhash expressions match the HOF formulation") {
    val docs = graft.Tables.documents(spark, sf0001).limit(200)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    val sigCols = (0 until 8).map(i => s"mh$i")
    val nat = DedupOps.withMinhash(docs, col("toks"), 8)
      .select((col("doc_id") +: sigCols.map(col)): _*)
    val hof = DedupOps.withMinhashHof(docs, col("toks"), 8)
      .select((col("doc_id") +: sigCols.map(col)): _*)
    assert(nat.exceptAll(hof).count() == 0 && hof.exceptAll(nat).count() == 0)

    val natSh = DedupOps.withSimhash(docs, col("toks"), 32, "sh")
      .select("doc_id", "sh")
    val hofSh = DedupOps.withSimhashHof(docs, col("toks"), 32, "sh")
      .select("doc_id", "sh")
    assert(natSh.exceptAll(hofSh).count() == 0
      && hofSh.exceptAll(natSh).count() == 0)
  }

  test("native minhash expression stays inside whole-stage codegen") {
    val docs = graft.Tables.documents(spark, sf0001).limit(10)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    val plan = DedupOps.withMinhash(docs, col("toks"), 8)
      .queryExecution.executedPlan.toString
    // `*(n)` marks a WholeStageCodegen stage; the signature must be
    // computed there, in its OWN projection (one eval, getItems above)
    assert("\\*\\(\\d+\\) Project \\[.*minhash_sigs".r
      .findFirstIn(plan).isDefined, plan)
  }

  test("contaminationHits finds n-gram overlap with the benchmark set only") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // shares 5-gram with bench
      (2L, "one two three four five six"),           // clean
      (3L, "alpha beta gamma delta epsilon other")   // shares the same 5-gram
    ).toDF("doc_id", "text")
    val bench = Seq((99L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val hits = DedupOps.contaminationHits(corpus, bench, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hits == Seq((1L, 1L), (3L, 1L)))
  }

  test("connectedComponents closes transitive duplicate groups") {
    val nodes = (1L to 7L).toDF("id")
    // chain 1-2-3, pair 5-6; 4 and 7 isolated
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("src", "dst")
    val cc = DedupOps.connectedComponents(nodes, "id", edges, "src", "dst")
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(cc == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L),
      (5L, 5L), (6L, 5L), (7L, 7L)))
  }

  test("connectedComponents handles a long chain (diameter > 2)") {
    val n = 12L
    val nodes = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val cc = DedupOps.connectedComponents(nodes, "id", edges, "src", "dst")
    assert(cc.select("cluster_id").distinct().count() == 1)
    assert(cc.filter(col("cluster_id") === 1L).count() == n)
  }

  test("connectedComponents matches driver-side union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    (1 to 3).foreach { trial =>
      val nNodes = 60
      val edges = (1 to 40).map { _ =>
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong)
      }.filter { case (a, b) => a != b }
      val nodes = (0L until nNodes.toLong).toDF("id")
      val got = DedupOps.connectedComponents(
          nodes, "id", edges.toDF("s", "d"), "s", "d")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      // reference: plain union-find with min-id representatives
      val parent = Array.tabulate(nNodes)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0 until nNodes).map(i => i.toLong -> find(i).toLong).toMap
      assert(got == want, s"trial $trial mismatch")
    }
  }

  test("connectedComponents bridges through edge endpoints outside nodes") {
    // 1 and 3 are connected only via endpoint 9, which is NOT in nodes:
    // they must still share a component, and 9 must not appear in output
    val nodes = Seq(1L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 9L), (9L, 3L)).toDF("src", "dst")
    val cc = DedupOps.connectedComponents(nodes, "id", edges, "src", "dst")
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(cc == Seq((1L, 1L), (3L, 1L), (4L, 4L)))
  }

  test("editDistancePairs verifies only in-block pairs, bounded distance") {
    val df = Seq(
      (1L, "red widget"), (2L, "blue widget"), (3L, "teal widget"),
      (4L, "red gear"), (5L, "red widget") // duplicate value: one output
    ).toDF("id", "name")
    val out = DedupOps.editDistancePairs(df, "name",
        split_part(col("name"), lit(" "), lit(2)), maxDist = 4)
      .orderBy("val_a", "val_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    // "red gear" blocks alone; distinct values verified once, a < b
    assert(out == Seq(
      ("blue widget", "red widget", 4),
      ("blue widget", "teal widget", 4),
      ("red widget", "teal widget", 3)))
  }

  test("minhashAccuracy: exact duplicates estimate 1.0; bounds hold") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // exact dup of 1
      (3L, "alpha beta gamma delta zeta"),    // near dup
      (4L, "one two three four five"))
      .toDF("doc_id", "text")
    val out = DedupOps.minhashAccuracy(df, "doc_id",
        TextOps.tokenSet(col("text")), nHashes = 8, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3)))
    val dup = out.find(p => p._1 == 1L && p._2 == 2L)
    assert(dup.exists(p => p._3 == 1.0 && p._4 == 1.0))
    out.foreach { case (_, _, est, jac) =>
      assert(est >= 0.0 && est <= 1.0 && jac > 0.0 && jac <= 1.0)
    }
  }

  test("hammingDist column matches bitCount of xor") {
    val df = Seq((0xF0L, 0x0FL)).toDF("a", "b")
    assert(df.select(DedupOps.hammingDist(col("a"), col("b")))
      .head().getInt(0) == 8)
  }

  test("prefixJaccardJoin: full recall vs brute force on random sets") {
    // deterministic pseudo-random token sets over a 20-token vocab,
    // skewed sizes — exercises the size filter and prefix boundaries
    val rng = new scala.util.Random(7)
    val docs = (1L to 60L).map { id =>
      val n = 3 + rng.nextInt(10)
      (id, Seq.fill(n * 2)(s"t${rng.nextInt(20)}").distinct.take(n))
    }
    val df = docs.toDF("id", "toks")
    for (t <- Seq(0.5, 0.6, 0.75, 0.9)) {
      val got = DedupOps.prefixJaccardJoin(df, "id", col("toks"), t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val brute = (for {
        (a, ta) <- docs; (b, tb) <- docs if a < b
        i = ta.toSet.intersect(tb.toSet).size.toDouble
        j = i / (ta.size + tb.size - i) if j >= t
      } yield (a, b, j)).toSet
      assert(got == brute, s"threshold $t: got ${got.size}, want ${brute.size}")
    }
  }

  test("PPJoin positional filter prunes candidates on a Zipfian vocab " +
    "without losing pairs") {
    // The manifest fixture's 31-token uniform vocabulary makes the
    // positional filter neutral (R4.0c: every doc holds most of the
    // vocab, so positions carry no signal). Real corpora are Zipfian —
    // head tokens appear everywhere, tails are rare — and THERE the
    // filter is the difference between prefix blocking drowning in
    // head-token collisions and a pruned candidate set. Build such a
    // corpus: 200 docs drawing 12 tokens each from a 150-token vocab
    // with p(i) ∝ 1/(i+1), then A/B the candidate counts.
    val rng = new scala.util.Random(13)
    val vocabN = 150
    val weights = (0 until vocabN).map(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    def draw(): Int = {
      val u = rng.nextDouble() * total
      cum.indexWhere(u <= _)
    }
    val docs = (1L to 200L).map { id =>
      (id, Seq.fill(30)(s"t${draw()}").distinct.take(12))
    }
    val df = docs.toDF("id", "toks")
    val t = 0.6
    val withPos = DedupOps.prefixCandidateFrames(df, "id", col("toks"), t,
      positionalFilter = true)
    val noPos = DedupOps.prefixCandidateFrames(df, "id", col("toks"), t,
      positionalFilter = false)
    val nWith = withPos.candidates.count()
    val nNo = noPos.candidates.count()
    assert(nWith < nNo,
      s"positional filter pruned nothing on the Zipfian corpus " +
        s"($nWith vs $nNo candidates)")
    // completeness: verified output identical with and without
    def pairs(f: DedupOps.PrefixJoinFrames) =
      DedupOps.verifyPrefixCandidates(f, t).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(withPos) == pairs(noPos),
      "positional filter dropped a true pair")
  }

  test("prefixJaccardJoin: exact-boundary thresholds are kept") {
    // J(a,b) = 3/5 = 0.6 exactly — integer t*n boundary both sides
    val df = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "c", "e"))).toDF("id", "toks")
    val out = DedupOps.prefixJaccardJoin(df, "id", col("toks"), 0.6)
      .collect()
    assert(out.length == 1 && out.head.getDouble(2) == 0.6)
  }

  test("incrementalNearDup: exactly the cross batch×corpus verified pairs") {
    val rng = new scala.util.Random(11)
    val docs = (1L to 40L).map { id =>
      (id, Seq.fill(8)(s"w${rng.nextInt(12)}").distinct)
    }
    val df = docs.toDF("id", "toks")
    val corpus = df.filter(col("id") % 4 =!= 0)
    val batch = df.filter(col("id") % 4 === 0)
    val got = DedupOps.incrementalNearDup(corpus, batch, "id", col("toks"),
        nHashes = 8, rowsPerBand = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every pair is batch×corpus
    assert(got.forall { case (b, c) => b % 4 == 0 && c % 4 != 0 })
    // and matches the full-pipeline candidates restricted to cross pairs
    val full = DedupOps.minhashAccuracy(df, "id", col("toks"), 8, 4)
      .filter(col("jaccard") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap(p => Seq(p, p.swap))
      .filter { case (b, c) => b % 4 == 0 && c % 4 != 0 }.toSet
    assert(got == full)
  }

  test("containmentHits: asymmetric — short eval inside long doc scores 1") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely unrelated words live in this document")).toDF("doc_id", "text")
    val ev = Seq((100L, "quick brown fox")).toDF("eval_id", "text")
    val out = DedupOps.containmentHits(corpus, ev, "doc_id", "eval_id",
        d => TextOps.tokenSet(col("text")), threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // Jaccard(doc1, eval) = 3/10 — symmetric scoring would miss it
    assert(out.toSeq == Seq((1L, 100L, 1.0)))
  }

  test("bloomContaminationHits output equals the exact broadcast path") {
    val docs = (1L to 40L).map { id =>
      (id, (0 until 12).map(i => s"w${(id * 7 + i * 3) % 29}").mkString(" "))
    }.toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") % 8 === 0)
    val exact = DedupOps.contaminationHits(docs, bench, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloom = DedupOps.bloomContaminationHits(docs, bench, "doc_id", "text",
        n = 3, fpp = 0.05)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bloom == exact) // FPs must die in the re-check
  }
}
