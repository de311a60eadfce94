package graft

import graft.queries.AnalyticsQueries
import org.apache.spark.sql.functions._

/** Invariant specs for the round-6 extension operators (X165–X173) —
  * properties the DuckDB hash-compare can't express directly: bounds,
  * monotonicity, subset relations, distribution-theory identities.
  */
class AnalyticsQueriesSpec extends SparkSpec {

  test("q236: sketch lands inside its claimed tolerance on all quantiles") {
    val rows = AnalyticsQueries.q236QuantileSketch(spark, sf0001).collect()
    assert(rows.length == 4)
    assert(rows.forall(_.getBoolean(2)), "a quantile flagged out of tolerance")
    // percentiles are monotone in q
    val byQ = rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byQ("p25") <= byQ("p50") && byQ("p50") <= byQ("p75") &&
      byQ("p75") <= byQ("p95"))
  }

  test("q237: RRF scores bounded by 2/61 and fused list dominated by " +
    "dual-listed docs") {
    val rows = AnalyticsQueries.q237RrfFusion(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val score = r.getDouble(3)
      assert(score > 0 && score <= 2.0 / 61 + 1e-9, s"RRF score $score")
      // doc in both lists ⇒ score of two reciprocal terms
      if (!r.isNullAt(1) && !r.isNullAt(2))
        assert(score >= 1.0 / (60 + 30) * 2 - 1e-9)
    }
    // descending by fused score
    val scores = rows.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("q238: funnel counts are monotone non-increasing, conversions in [0,1]") {
    val rows = AnalyticsQueries.q238Funnel(spark, sf0001).collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("view", "click", "purchase"))
    val ns = rows.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a },
      s"funnel widened: ${ns.toSeq}")
    rows.drop(1).foreach { r =>
      val conv = r.getDouble(3)
      assert(conv >= 0 && conv <= 1)
      assert(r.getDouble(4) >= 0) // latency non-negative
    }
  }

  test("q239: SNM pairs are a subset of the exact threshold join") {
    val snm = AnalyticsQueries.q239SortedNeighborhood(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = ops.DedupOps.prefixJaccardJoin(
        Tables.documents(spark, sf0001), "doc_id",
        ops.TextOps.tokenSet(col("text")), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(snm.nonEmpty, "SNM found nothing on the near-dup fixture")
    assert(snm.subsetOf(exact),
      s"SNM emitted pairs the exact join rejects: ${(snm -- exact).take(3)}")
  }

  test("q240: KL divergences non-negative, JSD symmetric and ≤ ln 2") {
    val rows = AnalyticsQueries.q240TokenKlDrift(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (klAb, klBa, jsd) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(klAb >= -1e-9 && klBa >= -1e-9, s"negative KL: $klAb / $klBa")
      assert(jsd >= -1e-9 && jsd <= math.log(2) + 1e-9, s"JSD $jsd")
      // JSD is bounded by both one-directional KLs' average
      assert(jsd <= (klAb + klBa) / 2 + 1e-6)
    }
  }

  test("q241: bootstrap CI brackets the point mean and is reproducible") {
    val a = AnalyticsQueries.q241PoissonBootstrap(spark, sf0001).collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      val (mean, lo, hi) = (r.getDouble(1), r.getDouble(3), r.getDouble(4))
      assert(r.getLong(2) == 32)
      assert(lo <= hi)
      assert(mean >= lo && mean <= hi,
        s"point mean $mean outside CI [$lo, $hi]")
    }
    // content-keyed uniforms ⇒ bit-identical on a second run
    val b = AnalyticsQueries.q241PoissonBootstrap(spark, sf0001).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("q242: OHLC bars satisfy low ≤ open/close ≤ high") {
    val rows = AnalyticsQueries.q242OhlcBars(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (o, h, l, c) = (r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6))
      assert(l <= h)
      assert(o >= l - 1e-9 && o <= h + 1e-9, s"open $o outside [$l, $h]")
      assert(c >= l - 1e-9 && c <= h + 1e-9, s"close $c outside [$l, $h]")
      assert(r.getLong(2) > 0)
    }
  }

  test("q243: SPRT verdict matches its own bounds; cum LLR is a cumsum") {
    val rows = AnalyticsQueries.q243Sprt(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val bound = math.log(19.0)
    rows.foreach { r =>
      val (llr, verdict) = (r.getDouble(3), r.getString(4))
      val expected = if (llr >= bound) "accept_h1"
        else if (llr <= -bound) "accept_h0" else "continue"
      assert(verdict == expected, s"verdict $verdict at llr $llr")
    }
  }

  test("q245: rolling window never exceeds 14 days; slope null only on " +
    "degenerate windows") {
    val rows = AnalyticsQueries.q245RollingRegression(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(2)
      assert(n >= 1 && n <= 14, s"window of $n days")
      if (r.isNullAt(3))
        assert(n == 1, s"null slope on a $n-day window (variance > 0)")
    }
  }

  test("q246: paths are well-formed trigrams, counts sorted desc and " +
    "sum to the corpus trigram count") {
    val rows = AnalyticsQueries.q246EventPaths(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach(r => assert(r.getString(0).split(" > ").length == 3))
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    // 5 event types → ≤125 distinct trigrams; with 20 returned the
    // fixture's total must dominate the tail — just bound it
    val total = Tables.events(spark, sf0001)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .agg(sum(greatest(col("n") - 2, lit(0L)))).head().getLong(0)
    assert(ns.sum <= total)
  }

  test("q247: FS weights respect the threshold and the field algebra") {
    val rows = AnalyticsQueries.q247FellegiSunter(spark, sf0001).collect()
    assert(rows.nonEmpty, "no match candidates on the fixture")
    val maxW = math.log(0.9 / 0.2) + math.log(0.85 / 0.02) +
      math.log(0.8 / 0.1)
    rows.foreach { r =>
      val (nAgree, w) = (r.getInt(2), r.getDouble(3))
      assert(w >= 3.0 - 1e-9, s"below threshold: $w")
      assert(w <= maxW + 1e-6, s"above max weight: $w")
      assert(nAgree >= 1 && nAgree <= 3)
      // the threshold is unreachable without the balance-δ agreement
      assert(nAgree >= 2)
    }
  }

  test("q248: one row per dim, drifted flag consistent with smd") {
    val rows = AnalyticsQueries.q248EmbeddingDrift(spark, sf0001).collect()
    assert(rows.length == 64)
    assert(rows.map(_.getInt(0)).toSeq == (0 until 64))
    rows.foreach { r =>
      val smd = r.getDouble(3)
      assert(!smd.isNaN && !smd.isInfinite)
      assert(r.getBoolean(4) == (math.abs(smd) > 0.1))
    }
  }

  test("q249: variant extraction partitions the event stream exactly") {
    val rows = AnalyticsQueries.q249VariantJson(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(2)).sum
    assert(total == Tables.events(spark, sf0001).count(),
      "variant path dropped or duplicated rows")
    rows.foreach { r =>
      val dec = r.getLong(1)
      assert(dec >= 0 && dec <= 9, s"k decile $dec out of range")
    }
  }

  test("q250: normalized values span the global range and preserve " +
    "within-group order") {
    val rows = AnalyticsQueries.q250QuantileNormalize(spark, sf0001)
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val (gMin, gMax) = (rows.map(_._2).min, rows.map(_._2).max)
    rows.foreach { case (_, _, n) =>
      assert(n >= gMin - 1e-6 && n <= gMax + 1e-6,
        s"normalized $n outside global range [$gMin, $gMax]")
    }
    // monotone within each language: higher raw score ⇒ ≥ normalized
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val sorted = rs.sortBy(_._2)
      sorted.zip(sorted.tail).foreach { case ((_, s1, n1), (_, s2, n2)) =>
        if (s1 < s2) assert(n1 <= n2 + 1e-6,
          s"$lang: normalization broke order ($s1->$n1, $s2->$n2)")
      }
    }
  }

  test("q251: decomposition reassembles (trend+seasonal+residual = y)") {
    val rows = AnalyticsQueries.q251StlDecompose(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val withTrend = rows.filter(!_.isNullAt(2))
    assert(withTrend.nonEmpty, "no full 7-day windows")
    withTrend.foreach { r =>
      val (y, t, sn, res) = (r.getLong(1).toDouble, r.getDouble(2),
        r.getDouble(3), r.getDouble(4))
      // components rounded to 2dp independently → allow 2-cent slack
      assert(math.abs(t + sn + res - y) <= 0.02 + 1e-9,
        s"day ${r.getDate(0)}: $t + $sn + $res != $y")
    }
  }

  test("q252: conformal coverage near nominal on every class") {
    val rows = AnalyticsQueries.q252Conformal(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cov = r.getDouble(4)
      assert(r.getBoolean(5), s"coverage_ok false (coverage $cov)")
      assert(cov <= 1.0 && cov >= 0.75,
        s"coverage $cov implausibly far from nominal 0.9")
      assert(r.getDouble(3) > 0) // qhat positive on spread data
    }
  }

  test("q253: bitmap DAU equals count_distinct and retention bounded") {
    val rows = AnalyticsQueries.q253BitmapRetention(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val exact = Tables.events(spark, sf0001)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (day, dau, retained) = (r.getDate(0).toString, r.getLong(1),
        r.getLong(2))
      assert(dau == exact(day),
        s"$day: bitmap dau $dau != exact ${exact(day)}")
      assert(retained <= dau)
      if (!r.isNullAt(3)) {
        val rate = r.getDouble(3)
        assert(rate >= 0 && rate <= 1.0, s"retention $rate")
      }
    }
  }

  test("q254: linear attribution conserves touched purchase value") {
    val rows = AnalyticsQueries.q254MultiTouch(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 2)
    val credited = rows.map(_.getDouble(3)).sum
    // credit per purchase sums to its value ⇒ total credit equals the
    // value of purchases with ≥1 touch, which is ≤ all purchase value
    val allPurchase = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .agg(sum(col("value"))).head().getDouble(0)
    assert(credited <= allPurchase + 0.05,
      s"credited $credited exceeds purchase value $allPurchase")
    assert(credited > 0)
  }

  test("q255: cohort offset-0 retention is exactly 1.0 and rates bounded") {
    val rows = AnalyticsQueries.q255CohortRetention(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (off, rate) = (r.getLong(1), r.getDouble(3))
      if (off == 0) assert(rate == 1.0)
      assert(rate > 0 && rate <= 1.0, s"retention $rate")
    }
  }

  test("q256: the first ingest batch is 100% novel, later ones are not") {
    val rows = AnalyticsQueries.q256NoveltyCurve(spark, sf0001).collect()
    assert(rows.length == 10)
    val byBatch = rows.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(byBatch(0L) == 1.0, s"batch 0 novelty ${byBatch(0L)}")
    rows.foreach(r => assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0))
    assert(byBatch.values.min < 1.0,
      "no cross-batch duplicate chunks on the near-dup fixture?")
  }

  test("q257: neighborhood features are means of real order values") {
    val rows = AnalyticsQueries.q257NeighborAgg(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val (mn, mx) = {
      val r = Tables.orders(spark, sf0001)
        .agg(min(col("o_totalprice")), max(col("o_totalprice"))).head()
      (r.getDouble(0), r.getDouble(1))
    }
    rows.foreach { r =>
      assert(r.getLong(2) >= 1)
      val f = r.getDouble(3)
      assert(f >= mn - 0.01 && f <= mx + 0.01,
        s"neighbor feature $f outside order-value range [$mn, $mx]")
    }
  }

  test("q258: analytic s-curve is monotone in J and probabilities bounded") {
    val rows = AnalyticsQueries.q258LshScurve(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val sorted = rows.sortBy(_.getDouble(0))
    sorted.foreach { r =>
      val p = r.getDouble(3)
      assert(p >= 0 && p <= 1, s"analytic p $p")
      assert(r.getDouble(2) >= 0)
      assert(r.getLong(1) > 0)
    }
    val ps = sorted.map(_.getDouble(3))
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b },
      "s-curve not monotone in the Jaccard bucket")
  }

  test("q259: Spearman rho bounded and strongly positive for " +
    "token-vs-char length") {
    val rows = AnalyticsQueries.q259Spearman(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rho = r.getDouble(2)
      assert(rho >= -1.0 - 1e-9 && rho <= 1.0 + 1e-9)
      assert(rho > 0.5,
        s"${r.getString(0)}: token/char length rho $rho suspiciously low")
    }
  }

  test("q260: state occupancy shares sum to 1") {
    val rows = AnalyticsQueries.q260StateOccupancy(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getDouble(3)).sum
    assert(math.abs(total - 1.0) <= 0.001, s"shares sum to $total")
    rows.foreach(r => assert(r.getDouble(2) >= 0))
  }

  test("q261: binaryFile content digests match the source table") {
    val got = AnalyticsQueries.q261BinarySource(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got.size == 20)
    val want = Tables.documents(spark, sf0001).filter(col("doc_id") < 20)
      .select(col("doc_id"), md5(col("text").cast("binary")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want, "file bytes diverge from source text bytes")
  }

  test("q262: text round trip is lossless in count and characters") {
    val r = AnalyticsQueries.q262TextSource(spark, sf0001).head()
    val src = Tables.documents(spark, sf0001)
      .agg(count(lit(1)), sum(length(col("text")))).head()
    assert(r.getLong(0) == src.getLong(0))
    assert(r.getLong(1) == src.getLong(1))
  }

  test("q263: surrogate keys are dense 1..N and fact totals conserved") {
    val rows = AnalyticsQueries.q263StarSchema(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length),
      "dim keys not dense")
    val factTotal = rows.map(_.getLong(3)).sum
    assert(factTotal == Tables.orders(spark, sf0001).count(),
      "fact rows lost or duplicated through the dimension")
  }

  test("q264: the TPC-H fixture is referentially intact") {
    val rows = AnalyticsQueries.q264RefIntegrity(spark, sf0001).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getLong(2) == 0 && r.getBoolean(3),
        s"${r.getString(0)}: ${r.getLong(2)} orphans")
      assert(r.getLong(1) > 0)
    }
  }

  test("q265: pair counts bounded by total character transitions") {
    val rows = AnalyticsQueries.q265BpePairs(spark, sf0001).collect()
    assert(rows.length == 20)
    val ns = rows.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getString(0).length == 1 && r.getString(1).length == 1)
    }
  }

  test("q266: EMD non-negative, bounded by the value range") {
    val rows = AnalyticsQueries.q266Wasserstein(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val range = {
      val r = Tables.orders(spark, sf0001)
        .agg(max(col("o_totalprice")) - min(col("o_totalprice"))).head()
      r.getDouble(0)
    }
    rows.foreach { r =>
      val emd = r.getDouble(2)
      // EMD between distributions on [lo, hi] cannot exceed hi − lo
      assert(emd >= 0 && emd <= range + 0.01, s"EMD $emd outside [0, $range]")
      assert(r.getLong(1) > 0)
    }
  }

  test("q267: negatives are label-disjoint from their anchors and " +
    "reproducible") {
    val q = AnalyticsQueries.q267NegativeSampling(spark, sf0001)
    val a = q.collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      val n = r.getLong(1)
      assert(n >= 1 && n <= 5, s"${r.getLong(0)}: $n negatives")
    }
    val b = AnalyticsQueries.q267NegativeSampling(spark, sf0001).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "hash-addressed draws not reproducible")
  }

  test("q268: Heaps' beta is sublinear (0 < beta < 1) on the fixture") {
    val r = AnalyticsQueries.q268HeapsLaw(spark, sf0001).head()
    assert(r.getLong(0) > 0)
    val beta = r.getDouble(1)
    assert(beta > 0 && beta < 1,
      s"vocabulary growth beta $beta not sublinear")
  }

  test("q269: candidate volume shrinks and precision grows with bits") {
    val rows = AnalyticsQueries.q269SrpSweep(spark, sf0001).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(2, 4, 8))
    val cands = rows.map(_.getLong(1))
    assert(cands.zip(cands.tail).forall { case (a, b) => b <= a },
      s"more bits did not prune candidates: ${cands.toSeq}")
    // verified pairs are a subset of candidates at every point
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    val prec = rows.map(_.getDouble(3))
    assert(prec.zip(prec.tail).forall { case (a, b) => b >= a - 1e-9 },
      s"precision not monotone: ${prec.toSeq}")
  }

  test("q244: rules have confidence in (0,1], symmetric pair counts, " +
    "and lift consistent across directions") {
    val rows = AnalyticsQueries.q244AssocRules(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byPair = rows.map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    byPair.foreach { case ((a, b), (n, sup, conf, lift)) =>
      assert(n >= 2)
      assert(conf > 0 && conf <= 1.0)
      assert(sup > 0 && sup <= 1.0)
      assert(lift > 0)
      // the mirrored rule exists with the same n_both and lift
      val (n2, _, _, lift2) = byPair((b, a))
      assert(n2 == n)
      assert(math.abs(lift2 - lift) <= 1e-3,
        s"lift asymmetry: $lift vs $lift2")
    }
  }
}
