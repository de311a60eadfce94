package graft

/** Every SparkEntry query must run on sf0.001 and (except genuinely-empty
  * results like anti-joins on fully-covered keys) return rows. Catches
  * schema drift, broken manifest wiring, and plan-time errors in one pass.
  */
class QueriesSmokeSpec extends SparkSpec {

  // queries whose correct sf0.001 result may legitimately be empty
  private val mayBeEmpty = Set("q25_jaccard_pairs")

  // queries whose output is engine-specific by nature (sketches, stub
  // codec features): the driver runs its weaker rows-only check;
  // invariants are asserted in dedicated specs instead
  // (AdvancedQueriesSpec for q57's ±5 % bound, MultimodalOpsSpec for
  // q83's codec determinism).
  private val oracleExempt =
    Set("q57_approx_distinct", "q65_approx_percentiles",
      "q83_multimodal_features",
      // model training is not SQL-expressible; determinism + metric
      // bounds are asserted in ClassifierPipelinesSpec
      "q114_ml_eval",
      // same harness as q114 with GBTClassifier (the reference
      // README's promised best binary model)
      "q167_gbt_eval",
      // PCA eigenvectors are model output; orthonormality + variance
      // ordering invariants live in FeatureSurfaceSpec
      "q176_pca",
      // entry points C and B as manifest queries: LDA topics and the
      // RF confusion matrix are model outputs — pipeline invariants in
      // TopicPipelineSpec / ClassifierPipelinesSpec
      "q133_topic_model", "q134_rf_confusion",
      // save/load round trip of a trained model: output is the
      // engine-internal equivalence proof (n_mismatch == 0), pinned
      // at fixture scale in PersistenceSpec
      "q417_model_persistence",
      // streaming inference on the reloaded model: output is the
      // stream-vs-batch serving-parity proof (n_mismatch == 0), pinned
      // at fixture scale in StreamInferenceSpec
      "q419_stream_inference")

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has oracle SQL or documented exemption") {
    val noOracle =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- oracleExempt
    assert(noOracle.isEmpty,
      s"queries without oracle: $noOracle (add SQL or an exemption note)")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val n = fn(spark, sf0001).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }
}
