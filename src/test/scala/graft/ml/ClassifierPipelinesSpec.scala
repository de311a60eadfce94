package graft.ml

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

/** ML smoke tests (SURVEY.md §5.2-4): fit on sf0.001 frames, assert
  * metric sanity and exact seed reproducibility.
  */
class ClassifierPipelinesSpec extends SparkSpec {

  // orders with a learnable binary target: high-priority flag is noise,
  // but price>median is predictable from price-correlated features; we
  // instead predict order status, which correlates with orderdate.
  private lazy val orders = Tables.orders(spark, sf0001)
    .withColumn("is_high", when(col("o_totalprice") > 150000, "yes").otherwise("no"))
    .withColumn("price_bucket",
      (col("o_totalprice") / 50000).cast("int").cast("string"))

  test("binaryFlow (LR) runs, AUC sane, cells partition the test set") {
    val r = ReferenceFlows.binaryFlow(orders,
      catCols = Seq("o_orderpriority"), numCols = Seq("o_totalprice"),
      labelCol = "is_high", minorityValue = "yes")
    assert(r.auc >= 0.9, s"price-derived label should be separable, auc=${r.auc}")
    val total = r.cells.values.sum
    assert(total == r.predictions.count())
    assert(r.cells.keySet == Set("tp", "fp", "tn", "fn"))
  }

  test("binaryFlow (SVC and GBT) run and beat chance") {
    Seq("svc", "gbt").foreach { kind =>
      val r = ReferenceFlows.binaryFlow(orders,
        catCols = Seq("o_orderpriority"), numCols = Seq("o_totalprice"),
        labelCol = "is_high", minorityValue = "yes", estimatorKind = kind)
      assert(r.auc > 0.8, s"$kind auc=${r.auc}")
    }
  }

  test("binaryFlow is seed-reproducible") {
    def run() = ReferenceFlows.binaryFlow(orders,
      catCols = Seq("o_orderpriority"), numCols = Seq("o_totalprice"),
      labelCol = "is_high", minorityValue = "yes")
    val (a, b) = (run(), run())
    // cells are exact counts → must match exactly; AUC goes through
    // distributed double reduction whose combine order varies with task
    // completion → allow last-ulp jitter (observed 1e-16 under load)
    assert(a.cells == b.cells)
    assert(math.abs(a.auc - b.auc) < 1e-12, s"${a.auc} vs ${b.auc}")
  }

  test("multiclassFlow (RF) produces confusion matrix + importances") {
    val r = ReferenceFlows.multiclassFlow(orders,
      freqCols = Seq("o_custkey"), catCols = Seq("o_orderpriority"),
      numCols = Seq("o_totalprice"), labelCol = "o_orderstatus",
      targetPerClass = 300)
    assert(r.metrics("accuracy") > 0.3) // 3 classes, must beat chance
    val cm = r.confusion.collect()
    assert(cm.nonEmpty && cm.length <= 3)
    val imp = r.importances.collect()
    assert(imp.map(_.getDouble(1)).sum > 0.99) // Gini importances sum to 1
    // perClass recall/precision bounded
    r.perClass.collect().foreach { row =>
      val rec = row.getDouble(1)
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }

  test("RF confusion flow reproduces the reference golden-matrix " +
    "invariants: 8x8 shape, ~0.3*target row sums, seed-42 determinism") {
    // The reference's published RF matrix
    // (random_forest_confusion_matrix.py:16-31) is 8x8 over 8 company-
    // response classes resampled to 15000/class and split 70/30 seed 42
    // — every row sums to ~0.3*15000 (row 0: 4483). Reproduce the same
    // INVARIANTS at local scale with a synthetic 8-class label.
    val target = 300L
    val eight = Tables.orders(spark, sf0001)
      .withColumn("resp8", pmod(col("o_orderkey"), lit(8)).cast("string"))
    def run() = ReferenceFlows.multiclassFlow(eight,
      freqCols = Seq("o_custkey"), catCols = Seq("o_orderpriority"),
      numCols = Seq("o_totalprice"), labelCol = "resp8",
      targetPerClass = target, rfNumTrees = 8)
    val r = run()
    val cm = r.confusion.collect()
    // 8 label rows; predicted columns are a subset of the 8 classes
    assert(cm.length == 8, s"expected 8 actual-class rows, got ${cm.length}")
    assert(cm.head.schema.fields.length <= 9,
      "more predicted columns than classes")
    // each actual-class row holds that class's share of the 30% test
    // split: Poisson(300) resample then Bernoulli(0.3) split → mean 90,
    // sd ~11; accept ±5 sd
    cm.foreach { row =>
      val rowSum = (1 until row.length)
        .map(i => if (row.isNullAt(i)) 0L else row.getLong(i)).sum
      assert(math.abs(rowSum - 0.3 * target) < 55,
        s"row sum $rowSum far from ${0.3 * target}")
    }
    // the reference publishes ONE matrix for seed 42: cells must be
    // bit-for-bit reproducible run-to-run
    def cells(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.toSeq.map(v => if (v == null) 0L else v)).toSeq
    assert(cells(cm) == cells(run().confusion.collect()))
  }

  test("DT confusion flows (CV and TV) reproduce the reference " +
    "golden-matrix invariants: 8x8 shape, ~0.3*target row sums, " +
    "seed-42 determinism") {
    // mirrors the RF golden test above for the DT variants the
    // reference publishes (desicion_tree_confusion_matrix.py:16-31 CV
    // matrix, :52-67 TV matrix; decision_tree_final_class_8.py:395-398)
    // — 8 classes resampled to a common target, split 70/30 seed 42,
    // one PUBLISHED matrix per tuning mode ⇒ bit-reproducible cells
    val target = 300L
    val eight = Tables.orders(spark, sf0001)
      .withColumn("resp8", pmod(col("o_orderkey"), lit(8)).cast("string"))
    Seq("cv", "tvs").foreach { tune =>
      def run() = ReferenceFlows.multiclassFlow(eight,
        freqCols = Seq("o_custkey"), catCols = Seq("o_orderpriority"),
        numCols = Seq("o_totalprice"), labelCol = "resp8",
        targetPerClass = target, treeKind = "dt", tune = tune)
      val cm = run().confusion.collect()
      assert(cm.length == 8,
        s"[$tune] expected 8 actual-class rows, got ${cm.length}")
      assert(cm.head.schema.fields.length <= 9,
        s"[$tune] more predicted columns than classes")
      cm.foreach { row =>
        val rowSum = (1 until row.length)
          .map(i => if (row.isNullAt(i)) 0L else row.getLong(i)).sum
        assert(math.abs(rowSum - 0.3 * target) < 55,
          s"[$tune] row sum $rowSum far from ${0.3 * target}")
      }
      def cells(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => r.toSeq.map(v => if (v == null) 0L else v)).toSeq
      assert(cells(cm) == cells(run().confusion.collect()),
        s"[$tune] DT matrix not seed-reproducible")
    }
  }

  test("multiclassFlow (DT + TVS tuning) runs") {
    val r = ReferenceFlows.multiclassFlow(orders,
      freqCols = Seq.empty, catCols = Seq("price_bucket"),
      numCols = Seq("o_totalprice"), labelCol = "o_orderstatus",
      targetPerClass = 200, treeKind = "dt", tune = "tvs")
    assert(r.metrics("accuracy") >= 0.0)
  }

  test("lrRandomGrid draws n param maps over both ranges (M13)") {
    val lr = ClassifierPipelines.logistic()
    val grid = ClassifierPipelines.lrRandomGrid(lr, n = 4)
    assert(grid.length == 4)
    grid.foreach { pm =>
      val reg = pm.get(lr.regParam).get
      val en = pm.get(lr.elasticNetParam).get
      assert(reg >= 0.01 && reg <= 0.5, s"regParam $reg out of range")
      assert(en >= 0.0 && en <= 1.0, s"elasticNetParam $en out of range")
    }
  }

  test("confusionMatrix pivot matches pairwise counts") {
    import spark.implicits._
    val preds = Seq((0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 1.0), (0.0, 0.0))
      .toDF("label", "prediction")
    val cm = ClassifierPipelines.confusionMatrix(preds).collect()
    val row0 = cm.find(_.getDouble(0) == 0.0).get
    assert(row0.getAs[Long]("0.0") == 2 && row0.getAs[Long]("1.0") == 1)
    val row1 = cm.find(_.getDouble(0) == 1.0).get
    assert(row1.getAs[Long]("0.0") == 0 && row1.getAs[Long]("1.0") == 2)
  }

  test("perClassMetrics matches hand-computed precision/recall") {
    import spark.implicits._
    val preds = Seq((0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 1.0), (0.0, 0.0))
      .toDF("label", "prediction")
    val pc = ClassifierPipelines.perClassMetrics(preds).collect()
      .map(r => r.getDouble(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(pc(0.0) == ((2.0 / 3.0, 1.0)))   // recall 2/3, precision 2/2
    assert(pc(1.0) == ((1.0, 2.0 / 3.0)))   // recall 2/2, precision 2/3
  }
}
