package graft.ml

import graft.SparkSpec

/** Streaming model serving (q419): a persisted-and-reloaded
  * PipelineModel scoring a bounded file stream must agree ROW-FOR-ROW
  * with the batch transform of the same rows — the streaming/batch
  * serving-parity contract (stateless transformers make the plans
  * semantically identical; this pins it empirically, prediction and
  * 6-dp probability both).
  */
class StreamInferenceSpec extends SparkSpec {

  test("q419: streamed scoring of a reloaded model equals the batch " +
    "transform per row and per class") {
    val out = graft.queries.PipelineQueries
      .q419StreamInference(spark, sf0001).collect()
    assert(out.nonEmpty, "at least one predicted class")
    assert(out.map(_.getLong(1)).sum > 0, "stream must deliver rows")
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"per-class stream/batch counts must match: $r")
      assert(r.getLong(3) == 0L, s"row-level mismatch: $r")
      assert(r.getBoolean(4), s"stream_equals_batch must hold: $r")
    }
  }
}
