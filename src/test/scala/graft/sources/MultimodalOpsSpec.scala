package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalOpsSpec extends SparkSpec {
  import MultimodalOps._

  private lazy val media = syntheticMedia(spark, sf0001).limit(60).cache()

  test("syntheticMedia yields the documented schema shape") {
    val df = media.toDF()
    assert(df.schema("media").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(df.schema("meta").dataType.isInstanceOf[
      org.apache.spark.sql.types.StructType])
    assert(media.count() == 60)
  }

  test("extractFeatures: fixed dim, deterministic across runs, no binary in output") {
    val f1 = extractFeatures(media, StubCodec, dim = 16, parallelism = 4)
    val rows = f1.collect()
    assert(rows.forall(_.feature.length == 16))
    assert(rows.forall(_.n_bytes > 0))
    val f2 = extractFeatures(media, StubCodec, dim = 16, parallelism = 2)
      .collect()
    // same features regardless of partitioning
    val m1 = rows.map(r => r.media_id -> r.feature.toSeq).toMap
    val m2 = f2.map(r => r.media_id -> r.feature.toSeq).toMap
    assert(m1 == m2)
    // identical payloads → identical features (codec determinism)
    assert(f1.schema.fieldNames.toSet ==
      Set("media_id", "modality", "feature", "n_bytes"))
  }

  test("extractFeatures parallelism controls partitioning") {
    val f = extractFeatures(media, StubCodec, dim = 4, parallelism = 3)
    assert(f.rdd.getNumPartitions == 3)
  }

  test("sampleFrames explodes videos by stride, keeps others' frame count") {
    val videos = media.filter(col("modality") === "video")
    val n = videos.count()
    val sampled = sampleFrames(videos, StubCodec, stride = 10)
    // 30 frames, stride 10 → 3 child rows per video
    assert(sampled.count() == n * 3)
    val metas = sampled.collect()
    assert(metas.forall(_.meta.n_frames.contains(1)))
  }

  test("resize updates meta only (stub)") {
    val r = media.head()
    val resized = StubCodec.resize(r, 32, 32)
    assert(resized.meta.width.contains(32) && resized.meta.height.contains(32))
    assert(resized.media.sameElements(r.media))
  }
}
