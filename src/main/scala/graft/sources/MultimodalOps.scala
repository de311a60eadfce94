package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star extension): image/audio/video
  * as opaque `binary` columns + a typed metadata struct, with decode /
  * feature-extract / resize / frame-sample as partition-local operators.
  *
  * Spark-side design (the part that must be real at 100 TB):
  *  - media rows are (id, modality, media: binary, meta: struct) — the
  *    binary payload never enters a shuffle key; all grouping happens on
  *    id/modality/meta fields;
  *  - heavy per-item decode runs inside `mapPartitions` on a typed
  *    Dataset, so one decoder instance is amortized across a partition
  *    (the JVM analogue of a Pandas-UDF batch, without Python workers);
  *  - partitions are sized by `repartition(n)` on the cheap id column
  *    BEFORE decode, so decode parallelism is explicit and independent
  *    of the input file layout.
  *
  * The codec itself is STUBBED: this container has no image/audio
  * libraries, so `StubCodec` derives deterministic pseudo-features from
  * the bytes (xxhash-seeded). Swap in a real codec by implementing
  * `MediaCodec` — every signature/schema stays identical.
  */
object MultimodalOps {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("mime", StringType, nullable = true))), nullable = true)))

  case class MediaMeta(width: Option[Int], height: Option[Int],
                       sample_rate: Option[Int], n_frames: Option[Int],
                       mime: Option[String])
  case class MediaRow(media_id: Long, modality: String,
                      media: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, modality: String,
                           feature: Array[Float], n_bytes: Long)

  /** Pluggable decoder boundary. Implementations must be Serializable
    * (instantiated once per partition, used for every row in it).
    */
  trait MediaCodec extends Serializable {
    /** bytes → fixed-width feature vector (e.g. CLIP embedding, MFCC). */
    def extract(row: MediaRow, dim: Int): Array[Float]
    /** image resize — returns re-encoded bytes + updated meta. */
    def resize(row: MediaRow, w: Int, h: Int): MediaRow
    /** video frame-sample: every `stride`-th frame as a child row. */
    def sampleFrames(row: MediaRow, stride: Int): Seq[MediaRow]
  }

  /** Deterministic stand-in codec: features are seeded by a 64-bit FNV
    * hash of the payload, so identical bytes → identical features across
    * executors and runs (what a real codec guarantees), with zero
    * native deps. NOT a real decoder — swap for one in production.
    */
  object StubCodec extends MediaCodec {
    private def fnv(bytes: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h = (h ^ (bytes(i) & 0xff)) * 0x100000001b3L; i += 1 }
      h
    }
    def extract(row: MediaRow, dim: Int): Array[Float] = {
      val seed = fnv(row.media)
      val out = new Array[Float](dim)
      var x = seed
      var i = 0
      while (i < dim) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17 // xorshift64
        out(i) = (x >>> 11).toFloat / (1L << 53).toFloat - 0.5f
        i += 1
      }
      out
    }
    def resize(row: MediaRow, w: Int, h: Int): MediaRow =
      row.copy(meta = row.meta.copy(width = Some(w), height = Some(h)))
    def sampleFrames(row: MediaRow, stride: Int): Seq[MediaRow] = {
      val n = row.meta.n_frames.getOrElse(0)
      (0 until n by stride).map { f =>
        row.copy(media_id = row.media_id * 100000L + f,
          meta = row.meta.copy(n_frames = Some(1)))
      }
    }
  }

  /** Batch feature extraction: explicit decode parallelism, one codec
    * per partition, binary payload dropped from the output (features
    * only ride the shuffle).
    */
  def extractFeatures(media: Dataset[MediaRow], codec: MediaCodec, dim: Int,
                      parallelism: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.repartition(parallelism, col("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          MediaFeatures(r.media_id, r.modality,
            codec.extract(r, dim), r.media.length.toLong)
        }
      }
  }

  /** Frame sampling as a flatMap — output rows inherit the partition of
    * their parent video, no shuffle.
    */
  def sampleFrames(media: Dataset[MediaRow], codec: MediaCodec,
                   stride: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.flatMap(r => codec.sampleFrames(r, stride))
  }

  /** Synthesize a media table from the documents corpus (text bytes as
    * payload) — gives the plumbing a real, deterministic input without
    * shipping binary fixtures.
    */
  def syntheticMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .map { r =>
        val id = r.getLong(0)
        val bytes = r.getString(1).getBytes("UTF-8")
        val modality = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, modality, bytes,
          MediaMeta(Some(64), Some(64), Some(16000), Some(30), Some("stub")))
      }
  }
}
