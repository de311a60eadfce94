package graft.ml

import graft.ops.FrequencyEncoder
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types.{LongType, StructType}

/** `ops.FrequencyEncoder` packaged as a Spark ML `Transformer`
  * (SURVEY.md §2.12 M4), so frequency encoding composes inside a
  * `Pipeline` next to StringIndexer/VectorAssembler instead of living
  * as a pre-processing step outside it (the reference applies it
  * manually before building the pipeline,
  * `random_forest_final_class_8.py:77-106`).
  *
  * Note this transformer computes frequencies from the dataset it
  * transforms (matching the reference's semantics, where train-time
  * frequencies are computed on the full pre-split relation). For
  * frozen train-time frequencies applied to unseen data, fit the count
  * table once with `ops.FrequencyEncoder` and join it explicitly.
  */
class FrequencyEncoderModel(override val uid: String) extends Transformer
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("freqEncoder"))

  final val inputCol = new Param[String](this, "inputCol", "column to encode")
  final val outputCol = new Param[String](this, "outputCol", "frequency output column")

  def setInputCol(v: String): this.type = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)

  override def transform(ds: Dataset[_]): DataFrame =
    FrequencyEncoder.encode(ds.toDF(), $(inputCol), $(outputCol))

  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(inputCol)),
      s"input column ${$(inputCol)} missing")
    schema.add($(outputCol), LongType, nullable = true)
  }

  override def copy(extra: ParamMap): FrequencyEncoderModel =
    defaultCopy(extra)
}

/** Param-only persistence (the transformer carries no model data —
  * frequencies are recomputed from the dataset it transforms), so
  * `DefaultParamsReadable` round-trips it losslessly. Without this, a
  * saved Pipeline containing the reference's signature encoder (M4)
  * would throw on `write` — the gap PersistenceSpec pins.
  */
object FrequencyEncoderModel
  extends DefaultParamsReadable[FrequencyEncoderModel]
