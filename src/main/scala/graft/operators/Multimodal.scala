package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode/feature-extract runs
  * per-partition in batches (the Scala analogue of mapInPandas batch
  * processing). The actual media decode is STUBBED — codec libraries are
  * not in this container — but the Spark-side contract is real: schema,
  * batch iteration, partition-preserving execution, deterministic fake
  * features keyed on content bytes.
  */
object Multimodal {

  val FeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("byte_len", IntegerType, nullable = false),
    StructField("format_guess", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)
  ))

  /** STUB decode: in production this would call an image codec; here it
    * derives deterministic pseudo-features from the payload bytes so the
    * pipeline is testable end-to-end. Pure function of content. */
  private[operators] def decodeStub(id: Long, payload: Array[Byte], featureDim: Int): Row = {
    val fmt =
      if (payload.length >= 2 && payload(0) == 0xFF.toByte && payload(1) == 0xD8.toByte) "jpeg"
      else if (payload.length >= 4 && payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G') "png"
      else "unknown"
    var h = 1125899906842597L // deterministic FNV-ish rolling hash of bytes
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    val rng = new scala.util.Random(h)
    val feats = Array.fill(featureDim)(rng.nextFloat())
    Row(id, payload.length, fmt, 64 + (math.abs(h) % 1024).toInt, 64 + (math.abs(h / 7) % 1024).toInt, feats.toSeq)
  }

  /** Decode + featurize binary payloads per partition. Input needs
    * (idCol: long, payloadCol: binary); output follows FeatureSchema.
    * mapPartitions keeps the work distributed and batch-shaped — swap the
    * stub for a real codec without touching the plan. */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String, featureDim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .rdd.mapPartitions { rows =>
        rows.map { r => decodeStub(r.getLong(0), r.getAs[Array[Byte]](1), featureDim) }
      }
    spark.createDataFrame(rdd, FeatureSchema)
  }

  /** Deterministic frame sampling plan for video-ish payloads: emit
    * (doc_id, frame_idx) rows for every nth "frame" — explode-based, no
    * driver loop. Frame count is metadata (a real pipeline reads it from
    * the container header); here: bytes/1k. */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String, everyNth: Int): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      (length(col(payloadCol).cast("binary")) / 1000).cast("int").as("frame_cnt")
    ).select(
      col("doc_id"),
      explode(sequence(lit(0), greatest(col("frame_cnt") - 1, lit(0)), lit(everyNth))).as("frame_idx")
    )
}
