package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The actual media decode (JPEG decode, resampling, frame sampling)
  * requires native libraries not present in this environment, so the
  * decode kernel is a clearly-marked deterministic STUB — but the
  * Spark-side contract is real and tested: schema, partition-batch
  * shape (`mapPartitions` over row batches ≈ `mapInPandas` batch
  * semantics), and metadata extraction stay exactly what a production
  * decode would use; swapping the kernel does not change the plan.
  *
  * At 100 TB the shape matters: media bytes never enter a shuffle —
  * decode/feature-extract is a narrow per-partition map, and only the
  * small feature/metadata columns flow downstream.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta_width", IntegerType, nullable = true),
    StructField("meta_height", IntegerType, nullable = true),
    StructField("meta_duration_ms", LongType, nullable = true)))

  /** Wrap an arbitrary table into the media schema (test harness: text
    * bytes stand in for media payloads).
    */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("image").as("media_type"),
      col(textCol).cast("binary").as("payload"),
      lit(null).cast("int").as("meta_width"),
      lit(null).cast("int").as("meta_height"),
      lit(null).cast("long").as("meta_duration_ms"))

  /** STUB decode kernel: a real implementation would decode the payload
    * (e.g. libjpeg) and emit (width, height, channels, feature vector).
    * The deterministic fake derives pseudo-dimensions from the payload
    * bytes so tests have stable expectations. Marked clearly:
    */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    // ??? <- real decoder goes here; deterministic fake below
    if (payload == null || payload.isEmpty) (0, 0, 0, Array.empty[Float])
    else {
      val n = payload.length
      val w = 16 + (math.abs(payload(0).toInt) % 64)
      val h = 16 + (math.abs(payload(n - 1).toInt) % 64)
      // "feature" = 8 byte-histogram buckets, normalized
      val hist = new Array[Float](8)
      payload.foreach(b => hist((b & 0xFF) / 32) += 1f)
      (w, h, 3, hist.map(_ / n))
    }
  }

  private val decodedSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("features", ArrayType(FloatType), nullable = false)))

  /** Decode + feature-extract over partition-local batches. Narrow
    * transformation: no shuffle, media bytes are dropped on output.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          val (w, h, c, feat) = decodeStub(payload)
          Row(id, w, h, c, payload.length.toLong, feat.toSeq)
        }
      }(enc)
  }
}
