package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in batched
  * per-partition passes.
  *
  * The Spark side — schema, partition sizing, batch iteration, output
  * shape — is real and tested. The codec calls themselves are STUBBED
  * with a deterministic fake (this environment ships no image/audio
  * libraries); swap `decodeStub` for a real codec (e.g. javax.imageio /
  * ffmpeg bindings) without touching the plumbing.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("codec", StringType))))))

  /** ==== STUB ==== deterministic fake decode: derives plausible metadata
    * and a small feature vector from the byte content. Replace with a real
    * codec; the signature (bytes → (meta, features)) is the contract. */
  private def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val h = java.util.Arrays.hashCode(bytes)
    val width = 64 + math.abs(h % 1024)
    val height = 64 + math.abs((h / 1024) % 1024)
    val features = Array.tabulate(8)(i =>
      math.abs((h * (i + 1)).toFloat / Int.MaxValue))
    (width, height, features)
  }

  /** Decode + feature-extract over binary content, batched per partition
    * (the Scala analog of mapInPandas: one iterator pass per partition,
    * no per-row task overhead, executor-local codec state). */
  def decodeAndFeaturize(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("features", ArrayType(FloatType))))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // per-partition init hook: a real codec would allocate its native
      // context here, once per task, not per row
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val (w, h, feats) = decodeStub(bytes)
        Row(r.getLong(idIdx), w, h, feats.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Resize plan: records the target geometry per row; the pixel transform
    * is part of the stubbed codec stage. Kept as a column op so Catalyst
    * can pipeline it with filters/pruning. */
  def resizePlan(df: DataFrame, widthCol: String, heightCol: String,
      maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide).cast("double") / greatest(col(widthCol), col(heightCol)))
    df.withColumn("target_width", (col(widthCol) * scale).cast("int"))
      .withColumn("target_height", (col(heightCol) * scale).cast("int"))
      .withColumn("needs_resize", scale < 1.0)
  }

  /** Frame-sampling plan for video: evenly spaced sample timestamps from
    * the duration metadata — generates (media_id, frame_ts_ms) rows to
    * feed the decode stage; pure column math, scales with the catalog not
    * the video bytes. */
  def frameSamplePlan(df: DataFrame, idCol: String, durationMsCol: String,
      frames: Int): DataFrame =
    df.select(col(idCol),
      explode(expr(s"transform(sequence(0, ${frames - 1}), " +
        s"i -> cast(i * $durationMsCol / $frames as long))")).as("frame_ts_ms"))

  /** Demo source: wraps any table's text column as opaque binary media so
    * the pipeline runs against the shipped testdata. */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("content"),
      lit("image").as("media_type"),
      lit(null).cast(mediaSchema("meta").dataType).as("meta"))
}
