package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for a training-data
  * pipeline: media payloads ride as opaque BINARY columns next to a typed
  * metadata struct; decode/feature-extraction runs batch-at-a-time inside
  * mapPartitions so a real implementation can hand each batch to a native
  * codec (or, in PySpark, to a pandas UDF via mapInPandas — identical batch
  * shape). The decoders below are DETERMINISTIC STUBS: this container has no
  * image/audio libraries, so the codec call is faked while every piece of
  * Spark plumbing — schema, null handling, batching, partitioning, row
  * expansion — is real and tested.
  *
  * Scale notes (100 TB of media):
  *  - payloads are large: never groupBy/shuffle the binary column itself;
  *    repartition by (kind) or content-hash range only, and project the
  *    payload away before any wide operation.
  *  - feature extraction is embarrassingly parallel: one narrow stage,
  *    output features (64 floats) are ~1000x smaller than payloads, so
  *    downstream joins/aggregations run on the extracted table.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", IntegerType, nullable = true),
      StructField("format", StringType, nullable = true))), nullable = false)))

  val FeatureDim = 64
  val BatchSize = 64 // models the Arrow/pandas batch shape of mapInPandas

  /** STUB decoder ("???"): a real build links an image/audio codec here and
    * decodes payload -> pixels/samples. The fake derives FeatureDim floats
    * deterministically from the payload bytes so tests can pin outputs. */
  private[multimodal] def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    if (payload != null) {
      var i = 0
      while (i < payload.length) {
        out(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
    }
    out
  }

  /** Deterministic synthetic media table (tests only; the harness testdata
    * has no media table). Payload bytes are a function of media_id. */
  def synthetic(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val payload = Array.tabulate[Byte](128 + (i % 64))(b => ((i * 31 + b * 7) % 251).toByte)
      val meta = kind match {
        case "image" => (Some(64 + i % 512), Some(48 + i % 256), None: Option[Int], None: Option[Int], Some("png"))
        case "audio" => (None, None, Some(16000), Some(1000 + 10 * (i % 300)), Some("wav"))
        case _       => (Some(320), Some(240), None, Some(2000 + 40 * (i % 500)), Some("mp4"))
      }
      (i.toLong, kind, payload, meta)
    }
    rows.toDF("media_id", "kind", "payload", "m")
      .select(col("media_id"), col("kind"), col("payload"),
        struct(col("m._1").as("width"), col("m._2").as("height"),
          col("m._3").as("sample_rate"), col("m._4").as("duration_ms"),
          col("m._5").as("format")).as("meta"))
  }

  /** payload -> features, batch-at-a-time. Output drops the heavy binary
    * column (the at-scale contract: features travel, payloads do not). */
  def extractFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.select("media_id", "kind", "payload")
      .mapPartitions { it =>
        // batch the iterator exactly like an Arrow-based UDF would
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { r =>
            val feats = decodeStub(r.getAs[Array[Byte]]("payload"))
            org.apache.spark.sql.Row(r.getLong(0), r.getString(1), feats.toSeq)
          }
        }
      }(encoder)
  }

  /** Image resize planning: pure metadata math (native columns, codegen'd);
    * the pixel work would happen in the same batch decoder at scale. */
  def resizePlan(df: DataFrame, maxSide: Int): DataFrame =
    df.filter(col("kind") === "image")
      .withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("meta.width"), col("meta.height"))))
      .select(col("media_id"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        round(col("scale"), 4).as("scale"),
        (col("meta.width") * col("scale")).cast("int").as("out_width"),
        (col("meta.height") * col("scale")).cast("int").as("out_height"))

  /** Video frame sampling: one row per sampled frame timestamp — a
    * generator (posexplode over sequence), no UDF. */
  def frameSample(df: DataFrame, everyMs: Int): DataFrame =
    df.filter(col("kind") === "video" && col("meta.duration_ms") > 0)
      .select(col("media_id"), col("meta.duration_ms").as("duration_ms"),
        posexplode(sequence(lit(0), col("meta.duration_ms") - 1, lit(everyMs)))
          .as(Seq("frame_idx", "frame_ms")))
}
