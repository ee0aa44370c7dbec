package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

/** Multimodal (image/audio/video) column handling for a training-data
  * pipeline: media payloads ride as opaque BINARY columns next to a typed
  * metadata struct; decode/feature-extraction runs batch-at-a-time inside
  * mapPartitions so each batch can go to a codec (or, in PySpark, to a
  * pandas UDF via mapInPandas — identical batch shape).
  *
  * PNG and WAV decode are REAL and pure-JVM: `javax.imageio` for PNG
  * (any ImageIO-readable format, in fact) and a hand-rolled RIFF/PCM
  * parser for WAV — no external libraries. Video decode stays a
  * deterministic stub (no pure-JVM codec exists); its batching, null
  * handling and schema plumbing are identical and tested.
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

  /** PNG (or any ImageIO format) -> 8x8 grid of mean luminance in [0, 1].
    * None on undecodable bytes — the caller falls back to the stub so one
    * corrupt payload can never fail a 100 TB extraction stage. */
  private[multimodal] def decodeImage(payload: Array[Byte]): Option[Array[Float]] =
    try {
      Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        val out = new Array[Float](FeatureDim)
        var gy = 0
        while (gy < 8) {
          var gx = 0
          while (gx < 8) {
            val x0 = gx * w / 8; val x1 = math.max(x0 + 1, (gx + 1) * w / 8)
            val y0 = gy * h / 8; val y1 = math.max(y0 + 1, (gy + 1) * h / 8)
            var sum = 0.0; var n = 0
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
                n += 1; x += 1
              }
              y += 1
            }
            out(gy * 8 + gx) = (sum / n / 255.0).toFloat
            gx += 1
          }
          gy += 1
        }
        out
      }
    } catch { case _: Exception => None }

  /** WAV (RIFF, 16-bit PCM) -> 64 slices of mean |amplitude| in [0, 1].
    * Manual chunk walk: fmt must be PCM/16-bit; multi-channel files read
    * channel 0 via the fmt block's blockAlign stride. */
  private[multimodal] def decodeWav(payload: Array[Byte]): Option[Array[Float]] =
    try {
      if (payload.length < 44) None
      else {
        val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
        def tag(off: Int) = new String(payload, off, 4, "US-ASCII")
        if (tag(0) != "RIFF" || tag(8) != "WAVE") None
        else {
          var fmtOk = false; var blockAlign = 2
          var dataOff = -1; var dataLen = 0
          var corrupt = false
          var off = 12
          while (!corrupt && off + 8 <= payload.length) {
            val id = tag(off); val size = bb.getInt(off + 4)
            // a negative size field is corruption — and sizes -8/-9 would
            // make the offset stop advancing (an infinite loop, which the
            // try/catch fallback can never rescue); bail to the stub
            if (size < 0) corrupt = true
            else {
              if (id == "fmt " && size >= 16) {
                val audioFormat = bb.getShort(off + 8)
                val bits = bb.getShort(off + 22)
                blockAlign = math.max(2, bb.getShort(off + 20).toInt)
                fmtOk = audioFormat == 1 && bits == 16
              } else if (id == "data") { dataOff = off + 8; dataLen = size }
              off += 8 + size + (size & 1) // RIFF chunks pad to even length
            }
          }
          if (corrupt || !fmtOk || dataOff < 0) None
          else {
            val n = math.min(dataLen, payload.length - dataOff) / blockAlign
            if (n <= 0) Some(new Array[Float](FeatureDim))
            else {
              val out = new Array[Float](FeatureDim)
              var k = 0
              while (k < FeatureDim) {
                // Long products: k*n overflows Int from ~34M frames
                // (~68 MB of 16-bit mono), silently corrupting the last
                // slices' bounds
                val lo = (k.toLong * n / FeatureDim).toInt
                val hi = math.max(lo + 1, ((k + 1).toLong * n / FeatureDim).toInt)
                var sum = 0.0; var j = lo
                while (j < hi) {
                  sum += math.abs(bb.getShort(dataOff + j * blockAlign).toInt)
                  j += 1
                }
                out(k) = (sum / (hi - lo) / 32768.0).toFloat
                k += 1
              }
              Some(out)
            }
          }
        }
      }
    } catch { case _: Exception => None }

  /** STUB decoder — the one deliberate fake left: video needs a real codec
    * no pure JVM provides. Also the fallback for undecodable payloads, so
    * extraction is total. Derives FeatureDim floats deterministically from
    * the payload bytes so tests can pin outputs. */
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

  /** Dispatch on (kind, format): real decoders for image + wav, stub for
    * video; any decode failure falls back to the stub (never throws). */
  private[multimodal] def decode(kind: String, format: String,
                                 payload: Array[Byte]): Array[Float] =
    if (payload == null) new Array[Float](FeatureDim)
    else (kind, format) match {
      case ("image", _)    => decodeImage(payload).getOrElse(decodeStub(payload))
      case ("audio", "wav") => decodeWav(payload).getOrElse(decodeStub(payload))
      case _               => decodeStub(payload)
    }

  /** Serialize 16-bit mono PCM to a canonical 44-byte-header WAV. */
  private[multimodal] def wavBytes(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Render a deterministic grayscale image and encode it as real PNG. */
  private[multimodal] def pngBytes(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = (seed * 37 + x * 31 + y * 7) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic synthetic media table (tests only; the harness testdata
    * has no media table). Image payloads are REAL PNGs, audio payloads are
    * REAL 16-bit PCM WAVs; video payloads are opaque bytes for the stub. */
  def synthetic(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val (payload, meta) = kind match {
        case "image" =>
          val (w, h) = (8 + i % 9, 8 + i % 5)
          (pngBytes(w, h, i),
            (Some(w), Some(h), None: Option[Int], None: Option[Int], Some("png")))
        case "audio" =>
          val durMs = 20 + i % 50
          val samples = Array.tabulate[Short](16 * durMs)(j =>
            ((((i * 73 + j * 11) % 4096) - 2048) * 8).toShort)
          (wavBytes(samples, 16000),
            (None, None, Some(16000), Some(durMs), Some("wav")))
        case _ =>
          (Array.tabulate[Byte](128 + (i % 64))(b => ((i * 31 + b * 7) % 251).toByte),
            (Some(320), Some(240), None, Some(2000 + 40 * (i % 500)), Some("mp4")))
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
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col("media_id"), col("kind"), col("payload"),
        col("meta.format").as("format"))
      .mapPartitions { it =>
        // batch the iterator exactly like an Arrow-based UDF would
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { r =>
            val feats = decode(r.getString(1), r.getString(3),
              r.getAs[Array[Byte]]("payload"))
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
        // the >=1 floor matches resizeImage's math.max(1, ...): an extreme
        // aspect ratio (1x20 at maxSide 8) would otherwise plan a 0-pixel
        // dimension no image can have
        greatest(lit(1), (col("meta.width") * col("scale")).cast("int")).as("out_width"),
        greatest(lit(1), (col("meta.height") * col("scale")).cast("int")).as("out_height"))

  /** Nearest-neighbor downsample of one decoded image; re-encoded as PNG.
    * Deterministic by construction (explicit source-pixel formula
    * sx = x*w/ow — no AWT interpolation, whose kernels vary by platform).
    * None on undecodable bytes. */
  private[multimodal] def resizeImage(payload: Array[Byte],
                                      maxSide: Int): Option[(Array[Byte], Int, Int)] =
    try {
      Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        // the identical scale/truncation arithmetic as resizePlan, so the
        // physical output dims match the metadata plan row-for-row
        val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
        val ow = math.max(1, (w * scale).toInt)
        val oh = math.max(1, (h * scale).toInt)
        val out = new java.awt.image.BufferedImage(ow, oh,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < oh) {
          val sy = math.min(h - 1, (y.toLong * h / oh).toInt)
          var x = 0
          while (x < ow) {
            val sx = math.min(w - 1, (x.toLong * w / ow).toInt)
            out.setRGB(x, y, img.getRGB(sx, sy) & 0xffffff)
            x += 1
          }
          y += 1
        }
        val bos = new ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        (bos.toByteArray, ow, oh)
      }
    } catch { case _: Exception => None }

  /** REAL pixel resize over the image rows, batch-at-a-time like
    * extractFeatures (same mapPartitions shape a mapInPandas codec stage
    * has). Undecodable payloads yield null payload/dims rather than
    * failing the stage — extraction stays total. Output payloads are
    * resized PNGs ~scale^2 smaller; like features, they travel while the
    * originals stay put. */
  def resizeImages(df: DataFrame, maxSide: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true),
      StructField("out_width", IntegerType, nullable = true),
      StructField("out_height", IntegerType, nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.filter(col("kind") === "image")
      .select(col("media_id"), col("payload"))
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { r =>
            resizeImage(r.getAs[Array[Byte]](1), maxSide) match {
              case Some((bytes, ow, oh)) =>
                org.apache.spark.sql.Row(r.getLong(0), bytes, ow, oh)
              case None =>
                org.apache.spark.sql.Row(r.getLong(0), null, null, null)
            }
          }
        }
      }(encoder)
  }

  /** Video frame sampling: one row per sampled frame timestamp — a
    * generator (posexplode over sequence), no UDF. */
  def frameSample(df: DataFrame, everyMs: Int): DataFrame =
    df.filter(col("kind") === "video" && col("meta.duration_ms") > 0)
      .select(col("media_id"), col("meta.duration_ms").as("duration_ms"),
        posexplode(sequence(lit(0), col("meta.duration_ms") - 1, lit(everyMs)))
          .as(Seq("frame_idx", "frame_ms")))
}
