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
  * PNG, WAV and Y4M decode are REAL and pure-JVM: `javax.imageio` for
  * PNG (any ImageIO-readable format, in fact), a hand-rolled RIFF/PCM
  * parser for WAV, and a hand-rolled YUV4MPEG2 parser for uncompressed
  * video — no external libraries. Compressed codecs (H.264 etc.) would
  * need a native library; undecodable payloads fall back to a
  * deterministic stub so extraction stays total either way.
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

  /** Parsed Y4M stream: dimensions, frame rate, and the mean luminance of
    * each frame's Y plane in [0, 1]. */
  private[multimodal] case class Y4mVideo(
      width: Int, height: Int, fpsNum: Int, fpsDen: Int, frameLuma: Array[Float])

  /** YUV4MPEG2 (Y4M) -> per-frame mean luminance. Y4M is the uncompressed
    * video container (header line `YUV4MPEG2 W.. H.. F..:.. C420`, then
    * `FRAME\n` + raw planar YUV per frame) — the same class of pure-JVM
    * parse as the RIFF/WAV walk above, and what closes the video-decode
    * stub. None on any corruption (caller falls back; extraction stays
    * total). Supports C420*, C422, C444, Cmono chroma layouts; only the Y
    * plane is read for luminance. */
  private[multimodal] def decodeY4mFrames(payload: Array[Byte]): Option[Y4mVideo] =
    walkY4m(payload) { (p, yOff, w, h) =>
      val ySize = w * h
      var sum = 0.0
      var j = 0
      while (j < ySize) { sum += (p(yOff + j) & 0xff); j += 1 }
      (sum / ySize / 255.0).toFloat
    }.map { case (w, h, fn, fd, lumas) => Y4mVideo(w, h, fn, fd, lumas) }

  /** Shared Y4M container walk (header parse, chroma-aware frame strides,
    * corruption -> None) parameterized on the per-frame Y-plane extractor —
    * the one walk backs both the mean-luma decode above and the per-frame
    * spatial grids the video dedup needs. */
  private def walkY4m[T](payload: Array[Byte])(
      frameFn: (Array[Byte], Int, Int, Int) => T)(
      implicit ct: scala.reflect.ClassTag[T]): Option[(Int, Int, Int, Int, Array[T])] =
    try {
      val magic = "YUV4MPEG2".getBytes("US-ASCII")
      if (payload == null || payload.length < magic.length + 1 ||
          !payload.take(magic.length).sameElements(magic)) None
      else {
        val hdrEnd = payload.indexOf('\n'.toByte)
        if (hdrEnd < 0 || hdrEnd > 512) None // header is one short ASCII line
        else {
          val header = new String(payload, 0, hdrEnd, "US-ASCII")
          var w = -1; var h = -1; var fn = 25; var fd = 1; var chroma = "420"
          header.split(' ').drop(1).foreach { tok =>
            if (tok.nonEmpty) tok.charAt(0) match {
              case 'W' => w = tok.drop(1).toInt
              case 'H' => h = tok.drop(1).toInt
              case 'F' => tok.drop(1).split(':') match {
                case Array(a, b) => fn = a.toInt; fd = b.toInt
                case _ => throw new NumberFormatException(tok)
              }
              case 'C' => chroma = tok.drop(1)
              case _ => () // I (interlace), A (aspect), X (extensions): ignored
            }
          }
          // dimension sanity: positive, bounded (a hostile header must not
          // allocate gigabytes), and even where the chroma layout subsamples
          val dimsOk = w > 0 && h > 0 && w <= 16384 && h <= 16384 && fn > 0 && fd > 0 &&
            (chroma match {
              case c if c.startsWith("420") => (w % 2 == 0) && (h % 2 == 0)
              case "422" => w % 2 == 0
              case "444" | "mono" => true
              case _ => false
            })
          if (!dimsOk) None
          else {
            val ySize = w.toLong * h
            val chromaSize = chroma match {
              case c if c.startsWith("420") => (w / 2).toLong * (h / 2) * 2
              case "422" => (w / 2).toLong * h * 2
              case "444" => w.toLong * h * 2
              case _ => 0L // mono
            }
            val frameBytes = ySize + chromaSize
            val frames = scala.collection.mutable.ArrayBuffer.empty[T]
            var off = hdrEnd + 1
            var corrupt = false
            val frameMagic = "FRAME".getBytes("US-ASCII")
            while (!corrupt && off < payload.length) {
              // each frame: "FRAME" [params] '\n' then raw planes
              if (off + frameMagic.length > payload.length ||
                  !java.util.Arrays.equals(
                    payload, off, off + frameMagic.length,
                    frameMagic, 0, frameMagic.length)) corrupt = true
              else {
                val nl = payload.indexOf('\n'.toByte, off)
                if (nl < 0 || nl - off > 512 || nl + 1 + frameBytes > payload.length)
                  corrupt = true
                else {
                  val yOff = nl + 1
                  frames += frameFn(payload, yOff, w, h)
                  off = (yOff + frameBytes).toInt
                }
              }
            }
            if (corrupt || frames.isEmpty) None
            else Some((w, h, fn, fd, frames.toArray))
          }
        }
      }
    } catch { case _: Exception => None }

  /** Y4M -> one 8x8 mean-luminance grid PER FRAME (the exact spatial grid
    * [[decodeImage]] computes for stills, over the Y plane) — the input of
    * per-frame perceptual hashing. None on any corruption. */
  private[multimodal] def decodeY4mFrameGrids(payload: Array[Byte]): Option[Array[Array[Float]]] =
    walkY4m(payload) { (p, yOff, w, h) =>
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
            while (x < x1) { sum += (p(yOff + y * w + x) & 0xff); n += 1; x += 1 }
            y += 1
          }
          out(gy * 8 + gx) = (sum / n / 255.0).toFloat
          gx += 1
        }
        gy += 1
      }
      out
    }.map(_._5)

  /** Y4M -> FeatureDim floats: the per-frame luminance series resampled
    * into 64 slices of mean, exactly how the WAV decoder treats its
    * amplitude series — so all three modalities land in the same feature
    * space shape. */
  private[multimodal] def decodeY4m(payload: Array[Byte]): Option[Array[Float]] =
    decodeY4mFrames(payload).map { v =>
      val n = v.frameLuma.length
      val out = new Array[Float](FeatureDim)
      var k = 0
      while (k < FeatureDim) {
        val lo = (k.toLong * n / FeatureDim).toInt
        val hi = math.max(lo + 1, ((k + 1).toLong * n / FeatureDim).toInt)
        var sum = 0.0; var j = lo
        while (j < math.min(hi, n)) { sum += v.frameLuma(j); j += 1 }
        out(k) = (sum / math.max(1, math.min(hi, n) - lo)).toFloat
        k += 1
      }
      out
    }

  /** Fallback decoder for undecodable payloads, so extraction is total.
    * Derives FeatureDim floats deterministically from
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

  /** Dispatch on (kind, format): real decoders for image + wav + y4m
    * video; any decode failure falls back to the stub (never throws). */
  private[multimodal] def decode(kind: String, format: String,
                                 payload: Array[Byte]): Array[Float] =
    if (payload == null) new Array[Float](FeatureDim)
    else (kind, format) match {
      case ("image", _)    => decodeImage(payload).getOrElse(decodeStub(payload))
      case ("audio", "wav") => decodeWav(payload).getOrElse(decodeStub(payload))
      case ("video", "y4m") => decodeY4m(payload).getOrElse(decodeStub(payload))
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

  /** Serialize a real YUV4MPEG2 stream (C420, 25 fps): every pixel of
    * frame f carries luma `(seed * 37 + f * 11) % 256`, chroma neutral —
    * so frame f's mean luminance is exactly that value / 255 (the test
    * golden). */
  private[multimodal] def y4mBytes(w: Int, h: Int, frames: Int, seed: Int): Array[Byte] = {
    require(w % 2 == 0 && h % 2 == 0, "C420 needs even dims")
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII")
    val frameHdr = "FRAME\n".getBytes("US-ASCII")
    val frameBytes = w * h + (w / 2) * (h / 2) * 2
    val bb = ByteBuffer.allocate(header.length + frames * (frameHdr.length + frameBytes))
    bb.put(header)
    var f = 0
    while (f < frames) {
      bb.put(frameHdr)
      val y = ((seed * 37 + f * 11) % 256).toByte
      var i = 0
      while (i < w * h) { bb.put(y); i += 1 }
      i = 0
      while (i < (w / 2) * (h / 2) * 2) { bb.put(128.toByte); i += 1 }
      f += 1
    }
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

  /** Render a deterministic 4x4-BLOCK pattern image as real PNG: the image
    * divides into 16 blocks, each a flat gray level hashed from (seed,
    * block) — LOW-frequency structure, so the 8x8 mean-luminance grid sees
    * well-separated cell values and the aHash bits are stable (the
    * sawtooth `pngBytes` pattern averages to mid-gray everywhere, which is
    * exactly the degenerate input for a mean-threshold hash). `delta`
    * brightens the single block (1, 2) (clamped): a NEAR-duplicate — only
    * the <= 4 grid cells overlapping that block (plus a delta/16 global
    * mean shift) can flip, so crafted variants land at small hamming while
    * distinct seeds redraw all 16 blocks independently (~32 expected). */
  private[multimodal] def pngBlockBytes(w: Int, h: Int, seed: Int,
                                        delta: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val bx = x * 4 / w; val by = y * 4 / h
        // splitmix64-style finalizer per (seed, block): a LINEAR block hash
        // would make two seeds differ by a near-constant gray shift across
        // all 16 blocks — which aHash (correctly) ignores as brightness —
        // so distinct groups must get genuinely independent block values
        var z = seed * 0x9E3779B97F4A7C15L + (bx * 4 + by + 1) * 0xBF58476D1CE4E5B9L
        z ^= z >>> 30; z *= 0x94D049BB133111EBL; z ^= z >>> 31
        val base = ((z >>> 16) % 256L).toInt
        val g0 = if (bx == 1 && by == 2) base + delta else base
        val g = math.max(0, math.min(255, g0))
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic image-dedup corpus, generated ON EXECUTORS (the at-scale
    * shape: payloads are born distributed and never collect to the driver):
    * `groups` pattern groups x 3 rows each — the base rendering, a
    * byte-identical re-encode (exact duplicate), and a one-block
    * brightness perturbation (near-duplicate). Distinct groups render
    * independent block patterns. Schema matches [[MediaSchema]]'s columns
    * [[extractFeatures]] consumes. */
  def syntheticImages(spark: SparkSession, groups: Int): DataFrame = {
    import spark.implicits._
    spark.range(groups * 3L).as[Long]
      .mapPartitions(_.map { id =>
        val g = (id / 3).toInt
        val v = (id % 3).toInt
        val (w, h) = (16 + g % 9, 12 + g % 7)
        (id, pngBlockBytes(w, h, 1000 + g * 17, if (v == 2) 14 else 0))
      })
      .toDF("media_id", "payload")
      .select(col("media_id"), lit("image").as("kind"), col("payload"),
        struct(lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          lit(null).cast("int").as("sample_rate"), lit(null).cast("int").as("duration_ms"),
          lit("png").as("format")).as("meta"))
  }

  /** Deterministic audio-dedup corpus, generated ON EXECUTORS (same
    * at-scale discipline as [[syntheticImages]]): `groups` envelope
    * groups x 3 rows — the base clip, a volume-scaled copy (EXACT
    * perceptual duplicate: the envelope hash thresholds against the
    * clip's OWN mean, so uniform gain cancels exactly like aHash's
    * brightness), and a one-segment loudness flip (near-duplicate).
    * Segment loudness comes from an LCG over (group, segment), so
    * distinct groups' envelopes sit ~32 bits apart. Payloads are REAL
    * 16-bit PCM WAVs through the same [[decodeWav]] path production
    * bytes take; 64 segments x 50 samples align 1:1 with the decoder's
    * 64 mean-|amplitude| slices. */
  def syntheticAudio(spark: SparkSession, groups: Int): DataFrame = {
    import spark.implicits._
    spark.range(groups * 3L).as[Long]
      .mapPartitions(_.map { id =>
        val g = (id / 3).toInt
        val v = (id % 3).toInt
        val segs = Array.tabulate(64) { s =>
          // murmur3 finalizer — full avalanche down to bit 0. A linear
          // (g, s) mix mod a prime, and even a single golden-ratio
          // multiply, left the LOW bit periodic (idx*ODD keeps bit0 =
          // idx&1), which put group-to-group hamming inside the near-dup
          // band (measured: thousands of spurious cross-group pairs)
          var x = g.toLong * 64 + s
          x = (x ^ (x >>> 33)) * 0xFF51AFD7ED558CCDL
          x = (x ^ (x >>> 33)) * 0xC4CEB9FE1A85EC53L
          x ^= (x >>> 33)
          val bit = (x & 1L) == 1L
          if (v == 2 && s == g % 64) !bit else bit
        }
        val amp = if (v == 1) 0.35 else 0.85
        val samples = Array.tabulate(64 * 50) { i =>
          val a = if (segs(i / 50)) amp else amp * 0.04
          (math.sin(i * 0.37) * a * 30000).toShort
        }
        (id, wavBytes(samples, 16000))
      })
      .toDF("media_id", "payload")
      .select(col("media_id"), lit("audio").as("kind"), col("payload"),
        struct(lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          lit(16000).as("sample_rate"), lit(200).as("duration_ms"),
          lit("wav").as("format")).as("meta"))
  }

  /** Deterministic video-dedup corpus, generated ON EXECUTORS (the
    * [[syntheticImages]] discipline): `groups` scene-sequence groups x 3
    * rows — the base clip (scenes 0..11), a TRIMMED copy (scenes 3..11:
    * the same content minus the first three scenes, the archetypal video
    * near-dup that frame-index-aligned matching would miss), and a
    * one-cell-per-frame perturbation (each frame's aHash within hamming 1
    * of the base's). Scene content: an 8x8 block pattern whose cell
    * brightness comes from the murmur3 finalizer over (group, scene,
    * cell) — distinct groups' frames sit ~32 bits apart, exactly the
    * audio generator's separation argument. Payloads are REAL Y4M streams
    * through the same [[decodeY4mFrameGrids]] path production bytes take;
    * 16x16 C420 frames make each 8x8 grid cell an exact 2x2 pixel block. */
  def syntheticVideos(spark: SparkSession, groups: Int): DataFrame = {
    import spark.implicits._
    spark.range(groups * 3L).as[Long]
      .mapPartitions(_.map { id =>
        val g = (id / 3).toInt
        val v = (id % 3).toInt
        val scenes = if (v == 1) (3 until 12) else (0 until 12)
        val frames = scenes.map { sc =>
          Array.tabulate(64) { c =>
            var x = (g.toLong * 12 + sc) * 64 + c
            x = (x ^ (x >>> 33)) * 0xFF51AFD7ED558CCDL
            x = (x ^ (x >>> 33)) * 0xC4CEB9FE1A85EC53L
            x ^= (x >>> 33)
            val bright = (x & 1L) == 1L
            // perturbed variant: flip ONE cell per frame — the mean moves
            // by 150/64 ~ 2.3 brightness units, far inside every other
            // cell's +/-75 margin, so exactly one aHash bit flips
            val flip = v == 2 && c == sc % 64
            if (bright ^ flip) 200 else 50
          }
        }
        (id, y4mGridBytes(16, 16, frames))
      })
      .toDF("media_id", "payload")
      .select(col("media_id"), lit("video").as("kind"), col("payload"),
        struct(lit(16).as("width"), lit(16).as("height"),
          lit(null).cast("int").as("sample_rate"), lit(480).as("duration_ms"),
          lit("y4m").as("format")).as("meta"))
  }

  /** Encode per-frame 8x8 brightness grids as a real Y4M stream (each grid
    * cell an exact (w/8)x(h/8) pixel block). */
  private[multimodal] def y4mGridBytes(w: Int, h: Int,
                                       frames: Seq[Array[Int]]): Array[Byte] = {
    require(w % 16 == 0 && h % 16 == 0, "need whole even-sized cells for C420")
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII")
    val frameHdr = "FRAME\n".getBytes("US-ASCII")
    val frameBytes = w * h + (w / 2) * (h / 2) * 2
    val bb = ByteBuffer.allocate(header.length + frames.size * (frameHdr.length + frameBytes))
    bb.put(header)
    frames.foreach { grid =>
      bb.put(frameHdr)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          bb.put(grid((y * 8 / h) * 8 + x * 8 / w).toByte)
          x += 1
        }
        y += 1
      }
      var i = 0
      while (i < (w / 2) * (h / 2) * 2) { bb.put(128.toByte); i += 1 }
    }
    bb.array()
  }

  /** Per-FRAME aHash fingerprints for video rows: real Y4M decode to one
    * 8x8 spatial grid per frame (mapPartitions, batch-at-a-time — the
    * codec-stage shape), then the exact [[aHash]] thresholding each frame
    * against its OWN mean. Output (media_id, frame_idx, phash) — the
    * fingerprint stream the any-frame-match banding joins. Undecodable
    * payloads contribute no rows (a corrupt video cannot fail the stage). */
  def frameAHashes(df: DataFrame): DataFrame = {
    val gridSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(gridSchema)
    val grids = df.filter(col("kind") === "video")
      .select(col("media_id"), col("payload"))
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { r =>
            decodeY4mFrameGrids(r.getAs[Array[Byte]](1)).toSeq.flatMap {
              _.zipWithIndex.map { case (g, f) =>
                org.apache.spark.sql.Row(r.getLong(0), f, g.toSeq)
              }
            }
          }
        }
      }(encoder)
    aHash(grids).select("media_id", "frame_idx", "phash")
  }

  /** 64-bit average-hash (aHash) fingerprint over an [[extractFeatures]]
    * frame: bit i is set iff 8x8-grid cell i is brighter than the image's
    * OWN mean — globally brightness-invariant, locally structure-
    * sensitive, the classic perceptual near-dup fingerprint. Computed with
    * codegen'd HOFs only (bitwise OR accumulation — no UDF, no overflow
    * even at bit 63), so it feeds the same banded-LSH + hamming machinery
    * the text simhash families use. */
  def aHash(features: DataFrame): DataFrame =
    features
      .withColumn("mu",
        expr("aggregate(features, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE)) / 64.0"))
      .withColumn("phash",
        expr("aggregate(sequence(0, 63), 0L, (a, i) -> " +
          "a | IF(CAST(element_at(features, i + 1) AS DOUBLE) > mu, shiftleft(1L, i), 0L))"))
      .drop("mu")

  /** Deterministic synthetic media table (tests only; the harness testdata
    * has no media table). Image payloads are REAL PNGs, audio payloads are
    * REAL 16-bit PCM WAVs, video payloads are REAL Y4M streams — except
    * every 6th video, which stays opaque bytes so the stub fallback path
    * keeps coverage in every downstream test. */
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
        case _ if i % 18 == 14 => // every 6th video row: undecodable -> stub
          (Array.tabulate[Byte](128 + (i % 64))(b => ((i * 31 + b * 7) % 251).toByte),
            (Some(320), Some(240), None, Some(2000 + 40 * (i % 500)), Some("mp4")))
        case _ =>
          val (w, h) = (16 + 2 * (i % 8), 8 + 2 * (i % 4))
          val frames = 8 + i % 12 // 25 fps -> 40 ms per frame
          (y4mBytes(w, h, frames, i),
            (Some(w), Some(h), None, Some(frames * 40), Some("y4m")))
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

  /** Frame sampling with REAL decode: same (media_id, frame_idx, frame_ms)
    * grid as [[frameSample]], plus the mean luminance of the Y4M frame
    * nearest each sampled timestamp (`mean_luma`). Undecodable payloads
    * keep their metadata-driven rows with a null luma — the stage is
    * total, one corrupt video cannot fail a 100 TB extraction. Decode
    * runs batch-at-a-time in mapPartitions (the codec-stage shape);
    * each payload is decoded ONCE for all its sampled frames. */
  def frameSampleFeatures(df: DataFrame, everyMs: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_ms", IntegerType, nullable = false),
      StructField("mean_luma", FloatType, nullable = true)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.filter(col("kind") === "video" && col("meta.duration_ms") > 0)
      .select(col("media_id"), col("payload"), col("meta.duration_ms").as("dur"))
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { r =>
            val id = r.getLong(0)
            val dur = r.getInt(2)
            val video = decodeY4mFrames(r.getAs[Array[Byte]](1))
            (0 until dur by everyMs).zipWithIndex.map { case (ms, idx) =>
              val luma = video match {
                case Some(v) =>
                  // frame at ms: floor(ms * fps / 1000), clamped into range
                  val f = math.min(v.frameLuma.length - 1,
                    (ms.toLong * v.fpsNum / (1000L * v.fpsDen)).toInt)
                  java.lang.Float.valueOf(v.frameLuma(f))
                case None => null.asInstanceOf[java.lang.Float]
              }
              org.apache.spark.sql.Row(id, idx, ms, luma)
            }
          }
        }
      }(encoder)
  }
}
