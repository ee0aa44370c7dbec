package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSuite extends SparkSpec {

  private def media = Multimodal.synthetic(spark, 200)

  test("synthetic media table matches the declared schema") {
    val df = media
    assert(df.schema("payload").dataType.typeName === "binary")
    assert(df.schema("meta").dataType.typeName === "struct")
    assert(df.count() === 200)
    assert(df.select("kind").distinct().count() === 3)
  }

  test("feature extraction: schema, row preservation, no payload downstream") {
    val feats = Multimodal.extractFeatures(media)
    assert(feats.columns.toSeq === Seq("media_id", "kind", "features"))
    assert(feats.count() === 200)
    val lens = feats.select(size(col("features")).as("n")).distinct().collect()
    assert(lens.map(_.getInt(0)).toSeq === Seq(Multimodal.FeatureDim))
  }

  test("feature extraction is deterministic across runs and partitionings") {
    val a = Multimodal.extractFeatures(media.repartition(2))
      .orderBy("media_id").collect().map(_.getSeq[Float](2))
    val b = Multimodal.extractFeatures(media.repartition(7))
      .orderBy("media_id").collect().map(_.getSeq[Float](2))
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }

  test("null payload decodes to the zero vector, not a crash") {
    val withNull = media.withColumn("payload",
      when(col("media_id") === 0, lit(null).cast("binary")).otherwise(col("payload")))
    val row = Multimodal.extractFeatures(withNull)
      .filter(col("media_id") === 0).collect().head
    assert(row.getSeq[Float](2).forall(_ == 0.0f))
  }

  test("PNG decode golden: 8x8 grayscale image maps each pixel to its cell") {
    // 8x8 image -> the 8x8 luminance grid is exactly per-pixel, so every
    // feature is a hand-computable gray/255
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) {
      val g = (y * 8 + x) * 4
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val feats = Multimodal.decodeImage(bos.toByteArray).get
    for (y <- 0 until 8; x <- 0 until 8) {
      val want = ((y * 8 + x) * 4 / 255.0).toFloat
      assert(math.abs(feats(y * 8 + x) - want) < 1e-6f,
        s"cell ($x,$y): ${feats(y * 8 + x)} vs $want")
    }
  }

  test("WAV decode golden: 64 samples map each sample to its slice") {
    val samples = Array.tabulate[Short](64)(j => ((j - 32) * 1000).toShort)
    val bytes = Multimodal.wavBytes(samples, 16000)
    val feats = Multimodal.decodeWav(bytes).get
    for (j <- 0 until 64) {
      val want = (math.abs((j - 32) * 1000) / 32768.0).toFloat
      assert(math.abs(feats(j) - want) < 1e-6f, s"slice $j: ${feats(j)} vs $want")
    }
  }

  test("image features are real decode output (mean luminance in [0,1])") {
    // the stub ACCUMULATES bytes (values routinely > 1); a real luminance
    // mean cannot leave [0, 1] — so this separates decode paths
    val feats = Multimodal.extractFeatures(media.filter(col("kind") === "image"))
      .collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val f = r.getSeq[Float](2)
      assert(f.forall(v => v >= 0.0f && v <= 1.0f), s"media ${r.getLong(0)}")
      assert(f.exists(_ > 0.0f))
    }
  }

  test("audio features are real decode output and corrupt payloads fall back") {
    val feats = Multimodal.extractFeatures(media.filter(col("kind") === "audio"))
      .collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val f = r.getSeq[Float](2)
      assert(f.forall(v => v >= 0.0f && v <= 1.0f), s"media ${r.getLong(0)}")
      assert(f.exists(_ > 0.0f))
    }
    // corrupt bytes under an image/png label: decodeImage fails, the stub
    // fallback still yields a deterministic vector (extraction is total)
    import spark.implicits._
    val junk = Array.tabulate[Byte](100)(i => (i * 3).toByte)
    val corrupt = Seq((0L, "image", junk, (Some(8), Some(8), Option.empty[Int],
      Option.empty[Int], Some("png")))).toDF("media_id", "kind", "payload", "m")
      .select(col("media_id"), col("kind"), col("payload"),
        struct(col("m._1").as("width"), col("m._2").as("height"),
          col("m._3").as("sample_rate"), col("m._4").as("duration_ms"),
          col("m._5").as("format")).as("meta"))
    val got = Multimodal.extractFeatures(corrupt).collect().head.getSeq[Float](2)
    assert(got === Multimodal.decodeStub(junk).toSeq)
  }

  test("corrupt WAV chunk sizes fall back instead of hanging the chunk walk") {
    // size field -8 makes `off += 8 + size + (size & 1)` advance by zero —
    // without the negative-size guard this loops forever (and no exception
    // fires, so the try/catch fallback can never rescue it)
    val good = Multimodal.wavBytes(Array.tabulate[Short](64)(_.toByte), 16000)
    val evil = good.clone()
    val bb = java.nio.ByteBuffer.wrap(evil).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(16, -8) // fmt chunk size -> -8
    assert(Multimodal.decodeWav(evil).isEmpty)
    bb.putInt(16, -9)
    assert(Multimodal.decodeWav(evil).isEmpty)
    // truncated data chunk still decodes the frames that exist
    val truncated = java.util.Arrays.copyOf(good, good.length - 10)
    assert(Multimodal.decodeWav(truncated).isDefined)
  }

  test("resize plan never upscales and preserves aspect ratio") {
    val plan = Multimodal.resizePlan(media, maxSide = 128).collect()
    assert(plan.nonEmpty)
    plan.foreach { r =>
      val (w, h, ow, oh) = (r.getInt(1), r.getInt(2), r.getInt(4), r.getInt(5))
      assert(ow <= 128 || w <= 128)
      assert(oh <= 128 || h <= 128)
      assert(ow <= w && oh <= h) // scale capped at 1.0
    }
  }

  test("real resize: output dims equal the metadata plan, payloads are decodable PNGs") {
    val resized = Multimodal.resizeImages(media, maxSide = 8).collect()
      .map(r => r.getLong(0) -> r).toMap
    val plan = Multimodal.resizePlan(media, maxSide = 8).collect()
    assert(plan.nonEmpty && resized.size === plan.length)
    plan.foreach { p =>
      val r = resized(p.getLong(0))
      assert(r.getInt(2) === p.getInt(4) && r.getInt(3) === p.getInt(5),
        s"media ${p.getLong(0)} dims diverge from resizePlan")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
      assert(img.getWidth === r.getInt(2) && img.getHeight === r.getInt(3))
    }
  }

  test("real resize golden: nearest-neighbor picks the exact source pixels") {
    // 4x2 gradient from pngBytes(4, 2, seed=5); downsample to maxSide=2 ->
    // 2x1; nearest-neighbor x: sx = x*4/2 -> {0, 2}, y: sy = 0*2/1 -> {0}
    val src = Multimodal.pngBytes(4, 2, 5)
    val srcImg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(src))
    val Some((bytes, ow, oh)) = Multimodal.resizeImage(src, maxSide = 2)
    assert((ow, oh) === ((2, 1)))
    val out = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert((out.getRGB(0, 0) & 0xffffff) === (srcImg.getRGB(0, 0) & 0xffffff))
    assert((out.getRGB(1, 0) & 0xffffff) === (srcImg.getRGB(2, 0) & 0xffffff))
  }

  test("extreme aspect ratio: plan and pixels agree on the >=1 dim floor") {
    import spark.implicits._
    // 1x20 at maxSide 8: scale 0.4 -> width truncates to 0 without the
    // floor; both paths must say 1x8
    val skinny = Seq((7L, "image", Multimodal.pngBytes(1, 20, 3), 1, 20))
      .toDF("media_id", "kind", "payload", "w", "h")
      .select(col("media_id"), col("kind"), col("payload"),
        struct(col("w").as("width"), col("h").as("height"),
          lit(null).cast("int").as("sample_rate"), lit(null).cast("int").as("duration_ms"),
          lit("png").as("format")).as("meta"))
    val p = Multimodal.resizePlan(skinny, maxSide = 8).collect().head
    assert((p.getInt(4), p.getInt(5)) === ((1, 8)))
    val r = Multimodal.resizeImages(skinny, maxSide = 8).collect().head
    assert((r.getInt(2), r.getInt(3)) === ((1, 8)))
  }

  test("real resize: corrupt payloads yield null rows, never a stage failure") {
    import spark.implicits._
    val junk = Seq((1L, "image", Array[Byte](1, 2, 3), "png"))
      .toDF("media_id", "kind", "payload", "fmt")
      .select(col("media_id"), col("kind"), col("payload"),
        struct(lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          lit(null).cast("int").as("sample_rate"), lit(null).cast("int").as("duration_ms"),
          col("fmt").as("format")).as("meta"))
    val rows = Multimodal.resizeImages(junk, maxSide = 8).collect()
    assert(rows.length === 1)
    assert(rows.head.isNullAt(1) && rows.head.isNullAt(2) && rows.head.isNullAt(3))
  }

  test("frame sampling expands to duration/step rows per video") {
    val frames = Multimodal.frameSample(media, everyMs = 500)
    val perVideo = frames.groupBy("media_id")
      .agg(count(lit(1)).as("n"), first("duration_ms").as("d")).collect()
    assert(perVideo.nonEmpty)
    perVideo.foreach { r =>
      val expected = (r.getInt(2) + 499) / 500 // ceil(duration/step)
      assert(r.getLong(1) === expected.toLong, s"media ${r.getLong(0)}")
    }
  }

  test("Y4M decode golden: per-frame mean luminance is exactly the painted value") {
    // frame f of y4mBytes(_, _, _, seed) is solid luma (seed*37 + f*11) % 256
    val v = Multimodal.decodeY4mFrames(Multimodal.y4mBytes(16, 8, 10, seed = 3)).get
    assert(v.width === 16 && v.height === 8 && v.fpsNum === 25 && v.fpsDen === 1)
    assert(v.frameLuma.length === 10)
    (0 until 10).foreach { f =>
      val expected = ((3 * 37 + f * 11) % 256) / 255.0f
      assert(math.abs(v.frameLuma(f) - expected) < 1e-6f, s"frame $f")
    }
  }

  test("Y4M corruption: truncated frames, bad magic, hostile dims all fall back") {
    val good = Multimodal.y4mBytes(16, 8, 4, seed = 1)
    assert(Multimodal.decodeY4mFrames(good.take(good.length - 10)).isEmpty,
      "truncated last frame must be corruption, not a partial parse")
    assert(Multimodal.decodeY4mFrames("JUNK4MPEG2 W16 H8\n".getBytes).isEmpty)
    assert(Multimodal.decodeY4mFrames(
      "YUV4MPEG2 W999999999 H999999999 F25:1\n".getBytes).isEmpty,
      "hostile dims must not allocate")
    assert(Multimodal.decodeY4mFrames("YUV4MPEG2 W16 H8 F0:0\n".getBytes).isEmpty)
    // and through the total dispatch they land on the stub, never a throw
    val junk = good.take(good.length - 10)
    val viaDecode = Multimodal.decodeY4m(junk)
    assert(viaDecode.isEmpty)
  }

  test("video features are real Y4M decode output, resampled like WAV") {
    // media_id 2 is video i=2: w=20 h=12, frames=10, seed=2 -> known lumas
    val feats = Multimodal.extractFeatures(media)
      .filter(col("media_id") === 2).collect().head.getSeq[Float](2)
    val lumas = (0 until 10).map(f => ((2 * 37 + f * 11) % 256) / 255.0f)
    // FeatureDim=64 slices over 10 frames: slice k covers [k*10/64, (k+1)*10/64)
    // with the max(lo+1) floor -> each slice is one frame's luma
    val expected = (0 until Multimodal.FeatureDim).map { k =>
      lumas(math.min(9, k * 10 / Multimodal.FeatureDim))
    }
    feats.zip(expected).zipWithIndex.foreach { case ((got, exp), k) =>
      assert(math.abs(got - exp) < 1e-6f, s"slice $k")
    }
  }

  test("frameSampleFeatures: per-frame goldens on the sampled grid, nulls for corrupt") {
    val out = Multimodal.frameSampleFeatures(media, everyMs = 100)
    // same grid as the metadata-only sampler
    val gridN = Multimodal.frameSample(media, everyMs = 100).count()
    assert(out.count() === gridN)
    // media_id 2: frames=10 at 25fps (40ms), duration 400ms -> samples at
    // 0,100,...,300ms map to frames 0,2,5,7
    val got = out.filter(col("media_id") === 2)
      .orderBy("frame_ms").collect()
      .map(r => (r.getInt(2), r.getFloat(3))).toSeq
    val lumaOf = (f: Int) => ((2 * 37 + f * 11) % 256) / 255.0f
    val expected = Seq(0 -> lumaOf(0), 100 -> lumaOf(2), 200 -> lumaOf(5), 300 -> lumaOf(7))
    assert(got.map(_._1) === expected.map(_._1))
    got.zip(expected).foreach { case ((_, g), (_, e)) => assert(math.abs(g - e) < 1e-6f) }
    // corrupt video rows (i%18==14, e.g. media_id 14) keep their grid rows with null luma
    val corrupt = out.filter(col("media_id") === 14).collect()
    assert(corrupt.nonEmpty)
    assert(corrupt.forall(_.isNullAt(3)), "undecodable video must yield null luma, not drop rows")
  }

  // ---- perceptual-hash image dedup (aHash + banded LSH) ----

  test("aHash golden: mean-threshold bits, sign-bit safe, brightness-invariant") {
    import spark.implicits._
    val base = Array.tabulate(64)(i => i / 64.0f)           // mean 31.5/64
    val bright = base.map(_ + 0.3f)                         // constant shift
    val df = Seq((0L, base.toSeq), (1L, bright.toSeq)).toDF("media_id", "features")
    val out = Multimodal.aHash(df).orderBy("media_id")
      .collect().map(_.getAs[Long]("phash"))
    // cells 32..63 exceed the image mean -> the TOP 32 bits exactly,
    // including bit 63 (the Long sign bit — OR accumulation, no overflow)
    assert(out(0) === 0xFFFFFFFF00000000L, f"phash = ${out(0)}%016x")
    // aHash thresholds against the image's OWN mean: a global brightness
    // shift moves every cell and the mean together -> identical hash
    assert(out(1) === out(0), "aHash must be brightness-invariant")
  }

  test("image dedup fixture: exact dups at hamming 0, near-dups paired, distinct groups separate") {
    val rows = graft.queries.LlmOps.queries("q_dedup_image")(spark, "unused").collect()
    val pairs = rows.map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val groups = 60
    (0 until groups).foreach { g =>
      val (a, b, c) = (3L * g, 3L * g + 1, 3L * g + 2)
      // byte-identical re-encode: same features, same hash
      assert(pairs.get((a, b)).contains(0L), s"group $g exact dup not at hamming 0")
      // one-block perturbation: within the lossless hamming<=7 band
      assert(pairs.contains((a, c)), s"group $g near-dup (base, perturbed) not paired")
      assert(pairs.contains((b, c)), s"group $g near-dup (re-encode, perturbed) not paired")
    }
    // cross-group pairs: distinct block patterns sit ~32 bits apart; the
    // deterministic fixture yields only a small accidental-collision tail
    val crossGroup = pairs.keys.count { case (a, b) => a / 3 != b / 3 }
    assert(crossGroup <= groups / 4,
      s"$crossGroup cross-group pairs — distinct patterns are not separating")
  }

  test("image dedup plan: banded equi-join, no all-pairs shapes") {
    val p = graft.queries.LlmOps.queries("q_dedup_image")(spark, "unused")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join shape in the image-dedup plan:\n$p")
  }

  // ---- perceptual audio dedup (envelope aHash + banded LSH) ----

  test("audio dedup fixture: gain-scaled copies at hamming 0, segment flips paired, groups separate") {
    val rows = graft.queries.LlmOps.queries("q_dedup_audio")(spark, "unused").collect()
    val pairs = rows.map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val groups = 60
    (0 until groups).foreach { g =>
      val (a, b, c) = (3L * g, 3L * g + 1, 3L * g + 2)
      // volume-scaled copy: the envelope hash thresholds against the
      // clip's OWN mean, so uniform gain cancels -> identical hash
      assert(pairs.get((a, b)).contains(0L), s"group $g gain-scaled copy not at hamming 0")
      // one-segment loudness flip: within the lossless hamming<=7 band
      assert(pairs.contains((a, c)), s"group $g near-dup (base, flipped) not paired")
      assert(pairs.contains((b, c)), s"group $g near-dup (scaled, flipped) not paired")
    }
    val crossGroup = pairs.keys.count { case (a, b) => a / 3 != b / 3 }
    assert(crossGroup <= groups / 4,
      s"$crossGroup cross-group pairs — distinct envelopes are not separating")
  }

  test("audio dedup plan: banded equi-join, no all-pairs shapes") {
    val p = graft.queries.LlmOps.queries("q_dedup_audio")(spark, "unused")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join shape in the audio-dedup plan:\n$p")
  }

  // ---- perceptual video dedup (per-frame aHash + any-frame-match banding) ----

  test("frame-grid decode golden: each grid cell is exactly its painted block value") {
    val frames = Seq(
      Array.tabulate(64)(c => if (c % 2 == 0) 200 else 50),
      Array.tabulate(64)(c => if (c < 32) 230 else 20))
    val grids = Multimodal.decodeY4mFrameGrids(
      Multimodal.y4mGridBytes(16, 16, frames))
    assert(grids.isDefined && grids.get.length === 2)
    grids.get.zip(frames).foreach { case (got, want) =>
      got.zip(want).zipWithIndex.foreach { case ((gv, wv), c) =>
        assert(math.abs(gv - wv / 255.0f) < 1e-6, s"cell $c: $gv vs ${wv / 255.0}")
      }
    }
    // corruption falls back, never throws
    assert(Multimodal.decodeY4mFrameGrids("not a video".getBytes).isEmpty)
    assert(Multimodal.decodeY4mFrameGrids(
      Multimodal.y4mGridBytes(16, 16, frames).take(40)).isEmpty)
  }

  test("video dedup fixture: trimmed copies share 9 frames, perturbations all 12, groups separate") {
    val rows = graft.queries.LlmOps.queries("q_dedup_video")(spark, "unused").collect()
    val pairs = rows.map(r => ((r.getLong(0), r.getLong(1)),
      (r.getLong(2), r.getLong(3)))).toMap
    val groups = 60
    (0 until groups).foreach { g =>
      val (a, b, c) = (3L * g, 3L * g + 1, 3L * g + 2)
      // the trim shares scenes 3..11 — 9 of the base's 12 frames match at
      // hamming 0 even though every shared frame sits at a DIFFERENT index
      assert(pairs.get((a, b)).contains((9L, 0L)),
        s"group $g trim pair got ${pairs.get((a, b))}, want 9 frames at min hamming 0")
      // the perturbation flips one cell per frame: all 12 frames at hamming 1
      assert(pairs.get((a, c)).exists { case (mf, mh) => mf == 12L && mh <= 1L },
        s"group $g perturbed pair got ${pairs.get((a, c))}")
      // trim vs perturbed: the 9 shared scenes, each within hamming 1
      assert(pairs.get((b, c)).exists { case (mf, mh) => mf == 9L && mh <= 1L },
        s"group $g trim-vs-perturbed got ${pairs.get((b, c))}")
    }
    val crossGroup = pairs.keys.count { case (a, b) => a / 3 != b / 3 }
    assert(crossGroup <= groups / 4,
      s"$crossGroup cross-group pairs — distinct scene patterns are not separating")
  }

  test("video dedup plan: banded equi-join over frame keys, no all-pairs shapes") {
    val p = graft.queries.LlmOps.queries("q_dedup_video")(spark, "unused")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join shape in the video-dedup plan:\n$p")
  }
}
