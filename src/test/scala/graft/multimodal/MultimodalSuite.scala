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
}
