package graft.streaming

import graft.SparkSpec
import graft.operators.{CommunityIndex, LabelPropagation}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The generic edge-stream communities sink: end-to-end MemoryStream
  * parity with the cold full run, retry/redelivery idempotence, and
  * duplicate-edge tolerance across batches. */
class StreamingCommunitiesSuite extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private def toMap(df: DataFrame): Map[Long, Long] =
    df.select("id", "label").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  // two triangles + a late bridge, arriving over three batches
  private val b1 = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L)
  private val b2 = Seq(4L -> 5L, 5L -> 6L, 4L -> 6L)
  private val b3 = Seq(3L -> 4L, 1L -> 2L) // bridge + a REPEAT of batch 1's edge

  test("MemoryStream end-to-end: streamed labeling equals the cold recompute") {
    import spark.implicits._
    val path = tmp("scomm-e2e")
    val input = MemoryStream[(Long, Long)](spark)
    val q = StreamingCommunities.communitySink(
      input.toDF().toDF("src", "dst"), path,
      checkpointDir = Some(tmp("scomm-ckpt")))
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      input.addData(b3); q.processAllAvailable()
    } finally q.stop()

    val streamed = toMap(StreamingCommunities.labels(spark, path))
    // converged reference on the union graph (repeat edge collapses)
    val all = (b1 ++ b2 ++ b3).distinct
    val cold = toMap(LabelPropagation.run(
      (1L to 6L).toDF("id"), all.toDF("src", "dst"), iters = 6))
    assert(streamed === cold,
      s"streamed labeling diverged from the cold recompute: $streamed vs $cold")
    // the repeat edge did not duplicate adjacency rows
    val adj = CommunityIndex.adjacency(spark, path)
    assert(adj.count() === adj.distinct().count())
  }

  test("redelivered and out-of-order batches are no-ops after commit") {
    import spark.implicits._
    val path = tmp("scomm-retry")
    StreamingCommunities.applyBatch(b1.toDF("src", "dst"), path, batchId = 0L)
    StreamingCommunities.applyBatch(b2.toDF("src", "dst"), path, batchId = 1L)
    val head = toMap(CommunityIndex.labels(spark, path))
    // exact redelivery of batch 1 and a stale redelivery of batch 0:
    // both at-or-below the committed head, both must change nothing
    StreamingCommunities.applyBatch(b2.toDF("src", "dst"), path, batchId = 1L)
    StreamingCommunities.applyBatch(
      Seq(9L -> 8L).toDF("src", "dst"), path, batchId = 0L) // even a WRONG payload
    assert(toMap(CommunityIndex.labels(spark, path)) === head)
    assert(CommunityIndex.version(spark, path) === Some(2L))
  }

  test("a pre-built seed index is version 0 and the stream appends from 1") {
    import spark.implicits._
    val path = tmp("scomm-seed")
    CommunityIndex.build((1L to 3L).toDF("id"), b1.toDF("src", "dst"), path)
    StreamingCommunities.applyBatch(b2.toDF("src", "dst"), path, batchId = 0L)
    assert(CommunityIndex.version(spark, path) === Some(1L))
    val l = toMap(StreamingCommunities.labels(spark, path))
    assert(l.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(l(1L) === l(2L))
    assert(l(4L) === l(5L))
    assert(l(1L) !== l(4L))
  }
}
