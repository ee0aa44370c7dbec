package graft.streaming

import graft.{SparkSpec, Tables}
import graft.ml.KnnGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming embedding ingest: stream-of-batches == the same batches
  * applied one-shot, retry/torn-batch convergence, and a MemoryStream
  * end-to-end run whose post-stream searches equal a freshly-appended
  * index's. */
class StreamingAnnSuite extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private val sf = "/root/testdata/sf0.01"
  private def emb = Tables(spark, sf, "embeddings")
  private def seed = emb.filter(col("vec_id") % 3 === 0)
  private def b1 = emb.filter(col("vec_id") % 3 === 1)
  private def b2 = emb.filter(col("vec_id") % 3 === 2)

  private def edgeSet(g: DataFrame): Set[(Long, Long, Long)] =
    g.collect().map(r => (r.getLong(0), r.getLong(1),
      math.round(r.getDouble(2) * 1e9))).toSet

  test("stream-of-batches == one-shot versioned appends; searches see committed state") {
    val idx = tmp("sann-idx")
    KnnGraph.buildIndex(seed, k = 5, iters = 1, idx)

    StreamingAnn.applyBatch(b1, idx, batchId = 0L)
    assert(KnnGraph.currentVersion(spark, idx) === 1L)
    // a search between batches answers from v1: b1 ids are reachable
    val mid = StreamingAnn.search(spark, idx, b2.limit(5), k = 3, beam = 15)
    assert(mid.count() > 0)

    StreamingAnn.applyBatch(b2, idx, batchId = 1L)
    assert(KnnGraph.currentVersion(spark, idx) === 2L)

    // the exact same state as driving the appends directly
    val ref = tmp("sann-ref")
    KnnGraph.buildIndex(seed, k = 5, iters = 1, ref)
    KnnGraph.appendVersion(spark, ref, b1, 1L)
    KnnGraph.appendVersion(spark, ref, b2, 2L)
    assert(edgeSet(KnnGraph.indexEdges(spark, idx, 2)) ===
      edgeSet(KnnGraph.indexEdges(spark, ref, 2)))
    // streamed vectors are searchable: a vector's top-1 for its own
    // embedding is itself (sim 1) WHEN the beam reaches it — the descent
    // is approximate, so pin a strong majority rather than all (measured
    // 10/10 at this beam; margin for corpus regeneration)
    val self = StreamingAnn.search(spark, idx, b2.limit(10), k = 1, beam = 40)
      .collect()
    val found = self.count(r => r.getLong(0) == r.getLong(1))
    assert(found >= 8,
      s"only $found/10 streamed vectors are their own nearest neighbor in the served graph")
  }

  test("retry converges: committed batch is a no-op, torn batch is swept and re-run") {
    val idx = tmp("sann-retry")
    KnnGraph.buildIndex(seed, k = 5, iters = 0, idx)

    StreamingAnn.applyBatch(b1, idx, batchId = 0L)
    val clean = edgeSet(KnnGraph.indexEdges(spark, idx, 1))

    // redelivery of the committed batch: no version advance, no change
    StreamingAnn.applyBatch(b1, idx, batchId = 0L)
    assert(KnnGraph.currentVersion(spark, idx) === 1L)
    assert(edgeSet(KnnGraph.indexEdges(spark, idx, 1)) === clean)

    // tear version 1 (drop the edge commit marker, as a crash mid-append
    // would) and redeliver: the sweep removes the torn state and the
    // deterministic re-run restores identical content
    val torn = new java.io.File(s"$idx/edges/v=1/_SUCCESS")
    assert(torn.exists() && torn.delete())
    assert(KnnGraph.currentVersion(spark, idx) === 0L)
    StreamingAnn.applyBatch(b1, idx, batchId = 0L)
    assert(KnnGraph.currentVersion(spark, idx) === 1L)
    assert(edgeSet(KnnGraph.indexEdges(spark, idx, 1)) === clean)
  }

  test("MemoryStream end-to-end: post-stream search equals the directly-built index") {
    import spark.implicits._
    val idx = tmp("sann-e2e")
    KnnGraph.buildIndex(seed, k = 5, iters = 1, idx)

    def rows(df: DataFrame): Seq[(Long, Seq[Float])] =
      df.select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq

    val input = MemoryStream[(Long, Seq[Float])](spark)
    val q = StreamingAnn.ingestSink(
      input.toDF().toDF("vec_id", "embedding"), idx, tmp("sann-e2e-ckpt"))
    try {
      input.addData(rows(b1)); q.processAllAvailable()
      input.addData(rows(b2)); q.processAllAvailable()
    } finally q.stop()

    assert(KnnGraph.currentVersion(spark, idx) === 2L)
    val ref = tmp("sann-e2e-ref")
    KnnGraph.buildIndex(seed, k = 5, iters = 1, ref)
    KnnGraph.appendVersion(spark, ref, b1, 1L)
    KnnGraph.appendVersion(spark, ref, b2, 2L)
    val qs = emb.filter(col("vec_id") % 7 === 0).limit(10)
    assert(edgeSet(StreamingAnn.search(spark, idx, qs, k = 5, beam = 15)
        .withColumnRenamed("q_id", "id")) ===
      edgeSet(KnnGraph.searchIndex(spark, ref, qs, k = 5, beam = 15)
        .withColumnRenamed("q_id", "id")))
  }
}
