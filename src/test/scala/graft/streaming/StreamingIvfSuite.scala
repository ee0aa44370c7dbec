package graft.streaming

import graft.{SparkSpec, Tables}
import graft.ml.IvfIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming IVF ingest: stream-of-batches == one-shot appends, torn-batch
  * invisibility + retry convergence, and a MemoryStream end-to-end run
  * whose post-stream searches equal a directly-appended index's. */
class StreamingIvfSuite extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private val sf = "/root/testdata/sf0.01"
  private def emb = Tables(spark, sf, "embeddings")
  private def seed = emb.filter(col("vec_id") % 3 === 0)
  private def b1 = emb.filter(col("vec_id") % 3 === 1)
  private def b2 = emb.filter(col("vec_id") % 3 === 2)

  private def resultSet(df: DataFrame): Set[(Long, Int, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      math.round(r.getDouble(3) * 1e9))).toSet

  test("stream-of-batches == one-shot appends; searches see committed versions only") {
    val idx = tmp("sivf-idx")
    IvfIndex.buildIndex(seed, k = 8, iters = 2, idx)
    assert(IvfIndex.committedIngestVersion(spark, idx) === 0L)

    StreamingIvf.applyBatch(b1, idx, batchId = 0L)
    assert(IvfIndex.committedIngestVersion(spark, idx) === 1L)
    // a search between batches answers from v1: a b1 vector's own id is
    // findable (exact scan within probed cells -> self at sim ~1)
    val mid = StreamingIvf.search(spark, idx, b2.limit(5), topK = 3, nprobe = 2)
    assert(mid.count() > 0)

    StreamingIvf.applyBatch(b2, idx, batchId = 1L)
    assert(IvfIndex.committedIngestVersion(spark, idx) === 2L)

    // identical serving state as driving the appends directly
    val ref = tmp("sivf-ref")
    IvfIndex.buildIndex(seed, k = 8, iters = 2, ref)
    IvfIndex.appendVersion(spark, ref, b1, 1L)
    IvfIndex.appendVersion(spark, ref, b2, 2L)
    val qs = emb.filter(col("vec_id") % 7 === 0).limit(10)
    assert(resultSet(IvfIndex.searchIndex(spark, idx, qs, topK = 5, nprobe = 3)) ===
      resultSet(IvfIndex.searchIndex(spark, ref, qs, topK = 5, nprobe = 3)))
    // streamed vectors are SERVED: seed-vector queries over all cells
    // return b1/b2 ids among their neighbors (search excludes the self
    // pair, so "appears as someone's neighbor" is the serving check)
    val b12 = (b1.select("vec_id").collect() ++ b2.select("vec_id").collect())
      .map(_.getLong(0)).toSet
    val served = IvfIndex.searchIndex(spark, idx,
      seed.limit(20), topK = 5, nprobe = 8).collect().map(_.getLong(2)).toSet
    assert(served.exists(b12.contains),
      "no streamed vector appears among any seed query's neighbors")
  }

  test("torn batch is invisible until its retry commits it; committed retry is a no-op") {
    val idx = tmp("sivf-retry")
    IvfIndex.buildIndex(seed, k = 8, iters = 1, idx)
    val baseCount = IvfIndex.searchIndex(spark, idx,
      b2.limit(3), topK = 100, nprobe = 8).count()

    // simulate a crash AFTER the data write but BEFORE the commit marker:
    // land b1's partitions by hand under batch=1 with no ingest marker
    val model = IvfIndex.loadModel(spark, s"$idx/model")
    graft.sources.PartitionedLayout.overwritePartitions(
      IvfIndex.assign(b1, model).withColumn("batch", lit(1L)),
      s"$idx/cells", "cell", "batch")
    assert(IvfIndex.committedIngestVersion(spark, idx) === 0L)
    // committed-path reads do NOT see the torn rows
    assert(IvfIndex.searchIndex(spark, idx,
      b2.limit(3), topK = 100, nprobe = 8).count() === baseCount,
      "torn batch leaked into a committed read")

    // redelivery completes the batch: overwrite own partitions + marker
    StreamingIvf.applyBatch(b1, idx, batchId = 0L)
    assert(IvfIndex.committedIngestVersion(spark, idx) === 1L)
    val clean = resultSet(IvfIndex.searchIndex(spark, idx,
      b2.limit(5), topK = 5, nprobe = 3))

    // redelivery of the committed batch: no version advance, no change
    StreamingIvf.applyBatch(b1, idx, batchId = 0L)
    assert(IvfIndex.committedIngestVersion(spark, idx) === 1L)
    assert(resultSet(IvfIndex.searchIndex(spark, idx,
      b2.limit(5), topK = 5, nprobe = 3)) === clean)

    // an abandoned torn batch is GC-able
    graft.sources.PartitionedLayout.overwritePartitions(
      IvfIndex.assign(b2, model).withColumn("batch", lit(2L)),
      s"$idx/cells", "cell", "batch")
    IvfIndex.cleanupUncommittedIngest(spark, idx)
    val leftover = new java.io.File(s"$idx/cells").listFiles()
      .filter(_.getName.startsWith("cell="))
      .flatMap(_.listFiles()).map(_.getName).filter(_ == "batch=2")
    assert(leftover.isEmpty, "uncommitted ingest data survived cleanup")
  }

  test("compactCells folds committed batches into one, serving unchanged") {
    val idx = tmp("sivf-compact")
    IvfIndex.buildIndex(seed, k = 8, iters = 1, idx)
    StreamingIvf.applyBatch(b1, idx, batchId = 0L)
    StreamingIvf.applyBatch(b2, idx, batchId = 1L)
    val qs = emb.filter(col("vec_id") % 7 === 0).limit(10)
    val before = resultSet(IvfIndex.searchIndex(spark, idx, qs, topK = 5, nprobe = 3))
    val folded = IvfIndex.compactCells(spark, idx)
    assert(folded === 2, s"expected 2 batches folded, got $folded")
    // one leaf partition per cell, under the head version
    val leaves = new java.io.File(s"$idx/cells").listFiles()
      .filter(_.getName.startsWith("cell="))
      .flatMap(_.listFiles()).map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(leaves === Set("batch=2"), s"leaves: $leaves")
    assert(!new java.io.File(s"$idx/cells_compact").exists())
    assert(!new java.io.File(s"$idx/cells_old").exists())
    // identical serving, preserved head, and the next version still lands
    assert(IvfIndex.committedIngestVersion(spark, idx) === 2L)
    assert(resultSet(IvfIndex.searchIndex(spark, idx, qs, topK = 5, nprobe = 3)) === before)
    IvfIndex.appendVersion(spark, idx,
      seed.limit(3).withColumn("vec_id", col("vec_id") + 100000), 3L)
    assert(IvfIndex.committedIngestVersion(spark, idx) === 3L)
    // single-batch index: no-op
    val idle = tmp("sivf-compact-idle")
    IvfIndex.buildIndex(seed, k = 8, iters = 1, idle)
    assert(IvfIndex.compactCells(spark, idle) === 0)
  }

  test("MemoryStream end-to-end: post-stream search equals the directly-built index") {
    import spark.implicits._
    val idx = tmp("sivf-e2e")
    IvfIndex.buildIndex(seed, k = 8, iters = 2, idx)

    def rows(df: DataFrame): Seq[(Long, Seq[Float])] =
      df.select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq

    val input = MemoryStream[(Long, Seq[Float])](spark)
    val q = StreamingIvf.ingestSink(
      input.toDF().toDF("vec_id", "embedding"), idx, tmp("sivf-e2e-ckpt"))
    try {
      input.addData(rows(b1)); q.processAllAvailable()
      input.addData(rows(b2)); q.processAllAvailable()
    } finally q.stop()

    assert(IvfIndex.committedIngestVersion(spark, idx) === 2L)
    val ref = tmp("sivf-e2e-ref")
    IvfIndex.buildIndex(seed, k = 8, iters = 2, ref)
    IvfIndex.appendVersion(spark, ref, b1, 1L)
    IvfIndex.appendVersion(spark, ref, b2, 2L)
    val qs = emb.filter(col("vec_id") % 7 === 0).limit(10)
    assert(resultSet(StreamingIvf.search(spark, idx, qs, topK = 5, nprobe = 3)) ===
      resultSet(IvfIndex.searchIndex(spark, ref, qs, topK = 5, nprobe = 3)))
    // staleness sees exactly the committed corpus
    val (buildN, nowN, _, _, _) = IvfIndex.staleness(spark, idx)
    assert(buildN === seed.count())
    assert(nowN === seed.count() + b1.count() + b2.count())
  }

  test("pq twins: stream-of-batches == one-shot appends; torn invisible; retry no-op") {
    val idx = tmp("sivf-pq-idx")
    IvfIndex.buildPqIndex(seed, k = 8, iters = 2, m = 16, ksub = 16,
      pqIters = 2, idx)
    StreamingIvf.applyBatchPq(b1, idx, batchId = 0L)
    StreamingIvf.applyBatchPq(b2, idx, batchId = 1L)
    assert(IvfIndex.committedIngestVersion(spark, idx) === 2L)
    val ref = tmp("sivf-pq-ref")
    IvfIndex.buildPqIndex(seed, k = 8, iters = 2, m = 16, ksub = 16,
      pqIters = 2, ref)
    IvfIndex.appendPqVersion(spark, ref, b1, 1L)
    IvfIndex.appendPqVersion(spark, ref, b2, 2L)
    val qs = emb.filter(col("vec_id") % 7 === 0).limit(10)
    def pqSet(path: String) = StreamingIvf.searchPq(spark, path, qs,
        topK = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e9))).toSet
    assert(pqSet(idx) === pqSet(ref))
    // a redelivered committed batch is a whole no-op
    StreamingIvf.applyBatchPq(b1, idx, batchId = 0L)
    assert(pqSet(idx) === pqSet(ref))
    // torn batch (marker gone) is invisible; its retry completes it
    val b3 = b1.filter(col("vec_id") < 100).withColumn("vec_id", col("vec_id") + 100000L)
    StreamingIvf.applyBatchPq(b3, idx, batchId = 2L)
    val before = pqSet(idx)
    val fs = VersionedState.fileSystem(spark, idx)
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/ingest/v=3/_SUCCESS"), false)
    assert(IvfIndex.committedIngestVersion(spark, idx) === 2L)
    StreamingIvf.applyBatchPq(b3, idx, batchId = 2L)
    assert(IvfIndex.committedIngestVersion(spark, idx) === 3L)
    assert(pqSet(idx) === before)
  }
}
