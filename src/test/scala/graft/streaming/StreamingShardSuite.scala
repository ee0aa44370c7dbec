package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Seventh streaming twin: rolling shard generations. Epoch == batch
  * equivalence (the streaming form IS the batch operator per epoch),
  * exactly-once on retry from statelessness, and the layout contract. */
class StreamingShardSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("epoch == batch: one generation equals shardAssignment on the same docs") {
    val out = tmp("sshard-eq")
    val docs = Tables(spark, sf, "documents").select("doc_id")
    StreamingShard.applyBatch(docs, numShards = 8, out, batchId = 0L)
    val streamed = StreamingShard.epoch(spark, out, 0L)
      .collect().map(_.toSeq).toSeq
    val batch = graft.queries.LlmOps.shardAssignment(docs, numShards = 8)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(streamed === batch, "streaming generation diverged from the batch operator")
    assert(batch.nonEmpty)
  }

  test("retry idempotence: re-running a batch overwrites its epoch with identical content") {
    import spark.implicits._
    val out = tmp("sshard-retry")
    val b = (0L until 57L).toDF("doc_id")
    StreamingShard.applyBatch(b, numShards = 4, out, batchId = 3L)
    val first = StreamingShard.epoch(spark, out, 3L).collect().map(_.toSeq).toSeq
    // at-least-once redelivery of the SAME batch id
    StreamingShard.applyBatch(b, numShards = 4, out, batchId = 3L)
    val second = StreamingShard.epoch(spark, out, 3L).collect().map(_.toSeq).toSeq
    assert(first === second, "retry changed the epoch's content")
    assert(second.length === 57, "retry duplicated rows")
  }

  test("compaction: base == batch over the union; prune refuses uncommitted; unified view exact") {
    import spark.implicits._
    val out = tmp("sshard-compact")
    StreamingShard.applyBatch((0L until 30L).toDF("doc_id"), 4, out, 0L)
    StreamingShard.applyBatch((100L until 145L).toDF("doc_id"), 4, out, 1L)
    StreamingShard.applyBatch((200L until 220L).toDF("doc_id"), 4, out, 2L)
    // prune before any compaction must refuse loudly
    val e = intercept[IllegalArgumentException] {
      StreamingShard.pruneEpochs(spark, out, 1L)
    }
    assert(e.getMessage.contains("no committed compaction"), e.getMessage)
    // compact epochs 0-1 into the base generation
    StreamingShard.compact(spark, out, numShards = 4, uptoEpoch = 1L)
    assert(StreamingShard.latestCompaction(spark, out) === Some(1L))
    // base == the batch operator over the union of epochs 0-1
    val ids01 = ((0L until 30L) ++ (100L until 145L)).toDF("doc_id")
    val batch = graft.queries.LlmOps.shardAssignment(ids01, 4)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val base = StreamingShard.assignment(spark, out).filter(col("epoch") === -1L)
      .select("doc_id", "shard", "pos_in_shard")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(base === batch, "compacted base diverged from the batch operator on the union")
    // retry idempotence: a second compact converges to the same bytes
    StreamingShard.compact(spark, out, numShards = 4, uptoEpoch = 1L)
    val base2 = StreamingShard.assignment(spark, out).filter(col("epoch") === -1L)
      .select("doc_id", "shard", "pos_in_shard")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(base2 === base)
    // unified view: base + the raw epoch AFTER the compaction point,
    // nothing lost, nothing duplicated
    val view = StreamingShard.assignment(spark, out)
    assert(view.filter(col("epoch") === 0L || col("epoch") === 1L).count() === 0,
      "covered raw epochs must not appear beside the base")
    assert(view.filter(col("epoch") === 2L).count() === 20)
    assert(view.select("doc_id").distinct().count() === 95)
    // prune the covered epochs; the view is unchanged afterwards
    assert(StreamingShard.pruneEpochs(spark, out, 1L) === 2L)
    val after = StreamingShard.assignment(spark, out)
      .orderBy("epoch", "doc_id").collect().map(_.toSeq).toSeq
    assert(after.length === 95, s"view changed after prune: ${after.length}")
    // a crashed compact (no _SUCCESS) is invisible AND unprunable
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(out), spark.sparkContext.hadoopConfiguration)
    StreamingShard.compact(spark, out, 4, uptoEpoch = 2L)
    fs.delete(new org.apache.hadoop.fs.Path(s"$out/compact/upto=2/_SUCCESS"), false)
    assert(StreamingShard.latestCompaction(spark, out) === Some(1L),
      "a torn compaction must stay invisible")
    intercept[IllegalArgumentException] {
      StreamingShard.pruneEpochs(spark, out, 2L)
    }
  }

  test("re-compaction after prune: the committed base's docs survive into the next base") {
    import spark.implicits._
    val out = tmp("sshard-recompact")
    StreamingShard.applyBatch((0L until 30L).toDF("doc_id"), 4, out, 0L)
    StreamingShard.applyBatch((100L until 145L).toDF("doc_id"), 4, out, 1L)
    StreamingShard.compact(spark, out, numShards = 4, uptoEpoch = 1L)
    StreamingShard.pruneEpochs(spark, out, 1L)
    // epochs 0-1 now exist ONLY in compact/upto=1; new arrivals land raw
    StreamingShard.applyBatch((200L until 220L).toDF("doc_id"), 4, out, 2L)
    StreamingShard.applyBatch((150L until 160L).toDF("doc_id"), 4, out, 3L)
    // the ADVICE r12 scenario: a second compact must fold the committed
    // base in, not rebuild from the (pruned) raw epochs alone
    StreamingShard.compact(spark, out, numShards = 4, uptoEpoch = 3L)
    assert(StreamingShard.latestCompaction(spark, out) === Some(3L))
    val base = StreamingShard.assignment(spark, out).filter(col("epoch") === -1L)
    assert(base.count() === 105, "re-compaction lost the previous base's docs")
    // and it equals the batch operator over the FULL doc set
    val all = ((0L until 30L) ++ (100L until 145L) ++
      (200L until 220L) ++ (150L until 160L)).toDF("doc_id")
    val batch = graft.queries.LlmOps.shardAssignment(all, 4)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val got = base.select("doc_id", "shard", "pos_in_shard")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(got === batch, "re-compacted base diverged from the batch operator")
    // prune the newly covered epochs; view is base-only and complete
    StreamingShard.pruneEpochs(spark, out, 3L)
    assert(StreamingShard.assignment(spark, out).count() === 105)
    // compacting BELOW the committed base refuses loudly
    val e = intercept[IllegalArgumentException] {
      StreamingShard.compact(spark, out, 4, uptoEpoch = 2L)
    }
    assert(e.getMessage.contains("already covers"), e.getMessage)
    // a doc re-arriving after the base appears ONCE in the merged base
    StreamingShard.applyBatch(Seq(0L, 5L, 300L).toDF("doc_id"), 4, out, 4L)
    StreamingShard.compact(spark, out, 4, uptoEpoch = 4L)
    val base4 = StreamingShard.assignment(spark, out).filter(col("epoch") === -1L)
    assert(base4.count() === 106, "merged generation must hold the doc SET")
    assert(base4.filter(col("doc_id") === 0L).count() === 1)
    // ADVICE r13: a compact RETRIED at the committed watermark after a
    // full prune (no raw epochs left — the crashed-after-commit replay)
    // must converge as a no-op, not self-overwrite the directory it
    // would lazily read ("Cannot overwrite a path that is also being
    // read from"); the committed base is byte-identical afterwards
    StreamingShard.pruneEpochs(spark, out, 4L)
    val before = StreamingShard.assignment(spark, out)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    StreamingShard.compact(spark, out, 4, uptoEpoch = 4L)
    assert(StreamingShard.latestCompaction(spark, out) === Some(4L))
    val afterRetry = StreamingShard.assignment(spark, out)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(afterRetry === before,
      "watermark-retry compact must leave the committed base untouched")
  }

  test("MemoryStream end-to-end: two arrivals, two balanced self-contained generations") {
    import spark.implicits._
    val out = tmp("sshard-e2e")
    val input = MemoryStream[Long](spark)
    val q = StreamingShard.shardSink(input.toDF().toDF("doc_id"),
      numShards = 4, out, checkpointDir = Some(tmp("sshard-ckpt")))
    try {
      input.addData(0L until 30L: _*); q.processAllAvailable()
      input.addData(100L until 145L: _*); q.processAllAvailable()
    } finally q.stop()
    val all = StreamingShard.shards(spark, out)
    val epochs = all.select("epoch").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(epochs.length === 2, s"expected two generations, got $epochs")
    // each generation: complete over ITS batch, exactly balanced,
    // contiguous positions — the batch operator's invariants per epoch
    for (e <- epochs) {
      val g = all.filter(col("epoch") === e)
        .select(col("doc_id"), col("shard").cast("long").as("shard"), col("pos_in_shard"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val sizes = g.groupBy(_._2).view.mapValues(_.length).toMap
      assert(sizes.keySet === (0L until 4L).toSet, s"epoch $e missing a shard")
      assert(sizes.values.max - sizes.values.min <= 1, s"epoch $e imbalanced: $sizes")
      g.groupBy(_._2).foreach { case (s, rows) =>
        assert(rows.map(_._3).sorted.toSeq === (0L until rows.length.toLong).toSeq,
          s"epoch $e shard $s positions not contiguous")
      }
    }
    // generations are independent: batch-1 docs appear only in epoch 1
    val e0Ids = all.filter(col("epoch") === epochs.head)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(e0Ids === (0L until 30L).toSet, "epoch 0 is not exactly its arrival batch")
    // partition-pruned read: one (epoch, shard) directory
    val pruned = spark.read.parquet(s"$out/shards")
      .filter(col("epoch") === epochs.last && col("shard") === 2)
    val rs = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() >= 11, rs) // 45 docs / 4 shards
  }
}
