package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.DedupIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming dedup gate: deterministic greedy semantics on a crafted
  * corpus, order-free invariants on the real documents table driven
  * through an actual MemoryStream sink, and the exactly-once contract
  * (a retried/torn batch converges to the clean result; a committed
  * batch is a no-op). */
class StreamingDedupSuite extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  // fully disjoint vocabularies -> jaccard 0 across letters; identical
  // text -> jaccard 1.0 at any banding (5-gram word shingles)
  private val X = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val W = "red orange yellow green blue indigo violet crimson amber teal navy plum"
  private val Y = "one two three four five six seven eight nine ten eleven twelve"
  private val Z = "north south east west upward downward leftward rightward forward backward inward outward"
  private val V = "oak pine elm birch maple cedar spruce willow aspen fir hazel rowan"

  private def frame(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("greedy gate: reject-vs-index, in-batch cluster canonicalization, cross-batch memory") {
    val idx = tmp("sdedup-idx")
    val out = tmp("sdedup-out")
    DedupIndex.build(frame(100L -> X, 101L -> W), idx)

    // batch 0: 200 dups the indexed X; 201/202 dup each other (keep min=201);
    // 203 is unique
    StreamingDedup.applyBatch(
      frame(200L -> X, 201L -> Y, 202L -> Y, 203L -> Z), idx, out, batchId = 0L)
    // batch 1: 300 dups Y, which batch 0 ACCEPTED as 201 -> reject; 301 unique
    StreamingDedup.applyBatch(
      frame(300L -> Y, 301L -> V), idx, out, batchId = 1L)

    val accepted = StreamingDedup.acceptedDocs(spark, out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(accepted === Set(201L, 203L, 301L))
    val indexed = DedupIndex.indexedIds(spark, idx)
      .collect().map(_.getLong(0)).toSet
    assert(indexed === Set(100L, 101L, 201L, 203L, 301L))
    // the observed pair feed names every rejection's evidence
    val pairs = StreamingDedup.observedPairs(spark, out)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((100L, 200L)) && pairs.contains((201L, 202L)))
    assert(pairs.exists { case (a, b) => a == 300L || b == 300L })
  }

  test("stream communities: the accumulated pair graph clusters template families") {
    val idx = tmp("sdedup-com-idx")
    val out = tmp("sdedup-com-out")
    DedupIndex.build(frame(100L -> X, 101L -> W), idx)
    StreamingDedup.applyBatch(
      frame(200L -> X, 201L -> Y, 202L -> Y, 203L -> Z), idx, out, batchId = 0L)
    StreamingDedup.applyBatch(
      frame(300L -> Y, 301L -> V), idx, out, batchId = 1L)
    val com = StreamingDedup.communities(spark, out)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // X family {100, 200} and Y family {201, 202, 300} each one label;
    // families distinct; accepted singletons keep their own label; the
    // never-witnessed seed doc 101 is not a node
    assert(com(100L) === com(200L), s"X family split: $com")
    assert(com(201L) === com(202L) && com(202L) === com(300L), s"Y family split: $com")
    assert(com(100L) !== com(201L), s"families merged: $com")
    assert(com(203L) === 203L && com(301L) === 301L, s"singletons drifted: $com")
    assert(!com.contains(101L), "unwitnessed seed doc leaked into the graph")
  }

  test("incremental communities: frontier refresh tracks the stream and equals the cold start") {
    val idx = tmp("sdedup-inc-idx")
    val out = tmp("sdedup-inc-out")
    val st = tmp("sdedup-inc-labels")
    DedupIndex.build(frame(100L -> X, 101L -> W), idx)
    StreamingDedup.applyBatch(
      frame(200L -> X, 201L -> Y, 202L -> Y, 203L -> Z), idx, out, batchId = 0L)
    StreamingDedup.applyBatch(
      frame(300L -> Y, 301L -> V), idx, out, batchId = 1L)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cold start: full convergence through the refresh path
    val first = toMap(StreamingDedup.refreshCommunities(spark, out, st))
    assert(first(100L) === first(200L), s"X family split: $first")
    assert(first(201L) === first(202L) && first(202L) === first(300L),
      s"Y family split: $first")
    assert(first(100L) !== first(201L), s"families merged: $first")
    // stable graph: the call is a pure read of the committed labeling
    val again = toMap(StreamingDedup.refreshCommunities(spark, out, st))
    assert(again === first, "stable-graph refresh must be a no-op read")
    // batch 2: W's family finally witnesses a rejection (400 dups the
    // seed doc 101) and a fresh unique doc arrives
    StreamingDedup.applyBatch(frame(400L -> W, 401L ->
      "gold silver bronze copper iron tin lead zinc nickel cobalt chrome brass"),
      idx, out, batchId = 2L)
    val inc = toMap(StreamingDedup.refreshCommunities(spark, out, st))
    assert(inc(101L) === inc(400L), s"new W family split: $inc")
    assert(inc(401L) === 401L, s"fresh unique doc drifted: $inc")
    // pre-existing families untouched by the delta keep their labels
    assert(first.forall { case (k, v) => inc(k) === v },
      "labels outside the delta's neighborhood moved")
    // committed state prunes to at most {predecessor, current}
    val dirs = new java.io.File(st).list().filter(_.startsWith("v")).sorted
    assert(dirs.length <= 2 && dirs.contains("v2"),
      s"label state must prune: ${dirs.mkString(",")}")
    // the incremental labeling equals a cold start over the same commit
    // state (stable-graph equality of the two code paths)
    val cold = toMap(StreamingDedup.refreshCommunities(spark, out, tmp("sdedup-cold")))
    assert(cold === inc, "incremental refresh diverged from the cold start")
  }

  test("incremental communities: torn snapshots and orphan adjacency deltas self-heal") {
    val idx = tmp("sdedup-heal-idx")
    val out = tmp("sdedup-heal-out")
    val st = tmp("sdedup-heal-labels")
    DedupIndex.build(frame(100L -> X, 101L -> W), idx)
    StreamingDedup.applyBatch(
      frame(200L -> X, 201L -> Y, 202L -> Y, 203L -> Z), idx, out, batchId = 0L)
    StreamingDedup.applyBatch(frame(300L -> Y, 301L -> V), idx, out, batchId = 1L)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clean = toMap(StreamingDedup.refreshCommunities(spark, out, st))
    // TORN SNAPSHOT: drop the commit marker — exactly what a crash during
    // the label write leaves. The version must become invisible (not an
    // early-returned read of a half-written dir) and the next call must
    // recompute and recommit the same labeling.
    val marker = new java.io.File(s"$st/v1/_SUCCESS")
    assert(marker.exists() && marker.delete())
    assert(toMap(StreamingDedup.refreshCommunities(spark, out, st)) === clean,
      "torn snapshot must be recomputed, not read")
    assert(new java.io.File(s"$st/v1/_SUCCESS").exists(), "recommit must restore the marker")
    // ORPHAN ADJACENCY DELTA: a crashed call that wrote its delta but not
    // its labels leaves adj partitions above the committed version; after
    // a NEW batch arrives, the retry's delta would overlap them —
    // duplicate rows double-counting votes. The orphan must be swept.
    val orphanDir = new java.io.File(s"$st/adj/batch=7")
    val src = new java.io.File(s"$st/adj/batch=1")
    orphanDir.mkdirs()
    src.listFiles().foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(orphanDir, f.getName).toPath)
    }
    StreamingDedup.applyBatch(frame(400L -> W, 401L ->
      "gold silver bronze copper iron tin lead zinc nickel cobalt chrome brass"),
      idx, out, batchId = 2L)
    val healed = toMap(StreamingDedup.refreshCommunities(spark, out, st))
    assert(!orphanDir.exists(), "orphan adjacency delta must be swept before the refresh")
    val cold = toMap(StreamingDedup.refreshCommunities(spark, out, tmp("sdedup-heal-cold")))
    assert(healed === cold, "healed incremental labeling diverged from a cold rebuild")
  }

  test("retry converges: a torn index append is swept and re-run equals the clean result") {
    val idx = tmp("sdedup-retry-idx")
    val out = tmp("sdedup-retry-out")
    DedupIndex.build(frame(100L -> X, 101L -> W), idx)
    val batch = frame(200L -> X, 201L -> Y, 202L -> Y, 203L -> Z)

    StreamingDedup.applyBatch(batch, idx, out, batchId = 0L)
    def indexSnapshot() = DedupIndex.indexedIds(spark, idx)
      .collect().map(_.getLong(0)).sorted.toSeq
    val clean = indexSnapshot()

    // tear the committed append: drop one subtable's _SUCCESS -> version 1
    // is no longer committed, exactly what a crash mid-append leaves
    val torn = new java.io.File(s"$idx/sizes/batch=1/_SUCCESS")
    assert(torn.exists() && torn.delete())
    assert(!DedupIndex.isCommitted(spark, idx, 1L))

    // at-least-once delivery retries the SAME batch id: sweep + re-run
    StreamingDedup.applyBatch(batch, idx, out, batchId = 0L)
    assert(DedupIndex.isCommitted(spark, idx, 1L))
    assert(indexSnapshot() === clean)
    // a third delivery of the committed batch is a pure no-op
    StreamingDedup.applyBatch(batch, idx, out, batchId = 0L)
    assert(indexSnapshot() === clean)
    assert(StreamingDedup.acceptedDocs(spark, out)
      .select("doc_id").collect().map(_.getLong(0)).toSet === Set(201L, 203L))
  }

  test("MemoryStream end-to-end on documents: order-free invariants hold") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
    val seed = docs.filter(col("doc_id") % 5 =!= 0)
    val idx = tmp("sdedup-e2e-idx")
    val out = tmp("sdedup-e2e-out")
    DedupIndex.build(seed, idx)

    val streamed = docs.filter(col("doc_id") % 5 === 0)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = streamed.partition(_._1 % 10 == 0)
    assert(b1.nonEmpty && b2.nonEmpty)

    val input = MemoryStream[(Long, String)](spark)
    val q = StreamingDedup.dedupSink(
      input.toDF().toDF("doc_id", "text"), idx, out,
      checkpointDir = Some(tmp("sdedup-e2e-ckpt")))
    try {
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()

    val acceptedDf = StreamingDedup.acceptedDocs(spark, out)
    val accepted = acceptedDf.select("doc_id").collect().map(_.getLong(0)).toSet
    val rejected = streamed.map(_._1).toSet -- accepted
    assert(accepted.nonEmpty && rejected.nonEmpty,
      "fixture must exercise both outcomes")

    // invariant 1 (order-free): NO near-dup pair survives among
    // seed ∪ accepted — dedup the accepted set against a fresh seed-only
    // index and demand zero pairs
    val fresh = tmp("sdedup-e2e-fresh")
    DedupIndex.build(seed, fresh)
    val residual = DedupIndex.dedupAgainst(
      fresh, acceptedDf.select("doc_id", "text"))
    assert(residual.count() === 0L,
      "accepted set must be an independent set of the near-dup graph")

    // invariant 2: every rejected doc has observed near-dup evidence
    val witnessed = StreamingDedup.observedPairs(spark, out)
      .select(explode(array(col("d1"), col("d2"))).as("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(rejected.subsetOf(witnessed),
      s"rejected docs without a witnessed pair: ${rejected -- witnessed}")

    // invariant 3: the index grew by exactly the accepted docs
    val indexed = DedupIndex.indexedIds(spark, idx)
      .collect().map(_.getLong(0)).toSet
    val seedIds = seed.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(indexed === seedIds ++ accepted)
  }
}
