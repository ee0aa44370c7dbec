package graft.operators

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Per-JVM scratch directories under java.io.tmpdir that clean themselves
  * up on JVM exit. Query-level operators that persist state between steps
  * (the dedup index, the CDC snapshot replay, the IVF index) write under a
  * deterministic per-(application, corpus) path so repeated invocations in
  * one bench/verify run overwrite instead of accumulate — but the JVM-exit
  * sweep is what keeps a fleet of test/bench JVMs from leaving one full
  * index copy per run behind in /tmp.
  */
object Scratch {
  private val registered = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread("graft-scratch-sweep") {
      override def run(): Unit = registered.forEach(p => deleteRecursively(Paths.get(p)))
    })
  }

  private def deleteRecursively(root: Path): Unit =
    if (Files.exists(root)) {
      try {
        val walk = Files.walk(root)
        try walk.sorted(Comparator.reverseOrder[Path]())
          .forEach(p => try Files.deleteIfExists(p) catch { case _: java.io.IOException => () })
        finally walk.close()
      } catch { case _: java.io.IOException => () } // best-effort: exit hygiene, not correctness
    }

  /** A deterministic scratch path `<tmpdir>/<prefix>-<app>-<corpusHash>`,
    * registered for recursive deletion at JVM exit. Deterministic within a
    * (application, corpus) pair so re-invocations overwrite their own
    * output; unique across concurrent applications via applicationId. */
  def dir(prefix: String, applicationId: String, corpus: String): String = {
    hookInstalled
    // unsigned rendering: math.abs(Int.MinValue) is negative, which would
    // print a double dash and collide the sign bit into the path
    val path = s"${System.getProperty("java.io.tmpdir")}/$prefix-$applicationId-" +
      Integer.toUnsignedString(corpus.hashCode)
    registered.add(path)
    path
  }

  /** Serializes the before/after `getPersistentRDDs` delta windows that
    * attribute freshly pinned checkpoint blocks to an owner (SubstrIndex
    * per-path tracking, StreamingSubstr's own-batch block, IvfIndex's
    * allowlist checkpoints). Without it, two concurrent pipelines'
    * eager checkpoints can land inside each other's windows and each
    * would attribute — and later sweep — the other's lineage-truncated
    * blocks. The lock covers registration AND (for eager checkpoints)
    * the materializing job, so concurrent micro-batches serialize that
    * one step; their remaining work stays concurrent — correctness of
    * block ownership over checkpoint-step parallelism. */
  private[graft] val trackLock = new Object

  /** Run `body`, then release every persistent-RDD block it pinned — the
    * ONE verb behind the library's caller-must-sweep contract
    * (docs/long-lived-spark-jvm-hygiene.md). Several operators return
    * LAZY frames over internal localCheckpoints they cannot unpersist
    * themselves (SubstrIndex.dedupAgainst, LlmOps.semanticDedup /
    * mmrRerank inputs, the memoized dedup twins); wrapping the
    * produce-and-CONSUME sequence in `withSweep` turns the convention
    * into code:
    *
    * {{{
    * val spans = Scratch.withSweep(spark) {
    *   SubstrIndex.dedupAgainst(path, batch).collect() // consume INSIDE
    * }
    * }}}
    *
    * Contract: consume (write/collect/count) INSIDE the block — the
    * pinned blocks are lineage-truncated checkpoints, so a frame escaping
    * the block lazily fails its next action loudly
    * (checkpoint-block-not-found), never returns a wrong answer. The
    * before/after delta is JVM-wide: like Bench's per-query sweep it
    * assumes one pipeline at a time per JVM (concurrent pipelines should
    * scope sweeps per index path — SubstrIndex.sweep(spark, path)). */
  def withSweep[T](spark: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    try body
    finally {
      val live = sc.getPersistentRDDs
      (live.keySet -- before).foreach(id =>
        live.get(id).foreach(_.unpersist(blocking = false)))
    }
  }
}

/** Run-once-per-path memo for DISK-backed index builds.
  *
  * The bench/verify gates for the persisted index families (DedupIndex,
  * IvfIndex, KnnGraph) must time SERVING cost — the band equi-join, the
  * cell-probe join, the beam search — not an index rebuild per invocation:
  * a production pipeline builds its index once per corpus refresh and
  * answers queries against it for a week. Build cost stays measured, but in
  * the artifacts that exist for it (AnnCurve, ScaleProbe) and in the first
  * invocation of a fresh JVM.
  *
  * Disk-backed on purpose: unlike the in-memory pair-graph memo
  * ([[graft.queries.LlmOps.clearShared]] evicts that between bench queries
  * for block hygiene), state at a [[Scratch.dir]] path survives the
  * per-query block sweep without pinning a single byte of executor memory,
  * so amortization and memory hygiene don't fight. Safe because every build
  * in this repo is deterministic per (corpus, params) and the path itself
  * encodes (application, corpus): skipping a rebuild can never serve a
  * different answer.
  */
object Memo {
  private val done = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Execute `build` the first time `path` is seen in this JVM; no-op after.
    * `build` must leave its complete, committed effect under `path`. */
  def once(path: String)(build: => Unit): Unit =
    if (!done.contains(path)) synchronized {
      if (!done.contains(path)) { build; done.add(path) }
    }

  /** Memoize a deterministic DataFrame to parquet at `path`: first call
    * computes and writes, every later call reads the parquet back — the
    * frame survives block-manager sweeps with zero pinned memory (the
    * disk-backed sibling of a localCheckpoint memo). */
  def frame(spark: org.apache.spark.sql.SparkSession, path: String)(
      build: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    once(path)(build.write.mode("overwrite").parquet(path))
    spark.read.parquet(path)
  }

  /** Test hook: forget everything so a suite can exercise cold builds. */
  private[graft] def reset(): Unit = done.clear()
}
