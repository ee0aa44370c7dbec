package graft.ml

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class KnnGraphSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private def emb = Tables(spark, sf, "embeddings")

  private def asMap(g: DataFrame): Map[Long, Seq[(Long, Double)]] =
    g.collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map(r => (r.getLong(1), r.getDouble(2)))
          .sortBy { case (n, s) => (-s, n) }.toSeq
      }

  private def recallVs(got: Map[Long, Seq[(Long, Double)]],
                       exact: Map[Long, Seq[(Long, Double)]]): Double = {
    val per = exact.map { case (id, top) =>
      val g = got.getOrElse(id, Nil).map(_._1).toSet
      top.count(t => g.contains(t._1)).toDouble / top.size
    }
    per.sum / per.size
  }

  test("structure: <= k neighbors per node, no self-edges, sim is cosine in [-1, 1]") {
    val g = KnnGraph.build(emb, k = 5, iters = 1)
    val rows = g.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)), "self-edge found")
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
    val degrees = rows.groupBy(_.getLong(0)).map(_._2.length)
    assert(degrees.max <= 5)
    // every vector participates (LSH seeding + descent reach everything
    // on this corpus; a dropped node would silently hole the graph)
    assert(rows.map(_.getLong(0)).toSet.size === emb.count())
  }

  test("recall vs brute force rises with descent iterations (measured 0.36/0.68/0.88/0.9+)") {
    // the harness embeddings are UNCLUSTERED Gaussians — the hardest case
    // for neighbor-of-neighbor transitivity (the NN-Descent paper's
    // structured-data speedups don't apply); floors carry margin under
    // the measured path so corpus regeneration doesn't flake
    val exact = asMap(KnnGraph.bruteForce(emb, k = 5))
    val r = (0 to 3).map(i => recallVs(asMap(KnnGraph.build(emb, k = 5, iters = i)), exact))
    assert(r(0) < r(2), s"descent did nothing: recall path $r")
    assert(r(1) >= r(0) - 0.02 && r(2) >= r(1) - 0.02 && r(3) >= r(2) - 0.02,
      s"recall path not ~monotone: $r")
    // iters=2 is the GATED q_knn_graph configuration (VERDICT r6 item 4:
    // the gate must run the operator in its quality regime) — pin >= 0.85
    assert(r(2) >= 0.85, s"recall@5 after 2 iters (the gated config) = ${r(2)} (path $r)")
    assert(r(3) >= 0.88, s"recall@5 after 3 iters = ${r(3)} (path $r)")
  }

  test("convergence stop: a converged corpus ends the descent early with the same graph") {
    // small clustered corpus: 10 tight clusters of 8 -> neighborhoods
    // stabilize after one or two rounds, far before an 8-round budget
    import spark.implicits._
    val clustered = (0 until 80).map { i =>
      val c = i % 10
      (i.toLong, Array.tabulate(64) { j =>
        (if (j % 10 == c) 10.0f else 0.0f) + ((i * 64 + j) % 7) * 0.01f
      })
    }.toDF("vec_id", "embedding")
    val (fixed, fixedRounds) = KnnGraph.buildWithRounds(clustered, k = 5, iters = 8)
    assert(fixedRounds === 8, "minUpdateFrac=0 must never stop early")
    val (early, stopped) =
      KnnGraph.buildWithRounds(clustered, k = 5, iters = 8, minUpdateFrac = 0.01)
    assert(stopped < 8, s"expected early convergence stop, ran all $stopped rounds")
    def es(g: DataFrame) = g.collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9))).toSet
    assert(es(early) === es(fixed),
      s"early stop (at round $stopped) changed the graph")
  }

  test("deterministic across partitionings") {
    def run(df: DataFrame) =
      KnnGraph.build(df, k = 5, iters = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 1e9))).toSet
    val base = run(emb)
    assert(run(emb.repartition(1)) === base)
    assert(run(emb.repartition(13, col("vec_id"))) === base)
  }

  // ---- search (beam descent over the built graph) ----

  // out-of-corpus split: the graph is built WITHOUT the query vectors, so
  // search must reach each query's true neighbors through the graph alone
  private def corpus = emb.filter(col("vec_id") >= 50)
  private def queries = emb.filter(col("vec_id") < 50)

  test("search: recall@5 vs brute force rises with descent rounds and beam width") {
    val g = KnnGraph.build(corpus, k = 5, iters = 2)
    val exact = asMap(KnnGraph.bruteForceSearch(corpus, queries, k = 5))
    val byRounds = (0 to 3).map { r =>
      recallVs(asMap(KnnGraph.search(g, corpus, queries, k = 5, rounds = r)), exact)
    }
    assert(byRounds(0) < byRounds(2), s"descent did nothing: recall path $byRounds")
    assert((1 to 3).forall(i => byRounds(i) >= byRounds(i - 1) - 0.02),
      s"recall path not ~monotone: $byRounds")
    val wideBeam = recallVs(
      asMap(KnnGraph.search(g, corpus, queries, k = 5, beam = 40, rounds = 3)), exact)
    assert(wideBeam >= byRounds(3) - 0.02,
      s"widening the beam lost recall: beam=15 -> ${byRounds(3)}, beam=40 -> $wideBeam")
    // floors carry margin under the measured path (beam=15: 0.04 -> 0.24
    // -> 0.49 -> 0.62 by rounds; beam=40 rounds=3: 0.88) — unclustered
    // Gaussians have the worst navigability a greedy descent can face, and
    // the BEAM is the lever that buys recall back (0.62 -> 0.88 here);
    // manifold-structured real corpora descend far faster
    info(s"recall by rounds (beam=15): $byRounds; beam=40 rounds=3: $wideBeam")
    assert(byRounds(2) >= 0.38, s"recall@5 after 2 rounds = ${byRounds(2)} (path $byRounds)")
    assert(byRounds(3) >= 0.5, s"recall@5 after 3 rounds = ${byRounds(3)} (path $byRounds)")
    assert(wideBeam >= 0.78, s"recall@5 at beam=40 rounds=3 = $wideBeam")
  }

  test("search: deterministic across partitionings") {
    val g = KnnGraph.build(corpus, k = 5, iters = 1)
    def run(c: DataFrame, q: DataFrame) =
      KnnGraph.search(g, c, q, k = 5, rounds = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 1e9))).toSet
    val base = run(corpus, queries)
    assert(run(corpus.repartition(1), queries.repartition(1)) === base)
    assert(run(corpus.repartition(13, col("vec_id")),
      queries.repartition(7, col("vec_id"))) === base)
  }

  test("search: plan is equi-joins + the heap operator, no cartesian shapes") {
    val g = KnnGraph.build(corpus, k = 5, iters = 1)
    val res = KnnGraph.search(g, corpus, queries, k = 5, rounds = 1)
    val p = res.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"n·m join shape in the search plan:\n$p")
  }

  test("plan: descent iteration is equi-joins + the heap operator, no cartesian shapes") {
    val g = KnnGraph.build(emb, k = 5, iters = 1)
    val p = g.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"n^2 join shape in the descent plan:\n$p")
  }

  private def oldBatch = emb.filter(col("vec_id") % 5 =!= 0)
  private def newBatch = emb.filter(col("vec_id") % 5 === 0)

  test("append: structure — every old AND new id present, <= k edges, no self-edges") {
    val gA = KnnGraph.build(oldBatch, k = 5, iters = 1).localCheckpoint()
    val rows = KnnGraph.append(gA, oldBatch, newBatch, k = 5, iters = 1).collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)), "self-edge found")
    assert(rows.groupBy(_.getLong(0)).map(_._2.length).max <= 5)
    assert(rows.map(_.getLong(0)).toSet.size === emb.count(),
      "append must leave no node (old or new) without edges")
    val newIds = newBatch.select("vec_id").collect().map(_.getLong(0)).toSet
    // reverse edges stitched the batch INTO old neighborhoods: new ids
    // appear as NEIGHBORS of old nodes, not only as sources
    assert(rows.exists(r => !newIds(r.getLong(0)) && newIds(r.getLong(1))),
      "no old->new edge — the batch is attached but not reachable")
  }

  test("append: recall matches the full rebuild (measured 0.70/0.80 vs rebuild 0.70)") {
    val exact = asMap(KnnGraph.bruteForce(emb, 5))
    val rebuild = recallVs(asMap(KnnGraph.build(emb, k = 5, iters = 2)), exact)
    val gA = KnnGraph.build(oldBatch, k = 5, iters = 2).localCheckpoint()
    val r1 = recallVs(asMap(
      KnnGraph.append(gA, oldBatch, newBatch, k = 5, iters = 1)), exact)
    val r2 = recallVs(asMap(
      KnnGraph.append(gA, oldBatch, newBatch, k = 5, iters = 2)), exact)
    assert(r1 >= 0.6, s"append iters=1 recall $r1 (rebuild $rebuild)")
    assert(r2 >= 0.7, s"append iters=2 recall $r2 (rebuild $rebuild)")
    // the insert must not be a cheap downgrade: one refinement round of
    // the appended graph stays within 0.1 of the 2-descent rebuild
    assert(r1 >= rebuild - 0.1,
      s"append iters=1 recall $r1 fell behind rebuild $rebuild")
    info(s"recall: rebuild=$rebuild append(iters=1)=$r1 append(iters=2)=$r2")
  }

  test("append: precomputed links reproduce the internal search exactly") {
    val gA = KnnGraph.build(oldBatch, k = 5, iters = 1).localCheckpoint()
    def es(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9))).toSet
    val inline = es(KnnGraph.append(gA, oldBatch, newBatch, k = 5, iters = 1))
    val links = KnnGraph.appendLinks(gA, oldBatch, newBatch, k = 5).localCheckpoint()
    val precomputed = es(KnnGraph.append(gA, oldBatch, newBatch, k = 5, iters = 1,
      links = Some(links)))
    assert(precomputed === inline,
      "append(links = precomputed) diverged from the inline search path")
  }

  test("append: deterministic across partitionings of the new batch") {
    val gA = KnnGraph.build(oldBatch, k = 5, iters = 1).localCheckpoint()
    def run(nb: DataFrame) =
      KnnGraph.append(gA, oldBatch, nb, k = 5, iters = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 1e9))).toSet
    val base = run(newBatch)
    assert(run(newBatch.repartition(1)) === base)
    assert(run(newBatch.repartition(11, col("vec_id"))) === base)
  }

  test("append: plan is equi-joins + the heap operator, no cartesian shapes") {
    val gA = KnnGraph.build(oldBatch, k = 5, iters = 1).localCheckpoint()
    val res = KnnGraph.append(gA, oldBatch, newBatch, k = 5, iters = 0)
    val p = res.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"n^2 join shape in the append plan:\n$p")
  }

  // --- persisted index -------------------------------------------------

  private def edgeSet(g: DataFrame): Set[(Long, Long, Long)] =
    g.collect().map(r => (r.getLong(0), r.getLong(1),
      math.round(r.getDouble(2) * 1e9))).toSet

  test("index: buildIndex + searchIndex == in-memory build + search") {
    val dir = java.nio.file.Files.createTempDirectory("graft-knn-index").toString
    KnnGraph.buildIndex(oldBatch, k = 5, iters = 1, dir)
    // stored edges are EXACTLY build()'s output (determinism makes this
    // checkable as set equality, not just statistics)
    val mem = KnnGraph.build(oldBatch, k = 5, iters = 1)
    assert(edgeSet(KnnGraph.indexEdges(spark, dir, 0)) === edgeSet(mem))
    // path-only search == in-memory search over the same graph
    val fromIdx = KnnGraph.searchIndex(spark, dir, newBatch, k = 5, beam = 15)
    val fromMem = KnnGraph.search(mem, oldBatch, newBatch, k = 5, beam = 15)
    assert(edgeSet(fromIdx.withColumnRenamed("q_id", "id")) ===
      edgeSet(fromMem.withColumnRenamed("q_id", "id")))
  }

  test("index: appendToIndex == in-memory append; version advances") {
    val dir = java.nio.file.Files.createTempDirectory("graft-knn-append").toString
    KnnGraph.buildIndex(oldBatch, k = 5, iters = 1, dir)
    val n = KnnGraph.appendToIndex(spark, dir, newBatch)
    assert(n === newBatch.count())
    assert(KnnGraph.currentVersion(spark, dir) === 1L)
    val g0 = KnnGraph.indexEdges(spark, dir, 0).localCheckpoint()
    val mem = KnnGraph.append(g0, oldBatch, newBatch, k = 5, iters = 1)
    assert(edgeSet(KnnGraph.indexEdges(spark, dir, 1)) === edgeSet(mem))
    // the committed corpus at v1 is the union of both batches
    assert(KnnGraph.indexVectors(spark, dir, 1).count() ===
      oldBatch.count() + newBatch.count())
  }

  test("index: appendVersion retry of the committed head is a no-op (exactly-once building block)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-knn-retry").toString
    KnnGraph.buildIndex(oldBatch, k = 5, iters = 0, dir)
    KnnGraph.appendVersion(spark, dir, newBatch, 1L)
    val once = edgeSet(KnnGraph.indexEdges(spark, dir, 1))
    val vecFiles = new java.io.File(s"$dir/vectors/batch=1").listFiles().map(_.getName).toSet
    KnnGraph.appendVersion(spark, dir, newBatch, 1L) // at-least-once redelivery
    assert(edgeSet(KnnGraph.indexEdges(spark, dir, 1)) === once)
    assert(KnnGraph.currentVersion(spark, dir) === 1L)
    // the retry must not rewrite the committed vector batch: an overwrite
    // would open a window where a concurrent read of the committed head
    // sees a deleted/partial batch
    assert(new java.io.File(s"$dir/vectors/batch=1").listFiles().map(_.getName).toSet
      === vecFiles, "retry rewrote the committed head's vector batch")
    // skipping a version (or rewriting history) is a caller bug, named loudly
    val e = intercept[IllegalArgumentException] {
      KnnGraph.appendVersion(spark, dir, newBatch, 3L)
    }
    assert(e.getMessage.contains("current+1"))
    val e2 = intercept[IllegalArgumentException] {
      KnnGraph.appendVersion(spark, dir, newBatch, 0L)
    }
    assert(e2.getMessage.contains("retry of current") ||
      e2.getMessage.contains("current+1"))
  }

  test("index: a crashed append's orphan vector batch is invisible and cleanable") {
    val dir = java.nio.file.Files.createTempDirectory("graft-knn-crash").toString
    KnnGraph.buildIndex(oldBatch, k = 5, iters = 0, dir)
    // simulate a crash between the two writes: vectors batch 1 lands,
    // edges v=1 never commits
    newBatch.select("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/vectors/batch=1")
    assert(KnnGraph.currentVersion(spark, dir) === 0L)
    val v = KnnGraph.currentVersion(spark, dir)
    assert(KnnGraph.indexVectors(spark, dir, v).count() === oldBatch.count(),
      "orphan batch leaked into a committed read")
    KnnGraph.cleanupUncommittedIndex(spark, dir)
    assert(!new java.io.File(s"$dir/vectors/batch=1").exists())
    // the committed index is untouched and still serves
    assert(KnnGraph.searchIndex(spark, dir, newBatch, k = 3, rounds = 1).count() > 0)
  }

  test("index: pruneVersions GCs superseded edge copies, current reads unaffected") {
    val dir = java.nio.file.Files.createTempDirectory("graft-knn-prune").toString
    KnnGraph.buildIndex(oldBatch, k = 5, iters = 0, dir)
    val half = newBatch.filter(col("vec_id") % 2 === 0)
    KnnGraph.appendVersion(spark, dir, half, 1L)
    KnnGraph.appendVersion(spark, dir, newBatch.except(half), 2L)
    val head = edgeSet(KnnGraph.indexEdges(spark, dir, 2))
    val nVecs = KnnGraph.indexVectors(spark, dir, 2).count()
    val pruned = KnnGraph.pruneVersions(spark, dir, keep = 1)
    assert(pruned === Seq(0L, 1L), s"expected to GC v0,v1: $pruned")
    assert(!new java.io.File(s"$dir/edges/v=0").exists())
    assert(!new java.io.File(s"$dir/edges/v=1").exists())
    // the head version still serves identically: same edges, same corpus
    // (vector batches are live deltas and must never be pruned)
    assert(KnnGraph.currentVersion(spark, dir) === 2L)
    assert(edgeSet(KnnGraph.indexEdges(spark, dir, 2)) === head)
    assert(KnnGraph.indexVectors(spark, dir, 2).count() === nVecs)
    // the NEXT append still works — it reads only version-1 = the head
    KnnGraph.appendToIndex(spark, dir, oldBatch.limit(3)
      .withColumn("vec_id", col("vec_id") + 10000))
    assert(KnnGraph.currentVersion(spark, dir) === 3L)
    // keep >= 1 is enforced: the current version can never be GC'd
    intercept[IllegalArgumentException](KnnGraph.pruneVersions(spark, dir, keep = 0))
  }

  test("index: compactVectors folds batch dirs, every committed version's corpus unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft-knn-cvec").toString
    KnnGraph.buildIndex(oldBatch, k = 5, iters = 0, dir)
    val half = newBatch.filter(col("vec_id") % 2 === 0)
    KnnGraph.appendVersion(spark, dir, half, 1L)
    KnnGraph.appendVersion(spark, dir, newBatch.except(half), 2L)
    def corpus(v: Long): Set[Long] =
      KnnGraph.indexVectors(spark, dir, v).select("vec_id").collect()
        .map(_.getLong(0)).toSet
    def batchDirs: Set[String] =
      new java.io.File(s"$dir/vectors").listFiles().map(_.getName)
        .filter(_.startsWith("batch=")).toSet
    // two committed versions retained: fold only batches <= the oldest
    KnnGraph.pruneVersions(spark, dir, keep = 2) // GC v0, keep v1+v2
    val (c1, c2) = (corpus(1), corpus(2))
    assert(KnnGraph.compactVectors(spark, dir) === 1, "batches 0,1 fold into one")
    assert(batchDirs === Set("batch=1", "batch=2"))
    assert(corpus(1) === c1, "version 1's corpus changed under compaction")
    assert(corpus(2) === c2, "version 2's corpus changed under compaction")
    // after pruning to the head alone, everything folds into one dir
    KnnGraph.pruneVersions(spark, dir, keep = 1)
    assert(KnnGraph.compactVectors(spark, dir) === 1)
    assert(batchDirs === Set("batch=2"))
    assert(corpus(2) === c2)
    // idempotent: nothing left to fold
    assert(KnnGraph.compactVectors(spark, dir) === 0)
    // the index still serves and the NEXT append continues the numbering
    assert(KnnGraph.searchIndex(spark, dir, oldBatch.limit(4), k = 3, rounds = 1)
      .count() > 0)
    KnnGraph.appendToIndex(spark, dir,
      oldBatch.limit(3).withColumn("vec_id", col("vec_id") + 20000))
    assert(KnnGraph.currentVersion(spark, dir) === 3L)
    assert(corpus(3).size === c2.size + 3)

    // crashed-compact recovery: (a) a stale staging dir from a dead
    // attempt must never ride a later fold in (it carries an older vmin)
    val cNow = corpus(3)
    spark.read.option("basePath", s"$dir/vectors").parquet(s"$dir/vectors")
      .select("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/vectors_compact/batch=0")
    KnnGraph.pruneVersions(spark, dir, keep = 1)
    KnnGraph.compactVectors(spark, dir)
    assert(corpus(3) === cNow, "stale staging leaked into the folded corpus")
    // (b) crash between the renames: vectors gone, originals at _old —
    // any write-entry (cleanupUncommittedIndex) restores them
    val fsys = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fsys.rename(new org.apache.hadoop.fs.Path(s"$dir/vectors"),
      new org.apache.hadoop.fs.Path(s"$dir/vectors_old")))
    KnnGraph.cleanupUncommittedIndex(spark, dir)
    assert(corpus(3) === cNow, "between-renames crash not recovered")
    assert(!new java.io.File(s"$dir/vectors_old").exists())
  }

  test("index: buildIndex refuses to wipe a directory that is not an index") {
    val dir = java.nio.file.Files.createTempDirectory("graft-knn-guard").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "precious.txt"), "unrelated data")
    val e = intercept[IllegalArgumentException] {
      KnnGraph.buildIndex(oldBatch, k = 5, iters = 0, dir)
    }
    assert(e.getMessage.contains("refusing to wipe"))
    assert(new java.io.File(s"$dir/precious.txt").exists(), "guard still deleted the data")
    // a previous index at the path IS wiped and rebuilt (the documented
    // rebuild semantics), as is an empty directory
    val idxDir = java.nio.file.Files.createTempDirectory("graft-knn-guard2").toString
    KnnGraph.buildIndex(oldBatch, k = 5, iters = 0, idxDir)
    KnnGraph.buildIndex(oldBatch, k = 5, iters = 0, idxDir)
    assert(KnnGraph.currentVersion(spark, idxDir) === 0L)
  }
}
