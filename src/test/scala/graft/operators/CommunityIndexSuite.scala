package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted community index: build/append parity with full LPA
  * recompute, repeat-edge tolerance, retry idempotence, crash hygiene
  * (torn adjacency swept), snapshot pruning, and the guard rails. */
class CommunityIndexSuite extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private def nodes(ids: Long*): DataFrame = {
    import spark.implicits._
    ids.toDF("id")
  }
  private def edges(es: (Long, Long)*): DataFrame = {
    import spark.implicits._
    es.toDF("src", "dst")
  }
  private def toMap(df: DataFrame): Map[Long, Long] =
    df.select("id", "label").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private val tri = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L,
    4L -> 5L, 5L -> 6L, 4L -> 6L, 3L -> 4L)

  test("build converges to the full-run labeling; labels() reads the head") {
    val path = tmp("cidx-build")
    val built = toMap(CommunityIndex.build(nodes(1L to 6L: _*), edges(tri: _*), path))
    val full = toMap(LabelPropagation.run(nodes(1L to 6L: _*), edges(tri: _*), iters = 4))
    assert(built === full, "cold build diverged from the full LPA run")
    assert(toMap(CommunityIndex.labels(spark, path)) === built)
    assert(CommunityIndex.version(spark, path) === Some(0L))
  }

  test("append merges a delta like a full recompute, and repeats are dropped") {
    val path = tmp("cidx-append")
    CommunityIndex.build(nodes(1L to 6L: _*), edges(tri: _*), path)
    // delta: new triangle {7,8,9} bridged into {1,2,3} via node 1, PLUS a
    // repeat of an already-indexed edge (2,3) and an in-delta duplicate
    val delta = Seq(7L -> 8L, 8L -> 9L, 7L -> 9L, 1L -> 7L, 2L -> 3L, 7L -> 8L)
    val inc = toMap(CommunityIndex.append(nodes(), edges(delta: _*), path))
    val full = toMap(LabelPropagation.run(nodes(1L to 9L: _*),
      edges(tri ++ Seq(7L -> 8L, 8L -> 9L, 7L -> 9L, 1L -> 7L): _*), iters = 6))
    assert(inc === full, "incremental append diverged from the full recompute")
    // the adjacency must stay (src, dst)-unique despite the repeats
    val adj = CommunityIndex.adjacency(spark, path)
    assert(adj.count() === adj.distinct().count(),
      "repeat edges duplicated adjacency rows")
    // version advanced, exactly one self-loop per node
    assert(CommunityIndex.version(spark, path) === Some(1L))
    assert(adj.filter(col("src") === col("dst")).count() === 9L)
  }

  test("isolated new nodes enter as their own community") {
    val path = tmp("cidx-iso")
    CommunityIndex.build(nodes(1L, 2L), edges(1L -> 2L), path)
    val l = toMap(CommunityIndex.append(nodes(99L), edges(), path))
    assert(l(99L) === 99L)
    assert(l.keySet === Set(1L, 2L, 99L))
  }

  test("advance is retry-idempotent and sweeps a torn adjacency delta") {
    val path = tmp("cidx-crash")
    CommunityIndex.build(nodes(1L, 2L, 3L), edges(1L -> 2L), path)
    val v1 = toMap(CommunityIndex.advance(path, 5L, nodes(), edges(2L -> 3L)))
    // re-advancing to the committed head returns the stored labeling
    val again = toMap(CommunityIndex.advance(path, 5L, nodes(),
      edges(999L -> 998L))) // delta ignored on a committed retry
    assert(again === v1)
    assert(CommunityIndex.labels(spark, path).count() === 3)
    // simulate a crash: a torn adjacency batch ABOVE the committed head
    // (written by a failed advance) must be swept, not double-counted
    edges(1L -> 3L, 3L -> 1L, 1L -> 3L)
      .write.mode("overwrite").parquet(s"$path/adj/batch=7")
    val healed = toMap(CommunityIndex.advance(path, 7L, nodes(), edges(1L -> 3L)))
    val full = toMap(LabelPropagation.run(nodes(1L, 2L, 3L),
      edges(1L -> 2L, 2L -> 3L, 1L -> 3L), iters = 4))
    assert(healed === full, "torn adjacency leaked into the healed labeling")
    val adj = CommunityIndex.adjacency(spark, path)
    assert(adj.count() === adj.distinct().count(),
      "torn delta left duplicate adjacency rows")
  }

  test("snapshot pruning keeps only {predecessor, current}") {
    val path = tmp("cidx-prune")
    CommunityIndex.build(nodes(1L), edges(), path)
    CommunityIndex.append(nodes(2L), edges(), path)
    CommunityIndex.append(nodes(3L), edges(), path)
    CommunityIndex.append(nodes(4L), edges(), path)
    val vs = graft.streaming.VersionedState.committedVersions(spark, path).sorted
    assert(vs === Seq(2L, 3L), s"expected {predecessor, current}, got $vs")
    // adjacency deltas are the graph — they all survive
    assert(CommunityIndex.adjacency(spark, path).count() === 4L) // 4 self-loops
  }

  test("keepVersions retention enables labelsAt time travel") {
    val path = tmp("cidx-asof")
    CommunityIndex.build(nodes(1L, 2L), edges(1L -> 2L), path)
    val atV0 = toMap(CommunityIndex.labels(spark, path))
    CommunityIndex.append(nodes(3L), edges(2L -> 3L), path, keepVersions = 4)
    CommunityIndex.append(nodes(), edges(1L -> 3L), path, keepVersions = 4)
    val vs = graft.streaming.VersionedState.committedVersions(spark, path).sorted
    assert(vs === Seq(0L, 1L, 2L), s"retention dropped a kept snapshot: $vs")
    // the watermark-v0 read is the labeling as committed THEN
    assert(toMap(CommunityIndex.labelsAt(spark, path, 0L)) === atV0)
    assert(toMap(CommunityIndex.labelsAt(spark, path, 2L)) ===
      toMap(CommunityIndex.labels(spark, path)))
    // a pruned (or never-committed) watermark fails loudly
    intercept[IllegalArgumentException] {
      CommunityIndex.labelsAt(spark, path, 9L)
    }
    // the retry window cannot be disabled
    intercept[IllegalArgumentException] {
      CommunityIndex.advance(path, 10L, nodes(), edges(), keepVersions = 1)
    }
  }

  test("compact folds adjacency deltas without changing the graph; appends continue") {
    val path = tmp("cidx-compact")
    CommunityIndex.build(nodes(1L, 2L, 3L), edges(1L -> 2L), path)
    CommunityIndex.append(nodes(), edges(2L -> 3L), path)
    CommunityIndex.append(nodes(4L), edges(3L -> 4L), path)
    val before = CommunityIndex.adjacency(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // a torn delta above the head must be swept, not folded in
    edges(9L -> 9L).write.mode("overwrite").parquet(s"$path/adj/batch=99")
    assert(CommunityIndex.compact(spark, path) === 2) // 3 dirs -> 1
    val after = CommunityIndex.adjacency(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === before, "compaction changed the adjacency content")
    assert(CommunityIndex.compact(spark, path) === 0) // idempotent
    // the index still advances past a compaction
    val l = toMap(CommunityIndex.append(nodes(), edges(4L -> 5L), path))
    val full = toMap(LabelPropagation.run(nodes(1L to 5L: _*),
      edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L), iters = 6))
    assert(l === full, "append after compact diverged from the full recompute")
  }

  test("a caller's self-edge never doubles the node's self-vote") {
    val path = tmp("cidx-selfedge")
    CommunityIndex.build(nodes(1L, 2L), edges(1L -> 2L), path)
    // 7 arrives via a self-link plus a real edge: the (7,7) caller edge
    // must collapse into the index's own single self-loop
    val l = toMap(CommunityIndex.append(nodes(), edges(7L -> 7L, 1L -> 7L), path))
    assert(l.keySet === Set(1L, 2L, 7L))
    val adj = CommunityIndex.adjacency(spark, path)
    assert(adj.count() === adj.distinct().count(),
      "self-edge duplicated an adjacency row")
    assert(adj.filter(col("src") === lit(7L) && col("dst") === lit(7L)).count() === 1L)
  }

  test("a crashed compact is recovered at the next compact or advance") {
    val path = tmp("cidx-crashed-compact")
    CommunityIndex.build(nodes(1L, 2L, 3L), edges(1L -> 2L), path)
    CommunityIndex.append(nodes(), edges(2L -> 3L), path)
    val before = CommunityIndex.adjacency(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // window (a): staging written at an OLD head, crash before any rename
    CommunityIndex.adjacency(spark, path)
      .write.mode("overwrite").parquet(s"$path/adj_compact/batch=1")
    assert(CommunityIndex.compact(spark, path) === 1) // 2 dirs -> 1
    val after = CommunityIndex.adjacency(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === before, "stale staging dir leaked into the compacted adjacency")
    // window (b): crash between the two renames — adj gone, adj_old intact
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.rename(new org.apache.hadoop.fs.Path(s"$path/adj"),
      new org.apache.hadoop.fs.Path(s"$path/adj_old")))
    val healed = toMap(CommunityIndex.append(nodes(), edges(1L -> 3L), path))
    val full = toMap(LabelPropagation.run(nodes(1L, 2L, 3L),
      edges(1L -> 2L, 2L -> 3L, 1L -> 3L), iters = 4))
    assert(healed === full, "between-renames crash not recovered by advance")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/adj_old")))
  }

  test("dup-drop plan: the committed adjacency is scanned, never shuffled") {
    val path = tmp("cidx-plan")
    CommunityIndex.build(nodes(1L, 2L, 3L), edges(1L -> 2L, 2L -> 3L), path)
    val adj = CommunityIndex.adjacency(spark, path)
    val symm = edges(1L -> 3L, 3L -> 1L, 1L -> 2L, 2L -> 1L)
    val p = CommunityIndex.dropIndexed(adj, symm)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the only exchanges are the delta-side broadcasts — no data shuffle
    assert(!p.contains("Exchange hashpartitioning"),
      s"committed adjacency must not hash-shuffle:\n$p")
  }

  test("guard rails: build refuses an existing index, append an empty path") {
    val path = tmp("cidx-guard")
    CommunityIndex.build(nodes(1L), edges(), path)
    intercept[IllegalArgumentException] {
      CommunityIndex.build(nodes(2L), edges(), path)
    }
    intercept[IllegalStateException] {
      CommunityIndex.append(nodes(1L), edges(), tmp("cidx-empty"))
    }
    intercept[IllegalArgumentException] {
      CommunityIndex.advance(path, -1L, nodes(), edges()) // below the head
    }
  }
}
