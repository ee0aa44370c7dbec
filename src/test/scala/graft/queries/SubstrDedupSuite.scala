package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the exact-substring (ExactSubstr) dedup family:
  * q_dedup_substr / _xxh / _clean. The crafted corpus plants a repeated
  * 12-token passage across documents AND within one document, so every
  * contract clause is exercised: canonical-first exemption, island
  * merging of overlapping marks, within-doc repeats, untouched-document
  * passthrough, and full-coverage removal. */
class SubstrDedupSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** 12 distinct tokens forming the planted passage. */
  private val passage = (1 to 12).map(i => s"p$i").mkString(" ")
  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  private def crafted = {
    import spark.implicits._
    Seq(
      // doc 1: canonical occurrence (first by (doc_id, pos)) — KEPT
      (1L, s"${words("a", 5)} $passage ${words("b", 5)}"),
      // doc 2: one later occurrence — marked; surrounding text unique
      (2L, s"${words("c", 3)} $passage ${words("d", 8)}"),
      // doc 3: the passage TWICE (within-doc repeat) — both marked
      (3L, s"$passage ${words("e", 4)} $passage"),
      // doc 4: untouched
      (4L, words("f", 20)),
      // doc 5: exactly the passage — fully covered after removal
      (5L, passage),
      // doc 6: shorter than the window — contributes no windows at all
      (6L, words("g", 7)),
    ).toDF("doc_id", "text")
  }

  test("crafted corpus: canonical kept, islands merged, within-doc repeats marked") {
    val spans = LlmOps.substrSpansOf(crafted, w = 12, hashKeys = false)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 1 (canonical) and docs 4/6 produce no spans; doc 2's single
    // occurrence at tokens 4..15; doc 3 both occurrences (1..12, 17..28);
    // doc 5 the whole doc (1..12)
    assert(spans === Seq(
      (2L, 4L, 15L),
      (3L, 1L, 12L),
      (3L, 17L, 28L),
      (5L, 1L, 12L)))
    // the xxh production twin is span-identical
    val xxh = LlmOps.substrSpansOf(crafted, w = 12, hashKeys = true)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(xxh === spans, "hashed-key twin diverged from exact string keys")
  }

  test("overlapping repeated windows merge into ONE maximal span") {
    import spark.implicits._
    // doc 11 repeats doc 10's 16-token run: windows at offsets 1..5 all
    // repeat, and their marks [p, p+11] overlap — one island 1..16
    val run = (1 to 16).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (10L, s"$run ${words("x", 4)}"),
      (11L, s"$run ${words("y", 4)}"),
    ).toDF("doc_id", "text")
    val spans = LlmOps.substrSpansOf(docs, w = 12, hashKeys = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(spans === Seq((11L, 1L, 16L)), s"got $spans")
  }

  test("canonical selection survives a >1M-token document (struct min, no packed alias)") {
    import spark.implicits._
    // doc 1 carries the passage at position 1,050,001 — past the 1M-token
    // bound where the r9 doc_id·10⁶+pos packing aliased doc 1's positions
    // into doc 2's range and wrongly ceded the canonical to doc 2
    // (1·10⁶+1050001 = 2050001 > 2·10⁶+1). Lexicographic struct(doc_id,
    // pos) min keeps doc 1 canonical: ONLY doc 2's occurrence is marked.
    val n = 1050000
    val sb = new StringBuilder(n * 10)
    var i = 0
    while (i < n) { sb.append('u').append(i).append(' '); i += 1 }
    sb.append(passage)
    val docs = Seq((1L, sb.toString), (2L, s"$passage ${words("z", 4)}"))
      .toDF("doc_id", "text")
    val spans = LlmOps.substrSpansOf(docs, w = 12, hashKeys = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(spans === Seq((2L, 1L, 12L)), s"got $spans")
  }

  test("xxh twin equals the string-keyed form on the real corpus") {
    val a = SparkEntryAccess.run("q_dedup_substr", sf)
    val b = SparkEntryAccess.run("q_dedup_substr_xxh", sf)
    assert(a.nonEmpty, "planted near-dups should yield spans at sf0.001")
    assert(a === b, "xxh twin diverged on the real corpus")
  }

  test("clean: survivors re-joined, untouched docs pass through, full coverage empties") {
    // drive the gated query end-to-end on the real corpus for shape...
    val rows = graft.SparkEntry.queries("q_dedup_substr_clean")(spark, sf)
      .collect()
    val byId = rows.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(rows.length.toLong === graft.Tables(spark, sf, "documents").count())
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1)))
    // ...and reconcile against the spans query: removed token count per
    // doc equals the summed span lengths; untouched docs keep their text
    val spanLen = graft.SparkEntry.queries("q_dedup_substr")(spark, sf)
      .groupBy("doc_id")
      .agg(sum(col("span_end") - col("span_start") + 1).as("rm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byId.foreach { case (id, (n, rm, clean)) =>
      assert(rm === spanLen.getOrElse(id, 0L), s"doc $id removed-count drift")
      assert(clean.split(" ").filter(_.nonEmpty).length === (n - rm),
        s"doc $id clean token count")
    }
    assert(spanLen.nonEmpty)
  }

  test("plan: equi-joins only; every window stays key-partitioned") {
    for (k <- Seq("q_dedup_substr", "q_dedup_substr_xxh", "q_dedup_substr_clean")) {
      val plan = graft.SparkEntry.queries(k)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), s"$k plan:\n$plan")
      // no window may become a corpus-wide single-partition sort: the
      // island merge partitions by doc_id, and (since r17) the
      // repeated-window marking partitions by the window key k — the
      // groupBy+join-back it replaced re-shuffled the widest frame twice
      val specs = plan.linesIterator
        .filter(_.contains("windowspecdefinition")).toSeq
      assert(specs.nonEmpty, s"$k: expected island-merge windows")
      assert(specs.forall(s => s.contains("doc_id") || s.contains("k#")),
        s"$k has a window with an unexpected partition spec:\n${specs.mkString("\n")}")
      // ...and the marking window is genuinely partitioned (an empty
      // windowspecdefinition(...) would be the corpus-wide-sort shape)
      assert(specs.forall(!_.contains("windowspecdefinition()")),
        s"$k has an unpartitioned window:\n${specs.mkString("\n")}")
    }
  }
}

/** Collects a gated query's rows as comparable tuples. */
private object SparkEntryAccess {
  def run(key: String, sf: String): Seq[Seq[Any]] =
    graft.SparkEntry.queries(key)(graft.SparkSpec.spark, sf)
      .collect().map(_.toSeq.toVector).toVector
}
