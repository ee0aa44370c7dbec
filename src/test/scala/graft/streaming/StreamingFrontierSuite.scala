package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Crawl-frontier seen filter: the batch gates' twin==witness pin, the
  * no-false-negative / always-emit-novel contract, retry idempotence on
  * the _SUCCESS marker, the emit-first/grow-second crash order, and a
  * MemoryStream end-to-end drive. */
class StreamingFrontierSuite extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private def pages(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "html")
  }

  private def page(links: String*): String =
    links.map(l => s"""<p>x</p><a href="$l">t</a>""").mkString(" ")

  test("batch gates: Bloom production twin equals the exact anti-join witness") {
    val d = "/root/testdata/sf0.001"
    val exact = graft.queries.LlmOps.queries("q_frontier_new")(spark, d)
      .collect().map(_.toSeq).toSeq
    val bloom = graft.queries.LlmOps.queries("q_frontier_new_bloom")(spark, d)
      .collect().map(_.toSeq).toSeq
    // no false negatives: every exact-new link the bloom emits too,
    // minus at most the documented false-positive drops — on this
    // fixture (thousands of keys in 2^22 bits) the two must be equal
    assert(bloom === exact, "bloom twin diverged from the exact witness")
    assert(exact.nonEmpty, "fixture must produce new links")
  }

  test("frontierBatches: no batch exceeds perBatch per domain; batches dense; cap exercised") {
    val got = graft.queries.LlmOps.queries("q_frontier_batches")(
      spark, "/root/testdata/sf0.001").cache()
    try {
      // the politeness invariant itself
      assert(got.groupBy("domain", "batch").count()
        .filter(col("count") > 3).count() === 0L,
        "a batch holds more than perBatch links of one domain")
      // batches are dense per domain: exactly ceil(n/perBatch) of them
      assert(got.groupBy("domain")
        .agg(count(lit(1)).as("n"), max("batch").as("mb"))
        .filter(col("mb") =!= expr("(n - 1) div 3")).count() === 0L,
        "per-domain batches must be consecutive from 0")
      // slots are unique within (domain, batch)
      assert(got.groupBy("domain", "batch", "slot").count()
        .filter(col("count") > 1).count() === 0L)
      // and the fixture genuinely exercises the cap
      assert(got.filter(col("batch") > 0).count() > 0,
        "no domain ever overflowed batch 0 — fixture too thin")
    } finally got.unpersist()
  }

  test("frontierBatchesRanked: priority order dealt first, politeness invariant holds") {
    val got = graft.queries.LlmOps.queries("q_frontier_batches_priority")(
      spark, "/root/testdata/sf0.001").cache()
    try {
      // the politeness invariant is policy-independent
      assert(got.groupBy("domain", "batch").count()
        .filter(col("count") > 3).count() === 0L,
        "a batch holds more than perBatch links of one domain")
      assert(got.groupBy("domain", "batch", "slot").count()
        .filter(col("count") > 1).count() === 0L)
      // and the policy genuinely reorders: the canonical-order dealing
      // must disagree with the priority dealing somewhere (same canon,
      // different batch), or the rank expression isn't wired through
      val canonOrder = graft.queries.LlmOps.frontierBatches(
        got.select("canon"), perBatch = 3)
        .select(col("canon"), col("batch").as("cbatch"))
      assert(got.join(canonOrder, "canon")
        .filter(col("batch") =!= col("cbatch")).count() > 0,
        "priority ranking never moved a link — the policy seam is dead")
    } finally got.unpersist()
  }

  test("frontierBatchesHostCapped: both caps hold; host cap genuinely bites; batches dense") {
    val got = graft.queries.LlmOps.queries("q_frontier_batches_host")(
      spark, "/root/testdata/sf0.001").cache()
    try {
      // the domain-level politeness invariant
      assert(got.groupBy("batch", "domain").count()
        .filter(col("count") > 3).count() === 0L,
        "a batch holds more than perBatch links of one domain")
      // the HOST-level invariant — the round-16 addition
      assert(got.groupBy("batch", "host").count()
        .filter(col("count") > 2).count() === 0L,
        "a batch holds more than perHost links of one host")
      // slots unique within a domain's share of a batch
      assert(got.groupBy("batch", "domain", "slot").count()
        .filter(col("count") > 1).count() === 0L)
      // batches contiguous from 0
      val ids = got.select("batch").distinct()
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids === (0L until ids.size).toSeq,
        s"batch ids must be dense from 0: $ids")
      // the fixture genuinely exercises the host cap: some host carries
      // more links than perHost, so its links span multiple batches
      val fat = got.groupBy("host").count().filter(col("count") > 2)
        .select("host").collect().map(_.getString(0))
      assert(fat.nonEmpty, "no host exceeds perHost — fixture too thin")
      assert(got.filter(col("host") === fat.head)
        .select("batch").distinct().count() > 1L,
        "an over-cap host never spilled into a second batch")
    } finally got.unpersist()
  }

  test("with a page URL, relative hrefs become edges and enqueue exactly once") {
    val seen = tmp("sfront-rel-seen")
    val out = tmp("sfront-rel-out")
    import spark.implicits._
    def rpages(rows: (Long, String, String)*): DataFrame =
      rows.toDF("doc_id", "url", "html")
    // batch 0: a plain relative href and a DOTTED spelling of the same
    // resource on two pages of one directory — resolution + dot-segment
    // collapse must land both on one canon, and the within-batch dedupe
    // must enqueue that canon exactly once
    StreamingFrontier.applyBatch(rpages(
        (1L, "http://h.io/dir/page.html", page("img.html")),
        (2L, "http://h.io/dir/other.html", page("sub/../img.html"))),
      seen, out, 0L, baseCol = Some("url"))
    val b0 = StreamingFrontier.newLinks(spark, out)
      .filter(col("batch") === 0)
      .select("doc_id", "canon").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(b0 === Seq((1L, "http://h.io/dir/img.html")),
      s"one resolved canon, enqueued once, min-doc witness: $b0")
    // batch 1: the same resource relative from a sibling page probes
    // SEEN (no re-emit); a novel relative href emits; a same-document
    // '#frag' and a mailto: are shape-dropped, never resolved
    StreamingFrontier.applyBatch(rpages(
        (3L, "http://h.io/dir/x.html",
          page("img.html", "new.html", "#frag", "mailto:a@h.io"))),
      seen, out, 1L, baseCol = Some("url"))
    val b1 = StreamingFrontier.newLinks(spark, out)
      .filter(col("batch") === 1)
      .select("canon").collect().map(_.getString(0)).toSeq
    assert(b1 === Seq("http://h.io/dir/new.html"),
      s"seen-relative re-emitted or novel-relative swallowed: $b1")
  }

  test("within-batch duplicate canons emit exactly once (min doc_id/link witness)") {
    val seen = tmp("sfront-dup-seen")
    val out = tmp("sfront-dup-out")
    // batch 0 (unseeded — probes nothing) carries the same canonical
    // link three times: twice on one page (a variant spelling) and once
    // on another page, plus one singleton
    StreamingFrontier.applyBatch(
      pages(
        2L -> page("https://h.io/a", "https://h.io:443/a?utm_x=1"),
        1L -> page("https://h.io/a", "https://h.io/b")),
      seen, out, 0L)
    val rows = StreamingFrontier.newLinks(spark, out)
      .filter(col("batch") === 0)
      .select("doc_id", "link", "canon").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.count(_._3 == "https://h.io/a") === 1,
      s"a within-batch duplicate canon emitted more than once: ${rows.toSeq}")
    // the witness is the MIN (doc_id, link) — deterministic across retries
    assert(rows.find(_._3 == "https://h.io/a").get._1 === 1L)
    assert(rows.map(_._3).sorted.toSeq === Seq("https://h.io/a", "https://h.io/b"))
    // and a SEEDED batch with an internal duplicate also emits once
    StreamingFrontier.applyBatch(
      pages(3L -> page("https://h.io/c", "https://h.io/c?utm_s=2")),
      seen, out, 1L)
    assert(StreamingFrontier.newLinks(spark, out)
      .filter(col("batch") === 1).count() === 1L)
  }

  test("seen links never re-emit; novel links always emit; canonical forms collapse") {
    val seen = tmp("sfront-seen")
    val out = tmp("sfront-out")
    // batch 0 seeds: a and b are discovered
    StreamingFrontier.applyBatch(
      pages(1L -> page("https://h.io/a", "http://h.io/b")), seen, out, 0L)
    val b0 = StreamingFrontier.newLinks(spark, out)
      .filter(col("batch") === 0).select("canon")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(b0 === Seq("http://h.io/b", "https://h.io/a"))
    // batch 1: a re-appears (also as a NON-canonical variant with a
    // default port and tracking param — must still count as seen);
    // c is novel
    StreamingFrontier.applyBatch(
      pages(2L -> page("https://h.io:443/a?utm_x=1", "https://h.io/c")),
      seen, out, 1L)
    val b1 = StreamingFrontier.newLinks(spark, out)
      .filter(col("batch") === 1).select("canon")
      .collect().map(_.getString(0)).toSeq
    assert(b1 === Seq("https://h.io/c"),
      s"seen link re-emitted or novel link swallowed: $b1")
    // batch 2: everything already seen -> empty emit
    StreamingFrontier.applyBatch(
      pages(3L -> page("https://h.io/a", "https://h.io/c")), seen, out, 2L)
    assert(StreamingFrontier.newLinks(spark, out)
      .filter(col("batch") === 2).count() === 0L)
  }

  test("retry idempotence: a committed batch never re-emits; a torn grow heals") {
    val seen = tmp("sfront-retry-seen")
    val out = tmp("sfront-retry-out")
    StreamingFrontier.applyBatch(pages(1L -> page("https://h.io/a")), seen, out, 0L)
    StreamingFrontier.applyBatch(pages(2L -> page("https://h.io/b")), seen, out, 1L)
    val before = StreamingFrontier.newLinks(spark, out)
      .orderBy("batch", "canon").collect().map(_.toSeq).toSeq
    // foreachBatch at-least-once replay of batch 1: emit already
    // committed -> must not re-derive (the filter has since grown — a
    // re-derive would emit EMPTY and lose the record)
    StreamingFrontier.applyBatch(pages(2L -> page("https://h.io/b")), seen, out, 1L)
    val after = StreamingFrontier.newLinks(spark, out)
      .orderBy("batch", "canon").collect().map(_.toSeq).toSeq
    assert(after === before, "retry changed the committed emits")
    // crash between emit and grow: simulate by wiping the filter back
    // to the batch-0 state, then replaying batch 1 — the emit stands,
    // the filter heals (b probes seen afterwards)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(seen), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(seen), true)
    StreamingFrontier.applyBatch(pages(1L -> page("https://h.io/a")), seen, out, 0L)
    StreamingFrontier.applyBatch(pages(2L -> page("https://h.io/b")), seen, out, 1L)
    assert(StreamingFrontier.newLinks(spark, out)
      .orderBy("batch", "canon").collect().map(_.toSeq).toSeq === before)
    // after the heal both links probe seen: a third batch emits nothing
    StreamingFrontier.applyBatch(
      pages(3L -> page("https://h.io/a", "https://h.io/b")), seen, out, 2L)
    assert(StreamingFrontier.newLinks(spark, out)
      .filter(col("batch") === 2).count() === 0L)
  }

  test("MemoryStream end-to-end: two arrivals, frontier grows across batches") {
    val seen = tmp("sfront-e2e-seen")
    val out = tmp("sfront-e2e-out")
    import spark.implicits._
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamingFrontier.frontierSink(
      input.toDF().toDF("doc_id", "html"), seen, out,
      checkpointDir = Some(tmp("sfront-ckpt")))
    try {
      input.addData((1L, page("https://h.io/a", "https://h.io/b")))
      q.processAllAvailable()
      input.addData((2L, page("https://h.io/b", "https://h.io/c")))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = StreamingFrontier.newLinks(spark, out)
      .select("canon").collect().map(_.getString(0)).sorted.toSeq
    assert(emitted === Seq("https://h.io/a", "https://h.io/b", "https://h.io/c"),
      s"each canonical link exactly once across the stream: $emitted")
  }
}
