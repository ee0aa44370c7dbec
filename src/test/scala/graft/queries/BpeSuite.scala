package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-worked goldens for the BPE merge trainer (LlmOps.bpeTrain). */
class BpeSuite extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  /** A corpus whose word-frequency table is the canonical Sennrich et
    * al. 2016 example: low:5, lower:2, newest:6, widest:3. */
  private def sennrichCorpus: DataFrame = {
    import spark.implicits._
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
  }

  test("bpeTrain reproduces the canonical Sennrich merge sequence with deterministic tiebreaks") {
    val (merges, vocab) = LlmOps.bpeTrain(sennrichCorpus, merges = 4)
    val got = merges.orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // hand-computed: (e,s) ties (s,t) at 9 -> 'e' < 's' wins; then
    // (es,t) 9; then (l,o) ties (o,w) at 7 -> 'l' < 'o'; then (lo,w) 7
    assert(got === Seq(
      (1L, "e", "s", 9L), (2L, "es", "t", 9L),
      (3L, "l", "o", 7L), (4L, "lo", "w", 7L)))
    val enc = vocab.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(enc("newest") === "|n||e||w||est|")
    assert(enc("widest") === "|w||i||d||est|")
    assert(enc("low") === "|low|")
    assert(enc("lower") === "|low||e||r|")
  }

  test("self-pair merges are greedy left-to-right non-overlapping (the pipe-encoding contract)") {
    import spark.implicits._
    val (merges, vocab) = LlmOps.bpeTrain(
      Seq((1L, "aaa")).toDF("doc_id", "text"), merges = 2)
    val got = merges.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // 'aaa' = [a,a,a]: pair (a,a) counted at BOTH adjacent positions
    // (Sennrich's counting), but replace merges only the LEFT occurrence
    // -> [aa, a]; round 2 merges (aa, a) -> [aaa]
    assert(got === Seq(("a", "a", 2L), ("aa", "a", 1L)))
    assert(vocab.collect().head.getString(2) === "|aaa|")
  }

  test("bpeTrain stops early when no pair remains and drops pipe-containing words") {
    import spark.implicits._
    val (merges, vocab) = LlmOps.bpeTrain(
      Seq((1L, "ab a|b x")).toDF("doc_id", "text"), merges = 5)
    // 'a|b' is dropped; 'ab' yields ONE merge, 'x' has no pairs
    assert(merges.count() === 1L)
    assert(vocab.collect().map(_.getString(0)).toSet === Set("ab", "x"))
  }

  test("merge symbols with backslashes and line terminators survive literal quoting and encoding") {
    import spark.implicits._
    // backslash pair wins a merge: sqlStr must double it or mergeExpr's
    // Spark literal swallows the closing quote (review-pass finding)
    val (m1, v1) = LlmOps.bpeTrain(
      Seq((1L, "a\\ a\\ a\\")).toDF("doc_id", "text"), merges = 1)
    assert(m1.collect().map(r => (r.getString(1), r.getString(2))).toSeq
      === Seq(("a", "\\")))
    assert(v1.collect().head.getString(2) === "|a\\|")
    // \r inside a token: Java regex '.' would drop it silently ([\s\S]
    // keeps every character), splitting 'b\rc' and 'bc' apart
    val (_, v2) = LlmOps.bpeTrain(
      Seq((1L, "b\rc bc")).toDF("doc_id", "text"), merges = 1)
    val enc = v2.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(enc("b\rc").contains("\r"), s"\\r dropped from encoding: $enc")
    assert(enc("b\rc") !== enc("bc"), "distinct words collapsed to one encoding")
  }

  test("incremental (delta-count) training picks IDENTICAL merges to the recount path") {
    import spark.implicits._
    // fixture with ties, self-pairs and early exhaustion in one corpus
    val docs = Seq((1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest") ++
      Seq.fill(2)("aaa")).mkString(" "))).toDF("doc_id", "text")
    def table(inc: Boolean) =
      LlmOps.bpeTrain(docs, merges = 8, incremental = inc)._1
        .orderBy("rank").collect().map(_.toSeq).toSeq
    assert(table(inc = true) === table(inc = false))
    // and on organic corpus text at sf0.001, the full 12-merge gate depth
    val organic = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    def org(inc: Boolean) =
      LlmOps.bpeTrain(organic, merges = 12, incremental = inc)._1
        .orderBy("rank").collect().map(_.toSeq).toSeq
    val (i, r) = (org(inc = true), org(inc = false))
    assert(i.size === 12 && i === r,
      "delta-count training drifted from the recount path on organic text")
  }

  test("q_text_bpe_apply invariants: n_bpe between n_ws (full merge) and char count (no merge)") {
    val sf = "/root/testdata/sf0.001"
    val rows = LlmOps.queries("q_text_bpe_apply")(spark, sf).collect()
    assert(rows.nonEmpty)
    val chars = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (doc, nWs, nBpe) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(nBpe >= nWs, s"doc $doc: merged below one symbol per word")
      assert(nBpe <= chars(doc), s"doc $doc: more symbols than characters")
    }
  }
}
