package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SubstrIndexSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("substr-idx").toString + "/idx"

  private def spans(df: DataFrame): Seq[(Long, Long, Long)] =
    df.orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  private val passage = (1 to 12).map(i => s"p$i").mkString(" ")
  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("crafted: cross-batch marking with the canonical safely in the index") {
    import spark.implicits._
    val path = tmp()
    SubstrIndex.build(Seq(
      (1L, s"${words("a", 3)} $passage ${words("b", 3)}"), // canonical at pos 4
      (2L, words("c", 20)),
    ).toDF("doc_id", "text"), path)
    // new batch: doc 10 repeats the indexed passage (marked whole), doc
    // 11 repeats a NEW passage twice (within-batch: second marked only),
    // doc 12 is untouched
    val fresh = (1 to 12).map(i => s"q$i").mkString(" ")
    val out = spans(SubstrIndex.dedupAgainst(path, Seq(
      (10L, s"${words("d", 2)} $passage"),
      (11L, s"$fresh ${words("e", 3)} $fresh"),
      (12L, words("f", 15)),
    ).toDF("doc_id", "text")))
    assert(out === Seq((10L, 3L, 14L), (11L, 16L, 27L)))
    assert(SubstrIndex.width(spark, path) === 12)
  }

  test("incremental == batch q_dedup_substr_xxh restricted to the new docs") {
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
    val cut = 399L
    val path = tmp()
    SubstrIndex.build(docs.filter(col("doc_id") < cut), path)
    val inc = spans(SubstrIndex.dedupAgainst(path, docs.filter(col("doc_id") >= cut)))
    val batch = spans(graft.queries.LlmOps
      .substrSpansOf(docs, w = 12, hashKeys = true)
      .filter(col("doc_id") >= cut))
    assert(inc === batch, "incremental drifted from batch-over-everything")
    assert(inc.nonEmpty, "expected planted repeats to reach the new slice")
  }

  test("append == rebuild; appendVersion retry is idempotent; compact preserves") {
    import spark.implicits._
    val a = Seq((1L, s"$passage ${words("a", 4)}")).toDF("doc_id", "text")
    val b = Seq((2L, s"${words("b", 2)} $passage")).toDF("doc_id", "text")
    val probe = Seq((9L, s"${words("z", 3)} $passage ${words("y", 2)}"))
      .toDF("doc_id", "text")
    val grown = tmp(); val rebuilt = tmp()
    SubstrIndex.build(a, grown)
    SubstrIndex.appendVersion(b, grown, 1L)
    SubstrIndex.build(a.unionByName(b), rebuilt)
    val fromGrown = spans(SubstrIndex.dedupAgainst(grown, probe))
    assert(fromGrown === spans(SubstrIndex.dedupAgainst(rebuilt, probe)))
    assert(fromGrown === Seq((9L, 4L, 15L)))
    // retry of the same version overwrites its own dir — no double state
    SubstrIndex.appendVersion(b, grown, 1L)
    assert(spans(SubstrIndex.dedupAgainst(grown, probe)) === fromGrown)
    // compact folds to one committed batch dir with identical serving
    assert(SubstrIndex.compact(spark, grown) === 2)
    assert(spans(SubstrIndex.dedupAgainst(grown, probe)) === fromGrown)
    val dirs = graft.streaming.VersionedState.versions(spark, s"$grown/win", "batch=")
    assert(dirs.size === 1, s"expected one folded dir, got $dirs")
  }

  test("torn append batch is invisible; crashed compact recovers at entry") {
    import spark.implicits._
    val path = tmp()
    SubstrIndex.build(Seq((1L, s"$passage ${words("a", 4)}")).toDF("doc_id", "text"), path)
    val probe = Seq((9L, passage)).toDF("doc_id", "text")
    val before = spans(SubstrIndex.dedupAgainst(path, probe))
    assert(before === Seq((9L, 1L, 12L)))
    // torn batch: a committed-looking dir missing _SUCCESS must be swept
    val junk = Seq((50L, words("junkrow", 20))).toDF("doc_id", "text")
    SubstrIndex.appendVersion(junk, path, 7L)
    val fs = graft.streaming.VersionedState.fileSystem(spark, path)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/win/batch=7/_SUCCESS"), false)
    assert(spans(SubstrIndex.dedupAgainst(path, probe)) === before)
    assert(graft.streaming.VersionedState
      .versions(spark, s"$path/win", "batch=") === Seq(0L))
    // crashed compact window between the two renames: live dir gone,
    // old dir present, stale stage lying around — entry recovery restores
    fs.rename(new org.apache.hadoop.fs.Path(s"$path/win"),
      new org.apache.hadoop.fs.Path(s"$path/win_old"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/win_compact/batch=9"))
    assert(spans(SubstrIndex.dedupAgainst(path, probe)) === before)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/win_compact")))
  }

  test("custom tokenizer persists in meta: case/punctuation-insensitive spans") {
    import spark.implicits._
    val path = tmp()
    val pass = (1 to 12).map(i => s"tok$i").mkString(" ")
    SubstrIndex.build(
      Seq((1L, s"intro words $pass")).toDF("doc_id", "text"),
      path, w = 12, tokenize = "split(lower(text), '[^a-z0-9]+')")
    assert(SubstrIndex.params(spark, path) ===
      (12, "split(lower(text), '[^a-z0-9]+')"))
    // a SHOUTED, comma-riddled copy still matches under the tokenizer:
    // doc 10 tokens = [lead, in, tok1..tok12, ""] -> passage at 3..14
    val noisy = pass.toUpperCase.replace(" ", ", ")
    val out = spans(SubstrIndex.dedupAgainst(path,
      Seq((10L, s"Lead-in: $noisy!")).toDF("doc_id", "text")))
    assert(out === Seq((10L, 3L, 14L)))
    // the whitespace default would have seen none of it
    val plain = tmp()
    SubstrIndex.build(
      Seq((1L, s"intro words $pass")).toDF("doc_id", "text"), plain)
    assert(spans(SubstrIndex.dedupAgainst(plain,
      Seq((10L, s"Lead-in: $noisy!")).toDF("doc_id", "text"))).isEmpty)
  }

  test("tokenizer validation: reflective calls and subqueries rejected at build AND at load") {
    import spark.implicits._
    val docs = Seq((1L, passage)).toDF("doc_id", "text")
    for (bad <- Seq(
      "split(java_method('java.lang.System', 'getenv', 'PATH'), ' ')",
      "split(reflect('java.lang.System', 'getenv', 'PATH'), ' ')",
      "split(cast((select 1) as string), ' ')")) {
      val e = intercept[IllegalArgumentException] {
        SubstrIndex.build(docs, tmp(), tokenize = bad)
      }
      assert(e.getMessage.contains("tokenizer"), s"$bad -> ${e.getMessage}")
    }
    // a TAMPERED meta (the on-disk expression swapped for a reflective
    // call after build) must refuse to load — expr() on it would
    // otherwise execute the call on every append/serve
    val path = tmp()
    SubstrIndex.build(docs, path)
    val metaDir = java.nio.file.Paths.get(s"$path/meta")
    // wipe the written meta (incl. its .crc sidecars — a stale checksum
    // would fail the read before validation gets a look) and plant the
    // attacker's expression
    java.nio.file.Files.list(metaDir).forEach(p => java.nio.file.Files.delete(p))
    java.nio.file.Files.writeString(metaDir.resolve("tampered.json"),
      """{"w":12,"tokenize":"split(java_method('java.lang.System','getenv','PATH'), ' ')"}""")
    val e = intercept[IllegalArgumentException] {
      SubstrIndex.params(spark, path)
    }
    assert(e.getMessage.contains("tokenizer"), e.getMessage)
  }

  test("bloom prefilter: seen found, novel skips index, torn bloom degrades, append repairs") {
    import spark.implicits._
    val base = Seq((1L, s"$passage ${words("a", 4)}")).toDF("doc_id", "text")
    val probeSeen = Seq((9L, s"${words("z", 3)} $passage")).toDF("doc_id", "text")
    val fresh = (1 to 12).map(i => s"n$i").mkString(" ")
    // novel probe: no indexed window, ONE within-batch repeat
    def probeNovel(id: Long) =
      Seq((id, s"$fresh ${words("w", 3)} $fresh")).toDF("doc_id", "text")

    val withBloom = tmp(); val bloomless = tmp()
    SubstrIndex.build(base, withBloom)
    SubstrIndex.build(base, bloomless, bloomBits = 0)
    val fs = graft.streaming.VersionedState.fileSystem(spark, withBloom)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$withBloom/bloom")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$bloomless/bloom")))
    // useBloom = Some(true): the test index sits far below the
    // BloomMinIndexBytes auto-gate, so the bloom path must be forced
    def withB(path: String, probe: org.apache.spark.sql.DataFrame) =
      spans(SubstrIndex.dedupAgainst(path, probe, useBloom = Some(true)))
    // no false negatives: the indexed passage is marked under the bloom
    // exactly as under the exact path
    assert(withB(withBloom, probeSeen) === Seq((9L, 4L, 15L)))
    assert(spans(SubstrIndex.dedupAgainst(bloomless, probeSeen)) === Seq((9L, 4L, 15L)))
    // fully-novel batch: candidate set provably empty — only the
    // within-batch repeat marks (positions 16..27), index never joined
    assert(withB(withBloom, probeNovel(10L)) === Seq((10L, 16L, 27L)))
    // torn bloom state degrades to the exact path, never to a wrong answer
    fs.delete(new org.apache.hadoop.fs.Path(s"$withBloom/bloom"), true)
    assert(withB(withBloom, probeSeen) === Seq((9L, 4L, 15L)))
    // append REPAIRS the bloom (rebuild-from-win before the OR) and the
    // appended batch's keys probe as seen immediately after
    SubstrIndex.appendVersion(
      Seq((20L, s"$fresh ${words("v", 2)}")).toDF("doc_id", "text"), withBloom, 1L)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$withBloom/bloom")))
    assert(withB(withBloom, probeSeen) === Seq((9L, 4L, 15L)))
    assert(withB(withBloom, probeNovel(108L)) ===
      Seq((108L, 1L, 12L), (108L, 16L, 27L)))
    // the auto-gate itself: default call on this tiny index = exact path,
    // same answer (the gate is a cost decision, never a semantic one)
    assert(spans(SubstrIndex.dedupAgainst(withBloom, probeNovel(208L))) ===
      Seq((208L, 1L, 12L), (208L, 16L, 27L)))
  }

  test("bloom auto-sizing and the fill gauge") {
    import spark.implicits._
    val docs = Seq((1L, s"$passage ${words("a", 8)}")).toDF("doc_id", "text")
    // auto default: tiny corpus clamps to the 2^20 floor
    val auto = tmp()
    SubstrIndex.build(docs, auto)
    val fillAuto = SubstrIndex.bloomFillFraction(spark, auto)
    assert(fillAuto.isDefined && fillAuto.get > 0 && fillAuto.get < 0.01,
      s"auto-sized bloom should be nearly empty on a tiny corpus: $fillAuto")
    // a deliberately starved bitset saturates — the gauge reports it
    // (growBloom's stderr warning keys off the same fraction)
    val starved = tmp()
    SubstrIndex.build(
      (1L to 40L).map(i => (i, words(s"w$i", 30))).toDF("doc_id", "text"),
      starved, bloomBits = 64)
    val fillStarved = SubstrIndex.bloomFillFraction(spark, starved)
    assert(fillStarved.exists(_ > 0.5), s"starved bloom should saturate: $fillStarved")
    // saturation costs false positives only: the exact join still
    // resolves them — a novel probe yields no spans
    assert(spans(SubstrIndex.dedupAgainst(starved,
      Seq((99L, words("zz", 20))).toDF("doc_id", "text"),
      useBloom = Some(true))).isEmpty)
    // bloomless build reports no gauge
    val off = tmp()
    SubstrIndex.build(docs, off, bloomBits = 0)
    assert(SubstrIndex.bloomFillFraction(spark, off).isEmpty)
  }

  test("sweep releases dedupAgainst's pinned checkpoint blocks") {
    import spark.implicits._
    val path = tmp()
    SubstrIndex.build(Seq((1L, s"$passage ${words("a", 4)}")).toDF("doc_id", "text"), path)
    SubstrIndex.sweep(spark) // drain pins from earlier tests
    val out = SubstrIndex.dedupAgainst(path,
      Seq((9L, s"${words("z", 3)} $passage")).toDF("doc_id", "text"))
    assert(out.count() === 1)
    assert(SubstrIndex.sweep(spark) >= 1, "expected at least the windows checkpoint")
    assert(SubstrIndex.sweep(spark) === 0, "second sweep must find nothing")
  }

  test("per-path sweep releases only that index's blocks") {
    import spark.implicits._
    val (p1, p2) = (tmp(), tmp())
    SubstrIndex.build(Seq((1L, s"$passage ${words("a", 4)}")).toDF("doc_id", "text"), p1)
    SubstrIndex.build(Seq((1L, s"$passage ${words("b", 4)}")).toDF("doc_id", "text"), p2)
    SubstrIndex.sweep(spark) // drain pins from earlier tests
    val o1 = SubstrIndex.dedupAgainst(p1,
      Seq((9L, s"${words("z", 3)} $passage")).toDF("doc_id", "text"))
    val o2 = SubstrIndex.dedupAgainst(p2,
      Seq((9L, s"${words("y", 3)} $passage")).toDF("doc_id", "text"))
    assert(o1.count() === 1 && o2.count() === 1)
    val n1 = SubstrIndex.sweep(spark, p1)
    assert(n1 >= 1, "expected p1's windows checkpoint")
    // p2's frame must still be readable: its blocks were NOT released
    assert(o2.count() === 1, "sweep(p1) must not kill p2's in-flight blocks")
    assert(SubstrIndex.sweep(spark, p2) >= 1)
    assert(SubstrIndex.sweep(spark) === 0, "global sweep after both finds nothing")
  }

  test("format guard: a packed-long canon index is refused with a rebuild message") {
    import spark.implicits._
    val path = tmp()
    SubstrIndex.build(Seq((1L, s"$passage ${words("a", 4)}")).toDF("doc_id", "text"), path)
    // forge a LEGACY index: strip the format field from meta and rewrite
    // the committed batch with the r9 packed-long canon layout
    Seq((12L, SubstrIndex.DefaultTokenize)).toDF("w", "tokenize")
      .repartition(1).write.mode("overwrite").json(s"$path/meta")
    val legacy = spark.read.parquet(s"$path/win/batch=0")
      .select(col("k"),
        (col("canon.doc_id") * 1000000L + col("canon.pos")).as("canon"))
    legacy.write.mode("overwrite").parquet(s"$path/win_legacy")
    spark.read.parquet(s"$path/win_legacy").write
      .mode("overwrite").parquet(s"$path/win/batch=0")
    // evict the cached sniff for this path (the cache is JVM-level and
    // build() stamped it with the current format)
    val f = SubstrIndex.getClass.getDeclaredField("formatCache")
    f.setAccessible(true)
    f.get(SubstrIndex).asInstanceOf[java.util.concurrent.ConcurrentHashMap[String, Long]]
      .remove(path)
    val e = intercept[IllegalArgumentException] {
      SubstrIndex.params(spark, path)
    }
    assert(e.getMessage.contains("REBUILD"), e.getMessage)
    assert(e.getMessage.contains("format 1"), e.getMessage)
  }

  test("format guard: a no-win probe is not cached — a later legacy index is still refused") {
    import spark.implicits._
    val path = tmp()
    // meta exists (stripped of the format field, like a pre-stamp index)
    // but no batch has committed yet: the probe answers the current
    // format WITHOUT recording it (VERDICT r11 #4 — the old
    // computeIfAbsent cached this default permanently, so a legacy index
    // appearing later was waved through on the stale answer)
    Seq((12L, SubstrIndex.DefaultTokenize)).toDF("w", "tokenize")
      .repartition(1).write.mode("overwrite").json(s"$path/meta")
    assert(SubstrIndex.params(spark, path)._1 === 12)
    // a format-1 (packed-long canon) index is copied in AFTER that probe
    Seq((1L, 1000005L)).toDF("k", "canon")
      .write.mode("overwrite").parquet(s"$path/win/batch=0")
    val e = intercept[IllegalArgumentException](SubstrIndex.params(spark, path))
    assert(e.getMessage.contains("format 1"), e.getMessage)
    assert(e.getMessage.contains("REBUILD"), e.getMessage)
  }

  test("widened tokenizer whitelist admits array_sort/sentences/element_at") {
    // ADVICE r10: benign deterministic builtins outside the old narrow
    // list made pre-existing indexes permanently unreadable
    SubstrIndex.validateTokenizer(spark,
      "array_sort(filter(split(lower(text), ' '), x -> length(x) > 0))")
    SubstrIndex.validateTokenizer(spark,
      "transform(sequence(1, size(split(text, ' '))), i -> element_at(split(text, ' '), i))")
    // the security boundary is unchanged
    intercept[IllegalArgumentException] {
      SubstrIndex.validateTokenizer(spark, "split(reflect('java.lang.System', 'getenv'), ' ')")
    }
  }

  test("Scratch.withSweep releases the blocks a consume-inside block pinned") {
    import spark.implicits._
    val path = tmp()
    SubstrIndex.build(Seq((1L, s"$passage ${words("a", 4)}")).toDF("doc_id", "text"), path)
    SubstrIndex.sweep(spark)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val n = Scratch.withSweep(spark) {
      SubstrIndex.dedupAgainst(path,
        Seq((9L, s"${words("z", 3)} $passage")).toDF("doc_id", "text")).count()
    }
    assert(n === 1)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty, s"leaked blocks: ${after -- before}")
  }

  test("build refuses to wipe a directory that is not a substr index") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("substr-guard").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/precious.txt"), "do not delete")
    val e = intercept[IllegalArgumentException] {
      SubstrIndex.build(Seq((1L, passage)).toDF("doc_id", "text"), dir)
    }
    assert(e.getMessage.contains("refusing to wipe"), e.getMessage)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/precious.txt")))
  }
}
