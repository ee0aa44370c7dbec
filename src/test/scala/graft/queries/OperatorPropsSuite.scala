package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Algebraic and tolerance properties (SURVEY §5.2.3) on sf0.001. */
class OperatorPropsSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct within 10% of exact per supplier") {
    val exact = Relational.queries("q_agg_distinct")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = Relational.queries("q_agg_approx_distinct")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex < 0.10, s"suppkey $k: $ap vs $ex")
    }
  }

  test("approx_percentile lands inside the 1%-rank band of the exact quantile") {
    val exact = Tables(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(CAST(l_quantity AS DOUBLE), array(0.24D, 0.26D, 0.49D, 0.51D, 0.74D, 0.76D))").as("b"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val approx = Relational.queries("q_agg_approx_quantile")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(exact.keySet === approx.keySet)
    approx.foreach { case (flag, qs) =>
      val b = exact(flag)
      Seq((qs(0), b(0), b(1), "q25"), (qs(1), b(2), b(3), "q50"),
        (qs(2), b(4), b(5), "q75")).foreach { case (v, lo, hi, name) =>
        assert(v >= lo && v <= hi, s"$flag $name=$v outside exact band [$lo, $hi]")
      }
    }
  }

  test("resample grid is dense per user and LOCF leaves no unfilled hour") {
    val rows = TimeSeries.queries("q_ts_resample")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.isNullAt(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { g =>
      val hours = g.map(_._2).sorted
      // dense: consecutive grid hours are exactly 3600s apart
      val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      val ts = hours.map(h => java.time.LocalDateTime.parse(h, fmt)
        .toEpochSecond(java.time.ZoneOffset.UTC))
      ts.zip(ts.tail).foreach { case (a, b) => assert(b - a === 3600L, s"gap $a -> $b") }
      // the first grid hour is observed, so LOCF never leaves a null
      assert(g.forall(!_._3), "v_filled must never be null")
      assert(g.map(_._4).min === 0L, "each user has at least one observed hour")
    }
  }

  test("cosine similarities lie in [-1, 1] and top-1 >= top-5 per query") {
    val rows = LlmOps.queries("q_sim_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, c) => assert(c >= -1.0 && c <= 1.0) }
    rows.groupBy(_._1).values.foreach { g =>
      val byRank = g.sortBy(_._2).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"scores must be non-increasing in rank: ${byRank.toSeq}")
    }
  }

  test("exact dedup is idempotent: applying keep-min twice changes nothing") {
    val once = LlmOps.queries("q_dedup_exact")(spark, sf).collect()
    val keepIds = once.map(_.getLong(0)).toSet
    // after the first pass every surviving text is unique -> dup_cnt all 1
    val docs = Tables(spark, sf, "documents").filter(col("doc_id").isInCollection(keepIds))
    val again = docs.groupBy(sha2(col("text"), 256))
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("c")).collect()
    assert(again.length === keepIds.size)
    assert(again.forall(_.getLong(2) === 1L)) // col 0 = hash, 1 = doc_id, 2 = c
  }

  test("set-op algebra matches the Scala collections model") {
    import spark.implicits._
    val prop = Prop.forAll(
      Gen.listOfN(20, Gen.chooseNum(0L, 9L)), Gen.listOfN(20, Gen.chooseNum(0L, 9L))) {
      (xs: List[Long], ys: List[Long]) =>
        val a = xs.toDF("v")
        val b = ys.toDF("v")
        val inter = a.intersect(b).collect().map(_.getLong(0)).toSet
        val exc = a.except(b).collect().map(_.getLong(0)).toSet
        val uni = a.union(b).distinct().collect().map(_.getLong(0)).toSet
        inter == (xs.toSet & ys.toSet) &&
          exc == (xs.toSet -- ys.toSet) &&
          uni == (xs.toSet | ys.toSet)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: TopKPerKey heap == spill == window on random frames (with and without ties)") {
    import spark.implicits._
    val spillKey = graft.plans.TopKPerKey.MaxKeysKey
    val prop = Prop.forAll(
      Gen.listOfN(60, Gen.zip(Gen.chooseNum(0L, 7L), Gen.chooseNum(0L, 9L))),
      Gen.chooseNum(1, 5)) { (rows: List[(Long, Long)], k: Int) =>
      // values 0..9 over 60 rows force genuine ties inside most keys
      val df = rows.zipWithIndex.map { case ((key, v), i) => (key, i.toLong, v) }
        .toDF("k", "id", "v").repartition(5)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy(col("v").desc, col("id"))
      def collectSet(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // row_number semantics: total order, heap == window exactly
      val viaWindow = collectSet(df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).select("k", "id", "v"))
      val viaHeap = collectSet(graft.operators.GroupLimits.topKPerKey(
        df, Seq("k"), Seq(col("v").desc, col("id")), k))
      spark.conf.set(spillKey, "1")
      val viaSpill = try collectSet(graft.operators.GroupLimits.topKPerKey(
        df, Seq("k"), Seq(col("v").desc, col("id")), k))
      finally spark.conf.unset(spillKey)
      // rank semantics: ties of the k-th kept, key-determined set
      val wTies = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy(col("v").desc)
      val viaRank = collectSet(df.withColumn("rn", rank().over(wTies))
        .filter(col("rn") <= k).select("k", "id", "v"))
      val viaTiesHeap = collectSet(graft.operators.GroupLimits.topKPerKey(
        df, Seq("k"), Seq(col("v").desc), k, withTies = true))
      spark.conf.set(spillKey, "1")
      val viaTiesSpill = try collectSet(graft.operators.GroupLimits.topKPerKey(
        df, Seq("k"), Seq(col("v").desc), k, withTies = true))
      finally spark.conf.unset(spillKey)
      viaHeap == viaWindow && viaSpill == viaWindow &&
        viaTiesHeap == viaRank && viaTiesSpill == viaRank
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("dsir_xxh: exact 20% selection, finite scores, target slice scores higher on average") {
    val rows = LlmOps.queries("q_mix_dsir_xxh")(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = Tables(spark, sf, "documents").count()
    assert(rows.map(_.getLong(2)).sum === (n + 4) / 5,
      "selected count must be exactly ceil(20%) of the corpus")
    assert(rows.forall(r => !r.getDouble(1).isNaN && !r.getDouble(1).isInfinite))
    // the property the op exists for: docs FROM the target slice look
    // more target-like than the rest under the hashed-bigram LM
    val en = Tables(spark, sf, "documents").select("doc_id", "lang").collect()
      .filter(_.getString(1) == "en").map(_.getLong(0)).toSet
    val (tgt, rest) = rows.partition(r => en.contains(r.getLong(0)))
    assert(tgt.nonEmpty && rest.nonEmpty)
    val tgtMean = tgt.map(_.getDouble(1)).sum / tgt.length
    val restMean = rest.map(_.getDouble(1)).sum / rest.length
    assert(tgtMean > restMean,
      s"target-slice mean $tgtMean must exceed non-target mean $restMean")
    // and the hashed twin agrees with the gated unigram form's DIRECTION:
    // both rank the en slice above the rest (the selections need not be
    // identical — different features — but the signal must not invert)
    val uni = LlmOps.queries("q_mix_dsir")(spark, sf).collect()
    val (utgt, urest) = uni.partition(r => en.contains(r.getLong(0)))
    assert(utgt.map(_.getDouble(1)).sum / utgt.length >
      urest.map(_.getDouble(1)).sum / urest.length)
  }

  test("property: as-of pair == merge == range-split, and nearest pair == two-pass, on random frames") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val prop = Prop.forAll(
      Gen.listOfN(30, Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 50L))),
      Gen.listOfN(30, Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 50L))),
      Gen.chooseNum(1L, 60L)) { (ls, rs, width) =>
      // few keys + a tight time range force shared keys, equal-ts ties,
      // rows before/after every right row, and slot-boundary hits at the
      // random width (1 covers one-row slots; 60 covers the whole span)
      val l = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "lid").repartition(5)
      val r = rs.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "rid").repartition(3)
      val rr = r.select(col("k"), col("t").as("rt"), col("rid"))
      // pair-form backward: latest rt <= t, equal-ts tie -> max rid
      val wB = Window.partitionBy("lid").orderBy(col("rt").desc, col("rid").desc)
      val expB = l.join(rr, Seq("k")).filter(col("rt") <= col("t"))
        .withColumn("rn", row_number().over(wB)).filter(col("rn") === 1)
        .collect().map(x => x.getAs[Long]("lid") -> x.getAs[Long]("rid")).toMap
      def backMap(df: org.apache.spark.sql.DataFrame) =
        df.filter(col("r_rid").isNotNull)
          .collect().map(x => x.getAs[Long]("lid") -> x.getAs[Long]("r_rid")).toMap
      val gotMerge = backMap(graft.operators.AsOfJoin.asofBackward(
        l, r, "k", "t", "t", "rid"))
      val gotSplit = backMap(graft.operators.AsOfJoin.asofBackwardSplit(
        l, r, "k", "t", "t", "rid", width))
      // pair-form nearest: min |delta|, tie backward, then min rid
      val wN = Window.partitionBy("lid").orderBy(abs(col("rt") - col("t")),
        (col("rt") > col("t")).cast("int"), col("rid"))
      val expN = l.join(rr, Seq("k"))
        .withColumn("rn", row_number().over(wN)).filter(col("rn") === 1)
        .collect().map(x => x.getAs[Long]("lid") -> x.getAs[Long]("rid")).toMap
      val gotN = backMap(graft.operators.AsOfJoin.asofNearest(
        l, r, "k", "lid", "t", "t", "rid"))
      expB == gotMerge && expB == gotSplit && expN == gotN
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("sessionization splits strictly above the 30-minute gap") {
    // 29-minute gap stays one session; exactly 30 stays; 30:00.000001 splits
    val out = TimeSeries.queries("q_ts_sessionize_batch")(spark, sf).collect()
    assert(out.nonEmpty)
    // structural invariant on real data: session ids are 1..n per user, dense
    out.groupBy(_.getLong(0)).values.foreach { g =>
      val ids = g.map(_.getLong(1)).sorted
      assert(ids.head === 1L && ids === (1L to ids.length).toArray.toSeq)
    }
  }

  test("chunking covers every token exactly and respects window/stride") {
    val rows = LlmOps.queries("q_text_chunk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    rows.groupBy(_._1).foreach { case (docId, chunks) =>
      val t = docs(docId)
      val n = t.length
      val expected = math.max(1, math.ceil((n - 8) / 24.0).toInt)
      assert(chunks.length === expected, s"doc $docId: $n tokens")
      chunks.foreach { case (_, cid, chunk, nTok) =>
        val words = chunk.split(" ").toSeq
        assert(nTok === words.length)
        assert(words.length <= 32)
        // chunk cid is exactly tokens [cid*24, cid*24+32) of the doc
        assert(words === t.slice(cid * 24, cid * 24 + 32),
          s"doc $docId chunk $cid misaligned")
      }
      // stride 24 < window 32: every token index is covered by some chunk
      val covered = chunks.map(_._2).flatMap(cid => cid * 24 until (cid * 24 + 32))
      assert((0 until n).forall(covered.contains), s"doc $docId: coverage gap")
    }
  }

  test("banded simhash equals the all-pairs theta join (pigeonhole lossless)") {
    // independent witness: rebuild the 16-bit fingerprints and do the
    // O(n^2) join the banded path replaced — result sets must be identical
    val docs = Tables(spark, sf, "documents")
    val toks = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("w"))
    val vocab = toks.select("w").distinct().withColumn("tokid",
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy("w")))
    val dt = toks.join(vocab, "w").select("doc_id", "tokid")
    val bitSums = (0 until 16).map(k => sum(
      expr(s"CASE WHEN pmod(shiftright((1103 * tokid + 12289) % 65536, $k), 2) = 1 THEN 1 ELSE -1 END"))
      .as(s"s$k"))
    val sh = dt.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 16).map(k =>
          when(col(s"s$k") > 0, lit(1L) * (1L << k)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
    val allPairs = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        expr("bit_count(a.simhash ^ b.simhash)").cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val banded = LlmOps.queries("q_dedup_simhash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(allPairs.nonEmpty)
    assert(banded === allPairs)
  }

  test("embedBlockPairs is independent of the block count (B=1 vs B=3)") {
    def run(b: Int): Seq[(Long, Long, Double)] =
      LlmOps.embedBlockPairs(spark, sf, numBlocks = b)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val b1 = run(1)
    val b3 = run(3)
    assert(b1.nonEmpty)
    assert(b1 === b3)
    // and both equal the declarative brute-force witness
    val brute = LlmOps.queries("q_dedup_embed")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(b1 === brute)
  }

  test("dedup clustering: pairs never split, reps are component minima") {
    val pairs = LlmOps.queries("q_dedup_near")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cl = LlmOps.queries("q_dedup_cluster")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(cl(a)._1 === cl(b)._1, s"near-dup pair ($a,$b) split across clusters")
    }
    cl.foreach { case (doc, (rep, _)) =>
      assert(rep <= doc, "representative must be the component minimum")
      assert(cl(rep)._1 === rep, "a representative must be its own representative")
    }
    val bySize = cl.values.groupBy(_._1).map { case (rep, g) => rep -> g.size.toLong }
    cl.foreach { case (_, (rep, size)) => assert(size === bySize(rep)) }
    // and clusters actually merged something (planted dups exist)
    assert(cl.count { case (doc, (rep, _)) => rep != doc } > 0)
  }

  test("winnowing guarantee: a shared 8-token run yields a shared fingerprint") {
    import spark.implicits._
    // doc 1 and 2 share exactly one 8-token run (>= k+w-1) embedded in
    // otherwise-disjoint text; doc 3 shares nothing with either
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"one two three four five $run aa bb cc dd ee"),
      (2L, s"six seven eight nine ten $run ff gg hh ii jj"),
      (3L, "kk ll mm nn oo pp qq rr ss tt uu vv ww xx yy zz")).toDF("doc_id", "text")
    val fps = LlmOps.winnowFingerprints(docs).collect()
      .groupBy(_.getLong(0)).map { case (d, rs) => d -> rs.map(_.getLong(1)).toSet }
    assert((fps(1L) & fps(2L)).nonEmpty, "shared run must produce a shared fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty,
      "disjoint docs must not collide")
  }

  test("winnowing fingerprints recover the exact near-dup pairs") {
    // winnowing guarantees any shared token run of >= w+k-1 = 8 tokens
    // yields a shared fingerprint; J >= 0.8 pairs of ~50-token docs share
    // long runs, so the exact near-dup set should be (almost) covered
    val near = LlmOps.queries("q_dedup_near")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val winnow = LlmOps.queries("q_dedup_winnow")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(near.nonEmpty && winnow.nonEmpty)
    winnow.foreach { case (d1, d2, n) =>
      assert(d1 < d2); assert(n >= 3L)
    }
    val wset = winnow.map(w => (w._1, w._2)).toSet
    val covered = near.count(wset.contains)
    assert(covered >= math.ceil(near.size * 0.9).toInt,
      s"winnow covered $covered/${near.size} exact pairs")
  }

  test("xxh winnowing guarantee: a shared 8-token run yields a shared fingerprint") {
    import spark.implicits._
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"one two three four five $run aa bb cc dd ee"),
      (2L, s"six seven eight nine ten $run ff gg hh ii jj"),
      (3L, "kk ll mm nn oo pp qq rr ss tt uu vv ww xx yy zz")).toDF("doc_id", "text")
    val fps = LlmOps.winnowFingerprintsXxh(docs).collect()
      .groupBy(_.getLong(0)).map { case (d, rs) => d -> rs.map(_.getLong(1)).toSet }
    assert((fps(1L) & fps(2L)).nonEmpty, "shared run must produce a shared fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty,
      "disjoint docs must not collide")
  }

  test("xxh winnowing recovers the exact near-dup pairs like the vocab form") {
    val near = LlmOps.queries("q_dedup_near")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val winnow = LlmOps.queries("q_dedup_winnow_xxh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(near.nonEmpty && winnow.nonEmpty)
    winnow.foreach { case (d1, d2, n) => assert(d1 < d2); assert(n >= 3L) }
    val wset = winnow.map(w => (w._1, w._2)).toSet
    val covered = near.count(wset.contains)
    assert(covered >= math.ceil(near.size * 0.9).toInt,
      s"xxh winnow covered $covered/${near.size} exact pairs")
  }

  test("xxh winnowing is deterministic across partitionings") {
    val a = LlmOps.queries("q_dedup_winnow_xxh")(spark, sf)
      .repartition(1).collect().map(_.toSeq).toSet
    val b = LlmOps.queries("q_dedup_winnow_xxh")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(a === b && a.nonEmpty)
  }

  test("sketch minhash is sound (subset of exact pairs) with near-total recall") {
    val exact = LlmOps.queries("q_dedup_near")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sketch = LlmOps.queries("q_dedup_minhash_sketch")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // soundness is structural (candidates are verified by exact Jaccard);
    // recall at 16 bands x 4 rows is 1-(1-J^4)^16 >= 0.9998 at J=0.8
    assert(sketch.subsetOf(exact), s"unsound pairs: ${sketch -- exact}")
    assert(sketch.size >= math.ceil(exact.size * 0.9).toInt,
      s"recall ${sketch.size}/${exact.size} below floor")
  }

  test("stop-fingerprint cap bounds boilerplate candidates with unchanged pairs") {
    import spark.implicits._
    // 30 docs share a 9-token boilerplate prefix (a licence header): every
    // pair shares its 1-2 boilerplate window minima — below the minShared=3
    // threshold, so NO final pair, but without a cap the self-join still
    // pays ~C(30,2) candidate groups for them. Docs 1000/1001 are true
    // dups (40-token shared run -> >= 3 shared fingerprints). Vocabularies
    // are disjoint, so boilerplate docs cannot collide with the dup pair.
    val bp = (0 until 9).map(i => s"bp$i").mkString(" ")
    val run = (0 until 40).map(i => s"t$i").mkString(" ")
    val docs = ((0 until 30).map { i =>
      (i.toLong, bp + " " + (0 until 30).map(j => s"d${i}u$j").mkString(" "))
    } ++ Seq(
      (1000L, run + " pa pb pc pd pe"),
      (1001L, run + " qa qb qc qd qe"))).toDF("doc_id", "text")
    val fps = LlmOps.winnowFingerprintsXxh(docs).localCheckpoint()

    // the cap leaves the true-dup pair untouched...
    val uncapped = LlmOps.winnowPairs(fps, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = LlmOps.winnowPairs(fps, minShared = 3, maxDocFreq = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped === Set((1000L, 1001L)), s"uncapped pairs: $uncapped")
    assert(capped === uncapped, "cap above the true-dup freq must not change pairs")

    // ...while collapsing the boilerplate candidate explosion: at
    // minShared=1 the uncapped join carries every boilerplate pair
    val cand = LlmOps.winnowPairs(fps, minShared = 1).count()
    val candCapped = LlmOps.winnowPairs(fps, minShared = 1, maxDocFreq = 10).count()
    assert(cand >= 400, s"boilerplate must explode the uncapped join, got $cand")
    assert(candCapped <= 10, s"capped candidates must stay bounded, got $candCapped")
  }

  test("hot band buckets are dropped before the sketch self-join") {
    import spark.implicits._
    // 50 docs with IDENTICAL sketches (one giant boilerplate bucket in
    // every band) plus two genuine near-dup pairs with their own sketches:
    // uncapped candidates pay C(50,2) for the hot bucket, capped keep
    // exactly the two real pairs
    val hot = (1L to 64L).toArray
    val a = (101L to 164L).toArray
    val b = (201L to 264L).toArray
    val mh = ((0 until 50).map(i => (i.toLong, hot)) ++
      Seq((100L, a), (101L, a), (200L, b), (201L, b)))
      .toDF("doc_id", "mh")
    val uncapped = LlmOps.sketchBandCandidates(mh, numBands = 16, rows = 4)
    val capped = LlmOps.sketchBandCandidates(mh, numBands = 16, rows = 4,
      maxBucket = 10)
    assert(uncapped.count() === 50L * 49 / 2 + 2)
    assert(capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((100L, 101L), (200L, 201L)))
  }

  test("hashed-TF vectors are unit-norm and identical for exact-duplicate docs") {
    val emb = LlmOps.queries("q_text_hash_embed")(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (d, rs) =>
        d -> rs.map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq }
    assert(emb.nonEmpty)
    // L2 norm 1 (within 6dp rounding of up-to-16 components)
    emb.values.foreach { v =>
      assert(math.abs(v.map(x => x._2 * x._2).sum - 1.0) < 1e-3, v)
    }
    // the text->vector bridge must respect similarity: shingle-Jaccard
    // near-dup pairs (>= 0.8) map to high-cosine hashed vectors
    val near = LlmOps.queries("q_dedup_near")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(near.nonEmpty, "corpus must contain planted near-dups")
    def cos(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Double = {
      val bm = b.toMap
      a.map { case (dim, v) => v * bm.getOrElse(dim, 0.0) }.sum // unit vectors
    }
    near.foreach { case (d1, d2) =>
      val c = cos(emb(d1), emb(d2))
      assert(c >= 0.5, s"near-dup pair ($d1, $d2) has hashed cosine $c")
    }
  }

  test("graph analytics agree with the pair graph: degree handshake and triangle edges") {
    val pairs = LlmOps.queries("q_dedup_near")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val deg = LlmOps.queries("q_graph_degree")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // handshake lemma: degrees sum to twice the edge count, isolated docs 0
    assert(deg.values.sum === 2L * pairs.size)
    assert(deg.values.count(_ == 0L) === deg.size - pairs.flatMap(p => Seq(p._1, p._2)).size)
    // every triangle is three genuine pair-graph edges, ordered a < b < c
    val tris = LlmOps.queries("q_graph_triangles")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    tris.foreach { case (a, b, c) =>
      assert(a < b && b < c)
      assert(pairs((a, b)) && pairs((b, c)) && pairs((a, c)), s"($a,$b,$c)")
    }
  }

  test("vocab-free hashed-TF twin keeps the unit-norm and near-dup-cosine properties") {
    val emb = LlmOps.queries("q_text_hash_embed_xxh")(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (d, rs) =>
        d -> rs.map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq }
    assert(emb.nonEmpty)
    emb.values.foreach { v =>
      assert(math.abs(v.map(x => x._2 * x._2).sum - 1.0) < 1e-3, v)
    }
    val near = LlmOps.queries("q_dedup_near")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def cos(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Double = {
      val bm = b.toMap
      a.map { case (dim, v) => v * bm.getOrElse(dim, 0.0) }.sum
    }
    near.foreach { case (d1, d2) =>
      assert(cos(emb(d1), emb(d2)) >= 0.5, s"near-dup ($d1, $d2) low cosine")
    }
  }

  test("funnel counts are monotone and bounded by the user universe") {
    val r = TimeSeries.queries("q_ts_funnel")(spark, sf).collect().head
    val (n, v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n >= v && v >= c && c >= p,
      s"funnel must narrow: users=$n view=$v click=$c purchase=$p")
    assert(v > 0, "corpus has views")
  }

  test("retention offset-0 actives equal cohort sizes and never grow") {
    val rows = TimeSeries.queries("q_ts_retention")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_._1)
    // offset 0 = the cohort's own first-activity day: every member active
    byCohort.foreach { case (cd, g) =>
      val at0 = g.find(_._2 == 0L)
      assert(at0.isDefined, s"cohort $cd missing offset 0")
      g.foreach { case (_, _, active) =>
        assert(active <= at0.get._3, s"cohort $cd: $active exceeds size ${at0.get._3}")
      }
    }
  }

  test("sequence packing: offsets chain exactly through each shard") {
    val budget = 256L
    val rows = LlmOps.queries("q_text_pack")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).values.foreach { shard =>
      val sorted = shard.sortBy(_._1)
      sorted.head match { case (_, _, bin, off, _) =>
        assert(bin == 0L && off == 0L, "each shard starts at bin 0, offset 0") }
      sorted.toList.sliding(2).foreach {
        case List((_, _, b1, o1, n1), (_, _, b2, o2, _)) =>
          val cum = b1 * budget + o1 + n1
          assert(b2 === cum / budget && o2 === cum % budget,
            s"pack chain broke: ($b1,$o1,+$n1) -> ($b2,$o2)")
        case _ =>
      }
    }
  }

  test("merge upsert: updates repriced, inserts appended, the rest untouched") {
    val snap = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
    val maxKey = snap.keys.max
    val got = Relational.queries("q_merge_upsert")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(got.map(_._1).distinct.length === got.length, "keys must be unique")
    got.foreach { case (k, price, status) =>
      if (k > maxKey) {
        val src = k - maxKey - 1
        assert(status === "I" && src % 1000 == 0, s"insert $k from $src")
        assert(math.abs(price - snap(src)._1) < 1e-9)
      } else if (k % 10 == 0) {
        assert(status === "U", s"key $k should be updated")
        assert(math.abs(price - (snap(k)._1 + 100.0)) < 1e-6)
      } else {
        assert(status === snap(k)._2 && math.abs(price - snap(k)._1) < 1e-9)
      }
    }
    assert(got.count(_._3 == "I") === snap.keys.count(_ % 1000 == 0))
  }

  test("vector normalization produces unit-consistent components") {
    val normed = LlmOps.queries("q_vec_norm")(spark, sf).collect()
    assert(normed.nonEmpty)
    normed.foreach { r =>
      (1 to 3).foreach(i => assert(math.abs(r.getDouble(i)) <= 1.0 + 1e-9))
    }
  }

  test("q_vec_project: JL projection preserves relative distances and is partition-invariant") {
    val proj = LlmOps.queries("q_vec_project")(spark, sf).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getDouble).toArray).toMap
    val orig = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), expr("CAST(embedding AS array<double>)"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(proj.size === orig.size)
    // distance preservation in EXPECTATION at k=8: across many pairs the
    // mean ratio of projected to original squared distance must sit near
    // E[ratio] = k = 8 (each of the 8 components has variance = d^2), and
    // the ORDERING of far-vs-near pairs must mostly survive — the property
    // JL gives and coarse ANN needs. Deterministic pair sample by id.
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toSeq.sorted.take(60)
    val pairs = for (i <- ids.indices; j <- i + 1 until ids.length)
      yield (ids(i), ids(j))
    val ratios = pairs.map { case (a, b) =>
      d2(proj(a).take(4), proj(b).take(4)) / d2(orig(a), orig(b)) }
    // only 4 of the 8 projected dims are exposed -> E[ratio] = 4
    val mean = ratios.sum / ratios.size
    assert(mean > 2.0 && mean < 6.0, s"mean sq-distance ratio $mean, expected ~4")
    val determinism = LlmOps.queries("q_vec_project")(spark, sf).repartition(7)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ids.forall(id => determinism(id) === proj(id)(0)),
      "projection must not depend on partitioning")
  }

  test("q_vec_centroid: tightness is a valid cosine and members average to the centroid") {
    val rows = LlmOps.queries("q_vec_centroid")(spark, sf).collect()
    assert(rows.nonEmpty)
    val orig = Tables(spark, sf, "embeddings")
      .select(col("label"), expr("CAST(embedding AS array<double>)"))
      .collect().map(r => r.getAs[Number](0).longValue -> r.getSeq[Double](1).toArray)
    rows.foreach { r =>
      val label = r.getAs[Number](0).longValue
      val members = orig.filter(_._1 == label).map(_._2)
      assert(r.getLong(1) === members.length, s"n for label $label")
      // c0..c2 are the per-dim means
      (0 to 2).foreach { i =>
        val mean = members.map(_(i)).sum / members.length
        assert(math.abs(r.getDouble(2 + i) - mean) < 1e-3, s"c$i of label $label")
      }
      val t = r.getDouble(5)
      assert(t >= -1.0 - 1e-9 && t <= 1.0 + 1e-9, s"tightness $t out of range")
    }
  }

  test("q_mix_temperature: small sources are upweighted, big sources capped near target share") {
    val kept = LlmOps.queries("q_mix_temperature")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val all = Tables(spark, sf, "documents").select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nBySrc = all.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val keptBySrc = kept.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    assert(kept.nonEmpty && kept.length < all.length)
    // keep-RATE must be monotonically non-increasing in source size:
    // temperature alpha=0.5 upweights the tail — that's the whole point
    val rates = nBySrc.toSeq.sortBy(_._2).map { case (s, n) =>
      (s, n, keptBySrc.getOrElse(s, 0.0) / n) }
    rates.sliding(2).foreach { case Seq((s1, n1, r1), (s2, n2, r2)) =>
      if (n2 > n1 * 1.5) // same-size noise doesn't order rates
        assert(r2 <= r1 + 0.15, s"rate must fall with size: $s1($n1)=$r1 vs $s2($n2)=$r2")
      case _ => ()
    }
    // deterministic: a rerun keeps the exact same set
    val again = LlmOps.queries("q_mix_temperature")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(again.toSeq === kept.toSeq)
  }

  test("q_agg_mode: most frequent quantity per flag, ties to the LOWEST value") {
    val raw = Tables(spark, sf, "lineitem").select("l_returnflag", "l_quantity")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val expect = raw.groupBy(_._1).map { case (flag, rows) =>
      val freq = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val top = freq.values.max
      flag -> ((freq.filter(_._2 == top).keys.min, top))
    }
    val got = Relational.queries("q_agg_mode")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got === expect)
  }

  test("q_join_interval_overlap: window counts match a driver interval sweep") {
    val orders = Tables(spark, sf, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    // per-customer [first, first+30] intervals
    val cust = orders.groupBy(_._1).map { case (k, rs) =>
      val c0 = rs.map(_._2).min(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
      (k, c0, c0.plusDays(30))
    }.toSeq
    // 10-day promo windows, one per distinct order month
    val promos = orders.map(_._2.withDayOfMonth(1)).distinct.map(p => (p, p.plusDays(9)))
    val expect = promos.flatMap { case (p0, p1) =>
      val hit = cust.filter { case (_, c0, c1) => !c0.isAfter(p1) && !p0.isAfter(c1) }
      // inner-join semantics: promo windows nobody's interval overlaps
      // don't appear in the result
      if (hit.isEmpty) None
      else Some((p0.toString, p1.toString) -> ((hit.size.toLong, hit.map(_._1).min)))
    }.toMap
    val got = Relational.queries("q_join_interval_overlap")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === expect)
  }

  test("q_ts_attribution: channels match a driver replay of each user's stream") {
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val touches = Set("click", "view", "signup")
    val credited = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      var lastTouch: String = null
      rows.sortBy(r => (r._3, r._4)).flatMap { case (u, et, _, _) =>
        val out = if (et == "purchase")
          Some((if (lastTouch == null) "direct" else lastTouch, u)) else None
        if (touches(et)) lastTouch = et
        out
      }
    }
    val expect = credited.groupBy(_._1).view.mapValues(rs =>
      (rs.size.toLong, rs.map(_._2).distinct.size.toLong)).toMap
    val got = TimeSeries.queries("q_ts_attribution")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expect)
    // every purchase is credited exactly once
    assert(got.values.map(_._1).sum === ev.count(_._2 == "purchase"))
  }

  test("q_ts_gap_stats: telescoping identity and bounds per user") {
    val spans = Tables(spark, sf, "events")
      .groupBy("user_id")
      .agg((max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("span_us"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val got = TimeSeries.queries("q_ts_gap_stats")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (u, n, avg, mx, mn) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val (span, nEv) = spans(u)
      assert(n === nEv - 1, s"user $u: gap count must be events-1")
      // gaps telescope: avg * n == total span (to rounding)
      assert(math.abs(avg * n - span / 1e6) < n * 1e-4 + 1e-6, s"user $u")
      assert(mn >= 0 && mn <= avg + 1e-9 && avg <= mx + 1e-9, s"user $u")
    }
  }

  test("q_text_entropy: bounded by ln(n_types), zero iff single-type") {
    val got = LlmOps.queries("q_text_entropy")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (types, h) = (r.getLong(2), r.getDouble(3))
      // the 4-dp output rounding can sit up to half a step above ln(types)
      // (uniform docs hit the bound exactly, e.g. ln 16 -> 2.7726)
      assert(h >= -1e-9 && h <= math.log(types.toDouble) + 5.001e-5,
        s"doc ${r.getLong(0)}: H=$h outside [0, ln($types)]")
      if (types == 1) assert(h === 0.0)
    }
  }

  test("q_text_ttr: ratios recompute exactly from raw token counts") {
    val expect = Tables(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .collect().map { r =>
        val ws = r.getSeq[String](1)
        val freq = ws.groupBy(identity).view.mapValues(_.size).toMap
        r.getLong(0) -> ((ws.size.toLong, freq.size.toLong,
          freq.count(_._2 == 1).toLong))
      }.toMap
    val got = LlmOps.queries("q_text_ttr")(spark, sf).collect()
    assert(got.length === expect.size)
    got.foreach { r =>
      val (tok, ty, hap) = expect(r.getLong(0))
      assert(r.getLong(1) === tok && r.getLong(2) === ty)
      assert(r.getDouble(3) ===
        BigDecimal(ty.toDouble / tok).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getDouble(4) ===
        BigDecimal(hap.toDouble / ty).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("q_agg_skewkurt: moments recompute exactly from integer power sums") {
    val raw = Tables(spark, sf, "lineitem").select("l_returnflag", "l_quantity")
      .collect().map(r => (r.getString(0), r.getDouble(1).toLong))
    val expect = raw.groupBy(_._1).map { case (flag, rows) =>
      val xs = rows.map(_._2)
      val n = xs.size.toDouble
      val (s1, s2, s3, s4) = (xs.sum.toDouble, xs.map(x => x * x).sum.toDouble,
        xs.map(x => x * x * x).sum.toDouble, xs.map(x => x * x * x * x).sum.toDouble)
      val m1 = s1 / n
      val m2 = s2 / n - m1 * m1
      val m3 = s3 / n - 3.0 * m1 * (s2 / n) + 2.0 * m1 * m1 * m1
      val m4 = s4 / n - 4.0 * m1 * (s3 / n) + 6.0 * m1 * m1 * (s2 / n) - 3.0 * m1 * m1 * m1 * m1
      def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      flag -> ((xs.size.toLong, r4(m1), r4(m3 / math.sqrt(m2 * m2 * m2)), r4(m4 / (m2 * m2) - 3.0)))
    }
    val got = Relational.queries("q_agg_skewkurt")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got === expect)
  }

  test("q_ts_rate: shares sum to 1 per hour and counts cover every event") {
    val got = TimeSeries.queries("q_ts_rate")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    val total = Tables(spark, sf, "events").count()
    assert(got.map(_._2).sum === total)
    got.groupBy(_._1).foreach { case (h, rows) =>
      assert(math.abs(rows.map(_._3).sum - 1.0) < rows.size * 5e-5 + 1e-9, s"hour $h")
    }
  }

  test("q_ts_heatmap: 7x24 grid bounds and full coverage") {
    val got = TimeSeries.queries("q_ts_heatmap")(spark, sf).collect()
    assert(got.map(_.getLong(2)).sum === Tables(spark, sf, "events").count())
    got.foreach { r =>
      assert(r.getLong(0) >= 1 && r.getLong(0) <= 7)
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 23)
    }
  }

  test("q_text_keywords: 3 ranked terms per source, scores non-increasing") {
    val got = LlmOps.queries("q_text_keywords")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val bySrc = got.groupBy(_._1)
    val nSources = Tables(spark, sf, "documents")
      .select("source").distinct().count()
    assert(bySrc.size === nSources)
    bySrc.foreach { case (src, rows) =>
      assert(rows.map(_._2).sorted.toSeq === Seq(1L, 2L, 3L), s"source $src")
      val byRank = rows.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b }, s"source $src")
    }
  }

  test("q_dedup_containment: dominates Jaccard on the shared candidate pairs") {
    val near = LlmOps.queries("q_dedup_near")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val cont = LlmOps.queries("q_dedup_containment")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // containment >= jaccard always, so every j >= 0.9 pair must survive
    // the 0.9 containment threshold
    near.filter(_._2 >= 0.9).foreach { case (p, j) =>
      assert(cont.contains(p), s"pair $p with jaccard $j missing")
      assert(cont(p) >= j - 1e-4, s"pair $p")
    }
    cont.foreach { case (p, c) =>
      near.get(p).foreach(j => assert(c >= j - 1e-4, s"pair $p"))
    }
  }

  test("q_dedup_canonical: keeps the max-quality doc of every q_dedup_cluster cluster") {
    val clusters = LlmOps.queries("q_dedup_cluster")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)) // doc_id -> cluster_rep
    val quality = LlmOps.queries("q_text_quality")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap // doc_id -> quality
    val kept = LlmOps.queries("q_dedup_canonical")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // same cluster partition as q_dedup_cluster
    val byRep = clusters.groupBy(_._2).view.mapValues(_.map(_._1).toSeq).toMap
    assert(kept.map(_._1).toSet === byRep.keySet)
    kept.foreach { case (rep, size, keptDoc, keptQ) =>
      val members = byRep(rep)
      assert(size === members.size.toLong, s"cluster $rep size")
      val maxQ = members.map(quality).max
      assert(keptQ === maxQ, s"cluster $rep kept $keptDoc q=$keptQ, max=$maxQ")
      // deterministic tiebreak: min doc_id among max-quality members
      assert(keptDoc === members.filter(m => quality(m) == maxQ).min,
        s"cluster $rep tiebreak")
    }
  }

  test("q_dedup_norm: refines q_dedup_exact — groups only ever merge") {
    val exact = LlmOps.queries("q_dedup_exact")(spark, sf).collect()
    val norm = LlmOps.queries("q_dedup_norm")(spark, sf).collect()
    val exactDocs = exact.map(_.getLong(0)).toSet
    val normDocs = norm.map(_.getLong(0)).toSet
    // a normalized group's representative is a representative of some
    // exact group (min over a union of exact groups), and there are no
    // more normalized groups than exact ones
    assert(normDocs.subsetOf(exactDocs))
    assert(norm.length <= exact.length)
    assert(norm.map(_.getLong(1)).sum === exact.map(_.getLong(1)).sum,
      "every document lands in exactly one normalized group")
  }

  test("q_dedup_semantic: SemDeDup invariants — one keeper per group, lowest centroid-cos wins, pairs are cluster-scoped") {
    val rows = LlmOps.queries("q_dedup_semantic")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    // exactly one keeper per dup group, and it is the member with the
    // LOWEST cosine to its centroid (ties -> lowest vec_id): the paper's
    // keep-the-edge-example rule
    rows.groupBy(_._4).foreach { case (g, members) =>
      val keepers = members.filter(_._5)
      assert(keepers.length === 1, s"group $g has ${keepers.length} keepers")
      val want = members.minBy(m => (m._3, m._1))
      assert(keepers.head._1 === want._1,
        s"group $g kept ${keepers.head._1}, want ${want._1} (lowest cent_cos)")
      // a dup group never spans clusters: pairs were cluster-scoped and
      // components cannot bridge what the pair join never connected
      assert(members.map(_._2).distinct.length === 1, s"group $g spans clusters")
    }
    // every vector appears exactly once
    assert(rows.map(_._1).distinct.length === rows.length)
  }

  test("q_dedup_semantic_trained: trained-centroid twin agrees with the fixed-quantizer gate on what is a duplicate") {
    val fixed = LlmOps.queries("q_dedup_semantic")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    val trained = LlmOps.queries("q_dedup_semantic_trained")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
    assert(trained.map(_._1).toSet === fixed.keySet, "same coverage")
    trained.groupBy(_._2).foreach { case (g, members) =>
      assert(members.count(_._3) === 1, s"trained group $g keeper count")
    }
    // NOTE deliberately NOT pinned: drop-set agreement with the fixed
    // quantizer. This corpus' within-cluster pairs sit AT the 0.4-0.5
    // cosine band, so which pairs are visible is a function of cluster
    // boundaries — SemDeDup's documented recall trade-off (pairs split
    // across cells are invisible BY DESIGN). Both paths must however
    // actually exercise the grouping machinery:
    assert(trained.exists(!_._3), "trained twin found zero duplicates")
    assert(fixed.values.exists(!_), "fixed gate found zero duplicates")
  }
}
