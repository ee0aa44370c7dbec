package graft.queries

import graft.SparkSpec

/** Pins the physical-plan properties the 100 TB design depends on — a
  * regression gate, not a printer (tools.PlanAudit stays the human-readable
  * version). String-level checks run on the pre-execution plan; markers are
  * stable across AQE because the initial plan is embedded in toString. */
class PlanQualitySuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def exchanges(p: String): Int =
    "Exchange ".r.findAllIn(p).length

  test("q_scan_pruned: shipdate predicate and column prune reach parquet") {
    val p = plan("q_scan_pruned")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    // ReadSchema is the 4 projected columns, not all 16
    val rs = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!rs.contains("l_comment") && !rs.contains("l_partkey"), rs)
  }

  test("q_join_broadcast: tiny dims use BroadcastHashJoin, zero big shuffles") {
    val p = plan("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_topk_global: limit folds into TakeOrderedAndProject, not a full sort") {
    val p = plan("q_topk_global")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_agg_q1 and q_agg_stats: hash aggregation with partial pushdown") {
    Seq("q_agg_q1", "q_agg_stats").foreach { q =>
      val p = plan(q)
      assert(p.contains("HashAggregate"), s"$q:\n$p")
      assert(!p.contains("SortAggregate"), s"$q must not sort-aggregate:\n$p")
    }
  }

  test("q_sample_hash: deterministic sample is a scan-side filter, one shuffle") {
    val p = plan("q_sample_hash")
    assert(p.contains("Filter"), p)
    val rs = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!rs.contains("o_comment") && !rs.contains("o_orderdate"), rs)
    // one data shuffle (final agg) + one range shuffle ordering the tiny result
    assert(exchanges(p) === 2, s"expected agg + output-order shuffles only:\n$p")
  }

  test("q_dedup_exact: one data shuffle (on the digest) + output ordering") {
    val p = plan("q_dedup_exact")
    assert(exchanges(p) === 2, p)
  }

  test("q_window_percent_rank: one shuffle feeding one Window + output ordering") {
    val p = plan("q_window_percent_rank")
    assert(exchanges(p) === 2, p)
    assert("Window".r.findAllIn(p).length >= 1, p)
  }

  test("q_sim_topk: the query side is broadcast — candidates never shuffle") {
    val p = plan("q_sim_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q_join_asof_merge: union-merge as-of has NO join operator at all") {
    val p = plan("q_join_asof_merge")
    assert(!p.contains("Join"), s"merge as-of must not plan a join:\n$p")
    assert(p.contains("Window"), p)
  }

  test("q_dedup_embed_block: pair loop shuffles only the tiny result") {
    val p = plan("q_dedup_embed_block")
    assert(!p.contains("Join"), s"block variant must not plan a join:\n$p")
    // one range exchange ordering the ~hundreds-of-rows output; the
    // candidate pairs never hit a shuffle (per-block checkpointed scans
    // union map-side)
    assert(exchanges(p) === 1, p)
  }

  test("q_dedup_simhash + 64: banded candidates — no all-pairs join shape") {
    Seq("q_dedup_simhash", "q_dedup_simhash64").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q all-pairs cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q theta-join shape:\n$p")
    }
  }

  test("q_sample_stratified: scan prunes to (vec_id, label) — embeddings never read") {
    val p = plan("q_sample_stratified")
    // check the ReadSchema struct itself, not the whole scan line (the
    // file PATH contains "embeddings")
    val rs = p.linesIterator.find(_.contains("ReadSchema")).get
      .split("ReadSchema:").last
    assert(!rs.contains("embedding:"),
      s"the 64-float embedding column must not be scanned for a sampling summary: $rs")
    assert(p.contains("Filter"), p)
  }

  test("q_dedup_minhash_sketch: the sketch aggregate runs object-hash, not sort") {
    val p = plan("q_dedup_minhash_sketch")
    // a TypedImperativeAggregate that misses ObjectHashAggregate support
    // silently degrades to SortAggregate (extra sort per group) — pin it
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("SortAggregate"), p)
  }

  test("q_dedup_winnow: fingerprint equi-join only — no all-pairs shape") {
    val p = plan("q_dedup_winnow")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_dedup_winnow_xxh: every Window is doc_id-partitioned — no global sort") {
    // the vocab form pays a partition-less rank window (a one-task corpus
    // sort) for DuckDB parity; the production twin must have none. The
    // pair stage checkpoints the fingerprints (so its plan shows no
    // Window at all) — assert on the fingerprint pipeline's own plan,
    // where the winnow windows actually live
    val fp = LlmOps.winnowFingerprintsXxh(graft.Tables(spark, sf, "documents"))
      .queryExecution.executedPlan.toString
    val windows = fp.linesIterator.filter(_.matches(""".*\bWindow\b.*""")).toSeq
    assert(windows.nonEmpty, fp)
    windows.foreach(w => assert(w.contains("doc_id"),
      s"partition-less Window in the production winnow plan:\n$w"))
    val p = plan("q_dedup_winnow_xxh")
    assert(!p.matches("(?s).*\\bWindow\\b.*"), s"pair stage must carry no window:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_heavy_hitters: distributed top-k via TakeOrderedAndProject, hash agg") {
    val p = plan("q_heavy_hitters")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("HashAggregate") && !p.contains("SortAggregate"), p)
  }

  test("q_heavy_hitters_sketch: MG summary aggregates object-hash with partials") {
    val p = plan("q_heavy_hitters_sketch")
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("SortAggregate"), p)
    // partial_topkagg proves the summary merges executor-side — the
    // shuffle carries capacity counters per partition, not raw keys
    assert(p.contains("partial_topkagg"), p)
  }

  test("dropHotKeys: the stop-key filter is a broadcast anti join, no extra big shuffle") {
    import org.apache.spark.sql.functions._
    val df = graft.Tables(spark, sf, "lineitem").select("l_partkey")
    val p = graft.operators.ScaleJoins.dropHotKeys(df, Seq("l_partkey"), 1000)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
    assert(!p.contains("SortMergeJoin"), s"hot-key set must broadcast:\n$p")
  }

  test("q_ts_interp: both fill windows are user_id-partitioned — no global sort") {
    val p = plan("q_ts_interp")
    val windows = p.linesIterator.filter(_.matches(""".*\bWindow\b.*""")).toSeq
    assert(windows.nonEmpty, p)
    windows.foreach(w => assert(w.contains("user_id"),
      s"partition-less Window in the interp plan:\n$w"))
  }

  test("q_text_zipf: corpus-scale ranking goes through TakeOrderedAndProject") {
    val p = plan("q_text_zipf")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_graph_triangles: two equi joins over canonical edges, no cartesian") {
    val p = plan("q_graph_triangles")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_ts_resample: grid explode is map-side; fill is one window") {
    val p = plan("q_ts_resample")
    assert(p.contains("Generate explode"), p)
    assert("Window".r.findAllIn(p).length === 1, p)
  }

  test("q_join_salted: salting must not add exchanges over the plain join") {
    // the salt key rides the SAME shuffles the plain join already does
    // (join + final agg + output order); replication is the only tax
    assert(exchanges(plan("q_join_salted")) === exchanges(plan("q_join_shuffle")))
  }

  test("q_ml_boost_train_predict: scoring is a folded column expression, no UDF") {
    val p = plan("q_ml_boost_train_predict")
    assert(!p.contains("UDF"), s"scoring must stay inside codegen:\n$p")
    assert(!p.contains("BatchEvalPython"), p)
  }

  test("q_ts_ohlc: candle window and agg share one (day, type) shuffle") {
    val p = plan("q_ts_ohlc")
    val wins = p.linesIterator.filter(_.matches(""".*\bWindow\b.*""")).toSeq
    assert(wins.size === 1 && wins.head.contains("event_type"),
      s"open/close window must be (day, event_type)-partitioned:\n$p")
    // window shuffle reused by the groupBy on the same keys + output order
    assert(exchanges(p) === 2, p)
  }

  test("q_ts_ewma: lag chain rides ONE user_id window, all codegen") {
    val p = plan("q_ts_ewma")
    val wins = p.linesIterator.filter(_.matches(""".*\bWindow\b.*""")).toSeq
    assert(wins.size === 1 && wins.head.contains("user_id"), p)
    assert(exchanges(p) === 2, s"user window + output order only:\n$p")
    assert(!p.contains("UDF"), p)
  }

  test("q_agg_mode: raw rows only hit the hash agg; argmax rides the heap operator") {
    val p = plan("q_agg_mode")
    // RewriteRankLimit upgrades the old flag-partitioned rn=1 window to the
    // TopKPerKey heap — pin the improved shape (keyed on the flag, no
    // Window at all), and map-side combine on the raw rows stays
    val topk = p.linesIterator.find(_.contains("TopKPerKey"))
    assert(topk.exists(_.contains("l_returnflag")),
      s"argmax must be the flag-keyed heap operator:\n$p")
    assert(!p.contains("WindowExec"), p)
    assert(p.contains("partial_count"), s"mode needs map-side combine:\n$p")
  }

  test("q_join_interval_overlap: theta join broadcasts the promo grid") {
    val p = plan("q_join_interval_overlap")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_ts_vwap: exact decimal sums in one partial-combining agg") {
    val p = plan("q_ts_vwap")
    assert(p.contains("partial_sum"), p)
    assert(exchanges(p) === 2, s"(day, type) agg + output order only:\n$p")
  }

  test("q_text_contamination and q_text_perplexity: token joins stay equi") {
    Seq("q_text_contamination", "q_text_perplexity").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      // the only nested-loop allowed is the broadcast of the 1-row total
      if (q == "q_text_contamination")
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
    }
  }

  test("q_text_repetition: signals are doc-keyed aggs, no corpus-scale window") {
    val p = plan("q_text_repetition")
    assert(p.linesIterator.forall(!_.matches(""".*\bWindow\b.*""")), p)
    assert(p.contains("partial_sum"), p)
  }

  test("q_ts_attribution: one user window, never a global one") {
    val p = plan("q_ts_attribution")
    val wins = p.linesIterator.filter(_.matches(""".*\bWindow\b.*""")).toSeq
    assert(wins.size === 1 && wins.head.contains("user_id"),
      s"attribution must ride a user-partitioned window:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_ts_gap_stats: lag window and agg share the user_id key") {
    val p = plan("q_ts_gap_stats")
    val wins = p.linesIterator.filter(_.matches(""".*\bWindow\b.*""")).toSeq
    assert(wins.size === 1 && wins.head.contains("user_id"), p)
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"gap agg needs map-side combine:\n$p")
  }

  test("q_text_entropy / q_text_ttr / q_dedup_norm: doc-keyed, window-free") {
    Seq("q_text_entropy", "q_text_ttr", "q_dedup_norm").foreach { q =>
      val p = plan(q)
      assert(p.linesIterator.forall(!_.matches(""".*\bWindow\b.*""")), s"$q:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("UDF") && !p.contains("BatchEvalPython"),
        s"$q must stay codegen'd:\n$p")
    }
  }

  test("q_agg_skewkurt: exact power sums partial map-side, window-free") {
    val p = plan("q_agg_skewkurt")
    assert(p.contains("partial_sum") && p.contains("partial_count"), p)
    assert(p.linesIterator.forall(!_.matches(""".*\bWindow\b.*""")), p)
    assert(exchanges(p) === 2, s"flag agg + output order only:\n$p")
  }

  test("q_ts_rate: share window rides the post-agg frame, hour-partitioned") {
    val p = plan("q_ts_rate")
    val wins = p.linesIterator.filter(_.matches(""".*\bWindow\b.*""")).toSeq
    assert(wins.size === 1 && wins.head.contains("hour"),
      s"share window must be hour-partitioned:\n$p")
    assert(p.contains("partial_count"), s"rate needs map-side combine:\n$p")
  }

  test("q_ts_heatmap: pure hash agg, 7x24 keys collapse map-side") {
    val p = plan("q_ts_heatmap")
    assert(p.contains("partial_count"), p)
    assert(p.linesIterator.forall(!_.matches(""".*\bWindow\b.*""")), p)
    assert(exchanges(p) === 2, p)
  }

  test("q_text_keywords: rank window source-partitioned; only the 1-row broadcast NLJ") {
    val p = plan("q_text_keywords")
    val wins = p.linesIterator.filter(_.matches(""".*\bWindow\b.*""")).toSeq
    assert(wins.size === 1 && wins.head.contains("source"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_dedup_containment: shingle equi-join, no cartesian") {
    val p = plan("q_dedup_containment")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_scalar_struct / q_scalar_cast: map-side only — zero exchanges beyond order") {
    Seq("q_scalar_struct", "q_scalar_cast").foreach { q =>
      val p = plan(q)
      assert(exchanges(p) <= 1, s"$q must be scan + project + order:\n$p")
      assert(!p.contains("UDF"), s"$q:\n$p")
    }
  }

  test("q_subquery_correlated: decorrelated to ONE user window — no self-join, no second scan") {
    val p = plan("q_subquery_correlated")
    val wins = p.linesIterator.filter(_.matches(""".*\bWindow\b.*""")).toSeq
    assert(wins.size === 1 && wins.head.contains("o_custkey"), p)
    assert(!p.contains("Join"), s"window form must not re-join the table:\n$p")
    assert("FileScan".r.findAllIn(p).length === 1, s"one scan only:\n$p")
  }

  test("q_topk_per_key: custom heap operator, zero Window/Sort before output order") {
    val p = plan("q_topk_per_key")
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("WindowExec"), p)
    // the only Sort is the final output ordering
    assert("Sort ".r.findAllIn(p).length <= 1, s"heap must not sort per key:\n$p")
  }

  test("q_curate_domains: per-domain cap is the sort-free heap, blocklist pushed to the scan") {
    val p = plan("q_curate_domains")
    assert(p.contains("TopKPerKey"), s"cap must rewrite to the heap:\n$p")
    assert(!p.contains("WindowExec"), s"no per-domain window:\n$p")
    // the blocklist anti-filter is a scan-level predicate, not a join
    assert(!p.contains("Join"), s"blocklist must be a filter, not a join:\n$p")
    assert("Sort ".r.findAllIn(p).length <= 1, s"only the output order sorts:\n$p")
  }

  test("q_curate_domains_url: eTLD+1 cap is the sort-free heap, domain derivation scan-side") {
    val p = plan("q_curate_domains_url")
    assert(p.contains("TopKPerKey"), s"cap must rewrite to the heap:\n$p")
    assert(!p.contains("WindowExec"), s"no per-domain window:\n$p")
    // registrable-domain extraction is pure split arithmetic in the
    // projection — no join for the suffix table (it's an isin literal),
    // no join for the blocklist
    assert(!p.contains("Join"), s"suffix table and blocklist must be scan-side:\n$p")
    assert("Sort ".r.findAllIn(p).length <= 1, s"only the output order sorts:\n$p")
  }

  test("q_cdc_snapshot: the replayed snapshot read is an argmax agg, no window") {
    val p = plan("q_cdc_snapshot")
    // the per-batch merges already happened at plan-build time; the final
    // read must stay a plain scan + output order, never a corpus window
    assert(!p.contains("WindowExec"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_dedup_incremental: band equi-joins only — no cartesian, no all-pairs") {
    val p = plan("q_dedup_incremental")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must stay an equi join:\n$p")
  }

  test("q_vec_project: the projection is one scan-side HOF — no join, one output-order shuffle") {
    val p = plan("q_vec_project")
    assert(!p.contains("Join"), s"JL projection must not join:\n$p")
    assert(!p.contains("Generate"), s"must stay a per-row HOF, not an explode:\n$p")
    // only the final orderBy's range shuffle
    assert(exchanges(p) === 1, p)
  }

  test("q_vec_centroid: centroids broadcast back — the exploded scan never re-shuffles for the join") {
    val p = plan("q_vec_centroid")
    assert(p.contains("BroadcastHashJoin"), s"centroid join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_mix_temperature: rates broadcast, the corpus is filtered in place") {
    val p = plan("q_mix_temperature")
    assert(p.contains("BroadcastHashJoin"), s"rate join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus must never shuffle for its own sampling decision:\n$p")
  }

  test("q_join_asof_split: every window partitions on (key, slot) — the hot key never lands on one task") {
    val p = plan("q_join_asof_split")
    // the running-frame window must carry BOTH partition keys; a bare _k
    // window would silently reintroduce the single-sort-task skew
    val winLines = p.linesIterator.filter(l =>
      l.contains("Window ") && l.contains("windowspecdefinition(_k")).toSeq
    assert(winLines.exists(_.contains("_slot")),
      s"in-slot window lost the _slot partition key:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_join_asof_nearest_merge: two merge passes, no pair blowup") {
    val p = plan("q_join_asof_nearest_merge")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"nearest composition must stay equi-join shaped:\n$p")
    // both directions run the running-frame window (>= 2 windows)
    assert("Window".r.findAllIn(p).length >= 2, p)
  }

  test("q_graph_communities: vote rounds are equi-joins + hash aggs, no cartesian") {
    val p = plan("q_graph_communities")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortAggregate"), s"votes must hash-aggregate:\n$p")
  }

  test("q_mix_dsir: only the one-row stats broadcast is nested-loop; token joins stay equi") {
    val p = plan("q_mix_dsir")
    assert(!p.contains("CartesianProduct"), p)
    // the w-keyed joins (tf x term, raw x tgt) must be hash equi-joins
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("UDF"), p)
  }

  test("q_dedup_lines: line-frequency pass is one groupBy + equi-join back") {
    val p = plan("q_dedup_lines")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q_join_bloom: codegen'd xxhash64 probe runs on the fact side BEFORE the join") {
    val p = plan("q_join_bloom")
    val lines = p.linesIterator.toSeq
    // Catalyst fuses the probe predicate into the 1-row-bitset BNLJ's join
    // condition — the probe line carries the xxhash64 double-hash and sits
    // BELOW the exact BroadcastHashJoin in the tree (runs first)
    val probeIdx = lines.indexWhere(l =>
      l.contains("BroadcastNestedLoopJoin") && l.contains("xxhash64"))
    val joinIdx = lines.indexWhere(_.contains("BroadcastHashJoin"))
    assert(probeIdx >= 0, s"bloom probe missing:\n$p")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      s"probe must be an input of the exact join, not after it:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("UDF"), s"probe must be built-ins only:\n$p")
  }

  test("q_text_novelty: first-seen is a shingle-partitioned window, join-free, no UDF") {
    val p = plan("q_text_novelty")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // r17: the groupBy + join-back became min() over the sh partitioning —
    // ONE shuffle and one explode pass instead of two of each; the plan
    // must stay join-free (a reintroduced join would re-shuffle the full
    // shingle frame) and the window must be keyed, never corpus-wide
    assert(!p.contains("Join"), s"first-seen must be a window, not a join:\n$p")
    assert(p.contains("windowspecdefinition(sh#"),
      s"expected the sh-partitioned first-seen window:\n$p")
    assert(!p.contains("UDF"), p)
  }

  test("q_sim_topk_pca: reduced-space kernel is the one bounded broadcast product, projection UDF-free") {
    val p = plan("q_sim_topk_pca")
    // the query-side broadcast product is the kernel BY DESIGN (10 fixed
    // queries); nothing else may nest loops, and the PCA projection must
    // stay codegen'd built-ins
    assert("BroadcastNestedLoopJoin|CartesianProduct".r.findAllIn(p).length <= 1, p)
    assert(!p.contains("UDF"), s"projection must be built-ins only:\n$p")
  }

  test("shardAssignment: rank windows are bucket-partitioned; offsets broadcast; no cartesian") {
    val p = LlmOps.shardAssignment(graft.Tables(spark, sf, "documents"), 16)
      .queryExecution.executedPlan.toString
    // the data-scale window must be bucket-partitioned; the ONLY
    // permitted partition-less window is the 64-row offset table's
    // cumulative sum (its input is the bucket-count aggregate)
    val windows = p.linesIterator.filter(_.matches(""".*\bWindow\b.*""")).toSeq
    assert(windows.exists(_.contains("bucket")),
      s"missing the bucket-partitioned rank window:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"bucket offsets must broadcast, never shuffle the corpus:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("UDF"), s"shard arithmetic must be built-ins only:\n$p")
  }

  test("q_pack_chunks: prefix sum is bucket-partitioned, offsets broadcast — no corpus-scale global window") {
    val p = plan("q_pack_chunks")
    // the data-scale cumsum window must be bucket-partitioned; the only
    // partition-less window permitted is the 64-row bucket-offset table
    // (its input is the bucket-total aggregate) — the shardAssignment
    // two-phase discipline
    val windows = p.linesIterator.filter(_.matches(""".*\bWindow\b.*""")).toSeq
    assert(windows.exists(_.contains("bucket")),
      s"missing the bucket-partitioned cumsum window:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"bucket offsets must broadcast, never shuffle the corpus:\n$p")
    assert(!p.contains("CartesianProduct") ||
      "CartesianProduct".r.findAllIn(p).length <= 1,
      s"only the 1-row min/max bound broadcast may cross:\n$p")
    assert(!p.contains("UDF"), s"packing arithmetic must be built-ins only:\n$p")
  }

  test("q_decontaminate_fuzzy: containment verify is equi-join only — no all-pairs shape") {
    val p = plan("q_decontaminate_fuzzy")
    assert(!p.contains("CartesianProduct"), p)
    // the lone nested-loop product allowed anywhere in the composed plan
    // is curateDocs' internal langs broadcast (3 rows x docs); the
    // shingle containment itself must join on the shingle key
    assert("CartesianProduct|BroadcastNestedLoopJoin".r.findAllIn(p).length <= 1, p)
  }

  test("qualityProbe scoring: codegen'd graft_dot argmax — no ScalaUDF in the scoring plan") {
    val scored = LlmOps.qualityProbe(graft.Tables(spark, sf, "documents"))
    val p = scored.queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF"), s"probe scoring must stay codegen'd:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("qualityProbeWide scoring: per-doc HOF fold against the weight literal — no ScalaUDF, no cartesian, no weight-table join") {
    val p = LlmOps.qualityProbeWide(graft.Tables(spark, sf, "documents"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF"), s"wide scoring must stay expression-level:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // the only dim-keyed join allowed is SparseRidge's ≤D-row dim→index
    // remap, and it must BROADCAST — a shuffled dim join would mean the
    // weight/index table went corpus-side
    p.linesIterator.filter(l => l.contains("Join") && l.contains("dim#")).foreach { l =>
      assert(l.contains("BroadcastHashJoin"),
        s"dim-keyed join is not a broadcast — the index table shuffled the corpus:\n$l")
    }
  }

  test("fuzzyContamination: eval shingles BROADCAST — the train side never shuffles on sh") {
    // the scaladoc's 100 TB shape (VERDICT r11 #3): a real eval suite is
    // MBs of shingles, so the containment join must be a map-side
    // broadcast join regardless of what the planner's stats would pick
    val docs = graft.Tables(spark, sf, "documents")
    val p = LlmOps.fuzzyContamination(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 =!= 0),
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"eval side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the train-side shingle table must never shuffle on sh:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }
}
