package graft.ml

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class IvfIndexSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private def embeddings = Tables(spark, sf, "embeddings")
  private def corpus = embeddings.filter(col("vec_id") >= 10)
  private def queries = embeddings.filter(col("vec_id") < 10)

  private def bruteTop5: Map[Long, Seq[Long]] = {
    graft.functions.VectorFunctions.register(spark)
    val e = embeddings.select(col("vec_id"),
        expr("transform(CAST(embedding AS array<double>), x -> x / sqrt(graft_dot(CAST(embedding AS array<double>), CAST(embedding AS array<double>))))").as("v"))
    val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("v").as("qv"))
    val c = e.filter(col("vec_id") >= 10).select(col("vec_id").as("c_id"), col("v").as("cv"))
    q.crossJoin(c)
      .withColumn("cos", expr("graft_dot(qv, cv)"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("cos").desc, col("c_id"))))
      .filter(col("rn") <= 5)
      .select("q_id", "rn", "c_id")
      .collect().groupBy(_.getLong(0))
      .map { case (qid, rows) => qid -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
  }

  test("training is deterministic across partitionings") {
    val m1 = IvfIndex.train(corpus.repartition(1), k = 8, iters = 3)
    val m2 = IvfIndex.train(corpus.repartition(32), k = 8, iters = 3)
    m1.centroids.zip(m2.centroids).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq) // exact: decimal-mean updates
    }
  }

  test("nprobe = k reproduces brute-force top-5 exactly") {
    val model = IvfIndex.train(corpus, k = 8, iters = 3)
    val got = IvfIndex.search(spark, corpus, queries, model, topK = 5, nprobe = 8)
      .collect().groupBy(_.getLong(0))
      .map { case (qid, rows) => qid -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(got === bruteTop5)
  }

  test("cells are a physical partition key: probe reads prune at file level") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val model = IvfIndex.train(corpus, k = 4, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivf_cells").toString
    graft.sources.PartitionedLayout.writePartitioned(
      IvfIndex.assign(corpus, model).select("vec_id", "cell"), dir, "cell")
    val probe = graft.sources.PartitionedLayout.read(spark, dir)
      .filter(col("cell") === 2)
    val plan = probe.queryExecution.executedPlan
    val scan = (plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).collectLeaves().collectFirst { case s: FileSourceScanExec => s }.get
    assert(scan.partitionFilters.nonEmpty, scan.treeString)
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil).size === 1,
      "a one-cell probe must touch exactly one of the k cell directories")
    // and the partitioned copy is lossless
    val total = graft.sources.PartitionedLayout.read(spark, dir).count()
    assert(total === corpus.count())
  }

  test("searchPartitioned: IVF over the cell layout — same results, pruned listing") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val model = IvfIndex.train(corpus, k = 8, iters = 3)
    val dir = java.nio.file.Files.createTempDirectory("ivf_layout").toString
    IvfIndex.writeCells(corpus, model, dir)
    val oneQuery = queries.filter(col("vec_id") === 0L)
    val got = IvfIndex.searchPartitioned(spark, dir, oneQuery, model, topK = 5, nprobe = 2)
    val want = IvfIndex.search(spark, corpus, oneQuery, model, topK = 5, nprobe = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(rows(got) === rows(want))
    assert(rows(got).nonEmpty)
    // the corpus scan carries the probed-cell partition filter and its
    // file listing touches <= nprobe of the k cell directories
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scans(r.child)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val pruned = scans(got.queryExecution.executedPlan)
      .filter(_.partitionFilters.nonEmpty)
    assert(pruned.nonEmpty, got.queryExecution.executedPlan.toString)
    val listed = pruned.head.relation.location
      .listFiles(pruned.head.partitionFilters, Nil).size
    assert(listed <= 2, s"one query with nprobe=2 must list <= 2 cell dirs, got $listed")
  }

  test("versioned index: the committed-batch filter prunes at the partition level too") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val dir = java.nio.file.Files.createTempDirectory("ivf_vprune").toString
    IvfIndex.buildIndex(corpus, k = 8, iters = 1, dir)
    IvfIndex.appendToIndex(spark, dir, queries.limit(5)
      .withColumn("vec_id", col("vec_id") + 50000))
    // land a TORN batch (data, no commit marker): committed-path reads
    // must prune its (cell, batch=2) leaf directories at LISTING time —
    // the second-level partition filter, composing with the cell prune
    val model = IvfIndex.loadModel(spark, s"$dir/model")
    graft.sources.PartitionedLayout.overwritePartitions(
      IvfIndex.assign(queries.limit(5).withColumn("vec_id", col("vec_id") + 90000), model)
        .withColumn("batch", lit(2L)), s"$dir/cells", "cell", "batch")
    val got = IvfIndex.searchIndex(spark, dir,
      queries.filter(col("vec_id") === 0L), topK = 5, nprobe = 8)
    got.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scans(r.child)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val pruned = scans(got.queryExecution.executedPlan)
      .filter(_.partitionFilters.exists(_.toString.contains("batch")))
    assert(pruned.nonEmpty,
      s"no batch partition filter in plan:\n${got.queryExecution.executedPlan}")
    val files = pruned.head.relation.location
      .listFiles(pruned.head.partitionFilters, Nil)
      .flatMap(_.files.map(_.getPath.toString))
    assert(files.nonEmpty)
    assert(!files.exists(_.contains("batch=2")),
      s"torn batch's files survived partition pruning: $files")
  }

  test("persisted index: buildIndex + searchIndex equals the in-memory search") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-index").toString
    val model = IvfIndex.buildIndex(corpus, k = 8, iters = 3, dir)
    // model round-trips exactly (decimal-mean centroids are bit-stable)
    val loaded = IvfIndex.loadModel(spark, s"$dir/model")
    model.centroids.zip(loaded.centroids).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq)
    }
    // a FRESH consumer with only the path gets identical results
    val fromDisk = IvfIndex.searchIndex(spark, dir, queries, topK = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    val inMemory = IvfIndex.search(spark, corpus, queries, model, topK = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    assert(fromDisk === inMemory)
    assert(fromDisk.nonEmpty)
  }

  test("appendToIndex: append(A, B) IS the index writeCells(A ∪ B) would build — no retrain") {
    val dirAppend = java.nio.file.Files.createTempDirectory("graft-ivf-append").toString
    val dirFull = java.nio.file.Files.createTempDirectory("graft-ivf-full").toString
    val a = corpus.filter(col("vec_id") % 5 =!= 0)
    val b = corpus.filter(col("vec_id") % 5 === 0)
    val model = IvfIndex.buildIndex(a, k = 8, iters = 3, dirAppend)
    val appended = IvfIndex.appendToIndex(spark, dirAppend, b)
    assert(appended === b.count())
    // reference: FULL corpus assigned under the SAME model (the append
    // contract is model-frozen assignment, not retraining)
    IvfIndex.saveModel(spark, model, s"$dirFull/model")
    IvfIndex.writeCells(corpus, model, s"$dirFull/cells")
    def layout(p: String) = graft.sources.PartitionedLayout.read(spark, s"$p/cells")
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(layout(dirAppend) === layout(dirFull), "appended layout diverged from rebuild")
    // and searches agree at every nprobe, including the exact nprobe=k path
    for (np <- Seq(2, 8)) {
      def top(p: String) = IvfIndex.searchIndex(spark, p, queries, topK = 5, nprobe = np)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
      assert(top(dirAppend) === top(dirFull), s"nprobe=$np")
    }
    // nprobe=k after append == brute force over A ∪ B (search sees B)
    val exactIds = IvfIndex.searchIndex(spark, dirAppend, queries, topK = 5, nprobe = 8)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(exactIds === bruteTop5)
  }

  test("staleness: frozen at ratio 1.0 until appends drift the stored distribution") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-stale").toString
    val a = corpus.filter(col("vec_id") % 5 =!= 0)
    val b = corpus.filter(col("vec_id") % 5 === 0)
    IvfIndex.buildIndex(a, k = 8, iters = 3, dir)
    val (n0, nNow0, _, _, r0) = IvfIndex.staleness(spark, dir)
    assert(n0 === a.count() && nNow0 === n0)
    assert(math.abs(r0 - 1.0) < 1e-9, s"no appends -> ratio must be exactly 1.0, got $r0")
    IvfIndex.appendToIndex(spark, dir, b)
    val (nBuild, nNow, meanBuild, meanNow, ratio) = IvfIndex.staleness(spark, dir)
    assert(nBuild === a.count() && nNow === corpus.count(),
      "meta must stay frozen at build time while the layout grows")
    assert(meanBuild > 0 && meanNow > 0 && ratio > 0)
    // same-distribution appends land NEAR the build-time tightness; a
    // drifted batch is exactly what pushes this ratio away from 1
    assert(ratio > 0.5 && ratio < 2.0, s"ratio $ratio")
  }

  /** Clustered synthetic vectors for the drift drill: cluster centers are
    * deterministic LCG unit-ish directions; each point is its cluster
    * center plus small LCG noise. The harness embeddings are UNCLUSTERED
    * Gaussians whose build-time tightness is already near the random
    * ceiling (measured mean sq dist 0.92 of a ~1.1 max) — no append can
    * meaningfully raise that mean, so a drill needs a corpus where
    * tightness is real. `idBase` separates batches; `centerSeed` moves the
    * cluster centers (the drift). */
  private def clustered(n: Int, idBase: Long, centerSeed: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    def lcg(s: Long): Long = s * 6364136223846793005L + 1442695040888963407L
    val dims = 64
    val centers = Array.tabulate(8, dims) { (j, d) =>
      var z = lcg(centerSeed * 1000L + j * 64L + d)
      z = lcg(z)
      (z >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    (0 until n).map { i =>
      val j = i % 8
      val noise = Array.tabulate(dims) { d =>
        var z = lcg(idBase + i * 64L + d + 7)
        z = lcg(z)
        0.06 * ((z >>> 11).toDouble / (1L << 53).toDouble - 0.5)
      }
      val v = Array.tabulate(dims)(d => (centers(j)(d) + noise(d)).toFloat)
      (idBase + i, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("drift drill: a shifted-distribution append fires the staleness alarm, in-distribution appends do not") {
    val a = clustered(1600, idBase = 0, centerSeed = 1)
    // weekly shape, week 1: an append drawn from the SAME distribution
    val inDist = clustered(400, idBase = 10000, centerSeed = 1)
    val dirIn = java.nio.file.Files.createTempDirectory("graft-ivf-drift-in").toString
    IvfIndex.buildIndex(a, k = 8, iters = 3, dirIn)
    IvfIndex.appendToIndex(spark, dirIn, inDist)
    val (_, _, _, _, inDistRatio) = IvfIndex.staleness(spark, dirIn)
    // week N: the upstream distribution moved — same generator, DIFFERENT
    // cluster centers; the frozen quantizer assigns the new mass to cells
    // whose centroids are nowhere near it
    val drifted = clustered(400, idBase = 20000, centerSeed = 99)
    val dirDrift = java.nio.file.Files.createTempDirectory("graft-ivf-drift-out").toString
    IvfIndex.buildIndex(a, k = 8, iters = 3, dirDrift)
    IvfIndex.appendToIndex(spark, dirDrift, drifted)
    val (_, _, meanBuild, meanDrift, driftRatio) = IvfIndex.staleness(spark, dirDrift)
    info(s"in-distribution ratio: $inDistRatio; drifted ratio: $driftRatio " +
      s"(build mean $meanBuild -> drifted mean $meanDrift)")
    assert(inDistRatio > 0.8 && inDistRatio < 1.2,
      s"in-distribution append must NOT alarm: ratio $inDistRatio")
    assert(driftRatio > 2.0, s"drifted append must alarm: ratio $driftRatio")
    assert(driftRatio > 2 * inDistRatio,
      s"alarm separation too weak: drift $driftRatio vs in-dist $inDistRatio")

    // recall at the drifted state: queries FROM the drifted distribution
    // against the stale quantizer at nprobe=2 — the degradation the alarm
    // exists to catch before users do (numbers recorded in BASELINE.md)
    val driftedQueries = clustered(40, idBase = 30000, centerSeed = 99)
    val inQueries = clustered(40, idBase = 40000, centerSeed = 1)
    def recallAt(path: String, qs: org.apache.spark.sql.DataFrame,
                 stored: org.apache.spark.sql.DataFrame): Double = {
      val brute = KnnGraph.bruteForceSearch(stored, qs, k = 5)
        .collect().groupBy(_.getLong(0))
        .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
      val got = IvfIndex.searchIndex(spark, path, qs, topK = 5, nprobe = 2)
        .collect().groupBy(_.getLong(0))
        .map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }
      brute.map { case (q, ids) =>
        got.getOrElse(q, Set.empty).count(ids).toDouble / ids.size }.sum / brute.size
    }
    val recallInQ = recallAt(dirIn, inQueries, a.unionByName(inDist))
    val recallDriftedQ = recallAt(dirDrift, driftedQueries, a.unionByName(drifted))
    info(s"recall@5 nprobe=2 — in-distribution queries: $recallInQ; " +
      s"drifted queries on the stale index: $recallDriftedQ")
    // in-distribution stays near-exact on clustered data; the drifted
    // regime visibly degrades — the alarm and the degradation co-occur
    assert(recallInQ >= 0.9, s"in-distribution recall collapsed: $recallInQ")
    assert(recallDriftedQ <= recallInQ,
      s"drifted recall $recallDriftedQ should not beat in-distribution $recallInQ")
  }

  test("nprobe = 2 of 8 keeps useful recall while scanning ~1/4 of cells") {
    val model = IvfIndex.train(corpus, k = 8, iters = 3)
    val approx = IvfIndex.search(spark, corpus, queries, model, topK = 5, nprobe = 2)
      .collect().groupBy(_.getLong(0))
      .map { case (qid, rows) => qid -> rows.map(_.getLong(2)).toSet }
    val exact = bruteTop5
    val recalls = exact.map { case (qid, top) =>
      approx.get(qid).map(a => top.count(a.contains).toDouble / top.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4, s"mean recall@5 = $mean (per-query: $recalls)")
    // Lloyd refinement must not be a no-op: centroids moved from the seed
    val seed = IvfIndex.train(corpus, k = 8, iters = 0)
    assert(model.centroids.flatten.toSeq !== seed.centroids.flatten.toSeq)
  }

  // ---- whitened-ANN composition (Pca ∘ IvfIndex — q_ann_ivf_pca) ------

  /** The q_ann_ivf_pca projection: randomized-PCA whiten to 16 dims,
    * fitted on the CORPUS only (queries must not leak into the
    * build-time model — the gate's frozen-projection contract). */
  private def whitened = {
    val model = Pca.fitRandomized(embeddings.filter(col("vec_id") >= 10), k = 16)
    Pca.transform(embeddings, model, whiten = true)
      .select(col("vec_id"), col("proj").as("embedding"))
  }

  private def bruteTop5On(e0: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] = {
    graft.functions.VectorFunctions.register(spark)
    val e = e0.select(col("vec_id"),
      expr("transform(CAST(embedding AS array<double>), x -> x / sqrt(graft_dot(CAST(embedding AS array<double>), CAST(embedding AS array<double>))))").as("v"))
    val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("v").as("qv"))
    val c = e.filter(col("vec_id") >= 10).select(col("vec_id").as("c_id"), col("v").as("cv"))
    q.crossJoin(c)
      .withColumn("cos", expr("graft_dot(qv, cv)"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("cos").desc, col("c_id"))))
      .filter(col("rn") <= 5)
      .select("q_id", "rn", "c_id")
      .collect().groupBy(_.getLong(0))
      .map { case (qid, rows) => qid -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
  }

  test("whitened composition: nprobe = k equals brute force in the whitened space") {
    val p = whitened
    val wc = p.filter(col("vec_id") >= 10)
    val wq = p.filter(col("vec_id") < 10)
    val model = IvfIndex.train(wc, k = 8, iters = 3)
    val got = IvfIndex.search(spark, wc, wq, model, topK = 5, nprobe = 8)
      .collect().groupBy(_.getLong(0))
      .map { case (qid, rows) => qid -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(got === bruteTop5On(p),
      "whitened IVF at nprobe=k diverged from whitened brute force")
  }

  test("whitened composition: recall floor at nprobe = 2 and determinism across partitionings") {
    val p = whitened.localCheckpoint()
    val wc = p.filter(col("vec_id") >= 10)
    val wq = p.filter(col("vec_id") < 10)
    val model = IvfIndex.train(wc, k = 8, iters = 3)
    def run(c: org.apache.spark.sql.DataFrame) =
      IvfIndex.search(spark, c, wq, model, topK = 5, nprobe = 2)
        .collect().groupBy(_.getLong(0))
        .map { case (qid, rows) => qid -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    val approx = run(wc)
    val exact = bruteTop5On(p)
    val recalls = exact.map { case (qid, top) =>
      approx.get(qid).map(a => top.count(a.contains).toDouble / top.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4, s"whitened mean recall@5 = $mean (per-query: $recalls)")
    assert(run(wc.repartition(13, col("vec_id"))) === approx,
      "whitened pipeline results moved under repartitioning")
    // the composition genuinely changes the metric: whitened brute top-5
    // differs from raw-space brute top-5 for at least one query (else the
    // whitening step would be a no-op on this corpus)
    assert(exact !== bruteTop5, "whitening was a metric no-op on this corpus")
  }

  // -------------------------------------------------------------------
  // IVF-PQ
  // -------------------------------------------------------------------

  /** Exact cosine top-5 with the searchPqIndex tiebreak (score desc, id
    * asc), as ordered (q_id, rn, c_id) rows. */
  private def bruteTop5Rows(corpus: org.apache.spark.sql.DataFrame,
                            queries: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long)] = {
    graft.functions.VectorFunctions.register(spark)
    def nrm(df: org.apache.spark.sql.DataFrame, id: String, vc: String) =
      df.select(col("vec_id").as(id),
        expr("transform(CAST(embedding AS array<double>), x -> x / " +
          "sqrt(graft_dot(CAST(embedding AS array<double>), CAST(embedding AS array<double>))))").as(vc))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
    nrm(queries, "q_id", "qv").crossJoin(nrm(corpus, "c_id", "cv"))
      .withColumn("cos", expr("graft_dot(qv, cv)"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("q_id", "rn", "c_id").orderBy("q_id", "rn")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
  }

  private def lcg(s: Long): Long = s * 6364136223846793005L + 1442695040888963407L

  test("pq: ADC == brute force exactly when codebooks represent every residual losslessly") {
    import spark.implicits._
    // 16 distinct deterministic vectors at ids 0..15 (exactly the
    // codeword-init rows), each duplicated 9 more times at higher ids:
    // Lloyd stays on the 16 points, every residual IS a codeword, and
    // ADC reconstructs q·cent + q·(v−cent) = the exact cosine — the
    // semantic pin that the decomposition, LUT offsets, and code lookups
    // are wired right (duplicates tie and rank by c_id on both sides).
    val dims = 64
    val distinct16 = Array.tabulate(16, dims) { (i, d) =>
      var z = lcg(i * 97L + d * 31L + 5); z = lcg(z)
      (z >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    val corpus = (0 until 160).map(id =>
      (id.toLong, distinct16(id % 16).map(_.toFloat).toSeq)).toDF("vec_id", "embedding")
    val queries = (0 until 4).map { i =>
      val v = Array.tabulate(dims) { d =>
        var z = lcg(900000L + i * 53L + d * 17L); z = lcg(z)
        (z >>> 11).toDouble / (1L << 53).toDouble - 0.5
      }
      ((1000 + i).toLong, v.map(_.toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("pq-exact").toString + "/idx"
    IvfIndex.buildPqIndex(corpus, k = 4, iters = 2, m = 8, ksub = 16,
      pqIters = 2, dir)
    val adc = IvfIndex.searchPqIndex(spark, dir, queries, topK = 5, nprobe = 4)
      .orderBy("q_id", "rn").select("q_id", "rn", "c_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(adc === bruteTop5Rows(corpus, queries))
  }

  test("pq: codebooks, codes, and search are partition-order exact") {
    val emb = Tables(spark, sf, "embeddings")
    val corpus = emb.filter(col("vec_id") >= 10)
    val coarse = IvfIndex.train(corpus, k = 8, iters = 3)
    val a = IvfIndex.trainPq(corpus, coarse, m = 16, ksub = 16, iters = 3)
    def booksOf(m: IvfIndex.PqModel) = m.codebooks.map(_.map(_.toSeq).toSeq).toSeq
    for (df <- Seq(corpus.repartition(1), corpus.repartition(13, col("vec_id")))) {
      val b = IvfIndex.trainPq(df, coarse, m = 16, ksub = 16, iters = 3)
      assert(booksOf(b) === booksOf(a), "PQ codebooks not partition-order exact")
      assert(IvfIndex.encodePq(df, coarse, a)
        .orderBy("vec_id").collect().map(_.toSeq).toSeq ===
        IvfIndex.encodePq(corpus, coarse, a)
          .orderBy("vec_id").collect().map(_.toSeq).toSeq,
        "PQ codes not partition-order exact")
    }
  }

  /** Hierarchical fixture with PQ-LEARNABLE residual structure: 8 coarse
    * clusters × 16 subclusters × nPerSub points. Each subcluster offset
    * is built blockwise so that every 4-dim subspace sees at most 16
    * distinct slice values across the WHOLE corpus (the product structure
    * PQ codebooks represent), plus tiny noise. A query drawn from a
    * subcluster has that subcluster's points as its exact top neighbors,
    * and ADC can rank subclusters because their offsets ARE codewords.
    * (The flat `clustered` fixture is the opposite regime — residual =
    * pure noise — and PQ recall there is legitimately near zero.) */
  private def subclustered(nPerSub: Int, idBase: Long, noiseSeed: Int) = {
    import spark.implicits._
    val dims = 64; val nBlocks = 16; val bdim = 4
    val centers = Array.tabulate(8, dims) { (j, d) =>
      var z = lcg(1000L + j * 64L + d); z = lcg(z)
      (z >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    val blockVals = Array.tabulate(nBlocks, 16, bdim) { (s, g, d) =>
      var z = lcg(77000L + s * 997L + g * 61L + d); z = lcg(z)
      0.6 * ((z >>> 11).toDouble / (1L << 53).toDouble - 0.5)
    }
    def point(cell: Int, sub: Int, noise: Long): Array[Float] =
      Array.tabulate(dims) { d =>
        val s = d / bdim
        val off = blockVals(s)((sub + s + cell) % 16)(d % bdim)
        var z = lcg(noise * 31L + d * 13L + 3); z = lcg(z)
        (centers(cell)(d) + off +
          0.01 * ((z >>> 11).toDouble / (1L << 53).toDouble - 0.5)).toFloat
      }
    (for (cell <- 0 until 8; sub <- 0 until 16; i <- 0 until nPerSub) yield {
      val id = idBase + (cell * 16 + sub).toLong * nPerSub + i
      (id, point(cell, sub, noiseSeed * 1000003L + id).toSeq)
    }).toDF("vec_id", "embedding")
  }

  test("pq: structured-residual corpus recall floor at nprobe=k; model round-trips; codes-only payload") {
    val c = subclustered(nPerSub = 5, idBase = 0, noiseSeed = 1)
    val qs = subclustered(nPerSub = 1, idBase = 100000, noiseSeed = 2)
    val dir = java.nio.file.Files.createTempDirectory("pq-structured").toString + "/idx"
    val (_, trained) = IvfIndex.buildPqIndex(c, k = 8, iters = 3,
      m = 16, ksub = 16, pqIters = 3, dir)
    val exact = bruteTop5Rows(c, qs).groupBy(_._1)
      .map { case (q, rows) => q -> rows.map(_._3).toSet }
    val got = IvfIndex.searchPqIndex(spark, dir, qs, topK = 5, nprobe = 8)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }
    val recalls = exact.map { case (q, top) =>
      got.get(q).map(g => top.count(g.contains).toDouble / top.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    info(s"pq structured recall@5 (nprobe=k): $mean over ${recalls.size} queries")
    assert(mean >= 0.8, s"pq recall on a structured-residual corpus fell to $mean")
    // round-trip: the persisted codebooks are the trained ones exactly
    val loaded = IvfIndex.loadPqModel(spark, s"$dir/pq_model")
    assert(loaded.codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
      trained.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    // the stored payload really is codes-only: no vector column on disk
    // (batch is the ingest-version partition column, not data)
    val stored = graft.sources.PartitionedLayout.read(spark, s"$dir/codes")
    assert(stored.columns.sorted.toSeq === Seq("batch", "cell", "codes", "vec_id"),
      s"codes layout must not store vectors: ${stored.columns.toSeq}")
  }

  test("pq: versioned append — frozen-model encode, torn invisible, retry no-op, compact preserves") {
    val a = subclustered(nPerSub = 3, idBase = 0, noiseSeed = 1)
    val b = subclustered(nPerSub = 1, idBase = 200000, noiseSeed = 3)
    val qs = subclustered(nPerSub = 1, idBase = 300000, noiseSeed = 4)
    val dir = java.nio.file.Files.createTempDirectory("pq-append").toString + "/idx"
    val (coarse, pq) = IvfIndex.buildPqIndex(a, k = 8, iters = 2,
      m = 16, ksub = 16, pqIters = 2, dir)
    IvfIndex.appendPqVersion(spark, dir, b, 1L)
    // committed content == encode of A ∪ B under the FROZEN models — the
    // append contract, checked on the stored bytes themselves
    def stored() = graft.sources.PartitionedLayout.read(spark, s"$dir/codes")
      .filter(col("batch") <= IvfIndex.committedIngestVersion(spark, dir))
      .select(col("vec_id"), col("cell"), col("codes"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    val want = IvfIndex.encodePq(a.unionByName(b), coarse, pq)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    assert(stored() === want, "appended codes drifted from frozen-model encode of the union")
    // the appended vectors are genuinely searched
    val hits = IvfIndex.searchPqIndex(spark, dir, qs, topK = 5, nprobe = 8)
      .collect().map(_.getLong(2)).toSet
    assert(hits.exists(_ >= 200000L), "no appended vector ever surfaced in search")
    // retry of a committed version is a no-op
    IvfIndex.appendPqVersion(spark, dir, b, 1L)
    assert(stored() === want)
    // a torn append (marker deleted) is invisible to serving; its retry
    // re-lands exactly its own partitions and commits
    val b2 = subclustered(nPerSub = 1, idBase = 400000, noiseSeed = 5)
    IvfIndex.appendPqVersion(spark, dir, b2, 2L)
    val fs = graft.streaming.VersionedState.fileSystem(spark, dir)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/ingest/v=2/_SUCCESS"), false)
    assert(IvfIndex.committedIngestVersion(spark, dir) === 1L)
    assert(stored() === want, "torn batch leaked into committed reads")
    IvfIndex.appendPqVersion(spark, dir, b2, 2L)
    assert(IvfIndex.committedIngestVersion(spark, dir) === 2L)
    val want3 = IvfIndex.encodePq(a.unionByName(b).unionByName(b2), coarse, pq)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    assert(stored() === want3)
    // compact folds the per-batch dirs; committed content unchanged
    assert(IvfIndex.compactPqCodes(spark, dir) === 2)
    assert(stored() === want3)
    assert(graft.sources.PartitionedLayout.read(spark, s"$dir/codes")
      .select(col("batch").cast("long")).distinct().count() === 1L)
  }

  /** Low-rank correlated fixture: 8 DENSE latent directions (not
    * axis-aligned) with decaying variance + small noise — every PQ
    * subspace slice mixes all the signal, the regime OPQ rotation exists
    * for (PCA concentrates the signal into few axes, round-robin dealing
    * gives each subspace a fine-quantizable share). */
  private def lowRank(n: Int, base: Long) = {
    import spark.implicits._
    def u01(s0: Long): Double = {
      val s = lcg(lcg(s0)); (s >>> 11).toDouble / (1L << 53).toDouble
    }
    val d = 64; val rank = 8
    val g = Array.tabulate(rank, d)((t, i) => u01(t * 977L + i * 31L + 7) - 0.5)
    (0 until n).map { r =>
      val a = Array.tabulate(rank)(t =>
        (3.0 / (1 + t)) * (u01(base + r * 17L + t * 131L) - 0.5))
      val x = Array.tabulate(d) { i =>
        var s = 0.0; var t = 0
        while (t < rank) { s += a(t) * g(t)(i); t += 1 }
        (s + 0.02 * (u01(base + 7919L * r + i) - 0.5)).toFloat
      }
      (base + r, x.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("pq + OPQ rotation: orthonormal, deterministic, recall lift on correlated data, frozen for appends") {
    val corpus = lowRank(800, 0)
    val qs = lowRank(40, 100000)
    val exact = bruteTop5Rows(corpus, qs).groupBy(_._1)
      .map { case (q, rows) => q -> rows.map(_._3).toSet }
    def recallOf(dir: String): Double = {
      val got = IvfIndex.searchPqIndex(spark, dir, qs, topK = 5, nprobe = 8)
        .collect().groupBy(_.getLong(0))
        .map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }
      val rs = exact.map { case (q, top) =>
        got.get(q).map(g => top.count(g.contains).toDouble / top.size).getOrElse(0.0)
      }
      rs.sum / rs.size
    }
    val plain = java.nio.file.Files.createTempDirectory("opq-plain").toString + "/idx"
    val rot = java.nio.file.Files.createTempDirectory("opq-rot").toString + "/idx"
    IvfIndex.buildPqIndex(corpus, k = 8, iters = 3, m = 16, ksub = 16,
      pqIters = 3, plain)
    IvfIndex.buildPqIndex(corpus, k = 8, iters = 3, m = 16, ksub = 16,
      pqIters = 3, rot, rotate = true)
    val (rPlain, rRot) = (recallOf(plain), recallOf(rot))
    info(f"opq recall@5: unrotated $rPlain%.3f vs rotated $rRot%.3f")
    assert(rRot >= 0.25, s"rotated recall $rRot below the measured floor")
    assert(rRot > rPlain + 0.1,
      s"rotation stopped paying on correlated data: $rRot vs $rPlain")
    // the persisted rotation is orthonormal — with no centering anywhere,
    // that is exactly what preserves q·v through the rotated index
    val r = IvfIndex.loadRotation(spark, s"$rot/rot")
    for (i <- r.indices; j <- r.indices) {
      val dot = r(i).zip(r(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"rotation rows not orthonormal at ($i,$j): $dot")
    }
    // deterministic: a rebuild from a different partitioning is byte-equal
    val rot2 = java.nio.file.Files.createTempDirectory("opq-rot2").toString + "/idx"
    IvfIndex.buildPqIndex(corpus.repartition(13, col("vec_id")), k = 8,
      iters = 3, m = 16, ksub = 16, pqIters = 3, rot2, rotate = true)
    assert(IvfIndex.loadRotation(spark, s"$rot2/rot").map(_.toSeq).toSeq ===
      r.map(_.toSeq).toSeq)
    assert(IvfIndex.loadPqModel(spark, s"$rot2/pq_model")
      .codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
      IvfIndex.loadPqModel(spark, s"$rot/pq_model")
        .codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    // appends ride the FROZEN build-time rotation: committed content ==
    // encode of the rotated union under the frozen models
    val b = lowRank(60, 200000)
    IvfIndex.appendPqVersion(spark, rot, b, 1L)
    val stored = graft.sources.PartitionedLayout.read(spark, s"$rot/codes")
      .filter(col("batch") <= IvfIndex.committedIngestVersion(spark, rot))
      .select("vec_id", "cell", "codes")
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getSeq[Int](2))).toSet
    val want = IvfIndex.encodePq(
        IvfIndex.applyRotation(corpus.unionByName(b), r),
        IvfIndex.loadModel(spark, s"$rot/model"),
        IvfIndex.loadPqModel(spark, s"$rot/pq_model"))
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getSeq[Int](2))).toSet
    assert(stored === want, "append did not apply the frozen rotation")
  }

  test("filtered search: allowlist restricts BEFORE top-k; nprobe=k equals brute filtered; no disallowed id at any nprobe") {
    graft.functions.VectorFunctions.register(spark)
    val model = IvfIndex.train(corpus, k = 8, iters = 3)
    val allowed = embeddings.filter(col("vec_id") >= 10 && col("label") === 3)
      .select("vec_id")
    val allowedIds = allowed.collect().map(_.getLong(0)).toSet
    assert(allowedIds.nonEmpty && allowedIds.size < 200,
      s"fixture drifted: ${allowedIds.size} allowed ids")
    // witness: brute top-5 over the RESTRICTED candidate set — top-k after
    // the filter (k survivors), not post-filtered holes
    val want = bruteTop5Rows(
      corpus.join(allowed, Seq("vec_id"), "left_semi"), queries)
    val got = IvfIndex.search(spark, corpus, queries, model, topK = 5,
        nprobe = 8, allowed = Some(allowed))
      .select("q_id", "rn", "c_id").orderBy("q_id", "rn")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got === want, "filtered nprobe=k drifted from the brute filtered witness")
    // every query gets its full 5 survivors (the restriction leaves >5)
    assert(got.groupBy(_._1).forall(_._2.size == 5))
    // persisted index path: same allowlist through the pruned cells read
    val dir = java.nio.file.Files.createTempDirectory("ivf-filtered").toString + "/idx"
    IvfIndex.buildIndex(corpus, k = 8, iters = 3, dir)
    val gotIdx = IvfIndex.searchIndex(spark, dir, queries, topK = 5,
        nprobe = 8, allowed = Some(allowed))
      .select("q_id", "rn", "c_id").orderBy("q_id", "rn")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(gotIdx === want, "persisted filtered search drifted from the witness")
    // no disallowed id ever surfaces, at any nprobe, on any serving path
    for (np <- Seq(2, 8)) {
      val ids = IvfIndex.searchIndex(spark, dir, queries, topK = 5,
        nprobe = np, allowed = Some(allowed)).collect().map(_.getLong(2))
      assert(ids.forall(allowedIds.contains), s"disallowed id at nprobe=$np")
    }
    // the PQ/ADC path honors the same restriction
    val pqDir = java.nio.file.Files.createTempDirectory("pq-filtered").toString + "/idx"
    IvfIndex.buildPqIndex(corpus, k = 8, iters = 2, m = 16, ksub = 16,
      pqIters = 2, pqDir, keepFloat = true)
    for (rr <- Seq(0, 25)) {
      val ids = IvfIndex.searchPqIndex(spark, pqDir, queries, topK = 5,
        nprobe = 8, rerank = rr, allowed = Some(allowed)).collect().map(_.getLong(2))
      assert(ids.nonEmpty && ids.forall(allowedIds.contains),
        s"disallowed id through the PQ path (rerank=$rr)")
    }
  }

  test("pq: codegen'd encoder (PqEncode) is bit-equal to the UDF witness on real residuals") {
    import spark.implicits._
    val model = IvfIndex.train(corpus, k = 8, iters = 2)
    val pq = IvfIndex.trainPq(corpus, model, m = 16, ksub = 16, iters = 2)
    // residuals rebuilt with the public pieces: v - centroid[cell] via
    // zip_with is the same IEEE subtraction residUdf performs
    val cdf = model.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("cell", "cent")
    val resid = IvfIndex.assign(corpus, model)
      .join(broadcast(cdf), "cell")
      .select(col("vec_id"), col("cell"),
        expr("zip_with(v, cent, (a, b) -> a - b)").as("r"))
    // fail LOUDLY if the generated java does not compile (no silent
    // interpreted fallback hiding a janino error)
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      def codesOf(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
      val viaExpr = codesOf(resid.select(col("vec_id"),
        IvfIndex.encodeCol(pq.codebooks)(col("r")).as("codes")))
      val viaUdf = codesOf(resid.select(col("vec_id"),
        IvfIndex.encodeUdf(pq.codebooks)(col("r")).as("codes")))
      assert(viaExpr.nonEmpty && viaExpr === viaUdf,
        "codegen encoder drifted from the UDF witness")
      // and the production end-to-end path (encodePq) agrees too
      val viaPq = IvfIndex.encodePq(corpus, model, pq).collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](2).toSeq).toMap
      assert(viaPq === viaUdf, "encodePq drifted from the witness")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("sweep releases the filtered-search allowlist blocks (ADVICE r10: long-lived serving sessions)") {
    graft.functions.VectorFunctions.register(spark)
    val model = IvfIndex.train(corpus, k = 8, iters = 3)
    val allowed = embeddings.filter(col("vec_id") >= 10 && col("label") === 3)
      .select("vec_id")
    IvfIndex.sweep(spark) // drain pins from earlier tests
    val r = IvfIndex.search(spark, corpus, queries, model, topK = 5,
      nprobe = 8, allowed = Some(allowed))
    assert(r.count() > 0)
    assert(IvfIndex.sweep(spark) >= 1, "expected the allowlist checkpoint")
    assert(IvfIndex.sweep(spark) === 0, "second sweep must find nothing")
  }

  test("pq parametric OPQ: alternating refinement descends the reconstruction error; deterministic; serve path unchanged") {
    val corpus = lowRank(600, 0)
    val qs = lowRank(30, 100000)
    val init = java.nio.file.Files.createTempDirectory("opq-it-init").toString + "/idx"
    val opq = java.nio.file.Files.createTempDirectory("opq-it-ref").toString + "/idx"
    IvfIndex.buildPqIndex(corpus, k = 8, iters = 2, m = 16, ksub = 16,
      pqIters = 2, init, rotate = true)
    IvfIndex.buildPqIndex(corpus, k = 8, iters = 2, m = 16, ksub = 16,
      pqIters = 2, opq, rotate = true, opqIters = 2)
    // the objective the loop descends: mean squared reconstruction error
    val eInit = IvfIndex.pqReconstructionError(spark, init, corpus)
    val eOpq = IvfIndex.pqReconstructionError(spark, opq, corpus)
    info(f"opq reconstruction error: init $eInit%.6f vs refined $eOpq%.6f")
    // measured 0.001042 -> 0.001021 on this deterministic fixture: the
    // refinement strictly descends the objective (pin the direction, not
    // the 2% magnitude — codebook re-seeding keeps the step size modest)
    assert(eOpq < eInit,
      s"parametric refinement did not descend the reconstruction error: $eOpq vs $eInit")
    // the refined rotation is still orthonormal (serve-path exactness
    // depends on it: q·v preserved through R)
    val r = IvfIndex.loadRotation(spark, s"$opq/rot")
    for (i <- r.indices; j <- r.indices) {
      val dot = r(i).zip(r(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"refined rotation not orthonormal at ($i,$j): $dot")
    }
    // deterministic: rebuild from a different partitioning — same bytes
    val opq2 = java.nio.file.Files.createTempDirectory("opq-it-ref2").toString + "/idx"
    IvfIndex.buildPqIndex(corpus.repartition(13, col("vec_id")), k = 8,
      iters = 2, m = 16, ksub = 16, pqIters = 2, opq2, rotate = true, opqIters = 2)
    assert(IvfIndex.loadRotation(spark, s"$opq2/rot").map(_.toSeq).toSeq ===
      r.map(_.toSeq).toSeq, "refined rotation not partition-order exact")
    // serving is the UNCHANGED path (rot/ + models from disk) and keeps
    // the correlated-data recall floor
    val exact = bruteTop5Rows(corpus, qs).groupBy(_._1)
      .map { case (q, rows) => q -> rows.map(_._3).toSet }
    val got = IvfIndex.searchPqIndex(spark, opq, qs, topK = 5, nprobe = 8)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }
    val rs = exact.map { case (q, top) =>
      got.get(q).map(g => top.count(g.contains).toDouble / top.size).getOrElse(0.0)
    }
    val recall = rs.sum / rs.size
    info(f"opq refined recall@5 (nprobe=k): $recall%.3f")
    assert(recall >= 0.25, s"refined OPQ recall fell below the floor: $recall")
    // opqIters without rotate is a loud contract error
    val err = intercept[IllegalArgumentException] {
      IvfIndex.buildPqIndex(corpus, k = 8, iters = 1, m = 16, ksub = 16,
        pqIters = 1, opq2 + "-x", opqIters = 1)
    }
    assert(err.getMessage.contains("rotate"))
  }

  test("pq re-rank tier: exact parity at full shortlist, recall restored at small R, keepFloat contract") {
    val c = subclustered(nPerSub = 5, idBase = 0, noiseSeed = 1)
    val qs = subclustered(nPerSub = 1, idBase = 100000, noiseSeed = 2)
    val dir = java.nio.file.Files.createTempDirectory("pq-rerank").toString + "/idx"
    val (coarse, _) = IvfIndex.buildPqIndex(c, k = 8, iters = 3,
      m = 16, ksub = 16, pqIters = 3, dir, keepFloat = true)
    // the float twin stores exactly the assign() layout (vec_id, v, cell)
    val twin = graft.sources.PartitionedLayout.read(spark, s"$dir/cells")
    assert(twin.columns.sorted.toSeq === Seq("batch", "cell", "v", "vec_id"))
    // a shortlist covering every candidate == the float IVF search at the
    // same nprobe EXACTLY (same dots, same tie-break): quantization only
    // reorders the shortlist, which a full re-rank then fully repairs
    def tuples(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val full = tuples(IvfIndex.searchPqIndex(spark, dir, qs, topK = 5,
      nprobe = 8, rerank = 1000000))
    val float = tuples(IvfIndex.searchPartitioned(spark, s"$dir/cells", qs,
      coarse, topK = 5, nprobe = 8, maxBatch = Some(0L)))
    assert(full === float,
      "full-shortlist re-rank must equal the float IVF search bit-for-bit")
    // small-R re-rank: exact scores on the ADC top-25 — recall can only
    // move toward the float search's
    val exact = bruteTop5Rows(c, qs).groupBy(_._1)
      .map { case (q, rows) => q -> rows.map(_._3).toSet }
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().groupBy(_.getLong(0))
        .map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }
      val rs = exact.map { case (q, top) =>
        got.get(q).map(g => top.count(g.contains).toDouble / top.size).getOrElse(0.0)
      }
      rs.sum / rs.size
    }
    val adc = recallOf(IvfIndex.searchPqIndex(spark, dir, qs, topK = 5, nprobe = 8))
    val rr = recallOf(IvfIndex.searchPqIndex(spark, dir, qs, topK = 5,
      nprobe = 8, rerank = 25))
    info(f"pq re-rank recall@5: adc-only $adc%.3f vs rerank=25 $rr%.3f")
    assert(rr >= adc - 1e-12, s"re-rank lost recall: $rr vs adc $adc")
    // measured: 0.864 -> 1.000 on this deterministic fixture — R=5·topK
    // fully repairs the quantization reordering at nprobe=k
    assert(rr >= 0.95, s"rerank=25 recall fell from the measured 1.0: $rr")
    // rerank on a codes-only index fails LOUDLY, not silently approximate
    val plain = java.nio.file.Files.createTempDirectory("pq-rerank-plain").toString + "/idx"
    IvfIndex.buildPqIndex(subclustered(nPerSub = 1, idBase = 0, noiseSeed = 9),
      k = 8, iters = 1, m = 16, ksub = 16, pqIters = 1, plain)
    val err = intercept[IllegalArgumentException] {
      IvfIndex.searchPqIndex(spark, plain, qs, topK = 5, nprobe = 2, rerank = 10).collect()
    }
    assert(err.getMessage.contains("keepFloat"))
  }

  test("pq re-rank: float twin rides appends/compaction in lockstep; rotated re-rank scores raw-space cosine") {
    val corpus = lowRank(400, 0)
    val b = lowRank(60, 200000)
    val qs = lowRank(20, 100000)
    val dir = java.nio.file.Files.createTempDirectory("pq-rerank-rot").toString + "/idx"
    IvfIndex.buildPqIndex(corpus, k = 8, iters = 2, m = 16, ksub = 16,
      pqIters = 2, dir, rotate = true, keepFloat = true)
    IvfIndex.appendPqVersion(spark, dir, b, 1L)
    // stored floats == assign of the ROTATED union under the frozen models
    val r = IvfIndex.loadRotation(spark, s"$dir/rot")
    val coarse = IvfIndex.loadModel(spark, s"$dir/model")
    def storedFloats() = graft.sources.PartitionedLayout.read(spark, s"$dir/cells")
      .filter(col("batch") <= IvfIndex.committedIngestVersion(spark, dir))
      .select("vec_id", "cell")
      .collect().map(x => (x.getLong(0), x.getInt(1))).toSet
    val want = IvfIndex.assign(
        IvfIndex.applyRotation(corpus.unionByName(b), r), coarse)
      .select("vec_id", "cell")
      .collect().map(x => (x.getLong(0), x.getInt(1))).toSet
    assert(storedFloats() === want, "float twin drifted from frozen-model assign of the union")
    // torn append: floats of the uncommitted batch are invisible to re-rank
    val b2 = lowRank(30, 300000)
    IvfIndex.appendPqVersion(spark, dir, b2, 2L)
    val fs = graft.streaming.VersionedState.fileSystem(spark, dir)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/ingest/v=2/_SUCCESS"), false)
    val seen = IvfIndex.searchPqIndex(spark, dir, qs, topK = 5, nprobe = 8,
      rerank = 50).collect().map(_.getLong(2)).toSet
    assert(!seen.exists(_ >= 300000L), "torn batch floats leaked into re-rank serving")
    IvfIndex.appendPqVersion(spark, dir, b2, 2L)
    // compaction folds BOTH layouts; committed float content unchanged
    val before = storedFloats()
    assert(IvfIndex.compactPqCodes(spark, dir) === 2)
    assert(storedFloats() === before)
    for (d <- Seq("codes", "cells"))
      assert(graft.sources.PartitionedLayout.read(spark, s"$dir/$d")
        .select(col("batch").cast("long")).distinct().count() === 1L,
        s"$d not folded to one batch")
    // re-rank scores through a ROTATED index are the raw-space cosine
    // exactly (orthonormal R, no centering): check against an independent
    // brute dot of the raw normalized vectors
    graft.functions.VectorFunctions.register(spark)
    def nrm(df: org.apache.spark.sql.DataFrame, id: String, vc: String) =
      df.select(col("vec_id").as(id),
        expr("transform(CAST(embedding AS array<double>), x -> x / " +
          "sqrt(graft_dot(CAST(embedding AS array<double>), CAST(embedding AS array<double>))))").as(vc))
    val rawCos = nrm(corpus.unionByName(b).unionByName(b2), "c_id", "cv")
      .crossJoin(nrm(qs, "q_id", "qv"))
      .withColumn("cos", expr("graft_dot(qv, cv)"))
      .select("q_id", "c_id", "cos")
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    val got = IvfIndex.searchPqIndex(spark, dir, qs, topK = 5, nprobe = 8,
      rerank = 50).collect()
    assert(got.nonEmpty)
    got.foreach { row =>
      val key = (row.getLong(0), row.getLong(2))
      assert(math.abs(row.getDouble(3) - rawCos(key)) < 1e-9,
        s"rotated re-rank score drifted from raw cosine at $key")
    }
  }

  test("pq: honest floor on the unclustered harness corpus (structure bet, documented)") {
    // the testdata embeddings are unclustered Gaussians — PQ's compression
    // has no residual structure to exploit, so recall is LOW by the nature
    // of the corpus (ANN_CURVE.json documents the same honest negative for
    // pca16). This pins the measured floor so a regression below it is a
    // code bug, not a data property.
    val emb = Tables(spark, sf, "embeddings")
    val corpus = emb.filter(col("vec_id") >= 10)
    val queries = emb.filter(col("vec_id") < 10)
    val dir = java.nio.file.Files.createTempDirectory("pq-real").toString + "/idx"
    IvfIndex.buildPqIndex(corpus, k = 8, iters = 3, m = 16, ksub = 16,
      pqIters = 3, dir)
    val exact = bruteTop5Rows(corpus, queries).groupBy(_._1)
      .map { case (q, rows) => q -> rows.map(_._3).toSet }
    val got = IvfIndex.searchPqIndex(spark, dir, queries, topK = 5, nprobe = 8)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }
    val recalls = exact.map { case (q, top) =>
      got.get(q).map(g => top.count(g.contains).toDouble / top.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    info(s"pq real-corpus recall@5 (nprobe=k): $mean")
    assert(mean >= 0.3, s"pq recall fell below the measured floor: $mean")
  }

  test("filtered search pushdown: selective allowlist broadcasts (plan-pinned); large allowlist takes the bloom prefilter with identical results") {
    graft.functions.VectorFunctions.register(spark)
    val model = IvfIndex.train(corpus, k = 8, iters = 3)
    val allowed = embeddings.filter(col("vec_id") >= 10 && col("label") === 3)
      .select("vec_id")
    // selective path: the EXPLICIT broadcast left-semi — a filtered
    // sub-frame carries a big size ESTIMATE, so relying on
    // autoBroadcastJoinThreshold would shuffle exactly the case this
    // pushdown exists for
    val small = IvfIndex.search(spark, corpus, queries, model, topK = 5,
      nprobe = 8, allowed = Some(allowed))
    val smallPlan = small.queryExecution.executedPlan.toString
    assert(smallPlan.contains("BroadcastHashJoin") && smallPlan.contains("LeftSemi"),
      s"selective allowlist did not broadcast:\n$smallPlan")
    assert(!smallPlan.contains("xxhash64"),
      "bloom prefilter appeared on the broadcast path")
    val want = small.select("q_id", "rn", "c_id").orderBy("q_id", "rn")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // force the large-allowlist path and pin EXACTNESS: bloom has no
    // false negatives and the trailing semi-join removes its false
    // positives, so the result must be identical row for row
    spark.conf.set("spark.graft.ivf.allowedBroadcastLimit", "1")
    try {
      val big = IvfIndex.search(spark, corpus, queries, model, topK = 5,
        nprobe = 8, allowed = Some(allowed))
      val bigPlan = big.queryExecution.executedPlan.toString
      assert(bigPlan.contains("xxhash64"),
        s"large allowlist did not take the bloom prefilter:\n$bigPlan")
      val got = big.select("q_id", "rn", "c_id").orderBy("q_id", "rn")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      assert(got === want,
        "bloom-prefiltered restriction drifted from the broadcast path")
    } finally spark.conf.unset("spark.graft.ivf.allowedBroadcastLimit")
  }

  /** The lossless-codebook fixture of the "ADC == brute force" pin: 16
    * distinct vectors each appearing 10x — Lloyd memorizes the points,
    * every residual IS a codeword, so [[IvfIndex.decodePq]] reconstructs
    * the normalized corpus to decimal(28,12) precision and quantization
    * vanishes as an error source. */
  private def losslessFixture = {
    import spark.implicits._
    val dims = 64
    val distinct16 = Array.tabulate(16, dims) { (i, d) =>
      var z = lcg(i * 97L + d * 31L + 5); z = lcg(z)
      (z >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    val c = (0 until 160).map(id =>
      (id.toLong, distinct16(id % 16).map(_.toFloat).toSeq)).toDF("vec_id", "embedding")
    val q = (0 until 4).map { i =>
      val v = Array.tabulate(dims) { d =>
        var z = lcg(900000L + i * 53L + d * 17L); z = lcg(z)
        (z >>> 11).toDouble / (1L << 53).toDouble - 0.5
      }
      ((1000 + i).toLong, v.map(_.toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    (c, q)
  }

  test("pq diversity: MMR over the PQ store equals the float pipeline in the lossless regime") {
    graft.functions.VectorFunctions.register(spark)
    val (c16, q4) = losslessFixture
    val dir = java.nio.file.Files.createTempDirectory("pq-mmr").toString + "/idx"
    IvfIndex.buildPqIndex(c16, k = 4, iters = 2, m = 8, ksub = 16,
      pqIters = 2, dir)
    val got = graft.queries.LlmOps.mmrRerankPq(spark, dir, q4,
        shortK = 10, k = 3, lambda = 0.7, nprobe = 4)
      .orderBy("q_id", "rn").collect().map(_.toSeq).toSeq
    // float twin: brute cosine shortlist + raw-vector sims -> mmrRerank
    val cos = "graft_dot(%s, %s) / sqrt(graft_dot(%s, %s) * graft_dot(%s, %s))"
    val e = c16.select(col("vec_id"), expr("CAST(embedding AS array<double>)").as("v"))
    val q = q4.select(col("vec_id").as("q_id"),
      expr("CAST(embedding AS array<double>)").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
    val cand = q.crossJoin(e.select(col("vec_id").as("c_id"), col("v").as("cv")))
      .withColumn("cos", expr(cos.format("qv", "cv", "qv", "qv", "cv", "cv")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select(col("q_id"), col("c_id"), round(col("cos"), 4).as("rel"))
    val cv2 = cand.join(e.select(col("vec_id").as("c_id"), col("v").as("ce")), "c_id")
      .select("q_id", "c_id", "ce")
    val sims = cv2.select(col("q_id"), col("c_id").as("a"), col("ce").as("va"))
      .join(cv2.select(col("q_id"), col("c_id").as("b"), col("ce").as("vb")), "q_id")
      .filter(col("a") =!= col("b"))
      .select(col("q_id"), col("a"), col("b"),
        round(expr(cos.format("va", "vb", "va", "va", "vb", "vb")), 4).as("sim"))
    val want = graft.queries.LlmOps.mmrRerank(cand, sims, k = 3, lambda = 0.7)
      .orderBy("q_id", "rn").collect().map(_.toSeq).toSeq
    assert(got === want,
      "PQ-store MMR drifted from the float pipeline in the exact regime")
    assert(got.nonEmpty && got.size == 4 * 3)
  }

  test("pq diversity: k-center over the PQ store equals the float sampler in the lossless regime") {
    val (c16, _) = losslessFixture
    val dir = java.nio.file.Files.createTempDirectory("pq-kcenter").toString + "/idx"
    IvfIndex.buildPqIndex(c16, k = 4, iters = 2, m = 8, ksub = 16,
      pqIters = 2, dir)
    val got = graft.queries.LlmOps.kCenterSamplePq(spark, dir, k = 4)
      .orderBy("rn").collect().map(_.toSeq).toSeq
    val want = graft.queries.LlmOps.kCenterSample(c16, k = 4)
      .orderBy("rn").collect().map(_.toSeq).toSeq
    assert(got === want,
      "PQ k-center drifted from the float sampler in the exact regime")
    assert(got.size == 4)
  }
}
