package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ml.AdaBoostMHClassifier
import dsl._

/** The reference's own capability surface (AdaBoost.MH, SURVEY §2.1 R1-R8)
  * re-expressed on the `embeddings` table. The SQL-expressible slices keep
  * every edge sum in INTEGER arithmetic (weights are uniform, so the factor
  * 1/(m*K) is applied once at the end) — argmax and vote signs are exact,
  * never float-noise-dependent.
  */
object MlQueries {

  val queries: Map[String, Q] = Map(

    // R1: one-vs-all +-1 label encoding.
    "q_ml_label_encode" -> ((s, d) => Tables(s, d, "embeddings")
      .select(col("vec_id"),
        expr("array_join(transform(sequence(0, 9), k -> CASE WHEN label = k THEN '1' ELSE '-1' END), ',')")
          .as("y"))
      .orderBy("vec_id")),

    // R2: uniform (example,label) weights, global mass check.
    "q_ml_weight_init" -> ((s, d) => Tables(s, d, "embeddings")
      .agg(count(lit(1)).as("m"))
      .select(col("m"), lit(10L).as("k"),
        round(lit(1.0) / (col("m") * 10), 10).as("w"),
        round(col("m") * 10 * (lit(1.0) / (col("m") * 10)), 6).as("total"))),

    // R3+R4 on one dimension: thresholds = distinct values of x0, best edge.
    // Sort-based prefix-sum search, O(m*K) + one window, instead of the
    // naive thresholds x points cross join (O(m*T*K) = 40M rows, 4.2s at
    // sf0.1): phi(x,theta) = +1 iff x > theta, so
    // edge_k(theta) = S_k - 2 * R_k(theta), with R_k the running sum of y_k
    // over distinct x ascending (x <= theta) and S_k the per-label total.
    // Integer arithmetic throughout — bit-identical to the cross-join form
    // (the DuckDB oracle keeps the naive shape as an independent witness).
    "q_ml_stump_search_1d" -> ((s, d) => {
      val e = Tables(s, d, "embeddings")
        .select(col("embedding").getItem(0).cast("double").as("x"), col("label"))
      val mdf = e.agg(count(lit(1)).as("m"))
      val byX = e
        .withColumn("k", explode(sequence(lit(0), lit(9))))
        .withColumn("y", when(col("label") === col("k"), 1).otherwise(-1))
        .groupBy("x", "k").agg(sum("y").as("cy"))
      val wRun = Window.partitionBy("k").orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("k")
      val edges = byX
        .withColumn("edge", sum("cy").over(wAll) - lit(2) * sum("cy").over(wRun))
        .select(col("x").as("theta"), col("k"), col("edge"))
      val stumps = edges.groupBy("theta").agg(
        sum(abs(col("edge"))).as("gi"),
        array_join(transform(
          sort_array(collect_list(struct(col("k"), col("edge")))),
          x => when(x.getField("edge") >= 0, "+").otherwise("-")), "").as("votes"))
      stumps.orderBy(col("gi").desc, col("theta")).limit(1)
        .crossJoin(mdf)
        .select(round(col("theta"), 6).as("theta"), col("gi"),
          round(col("gi").cast("double") / (col("m") * 10), 6).as("gamma"),
          round(lit(0.5) * log(
            (lit(1.0) + col("gi").cast("double") / (col("m") * 10)) /
              (lit(1.0) - col("gi").cast("double") / (col("m") * 10))), 6).as("alpha"),
          col("votes"))
    }),

    // R4 over all 64 dims with 15 equi-width binned thresholds per dim —
    // the oracle-matching twin of AdaBoostMH.histogramPass's single-pass plan.
    "q_ml_stump_best" -> ((s, d) => {
      // Binned-suffix-sum search. The naive plan materializes
      // points × dims × thetas × labels (m·64·150 rows — 19M at sf0.1,
      // 2.5s, and linearly worse with every label/threshold added); here each
      // (point, dim) row gets bin(j,x) = Σ_b 1[x > θ_b] — the SAME 15
      // float comparisons the naive plan makes, so bin assignment cannot
      // diverge from the oracle's per-theta signs — and everything after
      // is INTEGER suffix-sum identities on the tiny (j, bin, label) cube:
      //   S_{>b,k} = 2·C_{>b,k} − N_{>b}
      //   edge(j,θ_b,k) = S_{>b,k} − S_{≤b,k}
      //                 = 4·C_{>b,k} − 2·N_{>b} − 2·C_{tot,k} + N_tot .
      // The big pass shrinks to m·64·15 bin indicators (10× fewer rows,
      // label-count-independent); the DuckDB oracle keeps the naive shape
      // as an independent witness of the algebra.
      val ex = Tables(s, d, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("j", "xf")))
        .select(col("label"), col("j"), col("xf").cast("double").as("x"))
      val mdf = Tables(s, d, "embeddings").agg(count(lit(1)).as("m"))
      val grid = ex.groupBy("j").agg(min("x").as("lo"), max("x").as("hi"))
        .select(col("j"), explode(sequence(lit(1), lit(15))).as("b"), col("lo"), col("hi"))
        .select(col("j"), col("b"), (col("lo") + col("b") * (col("hi") - col("lo")) / 16).as("theta"))
      // collapse identical (j, x, label) first: bins depend only on (j, x)
      val pts = ex.groupBy("j", "x", "label").agg(count(lit(1)).as("cnt"))
      val binned = pts.join(broadcast(grid.select("j", "theta")), "j")
        .groupBy("j", "x", "label", "cnt")
        .agg(sum(when(col("x") > col("theta"), 1).otherwise(0)).as("bin"))
      val cells = binned.groupBy("j", "bin", "label").agg(sum("cnt").as("c"))
      // dense (j, bin 0..15, k 0..9) lattice; x > theta_b  <=>  bin >= b
      val binsK = grid.select("j").distinct()
        .withColumn("bin", explode(sequence(lit(0), lit(15))))
        .withColumn("k", explode(sequence(lit(0), lit(9))))
      val ckd = binsK
        .join(cells.withColumnRenamed("label", "k"), Seq("j", "bin", "k"), "left_outer")
        .na.fill(0L, Seq("c"))
      val wSufK = Window.partitionBy("j", "k").orderBy(col("bin").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val suf = ckd.withColumn("cgt", sum("c").over(wSufK)) // C_{bin>=b, k}
      // N_{bin>=b} and C_{tot,k} both FOLLOW from the suffix cube instead
      // of needing their own aggregation branches over `cells` (guide
      // §1.2 step 1 — r16 built a second dense lattice + its own suffix
      // window for N and a third aggregation for C_tot, ~4 extra
      // exchanges on the plan's critical path):
      //   N_{bin>=b}(j) = Σ_k C_{bin>=b,k}(j)   — one aggregate of suf;
      //   C_{tot,k}(j)  = C_{bin>=0,k}(j)       — the bin = 0 slice.
      // Identical integers by the definitions (full-oracle-pinned).
      val ngt = suf.groupBy("j", "bin").agg(sum("cgt").as("ngt"))
      val ctot = suf.filter(col("bin") === 0)
        .select(col("j"), col("k"), col("cgt").as("ctot"))
      // edge(j, theta_b, k) = 4·C_gt − 2·N_gt − 2·C_tot + m   (all integers)
      val edges = grid.withColumn("k", explode(sequence(lit(0), lit(9))))
        .join(suf.select(col("j"), col("bin").as("b"), col("k"), col("cgt")),
          Seq("j", "b", "k"))
        .join(ngt.select(col("j"), col("bin").as("b"), col("ngt")), Seq("j", "b"))
        .join(ctot, Seq("j", "k"))
        .crossJoin(broadcast(mdf))
        .withColumn("edge",
          lit(4) * col("cgt") - lit(2) * col("ngt") - lit(2) * col("ctot") + col("m"))
        // a constant dimension (hi == lo) collapses all 15 thetas to the
        // same value; the oracle's GROUP BY (j, theta, k) then SUMS the
        // duplicate-theta contributions into ONE row per k. Mirror that
        // pre-aggregation or votes would collect 150 entries for such dims.
        .groupBy("j", "theta", "k").agg(sum("edge").as("edge"))
      val stumps = edges.groupBy("j", "theta").agg(
        sum(abs(col("edge"))).as("gi"),
        array_join(transform(
          sort_array(collect_list(struct(col("k"), col("edge")))),
          x => when(x.getField("edge") >= 0, "+").otherwise("-")), "").as("votes"))
      stumps.orderBy(col("gi").desc, col("j"), col("theta")).limit(1)
        .crossJoin(broadcast(mdf))
        .select(col("j").cast("long").as("j"), round(col("theta"), 6).as("theta"), col("gi"),
          round(col("gi").cast("double") / (col("m") * 10), 6).as("gamma"),
          col("votes"))
    }),

    // R5-R8: full boosting loop (T=10) + distributed prediction. Iterative,
    // not SQL-expressible — correctness via AdaBoostMHSuite invariants
    // (FIXTURES §3 goldens + loss-decrease property).
    "q_ml_boost_train_predict" -> ((s, d) => {
      val emb = Tables(s, d, "embeddings")
      val model = new AdaBoostMHClassifier().setNumRounds(10).fit(emb)
      model.transform(emb)
        .select(col("vec_id"), col("pred_label").cast("long").as("pred_label"))
        .orderBy("vec_id")
    }),

    // LINEAR PROBE (ml.LinearProbe): closed-form one-vs-rest ridge on the
    // 80% train split, holdout confusion on the 20% — the standard
    // embedding-quality diagnostic, and the non-iterative ML
    // counterweight to boosting (normal equations: ONE aggregation pass
    // for the Gram + per-class moments, driver-side 65x65 solve, codegen'd
    // argmax scoring). Matrix solve is not SQL-expressible -> rows-only;
    // LinearProbeSuite pins above-chance holdout accuracy, exact-recovery
    // on a synthetic linear task, and determinism across partitionings.
    "q_ml_linear_probe" -> ((s, d) => {
      val emb = Tables(s, d, "embeddings")
      val model = graft.ml.LinearProbe.fit(emb.filter(col("vec_id") % 5 =!= 0))
      graft.ml.LinearProbe.predict(emb.filter(col("vec_id") % 5 === 0), model)
        .groupBy(col("label"), col("pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy("label", "pred")
    }),

    // PCA (ml.Pca): one-pass graft_gram covariance -> driver Jacobi eigen
    // -> codegen'd whitened 2D projection — the decorrelation step a
    // training pipeline runs before ANN indexing. Iterative eigensolve is
    // not SQL-expressible -> rows-only; PcaSuite pins planted-axis
    // recovery, orthonormality, eigenvalue==projection-variance,
    // whitening, and partition-exact models.
    "q_vec_pca" -> ((s, d) => {
      val emb = Tables(s, d, "embeddings")
      val model = graft.ml.Pca.fit(emb, k = 2)
      graft.ml.Pca.transform(emb, model, whiten = true)
        .select(col("vec_id"), round(expr("proj[0]"), 6).as("p0"),
          round(expr("proj[1]"), 6).as("p1"))
        .orderBy("vec_id")
    }),

    // MATRIX-FREE PCA (ml.Pca.fitMatFree): the d >= ~4k scale path —
    // block subspace iteration where each step is ONE distributed
    // graft_matvec pass (functions.MatVecAgg) and the d² covariance
    // never exists anywhere, driver OR executor. Gated beside q_vec_pca
    // so the wide-embedding solver runs under the driver's eye;
    // rows-only (iterative eigensolve, like q_vec_pca) — PcaSuite pins
    // Jacobi agreement on a decaying spectrum, Ritz interlacing on this
    // corpus, and partition-exact model bytes.
    "q_vec_pca_matfree" -> ((s, d) => {
      val emb = Tables(s, d, "embeddings")
      val model = graft.ml.Pca.fitMatFree(emb, k = 2, powerIters = 2)
      graft.ml.Pca.transform(emb, model, whiten = true)
        .select(col("vec_id"), round(expr("proj[0]"), 6).as("p0"),
          round(expr("proj[1]"), 6).as("p1"))
        .orderBy("vec_id")
    }),

    // R8: Hamming loss of the trivial hypothesis sign(x0) applied to every
    // label, against one-vs-all encoding.
    "q_ml_hamming_eval" -> ((s, d) => Tables(s, d, "embeddings")
      .select(col("label"),
        when(col("embedding").getItem(0) > 0, 1).otherwise(-1).as("p"))
      .withColumn("k", explode(sequence(lit(0), lit(9))))
      .withColumn("y", when(col("label") === col("k"), 1).otherwise(-1))
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(when(col("p") =!= col("y"), 1).otherwise(0)).cast("double") /
          count(lit(1)), 6).as("hamming"))),
  )

  val oracles: Map[String, String] = Map(
    "q_ml_label_encode" ->
      """SELECT vec_id,
        |  array_to_string(list_transform(generate_series(0, 9),
        |    k -> CASE WHEN label = k THEN '1' ELSE '-1' END), ',') AS y
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_ml_weight_init" ->
      """SELECT m, CAST(10 AS BIGINT) AS k,
        |  ROUND(CAST(1.0 AS DOUBLE) / (m * 10), 10) AS w,
        |  ROUND(m * 10 * (CAST(1.0 AS DOUBLE) / (m * 10)), 6) AS total
        |FROM (SELECT count(*) AS m FROM embeddings)""".stripMargin,

    "q_ml_stump_search_1d" ->
      """WITH e AS (SELECT CAST(embedding[1] AS DOUBLE) AS x, label FROM embeddings),
        |m AS (SELECT count(*) AS m FROM e),
        |th AS (SELECT DISTINCT x AS theta FROM e),
        |edges AS (
        |  SELECT theta, k,
        |    SUM((CASE WHEN label = k THEN 1 ELSE -1 END)
        |      * (CASE WHEN x > theta THEN 1 ELSE -1 END)) AS edge
        |  FROM e CROSS JOIN th CROSS JOIN UNNEST(generate_series(0, 9)) AS t(k)
        |  GROUP BY 1, 2),
        |st AS (
        |  SELECT theta, CAST(SUM(abs(edge)) AS BIGINT) AS gi,
        |         string_agg(CASE WHEN edge >= 0 THEN '+' ELSE '-' END, '' ORDER BY k) AS votes
        |  FROM edges GROUP BY 1)
        |SELECT ROUND(theta, 6) AS theta, gi,
        |  ROUND(CAST(gi AS DOUBLE) / (m * 10), 6) AS gamma,
        |  ROUND(0.5 * ln((1 + CAST(gi AS DOUBLE) / (m * 10))
        |               / (1 - CAST(gi AS DOUBLE) / (m * 10))), 6) AS alpha,
        |  votes
        |FROM st, m ORDER BY gi DESC, theta LIMIT 1""".stripMargin,

    "q_ml_stump_best" ->
      """WITH ex AS (
        |  SELECT label, i - 1 AS j, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings, UNNEST(generate_series(1, 64)) AS t(i)),
        |m AS (SELECT count(*) AS m FROM embeddings),
        |grid AS (
        |  SELECT j, lo + b * (hi - lo) / 16 AS theta
        |  FROM (SELECT j, min(x) AS lo, max(x) AS hi FROM ex GROUP BY 1),
        |       UNNEST(generate_series(1, 15)) AS tb(b)),
        |edges AS (
        |  SELECT ex.j, theta, k,
        |    SUM((CASE WHEN label = k THEN 1 ELSE -1 END)
        |      * (CASE WHEN x > theta THEN 1 ELSE -1 END)) AS edge
        |  FROM ex JOIN grid ON ex.j = grid.j
        |  CROSS JOIN UNNEST(generate_series(0, 9)) AS tk(k)
        |  GROUP BY 1, 2, 3),
        |st AS (
        |  SELECT j, theta, CAST(SUM(abs(edge)) AS BIGINT) AS gi,
        |         string_agg(CASE WHEN edge >= 0 THEN '+' ELSE '-' END, '' ORDER BY k) AS votes
        |  FROM edges GROUP BY 1, 2)
        |SELECT CAST(j AS BIGINT) AS j, ROUND(theta, 6) AS theta, gi,
        |  ROUND(CAST(gi AS DOUBLE) / (m * 10), 6) AS gamma, votes
        |FROM st, m ORDER BY gi DESC, j, theta LIMIT 1""".stripMargin,

    "q_ml_hamming_eval" ->
      """SELECT count(*) AS n_pairs,
        |  ROUND(CAST(SUM(CASE WHEN p != y THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS hamming
        |FROM (
        |  SELECT CASE WHEN embedding[1] > 0 THEN 1 ELSE -1 END AS p,
        |         CASE WHEN label = k THEN 1 ELSE -1 END AS y
        |  FROM embeddings CROSS JOIN UNNEST(generate_series(0, 9)) AS t(k))""".stripMargin,
  )
}
