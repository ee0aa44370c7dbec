package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedException, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, FunctionTableSubqueryArgumentExpression, Literal, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Pure-SQL access to the whole-operator surface (VERDICT r5 item 5): the
  * Scala APIs `GroupLimits.topKPerKey` and `AsOfJoin.asofBackward` become
  * table-valued functions, so a SQL-only consumer can run
  *
  *   SELECT * FROM graft_topk_per_key(TABLE(SELECT ...), 'k', 'v DESC, id', 3)
  *   SELECT * FROM graft_asof_backward(TABLE(l), TABLE(r), 'user_id', 'ts', 'ts', 'event_id')
  *
  * Both accept either `TABLE(...)` arguments (any subquery) or a plain
  * string with a table/view name. Installed by GraftExtensions via
  * injectTableFunction (+ one resolution rule for the as-of, whose plan
  * construction needs resolved child schemas).
  */
object SqlSurface {

  /** A table argument: TABLE(...) subquery or a 'name' string literal. The
    * string form goes through the real SQL identifier parser (ADVICE r6:
    * a naive '.'-split mis-resolved quoted names like `` `my.view` `` as
    * two-part identifiers), so backticks and dotted parts behave exactly
    * as they would in a FROM clause. */
  private def tableArg(fn: String, pos: String, e: Expression): LogicalPlan = e match {
    case f: FunctionTableSubqueryArgumentExpression => f.plan
    case Literal(s: UTF8String, StringType) =>
      UnresolvedRelation(
        org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseMultipartIdentifier(s.toString))
    case other => throw new IllegalArgumentException(
      s"$fn: $pos argument must be TABLE(...) or a table-name string, got $other")
  }

  private def strLit(fn: String, name: String, e: Expression): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $name must be a string literal, got $other")
  }

  private def intLit(fn: String, name: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $name must be an integer literal, got $other")
  }

  /** A fractional literal: SQL `0.85` parses as an exact DECIMAL literal
    * (Spark's default for decimal-point numerics), `0.85D` as DOUBLE —
    * accept both so callers don't need the D suffix. */
  private def dblLit(fn: String, name: String, e: Expression): Double = e match {
    case Literal(v: Double, org.apache.spark.sql.types.DoubleType) => v
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: Int, IntegerType) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn: $name must be a numeric literal, got $other")
  }

  /** 'price DESC, id' -> SortOrder seq over unresolved attributes (plain
    * column names with optional ASC/DESC — the window-clause subset; for
    * arbitrary sort EXPRESSIONS use the Scala API). */
  private def parseOrder(fn: String, spec: String): Seq[SortOrder] =
    spec.split(',').map(_.trim).filter(_.nonEmpty).map { item =>
      val parts = item.split("\\s+")
      val dir = parts.length match {
        case 1 => Ascending
        case 2 => parts(1).toUpperCase match {
          case "ASC" => Ascending
          case "DESC" => Descending
          case other => throw new IllegalArgumentException(
            s"$fn: expected ASC or DESC in order spec, got '$other'")
        }
        case _ => throw new IllegalArgumentException(
          s"$fn: order spec entries are 'column [ASC|DESC]', got '$item'")
      }
      SortOrder(UnresolvedAttribute.quotedString(parts(0)), dir)
    }.toSeq

  /** graft_topk_per_key(table, 'k1,k2', 'v DESC, id', k[, with_ties]).
    * Builds the TopKPerKey logical node directly — the analyzer resolves
    * the key/order attributes against the child like any operator's, and
    * the planner strategy (already injected) picks the heap exec. */
  def topKPerKeyBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_topk_per_key"
    require(exprs.size == 4 || exprs.size == 5,
      s"$fn(table, keys, order, k[, with_ties]) takes 4-5 args, got ${exprs.size}")
    val child = tableArg(fn, "first", exprs.head)
    val keys = strLit(fn, "keys", exprs(1)).split(',').map(_.trim)
      .filter(_.nonEmpty).toSeq
      .map(n => UnresolvedAttribute.quotedString(n): Expression)
    require(keys.nonEmpty, s"$fn: keys must name at least one column")
    val order = parseOrder(fn, strLit(fn, "order", exprs(2)))
    require(order.nonEmpty, s"$fn: order must name at least one column")
    val k = intLit(fn, "k", exprs(3))
    val withTies = exprs.lift(4).map {
      case Literal(b: Boolean, org.apache.spark.sql.types.BooleanType) => b
      case other => throw new IllegalArgumentException(
        s"$fn: with_ties must be a boolean literal, got $other")
    }.getOrElse(false)
    TopKPerKey(keys, order, k, withTies, child)
  }

  /** graft_asof_backward(left, right, 'key', 'left_ts', 'right_ts',
    * 'right_tiebreak') -> placeholder node; [[ResolveAsOfBackward]]
    * expands it once both children's schemas are known. */
  def asofBackwardBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_asof_backward"
    require(exprs.size == 6,
      s"$fn(left, right, key, left_ts, right_ts, right_tiebreak) takes 6 args, got ${exprs.size}")
    AsOfBackwardPlaceholder(
      tableArg(fn, "first", exprs.head), tableArg(fn, "second", exprs(1)),
      strLit(fn, "key", exprs(2)), strLit(fn, "left_ts", exprs(3)),
      strLit(fn, "right_ts", exprs(4)), strLit(fn, "right_tiebreak", exprs(5)))
  }

  /** graft_dedup_against('path', TABLE(new_docs)) — near-dup pairs of the
    * new batch against the persisted DedupIndex at `path` (plus pairs
    * within the batch), VERDICT r6 item 5: SQL-only consumers reach the
    * index-backed operators. Placeholder + resolution rule for the same
    * reason as the as-of: the Scala operator builds its plan from a
    * resolved child, so SQL and Scala stay ONE code path. */
  def dedupAgainstBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_dedup_against"
    require(exprs.size == 2,
      s"$fn(path, new_docs) takes 2 args (index path string, TABLE(...) of doc_id/text), got ${exprs.size}")
    DedupAgainstPlaceholder(strLit(fn, "path", exprs.head),
      tableArg(fn, "second", exprs(1)))
  }

  /** graft_ivf_search('path', TABLE(queries), k, nprobe[, TABLE(allowed)])
    * — ANN top-k per query vector against the persisted IVF index at
    * `path`. The optional 5th TABLE restricts candidates to its vec_ids
    * (FILTERED vector search — top-k AFTER the restriction). */
  def ivfSearchBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_ivf_search"
    require(exprs.size == 4 || exprs.size == 5,
      s"$fn(path, queries, k, nprobe[, allowed]) takes 4-5 args (index path string, TABLE(...) of vec_id/embedding, int k, int nprobe, optional TABLE(...) allowlist of vec_id), got ${exprs.size}")
    IvfSearchPlaceholder(strLit(fn, "path", exprs.head),
      tableArg(fn, "second", exprs(1)),
      intLit(fn, "k", exprs(2)), intLit(fn, "nprobe", exprs(3)),
      if (exprs.size == 5) Some(tableArg(fn, "fifth", exprs(4))) else None)
  }

  /** graft_pq_search('path', TABLE(queries), k, nprobe[, rerank]) — ADC
    * top-k per query against the persisted IVF-PQ index at `path`
    * (codes-only store, [[graft.ml.IvfIndex.searchPqIndex]]): the
    * compressed serving rung is SQL-reachable like every other index
    * family. `rerank = R > 0` adds the exact float second tier (needs a
    * keepFloat build — see searchPqIndex). */
  def pqSearchBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_pq_search"
    require(exprs.size == 4 || exprs.size == 5,
      s"$fn(path, queries, k, nprobe[, rerank]) takes 4-5 args (index path string, TABLE(...) of vec_id/embedding, int k, int nprobe, optional int rerank), got ${exprs.size}")
    PqSearchPlaceholder(strLit(fn, "path", exprs.head),
      tableArg(fn, "second", exprs(1)),
      intLit(fn, "k", exprs(2)), intLit(fn, "nprobe", exprs(3)),
      if (exprs.size == 5) intLit(fn, "rerank", exprs(4)) else 0)
  }

  /** graft_ivf_staleness('path') — the IVF drift report as one SQL row
    * (vectors_at_build, vectors_now, mean_sq_dist_build,
    * mean_sq_dist_now, ratio): the weekly retrain alarm is queryable
    * where the pipelines live. */
  def ivfStalenessBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_ivf_staleness"
    require(exprs.size == 1,
      s"$fn(path) takes 1 arg (index path string), got ${exprs.size}")
    IvfStalenessPlaceholder(strLit(fn, "path", exprs.head))
  }

  /** graft_pca_staleness('modelPath', TABLE(emb)) — captured-variance
    * fraction of a corpus under a persisted frozen projection
    * ([[graft.ml.Pca.staleness]]) as one SQL row. */
  def pcaStalenessBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_pca_staleness"
    require(exprs.size == 2,
      s"$fn(modelPath, emb) takes 2 args (model path string, TABLE(...) with an embedding column), got ${exprs.size}")
    PcaStalenessPlaceholder(strLit(fn, "modelPath", exprs.head),
      tableArg(fn, "second", exprs(1)))
  }

  /** graft_probe_staleness('modelPath', TABLE(docs)) — the frozen wide
    * quality probe's drift gauge ([[graft.queries.LlmOps
    * .qualityProbeWideStaleness]]: standardized score-mean displacement
    * vs the freeze-time capture) as one SQL row — the retrain alarm
    * queryable where the pipelines live, completing the staleness
    * triple (IVF, PCA, probe). */
  def probeStalenessBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_probe_staleness"
    require(exprs.size == 2,
      s"$fn(modelPath, docs) takes 2 args (model path string, TABLE(...) with doc_id/text), got ${exprs.size}")
    ProbeStalenessPlaceholder(strLit(fn, "modelPath", exprs.head),
      tableArg(fn, "second", exprs(1)))
  }

  /** graft_knn_search(graph, corpus, queries, k[, beam, rounds]) — graph-
    * ANN beam search over a prebuilt KnnGraph.build graph: completes SQL
    * access across all three index families (dedup, IVF, graph). `graph`
    * is (id, nbr, sim); corpus/queries are (vec_id, embedding). beam=0
    * means the operator default (3k). */
  def knnSearchBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_knn_search"
    require(exprs.size >= 4 && exprs.size <= 6,
      s"$fn(graph, corpus, queries, k[, beam, rounds]) takes 4-6 args, got ${exprs.size}")
    KnnSearchPlaceholder(
      tableArg(fn, "first", exprs.head), tableArg(fn, "second", exprs(1)),
      tableArg(fn, "third", exprs(2)), intLit(fn, "k", exprs(3)),
      exprs.lift(4).map(intLit(fn, "beam", _)).getOrElse(0),
      exprs.lift(5).map(intLit(fn, "rounds", _)).getOrElse(2))
  }

  /** graft_mmr(cands, sims, k[, lambda]) — maximal-marginal-relevance
    * diversity re-rank ([[graft.queries.LlmOps.mmrRerank]]) over
    * per-query shortlists: `cands` is (q_id, c_id, rel), `sims` is
    * (q_id, a, b, sim) pairwise among each query's candidates. Default
    * λ = 0.7. Returns (q_id, rn, c_id, mmr). */
  def mmrBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_mmr"
    require(exprs.size == 3 || exprs.size == 4,
      s"$fn(cands, sims, k[, lambda]) takes 3-4 args (TABLE(...) of q_id/c_id/rel, TABLE(...) of q_id/a/b/sim, int k, optional double lambda), got ${exprs.size}")
    MmrPlaceholder(
      tableArg(fn, "first", exprs.head), tableArg(fn, "second", exprs(1)),
      intLit(fn, "k", exprs(2)),
      exprs.lift(3).map(dblLit(fn, "lambda", _)).getOrElse(0.7))
  }

  /** graft_domain_cap(docs, cap[, blocked_csv]) — RefinedWeb-style
    * per-domain cap ([[graft.queries.LlmOps.domainCap]]) over a
    * (doc_id, text, source) table: blocklist anti-filter, then at most
    * `cap` docs per source by quality. `blocked_csv` is a
    * comma-separated source blocklist. Returns (doc_id, source,
    * quality). */
  def domainCapBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_domain_cap"
    require(exprs.size == 2 || exprs.size == 3,
      s"$fn(docs, cap[, blocked_csv]) takes 2-3 args (TABLE(...) of doc_id/text/source, int cap, optional string blocklist), got ${exprs.size}")
    DomainCapPlaceholder(tableArg(fn, "first", exprs.head),
      intLit(fn, "cap", exprs(1)),
      exprs.lift(2).map(strLit(fn, "blocked_csv", _)).getOrElse(""))
  }

  /** graft_domain_cap_url(docs, cap[, blocked_csv]) — the URL-native
    * per-domain cap ([[graft.queries.LlmOps.domainCapUrl]]) over a
    * (doc_id, url, text) table: at most `cap` docs per REGISTRABLE
    * DOMAIN (eTLD+1 of the url's host) by quality. `blocked_csv` is a
    * comma-separated registrable-domain blocklist. Returns
    * (doc_id, domain, quality). */
  def domainCapUrlBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_domain_cap_url"
    require(exprs.size == 2 || exprs.size == 3,
      s"$fn(docs, cap[, blocked_csv]) takes 2-3 args (TABLE(...) of doc_id/url/text, int cap, optional string blocklist), got ${exprs.size}")
    DomainCapUrlPlaceholder(tableArg(fn, "first", exprs.head),
      intLit(fn, "cap", exprs(1)),
      exprs.lift(2).map(strLit(fn, "blocked_csv", _)).getOrElse(""))
  }

  /** graft_registrable_domain(urls) — eTLD+1 extraction
    * ([[graft.queries.LlmOps.registrableDomain]]) over a table with a
    * `url` column. Returns (url, host, domain), one row per input row. */
  def registrableDomainBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_registrable_domain"
    require(exprs.size == 1,
      s"$fn(urls) takes 1 arg (TABLE(...) with a url column), got ${exprs.size}")
    RegistrableDomainPlaceholder(tableArg(fn, "first", exprs.head))
  }

  /** graft_frontier_batches(links, per_batch) — crawl politeness
    * batching ([[graft.queries.LlmOps.frontierBatches]]) over a table
    * with a `canon` column: unique canonical links dealt into crawl
    * batches with at most `per_batch` links per registrable domain.
    * Returns (canon, domain, batch, slot). */
  def frontierBatchesBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_frontier_batches"
    require(exprs.size == 2,
      s"$fn(links, per_batch) takes 2 args (TABLE(...) with a canon column, int per_batch), got ${exprs.size}")
    FrontierBatchesPlaceholder(tableArg(fn, "first", exprs.head),
      intLit(fn, "per_batch", exprs(1)))
  }

  /** graft_bpe(docs, merges) — BPE merge training
    * ([[graft.queries.LlmOps.bpeTrain]], Sennrich et al. 2016) over a
    * (doc_id, text) table. Returns the learned merge table
    * (rank, a, b, cnt). */
  def bpeBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_bpe"
    require(exprs.size == 2,
      s"$fn(docs, merges) takes 2 args (TABLE(...) of doc_id/text, int merges), got ${exprs.size}")
    BpePlaceholder(tableArg(fn, "first", exprs.head),
      intLit(fn, "merges", exprs(1)))
  }

  /** graft_quality_probe(docs[, threshold[, holdout_mod]]) — the
    * trainable quality gate ([[graft.queries.LlmOps.qualityProbe]]):
    * hashed-TF features + closed-form ridge probe on deterministic weak
    * labels over a (doc_id, text) table. Returns
    * (doc_id, weak_label, pred, margin). */
  def qualityProbeBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_quality_probe"
    require(exprs.size >= 1 && exprs.size <= 3,
      s"$fn(docs[, threshold[, holdout_mod]]) takes 1-3 args (TABLE(...) of doc_id/text, optional double threshold, optional int holdout_mod), got ${exprs.size}")
    QualityProbePlaceholder(tableArg(fn, "first", exprs.head),
      exprs.lift(1).map(dblLit(fn, "threshold", _)).getOrElse(0.3),
      exprs.lift(2).map(intLit(fn, "holdout_mod", _)).getOrElse(5))
  }

  /** graft_quality_probe_wide(docs[, threshold[, holdout_mod[, buckets]]])
    * — the WIDE (fastText-capacity) trainable quality gate
    * ([[graft.queries.LlmOps.qualityProbeWide]]): 2^18-bucket sparse
    * hashed-TF + matrix-free CG ridge over a (doc_id, text) table.
    * Returns (doc_id, weak_label, pred, score, margin, confidence). */
  def qualityProbeWideBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_quality_probe_wide"
    require(exprs.size >= 1 && exprs.size <= 4,
      s"$fn(docs[, threshold[, holdout_mod[, buckets]]]) takes 1-4 args (TABLE(...) of doc_id/text, optional double threshold, optional int holdout_mod, optional int buckets), got ${exprs.size}")
    QualityProbeWidePlaceholder(tableArg(fn, "first", exprs.head),
      exprs.lift(1).map(dblLit(fn, "threshold", _)).getOrElse(0.3),
      exprs.lift(2).map(intLit(fn, "holdout_mod", _)).getOrElse(5),
      exprs.lift(3).map(intLit(fn, "buckets", _)).getOrElse(1 << 18))
  }

  /** graft_shard_assign(docs, num_shards[, order_buckets]) — the
    * deterministic shard assigner ([[graft.queries.LlmOps
    * .shardAssignment]]): seeded pseudo-shuffle order + exactly balanced
    * contiguous shards over a (doc_id, ...) table. Returns
    * (doc_id, shard, pos_in_shard). */
  def shardAssignBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_shard_assign"
    require(exprs.size == 2 || exprs.size == 3,
      s"$fn(docs, num_shards[, order_buckets]) takes 2-3 args (TABLE(...) of doc_id, int num_shards, optional int order_buckets), got ${exprs.size}")
    ShardAssignPlaceholder(tableArg(fn, "first", exprs.head),
      intLit(fn, "num_shards", exprs(1)),
      exprs.lift(2).map(intLit(fn, "order_buckets", _)).getOrElse(64))
  }

  /** graft_fuzzy_contamination(train, eval[, threshold]) — fuzzy eval
    * decontamination ([[graft.queries.LlmOps.fuzzyContamination]]):
    * train docs containing >= threshold (default 0.3) of any eval doc's
    * 5-gram shingles. Both tables are (doc_id, text). Returns
    * (doc_id, n_eval_matches, max_containment, first_eval_doc). */
  def fuzzyContaminationBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_fuzzy_contamination"
    require(exprs.size == 2 || exprs.size == 3,
      s"$fn(train, eval[, threshold]) takes 2-3 args (two TABLE(...) of doc_id/text, optional double threshold), got ${exprs.size}")
    FuzzyContaminationPlaceholder(
      tableArg(fn, "first", exprs.head), tableArg(fn, "second", exprs(1)),
      exprs.lift(2).map(dblLit(fn, "threshold", _)).getOrElse(0.3))
  }

  /** graft_semantic_dedup(emb, centroids, tau) — SemDeDup
    * ([[graft.queries.LlmOps.semanticDedup]], Abbas et al. 2023):
    * cluster-scoped embedding dedup keeping the lowest-centroid-cos
    * member per near-dup group. `emb` is (vec_id, v: array<double>),
    * `centroids` is (cent_id, centv: array<double>). Returns
    * (vec_id, cent_id, cent_cos, dup_group, keep). */
  def semanticDedupBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_semantic_dedup"
    require(exprs.size == 3,
      s"$fn(emb, centroids, tau) takes 3 args (TABLE(...) of vec_id/v, TABLE(...) of cent_id/centv, double tau), got ${exprs.size}")
    SemanticDedupPlaceholder(
      tableArg(fn, "first", exprs.head), tableArg(fn, "second", exprs(1)),
      dblLit(fn, "tau", exprs(2)))
  }

  /** graft_kcenter(emb, k) — greedy k-center diverse sampling
    * ([[graft.queries.LlmOps.kCenterSample]]) over a (vec_id, embedding)
    * table: k maximally-spread representatives, lowest-id seed. Returns
    * (rn, vec_id, mind). */
  def kCenterBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_kcenter"
    require(exprs.size == 2,
      s"$fn(emb, k) takes 2 args (TABLE(...) of vec_id/embedding, int k), got ${exprs.size}")
    KCenterPlaceholder(tableArg(fn, "first", exprs.head), intLit(fn, "k", exprs(1)))
  }

  /** graft_pagerank(nodes, edges, iters[, damping]) — damped power-
    * iteration PageRank over a DIRECTED edge table: completes SQL access
    * for the graph-analytics family (degree and triangles are plain SQL;
    * PageRank's iterated rounds are not). `nodes` is (id) — one row per
    * node, including isolated ones; `edges` is (src, dst); symmetrize
    * first for an undirected graph. Returns (id, rank) summing to ~1. */
  def pageRankBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_pagerank"
    require(exprs.size == 3 || exprs.size == 4,
      s"$fn(nodes, edges, iters[, damping]) takes 3-4 args, got ${exprs.size}")
    PageRankPlaceholder(
      tableArg(fn, "first", exprs.head), tableArg(fn, "second", exprs(1)),
      intLit(fn, "iters", exprs(2)),
      exprs.lift(3).map(dblLit(fn, "damping", _)).getOrElse(0.85))
  }

  /** graft_connected_components(edges) — components of an undirected
    * (u, v) edge table via alternating large-star/small-star rewriting
    * (O(log n) rounds regardless of diameter). Returns (u, label) for
    * every node appearing in an edge, label = component minimum;
    * left-join + coalesce to cover isolated nodes. */
  def connectedComponentsBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_connected_components"
    require(exprs.size == 1,
      s"$fn(edges) takes 1 arg (TABLE(...) of u/v), got ${exprs.size}")
    ConnectedComponentsPlaceholder(tableArg(fn, "first", exprs.head))
  }

  /** A long-or-int literal (slot widths in microseconds exceed Int). */
  private def lngLit(fn: String, name: String, e: Expression): Long = e match {
    case Literal(v: Long, org.apache.spark.sql.types.LongType) => v
    case Literal(v: Int, IntegerType) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$fn: $name must be an integral literal, got $other")
  }

  /** graft_label_propagation(nodes, edges, iters) — synchronous LPA
    * community detection over an undirected (src, dst) edge table
    * (pass each edge once; symmetrization and the self-vote loop are the
    * operator's). Returns (id, label). */
  def labelPropagationBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_label_propagation"
    require(exprs.size == 3,
      s"$fn(nodes, edges, iters) takes 3 args, got ${exprs.size}")
    LabelPropagationPlaceholder(
      tableArg(fn, "first", exprs.head), tableArg(fn, "second", exprs(1)),
      intLit(fn, "iters", exprs(2)))
  }

  /** graft_asof_nearest(left, right, 'key', 'left_id', 'left_ts',
    * 'right_ts', 'right_tiebreak') — either-direction closest match via
    * the two-pass merge composition (AsOfJoin.asofNearest). */
  def asofNearestBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_asof_nearest"
    require(exprs.size == 7,
      s"$fn(left, right, key, left_id, left_ts, right_ts, right_tiebreak) takes 7 args, got ${exprs.size}")
    AsOfNearestPlaceholder(
      tableArg(fn, "first", exprs.head), tableArg(fn, "second", exprs(1)),
      strLit(fn, "key", exprs(2)), strLit(fn, "left_id", exprs(3)),
      strLit(fn, "left_ts", exprs(4)), strLit(fn, "right_ts", exprs(5)),
      strLit(fn, "right_tiebreak", exprs(6)))
  }

  /** graft_asof_backward_split(left, right, 'key', 'left_ts', 'right_ts',
    * 'right_tiebreak', slot_width_micros) — the hot-key range-split
    * backward as-of (AsOfJoin.asofBackwardSplit). */
  def asofBackwardSplitBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_asof_backward_split"
    require(exprs.size == 7,
      s"$fn(left, right, key, left_ts, right_ts, right_tiebreak, slot_width_micros) takes 7 args, got ${exprs.size}")
    AsOfBackwardSplitPlaceholder(
      tableArg(fn, "first", exprs.head), tableArg(fn, "second", exprs(1)),
      strLit(fn, "key", exprs(2)), strLit(fn, "left_ts", exprs(3)),
      strLit(fn, "right_ts", exprs(4)), strLit(fn, "right_tiebreak", exprs(5)),
      lngLit(fn, "slot_width_micros", exprs(6)))
  }

  /** graft_knn_search_index('path', TABLE(queries), k[, beam, rounds]) —
    * graph-ANN beam search against the PERSISTED KnnGraph.buildIndex at
    * `path` (the current committed version): the path-only form of
    * graft_knn_search, completing by-path SQL access across all three
    * index families alongside graft_dedup_against and graft_ivf_search. */
  def knnSearchIndexBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_knn_search_index"
    require(exprs.size >= 3 && exprs.size <= 5,
      s"$fn(path, queries, k[, beam, rounds]) takes 3-5 args (index path string, TABLE(...) of vec_id/embedding, int k), got ${exprs.size}")
    KnnSearchIndexPlaceholder(strLit(fn, "path", exprs.head),
      tableArg(fn, "second", exprs(1)), intLit(fn, "k", exprs(2)),
      exprs.lift(3).map(intLit(fn, "beam", _)).getOrElse(0),
      exprs.lift(4).map(intLit(fn, "rounds", _)).getOrElse(2))
  }

  /** graft_linear_probe(train, score[, lambda]) — closed-form one-vs-rest
    * ridge probe (ml.LinearProbe): fit on `train` (embedding, label),
    * score `score` rows with pred + margin. The fit's single aggregation
    * runs at analysis time (the index-function discipline: the operator
    * reads its model input once per query). */
  def linearProbeBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_linear_probe"
    require(exprs.size == 2 || exprs.size == 3,
      s"$fn(train, score[, lambda]) takes 2-3 args (TABLE(...) of embedding/label, TABLE(...) to score, double lambda), got ${exprs.size}")
    LinearProbePlaceholder(
      tableArg(fn, "first", exprs.head), tableArg(fn, "second", exprs(1)),
      exprs.lift(2).map(dblLit(fn, "lambda", _)).getOrElse(1.0))
  }

  /** graft_pca(emb, k[, whiten[, solver]]) — one-pass PCA (ml.Pca):
    * fit mean + top-k axes on the table's `embedding` column at analysis
    * time, add the (optionally whitened) centered projection as `proj`.
    * `solver` is `'exact'` (Jacobi, default), `'randomized'`
    * ([[graft.ml.Pca.fitRandomized]] — the O(d²k)-driver solver for wide
    * embeddings), or `'matfree'` ([[graft.ml.Pca.fitMatFree]] — block
    * subspace iteration, d² materialized NOWHERE, for widths where even
    * the Gram is too heavy); booleans stay accepted for compatibility
    * (`true` = randomized). */
  def pcaBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_pca"
    require(exprs.size >= 2 && exprs.size <= 4,
      s"$fn(emb, k[, whiten[, solver]]) takes 2-4 args (TABLE(...) with an embedding column, int k, boolean whiten, solver 'exact'|'randomized'|'matfree'), got ${exprs.size}")
    def boolArg(name: String, e: Expression): Boolean = e match {
      case Literal(b: Boolean, org.apache.spark.sql.types.BooleanType) => b
      case other => throw new IllegalArgumentException(
        s"$fn: $name must be a boolean literal, got $other")
    }
    val solver = exprs.lift(3).map {
      case Literal(b: Boolean, org.apache.spark.sql.types.BooleanType) =>
        if (b) "randomized" else "exact"
      case Literal(s: UTF8String, StringType)
          if Set("exact", "randomized", "matfree")(s.toString) => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: solver must be 'exact', 'randomized', 'matfree' or a boolean, got $other")
    }.getOrElse("exact")
    PcaPlaceholder(tableArg(fn, "first", exprs.head),
      intLit(fn, "k", exprs(1)),
      exprs.lift(2).exists(boolArg("whiten", _)),
      solver)
  }

  /** graft_community_labels('path'[, version]) — the committed head
    * labeling of a persisted [[graft.operators.CommunityIndex]]: version
    * resolution over `_SUCCESS`-gated snapshots, which a raw `parquet.`
    * path read cannot express (it would happily read a torn snapshot).
    * With the optional `version` arg it is the AS-OF time-travel read
    * ([[graft.operators.CommunityIndex.labelsAt]]) — available for the
    * newest `keepVersions` committed snapshots. Completes by-path SQL
    * access across all FOUR index families. */
  def communityLabelsBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_community_labels"
    require(exprs.size == 1 || exprs.size == 2,
      s"$fn(path[, version]) takes 1-2 args, got ${exprs.size}")
    CommunityLabelsPlaceholder(strLit(fn, "path", exprs.head),
      exprs.lift(1).map(intLit(fn, "version", _).toLong))
  }

  /** graft_curate(docs) — the curation PIPELINE composition
    * (queries.LlmOps.curateDocs): quality ∧ language-agreement ∧ near-dup
    * cluster representative over any (doc_id, text, lang) table. */
  def curateBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_curate"
    require(exprs.size == 1,
      s"$fn(docs) takes 1 arg (TABLE(...) of doc_id/text/lang), got ${exprs.size}")
    CuratePlaceholder(tableArg(fn, "first", exprs.head))
  }

  /** graft_substr_spans(docs[, w[, use_hash]]) — exact-substring dedup
    * spans (queries.LlmOps.substrSpansOf, the ExactSubstr pass) over any
    * (doc_id, text) table: merged removal spans of verbatim `w`-token
    * passages (default 12) repeated anywhere in the table, canonical
    * first occurrence kept. `use_hash` selects the xxhash64-keyed
    * production shuffle. */
  def substrSpansBuilder(exprs: Seq[Expression]): LogicalPlan = {
    val fn = "graft_substr_spans"
    require(exprs.size >= 1 && exprs.size <= 3,
      s"$fn(docs[, w[, use_hash]]) takes 1-3 args (TABLE(...) of doc_id/text, int window, boolean), got ${exprs.size}")
    val w = exprs.lift(1).map(intLit(fn, "w", _)).getOrElse(12)
    require(w >= 2, s"$fn: window must be >= 2 tokens, got $w")
    val useHash = exprs.lift(2).exists {
      case Literal(b: Boolean, org.apache.spark.sql.types.BooleanType) => b
      case other => throw new IllegalArgumentException(
        s"$fn: use_hash must be a boolean literal, got $other")
    }
    SubstrSpansPlaceholder(tableArg(fn, "first", exprs.head), w, useHash)
  }
}

/** Unresolved marker for the SQL as-of join. AsOfJoin.asofBackward needs
  * the child schemas (struct packing + the integral-tiebreak check), so
  * the SQL form defers plan construction to a resolution rule instead of
  * reimplementing the operator in logical terms. Never survives analysis:
  * ResolveAsOfBackward replaces it as soon as both children resolve, and
  * an un-replaced placeholder fails analysis loudly (resolved = false). */
case class AsOfBackwardPlaceholder(
    left: LogicalPlan, right: LogicalPlan, key: String,
    leftTs: String, rightTs: String, rightTieBreak: String) extends BinaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("AsOfBackwardPlaceholder.output")
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfBackwardPlaceholder =
    copy(left = newLeft, right = newRight)
}

/** Unresolved marker for the SQL dedup-against-index call; expanded by
  * [[ResolveGraftIndexFunctions]]. Same never-survives-analysis contract
  * as [[AsOfBackwardPlaceholder]]. */
case class DedupAgainstPlaceholder(path: String, child: LogicalPlan)
    extends org.apache.spark.sql.catalyst.plans.logical.UnaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("DedupAgainstPlaceholder.output")
  override protected def withNewChildInternal(newChild: LogicalPlan): DedupAgainstPlaceholder =
    copy(child = newChild)
}

/** Unresolved marker for the SQL IVF search; expanded by
  * [[ResolveGraftIndexFunctions]]. */
case class IvfSearchPlaceholder(path: String, queries: LogicalPlan,
    k: Int, nprobe: Int, allowed: Option[LogicalPlan] = None)
    extends LogicalPlan {
  override def children: Seq[LogicalPlan] = Seq(queries) ++ allowed.toSeq
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("IvfSearchPlaceholder.output")
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[LogicalPlan]): IvfSearchPlaceholder =
    copy(queries = newChildren(0),
      allowed = if (newChildren.length > 1) Some(newChildren(1)) else None)
}

/** Unresolved marker for the SQL IVF staleness report; expanded by
  * [[ResolveGraftIndexFunctions]]. */
case class IvfStalenessPlaceholder(path: String)
    extends org.apache.spark.sql.catalyst.plans.logical.LeafNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("IvfStalenessPlaceholder.output")
}

/** Unresolved marker for the SQL PCA staleness report; expanded by
  * [[ResolveGraftIndexFunctions]]. */
case class PcaStalenessPlaceholder(path: String, child: LogicalPlan)
    extends org.apache.spark.sql.catalyst.plans.logical.UnaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("PcaStalenessPlaceholder.output")
  override protected def withNewChildInternal(newChild: LogicalPlan): PcaStalenessPlaceholder =
    copy(child = newChild)
}

/** Unresolved marker for the SQL wide-probe drift gauge; expanded by
  * [[ResolveGraftIndexFunctions]]. */
case class ProbeStalenessPlaceholder(path: String, child: LogicalPlan)
    extends org.apache.spark.sql.catalyst.plans.logical.UnaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("ProbeStalenessPlaceholder.output")
  override protected def withNewChildInternal(newChild: LogicalPlan): ProbeStalenessPlaceholder =
    copy(child = newChild)
}

/** Unresolved marker for the SQL IVF-PQ search; expanded by
  * [[ResolveGraftIndexFunctions]]. */
case class PqSearchPlaceholder(path: String, child: LogicalPlan, k: Int, nprobe: Int,
    rerank: Int = 0)
    extends org.apache.spark.sql.catalyst.plans.logical.UnaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("PqSearchPlaceholder.output")
  override protected def withNewChildInternal(newChild: LogicalPlan): PqSearchPlaceholder =
    copy(child = newChild)
}

/** Unresolved marker for the SQL per-domain cap; expanded by
  * [[ResolveGraftIndexFunctions]]. */
case class DomainCapPlaceholder(child: LogicalPlan, cap: Int,
    blockedCsv: String)
    extends org.apache.spark.sql.catalyst.plans.logical.UnaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("DomainCapPlaceholder.output")
  override protected def withNewChildInternal(newChild: LogicalPlan): DomainCapPlaceholder =
    copy(child = newChild)
}

/** Unresolved marker for the SQL URL-native per-domain cap; expanded by
  * [[ResolveGraftIndexFunctions]]. */
case class DomainCapUrlPlaceholder(child: LogicalPlan, cap: Int,
    blockedCsv: String)
    extends org.apache.spark.sql.catalyst.plans.logical.UnaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("DomainCapUrlPlaceholder.output")
  override protected def withNewChildInternal(newChild: LogicalPlan): DomainCapUrlPlaceholder =
    copy(child = newChild)
}

/** Unresolved marker for the SQL eTLD+1 extraction; expanded by
  * [[ResolveGraftIndexFunctions]]. */
case class RegistrableDomainPlaceholder(child: LogicalPlan)
    extends org.apache.spark.sql.catalyst.plans.logical.UnaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("RegistrableDomainPlaceholder.output")
  override protected def withNewChildInternal(newChild: LogicalPlan): RegistrableDomainPlaceholder =
    copy(child = newChild)
}

/** Unresolved marker for the SQL politeness batching; expanded by
  * [[ResolveGraftIndexFunctions]]. */
case class FrontierBatchesPlaceholder(child: LogicalPlan, perBatch: Int)
    extends org.apache.spark.sql.catalyst.plans.logical.UnaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("FrontierBatchesPlaceholder.output")
  override protected def withNewChildInternal(newChild: LogicalPlan): FrontierBatchesPlaceholder =
    copy(child = newChild)
}

/** Unresolved marker for the SQL BPE trainer; expanded by
  * [[ResolveGraftIndexFunctions]]. */
case class BpePlaceholder(child: LogicalPlan, merges: Int)
    extends org.apache.spark.sql.catalyst.plans.logical.UnaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("BpePlaceholder.output")
  override protected def withNewChildInternal(newChild: LogicalPlan): BpePlaceholder =
    copy(child = newChild)
}

/** Unresolved marker for the SQL trainable quality gate; expanded by
  * [[ResolveGraftIndexFunctions]]. */
case class QualityProbePlaceholder(child: LogicalPlan, threshold: Double,
    holdoutMod: Int)
    extends org.apache.spark.sql.catalyst.plans.logical.UnaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("QualityProbePlaceholder.output")
  override protected def withNewChildInternal(newChild: LogicalPlan): QualityProbePlaceholder =
    copy(child = newChild)
}

/** Unresolved marker for the SQL wide quality gate; expanded by
  * [[ResolveGraftIndexFunctions]]. */
case class QualityProbeWidePlaceholder(child: LogicalPlan, threshold: Double,
    holdoutMod: Int, buckets: Int)
    extends org.apache.spark.sql.catalyst.plans.logical.UnaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("QualityProbeWidePlaceholder.output")
  override protected def withNewChildInternal(newChild: LogicalPlan): QualityProbeWidePlaceholder =
    copy(child = newChild)
}

/** Unresolved marker for the SQL deterministic shard assigner; expanded
  * by [[ResolveGraftIndexFunctions]]. */
case class ShardAssignPlaceholder(child: LogicalPlan, numShards: Int,
    orderBuckets: Int)
    extends org.apache.spark.sql.catalyst.plans.logical.UnaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("ShardAssignPlaceholder.output")
  override protected def withNewChildInternal(newChild: LogicalPlan): ShardAssignPlaceholder =
    copy(child = newChild)
}

/** Unresolved marker for the SQL fuzzy decontamination; expanded by
  * [[ResolveGraftIndexFunctions]]. */
case class FuzzyContaminationPlaceholder(train: LogicalPlan,
    evalDocs: LogicalPlan, threshold: Double) extends LogicalPlan {
  override def children: Seq[LogicalPlan] = Seq(train, evalDocs)
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("FuzzyContaminationPlaceholder.output")
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[LogicalPlan]): FuzzyContaminationPlaceholder =
    copy(train = newChildren(0), evalDocs = newChildren(1))
}

/** Unresolved marker for the SQL SemDeDup; expanded by
  * [[ResolveGraftIndexFunctions]]. */
case class SemanticDedupPlaceholder(emb: LogicalPlan, centroids: LogicalPlan,
    tau: Double) extends LogicalPlan {
  override def children: Seq[LogicalPlan] = Seq(emb, centroids)
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("SemanticDedupPlaceholder.output")
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[LogicalPlan]): SemanticDedupPlaceholder =
    copy(emb = newChildren(0), centroids = newChildren(1))
}

/** Unresolved marker for the SQL k-center sampler; expanded by
  * [[ResolveGraftIndexFunctions]]. */
case class KCenterPlaceholder(child: LogicalPlan, k: Int)
    extends org.apache.spark.sql.catalyst.plans.logical.UnaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("KCenterPlaceholder.output")
  override protected def withNewChildInternal(newChild: LogicalPlan): KCenterPlaceholder =
    copy(child = newChild)
}

/** Unresolved marker for the SQL MMR re-rank; expanded by
  * [[ResolveGraftIndexFunctions]]. */
case class MmrPlaceholder(cands: LogicalPlan, sims: LogicalPlan,
    k: Int, lambda: Double) extends LogicalPlan {
  override def children: Seq[LogicalPlan] = Seq(cands, sims)
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("MmrPlaceholder.output")
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[LogicalPlan]): MmrPlaceholder =
    copy(cands = newChildren(0), sims = newChildren(1))
}

/** Unresolved marker for the SQL graph-ANN search; expanded by
  * [[ResolveGraftIndexFunctions]]. */
case class KnnSearchPlaceholder(graph: LogicalPlan, corpus: LogicalPlan,
    queries: LogicalPlan, k: Int, beam: Int, rounds: Int) extends LogicalPlan {
  override def children: Seq[LogicalPlan] = Seq(graph, corpus, queries)
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("KnnSearchPlaceholder.output")
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[LogicalPlan]): KnnSearchPlaceholder =
    copy(graph = newChildren(0), corpus = newChildren(1), queries = newChildren(2))
}

/** Unresolved marker for the SQL path-backed graph-ANN search; expanded by
  * [[ResolveGraftIndexFunctions]]. */
case class KnnSearchIndexPlaceholder(path: String, child: LogicalPlan,
    k: Int, beam: Int, rounds: Int)
    extends org.apache.spark.sql.catalyst.plans.logical.UnaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("KnnSearchIndexPlaceholder.output")
  override protected def withNewChildInternal(newChild: LogicalPlan): KnnSearchIndexPlaceholder =
    copy(child = newChild)
}

/** Unresolved marker for the SQL PageRank; expanded by
  * [[ResolveGraftIndexFunctions]]. */
case class PageRankPlaceholder(nodes: LogicalPlan, edges: LogicalPlan,
    iters: Int, damping: Double) extends BinaryNode {
  override def left: LogicalPlan = nodes
  override def right: LogicalPlan = edges
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("PageRankPlaceholder.output")
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): PageRankPlaceholder =
    copy(nodes = newLeft, edges = newRight)
}

/** Unresolved marker for the SQL connected components; expanded by
  * [[ResolveGraftIndexFunctions]]. */
case class ConnectedComponentsPlaceholder(child: LogicalPlan)
    extends org.apache.spark.sql.catalyst.plans.logical.UnaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("ConnectedComponentsPlaceholder.output")
  override protected def withNewChildInternal(
      newChild: LogicalPlan): ConnectedComponentsPlaceholder =
    copy(child = newChild)
}

/** Unresolved marker for the SQL label propagation; expanded by
  * [[ResolveGraftIndexFunctions]]. */
case class LabelPropagationPlaceholder(nodes: LogicalPlan, edges: LogicalPlan,
    iters: Int) extends BinaryNode {
  override def left: LogicalPlan = nodes
  override def right: LogicalPlan = edges
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("LabelPropagationPlaceholder.output")
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LabelPropagationPlaceholder =
    copy(nodes = newLeft, edges = newRight)
}

/** Unresolved marker for the SQL nearest as-of; expanded by
  * [[ResolveGraftIndexFunctions]]. */
case class AsOfNearestPlaceholder(
    left: LogicalPlan, right: LogicalPlan, key: String, leftId: String,
    leftTs: String, rightTs: String, rightTieBreak: String) extends BinaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("AsOfNearestPlaceholder.output")
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfNearestPlaceholder =
    copy(left = newLeft, right = newRight)
}

/** Unresolved marker for the SQL range-split backward as-of; expanded by
  * [[ResolveGraftIndexFunctions]]. */
case class AsOfBackwardSplitPlaceholder(
    left: LogicalPlan, right: LogicalPlan, key: String,
    leftTs: String, rightTs: String, rightTieBreak: String,
    slotWidthMicros: Long) extends BinaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("AsOfBackwardSplitPlaceholder.output")
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfBackwardSplitPlaceholder =
    copy(left = newLeft, right = newRight)
}

/** Unresolved marker for the SQL linear probe; expanded by
  * [[ResolveGraftIndexFunctions]]. */
case class LinearProbePlaceholder(train: LogicalPlan, score: LogicalPlan,
    lambda: Double) extends BinaryNode {
  override def left: LogicalPlan = train
  override def right: LogicalPlan = score
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("LinearProbePlaceholder.output")
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LinearProbePlaceholder =
    copy(train = newLeft, score = newRight)
}

/** Unresolved marker for the SQL PCA projection; expanded by
  * [[ResolveGraftIndexFunctions]]. `solver` is one of
  * exact | randomized | matfree (validated by the builder). */
case class PcaPlaceholder(child: LogicalPlan, k: Int, whiten: Boolean,
    solver: String = "exact")
    extends org.apache.spark.sql.catalyst.plans.logical.UnaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("PcaPlaceholder.output")
  override protected def withNewChildInternal(newChild: LogicalPlan): PcaPlaceholder =
    copy(child = newChild)
}

/** Unresolved marker for the SQL curation pipeline; expanded by
  * [[ResolveGraftIndexFunctions]]. */
case class CuratePlaceholder(child: LogicalPlan)
    extends org.apache.spark.sql.catalyst.plans.logical.UnaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("CuratePlaceholder.output")
  override protected def withNewChildInternal(newChild: LogicalPlan): CuratePlaceholder =
    copy(child = newChild)
}

/** Unresolved marker for the SQL exact-substring-spans call; expanded by
  * [[ResolveGraftIndexFunctions]]. Same never-survives-analysis contract
  * as [[AsOfBackwardPlaceholder]]. */
case class SubstrSpansPlaceholder(child: LogicalPlan, w: Int, useHash: Boolean)
    extends org.apache.spark.sql.catalyst.plans.logical.UnaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("SubstrSpansPlaceholder.output")
  override protected def withNewChildInternal(newChild: LogicalPlan): SubstrSpansPlaceholder =
    copy(child = newChild)
}

/** Unresolved marker for the SQL community-labels read; expanded by
  * [[ResolveGraftIndexFunctions]]. `version` = None reads the committed
  * head, Some(v) the retained snapshot at watermark v. */
case class CommunityLabelsPlaceholder(path: String, version: Option[Long])
    extends org.apache.spark.sql.catalyst.plans.logical.LeafNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    throw new UnresolvedException("CommunityLabelsPlaceholder.output")
}

/** Expands [[AsOfBackwardPlaceholder]] by calling the Scala operator on
  * the resolved children — the SQL surface and the Scala API are the SAME
  * code path by construction, so they cannot drift. */
case class ResolveAsOfBackward(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case p: AsOfBackwardPlaceholder if p.childrenResolved =>
      val bridge = org.apache.spark.sql.GraftSqlBridge
      graft.operators.AsOfJoin.asofBackward(
        bridge.ofRows(session, p.left), bridge.ofRows(session, p.right),
        p.key, p.leftTs, p.rightTs, p.rightTieBreak)
        .queryExecution.analyzed
  }
}

/** Expands the index-backed placeholders by calling the Scala operators on
  * the resolved child — same one-code-path contract as the as-of. The
  * operators read the persisted index at analysis time (dedupAgainst also
  * checkpoints the batch's shingle pass); each placeholder is replaced on
  * first expansion, so the work runs once per query, not once per rule
  * pass. */
case class ResolveGraftIndexFunctions(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case p: DedupAgainstPlaceholder if p.childrenResolved =>
      graft.operators.DedupIndex.dedupAgainst(p.path,
          org.apache.spark.sql.GraftSqlBridge.ofRows(session, p.child))
        .queryExecution.analyzed
    case p: IvfSearchPlaceholder if p.childrenResolved =>
      graft.ml.IvfIndex.searchIndex(session, p.path,
          org.apache.spark.sql.GraftSqlBridge.ofRows(session, p.queries),
          topK = p.k, nprobe = p.nprobe,
          allowed = p.allowed.map(
            org.apache.spark.sql.GraftSqlBridge.ofRows(session, _)))
        .queryExecution.analyzed
    case p: PqSearchPlaceholder if p.childrenResolved =>
      graft.ml.IvfIndex.searchPqIndex(session, p.path,
          org.apache.spark.sql.GraftSqlBridge.ofRows(session, p.child),
          topK = p.k, nprobe = p.nprobe, rerank = p.rerank)
        .queryExecution.analyzed
    case p: IvfStalenessPlaceholder =>
      val (bn, nn, mb, mn, ratio) = graft.ml.IvfIndex.staleness(session, p.path)
      import session.implicits._
      Seq((bn, nn, mb, mn, ratio))
        .toDF("vectors_at_build", "vectors_now", "mean_sq_dist_build",
          "mean_sq_dist_now", "ratio")
        .queryExecution.analyzed
    case p: PcaStalenessPlaceholder if p.childrenResolved =>
      val model = graft.ml.Pca.loadModel(session, p.path)
      val (n, cap, tot, frac) = graft.ml.Pca.staleness(
        org.apache.spark.sql.GraftSqlBridge.ofRows(session, p.child), model)
      import session.implicits._
      Seq((n, cap, tot, frac))
        .toDF("n", "captured_variance", "total_variance", "captured_frac")
        .queryExecution.analyzed
    case p: ProbeStalenessPlaceholder if p.childrenResolved =>
      val (fitN, serveN, fitMean, serveMean, fitSd, shift) =
        graft.queries.LlmOps.qualityProbeWideStaleness(
          org.apache.spark.sql.GraftSqlBridge.ofRows(session, p.child), p.path)
      import session.implicits._
      Seq((fitN, serveN, fitMean, serveMean, fitSd, shift))
        .toDF("n_fit", "n_serve", "mean_fit", "mean_serve", "sd_fit", "shift")
        .queryExecution.analyzed
    case p: KCenterPlaceholder if p.childrenResolved =>
      graft.queries.LlmOps.kCenterSample(
          org.apache.spark.sql.GraftSqlBridge.ofRows(session, p.child), k = p.k)
        .queryExecution.analyzed
    case p: DomainCapPlaceholder if p.childrenResolved =>
      graft.queries.LlmOps.domainCap(
          org.apache.spark.sql.GraftSqlBridge.ofRows(session, p.child),
          cap = p.cap,
          blocked = p.blockedCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .queryExecution.analyzed
    case p: DomainCapUrlPlaceholder if p.childrenResolved =>
      graft.queries.LlmOps.domainCapUrl(
          org.apache.spark.sql.GraftSqlBridge.ofRows(session, p.child),
          cap = p.cap,
          blockedDomains =
            p.blockedCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .queryExecution.analyzed
    case p: RegistrableDomainPlaceholder if p.childrenResolved =>
      org.apache.spark.sql.GraftSqlBridge.ofRows(session, p.child)
        .select(org.apache.spark.sql.functions.col("url"))
        .withColumn("host",
          graft.queries.LlmOps.urlHost(org.apache.spark.sql.functions.col("url")))
        .withColumn("domain",
          graft.queries.LlmOps.registrableDomain(
            org.apache.spark.sql.functions.col("host")))
        .queryExecution.analyzed
    case p: FrontierBatchesPlaceholder if p.childrenResolved =>
      graft.queries.LlmOps.frontierBatches(
          org.apache.spark.sql.GraftSqlBridge.ofRows(session, p.child),
          perBatch = p.perBatch)
        .queryExecution.analyzed
    case p: BpePlaceholder if p.childrenResolved =>
      graft.queries.LlmOps.bpeTrain(
          org.apache.spark.sql.GraftSqlBridge.ofRows(session, p.child),
          merges = p.merges)._1
        .queryExecution.analyzed
    case p: FuzzyContaminationPlaceholder if p.childrenResolved =>
      val bridge = org.apache.spark.sql.GraftSqlBridge
      graft.queries.LlmOps.fuzzyContamination(
          bridge.ofRows(session, p.train), bridge.ofRows(session, p.evalDocs),
          threshold = p.threshold)
        .queryExecution.analyzed
    case p: QualityProbePlaceholder if p.childrenResolved =>
      graft.queries.LlmOps.qualityProbe(
          org.apache.spark.sql.GraftSqlBridge.ofRows(session, p.child),
          threshold = p.threshold, holdoutMod = p.holdoutMod.toLong)
        .queryExecution.analyzed
    case p: QualityProbeWidePlaceholder if p.childrenResolved =>
      graft.queries.LlmOps.qualityProbeWide(
          org.apache.spark.sql.GraftSqlBridge.ofRows(session, p.child),
          threshold = p.threshold, holdoutMod = p.holdoutMod.toLong,
          buckets = p.buckets.toLong)
        .queryExecution.analyzed
    case p: ShardAssignPlaceholder if p.childrenResolved =>
      graft.queries.LlmOps.shardAssignment(
          org.apache.spark.sql.GraftSqlBridge.ofRows(session, p.child),
          numShards = p.numShards, orderBuckets = p.orderBuckets)
        .queryExecution.analyzed
    case p: SemanticDedupPlaceholder if p.childrenResolved =>
      graft.queries.LlmOps.semanticDedup(
          org.apache.spark.sql.GraftSqlBridge.ofRows(session, p.emb),
          org.apache.spark.sql.GraftSqlBridge.ofRows(session, p.centroids),
          tau = p.tau)
        .queryExecution.analyzed
    case p: MmrPlaceholder if p.childrenResolved =>
      graft.queries.LlmOps.mmrRerank(
          org.apache.spark.sql.GraftSqlBridge.ofRows(session, p.cands),
          org.apache.spark.sql.GraftSqlBridge.ofRows(session, p.sims),
          k = p.k, lambda = p.lambda)
        .queryExecution.analyzed
    case p: KnnSearchPlaceholder if p.childrenResolved =>
      val bridge = org.apache.spark.sql.GraftSqlBridge
      graft.ml.KnnGraph.search(
          bridge.ofRows(session, p.graph), bridge.ofRows(session, p.corpus),
          bridge.ofRows(session, p.queries),
          k = p.k, beam = p.beam, rounds = p.rounds)
        .queryExecution.analyzed
    case p: KnnSearchIndexPlaceholder if p.childrenResolved =>
      graft.ml.KnnGraph.searchIndex(session, p.path,
          org.apache.spark.sql.GraftSqlBridge.ofRows(session, p.child),
          k = p.k, beam = p.beam, rounds = p.rounds)
        .queryExecution.analyzed
    case p: PageRankPlaceholder if p.childrenResolved =>
      val bridge = org.apache.spark.sql.GraftSqlBridge
      graft.operators.PageRank.run(
          bridge.ofRows(session, p.nodes), bridge.ofRows(session, p.edges),
          iters = p.iters, damping = p.damping)
        .queryExecution.analyzed
    case p: ConnectedComponentsPlaceholder if p.childrenResolved =>
      graft.operators.ConnectedComponents.run(
          org.apache.spark.sql.GraftSqlBridge.ofRows(session, p.child))
        ._1.queryExecution.analyzed
    case p: LabelPropagationPlaceholder if p.childrenResolved =>
      val bridge = org.apache.spark.sql.GraftSqlBridge
      graft.operators.LabelPropagation.run(
          bridge.ofRows(session, p.nodes), bridge.ofRows(session, p.edges),
          iters = p.iters)
        .queryExecution.analyzed
    case p: AsOfNearestPlaceholder if p.childrenResolved =>
      val bridge = org.apache.spark.sql.GraftSqlBridge
      graft.operators.AsOfJoin.asofNearest(
          bridge.ofRows(session, p.left), bridge.ofRows(session, p.right),
          p.key, p.leftId, p.leftTs, p.rightTs, p.rightTieBreak)
        .queryExecution.analyzed
    case p: AsOfBackwardSplitPlaceholder if p.childrenResolved =>
      val bridge = org.apache.spark.sql.GraftSqlBridge
      graft.operators.AsOfJoin.asofBackwardSplit(
          bridge.ofRows(session, p.left), bridge.ofRows(session, p.right),
          p.key, p.leftTs, p.rightTs, p.rightTieBreak, p.slotWidthMicros)
        .queryExecution.analyzed
    case p: LinearProbePlaceholder if p.childrenResolved =>
      val bridge = org.apache.spark.sql.GraftSqlBridge
      val model = graft.ml.LinearProbe.fit(
        bridge.ofRows(session, p.train), lambda = p.lambda)
      graft.ml.LinearProbe.predict(bridge.ofRows(session, p.score), model)
        .queryExecution.analyzed
    case p: CuratePlaceholder if p.childrenResolved =>
      graft.queries.LlmOps.curateDocs(
          org.apache.spark.sql.GraftSqlBridge.ofRows(session, p.child))
        .queryExecution.analyzed
    case p: SubstrSpansPlaceholder if p.childrenResolved =>
      graft.queries.LlmOps.substrSpansOf(
          org.apache.spark.sql.GraftSqlBridge.ofRows(session, p.child),
          w = p.w, hashKeys = p.useHash)
        .queryExecution.analyzed
    case p: CommunityLabelsPlaceholder =>
      p.version.fold(graft.operators.CommunityIndex.labels(session, p.path)) {
          v => graft.operators.CommunityIndex.labelsAt(session, p.path, v)
        }.queryExecution.analyzed
    case p: PcaPlaceholder if p.childrenResolved =>
      val df = org.apache.spark.sql.GraftSqlBridge.ofRows(session, p.child)
      val model = p.solver match {
        case "randomized" => graft.ml.Pca.fitRandomized(df, p.k)
        case "matfree" => graft.ml.Pca.fitMatFree(df, p.k)
        case _ => graft.ml.Pca.fit(df, p.k)
      }
      graft.ml.Pca.transform(df, model, whiten = p.whiten)
        .queryExecution.analyzed
  }
}
