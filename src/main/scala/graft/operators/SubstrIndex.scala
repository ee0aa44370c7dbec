package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted exact-substring dedup index — the incremental form of the
  * ExactSubstr pass (queries.LlmOps `q_dedup_substr`): a daily 100 TB
  * pipeline never re-windows yesterday's corpus; it stores the distinct
  * window keys it has already seen and marks, per NEW batch, every
  * occurrence of (a) a window key already in the index or (b) a window
  * repeated within the batch (minus the batch's own canonical first
  * occurrence). Under the append contract below this equals the
  * batch-over-everything q_dedup_substr_xxh result restricted to the new
  * docs' spans — suite-pinned.
  *
  * Append contract: doc_ids are MONOTONE across batches (every appended
  * doc_id exceeds all indexed ones — arrival order, the same
  * "caller guarantees doc_ids are new" discipline as [[DedupIndex]]
  * tightened to ordering). Monotonicity is what makes "key in index ⇒
  * every new occurrence is non-canonical" exact: the stored canonical
  * (min doc_id·10⁶+pos) always precedes any new occurrence. Violating
  * it shifts which occurrence is exempt, nothing else.
  *
  * On-disk layout under `path` (the [[DedupIndex]] conventions —
  * docs/versioned-state-machines.md):
  *   - `meta/`: the window width `w` and the tokenizer expression
  *     (both fixed at build; every append and serve reuses them).
  *   - `win/batch=<v>`: (k, canon) — distinct xxhash64 window keys of
  *     batch v with the batch-min canonical position. `_SUCCESS`-gated;
  *     a retried [[appendVersion]] overwrites its own dir
  *     (exactly-once on at-least-once delivery). The union of committed
  *     batches IS the seen-window set; [[compact]] folds it to one dir
  *     (global min canon per key) behind the shared
  *     [[graft.streaming.VersionedState.recoverSwap]] staged rename.
  *
  * Scale shape of [[dedupAgainst]]: the new batch windows equi-join the
  * stored keys (N:1 on an 8-byte key, no fan-out — the index side is
  * large but touched by ONE semi-shaped join; a Bloom/seen prefilter can
  * cut it further, [[DedupIndex.filterUnseen]] pattern), plus the same
  * map-combining within-batch group and doc_id-partitioned island merge
  * as the batch operator. Work per day ∝ the day's batch, never the
  * corpus.
  */
object SubstrIndex {

  /** (doc_id, pos, k): 1-based window positions and xxhash64 keys of all
    * w-token windows — the SAME windowing as the gated q_dedup_substr_xxh
    * (LlmOps.substrSpansOf with hashKeys=true) so incremental == batch
    * cannot drift on tokenization. `tokenizeSql` is the persisted
    * tokenizer (meta) — every append and serve of an index runs the
    * SAME expression, fixed at build time. */
  private def windows(docs: DataFrame, w: Int, tokenizeSql: String): DataFrame =
    docs
      .select(col("doc_id"), expr(tokenizeSql).as("t"))
      .filter(size(col("t")) >= w)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, size(t) - ${w - 1}), i -> array_join(slice(t, i, $w), ' '))"))
        .as(Seq("i", "sh")))
      .select(col("doc_id"), (col("i") + 1).cast("long").as("pos"),
        xxhash64(col("sh")).as("k"))

  private def hadoopFs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def recoverCompact(spark: SparkSession, path: String): Unit =
    graft.streaming.VersionedState.recoverSwap(spark,
      live = s"$path/win", old = s"$path/win_old",
      stage = s"$path/win_compact")

  private def allVersions(spark: SparkSession, path: String): Seq[Long] =
    graft.streaming.VersionedState.versions(spark, s"$path/win", "batch=")

  def isCommitted(spark: SparkSession, path: String, version: Long): Boolean =
    hadoopFs(spark, path)._1.exists(new org.apache.hadoop.fs.Path(
      s"$path/win/batch=$version/_SUCCESS"))

  /** Delete batch dirs a crashed append left half-written, after first
    * finishing/undoing any crashed compact. Single-writer only. */
  def cleanupUncommitted(spark: SparkSession, path: String): Unit = {
    recoverCompact(spark, path)
    allVersions(spark, path).filterNot(isCommitted(spark, path, _)).foreach {
      v => graft.streaming.VersionedState.delete(spark, s"$path/win/batch=$v")
    }
  }

  /** The window width the index was built with. */
  def width(spark: SparkSession, path: String): Int = params(spark, path)._1

  /** (w, tokenizeSql) the index was built with. Indexes from before the
    * tokenizer hook carry no `tokenize` field — default whitespace. */
  def params(spark: SparkSession, path: String): (Int, String) = {
    val r = spark.read.json(s"$path/meta").collect().head
    val tok = scala.util.Try(r.getAs[String]("tokenize")).toOption
      .filter(_ != null).getOrElse(DefaultTokenize)
    (r.getAs[Long]("w").toInt, tok)
  }

  /** The whitespace default — the gated queries' tokenization. */
  val DefaultTokenize: String = "split(text, ' ')"

  private def writeBatch(docs: DataFrame, path: String, w: Int,
                         tokenizeSql: String, version: Long): Unit =
    windows(docs, w, tokenizeSql)
      .groupBy("k")
      .agg(min(col("doc_id") * 1000000L + col("pos")).as("canon"))
      .write.mode("overwrite").parquet(s"$path/win/batch=$version")

  /** Build (overwrite) the index from a (doc_id, text) frame as batch 0.
    * Wipes ONLY a path that is empty or already holds a substr index.
    * `tokenize` is any SQL expression over `text` yielding
    * array<string> — e.g. `split(lower(text), '[^a-z0-9]+')` for
    * case/punctuation-insensitive spans on non-whitespace corpora; it is
    * persisted in meta so appends and serves can never tokenize
    * differently than the build. */
  def build(docs: DataFrame, path: String, w: Int = 12,
            tokenize: String = DefaultTokenize): Unit = {
    require(w >= 2, s"need window width >= 2 tokens, got $w")
    val spark = docs.sparkSession
    import spark.implicits._
    val (fs, root) = hadoopFs(spark, path)
    if (fs.exists(root)) {
      val children = fs.listStatus(root).map(_.getPath.getName).toSet
      require(children.isEmpty || children.contains("meta") || children.contains("win"),
        s"refusing to wipe $path: it exists but does not look like a substr index " +
          s"(found ${children.take(5).mkString(", ")}); delete it yourself if intended")
      fs.delete(root, true)
    }
    writeBatch(docs, path, w, tokenize, 0L)
    Seq((w.toLong, tokenize)).toDF("w", "tokenize")
      .repartition(1).write.mode("overwrite").json(s"$path/meta")
  }

  /** Grow the index with a new batch (next free version — NOT retry-safe;
    * at-least-once callers use [[appendVersion]]). doc_ids must exceed
    * all indexed ones (the monotone-arrival contract). */
  def append(docs: DataFrame, path: String): Unit =
    appendVersion(docs, path,
      allVersions(docs.sparkSession, path).maxOption.getOrElse(0L) + 1)

  /** Idempotent append: a retry of the same version overwrites its own
    * batch dir — exactly-once on at-least-once delivery. */
  def appendVersion(docs: DataFrame, path: String, version: Long): Unit = {
    require(version >= 1, s"version must be >= 1 (0 is the base build), got $version")
    val spark = docs.sparkSession
    recoverCompact(spark, path)
    val (w, tok) = params(spark, path)
    writeBatch(docs, path, w, tok, version)
  }

  /** Merged removal spans (doc_id, span_start, span_end) of `newDocs`
    * against the index AND within the new batch — the
    * batch-over-everything q_dedup_substr_xxh result restricted to the
    * new docs, without re-reading the indexed corpus text. Does NOT
    * append; pipelines mark-then-append ([[appendVersion]]) per batch. */
  def dedupAgainst(path: String, newDocs: DataFrame): DataFrame = {
    val spark = newDocs.sparkSession
    cleanupUncommitted(spark, path)
    val (w, tok) = params(spark, path)
    val sh = windows(newDocs, w, tok).localCheckpoint()
    val seen = spark.read.parquet(s"$path/win").select(col("k")).distinct()
    val batchAgg = sh.groupBy("k").agg(
      count(lit(1)).as("cnt"),
      min(col("doc_id") * 1000000L + col("pos")).as("bcanon"))
    val marks = sh
      .join(batchAgg, "k")
      .join(seen.withColumn("in_index", lit(1L)), Seq("k"), "left")
      .filter(col("in_index").isNotNull ||
        (col("cnt") >= 2 &&
          col("doc_id") * 1000000L + col("pos") =!= col("bcanon")))
      .select(col("doc_id"), col("pos").as("s0"),
        (col("pos") + (w - 1)).as("e0"))
    mergeIslands(marks)
  }

  /** Gaps-and-islands merge of (doc_id, s0, e0) marks — the same
    * doc_id-partitioned window discipline as the batch operator. */
  private def mergeIslands(marks: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy("doc_id").orderBy("s0", "e0")
    marks
      .withColumn("pmax",
        max(col("e0")).over(ord.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("fresh",
        when(col("pmax").isNull || col("s0") > col("pmax"), 1L).otherwise(0L))
      .withColumn("island", sum(col("fresh"))
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min("s0").as("span_start"), max("e0").as("span_end"))
      .select("doc_id", "span_start", "span_end")
  }

  /** Fold all committed batch dirs into one (global min canon per key) —
    * the maintenance pass that keeps the per-read dir listing and the
    * seen-set scan flat as batches accumulate. Crash-safe via the shared
    * staged-rename swap; returns the number of dirs folded. */
  def compact(spark: SparkSession, path: String): Int = {
    cleanupUncommitted(spark, path)
    val vs = allVersions(spark, path)
    if (vs.size <= 1) return vs.size
    val folded = spark.read.parquet(s"$path/win")
      .groupBy("k").agg(min("canon").as("canon"))
      .localCheckpoint()
    val keep = vs.max
    folded.write.mode("overwrite").parquet(s"$path/win_compact/batch=$keep")
    val fs = graft.streaming.VersionedState.fileSystem(spark, path)
    require(fs.rename(new org.apache.hadoop.fs.Path(s"$path/win"),
      new org.apache.hadoop.fs.Path(s"$path/win_old")),
      s"compact: could not stage out $path/win")
    require(fs.rename(new org.apache.hadoop.fs.Path(s"$path/win_compact"),
      new org.apache.hadoop.fs.Path(s"$path/win")),
      s"compact: could not swap in $path/win_compact")
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/win_old"), true)
    vs.size
  }
}
