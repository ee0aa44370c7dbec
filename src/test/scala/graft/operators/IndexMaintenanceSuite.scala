package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The uniform maintenance dialect actually reaches every family: for
  * each of the six, build + append through the family API, then drive
  * recover/compact/prune ONLY through the facade and assert the served
  * result is unchanged (each family's own suite pins the deep crash
  * windows; this pins the wiring). */
class IndexMaintenanceSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def tmp(n: String): String =
    java.nio.file.Files.createTempDirectory(n).toString + "/idx"

  test("recover + compact + prune reach all six families; serving unchanged") {
    import spark.implicits._
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
    val emb = Tables(spark, sf, "embeddings")

    // --- substr -------------------------------------------------------
    val sPath = tmp("im-substr")
    SubstrIndex.build(docs.filter(col("doc_id") < 300), sPath)
    SubstrIndex.appendVersion(docs.filter(col("doc_id") >= 300 && col("doc_id") < 400), sPath, 1L)
    val sProbe = docs.filter(col("doc_id") >= 400)
    def sSpans() = SubstrIndex.dedupAgainst(sPath, sProbe)
      .orderBy("doc_id", "span_start").collect().map(_.toSeq.toVector).toVector
    val sBefore = sSpans()
    IndexMaintenance.recover(spark, IndexMaintenance.Substr, sPath)
    assert(IndexMaintenance.compact(spark, IndexMaintenance.Substr, sPath) === 2)
    assert(IndexMaintenance.prune(spark, IndexMaintenance.Substr, sPath) === Nil)
    assert(sSpans() === sBefore)

    // --- dedup --------------------------------------------------------
    val dPath = tmp("im-dedup")
    DedupIndex.build(docs.filter(col("doc_id") < 300), dPath)
    DedupIndex.appendVersion(docs.filter(col("doc_id") >= 300 && col("doc_id") < 400), dPath, 1L)
    def dOut() = DedupIndex.dedupAgainst(dPath, sProbe)
      .orderBy("d1", "d2").collect().map(_.toSeq.toVector).toVector
    val dBefore = dOut()
    IndexMaintenance.recover(spark, IndexMaintenance.Dedup, dPath)
    assert(IndexMaintenance.compact(spark, IndexMaintenance.Dedup, dPath) > 0)
    assert(IndexMaintenance.prune(spark, IndexMaintenance.Dedup, dPath) === Nil)
    assert(dOut() === dBefore)

    // --- ivf ----------------------------------------------------------
    val iPath = tmp("im-ivf")
    graft.ml.IvfIndex.buildIndex(emb.filter(col("vec_id") >= 10 && col("vec_id") % 5 =!= 0),
      k = 4, iters = 2, iPath)
    graft.ml.IvfIndex.appendVersion(spark, iPath,
      emb.filter(col("vec_id") >= 10 && col("vec_id") % 5 === 0), 1L)
    val iq = emb.filter(col("vec_id") < 10)
    def iOut() = graft.ml.IvfIndex.searchIndex(spark, iPath, iq, topK = 3, nprobe = 2)
      .orderBy("q_id", "rn").collect().map(_.toSeq.toVector).toVector
    val iBefore = iOut()
    IndexMaintenance.recover(spark, IndexMaintenance.Ivf, iPath)
    assert(IndexMaintenance.compact(spark, IndexMaintenance.Ivf, iPath) === 1)
    assert(IndexMaintenance.prune(spark, IndexMaintenance.Ivf, iPath) === Nil)
    assert(iOut() === iBefore)

    // --- ivf-pq -------------------------------------------------------
    val pPath = tmp("im-pq")
    graft.ml.IvfIndex.buildPqIndex(emb.filter(col("vec_id") >= 10 && col("vec_id") % 5 =!= 0),
      k = 4, iters = 2, m = 8, ksub = 16, pqIters = 2, pPath)
    graft.ml.IvfIndex.appendPqVersion(spark, pPath,
      emb.filter(col("vec_id") >= 10 && col("vec_id") % 5 === 0), 1L)
    def pOut() = graft.ml.IvfIndex.searchPqIndex(spark, pPath, iq, topK = 3, nprobe = 2)
      .orderBy("q_id", "rn").collect().map(_.toSeq.toVector).toVector
    val pBefore = pOut()
    IndexMaintenance.recover(spark, IndexMaintenance.IvfPq, pPath)
    assert(IndexMaintenance.compact(spark, IndexMaintenance.IvfPq, pPath) === 1)
    assert(IndexMaintenance.prune(spark, IndexMaintenance.IvfPq, pPath) === Nil)
    assert(pOut() === pBefore)

    // --- knn ----------------------------------------------------------
    val kPath = tmp("im-knn")
    graft.ml.KnnGraph.buildIndex(emb.filter(col("vec_id") >= 10 && col("vec_id") < 200),
      k = 4, iters = 1, kPath)
    graft.ml.KnnGraph.appendVersion(spark, kPath,
      emb.filter(col("vec_id") >= 200 && col("vec_id") < 260), 1L)
    def kOut() = graft.ml.KnnGraph.searchIndex(spark, kPath, iq, k = 3)
      .orderBy("q_id", "nbr").collect().map(_.toSeq.toVector).toVector
    val kBefore = kOut()
    IndexMaintenance.recover(spark, IndexMaintenance.Knn, kPath)
    // prune FIRST: compactVectors folds only vector batches at or below
    // the OLDEST retained version (history still reachable by a
    // committed snapshot must not be folded away under it)
    val dropped = IndexMaintenance.prune(spark, IndexMaintenance.Knn, kPath, keep = 1)
    assert(dropped === Seq(0L), s"expected version 0 pruned, got $dropped")
    assert(IndexMaintenance.compact(spark, IndexMaintenance.Knn, kPath) >= 1)
    assert(kOut() === kBefore)

    // --- community ----------------------------------------------------
    val cPath = tmp("im-comm")
    val e1 = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val e2 = Seq((3L, 4L)).toDF("src", "dst")
    CommunityIndex.build(Seq(1L, 2L, 3L, 9L).toDF("id"), e1, cPath)
    CommunityIndex.append(Seq(4L).toDF("id"), e2, cPath)
    def cOut() = CommunityIndex.labels(spark, cPath)
      .orderBy("id").collect().map(_.toSeq.toVector).toVector
    val cBefore = cOut()
    // a torn adjacency delta above the head must be swept by the facade verb
    Seq((8L, 9L)).toDF("src", "dst")
      .write.mode("overwrite").parquet(s"$cPath/adj/batch=9")
    IndexMaintenance.recover(spark, IndexMaintenance.Community, cPath)
    assert(graft.streaming.VersionedState
      .versions(spark, s"$cPath/adj", "batch=").forall(_ <= 1L),
      "torn adjacency delta survived recover")
    assert(IndexMaintenance.compact(spark, IndexMaintenance.Community, cPath) === 1)
    assert(IndexMaintenance.prune(spark, IndexMaintenance.Community, cPath) === Nil)
    assert(cOut() === cBefore)
  }
}
