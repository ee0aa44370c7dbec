package graft.queries

import graft.SparkSpec

/** q_dedup_minhash_xxh has no DuckDB oracle (xxhash64 is Spark-side), so
  * correctness is pinned here: soundness against the exact shingle-Jaccard
  * answer and recall of the planted near-dups. */
class MinhashXxhSuite extends SparkSpec {

  private def pairs(q: String, sf: String) =
    LlmOps.queries(q)(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("xxh pairs are sound (subset of exact) with useful recall at sf0.01") {
    val sf = "/root/testdata/sf0.01"
    val exact = pairs("q_dedup_near", sf)
    val xxh = pairs("q_dedup_minhash_xxh", sf)
    assert(exact.nonEmpty)
    // every emitted pair passed the exact-Jaccard verify -> must be exact
    assert(xxh.subsetOf(exact), s"unsound pairs: ${xxh -- exact}")
    // LSH with 4x4 bands at J>=0.8 has per-pair recall >= ~0.41; the
    // planted near-dups sit well above 0.8 so most must be found
    val recall = xxh.size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall (${xxh.size}/${exact.size})")
  }

  test("xxh variant is deterministic across partitionings") {
    val sf = "/root/testdata/sf0.001"
    val a = LlmOps.queries("q_dedup_minhash_xxh")(spark, sf)
      .repartition(1).collect().map(_.toSeq).toSet
    val b = pairs("q_dedup_minhash_xxh", sf)
    assert(a.map(r => (r.head, r(1))) === b.map(p => (p._1, p._2)))
  }
}
