package graft.queries

import graft.SparkSpec
import graft.tools.ScaleProbe

/** Pins the empirical scale-growth story SCALE_GROWTH.json documents: the
  * banded dedup family's pairing work tracks the answer size while the
  * brute-force witness pays the full n^2 comparison bill on the same
  * corpus. Measured between sf0.01 (500 docs / 500 vectors) and sf0.1
  * (5000 docs / 2000 vectors) — the two corpus sizes that actually differ.
  *
  * Thresholds carry ~1.5x headroom over the measured values (see
  * SCALE_GROWTH.json) so corpus regeneration noise doesn't flake, while a
  * banding regression to all-pairs (joinRows ~ brutePairs) overshoots
  * them by orders of magnitude.
  */
class ScaleGrowthSuite extends SparkSpec {

  private def m(q: String, sf: String): ScaleProbe.Measure =
    cache.getOrElseUpdate((q, sf), ScaleProbe.measure(spark, s"/root/testdata/$sf", q))
  private val cache =
    scala.collection.mutable.Map[(String, String), ScaleProbe.Measure]()

  private def exponent(q: String, metric: ScaleProbe.Measure => Long): Double = {
    val a = m(q, "sf0.01"); val b = m(q, "sf0.1")
    math.log(metric(b).toDouble / metric(a)) / math.log(b.n.toDouble / a.n)
  }

  test("witness: brute-force embed pays exactly quadratic comparisons") {
    // BNLJ comparisons = |left| x |right|: 4x the vectors -> 16x the work
    assert(exponent("q_dedup_embed", _.cmpRowsMax) >= 1.9,
      "the probe must be able to SEE quadratic growth for the banded claims to mean anything")
  }

  test("banded shingle families: pairing work grows near-linearly, far under the n^2 line") {
    for (q <- Seq("q_dedup_minhash_xxh", "q_dedup_minhash_sketch_xxh",
        "q_dedup_winnow_xxh", "q_dedup_incremental")) {
      val big = m(q, "sf0.1")
      // heaviest pairing stage touches < 1% of all possible pairs
      assert(big.joinRowsMax < 0.01 * big.brutePairs,
        s"$q: ${big.joinRowsMax} pairing rows vs ${big.brutePairs} brute pairs")
      // and grows ~linearly in corpus size (measured 0.95-1.38; brute is 2.0)
      val e = exponent(q, _.joinRowsMax)
      assert(e <= 1.5, s"$q pairing-work growth exponent $e")
    }
  }

  test("simhash64: candidate amplification stays constant even as the answer grows") {
    // this corpus's hamming<=7 answer itself grows ~n^2 (template clusters
    // scale with the corpus), so ANY correct operator emits ~n^2 pairs —
    // the banding claim is that candidates track the ANSWER, not the n^2
    // search space: joinRows / (outRows + n) measured 1.4-1.9, flat
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val x = m("q_dedup_simhash64", sf)
      assert(x.joinRowsMax <= 3.0 * (x.outRows + x.n),
        s"$sf: ${x.joinRowsMax} candidates for ${x.outRows} true pairs")
    }
  }

  test("embed LSH: bucketing prunes the all-pairs line at every measured size") {
    // weak-threshold regime (cos >= 0.4, the docstring's acknowledged
    // recall/selectivity trade) — still must beat brute force, and the
    // margin must not COLLAPSE as the corpus grows
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val x = m("q_dedup_embed_lsh", sf)
      assert(x.joinRowsMax < 0.5 * x.brutePairs,
        s"$sf: bucket join ${x.joinRowsMax} vs brute ${x.brutePairs}")
    }
  }
}
