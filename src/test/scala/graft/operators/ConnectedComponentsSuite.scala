package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Large-star/small-star connected components: correctness against a
  * driver-side union-find witness, and the round bound that justifies the
  * rewrite over plain min-label propagation. */
class ConnectedComponentsSuite extends SparkSpec {

  private def edgesDf(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    pairs.toDF("u", "v")
  }

  /** Independent witness: classic union-find over the same edges. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  /** Force the distributed star machinery (the small-graph fast path
    * would otherwise absorb these fixtures). */
  private def distributed[A](body: => A): A = {
    spark.conf.set("spark.graft.cc.localLimit", "0")
    try body finally spark.conf.unset("spark.graft.cc.localLimit")
  }

  test("star rewriting labels a 64-node chain in <= log2(n) rounds") {
    // the shape that breaks one-hop propagation: a path 0-1-2-...-63 needs
    // 63 propagation passes (the min label travels one hop per pass);
    // star rewriting contracts it in logarithmic rounds
    val chain = (0L until 63L).map(i => (i, i + 1))
    val (labels, rounds) = distributed(ConnectedComponents.run(edgesDf(chain)))
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === (0L to 63L).toSet)
    assert(got.values.forall(_ == 0L), s"all labels must be 0, got $got")
    assert(rounds <= 6,
      s"64-node chain must contract in <= log2(64)=6 rounds, took $rounds")
  }

  test("driver-side fast path (default) equals the star machinery row-for-row") {
    val pairs = (0L until 200L).flatMap(i =>
      Seq((i, (i * 17) % 200), (i, (i + 37) % 200), (i + 500, i + 501)))
      .filter(p => p._1 != p._2)
    val fast = ConnectedComponents.run(edgesDf(pairs))
    assert(fast._2 === 0, "small graph must take the union-find path")
    val star = distributed(ConnectedComponents.run(edgesDf(pairs)))
    assert(star._2 > 0, "localLimit=0 must force star rounds")
    assert(fast._1.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      === star._1.collect().map(r => (r.getLong(0), r.getLong(1))).sorted)
    assert(fast._1.schema === star._1.schema)
  }

  test("components match a union-find witness on a multi-component graph") {
    // three components with different shapes: a triangle {0,1,2}, a star
    // {10..15} around 10, a path {20,21,22,23}, plus self-loop and
    // duplicate edges that must be ignored
    val pairs = Seq[(Long, Long)](
      (1, 0), (2, 1), (0, 2),
      (10, 11), (10, 12), (13, 10), (10, 14), (15, 10),
      (21, 20), (22, 21), (23, 22),
      (5, 5), (1, 0))
    val (labels, _) = ConnectedComponents.run(edgesDf(pairs))
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = unionFind(pairs.filter(p => p._1 != p._2))
    assert(got === want)
  }

  test("deterministic across partitionings") {
    val pairs = (0L until 40L).flatMap(i => Seq((i, (i * 7) % 40), (i, (i + 13) % 40)))
      .filter(p => p._1 != p._2)
    val (a, _) = ConnectedComponents.run(edgesDf(pairs).repartition(1))
    val (b, _) = ConnectedComponents.run(edgesDf(pairs).repartition(7))
    assert(a.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      === b.collect().map(r => (r.getLong(0), r.getLong(1))).sorted)
  }

  test("empty edge frame yields empty labels without looping") {
    val (labels, rounds) = ConnectedComponents.run(
      edgesDf(Seq.empty[(Long, Long)]))
    assert(labels.isEmpty)
    assert(rounds === 0)
  }
}
