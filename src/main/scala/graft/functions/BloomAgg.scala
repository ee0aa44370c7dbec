package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bloom filter over an integral key column as a native Catalyst aggregate:
  * `graft_bloom(key, numBits, numHashes)` returns `array<long>` — the
  * filter's bitset as numBits/64 words.
  *
  * Why this exists: semi-join reduction is THE join move at 100 TB — before
  * shuffling a petabyte fact table into a join, drop the rows whose key
  * cannot possibly match. A set of dim keys too large to broadcast as a
  * hash set still fits as a Bloom bitset (10M keys ≈ 16 MB at 13 bits/key),
  * and the bitset is mergeable (bitwise OR, commutative + idempotent), so
  * it partial-aggregates map-side: each partition ships one bitset, not its
  * keys. The membership probe on the fact side is built from codegen'd
  * built-ins only (xxhash64 / shiftright / element_at — see
  * [[BloomAgg.mightContainSql]]), so the prefilter runs inside
  * WholeStageCodegen at scan speed.
  *
  * Guarantees: no false negatives ever (suite-pinned) — a downstream exact
  * join therefore returns exactly the un-prefiltered result, which is how
  * q_join_bloom keeps a DuckDB oracle despite the probabilistic filter.
  * False positives only cost wasted shuffle rows; at k hashes and n keys in
  * m bits the rate is (1 - e^(-kn/m))^k.
  *
  * Hash scheme (the part both sides must agree on): double hashing with
  * h1 = xxhash64(key) and h2 = xxhash64(key, key) — Spark's multi-arg
  * xxhash64 chains the first hash as the second's seed, so the JVM-side
  * update computes the identical positions via XXH64.hashLong(key,
  * XXH64.hashLong(key, 42)). Both hashes are reduced to non-negative
  * residues mod numBits BEFORE combining (bit i = (r1 + i*r2) mod m):
  * residues are < 2^26, so the combination can never overflow — required
  * because ANSI mode (Spark 4 default) makes long overflow THROW on the
  * SQL side rather than wrap.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && numBits % 64 == 0 && numBits <= (1 << 26),
    s"numBits must be a multiple of 64 in [64, 2^26], got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"numHashes must be in [1, 16], got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType || child.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom expects an integral key column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      val h1 = XXH64.hashLong(key, 42L)
      val h2 = XXH64.hashLong(key, h1)
      val r1 = java.lang.Math.floorMod(h1, numBits.toLong).toInt
      val r2 = java.lang.Math.floorMod(h2, numBits.toLong).toInt
      var i = 0
      while (i < numHashes) {
        val pos = (r1 + i * r2) % numBits
        buf(pos >>> 6) |= (1L << (pos & 63))
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
}

object BloomAgg {
  /** Build from SQL-call arguments: graft_bloom(key, numBits, numHashes). */
  def fromArgs(exprs: Seq[Expression]): BloomAgg = {
    require(exprs.size == 3,
      s"graft_bloom(key, numBits, numHashes) takes 3 args, got ${exprs.size}")
    def intLit(e: Expression, name: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"graft_bloom $name must be an integer literal, got $other")
    }
    BloomAgg(exprs.head, intLit(exprs(1), "numBits"), intLit(exprs(2), "numHashes"))
  }

  /** SQL predicate testing `key` against a bitset column `bf` built by
    * `graft_bloom(_, numBits, numHashes)` — built-ins only, so the probe
    * stays inside WholeStageCodegen. The position arithmetic mirrors
    * [[BloomAgg.update]] exactly (same xxhash64 chain, same floorMod).
    * The key is cast to BIGINT first: update() widens IntegerType keys
    * to long before hashing, while a bare xxhash64(int_col) would use
    * Spark's INT hash path (hashInt) — different h1/h2, silent false
    * negatives. The cast makes both sides hash long semantics for any
    * integral key column. */
  def mightContainSql(key: String, bf: String, numBits: Int, numHashes: Int): String = {
    val m = s"cast($numBits as bigint)"
    val k = s"cast($key as bigint)"
    // NULL keys are "not contained", not "hash of the bare seed": xxhash64
    // skips NULL inputs, so without this guard a NULL probe tests the fixed
    // seed positions and can spuriously pass.
    s"(($key IS NOT NULL) AND " + (0 until numHashes).map { i =>
      val pos = s"pmod(pmod(xxhash64($k), $m) + cast($i as bigint) * " +
        s"pmod(xxhash64($k, $k), $m), $m)"
      s"((shiftright(element_at($bf, cast(shiftright($pos, 6) as int) + 1), " +
        s"cast(pmod($pos, 64) as int)) & 1) = 1)"
    }.mkString("(", " AND ", "))")
  }
}
