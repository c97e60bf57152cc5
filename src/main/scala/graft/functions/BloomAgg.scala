package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed Bloom-filter build as a typed `Aggregator`: the buffer is
  * the bitset itself (`Array[Long]`, `numBits/64` words), each input row
  * sets `numHashes` bits, partitions merge by bitwise OR — so the build
  * partial-aggregates map-side and the exchange moves one fixed-size
  * bitset per partition, never the keys.
  *
  * The input is the PAIR of engine hashes `(xxhash64(key),
  * xxhash64(key, 1))` computed by Catalyst *before* the aggregate (see
  * [[BloomFns.keyHashes]]), and membership probes recompute the same two
  * expressions — build and probe share one hash definition with no
  * dependence on Spark internals. Bit positions use standard double
  * hashing `h1 + i*h2 (mod numBits)` (Kirsch & Mitzenmacher 2006), the
  * same scheme Spark's own `BloomFilterImpl`/Guava use.
  *
  * This is the explicit form of the runtime-filter pattern Spark applies
  * automatically in `InjectRuntimeFilter`: at 100 TB the probe side is
  * pruned by a broadcast of `numBits/8` bytes (fixed, key-count
  * independent) BEFORE its shuffle, and the residual exact semi join
  * then runs on the survivors only. Sizing rule: ~14.4 bits/key gives
  * ~0.1% false positives; size from a runtime key count in production
  * (the test queries fix 2^17 bits for their dims).
  */
class BloomAgg(numBits: Int, numHashes: Int)
    extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
  require(numBits % 64 == 0 && numBits > 0, s"numBits must be a positive multiple of 64: $numBits")

  override def zero: Array[Long] = new Array[Long](numBits / 64)

  override def reduce(bits: Array[Long], h: (Long, Long)): Array[Long] = {
    // pre-mod each hash into [0, numBits) BEFORE the double-hash combine:
    // h1 + i*h2 over raw 64-bit hashes can overflow a long, and the probe
    // side (ANSI SQL) would throw where JVM arithmetic wraps — reducing
    // first keeps both sides overflow-free and bit-for-bit identical.
    val b1 = java.lang.Math.floorMod(h._1, numBits.toLong)
    val b2 = java.lang.Math.floorMod(h._2, numBits.toLong)
    var i = 0
    while (i < numHashes) {
      val pos = ((b1 + i.toLong * b2) % numBits).toInt
      bits(pos >> 6) |= (1L << (pos & 63))
      i += 1
    }
    bits
  }

  override def merge(l: Array[Long], r: Array[Long]): Array[Long] = {
    var i = 0
    while (i < l.length) { l(i) |= r(i); i += 1 }
    l
  }

  override def finish(bits: Array[Long]): Array[Long] = bits
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object BloomFns {

  /** The shared build/probe hash pair: two independent 64-bit engine
    * hashes of the key (plain and seed-perturbed xxhash64). Pure
    * builtin Catalyst expressions — codegen'd on the probe scan.
    *
    * `xxhash64` is TYPE-sensitive: build and probe key columns must have
    * identical Catalyst types (e.g. both BIGINT), or the filter silently
    * drops every row — cast one side before calling when schemas differ. */
  def keyHashes(key: Column): (Column, Column) =
    (xxhash64(key), xxhash64(key, lit(1)))

  /** Membership probe against a bitset column built by [[BloomAgg]],
    * expressed entirely in builtin SQL expressions (element_at +
    * shiftleft bit test per double-hashed position) so the probe stays
    * inside whole-stage codegen — no UDF, no custom expression.
    *
    * `bloomCol` names an `Array[Long]` column; `keyCol` names the probe
    * key column (any xxhash64-able type). `numBits`/`numHashes` must
    * match the build side. */
  def mightContain(bloomCol: String, keyCol: String, numBits: Int, numHashes: Int): Column =
    (0 until numHashes).map { i =>
      // mirrors BloomAgg.reduce exactly: both hashes pre-modded into
      // [0, numBits) before combining, so the sum stays < 6*numBits and
      // never overflows under ANSI arithmetic
      val pos = s"pmod(pmod(xxhash64($keyCol), ${numBits}L) + " +
                s"${i}L * pmod(xxhash64($keyCol, 1), ${numBits}L), ${numBits}L)"
      expr(s"(element_at($bloomCol, cast($pos div 64 as int) + 1) & " +
           s"shiftleft(1L, cast($pos % 64 as int))) != 0")
    }.reduce(_ && _)
}
