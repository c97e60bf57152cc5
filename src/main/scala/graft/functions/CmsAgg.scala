package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed Count-Min sketch build as a typed `Aggregator`: the
  * buffer is the `depth × width` counter matrix flattened to one
  * `Array[Long]`; each input row increments one counter per sketch row,
  * partitions merge by element-wise addition — map-side partial
  * aggregation moves one fixed-size matrix per partition across the
  * exchange, never the keys (the [[BloomAgg]] discipline, with counters
  * instead of bits).
  *
  * Like BloomAgg, the row hashes are computed by Catalyst BEFORE the
  * aggregate ([[CmsFns.keyHashes]]: seed-perturbed `xxhash64`) and the
  * ESTIMATE side ([[CmsFns.estimate]]) recomputes the same expressions
  * as pure builtin SQL (`least` over `element_at` lookups) — probing
  * stays inside whole-stage codegen with no UDF.
  *
  * The CMS estimate never undercounts (Cormode & Muthukrishnan 2005:
  * collisions only ADD), which is the property the heavy-hitters query
  * leans on: filtering candidates by `estimate ≥ threshold` can admit
  * false positives but can never drop a true heavy hitter, so a cheap
  * exact pass over the candidates alone recovers the exact answer. At
  * 100 TB the sketch is `depth*width*8` bytes on the wire (32 KB here)
  * regardless of key cardinality — the whole point vs. an exact
  * group-by of every key.
  */
class CmsAgg(width: Int, depth: Int)
    extends Aggregator[(Long, Long, Long, Long), Array[Long], Array[Long]] {
  require(width >= 2 && depth == 4, s"need width>=2, depth==4: $width x $depth")

  override def zero: Array[Long] = new Array[Long](depth * width)

  // input is a flat 4-long tuple, not Seq[Long]: the tuple encoder reads
  // four primitive fields per row, where a Seq input pays a per-row
  // mapobjects boxing pass in the deserializer (measured ~30% of the
  // whole query at sf0.1)
  override def reduce(b: Array[Long], hs: (Long, Long, Long, Long)): Array[Long] = {
    val w = width.toLong
    b(java.lang.Math.floorMod(hs._1, w).toInt) += 1L
    b(width + java.lang.Math.floorMod(hs._2, w).toInt) += 1L
    b(2 * width + java.lang.Math.floorMod(hs._3, w).toInt) += 1L
    b(3 * width + java.lang.Math.floorMod(hs._4, w).toInt) += 1L
    b
  }

  override def merge(l: Array[Long], r: Array[Long]): Array[Long] = {
    var i = 0
    while (i < l.length) { l(i) += r(i); i += 1 }
    l
  }

  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object CmsFns {

  /** One independent 64-bit engine hash per sketch row: `xxhash64(key,
    * d)` for row d — the seed-perturbation trick BloomFns uses. Build
    * and estimate share these expressions verbatim; `xxhash64` is
    * type-sensitive, so the probe key column must match the build key's
    * Catalyst type exactly. */
  def keyHashes(key: Column, depth: Int): Seq[Column] =
    (0 until depth).map(d => xxhash64(key, lit(d)))

  /** Point-frequency estimate against a sketch column built by
    * [[CmsAgg]]: `min` over the key's counter in each sketch row,
    * expressed entirely in builtin SQL (`least` of `element_at`
    * lookups) so the probe is codegen'd. */
  def estimate(cmsCol: String, keyCol: String, width: Int, depth: Int): Column =
    least((0 until depth).map { d =>
      expr(s"element_at($cmsCol, ${d * width} + " +
           s"cast(pmod(xxhash64($keyCol, $d), $width) as int) + 1)")
    }: _*)
}
