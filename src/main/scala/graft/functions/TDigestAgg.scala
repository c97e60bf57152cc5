package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** t-digest buffer: `means`/`weights` hold the compressed centroids
  * (sorted by mean after every compression), `buf` the uncompressed
  * insert scratch, `meta(0)` = live centroid count, `meta(1)` = scratch
  * fill. Arrays are pre-allocated so the per-row reduce is one array
  * write. */
case class TDigestBuf(means: Array[Double], weights: Array[Long],
                      buf: Array[Double], meta: Array[Int])

/** Mergeable t-digest quantile sketch (Dunning & Ertl 2019,
  * arXiv:1902.04023, the merging-digest variant) as a typed
  * `Aggregator` — the skew-tail member of the mergeable-sketch family
  * next to [[KllAgg]]: where KLL's rank error is UNIFORM in q, the
  * t-digest's k1 scale function k(q) = δ/2π·asin(2q−1) compresses
  * centroids in proportion to q(1−q), so tail quantiles (p99/p999 —
  * latency SLOs, outlier budgets) resolve to near-singleton centroids
  * while the middle of the distribution shares fat ones. State is
  * O(δ) (mean, weight) pairs regardless of input size; merge is
  * levelless — concatenate centroid sets and re-compress under the
  * same scale rule — so map-side partial aggregation ships one digest
  * per partition across the exchange, never the values.
  *
  * Determinism: centroid MEANS are floating-point and depend on Spark's
  * partial-aggregation order, so per-run estimates may differ in low
  * bits — which is exactly why the registered query follows the
  * a_approx_sketch_contract discipline (each engine checks its OWN
  * estimate against its OWN exact ranks; only the boolean claim is
  * compared) with a ±2 % rank window the δ = 200 digest clears by an
  * order of magnitude (TDigestAggSpec pins ≤ 1 % on adversarial orders
  * and ≤ 0.2 % at the tails). Weights are exact BIGINTs: compression
  * preserves total weight bit-for-bit (spec-pinned merge law).
  *
  * Input is (group key, value) tuples from groupByKey — reduce reads
  * `_2` (the [[CmsAgg]] flat-tuple discipline); finish returns one
  * estimate per e6-scaled rank requested at construction, as the
  * rounded mean of the centroid whose cumulative weight reaches the
  * target rank (the windowed rank contract absorbs the rounding). */
class TDigestAgg(delta: Int, qsE6: Seq[Long])
    extends Aggregator[(String, Long), TDigestBuf, Array[Long]] {
  require(delta >= 16, s"need delta >= 16: $delta")
  require(qsE6.nonEmpty && qsE6.forall(q => q >= 0L && q <= 1000000L),
    s"quantiles must be e6-scaled in [0, 1e6]: $qsE6")

  private val scratch = 4 * delta // insert buffer between compressions
  // k1 emits ≤ ceil(δ/2) + 1 centroids; headroom for the walk's carry
  private val maxCentroids = delta / 2 + 4

  override def zero: TDigestBuf = TDigestBuf(
    new Array[Double](maxCentroids), new Array[Long](maxCentroids),
    new Array[Double](scratch), Array(0, 0))

  private def kFn(q: Double): Double =
    delta / (2.0 * math.Pi) * math.asin(2.0 * q - 1.0)
  private def kInv(k: Double): Double =
    (math.sin(k * 2.0 * math.Pi / delta) + 1.0) / 2.0

  /** Sort live centroids + scratch singletons by value and re-merge
    * under the k1 budget: a centroid may absorb its successor only
    * while the merged cumulative quantile stays inside one k-unit of
    * the current centroid's left edge. Returns a buffer with an empty
    * scratch. */
  private def compress(b: TDigestBuf): TDigestBuf = {
    val nC = b.meta(0)
    val nB = b.meta(1)
    val n = nC + nB
    if (n == 0) return b
    val ms = new Array[Double](n)
    val ws = new Array[Long](n)
    System.arraycopy(b.means, 0, ms, 0, nC)
    System.arraycopy(b.weights, 0, ws, 0, nC)
    var i = 0
    while (i < nB) { ms(nC + i) = b.buf(i); ws(nC + i) = 1L; i += 1 }
    // indirect sort by mean (centroids are few; boxing here is off the
    // per-row path — it runs once per `scratch` inserts)
    val order = Array.range(0, n).sortBy(ms(_))
    var total = 0L
    i = 0
    while (i < n) { total += ws(i); i += 1 }
    val outM = new Array[Double](math.max(maxCentroids, n))
    val outW = new Array[Long](math.max(maxCentroids, n))
    var nOut = 0
    // current accumulating centroid (weighted mean carried exactly as
    // sum to limit drift)
    var curSum = ms(order(0)) * ws(order(0))
    var curW = ws(order(0))
    var cumBefore = 0L // weight emitted before the current centroid
    var qLimit = kInv(kFn(0.0) + 1.0)
    i = 1
    while (i < n) {
      val w = ws(order(i))
      val proposed = (cumBefore + curW + w).toDouble / total
      if (proposed <= qLimit) {
        curSum += ms(order(i)) * w
        curW += w
      } else {
        outM(nOut) = curSum / curW; outW(nOut) = curW; nOut += 1
        cumBefore += curW
        qLimit = kInv(kFn(cumBefore.toDouble / total) + 1.0)
        curSum = ms(order(i)) * w
        curW = w
      }
      i += 1
    }
    outM(nOut) = curSum / curW; outW(nOut) = curW; nOut += 1
    TDigestBuf(outM, outW, b.buf, Array(nOut, 0))
  }

  override def reduce(b: TDigestBuf, in: (String, Long)): TDigestBuf = {
    val c = if (b.meta(1) == b.buf.length) compress(b) else b
    c.buf(c.meta(1)) = in._2.toDouble
    c.meta(1) += 1
    c
  }

  override def merge(l: TDigestBuf, r: TDigestBuf): TDigestBuf = {
    val lc = compress(l)
    val nL = lc.meta(0)
    val nR = r.meta(0)
    val nB = r.meta(1)
    val ms = new Array[Double](nL + nR)
    val ws = new Array[Long](nL + nR)
    System.arraycopy(lc.means, 0, ms, 0, nL)
    System.arraycopy(lc.weights, 0, ws, 0, nL)
    System.arraycopy(r.means, 0, ms, nL, nR)
    System.arraycopy(r.weights, 0, ws, nL, nR)
    // r's scratch singletons ride along in the merged buffer's scratch
    val buf = new Array[Double](math.max(scratch, nB))
    System.arraycopy(r.buf, 0, buf, 0, nB)
    compress(TDigestBuf(ms, ws, buf, Array(nL + nR, nB)))
  }

  override def finish(b0: TDigestBuf): Array[Long] = {
    val b = compress(b0)
    val n = b.meta(0)
    if (n == 0) return Array.empty[Long]
    var total = 0L
    var i = 0
    while (i < n) { total += b.weights(i); i += 1 }
    qsE6.map { q =>
      // smallest centroid whose cumulative weight reaches ceil(q·W) —
      // the same walk KllAgg uses, over (mean, weight) pairs
      val target = math.max(1L, (q * total + 999999L) / 1000000L)
      var cum = 0L
      var j = 0
      var out = b.means(n - 1)
      var done = false
      while (j < n && !done) {
        cum += b.weights(j)
        if (cum >= target) { out = b.means(j); done = true }
        j += 1
      }
      math.round(out)
    }.toArray
  }

  override def bufferEncoder: Encoder[TDigestBuf] = ExpressionEncoder[TDigestBuf]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
