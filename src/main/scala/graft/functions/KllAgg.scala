package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KLL sketch buffer: `levels(l)` holds items of weight 2^l with
  * logical fill `sizes(l)` (physical arrays are pre-allocated so the
  * per-row reduce is one array write, not a copy); `meta(0)` is the
  * compaction counter whose parity picks the kept offset — the
  * sketch's only "coin", made deterministic so specs reproduce. */
case class KllBuf(levels: Array[Array[Long]], sizes: Array[Int],
                  meta: Array[Long])

/** Mergeable KLL quantile sketch (Karnin, Lang & Liberty 2016,
  * arXiv:1603.05346) as a typed `Aggregator` — the quantile member of
  * the mergeable-sketch family (BloomAgg / CmsAgg / TopKAgg / the KMV
  * and HLL builds): the buffer is a ladder of compactors, each holding
  * ≤ k items of weight 2^level; a full level sorts, keeps every other
  * item (alternating parity — deterministic here), and promotes the
  * survivors one level up, so the whole sketch is O(k·log(n/k)) longs
  * regardless of input size and merges by levelwise concatenation +
  * the same compaction rule. Map-side partial aggregation moves one
  * sketch per partition across the exchange — never the values — which
  * is the entire point vs. exact `percentile`'s per-group sort at
  * 100 TB.
  *
  * Rank-error contract: with equal level capacity k the estimate's
  * rank is within ε·n of the target for ε ≈ 2·H/k (H = levels used;
  * H = log2(n/k)), so k = 256 holds ε under ~2-4 % through n ~ 1e9;
  * production sizes k up with log(n). The registered query checks the
  * 5 % claim against EXACT ranks computed distributively
  * (`a_approx_sketch_contract`'s each-engine-checks-its-own-sketch
  * oracle discipline); KllAggSpec pins the merge law and the rank
  * error on adversarial orders.
  *
  * Input is (group key, value) tuples from groupByKey — reduce reads
  * `_2` (the [[CmsAgg]] flat-tuple discipline: no Seq boxing). finish
  * returns the quantile estimates for the e6-scaled ranks requested at
  * construction (one array lookup walk over the sorted summary). */
class KllAgg(k: Int, qsE6: Seq[Long])
    extends Aggregator[(String, Long), KllBuf, Array[Long]] {
  require(k >= 8, s"need k >= 8: $k")
  require(qsE6.nonEmpty && qsE6.forall(q => q >= 0L && q <= 1000000L),
    s"quantiles must be e6-scaled in [0, 1e6]: $qsE6")

  private val cap0 = 2 * k // level-0 insert scratch is double-width

  override def zero: KllBuf =
    KllBuf(Array(new Array[Long](cap0)), Array(0), Array(0L))

  private def capacity(level: Int): Int = if (level == 0) cap0 else k

  /** Compact every over-full level bottom-up (a promotion can overfill
    * the level above — the cascade). Mutates/extends in place where
    * possible; returns the (possibly re-allocated) buffer. */
  private def compactCascade(b0: KllBuf): KllBuf = {
    var b = b0
    var l = 0
    while (l < b.levels.length) {
      if (b.sizes(l) > capacity(l) ||
          (l == 0 && b.sizes(0) == cap0)) {
        // sort the level, keep alternating items, promote survivors.
        // Only an EVEN count compacts (weight preservation: c items of
        // weight w become c/2 of weight 2w); an odd count leaves its
        // largest item behind at this level.
        val items = java.util.Arrays.copyOf(b.levels(l), b.sizes(l))
        java.util.Arrays.sort(items)
        val odd = (items.length & 1) == 1
        val c = items.length - (if (odd) 1 else 0)
        val parity = (b.meta(0) & 1L).toInt
        b.meta(0) += 1L
        val nSurv = c / 2
        // ensure the level above exists
        if (l + 1 >= b.levels.length) {
          val lv = java.util.Arrays.copyOf(b.levels, b.levels.length + 1)
          lv(l + 1) = new Array[Long](k)
          val sz = java.util.Arrays.copyOf(b.sizes, b.sizes.length + 1)
          b = KllBuf(lv, sz, b.meta)
        }
        // ensure physical room above (merge can stack > k before cascade)
        val need = b.sizes(l + 1) + nSurv
        if (need > b.levels(l + 1).length)
          b.levels(l + 1) = java.util.Arrays.copyOf(b.levels(l + 1),
            math.max(need, k))
        var i = parity
        var o = b.sizes(l + 1)
        while (i < c) {
          b.levels(l + 1)(o) = items(i); o += 1; i += 2
        }
        b.sizes(l + 1) = o
        if (odd) { b.levels(l)(0) = items(c); b.sizes(l) = 1 }
        else b.sizes(l) = 0
      }
      l += 1
    }
    b
  }

  override def reduce(b: KllBuf, in: (String, Long)): KllBuf = {
    b.levels(0)(b.sizes(0)) = in._2
    b.sizes(0) += 1
    if (b.sizes(0) == cap0) compactCascade(b) else b
  }

  override def merge(l: KllBuf, r: KllBuf): KllBuf = {
    val nLev = math.max(l.levels.length, r.levels.length)
    val lv = new Array[Array[Long]](nLev)
    val sz = new Array[Int](nLev)
    var i = 0
    while (i < nLev) {
      val ln = if (i < l.levels.length) l.sizes(i) else 0
      val rn = if (i < r.levels.length) r.sizes(i) else 0
      val a = new Array[Long](math.max(ln + rn, capacity(i)))
      if (ln > 0) System.arraycopy(l.levels(i), 0, a, 0, ln)
      if (rn > 0) System.arraycopy(r.levels(i), 0, a, ln, rn)
      lv(i) = a; sz(i) = ln + rn
      i += 1
    }
    compactCascade(KllBuf(lv, sz, Array(l.meta(0) + r.meta(0))))
  }

  override def finish(b: KllBuf): Array[Long] = {
    // gather the weighted summary, sorted by value
    var total = 0L
    var n = 0
    var l = 0
    while (l < b.levels.length) { n += b.sizes(l); l += 1 }
    if (n == 0) return Array.empty[Long]
    val vs = new Array[Long](n)
    val ws = new Array[Long](n)
    val idx = new Array[Int](n)
    var o = 0
    l = 0
    while (l < b.levels.length) {
      val w = 1L << l
      var i = 0
      while (i < b.sizes(l)) {
        vs(o) = b.levels(l)(i); ws(o) = w; total += w; o += 1; i += 1
      }
      l += 1
    }
    (0 until n).foreach(i => idx(i) = i)
    val order = idx.sortBy(vs(_))
    qsE6.map { q =>
      // smallest value whose cumulative weight reaches ceil(q·W)
      val target = math.max(1L, (q * total + 999999L) / 1000000L)
      var cum = 0L
      var i = 0
      var out = vs(order(n - 1))
      var done = false
      while (i < n && !done) {
        cum += ws(order(i))
        if (cum >= target) { out = vs(order(i)); done = true }
        i += 1
      }
      out
    }.toArray
  }

  override def bufferEncoder: Encoder[KllBuf] = ExpressionEncoder[KllBuf]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
