package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a typed `Aggregator`: the buffer is a
  * k-capped list of (score, id), merged pairwise — so the aggregate
  * PARTIAL-AGGREGATES map-side and the exchange moves at most k rows
  * per group per partition, regardless of group size.
  *
  * This is the swap SCALE.md prescribes for window `row_number() <= k`
  * at extreme per-group cardinality: the window form sorts each
  * partition's full group (shuffling every row to one task first);
  * this form never materializes more than k entries anywhere. For the
  * engine's own queries the window form is fine (groups are small) and
  * stays SQL-expressible for the oracle — this is the extension point,
  * equivalence-tested against the window form.
  *
  * Ordering: descending score, ascending id on ties (the same
  * deterministic order every top-k query in the engine uses).
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def cap(xs: List[(Double, Long)]): List[(Double, Long)] =
    xs.sortWith(lt).take(k)

  override def zero: List[(Double, Long)] = Nil
  override def reduce(b: List[(Double, Long)], a: (Double, Long)): List[(Double, Long)] =
    cap(a :: b)
  override def merge(l: List[(Double, Long)], r: List[(Double, Long)]): List[(Double, Long)] =
    cap(l ++ r)
  override def finish(b: List[(Double, Long)]): Seq[(Double, Long)] = b.sortWith(lt)
  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
