package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregator (SURVEY.md §2.11): streaming-safe mean with
  * an explicit (sum, count) buffer — the shape of the reference's
  * per-segment `np.mean(confidences)` with a null→default policy
  * (`transcription.py:217`), expressed as an `Aggregator` so it
  * partial-aggregates and merges across partitions/micro-batches.
  * Built-ins cover the engine queries; this is the extension point a
  * user reaches for when their aggregate isn't expressible. */
object WeightedMeanAgg extends Aggregator[Option[Double], (Double, Long), Double] {
  val default = 1.0
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), a: Option[Double]): (Double, Long) =
    (b._1 + a.getOrElse(default), b._2 + 1)
  override def merge(l: (Double, Long), r: (Double, Long)): (Double, Long) =
    (l._1 + r._1, l._2 + r._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0) Double.NaN else b._1 / b._2
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
