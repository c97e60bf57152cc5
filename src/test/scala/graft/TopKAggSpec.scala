package graft

import graft.functions.TopKAgg
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The bounded top-k Aggregator must agree with the window row_number
  * formulation every engine query uses. */
class TopKAggSpec extends SparkSpec {

  test("TopKAgg == window row_number()<=k on the similarity scores") {
    import spark.implicits._
    val c = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val q = c.filter($"vec_id" < 5).select($"vec_id".as("qid"), $"v".as("qv"))
    val scored = c.join(broadcast(q), $"vec_id" =!= $"qid")
      .select($"qid", graft.functions.VectorFns.dot($"qv", $"v").as("score"), $"vec_id")

    val viaWindow = scored
      .withColumn("rank", row_number().over(
        Window.partitionBy($"qid").orderBy(desc("score"), $"vec_id")))
      .filter($"rank" <= 3)
      .select($"qid", $"rank", $"vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    val topk = new TopKAgg(3).toColumn
    val viaAgg = scored.as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(topk.name("top"))
      .flatMap { case (qid, top) =>
        top.zipWithIndex.map { case ((_, id), i) => (qid, i + 1, id) } }
      .collect().toSet

    assert(viaAgg == viaWindow)
  }

  test("partial-aggregation safety: merge order cannot change the result") {
    val agg = new TopKAgg(2)
    val xs = Seq((5.0, 1L), (5.0, 2L), (3.0, 3L), (9.0, 4L))
    // reduce sequentially vs merge of split buffers
    val whole = xs.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = xs.splitAt(2)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(whole) == agg.finish(merged))
    assert(agg.finish(whole) == Seq((9.0, 4L), (5.0, 1L)))
  }
}
