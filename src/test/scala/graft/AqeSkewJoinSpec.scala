package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Evidence that AQE's runtime skew-join handling fires on a hot key —
  * the complement to `j_skew_salted_join` (static salting): at 100 TB
  * you salt the keys you KNOW are hot and let AQE split the ones you
  * don't. The spec builds a synthetically skewed join (one key carrying
  * ~95% of the rows), tunes the skew thresholds down to fixture scale,
  * and asserts (a) the final adaptive plan actually split the skewed
  * partition (`skew=true` + `AQEShuffleRead skewed`) and (b) results
  * are identical to the non-adaptive join — AQE must never change
  * answers.
  *
  * Caveat this spec encodes deliberately: OptimizeSkewedJoin only fires
  * when the join's output partitioning is not required downstream — an
  * aggregation on the join key right after the join suppresses the
  * split (splitting would break co-partitioning and force an extra
  * shuffle). That is WHY `j_skew_salted_join` exists: static salting
  * handles the skewed-join-feeding-an-agg shape AQE declines.
  */
class AqeSkewJoinSpec extends SparkSpec {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("OptimizeSkewedJoin splits the hot key and preserves results") {
    // key 0: 200k rows (several MB post-shuffle); keys 1..50: 200 each
    def left = spark.range(200000).select(lit(0L).as("k"), col("id").as("lv"))
      .unionAll(spark.range(10000).select((col("id") % 50 + 1).as("k"), col("id").as("lv")))
    def right = spark.range(51).select(col("id").as("k"), (col("id") * 7).as("rv"))

    def sortedRows(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq

    var adaptive: Seq[(Long, Long, Long)] = Seq.empty
    var planStr = ""
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "100KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val joined = left.join(right, "k")
      adaptive = sortedRows(joined.collect())
      joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => planStr = a.executedPlan.toString
        case p                        => planStr = p.toString
      }
    }
    assert(planStr.contains("skew=true"),
      s"AQE did not mark the skewed SMJ partition:\n${planStr.take(1200)}")
    assert(planStr.contains("AQEShuffleRead skewed"), planStr.take(1200))

    var static: Seq[(Long, Long, Long)] = Seq.empty
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      static = sortedRows(left.join(right, "k").collect())
    }
    assert(adaptive == static, "AQE skew split changed the join result")
  }
}
