package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** LayoutOps: bucketed co-location, CDC type-1 apply, k-anonymity. */
class LayoutOpsSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import graft.operators.LayoutOps

  test("j_bucketed_colocated: the fact-fact join plan contains ZERO shuffle exchanges") {
    // Forbid broadcast so the join must be the merge join the bucket
    // layout enables; with both sides bucketed+sorted by the key there
    // is nothing left to shuffle.
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = LayoutOps.queries("j_bucketed_colocated")(spark, sf)
      df.collect() // force AQE to finalize the plan
      val plan = df.queryExecution.executedPlan
      // the ONLY permissible shuffle is the final tiny agg/orderBy on the
      // handful of priority groups ABOVE the join; between the bucketed
      // scans and the join there must be no exchange at all.
      val joins = collect(plan) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(joins.size == 1, s"expected one SortMergeJoin, got ${joins.size}")
      val belowJoin = joins.head.children.flatMap(c =>
        collect(c) { case e: ShuffleExchangeExec => e })
      assert(belowJoin.isEmpty,
        s"bucketed scans re-shuffled:\n${belowJoin.mkString("\n")}")
      // and the join actually consumed the bucket distribution
      val scans = collect(plan) {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.bucketSpec.isDefined => s
      }
      assert(scans.size == 2, s"expected 2 bucketed scans, got ${scans.size}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  test("j_bucketed_colocated equals the same join on the raw tables") {
    val bucketed = LayoutOps.queries("j_bucketed_colocated")(spark, sf).collect()
    val raw = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
           round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
             .as("revenue"))
      .orderBy(col("o_orderpriority")).collect()
    assert(bucketed.toSeq == raw.toSeq)
  }

  test("cdc_scd1_snapshot: deleted keys absent, surviving keys carry their latest value") {
    import spark.implicits._
    val snap = graft.operators.LayoutOps.queries("cdc_scd1_snapshot")(spark, sf)
    val ev = Tables.events(spark, sf)
    // every user whose LAST event (by ts, event_id) is an error must be
    // absent; everyone else present exactly once
    val lastOp = ev
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"user_id")
          .orderBy($"ts".desc, $"event_id".desc)))
      .filter($"rn" === 1)
      .select($"user_id", ($"event_type" === "error").as("deleted"))
    val joined = lastOp.join(snap, Seq("user_id"), "left")
      .select($"user_id", $"deleted", $"last_value".isNotNull.as("present"))
      .collect()
    joined.foreach { r =>
      assert(r.getBoolean(1) != r.getBoolean(2),
        s"user ${r.getLong(0)}: deleted=${r.getBoolean(1)} but present=${r.getBoolean(2)}")
    }
    assert(snap.groupBy($"user_id").count().filter($"count" > 1).count() == 0)
  }

  test("layout_zorder_cluster: Z-curve prefix property bounds BOTH dimension envelopes") {
    import spark.implicits._
    val buckets = LayoutOps.queries("layout_zorder_cluster")(spark, sf).collect()
    assert(buckets.nonEmpty)
    // 64 z-slots per bucket = 3 free bits per dimension: within any
    // bucket each dimension spans an aligned 8-block. This is the
    // pruning guarantee — a predicate on EITHER dim eliminates every
    // bucket whose 8-wide envelope misses it.
    buckets.foreach { r =>
      val (uSpan, dSpan) =
        (r.getLong(3) - r.getLong(2), r.getLong(5) - r.getLong(4))
      assert(uSpan <= 7, s"bucket ${r.getLong(0)}: user span $uSpan > 7")
      assert(dSpan <= 7, s"bucket ${r.getLong(0)}: day span $dSpan > 7")
    }
    // mass conservation: bucketing is a partition of all events
    val total = buckets.map(_.getLong(1)).sum
    assert(total == Tables.events(spark, sf).count())
    // the 21-bit interleave aliases ids 2^21 apart into one z-bucket,
    // which would silently void the envelope bound above — pin the real
    // id domain under the interleave width so a testdata regeneration
    // with wider ids fails here, not at the oracle gate
    val maxId = Tables.events(spark, sf)
      .agg(org.apache.spark.sql.functions.max($"user_id")).head.getLong(0)
    assert(maxId < (1L << 21),
      s"user_id domain $maxId outruns the 21-bit Morton interleave — widen LayoutOps.layout_zorder_cluster")
  }

  test("streaming_foreachbatch_merge: final merged state equals the batch group-by") {
    val got = graft.streaming.StreamingOps
      .queries("streaming_foreachbatch_merge")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // three micro-batches (one file each), disjoint keys: the merged
    // state must equal the all-at-once aggregate of the fixture
    assert(got.toSeq == Seq(
      ("b1", 2L, 1450L, 2L),
      ("b2", 3L, 1550L, 5L),
      ("b3", 1L, 4000L, 6L)))
  }

  test("privacy_k_anonymity: every released group has n >= k, suppressed mass conserved") {
    import spark.implicits._
    val k = 8
    val out = graft.operators.LayoutOps.queries("privacy_k_anonymity")(spark, sf)
    val released = out.filter($"lang" =!= "*")
    assert(released.filter($"n" < k).count() == 0, "released group below k")
    val total = out.agg(sum($"n")).collect()(0).getLong(0)
    assert(total == Tables.documents(spark, sf).count(), "suppression lost rows")
  }
}
