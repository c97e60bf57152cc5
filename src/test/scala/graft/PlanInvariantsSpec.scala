package graft

import org.apache.spark.sql.functions._

/** Plan-shape regression guards: the scale properties claimed in
  * SCALE.md/PLANS.md, asserted on the actual physical plans so a future
  * refactor cannot silently lose them. */
class PlanInvariantsSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("tpch_q1/q6: ship-date predicates reach PushedFilters") {
    assert(plan("tpch_q1").contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    // PushedFilters renders truncated; the pushed range is visible in
    // the Filter condition text
    assert(plan("tpch_q6").contains(">= 1997-01-01 00:00:00"))
  }

  test("tpch_q3/q5: dimension sides broadcast, fact scans column-pruned") {
    val q3 = plan("tpch_q3")
    assert(q3.contains("BroadcastHashJoin"))
    assert(q3.contains("EqualTo(c_mktsegment,BUILDING)"))
    // lineitem scan must not read all 11 columns
    assert(q3.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double,l_shipdate"))
    assert(plan("tpch_q5").contains("EqualTo(r_name,ASIA)"))
  }

  test("v3 top-k: corpus has no exchange before the broadcast join") {
    val p = plan("v3_cosine_topk")
    val joinIdx = p.indexOf("BroadcastNestedLoopJoin") max p.indexOf("BroadcastHashJoin")
    assert(joinIdx >= 0, p.take(400))
    // the stream (corpus) side below the join must be a bare scan+filter,
    // not an Exchange
    val below = p.substring(joinIdx)
    assert(!below.contains("Exchange hashpartitioning(vec_id"), below.take(600))
  }

  test("dedup self-joins keep their materialization exchanges") {
    // salted Jaccard join: both sides pinned to a fixed-width exchange on
    // (lang, band, salt) — the barrier that materializes the shingle
    // arrays AND defeats AQE's bytes-based coalescing of a CPU-bound
    // join. Since r9 the registered queries consume the session-
    // memoized CHECKPOINT of this build (their plans are a LogicalRDD
    // scan), so the invariant is asserted on the build plan itself.
    val j = operators.DedupOps.jaccardPairsBuild(spark, sf, 0.5)
      .queryExecution.executedPlan.toString
    assert(j.contains("REPARTITION_BY_NUM"), j.take(600))
    assert(j.contains("salt"), j.take(600))
    // r15 opt: cappedBucketPairs pins its windowed candidate relation
    // (localCheckpoint), which subsumes the old REPARTITION_BY_COL
    // materialization barrier — the signature compute now runs exactly
    // once and every self-join side reads the checkpoint RDD. The
    // invariant is the stronger one: both join sides scan an RDD, and
    // no exchange below the join recomputes the simhash.
    val sh = plan("dedup_simhash")
    // every pair-generation path (normal a/b sides + hot star) reads the
    // checkpoint: ≥3 RDD scans, zero parquet scans / signature exprs
    assert("Scan ExistingRDD".r.findAllIn(sh).size >= 3, sh.take(600))
    assert(!sh.contains("Scan parquet"), sh.take(600))
  }

  test("q4 EXISTS plans as a semi join; q10 top-20 avoids a global sort") {
    val q4 = plan("tpch_q4")
    assert(q4.contains("LeftSemi"), q4.take(400))
    val q10 = plan("tpch_q10")
    assert(q10.contains("TakeOrderedAndProject"), q10.take(400))
  }

  test("q21 double self-probe plans semi + anti equi joins, never nested-loop") {
    val p = plan("tpch_q21")
    assert(p.contains("LeftSemi"), p.take(600))
    assert(p.contains("LeftAnti"), p.take(600))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p.take(600))
  }

  test("q19 disjunctive join extracts the equi-condition (hash, not nested-loop)") {
    val p = plan("tpch_q19")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(!p.contains("NestedLoop"), p.take(600))
  }

  test("q18 aggregates lineitem before joining the wider tables") {
    val p = plan("tpch_q18")
    // the HAVING filter sits on the aggregate output, which then builds
    // a broadcast side — orders is never shuffled on orderkey
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(!p.contains("Exchange hashpartitioning(o_orderkey"), p.take(900))
  }

  test("o6 argmin is a partial aggregate, not a window sort") {
    val p = plan("o6_argmin")
    assert(p.contains("partial_min") || p.contains("partial_"), p.take(400))
    assert(!p.contains("Window"), p.take(400))
  }

  test("neardup_embedding joins equi on the triangle cell, never nested-loop") {
    val p = plan("neardup_embedding")
    assert(!p.contains("CartesianProduct"), p.take(800))
    // the pair join itself must be hash/sort-merge on the cell id; the
    // only broadcasts are the 36-row cell map
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p.take(800))
  }

  test("bpe rounds never hash-shuffle the corpus text (checkpoint, not repartition)") {
    val p = plan("bpe_train_merges")
    // the merged round-1 corpus is served from one localCheckpoint
    // materialization (an ExistingRDD scan) to all three consumers...
    assert(p.contains("Scan ExistingRDD") || p.contains("InMemoryTableScan"),
      p.take(800))
    // ...and no per-round hash exchange carries the text column (the
    // only permissible text movers are the initial scan-spread
    // round-robin; pair-count exchanges carry (a, b) digest rows only)
    val offenders = p.split('\n').filter(l =>
      l.contains("Exchange hashpartitioning") && l.contains("text"))
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("exact-substring: no exchange carries text; dup-seed membership is broadcast") {
    val p = plan("dedup_exact_substring")
    // the corpus text moves only in the initial scan-spread round-robin;
    // every hash exchange carries digests/positions, never the document
    val offenders = p.split('\n').filter(l =>
      l.contains("Exchange hashpartitioning") && l.contains("text"))
    assert(offenders.isEmpty, offenders.mkString("; "))
    // the df>=minFreq seed set probes in place (no pair join exists)
    assert(p.contains("LeftSemi"), p.take(800))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p.take(800))
  }

  test("beam curve plan stays lineage-cut (the r10 516-exchange blowup)") {
    // without per-hop localCheckpoints the unrolled hop/width stages
    // re-expand every prior hop once per consumer: 516 exchanges for
    // ≤50-row-per-stage tables. Checkpointed + shared hop-1 ≈ 24.
    val n = plan("ann_beam_search_graph").split('\n')
      .count(_.contains("Exchange hashpartitioning"))
    assert(n < 60, s"beam plan re-expanded its hop lineage: $n exchanges")
  }

  test("no registered query plans a CartesianProduct (sweep)") {
    // BroadcastNestedLoopJoin with a provably-tiny broadcast side is
    // acceptable (e.g. v3's 5-row query set against the streamed corpus);
    // an unhinted CartesianProduct never is.
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val p = plan(name)
      if (p.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"CartesianProduct in: $offenders")
  }

  test("q2 min-cost equality joins broadcast; the fact scans once") {
    val p = plan("tpch_q2")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p.take(800))
    // r15 opt: the per-(part, supp) cost aggregate is pinned (it feeds
    // the min-cost build AND the equality probe), so the consumer plan
    // reads the checkpoint — already reduced to the 3 needed columns.
    // The 4-column pruned lineitem scan lives in the checkpoint build,
    // executed once.
    assert("""Scan ExistingRDD\[l_partkey#\d+L,l_suppkey#\d+L,cost#\d+\]""".r
      .findFirstIn(p).isDefined, p.take(1200))
  }

  test("q16 complaint list is a broadcast anti join, pairs distinct before countDistinct") {
    val p = plan("tpch_q16")
    assert(p.contains("LeftAnti"), p.take(600))
    assert(p.contains("BroadcastHashJoin"), p.take(600))
  }

  test("q20 dominant-supplier chain ends in a semi join; 1997 range pushes to scan") {
    val p = plan("tpch_q20")
    assert(p.contains("LeftSemi"), p.take(600))
    assert(p.contains("GreaterThanOrEqual(l_shipdate,1997-01-01") ||
           p.contains(">= 1997-01-01 00:00:00"), p.take(1200))
  }

  test("q9/q11 dims broadcast; no fact-side re-shuffle beyond the orderkey join") {
    val q9 = plan("tpch_q9")
    assert(q9.contains("BroadcastHashJoin"), q9.take(600))
    assert(!q9.contains("Exchange hashpartitioning(l_partkey"), q9.take(900))
    val q11 = plan("tpch_q11")
    assert(q11.contains("BroadcastHashJoin"), q11.take(600))
    assert(!q11.contains("CartesianProduct"), q11.take(600))
  }

  test("year-equality predicates are range-rewritten by the extension") {
    val p = Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) === 1998)
      .queryExecution.executedPlan.toString
    assert(p.contains("GreaterThanOrEqual(o_orderdate,1998-01-01"))
  }
}
