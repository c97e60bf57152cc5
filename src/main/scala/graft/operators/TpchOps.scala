package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** General relational proof on the star schema (SURVEY.md §7.2 M5) —
  * classic TPC-H-shaped queries demonstrating scan→filter→join→agg→sort
  * capability at bench scale.
  *
  * Scale notes (the part the optimizer can't decide for us):
  *  - q1 is a pure scan + 4-group aggregate: partial aggregation map-side,
  *    a 4-row shuffle. Scales linearly with input; the only knob that
  *    matters at 100 TB is `files.maxPartitionBytes` (split size).
  *  - q3/q5 join fact tables (lineitem, orders) against small dims.
  *    customer/nation/region/supplier are orders-of-magnitude smaller →
  *    `broadcast()` them explicitly so no shuffle of the fact side ever
  *    happens on a dim key. orders↔lineitem is the one genuine shuffle
  *    (both large, equi on orderkey) → sort-merge with AQE skew handling;
  *    at the lake layer both sides would be bucketed by orderkey to make
  *    it shuffle-free.
  *  - Filters are applied before joins so Catalyst pushes them into the
  *    parquet scans (`PushedFilters` on o_orderdate / l_shipdate /
  *    c_mktsegment).
  */
object TpchOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1: pricing summary report (scan + conditional agg).
    "tpch_q1" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
             round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
             round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
             round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
             round(avg(col("l_quantity")), 2).as("avg_qty"),
             round(avg(col("l_extendedprice")), 2).as("avg_price"),
             round(avg(col("l_discount")), 4).as("avg_disc"),
             count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // Q6: forecasting revenue change — pure pushed-filter scan + one
    // global agg, the canonical "filters must reach the footer" query.
    "tpch_q6" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
                col("l_discount").between(0.05, 0.07) &&
                col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
             count(lit(1)).as("n_items"))),

    // Q3: shipping priority (selective dim filter → join → top-10 agg).
    "tpch_q3" -> ((s, dir) => {
      val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit("1997-03-15").cast("timestamp"))
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > lit("1997-03-15").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
    }),

    "tpch_q17" -> ((s, dir) => q17(s, dir)),

    // Q5-shaped: local supplier volume per nation within one region/year.
    // Dims (region→nation→supplier, customer) broadcast; the single big
    // shuffle is lineitem⋈orders on orderkey.
    "tpch_q5" -> ((s, dir) => {
      val nat = Tables.nation(s, dir)
        .join(Tables.region(s, dir).filter(col("r_name") === "ASIA"),
              col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = Tables.supplier(s, dir)
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
      val ord = Tables.orders(s, dir)
        // range form pushes to the parquet scan; year(col) would not
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup),
          col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    }),

    // Q4-shaped: order priority checking — EXISTS correlated subquery
    // over lineitem (adapted to this schema's l_returnflag; the synthetic
    // tables have no commit/receipt dates). Catalyst plans the EXISTS as
    // a LEFT SEMI join: the fact side streams, lineitem is the build/
    // probe side, no row multiplication ever happens.
    "tpch_q4" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
                col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      val returned = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"))
      ord.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // Q12-shaped: priority-split line counts (adapted: this schema has no
    // l_shipmode, so the grouping key is l_returnflag). The interesting
    // plan property: the conditional split happens AFTER the l⋈o shuffle
    // join as two map-side-combinable conditional sums — one pass, no
    // second aggregation per priority class.
    "tpch_q12" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_returnflag"))
      li.join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority")),
              col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
               .otherwise(0)).as("high_line_count"),
             sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
               .otherwise(0)).as("low_line_count"))
        .orderBy(col("l_returnflag"))
    }),

    // Q14-shaped: promo revenue share — broadcast dim join + conditional
    // ratio aggregate. part is the only dim that reaches lineitem scale
    // in real TPC-H; still orders of magnitude under the fact table, so
    // broadcast (at 100 TB: the largest dim that fits the driver's
    // broadcast budget; beyond that, shuffle on partkey with bucketing).
    "tpch_q14" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      li.join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_type"))),
              col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) *
               sum(when(col("p_type") === "PROMO",
                 col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0)) /
               sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
             .as("promo_revenue_pct"),
            count(lit(1)).as("n_items"))
    }),

    // Q18-shaped: large-volume customers — HAVING over a fact aggregate,
    // then joined back to orders/customer. The aggregate-then-semi-join
    // order matters at scale: the groupBy reduces lineitem to one row
    // per qualifying order BEFORE any join touches the wider tables, and
    // the qualifying set (rare orders) broadcasts.
    "tpch_q18" -> ((s, dir) => {
      val big = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
        .filter(col("total_qty") > 300)
      Tables.orders(s, dir)
        .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, dir).select(col("c_custkey"), col("c_name"))),
              col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
                col("o_orderdate"), col("o_totalprice"), col("total_qty"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(100)
    }),

    // Q19-shaped: disjunctive multi-clause predicate join — three OR'd
    // (brand, size-range, quantity-range) clauses. Catalyst extracts the
    // common l_partkey=p_partkey equi-condition so this plans as a hash
    // join with a residual OR filter, NOT a nested-loop join; the
    // disjunction also yields a partkey-independent scan filter on
    // l_quantity (range union) pushed to parquet.
    "tpch_q19" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      li.join(broadcast(Tables.part(s, dir)
                .select(col("p_partkey"), col("p_brand"), col("p_size"))),
          col("l_partkey") === col("p_partkey") && (
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
             col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
             col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
             col("l_quantity").between(20, 30))))
        // coalesce: the selective disjunction can match zero rows at tiny
        // SFs — an empty sum must be 0.0, not NULL (NaN-poisoned compare)
        .agg(round(coalesce(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
                            lit(0.0)), 2).as("revenue"),
             count(lit(1)).as("n_items"))
    }),

    // Q7-shaped: volume shipping between two nations — the same dim
    // (nation) plays TWO roles (supplier's and customer's), so it joins
    // twice under different aliases; both roles broadcast. The year
    // projection happens AFTER the filters so the shipdate range still
    // pushes to the scan.
    "tpch_q7" -> ((s, dir) => {
      val n1 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      val sup = Tables.supplier(s, dir)
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .filter(col("supp_nation").isin("NATION_1", "NATION_2"))
        .select(col("s_suppkey"), col("supp_nation"))
      val cust = Tables.customer(s, dir)
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(col("cust_nation").isin("NATION_1", "NATION_2"))
        .select(col("c_custkey"), col("cust_nation"))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
                col("l_extendedprice"), col("l_discount"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
              col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
                 year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // Q8-shaped: market share — a share-of-total conditional ratio per
    // year (sum(case)/sum), computed in ONE aggregate pass after the
    // join tree; every dim broadcasts, lineitem⋈orders is the only
    // data-scale shuffle.
    "tpch_q8" -> ((s, dir) => {
      val asiaCust = Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)
                .join(Tables.region(s, dir).filter(col("r_name") === "ASIA"),
                      col("n_regionkey") === col("r_regionkey"))
                .select(col("n_nationkey"))),
              col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val supNation = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
                .select(col("n_nationkey"), col("n_name"))),
              col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val std = Tables.part(s, dir).filter(col("p_type") === "STANDARD")
        .select(col("p_partkey"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
                col("l_extendedprice"), col("l_discount"))
        .join(broadcast(std), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, dir)
                .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
                .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
              col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(round(
          sum(when(col("n_name") === "NATION_3",
            col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0)) /
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6)
          .as("mkt_share"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_year"))
    }),

    // Q10-shaped: returned-item reporting — top 20 customers by lost
    // revenue. customer/nation broadcast; TakeOrderedAndProject bounds
    // the sort to 20 rows (no global sort materializes).
    "tpch_q10" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val cust = Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))),
              col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20)
    }),

    // Q13 (adapted: the testdata schema has no o_comment, so the
    // qualifying-order predicate is o_orderpriority <> 'URGENT'):
    // customer order-count distribution — LEFT OUTER with the predicate
    // on the ORDER side of the join (zero-order customers must survive),
    // then a second aggregate over the counts. Both aggregates partial
    // map-side; the outer join is the only shuffle (customer ↔ orders on
    // custkey — at the lake layer both bucketed by custkey).
    "tpch_q13" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderpriority") =!= "URGENT")
        .select(col("o_custkey"), col("o_orderkey"))
      Tables.customer(s, dir).select(col("c_custkey"))
        .join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count")) // count(col) skips nulls
        .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    }),

    // Q15: top supplier(s) by quarterly revenue — the revenue "view" is
    // one fact aggregate; the max is a 1-row broadcast joined back as an
    // equality filter (Catalyst's decorrelation of the standard scalar
    // subquery). supplier is a broadcast dim.
    "tpch_q15" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("mx"))
      rev.join(broadcast(mx), col("total_revenue") === col("mx"))
        .join(broadcast(Tables.supplier(s, dir)), col("supplier_no") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
                round(col("total_revenue"), 2).as("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // Q22 (adapted: no c_phone in the testdata, so "sales opportunity"
    // cohorts are nations, and the dormancy predicate is "no orders
    // since 1998"): positive-balance average as a 1-row broadcast, anti
    // join for dormancy (NOT EXISTS → LeftAnti), nation dim broadcast.
    // Q21-shaped (schema-adapted: no receipt/commit dates, so "late" =
    // shipped > 90 days after order date; n_name in the output group
    // instead of a single-nation filter): suppliers who were the ONLY
    // late supplier on a multi-supplier 'F' order. The hard part is the
    // double fact self-join — EXISTS → left-semi, NOT EXISTS → left-anti,
    // both equi on l_orderkey with the suppkey-inequality as residual;
    // dims broadcast. At scale the two probes reuse the same shuffled
    // l1 relation.
    "tpch_q21" -> ((s, dir) => {
      val l1 = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F"),
              col("o_orderkey") === col("l_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"), col("o_orderdate"))
      val late = l1.filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"))
      val others = l1.select(col("l_orderkey").as("o_k"), col("l_suppkey").as("o_s"))
      val lateOthers = late.select(col("l_orderkey").as("o_k"), col("l_suppkey").as("o_s"))
      late
        .join(others,
          col("o_k") === col("l_orderkey") && col("o_s") =!= col("l_suppkey"), "left_semi")
        .join(lateOthers,
          col("o_k") === col("l_orderkey") && col("o_s") =!= col("l_suppkey"), "left_anti")
        .join(broadcast(Tables.supplier(s, dir)), col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(Tables.nation(s, dir)), col("n_nationkey") === col("s_nationkey"))
        .groupBy(col("s_name"), col("n_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), col("s_name"))
    }),

    "tpch_q22" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg(avg(col("c_acctbal")).as("ab"))
      val recent = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      cust.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("ab"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("numcust"), round(sum(col("c_acctbal")), 2).as("totacctbal"))
        .orderBy(col("n_name"))
    }),

    // Q2-shaped: minimum-cost supplier per part. The testdata has no
    // partsupp table, so the supply relation derives from observed trade:
    // cost(part, supp) = min unit price that supplier ever charged for
    // the part (exactly how a lakehouse would reconstruct a vendor-cost
    // dim from fact history). The correlated min-subquery decorrelates
    // into a per-part min aggregate joined back on cost equality — the
    // min aggregate is tiny (one row per filtered part) and broadcasts,
    // so the fact table is scanned once and never re-shuffled.
    "tpch_q2" -> ((s, dir) => {
      val eurSupp = Tables.supplier(s, dir)
        .join(broadcast(
          Tables.nation(s, dir)
            .join(Tables.region(s, dir).filter(col("r_name") === "EUROPE"),
                  col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
        // PINNED (r15 opt, guide §2.4): eurSupp/parts/ps each feed two
        // broadcast builds — un-pinned, every build replayed its
        // dimension join / fact aggregate (14 scans in the ledger).
        .localCheckpoint(false)
      val parts = Tables.part(s, dir)
        .filter(col("p_size") === 15 && col("p_type") === "STANDARD")
        .select(col("p_partkey"), col("p_name"))
        .localCheckpoint(false)
      // unit price is an exact IEEE division both engines evaluate
      // identically; min() is order-independent, so the cost equality
      // below is deterministic across engines.
      val ps = Tables.lineitem(s, dir)
        .join(broadcast(parts.select(col("p_partkey"))),
              col("l_partkey") === col("p_partkey"))
        .join(broadcast(eurSupp.select(col("s_suppkey"))),
              col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
        .localCheckpoint(false)
      val minCost = ps.groupBy(col("l_partkey").as("mc_partkey"))
        .agg(min(col("cost")).as("min_cost"))
      ps.join(broadcast(minCost),
              col("l_partkey") === col("mc_partkey") && col("cost") === col("min_cost"))
        .join(broadcast(eurSupp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
                col("p_partkey"), col("p_name"),
                // floor-quantized, NOT round(): Spark rounds the exact
                // binary double (BigDecimal HALF_UP) while DuckDB rounds
                // the IEEE product c*1e4 — at sf0.001 one cost's product
                // lands exactly on .5 (26.24125: true value 1e-11 BELOW
                // the boundary, but within half-ulp of it) and the two
                // disagree by 1e-4. floor(c*1e4 + 0.5)/1e4 is the same
                // IEEE op sequence in both engines — deterministic at
                // every representable input. (r15 opt round, inherited
                // fix; oracle uses the identical expression)
                (floor(col("cost") * 1e4 + 0.5) / 1e4).as("supplycost"))
        .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    }),

    // Q9-shaped: product-type profit by supplier nation and year.
    // Adapted: no ps_supplycost, so unit cost is modeled as 60% of the
    // part's retail price (a deterministic column function — the plan
    // shape is identical to stock Q9: fact ⋈ broadcast part ⋈ broadcast
    // supplier/nation, one orderkey shuffle against orders, single
    // grouped aggregate). The LIKE predicate on p_name prunes the part
    // dim before broadcast.
    "tpch_q9" -> ((s, dir) => {
      val gearParts = Tables.part(s, dir)
        .filter(col("p_name").contains("gear"))
        .select(col("p_partkey"), col("p_retailprice"))
      val suppNation = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
              col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
                col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .join(broadcast(gearParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
              col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("supp_nation"), year(col("o_orderdate")).as("o_year"))
        // per-row profit is rounded to exact integer cents BEFORE the
        // sum: double addition is not associative, and Spark's partial
        // aggregation order differs from a single-threaded engine's —
        // integer cents make the group total order-independent.
        .agg(round(sum(floor((col("l_extendedprice") * (lit(1) - col("l_discount")) -
                              lit(0.6) * col("p_retailprice") * col("l_quantity")) * 100 + 0.5)
                         .cast("long")) / 100.0, 2).as("sum_profit"))
        .orderBy(col("supp_nation"), desc("o_year"))
    }),

    // Q11-shaped: important-part identification — share-of-total HAVING
    // against a global scalar. Adapted: part value = revenue routed
    // through suppliers of two nations (no ps_availqty), and the
    // threshold is mean-relative (value > 3× the average part value) so
    // the predicate keeps a stable selectivity at every SF — an absolute
    // share cutoff would go empty as the part dimension grows. The
    // compare runs in integer cents (floor(x*100+0.5) per row, summed as
    // BIGINT) so partial-aggregation order can never flip a group at the
    // boundary — double sums are not associative, exact integer sums
    // are. The global (total, n_parts) is a 1-row broadcast;
    // value*n > 3*total is a pure integer predicate.
    "tpch_q11" -> ((s, dir) => {
      val nationSupp = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
                .filter(col("n_name").isin("NATION_1", "NATION_2"))),
              col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val value = Tables.lineitem(s, dir)
        .join(broadcast(nationSupp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
                   .cast("long")).as("value_cents"))
      val total = value.agg(sum(col("value_cents")).as("total_cents"),
                            count(lit(1)).as("n_parts"))
      value.crossJoin(broadcast(total))
        .filter(col("value_cents") * col("n_parts") > col("total_cents") * 3)
        .select(col("l_partkey").as("p_partkey"),
                round(col("value_cents") / 100.0, 2).as("value"))
        .orderBy(desc("value"), col("p_partkey"))
    }),

    // Q16-shaped: supplier-relationship count per part descriptor.
    // The part/supplier relation derives from distinct observed
    // (l_partkey, l_suppkey) trade pairs; the complaint-list NOT IN
    // (adapted: suppliers in arrears, s_acctbal < 0) plans as a
    // broadcast left-anti join. countDistinct runs after the pair
    // relation is already distinct, so the expand/double-shuffle
    // distinct-aggregate machinery stays cheap.
    "tpch_q16" -> ((s, dir) => {
      val pairs = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val badSupp = Tables.supplier(s, dir)
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      pairs
        .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(Tables.part(s, dir)
                .filter(col("p_brand") =!= "Brand#12" && col("p_type") =!= "PROMO" &&
                        col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
                .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))),
              col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size"))
    }),

    // Q20-shaped: dominant-supplier promotion list. Adapted: with no
    // ps_availqty, a supplier qualifies when it shipped MORE THAN HALF
    // of a 'small %' part's total 1997 volume (the same nested
    // IN-subquery chain as stock Q20: part filter → grouped fact
    // aggregate → correlated threshold → semi-join up to supplier).
    // Quantities compare in integer centi-units (exact), the per-part
    // total is a second tiny aggregate broadcast back, and each level
    // of the chain reduces cardinality before touching a wider table.
    "tpch_q20" -> ((s, dir) => {
      val smallParts = Tables.part(s, dir)
        .filter(col("p_name").startsWith("small"))
        .select(col("p_partkey"))
      val li97 = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_suppkey"),
                floor(col("l_quantity") * 100 + 0.5).cast("long").as("qty_e2"))
      val perSupp = li97.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("qty_e2")).as("supp_qty"))
      val perPart = li97.groupBy(col("l_partkey").as("t_partkey"))
        .agg(sum(col("qty_e2")).as("part_qty"))
      val dominant = perSupp
        .join(broadcast(perPart), col("l_partkey") === col("t_partkey"))
        .filter(col("supp_qty") * 2 > col("part_qty"))
        .select(col("l_suppkey")).distinct()
      Tables.supplier(s, dir)
        .join(broadcast(dominant), col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(Tables.nation(s, dir)
                .join(Tables.region(s, dir).filter(col("r_name") === "EUROPE"),
                      col("n_regionkey") === col("r_regionkey"))
                .select(col("n_nationkey"), col("n_name"))),
              col("s_nationkey") === col("n_nationkey"))
        .select(col("s_name"), col("n_name"), round(col("s_acctbal"), 2).as("s_acctbal"))
        .orderBy(col("s_name"))
    })
  )

  /** Q17-shaped: revenue from lineitems below 50% of their part's average
    * quantity — a correlated scalar subquery, which Catalyst decorrelates
    * into an aggregate + join (SURVEY §4.2: subquery planning is free in
    * the declarative form; the reference could not express this at all).
    * Expressed via spark.sql to exercise the SQL front end too. */
  private def q17(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("li_q17")
    s.sql(
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
        |       count(*) AS n_items
        |FROM li_q17 outer_li
        |WHERE l_quantity < (SELECT 0.5 * avg(l_quantity)
        |                    FROM li_q17 WHERE l_partkey = outer_li.l_partkey)""".stripMargin)
  }

  def oracles: Map[String, String] = Map(
    "tpch_q2" ->
      """WITH eur_supp AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |parts AS (SELECT p_partkey, p_name FROM part
        |  WHERE p_size = 15 AND p_type = 'STANDARD'),
        |ps AS (SELECT l_partkey, l_suppkey,
        |    min(l_extendedprice / l_quantity) AS cost
        |  FROM lineitem
        |  JOIN parts ON l_partkey = p_partkey
        |  JOIN eur_supp ON l_suppkey = s_suppkey
        |  GROUP BY l_partkey, l_suppkey),
        |mc AS (SELECT l_partkey AS mc_partkey, min(cost) AS min_cost
        |  FROM ps GROUP BY l_partkey)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
        |  floor(cost * 1e4 + 0.5) / 1e4 AS supplycost
        |FROM ps
        |JOIN mc ON l_partkey = mc_partkey AND cost = min_cost
        |JOIN eur_supp ON l_suppkey = s_suppkey
        |JOIN parts ON l_partkey = p_partkey
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,

    "tpch_q9" ->
      """SELECT n_name AS supp_nation, year(o_orderdate)::INT AS o_year,
        |round(sum(floor((l_extendedprice * (1 - l_discount)
        |          - 0.6 * p_retailprice * l_quantity) * 100 + 0.5)::BIGINT)::BIGINT
        |      / 100.0, 2) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY supp_nation, o_year
        |ORDER BY supp_nation, o_year DESC""".stripMargin,

    "tpch_q11" ->
      """WITH v AS (
        |  SELECT l_partkey,
        |    sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)::BIGINT)::BIGINT
        |      AS value_cents
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name IN ('NATION_1', 'NATION_2')
        |  GROUP BY l_partkey),
        |t AS (SELECT sum(value_cents)::BIGINT AS total_cents,
        |             count(*)::BIGINT AS n_parts FROM v)
        |SELECT l_partkey AS p_partkey, round(value_cents / 100.0, 2) AS value
        |FROM v CROSS JOIN t
        |WHERE value_cents * n_parts > total_cents * 3
        |ORDER BY value DESC, p_partkey""".stripMargin,

    "tpch_q16" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM pairs JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#12' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "tpch_q20" ->
      """WITH li97 AS (
        |  SELECT l_partkey, l_suppkey,
        |    floor(l_quantity * 100 + 0.5)::BIGINT AS qty_e2
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'small%'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'),
        |per_supp AS (SELECT l_partkey, l_suppkey, sum(qty_e2)::BIGINT AS supp_qty
        |  FROM li97 GROUP BY l_partkey, l_suppkey),
        |per_part AS (SELECT l_partkey AS t_partkey, sum(qty_e2)::BIGINT AS part_qty
        |  FROM li97 GROUP BY l_partkey),
        |dominant AS (SELECT DISTINCT l_suppkey
        |  FROM per_supp JOIN per_part ON l_partkey = t_partkey
        |  WHERE supp_qty * 2 > part_qty)
        |SELECT s_name, n_name, round(s_acctbal, 2) AS s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |  AND s_suppkey IN (SELECT l_suppkey FROM dominant)
        |ORDER BY s_name""".stripMargin,

    "tpch_q13" ->
      """WITH co AS (SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> 'URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist FROM co
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "tpch_q15" ->
      """WITH rev AS (SELECT l_suppkey AS supplier_no,
        |  sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "tpch_q21" ->
      """WITH l1 AS (SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  WHERE o_orderstatus = 'F'),
        |late AS (SELECT * FROM l1
        |  WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |SELECT s_name, n_name, count(*) AS numwait
        |FROM late
        |JOIN supplier ON s_suppkey = late.l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |WHERE EXISTS (SELECT 1 FROM l1 l2
        |  WHERE l2.l_orderkey = late.l_orderkey AND l2.l_suppkey <> late.l_suppkey)
        |AND NOT EXISTS (SELECT 1 FROM late l3
        |  WHERE l3.l_orderkey = late.l_orderkey AND l3.l_suppkey <> late.l_suppkey)
        |GROUP BY s_name, n_name ORDER BY numwait DESC, s_name""".stripMargin,

    "tpch_q22" ->
      """WITH ab AS (SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0)
        |SELECT n_name, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
        |FROM customer CROSS JOIN ab
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > ab AND NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderdate >= '1998-01-01')
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "tpch_q17" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
        |count(*) AS n_items
        |FROM lineitem outer_li
        |WHERE l_quantity < (SELECT 0.5 * avg(l_quantity)
        |                    FROM lineitem WHERE l_partkey = outer_li.l_partkey)""".stripMargin,
    "tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |round(sum(l_quantity), 2) AS sum_qty,
        |round(sum(l_extendedprice), 2) AS sum_base_price,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |round(avg(l_quantity), 2) AS avg_qty,
        |round(avg(l_extendedprice), 2) AS avg_price,
        |round(avg(l_discount), 4) AS avg_disc,
        |count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "tpch_q6" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        |count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "tpch_q3" ->
      """SELECT l_orderkey,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-03-15'
        |  AND l_shipdate > TIMESTAMP '1997-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "tpch_q5" ->
      """SELECT n_name,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND year(o_orderdate) = 1996
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "tpch_q12" ->
      """SELECT l_returnflag,
        |sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
        |sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "tpch_q14" ->
      """SELECT round(100.0 *
        |  sum(CASE WHEN p_type = 'PROMO'
        |      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) /
        |  sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct,
        |count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-03-01'
        |  AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin,
    "tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
        |FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
        |      FROM lineitem GROUP BY l_orderkey HAVING total_qty > 300) big
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "tpch_q19" ->
      """SELECT round(coalesce(sum(l_extendedprice * (1 - l_discount)), 0.0), 2) AS revenue,
        |count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |year(l_shipdate)::INT AS l_year,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND n1.n_name IN ('NATION_1', 'NATION_2')
        |  AND n2.n_name IN ('NATION_1', 'NATION_2')
        |  AND n1.n_name <> n2.n_name
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "tpch_q8" ->
      """SELECT year(o_orderdate)::INT AS o_year,
        |round(sum(CASE WHEN sn.n_name = 'NATION_3'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) /
        |  sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share,
        |count(*) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region ON cn.n_regionkey = r_regionkey
        |WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY o_year ORDER BY o_year""".stripMargin,
    "tpch_q10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin
  )
}
