package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality gate operators — the expectation-suite / profiling /
  * reconciliation checks a production ingestion pipeline runs BEFORE the
  * analytical queries in this repo ever see a row.
  *
  * The reference validates nothing: `aws_bucket.py:101-124` uploads and
  * re-lists objects with no row-level checks, and `transcription.py`
  * consumes whatever parses. At 100 TB that is how a silently-truncated
  * export poisons a training run; the standard defense (Deequ/
  * Great Expectations style) is a small, fixed-size audit computed in
  * ONE pass per table — which is exactly how these are built:
  *
  *  - `dq_expectation_suite`: each table contributes one conditional
  *    aggregation pass (count + per-rule violation counters folded into
  *    a single 1-row aggregate, then unpivoted row-wise); the two
  *    referential checks are key-projected anti joins (the only columns
  *    shuffled are the keys). Output is O(#rules), never O(rows).
  *  - `dq_null_profile`: the per-column null/blank census is ONE
  *    full-width scan reduced map-side to a single row, unpivoted to
  *    (column, metric) AFTER aggregation — the wide data never shuffles.
  *  - `dq_freshness_lag`: per-type max event time vs the corpus
  *    watermark; the global max is re-derived from the 5-row grouped
  *    result (no second scan) and broadcast back.
  *  - `dq_reconcile_orders_items`: fact-vs-fact grain reconciliation
  *    (orders ↔ lineitem rollup) — the item side is pre-aggregated to
  *    the join grain before the join, so the shuffle carries one row
  *    per orderkey, not one per item.
  *
  * Plan-census note (ledger): every single-partition exchange in this
  * module is a ≤12-row expectation/unpivot table or a 1-row global
  * aggregate — report-sized by construction.
  */
object QualityOps {

  private val ruleCols = Seq("tbl", "expectation", "violations", "checked", "ok")

  /** SHA-tagged, write-once parquet fixture pair for the schema-drift
    * gate (r12 advice: the untagged fixed path was overwritten on
    * every invocation, so concurrent gate runs over different data
    * dirs could race the oracle's footer read). Rides the shared
    * Graft.snapshotFixtureDir lifecycle (tag + sentinel + ATOMIC
    * rename — a cross-tag glob can never observe a partial build).
    * The DuckDB oracle globs ALL tag dirs with DISTINCT — sound
    * because EVERY column is written through an explicit cast (r13
    * advice: the previously-uncast o_totalprice/o_orderstatus columns
    * inherited the SOURCE's physical types, so a data dir generated
    * with, say, DECIMAL prices would have minted a tag whose fixture
    * schema conflicted with the others under the glob), making the
    * fixture schema data-dir-invariant by construction — and the
    * schema is the only thing either engine reads. */
  private[graft] def schemaDriftFixtureDirs(
      s: SparkSession, dir: String): (String, String) = {
    val out = graft.api.Graft.snapshotFixtureDir("dq_schema_drift", dir) {
      root =>
        val orders = Tables.orders(s, dir).filter(col("o_orderkey") < 100)
        orders.select(col("o_orderkey").cast("int").as("o_orderkey"),
                      col("o_totalprice").cast("double").as("o_totalprice"),
                      col("o_orderstatus").cast("string").as("o_orderstatus"))
          .coalesce(1).write.mode("overwrite").parquet(s"$root/v1")
        orders.select(col("o_orderkey").cast("long").as("o_orderkey"),
                      col("o_totalprice").cast("double").as("o_totalprice"),
                      col("o_orderpriority").cast("string")
                        .as("o_orderpriority"))
          .coalesce(1).write.mode("overwrite").parquet(s"$root/v2")
    }
    (s"$out/v1", s"$out/v2")
  }

  private val ordersStringCols = Set("o_orderstatus", "o_orderpriority")

  /** One-pass per-column null/blank census: a single conditional
    * aggregate over the full width, unpivoted to (col_name, n_null,
    * n_blank, n) AFTER the 1-row reduction — the wide data never
    * shuffles. Single-sources dq_null_profile and both sides of
    * dq_profile_drift. */
  private def nullProfile(df: DataFrame, stringCols: Set[String]): DataFrame = {
    val cols = df.columns.toSeq
    // splice guard (r12 advice): the column names land inside a
    // selectExpr stack() as '$c'
    cols.foreach(c => require(c.matches("[A-Za-z0-9_]+"),
      s"nullProfile: column name must match [A-Za-z0-9_]+: '$c'"))
    val aggs = cols.flatMap { c =>
      Seq(count(when(col(c).isNull, 1)).as(s"null_$c"),
          (if (stringCols(c))
             count(when(trim(col(c)) === "", 1))
           else lit(0L)).as(s"blank_$c"))
    } :+ count(lit(1)).as("n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c => s"'$c', null_$c, blank_$c").mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_null, n_blank)",
      "n")
  }

  /** SHA-tagged, sentinel-idempotent snapshot of the PRIOR ingest
    * run's null/blank profile (the md5-degraded orders feed) — the
    * drift memory dq_profile_drift diffs against. Content is
    * data-dir-dependent, hence per-dir tagging AND a closed-form
    * oracle replay instead of a glob. */
  private[graft] def profileSnapshotDir(s: SparkSession, dir: String): String =
    graft.api.Graft.snapshotFixtureDir("dq_profile_prior", dir) { out =>
      def draw(salt: String) =
        conv(substring(md5(concat(col("o_orderkey").cast("string"),
          lit(salt))), 1, 4), 16, 10).cast("long")
      val priorFeed = Tables.orders(s, dir)
        .withColumn("o_custkey",
          when(draw(":pd1") % 25 === 0, lit(null).cast("long"))
            .otherwise(col("o_custkey")))
        .withColumn("o_orderpriority",
          when(draw(":pd2") % 50 === 0, lit(" "))
            .otherwise(col("o_orderpriority")))
      nullProfile(priorFeed, ordersStringCols)
        .coalesce(1).write.mode("overwrite").parquet(out)
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](

    // Expectation suite: uniqueness / not-null / range / domain /
    // referential rules, one row per rule with its violation count.
    "dq_expectation_suite" -> ((s, dir) => {
      import graft.api.Graft.expectationRules
      val orders = Tables.orders(s, dir)
      val li     = Tables.lineitem(s, dir)

      // One aggregation pass per table (Graft.expectationRules:
      // violation predicates + uniqueness keys folded into a single
      // conditional aggregate, unpivoted after reduction).
      // PINNED (r15 opt, guide §2.4): each rule table is consumed by the
      // final union AND as the FK rows' `checked` denominator — un-pinned
      // the full-table conditional aggregate ran twice per table.
      val ordRules = expectationRules(orders, "orders",
        Seq("not_null_o_custkey"        -> col("o_custkey").isNull,
            "range_o_totalprice_nonneg" -> (col("o_totalprice") < 0)),
        Seq("pk_unique_o_orderkey"      -> col("o_orderkey")))
        .localCheckpoint(false)
      val liRules = expectationRules(li, "lineitem",
        Seq("range_l_discount_0_1" ->
              (col("l_discount") < 0 || col("l_discount") > 1),
            "range_l_quantity_pos" -> (col("l_quantity") <= 0),
            "domain_l_returnflag"  -> !col("l_returnflag").isin("A", "N", "R")))
        .localCheckpoint(false)
      val docRules = expectationRules(Tables.documents(s, dir), "documents",
        Seq("not_blank_text" -> (col("text").isNull || trim(col("text")) === ""),
            "nonneg_n_chars" -> (col("n_chars") < 0)))
      val custRules = expectationRules(Tables.customer(s, dir), "customer",
        Nil, Seq("pk_unique_c_custkey" -> col("c_custkey")))

      // Referential integrity: project to keys before the anti join so
      // only key columns shuffle; the `checked` denominator re-derives
      // from the table's rule rows instead of a second count scan.
      def fkViolations(fact: DataFrame, factKey: String,
                       dim: DataFrame, dimKey: String, tbl: String,
                       name: String, checkedOf: DataFrame): DataFrame = {
        val orphans = fact.select(col(factKey))
          .join(dim.select(col(dimKey)).distinct(),
                col(factKey) === col(dimKey), "left_anti")
          .agg(count(lit(1)).as("violations"))
        checkedOf.agg(max(col("checked")).as("checked")).crossJoin(orphans)
          .select(lit(tbl).as("tbl"), lit(name).as("expectation"),
                  col("violations"), col("checked"),
                  (col("violations") === 0).cast("int").as("ok"))
      }
      val fkOrders = fkViolations(orders, "o_custkey",
        Tables.customer(s, dir), "c_custkey", "orders",
        "fk_o_custkey_customer", ordRules)
      val fkItems = fkViolations(li, "l_orderkey", orders, "o_orderkey",
        "lineitem", "fk_l_orderkey_orders", liRules)

      Seq(ordRules, liRules, docRules, custRules, fkOrders, fkItems)
        .map(_.select(ruleCols.head, ruleCols.tail: _*))
        .reduce(_ unionByName _)
        .orderBy(col("tbl"), col("expectation"))
    }),

    // Per-column null/blank profile of orders: one scan, one 1-row
    // aggregate, row-wise unpivot after reduction (nullProfile).
    "dq_null_profile" -> ((s, dir) =>
      nullProfile(Tables.orders(s, dir), ordersStringCols)
        .select(col("col_name"), col("n_null"), col("n_blank"),
                expr("n_null * 1000000 div n").as("null_rate_e6"))
        .orderBy(col("col_name"))),

    // Cross-run drift memory (r12 verdict #8): the production follow-on
    // to dq_volume_anomaly's within-table window — PERSIST the per-
    // column profile of the prior ingest run and diff the current run
    // against that parquet snapshot. The "prior run" here is the
    // deterministic md5-degraded orders feed (1/25 custkeys nulled,
    // 1/50 priorities blanked — a historical bad ingest), profiled once
    // into a SHA-tagged sentinel-idempotent snapshot
    // (profileSnapshotDir — the schemaDriftFixtureDirs recipe); the
    // Spark side genuinely READS the snapshot back, while the DuckDB
    // oracle replays the prior profile closed-form from orders (the
    // streaming-fixture oracle discipline — snapshot CONTENT is
    // dir-dependent, so the oracle cannot glob it). Integer e6 rate
    // gate: |Δ| > 5000 on either the null or the blank rate flags the
    // column. Scale: both profiles are O(columns) rows; the diff join
    // moves 6 rows.
    "dq_profile_drift" -> ((s, dir) => {
      val prior = s.read.parquet(profileSnapshotDir(s, dir))
        .select(col("col_name"),
                expr("n_null * 1000000 div n").as("prior_null_e6"),
                expr("n_blank * 1000000 div n").as("prior_blank_e6"))
      val cur = nullProfile(Tables.orders(s, dir), ordersStringCols)
        .select(col("col_name"),
                expr("n_null * 1000000 div n").as("cur_null_e6"),
                expr("n_blank * 1000000 div n").as("cur_blank_e6"))
      cur.join(prior, "col_name")
        .select(col("col_name"),
                col("prior_null_e6"), col("cur_null_e6"),
                (col("cur_null_e6") - col("prior_null_e6"))
                  .as("delta_null_e6"),
                col("prior_blank_e6"), col("cur_blank_e6"),
                (col("cur_blank_e6") - col("prior_blank_e6"))
                  .as("delta_blank_e6"))
        .withColumn("drift",
          (abs(col("delta_null_e6")) > 5000 ||
           abs(col("delta_blank_e6")) > 5000).cast("int"))
        .orderBy(col("col_name"))
    }),

    // Freshness: per-event-type max event time vs the corpus watermark.
    // The global max comes from the grouped 5-row table, not a rescan.
    "dq_freshness_lag" -> ((s, dir) => {
      val perType = Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(max(unix_micros(col("ts"))).as("max_us"))
      val global = perType.agg(max(col("max_us")).as("global_us"))
      perType.crossJoin(broadcast(global))
        .select(col("event_type"),
                col("max_us"),
                expr("(global_us - max_us) div 60000000").as("lag_min"))
        .withColumn("stale", (col("lag_min") > 60).cast("int"))
        .orderBy(col("event_type"))
    }),

    // Row-level quarantine routing — the per-row complement of the
    // suite: a deterministically-dirtied feed (md5 draws flip ~2% of
    // totals negative, null ~1% of custkeys, blank ~1% of priorities)
    // has its violating rows ROUTED OUT with the list of failed rules,
    // the split every ingestion pipeline puts in front of the lake
    // (clean rows continue, quarantine gets human eyes). One scan,
    // rule predicates evaluated map-side, output only the violators.
    "dq_quarantine_rules" -> ((s, dir) => {
      def draw(salt: String) =
        conv(substring(md5(concat(col("o_orderkey").cast("string"),
          lit(salt))), 1, 4), 16, 10).cast("long")
      val feed = Tables.orders(s, dir)
        .withColumn("o_totalprice",
          when(draw(":q1") % 50 === 0, -col("o_totalprice"))
            .otherwise(col("o_totalprice")))
        .withColumn("o_custkey",
          when(draw(":q2") % 100 === 0, lit(null).cast("long"))
            .otherwise(col("o_custkey")))
        .withColumn("o_orderpriority",
          when(draw(":q3") % 100 === 0, lit(" "))
            .otherwise(col("o_orderpriority")))
      feed
        .withColumn("violated", concat_ws(",",
          when(col("o_custkey").isNull, lit("not_null_o_custkey")),
          when(col("o_totalprice") < 0, lit("range_o_totalprice_nonneg")),
          when(trim(col("o_orderpriority")) === "",
               lit("not_blank_o_orderpriority"))))
        .where(col("violated") =!= "")
        .select(col("o_orderkey"), col("violated"),
                (size(split(col("violated"), ",")))
                  .cast("long").as("n_violations"))
        .orderBy(col("o_orderkey"))
    }),

    // Schema-drift gate: two parquet snapshots of the same logical
    // table (v2 widens o_orderkey int→bigint, drops o_orderstatus,
    // adds o_orderpriority), drift censused from the REAL file footers
    // on both sides — Spark reads its own schemas; the DuckDB oracle
    // parses the same footers via parquet_schema(), so the verdicts
    // (added/dropped/type_changed/same) are independently derived.
    // Type equality is judged within each engine (Spark ints vs
    // DuckDB's INT32/INT64 physical names never cross-compare).
    // Scale: schema work is footer metadata — O(columns), zero data.
    "dq_schema_drift" -> ((s, dir) => {
      val (v1Out, v2Out) = schemaDriftFixtureDirs(s, dir)
      val t1 = s.read.parquet(v1Out).schema.map(f => f.name -> f.dataType.sql).toMap
      val t2 = s.read.parquet(v2Out).schema.map(f => f.name -> f.dataType.sql).toMap
      import s.implicits._
      (t1.keySet ++ t2.keySet).toSeq.sorted.map { c =>
        val status = (t1.get(c), t2.get(c)) match {
          case (None, Some(_))          => "added"
          case (Some(_), None)          => "dropped"
          case (Some(a), Some(b)) if a == b => "same"
          case _                        => "type_changed"
        }
        (c, if (t1.contains(c)) 1 else 0, if (t2.contains(c)) 1 else 0, status)
      }.toDF("col_name", "in_v1", "in_v2", "status")
        .orderBy(col("col_name"))
    }),

    // Volume-anomaly gate: per (event_type, day) row volume vs the
    // trailing-7-day window, the |z| > 2 test carried out ENTIRELY in
    // integers (3·(7n−Σ)² > 14·(7·Σx²−Σ²) ⟺ (n−μ)² > 4σ̂² with
    // sample variance) so both engines agree bit-for-bit — no
    // floating-point mean/stddev whose accumulation order could
    // diverge. Scale: one groupBy to the (type, day) grain, then
    // windows over the tiny daily table.
    "dq_volume_anomaly" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-7, -1)
      daily
        .withColumn("w_cnt", count(col("n")).over(w))
        .withColumn("sum7", sum(col("n")).over(w))
        .withColumn("sumsq7", sum(col("n") * col("n")).over(w))
        .where(col("w_cnt") === 7)
        .select(col("event_type"), col("day").cast("string").as("day"),
                col("n"), col("sum7"), col("sumsq7"),
                (lit(3L) * (lit(7L) * col("n") - col("sum7")) *
                   (lit(7L) * col("n") - col("sum7")) >
                 lit(14L) * (lit(7L) * col("sumsq7") -
                   col("sum7") * col("sum7"))).cast("int").as("anomaly"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Grain reconciliation: monthly orders vs their lineitem rollup —
    // orphaned orders (no items) and item-row mass per month. The item
    // side is reduced to (orderkey, n_items) before joining.
    "dq_reconcile_orders_items" -> ((s, dir) => {
      val itemsPerOrder = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_items"))
      Tables.orders(s, dir)
        .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM")
          .as("month"))
        .join(itemsPerOrder, col("o_orderkey") === col("l_orderkey"), "left")
        .groupBy(col("month"))
        .agg(count(lit(1)).as("n_orders"),
             count(col("l_orderkey")).as("n_matched"),
             count(when(col("l_orderkey").isNull, 1)).as("n_orphan"),
             coalesce(sum(col("n_items")), lit(0L)).as("n_item_rows"))
        .orderBy(col("month"))
    })
  )

  def oracles: Map[String, String] = Map(
    "dq_expectation_suite" ->
      """WITH ord AS (
        |  SELECT count(*) AS n, count(DISTINCT o_orderkey) AS nd_key,
        |         count(*) FILTER (WHERE o_custkey IS NULL) AS null_cust,
        |         count(*) FILTER (WHERE o_totalprice < 0) AS neg_total
        |  FROM orders),
        |li AS (
        |  SELECT count(*) AS n,
        |         count(*) FILTER (WHERE l_discount < 0 OR l_discount > 1) AS disc_viol,
        |         count(*) FILTER (WHERE l_quantity <= 0) AS qty_viol,
        |         count(*) FILTER (WHERE l_returnflag NOT IN ('A','N','R')) AS flag_viol
        |  FROM lineitem),
        |doc AS (
        |  SELECT count(*) AS n,
        |         count(*) FILTER (WHERE text IS NULL OR trim(text) = '') AS blank_text,
        |         count(*) FILTER (WHERE n_chars < 0) AS neg_chars
        |  FROM documents),
        |cst AS (
        |  SELECT count(*) AS n, count(DISTINCT c_custkey) AS nd FROM customer),
        |fk1 AS (
        |  SELECT (SELECT count(*) FROM orders) AS checked,
        |         (SELECT count(*) FROM orders o ANTI JOIN customer c
        |            ON o.o_custkey = c.c_custkey) AS violations),
        |fk2 AS (
        |  SELECT (SELECT count(*) FROM lineitem) AS checked,
        |         (SELECT count(*) FROM lineitem l ANTI JOIN orders o
        |            ON l.l_orderkey = o.o_orderkey) AS violations),
        |rules AS (
        |  SELECT 'orders' AS tbl, 'pk_unique_o_orderkey' AS expectation,
        |         n - nd_key AS violations, n AS checked FROM ord
        |  UNION ALL SELECT 'orders', 'not_null_o_custkey', null_cust, n FROM ord
        |  UNION ALL SELECT 'orders', 'range_o_totalprice_nonneg', neg_total, n FROM ord
        |  UNION ALL SELECT 'lineitem', 'range_l_discount_0_1', disc_viol, n FROM li
        |  UNION ALL SELECT 'lineitem', 'range_l_quantity_pos', qty_viol, n FROM li
        |  UNION ALL SELECT 'lineitem', 'domain_l_returnflag', flag_viol, n FROM li
        |  UNION ALL SELECT 'documents', 'not_blank_text', blank_text, n FROM doc
        |  UNION ALL SELECT 'documents', 'nonneg_n_chars', neg_chars, n FROM doc
        |  UNION ALL SELECT 'customer', 'pk_unique_c_custkey', n - nd, n FROM cst
        |  UNION ALL SELECT 'orders', 'fk_o_custkey_customer', violations, checked FROM fk1
        |  UNION ALL SELECT 'lineitem', 'fk_l_orderkey_orders', violations, checked FROM fk2)
        |SELECT tbl, expectation, violations::BIGINT AS violations,
        |       checked::BIGINT AS checked,
        |       (violations = 0)::INT AS ok
        |FROM rules ORDER BY tbl, expectation""".stripMargin,

    "dq_null_profile" ->
      """WITH one AS (
        |  SELECT count(*) AS n,
        |    count(*) FILTER (WHERE o_orderkey IS NULL) AS null_o_orderkey,
        |    count(*) FILTER (WHERE o_custkey IS NULL) AS null_o_custkey,
        |    count(*) FILTER (WHERE o_orderstatus IS NULL) AS null_o_orderstatus,
        |    count(*) FILTER (WHERE trim(o_orderstatus) = '') AS blank_o_orderstatus,
        |    count(*) FILTER (WHERE o_totalprice IS NULL) AS null_o_totalprice,
        |    count(*) FILTER (WHERE o_orderdate IS NULL) AS null_o_orderdate,
        |    count(*) FILTER (WHERE o_orderpriority IS NULL) AS null_o_orderpriority,
        |    count(*) FILTER (WHERE trim(o_orderpriority) = '') AS blank_o_orderpriority
        |  FROM orders),
        |rows_ AS (
        |  SELECT 'o_orderkey' AS col_name, null_o_orderkey AS n_null, 0 AS n_blank, n FROM one
        |  UNION ALL SELECT 'o_custkey', null_o_custkey, 0, n FROM one
        |  UNION ALL SELECT 'o_orderstatus', null_o_orderstatus, blank_o_orderstatus, n FROM one
        |  UNION ALL SELECT 'o_totalprice', null_o_totalprice, 0, n FROM one
        |  UNION ALL SELECT 'o_orderdate', null_o_orderdate, 0, n FROM one
        |  UNION ALL SELECT 'o_orderpriority', null_o_orderpriority, blank_o_orderpriority, n FROM one)
        |SELECT col_name, n_null::BIGINT AS n_null, n_blank::BIGINT AS n_blank,
        |       (n_null * 1000000 // n)::BIGINT AS null_rate_e6
        |FROM rows_ ORDER BY col_name""".stripMargin,

    // prior profile replayed closed-form from orders (same md5 feed as
    // profileSnapshotDir); current profile = dq_null_profile's census
    "dq_profile_drift" ->
      """WITH pfeed AS (
        |  SELECT o_orderkey,
        |    CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR || ':pd1'), 1, 4))::BIGINT % 25 = 0
        |         THEN NULL ELSE o_custkey END AS o_custkey,
        |    o_orderstatus, o_totalprice, o_orderdate,
        |    CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR || ':pd2'), 1, 4))::BIGINT % 50 = 0
        |         THEN ' ' ELSE o_orderpriority END AS o_orderpriority
        |  FROM orders),
        |pone AS (
        |  SELECT count(*) AS n,
        |    count(*) FILTER (WHERE o_orderkey IS NULL) AS null_o_orderkey,
        |    count(*) FILTER (WHERE o_custkey IS NULL) AS null_o_custkey,
        |    count(*) FILTER (WHERE o_orderstatus IS NULL) AS null_o_orderstatus,
        |    count(*) FILTER (WHERE trim(o_orderstatus) = '') AS blank_o_orderstatus,
        |    count(*) FILTER (WHERE o_totalprice IS NULL) AS null_o_totalprice,
        |    count(*) FILTER (WHERE o_orderdate IS NULL) AS null_o_orderdate,
        |    count(*) FILTER (WHERE o_orderpriority IS NULL) AS null_o_orderpriority,
        |    count(*) FILTER (WHERE trim(o_orderpriority) = '') AS blank_o_orderpriority
        |  FROM pfeed),
        |cone AS (
        |  SELECT count(*) AS n,
        |    count(*) FILTER (WHERE o_orderkey IS NULL) AS null_o_orderkey,
        |    count(*) FILTER (WHERE o_custkey IS NULL) AS null_o_custkey,
        |    count(*) FILTER (WHERE o_orderstatus IS NULL) AS null_o_orderstatus,
        |    count(*) FILTER (WHERE trim(o_orderstatus) = '') AS blank_o_orderstatus,
        |    count(*) FILTER (WHERE o_totalprice IS NULL) AS null_o_totalprice,
        |    count(*) FILTER (WHERE o_orderdate IS NULL) AS null_o_orderdate,
        |    count(*) FILTER (WHERE o_orderpriority IS NULL) AS null_o_orderpriority,
        |    count(*) FILTER (WHERE trim(o_orderpriority) = '') AS blank_o_orderpriority
        |  FROM orders),
        |prior AS (
        |  SELECT 'o_orderkey' AS col_name, null_o_orderkey AS n_null, 0 AS n_blank, n FROM pone
        |  UNION ALL SELECT 'o_custkey', null_o_custkey, 0, n FROM pone
        |  UNION ALL SELECT 'o_orderstatus', null_o_orderstatus, blank_o_orderstatus, n FROM pone
        |  UNION ALL SELECT 'o_totalprice', null_o_totalprice, 0, n FROM pone
        |  UNION ALL SELECT 'o_orderdate', null_o_orderdate, 0, n FROM pone
        |  UNION ALL SELECT 'o_orderpriority', null_o_orderpriority, blank_o_orderpriority, n FROM pone),
        |cur AS (
        |  SELECT 'o_orderkey' AS col_name, null_o_orderkey AS n_null, 0 AS n_blank, n FROM cone
        |  UNION ALL SELECT 'o_custkey', null_o_custkey, 0, n FROM cone
        |  UNION ALL SELECT 'o_orderstatus', null_o_orderstatus, blank_o_orderstatus, n FROM cone
        |  UNION ALL SELECT 'o_totalprice', null_o_totalprice, 0, n FROM cone
        |  UNION ALL SELECT 'o_orderdate', null_o_orderdate, 0, n FROM cone
        |  UNION ALL SELECT 'o_orderpriority', null_o_orderpriority, blank_o_orderpriority, n FROM cone),
        |pr AS (SELECT col_name, (n_null * 1000000 // n)::BIGINT AS prior_null_e6,
        |              (n_blank * 1000000 // n)::BIGINT AS prior_blank_e6 FROM prior),
        |cu AS (SELECT col_name, (n_null * 1000000 // n)::BIGINT AS cur_null_e6,
        |              (n_blank * 1000000 // n)::BIGINT AS cur_blank_e6 FROM cur)
        |SELECT col_name, prior_null_e6, cur_null_e6,
        |       (cur_null_e6 - prior_null_e6)::BIGINT AS delta_null_e6,
        |       prior_blank_e6, cur_blank_e6,
        |       (cur_blank_e6 - prior_blank_e6)::BIGINT AS delta_blank_e6,
        |       (abs(cur_null_e6 - prior_null_e6) > 5000 OR
        |        abs(cur_blank_e6 - prior_blank_e6) > 5000)::INT AS drift
        |FROM cu JOIN pr USING (col_name) ORDER BY col_name""".stripMargin,

    "dq_freshness_lag" ->
      """WITH per_type AS (
        |  SELECT event_type, max(epoch_us(ts)) AS max_us
        |  FROM events GROUP BY event_type),
        |g AS (SELECT max(max_us) AS global_us FROM per_type)
        |SELECT event_type, max_us,
        |       ((global_us - max_us) // 60000000)::BIGINT AS lag_min,
        |       (((global_us - max_us) // 60000000) > 60)::INT AS stale
        |FROM per_type, g ORDER BY event_type""".stripMargin,

    "dq_quarantine_rules" ->
      """WITH feed AS (
        |  SELECT o_orderkey,
        |    CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR || ':q1'), 1, 4))::BIGINT % 50 = 0
        |         THEN -o_totalprice ELSE o_totalprice END AS o_totalprice,
        |    CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR || ':q2'), 1, 4))::BIGINT % 100 = 0
        |         THEN NULL ELSE o_custkey END AS o_custkey,
        |    CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR || ':q3'), 1, 4))::BIGINT % 100 = 0
        |         THEN ' ' ELSE o_orderpriority END AS o_orderpriority
        |  FROM orders),
        |v AS (
        |  SELECT o_orderkey,
        |    concat_ws(',',
        |      CASE WHEN o_custkey IS NULL THEN 'not_null_o_custkey' END,
        |      CASE WHEN o_totalprice < 0 THEN 'range_o_totalprice_nonneg' END,
        |      CASE WHEN trim(o_orderpriority) = '' THEN 'not_blank_o_orderpriority' END)
        |      AS violated
        |  FROM feed)
        |SELECT o_orderkey, violated,
        |       len(string_split(violated, ','))::BIGINT AS n_violations
        |FROM v WHERE violated <> '' ORDER BY o_orderkey""".stripMargin,

    "dq_schema_drift" -> {
      // glob over ALL tag dirs + DISTINCT: every tag's fixture schema is
      // identical by construction (see schemaDriftFixtureDirs), and the
      // schema is the only thing this oracle reads
      val base = new java.io.File(
        "target/graft_file_fixtures").getAbsolutePath
      val v1 = s"$base/dq_schema_drift_*/data/v1"
      val v2 = s"$base/dq_schema_drift_*/data/v2"
      s"""WITH s1 AS (SELECT DISTINCT name, type
         |  FROM parquet_schema('$v1/*.parquet')
         |  WHERE type IS NOT NULL),
         |s2 AS (SELECT DISTINCT name, type
         |  FROM parquet_schema('$v2/*.parquet')
         |  WHERE type IS NOT NULL),
         |allc AS (
         |  SELECT coalesce(s1.name, s2.name) AS col_name,
         |         s1.type AS t1, s2.type AS t2
         |  FROM s1 FULL JOIN s2 ON s1.name = s2.name)
         |SELECT col_name,
         |       (t1 IS NOT NULL)::INT AS in_v1,
         |       (t2 IS NOT NULL)::INT AS in_v2,
         |       CASE WHEN t1 IS NULL THEN 'added'
         |            WHEN t2 IS NULL THEN 'dropped'
         |            WHEN t1 = t2 THEN 'same'
         |            ELSE 'type_changed' END AS status
         |FROM allc ORDER BY col_name""".stripMargin
    },

    "dq_volume_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, (ts::DATE)::VARCHAR AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, day, n,
        |    count(n) OVER win AS w_cnt,
        |    sum(n) OVER win AS sum7,
        |    sum(n * n) OVER win AS sumsq7
        |  FROM daily
        |  WINDOW win AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, day, n, sum7::BIGINT AS sum7,
        |       sumsq7::BIGINT AS sumsq7,
        |       (3 * (7 * n - sum7) * (7 * n - sum7) >
        |        14 * (7 * sumsq7 - sum7 * sum7))::INT AS anomaly
        |FROM w WHERE w_cnt = 7 ORDER BY event_type, day""".stripMargin,

    "dq_reconcile_orders_items" ->
      """WITH ipo AS (
        |  SELECT l_orderkey, count(*) AS n_items
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |       count(*) AS n_orders,
        |       count(ipo.l_orderkey) AS n_matched,
        |       count(*) FILTER (WHERE ipo.l_orderkey IS NULL) AS n_orphan,
        |       coalesce(sum(n_items), 0)::BIGINT AS n_item_rows
        |FROM orders LEFT JOIN ipo ON o_orderkey = ipo.l_orderkey
        |GROUP BY 1 ORDER BY month""".stripMargin
  )
}
