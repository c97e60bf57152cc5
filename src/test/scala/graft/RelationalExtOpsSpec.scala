package graft

import graft.operators.RelationalExtOps
import org.apache.spark.sql.functions._

/** Round-7 relational-surface extensions: higher-order array functions,
  * null semantics, LATERAL decorrelation, `_metadata` provenance. */
class RelationalExtOpsSpec extends SparkSpec {

  test("c_hof_array: embeddings are unit-normalized and HOF columns are internally consistent") {
    val rows = RelationalExtOps.queries("c_hof_array")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("l2sq") - 1.0) < 1e-4,
        s"vec ${r.getLong(0)}: l2sq ${r.getAs[Double]("l2sq")} != 1 — embeddings no longer unit vectors")
      val nPos = r.getAs[Long]("n_pos")
      assert(nPos >= 0 && nPos <= 64)
      assert(r.getAs[Double]("span") > 0.0)
      // top3 of a sorted-desc unit vector can never exceed sqrt(3)
      assert(r.getAs[Double]("top3_sum") <= math.sqrt(3.0) + 1e-6)
    }
  }

  test("c_null_semantics: three-valued logic partitions every group exactly") {
    val rows = RelationalExtOps.queries("c_null_semantics")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, nNull, eqTwo, neTwo) =
        (r.getAs[Long]("n"), r.getAs[Long]("n_null"),
         r.getAs[Long]("n_nullsafe_eq_two"), r.getAs[Long]("n_distinct_from_two"))
      // <=> is total: IS NOT DISTINCT FROM 2 and IS DISTINCT FROM 2 partition all rows
      assert(eqTwo + neTwo == n, s"${r.getString(0)}: $eqTwo + $neTwo != $n")
      // nulls are always DISTINCT FROM 2
      assert(neTwo >= nNull)
    }
  }

  test("c_datetime_family: calendar invariants hold on every month row") {
    val rows = RelationalExtOps.queries("c_datetime_family")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val month = r.getDate(0).toLocalDate
      assert(month.getDayOfMonth == 1, "month column not truncated to day 1")
      assert(r.getDate(r.fieldIndex("quarter")).toLocalDate.getDayOfMonth == 1)
      assert(r.getDate(r.fieldIndex("next_month")).toLocalDate == month.plusMonths(1))
      assert(r.getDate(r.fieldIndex("month_end")).toLocalDate ==
        month.withDayOfMonth(month.lengthOfMonth))
      val (n, days, sumDow) = (r.getAs[Long]("n_events"),
        r.getAs[Long]("n_active_days"), r.getAs[Long]("sum_iso_dow"))
      assert(days <= month.lengthOfMonth && days >= 1)
      // iso_dow ∈ [1,7] per event
      assert(sumDow >= n && sumDow <= 7 * n)
    }
  }

  test("j_lateral_topk: decorrelates to a window plan and matches the explicit window form") {
    val df = RelationalExtOps.queries("j_lateral_topk")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "LATERAL LIMIT subquery should decorrelate into a Window")
    assert(!plan.contains("CartesianProduct"),
      "decorrelation must not fall back to a per-row nested loop")
    // equivalence against the hand-written top-N-per-group form
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val expect = Tables.customer(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_name"), col("c_acctbal"))
      .orderBy(col("n_name"), col("c_acctbal").desc, col("c_name"))
    assert(df.collect().toSeq == expect.collect().toSeq)
  }

  test("s_file_metadata_census: shards partition the id space with disjoint envelopes") {
    val rows = graft.sources.FileSources.queries("s_file_metadata_census")(spark, sf)
      .orderBy(col("min_id")).collect()
    assert(rows.length == 3, s"expected 3 shards, got ${rows.length}")
    assert(rows.map(_.getAs[Long]("n")).sum == 1000L)
    // range partitioning => file envelopes are disjoint and ordered:
    // exactly the property that makes file-level min/max stats prune
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("max_id") < b.getAs[Long]("min_id"))
    }
  }
}
