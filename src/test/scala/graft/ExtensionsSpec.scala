package graft

import org.apache.spark.sql.functions._

/** The injected optimizer rule must turn year(col)=N into a pushable
  * range — observable in PushedFilters — without changing results. */
class ExtensionsSpec extends SparkSpec {

  test("year(ntz_timestamp) = N predicate reaches PushedFilters via the rule") {
    val q = Tables.orders(spark, sf).filter(year(col("o_orderdate")) === 1997)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(o_orderdate,1997-01-01"), plan.take(600))
    // (PushedFilters list is truncated in toString; the rewritten range
    // is fully visible in the Filter condition)
    assert(plan.contains("o_orderdate#") && plan.contains("< 1998-01-01 00:00:00"), plan.take(600))
    val explicitRange = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    assert(q.count() == explicitRange.count() && q.count() > 0)
  }

  test("rule leaves groupBy(year(...)) projections intact") {
    val byYear = Tables.orders(spark, sf)
      .groupBy(year(col("o_orderdate")).as("year")).count()
    assert(byYear.count() == 7) // 1995..2001
  }

  test("reversed literal-first form also rewrites") {
    val q = Tables.orders(spark, sf).filter(lit(1997) === year(col("o_orderdate")))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual"))
  }
}
