package graft

import org.apache.spark.sql.functions._

/** Round-8 guard for the a_decimal_exact_revenue redesign (r7 verdict
  * #1): the query quantizes DOUBLE money columns to BIGINT minor units
  * with the shared formula floor(x*100 + 0.5) on both engines, so a
  * cross-engine divergence is impossible by construction. This spec
  * pins the complementary DATA claim: no input value's
  * cent-quantization is a .005 tie resolved by IEEE representation —
  * i.e. every money column is exact cents (x*100 within 1e-6 of an
  * integer), so the +0.5 never lands the formula on an integer
  * boundary where the binary-vs-shortest-repr distinction could even
  * be discussed. It also asserts the NTILE arithmetic used by the
  * distributed globalNtile matches Spark's own ntile (r7 verdict #6).
  */
class DecimalTieSpec extends SparkSpec {

  test("money inputs quantize tie-free: x*100 is integer-adjacent, never half-adjacent") {
    import spark.implicits._
    val checks = Seq(
      Tables.lineitem(spark, sf).select($"l_extendedprice".as("x")),
      Tables.lineitem(spark, sf).select($"l_discount".as("x")),
      Tables.lineitem(spark, sf).select($"l_quantity".as("x")),
      Tables.orders(spark, sf).select($"o_totalprice".as("x")),
      Tables.events(spark, sf).select($"value".as("x")))
    checks.foreach { df =>
      val frac = abs(col("x") * 100 - floor(col("x") * 100 + 0.5))
      val nHalf = df.filter(frac > 1e-6).count()
      assert(nHalf == 0L,
        s"$nHalf values are not exact cents — a .005 tie could reach the quantizer")
    }
  }

  test("a_decimal_exact_revenue sums reconcile with the raw doubles to the cent") {
    val out = operators.EventOps.queries("a_decimal_exact_revenue")(spark, sf).collect()
    assert(out.nonEmpty)
    val raw = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_extendedprice")).as("p"), count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("p"), r.getAs[Long]("n"))).toMap
    out.foreach { r =>
      val (p, n) = raw(r.getAs[String]("l_returnflag"))
      assert(r.getAs[Long]("n") == n)
      // BIGINT cents vs IEEE sum of exact-cent doubles: equal within
      // the double sum's accumulated ulp error, i.e. < 1 cent here
      assert(math.abs(r.getAs[Long]("sum_price_c") - p * 100).toDouble < 1.0)
      assert(r.getAs[Long]("sum_disc_price_e4") <= r.getAs[Long]("sum_price_c") * 100)
    }
  }

  test("globalNtile/globalDecileCum reproduce Spark's single-partition NTILE exactly") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // sizes chosen to hit every branch: divisible, remainder, n < k
    for (n <- Seq(3, 10, 37, 100); k <- Seq(5, 10)) {
      val df = (1 to n).map(i => (i.toLong, (i * 7919 % n).toLong)).toDF("id", "v")
      val expected = df.withColumn("t",
          ntile(k).over(Window.orderBy($"v".desc, $"id")).cast("long"))
        .select($"id", $"t").as[(Long, Long)].collect().toMap
      val got = graft.api.Graft.globalNtile(df, k, "t", $"v".desc, $"id")
        .select($"id", $"t").as[(Long, Long)].collect().toMap
      assert(got == expected, s"ntile mismatch at n=$n k=$k")
    }
    // decile + running sum in one pass vs the window reference
    val df = (1 to 97).map(i => (i.toLong, ((i * 31) % 89 + 1).toLong)).toDF("id", "c")
    val w = Window.orderBy($"c".desc, $"id")
    val exp = df.withColumn("d", ntile(10).over(w).cast("long"))
      .withColumn("cum", sum($"c").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select($"id", $"d", $"cum").as[(Long, Long, Long)].collect().toSet
    val got = graft.api.Graft.globalDecileCum(df, "c", "d", "cum", $"c".desc, $"id")
      .select($"id", $"d", $"cum").as[(Long, Long, Long)].collect().toSet
    assert(got == exp)
  }
}
