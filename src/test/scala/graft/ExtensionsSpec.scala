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

  test("native expressions are callable from plain SQL (injectFunction)") {
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(dot == 32.0)
    val inter = spark.sql(
      "SELECT graft_sorted_intersect(array('a','b','c'), array('b','c','d')) AS n")
      .head().getInt(0)
    assert(inter == 2)
    // SQL path produces the same signatures as the Column facade
    val viaSql = spark.sql("SELECT graft_simhash32('a b a c') AS s, " +
      "graft_word_bigrams('x y z') AS bg, graft_hash_embed8('x y z') AS e")
      .head()
    val viaCol = Tables.documents(spark, sf).limit(1).select(
      graft.functions.TextSignatures.simHash32(lit("a b a c")).as("s"),
      graft.functions.TextSignatures.wordBigrams(lit("x y z")).as("bg"),
      graft.functions.TextSignatures.hashEmbed8(lit("x y z")).as("e")).head()
    assert(viaSql.getLong(0) == viaCol.getLong(0))
    assert(viaSql.getSeq[String](1) == viaCol.getSeq[String](1))
    assert(viaSql.getSeq[Double](2) == viaCol.getSeq[Double](2))
  }

  test("graft_nfc and graft_bpe_merge are callable from plain SQL") {
    val r = spark.sql(
      "SELECT graft_nfc('cafe\u0301') AS n, graft_bpe_merge('a a b', 'a', 'b') AS m").head()
    assert(r.getString(0) == "caf\u00e9")
    assert(r.getString(1) == "a a_b")
  }

  test("graft_word_ngram{,_pos}_hashes: SQL == expression path; non-literal n rejected") {
    val r = spark.sql(
      "SELECT graft_word_ngram_hashes('a b a b c', 2) AS s, " +
      "graft_word_ngram_pos_hashes('a b a b c', 2) AS p").head()
    val s = r.getSeq[Long](0)
    val p = r.getSeq[Long](1)
    // 4 sliding bigrams, 3 distinct ('a b' repeats at offsets 1 and 3)
    assert(p.length == 4 && s.length == 3)
    assert(p(0) == p(2) && p.distinct.sorted == s.sorted)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_word_ngram_pos_hashes('a b c', 1 + 1)").collect()
    }
    assert(e.getMessage.contains("INT literal"))
  }

  test("FoldConstantHigherOrderFunctions: literal HOFs fold to a Literal") {
    import org.apache.spark.sql.functions._
    // a literal ring: without the rule this transform+md5 re-evaluates
    // per row; with it the optimized plan carries a plain array literal
    val df = spark.range(3).select(
      expr("transform(sequence(0, 4), i -> substring(md5(CAST(i AS STRING)), 1, 4))")
        .as("ring"),
      col("id"))
    val optimized = df.queryExecution.optimizedPlan
    val stillHof = optimized.expressions.exists(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.HigherOrderFunction]))
    assert(!stillHof, s"HOF not folded:\n$optimized")
    // values unchanged vs the interpreted evaluation
    val rows = df.collect()
    assert(rows.length == 3)
    val expected = (0 to 4).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4))
    rows.foreach(r => assert(r.getSeq[String](0) == expected))
    // non-deterministic lambdas must NOT fold
    val ndf = spark.range(3).select(
      expr("transform(sequence(0, 1), i -> rand())").as("r"))
    val ndHof = ndf.queryExecution.optimizedPlan.expressions.exists(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.HigherOrderFunction]))
    assert(ndHof, "non-deterministic HOF must stay per-row")
    // column-dependent HOFs must NOT fold
    val cdf = spark.range(3).select(
      expr("transform(array(id), x -> x + 1)").as("r"))
    val cdHof = cdf.queryExecution.optimizedPlan.expressions.exists(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.HigherOrderFunction]))
    assert(cdHof, "column-dependent HOF must stay per-row")
  }

  test("wrong arity raises a proper analysis error, not a MatchError") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_dot(array(1.0d))").collect()
    }
    assert(e.getMessage.contains("graft_dot"))
    assert(e.getMessage.contains("2") && e.getMessage.contains("1"))
  }
}
