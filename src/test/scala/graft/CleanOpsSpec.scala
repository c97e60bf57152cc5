package graft

import graft.operators.CleanOps
import org.apache.spark.sql.functions._

class CleanOpsSpec extends SparkSpec {

  test("normalize: kept <= total and stopwords are gone from the hash preimage") {
    import spark.implicits._
    val rows = CleanOps.queries("clean_normalize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(2) <= r.getInt(1)))
    // recompute one doc's cleaned text by hand and compare hashes
    val doc = Tables.documents(spark, sf).filter($"doc_id" === 0)
      .select($"text").as[String].head()
    val kept = doc.trim.toLowerCase.replaceAll(" +", " ").split(" ")
      .filterNot(t => t == "the" || t == "a").mkString(" ")
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest(kept.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.find(_.getLong(0) == 0L).get.getString(3) == expect)
  }

  test("rare-token pruning removes only sub-threshold tokens") {
    import spark.implicits._
    // sf0.001's corpus has no sub-threshold token (the 'dup' marker only
    // falls under 0.1% from sf0.01 up); use sf0.01 so the op is exercised
    val sf = "/root/testdata/sf0.01"
    val toks = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("tok"))
    val counts = toks.groupBy($"tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val rare = counts.filter(_._2 < total * 0.001).keySet
    assert(rare.nonEmpty, "fixture should contain at least one rare token")
    val rows = CleanOps.queries("clean_rare_tokens")(spark, sf).collect()
    // docs containing no rare token keep everything
    val docsWithRare = Tables.documents(spark, sf)
      .select($"doc_id", split($"text", " ").as("t")).collect()
      .filter(_.getSeq[String](1).exists(rare)).map(_.getLong(0)).toSet
    rows.foreach { r =>
      if (docsWithRare(r.getLong(0))) assert(r.getInt(2) < r.getInt(1))
      else assert(r.getInt(2) == r.getInt(1))
    }
  }

  test("boilerplate chunks: kept count bounded by chunk count; repeats drop") {
    import spark.implicits._
    val out = CleanOps.queries("clean_boilerplate_chunks")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val words = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
      .select($"doc_id", org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split($"text", " ")).as("nw"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.nonEmpty)
    out.foreach { case (id, kept) =>
      val chunks = (words(id) + 9) / 10
      assert(kept >= 0 && kept <= chunks, s"doc $id: kept=$kept chunks=$chunks")
    }
    // the near-dup fixtures share 10-word windows: something must drop
    assert(out.exists { case (id, kept) => kept < (words(id) + 9) / 10 })
  }

  test("pii redaction: injected contacts counted and replaced, others untouched") {
    val rows = CleanOps.queries("clean_redact_pii")(spark, sf).collect()
    rows.foreach { r =>
      val (id, emails, phones) = (r.getLong(0), r.getLong(1), r.getLong(2))
      if (id % 7 == 0) assert(emails == 1 && phones == 1, s"doc $id")
      else assert(emails == 0 && phones == 0, s"doc $id")
    }
    assert(rows.exists(_.getLong(0) % 7 == 0))
  }

  test("mixture stats: shares sum to ~1 and cum_share is monotone to 1") {
    val rows = CleanOps.queries("clean_mixture_stats")(spark, sf).collect()
    assert(rows.length > 10)
    val shares = rows.map(_.getDouble(4))
    assert(math.abs(shares.sum - 1.0) < 1e-3)
    val cums = rows.map(_.getDouble(5))
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a })
    assert(math.abs(cums.last - 1.0) < 1e-6)
  }
}
