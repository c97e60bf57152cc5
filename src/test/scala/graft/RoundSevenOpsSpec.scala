package graft

import org.apache.spark.sql.functions._

/** Targeted properties for round-7 operators (each also runs under the
  * DuckDB oracle gate; the batch-A/B/C families have their own suites in
  * RelationalExtOpsSpec / EventOpsSpec / DedupOpsSpec). */
class RoundSevenOpsSpec extends SparkSpec {

  test("ta_readability: counts are conserved and the score is the closed form of the sums") {
    import spark.implicits._
    val rows = operators.TextAnalysisOps.queries("ta_readability")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nNonEmpty = Tables.documents(spark, sf)
      .filter($"text".isNotNull && length(trim($"text")) > 0).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nNonEmpty,
      "every non-empty doc scores in exactly one language group")
    rows.foreach { r =>
      val (w, sen, syl) = (r.getAs[Long]("total_words"),
        r.getAs[Long]("total_sentences"), r.getAs[Long]("total_syllables"))
      assert(w > 0 && sen > 0 && syl > 0)
      val want = 206.835 - 1.015 * (w.toDouble / sen) - 84.6 * (syl.toDouble / w)
      assert(math.abs(r.getAs[Double]("flesch") - want) < 5e-5,
        s"${r.getString(0)}: flesch is not the closed form of the aggregated counts")
      assert(r.getAs[Double]("min_doc_score") <= r.getAs[Double]("max_doc_score"))
    }
  }
}
