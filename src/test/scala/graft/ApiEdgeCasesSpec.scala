package graft

import graft.api.Graft
import graft.operators.PrepOps
import org.apache.spark.sql.functions._

/** The public facade on degenerate inputs: empty relations, single
  * rows, empty/whitespace text. Nothing here may throw — a library
  * user's first dataset always contains one of these. */
class ApiEdgeCasesSpec extends SparkSpec {

  import org.apache.spark.sql.{DataFrame, Row}
  import org.apache.spark.sql.types._

  private def emptyDocs: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      new StructType().add("doc_id", LongType).add("text", StringType)
        .add("lang", StringType))

  test("dedup + similarity APIs on an empty corpus return empty, not errors") {
    assert(Graft.dedupExact(emptyDocs, "doc_id", "text").count() == 0)
    assert(Graft.minhashNearDups(emptyDocs, "doc_id", "text").count() == 0)
    assert(Graft.simhashNearDups(emptyDocs, "doc_id", "text").count() == 0)
    assert(Graft.sampleDeterministic(emptyDocs, "doc_id", lit(10000)).count() == 0)
  }

  test("chunking/packing degenerate text") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "one"), (3L, "   ")).toDF("doc_id", "text")
    val chunks = PrepOps.chunkDocuments(docs).collect()
    // every doc yields exactly one (possibly empty-ish) chunk; no crash
    assert(chunks.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(chunks.forall(_.getInt(1) == 0))
  }

  test("quality score on empty text does not divide by zero into error") {
    import spark.implicits._
    val q = Graft.qualityScore(Seq((1L, "")).toDF("doc_id", "text"), "text")
      .select(col("quality")).collect().head.getDouble(0)
    // "" splits to [""], 1 token, 1 distinct, 0 stopwords → finite score
    assert(!q.isNaN && !q.isInfinite)
  }

  test("cosineTopK with k larger than the corpus returns all neighbors") {
    import spark.implicits._
    val corpus = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
                     (3L, Array(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val q = Seq((1L, Array(1.0f, 0.0f))).toDF("qid", "qvec")
    val res = Graft.cosineTopK(q, corpus, k = 10).collect()
    assert(res.length == 2) // corpus minus the query itself
    assert(res.map(_.getInt(1)).sorted.toSeq == Seq(1, 2))
  }

  test("sessionize on a single event emits a single session") {
    import spark.implicits._
    val one = Seq((7L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L))
      .toDF("user_id", "ts", "event_id")
    val s = Graft.sessionize(one, "user_id", "ts", "event_id").collect()
    assert(s.length == 1 && s.head.getAs[Long]("n_events") == 1L)
  }
}
