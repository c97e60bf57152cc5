package graft

import graft.api.Graft
import org.apache.spark.ml.feature.{HashingTF, Normalizer, Tokenizer}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.functions._

/** MLlib interop: the north-star approach ("DataFrame pipeline + MLlib
  * embeddings") end-to-end — Tokenizer → HashingTF(64) → L2 Normalizer
  * producing the embedding column, converted to plain ARRAY<DOUBLE> and
  * fed to the engine's retrieval facade. Proves a user can swap the
  * deterministic hashing embedder for an MLlib (or any Vector-typed)
  * pipeline without touching the retrieval stack. */
class MlLibInteropSpec extends SparkSpec {

  test("MLlib TF pipeline feeds the engine's cosine top-k facade") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .filter($"text".isNotNull).limit(100)
      .select($"doc_id", $"text")

    val toks = new Tokenizer().setInputCol("text").setOutputCol("words")
      .transform(docs)
    val tf = new HashingTF().setInputCol("words").setOutputCol("tf")
      .setNumFeatures(64).transform(toks)
    val normed = new Normalizer().setInputCol("tf").setOutputCol("emb").setP(2.0)
      .transform(tf)

    // Vector → ARRAY<DOUBLE>: the engine's embedding contract
    val toArr = udf((v: Vector) => v.toArray)
    val corpus = normed.select($"doc_id".as("vec_id"), toArr($"emb").as("embedding"))

    val q = corpus.filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val topk = Graft.cosineTopK(q, corpus, 3).collect()

    assert(topk.nonEmpty)
    // normalized vectors: every score is a valid cosine; each query
    // returns its k ranked, non-self neighbors
    topk.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length))
      rows.foreach { r =>
        assert(r.getLong(2) != qid)
        assert(r.getDouble(3) >= -1.0 - 1e-9 && r.getDouble(3) <= 1.0 + 1e-9)
      }
    }
    // self-similarity sanity through the same stack: doc 0's embedding
    // under a fresh qid (the facade excludes vec_id == qid) must rank
    // doc 0 itself first at cosine ~1
    val selfTop = Graft.cosineTopK(
      corpus.filter($"vec_id" === 0)
        .select(lit(-1L).as("qid"), $"embedding".as("qvec")),
      corpus, 1).head()
    assert(selfTop.getLong(2) == 0L)
    assert(math.abs(selfTop.getDouble(3) - 1.0) < 1e-9)
  }
}
