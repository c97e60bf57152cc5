package graft

import graft.operators.LexicalOps
import org.apache.spark.sql.functions._

/** BM25 + hybrid-RRF retrieval semantics (LexicalOps).
  *
  * The reference ships a FAISS index with no search function
  * (`embedding_engine.py:88-99`); LexicalOps supplies the retrieval stack
  * that index implies. These specs pin the ranking invariants a user of
  * that stack would rely on.
  */
class LexicalOpsSpec extends SparkSpec {

  test("bm25 top-k: ranks are dense 1..k per query, scores non-increasing") {
    val rows = LexicalOps.queries("retrieval_bm25_topk")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getInt(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq == (1 to byRank.length))
      val scores = byRank.map(_.getLong(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("bm25: every ranked doc contains at least one query term") {
    import spark.implicits._
    val ranked = LexicalOps.queries("retrieval_bm25_topk")(spark, sf)
      .select($"doc_id").distinct().as[Long].collect().toSet
    val terms = Seq("spark", "hash", "join", "table", "scan", "fast",
      "sort", "merge", "batch")
    val hasTerm = Tables.documentsSpread(spark, sf)
      .filter($"text".isNotNull)
      .select($"doc_id",
        arrays_overlap(split($"text", " "), lit(terms.toArray)).as("hit"))
      .filter($"hit").select($"doc_id").as[Long].collect().toSet
    assert(ranked.subsetOf(hasTerm))
  }

  test("rrf fusion: score equals 1/(60+lex)+1/(60+vec) over the input ranks") {
    val rows = LexicalOps.queries("retrieval_hybrid_rrf")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lex, vec) = (r.getInt(4), r.getInt(5))
      assert(lex != -1 || vec != -1) // full-outer join never emits an orphan
      val expect = math.floor(
        ((if (lex == -1) 0.0 else 1.0 / (60 + lex)) +
          (if (vec == -1) 0.0 else 1.0 / (60 + vec))) * 1e9 + 0.5).toLong
      assert(r.getLong(3) == expect)
    }
  }

  test("bm25Rank on a constructed corpus: tf monotonicity and idf ordering") {
    import spark.implicits._
    import graft.api.Graft
    // same length docs; d1 has the query term once, d2 twice, d3 zero
    val docs = Seq(
      (1L, "apple pear plum kiwi"),
      (2L, "apple apple plum kiwi"),
      (3L, "pear plum kiwi grape")).toDF("doc_id", "text")
    val q = Seq((1, "apple")).toDF("qid", "qtext")
    val ranked = Graft.bm25Rank(docs, q, 10).collect()
    // only term-matching docs appear; higher tf ranks first
    assert(ranked.map(_.getLong(2)).toSeq == Seq(2L, 1L))
    assert(ranked.head.getLong(3) > ranked(1).getLong(3))

    // rarer term outscores a common term for the same tf (idf ordering):
    // 'kiwi' is in 3/3 docs, 'grape' in 1/3
    val q2 = Seq((1, "kiwi"), (2, "grape")).toDF("qid", "qtext")
    val r2 = Graft.bm25Rank(docs, q2, 1).collect()
      .map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(r2(2) > r2(1))
  }

  test("rrf: a doc ranked top-1 by both legs outranks any single-leg doc") {
    val rows = LexicalOps.queries("retrieval_hybrid_rrf")(spark, sf).collect()
    rows.groupBy(_.getInt(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(1))
      val scores = byRank.map(_.getLong(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      // any doc present in BOTH legs beats every doc present in only one
      // leg at strictly worse ranks — spot-check the invariant that fused
      // score is monotone in each leg rank
      val both = byRank.filter(r => r.getInt(4) != -1 && r.getInt(5) != -1)
      val onlyWorse = byRank.filter(r =>
        (r.getInt(4) == -1 || r.getInt(4) > 20) && r.getInt(5) == -1)
      if (both.nonEmpty && onlyWorse.nonEmpty)
        assert(both.map(_.getLong(3)).min >= onlyWorse.map(_.getLong(3)).max)
    }
  }

  test("bpe_encode_pretrained: fixed merges fire (corpus shrinks) and stack") {
    import org.apache.spark.sql.functions.sum
    val enc = LexicalOps.queries("bpe_encode_pretrained")(spark, sf)
    val encTok = enc.agg(sum(col("n_tokens"))).head().getLong(0)
    val rawTok = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")))
      .count()
    // every fired merge removes one token; the fixture vocabulary
    // guarantees 'hash join' / 'row batch' adjacencies exist
    assert(encTok < rawTok, s"enc=$encTok raw=$rawTok")
  }

  test("bpe train → encode round-trip: encoded token totals match round-2 tokens_after") {
    val train = LexicalOps.queries("bpe_train_merges")(spark, sf).collect()
    val tokensAfter2 = train.filter(_.getInt(0) == 2).head
      .getAs[Long]("tokens_after")
    val enc = LexicalOps.queries("bpe_encode")(spark, sf)
    val total = enc.agg(sum(col("n_tokens"))).head.getLong(0)
    assert(total == tokensAfter2, s"encode=$total train=$tokensAfter2")
    // every doc present exactly once, digests non-null
    assert(enc.filter(col("enc_md5").isNull).count() == 0)
  }
}
