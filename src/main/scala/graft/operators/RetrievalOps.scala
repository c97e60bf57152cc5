package graft.operators

import graft.Tables
import graft.functions.VectorFns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding & retrieval operators (SURVEY.md §2.9, reference
  * `embedding_engine.py`): L2 normalization (C15), the flat
  * inner-product index as a table (V2), brute-force cosine top-k (V3 —
  * the search `IndexFlatIP` implies), an LSH-bucketed approximate
  * variant, and embedding-space near-duplicate detection.
  *
  * All vector math is Catalyst higher-order functions over
  * ARRAY<DOUBLE> — sequential left-to-right folds, bit-identical to
  * DuckDB's list_dot_product, so scores hash-match the oracle exactly
  * (rounded 6dp for output only; ranking uses the raw double).
  *
  * Scale design:
  *  - V3 broadcast the (small) query set against the corpus: the corpus
  *    never shuffles; per-partition partial top-k would come free via
  *    TakeOrderedAndProject if k were global. With per-query window
  *    top-k the shuffle is (n_queries × corpus) scored rows — bounded
  *    by filtering to per-partition candidates at 1000× scale, or by
  *    the LSH variant below.
  *  - ANN: sign-random-projection buckets (first 4 axes as hyperplanes
  *    — a degenerate but deterministic SRP). Corpus bucketed once;
  *    queries probe only their bucket: the join is equi on bucket id,
  *    shuffle ∝ bucket size not corpus size. The 100 TB path swaps the
  *    hyperplanes for seeded random ones and adds multi-probe.
  *  - near-dup: brute-force n² on the unit sphere, the exact baseline
  *    the LSH-bucketed path approximates; blocked variants live in
  *    DedupOps.
  */
object RetrievalOps {

  /** Sign-bucket over the first 4 dimensions (deterministic SRP-LSH). */
  private def signBucket(v: org.apache.spark.sql.Column) =
    concat(
      when(element_at(v, 1) > 0, "1").otherwise("0"),
      when(element_at(v, 2) > 0, "1").otherwise("0"),
      when(element_at(v, 3) > 0, "1").otherwise("0"),
      when(element_at(v, 4) > 0, "1").otherwise("0"))

  private val signBucketSql =
    "(CASE WHEN v[1] > 0 THEN '1' ELSE '0' END || CASE WHEN v[2] > 0 THEN '1' ELSE '0' END || " +
      "CASE WHEN v[3] > 0 THEN '1' ELSE '0' END || CASE WHEN v[4] > 0 THEN '1' ELSE '0' END)"

  /** vec_id → double vector. No exchange here: the broadcast top-k
    * queries must stream the corpus straight out of the scan. */
  private def corpus(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).select(col("vec_id"), asDouble(col("embedding")).as("v"))

  /** Materialized corpus for self-joins ONLY: the exchange forces the
    * float→double cast to happen once per row; without it the collapsed
    * projection re-casts both 64-dim arrays once per candidate pair. */
  private def corpusMat(s: SparkSession, dir: String): DataFrame =
    corpus(s, dir).repartition(col("vec_id"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C15: L2 normalization via higher-order fns (embedding_engine.py:20).
    // Output in fixed-point micros: floor(x*1e6+0.5) is the same IEEE
    // double sequence in both engines, unlike decimal round() whose
    // tie-handling differs exactly at *.5 boundaries.
    "c15_l2_normalize" -> ((s, dir) =>
      corpus(s, dir)
        .withColumn("norm", l2Norm(col("v")))
        .select(col("vec_id"),
                floor(col("norm") * 1e6 + 0.5).cast("long").as("norm_e6"),
                floor(element_at(l2NormalizeBy(col("v"), col("norm")), 1) * 1e6 + 0.5)
                  .cast("long").as("first_dim_e6"))
        .orderBy(col("vec_id")).limit(100)),

    // V2+V3: flat-IP index ≡ the table; search = broadcast query set ×
    // corpus dot product + per-query window top-k (k=3).
    "v3_cosine_topk" -> ((s, dir) => {
      val c = corpus(s, dir)
      val q = c.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      c.join(broadcast(q), col("vec_id") =!= col("qid"))
        .withColumn("score", dot(col("qv"), col("v")))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("qid")).orderBy(desc("score"), col("vec_id"))))
        .filter(col("rank") <= 3)
        .select(col("qid"), col("rank"), col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy(col("qid"), col("rank"))
    }),

    // ANN: SRP-bucketed top-k — queries probe only their own bucket.
    "ann_lsh_topk" -> ((s, dir) => {
      val c = corpus(s, dir).withColumn("bucket", signBucket(col("v")))
      val q = c.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("bucket"))
      c.join(broadcast(q), Seq("bucket"))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("score", dot(col("qv"), col("v")))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("qid")).orderBy(desc("score"), col("vec_id"))))
        .filter(col("rank") <= 3)
        .select(col("qid"), col("rank"), col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy(col("qid"), col("rank"))
    }),

    // ANN, IVF variant: inverted-file search with the `label` column as
    // the coarse quantizer's cell assignment (the testdata's stand-in
    // for k-means output). Cells are summarized by their mean vector;
    // a query scores the 10 centroids (broadcast, trivial), probes the
    // top-2 cells, and scans ONLY those cells' vectors — at 100 TB the
    // corpus is partitioned/bucketed by cell so a probe reads ~nprobe/k
    // of the data instead of all of it.
    "ann_ivf_topk" -> ((s, dir) => {
      val c = corpus(s, dir).join(
        Tables.embeddings(s, dir).select(col("vec_id"), col("label")), "vec_id")
      val centroids = c
        .select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("label"), col("dim")).agg(avg(col("x")).as("cx"))
        .groupBy(col("label"))
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("cx")))),
          p => p.getField("cx")).as("cv"))
      val q = c.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val probed = q.crossJoin(broadcast(centroids))
        .withColumn("cscore", dot(col("qv"), col("cv")))
        .withColumn("crank", row_number().over(
          Window.partitionBy(col("qid")).orderBy(desc("cscore"), col("label"))))
        .filter(col("crank") <= 2) // nprobe = 2
        .select(col("qid"), col("qv"), col("label"))
      c.join(broadcast(probed), Seq("label"))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("score", dot(col("qv"), col("v")))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("qid")).orderBy(desc("score"), col("vec_id"))))
        .filter(col("rank") <= 3)
        .select(col("qid"), col("rank"), col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy(col("qid"), col("rank"))
    }),

    // ANN: int8 scalar quantization — the memory-compression scale path
    // (4× smaller vectors than float32, integer dot products). SYMMETRIC
    // quantization around zero (q = round(x·127/maxabs), one global
    // scale): inner products scale by a positive constant, so ranking is
    // preserved up to quantization noise — an asymmetric min-max scheme
    // would inject per-dim offset mass that swamps the IP ordering
    // (measured 1/15 top-3 recall vs 15/15 for symmetric on the
    // fixture). The scalar trains in one explode+max whose map-side
    // partial reduces every task to one row. Quantized scores are exact
    // longs — deterministic under any shuffle order and bit-identical in
    // the oracle. At 100 TB the quantized corpus (not the floats) is the
    // table you scan; re-ranking survivors against full precision is the
    // standard second stage (here: the exact family above).
    "ann_int8_topk" -> ((s, dir) => {
      // quantization delegated to the facade — one canonical int8
      // contract (see Graft.quantizeInt8's scaladoc for the symmetric-
      // scheme rationale measured here)
      val qd = graft.api.Graft.quantizeInt8(corpus(s, dir), "v", "qv")
        .select(col("vec_id"), col("qv"))
        .repartition(col("vec_id")) // materialize quantized vectors once
      val q = qd.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("qv").as("qq"))
      qd.join(broadcast(q), col("vec_id") =!= col("qid"))
        .withColumn("iscore",
          aggregate(zip_with(col("qq"), col("qv"), (a, b) => a * b),
                    lit(0L), (acc, y) => acc + y))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("qid")).orderBy(desc("iscore"), col("vec_id"))))
        .filter(col("rank") <= 3)
        .select(col("qid"), col("rank"), col("vec_id"), col("iscore"))
        .orderBy(col("qid"), col("rank"))
    }),

    // V1: deterministic hashing embedder — the compute-an-embedding path
    // (reference: SentenceTransformer encode, embedding_engine.py:15-22).
    // 8-dim HashingTF-style: dim d = #tokens whose md5-derived hash ≡ d
    // (mod 8), L2-normalized; fixed-point output for oracle exactness.
    "v1_hash_embed" -> ((s, dir) => {
      // single native pass (TextSignatures.HashEmbed8): identical
      // arithmetic to the oracle's explode/groupBy form, but the embed
      // stage is map-side-only — no token explode, no aggregate shuffle.
      // NULL-text parity with the oracle: the explode form (and the
      // oracle's unnest) DROPS null-text docs; the native expression
      // would keep them with a NULL vector, so filter explicitly.
      val vec = graft.functions.TextSignatures.hashEmbed8(col("text"))
      Tables.documentsSpread(s, dir)
        .filter(col("text").isNotNull)
        .select(col("doc_id"), vec.as("raw"))
        .withColumn("norm", l2Norm(col("raw")))
        .select(col("doc_id"),
          floor(element_at(l2NormalizeBy(col("raw"), col("norm")), 1) * 1e6 + 0.5)
            .cast("long").as("e0_e6"),
          floor(element_at(l2NormalizeBy(col("raw"), col("norm")), 2) * 1e6 + 0.5)
            .cast("long").as("e1_e6"))
        .orderBy(col("doc_id")).limit(200)
    }),

    // Embedding-cosine near-dup: exact n² baseline on unit vectors.
    "neardup_embedding" -> ((s, dir) => {
      val c = corpusMat(s, dir)
      c.as("a").join(c.as("b"), col("a.vec_id") < col("b.vec_id"))
        .withColumn("score", dot(col("a.v"), col("b.v")))
        .filter(col("score") >= 0.4)
        .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
                round(col("score"), 6).as("score"))
        .orderBy(col("a_id"), col("b_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "c15_l2_normalize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e)
        |SELECT vec_id, CAST(floor(norm * 1e6 + 0.5) AS BIGINT) AS norm_e6,
        |CAST(floor(v[1] / norm * 1e6 + 0.5) AS BIGINT) AS first_dim_e6
        |FROM n ORDER BY vec_id LIMIT 100""".stripMargin,

    "v3_cosine_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
        |scored AS (SELECT q.qid, e.vec_id, list_dot_product(q.qv, e.v) AS score
        |  FROM e CROSS JOIN q WHERE e.vec_id <> q.qid),
        |r AS (SELECT qid, vec_id, score,
        |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
        |  FROM scored)
        |SELECT qid, rank::INT AS rank, vec_id, round(score, 6) AS score
        |FROM r WHERE rank <= 3 ORDER BY qid, rank""".stripMargin,

    "ann_lsh_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |c AS (SELECT vec_id, v, $signBucketSql AS bucket FROM e),
         |q AS (SELECT vec_id AS qid, v AS qv, bucket FROM c WHERE vec_id < 5),
         |scored AS (SELECT q.qid, c.vec_id, list_dot_product(q.qv, c.v) AS score
         |  FROM c JOIN q USING (bucket) WHERE c.vec_id <> q.qid),
         |r AS (SELECT qid, vec_id, score,
         |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
         |  FROM scored)
         |SELECT qid, rank::INT AS rank, vec_id, round(score, 6) AS score
         |FROM r WHERE rank <= 3 ORDER BY qid, rank""".stripMargin,

    "ann_int8_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cb AS (SELECT max(abs(x)) AS gm FROM (SELECT unnest(v) AS x FROM e)),
        |qd AS (SELECT vec_id,
        |    list_transform(v, x -> floor(x * 127.0 / gm + 0.5)::BIGINT) AS qv
        |  FROM e CROSS JOIN cb),
        |q AS (SELECT vec_id AS qid, qv AS qq FROM qd WHERE vec_id < 5),
        |sc AS (SELECT q.qid, qd.vec_id,
        |    list_sum(list_transform(range(1, len(qd.qv) + 1),
        |      i -> qq[i] * qd.qv[i]))::BIGINT AS iscore
        |  FROM qd CROSS JOIN q WHERE qd.vec_id <> q.qid),
        |r AS (SELECT qid, vec_id, iscore,
        |  row_number() OVER (PARTITION BY qid ORDER BY iscore DESC, vec_id) AS rank
        |  FROM sc)
        |SELECT qid, rank::INT AS rank, vec_id, iscore
        |FROM r WHERE rank <= 3 ORDER BY qid, rank""".stripMargin,

    "ann_ivf_topk" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |cent AS (SELECT label, dim, avg(x) AS cx FROM (
        |    SELECT label, unnest(v) AS x,
        |           unnest(range(1, len(v) + 1)) AS dim FROM e)
        |  GROUP BY label, dim),
        |cv AS (SELECT label, list(cx ORDER BY dim) AS cv FROM cent GROUP BY label),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
        |pr AS (SELECT qid, qv, label, row_number() OVER (PARTITION BY qid
        |    ORDER BY list_dot_product(qv, cv) DESC, label) AS crank
        |  FROM q CROSS JOIN cv),
        |probed AS (SELECT qid, qv, label FROM pr WHERE crank <= 2),
        |scored AS (SELECT p.qid, e.vec_id, list_dot_product(p.qv, e.v) AS score
        |  FROM e JOIN probed p USING (label) WHERE e.vec_id <> p.qid),
        |r AS (SELECT qid, vec_id, score, row_number() OVER (PARTITION BY qid
        |    ORDER BY score DESC, vec_id) AS rank FROM scored)
        |SELECT qid, rank::INT AS rank, vec_id, round(score, 6) AS score
        |FROM r WHERE rank <= 3 ORDER BY qid, rank""".stripMargin,
    "v1_hash_embed" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |h AS (SELECT doc_id,
        |  CAST(('0x' || substr(md5(tok), 1, 4))::INT % 8 AS INT) AS hd FROM tok),
        |c AS (SELECT doc_id,
        |  count(*) FILTER (WHERE hd = 0)::DOUBLE AS d0,
        |  count(*) FILTER (WHERE hd = 1)::DOUBLE AS d1,
        |  count(*) FILTER (WHERE hd = 2)::DOUBLE AS d2,
        |  count(*) FILTER (WHERE hd = 3)::DOUBLE AS d3,
        |  count(*) FILTER (WHERE hd = 4)::DOUBLE AS d4,
        |  count(*) FILTER (WHERE hd = 5)::DOUBLE AS d5,
        |  count(*) FILTER (WHERE hd = 6)::DOUBLE AS d6,
        |  count(*) FILTER (WHERE hd = 7)::DOUBLE AS d7
        |  FROM h GROUP BY doc_id),
        |n AS (SELECT doc_id, d0, d1,
        |  sqrt(d0*d0 + d1*d1 + d2*d2 + d3*d3 + d4*d4 + d5*d5 + d6*d6 + d7*d7) AS norm
        |  FROM c)
        |SELECT doc_id,
        |  CAST(floor(d0 / norm * 1e6 + 0.5) AS BIGINT) AS e0_e6,
        |  CAST(floor(d1 / norm * 1e6 + 0.5) AS BIGINT) AS e1_e6
        |FROM n ORDER BY doc_id LIMIT 200""".stripMargin,

    "neardup_embedding" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(list_dot_product(a.v, b.v), 6) AS score
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.v, b.v) >= 0.4
        |ORDER BY a_id, b_id""".stripMargin
  )
}
