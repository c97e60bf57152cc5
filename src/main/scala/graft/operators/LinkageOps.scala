package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi–Sunter 1969) — the field-wise
  * complement of the text/minhash dedup family: when two record SOURCES
  * describe the same entities with clerical noise, match/non-match
  * evidence is the per-field agreement PATTERN, weighted by how
  * discriminating each field is.
  *
  * The fixture manufactures the second source deterministically from
  * `customer` with md5-seeded clerical noise (the repo's engine-portable
  * draw idiom): ~10% of names lose their last character, ~5% of nation
  * keys shift, every account balance jitters by up to ±5 — so ground
  * truth (same custkey) is known and the decision table can report
  * true-match purity per pattern.
  *
  * Scale story: candidate generation is BLOCKING — an equi join on
  * (mktsegment, nationkey), never an all-pairs cross. Pair volume is
  * Σ_b |A_b|·|B_b|, bounded by the block-size cap any production linker
  * enforces (same shape as the LSH band cap in dedup_minhash_lsh). The
  * u-probabilities (P(agree | random non-match) = Σ_v p_v² under the
  * field's empirical value distribution) come from per-field count
  * aggregates — three map-side-combinable groupBys — and the log-weight
  * math runs on the EIGHT-row pattern table after aggregation, not per
  * pair. Per-pair work is three equality tests.
  */
object LinkageOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](

    // Fellegi–Sunter decision table: one row per agreement pattern with
    // pair count, true-match count, and the pattern's log2 match weight.
    "link_fellegi_sunter" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      def draw(salt: String) =
        conv(substring(md5(concat(col("c_custkey").cast("string"),
          lit(salt))), 1, 4), 16, 10).cast("long")
      val clean = cust.select(
        col("c_custkey").as("a_key"), col("c_name").as("a_name"),
        col("c_nationkey").as("a_nation"), col("c_mktsegment").as("a_seg"),
        floor(col("c_acctbal") / 500.0).cast("long").as("a_bucket"))
      val dirty = cust
        .withColumn("name_d",
          when(draw(":fs1") % 10 === 0,
               expr("substring(c_name, 1, length(c_name) - 1)"))
            .otherwise(col("c_name")))
        .withColumn("nation_d",
          when(draw(":fs2") % 20 === 0, (col("c_nationkey") + 1) % 25)
            .otherwise(col("c_nationkey")))
        .withColumn("acct_d", col("c_acctbal") + (draw(":fs3") % 11 - 5))
        .select(col("c_custkey").as("b_key"), col("name_d").as("b_name"),
                col("nation_d").as("b_nation"),
                col("c_mktsegment").as("b_seg"),
                floor(col("acct_d") / 500.0).cast("long").as("b_bucket"))

      // u-probabilities from the clean side's value distributions:
      // P(two random records agree on field f) = Σ_v (n_v / N)².
      def uProb(df: DataFrame, c: String, alias: String): DataFrame = df
        .groupBy(col(c)).agg(count(lit(1)).as("nv"))
        .agg((sum(col("nv") * col("nv")) /
              (sum(col("nv")) * sum(col("nv")))).as(alias))
      val us = uProb(clean, "a_name", "u_name")
        .crossJoin(uProb(clean, "a_nation", "u_nation"))
        .crossJoin(uProb(clean, "a_bucket", "u_bucket"))

      val patterns = clean.join(dirty,
          col("a_seg") === col("b_seg") && col("a_nation") === col("b_nation"))
        .select(
          (col("a_name") === col("b_name")).cast("int").as("ag_name"),
          lit(1).as("ag_nation"), // blocking key — agrees by construction
          (col("a_bucket") === col("b_bucket")).cast("int").as("ag_bucket"),
          (col("a_key") === col("b_key")).cast("int").as("is_true"))
        .groupBy(col("ag_name"), col("ag_nation"), col("ag_bucket"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("is_true")).as("n_true"))

      // m = 0.95, 1-m written as the literal 0.05 (not computed — the
      // double 1.0-0.95 is not exactly 0.05; the oracle uses the same
      // literals). Sum the natural-log weights FIRST, divide by ln 2
      // once, so the FP operation order matches the oracle exactly.
      def w(ag: String, u: String) =
        when(col(ag) === 1, log(lit(0.95) / col(u)))
          .otherwise(log(lit(0.05) / (lit(1.0) - col(u))))
      patterns.crossJoin(broadcast(us))
        .select(col("ag_name"), col("ag_nation"), col("ag_bucket"),
                col("n_pairs"), col("n_true"),
                round((w("ag_name", "u_name") + w("ag_nation", "u_nation") +
                       w("ag_bucket", "u_bucket")) / log(lit(2.0)), 6)
                  .as("score_r6"))
        .orderBy(desc("score_r6"), col("ag_name"), col("ag_bucket"))
    })
  )

  def oracles: Map[String, String] = Map(
    "link_fellegi_sunter" ->
      """WITH clean AS (
        |  SELECT c_custkey AS a_key, c_name AS a_name,
        |         c_nationkey AS a_nation, c_mktsegment AS a_seg,
        |         floor(c_acctbal / 500.0)::BIGINT AS a_bucket
        |  FROM customer),
        |dirty AS (
        |  SELECT c_custkey AS b_key,
        |    CASE WHEN ('0x' || substr(md5(c_custkey::VARCHAR || ':fs1'), 1, 4))::BIGINT % 10 = 0
        |         THEN substr(c_name, 1, length(c_name) - 1) ELSE c_name END AS b_name,
        |    CASE WHEN ('0x' || substr(md5(c_custkey::VARCHAR || ':fs2'), 1, 4))::BIGINT % 20 = 0
        |         THEN (c_nationkey + 1) % 25 ELSE c_nationkey END AS b_nation,
        |    c_mktsegment AS b_seg,
        |    floor((c_acctbal +
        |      (('0x' || substr(md5(c_custkey::VARCHAR || ':fs3'), 1, 4))::BIGINT % 11 - 5))
        |      / 500.0)::BIGINT AS b_bucket
        |  FROM customer),
        |u_name AS (SELECT sum(nv * nv)::DOUBLE / (sum(nv) * sum(nv)) AS u_name
        |  FROM (SELECT count(*) AS nv FROM clean GROUP BY a_name)),
        |u_nation AS (SELECT sum(nv * nv)::DOUBLE / (sum(nv) * sum(nv)) AS u_nation
        |  FROM (SELECT count(*) AS nv FROM clean GROUP BY a_nation)),
        |u_bucket AS (SELECT sum(nv * nv)::DOUBLE / (sum(nv) * sum(nv)) AS u_bucket
        |  FROM (SELECT count(*) AS nv FROM clean GROUP BY a_bucket)),
        |pat AS (
        |  SELECT (a_name = b_name)::INT AS ag_name,
        |         1 AS ag_nation,
        |         (a_bucket = b_bucket)::INT AS ag_bucket,
        |         count(*) AS n_pairs,
        |         sum((a_key = b_key)::INT)::BIGINT AS n_true
        |  FROM clean JOIN dirty
        |    ON a_seg = b_seg AND a_nation = b_nation
        |  GROUP BY 1, 2, 3)
        |SELECT ag_name, ag_nation, ag_bucket, n_pairs, n_true,
        |  round((
        |    (CASE WHEN ag_name = 1 THEN ln(0.95 / u_name)
        |          ELSE ln(0.05 / (1 - u_name)) END +
        |     CASE WHEN ag_nation = 1 THEN ln(0.95 / u_nation)
        |          ELSE ln(0.05 / (1 - u_nation)) END +
        |     CASE WHEN ag_bucket = 1 THEN ln(0.95 / u_bucket)
        |          ELSE ln(0.05 / (1 - u_bucket)) END) / ln(2.0)), 6) AS score_r6
        |FROM pat, u_name, u_nation, u_bucket
        |ORDER BY score_r6 DESC, ag_name, ag_bucket""".stripMargin
  )
}
