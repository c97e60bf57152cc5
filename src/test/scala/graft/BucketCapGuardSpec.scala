package graft

import org.apache.spark.sql.functions._

/** Engine/oracle parity guard for the LSH hot-band cap: the Spark side
  * degrades bands above 4096 members to a star around the band min,
  * while the DuckDB oracle enumerates ALL within-band pairs — the two
  * agree only while every test-SF band stays under the cap. A fixture
  * or banding-layout change that pushes a band over the cap must fail
  * HERE, loudly, not as a confusing downstream hash mismatch (ADVICE
  * r4 #2). SimHash needs no guard: its byte/chunk indices are uncapped
  * (collision there does not imply similarity, so capping costs recall
  * — see Graft.simhashNearDups), which keeps them pair-complete like
  * their oracles. */
class BucketCapGuardSpec extends SparkSpec {

  private val cap = 4096 // must match dedup_minhash_lsh's maxBucketSize

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"minhash LSH bands stay under the hot-band cap at $dir") {
      val maxBand = graft.operators.DedupOps
        .lshBands(graft.operators.DedupOps.minhashSigs(spark, dir))
        .groupBy(col("band")).agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).head().getLong(0)
      assert(maxBand <= cap,
        s"band of $maxBand members exceeds the $cap cap: the star fallback " +
          "now diverges from the all-pairs oracle — model the cap in the " +
          "oracle SQL or re-block the fixture")
    }
  }
}
