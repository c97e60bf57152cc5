package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad for perf attribution experiments (not part of the
  * driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val aqe = sys.env.getOrElse("SCRATCH_AQE", "true")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $name ($n rows)")
    }
    SparkEntry.entry(spark).count()
    val q = SparkEntry.queries
    for (_ <- 1 to 2) {
      time("jaccard")(q("dedup_ngram_jaccard")(spark, dir).count())
      time("editdist")(q("dedup_edit_distance")(spark, dir).count())
      time("minhash")(q("dedup_minhash_lsh")(spark, dir).count())
      time("langid")(q("ta_langid")(spark, dir).count())
      time("tpchq5")(q("tpch_q5")(spark, dir).count())
      time("tpchq3")(q("tpch_q3")(spark, dir).count())
      time("sess")(q("sessionize_30m")(spark, dir).count())
    }
    spark.stop()
  }
}
