package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad for perf attribution experiments (not part of the
  * driver contract). Pattern: build the candidate plan variants inline,
  * time each with `time(...)`, compare. See commit history for the
  * experiments that shaped DedupOps/RetrievalOps (HOF vs native
  * signatures, threshold-in-join, materialization barriers). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $name ($n rows)")
    }
    // warmup
    SparkEntry.entry(spark).count()

    val q = SparkEntry.queries
    import org.apache.spark.sql.expressions.Window
    for (_ <- 1 to 2) {
      time("langid full")(q("ta_langid")(spark, dir).count())
      val docs = Tables.documents(spark, dir)
      val docTriArr = docs
        .select(col("doc_id"), col("lang"),
                graft.functions.TextSignatures.charTrigrams(col("text")).as("tri"))
        .repartition(col("doc_id"))
      val profiles = docTriArr
        .select(col("lang"), explode(col("tri")).as("tri"))
        .groupBy(col("lang"), col("tri")).agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("lang")).orderBy(desc("cnt"), col("tri"))))
        .filter(col("rn") <= 20)
        .groupBy(col("lang"))
        .agg(sort_array(collect_list(col("tri"))).as("ptri"))
        .select(col("lang").as("profile_lang"), col("ptri"))
      time("langid: profiles")(profiles.count())
      val scores = docTriArr.crossJoin(broadcast(profiles))
        .select(col("doc_id"), col("lang"), col("profile_lang"),
          graft.functions.SortedIntersectCount
            .sortedIntersectCount(col("tri"), col("ptri")).as("score"))
        .filter(col("score") > 0)
      time("langid: scores")(scores.count())

      time("minhash full")(q("dedup_minhash_lsh")(spark, dir).count())
      val mh = docs.filter(size(split(col("text"), " ")) >= 2)
        .select(col("doc_id"), graft.functions.TextSignatures.minHashSig(
          graft.functions.TextSignatures.wordBigrams(col("text")), 12).as("mhs"))
        .repartition(col("doc_id"))
      val bands = mh.select(col("doc_id"),
        explode(array((0 until 6).map(k =>
          concat(lit(s"$k:"),
                 element_at(col("mhs"), 2 * k + 1),
                 element_at(col("mhs"), 2 * k + 2))): _*)).as("band"))
      time("minhash: bands")(bands.count())
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .distinct()
      time("minhash: cand")(cand.count())

      val sh = docs
        .select(col("doc_id"), col("lang"), col("n_chars"),
                graft.functions.TextSignatures.wordBigramHashes(col("text")).as("bg"))
        .repartition(col("doc_id"))
        .select(col("doc_id"), col("lang"), (col("n_chars") / 128).cast("long").as("band"), col("bg"))
      time("jacc: shingled")(sh.count())
      time("jaccard full")(q("dedup_ngram_jaccard")(spark, dir).count())
      time("editdist full")(q("dedup_edit_distance")(spark, dir).count())
    }
    spark.stop()
  }
}
