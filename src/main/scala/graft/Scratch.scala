package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev scratchpad for perf attribution experiments (not part of the
  * driver contract). */
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
    SparkEntry.entry(spark).count()
    val q = SparkEntry.queries

    // langid variant: no doc_id barrier (trigram recompute is cheap and
    // parallel after the spread; saves one exchange + stage per branch)
    def langidNoBarrier(): Long = {
      val docTriArr = Tables.documentsSpread(spark, dir)
        .select(col("doc_id"), col("lang"),
                graft.functions.TextSignatures.charTrigrams(col("text")).as("tri"))
      val profiles = docTriArr
        .select(col("lang"), explode(col("tri")).as("tri"))
        .groupBy(col("lang"), col("tri")).agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("lang")).orderBy(desc("cnt"), col("tri"))))
        .filter(col("rn") <= 20)
        .groupBy(col("lang"))
        .agg(sort_array(collect_list(col("tri"))).as("ptri"))
        .select(col("lang").as("profile_lang"), col("ptri"))
      val scores = docTriArr.crossJoin(broadcast(profiles))
        .select(col("doc_id"), col("lang"), col("profile_lang"),
          graft.functions.SortedIntersectCount
            .sortedIntersectCount(col("tri"), col("ptri")).as("score"))
        .filter(col("score") > 0)
      val pred = scores
        .groupBy(col("doc_id"), col("lang"))
        .agg(min(struct((-col("score")).as("ns"), col("profile_lang"))).as("m"))
        .select(col("lang"), col("m.profile_lang").as("predicted"))
      pred.groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang"), col("predicted")).count()
    }

    for (_ <- 1 to 3) {
      time("langid current")(q("ta_langid")(spark, dir).count())
      time("langid nobarrier")(langidNoBarrier())
    }
    spark.stop()
  }
}
