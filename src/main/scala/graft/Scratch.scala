package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad for perf attribution experiments (not part of the
  * driver contract). Pattern: build the candidate plan variants inline,
  * time each with `time(...)`, compare. See commit history for the
  * experiments that shaped DedupOps/RetrievalOps (HOF vs native
  * signatures, threshold-in-join, materialization barriers, spread-
  * before-compute, salted layouts, codegen-cache sizing). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $name ($n rows)")
    }
    time("entry smoke")(SparkEntry.entry(spark).count())
    spark.stop()
  }
}
