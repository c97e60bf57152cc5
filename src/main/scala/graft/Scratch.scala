package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad for perf attribution experiments (not part of the
  * driver contract). Pattern: build the candidate plan variants inline,
  * time each with `time(...)`, compare. See commit history for the
  * experiments that shaped DedupOps/RetrievalOps (HOF vs native
  * signatures, threshold-in-join, materialization barriers, spread-
  * before-compute, salted layouts, codegen-cache sizing).
  * Current experiment: streaming drain fixed-cost attribution — batch
  * count, per-batch durations, and the batch-vs-stream gap. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", BenchEnv.localDir)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $name ($n rows)")
    }
    // batch equivalent of streaming_event_counts
    time("batch agg warm1")(Tables.events(spark, dir)
      .groupBy(col("event_type")).agg(count(lit(1)), sum(col("value"))).count())
    time("batch agg warm2")(Tables.events(spark, dir)
      .groupBy(col("event_type")).agg(count(lit(1)), sum(col("value"))).count())
    // streaming drains with progress dump
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val agg = streaming.StreamingOps.eventsStream(spark, dir, maxFiles = 1)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      val name = s"scratch_sink_$i"
      val q = agg.writeStream.outputMode("complete").format("memory")
        .queryName(name)
        .option("checkpointLocation", s"${BenchEnv.localDir}/scratch_ckpt_$name")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val total = (System.nanoTime() - t0) / 1e9
      val progress = q.recentProgress.map { p =>
        f"batch${p.batchId} in=${p.numInputRows} trigger=${p.durationMs.get("triggerExecution")}ms addBatch=${p.durationMs.get("addBatch")}ms getBatch=${p.durationMs.get("getBatch")}ms latestOffset=${p.durationMs.get("latestOffset")}ms commit=${p.durationMs.get("commitOffsets")}ms walCommit=${p.durationMs.get("walCommit")}ms"
      }.mkString("\n  ")
      println(f"$total%8.2f  stream drain $i\n  $progress")
    }
    spark.stop()
  }
}
