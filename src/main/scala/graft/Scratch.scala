package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev scratchpad (not part of the driver contract). Current
  * experiment: dropDuplicatesWithinWatermark per-batch state metrics
  * on the 4-file docs fixture — pinning the eviction semantics for a
  * closed-form oracle. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", BenchEnv.localDir)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val srcDir = streaming.StreamingOps.docsBatchFixtureDir(spark, dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val ded = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(srcDir)
      .withColumn("ts", timestamp_seconds(col("doc_id")))
      .withWatermark("ts", "150 seconds")
      .select(col("ts"), pmod(col("doc_id"), lit(97L)).as("k"))
      .dropDuplicatesWithinWatermark("k")
    val name = "graft_scratch_evict"
    val q = ded.writeStream.outputMode("append").format("memory").queryName(name)
      .option("checkpointLocation", s"${BenchEnv.localDir}/graft_ckpt_$name")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.recentProgress.foreach { prog =>
      val wm = prog.eventTime.get("watermark")
      val st = prog.stateOperators.headOption.map(o =>
        s"updated=${o.numRowsUpdated} total=${o.numRowsTotal} removed=${o.numRowsRemoved}").getOrElse("-")
      println(s"[probe] batch=${prog.batchId} in=${prog.numInputRows} out=${prog.sink.numOutputRows} wm=$wm $st")
    }
    // fixture shape for the replay derivation
    val nt = api.Graft.globalNtile(Tables.documents(spark, dir)
      .select(col("doc_id")), 4, "batch", col("doc_id"))
    nt.groupBy(col("batch")).agg(count(lit(1)), min(col("doc_id")), max(col("doc_id")))
      .orderBy(col("batch")).show()
    spark.stop()
  }
}
