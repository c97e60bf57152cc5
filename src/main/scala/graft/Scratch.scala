package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev scratchpad (not part of the driver contract). Current
  * experiment: pin the dropDuplicatesWithinWatermark LATE-FILTER
  * boundary: ts == 0 at the initial wm 0 (epoch edge), and ts == wm
  * exactly at a nonzero wm. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", BenchEnv.localDir)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import java.nio.file.{Files, Paths}
    val root = Paths.get(s"${BenchEnv.localDir}/graft_scratch_filter")
    if (Files.exists(root)) {
      Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    Files.createDirectories(root)
    def put(name: String, mtime: Long, rows: Seq[Long]): Unit = {
      val p = root.resolve(name)
      Files.write(p, rows.map(id => s"""{"doc_id":$id,"text":"x"}""")
        .mkString("", "\n", "\n").getBytes("UTF-8"))
      p.toFile.setLastModified(mtime): Unit
    }
    // batch 1: ts {0, 50} at initial wm 0 — is ts=0 dropped?
    put("b01.json", 1700000000000L, Seq(0L, 50L))
    // batch 2: ts {300} — advances wm to 150 for batch 3
    put("b02.json", 1700000060000L, Seq(300L))
    // batch 3: ts {150, 160} at wm 150 — is the exact-equality row dropped?
    put("b03.json", 1700000120000L, Seq(150L, 160L))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val ckpt = s"${BenchEnv.localDir}/graft_ckpt_scratch_filter"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    val ded = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(root.toString)
      .withColumn("ts", timestamp_seconds(col("doc_id")))
      .withWatermark("ts", "150 seconds")
      .select(col("ts"), col("doc_id").as("k")) // every id its own key
      .dropDuplicatesWithinWatermark("k")
    val name = "graft_scratch_filter_q"
    val q = ded.writeStream.outputMode("append").format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.recentProgress.foreach { prog =>
      val st = prog.stateOperators.headOption.map(o =>
        s"updated=${o.numRowsUpdated} total=${o.numRowsTotal} " +
        s"removed=${o.numRowsRemoved} droppedLate=${o.numRowsDroppedByWatermark}")
        .getOrElse("-")
      println(s"[probe] batch=${prog.batchId} in=${prog.numInputRows} " +
        s"wm=${prog.eventTime.get("watermark")} $st")
    }
    spark.sql(s"SELECT k FROM $name ORDER BY k").show(20, false)
    spark.stop()
  }
}
