package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Event-time semantics the reference lacks entirely (SURVEY §2.10 notes
  * "no watermarks, no late-data handling"): prove the engine's
  * generalization handles them — a watermark drops data later than the
  * threshold, and append mode only emits finalized windows. */
class WatermarkSpec extends SparkSpec {

  test("watermark drops too-late events; append emits only closed windows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(java.sql.Timestamp, String)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

    val agg = source.toDF().toDF("ts", "k")
      .withWatermark("ts", "5 minutes")
      .groupBy(window($"ts", "10 minutes"), $"k")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("w"), $"k", $"n")
    val name = "wm_sink_" + System.nanoTime()
    val q = agg.writeStream.outputMode("append").format("memory").queryName(name).start()

    // batch 1: two events in the 10:00 window, one in 10:10
    source.addData((ts(1), "a"), (ts(4), "a"), (ts(12), "a"))
    q.processAllAvailable()
    // watermark now 10:12 - 5min = 10:07 → 10:00 window still open
    assert(spark.table(name).count() == 0)

    // batch 2: event at 10:21 advances watermark to 10:16 → closes the
    // 10:00 and 10:10 windows (window end <= watermark)
    source.addData((ts(21), "a"))
    q.processAllAvailable()
    // batch 3: straggler at 10:02 — its window already closed under the
    // watermark → DROPPED, not re-aggregated, no retraction
    source.addData((ts(2), "a"), (ts(35), "a"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table(name)
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2))).toMap
    // 10:00 window: the straggler was late → still counts 2, not 3
    assert(rows("2024-01-01 10:00:00.0") == 2L)
    assert(rows("2024-01-01 10:10:00.0") == 1L)
  }
}
