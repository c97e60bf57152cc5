package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the driver contract). Current
  * experiment: validate TailSortSinglePartition (r11 verdict #1) —
  * plan shape, write-path job count, and row-order equality vs the
  * range-sort form. */
object Scratch {
  private def session(flag: Boolean) = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.local.dir", BenchEnv.localDir)
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.graft.tailSortSinglePartition", flag.toString)
    .config("spark.ui.enabled", "false").getOrCreate()

  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val keys = Seq("a1_count_by_year", "w2_topn_per_group", "tpch_q1")
    // pass 1: flag OFF — reference row orders + write job count
    val s1 = session(flag = false)
    s1.sparkContext.setLogLevel("ERROR")
    val refRows = keys.map { k =>
      k -> SparkEntry.queries(k)(s1, dir).collect().toSeq.map(_.toString)
    }.toMap
    val j0 = s1.sparkContext.statusTracker.getJobIdsForGroup(null).length
    SparkEntry.queries("a1_count_by_year")(s1, dir).coalesce(1)
      .write.mode("overwrite").parquet(s"${BenchEnv.localDir}/graft_scr_off")
    val jOff = s1.sparkContext.statusTracker.getJobIdsForGroup(null).length - j0
    s1.stop()
    // pass 2: flag ON — same rows in the same order, fewer jobs, no range exchange
    val s2 = session(flag = true)
    s2.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(s2, dir)
      val plan = df.queryExecution.executedPlan.toString
      val rng = plan.contains("rangepartitioning")
      val got = df.collect().toSeq.map(_.toString)
      val same = got == refRows(k)
      println(s"[scratch] $k: rangeExchange=$rng orderEqual=$same rows=${got.size}")
    }
    val j1 = s2.sparkContext.statusTracker.getJobIdsForGroup(null).length
    SparkEntry.queries("a1_count_by_year")(s2, dir).coalesce(1)
      .write.mode("overwrite").parquet(s"${BenchEnv.localDir}/graft_scr_on")
    val jOn = s2.sparkContext.statusTracker.getJobIdsForGroup(null).length - j1
    println(s"[scratch] a1 write jobs: off=$jOff on=$jOn")
    println("=== a1 plan with rewrite ===")
    SparkEntry.queries("a1_count_by_year")(s2, dir).explain("formatted")
    s2.stop()
  }
}
