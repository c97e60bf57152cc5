package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: measures this host's per-exchange latency floor with
  * trivial 1/2/4-stage queries, isolating environment (shuffle-file
  * I/O latency, task scheduling) from any real plan. Used in r5 to
  * attribute the driver-bench TPC-H inflation (shuffle-heavy queries
  * +~1.3 s, scan-only untouched) to a ~400 ms/exchange floor on the
  * default /tmp local dir — halved by tmpfs (BenchEnv.localDir).
  * Usage: runMain graft.FloorProbe [localDir] */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val localDir = if (args.nonEmpty) args(0) else BenchEnv.localDir
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", localDir)
      .config("spark.shuffle.compress",
        sys.env.getOrElse("PROBE_SHUFFLE_COMPRESS", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
    }
    for (i <- 1 to 4) {
      t(s"1-stage count $i")(spark.range(1000000).selectExpr("sum(id)").collect())
      t(s"2-stage shuffle $i")(spark.range(1000000).repartition(32).selectExpr("sum(id)").collect())
      t(s"4-stage shuffle $i")(spark.range(1000000).repartition(32)
        .groupBy(org.apache.spark.sql.functions.expr("id % 1000")).count()
        .groupBy(org.apache.spark.sql.functions.expr("count % 7")).count().collect())
    }
    spark.stop()
  }
}
