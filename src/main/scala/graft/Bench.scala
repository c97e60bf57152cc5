package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // 74 queries generate >>100 codegen'd stages; the default 100-entry
      // class cache evicts between the two timed passes and every query
      // pays Janino recompilation twice (measured: ta_langid 1.4s -> 4s)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts is TIMESTAMP(NANOS)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT + whole-stage-codegen compilation and parquet
    // footer reads otherwise land entirely on the first measured query.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // Two passes, min per query: reports steady-state latency (first
    // pass pays per-query codegen compilation + JIT, which is noise at
    // this scale and absent in any long-running deployment).
    // a failed query reports -1, never a bogus fast timing
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] query failed: ${e.getMessage}"); -1.0 }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (a, b) = (once(fn), once(fn))
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    // the driver keeps only the last ~3 KB of output: keys sorted,
    // per-query values as INTEGER MILLISECONDS (q_unit field says so)
    // so the ONE JSON line fits the capture window complete and
    // parseable at 128 queries (the full-precision dump goes to a file;
    // 2dp seconds at this query count is 3.1 KB — decapitated)
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + (if (v < 0) "-1" else math.round(v * 1000).toString)
    }.mkString("{", ",", "}")
    val qsFull = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val sfName = java.nio.file.Paths.get(sfDir).getFileName.toString
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","q_unit":"ms","queries":$qs,"sf":"$sfName"}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/bench_full.json"),
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qsFull,"sf":"$sfDir"}""")
    println(line)
    spark.stop()
  }
}
