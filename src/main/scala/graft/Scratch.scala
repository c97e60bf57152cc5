package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad for perf attribution experiments (not part of the
  * driver contract). Pattern: build the candidate plan variants inline,
  * time each with `time(...)`, compare. See commit history for the
  * experiments that shaped DedupOps/RetrievalOps (HOF vs native
  * signatures, threshold-in-join, materialization barriers, spread-
  * before-compute, salted layouts, codegen-cache sizing).
  * Current experiment: stat_poisson_bootstrap_ci stage attribution. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", BenchEnv.localDir)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $name ($n rows)")
    }
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
              floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .localCheckpoint()
    time("warm count")(ev.count())
    // stage 1: just the two md5s
    val packed = ev
      .withColumn("h0", md5(concat(col("event_id").cast("string"), lit(":p0"))))
      .withColumn("h1", md5(concat(col("event_id").cast("string"), lit(":p1"))))
    time("md5 only")(packed.select(max(length(col("h0")))).count())
    // stage 2: + 16 convs
    def hexAt(b: Int) = s"substring(h${b / 8}, ${(b % 8) * 4 + 1}, 4)"
    val withU = packed.select(
      col("event_type") +: col("cents") +: (0 until 16).map { b =>
        expr(s"CAST(CAST(conv(${hexAt(b)}, 16, 10) AS BIGINT) AS DOUBLE) / 65536.0")
          .as(s"u_$b")
      }: _*)
    time("u16 agg")(withU.groupBy(col("event_type"))
      .agg(sum(col("u_0")), sum(col("u_15"))).count())
    // stage 3: + CASE walks + 34-col agg
    val cdf = Seq(
      "0.36787944117144233", "0.7357588823428847", "0.9196986029286058",
      "0.9810118431238462", "0.9963401531726563", "0.9994058151824183",
      "0.9999167588507119", "0.9999897508637437")
    val wExpr = cdf.zipWithIndex.foldRight(s"${cdf.length}": String) {
      case ((c, k), rest) => s"CASE WHEN __u < $c THEN $k ELSE $rest END"
    }
    val withW = withU.select(
      col("event_type") +: col("cents") +: (0 until 16).map { b =>
        expr(s"CAST(${wExpr.replace("__u", s"u_$b")} AS BIGINT)").as(s"w_$b")
      }: _*)
    val aggCols = (0 until 16).flatMap { b =>
      Seq(sum(col(s"w_$b")).as(s"sw_$b"),
          sum(col(s"w_$b") * col("cents")).as(s"swc_$b"))
    } ++ Seq(count(lit(1)).as("n_events"), expr("sum(cents)").as("stc"))
    time("full wide agg")(withW.groupBy(col("event_type"))
      .agg(aggCols.head, aggCols.tail: _*).count())
    time("full wide agg 2")(withW.groupBy(col("event_type"))
      .agg(aggCols.head, aggCols.tail: _*).count())
    // tail: stack -> window -> final agg on my own wide
    val wide = withW.groupBy(col("event_type")).agg(aggCols.head, aggCols.tail: _*)
    val stackExpr = "stack(16, " + (0 until 16).map(b => s"$b, sw_$b, swc_$b").mkString(", ") + ") AS (b, sw, swc)"
    def tail() = {
      val means = wide.selectExpr("event_type", "n_events", "stc", stackExpr)
        .filter(col("sw") > 0)
        .select(col("event_type"), col("n_events"), col("stc"), col("b"),
                expr("swc div sw").as("mean_c"))
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
            .orderBy(col("mean_c"), col("b"))))
      means.groupBy(col("event_type"))
        .agg(max(col("n_events")).as("n_events"),
             expr("max(stc) div max(n_events)").as("mean_c"),
             max(when(col("rn") === 2, col("mean_c"))).as("ci_lo_c"),
             max(when(col("rn") === 15, col("mean_c"))).as("ci_hi_c"))
        .filter(col("ci_lo_c").isNotNull && col("ci_hi_c").isNotNull)
        .orderBy(col("event_type"))
    }
    time("inline full tail")(tail().count())
    time("inline full tail 2")(tail().count())
    time("inline full tail 3")(tail().count())
    // the registered query end-to-end
    time("registered q")(SparkEntry.queries("stat_poisson_bootstrap_ci")(spark, dir).count())
    time("registered q 2")(SparkEntry.queries("stat_poisson_bootstrap_ci")(spark, dir).count())
    time("registered q 3")(SparkEntry.queries("stat_poisson_bootstrap_ci")(spark, dir).count())
    spark.stop()
  }
}
