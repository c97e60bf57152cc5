package graft
import org.apache.spark.sql.SparkSession

/** Plan-shape regression ledger: for every registered query, count the
  * structural operators in its physical plan (exchanges, broadcasts,
  * sorts, whole-stage-codegen spans, nested-loop joins) and dump ONE
  * sorted JSON map. A committed per-round snapshot (PLAN_LEDGER_r{N}
  * .json) makes plan regressions diffable: a NEW exchange appearing in
  * a query whose code did not change is a Catalyst/plan regression the
  * bench would only show as noise-sized seconds.
  *
  * Usage: runMain graft.PlanLedger [outFile] [sfDir]
  * Counting explainString lines is deliberately crude-but-stable: the
  * ledger compares a query AGAINST ITSELF across rounds, so only
  * count stability matters, not plan-node taxonomy.
  */
object PlanLedger {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "target/plan_ledger.json"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def count(p: String, needle: String): Int =
      p.split('\n').count(_.contains(needle))
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val entry =
        try {
          val p = fn(spark, dir).queryExecution.explainString(
            org.apache.spark.sql.execution.SimpleMode)
          Seq(
            "exchanges" -> count(p, "Exchange hashpartitioning"),
            "range_exchanges" -> count(p, "Exchange rangepartitioning"),
            "single_partition" -> count(p, "Exchange SinglePartition"),
            "broadcasts" -> count(p, "BroadcastExchange"),
            "sorts" -> count(p, "+- Sort "),
            "bnl_joins" -> count(p, "BroadcastNestedLoopJoin"),
            "cartesian" -> count(p, "CartesianProduct"),
            "scans" -> count(p, "Scan parquet"),
            // pushdown health: scans with a non-empty pushed-filter
            // list, and scans reading ≤4 columns (a proxy for pruning —
            // stable for a fixed query, which is all a diff needs)
            "pushed_scans" -> p.split('\n')
              .count(l => l.contains("PushedFilters: [") &&
                          !l.contains("PushedFilters: []")),
            "narrow_scans" -> p.split('\n').count { l =>
              val i = l.indexOf("ReadSchema: struct<")
              // count commas inside the struct<...> only — the FileScan
              // line carries DataFilters/Location/etc before it
              i >= 0 && {
                val s = l.substring(i + "ReadSchema: struct<".length)
                s.take(math.max(s.indexOf('>'), 0)).count(_ == ',') <= 3
              }
            })
            .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
        } catch {
          case e: Throwable =>
            System.err.println(s"[ledger] $name failed: ${e.getMessage}")
            """{"error":1}"""
        }
      s""""$name":$entry"""
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      rows.mkString("{\n", ",\n", "\n}"))
    println(s"[ledger] ${rows.size} plans -> $out")
    spark.stop()
  }
}
