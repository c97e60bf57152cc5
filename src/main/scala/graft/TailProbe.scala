package graft
import org.apache.spark.sql.SparkSession

/** Dev probe (not part of the driver contract): print the physical tail
  * of a query with the tail-sort rewrite on vs off, for ledger-diff
  * annotation. */
object TailProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.graft.tailSortSinglePartition", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    args.foreach { name =>
      Seq(true, false).foreach { flag =>
        spark.conf.set("spark.graft.tailSortSinglePartition", flag.toString)
        val p = SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.toString
        def occurrences(needle: String) =
          p.sliding(needle.length).count(_ == needle)
        val ex  = occurrences("Exchange ")
        val sp  = occurrences("Exchange SinglePartition")
        val rp  = occurrences("Exchange rangepartitioning")
        println(s"[tail] $name flag=$flag exchanges=$ex sp=$sp range=$rp")
        println(p.linesIterator.take(12).map("    " + _).mkString("\n"))
      }
    }
    spark.stop()
  }
}
