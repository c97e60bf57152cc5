package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: dump physical plans for pushdown/pruning audit. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("m0_corpus_census", "f4_year_filter", "tpch_q1", "tpch_q3",
               "tpch_q5", "tpch_q19", "w2_topn_per_group", "v3_cosine_topk",
               "ann_int8_topk", "retrieval_bm25_topk", "t1_tumbling_window")
    names.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
