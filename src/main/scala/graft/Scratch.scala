package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorFns._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"${(System.nanoTime()-t0)/1e9}%8.2f  $name ($n rows)")
    }
    val e = Tables.embeddings(spark, dir)
    time("warm scan")(e.count())
    time("scan again")(e.count())
    val c = e.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    time("cast all")(c.filter(element_at(col("v"),1) > -100).count())
    val q = c.filter(col("vec_id") < 5).select(col("vec_id").as("qid"), col("v").as("qv"))
    val joined = c.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("score", dot(col("qv"), col("v")))
    time("join+dot")(joined.count())
    import org.apache.spark.sql.expressions.Window
    time("full v3")(operators.RetrievalOps.queries("v3_cosine_topk")(spark, dir).count())
    time("full v3 again")(operators.RetrievalOps.queries("v3_cosine_topk")(spark, dir).count())
    spark.stop()
  }
}
