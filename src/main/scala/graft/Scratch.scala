package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    import graft.functions.SortedIntersectCount.sortedIntersectCountLong
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), (col("n_chars")/128).cast("long").as("band"),
              graft.functions.TextSignatures.wordBigramHashes(col("text")).as("bg"))
      .repartition(col("doc_id"))
    def inter(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = sortedIntersectCountLong(a, b)
    def jac(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val i = inter(a, b); i.cast("double") / (size(a) + size(b) - i)
    }
    time("warm")(sh.count())
    // current shape: filter after join output
    time("current")(
      sh.as("a").join(sh.as("b"),
        col("a.lang")===col("b.lang") && col("a.band")===col("b.band") &&
        col("a.doc_id")<col("b.doc_id") && size(col("a.bg")) > 0)
      .select(col("a.doc_id"), col("b.doc_id"), round(jac(col("a.bg"), col("b.bg")),6).as("j"))
      .filter(col("j") >= 0.5).count())
    // threshold inside the join condition
    time("threshold-in-join")(
      sh.as("a").join(sh.as("b"),
        col("a.lang")===col("b.lang") && col("a.band")===col("b.band") &&
        col("a.doc_id")<col("b.doc_id") && size(col("a.bg")) > 0 &&
        jac(col("a.bg"), col("b.bg")) >= 0.5)
      .select(col("a.doc_id"), col("b.doc_id"), round(jac(col("a.bg"), col("b.bg")),6).as("j"))
      .count())
    spark.stop()
  }
}
