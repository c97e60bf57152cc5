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
    import graft.functions.SortedIntersectCount.sortedIntersectCount
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), (col("n_chars")/128).cast("long").as("band"),
              graft.functions.TextSignatures.wordBigrams(col("text")).as("bg"))
      .repartition(col("doc_id"))
    time("warmup shingle")(sh.count())
    val joined = sh.as("a").join(sh.as("b"),
      col("a.lang")===col("b.lang") && col("a.band")===col("b.band") &&
      col("a.doc_id")<col("b.doc_id"))
    time("pair count only")(joined.count())
    val inter = sortedIntersectCount(col("a.bg"), col("b.bg"))
    val j = inter.cast("double")/(size(col("a.bg"))+size(col("b.bg"))-inter)
    time("current (filter+round)")(
      joined.select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"), round(j,6).as("jaccard"))
        .filter(col("jaccard") >= 0.5).count())
    time("barrier (project j, repartition, filter)")(
      joined.select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"), j.as("j"))
        .repartition(32)
        .filter(col("j") >= 0.5).select(col("a_id"), col("b_id"), round(col("j"),6).as("jaccard")).count())
    spark.stop()
  }
}
