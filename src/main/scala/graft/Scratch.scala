package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf attribution harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"${(System.nanoTime()-t0)/1e9}%8.2f  $name ($n rows)")
    }
    val docs = Tables.documents(spark, dir)
    time("warmup")(docs.count())
    val toks = split(col("text"), " ")
    val bg = array_sort(array_distinct(transform(sequence(lit(1), size(toks)-1),
      i => concat(element_at(toks, i), lit(" "), element_at(toks, i+1)))))
    val sh = docs.select(col("doc_id"), bg.as("bg")).repartition(col("doc_id"))
    time("shingle+mat")(sh.count())
    val hashed = sh.select(col("doc_id"), explode(col("bg")).as("shingle"))
    time("explode")(hashed.count())
    time("explode+1md5")(hashed.select(md5(concat(lit("0:"), col("shingle"))).as("h")).filter(col("h") =!= "").count())
    val minCols = (0 until 12).map(k => min(md5(concat(lit(s"$k:"), col("shingle")))).as(s"h$k"))
    val mh = hashed.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
    time("12 minhash aggs")(mh.count())
    val bands = mh.select(col("doc_id"), explode(array((0 until 6).map(k =>
      concat(lit(s"$k:"), col(s"h${2*k}"), col(s"h${2*k+1}"))): _*)).as("band"))
    val cand = bands.as("a").join(bands.as("b"),
      col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id")).distinct()
    time("band join candidates")(cand.count())
    time("full minhash query")(operators.DedupOps.queries("dedup_minhash_lsh")(spark, dir).count())
    time("full jaccard query")(operators.DedupOps.queries("dedup_ngram_jaccard")(spark, dir).count())
    time("full simhash query")(operators.DedupOps.queries("dedup_simhash")(spark, dir).count())
    time("full langid query")(operators.TextAnalysisOps.queries("ta_langid")(spark, dir).count())
    spark.stop()
  }
}
