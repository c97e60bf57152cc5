package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * The reference stages data through the filesystem between every pipeline
  * step (`/root/reference/src/main.py:136`, `transcription.py:349-359`,
  * `embedding_engine.py:76-84`); here every stage is a lazy DataFrame over
  * columnar parquet so Catalyst can prune columns and push predicates into
  * the scan — at 100 TB the scan is the dominant cost and pushdown is the
  * difference between reading a column chunk and reading the lake.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def documents(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "documents")

  /** documents, round-robin spread across all cores BEFORE expensive
    * per-document compute (signatures, shingling, hashing).
    *
    * Why: at 100 TB the scan has thousands of splits and per-doc CPU work
    * parallelizes for free; locally the whole table is one small parquet
    * file = ONE split, so any signature computed before the first
    * exchange runs single-threaded (measured: the entire MinHash cost of
    * dedup_minhash_lsh serialized on one core). The round-robin exchange
    * moves only raw (doc_id, text) rows — a few hundred bytes each —
    * and buys full-width parallelism for everything downstream. */
  def documentsSpread(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir).repartition(spreadWidth(spark))

  /** Width for explicit local re-layouts: enough tasks to parallelize
    * CPU-bound per-doc compute, few enough that each task amortizes its
    * ~2-5 ms scheduling cost on a KB-sized corpus partition. Tracking
    * defaultParallelism 1:1 overshards at local[32] (measured: the
    * 74-query bench pays ~15% wall purely in extra task dispatch);
    * at real data volumes the scan's own splits set the width instead. */
  private[graft] def spreadWidth(spark: SparkSession): Int =
    math.max(4, math.min(spark.sparkContext.defaultParallelism, 8))
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** events.ts is parquet TIMESTAMP(NANOS), which vanilla Spark rejects
    * ([PARQUET_TYPE_ILLEGAL]). Read nanos as raw longs and truncate to
    * microseconds — exactly what DuckDB does natively, so the oracle sees
    * identical instants. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, sfDir, "events")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "region")
}
