package graft

import graft.apps.RagPipeline

/** End-to-end app run on sf0.001 + exactly-once rerun semantics. */
class RagPipelineSpec extends SparkSpec {

  test("pipeline stages all artifacts; rerun ingests nothing new") {
    val out = "target/test_rag_pipeline"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)

    RagPipeline.run(spark, sf, out)
    val dialogues1 = spark.read.parquet(s"$out/dialogues").count()
    val index1 = spark.read.parquet(s"$out/index").count()
    val retr = spark.read.parquet(s"$out/retrieval_demo")
    assert(dialogues1 > 0 && index1 > 0)
    // every query returns ranks 1..3 (qid is the composite chunk key)
    val byQ = retr.collect().groupBy(_.getStruct(0))
    assert(byQ.nonEmpty)
    byQ.values.foreach(rows =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3)))
    // index and metadata agree key-for-key (the collision-free contract:
    // every vector joins exactly one chunk text)
    val meta = spark.read.parquet(s"$out/index_meta")
    assert(meta.count() == index1)
    assert(spark.read.parquet(s"$out/index")
      .join(meta, "chunk_key").count() == index1)
    // index rows carry unit vectors
    val norms = spark.read.parquet(s"$out/index")
      .select(graft.functions.VectorFns.l2Norm(
        org.apache.spark.sql.functions.col("vec")).as("n"))
      .collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-9))

    // rerun: state gate admits nothing; dialogues unchanged (exactly-once
    // append), index rebuilt to the same size (idempotent overwrite)
    RagPipeline.run(spark, sf, out)
    assert(spark.read.parquet(s"$out/dialogues").count() == dialogues1)
    assert(spark.read.parquet(s"$out/index").count() == index1)
  }
}
