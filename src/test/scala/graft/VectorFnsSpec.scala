package graft

import graft.functions.VectorFns._
import org.apache.spark.sql.functions._

class VectorFnsSpec extends SparkSpec {

  test("native codegen dot is bit-identical to the HOF fold on real embeddings") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .limit(50)
    val both = e.as("a").crossJoin(e.as("b"))
      .select(dot(col("a.v"), col("b.v")).as("native"),
              dotHof(col("a.v"), col("b.v")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("dot/norm properties on seeded random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vecs = Seq.fill(50)((
      List.fill(16)(rnd.nextDouble() * 20 - 10),
      List.fill(16)(rnd.nextDouble() * 20 - 10)))
    val rows = vecs.toDF("a", "b").select(
      dot($"a", $"b").as("ab"), dot($"b", $"a").as("ba"),
      normSq($"a").as("aa")).collect()
    rows.foreach { row =>
      // exact symmetry: per-term products commute, fold order unchanged
      assert(row.getDouble(0) == row.getDouble(1))
      assert(row.getDouble(2) >= 0.0)
    }
  }

  test("l2NormalizeBy yields unit vectors") {
    val e = Tables.embeddings(spark, sf)
      .select(asDouble(col("embedding")).as("v")).limit(20)
      .withColumn("norm", l2Norm(col("v")))
      .withColumn("renorm", l2Norm(l2NormalizeBy(col("v"), col("norm"))))
    e.collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-6)  // float32-normalized input
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-12) // re-normalized in double
    }
  }
}
