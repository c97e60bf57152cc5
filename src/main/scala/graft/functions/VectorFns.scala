package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT|DOUBLE>` columns, expressed entirely with
  * Catalyst higher-order functions so the whole expression stays inside
  * whole-stage codegen — no UDF/serialization boundary in the hot path.
  *
  * Mirrors the reference's numpy/faiss vector ops: L2 normalization
  * (`/root/reference/src/embedding_engine.py:20`, `transcription.py:186-187`)
  * and the inner-product scoring implied by `IndexFlatIP`
  * (`embedding_engine.py:24-30`). Evaluation is a sequential left-to-right
  * fold in double precision — bit-identical to DuckDB's `list_dot_product`
  * over `DOUBLE[]`, which keeps the oracle hash-comparable.
  */
object VectorFns {

  /** Cast an ARRAY<FLOAT> column to ARRAY<DOUBLE> for stable math. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product — native codegen expression (see [[DotProductD]]);
    * same sequential fold as the HOF form below, ~10-20× faster. */
  def dot(a: Column, b: Column): Column = DotProductD.dot(a, b)

  /** Reference HOF formulation of dot (kept for equivalence tests). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm. */
  def normSq(v: Column): Column = DotProductD.dot(v, v)

  /** L2 norm. */
  def l2Norm(v: Column): Column = sqrt(normSq(v))

  /** L2-normalize given a precomputed norm column (avoids recomputing the
    * fold once per element, which a naive `transform(v, _ / l2Norm(v))`
    * would do). */
  def l2NormalizeBy(v: Column, norm: Column): Column =
    transform(v, x => x / norm)

  /** Cosine similarity for arbitrary (not necessarily unit) vectors. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))
}
