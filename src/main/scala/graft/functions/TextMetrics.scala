package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Canonical column formulas shared by operators, oracle builders and
  * the public facade. Each exists in exactly ONE place because the
  * engine's determinism contracts (run-to-run sample stability, oracle
  * equivalence, curation selection) depend on every call site computing
  * byte-identical expressions.
  */
object TextMetrics {

  /** Deterministic per-row basis points in [0, 10000): first 8 hex chars
    * of md5(id) mod 10⁴. The sampling primitive — a pure function of the
    * row, so selection is layout-/retry-/run-invariant (unlike
    * `df.sample()`'s partition-dependent RNG). Identical arithmetic is
    * expressible in DuckDB: `(('0x' || substr(md5(id::VARCHAR),1,8))::BIGINT % 10000)`. */
  def hashBps(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("bigint") % 10000

  /** Composite document quality in [0,1]: 0.4·distinct-token ratio +
    * 0.3·length saturation (50 tokens) + 0.3·(1 − stopword ratio),
    * over whitespace tokens. */
  def quality(toks: Column): Column = {
    val nTokens = size(toks).cast("double")
    (size(array_distinct(toks)).cast("double") / nTokens) * 0.4 +
      least(nTokens / 50.0, lit(1.0)) * 0.3 +
      (lit(1.0) - size(filter(toks, t => t.isin("the", "a"))).cast("double") / nTokens) * 0.3
  }
}
