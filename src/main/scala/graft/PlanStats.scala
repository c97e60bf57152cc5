package graft
import org.apache.spark.sql.DataFrame

/** Structural plan-count fingerprint shared by PlanLedger (per-query
  * rows) and Graft.memoizedExchange (pre-checkpoint `memo:<label>`
  * rows — r10 verdict #1: a localCheckpoint replaces the upstream scan
  * with `Scan ExistingRDD`, so the shared exchanges' own pushdown/
  * pruning health must be fingerprinted at build time to stay
  * diffable). Counting explainString lines is deliberately
  * crude-but-stable: every count is only ever compared against ITSELF
  * across rounds. */
object PlanStats {
  private def count(p: String, needle: String): Int =
    p.split('\n').count(_.contains(needle))

  def countsJson(df: DataFrame, extra: Seq[(String, String)] = Nil): String = {
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    val counts = Seq(
      "exchanges" -> count(p, "Exchange hashpartitioning"),
      "range_exchanges" -> count(p, "Exchange rangepartitioning"),
      "single_partition" -> count(p, "Exchange SinglePartition"),
      "broadcasts" -> count(p, "BroadcastExchange"),
      "sorts" -> count(p, "+- Sort "),
      "bnl_joins" -> count(p, "BroadcastNestedLoopJoin"),
      "cartesian" -> count(p, "CartesianProduct"),
      "scans" -> count(p, "Scan parquet"),
      // any file-format scan (json/text/binaryFile fixtures included)
      // — so fixture-reading queries don't read as scanless
      "file_scans" -> count(p, "FileScan "),
      // non-file leaves, so NO query reads as scanless-and-markerless:
      // rdd_scans = localCheckpointed inputs (inline checkpoints of
      // trained artifacts / shardByBytes offsets; the memoized shared
      // exchanges additionally carry via_memo + a memo:<label> row),
      // local_scans = driver-local relations (drained streaming memory
      // sinks, FIXTURES.md fixture tables, observe() metric rows)
      "rdd_scans" -> count(p, "Scan ExistingRDD"),
      "local_scans" -> count(p, "LocalTableScan"),
      // pushdown health: scans with a non-empty pushed-filter list,
      // and scans reading ≤4 columns (a proxy for pruning — stable
      // for a fixed query, which is all a diff needs)
      "pushed_scans" -> p.split('\n')
        .count(l => l.contains("PushedFilters: [") &&
                    !l.contains("PushedFilters: []")),
      "narrow_scans" -> p.split('\n').count { l =>
        val i = l.indexOf("ReadSchema: struct<")
        // count commas inside the struct<...> only — the FileScan
        // line carries DataFilters/Location/etc before it
        i >= 0 && {
          val s = l.substring(i + "ReadSchema: struct<".length)
          s.take(math.max(s.indexOf('>'), 0)).count(_ == ',') <= 3
        }
      })
    (counts.map { case (k, v) => s""""$k":$v""" } ++
      extra.map { case (k, v) => s""""$k":$v""" })
      .mkString("{", ",", "}")
  }
}
