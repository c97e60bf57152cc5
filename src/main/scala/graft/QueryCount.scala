package graft
/** Dev aid: print the registered query / oracle counts and any key
  * present in one map but not the other (artifact-consistency check
  * for SURVEY §8 / README / bench counts). */
object QueryCount {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size}")
    (q -- o).toSeq.sorted.foreach(k => println(s"no-oracle: $k"))
    (o -- q).toSeq.sorted.foreach(k => println(s"orphan-oracle: $k"))
  }
}
