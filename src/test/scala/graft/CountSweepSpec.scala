package graft

/** The bench's exact execution shape — `df.count()` — over EVERY
  * registered query. Under `count()` Catalyst prunes all unreferenced
  * aggregate inputs, a shape neither specs (`collect()`, all columns)
  * nor Verify (parquet write, all columns) ever exercised: r4's
  * `s_json_corrupt_quarantine` shipped oracle-green and then failed
  * ONLY under the bench when its scan's referenced set collapsed to
  * `_corrupt_record` alone (VERDICT r4 #1/#2). This sweep makes that
  * class of failure a local test failure instead of a driver-round
  * discovery. */
class CountSweepSpec extends SparkSpec {

  test("every registered query survives count()-pruned execution") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf).count(); None }
        catch {
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getName}: " +
              Option(e.getMessage).getOrElse("").linesIterator.take(3).mkString(" | "))
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries fail under count():\n${failures.mkString("\n")}")
  }
}
