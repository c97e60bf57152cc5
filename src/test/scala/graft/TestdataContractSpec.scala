package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Contract between the engine and the driver-owned lake under
  * /root/testdata. The r5 gate broke because the driver regenerated
  * events.parquet with a new physical timestamp encoding (NANOS →
  * MICROS/NTZ) and the loader assumed the old one: 26 queries erred and
  * three streaming queries were silently 1000× wrong. These specs open
  * the REAL files and assert the loader handles what is actually there —
  * a future layout change fails locally, loudly, before any gate.
  *
  * Runs against every SF present on this machine so a partial
  * regeneration (one SF re-written, others stale) is also caught.
  */
class TestdataContractSpec extends SparkSpec {

  private val sfDirs: Seq[String] = {
    val root = java.nio.file.Paths.get("/root/testdata")
    if (!java.nio.file.Files.isDirectory(root)) Seq(sf)
    else {
      val it = java.nio.file.Files.list(root).iterator()
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val p = it.next()
        if (java.nio.file.Files.isRegularFile(p.resolve("events.parquet")))
          b += p.toString
      }
      val out = b.result().sorted
      if (out.isEmpty) Seq(sf) else out
    }
  }

  test("events.ts: loader accepts the physical type actually on disk, at every SF") {
    sfDirs.foreach { dir =>
      val raw = Tables.eventsRawSchema(spark, dir)("ts").dataType
      // the encodings normalizeEventsTs knows; anything else must have
      // made THIS assertion fail before a driver gate could
      assert(Set[DataType](LongType, TimestampNTZType, TimestampType).contains(raw),
        s"$dir/events.parquet ts arrived as $raw — extend Tables.normalizeEventsTs")
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType,
        s"$dir: normalized ts must be TimestampType, got ${ev.schema("ts").dataType}")
    }
  }

  test("events.ts: normalized instants land in the fixture's real range (no unit collapse)") {
    // A mis-scaled read (micros as nanos, or nanos as micros) moves
    // timestamps ~1000× — out of any plausible year. The fixture is
    // generated around 2024; accept a generous but unit-tight window.
    sfDirs.foreach { dir =>
      val r = Tables.events(spark, dir)
        .agg(year(min(col("ts"))).as("y0"), year(max(col("ts"))).as("y1"))
        .collect()(0)
      val (y0, y1) = (r.getInt(0), r.getInt(1))
      assert(y0 >= 2000 && y1 <= 2100,
        s"$dir: event years [$y0,$y1] outside [2000,2100] — timestamp unit mismatch?")
    }
  }

  test("all driver tables load with their expected logical columns") {
    val expected = Map(
      "events"     -> Set("event_id", "ts", "user_id", "event_type", "value", "props"),
      "documents"  -> Set("doc_id", "text"),
      "embeddings" -> Set("vec_id", "embedding", "label"),
      "lineitem"   -> Set("l_orderkey", "l_quantity", "l_shipdate"),
      "orders"     -> Set("o_orderkey", "o_custkey", "o_orderdate"),
      "customer"   -> Set("c_custkey", "c_nationkey"),
      "supplier"   -> Set("s_suppkey", "s_nationkey"),
      "part"       -> Set("p_partkey"),
      "nation"     -> Set("n_nationkey", "n_regionkey"),
      "region"     -> Set("r_regionkey"))
    expected.foreach { case (name, cols) =>
      val have = Tables.table(spark, sf, name).columns.toSet
      val missing = cols -- have
      assert(missing.isEmpty, s"$name missing expected columns $missing (has $have)")
    }
  }
}
