package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Graft.mergeAsof vs a driver-side brute-force reference over
  * randomized key/timestamp layouts — all three directions, with and
  * without tolerance, including keys with no right rows, left-only
  * keys, exact-timestamp matches, and duplicate right timestamps
  * (tie resolved by tieCol). The reference is the pandas merge_asof
  * contract evaluated literally per left row. */
class MergeAsofSpec extends SparkSpec {

  private case class R(key: Long, ts: Long, tie: Long, v: Double)

  private def refMatch(l: R, rights: Seq[R], direction: String,
      tolUs: Long): Option[R] = {
    val sameKey = rights.filter(_.key == l.key)
    val pick = direction match {
      case "backward" => sameKey.filter(_.ts <= l.ts)
        .sortBy(r => (r.ts, r.tie)).lastOption
      case "forward" => sameKey.filter(_.ts >= l.ts)
        .sortBy(r => (r.ts, r.tie)).headOption
      case "nearest" =>
        val b = sameKey.filter(_.ts <= l.ts).sortBy(r => (r.ts, r.tie)).lastOption
        val f = sameKey.filter(_.ts >= l.ts).sortBy(r => (r.ts, r.tie)).headOption
        (b, f) match {
          case (Some(x), Some(y)) =>
            if (l.ts - x.ts <= y.ts - l.ts) Some(x) else Some(y)
          case (x, y) => x.orElse(y)
        }
    }
    pick.filter(r => math.abs(r.ts - l.ts) <= tolUs)
  }

  test("mergeAsof matches the brute-force reference on 40 random layouts × 3 directions") {
    import spark.implicits._
    val rnd = new Random(8181)
    for (trial <- 1 to 40) {
      val nKeys = 1 + rnd.nextInt(5)
      val lefts = (1 to 30).map { i =>
        R(rnd.nextInt(nKeys).toLong, rnd.nextInt(40).toLong * 1000000L, i.toLong, 0.0)
      }
      val rights = (1 to 20).map { i =>
        R(rnd.nextInt(nKeys + 1).toLong, rnd.nextInt(40).toLong * 1000000L,
          (100 + i).toLong, rnd.nextInt(1000) / 100.0)
      }
      val lDf = lefts.map(r => (r.key, r.ts, r.tie)).toDF("key", "ts", "tie")
      val rDf = rights.map(r => (r.key, r.ts, r.tie, r.v)).toDF("key", "ts", "tie", "v")
      val direction = Seq("backward", "forward", "nearest")(trial % 3)
      val tol = if (trial % 2 == 0) 10000000L else Long.MaxValue
      val got = graft.api.Graft.mergeAsof(lDf, rDf, "key", "ts", "tie",
          Seq("v"), direction, tol)
        .select($"tie", $"asof_matched", $"asof_gap_us", $"asof_v")
        .collect().map(r => r.getLong(0) ->
          (r.getBoolean(1),
           if (r.isNullAt(2)) None else Some(r.getLong(2)),
           if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      assert(got.size == lefts.size, s"trial $trial: dropped left rows")
      lefts.foreach { l =>
        val exp = refMatch(l, rights, direction, tol)
        val (m, gap, v) = got(l.tie)
        assert(m == exp.isDefined,
          s"trial $trial $direction tol=$tol left=${l}: matched $m vs ${exp.isDefined}")
        exp.foreach { r =>
          assert(gap.contains(r.ts - l.ts), s"trial $trial $direction: gap $gap vs ${r.ts - l.ts}")
          assert(v.contains(r.v), s"trial $trial $direction: value $v vs ${r.v}")
        }
      }
    }
  }

  test("mergeAsof carries the LAST right row on duplicate backward timestamps (tie by tieCol)") {
    import spark.implicits._
    val l = Seq((1L, 100L, 1L)).toDF("key", "ts", "tie")
    val r = Seq((1L, 50L, 10L, 1.0), (1L, 50L, 11L, 2.0)).toDF("key", "ts", "tie", "v")
    val out = graft.api.Graft.mergeAsof(l, r, "key", "ts", "tie", Seq("v"), "backward")
      .select($"asof_v").collect()
    assert(out.head.getDouble(0) == 2.0, "backward must carry the latest-by-tie duplicate")
  }

  test("mergeAsof admits exact-timestamp matches in every direction") {
    import spark.implicits._
    val l = Seq((1L, 100L, 1L)).toDF("key", "ts", "tie")
    val r = Seq((1L, 100L, 10L, 7.0)).toDF("key", "ts", "tie", "v")
    Seq("backward", "forward", "nearest").foreach { d =>
      val out = graft.api.Graft.mergeAsof(l, r, "key", "ts", "tie", Seq("v"), d)
        .select($"asof_matched", $"asof_gap_us", $"asof_v").collect().head
      assert(out.getBoolean(0) && out.getLong(1) == 0L && out.getDouble(2) == 7.0,
        s"direction $d must match at gap 0")
    }
  }
}
