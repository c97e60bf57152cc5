package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Property tests for the round-9 native expressions: each is checked
  * against an independent straight-Scala reference over seeded random
  * inputs, including the length/boundary edges the corpus never hits.
  */
class NativeExprPropertySpec extends SparkSpec {

  private def md5Bytes(s: String): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  test("CdcBoundaries ≡ reference scan on random strings incl. edges") {
    import spark.implicits._
    val rnd = new Random(42)
    val alphabet = "abcdefgh xyz"
    // lengths straddle the w=8 gram boundary: 0..7 (empty result), 8, 9,
    // and longer texts where boundaries actually fire
    // non-BMP inputs (emoji = 2 UTF-16 code units, 1 codepoint) pin the
    // codepoint indexing contract: positions must agree with Spark
    // length()/substring and DuckDB substr/length, both codepoint-based
    val astral = "😀" // U+1F600
    val texts = (0 to 7).map(n => "a" * n) ++
      Seq("exactly8", "ninechars",
          astral * 8, s"abc${astral}defgh${astral}xyz pad pad pad") ++
      (1 to 40).map(_ => (1 to (20 + rnd.nextInt(300)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString) ++
      (1 to 10).map(_ => (1 to (20 + rnd.nextInt(100)))
        .map(_ => if (rnd.nextInt(5) == 0) astral
                  else alphabet(rnd.nextInt(alphabet.length)).toString).mkString)
    def reference(t: String): Seq[Long] = {
      val cps = t.codePoints().toArray
      (8 to cps.length).filter { i =>
        (md5Bytes(new String(cps, i - 8, 8))(0) & 0x0f) == 0
      }.map(_.toLong)
    }
    val got = texts.toDF("text")
      .select(col("text"),
        graft.functions.TextSignatures.cdcBoundaries(col("text")).as("b"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    texts.foreach { t =>
      assert(got(t) == reference(t), s"mismatch for '${t.take(30)}…'")
    }
  }

  test("RingSuccessor ≡ naive wrap-around min scan on random rings") {
    import spark.implicits._
    val rnd = new Random(7)
    val ring = (0 until 144).map(_ =>
      (rnd.nextLong().abs % 281474976710656L, rnd.nextInt(9).toLong))
    val sorted = ring.sortBy(identity)
    def reference(h: Long): Long = {
      val succ = sorted.filter(_._1 >= h)
      (if (succ.nonEmpty) succ.minBy(identity) else sorted.min)._2
    }
    // probe hashes: random plus exact ring positions (tie edge) plus the
    // extremes (global wrap)
    val probes = (1 to 200).map(_ => rnd.nextLong().abs % 281474976710656L) ++
      ring.take(10).map(_._1) ++ Seq(0L, 281474976710655L)
    val got = probes.toDF("h")
      .select(col("h"),
        graft.functions.TextSignatures.ringSuccessor(col("h"), ring).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    probes.foreach { h =>
      assert(got(h) == reference(h), s"mismatch at h=$h")
    }
  }

  test("bhStepUp ≡ brute-force BH over random p-vectors") {
    import spark.implicits._
    val rnd = new Random(11)
    (1 to 20).foreach { trial =>
      val m = 1 + rnd.nextInt(30)
      val ps = (0 until m).map(i => (s"k$i", rnd.nextInt(1000001).toLong))
      val alphaE6 = Seq(50000L, 100000L, 250000L)(trial % 3)
      // reference: sort ascending, k = max{i : p_(i)·m ≤ i·α}, reject i ≤ k
      val sortedP = ps.sortBy { case (k, p) => (p, k) }
      val kMax = (1 to m).filter(i => sortedP(i - 1)._2 * m <= i * alphaE6)
        .lastOption.getOrElse(0)
      val expected = sortedP.zipWithIndex
        .map { case ((key, _), i) => key -> (if (i < kMax) 1L else 0L) }.toMap
      val got = api.Graft.bhStepUp(ps.toDF("key", "p_e6"), "key", "p_e6", alphaE6)
        .collect().map(r => r.getAs[String]("key") -> r.getAs[Long]("rejected"))
        .toMap
      assert(got == expected, s"trial $trial (m=$m, α=$alphaE6)")
    }
  }
}
