package graft

import graft.operators.TranscriptOps

/** Fidelity fuzzing for W1 islands + J1 alignment: random inputs are run
  * through BOTH the Spark window-algebra plans and a direct Scala
  * transliteration of the reference's imperative loops
  * (`/root/reference/src/transcription.py:199-224` and `:277-299`).
  * The two must agree exactly — including the quirks (island end = next
  * island's start; per-segment argmin over the REMAINING chunks; break
  * when chunks exhaust; trailing chunks dropped).
  */
class AlignmentFuzzSpec extends SparkSpec {

  case class Seg(start: Double, end: Double, speaker: String)
  case class Chunk(text: String, tStart: Double, tEnd: Double, conf: Option[Double])
  case class Utt(speaker: String, text: String, tStart: Double, tEnd: Double, conf: Double)

  /** transcription.py:277-299, line by line. */
  private def refIslands(segs: List[Seg]): List[Seg] = {
    if (segs.isEmpty) return Nil
    var prev = segs.head
    var cur = segs.head
    val out = scala.collection.mutable.ListBuffer[Seg]()
    for (i <- 1 until segs.length) {
      cur = segs(i)
      if (cur.speaker != prev.speaker) {
        out += Seg(prev.start, cur.start, prev.speaker)
        prev = segs(i)
      }
    }
    out += Seg(prev.start, cur.end, prev.speaker)
    out.toList
  }

  /** transcription.py:199-224, line by line (on islands). */
  private def refAlign(islands: List[Seg], chunks0: List[Chunk]): List[Utt] = {
    var transcript = chunks0.filter(_.tEnd != null).filter(c => !c.tEnd.isNaN)
    val out = scala.collection.mutable.ListBuffer[Utt]()
    var ends = transcript.map(_.tEnd)
    for (seg <- islands if ends.nonEmpty) {
      val diffs = ends.map(e => math.abs(e - seg.end))
      val upto = diffs.zipWithIndex.minBy { case (d, i) => (d, i) }._2
      val taken = transcript.take(upto + 1)
      out += Utt(seg.speaker,
        taken.map(_.text.trim).mkString(" "),
        transcript.head.tStart, transcript(upto).tEnd,
        taken.map(_.conf.getOrElse(1.0)).sum / taken.length)
      transcript = transcript.drop(upto + 1)
      ends = ends.drop(upto + 1)
    }
    out.toList
  }

  private def genCase(rnd: scala.util.Random): (List[Seg], List[Chunk]) = {
    val nSegs = 1 + rnd.nextInt(6)
    val nChunks = 1 + rnd.nextInt(8)
    var t = 0.0
    val segs = (0 until nSegs).map { _ =>
      val s = t; t += 0.5 + rnd.nextInt(40) / 10.0
      Seg(s, t, s"SPEAKER_0${rnd.nextInt(3)}")
    }.toList
    var ct = 0.0
    val chunks = (0 until nChunks).map { i =>
      val s = ct; ct += 0.5 + rnd.nextInt(30) / 10.0
      Chunk(s"tok$i", s, ct,
        if (rnd.nextInt(5) == 0) None else Some(math.floor(rnd.nextDouble() * 100) / 100))
    }.toList
    (segs, chunks)
  }

  test("50 random cases: Spark island+alignment algebra == reference loop") {
    import spark.implicits._
    val rnd = new scala.util.Random(2026)
    for (caseIdx <- 0 until 50) {
      val (segs, chunks) = genCase(rnd)
      val segDf = segs.zipWithIndex
        .map { case (g, i) => (1, i, g.start, g.end, g.speaker) }
        .toDF("file_id", "seg_idx", "spk_start", "spk_end", "speaker")
      val chunkDf = chunks.zipWithIndex
        .map { case (c, i) => (1, i, c.text, c.tStart, Some(c.tEnd), c.conf) }
        .toDF("file_id", "chunk_idx", "text", "t_start", "t_end", "confidence")

      val gotIslands = TranscriptOps.islands(segDf)
        .orderBy($"island").collect()
        .map(r => Seg(r.getDouble(3), r.getDouble(4), r.getString(2))).toList
      val expIslands = refIslands(segs)
      assert(gotIslands == expIslands, s"islands case $caseIdx: segs=$segs")

      val got = TranscriptOps.align(segDf, chunkDf)
        .orderBy($"utt_idx").collect()
        .map(r => Utt(r.getString(2), r.getString(3), r.getDouble(4),
                      r.getDouble(5), r.getDouble(6))).toList
      // same rounding as the Spark query's round(conf, 6) (HALF_UP)
      val exp = refAlign(expIslands, chunks).map(u => u.copy(conf =
        BigDecimal(u.conf).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      assert(got == exp, s"align case $caseIdx: segs=$segs chunks=$chunks")
    }
  }
}
