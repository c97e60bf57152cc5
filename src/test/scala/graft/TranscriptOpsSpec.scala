package graft

import graft.operators.TranscriptOps

/** Golden-output tests hand-traced from the reference loop
  * (`/root/reference/src/transcription.py:199-224,277-299`). */
class TranscriptOpsSpec extends SparkSpec {

  test("w1 islands merge consecutive same-speaker runs with reference end semantics") {
    val rows = TranscriptOps.queries("w1_islands")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.toSeq == Seq(
      (1, "SPEAKER_00", 0.0, 5.9),   // end = start of next island, not 5.9's own end
      (1, "SPEAKER_01", 5.9, 10.0),
      (1, "SPEAKER_00", 10.0, 12.0), // final island: its own last end
      (2, "SPEAKER_00", 0.0, 1.0),
      (2, "SPEAKER_01", 1.0, 2.0)))
  }

  test("j1 alignment reproduces the consume-prefix cursor, incl. early break") {
    val rows = TranscriptOps.queries("j1_asof_alignment")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(2), r.getString(3),
                 r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.toSeq == Seq(
      (1, "SPEAKER_00", "hello there how are you", 0.0, 6.1, 0.965),
      (1, "SPEAKER_01", "fine thanks", 6.1, 9.0, 0.9),
      (1, "SPEAKER_00", "and you", 9.0, 11.5, 1.0), // null conf → 1.0
      // file 2: island 2 emits nothing (chunks exhausted → break)
      (2, "SPEAKER_00", "solo", 0.0, 2.0, 0.8)))
  }

  test("k2 renders [%.2f-%.2f] SPEAKER: text lines") {
    val lines = TranscriptOps.queries("k2_dialogue_render")(spark, sf).collect()
      .map(_.getString(2))
    assert(lines.head == "[0.00-6.10] SPEAKER_00: hello there how are you")
  }

  test("v6 fallback synthesizes SPEAKER_00 span for segmentless file") {
    val rows = TranscriptOps.queries("v6_diarize_fallback")(spark, sf).collect()
      .filter(_.getInt(0) == 3)
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(1) == "SPEAKER_00" && r.getDouble(2) == 0.0 && r.getDouble(3) == 16.0)
  }
}
