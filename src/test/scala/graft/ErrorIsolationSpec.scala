package graft

import org.apache.spark.sql.functions._

/** T4 error-isolation semantics (SURVEY.md §2.10, FIXTURES.md §7):
  * malformed records become nulls/status columns, never job failures —
  * the engine-level form of the reference's per-file try/except
  * (`main.py:75-95`, `transcription.py:314-332`). */
class ErrorIsolationSpec extends SparkSpec {

  test("malformed JSON props yield null, not failure (C14 edge cases)") {
    import spark.implicits._
    val props = Seq(
      (1L, """{"k": 87}"""), (2L, """{"k": 0}"""),
      (3L, """{"other": 1}"""), (4L, """not json {{{"""), (5L, null)
    ).toDF("id", "props")
    val parsed = props
      .withColumn("k", get_json_object($"props", "$.k").cast("int"))
      .withColumn("ok", $"k".isNotNull)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
    assert(parsed == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false, 5L -> false))
  }

  test("per-row failure becomes a status column in one pass (A4 counters)") {
    import spark.implicits._
    val rows = Seq((1L, "3.5"), (2L, "oops"), (3L, "7")).toDF("id", "raw")
      .withColumn("value", expr("try_cast(raw as double)"))
      .agg(count(when($"value".isNotNull, 1)).as("processed"),
           count(when($"value".isNull, 1)).as("failed"))
      .collect().head
    assert(rows.getLong(0) == 2 && rows.getLong(1) == 1)
  }

  test("argmin tie-break is deterministic: lowest index wins (np.argmin contract)") {
    import spark.implicits._
    // two chunks equidistant from the segment end — transcription.py:205
    // np.argmin returns the FIRST minimal index
    val chunks = Seq(
      (1, 0, "a", 0.0, Some(4.0), Some(1.0)),
      (1, 1, "b", 4.0, Some(6.0), Some(1.0)))
      .toDF("file_id", "chunk_idx", "text", "t_start", "t_end", "confidence")
    val segs = Seq((1, 0, 0.0, 5.0, "S0"), (1, 1, 5.0, 9.0, "S1"))
      .toDF("file_id", "seg_idx", "spk_start", "spk_end", "speaker")
    val got = graft.operators.TranscriptOps.align(segs, chunks)
      .orderBy($"utt_idx").collect().map(_.getString(3))
    // seg0 end=5.0 is equidistant (1.0) from ends 4.0 and 6.0 → chunk 0
    assert(got.head == "a")
  }
}
