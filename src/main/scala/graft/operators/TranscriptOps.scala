package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Transcript analytics (SURVEY.md §2.3 J1, §2.5 W1/W3, §2.4 A5/A7,
  * §2.1 K2, §2.9 V6) — the reference's diarization/alignment semantics
  * re-expressed as declarative plans over (file_id, …)-keyed tables.
  *
  * Reference behavior reproduced exactly:
  *  - W1 islands (`transcription.py:277-299`): consecutive same-speaker
  *    segments merge; a merged island's end is the START of the next
  *    island's first segment, except the final island which ends at the
  *    last raw segment's end.
  *  - J1 alignment (`transcription.py:199-224`): a stateful cursor —
  *    for each island, argmin of |chunk.t_end − island.end| over the
  *    REMAINING chunks; that prefix is consumed. With chunk ends sorted,
  *    remaining-argmin = max(global argmin g_i, prev cutoff + 1), so the
  *    cursor unrolls into c_i = i + running_max(g_j − j) — a pure window
  *    expression, no recursion, no driver loop. Segments arriving after
  *    chunks are exhausted emit nothing (`:223-224`), trailing chunks
  *    are dropped, null-t_end chunks are filtered (`:200`), null
  *    confidence defaults to 1.0 (`:217`).
  *  - V6 fallback (`transcription.py:266-275,303-312`): a file with no
  *    diarization segments yields a single SPEAKER_00 span
  *    [0, n_samples/16000].
  *
  * Scale design: every window here is partitioned by file_id. One audio
  * file's transcript is tiny (minutes of speech ⇒ hundreds of chunks);
  * the parallelism axis at 100 TB is *millions of files*, and this plan
  * shuffles each file's chunks/segments to one task exactly once —
  * embarrassingly parallel across files, no global ordering anywhere.
  * The fixtures below are inline VALUES (the driver testdata has no
  * transcript table); the same operators run unchanged on real data.
  */
object TranscriptOps {

  // ---- fixtures (FIXTURES.md §2-§3, plus a second file covering the
  // more-islands-than-chunks early-break edge) ----------------------

  private val chunkRows: Seq[(Int, Int, String, Double, Option[Double], Option[Double])] = Seq(
    (1, 0, "hello there", 0.0, Some(3.2), Some(0.98)),
    (1, 1, "how are you", 3.2, Some(6.1), Some(0.95)),
    (1, 2, "fine thanks", 6.1, Some(9.0), Some(0.90)),
    (1, 3, "and you", 9.0, Some(11.5), None),
    (1, 4, "great", 11.5, None, Some(0.99)),
    (2, 0, "solo", 0.0, Some(2.0), Some(0.8)))

  private val segRows: Seq[(Int, Int, Double, Double, String)] = Seq(
    (1, 0, 0.0, 2.0, "SPEAKER_00"),
    (1, 1, 2.0, 5.9, "SPEAKER_00"),
    (1, 2, 5.9, 9.1, "SPEAKER_01"),
    (1, 3, 9.1, 10.0, "SPEAKER_01"),
    (1, 4, 10.0, 12.0, "SPEAKER_00"),
    (2, 0, 0.0, 1.0, "SPEAKER_00"),
    (2, 1, 1.0, 2.0, "SPEAKER_01"))

  private val fileRows: Seq[(Int, Long)] =
    Seq((1, 192000L), (2, 32000L), (3, 256000L))

  def chunksDf(s: SparkSession): DataFrame = {
    import s.implicits._
    chunkRows.toDF("file_id", "chunk_idx", "text", "t_start", "t_end", "confidence")
  }

  def segmentsDf(s: SparkSession): DataFrame = {
    import s.implicits._
    segRows.toDF("file_id", "seg_idx", "spk_start", "spk_end", "speaker")
  }

  def filesDf(s: SparkSession): DataFrame = {
    import s.implicits._
    fileRows.toDF("file_id", "n_samples")
  }

  private val chunksSql =
    "chunks(file_id, chunk_idx, text, t_start, t_end, confidence) AS (VALUES " +
      chunkRows.map { case (f, i, t, s, e, c) =>
        s"($f, $i, '$t', CAST($s AS DOUBLE), CAST(${e.map(_.toString).getOrElse("NULL")} AS DOUBLE), " +
          s"CAST(${c.map(_.toString).getOrElse("NULL")} AS DOUBLE))"
      }.mkString(", ") + ")"

  private val segmentsSql =
    "segments(file_id, seg_idx, spk_start, spk_end, speaker) AS (VALUES " +
      segRows.map { case (f, i, s, e, sp) =>
        s"($f, $i, CAST($s AS DOUBLE), CAST($e AS DOUBLE), '$sp')"
      }.mkString(", ") + ")"

  private val filesSql =
    "files(file_id, n_samples) AS (VALUES " +
      fileRows.map { case (f, n) => s"($f, CAST($n AS BIGINT))" }.mkString(", ") + ")"

  /** Shared J1 alignment SQL chain (CTEs `ch`→`utt`) over source CTEs
    * named `chunks` + `isl`; composable by any oracle that generates its
    * own chunk/segment relations (see PipelineOps). */
  private[operators] val alignSqlCtes =
    """ch AS (SELECT file_id, text, t_start, t_end, confidence,
      |  row_number() OVER (PARTITION BY file_id ORDER BY chunk_idx) - 1 AS p
      |  FROM chunks WHERE t_end IS NOT NULL),
      |n AS (SELECT file_id, count(*) AS n_chunks FROM ch GROUP BY file_id),
      |gg AS (SELECT i.file_id, i.island, i.speaker, c.p,
      |  row_number() OVER (PARTITION BY i.file_id, i.island
      |    ORDER BY abs(c.t_end - i.isl_end), c.p) AS rn
      |  FROM isl i JOIN ch c ON c.file_id = i.file_id),
      |g AS (SELECT file_id, island, speaker, p AS gpos FROM gg WHERE rn = 1),
      |cuts0 AS (SELECT file_id, island, speaker,
      |  island - 1 + max(gpos - (island - 1)) OVER (PARTITION BY file_id ORDER BY island
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cpos
      |  FROM g),
      |cuts AS (SELECT *, coalesce(lag(cpos) OVER (PARTITION BY file_id ORDER BY island) + 1, 0) AS rpos
      |  FROM cuts0),
      |emit AS (SELECT cuts.* FROM cuts JOIN n USING (file_id) WHERE rpos <= n_chunks - 1),
      |utt AS (SELECT e.file_id, e.island AS utt_idx, e.speaker,
      |  string_agg(trim(c.text), ' ' ORDER BY c.p) AS text,
      |  min_by(c.t_start, c.p) AS t_start, max_by(c.t_end, c.p) AS t_end,
      |  round(avg(coalesce(c.confidence, 1.0)), 6) AS confidence
      |FROM emit e JOIN ch c ON c.file_id = e.file_id AND c.p BETWEEN e.rpos AND e.cpos
      |GROUP BY e.file_id, e.island, e.speaker)""".stripMargin

  /** Shared W1 island SQL chain (CTEs `l`→`isl`), used by several oracles. */
  private[operators] val islandsSqlCtes =
    """l AS (SELECT *, lag(speaker) OVER (PARTITION BY file_id ORDER BY seg_idx) AS prev_spk FROM segments),
      |ff AS (SELECT *, CASE WHEN prev_spk IS NULL OR speaker <> prev_spk THEN 1 ELSE 0 END AS is_new FROM l),
      |isl0 AS (SELECT *, sum(is_new) OVER (PARTITION BY file_id ORDER BY seg_idx
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM ff),
      |isl1 AS (SELECT file_id, island, min_by(speaker, seg_idx) AS speaker,
      |  min_by(spk_start, seg_idx) AS isl_start, max_by(spk_end, seg_idx) AS raw_end
      |  FROM isl0 GROUP BY file_id, island),
      |isl AS (SELECT file_id, island, speaker, isl_start,
      |  coalesce(lead(isl_start) OVER (PARTITION BY file_id ORDER BY island), raw_end) AS isl_end
      |  FROM isl1)""".stripMargin

  // ---- W1: gaps-and-islands speaker coalescing ---------------------

  /** Merge consecutive same-speaker segments per file (reference end
    * semantics: island end = next island's start; final island = its own
    * last segment end). */
  def islands(segs: DataFrame): DataFrame = {
    val byFile = Window.partitionBy(col("file_id")).orderBy(col("seg_idx"))
    val byIsland = Window.partitionBy(col("file_id")).orderBy(col("island"))
    segs
      .withColumn("prev_spk", lag(col("speaker"), 1).over(byFile))
      .withColumn("is_new",
        when(col("prev_spk").isNull || col("speaker") =!= col("prev_spk"), 1).otherwise(0))
      .withColumn("island", sum(col("is_new")).over(
        byFile.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("file_id"), col("island"))
      .agg(min_by(col("speaker"), col("seg_idx")).as("speaker"),
           min_by(col("spk_start"), col("seg_idx")).as("isl_start"),
           max_by(col("spk_end"), col("seg_idx")).as("raw_end"))
      .withColumn("isl_end",
        coalesce(lead(col("isl_start"), 1).over(byIsland), col("raw_end")))
      .drop("raw_end")
  }

  // ---- J1: consume-prefix as-of alignment --------------------------

  /** Align transcript chunks to speaker islands with the reference's
    * stateful-cursor semantics, fully unrolled into window expressions. */
  def align(segs: DataFrame, chunks: DataFrame): DataFrame = {
    val isl = islands(segs)
    val ch = chunks
      .filter(col("t_end").isNotNull)
      .withColumn("p", row_number().over(
        Window.partitionBy(col("file_id")).orderBy(col("chunk_idx"))) - 1)
    val n = ch.groupBy(col("file_id")).agg(count(lit(1)).as("n_chunks"))
    // global argmin per island: nearest chunk end, first index on ties
    val g = isl.join(ch.select(col("file_id"), col("t_end"), col("p")), Seq("file_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("file_id"), col("island"))
          .orderBy(abs(col("t_end") - col("isl_end")), col("p"))))
      .filter(col("rn") === 1)
      .select(col("file_id"), col("island"), col("speaker"), col("p").as("gpos"))
    // cursor unroll: cpos_i = s_i + running_max(gpos_j - s_j), s = island-1
    val bySeq = Window.partitionBy(col("file_id")).orderBy(col("island"))
    val cuts = g
      .withColumn("s", col("island") - 1)
      .withColumn("cpos", col("s") + max(col("gpos") - col("s")).over(
        bySeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rpos", coalesce(lag(col("cpos"), 1).over(bySeq) + 1, lit(0)))
      .join(n, Seq("file_id"))
      .filter(col("rpos") <= col("n_chunks") - 1) // break: no chunks remain
    cuts.join(ch, Seq("file_id"))
      .filter(col("p").between(col("rpos"), col("cpos")))
      .groupBy(col("file_id"), col("island"), col("speaker"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("p"), col("text")))),
          x => trim(x.getField("text"))), " ").as("text"),
        min_by(col("t_start"), col("p")).as("t_start"),
        max_by(col("t_end"), col("p")).as("t_end"),
        round(avg(coalesce(col("confidence"), lit(1.0))), 6).as("confidence"))
      .withColumnRenamed("island", "utt_idx")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w1_islands" -> ((s, _) =>
      islands(segmentsDf(s))
        .select(col("file_id"), col("island"), col("speaker"),
                col("isl_start"), col("isl_end"))
        .orderBy(col("file_id"), col("island"))),

    "j1_asof_alignment" -> ((s, _) =>
      align(segmentsDf(s), chunksDf(s))
        .orderBy(col("file_id"), col("utt_idx"))),

    // K2: formatted dialogue rendering (transcription.py:353-359).
    "k2_dialogue_render" -> ((s, _) =>
      align(segmentsDf(s), chunksDf(s))
        .select(col("file_id"), col("utt_idx"),
          format_string("[%.2f-%.2f] %s: %s",
            col("t_start"), col("t_end"), col("speaker"), col("text")).as("line"))
        .orderBy(col("file_id"), col("utt_idx"))),

    // A5: mean confidence with null→1.0 default (transcription.py:217).
    "a5_mean_confidence" -> ((s, _) =>
      chunksDf(s)
        .filter(col("t_end").isNotNull)
        .groupBy(col("file_id"))
        .agg(round(avg(coalesce(col("confidence"), lit(1.0))), 6).as("mean_conf"),
             count(lit(1)).as("n_chunks"))
        .orderBy(col("file_id"))),

    // V6: diarization fallback — fileless segments get a single
    // SPEAKER_00 span [0, n_samples/16000].
    "v6_diarize_fallback" -> ((s, _) => {
      val isl = islands(segmentsDf(s))
      filesDf(s).join(isl, Seq("file_id"), "left")
        .select(col("file_id"),
          coalesce(col("speaker"), lit("SPEAKER_00")).as("speaker"),
          coalesce(col("isl_start"), lit(0.0)).as("seg_start"),
          coalesce(col("isl_end"), col("n_samples") / 16000.0).as("seg_end"))
        .orderBy(col("file_id"), col("seg_start"))
    }),

    // W1 at data scale: coalesce each user's consecutive same-type event
    // runs (same island algebra, partitioned by user over the events
    // table — the axis that scales to 100 TB).
    "w1_islands_events" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      graft.Tables.events(s, dir)
        .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
        .withColumn("is_new",
          when(col("prev_type").isNull || col("event_type") =!= col("prev_type"), 1).otherwise(0))
        .withColumn("run_id", sum(col("is_new")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("run_id"))
        .agg(count(lit(1)).as("run_len"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_runs"),
             max(col("run_len")).as("longest_run"))
        .orderBy(col("user_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "w1_islands" ->
      s"""WITH $segmentsSql,
         |$islandsSqlCtes
         |SELECT file_id, island::BIGINT AS island, speaker, isl_start, isl_end
         |FROM isl ORDER BY file_id, island""".stripMargin,

    "j1_asof_alignment" ->
      s"""WITH $segmentsSql,
         |$chunksSql,
         |$islandsSqlCtes,
         |$alignSqlCtes
         |SELECT file_id, utt_idx::BIGINT AS utt_idx, speaker, text, t_start, t_end, confidence
         |FROM utt ORDER BY file_id, utt_idx""".stripMargin,

    "k2_dialogue_render" ->
      s"""WITH $segmentsSql,
         |$chunksSql,
         |$islandsSqlCtes,
         |$alignSqlCtes
         |SELECT file_id, utt_idx::BIGINT AS utt_idx,
         |  printf('[%.2f-%.2f] %s: %s', t_start, t_end, speaker, text) AS line
         |FROM utt ORDER BY file_id, utt_idx""".stripMargin,

    "a5_mean_confidence" ->
      s"""WITH $chunksSql
         |SELECT file_id, round(avg(coalesce(confidence, 1.0)), 6) AS mean_conf,
         |  count(*) AS n_chunks
         |FROM chunks WHERE t_end IS NOT NULL
         |GROUP BY file_id ORDER BY file_id""".stripMargin,

    "v6_diarize_fallback" ->
      s"""WITH $segmentsSql,
         |$filesSql,
         |$islandsSqlCtes
         |SELECT f.file_id,
         |  coalesce(i.speaker, 'SPEAKER_00') AS speaker,
         |  coalesce(i.isl_start, 0.0) AS seg_start,
         |  coalesce(i.isl_end, f.n_samples / 16000.0) AS seg_end
         |FROM files f LEFT JOIN isl i USING (file_id)
         |ORDER BY file_id, seg_start""".stripMargin,

    "w1_islands_events" ->
      """WITH l AS (SELECT user_id, ts, event_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |f AS (SELECT *, CASE WHEN prev_type IS NULL OR event_type <> prev_type THEN 1 ELSE 0 END AS is_new FROM l),
        |r AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id FROM f),
        |runs AS (SELECT user_id, run_id, count(*) AS run_len FROM r GROUP BY user_id, run_id)
        |SELECT user_id, count(*) AS n_runs, max(run_len) AS longest_run
        |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
