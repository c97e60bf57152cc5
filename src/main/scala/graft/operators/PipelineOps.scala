package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's ENTIRE per-file dataflow as one composed lazy DAG
  * (`main.py:120-162`): decode → transcribe → diarize → coalesce
  * speakers → align → render — ending in per-file dialogue output,
  * exactly the artifact `_save_transcription` stages to disk
  * (`transcription.py:334-367`).
  *
  * The two ML stages are deterministic stubs derived from the document
  * text (the fixture contract, SURVEY §7.1): "transcription" chunks the
  * token stream 10 tokens per 3-second chunk with a synthetic confidence
  * (null every 5th chunk → exercises the A5 default), "diarization"
  * emits 6-second alternating-speaker turns. Everything downstream —
  * W1 islands, the J1 cursor, A5/A7 aggregation, K2 rendering — is the
  * production operator chain (TranscriptOps), unchanged.
  *
  * Scale: one DAG per corpus, not per file — where the reference loops
  * files through the filesystem (re-reading every stage, `main.py:106`
  * re-embeds ALL txt files every poll), this plan partitions by file_id
  * once and streams each stage into the next with no intermediate
  * materialization. A million files = a million independent partitions
  * of the same five-operator plan.
  */
object PipelineOps {

  /** Deterministic "transcription": 10-token chunks, 3 s apart. */
  private[operators] def fakeChunks(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    docs
      .select(col("doc_id").as("file_id"), toks.as("toks"))
      .withColumn("c", ((size(col("toks")) + 9) / 10).cast("int"))
      .select(col("file_id"), col("toks"),
              explode(sequence(lit(0), col("c") - 1)).as("i"))
      .select(col("file_id"), col("i").as("chunk_idx"),
        array_join(slice(col("toks"), col("i") * 10 + 1, lit(10)), " ").as("text"),
        (col("i") * 3.0).as("t_start"),
        ((col("i") + 1) * 3.0).as("t_end"),
        when((col("file_id") + col("i")) % 5 === 0, lit(null).cast("double"))
          .otherwise(((col("file_id") * 7 + col("i")) % 100) / 100.0).as("confidence"))
  }

  /** Deterministic "diarization": 6 s alternating-speaker turns. */
  private[operators] def fakeSegments(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    docs
      .select(col("doc_id").as("file_id"), toks.as("toks"))
      .withColumn("c", ((size(col("toks")) + 9) / 10).cast("int"))
      .select(col("file_id"),
              explode(sequence(lit(0), ((col("c") + 1) / 2).cast("int") - 1)).as("j"))
      .select(col("file_id"), col("j").as("seg_idx"),
        (col("j") * 6.0).as("spk_start"),
        ((col("j") + 1) * 6.0).as("spk_end"),
        concat(lit("SPEAKER_0"), (col("file_id") + col("j")) % 2).as("speaker"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_e2e" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 200)
      val utt = TranscriptOps.align(fakeSegments(docs), fakeChunks(docs))
      utt.groupBy(col("file_id"))
        .agg(count(lit(1)).as("n_utts"),
             floor(avg(col("confidence")) * 1e6 + 0.5).cast("long").as("avg_conf_e6"),
             array_join(
               transform(
                 array_sort(collect_list(struct(
                   col("utt_idx"), col("speaker"), col("text"),
                   col("t_start"), col("t_end")))),
                 x => format_string("[%.2f-%.2f] %s: %s",
                   x.getField("t_start"), x.getField("t_end"),
                   x.getField("speaker"), x.getField("text"))),
               " | ").as("dialogue"))
        .select(col("file_id").as("doc_id"), col("n_utts"),
                col("avg_conf_e6"), col("dialogue"))
        .orderBy(col("doc_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "pipeline_e2e" ->
      s"""WITH base AS (SELECT doc_id AS file_id, string_split(text, ' ') AS toks,
         |  ((len(string_split(text, ' ')) + 9) // 10)::INT AS c
         |  FROM documents WHERE doc_id < 200),
         |ci AS (SELECT file_id, toks, unnest(range(c)) AS i FROM base),
         |chunks AS (SELECT file_id, i AS chunk_idx,
         |  array_to_string(toks[(i*10+1):(i*10+10)], ' ') AS text,
         |  i * 3.0 AS t_start, (i + 1) * 3.0 AS t_end,
         |  CASE WHEN (file_id + i) % 5 = 0 THEN NULL
         |       ELSE ((file_id * 7 + i) % 100) / 100.0 END AS confidence
         |  FROM ci),
         |sj AS (SELECT file_id, unnest(range((c + 1) // 2)) AS j FROM base),
         |segments AS (SELECT file_id, j AS seg_idx, j * 6.0 AS spk_start,
         |  (j + 1) * 6.0 AS spk_end,
         |  'SPEAKER_0' || ((file_id + j) % 2) AS speaker
         |  FROM sj),
         |${TranscriptOps.islandsSqlCtes},
         |${TranscriptOps.alignSqlCtes}
         |SELECT file_id AS doc_id, count(*) AS n_utts,
         |  CAST(floor(avg(confidence) * 1e6 + 0.5) AS BIGINT) AS avg_conf_e6,
         |  string_agg(printf('[%.2f-%.2f] %s: %s', t_start, t_end, speaker, text),
         |             ' | ' ORDER BY utt_idx) AS dialogue
         |FROM utt GROUP BY file_id ORDER BY doc_id""".stripMargin
  )
}
