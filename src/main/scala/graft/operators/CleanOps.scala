package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus cleaning — the normalize/prune/mixture stage of a training-data
  * pipeline, sitting between ingestion (reference `aws_bucket.py`) and
  * embedding (`embedding_engine.py:63-71`, which consumes raw `.txt`
  * content with only an emptiness check — no normalization exists in the
  * reference at all).
  *
  * Scale design:
  *  - normalization is pure map-side expression work (no shuffle); the
  *    output carries an md5 of the cleaned text, not the text, so
  *    nothing wide ever leaves the scan stage.
  *  - token pruning uses a RELATIVE frequency cut (≥ 0.1% of all corpus
  *    tokens): the frequent vocabulary is tiny by Zipf's law, so it
  *    aggregates to one short list and broadcasts; the rare tail — the
  *    part that grows with corpus size — is never collected anywhere.
  *    One shuffle (token counts, map-side combined), then map-side
  *    membership filtering.
  *  - mixture stats are one groupBy on (source, lang) plus two scalar
  *    aggregates; cumulative shares come from exact long sums (the
  *    division happens once per output row, after the rollup), so the
  *    numbers are order-independent and cross-engine exact.
  */
object CleanOps {

  private val stopwords = Seq("the", "a")
  private val freqFraction = 0.001

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Text normalization: trim → lowercase → collapse runs of spaces →
    // strip stopwords. Emits token counts before/after + content hash.
    "clean_normalize" -> ((s, dir) => {
      val cleaned = regexp_replace(trim(lower(col("text"))), " +", " ")
      Tables.documents(s, dir)
        .filter(col("text").isNotNull)
        .select(col("doc_id"), split(cleaned, " ").as("toks"))
        .select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          filter(col("toks"), t => !t.isin(stopwords: _*)).as("kept"))
        .select(col("doc_id"), col("n_tokens"),
          size(col("kept")).as("n_kept"),
          md5(array_join(col("kept"), " ")).as("clean_md5"))
        .orderBy(col("doc_id")).limit(200)
    }),

    // Rare-token pruning: drop tokens whose corpus count is under 0.1%
    // of all token occurrences. The frequent vocab (small) is broadcast
    // as one sorted list; membership runs map-side per token.
    "clean_rare_tokens" -> ((s, dir) => {
      val t = Tables.documents(s, dir)
        .filter(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val vocab = t.select(explode(col("toks")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val freq = vocab
        .crossJoin(broadcast(vocab.agg(sum(col("cnt")).as("total"))))
        .filter(col("cnt") >= col("total") * freqFraction)
        .agg(sort_array(collect_list(col("tok"))).as("vs"))
      t.crossJoin(broadcast(freq))
        .select(col("doc_id"),
          size(col("toks")).as("n_total"),
          filter(col("toks"), x => array_contains(col("vs"), x)).as("kept"))
        .select(col("doc_id"), col("n_total"),
          size(col("kept")).as("n_kept"),
          md5(array_join(col("kept"), " ")).as("kept_md5"))
        .orderBy(col("doc_id")).limit(200)
    }),

    // Privacy: pseudonymize user identifiers with a salted hash before
    // a corpus leaves the pipeline — irreversible without the pepper,
    // but cardinality- and join-preserving (the same user maps to the
    // same pseudonym everywhere). Map-side only; the aggregate proves
    // the mapping is injective on the fixture (n_pseudo == n_users) and
    // gives the k-anonymity census (smallest pseudonym group size).
    "privacy_pseudonymize" -> ((s, dir) => {
      val pseudo = sha2(concat(lit("graft-pepper:"), col("user_id").cast("string")), 256)
      val ev = Tables.events(s, dir).select(pseudo.as("user_pseudo"))
        .groupBy(col("user_pseudo")).agg(count(lit(1)).as("n_events"))
      ev.agg(count(lit(1)).as("n_pseudonyms"),
             min(col("n_events")).as("k_anonymity"),
             sum(col("n_events")).as("n_total"))
    }),

    // C4/CCNet-style corpus-frequency boilerplate removal, at fixed
    // 10-word chunk granularity (the corpus has no newlines, so chunks
    // stand in for lines): count each chunk's exact occurrences across
    // the WHOLE corpus, drop chunks appearing ≥2 times (headers,
    // footers, duplicated passages), reassemble survivors in order.
    // Scale: chunking is map-side; the frequency pass shuffles md5
    // digests (never text); the boilerplate set is tiny by construction
    // (only repeated chunks) → broadcast anti-join; one final groupBy
    // per doc. This is the line-level dedup every web-scale corpus runs
    // (C4 "three-sentence" rule, CCNet paragraph hashes).
    "clean_boilerplate_chunks" -> ((s, dir) =>
      graft.api.Graft.removeBoilerplate(
          Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("n_kept_chunks"),
                md5(col("clean_text")).as("clean_md5"))
        .orderBy(col("doc_id")).limit(200)),

    // PII redaction: email/phone → placeholder tokens, with match
    // counts. Map-side regexp only. The synthetic corpus carries no
    // PII, so a deterministic contact string is injected for
    // doc_id % 7 == 0 in BOTH engines (fixture-in-the-query, like the
    // transcription stubs); patterns are written in the Java∩RE2
    // dialect so Spark and DuckDB match identically.
    "clean_redact_pii" -> ((s, dir) => {
      val withPii = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
                   lit("@example.com or 555-867-5309")))
            .otherwise(col("text")).as("text"))
      graft.api.Graft.redactPii(withPii, "text", "red")
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
                md5(col("red")).as("red_md5"))
        .orderBy(col("doc_id")).limit(200)
    }),

    // Mixture statistics: per (source, lang) doc/token totals, token
    // share of corpus, and cumulative share in descending-token order —
    // the table a mixture-weighting/sampling stage consumes.
    "clean_mixture_stats" -> ((s, dir) => {
      val grouped = Tables.documents(s, dir)
        .filter(col("text").isNotNull)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
             sum(size(split(col("text"), " "))).as("n_tokens"))
      // single-partition window is bounded: |source × lang| rows — the
      // mixture table, dozens of combos even at corpus scale
      val w = Window.orderBy(desc("n_tokens"), col("source"), col("lang"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grouped
        .crossJoin(broadcast(grouped.agg(sum(col("n_tokens")).as("total"))))
        .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
          round(col("n_tokens").cast("double") / col("total"), 6).as("token_share"),
          round(col("cum_tokens").cast("double") / col("total"), 6).as("cum_share"))
        .orderBy(desc("n_tokens"), col("source"), col("lang"))
    }),

    // Unicode NFC normalization: canonical composition BEFORE any
    // content-identity op — "café" in NFC vs NFD hashes differently, so
    // unnormalized corpora silently miss exact dups / fingerprints /
    // decontamination hits. Native expression with an isNormalized fast
    // path (ASCII-dominant corpora pay ~nothing). The synthetic corpus
    // is pure ASCII, so decomposed combining sequences are injected for
    // doc_id % 11 == 0 in BOTH engines (fixture-in-the-query, the
    // redact_pii pattern); the oracle is DuckDB's own nfc_normalize.
    "clean_unicode_nfc" -> ((s, dir) => {
      val withAccents = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"),
          when(col("doc_id") % 11 === 0,
            // DECOMPOSED sequences: e+U+0301, i+U+0308 (the NFD forms)
            concat(col("text"), lit(" cafe\u0301 nai\u0308ve")))
            .otherwise(col("text")).as("text"))
      withAccents
        .select(col("doc_id"), col("text"),
          graft.functions.TextSignatures.nfcNormalize(col("text")).as("norm"))
        .select(col("doc_id"),
          (col("norm") =!= col("text")).cast("int").as("changed"),
          (length(col("text")) - length(col("norm"))).as("len_delta"),
          md5(col("norm")).as("norm_md5"))
        .orderBy(col("doc_id")).limit(300)
    })
  )

  def oracles: Map[String, String] = Map(
    "clean_normalize" ->
      """WITH t AS (SELECT doc_id,
        |  string_split(regexp_replace(trim(lower(text)), ' +', ' ', 'g'), ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |k AS (SELECT doc_id, len(toks) AS n_tokens,
        |  list_filter(toks, x -> x NOT IN ('the', 'a')) AS kept FROM t)
        |SELECT doc_id, n_tokens::INT AS n_tokens, len(kept)::INT AS n_kept,
        |  md5(array_to_string(kept, ' ')) AS clean_md5
        |FROM k ORDER BY doc_id LIMIT 200""".stripMargin,

    "clean_rare_tokens" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |vocab AS (SELECT tok, count(*) AS cnt FROM
        |  (SELECT unnest(toks) AS tok FROM t) GROUP BY tok),
        |freq AS (SELECT list_sort(list(tok)) AS vs FROM vocab
        |  CROSS JOIN (SELECT sum(cnt) AS total FROM vocab)
        |  WHERE cnt >= total * 0.001),
        |k AS (SELECT doc_id, len(toks) AS n_total,
        |  list_filter(toks, x -> list_contains(vs, x)) AS kept
        |  FROM t CROSS JOIN freq)
        |SELECT doc_id, n_total::INT AS n_total, len(kept)::INT AS n_kept,
        |  md5(array_to_string(kept, ' ')) AS kept_md5
        |FROM k ORDER BY doc_id LIMIT 200""".stripMargin,

    "privacy_pseudonymize" ->
      """WITH p AS (SELECT sha256('graft-pepper:' || user_id::VARCHAR) AS user_pseudo,
        |  count(*) AS n_events FROM events GROUP BY 1)
        |SELECT count(*) AS n_pseudonyms,
        |  min(n_events)::BIGINT AS k_anonymity,
        |  sum(n_events)::BIGINT AS n_total FROM p""".stripMargin,

    "clean_boilerplate_chunks" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
        |  generate_subscripts(string_split(text, ' '), 1) AS sub
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT doc_id, (sub - 1) // 10 AS cidx,
        |  string_agg(w, ' ' ORDER BY sub) AS chunk
        |  FROM w GROUP BY doc_id, (sub - 1) // 10),
        |boiler AS (SELECT chunk FROM
        |  (SELECT chunk, count(*) AS n FROM c GROUP BY chunk) WHERE n >= 2),
        |kept AS (SELECT doc_id, cidx, chunk FROM c ANTI JOIN boiler USING (chunk))
        |SELECT doc_id, count(*)::BIGINT AS n_kept_chunks,
        |  md5(string_agg(chunk, ' ' ORDER BY cidx)) AS clean_md5
        |FROM kept GROUP BY doc_id ORDER BY doc_id LIMIT 200""".stripMargin,

    "clean_redact_pii" ->
      """WITH p AS (SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' || doc_id::VARCHAR
        |    || '@example.com or 555-867-5309' ELSE text END AS text
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id,
        |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
        |  len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b'))::BIGINT AS n_phones,
        |  md5(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g')) AS red_md5
        |FROM p ORDER BY doc_id LIMIT 200""".stripMargin,

    "clean_mixture_stats" ->
      """WITH g AS (SELECT source, lang, count(*) AS n_docs,
        |  sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
        |  FROM documents WHERE text IS NOT NULL GROUP BY source, lang)
        |SELECT source, lang, n_docs, n_tokens,
        |  round(n_tokens::DOUBLE / (SELECT sum(n_tokens) FROM g), 6) AS token_share,
        |  round(sum(n_tokens) OVER (ORDER BY n_tokens DESC, source, lang
        |    ROWS UNBOUNDED PRECEDING)::DOUBLE / (SELECT sum(n_tokens) FROM g), 6)
        |    AS cum_share
        |FROM g ORDER BY n_tokens DESC, source, lang""".stripMargin,

    "clean_unicode_nfc" ->
      """WITH p AS (SELECT doc_id, CASE WHEN doc_id % 11 = 0
        |    THEN text || ' cafe' || chr(769) || ' nai' || chr(776) || 've'
        |    ELSE text END AS text
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id, (nfc_normalize(text) <> text)::INT AS changed,
        |  (length(text) - length(nfc_normalize(text)))::INT AS len_delta,
        |  md5(nfc_normalize(text)) AS norm_md5
        |FROM p ORDER BY doc_id LIMIT 300""".stripMargin
  )
}
