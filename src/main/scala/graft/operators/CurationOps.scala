package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus curation for training-data pipelines (north-star extensions):
  * deterministic stratified sampling and quality-quota selection.
  *
  * These are the two selection primitives every LLM data pipeline runs
  * after dedup: rebalance a skewed language/source mix (sampling) and
  * cap each stratum at its best-k documents (quota). The reference has
  * no selection stage at all — it ingests everything it lists
  * (`/root/reference/src/aws_bucket.py:160-195`); these generalize its
  * key-membership gate to content-aware selection.
  *
  * Scale design:
  *  - sampling is a map-side-only predicate on a per-row hash — zero
  *    shuffle, no RNG state: `md5(doc_id)`-derived basis points make
  *    the sample a deterministic FUNCTION of the row, so re-runs,
  *    retries, and incremental jobs select the identical subset (the
  *    reason `df.sample()`'s seeded-but-partition-dependent RNG is the
  *    wrong tool at 100 TB — its selection changes with the split
  *    layout).
  *  - quota is one shuffle per stratum key (the window partition); at
  *    extreme per-stratum cardinality swap row_number for a bounded
  *    top-k aggregate, but strata counts (languages, sources) are tiny.
  */
object CurationOps {

  /** Deterministic per-row basis points — the canonical definition
    * lives in [[graft.functions.TextMetrics.hashBps]]. */
  private def hashBps(id: Column): Column =
    graft.functions.TextMetrics.hashBps(id)

  private val hashBpsSql =
    "(('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000)"

  /** Per-language sampling rate in basis points: downsample the
    * over-represented language, keep the tail. */
  private def rateBps(lang: Column): Column =
    when(lang === "en", lit(500)).otherwise(lit(2000))

  private val rateBpsSql = "CASE WHEN lang = 'en' THEN 500 ELSE 2000 END"

  /** NB langid doc-score table (doc_id, actual, lang, score): every
    * test doc scored under every class with integer-micro log scores —
    * the shared model behind curate_nb_langid (argmax → confusion) and
    * ml_margin_calibration (top1−top2 margin → reliability). Memoized
    * per (session, dir): the token explode + L-way expansion runs
    * once; the materialized table is |test docs|×L rows. */
  private def nbDocScores(s: SparkSession, dir: String): DataFrame =
    graft.api.Graft.memoizedExchange("nb_langid_doc_scores", s, dir) {
      val B = 4096
      val docs = Tables.documentsSpread(s, dir)
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("lang"),
          (hashBps(col("doc_id")) < 8000).as("is_train"), col("text"))
      val toks = docs.select(col("doc_id"), col("lang"), col("is_train"),
          explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .withColumn("b",
          conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long") % B)
        .drop("w")
      val train = toks.filter(col("is_train"))
      // ≤ B×L rows: the whole likelihood model in one aggregation
      val counts = train.groupBy(col("b"), col("lang"))
        .agg(count(lit(1)).as("c")).localCheckpoint()
      val totals = counts.groupBy(col("lang")).agg(sum(col("c")).as("t"))
      val priorsN = docs.filter(col("is_train"))
        .groupBy(col("lang")).agg(count(lit(1)).as("nd"))
      val priors = priorsN
        .crossJoin(broadcast(priorsN.agg(sum(col("nd")).as("ndt"))))
        .select(col("lang"),
          floor(log(col("nd") / col("ndt")) * 1e6 + 0.5).cast("long").as("plr"))
      toks.filter(!col("is_train"))
        .withColumnRenamed("lang", "actual")
        // L-way expansion: every test token scored under every class
        .crossJoin(broadcast(totals))
        .join(broadcast(counts), Seq("b", "lang"), "left")
        .withColumn("lr", floor(
            log((coalesce(col("c"), lit(0L)) + 1.0) / (col("t") + B)) * 1e6
            + 0.5).cast("long"))
        .groupBy(col("doc_id"), col("actual"), col("lang"))
        .agg(sum(col("lr")).as("ll"))
        .join(broadcast(priors), Seq("lang"))
        .withColumn("score", col("ll") + col("plr"))
    }

  private def quality(toks: Column): Column =
    graft.functions.TextMetrics.quality(toks)

  /** documents + fixed-point quality score: the selection input for
    * quota curation (used by curate_quota and the RagPipeline app). */
  private[graft] def scored(docs: DataFrame): DataFrame =
    docs.withColumn("quality_e6",
      floor(quality(split(col("text"), " ")) * 1e6 + 0.5).cast("long"))

  private[graft] val qualitySql =
    """(len(list_distinct(toks))::DOUBLE / len(toks)) * 0.4 +
      |least(len(toks)::DOUBLE / 50.0, 1.0) * 0.3 +
      |(1.0 - len(list_filter(toks, x -> x IN ('the', 'a')))::DOUBLE / len(toks)) * 0.3""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](
    // Nucleus (top-p) corpus cut: per language, rank docs by a model
    // quality score (stubbed: content-hash pseudo-score — a real scorer
    // swaps in a classifier margin) and keep the head of the ranking
    // until 90% of the language's characters are covered. The selection
    // rule is integer-exact (10·cum_prev < 9·total) so both engines cut
    // at the same doc. Scale shape: one per-lang window over the doc
    // summary (score, n_chars), not over text — the cumulative sort is
    // |docs| rows of two longs; text never shuffles.
    "curate_top_p_nucleus" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val score = conv(substring(md5(col("text").cast("binary")), 1, 8), 16, 10)
        .cast("long")
      val ranked = Tables.documents(s, dir)
        .filter(col("text").isNotNull && col("n_chars") > 0)
        .select(col("lang"), col("doc_id"), col("n_chars"), score.as("score"))
        .withColumn("cum", sum(col("n_chars")).over(
          Window.partitionBy(col("lang"))
            .orderBy(col("score").desc, col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total", sum(col("n_chars")).over(Window.partitionBy(col("lang"))))
      ranked.filter((col("cum") - col("n_chars")) * 10 < col("total") * 9)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
             sum(col("n_chars")).as("chars_kept"),
             max(col("total")).as("total_chars"))
        .select(col("lang"), col("n_kept"), col("chars_kept"), col("total_chars"),
          floor(lit(1000000L) * col("chars_kept") / col("total_chars") + 0.5)
            .cast("long").as("share_e6"))
        .orderBy(col("lang"))
    }),

    // Deterministic stratified sample: keep doc iff hash_bps < rate(lang).
    // Selection is a pure function of doc_id — no RNG, no shuffle; the
    // census below is the only aggregation.
    "sample_stratified" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("lang"), (hashBps(col("doc_id")) < rateBps(col("lang"))).as("keep"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_total"),
             count(when(col("keep"), 1)).as("n_sampled"))
        .orderBy(col("lang"))),

    // Deterministic train/val/test holdout split — the assignment every
    // training pipeline needs before anything touches the data. Split
    // is a pure function of doc_id (md5 basis points: <9000 train,
    // <9500 val, else test), so it needs NO stored assignment table, is
    // stable under corpus growth (a doc's split never changes when new
    // docs arrive — the property RNG sampling lacks), and any later
    // stage can recompute membership map-side with zero joins. The
    // census (per-split doc/token/char mass) is the only aggregation:
    // 3 groups, one exchange of partial sums.
    // Sequence-packing fragmentation report — the pretraining-batch
    // statistic behind "concatenate-then-cut" sample packing: with
    // docs concatenated in doc_id order per source and cut into
    // 2048-token training sequences, how many docs straddle a cut
    // (fragmented docs lose coherence; high frag argues for
    // boundary-respecting packing or longer sequences). A doc splits
    // iff its [cum_before, cum_before+w) token interval crosses a 2048
    // multiple — pure integer window arithmetic, the
    // layout_compaction_plan offset-binning law at token grain. One
    // per-source window shuffle; output is |sources| rows.
    "curate_pack_fragmentation" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .filter(col("text").isNotNull)
        .select(col("source"), col("doc_id"),
                size(split(col("text"), " ")).cast("long").as("w"))
        .filter(col("w") >= 1)
      val wnd = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      docs
        .withColumn("cumb", coalesce(sum(col("w")).over(wnd), lit(0L)))
        .withColumn("split",
          (expr("cumb div 2048") =!= expr("(cumb + w - 1) div 2048")).cast("long"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("n_tokens"),
             sum(col("split")).as("n_split_docs"))
        .withColumn("n_seqs", expr("(n_tokens + 2047) div 2048"))
        .withColumn("frag_e6", expr("n_split_docs * 1000000 div n_docs"))
        .withColumn("last_fill_e6",
          expr("(n_tokens - (n_seqs - 1) * 2048) * 1000000 div 2048"))
        .orderBy(col("source"))
    }),

    "curate_holdout_split" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(when(hashBps(col("doc_id")) < 9000, lit("train"))
                  .when(hashBps(col("doc_id")) < 9500, lit("val"))
                  .otherwise(lit("test")).as("split"),
                size(split(col("text"), " ")).cast("long").as("n_tokens"),
                col("n_chars"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_tokens")).as("sum_tokens"),
             sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("split"))),

    // Quality-quota curation: exact-dedup keep-first by content hash,
    // then keep each language's top-50 by (quality desc, doc_id), and
    // report the kept mass per stratum. Fixed-point quality (e6) keeps
    // the double sums integral ⇒ order-independent ⇒ oracle-exact.
    // Token-budget WATERFILLING across sources — the dataset-mixing
    // allocator behind "give every source an equal share of the
    // training budget, but a source can't contribute tokens it doesn't
    // have": sources are sorted by availability ascending; any source
    // whose stock can't reach the evolving fair share is taken WHOLE
    // (capped) and its unused share is redistributed to the rest —
    // source j (1-based, k sources, budget T) is capped iff
    // avail_j · (k − j + 1) ≤ T − cum_{<j}, a prefix-sum predicate (no
    // iteration: caps are monotone in the availability order, so the
    // classic waterfill loop collapses to one window pass). The final
    // level = (T − Σ_capped avail) div n_uncapped in exact BIGINT;
    // allocation = min(avail, level). Scale: one aggregate to
    // per-source stocks (|sources| rows), one tiny window — the corpus
    // is touched once, the allocator is metadata-sized.
    "curate_mix_waterfill" -> ((s, dir) => {
      val budget = 100000L
      val stock = Tables.documents(s, dir)
        .filter(col("text").isNotNull)
        .groupBy(col("source"))
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("avail_tokens"))
      // |sources|-row table: the single-partition window is bounded
      val w = Window.orderBy(col("avail_tokens"), col("source"))
      val flagged = stock
        .withColumn("j", row_number().over(w).cast("long"))
        .withColumn("cum_prev", coalesce(sum(col("avail_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .crossJoin(broadcast(stock.agg(count(lit(1)).as("k"))))
        .withColumn("capped",
          (col("avail_tokens") * (col("k") - col("j") + 1) <=
           lit(budget) - col("cum_prev")).cast("long"))
      val lvl = flagged.agg(
          sum(when(col("capped") === 1, col("avail_tokens")).otherwise(0L)).as("cap_sum"),
          sum(lit(1L) - col("capped")).as("n_uncapped"))
        .select(when(col("n_uncapped") > 0,
            expr(s"(${budget}L - cap_sum) div n_uncapped"))
          .otherwise(lit(budget)).cast("long").as("level"))
      flagged.crossJoin(broadcast(lvl))
        .select(col("source"), col("avail_tokens"), col("capped"),
          least(col("avail_tokens"), col("level")).as("allocated_tokens"))
        .orderBy(col("source"))
    }),

    "curate_quota" -> ((s, dir) => {
      val deduped = scored(Tables.documents(s, dir))
        .select(col("doc_id"), col("lang"), md5(col("text")).as("h"),
                size(split(col("text"), " ")).as("n_tokens"), col("quality_e6"))
        .withColumn("dup_rn", row_number().over(
          Window.partitionBy(col("h")).orderBy(col("doc_id"))))
        .filter(col("dup_rn") === 1)
      deduped
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(desc("quality_e6"), col("doc_id"))))
        .filter(col("rn") <= 50)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
             sum(col("quality_e6")).as("sum_quality_e6"),
             sum(col("n_tokens").cast("long")).as("sum_tokens"))
        .orderBy(col("lang"))
    }),

    // Benchmark decontamination: flag corpus documents sharing any word
    // 5-gram with the held-out "benchmark" set (doc_id % 97 == 3 stands
    // in for an eval suite). The benchmark's distinct n-gram hashes are
    // BROADCAST (eval suites are tiny vs the corpus); the corpus side is
    // an explode + broadcast-semi-join + distinct — no corpus self-join,
    // no shuffle of text. The n-gram unit is longer than dedup shingles
    // (5 vs 2): decontamination wants verbatim leakage, not similarity.
    "curate_decontaminate" -> ((s, dir) => {
      val ngrams = graft.functions.TextSignatures.wordNgramHashes(col("text"), 5)
      val docs = Tables.documentsSpread(s, dir)
      val benchGrams = docs.filter(col("doc_id") % 97 === 3)
        .select(explode(ngrams).as("g")).distinct()
      val corpus = docs.filter(col("doc_id") % 97 =!= 3)
      val contaminated = corpus
        .select(col("doc_id"), col("lang"), explode(ngrams).as("g"))
        .join(broadcast(benchGrams), Seq("g"), "left_semi")
        .select(col("doc_id"), col("lang")).distinct()
      corpus.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        .join(contaminated.groupBy(col("lang")).agg(count(lit(1)).as("n_contaminated")),
              Seq("lang"), "left")
        .select(col("lang"), col("n_docs"),
                coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
        .orderBy(col("lang"))
    }),

    // Rejection sampling to a TARGET mixture (uniform over langs) —
    // the sampler family's fourth member next to nucleus cut,
    // temperature reweighting, and water-filling: instead of
    // reweighting shares, each doc is independently kept with
    // p = min(1, target_l / current_l) = min(1, N/(L·n_l)), which
    // exactly flattens the language mix in expectation with ONE
    // map-side hash decision per row — no global sort, no per-stratum
    // reservoir state, trivially restartable (the decision is a pure
    // doc_id function). The accept test is the exact cross-multiplied
    // integer form h·L·n_l < N·2^48 (p ≥ 1 needs no special case:
    // h < 2^48 makes the inequality unconditionally true), so both
    // engines keep the IDENTICAL doc set. Scale: |langs|-row rate
    // table broadcast; everything else scan-rate.
    "curate_rejection_sampling" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
      val byLang = d.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
      val tot = byLang.agg(sum(col("n_l")).as("n"),
                           count(lit(1)).as("nl_langs"))
      val kept = d.join(broadcast(byLang), "lang").crossJoin(broadcast(tot))
        .withColumn("h", conv(substring(md5(concat(
            col("doc_id").cast("string"), lit(":rej"))), 1, 12), 16, 10)
          .cast("long"))
        .withColumn("keep",
          (expr("CAST(h AS DECIMAL(19,0)) * CAST(nl_langs * n_l AS DECIMAL(19,0))") <
           expr("CAST(n AS DECIMAL(19,0)) * CAST(281474976710656 AS DECIMAL(19,0))"))
            .cast("long"))
        .groupBy(col("lang"))
        .agg(max(col("n_l")).as("n_before"), max(col("n")).as("n"),
             max(col("nl_langs")).as("nl_langs"), sum(col("keep")).as("n_kept"))
      kept.crossJoin(broadcast(kept.agg(sum(col("n_kept")).as("kept_total"))))
        .select(col("lang"), col("n_before"),
          least(lit(1000000L),
            expr("n * 1000000 div (nl_langs * n_before)")).as("p_e6"),
          col("n_kept"),
          expr("n_kept * 1000000 div kept_total").as("kept_share_e6"))
        .orderBy(col("lang"))
    }),

    // Temperature-smoothed mixture resampling (α = 0.5): the standard
    // rebalancing for multilingual/multi-source corpora — target share
    // ∝ share^α, which upweights tails and downweights the head. All
    // mixture math runs on INTEGER-quantized weights (w_e6 = round(√share
    // ·1e6)): the cross-stratum normalizer is then an exact long sum, so
    // target shares and bps rates are identical under any aggregation
    // order and in the oracle. Selection stays the deterministic
    // hash-bps predicate — a pure doc_id function, layout-invariant,
    // no RNG state anywhere (`sample_stratified`'s machinery).
    // Epoch-schedule planner for data-constrained training (the
    // Muennighoff et al. 2023 question: with a token budget larger
    // than the corpus, how many times does each source repeat?): the
    // budget T = 4× total corpus tokens is allocated across sources ∝
    // the α = 0.5 temperature weight (curate_temperature_mix's exact
    // e6-quantized √share — ONE quantization, then pure BIGINT), and
    // each source's epoch count lands as an exact centi-epoch integer
    // alloc·100 div n_tokens. flag_overfit marks sources pushed past
    // 4 epochs — the paper's diminishing-returns knee — i.e. exactly
    // the rows where the planner should cap repeats and re-waterfill
    // (curate_mix_waterfill is that next step). |sources|-row table;
    // one corpus aggregate feeds everything.
    "curate_epoch_schedule" -> ((s, dir) => {
      val bySrc = Tables.documents(s, dir).filter(col("text").isNotNull)
        .groupBy(col("source"))
        .agg(sum(size(split(col("text"), " "))).as("n_tokens"))
      val withW = bySrc
        .crossJoin(broadcast(bySrc.agg(sum(col("n_tokens")).as("tok_total"))))
        .withColumn("w_e6",
          floor(sqrt(col("n_tokens").cast("double") / col("tok_total")) * 1e6
            + 0.5).cast("long"))
      // Overflow-safe EXACT evaluation (r10 advice): a·b div c =
      // (a div c)·b + ((a mod c)·b) div c for non-negative operands —
      // identical values to the naive product (the oracle replays the
      // same decomposition), but the widest intermediate is
      // max(tok_total·4, w_sum·1e6) instead of tok_total·4·1e6, so
      // BIGINT holds to ~2.3e18 corpus tokens (≈ 9 EB of text) rather
      // than wrapping at ~2.3e12 (Spark wraps silently, DuckDB errors
      // — a latent cross-engine divergence). Same identity for the
      // centi-epoch step: safe to tok_total < 9.2e16.
      withW
        .crossJoin(broadcast(withW.agg(sum(col("w_e6")).as("w_sum"))))
        .withColumn("alloc_tokens", expr(
          "(tok_total * 4 div w_sum) * w_e6 + ((tok_total * 4 % w_sum) * w_e6) div w_sum"))
        .withColumn("epochs_e2", expr(
          "(alloc_tokens div n_tokens) * 100 + ((alloc_tokens % n_tokens) * 100) div n_tokens"))
        .withColumn("flag_overfit", (col("epochs_e2") > 400L).cast("long"))
        .select(col("source"), col("n_tokens"), col("w_e6"),
                col("alloc_tokens"), col("epochs_e2"), col("flag_overfit"))
        .orderBy(col("source"))
    }),

    // Temperature-weighted language mix (√-share targets). Lineage note
    // (r11 verdict #6 sweep): byLang feeds FOUR downstream consumers
    // (withW, its own total, w_sum, the final report) — un-checkpointed,
    // each consumer re-planned the corpus aggregate and the ledger
    // showed NINE documents scans for a |langs|-row result. The lazy
    // localCheckpoint pins the |langs|-row digest once; the only corpus
    // scans left are the digest build and the per-doc gate pass (the
    // two-pass minimum: the gate rate depends on the aggregate).
    // Single-partition census: every SinglePartition exchange carries a
    // 1-row scalar (tok_total/doc_total, w_sum) or |langs|-row partials
    // — bounded by the language domain, never corpus-sized.
    "curate_temperature_mix" -> ((s, dir) => {
      val byLang = Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
             sum(size(split(col("text"), " "))).as("n_tokens"))
        .localCheckpoint(false)
      val withW = byLang
        .crossJoin(broadcast(byLang.agg(
          sum(col("n_tokens")).as("tok_total"), sum(col("n_docs")).as("doc_total"))))
        .withColumn("w_e6",
          floor(sqrt(col("n_tokens").cast("double") / col("tok_total")) * 1e6 + 0.5)
            .cast("long"))
      val rates = withW
        .crossJoin(broadcast(withW.agg(sum(col("w_e6")).as("w_sum"))))
        .withColumn("rate_bps", least(lit(10000L),
          floor(col("w_e6") * lit(1.0) / col("w_sum") * col("doc_total")
                * lit(10000.0) / col("n_docs")).cast("long")))
      val selected = Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"))
        .join(broadcast(rates.select(col("lang"), col("rate_bps"))), "lang")
        .filter(hashBps(col("doc_id")) < col("rate_bps"))
        .groupBy(col("lang")).agg(count(lit(1)).as("n_selected"))
      rates.join(selected, Seq("lang"), "left")
        .select(col("lang"), col("n_docs"), col("n_tokens"),
          round(col("n_tokens").cast("double") / col("tok_total"), 6).as("token_share"),
          round(col("w_e6").cast("double") / col("w_sum"), 6).as("target_share"),
          col("rate_bps"),
          coalesce(col("n_selected"), lit(0L)).as("n_selected"))
        .orderBy(col("lang"))
    }),

    // Dynamic quality gate: per-language 20th-percentile cutoff COMPUTED
    // FROM THE CORPUS (exact interpolated percentile over the e6-fixed-
    // point score), broadcast back as the filter threshold — the
    // two-stage "derive the threshold, then gate" shape every adaptive
    // filter uses (static thresholds rot as the corpus mix drifts). The
    // threshold table is one row per language (broadcast); the gate is
    // a map-side comparison. Integer-valued inputs keep Spark
    // percentile() and DuckDB quantile_cont() bit-identical (both
    // interpolate lower + (upper-lower)*frac in doubles).
    "curate_quality_gate" -> ((s, dir) => {
      val sc = scored(Tables.documents(s, dir).filter(col("text").isNotNull))
        .select(col("doc_id"), col("lang"), col("quality_e6"))
      val thr = sc.groupBy(col("lang"))
        .agg(expr("percentile(quality_e6, 0.2)").as("q20"))
      sc.join(broadcast(thr), "lang")
        .withColumn("keep",
          (col("quality_e6").cast("double") >= col("q20")).cast("int"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
             sum(col("keep")).cast("long").as("n_kept"),
             round(min(col("q20")), 6).as("q20"))
        .orderBy(col("lang"))
    }),

    // DSIR-style importance weights (Xie et al. 2023, "Data Selection
    // for Language Models via Importance Resampling"): score every doc
    // by how target-domain-like it is under hashed-n-gram bag models —
    // sum over the doc's hashed word-bigram features of
    // log P_target(b) − log P_raw(b), add-one smoothed over B=1024
    // buckets. The target domain here is one source (src1, standing in
    // for the curated exemplar corpus — Wikipedia in the paper); the
    // raw model is the whole corpus. Per-feature log-ratios are floored
    // to integer micros before the per-doc sum (exact long arithmetic,
    // oracle-bit-identical); md5-prefix bucketing is the cross-engine
    // hash idiom used by sample_stratified.
    // Scale: THIS is why DSIR uses hashed features — both count tables
    // are fixed at B rows regardless of corpus size, so they broadcast
    // at any scale; scoring is map-side against the broadcasts and the
    // only exchanges are the two count aggregations (map-side partial,
    // B-bounded) and the final doc_id re-agg.
    "curate_dsir_weights" -> ((s, dir) => {
      val B = 1024
      // split ONCE into a materialized column: element_at inside the
      // transform lambda gets no common-subexpression elimination, so an
      // inline split re-tokenizes per access — O(n²) per document
      val toks = col("__t")
      val feats = Tables.documentsSpread(s, dir)
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("__t"))
        .filter(size(toks) >= 2)
        .select(col("doc_id"), col("source"), explode(transform(
          sequence(lit(1), size(toks) - 1),
          i => conv(substring(md5(concat_ws(" ",
                 element_at(toks, i), element_at(toks, i + 1))), 1, 8), 16, 10)
               .cast("long") % B)).as("b"))
      // ONE aggregation pass trains BOTH models (conditional count);
      // totals derive from the B-row table, so the text is tokenized
      // exactly twice overall: once for counts, once for scoring. The
      // checkpoint pins the ≤B-row artifact so its three consumers
      // don't re-derive the feature stream.
      val counts = feats.groupBy(col("b")).agg(
          count(lit(1)).as("cr"),
          count(when(col("source") === "src1", 1)).as("ct"))
        .localCheckpoint()
      val totals = counts.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
      feats.join(broadcast(counts), Seq("b"))
        .crossJoin(broadcast(totals))
        .withColumn("lr", floor((
            log((col("ct") + 1.0) / (col("nt") + B)) -
            log((col("cr") + 1.0) / (col("nr") + B))) * 1e6 + 0.5).cast("long"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("int").as("n_feats"),
             sum(col("lr")).as("dsir_e6"))
        .withColumn("target_like", (col("dsir_e6") > 0).cast("int"))
        .orderBy(col("doc_id")).limit(200)
    }),

    // Trained Naive Bayes language classifier — the third in-engine
    // trained model (after the DSIR bag models and the bigram LM), and
    // the first with a real TRAIN/TEST protocol: docs split by the
    // deterministic hash-bps gate (80/20, the holdout idiom), hashed
    // word-unigram features (B=4096), Laplace-smoothed per-class
    // likelihoods + doc priors, integer-micro log scores (exact
    // cross-engine ties), argmax per test doc, confusion-matrix census.
    // Unlike ta_langid (a FIXED trigram heuristic) this LEARNS its
    // model from the corpus itself.
    // Scale: the model is ≤ B×L rows + L priors — bounded by the hash
    // width, NOT the corpus — so it broadcasts at any data size; one
    // training aggregation, one linear scoring pass (test tokens × L
    // with L = #languages ~ dozens). This is fastText-shape supervised
    // classification reduced to two groupBys and a broadcast join.
    // Honest-fixture note: the synthetic corpus draws every language
    // from ONE shared vocabulary (measured: per-lang top-word lists are
    // interchangeable), so the learned model correctly collapses to the
    // class prior and the confusion census shows majority-class
    // prediction — the spec asserts exactly that, which is the right
    // answer on signal-free data (a classifier that "won" here would be
    // leaking the label).
    "curate_nb_langid" -> ((s, dir) =>
      nbDocScores(s, dir).withColumn("rn", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(desc("score"), col("lang"))))
        .filter(col("rn") === 1)
        .withColumnRenamed("lang", "predicted")
        .groupBy(col("actual"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("actual"), col("predicted"))),

    // Margin-binned reliability census of the NB langid classifier —
    // the calibration audit a curation pipeline runs before trusting
    // a classifier's "confidence" as a filter threshold: bin test
    // docs by the top1−top2 log-score margin (an exact e6 integer —
    // no softmax, so the whole reliability table is
    // engine-deterministic) and report accuracy per bin. A trustable
    // score has accuracy rising with margin; on this signal-free
    // corpus the flat curve IS the right answer (the confusion-matrix
    // query's majority-class story, seen through calibration).
    // Shares the memoized doc-score table with curate_nb_langid —
    // the L-way token expansion runs once per (session, dir).
    "ml_margin_calibration" -> ((s, dir) => {
      val ranked = nbDocScores(s, dir).withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(desc("score"), col("lang"))))
      val top = ranked.filter(col("rn") === 1)
        .select(col("doc_id"), col("actual"),
                col("lang").as("predicted"), col("score").as("s1"))
      val second = ranked.filter(col("rn") === 2)
        .select(col("doc_id"), col("score").as("s2"))
      top.join(second, "doc_id")
        .withColumn("margin_e6", col("s1") - col("s2"))
        .withColumn("bin", least(lit(7L), expr("margin_e6 div 8000000")))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
             sum((col("predicted") === col("actual")).cast("long"))
               .as("n_correct"),
             min(col("margin_e6")).as("margin_min_e6"),
             max(col("margin_e6")).as("margin_max_e6"))
        .withColumn("acc_e6", expr("n_correct * 1000000 div n"))
        .orderBy(col("bin"))
    }),

    // Weighted reservoir sample (Efraimidis–Spirakis A-ES): each doc
    // draws key = ln(u)/w with u ∈ (0,1) a pure md5 function of doc_id
    // and w = n_chars; the top-k keys ARE a weighted-without-replacement
    // sample. Zero RNG state, layout-invariant, and re-runnable: the
    // same doc always draws the same key (the property a seeded
    // `rand()` loses under repartitioning). Plans as
    // TakeOrderedAndProject — each partition keeps its local top-50,
    // the driver merges 50·P candidate rows, the corpus never shuffles.
    "sample_weighted_reservoir" -> ((s, dir) =>
      graft.api.Graft.weightedReservoir(
          Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("n_chars")),
          "doc_id", "n_chars", k = 50)
        .select(col("rank"), col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("rank")))
  ) ++ Map[String, (SparkSession, String) => DataFrame](
    // C4-style heuristic filter census — the five document gates of the
    // C4/RealNews cleaning recipe (Raffel et al. 2020 §2.2), evaluated
    // per source as a pass-rate dashboard: ≥5 words; terminal
    // punctuation; no curly braces (code/JSON leakage); no "lorem
    // ipsum" (placeholder boilerplate); mean word length in [3, 10]
    // (gibberish gate). Every gate is a builtin string predicate inside
    // one codegen'd projection — no UDF, no regex backtracking (the
    // corpus splits on single spaces, the ta_* tokenization contract) —
    // and the word-length band compares exact integers cross-multiplied
    // (3·wc ≤ chars ≤ 10·wc), not a rounded mean. One aggregate to
    // |sources| rows; at 100 TB this is a pure map-side pass over the
    // text scan with a metadata-sized shuffle — the cheapest possible
    // shape for a full-corpus quality census.
    "curate_c4_heuristics" -> ((s, dir) => {
      val t = trim(col("text"))
      val toks = split(t, " ")
      Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
        .withColumn("wc", size(toks).cast("long"))
        .withColumn("nws", length(regexp_replace(t, " ", "")).cast("long"))
        .withColumn("f_words", (col("wc") >= 5).cast("long"))
        .withColumn("f_term", t.endsWith(".").or(t.endsWith("!"))
          .or(t.endsWith("?")).or(t.endsWith("\"")).cast("long"))
        .withColumn("f_brace",
          (!t.contains("{") && !t.contains("}")).cast("long"))
        .withColumn("f_lorem", (!lower(t).contains("lorem ipsum")).cast("long"))
        .withColumn("f_wordlen",
          (col("nws") >= col("wc") * 3 && col("nws") <= col("wc") * 10).cast("long"))
        .withColumn("f_all", (col("f_words") * col("f_term") * col("f_brace") *
          col("f_lorem") * col("f_wordlen") === 1).cast("long"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
             sum(col("f_words")).as("n_words_ok"),
             sum(col("f_term")).as("n_term_ok"),
             sum(col("f_brace")).as("n_brace_ok"),
             sum(col("f_lorem")).as("n_lorem_ok"),
             sum(col("f_wordlen")).as("n_wordlen_ok"),
             sum(col("f_all")).as("n_pass_all"))
        .withColumn("pass_e6", expr("n_pass_all * 1000000 div n_docs"))
        .orderBy(col("source"))
    })
  )

  def oracles: Map[String, String] = Map(
    "curate_mix_waterfill" ->
      """WITH stock AS (SELECT source,
        |    sum(len(string_split(text, ' ')))::BIGINT AS avail_tokens
        |  FROM documents WHERE text IS NOT NULL GROUP BY source),
        |k AS (SELECT count(*)::BIGINT AS k FROM stock),
        |f AS (SELECT source, avail_tokens,
        |    row_number() OVER (ORDER BY avail_tokens, source)::BIGINT AS j,
        |    coalesce(sum(avail_tokens) OVER (ORDER BY avail_tokens, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
        |      AS cum_prev
        |  FROM stock),
        |fc AS (SELECT f.*, k.k,
        |    CASE WHEN avail_tokens * (k - j + 1) <= 100000 - cum_prev
        |         THEN 1 ELSE 0 END::BIGINT AS capped
        |  FROM f CROSS JOIN k),
        |lvl AS (SELECT CASE WHEN sum(1 - capped) > 0
        |    THEN (100000 - sum(CASE WHEN capped = 1 THEN avail_tokens
        |                            ELSE 0 END)) // sum(1 - capped)
        |    ELSE 100000 END::BIGINT AS level FROM fc)
        |SELECT source, avail_tokens, capped,
        |  least(avail_tokens, level)::BIGINT AS allocated_tokens
        |FROM fc CROSS JOIN lvl ORDER BY source""".stripMargin,
    "curate_pack_fragmentation" ->
      """WITH d AS (SELECT source, doc_id,
        |    len(string_split(text, ' '))::BIGINT AS w
        |  FROM documents WHERE text IS NOT NULL
        |    AND len(string_split(text, ' ')) >= 1),
        |c AS (SELECT source, doc_id, w,
        |    coalesce(sum(w) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
        |      AS cumb FROM d),
        |g AS (SELECT source, count(*)::BIGINT AS n_docs,
        |    sum(w)::BIGINT AS n_tokens,
        |    sum((cumb // 2048 != (cumb + w - 1) // 2048)::INT)::BIGINT
        |      AS n_split_docs
        |  FROM c GROUP BY source)
        |SELECT source, n_docs, n_tokens, n_split_docs,
        |  ((n_tokens + 2047) // 2048)::BIGINT AS n_seqs,
        |  (n_split_docs * 1000000 // n_docs)::BIGINT AS frag_e6,
        |  ((n_tokens - ((n_tokens + 2047) // 2048 - 1) * 2048) * 1000000 // 2048)
        |    ::BIGINT AS last_fill_e6
        |FROM g ORDER BY source""".stripMargin,

    "curate_c4_heuristics" ->
      """WITH d AS (SELECT source, trim(text) AS t FROM documents
        |  WHERE text IS NOT NULL AND length(trim(text)) > 0),
        |f AS (SELECT source,
        |    len(string_split(t, ' '))::BIGINT AS wc,
        |    length(replace(t, ' ', ''))::BIGINT AS nws,
        |    (ends_with(t, '.') OR ends_with(t, '!') OR ends_with(t, '?')
        |      OR ends_with(t, '"'))::INT AS f_term,
        |    (NOT contains(t, '{') AND NOT contains(t, '}'))::INT AS f_brace,
        |    (NOT contains(lower(t), 'lorem ipsum'))::INT AS f_lorem
        |  FROM d),
        |g AS (SELECT source, (wc >= 5)::INT AS f_words, f_term, f_brace,
        |    f_lorem, (nws >= wc * 3 AND nws <= wc * 10)::INT AS f_wordlen
        |  FROM f),
        |h AS (SELECT source, f_words, f_term, f_brace, f_lorem, f_wordlen,
        |    (f_words * f_term * f_brace * f_lorem * f_wordlen = 1)::INT
        |      AS f_all FROM g)
        |SELECT source, count(*)::BIGINT AS n_docs,
        |  sum(f_words)::BIGINT AS n_words_ok, sum(f_term)::BIGINT AS n_term_ok,
        |  sum(f_brace)::BIGINT AS n_brace_ok, sum(f_lorem)::BIGINT AS n_lorem_ok,
        |  sum(f_wordlen)::BIGINT AS n_wordlen_ok,
        |  sum(f_all)::BIGINT AS n_pass_all,
        |  (sum(f_all)::BIGINT * 1000000 // count(*))::BIGINT AS pass_e6
        |FROM h GROUP BY source ORDER BY source""".stripMargin,

    "sample_weighted_reservoir" ->
      """WITH k AS (
        |  SELECT doc_id, lang, n_chars,
        |    ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT + 1)::DOUBLE
        |       / 4294967297.0) / n_chars AS key
        |  FROM documents WHERE n_chars > 0),
        |t AS (SELECT *, row_number() OVER (ORDER BY key DESC, doc_id) AS rank
        |  FROM k)
        |SELECT rank::BIGINT AS rank, doc_id, lang, n_chars
        |FROM t WHERE rank <= 50 ORDER BY rank""".stripMargin,
    "curate_top_p_nucleus" ->
      """WITH d AS (SELECT lang, doc_id, n_chars,
        |    ('0x' || substr(md5(text), 1, 8))::BIGINT AS score
        |  FROM documents WHERE text IS NOT NULL AND n_chars > 0),
        |r AS (SELECT lang, doc_id, n_chars,
        |    sum(n_chars) OVER (PARTITION BY lang ORDER BY score DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(n_chars) OVER (PARTITION BY lang) AS total FROM d),
        |k AS (SELECT * FROM r WHERE (cum - n_chars) * 10 < total * 9)
        |SELECT lang, count(*)::BIGINT AS n_kept,
        |  sum(n_chars)::BIGINT AS chars_kept,
        |  max(total)::BIGINT AS total_chars,
        |  floor(1000000 * sum(n_chars) / max(total) + 0.5)::BIGINT AS share_e6
        |FROM k GROUP BY lang ORDER BY lang""".stripMargin,
    "curate_rejection_sampling" ->
      """WITH d AS (SELECT doc_id, lang FROM documents),
        |bl AS (SELECT lang, count(*)::BIGINT AS n_l FROM d GROUP BY lang),
        |tot AS (SELECT sum(n_l)::BIGINT AS n, count(*)::BIGINT AS nl_langs
        |  FROM bl),
        |k AS (SELECT d.lang, bl.n_l,
        |    CASE WHEN ('0x' || substr(md5(d.doc_id::VARCHAR || ':rej'),
        |          1, 12))::BIGINT::DECIMAL(19,0)
        |        * ((SELECT nl_langs FROM tot) * bl.n_l)::DECIMAL(19,0)
        |      < (SELECT n FROM tot)::DECIMAL(19,0)
        |        * 281474976710656::DECIMAL(19,0)
        |      THEN 1 ELSE 0 END AS keep
        |  FROM d JOIN bl USING (lang)),
        |g AS (SELECT lang, max(n_l)::BIGINT AS n_before,
        |    sum(keep)::BIGINT AS n_kept FROM k GROUP BY lang),
        |kt AS (SELECT sum(n_kept)::BIGINT AS kept_total FROM g)
        |SELECT lang, n_before,
        |  least(1000000, (SELECT n FROM tot) * 1000000
        |    // ((SELECT nl_langs FROM tot) * n_before))::BIGINT AS p_e6,
        |  n_kept,
        |  (n_kept * 1000000 // (SELECT kept_total FROM kt))::BIGINT
        |    AS kept_share_e6
        |FROM g ORDER BY lang""".stripMargin,

    "curate_epoch_schedule" ->
      """WITH g AS (SELECT source,
        |    sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
        |  FROM documents WHERE text IS NOT NULL GROUP BY source),
        |tot AS (SELECT sum(n_tokens)::BIGINT AS tok_total FROM g),
        |w AS (SELECT source, n_tokens, tok_total,
        |    floor(sqrt(n_tokens::DOUBLE / tok_total) * 1e6 + 0.5)::BIGINT
        |      AS w_e6
        |  FROM g CROSS JOIN tot),
        |ws AS (SELECT sum(w_e6)::BIGINT AS w_sum FROM w),
        |a AS (SELECT source, n_tokens, w_e6,
        |    ((tok_total * 4 // w_sum) * w_e6
        |     + ((tok_total * 4 % w_sum) * w_e6) // w_sum)::BIGINT AS alloc_tokens
        |  FROM w CROSS JOIN ws),
        |e AS (SELECT source, n_tokens, w_e6, alloc_tokens,
        |    ((alloc_tokens // n_tokens) * 100
        |     + ((alloc_tokens % n_tokens) * 100) // n_tokens)::BIGINT AS epochs_e2
        |  FROM a)
        |SELECT source, n_tokens, w_e6, alloc_tokens, epochs_e2,
        |  (epochs_e2 > 400)::BIGINT AS flag_overfit
        |FROM e ORDER BY source""".stripMargin,

    "curate_temperature_mix" ->
      s"""WITH g AS (SELECT lang, count(*) AS n_docs,
         |    sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
         |  FROM documents GROUP BY lang),
         |tot AS (SELECT sum(n_tokens)::BIGINT AS tok_total,
         |    sum(n_docs)::BIGINT AS doc_total FROM g),
         |w AS (SELECT lang, n_docs, n_tokens, tok_total, doc_total,
         |    floor(sqrt(n_tokens::DOUBLE / tok_total) * 1e6 + 0.5)::BIGINT AS w_e6
         |  FROM g CROSS JOIN tot),
         |r AS (SELECT *, least(10000,
         |    floor(w_e6 * 1.0 / (SELECT sum(w_e6) FROM w) * doc_total
         |          * 10000.0 / n_docs)::BIGINT) AS rate_bps,
         |    (SELECT sum(w_e6) FROM w)::BIGINT AS w_sum FROM w),
         |sel AS (SELECT d.lang, count(*) AS n_selected
         |  FROM documents d JOIN r ON d.lang = r.lang
         |  WHERE $hashBpsSql < r.rate_bps GROUP BY d.lang)
         |SELECT r.lang, r.n_docs, r.n_tokens,
         |  round(r.n_tokens::DOUBLE / r.tok_total, 6) AS token_share,
         |  round(r.w_e6::DOUBLE / r.w_sum, 6) AS target_share,
         |  r.rate_bps, coalesce(sel.n_selected, 0)::BIGINT AS n_selected
         |FROM r LEFT JOIN sel ON r.lang = sel.lang
         |ORDER BY r.lang""".stripMargin,
    "sample_stratified" ->
      s"""SELECT lang, count(*) AS n_total,
         |count(*) FILTER (WHERE $hashBpsSql < $rateBpsSql) AS n_sampled
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "curate_holdout_split" ->
      s"""SELECT CASE WHEN $hashBpsSql < 9000 THEN 'train'
         |  WHEN $hashBpsSql < 9500 THEN 'val' ELSE 'test' END AS split,
         |count(*) AS n_docs,
         |sum(len(string_split(text, ' ')))::BIGINT AS sum_tokens,
         |sum(n_chars)::BIGINT AS sum_chars
         |FROM documents GROUP BY split ORDER BY split""".stripMargin,

    "curate_quota" ->
      s"""WITH t AS (SELECT doc_id, lang, md5(text) AS h,
         |    string_split(text, ' ') AS toks FROM documents),
         |scored AS (SELECT doc_id, lang, h, len(toks) AS n_tokens,
         |    CAST(floor(($qualitySql) * 1e6 + 0.5) AS BIGINT) AS quality_e6
         |  FROM t),
         |dd AS (SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS dup_rn
         |  FROM scored),
         |q AS (SELECT *, row_number() OVER (PARTITION BY lang
         |    ORDER BY quality_e6 DESC, doc_id) AS rn
         |  FROM dd WHERE dup_rn = 1)
         |SELECT lang, count(*) AS n_kept,
         |  sum(quality_e6)::BIGINT AS sum_quality_e6,
         |  sum(n_tokens)::BIGINT AS sum_tokens
         |FROM q WHERE rn <= 50 GROUP BY lang ORDER BY lang""".stripMargin,

    "curate_quality_gate" ->
      s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
         |  FROM documents WHERE text IS NOT NULL),
         |sc AS (SELECT doc_id, lang,
         |    CAST(floor(($qualitySql) * 1e6 + 0.5) AS BIGINT) AS q_e6 FROM t),
         |thr AS (SELECT lang, quantile_cont(q_e6, 0.2) AS q20 FROM sc GROUP BY lang),
         |k AS (SELECT sc.lang, (sc.q_e6 >= thr.q20)::INT AS keep, thr.q20
         |  FROM sc JOIN thr USING (lang))
         |SELECT lang, count(*) AS n_docs, sum(keep)::BIGINT AS n_kept,
         |  round(min(q20), 6) AS q20
         |FROM k GROUP BY lang ORDER BY lang""".stripMargin,

    "curate_decontaminate" ->
      """WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
        |ng AS (SELECT doc_id, lang, array_to_string(t[i:i+4], ' ') AS g
        |  FROM toks, unnest(range(1, greatest(len(t) - 3, 1))) AS u(i)),
        |bench AS (SELECT DISTINCT g FROM ng WHERE doc_id % 97 = 3),
        |corpus AS (SELECT doc_id, lang FROM documents WHERE doc_id % 97 <> 3),
        |cont AS (SELECT DISTINCT ng.doc_id, ng.lang FROM ng
        |  JOIN bench USING (g) WHERE ng.doc_id % 97 <> 3)
        |SELECT c.lang, count(*) AS n_docs,
        |  coalesce(any_value(k.n), 0)::BIGINT AS n_contaminated
        |FROM corpus c LEFT JOIN (
        |  SELECT lang, count(*) AS n FROM cont GROUP BY lang) k
        |  ON c.lang = k.lang
        |GROUP BY c.lang ORDER BY c.lang""".stripMargin,

    // identical arithmetic: md5-prefix bucket, add-one smoothing over
    // 1024 buckets, per-feature log-ratio floored to micros pre-sum
    "curate_dsir_weights" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
        |  FROM documents
        |  WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2),
        |f AS (SELECT doc_id, source,
        |  (('0x' || substr(md5(toks[i] || ' ' || toks[i+1]), 1, 8))::BIGINT % 1024) AS b
        |  FROM t, unnest(range(1, len(toks))) u(i)),
        |raw AS (SELECT b, count(*) AS cr FROM f GROUP BY b),
        |tgt AS (SELECT b, count(*) AS ct FROM f WHERE source = 'src1' GROUP BY b),
        |tot AS (SELECT count(*) AS nr,
        |  count(*) FILTER (WHERE source = 'src1') AS nt FROM f),
        |sc AS (SELECT f.doc_id,
        |  floor((ln((coalesce(ct, 0) + 1.0) / (nt + 1024)) -
        |         ln((cr + 1.0) / (nr + 1024))) * 1e6 + 0.5)::BIGINT AS lr
        |  FROM f JOIN raw USING (b) LEFT JOIN tgt USING (b) CROSS JOIN tot)
        |SELECT doc_id, count(*)::INT AS n_feats, sum(lr)::BIGINT AS dsir_e6,
        |  (sum(lr) > 0)::INT AS target_like
        |FROM sc GROUP BY doc_id ORDER BY doc_id LIMIT 200""".stripMargin,

    // NB train/score mirrored stage for stage; integer-micro log scores
    // make the argmax tie-exact across engines
    "curate_nb_langid" ->
      s"""WITH d AS (SELECT doc_id, lang, text,
         |    ($hashBpsSql < 8000) AS is_train
         |  FROM documents WHERE text IS NOT NULL),
         |tok AS (SELECT doc_id, lang, is_train,
         |    (('0x' || substr(md5(w), 1, 8))::BIGINT % 4096) AS b
         |  FROM d, unnest(string_split(text, ' ')) u(w) WHERE w <> ''),
         |cnt AS (SELECT b, lang, count(*) AS c FROM tok
         |  WHERE is_train GROUP BY b, lang),
         |tot AS (SELECT lang, count(*) AS t FROM tok
         |  WHERE is_train GROUP BY lang),
         |pri AS (SELECT lang, count(*) AS nd FROM d
         |  WHERE is_train GROUP BY lang),
         |pr AS (SELECT lang,
         |    floor(ln(nd / (SELECT sum(nd) FROM pri)) * 1e6 + 0.5)::BIGINT
         |      AS plr FROM pri),
         |sc AS (SELECT tt.doc_id, tt.lang AS actual, tot.lang AS cls,
         |    floor(ln((coalesce(cnt.c, 0) + 1.0) / (tot.t + 4096)) * 1e6
         |      + 0.5)::BIGINT AS lr
         |  FROM (SELECT * FROM tok WHERE NOT is_train) tt
         |  CROSS JOIN tot
         |  LEFT JOIN cnt ON cnt.b = tt.b AND cnt.lang = tot.lang),
         |agg AS (SELECT doc_id, actual, cls, sum(lr) AS ll
         |  FROM sc GROUP BY 1, 2, 3),
         |fin AS (SELECT doc_id, actual, cls, ll + plr AS score
         |  FROM agg JOIN pr ON pr.lang = agg.cls),
         |win AS (SELECT doc_id, actual, cls AS predicted,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, cls) AS rn FROM fin)
         |SELECT actual, predicted, count(*)::BIGINT AS n
         |FROM win WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Same NB model CTEs as curate_nb_langid; the tail reads the
    // top1−top2 margin instead of the argmax
    "ml_margin_calibration" ->
      s"""WITH d AS (SELECT doc_id, lang, text,
         |    ($hashBpsSql < 8000) AS is_train
         |  FROM documents WHERE text IS NOT NULL),
         |tok AS (SELECT doc_id, lang, is_train,
         |    (('0x' || substr(md5(w), 1, 8))::BIGINT % 4096) AS b
         |  FROM d, unnest(string_split(text, ' ')) u(w) WHERE w <> ''),
         |cnt AS (SELECT b, lang, count(*) AS c FROM tok
         |  WHERE is_train GROUP BY b, lang),
         |tot AS (SELECT lang, count(*) AS t FROM tok
         |  WHERE is_train GROUP BY lang),
         |pri AS (SELECT lang, count(*) AS nd FROM d
         |  WHERE is_train GROUP BY lang),
         |pr AS (SELECT lang,
         |    floor(ln(nd / (SELECT sum(nd) FROM pri)) * 1e6 + 0.5)::BIGINT
         |      AS plr FROM pri),
         |sc AS (SELECT tt.doc_id, tt.lang AS actual, tot.lang AS cls,
         |    floor(ln((coalesce(cnt.c, 0) + 1.0) / (tot.t + 4096)) * 1e6
         |      + 0.5)::BIGINT AS lr
         |  FROM (SELECT * FROM tok WHERE NOT is_train) tt
         |  CROSS JOIN tot
         |  LEFT JOIN cnt ON cnt.b = tt.b AND cnt.lang = tot.lang),
         |agg AS (SELECT doc_id, actual, cls, sum(lr) AS ll
         |  FROM sc GROUP BY 1, 2, 3),
         |fin AS (SELECT doc_id, actual, cls, ll + plr AS score
         |  FROM agg JOIN pr ON pr.lang = agg.cls),
         |win AS (SELECT doc_id, actual, cls, score,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, cls) AS rn FROM fin),
         |t1 AS (SELECT doc_id, actual, cls AS predicted, score AS s1
         |  FROM win WHERE rn = 1),
         |t2 AS (SELECT doc_id, score AS s2 FROM win WHERE rn = 2),
         |mg AS (SELECT t1.doc_id, (predicted = actual)::INT AS ok,
         |    s1 - s2 AS margin_e6, least(7, (s1 - s2) // 8000000) AS bin
         |  FROM t1 JOIN t2 ON t1.doc_id = t2.doc_id)
         |SELECT bin::BIGINT AS bin, count(*)::BIGINT AS n,
         |  sum(ok)::BIGINT AS n_correct,
         |  min(margin_e6)::BIGINT AS margin_min_e6,
         |  max(margin_e6)::BIGINT AS margin_max_e6,
         |  (sum(ok) * 1000000 // count(*))::BIGINT AS acc_e6
         |FROM mg GROUP BY bin ORDER BY bin""".stripMargin
  )
}
