package graft.api

import graft.functions.{SortedIntersectCount, TextSignatures, VectorFns}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Public library facade: the engine's operators as reusable functions
  * over caller-supplied DataFrames (the `SparkEntry.queries` registry
  * binds these same operators to the driver testdata; a user of the
  * reference pipeline switches by calling these on their own tables).
  *
  * Column-name contracts are documented per method; every operator is a
  * lazy plan — composable, optimizer-visible, nothing executes until an
  * action.
  */
object Graft {

  // ---- transcript (reference transcription.py semantics) -----------

  /** W1: merge consecutive same-speaker segments per file.
    * In: (file_id, seg_idx, spk_start, spk_end, speaker).
    * Out: (file_id, island, speaker, isl_start, isl_end). */
  def coalesceSpeakerIslands(segments: DataFrame): DataFrame =
    graft.operators.TranscriptOps.islands(segments)

  /** J1: consume-prefix as-of alignment of transcript chunks to speaker
    * segments (exact reference-loop semantics).
    * In: segments as above; chunks (file_id, chunk_idx, text, t_start,
    * t_end, confidence). Out: (file_id, utt_idx, speaker, text,
    * t_start, t_end, confidence). */
  def alignTranscript(segments: DataFrame, chunks: DataFrame): DataFrame =
    graft.operators.TranscriptOps.align(segments, chunks)

  /** K2: render aligned utterances as "[start-end] SPEAKER: text". */
  def renderDialogue(utterances: DataFrame): Column =
    format_string("[%.2f-%.2f] %s: %s",
      col("t_start"), col("t_end"), col("speaker"), col("text"))

  // ---- dedup (north-star) ------------------------------------------

  /** Exact content dedup: keep the first row per distinct `textCol`. */
  def dedupExact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact-substring duplicated-span scoring (Lee et al. 2022
    * "ExactSubstr", re-expressed relationally): score each doc by the
    * fraction of its tokens covered by word spans repeated VERBATIM
    * (≥ minFreq occurrences corpus-wide, within-doc repeats included),
    * seeded by k-token grams and merged to maximal spans. Out:
    * (idCol, n_tokens, dup_tokens, n_spans, dup_frac), unrounded.
    *
    * Scale: the frequency pass shuffles only 8-byte FNV digests — text
    * never moves, and no pair join exists anywhere (frequency, not
    * pairing, is the unit, so there is no n²); span merge is one lag
    * window per doc (fixed k + strictly increasing positions ⇒ the
    * overlap test is `pos ≤ lag(pos)+k−1`, no running-max state).
    * The gram scan runs TWICE (frequency side + probe side) by
    * deliberate choice: a (id, pos, digest) row is ~16 B/token, so a
    * materialization barrier would exchange roughly corpus-scale bytes
    * to save one map-side rescan — the same trade the BPE d0 scan makes
    * (rescans are pure scan throughput; barriers are network+disk). The
    * dup-seed membership join carries NO broadcast hint: locally the
    * df≥minFreq set broadcasts; at 100 TB the planner degrades it to a
    * digest-keyed shuffled semi join automatically — still no text
    * movement. Parallelism comes from the caller's layout — spread
    * CPU-heavy single-file corpora before calling
    * (Tables.documentsSpread rationale). */
  def exactSubstringDups(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 5, minFreq: Int = 2): DataFrame = {
    require(k >= 2, "k must be >= 2")
    require(minFreq >= 2, "minFreq must be >= 2")
    val base = docs.filter(col(textCol).isNotNull)
    val spans = exactSubstringSpanBounds(base, idCol, textCol, k, minFreq)
      .groupBy(col("__id"))
      .agg(sum(col("hi") - col("lo") + 1).cast("long").as("dup_tokens"),
           count(lit(1)).cast("int").as("n_spans"))
    base.select(col(idCol).as("__id"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .join(spans, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("n_spans"), lit(0)).as("n_spans"),
        (coalesce(col("dup_tokens"), lit(0L)).cast("double") / col("n_tokens"))
          .as("dup_frac"))
  }

  /** Maximal duplicated-span bounds per doc: (__id, lo, hi) in 1-based
    * token positions, spans already merged (disjoint). The k-gram
    * seeding of [[exactSubstringDups]]: every k-gram with corpus
    * frequency ≥ minFreq marks positions pos..pos+k-1 as duplicated;
    * overlapping marks coalesce under one lag + running-sum window
    * after the single doc_id exchange. Shuffles carry only (digest) and
    * (id, pos) rows — never text, never pairs. */
  private[graft] def exactSubstringSpanBounds(docs: DataFrame, idCol: String,
      textCol: String, k: Int, minFreq: Int): DataFrame = {
    val grams = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__id"),
        posexplode(TextSignatures.wordNgramPosHashes(col(textCol), k)))
      .select(col("__id"), (col("pos") + 1).as("pos"), col("col").as("g"))
    val dup = grams.groupBy(col("g")).agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq).select(col("g"))
    val w = Window.partitionBy(col("__id")).orderBy(col("pos"))
    grams.join(dup, Seq("g"), "left_semi")
      .withColumn("__new", (col("pos") >
        coalesce(lag(col("pos"), 1).over(w), lit(Int.MinValue)) + (k - 1)).cast("int"))
      .withColumn("__span", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("__id"), col("__span"))
      .agg(min(col("pos")).as("lo"), (max(col("pos")) + (k - 1)).as("hi"))
      .select(col("__id"), col("lo"), col("hi"))
  }

  /** The CUT stage of Lee et al. ExactSubstr: REMOVE every token
    * covered by a duplicated span (the span table of
    * [[exactSubstringDups]]), returning the input rows with `outCol` =
    * the cleaned text and `n_kept` = its surviving token count
    * (counted on the token ARRAY, so a lone empty token — text "" —
    * counts 1, matching `split` semantics on both engines). Docs with
    * no duplicated span pass through verbatim.
    * Scale: the span table is bounded by duplicated-gram volume (tiny
    * vs the corpus), collected per doc (spans are disjoint and merged,
    * so per-doc cardinality is small by construction) and joined back
    * on the same doc_id key; the cut itself is one map-side
    * higher-order filter over the token array — no new shuffle beyond
    * the score pass's own. */
  def exactSubstringCut(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 5, minFreq: Int = 2,
                        outCol: String = "clean_text"): DataFrame = {
    require(k >= 2, "k must be >= 2")
    require(minFreq >= 2, "minFreq must be >= 2")
    require(!docs.columns.contains("__spans") && !docs.columns.contains("__id"),
      "docs must not carry __spans/__id columns")
    val base = docs.filter(col(textCol).isNotNull)
    val spans = exactSubstringSpanBounds(base, idCol, textCol, k, minFreq)
      .groupBy(col("__id"))
      .agg(sort_array(collect_list(struct(col("lo"), col("hi")))).as("__spans"))
    base.join(spans.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .withColumn("__spans",
        coalesce(col("__spans"), array().cast("array<struct<lo:int,hi:int>>")))
      .withColumn("__kept", filter(split(col(textCol), " "), (_, i) =>
        !exists(col("__spans"), sp =>
          (i + 1) >= sp.getField("lo") && (i + 1) <= sp.getField("hi"))))
      .withColumn(outCol, concat_ws(" ", col("__kept")))
      .withColumn("n_kept", size(col("__kept")))
      .drop("__spans", "__kept")
  }

  /** Candidate pairs within equal-key buckets, with a hot-bucket cap:
    * buckets at or below `maxBucketSize` members emit ALL ordered pairs
    * (a_id < b_id); larger ones fall back to a STAR around the bucket's
    * min id — O(B) candidates instead of O(B²). The adversarial case
    * this bounds: a viral duplicate (millions of byte-identical docs →
    * one hot LSH band) would otherwise go quadratic inside its bucket
    * at 100 TB. Hot buckets arise precisely from (near-)identical
    * content, so the star keeps every true member connected to the
    * representative — which is all downstream cluster resolution needs;
    * pair-level completeness inside the hot bucket is the explicit
    * trade for linear work. One exchange on the bucket key feeds the
    * size/representative window; the normal-bucket self-join reads the
    * same partitioning (reused exchange, co-partitioned join — no
    * second shuffle of the bucket table). */
  private[graft] def cappedBucketPairs(items: DataFrame, bucketCols: Seq[String],
      idCol: String, maxBucketSize: Int,
      carryCols: Seq[String] = Nil): DataFrame = {
    require(maxBucketSize >= 2, "maxBucketSize must be >= 2")
    val w = Window.partitionBy(bucketCols.map(col): _*)
    // carryCols ride along as <c>_a/<c>_b on each emitted pair (payload
    // functionally determined by the id, e.g. a signature) so callers
    // verify inline instead of re-joining the source per side; the
    // star's representative payload comes off the same window (min_by).
    // PINNED (r15 opt, guide §2.4): `tagged` feeds THREE consumers (the
    // self-join's a/b sides + the hot-bucket star path). AQE turns the
    // self-join into a broadcast join whose build side cannot reuse the
    // probe side's exchange, so un-pinned each consumer replayed the
    // full items lineage — for dedup_simhash that meant computing the
    // corpus SimHash three times (3 parquet scans in the before-plan).
    // The checkpoint materializes the windowed relation once; it is
    // |items|-sized but narrow (ids + bucket keys + carried signatures),
    // the same storage class as the session's memoized exchanges.
    val tagged = carryCols.foldLeft(items
        .withColumn("__bn", count(lit(1)).over(w))
        .withColumn("__rep", min(col(idCol)).over(w))) { (df, c) =>
      df.withColumn(s"__rep_$c", min_by(col(c), col(idCol)).over(w))
    }.localCheckpoint(false)
    val normal = tagged.filter(col("__bn") <= maxBucketSize)
    val candNormal = normal.as("a").join(normal.as("b"),
        (bucketCols.map(c => col(s"a.$c") === col(s"b.$c")) :+
          (col(s"a.$idCol") < col(s"b.$idCol"))).reduce(_ && _))
      .select(col(s"a.$idCol").as("a_id") +: col(s"b.$idCol").as("b_id") +:
        carryCols.flatMap(c => Seq(
          col(s"a.$c").as(s"${c}_a"), col(s"b.$c").as(s"${c}_b"))): _*)
    val candHot = tagged
      .filter(col("__bn") > maxBucketSize && col(idCol) =!= col("__rep"))
      .select(col("__rep").as("a_id") +: col(idCol).as("b_id") +:
        carryCols.flatMap(c => Seq(
          col(s"__rep_$c").as(s"${c}_a"), col(c).as(s"${c}_b"))): _*)
    candNormal.union(candHot).distinct()
  }

  /** MinHash+LSH near-dup pairs with exact-Jaccard verification.
    * In: docs(idCol, textCol). Out: (a_id, b_id, jaccard ≥ minJaccard).
    * `maxBandSize` caps hot-band candidate generation
    * ([[cappedBucketPairs]]): above it a band degrades from all-pairs
    * to a star around its min id. */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      minJaccard: Double = 0.5, hashes: Int = 12,
                      bands: Int = 6, maxBandSize: Int = 4096): DataFrame = {
    require(hashes % bands == 0, "bands must divide hashes")
    val rows = hashes / bands
    val mh = docs
      .filter(size(split(col(textCol), " ")) >= 2) // shingle-less docs can't near-dup
      .select(col(idCol).as("doc_id"),
        TextSignatures.minHashSig(TextSignatures.wordBigrams(col(textCol)), hashes).as("mhs"))
      .repartition(col("doc_id"))
    val bandCols = (0 until bands).map { k =>
      concat((lit(s"$k:") +: (0 until rows).map(r =>
        element_at(col("mhs"), k * rows + r + 1))): _*)
    }
    val banded = mh.select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
    val cand = cappedBucketPairs(banded, Seq("band"), "doc_id", maxBandSize)
    val sh = docs.select(col(idCol).as("doc_id"),
        TextSignatures.wordBigramHashes(col(textCol)).as("bg"))
      .repartition(col("doc_id"))
    val inter = SortedIntersectCount.sortedIntersectCountLong(col("bg_a"), col("bg_b"))
    cand
      .join(sh.select(col("doc_id").as("a_id"), col("bg").as("bg_a")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("bg").as("bg_b")), "b_id")
      .withColumn("jaccard",
        inter.cast("double") / (size(col("bg_a")) + size(col("bg_b")) - inter))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** SimHash near-dup pairs (multi-index hamming blocking, lossless for
    * maxHamming ≤ 3 over the 4 signature bytes — ONLY while every
    * (bpos,bval) bucket stays under `maxBandSize`; the default leaves
    * buckets uncapped to keep the guarantee). A byte bucket colliding
    * does NOT imply similarity (unlike an LSH band), and the key space
    * is just 4×256, so past ~1M docs buckets fill with heterogeneous
    * non-duplicates and a capped star would drop true pairs. At that
    * scale use [[simhash64NearDups]]: same pigeonhole over 4×16-bit
    * chunks (65536 values each), which keeps buckets duplicate-
    * dominated ~256× longer for the same candidate bound. */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3,
                      maxBandSize: Int = Int.MaxValue): DataFrame = {
    require(maxHamming <= 3, "byte multi-index is lossless only for hamming <= 3")
    val sh = docs.select(col(idCol).as("doc_id"),
        TextSignatures.simHash32(col(textCol)).as("simhash"))
      .repartition(col("doc_id"))
    val probes = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("bpos"),
               expr(s"cast((simhash >> ${8 * b}) & 255 as int)").as("bval"))): _*)).as("p"))
      .select(col("doc_id"), col("simhash"),
              col("p.bpos").as("bpos"), col("p.bval").as("bval"))
    // capped candidates with the signatures carried through the pair
    // generation (the byte buckets only SEED; bit_count decides) — no
    // per-side re-join of the signature table
    cappedBucketPairs(probes, Seq("bpos", "bval"), "doc_id", maxBandSize,
        carryCols = Seq("simhash"))
      .select(col("a_id"), col("b_id"),
              expr("bit_count(simhash_a ^ simhash_b)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** 64-bit SimHash near-dup pairs — the scale path of
    * [[simhashNearDups]]. Multi-index blocking on the 4 16-bit chunks
    * of the signature: hamming ≤ 3 bit errors touch at most 3 chunks,
    * so by pigeonhole every qualifying pair agrees on ≥ 1 chunk —
    * lossless, same argument as the byte index, but each chunk position
    * has 65536 bucket values instead of 256, so buckets stay duplicate-
    * dominated into the hundreds of millions of docs per block (avg
    * bucket = N/65536 per position). Uncapped by default for the same
    * reason as the 32-bit variant: chunk collision does not imply
    * similarity, so a star fallback costs recall — the wider key space
    * IS the work bound. */
  def simhash64NearDups(docs: DataFrame, idCol: String, textCol: String,
                        maxHamming: Int = 3,
                        maxBandSize: Int = Int.MaxValue): DataFrame = {
    require(maxHamming <= 3, "chunk multi-index is lossless only for hamming <= 3")
    val sh = docs.select(col(idCol).as("doc_id"),
        TextSignatures.simHash64(col(textCol)).as("simhash"))
      .repartition(col("doc_id"))
    val probes = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("cpos"),
               expr(s"cast((simhash >> ${16 * c}) & 65535 as int)").as("cval"))): _*)).as("p"))
      .select(col("doc_id"), col("simhash"),
              col("p.cpos").as("cpos"), col("p.cval").as("cval"))
    cappedBucketPairs(probes, Seq("cpos", "cval"), "doc_id", maxBandSize,
        carryCols = Seq("simhash"))
      .select(col("a_id"), col("b_id"),
              expr("bit_count(simhash_a ^ simhash_b)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  // ---- retrieval (north-star + reference faiss semantics) ----------

  /** V3: exact cosine top-k. queries(qid, qvec ARRAY<FLOAT|DOUBLE>),
    * corpus(vec_id, embedding). Query set is broadcast. */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // norms are computed once per row BEFORE the join — folded into the
    // per-pair score expression they would be re-evaluated once per
    // (query, corpus) pair after Catalyst collapses the projection
    val c = corpus.select(col("vec_id"), VectorFns.asDouble(col("embedding")).as("v"))
      .withColumn("v_norm", VectorFns.l2Norm(col("v")))
      .repartition(col("vec_id")) // materialization barrier
    val q = queries.select(col("qid"), VectorFns.asDouble(col("qvec")).as("qv"))
      .withColumn("q_norm", VectorFns.l2Norm(col("qv")))
    c.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("score",
        VectorFns.dot(col("qv"), col("v")) / (col("q_norm") * col("v_norm")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("score"), col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("score"))
  }

  /** ANN top-k via seeded multi-table sign-random-projection LSH with
    * multi-probe (own bucket + nearest-flip bucket per table) —
    * approximate; recall trades against table/bit counts, fixed here by
    * the engine-wide seeded planes (see RetrievalOps.lshPlanes).
    * In: queries (qid, qvec), corpus (vec_id, embedding). */
  def annTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id"), VectorFns.asDouble(col("embedding")).as("v"))
    val q = queries.select(col("qid"), VectorFns.asDouble(col("qvec")).as("qv"))
    graft.operators.RetrievalOps.lshScoredCandidates(q, c)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("score"), col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("score"))
  }

  /** L2-normalize an array column (adds unit-norm `outCol`). */
  def l2Normalize(df: DataFrame, vecCol: String, outCol: String): DataFrame =
    df.withColumn("__norm", VectorFns.l2Norm(VectorFns.asDouble(col(vecCol))))
      .withColumn(outCol,
        VectorFns.l2NormalizeBy(VectorFns.asDouble(col(vecCol)), col("__norm")))
      .drop("__norm")

  // ---- events ------------------------------------------------------

  /** Gap-based sessionization. In: (keyCol, tsCol timestamp, ordCol).
    * Out: per-session (keyCol, session_id, n_events, session_start,
    * session_end). */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 ordCol: String, gapSeconds: Long = 1800): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(ordCol))
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(byKey))
      .withColumn("__new",
        when(col("__prev").isNull ||
             unix_micros(col(tsCol)) - unix_micros(col("__prev")) > gapSeconds * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("__new")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
           min(col(tsCol)).as("session_start"),
           max(col(tsCol)).as("session_end"))
  }

  /** Type-1 CDC apply (last-writer-wins snapshot with deletes): change
    * rows totally ordered per key by (tsCol, ordCol); rows whose opCol
    * is "D" delete the key, anything else upserts it. Out: the
    * surviving latest change row per key, original columns intact.
    * One shuffle on the key — the SCD1 complement of [[scd2]]. */
  def cdcApply(changes: DataFrame, keyCol: String, tsCol: String,
               ordCol: String, opCol: String): DataFrame = {
    require(!changes.columns.contains("__rn"), "input must not carry __rn")
    val latest = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(ordCol).desc)
    changes.withColumn("__rn", row_number().over(latest))
      .filter(col("__rn") === 1 && col(opCol) =!= "D")
      .drop("__rn")
  }

  /** Additive incremental materialized-view merge: prev MV state and a
    * delta partial-aggregate, both keyed by keyCols and carrying the
    * SAME additive counter columns (counts, exact integer sums),
    * combine by per-key addition — refresh cost O(delta), never a
    * history rescan. Non-additive aggregates need mergeable sketches
    * instead; this facade is deliberately restricted to the additive
    * contract it can guarantee. */
  def mvMerge(prev: DataFrame, delta: DataFrame, keyCols: Seq[String],
              counterCols: Seq[String]): DataFrame = {
    val proj = (keyCols ++ counterCols).map(col)
    val aggs = counterCols.map(c => sum(col(c)).as(c))
    prev.select(proj: _*).unionByName(delta.select(proj: _*))
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Morton (Z-order) interleave of the low 16 bits of two non-negative
    * long columns: `a`'s bits land at odd positions, `b`'s at even.
    * Sorting/range-bucketing by the result co-locates rows close in
    * EITHER dimension — the clustering value behind min/max pruning on
    * two predicates from one sort order (Delta/Iceberg ZORDER). */
  def zOrderValue(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)

  /** k-anonymity suppression census: group by the quasi-identifier
    * columns; groups with fewer than k members collapse into a single
    * all-'*' bucket so no released row describes fewer than k
    * individuals. Mass-conserving (suppressed counts are summed, not
    * dropped); quasi-identifier columns must be strings. */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    val census = df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("n"))
    val kept = census.filter(col("n") >= k)
    val suppressed = census.filter(col("n") < k)
      .agg(sum(col("n")).as("n"))
      .select(quasiCols.map(_ => lit("*")) :+ col("n"): _*)
      .toDF(quasiCols :+ "n": _*)
      .filter(col("n").isNotNull)
    kept.unionByName(suppressed)
  }

  /** t-closeness audit over an ORDINAL sensitive column: per
    * quasi-identifier group, the Earth Mover's Distance between the
    * group's sensitive-value distribution and the global one, as the
    * mean absolute CDF gap Σ|F_g − F| / (m−1). Exact integers until
    * the final division; the `close` flag compares num·denomFrac
    * integers, so the t = num/den gate has no FP in the verdict.
    * In: df + quasi cols + an integer-valued sensitive column.
    * Out: (quasi..., n, t_num, emd, close). */
  def tClosenessAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String,
                      tNum: Int = 1, tDen: Int = 5): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(tNum >= 0 && tDen > 0)
    val qs = quasiCols.map(col)
    val d = df.select(qs :+ col(sensitiveCol).cast("long").as("__band"): _*)
    val bands = d.groupBy(col("__band")).agg(count(lit(1)).as("__nb"))
    val bandsCum = bands
      // single-partition window is bounded: |distinct sensitive bands|
      // rows — a value histogram, not the table
      .withColumn("__cum_all",
        sum(col("__nb")).over(Window.orderBy(col("__band"))))
      .crossJoin(broadcast(bands.agg(sum(col("__nb")).as("__n_total"),
                                     count(lit(1)).as("__m"))))
      .select(col("__band"), col("__cum_all"), col("__n_total"), col("__m"))
    val groups = d.groupBy(qs: _*).agg(count(lit(1)).as("__n_g"))
    val gb = d.groupBy(qs :+ col("__band"): _*).agg(count(lit(1)).as("__c_gb"))
    val grid = groups.crossJoin(broadcast(bandsCum))
      .join(gb, quasiCols :+ "__band", "left")
      .withColumn("__cum_g", sum(coalesce(col("__c_gb"), lit(0L))).over(
        Window.partitionBy(qs: _*).orderBy(col("__band"))))
    grid.groupBy(qs: _*)
      .agg(max(col("__n_g")).as("n"),
           sum(abs(col("__cum_g") * col("__n_total") -
                   col("__cum_all") * col("__n_g"))).as("t_num"),
           max(col("__m")).as("__m"), max(col("__n_total")).as("__n_total"))
      .select(qs ++ Seq(col("n"), col("t_num"),
        when(col("__m") > 1, round(col("t_num").cast("double") /
            (col("n") * col("__n_total") * (col("__m") - 1)).cast("double"), 6))
          .otherwise(lit(0.0)).as("emd"),
        when(col("__m") > 1,
             (col("t_num") * tDen <=
              col("n") * col("__n_total") * (col("__m") - 1) * tNum).cast("int"))
          .otherwise(lit(1)).as("close")): _*)
  }

  /** Two-phase salted aggregation for skewed grouping keys: counts per
    * (key, salt) first — spreading one hot key over `salts` reducers —
    * then sums the partials. Identical result to `groupBy(key).count()`;
    * use when one key dominates (AQE handles skewed JOINS at runtime,
    * but a skewed AGGREGATION key still funnels into one partial-agg
    * reducer without salting). `saltSource` must be any column that
    * varies within a key (an id, a timestamp). */
  def saltedCount(df: DataFrame, keyCol: String, saltSource: String,
                  salts: Int = 16): DataFrame =
    df.groupBy(col(keyCol), pmod(hash(col(saltSource)), lit(salts)).as("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("count"))

  // ---- text analysis -----------------------------------------------

  /** Whitespace token stats and the canonical composite quality score
    * ([[graft.functions.TextMetrics.quality]] — the same formula
    * curate_quota selects on). */
  def qualityScore(docs: DataFrame, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    docs
      .withColumn("n_tokens", size(toks))
      .withColumn("distinct_ratio",
        size(array_distinct(toks)).cast("double") / size(toks))
      .withColumn("stopword_ratio",
        size(filter(toks, t => t.isin("the", "a"))).cast("double") / size(toks))
      .withColumn("quality", graft.functions.TextMetrics.quality(toks))
  }

  /** Order-insensitive bag-of-words content fingerprint. */
  def fingerprint(textCol: Column): Column =
    md5(array_join(array_sort(array_distinct(split(textCol, " "))), " "))

  // ---- cleaning ----------------------------------------------------

  /** Email/phone patterns in the Java∩RE2 dialect (Spark and DuckDB
    * match identically) — shared by [[redactPii]] and the
    * `clean_redact_pii` oracle. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** C4/CCNet-style corpus-frequency boilerplate removal at fixed
    * `chunkWords`-word chunk granularity: any chunk whose exact text
    * occurs ≥ `minCount` times across the corpus is dropped from EVERY
    * document; the survivors reassemble in order. Returns (idCol,
    * n_kept_chunks, cleanCol); documents whose every chunk is
    * boilerplate drop entirely.
    * Scale: chunking is map-side; the frequency pass shuffles md5
    * digests, never text; the repeated-chunk set is small by
    * construction → broadcast anti-join; one final per-doc groupBy. */
  def removeBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                        chunkWords: Int = 10, minCount: Long = 2,
                        cleanCol: String = "clean_text"): DataFrame = {
    val chunks = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("__pos", "__w")))
      .groupBy(col(idCol), expr(s"__pos div $chunkWords").as("__cidx"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("__pos"), col("__w")))),
        x => x.getField("__w")), " ").as("__chunk"))
    val boiler = chunks.groupBy(md5(col("__chunk")).as("__h"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minCount).select(col("__h"))
    chunks.join(broadcast(boiler), md5(col("__chunk")) === col("__h"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept_chunks"),
        array_join(transform(array_sort(collect_list(struct(col("__cidx"), col("__chunk")))),
          x => x.getField("__chunk")), " ").as(cleanCol))
  }

  /** Email/phone redaction: adds `n_emails`/`n_phones` match counts and
    * `outCol` with matches replaced by <EMAIL>/<PHONE>. Pure map-side
    * regexp — no shuffle at any scale. */
  def redactPii(df: DataFrame, textCol: String, outCol: String = "redacted"): DataFrame =
    df.withColumn("n_emails",
        size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0))).cast("long"))
      .withColumn("n_phones",
        size(regexp_extract_all(col(textCol), lit(PhonePattern), lit(0))).cast("long"))
      .withColumn(outCol,
        regexp_replace(regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
                       PhonePattern, "<PHONE>"))

  // ---- curation ----------------------------------------------------

  /** Deterministic hash sample: keeps a row iff its md5(idCol)-derived
    * basis points fall under `rateBps` (a per-row Column, e.g. a CASE
    * over a stratum column for stratified rates, or `lit(500)` for a
    * flat 5%). Selection is a pure function of the row — layout- and
    * retry-invariant, unlike `df.sample()`'s partition-dependent RNG —
    * and a map-side-only predicate: zero shuffle at any scale. */
  def sampleDeterministic(df: DataFrame, idCol: String, rateBps: Column): DataFrame =
    df.filter(graft.functions.TextMetrics.hashBps(col(idCol)) < rateBps)

  /** Quality-quota curation: exact dedup (keep first id per content),
    * then each stratum's top `k` rows by (`scoreCol` desc, idCol).
    * One window shuffle per stage; strata (languages, sources) are
    * low-cardinality so the quota window partitions stay wide. */
  def curateQuota(docs: DataFrame, idCol: String, textCol: String,
                  stratumCol: String, scoreCol: String, k: Int): DataFrame =
    dedupExact(docs, idCol, textCol)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(stratumCol))
          .orderBy(desc(scoreCol), col(idCol))))
      .filter(col("__rn") <= k).drop("__rn")

  /** BM25 ranking of documents against a query set (k1 = 1.2, b = 0.75).
    * In: docs(idCol, textCol), queries(qid, qtext) — whitespace
    * tokenization on both. Out: (qid, rank, doc_id, score_e12), top-k
    * per query. Same determinism discipline as `retrieval_bm25_topk`:
    * postings are restricted to the (broadcast) query vocabulary before
    * any statistics work, and per-term weights are integer-quantized
    * BEFORE the per-document sum, so ranking is reproducible under any
    * shuffle order. */
  def bm25Rank(docs: DataFrame, queries: DataFrame, k: Int,
               idCol: String = "doc_id", textCol: String = "text",
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val d = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
    bm25RankFromPostings(
      d.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")),
      d.select(col("doc_id"), size(split(col("text"), " ")).as("dl")),
      queries, k, k1, b)
  }

  /** [[bm25Rank]] over a PRE-BUILT posting table (doc_id, term, tf) and
    * doc-length table (doc_id, dl) — the query-INDEPENDENT halves of
    * BM25, which the retrieval family session-memoizes the way the
    * graph family shares its edge exchange: tokenize + term-count the
    * corpus once, then every ranked query (bm25_topk, two_stage,
    * hybrid_rrf, chunk_maxp, PRF's two passes) is a broadcast-vocab
    * probe of the posting table. At 100 TB the memo IS the inverted
    * index build. tf values are exact counts, so filtering the full
    * posting table to the query vocabulary afterward is value-identical
    * to counting only query terms (the pre-refactor form). */
  def bm25RankFromPostings(postings: DataFrame, lens: DataFrame,
      queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val q = queries.select(col("qid"), explode(split(col("qtext"), " ")).as("term"))
    val dl = lens
    val stats = dl.agg(sum(col("dl")).as("sumdl"), count(lit(1)).as("n"))
      .select((col("sumdl").cast("double") / col("n").cast("double")).as("avgdl"),
              col("n"))
    val tf = postings.join(broadcast(q.select("term").distinct()), "term")
      .select(col("doc_id"), col("term"), col("tf").cast("double").as("tf"))
    val idf = tf.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).cast("double").as("df"))
      .crossJoin(broadcast(stats.select(col("n"))))
      .select(col("term"),
        floor(log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) * 1e6 + 0.5)
          .as("idf_e6"))
    tf.join(broadcast(q), "term")
      .join(broadcast(idf), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats.select(col("avgdl"))))
      .withColumn("w_e12", col("idf_e6") *
        floor(col("tf") * lit(k1 + 1.0) /
                (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))) *
              1e6 + 0.5))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("w_e12")).as("score_e12"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("score_e12").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("doc_id"), col("score_e12"))
  }

  /** Benchmark decontamination: ids of corpus docs sharing at least one
    * word-n-gram with any benchmark doc (the verbatim-leakage filter a
    * training corpus runs against its eval sets). The benchmark's
    * distinct n-gram set is eval-set-sized → broadcast; the corpus side
    * is a left-semi probe, so nothing corpus-scale ever shuffles. Drop
    * the returned ids with a left-anti join. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int = 5,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val grams = TextSignatures.wordNgramHashes(col(textCol), n)
    val benchGrams = benchmark.filter(col(textCol).isNotNull)
      .select(explode(grams).as("g")).distinct()
    corpus.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(grams).as("g"))
      .join(broadcast(benchGrams), Seq("g"), "left_semi")
      .select(col(idCol)).distinct()
  }

  /** Connected components over an undirected pair list via iterative
    * min-label propagation: returns (id, cluster_id) for every node in a
    * pair, cluster_id = min member id. Per round: one node-keyed join +
    * one min-aggregate, lineage truncated so the plan stays flat across
    * rounds; rounds ≤ component diameter (near-dup graphs: 2-3). Backs
    * `dedup_cluster_canonical`. */
  // localCheckpoint persists its RDD OUTSIDE the CacheManager, so
  // Dataset.unpersist cannot free it; track the RDD ids each checkpoint
  // creates and unpersist THOSE when superseded, bounding an N-round
  // fixpoint loop to two generations of executor storage.
  private def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint()
    (out, (sc.getPersistentRDDs.keySet -- before).toSet)
  }

  private def freeCheckpoints(df: DataFrame, ids: Set[Int]): Unit = {
    val sc = df.sparkSession.sparkContext
    ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
  }

  def clusterNearDups(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    def free(ids: Set[Int]): Unit = freeCheckpoints(pairs, ids)

    // Null node ids carry no identity to cluster by (and SQL set ops
    // treat NULL=NULL while joins do not, so a null id inside the
    // fixpoint's change-detection join could keep `changed` > 0
    // forever). Excluded up front; a null-id row contributes nothing to
    // connectivity by contract.
    val p = pairs.select(col(aCol).cast("long").as("a"),
                         col(bCol).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .localCheckpoint()
    val edges = p.union(p.select(col("b"), col("a"))).toDF("u", "v")
    var (labels, labelIds) = checkpointTracked(
      edges.groupBy(col("u")).agg(least(col("u"), min(col("v"))).as("lbl")))
    var changed = 1L
    while (changed > 0) {
      val prop = edges
        .join(labels.select(col("u").as("v"), col("lbl").as("nlbl")), "v")
        .groupBy(col("u")).agg(min(col("nlbl")).as("plbl"))
      val (next, nextIds) = checkpointTracked(
        labels.join(prop, Seq("u"), "left")
          .select(col("u"),
            least(col("lbl"), coalesce(col("plbl"), col("lbl"))).as("lbl")))
      changed = next.join(labels.select(col("u"), col("lbl").as("old")), "u")
        .filter(col("lbl") < col("old")).count()
      free(labelIds) // superseded generation is dead once `changed` is materialized
      labels = next
      labelIds = nextIds
    }
    labels.select(col("u").as("id"), col("lbl").as("cluster_id"))
  }

  /** Connected components via alternating large-star/small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC '14) — same contract as [[clusterNearDups]] (every
    * node in a pair → (id, cluster_id = min member id)), different round
    * complexity: O(log n) rounds regardless of component diameter, where
    * min-label propagation needs diameter rounds. Use this for
    * high-diameter graphs (chains of near-identical revisions, citation
    * paths); propagation wins on the shallow 2-3-hop clusters typical of
    * near-dup output. Per round each step is one groupBy + one join at
    * edge cardinality; the edge set is localCheckpoint-truncated per
    * round under the same generation-freeing discipline. */
  def clusterNearDupsStar(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    starContract(pairs, aCol, bCol)._1

  /** [[clusterNearDupsStar]] plus the round count, for the O(log n)
    * termination property spec. */
  private[graft] def starContract(pairs: DataFrame, aCol: String,
                                  bCol: String): (DataFrame, Int) = {
    // Same null-id contract as [[clusterNearDups]]: a null id would
    // never match itself in the full-outer fixpoint join below (joins
    // are not null-safe), so the while-loop could never terminate.
    val p0 = pairs.select(col(aCol).cast("long").as("u"),
                          col(bCol).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull)
    val nodes = p0.select(col("u")).union(p0.select(col("v")))
      .distinct().toDF("id").localCheckpoint()
    // canonical (larger, smaller) orientation; self-loops contribute
    // nothing to connectivity (their nodes re-enter via `nodes`)
    var (edges, edgeIds) = checkpointTracked(
      p0.filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"),
                least(col("u"), col("v")).as("v"))
        .distinct())
    var rounds = 0
    var changed = 1L
    while (changed > 0) {
      // large-star: over BOTH directions, hang every strictly-larger
      // neighbor off the neighborhood min (keeps (larger, smaller)
      // orientation: emitted (v, m) has v > u ≥ m)
      val both = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val lsMin = both.groupBy(col("u")).agg(least(min(col("v")), col("u")).as("m"))
      val large = both.join(lsMin, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      // small-star: on (larger, smaller) edges, reconnect the node and
      // all its smaller neighbors directly to the neighborhood min
      val ssMin = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val nbrPart = large.join(ssMin, "u").filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      val selfPart = ssMin.select(col("u"), col("m").as("v"))
      val (next, nextIds) = checkpointTracked(nbrPart.union(selfPart).distinct())
      // fixpoint: both steps are no-ops ⇔ the edge set is stable.
      // Detected as ONE job — a full-outer join of the two (distinct)
      // edge sets counting rows missing on either side — instead of the
      // former two except().count() jobs per round (each an edge-scale
      // anti-join); both inputs are localCheckpointed so the join reads
      // cached partitions, not recomputed lineage.
      changed = next.withColumn("__r", lit(1))
        .join(edges.withColumn("__l", lit(1)), Seq("u", "v"), "full_outer")
        .filter(col("__l").isNull || col("__r").isNull)
        .count()
      freeCheckpoints(pairs, edgeIds)
      edges = next
      edgeIds = nextIds
      rounds += 1
    }
    // converged: every edge is (member, component-min center)
    val labels = edges.select(col("u").as("id"), col("v").as("cluster_id"))
      .union(edges.select(col("v").as("id"), col("v").as("cluster_id")))
      .distinct()
    val out = nodes.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
    (out, rounds)
  }

  /** Symmetric int8 scalar quantization of an array column: one global
    * maxabs scale (positive rescaling preserves inner-product order, so
    * integer-dot ranking tracks the float ranking up to quantization
    * noise — an asymmetric min-max scheme does not; see
    * `ann_int8_topk`). Output adds `qCol ARRAY<LONG>` in [-127, 127].
    * Degenerate inputs (all-zero corpus → maxabs 0, or empty/all-null →
    * maxabs NULL) quantize to zero vectors instead of NaN codes. */
  def quantizeInt8(df: DataFrame, vecCol: String, qCol: String): DataFrame = {
    val scale = df.select(explode(col(vecCol)).as("__x"))
      .agg(max(abs(col("__x"))).as("__gm"))
    df.crossJoin(broadcast(scale))
      .withColumn(qCol,
        when(col("__gm") > 0,
          transform(col(vecCol), x => floor(x * lit(127.0) / col("__gm") + 0.5)))
        .otherwise(transform(col(vecCol), _ => lit(0L))))
      .drop("__gm")
  }

  /** Gopher-style rule-ensemble quality filter (Rae et al. 2021 §A1.1,
    * thresholds as parameters): adds the metric columns, a `keep` flag,
    * and the FIRST failing rule as `reason` — the per-drop audit trail.
    * One map-side pass, column-pruned to (idCol, textCol); null/blank
    * text rows are dropped (they have no measurable metrics). Metrics
    * are rounded to 6dp BEFORE rule evaluation so borderline decisions
    * are reproducible across engines.
    *
    * PRECONDITION: expects normalized lowercase text (the post-
    * `clean_normalize` stage) — the symbol alphabet is `[^a-z0-9 ]` and
    * the stopword list is lowercase, so cased input inflates
    * symbol_ratio and misses stopwords. Lowercase upstream (cheap,
    * map-side) rather than per-rule here, where it would run five
    * times. */
  def gopherFilter(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                   minWords: Int = 30, maxWords: Int = 100000,
                   minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                   maxSymbolRatio: Double = 0.1, minStopwords: Int = 2,
                   maxDupBigramFrac: Double = 0.2): DataFrame = {
    val toks = split(col(textCol), " ")
    val base = docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol),
        size(toks).as("n_words"),
        aggregate(toks, lit(0L), (a, x) => a + length(x)).as("__char_sum"),
        size(regexp_extract_all(col(textCol), lit("[^a-z0-9 ]"), lit(0))).as("__n_sym"),
        length(col(textCol)).as("__n_chars"),
        size(filter(toks, t => t.isin("the", "a", "of", "to", "and"))).as("n_stop"),
        size(TextSignatures.wordBigramHashes(col(textCol))).as("__n_dbg"))
    base.select(col(idCol), col("n_words"),
        round(col("__char_sum").cast("double") / col("n_words"), 6).as("mean_word_len"),
        round(col("__n_sym").cast("double") / col("__n_chars"), 6).as("symbol_ratio"),
        col("n_stop"),
        round(when(col("n_words") > 1,
            lit(1.0) - col("__n_dbg").cast("double") / (col("n_words") - 1))
          .otherwise(lit(0.0)), 6).as("dup_bigram_frac"))
      .withColumn("reason",
        when(col("n_words") < minWords || col("n_words") > maxWords, "word_count")
          .when(col("mean_word_len") < minMeanWordLen ||
                col("mean_word_len") > maxMeanWordLen, "mean_word_len")
          .when(col("symbol_ratio") > maxSymbolRatio, "symbol_ratio")
          .when(col("n_stop") < minStopwords, "stopwords")
          .when(col("dup_bigram_frac") > maxDupBigramFrac, "repetition")
          .otherwise("ok"))
      .withColumn("keep", (col("reason") === "ok").cast("int"))
  }

  /** Packed deterministic draws — the resampling family's scale idiom
    * (r10 verdict #3, codified per r11 verdict #7): draw b ∈ [0, B) for
    * a row is a fixed-width hex slice of one of a FEW md5 columns
    * (h0, h1, …) instead of one md5 per (row, draw), so B draws cost
    * ceil(B / perCol) hashes and consumers expand per-draw terms as
    * COLUMN expressions over the un-exploded row — nothing B×-sized is
    * computed, shuffled, or memoized (measured on stat_bh_fdr:
    * 2.39 → 0.30 s at sf0.1 when the ×320 explode became this).
    *
    * `packedDrawHexAt` slices for a LITERAL draw index — the Spark
    * side's per-replica column unroll; `packedDrawHexRuntimeB` is the
    * SAME formula over a runtime `b` column — the oracles' exploded
    * replay (two h-columns, b < perCol ? h0 : h1). Both assume the
    * caller projected h0, h1, … = md5(seed || suffix_i) and that
    * hexWidth · perCol ≤ 32 (an md5 is 32 hex chars). The hex → BIGINT
    * conversion stays caller-side (Spark `conv` vs DuckDB `0x` cast is
    * the one engine-specific piece). */
  def packedDrawHexAt(b: Int, hexWidth: Int, perCol: Int): String = {
    require(hexWidth * perCol <= 32,
      s"packedDrawHexAt: $perCol slices of $hexWidth hex chars exceed one md5")
    s"substring(h${b / perCol}, ${(b % perCol) * hexWidth + 1}, $hexWidth)"
  }

  /** See [[packedDrawHexAt]] — runtime-`b` twin for row-exploded oracle
    * replays (supports the two-column h0/h1 layout both families use). */
  def packedDrawHexRuntimeB(hexWidth: Int, perCol: Int): String =
    s"substring(CASE WHEN b < $perCol THEN h0 ELSE h1 END, " +
      s"(b % $perCol) * $hexWidth + 1, $hexWidth)"

  /** Byte-balanced output sharding by GLOBAL running sum in `idCol`
    * order — the canonical two-pass distributed prefix sum (Spark has
    * no scalable global window): range-partition on the sort key,
    * per-partition totals → running offsets on the numParts-row table
    * (the only single-partition window), then a pid-PARTITIONED window
    * + broadcast offset join. Output (idCol, n_bytes, cum_bytes, shard)
    * is invariant to the sampled range boundaries. Same pattern yields
    * scalable global row_number / ntile. */
  def shardByBytes(df: DataFrame, idCol: String, bytesCol: String,
                   targetBytes: Long, numParts: Int = 8): DataFrame = {
    val parts = df
      .select(col(idCol), coalesce(col(bytesCol).cast("long"), lit(0L)).as("n_bytes"))
      .repartitionByRange(numParts, col(idCol))
      .sortWithinPartitions(col(idCol))
      .withColumn("__pid", spark_partition_id())
    val offsets = parts.groupBy(col("__pid")).agg(sum(col("n_bytes")).as("__part_sum"))
      .withColumn("__offset", coalesce(sum(col("__part_sum")).over(
        Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__offset"))
    val w = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts.withColumn("__local_cum", sum(col("n_bytes")).over(w))
      .join(broadcast(offsets), Seq("__pid"))
      .select(col(idCol), col("n_bytes"),
              (col("__local_cum") + col("__offset")).as("cum_bytes"))
      // integral `div`, not `/`: double division loses exactness past
      // 2^53 cumulative bytes — real at the multi-PB corpus this
      // pattern is pitched for
      .withColumn("shard",
        expr(s"(greatest(cum_bytes, 1L) - 1L) div ${targetBytes}L"))
  }

  /** Scalable global order statistics — the shardByBytes two-pass
    * prefix sum generalized to row_number / running sums (r7 verdict
    * #2 adopted: no `Window.orderBy` without partitionBy over
    * unbounded inputs). Range-partition on the sort key, window
    * WITHIN each range partition, then add broadcast per-partition
    * offsets; the only single-partition window runs over the
    * numParts-row offset table. `order` MUST be a total order (carry
    * the id column last) or tie placement becomes partition-dependent.
    * Appends: __grn (global 1-based rank), __nt (total rows), and
    * __cum_<c> (global running sum) per requested sum column. */
  private def globalOrderStats(df: DataFrame, numParts: Int,
      order: Seq[Column], sumCols: Seq[String]): DataFrame = {
    // `parts` feeds BOTH the offsets aggregate and the main window
    // path, and correctness REQUIRES the two consumers to see the same
    // range boundaries — RangePartitioner's sample seed derives from
    // the runtime RDD id, so two independently executed exchanges over
    // the same input are NOT guaranteed identical boundaries; before
    // r9 this silently leaned on Spark's exchange-reuse deduplicating
    // the two identical shuffles (ADVICE r8). localCheckpoint pins ONE
    // partitioning that both branches start from, making the
    // invariant structural instead of optimizer-dependent. Cost: one
    // eager materialization of the (pre-aggregated, group-sized)
    // input these facades take — at 100 TB over a raw fact table the
    // caller should still pre-aggregate/persist what it passes in.
    val parts = df.repartitionByRange(numParts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val aggs = (count(lit(1)).as("__pn") +:
      sumCols.map(c => sum(col(c)).as(s"__ps_$c")))
    val wOff = Window.orderBy(col("__pid"))
    val offsets = parts.groupBy(col("__pid")).agg(aggs.head, aggs.tail: _*)
      .withColumn("__off", coalesce(sum(col("__pn")).over(
        wOff.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__nt", sum(col("__pn")).over(
        wOff.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val withSumOffs = sumCols.foldLeft(offsets) { (d, c) =>
      d.withColumn(s"__soff_$c", coalesce(sum(col(s"__ps_$c")).over(
        wOff.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn(s"__tot_$c", sum(col(s"__ps_$c")).over(
          wOff.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    }
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val local = parts.withColumn("__lrn", row_number().over(w))
    val withCums = sumCols.foldLeft(local) { (d, c) =>
      d.withColumn(s"__lcum_$c", sum(col(c)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    }
    val offSel = col("__pid") +: col("__off") +: col("__nt") +:
      sumCols.flatMap(c => Seq(col(s"__soff_$c"), col(s"__tot_$c")))
    val joined = withCums.join(broadcast(withSumOffs.select(offSel: _*)), Seq("__pid"))
      .withColumn("__grn", (col("__lrn") + col("__off")).cast("long"))
    sumCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"__cum_$c", col(s"__lcum_$c") + col(s"__soff_$c"))
        .drop(s"__lcum_$c", s"__soff_$c")
    }.drop("__pid", "__lrn", "__off")
  }

  /** Distributed global row_number (1-based, BIGINT) over a total
    * order — appends `outCol`, never funnels data through one
    * partition. */
  def globalRowNumber(df: DataFrame, outCol: String, order: Column*): DataFrame =
    globalOrderStats(df, 32, order, Nil)
      .withColumnRenamed("__grn", outCol).drop("__nt")

  /** SQL NTILE(k) reproduced arithmetically from a global rank column
    * `__grn` and total `__nt`: with N rows, q = N div k and
    * m = N mod k, buckets 1..m hold q+1 rows and the rest hold q —
    * pure integer expressions, bit-equal to any engine's NTILE under
    * the same total order. */
  private def ntileFromRank(k: Int): Column = expr(
    s"""CASE WHEN __nt % $k = 0 THEN (__grn - 1) div (__nt div $k) + 1
       |WHEN __grn <= (__nt % $k) * (__nt div $k + 1)
       |  THEN (__grn - 1) div (__nt div $k + 1) + 1
       |ELSE (__nt % $k) +
       |  (__grn - (__nt % $k) * (__nt div $k + 1) - 1) div (__nt div $k) + 1
       |END""".stripMargin).cast("long")

  /** Distributed NTILE(k) over a total order — no single-partition
    * sort anywhere. */
  def globalNtile(df: DataFrame, k: Int, outCol: String, order: Column*): DataFrame =
    globalOrderStats(df, 32, order, Nil)
      .withColumn(outCol, ntileFromRank(k))
      .drop("__grn", "__nt")

  /** Distributed decile + global running sum in ONE two-pass sweep:
    * appends `tileCol` (NTILE(10) semantics, BIGINT) and `cumCol`
    * (running sum of `sumCol` in `order`). The concentration-curve
    * primitive (w_cumulative_share) at unbounded cardinality. */
  def globalDecileCum(df: DataFrame, sumCol: String, tileCol: String,
      cumCol: String, order: Column*): DataFrame =
    globalOrderStats(df, 32, order, Seq(sumCol))
      .withColumn(tileCol, ntileFromRank(10))
      .withColumnRenamed(s"__cum_$sumCol", cumCol)
      .drop("__grn", "__nt", s"__tot_$sumCol")

  /** Distributed global running sum + total of `sumCol` in `order` —
    * appends `cumCol` and `totalCol`; the exact-weighted-quantile /
    * Lorenz-curve primitive at unbounded cardinality (smallest value
    * whose cumulative weight clears q·W is then one conditional
    * aggregate away). */
  def globalRunningSum(df: DataFrame, sumCol: String, cumCol: String,
      totalCol: String, order: Column*): DataFrame =
    globalOrderStats(df, 32, order, Seq(sumCol))
      .withColumnRenamed(s"__cum_$sumCol", cumCol)
      .withColumnRenamed(s"__tot_$sumCol", totalCol)
      .drop("__grn", "__nt")

  /** SCD2 dimension build: collapse an ordered event stream into
    * slowly-changing current-state periods per key — one row per state
    * CHANGE with [valid_from, valid_to) ranges, the change row's id for
    * lineage/determinism, and is_current (valid_to NULL). Two windows
    * partitioned by the key: per-key state, horizontal scale. */
  def scd2(events: DataFrame, keyCol: String, tsCol: String, ordCol: String,
           stateCol: String): DataFrame = {
    val reserved = Seq("valid_from", "valid_to", "change_id", "is_current", "__prev", "__rn")
    require(!Seq(keyCol, tsCol, ordCol, stateCol).exists(reserved.contains),
      s"input columns must not be named any of ${reserved.mkString(", ")}")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(ordCol))
    events
      .select(col(keyCol), col(tsCol), col(ordCol), col(stateCol))
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      // null-safe inequality: a NULL state is a real period (a plain =!=
      // drops it AND then flags the next row as a spurious change),
      // except on the first row where __prev is NULL by construction
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(stateCol)))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col(stateCol),
              col(tsCol).as("valid_from"), col("valid_to"),
              col(ordCol).as("change_id"),
              col("valid_to").isNull.cast("int").as("is_current"))
  }

  /** Telemetry debounce: keep a row iff it is the first of its
    * (key, kind) or arrived more than `gapMicros` after the PREVIOUS
    * raw row of that (key, kind). Adds a `keep` flag (0/1); filter on
    * it to drop the bursts. Gap-to-previous-raw semantics — the
    * chained-to-previous-KEPT variant needs a stateful walk
    * (flatMapGroupsWithState). */
  def debounce(events: DataFrame, keyCol: String, kindCol: String,
               tsCol: String, ordCol: String, gapMicros: Long): DataFrame = {
    require(!events.columns.contains("keep") && !events.columns.contains("__prev_ts"),
      "input must not carry a keep or __prev_ts column")
    val w = Window.partitionBy(col(keyCol), col(kindCol))
      .orderBy(col(tsCol), col(ordCol))
    events
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("keep",
        (col("__prev_ts").isNull ||
         unix_micros(col(tsCol)) - unix_micros(col("__prev_ts")) > gapMicros)
          .cast("int"))
      .drop("__prev_ts")
  }

  /** Distributed BPE merge training, N rounds (Sennrich et al. 2016):
    * per round count every adjacent token pair across the corpus
    * (map-side partial agg — the shuffle carries (pair, count) rows,
    * never text), broadcast the argmax pair (count desc, lexicographic
    * tie-break), and apply the greedy left-to-right merge with the
    * native BpeMergeApply expression. Returns the learned merge table
    * (round, a, b, cnt). Each round's 1-row argmax is localCheckpointed
    * so the pair-count subtree is not replanned into every later round,
    * and the corpus itself localCheckpoints every `checkpointEvery`
    * rounds (freeing the superseded generation,
    * [[clusterNearDups]]-style) so production round counts (tens of
    * thousands) never accumulate an unbounded narrow-map lineage — and
    * NEVER re-shuffle the text: the only per-round exchange is the
    * (pair, count) aggregate.
    *
    * Stops early (returning the merges learned so far) once no adjacent
    * pair remains — a fully-merged or all-single-token corpus; training
    * an EMPTY corpus (no round-1 pair at all) is an error, not an empty
    * result: the old crossJoin-against-empty-argmax silently emptied
    * the corpus AND the merge table. */
  def bpeTrain(docs: DataFrame, textCol: String, rounds: Int,
               checkpointEvery: Int = 16): DataFrame =
    // train-only callers carry just the text column through the loop's
    // checkpoint generations — nothing else is needed for the statistic
    bpeTrainEncode(docs.filter(col(textCol).isNotNull)
      .select(col(textCol).as("text")), "text", rounds, checkpointEvery)._1

  /** [[bpeTrain]] AND the encoded corpus in one pass: the training
    * loop's final merged corpus IS the encode of the input under the
    * learned table, so callers that want both (train-then-tokenize, the
    * standard pipeline shape) must not pay a second full re-fold of the
    * raw text ([[bpeEncode]] exists for applying a PERSISTED table).
    * Returns (merge table, input rows with textCol merged in place);
    * non-text columns (doc ids, metadata) ride along untouched. NOTE:
    * rows whose textCol is NULL are DROPPED from the returned corpus
    * (null text carries no pairs to train on and no tokens to emit) —
    * callers that need row preservation must split nulls off first and
    * union them back. */
  def bpeTrainEncode(docs: DataFrame, textCol: String, rounds: Int,
                     checkpointEvery: Int = 16): (DataFrame, DataFrame) = {
    require(rounds >= 1, "rounds must be >= 1")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val reserved = Seq("__bpe_round", "__bpe_a", "__bpe_b", "__bpe_cnt")
    require(!docs.columns.exists(reserved.contains),
      s"docs must not carry a ${reserved.mkString("/")} column")
    var corpus = docs.filter(col(textCol).isNotNull)
    var corpusIds = Set.empty[Int]
    var merges: DataFrame = null
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val m = bpeTopPair(corpus, textCol)
        .select(lit(r).as("round"), col("a"), col("b"), col("cnt"))
        .localCheckpoint()
      if (m.isEmpty) {
        // no adjacent pair left: merging against an empty argmax would
        // cross-join the corpus to zero rows — stop instead
        exhausted = true
      } else {
        corpus = corpus.crossJoin(broadcast(m.select(
            col("round").as("__bpe_round"), col("a").as("__bpe_a"),
            col("b").as("__bpe_b"), col("cnt").as("__bpe_cnt"))))
          .withColumn(textCol, TextSignatures.bpeMergeApply(
            col(textCol), col("__bpe_a"), col("__bpe_b")))
          .drop("__bpe_round", "__bpe_a", "__bpe_b", "__bpe_cnt")
        if (r % checkpointEvery == 0) {
          val (cp, ids) = checkpointTracked(corpus) // eager: old gen dead after this
          freeCheckpoints(corpus, corpusIds)
          corpus = cp
          corpusIds = ids
        }
        merges = if (merges == null) m else merges.unionByName(m)
        r += 1
      }
    }
    require(merges != null,
      "bpeTrain: corpus has no adjacent token pair (empty or all-single-token input)")
    (merges.orderBy(col("round")), corpus)
  }

  /** Session-memoized 2-round BPE training over the spread documents
    * corpus — the trained-artifact memo (r10 verdict #8 / next-round
    * #8): `bpe_train_merges` and `bpe_encode` both need the SAME
    * 2-round merge table, and each previously ran its own training
    * (two pair-count shuffles apiece). The memo value is the 2-row
    * (round, a, b, cnt) table — trained ARTIFACTS are exactly what the
    * exchange memo is for (the ivfModel8 discipline); the corpus-sized
    * fold intermediates stay transient inside the build. Consumers
    * re-derive any encoded corpus they need with a map-side
    * [[bpeEncode]] fold — scan-rate CPU, zero shuffles. */
  def bpeMerges2(s: SparkSession, dir: String): DataFrame =
    memoizedExchange("bpe_merges2", s, dir) {
      bpeTrain(graft.Tables.documentsSpread(s, dir), "text", rounds = 2)
    }

  /** Corpus-wide adjacent-token-pair counts of a space-tokenized text
    * column — the BPE statistic. Shared by [[bpeTrain]] and the
    * registered `bpe_train_merges` query so tokenization and tie-break
    * semantics cannot diverge. */
  private[graft] def bpeAdjacentPairCounts(corpus: DataFrame, textCol: String): DataFrame = {
    val t = split(col(textCol), " ")
    val pairs = explode(transform(
      when(size(t) >= 2, sequence(lit(1), size(t) - 1))
        .otherwise(array().cast("array<int>")),
      i => struct(element_at(t, i).as("a"), element_at(t, i + 1).as("b"))))
    corpus.select(pairs.as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b")).agg(count(lit(1)).as("cnt"))
  }

  /** Argmax pair (count desc, lexicographic tie-break) of
    * [[bpeAdjacentPairCounts]]. */
  private[graft] def bpeTopPair(corpus: DataFrame, textCol: String): DataFrame =
    bpeAdjacentPairCounts(corpus, textCol)
      .orderBy(desc("cnt"), col("a"), col("b")).limit(1)

  /** ENCODE with a learned BPE merge table ([[bpeTrain]]'s output, or
    * any (round, a, b) table): apply the merges in rank order to a text
    * column — the tokenizer-apply stage between vocabulary training and
    * sequence packing in every training-data pipeline.
    *
    * The merge table is aggregated into ONE sorted array row and
    * broadcast; encoding is then a single higher-order `aggregate` fold
    * per document, each step the native BpeMergeApply greedy walk.
    * One map-side pass over the corpus: zero shuffles of text, zero
    * driver-side collection, and no per-merge join rounds (a 30k-merge
    * production table is 30k lambda steps inside one expression, not
    * 30k plan nodes or 30k broadcasts). Null text encodes to null; an
    * EMPTY merge table is the identity encode (fold over zero merges),
    * not an error — re-encoding with `limit(0)` merges is a legitimate
    * no-op. */
  def bpeEncode(docs: DataFrame, textCol: String, merges: DataFrame,
                outCol: String = "encoded"): DataFrame = {
    require(!docs.columns.contains("__merges"),
      "docs must not carry a __merges column")
    val tbl = merges.agg(sort_array(collect_list(struct(
      col("round"), col("a"), col("b")))).as("__merges"))
    docs.crossJoin(broadcast(tbl))
      .withColumn(outCol,
        aggregate(col("__merges"), col(textCol),
          (acc, m) => TextSignatures.bpeMergeApply(
            acc, m.getField("a"), m.getField("b"))))
      .drop("__merges")
  }

  /** Interval (range) join without a nested loop. A raw
    * `t BETWEEN lo AND hi` join has no equi key, so Spark plans
    * BroadcastNestedLoop/Cartesian; decomposing each interval into the
    * fixed-width buckets it touches makes the bucket the EQUI key and
    * the range check a residual predicate on the hash join. Blowup =
    * buckets per interval; pick `bucketSeconds` near the typical
    * interval length. In: facts with `factTime`, intervals with
    * `[startCol, endCol)` — all integer epoch seconds. Zero/negative-
    * length intervals are dropped (Spark's `sequence` would DESCEND for
    * end < start and fabricate buckets). Returns facts ⋈ intervals. */
  def intervalJoin(facts: DataFrame, intervals: DataFrame,
                   factTime: String, startCol: String, endCol: String,
                   bucketSeconds: Long = 3600L): DataFrame = {
    require(!intervals.columns.contains("__bkt"),
      "intervals must not carry a __bkt column")
    // side-qualified references: facts and intervals may legally share
    // column names (e.g. both carry a `ts`) — unqualified col() would
    // raise AMBIGUOUS_REFERENCE at analysis
    val fa = facts.alias("__f")
    val ia = intervals.filter(col(endCol) > col(startCol))
      .withColumn("__bkt", explode(expr(
        s"sequence(`$startCol` div $bucketSeconds, (`$endCol` - 1) div $bucketSeconds)")))
      .alias("__i")
    fa.join(ia,
        expr(s"__f.`$factTime` div $bucketSeconds") === col("__i.__bkt") &&
        col(s"__f.$factTime") >= col(s"__i.$startCol") &&
        col(s"__f.$factTime") < col(s"__i.$endCol"))
      .drop(col("__i.__bkt"))
  }

  /** Fixed-iteration power-method PageRank over a weighted edge list.
    * In: (srcCol, dstCol, wgtCol). Out: (node, rank), unrounded. Per
    * iteration one equi-join of the rank vector with the out-degree-
    * normalized edges + one sum-by-dst; normalization is hoisted out of
    * the loop. Dangling nodes (no out-edges) redistribute their rank
    * mass uniformly each iteration — standard PageRank semantics, so
    * ranks sum to 1 on ANY graph, sinks included; the redistribution is
    * one scalar aggregate over the (tiny) dangling-rank slice,
    * broadcast back. One up-front probe classifies the graph: sink-free
    * graphs (detected with a single anti-join isEmpty) skip the term
    * entirely and run the lazy single-job linear-lineage loop; graphs
    * with sinks run the conservation form with per-iteration
    * localCheckpoint under the [[clusterNearDups]] generation-freeing
    * discipline (two consumers per iteration would otherwise double the
    * replanned lineage every round). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String, wgtCol: String,
               iterations: Int = 3, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
                         col(wgtCol).cast("double").as("wgt"))
    val out = e.groupBy(col("src")).agg(sum(col("wgt")).as("__out_w"))
    // A node whose out-weights sum to 0 (or null) cannot be normalized:
    // its p would be null, its contributions would silently vanish from
    // sum(__in_rank), and the conservation form would misclassify its
    // whole rank as dangling mass. Degenerate weights are bad INPUT —
    // fail loudly at execution time (no extra validation job; the check
    // rides the normalization projection itself).
    // PINNED (r15 opt, guide §2.4): edgeP is joined by EVERY iteration —
    // un-pinned, each round replayed the edge build + out-weight join
    // (50 Exchange nodes in graph_copurchase_pagerank's before-plan).
    // |E|-narrow (src, dst, p).
    val edgeP = e.join(out, "src")
      .select(col("src"), col("dst"), (col("wgt") /
        when(col("__out_w").isNotNull && col("__out_w") =!= 0.0, col("__out_w"))
          .otherwise(raise_error(concat(
            lit("pageRank: out-weights of node "), col("src").cast("string"),
            lit(" sum to 0 or null; edge weights must sum nonzero per source"))))
        ).as("p"))
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct()
    // one up-front probe: does the graph have sinks at all? Sink-free
    // graphs (the common curation case — transition graphs, co-citation)
    // take the single-consumer LAZY loop: rank has exactly one consumer
    // per iteration, lineage stays linear, the whole run is one job.
    val hasDangling = !nodes.join(
      e.select(col("src").as("node")).distinct(), Seq("node"), "left_anti")
      .isEmpty
    val n0 = nodes.crossJoin(
      broadcast(nodes.agg(count(lit(1)).cast("double").as("__n_nodes"))))
    // n1 is re-joined every sink-free round too — same pin, lazily
    val n1 = if (hasDangling) n0.localCheckpoint() else n0.localCheckpoint(false)
    var rank = n1.select(col("node"), (lit(1.0) / col("__n_nodes")).as("rank"))
    var rankIds = Set.empty[Int]
    for (_ <- 1 to iterations) {
      val contrib = rank.join(edgeP, rank("node") === edgeP("src"))
        .groupBy(col("dst")).agg(sum(col("rank") * col("p")).as("__in_rank"))
      if (!hasDangling) {
        // no sinks ⇒ dangling term is identically 0: skip it, keep the
        // plan lazy and linear
        rank = n1.join(contrib, n1("node") === contrib("dst"), "left")
          .select(n1("node"),
            (lit(1.0 - damping) / col("__n_nodes") +
              lit(damping) * coalesce(col("__in_rank"), lit(0.0))).as("rank"))
      } else {
        // Sink mass by CONSERVATION, not by joining rank against a
        // dangling-node list: every non-sink node distributes its whole
        // rank (out-weights are normalized), so Σ in_rank = Σ non-sink
        // rank, and with the Σ rank = 1 invariant the dangling mass is
        // exactly 1 − Σ in_rank — one scalar aggregate, broadcast back.
        val sinkMass = contrib.agg(
          (lit(1.0) - sum(col("__in_rank"))).as("__sink_mass"))
        // contrib now has two consumers; without a materialization
        // barrier the replanned lineage doubles every round
        // (2^iterations leaf growth — measured 176 duplicate scans at 3
        // iterations). localCheckpoint per iteration bounds the plan to
        // one round, same generation-freeing discipline as
        // clusterNearDups; at cluster scale this slot is reliable
        // checkpointing on a cadence.
        val (next, ids) = checkpointTracked(
          n1.join(contrib, n1("node") === contrib("dst"), "left")
            .crossJoin(broadcast(sinkMass))
            .select(n1("node"),
              (lit(1.0 - damping) / col("__n_nodes") +
                lit(damping) * (coalesce(col("__in_rank"), lit(0.0)) +
                  col("__sink_mass") / col("__n_nodes"))).as("rank")))
        freeCheckpoints(next, rankIds)
        rank = next
        rankIds = ids
      }
    }
    rank
  }

  // ---- round-7 additions -------------------------------------------

  /** Heavy hitters via a Count-Min-sketch prefilter (exact result).
    * Keys whose frequency ≥ (num/den) × mean-frequency are returned
    * with their EXACT counts: the sketch (depth 4 × `width` counters,
    * `width*32` bytes on the wire regardless of key cardinality) never
    * undercounts, so the candidate cut is lossless and the exact pass
    * runs only on candidate-key rows. In: any df + a long key column.
    * Out: (keyCol, n). */
  def heavyHittersCms(df: DataFrame, keyCol: String,
                      num: Long = 6L, den: Long = 5L,
                      width: Int = 1024): DataFrame = {
    import df.sparkSession.implicits._
    val depth = 4
    val ev = df.select(col(keyCol))
    val hs = graft.functions.CmsFns.keyHashes(col(keyCol), depth)
    val cms = ev.select(hs(0).as("h0"), hs(1).as("h1"), hs(2).as("h2"), hs(3).as("h3"))
      .as[(Long, Long, Long, Long)]
      .select(new graft.functions.CmsAgg(width, depth).toColumn.name("cms"))
    val stats = ev.agg(count(lit(1)).as("__total"),
                       countDistinct(col(keyCol)).as("__nkeys"))
    val candidates = ev.distinct()
      .crossJoin(broadcast(cms)).crossJoin(broadcast(stats))
      .filter(graft.functions.CmsFns.estimate("cms", keyCol, width, depth)
                * lit(den) * col("__nkeys") >= col("__total") * lit(num))
      .select(col(keyCol))
    df.join(broadcast(candidates), Seq(keyCol), "left_semi")
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(stats))
      .filter(col("n") * lit(den) * col("__nkeys") >= col("__total") * lit(num))
      .select(col(keyCol), col("n"))
  }

  /** Union-of-intervals coverage: total distinct covered time per key
    * when each row opens a `windowUs`-long interval at `tsCol`
    * (overlaps merge). One shuffle on the key, O(1) state per row.
    * In: (keyCol, ordCol unique-per-key tiebreaker, tsCol TIMESTAMP).
    * Out: (keyCol, n_islands, covered_us). */
  def intervalCoverage(df: DataFrame, keyCol: String, ordCol: String,
                       tsCol: String, windowUs: Long): DataFrame = {
    val byStart = Window.partitionBy(col(keyCol)).orderBy(col("__s"), col(ordCol))
    df.select(col(keyCol), col(ordCol), unix_micros(col(tsCol)).as("__s"),
              (unix_micros(col(tsCol)) + lit(windowUs)).as("__e"))
      .withColumn("__pmax",
        max(col("__e")).over(byStart.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__cut",
        when(col("__pmax").isNull || col("__s") > col("__pmax"), 1L).otherwise(0L))
      .withColumn("__island",
        sum(col("__cut")).over(byStart.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__island"))
      .agg((max(col("__e")) - min(col("__s"))).as("__len"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_islands"), sum(col("__len")).as("covered_us"))
  }

  /** Median/MAD robust z-score outlier gate per group, in scaled
    * integers (v2 = 2× cents) so the >3×MAD cut is bit-exact. In:
    * (groupCol, valCol DOUBLE). Out: (groupCol, n, med4_cents,
    * mad4_cents, n_outliers). */
  def madOutliers(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val b = df.select(col(groupCol), (round(col(valCol) * 100) * 2).as("__v2"))
    val m = b.groupBy(col(groupCol)).agg((expr("percentile(__v2, 0.5)") * 2).as("__m4"))
    val d = b.join(broadcast(m), Seq(groupCol))
      .withColumn("__dev2", abs(col("__v2") * 2 - col("__m4")))
    val md = d.groupBy(col(groupCol)).agg((expr("percentile(__dev2, 0.5)") * 2).as("__mad4"))
    d.join(broadcast(md), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
           max(col("__m4")).cast("long").as("med4_cents"),
           max(col("__mad4")).cast("long").as("mad4_cents"),
           count(when(col("__dev2") * 2 > col("__mad4") * 3, 1)).as("n_outliers"))
  }

  /** Asymmetric n-gram containment pairs C(A→B) = |A∩B|/|A| ≥ t, with
    * prefix-filtering candidate generation (complete under the hash
    * order by the SSJoin prefix lemma). In: (idCol, textCol). Out:
    * (a_id, b_id, containment). */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       t: Double): DataFrame = {
    require(t > 0.0 && t < 1.0, s"containment threshold in (0,1): $t")
    val toks = docs
      .filter(size(split(col(textCol), " ")) >= 2)
      .select(col(idCol).as("__id"),
              TextSignatures.wordBigramHashes(col(textCol)).as("__bg"))
      .withColumn("__n", size(col("__bg")))
      .repartition(col("__id"))
      .localCheckpoint() // consumed 4×: postings, df, prefix, verify ×2
    containmentPairsFromShingles(toks, t)
  }

  /** [[containmentPairs]] over a PRE-SHINGLED (and ideally already
    * materialized) (__id, __bg sorted-distinct hashes, __n) table —
    * the seam that lets the dedup family reuse one session-shared
    * shingle exchange instead of re-tokenizing per operator. */
  private[graft] def containmentPairsFromShingles(
      toks: DataFrame, t: Double): DataFrame = {
    val post = toks.select(col("__id").as("b_id"), col("__n").as("__nb"),
                           explode(col("__bg")).as("__g"))
    // Path choice is MEASURED, not assumed (both counts are cheap
    // actions on checkpointed/small inputs): prefix filtering lives on
    // rare grams, and a dense small vocabulary has none — on the
    // synthetic 31-word corpus the prefix join still emits ~6M true
    // candidates at sf0.1 and the verify shuffles dominate (4.5 s
    // measured, r8 verdict #2). When the whole vocabulary fits a
    // fixed-width bitset AND the doc count keeps n² in the tens of
    // millions, the exact answer is cheaper as a broadcast all-pairs
    // scan with a fused AND+popcount verify: zero pair shuffles, no
    // distinct, ~25× cheaper per-pair than the merge walk. A real
    // corpus (vocab ≫ 4096 or docs ≫ 10k) takes the prefix-filtered
    // posting-join path below — the shape that scales with posting
    // products, not corpus².
    val gdf = post.groupBy(col("__g")).agg(count(lit(1)).as("__gdf"))
      .localCheckpoint()
    val vocab = gdf.count()
    val nDocs = toks.count()
    if (vocab <= 4096 && nDocs <= 10000)
      containmentDenseBitset(toks, gdf, t)
    else containmentPrefixFiltered(toks, post, gdf, t)
  }

  /** Dense-vocab exact containment: encode each doc's distinct-gram
    * set as a ⌈vocab/64⌉-long bitset over the global gram→bit map,
    * then verify ALL ordered pairs map-side against the broadcast
    * mask table with [[graft.functions.SortedIntersectCount
    * .bitsetIntersectCount]] inside the join condition — survivors
    * (result-sized) are the only rows that ever materialize. */
  private def containmentDenseBitset(toks: DataFrame, gdf: DataFrame,
      t: Double): DataFrame = {
    // vocab-bounded (≤4096 rows): single-partition window is safe
    val bitmap = gdf.select(col("__g"),
      (row_number().over(Window.orderBy(col("__g"))) - 1).as("__bit"))
    val nWords = ((gdf.count() + 63) / 64).toInt
    val masks = toks
      .select(col("__id"), col("__n"), explode(col("__bg")).as("__g"))
      .join(broadcast(bitmap), "__g")
      .groupBy(col("__id"), col("__n"), (col("__bit") / 64).cast("int").as("__w"))
      .agg(expr("bit_or(shiftleft(1L, CAST(__bit % 64 AS INT)))").as("__bits"))
      .groupBy(col("__id"), col("__n"))
      .agg(map_from_entries(collect_list(struct(col("__w"), col("__bits"))))
        .as("__m"))
      .select(col("__id"), col("__n"),
        transform(sequence(lit(0), lit(nWords - 1)),
          w => coalesce(element_at(col("__m"), w), lit(0L))).as("__mask"))
      .localCheckpoint() // both join sides read it; masks are n×W longs
    val inter = SortedIntersectCount.bitsetIntersectCount(
      col("__ma"), col("__mb"))
    masks.select(col("__id").as("a_id"), col("__n").as("__na"),
                 col("__mask").as("__ma"))
      .join(broadcast(masks.select(col("__id").as("b_id"),
          col("__n").as("__nb"), col("__mask").as("__mb"))),
        col("a_id") =!= col("b_id") &&
        col("__nb").cast("double") >= col("__na") * t - 1e-9 &&
        inter.cast("double") >= col("__na") * t - 1e-9)
      .withColumn("containment", inter.cast("double") / col("__na"))
      .filter(col("containment") >= t)
      .select(col("a_id"), col("b_id"), col("containment"))
  }

  /** Sparse-vocab (real-corpus) containment: PPJoin prefix filtering
    * over the inverted index — see the prefix/positional lemmas
    * in-line. */
  private def containmentPrefixFiltered(toks: DataFrame, post: DataFrame,
      gdf: DataFrame, t: Double): DataFrame = {
    // PPJoin frequency-ordered prefix: C(A→B) ≥ t ⇒ A misses at most
    // (1−t)|A| of its grams from A∩B, so ANY (1−t)|A|+1 grams of A hit
    // the intersection (pigeonhole — the choice is free). Choosing the
    // globally RAREST grams makes the candidate join meet on the
    // shortest posting lists; a hash-ordered prefix degenerates to
    // near-all-pairs on small-vocabulary corpora (measured 18 s →
    // 5.2 s at sf0.1 — which is exactly when the dense-bitset path
    // takes over instead; a real corpus's vocab makes rare grams rare
    // and the prefix join sparse, and this path applies).
    // broadcast: the vocab is tiny relative to the corpus (distinct
    // grams, not doc×gram postings), and a broadcast join preserves the
    // doc-id hash partitioning from the repartition above, so the
    // per-doc rarity window needs only a local sort — no exchange.
    // Every doc's grams are ranked under the ONE global (df, gram)
    // order: rank ≤ prefix bound selects the prefix (probe side), and
    // the same rank on the posting side is the position the PPJoin+
    // positional filter needs.
    val ranked = post
      .join(broadcast(gdf), "__g")
      .withColumn("__pb", row_number().over(
        Window.partitionBy(col("b_id")).orderBy(col("__gdf"), col("__g"))))
    val pref = ranked
      .select(col("b_id").as("a_id"), col("__nb").as("__na"),
              col("__g"), col("__pb").as("__pa"))
      .filter(col("__pa") <=
              (col("__na") * lit(1.0 - t)).cast("int") + lit(1))
    pref.join(ranked.select(col("b_id"), col("__nb"), col("__g"), col("__pb")),
        Seq("__g"))
      .filter(col("a_id") =!= col("b_id"))
      // length filter (sound): |A∩B| ≤ |B|, so C ≥ t needs |B| ≥ t·|A|;
      // the 1e-9 slop only ever ADMITS borderline candidates
      .filter(col("__nb").cast("double") >= col("__na") * t - 1e-9)
      // PPJoin+ positional upper bound (Xiao et al. 2008): under the
      // shared global gram order, every shared gram of a true pair
      // lies at-or-after the FIRST shared gram's positions (p_a, p_b)
      // in both docs, so |A∩B| ≤ 1 + min(|A|−p_a, |B|−p_b) holds at
      // that row — and the first shared gram is always inside A's
      // prefix (it is A's earliest shared gram; the prefix lemma
      // guarantees some shared gram in the prefix). Keeping every row
      // whose bound clears t·|A| therefore keeps every true pair,
      // while pairs that only meet on late grams die BEFORE the
      // distinct + verify shuffles (the completeness spec vs brute
      // force guards this). 1e-9 slop again only admits.
      .filter((lit(1) + least(col("__na") - col("__pa"),
                              col("__nb") - col("__pb"))).cast("double")
              >= col("__na") * t - 1e-9)
      .select(col("a_id"), col("b_id")).distinct()
      .transform { cand =>
        // Verify-side join strategy, cap-disciplined: on a small-vocab
        // corpus the candidate set is pair-dense (sf0.1: ~6M pairs vs
        // 5k docs), so shuffling the WIDE array-attached candidate rows
        // twice dominates the query (measured 4.5 s); broadcasting the
        // (id, shingles) table instead makes the whole verify map-side
        // over one narrow pair shuffle. The broadcast is gated on an
        // explicit measured bound (≤20k docs ≈ ≤20 MB of arrays — a
        // cheap count() on the already-checkpointed toks), NEVER an
        // unconditional hint: past the bound the co-partitioned shuffle
        // join is the 100 TB shape, where candidates scale with
        // posting products, not corpus².
        val aSide = toks.select(col("__id").as("a_id"),
          col("__bg").as("__bga"), col("__n").as("__na"))
        val bSide = toks.select(col("__id").as("b_id"), col("__bg").as("__bgb"))
        if (toks.count() <= 20000L)
          cand.join(broadcast(aSide), "a_id").join(broadcast(bSide), "b_id")
        else cand.join(aSide, "a_id").join(bSide, "b_id")
      }
      .withColumn("containment",
        SortedIntersectCount.sortedIntersectCountLong(col("__bga"), col("__bgb"))
          .cast("double") / col("__na"))
      .filter(col("containment") >= t)
      .select(col("a_id"), col("b_id"), col("containment"))
  }

  // ---- round-7 wave-3 additions ------------------------------------

  /** Additively mergeable quantile sketch: the (group, value, n)
    * histogram. Merge two sketches with [[mergeQuantileSketches]]
    * (exact: counts add), extract order statistics with
    * [[sketchQuantiles]] (exact: nothing is lost on an integer
    * domain). In: any df + a group col + an integer-valued col.
    * Out: (g, v, n). */
  def quantileSketch(df: DataFrame, groupCol: String, valCol: String): DataFrame =
    df.groupBy(col(groupCol).as("g"), col(valCol).as("v"))
      .agg(count(lit(1)).as("n"))

  /** Exact merge of two [[quantileSketch]] results: union + re-sum. */
  def mergeQuantileSketches(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("g"), col("v")).agg(sum(col("n")).as("n"))

  /** Lower discrete percentiles from a [[quantileSketch]], in pure
    * integer arithmetic. Out: (g, n_rows, p_<pct> per requested pct). */
  def sketchQuantiles(sketch: DataFrame, pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100))
    val cum = sketch
      .withColumn("cum", sum(col("n")).over(
        Window.partitionBy(col("g")).orderBy(col("v"))))
      .withColumn("total", sum(col("n")).over(Window.partitionBy(col("g"))))
    val aggs = pcts.map(p =>
      min(when(col("cum") * 100 >= col("total") * p, col("v")))
        .cast("long").as(s"p$p"))
    cum.groupBy(col("g"))
      .agg(max(col("total")).as("n_rows"), aggs: _*)
  }

  /** 64-register HyperLogLog sketch rows (keyCol, r, m) — the
    * approximate-distinct complement of [[quantileSketch]]'s additive
    * histogram; mergeable by per-register max
    * ([[mergeHllSketches]]). */
  def hllSketch(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    graft.operators.StatSketchOps.hllRegisters(df, col(keyCol), col(idCol))
      .withColumnRenamed("__k", keyCol)

  /** Exact merge of two [[hllSketch]] results: union + per-register
    * max (the law StatSketchOpsSpec asserts). */
  def mergeHllSketches(a: DataFrame, b: DataFrame, keyCol: String): DataFrame =
    a.unionByName(b).groupBy(col(keyCol), col("r")).agg(max(col("m")).as("m"))

  /** Cardinality estimate per key from an [[hllSketch]], with the
    * standard small-range linear-counting correction.
    * Out: (keyCol, v_regs, hll_est). */
  def hllCardinality(sketch: DataFrame, keyCol: String): DataFrame =
    graft.operators.StatSketchOps.hllEstimate(
        sketch.withColumnRenamed(keyCol, "__k"))
      .withColumnRenamed("__k", keyCol)

  /** Gini–Simpson diversity of each key's category mix, exact
    * rationals + one final division. In: (keyCol, catCol). Out:
    * (keyCol, n, simpson) for keys with n > 1. */
  def simpsonDiversity(df: DataFrame, keyCol: String, catCol: String): DataFrame =
    df.groupBy(col(keyCol), col(catCol)).agg(count(lit(1)).as("__ni"))
      .groupBy(col(keyCol))
      .agg(sum(col("__ni")).as("n"),
           sum(col("__ni") * (col("__ni") - 1)).as("__same"))
      .filter(col("n") > 1)
      .select(col(keyCol), col("n"),
        round(lit(1.0) - col("__same").cast("double") /
          (col("n") * (col("n") - 1)).cast("double"), 6).as("simpson"))

  /** Key-skew telemetry per group: top-1 share (e6) and Gini of the
    * per-key row-count distribution — run this BEFORE picking a join
    * strategy. In: (groupCol, keyCol). Out: (groupCol, n_keys, n_rows,
    * top1_share_e6, gini). */
  def keySkewProfile(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol), col(keyCol)).agg(count(lit(1)).as("__x"))
    counts.withColumn("__r", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("__x"), col(keyCol))))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_keys"), sum(col("__x")).as("n_rows"),
           max(col("__x")).as("__maxx"), sum(col("__r") * col("__x")).as("__rw"))
      .select(col(groupCol), col("n_keys"), col("n_rows"),
        floor(lit(1000000L) * col("__maxx") / col("n_rows") + 0.5)
          .cast("long").as("top1_share_e6"),
        round(lit(2.0) * col("__rw").cast("double") /
            (col("n_keys") * col("n_rows")).cast("double") -
            (col("n_keys") + 1).cast("double") / col("n_keys").cast("double"), 6)
          .as("gini"))
  }

  /** Nucleus (top-p) cut: per group, keep rows from the top of the
    * `scoreCol` ranking until `pPct`% of the group's `weightCol` mass
    * is covered (integer-exact boundary; `ordCol` breaks score ties).
    * Returns the kept rows. */
  def nucleusCut(df: DataFrame, groupCol: String, scoreCol: String,
                 ordCol: String, weightCol: String, pPct: Int): DataFrame = {
    require(pPct >= 1 && pPct <= 100, s"pPct must be 1..100: $pPct")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(weightCol)).over(w))
      .withColumn("__total", sum(col(weightCol)).over(Window.partitionBy(col(groupCol))))
      .filter((col("__cum") - col(weightCol)) * 100 < col("__total") * pPct)
      .drop("__cum", "__total")
  }

  /** RFM quintile scores from an event log. In: (keyCol, tsCol,
    * valCol DOUBLE). Out: (keyCol, n_events, cents, r, f, m, rfm) —
    * score 1 = best quintile; ties totalized by keyCol. Each quintile
    * is a distributed globalNtile pass (|users| is billions at the
    * target scale — no single-partition window survives that), three
    * range-partitioned sorts chained over the per-key summary. */
  def rfmScores(events: DataFrame, keyCol: String, tsCol: String,
                valCol: String): DataFrame = {
    val per = events.groupBy(col(keyCol))
      .agg(max(col(tsCol)).as("__last"), count(lit(1)).as("n_events"),
           sum(floor(col(valCol) * 100 + 0.5).cast("long")).as("cents"))
    val scored = Seq(
      ("r", Seq(col("__last").desc, col(keyCol))),
      ("f", Seq(col("n_events").desc, col(keyCol))),
      ("m", Seq(col("cents").desc, col(keyCol)))
    ).foldLeft(per) { case (d, (out, ord)) => globalNtile(d, 5, out, ord: _*) }
    scored.select(col(keyCol), col("n_events"), col("cents"),
        col("r"), col("f"), col("m"))
      .withColumn("rfm", col("r") * 100 + col("f") * 10 + col("m"))
  }

  /** Per-group first-occurrence n-gram novelty (n=3): fraction of each
    * doc's distinct token trigrams first introduced by that doc.
    * Out: (groupCol, n_docs, sum_tri, sum_novel, novelty). */
  def ngramNovelty(docs: DataFrame, groupCol: String, idCol: String,
                   textCol: String): DataFrame = {
    // split ONCE into a materialized column: element_at inside the
    // transform lambda gets no common-subexpression elimination, so an
    // inline split would re-tokenize per access — O(n²) per document
    // (measured 7.4 s → 0.93 s at sf0.1 with the join-free attribution)
    val tris = docs.filter(col(textCol).isNotNull)
      .select(col(groupCol), col(idCol), split(col(textCol), " ").as("__t"))
      .filter(size(col("__t")) >= 3)
      .select(col(groupCol), col(idCol),
        explode(array_distinct(transform(sequence(lit(1), size(col("__t")) - 2),
          i => concat_ws(" ", element_at(col("__t"), i),
            element_at(col("__t"), i + 1), element_at(col("__t"), i + 2)))))
          .as("__tri"))
    // join-free attribution: a doc's novel count is how many trigrams
    // it WON in the first-occurrence (min id) table — no tri-keyed join
    // back to the posting rows
    val perDoc = tris.groupBy(col(groupCol), col(idCol))
      .agg(count(lit(1)).as("__ntri"))
    val novel = tris.groupBy(col("__tri")).agg(min(col(idCol)).as(idCol))
      .groupBy(col(idCol)).agg(count(lit(1)).as("__nnov"))
    perDoc.join(novel, Seq(idCol), "left")
      .withColumn("__nnov", coalesce(col("__nnov"), lit(0L)))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("__ntri")).as("sum_tri"),
           sum(col("__nnov")).as("sum_novel"))
      .withColumn("novelty",
        round(col("sum_novel").cast("double") / col("sum_tri").cast("double"), 6))
  }

  /** Collocation extraction by pointwise mutual information over
    * BIGRAM-marginal counts: PMI = ln(c2·N / (cl·cr)) with marginals
    * derived from the bigram count table itself, quantized to e6
    * micros (exact-integer log inputs ≤1e10 — exactly a double). The
    * corpus is tokenized once; everything after the vocab²-bounded
    * count shuffle runs on count tables; top-k is a TakeOrdered under
    * the TOTAL order (pmi desc, w1, w2). Out: (w1, w2, c2, pmi_e6). */
  def collocationsPmi(docs: DataFrame, textCol: String,
                      minCount: Int = 5, k: Int = 20): DataFrame = {
    require(minCount >= 1 && k >= 1)
    val toks = col("__t")
    val bg = docs.filter(col(textCol).isNotNull)
      .select(split(col(textCol), " ").as("__t"))
      .filter(size(toks) >= 2)
      .select(explode(transform(sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("w1"),
                    element_at(toks, i + 1).as("w2")))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c2 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      .localCheckpoint()
    val left = c2.groupBy(col("w1")).agg(sum(col("c2")).as("cl"))
    val right = c2.groupBy(col("w2")).agg(sum(col("c2")).as("cr"))
    val n = c2.agg(sum(col("c2")).as("n_bigrams"))
    c2.filter(col("c2") >= minCount)
      .join(left, "w1").join(right, "w2")
      .crossJoin(broadcast(n))
      .withColumn("pmi_e6", floor(
        log(col("c2").cast("double") * col("n_bigrams").cast("double") /
            (col("cl").cast("double") * col("cr").cast("double"))) * 1e6
        + 0.5).cast("long"))
      .select(col("w1"), col("w2"), col("c2"), col("pmi_e6"))
      .orderBy(col("pmi_e6").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** 12-bit dHash perceptual fingerprint of a binary payload column
    * (stub decode: md5 bytes as a 4×4 luma grid; a real decoder swaps
    * in the resized pixels, the gradient-bit construction stays). */
  def imagePhash(payload: Column): Column = {
    val h = md5(payload)
    def px(i: Int) = conv(substring(h, 1 + 2 * i, 2), 16, 10).cast("int")
    (for { r <- 0 until 4; c <- 0 until 3 } yield
      when(px(4 * r + c) > px(4 * r + c + 1), 1 << (3 * r + c)).otherwise(0))
      .reduce(_ + _).cast("long")
  }

  /** Greedy MMR diversity re-ranking (λ in tenths: score10 = λ·10·rel
    * on the first pick, λ·10·rel − (10−λ·10)·maxsim after). Selection
    * is unrolled into `k` relational argmax steps over a `poolK`-
    * bounded candidate set — no driver loop over rows; e6-integer
    * scores make every tie deterministic. In: corpus (id, vec) and
    * queries (qid, vec), vectors ARRAY<DOUBLE>. Out: (qid, pos, id,
    * mmr10_e6). */
  def mmrRerank(corpus: DataFrame, idCol: String, vecCol: String,
                queries: DataFrame, qidCol: String, qvecCol: String,
                poolK: Int = 8, k: Int = 3, lambdaTenths: Int = 7): DataFrame = {
    require(k >= 1 && poolK >= k, s"need 1 <= k <= poolK: k=$k poolK=$poolK")
    require(lambdaTenths >= 1 && lambdaTenths <= 9,
      s"lambdaTenths in [1,9]: $lambdaTenths")
    val (lam, lamC) = (lambdaTenths.toLong, 10L - lambdaTenths)
    val q = queries.select(col(qidCol).as("__qid"), col(qvecCol).as("__qv"))
    val byRel = Window.partitionBy(col("__qid")).orderBy(desc("__rel"), col("__id"))
    val cand = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .join(broadcast(q), col("__id") =!= col("__qid"))
      .withColumn("__rel", floor(VectorFns.dot(col("__qv"), col("__v")) * 1e6 + 0.5).cast("long"))
      .withColumn("__rk", row_number().over(byRel))
      .filter(col("__rk") <= poolK)
      .select(col("__qid"), col("__id"), col("__v"), col("__rel"))
      .localCheckpoint() // k self-joins below; bound the replanned lineage
    val pairs = cand.select(col("__qid"), col("__id").as("__a"), col("__v").as("__va"))
      .join(cand.select(col("__qid"), col("__id").as("__b"), col("__v").as("__vb")), Seq("__qid"))
      .filter(col("__a") =!= col("__b"))
      .select(col("__qid"), col("__a"), col("__b"),
              floor(VectorFns.dot(col("__va"), col("__vb")) * 1e6 + 0.5).cast("long").as("__sim"))
      .localCheckpoint()
    val byMmr = Window.partitionBy(col("__qid")).orderBy(desc("__mmr"), col("__id"))
    var out = cand.withColumn("__mmr", col("__rel") * 10)
      .withColumn("__r", row_number().over(byMmr)).filter(col("__r") === 1)
      .select(col("__qid"), lit(1L).as("pos"), col("__id"), col("__mmr"))
    for (p <- 2 to k) {
      val sel = out.select(col("__qid"), col("__id").as("__selid"))
      val maxSim = pairs
        .join(sel, pairs("__qid") === sel("__qid") && pairs("__b") === sel("__selid"))
        .select(pairs("__qid"), col("__a"), col("__sim"))
        .groupBy(col("__qid"), col("__a")).agg(max(col("__sim")).as("__maxsim"))
      val rest = cand.join(out.select(col("__qid"), col("__id")),
                           Seq("__qid", "__id"), "left_anti")
      val pick = rest.join(maxSim,
          rest("__qid") === maxSim("__qid") && rest("__id") === maxSim("__a"))
        .select(rest("__qid"), col("__id"), col("__rel"), col("__maxsim"))
        .withColumn("__mmr", col("__rel") * lam - col("__maxsim") * lamC)
        .withColumn("__r", row_number().over(byMmr)).filter(col("__r") === 1)
        .select(col("__qid"), lit(p.toLong).as("pos"), col("__id"), col("__mmr"))
      out = out.unionByName(pick).localCheckpoint()
    }
    out.select(col("__qid").as("qid"), col("pos"), col("__id").as("id"),
               col("__mmr").as("mmr10_e6"))
  }

  // ---- time-series / behavioral (wave 4) ---------------------------

  /** Lag-1 Pearson autocorrelation per key over an already-ordered
    * integer series. In: (keyCol, ordCol, valCol) with valCol exact
    * integers (quantize doubles first — see TimeSeriesOps). Out:
    * (keyCol, n_pairs, autocorr). The moments (n, Σx, Σy, Σxy, Σx²,
    * Σy²) accumulate as exact BIGINTs; the only float op is the final
    * closed form, so the result is engine- and order-independent. */
  def autocorrLag1(series: DataFrame, keyCol: String, ordCol: String,
                   valCol: String): DataFrame =
    acfAtLags(series, keyCol, ordCol, valCol, Seq(1))
      .select(col(keyCol), col("n_pairs"), col("autocorr"))

  /** Autocorrelation function at multiple row-lags per key — the ACF
    * table behind seasonality detection (a daily cycle on an hourly
    * series shows as a lag-24 peak). Per lag, Pearson r from the exact
    * closed form (n, Σx, Σy, Σxy, Σx², Σy² as BIGINT) — the
    * autocorrLag1 discipline, which delegates here. ALL lag columns
    * come from one window spec, so Spark computes them in a single
    * per-key sort pass; each lag then rolls up independently (map-side
    * partials; the union is |keys|×|lags| rows). Row-lag semantics:
    * gaps in the ord grid count as adjacent, same as lag-1. */
  def acfAtLags(series: DataFrame, keyCol: String, ordCol: String,
                valCol: String, lags: Seq[Int]): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(ordCol))
    val withLags = series.select(
      col(keyCol) +: col(valCol) +:
        lags.map(k => lag(col(valCol), k).over(byKey).as(s"__p$k")): _*)
    lags.map { k =>
      val p = col(s"__p$k")
      withLags.filter(p.isNotNull)
        .groupBy(col(keyCol))
        .agg(count(lit(1)).as("__n"),
             sum(col(valCol)).as("__sx"), sum(p).as("__sy"),
             sum(col(valCol) * p).as("__sxy"),
             sum(col(valCol) * col(valCol)).as("__sxx"),
             sum(p * p).as("__syy"))
        .select(col(keyCol), lit(k.toLong).as("lag"),
          col("__n").as("n_pairs"),
          ((col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
           sqrt((col("__n") * col("__sxx") - col("__sx") * col("__sx")).cast("double") *
                (col("__n") * col("__syy") - col("__sy") * col("__sy")).cast("double")))
            .as("autocorr"))
    }.reduce(_.union(_))
  }

  /** Mean-shift changepoint (binary segmentation's first split) per key:
    * argmax over split points t of |mean≤t − mean>t|·√(t(n−t)/n) on an
    * integer count series. In: (keyCol, ordCol, cntCol). Out: (keyCol,
    * split at ordCol value, score, mean_before, mean_after). */
  def changepointMeanShift(series: DataFrame, keyCol: String, ordCol: String,
                           cntCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(ordCol))
    val full = Window.partitionBy(col(keyCol))
    series
      .withColumn("__t", row_number().over(byKey).cast("long"))
      .withColumn("__cum", sum(col(cntCol)).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", count(lit(1)).over(full).cast("long"))
      .withColumn("__tot", sum(col(cntCol)).over(full))
      .filter(col("__t") < col("__n"))
      .withColumn("mean_before", col("__cum").cast("double") / col("__t"))
      .withColumn("mean_after",
        (col("__tot") - col("__cum")).cast("double") / (col("__n") - col("__t")))
      .withColumn("score",
        abs(col("mean_before") - col("mean_after")) *
        sqrt((col("__t") * (col("__n") - col("__t"))).cast("double") / col("__n")))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(desc("score"), col("__t"))))
      .filter(col("__rk") === 1)
      .select(col(keyCol), col(ordCol), col("score"),
              col("mean_before"), col("mean_after"))
  }

  /** Time-weighted average per key with piecewise-constant hold between
    * consecutive rows. In: (keyCol, tsCol timestamp, tieCol, valE2Col
    * integer centi-units). Out: (keyCol, wsum, dsum, n_intervals) —
    * caller divides wsum/dsum for the average (kept separate so the
    * outputs stay exact BIGINTs). */
  def timeWeightedSums(events: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, valE2Col: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__next_us", unix_micros(lead(col(tsCol), 1).over(byKey)))
      .filter(col("__next_us").isNotNull)
      .withColumn("__dur_us", col("__next_us") - unix_micros(col(tsCol)))
      .groupBy(col(keyCol))
      .agg(sum(col(valE2Col) * col("__dur_us")).as("wsum"),
           sum(col("__dur_us")).as("dsum"),
           count(lit(1)).as("n_intervals"))
  }

  /** Shannon entropy of each key's category mix, from exact counts.
    * Out: (keyCol, n_events, n_types, entropy, entropy_norm). The per-
    * term c·ln(c) quantizes to e6 BEFORE summing (order-independent). */
  def entropyByKey(df: DataFrame, keyCol: String, catCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol), col(catCol)).agg(count(lit(1)).as("__c"))
    counts.groupBy(col(keyCol))
      .agg(sum(col("__c")).as("__n"), count(lit(1)).as("__k"),
           sum(floor(col("__c") * log(col("__c")) * 1e6 + 0.5).cast("long"))
             .as("__clnc_e6"))
      .select(col(keyCol), col("__n").as("n_events"), col("__k").as("n_types"),
        (log(col("__n")) - col("__clnc_e6") / 1e6 / col("__n")).as("entropy"),
        when(col("__k") === 1, 0.0)
          .otherwise((log(col("__n")) - col("__clnc_e6") / 1e6 / col("__n")) /
                     log(col("__k"))).as("entropy_norm"))
  }

  /** Exact triangle census of an undirected graph given as one-sided
    * edges (aCol < bCol, distinct). Out: one row (n_nodes, n_edges,
    * n_triangles, transitivity).
    *
    * Degree-ordered orientation (node-iterator++): every edge points
    * from its lower-(degree, id) endpoint to the higher one, wedges
    * enumerate as ordered out-neighbor pairs of one source, and the
    * closing edge check is a single equi semi-join. Out-degree under
    * this orientation is O(√E), so wedge candidates are O(E^1.5)
    * instead of Σdeg² — on skewed real graphs (hub vertices) this is
    * the difference between hours and minutes; measured 8.0 s → sub-s
    * on the sf0.1 co-purchase graph. Triangle count is orientation-
    * invariant, so any reference implementation (or the DuckDB oracle's
    * id-oriented form) agrees exactly. */
  // ---- shared cross-query exchanges (round-9 amortization) ---------

  /** Session-scoped memo of expensive shared intermediates. Key =
    * (label, session identity, data dir); value = a localCheckpointed
    * DataFrame whose blocks live for the session. Cross-QUERY
    * amortization: a registry run (Verify/Bench) executes hundreds of
    * independent query closures in one session, and several families
    * (graph, dedup) each begin with the same expensive build — without
    * a memo each query re-runs it. At 100 TB the same role is played
    * by a persisted TABLE (the edge set / signature table is a curated
    * artifact, rebuilt on ingest, not per query); in-session
    * localCheckpoint is the single-JVM equivalent with the same
    * consumer-side contract: downstream plans start from materialized
    * blocks, never from the raw-scan lineage. */
  /** Outer map is keyed on the SparkSession OBJECT (reference equality
    * — identityHashCode collisions between two live sessions can't
    * alias). It is a WeakHashMap, but weak-key collection alone can
    * NOT reclaim entries here: each cached DataFrame value strongly
    * references its SparkSession (Dataset.sparkSession), so the value
    * chain reaches the key and pins it (r10 advice). The actual
    * reclaim path is therefore the explicit sweep below: every call
    * drops ALL entries whose context is stopped, so a multi-session
    * JVM (test suites stop sessions per suite) sheds dead sessions'
    * memos — and their localCheckpoint blocks — on the next memo use
    * by any live session. */
  private val sharedMemo: java.util.Map[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]())

  // ---- plan-ledger memo instrumentation (r10 verdict #1) -----------
  /** Scan fingerprint of each memoized exchange's PRE-checkpoint build
    * plan, keyed (label, dir). The checkpoint hides the upstream
    * parquet scan from any later plan walk — consumers see only a
    * `Scan ExistingRDD` — so pushdown/pruning regressions inside a
    * shared exchange would be invisible to PlanLedger without this:
    * the fingerprint (same structural counts as a ledger row) is
    * captured once at build time and dumped as a `memo:<label>` ledger
    * row, making the shared plans themselves diffable round-over-
    * round. */
  private val memoFingerprints =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()
  private[graft] def memoFingerprintsFor(dir: String): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    memoFingerprints.asScala.toSeq.collect {
      case ((l, d), v) if d == dir => l -> v }.sortBy(_._1)
  }

  /** Thread-local recorder of the memo labels a query's plan
    * CONSTRUCTION touches (memoizedExchange runs synchronously inside
    * the registered closure, so nested/transitive builds record too).
    * PlanLedger wraps each query build in [[recordTouchedMemos]] to
    * attribute `Scan ExistingRDD` leaves to their memo labels —
    * the `via_memo` ledger marker. */
  private val touchedMemoLabels = ThreadLocal.withInitial(
    () => scala.collection.mutable.LinkedHashSet.empty[String])
  private[graft] def recordTouchedMemos[T](body: => T): (T, Seq[String]) = {
    val set = touchedMemoLabels.get()
    set.clear()
    val r = body
    (r, set.toSeq.sorted)
  }

  /** Drop every memo whose session is stopped (its checkpoint blocks
    * died with the context; the plans are unservable). Runs on every
    * memo call — the map is |live sessions|-sized, so the sweep is a
    * few reference reads, and it is the ONLY reclaim path that works
    * (see the pinning note above). */
  private def sweepStoppedSessions(): Unit = sharedMemo.synchronized {
    val it = sharedMemo.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val k = e.getKey
      if (k != null && k.sparkContext.isStopped) it.remove()
    }
  }

  private[graft] def memoizedExchange(label: String, s: SparkSession,
      dir: String)(build: => DataFrame): DataFrame = {
    sweepStoppedSessions()
    val perSession = {
      val existing = sharedMemo.get(s)
      if (existing != null) existing
      else sharedMemo.synchronized {
        val again = sharedMemo.get(s)
        if (again != null) again
        else {
          val fresh = new java.util.concurrent.ConcurrentHashMap[
            (String, String), DataFrame]()
          sharedMemo.put(s, fresh)
          fresh
        }
      }
    }
    // A stopped-but-still-referenced session can't serve its cached
    // checkpoints (blocks are gone with the context); drop its memo so
    // a rebuild fails loudly in build rather than on a stale plan.
    if (s.sparkContext.isStopped) { sharedMemo.remove(s); perSession.clear() }
    touchedMemoLabels.get() += label
    val key = (label, dir)
    val cached = perSession.get(key)
    if (cached != null) cached
    else {
      // NOT computeIfAbsent: builds are reentrant (one memoized build
      // consumes another — jaccardPairs reads shingled), and a nested
      // computeIfAbsent on the same CHM throws "Recursive update".
      // putIfAbsent races at worst double-build one checkpoint; the
      // first registration wins and both callers converge on it.
      val df = build
      // fingerprint BEFORE the checkpoint erases the scan lineage;
      // put (not putIfAbsent): a REBUILD in a later session of the
      // same JVM must overwrite the old session's fingerprint, or a
      // ledger dumped from that JVM reports the stale plan's health
      memoFingerprints.put(key, graft.PlanStats.countsJson(df)): Unit
      val built = df.localCheckpoint()
      val prev = perSession.putIfAbsent(key, built)
      if (prev != null) prev else built
    }
  }

  /** The weighted part co-purchase pair table (a < b, w = number of
    * raw lineitem co-occurrences within an order) — the one
    * Θ(Σ basket²) self-join every graph query over the co-purchase
    * graph starts from, built ONCE per (session, dir) and
    * localCheckpointed (r8 verdict #1). Derivations are projections:
    * support-1 distinct edges = all rows; support-k = filter(w ≥ k).
    * The pair table is |distinct co-occurring pairs|-sized —
    * orders-of-magnitude smaller than lineitem — so materializing it
    * is cheap and every downstream query skips the basket-squared
    * shuffle. */
  def coPurchasePairs(s: SparkSession, dir: String): DataFrame =
    memoizedExchange("co_purchase_pairs", s, dir) {
      val li = graft.Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"))
      li.alias("x")
        .join(li.alias("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
        .groupBy(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
        .agg(count(lit(1)).as("w"))
    }

  /** Support-thresholded undirected-as-one-direction edge list (a < b)
    * of the co-purchase graph, from the shared [[coPurchasePairs]]
    * exchange. minSupport = 2 is the family-wide noise contract
    * (single-co-occurrence hub edges carry no signal and all of the
    * wedge cost). */
  def coPurchaseEdges(s: SparkSession, dir: String, minSupport: Int = 2): DataFrame =
    coPurchasePairs(s, dir)
      .filter(col("w") >= minSupport)
      .select(col("a"), col("b"))

  def triangleCensus(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges
      .select(col(aCol).cast("long").as("__a"), col(bCol).cast("long").as("__b"))
      .distinct()
      .localCheckpoint() // consumed 3× below (deg, adjacency, per-edge probe)
    val deg = e.select(col("__a").as("__v")).unionAll(e.select(col("__b").as("__v")))
      .groupBy(col("__v")).agg(count(lit(1)).as("__d"))
    val wedges = deg.agg(expr("sum(__d * (__d - 1)) div 2").as("n_wedges"),
                         count(lit(1)).as("n_nodes"))
    // Edge-iterator over id-oriented out-adjacency: triangle (a<b<c) is
    // counted exactly once, at edge (a,b), as c ∈ N⁺(a) ∩ N⁺(b). The
    // intersection is the codegen'd zero-alloc sorted-merge walk
    // (SortedIntersectCountLong) — wedge candidates NEVER materialize
    // as rows, so the shuffle volume is |E| adjacency-tagged edges
    // instead of Σdeg² wedge rows (measured 8.0 s → 1.3 s on the sf0.1
    // co-purchase graph vs the wedge-join form; the join-based variant
    // only wins when adjacency lists outgrow task memory — at that
    // scale, degree-orient first and split hub lists).
    val adj = e.groupBy(col("__a").as("__u"))
      .agg(sort_array(collect_list(col("__b"))).as("__nbrs"))
    val tri = e
      .join(adj.select(col("__u").as("__a"), col("__nbrs").as("__na")), "__a")
      .join(adj.select(col("__u").as("__b"), col("__nbrs").as("__nb")), "__b")
      .agg(coalesce(sum(graft.functions.SortedIntersectCount
             .sortedIntersectCountLong(col("__na"), col("__nb")).cast("long")),
           lit(0L)).as("n_triangles"))
    tri.crossJoin(broadcast(e.agg(count(lit(1)).as("n_edges"))))
      .crossJoin(broadcast(wedges))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        (lit(3.0) * col("n_triangles") / col("n_wedges")).as("transitivity"))
  }

  /** Per-document top-k terms by TF·IDF over whitespace tokens.
    * IDF quantizes to e6 (floor(ln((N+1)/(df+1))·1e6+0.5)) so scores
    * are exact BIGINTs with unambiguous ranking. Out: (idCol, rank,
    * term, score_e6). */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    val d = docs.filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
    val nDocs = d.agg(count(lit(1)).as("__n_corpus"))
    val tf = d.select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("__tf"))
    val idf = tf.groupBy(col("term").as("__df_term"))
      .agg(count(lit(1)).as("__df"))
      .crossJoin(broadcast(nDocs))
      .select(col("__df_term"),
        floor(log((col("__n_corpus") + 1).cast("double") / (col("__df") + 1)) * 1e6
              + 0.5).cast("long").as("__idf_e6"))
    tf.join(broadcast(idf), col("term") === col("__df_term"))
      .select(col(idCol), col("term"), (col("__tf") * col("__idf_e6")).as("score_e6"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(desc("score_e6"), col("term"))))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank").cast("long").as("rank"), col("term"),
              col("score_e6"))
  }

  /** Weighted without-replacement sample (Efraimidis–Spirakis A-ES) of
    * k rows: key = ln(u)/w with u a pure md5 function of idCol — no RNG
    * state, stable under re-partitioning and re-runs. Plans as a
    * distributed top-k (TakeOrderedAndProject). Out: input row + rank. */
  def weightedReservoir(df: DataFrame, idCol: String, weightCol: String,
                        k: Int): DataFrame = {
    val u32 = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("bigint")
    df.filter(col(weightCol) > 0)
      .withColumn("__key",
        log((u32 + 1).cast("double") / 4294967297.0) / col(weightCol))
      .orderBy(desc("__key"), col(idCol))
      .limit(k)
      // single-partition window is bounded: it runs AFTER limit(k),
      // over at most k rows
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("__key"), col(idCol))).cast("long"))
      .drop("__key")
  }

  /** Top principal component of an embedding corpus by fixed-round
    * power iteration — distributed PCA without collecting anything but
    * d-row vectors. Every aggregation accumulates EXACT integers:
    * covariance terms quantize to e9 per element-pair before the sum,
    * matvecs are BIGINT dot products, and the only doubles are scalar
    * normalization expressions computed identically by any engine from
    * those exact sums (the engine-determinism discipline: integer
    * aggregation kills order-dependence; identical scalar float
    * expressions are bit-reproducible everywhere).
    *
    * Plan shape: one posexplode self-join on the row id builds the d²
    * covariance entries (shuffle carries (row, i, x) — d·n rows, never
    * vectors²); each of the `iters` rounds is a broadcast matvec: the
    * d-row vector broadcasts, C never moves. At 100 TB: C_sum longs
    * would saturate at ~2^63/1e9 ≈ 9e9 rows per partition-sum — switch
    * the quantized sums to DecimalType(38,0) past that.
    *
    * In: df with vecCol array<float|double> of fixed dim d.
    * Out: (dim 1-based, pc1_e6) — the unit top-eigenvector quantized
    * to e6, sign fixed by the all-positive start vector. */
  def pcaTopComponent(df: DataFrame, idCol: String, vecCol: String,
                      iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters in [1,8]: $iters")
    val (cov, v0) = pcaCovAndStart(df, idCol, vecCol)
    var v = v0
    for (_ <- 1 to iters) {
      val w = pcaMatvec(cov, v)
      v = pcaUnit(w, pcaWs2(w)).localCheckpoint()
    }
    v.select((col("__vj") + 1).cast("int").as("dim"), col("__v_e6").as("pc1_e6"))
  }

  /** Shared pieces of the power iteration — ONE authoring path for the
    * fixed-depth key (pcaTopComponent) and the per-round convergence
    * books (pcaPowerBooks), so the two can never drift (the
    * emConvergenceSql / pagerankResidualSql discipline applied to the
    * Scala side of an iterative operator). */
  private def pcaCovAndStart(df: DataFrame, idCol: String,
      vecCol: String): (DataFrame, DataFrame) = {
    val x = df.select(col(idCol).as("__rid"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("__i", "__xd")))
      .select(col("__rid"), col("__i"),
        (floor(col("__xd") * 1e6 + 0.5) / 1e6).as("__x"))
    val m = x.groupBy(col("__i"))
      .agg(sum(floor(col("__x") * 1e6 + 0.5).cast("long")).as("__sum_e6"),
           count(lit(1)).as("__n"))
      .select(col("__i"), (col("__sum_e6") / 1e6 / col("__n")).as("__m"),
              col("__n"))
    val c = x.join(broadcast(m), "__i")
      .select(col("__rid"), col("__i"), (col("__x") - col("__m")).as("__c"))
    // d² covariance entries, e9-quantized per term BEFORE the sum
    val cov = c.alias("a").join(c.alias("b"), col("a.__rid") === col("b.__rid"))
      .groupBy(col("a.__i").as("__ci"), col("b.__i").as("__cj"))
      .agg(sum(floor(col("a.__c") * col("b.__c") * 1e9 + 0.5).cast("long"))
             .as("__cq"), count(lit(1)).as("__cn"))
      .select(col("__ci"), col("__cj"),
              floor(col("__cq") / col("__cn")).cast("long").as("__cr"))
      .localCheckpoint() // reused by every iteration; cut the self-join lineage
    val dims = df.select(size(col(vecCol))).head.getInt(0)
    val v0 = m.select(col("__i").as("__vj"),
      lit(math.floor(1e6 / math.sqrt(dims.toDouble)).toLong).as("__v_e6"))
    (cov, v0)
  }

  private def pcaMatvec(cov: DataFrame, v: DataFrame): DataFrame =
    cov.join(broadcast(v), col("__cj") === col("__vj"))
      .groupBy(col("__ci"))
      .agg(sum(col("__cr") * col("__v_e6")).as("__w"))

  private def pcaWs2(w: DataFrame): DataFrame =
    w.agg(sum(floor(col("__w") / 1e8).cast("long") *
              floor(col("__w") / 1e8).cast("long")).as("__ws2"))

  private def pcaUnit(w: DataFrame, nrm: DataFrame): DataFrame =
    w.crossJoin(broadcast(nrm))
      .select(col("__ci").as("__vj"),
        floor(col("__w") / (sqrt(col("__ws2").cast("double")) * 1e8) * 1e6 + 0.5)
          .cast("long").as("__v_e6"))

  /** Per-round convergence books for the SAME power iteration
    * pcaTopComponent runs (identical step functions — see
    * pcaCovAndStart): one row per round with the L1 / max motion of
    * the e6 unit vector and the round's exact matvec norm statistic
    * __ws2 (the quantity whose round-over-round ratio estimates λ₁²),
    * so the declared depth is MEASURED, not asserted — the r14
    * connected-components lesson (a fixed unroll whose adequacy
    * nothing checks) applied to the spectral family, exactly as
    * graph_pagerank_residual applied it to the rank family. All book
    * arithmetic is exact BIGINT on the e6-quantized vectors; no new
    * FP enters anywhere.
    *
    * Out: (round, l1_dv_e6, max_dv_e6, ws2) — one row per round,
    * round ordered. */
  def pcaPowerBooks(df: DataFrame, idCol: String, vecCol: String,
                    iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters in [1,8]: $iters")
    val (cov, v0) = pcaCovAndStart(df, idCol, vecCol)
    var v = v0
    val rows = (1 to iters).map { t =>
      val w = pcaMatvec(cov, v)
        .localCheckpoint(false) // feeds the unit step AND the ws2 book column
      val ws2 = pcaWs2(w)
      val next = pcaUnit(w, ws2).localCheckpoint(false)
      val row = next.select(col("__vj"), col("__v_e6").as("__vn"))
        .join(v.select(col("__vj"), col("__v_e6").as("__vp")), "__vj")
        .agg(lit(t.toLong).as("round"),
             sum(abs(col("__vn") - col("__vp"))).as("l1_dv_e6"),
             max(abs(col("__vn") - col("__vp"))).as("max_dv_e6"))
        .crossJoin(broadcast(ws2.select(col("__ws2").as("ws2"))))
      v = next
      row
    }
    rows.reduce(_.unionByName(_))
  }

  /** Fixed-round full-batch gradient descent for logistic regression —
    * the distributed TRAINING-step pattern (the optimizer loop a
    * data-parallel trainer runs, expressed relationally; same family
    * as pcaTopComponent). Exactness discipline: features quantize to
    * e6 BIGINTs once; each round's margin is an exact BIGINT dot
    * product; the sigmoid/residual is the only float (identical scalar
    * expression both engines); per-element gradient contributions
    * re-quantize to integers BEFORE the sum, so the weight vector after
    * every round is bit-identical on any engine.
    *
    * Plan per round: margins = one broadcast join of the d-row weight
    * vector + a rid-grouped exact sum; gradients = one broadcast join
    * of the n-row residual vector + a j-grouped exact sum. The feature
    * relation is localCheckpointed once and re-consumed; nothing but
    * d- and n-row vectors ever move to the driver side of a broadcast.
    * At 100 TB the residual outgrows a broadcast → the rid join becomes
    * a co-partitioned shuffle on the already-rid-keyed feature table.
    *
    * In: df with idCol, labelCol (0/1 int), vecCol array<float|double>.
    * Out: (dim 1-based, w_e6) — weights after `steps` rounds, lr=1. */
  def logisticGdSteps(df: DataFrame, idCol: String, labelCol: String,
                      vecCol: String, steps: Int = 3): DataFrame = {
    require(steps >= 1 && steps <= 8, s"steps in [1,8]: $steps")
    val (x, n, w0) = logregFeatures(df, idCol, labelCol, vecCol)
    var w = w0
    for (_ <- 1 to steps)
      w = logregNextW(x, n, w).localCheckpoint()
    w.select((col("__wj") + 1).cast("int").as("dim"), col("__we").as("w_e6"))
  }

  /** Shared pieces of the GD loop — one authoring path for the
    * fixed-depth key (logisticGdSteps) and the per-round convergence
    * books (logisticGdBooks); same rationale as pcaCovAndStart. */
  private def logregFeatures(df: DataFrame, idCol: String, labelCol: String,
      vecCol: String): (DataFrame, DataFrame, DataFrame) = {
    val x = df.select(col(idCol).as("__rid"), col(labelCol).cast("int").as("__y"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("__j", "__xd")))
      .select(col("__rid"), col("__y"), col("__j"),
        floor(col("__xd") * 1e6 + 0.5).cast("long").as("__xe"))
      .localCheckpoint() // consumed 2× per round
    val n = df.agg(count(lit(1)).as("__nn"))
    val w0 = x.select(col("__j").as("__wj")).distinct()
      .select(col("__wj"), lit(0L).as("__we"))
    (x, n, w0)
  }

  private def logregMargins(x: DataFrame, w: DataFrame): DataFrame =
    x.join(broadcast(w), col("__j") === col("__wj"))
      .groupBy(col("__rid"), col("__y"))
      .agg(sum(col("__we") * col("__xe")).as("__mq"))

  private def logregNextW(x: DataFrame, n: DataFrame, w: DataFrame): DataFrame =
    logregUpdate(x, n, w, logregMargins(x, w))

  /** One GD update from a PRE-COMPUTED margins frame — the books twin
    * pins each round's margins once and feeds it to both the book row
    * and this update (the margins of round t ARE the pre-update
    * margins of round t+1; recomputing them per consumer was the one
    * redundancy the session self-review found). */
  private def logregUpdate(x: DataFrame, n: DataFrame, w: DataFrame,
      margins: DataFrame): DataFrame = {
    val resid = margins.select(col("__rid"),
      (lit(1.0) / (lit(1.0) + exp(-(col("__mq") / 1e12))) - col("__y")).as("__rr"))
    val grad = x.join(broadcast(resid), "__rid")
      .groupBy(col("__j"))
      .agg(sum(floor(col("__rr") * col("__xe") + 0.5).cast("long")).as("__gq"))
    w.join(grad, col("__wj") === col("__j"))
      .crossJoin(broadcast(n))
      .select(col("__wj"),
        (col("__we") - floor(col("__gq") / col("__nn") + 0.5).cast("long"))
          .as("__we"))
  }

  /** Per-round convergence books for the SAME full-batch GD loop
    * logisticGdSteps runs (identical step functions — see
    * logregFeatures): one row per round with the L1 / max weight
    * motion and the post-round training accuracy, so the declared
    * depth is measured, not asserted — the graph_pagerank_residual
    * discipline applied to the training-step family. Every book
    * column is EXACT: weight motion is BIGINT arithmetic on the e6
    * weights, and accuracy comes from the SIGN of the exact BIGINT
    * margin (prediction = margin > 0; a zero margin predicts the
    * negative class — pinned convention), so no float summation or
    * transcendental enters the report anywhere — the one float in the
    * loop (the sigmoid residual) stays inside the weight update,
    * where it is already the declared identical-scalar-expression
    * compromise.
    *
    * Out: (round, l1_dw_e6, max_dw_e6, n_correct, n_rows, acc_e6). */
  def logisticGdBooks(df: DataFrame, idCol: String, labelCol: String,
                      vecCol: String, steps: Int = 3): DataFrame = {
    require(steps >= 1 && steps <= 8, s"steps in [1,8]: $steps")
    val (x, n, w0) = logregFeatures(df, idCol, labelCol, vecCol)
    var w = w0
    // each round's margins are computed ONCE: round t's post-update
    // margins feed its accuracy row AND round t+1's update
    var m = logregMargins(x, w)
    val rows = (1 to steps).map { t =>
      val next = logregUpdate(x, n, w, m)
        .localCheckpoint(false) // feeds the book row AND the next round
      val mNext = logregMargins(x, next)
        .localCheckpoint(false) // feeds the accuracy row AND next update
      val motion = next.select(col("__wj"), col("__we").as("__wn"))
        .join(w.select(col("__wj"), col("__we").as("__wp")), "__wj")
        .agg(lit(t.toLong).as("round"),
             sum(abs(col("__wn") - col("__wp"))).as("l1_dw_e6"),
             max(abs(col("__wn") - col("__wp"))).as("max_dw_e6"))
      val acc = mNext
        .agg(count(when((col("__mq") > 0) === (col("__y") === 1), 1))
               .as("n_correct"),
             count(lit(1)).as("n_rows"))
      val row = motion.crossJoin(broadcast(acc))
        .select(col("round"), col("l1_dw_e6"), col("max_dw_e6"),
                col("n_correct"), col("n_rows"),
                expr("n_correct * 1000000 div n_rows").as("acc_e6"))
      w = next
      m = mNext
      row
    }
    rows.reduce(_.unionByName(_))
  }

  /** Weekly cohort retention matrix. In: (keyCol, tsCol). Out:
    * (cohort_week, week_offset, n_active, n_cohort, retention). */
  def cohortRetention(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val userWeeks = events
      .select(col(keyCol).as("__k"), date_trunc("WEEK", col(tsCol)).as("__week"))
      .distinct()
    val cohorts = userWeeks.groupBy(col("__k")).agg(min(col("__week")).as("cohort_week"))
    val cells = userWeeks.join(cohorts, "__k")
      .withColumn("week_offset",
        expr("datediff(__week, cohort_week) div 7").cast("long"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("__k")).as("n_active"))
    val sizes = cells.filter(col("week_offset") === 0)
      .select(col("cohort_week").as("__cw"), col("n_active").as("n_cohort"))
    cells.join(broadcast(sizes), col("cohort_week") === col("__cw"))
      .select(col("cohort_week"), col("week_offset"), col("n_active"), col("n_cohort"),
        (col("n_active").cast("double") / col("n_cohort")).as("retention"))
  }

  /** CDC change-feed by snapshot diff (the inverse of an SCD1 apply):
    * full-outer join two keyed snapshots of identical schema, classify
    * each key I/U/D by side-presence, and keep U rows only when some
    * tracked column actually changed (null-safe compare). Value columns
    * come back suffixed `_before`/`_after`. One co-partitioned join on
    * the entity key — the lake-without-a-transaction-log CDC bootstrap. */
  /** Native merge_asof (pandas semantics: direction backward /
    * forward / nearest, optional tolerance, exact matches allowed) —
    * the union-sort discipline the three as-of queries shared, now
    * extracted once (r7 verdict #8a). Instead of a per-row range join
    * (O(L×R) per key, un-broadcastable when both sides are large),
    * both sides are tagged and UNIONed, ONE shuffle on the key sorts
    * (ts, side, tie), and the match is carried by cumulative
    * IGNORE-NULLS last()/first() — shuffle volume |L|+|R|, no join
    * explosion, all window specs share a single sort. Side ordering at
    * equal ts admits exact matches per direction (right-first for
    * backward/nearest, left-first for forward); `tieCol` must be
    * unique per side so the carried value is deterministic.
    *
    * Output: every left column, plus `asof_matched` (BOOLEAN),
    * `asof_gap_us` (BIGINT, right_ts − left_ts: ≤0 backward, ≥0
    * forward, signed nearest with ties to backward; NULL when
    * unmatched) and `asof_<c>` for each right value column (NULL when
    * unmatched). Timestamps compare in exact integer microseconds —
    * the match verdict has no FP anywhere. */
  def mergeAsof(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, tieCol: String, rightValueCols: Seq[String],
      direction: String = "backward",
      toleranceUs: Long = Long.MaxValue): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val lCols = left.columns.toSeq
    def us(df: DataFrame, c: String): Column =
      if (df.schema(c).dataType.typeName == "timestamp") unix_micros(col(c))
      else col(c).cast("long")
    val rightSide = if (direction == "forward") 1 else 0
    val lTagged = rightValueCols.foldLeft(
      left.select(col(keyCol).as("__k"), us(left, tsCol).as("__ts"),
        col(tieCol).cast("long").as("__tie"), lit(1 - rightSide).as("__side"),
        struct(lCols.map(col): _*).as("__lrow"))) { (d, c) =>
      d.withColumn(s"__rv_$c", lit(null).cast(right.schema(c).dataType))
    }
    val lrowType = lTagged.schema("__lrow").dataType
    val rTagged = right.select(
      col(keyCol).as("__k") +: us(right, tsCol).as("__ts") +:
      col(tieCol).cast("long").as("__tie") +: lit(rightSide).as("__side") +:
      lit(null).cast(lrowType).as("__lrow") +:
      rightValueCols.map(c => col(c).as(s"__rv_$c")): _*)
    val u = lTagged.unionByName(rTagged)
    val ord = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__tie"))
    val back = ord.rowsBetween(Window.unboundedPreceding, 0)
    // forward carry via the REVERSED running frame (see
    // gapFillInterpolate): first-non-null over [0, unboundedFollowing]
    // ASC ≡ last-non-null over [unboundedPreceding, 0] with every sort
    // key reversed ((__ts, __side, __tie) is a total order per key, so
    // the flip is exact). Avoids Spark's per-row-rescan
    // UnboundedFollowingWindowFunctionFrame — O(n²) in the size of one
    // key's union — for the incremental O(n) running frame; identical
    // values, one extra in-partition sort, no extra exchange.
    val fwd = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").desc, col("__side").desc, col("__tie").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    def rOnly(c: Column) = when(col("__side") === rightSide, c)
    val withB =
      if (direction == "forward") u
      else rightValueCols.foldLeft(
        u.withColumn("__bts", last(rOnly(col("__ts")), ignoreNulls = true).over(back))) {
        (d, c) => d.withColumn(s"__b_$c",
          last(rOnly(col(s"__rv_$c")), ignoreNulls = true).over(back))
      }
    val withF =
      if (direction == "backward") withB
      else rightValueCols.foldLeft(
        withB.withColumn("__fts", last(rOnly(col("__ts")), ignoreNulls = true).over(fwd))) {
        (d, c) => d.withColumn(s"__f_$c",
          last(rOnly(col(s"__rv_$c")), ignoreNulls = true).over(fwd))
      }
    val leftOnly = withF.filter(col("__side") =!= rightSide)
    val picked = direction match {
      case "backward" =>
        rightValueCols.foldLeft(
          leftOnly.withColumn("__mts", col("__bts"))) { (d, c) =>
          d.withColumn(s"__m_$c", col(s"__b_$c")) }
      case "forward" =>
        rightValueCols.foldLeft(
          leftOnly.withColumn("__mts", col("__fts"))) { (d, c) =>
          d.withColumn(s"__m_$c", col(s"__f_$c")) }
      case "nearest" =>
        // backward wins ties — same CASE on both engines
        val useB = col("__bts").isNotNull && (col("__fts").isNull ||
          (col("__ts") - col("__bts")) <= (col("__fts") - col("__ts")))
        rightValueCols.foldLeft(
          leftOnly.withColumn("__mts", when(useB, col("__bts")).otherwise(col("__fts")))) {
          (d, c) => d.withColumn(s"__m_$c",
            when(useB, col(s"__b_$c")).otherwise(col(s"__f_$c"))) }
    }
    val gap = col("__mts") - col("__ts")
    val matched = col("__mts").isNotNull &&
      (if (toleranceUs == Long.MaxValue) lit(true) else abs(gap) <= lit(toleranceUs))
    val outCols = lCols.map(c => col("__lrow").getField(c).as(c)) ++
      Seq(matched.as("asof_matched"), when(matched, gap).as("asof_gap_us")) ++
      rightValueCols.map(c => when(matched, col(s"__m_$c")).as(s"asof_$c"))
    picked.select(outCols: _*)
  }

  def snapshotDiffFeed(before: DataFrame, after: DataFrame, keyCol: String): DataFrame = {
    val vcols = before.columns.filterNot(_ == keyCol).toSeq
    require(after.columns.toSet == before.columns.toSet,
      "snapshotDiffFeed: snapshots must share a schema")
    val b = before.select((col(keyCol).as("__kb") +:
      vcols.map(c => col(c).as(s"${c}_before"))): _*)
    val a = after.select((col(keyCol).as("__ka") +:
      vcols.map(c => col(c).as(s"${c}_after"))): _*)
    val changed = vcols.map(c => !(col(s"${c}_before") <=> col(s"${c}_after")))
      .reduce(_ || _)
    b.join(a, col("__kb") === col("__ka"), "full_outer")
      .select((coalesce(col("__kb"), col("__ka")).as(keyCol) +:
        when(col("__kb").isNull, lit("I")).when(col("__ka").isNull, lit("D"))
          .otherwise(lit("U")).as("op") +:
        vcols.flatMap(c => Seq(col(s"${c}_before"), col(s"${c}_after")))): _*)
      .filter(col("op") =!= "U" || changed)
  }

  /** Small-file compaction plan by offset binning: pack files (rows of
    * metadata) in `idCol` order within each `partCol` into bins of
    * `targetBytes` via bin = floor(cum_before / target) — the
    * FilePartition packing rule as a window expression. Returns one row
    * per (partition, bin) with the file census. Runs over metadata
    * only; the rewrite this plan drives is a repartition write. */
  def compactionPlan(files: DataFrame, partCol: String, idCol: String,
      sizeCol: String, targetBytes: Long): DataFrame = {
    val w = Window.partitionBy(col(partCol)).orderBy(col(idCol))
    files.select(col(partCol), col(idCol), col(sizeCol))
      .withColumn("__cum", sum(col(sizeCol)).over(w))
      .withColumn("bin", expr(s"(__cum - $sizeCol) div $targetBytes"))
      .groupBy(col(partCol), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col(sizeCol)).as("bin_bytes"),
           min(col(idCol)).as(s"first_$idCol"), max(col(idCol)).as(s"last_$idCol"))
  }

  /** One-vs-rest Kolmogorov–Smirnov drift per group: D = sup over the
    * shared value grid of |ECDF_g − ECDF_rest|, with both ECDFs kept as
    * exact cumulative integer counts and the sup compared via
    * cross-multiplied BIGINTs — FP only in the final statistic. The
    * grid is |groups|×|distinct values| (histogram-sized, never the
    * corpus). Returns (group, n, d_num, ks). */
  def ksDriftOneVsRest(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val cnt = df.groupBy(col(groupCol).as("__g"), col(valCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val vals = cnt.select(col("__v")).distinct()
    val grps = cnt.groupBy(col("__g")).agg(sum(col("__c")).as("__ng"))
    val tot = cnt.groupBy(col("__v")).agg(sum(col("__c")).as("__cv"))
      // single-partition window is bounded: |distinct values| rows
      // (the shared ECDF grid), a histogram — never the corpus
      .withColumn("__cumAll", sum(col("__cv")).over(
        Window.orderBy(col("__v")).rowsBetween(Window.unboundedPreceding, 0)))
    val ntot = cnt.agg(sum(col("__c")).as("__nt"))
    grps.crossJoin(vals)
      .join(cnt, Seq("__g", "__v"), "left")
      .withColumn("__cc", coalesce(col("__c"), lit(0L)))
      .withColumn("__cumG", sum(col("__cc")).over(
        Window.partitionBy(col("__g")).orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .join(tot.select(col("__v"), col("__cumAll")), Seq("__v"))
      .crossJoin(broadcast(ntot))
      .withColumn("__dnum", abs(col("__cumG") * (col("__nt") - col("__ng")) -
                                (col("__cumAll") - col("__cumG")) * col("__ng")))
      .groupBy(col("__g"))
      .agg(max(col("__ng")).as("n"), max(col("__dnum")).as("d_num"),
           max(col("__nt")).as("__nt2"))
      // one-vs-rest is undefined when a group IS the whole corpus
      // (n == nt ⇒ divide-by-zero: Spark's non-ANSI div yields NULL
      // while DuckDB raises — drop the degenerate group on both sides)
      .filter(col("n") < col("__nt2"))
      .select(col("__g").as(groupCol), col("n"), col("d_num"),
        round(col("d_num").cast("double") /
              (col("n") * (col("__nt2") - col("n"))).cast("double"), 6).as("ks"))
  }

  /** Dense-grid gap fill with exact-rational linear interpolation: per
    * key, a sequence() spine from first to last observed ordinate, a
    * left join of observations, bidirectional IGNORE-NULLS neighbor
    * walks (one exchange for both), and interpolant (prev·(nm−m) +
    * next·(m−pm))·1e6 div (nm−pm) in pure BIGINT. Returns ONLY the
    * filled gap rows: (key, ord, interp_e6). */
  def gapFillInterpolate(series: DataFrame, keyCol: String, ordCol: String,
      valCol: String): DataFrame = {
    val obs = series.select(col(keyCol).as("__k"), col(ordCol).as("__m"),
      col(valCol).as("__x"))
    val spine = obs.groupBy(col("__k"))
      .agg(min(col("__m")).as("__mn"), max(col("__m")).as("__mx"))
      .select(col("__k"), explode(sequence(col("__mn"), col("__mx"))).as("__m"))
    val wPrev = Window.partitionBy(col("__k")).orderBy(col("__m"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // forward neighbor via the REVERSED running frame: first-non-null
    // over [1, unboundedFollowing] ASC ≡ last-non-null over
    // [unboundedPreceding, -1] with the ordering reversed (__m is
    // unique per key, so the reversal is an exact total-order flip).
    // Spark executes [.., unboundedFollowing] frames with
    // UnboundedFollowingWindowFunctionFrame, which RESCANS the frame
    // remainder per row — O(n²) per partition (43k-minute spines →
    // ~1e9 aggregate updates per type); the reversed frame is the
    // incremental UnboundedPrecedingWindowFunctionFrame — O(n), one
    // extra in-partition sort, zero extra exchanges, identical values.
    val wNextRev = Window.partitionBy(col("__k")).orderBy(col("__m").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    spine.join(obs, Seq("__k", "__m"), "left")
      .withColumn("__pv", last(col("__x"), ignoreNulls = true).over(wPrev))
      .withColumn("__pm", last(when(col("__x").isNotNull, col("__m")),
        ignoreNulls = true).over(wPrev))
      .withColumn("__nv", last(col("__x"), ignoreNulls = true).over(wNextRev))
      .withColumn("__nm", last(when(col("__x").isNotNull, col("__m")),
        ignoreNulls = true).over(wNextRev))
      .filter(col("__x").isNull)
      .select(col("__k").as(keyCol), col("__m").as(ordCol),
        expr("(__pv * (__nm - __m) + __nv * (__m - __pm)) * 1000000" +
             " div (__nm - __pm)").as("interp_e6"))
  }

  /** Daily growth curve: (day, n_active, n_new, cum_users) from one
    * (key, day) dedup pass; the cumulative window runs over the
    * |days|-row result. */
  def growthCurve(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val ud = events.select(col(keyCol).as("__k"),
        date_trunc("DAY", col(tsCol)).cast("date").as("day")).distinct()
    val act = ud.groupBy(col("day")).agg(count(lit(1)).as("n_active"))
    val newU = ud.groupBy(col("__k")).agg(min(col("day")).as("__fday"))
      .groupBy(col("__fday").as("day")).agg(count(lit(1)).as("n_new"))
    act.join(newU, Seq("day"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      // single-partition window is bounded: |distinct days| rows —
      // calendar-sized (decades fit in thousands of rows)
      .withColumn("cum_users", sum(col("n_new")).over(
        Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Common-neighbors link prediction over an undirected a<b edge list:
    * top-k NON-adjacent pairs by shared-neighbor count with exact
    * e6-rational Jaccard. Wedge-join candidate generation (Σ deg²,
    * never |V|²), anti join against the edge set, unique-key
    * tie-break. */
  def commonNeighbors(edges: DataFrame, aCol: String, bCol: String,
      k: Int): DataFrame = {
    val e = edges.select(col(aCol).as("__ea"), col(bCol).as("__eb")).distinct()
    val adj = e.select(col("__ea").as("__u"), col("__eb").as("__v"))
      .union(e.select(col("__eb").as("__u"), col("__ea").as("__v")))
    val deg = adj.groupBy(col("__u")).agg(count(lit(1)).as("__deg"))
    val cn = adj.alias("p")
      .join(adj.alias("q"), col("p.__u") === col("q.__u") && col("p.__v") < col("q.__v"))
      .groupBy(col("p.__v").as("a"), col("q.__v").as("c"))
      .agg(count(lit(1)).as("cn"))
    cn.join(e, cn("a") === e("__ea") && cn("c") === e("__eb"), "left_anti")
      .join(deg.select(col("__u").as("a"), col("__deg").as("deg_a")), Seq("a"))
      .join(deg.select(col("__u").as("c"), col("__deg").as("deg_c")), Seq("c"))
      .select(col("a"), col("c"), col("cn"), col("deg_a"), col("deg_c"),
        expr("cn * 1000000 div (deg_a + deg_c - cn)").as("jaccard_e6"))
      .orderBy(col("cn").desc, col("jaccard_e6").desc, col("a"), col("c"))
      .limit(k)
  }

  /** First-A → first-subsequent-B conversion latency histogram in whole
    * hours: two min-aggregates chained through one co-partitioned join,
    * exact epoch-second integers, strict ts ordering. */
  def conversionLatency(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, fromType: String, toType: String): DataFrame = {
    val first = events.filter(col(typeCol) === fromType)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("__vts"))
    events.filter(col(typeCol) === toType)
      .join(first, Seq(keyCol))
      .filter(col(tsCol) > col("__vts"))
      .groupBy(col(keyCol), col("__vts"))
      .agg(min(col(tsCol)).as("__pts"))
      .select(expr("(CAST(__pts AS LONG) - CAST(__vts AS LONG)) div 3600")
        .as("latency_h"))
      .groupBy(col("latency_h"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** HITS hubs & authorities (Kleinberg 1999) on a bipartite edge set,
    * two unrolled power iterations kept in EXACT BIGINT arithmetic by
    * skipping per-round normalization (scores are scale-invariant
    * rankings). Returns (authCol, a1, a2): a1 = indegree, a2 = the
    * second-iteration authority mass. Each iteration is one equi-join
    * of the score vector with the edge list plus a sum-by-key. */
  def hitsAuthorities(edges: DataFrame, hubCol: String, authCol: String): DataFrame = {
    // PINNED (r15 opt, guide §2.4): `e` feeds three passes (a1, h1, a2)
    // and a1 feeds two — un-pinned, every consumer replayed the
    // caller's edge build (for graph_hits_bipartite an orders⋈lineitem
    // join + distinct, 16 parquet scans in the before-plan). The edge
    // checkpoint is |E|-narrow; a1 is |authorities|-narrow.
    val e = edges.select(col(hubCol).as("__hc"), col(authCol).as("__ha")).distinct()
      .localCheckpoint(false)
    val a1 = e.groupBy(col("__ha")).agg(count(lit(1)).as("a1"))
      .localCheckpoint(false)
    val h1 = e.join(a1, "__ha").groupBy(col("__hc")).agg(sum(col("a1")).as("h1"))
    val a2 = e.join(h1, "__hc").groupBy(col("__ha")).agg(sum(col("h1")).as("a2"))
    a2.join(a1, "__ha")
      .select(col("__ha").as(authCol), col("a1"), col("a2"))
  }

  /** Gini concentration of per-unit integer totals within each group:
    * G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over units ranked ascending
    * (unit id tiebreak), presented as one exact e6 floor-division.
    * Input valCol must already be an integer unit (cents, bytes);
    * returns (groupCol, n, total, gini_e6). */
  def giniByGroup(df: DataFrame, groupCol: String, unitCol: String,
      valCol: String): DataFrame = {
    val spend = df.groupBy(col(groupCol), col(unitCol))
      .agg(sum(col(valCol)).as("__x"))
    spend.withColumn("__i", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("__x"), col(unitCol)))
        .cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("total"),
           sum(col("__i") * col("__x")).as("__sum_ix"))
      // Degenerate-group guard (ADVICE r8, mirrored in the oracle):
      // total ≤ 0 makes the division 0-denominated (Spark div → NULL,
      // DuckDB // → error) or negative (truncate-vs-floor mismatch);
      // Gini is undefined there, so the group is excluded on BOTH
      // engines. The numerator clamp covers negative-input groups that
      // still sum positive (a_theil_by_type's greatest discipline).
      .filter(col("total") > 0)
      .select(col(groupCol), col("n"), col("total"), expr(
        "(greatest(2 * __sum_ix - (n + 1) * total, 0L) * 1000000) div (n * total)")
        .as("gini_e6"))
  }

  /** Spearman rank correlation (tie-broken by idCol) between two
    * numeric columns within each group, as the nested floor-division
    * rational rho_e6 = 1e6 − ((6Σd²·1e3) div (n(n+1)) · 1e3) div (n−1)
    * — one documented evaluation order both engines replay exactly.
    * Returns (groupCol, n, sum_d2, rho_e6) for groups with n > 1. */
  /** Benjamini–Hochberg step-up over an m-row p-value table: appends
    * `bh_rank` (1-based ascending-p rank, keyCol tie-break) and
    * `rejected` (1 for every rank ≤ max{i : p_(i)·m ≤ i·alphaE6}).
    * Comparisons are pure integers on e6-scaled p-values, so the
    * decision vector is engine-exact; the windows run over the m-row
    * table — callers hand in one row per HYPOTHESIS (a per-feature
    * test family), never row-grain data. The step-up max matters: a
    * naive per-i threshold filter misses the case where a later rank
    * re-qualifies everything below it (spec-asserted). */
  def bhStepUp(df: DataFrame, keyCol: String, pE6Col: String,
      alphaE6: Long = 100000L): DataFrame = {
    val wAll = Window.partitionBy(lit(1))
    df.withColumn("__m", count(lit(1)).over(wAll))
      .withColumn("bh_rank", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col(pE6Col), col(keyCol)))
        .cast("long"))
      .withColumn("__k", max(when(
          col(pE6Col) * col("__m") <= col("bh_rank") * alphaE6,
          col("bh_rank")).otherwise(0L)).over(wAll))
      .withColumn("rejected", (col("bh_rank") <= col("__k")).cast("long"))
      .drop("__m", "__k")
  }

  def spearmanByGroup(df: DataFrame, groupCol: String, idCol: String,
      xCol: String, yCol: String): DataFrame = {
    val rx = row_number().over(
      Window.partitionBy(col(groupCol)).orderBy(col(xCol), col(idCol)))
    val ry = row_number().over(
      Window.partitionBy(col(groupCol)).orderBy(col(yCol), col(idCol)))
    df.withColumn("__rx", rx).withColumn("__ry", ry)
      .withColumn("__d", (col("__rx") - col("__ry")).cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("__d") * col("__d")).as("sum_d2"))
      .filter(col("n") > 1)
      .select(col(groupCol), col("n"), col("sum_d2"), expr(
        "1000000 - (((6 * sum_d2 * 1000) div (n * (n + 1))) * 1000) div (n - 1)")
        .as("rho_e6"))
  }

  /** Exact decision-stump training (1-feature threshold classifiers)
    * over the first nDims vector components: for each dim, every
    * realizable threshold (a cut between consecutive DISTINCT sorted
    * values) is scored in one window pass and the
    * (error, threshold, polarity)-minimal stump wins via struct-min —
    * the relational form of the classic sorted-scan stump trainer, no
    * candidate re-sort, all integer arithmetic. For a cut after sorted
    * row i, the predict-positive-above stump errs
    * err_A(i) = 2·cumPos(i) − i + negTotal (positives below the cut
    * plus negatives above it); the inverted stump is its complement
    * n − err_A. Returns (dim, thr_e6, polarity, n_errors, acc_e6) with
    * thresholds e6-quantized for presentation only (ranking uses the
    * raw double sort). Scale: rows = nDims·|corpus| hash-partitioned by
    * dim; the per-dim ordered walk is the same per-group prefix-sum
    * pattern as the quantile family (two-pass rank at 100 TB; window
    * form here, bounded by |corpus| per dim). */
  def decisionStump(df: DataFrame, idCol: String, labelCol: String,
      vecCol: String, nDims: Int): DataFrame = {
    val rows = df
      .select(col(idCol).as("__id"), col(labelCol).cast("long").as("__y"),
              posexplode(expr(s"slice($vecCol, 1, $nDims)"))
                .as(Seq("__d0", "__x0")))
      .select((col("__d0") + 1).cast("long").as("dim"),
              col("__x0").cast("double").as("__x"), col("__id"), col("__y"))
    val ord = Window.partitionBy(col("dim")).orderBy(col("__x"), col("__id"))
    val all = Window.partitionBy(col("dim"))
    rows
      .withColumn("__cum_pos", sum(col("__y")).over(ord))
      .withColumn("__i", row_number().over(ord).cast("long"))
      .withColumn("__nx", lead(col("__x"), 1).over(ord))
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("__pos", sum(col("__y")).over(all))
      .filter(col("__nx").isNull || col("__nx") > col("__x"))
      .withColumn("__err_a",
        lit(2L) * col("__cum_pos") - col("__i") + (col("__n") - col("__pos")))
      .withColumn("__err", least(col("__err_a"), col("__n") - col("__err_a")))
      .withColumn("__pol",
        when(col("__err_a") <= col("__n") - col("__err_a"), 1L).otherwise(0L))
      .withColumn("__thr_e6", floor(col("__x") * 1e6 + 0.5).cast("long"))
      .groupBy(col("dim"))
      .agg(min(struct(col("__err"), col("__thr_e6"), col("__pol"))).as("__m"),
           max(col("__n")).as("__cnt"))
      .select(col("dim"), col("__m.__thr_e6").as("thr_e6"),
              col("__m.__pol").as("polarity"), col("__m.__err").as("n_errors"),
              expr("(__cnt - __m.__err) * 1000000 div __cnt").as("acc_e6"))
  }

  /** RAKE keyword extraction (Rose et al. 2010) with a corpus-derived
    * stoplist — the stopTopN highest-TOTAL-frequency tokens (frequency
    * desc, token tiebreak), the classic "most frequent words are
    * function words" adaptation. (A document-frequency rule like
    * ta_stopword_discovery's is the alternative; on corpora whose df
    * distribution is flat it stops everything, while the frequency
    * top-N always yields a proper segmentation.) Candidate phrases are
    * maximal stopword-free token runs, word score = deg/freq as an
    * exact e6 floor-division, phrase score = the sum of its words'
    * scores. Returns the top-k distinct phrases as
    * (phrase, n_words, n_occ, score_e6). */
  def rakeKeywords(docs: DataFrame, idCol: String, textCol: String,
      k: Int, stopTopN: Int = 5): DataFrame = {
    val d = docs.filter(col(textCol).isNotNull)
    val toks = d
      .select(col(idCol).as("__doc"),
              posexplode(split(col(textCol), " ")).as(Seq("__pos", "__tok")))
      .filter(col("__tok") =!= "")
    val stop = toks
      .groupBy(col("__tok")).agg(count(lit(1)).as("__tf"))
      .orderBy(col("__tf").desc, col("__tok")).limit(stopTopN)
      .select(col("__tok"), lit(1).as("__is_stop"))
    val seg = toks.join(broadcast(stop), Seq("__tok"), "left")
      .withColumn("__sf", coalesce(col("__is_stop"), lit(0)))
      .withColumn("__pid", sum(col("__sf")).over(
        Window.partitionBy(col("__doc")).orderBy(col("__pos"))))
      .filter(col("__sf") === 0)
    val wl = seg.withColumn("__plen", count(lit(1)).over(
      Window.partitionBy(col("__doc"), col("__pid"))))
    val ws = wl.groupBy(col("__tok"))
      .agg(count(lit(1)).as("__freq"), sum(col("__plen")).as("__deg"))
      .select(col("__tok"), expr("__deg * 1000000 div __freq").as("__ws_e6"))
    wl.join(ws, "__tok")
      .groupBy(col("__doc"), col("__pid"))
      .agg(
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col("__pos"), col("__tok")))),
          x => x.getField("__tok"))).as("phrase"),
        count(lit(1)).as("n_words"),
        sum(col("__ws_e6")).as("score_e6"))
      .groupBy(col("phrase"))
      .agg(max(col("n_words")).as("n_words"), count(lit(1)).as("n_occ"),
           max(col("score_e6")).as("score_e6"))
      .select(col("phrase"), col("n_words"), col("n_occ"), col("score_e6"))
      .orderBy(col("score_e6").desc, col("phrase")).limit(k)
  }

  /** One-pass expectation evaluation: each rule is a BOOLEAN violation
    * predicate; the whole suite is a single conditional aggregation
    * over `df` (count + one counter per rule), unpivoted to one row
    * per rule AFTER the reduction — output is O(#rules), never
    * O(rows). Single-sources `dq_expectation_suite`'s per-table
    * passes. */
  def expectationRules(df: DataFrame, tbl: String,
      rules: Seq[(String, Column)],
      uniqueRules: Seq[(String, Column)] = Nil): DataFrame = {
    require(rules.nonEmpty || uniqueRules.nonEmpty,
      "expectationRules: at least one rule or uniqueness key is required")
    // rule names are spliced into a selectExpr stack() as '$name' — a
    // quote or other SQL metacharacter would break parsing or silently
    // alter the expression on this public facade (r12 advice), so
    // names are restricted to identifier characters up front
    (rules ++ uniqueRules).foreach { case (name, _) =>
      require(name.matches("[A-Za-z0-9_]+"),
        s"expectationRules: rule name must match [A-Za-z0-9_]+: '$name'")
    }
    val predAggs = rules.zipWithIndex.map { case ((_, pred), i) =>
      count(when(pred, 1)).as(s"__v$i")
    }
    val uniqAggs = uniqueRules.zipWithIndex.map { case ((_, key), i) =>
      countDistinct(key).as(s"__d$i")
    }
    val aggs = predAggs ++ uniqAggs :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = (rules.zipWithIndex
        .map { case ((name, _), i) => s"'$name', __v$i" } ++
      uniqueRules.zipWithIndex
        .map { case ((name, _), i) => s"'$name', __n - __d$i" })
      .mkString(", ")
    one.selectExpr(
        s"stack(${rules.size + uniqueRules.size}, $stackArgs)" +
          " AS (expectation, violations)",
        "__n AS checked")
      .select(lit(tbl).as("tbl"), col("expectation"), col("violations"),
              col("checked"),
              (col("violations") === 0).cast("int").as("ok"))
  }

  /** Grid-bucketed nearest neighbor over integer points: snap to a
    * `pitch`-sized grid, join candidates through the 3×3 neighbor-cell
    * equi keys, exact integer distances, per-point argmin in a
    * PARTITIONED window. `cap` limits each cell to its K md5-ranked
    * representatives on the candidate side — the spatial analog of the
    * LSH hot-band cap: worst-case candidate volume 9K per probe
    * regardless of skew. Single-sources `geo_grid_knn` (cap = None)
    * and `geo_grid_knn_capped`. */
  def gridKnn(points: DataFrame, idCol: String, xCol: String, yCol: String,
      pitch: Long, cap: Option[Int] = None): DataFrame = {
    require(pitch > 0, s"gridKnn: pitch must be positive, got $pitch")
    // FLOOR division (integer-exact, signed-safe): `div` truncates
    // toward zero, which would double-width the cell at the origin for
    // callers with negative coordinates and diverge from the standard
    // grid definition (and the DuckDB `//` oracle replay)
    // (c - pmod(c, p)) is exactly divisible by p, so truncating `div`
    // equals floor division — all-integer, no double round-trip
    def cellOf(c: String) = expr(s"($c - pmod($c, $pitch)) div $pitch")
    val cells = points.select(
        col(idCol).as("__id"), col(xCol).as("__xi"), col(yCol).as("__yi"))
      .withColumn("__cx", cellOf("__xi"))
      .withColumn("__cy", cellOf("__yi"))
    gridKnnFromCells(cells, idCol, cap)
  }

  /** [[gridKnn]] with the pitch DERIVED from a cell-occupancy target
    * instead of hand-chosen (r12 verdict #1: a fixed pitch is
    * density-quadratic — candidate volume is n·9ρ and ρ grows linearly
    * with input at fixed pitch, so a human must re-choose the constant
    * at every scale-up). One count picks the COARSEST power-of-two
    * pitch from the ladder whose mean occupancy n·pitch²/span² stays
    * ≤ `targetOccupancy` — the dedup_minhash_band_tuning shape: the
    * layout knob is measured from the data, never assumed. The pick is
    * a 1-row broadcast scalar (pure integer inequality, no logs, no
    * floats), so the whole derivation stays inside the plan — no
    * driver-side collect. With occupancy bounded, candidate volume is
    * ≤ 9·targetOccupancy per probe in EXPECTATION at any n; worst-case
    * skew is still unbounded (md5 coordinates are uniform here) — the
    * capped variant remains the adversarial hard bound. The ladder
    * spans the full coordinate space (pitch 1 ⇒ span² cells), so no
    * input density within the space can outgrow it. Output carries the
    * chosen `pitch` as a constant column. */
  def gridKnnAutoPitch(points: DataFrame, idCol: String, xCol: String,
      yCol: String, span: Long = 65536L, targetOccupancy: Long = 8L,
      cap: Option[Int] = None): DataFrame = {
    val pick = autoPitch(points, span, targetOccupancy)
    val cells = points.select(
        col(idCol).as("__id"), col(xCol).as("__xi"), col(yCol).as("__yi"))
      .crossJoin(broadcast(pick))
      .withColumn("__cx", expr("(__xi - pmod(__xi, pitch)) div pitch"))
      .withColumn("__cy", expr("(__yi - pmod(__yi, pitch)) div pitch"))
    gridKnnFromCells(cells, idCol, cap, carry = Seq("pitch"))
  }

  /** The occupancy-ladder pitch derivation on its own (r13 seed #2 —
    * reused by [[gridKnnAutoPitch]] and the heatmap raster): one count
    * picks the COARSEST power-of-two pitch from the ladder whose mean
    * cell occupancy n·pitch²/span² stays ≤ `targetOccupancy`, as a
    * 1-row DataFrame ready for a broadcast cross. Pure integer
    * inequality (no logs, no floats), entirely inside the plan — no
    * driver-side collect. */
  def autoPitch(points: DataFrame, span: Long,
      targetOccupancy: Long): DataFrame = {
    require(span > 0 && (span & (span - 1)) == 0,
      s"autoPitch: span must be a positive power of two, got $span")
    require(targetOccupancy > 0, "autoPitch: targetOccupancy must be positive")
    val s = points.sparkSession
    val ladder = s.createDataFrame(
        Iterator.iterate(span / 4)(_ / 2).takeWhile(_ >= 1L)
          .map(Tuple1(_)).toSeq)
      .toDF("pitch")
    val n = points.agg(count(lit(1)).as("__n"))
    // coarsest pitch with n·pitch² ≤ target·span² (⇔ mean occupancy ≤
    // target); n ≤ span² by pigeonhole on distinct points, so pitch=1
    // always qualifies and the coalesce floor never binds on real
    // input. The inequality evaluates in DECIMAL(38,0) on BOTH sides:
    // target·span² wraps silently in Long for span ≥ 2³¹ (degrading
    // the pick to 1 with no error — r13 self-review), and n·pitch²
    // can exceed 2⁶³ for large spans too; decimal is exact to 10³⁸,
    // far past any representable input (n ≤ span² ≤ 2⁶², pitch² ≤
    // 2⁶⁰ ⇒ products < 10³⁷).
    val occCap = (BigDecimal(targetOccupancy) * BigDecimal(span) *
      BigDecimal(span)).bigDecimal
    ladder.crossJoin(n)
      .where(col("__n").cast("decimal(38,0)") *
             col("pitch") * col("pitch") <= lit(occCap))
      .agg(coalesce(max(col("pitch")), lit(1L)).as("pitch"))
  }

  /** Shared tail of the grid-kNN family: 3×3 neighbor-cell candidate
    * join, exact integer distances, per-point argmin in a PARTITIONED
    * window. `cells` carries __id/__xi/__yi/__cx/__cy (+ any `carry`
    * columns, constant per input, echoed on the output). */
  private def gridKnnFromCells(cells: DataFrame, idCol: String,
      cap: Option[Int], carry: Seq[String] = Nil): DataFrame = {
    val bSide = cap.fold(cells) { k =>
      cells.withColumn("__rn", row_number().over(
          Window.partitionBy(col("__cx"), col("__cy"))
            .orderBy(md5(concat(col("__id").cast("string"), lit(":cap"))),
                     col("__id"))))
        .where(col("__rn") <= k).drop("__rn")
    }.select(col("__id").as("__nb"), col("__xi").as("__bxi"),
             col("__yi").as("__byi"), col("__cx").as("__bcx"),
             col("__cy").as("__bcy"))
    val offs = array((-1 to 1).map(lit): _*)
    val probes = cells
      .withColumn("__dx", explode(offs))
      .withColumn("__dy", explode(offs))
      .select(Seq(col("__id"), col("__xi"), col("__yi"),
              (col("__cx") + col("__dx")).as("__ncx"),
              (col("__cy") + col("__dy")).as("__ncy")) ++
              carry.map(col): _*)
    val cand = probes.join(bSide,
        col("__bcx") === col("__ncx") && col("__bcy") === col("__ncy") &&
          col("__nb") =!= col("__id"))
      .select(Seq(col("__id"), col("__nb"),
              ((col("__xi") - col("__bxi")) * (col("__xi") - col("__bxi")) +
               (col("__yi") - col("__byi")) * (col("__yi") - col("__byi")))
                .as("dist2")) ++ carry.map(col): _*)
    val w = Window.partitionBy(col("__id"))
    cand
      .withColumn("__rnk", row_number().over(
        w.orderBy(col("dist2"), col("__nb"))))
      .withColumn("n_candidates", count(lit(1)).over(w))
      .where(col("__rnk") === 1)
      .select(Seq(col("__id").as(idCol), col("__nb").as("nn_" + idCol),
              col("dist2"), col("n_candidates")) ++ carry.map(col): _*)
  }

  /** Connected-component labels to FIXPOINT over a SYMMETRIC (a, b)
    * edge list — returns (v, lbl) with lbl = the component's min id
    * (the true components, so a consumer's oracle replays them
    * engine-independently: recursive reachability + min, no depth
    * coupling). Two paths behind one measured size guard, the
    * GraphFrames discipline:
    *
    *  - |E| ≤ `localEdgeThreshold` (default 1M pairs ≈ 16 MB): ONE
    *    bounded collect + driver union-find with path compression —
    *    exact in O(E α(E)). Iterative CC on a subgraph this small is
    *    all scheduling: the distributed round was measured at a FIXED
    *    ~0.2-0.35 s of driver floor (Catalyst planning in a DataFrame
    *    loop, DAG submission in an RDD loop — substrate-independent)
    *    × ~13 rounds at sf0.1's giant component, 4.5 s to label 30k
    *    edges. The collect is the repo's declared bounded-driver
    *    pattern: the bound is the guard itself.
    *  - above the guard: HashMin + pointer jumping on
    *    RDD[(Long, Long)] (Pregel-class iteration is the imperative
    *    kernel RDDs exist for; a DataFrame loop re-pays full Catalyst
    *    planning every round for a data-dependent round count no
    *    unroll can amortize). Partitioner sized to ~50k edges/task,
    *    conf-bounded upward. Per-round cost is one co-partitioned
    *    join + reduceByKey + one jump self-join; labels only decrease
    *    under min-propagation, so the per-round BigInt label sum is
    *    an exact convergence witness (one small action per round).
    *    `maxRounds` = 64 is a safety bound (pointer doubling covers
    *    diameter 2⁶⁴).
    *
    * Round14Spec pins the two paths equal on the sf0.01 core graph.
    * Backs geo_dbscan_label. */
  def connectedComponentLabels(symEdges: DataFrame,
      maxRounds: Int = 64,
      localEdgeThreshold: Long = 1000000L): DataFrame = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    val s = symEdges.sparkSession
    // edges keyed by destination: (b, a) — the propagation join side
    val edgesRaw = symEdges
      .select(col("a").cast("long"), col("b").cast("long"))
      .rdd.map(r => (r.getLong(1), r.getLong(0)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val eCount = edgesRaw.count()
    if (eCount <= localEdgeThreshold) {
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      val pairs = edgesRaw.collect()
      edgesRaw.unpersist(blocking = false)
      pairs.foreach { case (b, a) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val labels = parent.keys.toArray.map(v => (v, find(v)))
      s.createDataFrame(s.sparkContext.parallelize(labels.toSeq))
        .toDF("v", "lbl")
    } else {
      val confPart = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
      val nPart = math.max(1L,
        math.min(confPart.toLong, eCount / 50000L + 1L)).toInt
      val part = new HashPartitioner(nPart)
      val edges = edgesRaw.partitionBy(part)
        .persist(StorageLevel.MEMORY_AND_DISK)
      var labels: RDD[(Long, Long)] = edges.values.distinct(nPart)
        .map(v => (v, v))
        .partitionBy(part)
        .persist(StorageLevel.MEMORY_AND_DISK)
      def lblSum(r: RDD[(Long, Long)]): BigInt =
        r.values.map(BigInt(_)).fold(BigInt(0))(_ + _)
      var prev = lblSum(labels)
      var done = false
      var i = 0
      while (!done && i < maxRounds) {
        // HashMin step: min neighbor label per vertex, folded into own
        val nb = edges.join(labels)
          .map { case (_, (a, lblB)) => (a, lblB) }
          .reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
        val prop = labels.leftOuterJoin(nb, part)
          .mapValues { case (l, o) => math.min(l, o.getOrElse(l)) }
        // pointer jump: lbl ← lbl(lbl) — every label is a vertex id,
        // so the indirection is one self-join doubling propagated
        // distance per round
        val jumped = prop.map { case (v, l) => (l, v) }
          .join(prop, part)
          .map { case (_, (v, ll)) => (v, ll) }
          .partitionBy(part)
          .persist(StorageLevel.MEMORY_AND_DISK)
        jumped.localCheckpoint() // truncate lineage: the DAGScheduler
        // re-walks the full ancestry on every job otherwise
        val cur = lblSum(jumped) // labels only decrease, so an
        done = cur == prev       // unchanged sum ⟺ unchanged labeling
        labels.unpersist(blocking = false)
        prev = cur
        labels = jumped
        i += 1
      }
      // Release the loop's persisted RDDs BEFORE any failure exit: the
      // no-fixpoint path must not leak MEMORY_AND_DISK blocks into the
      // session (a caller that catches and retries would accumulate
      // them — the very class the r14 advice flagged).
      edgesRaw.unpersist(blocking = false)
      edges.unpersist(blocking = false)
      // An unconverged labeling is the exact plausible-but-wrong class
      // this fixpoint exists to remove (r14 advice): never return it
      // silently. Unreachable in practice — pointer doubling covers
      // diameter 2^64 at maxRounds = 64 — but if it ever fires the
      // caller must know, not ship under-merged components.
      if (!done) {
        labels.unpersist(blocking = false)
        throw new IllegalArgumentException(
          s"requirement failed: connectedComponentLabels: no fixpoint " +
            s"after $maxRounds rounds")
      }
      // Eagerly localCheckpoint the RESULT DataFrame, then release the
      // loop's final RDD (r14 advice: repeated calls in one session
      // otherwise accumulate MEMORY_AND_DISK blocks that nothing ever
      // unpersists). The checkpoint is one extra pass over |V| label
      // rows; the returned frame owns its own blocks from here.
      val out = s.createDataFrame(labels).toDF("v", "lbl").localCheckpoint()
      labels.unpersist(blocking = false)
      out
    }
  }

  /** SHA-tagged, sentinel-idempotent fixture/snapshot directory: tag =
    * SHA-256 of the canonical data dir path PLUS a cheap content stamp
    * (per-file relative path, size, mtime — r13 advice: a path-only tag
    * silently serves stale snapshots when data is regenerated in
    * place; with the stamp, regenerating the dir mints a fresh tag and
    * the snapshot rebuilds), written ONCE by `write(outPath)` then
    * never rewritten. The build lands in a WRITER-private temp root
    * (pid + thread id — two threads of one process must not share a
    * tmp path, r13 advice) that is ATOMICALLY renamed into place: a
    * reader globbing across tag dirs (dq_schema_drift's oracle) can
    * never observe a half-written fixture. If the rename loses a
    * concurrent first-build race, the loser re-checks the sentinel and
    * returns the winner's fixture instead of propagating. Temp roots
    * from CRASHED runs (embedded pid no longer alive) are swept before
    * building; a live foreign builder's tmp is never touched.
    * Single-sources the schema-drift, profile-drift, and
    * stats-snapshot fixtures.
    *
    * `recipeVersion` is folded into the tag (r14 advice): the stamp
    * detects DATA changes, not CODE changes — without a version, a
    * write()-recipe fix keeps serving the pre-fix fixture on any
    * checkout with a warm target/graft_file_fixtures. Bump the
    * caller's version whenever its write() recipe changes semantics;
    * the global format constant below additionally re-mints every tag
    * when the tag scheme itself changes.
    *
    * Known stamp limitation (documented per r14 advice, accepted): the
    * content stamp is (path, size, mtime-millis) metadata only. A
    * regeneration that preserves all three — identical byte sizes on a
    * coarse-mtime filesystem, or an mtime-preserving copy/untar —
    * reuses the old snapshot without error. That is the same contract
    * every mtime-based build cache makes; a real lake would put its
    * snapshot/commit id here, and the test SF dirs are written by a
    * generator that never preserves mtimes. */
  private val fixtureTagFormat = "gf2" // bump to re-mint ALL fixture tags
  private val fixtureTmpSeq = new java.util.concurrent.atomic.AtomicLong()
  def snapshotFixtureDir(name: String, dataDir: String,
      recipeVersion: Int = 1)
      (write: String => Unit): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // race-tolerant: a CONCURRENT sweeper may delete entries between
    // our list/exists/delete calls (two builders can both see a dead
    // pid's temp root — r14 self-review), so a vanished file is
    // success, not an error
    def wipe(f: java.io.File): Unit = {
      val kids = f.listFiles
      if (kids != null) kids.foreach(wipe)
      if (f.exists && !f.delete() && f.exists)
        sys.error(s"could not delete fixture: $f")
    }
    val canonical = Paths.get(dataDir).toAbsolutePath.normalize
    // content stamp: (relative path, size, mtime-millis) per regular
    // file, sorted — O(file count) metadata reads, no data I/O. The
    // test SF dirs hold tens of files; a real lake catalog would use
    // its snapshot/commit id here, same role.
    val stamp = {
      val sb = new StringBuilder
      if (Files.isDirectory(canonical)) {
        val walk = Files.walk(canonical)
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator.asScala
            .filter(Files.isRegularFile(_))
            .map(p => s"${canonical.relativize(p)}|${Files.size(p)}|" +
              s"${Files.getLastModifiedTime(p).toMillis}")
            .toSeq.sorted.foreach(l => sb.append(l).append('\n'))
        } finally walk.close()
      }
      sb.toString
    }
    val tag = java.security.MessageDigest.getInstance("SHA-256")
      .digest((s"$fixtureTagFormat/$recipeVersion\u0000" +
          canonical.toString + " " + stamp)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(12).map(b => f"$b%02x").mkString
    val base = new java.io.File("target/graft_file_fixtures").getAbsoluteFile
    val root = new java.io.File(base, s"${name}_$tag")
    val sentinel = root.toPath.resolve(".complete")
    val out = root.toPath.resolve("data").toString
    if (!Files.exists(sentinel)) {
      // NO wipe(root) here (r14 self-review): the rename below is
      // atomic, so a root can only ever exist COMPLETE — and wiping on
      // a stale !sentinel read would delete a concurrent winner's
      // finished fixture out from under its reader. A root that
      // somehow exists without a sentinel fails the rename loudly
      // instead.
      // Sweep ABANDONED temp roots for this fixture NAME under ANY tag
      // (a crashed build's tag dies with the data dir that minted it,
      // so a tag-scoped sweep would never reclaim it): only roots
      // whose embedded pid is dead — an alive foreign pid may be
      // mid-build and its tmp must not be wiped out from under it
      Option(base.listFiles).getOrElse(Array.empty).foreach { f =>
        val n = f.getName
        val marker = n.lastIndexOf("_tmp_")
        if (n.startsWith(s".${name}_") && marker >= 0) {
          val pid = n.substring(marker + 5).takeWhile(_.isDigit)
          val alive = pid.nonEmpty && {
            val h = ProcessHandle.of(pid.toLong)
            h.isPresent && h.get.isAlive
          }
          if (!alive && pid != ProcessHandle.current.pid.toString) wipe(f)
        }
      }
      // temp roots start with '.' so fixture globs (name_*/data/...)
      // can never match an in-progress build; pid + an atomic
      // per-process counter makes the path unique per concurrent
      // builder (thread ids can be reused after thread death)
      val tmp = new java.io.File(base,
        s".${name}_${tag}_tmp_${ProcessHandle.current.pid}_" +
          fixtureTmpSeq.incrementAndGet)
      wipe(tmp)
      Files.createDirectories(tmp.toPath)
      write(tmp.toPath.resolve("data").toString)
      Files.write(tmp.toPath.resolve(".complete"), Array.emptyByteArray)
      try Files.move(tmp.toPath, root.toPath, StandardCopyOption.ATOMIC_MOVE)
      catch { case e: java.nio.file.FileSystemException =>
        // lost a concurrent first-build race: the winner's fixture is
        // complete (sentinel present) — discard ours and use theirs
        if (Files.exists(sentinel)) wipe(tmp) else throw e
      }
    }
    out
  }

  /** CUPED readout (Deng et al. 2013) from a per-unit frame of
    * (covariate x, metric y, arm ∈ {0,1}): SRM χ² gate as an
    * e6-quantized INTEGER inequality, pooled θ, adjusted effect and
    * variance-reduction ratio — every double derived from exact
    * integer sufficient statistics, so any two engines (or summation
    * orders) agree bit-for-bit. Single-sources
    * `stat_cuped_ab_effect`'s tail. */
  def cupedReadout(perUnit: DataFrame, xCol: String, yCol: String,
      armCol: String): DataFrame =
    cupedReadoutBy(perUnit, xCol, yCol, armCol, Nil)

  /** [[cupedReadout]] at a grouped grain — one CUPED/CUPAC row per
    * stratum (`byCols`), each stratum's θ fitted from its OWN exact
    * sufficient statistics. The cross-products accumulate in
    * DECIMAL(38,0), not BIGINT (r12 advice): non-ANSI BIGINT products
    * wrap SILENTLY on overflow while the DuckDB oracle errors loudly —
    * decimal is exact up to 10³⁸ (any product of two longs fits), and
    * past that Spark yields NULL, which fails the gate loudly instead
    * of emitting a plausible-but-wrong θ. Single-sources
    * `stat_cupac_stratified`. */
  def cupedReadoutBy(perUnit: DataFrame, xCol: String, yCol: String,
      armCol: String, byCols: Seq[String]): DataFrame = {
    val x = col(xCol).cast("decimal(38,0)")
    val y = col(yCol).cast("decimal(38,0)")
    val arm = col(armCol)
    val zero = lit(0L).cast("decimal(38,0)")
    val aggs = Seq(
      count(lit(1)).as("n"),
      sum(when(arm === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(arm === 1, 1L).otherwise(0L)).as("n_b"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(x * x).as("sxx"), sum(x * y).as("sxy"), sum(y * y).as("syy"),
      sum(when(arm === 0, x).otherwise(zero)).as("sx_a"),
      sum(when(arm === 1, x).otherwise(zero)).as("sx_b"),
      sum(when(arm === 0, y).otherwise(zero)).as("sy_a"),
      sum(when(arm === 1, y).otherwise(zero)).as("sy_b"))
    val stats =
      if (byCols.isEmpty) perUnit.agg(aggs.head, aggs.tail: _*)
      else perUnit.groupBy(byCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val den = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val deny = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    def adj(syArm: String, sxArm: String, nArm: String) =
      col(syArm).cast("double") / col(nArm) -
        (num / den) * (col(sxArm).cast("double") / col(nArm) -
                       col("sx").cast("double") / col("n"))
    stats.select(byCols.map(col) ++ Seq(
      col("n"), col("n_a"), col("n_b"),
      expr("(n_a - n_b) * (n_a - n_b) * 1000000 div (n_a + n_b)")
        .as("srm_chi2_e6"),
      ((col("n_a") - col("n_b")) * (col("n_a") - col("n_b")) * lit(1000000L) >
        lit(3841459L) * (col("n_a") + col("n_b"))).cast("int").as("srm_flag"),
      round(num / den, 6).as("theta_r6"),
      round(col("sy_a").cast("double") / col("n_a") -
            col("sy_b").cast("double") / col("n_b"), 6).as("effect_raw_r6"),
      round(adj("sy_a", "sx_a", "n_a") - adj("sy_b", "sx_b", "n_b"), 6)
        .as("effect_cuped_r6"),
      round((num * num) / (den * deny), 6).as("var_reduction_r6")): _*)
  }
}
