package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Ingestion/catalog operators (SURVEY.md §2.1-§2.8, reference
  * `aws_bucket.py` + `testing/check_bucket_files.py`).
  *
  * The reference walks an S3 listing imperatively — suffix filters
  * (`aws_bucket.py:176`), dedup-vs-state anti membership (`:180-182`),
  * per-year census (`check_bucket_files.py:56-59`), extension histograms
  * (`:126-132`), top-N preview per year (`:104-109`). Here the "catalog"
  * is a DataFrame and each of those loops becomes one declarative op that
  * Catalyst pushes into the parquet scan. The documents/orders/events
  * tables play the role of the object listing; where the reference's
  * key-shape matters (extensions, path stems) we derive a deterministic
  * synthetic key from stable columns so the op is exercised for real.
  *
  * Scale notes (100 TB): every query here is scan → (pushed) filter →
  * partial agg → tiny shuffle. No wide row ever crosses the exchange:
  * aggregations are map-side combined, top-N per group is a window over
  * the group key (shuffle bounded by the grouping cardinality), and the
  * anti join broadcasts the small "state" side.
  */
object CatalogOps {

  /** Deterministic synthetic object key per document, covering the key
    * shapes the reference filters on (`aws_bucket.py:176`,
    * `transcription.py:431-432`, `check_bucket_files.py:129`):
    * nested prefixes, mixed-case audio extensions, non-audio, and
    * extensionless keys. SQL twin in [[keySql]]. */
  private def keyCol = concat(
    lit("data/"), col("source"), lit("/doc_"), col("doc_id"),
    element_at(
      array(lit(".webm"), lit(".mp3"), lit(".txt"), lit(".WAV"), lit("")),
      (col("doc_id") % 5 + 1).cast("int")))

  private val keySql =
    "concat('data/', source, '/doc_', doc_id, " +
      "list_extract(['.webm','.mp3','.txt','.WAV',''], (doc_id % 5 + 1)::INT))"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // M0 flagship: corpus census. F5 non-empty filter (embedding_engine.py:64-68)
    // + A1-shaped groupBy census.
    "m0_corpus_census" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(length(trim(col("text"))) > 0)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_chars")).as("total_chars"),
             round(avg(col("n_chars")), 2).as("avg_chars"))
        .orderBy(col("lang"))),

    // F1: suffix predicate (aws_bucket.py:176 `key.lower().endswith`).
    "f1_suffix_filter" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(lower(col("source")).endsWith("1"))
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))),

    // F2: multi-extension audio predicate (transcription.py:431-432).
    "f2_multi_ext_filter" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("key", keyCol)
        .withColumn("ext",
          regexp_extract(lower(col("key")), "\\.(webm|mp3|wav|m4a|flac|ogg)$", 1))
        .filter(col("ext") =!= "")
        .groupBy(col("ext")).count()
        .orderBy(col("ext"))),

    // F4: year predicate (check_bucket_files.py:112-114). Written as a
    // range, not year(col)=1997: an opaque function call never reaches
    // PushedFilters, a range does — at 100 TB that's the difference
    // between skipping row groups at the footer and decoding the year
    // column for every row.
    "f4_year_filter" -> ((s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .agg(count(lit(1)).as("n_orders"),
             round(sum(col("o_totalprice")), 2).as("total_price"))),

    // P1: catalog projection (check_bucket_files.py:50-54).
    "p1_catalog_projection" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey").as("key"),
                col("o_totalprice").as("size"),
                year(col("o_orderdate")).as("year"),
                col("o_orderdate").as("last_modified"))
        .orderBy(col("key")).limit(100)),

    // P2: unit-conversion projection (bytes→MB, check_bucket_files.py:105).
    "p2_unit_conversion" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), round(col("n_chars") / 1024.0, 6).as("size_kb"))
        .orderBy(col("doc_id")).limit(200)),

    // P3: path-stem projection (transcription.py:349, embedding_engine.py:60).
    "p3_path_stem" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("key", keyCol)
        .select(col("doc_id"),
                regexp_extract(col("key"), "([^/]+)\\.[^.]+$", 1).as("stem"))
        .orderBy(col("doc_id")).limit(200)),

    // P4: extension projection with 'no extension' default
    // (check_bucket_files.py:129).
    "p4_extension" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("key", keyCol)
        .select(col("doc_id"),
          when(col("key").contains("."),
               lower(regexp_extract(col("key"), "\\.([^.]+)$", 1)))
            .otherwise("no extension").as("ext"))
        .orderBy(col("doc_id")).limit(200)),

    // A1+O1: group-by-year count, newest first (check_bucket_files.py:56-86).
    "a1_count_by_year" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).as("year")).count()
        .orderBy(desc("year"))),

    // A2+O2: extension histogram sorted by count desc
    // (check_bucket_files.py:126-132).
    "a2_ext_histogram" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("key", keyCol)
        .withColumn("ext",
          when(col("key").contains("."),
               lower(regexp_extract(col("key"), "\\.([^.]+)$", 1)))
            .otherwise("no extension"))
        .groupBy(col("ext")).count()
        .orderBy(desc("count"), col("ext"))),

    // A3/A4: conditional counts in one pass (check_bucket_files.py:39-80,
    // main.py:57-88 success/failure counters).
    "a3_conditional_counts" -> ((s, dir) =>
      Tables.events(s, dir)
        .agg(count(lit(1)).as("n_total"),
             count(when(col("event_type") === "error", 1)).as("n_error"),
             count(when(col("value") > 100.0, 1)).as("n_big"),
             countDistinct(col("user_id")).as("n_users"))),

    // A6: max aggregate (latest year, check_bucket_files.py:119).
    "a6_max_year" -> ((s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F")
        .agg(max(year(col("o_orderdate"))).as("latest_year"))),

    // A8: distinct-set aggregate (aws_bucket.py:62 `set`).
    "a8_distinct" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("lang")).distinct()
        .orderBy(col("lang"))),

    // A9: group-collect, explicitly ordered inside the aggregate
    // (check_bucket_files.py:93-99; collect_list is unordered in a
    // distributed engine so the order is imposed by sort_array).
    "a9_group_collect" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(col("doc_id") < 100)
        .groupBy(col("lang"))
        .agg(array_join(
               transform(sort_array(collect_list(col("doc_id"))),
                         x => x.cast("string")), ",").as("doc_ids"))
        .orderBy(col("lang"))),

    // J2/F3: anti join vs downloaded-state (aws_bucket.py:180-182):
    // new keys = listed − already-downloaded. The "state" side (every 7th
    // doc, the reference's downloaded_files.json stand-in) is small →
    // broadcast, so the listing side never shuffles.
    "j2_anti_join" -> ((s, dir) => {
      val listed = Tables.documents(s, dir).select(col("doc_id"), col("source"))
      val state = Tables.documents(s, dir)
        .filter(col("doc_id") % 7 === 0).select(col("doc_id"))
      listed.join(broadcast(state), Seq("doc_id"), "left_anti")
        .agg(count(lit(1)).as("n_new"),
             min(col("doc_id")).as("first_new"),
             max(col("doc_id")).as("last_new"))
    }),

    // §2.7 set ops: UNION ALL — the reference's per-file loop outputs
    // combined into one relation (embedding_engine.py:58-84 loops files;
    // Spark = one union-all scan).
    "set_union_all" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      docs.filter(col("lang") === "en").select(col("doc_id"), col("lang"))
        .unionAll(docs.filter(col("lang") === "de").select(col("doc_id"), col("lang")))
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang"))
    }),

    // §2.7 set ops: INTERSECT (generalization of the set-membership ops).
    "set_intersect" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.filter(col("event_type") === "signup").select(col("user_id"))
        .intersect(ev.filter(col("event_type") === "error").select(col("user_id")))
        .orderBy(col("user_id"))
    }),

    // §2.7 EXCEPT — the relational form of the reference's set-minus
    // dedup (aws_bucket.py:180-182, Python `set` difference): users who
    // signed up but never purchased. Catalyst plans EXCEPT as a
    // left-anti join — same physical shape as J2, by construction.
    "set_except" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      // (user, day) grain: days a user browsed but bought nothing —
      // user-level would be vacuous here (every synthetic user has every
      // event type; the GRAIN of a set op is part of its semantics)
      ev.filter(col("event_type") === "view")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .except(ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), to_date(col("ts")).as("day")))
        .orderBy(col("user_id"), col("day"))
    }),

    // CUBE census with grouping markers — the full generalization of the
    // reference's three separate census loops (A1 by year + A2 by ext +
    // A3 totals, check_bucket_files.py:39-132): every (lang, source)
    // margin in ONE pass. Spark plans cube as a single Expand + one
    // aggregate — 4× the rows into the same shuffle, not 4 scans.
    "a_cube_census" -> ((s, dir) =>
      Tables.documents(s, dir)
        .cube(col("lang"), col("source"))
        .agg(grouping(col("lang")).cast("int").as("g_lang"),
             grouping(col("source")).cast("int").as("g_source"),
             count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
        .select(col("g_lang"), col("g_source"),
          coalesce(col("lang"), lit("ALL")).as("lang"),
          coalesce(col("source"), lit("ALL")).as("source"),
          col("n_docs"), col("n_chars"))
        .orderBy(col("g_lang"), col("g_source"), col("lang"), col("source"))),

    // Explicit GROUPING SETS (the general form cube/rollup specialize):
    // exactly the margins asked for — per-language, per-source, and the
    // grand total, WITHOUT the (lang, source) cross that cube would add.
    // One Expand pass; output rows = sum of the named sets' grains. Via
    // spark.sql to exercise the SQL front end's grouping-analysis path.
    "a_grouping_sets" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("docs_gs")
      s.sql(
        """SELECT grouping(lang) AS g_lang, grouping(source) AS g_source,
          |  coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
          |  count(*) AS n_docs, sum(n_chars) AS n_chars
          |FROM docs_gs
          |GROUP BY GROUPING SETS ((lang), (source), ())
          |ORDER BY g_lang, g_source, lang, source""".stripMargin)
        .selectExpr("cast(g_lang as int) g_lang", "cast(g_source as int) g_source",
                    "lang", "source", "n_docs", "n_chars")
    }),

    // O3/O4/O5 + O6: limit with deterministic order (aws_bucket.py:186-191
    // early pagination exit ≡ LocalLimit pushdown) and min_by argmin
    // (transcription.py:205 np.argmin).
    "o3_limit" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber")).limit(4)),

    "o6_argmin" -> ((s, dir) =>
      // per returnflag: the orderkey of the lineitem whose quantity is
      // nearest 25 (argmin of |q-25|, ties → lowest key), reference
      // nearest-timestamp argmin shape. Lexicographic struct-min instead
      // of a window: partial-aggregates map-side, so the 3 low-cardinality
      // groups never force a 3-partition global sort (the window form
      // single-threads 200k rows per flag at sf0.1).
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          struct(abs(col("l_quantity") - 25.0).as("d"),
                 col("l_orderkey"), col("l_linenumber"), col("l_quantity")).as("t"))
        .groupBy(col("l_returnflag"))
        .agg(min(col("t")).as("m"))
        .select(col("l_returnflag"), col("m.l_orderkey").as("l_orderkey"),
                col("m.l_quantity").as("l_quantity"))
        .orderBy(col("l_returnflag"))),

    // J3: positional zip join (main.py:75 zip(batch, results)) — pair
    // the i-th doc by size with the i-th doc by id via row_number.
    "j3_zip_join" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 100)
      // constant partition key: the global ranking of a 100-row preview is
      // intentionally single-partition; pmod(id,1) is constant-0 but not
      // foldable, so the window keeps an explicit (degenerate) partition
      // spec instead of warning about a missing one
      val one = Window.partitionBy(pmod(col("doc_id"), lit(1)))
      val bySize = docs.select(col("doc_id").as("size_rank_doc"),
        row_number().over(one.orderBy(col("n_chars"), col("doc_id"))).as("i"))
      val byId = docs.select(col("doc_id").as("id_rank_doc"),
        row_number().over(one.orderBy(col("doc_id"))).as("i"))
      bySize.join(byId, "i")
        .select(col("i"), col("size_rank_doc"), col("id_rank_doc"))
        .orderBy(col("i"))
    }),

    // J4: semi join (EXISTS) — orders with a late-shipped lineitem.
    "j4_semi_join" -> ((s, dir) => {
      val late = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > lit("2001-06-01").cast("timestamp"))
        .select(col("l_orderkey"))
      Tables.orders(s, dir)
        .join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }),

    // Bloom-prefiltered semi join — the explicit runtime-filter pattern
    // for fact⋉dim at 100 TB: a fixed-size bitset (2^17 bits = 16 KB
    // here, key-count independent on the wire) built distributed over
    // the dim keys ([[graft.functions.BloomAgg]]), broadcast to the
    // probe scan, and tested with pure builtin expressions BEFORE any
    // probe-side shuffle; the residual exact semi join then runs on the
    // survivors only, so false positives never reach the result. The
    // answer is identical to the plain semi join (the oracle) — the
    // bloom changes the plan, never the semantics. Mirrors what
    // InjectRuntimeFilter does implicitly; expressed explicitly so the
    // pruning survives any plan shape (e.g. pre-aggregated probes).
    "j_bloom_prefilter_semi" -> ((s, dir) => {
      import s.implicits._
      val numBits = 1 << 17; val numHashes = 5
      val dim = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val (h1, h2) = graft.functions.BloomFns.keyHashes(col("c_custkey"))
      val bloom = dim.select(h1.as("h1"), h2.as("h2")).as[(Long, Long)]
        .select(new graft.functions.BloomAgg(numBits, numHashes).toColumn.name("bloom"))
      Tables.orders(s, dir)
        .crossJoin(broadcast(bloom))
        .filter(graft.functions.BloomFns.mightContain("bloom", "o_custkey", numBits, numHashes))
        .drop("bloom")
        .join(dim, col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
             round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("o_orderpriority"))
    }),

    // C1-C13 scalar-function suite in one projection (lower/trim/
    // concat_ws/format_string/substring/substring_index/regexp/abs/
    // length/year/arithmetic — the reference's string toolbox).
    "c_scalar_functions" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("key", keyCol)
        .select(col("doc_id"),
          lower(col("source")).as("c1_lower"),
          col("source").endsWith("1").as("c2_endswith"),
          length(trim(col("text"))).as("c3_trimlen"),
          concat_ws("|", col("lang"), col("source")).as("c4_concat"),
          format_string("%s/%05d", col("lang"), col("doc_id")).as("c5_format"),
          substring(col("text"), 1, 10).as("c6_substr"),
          substring_index(concat(col("source"), lit("."), col("lang")), ".", -1).as("c7_ext"),
          abs(col("n_chars") - 256).as("c11_abs"),
          (col("n_chars") % 7).as("c_mod"))
        .orderBy(col("doc_id")).limit(200)),

    // §2.4 generalization: ROLLUP census over (lang, source) with
    // count_distinct — subtotals + grand total in one pass.
    "a_rollup_census" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(col("source").isin("src0", "src1", "src2"))
        .rollup(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
             countDistinct(col("doc_id")).as("n_distinct"))
        .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first)),

    // W2: top-N per group (check_bucket_files.py:104-109 first-5 preview).
    "w2_topn_per_group" -> ((s, dir) =>
      Tables.orders(s, dir)
        .withColumn("year", year(col("o_orderdate")))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("year"))
            .orderBy(desc("o_totalprice"), col("o_orderkey"))))
        .filter(col("rn") <= 3)
        .select(col("year"), col("rn"), col("o_orderkey"),
                round(col("o_totalprice"), 2).as("price"))
        .orderBy(desc("year"), col("rn")))
  )

  def oracles: Map[String, String] = Map(
    "m0_corpus_census" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |round(avg(n_chars), 2) AS avg_chars
        |FROM documents WHERE length(trim(text)) > 0
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "f1_suffix_filter" ->
      "SELECT doc_id, source FROM documents WHERE lower(source) LIKE '%1' ORDER BY doc_id",
    "f2_multi_ext_filter" ->
      s"""WITH k AS (SELECT doc_id, $keySql AS key FROM documents),
         |e AS (SELECT doc_id,
         |  regexp_extract(lower(key), '\\.(webm|mp3|wav|m4a|flac|ogg)$$', 1) AS ext FROM k)
         |SELECT ext, count(*) AS count FROM e WHERE ext <> ''
         |GROUP BY ext ORDER BY ext""".stripMargin,
    "f4_year_filter" ->
      """SELECT count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
        |FROM orders WHERE year(o_orderdate) = 1997""".stripMargin,
    "p1_catalog_projection" ->
      """SELECT o_orderkey AS key, o_totalprice AS size,
        |year(o_orderdate)::INT AS year, o_orderdate AS last_modified
        |FROM orders ORDER BY key LIMIT 100""".stripMargin,
    "p2_unit_conversion" ->
      "SELECT doc_id, round(n_chars / 1024.0, 6) AS size_kb FROM documents ORDER BY doc_id LIMIT 200",
    "p3_path_stem" ->
      s"""WITH k AS (SELECT doc_id, $keySql AS key FROM documents)
         |SELECT doc_id, regexp_extract(key, '([^/]+)\\.[^.]+$$', 1) AS stem
         |FROM k ORDER BY doc_id LIMIT 200""".stripMargin,
    "p4_extension" ->
      s"""WITH k AS (SELECT doc_id, $keySql AS key FROM documents)
         |SELECT doc_id, CASE WHEN key LIKE '%.%'
         |  THEN lower(regexp_extract(key, '\\.([^.]+)$$', 1))
         |  ELSE 'no extension' END AS ext
         |FROM k ORDER BY doc_id LIMIT 200""".stripMargin,
    "a1_count_by_year" ->
      """SELECT year(o_orderdate)::INT AS year, count(*) AS count
        |FROM orders GROUP BY 1 ORDER BY year DESC""".stripMargin,
    "a2_ext_histogram" ->
      s"""WITH k AS (SELECT doc_id, $keySql AS key FROM documents),
         |e AS (SELECT CASE WHEN key LIKE '%.%'
         |  THEN lower(regexp_extract(key, '\\.([^.]+)$$', 1))
         |  ELSE 'no extension' END AS ext FROM k)
         |SELECT ext, count(*) AS count FROM e
         |GROUP BY ext ORDER BY count DESC, ext""".stripMargin,
    "a3_conditional_counts" ->
      """SELECT count(*) AS n_total,
        |count(*) FILTER (WHERE event_type = 'error') AS n_error,
        |count(*) FILTER (WHERE value > 100.0) AS n_big,
        |count(DISTINCT user_id) AS n_users
        |FROM events""".stripMargin,
    "a6_max_year" ->
      "SELECT CAST(max(year(o_orderdate)) AS INT) AS latest_year FROM orders WHERE o_orderstatus = 'F'",
    "a8_distinct" ->
      "SELECT DISTINCT lang FROM documents ORDER BY lang",
    "a9_group_collect" ->
      """SELECT lang, string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS doc_ids
        |FROM documents WHERE doc_id < 100
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "j2_anti_join" ->
      """SELECT count(*) AS n_new, min(doc_id) AS first_new, max(doc_id) AS last_new
        |FROM documents d
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM documents s WHERE s.doc_id % 7 = 0 AND s.doc_id = d.doc_id)""".stripMargin,
    "set_union_all" ->
      """SELECT lang, count(*) AS n FROM (
        |  SELECT doc_id, lang FROM documents WHERE lang = 'en'
        |  UNION ALL
        |  SELECT doc_id, lang FROM documents WHERE lang = 'de') t
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "set_except" ->
      """SELECT DISTINCT user_id, date_trunc('day', ts)::DATE AS day
        |FROM events WHERE event_type = 'view'
        |EXCEPT
        |SELECT DISTINCT user_id, date_trunc('day', ts)::DATE AS day
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id, day""".stripMargin,
    "a_cube_census" ->
      """SELECT grouping(lang)::INT AS g_lang, grouping(source)::INT AS g_source,
        |coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
        |count(*) AS n_docs, sum(n_chars)::BIGINT AS n_chars
        |FROM documents GROUP BY CUBE (lang, source)
        |ORDER BY g_lang, g_source, lang, source""".stripMargin,
    "a_grouping_sets" ->
      """SELECT grouping(lang)::INT AS g_lang, grouping(source)::INT AS g_source,
        |coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
        |count(*) AS n_docs, sum(n_chars)::BIGINT AS n_chars
        |FROM documents GROUP BY GROUPING SETS ((lang), (source), ())
        |ORDER BY g_lang, g_source, lang, source""".stripMargin,
    "set_intersect" ->
      """SELECT user_id FROM (
        |  SELECT user_id FROM events WHERE event_type = 'signup'
        |  INTERSECT
        |  SELECT user_id FROM events WHERE event_type = 'error') t
        |ORDER BY user_id""".stripMargin,
    "o3_limit" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber LIMIT 4""".stripMargin,
    "o6_argmin" ->
      """WITH d AS (SELECT l_returnflag, l_orderkey, l_quantity,
        |  row_number() OVER (PARTITION BY l_returnflag
        |    ORDER BY abs(l_quantity - 25.0), l_orderkey, l_linenumber) AS rn
        |  FROM lineitem)
        |SELECT l_returnflag, l_orderkey, l_quantity FROM d WHERE rn = 1
        |ORDER BY l_returnflag""".stripMargin,
    "j3_zip_join" ->
      """WITH d AS (SELECT doc_id, n_chars FROM documents WHERE doc_id < 100),
        |a AS (SELECT doc_id AS size_rank_doc,
        |  row_number() OVER (ORDER BY n_chars, doc_id) AS i FROM d),
        |b AS (SELECT doc_id AS id_rank_doc,
        |  row_number() OVER (ORDER BY doc_id) AS i FROM d)
        |SELECT i::INT AS i, size_rank_doc, id_rank_doc FROM a JOIN b USING (i)
        |ORDER BY i""".stripMargin,
    "j4_semi_join" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '2001-06-01')
        |ORDER BY o_orderkey""".stripMargin,
    // bloom is a pure plan optimization: the oracle is the plain semi join
    "j_bloom_prefilter_semi" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |round(sum(o_totalprice), 2) AS revenue
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM customer c
        |  WHERE c.c_mktsegment = 'BUILDING' AND c.c_custkey = o.o_custkey)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "c_scalar_functions" ->
      s"""WITH k AS (SELECT *, $keySql AS key FROM documents)
         |SELECT doc_id,
         |  lower(source) AS c1_lower,
         |  (source LIKE '%1') AS c2_endswith,
         |  length(trim(text))::INT AS c3_trimlen,
         |  concat_ws('|', lang, source) AS c4_concat,
         |  printf('%s/%05d', lang, doc_id) AS c5_format,
         |  substr(text, 1, 10) AS c6_substr,
         |  regexp_extract(source || '.' || lang, '([^.]+)$$', 1) AS c7_ext,
         |  abs(n_chars - 256) AS c11_abs,
         |  n_chars % 7 AS c_mod
         |FROM k ORDER BY doc_id LIMIT 200""".stripMargin,
    "a_rollup_census" ->
      """SELECT lang, source, count(*) AS n_docs,
        |count(DISTINCT doc_id) AS n_distinct
        |FROM documents WHERE source IN ('src0', 'src1', 'src2')
        |GROUP BY ROLLUP(lang, source)
        |ORDER BY lang ASC NULLS FIRST, source ASC NULLS FIRST""".stripMargin,
    "w2_topn_per_group" ->
      """WITH r AS (SELECT year(o_orderdate)::INT AS year, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY year(o_orderdate)
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |SELECT year, rn::INT AS rn, o_orderkey, round(o_totalprice, 2) AS price
        |FROM r WHERE rn <= 3 ORDER BY year DESC, rn""".stripMargin
  )
}
