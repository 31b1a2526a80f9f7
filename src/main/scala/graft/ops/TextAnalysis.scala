package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operator set for the training-data pipeline (north-star;
  * SURVEY.md §2.3 q25–q28): language-ID heuristic, quality scoring, token
  * counting, and document fingerprinting.
  *
  * Everything is native column expressions over higher-order functions —
  * one parquet scan, zero shuffles except the final oracle ORDER BY; the
  * per-document work is map-side and codegen-friendly, which is exactly
  * what you want when the corpus is 100 TB: these ops cost one pass.
  *
  * Cross-engine notes: ratios are single IEEE divisions of exact integer
  * counts (bit-identical in Spark and DuckDB); regexes are character-class
  * only (identical under Java regex and RE2, rule D6); the fingerprint is
  * a polynomial rolling hash in exact Long arithmetic mod 1e9+7, folded
  * left-to-right in both engines.
  */
object TextAnalysis {

  /** English function words present in the fixture vocabulary. A real
    * deployment would carry one profile per language; the operator shape
    * (set intersect over distinct tokens / ratio / threshold) is the same.
    */
  val stopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  private def words(text: Column): Column = split(lower(text), " ")

  // Gate thresholds shared by the declared q26/q35 queries and the q49
  // composition — single source so retuning a gate cannot silently leave
  // the pipeline running the old rule (both the Scala expressions and the
  // oracle SQL interpolate these).
  private[ops] val QualityMinTokens   = 20
  private[ops] val QualityMaxTokens   = 90
  private[ops] val QualityMinTtr      = 0.25
  private[ops] val RepetitionMaxRatio = 0.05

  /** q25_lang_id: stopword-ratio language heuristic. ratio = |distinct
    * tokens ∩ profile| / |distinct tokens|; classify 'en' above threshold.
    */
  def q25(spark: SparkSession, dir: String): DataFrame = {
    val types = array_distinct(words(col("text")))
    val hits  = size(array_intersect(types, array(stopwordsEn.map(lit): _*)))
    val ratio = hits.cast("double") / size(types).cast("double")
    Tables.documents(spark, dir)
      .select(
        col("doc_id"), col("lang").as("labeled_lang"),
        size(types).cast("int").as("n_types"),
        hits.cast("int").as("n_stopwords"),
        ratio.as("stopword_ratio"),
        when(ratio >= 0.05, lit("en")).otherwise(lit("und")).as("predicted"))
      .orderBy("doc_id")
  }

  val q25Sql: String = {
    val set = stopwordsEn.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""SELECT doc_id, lang AS labeled_lang,
       |       CAST(len(list_distinct(string_split(lower(text), ' '))) AS INTEGER) AS n_types,
       |       CAST(len(list_intersect(list_distinct(string_split(lower(text), ' ')), $set)) AS INTEGER) AS n_stopwords,
       |       CAST(len(list_intersect(list_distinct(string_split(lower(text), ' ')), $set)) AS DOUBLE)
       |         / CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE) AS stopword_ratio,
       |       CASE WHEN CAST(len(list_intersect(list_distinct(string_split(lower(text), ' ')), $set)) AS DOUBLE)
       |                 / CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE) >= 0.05
       |            THEN 'en' ELSE 'und' END AS predicted
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  /** q26_quality_score: length/type-token-ratio/word-length quality
    * signals with a composite keep/drop flag — the standard cheap filters
    * before expensive pipeline stages.
    */
  def q26(spark: SparkSession, dir: String): DataFrame = {
    val ws      = words(col("text"))
    val nTokens = size(ws)
    val nTypes  = size(array_distinct(ws))
    val ttr     = nTypes.cast("double") / nTokens.cast("double")
    val awl     = (length(col("text")) - (nTokens - 1)).cast("double") /
      nTokens.cast("double")
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        nTokens.cast("int").as("n_tokens"),
        nTypes.cast("int").as("n_types"),
        ttr.as("type_token_ratio"),
        awl.as("avg_word_len"),
        (nTokens.between(QualityMinTokens, QualityMaxTokens) &&
          ttr >= lit(QualityMinTtr)).as("keep"))
      .orderBy("doc_id")
  }

  val q26Sql: String =
    s"""SELECT doc_id,
      |       CAST(len(string_split(lower(text), ' ')) AS INTEGER) AS n_tokens,
      |       CAST(len(list_distinct(string_split(lower(text), ' '))) AS INTEGER) AS n_types,
      |       CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE)
      |         / CAST(len(string_split(lower(text), ' ')) AS DOUBLE) AS type_token_ratio,
      |       CAST(length(text) - (len(string_split(lower(text), ' ')) - 1) AS DOUBLE)
      |         / CAST(len(string_split(lower(text), ' ')) AS DOUBLE) AS avg_word_len,
      |       (len(string_split(lower(text), ' ')) BETWEEN $QualityMinTokens AND $QualityMaxTokens)
      |         AND (CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE)
      |              / CAST(len(string_split(lower(text), ' ')) AS DOUBLE) >= $QualityMinTtr) AS keep
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** q27_token_count: whitespace tokens vs regex (BPE-ish pre-tokenizer)
    * tokens vs characters — the three budget units a training pipeline
    * tracks. The regex splits letter runs, digit runs, and single symbols.
    */
  def q27(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("int").as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))).cast("int")
          .as("re_tokens"),
        length(col("text")).cast("int").as("n_chars"))
      .orderBy("doc_id")

  val q27Sql: String =
    """SELECT doc_id,
      |       CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
      |       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS INTEGER) AS re_tokens,
      |       CAST(length(text) AS INTEGER) AS n_chars
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Polynomial rolling hash of a string, base 31 mod 1e9+7, folded over
    * code points left-to-right — engine-portable exact Long arithmetic
    * (unlike xxhash64/DuckDB hash, whose implementations differ). Runs as
    * the codegen'd [[graft.ext.RollingHash]] kernel: one pass per string
    * instead of a regex match + expression-tree walk per CHARACTER
    * (VERDICT r3 #4; value-exact with [[hofRollingHash]], pinned in
    * ExtSpec).
    */
  def rollingHash(spark: SparkSession, text: Column): Column = {
    graft.ext.GraftFunctions.ensureRollingHash(spark)
    call_function("rolling_hash", text)
  }

  /** The higher-order-function formulation of [[rollingHash]] — superseded
    * by the native kernel; retained so ExtSpec can pin the two value-exact
    * (a mismatch would silently shift every memoized fingerprint and the
    * q32 split assignment).
    */
  private[graft] def hofRollingHash(text: Column): Column =
    aggregate(
      transform(regexp_extract_all(text, lit("."), lit(0)),
        c => ascii(c).cast("long")),
      lit(0L),
      (h, c) => pmod(h * 31L + c, lit(1000000007L)))

  /** q28_fingerprint: rolling-hash document fingerprint, both raw and
    * content-normalized (sorted distinct words) — the cheap equality key
    * for exact and normalized dedup at scale.
    */
  def q28(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        rollingHash(spark, col("text")).as("fp_raw"),
        rollingHash(spark, Text.wordSetFingerprint(col("text"))).as("fp_normalized"))
      .orderBy("doc_id")

  val q28Sql: String = {
    def fold(e: String) =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |  list_transform(regexp_extract_all($e, '.'), c -> CAST(unicode(c) AS BIGINT))),
         |  (a, b) -> (a * 31 + b) % 1000000007)""".stripMargin
    s"""SELECT doc_id,
       |       ${fold("text")} AS fp_raw,
       |       ${fold("array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')")} AS fp_normalized
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  /** q32_train_split: deterministic train/val/test assignment by CONTENT
    * hash (80/10/10). Hashing the text, not the id, keeps a document in the
    * same split across re-ingestions and dedup passes — the property that
    * prevents train/test leakage when the corpus is rebuilt. Uses the
    * engine-portable rolling hash ([[rollingHash]]); engine-native hashes
    * (xxhash64 / DuckDB hash) differ by implementation and could not be
    * oracle-checked.
    */
  def q32(spark: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(rollingHash(spark, col("text")), lit(100L))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        bucket.cast("int").as("bucket"),
        when(bucket < 80, lit("train"))
          .when(bucket < 90, lit("val"))
          .otherwise(lit("test")).as("split"))
      .orderBy("doc_id")
  }

  val q32Sql: String =
    """SELECT doc_id,
      |       CAST(h % 100 AS INTEGER) AS bucket,
      |       CASE WHEN h % 100 < 80 THEN 'train'
      |            WHEN h % 100 < 90 THEN 'val'
      |            ELSE 'test' END AS split
      |FROM (
      |  SELECT doc_id,
      |         list_reduce(list_prepend(CAST(0 AS BIGINT),
      |           list_transform(regexp_extract_all(text, '.'), c -> CAST(unicode(c) AS BIGINT))),
      |           (a, b) -> (a * 31 + b) % 1000000007) AS h
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** q40_redact: PII scrubbing — the redaction pass an LLM data pipeline
    * runs before training: emails and digit runs are replaced with typed
    * placeholder tokens, and per-document redaction counts are kept for
    * audit. Patterns are character-class + bounded-quantifier only
    * (RE2-safe, rule D6 — identical under Java regex and DuckDB's RE2);
    * counts come from `regexp_extract_all` lengths, replacement from
    * global `regexp_replace` (Spark is global by default, DuckDB pins the
    * 'g' flag). Pure per-row map-side column math: one corpus pass.
    */
  def q40(spark: SparkSession, dir: String): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
    val nums  = "[0-9][0-9][0-9]+"
    val t = col("text")
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        regexp_replace(regexp_replace(t, email, "<EMAIL>"), nums, "<NUM>")
          .as("redacted"),
        size(regexp_extract_all(t, lit(email), lit(0))).cast("int")
          .as("n_emails"),
        size(regexp_extract_all(t, lit(nums), lit(0))).cast("int")
          .as("n_nums"))
      .orderBy("doc_id")
  }

  val q40Sql: String =
    """SELECT doc_id,
      |       regexp_replace(regexp_replace(text,
      |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
      |         '[0-9][0-9][0-9]+', '<NUM>', 'g') AS redacted,
      |       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+')) AS INTEGER) AS n_emails,
      |       CAST(len(regexp_extract_all(text, '[0-9][0-9][0-9]+')) AS INTEGER) AS n_nums
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** q35_repetition_filter: duplicate-bigram ratio per document — the
    * standard repetition rule of LLM data-cleaning pipelines (excessive
    * repeated n-grams mark boilerplate/template/spam text). ratio =
    * (bigrams − distinct bigrams) / bigrams over the RAW (multiplicity-
    * preserving) bigram list; shingle-less docs (<2 words) score 0.0 —
    * no repetition evidence, keep. The ratio is one IEEE division of
    * exact integer counts ⇒ bit-identical cross-engine, and the whole op
    * is per-row map-side column math: one corpus pass at any scale.
    */
  def q35(spark: SparkSession, dir: String): DataFrame = {
    // bind the bigram array, its distinct, and the ratio once each (the
    // collapsed projection still inlines `m` per extracted field — no CSE
    // for interpreted lambdas — but each inline is one O(n) pass, not the
    // O(n²) an unbound word array would cost; see Text.ngrams). The bigram
    // array itself comes from the codegen'd word_ngrams kernel.
    graft.ext.GraftFunctions.ensureWordNgrams(spark)
    val m = graft.ops.Text.bound(graft.ops.Text.nativeNgrams(col("text"), 2)) { bg =>
      graft.ops.Text.bound(array_distinct(bg)) { dbg =>
        graft.ops.Text.bound(
          when(size(bg) > 0,
            (size(bg) - size(dbg)).cast("double") / size(bg).cast("double"))
            .otherwise(lit(0.0))) { ratio =>
          struct(
            size(bg).cast("int").as("n_bigrams"),
            size(dbg).cast("int").as("n_distinct"),
            ratio.as("dup_ratio"),
            (ratio <= RepetitionMaxRatio).as("keep"))
        }
      }
    }
    Tables.documents(spark, dir)
      .withColumn("m", m)
      .select(col("doc_id"), col("m.n_bigrams").as("n_bigrams"),
        col("m.n_distinct").as("n_distinct"),
        col("m.dup_ratio").as("dup_ratio"), col("m.keep").as("keep"))
      .orderBy("doc_id")
  }

  val q35Sql: String =
    s"""SELECT doc_id,
      |       CAST(len(bg) AS INTEGER) AS n_bigrams,
      |       CAST(len(list_distinct(bg)) AS INTEGER) AS n_distinct,
      |       CASE WHEN len(bg) > 0
      |            THEN CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / CAST(len(bg) AS DOUBLE)
      |            ELSE CAST(0 AS DOUBLE) END AS dup_ratio,
      |       (CASE WHEN len(bg) > 0
      |            THEN CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / CAST(len(bg) AS DOUBLE)
      |            ELSE CAST(0 AS DOUBLE) END) <= $RepetitionMaxRatio AS keep
      |FROM (
      |  SELECT doc_id,
      |         list_transform(range(1, len(string_split(lower(text), ' '))),
      |           i -> string_split(lower(text), ' ')[i] || ' ' || string_split(lower(text), ' ')[i+1]) AS bg
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** q48_sample_mix: deterministic stratified sampling — the corpus-MIXING
    * step of a training-data pipeline: downweight the dominant language,
    * keep rare ones whole, and attach the inverse-rate weight each kept
    * row carries into loss/statistics. Per-mille keep rates by `lang`
    * (en 400‰ — the dominant stratum, zh 1000‰ — rare, keep all, others
    * 800‰); membership is `content_hash mod 1000 < rate`, on the same
    * engine-portable [[rollingHash]] as q32's split, so the decision is
    * (a) deterministic across runs and engines, (b) stable under
    * re-ingest and dedup — a document's fate never depends on which other
    * documents survive — and (c) leakage-coherent with q32: both derive
    * from content, not position. Pure per-row map-side column math: one
    * corpus pass, a ~40–100% selectivity filter AT THE SCAN, no shuffle
    * at any scale. `weight` = 1000/rate is one IEEE division of exact
    * integers ⇒ bit-identical cross-engine.
    */
  def q48(spark: SparkSession, dir: String): DataFrame = {
    val rate = when(col("lang") === "en", lit(400L))
      .when(col("lang") === "zh", lit(1000L))
      .otherwise(lit(800L))
    val bucket = pmod(rollingHash(spark, col("text")), lit(1000L))
    Tables.documents(spark, dir)
      .withColumn("rate", rate)
      .withColumn("bucket", bucket)
      .filter(col("bucket") < col("rate"))
      .select(col("doc_id"), col("lang"),
        col("bucket").cast("int").as("bucket"),
        (lit(1000.0) / col("rate").cast("double")).as("weight"))
      .orderBy("doc_id")
  }

  /** q49_clean_pipeline: the cleaning pipeline END-TO-END as one declared
    * query — the composition a training-data user actually ships, not
    * just its stages: quality gate (q26's token-count + TTR rule) →
    * repetition gate (q35's duplicate-bigram rule) → exact normalized
    * dedup keep-first (q21's fingerprint rule, applied to SURVIVORS —
    * gates first so junk can't displace a clean duplicate) → split
    * assignment (q32's content-hash buckets). Output: the surviving
    * corpus manifest (doc_id, lang, source, n_tokens, split).
    *
    * Scale shape: both gates and every fingerprint are map-side column
    * math evaluated AT THE SCAN — text is projected away before the one
    * dedup shuffle, which carries only (fp, doc_id, lang, source,
    * n_tokens, bucket). The dedup key is the md5 of q21's normalized-word
    * string — md5 is byte-identical across engines and FIXED-WIDTH, so
    * the shuffle stays 32 chars/row where the raw normalized string is
    * text-sized for exactly the high-TTR documents the quality gate
    * keeps. One corpus pass, one genuinely narrow shuffle, at any SF.
    */
  def q49(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.ext.GraftFunctions.ensureWordNgrams(spark)
    val qualityKeep = Text.bound(words(col("text"))) { ws =>
      Text.bound(size(ws)) { nTok =>
        nTok.between(QualityMinTokens, QualityMaxTokens) &&
          (size(array_distinct(ws)).cast("double") / nTok.cast("double")
            >= QualityMinTtr)
      }
    }
    val repetitionKeep = Text.bound(Text.nativeNgrams(col("text"), 2)) { bg =>
      Text.bound(size(bg)) { nBg =>
        when(nBg > 0,
          (nBg - size(array_distinct(bg))).cast("double") /
            nBg.cast("double") <= RepetitionMaxRatio).otherwise(lit(true))
      }
    }
    val survivors = Tables.documents(spark, dir)
      .filter(qualityKeep && repetitionKeep)
      .select(col("doc_id"), col("lang"), col("source"),
        size(words(col("text"))).cast("int").as("n_tokens"),
        md5(Text.wordSetFingerprint(col("text")).cast("binary")).as("fp"),
        pmod(rollingHash(spark, col("text")), lit(100L)).as("bucket"))
    val w = Window.partitionBy(col("fp")).orderBy(asc("doc_id"))
    survivors
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"),
        when(col("bucket") < 80, lit("train"))
          .when(col("bucket") < 90, lit("val"))
          .otherwise(lit("test")).as("split"))
      .orderBy("doc_id")
  }

  /** q26 + q35 + q21 + q32's oracle bodies composed as CTEs — the same
    * gate → dedup → split order the Spark plan runs.
    */
  /** q50_sample_topn: deterministic N-per-stratum sampling — "give me
    * exactly 50 docs per language, reproducibly" (fixed-size eval sets,
    * per-domain audits, few-shot pools). Selection order is (content
    * rolling hash, doc_id): pseudo-random but engine-portable and stable
    * under re-ingest, like q32/q48.
    *
    * Scale shape: a single `row_number` window on `lang` would funnel the
    * whole corpus through #langs reducers (the q34/q37 serialization).
    * Instead: phase 1 takes a per-(salt, lang) local top-N — the window
    * partitions on the salted key, so the full-data shuffle spreads over
    * salts×langs reducers — and phase 2 re-ranks the ≤ N·salts survivors
    * per lang, a shuffle of bounded (tiny) size on the bare key. Same
    * two-phase trick as q20b/saltedSum, applied to per-group top-N: a
    * group's global top-N is always contained in the union of its local
    * top-Ns, so the result is EXACT and salt-independent.
    */
  def q50(spark: SparkSession, dir: String): DataFrame =
    sampleTopNPerGroup(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"),
          rollingHash(spark, col("text")).as("h")),
      groupCol = "lang", n = 50)
      .select(col("doc_id"), col("lang"), col("rk"))
      .orderBy("doc_id")

  /** q64_sample_stratified: EXACT fractional stratified sampling — exactly
    * ⌈n_g/10⌉ documents per language, the smallest by the engine-portable
    * (content-hash, doc_id) order. The "sample 10% of every stratum" step
    * of corpus curation: q48's hash-membership test is reproducible but
    * only hits each stratum's fraction in EXPECTATION; this guarantees the
    * exact per-stratum count, still deterministic across runs, engines,
    * and partitionings.
    *
    * Scale shape — the cut line is the ⌈n_g/10⌉-th smallest hash per
    * group, an ORDER STATISTIC, so q34b's histogram-rank discipline
    * applies rather than a per-group sort. q50's salted top-N does NOT
    * transfer here: its phase-1 cut keeps N rows per salt, but a
    * fractional target grows with the group (⌈n_g/10⌉ ≫ n_g/salts keeps
    * everything), so [[exactStratifiedSample]] selects by bucket census
    * instead — see its doc for the plan.
    */
  def q64(spark: SparkSession, dir: String): DataFrame =
    exactStratifiedSample(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"),
          rollingHash(spark, col("text")).as("h")),
      groupCol = "lang", num = 1, den = 10)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  val q64Sql: String =
    """SELECT doc_id, lang FROM (
      |  SELECT doc_id, lang,
      |         row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk,
      |         count(*) OVER (PARTITION BY lang) AS cnt
      |  FROM (
      |    SELECT doc_id, lang,
      |           list_reduce(list_prepend(CAST(0 AS BIGINT),
      |             list_transform(regexp_extract_all(text, '.'), c -> CAST(unicode(c) AS BIGINT))),
      |             (a, b) -> (a * 31 + b) % 1000000007) AS h
      |    FROM documents))
      |WHERE rk <= (cnt + 9) // 10
      |ORDER BY doc_id""".stripMargin

  /** The generic exact stratified sampler behind q64: per `groupCol`
    * group, keep exactly ⌈n_g·num/den⌉ rows — the smallest by (h, doc_id)
    * — without ever sorting a group's rows in one partition. Input must
    * carry (doc_id, groupCol, h) with h ∈ [0, hRange).
    *
    * Histogram-rank selection (q34b's discipline, applied to sampling):
    *  1. census per (group, h-bucket) — a map-side-combinable aggregate;
    *     everything after step 1 runs on ≤ nBuckets×groups CENSUS rows;
    *  2. per-group running count over buckets (windows over census rows,
    *     never data) finds each bucket's rank interval and the group's
    *     integer target ⌈tot·num/den⌉ — buckets strictly below the cut
    *     pass whole, the ONE straddling bucket gets a remainder quota;
    *  3. the classification broadcast-joins back onto the data (no data
    *     shuffle), full-in rows pass, and only the straddling bucket's
    *     rows — expected n_g/nBuckets of the group — rank within
    *     (group, bucket) to take the remainder.
    * Exact because bucket boundaries respect the (h, doc_id) order: equal
    * hashes share a bucket, so the within-bucket rank IS the global rank
    * minus the bucket's offset. The data's one wide shuffle is the
    * boundary-bucket window over that small slice; a plain per-group
    * `row_number` (the oracle's form) would instead funnel every group
    * through one reducer.
    */
  private[graft] def exactStratifiedSample(
      base: DataFrame, groupCol: String, num: Int, den: Int,
      nBuckets: Long = 1024L,
      hRange: Long = 1000000007L): DataFrame = {
    require(num >= 0 && den > 0 && num <= den,
      s"sampling fraction $num/$den must lie in [0, 1]")
    Seq("bkt", "c", "cum", "tot", "target", "off", "cls", "rk").foreach(c =>
      require(!base.columns.contains(c),
        s"exactStratifiedSample reserves column name '$c' (input already has it)"))
    import org.apache.spark.sql.expressions.Window
    val width = hRange / nBuckets + 1L
    // same silent-row-loss vector as bucketedGroupRank: NULL h → NULL bkt
    // → dropped by the classification equi-join — fail loudly instead
    val tagged = base.withColumn("bkt",
      when(col("h").isNull, raise_error(
        lit("exactStratifiedSample: h must be non-null")))
      .otherwise(expr(s"h div ${width}L")))
    val hist = tagged.groupBy(col(groupCol), col("bkt"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(asc("bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col(groupCol))
    val cls = hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("tot", sum(col("c")).over(wTot))
      .withColumn("target", expr(s"(tot * $num + ${den - 1}) div $den"))
      .withColumn("off", col("cum") - col("c"))
      .withColumn("cls",
        when(col("cum") <= col("target"), lit(2))        // fully below the cut
          .when(col("off") < col("target"), lit(1))       // straddles the cut
          .otherwise(lit(0)))
      .filter(col("cls") > 0)
      .select(col(groupCol), col("bkt"), col("off"), col("target"), col("cls"))
    val joined = tagged.join(broadcast(cls), Seq(groupCol, "bkt"))
    val outCols = base.columns.map(col).toSeq
    val full = joined.filter(col("cls") === 2).select(outCols: _*)
    val wB = Window.partitionBy(col(groupCol), col("bkt"))
      .orderBy(asc("h"), asc("doc_id"))
    val remainder = joined.filter(col("cls") === 1)
      .withColumn("rk", row_number().over(wB))
      .filter(col("rk") <= col("target") - col("off"))
      .select(outCols: _*)
    full.union(remainder)
  }

  /** q65_decontaminate: train/eval CONTAMINATION detection — flag every
    * training document that shares at least one word 8-gram with the
    * held-out eval slice (the GPT-3-style n-gram decontamination step an
    * LLM pipeline runs before training, so benchmark answers don't leak
    * into the train set). The eval slice is the content-hash 5% tail of
    * q32's split discipline — deterministic membership, no shuffle to
    * define it. Completes the dedup family's missing axis: q21/x02/x07/
    * x10/q47 are all SELF-joins; this is the cross-corpus form.
    */
  def q65(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        pmod(rollingHash(spark, col("text")), lit(100L)).as("bucket"))
    decontaminate(
      docs.filter(col("bucket") < 95).select("doc_id", "text"),
      docs.filter(col("bucket") >= 95).select("doc_id", "text"))
      .orderBy("doc_id")
  }

  val q65Sql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |         list_reduce(list_prepend(CAST(0 AS BIGINT),
      |           list_transform(regexp_extract_all(text, '.'), c -> CAST(unicode(c) AS BIGINT))),
      |           (a, b) -> (a * 31 + b) % 1000000007) % 100 AS bucket,
      |         string_split(lower(text), ' ') AS w
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, bucket,
      |         list_distinct(list_transform(range(1, len(w) - 6),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
      |                w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7])) AS grams
      |  FROM d)
      |SELECT doc_id, coalesce(contaminated, FALSE) AS contaminated
      |FROM (SELECT doc_id FROM g WHERE bucket < 95) t
      |LEFT JOIN (
      |  SELECT DISTINCT doc_id, TRUE AS contaminated
      |  FROM (SELECT doc_id, unnest(grams) AS gram FROM g WHERE bucket < 95)
      |  WHERE gram IN (SELECT unnest(grams) FROM g WHERE bucket >= 95)) c
      |USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** q67_rank_bands: per-language QUALITY QUARTILES — every document gets
    * its lexical-diversity (type-token-ratio) rank within its language and
    * the quartile band 1–4 that rank falls in: the "train on the top
    * quality band, audit the bottom" bucketing step of corpus curation.
    * Unlike `ntile` (physical-order-dependent, unrankable across engines),
    * the band derives from the value-deterministic (ttr, doc_id) rank:
    * band = (4·(rk−1)) div n_g + 1 — pure integer arithmetic on a total
    * order, hash-exact.
    *
    * Scale shape: [[bucketedGroupRank]] — a full per-group ranking (every
    * row needs its rank, so q64's selection shortcut doesn't apply) that
    * still never sorts a group in one partition.
    */
  def q67(spark: SparkSession, dir: String): DataFrame = {
    val ws = words(col("text"))
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        (size(array_distinct(ws)).cast("double") / size(ws).cast("double"))
          .as("ttr"))
    bucketedGroupRank(scored, groupCol = "lang", scoreCol = "ttr",
        idCol = "doc_id")
      .select(col("doc_id"), col("lang"), col("ttr"),
        expr("(4 * (rk - 1)) div cnt + 1").cast("int").as("band"))
      .orderBy("doc_id")
  }

  val q67Sql: String =
    """SELECT doc_id, lang, ttr, CAST((4 * (rk - 1)) // cnt + 1 AS INTEGER) AS band
      |FROM (
      |  SELECT doc_id, lang, ttr,
      |         row_number() OVER (PARTITION BY lang ORDER BY ttr, doc_id) AS rk,
      |         count(*) OVER (PARTITION BY lang) AS cnt
      |  FROM (
      |    SELECT doc_id, lang,
      |           CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE)
      |             / CAST(len(string_split(lower(text), ' ')) AS DOUBLE) AS ttr
      |    FROM documents))
      |ORDER BY doc_id""".stripMargin

  /** The generic scale-safe per-group FULL ranking behind q67: every row
    * of `base` gets `rk` — its 1-based rank within `groupCol` by
    * (`scoreCol`, `idCol`) — and `cnt`, the group size, without ever
    * sorting a whole group in one partition. `scoreCol` must lie in
    * [0, 1] (ratios; clamp otherwise) and be NON-NULL (enforced with a
    * runtime `raise_error`, since the alternative is a silent row drop
    * through the census equi-join), and `idCol` must be unique.
    *
    * q34b's histogram discipline, but for RANKING rather than selection:
    * scores bucket by fixed width (floor(score·nBuckets), monotone ⇒
    * bucket order respects score order; ties share a bucket ⇒ within-
    * bucket rank + bucket offset IS the global group rank); the census
    * aggregate is map-side-combinable, offsets and group totals are
    * windows over census rows, and the per-row work is a window over
    * (group, bucket) — partitions of ~n_g/nBuckets rows — plus a
    * broadcast join. The bare group key never partitions raw rows.
    */
  private[graft] def bucketedGroupRank(
      base: DataFrame, groupCol: String, scoreCol: String, idCol: String,
      nBuckets: Int = 1024): DataFrame = {
    Seq("bkt", "c", "off", "rk", "cnt").foreach(c =>
      require(!base.columns.contains(c),
        s"bucketedGroupRank reserves column name '$c' (input already has it)"))
    import org.apache.spark.sql.expressions.Window
    val bkt0 = least(greatest(floor(col(scoreCol) * nBuckets), lit(0.0)),
      lit((nBuckets - 1).toDouble)).cast("int")
    // a NULL score would bucket to NULL, never match the census equi-join
    // back, and the row would SILENTLY vanish from a ranking that must be
    // total — fail loudly instead (a codegen'd branch, free when non-null)
    val bkt = when(col(scoreCol).isNull, raise_error(
        lit(s"bucketedGroupRank: $scoreCol must be non-null")))
      .otherwise(bkt0)
    val tagged = base.withColumn("bkt", bkt)
    val hist = tagged.groupBy(col(groupCol), col("bkt"))
      .agg(count(lit(1)).as("c"))
    val wOff = Window.partitionBy(col(groupCol)).orderBy(asc("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(col(groupCol))
    val offs = hist
      .withColumn("off", coalesce(sum(col("c")).over(wOff), lit(0L)))
      .withColumn("cnt", sum(col("c")).over(wTot))
      .select(col(groupCol), col("bkt"), col("off"), col("cnt"))
    val wIn = Window.partitionBy(col(groupCol), col("bkt"))
      .orderBy(asc(scoreCol), asc(idCol))
    tagged.join(broadcast(offs), Seq(groupCol, "bkt"))
      .withColumn("rk", col("off") + row_number().over(wIn))
      .drop("bkt", "off")
  }

  /** The generic cross-corpus decontamination behind q65: (doc_id,
    * contaminated) for every `train` row, true iff the doc shares ≥ 1
    * distinct word `n`-gram with ANY `eval` doc. Both sides need
    * (doc_id, text).
    *
    * Scale shape: real eval sets are fixed-size benchmarks — tiny next to
    * the train corpus — so the distinct eval-gram table broadcasts and
    * the train side never shuffles its grams: explode (map-side, via the
    * one-pass `word_ngrams` kernel) → broadcast LEFT SEMI → per-doc
    * `distinct` on the SURVIVING (doc_id) hits only — contamination is
    * rare by construction, so the distinct's shuffle is near-empty. The
    * broadcast is CONDITIONAL on the eval side's plan-stats size
    * (jaccardJoin's cap discipline — erring toward the shuffle semi-join,
    * the safe direction); past the cap the same plan runs as a shuffled
    * semi-join, value-identical (TextSpec pins both paths). The final
    * left join re-attaches the flag to train doc ids — row count is
    * train's, never gram-amplified.
    */
  private[graft] def decontaminate(
      train: DataFrame, evalDocs: DataFrame, n: Int = 8,
      evalBroadcastMaxBytes: Long = 64L << 20): DataFrame = {
    graft.ext.GraftFunctions.ensureWordNgrams(train.sparkSession)
    val evalGrams = evalDocs
      .select(explode(Text.nativeShingles(col("text"), n)).as("gram"))
      .distinct()
    val lookup =
      if (evalDocs.queryExecution.optimizedPlan.stats.sizeInBytes
            <= BigInt(evalBroadcastMaxBytes)) broadcast(evalGrams)
      else evalGrams
    val hits = train
      .select(col("doc_id"), explode(Text.nativeShingles(col("text"), n)).as("gram"))
      .join(lookup, Seq("gram"), "left_semi")
      .select("doc_id").distinct()
    train.select("doc_id")
      .join(hits.withColumn("contaminated", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"))
  }

  /** The generic salted per-group exact top-N behind q50: smallest n rows
    * per `groupCol` by (h, doc_id). Input must carry (doc_id, groupCol, h).
    */
  private[graft] def sampleTopNPerGroup(
      base: DataFrame, groupCol: String, n: Int,
      salts: Int = 32): DataFrame = {
    Seq("_salt", "_lr", "rk").foreach(c =>
      require(!base.columns.contains(c),
        s"sampleTopNPerGroup reserves column name '$c' (input already has it)"))
    import org.apache.spark.sql.expressions.Window
    val wLocal = Window.partitionBy(col("_salt"), col(groupCol))
      .orderBy(asc("h"), asc("doc_id"))
    val wGlobal = Window.partitionBy(col(groupCol))
      .orderBy(asc("h"), asc("doc_id"))
    base
      .withColumn("_salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
      .withColumn("_lr", row_number().over(wLocal))
      .filter(col("_lr") <= n)
      .withColumn("rk", row_number().over(wGlobal).cast("int"))
      .filter(col("rk") <= n)
      .drop("_salt", "_lr")
  }

  /** q51_chunk_docs: fixed-size sliding-window CHUNKING — split every
    * document into word windows of `size` tokens at `stride` (overlap =
    * size − stride), the context-window preprocessing step of an LLM
    * training/embedding pipeline. Chunk starts are 0, stride, 2·stride, …
    * while < n_words, so every word lands in ≥ 1 chunk and short docs
    * yield exactly one. Pure map-side explode of per-row sequences — the
    * only shuffle at any scale is the D1 ORDER BY; output size is
    * ~n_words/stride rows per doc, known up front.
    */
  def q51(spark: SparkSession, dir: String): DataFrame = {
    val size_ = 20
    val stride = 15
    Tables.documents(spark, dir)
      .select(col("doc_id"), words(col("text")).as("w"))
      .select(col("doc_id"), col("w"),
        posexplode(sequence(lit(0), greatest(size(col("w")) - 1, lit(0)),
          lit(stride))).as(Seq("chunk_idx", "start")))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("int").as("chunk_idx"),
        least(size(col("w")) - col("start"), lit(size_)).cast("int")
          .as("n_tokens"),
        concat_ws(" ", slice(col("w"), col("start") + 1, lit(size_)))
          .as("chunk_text"))
      .orderBy("doc_id", "chunk_idx")
  }

  val q51Sql: String =
    """SELECT doc_id,
      |       CAST(chunk_idx AS INTEGER) AS chunk_idx,
      |       CAST(least(len(w) - start, 20) AS INTEGER) AS n_tokens,
      |       array_to_string(list_slice(w, start + 1, start + 20), ' ') AS chunk_text
      |FROM (
      |  SELECT doc_id, w, unnest(starts) AS start,
      |         unnest(range(len(starts))) AS chunk_idx
      |  FROM (
      |    SELECT doc_id, w,
      |           range(0, greatest(len(w), 1), 15) AS starts
      |    FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)))
      |ORDER BY doc_id, chunk_idx""".stripMargin

  /** q52_pack_bins: deterministic SEQUENCE PACKING — assign documents to
    * fixed-token-budget training bins (budget 512) by running token count
    * in a stable pseudo-random order (content hash, doc_id): a doc's bin
    * is the budget multiple its PRECEDING cumulative count falls in.
    * First-fit-in-order packing, reproducible across runs and engines.
    *
    * The naive plan is a GLOBAL running sum — one reducer sees every row
    * (the q34-style serialization, but corpus-wide). Implemented instead
    * as the classic distributed PREFIX SCAN: the hash's value range splits
    * into order-contiguous buckets, phase 1 computes local running sums
    * within each bucket (parallel over buckets), phase 2 turns the
    * O(#buckets) bucket TOTALS into exclusive offsets (the only
    * single-partition window — 32 rows) and broadcasts them back. Exact:
    * bucket boundaries respect the global order, so local + offset is
    * bit-for-bit THE global running sum the oracle computes with one
    * plain window.
    */
  def q52(spark: SparkSession, dir: String): DataFrame = {
    val budget = 512
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(words(col("text"))).cast("long").as("n_tokens"),
        rollingHash(spark, col("text")).as("h"))
    hashOrderRunningSum(base)
      .select(col("doc_id"), col("n_tokens").cast("int").as("n_tokens"),
        expr(s"(cum - n_tokens) div $budget").as("bin"))
      .orderBy("doc_id")
  }

  /** The distributed prefix scan behind q52: running sum of `n_tokens` in
    * global (h, doc_id) order, without a corpus-wide single-partition
    * window. Input must carry (doc_id, n_tokens, h) with h ∈ [0, hRange);
    * returns the input plus `cum`. Exact: buckets are order-contiguous
    * ranges of h, so local running sum + exclusive bucket offset IS the
    * global running sum.
    */
  private[graft] def hashOrderRunningSum(
      base: DataFrame,
      nBuckets: Long = 32L,
      hRange: Long = 1000000007L): DataFrame = {
    Seq("bucket", "local_cum", "offset", "cum").foreach(c =>
      require(!base.columns.contains(c),
        s"hashOrderRunningSum reserves column name '$c' (input already has it)"))
    import org.apache.spark.sql.expressions.Window
    val width = hRange / nBuckets + 1L
    val bucketed = base.withColumn("bucket", expr(s"h div ${width}L"))
    val wLocal = Window.partitionBy(col("bucket"))
      .orderBy(asc("h"), asc("doc_id"))
    val wOff = Window.orderBy(asc("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("bucket").agg(sum("n_tokens").as("tot"))
      .withColumn("offset", coalesce(sum(col("tot")).over(wOff), lit(0L)))
      .select("bucket", "offset")
    bucketed
      .withColumn("local_cum", sum(col("n_tokens")).over(wLocal))
      .join(broadcast(offsets), "bucket")
      .withColumn("cum", col("local_cum") + col("offset"))
      .drop("bucket", "local_cum", "offset")
  }

  /** One plain global running-sum window — the semantic definition the
    * two-phase scan must reproduce exactly. DuckDB's BIGINT window sum
    * widens to HUGEINT, so it is narrowed back before the integer
    * division to match Spark's Long.
    */
  val q52Sql: String =
    """SELECT doc_id,
      |       CAST(n_tokens AS INTEGER) AS n_tokens,
      |       (CAST(cum AS BIGINT) - n_tokens) // 512 AS bin
      |FROM (
      |  SELECT doc_id, n_tokens,
      |         sum(n_tokens) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM (
      |    SELECT doc_id,
      |           len(string_split(lower(text), ' ')) AS n_tokens,
      |           list_reduce(list_prepend(CAST(0 AS BIGINT),
      |             list_transform(regexp_extract_all(text, '.'), c -> CAST(unicode(c) AS BIGINT))),
      |             (a, b) -> (a * 31 + b) % 1000000007) AS h
      |    FROM documents))
      |ORDER BY doc_id""".stripMargin

  val q50Sql: String =
    """SELECT doc_id, lang, CAST(rk AS INTEGER) AS rk FROM (
      |  SELECT doc_id, lang,
      |         row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
      |  FROM (
      |    SELECT doc_id, lang,
      |           list_reduce(list_prepend(CAST(0 AS BIGINT),
      |             list_transform(regexp_extract_all(text, '.'), c -> CAST(unicode(c) AS BIGINT))),
      |             (a, b) -> (a * 31 + b) % 1000000007) AS h
      |    FROM documents))
      |WHERE rk <= 50
      |ORDER BY doc_id""".stripMargin

  val q49Sql: String =
    s"""WITH scored AS (
      |  SELECT doc_id, lang, source, text,
      |         len(w) AS n_tokens,
      |         CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS ttr,
      |         CASE WHEN len(bg) > 0
      |              THEN CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / CAST(len(bg) AS DOUBLE)
      |              ELSE CAST(0 AS DOUBLE) END AS dup_ratio
      |  FROM (
      |    SELECT doc_id, lang, source, text,
      |           string_split(lower(text), ' ') AS w,
      |           list_transform(range(1, len(string_split(lower(text), ' '))),
      |             i -> string_split(lower(text), ' ')[i] || ' ' || string_split(lower(text), ' ')[i+1]) AS bg
      |    FROM documents)),
      |gated AS (
      |  SELECT doc_id, lang, source, text, n_tokens
      |  FROM scored
      |  WHERE n_tokens BETWEEN $QualityMinTokens AND $QualityMaxTokens AND ttr >= $QualityMinTtr AND dup_ratio <= $RepetitionMaxRatio),
      |deduped AS (
      |  SELECT doc_id, lang, source, n_tokens,
      |         list_reduce(list_prepend(CAST(0 AS BIGINT),
      |           list_transform(regexp_extract_all(text, '.'), c -> CAST(unicode(c) AS BIGINT))),
      |           (a, b) -> (a * 31 + b) % 1000000007) % 100 AS bucket
      |  FROM (
      |    SELECT *, row_number() OVER (
      |      PARTITION BY md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' '))
      |      ORDER BY doc_id) AS rn
      |    FROM gated)
      |  WHERE rn = 1)
      |SELECT doc_id, lang, source, CAST(n_tokens AS INTEGER) AS n_tokens,
      |       CASE WHEN bucket < 80 THEN 'train'
      |            WHEN bucket < 90 THEN 'val'
      |            ELSE 'test' END AS split
      |FROM deduped
      |ORDER BY doc_id""".stripMargin

  val q48Sql: String =
    """SELECT doc_id, lang,
      |       CAST(h % 1000 AS INTEGER) AS bucket,
      |       CAST(1000 AS DOUBLE) / CAST(r AS DOUBLE) AS weight
      |FROM (
      |  SELECT doc_id, lang,
      |         list_reduce(list_prepend(CAST(0 AS BIGINT),
      |           list_transform(regexp_extract_all(text, '.'), c -> CAST(unicode(c) AS BIGINT))),
      |           (a, b) -> (a * 31 + b) % 1000000007) AS h,
      |         CASE lang WHEN 'en' THEN 400 WHEN 'zh' THEN 1000 ELSE 800 END AS r
      |  FROM documents)
      |WHERE h % 1000 < r
      |ORDER BY doc_id""".stripMargin
}
