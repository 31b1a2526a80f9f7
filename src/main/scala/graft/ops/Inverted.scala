package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The MATERIALIZED inverted index — the third standing-index lifecycle
  * after IVF ([[Vector]] ivfBuild/Search/Append/Compact) and text-LSH
  * ([[Text]] lshBuild/Probe/Append/Compact), for the retrieval family:
  * q57 builds posting lists in-query and q58/q61 re-tokenize the corpus
  * per search, which at 100 TB re-pays a corpus scan for every query.
  * Here the corpus is tokenized ONCE into a term-bucket-partitioned
  * posting store, and a search reads only its query terms' buckets — a
  * PARTITION-PRUNED scan of ~|terms|/nBuckets of the index with zero
  * corpus-sized stage (unlike the LSH probe, whose exact-verify step
  * scans the corpus shingle column: posting lookups need no
  * verification, so pruning here is total).
  *
  * Layout under `indexDir`:
  *  - `meta`: one row (n_buckets) — the FROZEN partitioning arity; reads
  *    and appends take it from the index, so a drift between build and
  *    probe is structurally impossible (the LSH/IVF discipline).
  *  - `stats`: (n_docs, total_dl) — ONE ROW PER GENERATION, summed on
  *    read. Appends add a row instead of rewriting (BM25's N and avgdl
  *    are sums, so generation rows merge exactly); compaction collapses
  *    them back to one row. Token-less docs count here (they carry no
  *    postings but belong in N and avgdl — the bm25 denominator).
  *  - `postings`: (term, doc_id, tf, dl, positions) DIRECTORY-PARTITIONED
  *    by `tbucket` = crc32(term) mod n_buckets, value prefixed "t"
  *    (string partition inference, ivfBuild's trick). crc32 because both
  *    the executor (`functions.crc32`) and the driver
  *    (`java.util.zip.CRC32`) compute the same IEEE CRC-32 over UTF-8
  *    bytes — query-time bucket ids are driver-side LITERALS, so the
  *    pruning is static partition pruning, not even DPP. dl is
  *    denormalized into the posting row so scoring needs no doc-length
  *    join (the one corpus-sized table a normalized layout would scan).
  *
  * Tokenization is the retrieval family's contract: lowercase,
  * space-split, empty tokens dropped, position = pre-filter index
  * (q57/q58's definition).
  */
object Inverted {

  private def bucketCol(term: Column, nBuckets: Int): Column =
    concat(lit("t"), pmod(crc32(term.cast("binary")), lit(nBuckets.toLong))
      .cast("string"))

  private def bucketOf(term: String, nBuckets: Int): String = {
    val c = new java.util.zip.CRC32()
    c.update(term.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    "t" + (c.getValue % nBuckets)
  }

  /** The per-doc posting projection shared verbatim by [[invBuild]] and
    * [[invAppend]] (frozen-derivation discipline): one row per (doc,
    * term) with tf, the doc's non-empty token count dl, and the sorted
    * position list.
    */
  private def postingsOf(docs: DataFrame, nBuckets: Int): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), " ")).as(Seq("pos", "term")),
        size(filter(split(lower(col("text")), " "), t => t =!= ""))
          .as("dl"))
      .filter(col("term") =!= "")
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))
      .select(bucketCol(col("term"), nBuckets).as("tbucket"),
        col("term"), col("doc_id"), col("tf"), col("dl"), col("positions"))

  private def statsOf(docs: DataFrame): DataFrame =
    docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(filter(split(lower(col("text")), " "), t => t =!= "")))
        .cast("long").as("total_dl"))

  def invBuild(
      docs: DataFrame,
      indexDir: String,
      nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1, s"nBuckets must be positive: $nBuckets")
    val spark = docs.sparkSession
    spark.range(1).select(lit(nBuckets).as("n_buckets"))
      .write.mode("overwrite").parquet(s"$indexDir/meta")
    statsOf(docs).write.mode("overwrite").parquet(s"$indexDir/stats")
    postingsOf(docs, nBuckets)
      .write.mode("overwrite").partitionBy("tbucket")
      .parquet(s"$indexDir/postings")
  }

  private def nBucketsOf(spark: SparkSession, indexDir: String): Int =
    spark.read.parquet(s"$indexDir/meta").head().getAs[Int]("n_buckets")

  /** Delta maintenance: tokenize ONLY the delta under the frozen bucket
    * arity, append its postings to the touched bucket partitions and its
    * (n_docs, total_dl) as a new stats generation row. Cost is
    * delta-proportional; N/avgdl/df correctness after append is exact
    * because all three are sums over disjoint doc sets (spec-pinned:
    * append ≡ build over the union). Caller owns doc_id uniqueness
    * across appends — a re-appended doc would double its postings AND
    * its stats row, as with any index.
    */
  def invAppend(
      spark: SparkSession,
      indexDir: String,
      delta: DataFrame): Unit = {
    val nBuckets = nBucketsOf(spark, indexDir)
    statsOf(delta).write.mode("append").parquet(s"$indexDir/stats")
    postingsOf(delta, nBuckets)
      .write.mode("append").partitionBy("tbucket")
      .parquet(s"$indexDir/postings")
  }

  /** BM25 over the standing index: the query terms' bucket ids are
    * driver-side crc32 LITERALS, so the posting read is a statically
    * partition-pruned scan (plan-asserted in InvertedSpec) further
    * row-filtered to the exact terms; (N, avgdl) come from the tiny
    * stats table (summed across generations — one 1-row job); df is
    * counted on the pruned slice (one posting row per (doc, term) by
    * construction, so count per term IS document frequency). Scoring is
    * [[Text.bm25ScoreTf]] — the SAME chain [[Text.bm25]] runs, shared so
    * the index path cannot drift (driver-gated: q61c shares q61's
    * oracle). No stage of the search touches more than the query terms'
    * slice of the index.
    */
  def invSearch(
      spark: SparkSession,
      indexDir: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topN: Int = 20): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    require(terms.distinct == terms, s"duplicate query terms: $terms")
    val nBuckets = nBucketsOf(spark, indexDir)
    val buckets = terms.map(bucketOf(_, nBuckets)).distinct
    val stats = spark.read.parquet(s"$indexDir/stats")
      .agg(sum(col("n_docs")).as("n"), sum(col("total_dl")).as("dl"))
      .head()
    val n = lit(stats.getLong(0))
    val avgdl = lit(stats.getLong(1).toDouble / stats.getLong(0).toDouble)
    val tf = spark.read.parquet(s"$indexDir/postings")
      .filter(col("tbucket").isin(buckets: _*))
      .filter(col("term").isin(terms: _*))
      .select(col("doc_id"), col("term"), col("dl"), col("tf"))
    Text.bm25ScoreTf(tf, n, avgdl, k1, b, topN)
  }

  /** Exact phrase search over the standing index: each phrase term's
    * positions come from ONE pruned posting lookup (the collapse q58's
    * scaladoc promises "against a MATERIALIZED q57 index"), adjacency is
    * the same (doc, pos+offset) equi-join chain. Returns (doc_id, pos)
    * of the phrase's first token, q58's shape (q58b shares its oracle).
    */
  def invPhrase(
      spark: SparkSession,
      indexDir: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "a phrase needs at least two terms")
    val nBuckets = nBucketsOf(spark, indexDir)
    val buckets = phrase.map(bucketOf(_, nBuckets)).distinct
    val postings = spark.read.parquet(s"$indexDir/postings")
      .filter(col("tbucket").isin(buckets: _*))
      .filter(col("term").isin(phrase.distinct: _*))
    def occs(term: String, as: String) = postings
      .filter(col("term") === term)
      .select(col("doc_id").as(s"${as}_doc"),
        explode(col("positions")).as(s"${as}_pos"))
    val frames = phrase.zipWithIndex.map { case (t, i) => occs(t, s"t$i") }
    frames.tail.zipWithIndex
      .foldLeft(frames.head) { case (acc, (next, idx)) =>
        val i = idx + 1 // term i must sit i positions after the first
        acc.join(next,
          col("t0_doc") === col(s"t${i}_doc") &&
            col(s"t${i}_pos") === col("t0_pos") + i)
      }
      .select(col("t0_doc").as("doc_id"),
        col("t0_pos").cast("int").as("pos"))
      .orderBy("doc_id", "pos")
  }

  /** Small-file compaction: postings rewritten ONE FILE PER BUCKET and
    * the stats generations collapsed to a single row, each behind
    * [[graft.sources.SwapDir]]'s crash-safe rename-aside swap
    * ([[invRecover]] heals interruptions and runs here on entry).
    * Contents untouched ⇒ searches bit-identical (spec-pinned).
    */
  def invCompact(spark: SparkSession, indexDir: String): Unit = {
    invRecover(spark, indexDir)
    spark.read.parquet(s"$indexDir/postings")
      .repartition(col("tbucket"))
      .write.mode("overwrite").partitionBy("tbucket")
      .parquet(graft.sources.SwapDir.stagePath(indexDir, "postings"))
    graft.sources.SwapDir.swap(spark, indexDir, "postings")
    spark.read.parquet(s"$indexDir/stats")
      .agg(sum(col("n_docs")).cast("long").as("n_docs"),
        sum(col("total_dl")).cast("long").as("total_dl"))
      .write.mode("overwrite")
      .parquet(graft.sources.SwapDir.stagePath(indexDir, "stats"))
    graft.sources.SwapDir.swap(spark, indexDir, "stats")
  }

  /** Heal an interrupted [[invCompact]] swap — both tables independently
    * (a crash between the two swaps leaves postings promoted, stats
    * not; each rolls to a complete generation).
    */
  def invRecover(spark: SparkSession, indexDir: String): Unit = {
    graft.sources.SwapDir.recover(spark, indexDir, "postings",
      s"invRecover: no postings at $indexDir in any generation — " +
        "the index is gone, rebuild with invBuild")
    graft.sources.SwapDir.recover(spark, indexDir, "stats",
      s"invRecover: no stats at $indexDir in any generation — " +
        "the index is gone, rebuild with invBuild")
  }

  /** q61c_bm25_indexed: q61's two-term BM25 through the FULL index
    * lifecycle — build 3/5 of the corpus, append the rest under the
    * frozen bucket arity, compact (rename-aside swap included), search.
    * The index holds every document, so the result — N, avgdl, df, tf,
    * dl, scores, top-20 — is q61's exactly; SHARES q61's oracle (the
    * q71/x21b precedent: every index stage driver-gated).
    */
  def q61c(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val idx = graft.TempRoots.create("graft_inv_q61c_")
    invBuild(docs.filter(pmod(col("doc_id"), lit(5L)) < 3), idx)
    invAppend(spark, idx, docs.filter(pmod(col("doc_id"), lit(5L)) >= 3))
    invCompact(spark, idx)
    invSearch(spark, idx, Seq("table", "hash"))
  }

  /** q58b_phrase_indexed: q58's phrase search as two pruned posting
    * lookups against the materialized index. Deliberately searches the
    * APPENDED two-generation index WITHOUT compacting (q61c gates the
    * compacted path), so the gate also proves multi-generation bucket
    * partitions serve queries correctly. Shares q58's oracle — the
    * direct-bigram-scan definition, so the index path is verified
    * against the definition, not against q58's join technique.
    */
  def q58b(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val idx = graft.TempRoots.create("graft_inv_q58b_")
    invBuild(docs.filter(pmod(col("doc_id"), lit(5L)) < 3), idx)
    invAppend(spark, idx, docs.filter(pmod(col("doc_id"), lit(5L)) >= 3))
    invPhrase(spark, idx, Seq("table", "hash"))
  }
}
