package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Text-analysis operators for the LLM-data-pipeline surface beyond the
  * survey's declared set: language-ID, quality scoring, document
  * fingerprinting, SimHash near-dup bucketing. All deterministic and
  * DuckDB-oracled (integer or 6-dp-rounded outputs only).
  */
object TextAnalysisOps {

  /** Max document frequency (distinct names) a token may have and still
    * BLOCK fuzzy-match candidates — see [[fuzzyNameMatch]].
    */
  val FuzzyBlockCap = 256L

  /** THE fixed retrieval workload (3 queries × 3 terms) — single source
    * of truth shared by `bm25_topk`, `hybrid_rrf_topk`, `mmr_rerank_k8`
    * and their oracle SQLs (SparkEntry interpolates
    * [[queryWorkloadValuesSql]] so the engine and oracle sides cannot
    * drift). At production scale this literal becomes a query TABLE of
    * millions of rows; every consuming plan keys its joins on (qid,
    * doc_id) or `term`, so nothing degrades when it does.
    */
  val queryWorkload: Seq[(Long, String)] = Seq(
    1L -> "scan", 1L -> "filter", 1L -> "fast",
    2L -> "join", 2L -> "key", 2L -> "merge",
    3L -> "stream", 3L -> "window", 3L -> "batch")

  /** [[queryWorkload]] as a DataFrame — the broadcast side of every
    * retrieval plan.
    */
  private[graft] def queryTerms(spark: SparkSession): DataFrame = {
    import spark.implicits._
    queryWorkload.toDF("qid", "q_term")
  }

  /** [[queryWorkload]] as an ANSI `q(qid, q_term) AS (VALUES ...)` CTE
    * body fragment for the oracle SQLs.
    */
  val queryWorkloadValuesSql: String =
    "q(qid, q_term) AS (VALUES " +
      queryWorkload.map { case (q, t) => s"($q, '$t')" }.mkString(", ") + ")"

  /** Fixed keyword lists for the unigram language-ID heuristic. On real
    * corpora these would be per-language stopword lists; the synthetic
    * fixture shares one vocabulary across langs, so accuracy is chance —
    * the operator contract (deterministic keyword-count scoring, argmax
    * with ascending-lang tie-break) is what's being exercised.
    */
  val langKeywords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("customer", "row"),
    "en" -> Seq("order", "the"),
    "es" -> Seq("slow", "vector"),
    "fr" -> Seq("scan", "batch"),
    "zh" -> Seq("join", "small"))

  private def scoreExpr(kws: Seq[String]): String = {
    val set = kws.map(k => s"'$k'").mkString(", ")
    s"size(filter(split(text, ' '), x -> x IN ($set)))"
  }

  /** V+: vocabulary coverage — build the corpus top-100 token vocabulary
    * (count desc, token asc tie-break), broadcast it against the exploded
    * token stream, report per-language out-of-vocabulary rates. The
    * tokenizer-coverage analysis every training pipeline runs before
    * committing to a vocab; at 100 TB the vocab is an aggregate (tiny,
    * broadcastable) and the token stream never shuffles more than the
    * per-language partial counts.
    */
  def vocabCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(100)
      .select(col("tok").as("v_tok"))
    toks.join(broadcast(vocab), col("tok") === col("v_tok"), "left")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("v_tok").isNull, 1L).otherwise(0L)).as("n_oov"),
        (sum(when(col("v_tok").isNull, 1L).otherwise(0L)).cast("double")
          / count(lit(1)).cast("double")).as("oov_rate"))
      .orderBy(col("lang"))
  }

  /** V+: deterministic stratified sampling — 10 docs per language chosen by
    * md5-hash order (never `rand()`/TABLESAMPLE: those are irreproducible
    * under retries and engine-specific). Hash-order sampling is the
    * training-data-pipeline way to take a stable subsample that any engine,
    * any partitioning, any rerun reproduces bit-for-bit. One shuffle on the
    * stratum key; WindowGroupLimit keeps only 10 rows per stratum map-side.
    */
  def hashSampleStratified(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(spark, sfDir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("lang"), col("rk").cast("long").as("rk"), col("doc_id"))
      .orderBy(col("lang"), col("rk"))
  }

  /** V+: corpus cleaning — the normalize step of a training-data pipeline:
    * strip non-[a-z0-9 ] characters, collapse whitespace runs, trim; report
    * per-language how many docs changed and the size reduction. Pure
    * codegen'd string expressions (no UDF), embarrassingly parallel; the
    * shuffle moves only 5 aggregate rows. Spark's regexp_replace is
    * replace-all; DuckDB needs the explicit 'g' flag for parity.
    */
  def regexCleanStats(spark: SparkSession, sfDir: String): DataFrame = {
    val cleaned = Tables.documents(spark, sfDir)
      .withColumn("clean",
        trim(regexp_replace(regexp_replace(col("text"), "[^a-z0-9 ]", ""), " +", " ")))
    cleaned
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("clean") =!= col("text"), 1L).otherwise(0L)).as("n_changed"),
        sum(length(col("text")).cast("long")).as("chars_raw"),
        sum(length(col("clean")).cast("long")).as("chars_clean"))
      .orderBy(col("lang"))
  }

  /** V+: language-ID confusion matrix — keyword-count score per language,
    * argmax prediction (ties → first language in ascending order), grouped
    * against the true lang. Integer arithmetic only → exact cross-engine.
    */
  def langIdConfusion(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = Tables.documents(spark, sfDir)
      .select(
        col("lang") +: langKeywords.map { case (l, kws) => expr(scoreExpr(kws)).as(s"s_$l") }: _*)
    val langs = langKeywords.map(_._1)
    val predCase = langs.init.zipWithIndex.map { case (l, i) =>
        val rest = langs.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
        s"WHEN $rest THEN '$l'"
      }.mkString("CASE ", " ", s" ELSE '${langs.last}' END")
    scored
      .withColumn("pred_lang", expr(predCase))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  /** V+: per-source quality statistics — token counts, type-token ratio,
    * stopword ratio and a composite score. Mirrors the usual pre-training
    * quality gates (length/stopword/diversity heuristics).
    */
  def textQuality(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .select(
        col("source"),
        expr("size(split(text, ' '))").cast("double").as("n_tokens"),
        expr("size(array_distinct(split(text, ' ')))").cast("double").as("n_distinct"),
        expr("size(filter(split(text, ' '), x -> x IN ('the', 'a')))").cast("double").as("n_stop"),
        col("n_chars").cast("double").as("chars"))
      .withColumn("ttr", col("n_distinct") / col("n_tokens"))
      .withColumn("stop_ratio", col("n_stop") / col("n_tokens"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("n_tokens")), 6).as("avg_tokens"),
        round(avg(col("chars") / col("n_tokens")), 6).as("avg_tok_len"),
        round(avg(col("ttr")), 6).as("avg_ttr"),
        round(avg(col("stop_ratio")), 6).as("avg_stop_ratio"),
        round(avg(col("ttr") * (lit(1.0) - col("stop_ratio"))), 6).as("avg_quality"))
      .orderBy(col("source"))
  }

  /** V+: order-sensitive document fingerprint — bit_xor over 60-bit hashes
    * of (position, token), plus a first-8-tokens prefix fingerprint.
    * Content-defined identity that survives re-partitioning (XOR is
    * commutative; position-tagging restores order sensitivity). At 100 TB
    * this is the cheap first-pass identity for incremental dedup.
    */
  def docFingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .withColumn("h",
        expr("CAST(conv(substr(md5(concat(CAST(pos AS STRING), ':', tok)), 1, 15), 16, 10) AS BIGINT)"))
      .groupBy(col("doc_id"))
      .agg(
        expr("bit_xor(h)").as("fp"),
        expr("bit_xor(CASE WHEN pos < 8 THEN h END)").as("prefix_fp"),
        count(lit(1)).as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** V+: 16-bit SimHash near-dup buckets. Each token hashes to 32 bits
    * (md5 window); bit b of the signature is the sign of the ±1 vote sum
    * over the token multiset. Docs sharing a signature are near-dup
    * candidates — reported as bucket sizes for buckets with > 1 doc.
    */
  def dedupDocsSimhash(spark: SparkSession, sfDir: String): DataFrame = {
    val votes = (0 until 16).map(b =>
      sum(expr(s"CASE WHEN (tokint >> $b) & 1 = 1 THEN 1 ELSE -1 END")).as(s"s$b"))
    val assemble = (0 until 16)
      .map(b => s"(CASE WHEN s$b > 0 THEN ${1 << b} ELSE 0 END)")
      .mkString("CAST(", " + ", " AS BIGINT)")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("tokint", expr("CAST(conv(substr(md5(tok), 1, 8), 16, 10) AS BIGINT)"))
      .groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .withColumn("simhash", expr(assemble))
      .groupBy(col("simhash"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)
      .orderBy(col("simhash"))
  }

  /** CMS geometry: d hash rows × w buckets. Fixture-scaled (N ≈ 60k token
    * occurrences at sf0.01 → expected overcount N/w ≈ 60 per row, min-of-4
    * far lower); at production N grow w — the sketch stays d·w counters
    * regardless of corpus size.
    */
  val CmsDepth = 4
  val CmsWidth = 1024

  private def cmsBucketSql(r: Int): String =
    s"CAST(conv(substr(md5(concat('cms$r:', tok)), 1, 15), 16, 10) AS BIGINT) % $CmsWidth"

  /** V+: COUNT-MIN SKETCH point estimates — the frequency-sketch member
    * that completes the mergeable-summary family (HLL cardinality, bitmap
    * exact-distinct, GK quantiles, Misra-Gries heavy hitters, Bloom
    * membership, CMS frequency): d=4 seeded md5 rows × w=1024 counters
    * built in ONE map-side-combined aggregation over the exploded token
    * stream (the sketch table is d·w rows at ANY corpus size — this is the
    * entire exchange), then the top-20 tokens' estimates read back as
    * min-over-rows with the audit columns a sketch validation needs:
    * exact count, estimate, overcount (≥ 0 always; ≤ N·e/w w.h.p.).
    * Production queries the sketch WITHOUT the exact pass (point lookups
    * on a 4096-row broadcast table); the exact side here exists to be
    * audited against — same role as `heavy_hitters_tokens`' recount.
    * Fully DuckDB-oracled: the row hashes are the engine-portable
    * md5-hex-prefix integers ([[docFingerprint]] pattern), so both engines
    * build the IDENTICAL sketch.
    */
  def cmsTokenCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    // r16 (guide §1.2 step 2 — per-task work): the sketch rows hash per
    // DISTINCT token and SUM the exact counts instead of hashing per
    // token OCCURRENCE — sketch[r][b] = Σ_{tok→b} count(tok) is the same
    // number as counting occurrence rows, so the d=4 seeded md5 chains
    // (the declared cross-engine hash, not swappable) run |vocab|×4
    // times, not |corpus tokens|×4. The (tok → count) aggregate is the
    // IDENTICAL subtree the heavy/top-20 branch groups on, so its
    // exchange is reused at runtime and the sketch build adds no second
    // corpus pass.
    val tokCounts = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
    val entries = tokCounts.select(col("n_exact"), explode(array((0 until CmsDepth).map(r =>
        struct(lit(r).as("r"), expr(cmsBucketSql(r)).as("b"))): _*)).as("e"))
      .select(col("n_exact"), col("e.r").as("r"), col("e.b").as("b"))
    val sketch = entries.groupBy(col("r"), col("b")).agg(sum(col("n_exact")).as("c"))
    val heavy = tokCounts
      .orderBy(col("n_exact").desc, col("tok")).limit(20)
    val probes = heavy.select(col("tok"), col("n_exact"),
        explode(array((0 until CmsDepth).map(r =>
          struct(lit(r).as("r"), expr(cmsBucketSql(r)).as("b"))): _*)).as("e"))
      .select(col("tok"), col("n_exact"), col("e.r").as("r"), col("e.b").as("b"))
    probes.join(sketch, Seq("r", "b"))
      .groupBy(col("tok"), col("n_exact"))
      .agg(min(col("c")).as("n_cms"))
      .select(col("tok"), col("n_exact"), col("n_cms"),
        (col("n_cms") - col("n_exact")).as("overcount"))
      .orderBy(col("n_exact").desc, col("tok"))
  }

  /** Oracle SQL builders (shared term generation keeps the 16 simhash
    * terms in lockstep with the Spark side).
    */
  /** V+: rarity-weighted top terms per document — tf-idf-shaped keyword
    * extraction with a HASH-SAFE score: `tf × N_docs / df` (document
    * frequency), which ranks identically to tf × (N/df) monotone
    * transforms but uses only IEEE-exact multiply/divide — deliberately
    * NOT `tf·ln(N/df)`, whose last-ulp libm differences across engines
    * would break the 6-dp hash protocol (same reasoning as
    * [[TextOps.docCommonness]]'s no-log rule). Plan: one (doc, term)
    * count aggregate (partial+final), a vocab-sized df aggregate that
    * broadcasts back onto it, a 1-row N crossJoin, and a per-doc top-3
    * window — at 100 TB every exchange carries per-doc or per-vocab
    * aggregates, never raw text, and the window partitions by doc_id (no
    * skew: per-doc term counts are bounded by doc length).
    */
  def rarityTopTerms(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("tok"))
    tf.join(df, "tok")
      .crossJoin(n)
      .withColumn("score",
        col("tf").cast("double") * col("n_docs").cast("double") / col("df").cast("double"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      // row_number is int32; the output-type protocol (COVERAGE.md) says
      // integer outputs surface as BIGINT on both engines — the r11 typed
      // local gate flagged this one (the driver's hash happened to widen).
      .select(col("doc_id"), col("rk").cast("long").as("rk"),
        col("tok"), col("tf"), col("score"))
      .orderBy(col("doc_id"), col("rk"))
  }

  object Oracle {
    val langIdConfusion: String = {
      val scores = langKeywords.map { case (l, kws) =>
        val set = kws.map(k => s"'$k'").mkString(", ")
        s"len(list_filter(string_split(text, ' '), x -> x IN ($set))) AS s_$l"
      }.mkString(",\n  ")
      val langs = langKeywords.map(_._1)
      val predCase = langs.init.zipWithIndex.map { case (l, i) =>
          val rest = langs.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
          s"WHEN $rest THEN '$l'"
        }.mkString("CASE ", " ", s" ELSE '${langs.last}' END")
      s"""WITH scored AS (SELECT lang,
         |  $scores
         |FROM documents)
         |SELECT lang, $predCase AS pred_lang, CAST(count(*) AS BIGINT) AS n_docs
         |FROM scored
         |GROUP BY lang, pred_lang
         |ORDER BY lang, pred_lang""".stripMargin
    }

    val textQuality: String =
      """WITH t AS (SELECT source,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_distinct,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE) AS n_stop,
        |    CAST(n_chars AS DOUBLE) AS chars
        |  FROM documents),
        |q AS (SELECT source, n_tokens, chars,
        |    n_distinct / n_tokens AS ttr, n_stop / n_tokens AS stop_ratio FROM t)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  round(avg(n_tokens), 6) AS avg_tokens,
        |  round(avg(chars / n_tokens), 6) AS avg_tok_len,
        |  round(avg(ttr), 6) AS avg_ttr,
        |  round(avg(stop_ratio), 6) AS avg_stop_ratio,
        |  round(avg(ttr * (1.0 - stop_ratio)), 6) AS avg_quality
        |FROM q
        |GROUP BY source
        |ORDER BY source""".stripMargin

    val cmsTokenCounts: String = {
      def bucket(r: Int) =
        s"('0x' || substr(md5('cms$r:' || tok), 1, 15))::BIGINT % $CmsWidth"
      val entryRows = (0 until CmsDepth)
        .map(r => s"SELECT ${if (r == 0) s"$r AS r" else r.toString}, ${
          if (r == 0) s"${bucket(r)} AS b" else bucket(r)} FROM tk")
        .mkString("\n  UNION ALL ")
      val probeRows = (0 until CmsDepth)
        .map(r => s"SELECT tok, n_exact, ${if (r == 0) s"$r AS r" else r.toString}, ${
          if (r == 0) s"${bucket(r)} AS b" else bucket(r)} FROM heavy")
        .mkString("\n  UNION ALL ")
      s"""WITH tk0 AS (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents),
         |tk AS (SELECT tok FROM tk0 WHERE length(tok) > 0),
         |entries AS (
         |  $entryRows),
         |sketch AS (SELECT r, b, count(*) AS c FROM entries GROUP BY 1, 2),
         |heavy AS (SELECT tok, count(*) AS n_exact FROM tk
         |  GROUP BY 1 ORDER BY n_exact DESC, tok LIMIT 20),
         |probes AS (
         |  $probeRows),
         |est AS (SELECT p.tok, p.n_exact, min(s.c) AS n_cms
         |  FROM probes p JOIN sketch s USING (r, b) GROUP BY 1, 2)
         |SELECT tok, CAST(n_exact AS BIGINT) AS n_exact,
         |  CAST(n_cms AS BIGINT) AS n_cms,
         |  CAST(n_cms - n_exact AS BIGINT) AS overcount
         |FROM est
         |ORDER BY n_exact DESC, tok""".stripMargin
    }

    val docFingerprint: String =
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |px AS (SELECT doc_id, i - 1 AS pos, t[i] AS tok
        |  FROM tok, UNNEST(generate_series(1, len(t))) AS u(i)),
        |h AS (SELECT doc_id, pos,
        |    ('0x' || substr(md5(CAST(pos AS VARCHAR) || ':' || tok), 1, 15))::BIGINT AS h
        |  FROM px)
        |SELECT doc_id, bit_xor(h) AS fp,
        |  bit_xor(CASE WHEN pos < 8 THEN h END) AS prefix_fp,
        |  CAST(count(*) AS BIGINT) AS n_tokens
        |FROM h
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin

    val dedupDocsSimhash: String = {
      val votes = (0 until 16)
        .map(b => s"sum(CASE WHEN (tokint >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b")
        .mkString(",\n    ")
      val assemble = (0 until 16)
        .map(b => s"(CASE WHEN s$b > 0 THEN ${1 << b} ELSE 0 END)")
        .mkString("CAST(", " + ", " AS BIGINT)")
      s"""WITH tk AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
         |hx AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS tokint FROM tk),
         |v AS (SELECT doc_id,
         |    $votes
         |  FROM hx GROUP BY doc_id),
         |s AS (SELECT doc_id, $assemble AS simhash FROM v)
         |SELECT simhash, CAST(count(*) AS BIGINT) AS n_docs
         |FROM s
         |GROUP BY simhash
         |HAVING count(*) > 1
         |ORDER BY simhash""".stripMargin
    }
  }

  /** V+/entity-resolution: FUZZY STRING-MATCH join over the part-name
    * domain — the standard blocked edit-distance matcher (candidates share
    * a token; survivors are within Levenshtein ≤ 3), with the one plan
    * decision that makes it scale: match the DISTINCT VALUE DOMAIN, never
    * the fact rows. The name domain is vocabulary-sized (64 names at every
    * SF here) and carries each name's row count, so the quadratic term is
    * O(block²) over the domain — constant in fact-table volume — and the
    * row-level linkage is the final count join-back. At 100 TB the same
    * shape holds: distinct-aggregate first (partial agg collapses the fact
    * scan), block on rare tokens, verify with the exact metric, broadcast
    * the (tiny) match table back onto facts when materializing links.
    * Levenshtein is exact and engine-portable (same DP recurrence in Spark
    * and DuckDB) — no similarity-score floats in the hash compare.
    */
  def fuzzyNameMatch(spark: SparkSession, sfDir: String): DataFrame = {
    val names = Tables.part(spark, sfDir)
      .select(col("p_name").as("nm"))
      .groupBy(col("nm")).agg(count(lit(1)).as("n_rows"))
    val tok = names.select(col("nm"), explode(split(col("nm"), " ")).as("tk"))
    // Frequency cap on BLOCKING tokens (r9, driver VERDICT #4): a token
    // shared by DF distinct names contributes a DF²/2 candidate block, so
    // one ubiquitous token ("premium", "ltd") re-inflates the quadratic
    // term the domain-blocking confined. Tokens with DF > FuzzyBlockCap
    // are dropped FROM BLOCKING ONLY (the verify join is unchanged):
    // worst-case block is now ≤ FuzzyBlockCap²/2 ≈ 32k pairs per token,
    // total candidates ≤ |token vocab| · cap²/2 — linear in vocabulary,
    // constant in fact volume. Mirrored in the oracle SQL, so the
    // semantics (a pair must share a RARE token to be matched) hold
    // identically at every scale; at the 64-name fixture domain no token
    // reaches the cap, so the declared output is unchanged.
    val blockable = tok
      .groupBy(col("tk")).agg(countDistinct(col("nm")).as("df"))
      .filter(col("df") <= FuzzyBlockCap)
      .select(col("tk"))
    val btok = tok.join(broadcast(blockable), "tk")
    val cand = btok.as("a").join(btok.as("b"),
        col("a.tk") === col("b.tk") && col("a.nm") < col("b.nm"))
      .select(col("a.nm").as("nm1"), col("b.nm").as("nm2"))
      .distinct()
    cand.withColumn("dist", levenshtein(col("nm1"), col("nm2")).cast("long"))
      .filter(col("dist") <= 3)
      .join(names.select(col("nm").as("nm1"), col("n_rows").as("n1")), "nm1")
      .join(names.select(col("nm").as("nm2"), col("n_rows").as("n2")), "nm2")
      .select(col("nm1"), col("nm2"), col("dist"), col("n1"), col("n2"))
      .orderBy(col("dist"), col("nm1"), col("nm2"))
  }

  /** V+: PII SCRUB — the redaction pass a corpus runs before training:
    * email and phone patterns replaced with typed placeholders, counted
    * per language. The fixture text carries no PII, so the operator
    * PLANTS it deterministically (an email on doc_id % 3 = 0, a phone on
    * % 2 = 0 — mirrored in the oracle), making the redaction counts
    * non-trivial and the scrubbed-length accounting exact. Patterns stay
    * in the Java∩RE2 common dialect (no backreferences, no lookaround)
    * so Spark and the oracle engine match identically; DuckDB needs the
    * 'g' flag to match Spark's replace-all default. Scale posture: pure
    * map-side codegen regexes over the scan — zero shuffle before the
    * |langs|-row aggregate; the scrubbed text would stream straight to
    * the sink in production (the declared surface is the audit table).
    */
  def piiScrubStats(spark: SparkSession, sfDir: String): DataFrame = {
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "\\+1-555-[0-9]{4}"
    val aug = Tables.documents(spark, sfDir)
      .withColumn("aug", concat(
        col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 2 === 0,
          concat(lit(" call +1-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit(""))))
    aug
      .withColumn("n_emails",
        size(regexp_extract_all(col("aug"), lit(emailRe), lit(0))).cast("long"))
      .withColumn("n_phones",
        size(regexp_extract_all(col("aug"), lit(phoneRe), lit(0))).cast("long"))
      .withColumn("clean",
        regexp_replace(regexp_replace(col("aug"), emailRe, "<EMAIL>"), phoneRe, "<PHONE>"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_emails")).as("n_emails"),
        sum(col("n_phones")).as("n_phones"),
        sum((length(col("aug")) - length(col("clean"))).cast("long")).as("chars_redacted"))
      .orderBy(col("lang"))
  }

  /** V+: CORPUS MIXTURE TABLE — the per-domain sampling plan a training run
    * consumes (the "epochs per domain" table of LLaMA-style data recipes):
    * per language, document and token mass, the domain's share of the
    * corpus, and the repeat factor that equalizes token mass against the
    * largest domain. Counts are exact BIGINT sums of whitespace token
    * counts (the [[TextOps]] tokenizer); `share` and `repeat_factor` are
    * raw IEEE quotients of exact integers (oracle-parity class 2 in
    * COVERAGE.md — no `round()`). Scale posture: ONE corpus scan feeds a
    * partial-agg'd per-lang count (|langs| groups); the two corpus-wide
    * scalars ride a broadcast cross join of a 1-row aggregate over that
    * tiny table — the fact scan never repeats and never shuffles twice.
    */
  /** V+: BM25 RANKED RETRIEVAL over the corpus — the scoring half the
    * inverted index ([[TextOps.postingLists]]) exists for: three fixed
    * keyword queries ranked against every English document, top-10 each.
    * Okapi BM25 with k1=1.2, b=0.75, and the LOG-FREE rational idf
    * `(N − df + 0.5)/(df + 0.5)` — the house no-libm rule (COVERAGE.md;
    * `ln` is the one op whose last ulp differs across engines, same reason
    * `drift_tv_distance` uses TV not KL). Rank-ordering is preserved: the
    * rational form is the argument of the standard idf's monotone `ln`.
    * Determinism: tf/df/dl/N are exact BIGINTs, avgdl a class-2 quotient,
    * and each per-term score is ONE fixed left-associated chain of IEEE
    * ops — both engines evaluate the identical expression text — then
    * quantized to BIGINT micro-units BEFORE the per-doc sum, so the
    * query-document score is an exact integer no summation order can
    * perturb. Scale posture: the exploded token stream is semi-filtered
    * against the broadcast query-term set BEFORE the tf aggregate, so
    * the only exchange carries (doc, query-term) rows — postings of the
    * workload's terms, never the corpus vocabulary; df comes off the
    * same filtered aggregate. The classic "search engine as a join"
    * plan, never a corpus × query scan.
    */
  def bm25Topk(spark: SparkSession, sfDir: String): DataFrame = {
    val queries = queryTerms(spark)
    val docToks = Tables.documents(spark, sfDir)
      .filter(col("lang") === "en")
      .select(col("doc_id"),
        expr("filter(split(text, ' '), x -> length(x) > 0)").as("toks"))
    val dl = docToks.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val stats = dl.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    // Only the workload terms ever reach the scorer, so semi-filter the
    // exploded token stream against the broadcast query-term set BEFORE
    // the tf aggregate (guide §2.3 — aggregate only what you keep): the
    // pre-r16 form aggregated tf over EVERY (doc, term) pair and df over
    // EVERY term just to keep the 9 workload terms downstream. df is
    // unchanged by the filter — a query term's df is the count of docs
    // containing it, i.e. the count of its (filtered) tf rows.
    val tf = docToks
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .join(broadcast(queries.select(col("q_term")).distinct()),
        col("term") === col("q_term"), "left_semi")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val perTerm = tf
      .join(broadcast(queries), col("term") === col("q_term"))
      .join(df_, Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      // identical expression text to the oracle: idf · saturated-tf, one
      // left-associated chain, quantized per term
      .withColumn("score_micro", expr(
        "CAST(floor(((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) * " +
          "((CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + " +
          "1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))) * 1000000 + 0.5) AS BIGINT)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score_micro").desc, col("doc_id"))
    perTerm
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("score_micro")).as("score_micro"), count(lit(1)).as("n_terms_hit"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .select(col("qid"), col("rank"), col("doc_id"), col("score_micro"), col("n_terms_hit"))
      .orderBy(col("qid"), col("rank"))
  }

  def corpusMixWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val perLang = Tables.documents(spark, sfDir)
      .select(col("lang"),
        expr("CAST(size(filter(split(text, ' '), x -> length(x) > 0)) AS BIGINT)").as("n_tokens"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    val totals = perLang.agg(
      sum(col("n_tokens")).as("total_tokens"),
      max(col("n_tokens")).as("max_tokens"))
    perLang.crossJoin(broadcast(totals))
      .select(
        col("lang"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("total_tokens").cast("double")).as("share"),
        (col("max_tokens").cast("double") / col("n_tokens").cast("double")).as("repeat_factor"))
      .orderBy(col("lang"))
  }
}
