package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Corpus-curation band v3: positional phrase retrieval, Gopher-style
  * per-document quality rules, and duplicated-span TOKEN-coverage
  * accounting — the operators a pre-training pipeline runs between raw
  * ingest and the dedup/sampling passes already covered by
  * [[TextOps]]/[[TextAnalysisOps]]. All deterministic (integer or
  * fixed-order IEEE arithmetic only) and DuckDB-oracled.
  */
object CurationOps {

  /** The phrase queried by [[phraseSearchPositional]]. Deliberately a
    * repeated token: "batch batch" in "batch batch batch" has TWO
    * overlapping occurrences (starts 0 and 1) — the positional-postings
    * join counts both, which no regexp/LIKE scan does. That overlap
    * semantics is the point of carrying positions in the index.
    */
  val PhraseTokens: Seq[String] = Seq("batch", "batch")

  private val tokens = split(col("text"), " ")

  /** V+: phrase search over POSITIONAL postings — the retrieval motion
    * [[TextOps.postingLists]] (doc-level postings) cannot express. Each
    * phrase term i contributes its postings normalized to the would-be
    * phrase START (`pos - i`); an n-way equi-join on (doc_id, start)
    * intersects them, so a doc survives exactly where every term sits at
    * its offset. Scale posture: the per-term filter happens ON the
    * exploded map side BEFORE any exchange, so only the queried terms'
    * postings (a vanishing fraction of a 100 TB corpus) ever shuffle; the
    * join keys are (doc_id, start) longs. Against a STAGED positional
    * postings table the same join touches |phrase| posting lists and
    * nothing else — the classic inverted-index phrase plan, here built
    * inline because the fixture corpus is the index source.
    */
  def phraseSearchPositional(spark: SparkSession, sfDir: String): DataFrame = {
    val post = Tables.documents(spark, sfDir)
      .select(col("doc_id"), posexplode(tokens).as(Seq("pos", "tok")))
    val parts = PhraseTokens.zipWithIndex.map { case (t, i) =>
      post.filter(col("tok") === lit(t))
        .select(col("doc_id"), (col("pos") - lit(i)).as("start"))
    }
    parts.reduce((a, b) => a.join(b, Seq("doc_id", "start")))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_hits"),
        min(col("start")).cast("long").as("first_pos"))
      .orderBy(col("doc_id"))
  }

  /** Gopher-rule thresholds, calibrated so each rule splits the synthetic
    * fixture non-trivially (quartiles measured in DuckDB: token count
    * p10≈21/median≈56; mean token length p25≈4.39/p75≈4.63; stopword
    * count p25≈2; top-token dominance p75≈0.111).
    */
  val MinTokens = 30L
  val WordLenLo = 4.4
  val WordLenHi = 4.7
  val MinStopwords = 2L
  val MaxDominance = 0.11

  /** V+: per-source Gopher-style quality-rule funnel — the four classic
    * pre-training drop rules (too short, mean word length out of band,
    * too few stopwords, one token dominating the doc) evaluated per
    * document and aggregated per source, plus the all-rules-pass count.
    * Every rule is a HIGHER-ORDER expression on the one row that holds
    * the doc (aggregate/filter/transform over the token array) — NO
    * shuffle except the per-source rollup, so at 100 TB this runs at
    * scan bandwidth like [[TextOps.docRepetition]]. The dominance rule is
    * O(V·n) per doc via the distinct-token count scan — V is the doc's
    * own vocabulary, bounded by n, and tiny on real text after the
    * length rule. All ratios are single double divisions of exact
    * integers, bit-identical across engines.
    */
  def gopherRulesSource(spark: SparkSession, sfDir: String): DataFrame =
    gopherPerDoc(Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("source")))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("r_short"), 1L).otherwise(0L)).as("n_short"),
        sum(when(col("r_wordlen"), 1L).otherwise(0L)).as("n_wordlen_out"),
        sum(when(col("r_stop"), 1L).otherwise(0L)).as("n_low_stop"),
        sum(when(col("r_dom"), 1L).otherwise(0L)).as("n_dominated"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"))
      .orderBy(col("source"))

  /** The per-document rule stage of [[gopherRulesSource]], over ANY frame
    * with (doc_id, text, source) — shared with the streaming admission
    * gate [[graft.streaming.StreamingEntry.streamQualityGate]], whose
    * micro-batches run this verdict map on arrivals. Entirely map-side:
    * every rule is a higher-order expression on the row's own token array.
    */
  private[graft] def gopherPerDoc(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("t"))
      .select(
        col("doc_id"),
        col("source"),
        size(col("t")).cast("long").as("n"),
        expr("aggregate(t, 0L, (a, x) -> a + length(x))").as("chars"),
        expr("size(filter(t, x -> x IN ('the', 'a')))").cast("long").as("stop"),
        expr("array_max(transform(array_distinct(t), x -> size(filter(t, y -> y = x))))")
          .cast("long").as("mx"))
      .select(
        col("doc_id"),
        col("source"),
        (col("n") < MinTokens).as("r_short"),
        (col("chars").cast("double") / col("n").cast("double") < WordLenLo ||
          col("chars").cast("double") / col("n").cast("double") > WordLenHi).as("r_wordlen"),
        (col("stop") < MinStopwords).as("r_stop"),
        (col("mx").cast("double") / col("n").cast("double") > MaxDominance).as("r_dom"))
      .withColumn("pass",
        !col("r_short") && !col("r_wordlen") && !col("r_stop") && !col("r_dom"))

  /** V+: duplicated-span TOKEN coverage — the removal-accounting side of
    * [[TextOps.dupSpanFraction]]: that operator counts duplicated 8-gram
    * STARTS; this one counts the distinct TOKEN POSITIONS those grams
    * cover, i.e. exactly how much of each doc a cross-doc span-removal
    * pass (the "dedup spans, not docs" motion) would delete. Same gram
    * definition (8-token shingles, duplicated = distinct-doc frequency
    * ≥ 2). Plan: one gram-hash aggregate for the df filter (8-byte
    * xxhash64 keys on the exchange, never gram text), hits re-join on the
    * hash, each hit expands to its 8 positions map-side, and a per-doc
    * distinct-position count closes it. Collisions only affect the df
    * side (two grams sharing a 64-bit hash merge their df) — negligible
    * at any real corpus size, same contract as
    * [[TextOps.docCommonness]]'s hashed token counts.
    */
  def dupTokenCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), tokens.as("t"))
      .filter(size(col("t")) >= 8)
    val grams = toks
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, size(t) - 8), i -> array_join(slice(t, i + 1, 8), ' '))"))
        .as(Seq("s", "gram")))
      .select(col("doc_id"), col("s"), xxhash64(col("gram")).as("g"))
    val dup = grams
      .groupBy(col("g"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2)
      .select(col("g"))
    val cov = grams.join(dup, "g")
      .select(col("doc_id"), explode(expr("sequence(s, s + 7)")).as("pos"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("pos")).as("n_covered"))
    toks.select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"))
      .join(cov, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tokens"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"),
        (coalesce(col("n_covered"), lit(0L)).cast("double") / col("n_tokens").cast("double"))
          .as("covered_fraction"))
      .orderBy(col("doc_id"))
  }

  /** Per-(epoch, doc) deterministic shuffle key + shard: the key is
    * md5(epoch ':' doc_id) — the engine-portable seeded hash the sampling
    * family already uses — and the shard is the key's FIRST hex digit
    * mod 8 (hex digits are uniform over 0..15, so 16→8 folds perfectly
    * evenly). Changing the epoch reshuffles everything; same epoch always
    * replays bit-identically — the reproducible-data-order contract.
    */
  private def epochShuffleKeys(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Seq(1L, 2L).toDF("epoch")
      .crossJoin(Tables.documents(spark, sfDir).select(col("doc_id")))
      .withColumn("h", md5(concat(col("epoch").cast("string"), lit(":"),
        col("doc_id").cast("string"))))
      .withColumn("shard", expr(
        "CAST((CASE WHEN ascii(substr(h, 1, 1)) < 58 THEN ascii(substr(h, 1, 1)) - 48 " +
          "ELSE ascii(substr(h, 1, 1)) - 87 END) % 8 AS BIGINT)"))
  }

  /** V+: EPOCH SHUFFLE MANIFEST — the reproducible data-order plan a
    * training run needs to RESUME mid-epoch: every document is assigned a
    * deterministic seeded shuffle key and a shard per epoch, and the
    * declared output is the head (first 25 positions) of each of the
    * 2 epochs × 8 shards — "what exactly does shard 5 read first in
    * epoch 2" answered identically on every run and every engine.
    *
    * Scale posture: no GLOBAL order anywhere — position is a window
    * PARTITIONED by (epoch, shard), so each window partition holds
    * corpus/n_shards rows and n_shards scales with the corpus (8 here,
    * 10⁴ in production); the rank≤25 filter pushes into WindowGroupLimit
    * so nothing beyond each shard's head is ever materialized or sorted
    * to one place. The shard assignment itself is embarrassingly
    * parallel map-side arithmetic on the md5.
    */
  def epochShuffleManifest(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("epoch"), col("shard"))
      .orderBy(col("h"), col("doc_id"))
    epochShuffleKeys(spark, sfDir)
      .withColumn("position", row_number().over(w).cast("long"))
      .filter(col("position") <= 25)
      .select(col("epoch"), col("shard"), col("position"), col("doc_id"))
      .orderBy(col("epoch"), col("shard"), col("position"))
  }

  /** V+: EPOCH SHARD BALANCE — the audit beside the manifest: per
    * (epoch, shard) document count plus its deviation from the ideal
    * corpus/8, proving the hex-digit fold distributes evenly enough to
    * keep worker loads balanced. Pure groupBy count — one exchange of
    * 16 rows.
    */
  def epochShardBalance(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = epochShuffleKeys(spark, sfDir)
      .groupBy(col("epoch"), col("shard"))
      .agg(count(lit(1)).as("n_docs"))
    val totals = counts.groupBy(col("epoch"))
      .agg(sum(col("n_docs")).as("n_total"))
    counts.join(broadcast(totals), Seq("epoch"))
      // deviation in per-mille of the ideal share, one exact division
      .withColumn("dev_permille", expr(
        "CAST(floor((CAST(n_docs AS DOUBLE) * 8.0 / n_total - 1.0) * 1000 + 0.5) AS BIGINT)"))
      .select(col("epoch"), col("shard"), col("n_docs"), col("dev_permille"))
      .orderBy(col("epoch"), col("shard"))
  }

  object Oracle {
    val phraseSearchPositional: String = {
      val parts = CurationOps.PhraseTokens.zipWithIndex.map { case (t, i) =>
        s"SELECT doc_id, pos - $i AS start FROM px WHERE tok = '$t'"
      }
      val joined = parts.zipWithIndex.map { case (p, i) => s"p$i AS ($p)" }.mkString(",\n")
      val from = parts.indices.map(i => s"p$i")
        .reduce((a, b) => s"$a JOIN $b USING (doc_id, start)")
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |px AS (SELECT doc_id, i - 1 AS pos, t[i] AS tok
         |  FROM tok, UNNEST(generate_series(1, len(t))) AS u(i)),
         |$joined
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
         |  CAST(min(start) AS BIGINT) AS first_pos
         |FROM $from
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin
    }

    val gopherRulesSource: String =
      s"""WITH t AS (SELECT source, string_split(text, ' ') AS t FROM documents),
         |m AS (SELECT source,
         |    len(t) AS n,
         |    list_sum(list_transform(t, x -> length(x))) AS chars,
         |    len(list_filter(t, x -> x IN ('the', 'a'))) AS stop,
         |    list_max(list_transform(list_distinct(t),
         |      x -> len(list_filter(t, y -> y = x)))) AS mx
         |  FROM t),
         |r AS (SELECT source,
         |    n < $MinTokens AS r_short,
         |    CAST(chars AS DOUBLE) / n < $WordLenLo
         |      OR CAST(chars AS DOUBLE) / n > $WordLenHi AS r_wordlen,
         |    stop < $MinStopwords AS r_stop,
         |    CAST(mx AS DOUBLE) / n > $MaxDominance AS r_dom
         |  FROM m)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN r_short THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
         |  CAST(sum(CASE WHEN r_wordlen THEN 1 ELSE 0 END) AS BIGINT) AS n_wordlen_out,
         |  CAST(sum(CASE WHEN r_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_low_stop,
         |  CAST(sum(CASE WHEN r_dom THEN 1 ELSE 0 END) AS BIGINT) AS n_dominated,
         |  CAST(sum(CASE WHEN NOT r_short AND NOT r_wordlen AND NOT r_stop AND NOT r_dom
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
         |FROM r
         |GROUP BY source
         |ORDER BY source""".stripMargin

    /** Per-doc rule verdicts on the streaming arrival slice (doc_id % 5 =
      * 4, first 2000 by id) — the gate is stateless, so the union of batch
      * outputs equals this batch SQL exactly.
      */
    val streamQualityGate: String =
      s"""WITH b AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
         |  WHERE doc_id % 5 = 4 ORDER BY doc_id LIMIT 2000),
         |m AS (SELECT doc_id, source,
         |    len(t) AS n,
         |    list_sum(list_transform(t, x -> length(x))) AS chars,
         |    len(list_filter(t, x -> x IN ('the', 'a'))) AS stop,
         |    list_max(list_transform(list_distinct(t),
         |      x -> len(list_filter(t, y -> y = x)))) AS mx
         |  FROM b),
         |r AS (SELECT doc_id, source,
         |    n < $MinTokens AS r_short,
         |    CAST(chars AS DOUBLE) / n < $WordLenLo
         |      OR CAST(chars AS DOUBLE) / n > $WordLenHi AS r_wordlen,
         |    stop < $MinStopwords AS r_stop,
         |    CAST(mx AS DOUBLE) / n > $MaxDominance AS r_dom
         |  FROM m)
         |SELECT doc_id, source, r_short, r_wordlen, r_stop, r_dom,
         |  NOT r_short AND NOT r_wordlen AND NOT r_stop AND NOT r_dom AS pass
         |FROM r
         |ORDER BY doc_id""".stripMargin

    val dupTokenCoverage: String =
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 8),
        |gr AS (SELECT doc_id, i - 1 AS s,
        |    array_to_string(t[i : i + 7], ' ') AS gram
        |  FROM tok, UNNEST(generate_series(1, len(t) - 7)) AS u(i)),
        |dup AS (SELECT gram FROM (
        |  SELECT gram, count(DISTINCT doc_id) AS df FROM gr GROUP BY gram) WHERE df >= 2),
        |cov AS (SELECT doc_id, count(DISTINCT s + o) AS n_covered
        |  FROM gr JOIN dup USING (gram), UNNEST(generate_series(0, 7)) AS v(o)
        |  GROUP BY doc_id)
        |SELECT tok.doc_id, CAST(len(tok.t) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(cov.n_covered, 0) AS BIGINT) AS n_covered,
        |  CAST(coalesce(cov.n_covered, 0) AS DOUBLE) / len(tok.t) AS covered_fraction
        |FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id
        |ORDER BY tok.doc_id""".stripMargin
  }
}
