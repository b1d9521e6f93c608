package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Text-analysis and deduplication operators over `documents` (SURVEY.md
  * §2.2 group V — the LLM-data-pipeline surface).
  *
  * Scale posture: everything here is explode → hash-shuffle → aggregate.
  * Near-dup detection is LSH-banded (docs meet only inside a (band, sig)
  * bucket) — never an all-pairs compare. At 100 TB the band-bucket join is
  * the standard MinHash-LSH plan: candidates ≈ true near-dups, not N².
  */
object TextOps {

  /** Whitespace tokens as an array column. */
  private val tokens = split(col("text"), " ")

  /** V: top-20 tokens in English docs (explode → count → top-k). */
  def textTokens(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .filter(col("lang") === "en")
      .select(explode(tokens).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(20)
  }

  /** V: per-language doc count / avg chars / avg tokens. */
  def textStatsLang(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 6).as("avg_chars"),
        round(avg(size(tokens).cast("double")), 6).as("avg_tokens"))
      .orderBy(col("lang"))
  }

  /** V: exact dedup — group by text, min-doc_id survivor. Single hash
    * shuffle on the text key (at 100 TB: pre-hash the text to a 128-bit
    * fingerprint and shuffle on that instead of the full payload).
    */
  def dedupDocsExact(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val groups = docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("survivor"), count(lit(1)).as("n"))
    val dist = groups.agg(
      count(lit(1)).as("n_distinct"),
      sum(col("survivor")).as("survivor_id_sum"),
      sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_dup_groups"))
    val total = docs.agg(count(lit(1)).as("n_total"))
    total.crossJoin(dist)
  }

  /** V: near-dup candidate pairs via deterministic MinHash-LSH.
    *
    *  - shingles: 3-token shingles per doc (kept as a multiset — min over a
    *    multiset equals min over its set, so no dedup shuffle is needed);
    *  - 8 hash functions from ONE md5 per shingle: the four 8-hex-char
    *    windows of md5(s), plus the character-reversed form of each window.
    *    Reversing the hex is a bijection on 32-bit values, so each reversed
    *    window induces a fresh uniform ordering of shingle space — the
    *    minhash collision property P(min_A = min_B) = J holds per ordering —
    *    at half the hash cost of a second salted md5. md5 (not murmur
    *    `hash()`) because it is bit-identical across engines; the 8 minima
    *    are computed in a single groupBy(doc_id) pass with no row explosion;
    *  - minhash_i(doc) = lexicographic min of window i over shingles;
    *  - 4 bands × r=2 rows: band sig = minhash_{2b} ++ minhash_{2b+1};
    *  - candidates = distinct doc pairs sharing ≥1 band sig (doc1 < doc2).
    *
    * P(candidate) = 1-(1-J²)⁴ for Jaccard J: exact dups always collide,
    * random pairs essentially never. md5 here is a portability choice for
    * the oracle; swap in xxhash64 for production throughput.
    */
  def dedupDocsMinhash(spark: SparkSession, sfDir: String): DataFrame = {
    // No distinct on shingles: min-over-multiset == min-over-set, so the
    // signature is identical and we save a full shuffle of the exploded rows.
    val shingles = Tables.documents(spark, sfDir)
      .select(col("doc_id"), tokens.as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t) - 3), i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))")).as("sh"))
    // One row per doc — persisted because the banded self-join below would
    // otherwise execute the whole shingle+md5 pipeline once per join side
    // (Spark 4.1 does not ReuseExchange across these self-join branches;
    // verified in the executed plan). At 100 TB the same move is writing
    // the signature table before the banded join.
    val mins = shingles
      .withColumn("m1", md5(col("sh")))
      .groupBy(col("doc_id"))
      .agg(
        min(substring(col("m1"), 1, 8)).as("s0"), min(substring(col("m1"), 9, 8)).as("s1"),
        min(substring(col("m1"), 17, 8)).as("s2"), min(substring(col("m1"), 25, 8)).as("s3"),
        min(reverse(substring(col("m1"), 1, 8))).as("s4"), min(reverse(substring(col("m1"), 9, 8))).as("s5"),
        min(reverse(substring(col("m1"), 17, 8))).as("s6"), min(reverse(substring(col("m1"), 25, 8))).as("s7"))
      .persist()
    // Eager: both self-join sides start concurrently, and a lazily-persisted
    // plan is computed by BOTH before either populates the cache.
    mins.count()
    val sigs = mins.selectExpr(
      "doc_id",
      """stack(4,
        |  0, concat(s0, s1),
        |  1, concat(s2, s3),
        |  2, concat(s4, s5),
        |  3, concat(s6, s7)) AS (band, sig)""".stripMargin)
    val a = sigs.as("a")
    val b = sigs.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .distinct()
      .orderBy(col("doc1"), col("doc2"))
  }

  /** V+: exact 3-gram Jaccard similarity for the MinHash-LSH candidate
    * pairs — the verify stage of LSH dedup: candidates come from the
    * banded join (never all pairs), then the exact set overlap is computed
    * only for those. |A∩B| via a shingle equi-join restricted to candidate
    * pairs; |A∪B| = |A|+|B|-|A∩B|. Candidates whose band collision was a
    * hash accident get jaccard 0 (left join).
    */
  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Candidate pairs are the small output of the banded join — persist so
    // the minhash subplan runs once, not once per downstream reference.
    val cand = dedupDocsMinhash(spark, sfDir).persist()
    val nPairs = cand.count()
    // Only docs that appear in some candidate pair need exact shingles:
    // broadcast-semi-join the doc scan down to that set before exploding.
    // At 100 TB this is the difference between re-shingling the corpus and
    // re-shingling only the near-dup cluster members. Like
    // [[componentLabels]], the id set is bounded derived state: under the
    // threshold it is collected into a local relation (one cheap broadcast
    // instead of planning a distributed union+distinct subquery per use);
    // above it, the distributed form takes over unchanged.
    val candIds =
      if (nPairs <= 1000000L)
        cand.select(col("doc1")).union(cand.select(col("doc2")))
          .distinct().as[Long].collect().toSeq.toDF("doc_id")
      else
        cand.select(col("doc1").as("doc_id"))
          .union(cand.select(col("doc2").as("doc_id")))
          .distinct()
    val sh = Tables.documents(spark, sfDir)
      .join(broadcast(candIds), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), tokens.as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t) - 3), i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))")).as("sh"))
      .distinct()
      // Persisted for the same reason as the signature table in
      // dedupDocsMinhash: sh feeds both sides of the intersection self-join
      // plus the per-doc counts, and Spark would recompute it three times.
      .persist()
    sh.count()
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = cand
      .join(sh.as("sa"), col("doc1") === col("sa.doc_id"))
      .join(sh.as("sb"), col("doc2") === col("sb.doc_id") && col("sa.sh") === col("sb.sh"))
      .groupBy(col("doc1"), col("doc2"))
      .agg(count(lit(1)).as("n_inter"))
    cand
      .join(inter, Seq("doc1", "doc2"), "left")
      .join(counts.withColumnRenamed("doc_id", "doc1").withColumnRenamed("n_sh", "n1"), Seq("doc1"))
      .join(counts.withColumnRenamed("doc_id", "doc2").withColumnRenamed("n_sh", "n2"), Seq("doc2"))
      .select(
        col("doc1"), col("doc2"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"),
        round(coalesce(col("n_inter"), lit(0L)).cast("double") /
          (col("n1") + col("n2") - coalesce(col("n_inter"), lit(0L))).cast("double"), 6).as("jaccard"))
      .orderBy(col("doc1"), col("doc2"))
  }

  /** V+: dedup CLUSTERS — connected components over the MinHash candidate
    * pairs, the step that turns pairwise candidates into dedup groups.
    * Iterative min-label propagation: each round every node adopts the
    * smallest label among itself and its neighbors; converges in
    * O(cluster diameter) rounds (near-dup clusters are tiny, so a handful).
    * This is the standard Spark CC pattern — a driver loop of joins, each
    * round one shuffle, state persisted and the previous round unpersisted;
    * at 100 TB the same loop runs with the edge table on disk and
    * convergence checked by an aggregate, exactly as here. Output:
    * (cluster_rep = min doc_id, n_docs), clusters of size ≥ 2 only.
    */
  def dedupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = dedupDocsMinhash(spark, sfDir).select(col("doc1"), col("doc2"))
    componentLabels(spark, pairs)
      .groupBy(col("lbl").as("cluster_rep"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("cluster_rep"))
  }

  /** Connected-component labels (id → min id of its component) for an edge
    * list. Two paths, chosen by edge count — the same small/large split as
    * the coreset pattern:
    *
    *  - **small** (edges fit on the driver): collect the PAIR LIST — bounded
    *    derived state, like a coreset; never raw docs — and run union-find
    *    with path compression. One job, O(E α(E)).
    *  - **large** (100 TB path, `smallLimit` exceeded): distributed
    *    min-label propagation, one shuffle round per cluster diameter.
    *    Labels only ever decrease, so sum(lbl) is a one-aggregate
    *    convergence test (no extra change-count join).
    */
  private[operators] def componentLabels(
      spark: SparkSession,
      pairDf: DataFrame,
      smallLimit: Long = 1000000L): DataFrame = {
    import spark.implicits._
    val pairs = pairDf.persist()
    val nEdges = pairs.count()
    if (nEdges <= smallLimit) {
      val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => (id, find(id))).toSeq.toDF("id", "lbl")
    } else {
      val sym = pairs.union(pairs.select(col("doc2").as("doc1"), col("doc1").as("doc2")))
      var labels = sym.select(col("doc1").as("id")).distinct()
        .withColumn("lbl", col("id")).persist()
      var lblSum = labels.agg(sum(col("lbl"))).collect()(0).getLong(0)
      var converged = false
      var iter = 0
      while (!converged && iter < 50) {
        val nbrMin = sym.join(labels, sym("doc2") === labels("id"))
          .groupBy(col("doc1")).agg(min(col("lbl")).as("nlbl"))
        val next = labels.join(nbrMin, labels("id") === nbrMin("doc1"), "left")
          .select(col("id"), least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
          .persist()
        val nextSum = next.agg(sum(col("lbl"))).collect()(0).getLong(0)
        converged = nextSum == lblSum
        lblSum = nextSum
        labels.unpersist()
        labels = next
        iter += 1
      }
      labels
    }
  }

  /** V+: token counting, whitespace vs a BPE-ish regex tokenizer
    * (letter runs / digit runs / single non-alphanumeric — the GPT-2-style
    * pre-tokenization classes, simplified to a regex dialect both engines
    * share). Integer outputs → exact cross-engine.
    */
  def tokenCountRegex(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(tokens)).cast("long").as("ws_tokens"),
        sum(size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")))
          .cast("long").as("re_tokens"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy(col("lang"))
  }
}
