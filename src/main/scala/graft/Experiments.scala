package graft

import org.apache.spark.sql.SparkSession
import graft.diversity._
import graft.operators.DiversityOps

/** Experiment runner in the reference's style (operator R9): sweep k over
  * the embedding fixture, run GMM / local-search / matching over the
  * distributed coreset, and report objective values + timings — the
  * approximation-quality story the reference's paper tables tell.
  * Usage: runMain graft.Experiments [sfDir]
  */
object Experiments {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "4") + "]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (coreset, tCoreset) = timed(DiversityOps.coreset(spark, sfDir))
    val pts = coreset.map(w => Pt(w.id, w.vec))
    println(f"coreset: p=${DiversityOps.coresetParallelism(spark)} k'=${DiversityOps.KPrime} " +
      f"size=${coreset.size} mass=${coreset.map(_.weight).sum} build=${tCoreset}%.2fs")
    println(f"${"k"}%4s ${"algo"}%-12s ${"remote_edge"}%12s ${"remote_clique"}%14s ${"time_s"}%8s")
    for (k <- Seq(8, 32, 128)) {
      val (gmmSel, tG) = timed(Gmm.select(pts, k))
      val (lsSel, tL) = timed(Heuristics.localSearch(pts, k))
      val (mSel, tM) = timed(Heuristics.matching(pts, k))
      for ((name, sel, t) <- Seq(("gmm", gmmSel, tG), ("local-search", lsSel, tL), ("matching", mSel, tM))) {
        println(f"$k%4d $name%-12s ${Diversity.remoteEdge(sel)}%12.4f " +
          f"${Diversity.remoteClique(sel)}%14.2f $t%8.3f")
      }
    }

    // A/B for the remoteCliqueDiv driver-cost bound: heuristics over the
    // FULL p-scaled union coreset (grows with cluster size) vs over the
    // fixed HeuristicBudget re-coreset (O(1) in cluster size). Shows the
    // wall-clock delta AND that the remote-clique quality is preserved.
    val (bounded, tBound) = timed(
      if (pts.size <= DiversityOps.HeuristicBudget) pts
      else Gmm.select(pts, DiversityOps.HeuristicBudget))
    println(f"%nheuristic pool A/B at k=32 (union=${pts.size}, budget=${bounded.size}, re-coreset ${tBound}%.3fs):")
    for ((name, heuristic) <- Seq[(String, Seq[Pt] => IndexedSeq[Pt])](
        ("local-search", Heuristics.localSearch(_, 32)),
        ("matching", Heuristics.matching(_, 32)))) {
      val (fSel, tF) = timed(heuristic(pts))
      val (bSel, tB) = timed(heuristic(bounded))
      println(f"  $name%-12s full=${tF}%7.3fs clique=${Diversity.remoteClique(fSel)}%10.2f | " +
        f"bounded=${tB}%7.3fs clique=${Diversity.remoteClique(bSel)}%10.2f")
    }
    // ANN quality: recall@5 of the two IVF variants against the exact
    // cosine top-k at this SF — the approximation-vs-speed trade the scale
    // path rests on (EXPERIMENTS.md "ANN recall").
    val exact = graft.operators.VectorOps.cosTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    for ((name, df) <- Seq(
        "ivf_sign_lsh" -> graft.operators.VectorOps.cosTopkIvf(spark, sfDir),
        "ivf_kmeans" -> graft.operators.VectorOps.cosTopkIvfKmeans(spark, sfDir))) {
      val rows = df.collect()
      // fail loudly on an empty variant: NaN recall over 0 results could be
      // transcribed into EXPERIMENTS.md as a silent non-measurement
      require(rows.nonEmpty, s"ann $name returned 0 rows — recall undefined")
      val hits = rows.count(r => exact.contains((r.getLong(0), r.getLong(2))))
      println(f"ann $name%-12s recall@5=${hits.toDouble / rows.length}%.3f over ${rows.length} results")
    }
    spark.stop()
  }
}
