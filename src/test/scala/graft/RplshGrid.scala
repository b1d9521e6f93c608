package graft

import org.apache.spark.sql.functions._

/** One-off grid measurement for the RP-LSH (L, B, probes) recall curve —
  * run via `Test/runMain graft.RplshGrid`; results recorded in
  * EXPERIMENTS.md (r12).
  */
object RplshGrid {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.session
    val sf = sys.env.getOrElse("GRID_SF", "/root/testdata/sf0.001")
    val exact = graft.operators.VectorOps.cosTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    
    for {
      (l, b, mp, pb) <- Seq((8, 5, 0, 0), (6, 9, 9, 7), (6, 11, 11, 7))
      pass <- 1 to 2
    } {
      val t0 = System.nanoTime()
      val rows = graft.operators.VectorOps.cosTopkRplshTuned(spark, sf, l, b, mp, pb).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      val hits = rows.count(r => exact.contains((r.getLong(0), r.getLong(2))))
      // candidate volume proxy: rescored distinct pairs before rank cut
      println(f"GRID L=$l%2d B=$b%2d mp=$mp%2d pb=$pb%2d recall=${hits.toDouble / math.max(1, rows.length)}%.3f rows=${rows.length}%4d t=$dt%.2f")
    }
    spark.stop()
  }
}
