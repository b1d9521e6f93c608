package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Randomized cross-check for the two-phase distributed skyline: the
  * engine's window formulation vs an O(n²) brute-force dominance test, on
  * seeded random part tables with planted (price, size) duplicates —
  * exactly the inputs where the dedup-then-strict-> subtleties live.
  */
class SkylineSpec extends AnyFunSuite with SparkTestBase {

  private def bruteForce(rows: Seq[(Long, Double, Int)]): Seq[(Long, Double, Long)] = {
    // collapse exact (price, size) duplicates to min key, then dominance
    val d = rows.groupBy(r => (r._2, r._3)).map { case ((p, s), g) =>
      (g.map(_._1).min, p, s)
    }.toSeq
    d.filter { p =>
      !d.exists(q => q._2 <= p._2 && q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3))
    }.map(r => (r._1, r._2, r._3.toLong)).sortBy(r => (r._2, r._1))
  }

  test("skyline == brute-force dominance on seeded random tables (duplicates included)") {
    import spark.implicits._
    (1 to 3).foreach { seed =>
      val rng = new scala.util.Random(seed)
      val rows = (0 until 200).map { i =>
        // coarse grids force ties and duplicates in both dimensions
        val price = 100.0 + rng.nextInt(40)
        val size = 1 + rng.nextInt(30)
        (i.toLong, price, size)
      }
      val dir = s"/tmp/graft_skyline_$seed"
      rows.map { case (k, p, s) =>
        (k, s"part$k", s"Brand#${k % 5}", "t", s, p)
      }.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
        .write.mode("overwrite").parquet(s"$dir/part.parquet")
      val got = Relational.skylineParts(spark, dir).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
      assert(got == bruteForce(rows), s"seed=$seed")
    }
  }
}
