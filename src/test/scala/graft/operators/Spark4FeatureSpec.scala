package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Pins Spark 4.1 semi-structured + recursion feature semantics the
  * declared queries rely on (variant_props, recursive_month_spine). */
class Spark4FeatureSpec extends AnyFunSuite with SparkTestBase {
  test("variant: parse_json + variant_get") {
    val r = spark.sql(
      "SELECT variant_get(parse_json('{\"k\": 42}'), '$.k', 'bigint') AS k").collect()
    assert(r(0).getLong(0) == 42L)
  }
  test("recursive CTE: UNION-distinct is NOT yet supported (cyclic closure needs UNION ALL + acyclic data)") {
    // Pins the Spark 4.1 limitation that shapes which queries recursion can
    // carry: transitive closure over a cyclic graph needs distinct-union
    // fixpoint semantics, so connected components stay on the union-find /
    // label-propagation path (TextOps.dedupClusters); recursion is used
    // where the iteration is acyclic (recursive_month_spine).
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """WITH RECURSIVE reach AS (
          |  SELECT 1 AS a UNION SELECT a + 1 AS a FROM reach WHERE a < 3)
          |SELECT count(*) FROM reach""".stripMargin).collect()
    }
    assert(e.getCondition == "UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE", e.toString)
  }
  test("recursive CTE") {
    val r = spark.sql(
      """WITH RECURSIVE t AS (
        |  SELECT 1 AS n UNION ALL SELECT n + 1 FROM t WHERE n < 10)
        |SELECT sum(n) FROM t""".stripMargin).collect()
    assert(r(0).getLong(0) == 55L)
  }
}
