package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The binding check for the rows-only `bpe_train_merges`: the engine's 8
  * distributed merge rounds must equal an INDEPENDENT sequential BPE
  * implemented here from scratch (different structure: in-memory maps and
  * list recursion vs DataFrame aggregates and a fold expression), run on
  * the identical (word, count) vocabulary.
  */
class BpeSpec extends AnyFunSuite with SparkTestBase {

  /** Sequential reference: greedy leftmost merge, most-frequent pair per
    * round, ties to the lexicographically first pair.
    */
  private def sequentialBpe(vocab: Map[String, Long], rounds: Int): Seq[(String, String, Long)] = {
    def mergeWord(syms: List[String], a: String, b: String): List[String] = syms match {
      case x :: y :: rest if x == a && y == b => (a + b) :: mergeWord(rest, a, b)
      case x :: rest => x :: mergeWord(rest, a, b)
      case Nil => Nil
    }
    var seqs: Map[List[String], Long] =
      vocab.toSeq.groupMapReduce(_._1.map(_.toString).toList)(_._2)(_ + _)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    (1 to rounds).foreach { _ =>
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (syms, cnt) =>
        syms.zip(syms.tail).foreach { p =>
          counts.update(p, counts.getOrElse(p, 0L) + cnt)
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, a + " " + b) }
        out += ((s"$a $b", a + b, n))
        seqs = seqs.toSeq.groupMapReduce(kv => mergeWord(kv._1, a, b))(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  test("bpe_train_merges == independent sequential BPE on the same vocabulary") {
    val engine = TextOps.bpeTrainMerges(spark, sf0001).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val vocab = graft.sources.Tables.documents(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("lang") === "en")
      .selectExpr("explode(split(text, ' ')) AS w")
      .where("w rlike '^[a-z0-9]+$' AND length(w) >= 2")
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val reference = sequentialBpe(vocab, 8)
    assert(engine == reference, s"\nengine:    $engine\nreference: $reference")
  }

  test("bpe_encode_docs == independent sequential encoder on the same corpus") {
    import org.apache.spark.sql.functions.col
    def mergeWord(syms: List[String], a: String, b: String): List[String] = syms match {
      case x :: y :: rest if x == a && y == b => (a + b) :: mergeWord(rest, a, b)
      case x :: rest => x :: mergeWord(rest, a, b)
      case Nil => Nil
    }
    val merges = TextOps.bpeTrainMerges(spark, sf0001).collect()
      .map(r => (r.getString(1).split(" ", 2)(0), r.getString(1).split(" ", 2)(1))).toSeq
    // sequential per-doc encoding over ALL langs (training is en-only, the
    // tokenizer applies corpus-wide — same as the engine query)
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getString(1), r.getString(2)))
    val perLang = docs.groupBy(_._1).map { case (lang, ds) =>
      var subwords = 0L
      ds.foreach { case (_, text) =>
        text.split(" ").filter(w => w.matches("^[a-z0-9]+$") && w.length >= 2).foreach { w =>
          var syms = w.map(_.toString).toList
          merges.foreach { case (a, b) => syms = mergeWord(syms, a, b) }
          subwords += syms.length
        }
      }
      lang -> (ds.length.toLong, subwords)
    }
    val engine = TextOps.bpeEncodeDocs(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    perLang.foreach { case (lang, (nDocs, subwords)) =>
      assert(engine(lang) == ((nDocs, subwords)), s"lang=$lang")
    }
  }

  test("sequential reference handles overlapping repeats greedily (aaa -> [aa, a])") {
    // pins the left-to-right greedy semantics both implementations share
    val m = sequentialBpe(Map("aaa" -> 1L), 1)
    assert(m == Seq(("a a", "aa", 2L)))
    val m2 = sequentialBpe(Map("aaaa" -> 1L), 2)
    // round 1 merges (a,a): aaaa -> [aa, aa]; round 2 merges (aa,aa)
    assert(m2 == Seq(("a a", "aa", 3L), ("aa aa", "aaaa", 1L)))
  }
}
