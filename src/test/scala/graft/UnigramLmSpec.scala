package graft

import org.apache.spark.sql.functions._
import graft.expressions.UnigramSegment
import graft.operators.UnigramLm

class UnigramLmSpec extends SparkSpec {

  private val vocab: Seq[(String, Long)] = Seq(
    "ab" -> 10L, "abc" -> 25L, "c" -> 8L, "a" -> 15L, "b" -> 15L,
    "d" -> 30L)

  private def seg(w: String, vocab: Seq[(String, Long)] = vocab) = {
    import spark.implicits._
    Seq(w).toDF("w")
      .select(UnigramSegment.unigramSegF($"w", vocab).as("s"))
      .select("s.seg", "s.cost", "s.n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).head
  }

  test("Viterbi picks the globally cheapest cover") {
    // "abc": covers ab+c=18, abc=25, a+b+c=38, ... → ab c
    assert(seg("abc") == (("ab c", 18L, 2L)))
    // "abd": ab+d=40 vs a+b+d=60 → ab d
    assert(seg("abd") == (("ab d", 40L, 2L)))
  }

  test("cost ties break on fewer pieces, then lexicographic seg") {
    // vocab where "xy"=20 and x=10,y=10: cost tie (20) → fewer pieces wins
    val v = Seq("x" -> 10L, "y" -> 10L, "xy" -> 20L)
    assert(seg("xy", v) == (("xy", 20L, 1L)))
    // pure lexicographic tie: "aa" with a=5, aa=10 → tie (10), n: 1 < 2
    val v2 = Seq("a" -> 5L, "aa" -> 10L)
    assert(seg("aa", v2) == (("aa", 10L, 1L)))
  }

  test("unknown characters segment via the fallback cost") {
    val (s, c, n) = seg("azb")
    assert(s == "a z b", s)
    assert(c == 15L + UnigramLm.FallbackCost + 15L && n == 3L)
  }

  test("empty word segments to empty") {
    assert(seg("") == (("", 0L, 0L)))
  }

  test("pieceVocab counts substrings per occurrence with ln-micro costs") {
    import spark.implicits._
    val d = Seq("aa aa").toDF("text")
    val v = UnigramLm.pieceVocab(d, "text", maxLen = 2, topN = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // each "aa" token: pieces a(pos1), a(pos2), aa → a:4, aa:2, total 6
    assert(v("a")._1 == 4L && v("aa")._1 == 2L)
    assert(v("a")._2 == math.round(math.log(6.0 / 4.0) * 1e6))
    assert(v("aa")._2 == math.round(math.log(6.0 / 2.0) * 1e6))
  }

  test("segmentTopWords is deterministic and partitioning-independent") {
    import spark.implicits._
    val d = Seq((0L, "spark sparkly spar spark"), (1L, "spark spar lysp"))
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      UnigramLm.segmentTopWords(df, "text", topN = 50, topWords = 10)
        .collect().map(_.toString).sorted.toSeq
    val a = run(d.repartition(5))
    val b = run(d.coalesce(1))
    assert(a == b && a.nonEmpty)
  }

  test("segmentation kernel plans no shuffle beyond the word count") {
    import spark.implicits._
    val d = Seq((0L, "a b a")).toDF("doc_id", "text")
    val words = d.select(explode(split($"text", " ")).as("word"))
    val plan = words
      .withColumn("s", UnigramSegment.unigramSegF($"word", vocab))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
