package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.expressions.{AcAutomaton, AhoCorasickExpression}

class AhoCorasickSpec extends SparkSpec {

  /** All-occurrence (overlapping) count by brute force. */
  private def naive(text: String, phrase: String): Long =
    (0 to text.length - phrase.length)
      .count(i => text.regionMatches(i, phrase, 0, phrase.length)).toLong

  private def acCounts(text: String, phrases: Seq[String]): Seq[Long] = {
    val ac = new AcAutomaton(
      phrases.map(_.getBytes("UTF-8")).toArray)
    val counts = new Array[Long](phrases.size)
    ac.countInto(text.getBytes("UTF-8"), counts)
    counts.toSeq
  }

  test("counts every occurrence, overlapping included") {
    val phrases = Seq("aa", "aaa", "ab", "b")
    // "aaaab": aa at 0,1,2 (overlapping); aaa at 0,1; ab at 3; b at 4
    assert(acCounts("aaaab", phrases) == Seq(3L, 2L, 1L, 1L))
  }

  test("phrases sharing prefixes and suffixes all report") {
    val phrases = Seq("he", "she", "his", "hers")
    // textbook AC fixture: "ushers" contains she, he, hers
    assert(acCounts("ushers", phrases) == Seq(1L, 1L, 0L, 1L))
  }

  test("empty text, phrase at boundaries, phrase == text") {
    val phrases = Seq("xy", "z")
    assert(acCounts("", phrases) == Seq(0L, 0L))
    assert(acCounts("xy", phrases) == Seq(1L, 0L))
    assert(acCounts("xyzzyxy", phrases) == Seq(2L, 2L))
  }

  test("multi-byte UTF-8 phrases match at character boundaries only") {
    val phrases = Seq("café", "été", "té")
    val text = "café été café"
    assert(acCounts(text, phrases) == Seq(2L, 1L, 1L))
  }

  test("prop: automaton counts equal brute-force counts on random text") {
    val alpha = Gen.oneOf('a', 'b', 'c')
    val textGen = for {
      n <- Gen.choose(0, 400)
      cs <- Gen.listOfN(n, alpha)
    } yield cs.mkString
    val phraseGen = for {
      n <- Gen.choose(1, 4)
      cs <- Gen.listOfN(n, alpha)
    } yield cs.mkString
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    (1 to 20).foreach { seed =>
      val text = sample(textGen, seed)
      val phrases = (1 to 6).map(i => sample(phraseGen, seed * 131 + i))
        .distinct
      val got = acCounts(text, phrases)
      val want = phrases.map(naive(text, _))
      assert(got == want, s"seed=$seed text='$text' phrases=$phrases")
    }
  }

  test("expression evaluates over a DataFrame and nulls stay null") {
    import spark.implicits._
    val df = Seq((1L, "fast table fast table"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = df.select($"id",
        AhoCorasickExpression.multiPhraseCounts($"text",
          Seq("fast table", "table fast")).as("c"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(out(1L).get.asInstanceOf[scala.collection.Seq[Long]] == Seq(2L, 1L))
    assert(out(2L).isEmpty)
  }

  test("automaton size is total phrase bytes + 1 for disjoint phrases") {
    val ac = new AcAutomaton(Array("abc", "def").map(_.getBytes("UTF-8")))
    assert(ac.size == 7)
  }

  test("duplicate or empty phrases are rejected") {
    intercept[IllegalArgumentException] {
      new AcAutomaton(Array("a", "a").map(_.getBytes("UTF-8")))
    }
    intercept[IllegalArgumentException] {
      graft.expressions.MultiPhraseCounts(
        org.apache.spark.sql.GraftShim.expression(lit("x")), Seq("a", ""))
    }
  }
}
