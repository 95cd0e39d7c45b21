package graft

import org.apache.spark.sql.functions._
import graft.operators.Bm25

class Bm25Spec extends SparkSpec {

  test("search matches a driver-side BM25 reference on a hand corpus") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry"),
      (4L, "durian durian"))
    val terms = Seq("apple", "cherry")
    val got = Bm25.search(corpus.toDF("doc_id", "text").repartition(3),
        "doc_id", "text", terms, 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // independent reference computation (same formula, driver-side)
    val docs = corpus.map { case (id, t) => id -> t.split(" ").toSeq }
    val n = docs.size.toDouble
    val avgdl = docs.map(_._2.size).sum.toDouble / n
    val want = docs.flatMap { case (id, toks) =>
      val us = terms.flatMap { term =>
        val tf = toks.count(_ == term).toDouble
        if (tf == 0) None
        else {
          val df = docs.count(_._2.contains(term)).toDouble
          val idf = BigDecimal(math.log((n - df + 0.5) / (df + 0.5) + 1.0))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          val s = idf * tf * 2.2 /
            (tf + 1.2 * (1.0 - 0.75 + 0.75 * toks.size / avgdl))
          Some(math.round(s * 1000000))
        }
      }
      if (us.isEmpty) None
      else Some(id -> BigDecimal(us.sum.toDouble / 1000000.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    assert(got == want, s"got $got want $want")
    // rarer term outranks the common one at equal tf share
    assert(got(1L) > got(3L), "2x apple (df=1) must beat 3x cherry (df=2)")
    assert(!got.contains(4L), "doc without query terms must not appear")
  }

  test("rerank: higher coverage promotes a lower-retrieval-score candidate") {
    import spark.implicits._
    import graft.operators.Rerank
    val docs = Seq(
      (1L, "apple apple apple apple"),      // high tf on one term → top BM25
      (2L, "apple cherry banana pie here"), // covers 3/4 rerank terms
      (3L, "durian only content")).toDF("doc_id", "text")
    val cands = Bm25.search(docs, "doc_id", "text", Seq("apple", "cherry"), 3)
    val got = Rerank.rerank(cands, docs, "doc_id", "text",
        Seq("apple", "cherry", "banana", "pie"), 3)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.head._1 == 2L, s"doc 2 covers 4/4 rerank terms: ${got.toList}")
    assert(got.head._2 == 1.0)
    assert(got.map(_._1).toList == List(2L, 1L), // doc 3 never retrieved
      s"got ${got.toList}")
  }

  test("phraseHits: consecutive tokens only, counted per doc, multi-term alignment") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox the quick brown"), // 2 hits of "quick brown"
      (2L, "quick and brown"),                     // non-adjacent → no hit
      (3L, "brown quick"),                         // wrong order → no hit
      (4L, "Quick Brown")                          // case-folded → 1 hit
    ).toDF("doc_id", "text")
    val got = Bm25.phraseHits(docs, "doc_id", "text", Seq("quick", "brown"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 4L -> 1L), s"got $got")
    // 3-term phrase needs all three aligned
    val tri = Bm25.phraseHits(docs, "doc_id", "text",
        Seq("quick", "brown", "fox"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri == Map(1L -> 1L), s"got $tri")
  }

  test("rrfFuse: fixed-order rational sum over integer ranks; one-sided docs count once") {
    import spark.implicits._
    val a = Seq((10L, 1), (20L, 2)).toDF("id", "rank")
    val b = Seq((20L, 1), (30L, 2)).toDF("id", "rank")
    val got = Bm25.rrfFuse(a, b, "id", "rank")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(10L) == r6(1.0 / 61))
    assert(got(20L) == r6(1.0 / 62 + 1.0 / 61))
    assert(got(30L) == r6(1.0 / 62))
  }

  test("minMaxNorm maps extremes to 0/1 and a constant list to all-1") {
    import spark.implicits._
    val got = Bm25.minMaxNorm(
        Seq((1L, 2.0), (2L, 4.0), (3L, 3.0)).toDF("id", "score"), "score", "ns")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got == Map(1L -> 0.0, 2L -> 1.0, 3L -> 0.5), s"got $got")
    val const = Bm25.minMaxNorm(
        Seq((1L, 7.0), (2L, 7.0)).toDF("id", "score"), "score", "ns")
      .collect().map(_.getDouble(2)).toSet
    assert(const == Set(1.0), "degenerate list normalizes to 1.0")
  }

  test("blendScores is a convex combination with 0 for list-misses") {
    import spark.implicits._
    val a = Seq((1L, 1.0), (2L, 0.5)).toDF("id", "ns")
    val b = Seq((2L, 1.0), (3L, 0.8)).toDF("id", "ns")
    val got = Bm25.blendScores(a, b, "id", "ns", 0.25)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 0.25, 2L -> 0.875, 3L -> 0.6), s"got $got")
  }

  test("prfSearch expands deterministically and can only widen recall") {
    import spark.implicits._
    // seed 'apple' hits docs 1,2; their dominant co-term is 'banana',
    // which pulls doc 3 (banana-only) into the second pass
    val corpus = Seq(
      (1L, "apple banana banana"),
      (2L, "apple banana cherry"),
      (3L, "banana banana durian"),
      (4L, "cherry cherry"))
      .toDF("doc_id", "text")
    val seed = Seq("apple")
    val exp = Bm25.prfExpansionTerms(corpus, "doc_id", "text", seed,
      kDocs = 2, nTerms = 1)
    assert(exp == Seq("banana"), s"got $exp")
    val ids = Bm25.prfSearch(corpus, "doc_id", "text", seed, k = 4,
        kDocs = 2, nTerms = 1)
      .collect().map(_.getLong(0)).toSet
    assert(ids.contains(3L), "expansion must recall the banana-only doc")
    assert(!ids.contains(4L), "unrelated doc stays out")
    // repartitioning must not change the expansion
    val exp2 = Bm25.prfExpansionTerms(corpus.repartition(5), "doc_id",
      "text", seed, kDocs = 2, nTerms = 1)
    assert(exp2 == exp)
  }
}
