package graft

import org.apache.spark.sql.functions._
import graft.operators.TrigramLm

class TrigramLmSpec extends SparkSpec {

  private def docs(texts: (Long, String)*) = {
    import spark.implicits._
    texts.toDF("doc_id", "text")
  }

  test("native trigram kernel is bit-identical to the HOF spec on fixture + edge docs") {
    val fixture = spark.read.parquet(s"$sf0001/documents.parquet")
    val mism = fixture
      .select(TrigramLm.trigrams(col("text")).as("fast"),
        TrigramLm.trigramsHof(col("text")).as("hof"))
      .filter(col("fast") =!= col("hof")).count()
    assert(mism == 0)
    val edge = docs((0L, "  Hello, WORLD!!  "), (1L, "ab"), (2L, ""),
      (3L, "a.b,c"), (4L, "ONE  two\tthree"), (5L, "12x34"))
    val edgeMism = edge
      .select(TrigramLm.trigrams(col("text")).as("fast"),
        TrigramLm.trigramsHof(col("text")).as("hof"))
      .filter(col("fast") =!= col("hof")).count()
    assert(edgeMism == 0)
    // hand check
    val t = edge.filter(col("doc_id") === 0)
      .select(TrigramLm.trigrams(col("text"))).head.getSeq[String](0)
    assert(t == Seq("hel", "ell", "llo", "lo ", "o w", " wo", "wor", "orl", "rld"))
  }

  test("score: repeated common text scores lower nll than an outlier doc") {
    val corpus = docs(
      (0L, "the common pattern repeats here"),
      (1L, "the common pattern repeats here"),
      (2L, "the common pattern repeats here"),
      (3L, "zq xv jk qz vx kj weird junk"))
    val counts = TrigramLm.train(corpus, "text")
    val scores = TrigramLm.score(corpus, "doc_id", "text", counts)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(0L) == scores(1L) && scores(1L) == scores(2L))
    assert(scores(3L) > scores(0L),
      s"outlier must have higher nll: $scores")
    // unseen trigrams (cross-corpus scoring) take the smoothing floor
    val fresh = docs((10L, "totally unseen glyphs bbq"))
    val s10 = TrigramLm.score(fresh, "doc_id", "text", counts)
      .head.getDouble(2)
    assert(s10 > scores(3L), "fully-unseen text scores worst")
  }

  test("pplBuckets: per-group terciles, tail dropped, uncovered group omitted") {
    import spark.implicits._
    // 9 'en' docs in three nll strata (3 in-domain clones, 3 mild
    // variants, 3 junk outliers) + 1 'xx' doc whose group has no
    // reference LM at all. Terciles: b33 = 3rd smallest (clone), b66 =
    // 6th smallest (worst mild) -> clones head, milds kept, junk tail.
    val rows =
      (0L to 2L).map(i => (i, "the quick brown fox jumps the lazy dog", "en")) ++
      Seq((3L, "the quick brown fox naps near the lazy dog", "en"),
        (4L, "a quick brown dog jumps over the fox", "en"),
        (5L, "the lazy fox and the quick dog jump around", "en"),
        (6L, "zq xv jk qz vx kj weird junk glyphs", "en"),
        (7L, "ww qq zz xx vv uu strange noise rows", "en"),
        (8L, "kjkj zxzx vqvq mwmw glitch tokens", "en"),
        (9L, "hors du corpus de reference", "xx"))
    val docs = rows.toDF("doc_id", "text", "lang")
    val ref = docs.filter($"lang" === "en" && $"doc_id" <= 2L)
    val out = TrigramLm.pplBuckets(docs, ref, "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(3), r.getString(4), r.getBoolean(5)))).toMap
    // group 'xx' has no reference model -> unscorable, omitted
    assert(!out.contains(9L) && out.size == 9)
    // the in-domain clones land in head and are kept
    (0L to 2L).foreach { i =>
      assert(out(i)._2 == "head" && out(i)._3, s"doc $i: ${out(i)}")
    }
    // mild variants are kept (head or middle), junk is dropped tail
    (3L to 5L).foreach { i => assert(out(i)._3, s"doc $i: ${out(i)}") }
    (6L to 8L).foreach { i =>
      assert(out(i)._2 == "tail" && !out(i)._3, s"doc $i: ${out(i)}")
    }
    // kept <=> not tail; clone nll strictly below junk nll
    out.values.foreach { case (_, b, k) => assert(k == (b != "tail")) }
    assert(out(0L)._1 < out(6L)._1)
  }

  test("excessSelect: in-domain docs outrank generic docs by excess") {
    import spark.implicits._
    // domain slice = medical-ish phrasing; the generic mass dominates
    // the corpus-wide LM, so domain docs carry HIGH excess (the general
    // model explains them poorly relative to the domain model)
    val dom = (0L to 3L).map(i =>
      (i, "dom", "clinical trial dosage protocol patient cohort"))
    val gen = (4L to 11L).map(i =>
      (i, "web", "click here for the best deals online today now"))
    val corpus = (dom ++ gen).toDF("doc_id", "source", "text")
    val out = TrigramLm.excessSelect(corpus,
        corpus.filter($"source" === "dom"), "doc_id", "text")
      .collect().map(r => (r.getLong(0),
        (r.getLong(4), r.getBoolean(5)))).toMap
    // every domain doc has strictly higher excess than every generic doc
    val minDom = (0L to 3L).map(out(_)._1).min
    val maxGen = (4L to 11L).map(out(_)._1).max
    assert(minDom > maxGen, s"excess: $out")
    // domain docs selected, generic mass (below the median) dropped
    (0L to 3L).foreach(i => assert(out(i)._2, s"doc $i: ${out(i)}"))
    // identical docs get identical excess (pure function of text)
    assert((4L to 11L).map(out(_)._1).distinct.size == 1)
    // kept set is a median split: at least half the docs survive
    assert(out.values.count(_._2) >= 6)
  }
}
