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

  test("knScore matches an independent driver-side KN reference bit-for-bit") {
    import spark.implicits._
    val ref = docs(
      (0L, "the mat sat on the mat"),
      (1L, "a cat sat on a hat"),
      (2L, "the cat and the hat"))
    val probe = docs(
      (10L, "the cat sat"),            // all-seen trigrams
      (11L, "zq zq xx"),               // unseen chars -> floor path
      (12L, "the mat"),                // high-count path
      (13L, "hat on a mat the cat"))   // mixed
    val out = TrigramLm.knScore(probe, ref, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    // independent reference: plain Scala maps over the same counts
    def norm(s: String) =
      s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim
    def tris(s: String) = { val n = norm(s)
      if (n.length < 3) Seq.empty else (0 to n.length - 3).map(i => n.substring(i, i + 3)) }
    val cnt = scala.collection.mutable.Map.empty[String, Long]
    Seq("the mat sat on the mat", "a cat sat on a hat", "the cat and the hat")
      .foreach(t => tris(t).foreach(g => cnt(g) = cnt.getOrElse(g, 0L) + 1))
    val D = 0.75
    val n = cnt.size.toDouble
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val pc = cnt.keys.groupBy(_.substring(2)).map { case (c, g) =>
      c -> r6(g.size / n) }
    val nb = cnt.keys.groupBy(_.substring(1, 2)).map { case (b, g) => b -> g.size }
    val nbtSet: Set[(String, String)] =
      cnt.keys.map(t => (t.substring(1, 2), t.substring(2))).toSet
    val nbt = nbtSet.groupBy(_._1).map { case (b, g) => b -> g.size }
    val fb = nb.map { case (b, v) => b -> r6(D * nbt(b) / v) }
    // NB keys.toSeq first: mapping over the key SET would dedupe the
    // (b, c) projections and silently collapse every N1+(·bc) to 1
    val pmid = cnt.keys.toSeq.map(t => (t.substring(1, 2), t.substring(2)))
      .groupBy(identity).map { case ((b, c), g) =>
        (b, c) -> r6(math.max(g.size - D, 0.0) / nb(b) + D * nbt(b) / nb(b) * pc(c)) }
    val ctx = cnt.toSeq.groupBy(_._1.substring(0, 2)).map { case (ab, g) =>
      ab -> (g.map(_._2).sum, r6(D * g.size / g.map(_._2).sum)) }
    def lpOf(t: String): Long = {
      val (ab, bc, b, c) = (t.substring(0, 2), (t.substring(1, 2), t.substring(2)),
        t.substring(1, 2), t.substring(2))
      val pcE = pc.getOrElse(c, r6(1.0 / (2 * n)))
      val pmE = pmid.getOrElse(bc,
        fb.get(b).map(f => r6(f * pcE)).getOrElse(pcE))
      val p = cnt.get(t) match {
        case Some(c3) =>
          val (tot, lam) = ctx(ab)
          r6(math.max(c3 - D, 0.0) / tot + lam * pmE)
        case None => ctx.get(ab) match {
          case Some((_, lam)) => r6(lam * pmE)
          case None => pmE
        }
      }
      math.round(r6(math.log(p)) * 1e6)
    }
    def nllOf(text: String): (Long, Double) = {
      val ts = tris(text)
      val s = ts.map(lpOf).sum
      (ts.size.toLong,
        math.round(-s / 1e6 / ts.size * 1e4) / 1e4 + 0.0)
    }
    Seq(10L -> "the cat sat", 11L -> "zq zq xx", 12L -> "the mat",
      13L -> "hat on a mat the cat").foreach { case (id, text) =>
      assert(out(id) == nllOf(text), s"doc $id: ${out(id)} vs ${nllOf(text)}")
    }
    // unseen junk scores strictly worse than in-domain text
    assert(out(11L)._2 > out(10L)._2)
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
