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
}
