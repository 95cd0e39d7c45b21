package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Tfidf}

class TfidfSpec extends SparkSpec {

  test("search matches a driver-side tf-idf cosine reference") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry"),
      (4L, "durian durian"))
    val terms = Seq("apple", "cherry")
    val got = Tfidf.search(corpus.toDF("doc_id", "text").repartition(3),
        "doc_id", "text", terms, 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // independent reference computation (same formula, driver-side)
    val docs = corpus.map { case (id, t) => id -> t.split(" ").toSeq }
    val n = docs.size.toDouble
    val dfm = docs.flatMap(_._2.distinct).groupBy(identity).map {
      case (t, xs) => t -> xs.size.toDouble
    }
    val want = docs.flatMap { case (id, toks) =>
      val wqs = toks.distinct.map { t =>
        val idf = BigDecimal(math.log((n + 1.0) / (dfm(t) + 1.0)) + 1.0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        t -> math.round(toks.count(_ == t).toDouble * idf * 1000000)
      }
      val dot = wqs.filter(w => terms.contains(w._1)).map(_._2).sum
      val n2 = wqs.map(w => BigInt(w._2) * BigInt(w._2)).sum
      if (dot <= 0) None
      else Some(id -> BigDecimal(dot.toDouble /
          math.sqrt(n2.toDouble) / math.sqrt(terms.size.toDouble))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    assert(got == want, s"got $got want $want")
    assert(!got.contains(4L), "doc without query terms must not appear")
    // scores are true cosines: bounded by 1
    got.values.foreach(s => assert(s > 0.0 && s <= 1.0))
  }

  test("vectorize is stable under repartitioning and empty docs vanish") {
    import spark.implicits._
    val df = Seq((1L, "a b a"), (2L, ""), (3L, "b c")).toDF("doc_id", "text")
    val v1 = Tfidf.vectorize(df.repartition(1), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val v2 = Tfidf.vectorize(df.repartition(7), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(v1 == v2, "partitioning must not change the index")
    assert(!v1.exists(_._1 == 2L), "empty doc contributes no terms")
  }
}

class ParagraphDedupSpec extends SparkSpec {

  test("paragraphDedup keeps corpus-wide first occurrences, passes untouched docs byte-identical") {
    import spark.implicits._
    // paraTokens = 2: doc 1 = [a b][c d]; doc 2 repeats [a b] then adds
    // [e f]; doc 3 is entirely doc 1's first paragraph; doc 4 unique
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b e f"),
      (3L, "a b"),
      (4L, "x  y z")) // irregular whitespace: must survive byte-identical
      .toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(df.repartition(3), "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((2L, 2L, "a b c d")), "doc 1 untouched (first owner)")
    assert(got(2L) == ((2L, 1L, "e f")), "doc 2 loses the repeated paragraph")
    assert(got(3L) == ((1L, 0L, "")), "doc 3 is entirely duplicate")
    assert(got(4L) == ((2L, 2L, "x  y z")),
      "untouched doc must keep its original bytes, whitespace included")
  }

  test("paragraphDedup result is partition-count independent") {
    import spark.implicits._
    val df = (1L to 40L).map(i => (i, s"p${i % 7} q${i % 7} r$i s$i"))
      .toDF("doc_id", "text")
    val a = Dedup.paragraphDedup(df.repartition(1), "doc_id", "text", 2)
      .collect().map(_.toSeq).toSet
    val b = Dedup.paragraphDedup(df.repartition(11), "doc_id", "text", 2)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("paragraphDedup plan has no Window operator (hot-fingerprint safety)") {
    import spark.implicits._
    // the canonical-occurrence pick must stay a partial-aggregable
    // min(struct), never a row_number sort — a boilerplate paragraph
    // repeated 10⁸× would otherwise serialize onto one reducer
    val df = Seq((1L, "a b c d"), (2L, "a b e f")).toDF("doc_id", "text")
    val r = Dedup.paragraphDedup(df, "doc_id", "text", 2)
    r.count()
    val plan = r.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no Window expected:\n$plan")
  }

  test("incrementalParagraphDedup drops corpus-known paragraphs before the batch's own pick") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c d")).toDF("doc_id", "text")
    // batch: [a b] is corpus-known (drops), [e f] repeats in-batch
    // (first batch owner 10 keeps it), [g h] is fresh
    val batch = Seq((10L, "a b e f"), (11L, "e f g h")).toDF("doc_id", "text")
    val got = Dedup.incrementalParagraphDedup(batch.repartition(2), corpus,
        "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(10L) == ((2L, 1L, "e f")), "corpus-known [a b] must drop")
    assert(got(11L) == ((2L, 1L, "g h")), "[e f] already owned by doc 10")
  }

  test("paragraphDedup handles empty text") {
    import spark.implicits._
    val got = Dedup.paragraphDedup(
        Seq((1L, ""), (2L, "a b")).toDF("doc_id", "text"), "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((0L, 0L, "")), "empty doc: 0 paras, text passes through")
    assert(got(2L) == ((1L, 1L, "a b")))
  }
}
