package graft

import org.apache.spark.sql.functions._

import graft.operators.Collocations

class CollocationsSpec extends SparkSpec {

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  test("pmiBigrams: hand-checked counts and PMI on a tiny corpus") {
    import spark.implicits._
    // unigrams: new=3 york=3 in=1 (N=7); bigrams: (new,york)=3
    // (york,new)=1 (in,new)=1 (B=5)
    val docs = Seq("new york new york", "in new york").toDF("text")
    val r = Collocations.pmiBigrams(docs, col("text"), minCount = 1, topN = 10)
      .collect()
    assert(r.length == 3)
    val ny = r.find(x => x.getString(0) == "new" && x.getString(1) == "york").get
    assert(ny.getAs[Long]("n_ab") == 3 && ny.getAs[Long]("n_a") == 3 &&
      ny.getAs[Long]("n_b") == 3)
    val want = round6(math.log((3.0 / 5) / ((3.0 / 7) * (3.0 / 7))))
    assert(ny.getAs[Double]("pmi") == want, s"pmi ${ny.getAs[Double]("pmi")}")
    // rarer-but-exclusive pairs score higher: (in,new) has n_ab=1 but
    // p(in) is tiny, so its PMI tops (new,york)
    assert(r.head.getString(0) == "in" && r.head.getString(1) == "new")
  }

  test("pmiBigrams: minCount filters the tail, topN caps the output") {
    import spark.implicits._
    val docs = (Seq.fill(10)("alpha beta") ++ Seq("gamma delta")).toDF("text")
    val r = Collocations.pmiBigrams(docs, col("text"), minCount = 2, topN = 10)
      .collect()
    assert(r.map(x => (x.getString(0), x.getString(1))).toSeq ==
      Seq(("alpha", "beta")), "singleton (gamma, delta) must be cut")
    val capped =
      Collocations.pmiBigrams(docs, col("text"), minCount = 1, topN = 1)
    assert(capped.count() == 1)
  }

  test("prefixCompletions: frequency-ranked per prefix, short tokens dropped") {
    import spark.implicits._
    val docs = Seq("apple apple apricot apex apple to to to",
      "banana apricot apricot").toDF("text")
    val r = Collocations.prefixCompletions(docs, col("text"),
        prefixLen = 2, topN = 2, minLen = 3)
      .collect().map(x => (x.getString(0), x.getInt(1), x.getString(2),
        x.getLong(3)))
    val ap = r.filter(_._1 == "ap").sortBy(_._2)
    assert(ap.toSeq == Seq(("ap", 1, "apple", 3L), ("ap", 2, "apricot", 3L)),
      s"tie breaks by term: $ap") // apex (1) cut by topN
    assert(r.count(_._1 == "ba") == 1)
    assert(!r.exists(_._3 == "to"), "minLen must drop short tokens")
  }

  test("oovRate: rates against the top-N vocab, per group") {
    import spark.implicits._
    // global counts: aa=3, bb=1, zz=1 → vocab(size=1) = {aa}
    val docs = Seq(("g1", "aa aa bb"), ("g2", "aa zz")).toDF("g", "text")
    val r = Collocations.oovRate(docs, col("text"), col("g"), vocabSize = 1)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r("g1") == ((3L, 1L, 0.333333)))
    assert(r("g2") == ((2L, 1L, 0.5)))
    // a big enough vocab drives OOV to zero
    val full = Collocations.oovRate(docs, col("text"), col("g"), vocabSize = 10)
      .collect().map(_.getDouble(3))
    assert(full.forall(_ == 0.0))
    // the membership join must stay a broadcast-hash lookup — a future
    // edit that drops the broadcast hint would shuffle the whole corpus
    val plan = Collocations.oovRate(docs, col("text"), col("g"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab membership must broadcast:\n$plan")
  }

  test("zipfFit: exact-harmonic counts fit slope -1, intercept ln(C)") {
    import spark.implicits._
    // term i appears 840/i times, i = 1..8 → ln(cnt) = ln(840) − ln(rk)
    val words = (1 to 8).flatMap(i => Seq.fill(840 / i)(f"w$i%02d"))
    val docs = words.grouped(100).map(_.mkString(" ")).toSeq.toDF("text")
    val r = Collocations.zipfFit(docs, col("text"), topK = 8).head()
    assert(r.getAs[Long]("n_terms") == 8)
    assert(math.abs(r.getAs[Double]("slope") - (-1.0)) < 1e-3,
      s"slope ${r.getAs[Double]("slope")}")
    assert(math.abs(r.getAs[Double]("intercept") - math.log(840.0)) < 1e-3,
      s"intercept ${r.getAs[Double]("intercept")}")
  }

  test("pmiBigrams: empty and single-token docs contribute no bigrams") {
    import spark.implicits._
    val docs = Seq("", "solo", "a b").toDF("text")
    val r = Collocations.pmiBigrams(docs, col("text"), minCount = 1, topN = 10)
      .collect()
    // only (a, b); N counts "solo" even though it forms no bigram
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_ab") == 1)
    val want = round6(math.log((1.0 / 1) / ((1.0 / 3) * (1.0 / 3))))
    assert(r.head.getAs[Double]("pmi") == want)
  }
}
