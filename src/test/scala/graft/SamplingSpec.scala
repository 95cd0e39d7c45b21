package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {

  private def docs(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"src${i % 4}")).toDF("id", "source")
  }

  test("hashSample is deterministic and roughly proportional") {
    val d = docs(2000)
    val a = Sampling.hashSample(d, col("id"), 0.3).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(d, col("id"), 0.3).collect().map(_.getLong(0)).toSet
    assert(a == b, "same rate must select the same rows")
    assert(a.size > 2000 * 0.2 && a.size < 2000 * 0.4, s"got ${a.size} of 2000 at rate 0.3")
  }

  test("hashSample at a lower rate is a subset of a higher rate (nested samples)") {
    val d = docs(2000)
    val lo = Sampling.hashSample(d, col("id"), 0.1).collect().map(_.getLong(0)).toSet
    val hi = Sampling.hashSample(d, col("id"), 0.5).collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi), "hash-gate thresholds must nest")
  }

  test("stratifiedSample applies per-stratum rates; 0 drops all, 1 keeps all") {
    val d = docs(2000) // 500 per source
    val kept = Sampling.stratifiedSample(d, col("source"), col("id"),
      Map("src0" -> 1.0, "src1" -> 0.0, "src2" -> 0.5), defaultRate = 0.1)
    val bySrc = kept.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.getOrElse("src0", 0L) == 500L)
    assert(!bySrc.contains("src1"))
    val s2 = bySrc.getOrElse("src2", 0L)
    assert(s2 > 200 && s2 < 300, s"src2 at 0.5 gave $s2 of 500")
    val s3 = bySrc.getOrElse("src3", 0L)
    assert(s3 > 20 && s3 < 80, s"src3 at default 0.1 gave $s3 of 500")
  }

  test("stratifiedSample is a pure scan filter — no exchange, no join in the plan") {
    val plan = Sampling.stratifiedSample(docs(100), col("source"), col("id"),
      Map("src0" -> 0.5), defaultRate = 0.1).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("tokenMixtureRates: binding stratum keeps ~all, others thin to proportion") {
    import spark.implicits._
    // src0: 1000 tokens, src1: 4000 tokens; target 50/50 → N = min(1000/.5,
    // 4000/.5) = 2000 → src0 rate 1.0 (binding), src1 rate .5*2000/4000 = .25
    val d = ((0 until 10).map(i => (i.toLong, "src0", 100L)) ++
      (10 until 50).map(i => (i.toLong, "src1", 100L)))
      .toDF("id", "source", "n_tokens")
    val rates = Sampling.tokenMixtureRates(d, col("source"), col("n_tokens"),
      Map("src0" -> 0.5, "src1" -> 0.5))
    assert(math.abs(rates("src0") - 1.0) < 1e-12)
    assert(math.abs(rates("src1") - 0.25) < 1e-12)
    // a target stratum absent from the data gets rate 0, present data
    // strata outside the target are untouched by the map
    val r2 = Sampling.tokenMixtureRates(d, col("source"), col("n_tokens"),
      Map("src0" -> 0.5, "ghost" -> 0.5))
    assert(r2("ghost") == 0.0)
  }

  test("weightedSample: without replacement, weight-biased, deterministic, no shuffle") {
    import spark.implicits._
    // two weight tiers: heavy rows (w=1000) should dominate a k=20 sample
    // over light rows (w=1) despite equal population
    val d = ((0 until 50).map(i => (i.toLong, 1000L)) ++
      (50 until 100).map(i => (i.toLong, 1L))).toDF("id", "w")
    val got = Sampling.weightedSample(d, col("id"), col("w"), k = 20)
    val ids = got.select("id").collect().map(_.getLong(0))
    assert(ids.length == 20 && ids.distinct.length == 20, "k distinct rows")
    val heavy = ids.count(_ < 50)
    assert(heavy >= 18, s"heavy tier should dominate, got $heavy/20")
    // deterministic: same input → identical selection and order
    val again = Sampling.weightedSample(d, col("id"), col("w"), k = 20)
      .select("id").collect().map(_.getLong(0))
    assert(ids.sameElements(again))
    // plan: global top-k, not a full sort — no Exchange before the limit
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("temperatureRates: alpha=1 is proportional, alpha->0 flattens, caps at 1") {
    import spark.implicits._
    // 900 src0 docs vs 100 src1 docs
    val d = ((0 until 900).map(i => (i.toLong, "src0")) ++
      (900 until 1000).map(i => (i.toLong, "src1"))).toDF("id", "source")
    // alpha=1: rates equal across strata (proportional sampling)
    val r1 = Sampling.temperatureRates(d, col("source"), 1.0, 500)
    assert(math.abs(r1("src0") - 0.5) < 1e-6 &&
      math.abs(r1("src1") - 0.5) < 1e-6, r1.toString)
    // alpha=0.5: low-resource stratum keeps a HIGHER fraction
    val r5 = Sampling.temperatureRates(d, col("source"), 0.5, 240)
    assert(r5("src1") > r5("src0"), r5.toString)
    assert(math.abs(r5("src1") - 3.0 * r5("src0")) < 1e-9, // sqrt(900)/sqrt(100) = 3
      s"sqrt flattening ratio: $r5")
    // rate caps at 1.0 when the target exceeds what a stratum can give
    val rCap = Sampling.temperatureRates(d, col("source"), 0.5, 100000)
    assert(rCap("src1") == 1.0)
  }

  test("ratesForMixture hits target sizes and caps at 1.0") {
    val d = docs(2000) // 500 per source
    val rates = Sampling.ratesForMixture(d, col("source"),
      Map("src0" -> 0.5, "src1" -> 0.25, "missing" -> 0.25), targetSize = 400)
    assert(math.abs(rates("src0") - 0.4) < 1e-12) // 0.5*400/500
    assert(math.abs(rates("src1") - 0.2) < 1e-12)
    assert(rates("missing") == 0.0)
    val capped = Sampling.ratesForMixture(d, col("source"),
      Map("src0" -> 1.0), targetSize = 5000)
    assert(capped("src0") == 1.0) // 1.0*5000/500 caps at 1
  }

  test("threeWaySplit: complete, disjoint, deterministic, ~80/10/10") {
    val d = docs(20000)
    val s = Sampling.threeWaySplit(d, col("id"), 0.8, 0.1)
    val counts = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 20000, "every row gets exactly one split")
    assert(math.abs(counts("train") - 16000.0) / 16000 < 0.05, counts.toString)
    assert(math.abs(counts("val") - 2000.0) / 2000 < 0.2, counts.toString)
    assert(math.abs(counts("test") - 2000.0) / 2000 < 0.2, counts.toString)
    // assignment is a function of the key: a later incremental batch
    // containing a subset of the same ids routes identically
    val again = Sampling.threeWaySplit(d.filter(col("id") < 1000), col("id"),
      0.8, 0.1).collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val full = s.filter(col("id") < 1000).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(again == full)
    // degenerate fractions: all-train and all-test
    assert(Sampling.threeWaySplit(d, col("id"), 1.0, 0.0)
      .filter(col("split") =!= "train").count() == 0)
    assert(Sampling.threeWaySplit(d, col("id"), 0.0, 0.0)
      .filter(col("split") =!= "test").count() == 0)
  }

  test("tokenBudgetSample: bucketed selection equals the one-window reference") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val d = (0 until 500).map(i =>
        (i.toLong, if (i % 3 == 0) "a" else "b", 10L + i % 7))
      .toDF("id", "src", "n")
    val budgets = Map("a" -> 300L)
    val got = Sampling.tokenBudgetSample(d, col("src"), col("id"), col("n"),
        budgets, defaultBudget = 777L, buckets = 8)
      .select("id").collect().map(_.getLong(0)).toSet
    // reference: single window in hash order (what the oracle runs)
    val w = Window.partitionBy(col("src"))
      .orderBy(graft.operators.Dedup.hash60(col("id").cast("string")), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budget = when(col("src") === "a", 300L).otherwise(777L)
    val want = d.withColumn("cb", sum(col("n")).over(w) - col("n"))
      .filter(col("cb") < budget)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == want, s"diff: ${got.diff(want)} / ${want.diff(got)}")
    assert(want.nonEmpty && want.size < 500, s"degenerate fixture: ${want.size}")
    // spent tokens stay within budget + one overshoot doc per stratum
    val spent = d.filter(col("id").isin(got.toSeq.map(Long.box): _*))
      .groupBy("src").agg(sum("n").as("s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(spent("a") < 300L + 17L, spent.toString)
    // zero budget keeps nothing; partitioning independence
    assert(Sampling.tokenBudgetSample(d, col("src"), col("id"), col("n"),
      Map.empty, defaultBudget = 0L, buckets = 8).count() == 0)
    val again = Sampling.tokenBudgetSample(d.repartition(13), col("src"),
        col("id"), col("n"), budgets, 777L, buckets = 8)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == got)
  }

  test("leakageSafeSplit: no duplicate pair ever straddles two splits") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "txt")
    // chains of near-dups: (1,2),(2,3) cluster {1,2,3}; plus far pairs
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (50L, 151L),
      (151L, 152L), (199L, 200L)).toDF("id_a", "id_b")
    val out = Sampling.leakageSafeSplit(docs, "doc_id", pairs,
      "id_a", "id_b", 0.8, 0.1)
    val split = out.select($"doc_id", $"split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val clusters = Seq(Seq(1L, 2L, 3L), Seq(10L, 11L),
      Seq(50L, 151L, 152L), Seq(199L, 200L))
    clusters.foreach { c =>
      assert(c.map(split).distinct.size == 1,
        s"cluster $c straddles splits: ${c.map(split)}")
    }
    // singletons route exactly like threeWaySplit on their own id
    val own = Sampling.threeWaySplit(docs.filter($"doc_id" === 42L),
      $"doc_id", 0.8, 0.1).head.getString(2)
    assert(split(42L) == own)
    // cluster members route by the cluster MIN id
    val repRoute = Sampling.threeWaySplit(
      Seq(Tuple1(50L)).toDF("k"), $"k", 0.8, 0.1).head.getString(1)
    assert(split(151L) == repRoute && split(152L) == repRoute)
  }

  private def textDocs = {
    import spark.implicits._
    // zipfy word soup: "the" dominates, tail words are rare
    (0L until 60L).map { i =>
      val words = (0 until 20).map { j =>
        val r = (i * 20 + j) % 10
        if (r < 5) "the" else if (r < 8) s"mid${r}" else s"rare${i % 13}_$j"
      }
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("subsampleFrequent: distributed (join) path equals the literal path row for row") {
    val d = textDocs
    val lit = Sampling.subsampleFrequent(d, "doc_id", "text", 0.05)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    // maxVocabLiteral = 0 forces the distributed path for ANY vocab
    val joined = Sampling.subsampleFrequent(d, "doc_id", "text", 0.05,
        maxVocabLiteral = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(lit.nonEmpty && lit == joined,
      s"paths diverge:\n lit=${lit.take(5)}\n join=${joined.take(5)}")
    // the subsampling did something: frequent words thinned
    assert(lit.exists { case (_, o, k) => k < o },
      "threshold 0.05 must drop some frequent-word positions")
  }

  test("subsampleFrequent: below the vocab ceiling the plan has no join; above it, rates stay distributed") {
    val d = textDocs
    val litPlan = Sampling.subsampleFrequent(d, "doc_id", "text", 0.05)
      .queryExecution.executedPlan.toString
    assert(!litPlan.contains("Join"),
      s"small-vocab path must gate with a literal map, not a join:\n$litPlan")
    val joinPlan = Sampling.subsampleFrequent(d, "doc_id", "text", 0.05,
        maxVocabLiteral = 0)
      .queryExecution.executedPlan.toString
    assert(joinPlan.contains("Join"),
      s"past the ceiling the rates must ride a join, not a driver literal:\n$joinPlan")
  }

  test("subsampleFrequent: zero-token docs survive both paths with n_kept = 0") {
    import spark.implicits._
    val d = Seq((1L, "the the the"), (2L, ""), (3L, "rare")).toDF("doc_id", "text")
    for (ceiling <- Seq(65536, 0)) {
      val rows = Sampling.subsampleFrequent(d, "doc_id", "text", 0.5,
          maxVocabLiteral = ceiling)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(rows(2L) == ((0L, 0L)), s"ceiling=$ceiling: ${rows(2L)}")
      assert(rows(3L)._1 == 1L, s"ceiling=$ceiling")
    }
  }

  test("MaxStrata: per-stratum driver pulls refuse corpus-cardinality stratum columns loudly") {
    import spark.implicits._
    val wide = spark.range(Sampling.MaxStrata + 1)
      .select(col("id").cast("string").as("s"), lit(10L).as("n"))
    val e1 = intercept[IllegalArgumentException] {
      Sampling.ratesForMixture(wide, col("s"), Map("x" -> 1.0), 100L)
    }
    assert(e1.getMessage.contains("MaxStrata"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Sampling.temperatureRates(wide, col("s"), 0.5, 100L)
    }
    assert(e2.getMessage.contains("MaxStrata"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      Sampling.tokenMixtureRates(wide, col("s"), col("n"), Map("x" -> 0.5))
    }
    assert(e3.getMessage.contains("MaxStrata"), e3.getMessage)
    // literal CASE chains refuse oversized maps at validation too
    val hugeRates = (0 to Sampling.MaxStrata).map(i => s"s$i" -> 0.5).toMap
    val e4 = intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(docs(10), col("source"), col("id"),
        hugeRates, 0.1)
    }
    assert(e4.getMessage.contains("MaxStrata"), e4.getMessage)
    val hugeBudgets = (0 to Sampling.MaxStrata).map(i => s"s$i" -> 5L).toMap
    val e5 = intercept[IllegalArgumentException] {
      Sampling.tokenBudgetSample(docs(10), col("source"), col("id"),
        lit(1L), hugeBudgets, 5L)
    }
    assert(e5.getMessage.contains("MaxStrata"), e5.getMessage)
  }
}
