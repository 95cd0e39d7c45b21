package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

class HeavyHittersSpec extends SparkSpec {

  /** Corpus with a known skewed term distribution: term t_i appears
    * (freq_i) times, one token per row spread over many partitions so
    * the merge path is exercised.
    */
  private def corpus(freqs: Map[String, Int]) = {
    import spark.implicits._
    val words = freqs.toSeq.flatMap { case (t, n) => Seq.fill(n)(t) }
    // deterministic but interleaved order — MG evictions depend on
    // arrival order, the final answer must not
    val shuffled = words.zipWithIndex
      .sortBy { case (w, i) => (w.hashCode * 2654435761L) ^ i }
      .map(_._1)
    shuffled.toDF("text").repartition(8)
  }

  test("topTerms is exactly the true top-n under heavy eviction pressure") {
    // 5 heavy terms, 200 light ones; k=32 forces constant evictions of
    // the light tail, yet the certified top-5 must be exact
    val heavy = (1 to 5).map(i => s"h$i" -> (1000 - 50 * i)).toMap
    val light = (1 to 200).map(i => s"light$i" -> 2).toMap
    val r = HeavyHitters.topTerms(corpus(heavy ++ light), "text", n = 5, k = 32)
      .collect().map(x => (x.getString(0), x.getLong(1)))
    assert(r.toSeq == Seq("h1" -> 950L, "h2" -> 900L, "h3" -> 850L,
      "h4" -> 800L, "h5" -> 750L))
  }

  test("topTerms tie-break is (count desc, term asc)") {
    val r = HeavyHitters.topTerms(
      corpus(Map("b" -> 10, "a" -> 10, "c" -> 10, "z" -> 1)), "text",
      n = 3, k = 16)
      .collect().map(_.getString(0))
    assert(r.toSeq == Seq("a", "b", "c"))
  }

  test("uncertifiable configuration throws instead of returning silently") {
    // 100 terms of equal count with k=21 < vocab: the n-th count can
    // never clear total/(k+1), so certification must fail loudly
    val uniform = (1 to 100).map(i => s"u$i" -> 5).toMap
    val ex = intercept[IllegalStateException] {
      HeavyHitters.topTerms(corpus(uniform), "text", n = 20, k = 21).collect()
    }
    assert(ex.getMessage.contains("uncertified"))
  }

  test("MgTopAgg as a grouped udaf: exact per-group top terms under capacity") {
    import spark.implicits._
    val rows = Seq.fill(30)(("g1", "x")) ++ Seq.fill(20)(("g1", "y")) ++
      Seq.fill(5)(("g1", "z")) ++ Seq.fill(9)(("g2", "q")) ++ Seq.fill(9)(("g2", "p"))
    val sketch = udaf(new HeavyHitters.MgTopAgg(64, 2),
      org.apache.spark.sql.Encoders.STRING)
    val r = rows.toDF("g", "t").repartition(8)
      .groupBy($"g").agg(sketch($"t").as("top"))
      .select($"g", $"top").orderBy($"g")
      .collect()
      .map(x => x.getString(0) -> x.getSeq[org.apache.spark.sql.Row](1)
        .map(s => (s.getString(0), s.getLong(1))))
      .toMap
    assert(r("g1") == Seq(("x", 30L), ("y", 20L)))
    // tie on count → term-ascending break
    assert(r("g2") == Seq(("p", 9L), ("q", 9L)))
  }

  test("sketch plans as ObjectHashAggregate with map-side partials (one bounded exchange)") {
    import spark.implicits._
    // no repartition here — its round-robin Exchange would pollute the count
    val toks = (Seq.fill(100)("a") ++ Seq.fill(50)("b")).toDF("text")
      .select(explode(
        graft.functions.TextFunctions.tokens(col("text"))).as("t")).as[String]
    val agg = toks.select(new HeavyHitters.MisraGriesAgg(8).toColumn)
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"typed sketch aggregation should plan as ObjectHashAggregate:\n$plan")
    // partial (per-partition sketch) + final — the shuffle carries one
    // ≤ k-counter buffer per partition, not the token stream
    assert("Exchange".r.findAllIn(plan).size == 1, s"one exchange expected:\n$plan")
  }

  test("fewer candidates than n: full-vocab case returns certified, eviction case throws") {
    import spark.implicits._
    // (a) true vocabulary smaller than n with total ≤ k (no eviction can
    // ever fire): the short result is genuinely complete — certified
    val small = (Seq.fill(3)("a") ++ Seq.fill(2)("b") ++ Seq("c")).toDF("text")
    val r = HeavyHitters.topTerms(small, "text", n = 5, k = 16)
    assert(r.collect().map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    // (b) heavy eviction pressure (k=4 over 5 equal terms): whatever
    // survives has exact count == the n/(k+1) bound, never above it —
    // must throw, never silently truncate
    val uniform = (1 to 500).map(i => s"t${i % 5}").toDF("text").repartition(1)
    intercept[IllegalStateException] {
      HeavyHitters.topTerms(uniform, "text", n = 3, k = 4).collect()
    }
  }

  test("sketch residuals underestimate by at most total/(k+1) and keep all frequent terms") {
    import spark.implicits._
    val freqs = Map("x" -> 400, "y" -> 300, "z" -> 200) ++
      (1 to 50).map(i => s"n$i" -> 4).toMap
    val toks = corpus(freqs)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .as[String]
    val k = 16
    val (total, evictions, counters) =
      toks.select(new HeavyHitters.MisraGriesAgg(k).toColumn).head()
    assert(total == freqs.values.sum.toLong)
    assert(evictions > 0, "53 terms over k=16 must evict")
    assert(counters.size <= k)
    val bound = total / (k + 1)
    for ((t, true_n) <- Seq("x" -> 400L, "y" -> 300L, "z" -> 200L)) {
      val est = counters.getOrElse(t, 0L)
      assert(est >= true_n - bound && est <= true_n,
        s"$t: residual $est outside [${true_n - bound}, $true_n]")
    }
  }
}
