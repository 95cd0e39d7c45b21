package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Collocation mining: pointwise mutual information over adjacent token
  * pairs (Church & Hanks 1990) — the corpus-analytics pass that surfaces
  * multi-word expressions ("new york", "machine learning") for tokenizer
  * vocab decisions, stop-phrase lists, and boilerplate fingerprints.
  *
  * PMI(a,b) = ln( p(ab) / (p(a)·p(b)) ) with p(ab) = n_ab/B (bigram
  * frequency) and p(a) = n_a/N (unigram frequency). Everything reduces
  * to map-side-combinable counts: one token explode → unigram counts,
  * one bigram explode → pair counts, two 1-row totals broadcast back.
  * The min-count filter lands BEFORE the unigram joins, so the joined
  * pair set is the (tiny) frequent tail, not the raw bigram table; the
  * unigram side is vocab-bounded. No corpus-sized shuffle survives the
  * count aggregates — at 100 TB the heavy stages are the two counting
  * passes, both partial-aggregated scan-side.
  *
  * Determinism: the PMI double is round(ln(x), 6) over an identical
  * IEEE expression tree on both engines (the `TrigramLm` convention);
  * ties order by (w1, w2).
  */
object Collocations {

  /** Top-N adjacent bigrams by PMI among pairs seen ≥ minCount times.
    * Output: (w1, w2, n_ab, n_a, n_b, pmi) ordered by pmi desc, w1, w2.
    */
  def pmiBigrams(docs: DataFrame, textCol: Column, minCount: Long = 5L,
                 topN: Int = 30): DataFrame = {
    val toks = docs.select(TextFunctions.tokens(lower(textCol)).as("toks"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val bi = toks
      .select(explode(zip_with(
        slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
        slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n_ab"))
    val totals = uni.agg(sum(col("n")).as("nTot"))
      .crossJoin(bi.agg(sum(col("n_ab")).as("bTot")))
    bi.filter(col("n_ab") >= minCount)
      .join(uni.select(col("w").as("w1"), col("n").as("n_a")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("n").as("n_b")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .withColumn("pmi", round(log(
        (col("n_ab").cast("double") / col("bTot").cast("double"))
          / ((col("n_a").cast("double") / col("nTot").cast("double"))
            * (col("n_b").cast("double") / col("nTot").cast("double")))), 6))
      .select(col("w1"), col("w2"), col("n_ab"), col("n_a"), col("n_b"),
        col("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topN)
  }

  /** Prefix → top-N completions table (the autocomplete/typeahead
    * artifact, built corpus-side): token counts grouped under their
    * first `prefixLen` characters, top N per prefix by frequency
    * (ties by term). Counts are map-side combined; the ranking window
    * runs over the VOCAB-sized count table partitioned by prefix —
    * bounded groups, never the corpus. Tokens shorter than `minLen`
    * are noise for typeahead and are dropped.
    */
  def prefixCompletions(docs: DataFrame, textCol: Column, prefixLen: Int = 2,
                        topN: Int = 3, minLen: Int = 3): DataFrame = {
    require(prefixLen >= 1 && topN >= 1 && minLen > prefixLen,
      s"need minLen > prefixLen >= 1, topN >= 1")
    val counts = docs
      .select(explode(TextFunctions.tokens(lower(textCol))).as("w"))
      .filter(length(col("w")) >= minLen)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .withColumn("prefix", substring(col("w"), 1, prefixLen))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("prefix")).orderBy(col("cnt").desc, col("w"))
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topN)
      .select(col("prefix"), col("rk"), col("w").as("completion"), col("cnt"))
  }

  /** Tokenizer-vocab coverage: per-group out-of-vocabulary token rate
    * against the corpus's own top-`vocabSize` terms — the number that
    * decides whether a vocab/tokenizer is big enough for a source
    * before training starts (a domain with 30% OOV against the planned
    * vocab will fragment into garbage merges). The vocab is bounded by
    * construction and BROADCAST; the corpus is scanned once, per-token
    * membership is a broadcast-hash lookup, and the result collapses to
    * one row per group — no corpus-sized shuffle.
    */
  def oovRate(docs: DataFrame, textCol: Column, group: Column,
              vocabSize: Int = 1000): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be positive, got $vocabSize")
    val toks = docs.select(group.as("grp"),
      explode(TextFunctions.tokens(lower(textCol))).as("w"))
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(vocabSize)
      .select(col("w"), lit(true).as("__in_vocab"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("__in_vocab").isNull, 1)).as("n_oov"))
      .withColumn("oov_rate", round(col("n_oov").cast("double")
        / col("n_tokens").cast("double"), 6))
  }

  /** Zipf rank-frequency fit: OLS slope/intercept of ln(count) against
    * ln(rank) over the top-K terms — the one-row corpus health signal
    * (natural text slopes ≈ −1; a synthetic or template-heavy corpus
    * shows up as a flat or kinked curve before anyone reads a sample).
    *
    * Scale shape: one map-side-combined term count, one
    * TakeOrderedAndProject for the top-K (per-partition heaps, K rows to
    * the driver side of the plan — the corpus never re-shuffles), then
    * the regression over K rows. Determinism: ln values quantize to
    * integer MICRO-units (the `TrigramLm` convention), the OLS sums are
    * exact BIGINT reductions over those integers — order-proof and
    * engine-exact — and the final slope/intercept are single rounded
    * double divisions.
    */
  def zipfFit(docs: DataFrame, textCol: Column, topK: Int = 100): DataFrame = {
    require(topK >= 2, s"need at least 2 ranks to fit, got $topK")
    val counts = docs
      .select(explode(TextFunctions.tokens(lower(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(topK)
    // rank over the K surviving rows only (single partition of K rows —
    // bounded by construction, not a corpus-wide window)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("w"))
    counts.withColumn("rk", row_number().over(w))
      .select(
        round(log(col("rk").cast("double")) * 1e6).cast("long").as("x"),
        round(log(col("cnt").cast("double")) * 1e6).cast("long").as("y"))
      .agg(count(lit(1)).as("k"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("k").as("n_terms"),
        round((col("k") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (col("k") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
          .as("slope"),
        round(col("sy").cast("double") / 1e6 / col("k")
          - ((col("k") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("k") * col("sxx") - col("sx") * col("sx")).cast("double"))
            * (col("sx").cast("double") / 1e6 / col("k")), 6).as("intercept"))
  }
}
