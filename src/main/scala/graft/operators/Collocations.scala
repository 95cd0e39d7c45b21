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
    val totals = uni.agg(sum(col("n")).as("N"))
      .crossJoin(bi.agg(sum(col("n_ab")).as("B")))
    bi.filter(col("n_ab") >= minCount)
      .join(uni.select(col("w").as("w1"), col("n").as("n_a")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("n").as("n_b")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .withColumn("pmi", round(log(
        (col("n_ab").cast("double") / col("B").cast("double"))
          / ((col("n_a").cast("double") / col("N").cast("double"))
            * (col("n_b").cast("double") / col("N").cast("double")))), 6))
      .select(col("w1"), col("w2"), col("n_ab"), col("n_a"), col("n_b"),
        col("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topN)
  }
}
