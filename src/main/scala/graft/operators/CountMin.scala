package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Count-min sketch (Cormode & Muthukrishnan 2005) — the POINT-FREQUENCY
  * member of the sketch family (Misra-Gries answers "which terms are
  * frequent", KLL answers quantiles, KMV answers cardinality; count-min
  * answers "how often does THIS term occur" for any term, without a
  * full-vocabulary aggregation). d hash rows × w buckets of exact
  * integer counts; estimate(x) = min over rows of x's bucket count —
  * always ≥ the true count (one-sided error ≤ n/w per row, minimized
  * across d independent rows).
  *
  * Scale shape: the sketch build is ONE map-side-combined aggregate
  * whose key space is d·w buckets TOTAL — shuffle width is sketch-sized,
  * never vocabulary-sized (the same bounded-width discipline as the
  * other three sketches), and the bucket table is mergeable across
  * partitions/days by plain addition. Point queries join the tiny
  * (terms × d) probe table against the d·w bucket table. Hashes are
  * md5-derived (`Dedup.hash60` of "row:term"), so the whole sketch —
  * bucket sums AND estimates — replicates bit-exactly in the DuckDB
  * oracle; determinism certifies the one-sided overcount property per
  * query (`est ≥ exact`, spec-asserted).
  */
object CountMin {

  /** The d×w bucket-count table (j, b, c) for a token stream. */
  def sketch(docs: DataFrame, textCol: String,
             d: Int = 4, w: Int = 16): DataFrame = {
    require(d >= 1 && w >= 2, s"need d >= 1, w >= 2; got d=$d, w=$w")
    val toks = docs.select(explode(T.tokens(lower(col(textCol)))).as("__term"))
    toks
      .select(explode(array((0 until d).map(j =>
        struct(lit(j).as("j"),
          pmod(Dedup.hash60(concat(lit(j.toString), lit(":"), col("__term"))),
            lit(w.toLong)).as("b"))): _*)).as("__jb"))
      .groupBy(col("__jb.j").as("j"), col("__jb.b").as("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point estimates for `queryTerms` against the sketch, beside the
    * exact counts: (term, est, exact, overcount). `est ≥ exact` always;
    * the exact recount touches only the queried terms (a scan filter),
    * mirroring the Misra-Gries candidate-recount discipline.
    */
  def pointEstimates(docs: DataFrame, textCol: String,
                     queryTerms: Seq[String],
                     d: Int = 4, w: Int = 16): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    val spark = docs.sparkSession
    import spark.implicits._
    val cms = sketch(docs, textCol, d, w)
    val probes = queryTerms.toDF("term")
      .select(col("term"), explode(array((0 until d).map(j =>
        struct(lit(j).as("j"),
          pmod(Dedup.hash60(concat(lit(j.toString), lit(":"), col("term"))),
            lit(w.toLong)).as("b"))): _*)).as("__jb"))
      .select(col("term"), col("__jb.j").as("j"), col("__jb.b").as("b"))
    val est = probes.join(cms, Seq("j", "b"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
    val exact = docs
      .select(explode(T.tokens(lower(col(textCol)))).as("term"))
      .filter(col("term").isInCollection(queryTerms))
      .groupBy(col("term")).agg(count(lit(1)).as("exact"))
    est.join(exact, Seq("term"), "left")
      .select(col("term"), col("est"),
        coalesce(col("exact"), lit(0L)).as("exact"),
        (col("est") - coalesce(col("exact"), lit(0L))).as("overcount"))
  }
}
