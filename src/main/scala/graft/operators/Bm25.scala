package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** BM25 lexical retrieval — the keyword-search half of hybrid RAG
  * retrieval (the reference ships only the dense half; production
  * stacks pair it with BM25 and fuse ranks — see `rrfFuse`).
  *
  * Okapi BM25 with the +1 idf variant (always positive):
  * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1),
  * s(d,t) = idf · tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)).
  *
  * Execution shape: term postings are pruned to the QUERY terms at the
  * scan (an `isin` filter before the tf aggregation), so per-query work
  * is proportional to the query terms' postings, not the corpus; the
  * per-term scores quantize to integer micro-units before the per-doc
  * sum, so the total is an exact integer sum (order-proof across
  * partitionings and engines) with a single final division.
  * At index scale the tok/tf tables would be written once
  * (`sources/Layout` bucketing by term) and reused per query.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** Top-k docs for a bag-of-words query. Scores rounded to 4 decimals;
    * total order (score desc, id asc).
    */
  def search(docs: DataFrame, idCol: String, textCol: String,
             terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty)
    val id = col(idCol)
    val toks = docs
      .select(id, explode(T.tokens(lower(col(textCol)))).as("term"))
      .localCheckpoint(false) // consumed by dl, stats, and tf below
    val dl = toks.groupBy(id).agg(count(lit(1)).as("dl"))
      .localCheckpoint(false)
    val statsRow = dl.agg(count(lit(1)), sum(col("dl"))).head
    val n = statsRow.getLong(0).toDouble
    val avgdl = statsRow.getLong(1).toDouble / n
    val tf = toks.filter(col("term").isInCollection(terms))
      .groupBy(id, col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = round(log(
      (lit(n) - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)) + lit(1.0)), 6)
    // 2.2 as a PARSED literal, not K1+1: 1.2+1.0 in binary sits on a
    // round-to-even knife edge and may differ from decimal "2.2" by an
    // ulp — the oracle parses the same decimal text
    val termScore = col("idf") * col("tf").cast("double") * lit(2.2) /
      (col("tf").cast("double") +
        lit(K1) * (lit(1.0) - lit(B) + lit(B) * col("dl").cast("double") / lit(avgdl)))
    val scored = tf
      .join(broadcast(df.select(col("term"), idf.as("idf"))), "term")
      .join(dl, idCol)
      // quantize per-term scores to integer micro-units BEFORE the
      // per-doc sum — exact integer addition is order-proof
      .withColumn("__u", round(termScore * 1000000).cast("long"))
      .groupBy(id)
      .agg((round(sum(col("__u")).cast("double") / 1000000.0, 4) + lit(0.0)).as("score"))
    TopK.topK(scored, col("score"), id, k)
  }

  /** Reciprocal-rank fusion of two ranked lists (id, rank):
    * rrf(d) = Σ 1/(c + rank_i(d)) over the lists containing d — the
    * standard hybrid-retrieval combiner (Cormack et al. 2009). Pure
    * rational arithmetic over integer ranks: engine-exact.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String,
              rankCol: String, c: Int = 60): DataFrame = {
    val ra = a.select(col(idCol), col(rankCol).as("__ra"))
    val rb = b.select(col(idCol), col(rankCol).as("__rb"))
    ra.join(rb, Seq(idCol), "full_outer")
      .select(col(idCol),
        round(
          coalesce(lit(1.0) / (lit(c.toDouble) + col("__ra").cast("double")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(c.toDouble) + col("__rb").cast("double")), lit(0.0)),
          6).as("rrf"))
  }
}
