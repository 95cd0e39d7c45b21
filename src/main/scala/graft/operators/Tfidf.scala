package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** TF-IDF vector-space retrieval — the classic lexical baseline next to
  * Okapi [[Bm25]] (reference ships dense retrieval only; `rag_demo`
  * corpus search generalized to the SMART vector-space model).
  *
  * Weighting: doc side tf·idf with idf(t) = ln((N+1)/(df+1)) + 1
  * (the smoothed, always-positive sklearn variant), cosine-normalized
  * by the FULL document vector norm; query side binary (one unit per
  * distinct query term), normalized by √|q|. Scores therefore live in
  * [0, 1] and equal the true cosine between the tf-idf doc vector and
  * the binary query vector.
  *
  * Execution shape — the index-BUILD shape, not the per-query shape:
  * unlike [[Bm25.search]] (whose norm-free scoring needs only the query
  * terms' tfs and is a pure per-row scan), the cosine norm needs every
  * term's idf, so the corpus is exploded once into (id, term, tf)
  * [[vectorize]] and joined against the vocab-bounded idf table. That
  * is ONE corpus-sized shuffle with map-side-combined tf aggregation
  * plus ONE per-doc reduction carrying two longs — at 100 TB the
  * vectorized projection is persisted once (bucketed by id,
  * `sources/Layout`) and each query reuses it, exactly like a served
  * tf-idf index. Per-term weights quantize to integer micro-units
  * before the per-doc sums (order-proof exact integer reductions; the
  * squared-norm accumulates in DECIMAL(38,0) so 100-TB-scale document
  * counts cannot wrap a 64-bit sum).
  */
object Tfidf {

  /** Sparse tf-idf document vectors: one row per (id, term) with the
    * micro-unit-quantized weight wq = round(tf · idf · 1e6) — the
    * persistable index projection. `idf` rounds to 6 decimals so both
    * engines' ln agree at the comparison precision.
    */
  /** `broadcastIdf = true` (default) broadcasts the per-term idf table —
    * right while the vocabulary fits an executor (tens of millions of
    * terms); a web-scale vocabulary (token-level n-grams, 10⁸+ terms)
    * sets it false and the idf attachment becomes a plain shuffle join
    * on the term key instead, same results.
    */
  def vectorize(docs: DataFrame, idCol: String, textCol: String,
                broadcastIdf: Boolean = true): DataFrame = {
    val id = col(idCol)
    val n = docs.count().toDouble // one driver literal: corpus size
    val tf = docs
      .select(id, explode(T.tokens(lower(col(textCol)))).as("__term"))
      .groupBy(id, col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val idf = tf.groupBy(col("__term"))
      .agg(count(lit(1)).as("__df"))
      .select(col("__term"),
        round(log(lit(n + 1.0) / (col("__df").cast("double") + lit(1.0)))
          + lit(1.0), 6).as("__idf"))
    tf.join(if (broadcastIdf) broadcast(idf) else idf, "__term")
      .select(id, col("__term").as("term"),
        round(col("__tf").cast("double") * col("__idf") * 1000000)
          .cast("long").as("wq"))
  }

  /** Top-k docs for a bag-of-words query under binary-query cosine.
    * Scores rounded to 4 decimals; total order (score desc, id asc).
    */
  def search(docs: DataFrame, idCol: String, textCol: String,
             terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "query must have at least one term")
    val id = col(idCol)
    val vecs = vectorize(docs, idCol, textCol)
    // one per-doc reduction: squared norm (decimal — overflow-proof) and
    // the query dot product (longs; ≤ |q| terms of ~1e9 micro-units)
    val perDoc = vecs.groupBy(id).agg(
      sum(col("wq").cast("decimal(38,0)") * col("wq")).as("__n2"),
      sum(when(col("term").isInCollection(terms), col("wq"))
        .otherwise(lit(0L))).as("__dot"))
    val qNorm = math.sqrt(terms.size.toDouble)
    val scored = perDoc.filter(col("__dot") > 0)
      .select(id,
        (round(col("__dot").cast("double") /
          sqrt(col("__n2").cast("double")) / lit(qNorm), 4) + lit(0.0))
          .as("score"))
    TopK.topK(scored, col("score"), id, k)
  }
}
