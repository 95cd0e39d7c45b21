package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned-sparse (SPLADE-style) vector retrieval over an inverted
  * posting layout — the third retrieval modality next to dense ANN
  * ([[Ann]]) and lexical scoring ([[Bm25]], [[Tfidf]]).
  *
  * The reference serves dense vectors only (`coordinator/main.py:47-86`
  * insert/search on float rows); modern retrieval stacks pair that with
  * a sparse index whose "vector" is a term→weight map produced by a
  * model (SPLADE, uniCOIL) or a weighting scheme (tf-idf — the
  * [[Tfidf.vectorize]] projection plugs in directly). The score is the
  * sparse dot product Σ_t w_doc(t)·w_q(t) over the terms the query and
  * document share.
  *
  * Execution shape — the INVERTED-INDEX shape, not the dense-scan
  * shape: postings live as one row per (id, term, weight). A query
  * touches only its own terms' posting lists, so the scan carries an
  * `IN (query terms)` predicate that Catalyst pushes into the parquet
  * reader (and, with the postings bucketed or partitioned by term via
  * `sources/Layout`, prunes whole files); the only shuffle is the
  * map-side-combined per-doc sum over the SURVIVING postings. At
  * 100 TB the moved bytes are proportional to the query terms' posting
  * lists, never the corpus.
  *
  * Determinism: weights are integer micro-units on both sides (the
  * [[Tfidf.vectorize]] convention), so every contribution is an exact
  * long product (`micro × micro = 1e-12` units) and the per-doc sum is
  * an order-proof integer reduction; the single divide + round happens
  * once at the end. Long headroom: |Σ| ≤ |q| · max(w_doc) · max(w_q) —
  * e.g. 32 terms × 1e9 × 1e7 = 3.2e17, inside the 9.2e18 long range;
  * callers with heavier weights rescale before indexing.
  */
object Sparse {

  /** Top-k docs by sparse dot product against `query` (term →
    * micro-unit weight). Output: (idCol, score) with score =
    * round(Σ/1e12, 6), total order (score desc, id asc); docs sharing
    * no query term score 0 and are omitted (the inverted index never
    * sees them — same contract as [[Tfidf.search]]'s `dot > 0`).
    */
  def sparseSearch(postings: DataFrame, idCol: String, termCol: String,
                   wqCol: String, query: Seq[(String, Long)],
                   k: Int): DataFrame = {
    require(query.nonEmpty, "sparse query must have at least one term")
    require(query.map(_._1).distinct.size == query.size,
      "sparse query terms must be distinct")
    val qMap = typedLit(query.toMap)
    val scored = postings
      // literal IN over the query's terms: pushed to the parquet scan,
      // so only the matching posting lists are ever materialized
      .filter(col(termCol).isInCollection(query.map(_._1)))
      .select(col(idCol),
        (col(wqCol) * element_at(qMap, col(termCol))).as("__c"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("__dot"))
      .filter(col("__dot") > 0)
      // HALF_UP to 6 decimals IN INTEGER SPACE: the dot is an exact
      // micro×micro long, and a double round of dot/1e12 hits .5
      // knife-edges differently across engines (canonical-repr HALF_UP
      // vs multiply-and-round saw 32.2865085 flip at sf0.001). Integer
      // (dot + 5e5) div 1e6 is the same HALF_UP, bit-exact everywhere,
      // and never loses precision past 2^53.
      .select(col(idCol),
        (expr("(__dot + 500000) div 1000000").cast("double") / lit(1e6) +
          lit(0.0)).as("score"))
    TopK.topK(scored, col("score"), col(idCol), k)
  }

  /** Champion-list (static) pruning: keep only the `p` highest-weight
    * postings per term — the classic impact-ordered index truncation
    * that bounds every posting list regardless of how common the term
    * is. Selection runs through the k-bounded two-phase aggregator
    * ([[TopK.topKPerKeyAgg]]), so the exchange carries at most
    * terms × p entries, never the corpus; ties break on id asc so the
    * pruned index is deterministic. Recall trade-off is the caller's:
    * a doc outside every query term's champion list becomes
    * unreachable (the standard static-pruning contract).
    */
  def championPrune(postings: DataFrame, idCol: String, termCol: String,
                    wqCol: String, p: Int): DataFrame =
    TopK.topKPerKeyAgg(postings, Seq(col(termCol)),
        col(wqCol).cast("double"), col(idCol), p)
      .select(col(termCol), col("id").as(idCol),
        col("score").cast("long").as(wqCol))
}
