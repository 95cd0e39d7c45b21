package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Second-stage reranking for retrieve→rerank stacks: a first-stage
  * retriever (BM25 / dense / hybrid — `Bm25.search`, `VectorStore`)
  * produces a k-bounded candidate list cheaply, then a finer scorer
  * reorders ONLY those candidates. The rerank scorer here is term
  * coverage against an (expanded) query term set — deterministic and
  * integer-exact (hits/|terms| is a small rational, rounded once); a
  * model-based cross-encoder drops into the same join shape via
  * `rag/Generation`'s per-partition model boundary at no plan change.
  *
  * Scale shape: candidates are k rows — they BROADCAST to the corpus
  * scan (one pass fetches candidate texts; no corpus shuffle), scoring
  * is per-row, and the final order is a k-bounded
  * TakeOrderedAndProject. Reference anchor: the coordinator's
  * two-stage gather-then-merge (`coordinator/main.py:76-86`)
  * generalized to heterogeneous scorers.
  */
object Rerank {

  /** Rerank `candidates` (idCol + "score") by coverage of `terms` in
    * the candidate document's text, breaking ties by first-stage score
    * then id. Returns (idCol, score, rerank) — top `k`.
    */
  def rerank(candidates: DataFrame, docs: DataFrame, idCol: String,
             textCol: String, terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty)
    val toks = T.tokens(lower(col(textCol)))
    val hits = terms.map(t => array_contains(toks, t).cast("int"))
      .reduce(_ + _)
    val cov = round(hits.cast("double") / terms.length, 6) + lit(0.0)
    docs.join(broadcast(candidates), idCol)
      .withColumn("rerank", cov)
      .orderBy(col("rerank").desc, col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("score"), col("rerank"))
  }
}
