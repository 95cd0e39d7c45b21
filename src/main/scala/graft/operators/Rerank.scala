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

  /** Hard-negative mining for contrastive retriever training (the
    * DPR / SimCSE data-prep step): for every training query, the
    * top-scoring corpus items that are NOT positives are the negatives
    * that actually teach the model — random negatives are too easy.
    * Positives here are label-mates (`labelCol`); anything else scoring
    * high is a hard negative.
    *
    * Scale shape: the query set is small by definition — it BROADCASTS
    * to the corpus scan, scoring is per-row (codegen cosine, quantized
    * round-6), the non-positive filter is evaluated at scan speed, and
    * the per-query top-k runs through `TopKAggregator`'s partial
    * aggregation: the exchange carries at most partitions × queries × k
    * entries, never the corpus. One shuffle total, at any corpus size.
    *
    * `queries`: (qidCol LONG, qVecCol ARRAY<FLOAT>, qLabelCol).
    * Returns (qid, idCol, score) — k negatives per query, ordered
    * (score desc, id) within each query.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, labelCol: String,
                    qidCol: String, qVecCol: String, qLabelCol: String,
                    k: Int): DataFrame = {
    import graft.functions.{VectorFunctions => V}
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(labelCol) =!= col(qLabelCol) && col(idCol) =!= col(qidCol))
      .select(col(qidCol), col(idCol),
        (round(V.cosine(col(vecCol), col(qVecCol)), 6) + lit(0.0)).as("__c"))
    TopK.topKPerKeyAgg(scored, Seq(col(qidCol)), col("__c"), col(idCol), k)
      .select(col(qidCol), col("id").as(idCol), col("score"))
      .orderBy(col(qidCol), col("score").desc, col(idCol))
  }

  /** Maximal Marginal Relevance diversity reranking (Carbonell &
    * Goldstein 1998): greedily pick k results that balance relevance
    * against redundancy with what is already picked —
    *   argmax_d  λ·rel(d) − (1−λ)·max_{s∈selected} cos(d, s)
    * (first pick = pure relevance; ties broken by id). The RAG
    * answer-context assembler's antidote to near-duplicate retrieval
    * hits: the reference's flat top-k (`coordinator/main.py:76-86`)
    * happily returns 10 copies of the same paragraph.
    *
    * Scale shape: the greedy loop is inherently sequential in k, so it
    * runs DRIVER-side over the k-bounded candidate list the distributed
    * first stage already produced (same bounded-collect contract as
    * `Bm25.search`'s stats row — candidates are ≤ a few hundred rows by
    * construction, never the corpus). Pairwise cosines replicate the
    * in-plan kernel bit-for-bit: sequential float→double dot, 1e-12
    * norm floor, HALF_UP round-6 quantization before any comparison —
    * so the selection is engine-exact and partition-independent.
    *
    * `candidates`: (idCol LONG, relCol DOUBLE quantized round-6,
    * vecCol ARRAY<FLOAT>). Returns (rank INT, idCol, mmr) in selection
    * order, mmr rounded to 6.
    */
  def mmr(candidates: DataFrame, idCol: String, relCol: String,
          vecCol: String, k: Int, lambda: Double = 0.7): DataFrame = {
    require(k >= 1 && lambda >= 0.0 && lambda <= 1.0)
    val spark = candidates.sparkSession
    import spark.implicits._
    // 1 − λ via BigDecimal: the IEEE double nearest the DECIMAL value
    // (1.0 - 0.7 in binary is 0.30000000000000004, which is NOT the
    // double an engine parsing "0.3" uses)
    val mu = java.math.BigDecimal.ONE
      .subtract(java.math.BigDecimal.valueOf(lambda)).doubleValue()
    val rows = candidates
      .select(col(idCol).cast("long"), col(relCol).cast("double"), col(vecCol))
      .collect() // k-bounded first-stage output by contract
    val n = rows.length
    val ids = rows.map(_.getLong(0))
    val rel = rows.map(_.getDouble(1))
    val vecs = rows.map(_.getSeq[Float](2).toArray)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      val m = math.min(a.length, b.length)
      var s = 0.0; var i = 0
      while (i < m) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val norms = vecs.map(v => math.max(math.sqrt(dot(v, v)), 1e-12))
    val sim = Array.tabulate(n, n)((i, j) =>
      r6(dot(vecs(i), vecs(j)) / (norms(i) * norms(j))))
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double)]
    val remaining = scala.collection.mutable.SortedSet(0 until n: _*)
    var rank = 1
    while (rank <= math.min(k, n)) {
      val best = remaining.iterator.map { i =>
        val m =
          if (selected.isEmpty) rel(i)
          else lambda * rel(i) - mu * selected.iterator.map(j => sim(i)(j)).max
        (i, m)
      }.minBy { case (i, m) => (-m, ids(i)) }
      out += ((rank, ids(best._1), r6(best._2) + 0.0))
      selected += best._1
      remaining -= best._1
      rank += 1
    }
    out.toSeq.toDF("rank", idCol, "mmr")
  }
}
