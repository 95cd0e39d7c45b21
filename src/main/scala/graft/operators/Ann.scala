package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.FloatVectorExpressions.dotF
import graft.functions.{VectorFunctions => V}

/** Approximate nearest-neighbor search: IVF (inverted-file) coarse
  * quantization over the embedding column.
  *
  * The reference only ever does flat full scans (its README mentions
  * IVF/HNSW merely as corpus text, `rag_demo/ingest.py:13-14`); this is
  * the scale path a 100 TB corpus needs: score only the cells the query
  * probes instead of every row.
  *
  * Design for scale: cell assignment is a per-row broadcast-join compute
  * (no shuffle); the assigned table would be written bucketed by cell_id
  * so a probe reads only matching buckets (partition pruning). Centroid
  * "training" here is deterministic — take the first C vectors — so the
  * DuckDB oracle replicates the whole pipeline exactly; swap in k-means
  * centroids at no API change.
  */
object Ann {

  /** Assign each vector to its nearest centroid by cosine (tie: lowest
    * centroid id). `centroids` must be small (it is broadcast).
    * Output: all `vectors` columns + `cell_id`.
    *
    * Assignment orders on the score QUANTIZED to 6 decimals: double
    * summation order differs between engines (and between partitionings),
    * so comparing unrounded sums makes near-tie assignments flip in the
    * last ulp; on the rounded value the (score, centroid-id) order is a
    * stable total order that the DuckDB oracle reproduces exactly.
    */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame, idCol: String,
                vecCol: String, centIdCol: String, centVecCol: String): DataFrame = {
    // norms once per row / per centroid, codegen dot per pair — identical
    // arithmetic to V.cosine (same operand order), ~10× the interpreted
    // HOF formulation over the row × centroid cross product
    val vn = vectors.withColumn("__nv",
      greatest(sqrt(dotF(col(vecCol), col(vecCol))), lit(V.NormEps)))
    val cn = centroids.withColumn("__nc",
      greatest(sqrt(dotF(col(centVecCol), col(centVecCol))), lit(V.NormEps)))
    val scored = vn.crossJoin(broadcast(cn))
      .withColumn("__c",
        round(dotF(col(vecCol), col(centVecCol)) / (col("__nv") * col("__nc")), 6))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__c").desc, col(centIdCol).asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(vectors.columns.toIndexedSeq.map(col) :+ col(centIdCol).as("cell_id"): _*)
  }

  /** Persist an assigned vector table as an on-disk IVF index: one
    * directory per cell. A probe then reads ONLY the probed cells'
    * files via partition pruning — the disk-backed equivalent of "scan
    * only the cells the query probes" (AnnSpec asserts PartitionFilters
    * in the probe plan).
    */
  def writeIvfIndex(assigned: DataFrame, path: String): Unit =
    graft.sources.Layout.writePartitioned(assigned, path, "cell_id")

  /** Scan only the given cells of an on-disk IVF index. */
  def readIvfCells(spark: org.apache.spark.sql.SparkSession, path: String,
                   cells: Seq[Long]): DataFrame =
    graft.sources.Layout.readPartitions(spark, path, "cell_id", cells)

  /** End-to-end IVF search: assign → probe → scan only probed cells →
    * top-k. `nProbes` trades recall for scan fraction (nProbes = #cells
    * is exact search). Returns (id, score) rows, score desc.
    */
  def search(vectors: DataFrame, centroids: DataFrame, idCol: String,
             vecCol: String, centIdCol: String, centVecCol: String,
             query: Seq[Float], nProbes: Int, k: Int): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val assigned = ivfAssign(vectors, centroids, idCol, vecCol, centIdCol, centVecCol)
    val qdf = Seq(Tuple1(query)).toDF("qe")
    val probes = probeCells(centroids, qdf, centIdCol, centVecCol, nProbes)
    val cand = assigned.join(broadcast(probes), "cell_id")
      .withColumn("__nv", greatest(sqrt(dotF(col(vecCol), col(vecCol))), lit(V.NormEps)))
    val qn = math.max(math.sqrt(query.map(x => x.toDouble * x).sum), V.NormEps)
    val scored = cand.withColumn("score",
      dotF(col(vecCol), typedLit(query)) / (col("__nv") * lit(qn)))
    TopK.topK(scored, col("score"), col(idCol), k)
      .select(col(idCol).as("id"), col("score"))
  }

  /** The `nProbes` nearest centroids to a single-row query DataFrame whose
    * one column is the query vector. Same quantized ordering as
    * `ivfAssign`.
    */
  def probeCells(centroids: DataFrame, queryDf: DataFrame,
                 centIdCol: String, centVecCol: String, nProbes: Int): DataFrame = {
    val qCol = col(queryDf.columns.head)
    centroids.crossJoin(broadcast(queryDf))
      .withColumn("__c", round(V.cosine(col(centVecCol), qCol), 6))
      .orderBy(col("__c").desc, col(centIdCol).asc)
      .limit(nProbes)
      .select(col(centIdCol).as("cell_id"))
  }
}
