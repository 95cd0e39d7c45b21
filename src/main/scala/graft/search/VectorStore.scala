package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.FloatVectorExpressions.dotF
import graft.functions.{HashFunctions, VectorFunctions => V}
import graft.operators.TopK

/** The reference's queryable surface (O1–O9) as an immutable Dataset facade:
  * insert (validate + normalize + route), top-k search (cosine / l2),
  * count / health — SURVEY.md §2.1.
  *
  * Shards = an explicit `shard` column from the exact md5-mod-N replica
  * (`coordinator/main.py:43-45`); searches scan all shards like the
  * reference's full fanout (`coordinator/main.py:61-65`) but Catalyst
  * prunes columns/partitions and `TakeOrderedAndProject` gives the
  * two-phase shard-topk + coordinator-merge for free. At cluster scale the
  * backing data would be written bucketed by `shard`.
  */
final class VectorStore private (
    val vectors: DataFrame, val dim: Int, val numShards: Int) {

  import VectorStore._

  /** O1+O2+O3: validated, normalized, routed append. Rows with a wrong
    * dimension fail the batch (the reference 400s them,
    * `shard/server.py:62-64`).
    */
  def insert(batch: DataFrame): VectorStore =
    new VectorStore(
      vectors.unionByName(VectorStore.prepare(batch, dim, numShards)),
      dim, numShards)

  /** O4–O8: top-k scan. `metric` ∈ {cosine, l2}; k ∈ [1,1000] like the
    * reference (`coordinator/main.py:30-31`). Returns {id, score} sorted
    * score desc, id asc (deterministic tie-break the reference lacks).
    */
  def search(query: Seq[Float], k: Int, metric: String = "cosine"): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1,1000], got $k")
    require(metric == "cosine" || metric == "l2", s"unknown metric: $metric")
    require(query.length == dim, s"query dim ${query.length} != $dim")
    val qn = {
      val n = math.max(math.sqrt(query.map(x => x.toDouble * x).sum), V.NormEps)
      query.map(x => (x / n).toFloat)
    }
    val score = metric match {
      // stored rows are unit vectors, query normalized → cosine = dot
      case "cosine" => dotF(col("embedding"), typedLit(qn))
      // declared l2 contract: -||x - q||² (x stored-normalized, q raw) =
      // -(1 - 2·x·q + ||q||²)  (coordinator/main.py:75, flat_kernels.cu:44)
      case "l2" =>
        val q2 = query.map(x => x.toDouble * x).sum
        -(lit(1.0) - lit(2.0) * dotF(col("embedding"), typedLit(query.map(identity))) + lit(q2))
    }
    TopK.topK(vectors.withColumn("score", score), col("score"), col("id"), k)
      .select(col("id"), col("score"))
  }

  /** Radius (range) search: every vector whose QUANTIZED score clears
    * `minScore` — the other half of the similarity-search API surface
    * (FAISS `range_search` / Milvus `radius`); the reference exposes
    * only top-k. The threshold compares the round-6 score (the oracle
    * parity discipline: raw double sums differ between engines at the
    * last ulp, quantized ones don't), ties ordered by id. A pure
    * scan-speed filter + sort — no shuffle beyond the output ordering;
    * unlike top-k the result size is data-dependent, so callers own
    * bounding it (filter more, or compose with `TopK`).
    */
  def searchRange(query: Seq[Float], minScore: Double,
                  metric: String = "cosine"): DataFrame = {
    require(metric == "cosine" || metric == "l2", s"unknown metric: $metric")
    require(query.length == dim, s"query dim ${query.length} != $dim")
    val qn = {
      val n = math.max(math.sqrt(query.map(x => x.toDouble * x).sum), V.NormEps)
      query.map(x => (x / n).toFloat)
    }
    val score = metric match {
      case "cosine" => dotF(col("embedding"), typedLit(qn))
      case "l2" =>
        val q2 = query.map(x => x.toDouble * x).sum
        -(lit(1.0) - lit(2.0) * dotF(col("embedding"), typedLit(query.map(identity))) + lit(q2))
    }
    vectors.withColumn("score", round(score, 6) + lit(0.0))
      .filter(col("score") >= minScore)
      .orderBy(col("score").desc, col("id"))
      .select(col("id"), col("score"))
  }

  /** Delete by id — the operation the reference lacks entirely (its
    * shards are append-only, SURVEY.md §1.1). Immutable-DataFrame
    * formulation: an anti-join filter; at cluster scale this is a
    * broadcast anti-join when the delete set is small, and compaction
    * happens on the next materialization.
    */
  def delete(ids: Seq[String]): VectorStore =
    new VectorStore(
      vectors.filter(!col("id").isInCollection(ids)), dim, numShards)

  /** Upsert = delete-then-insert (last write wins per id). `batch` must
    * carry (id, embedding) like `insert`.
    */
  def upsert(batch: DataFrame): VectorStore = {
    val newIds = broadcast(batch.select(col("id").cast("string").as("__del_id")))
    val kept = vectors.join(newIds, col("id") === col("__del_id"), "left_anti")
    new VectorStore(kept, dim, numShards).insert(batch)
  }

  /** Batched many-queries-at-once search (O4–O8 across a query TABLE):
    * broadcast the queries, score every (vector, query) pair with the
    * codegen dot product, take per-query top-k through the string-id
    * top-k AGGREGATOR (`TopK.topKPerKeyAggStr`): map-side partials keep a
    * k-bounded buffer per (partition, query), so the exchange carries at
    * most partitions × queries × k hits instead of every scored row —
    * the 100 TB shape (the window formulation would shuffle-and-sort all
    * N × Q scored rows). `queries` must have (qid, embedding); returns
    * (qid, id, score), ordered (score desc, id asc) within each qid.
    */
  def searchBatch(queries: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1,1000], got $k")
    val qn = queries.select(col("qid").cast("long").as("qid"),
      col("embedding").as("qe"),
      greatest(sqrt(dotF(col("embedding"), col("embedding"))),
        lit(V.NormEps)).as("__nq"))
    // stored rows are unit vectors → cosine = dot / |q|
    val scored = vectors.crossJoin(broadcast(qn))
      .select(col("qid"), col("id"),
        (dotF(col("embedding"), col("qe")) / col("__nq")).as("score"))
    TopK.topKPerKeyAggStr(scored, Seq(col("qid")), col("score"), col("id"), k)
      .select(col("qid"), col("id"), col("score"))
  }

  /** Materialize the backing DataFrame and truncate its lineage (used by
    * the streaming ingest path to bound plan growth across micro-batches).
    */
  def checkpointed(): VectorStore =
    new VectorStore(vectors.localCheckpoint(), dim, numShards)

  /** O9: total count. */
  def count(): Long = vectors.count()

  /** O9 health: rows per shard. */
  def health(): DataFrame =
    vectors.groupBy(col("shard"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .orderBy(col("shard"))
}

object VectorStore {

  /** Empty store of a given dimension/shard count. */
  def create(spark: SparkSession, dim: Int, numShards: Int = 8): VectorStore = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.types.StructField("shard", org.apache.spark.sql.types.LongType)))
    new VectorStore(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
      dim, numShards)
  }

  /** Wrap an existing (id, embedding) DataFrame, normalizing + routing. */
  def fromDataFrame(df: DataFrame, idCol: String, vecCol: String,
                    dim: Int, numShards: Int = 8): VectorStore = {
    val spark = df.sparkSession
    create(spark, dim, numShards).insert(
      df.select(col(idCol).cast("string").as("id"), col(vecCol).as("embedding")))
  }

  /** The O1+O2+O3 ingest transform as a PURE column projection:
    * dim-validate (the reference 400s bad rows, `shard/server.py:62-64`),
    * L2-normalize, md5-mod-N shard-route. Stateless per-row, so the same
    * transform serves batch `insert` and the durable streaming sink
    * (`Streaming.streamInsertDurable`). Output: (id, embedding, shard),
    * plus any `keepCols` passed through verbatim — the metadata columns
    * (lang, source, tenant, …) filtered serving needs in the table.
    */
  def prepare(batch: DataFrame, dim: Int, numShards: Int,
              keepCols: Seq[String] = Nil): DataFrame =
    batch
      .withColumn("embedding",
        when(size(col("embedding")) === dim, col("embedding"))
          .otherwise(raise_error(concat(
            lit(s"dim mismatch: expected $dim, got "),
            size(col("embedding")).cast("string")))))
      // norm in its own column so it's computed once per row, not once
      // per element inside the transform lambda
      .withColumn("__n", greatest(sqrt(dotF(col("embedding"), col("embedding"))),
        lit(V.NormEps)))
      .withColumn("embedding",
        transform(col("embedding"), x => (x.cast("double") / col("__n")).cast("float")))
      .withColumn("shard", HashFunctions.shardHash(col("id"), numShards))
      .select(("id" +: "embedding" +: "shard" +: keepCols).map(col): _*)

  /** Re-open a durable ingest table (rows already `prepare`d — written by
    * `Streaming.streamInsertDurable`) as a queryable store. The parquet
    * read honors the file sink's `_spark_metadata` commit log, so a
    * killed-mid-batch writer never contributes partial files.
    */
  def openDurable(spark: SparkSession, tablePath: String,
                  dim: Int, numShards: Int = 8): VectorStore =
    new VectorStore(spark.read.parquet(tablePath), dim, numShards)
}
