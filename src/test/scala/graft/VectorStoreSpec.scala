package graft

import org.apache.spark.sql.functions._
import graft.search.VectorStore

class VectorStoreSpec extends SparkSpec {

  private def store = {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    VectorStore.fromDataFrame(e, "vec_id", "embedding", 64)
  }

  test("fromDataFrame normalizes every stored vector to unit length") {
    import graft.functions.{VectorFunctions => V}
    val norms = store.vectors
      .select(sqrt(V.norm2(col("embedding"))).as("n"))
      .agg(min("n"), max("n")).head
    assert(math.abs(norms.getDouble(0) - 1.0) < 1e-5)
    assert(math.abs(norms.getDouble(1) - 1.0) < 1e-5)
  }

  test("search cosine returns self as top hit with score ≈ 1") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val q = e.filter(col("vec_id") === 17).select("embedding")
      .head.getSeq[Float](0)
    val top = store.search(q, 5, "cosine").head
    assert(top.getString(0) == "17")
    assert(math.abs(top.getDouble(1) - 1.0) < 1e-5)
  }

  test("searchRange returns exactly the vectors clearing the threshold, self included") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val q = e.filter(col("vec_id") === 17).select("embedding")
      .head.getSeq[Float](0)
    val hits = store.searchRange(q, 0.5, "cosine").collect()
    assert(hits.head.getString(0) == "17") // self clears any θ ≤ 1
    assert(hits.forall(_.getDouble(1) >= 0.5))
    // agreement with top-k: the θ-clearing set is a prefix of the ranking
    val topIds = store.search(q, hits.length, "cosine")
      .collect().map(_.getString(0)).toSeq
    assert(hits.map(_.getString(0)).toSeq == topIds)
    intercept[IllegalArgumentException](store.searchRange(q, 0.5, "dotty"))
  }

  test("search validates k range and metric name (reference O19)") {
    intercept[IllegalArgumentException](store.search(Seq.fill(64)(1f), 0))
    intercept[IllegalArgumentException](store.search(Seq.fill(64)(1f), 1001))
    intercept[IllegalArgumentException](store.search(Seq.fill(64)(1f), 5, "dotty"))
    intercept[IllegalArgumentException](store.search(Seq.fill(3)(1f), 5))
  }

  test("insert rejects wrong-dimension rows (reference 400s them)") {
    import spark.implicits._
    val bad = Seq(("x", Seq(1f, 2f))).toDF("id", "embedding")
    val ex = intercept[Exception] {
      store.insert(bad).count()
    }
    assert(ex.getMessage != null)
  }

  test("count and health reflect inserts; shard routing matches md5 replica") {
    val s = store
    assert(s.count() == 500)
    val h = s.health().collect()
    assert(h.map(_.getLong(1)).sum == 500)
    assert(h.length <= 8)
  }

  test("cosine and l2 rank self-match first for a stored vector's raw query") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val q = e.filter(col("vec_id") === 99).select("embedding").head.getSeq[Float](0)
    assert(store.search(q, 3, "l2").head.getString(0) == "99")
  }

  test("delete removes ids; upsert replaces an existing vector (last write wins)") {
    import spark.implicits._
    val s = store
    val deleted = s.delete(Seq("5", "7"))
    assert(deleted.count() == 498)
    assert(deleted.search(Seq.fill(64)(0.1f), 500).filter(col("id") === "5").isEmpty)

    // upsert id 5 with a distinctive direction: it must come back first
    val dir = Array.fill(64)(0.0f); dir(0) = 1.0f
    val up = s.upsert(Seq(("5", dir.toSeq)).toDF("id", "embedding"))
    assert(up.count() == 500)
    val hit = up.search(dir.toSeq, 1).head
    assert(hit.getString(0) == "5" && math.abs(hit.getDouble(1) - 1.0) < 1e-6)
  }

  test("searchBatch returns per-query top-k matching single-query search") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val queries = e.filter(col("vec_id").isin(3L, 11L))
      .select(col("vec_id").as("qid"), col("embedding"))
    val batch = store.searchBatch(queries, 5)
    assert(batch.count() == 10)
    val q3 = e.filter(col("vec_id") === 3).head.getSeq[Float](1)
    val single = store.search(q3, 5).collect().map(_.getString(0)).toSeq
    val fromBatch = batch.filter(col("qid") === 3)
      .orderBy(col("score").desc, col("id"))
      .collect().map(_.getString(1)).toSeq
    assert(fromBatch == single)
    // the batched path must take the partial-aggregation route (k-bounded
    // buffers through the exchange), not a full window sort of all N×Q rows
    val plan = batch.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"searchBatch must plan as ObjectHashAggregate:\n$plan")
    assert(!plan.contains("Window"), s"searchBatch must not window-sort:\n$plan")
  }
}
