package graft

import org.apache.spark.sql.functions._
import graft.operators.TopK

class TopKSpec extends SparkSpec {

  private def randomScores(seed: Int, n: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, rnd.nextDouble())).toDF("id", "score")
  }

  test("topK equals brute-force sort-desc-take-k under (score desc, id asc)") {
    val df = randomScores(1, 500)
    val got = TopK.topK(df, col("score"), col("id"), 10)
      .collect.map(r => (r.getLong(0), r.getDouble(1)))
    val want = df.collect.map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, s) => (-s, id) }.take(10)
    assert(got.sameElements(want))
  }

  test("merge of per-partition top-k equals global top-k (reference's core distributed claim)") {
    // shard-local topk (coordinator/main.py:76-85 semantics) then merge
    val df = randomScores(2, 1000).repartition(8)
    val k = 15
    val perPart = TopK.topKPerKey(
      df.withColumn("part", spark_partition_id()),
      Seq(col("part")), col("score"), col("id"), k)
    val merged = TopK.topK(perPart, col("score"), col("id"), k)
      .select("id", "score").collect.map(r => (r.getLong(0), r.getDouble(1)))
    val global = TopK.topK(df, col("score"), col("id"), k)
      .select("id", "score").collect.map(r => (r.getLong(0), r.getDouble(1)))
    assert(merged.sameElements(global))
  }

  test("ties broken deterministically by id asc (reference would crash here)") {
    import spark.implicits._
    val df = Seq((5L, 1.0), (3L, 1.0), (9L, 1.0), (1L, 0.5)).toDF("id", "score")
    val got = TopK.topK(df, col("score"), col("id"), 3).collect.map(_.getLong(0))
    assert(got.sameElements(Array(3L, 5L, 9L)))
  }

  test("topKPerKey returns k rows per key, highest scores first") {
    import spark.implicits._
    val df = (for (k <- 0 until 5; i <- 0 until 20)
      yield (k, k * 100L + i, i.toDouble)).toDF("key", "id", "score")
    val got = TopK.topKPerKey(df, Seq(col("key")), col("score"), col("id"), 3)
    assert(got.count() == 15)
    val forKey0 = got.filter(col("key") === 0).orderBy(desc("score"))
      .collect.map(_.getDouble(2))
    assert(forKey0.sameElements(Array(19.0, 18.0, 17.0)))
  }
}
