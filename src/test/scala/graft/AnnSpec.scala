package graft

import org.apache.spark.sql.functions._
import graft.expressions.FloatVectorExpressions.dotF
import graft.functions.{VectorFunctions => V}
import graft.operators.{Ann, TopK}

class AnnSpec extends SparkSpec {

  private lazy val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private lazy val cents = e.filter(col("vec_id") < 16)
    .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))

  test("ivfAssign assigns every vector to its max-cosine centroid") {
    import spark.implicits._
    val assigned = Ann.ivfAssign(e, cents, "vec_id", "embedding", "cent_id", "cvec")
    assert(assigned.count() == e.count())
    // brute-force argmax via window on the cross product, quantized the same way
    val scored = e.crossJoin(broadcast(cents))
      .withColumn("c", round(V.cosine($"embedding", $"cvec"), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"vec_id").orderBy($"c".desc, $"cent_id".asc)
    val brute = scored.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"vec_id", $"cent_id".as("cell_id"))
    val diff = assigned.select("vec_id", "cell_id")
      .exceptAll(brute).count()
    assert(diff == 0)
  }

  test("probing ALL cells is exact: equals brute-force top-k") {
    import spark.implicits._
    val query = e.filter($"vec_id" === 42).head.getSeq[Float](1)
    val viaAnn = Ann.search(e, cents, "vec_id", "embedding", "cent_id", "cvec",
      query, nProbes = 16, k = 10).collect().map(_.getLong(0)).toSeq
    val brute = TopK.topK(
      e.withColumn("score", V.cosine($"embedding", typedLit(query))),
      $"score", $"vec_id", 10).collect().map(_.getLong(0)).toSeq
    assert(viaAnn == brute)
  }

  test("recall@10 with 4/16 probes is useful and measured") {
    import spark.implicits._
    val queries = Seq(42L, 7L, 100L, 250L, 333L)
    val recalls = queries.map { qid =>
      val query = e.filter($"vec_id" === qid).head.getSeq[Float](1)
      val ann = Ann.search(e, cents, "vec_id", "embedding", "cent_id", "cvec",
        query, nProbes = 4, k = 10).collect().map(_.getLong(0)).toSet
      val brute = TopK.topK(
        e.withColumn("score", V.cosine($"embedding", typedLit(query))),
        $"score", $"vec_id", 10).collect().map(_.getLong(0)).toSet
      (ann & brute).size.toDouble / brute.size
    }
    val mean = recalls.sum / recalls.size
    info(f"mean recall@10 at 4/16 probes: $mean%.2f (${recalls.map(r => f"$r%.1f").mkString(", ")})")
    assert(mean >= 0.5, s"recall collapsed: $recalls")
  }
}
