package graft

import org.apache.spark.sql.functions._
import graft.expressions.SrpExpression.srpBandsF

class SrpSpec extends SparkSpec {

  test("SRP bands: deterministic; identical vectors collide in every band") {
    import spark.implicits._
    val v = Seq(0.5f, -0.25f, 1.0f, 0.125f)
    val df = Seq((1L, v), (2L, v)).toDF("id", "v")
      .select(col("id"), srpBandsF(col("v"), 4, 8, seed = 7L).as("bands"))
    val rows = df.collect().map(_.getSeq[Long](1))
    assert(rows(0) == rows(1))
    assert(rows(0).length == 4)
    assert(rows(0).forall(b => b >= 0 && b < 256))
  }

  test("SRP bands: a vector and its negation disagree on every decided bit") {
    import spark.implicits._
    val v = Seq(0.9f, -0.7f, 0.3f, 0.8f, -0.2f, 0.4f)
    val df = Seq((1L, v), (2L, v.map(x => -x))).toDF("id", "v")
      .select(col("id"), srpBandsF(col("v"), 2, 16, seed = 7L).as("bands"))
    val rows = df.orderBy("id").collect().map(_.getSeq[Long](1))
    // sign flips every strictly-nonzero dot; bits where dot==0 exactly are
    // astronomically unlikely with these planes — expect full complement
    (0 until 2).foreach { j =>
      assert((rows(0)(j) ^ rows(1)(j)) == 0xffffL,
        s"band $j: ${rows(0)(j).toBinaryString} vs ${rows(1)(j).toBinaryString}")
    }
  }

  test("SRP recall: near-identical fixture embeddings collide; random pairs mostly don't") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val bands = e.select(col("vec_id"), srpBandsF(col("embedding"), 4, 8, 7L).as("bands"))
    val a = bands.select(col("vec_id").as("ia"), col("bands").as("ba"))
    val b = bands.select(col("vec_id").as("ib"), col("bands").as("bb"))
    val collide = a.join(b, col("ia") < col("ib"))
      .withColumn("hit", size(array_intersect(
        zip_with(col("ba"), sequence(lit(0), lit(3)), (v, i) => concat_ws(":", i, v)),
        zip_with(col("bb"), sequence(lit(0), lit(3)), (v, i) => concat_ws(":", i, v)))) > 0)
      .filter(col("hit"))
      .count()
    val total = e.count()
    val allPairs = total * (total - 1) / 2
    assert(collide > 0, "some near-dup pairs must collide")
    assert(collide < allPairs / 10, s"bucket collisions should be sparse: $collide/$allPairs")
  }
}
