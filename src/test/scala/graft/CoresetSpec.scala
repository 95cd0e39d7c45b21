package graft

import org.apache.spark.sql.functions._
import graft.operators.Coreset

class CoresetSpec extends SparkSpec {

  private def points(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("farthestPointSample: hand-computed greedy picks with tie-break") {
    val df = points(
      (1L, Seq(0f, 0f)),
      (2L, Seq(0.1f, 0f)),
      (3L, Seq(10f, 0f)),
      (4L, Seq(5f, 5f)))
    val out = Coreset.farthestPointSample(df, "vec_id", "embedding", 3)
      .orderBy(col("sel_round")).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    assert(out.map(_.getString(1)).toSeq == Seq("1", "3", "4"))
    assert(out(0).isNullAt(2))               // seed has no prior distance
    assert(out(1).getLong(2) == 1000000L)    // d²(1,3) = 100 → round4·10⁴
    // 4's running min: d²(1,4)=50 vs d²(3,4)=50 → 50
    assert(out(2).getLong(2) == 500000L)
  }

  test("farthestPointSample: k beyond n stops at n picks") {
    val df = points((7L, Seq(0f)), (8L, Seq(1f)), (9L, Seq(4f)))
    val out = Coreset.farthestPointSample(df, "vec_id", "embedding", 10)
    assert(out.count() == 3L)
  }

  test("farthestPointSample is partitioning-invariant on the fixture") {
    val base = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val a = Coreset.farthestPointSample(base.repartition(1),
      "vec_id", "embedding", 4).collect().map(_.toSeq).toSeq
    val b = Coreset.farthestPointSample(base.repartition(7),
      "vec_id", "embedding", 4).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("chosen set 2-approximates the cover: all points within max d4") {
    val base = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val chosen = Coreset.farthestPointSample(base, "vec_id", "embedding", 5)
      .collect()
    val radius = chosen.filter(!_.isNullAt(2)).maxBy(_.getInt(0)).getLong(2)
    // every point's min distance to the chosen set is <= the last pick's
    // selection distance (the Gonzalez invariant behind the 2-approx)
    val ids = chosen.map(_.getString(1).toLong).toSeq
    val centers = base.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val d2 = aggregate(
      zip_with(col("embedding").cast("array<double>"),
        col("ce").cast("array<double>"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)
    val worst = base.crossJoin(centers)
      .select(col("vec_id"),
        round(round(d2, 4) * 10000).cast("long").as("d4"))
      .groupBy(col("vec_id")).agg(min(col("d4")).as("dmin"))
      .agg(max(col("dmin"))).head.getLong(0)
    assert(worst <= radius)
  }
}
