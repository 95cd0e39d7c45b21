package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {

  test("saltedInnerJoin equals the plain inner join, including skewed and missing keys") {
    import spark.implicits._
    // hot key 1 (1000 rows), cold keys, and a dangling key 99 with no match
    val left = ((1 to 1000).map(i => (1L, i)) ++ Seq((2L, 1), (3L, 1), (99L, 1)))
      .toDF("k", "payload")
    val right = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "unused")).toDF("rk", "v")
    val salted = SkewJoin.saltedInnerJoin(left, right, col("k"), col("rk"), 8,
      xxhash64(col("k"), col("payload")))
      .select(col("k"), col("payload"), col("v"))
    val plain = left.join(right, col("k") === col("rk"))
      .select(col("k"), col("payload"), col("v"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt actually spreads a hot key across multiple partitions of the join key space") {
    import spark.implicits._
    val left = (1 to 512).map(i => (1L, i)).toDF("k", "payload")
    val salts = left
      .withColumn("salt", pmod(xxhash64(col("k"), col("payload")), lit(8)))
      .select("salt").distinct().count()
    assert(salts == 8, "deterministic salt should hit all 8 buckets on 512 rows")
  }
}
