package graft

import org.apache.spark.sql.functions._
import graft.expressions.ArrayExpressions.sortedIntersectCountF

class ArrayExpressionsSpec extends SparkSpec {

  test("sortedIntersectCountF equals size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { _ =>
      val a = (0 until rnd.nextInt(30)).map(_ => s"t${rnd.nextInt(40)}").distinct.sorted
      val b = (0 until rnd.nextInt(30)).map(_ => s"t${rnd.nextInt(40)}").distinct.sorted
      (a, b)
    }
    val mismatches = rows.toDF("a", "b")
      .select(sortedIntersectCountF(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(mismatches == 0)
  }

  test("empty and disjoint arrays count 0; identical arrays count their size") {
    import spark.implicits._
    val df = Seq(
      (Seq.empty[String], Seq("a", "b")),
      (Seq("a", "b"), Seq.empty[String]),
      (Seq("a", "b"), Seq("c", "d")),
      (Seq("a", "b", "c"), Seq("a", "b", "c"))
    ).toDF("a", "b")
    val got = df.select(sortedIntersectCountF(col("a"), col("b"))).collect().map(_.getInt(0))
    assert(got.toSeq == Seq(0, 0, 0, 3))
  }

  test("interpreted eval agrees with codegen") {
    import spark.implicits._
    val df = Seq((Seq("a", "c", "x"), Seq("b", "c", "x", "z"))).toDF("a", "b")
    val cg = df.select(sortedIntersectCountF(col("a"), col("b"))).head.getInt(0)
    assert(cg == 2)
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.select(sortedIntersectCountF(col("a"), col("b"))).head.getInt(0)
      assert(interp == 2)
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("null input yields null") {
    import spark.implicits._
    val df = Seq((Option.empty[Seq[String]], Some(Seq("a")))).toDF("a", "b")
    assert(df.select(sortedIntersectCountF(col("a"), col("b"))).head.isNullAt(0))
  }
}
