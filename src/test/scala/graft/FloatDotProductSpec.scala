package graft

import org.apache.spark.sql.functions._
import graft.expressions.FloatVectorExpressions.dotF
import graft.functions.{VectorFunctions => V}

class FloatDotProductSpec extends SparkSpec {

  test("dotF matches the higher-order-function dot bit-for-bit on fixture data") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val both = e.crossJoin(broadcast(q))
      .select(dotF(col("embedding"), col("qe")).as("fast"),
        V.dot(col("embedding"), col("qe")).as("hof"))
    val mismatches = both.filter(col("fast") =!= col("hof")).count()
    assert(mismatches == 0)
  }

  test("interpreted eval agrees with codegen (reference CPU⇄GPU dual-path analogue)") {
    import spark.implicits._
    val df = Seq((Seq(1.5f, -2.25f, 3.125f), Seq(0.5f, 4.0f, -1.0f))).toDF("a", "b")
    val expected = 1.5 * 0.5 + (-2.25) * 4.0 + 3.125 * (-1.0)
    // codegen path (default)
    val cg = df.select(dotF(col("a"), col("b"))).head.getDouble(0)
    assert(cg == expected)
    // interpreted path
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.select(dotF(col("a"), col("b"))).head.getDouble(0)
      assert(interp == expected)
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("null array input yields null, not a crash") {
    import spark.implicits._
    val df = Seq((Option.empty[Seq[Float]], Some(Seq(1f)))).toDF("a", "b")
    assert(df.select(dotF(col("a"), col("b"))).head.isNullAt(0))
  }

  test("mismatched lengths use the common prefix (validation is the caller's job)") {
    import spark.implicits._
    val df = Seq((Seq(1f, 2f, 9f), Seq(3f, 4f))).toDF("a", "b")
    assert(df.select(dotF(col("a"), col("b"))).head.getDouble(0) == 11.0)
  }
}
