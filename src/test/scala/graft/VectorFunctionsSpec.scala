package graft

import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

class VectorFunctionsSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def one(vec: Seq[Float], other: Seq[Float]) = {
    import spark.implicits._
    Seq((vec, other)).toDF("a", "b")
  }

  test("dot matches hand-computed value") {
    val r = one(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))
      .select(V.dot(col("a"), col("b"))).head.getDouble(0)
    assert(math.abs(r - 32.0) < 1e-12)
  }

  test("l2Normalize produces unit vectors; idempotent") {
    val df = one(Seq(3f, 4f), Seq(0f, 0f))
    val n1 = df.select(sqrt(V.norm2(V.l2Normalize(col("a"))))).head.getDouble(0)
    assert(math.abs(n1 - 1.0) < 1e-9)
    val twice = df.select(sqrt(V.norm2(V.l2Normalize(V.l2Normalize(col("a"))))))
      .head.getDouble(0)
    assert(math.abs(twice - 1.0) < 1e-9)
  }

  test("zero vector survives the 1e-12 epsilon guard (no NaN/Inf)") {
    val r = one(Seq(0f, 0f), Seq(1f, 0f))
      .select(V.l2Normalize(col("a")), V.cosine(col("a"), col("b")))
      .head
    val normed = r.getSeq[Double](0)
    assert(normed.forall(v => !v.isNaN && !v.isInfinite))
    assert(r.getDouble(1) == 0.0) // cosine with zero vector = 0, not NaN
  }

  test("cosine of a vector with itself is 1") {
    val r = one(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f))
      .select(V.cosine(col("a"), col("b"))).head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("negSqL2 matches brute force") {
    val r = one(Seq(1f, 2f), Seq(3f, 5f))
      .select(V.negSqL2(col("a"), col("b"))).head.getDouble(0)
    assert(math.abs(r - (-(4.0 + 9.0))) < 1e-12)
  }

  test("refL2Score equals -||normalize(x) - q||^2 (the reference CPU path)") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val x = Array.fill(16)(rnd.nextFloat() * 2 - 1)
      val q = Array.fill(16)(rnd.nextFloat() * 2 - 1)
      val nx = math.max(math.sqrt(x.map(v => v.toDouble * v).sum), 1e-12)
      val xn = x.map(_ / nx)
      val expected = -xn.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
      val got = one(x.toSeq.map(_.toFloat), q.toSeq.map(_.toFloat))
        .select(V.refL2Score(col("a"), col("b"))).head.getDouble(0)
      assert(math.abs(got - expected) < 1e-9, s"got $got expected $expected")
    }
  }

  test("l2-on-normalized is rank-equivalent to cosine (SURVEY §1.2 quirk)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 50).map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat())))
      .toDF("id", "v")
    val q = Seq.fill(8)(rnd.nextFloat())
    val qn = { val n = math.sqrt(q.map(x => x.toDouble * x).sum); q.map(_ / n) }
    val scored = vecs.select(col("id"),
      V.cosine(col("v"), typedLit(qn)).as("cos"),
      V.negSqL2(V.l2Normalize(col("v")), typedLit(qn)).as("l2n"))
    val byCos = scored.orderBy(desc("cos"), col("id")).select("id").collect.map(_.getLong(0))
    val byL2 = scored.orderBy(desc("l2n"), col("id")).select("id").collect.map(_.getLong(0))
    assert(byCos.sameElements(byL2))
  }
}
