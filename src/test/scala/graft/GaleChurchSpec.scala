package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.GaleChurchConsts
import graft.expressions.GaleChurchExpression.galeChurchF

/** GaleChurchAlign kernel: hand-computed alignments for every move
  * type, the packed-field decode, interpreted ⇄ codegen agreement, and
  * the input bound.
  */
class GaleChurchSpec extends SparkSpec {
  import spark.implicits._

  private def unpack(p: Long): (Long, Int, Int, Int, Int, Int, Int) =
    ((p >> 30), ((p >> 25) & 31).toInt, ((p >> 20) & 31).toInt,
      ((p >> 15) & 31).toInt, ((p >> 10) & 31).toInt,
      ((p >> 5) & 31).toInt, (p & 31).toInt)

  private def align(src: Seq[Int], tgt: Seq[Int]): (Long, Int, Int, Int, Int, Int, Int) =
    unpack(Seq((src, tgt)).toDF("a", "b")
      .select(galeChurchF(col("a"), col("b"))).head.getLong(0))

  test("identical sequences align all 1-1 at zero cost") {
    assert(align(Seq(10, 12, 30), Seq(10, 12, 30)) == (0L, 3, 0, 0, 0, 0, 0))
  }

  test("dropped middle sentence becomes one 1-0 move") {
    // (cost 350 flat beats forcing the length-mismatched 1-1 chain)
    assert(align(Seq(10, 50, 12), Seq(10, 12)) == (350L, 2, 1, 0, 0, 0, 0))
  }

  test("inserted target sentence becomes one 0-1 move") {
    assert(align(Seq(10), Seq(10, 6)) == (350L, 1, 0, 1, 0, 0, 0))
  }

  test("true concatenation is recovered as 2-1") {
    // rel(50, 51) = 1000/101 = 9; + 300 merge penalty = 309 beats
    // 1-0 + 1-1 (350 + rel(30,51)=259 = 609)
    assert(align(Seq(20, 30), Seq(51)) == (309L, 0, 0, 0, 1, 0, 0))
  }

  test("true split is recovered as 1-2") {
    // rel(61, 60) = 1000/121 = 8; + 300 = 308 beats 0-1 + 1-1 (690)
    assert(align(Seq(61), Seq(30, 30)) == (308L, 0, 0, 0, 0, 1, 0))
  }

  test("2-2 rewrite beats two mismatched 1-1s") {
    // rel(50, 50) + 450 = 450 vs rel(10,25)=428 + rel(40,25)=230 = 658
    assert(align(Seq(10, 40), Seq(25, 25)) == (450L, 0, 0, 0, 0, 0, 1))
  }

  test("empty sides degenerate to pure gap chains") {
    assert(align(Seq.empty, Seq.empty) == (0L, 0, 0, 0, 0, 0, 0))
    assert(align(Seq.empty, Seq(5, 5)) == (700L, 0, 0, 2, 0, 0, 0))
    assert(align(Seq(5, 5, 5), Seq.empty) == (1050L, 0, 3, 0, 0, 0, 0))
  }

  test("more than 31 sentences per side throws (caller must cap)") {
    val long = Seq.fill(32)(10)
    val err = intercept[Exception] {
      Seq((long, Seq(10))).toDF("a", "b")
        .select(galeChurchF(col("a"), col("b"))).head
    }
    assert(err.getMessage.contains("31") ||
      err.getCause.getMessage.contains("31"))
  }

  test("interpreted eval agrees with codegen") {
    val df = Seq((Seq(10, 50, 12, 20, 30), Seq(10, 12, 51, 9)))
      .toDF("a", "b")
    val cg = df.select(galeChurchF(col("a"), col("b"))).head.getLong(0)
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.select(galeChurchF(col("a"), col("b"))).head.getLong(0)
      assert(interp == cg)
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("null input yields null") {
    val df = Seq((Option.empty[Seq[Int]], Some(Seq(1))))
      .toDF("a", "b")
    assert(df.select(galeChurchF(col("a"), col("b"))).head.isNullAt(0))
  }

  test("q_sentence_align fixture construction: the DP recovers the move mix") {
    // One full 7-sentence block, realistic lengths: target = 1,2,4 kept,
    // 3 dropped, 5+6 merged, 7 kept, filler (len 10) inserted.
    val src = Seq(65, 58, 61, 70, 55, 63, 59)
    val tgt = Seq(65, 58, 70, 55 + 1 + 63, 59, 10)
    val (cost, n11, n10, n01, n21, n12, n22) = align(src, tgt)
    assert((n11, n10, n01, n21, n12, n22) == (4, 1, 1, 1, 0, 0))
    // cost = 350 (drop) + rel(118,119)+300 (merge) + 350 (insert)
    assert(cost == 350L + (GaleChurchConsts.rel(118, 119) + 300L) + 350L)
  }
}
