package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-subsequence LENGTH of two token arrays — the core of
  * ROUGE-L (Lin 2004), the summarization/compression QA companion to
  * BLEU's n-gram precision (`graft.operators.TextEval`): LCS rewards
  * in-order coverage without requiring contiguity, so a candidate that
  * reorders or paraphrases locally still scores while a shuffled
  * bag-of-words does not.
  *
  * Classic rolling one-row DP: dp[i] after consuming k reference tokens
  * is LCS(cand[1..i], ref[1..k]); each reference token updates the row
  * in place, carrying the previous diagonal in one scalar. O(m·n) time,
  * O(m) space, zero allocation beyond the single int row — per-pair
  * kernel compute, no shuffle implications whatsoever. The declarative
  * twin (`TextEval.lcsLengthHof`) expresses the same recurrence via
  * aggregate/transform HOFs for agreement testing, but its prefix-max
  * formulation is O(m²·n) — spec-only, never the hot path.
  *
  * Both interpreted `eval` and `doGenCode` paths are implemented and
  * agreement-tested (the CPU⇄GPU dual-path discipline of the reference,
  * `shard/server.py:25-38`).
  */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"LcsLength requires ARRAY<STRING> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val m = x.numElements()
    val n = y.numElements()
    if (m == 0 || n == 0) return 0
    val row = new Array[Int](m + 1)
    var k = 0
    while (k < n) {
      val rt: UTF8String = y.getUTF8String(k)
      var diag = 0 // dp_old[i-1]
      var i = 1
      while (i <= m) {
        val tmp = row(i) // dp_old[i], next diagonal
        if (x.getUTF8String(i - 1).equals(rt)) row(i) = diag + 1
        else if (row(i - 1) > row(i)) row(i) = row(i - 1)
        diag = tmp
        i += 1
      }
      k += 1
    }
    row(m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val row = ctx.freshName("row")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val diag = ctx.freshName("diag")
      val tmp = ctx.freshName("tmp")
      val rt = ctx.freshName("rt")
      s"""
         |int $m = $x.numElements();
         |int $n = $y.numElements();
         |int[] $row = new int[$m + 1];
         |for (int $k = 0; $k < $n; $k++) {
         |  UTF8String $rt = $y.getUTF8String($k);
         |  int $diag = 0;
         |  for (int $i = 1; $i <= $m; $i++) {
         |    int $tmp = $row[$i];
         |    if ($x.getUTF8String($i - 1).equals($rt)) { $row[$i] = $diag + 1; }
         |    else if ($row[$i - 1] > $row[$i]) { $row[$i] = $row[$i - 1]; }
         |    $diag = $tmp;
         |  }
         |}
         |${ev.value} = ($m == 0) ? 0 : $row[$m];
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LcsExpression {
  /** LCS length of two string arrays (rolling-row DP kernel). */
  def lcsLengthF(a: Column, b: Column): Column =
    GraftShim.column(LcsLength(
      GraftShim.expression(a), GraftShim.expression(b)))
}
