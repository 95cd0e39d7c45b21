package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** |A ∩ B| for two SORTED, DISTINCT string arrays, via a single merge pass —
  * the hot kernel of pairwise Jaccard dedup (`graft.operators.Dedup`).
  *
  * `size(array_intersect(a, b))` builds a hash set and materializes the
  * intersection array for every pair; over an O(n²) blocked self-join that
  * allocation dominates the runtime (sf0.1 bench: q_ngram_jaccard spent its
  * 26 s there). A merge over pre-sorted inputs does the same count with zero
  * allocation. Sorting happens once per row (array_sort at shingle build),
  * not once per pair — the classic sort-once/merge-many trade.
  *
  * Inputs MUST be sorted ascending by UTF8String binary order (what
  * `array_sort` produces) and duplicate-free (what `array_distinct`
  * produces); `Dedup.shingles` guarantees both. Result is then identical to
  * `size(array_intersect(a, b))` — tested for agreement in DedupSpec.
  *
  * Both interpreted `eval` and `doGenCode` paths are implemented and tested
  * for agreement (the CPU⇄GPU dual-path discipline of the reference,
  * `shard/server.py:25-38`).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"SortedIntersectCount requires ARRAY<STRING> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $nx = $x.numElements();
         |int $ny = $y.numElements();
         |int $i = 0, $j = 0, $n = 0;
         |while ($i < $nx && $j < $ny) {
         |  int $c = $x.getUTF8String($i).compareTo($y.getUTF8String($j));
         |  if ($c == 0) { $n++; $i++; $j++; }
         |  else if ($c < 0) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayExpressions {
  /** Merge-count of common elements of two sorted distinct string arrays. */
  def sortedIntersectCountF(a: Column, b: Column): Column =
    GraftShim.column(SortedIntersectCount(
      GraftShim.expression(a), GraftShim.expression(b)))
}
