package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Minimal-window proximity: the length of the shortest token window
  * containing ALL query terms at least once — the classic relevance
  * feature next to term-frequency scoring (BM25 knows the terms are
  * there; min-span knows they are TOGETHER). NULL when any term is
  * absent.
  *
  * One O(n·k) scan per row (n tokens, k query terms): track the last
  * position of each term; every time a term occurs and all terms have
  * been seen, `pos − min(last) + 1` is the tightest window ending
  * here, and the row minimum over ends is exact (any optimal window
  * ends at some term occurrence). No shuffle — a pure per-row kernel
  * fed by the same token arrays the BM25 scorer reads.
  */
case class MinSpan(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"MinSpan requires (ARRAY<STRING>, ARRAY<STRING>), got $other")
    }

  override protected def nullSafeEval(toksAny: Any, termsAny: Any): Any = {
    val toks = toksAny.asInstanceOf[ArrayData]
    val terms = termsAny.asInstanceOf[ArrayData]
    val k = terms.numElements()
    if (k == 0) return null
    val termArr = new Array[UTF8String](k)
    var t = 0
    while (t < k) { termArr(t) = terms.getUTF8String(t); t += 1 }
    val last = Array.fill(k)(-1)
    var seen = 0
    var best = Long.MaxValue
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val tok = toks.getUTF8String(i)
      var j = 0
      while (j < k) {
        if (termArr(j).equals(tok)) {
          if (last(j) < 0) seen += 1
          last(j) = i
        }
        j += 1
      }
      if (seen == k) {
        var mn = Int.MaxValue
        var m = 0
        while (m < k) { if (last(m) < mn) mn = last(m); m += 1 }
        val span = (i - mn + 1).toLong
        if (span < best) best = span
      }
      i += 1
    }
    if (best == Long.MaxValue) null else best
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MinSpan {
  /** Min covering-window length of `terms` within the token array. */
  def minSpanF(toks: Column, terms: Column): Column =
    GraftShim.column(MinSpan(GraftShim.expression(toks), GraftShim.expression(terms)))
}
