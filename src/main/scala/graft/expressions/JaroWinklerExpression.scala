package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity — the record-linkage string metric the
  * reference's exact-match doc store has no answer for (its O14 doc-store
  * lookups are id-exact; fuzzy entity reconciliation needs a typo-tolerant
  * scorer beside Levenshtein/`q_edit_distance`).
  *
  * Semantics pinned to the public definition DuckDB's
  * `jaro_winkler_similarity` implements (probed empirically, see
  * JaroWinklerSpec): Jaro on the standard match window
  * floor(max(l1,l2)/2)-1 with half transpositions; the Winkler prefix
  * boost (scale 0.1, prefix capped at 4) applies only when jaro > 0.7;
  * either side empty → 0.0 (including both-empty). Comparison is by
  * UTF-16 code unit, which coincides with codepoints for the BMP text the
  * fixtures hold.
  *
  * Raw doubles out: the ratio arithmetic ((m/l1 + m/l2 + (m-t)/m) / 3)
  * uses one fixed association shared by the oracle's own implementation,
  * and callers quantize at the query site (round6 discipline) before any
  * threshold or hash compare.
  *
  * Single-pass JVM loop (CodegenFallback, one virtual call per row, no
  * per-row allocation beyond two bitsets) — same rationale as the other
  * native kernels in this package (TextHashExpressions scaladoc).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"JaroWinkler requires (STRING, STRING), got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val s1 = l.asInstanceOf[UTF8String].toString
    val s2 = r.asInstanceOf[UTF8String].toString
    JaroWinkler.similarity(s1, s2)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** DuckDB-agreeing Jaro-Winkler on UTF-16 code units. */
  def similarity(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars, in order, that disagree
    var t = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(j)) j += 1
        if (s1.charAt(i) != s2.charAt(j)) t += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t / 2) / md) / 3.0
    if (jaro > 0.7) {
      var p = 0
      val maxP = math.min(4, math.min(l1, l2))
      while (p < maxP && s1.charAt(p) == s2.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }

  /** Column wrapper. */
  def jaroWinklerF(a: Column, b: Column): Column =
    GraftShim.column(JaroWinkler(
      GraftShim.expression(a), GraftShim.expression(b)))
}
