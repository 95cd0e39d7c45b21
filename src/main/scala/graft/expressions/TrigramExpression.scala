package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native normalize-and-trigram kernel for `operators.TrigramLm`: one
  * JVM pass lowercases, folds non-[a-z0-9] runs to single spaces, trims,
  * and emits the overlapping character trigrams. The HOF spec
  * (`TrigramLm.trigramsHof`) evaluates the normalize regex chain once
  * PER ARRAY ELEMENT inside its lambda (O(len²) regex work per row —
  * the interpreted-lambda trap); this kernel is O(len) with zero regex.
  * Lowercasing delegates to UTF8String.toLowerCase, the same call
  * Spark's `lower` makes, so agreement holds beyond ASCII
  * (TrigramLmSpec asserts kernel ⇄ HOF equality on the fixture).
  */
case class Trigrams(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"Trigrams requires STRING, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val lowered = input.asInstanceOf[UTF8String].toLowerCase.toString
    val sb = new java.lang.StringBuilder(lowered.length)
    var pendingSpace = false
    var i = 0
    while (i < lowered.length) {
      val c = lowered.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      } else {
        pendingSpace = true // any other char folds into one separator
      }
      i += 1
    }
    val t = sb.toString // leading/trailing separators never appended = trim
    val n = t.length
    if (n < 3) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](n - 2)
      var j = 0
      while (j < n - 2) {
        out(j) = UTF8String.fromString(t.substring(j, j + 3))
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Trigrams =
    copy(child = newChild)
}

object TrigramExpression {
  /** Column wrapper for the native kernel. */
  def trigramsF(text: Column): Column =
    GraftShim.column(Trigrams(GraftShim.expression(text)))
}
