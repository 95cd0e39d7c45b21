package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass repetition statistics over a string array:
  * `(n, n_distinct, max_repeat, rep_chars, total_chars)` — one HashMap
  * pass per row, O(n).
  *
  * The declarative forms (`TextFunctions.{maxRepeatHof,
  * repeatedCharFractionHof}`) rescan the array once per DISTINCT element
  * (`transform(array_distinct(a), g -> size(filter(a, x -> x = g)))`),
  * which is O(d·n) in INTERPRETED lambda evals — measured 50 ms/doc at
  * sf0.1 (q_repetition 252 s). This kernel replaces the per-row loop;
  * the HOF forms remain the semantic spec, agreement-tested in
  * TextFunctionsSpec. `rep_chars`/`total_chars` count characters
  * (`UTF8String.numChars`, = Spark's `length`), matching the oracle's
  * `length()`.
  */
case class RepeatStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = RepeatStats.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"RepeatStats requires ARRAY<STRING>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // n * 2 as a plain Int overflows negative past ~1B elements; clamp.
    val cap = math.min(n.toLong * 2, (Int.MaxValue - 8).toLong).toInt
    val counts = new java.util.HashMap[UTF8String, Int](cap)
    var total = 0L
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      total += s.numChars()
      counts.merge(s, 1, (a: Int, b: Int) => a + b)
      i += 1
    }
    var maxRep = 0
    var repChars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      if (c > maxRep) maxRep = c
      if (c >= 2) repChars += e.getKey.numChars().toLong * c
    }
    new GenericInternalRow(
      Array[Any](n, counts.size(), maxRep, repChars, total))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepeatStats {
  val schema: StructType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("max_repeat", IntegerType, nullable = false),
    StructField("rep_chars", LongType, nullable = false),
    StructField("total_chars", LongType, nullable = false)))

  /** Repetition stats struct over a string-array column. */
  def repeatStatsF(arr: Column): Column =
    GraftShim.column(RepeatStats(GraftShim.expression(arr)))
}
