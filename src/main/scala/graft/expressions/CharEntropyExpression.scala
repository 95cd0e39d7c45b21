package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character-level Shannon entropy of a string, in integer MICRO-NATS:
  * Σ over distinct code points c of round((k_c/N)·ln(N/k_c)·10⁶) — the
  * cheap gibberish / binary-junk / repeated-filler detector a corpus
  * quality pass runs before anything tokenizes (near-zero entropy =
  * one character repeated; English prose sits around 2.8–3.2 nats).
  *
  * Each term is quantized to micro-nats BEFORE the sum, so the result
  * is an exact integer sum — independent of hash-map iteration order
  * here and of GROUP BY order in the DuckDB oracle (the same
  * round-after-scale-up discipline as `Bm25`'s idf micro-units).
  * Rounding is half-away-from-zero on a positive value
  * (`floor(x + 0.5)`), matching DuckDB `CAST(ROUND(x, 0) AS BIGINT)`.
  * One HashMap pass per row, O(len); empty input → 0.
  *
  * The declarative twin (`TextFunctions.charEntropyMicroHof`) is the
  * semantic spec — O(distinct·len) interpreted lambda evals, agreement-
  * tested in TextFunctionsSpec, never the scale path (the RepeatStats
  * lesson: HOF kernels cost ~ms/doc).
  */
case class CharEntropy(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"CharEntropy requires STRING, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new java.util.HashMap[Integer, Int]()
    var i = 0
    var n = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1, (a: Int, b: Int) => a + b)
      i += Character.charCount(cp)
      n += 1
    }
    if (n == 0) 0L
    else {
      var micro = 0L
      val it = counts.values().iterator()
      while (it.hasNext) {
        val k = it.next().toInt
        val t = (k.toDouble / n) * math.log(n.toDouble / k)
        micro += math.floor(t * 1e6 + 0.5).toLong
      }
      micro
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropy {
  /** Micro-nat character entropy of a string column. */
  def charEntropyF(text: Column): Column =
    GraftShim.column(CharEntropy(GraftShim.expression(text)))
}
