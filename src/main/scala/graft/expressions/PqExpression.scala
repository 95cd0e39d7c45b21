package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native product-quantization encoder: per subspace, the index of the
  * codebook row minimizing the 6-decimal-quantized squared L2 distance
  * over that slice (ties → lowest index). One flat float array of
  * codebooks, plain JVM loops — the declarative spec is
  * `Ann.pqEncodeHof` (interpreted lambda evals cost m·ksub·dsub per
  * row; agreement-tested in AnnSpec).
  *
  * Quantization matches Spark's `round(x, 6)` exactly
  * (BigDecimal.valueOf + HALF_UP), so native and HOF paths — and the
  * DuckDB oracle — pick identical codes even on knife-edge distances.
  */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Float]], m: Int)
    extends UnaryExpression with CodegenFallback {
  require(codebooks.nonEmpty && codebooks.head.length % m == 0)

  private val ksub = codebooks.length
  private val dim = codebooks.head.length
  private val dsub = dim / m
  // flat row-major (ksub × dim) for cache-friendly scanning
  @transient private lazy val flat: Array[Float] = {
    val a = new Array[Float](ksub * dim)
    var c = 0
    while (c < ksub) {
      val row = codebooks(c)
      var j = 0
      while (j < dim) { a(c * dim + j) = row(j); j += 1 }
      c += 1
    }
    a
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"PqEncode requires ARRAY<FLOAT>, got ${other.simpleString}")
  }

  private def q6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val off = mi * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        var s = 0.0
        var j = 0
        while (j < dsub) {
          val d = v.getFloat(off + j).toDouble - flat(c * dim + off + j).toDouble
          s += d * d
          j += 1
        }
        val dq = q6(s)
        if (dq < bestD) { bestD = dq; best = c } // strict: ties keep first
        c += 1
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqExpression {
  /** PQ codes (ARRAY<INT>) for a float-vector column. */
  def pqEncodeF(vec: Column, codebooks: Seq[Seq[Float]], m: Int): Column =
    GraftShim.column(PqEncode(GraftShim.expression(vec), codebooks, m))
}
