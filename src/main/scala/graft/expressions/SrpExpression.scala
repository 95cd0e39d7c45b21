package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Signed-random-projection (SRP) LSH band values for an embedding
  * column — the cosine-space analogue of MinHash banding (Charikar 2002):
  * bit b of band j is the sign of the dot product with a deterministic
  * pseudo-random hyperplane; two vectors agree on a bit with probability
  * 1 − θ/π (θ = their angle), so near-duplicate embeddings collide in
  * some band with high probability while the corpus spreads uniformly.
  *
  * Hyperplane components are md5-derived ((hash60("seed:bit:i") mod 10⁶)
  * / 10⁶ − 0.5) — exactly replicable in the DuckDB oracle, like every
  * other hash in the dedup family. Output: ARRAY<BIGINT> of length
  * `bands`, element j = the band's bit pattern (bitsPerBand bits).
  *
  * This is the 100 TB path for embedding near-dup: candidates come from
  * band-bucket equality (shuffle of (band, value, id) tuples only;
  * `Dedup.lshCandidatePairs` downstream), the O(n²) cosine verify runs
  * only within buckets.
  */
case class SrpBands(child: Expression, bands: Int, bitsPerBand: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {

  require(bands > 0 && bitsPerBand > 0 && bitsPerBand <= 62)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"SrpBands requires ARRAY<FLOAT>, got ${other.simpleString}")
    }

  // hyperplanes depend only on (seed, bit, i) — cache per expression
  // instance, keyed by the observed dimension
  @transient private var planes: Array[Array[Double]] = _
  @transient private var planeDim: Int = -1

  private def plane(bit: Int, dim: Int): Array[Double] = {
    if (planeDim != dim) {
      planes = Array.tabulate(bands * bitsPerBand) { b =>
        Array.tabulate(dim) { i =>
          (Md5Kernel.hash60(s"$seed:$b:$i".getBytes("UTF-8")) % 1000000L)
            .toDouble / 1000000.0 - 0.5
        }
      }
      planeDim = dim
    }
    planes(bit)
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val out = new Array[Long](bands)
    var j = 0
    while (j < bands) {
      var value = 0L
      var b = 0
      while (b < bitsPerBand) {
        val h = plane(j * bitsPerBand + b, dim)
        var dot = 0.0
        var i = 0
        while (i < dim) { dot += v.getFloat(i).toDouble * h(i); i += 1 }
        if (dot > 0) value |= (1L << b)
        b += 1
      }
      out(j) = value
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpExpression {
  /** SRP LSH band values (ARRAY<BIGINT>, length `bands`). */
  def srpBandsF(vec: Column, bands: Int, bitsPerBand: Int, seed: Long): Column =
    GraftShim.column(SrpBands(GraftShim.expression(vec), bands, bitsPerBand, seed))
}
