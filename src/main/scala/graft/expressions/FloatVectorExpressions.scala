package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd float-vector dot product — the whole-stage-codegen analogue of
  * the reference's scoring kernels (CUDA block-per-row reduction,
  * `shard/src/cuda/flat_kernels.cu:4-24`; BLAS row scan,
  * `shard/fallback_numpy_index.py:22-24`).
  *
  * Operates directly on `ArrayData` primitives (no per-element boxing, no
  * lambda dispatch), in the same sequential double accumulation order as
  * `VectorFunctions.dot`'s higher-order formulation — results are
  * bit-identical, so the two are interchangeable under the DuckDB oracle.
  * Both `eval` (interpreted) and `doGenCode` (compiled) paths are
  * implemented and tested for agreement — the analogue of the reference's
  * CPU⇄GPU dual path (`shard/server.py:25-38`).
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"FloatDotProduct requires ARRAY<FLOAT> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FloatVectorExpressions {
  /** Column API for the codegen'd dot product over ARRAY<FLOAT>. */
  def dotF(a: Column, b: Column): Column =
    GraftShim.column(FloatDotProduct(GraftShim.expression(a), GraftShim.expression(b)))
}
