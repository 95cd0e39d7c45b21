package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Candidate matrices for the IVF rebalance re-home argmax, keyed by the
  * row's CURRENT cell — the data-side of [[RehomeArgmax]]. One instance
  * rides the whole projection as a broadcast-like reference object, so
  * the generated code is FAN-OUT-INDEPENDENT: a rebalance that splits
  * 500 hot cells into thousands of children compiles to the same few
  * bytecodes as one that splits 2 (the earlier per-child case-chain
  * expression crossed the JVM's 64 KB method limit at large fan-outs and
  * silently fell back to interpreted projection).
  *
  * Scoring replicates [[graft.operators.Ann.ivfAssign]]'s quantized-
  * cosine total order exactly: score = round₆(dot / (max(‖v‖, eps) ·
  * ‖c‖)), ties break to the SMALLEST candidate id; double comparison is
  * Spark codegen's nanSafeCompare (NaN greatest, −0.0 = 0.0). A cell
  * absent from the plan keeps its rows (the healthy-cell no-op).
  */
final class RehomePlanData private (
    private val keys: Array[Long],
    private val cids: Array[Array[Long]],
    private val vecs: Array[Array[Array[Float]]],
    private val norms: Array[Array[Double]],
    private val eps: Double) extends Serializable {

  /** Spark codegen's double comparison (Utils.nanSafeCompareDoubles):
    * NaN compares greatest, −0.0 equals 0.0 — the semantics every
    * codegen'd struct-max in this engine has always used.
    */
  private def cmp(x: Double, y: Double): Int =
    if (x < y) -1
    else if (x > y) 1
    else if (java.lang.Double.isNaN(x)) { if (java.lang.Double.isNaN(y)) 0 else 1 }
    else if (java.lang.Double.isNaN(y)) -1
    else 0

  /** Spark's `round(x, 6)` for doubles: BigDecimal HALF_UP, NaN/Inf pass. */
  private def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def newCell(cell: Long, v: ArrayData): Long = {
    val slot = java.util.Arrays.binarySearch(keys, cell)
    if (slot < 0) return cell
    val cc = cids(slot)
    if (cc.length == 0) return cell
    val vv = vecs(slot)
    val nn = norms(slot)
    val n = v.numElements()
    var dvv = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      dvv += x * x
      i += 1
    }
    val vn = math.max(math.sqrt(dvv), eps)
    var bestId = Long.MinValue
    var bestScore = 0.0
    var first = true
    var j = 0
    while (j < cc.length) {
      val cv = vv(j)
      val m = math.min(n, cv.length)
      var dot = 0.0
      i = 0
      while (i < m) {
        dot += v.getFloat(i).toDouble * cv(i).toDouble
        i += 1
      }
      val s = round6(dot / (vn * nn(j)))
      val c = if (first) 1 else cmp(s, bestScore)
      if (c > 0 || (c == 0 && cc(j) < bestId)) {
        bestScore = s
        bestId = cc(j)
      }
      first = false
      j += 1
    }
    bestId
  }
}

object RehomePlanData {
  /** Build from (current cell → candidate (id, vector)) sets; candidate
    * norms precompute once here — the same ‖c‖ the expression-tree
    * formulation folded as a literal.
    */
  def apply(plan: Map[Long, Seq[(Long, Seq[Float])]], eps: Double): RehomePlanData = {
    val keys = plan.keys.toArray.sorted
    val cids = new Array[Array[Long]](keys.length)
    val vecs = new Array[Array[Array[Float]]](keys.length)
    val norms = new Array[Array[Double]](keys.length)
    var i = 0
    while (i < keys.length) {
      val cands = plan(keys(i))
      cids(i) = cands.map(_._1).toArray
      vecs(i) = cands.map(_._2.toArray).toArray
      norms(i) = cands.map { case (_, cv) =>
        var n2 = 0.0
        cv.foreach(x => n2 += x.toDouble * x.toDouble)
        math.max(math.sqrt(n2), eps)
      }.toArray
      i += 1
    }
    new RehomePlanData(keys, cids, vecs, norms, eps)
  }
}

/** The fan-out-independent re-home projection: `newCell(cell_id, vec)`
  * against a [[RehomePlanData]] reference object. Both the interpreted
  * and the codegen path call the SAME compiled kernel, so they agree by
  * construction, and the generated method body is one call — it can
  * never grow past the JVM method limit no matter how many cells a
  * rebalance pass touches.
  */
case class RehomeArgmax(left: Expression, right: Expression,
                        plan: RehomePlanData) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = left.dataType == LongType && (right.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"RehomeArgmax requires (BIGINT, ARRAY<FLOAT>), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(c: Any, v: Any): Any =
    plan.newCell(c.asInstanceOf[Long], v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rehomePlan", plan,
      classOf[RehomePlanData].getName)
    nullSafeCodeGen(ctx, ev, (c, v) => s"${ev.value} = $ref.newCell($c, $v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RehomeExpressions {
  /** Column API: re-home `cellCol` rows by cosine argmax over `plan`'s
    * candidates for their current cell (absent cells keep their rows).
    */
  def rehome(cellCol: Column, vecCol: Column,
             plan: Map[Long, Seq[(Long, Seq[Float])]], eps: Double): Column =
    GraftShim.column(RehomeArgmax(
      GraftShim.expression(cellCol.cast("long")),
      GraftShim.expression(vecCol),
      RehomePlanData(plan, eps)))

  /** Column API: nearest-centroid argmax over ONE flat centroid matrix
    * — the [[AssignArgmax]] kernel `Ann.ivfAssign` switches to past its
    * unroll threshold.
    */
  def assignArgmax(vecCol: Column, cents: Seq[(Long, Seq[Float])],
                   eps: Double): Column =
    GraftShim.column(AssignArgmax(GraftShim.expression(vecCol),
      AssignMatrixData(cents, eps)))
}

/** The flat centroid matrix for [[AssignArgmax]] — `Ann.ivfAssign`'s
  * kernel twin of [[RehomePlanData]] (no per-cell keying: every row
  * scores against the SAME matrix). One reference object rides the
  * projection, so the generated code is CENTROID-COUNT-INDEPENDENT: the
  * unrolled in-literal argmax crosses the JVM's 64 KB method limit near
  * C ≈ 1500 (dim 64) and every stage then pays a janino compile attempt
  * before falling back to interpreted projection — the C-linear term
  * the round-11 100× refresh phase breakdown exposed. Scoring
  * replicates the expression-tree path BIT-EXACTLY: sequential
  * left-fold double dot (the codegen dot kernel's order), round₆
  * HALF_UP, nanSafeCompare double order, ties to the smallest centroid
  * id (AnnSpec pins kernel ≡ unrolled across the threshold).
  */
final class AssignMatrixData private (
    private val cids: Array[Long],
    private val vecs: Array[Array[Float]],
    private val norms: Array[Double],
    private val eps: Double) extends Serializable {

  private def cmp(x: Double, y: Double): Int =
    if (x < y) -1
    else if (x > y) 1
    else if (java.lang.Double.isNaN(x)) { if (java.lang.Double.isNaN(y)) 0 else 1 }
    else if (java.lang.Double.isNaN(y)) -1
    else 0

  private def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def assign(v: ArrayData): Long = {
    val n = v.numElements()
    var dvv = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      dvv += x * x
      i += 1
    }
    val vn = math.max(math.sqrt(dvv), eps)
    var bestId = Long.MinValue
    var bestScore = 0.0
    var first = true
    var j = 0
    while (j < cids.length) {
      val cv = vecs(j)
      val m = math.min(n, cv.length)
      var dot = 0.0
      i = 0
      while (i < m) {
        dot += v.getFloat(i).toDouble * cv(i).toDouble
        i += 1
      }
      val s = round6(dot / (vn * norms(j)))
      val c = if (first) 1 else cmp(s, bestScore)
      if (c > 0 || (c == 0 && cids(j) < bestId)) {
        bestScore = s
        bestId = cids(j)
      }
      first = false
      j += 1
    }
    bestId
  }
}

object AssignMatrixData {
  def apply(cents: Seq[(Long, Seq[Float])], eps: Double): AssignMatrixData = {
    require(cents.nonEmpty, "centroid matrix must be non-empty")
    val sorted = cents.sortBy(_._1)
    new AssignMatrixData(
      sorted.map(_._1).toArray,
      sorted.map(_._2.toArray).toArray,
      sorted.map { case (_, cv) =>
        var n2 = 0.0
        cv.foreach(x => n2 += x.toDouble * x.toDouble)
        math.max(math.sqrt(n2), eps)
      }.toArray,
      eps)
  }
}

/** Centroid-count-independent nearest-centroid projection:
  * `assign(vec)` against an [[AssignMatrixData]] reference object.
  * Interpreted and codegen paths call the SAME compiled kernel, so they
  * agree by construction and the generated method body is one call.
  */
case class AssignArgmax(child: Expression, matrix: AssignMatrixData)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"AssignArgmax requires ARRAY<FLOAT>, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    matrix.assign(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("assignMatrix", matrix,
      classOf[AssignMatrixData].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.assign($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
