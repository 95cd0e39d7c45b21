package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Length-based sentence alignment (Gale & Church 1993) between a source
  * sentence sequence and its rewritten/cleaned twin — the provenance
  * primitive of bitext mining and of raw→cleaned curation audits: which
  * cleaned sentence came from which raw sentence, including deletions
  * (1-0), insertions (0-1), and merges/splits (2-1 / 1-2 / 2-2).
  *
  * Inputs are the two CHAR-LENGTH arrays (the caller splits and bounds —
  * the `q_edit_distance` discipline); output is ONE packed BIGINT:
  * bits 30+ = total alignment cost, and six 5-bit move counters below
  * (n11 at 25, n10 at 20, n01 at 15, n21 at 10, n12 at 5, n22 at 0).
  * Because the fields are priority-ordered, numeric `min` over packed
  * values IS the lexicographic (cost, n11, n10, n01, n21, n12, n22)
  * tie-break — the DP stays single-long-per-cell in BOTH engines, which
  * is what makes the oracle's recursive-CTE replay tractable.
  *
  * Cost model: Gale-Church's Gaussian length-ratio log-prob is replaced
  * by the integer surrogate |la−lb|·1000 / max(la+lb, 1) (floor div —
  * identical in Java and DuckDB for non-negatives) plus flat move
  * penalties (1-0/0-1: 350; 2-1/1-2: +300; 2-2: +450). The Gaussian's
  * erf has no cross-engine-exact form; the surrogate keeps the ranking
  * behavior (cheap to match near-equal lengths, expensive to force
  * mismatched ones) and is exactly replayable.
  *
  * Classic O(m·n) two-rolling-row DP; the within-row 0-1 chain is a
  * left-to-right relax (dp[i][j] = min(B[j], dp[i][j−1] + c01)). Both
  * interpreted `eval` and `doGenCode` are implemented and
  * agreement-tested (the CPU⇄GPU dual-path discipline of the reference,
  * `shard/server.py:25-38`).
  */
case class GaleChurchAlign(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"GaleChurchAlign requires ARRAY<INT> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val src = a.asInstanceOf[ArrayData]
    val tgt = b.asInstanceOf[ArrayData]
    val m = src.numElements()
    val n = tgt.numElements()
    if (m > 31 || n > 31)
      throw new IllegalArgumentException(
        s"GaleChurchAlign: at most 31 sentences per side (got $m/$n); " +
          "cap with slice() at the caller")
    val C = GaleChurchConsts
    var prev = new Array[Long](n + 1)
    var curr = new Array[Long](n + 1)
    var next = new Array[Long](n + 1)
    java.util.Arrays.fill(prev, C.INF)
    curr(0) = 0L
    var j = 1
    while (j <= n) { curr(j) = curr(j - 1) + C.STEP01; j += 1 }
    var i = 1
    while (i <= m) {
      val ls = src.getInt(i - 1)
      val ls2 = if (i >= 2) src.getInt(i - 2) + ls else 0
      next(0) = curr(0) + C.STEP10
      j = 1
      while (j <= n) {
        val lt = tgt.getInt(j - 1)
        var best = curr(j - 1) + (C.rel(ls, lt) << 30) + C.ONE11
        var t = curr(j) + C.STEP10
        if (t < best) best = t
        if (i >= 2) {
          t = prev(j - 1) + ((C.rel(ls2, lt) + C.PEN_MERGE) << 30) + C.ONE21
          if (t < best) best = t
        }
        if (j >= 2) {
          val lt2 = tgt.getInt(j - 2) + lt
          t = curr(j - 2) + ((C.rel(ls, lt2) + C.PEN_MERGE) << 30) + C.ONE12
          if (t < best) best = t
          if (i >= 2) {
            t = prev(j - 2) + ((C.rel(ls2, lt2) + C.PEN_BOTH) << 30) + C.ONE22
            if (t < best) best = t
          }
        }
        next(j) = best
        j += 1
      }
      j = 1
      while (j <= n) {
        val t = next(j - 1) + C.STEP01
        if (t < next(j)) next(j) = t
        j += 1
      }
      val spare = prev; prev = curr; curr = next; next = spare
      i += 1
    }
    curr(n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val prev = ctx.freshName("prev")
      val curr = ctx.freshName("curr")
      val next = ctx.freshName("next")
      val spare = ctx.freshName("spare")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val ls = ctx.freshName("ls")
      val ls2 = ctx.freshName("ls2")
      val lt = ctx.freshName("lt")
      val lt2 = ctx.freshName("lt2")
      val best = ctx.freshName("best")
      val t = ctx.freshName("t")
      // constants + the rel() formula are INLINED (same values/math as
      // GaleChurchConsts — the agreement spec pins the two paths)
      val C = GaleChurchConsts
      def rel(a: String, b: String): String =
        s"((long) Math.abs($a - $b) * 1000L / Math.max($a + $b, 1))"
      s"""
         |int $m = $x.numElements();
         |int $n = $y.numElements();
         |if ($m > 31 || $n > 31) {
         |  throw new IllegalArgumentException(
         |    "GaleChurchAlign: at most 31 sentences per side (got " + $m +
         |    "/" + $n + "); cap with slice() at the caller");
         |}
         |long[] $prev = new long[$n + 1];
         |long[] $curr = new long[$n + 1];
         |long[] $next = new long[$n + 1];
         |java.util.Arrays.fill($prev, ${C.INF}L);
         |$curr[0] = 0L;
         |for (int $j = 1; $j <= $n; $j++) {
         |  $curr[$j] = $curr[$j - 1] + ${C.STEP01}L;
         |}
         |for (int $i = 1; $i <= $m; $i++) {
         |  int $ls = $x.getInt($i - 1);
         |  int $ls2 = ($i >= 2) ? $x.getInt($i - 2) + $ls : 0;
         |  $next[0] = $curr[0] + ${C.STEP10}L;
         |  for (int $j = 1; $j <= $n; $j++) {
         |    int $lt = $y.getInt($j - 1);
         |    long $best = $curr[$j - 1] + (${rel(ls, lt)} << 30) + ${C.ONE11}L;
         |    long $t = $curr[$j] + ${C.STEP10}L;
         |    if ($t < $best) $best = $t;
         |    if ($i >= 2) {
         |      $t = $prev[$j - 1] + ((${rel(ls2, lt)} + ${C.PEN_MERGE}L) << 30)
         |        + ${C.ONE21}L;
         |      if ($t < $best) $best = $t;
         |    }
         |    if ($j >= 2) {
         |      int $lt2 = $y.getInt($j - 2) + $lt;
         |      $t = $curr[$j - 2] + ((${rel(ls, lt2)} + ${C.PEN_MERGE}L) << 30)
         |        + ${C.ONE12}L;
         |      if ($t < $best) $best = $t;
         |      if ($i >= 2) {
         |        $t = $prev[$j - 2] + ((${rel(ls2, lt2)} + ${C.PEN_BOTH}L) << 30)
         |          + ${C.ONE22}L;
         |        if ($t < $best) $best = $t;
         |      }
         |    }
         |    $next[$j] = $best;
         |  }
         |  for (int $j = 1; $j <= $n; $j++) {
         |    long $t = $next[$j - 1] + ${C.STEP01}L;
         |    if ($t < $next[$j]) $next[$j] = $t;
         |  }
         |  long[] $spare = $prev; $prev = $curr; $curr = $next; $next = $spare;
         |}
         |${ev.value} = $curr[$n];
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cost-model constants + the length surrogate. The interpreted path
  * calls these directly; codegen inlines the VALUES and the same
  * formula — the agreement spec pins the two paths together.
  */
object GaleChurchConsts {
  // move-count increments (5-bit fields, priority order under the cost)
  final val ONE11 = 1L << 25
  final val ONE10 = 1L << 20
  final val ONE01 = 1L << 15
  final val ONE21 = 1L << 10
  final val ONE12 = 1L << 5
  final val ONE22 = 1L
  final val PEN_GAP = 350L   // 1-0 / 0-1 flat cost
  final val PEN_MERGE = 300L // 2-1 / 1-2 surcharge on the length cost
  final val PEN_BOTH = 450L  // 2-2 surcharge
  final val STEP10 = (PEN_GAP << 30) + ONE10
  final val STEP01 = (PEN_GAP << 30) + ONE01
  final val INF = 1L << 55

  /** |a−b|·1000 / max(a+b, 1), floor division — the integer surrogate
    * for the Gale-Church length-ratio log-prob.
    */
  def rel(a: Int, b: Int): Long = {
    val d = if (a >= b) a - b else b - a
    val s = a + b
    d.toLong * 1000L / (if (s >= 1) s else 1)
  }
}

object GaleChurchExpression {
  /** Packed alignment summary of two sentence-length arrays; unpack with
    * `shiftright`/`& 31` (cost at bit 30; n11/n10/n01/n21/n12/n22 at
    * 25/20/15/10/5/0).
    */
  def galeChurchF(srcLens: Column, tgtLens: Column): Column =
    GraftShim.column(GaleChurchAlign(
      GraftShim.expression(srcLens), GraftShim.expression(tgtLens)))
}
