package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** CONTENT-DEFINED chunk boundaries (Rabin-style rolling hash — the
  * LBFS/rsync/backup-dedup classic, Muthitacharoen et al. 2001):
  * positions where the Karp-Rabin hash of the trailing `w`-char window
  * satisfies `h mod d == d−1` open a new chunk. Because a boundary
  * depends only on the LOCAL window content, inserting or deleting a
  * prefix shifts at most the chunks up to the first surviving boundary
  * — every later chunk re-aligns byte-identically, which is what makes
  * chunk-hash dedup robust where fixed-size chunking desynchronizes
  * (the property CdcSpec pins).
  *
  * Input is expected PRE-NORMALIZED to single-byte chars
  * (`TrigramLm.normalize`'s [a-z0-9 ] alphabet) so JVM chars and SQL
  * codepoints agree; hash = Σ code·B^j mod M with B = 257,
  * M = 1_000_000_007 — all exact in long arithmetic, replicated by the
  * oracle with precomputed power literals.
  *
  * Returns the 0-based chunk START offsets (always beginning with 0;
  * empty array for an empty string). One O(len) rolling pass, zero
  * allocation beyond the result; interpreted and codegen paths
  * agreement-tested. The declarative HOF twin
  * (`Dedup.cdcStartsHof`) recomputes each window in O(w) — spec-only.
  */
case class CdcChunkStarts(child: Expression, w: Int, d: Int)
    extends UnaryExpression {

  require(w >= 2, s"window must be >= 2, got $w")
  require(d >= 2, s"divisor must be >= 2, got $d")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"CdcChunkStarts requires STRING input, got ${o.simpleString}")
  }

  private val M = 1000000007L
  private val B = 257L
  // B^(w-1) mod M, for removing the outgoing char
  private val Bw1: Long = {
    var p = 1L
    var i = 0
    while (i < w - 1) { p = p * B % M; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Int])
    val starts = scala.collection.mutable.ArrayBuffer(0)
    var h = 0L
    var i = 0
    while (i < n) {
      if (i >= w) h = (h - s.charAt(i - w) * Bw1 % M + M * M) % M
      h = (h * B + s.charAt(i)) % M
      if (i >= w - 1 && h % d == d - 1 && i + 1 < n) starts += (i + 1)
      i += 1
    }
    new GenericArrayData(starts.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val n = ctx.freshName("n")
      val buf = ctx.freshName("buf")
      val cnt = ctx.freshName("cnt")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val str = ctx.freshName("str")
      val out = ctx.freshName("out")
      s"""
         |java.lang.String $str = $in.toString();
         |int $n = $str.length();
         |int[] $buf = new int[$n + 1];
         |int $cnt = 0;
         |if ($n > 0) { $buf[$cnt++] = 0; }
         |long $h = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($i >= $w) {
         |    $h = ($h - $str.charAt($i - $w) * ${Bw1}L % ${M}L + ${M}L * ${M}L) % ${M}L;
         |  }
         |  $h = ($h * ${B}L + $str.charAt($i)) % ${M}L;
         |  if ($i >= ${w - 1} && $h % ${d}L == ${d - 1}L && $i + 1 < $n) {
         |    $buf[$cnt++] = $i + 1;
         |  }
         |}
         |int[] $out = new int[$cnt];
         |System.arraycopy($buf, 0, $out, 0, $cnt);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused normalize → boundary → slice kernel: one JVM pass lowercases
  * and folds to the [a-z0-9 ] alphabet (byte-identical to the
  * `Trigrams` kernel / `TrigramLm.normalize`), runs the rolling-hash
  * boundary scan of [[CdcChunkStarts]], and emits the chunk STRINGS
  * directly. The declarative composition (normalize column → starts
  * kernel → HOF slice lambda) re-evaluates the normalize regex chain
  * once per chunk element inside the lambda — the O(len·chunks)
  * interpreted-lambda trap the `Trigrams` kernel exists for; this
  * collapses it to O(len). Agreement with the composed form is
  * spec-tested in DedupSpec.
  */
case class CdcChunks(child: Expression, w: Int, d: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(w >= 2 && d >= 2, s"window/divisor must be >= 2, got $w/$d")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"CdcChunks requires STRING input, got ${o.simpleString}")
  }

  private val M = 1000000007L
  private val B = 257L
  private val Bw1: Long = {
    var p = 1L; var i = 0
    while (i < w - 1) { p = p * B % M; i += 1 }
    p
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
      } else pendingSpace = true
      i += 1
    }
    val s = sb.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val starts = scala.collection.mutable.ArrayBuffer(0)
    var h = 0L
    i = 0
    while (i < n) {
      if (i >= w) h = (h - s.charAt(i - w) * Bw1 % M + M * M) % M
      h = (h * B + s.charAt(i)) % M
      if (i >= w - 1 && h % d == d - 1 && i + 1 < n) starts += (i + 1)
      i += 1
    }
    val out = new Array[Any](starts.length)
    var k = 0
    while (k < starts.length) {
      val end = if (k + 1 < starts.length) starts(k + 1) else n
      out(k) = UTF8String.fromString(s.substring(starts(k), end))
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcExpression {
  /** 0-based content-defined chunk start offsets of a string. */
  def cdcChunkStartsF(text: Column, w: Int, d: Int): Column =
    GraftShim.column(CdcChunkStarts(GraftShim.expression(text), w, d))

  /** Fused normalize + chunk kernel: chunk strings of the normalized text. */
  def cdcChunksF(text: Column, w: Int, d: Int): Column =
    GraftShim.column(CdcChunks(GraftShim.expression(text), w, d))
}
