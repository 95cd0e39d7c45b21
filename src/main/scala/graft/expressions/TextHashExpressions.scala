package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native (single-pass, loop-in-JVM) implementations of the MinHash and
  * SimHash kernels.
  *
  * The declarative higher-order-function formulations in
  * `graft.operators.Dedup` are the readable spec, but Spark evaluates HOF
  * lambdas INTERPRETED (no whole-stage codegen), and the nested
  * per-seed × per-shingle md5 tree walk is orders of magnitude too slow at
  * scale — the sf0.1 round-1 bench spent 943 s inside `ArrayTransform.eval`
  * on q_minhash_lsh. These expressions implement the same md5-derived hash
  * definitions with the loop as plain JVM code; `eval` is one virtual call
  * per row (CodegenFallback), the md5s run on primitive byte arrays.
  * Agreement with the HOF forms is asserted by DedupSpec on the documents
  * fixture (native vs `Dedup.minhashSignature` / `Dedup.simhash32`), and
  * the wired-in queries hash-match the DuckDB oracle end to end.
  */
private[graft] object Md5Kernel {
  private val tl = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  def digest(bytes: Array[Byte]): Array[Byte] = {
    val md = tl.get()
    md.reset()
    md.digest(bytes)
  }

  /** First 60 bits of md5 (= first 15 hex chars parsed base-16; same value
    * as Dedup.hash60 / DuckDB ('0x'||substr(md5(s),1,15))::BIGINT).
    */
  def hash60(bytes: Array[Byte]): Long = {
    val d = digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** First 32 bits of md5 big-endian (= first 8 hex chars). */
  def hash32(bytes: Array[Byte]): Int = {
    val d = digest(bytes)
    ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) | ((d(2) & 0xff) << 8) | (d(3) & 0xff)
  }
}

/** MinHash signature: sig[i] = min over shingles of hash60(i + ":" + s),
  * i ∈ [0, k). Bit-identical to `Dedup.minhashSignature`'s HOF form.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"MinHashSignature requires ARRAY<STRING>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j).toString
      var i = 0
      while (i < k) {
        val h = Md5Kernel.hash60((i.toString + ":" + s).getBytes("UTF-8"))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 32-bit SimHash: per-bit majority vote over the tokens' 32-bit md5
  * hashes (ties → 0). Bit-identical to `Dedup.simhash32`'s HOF form.
  */
case class SimHash32(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"SimHash32 requires ARRAY<STRING>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](32)
    var j = 0
    while (j < n) {
      val h = Md5Kernel.hash32(arr.getUTF8String(j).getBytes)
      var p = 0
      while (p < 32) {
        votes(p) += (((h >>> p) & 1) << 1) - 1
        p += 1
      }
      j += 1
    }
    var out = 0L
    var p = 0
    while (p < 32) {
      if (votes(p) > 0) out |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** LSH band hashes of a MinHash signature: band j (of `bands`, each
  * `rowsPerBand` values) → md5 hex of the comma-joined decimal signature
  * slice. Bit-identical to `Dedup.bandHashes`'s HOF form (agreement-tested
  * in DedupSpec) and to the DuckDB oracle's
  * `md5(array_to_string(sig[j*r+1 : j*r+r], ','))`.
  */
case class MinHashBands(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"MinHashBands requires ARRAY<BIGINT>, got ${other.simpleString}")
    }

  private val hexChars = "0123456789abcdef".toCharArray

  override def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    val out = new Array[Any](bands)
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j < bands) {
      sb.setLength(0)
      var r = 0
      while (r < rowsPerBand) {
        if (r > 0) sb.append(',')
        sb.append(sig.getLong(j * rowsPerBand + r))
        r += 1
      }
      val d = Md5Kernel.digest(sb.toString.getBytes("UTF-8"))
      val hex = new Array[Char](32)
      var i = 0
      while (i < 16) {
        hex(2 * i) = hexChars((d(i) >> 4) & 0xf)
        hex(2 * i + 1) = hexChars(d(i) & 0xf)
        i += 1
      }
      out(j) = UTF8String.fromString(new String(hex))
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Positional n-token window hash60s of a text column: element j is
  * hash60 of tokens[j..j+n) joined by ' ' — every OVERLAPPING window, in
  * document order, duplicates kept (unlike `WordShingles`, which
  * dedups + sorts: span detection needs the position ↔ hash alignment).
  * Tokenization matches `TextFunctions.tokens` / `WordShingles`: trim,
  * blank → [], Java-regex split("\\s+", -1); fewer than n tokens → [].
  * One JVM loop per row, one md5 per window; `Dedup.windowHashesHof` is
  * the declarative spec (agreement-tested in DedupSpec).
  */
case class WindowHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n > 0, s"window size must be positive, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"WindowHashes requires STRING, got ${other.simpleString}")
    }

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  override def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[UTF8String].trim()
    if (t.numBytes() == 0) return new GenericArrayData(Array.empty[Long])
    val toks = ws.split(t.toString, -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](toks.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < out.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = Md5Kernel.hash60(sb.toString.getBytes("UTF-8"))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextHashExpressions {
  /** Fast MinHash signature column (ARRAY<BIGINT>, length k). */
  def minhashSigF(shingles: Column, k: Int): Column =
    GraftShim.column(MinHashSignature(GraftShim.expression(shingles), k))

  /** Fast 32-bit SimHash column (BIGINT). */
  def simhash32F(tokens: Column): Column =
    GraftShim.column(SimHash32(GraftShim.expression(tokens)))

  /** Fast LSH band hashes (ARRAY<STRING>, length bands). */
  def minhashBandsF(sig: Column, bands: Int, rowsPerBand: Int): Column =
    GraftShim.column(MinHashBands(GraftShim.expression(sig), bands, rowsPerBand))

  /** Fast positional n-token window hash60s (ARRAY<BIGINT>). */
  def windowHashesF(text: Column, n: Int): Column =
    GraftShim.column(WindowHashes(GraftShim.expression(text), n))
}
