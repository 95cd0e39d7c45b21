package graft.expressions

import java.util.regex.Pattern

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct word n-gram shingles of a text column, as one JVM loop.
  *
  * Replicates `graft.operators.Dedup.shingles`'s HOF chain bit-for-bit
  * (agreement-tested in DedupSpec on the documents fixture):
  *   trim → (empty → []) → split("\s+") → n-gram join(" ") → distinct →
  *   sort(binary order)
  * The HOF formulation evaluates interpreted lambda trees per element —
  * profiling at sf0.1 showed ~1.5 ms/doc, the dominant cost of every dedup
  * query (shingling 5000 docs cost more than all 4.2M MinHash md5s).
  *
  * Semantics notes (shared with the HOF form and the DuckDB oracle):
  * `trim` strips ASCII space 0x20 only (both engines); the Java-regex
  * split with limit -1 keeps leading/trailing empty tokens produced by
  * non-space whitespace at the edges, in both engines; sort order is
  * UTF8 binary (= array_sort = DuckDB list_sort default).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n > 0, s"shingle size must be positive, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"WordShingles requires STRING, got ${other.simpleString}")
    }

  @transient private lazy val ws = Pattern.compile("\\s+")

  override def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[UTF8String].trim()
    if (t.numBytes() == 0) return new GenericArrayData(Array.empty[Any])
    val toks = ws.split(t.toString, -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new mutable.HashSet[String]
    val out = mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    val sb = new java.lang.StringBuilder
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val s = sb.toString
      if (seen.add(s)) out += UTF8String.fromString(s)
      i += 1
    }
    val arr = out.toArray
    java.util.Arrays.sort(arr, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleExpression {
  /** Fast sorted distinct word n-gram shingles (ARRAY<STRING>). */
  def shinglesF(text: Column, n: Int): Column =
    GraftShim.column(WordShingles(GraftShim.expression(text), n))
}
