package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** True byte-pair encoding over a bundled merge vocabulary, as one JVM
  * loop per word.
  *
  * Algorithm (deterministic, shared bit-for-bit by the HOF spec
  * `TextFunctions.bpeEncodeHof` and the DuckDB recursive-CTE oracle of
  * `q_bpe_real`): start from single characters; repeatedly find the
  * LOWEST-RANK adjacent pair present in the merge table and merge its
  * LEFTMOST occurrence; stop when no adjacent pair is in the table.
  * One merge per step keeps the recurrence replicable as a recursive CTE;
  * the result equals classic greedy BPE on this vocabulary.
  *
  * Reference anchor: the reference counts corpus tokens with the
  * tokenizer bundled in SentenceTransformers (`rag_demo/ingest.py:27`);
  * `TextFunctions.bpeTokenCount` is the regex approximation, this is the
  * real merge-table algorithm behind a deterministic bundled vocab.
  */
case class BpeEncode(child: Expression, merges: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"BpeEncode requires STRING, got ${other.simpleString}")
    }

  // rank by "left|right" pair key; lower rank = higher merge priority
  @transient private lazy val rank: Map[String, Int] =
    merges.zipWithIndex.toMap

  override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[UTF8String].toString
    if (w.isEmpty) return new GenericArrayData(Array.empty[Any])
    val toks = mutable.ArrayBuffer.empty[String]
    w.foreach(c => toks += c.toString)
    var done = false
    while (!done && toks.length >= 2) {
      var best = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < toks.length - 1) {
        rank.get(toks(i) + "|" + toks(i + 1)) match {
          case Some(r) if r < best => best = r; bestIdx = i
          case _ =>
        }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        toks(bestIdx) = toks(bestIdx) + toks(bestIdx + 1)
        toks.remove(bestIdx + 1)
      }
    }
    new GenericArrayData(
      toks.map(t => UTF8String.fromString(t): Any).toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeExpression {
  /** BPE token array (ARRAY<STRING>) of a word under a merge vocab. */
  def bpeEncodeF(word: Column, merges: Seq[String]): Column =
    GraftShim.column(BpeEncode(GraftShim.expression(word), merges))
}
