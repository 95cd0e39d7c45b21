package graft.expressions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern automaton over UTF-8 bytes.
  *
  * Built once per expression instance (task-closure broadcast — each
  * executor pays the build once, not once per row); matching is a single
  * left-to-right pass counting EVERY occurrence of every phrase,
  * overlapping included ("a a a" contains "a a" twice) — amortized
  * O(text bytes + matches) via fail links, independent of phrase count.
  *
  * Memory is O(total phrase bytes): per-node edges are sorted compact
  * arrays probed by binary search, not dense 256-way tables, so a
  * 100k-phrase blocklist costs megabytes, not gigabytes. Byte-level
  * matching equals character-level substring matching for any valid
  * UTF-8 phrase (a phrase's first byte is never a continuation byte, so
  * a match cannot start mid-codepoint).
  */
final class AcAutomaton(phrases: Array[Array[Byte]]) extends Serializable {
  require(phrases.nonEmpty, "phrase list must be non-empty")
  require(phrases.forall(_.nonEmpty), "phrases must be non-empty")

  // --- trie build (HashMap edges, flattened to sorted arrays below) ---
  private val buildEdges =
    scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Int, Int])
  private val buildEnd = scala.collection.mutable.ArrayBuffer(-1)

  phrases.zipWithIndex.foreach { case (p, pi) =>
    var cur = 0
    p.foreach { b =>
      val key = b & 0xFF
      cur = buildEdges(cur).getOrElseUpdate(key, {
        buildEdges += scala.collection.mutable.HashMap.empty[Int, Int]
        buildEnd += -1
        buildEdges.size - 1
      })
    }
    require(buildEnd(cur) == -1, "phrases must be distinct")
    buildEnd(cur) = pi
  }

  private val n = buildEdges.size
  /** Phrase index ending exactly at this node, or -1. */
  private val endPhrase: Array[Int] = buildEnd.toArray
  /** Sorted edge byte keys / next states, per node. */
  private val edgeKeys: Array[Array[Int]] = new Array(n)
  private val edgeNext: Array[Array[Int]] = new Array(n)
  /** Longest proper suffix state. */
  private val fail: Array[Int] = new Array(n)
  /** Nearest suffix state that ends a phrase, or -1 (compressed output
    * chain — match reporting touches only real matches).
    */
  private val dictLink: Array[Int] = new Array(n)

  locally {
    var i = 0
    while (i < n) {
      val ks = buildEdges(i).keysIterator.toArray.sorted
      edgeKeys(i) = ks
      edgeNext(i) = ks.map(buildEdges(i))
      i += 1
    }
    // BFS fail links: fail(child of root) = root; deeper children inherit
    // via the parent's fail chain. dictLink compresses the fail chain to
    // phrase-ending states only.
    val queue = scala.collection.mutable.Queue.empty[Int]
    var j = 0
    while (j < edgeKeys(0).length) {
      val c = edgeNext(0)(j)
      fail(c) = 0
      dictLink(c) = -1
      queue += c
      j += 1
    }
    dictLink(0) = -1
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      var k = 0
      while (k < edgeKeys(u).length) {
        val b = edgeKeys(u)(k)
        val v = edgeNext(u)(k)
        fail(v) = step(fail(u), b)
        dictLink(v) =
          if (endPhrase(fail(v)) >= 0) fail(v) else dictLink(fail(v))
        queue += v
        k += 1
      }
    }
  }

  /** goto(state, byte) with fail-link fallback to root. */
  private def step(state: Int, key: Int): Int = {
    var s = state
    while (true) {
      val ks = edgeKeys(s)
      var lo = 0
      var hi = ks.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (ks(mid) == key) return edgeNext(s)(mid)
        else if (ks(mid) < key) lo = mid + 1
        else hi = mid - 1
      }
      if (s == 0) return 0
      s = fail(s)
    }
    0 // unreachable
  }

  /** Add every phrase occurrence count in `bytes` into `counts`
    * (index-aligned with the constructor's phrase array).
    */
  def countInto(bytes: Array[Byte], counts: Array[Long]): Unit = {
    var state = 0
    var i = 0
    while (i < bytes.length) {
      state = step(state, bytes(i) & 0xFF)
      var d = if (endPhrase(state) >= 0) state else dictLink(state)
      while (d >= 0) {
        counts(endPhrase(d)) += 1
        d = dictLink(d)
      }
      i += 1
    }
  }

  /** Node count (spec introspection). */
  def size: Int = n
}

/** Per-phrase occurrence counts of a fixed phrase list in a string
  * column: returns `ARRAY<BIGINT>` index-aligned with `phrases`,
  * counting ALL occurrences (overlapping included).
  *
  * The blocklist scan of a curation pipeline (C4's badword filter,
  * Raffel et al. 2020 §2.2; spam/boilerplate phrase lists): ONE pass
  * over the text regardless of phrase count, where the naive
  * formulation is #phrases LIKE predicates = #phrases passes. The
  * automaton rides the task closure like `BloomMightContain`'s bitset —
  * built per executor, no per-row setup, no shuffle; on a 100 TB corpus
  * the whole filter stays a map-side projection.
  */
case class MultiPhraseCounts(child: Expression, phrases: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(phrases.nonEmpty && phrases.forall(_.nonEmpty),
    "phrase list must be non-empty, with non-empty phrases")
  require(phrases.distinct.size == phrases.size, "phrases must be distinct")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"MultiPhraseCounts requires STRING, got ${other.simpleString}")
  }

  @transient private lazy val ac =
    new AcAutomaton(phrases.map(_.getBytes(StandardCharsets.UTF_8)).toArray)

  override def nullSafeEval(input: Any): Any = {
    val counts = new Array[Long](phrases.size)
    ac.countInto(input.asInstanceOf[UTF8String].getBytes, counts)
    new GenericArrayData(counts)
  }

  override def prettyName: String = "multi_phrase_counts"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AhoCorasickExpression {

  /** Column wrapper: per-phrase occurrence counts, aligned with
    * `phrases` order.
    */
  def multiPhraseCounts(text: Column, phrases: Seq[String]): Column =
    GraftShim.column(MultiPhraseCounts(GraftShim.expression(text), phrases))
}
