package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom-filter membership probe over a 60-bit hash column.
  *
  * The bitset ships inside the expression (task-closure broadcast — the
  * single-JVM stand-in for `SparkContext.broadcast` of a cluster run);
  * probing is k bit-tests per row via double hashing, so a corpus scan
  * can discard non-members map-side BEFORE any exchange. `m` is a power
  * of two (index = masked add), `k` probe indexes derive from the one
  * 60-bit hash as h1 + i·h2 with h2 forced odd — deterministic, no RNG,
  * no extra hashing per probe.
  *
  * False positives are possible by construction (~0.8% at 10 bits/key);
  * false NEGATIVES are not. Consumers must treat a `true` as "candidate,
  * verify exactly" — `Dedup.contaminationOverlapBloom` re-joins survivors
  * against the exact hash set, so query semantics stay exact and the
  * DuckDB oracle is the plain exact-overlap SQL.
  */
case class BloomMightContain(child: Expression, bits: Seq[Long], numProbes: Int)
    extends UnaryExpression with CodegenFallback {

  require(bits.nonEmpty && (bits.length & (bits.length - 1)) == 0,
    s"bitset word count must be a power of two, got ${bits.length}")
  require(numProbes >= 1, s"numProbes must be positive, got $numProbes")

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"BloomMightContain requires BIGINT, got ${other.simpleString}")
  }

  @transient private lazy val words: Array[Long] = bits.toArray
  @transient private lazy val mask: Long = words.length.toLong * 64 - 1

  override def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[Long]
    val h2 = (h >>> 30) | 1L
    var i = 0
    while (i < numProbes) {
      val idx = (h + i * h2) & mask
      if ((words((idx >>> 6).toInt) & (1L << (idx & 63))) == 0) return false
      i += 1
    }
    true
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpression {

  /** Default bits per key (~0.8% FP at 7 probes). */
  val DefaultBitsPerKey: Int = 10

  /** Default probe count (≈ ln2 · bitsPerKey for 10 bits/key). */
  val DefaultNumProbes: Int = 7

  /** Build a Bloom bitset over 60-bit hashes: m = next power of two ≥
    * max(64, n · bitsPerKey) bits, same double-hashing probe schedule as
    * `BloomMightContain` — build and probe agree by construction.
    */
  def buildBits(hashes: Array[Long], bitsPerKey: Int = DefaultBitsPerKey,
                numProbes: Int = DefaultNumProbes): Array[Long] = {
    val wanted = math.max(64L, hashes.length.toLong * bitsPerKey)
    val mBits = java.lang.Long.highestOneBit(wanted - 1) << 1 // next pow2 ≥ wanted
    val words = new Array[Long]((mBits >>> 6).toInt)
    val mask = mBits - 1
    hashes.foreach { h =>
      val h2 = (h >>> 30) | 1L
      var i = 0
      while (i < numProbes) {
        val idx = (h + i * h2) & mask
        words((idx >>> 6).toInt) |= 1L << (idx & 63)
        i += 1
      }
    }
    words
  }

  /** Membership probe column (BOOLEAN). */
  def mightContainF(hash: Column, bits: Array[Long], numProbes: Int = DefaultNumProbes): Column =
    GraftShim.column(BloomMightContain(
      GraftShim.expression(hash), bits.toSeq, numProbes))
}
