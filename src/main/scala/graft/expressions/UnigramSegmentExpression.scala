package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) Viterbi word segmentation against a
  * bounded piece vocabulary — the probabilistic sibling of the greedy BPE
  * encoder (`BpeExpression`): BPE replays merges, unigram picks the
  * GLOBALLY cheapest piece cover of the word under per-piece costs
  * (Kudo 2018's inference step).
  *
  * DP state per char position is the lexicographically minimal
  * (cost, n_pieces, seg) triple, where `seg` is the space-joined
  * segmentation so far. The triple (not just cost) is the contract: cost
  * ties are real (uniform costs over same-count pieces), and the triple
  * makes the optimum unique, so the DuckDB oracle can replay the same
  * answer by enumerating all covers recursively and taking
  * min(struct(cost, n, seg)). Prefix-optimality of the triple holds
  * because every continuation appends ' '+piece and ' ' sorts below
  * every piece character, so the concat preserves prefix order.
  *
  * Characters with no length-1 vocab entry segment via `fallbackCost`
  * (the <unk> piece), so every word is coverable. Vocab is a bounded
  * constructor literal (top-N pieces — the centroids-in-literal
  * pattern), making the whole operator a zero-shuffle per-row kernel.
  */
case class UnigramSegment(child: Expression, vocab: Seq[(String, Long)],
                          maxPieceLen: Int, fallbackCost: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("seg", StringType, nullable = false),
    StructField("cost", LongType, nullable = false),
    StructField("n", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"UnigramSegment requires STRING, got ${other.simpleString}")
    }

  @transient private lazy val costOf: Map[String, Long] = vocab.toMap

  override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[UTF8String].toString
    val n = w.length
    if (n == 0)
      return new GenericInternalRow(Array[Any](UTF8String.fromString(""), 0L, 0L))
    // best(i) = minimal (cost, n, seg) covering w[0, i)
    val bCost = new Array[Long](n + 1)
    val bN = new Array[Long](n + 1)
    val bSeg = new Array[String](n + 1)
    java.util.Arrays.fill(bCost, Long.MaxValue)
    bCost(0) = 0L; bN(0) = 0L; bSeg(0) = ""
    var i = 0
    while (i < n) {
      if (bCost(i) != Long.MaxValue) {
        var l = 1
        val maxL = math.min(maxPieceLen, n - i)
        while (l <= maxL) {
          val piece = w.substring(i, i + l)
          val c = costOf.get(piece) match {
            case Some(pc) => pc
            case None => if (l == 1) fallbackCost else -1L
          }
          if (c >= 0L) {
            val nc = bCost(i) + c
            val nn = bN(i) + 1L
            val ns = if (i == 0) piece else bSeg(i) + " " + piece
            val j = i + l
            val better = nc < bCost(j) ||
              (nc == bCost(j) && (nn < bN(j) ||
                (nn == bN(j) && ns.compareTo(bSeg(j)) < 0)))
            if (better) { bCost(j) = nc; bN(j) = nn; bSeg(j) = ns }
          }
          l += 1
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(bSeg(n)), bCost(n), bN(n)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramSegment {
  def unigramSegF(word: Column, vocab: Seq[(String, Long)],
                  maxPieceLen: Int = 4, fallbackCost: Long = 20000000L): Column =
    GraftShim.column(UnigramSegment(GraftShim.expression(word), vocab,
      maxPieceLen, fallbackCost))
}
