package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass T5 span corruption (Raffel et al. 2020 §3.1.4):
  * one JVM loop per row computing the (inputs, targets) pair, one md5
  * per token position. Bit-identical to the declarative staged-HOF form
  * (`TextFunctions.spanCorruptStagesHof`, the readable spec —
  * agreement-tested in TextFunctionsSpec): gate(p) =
  * hash60("id:p:salt") % 100 < pct, a span STARTS at p when gate(p) and
  * neither of the two previous positions gates (spans are 3 tokens, so
  * the look-back keeps them disjoint), inputs replace each span with a
  * numbered `<extra_id_k>` sentinel, targets carry sentinel + hidden
  * tokens. The HOF form walks interpreted lambdas over five staged
  * array columns (~4.3 s at sf0.1 — the suite's slowest query); this
  * kernel is one virtual call per row.
  *
  * `id` is the STRING rendering of the document id (callers cast), so
  * the hash input replicates the HOF/oracle's `id.cast("string")`
  * exactly for any id type.
  */
case class SpanCorrupt(left: Expression, right: Expression, pct: Int,
                       salt: String)
    extends BinaryExpression with CodegenFallback {

  require(pct >= 0 && pct <= 100, "pct must be in [0, 100]")

  private val spanLen = 3

  override def dataType: DataType = StructType(Seq(
    StructField("inputs", StringType, nullable = false),
    StructField("targets", StringType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"SpanCorrupt requires (STRING id, STRING text), got $other")
    }

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  override def nullSafeEval(idAny: Any, textAny: Any): Any = {
    val id = idAny.asInstanceOf[UTF8String].toString
    val t = textAny.asInstanceOf[UTF8String].trim()
    if (t.numBytes() == 0)
      return InternalRow(UTF8String.EMPTY_UTF8, UTF8String.EMPTY_UTF8)
    val toks = ws.split(t.toString, -1)
    val n = toks.length
    val gates = new Array[Boolean](n)
    var p = 0
    while (p < n) {
      val h = Md5Kernel.hash60(s"$id:${p + 1}:$salt".getBytes("UTF-8"))
      gates(p) = h % 100 < pct
      p += 1
    }
    val starts = new Array[Boolean](n)
    p = 0
    while (p < n) {
      starts(p) = gates(p) && (p < 1 || !gates(p - 1)) && (p < 2 || !gates(p - 2))
      p += 1
    }
    val inputs = new java.lang.StringBuilder
    val targets = new java.lang.StringBuilder
    var k = 0
    p = 0
    while (p < n) {
      if (starts(p)) {
        if (inputs.length > 0) inputs.append(' ')
        inputs.append("<extra_id_").append(k).append('>')
        if (targets.length > 0) targets.append(' ')
        targets.append("<extra_id_").append(k).append('>')
        var j = p
        val end = math.min(p + spanLen, n)
        while (j < end) {
          targets.append(' ').append(toks(j))
          j += 1
        }
        k += 1
      } else if (!((p >= 1 && starts(p - 1)) || (p >= 2 && starts(p - 2)))) {
        if (inputs.length > 0) inputs.append(' ')
        inputs.append(toks(p))
      }
      p += 1
    }
    InternalRow(UTF8String.fromString(inputs.toString),
      UTF8String.fromString(targets.toString))
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SpanCorruptExpression {
  /** Fast (inputs, targets) span-corruption struct column. */
  def spanCorruptF(id: Column, text: Column, pct: Int, salt: String): Column =
    GraftShim.column(SpanCorrupt(GraftShim.expression(id.cast("string")),
      GraftShim.expression(text), pct, salt))
}
