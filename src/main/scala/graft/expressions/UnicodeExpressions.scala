package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization — the very first pass of a web-scale
  * ingest pipeline: the same logical text arrives from crawls in mixed
  * composed/decomposed forms ("café" as U+00E9 vs e+U+0301), and every
  * downstream hash-based operator (exact dedup, MinHash shingles,
  * window-hash substring dedup) treats those byte sequences as
  * different documents unless normalization runs first. Both kernels
  * are pure per-row scans — no shuffle, stays inside the scan stage.
  *
  * Fast path: `Normalizer.isNormalized` / a plain-ASCII check short-
  * circuits without allocating — on mostly-ASCII corpora the kernel is
  * a single pass over the bytes. (ASCII is closed under both NFC and
  * accent-stripping, so the short-circuit is semantically exact.)
  */
object UnicodeExpressions {

  /** NFC canonical composition (java.text.Normalizer — the JDK's
    * implementation of UAX #15, the same standard DuckDB's
    * `nfc_normalize` implements via utf8proc).
    */
  case class NfcNormalize(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = StringType

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"NfcNormalize requires STRING, got ${other.simpleString}")
    }

    override protected def nullSafeEval(input: Any): Any = {
      val u = input.asInstanceOf[UTF8String]
      val s = u.toString
      if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) u
      else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Accent/diacritic removal: NFD decompose, drop combining marks
    * (category Mn), NFC recompose (so scripts whose NFD is purely
    * structural — e.g. Hangul Jamo — round-trip unchanged). Matches
    * DuckDB `strip_accents` on Latin-script text.
    */
  case class StripAccents(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = StringType

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"StripAccents requires STRING, got ${other.simpleString}")
    }

    private def isAscii(s: String): Boolean = {
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) >= 0x80) return false
        i += 1
      }
      true
    }

    override protected def nullSafeEval(input: Any): Any = {
      val u = input.asInstanceOf[UTF8String]
      val s = u.toString
      if (isAscii(s)) u
      else {
        val nfd = Normalizer.normalize(s, Normalizer.Form.NFD)
        val sb = new java.lang.StringBuilder(nfd.length)
        var i = 0
        while (i < nfd.length) {
          val cp = nfd.codePointAt(i)
          if (Character.getType(cp) != Character.NON_SPACING_MARK)
            sb.appendCodePoint(cp)
          i += Character.charCount(cp)
        }
        UTF8String.fromString(
          Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
      }
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** NFC-normalize a string column. */
  def nfcNormalizeF(text: Column): Column =
    GraftShim.column(NfcNormalize(GraftShim.expression(text)))

  /** Strip accents/diacritics from a string column. */
  def stripAccentsF(text: Column): Column =
    GraftShim.column(StripAccents(GraftShim.expression(text)))
}
