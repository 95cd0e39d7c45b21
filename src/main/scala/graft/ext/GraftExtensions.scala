package graft.ext

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.expressions.{CharEntropy, FloatDotProduct, JaroWinkler, MinHashSignature, RepeatStats, SimHash32, SortedIntersectCount, Trigrams, UnicodeExpressions, WordShingles}

/** SQL surface for graft's native expressions.
  *
  * Registration is offered both ways Spark supports:
  *   - `spark.sql.extensions=graft.ext.GraftExtensions` at session build
  *     (the `SparkSessionExtensions.injectFunction` path — survives into
  *     every derived session), or
  *   - `GraftFunctions.register(spark)` on a live session.
  *
  * After either, plain SQL can use the kernels:
  * {{{
  *   SELECT id, graft_dot(embedding, query) AS score FROM vectors
  *   SELECT graft_minhash_sig(graft_shingles(text, 2), 16) FROM documents
  * }}}
  */
object GraftFunctions {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an INT literal, got $other")
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "graft_dot"),
      (es: Seq[Expression]) => FloatDotProduct(es(0), es(1))),
    (FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash_sig"),
      (es: Seq[Expression]) => MinHashSignature(es(0), intArg(es(1), "graft_minhash_sig", 1))),
    (FunctionIdentifier("graft_simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "graft_simhash32"),
      (es: Seq[Expression]) => SimHash32(es(0))),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (es: Seq[Expression]) => WordShingles(es(0), intArg(es(1), "graft_shingles", 1))),
    (FunctionIdentifier("graft_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "graft_intersect_count"),
      (es: Seq[Expression]) => SortedIntersectCount(es(0), es(1))),
    (FunctionIdentifier("graft_repeat_stats"),
      new ExpressionInfo(classOf[RepeatStats].getName, "graft_repeat_stats"),
      (es: Seq[Expression]) => RepeatStats(es(0))),
    (FunctionIdentifier("graft_trigrams"),
      new ExpressionInfo(classOf[Trigrams].getName, "graft_trigrams"),
      (es: Seq[Expression]) => Trigrams(es(0))),
    (FunctionIdentifier("graft_char_entropy"),
      new ExpressionInfo(classOf[CharEntropy].getName, "graft_char_entropy"),
      (es: Seq[Expression]) => CharEntropy(es(0))),
    (FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[UnicodeExpressions.NfcNormalize].getName, "graft_nfc"),
      (es: Seq[Expression]) => UnicodeExpressions.NfcNormalize(es(0))),
    (FunctionIdentifier("graft_strip_accents"),
      new ExpressionInfo(classOf[UnicodeExpressions.StripAccents].getName, "graft_strip_accents"),
      (es: Seq[Expression]) => UnicodeExpressions.StripAccents(es(0))),
    (FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (es: Seq[Expression]) => JaroWinkler(es(0), es(1))))

  /** Register on a live session (idempotent — re-registration overwrites). */
  def register(spark: SparkSession): Unit = all.foreach { case (id, info, builder) =>
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}

/** `spark.sql.extensions` entry point: native-kernel SQL functions plus
  * the optimizer rewrite that swaps the declarative HOF dot product for
  * the codegen kernel (`graft.plans.RewriteHofDotProduct`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.RewriteHofDotProduct)
  }
}
