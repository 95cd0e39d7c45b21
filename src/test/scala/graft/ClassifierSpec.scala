package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}
import graft.operators.Classifier

class ClassifierSpec extends SparkSpec {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("logit is the mean slot weight; bounded; empty text scores 0 and drops") {
    val rows = docs("alpha beta gamma", "alpha", "", "   ")
      .select(col("doc_id"),
        Classifier.logit(T.tokens(col("text"))).as("logit"),
        Classifier.keep(T.tokens(col("text"))).as("keep"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toList
    val byId = rows.map(t => t._1 -> t).toMap
    assert(byId(2L)._2 == 0.0 && !byId(2L)._3, "empty text → logit 0, dropped")
    assert(byId(3L)._2 == 0.0 && !byId(3L)._3, "blank text → logit 0, dropped")
    rows.foreach { case (_, l, _) => assert(l >= -1.0 && l <= 1.0) }
    // driver-side recompute of the single-token doc, same md5 derivation
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h60(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)
    val slot = h60("alpha") % 4096
    val w = h60(s"w:$slot") % 2001 - 1000
    val want = BigDecimal(w.toDouble / 1000.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byId(1L)._2 == want, s"single-token logit ${byId(1L)._2} != $want")
    assert(byId(1L)._3 == (want > 0.0))
  }

  test("scoring is a pure projection: no exchange in the plan") {
    val df = docs("alpha beta", "gamma delta")
      .select(Classifier.logit(T.tokens(col("text"))).as("logit"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
