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

  test("trainHardSigmoid learns the separating direction and is partition-stable") {
    import spark.implicits._
    // y = 1 iff feature x1 is high: the trained w1 must come out
    // positive and the bias compensating
    val rows = (0 until 200).map { i =>
      val hi = i % 2 == 0
      (1000000L, if (hi) 900000L else 100000L, if (hi) 1.0 else 0.0)
    }
    val feats = rows.toDF("xq0", "xq1", "y")
    val w = Classifier.trainHardSigmoid(feats.repartition(4),
      Seq("xq0", "xq1"), "y", iters = 5, lr = 2.0)
    assert(w(1) > 0.05, s"separating weight must be positive: $w")
    // predictions: hard-sigmoid of the learned z ranks hi above lo
    val zHi = w(0) * 1.0 + w(1) * 0.9
    val zLo = w(0) * 1.0 + w(1) * 0.1
    assert(zHi > zLo)
    val w2 = Classifier.trainHardSigmoid(feats.repartition(17),
      Seq("xq0", "xq1"), "y", iters = 5, lr = 2.0)
    assert(w == w2, "training must be partition-count independent")
  }
}
