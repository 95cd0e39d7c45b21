package graft

import org.apache.spark.sql.functions._

import graft.operators.Privacy

class PrivacySpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    // (us, en): 5 rows — clears k=3; (us, fr): 2 — suppressed;
    // (de, en): 1 — suppressed
    (Seq.fill(5)(("us", "en")) ++ Seq.fill(2)(("us", "fr")) ++
      Seq(("de", "en"))).zipWithIndex
      .map { case ((c, l), i) => (i.toLong, c, l) }
      .toDF("id", "country", "lang")
  }

  test("kAnonymityAudit flags exactly the under-k groups") {
    val a = Privacy.kAnonymityAudit(fixture,
        Seq(col("country"), col("lang")), k = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(a(("us", "en")) == ((5L, false)))
    assert(a(("us", "fr")) == ((2L, true)))
    assert(a(("de", "en")) == ((1L, true)))
  }

  test("suppressSmallGroups keeps only rows from publishable groups") {
    val kept = Privacy.suppressSmallGroups(fixture,
      Seq("country", "lang"), k = 3)
    assert(kept.count() == 5)
    assert(kept.select("country", "lang").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("us", "en")))
    // boundary: a group of exactly k survives
    assert(Privacy.suppressSmallGroups(fixture,
      Seq("country", "lang"), k = 2).count() == 7)
  }
}
