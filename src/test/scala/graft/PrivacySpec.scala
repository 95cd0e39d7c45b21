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

  test("pseudonymize is consistent, salted, and join-preserving") {
    import spark.implicits._
    val a = Seq((1L, 10L), (2L, 10L), (3L, 20L)).toDF("event_id", "user_id")
      .select(col("event_id"),
        Privacy.pseudonymize(col("user_id"), "s1").as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a(1L) == a(2L), "same id must map to the same pseudonym")
    assert(a(1L) != a(3L), "distinct ids must map to distinct pseudonyms")
    assert(a(1L).matches("u[0-9a-f]{12}"), s"shape: ${a(1L)}")
    val b = Seq((1L, 10L)).toDF("event_id", "user_id")
      .select(Privacy.pseudonymize(col("user_id"), "s2").as("p"))
      .head.getString(0)
    assert(b != a(1L), "a different salt must change the mapping")
  }

  test("lDiversityAudit flags the homogeneous group k-anonymity passes") {
    import spark.implicits._
    // group A: 40 rows, ONE sensitive value — k-anonymous at k=20 but
    // a homogeneity attack discloses the diagnosis; group B: diverse
    val rows = (1 to 40).map(i => ("A", "flu")) ++
      (1 to 40).map(i => ("B", Seq("flu", "cold", "ok")(i % 3)))
    val df = rows.toDF("zip", "diag")
    val k = Privacy.kAnonymityAudit(df, Seq(col("zip")), 20)
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(!k("A") && !k("B"), "both groups clear the k gate")
    val l = Privacy.lDiversityAudit(df, Seq(col("zip")), col("diag"), 3)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(l("A") == ((1L, true)), "homogeneous group must suppress")
    assert(l("B") == ((3L, false)))
  }
}
