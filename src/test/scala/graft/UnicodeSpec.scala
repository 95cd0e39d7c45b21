package graft

import org.apache.spark.sql.functions._

import graft.expressions.UnicodeExpressions.{nfcNormalizeF, stripAccentsF}

/** All unicode literals are written as backslash-u escapes -- a source file
  * with raw combining marks can be silently recomposed by tooling,
  * which would turn the decomposed-input tests into identity checks.
  */
class UnicodeSpec extends SparkSpec {

  private val composed = "caf\u00e9"        // e-acute, single codepoint
  private val decomposed = "cafe\u0301"     // e + combining acute

  private def one(text: String,
                  f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String = {
    import spark.implicits._
    Seq(text).toDF("t").select(f(col("t"))).head.getString(0)
  }

  test("NFC composes decomposed sequences and is identity on composed/ASCII text") {
    assert(one(decomposed, nfcNormalizeF) == composed)
    assert(one("Mu\u0308ller", nfcNormalizeF) == "M\u00fcller")
    assert(one(composed, nfcNormalizeF) == composed)
    assert(one("plain ascii 123", nfcNormalizeF) == "plain ascii 123")
    assert(one("", nfcNormalizeF) == "")
  }

  test("stripAccents removes marks from composed AND decomposed forms alike") {
    assert(one("M\u00fcller", stripAccentsF) == "Muller")   // composed
    assert(one("Mu\u0308ller", stripAccentsF) == "Muller")  // decomposed
    assert(one("caf\u00e9 \u00f1and\u00fa", stripAccentsF) == "cafe nandu")
    assert(one("no accents here", stripAccentsF) == "no accents here")
  }

  test("stripAccents leaves non-Latin scripts without marks intact (Hangul round-trips NFC)") {
    // U+D55C U+AE00: NFD decomposes to Jamo, no Mn marks are removed,
    // NFC must recompose -- the kernel is not lossy here
    assert(one("\ud55c\uae00", stripAccentsF) == "\ud55c\uae00")
  }

  test("normalization makes byte-divergent duplicates hash together (the dedup motivation)") {
    import spark.implicits._
    val df = Seq((1L, "caf\u00e9 ol\u00e9"), (2L, "cafe\u0301 ole\u0301"))
      .toDF("id", "t")
      .select(col("id"), md5(nfcNormalizeF(col("t")).cast("binary")).as("h"))
    val hs = df.collect().map(_.getString(1))
    assert(hs(0) == hs(1))
  }

  test("SQL surface: graft_nfc and graft_strip_accents registered") {
    graft.ext.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_nfc('cafe\u0301') AS a, graft_strip_accents('\u00f1u') AS b")
      .head
    assert(r.getString(0) == composed && r.getString(1) == "nu")
  }
}
