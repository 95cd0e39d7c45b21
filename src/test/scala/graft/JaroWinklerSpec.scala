package graft

import org.apache.spark.sql.functions._
import graft.expressions.JaroWinkler

class JaroWinklerSpec extends SparkSpec {

  // Values probed from DuckDB's jaro_winkler_similarity (the oracle's
  // independent C++ implementation) — pinned here so any drift in our
  // kernel surfaces as a unit failure before the oracle gate sees it.
  private val duckdbPinned = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("abc", "abc", 1.0),
    ("abc", "xyz", 0.0),
    ("a", "", 0.0),
    ("", "", 0.0),
    ("dwayne", "duane", 0.8400000000000001),
    ("aaaa", "aaab", 0.8833333333333334),
    ("crate", "trace", 0.7333333333333334),
    ("hello", "hallo", 0.88),
    // boost threshold: common prefix but jaro <= 0.7 → NO Winkler boost
    ("abcdefgh", "abzzzzzz", 0.5),
    ("aaaaa", "aabbbbbbbbbb", 0.5222222222222223),
    ("abcd", "abxy", 0.6666666666666666),
    // jaro just over 0.7 with prefix → boosted
    ("ab", "abcdefghij", 0.7866666666666667))

  test("similarity matches DuckDB bit-for-bit on pinned pairs") {
    for ((a, b, want) <- duckdbPinned) {
      val got = JaroWinkler.similarity(a, b)
      assert(got == want, s"jw($a, $b) = $got, duckdb says $want")
    }
  }

  test("expression evaluates through the Column API, null-safe") {
    import spark.implicits._
    val df = Seq(("martha", "marhta"), ("abc", null))
      .toDF("a", "b")
      .select(JaroWinkler.jaroWinklerF($"a", $"b").as("jw"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 0.9611111111111111)
    assert(rows(1).isNullAt(0))
  }

  test("symmetry and bounds on fixture-ish strings") {
    val words = Seq("spark", "sprak", "join", "jion", "customer",
      "custoner", "table", "tabel", "", "a")
    for (x <- words; y <- words) {
      val f = JaroWinkler.similarity(x, y)
      val r = JaroWinkler.similarity(y, x)
      assert(f == r, s"asymmetric on ($x, $y)")
      assert(f >= 0.0 && f <= 1.0)
      if (x == y && x.nonEmpty) assert(f == 1.0)
    }
  }
}
