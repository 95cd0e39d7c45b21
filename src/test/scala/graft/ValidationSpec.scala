package graft

import org.apache.spark.sql.functions._

import graft.operators.Validation
import graft.operators.Validation._

class ValidationSpec extends SparkSpec {

  test("validate: one row per check, violation counts hand-checked") {
    import spark.implicits._
    val df = Seq(
      (1L, "hello", "en", 40.0),
      (2L, "", "en", -1.0),        // non_empty + in_range violations
      (3L, null, "EN", 9.0),       // not_null/non_empty + matches
      (3L, "dup id", "fr", 10.0))  // duplicate key
      .toDF("id", "text", "lang", "score")
    val r = Validation.validate(df, Seq(
        notNull("text"), nonEmpty("text"),
        matches("lang", "^[a-z]{2}$"), inRange("score", 0, 100)),
      uniqueKeys = Seq("id"))
      .collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getBoolean(3)))).toMap
    assert(r(("not_null", "text")) == ((1L, false)))
    assert(r(("non_empty", "text")) == ((2L, false)))
    assert(r(("matches", "lang")) == ((1L, false))) // "EN"
    assert(r(("in_range", "score")) == ((1L, false)))
    assert(r(("unique", "id")) == ((1L, false)))    // one extra copy of id 3
    assert(r.size == 5)
  }

  test("validate: a clean table passes everything; single-scan plan for row-local checks") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"t$i", "en")).toDF("id", "text", "lang")
    val checks = Seq(notNull("text"), nonEmpty("text"), matches("lang", "^[a-z]{2}$"),
      isIn("lang", Seq("en", "de")))
    val r = Validation.validate(df, checks, uniqueKeys = Seq("id")).collect()
    assert(r.forall(_.getBoolean(3)), r.mkString(";"))
    // all four row-local checks share ONE aggregate (one scan): the plan
    // contains exactly one scan-side HashAggregate pair for them
    val rowLocalOnly = Validation.validate(df, checks)
    val scans = "LocalTableScan|Scan ".r
      .findAllIn(rowLocalOnly.queryExecution.executedPlan.toString).size
    assert(scans == 1, s"row-local checks must run in one scan, saw $scans")
  }

  test("jackknifeMean: constant metric has zero SE; SE tracks spread; partitioning-proof") {
    import spark.implicits._
    import graft.operators.Validation
    val const = (1L to 1000L).map(i => (i, 7.5)).toDF("id", "v")
    val c = Validation.jackknifeMean(const, col("v"), col("id")).head
    assert(c.getLong(0) == 1000L)
    assert(c.getLong(1) == 7500000L)        // exact micro mean
    assert(c.getLong(2) == 0L, "constant metric must have zero SE")
    // a high-variance metric gets a visibly larger SE than a tight one
    val tight = (1L to 1000L).map(i => (i, 5.0 + (i % 3) * 0.001))
      .toDF("id", "v")
    val wide = (1L to 1000L).map(i => (i, (i % 100).toDouble)).toDF("id", "v")
    val seT = Validation.jackknifeMean(tight, col("v"), col("id"))
      .head.getLong(2)
    val seW = Validation.jackknifeMean(wide, col("v"), col("id"))
      .head.getLong(2)
    assert(seW > seT * 10, s"wide SE $seW must dwarf tight SE $seT")
    // deterministic under repartitioning (order-proof sums)
    val a = Validation.jackknifeMean(wide.repartition(13), col("v"), col("id"))
      .head.toSeq
    val b = Validation.jackknifeMean(wide.coalesce(1), col("v"), col("id"))
      .head.toSeq
    assert(a == b)
  }
}
