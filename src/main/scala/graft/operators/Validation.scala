package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Deequ/Great-Expectations
  * check suite, Spark-first): each check contributes one violation-count
  * aggregate, ALL checks run in a single map-side-combined scan of the
  * corpus (a suite of 50 checks costs one pass, not 50), and the result
  * is one row per check — the table a pipeline gates a publish on.
  *
  * Uniqueness is the one check a row-local aggregate can't express; it
  * runs as its own bounded groupBy (distinct-key shuffle) and unions in.
  */
object Validation {

  /** One expectation: a name and a per-row violation predicate. */
  final case class Check(name: String, column: String, violation: Column)

  def notNull(c: String): Check =
    Check("not_null", c, col(c).isNull)

  def nonEmpty(c: String): Check =
    Check("non_empty", c, col(c).isNull || length(trim(col(c))) === 0)

  def inRange(c: String, lo: Double, hi: Double): Check =
    Check("in_range", c,
      col(c).isNull || col(c) < lo || col(c) > hi)

  def matches(c: String, regex: String): Check =
    Check("matches", c, col(c).isNull || !col(c).rlike(regex))

  def isIn(c: String, allowed: Seq[String]): Check =
    Check("is_in", c, col(c).isNull || !col(c).isin(allowed: _*))

  /** Run row-local checks in ONE scan (+ one bounded groupBy per
    * `uniqueKeys` entry). Output: (check, column, n_violations, passed)
    * ordered by (check, column).
    */
  /** JACKKNIFE standard error of a metric mean (Quenouille/Tukey —
    * delete-one-group over `folds` hash folds): the error bar a corpus
    * health metric ("mean quality 0.41") needs before anyone compares
    * two pipeline runs on it. Leave-one-fold-out means are EXACT
    * integer floor divisions of micro-quantized sums, the variance of
    * fold means is exact BIGINT arithmetic, and only the final sqrt is
    * float (round-6) — order-proof at any partitioning, cross-engine
    * replayable. Hash folds (not row ranges) make the estimate
    * insensitive to storage order.
    *
    * One map-side-combined (fold → sum, count) aggregation — the fold
    * table is `folds` rows; everything after is driver-free column
    * arithmetic on that bounded table. Returns one row
    * (n, mean_micro, jack_se_micro).
    */
  def jackknifeMean(df: DataFrame, value: Column, key: Column,
                    folds: Int = 10): DataFrame = {
    require(folds >= 2, s"folds must be >= 2, got $folds")
    val byFold = df
      .select(pmod(graft.operators.Dedup.hash60(key.cast("string")),
          lit(folds.toLong)).as("__f"),
        round(value * 1000000).cast("long").as("__vq"))
      .groupBy(col("__f"))
      .agg(sum(col("__vq")).as("__s"), count(lit(1)).as("__n"))
    val tot = byFold.agg(sum(col("__s")), sum(col("__n")), count(lit(1)))
      .head
    val (s, n, k) = (tot.getLong(0), tot.getLong(1), tot.getLong(2))
    val loo = byFold.select(
      expr(s"(${s}L - __s) div greatest(${n}L - __n, 1)").as("__m"))
    val mbar = Math.floorDiv(loo.agg(sum(col("__m"))).head.getLong(0), k)
    val varq = loo
      .agg(sum((col("__m") - mbar) * (col("__m") - mbar))).head.getLong(0)
    val se = BigDecimal(
        math.sqrt(varq.toDouble * (k - 1).toDouble / k.toDouble))
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    df.sparkSession.range(1).select(
      lit(n).as("n"), lit(Math.floorDiv(s, n)).as("mean_micro"),
      lit(se).as("jack_se_micro"))
  }

  def validate(df: DataFrame, checks: Seq[Check],
               uniqueKeys: Seq[String] = Nil): DataFrame = {
    require(checks.nonEmpty || uniqueKeys.nonEmpty, "no checks given")
    val spark = df.sparkSession
    import spark.implicits._
    val rowLocal = if (checks.isEmpty) None else Some {
      val aggs = checks.map(ch =>
        count(when(ch.violation, 1)).as(s"${ch.name}:${ch.column}"))
      val one = df.agg(aggs.head, aggs.tail: _*)
      // unpivot the single aggregate row into one row per check
      val cols = checks.map(ch => struct(
        lit(ch.name).as("check"), lit(ch.column).as("column"),
        col(s"`${ch.name}:${ch.column}`").as("n_violations")))
      one.select(explode(array(cols: _*)).as("r")).select($"r.*")
    }
    val uniques = uniqueKeys.map { k =>
      df.groupBy(col(k)).agg(count(lit(1)).as("__n"))
        .agg(coalesce(sum(when($"__n" > 1, $"__n" - 1)), lit(0L))
          .as("n_violations"))
        .select(lit("unique").as("check"), lit(k).as("column"),
          $"n_violations")
    }
    (rowLocal.toSeq ++ uniques).reduce(_ unionByName _)
      .withColumn("passed", $"n_violations" === 0L)
      .orderBy($"check", $"column")
  }
}
