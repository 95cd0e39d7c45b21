package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Release-gate privacy operators — the dataset-publication checks that
  * run AFTER content-level PII redaction (`TextFunctions.redactPii`):
  * redaction scrubs what a row says, k-anonymity bounds what a row's
  * METADATA reveals (a single document with a rare (source, lang,
  * license) combination re-identifies its origin even with the text
  * clean — Sweeney 2002).
  */
object Privacy {

  /** Per-group k-anonymity audit over the quasi-identifier columns:
    * every combination's population and whether it falls below k (the
    * re-identification threshold). One map-side-combined groupBy —
    * the group table is bounded by the quasi-id cross product, not the
    * corpus.
    */
  def kAnonymityAudit(df: DataFrame, quasiIds: Seq[Column],
                      k: Long): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiIds: _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("suppress", col("n") < k)
  }

  /** Rows whose quasi-identifier combination clears the k threshold —
    * the publishable subset. The bounded group-count table joins back
    * onto the corpus (broadcast-sized by construction: one row per
    * quasi-id combination), so the corpus itself is scanned once and
    * never shuffles.
    */
  def suppressSmallGroups(df: DataFrame, quasiIds: Seq[String],
                          k: Long): DataFrame = {
    val ok = kAnonymityAudit(df, quasiIds.map(col), k)
      .filter(!col("suppress")).select(quasiIds.map(col): _*)
    df.join(broadcast(ok), quasiIds)
  }
}
