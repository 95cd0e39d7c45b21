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

  /** l-DIVERSITY audit (Machanavajjhala et al. 2007) — the gate
    * k-anonymity alone misses: a group of 50 identical quasi-ids is
    * k-anonymous, but if every row shares ONE sensitive value (all 50
    * have the same diagnosis), membership still discloses it (the
    * homogeneity attack). A publishable group needs ≥ l DISTINCT
    * well-represented sensitive values. Returns one row per quasi-id
    * combination with (n, n_sensitive, suppress = n_sensitive < l);
    * compose with the k-audit — both gates must pass.
    *
    * Scale shape: one exact-distinct aggregation over (quasi-ids,
    * sensitive) then a count rollup — map-side combined, output bounded
    * by the quasi-id combination count like [[kAnonymityAudit]].
    */
  def lDiversityAudit(df: DataFrame, quasiIds: Seq[Column],
                      sensitive: Column, l: Long): DataFrame = {
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(quasiIds: _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(sensitive).as("n_sensitive"))
      .withColumn("suppress", col("n_sensitive") < l)
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

  /** Hash-consistent pseudonymization: replace an identifier with
    * `prefix` + the first `hexLen` hex chars of md5(salt + ":" + id) —
    * the GDPR-style release transform that KEEPS referential integrity
    * (every occurrence of the same id maps to the same pseudonym, so
    * joins, sessionization and per-user aggregates still work on the
    * published data) while severing the link to the original value
    * (reversal needs the salt, which is not published).
    *
    * Pure per-row codegen compute — no shuffle, no lookup table to
    * broadcast or leak; the pseudonym space is 16^hexLen, so pick
    * hexLen ≥ 12 to keep birthday-collision odds negligible at
    * 100 TB-scale user counts (≈ 2.8e14 pseudonyms at 12).
    */
  def pseudonymize(id: Column, salt: String, prefix: String = "u",
                   hexLen: Int = 12): Column = {
    require(hexLen >= 4 && hexLen <= 32, s"hexLen must be 4..32, got $hexLen")
    concat(lit(prefix),
      substring(md5(concat(lit(salt), lit(":"), id.cast("string"))
        .cast("binary")), 1, hexLen))
  }
}
