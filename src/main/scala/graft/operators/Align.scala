package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.GaleChurchExpression.galeChurchF
import graft.functions.{TextFunctions => T}

/** Sentence-alignment operators over the GaleChurchAlign kernel
  * (`expressions/GaleChurchExpression`): which output sentence came from
  * which input sentence — deletions (1-0), insertions (0-1), merges and
  * splits (2-1 / 1-2 / 2-2) — decided on char lengths alone (Gale &
  * Church 1993). The provenance primitive of bitext mining and of
  * raw→cleaned curation audits.
  *
  * Everything here is per-row kernel compute at scan speed; the only
  * exchanges a caller adds are its own repartition/order. Sentence
  * arrays must be capped (≤ 31 per side — the kernel throws, the
  * `q_edit_distance` bound discipline).
  */
object Align {

  /** Packed alignment of two sentence-ARRAY columns: one BIGINT with
    * the total cost at bit 30 and the six move counters below (n11/n10/
    * n01/n21/n12/n22 at 25/20/15/10/5/0, 5 bits each).
    */
  def packedAlign(srcSents: Column, tgtSents: Column): Column =
    galeChurchF(transform(srcSents, x => length(x).cast("int")),
      transform(tgtSents, x => length(x).cast("int")))

  /** The packed summary unpacked to named columns. */
  def unpack(packed: Column): Seq[Column] = Seq(
    shiftright(packed, 30).as("cost"),
    shiftright(packed, 25).bitwiseAND(lit(31L)).as("n11"),
    shiftright(packed, 20).bitwiseAND(lit(31L)).as("n10"),
    shiftright(packed, 15).bitwiseAND(lit(31L)).as("n01"),
    shiftright(packed, 10).bitwiseAND(lit(31L)).as("n21"),
    shiftright(packed, 5).bitwiseAND(lit(31L)).as("n12"),
    packed.bitwiseAND(lit(31L)).as("n22"))

  /** Fixture-grade self-alignment: sentence-ify the terminator-free
    * corpus (12-token sentences), derive a deterministic cleaned REWRITE
    * (per 7-sentence block: sentence 3 dropped, 5+6 merged, a 10-char
    * filler appended after 7), and align raw against rewrite — the DP
    * must RECOVER the constructed move mix from lengths alone
    * (GaleChurchSpec pins it per-block). Output: id, n_src, n_tgt, and
    * the unpacked cost + move counters, one row per document.
    *
    * Arrays stage as passthrough columns between selects (the
    * CollapseProject trap — an inlined token array re-splits per
    * element).
    */
  def selfRewriteAlign(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val empty = array().cast("array<string>")
    val toksed = df
      .select(col(idCol), T.tokens(col(textCol)).as("__tk"))
      .select(col(idCol), col("__tk"),
        least(ceil(size(col("__tk")) / lit(12.0)).cast("int"), lit(21))
          .as("__nsrc"))
    val srcd = toksed
      .select(col(idCol), col("__tk"), col("__nsrc"),
        when(col("__nsrc") === 0, empty).otherwise(
          transform(sequence(lit(0), col("__nsrc") - 1),
            b => concat_ws(" ", slice(col("__tk"), b * 12 + 1, lit(12)))))
          .as("__src"))
    def keep(p: Column) =
      when(p <= col("__nsrc"), array(element_at(col("__src"), p)))
        .otherwise(array().cast("array<string>"))
    val tgtd = srcd
      .select(col(idCol), col("__src"), col("__nsrc"),
        when(col("__nsrc") === 0, empty).otherwise(
          flatten(transform(
            sequence(lit(0), ceil(col("__nsrc") / lit(7.0)).cast("int") - 1),
            b => concat(
              keep(b * 7 + 1), keep(b * 7 + 2), keep(b * 7 + 4),
              when(b * 7 + 6 <= col("__nsrc"),
                array(concat_ws(" ", element_at(col("__src"), b * 7 + 5),
                  element_at(col("__src"), b * 7 + 6))))
                .when(b * 7 + 5 <= col("__nsrc"),
                  array(element_at(col("__src"), b * 7 + 5)))
                .otherwise(array().cast("array<string>")),
              keep(b * 7 + 7),
              // filler length 10: absorbing it into the preceding
              // sentence as a 1-2 split (rel(L, L+10) + 300) must cost
              // more than the flat 0-1 (350) for every fixture sentence
              // length L ≤ 95
              when(b * 7 + 7 <= col("__nsrc"), array(lit("ins xx ygz")))
                .otherwise(array().cast("array<string>"))))))
          .as("__tgt"))
    // stage the packed value as an ATTRIBUTE before the 7-way unpack —
    // referenced as an expression it would re-run the DP per output
    // column (CollapseProject keeps multi-referenced non-cheap
    // expressions staged, same guard the token arrays rely on)
    tgtd
      .select(col(idCol), size(col("__src")).cast("long").as("n_src"),
        size(col("__tgt")).cast("long").as("n_tgt"),
        packedAlign(col("__src"), col("__tgt")).as("__p"))
      .select(Seq(col(idCol), col("n_src"), col("n_tgt")) ++
        unpack(col("__p")): _*)
  }
}
