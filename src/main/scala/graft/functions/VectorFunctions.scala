package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over ARRAY&lt;FLOAT&gt; / ARRAY&lt;DOUBLE&gt;.
  *
  * Re-expresses the reference's scoring kernels as declarative,
  * whole-stage-codegen-friendly higher-order array expressions:
  *   - cosine scan: reference `shard/fallback_numpy_index.py:22-24`,
  *     `shard/src/cuda/flat_kernels.cu:4-24`
  *   - L2 scan:     reference `shard/fallback_numpy_index.py:26-28`,
  *     `shard/src/cuda/flat_kernels.cu:26-45`
  *   - L2 normalization at ingest: reference
  *     `shard/fallback_numpy_index.py:11-13`, `shard/include/flat_index.hpp:21-26`
  *
  * All arithmetic is done in DOUBLE regardless of the input element type so
  * results are stable across engines (the DuckDB oracle computes in double too).
  */
object VectorFunctions {

  /** Epsilon guard on norms, matching the reference
    * (`shard/fallback_numpy_index.py:11` uses 1e-12).
    */
  val NormEps = 1e-12

  private def d(c: Column): Column = c.cast("double")

  /** Σ aᵢ·bᵢ (computed in double). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (acc, x) => acc + x)

  /** Σ aᵢ² — squared L2 norm. */
  def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + d(x) * d(x))

  /** L2 norm with the reference's epsilon guard (never zero). */
  def normSafe(a: Column): Column = greatest(sqrt(norm2(a)), lit(NormEps))

  /** Row-wise L2 normalization (ingest-time invariant of the reference).
    * Output element type DOUBLE.
    */
  def l2Normalize(a: Column): Column = {
    val n = normSafe(a)
    transform(a, x => d(x) / n)
  }

  /** Cosine similarity (guarded against zero vectors). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (normSafe(a) * normSafe(b))

  /** Negated squared L2 distance as a similarity (higher = better),
    * the reference's declared "l2" contract (`coordinator/main.py:75`,
    * `flat_kernels.cu:44`).
    */
  def negSqL2(a: Column, b: Column): Column =
    -aggregate(zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0), (acc, x) => acc + x)

  /** The reference CPU fallback's actual l2 semantics: stored rows are
    * L2-normalized at ingest but the query is used RAW
    * (`shard/fallback_numpy_index.py:26-28` on rows normalized at `:11-13`).
    * Algebraically: -‖x/‖x‖ − q‖² = -(1 − 2·(x·q)/‖x‖ + ‖q‖²).
    * Kept as the documented quirk per SURVEY.md §1.2.
    */
  def refL2Score(x: Column, q: Column): Column =
    -(lit(1.0) - lit(2.0) * dot(x, q) / normSafe(x) + norm2(q))
}
