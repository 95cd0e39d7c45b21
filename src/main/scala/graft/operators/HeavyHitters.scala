package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Bounded-memory heavy-hitter mining: a mergeable Misra-Gries sketch
  * finds the CANDIDATE frequent terms in one pass with ≤ k counters per
  * partial buffer, then an exact recount of only those candidates makes
  * the final answer exact and deterministic.
  *
  * Why not just `groupBy(term).count()` (which `q_vocab_topn` does)? At
  * 100 TB web scale the term universe — including typos, ids, and
  * numeric noise — is effectively unbounded, so a full-vocabulary
  * aggregation shuffles every distinct string at least once. Misra-Gries
  * caps the shuffle at (partitions × k) counters TOTAL regardless of
  * vocabulary size, and the follow-up exact pass touches only the ≤ k
  * surviving candidates (a broadcast-set scan filter, map-side-combined
  * count over a k-bounded key set).
  *
  * Correctness is not "approximate": Misra-Gries guarantees every term
  * with true frequency > n/(k+1) survives the sketch (and the
  * subtract-(k+1)-th merge preserves that bound across partials —
  * Agarwal et al., "Mergeable Summaries", PODS 2012). The exact recount
  * then produces true counts for all candidates, so the returned top-N
  * is provably the global top-N whenever its smallest count clears
  * n/(k+1) — which `topTerms` certifies at runtime from the same
  * sketch pass (it carries the total), throwing rather than silently
  * returning an uncertified list.
  *
  * Reference anchor: generalizes the bounded-buffer discipline of the
  * reference's top-k scan (`shard/src/flat_index.hpp:39-53`) from
  * scores to frequencies.
  */
object HeavyHitters {

  /** One-pass mergeable Misra-Gries sketch over a token stream.
    * Buffer and result are (total items seen, eviction events, term →
    * residual count); residuals underestimate true counts by at most
    * total/(k+1). `evictions == 0` is a PROOF the sketch holds the full
    * vocabulary with exact counts (nothing was ever decremented or
    * trimmed) — certification uses it to accept genuinely-small
    * vocabularies.
    *
    * The buffer is an immutable persistent map: O(log k) node
    * allocations per token on the increment path. A
    * TypedImperativeAggregate with a mutable open-addressed buffer is
    * the known next optimization if the sketch pass ever dominates a
    * profile — the algorithmic shape (partial per partition, one
    * k-bounded merge) would not change.
    */
  class MisraGriesAgg(k: Int)
      extends Aggregator[String, (Long, Long, Map[String, Long]), (Long, Long, Map[String, Long])] {
    require(k >= 1)

    override def zero: (Long, Long, Map[String, Long]) = (0L, 0L, Map.empty)

    override def reduce(b: (Long, Long, Map[String, Long]),
                        term: String): (Long, Long, Map[String, Long]) = {
      val (n, ev, m) = b
      m.get(term) match {
        case Some(c) => (n + 1, ev, m.updated(term, c + 1))
        case None if m.size < k => (n + 1, ev, m.updated(term, 1L))
        // full and unseen: decrement every counter (dropping zeros) and
        // discard the item — each such event burns k+1 total count, so
        // it happens ≤ n/(k+1) times: O(n) amortized for the whole pass
        case None =>
          (n + 1, ev + 1, m.collect { case (t, c) if c > 1 => t -> (c - 1) })
      }
    }

    override def merge(a: (Long, Long, Map[String, Long]),
                       b: (Long, Long, Map[String, Long])): (Long, Long, Map[String, Long]) = {
      val m = mutable.HashMap.empty[String, Long]
      a._3.foreach { case (t, c) => m.update(t, c) }
      b._3.foreach { case (t, c) => m.update(t, m.getOrElse(t, 0L) + c) }
      var ev = a._2 + b._2
      val trimmed =
        if (m.size <= k) m.toMap
        else {
          // subtract the (k+1)-th largest residual from everything and
          // drop the non-positive — the mergeability construction that
          // keeps the n/(k+1) error bound additive across partials
          val counts = m.values.toArray
          java.util.Arrays.sort(counts)
          val sub = counts(counts.length - (k + 1))
          ev += 1
          m.iterator.collect { case (t, c) if c > sub => t -> (c - sub) }.toMap
        }
      (a._1 + b._1, ev, trimmed)
    }

    override def finish(r: (Long, Long, Map[String, Long])): (Long, Long, Map[String, Long]) = r
    override def bufferEncoder: Encoder[(Long, Long, Map[String, Long])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[(Long, Long, Map[String, Long])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Misra-Gries sketch that emits the top-`n` (term, residual count)
    * pairs directly — the form that drops into GROUPED aggregation via
    * `functions.udaf` (per-group driver-side recounts don't exist, so
    * unlike `topTerms` there is no second exact pass: counts are
    * residuals, exact while a group's vocabulary ≤ k, conservative
    * under-estimates beyond — the same exact-under-capacity contract as
    * the other sketches). Output structs are (cnt desc, term asc)
    * sorted.
    */
  class MgTopAgg(k: Int, n: Int)
      extends Aggregator[String, (Long, Long, Map[String, Long]), Seq[(String, Long)]] {
    require(n >= 1 && k >= n)
    private val mg = new MisraGriesAgg(k)
    override def zero: (Long, Long, Map[String, Long]) = mg.zero
    override def reduce(b: (Long, Long, Map[String, Long]), t: String): (Long, Long, Map[String, Long]) =
      mg.reduce(b, t)
    override def merge(a: (Long, Long, Map[String, Long]),
                       b: (Long, Long, Map[String, Long])): (Long, Long, Map[String, Long]) =
      mg.merge(a, b)
    override def finish(r: (Long, Long, Map[String, Long])): Seq[(String, Long)] =
      r._3.toSeq.sortBy { case (t, c) => (-c, t) }.take(n)
    override def bufferEncoder: Encoder[(Long, Long, Map[String, Long])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Exact top-`n` most frequent tokens of `textCol` (count desc, term
    * asc tie-break), computed at bounded shuffle width via the sketch +
    * recount pattern above. Throws IllegalStateException when the
    * certification bound fails (n-th count ≤ total/(k+1)) — raise `k`.
    */
  def topTerms(docs: DataFrame, textCol: String, n: Int,
               k: Int = 1024, certify: Boolean = true): DataFrame = {
    require(n >= 1 && k > n, "need k > n for a certifiable top-n")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(explode(T.tokens(col(textCol))).as("term"))
    val (total, evictions, counters) =
      toks.as[String].select(new MisraGriesAgg(k).toColumn).head()
    val cands = counters.keys.toSeq
    val out = toks
      .filter(col("term").isInCollection(cands)) // broadcast-set scan filter
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(n)
    if (certify && total > 0) {
      // one recount execution: certify from the collected rows AND return
      // them as a local frame (the recount scan must not run twice on a
      // corpus-sized input)
      val got = out.collect()
      val bound = total / (k + 1).toLong
      // certified-exact iff (a) no eviction ever fired — the sketch
      // provably holds the FULL vocabulary with exact residuals, so any
      // result length (a genuinely-small vocabulary!) is complete — or
      // (b) n rows whose smallest count clears the retention bound.
      // Fewer than n rows WITH evictions means true top-n terms may be
      // hidden — that must throw, not silently truncate.
      val ok = evictions == 0L ||
        (got.length == n && got.last.getLong(1) > bound)
      if (!ok) throw new IllegalStateException(
        s"heavy-hitter top-$n uncertified: ${got.length} candidate(s), " +
          s"smallest count ${if (got.isEmpty) "-" else got.last.getLong(1)} vs " +
          s"n/(k+1) bound $bound — a true top-$n term may have been evicted " +
          s"from the sketch; raise k (currently $k)")
      spark.createDataFrame(
        spark.sparkContext.parallelize(got.toSeq, 1), out.schema)
    } else out
  }
}
