package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, VectorFunctions => V}
import graft.operators.TopK
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is an operator from SURVEY.md §2 (or a
  * north-star extension) expressed through the graft library; `oracleSql`
  * holds the DuckDB-equivalent ANSI SQL the driver hash-compares against.
  * Float outputs are rounded (in BOTH engines) so double-precision
  * summation-order differences can't flip the hash.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_topk_cosine")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // O4+O6+O7: full-scan cosine top-k — the reference's core search path.
    // Query vector = embeddings row vec_id=0 (self-contained). The 1-row
    // query side is broadcast; scoring is a codegen'd higher-order
    // expression; orderBy+limit plans as TakeOrderedAndProject
    // (per-partition heap + driver merge = shard/coordinator two-phase).
    "q_topk_cosine" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val q = e.filter($"vec_id" === 0).select($"embedding".as("qe"))
      val scored = e.crossJoin(broadcast(q))
        .withColumn("c", V.cosine($"embedding", $"qe"))
      TopK.topK(scored, $"c", $"vec_id", 10)
        .select($"vec_id", round($"c", 6).as("score"))
    }),

    // O5: the reference CPU path's l2 (normalized rows, raw query) — the
    // documented quirk from SURVEY.md §1.2, kept as its own operator.
    "q_topk_l2" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val q = e.filter($"vec_id" === 7).select($"embedding".as("qe"))
      val scored = e.crossJoin(broadcast(q))
        .withColumn("c", V.refL2Score($"embedding", $"qe"))
      TopK.topK(scored, $"c", $"vec_id", 10)
        .select($"vec_id", round($"c", 6).as("score"))
    }),

    // O3: ingest-time L2 normalization invariant — per-row norm before and
    // after normalize (after must be 1 for non-degenerate rows).
    "q_normalize" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "embeddings")
        .select($"vec_id",
          round(sqrt(V.norm2($"embedding")), 6).as("raw_norm"),
          round(sqrt(V.norm2(V.l2Normalize($"embedding"))), 6).as("unit_norm"))
        .orderBy($"vec_id")
    }),

    // O1: routed write placement — exact md5-mod-N shard replica
    // (coordinator/main.py:43-45), N=8; distribution per shard.
    "q_shard_route" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "embeddings")
        .select(HashFunctions.shardHash($"vec_id", 8).as("shard"))
        .groupBy($"shard").agg(count(lit(1)).as("n"))
        .orderBy($"shard")
    }),

    // O9 count/health analogue: rows per label class.
    "q_count_by_label" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "embeddings")
        .groupBy($"label").agg(count(lit(1)).as("n"))
        .orderBy($"label")
    }),

    // Extension (SURVEY §2.2 aggregations): TPC-H Q1-style pricing summary.
    "q1_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
          round(avg($"l_quantity"), 4).as("avg_qty"),
          round(avg($"l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    })
  )

  // ---------------------------------------------------------------- oracles

  def oracleSql: Map[String, String] = Map(

    "q_topk_cosine" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |pairs AS (
        |  SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS x, unnest(q.qe)::DOUBLE AS y
        |  FROM embeddings e CROSS JOIN q),
        |agg AS (
        |  SELECT vec_id, SUM(x*y) AS dp, SUM(x*x) AS nx2, SUM(y*y) AS ny2
        |  FROM pairs GROUP BY vec_id),
        |sc AS (
        |  SELECT vec_id,
        |         dp / (GREATEST(SQRT(nx2), 1e-12) * GREATEST(SQRT(ny2), 1e-12)) AS c
        |  FROM agg)
        |SELECT vec_id, ROUND(c, 6) AS score
        |FROM sc ORDER BY c DESC, vec_id LIMIT 10""".stripMargin,

    "q_topk_l2" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 7),
        |pairs AS (
        |  SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS x, unnest(q.qe)::DOUBLE AS y
        |  FROM embeddings e CROSS JOIN q),
        |agg AS (
        |  SELECT vec_id, SUM(x*y) AS dp, SUM(x*x) AS nx2, SUM(y*y) AS ny2
        |  FROM pairs GROUP BY vec_id),
        |sc AS (
        |  SELECT vec_id,
        |         -(1.0 - 2.0 * dp / GREATEST(SQRT(nx2), 1e-12) + ny2) AS c
        |  FROM agg)
        |SELECT vec_id, ROUND(c, 6) AS score
        |FROM sc ORDER BY c DESC, vec_id LIMIT 10""".stripMargin,

    "q_normalize" ->
      """WITH n AS (
        |  SELECT vec_id, SQRT(SUM(x*x)) AS nrm FROM (
        |    SELECT vec_id, unnest(embedding)::DOUBLE AS x FROM embeddings)
        |  GROUP BY vec_id)
        |SELECT vec_id, ROUND(nrm, 6) AS raw_norm,
        |       ROUND(CASE WHEN nrm < 1e-12 THEN 0.0 ELSE 1.0 END, 6) AS unit_norm
        |FROM n ORDER BY vec_id""".stripMargin,

    "q_shard_route" ->
      """WITH h AS (
        |  SELECT md5(vec_id::VARCHAR) AS hx FROM embeddings),
        |c AS (
        |  SELECT ('0x'||substr(hx, 1,8))::BIGINT AS c0,
        |         ('0x'||substr(hx, 9,8))::BIGINT AS c1,
        |         ('0x'||substr(hx,17,8))::BIGINT AS c2,
        |         ('0x'||substr(hx,25,8))::BIGINT AS c3 FROM h),
        |m AS (
        |  SELECT (((((c0 % 8) * 4294967296 + c1) % 8) * 4294967296 + c2) % 8
        |          * 4294967296 + c3) % 8 AS shard FROM c)
        |SELECT shard, COUNT(*) AS n FROM m GROUP BY shard ORDER BY shard""".stripMargin,

    "q_count_by_label" ->
      "SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label ORDER BY label",

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
        |  ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  ROUND(AVG(l_quantity), 4) AS avg_qty,
        |  ROUND(AVG(l_discount), 4) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
