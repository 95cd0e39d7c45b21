package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.FloatVectorExpressions.dotF
import graft.expressions.JaroWinkler.jaroWinklerF
import graft.expressions.TextHashExpressions.{minhashSigF, simhash32F}
import graft.functions.{HashFunctions, TextFunctions => T, UrlFunctions, VectorFunctions => V}
import graft.operators.{Align, Ann, AsofJoin, Bm25, BpeTrain, Classifier, Collocations, Coreset, CountMin, Curation, Dedup, DistinctSketch, Ewma, GraphOps, HeavyHitters, Hierarchy, Mining, Multimodal, Packing, PageRank, Privacy, QuantileSketch, Rerank, RuntimeFilter, Sampling, SftPrep, SkewJoin, Sparse, Tfidf, TextEval, TextTiling, TopK, TrigramLm, UnigramLm, Validation}
import graft.rag.Rag
import graft.sources.{Layout, Tables}
import graft.streaming.{HnswIndex, Streaming}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is an operator from SURVEY.md §2 (or a
  * north-star extension) expressed through the graft library; `oracleSql`
  * holds the DuckDB-equivalent ANSI SQL the driver hash-compares against.
  * Float outputs produced by arithmetic are rounded (in BOTH engines) so
  * double summation-order differences can't flip the hash; raw parquet
  * doubles pass through un-rounded (bit-identical in both engines).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Register a scratch directory for recursive deletion at JVM exit —
    * idempotent per path, so re-running the query in one session adds
    * only one hook. Exit-time (not eager) because the caller returns a
    * LAZY plan that still reads the directory.
    */
  private val jsonlTmpRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def jsonlTmpCleanup(d: java.io.File): Unit =
    if (jsonlTmpRegistered.add(d.getAbsolutePath)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          val kids = f.listFiles()
          if (kids != null) kids.foreach(rm)
          f.delete(): Unit
        }
        rm(d)
      }))
    }

  /** Build-once cache for synthesized media fixtures. The generative
    * md5 builders cost far more than the operators under test (72 md5
    * calls per image), so benchmark timings of fixture-heavy queries
    * measured mostly fixture construction (VERDICT r6 nit). First call
    * per (kind, dir) materializes the builder's output to a
    * session-scoped temp parquet (deleted at JVM exit via
    * [[jsonlTmpCleanup]]); later calls — the bench's timed runs, or a
    * sibling query sharing the fixture — read the parquet. Correctness
    * is unchanged: the parquet holds exactly the deterministic rows the
    * builder produces, and the DuckDB oracle replays the same
    * generative formula either way.
    */
  private val fixtureCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def mediaFixture(s: SparkSession, dir: String, kind: String)
                          (build: => DataFrame): DataFrame = {
    val path = fixtureCache.computeIfAbsent(kind + "@" + dir, _ => {
      val d = java.nio.file.Files.createTempDirectory("graft_fixture_").toFile
      jsonlTmpCleanup(d)
      val p = new java.io.File(d, kind).getAbsolutePath
      build.write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** The q_dhash_neardup / q_dhash_sweep fixture: 9×8 PPMs (the dHash
    * grid itself, so resize is the identity) with GROUP-seeded pixels
    * except ONE doc-chosen pixel re-seeded per doc — group members
    * differ in ≤ 2 pixels ⇒ ≤ 4 flipped hash bits. Built once per
    * (session, dir) via [[mediaFixture]]; both queries read the same
    * parquet.
    */
  private def dhashFixture(s: SparkSession, dir: String): DataFrame =
    mediaFixture(s, dir, "dhash") {
      import s.implicits._
      def md5hex(str: String): String =
        graft.expressions.Md5Kernel
          .digest(str.getBytes("UTF-8")).map("%02x".format(_)).mkString
      def h60(str: String): Long =
        java.lang.Long.parseLong(md5hex(str).substring(0, 15), 16)
      t(s, dir, "documents").select($"doc_id").as[Long]
        .map { id =>
          val py = (h60(id + ":py") % 8).toInt
          val px0 = (h60(id + ":px") % 9).toInt
          val px = new Array[Byte](9 * 8 * 3)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 9) {
              val seed =
                (if (y == py && x == px0) id + ":p:" else (id % 50) + "gd:") +
                  y + ":" + x
              val hex = md5hex(seed)
              var c = 0
              while (c < 3) {
                px((y * 9 + x) * 3 + c) =
                  Integer.parseInt(hex.substring(c * 2, c * 2 + 2), 16).toByte
                c += 1
              }
              x += 1
            }
            y += 1
          }
          (id, graft.operators.Multimodal.Ppm.encode(
            graft.operators.Multimodal.Ppm.Image(9, 8, 255, px)))
        }.toDF("doc_id", "bin")
    }

  /** The q_video_dedup / q_video_dedup_e2e fixture: replicated-clip
    * groups — EVEN-index frames seed from the GROUP id (doc_id % 50),
    * odd from the doc. Built once per (session, dir).
    */
  private def videoGroupFixture(s: SparkSession, dir: String): DataFrame =
    mediaFixture(s, dir, "vidgrp") {
      import s.implicits._
      def md5hex(str: String): String =
        graft.expressions.Md5Kernel
          .digest(str.getBytes("UTF-8")).map("%02x".format(_)).mkString
      def h60(str: String): Long =
        java.lang.Long.parseLong(md5hex(str).substring(0, 15), 16)
      t(s, dir, "documents").select($"doc_id").as[Long]
        .map { id =>
          val nf = (2 + h60(id + ":n") % 5).toInt
          val frames = (0 until nf).map { f =>
            val key = if (f % 2 == 0) (id % 50) + "g:" + f else id + ":" + f
            val px = new Array[Byte](48)
            var block = -1
            var hex = ""
            var j = 0
            while (j < 48) {
              if (j / 16 != block) { block = j / 16; hex = md5hex(key + ":" + block) }
              px(j) = Integer.parseInt(
                hex.substring((j % 16) * 2, (j % 16) * 2 + 2), 16).toByte
              j += 1
            }
            graft.operators.Multimodal.Ppm.Image(4, 4, 255, px)
          }
          (id, graft.operators.Multimodal.Video.encode(frames))
        }.toDF("doc_id", "bin")
    }

  /** The q_audio_dedup / q_audio_segments fixture: group-seeded even
    * windows, doc-seeded odd windows (the audio mirror of
    * [[videoGroupFixture]]). `silence4` additionally zeroes every
    * w%4==3 window — the q_audio_dedup_gated variant.
    */
  private def audioGroupFixture(s: SparkSession, dir: String,
                                silence4: Boolean = false): DataFrame =
    mediaFixture(s, dir, if (silence4) "audgrp_sil" else "audgrp") {
      import s.implicits._
      def md5hex(str: String): String =
        graft.expressions.Md5Kernel
          .digest(str.getBytes("UTF-8")).map("%02x".format(_)).mkString
      def h60(str: String): Long =
        java.lang.Long.parseLong(md5hex(str).substring(0, 15), 16)
      t(s, dir, "documents").select($"doc_id").as[Long]
        .map { id =>
          val nw = (2 + h60(id + ":nw") % 5).toInt
          val samples = new Array[Short](16 * nw)
          var w = 0
          while (w < nw) {
            if (!(silence4 && w % 4 == 3)) {
              val seed = if (w % 2 == 0) (id % 50) + "ga:" + w
                else id + ":aw:" + w
              val hex = Array(md5hex(seed + ":0"), md5hex(seed + ":1"))
              var j = 0
              while (j < 16) {
                val bi = 2 * j
                def byteAt(k: Int): Int = Integer.parseInt(
                  hex(k / 16).substring((k % 16) * 2, (k % 16) * 2 + 2), 16)
                samples(16 * w + j) = ((byteAt(bi + 1) << 8) | byteAt(bi)).toShort
                j += 1
              }
            }
            w += 1
          }
          (id, graft.operators.Multimodal.Wav.encode(
            graft.operators.Multimodal.Wav.Audio(8000, 1, samples)))
        }.toDF("doc_id", "bin")
    }

  /** The q_shot_detect fixture: frame content changes every 3 frames. */
  private def shotDetectFixture(s: SparkSession, dir: String): DataFrame =
    mediaFixture(s, dir, "shotdet") {
      import s.implicits._
      def md5hex(str: String): String =
        graft.expressions.Md5Kernel
          .digest(str.getBytes("UTF-8")).map("%02x".format(_)).mkString
      def h60(str: String): Long =
        java.lang.Long.parseLong(md5hex(str).substring(0, 15), 16)
      t(s, dir, "documents").select($"doc_id").as[Long]
        .map { id =>
          val nf = (4 + h60(id + ":nsh") % 9).toInt
          val frames = (0 until nf).map { f =>
            val key = id + ":sh:" + (f / 3)
            val px = new Array[Byte](48)
            var block = -1
            var hex = ""
            var j = 0
            while (j < 48) {
              if (j / 16 != block) { block = j / 16; hex = md5hex(key + ":" + block) }
              px(j) = Integer.parseInt(
                hex.substring((j % 16) * 2, (j % 16) * 2 + 2), 16).toByte
              j += 1
            }
            graft.operators.Multimodal.Ppm.Image(4, 4, 255, px)
          }
          (id, graft.operators.Multimodal.Video.encode(frames))
        }.toDF("doc_id", "bin")
    }

  /** The q_shot_dedup_e2e fixture: 2..4 shots of 3 identical frames,
    * (doc_id % 3) doc-unique prefix shots then up to two GROUP-seeded
    * shots at shifted positions.
    */
  private def shotDedupFixture(s: SparkSession, dir: String): DataFrame =
    mediaFixture(s, dir, "shotgrp") {
      import s.implicits._
      def md5hex(str: String): String =
        graft.expressions.Md5Kernel
          .digest(str.getBytes("UTF-8")).map("%02x".format(_)).mkString
      def h60(str: String): Long =
        java.lang.Long.parseLong(md5hex(str).substring(0, 15), 16)
      t(s, dir, "documents").select($"doc_id").as[Long]
        .map { id =>
          val nsh = (2 + h60(id + ":nsd") % 3).toInt
          val pre = (id % 3).toInt
          val frames = (0 until nsh * 3).map { f =>
            val sIdx = f / 3
            val key = if (sIdx >= pre && sIdx - pre < 2)
              (id % 50) + "gs:" + (sIdx - pre)
            else id + ":pd:" + sIdx
            val px = new Array[Byte](48)
            var block = -1
            var hex = ""
            var j = 0
            while (j < 48) {
              if (j / 16 != block) { block = j / 16; hex = md5hex(key + ":" + block) }
              px(j) = Integer.parseInt(
                hex.substring((j % 16) * 2, (j % 16) * 2 + 2), 16).toByte
              j += 1
            }
            graft.operators.Multimodal.Ppm.Image(4, 4, 255, px)
          }
          (id, graft.operators.Multimodal.Video.encode(frames))
        }.toDF("doc_id", "bin")
    }

  /** Quantize a float score for cross-engine comparison AND canonicalize
    * the zero sign: Spark's `round` (BigDecimal-based) maps -0.0 → +0.0
    * while DuckDB's ROUND keeps -0.0, and the driver's hash compares bit
    * patterns — adding literal 0.0 forces +0.0 in both engines (IEEE:
    * -0.0 + 0.0 = +0.0). Every oracle uses the same `ROUND(c, n) + 0.0`.
    * Top-k membership and threshold filters are then decided on the
    * QUANTIZED value (ADVICE r1): double summation order differs between
    * engines, so comparing unrounded sums can flip borderline rows.
    */
  private def score6(c: Column): Column = round(c, 6) + lit(0.0)
  private def score4(c: Column): Column = round(c, 4) + lit(0.0)

  /** Round-robin repartition to full parallelism before compute-heavy
    * per-row work. The local fixtures are single-row-group parquet files,
    * so the scan yields ONE partition and per-row kernels (shingling,
    * MinHash, pairwise scoring) run on one core of 32; the same situation
    * occurs at cluster scale whenever the upstream layout under-splits
    * (few huge gzip/row-group files). The shuffle moves only the raw rows
    * (cheap) and is explicit-numPartitions, so AQE will not coalesce it
    * back down.
    */
  private def spread(s: SparkSession, df: DataFrame): DataFrame =
    df.repartition(s.sparkContext.defaultParallelism)

  /** q_rbo_rankers shared constants (query + oracle built from the SAME
    * values). Weight(d) = (1-p)p^(d-1)/d scaled by 10^10·2520 with
    * p = 9/10: (1-p)p^(d-1) = 9^(d-1)/10^d, and every d ≤ 10 divides
    * 2520 = lcm(1..10), so each weight is an exact Long and the RBO sum
    * is pure integer arithmetic in both engines.
    */
  private val RboQids: Seq[Long] = Seq(7L, 42L, 99L, 123L, 256L)
  private val RboWeights: Seq[Long] = (0 until 10).map(i =>
    (BigInt(9).pow(i) * BigInt(10).pow(9 - i) * (2520 / (i + 1))).toLong)
  private val RboDenom: Double = 2520.0 * 1e10

  /** Power-iteration CTE chain (oracle side of `powerIterTop`): ex
    * zips (pos, x); per iteration y = per-vector micro-dot with v,
    * u = per-pos micro-sum of y·x, v = ROUND(u / max|u|, 6).
    */
  private lazy val pcaCtesSql: String = {
    def iter(k: Int): String =
      s"""y$k AS (
         |  SELECT e.vec_id,
         |    SUM(CAST(ROUND(e.x * v.v * 1000000, 0) AS BIGINT)) AS ym
         |  FROM ex e JOIN v${k - 1} v USING (pos) GROUP BY e.vec_id),
         |u$k AS (
         |  SELECT e.pos, SUM(CAST(ROUND(y.ym * e.x, 0) AS BIGINT)) AS um
         |  FROM ex e JOIN y$k y USING (vec_id) GROUP BY e.pos),
         |m$k AS (SELECT MAX(ABS(um))::DOUBLE AS m FROM u$k),
         |v$k AS MATERIALIZED (
         |  SELECT pos, ROUND(um::DOUBLE / m, 6) + 0.0 AS v FROM u$k, m$k)"""
        .stripMargin
    s"""WITH ex AS MATERIALIZED (
       |  SELECT vec_id, unnest(generate_series(1, 64)) AS pos,
       |         unnest(embedding)::DOUBLE AS x
       |  FROM embeddings),
       |v0 AS (SELECT unnest(generate_series(1, 64)) AS pos, 1.0 AS v),
       |${(1 to 3).map(iter).mkString(",\n")}""".stripMargin
  }

  /** Dominant embedding direction after 3 power iterations — shared by
    * q_pca_top (reports it) and q_abtt (projects it out). See the
    * q_pca_top comment for the exactness discipline; returns the
    * L∞-normalized round-6 direction.
    */
  private def powerIterTop(s: SparkSession, dir: String,
                           dim: Int = 64): Seq[Double] = {
    import s.implicits._
    val ex = spread(s, t(s, dir, "embeddings"))
      .select($"vec_id", $"embedding").localCheckpoint(false)
    var v: Seq[Double] = Seq.fill(dim)(1.0)
    for (_ <- 1 to 3) {
      val vLit = typedLit(v)
      val u = ex
        .withColumn("ym", aggregate(
          zip_with($"embedding", vLit, (x, vv) =>
            round(x.cast("double") * vv * lit(1000000.0), 0).cast("long")),
          lit(0L), (acc, x) => acc + x))
        .select($"ym", posexplode($"embedding").as(Seq("pos", "x")))
        .groupBy($"pos")
        .agg(sum(round($"ym".cast("double") * $"x".cast("double"), 0)
          .cast("long")).as("um"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val m = (0 until dim).map(j => math.abs(u.getOrElse(j, 0L))).max.toDouble
      v = (0 until dim).map { j =>
        java.math.BigDecimal.valueOf(u.getOrElse(j, 0L).toDouble / m)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0
      }
    }
    v
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_topk_cosine")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    vectorQueries ++ relationalQueries ++ eventsQueries ++ textQueries ++
      dedupQueries ++ extraQueries ++ round5Queries ++ round6Queries ++
      round7Queries ++ round8Queries ++ round9Queries ++ round10Queries ++
      round11Queries ++ round12Queries ++ round13Queries

  def oracleSql: Map[String, String] =
    vectorOracles ++ relationalOracles ++ eventsOracles ++ textOracles ++
      dedupOracles ++ extraOracles ++ round5Oracles ++ round6Oracles ++
      round7Oracles ++ round8Oracles ++ round9Oracles ++ round10Oracles ++
      round11Oracles ++ round12Oracles ++ round13Oracles

  // ======================================================= vector workload

  private def vectorQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // O4+O6+O7: full-scan cosine top-k — the reference's core search path.
    // 1-row query side broadcast; scoring via codegen'd higher-order exprs;
    // orderBy+limit plans as TakeOrderedAndProject (per-partition heap +
    // driver merge = the reference's shard/coordinator two-phase top-k).
    "q_topk_cosine" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val q = e.filter($"vec_id" === 0).select($"embedding".as("qe"))
      val scored = e.crossJoin(broadcast(q))
        .withColumn("score", score6(V.cosine($"embedding", $"qe")))
      TopK.topK(scored, $"score", $"vec_id", 10)
        .select($"vec_id", $"score")
    }),

    // O5: the reference CPU path's l2 (normalized rows, raw query) — the
    // documented quirk from SURVEY.md §1.2, kept as its own operator.
    "q_topk_l2" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val q = e.filter($"vec_id" === 7).select($"embedding".as("qe"))
      val scored = e.crossJoin(broadcast(q))
        .withColumn("score", score6(V.refL2Score($"embedding", $"qe")))
      TopK.topK(scored, $"score", $"vec_id", 10)
        .select($"vec_id", $"score")
    }),

    // O5 declared contract: -‖x−q‖² over UNIT vectors both sides (the GPU
    // path's actual semantics, SURVEY.md §1.2) — rank-equivalent to cosine.
    "q_topk_l2_decl" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val q = e.filter($"vec_id" === 7)
        .select(V.l2Normalize($"embedding").as("qn"))
      val scored = e.crossJoin(broadcast(q))
        .withColumn("score",
          score6(V.negSqL2(V.l2Normalize($"embedding"), $"qn")))
      TopK.topK(scored, $"score", $"vec_id", 10)
        .select($"vec_id", $"score")
    }),

    // O3: ingest-time L2 normalization invariant.
    "q_normalize" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "embeddings")
        .select($"vec_id",
          round(sqrt(V.norm2($"embedding")), 6).as("raw_norm"),
          round(sqrt(V.norm2(V.l2Normalize($"embedding"))), 6).as("unit_norm"))
        .orderBy($"vec_id")
    }),

    // O1: routed write placement — exact md5-mod-N shard replica
    // (coordinator/main.py:43-45), N=8.
    "q_shard_route" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "embeddings")
        .select(HashFunctions.shardHash($"vec_id", 8).as("shard"))
        .groupBy($"shard").agg(count(lit(1)).as("n"))
        .orderBy($"shard")
    }),

    // O9 count/health analogue.
    "q_count_by_label" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "embeddings")
        .groupBy($"label").agg(count(lit(1)).as("n"))
        .orderBy($"label")
    }),

    // Metadata-filtered search — the capability the reference's dropped
    // `meta` field gestures at (SURVEY §2.2): filter BEFORE scoring so
    // Catalyst prunes the scan.
    "q_filtered_topk" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val q = e.filter($"vec_id" === 3).select($"embedding".as("qe"))
      val scored = e.filter($"label" === 5).crossJoin(broadcast(q))
        .withColumn("score", score6(V.cosine($"embedding", $"qe")))
      TopK.topK(scored, $"score", $"vec_id", 5)
        .select($"vec_id", $"label", $"score")
    })
  )

  private def vectorOracles: Map[String, String] = Map(

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
        |         ROUND(dp / (GREATEST(SQRT(nx2), 1e-12) * GREATEST(SQRT(ny2), 1e-12)), 6)
        |           + 0.0 AS score
        |  FROM agg)
        |SELECT vec_id, score
        |FROM sc ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

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
        |         ROUND(-(1.0 - 2.0 * dp / GREATEST(SQRT(nx2), 1e-12) + ny2), 6)
        |           + 0.0 AS score
        |  FROM agg)
        |SELECT vec_id, score
        |FROM sc ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    "q_topk_l2_decl" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 7),
        |pairs AS (
        |  SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS x, unnest(q.qe)::DOUBLE AS y
        |  FROM embeddings e CROSS JOIN q),
        |agg AS (
        |  SELECT vec_id, SUM(x*y) AS dp, SUM(x*x) AS nx2, SUM(y*y) AS ny2
        |  FROM pairs GROUP BY vec_id),
        |sc AS (
        |  SELECT vec_id,
        |         ROUND(-(nx2 / (GREATEST(SQRT(nx2), 1e-12) * GREATEST(SQRT(nx2), 1e-12))
        |                 - 2.0 * dp / (GREATEST(SQRT(nx2), 1e-12) * GREATEST(SQRT(ny2), 1e-12))
        |                 + ny2 / (GREATEST(SQRT(ny2), 1e-12) * GREATEST(SQRT(ny2), 1e-12))), 6)
        |           + 0.0 AS score
        |  FROM agg)
        |SELECT vec_id, score
        |FROM sc ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    "q_normalize" ->
      """WITH n AS (
        |  SELECT vec_id, SQRT(SUM(x*x)) AS nrm FROM (
        |    SELECT vec_id, unnest(embedding)::DOUBLE AS x FROM embeddings)
        |  GROUP BY vec_id)
        |SELECT vec_id, ROUND(nrm, 6) AS raw_norm,
        |       ROUND(CASE WHEN nrm >= 1e-12 THEN 1.0 ELSE nrm / 1e-12 END, 6) AS unit_norm
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

    "q_filtered_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 3),
        |pairs AS (
        |  SELECT e.vec_id, e.label, unnest(e.embedding)::DOUBLE AS x, unnest(q.qe)::DOUBLE AS y
        |  FROM embeddings e CROSS JOIN q WHERE e.label = 5),
        |agg AS (
        |  SELECT vec_id, label, SUM(x*y) AS dp, SUM(x*x) AS nx2, SUM(y*y) AS ny2
        |  FROM pairs GROUP BY vec_id, label),
        |sc AS (
        |  SELECT vec_id, label,
        |         ROUND(dp / (GREATEST(SQRT(nx2), 1e-12) * GREATEST(SQRT(ny2), 1e-12)), 6)
        |           + 0.0 AS score
        |  FROM agg)
        |SELECT vec_id, label, score
        |FROM sc ORDER BY score DESC, vec_id LIMIT 5""".stripMargin
  )

  // ======================================================== relational ops

  private def relationalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Aggregation sweep (SURVEY §2.2): TPC-H Q1-style pricing summary.
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
    }),

    // Multi-way join with broadcast dims (TPC-H Q5-flavored): revenue per
    // nation in ASIA, 1996-1998. nation/region are broadcast; the big
    // lineitem⋈orders join shuffles on orderkey only.
    "q5_join" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders").filter(year($"o_orderdate").between(1996, 1998))
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region").filter($"r_name" === "ASIA")
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .join(c, $"o_custkey" === $"c_custkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"revenue".desc, $"n_name")
    }),

    // Window ranking: top-3 orders per customer (O6 per-key top-k idiom).
    "q_window_topk" -> ((s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      TopK.topKPerKey(o, Seq($"o_custkey"), $"o_totalprice", $"o_orderkey", 3)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice")
        .orderBy($"o_custkey", $"o_totalprice".desc, $"o_orderkey")
    }),

    // Left-semi join (EXISTS): segments of customers with ≥1 order in 2000.
    "q_semi_join" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(year($"o_orderdate") === 2000)
      c.join(o, $"c_custkey" === $"o_custkey", "left_semi")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy($"c_mktsegment")
    }),

    // Left-anti join (NOT EXISTS): customers with no orders in 2001.
    "q_anti_join" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(year($"o_orderdate") === 2001)
      c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey").orderBy($"c_custkey")
    }),

    // Hierarchical aggregation: ROLLUP(returnflag, linestatus).
    "q_rollup" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(round(sum($"l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    }),

    // Set operations: INTERSECT ∪ EXCEPT over customer/supplier nations.
    "q_setops" -> ((s, dir) => {
      import s.implicits._
      val cn = t(s, dir, "customer").select($"c_nationkey".as("nk"))
      val sn = t(s, dir, "supplier").select($"s_nationkey".as("nk"))
      cn.intersect(sn).union(cn.except(sn)).orderBy($"nk")
    })
  )

  private def relationalOracles: Map[String, String] = Map(

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
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q5_join" ->
      """SELECT n_name,
        |  ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND year(o_orderdate) BETWEEN 1996 AND 1998
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,

    "q_semi_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND year(o_orderdate) = 2000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND year(o_orderdate) = 2001)
        |ORDER BY c_custkey""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_setops" ->
      """SELECT nk FROM (
        |  (SELECT c_nationkey AS nk FROM customer
        |   INTERSECT
        |   SELECT s_nationkey AS nk FROM supplier)
        |  UNION ALL
        |  (SELECT c_nationkey AS nk FROM customer
        |   EXCEPT
        |   SELECT s_nationkey AS nk FROM supplier)
        |) ORDER BY nk""".stripMargin
  )

  // ===================================================== events / temporal

  private def eventsQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // O10 analogue: fixed-bucket histogram (the reference's Prometheus
    // latency histogram as a bucketed count agg).
    "q_histogram" -> ((s, dir) => {
      import s.implicits._
      val bucket = when($"value" <= 10, 0).when($"value" <= 50, 1)
        .when($"value" <= 100, 2).when($"value" <= 250, 3).otherwise(4)
      t(s, dir, "events")
        .withColumn("bucket_id", bucket)
        .groupBy($"bucket_id")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
        .orderBy($"bucket_id")
    }),

    // O18 analogue: exact percentiles per event type.
    "q_percentile" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"event_type")
        .agg(expr("percentile(value, array(0.5, 0.95, 0.99))").as("ps"))
        .select($"event_type",
          round($"ps".getItem(0), 4).as("p50"),
          round($"ps".getItem(1), 4).as("p95"),
          round($"ps".getItem(2), 4).as("p99"))
        .orderBy($"event_type")
    }),

    // Sessionization: 30-min-gap sessions per user (lag + running flag sum).
    "q_sessionize" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts")
      t(s, dir, "events")
        .withColumn("prev", lag($"ts", 1).over(w))
        .withColumn("newsess",
          when($"prev".isNull ||
            ($"ts".cast("double") - $"prev".cast("double")) > 1800.0, 1L).otherwise(0L))
        .groupBy($"user_id")
        .agg(sum($"newsess").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy($"user_id")
    }),

    // Tumbling-window aggregation (batch twin of the streaming pipeline).
    "q_tumbling" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .withColumn("hour", date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss"))
        .groupBy($"hour")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
        .orderBy($"hour")
    }),

    // As-of join: for each error event, the latest prior click of the same
    // user (single-shuffle union+window — graft.operators.AsofJoin).
    "q_asof_join" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val errors = ev.filter($"event_type" === "error")
        .select($"event_id", $"user_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"value")
      AsofJoin.asofJoin(errors, clicks, Seq("user_id"), "ts", "ts")
        .select($"event_id", $"user_id",
          date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("err_ts"),
          date_format($"asof.ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"),
          $"asof.value".as("click_value"))
        .orderBy($"event_id")
    }),

    // Semi-structured extraction: JSON props → typed aggregation.
    "q_props_json" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .withColumn("k", get_json_object($"props", "$.k").cast("int"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), round(avg($"k"), 4).as("avg_k"))
        .orderBy($"event_type")
    })
  )

  private def eventsOracles: Map[String, String] = Map(

    "q_histogram" ->
      """SELECT CASE WHEN value <= 10 THEN 0 WHEN value <= 50 THEN 1
        |            WHEN value <= 100 THEN 2 WHEN value <= 250 THEN 3
        |            ELSE 4 END AS bucket_id,
        |       COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
        |FROM events GROUP BY bucket_id ORDER BY bucket_id""".stripMargin,

    "q_percentile" ->
      """SELECT event_type,
        |  ROUND(quantile_cont(value, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(value, 0.95), 4) AS p95,
        |  ROUND(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, ts,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM events),
        |s AS (
        |  SELECT user_id,
        |         CASE WHEN prev IS NULL OR epoch(ts - prev) > 1800.0
        |              THEN 1 ELSE 0 END AS ns
        |  FROM x)
        |SELECT user_id, CAST(SUM(ns) AS BIGINT) AS n_sessions,
        |       COUNT(*) AS n_events
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |       COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
        |FROM events GROUP BY hour ORDER BY hour""".stripMargin,

    "q_asof_join" ->
      """SELECT e.event_id, e.user_id,
        |       strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS err_ts,
        |       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
        |       c.value AS click_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
        |ASOF LEFT JOIN
        |     (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id AND c.ts <= e.ts
        |ORDER BY e.event_id""".stripMargin,

    "q_props_json" ->
      """SELECT event_type, COUNT(*) AS n,
        |       ROUND(AVG(json_extract(props, '$.k')::INT), 4) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )

  // ========================================================= text pipeline

  private def textQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // O11+O13: word chunker (table-generating) + deterministic chunk ids.
    "q_chunk" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", posexplode(T.chunks($"text", 20)).as(Seq("chunk_idx", "chunk")))
        .withColumn("chunk_id", T.chunkId($"doc_id", $"chunk_idx", $"chunk"))
        .orderBy($"doc_id", $"chunk_idx")
    }),

    // Token counting + length stats.
    "q_token_stats" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id",
          size(T.tokens($"text")).cast("long").as("n_tokens"),
          length($"text").cast("long").as("len"))
        .orderBy($"doc_id")
    }),

    // Quality scoring (length saturation × stopword presence).
    "q_text_quality" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id",
          size(T.tokens($"text")).cast("long").as("n_tokens"),
          T.punctCount($"text").cast("long").as("punct_cnt"),
          round(T.qualityScore($"text"), 4).as("quality"))
        .orderBy($"doc_id")
    }),

    // Z-order (Morton) interleaving of two key dimensions — the
    // multi-dimensional data-skipping layout (sources/Layout.zValue2):
    // sorting by zval clusters rows close in BOTH keys into the same
    // files so min/max stats prune two-sided box predicates.
    // LayoutSpec measures the file-skipping advantage; this query
    // oracle-checks the bit interleaving itself.
    "q_zorder" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_orderkey" <= 200)
        .select($"l_orderkey", $"l_linenumber", $"l_partkey",
          Layout.zValue2(pmod($"l_orderkey", lit(256L)),
            pmod($"l_partkey", lit(256L)), 8).as("zval"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // Product-quantized ANN (the memory half of IVF-PQ, Jégou et al.
    // 2011): 64-dim float vectors → 8 subspace codes against
    // first-16-vector codebooks; query scoring reads a micro-unit ADC
    // lookup table, so stored vectors never need their floats at query
    // time. Encode is a pure per-row projection; the LUT is a per-query
    // driver literal. operators/Ann PQ section.
    "q_ann_pq" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cb = e.filter($"vec_id" < 16).orderBy($"vec_id")
        .select($"embedding").collect().map(_.getSeq[Float](0)).toSeq
      val qv = e.filter($"vec_id" === 42).select($"embedding").head.getSeq[Float](0)
      val lut = Ann.pqLut(qv, cb, 8)
      val scored = spread(s, e)
        .withColumn("codes", Ann.pqEncode($"embedding", cb, 8))
        .withColumn("score", Ann.pqAdcScore($"codes", lut))
      TopK.topK(scored, $"score", $"vec_id", 10)
        .select($"vec_id", $"score")
    }),

    // Binary-quantization search: 32-bit SRP sign sketch per vector
    // (32x+ compression), candidates by Hamming distance on the sketch
    // (popcount of XOR — the cheapest possible scan), exact-cosine
    // rerank of the bounded candidate set. The modern BQ+rescore
    // pattern; composes the SRP kernel with a two-stage k-bounded plan.
    "q_bq_search" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val sk = spread(s, e).withColumn("sketch",
          element_at(graft.expressions.SrpExpression.srpBandsF(
            $"embedding", 1, 32, 7L), 1))
        .localCheckpoint(false) // query-row lookup + candidate scan
      val qrow = sk.filter($"vec_id" === 42)
        .select($"sketch", $"embedding").head
      val qsk = qrow.getLong(0)
      val qv = qrow.getSeq[Float](1)
      sk.withColumn("ham",
          bit_count($"sketch".bitwiseXOR(lit(qsk))).cast("long"))
        .orderBy($"ham".asc, $"vec_id".asc).limit(100)
        .withColumn("score", score6(V.cosine($"embedding", typedLit(qv))))
        .orderBy($"score".desc, $"vec_id".asc).limit(10)
        .select($"vec_id", $"ham", $"score")
    }),

    // ColBERT-style late interaction (MaxSim): treat the 64-dim vector
    // as 4 × 16-dim "token vectors"; score = Σ over query slices of the
    // max slice-cosine against any doc slice. Pure per-row projection
    // (16 codegen dots/row); per-slice maxima quantize to micro-units
    // before the fixed-order sum so both engines total identically.
    "q_late_interaction" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val qv = e.filter($"vec_id" === 42).head.getSeq[Float](1)
      def dslice(dj: Int) = slice($"embedding", dj * 16 + 1, 16)
      def dnorm(dj: Int) =
        greatest(sqrt(dotF(dslice(dj), dslice(dj))), lit(V.NormEps))
      val perQuerySlice = (0 until 4).map { qi =>
        val qs = qv.slice(qi * 16, qi * 16 + 16)
        val qn = math.max(math.sqrt(qs.map(x => x.toDouble * x.toDouble).sum),
          V.NormEps)
        val maxCos = greatest((0 until 4).map(dj =>
          round(dotF(dslice(dj), typedLit(qs)) / (dnorm(dj) * lit(qn)), 6)): _*)
        round(maxCos * 1000000).cast("long")
      }
      val scored = spread(s, e).withColumn("score",
        round(perQuerySlice.reduce(_ + _).cast("double") / 1000000.0, 6)
          + lit(0.0))
      TopK.topK(scored, $"score", $"vec_id", 10)
        .select($"vec_id", $"score")
    }),

    // Matryoshka (MRL) truncated-dimension search: score on the FIRST
    // 16 of 64 dims (cosine over the slice) — the
    // truncate-and-renormalize trade MRL-trained embeddings support,
    // cutting scan FLOPs 4x at modest recall cost.
    "q_mrl_search" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val qv = e.filter($"vec_id" === 42).head.getSeq[Float](1)
      val scored = spread(s, e)
        .withColumn("score",
          score6(V.cosine(slice($"embedding", 1, 16), typedLit(qv.take(16)))))
      TopK.topK(scored, $"score", $"vec_id", 10)
        .select($"vec_id", $"score")
    }),

    // Scalar-quantized (SQ8) search: per-dimension [min,max] train, one
    // byte per dimension (4x compression), asymmetric midpoint-dequant
    // scoring against the raw query in integer micro-units. The
    // accuracy/memory middle tier between the exact flat scan and PQ.
    // operators/Ann SQ section.
    "q_sq_search" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val (mn, mx) = Ann.sqTrain(e, "embedding")
      val qv = e.filter($"vec_id" === 42).select($"embedding").head.getSeq[Float](0)
      val scored = spread(s, e)
        .withColumn("codes", Ann.sqEncode($"embedding", mn, mx))
        .withColumn("score", Ann.sqDot($"codes", qv, mn, mx))
      TopK.topK(scored, $"score", $"vec_id", 10)
        .select($"vec_id", $"score")
    }),

    // IVF-PQ composition (FAISS IVFPQ): cell routing prunes the scan,
    // ADC over PQ codes replaces full-precision scoring in the probed
    // cells — both per-row projections over in-literal tables.
    "q_ann_ivfpq" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val cb = e.filter($"vec_id" < 16).orderBy($"vec_id")
        .select($"embedding").collect().map(_.getSeq[Float](0)).toSeq
      val qv = e.filter($"vec_id" === 42).select($"embedding").head.getSeq[Float](0)
      Ann.searchIvfPq(spread(s, e), cents, "vec_id", "embedding",
        "cent_id", "cvec", cb, 8, qv, 4, 10)
    }),

    // BM25 lexical retrieval (Okapi, +1 idf variant) — the keyword half
    // of hybrid RAG retrieval the reference lacks. Postings prune to the
    // query terms at the scan; per-term scores quantize to integer
    // micro-units before the per-doc sum (order-proof). operators/Bm25.
    "q_bm25" -> ((s, dir) => {
      Bm25.search(spread(s, t(s, dir, "documents")), "doc_id", "text",
        Seq("vector", "join", "scan"), 10)
    }),

    // Retrieve → rerank (operators/Rerank): BM25 top-20 candidates
    // broadcast back to the corpus scan and reorder by coverage of an
    // EXPANDED query term set, ties broken by first-stage score — the
    // second-stage pattern production retrieval runs, with the
    // cross-encoder slot kept deterministic here.
    "q_rerank" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val cands = Bm25.search(spread(s, docs), "doc_id", "text",
        Seq("vector", "join", "scan"), 20)
      Rerank.rerank(cands, docs, "doc_id", "text",
        Seq("vector", "scan", "fast", "table"), 10)
    }),

    // Corpus vocabulary: top-50 tokens by frequency — the term-frequency
    // table tokenizer training and stopword mining start from. One
    // map-side-combined groupBy; the shuffle carries (term, partial
    // count) rows only.
    "q_vocab_topn" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select(explode(T.tokens(lower($"text"))).as("term"))
        .groupBy($"term").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"term".asc)
        .limit(50)
    }),

    // Hybrid retrieval: BM25 top-20 and dense-cosine top-20 fused by
    // reciprocal-rank fusion (Cormack et al. 2009) — the
    // lexical+semantic combination production RAG stacks run. Ranks are
    // integers and rrf is a fixed-order sum of two exact rationals, so
    // the fusion is engine-exact. Fixture convention: embedding i ↔
    // document i.
    "q_hybrid_rrf" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val bm = Bm25.search(spread(s, t(s, dir, "documents")), "doc_id", "text",
          Seq("vector", "join", "scan"), 20)
        .withColumn("rank",
          row_number().over(Window.orderBy($"score".desc, $"doc_id".asc)))
        .select($"doc_id".as("id"), $"rank")
      val e = t(s, dir, "embeddings")
      val qv = e.filter($"vec_id" === 42).select($"embedding").head.getSeq[Float](0)
      val vec = TopK.topK(
          e.withColumn("score", score6(V.cosine($"embedding", typedLit(qv)))),
          $"score", $"vec_id", 20)
        .withColumn("rank",
          row_number().over(Window.orderBy($"score".desc, $"vec_id".asc)))
        .select($"vec_id".as("id"), $"rank")
      TopK.topK(Bm25.rrfFuse(bm, vec, "id", "rank"), $"rrf", $"id", 10)
        .select($"id", $"rrf")
    }),

    // Corpus health report: per-source quality/length/language profile —
    // the one-pass aggregate a curation team reads before choosing
    // mixture weights and filter thresholds. Single groupBy over
    // per-row codegen metrics; integer/quantized outputs for
    // engine-exact comparison.
    "q_corpus_stats" -> ((s, dir) => {
      import s.implicits._
      spread(s, t(s, dir, "documents"))
        .select($"source",
          size(T.tokens($"text")).cast("long").as("n_toks"),
          length($"text").cast("long").as("n_chars"),
          round(T.qualityScore($"text"), 4).as("q"),
          T.fingerprint($"text").as("fp"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_toks").as("total_tokens"),
          sum($"n_chars").as("total_chars"),
          // exact-integer mean: sum quantized q as LONG (order-proof),
          // divide once — avg(double) would drift with summation order
          sum(round($"q" * 10000).cast("long")).as("__q4"),
          countDistinct($"fp").as("n_unique"))
        .select($"source", $"n_docs", $"total_tokens", $"total_chars",
          round($"__q4".cast("double") / ($"n_docs" * 10000.0), 4)
            .as("avg_quality"),
          $"n_unique")
        .orderBy($"source")
    }),

    // Language-ID heuristic vs the labeled lang column.
    "q_langid" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .withColumn("pred_lang", T.langId($"text"))
        .groupBy($"lang", $"pred_lang").agg(count(lit(1)).as("n"))
        .orderBy($"lang", $"pred_lang")
    }),

    // End-to-end corpus curation (operators/Curation): PII redact →
    // quantized quality/repetition gates → exact dedup → LSH near-dup
    // removal → deterministic mixture sampling, all in one composed
    // pipeline. Each stage has its own oracle query; this one
    // oracle-checks the COMPOSITION (stage order is part of the
    // contract — see Curation.scala).
    "q_curation" -> ((s, dir) => {
      import s.implicits._
      Curation.curate(spread(s, t(s, dir, "documents")),
          "doc_id", "text", "source",
          rates = Map("src0" -> 0.8, "src1" -> 0.5), defaultRate = 0.6)
        .orderBy($"doc_id")
    }),

    // Concat-and-chunk sequence packing at context length 256: docs are
    // concatenated per source in doc_id order and chunked into
    // fixed-token-budget training sequences; each doc reports the
    // sequence and offset where it starts. One window cumsum per
    // packing group, integer arithmetic throughout (Packing.scala).
    "q_seq_pack" -> ((s, dir) => {
      import s.implicits._
      val d = spread(s, t(s, dir, "documents"))
        .select($"doc_id", $"source", T.bpeTokenCount($"text").cast("long").as("n_tokens"))
      Packing.packSequences(d, Seq($"source"), $"doc_id", $"n_tokens", 256)
        .select($"doc_id", $"source", $"n_tokens", $"seq_idx", $"seq_offset")
        .orderBy($"doc_id")
    }),

    // Gopher/MassiveText repetition filters (Rae et al. 2021 table A1):
    // duplicate-token fraction, duplicate-2-gram fraction, most-repeated
    // 2-gram count, and the fraction of characters inside repeated
    // tokens. Per-row HOF compute with integer cores — scan-speed over
    // 100 TB, no shuffle.
    "q_repetition" -> ((s, dir) => {
      import s.implicits._
      import graft.expressions.RepeatStats.repeatStatsF
      // ALL four metrics derive from two RepeatStats structs (one kernel
      // pass over the tokens, one over the 2-grams) — composing the
      // per-metric helpers instead would re-evaluate tokens()/the 2-gram
      // build once per metric tree (6×/3× per row, measured 13 s vs
      // ~1 s at sf0.1)
      val toks = T.tokens($"text")
      def dupFrac(st: Column): Column =
        when(st.getField("n") === 0, lit(0.0))
          .otherwise(lit(1.0) - st.getField("n_distinct").cast("double") /
            st.getField("n").cast("double"))
      spread(s, t(s, dir, "documents"))
        .select($"doc_id",
          repeatStatsF(toks).as("st"),
          repeatStatsF(T.ngramsOfTokens(toks, 2)).as("sg"))
        .select($"doc_id",
          round(dupFrac($"st"), 4).as("dup_tok_frac"),
          round(dupFrac($"sg"), 4).as("dup_2gram_frac"),
          $"sg".getField("max_repeat").cast("long").as("max_2gram_count"),
          round(when($"st".getField("total_chars") === 0, lit(0.0))
            .otherwise($"st".getField("rep_chars").cast("double") /
              $"st".getField("total_chars").cast("double")), 4).as("rep_char_frac"))
        .orderBy($"doc_id")
    }),

    // Perplexity filtering (operators/TrigramLm): char-trigram LM with
    // add-one smoothing trained on the corpus, per-doc mean negative
    // log-likelihood in integer micro-units — the CCNet/LLaMA-style
    // statistical quality gate. The model is bounded (≤ ~50k trigrams)
    // so it broadcasts at any corpus size.
    "q_trigram_lm" -> ((s, dir) => {
      import s.implicits._
      val docs = spread(s, t(s, dir, "documents"))
      TrigramLm.score(docs, "doc_id", "text", TrigramLm.train(docs, "text"))
        .orderBy($"doc_id")
    }),

    // Model-based quality filter (fasttext-style hashed-feature linear
    // classifier, operators/Classifier): bag of hashed words, fixed
    // md5-derived integer slot weights, mean weight as the doc logit —
    // integer-exact reduction so both engines score bit-for-bit.
    "q_quality_classifier" -> ((s, dir) => {
      import s.implicits._
      spread(s, t(s, dir, "documents"))
        .withColumn("toks", T.tokens($"text"))
        .select($"doc_id",
          Classifier.logit($"toks").as("logit"),
          Classifier.keep($"toks").as("keep"))
        .orderBy($"doc_id")
    }),

    // C4-style page cleaning (Raffel et al. 2020 §2.2): keep lines that
    // end in terminal punctuation, have >=3 words, and don't mention
    // javascript; page gate drops lorem-ipsum/brace pages. The fixture
    // text has no newlines, so each doc becomes a deterministic 5-line
    // page (same derivation both engines): a good lead line, a too-short
    // line, a javascript line, a lorem line on every 7th doc, a tail.
    "q_c4_clean" -> ((s, dir) => {
      import s.implicits._
      spread(s, t(s, dir, "documents"))
        .withColumn("page", concat_ws("\n",
          concat(substring($"text", 1, 60), lit(" end.")),
          lit("too short"),
          lit("enable javascript to view this page."),
          when(pmod($"doc_id", lit(7)) === 0, lit("lorem ipsum dolor sit amet."))
            .otherwise(concat(substring($"text", 61, 50), lit(" fine!"))),
          concat(substring($"text", 111, 40), lit(" really?"))))
        .select($"doc_id",
          T.c4CleanLines($"page").as("clean"),
          size(filter(split($"page", "\n"), l => T.c4KeepLine(l)))
            .cast("long").as("n_kept"),
          size(split($"page", "\n")).cast("long").as("n_total"),
          T.c4PageOk($"page").as("page_ok"))
        .orderBy($"doc_id")
    }),

    // CCNet-style corpus-wide paragraph dedup (Dedup.stripBoilerplate):
    // lines repeating >= 3 times ACROSS the corpus (newsletter chrome,
    // footers) are stripped from every page; unique content survives in
    // order. Pages are synthesized deterministically (fixture text has
    // no newlines): two universal boilerplate lines, a per-doc-unique
    // line, and a thirds-rotated line.
    "q_boilerplate" -> ((s, dir) => {
      import s.implicits._
      val pages = spread(s, t(s, dir, "documents"))
        .withColumn("page", concat_ws("\n",
          lit("subscribe to our newsletter today"),
          concat(substring($"text", 1, 50), lit(" #"), $"doc_id"),
          when(pmod($"doc_id", lit(3)) === 0, lit("promo code spark"))
            .otherwise(concat(substring($"text", 51, 60), lit(" tail"))),
          lit("all rights reserved")))
        .select($"doc_id", $"page")
      Dedup.stripBoilerplate(pages, "doc_id", "page", 3)
        .orderBy($"doc_id")
    }),

    // PII redaction for corpus cleaning: emails/IPv4s/phone-shaped runs →
    // typed placeholders, plus the per-doc audit count. The fixture text
    // carries no PII, so each doc gets a deterministic synthetic
    // email + phone + IP appended (same derivation both engines) — the
    // oracle then verifies real redaction behavior, not a no-op.
    "q_pii_redact" -> ((s, dir) => {
      import s.implicits._
      spread(s, t(s, dir, "documents"))
        .withColumn("txt", concat($"text",
          lit(" contact user"), $"doc_id".cast("string"),
          lit("@mail.example.com or +1 (415) 555-01"),
          lpad(pmod($"doc_id", lit(100)).cast("string"), 2, "0"),
          lit(" from 10.0."), pmod($"doc_id", lit(256)).cast("string"), lit(".7")))
        .select($"doc_id",
          T.redactPii($"txt").as("clean"),
          T.piiCount($"txt").as("n_pii"))
        .orderBy($"doc_id")
    }),

    // Exact-dedup fingerprint groups (md5 of collapsed lower-cased text).
    "q_fingerprint" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .groupBy(T.fingerprint($"text").as("fp"))
        .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("canonical"))
        .orderBy($"fp")
    }),

    // Multimodal plumbing: opaque BINARY payload + (stubbed) decode into
    // typed metadata and a feature vector — per-row columnar compute.
    "q_multimodal" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .withColumn("bin", Multimodal.payload($"text"))
        .withColumn("meta", Multimodal.fakeDecodeMeta($"bin"))
        .withColumn("f", Multimodal.fakeFeatures($"bin", 4))
        .select($"doc_id",
          $"meta.n_bytes".as("n_bytes"), $"meta.width".as("width"),
          $"meta.height".as("height"), $"meta.format".as("format"),
          round(element_at($"f", 1), 4).as("f0"),
          round(element_at($"f", 2), 4).as("f1"),
          round(element_at($"f", 3), 4).as("f2"),
          round(element_at($"f", 4), 4).as("f3"))
        .orderBy($"doc_id")
    }),

    // O15: RAG context assembly — top-4 cosine hits joined to documents,
    // ordered string aggregation into one context blob.
    "q_rag_context" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val q = e.filter($"vec_id" === 0).select($"embedding".as("qe"))
      val top = TopK.topK(
        e.crossJoin(broadcast(q))
          .withColumn("score", score6(V.cosine($"embedding", $"qe"))),
        $"score", $"vec_id", 4)
      val docs = t(s, dir, "documents")
      top.join(docs, top("vec_id") === docs("doc_id"))
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(
              (-$"score").as("negs"), $"vec_id".as("vid"),
              substring($"text", 1, 40).as("t")))),
            x => concat(lit("- "), x.getField("t"))),
          "\n\n").as("context"))
        .select(lit(0L).as("query_id"), $"context")
    }),

    // O16: prompt assembly — the full ask-path template
    // (`rag_demo/ask.py:26-33`): top-4 context blob + question threaded
    // through the format_string template that ends the Rag.ask pipeline
    // (generation itself stays the pluggable Generator boundary).
    "q_rag_prompt" -> ((s, dir) => {
      import s.implicits._
      val question = "what do the top documents say?"
      val ctx = queries("q_rag_context")(s, dir)
      ctx.select($"query_id",
        format_string(
          "Answer strictly from the context.\n\nContext:\n%s\n\nQuestion: %s\nAnswer:",
          $"context", lit(question)).as("prompt"))
    })
  )

  // ================================================== dedup / similarity

  private def dedupQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Embedding-cosine near-dup pairs (brute force at this scale; the LSH
    // and IVF variants below are the 100 TB paths). Norms are computed
    // ONCE per row before the O(n²) pair join — r1 recomputed both norms
    // per pair inside interpreted HOF lambdas (57 s at sf0.1); pair cost
    // is now a single codegen'd float dot product (≪1 s). The threshold
    // filters on the QUANTIZED score so borderline pairs can't flip
    // between engines.
    "q_embed_neardup" -> ((s, dir) => {
      import s.implicits._
      val e = spread(s, t(s, dir, "embeddings"))
        .select($"vec_id", $"embedding",
          greatest(sqrt(dotF($"embedding", $"embedding")), lit(V.NormEps)).as("nrm"))
        .localCheckpoint(false) // both self-join sides consume this
      val a = e.select($"vec_id".as("id_a"), $"embedding".as("ea"), $"nrm".as("na"))
      val b = e.select($"vec_id".as("id_b"), $"embedding".as("eb"), $"nrm".as("nb"))
      a.join(b, $"id_a" < $"id_b")
        .withColumn("score", score4(dotF($"ea", $"eb") / ($"na" * $"nb")))
        .filter($"score" >= 0.4)
        .select($"id_a", $"id_b", $"score")
        .orderBy($"id_a", $"id_b")
    }),

    // SemDeDup (Abbas et al. 2023): semantic dedup at scale — k-means
    // cells bound the pairwise search, so the O(n²) cosine join runs
    // only WITHIN each cell (cluster-then-dedup; the embedding analog of
    // LSH bucketing). Composes Ann.ivfAssign (zero-shuffle argmax) with
    // the quantized pairwise cosine; emits within-cell near-dup pairs.
    "q_semantic_dedup" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val assigned = Ann.ivfAssign(spread(s, e), cents,
          "vec_id", "embedding", "cent_id", "cvec")
        .select($"vec_id", $"cell_id", $"embedding",
          greatest(sqrt(dotF($"embedding", $"embedding")), lit(V.NormEps)).as("nrm"))
        .localCheckpoint(false) // both self-join sides consume this
      val a = assigned.select($"cell_id", $"vec_id".as("id_a"),
        $"embedding".as("ea"), $"nrm".as("na"))
      val b = assigned.select($"cell_id", $"vec_id".as("id_b"),
        $"embedding".as("eb"), $"nrm".as("nb"))
      a.join(b, Seq("cell_id")).filter($"id_a" < $"id_b")
        .withColumn("score", score4(dotF($"ea", $"eb") / ($"na" * $"nb")))
        .filter($"score" >= 0.4)
        .select($"cell_id", $"id_a", $"id_b", $"score")
        .orderBy($"id_a", $"id_b")
    }),

    // Word-2-gram Jaccard near-dup pairs, blocked by source.
    "q_ngram_jaccard" -> ((s, dir) => {
      import s.implicits._
      // shingle table materialized once (localCheckpoint) — the self-join
      // would otherwise re-run the scan + shingle kernel on both sides
      val sh = spread(s, t(s, dir, "documents"))
        .select($"doc_id", $"source", Dedup.shingles($"text", 2).as("sh"))
        .filter(size($"sh") > 0)
        .localCheckpoint(false)
      val a = sh.select($"doc_id".as("doc_a"), $"source", $"sh".as("sha"))
      val b = sh.select($"doc_id".as("doc_b"), $"source", $"sh".as("shb"))
      a.join(b, Seq("source")).filter($"doc_a" < $"doc_b")
        .withColumn("j", Dedup.jaccard($"sha", $"shb"))
        .filter($"j" >= 0.05)
        .select($"doc_a", $"doc_b", round($"j", 4).as("jaccard"))
        .orderBy($"doc_a", $"doc_b")
    }),

    // MinHash signature → LSH band hashes (the bucketing state itself,
    // dense hash-parity check of the whole pipeline). Signatures via the
    // native single-pass kernel (TextHashExpressions.minhashSigF) — the
    // interpreted HOF formulation cost r1 943 s on q_minhash_lsh.
    "q_minhash_bands" -> ((s, dir) => {
      import s.implicits._
      spread(s, t(s, dir, "documents"))
        .select($"doc_id", Dedup.shingles($"text", 2).as("sh"))
        .filter(size($"sh") > 0)
        .withColumn("sig", minhashSigF($"sh", 16))
        .select($"doc_id", posexplode(Dedup.bandHashes($"sig", 4, 4))
          .as(Seq("band_idx", "band_hash")))
        .orderBy($"doc_id", $"band_idx")
    }),

    // Full MinHash-LSH near-dup dedup: band-bucket candidate pairs,
    // verified by true shingle Jaccard ≥ 0.2. Only (band, hash, id)
    // tuples reach the bucket-join shuffle; the shingle-set verify joins
    // are plain shuffle joins (no broadcast of the big shingle table —
    // at 100 TB that side never fits a broadcast) and the Jaccard is a
    // zero-allocation sorted-merge count.
    "q_minhash_lsh" -> ((s, dir) => {
      import s.implicits._
      // materialized once: the signature stage and both verify-join sides
      // consume this table (see Dedup.nearDupPairs)
      val sh = spread(s, t(s, dir, "documents"))
        .select($"doc_id", Dedup.shingles($"text", 2).as("sh"))
        .filter(size($"sh") > 0)
        .localCheckpoint(false)
      val withBands = sh
        .withColumn("sig", minhashSigF($"sh", 16))
        .withColumn("bands", Dedup.bandHashes($"sig", 4, 4))
      val cands = Dedup.lshCandidatePairs(
        withBands.select($"doc_id", $"bands"), "doc_id", "bands")
      cands
        .join(sh.select($"doc_id".as("id_a"), $"sh".as("sha")), "id_a")
        .join(sh.select($"doc_id".as("id_b"), $"sh".as("shb")), "id_b")
        .withColumn("j", Dedup.jaccard($"sha", $"shb"))
        .filter($"j" >= 0.2)
        .select($"id_a".as("doc_a"), $"id_b".as("doc_b"), round($"j", 4).as("jaccard"))
        .orderBy($"doc_a", $"doc_b")
    }),

    // Hot-bucket-capped MinHash-LSH: same pipeline as q_minhash_lsh but
    // with a pathological bucket built in (doc 0's text replicated 64×)
    // and the cap ACTIVE (maxBucket = 8). Over-cap buckets route to
    // star pairs against the bucket minimum — linear output, no member
    // list ever collected (Dedup.lshCandidatePairs). The oracle
    // replicates the routing bit-for-bit.
    "q_minhash_lsh_capped" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val base = d.filter($"doc_id" < 40).select($"doc_id", $"text")
      val hot = d.filter($"doc_id" === 0).select($"text")
        .crossJoin(s.range(64).select(($"id" + 10000L).as("doc_id")))
        .select($"doc_id", $"text")
      val sh = spread(s, base.unionByName(hot))
        .select($"doc_id", Dedup.shingles($"text", 2).as("sh"))
        .filter(size($"sh") > 0)
        .localCheckpoint(false)
      val withBands = sh
        .withColumn("sig", minhashSigF($"sh", 16))
        .withColumn("bands", Dedup.bandHashes($"sig", 4, 4))
      val cands = Dedup.lshCandidatePairs(
        withBands.select($"doc_id", $"bands"), "doc_id", "bands", maxBucket = 8)
      cands
        .join(sh.select($"doc_id".as("id_a"), $"sh".as("sha")), "id_a")
        .join(sh.select($"doc_id".as("id_b"), $"sh".as("shb")), "id_b")
        .withColumn("j", Dedup.jaccard($"sha", $"shb"))
        .filter($"j" >= 0.2)
        .select($"id_a".as("doc_a"), $"id_b".as("doc_b"), round($"j", 4).as("jaccard"))
        .orderBy($"doc_a", $"doc_b")
    }),

    // Duplicate CLUSTERS: verified near-dup pairs (the q_minhash_lsh
    // pipeline) closed under transitivity by iterative min-label
    // propagation (Dedup.connectedComponents) — cluster_id = minimum
    // reachable doc. Pairwise "drop id_b" under-merges chains A≈B≈C
    // where (A,C) never collided; component-level canonicalization is
    // what production dedup keeps.
    "q_dedup_clusters" -> ((s, dir) => {
      import s.implicits._
      val pairs = Dedup.nearDupPairs(
        spread(s, t(s, dir, "documents")), "doc_id", "text",
        shingleSize = 2, numHashes = 16, bands = 4, threshold = 0.2)
      Dedup.connectedComponents(pairs, "id_a", "id_b")
        .select($"node".as("doc_id"), $"comp".as("cluster_id"))
        .orderBy($"doc_id")
    }),

    // GPT-3-style benchmark decontamination (`rag_demo` corpus hygiene
    // generalized): count word 3-grams each training doc shares with the
    // benchmark subset (doc_id < 25). Grams fold to 60-bit hashes BEFORE
    // the join — the probe side shuffles (8-byte hash, id) only, and the
    // benchmark hash set (eval sets are tiny next to a 100 TB corpus)
    // broadcasts, so contamination checking is a map-side scan probe.
    "q_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val d = spread(s, t(s, dir, "documents"))
      Dedup.contaminationOverlap(
          d.filter($"doc_id" >= 25), d.filter($"doc_id" < 25),
          "doc_id", "text", 3)
        .orderBy($"doc_id")
    }),

    // Token-budget mixture resampling (the data-mixing step of a
    // training pipeline): per-source keep-rates derived from token
    // totals so the sampled corpus hits target proportions at the
    // largest achievable size (no upsampling); the corpus itself is
    // only touched by a deterministic scan-speed hash gate.
    "q_token_mixture" -> ((s, dir) => {
      import s.implicits._
      val d = spread(s, t(s, dir, "documents"))
        .withColumn("n_tokens", size(T.tokens($"text")).cast("long"))
      val rates = Sampling.tokenMixtureRates(d, $"source", $"n_tokens",
        Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
      Sampling.stratifiedSample(d, $"source", $"doc_id", rates, 0.0)
        .select($"doc_id", $"source", $"n_tokens")
        .orderBy($"doc_id")
    }),

    // Bloom-pre-filtered decontamination: the 100 TB shape — the bench
    // n-gram set rides as a bits-per-key Bloom bitset probed map-side,
    // and only survivors reach the exact verify join. Result is exact
    // (verify join kills FPs), so the oracle is plain overlap SQL.
    "q_bloom_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val d = spread(s, t(s, dir, "documents"))
      Dedup.contaminationOverlapBloom(
          d.filter($"doc_id" >= 25), d.filter($"doc_id" < 25),
          "doc_id", "text", 4)
        .orderBy($"doc_id")
    }),

    // Exact duplicated-SPAN detection — the distributed stand-in for
    // suffix-array dedup (Lee et al. 2022): 8-token windows occurring ≥2×
    // corpus-wide, merged per doc into maximal spans. Native window-hash
    // kernel; only (id, pos, hash60) tuples ever shuffle.
    "q_substring_dedup" -> ((s, dir) => {
      import s.implicits._
      Dedup.duplicatedSpans(spread(s, t(s, dir, "documents")),
          "doc_id", "text", minLen = 8)
        .orderBy($"doc_id")
    }),

    // 32-bit SimHash signatures (native per-row kernel).
    "q_simhash" -> ((s, dir) => {
      import s.implicits._
      spread(s, t(s, dir, "documents"))
        .select($"doc_id", simhash32F(T.tokens($"text")).as("simhash"))
        .orderBy($"doc_id")
    }),

    // SimHash near-dup pairs: Hamming distance ≤ 2 of the 32-bit signature.
    "q_simhash_dups" -> ((s, dir) => {
      import s.implicits._
      val sh = spread(s, t(s, dir, "documents"))
        .select($"doc_id", simhash32F(T.tokens($"text")).as("simhash"))
        .localCheckpoint(false) // both self-join sides consume this
      val a = sh.select($"doc_id".as("doc_a"), $"simhash".as("sa"))
      val b = sh.select($"doc_id".as("doc_b"), $"simhash".as("sb"))
      a.join(b, $"doc_a" < $"doc_b")
        .withColumn("hamming", expr("CAST(bit_count(sa ^ sb) AS INT)"))
        .filter($"hamming" <= 2)
        .select($"doc_a", $"doc_b", $"hamming")
        .orderBy($"doc_a", $"doc_b")
    }),

    // Embedding near-dup at scale: SRP (signed-random-projection) LSH —
    // candidates from band-bucket equality (shuffle carries only
    // (band, value, id) tuples), cosine verify only within buckets.
    // The brute-force q_embed_neardup above is the small-data exact twin.
    "q_srp_neardup" -> ((s, dir) => {
      import s.implicits._
      import graft.expressions.SrpExpression.srpBandsF
      val e = spread(s, t(s, dir, "embeddings"))
        .select($"vec_id", $"embedding",
          greatest(sqrt(dotF($"embedding", $"embedding")), lit(V.NormEps)).as("nrm"))
        .localCheckpoint(false) // bands stage + both verify sides consume this
      val withBands = e.withColumn("bands", srpBandsF($"embedding", 4, 8, 7L))
      val cands = Dedup.lshCandidatePairs(
        withBands.select($"vec_id", $"bands"), "vec_id", "bands")
      cands
        .join(e.select($"vec_id".as("id_a"), $"embedding".as("ea"), $"nrm".as("na")), "id_a")
        .join(e.select($"vec_id".as("id_b"), $"embedding".as("eb"), $"nrm".as("nb")), "id_b")
        .withColumn("score", score4(dotF($"ea", $"eb") / ($"na" * $"nb")))
        .filter($"score" >= 0.4)
        .select($"id_a", $"id_b", $"score")
        .orderBy($"id_a", $"id_b")
    }),

    // IVF approximate nearest neighbor: assign to 16 deterministic
    // centroids, probe the 4 cells nearest the query, scan only those.
    // Probe selection runs driver-side over the (broadcast-small)
    // centroid table — the scan sees a plain partition-prunable isin
    // filter; zero extra jobs or broadcasts per query.
    "q_ann_ivf" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val assigned = Ann.ivfAssign(e, cents, "vec_id", "embedding", "cent_id", "cvec")
      val query = e.filter($"vec_id" === 42).select($"embedding").head.getSeq[Float](0)
      val probes = Ann.probeCellIds(cents, query, "cent_id", "cvec", 4)
      val cand = assigned.filter($"cell_id".isin(probes: _*))
      val scored = cand
        .withColumn("score", score6(V.cosine($"embedding", typedLit(query))))
      TopK.topK(scored, $"score", $"vec_id", 10)
        .select($"vec_id", $"score")
    })
  )

  private def dedupOracles: Map[String, String] = Map(

    "q_semantic_dedup" ->
      """WITH cents AS (
        |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id < 16),
        |pc AS (
        |  SELECT e.vec_id, c.cent_id,
        |         unnest(e.embedding)::DOUBLE x, unnest(c.cvec)::DOUBLE y
        |  FROM embeddings e CROSS JOIN cents c),
        |pagg AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM pc GROUP BY vec_id, cent_id),
        |psc AS (SELECT vec_id, cent_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |        FROM pagg),
        |assign AS (
        |  SELECT vec_id, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
        |    FROM psc) WHERE rn = 1),
        |p AS (
        |  SELECT xa.cell_id, a.vec_id ia, b.vec_id ib,
        |         unnest(a.embedding)::DOUBLE x, unnest(b.embedding)::DOUBLE y
        |  FROM embeddings a JOIN assign xa ON a.vec_id = xa.vec_id
        |  JOIN assign xb ON xb.cell_id = xa.cell_id
        |  JOIN embeddings b ON b.vec_id = xb.vec_id AND a.vec_id < b.vec_id),
        |agg AS (SELECT cell_id, ia, ib, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |        FROM p GROUP BY cell_id, ia, ib),
        |sc AS (SELECT cell_id, ia, ib,
        |         ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 4)
        |           + 0.0 AS score
        |       FROM agg)
        |SELECT cell_id, ia AS id_a, ib AS id_b, score
        |FROM sc WHERE score >= 0.4 ORDER BY id_a, id_b""".stripMargin,

    "q_embed_neardup" ->
      """WITH p AS (
        |  SELECT a.vec_id ia, b.vec_id ib,
        |         unnest(a.embedding)::DOUBLE x, unnest(b.embedding)::DOUBLE y
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
        |agg AS (SELECT ia, ib, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |        FROM p GROUP BY ia, ib),
        |sc AS (SELECT ia, ib,
        |         ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 4)
        |           + 0.0 AS score
        |       FROM agg)
        |SELECT ia AS id_a, ib AS id_b, score
        |FROM sc WHERE score >= 0.4 ORDER BY id_a, id_b""".stripMargin,

    "q_ngram_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id, source, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, source,
        |         list_distinct(list_transform(generate_series(1, len(toks)-1),
        |           i -> toks[i] || ' ' || toks[i+1])) AS sh
        |  FROM t WHERE len(toks) >= 2),
        |p AS (
        |  SELECT a.doc_id da, b.doc_id db,
        |         len(list_intersect(a.sh, b.sh))::DOUBLE AS inter,
        |         len(a.sh) + len(b.sh) AS tot
        |  FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id),
        |j AS (SELECT da, db, inter / (tot - inter) AS jac FROM p)
        |SELECT da AS doc_a, db AS doc_b, ROUND(jac, 4) AS jaccard
        |FROM j WHERE jac >= 0.05 ORDER BY doc_a, doc_b""".stripMargin,

    "q_minhash_bands" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(generate_series(1, len(toks)-1),
        |           i -> toks[i] || ' ' || toks[i+1])) AS sh
        |  FROM t WHERE len(toks) >= 2),
        |sig AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 15), i ->
        |           list_min(list_transform(sh, x ->
        |             ('0x'||substr(md5(i::VARCHAR||':'||x), 1, 15))::BIGINT))) AS sig
        |  FROM s WHERE len(sh) > 0),
        |b AS (
        |  SELECT doc_id, unnest(generate_series(0, 3)) AS band_idx, sig FROM sig)
        |SELECT doc_id, CAST(band_idx AS INT) AS band_idx,
        |       md5(array_to_string(sig[band_idx*4+1 : band_idx*4+4], ',')) AS band_hash
        |FROM b ORDER BY doc_id, band_idx""".stripMargin,

    "q_minhash_lsh" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(generate_series(1, len(toks)-1),
        |           i -> toks[i] || ' ' || toks[i+1])) AS sh
        |  FROM t WHERE len(toks) >= 2),
        |sig AS (
        |  SELECT doc_id, sh,
        |         list_transform(generate_series(0, 15), i ->
        |           list_min(list_transform(sh, x ->
        |             ('0x'||substr(md5(i::VARCHAR||':'||x), 1, 15))::BIGINT))) AS sig
        |  FROM s WHERE len(sh) > 0),
        |bands AS (
        |  SELECT doc_id, band_idx,
        |         md5(array_to_string(sig[band_idx*4+1 : band_idx*4+4], ',')) AS bh
        |  FROM (SELECT doc_id, sig, unnest(generate_series(0, 3)) AS band_idx FROM sig)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id da, b.doc_id db
        |  FROM bands a JOIN bands b
        |    ON a.band_idx = b.band_idx AND a.bh = b.bh AND a.doc_id < b.doc_id),
        |j AS (
        |  SELECT da, db,
        |         len(list_intersect(x.sh, y.sh))::DOUBLE /
        |           (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) AS jac
        |  FROM cand JOIN s x ON da = x.doc_id JOIN s y ON db = y.doc_id)
        |SELECT da AS doc_a, db AS doc_b, ROUND(jac, 4) AS jaccard
        |FROM j WHERE jac >= 0.2 ORDER BY doc_a, doc_b""".stripMargin,

    "q_minhash_lsh_capped" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 40
        |  UNION ALL
        |  SELECT 10000 + gs.i AS doc_id, d.text
        |  FROM (SELECT text FROM documents WHERE doc_id = 0) d,
        |       (SELECT unnest(generate_series(0, 63)) AS i) gs),
        |t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM docs),
        |s AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(generate_series(1, len(toks)-1),
        |           i -> toks[i] || ' ' || toks[i+1])) AS sh
        |  FROM t WHERE len(toks) >= 2),
        |sig AS (
        |  SELECT doc_id, sh,
        |         list_transform(generate_series(0, 15), i ->
        |           list_min(list_transform(sh, x ->
        |             ('0x'||substr(md5(i::VARCHAR||':'||x), 1, 15))::BIGINT))) AS sig
        |  FROM s WHERE len(sh) > 0),
        |bands AS (
        |  SELECT doc_id, band_idx,
        |         md5(array_to_string(sig[band_idx*4+1 : band_idx*4+4], ',')) AS bh
        |  FROM (SELECT doc_id, sig, unnest(generate_series(0, 3)) AS band_idx FROM sig)),
        |stats AS (
        |  SELECT band_idx, bh, COUNT(*) AS n, MIN(doc_id) AS min_id
        |  FROM bands GROUP BY band_idx, bh HAVING COUNT(*) >= 2),
        |cand AS (
        |  SELECT DISTINCT da, db FROM (
        |    SELECT a.doc_id da, b.doc_id db
        |    FROM bands a
        |    JOIN bands b ON a.band_idx = b.band_idx AND a.bh = b.bh
        |                AND a.doc_id < b.doc_id
        |    JOIN stats st ON a.band_idx = st.band_idx AND a.bh = st.bh
        |    WHERE st.n <= 8
        |    UNION ALL
        |    SELECT st.min_id da, x.doc_id db
        |    FROM bands x
        |    JOIN stats st ON x.band_idx = st.band_idx AND x.bh = st.bh
        |    WHERE st.n > 8 AND x.doc_id != st.min_id)),
        |j AS (
        |  SELECT da, db,
        |         len(list_intersect(x.sh, y.sh))::DOUBLE /
        |           (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) AS jac
        |  FROM cand JOIN s x ON da = x.doc_id JOIN s y ON db = y.doc_id)
        |SELECT da AS doc_a, db AS doc_b, ROUND(jac, 4) AS jaccard
        |FROM j WHERE jac >= 0.2 ORDER BY doc_a, doc_b""".stripMargin,

    "q_dedup_clusters" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(generate_series(1, len(toks)-1),
        |           i -> toks[i] || ' ' || toks[i+1])) AS sh
        |  FROM t WHERE len(toks) >= 2),
        |sig AS (
        |  SELECT doc_id, sh,
        |         list_transform(generate_series(0, 15), i ->
        |           list_min(list_transform(sh, x ->
        |             ('0x'||substr(md5(i::VARCHAR||':'||x), 1, 15))::BIGINT))) AS sig
        |  FROM s WHERE len(sh) > 0),
        |bands AS (
        |  SELECT doc_id, band_idx,
        |         md5(array_to_string(sig[band_idx*4+1 : band_idx*4+4], ',')) AS bh
        |  FROM (SELECT doc_id, sig, unnest(generate_series(0, 3)) AS band_idx FROM sig)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id da, b.doc_id db
        |  FROM bands a JOIN bands b
        |    ON a.band_idx = b.band_idx AND a.bh = b.bh AND a.doc_id < b.doc_id),
        |p AS (
        |  SELECT da, db FROM (
        |    SELECT da, db,
        |           len(list_intersect(x.sh, y.sh))::DOUBLE /
        |             (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) AS jac
        |    FROM cand JOIN s x ON da = x.doc_id JOIN s y ON db = y.doc_id)
        |  WHERE jac >= 0.2),
        |e AS (SELECT da AS a, db AS b FROM p UNION SELECT db, da FROM p),
        |r AS (
        |  SELECT a AS node, b AS reach FROM e
        |  UNION
        |  SELECT r.node, e.b FROM r JOIN e ON r.reach = e.a)
        |SELECT node AS doc_id, LEAST(node, MIN(reach)) AS cluster_id
        |FROM r GROUP BY node ORDER BY doc_id""".stripMargin,

    "q_decontaminate" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(generate_series(1, len(toks)-2),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        |  FROM t WHERE len(toks) >= 3),
        |g AS (
        |  SELECT doc_id, ('0x'||substr(md5(unnest(sh)), 1, 15))::BIGINT AS gh
        |  FROM s),
        |bench AS (SELECT DISTINCT gh FROM g WHERE doc_id < 25),
        |train AS (SELECT doc_id, gh FROM g WHERE doc_id >= 25)
        |SELECT tr.doc_id, COUNT(*) AS n_overlap
        |FROM train tr JOIN bench b USING (gh)
        |GROUP BY tr.doc_id ORDER BY doc_id""".stripMargin,

    "q_token_mixture" ->
      """WITH t AS (
        |  SELECT doc_id, source, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |d AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens FROM t),
        |p AS (SELECT * FROM (VALUES ('src0', 0.5), ('src1', 0.3), ('src2', 0.2)) AS p(source, w)),
        |ts AS (SELECT source, CAST(SUM(n_tokens) AS DOUBLE) AS tt FROM d GROUP BY source),
        |n AS (SELECT MIN(tt / w) AS nmax FROM ts JOIN p USING (source)),
        |r AS (SELECT ts.source, p.w * n.nmax / ts.tt AS rate
        |      FROM ts JOIN p USING (source) CROSS JOIN n)
        |SELECT d.doc_id, d.source, d.n_tokens
        |FROM d JOIN r USING (source)
        |WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT % 1000000
        |        < r.rate * 1000000.0
        |ORDER BY d.doc_id""".stripMargin,

    "q_bloom_decontaminate" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(generate_series(1, len(toks)-3),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS sh
        |  FROM t WHERE len(toks) >= 4),
        |g AS (
        |  SELECT doc_id, ('0x'||substr(md5(unnest(sh)), 1, 15))::BIGINT AS gh
        |  FROM s),
        |bench AS (SELECT DISTINCT gh FROM g WHERE doc_id < 25),
        |train AS (SELECT doc_id, gh FROM g WHERE doc_id >= 25)
        |SELECT tr.doc_id, COUNT(*) AS n_overlap
        |FROM train tr JOIN bench b USING (gh)
        |GROUP BY tr.doc_id ORDER BY doc_id""".stripMargin,

    "q_substring_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, len(toks) AS tt,
        |         list_transform(generate_series(1, len(toks)-7),
        |           i -> ('0x'||substr(md5(array_to_string(toks[i:i+7], ' ')), 1, 15))::BIGINT) AS whs
        |  FROM t WHERE len(toks) >= 8),
        |ex AS (
        |  SELECT doc_id, tt, unnest(generate_series(0, len(whs)-1)) AS pos, unnest(whs) AS h
        |  FROM w),
        |dup AS (SELECT h FROM ex GROUP BY h HAVING COUNT(*) >= 2),
        |f AS (SELECT doc_id, tt, pos FROM ex WHERE h IN (SELECT h FROM dup)),
        |sp AS (
        |  SELECT doc_id, tt, pos,
        |         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
        |                OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8
        |              THEN 1 ELSE 0 END AS nw
        |  FROM f),
        |sp2 AS (
        |  SELECT doc_id, tt, pos,
        |         SUM(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
        |  FROM sp),
        |spans AS (
        |  SELECT doc_id, span_id, MIN(pos) AS s, MAX(pos) AS e,
        |         COUNT(*) AS nwin, MAX(tt) AS tt
        |  FROM sp2 GROUP BY doc_id, span_id)
        |SELECT doc_id,
        |       CAST(SUM(nwin) AS BIGINT) AS n_dup_windows,
        |       COUNT(*) AS n_spans,
        |       CAST(SUM(e - s + 8) AS BIGINT) AS dup_tokens,
        |       CAST(MAX(tt) AS BIGINT) AS total_tokens,
        |       ROUND(SUM(e - s + 8)::DOUBLE / MAX(tt), 6) + 0.0 AS dup_frac
        |FROM spans GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_simhash" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(list_sum(list_transform(generate_series(0, 31), p ->
        |    CASE WHEN list_sum(list_transform(toks, tk ->
        |           ((('0x'||substr(substr(md5(tk),1,8), 8 - p//4, 1))::INT
        |             // ([1,2,4,8])[(p%4)+1]) % 2) * 2 - 1)) > 0
        |         THEN CAST(2**p AS BIGINT) ELSE 0 END)) AS BIGINT) AS simhash
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_simhash_dups" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(generate_series(0, 31), p ->
        |      CASE WHEN list_sum(list_transform(toks, tk ->
        |             ((('0x'||substr(substr(md5(tk),1,8), 8 - p//4, 1))::INT
        |               // ([1,2,4,8])[(p%4)+1]) % 2) * 2 - 1)) > 0
        |           THEN CAST(2**p AS BIGINT) ELSE 0 END)) AS BIGINT) AS simhash
        |  FROM t)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q_srp_neardup" ->
      """WITH bx AS (
        |  SELECT vec_id, unnest(generate_series(0, 3)) AS band_idx, embedding
        |  FROM embeddings),
        |v AS (
        |  SELECT vec_id, band_idx,
        |    list_sum(list_transform(generate_series(0, 7), bit ->
        |      CASE WHEN list_sum(list_transform(generate_series(1, len(embedding)), i ->
        |          embedding[i]::DOUBLE *
        |          ((('0x' || substr(md5('7:' || (band_idx*8+bit) || ':' || (i-1)), 1, 15))::BIGINT
        |            % 1000000) / 1000000.0 - 0.5))) > 0
        |           THEN CAST(2**bit AS BIGINT) ELSE 0 END)) AS bh
        |  FROM bx),
        |cand AS (
        |  SELECT DISTINCT a.vec_id ia, b.vec_id ib
        |  FROM v a JOIN v b
        |    ON a.band_idx = b.band_idx AND a.bh = b.bh AND a.vec_id < b.vec_id),
        |p AS (
        |  SELECT ia, ib, unnest(x.embedding)::DOUBLE ex, unnest(y.embedding)::DOUBLE ey
        |  FROM cand JOIN embeddings x ON ia = x.vec_id
        |            JOIN embeddings y ON ib = y.vec_id),
        |agg AS (SELECT ia, ib, SUM(ex*ey) dp, SUM(ex*ex) nx2, SUM(ey*ey) ny2
        |        FROM p GROUP BY ia, ib),
        |sc AS (SELECT ia, ib,
        |         ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 4)
        |           + 0.0 AS score
        |       FROM agg)
        |SELECT ia AS id_a, ib AS id_b, score
        |FROM sc WHERE score >= 0.4 ORDER BY id_a, id_b""".stripMargin,

    "q_ann_ivf" ->
      """WITH cents AS (
        |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id < 16),
        |pc AS (
        |  SELECT e.vec_id, c.cent_id,
        |         unnest(e.embedding)::DOUBLE x, unnest(c.cvec)::DOUBLE y
        |  FROM embeddings e CROSS JOIN cents c),
        |pagg AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM pc GROUP BY vec_id, cent_id),
        |psc AS (SELECT vec_id, cent_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |        FROM pagg),
        |assign AS (
        |  SELECT vec_id, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
        |    FROM psc) WHERE rn = 1),
        |probes AS (
        |  SELECT cent_id AS cell_id FROM psc WHERE vec_id = 42
        |  ORDER BY c DESC, cent_id LIMIT 4),
        |cand AS (
        |  SELECT a.vec_id FROM assign a JOIN probes p ON a.cell_id = p.cell_id),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 42),
        |qp AS (
        |  SELECT e.vec_id, unnest(e.embedding)::DOUBLE x, unnest(q.qe)::DOUBLE y
        |  FROM embeddings e JOIN cand USING(vec_id) CROSS JOIN q),
        |qagg AS (SELECT vec_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM qp GROUP BY vec_id),
        |qsc AS (SELECT vec_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6)
        |            + 0.0 AS score
        |        FROM qagg)
        |SELECT vec_id, score
        |FROM qsc ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
  )

  private def textOracles: Map[String, String] = Map(

    "q_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |         unnest(generate_series(0, CAST(ceil(len(toks)/20.0) AS INT) - 1)) AS chunk_idx,
        |         toks
        |  FROM t WHERE len(toks) > 0),
        |x AS (
        |  SELECT doc_id, chunk_idx,
        |         array_to_string(toks[chunk_idx*20+1 : chunk_idx*20+20], ' ') AS chunk
        |  FROM c)
        |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx, chunk,
        |       doc_id || '::chunk' || chunk_idx || '::' || substr(md5(chunk), 1, 8) AS chunk_id
        |FROM x ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_token_stats" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_quality" ->
      """WITH x AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\s+') END AS toks,
        |         length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS punct_cnt
        |  FROM documents),
        |y AS (
        |  SELECT doc_id, len(toks)::DOUBLE AS nt, punct_cnt,
        |         len(list_filter(toks, t -> list_contains(
        |           ['the','a','of','and','to','in','is'], t)))::DOUBLE AS stop_hits
        |  FROM x)
        |SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens,
        |       CAST(punct_cnt AS BIGINT) AS punct_cnt,
        |       ROUND(LEAST(nt/100.0, 1.0) * (0.7 + 0.3 * stop_hits / GREATEST(nt, 1.0)), 4) AS quality
        |FROM y ORDER BY doc_id""".stripMargin,

    "q_zorder" -> {
      val terms = (0 until 8).flatMap(i => Seq(
        s"(((ok >> $i) & 1) << ${2 * i})",
        s"(((pk >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")
      s"""WITH x AS (
         |  SELECT l_orderkey, l_linenumber, l_partkey,
         |         l_orderkey % 256 AS ok, l_partkey % 256 AS pk
         |  FROM lineitem WHERE l_orderkey <= 200)
         |SELECT l_orderkey, l_linenumber, l_partkey,
         |       CAST($terms AS BIGINT) AS zval
         |FROM x ORDER BY l_orderkey, l_linenumber""".stripMargin
    },

    "q_bq_search" ->
      """WITH v AS (
        |  SELECT vec_id, embedding,
        |    CAST(list_sum(list_transform(generate_series(0, 31), bit ->
        |      CASE WHEN list_sum(list_transform(generate_series(1, len(embedding)), i ->
        |          embedding[i]::DOUBLE *
        |          ((('0x' || substr(md5('7:' || bit || ':' || (i-1)), 1, 15))::BIGINT
        |            % 1000000) / 1000000.0 - 0.5))) > 0
        |           THEN CAST(2**bit AS BIGINT) ELSE 0 END)) AS BIGINT) AS sketch
        |  FROM embeddings),
        |q AS (SELECT sketch AS qsk, embedding AS qe FROM v WHERE vec_id = 42),
        |cand AS (
        |  SELECT v.vec_id, v.embedding,
        |         CAST(bit_count(xor(v.sketch, q.qsk)) AS BIGINT) AS ham
        |  FROM v CROSS JOIN q
        |  ORDER BY ham, vec_id LIMIT 100),
        |p AS (
        |  SELECT c.vec_id, c.ham,
        |         unnest(c.embedding)::DOUBLE x, unnest(q.qe)::DOUBLE y
        |  FROM cand c CROSS JOIN q),
        |agg AS (SELECT vec_id, ham, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |        FROM p GROUP BY vec_id, ham),
        |sc AS (SELECT vec_id, ham,
        |         ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6)
        |           + 0.0 AS score
        |       FROM agg)
        |SELECT vec_id, ham, score FROM sc ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    "q_late_interaction" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 42),
        |grid AS (
        |  SELECT a.qi, b.dj FROM (SELECT unnest(generate_series(0,3)) qi) a
        |  CROSS JOIN (SELECT unnest(generate_series(0,3)) dj) b),
        |cs AS (
        |  SELECT e.vec_id, g.qi, g.dj,
        |    ROUND(
        |      list_sum(list_transform(generate_series(1,16), i ->
        |        e.embedding[g.dj*16+i]::DOUBLE * q.qe[g.qi*16+i]::DOUBLE))
        |      / (GREATEST(SQRT(list_sum(list_transform(generate_series(1,16), i ->
        |           e.embedding[g.dj*16+i]::DOUBLE * e.embedding[g.dj*16+i]::DOUBLE))), 1e-12)
        |       * GREATEST(SQRT(list_sum(list_transform(generate_series(1,16), i ->
        |           q.qe[g.qi*16+i]::DOUBLE * q.qe[g.qi*16+i]::DOUBLE))), 1e-12)), 6) AS c
        |  FROM embeddings e CROSS JOIN q CROSS JOIN grid g),
        |mx AS (SELECT vec_id, qi, CAST(ROUND(MAX(c) * 1000000, 0) AS BIGINT) AS m
        |       FROM cs GROUP BY vec_id, qi),
        |sc AS (SELECT vec_id,
        |         ROUND(CAST(SUM(m) AS BIGINT)::DOUBLE / 1000000.0, 6) + 0.0 AS score
        |       FROM mx GROUP BY vec_id)
        |SELECT vec_id, score FROM sc ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    "q_mrl_search" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 42),
        |p AS (
        |  SELECT e.vec_id,
        |         unnest(e.embedding[1:16])::DOUBLE x, unnest(q.qe[1:16])::DOUBLE y
        |  FROM embeddings e CROSS JOIN q),
        |agg AS (SELECT vec_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |        FROM p GROUP BY vec_id),
        |sc AS (SELECT vec_id,
        |         ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6)
        |           + 0.0 AS score
        |       FROM agg)
        |SELECT vec_id, score FROM sc ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    "q_sq_search" ->
      """WITH x AS (
        |  SELECT vec_id, unnest(generate_series(1, len(embedding))) AS pos,
        |         unnest(embedding)::DOUBLE AS val
        |  FROM embeddings),
        |mm AS (
        |  SELECT pos, MIN(val) AS lo, MAX(val) AS hi FROM x GROUP BY pos),
        |q AS (SELECT pos, val AS qv FROM x WHERE vec_id = 42),
        |c AS (
        |  SELECT x.vec_id, x.pos,
        |    CASE WHEN mm.hi - mm.lo < 1e-12 THEN 0
        |         ELSE least(255, greatest(0,
        |           CAST(floor(((x.val - mm.lo) * 255.0) / (mm.hi - mm.lo)) AS BIGINT)))
        |    END AS code
        |  FROM x JOIN mm USING (pos)),
        |terms AS (
        |  SELECT c.vec_id,
        |    CAST(round((mm.lo + ((c.code + 0.5) * (mm.hi - mm.lo)) / 255.0)
        |         * q.qv * 1000000.0, 0) AS BIGINT) AS t
        |  FROM c JOIN mm USING (pos) JOIN q USING (pos)),
        |s AS (
        |  SELECT vec_id, CAST(SUM(t) AS BIGINT) AS micro FROM terms GROUP BY vec_id)
        |SELECT vec_id, ROUND(micro / 1000000.0, 4) + 0.0 AS score
        |FROM s ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    "q_ann_pq" ->
      """WITH cbl AS (
        |  SELECT list(embedding ORDER BY vec_id) AS cbs
        |  FROM embeddings WHERE vec_id < 16),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 42),
        |mis AS (SELECT unnest(generate_series(0, 7)) AS mi),
        |dists AS (
        |  SELECT e.vec_id, mis.mi,
        |    list_transform(cbl.cbs, cand ->
        |      ROUND(list_sum(list_transform(generate_series(1, 8), j ->
        |        (e.embedding[mis.mi*8+j]::DOUBLE - cand[mis.mi*8+j]::DOUBLE)
        |        * (e.embedding[mis.mi*8+j]::DOUBLE - cand[mis.mi*8+j]::DOUBLE))), 6)) AS d
        |  FROM embeddings e CROSS JOIN mis CROSS JOIN cbl),
        |enc AS (
        |  SELECT vec_id, mi,
        |         CAST(list_position(d, list_min(d)) - 1 AS INT) AS code
        |  FROM dists),
        |lut AS (
        |  SELECT mis.mi, c.i - 1 AS c,
        |    CAST(ROUND(ROUND(list_sum(list_transform(generate_series(1, 8), j ->
        |      q.qe[mis.mi*8+j]::DOUBLE * cbl.cbs[c.i][mis.mi*8+j]::DOUBLE)), 6)
        |      * 1000000) AS BIGINT) AS pdu
        |  FROM cbl CROSS JOIN mis
        |  CROSS JOIN (SELECT unnest(generate_series(1, 16)) AS i) c
        |  CROSS JOIN q),
        |sc AS (
        |  SELECT enc.vec_id,
        |         ROUND(SUM(lut.pdu)::DOUBLE / 1000000.0, 4) + 0.0 AS score
        |  FROM enc JOIN lut ON enc.mi = lut.mi AND enc.code = lut.c
        |  GROUP BY enc.vec_id)
        |SELECT vec_id, score FROM sc ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    "q_ann_ivfpq" ->
      """WITH cents AS (
        |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id < 16),
        |pc AS (
        |  SELECT e.vec_id, c.cent_id,
        |         unnest(e.embedding)::DOUBLE x, unnest(c.cvec)::DOUBLE y
        |  FROM embeddings e CROSS JOIN cents c),
        |pagg AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM pc GROUP BY vec_id, cent_id),
        |psc AS (SELECT vec_id, cent_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |        FROM pagg),
        |assign AS (
        |  SELECT vec_id, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
        |    FROM psc) WHERE rn = 1),
        |probes AS (
        |  SELECT cent_id AS cell_id FROM psc WHERE vec_id = 42
        |  ORDER BY c DESC, cent_id LIMIT 4),
        |cand AS (
        |  SELECT a.vec_id FROM assign a JOIN probes p ON a.cell_id = p.cell_id),
        |cbl AS (
        |  SELECT list(embedding ORDER BY vec_id) AS cbs
        |  FROM embeddings WHERE vec_id < 16),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 42),
        |mis AS (SELECT unnest(generate_series(0, 7)) AS mi),
        |dists AS (
        |  SELECT e.vec_id, mis.mi,
        |    list_transform(cbl.cbs, cand_v ->
        |      ROUND(list_sum(list_transform(generate_series(1, 8), j ->
        |        (e.embedding[mis.mi*8+j]::DOUBLE - cand_v[mis.mi*8+j]::DOUBLE)
        |        * (e.embedding[mis.mi*8+j]::DOUBLE - cand_v[mis.mi*8+j]::DOUBLE))), 6)) AS d
        |  FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN mis CROSS JOIN cbl),
        |enc AS (
        |  SELECT vec_id, mi,
        |         CAST(list_position(d, list_min(d)) - 1 AS INT) AS code
        |  FROM dists),
        |lut AS (
        |  SELECT mis.mi, c.i - 1 AS c,
        |    CAST(ROUND(ROUND(list_sum(list_transform(generate_series(1, 8), j ->
        |      q.qe[mis.mi*8+j]::DOUBLE * cbl.cbs[c.i][mis.mi*8+j]::DOUBLE)), 6)
        |      * 1000000) AS BIGINT) AS pdu
        |  FROM cbl CROSS JOIN mis
        |  CROSS JOIN (SELECT unnest(generate_series(1, 16)) AS i) c
        |  CROSS JOIN q),
        |sc AS (
        |  SELECT enc.vec_id,
        |         ROUND(SUM(lut.pdu)::DOUBLE / 1000000.0, 4) + 0.0 AS score
        |  FROM enc JOIN lut ON enc.mi = lut.mi AND enc.code = lut.c
        |  GROUP BY enc.vec_id)
        |SELECT vec_id, score FROM sc ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    "q_bm25" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
        |st AS (SELECT COUNT(*)::DOUBLE AS n, SUM(dl)::DOUBLE AS sdl FROM dl),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
        |       WHERE term IN ('vector', 'join', 'scan') GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |idf AS (SELECT term, ROUND(ln((st.n - df.df::DOUBLE + 0.5) / (df.df::DOUBLE + 0.5) + 1.0), 6) AS idf
        |        FROM df CROSS JOIN st),
        |u AS (
        |  SELECT tf.doc_id,
        |         CAST(ROUND(idf.idf * tf.tf::DOUBLE * 2.2 /
        |           (tf.tf::DOUBLE + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl::DOUBLE / (st.sdl / st.n)))
        |           * 1000000) AS BIGINT) AS u
        |  FROM tf JOIN idf USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
        |sc AS (SELECT doc_id, ROUND(SUM(u)::DOUBLE / 1000000.0, 4) + 0.0 AS score
        |       FROM u GROUP BY doc_id)
        |SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    "q_rerank" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
        |st AS (SELECT COUNT(*)::DOUBLE AS n, SUM(dl)::DOUBLE AS sdl FROM dl),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
        |       WHERE term IN ('vector', 'join', 'scan') GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |idf AS (SELECT term, ROUND(ln((st.n - df.df::DOUBLE + 0.5) / (df.df::DOUBLE + 0.5) + 1.0), 6) AS idf
        |        FROM df CROSS JOIN st),
        |u AS (
        |  SELECT tf.doc_id,
        |         CAST(ROUND(idf.idf * tf.tf::DOUBLE * 2.2 /
        |           (tf.tf::DOUBLE + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl::DOUBLE / (st.sdl / st.n)))
        |           * 1000000) AS BIGINT) AS u
        |  FROM tf JOIN idf USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
        |cand AS (
        |  SELECT doc_id, ROUND(SUM(u)::DOUBLE / 1000000.0, 4) + 0.0 AS score
        |  FROM u GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20),
        |rr AS (
        |  SELECT c.doc_id, c.score,
        |    ROUND((list_contains(t.toks, 'vector')::INT
        |         + list_contains(t.toks, 'scan')::INT
        |         + list_contains(t.toks, 'fast')::INT
        |         + list_contains(t.toks, 'table')::INT)::DOUBLE / 4, 6) + 0.0 AS rerank
        |  FROM cand c JOIN t USING (doc_id))
        |SELECT doc_id, score, rerank
        |FROM rr ORDER BY rerank DESC, score DESC, doc_id LIMIT 10""".stripMargin,

    "q_vocab_topn" ->
      """SELECT term, CAST(COUNT(*) AS BIGINT) AS n
        |FROM (
        |  SELECT unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |                     ELSE string_split_regex(trim(lower(text)), '\s+') END) AS term
        |  FROM documents)
        |GROUP BY term ORDER BY n DESC, term LIMIT 50""".stripMargin,

    "q_hybrid_rrf" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
        |st AS (SELECT COUNT(*)::DOUBLE AS n, SUM(dl)::DOUBLE AS sdl FROM dl),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
        |       WHERE term IN ('vector', 'join', 'scan') GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |idf AS (SELECT term, ROUND(ln((st.n - df.df::DOUBLE + 0.5) / (df.df::DOUBLE + 0.5) + 1.0), 6) AS idf
        |        FROM df CROSS JOIN st),
        |u AS (
        |  SELECT tf.doc_id,
        |         CAST(ROUND(idf.idf * tf.tf::DOUBLE * 2.2 /
        |           (tf.tf::DOUBLE + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl::DOUBLE / (st.sdl / st.n)))
        |           * 1000000) AS BIGINT) AS u
        |  FROM tf JOIN idf USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
        |bmtop AS (
        |  SELECT doc_id, ROUND(SUM(u)::DOUBLE / 1000000.0, 4) + 0.0 AS score
        |  FROM u GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20),
        |bmr AS (SELECT doc_id AS id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r FROM bmtop),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 42),
        |pairs AS (
        |  SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS x, unnest(q.qe)::DOUBLE AS y
        |  FROM embeddings e CROSS JOIN q),
        |agg AS (
        |  SELECT vec_id, SUM(x*y) AS dp, SUM(x*x) AS nx2, SUM(y*y) AS ny2
        |  FROM pairs GROUP BY vec_id),
        |vtop AS (
        |  SELECT vec_id,
        |         ROUND(dp / (GREATEST(SQRT(nx2), 1e-12) * GREATEST(SQRT(ny2), 1e-12)), 6)
        |           + 0.0 AS score
        |  FROM agg ORDER BY score DESC, vec_id LIMIT 20),
        |vr AS (SELECT vec_id AS id, ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) AS r FROM vtop),
        |f AS (
        |  SELECT COALESCE(b.id, v.id) AS id,
        |         ROUND(COALESCE(1.0 / (60.0 + b.r), 0.0) +
        |               COALESCE(1.0 / (60.0 + v.r), 0.0), 6) AS rrf
        |  FROM bmr b FULL OUTER JOIN vr v ON b.id = v.id)
        |SELECT id, rrf FROM f ORDER BY rrf DESC, id LIMIT 10""".stripMargin,

    "q_corpus_stats" ->
      """WITH x AS (
        |  SELECT doc_id, source, text,
        |         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |y AS (
        |  SELECT source,
        |         CAST(len(toks) AS BIGINT) AS n_toks,
        |         CAST(length(text) AS BIGINT) AS n_chars,
        |         ROUND(LEAST(len(toks)::DOUBLE/100.0, 1.0) * (0.7 + 0.3 *
        |           len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in','is'], t)))::DOUBLE
        |           / GREATEST(len(toks)::DOUBLE, 1.0)), 4) AS q,
        |         md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |  FROM x)
        |SELECT source, COUNT(*) AS n_docs,
        |       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
        |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |       ROUND(CAST(SUM(CAST(ROUND(q * 10000) AS BIGINT)) AS BIGINT)::DOUBLE
        |             / (COUNT(*) * 10000.0), 4) AS avg_quality,
        |       COUNT(DISTINCT fp) AS n_unique
        |FROM y GROUP BY source ORDER BY source""".stripMargin,

    "q_langid" ->
      """WITH x AS (
        |  SELECT lang, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |v AS (
        |  SELECT lang,
        |    len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in','is'], t))) AS en,
        |    len(list_filter(toks, t -> list_contains(['el','la','de','los','las','y','en'], t))) AS es,
        |    len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','ein'], t))) AS de
        |  FROM x),
        |p AS (
        |  SELECT lang, CASE WHEN es > en AND es >= de THEN 'es'
        |                    WHEN de > en AND de > es THEN 'de'
        |                    ELSE 'en' END AS pred_lang
        |  FROM v)
        |SELECT lang, pred_lang, COUNT(*) AS n FROM p
        |GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin,

    "q_curation" ->
      s"""WITH $curationCoreSql
         |SELECT doc_id, source, quality
         |FROM final
         |WHERE $curationGateSql
         |ORDER BY doc_id""".stripMargin,

    "q_seq_pack" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |                             ROWS UNBOUNDED PRECEDING) - n_tokens AS strt
        |  FROM t)
        |SELECT doc_id, source, n_tokens,
        |       CAST(strt // 256 AS BIGINT) AS seq_idx,
        |       CAST(strt % 256 AS BIGINT) AS seq_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, toks,
        |         CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[])
        |              ELSE list_transform(generate_series(1, len(toks)-1),
        |                     i -> toks[i] || ' ' || toks[i+1]) END AS g2
        |  FROM t)
        |SELECT doc_id,
        |  ROUND(CASE WHEN len(toks) = 0 THEN 0.0
        |        ELSE 1.0 - len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE END, 4) AS dup_tok_frac,
        |  ROUND(CASE WHEN len(g2) = 0 THEN 0.0
        |        ELSE 1.0 - len(list_distinct(g2))::DOUBLE / len(g2)::DOUBLE END, 4) AS dup_2gram_frac,
        |  CAST(CASE WHEN len(g2) = 0 THEN 0
        |       ELSE list_max(list_transform(list_distinct(g2),
        |              x -> len(list_filter(g2, y -> y = x)))) END AS BIGINT) AS max_2gram_count,
        |  ROUND(CASE WHEN len(toks) = 0 THEN 0.0
        |        ELSE coalesce(list_sum(list_transform(list_distinct(toks),
        |               x -> CASE WHEN len(list_filter(toks, y -> y = x)) >= 2
        |                         THEN length(x) * len(list_filter(toks, y -> y = x))
        |                         ELSE 0 END)), 0)::DOUBLE
        |           / list_sum(list_transform(toks, x -> length(x)))::DOUBLE END, 4) AS rep_char_frac
        |FROM g ORDER BY doc_id""".stripMargin,

    "q_trigram_lm" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |         ' +', ' ', 'g')) AS nt
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, length(nt) - 2),
        |      i -> substr(nt, i, 3))) AS tri
        |  FROM d WHERE length(nt) >= 3),
        |c AS (SELECT tri, COUNT(*) AS cnt FROM g GROUP BY tri),
        |st AS (SELECT SUM(cnt)::DOUBLE AS total, COUNT(*)::DOUBLE AS v FROM c),
        |m AS (
        |  SELECT tri,
        |    CAST(ROUND(ROUND(ln((cnt::DOUBLE + 1.0) / (st.total + st.v)), 6)
        |         * 1000000) AS BIGINT) AS lp
        |  FROM c CROSS JOIN st),
        |s AS (
        |  SELECT g.doc_id, COUNT(*) AS n_tri, SUM(m.lp) AS lsum
        |  FROM g JOIN m USING (tri) GROUP BY g.doc_id)
        |SELECT doc_id, CAST(n_tri AS BIGINT) AS n_tri,
        |  ROUND((-lsum)::DOUBLE / 1000000.0 / n_tri::DOUBLE, 4) + 0.0 AS nll
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_quality_classifier" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, len(toks) AS n,
        |    list_sum(list_transform(toks, tk ->
        |      ('0x'||substr(md5('w:' ||
        |         ((('0x'||substr(md5(tk),1,15))::BIGINT % 4096)::VARCHAR)
        |       ),1,15))::BIGINT % 2001 - 1000)) AS s
        |  FROM d)
        |SELECT doc_id,
        |  CAST(ROUND(COALESCE(s, 0)::DOUBLE * 1000.0 / greatest(n, 1)::DOUBLE,
        |             0) AS BIGINT) / 1000000.0 + 0.0 AS logit,
        |  (CAST(ROUND(COALESCE(s, 0)::DOUBLE * 1000.0 / greatest(n, 1)::DOUBLE,
        |              0) AS BIGINT) / 1000000.0 + 0.0) > 0.0 AS keep
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_c4_clean" ->
      """WITH pages AS (
        |  SELECT doc_id,
        |    concat_ws(chr(10),
        |      substr(text, 1, 60) || ' end.',
        |      'too short',
        |      'enable javascript to view this page.',
        |      CASE WHEN doc_id % 7 = 0 THEN 'lorem ipsum dolor sit amet.'
        |           ELSE substr(text, 61, 50) || ' fine!' END,
        |      substr(text, 111, 40) || ' really?') AS page
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, page,
        |    list_filter(string_split(page, chr(10)),
        |      l -> regexp_matches(trim(l), '[.!?"]$')
        |           AND len(string_split_regex(trim(l), '\s+')) >= 3
        |           AND NOT contains(lower(l), 'javascript')) AS kept
        |  FROM pages)
        |SELECT doc_id,
        |  array_to_string(kept, chr(10)) AS clean,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  CAST(len(string_split(page, chr(10))) AS BIGINT) AS n_total,
        |  (NOT contains(lower(page), 'lorem ipsum') AND NOT contains(page, '{')
        |   AND len(kept) >= 2) AS page_ok
        |FROM k ORDER BY doc_id""".stripMargin,

    "q_boilerplate" ->
      """WITH pages AS (
        |  SELECT doc_id,
        |    concat_ws(chr(10),
        |      'subscribe to our newsletter today',
        |      substr(text, 1, 50) || ' #' || doc_id::VARCHAR,
        |      CASE WHEN doc_id % 3 = 0 THEN 'promo code spark'
        |           ELSE substr(text, 51, 60) || ' tail' END,
        |      'all rights reserved') AS page
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, pos, line,
        |         ('0x'||substr(md5(trim(line)),1,15))::BIGINT AS lh
        |  FROM (
        |    SELECT doc_id,
        |      unnest(generate_series(0, len(string_split(page, chr(10))) - 1)) AS pos,
        |      unnest(string_split(page, chr(10))) AS line
        |    FROM pages)),
        |f AS (SELECT lh FROM h GROUP BY lh HAVING COUNT(*) >= 3),
        |tot AS (SELECT doc_id, COUNT(*) AS tot FROM h GROUP BY doc_id),
        |k AS (
        |  SELECT doc_id,
        |    array_to_string(list(line ORDER BY pos), chr(10)) AS clean,
        |    COUNT(*) AS n_kept
        |  FROM h WHERE lh NOT IN (SELECT lh FROM f)
        |  GROUP BY doc_id)
        |SELECT t.doc_id,
        |  COALESCE(k.clean, '') AS clean,
        |  CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(t.tot - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed
        |FROM tot t LEFT JOIN k USING (doc_id) ORDER BY t.doc_id""".stripMargin,

    "q_pii_redact" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         text || ' contact user' || doc_id::VARCHAR ||
        |         '@mail.example.com or +1 (415) 555-01' ||
        |         lpad((doc_id % 100)::VARCHAR, 2, '0') ||
        |         ' from 10.0.' || (doc_id % 256)::VARCHAR || '.7' AS txt
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(txt,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
        |    '\+?[0-9][0-9()\s\-]{6,}[0-9]', '<PHONE>', 'g') AS clean,
        |  CAST(len(regexp_extract_all(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |     + len(regexp_extract_all(txt, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'))
        |     + len(regexp_extract_all(txt, '\+?[0-9][0-9()\s\-]{6,}[0-9]')) AS BIGINT) AS n_pii
        |FROM d ORDER BY doc_id""".stripMargin,

    "q_fingerprint" ->
      """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
        |       COUNT(*) AS n_docs, MIN(doc_id) AS canonical
        |FROM documents GROUP BY fp ORDER BY fp""".stripMargin,

    "q_multimodal" ->
      """WITH b AS (SELECT doc_id, text, text::BLOB AS bin FROM documents),
        |m AS (SELECT doc_id, octet_length(bin) AS n_bytes, md5(text) AS hx FROM b)
        |SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
        |  CAST(('0x'||substr(hx,1,4))::INT % 640 AS INT) AS width,
        |  CAST(('0x'||substr(hx,5,4))::INT % 480 AS INT) AS height,
        |  (['jpeg','png','webp'])[(('0x'||substr(hx,9,2))::INT % 3) + 1] AS format,
        |  ROUND((('0x'||substr(md5('0:'||hx),1,15))::BIGINT % 1000)/1000.0, 4) AS f0,
        |  ROUND((('0x'||substr(md5('1:'||hx),1,15))::BIGINT % 1000)/1000.0, 4) AS f1,
        |  ROUND((('0x'||substr(md5('2:'||hx),1,15))::BIGINT % 1000)/1000.0, 4) AS f2,
        |  ROUND((('0x'||substr(md5('3:'||hx),1,15))::BIGINT % 1000)/1000.0, 4) AS f3
        |FROM m ORDER BY doc_id""".stripMargin,

    "q_rag_context" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |pairs AS (
        |  SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS x, unnest(q.qe)::DOUBLE AS y
        |  FROM embeddings e CROSS JOIN q),
        |agg AS (
        |  SELECT vec_id, SUM(x*y) AS dp, SUM(x*x) AS nx2, SUM(y*y) AS ny2
        |  FROM pairs GROUP BY vec_id),
        |sc AS (
        |  SELECT vec_id,
        |         ROUND(dp / (GREATEST(SQRT(nx2), 1e-12) * GREATEST(SQRT(ny2), 1e-12)), 6)
        |           AS c
        |  FROM agg),
        |top AS (SELECT vec_id, c FROM sc ORDER BY c DESC, vec_id LIMIT 4)
        |SELECT CAST(0 AS BIGINT) AS query_id,
        |       string_agg('- ' || substr(d.text, 1, 40), chr(10)||chr(10)
        |                  ORDER BY t.c DESC, t.vec_id) AS context
        |FROM top t JOIN documents d ON t.vec_id = d.doc_id""".stripMargin,

    "q_rag_prompt" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |pairs AS (
        |  SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS x, unnest(q.qe)::DOUBLE AS y
        |  FROM embeddings e CROSS JOIN q),
        |agg AS (
        |  SELECT vec_id, SUM(x*y) AS dp, SUM(x*x) AS nx2, SUM(y*y) AS ny2
        |  FROM pairs GROUP BY vec_id),
        |sc AS (
        |  SELECT vec_id,
        |         ROUND(dp / (GREATEST(SQRT(nx2), 1e-12) * GREATEST(SQRT(ny2), 1e-12)), 6)
        |           AS c
        |  FROM agg),
        |top AS (SELECT vec_id, c FROM sc ORDER BY c DESC, vec_id LIMIT 4),
        |ctx AS (
        |  SELECT string_agg('- ' || substr(d.text, 1, 40), chr(10)||chr(10)
        |                    ORDER BY t.c DESC, t.vec_id) AS context
        |  FROM top t JOIN documents d ON t.vec_id = d.doc_id)
        |SELECT CAST(0 AS BIGINT) AS query_id,
        |       'Answer strictly from the context.' || chr(10) || chr(10) ||
        |       'Context:' || chr(10) || context || chr(10) || chr(10) ||
        |       'Question: what do the top documents say?' || chr(10) ||
        |       'Answer:' AS prompt
        |FROM ctx""".stripMargin
  )

  // ================================= round-2 additions: wider coverage

  private def extraQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ExactSubstr REMOVAL (Lee et al. 2022 rewrite half; q_substring_dedup
    // is the detection half): every duplicated 8-token window keeps only
    // its canonical minimal-(doc, pos) occurrence; later occurrences are
    // cut and each document reassembled from surviving tokens. Canonical
    // selection is an aggregate-then-join (min over a map-side-combinable
    // struct), NOT a row_number window — a 10⁸-occurrence boilerplate
    // window must never serialize onto one reducer's sort.
    "q_substr_removal" -> ((s, dir) => {
      import s.implicits._
      Dedup.removeDuplicatedSpans(spread(s, t(s, dir, "documents")),
          "doc_id", "text", minLen = 8)
        .orderBy($"doc_id")
    }),

    // Heavy hitters at bounded shuffle width: a mergeable Misra-Gries
    // sketch (≤ k counters per partial, shuffle carries partitions × k
    // counters TOTAL — vocabulary-size independent) finds candidate
    // terms; an exact recount of only those candidates makes the top-20
    // provably exact (certified against the n/(k+1) bound at runtime).
    // The full-groupBy q_vocab_topn is the unbounded-shuffle twin.
    "q_heavy_hitters" -> ((s, dir) => {
      import s.implicits._
      HeavyHitters.topTerms(
        spread(s, t(s, dir, "documents")).select(lower($"text").as("text")),
        "text", n = 20, k = 1024)
    }),

    // JSONL interchange round-trip: documents written as JSON-lines (the
    // lingua franca of LLM data pipelines) and read back under an
    // explicit schema (no inference job at 100 TB), byte-identical to
    // the parquet source. Writer/reader are Spark's parallel JSON sink /
    // source — one file per partition, no driver funnel.
    "q_jsonl_roundtrip" -> ((s, dir) => {
      import s.implicits._
      // pid suffix: two JVMs over the same fixture dir (Verify + Bench in
      // parallel CI) must not race on overwrite-vs-read of one tmp path
      val tmpDir = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_jsonl_rt_${Integer.toHexString(dir.hashCode)}_" +
          ProcessHandle.current().pid())
      val tmp = tmpDir.getAbsolutePath
      // JVM-exit cleanup so repeated Verify/Bench runs don't accumulate
      // tmp-dir garbage (the read is lazy, so an eager delete here
      // would race the round-trip scan)
      jsonlTmpCleanup(tmpDir)
      t(s, dir, "documents").select($"doc_id", $"source", $"text")
        .write.mode("overwrite").json(tmp)
      s.read.schema("doc_id LONG, source STRING, text STRING").json(tmp)
        .select($"doc_id", $"source", $"text")
        .orderBy($"doc_id")
    }),

    // Unicode canonicalization — the ingest pass every hash-based
    // operator needs first (composed vs decomposed bytes hash apart).
    // The fixture corpus is ASCII, so the query grafts a mixed-form
    // unicode suffix onto each doc in BOTH engines: the oracle then
    // genuinely exercises NFC composition ("e"+U+0301 → U+00E9) and
    // accent stripping, not an identity pass.
    "q_unicode_clean" -> ((s, dir) => {
      import s.implicits._
      import graft.expressions.UnicodeExpressions.{nfcNormalizeF, stripAccentsF}
      val suffix = " Mu\u0308ller cafe\u0301 \u00f1and\u00fa"
      t(s, dir, "documents")
        .select($"doc_id",
          nfcNormalizeF(concat(substring($"text", 1, 32), lit(suffix))).as("nfc"),
          stripAccentsF(concat(substring($"text", 1, 32), lit(suffix))).as("plain"))
        .orderBy($"doc_id")
    }),

    // Snapshot diff — the "what changed between crawls" report an
    // incremental pipeline gates on: full outer join of two snapshot
    // fingerprint tables (8-byte hash60 + id per side, never text) →
    // added / removed / changed / same counts. Fixture synthesizes the
    // second snapshot from the first (drop ids < 100, add ids ≥ 400,
    // rewrite texts in [200, 250)) identically in both engines.
    "q_snapshot_diff" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val old = d.filter($"doc_id" < 400)
        .select($"doc_id", Dedup.hash60($"text").as("h_old"))
      val newSnap = d.filter($"doc_id" >= 100)
        .select($"doc_id",
          Dedup.hash60(when($"doc_id" >= 200 && $"doc_id" < 250,
            concat($"text", lit(" rev2"))).otherwise($"text")).as("h_new"))
      old.join(newSnap, Seq("doc_id"), "full_outer")
        .select(when($"h_old".isNull, "added")
          .when($"h_new".isNull, "removed")
          .when($"h_old" === $"h_new", "same")
          .otherwise("changed").as("status"))
        .groupBy($"status").agg(count(lit(1)).as("n_docs"))
        .orderBy($"status")
    }),

    // MLM masking prep (BERT-family pretraining): 15% of tokens masked
    // by a pure (doc, position, salt) hash gate — reproducible across
    // runs/partitionings/engines with no RNG state, the Sampling
    // discipline applied to augmentation. Scan-speed per-row transform.
    "q_mlm_mask" -> ((s, dir) => {
      import s.implicits._
      // hoist the masked array into a named column: referencing the raw
      // expression from two projections would run the md5-per-token gate
      // twice (HOFs are CodegenFallback — no subexpression elimination)
      t(s, dir, "documents")
        .withColumn("mk", T.maskTokens($"doc_id", $"text", 15, "mlm"))
        .select($"doc_id",
          array_join($"mk", " ").as("masked"),
          size(filter($"mk", t0 => t0 === "[MASK]")).cast("long").as("n_masked"))
        .orderBy($"doc_id")
    }),

    // User-journey paths: 30-min-gap sessions → ordered event-type
    // sequence per session → top-10 most common journeys (the product
    // question session data exists to answer). Session assignment is
    // the q_sessionize cumulative-sum window; path assembly is one
    // per-session sorted reassembly (the stripBoilerplate shape); the
    // path ranking aggregate shuffles only (path, count).
    "q_user_paths" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      val sess = t(s, dir, "events")
        .withColumn("prev", lag($"ts", 1).over(w))
        .withColumn("newsess",
          when($"prev".isNull ||
            ($"ts".cast("double") - $"prev".cast("double")) > 1800.0, 1L).otherwise(0L))
        .withColumn("sess", sum($"newsess").over(w))
      sess.groupBy($"user_id", $"sess")
        .agg(array_join(transform(
          array_sort(collect_list(struct($"ts", $"event_id", $"event_type"))),
          s0 => s0.getField("event_type")), ">").as("path"))
        .groupBy($"path")
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy($"n_sessions".desc, $"path")
        .limit(10)
    }),

    // Null-semantics parity: count(*) vs count(col), null-skipping
    // sums, and coalesce defaults — the SQL edge semantics every
    // engine must agree on (fixture has no nulls, so both engines
    // manufacture them identically via the same CASE gate).
    "q_null_semantics" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .withColumn("v", when($"value" >= 20, $"value"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_all"),
          count($"v").as("n_nonnull"),
          (round(sum($"v"), 2) + lit(0.0)).as("sum_v"),
          (round(sum(coalesce($"v", lit(0.0))), 2) + lit(0.0)).as("sum_v0"))
        .orderBy($"event_type")
    }),

    // Per-dimension standardization (z-score feature scaling — the ML
    // feature-prep staple): one micro-unit-quantized stats aggregate per
    // dimension (exact integer sums → order-proof mean/std), broadcast
    // back onto the exploded scan. Identical arithmetic ORDER in both
    // engines (mean*mean, not pow) so the doubles match bit-for-bit.
    "q_standardize" -> ((s, dir) => {
      import s.implicits._
      val exv = t(s, dir, "embeddings")
        .select($"vec_id", posexplode($"embedding").as(Seq("pos", "x")))
        .withColumn("xq", round($"x".cast("double") * 1e6, 0).cast("long"))
      val stats = exv.groupBy($"pos")
        .agg(count(lit(1)).as("n"), sum($"xq").as("s"),
          // DECIMAL(38,0) accumulator: xq² is ~1e12 per row, so a
          // LongType sum would wrap silently past ~9M rows per
          // dimension (DuckDB promotes to HUGEINT; Spark non-ANSI
          // wraps) — decimal keeps the 100-TB row counts exact
          sum($"xq".cast("decimal(38,0)") * $"xq").as("ss"))
        .select($"pos",
          ($"s".cast("double") / $"n" / 1e6).as("mean"),
          // variance clamped at 0: ss past 2^53 rounds in double and FP
          // cancellation can land epsilon-negative on a constant
          // dimension — sqrt(negative) is NaN here but an ERROR in
          // DuckDB, so both engines clamp identically
          sqrt(greatest((($"ss".cast("double") / $"n") -
            ($"s".cast("double") / $"n") * ($"s".cast("double") / $"n")), lit(0.0)) / 1e12)
            .as("std"))
      // zero-variance guard: a constant dimension standardizes to 0 by
      // convention (Spark's 0/0 is NULL, DuckDB's is inf — without the
      // guard the engines diverge on such data)
      exv.join(broadcast(stats), "pos")
        .select($"vec_id", $"pos",
          when($"std" > 0,
            round(($"xq" / 1e6 - $"mean") / $"std", 4) + lit(0.0))
            .otherwise(lit(0.0)).as("z"))
        .orderBy($"vec_id", $"pos")
    }),

    // Export manifest: per-shard row count + order-independent content
    // checksum (XOR of per-row 60-bit hashes over a canonical id:text
    // encoding) — what a training-data delivery ships beside the files
    // so the consumer can verify integrity without re-reading the
    // producer. XOR is commutative, so the checksum is partitioning-
    // and order-proof; one map-side-combined aggregate computes the
    // whole manifest.
    "q_export_manifest" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select(pmod($"doc_id", lit(8L)).as("shard"),
          Dedup.hash60(concat($"doc_id".cast("string"), lit(":"), $"text")).as("h"))
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_rows"), bit_xor($"h").as("checksum"))
        .orderBy($"shard")
    }),

    // Index health report — the reference's /health endpoint (O9) grown
    // into the table a vector-store operator actually pages on: per
    // md5-mod-8 shard replica, row count, dim bounds (dim drift = a
    // corrupted ingest), and mean vector norm (un-normalized vectors =
    // a skipped O3 stage). Norms quantize to integer micro-units BEFORE
    // the sum, so the per-shard mean is an exact-integer reduction —
    // order-proof in both engines.
    "q_index_health" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "embeddings")
        .select(HashFunctions.shardHash($"vec_id", 8).as("shard"),
          size($"embedding").as("dim"),
          round(round(sqrt(V.norm2($"embedding")), 6) * 1e6, 0).cast("long").as("nrm_micro"))
        .groupBy($"shard")
        .agg(count(lit(1)).as("n"),
          min($"dim").as("min_dim"), max($"dim").as("max_dim"),
          (round(sum($"nrm_micro") / 1e6 / count(lit(1)), 4) + lit(0.0)).as("avg_norm"))
        .orderBy($"shard")
    }),

    // Ordered funnel: users who viewed, then clicked AFTER the first
    // view, then purchased AFTER that click — the product-analytics
    // staple. Each stage is one groupBy(user) min-aggregate joined to
    // the previous stage's (tiny, per-user) frontier; event rows
    // shuffle at most once per stage, state is one timestamp per
    // surviving user.
    "q_funnel" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events").select($"user_id", $"event_type", $"ts")
      val a = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts").as("t_view"))
      val b = ev.filter($"event_type" === "click")
        .join(a, "user_id").filter($"ts" > $"t_view")
        .groupBy($"user_id").agg(min($"ts").as("t_click"))
      val c = ev.filter($"event_type" === "purchase")
        .join(b, "user_id").filter($"ts" > $"t_click")
        .groupBy($"user_id").agg(min($"ts").as("t_buy"))
      val stages = Seq(("1_view", a), ("2_click", b), ("3_purchase", c))
      stages.map { case (name, df) =>
        df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), $"n_users")
      }.reduce(_ unionByName _).orderBy($"stage")
    }),

    // Weekly cohort retention: users grouped by first-seen week, distinct
    // actives per (cohort, week offset) — the other product-analytics
    // staple. One groupBy(user) for cohorts (tiny frontier, broadcast
    // back), one distinct-agg on (cohort, week) — both map-side
    // combinable.
    "q_retention" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events").select($"user_id", $"ts")
      val first = ev.groupBy($"user_id")
        .agg(date_trunc("week", min($"ts")).as("cohort"))
      ev.join(first, "user_id")
        .select($"user_id", $"cohort",
          (datediff(date_trunc("week", $"ts"), $"cohort") / lit(7))
            .cast("long").as("wk"))
        .groupBy($"cohort", $"wk")
        .agg(countDistinct($"user_id").as("n_users"))
        .orderBy($"cohort", $"wk")
    }),

    // Ranking-function sweep: lag / ntile / percent_rank in one
    // per-user event window (deterministic (ts, event_id) order). One
    // hash shuffle on user_id + per-partition sort — per-user state
    // only, any user's history fits a partition.
    "q_window_funcs" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      t(s, dir, "events")
        .select($"user_id", $"event_id",
          lag($"value", 1).over(w).as("prev_value"),
          ntile(4).over(w).cast("long").as("quartile"),
          (round(percent_rank().over(w), 6) + lit(0.0)).as("pr"))
        .orderBy($"user_id", $"event_id")
    }),

    // Conditional aggregation (CASE-gated counts/sums — the "pivot
    // lite" reporting shape): single map-side-combined groupBy.
    "q_conditional_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          count(when($"value" > 50, 1)).as("n_big"),
          (round(sum(when($"value" > 50, $"value")), 2) + lit(0.0)).as("sum_big"))
        .orderBy($"event_type")
    }),

    // GROUPING SETS — the third member of the multi-granularity agg
    // family beside q_rollup/q_cube: two independent 1-D breakdowns plus
    // the grand total in ONE pass (Spark expands to a single shuffle
    // with a grouping-id column, not three scans). Null ordering pinned
    // explicitly — Spark defaults NULLS FIRST, DuckDB NULLS LAST.
    "q_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_gs")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(o_totalprice), 2) AS rev
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST,
                 o_orderpriority ASC NULLS FIRST""")
    }),

    // Time-series gap filling (resample): hourly counts of a sparse
    // event slice with EVERY hour of the observed range present —
    // missing hours as explicit zeros (the monitoring/dashboard
    // contract; a naive groupBy silently drops empty buckets). The hour
    // grid is generated from a 1-row bounds aggregate via sequence() +
    // explode — no driver round-trip, and the left join's build side is
    // the (tiny) observed-counts table.
    "q_gap_fill" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .filter($"event_type" === "click" && $"user_id" % 50 === 0)
        .select(date_trunc("hour", $"ts").as("h"))
      val hourly = ev.groupBy($"h").agg(count(lit(1)).as("n"))
      val grid = ev.agg(min($"h").as("lo"), max($"h").as("hi"))
        .select(explode(sequence($"lo", $"hi", expr("interval 1 hour"))).as("h"))
      grid.join(hourly, Seq("h"), "left")
        .select($"h", coalesce($"n", lit(0L)).as("n"))
        .orderBy($"h")
    }),

    // KMV distinct-count sketch (cardinality member of the sketch
    // family): k smallest distinct 60-bit hashes — deterministic at ANY
    // scale (k-min-set is order/partitioning independent), exact below
    // capacity (the oracle regime, is_exact = true), ~1/√(k−2) relative
    // error beyond. Aggregation state ≤ k longs per partial vs
    // count(DISTINCT)'s full distinct shuffle.
    "q_distinct_sketch" -> ((s, dir) => {
      import s.implicits._
      DistinctSketch.distinctCount(t(s, dir, "documents"), $"text", k = 8192)
    }),

    // Per-GROUP heavy hitters: the Misra-Gries sketch as a grouped udaf
    // — top-3 terms per source with one map-side-combined aggregate
    // whose state is ≤ k counters per (partition, group). Fixture
    // per-source vocabulary ≤ k, so residuals are exact counts (the
    // sketch contract); at web scale the same plan yields conservative
    // under-estimates instead of an unbounded per-group term shuffle.
    "q_group_top_terms" -> ((s, dir) => {
      import s.implicits._
      val sketch = udaf(new HeavyHitters.MgTopAgg(4096, 3),
        org.apache.spark.sql.Encoders.STRING)
      t(s, dir, "documents")
        .select($"source", explode(T.tokens(lower($"text"))).as("term"))
        .groupBy($"source")
        .agg(sketch($"term").as("top"))
        .select($"source", posexplode($"top").as(Seq("rk0", "tc")))
        .select($"source", ($"rk0" + 1).as("rk"),
          $"tc._1".as("term"), $"tc._2".as("cnt"))
        .orderBy($"source", $"rk")
    }),

    // Grouped percentiles through the same KLL sketch udaf the streaming
    // path uses (Streaming.windowedQuantiles): per-source p50/p95 of
    // document length with ONE map-side-combined aggregate — no
    // per-group sort, no window function.
    "q_group_quantiles" -> ((s, dir) => {
      import s.implicits._
      val sketch = udaf(
        new QuantileSketch.KllQuantilesAgg(8192, Seq("0.5", "0.95")),
        org.apache.spark.sql.Encoders.scalaDouble)
      t(s, dir, "documents")
        .filter($"n_chars".isNotNull) // null would decode as 0.0 in the sketch
        .groupBy($"source")
        .agg(sketch($"n_chars".cast("double")).as("qv"))
        .select($"source",
          element_at($"qv", 1).cast("long").as("p50"),
          element_at($"qv", 2).cast("long").as("p95"))
        .orderBy($"source")
    }),

    // Mergeable KLL quantile sketch over document lengths: map-side
    // partial sketches, shuffle carries ≤ cap·log₂(n/cap) doubles per
    // partition instead of a distributed sort. Fixture runs in the
    // exact-under-capacity regime (n ≤ cap → no compaction →
    // quantile_disc-identical); at 100 TB the same plan degrades to the
    // documented O(log(n/cap)/cap) rank error.
    "q_quantile_sketch" -> ((s, dir) => {
      QuantileSketch.quantiles(
        t(s, dir, "documents"), "n_chars",
        Seq("0.25", "0.5", "0.75", "0.9", "0.99").map(BigDecimal(_)),
        cap = 8192)
    }),

    // Relational sweep completeness: FULL OUTER join — customers with no
    // orders and (synthetically filtered) orders whose customer is
    // outside the slice both survive with nulls. Aggregate-then-join so
    // the outer join sees one row per key side.
    "q_outer_join" -> ((s, dir) => {
      import s.implicits._
      val totals = t(s, dir, "orders")
        .filter($"o_custkey" <= 60)
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          round(sum($"o_totalprice"), 2).as("revenue"))
      val custs = t(s, dir, "customer")
        .filter($"c_custkey" >= 30 && $"c_custkey" <= 90)
        .select($"c_custkey", $"c_name")
      custs.join(totals, $"c_custkey" === $"o_custkey", "full_outer")
        .select(
          coalesce($"c_custkey", $"o_custkey").as("custkey"),
          $"c_name", $"n_orders", $"revenue")
        .orderBy($"custkey")
    }),

    // Trending: per 6-hour window, top-2 event types by count — the
    // windowed-top-k monitoring query (one groupBy shuffle + a
    // per-window rank over the tiny type dimension).
    "q_trending" -> ((s, dir) => {
      import s.implicits._
      val counts = t(s, dir, "events")
        .withColumn("w", date_format(
          timestamp_seconds(floor(unix_timestamp($"ts") / 21600) * 21600),
          "yyyy-MM-dd HH:mm:ss"))
        .groupBy($"w", $"event_type")
        .agg(count(lit(1)).as("n"))
      val rw = Window.partitionBy($"w").orderBy($"n".desc, $"event_type")
      counts.withColumn("rk", row_number().over(rw))
        .filter($"rk" <= 2)
        .select($"w", $"rk", $"event_type", $"n")
        .orderBy($"w", $"rk")
    }),

    // Media/binary content dedup: group BINARY payloads by md5 — the
    // multimodal twin of exact text dedup (at 100 TB the shuffle
    // carries 16-byte hashes, never payloads). The fixture has no
    // byte-identical full texts, so payloads are synthesized from each
    // doc's 3-token prefix (the recurring-thumbnail shape). Dup groups
    // only.
    "q_media_dedup" -> ((s, dir) => {
      import s.implicits._
      spread(s, t(s, dir, "documents"))
        .withColumn("bin",
          Multimodal.payload(array_join(slice(T.tokens($"text"), 1, 3), " ")))
        .groupBy(md5($"bin").as("h"))
        .agg(min($"doc_id").as("keeper"), count(lit(1)).as("n"),
          sum(length($"bin")).as("bytes"))
        .filter($"n" >= 2)
        .select($"keeper", $"n", $"bytes")
        .orderBy($"keeper")
    }),

    // Deterministic exact-N sample: global order by seeded md5 hash,
    // take 50 — the "give me exactly N reproducible rows" primitive
    // (rate gates give a binomial count; this gives N). One
    // TakeOrderedAndProject, k-bounded like any top-k.
    "q_sample_exact" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id",
          Dedup.hash60(concat(lit("s1:"), $"doc_id".cast("string"))).as("h"))
        .orderBy($"h", $"doc_id").limit(50)
        .select($"doc_id", $"h")
    }),

    // Sliding-window chunking (20-token windows, stride 10 → 50%
    // overlap): boundary-spanning context stays retrievable
    // (T.chunksSliding scaladoc). Pure per-row generator + posexplode.
    "q_chunk_sliding" -> ((s, dir) => {
      import s.implicits._
      spread(s, t(s, dir, "documents"))
        .select($"doc_id",
          posexplode(T.chunksSliding($"text", 20, 10))
            .as(Seq("chunk_idx", "chunk")))
        .select($"doc_id", $"chunk_idx", $"chunk")
        .orderBy($"doc_id", $"chunk_idx")
    }),

    // The SQL surface through the oracle gate: plain spark.sql text
    // over the REGISTERED graft kernels (ext.GraftFunctions) — same
    // engine and plan as the Column API, proven by the shared oracle.
    "q_sql_kernels" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      graft.ext.GraftFunctions.register(s)
      s.sql(
        """SELECT doc_id,
          |       CAST(graft_char_entropy(text) AS DOUBLE) / 1e6 AS entropy,
          |       graft_repeat_stats(split(trim(text), '\\s+')).max_repeat
          |         AS max_rep
          |FROM documents WHERE trim(text) <> ''
          |ORDER BY doc_id""".stripMargin)
    }),

    // Min-span proximity: tightest token window covering all three
    // query terms (native MinSpan kernel, one O(n·k) scan/row) — the
    // terms-TOGETHER relevance feature beside BM25's terms-present.
    "q_min_span" -> ((s, dir) => {
      import s.implicits._
      import graft.expressions.MinSpan.minSpanF
      spread(s, t(s, dir, "documents"))
        .select($"doc_id",
          minSpanF(T.tokens(lower($"text")),
            typedLit(Seq("vector", "join", "scan"))).as("minspan"))
        .filter($"minspan".isNotNull)
        .orderBy($"doc_id")
    }),

    // Inverted-index build: top-10 terms by document frequency with
    // their first 10 posting-list entries (Bm25.buildPostings
    // scaladoc — one (term, doc_id) shuffle, map-side combined).
    "q_postings" -> ((s, dir) => {
      import s.implicits._
      Bm25.buildPostings(spread(s, t(s, dir, "documents")), "doc_id", "text")
        .select($"term", $"df",
          array_join(slice($"postings", 1, 10), ",").as("head10"))
        .orderBy($"df".desc, $"term").limit(10)
    }),

    // Frequent-word subsampling (word2vec): corpus-frequency keep
    // rates, hash-gated per (token:doc:pos) — deterministic thinning
    // (Sampling.subsampleFrequent scaladoc).
    "q_word_subsample" -> ((s, dir) => {
      import s.implicits._
      Sampling.subsampleFrequent(spread(s, t(s, dir, "documents")),
        "doc_id", "text", threshold = 0.001)
        .orderBy($"doc_id")
    }),

    // Per-stratum percentile quality gate: keep each source's top
    // decile by quality score — the relative-threshold curation rule
    // (absolute cutoffs mis-filter heterogeneous sources). One window
    // per stratum over the quantized score; (q, doc_id) total order
    // makes percent_rank engine-deterministic.
    "q_quality_gate" -> ((s, dir) => {
      import s.implicits._
      val scored = t(s, dir, "documents")
        .select($"doc_id", $"source", round(T.qualityScore($"text"), 4).as("q"))
      val w = Window.partitionBy($"source").orderBy($"q", $"doc_id")
      scored.withColumn("pr", percent_rank().over(w))
        .filter($"pr" >= 0.9)
        .select($"doc_id", $"source", $"q")
        .orderBy($"source", $"doc_id")
    }),

    // Dominant embedding direction by distributed power iteration
    // (the All-but-the-Top / PCA-denoising primitive, Mu & Viswanath
    // 2018): 3 fixed iterations of v ← Xᵀ(Xv); each pass is one
    // map-side-combined dim-bounded aggregation (shuffle carries
    // (pos, partial) — 64 × partitions rows), the per-iteration
    // normalize runs on the 64-row driver collect. Every sum is over
    // micro-unit LONGs (round-after-scale-up), so iterates are exact
    // integers both engines reproduce; L∞ normalization keeps the
    // per-iteration scale integer-exact (max|u| beats an
    // order-sensitive float L2 sum).
    "q_pca_top" -> ((s, dir) => {
      import s.implicits._
      powerIterTop(s, dir).zipWithIndex.map { case (x, j) => (j + 1, x) }
        .toDF("pos", "v").orderBy($"pos")
    }),

    // All-but-the-Top applied (Mu & Viswanath 2018): subtract each
    // embedding's projection onto the dominant direction — the
    // denoising step that lifts retrieval on anisotropic embeddings.
    // v̂ = L2-normalized power-iteration direction (driver, exact
    // integer micro-units); per-row projection is a micro-unit dot,
    // correction is per-element arithmetic — zero shuffles.
    "q_abtt" -> ((s, dir) => {
      import s.implicits._
      val v = powerIterTop(s, dir)
      val vm = v.map(x =>
        java.math.BigDecimal.valueOf(x).movePointRight(6).longValueExact())
      val n2 = vm.map(x => x * x).sum
      val vhat = vm.map(_.toDouble / math.sqrt(n2.toDouble))
      val vhatLit = typedLit(vhat)
      val corrected = (0 until 3).map { j =>
        (round(element_at($"embedding", j + 1).cast("double") -
          ($"pm".cast("double") / lit(1000000.0)) * lit(vhat(j)), 6)
          + lit(0.0)).as(s"c$j")
      }
      spread(s, t(s, dir, "embeddings"))
        .withColumn("pm", aggregate(
          zip_with($"embedding", vhatLit, (x, vv) =>
            round(x.cast("double") * vv * lit(1000000.0), 0).cast("long")),
          lit(0L), (acc, x) => acc + x))
        .select(($"vec_id" +: corrected): _*)
        .orderBy($"vec_id")
    }),

    // BPE merge-rule LEARNING (tokenizer training): one corpus-sized
    // word-count agg, then the Sennrich loop over the bounded vocab
    // driver-side — first 5 learned merges out (BpeTrain scaladoc).
    "q_bpe_train" -> ((s, dir) => {
      import s.implicits._
      BpeTrain.learnMerges(spread(s, t(s, dir, "documents")), "text", 5)
        .orderBy($"step")
    }),

    // Quantized-MLP embedder end-to-end (O12 real-model path): int8
    // token vectors → integer mean-pool → int8 GEMM + ReLU + >>6
    // requant → int8 GEMM → L2 norm, through the BATCHED per-partition
    // inference boundary. Every intermediate is exact integer
    // arithmetic, so the DuckDB oracle replicates the whole forward
    // pass (first 3 output dims checked, like q_hash_embed).
    "q_mlp_embed" -> ((s, dir) => {
      import s.implicits._
      import graft.embed.{Embed, QuantizedMlpEmbedder}
      val docs = spread(s, t(s, dir, "documents")).select($"doc_id", $"text")
      Embed.withEmbeddingBatched(docs, "text", "embedding",
        QuantizedMlpEmbedder(), batchSize = 64)
        .select($"doc_id",
          round(element_at($"embedding", 1).cast("double"), 6).as("e0"),
          round(element_at($"embedding", 2).cast("double"), 6).as("e1"),
          round(element_at($"embedding", 3).cast("double"), 6).as("e2"))
        .orderBy($"doc_id")
    }),

    // Per-epoch trainer sharding: seeded md5 permutation → shard for
    // 8 data-parallel trainers + in-shard read order. One uniform hash
    // shuffle + per-shard sort (Packing.trainerShards scaladoc).
    "q_train_shard" -> ((s, dir) => {
      import s.implicits._
      Packing.trainerShards(t(s, dir, "documents"), $"doc_id",
        nShards = 8, epoch = 1)
        .select($"shard", $"seq", $"doc_id")
        .orderBy($"shard", $"seq")
    }),

    // Radius (range) search: all vectors with quantized cosine ≥ 0.2
    // to the query — the data-dependent-cardinality twin of top-k
    // (VectorStore.searchRange). Scan-speed filter, no shuffle.
    "q_range_search" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val q = e.filter($"vec_id" === 0).select($"embedding".as("qe"))
      e.crossJoin(broadcast(q))
        .withColumn("score", score6(V.cosine($"embedding", $"qe")))
        .filter($"score" >= 0.2)
        .select($"vec_id", $"score")
        .orderBy($"score".desc, $"vec_id")
    }),

    // Character-entropy quality signal: per-doc Shannon entropy in
    // nats (native CharEntropy kernel, exact micro-nat integer sum) —
    // near-zero entropy = repeated-filler/junk pages. Pure per-row
    // projection, no shuffle.
    "q_char_entropy" -> ((s, dir) => {
      import s.implicits._
      // no final round(): micro-nats are an exact integer both engines
      // divide identically — a display round at a .5 boundary would
      // diverge (BigDecimal shortest-repr vs binary-value ROUND)
      spread(s, t(s, dir, "documents"))
        .select($"doc_id",
          (T.charEntropyMicro($"text").cast("double") / lit(1000000.0))
            .as("entropy"))
        .orderBy($"doc_id")
    }),

    // Hard-negative mining (DPR-style training-data prep): per query,
    // top-5 highest-cosine corpus items whose label differs — broadcast
    // queries, scan-speed non-positive filter, k-bounded partial-agg
    // top-k (Rerank.hardNegatives scaladoc).
    "q_hard_negatives" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val qs = e.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("qid"), $"embedding".as("qe"), $"label".as("ql"))
      Rerank.hardNegatives(spread(s, e), qs, "vec_id", "embedding", "label",
        "qid", "qe", "ql", k = 5)
    }),

    // MMR diversity reranking over a 50-candidate first stage: the
    // greedy λ·rel − (1−λ)·maxSim selection runs driver-side on the
    // k-bounded candidate list (Rerank.mmr scaladoc); relevance and
    // pairwise cosines quantize round-6 before any comparison.
    "q_mmr_rerank" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val qv = e.filter($"vec_id" === 7).head.getSeq[Float](1)
      val qn = math.max(math.sqrt(qv.map(x => x.toDouble * x.toDouble).sum),
        V.NormEps)
      val scored = spread(s, e).select($"vec_id",
        score6(dotF($"embedding", typedLit(qv)) /
          (V.normSafe($"embedding") * lit(qn))).as("rel"),
        $"embedding")
      val cands = TopK.topK(scored, $"rel", $"vec_id", 50)
      Rerank.mmr(cands, "vec_id", "rel", "embedding", 10, lambda = 0.7)
    }),

    // DSIR importance resampling (Xie et al. 2023): tilt the corpus
    // toward a target domain (here source = 'src0') by hashed-unigram
    // log importance weight; top-100 selected. B-bounded stats ride
    // back as literals — no corpus-sized shuffle (Sampling scaladoc).
    "q_dsir_sample" -> ((s, dir) => {
      import s.implicits._
      val w = Sampling.dsirWeights(spread(s, t(s, dir, "documents")),
        "doc_id", "text", $"source" === "src0", buckets = 64)
      TopK.topK(w, $"dsir_w", $"doc_id", 100)
        .select($"doc_id", $"dsir_w")
    }),

    // The SQL surface: same engine, spark.sql text in, DataFrame out
    // (fixture tables registered as temp views; Catalyst plans SQL and
    // DataFrame formulations identically).
    "q_sql_agg" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderpriority, COUNT(*) AS n,
          |       ROUND(AVG(o_totalprice), 2) AS avg_price
          |FROM orders
          |WHERE year(o_orderdate) = 2000
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin)
    }),

    // CUBE: all grouping-set combinations (rollup's big sibling).
    "q_cube" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .cube($"l_returnflag", $"l_linestatus")
        .agg(round(sum($"l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    }),

    // Non-equi range join: orders banded by price bracket. The bracket
    // table is tiny → BroadcastNestedLoopJoin, evaluated as a codegen'd
    // predicate per row; no shuffle of the big side.
    "q_range_join" -> ((s, dir) => {
      import s.implicits._
      val bands = Seq(
        (0, 0.0, 50000.0), (1, 50000.0, 100000.0), (2, 100000.0, 200000.0),
        (3, 200000.0, 300000.0), (4, 300000.0, 1e18))
        .toDF("band_id", "lo", "hi")
      t(s, dir, "orders")
        .join(broadcast(bands), $"o_totalprice" >= $"lo" && $"o_totalprice" < $"hi")
        .groupBy($"band_id")
        .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("sum_price"))
        .orderBy($"band_id")
    }),

    // Salted skew join: result is EXACTLY the plain inner join (the oracle
    // is the unsalted SQL) but the hot keys spread over 8 reducers —
    // graft.operators.SkewJoin.
    "q_salted_join" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders").select($"o_orderkey", $"o_orderpriority")
      SkewJoin.saltedInnerJoin(li, o, $"l_orderkey", $"o_orderkey", 8,
        xxhash64($"l_orderkey", $"l_linenumber"))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
        .orderBy($"o_orderpriority")
    }),

    // Exact dedup: one canonical survivor per text fingerprint
    // (graft.operators.Dedup.exactDedup) — the cheapest dedup tier.
    "q_dedup_exact" -> ((s, dir) => {
      import s.implicits._
      Dedup.exactDedup(t(s, dir, "documents"), "text", "doc_id")
        .select($"doc_id", $"n_copies", $"source")
        .orderBy($"doc_id")
    }),

    // Incremental NEAR-dup against a persisted signature store
    // (Dedup.signatureStore + incrementalNearDups): the recurring-crawl
    // path — batch band hashes collide with stored corpus band hashes,
    // then the MinHash signature-agreement ESTIMATE verifies, so corpus
    // text is never re-read. Fixture: even docs are the corpus snapshot,
    // odd docs the new crawl.
    "q_incremental_neardup" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      // both sides are freshly computed and consumed twice inside
      // incrementalNearDups → materialize once (see its scaladoc; a
      // real deployment reads the corpus side from the parquet store)
      val corpus = Dedup.signatureStore(
        spread(s, docs.filter(pmod($"doc_id", lit(2)) === 0)), "doc_id", "text")
        .localCheckpoint(false)
      val batch = Dedup.signatureStore(
        spread(s, docs.filter(pmod($"doc_id", lit(2)) === 1)), "doc_id", "text")
        .localCheckpoint(false)
      Dedup.incrementalNearDups(batch, corpus, "doc_id", 0.5)
        .orderBy($"batch_id", $"corpus_id")
    }),

    // Incremental snapshot ingest: dedup a new batch within itself AND
    // against the already-ingested corpus (Dedup.incrementalDedup).
    // Fixture: odd docs are the fresh batch, even docs the corpus, and
    // every doc_id%4==0 text is replayed under a new id — replays must
    // drop (their text is already ingested), odds survive unless their
    // text collides with a corpus text. Only corpus FINGERPRINTS join.
    "q_incremental_dedup" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val existing = docs.filter(pmod($"doc_id", lit(2)) === 0)
      val fresh = docs.filter(pmod($"doc_id", lit(2)) === 1)
      val replayed = docs.filter(pmod($"doc_id", lit(4)) === 0)
        .withColumn("doc_id", $"doc_id" + 100000)
      Dedup.incrementalDedup(fresh.unionByName(replayed), existing,
          "text", "doc_id")
        .select($"doc_id", $"n_copies", $"source")
        .orderBy($"doc_id")
    }),

    // BPE-style token accounting next to whitespace tokens.
    "q_bpe_tokens" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id",
          T.bpeTokenCount($"text").cast("long").as("n_bpe"),
          size(T.tokens($"text")).cast("long").as("n_ws"))
        .orderBy($"doc_id")
    }),

    // TRUE byte-pair encoding (merge-table algorithm, bundled vocab) over
    // a normalized prefix of each doc — native single-loop kernel
    // (expressions/BpeEncode); the regex approximation q_bpe_tokens stays
    // beside it for whole-corpus accounting. The oracle replicates the
    // merge loop as a DuckDB recursive CTE.
    "q_bpe_real" -> ((s, dir) => {
      import s.implicits._
      val w = regexp_replace(lower(substring($"text", 1, 24)), "[^a-z]", "")
      t(s, dir, "documents")
        .select($"doc_id", T.bpeEncode(w).as("toks"))
        .select($"doc_id", array_join($"toks", "|").as("bpe_str"),
          size($"toks").cast("long").as("n_bpe"))
        .orderBy($"doc_id")
    }),

    // Order-sensitive rolling-hash fingerprint (Rabin–Karp fold).
    "q_rolling_fp" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", T.rollingHash($"text").as("rolling_fp"))
        .orderBy($"doc_id")
    }),

    // Analytic window frames: running sum + 4-row moving average per user.
    "q_running_window" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      t(s, dir, "events")
        .select($"event_id", $"user_id",
          round(sum($"value").over(w.rowsBetween(Long.MinValue, 0)), 4).as("run_sum"),
          round(avg($"value").over(w.rowsBetween(-3, 0)), 4).as("mov_avg"))
        .orderBy($"event_id")
    }),

    // Exact distinct aggregation (COUNT(DISTINCT) expands to a two-phase
    // partial aggregate — no driver collect).
    "q_distinct_users" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"event_type")
        .agg(countDistinct($"user_id").as("n_users"), count(lit(1)).as("n"))
        .orderBy($"event_type")
    }),

    // Vector aggregate: per-label centroid, one row per (label, dim pos).
    // posexplode + partial-aggregated avg; at 100 TB this is the standard
    // map-side-combined mean, shuffling only (label, pos) partials.
    "q_embed_centroid" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "embeddings")
        .select($"label", posexplode($"embedding").as(Seq("pos", "x")))
        .groupBy($"label", $"pos")
        .agg(round(avg($"x".cast("double")), 6).as("mean_x"))
        .orderBy($"label", $"pos")
    }),

    // Sliding windows (1 h window, 30 min slide): batch twin of the
    // streaming window(ts, dur, slide) — every event lands in 2 windows.
    "q_sliding" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select(window($"ts", "1 hour", "30 minutes").as("w"), $"value")
        .groupBy(date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("win_start"))
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
        .orderBy($"win_start")
    }),

    // Built-in session windows (gap-close semantics; streaming twin is
    // Streaming.sessionizeStream). Batch mode = plain aggregation.
    "q_session_window" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("sum_value"))
        .select($"user_id",
          date_format($"w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
          date_format($"w.end", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
          $"n_events", $"sum_value")
        .orderBy($"user_id", $"session_start")
    }),

    // Batched multi-query top-k through the TopKAggregator (two-phase
    // partial/final aggregation — the shuffle carries only k-bounded
    // buffers per query, the 100 TB shape; TopK.scala scaladoc).
    "q_batch_topk" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val qs = e.filter($"vec_id" < 5)
        .select($"vec_id".as("qid"), $"embedding".as("qe"))
      val scored = e.crossJoin(broadcast(qs))
        .select($"qid", $"vec_id",
          score6(V.cosine($"embedding", $"qe")).as("c"))
      TopK.topKPerKeyAgg(scored, Seq($"qid"), $"c", $"vec_id", 3)
        .select($"qid", $"id".as("vec_id"), $"score")
        .orderBy($"qid", $"score".desc, $"vec_id")
    }),

    // Deterministic hash-based sampling — the reproducible alternative to
    // rand()-based sample() for corpus subsetting: membership depends only
    // on the id (stable across runs, partitionings, engines), so the
    // oracle replicates it exactly. Keep-rate 10% per source.
    "q_hash_sample" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .filter(pmod(Dedup.hash60($"doc_id".cast("string")), lit(100L)) < 10)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_sampled"))
        .orderBy($"source")
    }),

    // Domain-mixture curation: per-source deterministic keep-rates
    // (src0 80%, src1 50%, src2 25%, rest 10%) — the hash-gated filter
    // runs at scan speed with no shuffle or RNG state, so the sample is
    // reproducible across runs and partitionings (Sampling.scala).
    "q_stratified_sample" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val kept = Sampling.stratifiedSample(d, $"source", $"doc_id",
        Map("src0" -> 0.8, "src1" -> 0.5, "src2" -> 0.25), 0.1)
      d.groupBy($"source").agg(count(lit(1)).as("n_total"))
        .join(kept.groupBy($"source").agg(count(lit(1)).as("__k")),
          Seq("source"), "left")
        .select($"source", $"n_total",
          coalesce($"__k", lit(0L)).as("n_sampled"))
        .orderBy($"source")
    }),

    // Scalar correlated-style subquery: orders priced above their
    // priority's average (Catalyst rewrites to an aggregate + join).
    "q_scalar_subq" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderpriority, COUNT(*) AS n_above
          |FROM orders o
          |WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders i
          |                      WHERE i.o_orderpriority = o.o_orderpriority)
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin)
    }),

    // Pivot: event counts per user-decile, one column per event type.
    "q_pivot" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .withColumn("user_bucket", pmod($"user_id", lit(10)))
        .groupBy($"user_bucket")
        .pivot("event_type", Seq("click", "error", "purchase", "search", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy($"user_bucket")
    }),

    // Edit-distance near-dup (the character-level dedup tier): Levenshtein
    // over 40-char prefixes, blocked by source — both engines implement
    // the classic DP so values agree exactly.
    "q_edit_distance" -> ((s, dir) => {
      import s.implicits._
      val d = spread(s, t(s, dir, "documents"))
        .select($"doc_id", $"source", substring($"text", 1, 40).as("pre"))
      val a = d.select($"doc_id".as("doc_a"), $"source", $"pre".as("pa"))
      val b = d.select($"doc_id".as("doc_b"), $"source", $"pre".as("pb"))
      a.join(b, Seq("source")).filter($"doc_a" < $"doc_b")
        .withColumn("dist", levenshtein($"pa", $"pb"))
        .filter($"dist" <= 10)
        .select($"doc_a", $"doc_b", $"dist")
        .orderBy($"doc_a", $"doc_b")
    }),

    // Feature-hashing embedder (SURVEY O12) run through the real
    // mapPartitions plumbing (one Embedder per partition — the model-load
    // contract). The ±1-vote construction keeps every intermediate an
    // exact integer in double, so the DuckDB oracle replicates the whole
    // embedding bit-for-bit including the float32 cast.
    "q_hash_embed" -> ((s, dir) => {
      import s.implicits._
      import graft.embed.{Embed, HashingEmbedder}
      val docs = spread(s, t(s, dir, "documents")).select($"doc_id", $"text")
      Embed.withEmbedding(docs, "text", "embedding", HashingEmbedder(64))
        .select($"doc_id",
          round(element_at($"embedding", 1).cast("double"), 6).as("e0"),
          round(element_at($"embedding", 2).cast("double"), 6).as("e1"),
          round(element_at($"embedding", 3).cast("double"), 6).as("e2"))
        .orderBy($"doc_id")
    }),

    // Sketches: HyperLogLog distinct + KLL-style approximate percentiles,
    // with a CHECKABLE error-band contract. Approx internals are
    // engine-specific, so instead of hashing raw estimates the query
    // emits (a) exact values (oracle-comparable) and (b) booleans
    // asserting each estimate lies inside its documented band — HLL
    // within 3·rsd = 15% relative error, percentile_approx(acc=10000)
    // within the exact p94..p96 value range (rank error ≤ n/10000 ≪
    // 0.01·n). The oracle emits literal TRUE for the bands: an
    // out-of-band sketch turns the gate red.
    "q_approx_sketch" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"event_type")
        .agg(countDistinct($"user_id").as("n_users"),
          approx_count_distinct($"user_id", 0.05).as("hll_users"),
          expr("percentile(value, array(0.94, 0.95, 0.96))").as("ps"),
          percentile_approx($"value", lit(0.95), lit(10000)).as("ap95"))
        .select($"event_type", $"n_users",
          round($"ps".getItem(1), 4).as("p95"),
          (abs($"hll_users" - $"n_users") <=
            $"n_users".cast("double") * 0.15).as("hll_in_band"),
          ($"ap95" >= $"ps".getItem(0) &&
            $"ap95" <= $"ps".getItem(2)).as("p95_in_band"))
        .orderBy($"event_type")
    })
  )

  /** The q_curation oracle's CTE chain through near-dup removal
    * (`final` = surviving docs with their redacted text), shared with
    * the composed SFT-pipeline oracle. */
  private val curationCoreSql =
    """clean AS (
      |  SELECT doc_id, source,
      |    regexp_replace(regexp_replace(regexp_replace(text,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
      |      '\+?[0-9][0-9()\s\-]{6,}[0-9]', '<PHONE>', 'g') AS txt
      |  FROM documents),
      |tk AS (
      |  SELECT doc_id, source, txt,
      |         CASE WHEN trim(txt) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(txt), '\s+') END AS toks
      |  FROM clean),
      |gt AS (
      |  SELECT *, CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[])
      |                 ELSE list_transform(generate_series(1, len(toks)-1),
      |                        i -> toks[i] || ' ' || toks[i+1]) END AS g2
      |  FROM tk),
      |q AS (
      |  SELECT doc_id, source, txt, toks,
      |    ROUND(LEAST(len(toks)::DOUBLE/100.0, 1.0) * (0.7 + 0.3 *
      |      len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in','is'], t)))::DOUBLE
      |      / GREATEST(len(toks)::DOUBLE, 1.0)), 4) AS quality,
      |    ROUND(CASE WHEN len(g2) = 0 THEN 0.0
      |          ELSE 1.0 - len(list_distinct(g2))::DOUBLE / len(g2)::DOUBLE END, 4) AS dup2
      |  FROM gt),
      |filtered AS (SELECT * FROM q WHERE quality >= 0.2 AND dup2 <= 0.5),
      |keepers AS (
      |  SELECT MIN(doc_id) AS doc_id
      |  FROM filtered
      |  GROUP BY md5(lower(trim(regexp_replace(txt, '\s+', ' ', 'g'))))),
      |uniq AS (SELECT f.* FROM filtered f JOIN keepers USING (doc_id)),
      |s AS (
      |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks)-1),
      |           i -> toks[i] || ' ' || toks[i+1])) AS sh
      |  FROM uniq WHERE len(toks) >= 2),
      |sig AS (
      |  SELECT doc_id, sh,
      |         list_transform(generate_series(0, 15), i ->
      |           list_min(list_transform(sh, x ->
      |             ('0x'||substr(md5(i::VARCHAR||':'||x), 1, 15))::BIGINT))) AS sig
      |  FROM s WHERE len(sh) > 0),
      |bands AS (
      |  SELECT doc_id, band_idx,
      |         md5(array_to_string(sig[band_idx*4+1 : band_idx*4+4], ',')) AS bh
      |  FROM (SELECT doc_id, sig, unnest(generate_series(0, 3)) AS band_idx FROM sig)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id da, b.doc_id db
      |  FROM bands a JOIN bands b
      |    ON a.band_idx = b.band_idx AND a.bh = b.bh AND a.doc_id < b.doc_id),
      |drp AS (
      |  SELECT DISTINCT db FROM (
      |    SELECT da, db,
      |           len(list_intersect(x.sh, y.sh))::DOUBLE /
      |             (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) AS jac
      |    FROM cand JOIN s x ON da = x.doc_id JOIN s y ON db = y.doc_id)
      |  WHERE jac >= 0.2),
      |final AS (SELECT * FROM uniq WHERE doc_id NOT IN (SELECT db FROM drp))""".stripMargin

  /** The deterministic md5-gate mixture-sampling predicate shared by the
    * curation and SFT-pipeline oracles (rates src0=0.8, src1=0.5,
    * default 0.6). */
  private val curationGateSql =
    """('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 1000000 <
      |      (CASE source WHEN 'src0' THEN 0.8 WHEN 'src1' THEN 0.5 ELSE 0.6 END) * 1000000.0""".stripMargin

  private def extraOracles: Map[String, String] = Map(

    // Exact values + literal TRUE for the band flags: the Spark side
    // computes band membership itself, so a drifting sketch estimate
    // flips a boolean and the hash check catches it.
    "q_approx_sketch" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  ROUND(quantile_cont(value, 0.95), 4) AS p95,
        |  true AS hll_in_band,
        |  true AS p95_in_band
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_substr_removal" ->
      """WITH t AS (
        |  SELECT doc_id, text, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |w AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(1, len(toks)-7),
        |           i -> ('0x'||substr(md5(array_to_string(toks[i:i+7], ' ')), 1, 15))::BIGINT) AS whs
        |  FROM t WHERE len(toks) >= 8),
        |ex AS (
        |  SELECT doc_id, unnest(generate_series(0, len(whs)-1)) AS pos, unnest(whs) AS h
        |  FROM w),
        |dup AS (SELECT h FROM ex GROUP BY h HAVING COUNT(*) >= 2),
        |occ AS (SELECT doc_id, pos, h FROM ex WHERE h IN (SELECT h FROM dup)),
        |rnk AS (
        |  SELECT doc_id, pos,
        |         row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
        |  FROM occ),
        |rm AS (
        |  SELECT doc_id, pos + unnest(generate_series(0, 7)) AS tp
        |  FROM rnk WHERE rn > 1),
        |tok AS (
        |  SELECT doc_id, unnest(generate_series(0, len(toks)-1)) AS tp, unnest(toks) AS tok
        |  FROM t WHERE len(toks) > 0),
        |kept AS (
        |  SELECT k.doc_id, string_agg(k.tok, ' ' ORDER BY k.tp) AS clean,
        |         CAST(COUNT(*) AS BIGINT) AS n_kept
        |  FROM tok k
        |  WHERE NOT EXISTS (SELECT 1 FROM rm r WHERE r.doc_id = k.doc_id AND r.tp = k.tp)
        |  GROUP BY k.doc_id)
        |SELECT t.doc_id,
        |       CASE WHEN COALESCE(kept.n_kept, 0) = len(t.toks) THEN t.text
        |            ELSE COALESCE(kept.clean, '') END AS clean,
        |       COALESCE(kept.n_kept, 0) AS n_kept,
        |       CAST(len(t.toks) - COALESCE(kept.n_kept, 0) AS BIGINT) AS n_removed
        |FROM t LEFT JOIN kept ON t.doc_id = kept.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    "q_heavy_hitters" ->
      """SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM (
        |  SELECT unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |                     ELSE string_split_regex(trim(lower(text)), '\s+') END) AS term
        |  FROM documents)
        |GROUP BY term ORDER BY cnt DESC, term LIMIT 20""".stripMargin,

    "q_jsonl_roundtrip" ->
      """SELECT doc_id, source, text FROM documents ORDER BY doc_id""".stripMargin,

    "q_unicode_clean" ->
      """SELECT doc_id,
        |       nfc_normalize(substr(text, 1, 32) || sfx) AS nfc,
        |       strip_accents(substr(text, 1, 32) || sfx) AS plain
        |FROM documents,
        |     (SELECT ' Mu'||chr(776)||'ller cafe'||chr(769)||' '||chr(241)||'and'||chr(250) AS sfx)
        |ORDER BY doc_id""".stripMargin,

    "q_snapshot_diff" ->
      """WITH old AS (
        |  SELECT doc_id, ('0x'||substr(md5(text), 1, 15))::BIGINT AS h_old
        |  FROM documents WHERE doc_id < 400),
        |new_snap AS (
        |  SELECT doc_id,
        |         ('0x'||substr(md5(CASE WHEN doc_id >= 200 AND doc_id < 250
        |                                THEN text || ' rev2' ELSE text END), 1, 15))::BIGINT AS h_new
        |  FROM documents WHERE doc_id >= 100),
        |j AS (
        |  SELECT CASE WHEN h_old IS NULL THEN 'added'
        |              WHEN h_new IS NULL THEN 'removed'
        |              WHEN h_old = h_new THEN 'same'
        |              ELSE 'changed' END AS status
        |  FROM old FULL OUTER JOIN new_snap USING (doc_id))
        |SELECT status, CAST(count(*) AS BIGINT) AS n_docs
        |FROM j GROUP BY status ORDER BY status""".stripMargin,

    "q_mlm_mask" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(1, len(toks)),
        |           i -> CASE WHEN ('0x'||substr(md5(doc_id::VARCHAR || ':' || (i-1)::VARCHAR || ':mlm'), 1, 15))::BIGINT % 100 < 15
        |                THEN '[MASK]' ELSE toks[i] END) AS mk
        |  FROM t)
        |SELECT doc_id, array_to_string(mk, ' ') AS masked,
        |       CAST(len(list_filter(mk, x -> x = '[MASK]')) AS BIGINT) AS n_masked
        |FROM m ORDER BY doc_id""".stripMargin,

    "q_user_paths" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS newsess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         SUM(newsess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess
        |  FROM x),
        |p AS (
        |  SELECT user_id, sess, string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM s GROUP BY user_id, sess)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        |FROM p GROUP BY path ORDER BY n_sessions DESC, path LIMIT 10""".stripMargin,

    "q_null_semantics" ->
      """WITH e AS (
        |  SELECT event_type, CASE WHEN value >= 20 THEN value END AS v
        |  FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_all,
        |       CAST(count(v) AS BIGINT) AS n_nonnull,
        |       round(sum(v), 2) + 0.0 AS sum_v,
        |       round(sum(coalesce(v, 0.0)), 2) + 0.0 AS sum_v0
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_standardize" ->
      """WITH ex AS (
        |  SELECT vec_id,
        |         unnest(generate_series(0, len(embedding)-1)) AS pos,
        |         unnest(list_transform(embedding,
        |           v -> CAST(ROUND(v::DOUBLE * 1e6, 0) AS BIGINT))) AS xq
        |  FROM embeddings),
        |st AS (
        |  SELECT pos, count(*) AS n, SUM(xq) AS s, SUM(xq*xq) AS ss
        |  FROM ex GROUP BY pos),
        |ms AS (
        |  SELECT pos, s::DOUBLE / n / 1e6 AS mean,
        |         sqrt(greatest(ss::DOUBLE / n - (s::DOUBLE / n) * (s::DOUBLE / n), 0.0) / 1e12) AS std
        |  FROM st)
        |SELECT e.vec_id, e.pos,
        |       CASE WHEN m.std > 0
        |            THEN round((e.xq / 1e6 - m.mean) / m.std, 4) + 0.0
        |            ELSE 0.0 END AS z
        |FROM ex e JOIN ms m USING (pos)
        |ORDER BY e.vec_id, e.pos""".stripMargin,

    "q_export_manifest" ->
      """SELECT doc_id % 8 AS shard, CAST(count(*) AS BIGINT) AS n_rows,
        |       bit_xor(('0x'||substr(md5(doc_id::VARCHAR || ':' || text), 1, 15))::BIGINT) AS checksum
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_index_health" ->
      """WITH h AS (
        |  SELECT vec_id, md5(vec_id::VARCHAR) AS hx, len(embedding) AS dim,
        |         (SELECT CAST(ROUND(ROUND(SQRT(SUM(x*x)), 6) * 1e6, 0) AS BIGINT)
        |          FROM (SELECT unnest(embedding)::DOUBLE AS x)) AS nrm_micro
        |  FROM embeddings),
        |m AS (
        |  SELECT (((((('0x'||substr(hx, 1,8))::BIGINT % 8) * 4294967296
        |           + ('0x'||substr(hx, 9,8))::BIGINT) % 8) * 4294967296
        |           + ('0x'||substr(hx,17,8))::BIGINT) % 8 * 4294967296
        |           + ('0x'||substr(hx,25,8))::BIGINT) % 8 AS shard,
        |         dim, nrm_micro
        |  FROM h)
        |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(min(dim) AS INT) AS min_dim, CAST(max(dim) AS INT) AS max_dim,
        |       ROUND(SUM(nrm_micro) / 1e6 / COUNT(*), 4) + 0.0 AS avg_norm
        |FROM m GROUP BY shard ORDER BY shard""".stripMargin,

    "q_retention" ->
      """WITH f AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort
        |  FROM events GROUP BY user_id)
        |SELECT f.cohort,
        |       CAST(datediff('day', f.cohort, date_trunc('week', e.ts)) / 7 AS BIGINT) AS wk,
        |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM events e JOIN f ON e.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_funnel" ->
      """WITH a AS (
        |  SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |b AS (
        |  SELECT e.user_id, min(e.ts) AS t_click
        |  FROM events e JOIN a ON e.user_id = a.user_id
        |  WHERE e.event_type = 'click' AND e.ts > a.t_view
        |  GROUP BY e.user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t_buy
        |  FROM events e JOIN b ON e.user_id = b.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > b.t_click
        |  GROUP BY e.user_id)
        |SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM a
        |UNION ALL
        |SELECT '2_click', CAST(count(*) AS BIGINT) FROM b
        |UNION ALL
        |SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM c
        |ORDER BY stage""".stripMargin,

    "q_window_funcs" ->
      """SELECT user_id, event_id,
        |       lag(value, 1) OVER w AS prev_value,
        |       ntile(4) OVER w AS quartile,
        |       round(percent_rank() OVER w, 6) + 0.0 AS pr
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_conditional_agg" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(CASE WHEN value > 50 THEN 1 END) AS BIGINT) AS n_big,
        |       round(sum(CASE WHEN value > 50 THEN value END), 2) + 0.0 AS sum_big
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n,
        |       round(sum(o_totalprice), 2) AS rev
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q_gap_fill" ->
      """WITH ev AS (
        |  SELECT date_trunc('hour', ts) AS h FROM events
        |  WHERE event_type = 'click' AND user_id % 50 = 0),
        |b AS (SELECT min(h) AS lo, max(h) AS hi FROM ev),
        |grid AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b),
        |c AS (SELECT h, CAST(count(*) AS BIGINT) AS n FROM ev GROUP BY h)
        |SELECT g.h, COALESCE(c.n, 0) AS n
        |FROM grid g LEFT JOIN c USING (h) ORDER BY h""".stripMargin,

    "q_distinct_sketch" ->
      """SELECT count(DISTINCT text) AS n_distinct, true AS is_exact
        |FROM documents""".stripMargin,

    "q_group_top_terms" ->
      """WITH tok AS (
        |  SELECT source,
        |         unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |                     ELSE string_split_regex(trim(lower(text)), '\s+') END) AS term
        |  FROM documents),
        |c AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cnt
        |      FROM tok GROUP BY source, term),
        |r AS (SELECT source, term, cnt,
        |             row_number() OVER (PARTITION BY source ORDER BY cnt DESC, term) AS rk
        |      FROM c)
        |SELECT source, CAST(rk AS INT) AS rk, term, cnt
        |FROM r WHERE rk <= 3 ORDER BY source, rk""".stripMargin,

    "q_group_quantiles" ->
      """SELECT source, quantile_disc(n_chars, 0.5) AS p50,
        |       quantile_disc(n_chars, 0.95) AS p95
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q_quantile_sketch" ->
      """SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99])::DOUBLE AS q,
        |       unnest([quantile_disc(n_chars, 0.25), quantile_disc(n_chars, 0.5),
        |               quantile_disc(n_chars, 0.75), quantile_disc(n_chars, 0.9),
        |               quantile_disc(n_chars, 0.99)]) AS value
        |FROM documents ORDER BY q""".stripMargin,

    "q_outer_join" ->
      """WITH totals AS (
        |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |         round(SUM(o_totalprice), 2) AS revenue
        |  FROM orders WHERE o_custkey <= 60 GROUP BY o_custkey),
        |custs AS (
        |  SELECT c_custkey, c_name FROM customer
        |  WHERE c_custkey BETWEEN 30 AND 90)
        |SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_name, n_orders, revenue
        |FROM custs FULL OUTER JOIN totals ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,

    "q_trending" ->
      """WITH c AS (
        |  SELECT strftime(to_timestamp(CAST(floor(epoch(ts) / 21600) AS BIGINT)
        |                               * 21600), '%Y-%m-%d %H:%M:%S') AS w,
        |         event_type, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT w, event_type, n,
        |         row_number() OVER (PARTITION BY w ORDER BY n DESC, event_type)
        |           AS rk
        |  FROM c)
        |SELECT w, CAST(rk AS INT) AS rk, event_type, n
        |FROM r WHERE rk <= 2 ORDER BY w, rk""".stripMargin,

    "q_media_dedup" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    array_to_string((CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(text), '\s+') END)[1:3], ' ') AS bin
        |  FROM documents)
        |SELECT MIN(doc_id) AS keeper, COUNT(*) AS n,
        |       CAST(SUM(strlen(bin)) AS BIGINT) AS bytes
        |FROM p GROUP BY md5(bin) HAVING COUNT(*) >= 2
        |ORDER BY keeper""".stripMargin,

    "q_sample_exact" ->
      """SELECT doc_id, ('0x'||substr(md5('s1:' || doc_id::VARCHAR), 1, 15))::BIGINT AS h
        |FROM documents ORDER BY h, doc_id LIMIT 50""".stripMargin,

    "q_chunk_sliding" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(0,
        |      CASE WHEN len(toks) <= 20 THEN 0
        |           ELSE CAST(ceil((len(toks) - 20) / 10.0) AS INT) END)) AS chunk_idx
        |  FROM t WHERE len(toks) > 0)
        |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
        |       array_to_string(toks[chunk_idx*10+1 : chunk_idx*10+20], ' ') AS chunk
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_sql_kernels" ->
      """WITH t AS (SELECT doc_id, text FROM documents WHERE trim(text) <> ''),
        |chars AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM t),
        |cnt AS (SELECT doc_id, ch, COUNT(*) AS k FROM chars GROUP BY doc_id, ch),
        |tot AS (SELECT doc_id, SUM(k) AS n FROM cnt GROUP BY doc_id),
        |terms AS (
        |  SELECT c.doc_id,
        |    CAST(ROUND((c.k::DOUBLE / t2.n::DOUBLE) * LN(t2.n::DOUBLE / c.k::DOUBLE)
        |               * 1000000, 0) AS BIGINT) AS m
        |  FROM cnt c JOIN tot t2 USING (doc_id)),
        |h AS (SELECT doc_id, SUM(m) AS micro FROM terms GROUP BY doc_id),
        |tk AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tk
        |       FROM t),
        |mr AS (SELECT doc_id, MAX(c)::INT AS max_rep FROM
        |         (SELECT doc_id, tk, COUNT(*) AS c FROM tk GROUP BY doc_id, tk)
        |       GROUP BY doc_id)
        |SELECT t.doc_id, h.micro::DOUBLE / 1000000.0 AS entropy, mr.max_rep
        |FROM t JOIN h USING (doc_id) JOIN mr ON t.doc_id = mr.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    // Min-span as relational algebra: for every candidate end position
    // (any term occurrence), the latest occurrence of each term at or
    // before it; windows where all 3 terms have one; min(end − start
    // + 1). The optimal window always ends at a term occurrence.
    "q_min_span" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |tk AS (
        |  SELECT doc_id, unnest(toks) AS tk,
        |         unnest(generate_series(1, len(toks))) AS p
        |  FROM base),
        |pos AS (SELECT doc_id, tk AS term, p FROM tk
        |        WHERE tk IN ('vector', 'join', 'scan')),
        |lastp AS (
        |  SELECT e.doc_id, e.p AS pe, p2.term, MAX(p2.p) AS lp
        |  FROM pos e JOIN pos p2 ON p2.doc_id = e.doc_id AND p2.p <= e.p
        |  GROUP BY e.doc_id, e.p, p2.term),
        |ok AS (
        |  SELECT doc_id, pe, MIN(lp) AS start
        |  FROM lastp GROUP BY doc_id, pe HAVING COUNT(DISTINCT term) = 3)
        |SELECT doc_id, CAST(MIN(pe - start + 1) AS BIGINT) AS minspan
        |FROM ok GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_postings" ->
      """WITH tk AS (
        |  SELECT DISTINCT doc_id, unnest(
        |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END) AS term
        |  FROM documents),
        |p AS (
        |  SELECT term, COUNT(*)::BIGINT AS df,
        |         array_to_string(list_sort(list(doc_id))[1:10], ',') AS head10
        |  FROM tk GROUP BY term)
        |SELECT term, df, head10 FROM p
        |ORDER BY df DESC, term LIMIT 10""".stripMargin,

    "q_word_subsample" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |tk AS (
        |  SELECT doc_id, unnest(toks) AS tk,
        |         unnest(generate_series(1, len(toks))) AS pos
        |  FROM base),
        |freq AS (SELECT tk, COUNT(*)::BIGINT AS f FROM tk GROUP BY tk),
        |tot AS (SELECT 0.001 * SUM(f)::DOUBLE AS tt FROM freq),
        |rates AS (
        |  SELECT tk,
        |    CAST(ROUND(LEAST((SQRT(f::DOUBLE / tt) + 1) * tt / f::DOUBLE, 1.0)
        |               * 1000000, 0) AS BIGINT) AS rm
        |  FROM freq, tot),
        |kept AS (
        |  SELECT t.doc_id, COUNT(*) AS no,
        |    COUNT(*) FILTER (WHERE
        |      ('0x'||substr(md5(t.tk || ':' || t.doc_id || ':' || t.pos), 1, 15))::BIGINT
        |        % 1000000 < r.rm) AS nk
        |  FROM tk t JOIN rates r USING (tk) GROUP BY t.doc_id)
        |SELECT d.doc_id, COALESCE(k.no, 0)::BIGINT AS n_orig,
        |       COALESCE(k.nk, 0)::BIGINT AS n_kept
        |FROM documents d LEFT JOIN kept k USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "q_quality_gate" ->
      """WITH x AS (
        |  SELECT doc_id, source,
        |         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |              ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |y AS (
        |  SELECT doc_id, source, len(toks)::DOUBLE AS nt,
        |         len(list_filter(toks, t -> list_contains(
        |           ['the','a','of','and','to','in','is'], t)))::DOUBLE AS stop_hits
        |  FROM x),
        |sc AS (
        |  SELECT doc_id, source,
        |         ROUND(LEAST(nt/100.0, 1.0) * (0.7 + 0.3 * stop_hits / GREATEST(nt, 1.0)), 4) AS q
        |  FROM y),
        |pr AS (
        |  SELECT doc_id, source, q,
        |         PERCENT_RANK() OVER (PARTITION BY source ORDER BY q, doc_id) AS pr
        |  FROM sc)
        |SELECT doc_id, source, q FROM pr WHERE pr >= 0.9
        |ORDER BY source, doc_id""".stripMargin,

    // Power iteration replicated in SQL: ex zips (pos, x) by parallel
    // unnest; per iteration, y = per-vector micro-dot with v, u = per-
    // pos micro-sum of y·x, v = ROUND(u / max|u|, 6).
    "q_pca_top" ->
      s"""$pcaCtesSql
         |SELECT CAST(pos AS INT) AS pos, v FROM v3 ORDER BY pos""".stripMargin,

    // ABTT in SQL on top of the shared power-iteration CTEs: exact
    // micro-unit v̂, micro-dot projection, per-element correction.
    "q_abtt" ->
      s"""$pcaCtesSql,
         |vm AS (SELECT pos, CAST(ROUND(v * 1000000, 0) AS BIGINT) AS vm FROM v3),
         |n2 AS (SELECT SUM(vm * vm)::DOUBLE AS n2 FROM vm),
         |vh AS MATERIALIZED (SELECT pos, vm::DOUBLE / SQRT(n2) AS vh FROM vm, n2),
         |pr AS (
         |  SELECT e.vec_id, SUM(CAST(ROUND(e.x * v.vh * 1000000, 0) AS BIGINT)) AS pm
         |  FROM ex e JOIN vh v USING (pos) GROUP BY e.vec_id),
         |c AS (
         |  SELECT e.vec_id, e.pos,
         |         ROUND(e.x - (p.pm::DOUBLE / 1000000.0) * v.vh, 6) + 0.0 AS c
         |  FROM ex e JOIN pr p USING (vec_id) JOIN vh v USING (pos)
         |  WHERE e.pos <= 3)
         |SELECT vec_id,
         |  MAX(CASE WHEN pos = 1 THEN c END) AS c0,
         |  MAX(CASE WHEN pos = 2 THEN c END) AS c1,
         |  MAX(CASE WHEN pos = 3 THEN c END) AS c2
         |FROM c GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    // BPE training replicated in SQL: per merge step k, a pair-count +
    // argmax CTE, then a recursive find-first-and-merge re-segmentation
    // (≡ left-to-right non-overlapping: a merged token "ab" can never
    // recreate an (a,b) pair to its left). MATERIALIZED stops the
    // exponential CTE re-inlining of the chained references.
    "q_bpe_train" -> {
      def pairStep(k: Int): String =
        s"""pairs$k AS (
           |  SELECT p.pair, SUM(s.cnt) AS pcnt
           |  FROM seg${k - 1} s,
           |    (SELECT unnest(list_transform(generate_series(1, len(s.toks)-1), i ->
           |        s.toks[i] || '|' || s.toks[i+1])) AS pair) p
           |  GROUP BY p.pair),
           |m$k AS MATERIALIZED (
           |  SELECT string_split(pair, '|')[1] AS l, string_split(pair, '|')[2] AS r,
           |         pcnt::BIGINT AS cnt, $k AS step
           |  FROM pairs$k ORDER BY pcnt DESC, pair LIMIT 1)""".stripMargin
      def segStep(k: Int): String =
        s"""app$k(word, cnt, toks, it) AS (
           |  SELECT word, cnt, toks, 0 AS it FROM seg${k - 1}
           |  UNION ALL
           |  SELECT word, cnt,
           |         toks[1:idx-1] || [toks[idx] || toks[idx+1]] || toks[idx+2:], it + 1
           |  FROM (
           |    SELECT a.word, a.cnt, a.toks, a.it,
           |           list_position(list_transform(generate_series(1, len(a.toks)-1), i ->
           |             CASE WHEN a.toks[i] = m.l AND a.toks[i+1] = m.r
           |                  THEN 1 ELSE 0 END), 1) AS idx
           |    FROM app$k a CROSS JOIN m$k m)
           |  WHERE idx IS NOT NULL AND idx > 0),
           |seg$k AS MATERIALIZED (
           |  SELECT word, cnt, max_by(toks, it) AS toks FROM app$k
           |  GROUP BY word, cnt)""".stripMargin
      val parts = (1 to 5).flatMap(k =>
        Seq(pairStep(k)) ++ (if (k < 5) Seq(segStep(k)) else Nil))
      val unions = (2 to 5).map(k => s"UNION ALL SELECT * FROM m$k").mkString(" ")
      s"""WITH RECURSIVE
         |words AS (
         |  SELECT w AS word, COUNT(*)::BIGINT AS cnt FROM (
         |    SELECT regexp_replace(unnest(
         |        CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
         |             ELSE string_split_regex(trim(lower(text)), '\\s+') END),
         |      '[^a-z]', '', 'g') AS w
         |    FROM documents) WHERE w <> '' GROUP BY w),
         |seg0 AS MATERIALIZED (
         |  SELECT word, cnt,
         |    list_transform(generate_series(1, length(word)), i -> substr(word, i, 1))
         |      AS toks
         |  FROM words),
         |${parts.mkString(",\n")}
         |SELECT step, l, r, cnt
         |FROM (SELECT * FROM m1 $unions) ORDER BY step""".stripMargin
    },

    // The whole int8 MLP forward pass in SQL: md5-derived weights and
    // token vectors, integer pool/GEMM/ReLU/requant, float only at the
    // final normalize — QuantizedMlpEmbedder's arithmetic, step for
    // step. Integer division differences matter: Java / truncates
    // toward zero (TRUNC), >> 6 on a non-negative value floors (// 64).
    "q_mlp_embed" ->
      """WITH idx1 AS (SELECT unnest(generate_series(0, 1535)) AS i),
        |w1 AS (SELECT i // 32 AS o, i % 32 AS j,
        |         ('0x'||substr(md5('11:w1:'||i), 1, 15))::BIGINT % 255 - 127 AS v
        |       FROM idx1),
        |w2 AS (SELECT i // 48 AS o, i % 48 AS j,
        |         ('0x'||substr(md5('11:w2:'||i), 1, 15))::BIGINT % 255 - 127 AS v
        |       FROM idx1),
        |toks AS (
        |  SELECT doc_id, unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |                        ELSE string_split_regex(trim(text), '\s+') END) AS tk
        |  FROM documents),
        |jj AS (SELECT unnest(generate_series(0, 31)) AS j),
        |tv AS (
        |  SELECT doc_id, j, CASE WHEN b > 127 THEN b - 256 ELSE b END AS v
        |  FROM (SELECT t0.doc_id, jj.j,
        |          ('0x'||substr(md5('11:e' || (jj.j // 16) || ':' || t0.tk),
        |                        (jj.j % 16) * 2 + 1, 2))::INT AS b
        |        FROM toks t0 CROSS JOIN jj)),
        |ntok AS (SELECT doc_id, COUNT(*) AS nt FROM toks GROUP BY doc_id),
        |pool AS (
        |  SELECT tv.doc_id, tv.j,
        |    CAST(TRUNC(SUM(tv.v)::DOUBLE / MAX(n.nt)) AS BIGINT) AS p
        |  FROM tv JOIN ntok n USING (doc_id) GROUP BY tv.doc_id, tv.j),
        |l1 AS (
        |  SELECT p.doc_id, w.o, SUM(w.v * p.p) AS s
        |  FROM pool p JOIN w1 w ON w.j = p.j GROUP BY p.doc_id, w.o),
        |h AS (
        |  SELECT doc_id, o,
        |    LEAST(CASE WHEN s > 0 THEN s // 64 ELSE 0 END, 127) AS hv
        |  FROM l1),
        |l2 AS (
        |  SELECT h.doc_id, w.o, SUM(w.v * h.hv) AS a
        |  FROM h JOIN w2 w ON w.j = h.o GROUP BY h.doc_id, w.o),
        |nrm AS (SELECT doc_id, GREATEST(SQRT(SUM(a::DOUBLE * a::DOUBLE)), 1e-12) AS n
        |        FROM l2 GROUP BY doc_id),
        |px AS (
        |  SELECT d.doc_id,
        |    COALESCE(MAX(CASE WHEN l2.o = 0 THEN l2.a END), 0)::DOUBLE AS a0,
        |    COALESCE(MAX(CASE WHEN l2.o = 1 THEN l2.a END), 0)::DOUBLE AS a1,
        |    COALESCE(MAX(CASE WHEN l2.o = 2 THEN l2.a END), 0)::DOUBLE AS a2,
        |    COALESCE(MAX(n.n), 1e-12) AS n
        |  FROM documents d
        |  LEFT JOIN l2 ON d.doc_id = l2.doc_id
        |  LEFT JOIN nrm n ON d.doc_id = n.doc_id
        |  GROUP BY d.doc_id)
        |SELECT doc_id,
        |  ROUND(CAST(a0 / n AS FLOAT)::DOUBLE, 6) AS e0,
        |  ROUND(CAST(a1 / n AS FLOAT)::DOUBLE, 6) AS e1,
        |  ROUND(CAST(a2 / n AS FLOAT)::DOUBLE, 6) AS e2
        |FROM px ORDER BY doc_id""".stripMargin,

    "q_train_shard" ->
      """WITH h AS (
        |  SELECT doc_id,
        |         ('0x'||substr(md5('1:' || doc_id::VARCHAR), 1, 15))::BIGINT AS hv,
        |         ('0x'||substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS hk
        |  FROM documents)
        |SELECT hv % 8 AS shard,
        |       CAST(row_number() OVER (PARTITION BY hv % 8
        |                               ORDER BY hv, hk) AS BIGINT) AS seq,
        |       doc_id
        |FROM h ORDER BY shard, seq""".stripMargin,

    "q_range_search" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |pairs AS (
        |  SELECT e.vec_id,
        |         unnest(e.embedding)::DOUBLE AS x, unnest(q.qe)::DOUBLE AS y
        |  FROM embeddings e CROSS JOIN q),
        |agg AS (
        |  SELECT vec_id, SUM(x*y) AS dp, SUM(x*x) AS nx2, SUM(y*y) AS ny2
        |  FROM pairs GROUP BY vec_id),
        |sc AS (
        |  SELECT vec_id,
        |         ROUND(dp / (GREATEST(SQRT(nx2), 1e-12) * GREATEST(SQRT(ny2), 1e-12)), 6)
        |           + 0.0 AS score
        |  FROM agg)
        |SELECT vec_id, score FROM sc WHERE score >= 0.2
        |ORDER BY score DESC, vec_id""".stripMargin,

    "q_char_entropy" ->
      """WITH chars AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
        |cnt AS (SELECT doc_id, ch, COUNT(*) AS k FROM chars GROUP BY doc_id, ch),
        |tot AS (SELECT doc_id, SUM(k) AS n FROM cnt GROUP BY doc_id),
        |terms AS (
        |  SELECT c.doc_id,
        |    CAST(ROUND((c.k::DOUBLE / t.n::DOUBLE) * LN(t.n::DOUBLE / c.k::DOUBLE)
        |               * 1000000, 0) AS BIGINT) AS m
        |  FROM cnt c JOIN tot t USING (doc_id)),
        |h AS (SELECT doc_id, SUM(m) AS micro FROM terms GROUP BY doc_id)
        |SELECT d.doc_id,
        |       COALESCE(h.micro, 0)::DOUBLE / 1000000.0 AS entropy
        |FROM documents d LEFT JOIN h USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "q_hard_negatives" ->
      """WITH qs AS (SELECT vec_id AS qid, embedding AS qe, label AS ql
        |            FROM embeddings WHERE vec_id % 50 = 0),
        |pairs AS (
        |  SELECT q.qid, e.vec_id,
        |         unnest(e.embedding)::DOUBLE AS x, unnest(q.qe)::DOUBLE AS y
        |  FROM embeddings e CROSS JOIN qs q
        |  WHERE e.label <> q.ql AND e.vec_id <> q.qid),
        |agg AS (
        |  SELECT qid, vec_id, SUM(x*y) AS dp, SUM(x*x) AS nx2, SUM(y*y) AS ny2
        |  FROM pairs GROUP BY qid, vec_id),
        |sc AS (
        |  SELECT qid, vec_id,
        |         ROUND(dp / (GREATEST(SQRT(nx2), 1e-12) * GREATEST(SQRT(ny2), 1e-12)), 6)
        |           + 0.0 AS score
        |  FROM agg),
        |rk AS (
        |  SELECT qid, vec_id, score,
        |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
        |  FROM sc)
        |SELECT qid, vec_id, score FROM rk WHERE rn <= 5
        |ORDER BY qid, score DESC, vec_id""".stripMargin,

    "q_mmr_rerank" -> {
      // cosine between two row-aliases' `embedding` lists, quantized
      // round-6 — the same value the Spark side's codegen dot +
      // normSafe + round produces
      def cos(a: String, b: String): String =
        s"""ROUND(list_sum(list_transform(generate_series(1,64), i ->
           |      $a.embedding[i]::DOUBLE * $b.embedding[i]::DOUBLE))
           |    / (GREATEST(SQRT(list_sum(list_transform(generate_series(1,64), i ->
           |         $a.embedding[i]::DOUBLE * $a.embedding[i]::DOUBLE))), 1e-12)
           |     * GREATEST(SQRT(list_sum(list_transform(generate_series(1,64), i ->
           |         $b.embedding[i]::DOUBLE * $b.embedding[i]::DOUBLE))), 1e-12)), 6)""".stripMargin
      // greedy steps 2..10 unrolled: each picks the argmax of
      // λ·rel − (1−λ)·max sim-to-selected over the not-yet-selected.
      // Pairwise sims are a separate CTE because DuckDB cannot
      // correlate an outer column inside a list_transform lambda.
      val steps = (2 to 10).map { r =>
        s"""s$r AS MATERIALIZED (SELECT c.vec_id,
           |  0.7 * c.rel - 0.3 * (SELECT MAX(s.sim) FROM sims s
           |     WHERE s.va = c.vec_id
           |       AND s.vb IN (SELECT vec_id FROM sel${r - 1}))
           |    AS mmr, $r AS rank
           |  FROM cands c WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${r - 1})
           |  ORDER BY mmr DESC, c.vec_id LIMIT 1),
           |sel$r AS MATERIALIZED (SELECT vec_id FROM sel${r - 1}
           |          UNION ALL SELECT vec_id FROM s$r)""".stripMargin
      }.mkString(",\n")
      val unions = (2 to 10).map(r => s"UNION ALL SELECT * FROM s$r")
        .mkString(" ")
      s"""WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 7),
         |cands AS MATERIALIZED (SELECT e.vec_id, ${cos("e", "q")} + 0.0 AS rel, e.embedding
         |          FROM embeddings e CROSS JOIN q
         |          ORDER BY rel DESC, e.vec_id LIMIT 50),
         |sims AS MATERIALIZED (SELECT a.vec_id AS va, b.vec_id AS vb, ${cos("a", "b")} AS sim
         |         FROM cands a JOIN cands b ON a.vec_id <> b.vec_id),
         |s1 AS MATERIALIZED (SELECT vec_id, rel AS mmr, 1 AS rank FROM cands
         |       ORDER BY rel DESC, vec_id LIMIT 1),
         |sel1 AS MATERIALIZED (SELECT vec_id FROM s1),
         |$steps
         |SELECT rank, vec_id, ROUND(mmr, 6) + 0.0 AS mmr
         |FROM (SELECT * FROM s1 $unions) ORDER BY rank""".stripMargin
    },

    "q_dsir_sample" ->
      """WITH base AS (
        |  SELECT doc_id, (source = 'src0') AS t,
        |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |tk AS (SELECT doc_id, t, unnest(toks) AS tok FROM base),
        |b AS (SELECT doc_id, t,
        |        ('0x'||substr(md5(tok),1,15))::BIGINT % 64 AS bkt FROM tk),
        |agg AS (SELECT bkt, COUNT(*) AS cr,
        |          SUM(CASE WHEN t THEN 1 ELSE 0 END) AS ct
        |        FROM b GROUP BY bkt),
        |tot AS (SELECT SUM(cr)::DOUBLE + 64 AS tr, SUM(ct)::DOUBLE + 64 AS tt
        |        FROM agg),
        |lr AS (SELECT bkt,
        |         CAST(ROUND(LN(((ct + 1)::DOUBLE / tt) /
        |                       ((cr + 1)::DOUBLE / tr)) * 1000000, 0) AS BIGINT)
        |           AS m
        |       FROM agg, tot),
        |w AS (SELECT b.doc_id, SUM(lr.m) AS micro
        |      FROM b JOIN lr USING (bkt) GROUP BY b.doc_id)
        |SELECT d.doc_id,
        |       ROUND(COALESCE(w.micro, 0)::DOUBLE / 1000000.0, 6) + 0.0 AS dsir_w
        |FROM documents d LEFT JOIN w ON d.doc_id = w.doc_id
        |ORDER BY dsir_w DESC, d.doc_id LIMIT 100""".stripMargin,

    "q_sql_agg" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |       ROUND(AVG(o_totalprice), 2) AS avg_price
        |FROM orders
        |WHERE year(o_orderdate) = 2000
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_range_join" ->
      """SELECT band_id, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS sum_price
        |FROM orders
        |JOIN (VALUES (0, 0.0, 50000.0), (1, 50000.0, 100000.0),
        |             (2, 100000.0, 200000.0), (3, 200000.0, 300000.0),
        |             (4, 300000.0, 1e18)) AS b(band_id, lo, hi)
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band_id ORDER BY band_id""".stripMargin,

    "q_salted_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_dedup_exact" ->
      """WITH fp AS (
        |  SELECT doc_id, source,
        |         md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |  FROM documents),
        |g AS (
        |  SELECT fp, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        |  FROM fp GROUP BY fp)
        |SELECT g.doc_id, g.n_copies, f.source
        |FROM g JOIN fp f ON g.doc_id = f.doc_id
        |ORDER BY g.doc_id""".stripMargin,

    "q_incremental_neardup" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(generate_series(1, len(toks)-1),
        |           i -> toks[i] || ' ' || toks[i+1])) AS sh
        |  FROM t WHERE len(toks) >= 2),
        |sig AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 15), i ->
        |           list_min(list_transform(sh, x ->
        |             ('0x'||substr(md5(i::VARCHAR||':'||x), 1, 15))::BIGINT))) AS sig
        |  FROM s WHERE len(sh) > 0),
        |bands AS (
        |  SELECT doc_id, band_idx,
        |         md5(array_to_string(sig[band_idx*4+1 : band_idx*4+4], ',')) AS bh
        |  FROM (SELECT doc_id, sig, unnest(generate_series(0, 3)) AS band_idx FROM sig)),
        |cand AS (
        |  SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
        |  FROM bands b JOIN bands c ON b.band_idx = c.band_idx AND b.bh = c.bh
        |  WHERE b.doc_id % 2 = 1 AND c.doc_id % 2 = 0),
        |est AS (
        |  SELECT batch_id, corpus_id,
        |    ROUND(len(list_filter(generate_series(1, 16),
        |          i -> x.sig[i] = y.sig[i]))::DOUBLE
        |        / len(x.sig)::DOUBLE, 6) + 0.0 AS est_jaccard
        |  FROM cand JOIN sig x ON batch_id = x.doc_id
        |            JOIN sig y ON corpus_id = y.doc_id)
        |SELECT batch_id, corpus_id, est_jaccard
        |FROM est WHERE est_jaccard >= 0.5
        |ORDER BY batch_id, corpus_id""".stripMargin,

    "q_incremental_dedup" ->
      """WITH corpus AS (
        |  SELECT DISTINCT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |  FROM documents WHERE doc_id % 2 = 0),
        |nb AS (
        |  SELECT doc_id, source, text FROM documents WHERE doc_id % 2 = 1
        |  UNION ALL
        |  SELECT doc_id + 100000, source, text FROM documents WHERE doc_id % 4 = 0),
        |f AS (
        |  SELECT doc_id, source,
        |         md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |  FROM nb),
        |g AS (
        |  SELECT fp, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        |  FROM f GROUP BY fp)
        |SELECT g.doc_id, g.n_copies, f.source
        |FROM g JOIN f ON g.doc_id = f.doc_id
        |WHERE g.fp NOT IN (SELECT fp FROM corpus)
        |ORDER BY g.doc_id""".stripMargin,

    "q_bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
        |    AS n_bpe,
        |  CAST(CASE WHEN trim(text) = '' THEN 0
        |       ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_ws
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_bpe_real" ->
      """WITH RECURSIVE
        |docs0 AS (
        |  SELECT doc_id, regexp_replace(lower(substr(text,1,24)), '[^a-z]', '', 'g') AS w
        |  FROM documents),
        |init AS (
        |  SELECT doc_id,
        |         CASE WHEN w = '' THEN CAST([] AS VARCHAR[])
        |              ELSE list_transform(generate_series(1, length(w)), i -> substr(w, i, 1)) END AS toks
        |  FROM docs0),
        |steps AS (
        |  SELECT doc_id, toks, 0 AS step FROM init
        |  UNION ALL
        |  SELECT doc_id,
        |         toks[1:idx-1] || [toks[idx] || toks[idx+1]] || toks[idx+2:] AS toks,
        |         step + 1
        |  FROM (
        |    SELECT doc_id, toks, step,
        |           list_position(ranks, list_min(ranks)) AS idx,
        |           list_min(ranks) AS rmin
        |    FROM (
        |      SELECT doc_id, toks, step,
        |             list_transform(generate_series(1, len(toks)-1), i ->
        |               coalesce(map(
        |                 ['t|h','th|e','i|n','a|n','an|d','e|r','o|n','r|e','a|t','e|n',
        |                  'o|r','e|s','s|t','a|r','o|u','i|t','i|s','h|e','t|o','o|f',
        |                  'in|g','e|d','c|o','co|m','l|e','m|e','d|e','s|e','u|n','th|is'],
        |                 [0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16,17,18,19,
        |                  20,21,22,23,24,25,26,27,28,29]
        |               )[toks[i] || '|' || toks[i+1]][1], 999999)) AS ranks
        |      FROM steps WHERE step < 30) r1) r2
        |  WHERE rmin IS NOT NULL AND rmin < 999999),
        |fin AS (SELECT doc_id, max_by(toks, step) AS toks FROM steps GROUP BY doc_id)
        |SELECT doc_id, array_to_string(toks, '|') AS bpe_str,
        |       CAST(len(toks) AS BIGINT) AS n_bpe
        |FROM fin ORDER BY doc_id""".stripMargin,

    "q_rolling_fp" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |              ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(toks, tk ->
        |        ('0x' || substr(md5(tk), 1, 8))::BIGINT)),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS rolling_fp
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_running_window" ->
      """SELECT event_id, user_id,
        |  ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                         ROWS UNBOUNDED PRECEDING), 4) AS run_sum,
        |  ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mov_avg
        |FROM events ORDER BY event_id""".stripMargin,

    "q_distinct_users" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_embed_centroid" ->
      """WITH x AS (
        |  SELECT label, unnest(embedding)::DOUBLE AS x,
        |         unnest(generate_series(1, len(embedding))) AS i
        |  FROM embeddings)
        |SELECT label, CAST(i - 1 AS INT) AS pos, ROUND(AVG(x), 6) AS mean_x
        |FROM x GROUP BY label, pos ORDER BY label, pos""".stripMargin,

    "q_hash_sample" ->
      """SELECT source, COUNT(*) AS n_sampled
        |FROM documents
        |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 10
        |GROUP BY source ORDER BY source""".stripMargin,

    "q_stratified_sample" ->
      """WITH k AS (
        |  SELECT source,
        |         CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 1000000 <
        |                   (CASE source WHEN 'src0' THEN 0.8 WHEN 'src1' THEN 0.5
        |                                WHEN 'src2' THEN 0.25 ELSE 0.1 END) * 1000000.0
        |              THEN 1 ELSE 0 END AS keep
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_total, CAST(SUM(keep) AS BIGINT) AS n_sampled
        |FROM k GROUP BY source ORDER BY source""".stripMargin,

    "q_scalar_subq" ->
      """SELECT o_orderpriority, COUNT(*) AS n_above
        |FROM orders o
        |WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders i
        |                      WHERE i.o_orderpriority = o.o_orderpriority)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_pivot" ->
      """SELECT user_id % 10 AS user_bucket,
        |  COUNT(*) FILTER (event_type = 'click') AS click,
        |  COUNT(*) FILTER (event_type = 'error') AS error,
        |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (event_type = 'search') AS search,
        |  COUNT(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_bucket ORDER BY user_bucket""".stripMargin,

    "q_edit_distance" ->
      """WITH d AS (
        |  SELECT doc_id, source, substr(text, 1, 40) AS pre FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(levenshtein(a.pre, b.pre) AS INT) AS dist
        |FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.pre, b.pre) <= 10
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q_session_window" ->
      """WITH x AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |                OR epoch(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
        |                   >= 1800.0
        |              THEN 1 ELSE 0 END AS ns
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, value,
        |         SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
        |                       ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM x)
        |SELECT user_id,
        |       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |       strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f')
        |         AS session_end,
        |       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
        |FROM s GROUP BY user_id, sess
        |ORDER BY user_id, session_start""".stripMargin,

    "q_batch_topk" ->
      """WITH qs AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
        |            WHERE vec_id < 5),
        |pairs AS (
        |  SELECT q.qid, e.vec_id,
        |         unnest(e.embedding)::DOUBLE AS x, unnest(q.qe)::DOUBLE AS y
        |  FROM embeddings e CROSS JOIN qs q),
        |agg AS (
        |  SELECT qid, vec_id, SUM(x*y) AS dp, SUM(x*x) AS nx2, SUM(y*y) AS ny2
        |  FROM pairs GROUP BY qid, vec_id),
        |sc AS (
        |  SELECT qid, vec_id,
        |         ROUND(dp / (GREATEST(SQRT(nx2), 1e-12) * GREATEST(SQRT(ny2), 1e-12)), 6)
        |           + 0.0 AS score
        |  FROM agg),
        |rk AS (
        |  SELECT qid, vec_id, score,
        |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
        |  FROM sc)
        |SELECT qid, vec_id, score FROM rk WHERE rn <= 3
        |ORDER BY qid, score DESC, vec_id""".stripMargin,

    "q_hash_embed" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |                        ELSE string_split_regex(trim(text), '\s+') END) AS tk
        |  FROM documents),
        |h AS (SELECT doc_id, ('0x' || substr(md5(tk), 1, 15))::BIGINT AS h FROM toks),
        |b AS (SELECT doc_id, h % 64 AS bucket,
        |             CASE WHEN (h // 64) % 2 = 0 THEN 1.0 ELSE -1.0 END AS sgn
        |      FROM h),
        |agg AS (SELECT doc_id, bucket, SUM(sgn) AS v FROM b GROUP BY doc_id, bucket),
        |nrm AS (SELECT doc_id, GREATEST(SQRT(SUM(v*v)), 1e-12) AS nrm
        |        FROM agg GROUP BY doc_id),
        |px AS (
        |  SELECT d.doc_id,
        |    COALESCE(MAX(CASE WHEN bucket = 0 THEN v END), 0.0) AS v0,
        |    COALESCE(MAX(CASE WHEN bucket = 1 THEN v END), 0.0) AS v1,
        |    COALESCE(MAX(CASE WHEN bucket = 2 THEN v END), 0.0) AS v2,
        |    COALESCE(MAX(n.nrm), 1e-12) AS nrm
        |  FROM documents d
        |  LEFT JOIN agg ON d.doc_id = agg.doc_id
        |  LEFT JOIN nrm n ON d.doc_id = n.doc_id
        |  GROUP BY d.doc_id)
        |SELECT doc_id,
        |  ROUND(CAST(v0 / nrm AS FLOAT)::DOUBLE, 6) AS e0,
        |  ROUND(CAST(v1 / nrm AS FLOAT)::DOUBLE, 6) AS e1,
        |  ROUND(CAST(v2 / nrm AS FLOAT)::DOUBLE, 6) AS e2
        |FROM px ORDER BY doc_id""".stripMargin,

    "q_sliding" ->
      """WITH x AS (
        |  SELECT value,
        |         to_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - off)
        |           AS win_start
        |  FROM events, unnest([0, 1800]) AS o(off))
        |SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
        |       COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin
  )

  // ===================================================== round-5 additions

  private def round5Queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Gopher page-quality rules (Rae et al. 2021 §A1.1): the published
    // first-pass crawl filter — word-count bounds, mean word length,
    // alphabetic-word fraction, symbol ratio, stopword presence — as one
    // per-row codegen'd struct; zero shuffle, scan speed. Ratios are
    // quantized BEFORE the bound checks (TextFunctions.gopherStats).
    "q_gopher_rules" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", T.gopherStats($"text").as("g"))
        .select($"doc_id", $"g.n_words", $"g.mean_wlen", $"g.alpha_frac",
          $"g.sym_ratio", $"g.stop_hits", $"g.keep")
        .orderBy($"doc_id")
    }),

    // Blocklist phrase telemetry (C4-style badword filtering, Raffel et
    // al. 2020 §2.2): ONE Aho-Corasick automaton pass per document
    // counts every occurrence of every phrase — #phrases LIKE predicates
    // collapse into a single map-side projection, and the automaton
    // rides the task closure like a broadcast. The per-phrase report's
    // exchange carries ≤ #phrases rows per partition after the map-side
    // combine (expressions/AhoCorasickExpression.scala scaladoc).
    "q_blocklist" -> ((s, dir) => {
      import s.implicits._
      val phrases =
        Seq("a a", "fast table", "scan scan", "slow query", "table table")
      spread(s, t(s, dir, "documents"))
        .select($"doc_id",
          graft.expressions.AhoCorasickExpression
            .multiPhraseCounts($"text", phrases).as("c"))
        .select(posexplode($"c").as(Seq("pi", "hits")))
        .groupBy($"pi")
        .agg(count(when($"hits" > 0L, 1)).as("docs_hit"),
          sum($"hits").as("total_hits"))
        .select(element_at(array(phrases.map(lit): _*), $"pi" + 1).as("phrase"),
          $"docs_hit", $"total_hits")
        .orderBy($"phrase")
    }),

    // Exact phrase search over positional postings: per-term scan-level
    // pruning, then (id, aligned-pos) joins — only the phrase terms'
    // occurrence lists ever move (Bm25.phraseHits scaladoc).
    "q_phrase_search" -> ((s, dir) => {
      import s.implicits._
      Bm25.phraseHits(t(s, dir, "documents"), "doc_id", "text",
          Seq("table", "hash"))
        .orderBy($"doc_id")
    }),

    // Weighted sampling without replacement (Efraimidis–Spiliotis A-ES,
    // exponential keys over md5-uniforms): exact, RNG-free, and plans as
    // one TakeOrderedAndProject — no corpus shuffle at any scale
    // (Sampling.weightedSample scaladoc).
    "q_weighted_sample" -> ((s, dir) => {
      import s.implicits._
      Sampling.weightedSample(
          t(s, dir, "documents").select($"doc_id", $"n_chars"),
          $"doc_id", $"n_chars", k = 100)
        .select($"doc_id", $"n_chars", $"es")
        .orderBy($"es".desc, $"doc_id")
    }),

    // CSV interchange round-trip (the other lingua franca next to JSONL):
    // written and read back under an explicit schema + header — no
    // inference job at 100 TB — byte-identical to the parquet source.
    // Parallel sink/source, one file per partition, no driver funnel.
    "q_csv_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val tmpDir = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_csv_rt_${Integer.toHexString(dir.hashCode)}_" +
          ProcessHandle.current().pid())
      val tmp = tmpDir.getAbsolutePath
      jsonlTmpCleanup(tmpDir)
      t(s, dir, "documents").select($"doc_id", $"source", $"text")
        .write.mode("overwrite").option("header", "true").csv(tmp)
      s.read.schema("doc_id LONG, source STRING, text STRING")
        .option("header", "true").csv(tmp)
        .select($"doc_id", $"source", $"text")
        .orderBy($"doc_id")
    }),

    // Containment (asymmetric) near-dup: |A∩B|/|A| ≈ 1 flags docs
    // ENGULFED in longer ones — the wire-story-in-portal-page shape
    // Jaccard (and therefore MinHash-LSH blocking) structurally misses;
    // candidates come from a df-capped rare-shingle inverted index
    // instead (Dedup.containmentDups scaladoc).
    "q_containment_dups" -> ((s, dir) => {
      import s.implicits._
      Dedup.containmentDups(spread(s, t(s, dir, "documents")),
          "doc_id", "text", shingleSize = 2, threshold = 0.8, maxDf = 64)
        .orderBy($"id_a", $"id_b")
    }),

    // Count-min sketch point frequencies — the fourth sketch family
    // (point queries beside Misra-Gries frequents, KLL quantiles, KMV
    // cardinality): d·w-bounded shuffle, md5-derived rows replicated
    // bit-exactly in the oracle; the w=16 fixture forces real bucket
    // collisions so the one-sided overcount property is exercised, not
    // just asserted (CountMin scaladoc).
    "q_cms_counts" -> ((s, dir) => {
      import s.implicits._
      CountMin.pointEstimates(spread(s, t(s, dir, "documents")), "text",
          Seq("table", "hash", "the", "spark", "zzzmissing"), d = 4, w = 16)
        .orderBy($"term")
    }),

    // N-gram novelty vs a reference snapshot (inverse decontamination):
    // high novelty = new content worth ingesting; near-zero novelty =
    // templated or memorization-candidate text. Broadcast ref hash set,
    // map-side probe, corpus text never shuffles (Dedup.noveltyScore).
    "q_novelty_score" -> ((s, dir) => {
      import s.implicits._
      val docs = spread(s, t(s, dir, "documents"))
      Dedup.noveltyScore(docs, docs.filter($"doc_id" < 250),
          "doc_id", "text", n = 3)
        .orderBy($"doc_id")
    }),

    // T5-style span corruption: contiguous spans cut from the input,
    // replaced by numbered sentinels, targets = sentinel + hidden
    // tokens. Deterministic look-back gating (no sequential scan, no
    // RNG) — gate bits materialize once per row as stage columns, zero
    // shuffle (TextFunctions.spanCorruptDf scaladoc).
    "q_span_corrupt" -> ((s, dir) => {
      import s.implicits._
      T.spanCorruptDf(t(s, dir, "documents").select($"doc_id", $"text"),
          "doc_id", "text", 10, "t5")
        .select($"doc_id", $"inputs", $"targets")
        .orderBy($"doc_id")
    }),

    // Cross-source overlap matrix — the dataset-card table quantifying
    // which SOURCES duplicate each other (mirror detection, licensing
    // audits): LSH near-dup pairs annotated with both sides' sources and
    // rolled up to per-(source, source) counts. Pair generation inherits
    // the capped-bucket LSH; the rollup output is bounded by #sources².
    "q_source_overlap" -> ((s, dir) => {
      import s.implicits._
      val docs = spread(s, t(s, dir, "documents"))
      val pairs = Dedup.nearDupPairs(docs, "doc_id", "text",
        shingleSize = 2, numHashes = 16, bands = 4, threshold = 0.2)
      val src = docs.select($"doc_id", $"source")
      pairs
        .join(src.select($"doc_id".as("id_a"), $"source".as("__sa")), Seq("id_a"))
        .join(src.select($"doc_id".as("id_b"), $"source".as("__sb")), Seq("id_b"))
        .select(least($"__sa", $"__sb").as("src_lo"),
          greatest($"__sa", $"__sb").as("src_hi"))
        .groupBy($"src_lo", $"src_hi").agg(count(lit(1)).as("n_pairs"))
        .orderBy($"src_lo", $"src_hi")
    }),

    // Quality-aware cluster dedup: connected near-dup clusters keep the
    // HIGHEST-QUALITY member, not the min-id one — real corpus builds
    // keep the best copy (canonical-by-id drops a clean original in
    // favor of a mangled mirror whenever the mirror's id sorts lower).
    // Composition of nearDupPairs → connectedComponents →
    // Dedup.keepBestPerCluster, whose per-cluster argmax is a map-side-
    // combinable max(struct) aggregate — NOT a row_number window, which
    // would sort-serialize the biggest cluster onto one reducer; quality
    // is quantized before ranking so the survivor choice is engine-stable.
    "q_dedup_keep_best" -> ((s, dir) => {
      import s.implicits._
      val docs = spread(s, t(s, dir, "documents"))
      val pairs = Dedup.nearDupPairs(docs, "doc_id", "text",
        shingleSize = 2, numHashes = 16, bands = 4, threshold = 0.2)
      val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
      val scored = docs.select($"doc_id",
        round(T.qualityScore($"text"), 4).as("q"))
      Dedup.keepBestPerCluster(scored, comp, "doc_id", "q")
        .join(comp.select($"node".as("doc_id"), $"comp"), Seq("doc_id"), "left")
        .select($"doc_id", coalesce($"comp", $"doc_id").as("cluster_id"), $"q")
        .orderBy($"doc_id")
    }),

    // Temperature-flattened mixture (XLM-R balancing): p_s ∝ n_s^α lifts
    // low-resource sources a proportional mixture starves; rates from
    // one bounded count agg (fixed summation order, quantized 6 dp),
    // applied as the same scan-speed md5 gate as q_stratified_sample
    // (Sampling.temperatureRates scaladoc).
    "q_temperature_mix" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val rates = Sampling.temperatureRates(docs, $"source",
        alpha = 0.5, targetSize = 300)
      val totals = docs.groupBy($"source").agg(count(lit(1)).as("n_total"))
      val samp = Sampling.stratifiedSample(docs, $"source", $"doc_id", rates, 0.0)
        .groupBy($"source").agg(count(lit(1)).as("n_sampled"))
      val rateCol = rates.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
        case (acc, (k, v)) => when($"source" === k, lit(v)).otherwise(acc)
      }
      totals.join(samp, Seq("source"), "left")
        .select($"source", $"n_total",
          coalesce($"n_sampled", lit(0L)).as("n_sampled"),
          rateCol.as("rate"))
        .orderBy($"source")
    }),

    // ANN recall evaluation — the accuracy harness every approximate
    // index needs beside its latency bench: batch IVF search at
    // nProbes=4 scored against the exact side (nProbes = all 16 cells)
    // through the distributed recallAtK join (no driver loop; evaluating
    // 10⁶ held-out queries against a 100 TB corpus stays a join problem).
    "q_recall_eval" -> ((s, dir) => {
      import s.implicits._
      val e = spread(s, t(s, dir, "embeddings"))
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val qs = e.filter($"vec_id" % 100 === 42)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      def run(p: Int) = Ann.searchBatchIvf(e, cents, "vec_id", "embedding",
        "cent_id", "cvec", qs, "qid", "qvec", nProbes = p, k = 10)
      Ann.recallAtK(run(16), run(4), "qid", "vec_id")
        .orderBy($"qid")
    }),

    // Robust scaling / outlier detection via median + MAD (the
    // breakdown-resistant alternative to mean/σ z-scores — one wild
    // point corrupts a mean, not a median): two bounded per-group aggs
    // broadcast back, outliers = |x − med| > 3·1.4826·MAD (the normal-
    // consistency constant). Same KLL-sketch swap as winsorize at 100 TB.
    "q_robust_scale" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val med = ev.groupBy($"event_type")
        .agg(round(expr("percentile(value, 0.5)"), 4).as("med"))
      val withMed = ev.join(broadcast(med), "event_type")
      val mad = withMed.groupBy($"event_type")
        .agg(round(expr("percentile(abs(value - med), 0.5)"), 4).as("mad"))
      withMed.join(broadcast(mad), "event_type")
        .groupBy($"event_type").agg(
          count(lit(1)).as("n"),
          max($"med").as("med"), max($"mad").as("mad"),
          count(when(abs($"value" - $"med") > lit(3.0) * lit(1.4826) * $"mad", 1))
            .as("n_outliers"))
        .orderBy($"event_type")
    }),

    // Winsorization — percentile-clipped robust feature prep: per-group
    // exact p05/p95 thresholds (one bounded agg, broadcast back) then a
    // scan-speed clip. At 100 TB the threshold pass swaps in the KLL
    // sketch (q_quantile_sketch) — the clip join is unchanged.
    "q_winsorize" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val pcts = ev.groupBy($"event_type").agg(
        round(expr("percentile(value, 0.05)"), 4).as("lo"),
        round(expr("percentile(value, 0.95)"), 4).as("hi"))
      ev.join(broadcast(pcts), "event_type")
        .withColumn("w", least(greatest($"value", $"lo"), $"hi"))
        .groupBy($"event_type").agg(
          count(when($"value" < $"lo", 1)).as("n_lo"),
          count(when($"value" > $"hi", 1)).as("n_hi"),
          round(sum($"w"), 2).as("sum_winsorized"))
        .orderBy($"event_type")
    }),

    // Sorted-neighborhood blocking — the third blocking family next to
    // LSH bands and SimHash buckets: one PARTITIONED sort (coarse key
    // prefix = block) + window·corpus comparisons, no self-join
    // (Dedup.sortedNeighborhoodPairs scaladoc).
    "q_sorted_neighborhood" -> ((s, dir) => {
      import s.implicits._
      Dedup.sortedNeighborhoodPairs(spread(s, t(s, dir, "documents")),
          "doc_id", "text")
        .orderBy($"id_a", $"id_b")
    }),

    // Margin-based neighbor mining (CCMatrix criterion): cosine
    // normalized by pooled local kNN density — integer ten-thousandth
    // cosines, exact BIGINT neighborhood sums, one rounded division
    // (Mining.marginPairs scaladoc).
    "q_margin_mining" -> ((s, dir) => {
      import s.implicits._
      Mining.marginPairs(spread(s, t(s, dir, "embeddings")),
          "vec_id", "embedding", k = 8, threshold = 1.05)
        .orderBy($"id_a", $"id_b")
    }),

    // Margin mining at corpus scale (Mining.marginPairsIvf): the
    // IVF-cell-bounded composition the marginPairs scaladoc names, as
    // real code — Ann.ivfAssign broadcast-argmax assignment, pair
    // generation as a CELL equi-join (n²/C candidates), within-cell kNN
    // density normalization. The oracle replays assignment + bounded
    // pairs + margin end to end, so the whole approximation contract is
    // hash-checked, not just described.
    "q_margin_ivf" -> ((s, dir) => {
      import s.implicits._
      val cents = t(s, dir, "embeddings").filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      Mining.marginPairsIvf(spread(s, t(s, dir, "embeddings")),
          "vec_id", "embedding", cents, "cent_id", "cvec",
          k = 8, threshold = 1.05)
        .orderBy($"id_a", $"id_b")
    }),

    // Fixed-iteration PageRank over the user→item interaction graph —
    // the link-structure quality prior crawl curation keys on. Integer
    // micro-unit ranks (engine-exact); per iteration one src-keyed edge
    // join + one map-side-combined inflow sum; dangling mass is a single
    // driver scalar (PageRank.ranks scaladoc). Items never appear as
    // sources → the dangling-redistribution path is genuinely exercised.
    "q_pagerank" -> ((s, dir) => {
      import s.implicits._
      val edges = t(s, dir, "events")
        .select($"user_id".as("src"),
          (lit(100000L) + pmod($"event_id", lit(50L))).as("dst"))
      PageRank.ranks(s, edges, "src", "dst", iters = 5)
        .orderBy($"node")
    }),

    // ORC round-trip: the columnar interchange sibling (Hive/Trino
    // estates) — typed columns survive bit-exact, no schema inference.
    "q_orc_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val tmpDir = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_orc_rt_${Integer.toHexString(dir.hashCode)}_" +
          ProcessHandle.current().pid())
      val tmp = tmpDir.getAbsolutePath
      jsonlTmpCleanup(tmpDir)
      t(s, dir, "documents").select($"doc_id", $"source", $"text", $"n_chars")
        .write.mode("overwrite").orc(tmp)
      s.read.schema("doc_id LONG, source STRING, text STRING, n_chars LONG")
        .orc(tmp)
        .select($"doc_id", $"source", $"text", $"n_chars")
        .orderBy($"doc_id")
    }),

    // Cross-source KMV SET OPERATIONS — dataset-level distinct-vocab
    // overlap (union / intersection / Jaccard cardinalities per source
    // pair) from per-source k-minimum-values sketches: sketch each
    // source once (state ≤ k longs per group partial), compare pairs on
    // ≤ k-long array merges — the corpus is scanned exactly once and
    // never pairwise. Exact below sketch capacity (the oracle regime,
    // is_exact = true); ~1/√(k−2) relative error beyond
    // (DistinctSketch.overlapMatrix scaladoc).
    "q_kmv_setops" -> ((s, dir) => {
      import s.implicits._
      val toks = t(s, dir, "documents")
        .select($"source", explode(T.tokens(lower($"text"))).as("tok"))
      val sk = DistinctSketch.sketchByKey(toks, $"source", $"tok", k = 8192)
      DistinctSketch.overlapMatrix(sk, 8192)
        .orderBy($"key_a", $"key_b")
    }),

    // PMI collocation mining (Church & Hanks 1990) — multi-word
    // expressions for tokenizer-vocab / stop-phrase decisions. Two
    // counting passes (unigrams, adjacent bigrams), both map-side
    // combined; the min-count filter lands BEFORE the unigram joins so
    // only the frequent tail is ever joined; totals broadcast back as a
    // 1-row aggregate (Collocations.pmiBigrams scaladoc).
    "q_pmi_collocations" -> ((s, dir) => {
      import s.implicits._
      Collocations.pmiBigrams(t(s, dir, "documents"), $"text",
        minCount = 5, topN = 30)
    }),

    // Deterministic train/val/test split manifest: hash-bucket routing
    // (80/10/10, integer-millionth thresholds) — a FUNCTION of the key,
    // so retries and future incremental batches route identically and
    // leakage can't creep in as the corpus grows. Scan-speed filter, no
    // shuffle beyond the bounded manifest agg (Sampling.threeWaySplit).
    "q_three_way_split" -> ((s, dir) => {
      import s.implicits._
      Sampling.threeWaySplit(t(s, dir, "documents"), $"doc_id", 0.8, 0.1)
        .groupBy($"source", $"split").agg(count(lit(1)).as("n"))
        .orderBy($"source", $"split")
    }),

    // Order-independent content digest — compare two 100 TB snapshots
    // by shipping one digest row per group instead of the data: count +
    // XOR + mod-2^60 sum of per-row content hashes, all commutative
    // map-side-combined reductions (Layout.contentDigest).
    "q_table_digest" -> ((s, dir) => {
      import s.implicits._
      Layout.contentDigest(t(s, dir, "documents"), $"source", $"text")
        .orderBy($"grp")
    }),

    // Runtime-filtered join — the manual twin of AQE's bloomFilter
    // rewrite: Bloom over the build side's distinct keys (10 bits/key),
    // probed map-side on the fact scan so only candidate rows enter the
    // exchange; no false negatives + the equi-join eliminates the ~0.8%
    // false positives, so the result IS the plain inner join (the
    // oracle) (RuntimeFilter.bloomJoin scaladoc).
    "q_runtime_filter_join" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
        .withColumnRenamed("l_orderkey", "orderkey")
      val ord = t(s, dir, "orders")
        .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 150000)
        .select($"o_orderkey".as("orderkey"), $"o_totalprice")
      RuntimeFilter.bloomJoin(li, ord, "orderkey")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(sum($"l_extendedprice"), 2).as("rev"))
        .orderBy($"l_returnflag")
    }),

    // Zipf rank-frequency fit — the one-row corpus health signal
    // (natural text ≈ −1 slope; template-heavy corpora kink or
    // flatten): integer micro-unit ln quantization, exact BIGINT OLS
    // sums, one TakeOrderedAndProject for the top-K — the corpus never
    // re-shuffles (Collocations.zipfFit scaladoc).
    "q_zipf_fit" -> ((s, dir) => {
      import s.implicits._
      Collocations.zipfFit(t(s, dir, "documents"), $"text", topK = 100)
    }),

    // Item-item co-occurrence projection of the user→item bipartite
    // graph — the graph-construction step PageRank/components/triangles
    // consume. Per-user pair blow-up capped DETERMINISTICALLY
    // (row_number over item order, oracle-replicable), shuffle carries
    // ids only (GraphOps.cooccurrenceEdges scaladoc).
    "q_cooccur_edges" -> ((s, dir) => {
      import s.implicits._
      val ui = t(s, dir, "events").select($"user_id".as("u"),
        (lit(100000L) + pmod($"event_id", lit(50L))).as("i"))
      GraphOps.cooccurrenceEdges(ui, $"u", $"i", minShared = 3)
        .orderBy($"ia", $"ib")
    }),

    // Exact triangle count by degree-ordered wedge closure (Suri &
    // Vassilvitskii 2011): orientation bounds every out-degree by
    // O(√m) — the celebrity hub contributes ZERO wedges — so the count
    // runs on power-law graphs where naive wedge enumeration explodes
    // (GraphOps.triangleCount scaladoc; star-hub bound spec-asserted).
    "q_triangle_count" -> ((s, dir) => {
      import s.implicits._
      val ui = t(s, dir, "events").select($"user_id".as("u"),
        (lit(100000L) + pmod($"event_id", lit(50L))).as("i"))
      val edges = GraphOps.cooccurrenceEdges(ui, $"u", $"i", minShared = 3)
        .select($"ia".as("a"), $"ib".as("b"))
      GraphOps.triangleCount(edges)
    }),

    // Length-bucketed batching manifest — the padded-inference sibling
    // of q_seq_pack's concat-and-chunk: docs route to the smallest
    // ladder bucket ≥ token count (integer CASE ladder, no float log2),
    // per-bucket padding-waste fraction justifies the ladder. One scan
    // + one bounded groupBy (Packing.lengthBuckets scaladoc).
    "q_length_buckets" -> ((s, dir) => {
      import s.implicits._
      Packing.lengthBuckets(
        t(s, dir, "documents")
          .select(size(T.tokens($"text")).cast("long").as("nt")),
        $"nt", ladder = Seq(16, 32, 64, 128, 256))
        .orderBy($"bucket")
    }),

    // k-anonymity audit — the release gate AFTER content-level PII
    // redaction (q_pii_redact): a rare (source, lang) combination
    // re-identifies a document's origin even with clean text (Sweeney
    // 2002). One bounded groupBy; the publishable-subset filter joins
    // the broadcast-sized group table back (Privacy scaladoc).
    "q_k_anonymity" -> ((s, dir) => {
      import s.implicits._
      Privacy.kAnonymityAudit(t(s, dir, "documents"),
          Seq($"source", $"lang"), k = 20)
        .orderBy($"source", $"lang")
    }),

    // Prefix → top-N completions (the typeahead artifact, corpus-side):
    // map-side-combined token counts, ranking window over the
    // VOCAB-sized table partitioned by prefix — bounded groups, never
    // the corpus (Collocations.prefixCompletions scaladoc).
    "q_autocomplete" -> ((s, dir) => {
      import s.implicits._
      Collocations.prefixCompletions(t(s, dir, "documents"), $"text",
          prefixLen = 2, topN = 3, minLen = 4)
        .orderBy($"prefix", $"rk")
    }),

    // Embedding drift between snapshots: per-label centroid cosine —
    // each snapshot reduces to labels × dim micro-unit integers (the
    // corpora never join row-to-row), exact BIGINT product sums, one
    // rounded division (Mining.embeddingDrift scaladoc). Even/odd
    // vec_id halves stand in for the two snapshots.
    "q_embed_drift" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      Mining.embeddingDrift(e.filter($"vec_id" % 2 === 0),
          e.filter($"vec_id" % 2 === 1), "label", "embedding")
        .orderBy($"label")
    }),

    // Tokenizer-vocab coverage: per-source OOV rate against the
    // corpus's top-500 terms — decides whether a vocab is big enough
    // for a source BEFORE training. Bounded vocab broadcast, one corpus
    // scan, one row per source (Collocations.oovRate scaladoc).
    "q_oov_rate" -> ((s, dir) => {
      import s.implicits._
      Collocations.oovRate(t(s, dir, "documents"), $"text", $"source",
          vocabSize = 500)
        .orderBy($"grp")
    }),

    // Flesch reading ease from three regex counts (words, sentence
    // punctuation runs, vowel groups) — integer cores + one rounded
    // formula, scan-speed per-row compute (TextFunctions.fleschScore).
    "q_readability" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", T.fleschScore($"text").as("f"))
        .select($"doc_id", $"f.n_words", $"f.n_sentences",
          $"f.n_syllables", $"f.flesch")
        .orderBy($"doc_id")
    }),

    // Near-dup threshold sweep: Jaccard histogram of ALL LSH candidates
    // + running pairs-kept-at-threshold — picks the dedup threshold
    // from data (the knee of a bimodal histogram), one signature pass,
    // 10 output rows at any corpus size (Dedup.nearDupThresholdSweep).
    // 8 bands × 2 rows: a BROAD net (collision prob at j=0.3 is ~1/2 vs
    // ~1/200 for 4×4), so the histogram actually shows the low-sim
    // noise floor the threshold must cut. Runs on a 40% HASH-SAMPLE:
    // a threshold is tuned on a sample and applied at scale — the
    // broad net's near-quadratic candidate cost stays bounded by the
    // sample, not the corpus (the same md5 gate as q_hash_sample, so
    // the oracle sees the identical subset).
    "q_neardup_sweep" -> ((s, dir) => {
      import s.implicits._
      val sampled = t(s, dir, "documents")
        .filter(pmod(Dedup.hash60($"doc_id".cast("string")), lit(100L)) < 40)
      Dedup.nearDupThresholdSweep(spread(s, sampled),
          "doc_id", "text", shingleSize = 2, numHashes = 16, bands = 8)
        .orderBy($"bucket")
    }),

    // Data-quality expectations (the Deequ-style suite): ALL row-local
    // checks fold into ONE map-side-combined scan (50 checks = one
    // pass); uniqueness is its own bounded groupBy. Output = one row
    // per check — the table a publish gates on (Validation scaladoc).
    "q_data_quality" -> ((s, dir) => {
      import s.implicits._
      Validation.validate(t(s, dir, "documents"), Seq(
          Validation.notNull("text"), Validation.nonEmpty("text"),
          Validation.inRange("n_chars", 0, 100000),
          Validation.matches("lang", "^[a-z]{2}$"),
          Validation.isIn("source", (0 until 15).map(i => s"src$i"))),
        uniqueKeys = Seq("doc_id"))
    }),

    // TF-IDF vector-space retrieval — the classic lexical baseline next
    // to q_bm25: smoothed idf, full-vector cosine norm, binary query.
    // Index-build shape: one corpus explode+tf shuffle, vocab-bounded
    // idf broadcast, one per-doc two-long reduction (Tfidf scaladoc).
    "q_tfidf_search" -> ((s, dir) => {
      import s.implicits._
      Tfidf.search(spread(s, t(s, dir, "documents")), "doc_id", "text",
          Seq("vector", "join", "scan"), 10)
        .select($"doc_id", $"score")
    }),

    // CCNet-style paragraph-level exact dedup: corpus-wide first
    // occurrence per paragraph fingerprint, survivors reassembled in
    // doc order, untouched docs byte-identical. Text crosses the wire
    // once; canonical pick is a min(struct) agg, never a window
    // (Dedup.paragraphDedup scaladoc).
    "q_paragraph_dedup" -> ((s, dir) => {
      import s.implicits._
      Dedup.paragraphDedup(spread(s, t(s, dir, "documents")),
          "doc_id", "text", paraTokens = 10)
        .orderBy($"doc_id")
    }),

    // Cluster-balanced subsampling (the SemDeDup/DoReMi curation move:
    // cap each embedding cluster so head clusters can't dominate the
    // training mix): IVF cell assignment (zero-shuffle per-row argmax),
    // then a deterministic md5-priority top-cap per cell via the
    // k-bounded two-phase aggregator — the exchange carries at most
    // cells × cap entries, never the corpus (TopK.topKPerKeyAgg).
    "q_cluster_balance" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val assigned = Ann.ivfAssign(e, cents, "vec_id", "embedding",
        "cent_id", "cvec")
      // 52-bit md5 priority: exact in double, so both engines rank
      // identically with no ulp edge
      val pri = assigned.select($"cell_id", $"vec_id",
        conv(substring(md5(concat(lit("cb:"), $"vec_id".cast("string"))), 1, 13),
          16, 10).cast("long").cast("double").as("__pri"))
      TopK.topKPerKeyAgg(pri, Seq($"cell_id"), $"__pri", $"vec_id", 20)
        .select($"cell_id", $"id".as("vec_id"))
        .orderBy($"cell_id", $"vec_id")
    }),

    // Per-doc top-3 keywords by tf-idf weight (topical tagging /
    // faceting): reuses the Tfidf.vectorize index projection; the
    // per-doc argmax is the k-bounded two-phase aggregator, so the
    // exchange carries ≤ docs × 3 entries past the tf shuffle.
    "q_tfidf_keywords" -> ((s, dir) => {
      import s.implicits._
      val v = Tfidf.vectorize(spread(s, t(s, dir, "documents")),
        "doc_id", "text")
      TopK.topKPerKeyAggStr(v, Seq($"doc_id"), $"wq".cast("double"),
          $"term", 3)
        .select($"doc_id", $"id".as("term"), $"score".cast("long").as("wq"))
        .orderBy($"doc_id", $"wq".desc, $"term")
    }),

    // Hash-consistent pseudonymization (release transform): same id →
    // same pseudonym (joins/sessions still work on published data),
    // reversal needs the unpublished salt. Pure per-row codegen — no
    // shuffle, no mapping table to leak (Privacy.pseudonymize).
    "q_pseudonymize" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select($"event_id",
          Privacy.pseudonymize($"user_id", "graft-release-1").as("user_pseud"),
          $"event_type")
        .orderBy($"event_id")
    }),

    // Cluster-purity eval vs ground-truth labels: per IVF cell, the
    // majority-label fraction (ties to smallest label). The corpus
    // collapses in one (cell, label) map-side-combined count; the
    // argmax runs over that bounded table (Mining.clusterPurity).
    "q_cluster_purity" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      Mining.clusterPurity(
          Ann.ivfAssign(e, cents, "vec_id", "embedding", "cent_id", "cvec"),
          "cell_id", "label")
        .orderBy($"cell_id")
    }),

    // Synchronous label-propagation communities on the user–item graph
    // (3 fixed rounds, majority ties to smallest label — fully
    // deterministic): the neighborhood-density grouping next to
    // connected components; per round one edge join + one bounded
    // (node, label) count + a min(struct) argmax (GraphOps scaladoc).
    "q_label_prop" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "events")
        .select($"user_id".as("src"),
          (lit(100000L) + $"event_id" % 50).as("dst"))
        .distinct()
      GraphOps.labelPropagation(e, "src", "dst", rounds = 3)
        .orderBy($"node")
    }),

    // Tokenizer fertility audit per source: BPE-ish tokens per word and
    // chars per token — the metric that decides whether a tokenizer
    // suits a source before training (high fertility = wasted context
    // budget). One map-side-combined groupBy over per-row regex counts;
    // ratios from exact integer sums, divided once.
    "q_token_fertility" -> ((s, dir) => {
      import s.implicits._
      spread(s, t(s, dir, "documents"))
        .select($"source",
          size(T.tokens($"text")).cast("long").as("nw"),
          T.bpeTokenCount($"text").cast("long").as("nb"),
          length($"text").cast("long").as("nc"))
        .groupBy($"source")
        .agg(sum($"nw").as("n_words"), sum($"nb").as("n_bpe"),
          sum($"nc").as("n_chars"))
        .select($"source", $"n_words", $"n_bpe", $"n_chars",
          (round($"n_bpe".cast("double") / $"n_words", 4) + lit(0.0))
            .as("fertility"),
          (round($"n_chars".cast("double") / $"n_bpe", 4) + lit(0.0))
            .as("chars_per_token"))
        .orderBy($"source")
    }),

    // TPC-H Q3 (shipping priority) on the fixture star schema: the
    // classic 3-way join + date filters + revenue top-k. Revenue
    // quantizes to cents per row BEFORE the sum (order-proof integer
    // reduction). Plan: both filters reach the parquet scans
    // (PushedFilters), the segment-pruned customer side broadcasts
    // under AQE at this SF, and the top-10 is TakeOrderedAndProject —
    // at 100 TB all three sides shuffle on their join keys and the
    // same plan holds with sort-merge joins.
    "q3_shipping" -> ((s, dir) => {
      import s.implicits._
      val cutoff = lit(java.sql.Timestamp.valueOf("1998-03-15 00:00:00"))
      val c = t(s, dir, "customer")
        .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      val o = t(s, dir, "orders").filter($"o_orderdate" < cutoff)
        .select($"o_orderkey", $"o_custkey", $"o_orderdate")
      val l = t(s, dir, "lineitem").filter($"l_shipdate" > cutoff)
        .select($"l_orderkey",
          round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
            .cast("long").as("rev_c"))
      val agg = l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(c, $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate")
        .agg((round(sum($"rev_c").cast("double") / 100, 2) + lit(0.0))
          .as("revenue"))
        .select($"l_orderkey", $"revenue",
          date_format($"o_orderdate", "yyyy-MM-dd").as("o_orderdate"))
      TopK.topK(agg, $"revenue", $"l_orderkey", 10)
    }),

    // Weighted score-fusion hybrid (the magnitude-aware sibling of
    // q_hybrid_rrf): both top-20 lists min-max-normalize over their
    // k-bounded candidates (one broadcast literal row each), then a
    // 0.5/0.5 convex blend with 0 for list-misses. Fixture convention:
    // embedding i ↔ document i.
    "q_hybrid_blend" -> ((s, dir) => {
      import s.implicits._
      val bm = Bm25.search(spread(s, t(s, dir, "documents")), "doc_id", "text",
        Seq("vector", "join", "scan"), 20)
      val bmN = Bm25.minMaxNorm(bm, "score", "ns")
        .select($"doc_id".as("id"), $"ns")
      val e = t(s, dir, "embeddings")
      val qv = e.filter($"vec_id" === 42).select($"embedding").head.getSeq[Float](0)
      val vec = TopK.topK(
        e.withColumn("score", score6(V.cosine($"embedding", typedLit(qv)))),
        $"score", $"vec_id", 20)
      val vecN = Bm25.minMaxNorm(vec, "score", "ns")
        .select($"vec_id".as("id"), $"ns")
      TopK.topK(Bm25.blendScores(bmN, vecN, "id", "ns", 0.5), $"blend", $"id", 10)
        .select($"id", $"blend")
    }),

    // Pseudo-relevance-feedback retrieval (Rocchio/RM3 family): BM25
    // pass 1 with the seed query, mine the top-10 hits' top-5 summed
    // tf-idf terms (seed excluded, ties term-asc — deterministic),
    // re-search with the expanded query. Only 5 expansion terms ever
    // reach the driver (Bm25.prfSearch scaladoc).
    "q_prf_expand" -> ((s, dir) => {
      import s.implicits._
      Bm25.prfSearch(spread(s, t(s, dir, "documents")), "doc_id", "text",
          Seq("vector", "join", "scan"), k = 10)
        .select($"doc_id", $"score")
    }),

    // Incremental paragraph dedup (recurring-crawl shape at paragraph
    // granularity): batch = docs ≥ 250 deduped within itself AND
    // against the < 250 corpus, whose side contributes only distinct
    // paragraph fingerprints (Dedup.incrementalParagraphDedup).
    "q_incremental_paradedup" -> ((s, dir) => {
      import s.implicits._
      val d = spread(s, t(s, dir, "documents"))
      Dedup.incrementalParagraphDedup(d.filter($"doc_id" >= 250),
          d.filter($"doc_id" < 250), "doc_id", "text", paraTokens = 10)
        .orderBy($"doc_id")
    }),

    // Rank-aware ANN quality: nDCG@10 + MRR of the 4-probe IVF ranking
    // against the exact top-10 (recall says WHETHER neighbors were
    // found; nDCG/MRR grade WHERE they landed). Micro-quantized log2
    // discounts → exact integer DCG sums (Ann.rankQualityAtK).
    "q_rank_quality" -> ((s, dir) => {
      import s.implicits._
      val e = spread(s, t(s, dir, "embeddings"))
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val qs = e.filter($"vec_id" % 100 === 42)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      def run(p: Int) = Ann.searchBatchIvf(e, cents, "vec_id", "embedding",
        "cent_id", "cvec", qs, "qid", "qvec", nProbes = p, k = 10)
      Ann.rankQualityAtK(run(16), run(4), "qid", "vec_id", 10)
        .orderBy($"qid")
    }),

    // Rank-biased overlap (Webber et al. 2010) between two rankers: the
    // full-dim cosine top-10 vs the MRL 16-dim-prefix top-10, per query
    // — "how much does dimension truncation perturb the RANKING", the
    // top-weighted list-similarity nDCG/recall can't express (they need
    // relevance labels; RBO compares two rankings directly). Truncated
    // RBO@10, p=0.9: (1-p)·Σ_d p^(d-1)·|A_1..d ∩ B_1..d|/d. Each term
    // ×10^10×2520 is an exact integer ((1-p)p^(d-1) = 9^(d-1)/10^d and
    // d | 2520), so the per-query sum is a BIGINT both engines compute
    // identically — no float pow anywhere. One broadcast-queries scan
    // scores both rankers; per-(query, ranker) top-10 is the k-bounded
    // two-phase TopKAggregator (the shuffle carries ≤ Q×2×10 hits, never
    // the N×Q scored rows); the RBO fold runs over two 10-arrays per row.
    "q_rbo_rankers" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val qdf = broadcast(e.filter($"vec_id".isin(RboQids: _*))
        .select($"vec_id".as("qid"), $"embedding".as("qvec")))
      val scored = spread(s, e).crossJoin(qdf)
        .select($"qid", $"vec_id", explode(map(
          lit("full"), score6(V.cosine($"embedding", $"qvec")),
          lit("mrl"), score6(V.cosine(slice($"embedding", 1, 16),
            slice($"qvec", 1, 16))))).as(Seq("ranker", "s")))
      val hits = TopK.topKPerKeyAgg(scored, Seq($"qid", $"ranker"), $"s",
        $"vec_id", 10)
      // (-score, id) asc == (score desc, id asc); scores are 6-decimal
      // quantized so negation is exact
      val arrs = hits.groupBy($"qid", $"ranker")
        .agg(transform(array_sort(collect_list(
          struct((-$"score").as("ns"), $"id"))), x => x("id")).as("arr"))
        .groupBy($"qid").pivot("ranker", Seq("full", "mrl"))
        .agg(first($"arr"))
      val wlit = typedLit(RboWeights)
      val scaled = aggregate(sequence(lit(1), lit(10)), lit(0L),
        (acc, d) => acc + element_at(wlit, d) *
          size(array_intersect(slice($"full", lit(1), d),
            slice($"mrl", lit(1), d))).cast("long"))
      arrs.select($"qid", scaled.as("rbo_scaled"),
          (round(scaled.cast("double") / RboDenom, 6) + lit(0.0)).as("rbo"))
        .orderBy($"qid")
    }),

    // Embedding-norm audit per label: the pre-index sanity check that
    // catches an unnormalized ingest batch BEFORE it corrupts a cosine
    // index (dot-product shortcuts assume unit norms). Norms are per-row
    // HOF folds (array order — deterministic); the mean comes from a
    // micro-quantized integer sum. One bounded groupBy.
    "q_norm_audit" -> ((s, dir) => {
      import s.implicits._
      val nrm = round(sqrt(aggregate($"embedding", lit(0.0d),
        (a, x) => a + x.cast("double") * x.cast("double"))), 6) + lit(0.0)
      t(s, dir, "embeddings")
        .select($"label".cast("long").as("label"), nrm.as("nrm"))
        .groupBy($"label")
        .agg(count(lit(1)).as("n"),
          (min($"nrm") + lit(0.0)).as("min_norm"),
          (max($"nrm") + lit(0.0)).as("max_norm"),
          (round(sum(round($"nrm" * 1000000).cast("long")).cast("double")
            / count(lit(1)) / 1000000.0, 6) + lit(0.0)).as("mean_norm"))
        .orderBy($"label")
    }),

    // TPC-H Q10 (returned-item reporting): which customers returned the
    // most revenue last quarter — 4-way join (lineitem⨝orders⨝customer⨝
    // nation), returnflag + date filters at the scans, cents-quantized
    // revenue, top-20. Same scale shape as q3_shipping with one more
    // broadcast dimension (nation).
    "q10_returns" -> ((s, dir) => {
      import s.implicits._
      val lo = lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))
      val hi = lit(java.sql.Timestamp.valueOf("1997-04-01 00:00:00"))
      val l = t(s, dir, "lineitem").filter($"l_returnflag" === "R")
        .select($"l_orderkey",
          round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
            .cast("long").as("rev_c"))
      val o = t(s, dir, "orders")
        .filter($"o_orderdate" >= lo && $"o_orderdate" < hi)
        .select($"o_orderkey", $"o_custkey")
      val agg = l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
        .agg((round(sum($"rev_c").cast("double") / 100, 2) + lit(0.0))
          .as("revenue"))
        .select($"c_custkey", $"c_name", $"revenue", $"c_acctbal", $"n_name")
      TopK.topK(agg, $"revenue", $"c_custkey", 20)
    }),

    // TPC-H Q4 (order-priority checking), adapted to the fixture schema:
    // the reference Q4's EXISTS(l_commitdate < l_receiptdate) becomes
    // EXISTS(l_returnflag = 'R') — commit/receipt dates aren't in the
    // fixture; the SHAPE is preserved exactly (quarter-filtered orders,
    // EXISTS semi-join to lineitem, priority counts). The semi-join
    // never duplicates orders with many flagged lines.
    "q4_priority" -> ((s, dir) => {
      import s.implicits._
      val lo = lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))
      val hi = lit(java.sql.Timestamp.valueOf("1997-04-01 00:00:00"))
      t(s, dir, "orders")
        .filter($"o_orderdate" >= lo && $"o_orderdate" < hi)
        .join(t(s, dir, "lineitem").filter($"l_returnflag" === "R"),
          $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy($"o_orderpriority")
    }),

    // TPC-H Q9 (product-type profit), adapted: no partsupp table in the
    // fixture, so profit = discounted revenue (the supplycost term
    // drops); the 4-way join shape (lineitem⨝part⨝supplier⨝nation) and
    // the (nation, year) rollup are Q9's. Part filter pushes to the
    // part scan; nation broadcasts; cents-quantized order-proof sum.
    "q9_profit" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter($"p_name".contains("red")),
          $"l_partkey" === $"p_partkey")
        .join(t(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(t(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
        .select($"n_name".as("nation"), year($"l_shipdate").as("o_year"),
          round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
            .cast("long").as("amt_c"))
        .groupBy($"nation", $"o_year")
        .agg((round(sum($"amt_c").cast("double") / 100, 2) + lit(0.0))
          .as("profit"))
        .orderBy($"nation", $"o_year".desc)
    }),

    // TPC-H Q11 (important stock identification), adapted: no partsupp,
    // so "value" = extended price by part BRAND; the defining Q11 shape
    // — a HAVING against a scalar fraction of the GLOBAL total —
    // survives as an exact integer comparison (brand_c · 25 > total_c
    // ⟺ share > 4%, no float threshold), with the 1-row total
    // broadcast, never a second fact scan per group.
    "q11_brand_value" -> ((s, dir) => {
      import s.implicits._
      val per = t(s, dir, "lineitem")
        .join(t(s, dir, "part"), $"l_partkey" === $"p_partkey")
        .select($"p_brand", round($"l_extendedprice" * 100).cast("long").as("v_c"))
        .groupBy($"p_brand").agg(sum($"v_c").as("brand_c"))
      val tot = per.agg(sum($"brand_c").as("total_c"))
      per.crossJoin(broadcast(tot))
        .filter($"brand_c" * 25 > $"total_c")
        .select($"p_brand",
          (round($"brand_c".cast("double") / 100, 2) + lit(0.0)).as("value"))
        .orderBy($"value".desc, $"p_brand")
    }),

    // TPC-H Q12 (shipping modes / priority), adapted: l_returnflag
    // stands in for the absent l_shipmode (same low-cardinality
    // line-level class), receipt-date window becomes a ship-date year —
    // the defining CASE-sum split of high- vs low-priority orders per
    // class is Q12's, map-side combined before the one bounded-key
    // shuffle.
    "q12_priority_class" -> ((s, dir) => {
      import s.implicits._
      val lo = lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))
      val hi = lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
      t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lo && $"l_shipdate" < hi)
        .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_returnflag")
        .agg(
          sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy($"l_returnflag")
    }),

    // TPC-H Q16 (parts/supplier relationship), adapted: lineitem IS the
    // part↔supplier link (no partsupp fixture), excluded-brand +
    // size-set filters push to the part scan, supplier_cnt is a
    // countDistinct over the joined link rows — Q16's
    // group-by-attributes / count-suppliers shape.
    "q16_parts" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .filter($"p_brand" =!= "Brand#2" && $"p_size".isin(1, 5, 9))
        .join(t(s, dir, "lineitem"), $"p_partkey" === $"l_partkey")
        .groupBy($"p_brand", $"p_type", $"p_size")
        .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
        .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
    }),

    // TPC-H Q2 (minimum-cost supplier), adapted: lineitem is the
    // part↔supplier link (no partsupp fixture); supply cost per (part,
    // supplier) = minimum observed line price in exact cents. The
    // defining Q2 shape — a CORRELATED MIN-SUBQUERY over the
    // region-scoped offers — planned Spark-first as one bounded
    // per-part min aggregate joined back (one pass over the offers, no
    // per-part re-scan, no window); region→nation broadcast into
    // supplier, supplier dim broadcast into the link. Top-100 output
    // order is total (s_name, p_partkey unique per row), so the limit
    // is engine-stable.
    "q2_min_cost_supp" -> ((s, dir) => {
      import s.implicits._
      val link = t(s, dir, "lineitem")
        .groupBy($"l_partkey", $"l_suppkey")
        .agg(min(round($"l_extendedprice" * 100).cast("long")).as("cost_c"))
      val sup = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region").filter($"r_name" === "EUROPE")),
            $"n_regionkey" === $"r_regionkey")),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"s_acctbal", $"s_name", $"n_name")
      val offers = link
        .join(t(s, dir, "part").filter($"p_type" === "SMALL"),
          $"l_partkey" === $"p_partkey")
        .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      val minCost = offers.groupBy($"p_partkey".as("__mk"))
        .agg(min($"cost_c").as("__min_c"))
      offers
        .join(minCost, $"p_partkey" === $"__mk" && $"cost_c" === $"__min_c")
        .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey", $"p_name",
          (round($"cost_c".cast("double") / 100, 2) + lit(0.0)).as("cost"))
        .orderBy($"s_acctbal".desc, $"s_name", $"p_partkey")
        .limit(100)
    }),

    // TPC-H Q20 (potential part promotion), adapted: the DOUBLE-NESTED
    // selection — suppliers IN (pairs over parts IN (name filter) with
    // a correlated quantity threshold) — with "availqty" := all-time
    // shipped quantity per (part, supplier) and the Q20 inequality
    // avail > 2 · qty_1997 (exact integer compare, no float 0.5). Both
    // IN-subqueries plan as semi-joins: the part filter broadcast-semi
    // into the link scan, the surviving pairs semi into the
    // region-filtered supplier dim.
    "q20_surplus_suppliers" -> ((s, dir) => {
      import s.implicits._
      val lo = lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))
      val hi = lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
      val pk = t(s, dir, "part").filter($"p_name".startsWith("small"))
        .select($"p_partkey")
      val qty = round($"l_quantity").cast("long")
      val pairs = t(s, dir, "lineitem")
        .join(broadcast(pk), $"l_partkey" === $"p_partkey", "left_semi")
        .groupBy($"l_partkey", $"l_suppkey")
        .agg(sum(qty).as("avail"),
          sum(when($"l_shipdate" >= lo && $"l_shipdate" < hi, qty)
            .otherwise(0L)).as("q97"))
        .filter($"q97" > 0 && $"avail" > $"q97" * 2)
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region").filter($"r_name" === "ASIA")),
            $"n_regionkey" === $"r_regionkey")),
          $"s_nationkey" === $"n_nationkey")
        .join(pairs.select($"l_suppkey"), $"s_suppkey" === $"l_suppkey",
          "left_semi")
        .select($"s_name", $"s_acctbal")
        .orderBy($"s_name")
    }),

    // TPC-H Q21 (suppliers who kept orders waiting), adapted: "late" =
    // shipped > 90 days after the order date (no receipt/commit dates
    // in the fixture). The classic multi-EXISTS/NOT-EXISTS shape —
    // another supplier in the order, no OTHER supplier late — is
    // re-expressed as ONE per-(order, supplier) aggregate + one
    // per-order rollup (n_suppliers, n_late_suppliers) joined back:
    // strictly fewer lineitem passes than the three correlated
    // self-joins (the oracle runs the literal EXISTS form, proving the
    // rewrite). Pair rows are materialized once for their two
    // consumers.
    "q21_waiting_suppliers" -> ((s, dir) => {
      import s.implicits._
      val pos = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").filter($"o_orderstatus" === "F")
            .select($"o_orderkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey", $"l_suppkey")
        .agg(max(when(
            $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"), 1L)
          .otherwise(0L)).as("late"))
        .localCheckpoint(false) // order rollup + final probe
      val orderStats = pos.groupBy($"l_orderkey".as("__ok"))
        .agg(count(lit(1)).as("n_supp"), sum($"late").as("n_late"))
      val sup = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region")
            .filter($"r_name" === "AMERICA")),
            $"n_regionkey" === $"r_regionkey")),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"s_name")
      pos.filter($"late" === 1L)
        .join(orderStats,
          $"l_orderkey" === $"__ok" && $"n_supp" > 1 && $"n_late" === 1L)
        .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"s_name")
        .limit(100)
    }),

    // kNN-graph construction: every vector's top-3 cosine neighbors
    // within its IVF cell (Ann.knnJoin) — the SemDeDup/kNN-clustering
    // primitive. Candidates are cell-bounded (n²/C, the point of the
    // partitioning); only n × k edges survive the k-bounded reduction.
    "q_knn_join" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      Ann.knnJoin(e, cents, "vec_id", "embedding", "cent_id", "cvec", 3)
        .orderBy($"src", $"score".desc, $"dst")
    }),

    // Per-source paragraph-duplication report: the number a curation
    // team reads to set mixture weights (a high-dup source is worth
    // less than its raw token count suggests). One bounded groupBy over
    // the paragraphDedup output joined back to source labels.
    "q_paragraph_stats" -> ((s, dir) => {
      import s.implicits._
      val d = spread(s, t(s, dir, "documents"))
      Dedup.paragraphDedup(d, "doc_id", "text", paraTokens = 10)
        .join(d.select($"doc_id", $"source"), Seq("doc_id"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_paras").as("n_paras"),
          sum($"n_paras" - $"n_kept").as("n_dropped"),
          (round(sum($"n_paras" - $"n_kept").cast("double") /
            greatest(sum($"n_paras"), lit(1L)), 4) + lit(0.0))
            .as("drop_rate"))
        .orderBy($"source")
    }),

    // Classifier TRAINING: 3 full-batch GD iterations of a
    // hard-sigmoid linear language classifier (label: lang = 'en';
    // features: bias, capped length, en/es stopword ratios) — the
    // train step the inference-only q_quality_classifier presumes.
    // Exp-free and micro-quantized, so the learned weights are
    // engine-exact (Classifier.trainHardSigmoid scaladoc).
    "q_classifier_train" -> ((s, dir) => {
      import s.implicits._
      val toks = T.tokens(lower($"text"))
      val nt = size(toks)
      val ntg = greatest(nt, lit(1)).cast("double")
      val feats = spread(s, t(s, dir, "documents")).select(
        lit(1000000L).as("xq0"),
        round(least(nt, lit(100)).cast("double") / lit(100.0) * lit(1000000.0))
          .cast("long").as("xq1"),
        round(T.stopwordHits(toks, T.EnStopwords).cast("double") / ntg
          * lit(1000000.0)).cast("long").as("xq2"),
        round(T.stopwordHits(toks, T.EsStopwords).cast("double") / ntg
          * lit(1000000.0)).cast("long").as("xq3"),
        when($"lang" === "en", lit(1.0)).otherwise(lit(0.0)).as("y"))
      val w = Classifier.trainHardSigmoid(feats,
        Seq("xq0", "xq1", "xq2", "xq3"), "y", iters = 3, lr = 2.0)
      w.zipWithIndex.map { case (wt, j) => (j.toLong, wt + 0.0) }
        .toDF("j", "weight").orderBy($"j")
    })
  )

  /** Oracle side of `PageRank.ranks` (5 iterations, d = 0.85,
    * S = 10⁹): the same rounded-micro-unit recurrence unrolled as CTEs —
    * per iteration the dangling scalar (dk/dsk), the per-edge rounded
    * contributions summed per dst (ik), and the damped update (rk).
    */
  private lazy val pagerankCtesSql: String = {
    def iter(k: Int): String = {
      val p = k - 1
      s"""d$k AS (
         |  SELECT COALESCE(SUM(r.r), 0)::BIGINT AS d
         |  FROM r$p r LEFT JOIN deg ON r.node = deg.node
         |  WHERE deg.node IS NULL),
         |ds$k AS (
         |  SELECT CAST(ROUND(d::DOUBLE / (SELECT n FROM nn), 0) AS BIGINT) AS ds
         |  FROM d$k),
         |i$k AS (
         |  SELECT e.dst AS node,
         |         SUM(CAST(ROUND(r.r::DOUBLE / deg.deg, 0) AS BIGINT))::BIGINT
         |           AS inflow
         |  FROM e JOIN r$p r ON e.src = r.node JOIN deg ON e.src = deg.node
         |  GROUP BY e.dst),
         |r$k AS (
         |  SELECT nd.node,
         |         ((SELECT b FROM base) +
         |          CAST(ROUND(0.85 * (COALESCE(i.inflow, 0) +
         |                             (SELECT ds FROM ds$k))::DOUBLE, 0)
         |               AS BIGINT)) AS r
         |  FROM nodes nd LEFT JOIN i$k i ON nd.node = i.node)""".stripMargin
    }
    s"""WITH e AS (
       |  SELECT DISTINCT user_id AS src, 100000 + event_id % 50 AS dst
       |  FROM events),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |nn AS (SELECT COUNT(*)::DOUBLE AS n FROM nodes),
       |base AS (
       |  SELECT CAST(ROUND((1.0 - 0.85) * 1000000000.0 / n, 0) AS BIGINT) AS b
       |  FROM nn),
       |deg AS (SELECT src AS node, COUNT(*)::BIGINT AS deg FROM e GROUP BY src),
       |r0 AS (
       |  SELECT node,
       |         (SELECT CAST(ROUND(1000000000.0 / n, 0) AS BIGINT) FROM nn) AS r
       |  FROM nodes),
       |${(1 to 5).map(iter).mkString(",\n")}
       |SELECT node, r AS r_micro FROM r5 ORDER BY node""".stripMargin
  }

  private def round5Oracles: Map[String, String] = Map(

    "q_pagerank" -> pagerankCtesSql,

    "q_containment_dups" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(generate_series(1, len(toks)-1),
        |           i -> toks[i] || ' ' || toks[i+1])) AS sh
        |  FROM t WHERE len(toks) >= 2),
        |g AS (
        |  SELECT doc_id, ('0x'||substr(md5(unnest(sh)), 1, 15))::BIGINT AS gh
        |  FROM s),
        |rare AS (
        |  SELECT gh FROM g GROUP BY gh
        |  HAVING COUNT(*) >= 2 AND COUNT(*) <= 64),
        |idx AS (SELECT g.doc_id, g.gh FROM g JOIN rare USING (gh)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id da, b.doc_id db
        |  FROM idx a JOIN idx b ON a.gh = b.gh AND a.doc_id < b.doc_id),
        |sc AS (
        |  SELECT da AS id_a, db AS id_b,
        |    ROUND(len(list_intersect(x.sh, y.sh))::DOUBLE / len(x.sh), 4)
        |      + 0.0 AS c_ab,
        |    ROUND(len(list_intersect(x.sh, y.sh))::DOUBLE / len(y.sh), 4)
        |      + 0.0 AS c_ba
        |  FROM cand JOIN s x ON da = x.doc_id JOIN s y ON db = y.doc_id)
        |SELECT id_a, id_b, c_ab, c_ba FROM sc
        |WHERE c_ab >= 0.8 OR c_ba >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    "q_cms_counts" ->
      """WITH tk AS (
        |  SELECT unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |                     ELSE string_split_regex(trim(lower(text)), '\s+') END)
        |    AS term
        |  FROM documents),
        |jb AS (
        |  SELECT j, ('0x'||substr(md5(j::VARCHAR||':'||term), 1, 15))::BIGINT % 16
        |           AS b
        |  FROM tk, unnest([0, 1, 2, 3]) AS u(j)),
        |cms AS (SELECT j, b, COUNT(*)::BIGINT AS c FROM jb GROUP BY j, b),
        |q AS (SELECT unnest(['table','hash','the','spark','zzzmissing']) AS term),
        |qb AS (
        |  SELECT term, j,
        |         ('0x'||substr(md5(j::VARCHAR||':'||term), 1, 15))::BIGINT % 16 AS b
        |  FROM q, unnest([0, 1, 2, 3]) AS u(j)),
        |est AS (
        |  SELECT term, MIN(COALESCE(c, 0))::BIGINT AS est
        |  FROM qb LEFT JOIN cms USING (j, b) GROUP BY term),
        |ex AS (
        |  SELECT term, COUNT(*)::BIGINT AS exact FROM tk
        |  WHERE term IN ('table','hash','the','spark','zzzmissing')
        |  GROUP BY term)
        |SELECT e.term, e.est, COALESCE(x.exact, 0)::BIGINT AS exact,
        |       (e.est - COALESCE(x.exact, 0))::BIGINT AS overcount
        |FROM est e LEFT JOIN ex x USING (term) ORDER BY term""".stripMargin,

    "q_novelty_score" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(generate_series(1, len(toks)-2),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gs
        |  FROM t WHERE len(toks) >= 3),
        |g AS (
        |  SELECT doc_id, ('0x'||substr(md5(unnest(gs)), 1, 15))::BIGINT AS gh
        |  FROM s),
        |ref AS (SELECT DISTINCT gh FROM g WHERE doc_id < 250),
        |kn AS (
        |  SELECT g.doc_id, COUNT(*)::BIGINT AS n_known
        |  FROM g JOIN ref USING (gh) GROUP BY g.doc_id)
        |SELECT s.doc_id, len(s.gs)::BIGINT AS n_grams,
        |       COALESCE(kn.n_known, 0)::BIGINT AS n_known,
        |       ROUND(1.0 - COALESCE(kn.n_known, 0)::DOUBLE / len(s.gs), 4)
        |         + 0.0 AS novelty
        |FROM s LEFT JOIN kn ON s.doc_id = kn.doc_id
        |ORDER BY s.doc_id""".stripMargin,

    "q_span_corrupt" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, toks, len(toks) AS n,
        |    list_transform(generate_series(1, len(toks)), p ->
        |      ('0x' || substr(md5(doc_id::VARCHAR || ':' || p::VARCHAR || ':t5'),
        |                      1, 15))::BIGINT % 100 < 10) AS gate
        |  FROM t),
        |s AS (
        |  SELECT doc_id, toks, n,
        |    list_transform(generate_series(1, n), p ->
        |      gate[p]
        |      AND NOT (CASE WHEN p >= 2 THEN gate[p-1] ELSE false END)
        |      AND NOT (CASE WHEN p >= 3 THEN gate[p-2] ELSE false END)) AS st
        |  FROM g),
        |x AS (
        |  SELECT doc_id,
        |    flatten(list_transform(generate_series(1, n), p ->
        |      CASE WHEN st[p] THEN
        |             ['<extra_id_' ||
        |              len(list_filter(generate_series(1, p-1), q -> st[q]))::VARCHAR
        |              || '>']
        |           WHEN (p >= 2 AND st[p-1]) OR (p >= 3 AND st[p-2])
        |             THEN CAST([] AS VARCHAR[])
        |           ELSE [toks[p]] END)) AS inp,
        |    flatten(list_transform(generate_series(1, n), p ->
        |      CASE WHEN st[p] THEN
        |             list_prepend(
        |               '<extra_id_' ||
        |               len(list_filter(generate_series(1, p-1), q -> st[q]))::VARCHAR
        |               || '>',
        |               toks[p : least(p+2, n)])
        |           ELSE CAST([] AS VARCHAR[]) END)) AS tgt
        |  FROM s)
        |SELECT doc_id, COALESCE(array_to_string(inp, ' '), '') AS inputs,
        |       COALESCE(array_to_string(tgt, ' '), '') AS targets
        |FROM x ORDER BY doc_id""".stripMargin,

    "q_source_overlap" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, source,
        |         list_distinct(list_transform(generate_series(1, len(toks)-1),
        |           i -> toks[i] || ' ' || toks[i+1])) AS sh
        |  FROM t WHERE len(toks) >= 2),
        |sig AS (
        |  SELECT doc_id, sh,
        |         list_transform(generate_series(0, 15), i ->
        |           list_min(list_transform(sh, x ->
        |             ('0x'||substr(md5(i::VARCHAR||':'||x), 1, 15))::BIGINT))) AS sig
        |  FROM s WHERE len(sh) > 0),
        |bands AS (
        |  SELECT doc_id, band_idx,
        |         md5(array_to_string(sig[band_idx*4+1 : band_idx*4+4], ',')) AS bh
        |  FROM (SELECT doc_id, sig, unnest(generate_series(0, 3)) AS band_idx FROM sig)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id da, b.doc_id db
        |  FROM bands a JOIN bands b
        |    ON a.band_idx = b.band_idx AND a.bh = b.bh AND a.doc_id < b.doc_id),
        |p AS (
        |  SELECT da, db FROM (
        |    SELECT da, db,
        |           len(list_intersect(x.sh, y.sh))::DOUBLE /
        |             (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) AS jac
        |    FROM cand JOIN s x ON da = x.doc_id JOIN s y ON db = y.doc_id)
        |  WHERE jac >= 0.2)
        |SELECT LEAST(xa.source, xb.source) AS src_lo,
        |       GREATEST(xa.source, xb.source) AS src_hi,
        |       COUNT(*)::BIGINT AS n_pairs
        |FROM p JOIN t xa ON p.da = xa.doc_id JOIN t xb ON p.db = xb.doc_id
        |GROUP BY src_lo, src_hi ORDER BY src_lo, src_hi""".stripMargin,

    "q_dedup_keep_best" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |                      ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(generate_series(1, len(toks)-1),
        |           i -> toks[i] || ' ' || toks[i+1])) AS sh
        |  FROM t WHERE len(toks) >= 2),
        |sig AS (
        |  SELECT doc_id, sh,
        |         list_transform(generate_series(0, 15), i ->
        |           list_min(list_transform(sh, x ->
        |             ('0x'||substr(md5(i::VARCHAR||':'||x), 1, 15))::BIGINT))) AS sig
        |  FROM s WHERE len(sh) > 0),
        |bands AS (
        |  SELECT doc_id, band_idx,
        |         md5(array_to_string(sig[band_idx*4+1 : band_idx*4+4], ',')) AS bh
        |  FROM (SELECT doc_id, sig, unnest(generate_series(0, 3)) AS band_idx FROM sig)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id da, b.doc_id db
        |  FROM bands a JOIN bands b
        |    ON a.band_idx = b.band_idx AND a.bh = b.bh AND a.doc_id < b.doc_id),
        |p AS (
        |  SELECT da, db FROM (
        |    SELECT da, db,
        |           len(list_intersect(x.sh, y.sh))::DOUBLE /
        |             (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) AS jac
        |    FROM cand JOIN s x ON da = x.doc_id JOIN s y ON db = y.doc_id)
        |  WHERE jac >= 0.2),
        |e AS (SELECT da AS a, db AS b FROM p UNION SELECT db, da FROM p),
        |r AS (
        |  SELECT a AS node, b AS reach FROM e
        |  UNION
        |  SELECT r.node, e.b FROM r JOIN e ON r.reach = e.a),
        |comp AS (
        |  SELECT node AS doc_id, LEAST(node, MIN(reach)) AS cluster_id
        |  FROM r GROUP BY node),
        |q AS (
        |  SELECT doc_id,
        |    ROUND(LEAST(len(toks)::DOUBLE/100.0, 1.0) *
        |          (0.7 + 0.3 * len(list_filter(toks, t -> list_contains(
        |             ['the','a','of','and','to','in','is'], t)))::DOUBLE /
        |           GREATEST(len(toks)::DOUBLE, 1.0)), 4) AS q
        |  FROM t),
        |clustered AS (
        |  SELECT c.doc_id, c.cluster_id, q.q,
        |         ROW_NUMBER() OVER (PARTITION BY c.cluster_id
        |                            ORDER BY q.q DESC, c.doc_id) AS rn
        |  FROM comp c JOIN q ON c.doc_id = q.doc_id)
        |SELECT doc_id, cluster_id, q FROM clustered WHERE rn = 1
        |UNION ALL
        |SELECT q.doc_id, q.doc_id AS cluster_id, q.q
        |FROM q LEFT JOIN comp c ON q.doc_id = c.doc_id
        |WHERE c.doc_id IS NULL
        |ORDER BY doc_id""".stripMargin,

    "q_temperature_mix" ->
      """WITH c AS (
        |  SELECT source, COUNT(*)::BIGINT AS n FROM documents GROUP BY source),
        |sp AS (
        |  SELECT list_aggregate(list(pow(n::DOUBLE, 0.5) ORDER BY source), 'sum')
        |    AS s
        |  FROM c),
        |r AS (
        |  SELECT source, n,
        |    ROUND(LEAST(1.0, pow(n::DOUBLE, 0.5) / (SELECT s FROM sp) * 300 / n),
        |          6) AS rate
        |  FROM c),
        |k AS (
        |  SELECT d.source,
        |    (COUNT(*) FILTER (WHERE
        |      ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT % 1000000
        |        < r.rate * 1000000.0))::BIGINT AS n_sampled
        |  FROM documents d JOIN r USING (source) GROUP BY d.source)
        |SELECT r.source, r.n AS n_total,
        |       COALESCE(k.n_sampled, 0)::BIGINT AS n_sampled, r.rate
        |FROM r LEFT JOIN k ON r.source = k.source
        |ORDER BY r.source""".stripMargin,

    "q_recall_eval" ->
      """WITH cents AS (
        |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings
        |  WHERE vec_id < 16),
        |qs AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id % 100 = 42),
        |pc AS (
        |  SELECT e.vec_id, c.cent_id,
        |         unnest(e.embedding)::DOUBLE x, unnest(c.cvec)::DOUBLE y
        |  FROM embeddings e CROSS JOIN cents c),
        |pagg AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM pc GROUP BY vec_id, cent_id),
        |psc AS (SELECT vec_id, cent_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |        FROM pagg),
        |assign AS (
        |  SELECT vec_id, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
        |    FROM psc) WHERE rn = 1),
        |probes4 AS (
        |  SELECT vec_id AS qid, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
        |    FROM psc WHERE vec_id IN (SELECT qid FROM qs)) WHERE rn <= 4),
        |qp AS (
        |  SELECT q.qid, e.vec_id,
        |         unnest(e.embedding)::DOUBLE x, unnest(qe.embedding)::DOUBLE y
        |  FROM embeddings e
        |  CROSS JOIN qs q JOIN embeddings qe ON qe.vec_id = q.qid),
        |qagg AS (SELECT qid, vec_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM qp GROUP BY qid, vec_id),
        |qsc AS (SELECT qid, vec_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6)
        |            + 0.0 AS score
        |        FROM qagg),
        |exact AS (
        |  SELECT qid, vec_id FROM (
        |    SELECT qid, vec_id,
        |           row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) rn
        |    FROM qsc) WHERE rn <= 10),
        |approx AS (
        |  SELECT qid, vec_id FROM (
        |    SELECT s.qid, s.vec_id,
        |           row_number() OVER (PARTITION BY s.qid
        |                              ORDER BY s.score DESC, s.vec_id) rn
        |    FROM qsc s
        |    JOIN assign a ON s.vec_id = a.vec_id
        |    JOIN probes4 p ON p.qid = s.qid AND p.cell_id = a.cell_id)
        |  WHERE rn <= 10),
        |ne AS (SELECT qid, COUNT(*)::BIGINT AS n_exact FROM exact GROUP BY qid),
        |hit AS (SELECT e.qid, COUNT(*)::BIGINT AS n_hit
        |        FROM exact e JOIN approx x ON e.qid = x.qid AND e.vec_id = x.vec_id
        |        GROUP BY e.qid)
        |SELECT ne.qid, ne.n_exact, COALESCE(h.n_hit, 0)::BIGINT AS n_hit,
        |       ROUND(COALESCE(h.n_hit, 0)::DOUBLE / ne.n_exact, 6) + 0.0 AS recall
        |FROM ne LEFT JOIN hit h ON ne.qid = h.qid
        |ORDER BY ne.qid""".stripMargin,

    "q_robust_scale" ->
      """WITH m AS (
        |  SELECT event_type, ROUND(quantile_cont(value, 0.5), 4) AS med
        |  FROM events GROUP BY event_type),
        |d AS (
        |  SELECT e.event_type, e.value, m.med
        |  FROM events e JOIN m USING (event_type)),
        |md AS (
        |  SELECT event_type, ROUND(quantile_cont(abs(value - med), 0.5), 4) AS mad
        |  FROM d GROUP BY event_type)
        |SELECT d.event_type, COUNT(*)::BIGINT AS n,
        |       MAX(d.med) AS med, MAX(md.mad) AS mad,
        |       (COUNT(*) FILTER (
        |          WHERE abs(d.value - d.med) > 3.0 * 1.4826 * md.mad))::BIGINT
        |         AS n_outliers
        |FROM d JOIN md USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,

    "q_winsorize" ->
      """WITH p AS (
        |  SELECT event_type,
        |         ROUND(quantile_cont(value, 0.05), 4) AS lo,
        |         ROUND(quantile_cont(value, 0.95), 4) AS hi
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type,
        |  (COUNT(*) FILTER (WHERE e.value < p.lo))::BIGINT AS n_lo,
        |  (COUNT(*) FILTER (WHERE e.value > p.hi))::BIGINT AS n_hi,
        |  ROUND(SUM(LEAST(GREATEST(e.value, p.lo), p.hi)), 2) AS sum_winsorized
        |FROM events e JOIN p USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "q_sorted_neighborhood" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(text), '\s+') END AS toks,
        |    substr(lower(trim(text)), 1, 24) AS key
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, key, substr(key, 1, 8) AS blk,
        |    list_distinct(list_transform(generate_series(1, len(toks)-1),
        |      i -> toks[i] || ' ' || toks[i+1])) AS sh
        |  FROM t WHERE len(toks) >= 2),
        |w AS (
        |  SELECT doc_id, sh,
        |    LEAD(doc_id, 1) OVER win AS n1, LEAD(sh, 1) OVER win AS s1,
        |    LEAD(doc_id, 2) OVER win AS n2, LEAD(sh, 2) OVER win AS s2
        |  FROM s WINDOW win AS (PARTITION BY blk ORDER BY key, doc_id)),
        |p AS (
        |  SELECT doc_id AS id_a, n1 AS id_b, sh AS sha, s1 AS shb
        |  FROM w WHERE n1 IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, n2, sh, s2 FROM w WHERE n2 IS NOT NULL),
        |j AS (
        |  SELECT id_a, id_b,
        |    ROUND(len(list_intersect(sha, shb))::DOUBLE /
        |          (len(sha) + len(shb) - len(list_intersect(sha, shb))), 4)
        |      + 0.0 AS jaccard
        |  FROM p)
        |SELECT id_a, id_b, jaccard FROM j
        |WHERE jaccard >= 0.2 ORDER BY id_a, id_b""".stripMargin,

    "q_margin_mining" ->
      """WITH p AS (
        |  SELECT a.vec_id ia, b.vec_id ib,
        |         unnest(a.embedding)::DOUBLE x, unnest(b.embedding)::DOUBLE y
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
        |agg AS (SELECT ia, ib, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |        FROM p GROUP BY ia, ib),
        |sims AS (SELECT ia, ib,
        |    CAST(ROUND(dp / (GREATEST(SQRT(nx2), 1e-12) *
        |                     GREATEST(SQRT(ny2), 1e-12)) * 10000, 0) AS BIGINT)
        |      AS cosm
        |  FROM agg),
        |dirs AS (SELECT ia AS src, ib AS nbr, cosm FROM sims
        |         UNION ALL SELECT ib, ia, cosm FROM sims),
        |rk AS (SELECT src, nbr, cosm,
        |         ROW_NUMBER() OVER (PARTITION BY src ORDER BY cosm DESC, nbr) AS rn
        |       FROM dirs),
        |knn AS (SELECT src, SUM(cosm)::BIGINT AS ksum, COUNT(*)::BIGINT AS kn
        |        FROM rk WHERE rn <= 8 GROUP BY src),
        |m AS (
        |  SELECT s.ia AS id_a, s.ib AS id_b,
        |    ROUND(s.cosm::DOUBLE * (ka.kn + kb.kn) / (ka.ksum + kb.ksum), 4)
        |      + 0.0 AS margin
        |  FROM sims s JOIN knn ka ON s.ia = ka.src JOIN knn kb ON s.ib = kb.src)
        |SELECT id_a, id_b, margin FROM m
        |WHERE margin >= 1.05 ORDER BY id_a, id_b""".stripMargin,

    // The full composition replayed: 6-dp argmax cell assignment (ties
    // to the smallest centroid id), WITHIN-CELL pairs only, kNN density
    // from within-cell neighbors, quantized margin.
    "q_margin_ivf" ->
      """WITH cents AS (
        |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings
        |  WHERE vec_id < 16),
        |pc AS (
        |  SELECT e.vec_id, c.cent_id,
        |         unnest(e.embedding)::DOUBLE x, unnest(c.cvec)::DOUBLE y
        |  FROM embeddings e CROSS JOIN cents c),
        |pagg AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM pc GROUP BY vec_id, cent_id),
        |psc AS (SELECT vec_id, cent_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |        FROM pagg),
        |assign AS MATERIALIZED (
        |  SELECT vec_id, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
        |    FROM psc) WHERE rn = 1),
        |p AS (
        |  SELECT a.vec_id ia, b.vec_id ib,
        |         unnest(ea.embedding)::DOUBLE x, unnest(eb.embedding)::DOUBLE y
        |  FROM assign a JOIN assign b
        |    ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
        |  JOIN embeddings ea ON ea.vec_id = a.vec_id
        |  JOIN embeddings eb ON eb.vec_id = b.vec_id),
        |agg AS (SELECT ia, ib, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |        FROM p GROUP BY ia, ib),
        |sims AS MATERIALIZED (SELECT ia, ib,
        |    CAST(ROUND(dp / (GREATEST(SQRT(nx2), 1e-12) *
        |                     GREATEST(SQRT(ny2), 1e-12)) * 10000, 0) AS BIGINT)
        |      AS cosm
        |  FROM agg),
        |dirs AS (SELECT ia AS src, ib AS nbr, cosm FROM sims
        |         UNION ALL SELECT ib, ia, cosm FROM sims),
        |rk AS (SELECT src, nbr, cosm,
        |         ROW_NUMBER() OVER (PARTITION BY src ORDER BY cosm DESC, nbr) AS rn
        |       FROM dirs),
        |knn AS (SELECT src, SUM(cosm)::BIGINT AS ksum, COUNT(*)::BIGINT AS kn
        |        FROM rk WHERE rn <= 8 GROUP BY src),
        |m AS (
        |  SELECT s.ia AS id_a, s.ib AS id_b,
        |    ROUND(s.cosm::DOUBLE * (ka.kn + kb.kn) / (ka.ksum + kb.ksum), 4)
        |      + 0.0 AS margin
        |  FROM sims s JOIN knn ka ON s.ia = ka.src JOIN knn kb ON s.ib = kb.src)
        |SELECT id_a, id_b, margin FROM m
        |WHERE margin >= 1.05 ORDER BY id_a, id_b""".stripMargin,

    "q_gopher_rules" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, len(toks) AS n,
        |    ROUND(list_sum(list_transform(toks, t -> len(t)))::DOUBLE
        |          / len(toks), 4) + 0.0 AS mean_wlen,
        |    ROUND(len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))::DOUBLE
        |          / len(toks), 4) + 0.0 AS alpha_frac,
        |    ROUND(len(list_filter(toks,
        |            t -> contains(t, '#') OR contains(t, '...')))::DOUBLE
        |          / len(toks), 4) + 0.0 AS sym_ratio,
        |    len(list_filter(toks, t -> list_contains(
        |      ['the','be','to','of','and','that','have','with','a','in'], t)))
        |      AS stop_hits
        |  FROM base WHERE len(toks) > 0)
        |SELECT doc_id, n::BIGINT AS n_words, mean_wlen, alpha_frac, sym_ratio,
        |  stop_hits::BIGINT AS stop_hits,
        |  (n BETWEEN 50 AND 100000 AND mean_wlen BETWEEN 3.0 AND 10.0
        |   AND alpha_frac > 0.8 AND sym_ratio < 0.1 AND stop_hits >= 2) AS keep
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_blocklist" ->
      """WITH pl AS (
        |  SELECT * FROM (VALUES ('a a'), ('fast table'), ('scan scan'),
        |                        ('slow query'), ('table table')) p(phrase)),
        |h AS (
        |  SELECT d.doc_id, p.phrase,
        |         len(list_filter(
        |           generate_series(1, len(d.text) - len(p.phrase) + 1),
        |           i -> substr(d.text, i, len(p.phrase)) = p.phrase)) AS hits
        |  FROM documents d CROSS JOIN pl p)
        |SELECT phrase,
        |       count(*) FILTER (WHERE hits > 0)::BIGINT AS docs_hit,
        |       SUM(hits)::BIGINT AS total_hits
        |FROM h GROUP BY phrase ORDER BY phrase""".stripMargin,

    "q_phrase_search" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |tk AS (
        |  SELECT doc_id, unnest(toks) AS term,
        |         unnest(range(1, len(toks) + 1)) AS pos
        |  FROM base),
        |a AS (SELECT doc_id, pos FROM tk WHERE term = 'table'),
        |b AS (SELECT doc_id, pos - 1 AS pos FROM tk WHERE term = 'hash')
        |SELECT doc_id, COUNT(*)::BIGINT AS n_hits
        |FROM a JOIN b USING (doc_id, pos)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_weighted_sample" ->
      """SELECT doc_id, n_chars,
        |  ROUND(LN((('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
        |            % 1000000 + 1) / 1000001.0) / n_chars, 9) + 0.0 AS es
        |FROM documents
        |ORDER BY es DESC, doc_id LIMIT 100""".stripMargin,

    "q_csv_roundtrip" ->
      """SELECT doc_id, source, text FROM documents ORDER BY doc_id""".stripMargin,

    "q_orc_roundtrip" ->
      """SELECT doc_id, source, text, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin,

    // exact regime (per-source vocab < k = 8192): every sketch holds its
    // full hash set, so the estimates ARE the exact set-op cardinalities
    "q_kmv_setops" ->
      """WITH tok AS (
        |  SELECT source,
        |         unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |                     ELSE string_split_regex(trim(lower(text)), '\s+') END)
        |           AS tok
        |  FROM documents),
        |d AS (SELECT DISTINCT source, tok FROM tok),
        |n AS (SELECT source, COUNT(*)::BIGINT AS nd FROM d GROUP BY source),
        |p AS (SELECT a.source AS key_a, b.source AS key_b,
        |             a.nd AS n_a, b.nd AS n_b
        |      FROM n a JOIN n b ON a.source < b.source),
        |i AS (SELECT x.source AS key_a, y.source AS key_b,
        |             COUNT(*)::BIGINT AS ni
        |      FROM d x JOIN d y ON x.tok = y.tok AND x.source < y.source
        |      GROUP BY 1, 2)
        |SELECT p.key_a, p.key_b, p.n_a, p.n_b,
        |       p.n_a + p.n_b - COALESCE(i.ni, 0) AS n_union,
        |       COALESCE(i.ni, 0)::BIGINT AS n_inter,
        |       ROUND(COALESCE(i.ni, 0)::DOUBLE /
        |             (p.n_a + p.n_b - COALESCE(i.ni, 0)), 6) + 0.0 AS jaccard,
        |       true AS is_exact
        |FROM p LEFT JOIN i ON p.key_a = i.key_a AND p.key_b = i.key_b
        |ORDER BY p.key_a, p.key_b""".stripMargin,

    "q_pmi_collocations" ->
      """WITH base AS (
        |  SELECT CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |              ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |uni AS (
        |  SELECT unnest(toks) AS w FROM base),
        |un AS (SELECT w, COUNT(*)::BIGINT AS n FROM uni GROUP BY w),
        |bi AS (
        |  SELECT toks[i] AS w1, toks[i + 1] AS w2
        |  FROM base, (SELECT unnest(generate_series(1, len(toks) - 1)) AS i)),
        |bn AS (SELECT w1, w2, COUNT(*)::BIGINT AS n_ab FROM bi GROUP BY w1, w2),
        |tot AS (
        |  SELECT (SELECT SUM(n) FROM un)::DOUBLE AS nt,
        |         (SELECT SUM(n_ab) FROM bn)::DOUBLE AS bt)
        |SELECT b.w1, b.w2, b.n_ab, a.n AS n_a, c.n AS n_b,
        |       ROUND(LN((b.n_ab::DOUBLE / t.bt) /
        |                ((a.n::DOUBLE / t.nt) * (c.n::DOUBLE / t.nt))), 6) + 0.0
        |         AS pmi
        |FROM bn b
        |JOIN un a ON b.w1 = a.w
        |JOIN un c ON b.w2 = c.w
        |CROSS JOIN tot t
        |WHERE b.n_ab >= 5
        |ORDER BY pmi DESC, b.w1, b.w2 LIMIT 30""".stripMargin,

    "q_three_way_split" ->
      """WITH s AS (
        |  SELECT source,
        |    CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
        |              % 1000000 < 800000 THEN 'train'
        |         WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
        |              % 1000000 < 900000 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT source, split, COUNT(*)::BIGINT AS n
        |FROM s GROUP BY source, split ORDER BY source, split""".stripMargin,

    "q_table_digest" ->
      """WITH h AS (
        |  SELECT source AS grp,
        |         ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
        |  FROM documents)
        |SELECT grp, COUNT(*)::BIGINT AS n_rows,
        |       bit_xor(h)::BIGINT AS digest_xor,
        |       (SUM(h) % 1152921504606846976)::BIGINT AS digest_sum
        |FROM h GROUP BY grp ORDER BY grp""".stripMargin,

    "q_runtime_filter_join" ->
      """SELECT l.l_returnflag, COUNT(*)::BIGINT AS n,
        |       ROUND(SUM(l.l_extendedprice), 2) AS rev
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 150000
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin,

    "q_zipf_fit" ->
      """WITH tok AS (
        |  SELECT unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |                     ELSE string_split_regex(trim(lower(text)), '\s+') END)
        |           AS w
        |  FROM documents),
        |c AS (SELECT w, COUNT(*)::BIGINT AS cnt FROM tok GROUP BY w),
        |top AS (SELECT w, cnt FROM c ORDER BY cnt DESC, w LIMIT 100),
        |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w) AS rk
        |      FROM top),
        |m AS (SELECT CAST(ROUND(LN(rk::DOUBLE) * 1000000.0, 0) AS BIGINT) AS x,
        |             CAST(ROUND(LN(cnt::DOUBLE) * 1000000.0, 0) AS BIGINT) AS y
        |      FROM r),
        |s AS (SELECT COUNT(*)::BIGINT AS k, SUM(x)::BIGINT AS sx,
        |             SUM(y)::BIGINT AS sy, SUM(x * y)::BIGINT AS sxy,
        |             SUM(x * x)::BIGINT AS sxx
        |      FROM m)
        |SELECT k AS n_terms,
        |  ROUND((k * sxy - sx * sy)::DOUBLE /
        |        (k * sxx - sx * sx)::DOUBLE, 6) + 0.0 AS slope,
        |  ROUND(sy::DOUBLE / 1000000.0 / k -
        |        ((k * sxy - sx * sy)::DOUBLE / (k * sxx - sx * sx)::DOUBLE)
        |          * (sx::DOUBLE / 1000000.0 / k), 6) + 0.0 AS intercept
        |FROM s""".stripMargin,

    "q_cooccur_edges" ->
      """WITH ui AS (
        |  SELECT DISTINCT user_id AS u, 100000 + event_id % 50 AS i
        |  FROM events),
        |c AS (SELECT u, i, row_number() OVER (PARTITION BY u ORDER BY i) AS rn
        |      FROM ui),
        |cap AS (SELECT u, i FROM c WHERE rn <= 256)
        |SELECT a.i AS ia, b.i AS ib, COUNT(*)::BIGINT AS n_shared
        |FROM cap a JOIN cap b ON a.u = b.u AND a.i < b.i
        |GROUP BY 1, 2 HAVING COUNT(*) >= 3
        |ORDER BY ia, ib""".stripMargin,

    "q_triangle_count" ->
      """WITH ui AS (
        |  SELECT DISTINCT user_id AS u, 100000 + event_id % 50 AS i
        |  FROM events),
        |c AS (SELECT u, i, row_number() OVER (PARTITION BY u ORDER BY i) AS rn
        |      FROM ui),
        |cap AS (SELECT u, i FROM c WHERE rn <= 256),
        |e AS (
        |  SELECT a.i AS a, b.i AS b
        |  FROM cap a JOIN cap b ON a.u = b.u AND a.i < b.i
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
        |SELECT COUNT(*)::BIGINT AS n_triangles
        |FROM e e1
        |JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        |JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b""".stripMargin,

    "q_length_buckets" ->
      """WITH t AS (
        |  SELECT (CASE WHEN trim(text) = '' THEN 0
        |               ELSE len(string_split_regex(trim(text), '\s+'))
        |          END)::BIGINT AS nt
        |  FROM documents),
        |b AS (
        |  SELECT nt,
        |         (CASE WHEN nt <= 16 THEN 16 WHEN nt <= 32 THEN 32
        |               WHEN nt <= 64 THEN 64 WHEN nt <= 128 THEN 128
        |               ELSE 256 END)::BIGINT AS bucket
        |  FROM t)
        |SELECT bucket, COUNT(*)::BIGINT AS n_docs,
        |       (COUNT(*) FILTER (WHERE nt > 256))::BIGINT AS n_truncated,
        |       SUM(LEAST(nt, 256))::BIGINT AS total_tokens,
        |       (COUNT(*) * bucket)::BIGINT AS capacity,
        |       ROUND(1.0 - SUM(LEAST(nt, 256))::DOUBLE /
        |             (COUNT(*) * bucket)::DOUBLE, 4) + 0.0 AS pad_waste
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_k_anonymity" ->
      """SELECT source, lang, COUNT(*)::BIGINT AS n,
        |       COUNT(*) < 20 AS suppress
        |FROM documents GROUP BY source, lang
        |ORDER BY source, lang""".stripMargin,

    "q_autocomplete" ->
      """WITH tok AS (
        |  SELECT unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |                     ELSE string_split_regex(trim(lower(text)), '\s+') END)
        |           AS w
        |  FROM documents),
        |c AS (SELECT w, COUNT(*)::BIGINT AS cnt FROM tok
        |      WHERE len(w) >= 4 GROUP BY w),
        |r AS (SELECT substr(w, 1, 2) AS prefix, w, cnt,
        |             row_number() OVER (PARTITION BY substr(w, 1, 2)
        |                                ORDER BY cnt DESC, w) AS rk
        |      FROM c)
        |SELECT prefix, CAST(rk AS INT) AS rk, w AS completion, cnt
        |FROM r WHERE rk <= 3 ORDER BY prefix, rk""".stripMargin,

    "q_embed_drift" ->
      """WITH x AS (
        |  SELECT label, vec_id % 2 AS half, unnest(embedding)::DOUBLE AS x,
        |         unnest(generate_series(1, len(embedding))) AS i
        |  FROM embeddings),
        |c AS (SELECT label, half, i,
        |             CAST(ROUND(AVG(x) * 1000000.0, 0) AS BIGINT) AS m
        |      FROM x GROUP BY label, half, i),
        |j AS (SELECT a.label, SUM(a.m * b.m)::BIGINT AS dot,
        |             SUM(a.m * a.m)::BIGINT AS na, SUM(b.m * b.m)::BIGINT AS nb
        |      FROM c a JOIN c b ON a.label = b.label AND a.i = b.i
        |      WHERE a.half = 0 AND b.half = 1
        |      GROUP BY a.label)
        |SELECT label,
        |  ROUND(dot::DOUBLE / SQRT(na::DOUBLE) / SQRT(nb::DOUBLE), 6) + 0.0
        |    AS cosine,
        |  ROUND(1.0 - ROUND(dot::DOUBLE / SQRT(na::DOUBLE) / SQRT(nb::DOUBLE),
        |                    6), 6) + 0.0 AS drift
        |FROM j ORDER BY label""".stripMargin,

    "q_oov_rate" ->
      """WITH tok AS (
        |  SELECT source AS grp,
        |         unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |                     ELSE string_split_regex(trim(lower(text)), '\s+') END)
        |           AS w
        |  FROM documents),
        |v AS (SELECT w FROM (
        |        SELECT w, COUNT(*)::BIGINT AS cnt FROM tok GROUP BY w
        |        ORDER BY cnt DESC, w LIMIT 500))
        |SELECT t.grp, COUNT(*)::BIGINT AS n_tokens,
        |       (COUNT(*) FILTER (WHERE v.w IS NULL))::BIGINT AS n_oov,
        |       ROUND((COUNT(*) FILTER (WHERE v.w IS NULL))::DOUBLE
        |             / COUNT(*)::DOUBLE, 6) + 0.0 AS oov_rate
        |FROM tok t LEFT JOIN v ON t.w = v.w
        |GROUP BY t.grp ORDER BY t.grp""".stripMargin,

    "q_readability" ->
      """SELECT doc_id,
        |  (CASE WHEN trim(text) = '' THEN 0
        |        ELSE len(string_split_regex(trim(text), '\s+')) END)::BIGINT
        |    AS n_words,
        |  len(regexp_extract_all(text, '[.!?]+'))::BIGINT AS n_sentences,
        |  len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT
        |    AS n_syllables,
        |  ROUND(206.835
        |        - 1.015 * (GREATEST(n_words, 1)::DOUBLE
        |                   / GREATEST(n_sentences, 1)::DOUBLE)
        |        - 84.6 * (n_syllables::DOUBLE / GREATEST(n_words, 1)::DOUBLE),
        |        4) + 0.0 AS flesch
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_neardup_sweep" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |                      ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents
        |  WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 40),
        |s AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(generate_series(1, len(toks)-1),
        |           i -> toks[i] || ' ' || toks[i+1])) AS sh
        |  FROM t WHERE len(toks) >= 2),
        |sig AS (
        |  SELECT doc_id, sh,
        |         list_transform(generate_series(0, 15), i ->
        |           list_min(list_transform(sh, x ->
        |             ('0x'||substr(md5(i::VARCHAR||':'||x), 1, 15))::BIGINT))) AS sig
        |  FROM s WHERE len(sh) > 0),
        |bands AS (
        |  SELECT doc_id, band_idx,
        |         md5(array_to_string(sig[band_idx*2+1 : band_idx*2+2], ',')) AS bh
        |  FROM (SELECT doc_id, sig, unnest(generate_series(0, 7)) AS band_idx FROM sig)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id da, b.doc_id db
        |  FROM bands a JOIN bands b
        |    ON a.band_idx = b.band_idx AND a.bh = b.bh AND a.doc_id < b.doc_id),
        |j AS (
        |  SELECT da, db,
        |         len(list_intersect(x.sh, y.sh))::DOUBLE /
        |           (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) AS jac
        |  FROM cand JOIN s x ON da = x.doc_id JOIN s y ON db = y.doc_id),
        |h AS (
        |  SELECT LEAST(CAST(FLOOR(CAST(ROUND(jac * 10000, 0) AS BIGINT)
        |                          / 1000.0) AS BIGINT), 9) AS bucket,
        |         COUNT(*)::BIGINT AS n_pairs
        |  FROM j GROUP BY 1)
        |SELECT bucket, ROUND(bucket / 10.0, 1) + 0.0 AS lo, n_pairs,
        |       SUM(n_pairs) OVER (ORDER BY bucket DESC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |         AS n_kept_at_lo
        |FROM h ORDER BY bucket""".stripMargin,

    "q_data_quality" ->
      """WITH rl AS (
        |  SELECT 'not_null' AS "check", 'text' AS "column",
        |         (COUNT(*) FILTER (WHERE text IS NULL))::BIGINT AS n_violations
        |  FROM documents
        |  UNION ALL
        |  SELECT 'non_empty', 'text',
        |         (COUNT(*) FILTER (WHERE text IS NULL
        |            OR len(trim(text)) = 0))::BIGINT
        |  FROM documents
        |  UNION ALL
        |  SELECT 'in_range', 'n_chars',
        |         (COUNT(*) FILTER (WHERE n_chars IS NULL OR n_chars < 0
        |            OR n_chars > 100000))::BIGINT
        |  FROM documents
        |  UNION ALL
        |  SELECT 'matches', 'lang',
        |         (COUNT(*) FILTER (WHERE lang IS NULL
        |            OR NOT regexp_matches(lang, '^[a-z]{2}$')))::BIGINT
        |  FROM documents
        |  UNION ALL
        |  SELECT 'is_in', 'source',
        |         (COUNT(*) FILTER (WHERE source IS NULL OR source NOT IN
        |            ('src0','src1','src2','src3','src4','src5','src6','src7',
        |             'src8','src9','src10','src11','src12','src13','src14')))::BIGINT
        |  FROM documents
        |  UNION ALL
        |  SELECT 'unique', 'doc_id',
        |         COALESCE((SELECT SUM(c - 1) FROM
        |           (SELECT COUNT(*) AS c FROM documents GROUP BY doc_id)
        |           WHERE c > 1), 0)::BIGINT)
        |SELECT "check", "column", n_violations, n_violations = 0 AS passed
        |FROM rl ORDER BY "check", "column"""".stripMargin,

    "q_tfidf_search" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
        |nn AS (SELECT COUNT(*)::DOUBLE AS n FROM documents),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |idf AS (SELECT term, ROUND(ln((nn.n + 1.0) / (df.df::DOUBLE + 1.0)) + 1.0, 6) AS idf
        |        FROM df CROSS JOIN nn),
        |w AS (SELECT tf.doc_id, tf.term,
        |             CAST(ROUND(tf.tf::DOUBLE * idf.idf * 1000000) AS BIGINT) AS wq
        |      FROM tf JOIN idf USING (term)),
        |pd AS (SELECT doc_id, SUM(wq * wq) AS n2,
        |              SUM(CASE WHEN term IN ('vector', 'join', 'scan')
        |                       THEN wq ELSE 0 END) AS dot
        |       FROM w GROUP BY doc_id)
        |SELECT doc_id,
        |       ROUND(dot::DOUBLE / SQRT(n2::DOUBLE) / SQRT(3.0), 4) + 0.0 AS score
        |FROM pd WHERE dot > 0
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    "q_paragraph_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, text, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, unnest(generate_series(0, CAST(ceil(len(toks)/10.0) AS INT) - 1)) AS idx, toks
        |  FROM t WHERE len(toks) > 0),
        |p AS (
        |  SELECT doc_id, idx,
        |         md5(lower(trim(regexp_replace(
        |           array_to_string(toks[idx*10+1 : idx*10+10], ' '), '\s+', ' ', 'g')))) AS fp
        |  FROM c),
        |k AS (
        |  SELECT doc_id, idx FROM (
        |    SELECT doc_id, idx,
        |           row_number() OVER (PARTITION BY fp ORDER BY doc_id, idx) AS rn
        |    FROM p) WHERE rn = 1),
        |keep AS (
        |  SELECT doc_id, list_sort(list(idx)) AS keep FROM k GROUP BY doc_id),
        |x AS (
        |  SELECT t.doc_id, t.text, t.toks,
        |         CAST(CASE WHEN len(t.toks) = 0 THEN 0
        |              ELSE ceil(len(t.toks)/10.0) END AS BIGINT) AS n_paras,
        |         CAST(COALESCE(len(kp.keep), 0) AS BIGINT) AS n_kept, kp.keep
        |  FROM t LEFT JOIN keep kp USING (doc_id))
        |SELECT doc_id, n_paras, n_kept,
        |       CASE WHEN n_paras = n_kept THEN text
        |            ELSE COALESCE(array_to_string(list_transform(keep,
        |              i -> array_to_string(toks[i*10+1 : i*10+10], ' ')), ' '), '')
        |       END AS text_dedup
        |FROM x ORDER BY doc_id""".stripMargin,

    "q_cluster_balance" ->
      """WITH cents AS (
        |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id < 16),
        |pc AS (
        |  SELECT e.vec_id, c.cent_id,
        |         unnest(e.embedding)::DOUBLE x, unnest(c.cvec)::DOUBLE y
        |  FROM embeddings e CROSS JOIN cents c),
        |pagg AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM pc GROUP BY vec_id, cent_id),
        |psc AS (SELECT vec_id, cent_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |        FROM pagg),
        |assign AS (
        |  SELECT vec_id, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
        |    FROM psc) WHERE rn = 1),
        |pri AS (
        |  SELECT cell_id, vec_id,
        |         (('0x' || substr(md5('cb:' || vec_id), 1, 13))::BIGINT)::DOUBLE AS pri
        |  FROM assign),
        |r AS (
        |  SELECT cell_id, vec_id,
        |         row_number() OVER (PARTITION BY cell_id ORDER BY pri DESC, vec_id) AS rn
        |  FROM pri)
        |SELECT cell_id, vec_id FROM r WHERE rn <= 20
        |ORDER BY cell_id, vec_id""".stripMargin,

    "q_tfidf_keywords" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
        |nn AS (SELECT COUNT(*)::DOUBLE AS n FROM documents),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |idf AS (SELECT term, ROUND(ln((nn.n + 1.0) / (df.df::DOUBLE + 1.0)) + 1.0, 6) AS idf
        |        FROM df CROSS JOIN nn),
        |w AS (SELECT tf.doc_id, tf.term,
        |             CAST(ROUND(tf.tf::DOUBLE * idf.idf * 1000000) AS BIGINT) AS wq
        |      FROM tf JOIN idf USING (term)),
        |r AS (SELECT doc_id, term, wq,
        |             row_number() OVER (PARTITION BY doc_id ORDER BY wq DESC, term) AS rn
        |      FROM w)
        |SELECT doc_id, term, wq FROM r WHERE rn <= 3
        |ORDER BY doc_id, wq DESC, term""".stripMargin,

    "q_pseudonymize" ->
      """SELECT event_id,
        |       'u' || substr(md5('graft-release-1:' || user_id), 1, 12) AS user_pseud,
        |       event_type
        |FROM events ORDER BY event_id""".stripMargin,

    "q_cluster_purity" ->
      """WITH cents AS (
        |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id < 16),
        |pc AS (
        |  SELECT e.vec_id, c.cent_id,
        |         unnest(e.embedding)::DOUBLE x, unnest(c.cvec)::DOUBLE y
        |  FROM embeddings e CROSS JOIN cents c),
        |pagg AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM pc GROUP BY vec_id, cent_id),
        |psc AS (SELECT vec_id, cent_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |        FROM pagg),
        |assign AS (
        |  SELECT vec_id, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
        |    FROM psc) WHERE rn = 1),
        |cnt AS (
        |  SELECT a.cell_id, e.label::BIGINT AS lab, COUNT(*) AS c
        |  FROM assign a JOIN embeddings e USING (vec_id)
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT cell_id, lab, c,
        |         row_number() OVER (PARTITION BY cell_id ORDER BY c DESC, lab) AS rn,
        |         SUM(c) OVER (PARTITION BY cell_id) AS n
        |  FROM cnt)
        |SELECT cell_id, n::BIGINT AS n, lab AS top_label, c::BIGINT AS n_top,
        |       ROUND(c::DOUBLE / n, 4) + 0.0 AS purity
        |FROM r WHERE rn = 1 ORDER BY cell_id""".stripMargin,

    "q_label_prop" ->
      s"""WITH $lpaCtes
         |SELECT node, lab FROM l3 ORDER BY node""".stripMargin,

    "q_token_fertility" ->
      """WITH x AS (
        |  SELECT source,
        |    CAST(CASE WHEN trim(text) = '' THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS nw,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS nb,
        |    CAST(length(text) AS BIGINT) AS nc
        |  FROM documents),
        |g AS (
        |  SELECT source, SUM(nw) AS n_words, SUM(nb) AS n_bpe, SUM(nc) AS n_chars
        |  FROM x GROUP BY source)
        |SELECT source, n_words::BIGINT AS n_words, n_bpe::BIGINT AS n_bpe,
        |       n_chars::BIGINT AS n_chars,
        |       ROUND(n_bpe::DOUBLE / n_words, 4) + 0.0 AS fertility,
        |       ROUND(n_chars::DOUBLE / n_bpe, 4) + 0.0 AS chars_per_token
        |FROM g ORDER BY source""".stripMargin,

    "q3_shipping" ->
      """SELECT l_orderkey,
        |       ROUND(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))::DOUBLE / 100, 2) + 0.0 AS revenue,
        |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q_hybrid_blend" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
        |st AS (SELECT COUNT(*)::DOUBLE AS n, SUM(dl)::DOUBLE AS sdl FROM dl),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
        |       WHERE term IN ('vector', 'join', 'scan') GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |idf AS (SELECT term, ROUND(ln((st.n - df.df::DOUBLE + 0.5) / (df.df::DOUBLE + 0.5) + 1.0), 6) AS idf
        |        FROM df CROSS JOIN st),
        |u AS (
        |  SELECT tf.doc_id,
        |         CAST(ROUND(idf.idf * tf.tf::DOUBLE * 2.2 /
        |           (tf.tf::DOUBLE + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl::DOUBLE / (st.sdl / st.n)))
        |           * 1000000) AS BIGINT) AS u
        |  FROM tf JOIN idf USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
        |bm AS (SELECT doc_id AS id, ROUND(SUM(u)::DOUBLE / 1000000.0, 4) + 0.0 AS score
        |       FROM u GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20),
        |bmm AS (SELECT MIN(score) AS mn, MAX(score) AS mx FROM bm),
        |bmn AS (
        |  SELECT id, CASE WHEN mx = mn THEN 1.0
        |                  ELSE ROUND((score - mn) / (mx - mn), 6) + 0.0 END AS ns
        |  FROM bm CROSS JOIN bmm),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 42),
        |pairs AS (
        |  SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS x, unnest(q.qe)::DOUBLE AS y
        |  FROM embeddings e CROSS JOIN q),
        |agg AS (
        |  SELECT vec_id, SUM(x*y) AS dp, SUM(x*x) AS nx2, SUM(y*y) AS ny2
        |  FROM pairs GROUP BY vec_id),
        |vec AS (
        |  SELECT vec_id AS id,
        |         ROUND(dp / (GREATEST(SQRT(nx2), 1e-12) * GREATEST(SQRT(ny2), 1e-12)), 6)
        |           + 0.0 AS score
        |  FROM agg ORDER BY score DESC, vec_id LIMIT 20),
        |vmm AS (SELECT MIN(score) AS mn, MAX(score) AS mx FROM vec),
        |vn AS (
        |  SELECT id, CASE WHEN mx = mn THEN 1.0
        |                  ELSE ROUND((score - mn) / (mx - mn), 6) + 0.0 END AS ns
        |  FROM vec CROSS JOIN vmm),
        |fused AS (
        |  SELECT COALESCE(b.id, v.id) AS id,
        |         FLOOR((CAST(ROUND(COALESCE(b.ns, 0.0) * 1000000, 0) AS BIGINT) * 500000
        |              + CAST(ROUND(COALESCE(v.ns, 0.0) * 1000000, 0) AS BIGINT) * 500000
        |              + 500000)::DOUBLE / 1000000.0)::BIGINT::DOUBLE / 1000000.0 AS blend
        |  FROM bmn b FULL OUTER JOIN vn v ON b.id = v.id)
        |SELECT id, blend FROM fused ORDER BY blend DESC, id LIMIT 10""".stripMargin,

    // PRF in SQL: stage-1 BM25 (seed terms) → top-10 doc set → summed
    // tf-idf expansion-term mining (full-corpus smoothed idf, seed
    // excluded, top 5) → stage-2 BM25 over seed ∪ expansion. Both BM25
    // stages share the corpus stats CTEs; stage-2 df/idf recompute over
    // the expanded term set exactly as the engine does.
    "q_prf_expand" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
        |st AS (SELECT COUNT(*)::DOUBLE AS n, SUM(dl)::DOUBLE AS sdl FROM dl),
        |tf1 AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
        |        WHERE term IN ('vector', 'join', 'scan') GROUP BY doc_id, term),
        |df1 AS (SELECT term, COUNT(*) AS df FROM tf1 GROUP BY term),
        |idf1 AS (SELECT term, ROUND(ln((st.n - df1.df::DOUBLE + 0.5) / (df1.df::DOUBLE + 0.5) + 1.0), 6) AS idf
        |         FROM df1 CROSS JOIN st),
        |u1 AS (
        |  SELECT tf1.doc_id,
        |         CAST(ROUND(idf1.idf * tf1.tf::DOUBLE * 2.2 /
        |           (tf1.tf::DOUBLE + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl::DOUBLE / (st.sdl / st.n)))
        |           * 1000000) AS BIGINT) AS u
        |  FROM tf1 JOIN idf1 USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
        |top1 AS (SELECT doc_id, ROUND(SUM(u)::DOUBLE / 1000000.0, 4) + 0.0 AS score
        |         FROM u1 GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10),
        |tfa AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
        |dfa AS (SELECT term, COUNT(*) AS df FROM tfa GROUP BY term),
        |idfa AS (SELECT term, ROUND(ln((st.n + 1.0) / (dfa.df::DOUBLE + 1.0)) + 1.0, 6) AS idf
        |         FROM dfa CROSS JOIN st),
        |wq AS (SELECT tfa.doc_id, tfa.term,
        |              CAST(ROUND(tfa.tf::DOUBLE * idfa.idf * 1000000) AS BIGINT) AS wq
        |       FROM tfa JOIN idfa USING (term)),
        |exp AS (
        |  SELECT term FROM wq JOIN top1 USING (doc_id)
        |  WHERE term NOT IN ('vector', 'join', 'scan')
        |  GROUP BY term ORDER BY SUM(wq) DESC, term LIMIT 5),
        |terms2 AS (
        |  SELECT unnest(['vector', 'join', 'scan']) AS term
        |  UNION ALL SELECT term FROM exp),
        |tf2 AS (SELECT tok.doc_id, tok.term, COUNT(*) AS tf
        |        FROM tok JOIN terms2 USING (term) GROUP BY tok.doc_id, tok.term),
        |df2 AS (SELECT term, COUNT(*) AS df FROM tf2 GROUP BY term),
        |idf2 AS (SELECT term, ROUND(ln((st.n - df2.df::DOUBLE + 0.5) / (df2.df::DOUBLE + 0.5) + 1.0), 6) AS idf
        |         FROM df2 CROSS JOIN st),
        |u2 AS (
        |  SELECT tf2.doc_id,
        |         CAST(ROUND(idf2.idf * tf2.tf::DOUBLE * 2.2 /
        |           (tf2.tf::DOUBLE + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl::DOUBLE / (st.sdl / st.n)))
        |           * 1000000) AS BIGINT) AS u
        |  FROM tf2 JOIN idf2 USING (term) JOIN dl USING (doc_id) CROSS JOIN st)
        |SELECT doc_id, ROUND(SUM(u)::DOUBLE / 1000000.0, 4) + 0.0 AS score
        |FROM u2 GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    "q_incremental_paradedup" ->
      """WITH t AS (
        |  SELECT doc_id, text, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents WHERE doc_id >= 250),
        |ct AS (
        |  SELECT CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents WHERE doc_id < 250),
        |cc AS (
        |  SELECT unnest(generate_series(0, CAST(ceil(len(toks)/10.0) AS INT) - 1)) AS idx, toks
        |  FROM ct WHERE len(toks) > 0),
        |corp AS (
        |  SELECT DISTINCT md5(lower(trim(regexp_replace(
        |    array_to_string(toks[idx*10+1 : idx*10+10], ' '), '\s+', ' ', 'g')))) AS fp
        |  FROM cc),
        |c AS (
        |  SELECT doc_id, unnest(generate_series(0, CAST(ceil(len(toks)/10.0) AS INT) - 1)) AS idx, toks
        |  FROM t WHERE len(toks) > 0),
        |p AS (
        |  SELECT doc_id, idx,
        |         md5(lower(trim(regexp_replace(
        |           array_to_string(toks[idx*10+1 : idx*10+10], ' '), '\s+', ' ', 'g')))) AS fp
        |  FROM c),
        |pf AS (
        |  SELECT p.doc_id, p.idx, p.fp FROM p
        |  LEFT JOIN corp ON p.fp = corp.fp WHERE corp.fp IS NULL),
        |k AS (
        |  SELECT doc_id, idx FROM (
        |    SELECT doc_id, idx,
        |           row_number() OVER (PARTITION BY fp ORDER BY doc_id, idx) AS rn
        |    FROM pf) WHERE rn = 1),
        |keep AS (
        |  SELECT doc_id, list_sort(list(idx)) AS keep FROM k GROUP BY doc_id),
        |x AS (
        |  SELECT t.doc_id, t.text, t.toks,
        |         CAST(CASE WHEN len(t.toks) = 0 THEN 0
        |              ELSE ceil(len(t.toks)/10.0) END AS BIGINT) AS n_paras,
        |         CAST(COALESCE(len(kp.keep), 0) AS BIGINT) AS n_kept, kp.keep
        |  FROM t LEFT JOIN keep kp USING (doc_id))
        |SELECT doc_id, n_paras, n_kept,
        |       CASE WHEN n_paras = n_kept THEN text
        |            ELSE COALESCE(array_to_string(list_transform(keep,
        |              i -> array_to_string(toks[i*10+1 : i*10+10], ' ')), ' '), '')
        |       END AS text_dedup
        |FROM x ORDER BY doc_id""".stripMargin,

    "q_rank_quality" ->
      """WITH cents AS (
        |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings
        |  WHERE vec_id < 16),
        |qs AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id % 100 = 42),
        |pc AS (
        |  SELECT e.vec_id, c.cent_id,
        |         unnest(e.embedding)::DOUBLE x, unnest(c.cvec)::DOUBLE y
        |  FROM embeddings e CROSS JOIN cents c),
        |pagg AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM pc GROUP BY vec_id, cent_id),
        |psc AS (SELECT vec_id, cent_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |        FROM pagg),
        |assign AS (
        |  SELECT vec_id, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
        |    FROM psc) WHERE rn = 1),
        |probes4 AS (
        |  SELECT vec_id AS qid, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
        |    FROM psc WHERE vec_id IN (SELECT qid FROM qs)) WHERE rn <= 4),
        |qp AS (
        |  SELECT q.qid, e.vec_id,
        |         unnest(e.embedding)::DOUBLE x, unnest(qe.embedding)::DOUBLE y
        |  FROM embeddings e
        |  CROSS JOIN qs q JOIN embeddings qe ON qe.vec_id = q.qid),
        |qagg AS (SELECT qid, vec_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM qp GROUP BY qid, vec_id),
        |qsc AS (SELECT qid, vec_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6)
        |            + 0.0 AS score
        |        FROM qagg),
        |exact AS (
        |  SELECT qid, vec_id FROM (
        |    SELECT qid, vec_id,
        |           row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) rn
        |    FROM qsc) WHERE rn <= 10),
        |ranked AS (
        |  SELECT qid, vec_id, rn FROM (
        |    SELECT s.qid, s.vec_id,
        |           row_number() OVER (PARTITION BY s.qid
        |                              ORDER BY s.score DESC, s.vec_id) rn
        |    FROM qsc s
        |    JOIN assign a ON s.vec_id = a.vec_id
        |    JOIN probes4 p ON p.qid = s.qid AND p.cell_id = a.cell_id)
        |  WHERE rn <= 10),
        |hits AS (SELECT r.qid, r.rn FROM ranked r
        |         JOIN exact e ON r.qid = e.qid AND r.vec_id = e.vec_id),
        |perq AS (SELECT qid, COUNT(*)::BIGINT AS n_hit,
        |                SUM(CAST(ROUND(1000000.0 * ln(2.0) / ln(rn + 1.0)) AS BIGINT)) AS dcgm,
        |                MIN(rn) AS minr
        |         FROM hits GROUP BY qid),
        |ne AS (SELECT qid, COUNT(*)::BIGINT AS n_exact FROM exact GROUP BY qid),
        |ser AS (SELECT i FROM generate_series(1, 10) t(i)),
        |idcg AS (SELECT ne.qid,
        |                SUM(CAST(ROUND(1000000.0 * ln(2.0) / ln(i + 1.0)) AS BIGINT)) AS idcgm
        |         FROM ne JOIN ser ON ser.i <= LEAST(ne.n_exact, 10)
        |         GROUP BY ne.qid)
        |SELECT ne.qid, ne.n_exact, COALESCE(p.n_hit, 0)::BIGINT AS n_hit,
        |       ROUND(COALESCE(p.dcgm, 0)::DOUBLE / i.idcgm, 6) + 0.0 AS ndcg,
        |       ROUND(COALESCE(1.0 / p.minr, 0.0), 6) + 0.0 AS mrr
        |FROM ne JOIN idcg i ON ne.qid = i.qid
        |LEFT JOIN perq p ON ne.qid = p.qid
        |ORDER BY ne.qid""".stripMargin,

    // Both rankings via ROW_NUMBER over the quantized scores (score
    // desc, vec_id asc — the TopKAggregator's total order); overlap at
    // each depth d is a prefix self-join; the weight table carries the
    // SAME integer literals the Spark fold uses (RboWeights).
    "q_rbo_rankers" -> {
      val wvals = RboWeights.zipWithIndex
        .map { case (w, i) => s"(${i + 1}, ${w}::BIGINT)" }.mkString(", ")
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
         |           WHERE vec_id IN (${RboQids.mkString(", ")})),
         |p AS (SELECT q.qid, e.vec_id,
         |        unnest(e.embedding)::DOUBLE AS x, unnest(q.qe)::DOUBLE AS y,
         |        unnest(generate_series(1, 64)) AS pos
         |      FROM embeddings e CROSS JOIN q),
         |agg AS (SELECT qid, vec_id,
         |         SUM(x*y) AS dpf, SUM(x*x) AS nxf, SUM(y*y) AS nyf,
         |         SUM(CASE WHEN pos <= 16 THEN x*y ELSE 0 END) AS dpm,
         |         SUM(CASE WHEN pos <= 16 THEN x*x ELSE 0 END) AS nxm,
         |         SUM(CASE WHEN pos <= 16 THEN y*y ELSE 0 END) AS nym
         |        FROM p GROUP BY qid, vec_id),
         |sc AS (SELECT qid, vec_id,
         |        ROUND(dpf / (GREATEST(SQRT(nxf), 1e-12)
         |          * GREATEST(SQRT(nyf), 1e-12)), 6) + 0.0 AS sf,
         |        ROUND(dpm / (GREATEST(SQRT(nxm), 1e-12)
         |          * GREATEST(SQRT(nym), 1e-12)), 6) + 0.0 AS sm
         |       FROM agg),
         |rf AS (SELECT qid, vec_id,
         |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sf DESC, vec_id) AS r
         |       FROM sc),
         |rm AS (SELECT qid, vec_id,
         |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sm DESC, vec_id) AS r
         |       FROM sc),
         |w AS (SELECT * FROM (VALUES $wvals) AS t(d, wt)),
         |ov AS (SELECT a.qid, w.d, w.wt, COUNT(*) AS o
         |       FROM rf a JOIN rm b ON a.qid = b.qid AND a.vec_id = b.vec_id
         |       CROSS JOIN w
         |       WHERE a.r <= w.d AND b.r <= w.d
         |       GROUP BY a.qid, w.d, w.wt),
         |tot AS (SELECT qid, CAST(SUM(wt * o) AS BIGINT) AS rbo_scaled
         |        FROM ov GROUP BY qid)
         |SELECT q.qid, COALESCE(t.rbo_scaled, 0)::BIGINT AS rbo_scaled,
         |       ROUND(COALESCE(t.rbo_scaled, 0) / 25200000000000.0, 6) + 0.0 AS rbo
         |FROM q LEFT JOIN tot t ON q.qid = t.qid
         |ORDER BY q.qid""".stripMargin
    },

    "q_norm_audit" ->
      """WITH ex AS (
        |  SELECT vec_id, label, unnest(embedding)::DOUBLE AS x FROM embeddings),
        |nr AS (
        |  SELECT vec_id, ANY_VALUE(label) AS label,
        |         ROUND(SQRT(SUM(x*x)), 6) + 0.0 AS nrm
        |  FROM ex GROUP BY vec_id)
        |SELECT label::BIGINT AS label, COUNT(*)::BIGINT AS n,
        |       MIN(nrm) + 0.0 AS min_norm, MAX(nrm) + 0.0 AS max_norm,
        |       ROUND(SUM(CAST(ROUND(nrm * 1000000) AS BIGINT))::DOUBLE
        |             / COUNT(*) / 1000000.0, 6) + 0.0 AS mean_norm
        |FROM nr GROUP BY label ORDER BY label""".stripMargin,

    "q10_returns" ->
      """SELECT c_custkey, c_name,
        |       ROUND(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))::DOUBLE / 100, 2) + 0.0 AS revenue,
        |       c_acctbal, n_name
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND l_returnflag = 'R'
        |  AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q4_priority" ->
      """SELECT o_orderpriority, COUNT(*)::BIGINT AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q9_profit" ->
      """SELECT n_name AS nation,
        |  CAST(year(l_shipdate) AS INT) AS o_year,
        |  ROUND(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))::DOUBLE / 100, 2) + 0.0 AS profit
        |FROM lineitem, part, supplier, nation
        |WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
        |  AND s_nationkey = n_nationkey
        |  AND p_name LIKE '%red%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,

    "q11_brand_value" ->
      """WITH v AS (
        |  SELECT p_brand, CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v_c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |per AS (SELECT p_brand, SUM(v_c)::BIGINT AS brand_c
        |        FROM v GROUP BY p_brand),
        |tot AS (SELECT SUM(brand_c)::BIGINT AS total_c FROM per)
        |SELECT p_brand, ROUND(brand_c::DOUBLE / 100, 2) + 0.0 AS value
        |FROM per, tot WHERE brand_c * 25 > total_c
        |ORDER BY value DESC, p_brand""".stripMargin,

    "q12_priority_class" ->
      """SELECT l_returnflag,
        |  SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
        |  SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 0 ELSE 1 END)::BIGINT AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q16_parts" ->
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#2' AND p_size IN (1, 5, 9)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    // The literal Q2 correlated-scalar-subquery form — the oracle
    // proves the engine's agg-plus-join-back rewrite equals it.
    "q2_min_cost_supp" ->
      """WITH link AS (
        |  SELECT l_partkey pk, l_suppkey sk,
        |    MIN(ROUND(l_extendedprice * 100)::BIGINT) AS cost_c
        |  FROM lineitem GROUP BY 1, 2),
        |s AS (
        |  SELECT s_suppkey, s_acctbal, s_name, n_name FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE')
        |SELECT s.s_acctbal, s.s_name, s.n_name, p.p_partkey, p.p_name,
        |  ROUND(l.cost_c / 100.0, 2) + 0.0 AS cost
        |FROM part p
        |JOIN link l ON l.pk = p.p_partkey
        |JOIN s ON s.s_suppkey = l.sk
        |WHERE p.p_type = 'SMALL' AND l.cost_c = (
        |  SELECT MIN(l2.cost_c) FROM link l2
        |  JOIN s s2 ON s2.s_suppkey = l2.sk
        |  WHERE l2.pk = p.p_partkey)
        |ORDER BY s_acctbal DESC, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    // The literal Q20 nested-IN form.
    "q20_surplus_suppliers" ->
      """SELECT s_name, s_acctbal FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN
        |    (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING SUM(CASE WHEN l_shipdate >= '1997-01-01'
        |               AND l_shipdate < '1998-01-01'
        |             THEN ROUND(l_quantity)::BIGINT ELSE 0 END) > 0
        |     AND SUM(ROUND(l_quantity)::BIGINT) >
        |         2 * SUM(CASE WHEN l_shipdate >= '1997-01-01'
        |                   AND l_shipdate < '1998-01-01'
        |                 THEN ROUND(l_quantity)::BIGINT ELSE 0 END))
        |ORDER BY s_name""".stripMargin,

    // The literal Q21 EXISTS / NOT-EXISTS form (numwait counts DISTINCT
    // waiting orders — the engine's per-(order, supplier) pair grain).
    "q21_waiting_suppliers" ->
      """WITH supa AS (
        |  SELECT s_suppkey, s_name FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'AMERICA'),
        |lt AS (
        |  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F')
        |SELECT s_name, COUNT(DISTINCT l1.l_orderkey)::BIGINT AS numwait
        |FROM lt l1 JOIN supa ON supa.s_suppkey = l1.l_suppkey
        |WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (
        |    SELECT 1 FROM lt l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lt l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > l3.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,

    "q_knn_join" ->
      """WITH cents AS (
        |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings
        |  WHERE vec_id < 16),
        |pc AS (
        |  SELECT e.vec_id, c.cent_id,
        |         unnest(e.embedding)::DOUBLE x, unnest(c.cvec)::DOUBLE y
        |  FROM embeddings e CROSS JOIN cents c),
        |pagg AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM pc GROUP BY vec_id, cent_id),
        |psc AS (SELECT vec_id, cent_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |        FROM pagg),
        |assign AS (
        |  SELECT vec_id, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
        |    FROM psc) WHERE rn = 1),
        |pr AS (
        |  SELECT a.vec_id AS src, b.vec_id AS dst
        |  FROM assign a JOIN assign b
        |    ON a.cell_id = b.cell_id AND a.vec_id <> b.vec_id),
        |px AS (
        |  SELECT p.src, p.dst,
        |         unnest(ea.embedding)::DOUBLE x, unnest(eb.embedding)::DOUBLE y
        |  FROM pr p JOIN embeddings ea ON ea.vec_id = p.src
        |            JOIN embeddings eb ON eb.vec_id = p.dst),
        |pxa AS (SELECT src, dst, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |        FROM px GROUP BY src, dst),
        |sc AS (SELECT src, dst,
        |         ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6)
        |           + 0.0 AS score
        |       FROM pxa),
        |r AS (SELECT src, dst, score,
        |             row_number() OVER (PARTITION BY src
        |                                ORDER BY score DESC, dst) AS rn
        |      FROM sc)
        |SELECT src, dst, score FROM r WHERE rn <= 3
        |ORDER BY src, score DESC, dst""".stripMargin,

    "q_paragraph_stats" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, unnest(generate_series(0, CAST(ceil(len(toks)/10.0) AS INT) - 1)) AS idx, toks
        |  FROM t WHERE len(toks) > 0),
        |p AS (
        |  SELECT doc_id, idx,
        |         md5(lower(trim(regexp_replace(
        |           array_to_string(toks[idx*10+1 : idx*10+10], ' '), '\s+', ' ', 'g')))) AS fp
        |  FROM c),
        |k AS (
        |  SELECT doc_id, COUNT(*) AS nk FROM (
        |    SELECT doc_id, idx,
        |           row_number() OVER (PARTITION BY fp ORDER BY doc_id, idx) AS rn
        |    FROM p) WHERE rn = 1 GROUP BY doc_id),
        |x AS (
        |  SELECT t.doc_id,
        |         CAST(CASE WHEN len(t.toks) = 0 THEN 0
        |              ELSE ceil(len(t.toks)/10.0) END AS BIGINT) AS np,
        |         COALESCE(kk.nk, 0)::BIGINT AS nk
        |  FROM t LEFT JOIN k kk USING (doc_id))
        |SELECT d.source, COUNT(*)::BIGINT AS n_docs,
        |       SUM(x.np)::BIGINT AS n_paras,
        |       SUM(x.np - x.nk)::BIGINT AS n_dropped,
        |       ROUND(SUM(x.np - x.nk)::DOUBLE /
        |             GREATEST(SUM(x.np), 1), 4) + 0.0 AS drop_rate
        |FROM x JOIN documents d USING (doc_id)
        |GROUP BY d.source ORDER BY d.source""".stripMargin,

    // Hard-sigmoid GD unrolled: per iteration one p-projection over the
    // quantized features CTE (weights as a one-row CTE), one integer
    // gradient-sum row, one round-6 weight update.
    "q_classifier_train" -> {
      def iter(k: Int): String = {
        val p = k - 1
        s"""g$k AS (
           |  SELECT SUM(CAST(ROUND((p - y) * 0.25 * xq0) AS BIGINT)) AS g0,
           |         SUM(CAST(ROUND((p - y) * 0.25 * xq1) AS BIGINT)) AS g1,
           |         SUM(CAST(ROUND((p - y) * 0.25 * xq2) AS BIGINT)) AS g2,
           |         SUM(CAST(ROUND((p - y) * 0.25 * xq3) AS BIGINT)) AS g3
           |  FROM (
           |    SELECT f.*,
           |           ROUND(LEAST(GREATEST(0.25 * ((w.w0 * xq0 + w.w1 * xq1
           |             + w.w2 * xq2 + w.w3 * xq3) / 1000000.0) + 0.5, 0.0),
           |             1.0), 6) AS p
           |    FROM f CROSS JOIN w${p}c w)),
           |w${k}c AS (
           |  SELECT ROUND(w.w0 - 2.0 * (g.g0 / 1000000.0) / n.n, 6) AS w0,
           |         ROUND(w.w1 - 2.0 * (g.g1 / 1000000.0) / n.n, 6) AS w1,
           |         ROUND(w.w2 - 2.0 * (g.g2 / 1000000.0) / n.n, 6) AS w2,
           |         ROUND(w.w3 - 2.0 * (g.g3 / 1000000.0) / n.n, 6) AS w3
           |  FROM w${p}c w, g$k g, nn n)""".stripMargin
      }
      s"""WITH f AS (
         |  SELECT CAST(1000000 AS BIGINT) AS xq0,
         |         CAST(ROUND(LEAST(nt, 100)::DOUBLE / 100.0 * 1000000.0) AS BIGINT) AS xq1,
         |         CAST(ROUND(se::DOUBLE / ntg * 1000000.0) AS BIGINT) AS xq2,
         |         CAST(ROUND(ss::DOUBLE / ntg * 1000000.0) AS BIGINT) AS xq3,
         |         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
         |  FROM (
         |    SELECT lang, len(toks) AS nt, GREATEST(len(toks), 1)::DOUBLE AS ntg,
         |           len(list_filter(toks, t -> list_contains(
         |             ['the','a','of','and','to','in','is'], t))) AS se,
         |           len(list_filter(toks, t -> list_contains(
         |             ['el','la','de','los','las','y','en'], t))) AS ss
         |    FROM (
         |      SELECT lang, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
         |                   ELSE string_split_regex(trim(lower(text)), '\\s+') END AS toks
         |      FROM documents))),
         |nn AS (SELECT COUNT(*)::DOUBLE AS n FROM f),
         |w0c AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
         |${(1 to 3).map(iter).mkString(",\n")}
         |SELECT 0::BIGINT AS j, w0 + 0.0 AS weight FROM w3c
         |UNION ALL SELECT 1::BIGINT, w1 + 0.0 FROM w3c
         |UNION ALL SELECT 2::BIGINT, w2 + 0.0 FROM w3c
         |UNION ALL SELECT 3::BIGINT, w3 + 0.0 FROM w3c
         |ORDER BY j""".stripMargin
    }
  )

  /** Deterministic messy-URL synthesis shared by the URL queries: five
    * mess variants (casing, default ports, duplicate slashes, userinfo,
    * tracking params, fragments, non-default port) keyed off doc_id so
    * both engines build byte-identical inputs from the fixture.
    */
  private def messyUrl(docId: Column, source: Column): Column = {
    val k = pmod(docId, lit(7)).cast("string")
    val m = pmod(docId, lit(5))
    when(m === 0, concat(lit("HTTP://WWW."), source, lit(".COM:80//docs//"),
        k, lit("?b=2&a=1&utm_campaign=x#top")))
      .when(m === 1, concat(lit("https://www."), source, lit(".com/docs/"),
        k, lit("/")))
      .when(m === 2, concat(lit("Https://user:pw@WWW."), source,
        lit(".com/docs/"), k, lit("?utm_source=feed&z=9&a=1")))
      .when(m === 3, concat(lit("HTTPS://www."), source, lit(".COM:443/docs/"),
        k, lit("?fbclid=abc123")))
      .otherwise(concat(lit("https://www."), source, lit(".com:8080/docs/"),
        k, lit("?a=1&b=2")))
  }

  private val messyUrlSql: String =
    """SELECT doc_id,
      |  CASE doc_id % 5
      |    WHEN 0 THEN 'HTTP://WWW.' || source || '.COM:80//docs//' || (doc_id % 7) || '?b=2&a=1&utm_campaign=x#top'
      |    WHEN 1 THEN 'https://www.' || source || '.com/docs/' || (doc_id % 7) || '/'
      |    WHEN 2 THEN 'Https://user:pw@WWW.' || source || '.com/docs/' || (doc_id % 7) || '?utm_source=feed&z=9&a=1'
      |    WHEN 3 THEN 'HTTPS://www.' || source || '.COM:443/docs/' || (doc_id % 7) || '?fbclid=abc123'
      |    ELSE 'https://www.' || source || '.com:8080/docs/' || (doc_id % 7) || '?a=1&b=2'
      |  END AS url
      |FROM documents""".stripMargin

  /** DuckDB mirror of `UrlFunctions.canonicalizeUrl` over a `u(doc_id,
    * url)` CTE — shared by the two URL oracles.
    */
  private val canonUrlSql: String =
    """c AS (
      |  SELECT doc_id, url,
      |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
      |    lower(regexp_replace(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '^[^@]*@', '')) AS hp,
      |    regexp_replace(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/{2,}', '/', 'g') AS p0,
      |    regexp_extract(url, '^[^#?]*\?([^#]*)', 1) AS qs
      |  FROM u),
      |canon AS (
      |  SELECT doc_id, url,
      |    (CASE WHEN sch = 'http' THEN regexp_replace(hp, ':80$', '')
      |          WHEN sch = 'https' THEN regexp_replace(hp, ':443$', '')
      |          ELSE hp END) AS host,
      |    CASE WHEN sch = '' THEN NULL ELSE
      |      sch || '://' ||
      |      (CASE WHEN sch = 'http' THEN regexp_replace(hp, ':80$', '')
      |            WHEN sch = 'https' THEN regexp_replace(hp, ':443$', '')
      |            ELSE hp END) ||
      |      (CASE WHEN regexp_replace(p0, '/$', '') = '' THEN '/'
      |            ELSE regexp_replace(p0, '/$', '') END) ||
      |      (CASE WHEN q2 <> '' THEN '?' || q2 ELSE '' END)
      |    END AS canon
      |  FROM (
      |    SELECT *, array_to_string(list_sort(list_filter(string_split(qs, '&'),
      |        x -> x <> '' AND NOT regexp_matches(x, '^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_cid|mc_eid)='))), '&') AS q2
      |    FROM c))""".stripMargin

  private def round6Queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Crawl URL canonicalization: five deterministic mess variants per
    // fixture row (casing, default ports, duplicate slashes, userinfo,
    // tracking params, fragments) normalized by the codegen'd
    // regex/array chain in UrlFunctions — per-row scan-speed work, the
    // first dedup key of a web pipeline.
    "q_url_canonical" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", messyUrl($"doc_id", $"source").as("url"))
        .select($"doc_id", $"url",
          UrlFunctions.canonicalizeUrl($"url").as("canon"))
        .orderBy($"doc_id")
    }),

    // URL-level exact dedup over the canonical key: first-seen (min id)
    // wins per group — the cheapest dedup pass a crawl runs before any
    // content hashing. One hash shuffle of (canon, id) pairs. Junk URLs
    // canonicalize to NULL and are EXCLUDED — grouping them would merge
    // every malformed frontier row under one shared key (the failure
    // mode the streaming twin also bypasses).
    "q_url_dedup" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", messyUrl($"doc_id", $"source").as("url"))
        .select($"doc_id", UrlFunctions.canonicalizeUrl($"url").as("canon"))
        .filter($"canon".isNotNull)
        .groupBy($"canon")
        .agg(count(lit(1)).as("n_dupes"), min($"doc_id").as("keep_id"))
        .orderBy($"canon")
    }),

    // Raw-HTML text extraction: the fixture text wrapped into a
    // deterministic page template (script/style elements, comments,
    // entities) and recovered by the codegen'd regexp chain — the
    // crawl-to-text step that feeds every downstream filter. Pure
    // per-row work at scan speed.
    "q_html_extract" -> ((s, dir) => {
      import s.implicits._
      val html = concat(
        lit("<html><head><title>"), $"source",
        lit("</title><style>p { color: red; }</style>" +
          "<script type=\"text/javascript\">var x = 1 < 2;</script>" +
          "</head><body><!-- hidden --><h1>Doc "),
        $"doc_id".cast("string"), lit("</h1><p>"), $"text",
        lit("</p><div>Tom &amp; Jerry &lt;3 &quot;q&#39;&nbsp;end</div>" +
          "</body></html>"))
      spread(s, t(s, dir, "documents"))
        .select($"doc_id", T.extractHtmlText(html).as("clean"))
        .orderBy($"doc_id")
    }),

    // Per-domain corpus signals (the RefinedWeb/FineWeb domain-level
    // view): docs keyed by canonical host → docs, distinct canonical
    // URLs, micro-exact mean quality per domain. The aggregate shuffles
    // (host, canonical URL, quality-micro) tuples — at 100 TB the
    // distinct-count column would fold to a 64-bit hash (or the KMV
    // sketch) before the exchange; domains are web-bounded, so the
    // stats table is small enough to broadcast back.
    "q_domain_stats" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select(messyUrl($"doc_id", $"source").as("url"),
          round(T.qualityScore($"text"), 4).as("q"))
        .select(UrlFunctions.urlHost($"url").as("host"),
          UrlFunctions.canonicalizeUrl($"url").as("canon"), $"q")
        .groupBy($"host")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct($"canon").as("n_urls"),
          sum(round($"q" * 1e4, 0).cast("long")).as("__qs"))
        .select($"host", $"n_docs", $"n_urls",
          (round($"__qs".cast("double") / $"n_docs" / 1e4, 6) + lit(0.0))
            .as("mean_q"))
        .orderBy($"host")
    }),

    // Domain-level gate — the action on q_domain_stats: keep docs whose
    // domain clears a mean-quality floor (spam/SEO domains drop whole).
    // The bounded stats table broadcasts back onto the scan, so the gate
    // itself is a map-side probe; only the stats agg ever shuffles.
    "q_domain_gate" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select($"doc_id", messyUrl($"doc_id", $"source").as("url"),
          round(T.qualityScore($"text"), 4).as("q"))
        .select($"doc_id", UrlFunctions.urlHost($"url").as("host"), $"q")
      val stats = docs.groupBy($"host")
        .agg(count(lit(1)).as("n_docs"),
          sum(round($"q" * 1e4, 0).cast("long")).as("__qs"))
        .select($"host",
          (round($"__qs".cast("double") / $"n_docs" / 1e4, 6) + lit(0.0))
            .as("mean_q"))
      docs.join(broadcast(stats.filter($"mean_q" >= 0.35)), Seq("host"))
        .select($"doc_id", $"host", $"q")
        .orderBy($"doc_id")
    }),

    // The q_curation composition under the quality-aware survivor
    // policy: near-dup clusters keep their max-quality member instead of
    // the greedy lowest-id side. Same stages, same rates — only stage 4's
    // policy differs, so diffing against q_curation isolates exactly the
    // docs the policy saves.
    "q_curation_best" -> ((s, dir) => {
      import s.implicits._
      Curation.curate(spread(s, t(s, dir, "documents")),
          "doc_id", "text", "source",
          rates = Map("src0" -> 0.8, "src1" -> 0.5), defaultRate = 0.6,
          keepBestQuality = true)
        .orderBy($"doc_id")
    }),

    // TPC-H Q6 (forecasting revenue change): one tight filter over the
    // fact scan — every predicate reaches PushedFilters — then a single
    // map-side-combined micro-unit sum; the shuffle carries one partial
    // per partition. Revenue quantized at 1e4 (price 2dp × discount 2dp)
    // so the sum is order-proof integer arithmetic in both engines.
    "q6_revenue" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1996-01-01") &&
          $"l_shipdate" < lit("1997-01-01") &&
          $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
          $"l_quantity" < 24)
        .agg(
          sum(round($"l_extendedprice" * $"l_discount" * 1e4, 0)
            .cast("long")).as("rev_q"),
          count(lit(1)).as("n_items"))
        .select(($"rev_q".cast("double") / 1e4).as("revenue"), $"n_items")
    }),

    // TPC-H Q14 (promotion effect): month-windowed fact scan joined to
    // the broadcast part dimension; promo share from two micro-unit
    // integer sums (exact in both engines), one row out.
    "q14_promo" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1996-09-01") &&
          $"l_shipdate" < lit("1996-10-01"))
      val disc = round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100, 0)
        .cast("long")
      li.join(broadcast(t(s, dir, "part")), $"l_partkey" === $"p_partkey")
        .agg(
          sum(when($"p_type" === "PROMO", disc).otherwise(0L)).as("pq"),
          sum(disc).as("tq"))
        .select(round($"pq".cast("double") / $"tq".cast("double") * 100, 4)
          .as("promo_pct"))
    }),

    // TPC-H Q18 (large-volume customers): the per-order quantity rollup
    // is map-side combined before its one key shuffle; only qualifying
    // orders (a tiny fraction) reach the orders/customer joins, and the
    // final top-100 is a TakeOrderedAndProject, not a global sort.
    // Quantities are integral doubles, so the long cast is exact.
    "q18_large_orders" -> ((s, dir) => {
      import s.implicits._
      val big = t(s, dir, "lineitem")
        .groupBy($"l_orderkey")
        .agg(sum($"l_quantity").cast("long").as("total_qty"))
        .filter($"total_qty" > 250)
      big.join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
          $"o_totalprice", $"total_qty")
        .orderBy($"o_totalprice".desc, $"o_orderdate", $"o_orderkey")
        .limit(100)
    }),

    // TPC-H Q7 (volume shipping between two nations): the 25-row nation
    // aliases broadcast into supplier/customer FIRST, so both dimensions
    // arrive at the fact join already pruned to the two nations (~2/25
    // of their rows — at scale customer is too big to broadcast, and
    // joining it unpruned would shuffle 25× the qualifying rows); the
    // fact⨝orders join is then the only large shuffle. Cents-quantized
    // revenue keeps the per-(pair, year) rollup exact.
    "q7_volume" -> ((s, dir) => {
      import s.implicits._
      val twoNations = t(s, dir, "nation")
        .filter($"n_name".isin("NATION_1", "NATION_2"))
      val supp = t(s, dir, "supplier")
        .join(broadcast(twoNations.select($"n_nationkey".as("sk"),
          $"n_name".as("supp_nation"))), $"s_nationkey" === $"sk")
        .select($"s_suppkey", $"supp_nation")
      val cust = t(s, dir, "customer")
        .join(broadcast(twoNations.select($"n_nationkey".as("ck"),
          $"n_name".as("cust_nation"))), $"c_nationkey" === $"ck")
        .select($"c_custkey", $"cust_nation")
      val li = t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1995-01-01") &&
          $"l_shipdate" < lit("1997-01-01"))
      li.join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .join(supp, $"l_suppkey" === $"s_suppkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .filter($"supp_nation" =!= $"cust_nation")
        .withColumn("l_year", year($"l_shipdate").cast("long"))
        .groupBy($"supp_nation", $"cust_nation", $"l_year")
        .agg(sum(round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100, 0)
          .cast("long")).as("rq"))
        .select($"supp_nation", $"cust_nation", $"l_year",
          ($"rq".cast("double") / 100.0).as("revenue"))
        .orderBy($"supp_nation", $"cust_nation", $"l_year")
    }),

    // TPC-H Q19 (discounted revenue, OR-of-predicate-groups): the part
    // side pre-filters to the three brands (the hand-derived implication
    // of the OR groups, pushable to its scan) and broadcasts; the
    // residual brand×quantity disjunction evaluates at the join. One
    // exact micro-unit sum out.
    "q19_discount" -> ((s, dir) => {
      import s.implicits._
      val parts = t(s, dir, "part")
        .filter($"p_brand".isin("Brand#1", "Brand#2", "Brand#3"))
      t(s, dir, "lineitem")
        .join(broadcast(parts), $"l_partkey" === $"p_partkey")
        .filter(
          ($"p_brand" === "Brand#1" && $"l_quantity" >= 1 && $"l_quantity" <= 11) ||
          ($"p_brand" === "Brand#2" && $"l_quantity" >= 10 && $"l_quantity" <= 20) ||
          ($"p_brand" === "Brand#3" && $"l_quantity" >= 20 && $"l_quantity" <= 30))
        .agg(
          sum(round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100, 0)
            .cast("long")).as("rq"),
          count(lit(1)).as("n_items"))
        .select(($"rq".cast("double") / 100.0).as("revenue"), $"n_items")
    })
  )

  private def round6Oracles: Map[String, String] = Map(

    "q_url_canonical" ->
      s"""WITH u AS ($messyUrlSql),
         |$canonUrlSql
         |SELECT doc_id, url, canon FROM canon ORDER BY doc_id""".stripMargin,

    "q_url_dedup" ->
      s"""WITH u AS ($messyUrlSql),
         |$canonUrlSql
         |SELECT canon, COUNT(*)::BIGINT AS n_dupes,
         |       MIN(doc_id) AS keep_id
         |FROM canon WHERE canon IS NOT NULL
         |GROUP BY canon ORDER BY canon""".stripMargin,

    "q_html_extract" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>' || source ||
        |    '</title><style>p { color: red; }</style>' ||
        |    '<script type="text/javascript">var x = 1 < 2;</script>' ||
        |    '</head><body><!-- hidden --><h1>Doc ' || doc_id ||
        |    '</h1><p>' || text ||
        |    '</p><div>Tom &amp; Jerry &lt;3 &quot;q&#39;&nbsp;end</div>' ||
        |    '</body></html>' AS html
        |  FROM documents),
        |x AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(html,
        |      '(?is)<script\b([^>]*[^/>])?>.*?</script>', ' ', 'g'),
        |      '(?is)<script\b([^>]*[^/>])?>.*$', ' ', 'g'),
        |      '(?is)<style\b([^>]*[^/>])?>.*?</style>', ' ', 'g'),
        |      '(?is)<style\b([^>]*[^/>])?>.*$', ' ', 'g'),
        |      '(?s)<!--.*?-->', ' ', 'g'),
        |      '(?s)<[^>]*>', ' ', 'g') AS t1
        |  FROM h)
        |SELECT doc_id,
        |  trim(regexp_replace(
        |    replace(replace(replace(replace(replace(replace(t1,
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |      '&nbsp;', ' '), '&amp;', '&'),
        |    '\s+', ' ', 'g')) AS clean
        |FROM x ORDER BY doc_id""".stripMargin,

    "q_domain_stats" ->
      s"""WITH u AS ($messyUrlSql),
         |$canonUrlSql,
         |q AS (
         |  SELECT doc_id,
         |    ROUND(LEAST(len(toks)::DOUBLE / 100.0, 1.0) * (0.7 + 0.3 *
         |      len(list_filter(toks, tk -> list_contains(
         |        ['the','a','of','and','to','in','is'], tk)))::DOUBLE
         |      / GREATEST(len(toks)::DOUBLE, 1.0)), 4) AS q
         |  FROM (
         |    SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
         |                   ELSE string_split_regex(trim(text), '\\s+') END AS toks
         |    FROM documents))
         |SELECT cn.host, COUNT(*)::BIGINT AS n_docs,
         |  COUNT(DISTINCT cn.canon)::BIGINT AS n_urls,
         |  ROUND(SUM(CAST(ROUND(q.q * 10000, 0) AS BIGINT))::DOUBLE
         |        / COUNT(*) / 10000.0, 6) + 0.0 AS mean_q
         |FROM canon cn JOIN q USING (doc_id)
         |GROUP BY cn.host ORDER BY cn.host""".stripMargin,

    "q_domain_gate" ->
      s"""WITH u AS ($messyUrlSql),
         |$canonUrlSql,
         |q AS (
         |  SELECT doc_id,
         |    ROUND(LEAST(len(toks)::DOUBLE / 100.0, 1.0) * (0.7 + 0.3 *
         |      len(list_filter(toks, tk -> list_contains(
         |        ['the','a','of','and','to','in','is'], tk)))::DOUBLE
         |      / GREATEST(len(toks)::DOUBLE, 1.0)), 4) AS q
         |  FROM (
         |    SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
         |                   ELSE string_split_regex(trim(text), '\\s+') END AS toks
         |    FROM documents)),
         |d AS (SELECT cn.doc_id, cn.host, q.q FROM canon cn JOIN q USING (doc_id)),
         |st AS (
         |  SELECT host,
         |    ROUND(SUM(CAST(ROUND(q * 10000, 0) AS BIGINT))::DOUBLE
         |          / COUNT(*) / 10000.0, 6) + 0.0 AS mean_q
         |  FROM d GROUP BY host)
         |SELECT d.doc_id, d.host, d.q
         |FROM d JOIN st USING (host)
         |WHERE st.mean_q >= 0.35
         |ORDER BY d.doc_id""".stripMargin,

    // q_curation's CTE chain with stage 4 swapped for cluster-and-keep-
    // best: pairs → undirected edges → recursive reachability → min-label
    // components → per-cluster argmax by (quality DESC, doc_id).
    "q_curation_best" ->
      """WITH RECURSIVE clean AS (
        |  SELECT doc_id, source,
        |    regexp_replace(regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
        |      '\+?[0-9][0-9()\s\-]{6,}[0-9]', '<PHONE>', 'g') AS txt
        |  FROM documents),
        |tk AS (
        |  SELECT doc_id, source, txt,
        |         CASE WHEN trim(txt) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(txt), '\s+') END AS toks
        |  FROM clean),
        |gt AS (
        |  SELECT *, CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[])
        |                 ELSE list_transform(generate_series(1, len(toks)-1),
        |                        i -> toks[i] || ' ' || toks[i+1]) END AS g2
        |  FROM tk),
        |q AS (
        |  SELECT doc_id, source, txt, toks,
        |    ROUND(LEAST(len(toks)::DOUBLE/100.0, 1.0) * (0.7 + 0.3 *
        |      len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in','is'], t)))::DOUBLE
        |      / GREATEST(len(toks)::DOUBLE, 1.0)), 4) AS quality,
        |    ROUND(CASE WHEN len(g2) = 0 THEN 0.0
        |          ELSE 1.0 - len(list_distinct(g2))::DOUBLE / len(g2)::DOUBLE END, 4) AS dup2
        |  FROM gt),
        |filtered AS (SELECT * FROM q WHERE quality >= 0.2 AND dup2 <= 0.5),
        |keepers AS (
        |  SELECT MIN(doc_id) AS doc_id
        |  FROM filtered
        |  GROUP BY md5(lower(trim(regexp_replace(txt, '\s+', ' ', 'g'))))),
        |uniq AS (SELECT f.* FROM filtered f JOIN keepers USING (doc_id)),
        |s AS (
        |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks)-1),
        |           i -> toks[i] || ' ' || toks[i+1])) AS sh
        |  FROM uniq WHERE len(toks) >= 2),
        |sig AS (
        |  SELECT doc_id, sh,
        |         list_transform(generate_series(0, 15), i ->
        |           list_min(list_transform(sh, x ->
        |             ('0x'||substr(md5(i::VARCHAR||':'||x), 1, 15))::BIGINT))) AS sig
        |  FROM s WHERE len(sh) > 0),
        |bands AS (
        |  SELECT doc_id, band_idx,
        |         md5(array_to_string(sig[band_idx*4+1 : band_idx*4+4], ',')) AS bh
        |  FROM (SELECT doc_id, sig, unnest(generate_series(0, 3)) AS band_idx FROM sig)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id da, b.doc_id db
        |  FROM bands a JOIN bands b
        |    ON a.band_idx = b.band_idx AND a.bh = b.bh AND a.doc_id < b.doc_id),
        |p AS (
        |  SELECT da, db FROM (
        |    SELECT da, db,
        |           len(list_intersect(x.sh, y.sh))::DOUBLE /
        |             (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) AS jac
        |    FROM cand JOIN s x ON da = x.doc_id JOIN s y ON db = y.doc_id)
        |  WHERE jac >= 0.2),
        |e AS (SELECT da AS a, db AS b FROM p UNION SELECT db, da FROM p),
        |r AS (
        |  SELECT a AS node, b AS reach FROM e
        |  UNION
        |  SELECT r.node, e.b FROM r JOIN e ON r.reach = e.a),
        |comp AS (
        |  SELECT node, LEAST(node, MIN(reach)) AS comp FROM r GROUP BY node),
        |win AS (
        |  SELECT doc_id FROM (
        |    SELECT u.doc_id,
        |           row_number() OVER (PARTITION BY c.comp
        |                              ORDER BY u.quality DESC, u.doc_id) AS rn
        |    FROM comp c JOIN uniq u ON c.node = u.doc_id) WHERE rn = 1),
        |final AS (
        |  SELECT u.* FROM uniq u LEFT JOIN comp c ON u.doc_id = c.node
        |  WHERE c.node IS NULL OR u.doc_id IN (SELECT doc_id FROM win))
        |SELECT doc_id, source, quality
        |FROM final
        |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 1000000 <
        |      (CASE source WHEN 'src0' THEN 0.8 WHEN 'src1' THEN 0.5 ELSE 0.6 END) * 1000000.0
        |ORDER BY doc_id""".stripMargin,

    "q6_revenue" ->
      """SELECT
        |  (SUM(CAST(ROUND(l_extendedprice * l_discount * 10000, 0) AS BIGINT))::DOUBLE
        |     / 10000.0) AS revenue,
        |  COUNT(*)::BIGINT AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q14_promo" ->
      """WITH j AS (
        |  SELECT p.p_type,
        |         CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) * 100, 0) AS BIGINT) AS disc
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
        |    AND l.l_shipdate < TIMESTAMP '1996-10-01')
        |SELECT ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN disc ELSE 0 END)::DOUBLE
        |             / SUM(disc)::DOUBLE * 100, 4) AS promo_pct
        |FROM j""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
        |SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
        |       o.o_totalprice, b.total_qty
        |FROM big b
        |JOIN orders o ON b.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
        |LIMIT 100""".stripMargin,

    "q7_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       year(l.l_shipdate)::BIGINT AS l_year,
        |       (SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) * 100, 0)
        |                 AS BIGINT))::DOUBLE / 100.0) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l.l_shipdate < TIMESTAMP '1997-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q19_discount" ->
      """SELECT
        |  (SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100, 0)
        |            AS BIGINT))::DOUBLE / 100.0) AS revenue,
        |  COUNT(*)::BIGINT AS n_items
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11)
        |   OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20)
        |   OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin
  )

  // ================================== round 7: remaining TPC-H (adapted)
  // The fixture schema has no partsupp table and no comment / shipmode /
  // commitdate columns, so Q2/Q4/Q9/Q11/Q12/Q16/Q20/Q21 are not directly
  // expressible; the five below keep each remaining query's DISTINCTIVE
  // plan shape (multi-region market share, outer-join count distribution,
  // view+argmax, correlated-average anti-filter, NOT EXISTS + scalar
  // subquery) on the columns that do exist.

  private def round7Queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q8 (national market share): region→nation prunes customer
    // BEFORE the fact join (same broadcast-first discipline as Q7); the
    // PROMO part filter broadcasts; one (year) rollup with two exact
    // cents sums, share decided on the quantized ratio.
    "q8_market_share" -> ((s, dir) => {
      import s.implicits._
      val asiaN = t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region").filter($"r_name" === "ASIA")),
          $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey".as("ck"))
      val cust = t(s, dir, "customer")
        .join(broadcast(asiaN), $"c_nationkey" === $"ck")
        .select($"c_custkey")
      val supp = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .select($"n_nationkey".as("sk"), $"n_name".as("supp_nation"))),
          $"s_nationkey" === $"sk")
        .select($"s_suppkey", $"supp_nation")
      val ord = t(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1995-01-01") &&
          $"o_orderdate" < lit("1997-01-01"))
      val cents = round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100, 0)
        .cast("long")
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").filter($"p_type" === "PROMO")),
          $"l_partkey" === $"p_partkey")
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(supp, $"l_suppkey" === $"s_suppkey")
        .withColumn("o_year", year($"o_orderdate").cast("long"))
        .groupBy($"o_year")
        .agg(
          sum(when($"supp_nation" === "NATION_3", cents).otherwise(0L)).as("nq"),
          sum(cents).as("tq"))
        .select($"o_year",
          score6($"nq".cast("double") / $"tq".cast("double")).as("mkt_share"))
        .orderBy($"o_year")
    }),

    // TPC-H Q13 (customer order-count distribution): LEFT OUTER join so
    // zero-order customers survive with count 0, then a second (tiny:
    // ≤ max orders/customer keys) rollup of the counts. Both aggregates
    // are map-side combinable; all values integral.
    "q13_cust_dist" -> ((s, dir) => {
      import s.implicits._
      val ord = t(s, dir, "orders")
        .filter($"o_orderpriority" =!= "4-NOT SPECIFIED")
        .select($"o_custkey", $"o_orderkey")
      t(s, dir, "customer")
        .join(ord, $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("c_count"))
        .groupBy($"c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy($"custdist".desc, $"c_count".desc)
    }),

    // TPC-H Q15 (top supplier): the quarter-windowed per-supplier revenue
    // rollup (exact cents longs) plays the CTE/view role; the argmax is a
    // 1-row broadcast joined back — no second scan of lineitem and no
    // window over the full rollup. Ties (possible on quantized cents)
    // all surface, as in the spec's `revenue = (SELECT MAX(...))`.
    "q15_top_supplier" -> ((s, dir) => {
      import s.implicits._
      val rev = t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1996-01-01") &&
          $"l_shipdate" < lit("1996-04-01"))
        .groupBy($"l_suppkey")
        .agg(sum(round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100, 0)
          .cast("long")).as("rq"))
      val top = rev.agg(max($"rq").as("max_rq"))
      rev.join(broadcast(top), $"rq" === $"max_rq")
        .join(t(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
        .select($"s_suppkey", $"s_name",
          ($"rq".cast("double") / 100.0).as("total_revenue"))
        .orderBy($"s_suppkey")
    }),

    // TPC-H Q17 (small-quantity revenue): the correlated per-part average
    // becomes a grouped rollup joined back to the same scan. The filter
    // `qty < 0.2 * avg(qty)` is decided INTEGER-exactly as 5·n·qty <
    // sum·1 (quantities are integral) so no engine's double division can
    // flip a boundary row; one exact cents sum out.
    "q17_small_qty" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .filter($"p_brand" === "Brand#5" && $"p_size" <= 10)),
          $"l_partkey" === $"p_partkey")
        .select($"l_partkey", $"l_quantity", $"l_extendedprice")
      val avgQ = li.groupBy($"l_partkey".as("ap"))
        .agg(sum($"l_quantity".cast("long")).as("qsum"),
          count(lit(1)).as("qn"))
      li.join(broadcast(avgQ), $"l_partkey" === $"ap")
        .filter($"l_quantity".cast("long") * lit(5L) * $"qn" < $"qsum")
        .agg(
          sum(round($"l_extendedprice" * 100, 0).cast("long")).as("cq"),
          count(lit(1)).as("n_items"))
        .select(score4($"cq".cast("double") / 700.0).as("avg_yearly"),
          $"n_items")
    }),

    // TPC-H Q22 (global sales opportunity): rich-but-idle customers.
    // The positive-balance average is a 1-row broadcast; `acctbal > avg`
    // is decided integer-exactly as cents·n > sum_cents; "no recent
    // order" (the fixture's order coverage is dense, so the spec's
    // never-ordered reads empty — lapsed-since-2000 keeps the NOT EXISTS
    // non-vacuous at every SF) is a LEFT ANTI join on the date-pruned
    // orders scan (at scale: only o_custkey of the pruned rows shuffles).
    // Per-nation rollup of exact cents.
    "q22_idle_customers" -> ((s, dir) => {
      import s.implicits._
      val odd = t(s, dir, "customer")
        .filter($"c_nationkey".isin(1, 3, 5, 7, 9, 11, 13))
        .select($"c_custkey", $"c_nationkey",
          round($"c_acctbal" * 100, 0).cast("long").as("bal_c"))
      val stats = odd.filter($"bal_c" > 0L)
        .agg(sum($"bal_c").as("bal_sum"), count(lit(1)).as("bal_n"))
      odd.crossJoin(broadcast(stats))
        .filter($"bal_c" * $"bal_n" > $"bal_sum")
        .join(t(s, dir, "orders")
          .filter($"o_orderdate" >= lit("2000-01-01")).select($"o_custkey"),
          $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("numcust"),
          sum($"bal_c").as("tb"))
        .select($"c_nationkey", $"numcust",
          ($"tb".cast("double") / 100.0).as("totacctbal"))
        .orderBy($"c_nationkey")
    }),

    // SFT chat-template rendering + loss-mask span (SftPrep.renderSft):
    // pure narrow map over the corpus — no shuffle; the assistant char
    // span is what a trainer masks loss outside of.
    "q_sft_render" -> ((s, dir) => {
      import s.implicits._
      SftPrep.renderSft(t(s, dir, "documents"), "doc_id", "text")
        .orderBy($"doc_id")
    }),

    // DPO preference pairs (SftPrep.prefPairs): per-(lang, source)
    // chosen/rejected by integer micro-unit lexical diversity; one
    // map-side-combinable struct min/max agg — NOT a per-group window,
    // which would serialize 10⁹-doc groups at corpus scale.
    "q_pref_pairs" -> ((s, dir) => {
      import s.implicits._
      SftPrep.prefPairs(t(s, dir, "documents"), "doc_id", "text",
        Seq("lang", "source"))
        .orderBy($"lang", $"source")
    }),

    // Skip-gram pair counts (SftPrep.skipgramPairs): pairs generated per
    // row with array HOFs (flatten∘transform) — no position self-join;
    // the only shuffle is the map-side-combined pair count.
    "q_skipgram_pairs" -> ((s, dir) =>
      SftPrep.skipgramPairs(spread(s, t(s, dir, "documents")), "text")),

    // Negative-sampling table (SftPrep.negSamplingTable): top-100
    // unigrams, count^0.75 micro-unit weights via the correctly-rounded
    // sqrt(c·sqrt c) form, cumulative sum windowed over the 100 rows
    // only (post-TakeOrdered).
    "q_neg_table" -> ((s, dir) =>
      SftPrep.negSamplingTable(spread(s, t(s, dir, "documents")), "text")),

    // Fuzzy record linkage (Mining.blockedBestMatch — the library
    // operator carrying the hot-block cap discipline): customer names
    // perturbed by a seeded md5-parity edit (swap or drop of the
    // trailing chars), then blocked on the UNPERTURBED name prefix
    // (≤100-member blocks by construction: the 7-digit block fixes all
    // but the last 2 id digits, and the edit only touches the final two
    // chars, so a record and its true match always share a block),
    // scored with the native round-6 JaroWinkler kernel, resolved per
    // dirty record by a map-side-combinable struct argmax — no window,
    // no all-pairs. Block width is THE candidate-count knob: 6 digits
    // (1000-member blocks) benched 30.7 s at sf0.1 vs ~3 s at 7 —
    // linear in block size, as blocking should be. Fixture blocks sit
    // far under DefaultMaxBlock, so no row is capped (the oracle's
    // uncapped join replays identically); MiningSpec pins the
    // capped/flagged route on a hot-block fixture.
    "q_jaro_linkage" -> ((s, dir) => {
      import s.implicits._
      val n = t(s, dir, "customer")
        .select($"c_custkey".as("cid"), $"c_name".as("name"))
      val ln = length($"name")
      val dirtyName = when(ascii(substring(md5($"name"), 1, 1)) % 2 === 0,
        concat($"name".substr(lit(1), ln - 2),
          $"name".substr(ln, lit(1)),
          $"name".substr(ln - 1, lit(1))))
        .otherwise($"name".substr(lit(1), ln - 1))
      val d = n.select($"cid".as("dirty_id"), dirtyName.as("dirty"),
        substring($"name", 10, 7).as("blk"))
      val c = n.select($"cid".as("cand_id"), $"name",
        substring($"name", 10, 7).as("blk"))
      Mining.blockedBestMatch(d, "dirty_id", "dirty", c, "cand_id", "name",
          "blk", minScore = 0.9)
        .select($"dirty_id", $"best_id", $"best_jw")
        .orderBy($"dirty_id")
    }),

    // EWMA deviation-band anomaly detection (operators/Ewma): integer
    // recurrence s=(3s+x)//4 replayed bit-exactly by the oracle's
    // recursive CTE; engine side is one key repartition + secondary sort
    // + O(1)-state per-partition fold — no window, no group buffering.
    "q_ewma_anomaly" -> ((s, dir) => {
      import s.implicits._
      Ewma.anomalies(t(s, dir, "events"), "user_id", "event_id", "ts",
        "value").toDF().orderBy($"user_id", $"rn")
    }),

    // End-to-end SFT data production: curation survivors (same stage
    // order + rates as q_curation, carrying their redacted text) →
    // chat-template render with loss-mask spans → sequence packing into
    // 256-token shards per source. The COMPOSITION is the contract:
    // every stage has its own oracle row; this one checks the pipeline
    // a training run would actually ship.
    "q_sft_pipeline" -> ((s, dir) => {
      import s.implicits._
      val survivors = Curation.curate(spread(s, t(s, dir, "documents")),
        "doc_id", "text", "source",
        rates = Map("src0" -> 0.8, "src1" -> 0.5), defaultRate = 0.6,
        keepText = true)
      val rendered = SftPrep.renderSft(survivors, "doc_id", "text_clean")
        .join(survivors.select($"doc_id", $"source"), "doc_id")
        .withColumn("n_tokens", $"n_user_tokens" + $"n_asst_tokens")
      Packing.packSequences(rendered, Seq($"source"), $"doc_id",
          $"n_tokens", 256)
        .select($"doc_id", $"source", $"n_tokens", $"seq_idx",
          $"seq_offset", $"asst_start", $"asst_end",
          length($"rendered").cast("long").as("render_len"))
        .orderBy($"doc_id")
    }),

    // Token-BUDGET mixture sampling (Sampling.tokenBudgetSample): fill
    // each source's token budget in seeded-hash order — two-phase
    // (bucket stats broadcast, boundary-bucket-only window) so no
    // stratum ever serializes onto one reducer; the oracle replays the
    // same selection as one straight window (identical by construction).
    "q_token_budget" -> ((s, dir) => {
      import s.implicits._
      val nTok = size(split($"text", " ")).cast("long")
      Sampling.tokenBudgetSample(t(s, dir, "documents"), $"source",
          $"doc_id", nTok, Map("src0" -> 3000L, "src1" -> 1500L), 2500L)
        .select($"doc_id", $"source", nTok.as("n_tokens"))
        .orderBy($"doc_id")
    }),

    // Per-source score calibration: rank-normalize a raw per-doc score
    // into source-relative quartiles — the cross-source comparability
    // step before any global quality gate (a 0.6 from a clean source and
    // a 0.6 from a spammy one mean different things). Boundaries come
    // from the mergeable KLL sketch (exact below capacity, which covers
    // every fixture SF; quantile_disc semantics), broadcast back so
    // bucket assignment is a scan-speed map — the corpus never sorts.
    "q_quality_calibrate" -> ((s, dir) => {
      import s.implicits._
      val sketch = udaf(
        new QuantileSketch.KllQuantilesAgg(8192, Seq("0.25", "0.5", "0.75")),
        org.apache.spark.sql.Encoders.scalaDouble)
      val scored = t(s, dir, "documents")
        .select($"doc_id", $"source",
          SftPrep.diversityScore($"text").as("rq"))
      val bounds = scored.groupBy($"source")
        .agg(sketch($"rq".cast("double")).as("qv"))
        .select($"source", element_at($"qv", 1).cast("long").as("b25"),
          element_at($"qv", 2).cast("long").as("b50"),
          element_at($"qv", 3).cast("long").as("b75"))
      scored.join(broadcast(bounds), "source")
        .withColumn("bucket",
          when($"rq" <= $"b25", 0L).when($"rq" <= $"b50", 1L)
            .when($"rq" <= $"b75", 2L).otherwise(3L))
        .groupBy($"source", $"bucket")
        .agg(count(lit(1)).as("n"), min($"rq").as("min_rq"),
          max($"rq").as("max_rq"))
        .orderBy($"source", $"bucket")
    }),

    // Unigram-LM (SentencePiece-style) tokenizer (operators/UnigramLm +
    // the UnigramSegment Viterbi kernel): corpus-derived piece vocab
    // (one map-side piece count, bounded top-200 → driver literal) and
    // zero-shuffle DP segmentation of the top-100 words; the oracle
    // re-derives the vocab and replays the DP by exhaustive cover
    // enumeration + min(struct(cost, n, seg)).
    "q_unigram_segment" -> ((s, dir) => {
      import s.implicits._
      UnigramLm.segmentTopWords(spread(s, t(s, dir, "documents")), "text")
        .orderBy($"w_cnt".desc, $"word")
    }),

    // HITS hubs/authorities (GraphOps.hits) on the bipartite
    // user→event_type interaction graph: integer micro-unit L∞
    // normalization per half-step (driver-scalar max, one fixed division
    // association) so the oracle's unrolled CTEs replay every round
    // bit-for-bit; per round two key joins + map-side-combined sums.
    "q_hits" -> ((s, dir) => {
      import s.implicits._
      val (hubs, auths) = GraphOps.hits(
        t(s, dir, "events").select($"user_id", $"event_type"),
        "user_id", "event_type")
      hubs.select(lit("hub").as("side"), $"u".cast("string").as("node"),
          $"h_micro".as("score"))
        .unionByName(auths.select(lit("auth").as("side"),
          $"t".cast("string").as("node"), $"a_micro".as("score")))
        .orderBy($"side", $"node")
    }),

    // Deterministic range-sharded layout (Layout.rangeShards +
    // rangeManifest): exact-quantile boundaries (KLL, exact below
    // capacity) instead of repartitionByRange's run-dependent reservoir
    // sampling; assignment is a broadcast-literal scan-speed map and the
    // manifest certifies disjoint shard ranges.
    "q_range_layout" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "orders")
        .select(round($"o_totalprice" * 100, 0).cast("long").as("cents"))
      val (sharded, _) = Layout.rangeShards(d, "cents", 8)
      Layout.rangeManifest(sharded, "cents")
    }),

    // Lexical drift (Mining.lexicalDrift): per-source add-1-smoothed
    // unigram KL(new‖old) over the old snapshot's bounded vocab —
    // per-word KL terms quantize to nano units INDEPENDENTLY, so the
    // per-source sum is an exact integer reduction (summation order
    // can't move the total). The embedding-free drift early warning.
    "q_lexical_drift" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      Mining.lexicalDrift(d.filter($"doc_id" % 2 === 0),
          d.filter($"doc_id" % 2 === 1), "source", "text")
        .orderBy($"source")
    }),

    // Inter-arrival burstiness per user: integer second gaps, variance
    // from DECIMAL-exact (n·Σg² − (Σg)²) so no 64-bit overflow at any
    // history length (the q_standardize ADVICE applied preemptively),
    // σ via correctly-rounded sqrt, (σ−μ)/(σ+μ) quantized round-6.
    "q_interarrival" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"tsu", $"event_id")
      val g = t(s, dir, "events")
        .select($"user_id", $"event_id", unix_micros($"ts").as("tsu"))
        .withColumn("prev", lag($"tsu", 1).over(w))
        .filter($"prev".isNotNull)
        // `div`, not `/`: Column `/` is DOUBLE division, and a quotient
        // landing an ulp under an integer would truncate differently
        // than the oracle's integer `//`
        .select($"user_id", expr("(tsu - prev) div 1000000").as("g"))
      val agg = g.groupBy($"user_id").agg(
        count(lit(1)).as("n"), sum($"g").as("s"),
        sum($"g".cast("decimal(19,0)") * $"g".cast("decimal(19,0)")).as("ss"))
        .filter($"n" >= 2)
      val mu = $"s".cast("double") / $"n"
      val varD = ($"n".cast("decimal(38,0)") * $"ss" -
        $"s".cast("decimal(38,0)") * $"s".cast("decimal(38,0)"))
        .cast("double") / ($"n" * $"n").cast("double")
      val sigma = sqrt(varD)
      agg.select($"user_id", $"n".as("n_gaps"),
          score4(mu).as("mean_gap_s"),
          when($"s" === 0L, lit(0.0))
            .otherwise(score6((sigma - mu) / (sigma + mu))).as("burstiness"))
        .orderBy($"user_id")
    }),

    // In-batch negatives for contrastive training: trainer shards →
    // 16-doc batches → each anchor pairs with the next `off` ∈ {1,2}
    // docs of its OWN batch (wraparound), the standard in-batch
    // sampling that makes contrastive training O(batch) not O(corpus).
    // Deterministic (hash-ordered batches), no window beyond the
    // trainerShards rank; the batch-size join keys on (shard, batch) —
    // bounded fan-in of 16.
    "q_inbatch_negatives" -> ((s, dir) => {
      import s.implicits._
      val sh = Packing.trainerShards(t(s, dir, "documents"), $"doc_id",
          nShards = 8, epoch = 1)
        .select($"shard", expr("(seq - 1) div 16").as("batch_id"),
          pmod($"seq" - 1, lit(16L)).as("pos"), $"doc_id")
      val sz = sh.groupBy($"shard", $"batch_id")
        .agg(count(lit(1)).as("bsize"))
      val anchors = sh
        .join(sz, Seq("shard", "batch_id"))
        .select($"shard", $"batch_id", $"pos", $"bsize",
          $"doc_id".as("anchor_id"))
        .withColumn("off", explode(typedLit(Seq(1L, 2L))))
        .filter($"off" < $"bsize")
        .withColumn("neg_pos", pmod($"pos" + $"off", $"bsize"))
      anchors.join(sh.select($"shard", $"batch_id",
          $"pos".as("neg_pos"), $"doc_id".as("neg_id")),
          Seq("shard", "batch_id", "neg_pos"))
        .select($"anchor_id", $"off", $"neg_id", $"shard", $"batch_id")
        .orderBy($"anchor_id", $"off")
    }),

    // Linear multi-touch attribution: each purchase's cents spread
    // equally over the user's click/view touches in the 7-day lookback
    // (floor division — exact integers, remainder unattributed by
    // contract); untouched purchases drop (inner interval join). The
    // join is user-equi + time-range — per-user bounded, the asof-join
    // family's shape, never a cross join.
    "q_attribution" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val p = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("pid"),
          unix_micros($"ts").as("pts"),
          round($"value" * 100, 0).cast("long").as("cents"))
      val tc = ev.filter($"event_type".isin("click", "view"))
        .select($"user_id", unix_micros($"ts").as("tts"),
          $"event_type".as("ttype"))
      val j = p.join(tc, p("user_id") === tc("user_id") &&
        $"tts" < $"pts" && $"tts" >= $"pts" - lit(7L * 86400L * 1000000L))
      val perType = j.groupBy($"pid", $"cents", $"ttype")
        .agg(count(lit(1)).as("nt"))
      val perPurchase = perType.groupBy($"pid".as("pid2"))
        .agg(sum($"nt").as("n"))
      perType.join(perPurchase, $"pid" === $"pid2")
        .withColumn("credit", expr("cents * nt div n"))
        .groupBy($"ttype".as("event_type"))
        .agg(countDistinct($"pid").as("n_conversions"),
          sum($"credit").as("ac"))
        .select($"event_type", $"n_conversions",
          ($"ac".cast("double") / 100.0).as("attributed"))
        .orderBy($"event_type")
    }),

    // Unicode-script detection — the multilingual routing step ahead of
    // per-script tokenizers/filters. The (ASCII) fixture grafts
    // Cyrillic/Han/Greek suffixes (the q_unicode_clean discipline) so
    // script classes are genuinely exercised; counts via codepoint-class
    // strips (Java \p{IsX} ≡ RE2 \p{X}), dominant script by strict
    // comparisons with a fixed precedence — scan-speed, zero shuffle.
    "q_script_mix" -> ((s, dir) => {
      import s.implicits._
      val synth = concat($"text",
        when($"doc_id" % 4 === 1, lit(" привет мир"))
          .when($"doc_id" % 4 === 2, lit(" 你好世界"))
          .when($"doc_id" % 4 === 3, lit(" γεια σου"))
          .otherwise(lit("")))
      def cnt(cls: String) = (length(synth) -
        length(regexp_replace(synth, cls, ""))).cast("long")
      val (nl, nc, nh, ng) = (cnt("[A-Za-z]"), cnt("\\p{IsCyrillic}"),
        cnt("\\p{IsHan}"), cnt("\\p{IsGreek}"))
      t(s, dir, "documents")
        .select($"doc_id", nl.as("n_latin"), nc.as("n_cyr"),
          nh.as("n_han"), ng.as("n_greek"))
        .withColumn("script",
          when($"n_cyr" > $"n_latin", "cyrillic")
            .when($"n_han" > $"n_latin", "han")
            .when($"n_greek" > $"n_latin", "greek")
            .otherwise("latin"))
        .orderBy($"doc_id")
    })
  )

  private def round7Oracles: Map[String, String] = Map(

    "q8_market_share" ->
      """SELECT year(o.o_orderdate)::BIGINT AS o_year,
        |  ROUND(
        |    SUM(CASE WHEN n1.n_name = 'NATION_3'
        |             THEN CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) * 100, 0) AS BIGINT)
        |             ELSE 0 END)::DOUBLE /
        |    SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) * 100, 0) AS BIGINT))::DOUBLE,
        |    6) + 0.0 AS mkt_share
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |JOIN region r ON n2.n_regionkey = r.r_regionkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |WHERE p.p_type = 'PROMO' AND r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q13_cust_dist" ->
      """SELECT c_count, COUNT(*)::BIGINT AS custdist FROM (
        |  SELECT c.c_custkey, COUNT(o.o_orderkey)::BIGINT AS c_count
        |  FROM customer c
        |  LEFT OUTER JOIN orders o
        |    ON c.c_custkey = o.o_custkey
        |   AND o.o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY c.c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |         SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100, 0)
        |             AS BIGINT)) AS rq
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s.s_suppkey, s.s_name, (r.rq::DOUBLE / 100.0) AS total_revenue
        |FROM revenue r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        |WHERE r.rq = (SELECT MAX(rq) FROM revenue)
        |ORDER BY s.s_suppkey""".stripMargin,

    "q17_small_qty" ->
      """WITH li AS (
        |  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_brand = 'Brand#5' AND p.p_size <= 10),
        |a AS (
        |  SELECT l_partkey AS ap, SUM(l_quantity::BIGINT) AS qsum,
        |         COUNT(*)::BIGINT AS qn
        |  FROM li GROUP BY l_partkey)
        |SELECT
        |  ROUND(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT))::DOUBLE
        |        / 700.0, 4) + 0.0 AS avg_yearly,
        |  COUNT(*)::BIGINT AS n_items
        |FROM li l JOIN a ON l.l_partkey = a.ap
        |WHERE l.l_quantity::BIGINT * 5 * a.qn < a.qsum""".stripMargin,

    "q22_idle_customers" ->
      """WITH odd AS (
        |  SELECT c_custkey, c_nationkey,
        |         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_c
        |  FROM customer
        |  WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
        |st AS (
        |  SELECT SUM(bal_c) AS bal_sum, COUNT(*)::BIGINT AS bal_n
        |  FROM odd WHERE bal_c > 0)
        |SELECT o.c_nationkey, COUNT(*)::BIGINT AS numcust,
        |       (SUM(o.bal_c)::DOUBLE / 100.0) AS totacctbal
        |FROM odd o, st
        |WHERE o.bal_c * st.bal_n > st.bal_sum
        |  AND NOT EXISTS (SELECT 1 FROM orders r WHERE r.o_custkey = o.c_custkey
        |                  AND r.o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY o.c_nationkey ORDER BY o.c_nationkey""".stripMargin,

    "q_sft_render" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |p AS (
        |  SELECT doc_id, ts,
        |         array_to_string(ts[1:12], ' ') AS u,
        |         array_to_string(ts[13:62], ' ') AS a
        |  FROM tk WHERE len(ts) >= 16),
        |r AS (
        |  SELECT doc_id, ts, a,
        |         e'<|system|>\nYou are a helpful assistant.\n<|user|>\n'
        |           || u || e'\n<|assistant|>\n' AS prefix
        |  FROM p)
        |SELECT doc_id,
        |  LEAST(len(ts), 12)::BIGINT AS n_user_tokens,
        |  LEAST(len(ts) - 12, 50)::BIGINT AS n_asst_tokens,
        |  prefix || a || e'\n<|end|>' AS rendered,
        |  length(prefix)::BIGINT AS asst_start,
        |  (length(prefix) + length(a))::BIGINT AS asst_end
        |FROM r ORDER BY doc_id""".stripMargin,

    "q_pref_pairs" ->
      """WITH sc AS (
        |  SELECT lang, source, doc_id AS pid,
        |         (len(list_distinct(string_split(text, ' ')))::BIGINT * 1000000)
        |           // len(string_split(text, ' '))::BIGINT AS rq
        |  FROM documents),
        |r AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY lang, source
        |                       ORDER BY rq DESC, pid) AS rc,
        |    ROW_NUMBER() OVER (PARTITION BY lang, source
        |                       ORDER BY rq ASC, pid) AS rr
        |  FROM sc)
        |SELECT lang, source,
        |  MAX(CASE WHEN rc = 1 THEN pid END) AS chosen_id,
        |  MAX(CASE WHEN rr = 1 THEN pid END) AS rejected_id,
        |  (MAX(CASE WHEN rc = 1 THEN rq END)
        |   - MAX(CASE WHEN rr = 1 THEN rq END)) AS margin
        |FROM r GROUP BY 1, 2
        |HAVING margin > 0
        |ORDER BY 1, 2""".stripMargin,

    "q_skipgram_pairs" ->
      """WITH tk AS (
        |  SELECT string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) > 1),
        |px AS (
        |  SELECT ts, unnest(generate_series(1, len(ts))) AS p FROM tk),
        |pr AS (
        |  SELECT ts[p] AS center, ts[p + o.o] AS context
        |  FROM px CROSS JOIN (VALUES (1), (2)) o(o) WHERE p + o.o <= len(ts)
        |  UNION ALL
        |  SELECT ts[p + o.o] AS center, ts[p] AS context
        |  FROM px CROSS JOIN (VALUES (1), (2)) o(o) WHERE p + o.o <= len(ts))
        |SELECT center, context, COUNT(*)::BIGINT AS cnt
        |FROM pr GROUP BY 1, 2
        |ORDER BY cnt DESC, center, context LIMIT 50""".stripMargin,

    "q_neg_table" ->
      """WITH w AS (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        |c AS (
        |  SELECT word, COUNT(*)::BIGINT AS cnt FROM w
        |  WHERE word <> '' GROUP BY word),
        |top AS (
        |  SELECT word, cnt,
        |         CAST(ROUND(SQRT(cnt::DOUBLE * SQRT(cnt::DOUBLE)) * 1000000, 0)
        |              AS BIGINT) AS wq
        |  FROM c ORDER BY cnt DESC, word LIMIT 100)
        |SELECT word, cnt, wq,
        |       CAST(SUM(wq) OVER (ORDER BY cnt DESC, word
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS cum_wq
        |FROM top ORDER BY cnt DESC, word""".stripMargin,

    "q_jaro_linkage" ->
      """WITH n AS (
        |  SELECT c_custkey AS cid, c_name AS name FROM customer),
        |d AS (
        |  SELECT cid AS dirty_id,
        |    CASE WHEN (ascii(substr(md5(name), 1, 1)) % 2) = 0
        |         THEN substr(name, 1, len(name) - 2)
        |              || substr(name, len(name), 1)
        |              || substr(name, len(name) - 1, 1)
        |         ELSE substr(name, 1, len(name) - 1) END AS dirty,
        |    substr(name, 10, 7) AS blk
        |  FROM n),
        |c AS (
        |  SELECT cid AS cand_id, name, substr(name, 10, 7) AS blk FROM n),
        |j AS (
        |  SELECT d.dirty_id, c.cand_id,
        |         ROUND(jaro_winkler_similarity(d.dirty, c.name), 6) + 0.0 AS jw
        |  FROM d JOIN c USING (blk)),
        |f AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY dirty_id
        |    ORDER BY jw DESC, cand_id) AS rk
        |  FROM j WHERE jw >= 0.9)
        |SELECT dirty_id, cand_id AS best_id, jw AS best_jw
        |FROM f WHERE rk = 1 ORDER BY dirty_id""".stripMargin,

    "q_ewma_anomaly" ->
      """WITH RECURSIVE e AS (
        |  SELECT user_id AS k, event_id AS id,
        |         CAST(ROUND(value * 1000000, 0) AS BIGINT) AS xq,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) AS rn
        |  FROM events),
        |rec AS (
        |  SELECT k, id, rn, xq, xq AS sq, 0::BIGINT AS dq,
        |         0::BIGINT AS prev_sq, 0::BIGINT AS prev_dq,
        |         0::BIGINT AS rq, FALSE AS hit
        |  FROM e WHERE rn = 1
        |  UNION ALL
        |  SELECT e.k, e.id, e.rn, e.xq,
        |         (3 * r.sq + e.xq) // 4,
        |         (3 * r.dq + abs(e.xq - r.sq)) // 4,
        |         r.sq, r.dq, abs(e.xq - r.sq),
        |         (e.rn > 4 AND r.dq > 0 AND abs(e.xq - r.sq) > 3 * r.dq)
        |  FROM rec r JOIN e ON e.k = r.k AND e.rn = r.rn + 1)
        |SELECT k AS user_id, id AS event_id, rn, xq, prev_sq, prev_dq, rq
        |FROM rec WHERE hit ORDER BY user_id, rn""".stripMargin,

    "q_sft_pipeline" ->
      s"""WITH $curationCoreSql,
         |samp AS (
         |  SELECT doc_id, source, txt FROM final
         |  WHERE $curationGateSql),
         |tk2 AS (
         |  SELECT doc_id, source, string_split(txt, ' ') AS ts FROM samp),
         |rn AS (
         |  SELECT doc_id, source, ts,
         |         array_to_string(ts[1:12], ' ') AS u,
         |         array_to_string(ts[13:62], ' ') AS a
         |  FROM tk2 WHERE len(ts) >= 16),
         |rr AS (
         |  SELECT doc_id, source, a,
         |         LEAST(len(ts), 12)::BIGINT AS n_user,
         |         LEAST(len(ts) - 12, 50)::BIGINT AS n_asst,
         |         e'<|system|>\\nYou are a helpful assistant.\\n<|user|>\\n'
         |           || u || e'\\n<|assistant|>\\n' AS prefix
         |  FROM rn),
         |rx AS (
         |  SELECT doc_id, source, (n_user + n_asst) AS n_tokens,
         |         length(prefix)::BIGINT AS asst_start,
         |         (length(prefix) + length(a))::BIGINT AS asst_end,
         |         length(prefix || a || e'\\n<|end|>')::BIGINT AS render_len
         |  FROM rr),
         |pk AS (
         |  SELECT *, SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |                                ROWS UNBOUNDED PRECEDING) - n_tokens AS strt
         |  FROM rx)
         |SELECT doc_id, source, n_tokens,
         |       CAST(strt // 256 AS BIGINT) AS seq_idx,
         |       CAST(strt % 256 AS BIGINT) AS seq_offset,
         |       asst_start, asst_end, render_len
         |FROM pk ORDER BY doc_id""".stripMargin,

    "q_token_budget" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         len(string_split(text, ' '))::BIGINT AS n,
        |         ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM documents),
        |c AS (
        |  SELECT *, SUM(n) OVER (PARTITION BY source ORDER BY h, doc_id
        |                         ROWS UNBOUNDED PRECEDING) - n AS cb
        |  FROM t)
        |SELECT doc_id, source, n AS n_tokens FROM c
        |WHERE cb < (CASE source WHEN 'src0' THEN 3000
        |            WHEN 'src1' THEN 1500 ELSE 2500 END)
        |ORDER BY doc_id""".stripMargin,

    "q_quality_calibrate" ->
      """WITH sc AS (
        |  SELECT doc_id, source,
        |         (len(list_distinct(string_split(text, ' ')))::BIGINT * 1000000)
        |           // len(string_split(text, ' '))::BIGINT AS rq
        |  FROM documents),
        |b AS (
        |  SELECT source, quantile_disc(rq, 0.25) AS b25,
        |         quantile_disc(rq, 0.5) AS b50,
        |         quantile_disc(rq, 0.75) AS b75
        |  FROM sc GROUP BY source),
        |a AS (
        |  SELECT sc.source, sc.rq,
        |         CASE WHEN rq <= b25 THEN 0 WHEN rq <= b50 THEN 1
        |              WHEN rq <= b75 THEN 2 ELSE 3 END::BIGINT AS bucket
        |  FROM sc JOIN b USING (source))
        |SELECT source, bucket, COUNT(*)::BIGINT AS n,
        |       MIN(rq) AS min_rq, MAX(rq) AS max_rq
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_unigram_segment" ->
      """WITH RECURSIVE tw0 AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |wc AS (
        |  SELECT w, COUNT(*)::BIGINT AS cnt FROM tw0
        |  WHERE w <> '' GROUP BY w),
        |p1 AS (
        |  SELECT w, unnest(generate_series(1, length(w))) AS s FROM tw0
        |  WHERE w <> ''),
        |p2 AS (
        |  SELECT w, s, unnest(generate_series(1,
        |    LEAST(4, length(w) - s + 1))) AS l FROM p1),
        |pc AS (
        |  SELECT substr(w, s, l) AS piece, COUNT(*)::BIGINT AS cnt
        |  FROM p2 GROUP BY 1),
        |voc AS (
        |  SELECT piece, cnt FROM pc ORDER BY cnt DESC, piece LIMIT 200),
        |tot AS (SELECT SUM(cnt)::BIGINT AS total FROM voc),
        |vc AS MATERIALIZED (
        |  SELECT piece,
        |         CAST(ROUND(LN(total::DOUBLE / cnt::DOUBLE) * 1000000, 0)
        |              AS BIGINT) AS cost
        |  FROM voc, tot),
        |tw AS MATERIALIZED (
        |  SELECT w, cnt FROM wc ORDER BY cnt DESC, w LIMIT 100),
        |rec(w, pos, cost, n, seg) AS (
        |  SELECT w, 0, 0::BIGINT, 0::BIGINT, '' FROM tw
        |  UNION ALL
        |  SELECT r.w, r.pos + l.l, r.cost + COALESCE(v.cost, 20000000),
        |         r.n + 1,
        |         CASE WHEN r.pos = 0 THEN substr(r.w, 1, l.l)
        |              ELSE r.seg || ' ' || substr(r.w, r.pos + 1, l.l) END
        |  FROM rec r
        |  CROSS JOIN (VALUES (1), (2), (3), (4)) l(l)
        |  LEFT JOIN vc v ON v.piece = substr(r.w, r.pos + 1, l.l)
        |  WHERE r.pos + l.l <= length(r.w)
        |    AND (v.cost IS NOT NULL OR l.l = 1)),
        |done AS (
        |  SELECT w, MIN(struct_pack(cost := cost, n := n, seg := seg)) AS b
        |  FROM rec WHERE pos = length(w) GROUP BY w)
        |SELECT t.w AS word, t.cnt AS w_cnt,
        |       struct_extract(d.b, 'seg') AS seg,
        |       struct_extract(d.b, 'cost') AS cost,
        |       struct_extract(d.b, 'n') AS n_pieces
        |FROM tw t JOIN done d ON t.w = d.w
        |ORDER BY t.cnt DESC, t.w""".stripMargin,

    "q_hits" -> {
      def round_(k: Int): String =
        s"""a${k}r AS (SELECT t, SUM(h)::BIGINT AS a
           |  FROM e JOIN h${k - 1} USING (u) GROUP BY t),
           |a${k}m AS (SELECT MAX(a) AS m FROM a${k}r),
           |a$k AS MATERIALIZED (
           |  SELECT t, CAST(ROUND(a::DOUBLE * 1000000 / m, 0) AS BIGINT) AS a
           |  FROM a${k}r, a${k}m),
           |h${k}r AS (SELECT u, SUM(a)::BIGINT AS h
           |  FROM e JOIN a$k USING (t) GROUP BY u),
           |h${k}m AS (SELECT MAX(h) AS m FROM h${k}r),
           |h$k AS MATERIALIZED (
           |  SELECT u, CAST(ROUND(h::DOUBLE * 1000000 / m, 0) AS BIGINT) AS h
           |  FROM h${k}r, h${k}m)""".stripMargin
      s"""WITH e AS (SELECT DISTINCT user_id AS u, event_type AS t FROM events),
         |h0 AS (SELECT DISTINCT u, 1000000::BIGINT AS h FROM e),
         |${(1 to 3).map(round_).mkString(",\n")}
         |SELECT 'hub' AS side, u::VARCHAR AS node, h AS score FROM h3
         |UNION ALL
         |SELECT 'auth' AS side, t AS node, a AS score FROM a3
         |ORDER BY side, node""".stripMargin
    },

    "q_range_layout" -> {
      val bs = (1 to 7).map(i =>
        s"quantile_disc(cents, ${i / 8.0}) AS b$i").mkString(", ")
      val cases = (1 to 7).map(i =>
        s"WHEN cents <= b$i THEN ${i - 1}").mkString(" ")
      s"""WITH t AS (
         |  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
         |  FROM orders),
         |b AS (SELECT $bs FROM t),
         |a AS (
         |  SELECT cents, (CASE $cases ELSE 7 END)::BIGINT AS shard
         |  FROM t, b)
         |SELECT shard, COUNT(*)::BIGINT AS n_rows,
         |       MIN(cents) AS min_v, MAX(cents) AS max_v
         |FROM a GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q_lexical_drift" ->
      """WITH od AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
        |nd AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
        |wv AS (SELECT unnest(string_split(text, ' ')) AS w FROM od),
        |voc AS (
        |  SELECT w, COUNT(*)::BIGINT AS cnt FROM wv WHERE w <> ''
        |  GROUP BY w ORDER BY cnt DESC, w LIMIT 100),
        |vc AS (SELECT COUNT(*)::BIGINT AS v FROM voc),
        |oc AS (
        |  SELECT source AS g, w, COUNT(*)::BIGINT AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM od) x
        |  JOIN voc USING (w) GROUP BY 1, 2),
        |nc AS (
        |  SELECT source AS g, w, COUNT(*)::BIGINT AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM nd) x
        |  JOIN voc USING (w) GROUP BY 1, 2),
        |grid AS (
        |  SELECT g, w FROM (SELECT DISTINCT source AS g FROM od)
        |  CROSS JOIN (SELECT w FROM voc)),
        |j AS (
        |  SELECT grid.g, grid.w,
        |         COALESCE(oc.c, 0) AS co, COALESCE(nc.c, 0) AS cn
        |  FROM grid
        |  LEFT JOIN oc ON grid.g = oc.g AND grid.w = oc.w
        |  LEFT JOIN nc ON grid.g = nc.g AND grid.w = nc.w),
        |tot AS (
        |  SELECT g, SUM(co)::BIGINT AS no, SUM(cn)::BIGINT AS nn
        |  FROM j GROUP BY g),
        |tm AS (
        |  SELECT j.g,
        |    CAST(ROUND(((cn + 1)::DOUBLE / (nn + v)::DOUBLE)
        |      * LN(((cn + 1)::DOUBLE / (nn + v)::DOUBLE)
        |           / ((co + 1)::DOUBLE / (no + v)::DOUBLE))
        |      * 1000000000, 0) AS BIGINT) AS term
        |  FROM j JOIN tot USING (g), vc)
        |SELECT g AS source, (SELECT v FROM vc) AS n_vocab,
        |       SUM(term)::BIGINT AS kl_nano
        |FROM tm GROUP BY g ORDER BY g""".stripMargin,

    "q_interarrival" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events),
        |g AS (
        |  SELECT user_id,
        |    (tsu - LAG(tsu) OVER (PARTITION BY user_id
        |       ORDER BY tsu, event_id)) // 1000000 AS g
        |  FROM e),
        |a AS (
        |  SELECT user_id, COUNT(*)::BIGINT AS n, SUM(g)::BIGINT AS s,
        |         SUM(g::HUGEINT * g::HUGEINT) AS ss
        |  FROM g WHERE g IS NOT NULL GROUP BY user_id
        |  HAVING COUNT(*) >= 2)
        |SELECT user_id, n AS n_gaps,
        |  ROUND(s::DOUBLE / n, 4) + 0.0 AS mean_gap_s,
        |  CASE WHEN s = 0 THEN 0.0 ELSE
        |    ROUND((SQRT((n::HUGEINT * ss - s::HUGEINT * s::HUGEINT)::DOUBLE
        |                / (n * n)::DOUBLE)
        |           - s::DOUBLE / n)
        |          / (SQRT((n::HUGEINT * ss - s::HUGEINT * s::HUGEINT)::DOUBLE
        |                  / (n * n)::DOUBLE)
        |             + s::DOUBLE / n), 6) + 0.0 END AS burstiness
        |FROM a ORDER BY user_id""".stripMargin,

    "q_inbatch_negatives" ->
      """WITH h AS (
        |  SELECT doc_id,
        |         ('0x'||substr(md5('1:' || doc_id::VARCHAR), 1, 15))::BIGINT AS hv,
        |         ('0x'||substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS hk
        |  FROM documents),
        |sh AS (
        |  SELECT hv % 8 AS shard,
        |         CAST(row_number() OVER (PARTITION BY hv % 8
        |                                 ORDER BY hv, hk) AS BIGINT) AS seq,
        |         doc_id
        |  FROM h),
        |b AS (
        |  SELECT shard, (seq - 1) // 16 AS batch_id,
        |         (seq - 1) % 16 AS pos, doc_id
        |  FROM sh),
        |sz AS (
        |  SELECT shard, batch_id, COUNT(*)::BIGINT AS bsize
        |  FROM b GROUP BY 1, 2)
        |SELECT a.doc_id AS anchor_id, o.o::BIGINT AS off,
        |       n.doc_id AS neg_id, a.shard, a.batch_id
        |FROM b a
        |JOIN sz USING (shard, batch_id)
        |CROSS JOIN (VALUES (1), (2)) o(o)
        |JOIN b n ON n.shard = a.shard AND n.batch_id = a.batch_id
        |        AND n.pos = (a.pos + o.o) % sz.bsize
        |WHERE o.o < sz.bsize
        |ORDER BY anchor_id, off""".stripMargin,

    "q_attribution" ->
      """WITH p AS (
        |  SELECT user_id, event_id AS pid, epoch_us(ts) AS pts,
        |         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |tc AS (
        |  SELECT user_id, epoch_us(ts) AS tts, event_type AS ttype
        |  FROM events WHERE event_type IN ('click', 'view')),
        |j AS (
        |  SELECT p.pid, p.cents, tc.ttype
        |  FROM p JOIN tc ON p.user_id = tc.user_id
        |   AND tc.tts < p.pts AND tc.tts >= p.pts - 604800000000),
        |pt AS (
        |  SELECT pid, cents, ttype, COUNT(*)::BIGINT AS nt
        |  FROM j GROUP BY 1, 2, 3),
        |pp AS (SELECT pid, SUM(nt)::BIGINT AS n FROM pt GROUP BY pid)
        |SELECT pt.ttype AS event_type,
        |       COUNT(DISTINCT pt.pid)::BIGINT AS n_conversions,
        |       (SUM((pt.cents * pt.nt) // pp.n)::DOUBLE / 100.0) AS attributed
        |FROM pt JOIN pp USING (pid)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_script_mix" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    text || CASE doc_id % 4
        |      WHEN 1 THEN ' привет мир'
        |      WHEN 2 THEN ' 你好世界'
        |      WHEN 3 THEN ' γεια σου'
        |      ELSE '' END AS t
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    (length(t) - length(regexp_replace(t, '[A-Za-z]', '', 'g')))::BIGINT AS n_latin,
        |    (length(t) - length(regexp_replace(t, '\p{Cyrillic}', '', 'g')))::BIGINT AS n_cyr,
        |    (length(t) - length(regexp_replace(t, '\p{Han}', '', 'g')))::BIGINT AS n_han,
        |    (length(t) - length(regexp_replace(t, '\p{Greek}', '', 'g')))::BIGINT AS n_greek
        |  FROM s)
        |SELECT doc_id, n_latin, n_cyr, n_han, n_greek,
        |  CASE WHEN n_cyr > n_latin THEN 'cyrillic'
        |       WHEN n_han > n_latin THEN 'han'
        |       WHEN n_greek > n_latin THEN 'greek'
        |       ELSE 'latin' END AS script
        |FROM c ORDER BY doc_id""".stripMargin
  )

  // ============================================== round-8 additions

  private def round8Queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CCNet perplexity bucketing (operators/TrigramLm.pplBuckets, Wenzek
    // et al. 2020 §4.3): one char-trigram LM per LANGUAGE trained on the
    // in-domain reference slice (source = src0, the Wikipedia stand-in),
    // every document scored against its language's LM, then split at the
    // language's own 33rd/66th nll percentiles into head/middle/tail with
    // the tail dropped. Models + per-lang stats + tercile bounds are all
    // bounded broadcasts; the corpus never sorts and shuffles only (doc,
    // partial-sum) rows.
    "q_ppl_buckets" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      TrigramLm.pplBuckets(docs, docs.filter($"source" === "src0"),
          "doc_id", "text", "lang")
        .orderBy($"doc_id")
    }),

    // Sentence-level BLEU-2 pair scoring (operators/TextEval.bleu2,
    // Papineni et al. 2002): clipped-n-gram modified precisions with
    // brevity penalty — the bitext/paraphrase QA gate. Pairs here are
    // each doc against the next doc_id in its source (one lead window);
    // the metric itself is per-row HOF compute, zero joins/shuffles.
    "q_bleu_pairs" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"source").orderBy($"doc_id")
      val pairs = t(s, dir, "documents")
        .select($"doc_id", $"source", $"text",
          lead($"text", 1).over(w).as("ref_text"))
        .filter($"ref_text".isNotNull)
      TextEval.bleu2(pairs, "doc_id", "text", "ref_text")
        .orderBy($"doc_id")
    }),

    // chrF-style char-trigram F2 (TextEval.chrF, Popović 2015): clipped
    // trigram precision/recall folded as 5PR/(4P+R) in pure integer
    // arithmetic — no transcendental anywhere, exact at every row. Same
    // next-doc-in-source pairing as q_bleu_pairs; per-row kernel
    // compute, the lead window is the only exchange.
    "q_chrf_pairs" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"source").orderBy($"doc_id")
      val pairs = t(s, dir, "documents")
        .select($"doc_id", $"source", $"text",
          lead($"text", 1).over(w).as("ref_text"))
        .filter($"ref_text".isNotNull)
      TextEval.chrF(pairs, "doc_id", "text", "ref_text")
        .orderBy($"doc_id")
    }),

    // TextTiling topic segmentation (operators/TextTiling, Hearst 1997):
    // semantic chunking for RAG ingest — chunk boundaries open where the
    // Jaccard cohesion of adjacent 15-word blocks drops below 0.1
    // (integer millionths, sorted-merge kernel). Pure per-row HOF
    // compute; the posexplode to block rows is the only reshaping.
    "q_semantic_chunks" -> ((s, dir) => {
      import s.implicits._
      TextTiling.segments(t(s, dir, "documents"), "doc_id", "text",
          blockWords = 15, thresholdMicro = 100000L)
        .orderBy($"doc_id", $"block_idx")
    })
  )

  private def round8Oracles: Map[String, String] = Map(

    "q_ppl_buckets" ->
      """WITH d AS (
        |  SELECT doc_id, lang, source,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |         ' +', ' ', 'g')) AS nt
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, lang, source,
        |    unnest(list_transform(generate_series(1, length(nt) - 2),
        |      i -> substr(nt, i, 3))) AS tri
        |  FROM d WHERE length(nt) >= 3),
        |c AS (
        |  SELECT lang, tri, COUNT(*) AS cnt FROM g
        |  WHERE source = 'src0' GROUP BY lang, tri),
        |st AS (
        |  SELECT lang, SUM(cnt)::DOUBLE AS total, COUNT(*)::DOUBLE AS v
        |  FROM c GROUP BY lang),
        |m AS (
        |  SELECT c.lang, c.tri,
        |    CAST(ROUND(ROUND(ln((cnt::DOUBLE + 1.0) / (st.total + st.v)), 6)
        |         * 1000000) AS BIGINT) AS lp
        |  FROM c JOIN st USING (lang)),
        |u AS (
        |  SELECT lang,
        |    CAST(ROUND(ROUND(ln(1.0 / (total + v)), 6) * 1000000) AS BIGINT)
        |      AS ulp
        |  FROM st),
        |s AS (
        |  SELECT g.doc_id, g.lang, COUNT(*) AS n_tri,
        |         SUM(COALESCE(m.lp, u.ulp)) AS lsum
        |  FROM g JOIN u ON g.lang = u.lang
        |  LEFT JOIN m ON g.lang = m.lang AND g.tri = m.tri
        |  GROUP BY g.doc_id, g.lang),
        |sc AS (
        |  SELECT doc_id, lang, CAST(n_tri AS BIGINT) AS n_tri,
        |    ROUND((-lsum)::DOUBLE / 1000000.0 / n_tri::DOUBLE, 4) + 0.0 AS nll
        |  FROM s),
        |n4 AS (
        |  SELECT *, CAST(ROUND(nll * 10000, 0) AS BIGINT) AS v4 FROM sc),
        |b AS (
        |  SELECT lang, quantile_disc(v4, 0.33) AS b33,
        |         quantile_disc(v4, 0.66) AS b66
        |  FROM n4 GROUP BY lang)
        |SELECT n4.doc_id, n4.lang, n4.n_tri, n4.nll,
        |  CASE WHEN v4 <= b33 THEN 'head' WHEN v4 <= b66 THEN 'middle'
        |       ELSE 'tail' END AS bucket,
        |  (v4 <= b66) AS kept
        |FROM n4 JOIN b USING (lang) ORDER BY n4.doc_id""".stripMargin,

    "q_bleu_pairs" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, source, toks AS c,
        |    lead(toks) OVER (PARTITION BY source ORDER BY doc_id) AS r
        |  FROM d),
        |pp AS (
        |  SELECT * FROM p
        |  WHERE r IS NOT NULL AND len(c) > 0 AND len(r) > 0),
        |g AS (
        |  SELECT doc_id, c, r,
        |    CASE WHEN len(c) < 2 THEN CAST([] AS VARCHAR[])
        |         ELSE list_transform(generate_series(1, len(c) - 1),
        |                i -> c[i] || ' ' || c[i + 1]) END AS c2,
        |    CASE WHEN len(r) < 2 THEN CAST([] AS VARCHAR[])
        |         ELSE list_transform(generate_series(1, len(r) - 1),
        |                i -> r[i] || ' ' || r[i + 1]) END AS r2
        |  FROM pp),
        |m AS (
        |  SELECT doc_id, len(c)::BIGINT AS c_len, len(r)::BIGINT AS r_len,
        |    COALESCE(list_sum(list_transform(list_distinct(c),
        |      x -> LEAST(len(list_filter(c, y -> y = x)),
        |                 len(list_filter(r, y -> y = x))))), 0)::BIGINT AS n1,
        |    COALESCE(list_sum(list_transform(list_distinct(c2),
        |      x -> LEAST(len(list_filter(c2, y -> y = x)),
        |                 len(list_filter(r2, y -> y = x))))), 0)::BIGINT AS n2
        |  FROM g),
        |f AS (
        |  SELECT doc_id, c_len, r_len, n1, n2,
        |    CAST(CASE WHEN c_len >= r_len THEN 1000000
        |         ELSE ROUND(exp(1.0 - r_len::DOUBLE / c_len::DOUBLE)
        |                    * 1000000, 0) END AS BIGINT) AS bp_micro,
        |    (n1 * 1000000) // c_len AS p1m,
        |    (n2 * 1000000) // GREATEST(c_len - 1, 1) AS p2m
        |  FROM m)
        |SELECT doc_id, c_len, r_len, n1, n2, bp_micro,
        |  CAST(FLOOR(bp_micro::DOUBLE * sqrt((p1m * p2m)::DOUBLE)
        |       / 1000000.0) AS BIGINT) AS bleu2_micro
        |FROM f ORDER BY doc_id""".stripMargin,

    "q_chrf_pairs" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |         ' +', ' ', 'g')) AS nt
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, source,
        |    CASE WHEN length(nt) < 3 THEN CAST([] AS VARCHAR[])
        |         ELSE list_transform(generate_series(1, length(nt) - 2),
        |                i -> substr(nt, i, 3)) END AS g
        |  FROM d),
        |p AS (
        |  SELECT doc_id, source, g AS c,
        |    lead(g) OVER (PARTITION BY source ORDER BY doc_id) AS r
        |  FROM t),
        |pp AS (
        |  SELECT doc_id, c, r FROM p
        |  WHERE r IS NOT NULL AND len(c) > 0 AND len(r) > 0),
        |m AS (
        |  SELECT doc_id, len(c)::BIGINT AS n_c, len(r)::BIGINT AS n_r,
        |    COALESCE(list_sum(list_transform(list_distinct(c),
        |      x -> LEAST(len(list_filter(c, y -> y = x)),
        |                 len(list_filter(r, y -> y = x))))), 0)::BIGINT AS n_match
        |  FROM pp),
        |f AS (
        |  SELECT doc_id, n_c, n_r, n_match,
        |    (n_match * 1000000) // n_c AS p_micro,
        |    (n_match * 1000000) // n_r AS r_micro
        |  FROM m)
        |SELECT doc_id, n_c, n_r, n_match, p_micro, r_micro,
        |  (CASE WHEN p_micro + r_micro = 0 THEN 0
        |        ELSE (5 * p_micro * r_micro) // (4 * p_micro + r_micro)
        |   END)::BIGINT AS chrf_micro
        |FROM f ORDER BY doc_id""".stripMargin,

    "q_semantic_chunks" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, toks, (len(toks) + 14) // 15 AS nb
        |  FROM d WHERE len(toks) > 0),
        |k AS (
        |  SELECT doc_id, nb,
        |    list_transform(generate_series(0, nb - 1),
        |      bb -> len(list_slice(toks, bb * 15 + 1, bb * 15 + 15))) AS ns,
        |    list_transform(generate_series(0, nb - 1),
        |      bb -> list_distinct(list_slice(toks, bb * 15 + 1, bb * 15 + 15))) AS db
        |  FROM b),
        |c AS (
        |  SELECT doc_id, nb, ns,
        |    list_transform(generate_series(0, nb - 1), i ->
        |      CASE WHEN i = 0 THEN -1
        |      ELSE (len(list_filter(db[i], x -> list_contains(db[i + 1], x)))
        |            * 1000000)
        |           // (len(db[i]) + len(db[i + 1])
        |               - len(list_filter(db[i], x -> list_contains(db[i + 1], x))))
        |      END) AS coh
        |  FROM k),
        |g AS (
        |  SELECT doc_id, nb, ns, coh,
        |    list_transform(generate_series(0, nb - 1), i ->
        |      list_sum(list_transform(list_slice(coh, 1, i + 1),
        |        cc -> CASE WHEN cc < 100000 THEN 1 ELSE 0 END)) - 1) AS chunk
        |  FROM c)
        |SELECT doc_id,
        |  unnest(generate_series(0, nb - 1))::BIGINT AS block_idx,
        |  unnest(ns)::BIGINT AS n_tokens,
        |  unnest(coh)::BIGINT AS cohesion_micro,
        |  unnest(chunk)::BIGINT AS chunk_idx
        |FROM g ORDER BY doc_id, block_idx""".stripMargin
  )

  private def round9Queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ROUGE-L pair scoring (operators/TextEval.rougeL, Lin 2004): LCS
    // precision/recall/F1 over 40-token prefixes via the native
    // rolling-row DP kernel (expressions/LcsExpression) — the
    // summarization QA gate beside BLEU (contiguous) and chrF (char
    // morphology). Per-row kernel compute; the lead window is the only
    // exchange. Fully integer arithmetic, no float anywhere.
    "q_rouge_pairs" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"source").orderBy($"doc_id")
      val pairs = t(s, dir, "documents")
        .select($"doc_id", $"source", $"text",
          lead($"text", 1).over(w).as("ref_text"))
        .filter($"ref_text".isNotNull)
      TextEval.rougeL(pairs, "doc_id", "text", "ref_text", maxToks = 40)
        .orderBy($"doc_id")
    }),

    // Greedy k-center coreset (operators/Coreset, Gonzalez 1985 /
    // Sener & Savarese 2018): 5 maximally-spread embeddings by
    // farthest-point traversal — k scans, each one running-min update
    // against a single broadcast center + one map-side-combined argmax;
    // driver state is the k-bounded chosen set. Deterministic seed
    // (min id) and tie-break (min id at equal distance); distances are
    // round-4-quantized squared L2, so the oracle replays every pick.
    "q_kcenter" -> ((s, dir) => {
      import s.implicits._
      Coreset.farthestPointSample(
          spread(s, t(s, dir, "embeddings")), "vec_id", "embedding", k = 5)
        .orderBy($"sel_round")
    }),

    // k-core peeling (GraphOps.kCore, Seidman 1983) of the item
    // co-occurrence graph: the density gate between connectedComponents
    // (too loose) and triangleCount (one global number) — mirror farms
    // and interlinked rings survive, one-off links peel away. Batch
    // layer peeling reaches the fixpoint in ~4 rounds here; each round
    // is one map-side-combined degree count + two semi-joins over
    // (8-byte, 8-byte) edge ids, and the loop THROWS at maxRounds
    // rather than returning an under-peeled subgraph.
    "q_kcore" -> ((s, dir) => {
      import s.implicits._
      val ui = t(s, dir, "events").select($"user_id".as("u"),
        (lit(100000L) + pmod($"event_id", lit(1000L))).as("i"))
      val edges = GraphOps.cooccurrenceEdges(ui, $"u", $"i", minShared = 3)
        .select($"ia".as("a"), $"ib".as("b"))
      GraphOps.kCore(edges, k = 11).orderBy($"node")
    }),

    // Leakage-safe train/val/test split (Sampling.leakageSafeSplit):
    // split routing keyed on the near-dup CLUSTER representative, so a
    // duplicate pair can never straddle train and test — the
    // eval-contamination hole a row-keyed split leaves open. Same
    // MinHash-LSH pair list + connectedComponents as q_dedup_clusters
    // (ids-only shuffles), then the scan-speed hash gate of
    // q_three_way_split on the cluster rep.
    "q_leakage_split" -> ((s, dir) => {
      import s.implicits._
      val docs = spread(s, t(s, dir, "documents"))
      val pairs = Dedup.nearDupPairs(docs, "doc_id", "text",
        shingleSize = 2, numHashes = 16, bands = 4, threshold = 0.2)
      Sampling.leakageSafeSplit(docs.select($"doc_id", $"source"),
          "doc_id", pairs, "id_a", "id_b", 0.8, 0.1)
        .select($"doc_id", $"cluster_rep", $"split")
        .orderBy($"doc_id")
    }),

    // Excess-perplexity data selection (TrigramLm.excessSelect, the
    // RHO-1/DoReMi excess-loss move at document granularity): rank by
    // nll(general LM) − nll(domain LM) and keep the top half — the
    // difference cancels the length/vocabulary bias plain perplexity
    // filtering shares, surfacing in-domain signal the corpus-wide
    // model hasn't absorbed. Two bounded model broadcasts, one scoring
    // pass each; the median threshold is one KLL sketch row.
    "q_excess_ppl" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      TrigramLm.excessSelect(docs, docs.filter($"source" === "src0"),
          "doc_id", "text")
        .orderBy($"doc_id")
    }),

    // WordPiece merge learning (BpeTrain.learnWordPieceMerges, Schuster
    // & Nakajima 2012): the BERT-tokenizer likelihood-ratio objective —
    // argmax of count(l,r)/(count(l)·count(r)) as an exact integer
    // floor division, completing the trainer trio beside BPE (raw pair
    // count) and the unigram LM (Viterbi EM). Same scale shape: one
    // corpus word-count aggregation, then bounded driver iteration.
    "q_wordpiece_train" -> ((s, dir) => {
      import s.implicits._
      BpeTrain.learnWordPieceMerges(
          spread(s, t(s, dir, "documents")), "text", nMerges = 5)
        .orderBy($"step")
    }),

    // Contriever independent-crop positive pairs (SftPrep
    // .contrastiveCrops, Izacard et al. 2022): two md5-offset token
    // spans per document — the label-free query/passage supervision for
    // contrastive retriever pretraining, pairing with
    // q_inbatch_negatives' negatives. Pure per-row narrow map, zero
    // shuffle; offsets are a function of the doc id (RNG-free), so both
    // engines cut identical spans.
    "q_contrastive_crops" -> ((s, dir) => {
      import s.implicits._
      SftPrep.contrastiveCrops(t(s, dir, "documents"), "doc_id", "text")
        .orderBy($"doc_id")
    }),

    // Interpolated Kneser-Ney perplexity (TrigramLm.knScore, Kneser &
    // Ney 1995 / Chen & Goodman 1999) — the KenLM smoothing CCNet
    // actually ships, beside q_trigram_lm's add-one simplification:
    // continuation-count lower orders with fixed D=0.75, every level
    // round-6 quantized so both engines derive identical doubles from
    // identical integer counts. All model tables alphabet-bounded and
    // broadcast; one scoring explode, five broadcast probes.
    "q_kn_ppl" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      TrigramLm.knScore(docs, docs.filter($"source" === "src0"),
          "doc_id", "text")
        .orderBy($"doc_id")
    }),

    // Curriculum staging (Packing.curriculumStages, Bengio et al.
    // 2009): quality-score terciles as easy→hard training stages plus
    // a deterministic within-stage hash order. Boundaries from the KLL
    // sketch (bounded), assignment scan-speed; the order is a COLUMN,
    // never a global sort.
    "q_curriculum" -> ((s, dir) => {
      import s.implicits._
      Packing.curriculumStages(t(s, dir, "documents"), "doc_id", "text")
        .orderBy($"doc_id")
    }),

    // Content-defined chunk dedup (Dedup.cdcChunks — Rabin rolling-hash
    // boundaries, the LBFS/backup-dedup classic): the third dedup
    // granularity between whole-doc fingerprints and 8-token window
    // spans; boundaries are local-content functions, so insertions
    // re-align instead of desynchronizing every later chunk (the
    // fixed-size-chunking failure; DedupSpec pins it). One native
    // O(len) pass per doc, one (8-byte hash, id) shuffle for the
    // duplicated-chunk set — text never shuffles.
    "q_cdc_dedup" -> ((s, dir) => {
      import s.implicits._
      // ex embeds the O(len) kernel; the dup set re-derives from the
      // same lineage (2 kernel passes total — corpus-sized frames are
      // never materialized), and n_chunks/n_dup fold into ONE per-doc
      // aggregation via a dup-marker left join instead of a third scan
      val ex = spread(s, t(s, dir, "documents"))
        .select($"doc_id", explode(Dedup.cdcChunks($"text")).as("__c"))
        .select($"doc_id", Dedup.hash60(col("__c")).as("__h"))
      val dup = ex.groupBy($"__h").agg(count(lit(1)).as("__n"))
        .filter($"__n" >= 2).select($"__h", lit(1).as("__isdup"))
      ex.join(dup, Seq("__h"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_chunks"), count($"__isdup").as("n_dup"))
        .orderBy($"doc_id")
    }),

    // RAG groundedness (TextEval.groundedness — the deterministic core
    // of RAGAS faithfulness): fraction of the answer's word bigrams
    // present in the context, clipped multiset semantics via the
    // sorted-merge kernel. Pairing: each doc as context vs the next
    // doc in its source as the "generated" answer (values land strictly
    // inside (0,1) — an extractive answer would pin 1.0, SpecSpec).
    "q_groundedness" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"source").orderBy($"doc_id")
      val pairs = t(s, dir, "documents")
        .select($"doc_id", $"source", $"text",
          lead($"text", 1).over(w).as("answer"))
        .filter($"answer".isNotNull)
      TextEval.groundedness(pairs, "doc_id", "answer", "text")
        .orderBy($"doc_id")
    }),

    // l-diversity release audit (Privacy.lDiversityAudit,
    // Machanavajjhala et al. 2007) — the homogeneity-attack gate
    // k-anonymity misses: a group must carry >= l distinct sensitive
    // values to publish. Same bounded group-table shape as
    // q_k_anonymity; the two gates compose.
    "q_l_diversity" -> ((s, dir) => {
      import s.implicits._
      Privacy.lDiversityAudit(t(s, dir, "documents"),
          Seq($"source", $"lang"), pmod(length($"text"), lit(4)), l = 3)
        .orderBy($"source", $"lang")
    }),

    // REAL image decode through the multimodal boundary: deterministic
    // P6 PPM payloads (md5-derived dims + raster bytes) built per row,
    // parsed by the actual Multimodal.PpmDecoder (header parse →
    // channel means → nearest-neighbor luma strip) via the
    // per-partition decodePartitioned boundary. The oracle NEVER
    // parses PPM — it recomputes every feature from the generative md5
    // formula independently, so the engine's parse/resize/feature path
    // is checked against a derivation that shares none of its code.
    "q_ppm_decode" -> ((s, dir) => {
      import s.implicits._
      def md5hex(str: String): String =
        graft.expressions.Md5Kernel
          .digest(str.getBytes("UTF-8")).map("%02x".format(_)).mkString
      def h60(str: String): Long =
        java.lang.Long.parseLong(md5hex(str).substring(0, 15), 16)
      val withBin = t(s, dir, "documents").select($"doc_id").as[Long]
        .map { id =>
          val w = (4 + h60(id + ":w") % 5).toInt
          val h = (4 + h60(id + ":h") % 5).toInt
          val n = w * h * 3
          val px = new Array[Byte](n)
          var block = -1
          var hex = ""
          var j = 0
          while (j < n) {
            if (j / 16 != block) { block = j / 16; hex = md5hex(id + ":" + block) }
            px(j) = Integer.parseInt(
              hex.substring((j % 16) * 2, (j % 16) * 2 + 2), 16).toByte
            j += 1
          }
          (id, Multimodal.Ppm.encode(Multimodal.Ppm.Image(w, h, 255, px)))
        }.toDF("doc_id", "bin")
      Multimodal.decodePartitioned(withBin, "bin", Multimodal.PpmDecoder(5))
        .select($"doc_id", $"decoded.n_bytes".as("n_bytes"),
          $"decoded.width".as("width"), $"decoded.height".as("height"),
          $"decoded.format".as("format"),
          round(element_at($"decoded.features", 1).cast("double"), 4).as("f0"),
          round(element_at($"decoded.features", 2).cast("double"), 4).as("f1"),
          round(element_at($"decoded.features", 3).cast("double"), 4).as("f2"),
          round(element_at($"decoded.features", 4).cast("double"), 4).as("l0"),
          round(element_at($"decoded.features", 5).cast("double"), 4).as("l1"))
        .orderBy($"doc_id")
    }),

    // REAL audio decode — the WAV sibling of q_ppm_decode: canonical
    // PCM payloads with md5-derived int16 samples, parsed by the
    // actual Multimodal.WavDecoder (RIFF/fmt/data parse → RMS /
    // zero-crossings / peak), oracle recomputing every feature from
    // the generative formula without reading a WAV byte.
    "q_wav_decode" -> ((s, dir) => {
      import s.implicits._
      def md5hex(str: String): String =
        graft.expressions.Md5Kernel
          .digest(str.getBytes("UTF-8")).map("%02x".format(_)).mkString
      def h60(str: String): Long =
        java.lang.Long.parseLong(md5hex(str).substring(0, 15), 16)
      val withBin = t(s, dir, "documents").select($"doc_id").as[Long]
        .map { id =>
          val n = (64 + h60(id + ":n") % 64).toInt
          val samples = new Array[Short](n)
          var block = -1
          var hex = ""
          var j = 0
          while (j < n) {
            val byteIdx = 2 * j
            if (byteIdx / 16 != block) {
              block = byteIdx / 16; hex = md5hex(id + ":s:" + block)
            }
            val b0 = Integer.parseInt(
              hex.substring((byteIdx % 16) * 2, (byteIdx % 16) * 2 + 2), 16)
            val o1 = (byteIdx + 1) % 16
            val hex1 = if ((byteIdx + 1) / 16 != block)
              md5hex(id + ":s:" + ((byteIdx + 1) / 16)) else hex
            val b1 = Integer.parseInt(hex1.substring(o1 * 2, o1 * 2 + 2), 16)
            samples(j) = ((b1 << 8) | b0).toShort
            j += 1
          }
          (id, Multimodal.Wav.encode(Multimodal.Wav.Audio(8000, 1, samples)))
        }.toDF("doc_id", "bin")
      Multimodal.decodePartitioned(withBin, "bin", Multimodal.WavDecoder(3))
        .select($"doc_id", $"decoded.n_bytes".as("n_bytes"),
          $"decoded.width".as("sample_rate"),
          $"decoded.height".as("n_samples"),
          $"decoded.format".as("format"),
          round(element_at($"decoded.features", 1).cast("double"), 4).as("rms"),
          round(element_at($"decoded.features", 2).cast("double"), 4).as("zcr"),
          round(element_at($"decoded.features", 3).cast("double"), 4).as("peak"))
        .orderBy($"doc_id")
    }),

    // VIDEO frame sampling — the third modality beside q_ppm_decode
    // (image) and q_wav_decode (audio): per-doc frame-concat videos
    // (2–6 md5-derived 4×4 P6 frames, the y4m-style raw container),
    // walked by Multimodal.Video.parseFrames and sampled every 2nd
    // frame (Multimodal.frameSampled) — one output row per SAMPLED
    // frame with its channel-mean features; unsampled rasters never
    // materialize. mapPartitions flatMap, no shuffle; the oracle
    // replays frame selection + features from the generative formula
    // without reading a container byte.
    "q_frame_sample" -> ((s, dir) => {
      import s.implicits._
      def md5hex(str: String): String =
        graft.expressions.Md5Kernel
          .digest(str.getBytes("UTF-8")).map("%02x".format(_)).mkString
      def h60(str: String): Long =
        java.lang.Long.parseLong(md5hex(str).substring(0, 15), 16)
      val withBin = t(s, dir, "documents").select($"doc_id").as[Long]
        .map { id =>
          val nf = (2 + h60(id + ":n") % 5).toInt
          val frames = (0 until nf).map { f =>
            val px = new Array[Byte](48)
            var block = -1
            var hex = ""
            var j = 0
            while (j < 48) {
              if (j / 16 != block) {
                block = j / 16; hex = md5hex(id + ":" + f + ":" + block)
              }
              px(j) = Integer.parseInt(
                hex.substring((j % 16) * 2, (j % 16) * 2 + 2), 16).toByte
              j += 1
            }
            Multimodal.Ppm.Image(4, 4, 255, px)
          }
          (id, Multimodal.Video.encode(frames))
        }.toDF("doc_id", "bin")
      Multimodal.frameSampled(withBin, "bin", every = 2, featureDim = 3)
        .select($"doc_id", $"frame.frame_idx".as("frame_idx"),
          $"frame.n_frames".as("n_frames"),
          $"frame.width".as("width"), $"frame.height".as("height"),
          round(element_at($"frame.features", 1).cast("double"), 4).as("f0"),
          round(element_at($"frame.features", 2).cast("double"), 4).as("f1"),
          round(element_at($"frame.features", 3).cast("double"), 4).as("f2"))
        .orderBy($"doc_id", $"frame_idx")
    }),

    // Video near-dup: sampled-frame-signature matching
    // (Multimodal.frameSigPairs) — the sample → signature → dedup
    // pipeline a video corpus runs (full-raster comparison never
    // happens; only the sampled-frame signatures shuffle). Fixture:
    // replicated-clip groups — EVEN-index frames seed from the GROUP id
    // (doc_id % 50), odd from the doc — so videos in a group share
    // exactly the sampled frames. Signature = per-frame exact integer
    // channel sums; pairs need ≥ 2 shared sampled frames. Pair
    // generation goes through Dedup.cappedPairsByKey — the SAME
    // hot-bucket cap as text LSH, so a corpus-wide shared frame routes
    // linearly — then the verify join recomputes each pair's true
    // shared count (fixture buckets ≈ group size ≈ 10 ≪ cap, so the
    // oracle's uncapped self-join replays the identical pair set).
    "q_video_dedup" -> ((s, dir) => {
      import s.implicits._
      val withBin = videoGroupFixture(s, dir)
      Multimodal.frameSigPairs(withBin, "doc_id", "bin",
          every = 2, minShared = 2)
        .orderBy($"id_a", $"id_b")
    }),

    // End-to-end video dedup DECISIONS: the q_video_dedup pair list →
    // connectedComponents (pointer-jumping min-label) → keep the
    // component representative, drop the rest — the composition a video
    // corpus actually ships (pairs alone don't dedup anything). The
    // oracle replays pairs + recursive-CTE transitive closure +
    // keep-min, so the decision set — the thing the hot-bucket cap
    // guarantees it preserves — is itself hash-checked.
    "q_video_dedup_e2e" -> ((s, dir) => {
      import s.implicits._
      val withBin = videoGroupFixture(s, dir)
      val pairs = Multimodal.frameSigPairs(withBin, "doc_id", "bin",
          every = 2, minShared = 2)
        .select($"id_a", $"id_b")
      val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
      withBin.select($"doc_id")
        .join(comp.filter($"node" =!= $"comp").select($"node".as("doc_id")),
          Seq("doc_id"), "left_anti")
        .orderBy($"doc_id")
    }),

    // Audio near-dup: window-signature matching (Multimodal.audioSigPairs)
    // — the audio member of the capped pairwise family, completing
    // image/video/audio parity: WAV → 16-sample windows → exact integer
    // (Σs, Σ|s|) signatures → Dedup.sharedSigPairs with the LSH
    // hot-bucket cap (a corpus-wide station jingle routes linearly) →
    // true shared-window counts ≥ 2. PCM never shuffles — only
    // (win_idx, 2 longs) per window. Fixture mirrors q_video_dedup:
    // EVEN windows seed from the GROUP id (doc_id % 50), odd from the
    // doc, so clips in a group share exactly the even windows; the
    // oracle replays the generative md5 byte layout without parsing a
    // WAV byte.
    "q_audio_dedup" -> ((s, dir) => {
      import s.implicits._
      val withBin = audioGroupFixture(s, dir)
      Multimodal.audioSigPairs(withBin, "doc_id", "bin",
          winSize = 16, minShared = 2)
        .orderBy($"id_a", $"id_b")
    }),

    // Segment-GATED audio near-dup (Multimodal.activeAudioSigPairs):
    // the audioEnergySegments gate composed INTO candidate generation —
    // only windows inside active runs of ≥ minSegWindows reach the pair
    // engine, so corpus-wide silence (every clip's zero-PCM window w is
    // an IDENTICAL signature — audio's worst boilerplate bucket) never
    // generates candidates, and isolated one-window blips are excluded
    // with it. Fixture = q_audio_dedup's group-seeded layout with every
    // w%4==3 window zeroed to silence: the silent windows would
    // otherwise both inflate n_shared corpus-wide and form a giant
    // bucket; gating drops them and the isolated w=4 window (nw=5
    // clips) behind them.
    "q_audio_dedup_gated" -> ((s, dir) => {
      import s.implicits._
      val withBin = audioGroupFixture(s, dir, silence4 = true)
      Multimodal.activeAudioSigPairs(withBin, "doc_id", "bin",
          winSize = 16, minAbsSum = 1L, minSegWindows = 2, minShared = 2)
        .orderBy($"id_a", $"id_b")
    }),

    // End-to-end segment-gated audio dedup DECISIONS: gated pairs →
    // connectedComponents → keep-representative — the audio member of
    // the decision-pipeline trio. Silence never drives a drop (it never
    // generated a candidate), and the surviving-clip set is hash-checked
    // against the gated-replay + closure + keep-min oracle.
    "q_audio_dedup_e2e" -> ((s, dir) => {
      import s.implicits._
      val withBin = audioGroupFixture(s, dir, silence4 = true)
      val pairs = Multimodal.activeAudioSigPairs(withBin, "doc_id", "bin",
          winSize = 16, minAbsSum = 1L, minSegWindows = 2, minShared = 2)
        .select($"id_a", $"id_b")
      val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
      withBin.select($"doc_id")
        .join(comp.filter($"node" =!= $"comp").select($"node".as("doc_id")),
          Seq("doc_id"), "left_anti")
        .orderBy($"doc_id")
    }),

    // Shot-level end-to-end video dedup (Multimodal.shotSigPairs →
    // connectedComponents → keep-representative): the re-cut-robust
    // twin of q_video_dedup_e2e — shots match by CONTENT (n_frames +
    // exact channel sums over the shot), with no positional key, so a
    // video whose shared shots sit behind a doc-unique inserted prefix
    // still pairs where index-aligned frame matching finds nothing.
    // Fixture: 2..4 shots of 3 identical frames each; each doc opens
    // with (doc_id % 3) unique prefix shots, then up to two
    // GROUP-seeded shots — group members carry the same shot contents
    // at DIFFERENT shot positions. The oracle replays frame sums, shot
    // detection, per-shot content rollup, the distinct-shared-shot pair
    // join, recursive-CTE closure and keep-min.
    "q_shot_dedup_e2e" -> ((s, dir) => {
      import s.implicits._
      val withBin = shotDedupFixture(s, dir)
      val pairs = Multimodal.shotSigPairs(withBin, "doc_id", "bin",
          threshold = 100L, minShared = 2)
        .select($"id_a", $"id_b")
      val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
      withBin.select($"doc_id")
        .join(comp.filter($"node" =!= $"comp").select($"node".as("doc_id")),
          Seq("doc_id"), "left_anti")
        .orderBy($"doc_id")
    }),

    // Recursive hierarchy closure (Hierarchy.rootAndDepth) — the
    // WITH RECURSIVE ancestor-expansion surface Spark SQL lacks,
    // expressed as pointer DOUBLING: O(log depth) rounds instead of one
    // join per level, fixpoint throw on cycles/dangling chains (the
    // connectedComponents discipline). Fixture: the binary-heap tree
    // parent(i) = i/2 over doc ids (node 0 self-parents = root); the
    // oracle is the literal WITH RECURSIVE chain walk.
    "q_tree_closure" -> ((s, dir) => {
      import s.implicits._
      val edges = t(s, dir, "documents")
        .select($"doc_id", ($"doc_id" / 2).cast("long").as("parent"))
      Hierarchy.rootAndDepth(edges, "doc_id", "parent")
        .orderBy($"node")
    }),

    // Subtree-size rollup (Hierarchy.subtreeSizes): proper-descendant
    // counts from the closure-doubled ancestor relation — the org/BOM
    // "how big is each subtree" analytic; n·height closure rows, O(log
    // height) rounds. Oracle walks the literal recursive ancestor CTE
    // and groups.
    "q_subtree_sizes" -> ((s, dir) => {
      import s.implicits._
      val edges = t(s, dir, "documents")
        .select($"doc_id", ($"doc_id" / 2).cast("long").as("parent"))
      Hierarchy.subtreeSizes(edges, "doc_id", "parent")
        .orderBy($"node")
    }),

    // Audio energy segmentation (Multimodal.audioEnergySegments): the
    // VAD-shaped triage — integer Σ|samples| threshold per window,
    // maximal active runs via the islands trick (win − per-clip rank),
    // one bounded per-clip window then a map-side group. Same fixture
    // as q_audio_dedup; the 262144 threshold sits at the random-bytes
    // median so runs form and break naturally.
    "q_audio_segments" -> ((s, dir) => {
      import s.implicits._
      val withBin = audioGroupFixture(s, dir)
      Multimodal.audioEnergySegments(withBin, "doc_id", "bin",
          winSize = 16, minAbsSum = 262144L)
        .orderBy($"doc_id", $"seg_start")
    }),

    // Video shot detection (Multimodal.videoShots): integer L1 distance
    // between consecutive frames' exact channel sums opens a shot above
    // the threshold; two bounded per-video windows (lag + running cut
    // sum) then one group. Fixture: frame content changes only every 3
    // frames (key = id:sh:(f/3)), so shots of ~3 frames fall out and
    // the boundaries are deterministic in both engines.
    "q_shot_detect" -> ((s, dir) => {
      import s.implicits._
      val withBin = shotDetectFixture(s, dir)
      Multimodal.videoShots(withBin, "doc_id", "bin", threshold = 100L)
        .orderBy($"doc_id", $"shot_idx")
    }),

    // Image near-dup: tile-signature matching (Multimodal.imageSigPairs)
    // — the image member of the capped pairwise trio (near-dup where
    // q_media_dedup is the exact-byte tier: same art with a local edit
    // keeps most tile sums). 4×4 PPMs built from four 2×2 quadrants:
    // quadrant 0 is GROUP-seeded for every doc, quadrant 2 group-seeded
    // only when doc_id % 3 ≠ 0 (those docs pair: 2 shared tiles; the
    // %3==0 docs share just one tile and stay below minShared),
    // quadrants 1/3 doc-seeded. Signature = per-tile exact integer
    // channel sums through Dedup.sharedSigPairs (hot-bucket capped +
    // true-count verify); the oracle replays the quadrant byte formula
    // without parsing a PPM byte.
    "q_image_dedup" -> ((s, dir) => {
      import s.implicits._
      def md5bytes(str: String): Array[Byte] =
        graft.expressions.Md5Kernel.digest(str.getBytes("UTF-8"))
      val withBin = t(s, dir, "documents").select($"doc_id").as[Long]
        .map { id =>
          val quad = Array.tabulate(4) { q =>
            val seed =
              if (q == 0) (id % 50) + "gi:0"
              else if (q == 2 && id % 3 != 0) (id % 50) + "gi:2"
              else id + ":qi:" + q
            md5bytes(seed)
          }
          val px = new Array[Byte](48)
          var y = 0
          while (y < 4) {
            var x = 0
            while (x < 4) {
              val q = (y / 2) * 2 + (x / 2)
              val p = (y % 2) * 2 + (x % 2)
              var c = 0
              while (c < 3) {
                px((y * 4 + x) * 3 + c) = quad(q)(p * 3 + c)
                c += 1
              }
              x += 1
            }
            y += 1
          }
          (id, Multimodal.Ppm.encode(Multimodal.Ppm.Image(4, 4, 255, px)))
        }.toDF("doc_id", "bin")
      Multimodal.imageSigPairs(withBin, "doc_id", "bin",
          grid = 2, minShared = 2)
        .orderBy($"id_a", $"id_b")
    }),

    // Perceptual image near-dup (Multimodal.dhashNearDups): 64-bit
    // difference hash — integer BT.601 luma, strict row-adjacent
    // comparisons, MSB-first pack — banded into 4×16-bit exact-match
    // candidates (pigeonhole-complete for hamming ≤ 3) through the
    // capped pair engine, verified with exact bit_count(xor). Fixture:
    // 9×8 PPMs (the dHash grid itself, so resize is the identity and
    // both engines see the same lumas) whose pixels are GROUP-seeded
    // except ONE doc-chosen pixel re-seeded per doc — group members
    // differ in ≤ 2 pixels ⇒ ≤ 4 flipped bits, so some group pairs
    // fall ≤ 3 and others at 4, exercising the threshold from both
    // sides; the oracle replays luma → bits → packed hash → full
    // pairwise hamming in SQL, no banding, proving the banded path
    // loses nothing.
    "q_dhash_neardup" -> ((s, dir) => {
      import s.implicits._
      Multimodal.dhashNearDups(dhashFixture(s, dir), "doc_id", "bin",
          maxHamming = 3)
        .orderBy($"id_a", $"id_b")
    }),

    // End-to-end perceptual image dedup DECISIONS: dHash pairs →
    // connectedComponents → keep the component representative — the
    // image member of the decision-pipeline trio beside
    // q_video_dedup_e2e and q_audio_dedup_e2e (pairs alone don't dedup
    // anything). The oracle replays the full UNBANDED pairwise hamming
    // plus recursive-CTE closure + keep-min, so the decision set — what
    // the banded candidates + hot-bucket cap promise to preserve — is
    // itself hash-checked.
    "q_image_dedup_e2e" -> ((s, dir) => {
      import s.implicits._
      val pairs = Multimodal.dhashNearDups(dhashFixture(s, dir),
          "doc_id", "bin", maxHamming = 3)
        .select($"id_a", $"id_b")
      val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
      dhashFixture(s, dir).select($"doc_id")
        .join(comp.filter($"node" =!= $"comp").select($"node".as("doc_id")),
          Seq("doc_id"), "left_anti")
        .orderBy($"doc_id")
    }),

    // dHash tuning sweep (Multimodal.dhashSweep): the hamming histogram
    // to 7 bits (8×8-bit bands — pigeonhole-complete at that threshold)
    // with running kept-counts — the data-driven threshold picker, same
    // discipline as q_neardup_sweep for text. Same fixture as
    // q_dhash_neardup; the oracle histograms the full unbanded pairwise
    // hamming, proving 8-band recall to 7.
    "q_dhash_sweep" -> ((s, dir) => {
      import s.implicits._
      Multimodal.dhashSweep(dhashFixture(s, dir), "doc_id", "bin")
        .orderBy($"hamming")
    }),

    // NSW-style graph-ANN beam search (Ann.graphBeamSearch, Malkov et
    // al. 2014): greedy best-first over the knnJoin neighbor graph —
    // the graph-based ANN family beside IVF/PQ/SQ/BQ/MRL. Search
    // touches O(beam·degree·hops) vectors regardless of corpus size
    // (the serving-side property); the graph BUILD is the batch
    // knnJoin (cell-bounded). Deterministic entry (min id) + tie
    // order, so the unrolled-hop oracle replays the walk.
    "q_graph_ann" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val edges = Ann.knnJoin(e, cents, "vec_id", "embedding",
        "cent_id", "cvec", 4)
      val query = e.filter($"vec_id" === 42)
        .select($"embedding").head.getSeq[Float](0)
      Ann.graphBeamSearch(edges, e, "vec_id", "embedding", query,
        beam = 8, hops = 3)
    }),

    // HNSW layered graph-ANN (Ann.hnswSearch, Malkov & Yashunin 2018;
    // `rag_demo/ingest.py:13-14` names HNSW as the reference's
    // aspirational index): deterministic md5-pyramid levels
    // (Ann.hnswLevel), one knnJoin graph per level over coarsened
    // cells (Ann.hnswBuild), greedy descent down the upper layers to
    // pick the layer-0 beam entry (Ann.hnswDescend) — so the beam
    // refines inside the query's neighborhood instead of crossing the
    // corpus from the fixed min-id entry. Every step is replayable
    // (md5 levels, min-id entries, quantized-cosine ties to smallest
    // id), so the oracle unrolls the descent hops AND the beam walk.
    "q_hnsw_ann" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val layers = Ann.hnswBuild(e, cents, "vec_id", "embedding",
        "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
      val query = e.filter($"vec_id" === 42)
        .select($"embedding").head.getSeq[Float](0)
      Ann.hnswSearch(layers, e, "vec_id", "embedding", query,
        fanout = 4, beam = 8, hops = 3, descentHops = 2)
    }),

    // BATCHED HNSW (Ann.hnswSearchBatch): the layered descent AND the
    // beams advance for every query simultaneously as DataFrame state —
    // levels·descentHops + 3·hops jobs for ANY query count, vs that
    // many per query on the driver-loop face. Entries are per-query
    // (the descent seam into graphBeamSearchBatch); determinism
    // identical to the single face, so the oracle replays qid-keyed
    // descent hops and beam hops.
    "q_hnsw_ann_batch" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val layers = Ann.hnswBuild(e, cents, "vec_id", "embedding",
        "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
      val queries = e.filter($"vec_id".isin(42L, 137L, 256L))
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      Ann.hnswSearchBatch(layers, e, queries, "vec_id", "embedding",
          "qid", "qvec", fanout = 4, beam = 8, hops = 3, descentHops = 2)
        .orderBy($"qid", $"rank")
    }),

    // INCREMENTAL HNSW ingest (Ann.hnswInsert): the reference's
    // append-only insert (shard/server.py:60-67 appends to the served
    // matrix) for the graph index — a 10% batch lands in a hierarchy
    // built on the other 90% without a rebuild. New nodes take their
    // top-k in-cell neighbors (new ∪ touched existing), touched
    // existing nodes re-rank stored adjacency ∪ new candidates back to
    // bounded degree, untouched cells pass through byte-identical.
    // Output = the whole merged hierarchy, so the oracle verifies the
    // delta AND the pass-through.
    "q_hnsw_insert" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val existing = e.filter(pmod($"vec_id", lit(10)) =!= 7)
      val batch = e.filter(pmod($"vec_id", lit(10)) === 7)
      val cents = existing.filter($"vec_id" < 18)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val layers = Ann.hnswBuild(existing, cents, "vec_id", "embedding",
        "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
      val merged = Ann.hnswInsert(layers, existing, batch, cents,
        "vec_id", "embedding", "cent_id", "cvec", k = 4, fanout = 4)
      merged.zipWithIndex
        .map { case (df, l) => df.withColumn("level", lit(l)) }
        .reduce(_.unionByName(_))
        .select($"level", $"src", $"dst", $"score")
        .orderBy($"level", $"src", $"dst")
    }),

    // HNSW soft delete (Ann.hnswSearchDeleted): tombstoned nodes stay
    // in the edge tables as ROUTING nodes (ripping them out severs the
    // small-world shortcuts until a rebuild) but are filtered from the
    // RESULTS — one broadcast anti-join after the beam, re-rank, k-trim.
    // Completes the graph-index lifecycle (build → insert → delete →
    // search) as the twin of the maintained family's deleteMaintained.
    "q_hnsw_delete" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val layers = Ann.hnswBuild(e, cents, "vec_id", "embedding",
        "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
      val query = e.filter($"vec_id" === 42)
        .select($"embedding").head.getSeq[Float](0)
      val tomb = e.filter(pmod($"vec_id", lit(17)) === 3)
        .select($"vec_id".as("id"))
      Ann.hnswSearchDeleted(layers, e, "vec_id", "embedding", query,
          tomb, "id", fanout = 4, beam = 8, hops = 3, k = 5,
          descentHops = 2)
        .orderBy($"rank")
    }),

    // HNSW tombstone purge (Ann.hnswCompact): re-link ONLY the cells
    // holding a tombstoned member (survivor×survivor top-k — the build
    // recipe on survivors), pass every other cell through
    // byte-identical, drop dead srcs. The contract is EXACT: compacted
    // ≡ hnswBuild on the survivors, level for level — so the oracle
    // replays a build on the tombstone-filtered member sets.
    "q_hnsw_compact" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val layers = Ann.hnswBuild(e, cents, "vec_id", "embedding",
        "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
      val tomb = e.filter(pmod($"vec_id", lit(17)) === 3)
        .select($"vec_id".as("id"))
      val compacted = Ann.hnswCompact(layers, e, tomb, "id", cents,
        "vec_id", "embedding", "cent_id", "cvec", k = 4, fanout = 4)
      compacted.zipWithIndex
        .map { case (df, l) => df.withColumn("level", lit(l)) }
        .reduce(_.unionByName(_))
        .select($"level", $"src", $"dst", $"score")
        .orderBy($"level", $"src", $"dst")
    }),

    // SQuAD-style QA scoring (TextEval.squadScore, Rajpurkar et al.
    // 2016): normalized exact match + clipped-token F1 — the
    // extractive-QA/RAG harness metric, closing the eval family. Same
    // lead-window pairing as the other pair metrics; per-row kernel
    // compute.
    "q_squad_eval" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"source").orderBy($"doc_id")
      val pairs = t(s, dir, "documents")
        .select($"doc_id", $"source", $"text",
          lead($"text", 1).over(w).as("pred"))
        .filter($"pred".isNotNull)
      TextEval.squadScore(pairs, "doc_id", "pred", "text")
        .orderBy($"doc_id")
    }),

    // Sentence-budget chunking (T.sentenceChunks — the LangChain-style
    // default RAG splitter): sentences stay whole, grouped by a
    // 40-token budget via prefix-sum assignment (order-proof, never a
    // greedy reset) — retrieval units that never cut mid-sentence.
    // Pure per-row HOF compute; the posexplode is the only reshaping.
    "q_sentence_chunks" -> ((s, dir) => {
      import s.implicits._
      // the fixture is terminator-free word soup — sentence-ify it
      // deterministically (a period closes every 12th token) so the
      // splitter exercises real boundaries; both engines share the
      // construction. Tokens STAGE as a column behind a filter barrier
      // first — inlined into the index lambda they re-split per element
      // (the CollapseProject trap: 18.3 s vs 0.6 s at sf0.1)
      val staged = t(s, dir, "documents")
        .select($"doc_id", T.tokens($"text").as("__tk"))
        .select($"doc_id", $"__tk", // passthrough: lambda refs are
          // invisible to the collapse guard (sentenceChunkRows scaladoc)
          array_join(transform(sequence(lit(1), size($"__tk")),
            i => when(pmod(i, lit(12)) === 0,
              concat(element_at($"__tk", i), lit(".")))
              .otherwise(element_at($"__tk", i))), " ").as("__t"))
      // __tk rides along as a passthrough attribute (dropping it here
      // would remove the multi-use guard); the final select omits it
      T.sentenceChunkRows(staged, "__t", maxTokens = 40)
        .select($"doc_id", $"sent_idx", $"n_tokens", $"chunk_idx",
          substring($"sent", 1, 30).as("sent_head"))
        .orderBy($"doc_id", $"sent_idx")
    }),

    // Gale-Church sentence alignment (expressions/GaleChurchAlign): the
    // raw document's sentence sequence aligned against a deterministic
    // cleaned REWRITE of itself (per 7-sentence block: sentence 3
    // dropped, 5+6 merged, a filler inserted after 7) — the provenance
    // question of every raw→cleaned curation audit and of bitext
    // mining: which output sentence came from which input sentence,
    // including deletions (1-0), insertions (0-1), and merges (2-1).
    // The aligner sees ONLY the char-length arrays; recovering the
    // constructed move mix is the self-validation (GaleChurchSpec pins
    // it per-block). DP state packs (cost, 6 move counters) into one
    // BIGINT so numeric min IS the lexicographic tie-break — the same
    // single-long cells the oracle's recursive-CTE replay carries.
    // Per-row kernel compute at scan speed; arrays stage as passthrough
    // columns (the CollapseProject trap above).
    "q_sentence_align" -> ((s, dir) => {
      import s.implicits._
      Align.selfRewriteAlign(spread(s, t(s, dir, "documents")),
          "doc_id", "text")
        .orderBy($"doc_id")
    }),

    // Mojibake detection (T.mojibakeCount): UTF-8-read-as-Latin-1/cp1252
    // artifact signatures — the crawl-hygiene flag that catches
    // double-encoded text before it poisons tokenizers and dedup
    // shingles. Fixture is ASCII, so every 5th doc gets a deterministic
    // mojibake suffix appended (identical codepoints on both sides);
    // the repair kernel (cp1252-first transcode round trip) is
    // spec-tested. Pure per-row regex count at scan speed.
    "q_mojibake" -> ((s, dir) => {
      import s.implicits._
      val art = " cafÃ© â€™"
      val d = t(s, dir, "documents")
        .select($"doc_id",
          when(pmod($"doc_id", lit(5L)) === 0L, concat($"text", lit(art)))
            .otherwise($"text").as("__t"))
      d.select($"doc_id", T.mojibakeCount($"__t").as("n_artifacts"))
        .withColumn("flagged", $"n_artifacts" > 0L)
        .orderBy($"doc_id")
    }),

    // Dedup QA harness (Dedup.pairEval): precision/recall/F1 of the
    // MinHash-LSH pair list against a labeled GOLD pair set — the
    // number a threshold choice is justified by. Gold here = the
    // fixture's constructed near-dups (identical 80-char prefixes);
    // the report shows how much of that set LSH at 0.2 recovers and
    // what it over-captures. Pairs canonicalize to (min, max); one
    // id-only join family, one output row.
    "q_dedup_eval" -> ((s, dir) => {
      import s.implicits._
      val d = spread(s, t(s, dir, "documents"))
      val pred = Dedup.nearDupPairs(d, "doc_id", "text",
        shingleSize = 2, numHashes = 16, bands = 4, threshold = 0.2)
      val pre = d.select($"doc_id", substring($"text", 1, 80).as("__h"))
      val gold = pre.select($"doc_id".as("ga"), $"__h")
        .join(pre.select($"doc_id".as("gb"), $"__h"), Seq("__h"))
        .filter($"ga" < $"gb")
        .select($"ga".as("id_a"), $"gb".as("id_b"))
      Dedup.pairEval(pred, gold, "id_a", "id_b")
    }),

    // Jackknife error bar for a corpus metric (Validation.jackknifeMean,
    // Quenouille/Tukey): delete-one-hash-fold SE of the mean event
    // value — integer-exact leave-one-out means, exact BIGINT variance,
    // one float sqrt at the end. One bounded (fold, sum, count) agg.
    "q_jackknife" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Validation.jackknifeMean(
        t(s, dir, "events"), $"value", $"event_id", folds = 10)
    }),

    // BATCHED graph-ANN (Ann.graphBeamSearchBatch): every query's walk
    // advances simultaneously as DataFrame state — 3·hops jobs for ANY
    // query count where the driver-loop walk would pay hops jobs per
    // query. Per hop one frontier⨝edges join, one broadcast-query
    // scoring join, and the k-bounded two-phase per-query top-k.
    "q_graph_ann_batch" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val edges = Ann.knnJoin(e, cents, "vec_id", "embedding",
        "cent_id", "cvec", 4)
      val queries = e.filter($"vec_id".isin(42L, 137L, 256L))
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      Ann.graphBeamSearchBatch(edges, e, queries, "vec_id", "embedding",
          "qid", "qvec", beam = 8, hops = 3)
        .orderBy($"qid", $"rank")
    })
  )

  private def round9Oracles: Map[String, String] = Map(

    // LCS via the row-DP recurrence in a recursive CTE: per reference
    // token k the new row is the prefix running max of
    // e[i] = max(dp_old[i], dp_old[i-1] + match_i) — valid because LCS
    // rows are non-decreasing in i (the same recurrence the native
    // kernel and the HOF spec implement).
    "q_rouge_pairs" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, source,
        |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |p0 AS (
        |  SELECT doc_id, list_slice(toks, 1, 40) AS c,
        |    list_slice(lead(toks) OVER (PARTITION BY source ORDER BY doc_id),
        |               1, 40) AS r
        |  FROM d),
        |p AS (
        |  SELECT doc_id, c, r FROM p0
        |  WHERE r IS NOT NULL AND len(c) > 0 AND len(r) > 0),
        |dp(doc_id, k, row) AS (
        |  SELECT doc_id, 0, list_transform(generate_series(1, len(c)), i -> 0)
        |  FROM p
        |  UNION ALL
        |  SELECT t.doc_id, t.k + 1,
        |    (WITH cells AS (
        |       SELECT i, GREATEST(t.row[i], COALESCE(t.row[i-1], 0) +
        |         CASE WHEN p.c[i] = p.r[t.k + 1] THEN 1 ELSE 0 END) AS e
        |       FROM (SELECT unnest(generate_series(1, len(p.c))) AS i))
        |     SELECT list(m ORDER BY i) FROM (
        |       SELECT i, MAX(e) OVER (ORDER BY i) AS m FROM cells))
        |  FROM dp t JOIN p USING (doc_id)
        |  WHERE t.k < len(p.r)),
        |f AS (
        |  SELECT t.doc_id, len(p.c)::BIGINT AS c_len, len(p.r)::BIGINT AS r_len,
        |         t.row[len(p.c)]::BIGINT AS lcs
        |  FROM dp t JOIN p USING (doc_id) WHERE t.k = len(p.r)),
        |m AS (
        |  SELECT doc_id, c_len, r_len, lcs,
        |    (lcs * 1000000) // c_len AS p_micro,
        |    (lcs * 1000000) // r_len AS r_micro
        |  FROM f)
        |SELECT doc_id, c_len, r_len, lcs, p_micro, r_micro,
        |  (CASE WHEN p_micro + r_micro = 0 THEN 0
        |        ELSE (2 * p_micro * r_micro) // (p_micro + r_micro)
        |   END)::BIGINT AS rouge_l_micro
        |FROM m ORDER BY doc_id""".stripMargin,

    // Farthest-point traversal unrolled: seed = min id, then 4 rounds
    // of (distance to the newly chosen center, running min, argmax with
    // ties to the smallest id). Distances are round-4-quantized squared
    // L2 over the positionally-zipped unnests (q_embed_neardup
    // discipline).
    "q_kcenter" -> {
      def distCte(r: Int, centerSel: String, excl: String): String =
        s"""px$r AS (
           |  SELECT a.vec_id, unnest(a.embedding)::DOUBLE AS x,
           |         unnest(b.embedding)::DOUBLE AS y
           |  FROM embeddings a, embeddings b
           |  WHERE b.vec_id = ($centerSel) AND a.vec_id <> ($centerSel)
           |    $excl),
           |n$r AS (
           |  SELECT vec_id,
           |    CAST(ROUND(ROUND(SUM((x - y) * (x - y)), 4) * 10000) AS BIGINT)
           |      AS d4
           |  FROM px$r GROUP BY vec_id)""".stripMargin
      val rounds = (1 to 4).map { r =>
        val centerSel =
          if (r == 1) "SELECT id FROM c0" else s"SELECT id FROM p${r - 1}"
        val excl =
          if (r == 1) ""
          else s"AND a.vec_id IN (SELECT vec_id FROM m${r - 1}) " +
            s"AND a.vec_id <> (SELECT id FROM p${r - 1})"
        val mDef =
          if (r == 1) s"m1 AS (SELECT vec_id, d4 FROM n1)"
          else
            s"""m$r AS (
               |  SELECT m${r - 1}.vec_id, LEAST(m${r - 1}.d4, n$r.d4) AS d4
               |  FROM m${r - 1} JOIN n$r USING (vec_id))""".stripMargin
        s"""${distCte(r, centerSel, excl)},
           |$mDef,
           |p$r AS (
           |  SELECT vec_id AS id, d4 FROM m$r
           |  ORDER BY d4 DESC, vec_id LIMIT 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH c0 AS (SELECT MIN(vec_id) AS id FROM embeddings),
         |$rounds
         |SELECT 0 AS sel_round, (SELECT id FROM c0)::VARCHAR AS id,
         |       CAST(NULL AS BIGINT) AS d4
         |UNION ALL SELECT 1, (SELECT id FROM p1)::VARCHAR, (SELECT d4 FROM p1)
         |UNION ALL SELECT 2, (SELECT id FROM p2)::VARCHAR, (SELECT d4 FROM p2)
         |UNION ALL SELECT 3, (SELECT id FROM p3)::VARCHAR, (SELECT d4 FROM p3)
         |UNION ALL SELECT 4, (SELECT id FROM p4)::VARCHAR, (SELECT d4 FROM p4)
         |ORDER BY sel_round""".stripMargin
    },

    // Layer peeling unrolled 6 rounds (the sf0.01 fixpoint is reached
    // in 4; peeling at the fixpoint is idempotent, so the extra rounds
    // are no-ops — the bounded-iteration oracle discipline of
    // q_pagerank/q_hits).
    "q_kcore" -> {
      def peel(r: Int): String =
        s"""d$r AS MATERIALIZED (
           |  SELECT n, COUNT(*) AS deg FROM (
           |    SELECT a AS n FROM e${r - 1} UNION ALL SELECT b FROM e${r - 1})
           |  GROUP BY n),
           |k$r AS MATERIALIZED (SELECT n FROM d$r WHERE deg >= 11),
           |e$r AS MATERIALIZED (
           |  SELECT a, b FROM e${r - 1}
           |  WHERE a IN (SELECT n FROM k$r) AND b IN (SELECT n FROM k$r))"""
          .stripMargin
      s"""WITH ui AS (
         |  SELECT DISTINCT user_id AS u, 100000 + event_id % 1000 AS i
         |  FROM events),
         |c AS (SELECT u, i, row_number() OVER (PARTITION BY u ORDER BY i) AS rn
         |      FROM ui),
         |cap AS (SELECT u, i FROM c WHERE rn <= 256),
         |e0 AS MATERIALIZED (
         |  SELECT a.i AS a, b.i AS b
         |  FROM cap a JOIN cap b ON a.u = b.u AND a.i < b.i
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
         |${(1 to 6).map(peel).mkString(",\n")}
         |SELECT n AS node, COUNT(*)::BIGINT AS deg FROM (
         |  SELECT a AS n FROM e6 UNION ALL SELECT b FROM e6)
         |GROUP BY n ORDER BY node""".stripMargin
    },

    // The q_dedup_clusters transitive-closure chain for the cluster
    // representative, then the q_three_way_split hash gate keyed on it.
    "q_leakage_split" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(generate_series(1, len(toks)-1),
        |           i -> toks[i] || ' ' || toks[i+1])) AS sh
        |  FROM t WHERE len(toks) >= 2),
        |sig AS (
        |  SELECT doc_id, sh,
        |         list_transform(generate_series(0, 15), i ->
        |           list_min(list_transform(sh, x ->
        |             ('0x'||substr(md5(i::VARCHAR||':'||x), 1, 15))::BIGINT))) AS sig
        |  FROM s WHERE len(sh) > 0),
        |bands AS (
        |  SELECT doc_id, band_idx,
        |         md5(array_to_string(sig[band_idx*4+1 : band_idx*4+4], ',')) AS bh
        |  FROM (SELECT doc_id, sig, unnest(generate_series(0, 3)) AS band_idx FROM sig)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id da, b.doc_id db
        |  FROM bands a JOIN bands b
        |    ON a.band_idx = b.band_idx AND a.bh = b.bh AND a.doc_id < b.doc_id),
        |p AS (
        |  SELECT da, db FROM (
        |    SELECT da, db,
        |           len(list_intersect(x.sh, y.sh))::DOUBLE /
        |             (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) AS jac
        |    FROM cand JOIN s x ON da = x.doc_id JOIN s y ON db = y.doc_id)
        |  WHERE jac >= 0.2),
        |e AS (SELECT da AS a, db AS b FROM p UNION SELECT db, da FROM p),
        |r AS (
        |  SELECT a AS node, b AS reach FROM e
        |  UNION
        |  SELECT r.node, e.b FROM r JOIN e ON r.reach = e.a),
        |comp AS (
        |  SELECT node AS doc_id, LEAST(node, MIN(reach)) AS cid
        |  FROM r GROUP BY node),
        |rep AS (
        |  SELECT d.doc_id, COALESCE(comp.cid, d.doc_id) AS cluster_rep
        |  FROM documents d LEFT JOIN comp USING (doc_id))
        |SELECT doc_id, cluster_rep,
        |  CASE WHEN ('0x' || substr(md5(cluster_rep::VARCHAR), 1, 15))::BIGINT
        |            % 1000000 < 800000 THEN 'train'
        |       WHEN ('0x' || substr(md5(cluster_rep::VARCHAR), 1, 15))::BIGINT
        |            % 1000000 < 900000 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM rep ORDER BY doc_id""".stripMargin,

    // Two +1-smoothed trigram LMs (general = whole corpus, domain =
    // src0) through the q_ppl_buckets scoring discipline, excess in
    // integer ten-thousandths, median via quantile_disc (the KLL
    // sketch's exact-below-capacity semantics).
    "q_excess_ppl" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |         ' +', ' ', 'g')) AS nt
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, source,
        |    unnest(list_transform(generate_series(1, length(nt) - 2),
        |      i -> substr(nt, i, 3))) AS tri
        |  FROM d WHERE length(nt) >= 3),
        |cg AS (SELECT tri, COUNT(*) AS cnt FROM g GROUP BY tri),
        |sg AS (SELECT SUM(cnt)::DOUBLE AS total, COUNT(*)::DOUBLE AS v FROM cg),
        |mg AS (
        |  SELECT tri,
        |    CAST(ROUND(ROUND(ln((cnt::DOUBLE + 1.0) / (sg.total + sg.v)), 6)
        |         * 1000000) AS BIGINT) AS lp
        |  FROM cg, sg),
        |ug AS (
        |  SELECT CAST(ROUND(ROUND(ln(1.0 / (total + v)), 6) * 1000000) AS BIGINT)
        |    AS ulp
        |  FROM sg),
        |cd AS (SELECT tri, COUNT(*) AS cnt FROM g WHERE source = 'src0'
        |       GROUP BY tri),
        |sd AS (SELECT SUM(cnt)::DOUBLE AS total, COUNT(*)::DOUBLE AS v FROM cd),
        |md AS (
        |  SELECT tri,
        |    CAST(ROUND(ROUND(ln((cnt::DOUBLE + 1.0) / (sd.total + sd.v)), 6)
        |         * 1000000) AS BIGINT) AS lp
        |  FROM cd, sd),
        |ud AS (
        |  SELECT CAST(ROUND(ROUND(ln(1.0 / (total + v)), 6) * 1000000) AS BIGINT)
        |    AS ulp
        |  FROM sd),
        |scg AS (
        |  SELECT g.doc_id, COUNT(*) AS n_tri,
        |         SUM(COALESCE(mg.lp, ug.ulp)) AS lsum
        |  FROM g LEFT JOIN mg USING (tri) CROSS JOIN ug
        |  GROUP BY g.doc_id),
        |scd AS (
        |  SELECT g.doc_id, SUM(COALESCE(md.lp, ud.ulp)) AS lsum
        |  FROM g LEFT JOIN md USING (tri) CROSS JOIN ud
        |  GROUP BY g.doc_id),
        |sc AS (
        |  SELECT scg.doc_id, CAST(scg.n_tri AS BIGINT) AS n_tri,
        |    ROUND((-scg.lsum)::DOUBLE / 1000000.0 / scg.n_tri::DOUBLE, 4) + 0.0
        |      AS nll_gen,
        |    ROUND((-scd.lsum)::DOUBLE / 1000000.0 / scg.n_tri::DOUBLE, 4) + 0.0
        |      AS nll_dom
        |  FROM scg JOIN scd USING (doc_id)),
        |ex AS (
        |  SELECT doc_id, n_tri, nll_gen, nll_dom,
        |    CAST(ROUND(nll_gen * 10000, 0) AS BIGINT)
        |      - CAST(ROUND(nll_dom * 10000, 0) AS BIGINT) AS excess4
        |  FROM sc),
        |b AS (SELECT quantile_disc(excess4, 0.5) AS med FROM ex)
        |SELECT doc_id, n_tri, nll_gen, nll_dom, excess4,
        |  (excess4 >= b.med) AS kept
        |FROM ex, b ORDER BY doc_id""".stripMargin,

    // The q_bpe_train CTE chain with the argmax swapped to the
    // WordPiece likelihood-ratio score: c·10¹² // (cnt(l)·cnt(r)) as
    // HUGEINT floor division (BigInt on the engine side), ties by pair.
    "q_wordpiece_train" -> {
      def pairStep(k: Int): String =
        s"""sym$k AS MATERIALIZED (
           |  SELECT t AS sym, SUM(cnt) AS scnt FROM (
           |    SELECT unnest(s.toks) AS t, s.cnt AS cnt FROM seg${k - 1} s)
           |  GROUP BY t),
           |pairs$k AS (
           |  SELECT p.pair, SUM(s.cnt) AS pcnt
           |  FROM seg${k - 1} s,
           |    (SELECT unnest(list_transform(generate_series(1, len(s.toks)-1), i ->
           |        s.toks[i] || '|' || s.toks[i+1])) AS pair) p
           |  GROUP BY p.pair),
           |m$k AS MATERIALIZED (
           |  SELECT l, r, pcnt::BIGINT AS cnt, $k AS step,
           |    ((pcnt::HUGEINT * 1000000000000)
           |     // (sl.scnt::HUGEINT * sr.scnt::HUGEINT))::BIGINT AS score12
           |  FROM (SELECT string_split(pair, '|')[1] AS l,
           |               string_split(pair, '|')[2] AS r, pcnt, pair
           |        FROM pairs$k) p
           |  JOIN sym$k sl ON sl.sym = p.l
           |  JOIN sym$k sr ON sr.sym = p.r
           |  ORDER BY score12 DESC, pair LIMIT 1)""".stripMargin
      def segStep(k: Int): String =
        s"""app$k(word, cnt, toks, it) AS (
           |  SELECT word, cnt, toks, 0 AS it FROM seg${k - 1}
           |  UNION ALL
           |  SELECT word, cnt,
           |         toks[1:idx-1] || [toks[idx] || toks[idx+1]] || toks[idx+2:], it + 1
           |  FROM (
           |    SELECT a.word, a.cnt, a.toks, a.it,
           |           list_position(list_transform(generate_series(1, len(a.toks)-1), i ->
           |             CASE WHEN a.toks[i] = m.l AND a.toks[i+1] = m.r
           |                  THEN 1 ELSE 0 END), 1) AS idx
           |    FROM app$k a CROSS JOIN m$k m)
           |  WHERE idx IS NOT NULL AND idx > 0),
           |seg$k AS MATERIALIZED (
           |  SELECT word, cnt, max_by(toks, it) AS toks FROM app$k
           |  GROUP BY word, cnt)""".stripMargin
      val parts = (1 to 5).flatMap(k =>
        Seq(pairStep(k)) ++ (if (k < 5) Seq(segStep(k)) else Nil))
      val unions = (2 to 5).map(k => s"UNION ALL SELECT * FROM m$k").mkString(" ")
      s"""WITH RECURSIVE
         |words AS (
         |  SELECT w AS word, COUNT(*)::BIGINT AS cnt FROM (
         |    SELECT regexp_replace(unnest(
         |        CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
         |             ELSE string_split_regex(trim(lower(text)), '\\s+') END),
         |      '[^a-z]', '', 'g') AS w
         |    FROM documents) WHERE w <> '' GROUP BY w),
         |seg0 AS MATERIALIZED (
         |  SELECT word, cnt,
         |    list_transform(generate_series(1, length(word)), i -> substr(word, i, 1))
         |      AS toks
         |  FROM words),
         |${parts.mkString(",\n")}
         |SELECT step, l, r, cnt, score12
         |FROM (SELECT * FROM m1 $unions) ORDER BY step""".stripMargin
    },

    "q_contrastive_crops" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, toks, len(toks)::BIGINT AS n,
        |    GREATEST(1, CAST(FLOOR(len(toks) * 0.5) AS INT)) AS l
        |  FROM t WHERE len(toks) >= 8),
        |o AS (
        |  SELECT doc_id, toks, n, l,
        |    CAST(('0x'||substr(md5(doc_id::VARCHAR || ':a'), 1, 15))::BIGINT
        |         % (n - l + 1) AS INT) AS off_a,
        |    CAST(('0x'||substr(md5(doc_id::VARCHAR || ':b'), 1, 15))::BIGINT
        |         % (n - l + 1) AS INT) AS off_b
        |  FROM s)
        |SELECT doc_id, n AS n_tokens, off_a, off_b,
        |  array_to_string(list_slice(toks, off_a + 1, off_a + l), ' ') AS crop_a,
        |  array_to_string(list_slice(toks, off_b + 1, off_b + l), ' ') AS crop_b
        |FROM o ORDER BY doc_id""".stripMargin,

    // Each KN level mirrored table-for-table; every stored probability
    // ROUND(·, 6), log-probs micro-quantized, doc sums exact integers.
    "q_kn_ppl" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |         ' +', ' ', 'g')) AS nt
        |  FROM documents),
        |gref AS (
        |  SELECT unnest(list_transform(generate_series(1, length(nt) - 2),
        |    i -> substr(nt, i, 3))) AS tri
        |  FROM d WHERE source = 'src0' AND length(nt) >= 3),
        |t3 AS MATERIALIZED (SELECT tri, COUNT(*) AS cnt FROM gref GROUP BY tri),
        |nn AS (SELECT COUNT(*)::DOUBLE AS n FROM t3),
        |uni AS (
        |  SELECT c, ROUND(n1c::DOUBLE / nn.n, 6) AS pc FROM (
        |    SELECT substr(tri, 3, 1) AS c, COUNT(*) AS n1c FROM t3 GROUP BY 1), nn),
        |midctx AS (SELECT substr(tri, 2, 1) AS b, COUNT(*) AS nb FROM t3 GROUP BY 1),
        |nbt AS (
        |  SELECT b, COUNT(*) AS nbt FROM (
        |    SELECT DISTINCT substr(tri, 2, 1) AS b, substr(tri, 3, 1) AS c FROM t3)
        |  GROUP BY b),
        |fb AS (
        |  SELECT m.b, ROUND(0.75 * nbt.nbt / m.nb, 6) AS fb
        |  FROM midctx m JOIN nbt USING (b)),
        |mid AS MATERIALIZED (
        |  SELECT x.b, x.c,
        |    ROUND(GREATEST(x.n1bc - 0.75, 0.0) / m.nb
        |          + 0.75 * nbt.nbt / m.nb * u.pc, 6) AS pmid
        |  FROM (SELECT substr(tri, 2, 1) AS b, substr(tri, 3, 1) AS c,
        |               COUNT(*) AS n1bc FROM t3 GROUP BY 1, 2) x
        |  JOIN midctx m USING (b) JOIN nbt USING (b) JOIN uni u USING (c)),
        |ctx2 AS MATERIALIZED (
        |  SELECT substr(tri, 1, 1) AS a, substr(tri, 2, 1) AS b,
        |         SUM(cnt) AS tot3, ROUND(0.75 * COUNT(*) / SUM(cnt), 6) AS lam
        |  FROM t3 GROUP BY 1, 2),
        |lp AS MATERIALIZED (
        |  SELECT t3.tri,
        |    CAST(ROUND(ROUND(ln(ROUND(GREATEST(t3.cnt - 0.75, 0.0) / c2.tot3
        |      + c2.lam * mid.pmid, 6)), 6) * 1000000) AS BIGINT) AS lp
        |  FROM t3
        |  JOIN ctx2 c2 ON substr(t3.tri, 1, 1) = c2.a AND substr(t3.tri, 2, 1) = c2.b
        |  JOIN mid ON substr(t3.tri, 2, 1) = mid.b AND substr(t3.tri, 3, 1) = mid.c),
        |g AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, length(nt) - 2),
        |    i -> substr(nt, i, 3))) AS tri
        |  FROM d WHERE length(nt) >= 3),
        |j AS (
        |  SELECT g.doc_id, lp.lp, c2.lam, mid.pmid, fb.fb, uni.pc, nn.n
        |  FROM g
        |  LEFT JOIN lp USING (tri)
        |  LEFT JOIN ctx2 c2 ON substr(g.tri, 1, 1) = c2.a AND substr(g.tri, 2, 1) = c2.b
        |  LEFT JOIN mid ON substr(g.tri, 2, 1) = mid.b AND substr(g.tri, 3, 1) = mid.c
        |  LEFT JOIN fb ON substr(g.tri, 2, 1) = fb.b
        |  LEFT JOIN uni ON substr(g.tri, 3, 1) = uni.c
        |  CROSS JOIN nn),
        |e1 AS (
        |  SELECT doc_id, lp, lam, pmid, fb,
        |    COALESCE(pc, ROUND(1.0 / (2 * n), 6)) AS pce
        |  FROM j),
        |e2 AS (
        |  SELECT doc_id, lp, lam,
        |    COALESCE(pmid, CASE WHEN fb IS NOT NULL THEN ROUND(fb * pce, 6)
        |                        ELSE pce END) AS pme
        |  FROM e1),
        |e3 AS (
        |  SELECT doc_id, lp,
        |    CASE WHEN lam IS NOT NULL THEN ROUND(lam * pme, 6) ELSE pme END AS pf
        |  FROM e2),
        |sc AS (
        |  SELECT doc_id, COUNT(*) AS n_tri,
        |    SUM(COALESCE(lp,
        |      CAST(ROUND(ROUND(ln(pf), 6) * 1000000) AS BIGINT))) AS s
        |  FROM e3 GROUP BY doc_id)
        |SELECT doc_id, CAST(n_tri AS BIGINT) AS n_tri,
        |  ROUND((-s)::DOUBLE / 1000000.0 / n_tri::DOUBLE, 4) + 0.0 AS nll
        |FROM sc ORDER BY doc_id""".stripMargin,

    "q_curriculum" ->
      """WITH x AS (
        |  SELECT doc_id,
        |         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |              ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |y AS (
        |  SELECT doc_id, len(toks)::DOUBLE AS nt,
        |         len(list_filter(toks, t -> list_contains(
        |           ['the','a','of','and','to','in','is'], t)))::DOUBLE AS stop_hits
        |  FROM x),
        |sc AS (
        |  SELECT doc_id,
        |    CAST(ROUND(ROUND(LEAST(nt/100.0, 1.0)
        |         * (0.7 + 0.3 * stop_hits / GREATEST(nt, 1.0)), 4) * 10000)
        |      AS BIGINT) AS q4
        |  FROM y),
        |b AS (
        |  SELECT quantile_disc(q4, 0.33) AS b33, quantile_disc(q4, 0.66) AS b66
        |  FROM sc)
        |SELECT doc_id, q4,
        |  CASE WHEN q4 > b66 THEN 0 WHEN q4 > b33 THEN 1 ELSE 2 END AS stage,
        |  ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 1000000 AS ord
        |FROM sc, b ORDER BY doc_id""".stripMargin,

    // Rolling-hash boundaries replicated with precomputed B^j mod M
    // power literals (window recomputed per position — the HOF-twin
    // formulation; the engine's rolling kernel is congruent mod M).
    "q_cdc_dedup" -> {
      val M = 1000000007L
      val B = 257L
      val w = 16
      val pows = Array.iterate(1L, w)(p => p * B % M).reverse
      val hExpr = pows.indices.map(j =>
        s"ord(substr(nt, p - ${w} + 1 + ${j}, 1))::BIGINT * ${pows(j)}")
        .mkString("(", " + ", s") % $M")
      s"""WITH d AS (
         |  SELECT doc_id,
         |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
         |         ' +', ' ', 'g')) AS nt
         |  FROM documents),
         |st AS (
         |  SELECT doc_id, nt,
         |    CASE WHEN length(nt) <= $w THEN [0]
         |    ELSE [0] || list_filter(generate_series($w, length(nt) - 1),
         |      p -> ($hExpr) % 32 = 31) END AS starts
         |  FROM d WHERE length(nt) > 0),
         |ch AS (
         |  SELECT doc_id, len(starts)::BIGINT AS n_chunks,
         |    list_transform(generate_series(1, len(starts)), k ->
         |      substr(nt, starts[k] + 1,
         |        (CASE WHEN k < len(starts) THEN starts[k + 1]
         |              ELSE length(nt) END) - starts[k])) AS chunks
         |  FROM st),
         |ex AS (
         |  SELECT doc_id,
         |    ('0x' || substr(md5(unnest(chunks)), 1, 15))::BIGINT AS h
         |  FROM ch),
         |dup AS (SELECT h FROM ex GROUP BY h HAVING COUNT(*) >= 2),
         |nd AS (
         |  SELECT doc_id, COUNT(*)::BIGINT AS n_dup FROM ex
         |  WHERE h IN (SELECT h FROM dup) GROUP BY doc_id)
         |SELECT ch.doc_id, ch.n_chunks, COALESCE(nd.n_dup, 0) AS n_dup
         |FROM ch LEFT JOIN nd USING (doc_id) ORDER BY ch.doc_id""".stripMargin
    },

    "q_groundedness" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, toks AS ctx,
        |    lead(toks) OVER (PARTITION BY source ORDER BY doc_id) AS ans
        |  FROM d),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(ans) < 2 THEN CAST([] AS VARCHAR[])
        |         ELSE list_transform(generate_series(1, len(ans) - 1),
        |                i -> ans[i] || ' ' || ans[i + 1]) END AS a2,
        |    CASE WHEN len(ctx) < 2 THEN CAST([] AS VARCHAR[])
        |         ELSE list_transform(generate_series(1, len(ctx) - 1),
        |                i -> ctx[i] || ' ' || ctx[i + 1]) END AS c2
        |  FROM p WHERE ans IS NOT NULL),
        |m AS (
        |  SELECT doc_id, len(a2)::BIGINT AS a_len,
        |    COALESCE(list_sum(list_transform(list_distinct(a2),
        |      x -> LEAST(len(list_filter(a2, y -> y = x)),
        |                 len(list_filter(c2, y -> y = x))))), 0)::BIGINT
        |      AS n_grounded
        |  FROM g WHERE len(a2) > 0)
        |SELECT doc_id, a_len, n_grounded,
        |  (n_grounded * 1000000) // a_len AS grounded_micro
        |FROM m ORDER BY doc_id""".stripMargin,

    "q_l_diversity" ->
      """SELECT source, lang, COUNT(*)::BIGINT AS n,
        |  COUNT(DISTINCT length(text) % 4)::BIGINT AS n_sensitive,
        |  COUNT(DISTINCT length(text) % 4) < 3 AS suppress
        |FROM documents GROUP BY source, lang
        |ORDER BY source, lang""".stripMargin,

    // Every feature recomputed from the md5 generative formula — the
    // oracle never parses a PPM byte, so the engine's real parser is
    // checked against an independent derivation.
    "q_ppm_decode" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    4 + ('0x'||substr(md5(doc_id::VARCHAR || ':w'), 1, 15))::BIGINT % 5 AS w,
        |    4 + ('0x'||substr(md5(doc_id::VARCHAR || ':h'), 1, 15))::BIGINT % 5 AS h
        |  FROM documents),
        |px AS MATERIALIZED (
        |  SELECT doc_id, w, h, j,
        |    ('0x'||substr(md5(doc_id::VARCHAR || ':' || (j // 16)),
        |      (j % 16) * 2 + 1, 2))::INT AS b
        |  FROM (SELECT doc_id, w, h, unnest(generate_series(0, w*h*3 - 1)) AS j
        |        FROM dims)),
        |ch AS (
        |  SELECT doc_id, MAX(w) AS w, MAX(h) AS h,
        |    SUM(CASE WHEN j % 3 = 0 THEN b ELSE 0 END)::DOUBLE AS s0,
        |    SUM(CASE WHEN j % 3 = 1 THEN b ELSE 0 END)::DOUBLE AS s1,
        |    SUM(CASE WHEN j % 3 = 2 THEN b ELSE 0 END)::DOUBLE AS s2
        |  FROM px GROUP BY doc_id),
        |lu AS (
        |  SELECT p.doc_id, x.x,
        |    MAX(CASE WHEN p.j = 3 * (x.x * c.w // 2) THEN p.b END) AS r,
        |    MAX(CASE WHEN p.j = 3 * (x.x * c.w // 2) + 1 THEN p.b END) AS g,
        |    MAX(CASE WHEN p.j = 3 * (x.x * c.w // 2) + 2 THEN p.b END) AS bb
        |  FROM px p JOIN ch c USING (doc_id),
        |       (SELECT unnest([0, 1]) AS x) x
        |  GROUP BY p.doc_id, x.x),
        |lum AS (
        |  SELECT doc_id,
        |    MAX(CASE WHEN x = 0 THEN v END) AS l0,
        |    MAX(CASE WHEN x = 1 THEN v END) AS l1
        |  FROM (SELECT doc_id, x,
        |          ROUND(CAST((0.299 * r + 0.587 * g + 0.114 * bb) / 255
        |                AS FLOAT)::DOUBLE, 4) AS v
        |        FROM lu)
        |  GROUP BY doc_id)
        |SELECT ch.doc_id, (11 + w * h * 3)::BIGINT AS n_bytes,
        |  w::INT AS width, h::INT AS height, 'ppm' AS format,
        |  ROUND(CAST(s0 / (w * h) / 255 AS FLOAT)::DOUBLE, 4) AS f0,
        |  ROUND(CAST(s1 / (w * h) / 255 AS FLOAT)::DOUBLE, 4) AS f1,
        |  ROUND(CAST(s2 / (w * h) / 255 AS FLOAT)::DOUBLE, 4) AS f2,
        |  lum.l0, lum.l1
        |FROM ch JOIN lum USING (doc_id) ORDER BY ch.doc_id""".stripMargin,

    "q_wav_decode" ->
      """WITH nn AS (
        |  SELECT doc_id,
        |    64 + ('0x'||substr(md5(doc_id::VARCHAR || ':n'), 1, 15))::BIGINT % 64 AS n
        |  FROM documents),
        |sm AS MATERIALIZED (
        |  SELECT doc_id, n, j,
        |    ('0x'||substr(md5(doc_id::VARCHAR || ':s:' || (2*j // 16)),
        |      ((2*j) % 16) * 2 + 1, 2))::INT AS b0,
        |    ('0x'||substr(md5(doc_id::VARCHAR || ':s:' || ((2*j+1) // 16)),
        |      ((2*j+1) % 16) * 2 + 1, 2))::INT AS b1
        |  FROM (SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS j
        |        FROM nn)),
        |v AS (
        |  SELECT doc_id, n, j,
        |    CASE WHEN b1 * 256 + b0 >= 32768 THEN b1 * 256 + b0 - 65536
        |         ELSE b1 * 256 + b0 END AS s
        |  FROM sm),
        |z AS (
        |  SELECT doc_id, j, s,
        |    lag(s) OVER (PARTITION BY doc_id ORDER BY j) AS prev
        |  FROM v),
        |agg AS (
        |  SELECT doc_id, MAX(n) AS n,
        |    SUM((s::BIGINT) * (s::BIGINT))::DOUBLE AS ss,
        |    MAX(ABS(s))::DOUBLE AS peak
        |  FROM v GROUP BY doc_id),
        |zc AS (
        |  SELECT doc_id,
        |    (COUNT(*) FILTER (WHERE prev IS NOT NULL
        |       AND (s >= 0) <> (prev >= 0)))::DOUBLE AS zc
        |  FROM z GROUP BY doc_id)
        |SELECT a.doc_id, (44 + 2 * a.n)::BIGINT AS n_bytes,
        |  8000 AS sample_rate, a.n::INT AS n_samples, 'wav' AS format,
        |  ROUND(CAST(sqrt(a.ss / a.n) / 32768 AS FLOAT)::DOUBLE, 4) AS rms,
        |  ROUND(CAST(zc.zc / a.n AS FLOAT)::DOUBLE, 4) AS zcr,
        |  ROUND(CAST(a.peak / 32768 AS FLOAT)::DOUBLE, 4) AS peak
        |FROM agg a JOIN zc USING (doc_id) ORDER BY a.doc_id""".stripMargin,

    // Frame selection (every 2nd of the md5-derived frame count) and
    // per-frame channel means replayed from the generative formula —
    // no container byte is read.
    "q_frame_sample" ->
      """WITH nn AS (
        |  SELECT doc_id,
        |    CAST(2 + ('0x'||substr(md5(doc_id::VARCHAR || ':n'), 1, 15))::BIGINT % 5
        |      AS INT) AS nf
        |  FROM documents),
        |sf AS (
        |  SELECT doc_id, nf, f FROM (
        |    SELECT doc_id, nf, unnest(generate_series(0, nf - 1)) AS f FROM nn)
        |  WHERE f % 2 = 0),
        |px AS MATERIALIZED (
        |  SELECT doc_id, nf, f, j,
        |    ('0x'||substr(md5(doc_id::VARCHAR || ':' || f || ':' || (j // 16)),
        |      (j % 16) * 2 + 1, 2))::INT AS b
        |  FROM (SELECT doc_id, nf, f, unnest(generate_series(0, 47)) AS j
        |        FROM sf)),
        |ch AS (
        |  SELECT doc_id, f, MAX(nf) AS nf,
        |    SUM(CASE WHEN j % 3 = 0 THEN b ELSE 0 END)::DOUBLE AS s0,
        |    SUM(CASE WHEN j % 3 = 1 THEN b ELSE 0 END)::DOUBLE AS s1,
        |    SUM(CASE WHEN j % 3 = 2 THEN b ELSE 0 END)::DOUBLE AS s2
        |  FROM px GROUP BY doc_id, f)
        |SELECT doc_id, f::INT AS frame_idx, nf::INT AS n_frames,
        |  4 AS width, 4 AS height,
        |  ROUND(CAST(s0 / 16 / 255 AS FLOAT)::DOUBLE, 4) AS f0,
        |  ROUND(CAST(s1 / 16 / 255 AS FLOAT)::DOUBLE, 4) AS f1,
        |  ROUND(CAST(s2 / 16 / 255 AS FLOAT)::DOUBLE, 4) AS f2
        |FROM ch ORDER BY doc_id, frame_idx""".stripMargin,

    // Only the sampled (even) frames matter for the pair join; their
    // group-seeded channel sums replay straight from the md5 formula.
    "q_video_dedup" ->
      """WITH nn AS (
        |  SELECT doc_id,
        |    CAST(2 + ('0x'||substr(md5(doc_id::VARCHAR || ':n'), 1, 15))::BIGINT % 5
        |      AS INT) AS nf
        |  FROM documents),
        |sf AS (
        |  SELECT doc_id, f FROM (
        |    SELECT doc_id, unnest(generate_series(0, nf - 1)) AS f FROM nn)
        |  WHERE f % 2 = 0),
        |px AS MATERIALIZED (
        |  SELECT doc_id, f, j,
        |    ('0x'||substr(md5((doc_id % 50)::VARCHAR || 'g:' || f || ':' || (j // 16)),
        |      (j % 16) * 2 + 1, 2))::INT AS b
        |  FROM (SELECT doc_id, f, unnest(generate_series(0, 47)) AS j
        |        FROM sf)),
        |ch AS (
        |  SELECT doc_id, f,
        |    SUM(CASE WHEN j % 3 = 0 THEN b ELSE 0 END)::BIGINT AS s0,
        |    SUM(CASE WHEN j % 3 = 1 THEN b ELSE 0 END)::BIGINT AS s1,
        |    SUM(CASE WHEN j % 3 = 2 THEN b ELSE 0 END)::BIGINT AS s2
        |  FROM px GROUP BY doc_id, f)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*)::BIGINT AS n_shared
        |FROM ch a JOIN ch b
        |  ON a.f = b.f AND a.s0 = b.s0 AND a.s1 = b.s1 AND a.s2 = b.s2
        |  AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // Pairs replayed as in q_video_dedup, then recursive-CTE transitive
    // closure to the min label and keep-the-representative — the full
    // decision set, independent of the engine's pointer-jumping rounds.
    "q_video_dedup_e2e" ->
      """WITH RECURSIVE nn AS (
        |  SELECT doc_id,
        |    CAST(2 + ('0x'||substr(md5(doc_id::VARCHAR || ':n'), 1, 15))::BIGINT % 5
        |      AS INT) AS nf
        |  FROM documents),
        |sf AS (
        |  SELECT doc_id, f FROM (
        |    SELECT doc_id, unnest(generate_series(0, nf - 1)) AS f FROM nn)
        |  WHERE f % 2 = 0),
        |px AS MATERIALIZED (
        |  SELECT doc_id, f, j,
        |    ('0x'||substr(md5((doc_id % 50)::VARCHAR || 'g:' || f || ':' || (j // 16)),
        |      (j % 16) * 2 + 1, 2))::INT AS b
        |  FROM (SELECT doc_id, f, unnest(generate_series(0, 47)) AS j
        |        FROM sf)),
        |ch AS (
        |  SELECT doc_id, f,
        |    SUM(CASE WHEN j % 3 = 0 THEN b ELSE 0 END)::BIGINT AS s0,
        |    SUM(CASE WHEN j % 3 = 1 THEN b ELSE 0 END)::BIGINT AS s1,
        |    SUM(CASE WHEN j % 3 = 2 THEN b ELSE 0 END)::BIGINT AS s2
        |  FROM px GROUP BY doc_id, f),
        |pr AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db
        |  FROM ch a JOIN ch b
        |    ON a.f = b.f AND a.s0 = b.s0 AND a.s1 = b.s1 AND a.s2 = b.s2
        |    AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |e AS (SELECT da AS a, db AS b FROM pr UNION SELECT db, da FROM pr),
        |r AS (
        |  SELECT a AS node, b AS reach FROM e
        |  UNION
        |  SELECT r.node, e.b FROM r JOIN e ON r.reach = e.a),
        |lab AS (
        |  SELECT node, LEAST(node, MIN(reach)) AS comp
        |  FROM r GROUP BY node)
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT node FROM lab WHERE node <> comp)
        |ORDER BY doc_id""".stripMargin,

    // Per-window exact integer sums replayed from the generative md5
    // byte layout (group-seeded even windows), then the pair self-join
    // on (win_idx, wsum, wabs) with the >= 2 shared-window threshold.
    "q_audio_dedup" ->
      """WITH nw AS (
        |  SELECT doc_id,
        |    CAST(2 + ('0x'||substr(md5(doc_id::VARCHAR || ':nw'), 1, 15))::BIGINT % 5
        |      AS INT) AS nw
        |  FROM documents),
        |wd AS (
        |  SELECT doc_id, w,
        |    CASE WHEN w % 2 = 0 THEN (doc_id % 50)::VARCHAR || 'ga:' || w
        |         ELSE doc_id::VARCHAR || ':aw:' || w END AS seed
        |  FROM (SELECT doc_id, unnest(generate_series(0, nw - 1)) AS w FROM nw)),
        |sm AS MATERIALIZED (
        |  SELECT doc_id, w, j,
        |    ('0x'||substr(md5(seed || ':' || (2*j // 16)),
        |      ((2*j) % 16) * 2 + 1, 2))::INT AS b0,
        |    ('0x'||substr(md5(seed || ':' || ((2*j+1) // 16)),
        |      ((2*j+1) % 16) * 2 + 1, 2))::INT AS b1
        |  FROM (SELECT doc_id, w, seed, unnest(generate_series(0, 15)) AS j
        |        FROM wd)),
        |v AS (
        |  SELECT doc_id, w,
        |    CASE WHEN b1 * 256 + b0 >= 32768 THEN b1 * 256 + b0 - 65536
        |         ELSE b1 * 256 + b0 END AS s
        |  FROM sm),
        |sg AS (
        |  SELECT doc_id, w, SUM(s)::BIGINT AS wsum, SUM(ABS(s))::BIGINT AS wabs
        |  FROM v GROUP BY doc_id, w)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*)::BIGINT AS n_shared
        |FROM sg a JOIN sg b
        |  ON a.w = b.w AND a.wsum = b.wsum AND a.wabs = b.wabs
        |  AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // The q_audio_dedup window replay with w%4==3 silenced, then the
    // gaps-and-islands active gate (runs of >= 2 windows with
    // wabs >= 1) BEFORE the pair self-join — silence and isolated
    // blips never become candidates.
    "q_audio_dedup_gated" ->
      """WITH nw AS (
        |  SELECT doc_id,
        |    CAST(2 + ('0x'||substr(md5(doc_id::VARCHAR || ':nw'), 1, 15))::BIGINT % 5
        |      AS INT) AS nw
        |  FROM documents),
        |wd AS (
        |  SELECT doc_id, w,
        |    CASE WHEN w % 2 = 0 THEN (doc_id % 50)::VARCHAR || 'ga:' || w
        |         ELSE doc_id::VARCHAR || ':aw:' || w END AS seed
        |  FROM (SELECT doc_id, unnest(generate_series(0, nw - 1)) AS w FROM nw)
        |  WHERE w % 4 <> 3),
        |sm AS MATERIALIZED (
        |  SELECT doc_id, w, j,
        |    ('0x'||substr(md5(seed || ':' || (2*j // 16)),
        |      ((2*j) % 16) * 2 + 1, 2))::INT AS b0,
        |    ('0x'||substr(md5(seed || ':' || ((2*j+1) // 16)),
        |      ((2*j+1) % 16) * 2 + 1, 2))::INT AS b1
        |  FROM (SELECT doc_id, w, seed, unnest(generate_series(0, 15)) AS j
        |        FROM wd)),
        |v AS (
        |  SELECT doc_id, w,
        |    CASE WHEN b1 * 256 + b0 >= 32768 THEN b1 * 256 + b0 - 65536
        |         ELSE b1 * 256 + b0 END AS s
        |  FROM sm),
        |sg AS (
        |  SELECT doc_id, w, SUM(s)::BIGINT AS wsum, SUM(ABS(s))::BIGINT AS wabs
        |  FROM v GROUP BY doc_id, w),
        |act AS (
        |  SELECT doc_id, w, wsum, wabs,
        |    w - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY w) AS grp
        |  FROM sg WHERE wabs >= 1),
        |gated AS (
        |  SELECT doc_id, w, wsum, wabs FROM (
        |    SELECT doc_id, w, wsum, wabs,
        |      COUNT(*) OVER (PARTITION BY doc_id, grp) AS segn
        |    FROM act)
        |  WHERE segn >= 2)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*)::BIGINT AS n_shared
        |FROM gated a JOIN gated b
        |  ON a.w = b.w AND a.wsum = b.wsum AND a.wabs = b.wabs
        |  AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // The gated-pair replay, then transitive closure + keep-min — the
    // audio decision set (silence never drives a drop).
    "q_audio_dedup_e2e" ->
      """WITH RECURSIVE nw AS (
        |  SELECT doc_id,
        |    CAST(2 + ('0x'||substr(md5(doc_id::VARCHAR || ':nw'), 1, 15))::BIGINT % 5
        |      AS INT) AS nw
        |  FROM documents),
        |wd AS (
        |  SELECT doc_id, w,
        |    CASE WHEN w % 2 = 0 THEN (doc_id % 50)::VARCHAR || 'ga:' || w
        |         ELSE doc_id::VARCHAR || ':aw:' || w END AS seed
        |  FROM (SELECT doc_id, unnest(generate_series(0, nw - 1)) AS w FROM nw)
        |  WHERE w % 4 <> 3),
        |sm AS MATERIALIZED (
        |  SELECT doc_id, w, j,
        |    ('0x'||substr(md5(seed || ':' || (2*j // 16)),
        |      ((2*j) % 16) * 2 + 1, 2))::INT AS b0,
        |    ('0x'||substr(md5(seed || ':' || ((2*j+1) // 16)),
        |      ((2*j+1) % 16) * 2 + 1, 2))::INT AS b1
        |  FROM (SELECT doc_id, w, seed, unnest(generate_series(0, 15)) AS j
        |        FROM wd)),
        |v AS (
        |  SELECT doc_id, w,
        |    CASE WHEN b1 * 256 + b0 >= 32768 THEN b1 * 256 + b0 - 65536
        |         ELSE b1 * 256 + b0 END AS s
        |  FROM sm),
        |sg AS (
        |  SELECT doc_id, w, SUM(s)::BIGINT AS wsum, SUM(ABS(s))::BIGINT AS wabs
        |  FROM v GROUP BY doc_id, w),
        |act AS (
        |  SELECT doc_id, w, wsum, wabs,
        |    w - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY w) AS grp
        |  FROM sg WHERE wabs >= 1),
        |gated AS (
        |  SELECT doc_id, w, wsum, wabs FROM (
        |    SELECT doc_id, w, wsum, wabs,
        |      COUNT(*) OVER (PARTITION BY doc_id, grp) AS segn
        |    FROM act)
        |  WHERE segn >= 2),
        |pr AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db
        |  FROM gated a JOIN gated b
        |    ON a.w = b.w AND a.wsum = b.wsum AND a.wabs = b.wabs
        |    AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |e AS (SELECT da AS a, db AS b FROM pr UNION SELECT db, da FROM pr),
        |r AS (
        |  SELECT a AS node, b AS reach FROM e
        |  UNION
        |  SELECT r.node, e.b FROM r JOIN e ON r.reach = e.a),
        |lab AS (
        |  SELECT node, LEAST(node, MIN(reach)) AS comp
        |  FROM r GROUP BY node)
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT node FROM lab WHERE node <> comp)
        |ORDER BY doc_id""".stripMargin,

    // Frame sums from the prefix-shifted shot fixture, the q_shot_detect
    // lag-cut replay, per-shot CONTENT rollup (n_frames + channel-sum
    // totals, no position), DISTINCT shot contents per video, the
    // >= 2 distinct-shared-shot pair join, then transitive closure +
    // keep-min — the full shot-level dedup decision set.
    "q_shot_dedup_e2e" ->
      """WITH RECURSIVE nn AS (
        |  SELECT doc_id,
        |    CAST(2 + ('0x'||substr(md5(doc_id::VARCHAR || ':nsd'), 1, 15))::BIGINT % 3
        |      AS INT) AS nsh,
        |    (doc_id % 3)::INT AS pre
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id, pre, unnest(generate_series(0, nsh * 3 - 1)) AS f
        |  FROM nn),
        |ky AS (
        |  SELECT doc_id, f,
        |    CASE WHEN (f // 3) >= pre AND (f // 3) - pre < 2
        |         THEN (doc_id % 50)::VARCHAR || 'gs:' || ((f // 3) - pre)
        |         ELSE doc_id::VARCHAR || ':pd:' || (f // 3) END AS key
        |  FROM fr),
        |px AS MATERIALIZED (
        |  SELECT doc_id, f, j,
        |    ('0x'||substr(md5(key || ':' || (j // 16)),
        |      (j % 16) * 2 + 1, 2))::INT AS b
        |  FROM (SELECT doc_id, f, key, unnest(generate_series(0, 47)) AS j
        |        FROM ky)),
        |ch AS (
        |  SELECT doc_id, f,
        |    SUM(CASE WHEN j % 3 = 0 THEN b ELSE 0 END)::BIGINT AS s0,
        |    SUM(CASE WHEN j % 3 = 1 THEN b ELSE 0 END)::BIGINT AS s1,
        |    SUM(CASE WHEN j % 3 = 2 THEN b ELSE 0 END)::BIGINT AS s2
        |  FROM px GROUP BY doc_id, f),
        |d AS (
        |  SELECT doc_id, f, s0, s1, s2,
        |    lag(s0) OVER w AS p0, lag(s1) OVER w AS p1, lag(s2) OVER w AS p2
        |  FROM ch WINDOW w AS (PARTITION BY doc_id ORDER BY f)),
        |c AS (
        |  SELECT doc_id, f, s0, s1, s2,
        |    CASE WHEN f = 0 THEN 1
        |         WHEN abs(s0 - p0) + abs(s1 - p1) + abs(s2 - p2) > 100 THEN 1
        |         ELSE 0 END AS cut
        |  FROM d),
        |sh AS (
        |  SELECT doc_id, f, s0, s1, s2,
        |    SUM(cut) OVER (PARTITION BY doc_id ORDER BY f) - 1 AS shot_idx
        |  FROM c),
        |sg AS (
        |  SELECT DISTINCT doc_id, n_frames, t0, t1, t2 FROM (
        |    SELECT doc_id, shot_idx, COUNT(*)::BIGINT AS n_frames,
        |      SUM(s0)::BIGINT AS t0, SUM(s1)::BIGINT AS t1,
        |      SUM(s2)::BIGINT AS t2
        |    FROM sh GROUP BY doc_id, shot_idx)),
        |pr AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db
        |  FROM sg a JOIN sg b
        |    ON a.n_frames = b.n_frames AND a.t0 = b.t0 AND a.t1 = b.t1
        |    AND a.t2 = b.t2 AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |e AS (SELECT da AS a, db AS b FROM pr UNION SELECT db, da FROM pr),
        |r AS (
        |  SELECT a AS node, b AS reach FROM e
        |  UNION
        |  SELECT r.node, e.b FROM r JOIN e ON r.reach = e.a),
        |lab AS (
        |  SELECT node, LEAST(node, MIN(reach)) AS comp
        |  FROM r GROUP BY node)
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT node FROM lab WHERE node <> comp)
        |ORDER BY doc_id""".stripMargin,

    // The literal recursive ancestor chain, grouped by ancestor.
    "q_subtree_sizes" ->
      """WITH RECURSIVE r AS (
        |  SELECT doc_id AS node, (doc_id // 2)::BIGINT AS anc, 1 AS dist
        |  FROM documents WHERE doc_id >= 1
        |  UNION ALL
        |  SELECT node, (anc // 2)::BIGINT, dist + 1 FROM r WHERE anc >= 1)
        |SELECT anc AS node, COUNT(*)::BIGINT AS n_desc
        |FROM r GROUP BY anc ORDER BY node""".stripMargin,

    // The literal WITH RECURSIVE chain walk the engine's pointer
    // doubling must reproduce.
    "q_tree_closure" ->
      """WITH RECURSIVE r AS (
        |  SELECT doc_id AS node, (doc_id // 2)::BIGINT AS anc,
        |    CASE WHEN doc_id // 2 = doc_id THEN 0 ELSE 1 END AS depth
        |  FROM documents
        |  UNION ALL
        |  SELECT node, (anc // 2)::BIGINT, depth + 1 FROM r
        |  WHERE anc // 2 <> anc)
        |SELECT node, anc AS root, depth::BIGINT AS depth FROM r
        |WHERE anc // 2 = anc
        |ORDER BY node""".stripMargin,

    // The q_audio_dedup window replay up to (doc, w, wabs), then the
    // classic gaps-and-islands: active filter, w − rank group key,
    // per-run min/max/count/sum.
    "q_audio_segments" ->
      """WITH nw AS (
        |  SELECT doc_id,
        |    CAST(2 + ('0x'||substr(md5(doc_id::VARCHAR || ':nw'), 1, 15))::BIGINT % 5
        |      AS INT) AS nw
        |  FROM documents),
        |wd AS (
        |  SELECT doc_id, w,
        |    CASE WHEN w % 2 = 0 THEN (doc_id % 50)::VARCHAR || 'ga:' || w
        |         ELSE doc_id::VARCHAR || ':aw:' || w END AS seed
        |  FROM (SELECT doc_id, unnest(generate_series(0, nw - 1)) AS w FROM nw)),
        |sm AS MATERIALIZED (
        |  SELECT doc_id, w, j,
        |    ('0x'||substr(md5(seed || ':' || (2*j // 16)),
        |      ((2*j) % 16) * 2 + 1, 2))::INT AS b0,
        |    ('0x'||substr(md5(seed || ':' || ((2*j+1) // 16)),
        |      ((2*j+1) % 16) * 2 + 1, 2))::INT AS b1
        |  FROM (SELECT doc_id, w, seed, unnest(generate_series(0, 15)) AS j
        |        FROM wd)),
        |v AS (
        |  SELECT doc_id, w,
        |    CASE WHEN b1 * 256 + b0 >= 32768 THEN b1 * 256 + b0 - 65536
        |         ELSE b1 * 256 + b0 END AS s
        |  FROM sm),
        |sg AS (
        |  SELECT doc_id, w, SUM(ABS(s))::BIGINT AS wabs
        |  FROM v GROUP BY doc_id, w),
        |act AS (
        |  SELECT doc_id, w, wabs,
        |    w - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY w) AS grp
        |  FROM sg WHERE wabs >= 262144)
        |SELECT doc_id, MIN(w)::INT AS seg_start, MAX(w)::INT AS seg_end,
        |  COUNT(*)::BIGINT AS n_windows, SUM(wabs)::BIGINT AS sum_abs
        |FROM act GROUP BY doc_id, grp
        |ORDER BY doc_id, seg_start""".stripMargin,

    // Frame sums replayed from the every-3-frames generative key, then
    // lag-distance cuts and a running cut-sum shot index.
    "q_shot_detect" ->
      """WITH nn AS (
        |  SELECT doc_id,
        |    CAST(4 + ('0x'||substr(md5(doc_id::VARCHAR || ':nsh'), 1, 15))::BIGINT % 9
        |      AS INT) AS nf
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id, unnest(generate_series(0, nf - 1)) AS f FROM nn),
        |px AS MATERIALIZED (
        |  SELECT doc_id, f, j,
        |    ('0x'||substr(md5(doc_id::VARCHAR || ':sh:' || (f // 3) || ':' || (j // 16)),
        |      (j % 16) * 2 + 1, 2))::INT AS b
        |  FROM (SELECT doc_id, f, unnest(generate_series(0, 47)) AS j
        |        FROM fr)),
        |ch AS (
        |  SELECT doc_id, f,
        |    SUM(CASE WHEN j % 3 = 0 THEN b ELSE 0 END)::BIGINT AS s0,
        |    SUM(CASE WHEN j % 3 = 1 THEN b ELSE 0 END)::BIGINT AS s1,
        |    SUM(CASE WHEN j % 3 = 2 THEN b ELSE 0 END)::BIGINT AS s2
        |  FROM px GROUP BY doc_id, f),
        |d AS (
        |  SELECT doc_id, f, s0, s1, s2,
        |    lag(s0) OVER w AS p0, lag(s1) OVER w AS p1, lag(s2) OVER w AS p2
        |  FROM ch WINDOW w AS (PARTITION BY doc_id ORDER BY f)),
        |c AS (
        |  SELECT doc_id, f,
        |    CASE WHEN f = 0 THEN 1
        |         WHEN abs(s0 - p0) + abs(s1 - p1) + abs(s2 - p2) > 100 THEN 1
        |         ELSE 0 END AS cut
        |  FROM d),
        |sh AS (
        |  SELECT doc_id, f,
        |    SUM(cut) OVER (PARTITION BY doc_id ORDER BY f) - 1 AS shot_idx
        |  FROM c)
        |SELECT doc_id, shot_idx::BIGINT AS shot_idx,
        |  MIN(f)::INT AS start_frame, MAX(f)::INT AS end_frame,
        |  COUNT(*)::BIGINT AS n_frames
        |FROM sh GROUP BY doc_id, shot_idx
        |ORDER BY doc_id, shot_idx""".stripMargin,

    // Per-quadrant exact channel sums replayed from the generative
    // quadrant-seed formula (group-seeded tiles 0 and conditionally 2),
    // then the pair self-join on (tile, s0, s1, s2) with >= 2 shared.
    "q_image_dedup" ->
      """WITH q AS (
        |  SELECT doc_id, qi,
        |    CASE WHEN qi = 0 THEN (doc_id % 50)::VARCHAR || 'gi:0'
        |         WHEN qi = 2 AND doc_id % 3 <> 0
        |           THEN (doc_id % 50)::VARCHAR || 'gi:2'
        |         ELSE doc_id::VARCHAR || ':qi:' || qi END AS seed
        |  FROM documents, (SELECT unnest(generate_series(0, 3)) AS qi)),
        |b AS MATERIALIZED (
        |  SELECT doc_id, qi, p, c,
        |    ('0x'||substr(md5(seed), (p*3+c)*2 + 1, 2))::INT AS v
        |  FROM (SELECT doc_id, qi, seed, unnest(generate_series(0, 3)) AS p
        |        FROM q),
        |       (SELECT unnest(generate_series(0, 2)) AS c)),
        |sg AS (
        |  SELECT doc_id, qi,
        |    SUM(CASE WHEN c = 0 THEN v ELSE 0 END)::BIGINT AS s0,
        |    SUM(CASE WHEN c = 1 THEN v ELSE 0 END)::BIGINT AS s1,
        |    SUM(CASE WHEN c = 2 THEN v ELSE 0 END)::BIGINT AS s2
        |  FROM b GROUP BY doc_id, qi)
        |SELECT a.doc_id AS id_a, bb.doc_id AS id_b,
        |  COUNT(*)::BIGINT AS n_shared
        |FROM sg a JOIN sg bb
        |  ON a.qi = bb.qi AND a.s0 = bb.s0 AND a.s1 = bb.s1 AND a.s2 = bb.s2
        |  AND a.doc_id < bb.doc_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // Full luma → bit → packed-hash → pairwise-hamming replay with NO
    // banding: the oracle enumerates every pair, so a hash-green row
    // proves the engine's pigeonhole band candidates lose nothing at
    // maxHamming = 3.
    "q_dhash_neardup" ->
      """WITH px AS (
        |  SELECT doc_id, y, x,
        |    CASE WHEN y = ('0x'||substr(md5(doc_id::VARCHAR||':py'),1,15))::BIGINT % 8
        |          AND x = ('0x'||substr(md5(doc_id::VARCHAR||':px'),1,15))::BIGINT % 9
        |         THEN doc_id::VARCHAR || ':p:' || y || ':' || x
        |         ELSE (doc_id % 50)::VARCHAR || 'gd:' || y || ':' || x
        |    END AS seed
        |  FROM documents,
        |       (SELECT unnest(generate_series(0, 7)) AS y),
        |       (SELECT unnest(generate_series(0, 8)) AS x)),
        |lm AS MATERIALIZED (
        |  SELECT doc_id, y, x,
        |    299 * ('0x'||substr(md5(seed), 1, 2))::BIGINT
        |      + 587 * ('0x'||substr(md5(seed), 3, 2))::BIGINT
        |      + 114 * ('0x'||substr(md5(seed), 5, 2))::BIGINT AS l
        |  FROM px),
        |bits AS (
        |  SELECT a.doc_id, a.y, a.x,
        |    CASE WHEN a.l < b.l THEN 1 ELSE 0 END AS bit
        |  FROM lm a JOIN lm b
        |    ON a.doc_id = b.doc_id AND a.y = b.y AND b.x = a.x + 1
        |  WHERE a.x < 8),
        |h AS MATERIALIZED (
        |  SELECT doc_id,
        |    CAST(CASE WHEN hb >= 9223372036854775808::HUGEINT
        |              THEN hb - 18446744073709551616::HUGEINT ELSE hb END
        |      AS BIGINT) AS h
        |  FROM (
        |    SELECT doc_id,
        |      SUM(CASE WHEN bit = 1
        |          THEN (1::HUGEINT << (63 - (y * 8 + x))) ELSE 0::HUGEINT END)
        |        AS hb
        |    FROM bits GROUP BY doc_id))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  bit_count(xor(a.h, b.h))::INT AS hamming
        |FROM h a JOIN h b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.h, b.h)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // The q_dhash_neardup hash replay (full unbanded pairwise hamming),
    // then transitive closure + keep-min — the image decision set.
    "q_image_dedup_e2e" ->
      """WITH RECURSIVE px AS (
        |  SELECT doc_id, y, x,
        |    CASE WHEN y = ('0x'||substr(md5(doc_id::VARCHAR||':py'),1,15))::BIGINT % 8
        |          AND x = ('0x'||substr(md5(doc_id::VARCHAR||':px'),1,15))::BIGINT % 9
        |         THEN doc_id::VARCHAR || ':p:' || y || ':' || x
        |         ELSE (doc_id % 50)::VARCHAR || 'gd:' || y || ':' || x
        |    END AS seed
        |  FROM documents,
        |       (SELECT unnest(generate_series(0, 7)) AS y),
        |       (SELECT unnest(generate_series(0, 8)) AS x)),
        |lm AS MATERIALIZED (
        |  SELECT doc_id, y, x,
        |    299 * ('0x'||substr(md5(seed), 1, 2))::BIGINT
        |      + 587 * ('0x'||substr(md5(seed), 3, 2))::BIGINT
        |      + 114 * ('0x'||substr(md5(seed), 5, 2))::BIGINT AS l
        |  FROM px),
        |bits AS (
        |  SELECT a.doc_id, a.y, a.x,
        |    CASE WHEN a.l < b.l THEN 1 ELSE 0 END AS bit
        |  FROM lm a JOIN lm b
        |    ON a.doc_id = b.doc_id AND a.y = b.y AND b.x = a.x + 1
        |  WHERE a.x < 8),
        |h AS MATERIALIZED (
        |  SELECT doc_id,
        |    CAST(CASE WHEN hb >= 9223372036854775808::HUGEINT
        |              THEN hb - 18446744073709551616::HUGEINT ELSE hb END
        |      AS BIGINT) AS h
        |  FROM (
        |    SELECT doc_id,
        |      SUM(CASE WHEN bit = 1
        |          THEN (1::HUGEINT << (63 - (y * 8 + x))) ELSE 0::HUGEINT END)
        |        AS hb
        |    FROM bits GROUP BY doc_id)),
        |pr AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db
        |  FROM h a JOIN h b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.h, b.h)) <= 3),
        |e AS (SELECT da AS a, db AS b FROM pr UNION SELECT db, da FROM pr),
        |r AS (
        |  SELECT a AS node, b AS reach FROM e
        |  UNION
        |  SELECT r.node, e.b FROM r JOIN e ON r.reach = e.a),
        |lab AS (
        |  SELECT node, LEAST(node, MIN(reach)) AS comp
        |  FROM r GROUP BY node)
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT node FROM lab WHERE node <> comp)
        |ORDER BY doc_id""".stripMargin,

    // Same hash replay, full unbanded pairwise hamming histogrammed with
    // the running kept-count.
    "q_dhash_sweep" ->
      """WITH px AS (
        |  SELECT doc_id, y, x,
        |    CASE WHEN y = ('0x'||substr(md5(doc_id::VARCHAR||':py'),1,15))::BIGINT % 8
        |          AND x = ('0x'||substr(md5(doc_id::VARCHAR||':px'),1,15))::BIGINT % 9
        |         THEN doc_id::VARCHAR || ':p:' || y || ':' || x
        |         ELSE (doc_id % 50)::VARCHAR || 'gd:' || y || ':' || x
        |    END AS seed
        |  FROM documents,
        |       (SELECT unnest(generate_series(0, 7)) AS y),
        |       (SELECT unnest(generate_series(0, 8)) AS x)),
        |lm AS MATERIALIZED (
        |  SELECT doc_id, y, x,
        |    299 * ('0x'||substr(md5(seed), 1, 2))::BIGINT
        |      + 587 * ('0x'||substr(md5(seed), 3, 2))::BIGINT
        |      + 114 * ('0x'||substr(md5(seed), 5, 2))::BIGINT AS l
        |  FROM px),
        |bits AS (
        |  SELECT a.doc_id, a.y, a.x,
        |    CASE WHEN a.l < b.l THEN 1 ELSE 0 END AS bit
        |  FROM lm a JOIN lm b
        |    ON a.doc_id = b.doc_id AND a.y = b.y AND b.x = a.x + 1
        |  WHERE a.x < 8),
        |h AS MATERIALIZED (
        |  SELECT doc_id,
        |    CAST(CASE WHEN hb >= 9223372036854775808::HUGEINT
        |              THEN hb - 18446744073709551616::HUGEINT ELSE hb END
        |      AS BIGINT) AS h
        |  FROM (
        |    SELECT doc_id,
        |      SUM(CASE WHEN bit = 1
        |          THEN (1::HUGEINT << (63 - (y * 8 + x))) ELSE 0::HUGEINT END)
        |        AS hb
        |    FROM bits GROUP BY doc_id)),
        |hm AS (
        |  SELECT bit_count(xor(a.h, b.h))::INT AS hamming
        |  FROM h a JOIN h b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.h, b.h)) <= 7)
        |SELECT hamming, COUNT(*)::BIGINT AS n_pairs,
        |  SUM(COUNT(*)) OVER (ORDER BY hamming)::BIGINT AS n_kept_at_h
        |FROM hm GROUP BY hamming ORDER BY hamming""".stripMargin,

    // knnJoin edge chain (the q_knn_join oracle at k=4), then the beam
    // walk unrolled: per hop, frontier out-neighbors minus visited,
    // score vs the broadcast query, keep the top-8 beam; frontier =
    // beam entrants.
    "q_graph_ann" -> {
      def hop(h: Int): String =
        s"""cand$h AS MATERIALIZED (
           |  SELECT DISTINCT e.dst AS id FROM edges e
           |  WHERE e.src IN (SELECT id FROM f${h - 1})
           |    AND e.dst NOT IN (SELECT id FROM vis${h - 1})),
           |vis$h AS MATERIALIZED (
           |  SELECT id FROM vis${h - 1} UNION SELECT id FROM cand$h),
           |best$h AS MATERIALIZED (
           |  SELECT id, s FROM (
           |    SELECT id, s, row_number() OVER (ORDER BY s DESC, id) AS rn
           |    FROM (SELECT id, s FROM best${h - 1}
           |          UNION SELECT c.id, sq.s FROM cand$h c
           |                JOIN sq ON sq.vec_id = c.id))
           |  WHERE rn <= 8),
           |f$h AS MATERIALIZED (
           |  SELECT id FROM best$h
           |  WHERE id NOT IN (SELECT id FROM best${h - 1}))""".stripMargin
      s"""WITH cents AS (
         |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings
         |  WHERE vec_id < 16),
         |pc AS (
         |  SELECT e.vec_id, c.cent_id,
         |         unnest(e.embedding)::DOUBLE x, unnest(c.cvec)::DOUBLE y
         |  FROM embeddings e CROSS JOIN cents c),
         |pagg AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
         |         FROM pc GROUP BY vec_id, cent_id),
         |psc AS (SELECT vec_id, cent_id,
         |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
         |        FROM pagg),
         |assign AS (
         |  SELECT vec_id, cent_id AS cell_id FROM (
         |    SELECT vec_id, cent_id,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
         |    FROM psc) WHERE rn = 1),
         |pr AS (
         |  SELECT a.vec_id AS src, b.vec_id AS dst
         |  FROM assign a JOIN assign b
         |    ON a.cell_id = b.cell_id AND a.vec_id <> b.vec_id),
         |px AS (
         |  SELECT p.src, p.dst,
         |         unnest(ea.embedding)::DOUBLE x, unnest(eb.embedding)::DOUBLE y
         |  FROM pr p JOIN embeddings ea ON ea.vec_id = p.src
         |            JOIN embeddings eb ON eb.vec_id = p.dst),
         |pxa AS (SELECT src, dst, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
         |        FROM px GROUP BY src, dst),
         |esc AS (SELECT src, dst,
         |         ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6)
         |           + 0.0 AS score
         |       FROM pxa),
         |edges AS MATERIALIZED (
         |  SELECT src, dst FROM (
         |    SELECT src, dst, row_number() OVER (PARTITION BY src
         |                       ORDER BY score DESC, dst) AS rn
         |    FROM esc) WHERE rn <= 4),
         |qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 42),
         |sq AS MATERIALIZED (
         |  SELECT vec_id,
         |    ROUND(SUM(x*y)/(GREATEST(SQRT(SUM(x*x)),1e-12)
         |          *GREATEST(SQRT(SUM(y*y)),1e-12)), 6) + 0.0 AS s
         |  FROM (SELECT e.vec_id, unnest(e.embedding)::DOUBLE x,
         |               unnest(qv.q)::DOUBLE y
         |        FROM embeddings e, qv)
         |  GROUP BY vec_id),
         |vis0 AS (SELECT MIN(vec_id) AS id FROM embeddings),
         |f0 AS (SELECT id FROM vis0),
         |best0 AS (SELECT v.id, sq.s FROM vis0 v JOIN sq ON sq.vec_id = v.id),
         |${(1 to 3).map(hop).mkString(",\n")}
         |SELECT CAST(row_number() OVER (ORDER BY s DESC, id) AS INT) AS rank,
         |       id AS vec_id, s AS score
         |FROM best3 ORDER BY rank""".stripMargin
    },

    // The q_graph_ann replay EXTENDED by the HNSW hierarchy: md5-mod-4
    // level indicators (the q_shard_route md5-Horner twin), a second
    // knnJoin edge table over the level-1 subgraph vs the 4 lowest
    // centroids (hnswBuild's coarsening), two unrolled greedy-descent
    // hops on that layer (argmin over (score desc, id) of cur ∪
    // out-neighbors — the fixed point is hop-idempotent, so unrolling
    // without the `moved` flag is exact), then the same 3-hop beam-8
    // walk as q_graph_ann but seeded from the descended entry.
    "q_hnsw_ann" -> {
      def knn(sfx: String, members: String, cents: String): String =
        s"""pc$sfx AS (
           |  SELECT e.vec_id, c.cent_id,
           |         unnest(e.embedding)::DOUBLE x, unnest(c.cvec)::DOUBLE y
           |  FROM $members e CROSS JOIN $cents c),
           |pagg$sfx AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
           |         FROM pc$sfx GROUP BY vec_id, cent_id),
           |psc$sfx AS (SELECT vec_id, cent_id,
           |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
           |        FROM pagg$sfx),
           |assign$sfx AS (
           |  SELECT vec_id, cent_id AS cell_id FROM (
           |    SELECT vec_id, cent_id,
           |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
           |    FROM psc$sfx) WHERE rn = 1),
           |pr$sfx AS (
           |  SELECT a.vec_id AS src, b.vec_id AS dst
           |  FROM assign$sfx a JOIN assign$sfx b
           |    ON a.cell_id = b.cell_id AND a.vec_id <> b.vec_id),
           |px$sfx AS (
           |  SELECT p.src, p.dst,
           |         unnest(ea.embedding)::DOUBLE x, unnest(eb.embedding)::DOUBLE y
           |  FROM pr$sfx p JOIN embeddings ea ON ea.vec_id = p.src
           |            JOIN embeddings eb ON eb.vec_id = p.dst),
           |pxa$sfx AS (SELECT src, dst, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
           |        FROM px$sfx GROUP BY src, dst),
           |esc$sfx AS (SELECT src, dst,
           |         ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6)
           |           + 0.0 AS score
           |       FROM pxa$sfx),
           |edges$sfx AS MATERIALIZED (
           |  SELECT src, dst FROM (
           |    SELECT src, dst, row_number() OVER (PARTITION BY src
           |                       ORDER BY score DESC, dst) AS rn
           |    FROM esc$sfx) WHERE rn <= 4)""".stripMargin
      def descend(h: Int): String =
        s"""d$h AS MATERIALIZED (
           |  SELECT id FROM (
           |    SELECT cand.id, row_number() OVER (ORDER BY sq.s DESC, cand.id) rn
           |    FROM (SELECT e.dst AS id FROM edges1 e
           |          WHERE e.src = (SELECT id FROM d${h - 1})
           |          UNION SELECT id FROM d${h - 1}) cand
           |    JOIN sq ON sq.vec_id = cand.id) WHERE rn = 1)""".stripMargin
      def hop(h: Int): String =
        s"""cand$h AS MATERIALIZED (
           |  SELECT DISTINCT e.dst AS id FROM edges0 e
           |  WHERE e.src IN (SELECT id FROM f${h - 1})
           |    AND e.dst NOT IN (SELECT id FROM vis${h - 1})),
           |vis$h AS MATERIALIZED (
           |  SELECT id FROM vis${h - 1} UNION SELECT id FROM cand$h),
           |best$h AS MATERIALIZED (
           |  SELECT id, s FROM (
           |    SELECT id, s, row_number() OVER (ORDER BY s DESC, id) AS rn
           |    FROM (SELECT id, s FROM best${h - 1}
           |          UNION SELECT c.id, sq.s FROM cand$h c
           |                JOIN sq ON sq.vec_id = c.id))
           |  WHERE rn <= 8),
           |f$h AS MATERIALIZED (
           |  SELECT id FROM best$h
           |  WHERE id NOT IN (SELECT id FROM best${h - 1}))""".stripMargin
      s"""WITH lvh AS (
         |  SELECT vec_id, md5(vec_id::VARCHAR) AS hx FROM embeddings),
         |lvc AS (
         |  SELECT vec_id,
         |         ('0x'||substr(hx, 1,8))::BIGINT AS c0,
         |         ('0x'||substr(hx, 9,8))::BIGINT AS c1,
         |         ('0x'||substr(hx,17,8))::BIGINT AS c2,
         |         ('0x'||substr(hx,25,8))::BIGINT AS c3 FROM lvh),
         |lv AS MATERIALIZED (
         |  SELECT vec_id,
         |    CASE WHEN (((((c0 % 4) * 4294967296 + c1) % 4) * 4294967296 + c2) % 4
         |               * 4294967296 + c3) % 4 = 0 THEN 1 ELSE 0 END AS lvl
         |  FROM lvc),
         |cents AS (
         |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings
         |  WHERE vec_id < 16),
         |coarse1 AS (SELECT cent_id, cvec FROM cents ORDER BY cent_id LIMIT 4),
         |mem1 AS (
         |  SELECT e.* FROM embeddings e
         |  JOIN lv ON lv.vec_id = e.vec_id AND lv.lvl >= 1),
         |${knn("0", "embeddings", "cents")},
         |${knn("1", "mem1", "coarse1")},
         |qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 42),
         |sq AS MATERIALIZED (
         |  SELECT vec_id,
         |    ROUND(SUM(x*y)/(GREATEST(SQRT(SUM(x*x)),1e-12)
         |          *GREATEST(SQRT(SUM(y*y)),1e-12)), 6) + 0.0 AS s
         |  FROM (SELECT e.vec_id, unnest(e.embedding)::DOUBLE x,
         |               unnest(qv.q)::DOUBLE y
         |        FROM embeddings e, qv)
         |  GROUP BY vec_id),
         |d0 AS MATERIALIZED (
         |  SELECT COALESCE((SELECT MIN(vec_id) FROM lv WHERE lvl >= 1),
         |                  (SELECT MIN(vec_id) FROM lv)) AS id),
         |${(1 to 2).map(descend).mkString(",\n")},
         |vis0 AS (SELECT id FROM d2),
         |f0 AS (SELECT id FROM vis0),
         |best0 AS (SELECT v.id, sq.s FROM vis0 v JOIN sq ON sq.vec_id = v.id),
         |${(1 to 3).map(hop).mkString(",\n")}
         |SELECT CAST(row_number() OVER (ORDER BY s DESC, id) AS INT) AS rank,
         |       id AS vec_id, s AS score
         |FROM best3 ORDER BY rank""".stripMargin
    },

    // The q_hnsw_ann replay batched: the SAME level/edge CTEs, the same
    // GLOBAL entry (entry selection is query-independent), then
    // qid-keyed descent hops (argmin per qid over cur ∪ out-neighbors)
    // and the q_graph_ann_batch per-qid beam from each query's
    // descended entry.
    "q_hnsw_ann_batch" -> {
      def knn(sfx: String, members: String, cents: String): String =
        s"""pc$sfx AS (
           |  SELECT e.vec_id, c.cent_id,
           |         unnest(e.embedding)::DOUBLE x, unnest(c.cvec)::DOUBLE y
           |  FROM $members e CROSS JOIN $cents c),
           |pagg$sfx AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
           |         FROM pc$sfx GROUP BY vec_id, cent_id),
           |psc$sfx AS (SELECT vec_id, cent_id,
           |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
           |        FROM pagg$sfx),
           |assign$sfx AS (
           |  SELECT vec_id, cent_id AS cell_id FROM (
           |    SELECT vec_id, cent_id,
           |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
           |    FROM psc$sfx) WHERE rn = 1),
           |pr$sfx AS (
           |  SELECT a.vec_id AS src, b.vec_id AS dst
           |  FROM assign$sfx a JOIN assign$sfx b
           |    ON a.cell_id = b.cell_id AND a.vec_id <> b.vec_id),
           |px$sfx AS (
           |  SELECT p.src, p.dst,
           |         unnest(ea.embedding)::DOUBLE x, unnest(eb.embedding)::DOUBLE y
           |  FROM pr$sfx p JOIN embeddings ea ON ea.vec_id = p.src
           |            JOIN embeddings eb ON eb.vec_id = p.dst),
           |pxa$sfx AS (SELECT src, dst, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
           |        FROM px$sfx GROUP BY src, dst),
           |esc$sfx AS (SELECT src, dst,
           |         ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6)
           |           + 0.0 AS score
           |       FROM pxa$sfx),
           |edges$sfx AS MATERIALIZED (
           |  SELECT src, dst FROM (
           |    SELECT src, dst, row_number() OVER (PARTITION BY src
           |                       ORDER BY score DESC, dst) AS rn
           |    FROM esc$sfx) WHERE rn <= 4)""".stripMargin
      def descend(h: Int): String =
        s"""dq$h AS MATERIALIZED (
           |  SELECT qid, id FROM (
           |    SELECT cand.qid, cand.id,
           |      row_number() OVER (PARTITION BY cand.qid
           |                         ORDER BY sq.s DESC, cand.id) rn
           |    FROM (SELECT d.qid, e.dst AS id FROM dq${h - 1} d
           |          JOIN edges1 e ON e.src = d.id
           |          UNION SELECT qid, id FROM dq${h - 1}) cand
           |    JOIN sq ON sq.qid = cand.qid AND sq.vec_id = cand.id)
           |  WHERE rn = 1)""".stripMargin
      def hop(h: Int): String =
        s"""cand$h AS MATERIALIZED (
           |  SELECT DISTINCT f.qid, e.dst AS id
           |  FROM f${h - 1} f JOIN edges0 e ON e.src = f.id
           |  WHERE NOT EXISTS (SELECT 1 FROM vis${h - 1} v
           |                    WHERE v.qid = f.qid AND v.id = e.dst)),
           |vis$h AS MATERIALIZED (
           |  SELECT qid, id FROM vis${h - 1}
           |  UNION SELECT qid, id FROM cand$h),
           |best$h AS MATERIALIZED (
           |  SELECT qid, id, s FROM (
           |    SELECT qid, id, s,
           |      row_number() OVER (PARTITION BY qid ORDER BY s DESC, id) AS rn
           |    FROM (SELECT qid, id, s FROM best${h - 1}
           |          UNION SELECT c.qid, c.id, sq.s FROM cand$h c
           |                JOIN sq ON sq.qid = c.qid AND sq.vec_id = c.id))
           |  WHERE rn <= 8),
           |f$h AS MATERIALIZED (
           |  SELECT b.qid, b.id FROM best$h b
           |  WHERE NOT EXISTS (SELECT 1 FROM best${h - 1} p
           |                    WHERE p.qid = b.qid AND p.id = b.id))"""
          .stripMargin
      s"""WITH lvh AS (
         |  SELECT vec_id, md5(vec_id::VARCHAR) AS hx FROM embeddings),
         |lvc AS (
         |  SELECT vec_id,
         |         ('0x'||substr(hx, 1,8))::BIGINT AS c0,
         |         ('0x'||substr(hx, 9,8))::BIGINT AS c1,
         |         ('0x'||substr(hx,17,8))::BIGINT AS c2,
         |         ('0x'||substr(hx,25,8))::BIGINT AS c3 FROM lvh),
         |lv AS MATERIALIZED (
         |  SELECT vec_id,
         |    CASE WHEN (((((c0 % 4) * 4294967296 + c1) % 4) * 4294967296 + c2) % 4
         |               * 4294967296 + c3) % 4 = 0 THEN 1 ELSE 0 END AS lvl
         |  FROM lvc),
         |cents AS (
         |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings
         |  WHERE vec_id < 16),
         |coarse1 AS (SELECT cent_id, cvec FROM cents ORDER BY cent_id LIMIT 4),
         |mem1 AS (
         |  SELECT e.* FROM embeddings e
         |  JOIN lv ON lv.vec_id = e.vec_id AND lv.lvl >= 1),
         |${knn("0", "embeddings", "cents")},
         |${knn("1", "mem1", "coarse1")},
         |qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |       WHERE vec_id IN (42, 137, 256)),
         |sq AS MATERIALIZED (
         |  SELECT qid, vec_id,
         |    ROUND(SUM(x*y)/(GREATEST(SQRT(SUM(x*x)),1e-12)
         |          *GREATEST(SQRT(SUM(y*y)),1e-12)), 6) + 0.0 AS s
         |  FROM (SELECT q.qid, e.vec_id, unnest(e.embedding)::DOUBLE x,
         |               unnest(q.qv)::DOUBLE y
         |        FROM embeddings e CROSS JOIN qs q)
         |  GROUP BY qid, vec_id),
         |d0 AS MATERIALIZED (
         |  SELECT COALESCE((SELECT MIN(vec_id) FROM lv WHERE lvl >= 1),
         |                  (SELECT MIN(vec_id) FROM lv)) AS id),
         |dq0 AS (SELECT qid, (SELECT id FROM d0) AS id FROM qs),
         |${(1 to 2).map(descend).mkString(",\n")},
         |vis0 AS (SELECT qid, id FROM dq2),
         |f0 AS (SELECT qid, id FROM vis0),
         |best0 AS (SELECT v.qid, v.id, sq.s FROM vis0 v
         |          JOIN sq ON sq.qid = v.qid AND sq.vec_id = v.id),
         |${(1 to 3).map(hop).mkString(",\n")}
         |SELECT qid,
         |  CAST(row_number() OVER (PARTITION BY qid ORDER BY s DESC, id)
         |       AS INT) AS rank,
         |  id AS vec_id, s AS score
         |FROM best3 ORDER BY qid, rank""".stripMargin
    },

    // The q_hnsw_insert replay: rebuild the existing-only hierarchy
    // (same per-level assignment + in-cell kNN CTEs as q_hnsw_ann,
    // scores RETAINED), then per level: assign the new batch to the
    // coarse cells, pair new×(new ∪ touched-existing) within cells for
    // the new nodes' top-k, union touched existing nodes' stored edges
    // with their new-node candidates and re-rank to k, pass untouched
    // srcs through. Output = whole merged hierarchy.
    "q_hnsw_insert" -> {
      def asg(sfx: String, members: String, cents: String): String =
        s"""pc$sfx AS (
           |  SELECT e.vec_id, c.cent_id,
           |         unnest(e.embedding)::DOUBLE x, unnest(c.cvec)::DOUBLE y
           |  FROM $members e CROSS JOIN $cents c),
           |pagg$sfx AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
           |         FROM pc$sfx GROUP BY vec_id, cent_id),
           |psc$sfx AS (SELECT vec_id, cent_id,
           |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
           |        FROM pagg$sfx),
           |asg$sfx AS MATERIALIZED (
           |  SELECT vec_id, cell_id FROM (
           |    SELECT vec_id, cent_id AS cell_id,
           |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
           |    FROM psc$sfx) WHERE rn = 1)""".stripMargin
      def sc(sfx: String, pairs: String): String =
        s"""px$sfx AS (
           |  SELECT p.src, p.dst,
           |         unnest(ea.embedding)::DOUBLE x, unnest(eb.embedding)::DOUBLE y
           |  FROM $pairs p JOIN embeddings ea ON ea.vec_id = p.src
           |            JOIN embeddings eb ON eb.vec_id = p.dst),
           |pxa$sfx AS (SELECT src, dst, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
           |        FROM px$sfx GROUP BY src, dst),
           |esc$sfx AS (SELECT src, dst,
           |         ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6)
           |           + 0.0 AS score
           |       FROM pxa$sfx)""".stripMargin
      def rank(name: String, from: String): String =
        s"""$name AS (
           |  SELECT src, dst, score FROM (
           |    SELECT src, dst, score, row_number() OVER (PARTITION BY src
           |                       ORDER BY score DESC, dst) AS rn
           |    FROM $from) WHERE rn <= 4)""".stripMargin
      def level(l: Int, exm: String, nbm: String, cents: String): String =
        s"""${asg(s"e$l", exm, cents)},
           |${asg(s"n$l", nbm, cents)},
           |pre$l AS (
           |  SELECT a.vec_id AS src, b.vec_id AS dst
           |  FROM asge$l a JOIN asge$l b
           |    ON a.cell_id = b.cell_id AND a.vec_id <> b.vec_id),
           |${sc(s"b$l", s"pre$l")},
           |${rank(s"edges$l", s"escb$l")},
           |aet$l AS MATERIALIZED (
           |  SELECT vec_id, cell_id FROM asge$l
           |  WHERE cell_id IN (SELECT DISTINCT cell_id FROM asgn$l)),
           |prn$l AS (
           |  SELECT a.vec_id AS src, b.vec_id AS dst
           |  FROM asgn$l a
           |  JOIN (SELECT vec_id, cell_id FROM asgn$l
           |        UNION ALL SELECT vec_id, cell_id FROM aet$l) b
           |    ON a.cell_id = b.cell_id AND a.vec_id <> b.vec_id),
           |${sc(s"w$l", s"prn$l")},
           |${rank(s"newe$l", s"escw$l")},
           |prx$l AS (
           |  SELECT a.vec_id AS src, b.vec_id AS dst
           |  FROM aet$l a JOIN asgn$l b ON a.cell_id = b.cell_id),
           |${sc(s"x$l", s"prx$l")},
           |${rank(s"rr$l",
               s"""(SELECT e.src, e.dst, e.score FROM edges$l e
           |          WHERE e.src IN (SELECT vec_id FROM aet$l)
           |          UNION ALL SELECT src, dst, score FROM escx$l)""")},
           |out$l AS (
           |  SELECT $l AS level, src, dst, score FROM edges$l
           |  WHERE src NOT IN (SELECT vec_id FROM aet$l)
           |  UNION ALL SELECT $l, src, dst, score FROM rr$l
           |  UNION ALL SELECT $l, src, dst, score FROM newe$l)""".stripMargin
      s"""WITH ex AS (SELECT * FROM embeddings WHERE vec_id % 10 <> 7),
         |nb AS (SELECT * FROM embeddings WHERE vec_id % 10 = 7),
         |cents AS (
         |  SELECT vec_id AS cent_id, embedding AS cvec FROM ex
         |  WHERE vec_id < 18),
         |coarse1 AS (SELECT cent_id, cvec FROM cents ORDER BY cent_id LIMIT 4),
         |lvh AS (
         |  SELECT vec_id, md5(vec_id::VARCHAR) AS hx FROM embeddings),
         |lvc AS (
         |  SELECT vec_id,
         |         ('0x'||substr(hx, 1,8))::BIGINT AS c0,
         |         ('0x'||substr(hx, 9,8))::BIGINT AS c1,
         |         ('0x'||substr(hx,17,8))::BIGINT AS c2,
         |         ('0x'||substr(hx,25,8))::BIGINT AS c3 FROM lvh),
         |lv AS MATERIALIZED (
         |  SELECT vec_id,
         |    CASE WHEN (((((c0 % 4) * 4294967296 + c1) % 4) * 4294967296 + c2) % 4
         |               * 4294967296 + c3) % 4 = 0 THEN 1 ELSE 0 END AS lvl
         |  FROM lvc),
         |exm1 AS (
         |  SELECT e.* FROM ex e
         |  JOIN lv ON lv.vec_id = e.vec_id AND lv.lvl >= 1),
         |nbm1 AS (
         |  SELECT e.* FROM nb e
         |  JOIN lv ON lv.vec_id = e.vec_id AND lv.lvl >= 1),
         |${level(0, "ex", "nb", "cents")},
         |${level(1, "exm1", "nbm1", "coarse1")}
         |SELECT CAST(level AS INT) AS level, src, dst, score
         |FROM (SELECT * FROM out0 UNION ALL SELECT * FROM out1)
         |ORDER BY level, src, dst""".stripMargin
    },

    // The q_hnsw_ann replay with a SOFT-DELETE tail: the beam walks the
    // FULL graph (tombstoned nodes route), then the final page filters
    // the tombstone set, re-ranks survivors (score desc, id asc) and
    // trims to k=5.
    "q_hnsw_delete" -> {
      def knn(sfx: String, members: String, cents: String): String =
        s"""pc$sfx AS (
           |  SELECT e.vec_id, c.cent_id,
           |         unnest(e.embedding)::DOUBLE x, unnest(c.cvec)::DOUBLE y
           |  FROM $members e CROSS JOIN $cents c),
           |pagg$sfx AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
           |         FROM pc$sfx GROUP BY vec_id, cent_id),
           |psc$sfx AS (SELECT vec_id, cent_id,
           |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
           |        FROM pagg$sfx),
           |assign$sfx AS (
           |  SELECT vec_id, cent_id AS cell_id FROM (
           |    SELECT vec_id, cent_id,
           |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
           |    FROM psc$sfx) WHERE rn = 1),
           |pr$sfx AS (
           |  SELECT a.vec_id AS src, b.vec_id AS dst
           |  FROM assign$sfx a JOIN assign$sfx b
           |    ON a.cell_id = b.cell_id AND a.vec_id <> b.vec_id),
           |px$sfx AS (
           |  SELECT p.src, p.dst,
           |         unnest(ea.embedding)::DOUBLE x, unnest(eb.embedding)::DOUBLE y
           |  FROM pr$sfx p JOIN embeddings ea ON ea.vec_id = p.src
           |            JOIN embeddings eb ON eb.vec_id = p.dst),
           |pxa$sfx AS (SELECT src, dst, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
           |        FROM px$sfx GROUP BY src, dst),
           |esc$sfx AS (SELECT src, dst,
           |         ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6)
           |           + 0.0 AS score
           |       FROM pxa$sfx),
           |edges$sfx AS MATERIALIZED (
           |  SELECT src, dst FROM (
           |    SELECT src, dst, row_number() OVER (PARTITION BY src
           |                       ORDER BY score DESC, dst) AS rn
           |    FROM esc$sfx) WHERE rn <= 4)""".stripMargin
      def descend(h: Int): String =
        s"""d$h AS MATERIALIZED (
           |  SELECT id FROM (
           |    SELECT cand.id, row_number() OVER (ORDER BY sq.s DESC, cand.id) rn
           |    FROM (SELECT e.dst AS id FROM edges1 e
           |          WHERE e.src = (SELECT id FROM d${h - 1})
           |          UNION SELECT id FROM d${h - 1}) cand
           |    JOIN sq ON sq.vec_id = cand.id) WHERE rn = 1)""".stripMargin
      def hop(h: Int): String =
        s"""cand$h AS MATERIALIZED (
           |  SELECT DISTINCT e.dst AS id FROM edges0 e
           |  WHERE e.src IN (SELECT id FROM f${h - 1})
           |    AND e.dst NOT IN (SELECT id FROM vis${h - 1})),
           |vis$h AS MATERIALIZED (
           |  SELECT id FROM vis${h - 1} UNION SELECT id FROM cand$h),
           |best$h AS MATERIALIZED (
           |  SELECT id, s FROM (
           |    SELECT id, s, row_number() OVER (ORDER BY s DESC, id) AS rn
           |    FROM (SELECT id, s FROM best${h - 1}
           |          UNION SELECT c.id, sq.s FROM cand$h c
           |                JOIN sq ON sq.vec_id = c.id))
           |  WHERE rn <= 8),
           |f$h AS MATERIALIZED (
           |  SELECT id FROM best$h
           |  WHERE id NOT IN (SELECT id FROM best${h - 1}))""".stripMargin
      s"""WITH lvh AS (
         |  SELECT vec_id, md5(vec_id::VARCHAR) AS hx FROM embeddings),
         |lvc AS (
         |  SELECT vec_id,
         |         ('0x'||substr(hx, 1,8))::BIGINT AS c0,
         |         ('0x'||substr(hx, 9,8))::BIGINT AS c1,
         |         ('0x'||substr(hx,17,8))::BIGINT AS c2,
         |         ('0x'||substr(hx,25,8))::BIGINT AS c3 FROM lvh),
         |lv AS MATERIALIZED (
         |  SELECT vec_id,
         |    CASE WHEN (((((c0 % 4) * 4294967296 + c1) % 4) * 4294967296 + c2) % 4
         |               * 4294967296 + c3) % 4 = 0 THEN 1 ELSE 0 END AS lvl
         |  FROM lvc),
         |cents AS (
         |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings
         |  WHERE vec_id < 16),
         |coarse1 AS (SELECT cent_id, cvec FROM cents ORDER BY cent_id LIMIT 4),
         |mem1 AS (
         |  SELECT e.* FROM embeddings e
         |  JOIN lv ON lv.vec_id = e.vec_id AND lv.lvl >= 1),
         |${knn("0", "embeddings", "cents")},
         |${knn("1", "mem1", "coarse1")},
         |qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 42),
         |sq AS MATERIALIZED (
         |  SELECT vec_id,
         |    ROUND(SUM(x*y)/(GREATEST(SQRT(SUM(x*x)),1e-12)
         |          *GREATEST(SQRT(SUM(y*y)),1e-12)), 6) + 0.0 AS s
         |  FROM (SELECT e.vec_id, unnest(e.embedding)::DOUBLE x,
         |               unnest(qv.q)::DOUBLE y
         |        FROM embeddings e, qv)
         |  GROUP BY vec_id),
         |d0 AS MATERIALIZED (
         |  SELECT COALESCE((SELECT MIN(vec_id) FROM lv WHERE lvl >= 1),
         |                  (SELECT MIN(vec_id) FROM lv)) AS id),
         |${(1 to 2).map(descend).mkString(",\n")},
         |vis0 AS (SELECT id FROM d2),
         |f0 AS (SELECT id FROM vis0),
         |best0 AS (SELECT v.id, sq.s FROM vis0 v JOIN sq ON sq.vec_id = v.id),
         |${(1 to 3).map(hop).mkString(",\n")}
         |SELECT rank, vec_id, score FROM (
         |  SELECT CAST(row_number() OVER (ORDER BY s DESC, id) AS INT) AS rank,
         |         id AS vec_id, s AS score
         |  FROM best3 WHERE id % 17 <> 3)
         |WHERE rank <= 5 ORDER BY rank""".stripMargin
    },

    // The q_hnsw_compact replay exploits the operator's pinned
    // identity — compacted ≡ build on survivors under the same
    // centroids — so the oracle is simply the q_hnsw_ann build CTEs
    // (scores retained) over tombstone-filtered member sets.
    "q_hnsw_compact" -> {
      def knn(sfx: String, members: String, cents: String): String =
        s"""pc$sfx AS (
           |  SELECT e.vec_id, c.cent_id,
           |         unnest(e.embedding)::DOUBLE x, unnest(c.cvec)::DOUBLE y
           |  FROM $members e CROSS JOIN $cents c),
           |pagg$sfx AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
           |         FROM pc$sfx GROUP BY vec_id, cent_id),
           |psc$sfx AS (SELECT vec_id, cent_id,
           |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
           |        FROM pagg$sfx),
           |assign$sfx AS (
           |  SELECT vec_id, cent_id AS cell_id FROM (
           |    SELECT vec_id, cent_id,
           |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
           |    FROM psc$sfx) WHERE rn = 1),
           |pr$sfx AS (
           |  SELECT a.vec_id AS src, b.vec_id AS dst
           |  FROM assign$sfx a JOIN assign$sfx b
           |    ON a.cell_id = b.cell_id AND a.vec_id <> b.vec_id),
           |px$sfx AS (
           |  SELECT p.src, p.dst,
           |         unnest(ea.embedding)::DOUBLE x, unnest(eb.embedding)::DOUBLE y
           |  FROM pr$sfx p JOIN embeddings ea ON ea.vec_id = p.src
           |            JOIN embeddings eb ON eb.vec_id = p.dst),
           |pxa$sfx AS (SELECT src, dst, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
           |        FROM px$sfx GROUP BY src, dst),
           |esc$sfx AS (SELECT src, dst,
           |         ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6)
           |           + 0.0 AS score
           |       FROM pxa$sfx),
           |edges$sfx AS MATERIALIZED (
           |  SELECT src, dst, score FROM (
           |    SELECT src, dst, score, row_number() OVER (PARTITION BY src
           |                       ORDER BY score DESC, dst) AS rn
           |    FROM esc$sfx) WHERE rn <= 4)""".stripMargin
      s"""WITH surv AS (SELECT * FROM embeddings WHERE vec_id % 17 <> 3),
         |cents AS (
         |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings
         |  WHERE vec_id < 16),
         |coarse1 AS (SELECT cent_id, cvec FROM cents ORDER BY cent_id LIMIT 4),
         |lvh AS (
         |  SELECT vec_id, md5(vec_id::VARCHAR) AS hx FROM embeddings),
         |lvc AS (
         |  SELECT vec_id,
         |         ('0x'||substr(hx, 1,8))::BIGINT AS c0,
         |         ('0x'||substr(hx, 9,8))::BIGINT AS c1,
         |         ('0x'||substr(hx,17,8))::BIGINT AS c2,
         |         ('0x'||substr(hx,25,8))::BIGINT AS c3 FROM lvh),
         |lv AS MATERIALIZED (
         |  SELECT vec_id,
         |    CASE WHEN (((((c0 % 4) * 4294967296 + c1) % 4) * 4294967296 + c2) % 4
         |               * 4294967296 + c3) % 4 = 0 THEN 1 ELSE 0 END AS lvl
         |  FROM lvc),
         |mem1 AS (
         |  SELECT e.* FROM surv e
         |  JOIN lv ON lv.vec_id = e.vec_id AND lv.lvl >= 1),
         |${knn("0", "surv", "cents")},
         |${knn("1", "mem1", "coarse1")}
         |SELECT CAST(level AS INT) AS level, src, dst, score FROM (
         |  SELECT 0 AS level, src, dst, score FROM edges0
         |  UNION ALL SELECT 1, src, dst, score FROM edges1)
         |ORDER BY level, src, dst""".stripMargin
    },

    "q_squad_eval" ->
      """WITH n AS (
        |  SELECT doc_id, source,
        |    trim(regexp_replace(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), '\b(a|an|the)\b', ' ', 'g'),
        |      ' +', ' ', 'g')) AS g
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, g,
        |    lead(g) OVER (PARTITION BY source ORDER BY doc_id) AS pr
        |  FROM n),
        |x AS (
        |  SELECT doc_id, (pr = g) AS em,
        |    CASE WHEN pr = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split(pr, ' ') END AS pt,
        |    CASE WHEN g = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split(g, ' ') END AS gt
        |  FROM p WHERE pr IS NOT NULL),
        |m AS (
        |  SELECT doc_id, em, len(pt)::BIGINT AS n_pred,
        |    len(gt)::BIGINT AS n_gold,
        |    COALESCE(list_sum(list_transform(list_distinct(pt),
        |      t -> LEAST(len(list_filter(pt, y -> y = t)),
        |                 len(list_filter(gt, y -> y = t))))), 0)::BIGINT
        |      AS n_overlap
        |  FROM x)
        |SELECT doc_id, em, n_pred, n_gold, n_overlap,
        |  (CASE WHEN n_pred = 0 AND n_gold = 0 THEN 1000000
        |        WHEN n_overlap = 0 THEN 0
        |        ELSE (2 * ((n_overlap * 1000000) // n_pred)
        |              * ((n_overlap * 1000000) // n_gold))
        |          // (((n_overlap * 1000000) // n_pred)
        |              + ((n_overlap * 1000000) // n_gold))
        |   END)::BIGINT AS f1_micro
        |FROM m ORDER BY doc_id""".stripMargin,

    "q_sentence_chunks" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |sent AS (
        |  SELECT doc_id,
        |    array_to_string(list_transform(generate_series(1, len(toks)),
        |      i -> CASE WHEN i % 12 = 0 THEN toks[i] || '.'
        |                ELSE toks[i] END), ' ') AS raw
        |  FROM tk),
        |d AS (
        |  SELECT doc_id, trim(raw) AS tt FROM sent
        |  WHERE trim(raw) <> ''),
        |s AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(tt, '[.!?]+\s+'), x -> x <> '')
        |      AS sents
        |  FROM d),
        |x AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(sents)), i ->
        |      {'i': i, 's': sents[i],
        |       'n': len(string_split_regex(sents[i], '\s+'))})) AS u
        |  FROM s WHERE len(sents) > 0),
        |y AS (
        |  SELECT doc_id, (u.i - 1)::INT AS sent_idx, u.n::BIGINT AS n_tokens,
        |    COALESCE(SUM(u.n) OVER (PARTITION BY doc_id ORDER BY u.i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum,
        |    substr(u.s, 1, 30) AS sent_head
        |  FROM x)
        |SELECT doc_id, sent_idx, n_tokens, (cum // 40)::BIGINT AS chunk_idx,
        |  sent_head
        |FROM y ORDER BY doc_id, sent_idx""".stripMargin,

    // Recursive-CTE replay of the GaleChurchAlign DP: one packed BIGINT
    // per cell (numeric min == the lexicographic tie-break), two rolling
    // rows carried as BIGINT lists, the within-row 0-1 chain as the
    // min-over-prefix formulation (dp[j] = min_k B[k] + (j-k)·step01).
    // All constants interpolate from GaleChurchConsts — the oracle and
    // the kernel cannot drift on the cost model.
    "q_sentence_align" -> {
      val C = graft.expressions.GaleChurchConsts
      def rel(a: String, b: String): String =
        s"((abs(($a) - ($b)) * 1000) // greatest(($a) + ($b), 1))"
      val ls2 = "CASE WHEN ni >= 2 THEN sl[ni-1] + sl[ni] ELSE 0 END"
      s"""WITH RECURSIVE tk AS (
         |  SELECT doc_id,
         |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
         |         ELSE string_split_regex(trim(text), '\\s+') END AS toks
         |  FROM documents),
         |base AS (
         |  SELECT doc_id, toks,
         |    LEAST(CAST(ceil(len(toks) / 12.0) AS INT), 21) AS nsrc
         |  FROM tk),
         |src AS (
         |  SELECT doc_id, nsrc,
         |    CASE WHEN nsrc = 0 THEN CAST([] AS VARCHAR[])
         |         ELSE list_transform(generate_series(0, nsrc - 1), b ->
         |           array_to_string(list_slice(toks, b*12 + 1, b*12 + 12), ' '))
         |    END AS s
         |  FROM base),
         |tgt AS (
         |  SELECT doc_id, s,
         |    CASE WHEN nsrc = 0 THEN CAST([] AS VARCHAR[])
         |    ELSE flatten(list_transform(
         |      generate_series(0, CAST(ceil(nsrc / 7.0) AS INT) - 1), b ->
         |      (CASE WHEN b*7+1 <= nsrc THEN [s[b*7+1]]
         |            ELSE CAST([] AS VARCHAR[]) END) ||
         |      (CASE WHEN b*7+2 <= nsrc THEN [s[b*7+2]]
         |            ELSE CAST([] AS VARCHAR[]) END) ||
         |      (CASE WHEN b*7+4 <= nsrc THEN [s[b*7+4]]
         |            ELSE CAST([] AS VARCHAR[]) END) ||
         |      (CASE WHEN b*7+6 <= nsrc THEN [s[b*7+5] || ' ' || s[b*7+6]]
         |            WHEN b*7+5 <= nsrc THEN [s[b*7+5]]
         |            ELSE CAST([] AS VARCHAR[]) END) ||
         |      (CASE WHEN b*7+7 <= nsrc THEN [s[b*7+7]]
         |            ELSE CAST([] AS VARCHAR[]) END) ||
         |      (CASE WHEN b*7+7 <= nsrc THEN ['ins xx ygz']
         |            ELSE CAST([] AS VARCHAR[]) END)))
         |    END AS tg
         |  FROM src),
         |lens AS (
         |  SELECT doc_id,
         |    list_transform(s, x -> CAST(length(x) AS BIGINT)) AS sl,
         |    list_transform(tg, x -> CAST(length(x) AS BIGINT)) AS tl,
         |    len(s) AS m, len(tg) AS n
         |  FROM tgt),
         |dp AS (
         |  SELECT doc_id, m, n, sl, tl, 0 AS i,
         |    list_transform(generate_series(0, n), j -> ${C.INF}::BIGINT)
         |      AS prev,
         |    list_transform(generate_series(0, n), j -> j * ${C.STEP01})
         |      AS curr
         |  FROM lens
         |  UNION ALL
         |  SELECT doc_id, m, n, sl, tl, ni AS i, pv AS prev,
         |    list_transform(generate_series(0, n), j ->
         |      list_min(list_transform(generate_series(0, j), k ->
         |        bb[k + 1] + (j - k) * ${C.STEP01}))) AS curr
         |  FROM (
         |    SELECT doc_id, m, n, sl, tl, i + 1 AS ni, curr AS pv,
         |      list_transform(generate_series(0, n), j ->
         |        CASE WHEN j = 0 THEN curr[1] + ${C.STEP10}
         |        ELSE least(
         |          curr[j] + (${rel("sl[ni]", "tl[j]")} << 30) + ${C.ONE11},
         |          curr[j + 1] + ${C.STEP10},
         |          prev[j] + ((${rel(ls2, "tl[j]")} + ${C.PEN_MERGE}) << 30)
         |            + ${C.ONE21},
         |          CASE WHEN j >= 2 THEN curr[j - 1]
         |            + ((${rel("sl[ni]", "tl[j-1] + tl[j]")} + ${C.PEN_MERGE})
         |               << 30) + ${C.ONE12}
         |            ELSE ${C.INF} END,
         |          CASE WHEN j >= 2 THEN prev[j - 1]
         |            + ((${rel(ls2, "tl[j-1] + tl[j]")} + ${C.PEN_BOTH})
         |               << 30) + ${C.ONE22}
         |            ELSE ${C.INF} END)
         |        END) AS bb
         |    FROM dp WHERE i < m)),
         |fin AS (SELECT doc_id, m, n, curr[n + 1] AS p FROM dp WHERE i = m)
         |SELECT doc_id, m::BIGINT AS n_src, n::BIGINT AS n_tgt,
         |  (p >> 30)::BIGINT AS cost,
         |  ((p >> 25) & 31)::BIGINT AS n11,
         |  ((p >> 20) & 31)::BIGINT AS n10,
         |  ((p >> 15) & 31)::BIGINT AS n01,
         |  ((p >> 10) & 31)::BIGINT AS n21,
         |  ((p >> 5) & 31)::BIGINT AS n12,
         |  (p & 31)::BIGINT AS n22
         |FROM fin ORDER BY doc_id""".stripMargin
    },

    // Same artifact codepoints built with chr(); same RE2-compatible
    // \x{...} pattern (alternatives start with distinct chars, so
    // leftmost-first vs leftmost-longest cannot differ).
    "q_mojibake" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0
        |         THEN text || ' caf' || chr(195) || chr(169) || ' '
        |              || chr(226) || chr(8364) || chr(8482)
        |         ELSE text END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(t,
        |    '\x{00c3}[\x{0080}-\x{00ff}]|\x{00e2}\x{20ac}|\x{00c2}[\x{00a0}-\x{00bf}]'
        |  ))::BIGINT AS n_artifacts,
        |  len(regexp_extract_all(t,
        |    '\x{00c3}[\x{0080}-\x{00ff}]|\x{00e2}\x{20ac}|\x{00c2}[\x{00a0}-\x{00bf}]'
        |  )) > 0 AS flagged
        |FROM d ORDER BY doc_id""".stripMargin,

    // LSH pair chain (q_dedup_clusters' CTEs) vs md5-equality gold
    // pairs; counts via one intersect + two set sizes.
    "q_dedup_eval" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(generate_series(1, len(toks)-1),
        |           i -> toks[i] || ' ' || toks[i+1])) AS sh
        |  FROM t WHERE len(toks) >= 2),
        |sig AS (
        |  SELECT doc_id, sh,
        |         list_transform(generate_series(0, 15), i ->
        |           list_min(list_transform(sh, x ->
        |             ('0x'||substr(md5(i::VARCHAR||':'||x), 1, 15))::BIGINT))) AS sig
        |  FROM s WHERE len(sh) > 0),
        |bands AS (
        |  SELECT doc_id, band_idx,
        |         md5(array_to_string(sig[band_idx*4+1 : band_idx*4+4], ',')) AS bh
        |  FROM (SELECT doc_id, sig, unnest(generate_series(0, 3)) AS band_idx FROM sig)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id da, b.doc_id db
        |  FROM bands a JOIN bands b
        |    ON a.band_idx = b.band_idx AND a.bh = b.bh AND a.doc_id < b.doc_id),
        |p AS (
        |  SELECT da AS a, db AS b FROM (
        |    SELECT da, db,
        |           len(list_intersect(x.sh, y.sh))::DOUBLE /
        |             (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) AS jac
        |    FROM cand JOIN s x ON da = x.doc_id JOIN s y ON db = y.doc_id)
        |  WHERE jac >= 0.2),
        |gold AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b
        |  FROM documents a JOIN documents b
        |    ON substr(a.text, 1, 80) = substr(b.text, 1, 80)
        |   AND a.doc_id < b.doc_id),
        |c AS (
        |  SELECT (SELECT COUNT(*) FROM p JOIN gold USING (a, b))::BIGINT AS tp,
        |         (SELECT COUNT(*) FROM p)::BIGINT AS np,
        |         (SELECT COUNT(*) FROM gold)::BIGINT AS ng),
        |m AS (
        |  SELECT tp, np - tp AS fp, ng - tp AS fn,
        |    (tp * 1000000) // GREATEST(np, 1) AS p_micro,
        |    (tp * 1000000) // GREATEST(ng, 1) AS r_micro
        |  FROM c)
        |SELECT tp, fp, fn, p_micro, r_micro,
        |  (CASE WHEN p_micro + r_micro = 0 THEN 0
        |        ELSE (2 * p_micro * r_micro) // (p_micro + r_micro)
        |   END)::BIGINT AS f1_micro
        |FROM m""".stripMargin,

    "q_jackknife" ->
      """WITH q AS (
        |  SELECT ('0x'||substr(md5(event_id::VARCHAR), 1, 15))::BIGINT % 10 AS f,
        |    CAST(ROUND(value * 1000000, 0) AS BIGINT) AS vq
        |  FROM events),
        |b AS (SELECT f, SUM(vq)::BIGINT AS s, COUNT(*)::BIGINT AS n
        |      FROM q GROUP BY f),
        |t AS (SELECT SUM(s)::BIGINT AS st, SUM(n)::BIGINT AS nt,
        |             COUNT(*)::BIGINT AS k FROM b),
        |loo AS (SELECT ((t.st - b.s) // GREATEST(t.nt - b.n, 1)) AS m
        |        FROM b, t),
        |mb AS (SELECT (SUM(m) // (SELECT k FROM t)) AS mbar FROM loo),
        |v AS (SELECT SUM((m - mb.mbar) * (m - mb.mbar))::BIGINT AS varq
        |      FROM loo, mb)
        |SELECT t.nt AS n, (t.st // t.nt) AS mean_micro,
        |  CAST(ROUND(SQRT(v.varq::DOUBLE * (t.k - 1) / t.k), 0) AS BIGINT)
        |    AS jack_se_micro
        |FROM t, v""".stripMargin,

    // The single-query walk's CTE chain lifted to (qid, ·) state — one
    // set of hop CTEs advances all three walks, mirroring the batched
    // engine exactly.
    "q_graph_ann_batch" -> {
      def hop(h: Int): String =
        s"""cand$h AS MATERIALIZED (
           |  SELECT DISTINCT f.qid, e.dst AS id
           |  FROM f${h - 1} f JOIN edges e ON e.src = f.id
           |  WHERE NOT EXISTS (SELECT 1 FROM vis${h - 1} v
           |                    WHERE v.qid = f.qid AND v.id = e.dst)),
           |vis$h AS MATERIALIZED (
           |  SELECT qid, id FROM vis${h - 1}
           |  UNION SELECT qid, id FROM cand$h),
           |best$h AS MATERIALIZED (
           |  SELECT qid, id, s FROM (
           |    SELECT qid, id, s,
           |      row_number() OVER (PARTITION BY qid ORDER BY s DESC, id) AS rn
           |    FROM (SELECT qid, id, s FROM best${h - 1}
           |          UNION SELECT c.qid, c.id, sq.s FROM cand$h c
           |                JOIN sq ON sq.qid = c.qid AND sq.vec_id = c.id))
           |  WHERE rn <= 8),
           |f$h AS MATERIALIZED (
           |  SELECT b.qid, b.id FROM best$h b
           |  WHERE NOT EXISTS (SELECT 1 FROM best${h - 1} p
           |                    WHERE p.qid = b.qid AND p.id = b.id))"""
          .stripMargin
      s"""WITH cents AS (
         |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings
         |  WHERE vec_id < 16),
         |pc AS (
         |  SELECT e.vec_id, c.cent_id,
         |         unnest(e.embedding)::DOUBLE x, unnest(c.cvec)::DOUBLE y
         |  FROM embeddings e CROSS JOIN cents c),
         |pagg AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
         |         FROM pc GROUP BY vec_id, cent_id),
         |psc AS (SELECT vec_id, cent_id,
         |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
         |        FROM pagg),
         |assign AS (
         |  SELECT vec_id, cent_id AS cell_id FROM (
         |    SELECT vec_id, cent_id,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
         |    FROM psc) WHERE rn = 1),
         |pr AS (
         |  SELECT a.vec_id AS src, b.vec_id AS dst
         |  FROM assign a JOIN assign b
         |    ON a.cell_id = b.cell_id AND a.vec_id <> b.vec_id),
         |px AS (
         |  SELECT p.src, p.dst,
         |         unnest(ea.embedding)::DOUBLE x, unnest(eb.embedding)::DOUBLE y
         |  FROM pr p JOIN embeddings ea ON ea.vec_id = p.src
         |            JOIN embeddings eb ON eb.vec_id = p.dst),
         |pxa AS (SELECT src, dst, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
         |        FROM px GROUP BY src, dst),
         |esc AS (SELECT src, dst,
         |         ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6)
         |           + 0.0 AS score
         |       FROM pxa),
         |edges AS MATERIALIZED (
         |  SELECT src, dst FROM (
         |    SELECT src, dst, row_number() OVER (PARTITION BY src
         |                       ORDER BY score DESC, dst) AS rn
         |    FROM esc) WHERE rn <= 4),
         |qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |       WHERE vec_id IN (42, 137, 256)),
         |sq AS MATERIALIZED (
         |  SELECT qid, vec_id,
         |    ROUND(SUM(x*y)/(GREATEST(SQRT(SUM(x*x)),1e-12)
         |          *GREATEST(SQRT(SUM(y*y)),1e-12)), 6) + 0.0 AS s
         |  FROM (SELECT q.qid, e.vec_id, unnest(e.embedding)::DOUBLE x,
         |               unnest(q.qv)::DOUBLE y
         |        FROM embeddings e CROSS JOIN qs q)
         |  GROUP BY qid, vec_id),
         |vis0 AS (SELECT qid, (SELECT MIN(vec_id) FROM embeddings) AS id
         |         FROM qs),
         |f0 AS (SELECT qid, id FROM vis0),
         |best0 AS (SELECT v.qid, v.id, sq.s FROM vis0 v
         |          JOIN sq ON sq.qid = v.qid AND sq.vec_id = v.id),
         |${(1 to 3).map(hop).mkString(",\n")}
         |SELECT qid,
         |  CAST(row_number() OVER (PARTITION BY qid ORDER BY s DESC, id)
         |       AS INT) AS rank,
         |  id AS vec_id, s AS score
         |FROM best3 ORDER BY qid, rank""".stripMargin
    }
  )

  // ======================================== index lifecycle at scale

  /** Data-relative rebalance thresholds (1.05× / 0.9× of the mean cell
    * size, integer arithmetic so both engines agree exactly): tight
    * enough that the near-uniform fixture assignment yields BOTH hot and
    * tiny cells at every SF (verified sf0.001/0.01/0.1). Public (and the
    * ONE Scala site — the SQL oracle replays the same formula) so
    * `Profile ivfmaint` probes the exact bounds the benched query uses.
    */
  def rebalanceBounds(n: Long): (Long, Long) =
    (math.max(1L, 21L * n / 320L), 9L * n / 160L)

  private def rebalanced(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val e = t(s, dir, "embeddings")
    val cents = e.filter($"vec_id" < 16)
      .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
    val assigned = Ann.ivfAssign(e, cents, "vec_id", "embedding", "cent_id", "cvec")
    val (maxCell, minCell) = rebalanceBounds(e.count())
    Ann.rebalanceIvf(assigned, cents, "vec_id", "embedding",
      "cent_id", "cvec", maxCell, minCell)
  }

  private def round10Queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // IVF maintenance: deterministic split/merge rebalance (Ann.rebalanceIvf).
    // Output: the post-rebalance cell census — every surviving/child cell
    // with its member count. The oracle replays the ENTIRE maintenance
    // pass in SQL (assignment, sizing, classification, seeded-Voronoi
    // split, nearest-survivor merge), so a hash match certifies each
    // row-level re-homing decision, not just aggregate counts.
    "q_ivf_rebalance" -> ((s, dir) => {
      import s.implicits._
      val (aN, _) = rebalanced(s, dir)
      aN.groupBy($"cell_id").agg(count(lit(1)).as("n"))
        .withColumn("is_child", ($"cell_id" > 15).cast("int"))
        .orderBy($"cell_id")
    }),

    // Search over the rebalanced index: probe 4 of the NEW cells for the
    // fixture query, score only their members, top-10. Pins that the
    // maintenance pass preserves searchability end to end (cell routing,
    // membership, ranking) — the invariant rebalancing exists to protect.
    "q_ivf_rebalance_search" -> ((s, dir) => {
      import s.implicits._
      val (aN, cN) = rebalanced(s, dir)
      val e = t(s, dir, "embeddings")
      val query = e.filter($"vec_id" === 42).select($"embedding").head.getSeq[Float](0)
      val probes = Ann.probeCellIds(cN, query, "cent_id", "cvec", 4)
      val cand = aN.filter($"cell_id".isin(probes: _*))
      val scored = cand
        .withColumn("score", score6(V.cosine($"embedding", typedLit(query))))
      TopK.topK(scored, $"score", $"vec_id", 10)
        .select($"vec_id", $"score")
    }),

    // Merge-on-read delete lifecycle end to end: partitioned write →
    // tombstone append (heavy deletes on even-suffixed sources, trickle
    // on the rest) → threshold vacuum at 0.3 → per-source logical live
    // count and SURVIVING sidecar size. The oracle recomputes the gate
    // arithmetic from the delete rule, so the hash certifies both the
    // reader's delete semantics and which partitions the vacuum chose.
    // (The whole lifecycle — write, delete, vacuum — IS the operator
    // under test, so it runs inside the query; TombstoneSpec pins the
    // physical claims: untouched partitions byte-identical, fully-dead
    // directories removed, idempotent re-run.)
    "q_tombstone_vacuum" -> ((s, dir) => {
      import s.implicits._
      val d = java.nio.file.Files.createTempDirectory("graft_tomb_q_").toFile
      jsonlTmpCleanup(d)
      val path = new java.io.File(d, "docs").getAbsolutePath
      val docs = t(s, dir, "documents")
      docs.write.mode("overwrite").partitionBy("source").parquet(path)
      // doc_id is round-robin over the 20 sources, so delete rules use
      // moduli coprime to 20: heavy (~2/3 dead, past the gate) on
      // even-suffixed sources, trickle (~1/7) on the rest
      val heavy = substring($"source", 4, 10).cast("int") % 2 === 0
      val dels = docs.select($"doc_id", $"source")
        .filter((heavy && $"doc_id" % 3 =!= 0) || (!heavy && $"doc_id" % 7 === 0))
      Layout.appendTombstones(s, path, dels, "doc_id", "source")
      Layout.vacuumTombstones(s, path, "doc_id", "source", 0.3)
      val side = s.read.parquet(s"$path/_tombstones")
        .groupBy($"source").agg(count(lit(1)).as("n_tomb"))
      Layout.readLogical(s, path, "doc_id", "source")
        .groupBy($"source").agg(count(lit(1)).as("n_live"))
        .join(side, Seq("source"), "left")
        .select($"source", $"n_live", coalesce($"n_tomb", lit(0L)).as("n_tomb"))
        .orderBy($"source")
    }),

    // Reshard planning 8 → 10 shards: the reference's md5-mod-N routing
    // re-homes nearly every key when N changes; rendezvous hashing moves
    // only the keys whose argmax lands on a new shard (~2/10). One row
    // per scheme with the measured moved fraction — the migration-cost
    // estimate a reshard runbook starts from.
    "q_reshard_plan" -> ((s, dir) => {
      import s.implicits._
      val base = t(s, dir, "embeddings").select(
        HashFunctions.shardHash($"vec_id", 8).as("m8"),
        HashFunctions.shardHash($"vec_id", 10).as("m10"),
        HashFunctions.rendezvousShard($"vec_id", 8).as("r8"),
        HashFunctions.rendezvousShard($"vec_id", 10).as("r10"))
      val mod = base.agg(
        sum(($"m8" =!= $"m10").cast("long")).as("moved"),
        count(lit(1)).as("total"))
        .select(lit("mod").as("scheme"), $"moved", $"total",
          score6($"moved".cast("double") / $"total").as("moved_pct"))
      val rdv = base.agg(
        sum(($"r8" =!= $"r10").cast("long")).as("moved"),
        count(lit(1)).as("total"))
        .select(lit("rendezvous").as("scheme"), $"moved", $"total",
          score6($"moved".cast("double") / $"total").as("moved_pct"))
      mod.unionByName(rdv).orderBy($"scheme")
    }),

    // Schema evolution on a partitioned table: generation-1 partitions
    // (doc_id%4 ∈ {0,1}) lack `score`, generation-2 partitions carry
    // score = n_chars·2. Branch "mor" answers merge-on-read
    // (readEvolved fills holes with the derived default n_chars+7);
    // branch "phys" answers AFTER backfillColumn materialized the same
    // default into only the lagging partitions. The two branches must
    // hash-agree — the merge-on-read ≡ post-backfill equivalence the
    // live-reader contract promises.
    "q_schema_evolve" -> ((s, dir) => {
      import s.implicits._
      val d = java.nio.file.Files.createTempDirectory("graft_evo_q_").toFile
      jsonlTmpCleanup(d)
      val path = new java.io.File(d, "t").getAbsolutePath
      val docs = t(s, dir, "documents")
        .select($"doc_id", $"n_chars", pmod($"doc_id", lit(4)).as("part"))
      docs.filter($"part" < 2)
        .write.mode("overwrite").partitionBy("part").parquet(path)
      docs.filter($"part" >= 2)
        .withColumn("score", ($"n_chars" * 2).cast("long"))
        .write.mode("append").partitionBy("part").parquet(path)
      val default = ($"n_chars" + lit(7)).cast("long")
      def agg(df: DataFrame, tag: String): DataFrame =
        df.groupBy(col("part").cast("long").as("part"))
          .agg(sum($"score").cast("long").as("s"), count(lit(1)).as("n"))
          .select(lit(tag).as("branch"), $"part", $"s", $"n")
      // materialize the merge-on-read answer BEFORE the backfill
      // replaces the generation-1 files it has already listed
      val mor = agg(Layout.readEvolved(s, path, Map("score" -> default)), "mor")
        .localCheckpoint(true)
      Layout.backfillColumn(s, path, "part", "score", default)
      val phys = agg(s.read.parquet(path), "phys")
      mor.unionByName(phys).orderBy($"branch", $"part")
    }),

    // Incremental materialized rollup: build the per-(source, lang)
    // summary, append a delta into ONE source partition, refresh — the
    // refresh must touch exactly that partition (n_refreshed = 1 rides
    // every output row, oracle-pinned) and the summary must equal a
    // from-scratch recompute over base ∪ delta.
    "q_incremental_rollup" -> ((s, dir) => {
      import s.implicits._
      val d = java.nio.file.Files.createTempDirectory("graft_mv_q_").toFile
      jsonlTmpCleanup(d)
      val src = new java.io.File(d, "src").getAbsolutePath
      val dst = new java.io.File(d, "mv").getAbsolutePath
      val docs = t(s, dir, "documents")
        .select($"doc_id", $"lang", $"n_chars", $"source")
      docs.write.mode("overwrite").partitionBy("source").parquet(src)
      val aggs = Seq(count(lit(1)).as("n_docs"),
        sum($"n_chars").cast("long").as("sum_chars"))
      Layout.materializeRollup(s, src, dst, "source", Seq("lang"), aggs)
      docs.filter($"source" === "src0")
        .select(($"doc_id" + lit(1000000L)).as("doc_id"), $"lang",
          ($"n_chars" + lit(11L)).as("n_chars"), $"source")
        .write.mode("append").partitionBy("source").parquet(src)
      val refreshed = Layout.refreshRollup(s, src, dst, "source", Seq("lang"), aggs)
      s.read.parquet(dst)
        .select($"source", $"lang", $"n_docs", $"sum_chars",
          lit(refreshed).cast("long").as("n_refreshed"))
        .orderBy($"source", $"lang")
    }),

    // Metadata-FILTERED vector search, narrow predicate: label = 5 holds
    // ~10% of rows, under the 4/16 probed-cell fraction, so the cost
    // switch takes the PRE-filter path — exact top-k over just the
    // survivors (the `path` column rides the output; the oracle asserting
    // 'pre' + the exact-filter ranking certifies the routing decision,
    // since the post path would miss out-of-probe candidates and hash
    // differently).
    "q_filtered_ann_pre" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val query = e.filter($"vec_id" === 42).select($"embedding").head.getSeq[Float](0)
      Ann.searchFiltered(e, cents, "vec_id", "embedding", "cent_id", "cvec",
        query, 10, $"label" === 5, 4)
    }),

    // Filtered search, broad predicate: even labels hold ~50% of rows —
    // scanning the survivors would touch half the corpus, so the switch
    // takes the POST-filter path: probe 4 cells, apply the predicate to
    // the probed candidates, top-k the rest. The oracle replays probe
    // selection + assignment + predicate, certifying the IVF-side
    // candidate set and the branch choice.
    "q_filtered_ann_post" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val query = e.filter($"vec_id" === 42).select($"embedding").head.getSeq[Float](0)
      Ann.searchFiltered(e, cents, "vec_id", "embedding", "cent_id", "cvec",
        query, 10, $"label" % 2 === 0, 4)
    }),

    // Namespaced (multi-tenant) batch search: every ...42-suffixed vector
    // queries its OWN label's namespace — candidates are structurally
    // rows in (query's namespace ∩ query's probed cells), expressed as an
    // equi-join so no tenant's query ever scans another tenant's rows.
    // Query count scales with the table (5 at sf0.001, 20 at sf0.1).
    "q_ns_search" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val qs = e.filter($"vec_id" % 100 === 42)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"), $"label".as("qns"))
      Ann.searchNamespacedBatch(e, cents, "vec_id", "embedding", "label",
        "cent_id", "cvec", qs, "qid", "qvec", "qns", 4, 5)
    }),

    // Index-quality report: per-cell simplified silhouette (cosine
    // distance to own vs nearest-other centroid). mean_s near 1 = tight,
    // separable cells (probe-pruning works); near 0 = boundary-heavy
    // cells that need wider probes. One projection over in-literal
    // centroids + a C-bounded aggregation; per-row values quantize to
    // integer micro-units so the means are exact long sums in both
    // engines.
    "q_silhouette" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      Ann.silhouetteSimplified(e, cents, "vec_id", "embedding",
        "cent_id", "cvec").orderBy($"cell_id")
    }),

    // Probe auto-tuning: the (nProbes, recall) curve at doubling probe
    // counts with the cheapest count meeting recall ≥ 0.95 marked — the
    // parameter decision an IVF operator makes before serving. Recall is
    // the micro-average (total hits / total exact), integer-exact in
    // both engines; the exact side is the full-probe search, computed
    // once.
    "q_probe_tune" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val qs = e.filter($"vec_id" % 100 === 42)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      Ann.probeRecallSweep(e, cents, "vec_id", "embedding", "cent_id",
        "cvec", qs, "qid", "qvec", 10, 0.95).orderBy($"n_probes")
    }),

    // PQ distortion sweep: mean per-row quantization error at m ∈
    // {2,4,8} subspaces (the storage/accuracy trade-off curve — m IS
    // the code bytes per vector). The error reuses the encode argmin
    // arithmetic, quantized to integer micro-units per subspace, so the
    // corpus means replicate bit-exactly.
    "q_pq_distortion" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cbs: Seq[Seq[Float]] = e.filter($"vec_id" < 16)
        .orderBy($"vec_id").select($"embedding")
        .collect().map(_.getSeq[Float](0)).toSeq
      Ann.pqDistortionSweep(e, "embedding", cbs, Seq(2, 4, 8))
        .orderBy($"m")
    }),

    // Two-sample KS drift test on doc length between even- and odd-
    // suffixed sources: per-value counts → one cumulative pass over the
    // distinct-value grid → exact D in DECIMAL(38,0) cross-products →
    // the α=0.05 decision on the rounded statistic. State bounded by
    // the metric's support, never the row count.
    "q_ks_drift" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val sfx = substring($"source", 4, 10).cast("int")
      Mining.ksDrift(docs.filter(sfx % 2 === 0), docs.filter(sfx % 2 =!= 0),
        "n_chars")
    }),

    // Corrupt-tolerant JSONL ingest — the crawl-front reality: malformed
    // lines must quarantine, not kill the job or silently vanish. Every
    // doc_id % 7 == 0 line is written BROKEN (truncated value); the
    // PERMISSIVE read routes them to _corrupt_record and the report
    // proves (a) the bad-line census matches the corruption rule and
    // (b) the good lines' content survived parsing (sum of n_chars).
    "q_jsonl_tolerant" -> ((s, dir) => {
      import s.implicits._
      val tmpDir = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_jsonl_tol_${Integer.toHexString(dir.hashCode)}_" +
          ProcessHandle.current().pid())
      val tmp = tmpDir.getAbsolutePath
      jsonlTmpCleanup(tmpDir)
      t(s, dir, "documents").select(
        when($"doc_id" % 7 === 0,
          concat(lit("{\"doc_id\": "), $"doc_id", lit(", \"n_chars\": oops")))
          .otherwise(to_json(struct($"doc_id", $"n_chars")))
          .as("value"))
        .write.mode("overwrite").text(tmp)
      val back = s.read
        .schema("doc_id LONG, n_chars LONG, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(tmp)
      back.agg(
        count(when($"_corrupt_record".isNull, 1)).as("n_good"),
        count(when($"_corrupt_record".isNotNull, 1)).as("n_bad"),
        sum(when($"_corrupt_record".isNull, $"n_chars")
          .otherwise(0L)).cast("long").as("sum_chars"))
    }),

    // Embedding-level train/eval decontamination: every ...17-suffixed
    // vector plays the benchmark set, the rest the training corpus;
    // train docs cosine-≥-0.3 close to any eval doc are flagged with
    // their best match. Eval broadcasts, train assigns to cells once,
    // candidates are (train ∩ eval's probed cells) — the oracle replays
    // assignment, probe selection, and the best-match total order, so
    // the hash certifies the ANN routing, not just the cosine.
    "q_semantic_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val ev = e.filter($"vec_id" % 50 === 17)
        .select($"vec_id", $"embedding")
      val train = spread(s, e.filter($"vec_id" % 50 =!= 17))
        .select($"vec_id", $"embedding")
      Mining.semanticDecontaminate(train, "vec_id", "embedding",
          ev, "vec_id", "embedding", cents, "cent_id", "cvec", 4, 0.3)
        .orderBy($"train_id")
    }),

    // The COMPLETE maintained-index lifecycle, oracle-checked end to
    // end: three-batch streaming ingest (normalize → assign → batch-
    // addressed append) → rule-based deletes → compaction (tombstones
    // in folded subdirs become physical; the largest ingest batch is
    // spared) → sidecar vacuum (dead tombstones retired) → probe-pruned
    // search. The oracle replays EVERY stage in SQL — float32
    // normalization, assignment, per-cell fold eligibility (≥ 2
    // foldable batch subdirs), the purge/keep split, probe selection,
    // and the final ranking — so the hash certifies the lifecycle's
    // row-level decisions, not just that something ran.
    "q_maintained_lifecycle" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val d = java.nio.file.Files.createTempDirectory("graft_ml_q_").toFile
      jsonlTmpCleanup(d)
      val in = new java.io.File(d, "in").getAbsolutePath
      val table = new java.io.File(d, "t").getAbsolutePath
      val ckpt = new java.io.File(d, "c").getAbsolutePath
      val src = e.select($"vec_id".as("id"), $"embedding")
      src.filter($"id" < 200).coalesce(1)
        .write.mode("overwrite").parquet(in)
      val stream = Streaming.streamInsertIndexedMaintained(
        s.readStream.schema(src.schema).parquet(in),
        dim = 64, numShards = 8, cents, "cent_id", "cvec", table, ckpt,
        maxCell = 1000000L)
      stream.processAllAvailable()
      src.filter($"id" >= 200 && $"id" < 250).coalesce(1)
        .write.mode("append").parquet(in)
      stream.processAllAvailable()
      src.filter($"id" >= 250).coalesce(1)
        .write.mode("append").parquet(in)
      stream.processAllAvailable()
      stream.stop()
      Streaming.deleteMaintained(s, table,
        src.filter($"id" % 10 === 3).select($"id"), "id")
      Streaming.compactMaintained(s, table)
      val (kept, dropped) = Streaming.vacuumDeletes(s, table)
      val query = e.filter($"vec_id" === 42).select($"embedding")
        .head.getSeq[Float](0)
      Streaming.searchMaintained(s, table, cents, "cent_id", "cvec",
          query, nProbes = 4, k = 10)
        .select($"id", $"score", lit(kept).as("tomb_kept"),
          lit(dropped).as("tomb_dropped"))
    }),

    // Deterministic k-means training, oracle-certified: one Lloyd
    // iteration from the lowest-8-id init over the embeddings table —
    // the oracle replays the argmax assignment and the exact micro-unit
    // per-(cell, dim) means (half-even on the mean, half-up on the
    // element quantization), so the trained centroids themselves are
    // hash-checked, not just the searches they feed.
    "q_kmeans_train" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      Ann.kmeansTrain(e, "vec_id", "embedding", 8, 1)
        .select($"cent_id", posexplode($"cvec").as(Seq("pos", "v")))
        .orderBy($"cent_id", $"pos")
    }),

    // Full index REBUILD, oracle-certified end to end: ingest → rule
    // delete → retrainMaintained (k-means over the live normalized
    // rows, tombstones purged physically, every row re-homed, centroid
    // version committed) → probe-pruned search against the RETRAINED
    // centroids. The oracle replays normalization, the post-delete
    // training set, one Lloyd iteration (init = lowest live ids,
    // micro-unit means), re-assignment, probe selection, and the final
    // ranking — the rebuild's arithmetic is hash-checked, not just its
    // bookkeeping.
    "q_maintained_retrain" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val d = java.nio.file.Files.createTempDirectory("graft_rt_q_").toFile
      jsonlTmpCleanup(d)
      val in = new java.io.File(d, "in").getAbsolutePath
      val table = new java.io.File(d, "t").getAbsolutePath
      val ckpt = new java.io.File(d, "c").getAbsolutePath
      val src = e.select($"vec_id".as("id"), $"embedding")
      src.coalesce(1).write.mode("overwrite").parquet(in)
      val stream = Streaming.streamInsertIndexedMaintained(
        s.readStream.schema(src.schema).parquet(in),
        dim = 64, numShards = 8, cents, "cent_id", "cvec", table, ckpt,
        maxCell = 1000000L)
      stream.processAllAvailable()
      stream.stop()
      Streaming.deleteMaintained(s, table,
        src.filter($"id" % 10 === 3).select($"id"), "id")
      val v = Streaming.retrainMaintained(s, table, k = 8, iters = 1)
      val query = e.filter($"vec_id" === 42).select($"embedding")
        .head.getSeq[Float](0)
      Streaming.searchMaintained(s, table, cents, "cent_id", "cvec",
          query, nProbes = 2, k = 10)
        .select($"id", $"score", lit(v).cast("long").as("version"))
    }),

    // Recall audit of the maintained index's probed serving against the
    // exact full scan — per ...42-suffixed query, recall@5 of nProbes=2
    // vs ground truth. The oracle replays ingest normalization,
    // assignment, per-query probe selection, BOTH rankings, and the
    // semi-join hit count — certifying the audit's numbers, not just
    // that an audit ran.
    "q_maintained_recall" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val d = java.nio.file.Files.createTempDirectory("graft_rec_q_").toFile
      jsonlTmpCleanup(d)
      val in = new java.io.File(d, "in").getAbsolutePath
      val table = new java.io.File(d, "t").getAbsolutePath
      val ckpt = new java.io.File(d, "c").getAbsolutePath
      val src = e.select($"vec_id".as("id"), $"embedding")
      src.coalesce(1).write.mode("overwrite").parquet(in)
      val stream = Streaming.streamInsertIndexedMaintained(
        s.readStream.schema(src.schema).parquet(in),
        dim = 64, numShards = 8, cents, "cent_id", "cvec", table, ckpt,
        maxCell = 1000000L)
      stream.processAllAvailable()
      stream.stop()
      val qs = e.filter($"vec_id" % 100 === 42)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      Streaming.recallMaintained(s, table, cents, "cent_id", "cvec",
          qs, "qid", "qvec", nProbes = 2, k = 5)
        .orderBy($"qid")
    }),

    // GROUPED serving against the on-disk maintained index — the RAG
    // page shape: labels play the parent document, the answer is the
    // top-3 groups by best hit with 2 hits each, from a probe-pruned
    // scan. The oracle replays ingest normalization, assignment, probe
    // selection, and the full group-rank/hit-rank total orders.
    "q_maintained_grouped" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val d = java.nio.file.Files.createTempDirectory("graft_gr_q_").toFile
      jsonlTmpCleanup(d)
      val in = new java.io.File(d, "in").getAbsolutePath
      val table = new java.io.File(d, "t").getAbsolutePath
      val ckpt = new java.io.File(d, "c").getAbsolutePath
      val src = e.select($"vec_id".as("id"), $"embedding", $"label")
      src.coalesce(1).write.mode("overwrite").parquet(in)
      val stream = Streaming.streamInsertIndexedMaintained(
        s.readStream.schema(src.schema).parquet(in),
        dim = 64, numShards = 8, cents, "cent_id", "cvec", table, ckpt,
        maxCell = 1000000L)
      stream.processAllAvailable()
      stream.stop()
      val query = e.filter($"vec_id" === 42).select($"embedding")
        .head.getSeq[Float](0)
      Streaming.searchMaintainedGrouped(s, table, cents, "cent_id", "cvec",
          query, "label", nProbes = 2, nGroups = 3, perGroup = 2)
        .orderBy($"grp_rank", $"rnk")
    }),

    // RAG ask against the maintained on-disk index: chunk text rides
    // the table as passthrough metadata, retrieval is one probe-pruned
    // scan, and the assembled context + prompt are hash-checked — the
    // oracle replays normalization, assignment, probe selection, the
    // top-4 ranking, and the ordered string assembly.
    "q_rag_maintained" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val d = java.nio.file.Files.createTempDirectory("graft_rag_q_").toFile
      jsonlTmpCleanup(d)
      val in = new java.io.File(d, "in").getAbsolutePath
      val table = new java.io.File(d, "t").getAbsolutePath
      val ckpt = new java.io.File(d, "c").getAbsolutePath
      val docs = t(s, dir, "documents")
        .select($"doc_id", substring($"text", 1, 40).as("chunk"))
      val src = e.join(docs, e("vec_id") === docs("doc_id"))
        .select($"vec_id".as("id"), $"embedding", $"chunk")
      src.coalesce(1).write.mode("overwrite").parquet(in)
      val stream = Streaming.streamInsertIndexedMaintained(
        s.readStream.schema(src.schema).parquet(in),
        dim = 64, numShards = 8, cents, "cent_id", "cvec", table, ckpt,
        maxCell = 1000000L)
      stream.processAllAvailable()
      stream.stop()
      val query = e.filter($"vec_id" === 42).select($"embedding")
        .head.getSeq[Float](0)
      Rag.askMaintained(s, table, cents, "cent_id", "cvec", query,
        "where do vectors live", "chunk", nProbes = 2, k = 4)
    }),

    // Late-interaction (ColBERT MaxSim) serving against the maintained
    // index: full-vector probing for candidates, exact per-slice MaxSim
    // re-rank on the probed rows. The oracle replays normalization,
    // assignment, probe selection, and the slice-cosine max/sum
    // arithmetic over the STORED normalized float32s.
    "q_maintained_maxsim" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val d = java.nio.file.Files.createTempDirectory("graft_ms_q_").toFile
      jsonlTmpCleanup(d)
      val in = new java.io.File(d, "in").getAbsolutePath
      val table = new java.io.File(d, "t").getAbsolutePath
      val ckpt = new java.io.File(d, "c").getAbsolutePath
      val src = e.select($"vec_id".as("id"), $"embedding")
      src.coalesce(1).write.mode("overwrite").parquet(in)
      val stream = Streaming.streamInsertIndexedMaintained(
        s.readStream.schema(src.schema).parquet(in),
        dim = 64, numShards = 8, cents, "cent_id", "cvec", table, ckpt,
        maxCell = 1000000L)
      stream.processAllAvailable()
      stream.stop()
      val query = e.filter($"vec_id" === 42).select($"embedding")
        .head.getSeq[Float](0)
      Streaming.searchMaintainedMaxSim(s, table, cents, "cent_id", "cvec",
        query, nSlices = 4, nProbes = 2, k = 10)
    }),

    // SNAPSHOT-pinned serving: the pin is taken after two ingest
    // batches, then a third batch lands, a delete fires, and a
    // compaction FOLDS pre-pin batches to new addresses — the pinned
    // search must still answer exactly the two-batch table (minus the
    // delete: right-to-erasure reads current), because visibility rides
    // the permanent __b0 row version, not the folded directory address.
    // The oracle replays ingest normalization, assignment, probe
    // selection, the visibility rule (id < 250 ≡ batches ≤ pin), and
    // the delete — certifying the snapshot's row-level decisions.
    "q_maintained_snapshot" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val d = java.nio.file.Files.createTempDirectory("graft_snap_q_").toFile
      jsonlTmpCleanup(d)
      val in = new java.io.File(d, "in").getAbsolutePath
      val table = new java.io.File(d, "t").getAbsolutePath
      val ckpt = new java.io.File(d, "c").getAbsolutePath
      val src = e.select($"vec_id".as("id"), $"embedding")
      src.filter($"id" < 200).coalesce(1)
        .write.mode("overwrite").parquet(in)
      val stream = Streaming.streamInsertIndexedMaintained(
        s.readStream.schema(src.schema).parquet(in),
        dim = 64, numShards = 8, cents, "cent_id", "cvec", table, ckpt,
        maxCell = 1000000L)
      stream.processAllAvailable()
      src.filter($"id" >= 200 && $"id" < 250).coalesce(1)
        .write.mode("append").parquet(in)
      stream.processAllAvailable()
      val pin = Streaming.maintainedSnapshot(s, table)
      src.filter($"id" >= 250).coalesce(1)
        .write.mode("append").parquet(in)
      stream.processAllAvailable()
      stream.stop()
      Streaming.deleteMaintained(s, table,
        src.filter($"id" % 10 === 3).select($"id"), "id")
      Streaming.compactMaintained(s, table)
      val query = e.filter($"vec_id" === 42).select($"embedding")
        .head.getSeq[Float](0)
      Streaming.searchMaintained(s, table, cents, "cent_id", "cvec",
          query, nProbes = 4, k = 10, asOf = Some(pin))
        .select($"id", $"score", lit(pin).cast("long").as("pin"))
    }),

    // Community-quality gate: Newman modularity of the LPA communities
    // over the same edge fixture — the accept/retune score for a
    // community run. The per-community term 4·m·e_c − d_c² accumulates
    // as exact integers; one double division at the end.
    "q_modularity" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "events")
        .select($"user_id".as("src"),
          (lit(100000L) + $"event_id" % 50).as("dst"))
        .distinct()
      val labels = GraphOps.labelPropagation(e, "src", "dst", rounds = 3)
      GraphOps.modularity(e, "src", "dst", labels, "node", "lab")
    }),

    // Population stability index on doc length between even- and odd-
    // suffixed sources — the binned drift score beside q_ks_drift's CDF
    // gap: Laplace-smoothed bin shares, per-bin term quantized to
    // integer nano-units (the lexicalDrift KL discipline), the standard
    // < 0.1 / < 0.25 band read.
    "q_psi_drift" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val sfx = substring($"source", 4, 10).cast("int")
      Mining.psiDrift(docs.filter(sfx % 2 === 0), docs.filter(sfx % 2 =!= 0),
        "n_chars", Seq(150L, 250L, 350L, 450L))
    }),

    // Embedding-collapse diagnostic: per-label ANISOTROPY = the norm of
    // the mean UNIT vector — 0 for perfectly spread directions, → 1 as
    // the space collapses onto one direction (the contrastive-training
    // failure mode; Ethayarajh 2019's anisotropy lens). Integer-exact:
    // unit elements quantize to micro-units, per-dim means re-quantize,
    // the squared-norm sums 64 exact longs, ONE sqrt at the end.
    "q_anisotropy" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val nrm = greatest(sqrt(dotF($"embedding", $"embedding")), lit(V.NormEps))
      e.withColumn("__n", nrm)
        .select($"label", posexplode($"embedding").as(Seq("pos", "x")),
          $"__n")
        .select($"label", $"pos",
          round(($"x".cast("double") / $"__n") * 1e6, 0).cast("long").as("u6"))
        .groupBy($"label", $"pos")
        .agg(sum($"u6").as("s"), count(lit(1)).as("nn"))
        .select($"label", $"nn",
          round(round($"s".cast("double") / 1e6 / $"nn", 6) * 1e6, 0)
            .cast("long").as("m6"))
        .groupBy($"label")
        .agg(max($"nn").as("n"),
          (round(sqrt(sum($"m6" * $"m6").cast("double")) / 1e6, 6) + lit(0.0))
            .as("anisotropy"))
        .orderBy($"label")
    }),

    // Calibration audit: reliability diagram + ECE over a deterministic
    // confidence (uniform via doc_id·37 mod 1000) against the
    // length-rule label — the audit every confidence-thresholded
    // quality gate needs before `conf > t` means anything. Per-bin
    // micro-means, ECE from the same rounded values the rows display.
    "q_reliability" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select((pmod($"doc_id" * 37, lit(1000)).cast("double") / 1000.0)
          .as("conf"),
          ($"n_chars" > 300).cast("long").as("y"))
      Mining.reliabilityReport(docs, "conf", "y", nBins = 10)
        .orderBy($"bin")
    })
  )

  /** Shared oracle prefix: the full rebalance pass in SQL — assignment
    * (the q_ann_ivf CTEs), data-relative bounds, hot/tiny classification,
    * smallest-id seed selection with child numbering, hot-member
    * re-assignment to nearest child, tiny-member re-assignment to nearest
    * survivor, and the merged final assignment + survivor centroid set.
    */
  private val rebalanceSqlPrefix: String =
    """WITH cents AS (
      |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id < 16),
      |pc AS (
      |  SELECT e.vec_id, c.cent_id,
      |         unnest(e.embedding)::DOUBLE x, unnest(c.cvec)::DOUBLE y
      |  FROM embeddings e CROSS JOIN cents c),
      |pagg AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
      |         FROM pc GROUP BY vec_id, cent_id),
      |psc AS (SELECT vec_id, cent_id,
      |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
      |        FROM pagg),
      |assign AS (
      |  SELECT vec_id, cent_id AS cell_id FROM (
      |    SELECT vec_id, cent_id,
      |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
      |    FROM psc) WHERE rn = 1),
      |par AS (SELECT GREATEST(1, (21 * COUNT(*)) // 320) AS maxcell,
      |               (9 * COUNT(*)) // 160 AS mincell
      |        FROM embeddings),
      |sizes AS (
      |  SELECT c.cent_id AS cell_id, COALESCE(s.n, 0) AS n
      |  FROM cents c LEFT JOIN (
      |    SELECT cell_id, COUNT(*) AS n FROM assign GROUP BY cell_id) s
      |  ON c.cent_id = s.cell_id),
      |cls AS (
      |  SELECT z.cell_id, z.n,
      |         (z.n > p.maxcell) AS hot,
      |         (z.n <= p.maxcell AND z.n < p.mincell) AS tiny
      |  FROM sizes z CROSS JOIN par p),
      |seeds AS (
      |  SELECT parent, seed_id,
      |         row_number() OVER (ORDER BY parent, seed_id) + 15 AS child_id
      |  FROM (
      |    SELECT a.cell_id AS parent, a.vec_id AS seed_id,
      |           row_number() OVER (PARTITION BY a.cell_id ORDER BY a.vec_id) rn,
      |           (c.n + p.maxcell - 1) // p.maxcell AS s
      |    FROM assign a
      |    JOIN cls c ON c.cell_id = a.cell_id AND c.hot
      |    CROSS JOIN par p)
      |  WHERE rn <= s),
      |childv AS (
      |  SELECT s.child_id, s.parent, e.embedding AS cvec
      |  FROM seeds s JOIN embeddings e ON e.vec_id = s.seed_id),
      |hotpairs AS (
      |  SELECT m.vec_id, cv.child_id,
      |         unnest(e.embedding)::DOUBLE x, unnest(cv.cvec)::DOUBLE y
      |  FROM assign m
      |  JOIN cls ON cls.cell_id = m.cell_id AND cls.hot
      |  JOIN embeddings e ON e.vec_id = m.vec_id
      |  JOIN childv cv ON cv.parent = m.cell_id),
      |hotsc AS (
      |  SELECT vec_id, child_id,
      |         ROUND(SUM(x*y)/(GREATEST(SQRT(SUM(x*x)),1e-12)
      |               *GREATEST(SQRT(SUM(y*y)),1e-12)), 6) c
      |  FROM hotpairs GROUP BY vec_id, child_id),
      |hotre AS (
      |  SELECT vec_id, child_id AS cell_id FROM (
      |    SELECT vec_id, child_id,
      |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, child_id) rn
      |    FROM hotsc) WHERE rn = 1),
      |surv AS (
      |  SELECT c.cent_id AS cell_id, c.cvec FROM cents c
      |  JOIN cls ON cls.cell_id = c.cent_id AND NOT cls.hot AND NOT cls.tiny
      |  UNION ALL
      |  SELECT child_id AS cell_id, cvec FROM childv),
      |tinypairs AS (
      |  SELECT m.vec_id, sv.cell_id AS scell,
      |         unnest(e.embedding)::DOUBLE x, unnest(sv.cvec)::DOUBLE y
      |  FROM assign m
      |  JOIN cls ON cls.cell_id = m.cell_id AND cls.tiny
      |  JOIN embeddings e ON e.vec_id = m.vec_id
      |  CROSS JOIN surv sv),
      |tinysc AS (
      |  SELECT vec_id, scell,
      |         ROUND(SUM(x*y)/(GREATEST(SQRT(SUM(x*x)),1e-12)
      |               *GREATEST(SQRT(SUM(y*y)),1e-12)), 6) c
      |  FROM tinypairs GROUP BY vec_id, scell),
      |tinyre AS (
      |  SELECT vec_id, scell AS cell_id FROM (
      |    SELECT vec_id, scell,
      |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, scell) rn
      |    FROM tinysc) WHERE rn = 1),
      |finala AS (
      |  SELECT a.vec_id, a.cell_id FROM assign a
      |  JOIN cls ON cls.cell_id = a.cell_id AND NOT cls.hot AND NOT cls.tiny
      |  UNION ALL SELECT vec_id, cell_id FROM hotre
      |  UNION ALL SELECT vec_id, cell_id FROM tinyre)""".stripMargin

  private def round10Oracles: Map[String, String] = Map(

    "q_ivf_rebalance" ->
      s"""$rebalanceSqlPrefix
         |SELECT cell_id, COUNT(*) AS n, CAST(cell_id > 15 AS INT) AS is_child
         |FROM finala GROUP BY cell_id ORDER BY cell_id""".stripMargin,

    "q_ivf_rebalance_search" ->
      s"""$rebalanceSqlPrefix,
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 42),
         |probepairs AS (
         |  SELECT sv.cell_id, unnest(sv.cvec)::DOUBLE x, unnest(q.qe)::DOUBLE y
         |  FROM surv sv CROSS JOIN q),
         |probesc AS (
         |  SELECT cell_id,
         |         ROUND(SUM(x*y)/(GREATEST(SQRT(SUM(x*x)),1e-12)
         |               *GREATEST(SQRT(SUM(y*y)),1e-12)), 6) c
         |  FROM probepairs GROUP BY cell_id),
         |probes AS (SELECT cell_id FROM probesc ORDER BY c DESC, cell_id LIMIT 4),
         |cand AS (SELECT f.vec_id FROM finala f JOIN probes p ON f.cell_id = p.cell_id),
         |qp AS (
         |  SELECT e.vec_id, unnest(e.embedding)::DOUBLE x, unnest(q.qe)::DOUBLE y
         |  FROM embeddings e JOIN cand ON cand.vec_id = e.vec_id CROSS JOIN q),
         |qsc AS (
         |  SELECT vec_id,
         |         ROUND(SUM(x*y)/(GREATEST(SQRT(SUM(x*x)),1e-12)
         |               *GREATEST(SQRT(SUM(y*y)),1e-12)), 6) + 0.0 AS score
         |  FROM qp GROUP BY vec_id)
         |SELECT vec_id, score FROM qsc ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    // the logical live count is vacuum-invariant by construction; the
    // sidecar column replays the 0.3 dead-fraction gate per source
    "q_tombstone_vacuum" ->
      """WITH dels AS (
        |  SELECT doc_id, source FROM documents
        |  WHERE (CAST(substr(source, 4) AS INT) % 2 = 0 AND doc_id % 3 <> 0)
        |     OR (CAST(substr(source, 4) AS INT) % 2 = 1 AND doc_id % 7 = 0)),
        |agg AS (
        |  SELECT d.source, COUNT(*) AS n_total, COUNT(x.doc_id) AS n_dead
        |  FROM documents d LEFT JOIN dels x ON d.doc_id = x.doc_id
        |  GROUP BY d.source)
        |SELECT source, n_total - n_dead AS n_live,
        |       CASE WHEN CAST(n_dead AS DOUBLE) / n_total >= 0.3
        |            THEN 0 ELSE n_dead END AS n_tomb
        |FROM agg ORDER BY source""".stripMargin,

    "q_reshard_plan" -> {
      // the Horner md5-fold of q_shard_route, parameterized by modulus
      def modShard(n: Int) =
        s"""SELECT vec_id,
           |  (((((('0x'||substr(hx, 1,8))::BIGINT % $n) * 4294967296
           |      + ('0x'||substr(hx, 9,8))::BIGINT) % $n) * 4294967296
           |      + ('0x'||substr(hx,17,8))::BIGINT) % $n
           |      * 4294967296 + ('0x'||substr(hx,25,8))::BIGINT) % $n AS shard
           |FROM (SELECT vec_id, md5(vec_id::VARCHAR) AS hx FROM embeddings)""".stripMargin
      def rdvShard(n: Int) =
        s"""SELECT vec_id, s AS shard FROM (
           |  SELECT vec_id, s,
           |         row_number() OVER (PARTITION BY vec_id ORDER BY w DESC, s) rn
           |  FROM (
           |    SELECT e.vec_id, g.s,
           |           ('0x'||substr(md5(e.vec_id::VARCHAR||':'||g.s::VARCHAR),1,15))::BIGINT w
           |    FROM embeddings e CROSS JOIN (SELECT unnest(range($n)) AS s) g))
           |WHERE rn = 1""".stripMargin
      s"""WITH m8 AS (${modShard(8)}),
         |m10 AS (${modShard(10)}),
         |r8 AS (${rdvShard(8)}),
         |r10 AS (${rdvShard(10)})
         |SELECT 'mod' AS scheme,
         |       SUM(CASE WHEN a.shard <> b.shard THEN 1 ELSE 0 END)::BIGINT AS moved,
         |       COUNT(*) AS total,
         |       ROUND(SUM(CASE WHEN a.shard <> b.shard THEN 1 ELSE 0 END)::DOUBLE
         |             / COUNT(*), 6) + 0.0 AS moved_pct
         |FROM m8 a JOIN m10 b ON a.vec_id = b.vec_id
         |UNION ALL
         |SELECT 'rendezvous' AS scheme,
         |       SUM(CASE WHEN a.shard <> b.shard THEN 1 ELSE 0 END)::BIGINT AS moved,
         |       COUNT(*) AS total,
         |       ROUND(SUM(CASE WHEN a.shard <> b.shard THEN 1 ELSE 0 END)::DOUBLE
         |             / COUNT(*), 6) + 0.0 AS moved_pct
         |FROM r8 a JOIN r10 b ON a.vec_id = b.vec_id
         |ORDER BY scheme""".stripMargin
    },

    // both branches replay identically: gen-2 parts (doc_id%4 >= 2)
    // carry score = n_chars*2, gen-1 holes fill with n_chars+7 — on
    // merge-on-read via coalesce, physically via backfillColumn
    "q_schema_evolve" ->
      """WITH e AS (
        |  SELECT doc_id % 4 AS part,
        |         CASE WHEN doc_id % 4 >= 2 THEN n_chars * 2
        |              ELSE n_chars + 7 END AS score
        |  FROM documents),
        |a AS (SELECT part, SUM(score)::BIGINT AS s, COUNT(*) AS n
        |      FROM e GROUP BY part)
        |SELECT 'mor' AS branch, part, s, n FROM a
        |UNION ALL
        |SELECT 'phys' AS branch, part, s, n FROM a
        |ORDER BY branch, part""".stripMargin,

    // base ∪ delta recompute; the engine's incremental bookkeeping must
    // land on the same table AND report exactly one refreshed partition
    "q_incremental_rollup" ->
      """WITH delta AS (
        |  SELECT doc_id + 1000000 AS doc_id, lang, n_chars + 11 AS n_chars,
        |         source
        |  FROM documents WHERE source = 'src0'),
        |allrows AS (
        |  SELECT doc_id, lang, n_chars, source FROM documents
        |  UNION ALL SELECT * FROM delta)
        |SELECT source, lang, COUNT(*) AS n_docs, SUM(n_chars)::BIGINT AS sum_chars,
        |       CAST(1 AS BIGINT) AS n_refreshed
        |FROM allrows GROUP BY source, lang
        |ORDER BY source, lang""".stripMargin,

    "q_filtered_ann_pre" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 42),
        |pairs AS (
        |  SELECT e.vec_id, unnest(e.embedding)::DOUBLE x, unnest(q.qe)::DOUBLE y
        |  FROM embeddings e CROSS JOIN q WHERE e.label = 5),
        |agg AS (SELECT vec_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |        FROM pairs GROUP BY vec_id),
        |sc AS (SELECT vec_id,
        |         ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6)
        |           + 0.0 AS score
        |       FROM agg)
        |SELECT vec_id, score, 'pre' AS path
        |FROM sc ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    "q_filtered_ann_post" ->
      """WITH cents AS (
        |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id < 16),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 42),
        |cp AS (
        |  SELECT c.cent_id, unnest(c.cvec)::DOUBLE x, unnest(q.qe)::DOUBLE y
        |  FROM cents c CROSS JOIN q),
        |cagg AS (SELECT cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM cp GROUP BY cent_id),
        |probes AS (
        |  SELECT cent_id AS cell_id FROM (
        |    SELECT cent_id,
        |           ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |    FROM cagg ORDER BY c DESC, cent_id LIMIT 4)),
        |pc AS (
        |  SELECT e.vec_id, c.cent_id,
        |         unnest(e.embedding)::DOUBLE x, unnest(c.cvec)::DOUBLE y
        |  FROM embeddings e CROSS JOIN cents c),
        |pagg AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM pc GROUP BY vec_id, cent_id),
        |psc AS (SELECT vec_id, cent_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |        FROM pagg),
        |assign AS (
        |  SELECT vec_id, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
        |    FROM psc) WHERE rn = 1),
        |cand AS (
        |  SELECT a.vec_id FROM assign a
        |  JOIN probes p ON p.cell_id = a.cell_id
        |  JOIN embeddings e ON e.vec_id = a.vec_id AND e.label % 2 = 0),
        |pairs AS (
        |  SELECT e.vec_id, unnest(e.embedding)::DOUBLE x, unnest(q.qe)::DOUBLE y
        |  FROM embeddings e JOIN cand cd ON cd.vec_id = e.vec_id CROSS JOIN q),
        |agg AS (SELECT vec_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |        FROM pairs GROUP BY vec_id),
        |sc AS (SELECT vec_id,
        |         ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6)
        |           + 0.0 AS score
        |       FROM agg)
        |SELECT vec_id, score, 'post' AS path
        |FROM sc ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    "q_ns_search" ->
      """WITH cents AS (
        |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id < 16),
        |qs AS (SELECT vec_id AS qid, embedding AS qvec, label AS qns
        |       FROM embeddings WHERE vec_id % 100 = 42),
        |cp AS (
        |  SELECT q.qid, c.cent_id, unnest(c.cvec)::DOUBLE x, unnest(q.qvec)::DOUBLE y
        |  FROM cents c CROSS JOIN qs q),
        |cagg AS (SELECT qid, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM cp GROUP BY qid, cent_id),
        |csc AS (SELECT qid, cent_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |        FROM cagg),
        |probes AS (
        |  SELECT qid, cent_id AS cell_id FROM (
        |    SELECT qid, cent_id,
        |           row_number() OVER (PARTITION BY qid ORDER BY c DESC, cent_id) rn
        |    FROM csc) WHERE rn <= 4),
        |pc AS (
        |  SELECT e.vec_id, c.cent_id,
        |         unnest(e.embedding)::DOUBLE x, unnest(c.cvec)::DOUBLE y
        |  FROM embeddings e CROSS JOIN cents c),
        |pagg AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM pc GROUP BY vec_id, cent_id),
        |psc AS (SELECT vec_id, cent_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |        FROM pagg),
        |assign AS (
        |  SELECT vec_id, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
        |    FROM psc) WHERE rn = 1),
        |cand AS (
        |  SELECT q.qid, e.vec_id
        |  FROM qs q
        |  JOIN embeddings e ON e.label = q.qns
        |  JOIN assign a ON a.vec_id = e.vec_id
        |  JOIN probes p ON p.qid = q.qid AND p.cell_id = a.cell_id),
        |spairs AS (
        |  SELECT cd.qid, cd.vec_id,
        |         unnest(e.embedding)::DOUBLE x, unnest(q.qvec)::DOUBLE y
        |  FROM cand cd
        |  JOIN embeddings e ON e.vec_id = cd.vec_id
        |  JOIN qs q ON q.qid = cd.qid),
        |sagg AS (SELECT qid, vec_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM spairs GROUP BY qid, vec_id),
        |ssc AS (SELECT qid, vec_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6)
        |            + 0.0 AS score
        |        FROM sagg)
        |SELECT qid, vec_id, score FROM (
        |  SELECT qid, vec_id, score,
        |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) rn
        |  FROM ssc) WHERE rn <= 5 ORDER BY qid, vec_id""".stripMargin,

    "q_silhouette" ->
      """WITH cents AS (
        |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id < 16),
        |pc AS (
        |  SELECT e.vec_id, c.cent_id,
        |         unnest(e.embedding)::DOUBLE x, unnest(c.cvec)::DOUBLE y
        |  FROM embeddings e CROSS JOIN cents c),
        |pagg AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM pc GROUP BY vec_id, cent_id),
        |psc AS (SELECT vec_id, cent_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |        FROM pagg),
        |own AS (
        |  SELECT vec_id, cent_id, c FROM (
        |    SELECT vec_id, cent_id, c,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
        |    FROM psc) WHERE rn = 1),
        |oth AS (
        |  SELECT p.vec_id, MAX(p.c) AS mc
        |  FROM psc p JOIN own o ON o.vec_id = p.vec_id AND p.cent_id <> o.cent_id
        |  GROUP BY p.vec_id),
        |sil AS (
        |  SELECT o.cent_id AS cell_id, (1.0 - o.c) AS a, (1.0 - t.mc) AS b
        |  FROM own o JOIN oth t ON t.vec_id = o.vec_id),
        |sq AS (
        |  SELECT cell_id,
        |         CAST(ROUND(a * 1000000, 0) AS BIGINT) AS a6,
        |         CAST(ROUND((CASE WHEN GREATEST(a, b) <= 0 THEN 0.0
        |              ELSE ROUND((b - a) / GREATEST(a, b), 6) END) * 1000000, 0)
        |           AS BIGINT) AS s6
        |  FROM sil)
        |SELECT cell_id, COUNT(*) AS n,
        |       ROUND(SUM(a6) / 1000000.0 / COUNT(*), 6) + 0.0 AS mean_a,
        |       ROUND(SUM(s6) / 1000000.0 / COUNT(*), 6) + 0.0 AS mean_s
        |FROM sq GROUP BY cell_id ORDER BY cell_id""".stripMargin,

    "q_probe_tune" -> probeTuneSql,

    "q_pq_distortion" -> pqDistortionSql,

    "q_ks_drift" ->
      """WITH ga AS (
        |  SELECT n_chars AS v, COUNT(*) AS na FROM documents
        |  WHERE CAST(substr(source, 4) AS INT) % 2 = 0 GROUP BY 1),
        |gb AS (
        |  SELECT n_chars AS v, COUNT(*) AS nb FROM documents
        |  WHERE CAST(substr(source, 4) AS INT) % 2 <> 0 GROUP BY 1),
        |m AS (
        |  SELECT COALESCE(ga.v, gb.v) AS v, COALESCE(na, 0) AS na,
        |         COALESCE(nb, 0) AS nb
        |  FROM ga FULL OUTER JOIN gb ON ga.v = gb.v),
        |c AS (
        |  SELECT SUM(na) OVER (ORDER BY v) AS ca,
        |         SUM(nb) OVER (ORDER BY v) AS cb FROM m),
        |t AS (SELECT SUM(na) AS tna, SUM(nb) AS tnb FROM m),
        |d AS (
        |  SELECT MAX(ABS(ca * t.tnb - cb * t.tna)) AS dd,
        |         ANY_VALUE(t.tna) AS na, ANY_VALUE(t.tnb) AS nb
        |  FROM c, t),
        |r AS (
        |  SELECT na, nb,
        |         ROUND(dd * 1.0 / (na * 1.0 * nb), 6) + 0.0 AS ks FROM d)
        |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b, ks,
        |       ROUND(ks * SQRT(na * 1.0 * nb / (na + nb)), 6) + 0.0 AS ks_stat,
        |       CAST(ROUND(ks * SQRT(na * 1.0 * nb / (na + nb)), 6) > 1.358 AS INT)
        |         AS reject
        |FROM r""".stripMargin,

    "q_jsonl_tolerant" ->
      """SELECT COUNT(*) FILTER (WHERE doc_id % 7 <> 0) AS n_good,
        |       COUNT(*) FILTER (WHERE doc_id % 7 = 0) AS n_bad,
        |       COALESCE(SUM(n_chars) FILTER (WHERE doc_id % 7 <> 0), 0)::BIGINT
        |         AS sum_chars
        |FROM documents""".stripMargin,

    // Replays the full ANN-decontamination composition: train cell
    // assignment (6-dp argmax), per-eval probe selection (top-4 cells),
    // candidate generation in probed cells, quantized-cosine verify,
    // and the (score desc, eval_id asc) best-match total order.
    "q_semantic_decontaminate" ->
      """WITH cents AS (
        |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id < 16),
        |ev AS (SELECT vec_id AS eid, embedding AS evec FROM embeddings
        |       WHERE vec_id % 50 = 17),
        |tr AS (SELECT vec_id AS tid, embedding AS tvec FROM embeddings
        |       WHERE vec_id % 50 <> 17),
        |tp AS (
        |  SELECT t.tid, c.cent_id,
        |         unnest(t.tvec)::DOUBLE x, unnest(c.cvec)::DOUBLE y
        |  FROM tr t CROSS JOIN cents c),
        |ta AS (SELECT tid, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |       FROM tp GROUP BY tid, cent_id),
        |tsc AS (SELECT tid, cent_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |        FROM ta),
        |assign AS (
        |  SELECT tid, cent_id AS cell_id FROM (
        |    SELECT tid, cent_id,
        |           row_number() OVER (PARTITION BY tid ORDER BY c DESC, cent_id) rn
        |    FROM tsc) WHERE rn = 1),
        |ep AS (
        |  SELECT e.eid, c.cent_id,
        |         unnest(e.evec)::DOUBLE x, unnest(c.cvec)::DOUBLE y
        |  FROM ev e CROSS JOIN cents c),
        |ea AS (SELECT eid, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |       FROM ep GROUP BY eid, cent_id),
        |esc AS (SELECT eid, cent_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |        FROM ea),
        |probes AS (
        |  SELECT eid, cent_id AS cell_id FROM (
        |    SELECT eid, cent_id,
        |           row_number() OVER (PARTITION BY eid ORDER BY c DESC, cent_id) rn
        |    FROM esc) WHERE rn <= 4),
        |cp AS (
        |  SELECT a.tid, p.eid,
        |         unnest(t.tvec)::DOUBLE x, unnest(e.evec)::DOUBLE y
        |  FROM assign a JOIN probes p ON a.cell_id = p.cell_id
        |  JOIN tr t ON t.tid = a.tid
        |  JOIN ev e ON e.eid = p.eid),
        |cagg AS (SELECT tid, eid, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM cp GROUP BY tid, eid),
        |csc AS (SELECT tid, eid,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6)
        |            + 0.0 AS score
        |        FROM cagg),
        |flt AS (SELECT * FROM csc WHERE score >= 0.3),
        |best AS (
        |  SELECT tid, eid, score,
        |         row_number() OVER (PARTITION BY tid ORDER BY score DESC, eid) rn
        |  FROM flt)
        |SELECT tid AS train_id, eid AS eval_id, score
        |FROM best WHERE rn = 1 ORDER BY train_id""".stripMargin,

    // Replays the ENTIRE maintained lifecycle: float32 normalization
    // (the ingest's prepare step), assignment of normalized vectors,
    // per-cell fold eligibility (>= 2 foldable batch subdirs, the
    // largest ingest batch spared), the tombstone purge/keep split,
    // probe selection, and the delete-aware final ranking.
    "q_maintained_lifecycle" ->
      """WITH cents AS (
        |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id < 16),
        |nrm AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x::DOUBLE /
        |      GREATEST(SQRT(list_sum(list_transform(embedding,
        |        y -> y::DOUBLE * y::DOUBLE))), 1e-12) AS REAL)) AS emb
        |  FROM embeddings),
        |pc AS (
        |  SELECT n.vec_id, c.cent_id,
        |         unnest(n.emb)::DOUBLE x, unnest(c.cvec)::DOUBLE y
        |  FROM nrm n CROSS JOIN cents c),
        |pagg AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM pc GROUP BY vec_id, cent_id),
        |psc AS (SELECT vec_id, cent_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |        FROM pagg),
        |assign AS (
        |  SELECT vec_id, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
        |    FROM psc) WHERE rn = 1),
        |bmem AS (
        |  SELECT a.vec_id, a.cell_id,
        |         CASE WHEN a.vec_id < 200 THEN 0
        |              WHEN a.vec_id < 250 THEN 1 ELSE 2 END AS b
        |  FROM assign a),
        |fold AS (
        |  SELECT cell_id FROM bmem WHERE b < 2
        |  GROUP BY cell_id HAVING COUNT(DISTINCT b) >= 2),
        |dels AS (SELECT vec_id, cell_id, b FROM bmem WHERE vec_id % 10 = 3),
        |dr AS (SELECT COUNT(*) AS c FROM dels JOIN fold USING (cell_id)
        |       WHERE b < 2),
        |tot AS (SELECT COUNT(*) AS c FROM dels),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 42),
        |cp AS (
        |  SELECT c.cent_id, unnest(c.cvec)::DOUBLE x, unnest(q.qe)::DOUBLE y
        |  FROM cents c CROSS JOIN q),
        |cagg AS (SELECT cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM cp GROUP BY cent_id),
        |probes AS (
        |  SELECT cent_id AS cell_id FROM (
        |    SELECT cent_id,
        |           ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |    FROM cagg ORDER BY c DESC, cent_id LIMIT 4)),
        |cand AS (
        |  SELECT a.vec_id FROM assign a JOIN probes p ON p.cell_id = a.cell_id
        |  WHERE a.vec_id % 10 <> 3),
        |sp AS (
        |  SELECT n.vec_id, unnest(n.emb)::DOUBLE x, unnest(q.qe)::DOUBLE y
        |  FROM nrm n JOIN cand cd ON cd.vec_id = n.vec_id CROSS JOIN q),
        |sagg AS (SELECT vec_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM sp GROUP BY vec_id),
        |sc AS (SELECT vec_id,
        |         ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6)
        |           + 0.0 AS score
        |       FROM sagg)
        |SELECT vec_id AS id, score, (tot.c - dr.c) AS tomb_kept,
        |       dr.c AS tomb_dropped
        |FROM sc CROSS JOIN dr CROSS JOIN tot
        |ORDER BY score DESC, id LIMIT 10""".stripMargin,

    // Replays one Lloyd iteration exactly: init = the 8 lowest-id
    // vectors (cent_id = rank), assignment by 6-dp-quantized cosine
    // argmax (ties to lowest cent), per-(cell, dim) means as exact
    // integer micro-unit sums with the half-even final rounding Spark's
    // math.rint applies, float32 cast, no-member cells keep their init.
    "q_kmeans_train" ->
      """WITH init AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cent_id,
        |         embedding AS cvec
        |  FROM embeddings ORDER BY vec_id LIMIT 8),
        |pc AS (
        |  SELECT e.vec_id, i.cent_id,
        |         unnest(e.embedding)::DOUBLE x, unnest(i.cvec)::DOUBLE y
        |  FROM embeddings e CROSS JOIN init i),
        |pagg AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM pc GROUP BY vec_id, cent_id),
        |psc AS (SELECT vec_id, cent_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |        FROM pagg),
        |assign AS (
        |  SELECT vec_id, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
        |    FROM psc) WHERE rn = 1),
        |memb0 AS (
        |  SELECT a.cell_id, e.embedding AS emb,
        |         unnest(generate_series(1, len(e.embedding))) AS i
        |  FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id),
        |members AS (
        |  SELECT cell_id, i - 1 AS pos,
        |         ROUND(emb[i]::DOUBLE * 1e6, 0)::BIGINT AS xm
        |  FROM memb0),
        |means AS (
        |  SELECT cell_id, pos,
        |         CAST(ROUND_EVEN(SUM(xm)::DOUBLE / COUNT(*), 0) / 1e6 AS REAL) AS v
        |  FROM members GROUP BY cell_id, pos),
        |grid AS (
        |  SELECT i.cent_id, gs.i - 1 AS pos,
        |         CAST(i.cvec[gs.i] AS REAL) AS v0
        |  FROM init i CROSS JOIN
        |       (SELECT unnest(generate_series(1, 64)) AS i) gs
        |  WHERE gs.i <= len(i.cvec))
        |SELECT g.cent_id, g.pos, COALESCE(m.v, g.v0) AS v
        |FROM grid g LEFT JOIN means m
        |  ON m.cell_id = g.cent_id AND m.pos = g.pos
        |ORDER BY g.cent_id, g.pos""".stripMargin,

    // Replays the rebuild: normalized float32 rows, the delete rule,
    // one Lloyd iteration from the lowest-8 LIVE ids (micro-unit means,
    // half-even), argmax re-assignment to the retrained centroids,
    // top-2 probe selection, delete-aware ranking. Retrained cell ids
    // shift by a constant (disjoint from the old ids), which preserves
    // every tie-break order, so the oracle ranks with rank-as-id.
    "q_maintained_retrain" ->
      """WITH nrm AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x::DOUBLE /
        |      GREATEST(SQRT(list_sum(list_transform(embedding,
        |        y -> y::DOUBLE * y::DOUBLE))), 1e-12) AS REAL)) AS emb
        |  FROM embeddings),
        |live AS (SELECT vec_id, emb FROM nrm WHERE vec_id % 10 <> 3),
        |init AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cent_id,
        |         emb AS cvec
        |  FROM live ORDER BY vec_id LIMIT 8),
        |pc AS (
        |  SELECT l.vec_id, i.cent_id,
        |         unnest(l.emb)::DOUBLE x, unnest(i.cvec)::DOUBLE y
        |  FROM live l CROSS JOIN init i),
        |pagg AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM pc GROUP BY vec_id, cent_id),
        |psc AS (SELECT vec_id, cent_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |        FROM pagg),
        |assign0 AS (
        |  SELECT vec_id, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
        |    FROM psc) WHERE rn = 1),
        |memb0 AS (
        |  SELECT a.cell_id, l.emb,
        |         unnest(generate_series(1, len(l.emb))) AS i
        |  FROM assign0 a JOIN live l ON l.vec_id = a.vec_id),
        |means AS (
        |  SELECT cell_id, i - 1 AS pos,
        |         CAST(ROUND_EVEN(SUM(ROUND(emb[i]::DOUBLE * 1e6, 0)::BIGINT)::DOUBLE
        |                / COUNT(*), 0) / 1e6 AS REAL) AS v
        |  FROM memb0 GROUP BY cell_id, i),
        |newc AS (
        |  SELECT i.cent_id,
        |         list(COALESCE(m.v, CAST(i.cvec[gs.i] AS REAL))
        |              ORDER BY gs.i) AS cvec
        |  FROM init i
        |  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) gs
        |  LEFT JOIN means m ON m.cell_id = i.cent_id AND m.pos = gs.i - 1
        |  WHERE gs.i <= len(i.cvec)
        |  GROUP BY i.cent_id),
        |rc AS (
        |  SELECT l.vec_id, n.cent_id,
        |         unnest(l.emb)::DOUBLE x, unnest(n.cvec)::DOUBLE y
        |  FROM live l CROSS JOIN newc n),
        |ragg AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM rc GROUP BY vec_id, cent_id),
        |rsc AS (SELECT vec_id, cent_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |        FROM ragg),
        |rassign AS (
        |  SELECT vec_id, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
        |    FROM rsc) WHERE rn = 1),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 42),
        |qc AS (
        |  SELECT n.cent_id, unnest(n.cvec)::DOUBLE x, unnest(q.qe)::DOUBLE y
        |  FROM newc n CROSS JOIN q),
        |qagg AS (SELECT cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM qc GROUP BY cent_id),
        |probes AS (
        |  SELECT cent_id AS cell_id FROM (
        |    SELECT cent_id,
        |           ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |    FROM qagg ORDER BY c DESC, cent_id LIMIT 2)),
        |cand AS (
        |  SELECT a.vec_id FROM rassign a JOIN probes p ON p.cell_id = a.cell_id),
        |sp AS (
        |  SELECT l.vec_id, unnest(l.emb)::DOUBLE x, unnest(q.qe)::DOUBLE y
        |  FROM live l JOIN cand cd ON cd.vec_id = l.vec_id CROSS JOIN q),
        |sagg AS (SELECT vec_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM sp GROUP BY vec_id),
        |sc AS (SELECT vec_id,
        |         ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6)
        |           + 0.0 AS score
        |       FROM sagg)
        |SELECT vec_id AS id, score, CAST(1 AS BIGINT) AS version
        |FROM sc ORDER BY score DESC, id LIMIT 10""".stripMargin,

    // Replays the recall audit end to end: stored vectors are the
    // ingest-normalized float32s, probe selection is per-query top-2
    // cells, approx restricts scoring to probed cells, exact ranks the
    // full corpus, and recall is the semi-join hit count over k.
    "q_maintained_recall" ->
      """WITH cents AS (
        |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id < 16),
        |nrm AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x::DOUBLE /
        |      GREATEST(SQRT(list_sum(list_transform(embedding,
        |        y -> y::DOUBLE * y::DOUBLE))), 1e-12) AS REAL)) AS emb
        |  FROM embeddings),
        |pc AS (
        |  SELECT n.vec_id, c.cent_id,
        |         unnest(n.emb)::DOUBLE x, unnest(c.cvec)::DOUBLE y
        |  FROM nrm n CROSS JOIN cents c),
        |pagg AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM pc GROUP BY vec_id, cent_id),
        |psc AS (SELECT vec_id, cent_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |        FROM pagg),
        |assign AS (
        |  SELECT vec_id, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
        |    FROM psc) WHERE rn = 1),
        |qs AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings
        |       WHERE vec_id % 100 = 42),
        |pcq AS (
        |  SELECT q.qid, c.cent_id,
        |         unnest(c.cvec)::DOUBLE x, unnest(q.qvec)::DOUBLE y
        |  FROM cents c CROSS JOIN qs q),
        |pq AS (SELECT qid, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |       FROM pcq GROUP BY qid, cent_id),
        |pqs AS (SELECT qid, cent_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |        FROM pq),
        |probes AS (
        |  SELECT qid, cent_id AS cell_id FROM (
        |    SELECT qid, cent_id,
        |           row_number() OVER (PARTITION BY qid ORDER BY c DESC, cent_id) rn
        |    FROM pqs) WHERE rn <= 2),
        |sp AS (
        |  SELECT n.vec_id, q.qid,
        |         unnest(n.emb)::DOUBLE x, unnest(q.qvec)::DOUBLE y
        |  FROM nrm n CROSS JOIN qs q),
        |sagg AS (SELECT vec_id, qid, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM sp GROUP BY vec_id, qid),
        |sc AS (SELECT vec_id, qid,
        |         ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6)
        |           + 0.0 AS score
        |       FROM sagg),
        |exact AS (
        |  SELECT qid, vec_id FROM (
        |    SELECT qid, vec_id,
        |           row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) rn
        |    FROM sc) WHERE rn <= 5),
        |approx AS (
        |  SELECT qid, vec_id FROM (
        |    SELECT s.qid, s.vec_id,
        |           row_number() OVER (PARTITION BY s.qid ORDER BY s.score DESC, s.vec_id) rn
        |    FROM sc s
        |    JOIN assign a ON a.vec_id = s.vec_id
        |    JOIN probes p ON p.qid = s.qid AND p.cell_id = a.cell_id)
        |  WHERE rn <= 5),
        |ne AS (SELECT qid, COUNT(*) AS n_exact FROM exact GROUP BY qid),
        |nh AS (SELECT e.qid, COUNT(*) AS n_hit
        |       FROM exact e JOIN approx ap
        |         ON ap.qid = e.qid AND ap.vec_id = e.vec_id
        |       GROUP BY e.qid)
        |SELECT ne.qid, ne.n_exact,
        |       COALESCE(nh.n_hit, 0)::BIGINT AS n_hit,
        |       ROUND(COALESCE(nh.n_hit, 0)::DOUBLE / ne.n_exact, 6) + 0.0 AS recall
        |FROM ne LEFT JOIN nh ON nh.qid = ne.qid
        |ORDER BY ne.qid""".stripMargin,

    // Replays the grouped page against the maintained table: the stored
    // vectors are the ingest-normalized float32s, candidates bind to
    // the query's top-2 probed cells, and both the within-group hit
    // rank and the cross-group rank replay as total orders.
    "q_maintained_grouped" ->
      """WITH cents AS (
        |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id < 16),
        |nrm AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x::DOUBLE /
        |      GREATEST(SQRT(list_sum(list_transform(embedding,
        |        y -> y::DOUBLE * y::DOUBLE))), 1e-12) AS REAL)) AS emb
        |  FROM embeddings),
        |pc AS (
        |  SELECT n.vec_id, c.cent_id,
        |         unnest(n.emb)::DOUBLE x, unnest(c.cvec)::DOUBLE y
        |  FROM nrm n CROSS JOIN cents c),
        |pagg AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM pc GROUP BY vec_id, cent_id),
        |psc AS (SELECT vec_id, cent_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |        FROM pagg),
        |assign AS (
        |  SELECT vec_id, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
        |    FROM psc) WHERE rn = 1),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 42),
        |qc AS (
        |  SELECT c.cent_id, unnest(c.cvec)::DOUBLE x, unnest(q.qe)::DOUBLE y
        |  FROM cents c CROSS JOIN q),
        |qagg AS (SELECT cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM qc GROUP BY cent_id),
        |probes AS (
        |  SELECT cent_id AS cell_id FROM (
        |    SELECT cent_id,
        |           ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |    FROM qagg ORDER BY c DESC, cent_id LIMIT 2)),
        |cand AS (
        |  SELECT a.vec_id FROM assign a JOIN probes p ON p.cell_id = a.cell_id),
        |sp AS (
        |  SELECT n.vec_id, n.label,
        |         unnest(n.emb)::DOUBLE x, unnest(q.qe)::DOUBLE y
        |  FROM nrm n JOIN cand cd ON cd.vec_id = n.vec_id CROSS JOIN q),
        |sagg AS (SELECT vec_id, label, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM sp GROUP BY vec_id, label),
        |sc AS (SELECT vec_id, label,
        |         ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6)
        |           + 0.0 AS score
        |       FROM sagg),
        |h AS (SELECT label, vec_id, score,
        |             row_number() OVER (PARTITION BY label ORDER BY score DESC, vec_id) AS rnk
        |      FROM sc),
        |best AS (SELECT label, score FROM h WHERE rnk = 1),
        |topg AS (SELECT label,
        |                row_number() OVER (ORDER BY score DESC, label) AS grp_rank
        |         FROM (SELECT label, score FROM best
        |               ORDER BY score DESC, label LIMIT 3)),
        |hk AS (SELECT * FROM h WHERE rnk <= 2)
        |SELECT hk.label, topg.grp_rank, hk.rnk, hk.vec_id AS id, hk.score
        |FROM hk JOIN topg USING (label)
        |ORDER BY grp_rank, rnk""".stripMargin,

    // Replays the maintained RAG ask: the corpus is embeddings ⋈
    // documents (chunk text as metadata), stored vectors are the
    // ingest-normalized float32s, candidates bind to the query's top-2
    // probed cells, and the context assembles in the (score desc, id)
    // hit order with the exact prompt template.
    "q_rag_maintained" ->
      """WITH src AS (
        |  SELECT e.vec_id, e.embedding, substr(d.text, 1, 40) AS chunk
        |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
        |cents AS (
        |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id < 16),
        |nrm AS (
        |  SELECT vec_id, chunk,
        |    list_transform(embedding, x -> CAST(x::DOUBLE /
        |      GREATEST(SQRT(list_sum(list_transform(embedding,
        |        y -> y::DOUBLE * y::DOUBLE))), 1e-12) AS REAL)) AS emb
        |  FROM src),
        |pc AS (
        |  SELECT n.vec_id, c.cent_id,
        |         unnest(n.emb)::DOUBLE x, unnest(c.cvec)::DOUBLE y
        |  FROM nrm n CROSS JOIN cents c),
        |pagg AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM pc GROUP BY vec_id, cent_id),
        |psc AS (SELECT vec_id, cent_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |        FROM pagg),
        |assign AS (
        |  SELECT vec_id, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
        |    FROM psc) WHERE rn = 1),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 42),
        |qc AS (
        |  SELECT c.cent_id, unnest(c.cvec)::DOUBLE x, unnest(q.qe)::DOUBLE y
        |  FROM cents c CROSS JOIN q),
        |qagg AS (SELECT cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM qc GROUP BY cent_id),
        |probes AS (
        |  SELECT cent_id AS cell_id FROM (
        |    SELECT cent_id,
        |           ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |    FROM qagg ORDER BY c DESC, cent_id LIMIT 2)),
        |cand AS (
        |  SELECT a.vec_id FROM assign a JOIN probes p ON p.cell_id = a.cell_id),
        |sp AS (
        |  SELECT n.vec_id, n.chunk,
        |         unnest(n.emb)::DOUBLE x, unnest(q.qe)::DOUBLE y
        |  FROM nrm n JOIN cand cd ON cd.vec_id = n.vec_id CROSS JOIN q),
        |sagg AS (SELECT vec_id, chunk, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM sp GROUP BY vec_id, chunk),
        |sc AS (SELECT vec_id, chunk,
        |         ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6)
        |           AS score
        |       FROM sagg),
        |top AS (SELECT vec_id, chunk, score FROM sc
        |        ORDER BY score DESC, vec_id LIMIT 4),
        |ctx AS (
        |  SELECT string_agg('- ' || chunk, chr(10)||chr(10)
        |                    ORDER BY score DESC, vec_id) AS context
        |  FROM top)
        |SELECT 'where do vectors live' AS question, context,
        |       'Answer strictly from the context.'||chr(10)||chr(10)||
        |       'Context:'||chr(10)||context||chr(10)||chr(10)||
        |       'Question: where do vectors live'||chr(10)||'Answer:' AS prompt
        |FROM ctx""".stripMargin,

    // Replays the maintained MaxSim: normalized float32 corpus,
    // full-vector assignment + top-2 probe selection, then the exact
    // 4×4 slice-cosine grid (max per query slice, micro-unit sum) over
    // the probed candidates.
    "q_maintained_maxsim" ->
      """WITH cents AS (
        |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id < 16),
        |nrm AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x::DOUBLE /
        |      GREATEST(SQRT(list_sum(list_transform(embedding,
        |        y -> y::DOUBLE * y::DOUBLE))), 1e-12) AS REAL)) AS emb
        |  FROM embeddings),
        |pc AS (
        |  SELECT n.vec_id, c.cent_id,
        |         unnest(n.emb)::DOUBLE x, unnest(c.cvec)::DOUBLE y
        |  FROM nrm n CROSS JOIN cents c),
        |pagg AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM pc GROUP BY vec_id, cent_id),
        |psc AS (SELECT vec_id, cent_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |        FROM pagg),
        |assign AS (
        |  SELECT vec_id, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
        |    FROM psc) WHERE rn = 1),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 42),
        |qc AS (
        |  SELECT c.cent_id, unnest(c.cvec)::DOUBLE x, unnest(q.qe)::DOUBLE y
        |  FROM cents c CROSS JOIN q),
        |qagg AS (SELECT cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM qc GROUP BY cent_id),
        |probes AS (
        |  SELECT cent_id AS cell_id FROM (
        |    SELECT cent_id,
        |           ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |    FROM qagg ORDER BY c DESC, cent_id LIMIT 2)),
        |cand AS (
        |  SELECT n.vec_id, n.emb FROM nrm n
        |  JOIN assign a ON a.vec_id = n.vec_id
        |  JOIN probes p ON p.cell_id = a.cell_id),
        |grid AS (
        |  SELECT a.qi, b.dj FROM (SELECT unnest(generate_series(0,3)) qi) a
        |  CROSS JOIN (SELECT unnest(generate_series(0,3)) dj) b),
        |cs AS (
        |  SELECT e.vec_id, g.qi, g.dj,
        |    ROUND(
        |      list_sum(list_transform(generate_series(1,16), i ->
        |        e.emb[g.dj*16+i]::DOUBLE * q.qe[g.qi*16+i]::DOUBLE))
        |      / (GREATEST(SQRT(list_sum(list_transform(generate_series(1,16), i ->
        |           e.emb[g.dj*16+i]::DOUBLE * e.emb[g.dj*16+i]::DOUBLE))), 1e-12)
        |       * GREATEST(SQRT(list_sum(list_transform(generate_series(1,16), i ->
        |           q.qe[g.qi*16+i]::DOUBLE * q.qe[g.qi*16+i]::DOUBLE))), 1e-12)), 6) AS c
        |  FROM cand e CROSS JOIN q CROSS JOIN grid g),
        |mx AS (SELECT vec_id, qi, CAST(ROUND(MAX(c) * 1000000, 0) AS BIGINT) AS m
        |       FROM cs GROUP BY vec_id, qi),
        |sc AS (SELECT vec_id,
        |         ROUND(CAST(SUM(m) AS BIGINT)::DOUBLE / 1000000.0, 6) + 0.0 AS score
        |       FROM mx GROUP BY vec_id)
        |SELECT vec_id AS id, score FROM sc
        |ORDER BY score DESC, id LIMIT 10""".stripMargin,

    // Replays the pinned-visibility rule (the pin covers ingest batches
    // 0 and 1 ≡ vec_id < 250), the post-pin delete (reads current), the
    // ingest normalization, assignment, probe selection, and the final
    // ranking — the post-pin fold must be invisible to every one of
    // these decisions.
    "q_maintained_snapshot" ->
      """WITH cents AS (
        |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id < 16),
        |nrm AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x::DOUBLE /
        |      GREATEST(SQRT(list_sum(list_transform(embedding,
        |        y -> y::DOUBLE * y::DOUBLE))), 1e-12) AS REAL)) AS emb
        |  FROM embeddings),
        |pc AS (
        |  SELECT n.vec_id, c.cent_id,
        |         unnest(n.emb)::DOUBLE x, unnest(c.cvec)::DOUBLE y
        |  FROM nrm n CROSS JOIN cents c),
        |pagg AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM pc GROUP BY vec_id, cent_id),
        |psc AS (SELECT vec_id, cent_id,
        |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |        FROM pagg),
        |assign AS (
        |  SELECT vec_id, cent_id AS cell_id FROM (
        |    SELECT vec_id, cent_id,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
        |    FROM psc) WHERE rn = 1),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 42),
        |cp AS (
        |  SELECT c.cent_id, unnest(c.cvec)::DOUBLE x, unnest(q.qe)::DOUBLE y
        |  FROM cents c CROSS JOIN q),
        |cagg AS (SELECT cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM cp GROUP BY cent_id),
        |probes AS (
        |  SELECT cent_id AS cell_id FROM (
        |    SELECT cent_id,
        |           ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
        |    FROM cagg ORDER BY c DESC, cent_id LIMIT 4)),
        |cand AS (
        |  SELECT a.vec_id FROM assign a JOIN probes p ON p.cell_id = a.cell_id
        |  WHERE a.vec_id < 250 AND a.vec_id % 10 <> 3),
        |sp AS (
        |  SELECT n.vec_id, unnest(n.emb)::DOUBLE x, unnest(q.qe)::DOUBLE y
        |  FROM nrm n JOIN cand cd ON cd.vec_id = n.vec_id CROSS JOIN q),
        |sagg AS (SELECT vec_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
        |         FROM sp GROUP BY vec_id),
        |sc AS (SELECT vec_id,
        |         ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6)
        |           + 0.0 AS score
        |       FROM sagg)
        |SELECT vec_id AS id, score, CAST(1 AS BIGINT) AS pin
        |FROM sc ORDER BY score DESC, id LIMIT 10""".stripMargin,

    "q_modularity" ->
      s"""WITH $lpaCtes,
         |und AS (
         |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
         |  FROM e0 WHERE src <> dst),
         |mm AS (SELECT COUNT(*) AS m FROM und),
         |la AS (SELECT node, lab FROM l3),
         |el AS (
         |  SELECT x.lab AS ca, y.lab AS cb FROM und
         |  JOIN la x ON x.node = und.a
         |  JOIN la y ON y.node = und.b),
         |ec AS (SELECT ca AS c, COUNT(*) AS e FROM el WHERE ca = cb GROUP BY 1),
         |deg AS (
         |  SELECT n, COUNT(*) AS d FROM (
         |    SELECT a AS n FROM und UNION ALL SELECT b FROM und) GROUP BY 1),
         |dc AS (
         |  SELECT l.lab AS c, SUM(d) AS dsum
         |  FROM deg JOIN la l ON l.node = deg.n GROUP BY 1),
         |terms AS (
         |  SELECT 4 * mm.m * COALESCE(ec.e, 0) - dc.dsum * dc.dsum AS t
         |  FROM dc LEFT JOIN ec ON ec.c = dc.c CROSS JOIN mm)
         |SELECT mm.m AS m, (SELECT COUNT(*) FROM dc) AS n_comm,
         |       ROUND(SUM(t)::DOUBLE / (4.0 * mm.m * mm.m), 6) + 0.0 AS modularity
         |FROM terms CROSS JOIN mm GROUP BY mm.m""".stripMargin,

    "q_psi_drift" ->
      """WITH base AS (
        |  SELECT n_chars, CAST(substr(source, 4) AS INT) % 2 AS par
        |  FROM documents),
        |bi AS (
        |  SELECT par,
        |         CASE WHEN n_chars <= 150 THEN 0 WHEN n_chars <= 250 THEN 1
        |              WHEN n_chars <= 350 THEN 2 WHEN n_chars <= 450 THEN 3
        |              ELSE 4 END AS b
        |  FROM base),
        |ga AS (SELECT b, COUNT(*) AS c FROM bi WHERE par = 0 GROUP BY 1),
        |gb AS (SELECT b, COUNT(*) AS c FROM bi WHERE par <> 0 GROUP BY 1),
        |na AS (SELECT COUNT(*) AS c FROM bi WHERE par = 0),
        |nb AS (SELECT COUNT(*) AS c FROM bi WHERE par <> 0),
        |grid AS (SELECT unnest(generate_series(0, 4)) AS b),
        |t AS (
        |  SELECT CAST(ROUND(
        |    ((COALESCE(ga.c, 0) + 1.0) / (na.c + 5)
        |      - (COALESCE(gb.c, 0) + 1.0) / (nb.c + 5))
        |    * LN(((COALESCE(ga.c, 0) + 1.0) / (na.c + 5))
        |         / ((COALESCE(gb.c, 0) + 1.0) / (nb.c + 5)))
        |    * 1000000000) AS BIGINT) AS term
        |  FROM grid LEFT JOIN ga USING (b) LEFT JOIN gb USING (b)
        |  CROSS JOIN na CROSS JOIN nb),
        |r AS (
        |  SELECT (SELECT c FROM na) AS n_a, (SELECT c FROM nb) AS n_b,
        |         ROUND(SUM(term) / 1000000000.0, 6) + 0.0 AS psi
        |  FROM t)
        |SELECT n_a, n_b, psi,
        |       CASE WHEN psi < 0.1 THEN 'stable'
        |            WHEN psi < 0.25 THEN 'moderate'
        |            ELSE 'shifted' END AS band
        |FROM r""".stripMargin,

    "q_anisotropy" ->
      """WITH u AS (
        |  SELECT label, p.pos, CAST(ROUND(
        |    p.x::DOUBLE / GREATEST(SQRT(list_sum(list_transform(embedding,
        |      y -> y::DOUBLE * y::DOUBLE))), 1e-12) * 1000000) AS BIGINT) AS u6
        |  FROM embeddings,
        |       LATERAL (SELECT unnest(embedding) AS x,
        |                       generate_subscripts(embedding, 1) - 1 AS pos) p),
        |m AS (
        |  SELECT label, pos,
        |         CAST(ROUND(ROUND(SUM(u6)::DOUBLE / 1000000.0 / COUNT(*), 6)
        |           * 1000000) AS BIGINT) AS m6,
        |         COUNT(*) AS nn
        |  FROM u GROUP BY label, pos)
        |SELECT label, MAX(nn) AS n,
        |       ROUND(SQRT(SUM(m6 * m6)::DOUBLE) / 1000000.0, 6) + 0.0
        |         AS anisotropy
        |FROM m GROUP BY label ORDER BY label""".stripMargin,

    "q_reliability" ->
      """WITH x AS (
        |  SELECT ((doc_id * 37) % 1000)::DOUBLE / 1000.0 AS conf,
        |         CAST(n_chars > 300 AS BIGINT) AS y
        |  FROM documents),
        |b AS (
        |  SELECT LEAST(CAST(FLOOR(conf * 10) AS INT), 9) AS bin,
        |         CAST(ROUND(conf * 1000000) AS BIGINT) AS c6, y
        |  FROM x),
        |g AS (
        |  SELECT bin, COUNT(*) AS n,
        |         CAST(ROUND(ROUND(SUM(c6)::DOUBLE / 1000000.0 / COUNT(*), 6)
        |           * 1000000) AS BIGINT) AS cm6,
        |         CAST(ROUND(ROUND(SUM(y)::DOUBLE / COUNT(*), 6)
        |           * 1000000) AS BIGINT) AS am6
        |  FROM b GROUP BY bin),
        |e AS (
        |  SELECT ROUND(SUM(ABS(cm6 - am6) * n)::DOUBLE / SUM(n) / 1000000.0, 6)
        |           + 0.0 AS ece
        |  FROM g)
        |SELECT bin, n,
        |       ROUND(cm6::DOUBLE / 1000000.0, 6) + 0.0 AS mean_conf,
        |       ROUND(am6::DOUBLE / 1000000.0, 6) + 0.0 AS acc,
        |       e.ece
        |FROM g CROSS JOIN e ORDER BY bin""".stripMargin
  )

  /** q_pq_distortion oracle: per m ∈ {2,4,8}, the per-(vec, subspace)
    * argmin subvector distance (round 6 → micro-units — the q_ann_pq
    * encode arithmetic), summed per vec, micro-averaged over the corpus.
    */
  private lazy val pqDistortionSql: String = {
    val blocks = Seq(2, 4, 8).map { m =>
      val dsub = 64 / m
      s"""  SELECT $m AS m, COUNT(*) AS n,
         |    ROUND(SUM(dsum) / 1000000.0 / COUNT(*), 6) + 0.0 AS mean_sqerr
         |  FROM (
         |    SELECT vec_id, SUM(du) AS dsum FROM (
         |      SELECT e.vec_id, mis.mi,
         |        CAST(ROUND(list_min(list_transform(cbl.cbs, cand ->
         |          ROUND(list_sum(list_transform(generate_series(1, $dsub), j ->
         |            (e.embedding[mis.mi*$dsub+j]::DOUBLE - cand[mis.mi*$dsub+j]::DOUBLE)
         |            * (e.embedding[mis.mi*$dsub+j]::DOUBLE - cand[mis.mi*$dsub+j]::DOUBLE))), 6)))
         |          * 1000000) AS BIGINT) AS du
         |      FROM embeddings e
         |      CROSS JOIN (SELECT unnest(generate_series(0, ${m - 1})) AS mi) mis
         |      CROSS JOIN cbl)
         |    GROUP BY vec_id)""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH cbl AS (
       |  SELECT list(embedding ORDER BY vec_id) AS cbs
       |  FROM embeddings WHERE vec_id < 16)
       |SELECT * FROM (
       |$blocks
       |) ORDER BY m""".stripMargin
  }

  /** Shared LPA CTE chain (q_label_prop and q_modularity): the events
    * bipartite edge fixture, symmetric closure, 3 max-label rounds.
    */
  private lazy val lpaCtes: String = {
    def round(k: Int): String = {
      val p = k - 1
      s"""c$k AS (
         |  SELECT s.dst AS node, l.lab, COUNT(*) AS c
         |  FROM sym s JOIN l$p l ON s.src = l.node
         |  GROUP BY 1, 2),
         |l$k AS (
         |  SELECT node, lab FROM (
         |    SELECT node, lab,
         |           row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn
         |    FROM c$k) WHERE rn = 1)""".stripMargin
    }
    s"""e0 AS (
       |  SELECT DISTINCT user_id AS src, 100000 + event_id % 50 AS dst
       |  FROM events),
       |sym AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
       |l0 AS (SELECT DISTINCT src AS node, src AS lab FROM sym),
       |${(1 to 3).map(round).mkString(",\n")}""".stripMargin
  }

  /** q_probe_tune oracle, builder-authored (the pcaCtesSql pattern): one
    * shared scoring pass (every query × every row, cell rank attached),
    * a top-10 block per swept probe count {1,2,4,8,16}, hit counts vs
    * the 16-probe (exact) side, and the chosen-level window.
    */
  private lazy val probeTuneSql: String = {
    val levels = Seq(1, 2, 4, 8, 16)
    val topBlocks = levels.map { p =>
      s"""top_$p AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT s.qid, s.vec_id,
         |           row_number() OVER (PARTITION BY s.qid
         |                              ORDER BY s.score DESC, s.vec_id) rn
         |    FROM allsc s JOIN cr ON cr.qid = s.qid AND cr.vec_id = s.vec_id
         |    WHERE cr.cellrank <= $p) WHERE rn <= 10)""".stripMargin
    }.mkString(",\n")
    val lvRows = levels.map { p =>
      s"""  SELECT $p AS n_probes,
         |    (SELECT COUNT(*) FROM top_$p t
         |      JOIN top_16 x ON x.qid = t.qid AND x.vec_id = t.vec_id) AS n_hit,
         |    (SELECT COUNT(*) FROM top_16) AS n_exact""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH cents AS (
       |  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id < 16),
       |qs AS (SELECT vec_id AS qid, embedding AS qvec
       |       FROM embeddings WHERE vec_id % 100 = 42),
       |cp AS (
       |  SELECT q.qid, c.cent_id, unnest(c.cvec)::DOUBLE x, unnest(q.qvec)::DOUBLE y
       |  FROM cents c CROSS JOIN qs q),
       |cagg AS (SELECT qid, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
       |         FROM cp GROUP BY qid, cent_id),
       |pranks AS (
       |  SELECT qid, cent_id,
       |         row_number() OVER (PARTITION BY qid ORDER BY
       |           ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6)
       |             DESC, cent_id) AS rn
       |  FROM cagg),
       |pc AS (
       |  SELECT e.vec_id, c.cent_id,
       |         unnest(e.embedding)::DOUBLE x, unnest(c.cvec)::DOUBLE y
       |  FROM embeddings e CROSS JOIN cents c),
       |pagg AS (SELECT vec_id, cent_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
       |         FROM pc GROUP BY vec_id, cent_id),
       |psc AS (SELECT vec_id, cent_id,
       |          ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6) c
       |        FROM pagg),
       |assign AS (
       |  SELECT vec_id, cent_id AS cell_id FROM (
       |    SELECT vec_id, cent_id,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) rn
       |    FROM psc) WHERE rn = 1),
       |cr AS (
       |  SELECT pr.qid, a.vec_id, pr.rn AS cellrank
       |  FROM assign a JOIN pranks pr ON pr.cent_id = a.cell_id),
       |sp AS (
       |  SELECT q.qid, e.vec_id,
       |         unnest(e.embedding)::DOUBLE x, unnest(q.qvec)::DOUBLE y
       |  FROM embeddings e CROSS JOIN qs q),
       |sagg AS (SELECT qid, vec_id, SUM(x*y) dp, SUM(x*x) nx2, SUM(y*y) ny2
       |         FROM sp GROUP BY qid, vec_id),
       |allsc AS (SELECT qid, vec_id,
       |            ROUND(dp/(GREATEST(SQRT(nx2),1e-12)*GREATEST(SQRT(ny2),1e-12)), 6)
       |              + 0.0 AS score
       |          FROM sagg),
       |$topBlocks,
       |lv AS (
       |$lvRows),
       |rl AS (
       |  SELECT n_probes, n_hit, n_exact,
       |         ROUND(CASE WHEN n_exact = 0 THEN 1.0
       |               ELSE n_hit * 1.0 / n_exact END, 6) + 0.0 AS recall
       |  FROM lv),
       |ch AS (SELECT COALESCE(MIN(n_probes) FILTER (WHERE recall >= 0.95), 16) AS cp
       |       FROM rl)
       |SELECT n_probes, n_hit, n_exact, recall,
       |       CAST(recall >= 0.95 AS INT) AS meets,
       |       CAST(n_probes = ch.cp AS INT) AS chosen
       |FROM rl, ch ORDER BY n_probes""".stripMargin
  }

  /** The q_sparse_* query: term → micro-unit weight, the learned-sparse
    * shape (a model would emit these; here hand-pinned so both engines
    * share the literal).
    */
  private val SparseQuery: Seq[(String, Long)] = Seq(
    "vector" -> 2500000L, "join" -> 1500000L,
    "scan" -> 1000000L, "data" -> 500000L)

  private def sparseQueryCaseSql: String =
    SparseQuery.map { case (t, w) => s"WHEN '$t' THEN $w" }
      .mkString("CASE term ", " ", " ELSE 0 END")

  private def sparseQueryInSql: String =
    SparseQuery.map(q => s"'${q._1}'").mkString("(", ", ", ")")

  // ============================================== round-11 serving surface

  private def round11Queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Recommend-by-examples (Rocchio relevance feedback; the vector-DB
    // "recommend" API): q = mean(pos) − mean(neg), examples excluded,
    // cosine top-10. The oracle replays the micro-unit per-dimension
    // means, so the hash certifies the synthetic query vector itself,
    // not just the ranking.
    "q_recommend" -> ((s, dir) => {
      import s.implicits._
      Ann.recommend(t(s, dir, "embeddings"), "vec_id", "embedding",
          posIds = Seq(1L, 2L, 3L), negIds = Seq(10L, 11L), k = 10)
        .select($"id".as("vec_id"), $"score")
    }),

    // Filtered recommend, no negatives: pred restricts the searched
    // rows (label = 3) and the empty negative set drops the subtrahend
    // — the two optional-path branches in one oracle.
    "q_recommend_filtered" -> ((s, dir) => {
      import s.implicits._
      Ann.recommend(t(s, dir, "embeddings"), "vec_id", "embedding",
          posIds = Seq(1L, 2L, 3L), negIds = Seq.empty, k = 10,
          pred = col("label") === 3)
        .select($"id".as("vec_id"), $"score")
    }),

    // Grouped search (vector-DB group_by: top-5 groups by their best
    // hit, top-3 hits each — the RAG chunk→parent-doc dedupe shape).
    // Group = label; candidates scored by cosine against vec 0.
    "q_grouped_search" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val qv = e.filter($"vec_id" === 0).select($"embedding").head.getSeq[Float](0)
      val scored = e.withColumn("score",
        score6(V.cosine($"embedding", typedLit(qv))))
      TopK.groupedTopK(scored, "label", $"score", $"vec_id", 5, 3)
        .select($"label", $"grp_rank", $"rnk", $"id".as("vec_id"), $"score")
    }),

    // Learned-sparse (SPLADE-shape) retrieval: tf-idf postings as the
    // sparse index, a term→micro-weight query, inverted-index dot
    // product — only the query terms' posting lists are scanned.
    "q_sparse_search" -> ((s, dir) => {
      import s.implicits._
      val post = Tfidf.vectorize(spread(s, t(s, dir, "documents")),
        "doc_id", "text")
      Sparse.sparseSearch(post, "doc_id", "term", "wq", SparseQuery, 10)
        .select($"doc_id", $"score")
    }),

    // Champion-list static pruning: cap every posting list at its 20
    // highest-impact entries, then run the SAME sparse query over the
    // pruned index. The oracle replays the per-term truncation, so the
    // hash certifies exactly which postings survive — the documented
    // recall trade of impact-ordered indexes.
    "q_sparse_pruned" -> ((s, dir) => {
      import s.implicits._
      val post = Tfidf.vectorize(spread(s, t(s, dir, "documents")),
        "doc_id", "text")
      val pruned = Sparse.championPrune(post, "doc_id", "term", "wq", 20)
      Sparse.sparseSearch(pruned, "doc_id", "term", "wq", SparseQuery, 10)
        .select($"doc_id", $"score")
    }),

    // The DURABLE HNSW index end to end (HnswIndex + its streaming
    // ingest loop — the graph twin of q_maintained_lifecycle): build
    // the existing-only hierarchy + sidecar on disk, stream the
    // held-out 10% batch through streamInsertHnswMaintained (one
    // fenced intent→append→commit refresh, exactly-once under replay),
    // then read the SERVED hierarchy back off disk. The output equals
    // Ann.hnswInsert's merged hierarchy edge for edge, so the oracle is
    // the q_hnsw_insert closed-form replay verbatim — the hash
    // certifies the whole durable loop (delta computation, touched-
    // bucket rewrite, pass-through, commit visibility), not just the
    // operator.
    "q_hnsw_maintained" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings").select($"vec_id", $"embedding")
      val existing = e.filter(pmod($"vec_id", lit(10)) =!= 7)
      val batch = e.filter(pmod($"vec_id", lit(10)) === 7)
      val cents = existing.filter($"vec_id" < 18)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val d = java.nio.file.Files.createTempDirectory("graft_hidx_q_").toFile
      jsonlTmpCleanup(d)
      val idx = new java.io.File(d, "idx").getAbsolutePath
      val in = new java.io.File(d, "in").getAbsolutePath
      val ckpt = new java.io.File(d, "c").getAbsolutePath
      HnswIndex.build(s, idx, existing, cents, "vec_id", "embedding",
        "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
      batch.coalesce(1).write.mode("overwrite").parquet(in)
      val q = HnswIndex.streamInsertHnswMaintained(
        s.readStream.schema(batch.schema).parquet(in), idx, ckpt)
      q.processAllAvailable()
      q.stop()
      HnswIndex.readLayers(s, idx).zipWithIndex
        .map { case (df, l) => df.withColumn("level", lit(l)) }
        .reduce(_.unionByName(_))
        .select($"level", $"src", $"dst", $"score")
        .orderBy($"level", $"src", $"dst")
    }),

    // Durable PHYSICAL purge (HnswIndex.purge): build the full index
    // on disk, tombstone-purge it in one fenced transaction (touched
    // cells re-linked, dead rows dropped from edges AND sidecar), read
    // the served hierarchy back. By the compact-equals-rebuild
    // contract the result is hnswBuild on the survivors, so the oracle
    // is the q_hnsw_compact replay verbatim.
    "q_hnsw_maintained_purge" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings").select($"vec_id", $"embedding")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val d = java.nio.file.Files.createTempDirectory("graft_hidxp_q_").toFile
      jsonlTmpCleanup(d)
      val idx = new java.io.File(d, "idx").getAbsolutePath
      HnswIndex.build(s, idx, e, cents, "vec_id", "embedding",
        "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
      val tomb = e.filter(pmod($"vec_id", lit(17)) === 3)
        .select($"vec_id".as("id"))
      HnswIndex.purge(s, idx, tomb, "id")
      HnswIndex.readLayers(s, idx).zipWithIndex
        .map { case (df, l) => df.withColumn("level", lit(l)) }
        .reduce(_.unionByName(_))
        .select($"level", $"src", $"dst", $"score")
        .orderBy($"level", $"src", $"dst")
    })
  )

  private def round11Oracles: Map[String, String] = Map(

    "q_recommend" ->
      """WITH ex AS MATERIALIZED (
        |  SELECT vec_id, unnest(generate_series(1, 64)) AS pos,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings),
        |ps AS (SELECT pos, SUM(CAST(ROUND(x * 1000000, 0) AS BIGINT)) AS s
        |       FROM ex WHERE vec_id IN (1, 2, 3) GROUP BY pos),
        |ns AS (SELECT pos, SUM(CAST(ROUND(x * 1000000, 0) AS BIGINT)) AS s
        |       FROM ex WHERE vec_id IN (10, 11) GROUP BY pos),
        |qv AS (SELECT ps.pos,
        |              ROUND(ps.s::DOUBLE / 3000000.0 - ns.s::DOUBLE / 2000000.0, 6)
        |                + 0.0 AS q
        |       FROM ps JOIN ns USING (pos)),
        |agg AS (SELECT e.vec_id, SUM(e.x * qv.q) AS dp,
        |               SUM(e.x * e.x) AS nx2, SUM(qv.q * qv.q) AS nq2
        |        FROM ex e JOIN qv USING (pos)
        |        WHERE e.vec_id NOT IN (1, 2, 3, 10, 11) GROUP BY e.vec_id),
        |sc AS (SELECT vec_id,
        |              ROUND(dp / (GREATEST(SQRT(nx2), 1e-12) * GREATEST(SQRT(nq2), 1e-12)), 6)
        |                + 0.0 AS score
        |       FROM agg)
        |SELECT vec_id, score FROM sc ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    "q_recommend_filtered" ->
      """WITH ex AS MATERIALIZED (
        |  SELECT vec_id, label, unnest(generate_series(1, 64)) AS pos,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings),
        |ps AS (SELECT pos, SUM(CAST(ROUND(x * 1000000, 0) AS BIGINT)) AS s
        |       FROM ex WHERE vec_id IN (1, 2, 3) GROUP BY pos),
        |qv AS (SELECT pos, ROUND(s::DOUBLE / 3000000.0, 6) + 0.0 AS q FROM ps),
        |agg AS (SELECT e.vec_id, SUM(e.x * qv.q) AS dp,
        |               SUM(e.x * e.x) AS nx2, SUM(qv.q * qv.q) AS nq2
        |        FROM ex e JOIN qv USING (pos)
        |        WHERE e.label = 3 AND e.vec_id NOT IN (1, 2, 3)
        |        GROUP BY e.vec_id),
        |sc AS (SELECT vec_id,
        |              ROUND(dp / (GREATEST(SQRT(nx2), 1e-12) * GREATEST(SQRT(nq2), 1e-12)), 6)
        |                + 0.0 AS score
        |       FROM agg)
        |SELECT vec_id, score FROM sc ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    "q_grouped_search" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |pairs AS (
        |  SELECT e.vec_id, e.label, unnest(e.embedding)::DOUBLE AS x,
        |         unnest(q.qe)::DOUBLE AS y
        |  FROM embeddings e CROSS JOIN q),
        |agg AS (SELECT vec_id, label, SUM(x*y) AS dp, SUM(x*x) AS nx2, SUM(y*y) AS ny2
        |        FROM pairs GROUP BY vec_id, label),
        |sc AS (SELECT vec_id, label,
        |              ROUND(dp / (GREATEST(SQRT(nx2), 1e-12) * GREATEST(SQRT(ny2), 1e-12)), 6)
        |                + 0.0 AS score
        |       FROM agg),
        |h AS (SELECT label, vec_id, score,
        |             row_number() OVER (PARTITION BY label ORDER BY score DESC, vec_id) AS rnk
        |      FROM sc),
        |best AS (SELECT label, score FROM h WHERE rnk = 1),
        |topg AS (SELECT label,
        |                row_number() OVER (ORDER BY score DESC, label) AS grp_rank
        |         FROM (SELECT label, score FROM best
        |               ORDER BY score DESC, label LIMIT 5)),
        |hk AS (SELECT * FROM h WHERE rnk <= 3)
        |SELECT hk.label, topg.grp_rank, hk.rnk, hk.vec_id, hk.score
        |FROM hk JOIN topg USING (label)
        |ORDER BY grp_rank, rnk""".stripMargin,

    "q_sparse_search" ->
      s"""WITH t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(lower(text)), '\\s+') END AS toks
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
        |nn AS (SELECT COUNT(*)::DOUBLE AS n FROM documents),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |idf AS (SELECT term, ROUND(ln((nn.n + 1.0) / (df.df::DOUBLE + 1.0)) + 1.0, 6) AS idf
        |        FROM df CROSS JOIN nn),
        |w AS (SELECT tf.doc_id, tf.term,
        |             CAST(ROUND(tf.tf::DOUBLE * idf.idf * 1000000) AS BIGINT) AS wq
        |      FROM tf JOIN idf USING (term)),
        |c AS (SELECT doc_id, SUM(wq * ($sparseQueryCaseSql)) AS dot
        |      FROM w WHERE term IN $sparseQueryInSql GROUP BY doc_id)
        |SELECT doc_id,
        |       ((dot + 500000) // 1000000)::DOUBLE / 1000000.0 + 0.0 AS score
        |FROM c WHERE dot > 0
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    "q_sparse_pruned" ->
      s"""WITH t AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(lower(text)), '\\s+') END AS toks
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
        |nn AS (SELECT COUNT(*)::DOUBLE AS n FROM documents),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |idf AS (SELECT term, ROUND(ln((nn.n + 1.0) / (df.df::DOUBLE + 1.0)) + 1.0, 6) AS idf
        |        FROM df CROSS JOIN nn),
        |w AS (SELECT tf.doc_id, tf.term,
        |             CAST(ROUND(tf.tf::DOUBLE * idf.idf * 1000000) AS BIGINT) AS wq
        |      FROM tf JOIN idf USING (term)),
        |pr AS (SELECT doc_id, term, wq FROM (
        |         SELECT doc_id, term, wq,
        |                row_number() OVER (PARTITION BY term ORDER BY wq DESC, doc_id) AS rn
        |         FROM w) WHERE rn <= 20),
        |c AS (SELECT doc_id, SUM(wq * ($sparseQueryCaseSql)) AS dot
        |      FROM pr WHERE term IN $sparseQueryInSql GROUP BY doc_id)
        |SELECT doc_id,
        |       ((dot + 500000) // 1000000)::DOUBLE / 1000000.0 + 0.0 AS score
        |FROM c WHERE dot > 0
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
  ) ++ Map(
    // serve-from-refreshed ≡ serve-from-merged: the durable rows replay
    // the SAME closed-form oracles as their in-memory operator twins —
    // the identity the refresh writer's spec pins is exactly what lets
    // the oracle be shared verbatim
    "q_hnsw_maintained" -> round9Oracles("q_hnsw_insert"),
    "q_hnsw_maintained_purge" -> round9Oracles("q_hnsw_compact"))

  private def round12Queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Durable SOFT delete (HnswIndex.softDelete): the delete-cheap-now
    // third of the maintained lifecycle — tombstones STREAM into the
    // persisted index's _deletes sidecar through the exactly-once
    // delete loop (streamDeleteHnswMaintained), no data file touched,
    // and the tombstone-honoring serve (search = beam over the full
    // graph, tombstones filtered from the page, survivors re-ranked,
    // k-trim) reads them back from disk. Deterministic end to end, so
    // the oracle is the q_hnsw_delete replay verbatim — the hash
    // certifies the durable sidecar write, the fenced commit, AND the
    // serving filter in one row.
    "q_hnsw_maintained_delete" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings").select($"vec_id", $"embedding")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val d = java.nio.file.Files.createTempDirectory("graft_hidxd_q_").toFile
      jsonlTmpCleanup(d)
      val idx = new java.io.File(d, "idx").getAbsolutePath
      val in = new java.io.File(d, "in").getAbsolutePath
      val ckpt = new java.io.File(d, "c").getAbsolutePath
      HnswIndex.build(s, idx, e, cents, "vec_id", "embedding",
        "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
      val tomb = e.filter(pmod($"vec_id", lit(17)) === 3)
        .select($"vec_id".as("id"))
      tomb.coalesce(1).write.mode("overwrite").parquet(in)
      val q = HnswIndex.streamDeleteHnswMaintained(
        s.readStream.schema(tomb.schema).parquet(in), "id", idx, ckpt)
      q.processAllAvailable()
      q.stop()
      val query = e.filter($"vec_id" === 42)
        .select($"embedding").head.getSeq[Float](0)
      HnswIndex.search(s, idx, query, beam = 8, hops = 3, k = 5)
        .orderBy($"rank")
    }),

    // Durable METADATA-FILTERED serving (HnswIndex.searchFiltered):
    // parity with searchMaintained's pred — passthrough columns
    // declared at build ride the level-0 sidecar through every commit,
    // the beam walks the FULL graph (filtered-out nodes still route,
    // the tombstone discipline), and the page joins the sidecar's
    // carried metadata, filters, re-ranks, k-trims. The oracle joins
    // the ORIGINAL table's label while Spark reads the sidecar copy —
    // the hash certifies the passthrough plumbing itself.
    "q_hnsw_maintained_filtered" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
        .select($"vec_id", $"embedding", $"label")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val d = java.nio.file.Files.createTempDirectory("graft_hidxf_q_").toFile
      jsonlTmpCleanup(d)
      val idx = new java.io.File(d, "idx").getAbsolutePath
      HnswIndex.build(s, idx, e, cents, "vec_id", "embedding",
        "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1,
        passthrough = Seq("label"))
      val query = e.filter($"vec_id" === 42)
        .select($"embedding").head.getSeq[Float](0)
      HnswIndex.searchFiltered(s, idx, query,
          pmod($"label", lit(2)) === 0, beam = 8, hops = 3, k = 5)
        .orderBy($"rank")
    }),

    // Durable NAMESPACED serving (HnswIndex.searchBatchNamespaced):
    // multi-tenant batch serve — every query row carries its OWN
    // namespace and its page restricts to corpus rows whose
    // sidecar-carried namespace matches (label plays the namespace
    // here); ONE hnswSearchBatch pass for the whole tenant mix. The
    // oracle joins both sides' labels from the ORIGINAL table while
    // Spark reads the sidecar copy.
    "q_hnsw_maintained_namespaced" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
        .select($"vec_id", $"embedding",
          pmod($"label", lit(2)).as("ns"))
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val d = java.nio.file.Files.createTempDirectory("graft_hidxn_q_").toFile
      jsonlTmpCleanup(d)
      val idx = new java.io.File(d, "idx").getAbsolutePath
      HnswIndex.build(s, idx, e, cents, "vec_id", "embedding",
        "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1,
        passthrough = Seq("ns"))
      val queries = e.filter($"vec_id".isin(42L, 137L, 256L))
        .select($"vec_id".as("qid"), $"embedding".as("qvec"),
          $"ns".as("qns"))
      HnswIndex.searchBatchNamespaced(s, idx, queries, "qid", "qvec",
          "qns", "ns", beam = 8, hops = 3, k = 5)
        .orderBy($"qid", $"rank")
    }),

    // Durable RETRAIN (HnswIndex.retrainHnsw): the drift-repair
    // escalation — rebuild hierarchy + sidecar + membership bitmap on
    // the live membership under NEW centroids, one fenced commit, with
    // the pending soft deletes FOLDED physically and the tombstone
    // sidecar retired (the IVF retrain's compaction policy). The
    // contract is exact: retrained ≡ hnswBuild on the survivors under
    // the new centroids — so the oracle is the q_hnsw_compact replay
    // with its centroid CTE swapped to the new set.
    "q_hnsw_maintained_retrain" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings").select($"vec_id", $"embedding")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val d = java.nio.file.Files.createTempDirectory("graft_hidxr_q_").toFile
      jsonlTmpCleanup(d)
      val idx = new java.io.File(d, "idx").getAbsolutePath
      HnswIndex.build(s, idx, e, cents, "vec_id", "embedding",
        "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
      HnswIndex.softDelete(s, idx,
        e.filter(pmod($"vec_id", lit(17)) === 3)
          .select($"vec_id".as("id")), "id")
      val newCents = e.filter($"vec_id" >= 16 && $"vec_id" < 32)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      HnswIndex.retrainHnsw(s, idx, newCents)
      require(HnswIndex.readDeletes(s, idx).isEmpty,
        "retrain must fold and retire the pending soft deletes")
      HnswIndex.readLayers(s, idx).zipWithIndex
        .map { case (df, l) => df.withColumn("level", lit(l)) }
        .reduce(_.unionByName(_))
        .select($"level", $"src", $"dst", $"score")
        .orderBy($"level", $"src", $"dst")
    }),

    // Durable VACUUM (HnswIndex.purgeDeletes): soft-deleted tombstones
    // become physical in one fenced purge transaction and the sidecar
    // retires WITH it — the query requires the sidecar empty before
    // returning, so the hash certifies softDelete → purgeDeletes →
    // rebuilt-on-survivors end to end. By the compact-equals-rebuild
    // contract the oracle is the q_hnsw_compact replay verbatim.
    "q_hnsw_maintained_vacuum" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings").select($"vec_id", $"embedding")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val d = java.nio.file.Files.createTempDirectory("graft_hidxv_q_").toFile
      jsonlTmpCleanup(d)
      val idx = new java.io.File(d, "idx").getAbsolutePath
      HnswIndex.build(s, idx, e, cents, "vec_id", "embedding",
        "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
      val tomb = e.filter(pmod($"vec_id", lit(17)) === 3)
        .select($"vec_id".as("id"))
      HnswIndex.softDelete(s, idx, tomb, "id")
      HnswIndex.purgeDeletes(s, idx)
      require(HnswIndex.readDeletes(s, idx).isEmpty,
        "purgeDeletes must retire the tombstones it makes physical")
      HnswIndex.readLayers(s, idx).zipWithIndex
        .map { case (df, l) => df.withColumn("level", lit(l)) }
        .reduce(_.unionByName(_))
        .select($"level", $"src", $"dst", $"score")
        .orderBy($"level", $"src", $"dst")
    })
  )

  private def round12Oracles: Map[String, String] = Map(
    // tombstones route, never surface: the q_hnsw_delete closed-form
    // replay IS the durable soft-delete serve, and compact-equals-
    // rebuild makes the q_hnsw_compact replay the vacuum's oracle —
    // shared verbatim, the serve-from-durable ≡ serve-from-operator
    // identity the spec pins
    "q_hnsw_maintained_delete" -> round9Oracles("q_hnsw_delete"),
    "q_hnsw_maintained_vacuum" -> round9Oracles("q_hnsw_compact"),
    // the filtered replay = the soft-delete replay with the final page
    // filter swapped from NOT-IN-tombstones to a label-parity join on
    // the ORIGINAL table (Spark reads the sidecar's carried copy)
    "q_hnsw_maintained_filtered" -> {
      val base = round9Oracles("q_hnsw_delete")
      val oldFrag = "FROM best3 WHERE id % 17 <> 3"
      require(base.contains(oldFrag),
        "q_hnsw_delete oracle tail changed — update the filtered swap")
      base.replace(oldFrag,
        "FROM best3 JOIN embeddings em ON em.vec_id = best3.id " +
          "WHERE em.label % 2 = 0")
    },
    // retrained ≡ build-on-survivors under the NEW centroid set: the
    // compact replay with its centroid CTE swapped (same tombstone
    // fold — the retrain purges the pending soft deletes)
    "q_hnsw_maintained_retrain" -> {
      val base = round9Oracles("q_hnsw_compact")
      val oldFrag = "WHERE vec_id < 16)"
      require(base.contains(oldFrag),
        "q_hnsw_compact oracle centroid CTE changed — update the " +
          "retrain swap")
      base.replace(oldFrag, "WHERE vec_id >= 16 AND vec_id < 32)")
    },
    // the namespaced replay = the batch replay with its final page
    // joined to BOTH sides' labels (query's own namespace restricts
    // its page) and re-ranked after the filter, k-trimmed
    "q_hnsw_maintained_namespaced" -> {
      val base = round9Oracles("q_hnsw_ann_batch")
      val oldTail =
        """SELECT qid,
          |  CAST(row_number() OVER (PARTITION BY qid ORDER BY s DESC, id)
          |       AS INT) AS rank,
          |  id AS vec_id, s AS score
          |FROM best3 ORDER BY qid, rank""".stripMargin
      val newTail =
        """SELECT qid, rank, vec_id, score FROM (
          |  SELECT b.qid,
          |    CAST(row_number() OVER (PARTITION BY b.qid
          |                            ORDER BY b.s DESC, b.id) AS INT) AS rank,
          |    b.id AS vec_id, b.s AS score
          |  FROM best3 b
          |  JOIN embeddings em ON em.vec_id = b.id
          |  JOIN embeddings eq ON eq.vec_id = b.qid
          |  WHERE em.label % 2 = eq.label % 2)
          |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
      require(base.contains(oldTail),
        "q_hnsw_ann_batch oracle tail changed — update the namespaced swap")
      base.replace(oldTail, newTail)
    })

  private def round13Queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // GROUPED (RAG-page) serving on the durable HNSW
    // (HnswIndex.searchGrouped — searchMaintainedGrouped's graph twin,
    // the round-12 verdict's Missing #1): one beam walk over the full
    // persisted graph, the page joins the sidecar-carried group column,
    // and the answer is the top-3 groups by best hit with 2 hits each —
    // the oracle replays BOTH rank total orders (within-group and
    // cross-group) over the closed-form beam.
    "q_hnsw_maintained_grouped" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
        .select($"vec_id", $"embedding", $"label")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val d = java.nio.file.Files.createTempDirectory("graft_hidxg_q_").toFile
      jsonlTmpCleanup(d)
      val idx = new java.io.File(d, "idx").getAbsolutePath
      HnswIndex.build(s, idx, e, cents, "vec_id", "embedding",
        "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1,
        passthrough = Seq("label"))
      val query = e.filter($"vec_id" === 42)
        .select($"embedding").head.getSeq[Float](0)
      HnswIndex.searchGrouped(s, idx, query, "label", beam = 8, hops = 3,
          nGroups = 3, perGroup = 2)
        .orderBy($"grp_rank", $"rnk")
    }),

    // RAG ask against the durable HNSW (Rag.askHnsw): the maintained
    // RAG loop pointed at the graph index — chunk text AND the parent
    // group ride the index as passthrough metadata, retrieval is the
    // grouped page (top-3 documents, 2 chunks each, one beam walk),
    // and the context assembles in the grouped page order. The oracle
    // replays the beam, both rank orders, and the exact string
    // assembly + prompt template.
    "q_rag_hnsw" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
        .select($"vec_id", $"embedding", $"label")
      val docs = t(s, dir, "documents")
        .select($"doc_id", substring($"text", 1, 40).as("chunk"))
      val src = e.join(docs, e("vec_id") === docs("doc_id"))
        .select($"vec_id", $"embedding", $"label", $"chunk")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val d = java.nio.file.Files.createTempDirectory("graft_ragh_q_").toFile
      jsonlTmpCleanup(d)
      val idx = new java.io.File(d, "idx").getAbsolutePath
      HnswIndex.build(s, idx, src, cents, "vec_id", "embedding",
        "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1,
        passthrough = Seq("label", "chunk"))
      val query = e.filter($"vec_id" === 42)
        .select($"embedding").head.getSeq[Float](0)
      Rag.askHnsw(s, idx, query, "where do vectors live", "chunk",
        "label", beam = 8, hops = 3, nGroups = 3, perGroup = 2)
    }),

    // Predicate SOFT delete on the durable HNSW
    // (HnswIndex.softDeleteWhere — deleteMaintainedWhere's graph twin,
    // the round-12 verdict's Missing #2): the predicate resolves ids
    // from the sidecar's passthrough columns, tombstones land in one
    // fenced commit, and the tombstone-honoring serve hides them. The
    // oracle is the beam replay with the survivors' label-parity
    // filter — identical final algebra to the filtered face, reached
    // through the delete path instead of the serving pred.
    "q_hnsw_maintained_sdwhere" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
        .select($"vec_id", $"embedding", $"label")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val d = java.nio.file.Files.createTempDirectory("graft_hidxw_q_").toFile
      jsonlTmpCleanup(d)
      val idx = new java.io.File(d, "idx").getAbsolutePath
      HnswIndex.build(s, idx, e, cents, "vec_id", "embedding",
        "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1,
        passthrough = Seq("label"))
      HnswIndex.softDeleteWhere(s, idx, pmod($"label", lit(2)) === 1)
      val query = e.filter($"vec_id" === 42)
        .select($"embedding").head.getSeq[Float](0)
      HnswIndex.search(s, idx, query, beam = 8, hops = 3, k = 5)
        .orderBy($"rank")
    }),

    // Late-interaction (ColBERT MaxSim) serving on the durable HNSW
    // (HnswIndex.searchMaxSim — searchMaintainedMaxSim's graph twin):
    // full-pooled-query beam for candidates, exact 4×4 slice-cosine
    // MaxSim re-rank over the ≤ beam candidates' stored vectors. The
    // oracle replays the beam and the slice max/micro-unit-sum
    // arithmetic.
    "q_hnsw_maintained_maxsim" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings").select($"vec_id", $"embedding")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val d = java.nio.file.Files.createTempDirectory("graft_hidxm_q_").toFile
      jsonlTmpCleanup(d)
      val idx = new java.io.File(d, "idx").getAbsolutePath
      HnswIndex.build(s, idx, e, cents, "vec_id", "embedding",
        "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
      val query = e.filter($"vec_id" === 42)
        .select($"embedding").head.getSeq[Float](0)
      HnswIndex.searchMaxSim(s, idx, query, nSlices = 4, beam = 8,
          hops = 3, k = 5)
        .orderBy($"rank")
    }),

    // Pinned-serve RIGHT-TO-ERASURE (the round-12 ADVICE medium): after
    // softDelete → purgeDeletes retires the tombstone sidecar, an asOf
    // pin at the pre-delete epoch reads the pinned vector generations —
    // without the erasure probe the purged rows would resurface (current
    // tombstones are empty). The pinned serve must filter ids absent
    // from the CURRENT membership bitmap, so the page equals the
    // tombstone-honoring serve exactly: the oracle is the q_hnsw_delete
    // replay verbatim.
    "q_hnsw_pinned_erasure" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings").select($"vec_id", $"embedding")
      val cents = e.filter($"vec_id" < 16)
        .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
      val d = java.nio.file.Files.createTempDirectory("graft_hidxe_q_").toFile
      jsonlTmpCleanup(d)
      val idx = new java.io.File(d, "idx").getAbsolutePath
      HnswIndex.build(s, idx, e, cents, "vec_id", "embedding",
        "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1) // epoch 0
      HnswIndex.softDelete(s, idx,
        e.filter(pmod($"vec_id", lit(17)) === 3)
          .select($"vec_id".as("id")), "id")
      HnswIndex.purgeDeletes(s, idx)
      require(HnswIndex.readDeletes(s, idx).isEmpty,
        "the vacuum must retire the tombstone sidecar — the erased ids " +
          "must have NO current tombstone trace for this row to bite")
      val query = e.filter($"vec_id" === 42)
        .select($"embedding").head.getSeq[Float](0)
      HnswIndex.search(s, idx, query, beam = 8, hops = 3, k = 5,
          asOf = Some(0L))
        .orderBy($"rank")
    })
  )

  private def round13Oracles: Map[String, String] = {
    val beamBase = round9Oracles("q_hnsw_delete")
    // the base's final page: tombstone filter + re-rank over the beam
    val beamTail =
      """SELECT rank, vec_id, score FROM (
        |  SELECT CAST(row_number() OVER (ORDER BY s DESC, id) AS INT) AS rank,
        |         id AS vec_id, s AS score
        |  FROM best3 WHERE id % 17 <> 3)
        |WHERE rank <= 5 ORDER BY rank""".stripMargin
    require(beamBase.contains(beamTail),
      "q_hnsw_delete oracle tail changed — update the round-13 swaps")
    def swapTail(newTail: String): String =
      beamBase.replace(beamTail, newTail)
    Map(
      // grouped page over the beam: within-group rank, best-per-group,
      // top-3 groups, 2 hits each — both total orders replayed
      "q_hnsw_maintained_grouped" -> swapTail(
        """,page AS (
          |  SELECT b.id, b.s, em.label
          |  FROM best3 b JOIN embeddings em ON em.vec_id = b.id),
          |h AS (SELECT label, id, s,
          |        row_number() OVER (PARTITION BY label ORDER BY s DESC, id) AS rnk
          |      FROM page),
          |bestg AS (SELECT label, s FROM h WHERE rnk = 1),
          |topg AS (SELECT label,
          |           row_number() OVER (ORDER BY s DESC, label) AS grp_rank
          |         FROM (SELECT label, s FROM bestg ORDER BY s DESC, label LIMIT 3)),
          |hk AS (SELECT label, id, s, rnk FROM h WHERE rnk <= 2)
          |SELECT hk.label, topg.grp_rank, hk.rnk, hk.id AS vec_id, hk.s AS score
          |FROM hk JOIN topg USING (label)
          |ORDER BY grp_rank, rnk""".stripMargin),
      // grouped page + document-coherent context assembly + the exact
      // prompt template
      "q_rag_hnsw" -> swapTail(
        """,page AS (
          |  SELECT b.id, b.s, em.label, substr(d.text, 1, 40) AS chunk
          |  FROM best3 b JOIN embeddings em ON em.vec_id = b.id
          |  JOIN documents d ON d.doc_id = b.id),
          |h AS (SELECT label, id, s, chunk,
          |        row_number() OVER (PARTITION BY label ORDER BY s DESC, id) AS rnk
          |      FROM page),
          |bestg AS (SELECT label, s FROM h WHERE rnk = 1),
          |topg AS (SELECT label,
          |           row_number() OVER (ORDER BY s DESC, label) AS grp_rank
          |         FROM (SELECT label, s FROM bestg ORDER BY s DESC, label LIMIT 3)),
          |hk AS (SELECT h.label, topg.grp_rank, h.rnk, h.chunk
          |       FROM h JOIN topg USING (label) WHERE h.rnk <= 2),
          |ctx AS (
          |  SELECT string_agg('- ' || chunk, chr(10)||chr(10)
          |                    ORDER BY grp_rank, rnk) AS context
          |  FROM hk)
          |SELECT 'where do vectors live' AS question, context,
          |       'Answer strictly from the context.'||chr(10)||chr(10)||
          |       'Context:'||chr(10)||context||chr(10)||chr(10)||
          |       'Question: where do vectors live'||chr(10)||'Answer:' AS prompt
          |FROM ctx""".stripMargin),
      // predicate delete: survivors are the even-label rows — the
      // filtered face's final algebra reached through the delete path
      "q_hnsw_maintained_sdwhere" -> swapTail(
        """SELECT rank, vec_id, score FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY s DESC, id) AS INT) AS rank,
          |         id AS vec_id, s AS score
          |  FROM best3 JOIN embeddings em ON em.vec_id = best3.id
          |  WHERE em.label % 2 = 0)
          |WHERE rank <= 5 ORDER BY rank""".stripMargin),
      // MaxSim re-rank over the beam candidates: exact 4×4 slice-cosine
      // grid (dim 64, 4 slices of 16), micro-unit integer sum
      "q_hnsw_maintained_maxsim" -> swapTail(
        """,grid AS (
          |  SELECT a.qi, b.dj FROM (SELECT unnest(generate_series(0,3)) qi) a
          |  CROSS JOIN (SELECT unnest(generate_series(0,3)) dj) b),
          |msc AS (
          |  SELECT e.vec_id, g.qi, g.dj,
          |    ROUND(list_sum(list_transform(generate_series(1,16), i ->
          |        e.embedding[g.dj*16+i]::DOUBLE * qv.q[g.qi*16+i]::DOUBLE))
          |      / (GREATEST(SQRT(list_sum(list_transform(generate_series(1,16), i ->
          |           e.embedding[g.dj*16+i]::DOUBLE * e.embedding[g.dj*16+i]::DOUBLE))), 1e-12)
          |       * GREATEST(SQRT(list_sum(list_transform(generate_series(1,16), i ->
          |           qv.q[g.qi*16+i]::DOUBLE * qv.q[g.qi*16+i]::DOUBLE))), 1e-12)), 6) AS c
          |  FROM embeddings e JOIN best3 b ON b.id = e.vec_id
          |  CROSS JOIN qv CROSS JOIN grid g),
          |mx AS (SELECT vec_id, qi, CAST(ROUND(MAX(c) * 1000000, 0) AS BIGINT) AS m
          |       FROM msc GROUP BY vec_id, qi),
          |ms AS (SELECT vec_id,
          |         ROUND(CAST(SUM(m) AS BIGINT)::DOUBLE / 1000000.0, 6) + 0.0 AS score
          |       FROM mx GROUP BY vec_id)
          |SELECT rank, vec_id, score FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY score DESC, vec_id) AS INT) AS rank,
          |         vec_id, score
          |  FROM ms)
          |WHERE rank <= 5 ORDER BY rank""".stripMargin),
      // pinned erasure: the pinned page with the purged ids dropped IS
      // the tombstone-honoring page — the q_hnsw_delete replay verbatim
      "q_hnsw_pinned_erasure" -> beamBase)
  }
}
