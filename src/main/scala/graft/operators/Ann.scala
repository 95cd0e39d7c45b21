package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.FloatVectorExpressions.dotF
import graft.functions.{VectorFunctions => V}
import graft.sources.Layout

/** Approximate nearest-neighbor search: IVF (inverted-file) coarse
  * quantization over the embedding column.
  *
  * The reference only ever does flat full scans (its README mentions
  * IVF/HNSW merely as corpus text, `rag_demo/ingest.py:13-14`); this is
  * the scale path a 100 TB corpus needs: score only the cells the query
  * probes instead of every row.
  *
  * Design for scale: cell assignment is a per-row broadcast-join compute
  * (no shuffle); the assigned table would be written bucketed by cell_id
  * so a probe reads only matching buckets (partition pruning). Centroid
  * "training" here is deterministic — take the first C vectors — so the
  * DuckDB oracle replicates the whole pipeline exactly; swap in k-means
  * centroids at no API change.
  */
object Ann {

  /** Documented driver-side ceiling for centroid tables that ride the
    * driver (kmeans means buffer = C × dim longs, warm-start collect):
    * a misconfigured C fails HERE at validation, loudly, instead of
    * OOMing the driver mid-collect hours into a job. 100 000 × 384-dim
    * floats ≈ 300 MB of working state — the top of what a driver
    * should ever hold; a bigger codebook wants hierarchical routing
    * (coarse cells → [[kmeansTrain]] per cell), not one flat table.
    */
  val MaxCentroids = 100000

  /** Ceiling for centroid sets embedded as IN-LITERAL projections
    * ([[ivfAssign]] / [[silhouetteSimplified]]'s per-row argmax over a
    * literal matrix): past a few thousand the generated expression
    * stops fitting codegen budgets and plan time balloons. Routing at
    * larger C belongs to the two-level path, not a wider literal.
    */
  val MaxInlineCentroids = 4096

  /** Ceiling on tombstone sets that ride a BROADCAST (the soft-delete
    * anti-joins [[hnswSearchDeleted]]/[[hnswSearchBatchDeleted]] and
    * the [[hnswCompact]] touched-cell joins). "Small by contract" was
    * previously doc-only: a mis-keyed delete (tombstoning half the
    * corpus) would hit Spark's broadcast limit as an opaque executor
    * OOM hours in, instead of a loud require up front — the
    * [[graft.operators.Sampling.MaxStrata]] discipline. The count is
    * `limit(ceiling + 1)`-guarded so the validation itself is bounded.
    * Override per session with `graft.maintained.maxTombstones` (a
    * legitimate mass delete should run the physical purge —
    * [[hnswCompact]] / `Streaming.vacuumDeletes` — not a bigger
    * broadcast).
    */
  val MaxTombstones = 1000000

  /** The distinct, long-cast, [[MaxTombstones]]-guarded broadcast
    * tombstone set every soft-delete face joins against (column
    * `__tid`). Throws loudly past the ceiling instead of OOMing.
    */
  private[graft] def boundedTombstones(tombstones: DataFrame,
                                       tombIdCol: String): DataFrame = {
    val ceiling = tombstones.sparkSession.conf
      .getOption("graft.maintained.maxTombstones")
      .map(_.toLong).getOrElse(MaxTombstones.toLong)
    require(ceiling >= 1, s"graft.maintained.maxTombstones must be >= 1")
    val t = tombstones.select(col(tombIdCol).cast("long").as("__tid"))
      .distinct()
    val n = t.limit(math.min(ceiling + 1, Int.MaxValue.toLong).toInt).count()
    require(n <= ceiling,
      s"tombstone set holds > $ceiling distinct ids — past the broadcast " +
        "ceiling (graft.maintained.maxTombstones). A delete this large " +
        "should be a physical purge (hnswCompact / vacuumDeletes), not " +
        "a broadcast anti-join; raise the conf only if the driver and " +
        "executors can actually hold the set")
    broadcast(t)
  }

  /** Assign each vector to its nearest centroid by cosine (tie: lowest
    * centroid id). `centroids` must be small — it is pulled to the driver
    * ONCE and embedded as literals, the DataFrame equivalent of a
    * broadcast variable. Output: all `vectors` columns + `cell_id`.
    *
    * Scale shape: assignment is a pure per-row PROJECTION — no cross
    * join, no exchange, no window sort (AnnSpec asserts the plan is
    * Exchange-free). The earlier window-argmax formulation shuffled and
    * sorted the full n×C scored cross product, which at C = 64k centroids
    * and corpus-scale n dwarfs the scan itself; the per-row argmax over
    * the in-literal centroid matrix shuffles nothing at any n.
    *
    * Assignment orders on the score QUANTIZED to 6 decimals: double
    * summation order differs between engines (and between partitionings),
    * so comparing unrounded sums makes near-tie assignments flip in the
    * last ulp; on the rounded value the (score, centroid-id) order is a
    * stable total order that the DuckDB oracle reproduces exactly.
    * The argmax is `array_max` over struct(score, -cent_id) — field-wise
    * struct comparison gives max score, ties to the LOWEST centroid id.
    * Per-centroid norms are computed driver-side with the same sequential
    * left-fold summation as the codegen dot kernel, keeping bit parity.
    *
    * TWO formulations, bit-identical (AnnSpec pins equality across the
    * threshold): up to [[UnrollCentroids]] the argmax unrolls as
    * in-literal expressions (codegen folds each centroid to constants —
    * fastest at serving C); past it, one [[graft.expressions]]
    * `AssignArgmax` kernel rides the projection as a reference object,
    * so generated code stays CENTROID-COUNT-INDEPENDENT — the unrolled
    * form crosses the JVM 64 KB method limit near C ≈ 1500 (dim 64)
    * and every stage then pays a janino compile attempt before falling
    * back to interpreted projection (the C-linear term the round-11
    * 100× refresh phase breakdown measured).
    */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame, idCol: String,
                vecCol: String, centIdCol: String, centVecCol: String): DataFrame = {
    val cents: Seq[(Long, Seq[Float], Double)] = centroids
      .select(col(centIdCol).cast("long"), col(centVecCol))
      .collect().toSeq
      .map { r =>
        val cvec = r.getSeq[Float](1)
        var n2 = 0.0
        cvec.foreach(x => n2 += x.toDouble * x.toDouble)
        (r.getLong(0), cvec, math.max(math.sqrt(n2), V.NormEps))
      }
      .sortBy(_._1)
    require(cents.nonEmpty, "centroids must be non-empty")
    if (cents.length > UnrollCentroids)
      vectors.withColumn("cell_id",
        graft.expressions.RehomeExpressions.assignArgmax(col(vecCol),
          cents.map(c => (c._1, c._2)), V.NormEps))
    else {
      val vn = greatest(sqrt(dotF(col(vecCol), col(vecCol))), lit(V.NormEps))
      val perCent = cents.map { case (cid, cvec, cn) =>
        struct(
          round(dotF(col(vecCol), typedLit(cvec)) / (vn * lit(cn)), 6).as("score"),
          lit(-cid).as("negid"))
      }
      val best = array_max(array(perCent: _*))
      vectors.withColumn("cell_id", -best.getField("negid"))
    }
  }

  /** Unroll ceiling for [[ivfAssign]]'s in-literal argmax: past this the
    * kernel formulation takes over. 256 × dim-64 dot expressions sit
    * comfortably under codegen budgets; the cliff (janino 64 KB) is
    * near C ≈ 1500.
    */
  private[graft] val UnrollCentroids = 256

  /** Deterministic k-means (Lloyd) centroid training in DataFrames.
    *
    * Init: the `c` vectors with the LOWEST ids (deterministic, engine-
    * replicable — no RNG). Each iteration: per-row argmax assignment via
    * `ivfAssign` (zero-shuffle projection), then per-(cell, dim) means via
    * posexplode + partial aggregation — ONE shuffle per iteration
    * carrying only C×dim partial sums, the map-side-combined mean shape
    * that holds at any corpus size. Each element is quantized to integer
    * MICRO-UNITS before summing, so the per-dim accumulator is an exact
    * long sum — order-independent across partitionings (a double `avg`
    * would let the summation order pick the last ulp, and near-knife-edge
    * means could flip between runs). Means stay quantized to 6 decimals
    * so downstream assignment compares stable values; cells that lose all
    * members keep their previous centroid. (Exactness holds while a cell's
    * micro-unit sum fits in a long — |x|≤1e3-ish up to ~10¹² members per
    * cell, far past any real cell size.)
    *
    * Returns a (cent_id BIGINT, cvec ARRAY<FLOAT>) DataFrame that plugs
    * straight into `ivfAssign` / `probeCells` / `search`. The reference
    * never trains — its README's IVF mention is corpus text
    * (`rag_demo/ingest.py:13-14`); this is the scale path's missing half:
    * balanced cells are what make probe-pruning effective.
    */
  def kmeansTrain(vectors: DataFrame, idCol: String, vecCol: String,
                  c: Int, iters: Int = 3,
                  init: Option[DataFrame] = None): DataFrame = {
    require(c >= 1 && iters >= 0)
    require(c <= MaxCentroids,
      s"kmeansTrain c = $c exceeds the driver-bound ceiling " +
        s"MaxCentroids = $MaxCentroids (the means buffer is C × dim on " +
        "the driver); train a two-level codebook instead")
    val spark = vectors.sparkSession
    import spark.implicits._
    // WARM START: `init` = a (cent_id, cvec) table (e.g. the index's
    // current committed centroids) — drift repair iterates from the
    // geometry the rows are already filed under instead of re-seeding,
    // so healthy cells barely move. Ids pass through as given; `c` is
    // ignored on this path (the centroid count is init's row count).
    var cents: Seq[(Long, Seq[Float])] = init match {
      case Some(df) =>
        // limit-guarded collect: even a grossly oversized init table
        // pulls at most MaxCentroids + 1 rows before the loud require
        val rows = df.limit(MaxCentroids + 1).collect().toSeq
          .map(r => (r.getLong(0), r.getSeq[Float](1)))
          .sortBy(_._1)
        require(rows.nonEmpty, "kmeansTrain: empty init centroid table")
        require(rows.length <= MaxCentroids,
          s"kmeansTrain warm-start table exceeds MaxCentroids = " +
            s"$MaxCentroids rows — not a centroid table")
        rows
      case None => vectors
        .orderBy(col(idCol)).limit(c)
        .select(col(vecCol)).collect().toSeq.zipWithIndex
        .map { case (r, i) => (i.toLong, r.getSeq[Float](0)) }
    }
    // the dimension comes from the init rows already collected — the
    // former `select(size(vecCol)).head` probe was one whole extra job
    // per training call (§1.2)
    val dim = cents.head._2.length
    for (_ <- 0 until iters) {
      val cdf = cents.toDF("cent_id", "cvec")
      val assigned = ivfAssign(vectors, cdf, idCol, vecCol, "cent_id", "cvec")
      val means: Map[Long, Array[Float]] = assigned
        .select(col("cell_id"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy(col("cell_id"), col("pos"))
        .agg(sum(round(col("x").cast("double") * 1e6, 0).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cid, rows) =>
          val arr = new Array[Float](dim)
          rows.foreach(r =>
            arr(r.getInt(1)) =
              (math.rint(r.getLong(2).toDouble / r.getLong(3)) / 1e6).toFloat)
          cid -> arr
        }
      cents = cents.map { case (cid, prev) =>
        (cid, means.get(cid).map(_.toSeq).getOrElse(prev))
      }
    }
    cents.toDF("cent_id", "cvec")
  }

  /** FAISS-style index factory: one spec string picks the whole search
    * tier, so swapping accuracy against scan cost is a config change,
    * not a code change —
    *   "FLAT"          exact cosine scan (the reference's only mode)
    *   "IVF<c>"        k-means(c)-trained cell routing, probe-pruned scan
    *   "IVF<c>,PQ<m>"  cell routing + m-subspace ADC scoring
    *   "PQ<m>"         full-corpus ADC scan (32× compression at m=8)
    *   "SQ8"           scalar-quantized asymmetric scan (4×)
    * All tiers return (id, score) rows, score desc, id tie-break; every
    * underlying component is the oracle-checked operator above. PQ
    * codebooks use the deterministic lowest-id init (the q_ann_pq
    * contract) — per-subspace k-means drops in at no interface change.
    */
  def searchFactory(spec: String, vectors: DataFrame, idCol: String,
                    vecCol: String, query: Seq[Float], k: Int,
                    nProbes: Int = 4, kmeansIters: Int = 2): DataFrame = {
    val Ivf = """IVF(\d+)""".r
    val IvfPq = """IVF(\d+),PQ(\d+)""".r
    val Pq = """PQ(\d+)""".r
    def centroids(c: Int): DataFrame =
      kmeansTrain(vectors, idCol, vecCol, c, kmeansIters)
    def codebooks(ksub: Int): Seq[Seq[Float]] = vectors
      .orderBy(col(idCol)).limit(ksub)
      .select(col(vecCol)).collect().map(_.getSeq[Float](0)).toSeq
    spec.trim.toUpperCase match {
      case "FLAT" =>
        val qn = math.max(math.sqrt(query.map(x => x.toDouble * x).sum), V.NormEps)
        val scored = vectors.withColumn("score",
          dotF(col(vecCol), typedLit(query)) /
            (greatest(sqrt(dotF(col(vecCol), col(vecCol))), lit(V.NormEps)) * lit(qn)))
        TopK.topK(scored, col("score"), col(idCol), k)
          .select(col(idCol).as("id"), col("score"))
      case IvfPq(c, m) =>
        searchIvfPq(vectors, centroids(c.toInt), idCol, vecCol, "cent_id",
          "cvec", codebooks(16), m.toInt, query, nProbes, k)
          .select(col(idCol).as("id"), col("score"))
      case Ivf(c) =>
        search(vectors, centroids(c.toInt), idCol, vecCol, "cent_id", "cvec",
          query, nProbes, k)
      case Pq(m) =>
        val cb = codebooks(16)
        val lut = pqLut(query, cb, m.toInt)
        val scored = vectors
          .withColumn("__codes", pqEncode(col(vecCol), cb, m.toInt))
          .withColumn("score", pqAdcScore(col("__codes"), lut))
        TopK.topK(scored, col("score"), col(idCol), k)
          .select(col(idCol).as("id"), col("score"))
      case "SQ8" =>
        val (mn, mx) = sqTrain(vectors, vecCol)
        val scored = vectors
          .withColumn("__codes", sqEncode(col(vecCol), mn, mx))
          .withColumn("score", sqDot(col("__codes"), query, mn, mx))
        TopK.topK(scored, col("score"), col(idCol), k)
          .select(col(idCol).as("id"), col("score"))
      case other => throw new IllegalArgumentException(
        s"unknown index spec '$other' — want FLAT, IVF<c>, IVF<c>,PQ<m>, PQ<m>, or SQ8")
    }
  }

  /** Batch IVF search — [[search]] for a TABLE of queries in one job:
    * the broadcast centroid×query cross ranks each query's `nProbes`
    * cells, then ONE broadcast join routes every corpus row to exactly
    * the queries probing its cell; scoring is the codegen dot kernel and
    * the per-query top-k reduces via WindowGroupLimit (map-side k-heaps
    * before the qid exchange — never a full sort). Corpus-side cost is
    * one scan + one (probed-fraction × queries) scoring pass at ANY
    * query-batch size; `nProbes = #centroids` scans everything, making
    * this the EXACT side of a recall evaluation (`q_recall_eval` pairs
    * nProbes=4 against nProbes=16 through [[recallAtK]]).
    */
  def searchBatchIvf(vectors: DataFrame, centroids: DataFrame,
                     idCol: String, vecCol: String,
                     centIdCol: String, centVecCol: String,
                     queries: DataFrame, qidCol: String, qvecCol: String,
                     nProbes: Int, k: Int): DataFrame = {
    require(nProbes >= 1 && k >= 1, s"need nProbes, k >= 1; got $nProbes, $k")
    import org.apache.spark.sql.expressions.Window
    val assigned = ivfAssign(vectors, centroids, idCol, vecCol,
      centIdCol, centVecCol)
    val pw = Window.partitionBy(col(qidCol))
      .orderBy(col("__c").desc, col(centIdCol))
    val probes = centroids
      .crossJoin(broadcast(queries.select(col(qidCol), col(qvecCol))))
      .withColumn("__c", round(V.cosine(col(centVecCol), col(qvecCol)), 6))
      .withColumn("__rn", row_number().over(pw))
      .filter(col("__rn") <= nProbes)
      .select(col(qidCol), col(qvecCol), col(centIdCol).as("cell_id"))
    val scored = assigned.join(broadcast(probes), Seq("cell_id"))
      .withColumn("score",
        round(dotF(col(vecCol), col(qvecCol)) /
          (greatest(sqrt(dotF(col(vecCol), col(vecCol))), lit(V.NormEps)) *
            greatest(sqrt(dotF(col(qvecCol), col(qvecCol))), lit(V.NormEps))),
          6) + lit(0.0))
    val kw = Window.partitionBy(col(qidCol))
      .orderBy(col("score").desc, col(idCol))
    scored.withColumn("__rn", row_number().over(kw))
      .filter(col("__rn") <= k)
      .select(col(qidCol), col(idCol), col("score"))
  }

  /** Ranking-quality evaluation: per-query recall of an approximate
    * hit table against the exact one — `|approx ∩ exact| / |exact|`
    * per query id. Both inputs are (qidCol, idCol) hit tables (any
    * extra columns ignored), the shape `searchBatch` / `search`
    * produce. Distributed: one semi-join + two per-query counts, so
    * evaluating 10⁶ held-out queries against a 100 TB corpus'
    * rankings is a join problem, not a driver loop (AnnSpec's
    * driver-side loop is the 20-query test-fixture version).
    * Returns (qidCol, n_exact, n_hit, recall) — recall rounded to 6.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame,
                qidCol: String, idCol: String): DataFrame = {
    val qid = col(qidCol)
    val ne = exact.groupBy(qid).agg(count(lit(1)).as("n_exact"))
    val nh = exact.select(qid, col(idCol))
      .join(approx.select(qid, col(idCol)), Seq(qidCol, idCol), "left_semi")
      .groupBy(qid).agg(count(lit(1)).as("n_hit"))
    ne.join(nh, Seq(qidCol), "left")
      .select(qid, col("n_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (round(coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("n_exact").cast("double"), 6) + lit(0.0)).as("recall"))
  }

  /** Approximate kNN self-join — the kNN-GRAPH construction primitive
    * (SemDeDup neighborhoods, kNN-graph clustering, HNSW-style index
    * bootstraps all start here): every vector's top-k cosine neighbors
    * among the vectors sharing its IVF cell (probe-1 approximation — a
    * vector near a cell boundary can miss a cross-cell neighbor; raise
    * cells' resolution or union a second assignment under a rotated
    * codebook to tighten recall, same trade as every IVF search).
    *
    * Scale shape: the quadratic hazard is the within-cell self-join —
    * Σ|cell|² pairs — which is exactly what the cell partitioning is
    * FOR: at C balanced cells the candidate count is n²/C, and the
    * per-src top-k is the k-bounded two-phase aggregator, so only
    * n × k edges survive the reduction. A hot cell is the LSH
    * hot-bucket failure mode — cap or re-cluster it (the `Dedup`
    * bucket-cap discipline applies unchanged).
    */
  def knnJoin(vectors: DataFrame, centroids: DataFrame,
              idCol: String, vecCol: String,
              centIdCol: String, centVecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // norms hoisted OUT of the pair loop: V.cosine would recompute both
    // sides' norms per candidate pair (3 dot products/pair); computing
    // them once per vector leaves one dot product per pair — same
    // doubles (identical op sequence per value), 3.5× measured at sf0.1
    val assigned = ivfAssign(vectors, centroids, idCol, vecCol,
        centIdCol, centVecCol)
      .withColumn("__n", V.normSafe(col(vecCol)))
      .localCheckpoint(false) // both self-join sides; assign runs ONCE
    val a = assigned.select(col("cell_id"), col(idCol).as("src"),
      col(vecCol).as("__ea"), col("__n").as("__na"))
    val b = assigned.select(col("cell_id"), col(idCol).as("dst"),
      col(vecCol).as("__eb"), col("__n").as("__nb"))
    val pairs = a.join(b, Seq("cell_id"))
      .filter(col("src") =!= col("dst"))
      .withColumn("score",
        round(graft.expressions.FloatVectorExpressions.dotF(
          col("__ea"), col("__eb")) / (col("__na") * col("__nb")), 6)
          + lit(0.0))
      .select(col("src"), col("dst"), col("score"))
    TopK.topKPerKeyAgg(pairs, Seq(col("src")), col("score"), col("dst"), k)
      .select(col("src"), col("id").as("dst"), col("score"))
  }

  /** ONE Spark job answering a walk step's bounded lookups together:
    * the quantized query scores of `toScore` ids (an id-isin-pruned
    * scan of the vector table) and, per requested layer, the
    * out-neighbors of `toExpand`'s srcs (a src-isin-pruned scan of
    * that layer's edge table). Every leg stays its OWN scan with its
    * own literal filter — the parquet pushdown the two-scan shape had
    * is fully preserved (the round-13 fused hop⨝vectors join was
    * reverted precisely because the join side lost it); the union
    * merely submits the legs as one action, so the driver pays one
    * job of scheduling latency per step instead of one per lookup
    * (guide §1.2). Row tags: __t = -1 score row (id, score),
    * __t = l ≥ 0 edge row of layer l (src, dst).
    */
  private def fetchWalk(vectors: DataFrame, idCol: String, vecCol: String,
                        q: Array[Float], qn: Double, toScore: Seq[Long],
                        layers: Seq[DataFrame],
                        toExpand: Seq[(Int, Seq[Long])])
      : (Map[Long, Double], Map[Int, Map[Long, Seq[Long]]]) = {
    val rows = fetchWalkPlan(vectors, idCol, vecCol, q, qn, toScore,
      layers, toExpand) match {
      case None => return (Map.empty, Map.empty)
      case Some(df) => df.collect()
    }
    val scores = rows.iterator.filter(_.getInt(0) == -1)
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    val adj = rows.iterator.filter(_.getInt(0) >= 0).toArray
      .groupBy(_.getInt(0)).map { case (l, rs) =>
        l -> rs.groupBy(_.getLong(1)).map { case (s, es) =>
          s -> es.map(_.getLong(2)).distinct.toSeq
        }
      }
    (scores, adj)
  }

  /** The un-collected [[fetchWalk]] union — split out so the plan
    * audit (graft.Plans walk_fetch) can pin PushedFilters on every
    * leg of the fused per-step job.
    */
  private[graft] def fetchWalkPlan(vectors: DataFrame, idCol: String,
                        vecCol: String,
                        q: Array[Float], qn: Double, toScore: Seq[Long],
                        layers: Seq[DataFrame],
                        toExpand: Seq[(Int, Seq[Long])])
      : Option[DataFrame] = {
    val scoreLegs =
      if (toScore.isEmpty) Nil
      else Seq(vectors.filter(col(idCol).isin(toScore.map(Long.box): _*))
        .select(lit(-1).as("__t"), col(idCol).cast("long").as("__a"),
          lit(0L).as("__b"),
          (round(dotF(col(vecCol), lit(q)) /
            (V.normSafe(col(vecCol)) * lit(qn)), 6) + lit(0.0)).as("__s")))
    val edgeLegs = toExpand.collect { case (l, srcs) if srcs.nonEmpty =>
      layers(l).filter(col("src").isin(srcs.map(Long.box): _*))
        .select(lit(l).as("__t"), col("src").cast("long").as("__a"),
          col("dst").cast("long").as("__b"), lit(0.0).as("__s"))
    }
    val legs = scoreLegs ++ edgeLegs
    if (legs.isEmpty) None else Some(legs.reduce(_ unionByName _))
  }

  /** NSW-style GRAPH beam search (Malkov et al. 2014 — the navigable-
    * small-world family HNSW layers on top): greedy best-first
    * expansion over a prebuilt kNN neighbor graph. Completes the ANN
    * tier list with the graph-based family beside IVF (partition-
    * pruned), PQ/SQ/BQ (compressed) and MRL (truncated): graph search
    * visits O(beam · degree · hops) vectors regardless of corpus size,
    * the property that makes it the serving-side default, while the
    * GRAPH BUILD is the batch job ([[knnJoin]] — cell-bounded, the
    * 100 TB path).
    *
    * Per hop: expand the frontier's out-neighbors, drop visited ids,
    * score the new candidates against the query (cosine, round-6 — the
    * knnJoin quantization), merge into the beam, keep the top `beam`;
    * the next frontier is the newly-visited survivors. The hop's
    * scoring scan and the NEXT hop's edge expansion ride ONE fused job
    * ([[fetchWalk]] — the next frontier is always a subset of this
    * hop's candidates, so their out-edges can be prefetched in the
    * same action; both legs keep their literal-isin parquet pushdown,
    * and a serve pays ~1 job per hop instead of 2). Driver state
    * (beam, visited, prefetched adjacency) is bounded by
    * beam + hops·beam·degree ids — the k-bounded-collect contract.
    * Fully deterministic: entry = smallest id, ties (score desc,
    * id asc), so the unrolled oracle replays every hop.
    *
    * NOTE: a fused hop⨝vectors JOIN was tried (round 13) and
    * REVERTED — the join side loses the id-isin parquet pushdown, so
    * every hop scans the whole vector table; the literal-isin legs
    * prune at any corpus size.
    *
    * Returns the final beam as (rank, idCol, score) sorted best-first.
    */
  def graphBeamSearch(edges: DataFrame, vectors: DataFrame,
                      idCol: String, vecCol: String, query: Seq[Float],
                      beam: Int, hops: Int,
                      entryId: Option[Long] = None,
                      entryScore: Option[Double] = None,
                      entryAdj: Option[Seq[Long]] = None): DataFrame = {
    require(beam >= 1 && hops >= 0, s"bad beam/hops: $beam/$hops")
    val spark = vectors.sparkSession
    import spark.implicits._
    val q = query.toArray
    // clamp like V.normSafe so a zero-norm query scores 0, not NaN —
    // keeps the batch face (normSafe on __qn) pinned ≡ this one
    val qn = math.max(math.sqrt(q.map(x => x.toDouble * x).sum), V.NormEps)
    // entryId overrides the default smallest-id entry — the HNSW
    // hierarchy's descent ([[hnswSearch]]) lands the walk next to the
    // query before the beam ever runs
    val entry = entryId.getOrElse(
      vectors.agg(min(col(idCol).cast("long"))).head.getLong(0))
    var visited = Set(entry)
    // out-neighbors prefetched one hop ahead: ids in `adjKnown` have
    // their adjacency in `adj` (absent from the map = fetched, none)
    var adj: Map[Long, Seq[Long]] =
      entryAdj.map(a => Map(entry -> a)).getOrElse(Map.empty)
    var adjKnown: Set[Long] = if (entryAdj.isDefined) Set(entry) else Set.empty
    // a caller that already scored the entry (the descent tracks its
    // current node's score) passes it through — same quantized
    // expression, one fewer scan job per serve
    var best = (entryId, entryScore) match {
      case (Some(e), Some(s)) => List(e -> s)
      case _ =>
        // fuse the entry's scoring scan with its out-edge scan
        val (sc, ad) = fetchWalk(vectors, idCol, vecCol, q, qn,
          Seq(entry), Seq(edges), Seq((0, Seq(entry))))
        adj = ad.getOrElse(0, Map.empty)
        adjKnown = Set(entry)
        sc.get(entry).map(entry -> _).toList
    }
    var frontier = Seq(entry)
    for (h <- 1 to hops if frontier.nonEmpty) {
      val missing = frontier.filterNot(adjKnown)
      if (missing.nonEmpty) {
        val (_, ad) = fetchWalk(vectors, idCol, vecCol, q, qn, Nil,
          Seq(edges), Seq((0, missing)))
        adj ++= ad.getOrElse(0, Map.empty)
        adjKnown ++= missing
      }
      val cand = frontier.flatMap(f => adj.getOrElse(f, Nil))
        .distinct.filterNot(visited)
      if (cand.nonEmpty) {
        // ONE job: score the candidates AND prefetch their out-edges
        // (the next frontier ⊆ cand; the final hop skips the prefetch)
        val expand =
          if (h < hops) Seq((0, cand.filterNot(adjKnown))) else Nil
        val (sc, ad) = fetchWalk(vectors, idCol, vecCol, q, qn, cand,
          Seq(edges), expand)
        if (h < hops) {
          adj ++= ad.getOrElse(0, Map.empty)
          adjKnown ++= cand
        }
        val scored = cand.flatMap(id => sc.get(id).map(id -> _))
        visited ++= cand
        val merged = (best ++ scored)
          .sortBy { case (id, s) => (-s, id) }.take(beam)
        frontier = merged.map(_._1).filterNot(best.map(_._1).toSet)
        best = merged
      } else frontier = Seq.empty
    }
    best.zipWithIndex
      .map { case ((id, s), r) => (r + 1, id, s) }
      .toDF("rank", idCol, "score")
  }

  /** BATCHED graph beam search — the fully-DISTRIBUTED face of
    * [[graphBeamSearch]]: every query's walk advances simultaneously as
    * DataFrame state, so a 10⁶-query batch is 3·hops jobs total instead
    * of hops jobs PER query (the driver-loop version is the serving/
    * debug shape; this is the batch-scoring shape). State per hop:
    * beam (qid, id, score) ≤ Q·beam rows, visited (qid, id) ≤
    * Q·beam·degree·hops rows — both localCheckpoint per hop (the
    * iterative-lineage discipline); per hop ONE frontier⨝edges join
    * keyed on the graph node, one candidate scoring join against the
    * broadcast query table, and the k-bounded two-phase
    * `TopK.topKPerKeyAgg` per query. Same entry/tie determinism as the
    * single-query walk, so the per-qid unrolled oracle replays every
    * hop. Returns (qidCol, rank, id, score).
    *
    * `entries` overrides the shared smallest-id entry with a PER-QUERY
    * entry table (first column = the query id, second = the entry node
    * id) — the seam [[hnswSearchBatch]]'s layered descent feeds, so
    * each query's beam starts inside its own neighborhood.
    */
  def graphBeamSearchBatch(edges: DataFrame, vectors: DataFrame,
                           queries: DataFrame, idCol: String, vecCol: String,
                           qidCol: String, qvecCol: String,
                           beam: Int, hops: Int,
                           entries: Option[DataFrame] = None): DataFrame = {
    require(beam >= 1 && hops >= 0, s"bad beam/hops: $beam/$hops")
    val q = broadcast(
      queries.select(col(qidCol).as("__qid"), col(qvecCol).as("__qv"),
        V.normSafe(col(qvecCol)).as("__qn")).localCheckpoint(false))
    val seed = entries match {
      case Some(ent) =>
        broadcast(ent.select(col(ent.columns(0)).as("__qid"),
          col(ent.columns(1)).cast("long").as("__id"))
          .localCheckpoint(false))
      case None =>
        val entry = vectors.agg(min(col(idCol).cast("long"))).head.getLong(0)
        q.select(col("__qid"), lit(entry).as("__id"))
    }
    // every per-hop join keys a REQUEST-BOUNDED side (frontier ≤ Q·beam,
    // candidates ≤ Q·beam·degree, beam ≤ Q·beam) against a corpus-sized
    // table (edges, vectors) — broadcast the bounded side EXPLICITLY
    // (§3.1: estimates after joins/checkpoints are unreliable, and a
    // sort-merge fallback here would shuffle the corpus per hop)
    def scoreCands(cand: DataFrame): DataFrame =
      broadcast(cand)
        .join(vectors.select(col(idCol).as("__id"), col(vecCol).as("__v"),
          V.normSafe(col(vecCol)).as("__n")), Seq("__id"))
        .join(q, Seq("__qid"))
        .select(col("__qid"), col("__id"),
          (round(dotF(col("__v"), col("__qv")) /
            (col("__n") * col("__qn")), 6) + lit(0.0)).as("__s"))
    var beamDf = scoreCands(seed)
      .localCheckpoint(false)
    var frontier = beamDf.select(col("__qid"), col("__id"))
    for (_ <- 1 to hops) {
      // candidates = the frontier's out-neighbors not already IN the
      // current beam. The anti-join runs against the ≤ Q·beam beam
      // instead of the GROWING (Q·beam·degree·hops) visited set the
      // pre-r14 shape unioned + checkpointed per hop: a node the beam
      // once dropped may re-score here, but it can never re-enter —
      // the beam's k-th (score desc, id asc) key only improves hop
      // over hop, and the per-qid tie order is total — so the merged
      // beam is row-identical while a full union + localCheckpoint +
      // ever-larger anti-join per hop disappears (§2.3: less state,
      // fewer shuffled bytes; AnnSpec's batch ≡ single pins it).
      val cand = broadcast(frontier)
        .join(edges.select(col("src").cast("long").as("__id"),
          col("dst").cast("long").as("__dst")), Seq("__id"))
        .select(col("__qid"), col("__dst").as("__id")).distinct()
        .join(broadcast(beamDf.select(col("__qid"), col("__id"))),
          Seq("__qid", "__id"), "left_anti")
        .localCheckpoint(false)
      val merged = TopK.topKPerKeyAgg(
          beamDf.unionByName(scoreCands(cand)),
          Seq(col("__qid")), col("__s"), col("__id"), beam)
        .select(col("__qid"), col("id").as("__id"), col("score").as("__s"))
        .localCheckpoint(false)
      frontier = merged.join(
        broadcast(beamDf.select(col("__qid"), col("__id"))),
        Seq("__qid", "__id"), "left_anti")
      beamDf = merged
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__qid")).orderBy(col("__s").desc, col("__id"))
    beamDf
      .select(col("__qid").as(qidCol),
        row_number().over(w).as("rank"),
        col("__id").as(idCol), col("__s").as("score"))
  }

  /** Deterministic HNSW level assignment (Malkov & Yashunin 2018 §4.1's
    * geometric level draw, derandomized): level(id) = the largest
    * l ≤ maxLevel with md5(id) ≡ 0 (mod fanout^l) — an expected 1/fanout
    * of each level's nodes graduate to the next, the same pyramid the
    * paper's exponential draw produces, but REPLAYABLE (same id → same
    * level in both engines, the [[graft.functions.HashFunctions]]
    * md5-Horner fold) and stable under re-ingest. Nested by
    * construction: h ≡ 0 (mod f^l) implies h ≡ 0 (mod f^(l−1)), so the
    * indicator sum IS the max level. Requires fanout^maxLevel < 2³¹.
    */
  def hnswLevel(id: Column, fanout: Int, maxLevel: Int): Column = {
    require(fanout >= 2 && maxLevel >= 1 &&
      math.pow(fanout.toDouble, maxLevel.toDouble) < Int.MaxValue.toDouble,
      s"need fanout >= 2, maxLevel >= 1, fanout^maxLevel < 2^31; " +
        s"got $fanout^$maxLevel")
    (1 to maxLevel).map { l =>
      val m = math.pow(fanout.toDouble, l.toDouble).toLong.toInt
      when(graft.functions.HashFunctions.shardHash(id, m) === 0L, lit(1))
        .otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** HNSW-layered graph build: one [[knnJoin]] kNN graph PER LEVEL,
    * level l's graph spanning only the nodes whose [[hnswLevel]] ≥ l —
    * upper layers are progressively sparser subgraphs of the corpus
    * (expected n/fanout^l nodes), the express lanes the descent rides.
    * Each level also COARSENS the IVF cells (the lowest-id
    * ⌈C/fanout^l⌉ centroids): sparser membership over bigger cells is
    * exactly HNSW's "upper links are longer" property — the top layer
    * approaches one cell spanning the whole corpus, so the descent can
    * cross regions layer 0's cell-bounded graph never connects (the
    * knnJoin probe-1 boundary caveat, repaired by the hierarchy).
    * Index i of the returned seq = level i's edge table (level 0 is the
    * full NSW graph [[graphBeamSearch]] always walked).
    *
    * Scale shape: level l's within-cell pair count is
    * ≈ (n/f^l)²/(C/f^l) = n²/(C·f^l) — a GEOMETRIC DECAY of the flat
    * build's n²/C, so the whole hierarchy costs < f/(f−1) ≈ 1.14× (f=8)
    * of the flat build: extra edge tables on disk instead of HNSW's
    * resident-memory layers.
    */
  def hnswBuild(vectors: DataFrame, centroids: DataFrame,
                idCol: String, vecCol: String,
                centIdCol: String, centVecCol: String,
                k: Int, fanout: Int, maxLevel: Int): Seq[DataFrame] = {
    val lvl = hnswLevel(col(idCol), fanout, maxLevel)
    val nCents = centroids.count()
    (0 to maxLevel).map { l =>
      val members = if (l == 0) vectors else vectors.filter(lvl >= l)
      val m = math.max(1L,
        math.ceil(nCents / math.pow(fanout.toDouble, l.toDouble)).toLong)
      val coarse =
        if (l == 0) centroids
        else centroids.orderBy(col(centIdCol)).limit(m.toInt)
      knnJoin(members, coarse, idCol, vecCol, centIdCol, centVecCol, k)
    }
  }

  /** The descent's ENTRY-DISCOVERY aggregation — each level's smallest
    * id, computed over an ID-ONLY scan: [[hnswLevel]] derives the
    * level from the id, so the scan prunes to the id column (guide §6
    * — at corpus scale the embedding column IS the table). Round 13
    * fused the entry's query SCORE into this job via min_by, which
    * forced the scan to read id + embedding corpus-wide to save one
    * ~80 ms driver job — the wrong trade at any real corpus size
    * (round-14 revert; the entry's score now rides the isin-pruned
    * [[fetchWalk]] instead). Exposed for the plan audit
    * (plans/r14/descent_tops_after.txt pins ReadSchema = id only).
    */
  private[graft] def descentTops(vectors: DataFrame, idCol: String,
                                 fanout: Int, maxLevel: Int): DataFrame = {
    val lvl = hnswLevel(col(idCol), fanout, maxLevel)
    vectors.select(col(idCol).cast("long").as("__id"), lvl.as("__l"))
      .groupBy(col("__l")).agg(min(col("__id")).as("__e"))
  }

  /** The HNSW DESCENT: from the smallest id of the highest non-empty
    * layer, greedy-walk each upper layer's graph toward the query (move
    * to the best-scoring out-neighbor while it strictly improves, up to
    * `descentHops` moves per layer, quantized-cosine ties to the
    * smallest id), then hand the reached node down a layer. Returns the
    * layer-0 entry node. Every step touches ONE node's out-neighbors
    * (≤ graph degree rows collected — bounded by the index structure),
    * so entry selection costs O(levels · descentHops · degree) vector
    * scores instead of the flat walk's corpus-diameter hops from a
    * fixed arbitrary entry.
    */
  def hnswDescend(layers: Seq[DataFrame], vectors: DataFrame,
                  idCol: String, vecCol: String, query: Seq[Float],
                  fanout: Int, descentHops: Int): Long =
    hnswDescendFull(layers, vectors, idCol, vecCol, query, fanout,
      descentHops)._1

  /** [[hnswDescend]] plus the reached entry's (already computed)
    * quantized score, so [[hnswSearch]] can seed the layer-0 beam
    * without re-scoring the entry — one fewer job per serve (§1.2).
    */
  private[graft] def hnswDescendScored(layers: Seq[DataFrame],
                  vectors: DataFrame,
                  idCol: String, vecCol: String, query: Seq[Float],
                  fanout: Int, descentHops: Int): (Long, Double) = {
    val r = hnswDescendFull(layers, vectors, idCol, vecCol, query,
      fanout, descentHops)
    (r._1, r._2)
  }

  /** [[hnswDescendScored]] plus the reached entry's layer-0 adjacency
    * when the walk's fused fetches already prefetched it — the beam's
    * first hop then pays no separate edge job. Per step the descent
    * runs ONE [[fetchWalk]] job carrying the unscored neighbors'
    * scores, the neighbors' out-edges at the current level (the next
    * step's node is one of them) and the HANDOFF prefetch — every
    * possible level-exit node's adjacency at the level below — so the
    * whole descent costs ~1 job per step instead of 2, with every leg
    * still literal-isin pruned (the id-only entry agg stays a separate
    * job: [[descentTops]]).
    */
  private def hnswDescendFull(layers: Seq[DataFrame],
                  vectors: DataFrame,
                  idCol: String, vecCol: String, query: Seq[Float],
                  fanout: Int, descentHops: Int)
      : (Long, Double, Option[Seq[Long]]) = {
    require(layers.nonEmpty && descentHops >= 0,
      s"need layers and descentHops >= 0")
    val maxLevel = layers.length - 1
    val q = query.toArray
    // NormEps clamp: zero-norm queries score 0 (the batch face's
    // normSafe treatment), so batch ≡ single holds for them too
    val qn = math.max(math.sqrt(q.map(x => x.toDouble * x).sum), V.NormEps)
    // entry = smallest id of the highest non-empty layer, from the
    // id-only per-level min agg (ONE job, column-pruned)
    val tops = descentTops(vectors, idCol, fanout, maxLevel)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val topLevel = (maxLevel to 0 by -1)
      .find(l => tops.keys.exists(_ >= l))
      .getOrElse(0)
    val entry0 = (topLevel to maxLevel).flatMap(tops.get).min
    // per-query score cache and per-(level, node) adjacency cache —
    // filled one fused job at a time; both structure-bounded
    // (≤ levels · descentHops · degree entries per serve)
    val scores = scala.collection.mutable.Map.empty[Long, Double]
    val adj = scala.collection.mutable.Map.empty[(Int, Long), Seq[Long]]
    val adjKnown = scala.collection.mutable.Set.empty[(Int, Long)]
    def fetch(toScore: Seq[Long], toExpand: Seq[(Int, Seq[Long])]): Unit = {
      val need = toScore.filterNot(scores.contains)
      val exp = toExpand
        .map { case (l, s) => (l, s.filterNot(i => adjKnown((l, i)))) }
        .filter(_._2.nonEmpty)
      if (need.isEmpty && exp.isEmpty) return
      val (sc, ad) = fetchWalk(vectors, idCol, vecCol, q, qn, need,
        layers, exp)
      scores ++= sc
      exp.foreach { case (l, srcs) =>
        val got = ad.getOrElse(l, Map.empty)
        srcs.foreach { s =>
          adj((l, s)) = got.getOrElse(s, Nil)
          adjKnown += ((l, s))
        }
      }
    }
    // first fused job: the entry's quantized score (one isin-pruned
    // row) + the entry's out-edges at the level the walk enters
    val enterLevel = if (topLevel >= 1) topLevel else 0
    fetch(Seq(entry0), Seq((enterLevel, Seq(entry0))))
    var cur = entry0
    var curScore = scores.getOrElse(entry0, 0.0)
    if (descentHops > 0) {
      for (l <- topLevel to 1 by -1) {
        // the walk enters level l at cur — normally prefetched by the
        // previous level's handoff leg; this covers the rare miss
        // (e.g. the previous level saw no neighbors at all)
        fetch(Nil, Seq((l, Seq(cur))))
        var moved = true
        var step = 0
        while (moved && step < descentHops) {
          val nbrs = adj.getOrElse((l, cur), Nil)
          if (nbrs.isEmpty) moved = false
          else {
            val nextLevel = if (l > 1) l - 1 else 0
            val expand =
              (if (step + 1 < descentHops) Seq((l, nbrs)) else Nil) ++
                Seq((nextLevel, cur +: nbrs))
            fetch(nbrs, expand)
            val scoredNbrs = nbrs.flatMap(id => scores.get(id).map(id -> _))
            val (bid, bs) = (scoredNbrs :+ (cur -> curScore))
              .minBy { case (i, s) => (-s, i) }
            if (bid != cur) { cur = bid; curScore = bs } else moved = false
          }
          step += 1
        }
      }
    }
    val adj0 =
      if (adjKnown((0, cur))) Some(adj.getOrElse((0, cur), Nil)) else None
    (cur, curScore, adj0)
  }

  /** HNSW search (`rag_demo/ingest.py:13-14` names HNSW as the
    * reference's aspirational index): [[hnswDescend]] picks the layer-0
    * entry in O(levels · degree) work, then [[graphBeamSearch]] runs
    * the layer-0 beam from there — so the beam spends its hops
    * REFINING inside the query's neighborhood instead of crossing the
    * corpus from the fixed smallest-id entry. At equal recall the flat
    * walk needs strictly more layer-0 hops on clustered data (AnnSpec
    * pins this on the spec fixture). Returns (rank, idCol, score).
    */
  def hnswSearch(layers: Seq[DataFrame], vectors: DataFrame,
                 idCol: String, vecCol: String, query: Seq[Float],
                 fanout: Int, beam: Int, hops: Int,
                 descentHops: Int = 2): DataFrame = {
    val (entry, entryScore, entryAdj) = hnswDescendFull(layers, vectors,
      idCol, vecCol, query, fanout, descentHops)
    graphBeamSearch(layers.head, vectors, idCol, vecCol, query, beam,
      hops, entryId = Some(entry), entryScore = Some(entryScore),
      entryAdj = entryAdj)
  }

  /** BATCHED HNSW descent — the distributed face of [[hnswDescend]]:
    * every query's greedy walk down the upper layers advances
    * simultaneously as Q-row DataFrame state, so a 10⁶-query batch
    * costs levels · descentHops bounded jobs TOTAL instead of that
    * many per query. The entry (smallest id of the highest non-empty
    * layer) is query-independent — one structure-bounded agg; per hop
    * ONE cur⨝edges join (cur is Q rows), candidate scoring against the
    * broadcast query table, and an argmin per query with
    * [[hnswDescend]]'s exact tie order (quantized score desc, id asc).
    * Running every hop unconditionally equals the single face's
    * early-stop loop row for row: the argmin over {cur} ∪ nbrs(cur) is
    * hop-idempotent at its fixed point (same neighbor set → same
    * argmin), AnnSpec pins batch ≡ single per qid. Returns
    * (qidCol, "entry").
    */
  def hnswDescendBatch(layers: Seq[DataFrame], vectors: DataFrame,
                       idCol: String, vecCol: String,
                       queries: DataFrame, qidCol: String, qvecCol: String,
                       fanout: Int, descentHops: Int): DataFrame = {
    require(layers.nonEmpty && descentHops >= 0,
      s"need layers and descentHops >= 0")
    val maxLevel = layers.length - 1
    val tops = descentTops(vectors, idCol, fanout, maxLevel)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val topLevel = (maxLevel to 0 by -1)
      .find(l => tops.keys.exists(_ >= l))
      .getOrElse(0)
    val entry = (topLevel to maxLevel).flatMap(tops.get).min
    val q = broadcast(queries.select(col(qidCol).as("__qid"),
        col(qvecCol).as("__qv"), V.normSafe(col(qvecCol)).as("__qn"))
      .localCheckpoint(false))
    // the walk state is Q-row bounded against corpus-sized tables —
    // broadcast the bounded side explicitly, as [[graphBeamSearchBatch]]
    def scoreCands(cand: DataFrame): DataFrame =
      broadcast(cand)
        .join(vectors.select(col(idCol).cast("long").as("__id"),
          col(vecCol).as("__v"), V.normSafe(col(vecCol)).as("__n")),
          Seq("__id"))
        .join(q, Seq("__qid"))
        .select(col("__qid"), col("__id"),
          (round(dotF(col("__v"), col("__qv")) /
            (col("__n") * col("__qn")), 6) + lit(0.0)).as("__s"))
    var cur = q.select(col("__qid"), lit(entry).as("__id"))
    for (l <- topLevel to 1 by -1; _ <- 1 to descentHops) {
      val nbrs = broadcast(cur)
        .join(layers(l).select(col("src").cast("long").as("__id"),
          col("dst").cast("long").as("__dst")), Seq("__id"))
        .select(col("__qid"), col("__dst").as("__id"))
      val cands = cur.unionByName(nbrs).distinct()
      cur = TopK.topKPerKeyAgg(scoreCands(cands), Seq(col("__qid")),
          col("__s"), col("__id"), 1)
        .select(col("__qid"), col("id").cast("long").as("__id"))
        .localCheckpoint(false) // Q-row state; cut the iterative lineage
    }
    cur.select(col("__qid").as(qidCol), col("__id").as("entry"))
  }

  /** BATCHED HNSW search — [[hnswDescendBatch]] picks every query's
    * layer-0 entry simultaneously, then ONE [[graphBeamSearchBatch]]
    * runs all beams from their per-query entries: the whole batch costs
    * levels·descentHops + 3·hops jobs regardless of query count, and
    * each beam spends its hops refining inside its own query's
    * neighborhood (the [[hnswSearch]] property, batch-scaled). Returns
    * (qidCol, rank, idCol, score).
    */
  def hnswSearchBatch(layers: Seq[DataFrame], vectors: DataFrame,
                      queries: DataFrame, idCol: String, vecCol: String,
                      qidCol: String, qvecCol: String,
                      fanout: Int, beam: Int, hops: Int,
                      descentHops: Int = 2): DataFrame = {
    val entries = hnswDescendBatch(layers, vectors, idCol, vecCol,
      queries, qidCol, qvecCol, fanout, descentHops)
    graphBeamSearchBatch(layers.head, vectors, queries, idCol, vecCol,
      qidCol, qvecCol, beam, hops, entries = Some(entries))
  }

  /** HNSW tombstone PURGE — the compaction half of soft delete (the
    * "re-linking is the next refresh's job" promise of
    * [[hnswSearchDeleted]], delivered): drop tombstoned nodes from the
    * hierarchy and re-link ONLY where the graph actually changed.
    * Edges are strictly within-cell by construction ([[knnJoin]]), so a
    * tombstone can only appear — as src or dst — inside its own cell's
    * adjacency: per level, the cells containing a tombstoned member are
    * re-linked (survivor×survivor pairs within the cell, top-k — the
    * build recipe on survivors), and every other cell's adjacency
    * passes through byte-identical.
    *
    * The semantic contract is EXACT, not approximate: the compacted
    * hierarchy equals [[hnswBuild]] run on the survivors under the same
    * centroids, level for level, edge for edge (same assignment, same
    * quantized scores, same ties — AnnSpec pins the equality), because
    * a survivor's top-k among its cell's survivors is the same set
    * whether the dead rows were removed yesterday or never existed.
    * The DuckDB oracle exploits the same identity: it replays a build
    * on the tombstone-filtered member sets.
    *
    * Cost is TOMBSTONE-LOCAL: Σ over touched cells of |cell survivors|²
    * pair scores + a k-bounded rank — never the full build's n²/C. With
    * the [[hnswAssignLevels]] sidecar the MEMBER reads partition-prune
    * to the touched cells; the touched-cell DISCOVERY itself still
    * joins the tombstone set against the whole per-level assignment
    * table — a (cell_id, id) two-column pruned scan, metadata-light but
    * corpus-row-count-sized (ids give parquet stats nothing to prune
    * on). `deltaOnly` returns only the re-linked touched-cell adjacency
    * (the refresh write set; tombstoned srcs simply have no rows — a
    * refresh writer rewrites exactly the touched range files from the
    * delta — [[graft.streaming.HnswIndex]] is that writer).
    *
    * Sidecar INVARIANT: `existingAssigned` must cover exactly
    * `existing`'s rows — after an [[hnswInsert]] the build-time sidecar
    * no longer does (the batch is missing) and a compact against it
    * would silently break the EXACT contract: inserted nodes in touched
    * cells would neither re-link nor stand as survivor candidates, and
    * their edges to tombstoned dsts would dangle. Refresh the sidecar
    * after every ingest ([[hnswAssignLevels]] on the batch is the
    * ingest's sidecar delta; [[graft.streaming.HnswIndex]] maintains it
    * transactionally); `verifySidecar` (one count on each side, on by
    * default) turns a stale sidecar into a loud error.
    */
  def hnswCompact(layers: Seq[DataFrame], existing: DataFrame,
                  tombstones: DataFrame, tombIdCol: String,
                  centroids: DataFrame, idCol: String, vecCol: String,
                  centIdCol: String, centVecCol: String,
                  k: Int, fanout: Int,
                  deltaOnly: Boolean = false,
                  existingAssigned: Seq[DataFrame] = Nil,
                  verifySidecar: Boolean = true,
                  boundedTomb: Option[DataFrame] = None): Seq[DataFrame] = {
    require(layers.nonEmpty, "layers must be non-empty")
    require(k >= 1 && fanout >= 2, s"need k >= 1, fanout >= 2; got $k, $fanout")
    require(existingAssigned.isEmpty || existingAssigned.length == layers.length,
      s"existingAssigned must carry one table per layer " +
        s"(${layers.length}), got ${existingAssigned.length}")
    if (existingAssigned.nonEmpty && verifySidecar) {
      val nSide = existingAssigned.head.count()
      val nEx = existing.count()
      require(nSide == nEx,
        s"hnswCompact: existingAssigned level-0 sidecar covers $nSide " +
          s"rows but existing has $nEx — a stale sidecar (e.g. not " +
          "refreshed after an hnswInsert) silently violates the " +
          "compact-equals-rebuild contract; re-derive it with " +
          "hnswAssignLevels or apply the ingest's sidecar delta")
    }
    val maxLevel = layers.length - 1
    val nCents = centroids.count()
    val lvl = hnswLevel(col(idCol), fanout, maxLevel)
    // `boundedTomb`: a caller that already ran [[boundedTombstones]]
    // (e.g. HnswIndex.purge, which needs the distinct set for its own
    // cell discovery) passes it through — its `__tid` column is the
    // contract — so the ceiling count job runs once per purge, not twice
    val tomb = boundedTomb.getOrElse(boundedTombstones(tombstones, tombIdCol))
    (0 to maxLevel).map { l =>
      val exM = if (l == 0) existing else existing.filter(lvl >= l)
      val m = math.max(1L,
        math.ceil(nCents / math.pow(fanout.toDouble, l.toDouble)).toLong)
      val coarse =
        if (l == 0) centroids
        else centroids.orderBy(col(centIdCol)).limit(m.toInt)
      val ae =
        if (existingAssigned.nonEmpty)
          existingAssigned(l).select(col("cell_id"),
            col(idCol).cast("long").as("__id"), col(vecCol).as("__v"),
            V.normSafe(col(vecCol)).as("__n"))
        else
          ivfAssign(exM, coarse, idCol, vecCol, centIdCol, centVecCol)
            .select(col("cell_id"), col(idCol).cast("long").as("__id"),
              col(vecCol).as("__v"), V.normSafe(col(vecCol)).as("__n"))
      // touched cells = cells holding a tombstoned level-l member; the
      // tombstone set is MaxTombstones-guarded — broadcast both hops.
      // This discovery join scans ae's (cell_id, __id) columns in full
      // (ids defeat min/max pruning); only the member read below prunes
      val tCells = ae.join(tomb, col("__id") === col("__tid"))
        .select(col("cell_id")).distinct()
      val aeT = ae.join(broadcast(tCells), Seq("cell_id"))
        .localCheckpoint(false)
      val survivors = aeT.join(tomb, col("__id") === col("__tid"),
        "left_anti")
      val a = survivors.select(col("cell_id"), col("__id").as("src"),
        col("__v").as("__ea"), col("__n").as("__na"))
      val b = survivors.select(col("cell_id"), col("__id").as("dst"),
        col("__v").as("__eb"), col("__n").as("__nb"))
      val relinked = TopK.topKPerKeyAgg(
          a.join(b, Seq("cell_id"))
            .filter(col("src") =!= col("dst"))
            .select(col("src"), col("dst"),
              (round(dotF(col("__ea"), col("__eb")) /
                (col("__na") * col("__nb")), 6) + lit(0.0)).as("score")),
          Seq(col("src")), col("score"), col("dst"), k)
        .select(col("src"), col("id").as("dst"), col("score"))
      if (deltaOnly) relinked
      else {
        val old = layers(l).select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"),
          (col("score") + lit(0.0)).as("score"))
        old.join(aeT.select(col("__id").as("src")), Seq("src"),
            "left_anti")
          .unionByName(relinked)
      }
    }
  }

  /** Tombstone-aware HNSW serving — the graph-family twin of the
    * maintained IVF table's `deleteMaintained` + tombstone-honoring
    * search (the reference's store is append-only with no delete
    * endpoint, `shard/server.py`; every production vector DB grows
    * one): SOFT delete. Tombstoned nodes stay in the edge tables as
    * ROUTING nodes — ripping them out would sever the small-world
    * shortcuts and strand whole regions until a rebuild (re-linking is
    * the next [[hnswBuild]]/refresh's job, the compaction discipline) —
    * but are filtered from the RESULTS. The filter is one broadcast
    * anti-join on the (small) tombstone set AFTER the beam, then a
    * re-rank and `k`-trim over ≤ beam rows; size `beam ≥ k + expected
    * tombstones per neighborhood` so survivors fill the page. Fully
    * deterministic (same beam, same quantized scores, filter + (score
    * desc, id asc) re-rank), so the oracle replays search + NOT IN.
    * Returns (rank, idCol, score), rank 1..≤k. NOTE the driver-side
    * re-rank emits `idCol` as LongType regardless of the input id type
    * (the non-negative-integral-id contract every graph face already
    * requires); a null score — possible only from a null stored vector
    * — ranks last rather than NPE-ing the re-rank.
    */
  def hnswSearchDeleted(layers: Seq[DataFrame], vectors: DataFrame,
                        idCol: String, vecCol: String, query: Seq[Float],
                        tombstones: DataFrame, tombIdCol: String,
                        fanout: Int, beam: Int, hops: Int, k: Int,
                        descentHops: Int = 2): DataFrame = {
    require(k >= 1 && k <= beam, s"need 1 <= k <= beam; got k=$k beam=$beam")
    val res = hnswSearch(layers, vectors, idCol, vecCol, query, fanout,
      beam, hops, descentHops)
    val t = boundedTombstones(tombstones, tombIdCol)
    // ≤ beam rows survive the anti-join — re-rank them driver-side
    // (sort + take, the graphBeamSearch k-bounded-collect discipline)
    // instead of a partition-less global Window funneling one partition
    val spark = vectors.sparkSession
    import spark.implicits._
    res.join(t, col(idCol).cast("long") === col("__tid"), "left_anti")
      .select(col(idCol).cast("long"), col("score"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) Double.NegativeInfinity else r.getDouble(1)))
      .sortBy { case (id, s) => (-s, id) }
      .take(k).toSeq.zipWithIndex
      .map { case ((id, s), r) => (r + 1, id, s) }
      .toDF("rank", idCol, "score")
  }

  /** Batched [[hnswSearchDeleted]]: ONE [[hnswSearchBatch]] for the
    * whole query table, one broadcast anti-join, per-qid re-rank +
    * k-trim (window over ≤ beam rows per qid). Returns (qidCol, rank,
    * idCol, score).
    */
  def hnswSearchBatchDeleted(layers: Seq[DataFrame], vectors: DataFrame,
                             queries: DataFrame, idCol: String,
                             vecCol: String, qidCol: String,
                             qvecCol: String, tombstones: DataFrame,
                             tombIdCol: String, fanout: Int, beam: Int,
                             hops: Int, k: Int,
                             descentHops: Int = 2): DataFrame = {
    require(k >= 1 && k <= beam, s"need 1 <= k <= beam; got k=$k beam=$beam")
    val res = hnswSearchBatch(layers, vectors, queries, idCol, vecCol,
      qidCol, qvecCol, fanout, beam, hops, descentHops)
    val t = boundedTombstones(tombstones, tombIdCol)
    res.join(t, col(idCol).cast("long") === col("__tid"), "left_anti")
      .select(col(qidCol), col(idCol), col("score"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(qidCol))
          .orderBy(col("score").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol), col("score"))
  }

  /** Persist an NSW/HNSW edge table LAYOUT-SORTED by `src`: range-
    * partitioned into `files` files, each sorted within, so every
    * parquet row group carries tight min/max `src` stats and a
    * serving-time hop filter (`src = cur` in [[hnswDescend]] /
    * [[graphBeamSearch]], `src IN frontier` in the batch faces) PRUNES
    * row groups instead of scanning the whole edge list — the on-disk
    * index property that keeps per-hop cost O(degree) at any graph
    * size. Layer i of an [[hnswBuild]] result goes to `<path>/layer_i`
    * via [[writeHnswLayers]]; read back with [[readHnswLayers]].
    */
  def writeEdges(edges: DataFrame, path: String, files: Int = 16): Unit = {
    require(files >= 1, s"files must be >= 1, got $files")
    edges.repartitionByRange(files, col("src"))
      .sortWithinPartitions("src", "dst")
      .write.mode("overwrite").parquet(path)
  }

  /** [[writeEdges]] for every layer of an [[hnswBuild]] hierarchy:
    * layer i lands at `<path>/layer_i`, src-sorted. Upper layers are
    * geometrically smaller — they land in proportionally fewer files
    * (≥ 1), keeping row groups dense enough to prune.
    */
  def writeHnswLayers(layers: Seq[DataFrame], path: String,
                      files: Int = 16): Unit =
    layers.zipWithIndex.foreach { case (l, i) =>
      writeEdges(l, s"$path/layer_$i", math.max(1, files >> i))
    }

  /** Read an [[writeHnswLayers]] hierarchy back as the layers seq the
    * search faces take. The scans inherit the written layout: a hop
    * filter pushes to parquet and prunes on the sorted `src` stats.
    */
  def readHnswLayers(spark: org.apache.spark.sql.SparkSession, path: String,
                     maxLevel: Int): Seq[DataFrame] =
    (0 to maxLevel).map(i => spark.read.parquet(s"$path/layer_$i"))

  /** The build-time assignment SIDECAR for [[hnswInsert]]: level i's
    * cell assignment of the corpus under the same coarsened centroids
    * [[hnswBuild]] uses (level-l members only, ⌈C/fanout^l⌉ lowest-id
    * cells). Persist each level partitioned by `cell_id` (upper levels
    * are geometrically smaller) and an insert's touched-cell join reads
    * ONLY the touched partitions — the n·C assignment dot products are
    * paid once at build, never per batch. Pure zero-shuffle projection
    * per level ([[ivfAssign]]); output = all `vectors` columns +
    * `cell_id`, one DataFrame per level.
    */
  def hnswAssignLevels(vectors: DataFrame, centroids: DataFrame,
                       idCol: String, vecCol: String,
                       centIdCol: String, centVecCol: String,
                       fanout: Int, maxLevel: Int): Seq[DataFrame] = {
    val lvl = hnswLevel(col(idCol), fanout, maxLevel)
    val nCents = centroids.count()
    (0 to maxLevel).map { l =>
      val members = if (l == 0) vectors else vectors.filter(lvl >= l)
      val m = math.max(1L,
        math.ceil(nCents / math.pow(fanout.toDouble, l.toDouble)).toLong)
      val coarse =
        if (l == 0) centroids
        else centroids.orderBy(col(centIdCol)).limit(m.toInt)
      ivfAssign(members, coarse, idCol, vecCol, centIdCol, centVecCol)
    }
  }

  /** INCREMENTAL HNSW ingest — append a batch of new vectors into an
    * existing [[hnswBuild]] hierarchy without rebuilding it: the
    * reference's append-only insert (`coordinator/main.py:33-44` routes,
    * `shard/server.py:60-67` appends to the served matrix) re-expressed
    * for the graph index its README aspires to
    * (`rag_demo/ingest.py:13-14`), and the graph-family sibling of the
    * maintained IVF table's `streamInsertIndexedMaintained`.
    *
    * Per level l ≤ [[hnswLevel]](id) of each new vector (same
    * derandomized geometric draw as the build — re-ingesting the same id
    * lands the same level): assign the new members to the level's coarse
    * cells (zero-shuffle in-literal argmax), score them against the
    * EXISTING members of the touched cells only, then
    *  - each new node keeps its top-k neighbors (new ∪ touched existing
    *    in its cell — a batch with internal near-dups self-links), and
    *  - each touched existing node re-ranks its stored adjacency UNION
    *    its new-node candidates back down to k (the HNSW bounded-degree
    *    repair; stored edges already carry their round-6 scores, so no
    *    old pair is ever rescored).
    * Nodes in untouched cells pass through byte-identical.
    *
    * Scale shape: cost is BATCH-proportional — |B|·|touched cell| pair
    * scores plus a k-bounded re-rank of the touched adjacency — never
    * the build's n²/C, and never a full-graph rewrite: the output
    * layers are (src, dst, score) tables whose untouched rows are the
    * input rows, so a [[writeHnswLayers]] refresh rewrites only the
    * range files whose `src` ranges intersect touched cells. At corpus
    * scale the per-level cell assignment of EXISTING members would ride
    * a persisted column written at build time (the `Dedup.signatureStore`
    * discipline); recomputing it here is the one full-corpus cost and is
    * a zero-shuffle scan projection.
    *
    * Contract: batch ids are disjoint from existing ids (the reference's
    * append-only model — no upsert; dedup first via the Dedup family).
    * ENFORCED, not doc-only: a colliding id would silently emit up to
    * 2k edges for that src (its re-ranked old adjacency AND a new-node
    * edge set — bounded degree broken with no error), so `checkDisjoint`
    * (on by default) runs one limit-1-guarded semi-join and throws
    * loudly on the first collision; disable only inside a wrapper that
    * already guarantees disjointness transactionally.
    * Determinism: every score is round-6 quantized, ranks tie
    * (score desc, id asc), level membership is the md5 draw — the whole
    * delta replays closed-form in the DuckDB oracle (`q_hnsw_insert`)
    * and is partition-count-independent (AnnSpec pins both).
    *
    * Returns the merged hierarchy, index i = level i's edge table, same
    * (src, dst, score) shape [[hnswSearch]]/[[hnswSearchBatch]] walk.
    * With `deltaOnly = true`, each level carries ONLY the rows an
    * incremental refresh writes (new nodes' edges + touched existing
    * nodes' re-ranked adjacency) — the batch-proportional working set,
    * with no pass-through scan of the untouched edge list.
    *
    * `existingAssigned` is the persisted build-time sidecar from
    * [[hnswAssignLevels]] (level i's cell assignment of the existing
    * members, all `existing` columns + `cell_id`). Without it the
    * assignment is recomputed — a zero-shuffle scan, but n·C dot
    * products that DOMINATE the insert at scale (measured at the 100×
    * profile fixture: 307 s recomputed ≈ 56% of a full rebuild, vs the
    * sidecar path where only the touched cells' members are even read —
    * store the sidecar partitioned by `cell_id` and the broadcast
    * touched-cell join prunes partitions dynamically). The two paths
    * are bit-identical (assignment is deterministic; AnnSpec pins it).
    *
    * Sidecar INVARIANT: `existingAssigned` must cover exactly
    * `existing`'s rows. After this ingest the sidecar is STALE — it is
    * missing the batch; refresh it before the next incremental op by
    * appending [[hnswAssignLevels]] run on the batch alone (that IS the
    * ingest's sidecar delta — same levels, same coarse cells), or let
    * [[graft.streaming.HnswIndex]] maintain layers + sidecar in one
    * commit. `verifySidecar` (one count each side, on by default) turns
    * a stale sidecar into a loud error instead of a silent wrong graph.
    */
  def hnswInsert(layers: Seq[DataFrame], existing: DataFrame,
                 batch: DataFrame, centroids: DataFrame,
                 idCol: String, vecCol: String,
                 centIdCol: String, centVecCol: String,
                 k: Int, fanout: Int,
                 deltaOnly: Boolean = false,
                 existingAssigned: Seq[DataFrame] = Nil,
                 checkDisjoint: Boolean = true,
                 verifySidecar: Boolean = true): Seq[DataFrame] = {
    require(layers.nonEmpty, "layers must be non-empty")
    require(k >= 1 && fanout >= 2, s"need k >= 1, fanout >= 2; got $k, $fanout")
    require(existingAssigned.isEmpty || existingAssigned.length == layers.length,
      s"existingAssigned must carry one table per layer " +
        s"(${layers.length}), got ${existingAssigned.length}")
    if (checkDisjoint) {
      // the sidecar, when present, IS existing's id set (the invariant
      // verified below) and its scan column-prunes to (id) — prefer it
      val exIds =
        (if (existingAssigned.nonEmpty) existingAssigned.head else existing)
          .select(col(idCol).cast("long").as("__id"))
      val clash = batch.select(col(idCol).cast("long").as("__id"))
        .join(exIds, Seq("__id"), "left_semi")
        .limit(1).collect()
      require(clash.isEmpty,
        s"hnswInsert: batch id ${clash.head.getLong(0)} already exists " +
          "in the hierarchy — ids are append-only (no upsert); dedup " +
          "the batch first (Dedup family) or route updates through " +
          "delete + insert")
    }
    if (existingAssigned.nonEmpty && verifySidecar) {
      val nSide = existingAssigned.head.count()
      val nEx = existing.count()
      require(nSide == nEx,
        s"hnswInsert: existingAssigned level-0 sidecar covers $nSide " +
          s"rows but existing has $nEx — a stale sidecar (e.g. not " +
          "refreshed after a previous ingest/purge) yields a silently " +
          "wrong graph; re-derive it with hnswAssignLevels or apply " +
          "the previous ingest's sidecar delta")
    }
    val maxLevel = layers.length - 1
    val nCents = centroids.count()
    val lvl = hnswLevel(col(idCol), fanout, maxLevel)
    (0 to maxLevel).map { l =>
      val newM = if (l == 0) batch else batch.filter(lvl >= l)
      val exM = if (l == 0) existing else existing.filter(lvl >= l)
      val m = math.max(1L,
        math.ceil(nCents / math.pow(fanout.toDouble, l.toDouble)).toLong)
      val coarse =
        if (l == 0) centroids
        else centroids.orderBy(col(centIdCol)).limit(m.toInt)
      def assign(df: DataFrame): DataFrame =
        ivfAssign(df, coarse, idCol, vecCol, centIdCol, centVecCol)
          .select(col("cell_id"), col(idCol).cast("long").as("__id"),
            col(vecCol).as("__v"), V.normSafe(col(vecCol)).as("__n"))
      val an = assign(newM).localCheckpoint(false) // 3 uses; assign runs once
      // the batch's cell set is ≤ C rows — broadcast-prune the existing
      // side to touched cells before any pairing. With the persisted
      // sidecar the scan reads only touched cells (DPP on a cell_id-
      // partitioned table); the fallback recomputes the assignment.
      val newCells = an.select(col("cell_id")).distinct()
      val ae =
        if (existingAssigned.nonEmpty)
          existingAssigned(l).select(col("cell_id"),
            col(idCol).cast("long").as("__id"), col(vecCol).as("__v"),
            V.normSafe(col(vecCol)).as("__n"))
        else assign(exM)
      val aeT = ae.join(broadcast(newCells), Seq("cell_id"))
        .localCheckpoint(false)
      def score(a: DataFrame, b: DataFrame): DataFrame =
        a.select(col("cell_id"), col("__id").as("src"),
            col("__v").as("__ea"), col("__n").as("__na"))
          .join(b.select(col("cell_id"), col("__id").as("dst"),
            col("__v").as("__eb"), col("__n").as("__nb")), Seq("cell_id"))
          .filter(col("src") =!= col("dst"))
          .select(col("src"), col("dst"),
            (round(dotF(col("__ea"), col("__eb")) /
              (col("__na") * col("__nb")), 6) + lit(0.0)).as("score"))
      def rankK(pairs: DataFrame): DataFrame =
        TopK.topKPerKeyAgg(pairs, Seq(col("src")), col("score"),
            col("dst"), k)
          .select(col("src"), col("id").as("dst"), col("score"))
      val old = layers(l).select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"),
        (col("score") + lit(0.0)).as("score"))
      val touched = aeT.select(col("__id").as("src"))
      val newEdges = rankK(score(an, an.unionByName(aeT)))
      val reRanked = rankK(old.join(touched, Seq("src"))
        .unionByName(score(aeT, an)))
      val delta = reRanked.unionByName(newEdges)
      if (deltaOnly) delta
      else old.join(touched, Seq("src"), "left_anti").unionByName(delta)
    }
  }

  /** Rank-aware quality evaluation — nDCG@k and MRR beside
    * [[recallAtK]]'s set-overlap (recall treats rank 1 and rank k the
    * same; nDCG/MRR grade WHERE the true neighbors land): binary
    * relevance (membership in the exact top-k), discount 1/log₂(r+1).
    * `approx` must carry a `score` column (the `searchBatchIvf` shape);
    * ranks derive from (score desc, id asc) within each query.
    *
    * Determinism: per-rank discounts quantize to integer micro-units
    * (round(10⁶·ln2/ln(r+1)) — the round-6 idf precedent), so the
    * per-query DCG/IDCG are exact integer sums in both engines and
    * nDCG is one final division. A query with no hits scores
    * ndcg = mrr = 0. Same join-problem shape as recallAtK — no driver
    * loop at any query count. Returns (qidCol, n_exact, n_hit, ndcg,
    * mrr), rounded to 6.
    */
  def rankQualityAtK(exact: DataFrame, approx: DataFrame,
                     qidCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val qid = col(qidCol)
    def discM(r: Column): Column =
      round(lit(1000000.0) * log(lit(2.0)) / log(r.cast("double") + lit(1.0)))
        .cast("long")
    val w = Window.partitionBy(qid).orderBy(col("score").desc, col(idCol))
    val ranked = approx.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .select(qid, col(idCol), col("__r"))
    val perQ = ranked
      .join(exact.select(qid, col(idCol)), Seq(qidCol, idCol), "left_semi")
      .groupBy(qid)
      .agg(count(lit(1)).as("__nh"), sum(discM(col("__r"))).as("__dcgm"),
        min(col("__r")).as("__minr"))
    val ne = exact.groupBy(qid).agg(count(lit(1)).as("n_exact"))
      .select(qid, col("n_exact"),
        aggregate(sequence(lit(1), least(col("n_exact"), lit(k)).cast("int")),
          lit(0L), (acc, i) => acc + discM(i)).as("__idcgm"))
    ne.join(perQ, Seq(qidCol), "left")
      .select(qid, col("n_exact"),
        coalesce(col("__nh"), lit(0L)).as("n_hit"),
        (round(coalesce(col("__dcgm"), lit(0L)).cast("double") /
          col("__idcgm").cast("double"), 6) + lit(0.0)).as("ndcg"),
        (round(coalesce(lit(1.0) / col("__minr").cast("double"), lit(0.0)), 6)
          + lit(0.0)).as("mrr"))
  }

  /** Persist an assigned vector table as an on-disk IVF index: one
    * directory per cell. A probe then reads ONLY the probed cells'
    * files via partition pruning — the disk-backed equivalent of "scan
    * only the cells the query probes" (AnnSpec asserts PartitionFilters
    * in the probe plan).
    */
  def writeIvfIndex(assigned: DataFrame, path: String): Unit =
    graft.sources.Layout.writePartitioned(assigned, path, "cell_id")

  /** Scan only the given cells of an on-disk IVF index. */
  def readIvfCells(spark: org.apache.spark.sql.SparkSession, path: String,
                   cells: Seq[Long]): DataFrame =
    graft.sources.Layout.readPartitions(spark, path, "cell_id", cells)

  /** End-to-end IVF search: assign → probe → scan only probed cells →
    * top-k. `nProbes` trades recall for scan fraction (nProbes = #cells
    * is exact search). Returns (id, score) rows, score desc.
    */
  def search(vectors: DataFrame, centroids: DataFrame, idCol: String,
             vecCol: String, centIdCol: String, centVecCol: String,
             query: Seq[Float], nProbes: Int, k: Int): DataFrame = {
    val assigned = ivfAssign(vectors, centroids, idCol, vecCol, centIdCol, centVecCol)
    val probes = probeCellIds(centroids, query, centIdCol, centVecCol, nProbes)
    val cand = assigned.filter(col("cell_id").isin(probes: _*))
      .withColumn("__nv", greatest(sqrt(dotF(col(vecCol), col(vecCol))), lit(V.NormEps)))
    val qn = math.max(math.sqrt(query.map(x => x.toDouble * x).sum), V.NormEps)
    val scored = cand.withColumn("score",
      dotF(col(vecCol), typedLit(query)) / (col("__nv") * lit(qn)))
    TopK.topK(scored, col("score"), col(idCol), k)
      .select(col(idCol).as("id"), col("score"))
  }

  /** Recommend-by-examples (the vector-DB "recommend" surface: Qdrant
    * recommend, Weaviate near-object with negatives) via Rocchio
    * relevance feedback (SMART, 1971): the synthetic query is
    * q_j = round(β·mean(pos)_j − γ·mean(neg)_j, 6), the example rows
    * themselves are excluded, and the corpus is ranked by cosine
    * against q. `posIds` must be non-empty; an empty `negIds` drops
    * the subtrahend; `pred` optionally restricts the searched rows
    * (filtered recommend).
    *
    * Determinism across engines: per-dimension example means are exact
    * integer reductions — each element quantizes to micro-units
    * (×1e6, round, long) before summing, the float-sum ordering problem
    * never arises, and the single divide + round-6 happens once per
    * dimension. The example pull is tiny by contract (a handful of ids,
    * `IN` pushed to the scan; `dim` rows reach the driver), the scan is
    * the proven broadcast-literal cosine shape, and top-k is the
    * per-partition-heap merge — nothing here grows with the corpus
    * except the one scored scan.
    */
  def recommend(vectors: DataFrame, idCol: String, vecCol: String,
                posIds: Seq[Long], negIds: Seq[Long], k: Int,
                beta: Double = 1.0, gamma: Double = 1.0,
                pred: Column = lit(true)): DataFrame = {
    require(posIds.nonEmpty, "recommend needs at least one positive example")
    // per-dimension micro-unit sums over an example set: dim rows back
    def microSums(ids: Seq[Long]): Map[Int, Long] = vectors
      .filter(col(idCol).isInCollection(ids))
      .select(posexplode(col(vecCol)).as(Seq("__pos", "__x")))
      .groupBy(col("__pos"))
      .agg(sum(round(col("__x").cast("double") * lit(1000000.0), 0)
        .cast("long")).as("__s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val dim = vectors.select(size(col(vecCol))).head.getInt(0)
    val ps = microSums(posIds)
    val ns = if (negIds.isEmpty) Map.empty[Int, Long] else microSums(negIds)
    val q: Seq[Double] = (0 until dim).map { j =>
      val p = beta * (ps.getOrElse(j, 0L).toDouble / (posIds.size * 1e6))
      val n = if (negIds.isEmpty) 0.0
              else gamma * (ns.getOrElse(j, 0L).toDouble / (negIds.size * 1e6))
      java.math.BigDecimal.valueOf(p - n)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0
    }
    val excluded = posIds ++ negIds
    val scored = vectors
      .filter(pred && !col(idCol).isInCollection(excluded))
      .withColumn("score",
        round(V.cosine(col(vecCol), typedLit(q)), 6) + lit(0.0))
    TopK.topK(scored, col("score"), col(idCol), k)
      .select(col(idCol).as("id"), col("score"))
  }

  /** Metadata-FILTERED top-k — the vector-DB "filtered search" every
    * production deployment needs (search only `lang = 'en'`, only one
    * tenant, only docs after a date). Returns the top `k` rows of
    * `vectors` SATISFYING `pred` by cosine against `query`, plus a
    * `path` column naming the physical strategy taken.
    *
    * Two physical paths, chosen by predicate selectivity:
    *
    *  - `pre`  (exact): scan only the rows matching `pred` and score
    *    them all. Cost ∝ sel·N; recall 1.0 by construction. Right when
    *    the filter is NARROW — scanning the few survivors beats probing.
    *  - `post` (IVF): probe the query's `nProbes` nearest cells, apply
    *    `pred` to the probed candidates, top-k the survivors. Cost ∝
    *    (nProbes/C)·N regardless of selectivity; recall bounded by the
    *    probe like any IVF search. Right when the filter is BROAD — a
    *    50% filter would make the pre path scan half the corpus.
    *
    * The switch is the cost crossover: `pre` iff sel ≤ nProbes/C (the
    * filtered scan touches no more rows than the probed cells would,
    * and it is exact, so ties go to `pre`). Selectivity comes from one
    * aggregate-only scan (two longs reach the driver — no row data);
    * callers holding catalog stats or a maintained count rollup pass
    * `knownSelectivity` and skip even that. The decision is therefore
    * deterministic and engine-replicable — the oracle fixes the same
    * predicate and takes the same branch at every scale factor.
    *
    * Scale shape: `pre` is scan + TakeOrderedAndProject (k rows per
    * partition to the driver); `post` is the [[search]] plan with one
    * extra pushed predicate — against an on-disk IVF layout the cell
    * filter is partition pruning and `pred` prunes further via parquet
    * row-group stats. Neither path shuffles anything but the k winners.
    * A 1000-executor run differs only in partition count.
    *
    * The starvation case is inherent to `post`: a narrow filter inside
    * probed cells can leave fewer than k survivors (fewer rows come
    * back). That is exactly the regime the switch routes to `pre`, which
    * cannot starve. Ref: flat scan `shard/fallback_numpy_index.py:28-32`
    * — the reference has no filter support at all; SURVEY §2.2.
    */
  def searchFiltered(vectors: DataFrame, centroids: DataFrame, idCol: String,
                     vecCol: String, centIdCol: String, centVecCol: String,
                     query: Seq[Float], k: Int, pred: Column, nProbes: Int,
                     knownSelectivity: Option[Double] = None): DataFrame = {
    require(k >= 1 && nProbes >= 1, s"need k, nProbes >= 1; got $k, $nProbes")
    val numCells = centroids.count()
    require(numCells >= 1, "centroids must be non-empty")
    val sel = knownSelectivity.getOrElse {
      val r = vectors.agg(count(lit(1)).as("n"),
        count(when(pred, lit(1))).as("m")).head
      if (r.getLong(0) == 0L) 0.0 else r.getLong(1).toDouble / r.getLong(0)
    }
    require(sel >= 0.0 && sel <= 1.0, s"selectivity must be in [0,1], got $sel")
    val qn = {
      var s = 0.0
      query.foreach(x => s += x.toDouble * x.toDouble)
      math.max(math.sqrt(s), V.NormEps)
    }
    def scoreCol: Column =
      round(dotF(col(vecCol), typedLit(query)) /
        (greatest(sqrt(dotF(col(vecCol), col(vecCol))), lit(V.NormEps)) *
          lit(qn)), 6) + lit(0.0)
    if (sel <= nProbes.toDouble / numCells) {
      val scored = vectors.filter(pred).withColumn("score", scoreCol)
      TopK.topK(scored, col("score"), col(idCol), k)
        .select(col(idCol), col("score"), lit("pre").as("path"))
    } else {
      val assigned = ivfAssign(vectors, centroids, idCol, vecCol,
        centIdCol, centVecCol)
      val probes = probeCellIds(centroids, query, centIdCol, centVecCol, nProbes)
      val cand = assigned.filter(col("cell_id").isin(probes: _*)).filter(pred)
        .withColumn("score", scoreCol)
      TopK.topK(cand, col("score"), col(idCol), k)
        .select(col(idCol), col("score"), lit("post").as("path"))
    }
  }

  /** Probe AUTO-TUNING: the recall-vs-cost sweep behind the one
    * operational question every IVF deployment answers — "how many
    * probes do I need for recall ≥ X?". Runs [[searchBatchIvf]] at
    * doubling probe counts (1, 2, 4, …, C — the log₂C grid that brackets
    * the knee), scores each against the EXACT side (nProbes = C), and
    * marks the cheapest count meeting `targetRecall`.
    *
    * Recall is the MICRO-average — total hits over total exact results
    * across the query set (two exact long counts per probe level, one
    * division) — not a mean of per-query ratios, so the number is an
    * integer-exact cross-engine comparison and heavy queries weigh what
    * they cost. Output: one row per swept count — (n_probes, n_hit,
    * n_exact, recall, meets, chosen) — `chosen` marks the smallest
    * meeting count (none meeting → C, exact search, which always meets
    * by construction).
    *
    * Scale shape: ONE corpus scoring pass serves every level — each
    * scored (query, row) pair carries its cell's per-query probe RANK,
    * explodes to the grid levels that would include it (≤ log₂C
    * copies), and reduces through the k-bounded per-(query, level)
    * aggregator, so the exchange carries ≤ partitions × Q × levels × k
    * entries and nothing is scanned twice. At a 10⁶-query tuning set
    * the whole sweep is one scan + one bounded reduction + one overlap
    * join; the driver holds 3 longs per level.
    */
  def probeRecallSweep(vectors: DataFrame, centroids: DataFrame,
                       idCol: String, vecCol: String, centIdCol: String,
                       centVecCol: String, queries: DataFrame,
                       qidCol: String, qvecCol: String, k: Int,
                       targetRecall: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"targetRecall must be in (0, 1], got $targetRecall")
    val spark = vectors.sparkSession
    import spark.implicits._
    val c = centroids.count().toInt
    require(c >= 1, "centroids must be non-empty")
    val grid = (Iterator.iterate(1)(_ * 2).takeWhile(_ < c).toSeq :+ c).distinct
    val gridLit = typedLit(grid)
    val assigned = ivfAssign(vectors, centroids, idCol, vecCol,
      centIdCol, centVecCol)
    // per-(query, cell) probe rank — the searchBatchIvf ranking, kept
    // for ALL cells so one join scores every level's candidate set
    val pw = Window.partitionBy(col("__qid"))
      .orderBy(col("__c").desc, col(centIdCol))
    val cellRanks = centroids
      .crossJoin(broadcast(queries.select(
        col(qidCol).as("__qid"), col(qvecCol).as("__qv"))))
      .withColumn("__c", round(V.cosine(col(centVecCol), col("__qv")), 6))
      .withColumn("__rn", row_number().over(pw))
      .select(col("__qid"), col("__qv"), col("__rn"),
        col(centIdCol).cast("long").as("cell_id"))
    val scored = assigned.join(broadcast(cellRanks), Seq("cell_id"))
      .withColumn("__score",
        round(dotF(col(vecCol), col("__qv")) /
          (greatest(sqrt(dotF(col(vecCol), col(vecCol))), lit(V.NormEps)) *
            greatest(sqrt(dotF(col("__qv"), col("__qv"))), lit(V.NormEps))),
          6) + lit(0.0))
      // a pair whose cell ranks __rn participates in every level ≥ __rn
      .select(col("__qid"), col(idCol), col("__score"),
        explode(filter(gridLit, p => p >= col("__rn"))).as("__lvl"))
    val hits = TopK.topKPerKeyAgg(scored,
        Seq(col("__qid"), col("__lvl")), col("__score"), col(idCol), k)
      .select(col("__qid"), col("__lvl"), col("id"))
      .localCheckpoint(true)
    val exact = hits.filter(col("__lvl") === c).select(col("__qid"), col("id"))
    val nExact = exact.count()
    val hitCounts: Map[Int, Long] = hits
      .join(exact, Seq("__qid", "id"), "left_semi")
      .groupBy(col("__lvl")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val levels: Seq[(Int, Long, Long)] =
      grid.map(p => (p, hitCounts.getOrElse(p, 0L), nExact))
    // the meets/chosen decision is made on the ROUNDED recall — the same
    // value the output column carries — so a knife-edge ratio can't make
    // the driver-side choice disagree with the visible numbers
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val chosenP = levels
      .filter { case (_, h, e) => e == 0L || r6(h.toDouble / e) >= targetRecall }
      .map(_._1).minOption.getOrElse(c)
    levels.toDF("n_probes", "n_hit", "n_exact")
      .withColumn("recall",
        round(when(col("n_exact") === 0L, lit(1.0))
          .otherwise(col("n_hit").cast("double") / col("n_exact")), 6) + lit(0.0))
      .withColumn("meets", (col("recall") >= targetRecall).cast("int"))
      .withColumn("chosen", (col("n_probes") === chosenP).cast("int"))
  }

  /** Per-cell SIMPLIFIED SILHOUETTE — the clustering-quality metric for
    * an IVF index (Hruschka et al.'s centroid-based silhouette: a(i) =
    * cosine distance to the OWN centroid, b(i) = distance to the nearest
    * OTHER centroid, s(i) = (b−a)/max(a,b) ∈ [−1, 1]). Near 1: the cell
    * is tight and well-separated (probe-pruning is effective); near 0:
    * rows sit on cell boundaries (probes must widen to hold recall);
    * negative: rows are closer to another centroid than their own — the
    * assignment is stale and [[rebalanceIvf]] / [[kmeansTrain]] is due.
    * The full-silhouette's O(n²) pairwise distances collapse to n×C
    * centroid distances — the only formulation that exists at corpus
    * scale.
    *
    * With `assignCol = None` the own cell is the fresh argmax (the
    * [[ivfAssign]] rule), so a ≤ b and s ∈ [0, 1] by construction —
    * this grades the PARTITION GEOMETRY (how separable the cells are).
    * With `assignCol = Some(c)` the own cell is the STORED assignment
    * in column `c` — the drift diagnostic for a maintained index whose
    * centroids moved after rows were filed: rows now closer to another
    * centroid score NEGATIVE, and a cell's mean_s sinking below 0 is
    * the re-file signal ([[rebalanceIvf]]).
    *
    * Output: one row per cell — (cell_id, n, mean_a, mean_s), means
    * rounded to 6. Scale shape: one per-row PROJECTION over in-literal
    * centroids (the [[ivfAssign]] shape — no join, no window), then one
    * C-bounded aggregation; per-row s quantizes to integer MICRO-UNITS
    * before summing so the mean is an exact long sum — order-independent
    * across partitionings, bit-replicated by the DuckDB oracle.
    * Requires ≥ 2 centroids (b is undefined otherwise); a stored
    * assignment pointing at a dropped centroid throws (null own score).
    */
  def silhouetteSimplified(vectors: DataFrame, centroids: DataFrame,
                           idCol: String, vecCol: String, centIdCol: String,
                           centVecCol: String,
                           assignCol: Option[String] = None): DataFrame = {
    val cents: Seq[(Long, Seq[Float], Double)] = centroids
      .select(col(centIdCol).cast("long"), col(centVecCol))
      .limit(MaxInlineCentroids + 1) // bound the pull BEFORE collecting
      .collect().toSeq
      .map { r =>
        val cvec = r.getSeq[Float](1)
        var n2 = 0.0
        cvec.foreach(x => n2 += x.toDouble * x.toDouble)
        (r.getLong(0), cvec, math.max(math.sqrt(n2), V.NormEps))
      }
      .sortBy(_._1)
    require(cents.length >= 2,
      s"silhouette needs >= 2 centroids, got ${cents.length}")
    require(cents.length <= MaxInlineCentroids,
      s"silhouetteSimplified centroid table exceeds MaxInlineCentroids " +
        s"= $MaxInlineCentroids (the per-row argmax embeds C literal " +
        "structs) — grade a coarser level of the hierarchy instead")
    val vn = greatest(sqrt(dotF(col(vecCol), col(vecCol))), lit(V.NormEps))
    val perCent = cents.map { case (cid, cvec, cn) =>
      struct(
        round(dotF(col(vecCol), typedLit(cvec)) / (vn * lit(cn)), 6).as("score"),
        lit(-cid).as("negid"))
    }
    val arr = array(perCent: _*)
    val (cellId, ownScore) = assignCol match {
      case None =>
        val own = array_max(arr)
        (-own.getField("negid"), own.getField("score"))
      case Some(c) =>
        val scoreByCell = map_from_arrays(
          typedLit(cents.map(_._1)),
          array(perCent.map(_.getField("score")): _*))
        val looked = element_at(scoreByCell, col(c).cast("long"))
        (col(c).cast("long"),
          when(looked.isNull, raise_error(concat(
            lit("stored assignment points at a dropped centroid: cell "),
            col(c).cast("string")))).otherwise(looked))
    }
    val other = array_max(filter(arr,
      x => x.getField("negid") =!= -cellId))
    val a = lit(1.0) - ownScore
    val b = lit(1.0) - other.getField("score")
    val s = when(greatest(a, b) <= 0.0, lit(0.0))
      .otherwise(round((b - a) / greatest(a, b), 6))
    vectors
      .withColumn("cell_id", cellId)
      .withColumn("__a6", round(a * 1e6, 0).cast("long"))
      .withColumn("__s6", round(s * 1e6, 0).cast("long"))
      .groupBy(col("cell_id"))
      .agg(count(lit(1)).as("n"),
        (round(sum(col("__a6")).cast("double") / 1e6 /
          count(lit(1)).cast("double"), 6) + lit(0.0)).as("mean_a"),
        (round(sum(col("__s6")).cast("double") / 1e6 /
          count(lit(1)).cast("double"), 6) + lit(0.0)).as("mean_s"))
  }

  /** NAMESPACED batch search — the multi-tenant shape (Pinecone
    * "namespaces", Milvus "partitions"): every query carries a namespace
    * key and must only ever see vectors in that namespace. One job for
    * the whole query table.
    *
    * The namespace constraint is expressed as an EQUI-JOIN key next to
    * the probed cell id, not a post-hoc filter: candidates are exactly
    * `rows in the query's namespace ∩ the query's probed cells`, so a
    * tenant's query does zero work on other tenants' rows, and isolation
    * is structural — no predicate to forget, nothing to leak. Against an
    * on-disk layout partitioned by (namespace, cell) the join becomes
    * partition pruning: a 1000-tenant corpus serves each tenant's query
    * from its own directories.
    *
    * Scale shape: same as [[searchBatchIvf]] — broadcast centroid×query
    * probe ranking, ONE broadcast join routing corpus rows to the
    * queries probing their (namespace, cell), codegen dot scoring, and a
    * k-bounded per-query reduction ([[TopK.topKPerKeyAgg]] — partial
    * k-heaps before the exchange, never a full sort). Corpus-side cost:
    * one scan + one scoring pass over the probed fraction of each
    * queried namespace, at any batch size.
    */
  def searchNamespacedBatch(vectors: DataFrame, centroids: DataFrame,
                            idCol: String, vecCol: String, nsCol: String,
                            centIdCol: String, centVecCol: String,
                            queries: DataFrame, qidCol: String,
                            qvecCol: String, qnsCol: String,
                            nProbes: Int, k: Int): DataFrame = {
    require(nProbes >= 1 && k >= 1, s"need nProbes, k >= 1; got $nProbes, $k")
    import org.apache.spark.sql.expressions.Window
    val assigned = ivfAssign(vectors, centroids, idCol, vecCol,
      centIdCol, centVecCol)
    val pw = Window.partitionBy(col(qidCol))
      .orderBy(col("__c").desc, col(centIdCol))
    val probes = centroids
      .crossJoin(broadcast(
        queries.select(col(qidCol), col(qvecCol), col(qnsCol).as("__qns"))))
      .withColumn("__c", round(V.cosine(col(centVecCol), col(qvecCol)), 6))
      .withColumn("__rn", row_number().over(pw))
      .filter(col("__rn") <= nProbes)
      .select(col(qidCol), col(qvecCol), col("__qns"),
        col(centIdCol).as("cell_id"))
    val scored = assigned.join(broadcast(probes),
        col(nsCol) === col("__qns") && assigned("cell_id") === probes("cell_id"))
      .withColumn("score",
        round(dotF(col(vecCol), col(qvecCol)) /
          (greatest(sqrt(dotF(col(vecCol), col(vecCol))), lit(V.NormEps)) *
            greatest(sqrt(dotF(col(qvecCol), col(qvecCol))), lit(V.NormEps))),
          6) + lit(0.0))
    TopK.topKPerKeyAgg(scored, Seq(col(qidCol)), col("score"), col(idCol), k)
      .select(col(qidCol), col("id").as(idCol), col("score"))
  }

  /** End-to-end IVF-PQ search (the FAISS IVFPQ composition, Jégou et al.
    * 2011): IVF cell routing prunes the scan to `nProbes` cells, PQ codes
    * + a per-query ADC lookup table replace full-precision scoring inside
    * the probed cells. Returns (idCol, score) rows, score desc.
    *
    * Scale shape: both halves are per-row projections over in-literal
    * small tables (centroids, codebooks, LUT) — the only data movement is
    * the final bounded top-k. Against an on-disk index
    * (`writeIvfIndex` of the assigned+encoded table) the cell filter
    * becomes partition pruning and the scan reads codes, not vectors —
    * `m` bytes per row instead of 4·dim.
    */
  def searchIvfPq(vectors: DataFrame, centroids: DataFrame, idCol: String,
                  vecCol: String, centIdCol: String, centVecCol: String,
                  codebooks: Seq[Seq[Float]], m: Int,
                  query: Seq[Float], nProbes: Int, k: Int): DataFrame = {
    val assigned = ivfAssign(vectors, centroids, idCol, vecCol, centIdCol, centVecCol)
    val probes = probeCellIds(centroids, query, centIdCol, centVecCol, nProbes)
    val lut = pqLut(query, codebooks, m)
    val cand = assigned.filter(col("cell_id").isin(probes: _*))
      .withColumn("__codes", pqEncode(col(vecCol), codebooks, m))
      .withColumn("score", pqAdcScore(col("__codes"), lut))
    TopK.topK(cand, col("score"), col(idCol), k)
      .select(col(idCol), col("score"))
  }

  /** The `nProbes` nearest centroids to a single-row query DataFrame whose
    * one column is the query vector. Same quantized ordering as
    * `ivfAssign`.
    */
  def probeCells(centroids: DataFrame, queryDf: DataFrame,
                 centIdCol: String, centVecCol: String, nProbes: Int): DataFrame = {
    val qCol = col(queryDf.columns.head)
    centroids.crossJoin(broadcast(queryDf))
      .withColumn("__c", round(V.cosine(col(centVecCol), qCol), 6))
      .orderBy(col("__c").desc, col(centIdCol).asc)
      .limit(nProbes)
      .select(col(centIdCol).as("cell_id"))
  }

  /** Driver-side probe selection: the centroid table is broadcast-small
    * by contract, so ranking `nProbes` cells for one query needs no Spark
    * job at all — the scan-side plan is then a plain `isin` filter on
    * `cell_id` (partition-prunable against an on-disk IVF index).
    * Arithmetic is bit-identical to `probeCells`: sequential double
    * summation (the codegen dot order) and HALF_UP rounding to 6 decimals
    * (Spark's `round`), ordered (score desc, cent_id asc).
    */
  def probeCellIds(centroids: DataFrame, query: Seq[Float],
                   centIdCol: String, centVecCol: String,
                   nProbes: Int): Seq[Long] = {
    val qn = {
      var s = 0.0
      query.foreach(x => s += x.toDouble * x.toDouble)
      math.max(math.sqrt(s), V.NormEps)
    }
    centroids.select(col(centIdCol).cast("long"), col(centVecCol))
      .collect().toSeq
      .map { r =>
        val cvec = r.getSeq[Float](1)
        var dp = 0.0
        var n2 = 0.0
        var i = 0
        val m = math.min(cvec.length, query.length)
        while (i < m) {
          dp += cvec(i).toDouble * query(i).toDouble
          n2 += cvec(i).toDouble * cvec(i).toDouble
          i += 1
        }
        val cn = math.max(math.sqrt(n2), V.NormEps)
        // java BigDecimal.valueOf (canonical string repr) + HALF_UP is
        // exactly Spark's Round-on-double; the raw-binary constructor
        // can round knife-edge values differently
        val c = java.math.BigDecimal.valueOf(dp / (cn * qn))
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        (r.getLong(0), c)
      }
      .sortBy { case (cid, c) => (-c, cid) }
      .take(nProbes)
      .map(_._1)
  }

  // ---------- Product quantization (PQ) ----------
  //
  // The memory-compression half of IVF-PQ: each vector is split into m
  // subvectors; each subvector is replaced by the index of its nearest
  // codebook entry (here ksub = |codebooks| full-dim rows sliced per
  // subspace). A 64-dim float32 vector becomes m = 8 int8-sized codes —
  // 32× smaller — and query scoring reads a per-query lookup table
  // instead of the raw floats (asymmetric distance computation, ADC;
  // Jégou et al. 2011). Codebooks here derive deterministically from the
  // first ksub stored vectors so the DuckDB oracle replicates encode +
  // ADC bit-for-bit (q_ann_pq); k-means-trained codebooks drop in at no
  // API change (AnnSpec measures the recall).

  /** PQ codes (ARRAY<INT>, one code per subspace): per subspace, the
    * index of the codebook row minimizing the QUANTIZED (6-decimal)
    * squared L2 distance over that slice, ties to the lowest index.
    * Pure per-row projection over in-literal codebooks — no shuffle at
    * any corpus size. Native single-pass kernel
    * (`expressions.PqEncode`); `pqEncodeHof` below is the declarative
    * spec, agreement-tested in AnnSpec.
    */
  def pqEncode(vec: Column, codebooks: Seq[Seq[Float]], m: Int): Column =
    graft.expressions.PqExpression.pqEncodeF(vec, codebooks, m)

  /** Declarative HOF spec for `pqEncode` — O(m·ksub·dsub) interpreted
    * lambda evals per row; never use on the hot path.
    */
  def pqEncodeHof(vec: Column, codebooks: Seq[Seq[Float]], m: Int): Column = {
    require(codebooks.nonEmpty && codebooks.head.length % m == 0)
    val dsub = codebooks.head.length / m
    val cb = typedLit(codebooks)
    transform(sequence(lit(0), lit(m - 1)), mi => {
      val dists = transform(cb, cand =>
        round(aggregate(sequence(lit(1), lit(dsub)), lit(0.0), (acc, j) => {
          val idx = (mi * dsub + j).cast("int")
          val dxy = element_at(vec, idx).cast("double") -
            element_at(cand, idx).cast("double")
          acc + dxy * dxy
        }), 6))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    })
  }

  /** PQ DISTORTION SWEEP — the codebook-fit report behind the "which m
    * do I ship?" decision: for each subspace count in `ms`, the mean
    * per-row quantization error. The error reuses the encode arithmetic
    * itself: the argmin subvector distance IS the subspace's squared
    * reconstruction error, so per-row distortion = Σ_mi min_cand
    * ‖sub − cand‖² — no separate reconstruction pass. Each subspace
    * minimum is quantized (round 6 → integer micro-units) before
    * summing, so row distortions are exact longs and the corpus means
    * replicate bit-exactly in the oracle.
    *
    * Output: one row per m — (m, n, mean_sqerr), mean rounded 6; more
    * subspaces → finer quantization → lower distortion, and the curve
    * against m (= code bytes per vector) is the storage/accuracy
    * trade-off. Scale shape: ONE scan computing all levels as parallel
    * projection columns, one all-rows aggregation carrying |ms| longs;
    * the driver holds |ms| sums. Interpreted HOF arithmetic — an
    * offline report, not a serving path (the serving encode is the
    * codegen [[pqEncode]]).
    */
  def pqDistortionSweep(vectors: DataFrame, vecCol: String,
                        codebooks: Seq[Seq[Float]],
                        ms: Seq[Int]): DataFrame = {
    require(ms.nonEmpty && codebooks.nonEmpty)
    val dim = codebooks.head.length
    ms.foreach(m => require(m >= 1 && dim % m == 0,
      s"m=$m must divide the vector dim $dim"))
    val spark = vectors.sparkSession
    import spark.implicits._
    val cb = typedLit(codebooks)
    def distortion(m: Int): Column = {
      val dsub = dim / m
      aggregate(sequence(lit(0), lit(m - 1)), lit(0L), (acc, mi) => {
        val dists = transform(cb, cand =>
          round(aggregate(sequence(lit(1), lit(dsub)), lit(0.0), (a2, j) => {
            val idx = (mi * dsub + j).cast("int")
            val dxy = element_at(col(vecCol), idx).cast("double") -
              element_at(cand, idx).cast("double")
            a2 + dxy * dxy
          }), 6))
        acc + round(array_min(dists) * 1e6, 0).cast("long")
      })
    }
    val projected = ms.zipWithIndex.foldLeft(vectors) { case (d, (m, i)) =>
      d.withColumn(s"__d$i", distortion(m))
    }
    val aggd = projected.agg(
      count(lit(1)).as("n"),
      ms.indices.map(i => sum(col(s"__d$i")).as(s"__s$i")): _*).head
    val n = aggd.getLong(0)
    ms.zipWithIndex.map { case (m, i) =>
      val mean =
        if (n == 0L) 0.0
        else java.math.BigDecimal.valueOf(aggd.getLong(i + 1).toDouble / 1e6 / n)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      (m, n, mean + 0.0)
    }.toDF("m", "n", "mean_sqerr")
  }

  /** Per-query ADC lookup table in integer MICRO-UNITS:
    * lut(mi)(c) = round(dot(querySub_mi, codebook(c)_mi), 6) · 10⁶ —
    * quantized so the per-row score sum is exact integer arithmetic
    * (order-proof across engines). Driver-side: the LUT is m × ksub
    * longs per query, broadcast as a literal.
    */
  def pqLut(query: Seq[Float], codebooks: Seq[Seq[Float]], m: Int): Seq[Seq[Long]] = {
    val dsub = query.length / m
    (0 until m).map { mi =>
      codebooks.map { cand =>
        var s = 0.0
        var j = 0
        while (j < dsub) {
          s += query(mi * dsub + j).toDouble * cand(mi * dsub + j).toDouble
          j += 1
        }
        val r6 = java.math.BigDecimal.valueOf(s)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        math.round(r6 * 1000000.0)
      }.toSeq
    }
  }

  /** ADC score: sum the LUT entries the vector's codes select, one per
    * subspace — integer adds, one final division, rounded to 4.
    */
  def pqAdcScore(codes: Column, lut: Seq[Seq[Long]]): Column = {
    val l = typedLit(lut)
    round(
      aggregate(sequence(lit(0), lit(lut.length - 1)), lit(0L), (acc, mi) =>
        acc + element_at(element_at(l, mi + 1),
          element_at(codes, mi + 1) + 1))
        .cast("double") / 1000000.0, 4) + lit(0.0)
  }

  // ---------- Scalar quantization (SQ8) ----------
  //
  // The simplest vector-compression tier (FAISS ScalarQuantizer QT_8bit):
  // per dimension, the corpus [min, max] range is split into 256 equal
  // steps and each float becomes one byte — 4× smaller than float32 with
  // near-lossless recall at high dim. Training is a single min/max
  // aggregate; encode is a pure per-row projection; query scoring
  // dequantizes the code (midpoint reconstruction, m + (c+0.5)·Δ) against
  // the RAW query vector (asymmetric, like ADC). Sits between the exact
  // flat scan and PQ's 32× compression in the accuracy/memory trade.

  /** Per-dimension (min, max) over the corpus. posexplode is in-partition;
    * groupBy(pos) partially aggregates map-side, so the shuffle carries
    * only dim × numPartitions (pos, min, max) rows at ANY corpus size.
    * Returns dim-ordered driver arrays (dim doubles — a literal, like
    * centroids and PQ codebooks).
    */
  def sqTrain(vectors: DataFrame, vecCol: String): (Seq[Double], Seq[Double]) = {
    val mm = vectors
      .select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v").cast("double")).as("m"),
        max(col("v").cast("double")).as("M"))
      .orderBy(col("pos"))
      .collect()
    (mm.map(_.getDouble(1)).toSeq, mm.map(_.getDouble(2)).toSeq)
  }

  /** SQ8 codes (ARRAY<BIGINT>, one 0..255 code per dimension):
    * code_d = clamp(floor(((v_d − min_d) · 255) / (max_d − min_d))).
    * floor keeps the mapping exact across engines (no rounding-mode
    * drift); a degenerate dimension (max = min) codes to 0. Pure per-row
    * projection over in-literal ranges — no shuffle at any corpus size.
    */
  def sqEncode(vec: Column, minv: Seq[Double], maxv: Seq[Double]): Column = {
    val mn = typedLit(minv)
    val mx = typedLit(maxv)
    transform(sequence(lit(1), lit(minv.length)), i => {
      val m = element_at(mn, i)
      val M = element_at(mx, i)
      val v = element_at(vec, i).cast("double")
      when(M - m < 1e-12, lit(0L)).otherwise(
        least(lit(255L), greatest(lit(0L),
          floor(((v - m) * 255.0) / (M - m)).cast("long"))))
    })
  }

  /** Asymmetric SQ8 dot score against a raw query vector: each code
    * dequantizes to the midpoint of its step (min_d + ((c + 0.5) ·
    * (max_d − min_d)) / 255) and multiplies the query coordinate; every
    * term is quantized to integer micro-units before the sum, so the
    * per-row reduction is exact integer arithmetic (order-proof across
    * engines — the BM25/ADC discipline). One final division, rounded
    * to 4.
    */
  def sqDot(codes: Column, query: Seq[Float],
            minv: Seq[Double], maxv: Seq[Double]): Column = {
    val mn = typedLit(minv)
    val mx = typedLit(maxv)
    val qv = typedLit(query.map(_.toDouble))
    round(
      aggregate(sequence(lit(1), lit(minv.length)), lit(0L), (acc, i) => {
        val m = element_at(mn, i)
        val M = element_at(mx, i)
        val deq = m + ((element_at(codes, i).cast("double") + 0.5) * (M - m)) / 255.0
        acc + round(deq * element_at(qv, i) * 1000000.0, 0).cast("long")
      }).cast("double") / 1000000.0, 4) + lit(0.0)
  }

  /** IVF cell rebalancing — the index-maintenance half of continuous
    * ingest (the split/merge discipline of SPFresh, Xu et al. SOSP'23,
    * made deterministic): cells that grew past `maxCell` SPLIT into
    * ceil(n/maxCell) children; cells that shrank below `minCell`
    * DISSOLVE, their members re-homing to the nearest surviving cell.
    * `streamInsertIndexed` appends into fixed cells forever — this is
    * the compaction job that keeps probe-pruning effective as the data
    * distribution drifts.
    *
    * Determinism (and engine replicability — the DuckDB oracle replays
    * the whole maintenance pass in SQL): no Lloyd iterations, no RNG. A
    * hot cell's child centroids are the vectors of its s member rows
    * with the SMALLEST ids (s = ceil(n/maxCell)); members re-assign to
    * the nearest child by the same quantized-cosine total order as
    * [[ivfAssign]] (round 6, ties to the lowest id). Children are
    * numbered maxCentId + rank, seeds ordered (parent asc, seed id asc).
    * The one-pass seeded Voronoi split is the approximation a
    * maintenance job wants: geometric (children tile the parent around
    * real member vectors) without iterating, and a later `kmeansTrain`
    * refinement can always follow.
    *
    * Scale shape: the pass touches ONLY imbalanced rows. Cell sizes are
    * one map-side-combined count (C rows to the driver — index-structure
    * sized, the same bound as the centroid literal in [[ivfAssign]]).
    * Seed selection is the k-bounded [[TopKAggregator]] with a CONSTANT
    * score and exact Long-id tie-break (no full sort of hot-cell rows,
    * no double-cast id collisions above 2^53). Rows in healthy cells
    * pass through UNTOUCHED — their new cell_id is their old one, a
    * no-op projection; split and merge re-assignments are per-row argmax
    * projections over in-literal seed/survivor matrices, so the whole
    * pass adds no join and no exchange beyond the one sizes count.
    * Driver state — cell stats and seeds — is bounded by the index
    * structure (ΣceilI(n_c/maxCell) children ≤ rows/maxCell + #cells),
    * never by the corpus.
    *
    * Loud-failure discipline (throws, never degrades): minCell > maxCell
    * or maxCell < 1; assigned rows pointing at unknown cells; the
    * degenerate corpus where every cell would dissolve.
    *
    * Returns (assignedNew, centroidsNew): the same row multiset as
    * `assigned` with updated `cell_id`, and the surviving + child
    * centroids as (centIdCol BIGINT, centVecCol ARRAY<FLOAT>).
    * `idCol` must be integral (it rides the Long-typed seed buffer).
    *
    * Execution count: the pass runs ONE full action over `assigned`
    * (the sizes count) plus one materialization of the hot-cell subset
    * (shared by both bounded seed collects); the caller's downstream
    * action re-executes the `assigned` lineage once more. If that
    * lineage is expensive (not a plain scan/projection),
    * `localCheckpoint` it before calling — the probes in `Profile
    * ivfmaint` do exactly that.
    */
  def rebalanceIvf(assigned: DataFrame, centroids: DataFrame,
                   idCol: String, vecCol: String,
                   centIdCol: String, centVecCol: String,
                   maxCell: Long, minCell: Long): (DataFrame, DataFrame) = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val centRows = collectCentroids(centroids, centIdCol, centVecCol,
      "rebalanceIvf")
    // one map-side-combined count; C rows to the driver
    val sizes: Map[Long, Long] = assigned.groupBy(col("cell_id"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plan = planRebalance(centRows, sizes,
      cells => assigned.filter(col("cell_id").isin(cells: _*)),
      idCol, vecCol, maxCell, minCell)
    val assignedNew = assigned
      .withColumn("cell_id", newCellColumn(plan, vecCol))
    val centroidsNew = plan.survivors.sortBy(_._1)
      .toDF(centIdCol, centVecCol)
      .withColumn(centVecCol, col(centVecCol).cast("array<float>"))
    (assignedNew, centroidsNew)
  }

  /** [[rebalanceIvf]] against an ON-DISK IVF index ([[writeIvfIndex]]
    * layout: one directory per cell) — the maintenance pass a
    * `streamInsertIndexed` table needs as ingest skews its cells.
    * Disk-side scale shape, the reason this variant exists:
    *
    *   - cell SIZES come from a partition-column-only count — parquet
    *     footers + directory listing, no data column is read;
    *   - only the HOT and TINY cells' directories are ever READ
    *     (PartitionFilters pruning via [[Layout.readPartitions]]);
    *   - only those directories plus the merge DESTINATIONS are ever
    *     WRITTEN: re-homed rows append to their new cell's directory,
    *     dissolved parents' directories are removed. Healthy cells are
    *     untouched bytes on disk (RebalanceSpec asserts the listing).
    *
    * Durability caveat (documented, not hidden): append-then-delete is
    * two filesystem operations; a crash between them leaves the moved
    * rows present in BOTH their old and new directories until a re-run
    * completes the delete. Plain parquet directories have no
    * cross-directory commit; a table format's transaction log is the
    * production answer, and this op keeps the same per-partition
    * semantics underneath it.
    *
    * Returns (#cells rewritten-or-removed, new centroid table).
    */
  def rebalanceIvfOnDisk(spark: org.apache.spark.sql.SparkSession,
                         path: String, centroids: DataFrame,
                         idCol: String, vecCol: String,
                         centIdCol: String, centVecCol: String,
                         maxCell: Long, minCell: Long): (Int, DataFrame) = {
    import spark.implicits._
    val centRows = collectCentroids(centroids, centIdCol, centVecCol,
      "rebalanceIvfOnDisk")
    val table = spark.read.parquet(path)
    // partition-column-only aggregation: footer row counts, no data scan
    val sizes: Map[Long, Long] = table
      .groupBy(col("cell_id").cast("long").as("cell_id"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plan = planRebalance(centRows, sizes,
      cells => Layout.readPartitions(spark, path, "cell_id", cells)
        .withColumn("cell_id", col("cell_id").cast("long")),
      idCol, vecCol, maxCell, minCell)
    val centroidsNew = plan.survivors.sortBy(_._1)
      .toDF(centIdCol, centVecCol)
      .withColumn(centVecCol, col(centVecCol).cast("array<float>"))
    val touched = (plan.hot ++ plan.tiny).toSeq.sorted
    if (touched.isEmpty) return (0, centroidsNew)
    // move = re-home the imbalanced cells' rows (pruned read), append to
    // their destination directories, then drop the dissolved parents
    val moved = Layout.readPartitions(spark, path, "cell_id", touched)
      .withColumn("cell_id", col("cell_id").cast("long"))
    val dataCols = moved.columns.filter(_ != "cell_id").map(col)
    val rehomed = moved
      .withColumn("cell_id", newCellColumn(plan, vecCol))
      .select(dataCols :+ col("cell_id"): _*)
      .localCheckpoint(true) // the read must finish before dirs change
    rehomed.write.mode("append").partitionBy("cell_id").parquet(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    touched.foreach { c =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/cell_id=$c"), true): Unit
    }
    (touched.length, centroidsNew)
  }

  /** A computed rebalance DECISION, exposed so storage layouts beyond
    * [[writeIvfIndex]]'s one-dir-per-cell shape (e.g. the maintained
    * streaming ingest's batch-addressed layout in
    * `graft.streaming.Streaming.streamInsertIndexedMaintained`) can run
    * the same deterministic split/merge policy against their own
    * move/commit mechanics. Everything here is driver-bounded by the
    * INDEX structure (centroids + seeds), never the corpus.
    */
  final class IvfRebalance private[operators] (
      private val plan: RebalPlan,
      centIdCol: String, centVecCol: String) {
    /** Cells that split or dissolve — the ONLY cells whose rows move. */
    val touchedCells: Seq[Long] = (plan.hot ++ plan.tiny).toSeq.sorted
    /** True when every cell is within bounds: nothing to move, the
      * centroid table is unchanged.
      */
    def isNoop: Boolean = touchedCells.isEmpty
    /** The re-homing projection for rows of touched cells — same
      * quantized-cosine total order as [[ivfAssign]] (see
      * [[rebalanceIvf]]'s determinism contract); healthy rows map to
      * their current cell. Pure per-row argmax over in-literal seed /
      * survivor matrices: no join, no exchange.
      */
    def rehomeColumn(vecCol: String): Column = newCellColumn(plan, vecCol)
    /** Post-rebalance centroid table as (centIdCol BIGINT, centVecCol
      * ARRAY<FLOAT>) — survivors plus split children.
      */
    def centroidsNew(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      plan.survivors.sortBy(_._1).toDF(centIdCol, centVecCol)
        .withColumn(centVecCol, col(centVecCol).cast("array<float>"))
    }
  }

  /** Plan-only face of [[rebalanceIvf]]: classify cells against
    * (`maxCell`, `minCell`), pick split seeds (fetching rows ONLY for hot
    * cells via `rowsOf`), and return the decision without moving
    * anything. `sizes` is the per-cell row count (one footer/partition
    * count at any scale); `rowsOf(cells)` must return those cells' rows
    * with at least (cell_id, idCol, vecCol). Same loud-failure contract
    * as [[rebalanceIvf]].
    *
    * `maxChildrenPerPass` caps how many children one hot cell spawns in
    * a single pass: a grossly-hot cell (ceil(n/maxCell) large) would
    * otherwise put an argmax over hundreds of in-literal child vectors
    * in the re-home projection — past codegen-friendly expression size.
    * Capped, the cell splits into at most that many children, a child
    * may still be hot, and the CALLER's next maintenance round splits it
    * again — geometric convergence, bounded expression size per pass
    * (the maintained streaming ingest relies on exactly this).
    */
  def planIvfRebalance(centroids: DataFrame, sizes: Map[Long, Long],
                       rowsOf: Seq[Long] => DataFrame,
                       idCol: String, vecCol: String,
                       centIdCol: String, centVecCol: String,
                       maxCell: Long, minCell: Long,
                       maxChildrenPerPass: Int = Int.MaxValue): IvfRebalance = {
    require(maxChildrenPerPass >= 2,
      "maxChildrenPerPass must be >= 2 (a 1-child split is a rename)")
    val centRows = collectCentroids(centroids, centIdCol, centVecCol,
      "planIvfRebalance")
    new IvfRebalance(
      planRebalance(centRows, sizes, rowsOf, idCol, vecCol, maxCell, minCell,
        maxChildrenPerPass),
      centIdCol, centVecCol)
  }

  /** Driver-bounded rebalance decision state: which cells split, which
    * dissolve, the surviving (id, vector) centroid set, and each hot
    * parent's child centroids.
    */
  private final case class RebalPlan(
      hot: Set[Long], tiny: Set[Long],
      survivors: Seq[(Long, Seq[Float])],
      byParent: Map[Long, Seq[(Long, Seq[Float])]])

  private def collectCentroids(centroids: DataFrame, centIdCol: String,
                               centVecCol: String,
                               who: String): Seq[(Long, Seq[Float])] = {
    val rows = centroids
      .select(col(centIdCol).cast("long"), col(centVecCol))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
      .sortBy(_._1)
    require(rows.nonEmpty, s"$who: centroids must be non-empty")
    rows
  }

  /** The shared planning core of [[rebalanceIvf]] / [[rebalanceIvfOnDisk]]:
    * classify cells, pick split seeds from the hot rows (fetched lazily
    * and ONLY for hot cells via `rowsOf`), number children, assemble the
    * survivor set. All state driver-bounded by the index structure.
    */
  private def planRebalance(centRows: Seq[(Long, Seq[Float])],
                            sizes: Map[Long, Long],
                            rowsOf: Seq[Long] => DataFrame,
                            idCol: String, vecCol: String,
                            maxCell: Long, minCell: Long,
                            maxChildren: Int = Int.MaxValue): RebalPlan = {
    require(maxCell >= 1, "rebalanceIvf: maxCell must be >= 1")
    require(minCell >= 0 && minCell <= maxCell,
      "rebalanceIvf: need 0 <= minCell <= maxCell")
    val allCentIds = centRows.map(_._1).toSet
    val maxCentId = centRows.map(_._1).max
    val unknown = sizes.keySet -- allCentIds
    require(unknown.isEmpty,
      s"rebalanceIvf: assigned rows reference unknown cells ${unknown.toSeq.sorted.take(5)}")

    val hot = centRows.map(_._1).filter(c => sizes.getOrElse(c, 0L) > maxCell).toSet
    val tiny = centRows.map(_._1)
      .filter(c => !hot(c) && sizes.getOrElse(c, 0L) < minCell).toSet
    val keep = centRows.filter { case (c, _) => !hot(c) && !tiny(c) }
    require(keep.nonEmpty || hot.nonEmpty,
      "rebalanceIvf: every cell is below minCell — rebalance would dissolve " +
        "the whole index; lower minCell or retrain instead")

    // seed selection: k-bounded per-cell smallest ids (constant score,
    // exact Long tie-break), then the bounded seed set joins back for
    // its vectors — never a full sort of the hot rows
    val children: Seq[(Long, Long, Long, Seq[Float])] = // (childId, parent, seedId, vec)
      if (hot.isEmpty) Seq.empty
      else {
        val sOf: Map[Long, Int] = hot.iterator
          .map(c => c -> math.min(maxChildren,
            ((sizes(c) + maxCell - 1) / maxCell).toInt)).toMap
        val maxS = sOf.values.max
        // two driver collects read this (seed top-k, then seed vectors);
        // checkpoint the bounded hot subset so the source lineage runs
        // once for both, not once per collect
        val hotRows = rowsOf(hot.toSeq.sorted).localCheckpoint(false)
        val picked = TopK.topKPerKeyAgg(
          hotRows.select(col("cell_id"), col(idCol)),
          Seq(col("cell_id")), lit(0.0), col(idCol), maxS)
          .select(col("cell_id").cast("long"), col("id").cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        val seedIds = picked.groupBy(_._1).toSeq.flatMap { case (c, rows) =>
          rows.map(_._2).sorted.take(sOf(c)).map(c -> _).toSeq
        }
        val wanted = seedIds.map(_._2).distinct
        val vecOf: Map[(Long, Long), Seq[Float]] = hotRows
          .filter(col(idCol).isin(wanted: _*))
          .select(col("cell_id").cast("long"), col(idCol).cast("long"), col(vecCol))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Float](2)).toMap
        seedIds.sortBy(p => (p._1, p._2)).zipWithIndex.map { case ((c, sid), i) =>
          (maxCentId + i + 1, c, sid, vecOf((c, sid)))
        }
      }

    val survivors = keep ++ children.map(ch => (ch._1, ch._4))
    val byParent: Map[Long, Seq[(Long, Seq[Float])]] =
      children.groupBy(_._2).map { case (p, cs) => p -> cs.map(c => (c._1, c._4)) }
    RebalPlan(hot, tiny, survivors, byParent)
  }

  /** The re-homing projection: healthy rows keep their cell, hot-cell
    * rows argmax over their parent's children, tiny-cell rows argmax
    * over all survivors — quantized-cosine total order, no join, no
    * exchange. The argmax runs in the [[graft.expressions.RehomeArgmax]]
    * kernel whose candidate matrices ride as ONE reference object, so
    * the projection's generated code is FAN-OUT-INDEPENDENT: any number
    * of split children compiles to the same few bytecodes (the earlier
    * per-child case-chain crossed the JVM 64 KB method limit at the
    * sf0.1 bench's split fan-out and fell back to interpreted
    * projection). `maxChildrenPerPass` stays a POLICY knob — geometric
    * split convergence — not a codegen crutch.
    */
  private def newCellColumn(plan: RebalPlan, vecCol: String): Column = {
    val cands: Map[Long, Seq[(Long, Seq[Float])]] =
      plan.tiny.iterator.map(t => t -> plan.survivors).toMap ++
        plan.hot.iterator.map(h => h -> plan.byParent(h))
    if (cands.isEmpty) col("cell_id")
    else graft.expressions.RehomeExpressions.rehome(
      col("cell_id"), col(vecCol), cands, V.NormEps)
  }

  /** The pre-kernel EXPRESSION-TREE formulation of [[newCellColumn]] —
    * kept as the agreement oracle for RebalanceSpec (kernel ≡ unrolled
    * struct-argmax on the same plan, row for row), not used in any
    * production path: its size grows with the split fan-out.
    */
  private[graft] def newCellColumnUnrolled(
      hotCells: Set[Long], tinyCells: Set[Long],
      survivorSet: Seq[(Long, Seq[Float])],
      childrenByParent: Map[Long, Seq[(Long, Seq[Float])]],
      vecCol: String): Column =
    newCellColumnExpr(
      RebalPlan(hotCells, tinyCells, survivorSet, childrenByParent), vecCol)

  private def newCellColumnExpr(plan: RebalPlan, vecCol: String): Column = {
    def normOf(v: Seq[Float]): Double = {
      var n2 = 0.0
      v.foreach(x => n2 += x.toDouble * x.toDouble)
      math.max(math.sqrt(n2), V.NormEps)
    }
    val vn = greatest(sqrt(dotF(col(vecCol), col(vecCol))), lit(V.NormEps))
    def argmaxOver(cands: Seq[(Long, Seq[Float])]): Column = {
      val structs = cands.map { case (cid, cvec) =>
        struct(
          round(dotF(col(vecCol), typedLit(cvec)) / (vn * lit(normOf(cvec))), 6)
            .as("score"),
          lit(-cid).as("negid"))
      }
      -array_max(array(structs: _*)).getField("negid")
    }
    val mergeBase =
      if (plan.tiny.isEmpty) col("cell_id")
      else when(col("cell_id").isin(plan.tiny.toSeq.sorted: _*),
        argmaxOver(plan.survivors)).otherwise(col("cell_id"))
    if (plan.hot.isEmpty) mergeBase
    else {
      val splitCase = plan.hot.toSeq.sorted.foldLeft(lit(null).cast("long")) {
        (acc, h) =>
          when(col("cell_id") === h, argmaxOver(plan.byParent(h))).otherwise(acc)
      }
      when(col("cell_id").isin(plan.hot.toSeq.sorted: _*), splitCase)
        .otherwise(mergeBase)
    }
  }
}
