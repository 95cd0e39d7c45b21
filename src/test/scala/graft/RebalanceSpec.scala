package graft

import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}
import graft.operators.{Ann, TopK}

/** `Ann.rebalanceIvf` — deterministic split/merge IVF maintenance.
  *
  * Synthetic fixture (dim 4, engineered so every decision is forced):
  *   cell 0  HOT   10 members in three sub-clusters; maxCell=4 → 3 children
  *   cell 1  keep  3 members
  *   cell 2  TINY  1 member, nearest survivor is cell 1
  *   cell 3  TINY  empty — dissolves with no members to move
  */
class RebalanceSpec extends SparkSpec {

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  private lazy val cents = {
    import spark.implicits._
    Seq(
      (0L, vec(1, 0, 0, 0)), (1L, vec(0, 1, 0, 0)),
      (2L, vec(0, 0, 1, 0)), (3L, vec(0, 0, 0, 1))
    ).toDF("cent_id", "cvec")
  }

  private lazy val assigned = {
    import spark.implicits._
    val a = vec(1, 0.3, 0, 0); val b = vec(1, 0, 0.3, 0); val c = vec(1, 0, 0, 0.3)
    val rows =
      Seq(100L -> a, 103L -> a, 104L -> a,
        101L -> b, 105L -> b, 106L -> b,
        102L -> c, 107L -> c, 108L -> c, 109L -> c).map { case (i, v) => (i, v, 0L) } ++
      Seq(200L, 201L, 202L).map(i => (i, vec(0, 1, 0, 0), 1L)) ++
      Seq((300L, vec(0.1, 0.9, 0.05, 0), 2L))
    rows.toDF("vec_id", "embedding", "cell_id")
  }

  test("split: hot cell partitions into ceil(n/maxCell) seeded-Voronoi children") {
    val (aN, cN) = Ann.rebalanceIvf(assigned, cents, "vec_id", "embedding",
      "cent_id", "cvec", maxCell = 4, minCell = 2)
    val got = aN.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // children numbered maxCentId(3) + rank over seeds (100,101,102)
    assert(got(100L) == 4L && got(103L) == 4L && got(104L) == 4L)
    assert(got(101L) == 5L && got(105L) == 5L && got(106L) == 5L)
    assert(got(102L) == 6L && got(107L) == 6L && got(108L) == 6L && got(109L) == 6L)
    // healthy cell untouched; tiny member re-homes to nearest survivor
    assert(Seq(200L, 201L, 202L).forall(got(_) == 1L))
    assert(got(300L) == 1L)
    // centroid table: survivor 1 + children 4..6 with the SEED vectors
    val cm = cN.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(cm.keySet == Set(1L, 4L, 5L, 6L))
    assert(cm(4L) == vec(1, 0.3, 0, 0) && cm(5L) == vec(1, 0, 0.3, 0) &&
      cm(6L) == vec(1, 0, 0, 0.3))
  }

  test("row multiset is preserved and every output cell exists in centroidsNew") {
    val (aN, cN) = Ann.rebalanceIvf(assigned, cents, "vec_id", "embedding",
      "cent_id", "cvec", maxCell = 4, minCell = 2)
    assert(aN.count() == assigned.count())
    assert(aN.select("vec_id").exceptAll(assigned.select("vec_id")).count() == 0)
    val cells = cN.select("cent_id")
    assert(aN.select(col("cell_id").as("cent_id")).distinct()
      .join(cells, Seq("cent_id"), "left_anti").count() == 0)
  }

  test("no hot, no tiny: identity — assignment and centroids unchanged") {
    val (aN, cN) = Ann.rebalanceIvf(assigned, cents, "vec_id", "embedding",
      "cent_id", "cvec", maxCell = 100, minCell = 0)
    assert(aN.select("vec_id", "cell_id")
      .exceptAll(assigned.select("vec_id", "cell_id")).count() == 0)
    assert(cN.count() == 4)
  }

  test("the reassignment plan adds no Exchange and no Join") {
    val (aN, _) = Ann.rebalanceIvf(assigned, cents, "vec_id", "embedding",
      "cent_id", "cvec", maxCell = 4, minCell = 2)
    aN.count()
    val plan = aN.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"rebalanced assignment must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"rebalanced assignment must not join:\n$plan")
  }

  test("full-probe search over the rebalanced index equals brute force") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cents16 = e.filter($"vec_id" < 16)
      .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
    val a0 = Ann.ivfAssign(e, cents16, "vec_id", "embedding", "cent_id", "cvec")
    val n = e.count()
    val (aN, cN) = Ann.rebalanceIvf(a0, cents16, "vec_id", "embedding",
      "cent_id", "cvec", maxCell = math.max(1L, (1.2 * n / 16).toLong),
      minCell = (0.6 * n / 16).toLong)
    assert(aN.count() == n)
    val q = e.filter($"vec_id" === 42).head.getSeq[Float](1)
    val nCells = cN.count().toInt
    val via = Ann.search(aN.drop("cell_id"), cN, "vec_id", "embedding",
      "cent_id", "cvec", q, nProbes = nCells, k = 10)
      .collect().map(_.getLong(0)).toSeq
    val brute = TopK.topK(
      e.withColumn("score", V.cosine($"embedding", typedLit(q))),
      $"score", $"vec_id", 10).collect().map(_.getLong(0)).toSeq
    assert(via == brute)
  }

  private def listing(path: String): Seq[(String, Long, Long)] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.getName, s.getLen, s.getModificationTime))
      .sortBy(_._1).toSeq
  }

  test("on-disk rebalance touches only imbalanced cell dirs; agrees with in-memory") {
    val dir = java.nio.file.Files.createTempDirectory("graft_reb_").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "ivf").getAbsolutePath
    graft.operators.Ann.writeIvfIndex(assigned, path)
    val healthyBefore = listing(s"$path/cell_id=1")
    val (nTouched, cN) = Ann.rebalanceIvfOnDisk(spark, path, cents,
      "vec_id", "embedding", "cent_id", "cvec", maxCell = 4, minCell = 2)
    assert(nTouched == 3, "hot cell 0, tiny cell 2, and empty cell 3 (no dir to remove)")
    // the healthy cell's ORIGINAL file is still there untouched (the
    // tiny merge APPENDS a new file beside it, never rewrites)
    val healthyAfter = listing(s"$path/cell_id=1")
    assert(healthyBefore.forall(healthyAfter.contains),
      s"cell 1's original files must survive byte-identical: " +
        s"$healthyBefore vs $healthyAfter")
    assert(healthyAfter.size > healthyBefore.size, "merge destination appends")
    // dissolved parents are gone; children exist
    assert(listing(s"$path/cell_id=0").isEmpty && listing(s"$path/cell_id=2").isEmpty)
    assert(listing(s"$path/cell_id=4").nonEmpty && listing(s"$path/cell_id=5").nonEmpty
      && listing(s"$path/cell_id=6").nonEmpty)
    // row-level agreement with the in-memory pass
    val (aMem, cMem) = Ann.rebalanceIvf(assigned, cents, "vec_id", "embedding",
      "cent_id", "cvec", maxCell = 4, minCell = 2)
    val disk = spark.read.parquet(path)
      .select(col("vec_id"), col("cell_id").cast("long").as("cell_id"))
    assert(disk.exceptAll(aMem.select("vec_id", "cell_id")).count() == 0)
    assert(aMem.select("vec_id", "cell_id").exceptAll(disk).count() == 0)
    assert(cN.collect().map(_.getLong(0)).sorted.toSeq ==
      cMem.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("loud failures: bad bounds, unknown cells, index-wide dissolution") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Ann.rebalanceIvf(assigned, cents, "vec_id", "embedding",
        "cent_id", "cvec", maxCell = 2, minCell = 5)
    }
    intercept[IllegalArgumentException] {
      val rogue = assigned.withColumn("cell_id",
        when(col("vec_id") === 300L, lit(99L)).otherwise(col("cell_id")))
      Ann.rebalanceIvf(rogue, cents, "vec_id", "embedding",
        "cent_id", "cvec", maxCell = 4, minCell = 2)
    }
    intercept[IllegalArgumentException] {
      val one = Seq((0L, vec(1, 0, 0, 0), 0L), (1L, vec(0, 1, 0, 0), 1L))
        .toDF("vec_id", "embedding", "cell_id")
      val twoCents = Seq((0L, vec(1, 0, 0, 0)), (1L, vec(0, 1, 0, 0)))
        .toDF("cent_id", "cvec")
      // every cell below minCell and none hot -> whole index dissolves
      Ann.rebalanceIvf(one, twoCents, "vec_id", "embedding",
        "cent_id", "cvec", maxCell = 10, minCell = 5)
    }
  }

  test("re-home kernel ≡ unrolled expression-tree argmax on a hot+tiny plan, knife-edge ties included") {
    import spark.implicits._
    import graft.expressions.RehomeExpressions
    val children = Seq((4L, vec(1, 0.3, 0, 0)), (5L, vec(1, 0, 0.3, 0)),
      (6L, vec(1, 0, 0, 0.3)))
    val survivors = Seq((1L, vec(0, 1, 0, 0))) ++ children
    val hot = Set(0L); val tiny = Set(2L, 3L)
    val byParent = Map(0L -> children)
    val plan: Map[Long, Seq[(Long, Seq[Float])]] =
      tiny.iterator.map(t => t -> survivors).toMap ++
        hot.iterator.map(h => h -> byParent(h))
    // the fixture rows PLUS exact-tie rows: (1,0,0,0) ties all three
    // children at the same quantized score — smallest child id must win
    // in BOTH formulations; healthy cell 1 rows pass through untouched
    val rows = assigned.select(col("vec_id"), col("embedding"),
        col("cell_id"))
      .union(Seq((900L, vec(1, 0, 0, 0), 0L), (901L, vec(0, 0, 0, 1), 2L))
        .toDF("vec_id", "embedding", "cell_id"))
    val kernel = rows.withColumn("nc",
        RehomeExpressions.rehome(col("cell_id"), col("embedding"), plan,
          V.NormEps))
      .select(col("vec_id"), col("nc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val unrolled = rows.withColumn("nc",
        Ann.newCellColumnUnrolled(hot, tiny, survivors, byParent,
          "embedding"))
      .select(col("vec_id"), col("nc").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel == unrolled, s"kernel $kernel vs unrolled $unrolled")
    assert(kernel(900L) == 4L, s"exact tie must break to smallest child id")
    assert(kernel(200L) == 1L, "healthy cell keeps its rows")
  }

  test("re-home codegen survives a 2000-child fan-out (the old case-chain crossed the 64 KB method limit)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}
    import graft.expressions.{RehomeArgmax, RehomePlanData}
    val cands: Seq[(Long, Seq[Float])] =
      (1L to 2000L).map(i => i -> Seq(i.toFloat, 1f, 0f, 0f))
    val data = RehomePlanData(Map(0L -> cands), V.NormEps)
    val expr = RehomeArgmax(
      BoundReference(0, LongType, nullable = false),
      BoundReference(1, ArrayType(FloatType, containsNull = false),
        nullable = false), data)
    // generate() THROWS on a method-limit overflow instead of silently
    // falling back — compiling proves fan-out independence
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    val v = Array(3.2f, 1f, 0f, 0f)
    val row = InternalRow(0L, ArrayData.toArrayData(v))
    val viaProj = proj(row).getLong(0)
    assert(viaProj == expr.eval(row).asInstanceOf[Long],
      "interpreted and codegen paths must agree")
    // driver-side replay of the exact scoring (same rounding, same tie
    // order) certifies the argmax, not just determinism
    def round6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val vn = math.max(math.sqrt(v.map(x => x.toDouble * x).sum), V.NormEps)
    val expected = cands.map { case (cid, cv) =>
      val cn = math.max(math.sqrt(cv.map(x => x.toDouble * x).sum), V.NormEps)
      val dot = v.zip(cv).map { case (a, b) => a.toDouble * b.toDouble }.sum
      (round6(dot / (vn * cn)), cid)
    }.maxBy { case (s, cid) => (s, -cid) }._2
    assert(viaProj == expected, s"argmax: got $viaProj want $expected")
    // a cell absent from the plan keeps its rows
    val keep = InternalRow(77L, ArrayData.toArrayData(v))
    assert(expr.eval(keep).asInstanceOf[Long] == 77L)
  }
}
