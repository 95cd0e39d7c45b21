package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{Ann, TopK}
import graft.functions.{VectorFunctions => V}
import graft.sources.Layout

class LayoutSpec extends SparkSpec {

  test("zValue2 interleaves bits; z-ordered files prune a 2-D box better than a 1-D sort") {
    import spark.implicits._
    // hand-check: a=5 (101) → bits at 0,2,4 = 1+0+16; b=3 (011) → bits at 1,3 = 2+8
    val z = Seq(1).toDF("x")
      .select(Layout.zValue2(lit(5), lit(3), 4)).head.getLong(0)
    assert(z == 27L, s"z(5,3) must be 27, got $z")

    // 64×64 grid, 32 files; box query a∈[8,15] ∧ b∈[8,15]
    val grid = (for (a <- 0 until 64; b <- 0 until 64) yield (a, b))
      .toDF("a", "b")
    def filesHit(path: String): (Long, Long) = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min($"a").as("la"), max($"a").as("ha"),
          min($"b").as("lb"), max($"b").as("hb"))
        .collect()
      val box = stats.count(r => r.getInt(1) <= 15 && r.getInt(2) >= 8 &&
        r.getInt(3) <= 15 && r.getInt(4) >= 8)
      (box.toLong, stats.length.toLong)
    }
    val zPath = Files.createTempDirectory("graft_zord_").toString + "/z"
    val aPath = Files.createTempDirectory("graft_zord_").toString + "/a"
    Layout.writeZOrdered(grid, zPath, "a", "b", 6, 32)
    grid.repartitionByRange(32, $"a").sortWithinPartitions($"a")
      .write.parquet(aPath)
    val (zHit, zTotal) = filesHit(zPath)
    val (aHit, aTotal) = filesHit(aPath)
    info(s"2-D box touches $zHit/$zTotal z-ordered files vs $aHit/$aTotal a-sorted files")
    assert(zHit < aHit,
      s"z-order must touch fewer files on a 2-D box ($zHit vs $aHit)")
  }

  test("compact: many small files become the byte-budgeted count, rows intact") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_compact_").toString
    val src = base + "/src"
    val dst = base + "/dst"
    // 64 tiny files
    (0 until 1024).map(i => (i.toLong, s"row $i")).toDF("id", "s")
      .repartition(64).write.parquet(src)
    val (before, after) = graft.sources.Layout.compact(spark, src, dst,
      targetFileBytes = 1L << 20)
    assert(before == 64)
    assert(after < before, s"expected fewer files, got $after")
    // total bytes << 1 MiB → single output file
    assert(after == 1)
    val a = spark.read.parquet(src).orderBy("id").collect()
    val b = spark.read.parquet(dst).orderBy("id").collect()
    assert(a.toSeq == b.toSeq, "compaction must not change the data")
  }

  test("join of two tables bucketed on the key runs with NO exchange on either side") {
    import spark.implicits._
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val left = (0 until 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
      val right = (0 until 1000 by 3).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
      Layout.writeBucketed(left, "bucketed_left", "k", 8)
      Layout.writeBucketed(right, "bucketed_right", "k", 8)
      val joined = spark.table("bucketed_left")
        .join(spark.table("bucketed_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() == 334)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bucketed_left")
      spark.sql("DROP TABLE IF EXISTS bucketed_right")
    }
  }

  test("on-disk IVF index: probe reads only the probed cells (partition pruning)") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cents = e.filter($"vec_id" < 8)
      .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
    val assigned = Ann.ivfAssign(e, cents, "vec_id", "embedding", "cent_id", "cvec")
    val path = Files.createTempDirectory("graft_ivf_").toString + "/index"
    Ann.writeIvfIndex(assigned, path)

    val probed = Ann.readIvfCells(spark, path, Seq(1L, 3L))
    // partition pruning visible in the scan node
    val scan = probed.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    // correctness: equals filtering the full assigned table
    val want = assigned.filter($"cell_id".isin(1L, 3L)).count()
    assert(probed.count() == want && want > 0)
    // and only the probed directories' files are actually read
    val allCells = new java.io.File(path).listFiles
      .filter(_.getName.startsWith("cell_id=")).map(_.getName).toSet
    assert(allCells.size > 2, s"expected several cells, got $allCells")
    // end-to-end search over the probed subset matches brute force restricted to it
    val q = e.filter($"vec_id" === 7).select($"embedding".as("qe"))
    val hits = TopK.topK(
      probed.crossJoin(broadcast(q))
        .withColumn("c", V.cosine($"embedding", $"qe")),
      col("c"), col("vec_id"), 5)
    assert(hits.count() <= 5)
  }

  test("on-disk filtered post path: partition pruning and parquet predicate pushdown co-operate") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cents = e.filter($"vec_id" < 16)
      .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
    val assigned = Ann.ivfAssign(e, cents, "vec_id", "embedding", "cent_id", "cvec")
    val path = Files.createTempDirectory("graft_fivf_").toString + "/index"
    Ann.writeIvfIndex(assigned, path)

    val query = e.filter($"vec_id" === 42).head.getSeq[Float](1)
    val probes = Ann.probeCellIds(cents, query, "cent_id", "cvec", 4)
    // the disk-backed post path: probed-cell read + metadata predicate
    val cand = Ann.readIvfCells(spark, path, probes).filter($"label" === 5)
    cand.count()
    val scan = cand.queryExecution.executedPlan.toString
    // cell routing prunes DIRECTORIES, the predicate prunes ROW GROUPS —
    // both must reach the scan node for the 100 TB cost model to hold
    assert(scan.contains("PartitionFilters"), s"cell filter must prune partitions:\n$scan")
    assert(scan.contains("PushedFilters") && scan.contains("EqualTo(label,5)"),
      s"label predicate must push to parquet:\n$scan")
    // correctness: the disk composition scores exactly like the in-memory
    // post path (assignment is deterministic, so membership agrees)
    val mem = assigned.filter($"cell_id".isin(probes: _*)).filter($"label" === 5)
    assert(cand.select($"vec_id").exceptAll(mem.select($"vec_id")).count() == 0)
    assert(mem.select($"vec_id").exceptAll(cand.select($"vec_id")).count() == 0)
  }

  test("CSV and ORC round-trips survive adversarial text (quotes, commas, newlines, unicode)") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "plain words"),
      (2L, "comma, separated, values"),
      (3L, "a \"quoted\" phrase and \"\"double doubles\"\""),
      (4L, "line\nbreak and\r\nwindows break"),
      (5L, "trailing space  and\ttab"),
      (6L, "unicode: café üß 中文 😀"),
      (7L, ""),
      (8L, "null-ish tokens: NULL null \\N")).toDF("id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_rt_").toString
    nasty.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    // multiLine: quoted fields containing record delimiters must re-parse
    val csvBack = spark.read.schema("id LONG, text STRING")
      .option("header", "true").option("multiLine", "true").csv(s"$tmp/csv")
    // Spark writes empty string as an empty unquoted field, which reads
    // back as null by default — the documented emptyValue/nullValue
    // asymmetry; normalize for the fidelity check
    val gotCsv = csvBack.select($"id", coalesce($"text", lit("")).as("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = nasty.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gotCsv == want, s"csv mismatch: ${gotCsv.toSeq.sortBy(_._1)}")
    nasty.write.mode("overwrite").orc(s"$tmp/orc")
    val gotOrc = spark.read.schema("id LONG, text STRING").orc(s"$tmp/orc")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gotOrc == want, "orc must be byte-lossless including empties")
  }

  test("contentDigest: partitioning-independent; catches edits, dup-pairs, and drops") {
    import spark.implicits._
    val base = (1 to 500).map(i => (s"g${i % 3}", s"text $i")).toDF("g", "v")
    def dig(df: org.apache.spark.sql.DataFrame) =
      Layout.contentDigest(df, col("g"), col("v")).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
    val a = dig(base.repartition(2))
    assert(a == dig(base.repartition(32).sort(desc("v"))),
      "digest must not depend on partitioning or order")
    // one edited row flips both hash digests in its group only
    val edited = dig(base.withColumn("v",
      when(col("v") === "text 7", lit("text 7!")).otherwise(col("v"))))
    assert(edited("g1") != a("g1") && edited("g0") == a("g0"))
    // a row duplicated TWICE cancels in XOR — the sum digest catches it
    val dupped = dig(base.union(base.filter(col("v") === "text 7"))
      .union(base.filter(col("v") === "text 7")))
    assert(dupped("g1")._2 == a("g1")._2, "xor is blind to even multiplicity")
    assert(dupped("g1")._3 != a("g1")._3, "mod-2^60 sum catches it")
    assert(dupped("g1")._1 == a("g1")._1 + 2, "count catches it too")
    // a dropped row changes the digest
    assert(dig(base.filter(col("v") =!= "text 8"))("g2") != a("g2"))
  }

  test("mergeDigests: digest(A) ⊎ digest(B) == digest(A ∪ B); lone groups pass through") {
    import spark.implicits._
    val rows = (1 to 400).map(i => (s"g${i % 3}", s"row $i"))
    val (a, b) = rows.splitAt(170)
    def dig(xs: Seq[(String, String)]) =
      Layout.contentDigest(xs.toDF("g", "v"), col("g"), col("v"))
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(asMap(Layout.mergeDigests(dig(a), dig(b))) == asMap(dig(rows)),
      "merged append-batch digests must equal the full-table digest")
    // a group present only in the delta appears unchanged in the merge
    val lone = Seq(("new_src", "only here"))
    val merged = asMap(Layout.mergeDigests(dig(rows), dig(lone)))
    assert(merged("new_src") == asMap(dig(lone))("new_src"))
    assert(merged("g0") == asMap(dig(rows))("g0"))
  }

  test("mergeUpsert rewrites only touched partitions; updates win, new keys append") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_merge_").toString + "/tbl"
    val base = (0 until 100).map(k => (k.toLong, s"v$k", k % 4))
      .toDF("key", "payload", "p")
    Layout.writePartitioned(base, dir, "p")

    def partFiles(p: Int): Set[(String, Long)] = {
      val d = new java.io.File(s"$dir/p=$p")
      d.listFiles.filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified)).toSet
    }
    val before = (0 until 4).map(partFiles)

    // two updated keys and one brand-new key, all in partition 1
    val updates = Seq((1L, "UPDATED-1", 1), (5L, "UPDATED-5", 1),
      (101L, "NEW-101", 1)).toDF("key", "payload", "p")
    val rewritten = Layout.mergeUpsert(spark, dir, updates, "key", "p")
    assert(rewritten == 1, "only partition 1 is touched")

    // untouched partitions: byte-identical file listings (same names,
    // same mtimes — never rewritten)
    for (p <- Seq(0, 2, 3)) assert(partFiles(p) == before(p),
      s"partition $p must not be rewritten")
    assert(partFiles(1) != before(1), "partition 1 must be rewritten")

    val after = spark.read.parquet(dir)
    assert(after.count() == 101)
    val got = after.filter($"key".isin(1L, 5L, 101L, 2L))
      .select($"key", $"payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "UPDATED-1", 5L -> "UPDATED-5",
      101L -> "NEW-101", 2L -> "v2"))
  }

  test("mergeCdc applies upserts and deletes in one partition-scoped rewrite") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cdc_").toString + "/tbl"
    val base = (0 until 100).map(k => (k.toLong, s"v$k", k % 4))
      .toDF("key", "payload", "p")
    Layout.writePartitioned(base, dir, "p")

    def partFiles(p: Int): Set[(String, Long)] = {
      val d = new java.io.File(s"$dir/p=$p")
      d.listFiles.filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified)).toSet
    }
    val before = (0 until 4).map(partFiles)

    // upsert key 1 (p=1), tombstone keys 2 and 6 (p=2)
    val updates = Seq((1L, "UPDATED-1", 1)).toDF("key", "payload", "p")
    val deletes = Seq((2L, 2), (6L, 2)).toDF("key", "p")
    val rewritten = Layout.mergeCdc(spark, dir, updates, deletes, "key", "p")
    assert(rewritten == 2, "partitions 1 and 2 are touched")

    for (p <- Seq(0, 3)) assert(partFiles(p) == before(p),
      s"partition $p must not be rewritten")

    val after = spark.read.parquet(dir)
    assert(after.count() == 98, "100 - 2 deletes (upsert replaces in place)")
    assert(after.filter($"key".isin(2L, 6L)).count() == 0, "tombstoned rows gone")
    val got = after.filter($"key".isin(1L, 5L)).select($"key", $"payload")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "UPDATED-1", 5L -> "v5"))

    // a key in both updates and deletes is refused loudly
    val bad = intercept[IllegalArgumentException] {
      Layout.mergeCdc(spark, dir,
        Seq((7L, "x", 3)).toDF("key", "payload", "p"),
        Seq((7L, 3)).toDF("key", "p"), "key", "p")
    }
    assert(bad.getMessage.contains("both updates and deletes"))
  }

  test("mergeUpsert on a missing table degenerates to a plain partitioned write") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_merge0_").toString + "/tbl"
    val first = Seq((1L, "a", 0), (2L, "b", 1)).toDF("key", "payload", "p")
    assert(Layout.mergeUpsert(spark, dir, first, "key", "p") == 2)
    assert(spark.read.parquet(dir).count() == 2)
    // second batch merges normally on top of the bootstrap write
    val second = Seq((2L, "B", 1), (3L, "c", 1)).toDF("key", "payload", "p")
    assert(Layout.mergeUpsert(spark, dir, second, "key", "p") == 1)
    val got = spark.read.parquet(dir).select($"key", $"payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "B", 3L -> "c"))
  }

  test("mergeUpsert types the partition column from the updates, not dir-name inference") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_merged_").toString + "/tbl"
    // date-LIKE string partition values: bare inference would type the
    // on-disk column DATE and break the isin prune / unionByName
    val base = Seq((1L, "a", "2024-01-01"), (2L, "b", "2024-01-02"))
      .toDF("key", "payload", "day")
    Layout.writePartitioned(base, dir, "day")
    val updates = Seq((2L, "B", "2024-01-02"), (3L, "c", "2024-01-02"))
      .toDF("key", "payload", "day")
    assert(Layout.mergeUpsert(spark, dir, updates, "key", "day") == 1)
    val after = spark.read.schema("key LONG, payload STRING, day STRING")
      .parquet(dir)
    assert(after.count() == 3)
    assert(after.filter($"key" === 2L).head.getString(1) == "B")
  }

  test("rangeShards: deterministic disjoint shards; written layout is range-readable") {
    import spark.implicits._
    val d = (0 until 4000).map(i => ((i * 2654435761L) % 100000))
      .toDF("v")
    val (sharded, bounds) = Layout.rangeShards(d, "v", 4)
    assert(bounds.length == 3 && bounds == bounds.sorted, bounds.toString)
    // manifest: disjoint, complete, deterministic across partitionings
    val m = Layout.rangeManifest(sharded, "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(m.map(_._2).sum == 4000)
    m.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3, s"overlap between shards ${a._1} and ${b._1}")
    case _ => }
    val (sharded2, bounds2) = Layout.rangeShards(d.repartition(11), "v", 4)
    assert(bounds2 == bounds)
    assert(Layout.rangeManifest(sharded2, "v").collect().toSeq
      == Layout.rangeManifest(sharded, "v").collect().toSeq)
    // written layout: one dir per shard; a range probe touches one dir
    val dir = Files.createTempDirectory("graft_range_").toString + "/tbl"
    sharded.write.partitionBy("shard").mode("overwrite").parquet(dir)
    val shard0 = spark.read.parquet(dir).filter($"shard" === 0L)
    val mx = shard0.agg(max($"v")).head.getLong(0)
    assert(mx <= bounds.head, s"shard 0 leaks past its boundary: $mx")
  }

  test("versioned snapshots: upsert commits immutably, time travel reads stay fixed") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ver_").toString + "/tbl"
    val v0 = Layout.writeVersion(spark,
      dir, Seq((1L, "a"), (2L, "b")).toDF("key", "val"))
    assert(v0 == 0 && Layout.versions(spark, dir) == Seq(0))
    // snapshot v0's file listing, to prove immutability at file level
    def files(p: String) = {
      val root = new org.apache.hadoop.fs.Path(p)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(root).map(s => (s.getPath.getName, s.getLen,
        s.getModificationTime)).sortBy(_._1).toSeq
    }
    val v0files = files(s"$dir/v0")

    val v1 = Layout.upsertVersion(spark,
      dir, Seq((2L, "B"), (3L, "c")).toDF("key", "val"), "key")
    assert(v1 == 1 && Layout.versions(spark, dir) == Seq(0, 1))
    // latest sees the merge
    val latest = Layout.readVersion(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(latest == Map(1L -> "a", 2L -> "B", 3L -> "c"))
    // time travel: v0 content unchanged, files untouched
    val old = Layout.readVersion(spark, dir, Some(0)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(old == Map(1L -> "a", 2L -> "b"))
    assert(files(s"$dir/v0") == v0files, "v0 files were touched by the upsert")
    // unknown version is refused loudly
    intercept[IllegalArgumentException] {
      Layout.readVersion(spark, dir, Some(9))
    }
  }

  test("vacuumVersions: retention GC keeps the newest N, survivors byte-stable, idempotent") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_vac_").toString + "/tbl"
    (0 to 4).foreach(i =>
      Layout.writeVersion(spark, dir, Seq((i.toLong, s"v$i")).toDF("key", "val")))
    assert(Layout.versions(spark, dir) == Seq(0, 1, 2, 3, 4))
    val dropped = Layout.vacuumVersions(spark, dir, keepVersions = 2)
    assert(dropped == Seq(0, 1, 2))
    assert(Layout.versions(spark, dir) == Seq(3, 4))
    // survivors still read; vacuumed versions refuse loudly
    assert(Layout.readVersion(spark, dir, Some(3)).head.getString(1) == "v3")
    assert(Layout.readVersion(spark, dir).head.getString(1) == "v4")
    intercept[IllegalArgumentException] {
      Layout.readVersion(spark, dir, Some(0))
    }
    // idempotent re-run: nothing else to drop
    assert(Layout.vacuumVersions(spark, dir, 2).isEmpty)
    // the latest version is never deletable
    intercept[IllegalArgumentException] {
      Layout.vacuumVersions(spark, dir, 0)
    }
  }

  test("derive caches a stage by input fingerprints: cache hit on no change, recompute on any input change") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_derive_").toFile
    dir.deleteOnExit()
    val src = new java.io.File(dir, "src").getAbsolutePath
    val aux = new java.io.File(dir, "aux").getAbsolutePath
    val dst = new java.io.File(dir, "out").getAbsolutePath
    Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("k", "grp")
      .write.mode("overwrite").parquet(src)
    var computes = 0
    def stage(): (org.apache.spark.sql.DataFrame, Boolean) =
      Layout.derive(spark, Seq(src, aux), dst) {
        computes += 1
        spark.read.parquet(src).groupBy("grp")
          .agg(count(lit(1)).as("n"))
      }
    def rows(): Map[String, Long] = spark.read.parquet(dst).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // first run computes (aux does not exist yet: fingerprinted absent)
    val (_, r1) = stage()
    assert(r1 && computes == 1 && rows() == Map("a" -> 2L, "b" -> 1L))
    // unchanged inputs: cache hit, compute not invoked
    val (_, r2) = stage()
    assert(!r2 && computes == 1)
    // an input table changes: recompute
    Seq((4L, "b")).toDF("k", "grp").write.mode("append").parquet(src)
    val (_, r3) = stage()
    assert(r3 && computes == 2 && rows() == Map("a" -> 2L, "b" -> 2L))
    // an input APPEARING is a change too, even if compute ignores it
    Seq((9L, "x")).toDF("k", "grp").write.mode("overwrite").parquet(aux)
    val (_, r4) = stage()
    assert(r4 && computes == 3)
    val (_, r5) = stage()
    assert(!r5 && computes == 3, "steady state caches again")
  }

  test("incremental rollup: refresh recomputes only changed partitions, removes vanished ones, and is idempotent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_").toFile
    dir.deleteOnExit()
    val src = new java.io.File(dir, "src").getAbsolutePath
    val dst = new java.io.File(dir, "mv").getAbsolutePath
    def write(rows: Seq[(Long, String, String, Long)], mode: String): Unit =
      rows.toDF("k", "grp", "part", "x")
        .write.mode(mode).partitionBy("part").parquet(src)
    write(Seq((1L, "a", "p1", 10L), (2L, "a", "p1", 20L), (3L, "b", "p1", 5L),
      (4L, "a", "p2", 7L), (5L, "b", "p3", 1L)), "overwrite")
    val dims = Seq("grp")
    val aggs = Seq(count(lit(1)).as("n"), sum(col("x")).cast("long").as("sx"))
    def summary(): Map[(String, String), (Long, Long)] =
      spark.read.parquet(dst).collect()
        .map(r => (r.getAs[String]("part"), r.getAs[String]("grp")) ->
          ((r.getAs[Long]("n"), r.getAs[Long]("sx")))).toMap
    def listing(p: String): Seq[(String, Long)] = {
      val d = new java.io.File(s"$dst/part=$p")
      if (!d.exists()) Seq.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length())).sorted.toSeq
    }

    // initial build: every partition counts as changed
    assert(Layout.materializeRollup(spark, src, dst, "part", dims, aggs) == 3)
    assert(summary() == Map(("p1", "a") -> ((2L, 30L)), ("p1", "b") -> ((1L, 5L)),
      ("p2", "a") -> ((1L, 7L)), ("p3", "b") -> ((1L, 1L))))
    val p2Before = listing("p2"); val p3Before = listing("p3")

    // nothing changed: refresh is a no-op
    assert(Layout.refreshRollup(spark, src, dst, "part", dims, aggs) == 0)
    assert(listing("p2") == p2Before && listing("p3") == p3Before)

    // append into p1 only: exactly one partition refreshes, the others
    // stay byte-identical
    write(Seq((6L, "b", "p1", 100L)), "append")
    assert(Layout.refreshRollup(spark, src, dst, "part", dims, aggs) == 1)
    assert(summary()(("p1", "b")) == ((2L, 105L)))
    assert(listing("p2") == p2Before && listing("p3") == p3Before)

    // a partition TRUNCATED to a 0-row file (external writer): its
    // stale summary must go too, not survive behind an updated manifest
    Seq.empty[(Long, String, Long)].toDF("k", "grp", "x")
      .coalesce(1).write.mode("overwrite").parquet(s"$src/part=p2")
    assert(Layout.refreshRollup(spark, src, dst, "part", dims, aggs) == 1)
    assert(!new java.io.File(s"$dst/part=p2").exists(),
      "truncated partition's summary must be dropped")
    assert(summary().keySet.map(_._1) == Set("p1", "p3"))

    // source partition vanishes: its summary partition goes with it
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$src/part=p3"), true)
    assert(Layout.refreshRollup(spark, src, dst, "part", dims, aggs) == 1)
    assert(!new java.io.File(s"$dst/part=p3").exists())
    assert(summary().keySet.map(_._1) == Set("p1"))
    assert(Layout.refreshRollup(spark, src, dst, "part", dims, aggs) == 0)
  }

  test("incremental rollup: a NULL-keyed partition truncated to zero rows drops its stale summary") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mvnull_").toFile
    dir.deleteOnExit()
    val src = new java.io.File(dir, "src").getAbsolutePath
    val dst = new java.io.File(dir, "mv").getAbsolutePath
    // Spark writes the null partition as part=__HIVE_DEFAULT_PARTITION__
    Seq((1L, "a", "p1", 10L), (2L, "a", "", 20L), (3L, "b", "", 5L))
      .toDF("k", "grp", "part", "x")
      .withColumn("part", when(col("part") === "", lit(null: String))
        .otherwise(col("part")))
      .write.mode("overwrite").partitionBy("part").parquet(src)
    val dims = Seq("grp")
    val aggs = Seq(count(lit(1)).as("n"), sum(col("x")).cast("long").as("sx"))
    assert(Layout.materializeRollup(spark, src, dst, "part", dims, aggs) == 2)
    val nullDir = "part=__HIVE_DEFAULT_PARTITION__"
    assert(new java.io.File(s"$dst/$nullDir").exists(),
      "null-keyed summary partition must use the Hive default escape")
    // truncate ONLY the null-keyed source partition to a 0-row file: its
    // produced summary set goes empty, and the stale summary dir must be
    // dropped (String.valueOf(null) would build part=null and miss it)
    Seq.empty[(Long, String, Long)].toDF("k", "grp", "x")
      .coalesce(1).write.mode("overwrite").parquet(s"$src/$nullDir")
    assert(Layout.refreshRollup(spark, src, dst, "part", dims, aggs) == 1)
    assert(!new java.io.File(s"$dst/$nullDir").exists(),
      "truncated null-keyed partition's stale summary must be dropped")
    val left = spark.read.parquet(dst).collect()
      .map(r => (r.getAs[String]("part"), r.getAs[String]("grp")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("sx")))).toMap
    assert(left == Map(("p1", "a") -> ((1L, 10L))), left)
  }

  test("writeBloomIndexed: listed columns carry row-group blooms that hit present keys and miss absent ones") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom_").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "t").getAbsolutePath
    val rows = (0L until 50000L).map(i => (i * 7L + 3L, s"payload_$i"))
    Layout.writeBloomIndexed(rows.toDF("k", "payload").repartition(2),
      path, Seq("k"), expectedNdv = 50000L)

    // probe the written blooms through parquet-mr directly
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.column.values.bloomfilter.BloomFilter
    import org.apache.parquet.io.api.Binary
    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
    assert(files.length == 2)
    var probed = 0
    files.foreach { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f), conf))
      try {
        reader.getRowGroups.forEach { rg =>
          val kMeta = rg.getColumns.asScala.find(
            _.getPath.toDotString == "k").get
          val pMeta = rg.getColumns.asScala.find(
            _.getPath.toDotString == "payload").get
          val bbr = reader.getBloomFilterDataReader(rg)
          val bloom: BloomFilter = bbr.readBloomFilter(kMeta)
          assert(bloom != null, "indexed column must carry a bloom")
          assert(bbr.readBloomFilter(pMeta) == null,
            "unlisted column must NOT pay for a bloom")
          // a key that IS somewhere in the table: k ≡ 3 (mod 7)
          val present = bloom.findHash(bloom.hash(17L * 7L + 3L))
          // keys ≡ 5 (mod 7) never exist: the bloom must miss nearly
          // all of them (allow the design FP rate, assert the bulk)
          val misses = (0 until 100).count { j =>
            !bloom.findHash(bloom.hash(j * 7L + 5L))
          }
          assert(misses >= 95, s"bloom must reject absent keys: $misses/100")
          probed += (if (present) 1 else 0)
        }
      } finally reader.close()
    }
    assert(probed >= 1, "the present key must hit in at least one row group")
    // reads are unchanged semantically; the equality probe pushes down
    val hit = spark.read.parquet(path).filter(col("k") === (17L * 7L + 3L))
    assert(hit.count() == 1)
    val plan = hit.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(k), EqualTo(k,"), plan)
  }

  test("schema evolution: readEvolved fills generation holes; backfillColumn rewrites ONLY lagging partitions, idempotently") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evo_").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "t").getAbsolutePath
    // generation 1: two partitions without the `score` column
    Seq((1L, "aa", "p1"), (2L, "bbbb", "p1"), (3L, "cc", "p2"))
      .toDF("k", "payload", "part")
      .write.mode("overwrite").partitionBy("part").parquet(path)
    // generation 2: a new partition born WITH the column
    Seq((10L, "dddddd", "p3", 60L)).toDF("k", "payload", "part", "score")
      .write.mode("append").partitionBy("part").parquet(path)

    // merge-on-read: old rows get the DERIVED default, new keep theirs
    val defaults = Map("score" -> (length(col("payload")) * 10L).cast("long"))
    val evolved = Layout.readEvolved(spark, path, defaults)
    val got = evolved.select("k", "score").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 20L, 2L -> 40L, 3L -> 20L, 10L -> 60L), got)
    // a column NO file carries yet is created outright
    val fresh = Layout.readEvolved(spark, path,
      defaults + ("epoch" -> lit(7L)))
    assert(fresh.columns.contains("epoch") &&
      fresh.select("epoch").distinct().head().getLong(0) == 7L)

    // physical backfill: only p1/p2 rewrite, p3 stays byte-identical
    def files(p: String): Seq[(String, Long)] = {
      val d = new java.io.File(s"$path/part=$p")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length())).sorted.toSeq
    }
    val p3Before = files("p3")
    val n = Layout.backfillColumn(spark, path, "part", "score",
      (length(col("payload")) * 10L).cast("long"))
    assert(n == 2, s"backfilled $n")
    assert(files("p3") == p3Before, "evolved partition must stay untouched")
    // plain read (no mergeSchema magic) now sees the column everywhere,
    // bit-equal to the merge-on-read answer
    val plain = spark.read.parquet(path).select("k", "score").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(plain == got, plain)
    // idempotent: nothing lagging on a second run
    assert(Layout.backfillColumn(spark, path, "part", "score",
      (length(col("payload")) * 10L).cast("long")) == 0)

    // degenerate dirs must not break the loop: a FILE-LESS partition
    // dir is skipped (nothing to read), a lagging dir whose only file
    // holds ZERO rows is dropped (it can never be rewritten) — and the
    // run after that is a clean 0 again
    new java.io.File(s"$path/part=p9").mkdirs()
    Seq.empty[(Long, String)].toDF("k", "payload")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/part=p4")
    assert(Layout.backfillColumn(spark, path, "part", "score",
      (length(col("payload")) * 10L).cast("long")) == 1)
    assert(!new java.io.File(s"$path/part=p4").exists(),
      "zero-row lagging partition must be dropped, not re-counted forever")
    assert(Layout.backfillColumn(spark, path, "part", "score",
      (length(col("payload")) * 10L).cast("long")) == 0)
  }
}
