package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement tool (optimization guide §1: measure first): count
  * SPARK JOBS and wall-clock per durable-HNSW / maintained-IVF
  * operation at the bench SF. Small-fixture ops are job-overhead
  * dominated (each job is ~30-80 ms of scheduling + task launch on
  * local[32]), so the job count behind each op is the number that
  * explains the bench row — and the one the §2.6 overlap /
  * job-fusion work must move.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.JobProf [opName ...]
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-jobprof")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(): Unit
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = ()
    })

    // fixture-building ops always run (profiling a later op without
    // its build prerequisite would fail on a missing index); the name
    // filter only skips the measured non-build ops
    val buildOps = Set("hnsw_build", "hnsw_build_passthrough",
      "ivf_fixture_write")
    def prof(name: String)(f: => Any): Unit = {
      if (args.nonEmpty && !args.contains(name) && !buildOps(name)) return
      org.apache.spark.sql.GraftShim.waitForListenerBus(spark)
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.GraftShim.waitForListenerBus(spark)
      val n = jobs.get() - j0
      println(f"[jobprof] $name%-28s jobs=$n%4d wall=$wall%7.2fs")
    }

    import spark.implicits._
    import graft.sources.Tables
    import graft.operators.Ann
    val dim = 64
    val rnd = new scala.util.Random(42)
    def randUnit(): Seq[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val e = Tables.load(spark, sfDir, "embeddings")
    val exist = e.filter(pmod(col("vec_id"), lit(10)) =!= 7)
    val batch = e.filter(pmod(col("vec_id"), lit(10)) === 7)
    val icents = exist.filter(col("vec_id") < 18)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    val d = java.nio.file.Files.createTempDirectory("graft_jobprof_").toFile
    // deleteOnExit never removes a non-empty dir — delete recursively
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(d)
    }))
    val midx = new java.io.File(d, "m_idx").getAbsolutePath

    // warmup: JIT + codegen + page cache (one small job)
    e.count(): Unit

    prof("hnsw_build") {
      graft.streaming.HnswIndex.build(spark, midx, exist, icents,
        "vec_id", "embedding", "cent_id", "cvec", k = 4, fanout = 4,
        maxLevel = 1)
    }
    val mb1 = batch.filter(pmod(col("vec_id"), lit(20)) === 7)
    val mb2 = batch.filter(pmod(col("vec_id"), lit(20)) === 17)
    def phaseHook(t0: Long): String => Unit = {
      var last = t0
      s => {
        val now = System.nanoTime()
        println(f"[jobprof]   ..phase to '$s': ${(now - last) / 1e9}%6.2fs")
        last = now
      }
    }
    prof("hnsw_ingest_1") {
      graft.streaming.HnswIndex.ingest(spark, midx, mb1,
        hook = phaseHook(System.nanoTime()))
    }
    prof("hnsw_ingest_2") {
      graft.streaming.HnswIndex.ingest(spark, midx, mb2,
        hook = phaseHook(System.nanoTime()))
    }
    val sdt1 = exist.filter(pmod(col("vec_id"), lit(34)) === 3)
      .select(col("vec_id").as("id"))
    prof("hnsw_softdelete") {
      graft.streaming.HnswIndex.softDelete(spark, midx, sdt1, "id")
    }
    val sq = exist.filter(col("vec_id") === 42)
      .select(col("embedding")).head.getSeq[Float](0)
    prof("hnsw_sdserve_warm") {
      graft.streaming.HnswIndex.search(spark, midx, sq, beam = 8,
        hops = 3, k = 5).count()
    }
    prof("hnsw_sdserve") {
      graft.streaming.HnswIndex.search(spark, midx, sq, beam = 8,
        hops = 3, k = 5).count()
    }
    prof("hnsw_vacuum") {
      graft.streaming.HnswIndex.purgeDeletes(spark, midx)
    }
    prof("hnsw_search") {
      graft.streaming.HnswIndex.search(spark, midx, sq, beam = 8,
        hops = 3, k = 5).count()
    }
    val hq = (0 until 200).map(i => (i.toLong, randUnit()))
      .toDF("qid", "qvec").localCheckpoint(true)
    prof("hnsw_searchBatch_200q") {
      graft.streaming.HnswIndex.searchBatch(spark, midx, hq, "qid",
        "qvec", beam = 8, hops = 3, k = 5).count()
    }
    prof("hnsw_maxsim_serve") {
      graft.streaming.HnswIndex.searchMaxSim(spark, midx, sq,
        nSlices = 4, beam = 8, hops = 3, k = 5).count()
    }
    // filtered/grouped need a passthrough index
    val fidx = new java.io.File(d, "f_idx").getAbsolutePath
    val eLbl = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), col("label"))
    prof("hnsw_build_passthrough") {
      graft.streaming.HnswIndex.build(spark, fidx, eLbl, icents,
        "vec_id", "embedding", "cent_id", "cvec", k = 4, fanout = 4,
        maxLevel = 1, passthrough = Seq("label"))
    }
    prof("hnsw_filtered_serve") {
      graft.streaming.HnswIndex.searchFiltered(spark, fidx, sq,
        pmod(col("label"), lit(2)) === 0, beam = 8, hops = 3,
        k = 5).count()
    }
    prof("hnsw_grouped_serve") {
      graft.streaming.HnswIndex.searchGrouped(spark, fidx, sq, "label",
        beam = 8, hops = 3, nGroups = 3, perGroup = 2).count()
    }
    prof("hnsw_sdwhere") {
      graft.streaming.HnswIndex.softDeleteWhere(spark, fidx,
        pmod(col("label"), lit(16)) === 1)
    }
    // a representative maintained-IVF lifecycle (the q_maintained_*
    // fixture shape)
    import graft.streaming.{Streaming => Strm}
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    val table = new java.io.File(d, "t").getAbsolutePath
    prof("ivf_fixture_write") {
      Ann.ivfAssign(
          graft.search.VectorStore.prepare(
            e.select(col("vec_id").as("id"), col("embedding")), dim, 8),
          cents, "id", "embedding", "cent_id", "cvec")
        .withColumn("__b0", lit(0L))
        .withColumn("__b", lit(0L))
        .write.mode("overwrite").partitionBy("cell_id", "__b")
        .parquet(table)
    }
    prof("ivf_delete") {
      Strm.deleteMaintained(spark, table,
        e.filter(pmod(col("vec_id"), lit(100)) === 0)
          .select(col("vec_id").as("id")), "id")
    }
    val oneQ = randUnit()
    prof("ivf_serve") {
      Strm.searchMaintained(spark, table, cents, "cent_id", "cvec",
        oneQ, nProbes = 4, k = 10).count()
    }
    prof("ivf_retrain") {
      Strm.retrainMaintained(spark, table, k = 16, iters = 1)
    }
    spark.stop()
  }
}
