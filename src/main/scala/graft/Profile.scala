package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.expressions.TextHashExpressions.minhashSigF
import graft.operators.Dedup

/** Dev profiling main: stage-by-stage timings of the dedup pipelines
  * (not part of the driver contract).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    val sh = docs.select($"doc_id", $"source", Dedup.shingles($"text", 2).as("sh"))
      .filter(size($"sh") > 0)
    time("A sh materialize (sum sizes)")(sh.agg(sum(size($"sh"))).collect())
    time("A2 sh again")(sh.agg(sum(size($"sh"))).collect())

    val sig = sh.withColumn("sig", minhashSigF($"sh", 16))
    time("B sig materialize")(sig.agg(sum(pmod(element_at($"sig", 1), lit(1000000L)))).collect())

    val withBands = sig.withColumn("bands", Dedup.bandHashes($"sig", 4, 4))
    time("C bands (forced)")(
      withBands.agg(sum(length(element_at($"bands", 1)))).collect())

    val exploded = withBands.select($"doc_id", $"bands")
      .select($"doc_id", posexplode($"bands").as(Seq("band_idx", "bh")))
    time("D0 exploded count (forced)")(
      println("  rows=" + exploded.agg(count($"bh")).collect().head.getLong(0)))
    val selfJoin = exploded.as("a").join(exploded.as("b"), Seq("band_idx", "bh"))
      .filter($"a.doc_id" < $"b.doc_id")
    time("D1 self-join no distinct")(println("  raw pairs=" + selfJoin.count()))
    val cands = Dedup.lshCandidatePairs(
      withBands.select($"doc_id", $"bands"), "doc_id", "bands")
    time("D lsh candidates")(println("  cands=" + cands.count()))

    val joined = cands
      .join(sh.select($"doc_id".as("id_a"), $"sh".as("sha")), "id_a")
      .join(sh.select($"doc_id".as("id_b"), $"sh".as("shb")), "id_b")
    time("E verify joins")(joined.count())
    time("F jaccard")(
      joined.withColumn("j", Dedup.jaccard($"sha", $"shb"))
        .filter($"j" >= 0.2).count())

    // ngram pipeline
    val a = sh.select($"doc_id".as("doc_a"), $"source", $"sh".as("sha"))
    val b = sh.select($"doc_id".as("doc_b"), $"source", $"sh".as("shb"))
    val pairs = a.join(b, Seq("source")).filter($"doc_a" < $"doc_b")
    time("G ngram pair join count")(println("  pairs=" + pairs.count()))
    time("H ngram jaccard")(
      pairs.withColumn("j", Dedup.jaccard($"sha", $"shb"))
        .filter($"j" >= 0.05).count())

    // scale probe: 10× the corpus (distinct ids), same pipelines — checks
    // the growth curve is ~linear in docs (LSH) not quadratic
    {
      val big = (0 until 10).map(i =>
          docs.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"),
            concat($"text", lit(s" v$i")).as("text")))
        .reduce(_ unionByName _)
        .repartition(32)
      val shB = big.select($"doc_id", Dedup.shingles($"text", 2).as("sh"))
        .filter(size($"sh") > 0)
      val withBandsB = shB
        .withColumn("sig", minhashSigF($"sh", 16))
        .withColumn("bands", Dedup.bandHashes($"sig", 4, 4))
      time(s"S lsh candidates at 10x (${big.count()} docs)") {
        val c = Dedup.lshCandidatePairs(
          withBandsB.select($"doc_id", $"bands"), "doc_id", "bands").count()
        println("  cands10x=" + c)
      }
    }

    // incremental near-dup probe: the SAME 10% batch against a 1× and a
    // 10× signature store (stores pre-materialized — they are persisted
    // snapshots in deployment). Cost should track batch size +
    // band-bucket collisions, not store size: only colliding store rows
    // join.
    {
      val batch = docs.filter($"doc_id" % 10 === 1).repartition(32)
      val batchSigs = Dedup.signatureStore(batch, "doc_id", "text")
        .localCheckpoint() // eager
      val store1 = Dedup.signatureStore(docs.repartition(32), "doc_id", "text")
        .localCheckpoint()
      time("I1 incremental neardup vs 1x store")(
        println("  pairs=" +
          Dedup.incrementalNearDups(batchSigs, store1, "doc_id", 0.5).count()))
      val big10 = (0 until 10).map(i =>
          docs.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"),
            concat($"text", lit(s" v$i")).as("text")))
        .reduce(_ unionByName _)
        .repartition(32)
      val store10 = Dedup.signatureStore(big10, "doc_id", "text")
        .localCheckpoint()
      time("I10 incremental neardup vs 10x store")(
        println("  pairs10x=" +
          Dedup.incrementalNearDups(batchSigs, store10, "doc_id", 0.5).count()))
    }

    // curation pipeline scale probe: 1× vs 10× corpus — growth should
    // track docs (scan stages) + true-duplicate pairs (LSH tier), not
    // corpus²
    {
      import graft.operators.Curation
      def curateCount(d: org.apache.spark.sql.DataFrame): Long =
        Curation.curate(d, "doc_id", "text", "source",
          rates = Map("src0" -> 0.8, "src1" -> 0.5), defaultRate = 0.6).count()
      val docsS = docs.repartition(32)
      time("C1 curate 1x")(println("  kept=" + curateCount(docsS)))
      val big = (0 until 10).map(i =>
          docs.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"), $"source",
            concat($"text", lit(s" v$i")).as("text")))
        .reduce(_ unionByName _)
        .repartition(32)
      time(s"C10 curate 10x")(println("  kept10x=" + curateCount(big)))
    }

    // ngram with spread (as SparkEntry does)
    val shS = docs.repartition(32)
      .select($"doc_id", $"source", Dedup.shingles($"text", 2).as("sh"))
      .filter(size($"sh") > 0)
    val aS = shS.select($"doc_id".as("doc_a"), $"source", $"sh".as("sha"))
    val bS = shS.select($"doc_id".as("doc_b"), $"source", $"sh".as("shb"))
    val jS = aS.join(bS, Seq("source")).filter($"doc_a" < $"doc_b")
      .withColumn("j", Dedup.jaccard($"sha", $"shb"))
      .filter($"j" >= 0.05)
    jS.explain("formatted")
    time("H2 ngram jaccard with spread")(jS.count())

    // DSIR scale probe: 1× vs 10× corpus. The bucket-stats shuffle is
    // B-bounded (64 × partitions rows) and the driver collect is B rows
    // at ANY corpus size, so cost must grow ~linearly with the scoring
    // scan only.
    {
      import graft.operators.Sampling
      def dsir(d: org.apache.spark.sql.DataFrame): Long =
        Sampling.dsirWeights(d, "doc_id", "text", $"source" === "src0")
          .agg(sum($"dsir_w")).collect().head.getDouble(0).toLong
      val docsS = docs.repartition(32)
      time("J1 dsir 1x")(println("  wsum=" + dsir(docsS)))
      val big = (0 until 10).map(i =>
          docs.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"), $"source",
            concat($"text", lit(s" v$i")).as("text")))
        .reduce(_ unionByName _)
        .repartition(32)
      time("J10 dsir 10x")(println("  wsum10x=" + dsir(big)))
    }

    // ExactSubstr removal scale probe: 1× vs 10× corpus. Window hashing
    // and reassembly are per-row scans; the dup-hash and canonical
    // aggregates are map-side combined; only duplicated occurrences fan
    // out (×minLen). The 10× corpus repeats each doc with a distinct
    // suffix, so duplicated-window mass grows ~linearly with docs —
    // time must too (quadratic would flag a pairwise join hiding in the
    // pipeline).
    {
      def removal(d: org.apache.spark.sql.DataFrame): Long =
        Dedup.removeDuplicatedSpans(d, "doc_id", "text", minLen = 8)
          .agg(sum($"n_removed")).collect().head.getLong(0)
      val docsS = docs.repartition(32)
      time("K1 substr removal 1x")(println("  removed=" + removal(docsS)))
      val big = (0 until 10).map(i =>
          docs.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"),
            concat($"text", lit(s" v$i")).as("text")))
        .reduce(_ unionByName _)
        .repartition(32)
      time("K10 substr removal 10x")(println("  removed10x=" + removal(big)))
    }

    // Sketch-family scale probe: 1× vs 10× input. State is capacity-
    // bounded for all three, so cost must track the scan alone; the 10×
    // corpus also pushes Misra-Gries/KLL well past capacity, exercising
    // the eviction/compaction paths the fixtures (exact regime) don't.
    {
      import graft.operators.{DistinctSketch, HeavyHitters, QuantileSketch}
      def big10(d: org.apache.spark.sql.DataFrame) =
        (0 until 10).map(i =>
            d.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"),
              concat($"text", lit(s" v$i")).as("text"),
              ($"n_chars" + lit(i)).as("n_chars")))
          .reduce(_ unionByName _)
          .repartition(32)
      val d1 = docs.select($"doc_id", $"text", $"n_chars").repartition(32)
      val d10 = big10(docs)
      time("L1 heavy hitters 1x")(
        HeavyHitters.topTerms(d1, "text", 20, k = 256).collect())
      time("L10 heavy hitters 10x")(
        HeavyHitters.topTerms(d10, "text", 20, k = 256).collect())
      time("M1 quantile sketch 1x")(
        QuantileSketch.quantiles(d1, "n_chars",
          Seq(BigDecimal("0.5"), BigDecimal("0.99")), cap = 256).collect())
      time("M10 quantile sketch 10x")(
        QuantileSketch.quantiles(d10, "n_chars",
          Seq(BigDecimal("0.5"), BigDecimal("0.99")), cap = 256).collect())
      time("N1 kmv distinct 1x")(
        println("  n=" + DistinctSketch.distinctCount(d1, $"text", k = 1024)
          .head.getLong(0)))
      time("N10 kmv distinct 10x")(
        println("  n10=" + DistinctSketch.distinctCount(d10, $"text", k = 1024)
          .head.getLong(0)))
    }

    spark.stop()
  }
}
