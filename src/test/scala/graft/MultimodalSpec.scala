package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("decodePartitioned (mapPartitions decoder) agrees with the Column-level stub") {
    import spark.implicits._
    val df = Seq((1L, "hello world"), (2L, "another payload"), (3L, ""))
      .toDF("id", "text")
      .withColumn("bin", Multimodal.payload($"text"))
    val viaPartitions = Multimodal.decodePartitioned(df, "bin", Multimodal.StubDecoder(4))
      .select($"id", $"decoded.n_bytes", $"decoded.width", $"decoded.height",
        $"decoded.format",
        element_at($"decoded.features", 1).cast("double").as("f0"))
    val viaColumns = df
      .withColumn("meta", Multimodal.fakeDecodeMeta($"bin"))
      .withColumn("f", Multimodal.fakeFeatures($"bin", 4))
      .select($"id", $"meta.n_bytes", $"meta.width", $"meta.height", $"meta.format",
        element_at($"f", 1).cast("float").cast("double").as("f0"))
    val a = viaPartitions.orderBy("id").collect().map(_.toSeq)
    val b = viaColumns.orderBy("id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("decoder schema and batch shape survive partitioning") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, s"payload $i")).toDF("id", "text")
      .withColumn("bin", Multimodal.payload($"text"))
      .repartition(7)
    val out = Multimodal.decodePartitioned(df, "bin", Multimodal.StubDecoder(8))
    assert(out.schema.fieldNames.toSeq == Seq("id", "text", "bin", "decoded"))
    assert(out.count() == 100)
    val dims = out.select(size($"decoded.features")).distinct().collect().map(_.getInt(0))
    assert(dims.toSeq == Seq(8))
  }
}
