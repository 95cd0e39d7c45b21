package graft

import org.apache.spark.sql.functions._
import graft.ext.GraftFunctions
import graft.functions.{VectorFunctions => V}
import graft.operators.Dedup

class GraftExtensionsSpec extends SparkSpec {

  test("registered SQL functions match the Column-API kernels") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq((Seq(1.0f, 2.0f, 3.0f), Seq(0.5f, -1.0f, 2.0f), "a b c a"))
      .toDF("x", "y", "text").createOrReplaceTempView("ext_probe")

    val dot = spark.sql("SELECT graft_dot(x, y) FROM ext_probe").head.getDouble(0)
    assert(dot == 1.0 * 0.5 + 2.0 * -1.0 + 3.0 * 2.0)

    val viaSql = spark.sql(
      """SELECT graft_minhash_sig(graft_shingles(text, 2), 4) AS sig,
        |       graft_simhash32(graft_shingles(text, 1)) AS sh,
        |       graft_intersect_count(graft_shingles(text, 2),
        |                             graft_shingles(text, 2)) AS ic
        |FROM ext_probe""".stripMargin).head
    val viaApi = Seq("a b c a").toDF("text")
      .select(
        graft.expressions.TextHashExpressions.minhashSigF(Dedup.shingles($"text", 2), 4),
        graft.expressions.TextHashExpressions.simhash32F(Dedup.shingles($"text", 1)),
        size(Dedup.shingles($"text", 2)))
      .head
    assert(viaSql.getSeq[Long](0) == viaApi.getSeq[Long](0))
    assert(viaSql.getLong(1) == viaApi.getLong(1))
    assert(viaSql.getInt(2) == viaApi.getInt(2))

    // repetition-stats kernel over SQL: "a b c a" → 4 toks, 3 distinct,
    // max repeat 2, repeated chars 2 ("a"×2), total 4
    val rs = spark.sql(
      "SELECT graft_repeat_stats(graft_shingles(text, 1)) AS s FROM ext_probe")
      .select("s.n", "s.n_distinct", "s.max_repeat", "s.rep_chars", "s.total_chars")
      .head
    // NB graft_shingles dedups — probe the raw token split instead
    val rs2 = spark.sql(
      "SELECT graft_repeat_stats(split(text, ' ')) AS s FROM ext_probe")
      .select("s.n", "s.n_distinct", "s.max_repeat", "s.rep_chars", "s.total_chars")
      .head
    assert(rs.getInt(0) == 3 && rs.getInt(2) == 1, rs) // shingles: distinct
    assert((rs2.getInt(0), rs2.getInt(1), rs2.getInt(2),
      rs2.getLong(3), rs2.getLong(4)) == ((4, 3, 2, 2L, 4L)), rs2)

    val tri = spark.sql("SELECT graft_trigrams('Ab, cd!') AS t").head.getSeq[String](0)
    assert(tri == Seq("ab ", "b c", " cd"), tri)

    // char-entropy kernel: "aaaa" → 0; agreement with the Column API
    assert(spark.sql("SELECT graft_char_entropy('aaaa') AS h").head.getLong(0) == 0L)
    val heSql = spark.sql("SELECT graft_char_entropy(text) AS h FROM ext_probe")
      .head.getLong(0)
    val heApi = Seq("a b c a").toDF("text")
      .select(graft.functions.TextFunctions.charEntropyMicro($"text")).head.getLong(0)
    assert(heSql == heApi)

    // Jaro-Winkler kernel through SQL: DuckDB-pinned value
    assert(spark.sql("SELECT graft_jaro_winkler('martha', 'marhta') AS jw")
      .head.getDouble(0) == 0.9611111111111111)
  }

  test("non-literal size argument is rejected with a clear error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingles('a b', 1 + 1)").collect()
    }
    assert(e.getMessage.contains("INT literal") || e.getMessage.contains("graft_shingles"))
  }

  test("optimizer rule rewrites the declarative HOF dot to the native kernel") {
    import spark.implicits._
    import graft.expressions.FloatDotProduct
    import graft.functions.{VectorFunctions => V}
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(0.5f, -1.0f, 2.0f)),
      (Seq(0.0f, 0.0f, 1.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
      // keep a non-foldable node under the projection: Catalyst's
      // ConvertToLocalRelation otherwise evaluates the whole query at
      // plan time and there is no expression left to rewrite
      .repartition(2)
    def hasKernel(q: org.apache.spark.sql.DataFrame): Boolean =
      q.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[FloatDotProduct]))
    val query = df.select(V.dot($"a", $"b").as("dot"))
    assert(!hasKernel(query), "no rule installed yet")
    val before = query.collect().map(_.getDouble(0)).toSeq
    spark.experimental.extraOptimizations =
      Seq(graft.plans.RewriteHofDotProduct)
    try {
      val rewritten = df.select(V.dot($"a", $"b").as("dot"))
      assert(hasKernel(rewritten),
        s"rule must fire:\n${rewritten.queryExecution.optimizedPlan}")
      assert(rewritten.collect().map(_.getDouble(0)).toSeq == before,
        "kernel and HOF must agree bit-for-bit")
      // double arrays are NOT the kernel's contract — no rewrite
      val doubles = df.select($"a".cast("array<double>").as("ad"),
        $"b".cast("array<double>").as("bd"))
      assert(!hasKernel(doubles.select(V.dot($"ad", $"bd"))),
        "rule must not fire on ARRAY<DOUBLE>")
      // a cosine built FROM dot still gets its dot rewritten
      assert(hasKernel(df.select(V.cosine($"a", $"b"))))
    } finally spark.experimental.extraOptimizations = Nil
  }
}
