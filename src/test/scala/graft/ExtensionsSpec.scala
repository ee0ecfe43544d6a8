package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.Row

import graft.functions._

/** The SQL surface: every native expression registered by GraftExtensions
  * must be reachable from `spark.sql` and agree with its Column-API form —
  * registration correctness, not algorithm correctness (the algos have their
  * own golden-vector specs). */
class ExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  GraftExtensions.install(spark)

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("install is idempotent and registers every declared function") {
    GraftExtensions.install(spark) // second call must not throw or duplicate
    assert(spark.experimental.extraOptimizations
      .count(_ == graft.plans.TopOneWindowToMaxBy) == 1)
    GraftExtensions.functions.foreach { case (name, _, _) =>
      assert(GraftBridge.functionRegistry(spark).functionExists(name),
        s"${name.funcName} not registered")
    }
  }

  test("text kernels: ws_token_count, unicode_normalize, simhash64, minhash_sig, pos_span_hashes") {
    Seq((1L, "a b  c", Seq("a", "b", "c")), (2L, " ", Seq("x")))
      .toDF("id", "s", "toks").createOrReplaceTempView("ext_txt")
    val sql = spark.sql(
      """SELECT id, ws_token_count(s) AS n, unicode_normalize(s, 'NFC') AS nf,
        |       simhash64(toks) AS sh, minhash_sig(toks, 4) AS mh,
        |       pos_span_hashes(toks, 2) AS sp
        |FROM ext_txt""".stripMargin)
    val api = spark.table("ext_txt").select(col("id"),
      GraftBridge.toCol(WsTokenCountExpr(GraftBridge.toExpr(col("s")))).as("n"),
      GraftBridge.toCol(UnicodeNormalizeExpr(GraftBridge.toExpr(col("s")), "NFC")).as("nf"),
      GraftBridge.toCol(SimHash64Expr(GraftBridge.toExpr(col("toks")))).as("sh"),
      GraftBridge.toCol(MinHashSigExpr(GraftBridge.toExpr(col("toks")), 4)).as("mh"),
      GraftBridge.toCol(PosSpanHashExpr(GraftBridge.toExpr(col("toks")), 2)).as("sp"))
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
  }

  test("vector kernels: dot_product, unit_vec, hyperplane_sig") {
    val row = spark.sql(
      """SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       unit_vec(array(3.0D, 4.0D)) AS u,
        |       hyperplane_sig(array(3.0D, 4.0D), 16, 0) AS h""".stripMargin).head
    assert(row.getDouble(0) == 11.0)
    assert(row.getSeq[Double](1) == Seq(0.6, 0.8))
    val apiSig = Seq(Seq(3.0, 4.0)).toDF("v")
      .select(GraftBridge.toCol(HyperplaneSigExpr(GraftBridge.toExpr(col("v")), 16, 0)))
      .head.getLong(0)
    assert(row.getLong(2) == apiSig)
  }

  test("mysql kernels: json decode and geometry wkt from SQL") {
    // the MysqlValuesSpec golden vectors, through the SQL names
    val srid = "00000000"
    val pt = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def d(v: Double): String = {
      val bb = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putDouble(v); bb.array().map("%02X".format(_)).mkString
    }
    Seq((hex("00 0100 0C00 0B00 0100 05 4500 6B"),
         hex(s"$srid 01 01000000 ${d(-3)} ${d(7.5)}")))
      .toDF("j", "g").createOrReplaceTempView("ext_bin")
    val out = spark.sql(
      "SELECT mysql_json_decode(j) AS js, mysql_geometry_wkt(g) AS wkt FROM ext_bin").head
    assert(out.getString(0) == """{"k":69}""")
    assert(out.getString(1) == "POINT(-3 7.5)")
  }

  test("literal-argument misuse raises a clear error, not a mis-plan") {
    Seq((Seq("a", "b"))).toDF("toks").createOrReplaceTempView("ext_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(toks, id) FROM (SELECT toks, 3 AS id FROM ext_bad)")
        .collect()
    }
    // any analysis-time failure naming the function is acceptable
    assert(e.getMessage.contains("minhash_sig"))
  }

  test("sketch aggregates from SQL equal the Column API and exact references") {
    spark.range(0, 5000).selectExpr("id", "id % 700 AS v", "id % 2 AS g")
      .createOrReplaceTempView("ext_sk")
    // KMV below k: exact == count(distinct)
    val kmv = spark.sql(
      "SELECT g, kmv_distinct(xxhash64(v), 2048) AS d FROM ext_sk GROUP BY g")
      .as[(Long, Long)].collect().toMap
    val exact = spark.sql("SELECT g, count(DISTINCT v) FROM ext_sk GROUP BY g")
      .as[(Long, Long)].collect().toMap
    assert(kmv == exact)
    // SpaceSaving below m: top-3 == exact GROUP BY top-3
    val hh = spark.sql(
      """SELECT h.value, h.cnt FROM (
        |  SELECT explode(heavy_hitters(v, 1024, 3)) AS h FROM ext_sk)""".stripMargin)
      .as[(Long, Long)].collect().toSeq
    val top = spark.sql(
      """SELECT v, count(*) AS c FROM ext_sk GROUP BY v
        |ORDER BY c DESC, v LIMIT 3""".stripMargin)
      .as[(Long, Long)].collect().toSeq
    assert(hh == top)
    // bounded top-k aggregate from SQL
    val tk = spark.sql(
      """SELECT t.id, t.score FROM (
        |  SELECT explode(top_k_by_score(CAST(v AS DOUBLE), id, 2)) AS t FROM ext_sk)""".stripMargin)
      .as[(Long, Double)].collect().toSeq
    // score ties break toward the smaller id: v=699 at ids 699 and 1399
    assert(tk == Seq((699L, 699.0), (1399L, 699.0)))
  }

  test("installed optimizer rule rewrites latest-state windows in pure SQL") {
    Seq((1, "a", 10L), (2, "a", 20L), (3, "b", 5L))
      .toDF("ev", "key", "ts").createOrReplaceTempView("ext_ls")
    val q = spark.sql(
      """SELECT key, ev FROM (
        |  SELECT key, ev, row_number() OVER (PARTITION BY key ORDER BY ts DESC, ev DESC) rn
        |  FROM ext_ls) WHERE rn = 1""".stripMargin)
    assert(q.queryExecution.optimizedPlan.toString.contains("max_by"))
    assert(q.as[(String, Int)].collect().toSet == Set(("a", 2), ("b", 3)))
  }
}
