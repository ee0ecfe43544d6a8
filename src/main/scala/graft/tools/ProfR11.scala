package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Throwaway profiling main (round-11 optimization session): stage timings
  * for the pagerank/ppr edge construction and the phash-clusters star
  * contraction, plus an engine-vs-engine equivalence check for the
  * src-partitioned distinct variant. */
object ProfR11 {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val li = graft.SparkEntry.t(spark, d, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))

    // --- pagerank edge construction: current vs src-partitioned distinct ---
    def edgesCur = li.select(col("ok"), col("pk").as("src"))
      .join(li.select(col("ok"), col("pk").as("dst")), "ok")
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
    def edgesNew = li.select(col("ok"), col("pk").as("src"))
      .join(li.select(col("ok"), col("pk").as("dst")), "ok")
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").repartition(col("src")).distinct()
    t("edges current (distinct) noop")(noop(edgesCur))
    t("edges src-part (distinct) noop")(noop(edgesNew))
    t("edges current again")(noop(edgesCur))
    t("edges src-part again")(noop(edgesNew))
    t("pagerank current total")(noop(
      graft.operators.Graph.pageRank(edgesCur, col("src"), col("dst"), 3)))
    spark.sharedState.cacheManager.clearCache()
    t("pagerank src-part total")(noop(
      graft.operators.Graph.pageRank(edgesNew, col("src"), col("dst"), 3)))
    spark.sharedState.cacheManager.clearCache()
    // equivalence: integer pagerank is deterministic, so rows must be equal
    val a = graft.operators.Graph.pageRank(edgesCur, col("src"), col("dst"), 3)
    spark.sharedState.cacheManager.clearCache()
    val b = graft.operators.Graph.pageRank(edgesNew, col("src"), col("dst"), 3)
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"[prof] pagerank equivalence diff rows: $diff")
    spark.sharedState.cacheManager.clearCache()

    // --- phash clusters: pairs vs contraction split ---
    import spark.implicits._
    val withPng = graft.SparkEntry.t(spark, d, "documents")
      .filter(length(col("text")) >= 64)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        (id, graft.operators.Multimodal.ImageCodec.buildPng(8, 8,
          java.util.Arrays.copyOf(text.getBytes("US-ASCII"), 64)))
      }.toDF("doc_id", "payload")
    val pairs = graft.operators.Multimodal.phashNearDup(
        graft.operators.Multimodal.perceptualHash(withPng, "payload"),
        col("doc_id"), col("ahash"), maxHamming = 6, bands = 8,
        comboBands = 2, saltHotDf = 2048, saltBlocks = 16)
      .select(col("a_id"), col("b_id"))
    val np = t("pairs count")(pairs.count())
    println(s"[prof] n pairs: $np")
    val res = t("resolveCanonicalStars")(
      graft.operators.Dedup.resolveCanonicalStars(pairs))
    t("cluster census noop")(noop(
      res.groupBy(col("canonical_id")).agg(count(lit(1)).as("n"))))
    spark.stop()
  }
}
/* appended: round-count instrumentation for the star contraction */
object ProfStars {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val withPng = graft.SparkEntry.t(spark, d, "documents")
      .filter(length(col("text")) >= 64)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        (id, graft.operators.Multimodal.ImageCodec.buildPng(8, 8,
          java.util.Arrays.copyOf(text.getBytes("US-ASCII"), 64)))
      }.toDF("doc_id", "payload")
    val pairs = graft.operators.Multimodal.phashNearDup(
        graft.operators.Multimodal.perceptualHash(withPng, "payload"),
        col("doc_id"), col("ahash"), maxHamming = 6, bands = 8,
        comboBands = 2, saltHotDf = 2048, saltBlocks = 16)
      .select(col("a_id"), col("b_id"))
    // replicate resolveCanonicalStars with per-round timing
    var edges = pairs.select(col("a_id").as("u"), col("b_id").as("v"))
      .union(pairs.select(col("b_id").as("u"), col("a_id").as("v")))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(false)
    def star(e: org.apache.spark.sql.DataFrame, large: Boolean, dedup: Boolean) = {
      val grouped = e.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"), collect_list(col("v")).as("nbrs"))
      val withSel = grouped.select(col("u"), col("m"),
        (if (large) filter(col("nbrs"), w => w > col("u"))
         else array_union(filter(col("nbrs"), w => w <= col("u")), array(col("u")))).as("sel"))
      val emitted = withSel.select(col("m"), explode(col("sel")).as("w"))
        .filter(col("m") =!= col("w"))
      val sym = emitted.select(col("w").as("u"), col("m").as("v"))
        .union(emitted.select(col("m").as("u"), col("w").as("v")))
      if (dedup) sym.distinct() else sym
    }
    def signature(e: org.apache.spark.sql.DataFrame) =
      e.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).collect()(0)
    var t0 = System.nanoTime()
    var prevSig = signature(edges)
    println(f"[prof] initial edges+sig: ${(System.nanoTime()-t0)/1e9}%.2f s  sig=$prevSig")
    var rounds = 0; var stable = false
    while (!stable && rounds < 50) {
      t0 = System.nanoTime()
      val next = star(star(edges, large = true, dedup = false),
        large = false, dedup = true).localCheckpoint(false)
      val sig = signature(next)
      stable = sig == prevSig; prevSig = sig; edges = next; rounds += 1
      println(f"[prof] round $rounds: ${(System.nanoTime()-t0)/1e9}%.2f s  sig=$sig stable=$stable")
    }
    spark.stop()
  }
}
/* appended: plan dump for the pagerank edge-construction variants (the gated
 * body materializes per round, so Explain on it shows only the final
 * checkpointed RDD; the lazy checkpointEvery=0 form has the same logical
 * round algebra and shows the construction plan). */
object ExplainPr {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.SparkEntry.t(spark, d, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    def base = li.select(col("ok"), col("pk").as("src"))
      .join(li.select(col("ok"), col("pk").as("dst")), "ok")
      .filter(col("src") =!= col("dst"))
      .select("src", "dst")
    val seeds = li.select(col("pk").as("v")).distinct()
      .filter(col("v") % 97 === 0)
    for ((name, edges) <- Seq(
        "q_pagerank_before" -> base.distinct(),
        "q_pagerank_after" -> base.repartition(col("src")).distinct())) {
      println(s"\n========== $name ==========")
      println(graft.operators.Graph.pageRank(edges, col("src"), col("dst"),
          graft.SparkEntry.PageRankRounds, checkpointEvery = 0)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      println(s"\n========== ${name.replace("pagerank", "ppr")} ==========")
      println(graft.operators.Graph.personalizedPageRank(edges, col("src"),
          col("dst"), seeds, col("v"), graft.SparkEntry.PageRankRounds,
          checkpointEvery = 0)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
/* appended: double-star-per-job contraction experiment + triangles split */
object ProfStars2 {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val withPng = graft.SparkEntry.t(spark, d, "documents")
      .filter(length(col("text")) >= 64)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        (id, graft.operators.Multimodal.ImageCodec.buildPng(8, 8,
          java.util.Arrays.copyOf(text.getBytes("US-ASCII"), 64)))
      }.toDF("doc_id", "payload")
    def pairs = graft.operators.Multimodal.phashNearDup(
        graft.operators.Multimodal.perceptualHash(withPng, "payload"),
        col("doc_id"), col("ahash"), maxHamming = 6, bands = 8,
        comboBands = 2, saltHotDf = 2048, saltBlocks = 16)
      .select(col("a_id"), col("b_id"))
    def star(e: org.apache.spark.sql.DataFrame, large: Boolean, dedup: Boolean) = {
      val grouped = e.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"), collect_list(col("v")).as("nbrs"))
      val withSel = grouped.select(col("u"), col("m"),
        (if (large) filter(col("nbrs"), w => w > col("u"))
         else array_union(filter(col("nbrs"), w => w <= col("u")), array(col("u")))).as("sel"))
      val emitted = withSel.select(col("m"), explode(col("sel")).as("w"))
        .filter(col("m") =!= col("w"))
      val sym = emitted.select(col("w").as("u"), col("m").as("v"))
        .union(emitted.select(col("m").as("u"), col("w").as("v")))
      if (dedup) sym.distinct() else sym
    }
    def signature(e: org.apache.spark.sql.DataFrame) =
      e.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).collect()(0)
    def contract(doubled: Boolean): Int = {
      var edges = pairs.select(col("a_id").as("u"), col("b_id").as("v"))
        .union(pairs.select(col("b_id").as("u"), col("a_id").as("v")))
        .filter(col("u") =!= col("v")).distinct()
        .localCheckpoint(false)
      var prevSig = signature(edges)
      var rounds = 0; var stable = false
      while (!stable && rounds < 50) {
        var next = star(star(edges, large = true, dedup = false),
          large = false, dedup = true)
        if (doubled) next = star(star(next, large = true, dedup = false),
          large = false, dedup = true)
        val ck = next.localCheckpoint(false)
        val sig = signature(ck)
        stable = sig == prevSig; prevSig = sig; edges = ck; rounds += 1
      }
      rounds
    }
    val r1 = t("contract single-star rounds")(contract(false))
    spark.sharedState.cacheManager.clearCache()
    val r2 = t("contract double-star rounds")(contract(true))
    println(s"[prof] rounds single=$r1 double=$r2")

    // triangles split
    val li = graft.SparkEntry.t(spark, d, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val edges = graft.operators.Graph.coOccurrenceEdges(
      li, col("ok"), col("pk"), maxBasket = 32)
    t("triangles edges count")(println("[prof] n edges: " + edges.count()))
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
    t("triangles und count")(println("[prof] n und: " + und.count()))
    val deg = und.select(col("a").as("v")).union(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"), "a")
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"), "b")
    val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val ori = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("w"),
      when(aFirst, col("db")).otherwise(col("da")).as("dw"))
    val e1 = ori.select(col("u"), col("w").as("v1"), col("dw").as("d1"))
    val e2 = ori.select(col("u"), col("w").as("v2"), col("dw").as("d2"))
    val wedges = e1.join(e2, Seq("u"))
      .filter(col("d1") < col("d2") || (col("d1") === col("d2") && col("v1") < col("v2")))
    t("triangles wedge count")(println("[prof] n wedges: " + wedges.count()))
    val closed = wedges.join(
      ori.select(col("u").as("v1"), col("w").as("v2")).hint("shuffle_hash"),
      Seq("v1", "v2"))
    t("triangles closed count")(println("[prof] n closed: " + closed.count()))
    t("triangles full query noop")(
      graft.SparkEntry.queries("q_triangles")(spark, d)
        .write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
/* appended: fair A/B for (a) materializing the co-occurrence edge relation
 * under triangleStats, (b) double-star contraction rounds. Both variants run
 * twice; compare the SECOND (warm-JVM) numbers. */
object ProfTri {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val li = graft.SparkEntry.t(spark, d, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    def edges = graft.operators.Graph.coOccurrenceEdges(
      li, col("ok"), col("pk"), maxBasket = 32)
    for (pass <- 1 to 2) {
      t(s"triangles current pass$pass") {
        noop(graft.operators.Graph.triangleStats(edges, col("src"), col("dst")))
      }
      spark.sharedState.cacheManager.clearCache()
      t(s"triangles edges-checkpoint pass$pass") {
        noop(graft.operators.Graph.triangleStats(
          edges.localCheckpoint(), col("src"), col("dst")))
      }
      spark.sharedState.cacheManager.clearCache()
      t(s"triangles und+ori-checkpoint pass$pass") {
        // inline triangleStats with materialized und and ori
        val und = edges.select(col("src").as("a"), col("dst").as("b"))
          .filter(col("a") =!= col("b"))
          .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
          .distinct().localCheckpoint()
        val deg = und.select(col("a").as("v")).union(und.select(col("b").as("v")))
          .groupBy("v").agg(count(lit(1)).as("d"))
        val withDeg = und
          .join(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"), "a")
          .join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"), "b")
        val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
        val ori = withDeg.select(
          when(aFirst, col("a")).otherwise(col("b")).as("u"),
          when(aFirst, col("b")).otherwise(col("a")).as("w"),
          when(aFirst, col("db")).otherwise(col("da")).as("dw")).localCheckpoint()
        val e1 = ori.select(col("u"), col("w").as("v1"), col("dw").as("d1"))
        val e2 = ori.select(col("u"), col("w").as("v2"), col("dw").as("d2"))
        val wedges = e1.join(e2, Seq("u"))
          .filter(col("d1") < col("d2") || (col("d1") === col("d2") && col("v1") < col("v2")))
        val closed = wedges.join(
          ori.select(col("u").as("v1"), col("w").as("v2")).hint("shuffle_hash"),
          Seq("v1", "v2"))
        val tri = closed.agg(count(lit(1)).as("n_triangles"))
        val wed = deg.agg(sum(expr("d * (d - 1) div 2")).as("n_wedges"))
        noop(tri.crossJoin(wed).select(
          col("n_triangles"), col("n_wedges"),
          when(col("n_wedges") > 0,
            expr("3000000 * n_triangles div n_wedges")).otherwise(lit(0L))
            .as("clustering_ppm")))
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
/* appended: star-contraction kernel variants — union-based symmetrization
 * (current) vs explode-based (single reference), and single vs double star
 * rounds per materialization. Fair A/B: pairs pre-materialized, each variant
 * run twice, compare second runs. */
object ProfStars3 {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val withPng = graft.SparkEntry.t(spark, d, "documents")
      .filter(length(col("text")) >= 64)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        (id, graft.operators.Multimodal.ImageCodec.buildPng(8, 8,
          java.util.Arrays.copyOf(text.getBytes("US-ASCII"), 64)))
      }.toDF("doc_id", "payload")
    val pairs = graft.operators.Multimodal.phashNearDup(
        graft.operators.Multimodal.perceptualHash(withPng, "payload"),
        col("doc_id"), col("ahash"), maxHamming = 6, bands = 8,
        comboBands = 2, saltHotDf = 2048, saltBlocks = 16)
      .select(col("a_id"), col("b_id")).localCheckpoint()
    def starU(e: org.apache.spark.sql.DataFrame, large: Boolean, dedup: Boolean) = {
      val grouped = e.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"), collect_list(col("v")).as("nbrs"))
      val withSel = grouped.select(col("u"), col("m"),
        (if (large) filter(col("nbrs"), w => w > col("u"))
         else array_union(filter(col("nbrs"), w => w <= col("u")), array(col("u")))).as("sel"))
      val emitted = withSel.select(col("m"), explode(col("sel")).as("w"))
        .filter(col("m") =!= col("w"))
      val sym = emitted.select(col("w").as("u"), col("m").as("v"))
        .union(emitted.select(col("m").as("u"), col("w").as("v")))
      if (dedup) sym.distinct() else sym
    }
    def starE(e: org.apache.spark.sql.DataFrame, large: Boolean, dedup: Boolean) = {
      val grouped = e.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"), collect_list(col("v")).as("nbrs"))
      val withSel = grouped.select(col("u"), col("m"),
        (if (large) filter(col("nbrs"), w => w > col("u"))
         else array_union(filter(col("nbrs"), w => w <= col("u")), array(col("u")))).as("sel"))
      val emitted = withSel.select(col("m"), explode(col("sel")).as("w"))
        .filter(col("m") =!= col("w"))
      val sym = emitted.select(explode(array(
          struct(col("w").as("u"), col("m").as("v")),
          struct(col("m").as("u"), col("w").as("v")))).as("p"))
        .select(col("p.u").as("u"), col("p.v").as("v"))
      if (dedup) sym.distinct() else sym
    }
    def signature(e: org.apache.spark.sql.DataFrame) =
      e.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).collect()(0)
    def contract(star: (org.apache.spark.sql.DataFrame, Boolean, Boolean) => org.apache.spark.sql.DataFrame,
                 explodeInit: Boolean, doubled: Boolean): Long = {
      var edges = (if (explodeInit)
          pairs.select(explode(array(
              struct(col("a_id").as("u"), col("b_id").as("v")),
              struct(col("b_id").as("u"), col("a_id").as("v")))).as("p"))
            .select(col("p.u").as("u"), col("p.v").as("v"))
        else pairs.select(col("a_id").as("u"), col("b_id").as("v"))
          .union(pairs.select(col("b_id").as("u"), col("a_id").as("v"))))
        .filter(col("u") =!= col("v")).distinct()
        .localCheckpoint(false)
      var prevSig = signature(edges)
      var rounds = 0; var stable = false
      while (!stable && rounds < 50) {
        var next = star(star(edges, true, false), false, true)
        if (doubled) next = star(star(next, true, false), false, true)
        val ck = next.localCheckpoint(false)
        val sig = signature(ck)
        stable = sig == prevSig; prevSig = sig; edges = ck; rounds += 1
      }
      val labels = edges.groupBy(col("u").as("id"))
        .agg(least(min(col("v")), first(col("u"))).as("canonical_id"))
      labels.agg(count(lit(1)), bit_xor(xxhash64(col("id"), col("canonical_id"))))
        .collect()(0).getLong(1)
    }
    for (pass <- 1 to 2) {
      val s1 = t(s"union single pass$pass")(contract(starU, false, false))
      val s2 = t(s"explode single pass$pass")(contract(starE, true, false))
      val s3 = t(s"explode double pass$pass")(contract(starE, true, true))
      println(s"[prof] label sigs: unionSingle=$s1 explodeSingle=$s2 explodeDouble=$s3")
    }
    spark.stop()
  }
}
