package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics, Spark-first: each PageRank round is one
  * declarative join + aggregation over the (src, dst) edge relation — the
  * DataFrame rendering of the Pregel superstep — so Catalyst/AQE plan every
  * round (broadcast the rank table while it is small, shuffle-join on the
  * edge key at scale) and the loop lives on the driver as PLAN construction
  * only (no data ever collects).
  *
  * Engine-exact arithmetic: ranks are INTEGER-scaled (×10¹²) and every
  * PageRank operation is integer — floor division for the per-edge share
  * (`r div deg`), `85 · Σ div 100` for the damping — so five rounds produce
  * bit-identical BIGINTs on any engine, and the DuckDB oracle simply
  * unrolls the same five rounds as chained CTEs. No float ever appears.
  * The flooring drift (Σ ranks < scale) is part of the defined semantics,
  * identical on both sides. */
object Graph {

  /** PageRank with damping 0.85 over a directed edge list, `iterations`
    * rounds from a uniform start, all arithmetic integer at `scale`:
    *
    *   r₀(v)    = scale div N
    *   rᵢ₊₁(v) = (15·scale div 100) div N
    *             + 85 · Σ_{(u,v)∈E} (rᵢ(u) div deg(u)) div 100
    *
    * Input `edges` must have columns (src, dst); duplicate edges should be
    * de-duplicated by the caller if multiplicity is not intended. Nodes =
    * union of both endpoints, so sinks (no out-edges) and sources (no
    * in-edges) both carry ranks; a sink's rank simply leaks (the classic
    * unnormalized treatment — defined identically in the oracle).
    *
    * Scale shape: deg and the node set derive from the edge relation once;
    * each round shuffles the edge relation by src (join) then by dst
    * (aggregate) — two exchanges per round over edge-sized data, rank
    * tables stay node-sized and broadcast while small. The driver loop
    * builds the PLAN; nothing collects. */
  def pageRank(edges: DataFrame, srcCol: Column, dstCol: Column,
      iterations: Int, scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    // The edge relation (with out-degree attached ONCE) persists for the
    // loop — the standard posture for iterative graph ops (SCALE.md
    // principle 7): without it every round lazily re-derives the caller's
    // edge-construction plan (for the co-purchase graph, a self-join +
    // distinct — measured ~5× the rollup cost when recomputed per round).
    // The node and count tables are derived once off the same cache.
    val ed = edges.select(srcCol.as("src"), dstCol.as("dst"))
    val deg = ed.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val edDeg = ed.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = edDeg.select(col("src").as("v"))
      .union(edDeg.select(col("dst").as("v"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = nodes.agg(count(lit(1)).as("nn"))
    // `div` (SQL integer division), never `/`: a double quotient that
    // lands within an ulp of an integer would cast-truncate differently
    // than the oracle's integer `//`
    var ranks = nodes.crossJoin(broadcast(n))
      .select(col("v"), expr(s"${scale}L div nn").as("r"))
    var i = 0
    while (i < iterations) {
      val contrib = edDeg
        .join(ranks.withColumnRenamed("v", "src"), "src")
        .groupBy(col("dst").as("v"))
        .agg(sum(expr("r div deg")).as("s"))
      ranks = nodes.crossJoin(broadcast(n))
        .join(contrib, Seq("v"), "left")
        .select(col("v"),
          (expr(s"${scale * 15L / 100L} div nn") +
            expr("85 * coalesce(s, 0L) div 100")).as("r"))
      i += 1
      // lineage cap for long runs: every 8 rounds the (node-sized,
      // integer, deterministic) rank table materializes and the plan
      // restarts from it — without this a 50-round plan is 50 joins deep
      // (analyzer cost superlinear, task binaries grow per round)
      if (i % 8 == 0 && i < iterations) ranks = ranks.localCheckpoint()
    }
    // materialize the final node-sized rank table, then drop the two
    // edge-sized caches: without this every call leaked edDeg+nodes for
    // any caller not wrapped in a clearCache (library hygiene). The
    // localCheckpoint is eager and the ranks are deterministic integers,
    // so truncating lineage loses nothing.
    val out = ranks.localCheckpoint()
    edDeg.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out
  }
}
