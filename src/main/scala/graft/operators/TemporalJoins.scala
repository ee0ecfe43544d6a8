package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively — as-of join and range join
  * — in their scale-shaped formulations (composed from existing operators,
  * preference (a) of the custom-operator ladder: no custom physical node
  * needed because union+window / bin+equi-join express the semantics with
  * the right data movement).
  */
object TemporalJoins {

  /** AS-OF join: for every probe row, the latest build row with
    * `build.ts <= probe.ts` on the same key (inner semantics: probes with no
    * prior build row are dropped).
    *
    * Formulation: tag + union + running `last(ignoreNulls)` window ordered
    * by (ts, side) — ONE shuffle on the key, no per-probe scan of build
    * history, no range explosion. The naive join+filter+rank does a key
    * join producing |probe|×|build-per-key| intermediates; this streams both
    * sides in time order, which is the only shape that survives a 100 TB
    * build side. Build rows sort before probes at equal ts (side 0 < 1), so
    * an exactly-simultaneous build row is visible — matching ASOF `>=`.
    *
    * @param buildPayload build columns to carry onto probe rows
    */
  def asOfJoin(probe: DataFrame, probeKey: Column, probeTs: Column,
               build: DataFrame, buildKey: Column, buildTs: Column,
               buildPayload: Seq[(String, Column)]): DataFrame = {
    val pCols = probe.columns
    // ALL payload columns ride in ONE struct with a non-null match marker:
    // a single last(ignoreNulls) fill can never mix payload fields from
    // different build rows, and nullable payload fields never drop a match.
    val bStruct = struct(
      (lit(1).as("__matched") +: buildPayload.map { case (n, c) => c.as(n) }): _*)
    val bStructType = build.select(bStruct.as("__b")).schema("__b").dataType
    val p = probe.select(
      (probeKey.as("__k") +: probeTs.as("__ts") +: lit(1).as("__side") +:
        pCols.map(c => probe(c)) :+
        lit(null).cast(bStructType).as("__b")): _*)
    val b = build.select(
      (buildKey.as("__k") +: buildTs.as("__ts") +: lit(0).as("__side") +:
        pCols.map(c => lit(null).cast(probe.schema(c).dataType).as(c)) :+
        bStruct.as("__b")): _*)
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = p.unionByName(b)
      .withColumn("__b", last(col("__b"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1 && col("__b").isNotNull)
      .select(pCols.map(col) ++ buildPayload.map { case (n, _) => col(s"__b.$n").as(n) }: _*)
  }

  /** FORWARD as-of join: for every probe row, the EARLIEST build row with
    * `build.ts >= probe.ts` on the same key — the "time to next event"
    * join (next price update, time-to-conversion). Same union+window
    * shape as [[asOfJoin]] mirrored in time: one shuffle on the key, a
    * `first(ignoreNulls)` fill over the FOLLOWING frame. Probes sort
    * before builds at equal ts (side 0 < 1) and the frame starts at the
    * current row, so an exactly-simultaneous build row is visible —
    * matching ASOF `<=`. */
  def asOfJoinForward(probe: DataFrame, probeKey: Column, probeTs: Column,
                      build: DataFrame, buildKey: Column, buildTs: Column,
                      buildPayload: Seq[(String, Column)]): DataFrame = {
    val pCols = probe.columns
    val bStruct = struct(
      (lit(1).as("__matched") +: buildPayload.map { case (n, c) => c.as(n) }): _*)
    val bStructType = build.select(bStruct.as("__b")).schema("__b").dataType
    val p = probe.select(
      (probeKey.as("__k") +: probeTs.as("__ts") +: lit(0).as("__side") +:
        pCols.map(c => probe(c)) :+
        lit(null).cast(bStructType).as("__b")): _*)
    val b = build.select(
      (buildKey.as("__k") +: buildTs.as("__ts") +: lit(1).as("__side") +:
        pCols.map(c => lit(null).cast(probe.schema(c).dataType).as(c)) :+
        bStruct.as("__b")): _*)
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = p.unionByName(b)
      .withColumn("__b", first(col("__b"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 0 && col("__b").isNotNull)
      .select(pCols.map(col) ++ buildPayload.map { case (n, _) => col(s"__b.$n").as(n) }: _*)
  }

  /** Range join (point-in-interval): pair every point with every interval
    * containing it, WITHOUT a cross product: both sides bucket into
    * fixed-width bins (intervals explode into the bins they overlap), the
    * join runs equi on the bin, and an exact range postfilter trims bin
    * edges. Join volume is points + Σ interval-widths/binWidth instead of
    * |points|×|intervals| — the standard spatial-binning trade. `binWidth`
    * should be ~the median interval length (wider: more postfilter waste;
    * narrower: more interval replication). */
  def rangeJoinPointInInterval(points: DataFrame, ptCol: Column,
                               intervals: DataFrame, startCol: Column, endCol: Column,
                               binWidth: Long): DataFrame = {
    val pts = points.withColumn("__bin", floor(ptCol.cast("long") / binWidth))
    val ivs = intervals
      .withColumn("__s", startCol.cast("long"))
      .withColumn("__e", endCol.cast("long"))
      .withColumn("__bin",
        explode(sequence(floor(col("__s") / binWidth), floor(col("__e") / binWidth))))
    pts.join(ivs, "__bin")
      .filter(ptCol.cast("long") >= col("__s") && ptCol.cast("long") < col("__e"))
      .drop("__bin", "__s", "__e")
  }

  /** Interval-OVERLAP join (interval × interval, closed intervals): pair
    * every left interval with every right interval it overlaps, WITHOUT a
    * cross product — the same fixed-width binning trade as
    * [[rangeJoinPointInInterval]], with both sides exploding into the
    * bins they span. Each qualifying pair is emitted EXACTLY ONCE with no
    * distinct: the overlap region of two overlapping intervals starts at
    * greatest(s₁, s₂), which lies in exactly one bin, and the pair is
    * kept only in that bin. Join volume is Σ span/binWidth per side
    * through bin keys instead of |L|×|R|; `binWidth` ≈ the median
    * interval length is the usual setting.
    *
    * Inputs arrive pre-projected with the interval bounds as epoch-long
    * columns named by `lS`/`lE` and `rS`/`rE` (plus any payload columns —
    * names must not collide across sides); returns the joined rows. */
  def intervalOverlapJoin(left: DataFrame, lS: String, lE: String,
                          right: DataFrame, rS: String, rE: String,
                          binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // integral div (house rule: never floor(double /) across an integer
    // boundary); bounds are epoch-nonnegative so div == floor
    val l = left.withColumn("__bl",
      explode(sequence(expr(s"$lS div ${binWidth}L"), expr(s"$lE div ${binWidth}L"))))
    val r = right.withColumn("__br",
      explode(sequence(expr(s"$rS div ${binWidth}L"), expr(s"$rE div ${binWidth}L"))))
    l.join(r, col("__bl") === col("__br") &&
        col(lS) <= col(rE) && col(rS) <= col(lE) &&
        col("__bl") === expr(s"greatest($lS, $rS) div ${binWidth}L"))
      .drop("__bl", "__br")
  }
}
