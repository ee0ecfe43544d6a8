package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{DotProductExpr, GopherStatsExpr, HyperplaneSigExpr,
  MinHashSigExpr, MysqlGeometryWktExpr, MysqlJsonBinaryExpr, PosSpanHashExpr,
  RepetitionStatsExpr, SimHash64Expr, UnicodeNormalizeExpr, UnitVecExpr,
  WsTokenCountExpr}
import graft.plans.TopOneWindowToMaxBy

/** Session extensions: register the engine's native expressions as SQL
  * functions and install the latest-state optimizer rule, so every scalar
  * kernel the Column API exposes is equally reachable from `spark.sql`.
  * Enable at session build with `spark.sql.extensions=graft.GraftExtensions`,
  * or on an already-running session via [[GraftExtensions.install]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => TopOneWindowToMaxBy)
    GraftExtensions.functions.foreach(ext.injectFunction)
  }
}

object GraftExtensions {

  private def intLit(fn: String, arg: String, e: Expression): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an INT literal, got $other")
  }

  private def strLit(fn: String, arg: String, e: Expression): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a STRING literal, got $other")
  }

  private def doubleLit(fn: String, arg: String, e: Expression): Double = e match {
    case Literal(d: Double, org.apache.spark.sql.types.DoubleType) => d
    case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
    case Literal(i: Int, IntegerType) => i.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a numeric literal, got $other")
  }

  private def arity(fn: String, n: Int)(args: Seq[Expression]): Seq[Expression] = {
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n argument(s), got ${args.length}")
    args
  }

  private def entry(name: String, clazz: Class[_])(
      builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)

  /** Every registrable native expression. Config-bound expressions whose
    * extra state is not literal-expressible (PQ codebooks, bloom bytes,
    * centroid tables) stay Column-API-only by design — they are built by
    * their operators, not typed by hand. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    entry("simhash64", classOf[SimHash64Expr]) { args =>
      SimHash64Expr(arity("simhash64", 1)(args).head)
    },
    entry("minhash_sig", classOf[MinHashSigExpr]) { args =>
      val Seq(c, k) = arity("minhash_sig", 2)(args)
      MinHashSigExpr(c, intLit("minhash_sig", "k", k))
    },
    entry("ws_token_count", classOf[WsTokenCountExpr]) { args =>
      WsTokenCountExpr(arity("ws_token_count", 1)(args).head)
    },
    entry("gopher_stats", classOf[GopherStatsExpr]) { args =>
      GopherStatsExpr(arity("gopher_stats", 1)(args).head)
    },
    entry("repetition_stats", classOf[RepetitionStatsExpr]) { args =>
      RepetitionStatsExpr(arity("repetition_stats", 1)(args).head)
    },
    entry("unicode_normalize", classOf[UnicodeNormalizeExpr]) { args =>
      val Seq(c, f) = arity("unicode_normalize", 2)(args)
      UnicodeNormalizeExpr(c, strLit("unicode_normalize", "form", f))
    },
    entry("dot_product", classOf[DotProductExpr]) { args =>
      val Seq(a, b) = arity("dot_product", 2)(args)
      DotProductExpr(a, b)
    },
    entry("unit_vec", classOf[UnitVecExpr]) { args =>
      UnitVecExpr(arity("unit_vec", 1)(args).head)
    },
    entry("hyperplane_sig", classOf[HyperplaneSigExpr]) { args =>
      val Seq(c, p, o) = arity("hyperplane_sig", 3)(args)
      HyperplaneSigExpr(c, intLit("hyperplane_sig", "planes", p),
        intLit("hyperplane_sig", "planeOffset", o))
    },
    entry("pos_span_hashes", classOf[PosSpanHashExpr]) { args =>
      val Seq(c, n) = arity("pos_span_hashes", 2)(args)
      PosSpanHashExpr(c, intLit("pos_span_hashes", "n", n))
    },
    entry("mysql_json_decode", classOf[MysqlJsonBinaryExpr]) { args =>
      MysqlJsonBinaryExpr(arity("mysql_json_decode", 1)(args).head)
    },
    entry("mysql_geometry_wkt", classOf[MysqlGeometryWktExpr]) { args =>
      MysqlGeometryWktExpr(arity("mysql_geometry_wkt", 1)(args).head)
    },
    // aggregates: the analyzer wraps a bare AggregateFunction returned by
    // a registry builder into its AggregateExpression, same as built-ins
    entry("kmv_distinct", classOf[graft.functions.KmvDistinctAgg]) { args =>
      val Seq(h, k) = arity("kmv_distinct", 2)(args)
      graft.functions.KmvDistinctAgg(h, intLit("kmv_distinct", "k", k))
    },
    entry("heavy_hitters", classOf[graft.functions.HeavyHittersAgg]) { args =>
      val Seq(v, m, k) = arity("heavy_hitters", 3)(args)
      graft.functions.HeavyHittersAgg(v,
        intLit("heavy_hitters", "m", m), intLit("heavy_hitters", "k", k))
    },
    entry("top_k_by_score", classOf[graft.functions.TopKByScoreAgg]) { args =>
      val Seq(s, i, k) = arity("top_k_by_score", 3)(args)
      graft.functions.TopKByScoreAgg(s, i, intLit("top_k_by_score", "k", k))
    },
    entry("kmv_sketch", classOf[graft.functions.KmvSketchAgg]) { args =>
      val Seq(h, k) = arity("kmv_sketch", 2)(args)
      graft.functions.KmvSketchAgg(h, intLit("kmv_sketch", "k", k))
    },
    entry("hh_sketch", classOf[graft.functions.HhSketchAgg]) { args =>
      val Seq(v, m) = arity("hh_sketch", 2)(args)
      graft.functions.HhSketchAgg(v, intLit("hh_sketch", "m", m))
    },
    entry("hh_merge", classOf[graft.functions.HhMergeAgg]) { args =>
      graft.functions.HhMergeAgg(arity("hh_merge", 1)(args).head)
    },
    entry("hh_topk", classOf[graft.functions.HhTopKExpr]) { args =>
      val Seq(s, k) = arity("hh_topk", 2)(args)
      graft.functions.HhTopKExpr(s, intLit("hh_topk", "k", k))
    },
    entry("kmv_merge", classOf[graft.functions.KmvMergeAgg]) { args =>
      graft.functions.KmvMergeAgg(arity("kmv_merge", 1)(args).head)
    },
    entry("kmv_estimate", classOf[graft.functions.KmvEstimateExpr]) { args =>
      graft.functions.KmvEstimateExpr(arity("kmv_estimate", 1)(args).head)
    },
    entry("kmv_union", classOf[graft.functions.KmvUnionExpr]) { args =>
      val Seq(a, b) = arity("kmv_union", 2)(args)
      graft.functions.KmvUnionExpr(a, b)
    },
    entry("kmv_intersect_est", classOf[graft.functions.KmvIntersectEstExpr]) { args =>
      val Seq(a, b) = arity("kmv_intersect_est", 2)(args)
      graft.functions.KmvIntersectEstExpr(a, b)
    },
    entry("kll_sketch", classOf[graft.functions.KllSketchAgg]) { args =>
      val Seq(v, k) = arity("kll_sketch", 2)(args)
      graft.functions.KllSketchAgg(v, intLit("kll_sketch", "k", k))
    },
    entry("kll_merge", classOf[graft.functions.KllMergeAgg]) { args =>
      graft.functions.KllMergeAgg(arity("kll_merge", 1)(args).head)
    },
    // variadic: kll_quantiles_of(sketch, q1[, q2, ...]) -> array<double>
    entry("kll_quantiles_of", classOf[graft.functions.KllQuantilesExpr]) { args =>
      if (args.length < 2) throw new IllegalArgumentException(
        "kll_quantiles_of expects (sketch, q1[, q2, ...]), got " + args.length)
      graft.functions.KllQuantilesExpr(args.head,
        args.drop(1).map(doubleLit("kll_quantiles_of", "q", _)))
    },
    // variadic: kll_quantiles(value, k, q1[, q2, ...]) -> array<double>
    entry("kll_quantiles", classOf[graft.functions.KllQuantileAgg]) { args =>
      if (args.length < 3) throw new IllegalArgumentException(
        "kll_quantiles expects (value, k, q1[, q2, ...]), got " + args.length)
      graft.functions.KllQuantileAgg(args.head,
        intLit("kll_quantiles", "k", args(1)),
        args.drop(2).map(doubleLit("kll_quantiles", "q", _)))
    }
  )

  /** Post-hoc installation into a session that was built without
    * `spark.sql.extensions` — registers the same functions into the
    * session's registry and appends the optimizer rule (idempotent). */
  def install(spark: SparkSession): Unit = {
    val reg = org.apache.spark.sql.GraftBridge.functionRegistry(spark)
    functions.foreach { case (name, info, builder) =>
      reg.registerFunction(name, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(TopOneWindowToMaxBy))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopOneWindowToMaxBy
  }
}
