package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}

/** Native Catalyst expressions wrapping [[HashAlgos]] — preferred over Scala
  * UDFs because they stay inside whole-stage codegen (no per-row
  * serialization boundary, no closure dispatch): `doGenCode` emits one static
  * call whose loop the JIT compiles hot.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    HashAlgos.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashAlgos.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0 && k <= 1024, "minhash signature length must be in (0, 1024]")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    HashAlgos.minhashSig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashAlgos.minhashSig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** Native dot product over two DOUBLE arrays — wraps [[VecAlgos.dot]].
  * Replaces the interpreted `aggregate(zip_with(...))` fold in the hot
  * cosine/LSH-verify paths (bit-identical accumulation order for
  * equal-length inputs, which every engine pipeline produces). Mismatched
  * lengths yield NULL — the same surfacing the replaced fold gave (zip_with
  * null-pads, null poisons the sum), so a corrupt/truncated embedding drops
  * at the threshold filter instead of scoring on a plausible partial sum.
  * Inputs must already be ArrayType(DoubleType) (Similarity.asDouble /
  * transform-cast — all graft call sites do); enforced at analysis time. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null else VecAlgos.dot(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.VecAlgos.dot($a, $b);
      }
    """)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** Native asymmetric scalar-quantization score term — wraps
  * [[VecAlgos.sqDot]]. `left` is the vector's per-dimension SQ8 code ids
  * (array<int>), `right` the query's precomputed per-dimension weights
  * qn[j]·step[j] (array<double>). Runs per (query, vector) pair in the
  * compressed-domain scan, so it must stay inside whole-stage codegen;
  * a length mismatch (corrupt codes) yields NULL, never a partial score. */
case class SqScoreExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_score"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.IntegerType, _), ArrayType(DoubleType, _)) => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, array<double>), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null else VecAlgos.sqDot(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.VecAlgos.sqDot($a, $b);
      }
    """)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SqScoreExpr =
    copy(left = newLeft, right = newRight)
}

/** Native ADC (asymmetric distance computation) score for product-quantized
  * search — wraps [[VecAlgos.adcScore]]. `codes` is the vector's `m`
  * subspace code ids (array<int>), `table` the query's flattened m·k
  * lookup table (array<double>, subspace-major). Runs per (query, vector)
  * pair in the compressed-domain scan, so it must stay inside whole-stage
  * codegen; an out-of-range code yields NULL, never a partial score. */
case class AdcScoreExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k > 0, "codebook size k must be positive")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_score"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.IntegerType, _), ArrayType(DoubleType, _)) => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, array<double>), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val s = VecAlgos.adcScore(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], k)
    if (java.lang.Double.isNaN(s)) null else s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.functions.VecAlgos.adcScore($a, $b, $k);
      if (java.lang.Double.isNaN(${ev.value})) {
        ${ev.isNull} = true;
      }
    """)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): AdcScoreExpr =
    copy(left = newLeft, right = newRight)
}

/** Native random-hyperplane sign signature — wraps [[VecAlgos.hyperplaneSig]].
  * One codegen'd pass per row instead of `planes` interpreted zip_with+fold
  * traversals. Deterministic and self-consistent across the cluster (plane
  * components derive from XXH64.hashLong chains); NOT byte-compatible with
  * signatures produced by the composed built-in formulation this replaced
  * (Spark's xxhash64 hashes IntegerType args via hashInt), so persisted
  * buckets from before the switch must be rebuilt. */
case class HyperplaneSigExpr(child: Expression, planes: Int, planeOffset: Int)
    extends UnaryExpression {
  require(planes > 0 && planes <= 64, "planes must be in (0, 64]")
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double> input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    VecAlgos.hyperplaneSig(input.asInstanceOf[ArrayData], planes, planeOffset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VecAlgos.hyperplaneSig($c, $planes, $planeOffset)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigExpr =
    copy(child = newChild)
}

/** Positional n-gram span hashes — wraps [[HashAlgos.posSpanHashes]]:
  * array<long> of xxhash64 over space-joined token windows, bit-identical
  * to the `transform(sequence(...), i => xxhash64(array_join(slice(...))))`
  * composition it replaces (including the one-truncated-span edge for
  * docs shorter than n). */
case class PosSpanHashExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "n must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pos_span_hashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string> input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    HashAlgos.posSpanHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashAlgos.posSpanHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): PosSpanHashExpr =
    copy(child = newChild)
}

/** Unit-normalize a double vector — wraps [[VecAlgos.unitVec]] (same
  * float-op order as the per-element-lambda form; zero norms pass the
  * input through). */
case class UnitVecExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "unit_vec"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double> input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    VecAlgos.unitVec(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecAlgos.unitVec($c)")

  override protected def withNewChildInternal(newChild: Expression): UnitVecExpr =
    copy(child = newChild)
}

/** Scan-local PQ encode — wraps [[VecAlgos.pqEncode]]. `left` is the
  * unit-normalized vector, `right` the flattened (subspace-major) codebook,
  * in practice a [[org.apache.spark.sql.catalyst.expressions.Literal]]:
  * the codebook is driver-tiny by construction (m·k codewords), so encoding
  * becomes a pure projection — the former subspace-explode + broadcast-join
  * + double-groupBy plan paid two corpus-scale shuffles for the same codes.
  * Codes are bit-identical to that plan (same d2 float-op order, same
  * smaller-id tie-break); a short/mismatched vector yields NULL. */
case class PqEncodeExpr(left: Expression, right: Expression, m: Int, k: Int)
    extends BinaryExpression {
  require(m > 0 && k > 0, "m and k must be positive")
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(v: Any, cw: Any): Any =
    VecAlgos.pqEncode(v.asInstanceOf[ArrayData], cw.asInstanceOf[ArrayData], m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cw) => s"""
      ${ev.value} = graft.functions.VecAlgos.pqEncode($v, $cw, $m, $k);
      if (${ev.value} == null) {
        ${ev.isNull} = true;
      }
    """)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqEncodeExpr =
    copy(left = newLeft, right = newRight)
}

/** Scan-local per-query ADC lookup table — wraps [[VecAlgos.pqQueryTable]];
  * same codebook-literal convention as [[PqEncodeExpr]]. Replaces a
  * subspace-explode + broadcast-join + collect_list groupBy per query set
  * with a projection whose output feeds [[AdcScoreExpr]] directly. */
case class PqQueryTableExpr(left: Expression, right: Expression, m: Int, k: Int)
    extends BinaryExpression {
  require(m > 0 && k > 0, "m and k must be positive")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_query_table"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(v: Any, cw: Any): Any =
    VecAlgos.pqQueryTable(v.asInstanceOf[ArrayData], cw.asInstanceOf[ArrayData], m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cw) => s"""
      ${ev.value} = graft.functions.VecAlgos.pqQueryTable($v, $cw, $m, $k);
      if (${ev.value} == null) {
        ${ev.isNull} = true;
      }
    """)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqQueryTableExpr =
    copy(left = newLeft, right = newRight)
}

/** Scan-local IVF assignment — wraps [[VecAlgos.nearestCentroid]]. The
  * centroid matrix (centroid-major flat array<double>) and id list ride the
  * plan as literals (driver-tiny at any corpus scale), so assignment is a
  * pure codegen'd projection: zero shuffles AND no per-element interpreted
  * lambda (the `array_min(transform(...))` form this replaces evaluated k
  * struct allocations + an interpreted dot per element per row).
  * Bit-identical selection: highest round(cos,6), ties to the smaller id. */
case class NearestCentroidExpr(first: Expression, second: Expression, third: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  require(k > 0, "k must be positive")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _), ArrayType(LongType, _)) => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>, array<bigint>), got " +
        s"${first.dataType.simpleString}, ${second.dataType.simpleString}, ${third.dataType.simpleString}")
  }

  override protected def nullSafeEval(v: Any, flat: Any, ids: Any): Any =
    VecAlgos.nearestCentroid(v.asInstanceOf[ArrayData], flat.asInstanceOf[ArrayData],
      ids.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, flat, ids) =>
      s"${ev.value} = graft.functions.VecAlgos.nearestCentroid($v, $flat, $ids, $k);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NearestCentroidExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Scan-local IVF MULTIPROBE assignment — wraps [[VecAlgos.topCentroids]]:
  * the `p` nearest centroids per row (p = 1 degenerates to
  * [[NearestCentroidExpr]]'s pick), same plan-literal centroid matrix, same
  * rounded-cosine/smaller-id total order, returned in selection order.
  * Probing widens IVF recall (a query scores against its p nearest cells,
  * recovering neighbors the top-1 cell boundary hides) while assignment
  * stays a pure codegen'd projection: zero shuffles at any corpus scale. */
case class TopCentroidsExpr(first: Expression, second: Expression, third: Expression,
                            k: Int, p: Int)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  require(k > 0, "k must be positive")
  require(p > 0, "p must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_centroids"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _), ArrayType(LongType, _)) => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>, array<bigint>), got " +
        s"${first.dataType.simpleString}, ${second.dataType.simpleString}, ${third.dataType.simpleString}")
  }

  override protected def nullSafeEval(v: Any, flat: Any, ids: Any): Any =
    VecAlgos.topCentroids(v.asInstanceOf[ArrayData], flat.asInstanceOf[ArrayData],
      ids.asInstanceOf[ArrayData], k, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, flat, ids) =>
      s"${ev.value} = graft.functions.VecAlgos.topCentroids($v, $flat, $ids, $k, $p);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopCentroidsExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** MySQL binary-JSON → JSON string — wraps [[JsonBinaryAlgos.parseAsString]]
  * (reference: MysqlTypeDeserializer.java:99-109 JSON cell decode). */
case class MysqlJsonBinaryExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "mysql_json_decode"

  override protected def nullSafeEval(input: Any): Any =
    JsonBinaryAlgos.parseAsString(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.JsonBinaryAlgos.parseAsString($c)")

  override protected def withNewChildInternal(newChild: Expression): MysqlJsonBinaryExpr =
    copy(child = newChild)
}

/** MySQL GEOMETRY (4-byte SRID + WKB) → WKT — wraps
  * [[GeometryAlgos.mysqlGeometryToWkt]] (type family: reference
  * DataType.java:50-58; reference deserializes via the hex path, this is the
  * engine's typed surface on top). */
case class MysqlGeometryWktExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "mysql_geometry_wkt"

  override protected def nullSafeEval(input: Any): Any =
    GeometryAlgos.mysqlGeometryToWkt(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeometryAlgos.mysqlGeometryToWkt($c)")

  override protected def withNewChildInternal(newChild: Expression): MysqlGeometryWktExpr =
    copy(child = newChild)
}

/** Bloom-filter membership as a native expression: the broadcastable gate of
  * incremental dedup ([[graft.operators.Sketches.filterKnown]]). The filter
  * ships once per stage inside the serialized plan (the same mechanics as
  * Spark's runtime-filter `BloomFilterMightContain`) and membership tests
  * run inside whole-stage codegen via an `addReferenceObj` handle — no UDF
  * closure dispatch, no per-row encoder boundary. Probes use the raw UTF-8
  * bytes, matching `DataFrameStatFunctions.bloomFilter`'s `putString`
  * encoding. */
case class BloomMightContainExpr(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {
  import org.apache.spark.sql.types.BooleanType
  import org.apache.spark.unsafe.types.UTF8String

  @transient private lazy val bloom: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  def contains(s: UTF8String): Boolean = bloom.mightContainBinary(s.getBytes)

  override protected def nullSafeEval(input: Any): Any =
    contains(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this, classOf[BloomMightContainExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.contains($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}
