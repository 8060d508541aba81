package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd product-quantization kernels — the hot map-side loops
  * of [[graft.analytics.Pq]]. The composed higher-order-function form
  * (kept in Pq.bestPerSubspace for the differential spec) runs one
  * INTERPRETED `aggregate(zip_with(...))` per (subspace × codebook entry)
  * per row — m·k lambda passes; these fuse the whole argmin into a single
  * primitive-array loop inside whole-stage codegen. Distances fold in
  * index order, so results are bit-identical to the composed form.
  *
  * The codebook rides along as a constructor value (it participates in
  * equality/canonicalization) and reaches generated code as a reference
  * object — the model-broadcast pattern at expression level.
  *
  * Null semantics (both kernels): null input array, a null element, or an
  * input whose length differs from the codebook dim → NULL. (The guard in
  * Pq filters off-dim vectors before the kernel; the NULL is the
  * can't-happen backstop, not a code path.)
  */
object PqKernels {

  /** Generated-code helper: box the per-subspace codes + total error into
    * the output struct. */
  def pack(codes: Array[Int], qerr: Double): InternalRow =
    new GenericInternalRow(Array[Any](
      new GenericArrayData(codes.map(_.asInstanceOf[Any])), qerr))

  private[functions] def isNumericArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType | FloatType, _) => true
    case _                                    => false
  }

  /** argmin codes + summed squared quantization error, one row-level loop. */
  def pqEncode(v: Column, cb: Seq[Seq[Double]], m: Int): Column =
    ColumnBridge.column(
      PqEncodeExpr(ColumnBridge.expression(v), cb.map(_.toArray).toArray, m))

  /** The `nprobe` nearest centroid indices for a vector, ordered by
    * (round-6 squared distance, centroid index) — the IVF probe as one
    * kernel call instead of k interpreted HOF distance chains. */
  def centroidProbe(v: Column, cb: Seq[Seq[Double]], nprobe: Int): Column =
    ColumnBridge.column(
      CentroidProbeExpr(ColumnBridge.expression(v),
        cb.map(_.toArray).toArray, nprobe))

  /** Spark's round(col, 6) semantics: BigDecimal HALF_UP for finite
    * values, NaN/Infinity passed through unchanged (RoundBase does the
    * same) — shared by the probe kernel so its ordering key is
    * bit-identical to a query-level round. */
  def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Row-level probe loop (called from both eval and generated code):
    * the vector is extracted ONCE into a primitive array (dim accessor
    * calls, not k×dim), then index-ordered distance folds, round-6 keys,
    * and selection of nprobe smallest with ties to the smaller centroid
    * index. NaN distances (corrupt elements) sort last with index
    * tie-break — the same order `array_sort` gives NaN struct keys.
    * Returns null on a dim mismatch or null element. */
  def probe(v: ArrayData, cb: Array[Array[Double]], nprobe: Int,
            isFloat: Boolean): ArrayData = {
    val dim = cb(0).length
    if (v.numElements() != dim) return null
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val k = cb.length
    val dists = new Array[Double](k)
    var j = 0
    while (j < k) {
      val c = cb(j)
      var d = 0.0
      var t = 0
      while (t < dim) {
        val diff = x(t) - c(t)
        d += diff * diff
        t += 1
      }
      dists(j) = round6(d)
      j += 1
    }
    val out = new Array[Any](nprobe)
    val used = new Array[Boolean](k)
    var p = 0
    while (p < nprobe) {
      var bj = -1
      var bd = Double.NaN
      var q = 0
      while (q < k) {
        // +Infinity competes normally (array_sort places Inf BEFORE NaN);
        // only NaN defers to the index fallback below. `bj < 0` seeds the
        // first non-NaN candidate so no finite sentinel can mask Inf.
        if (!used(q) && !java.lang.Double.isNaN(dists(q)) &&
            (bj < 0 || dists(q) < bd)) { bd = dists(q); bj = q }
        q += 1
      }
      if (bj < 0) {
        // every unused distance is NaN: take the smallest unused index
        // (array_sort order — NaN keys last, struct tie-break on index)
        var q2 = 0
        while (bj < 0 && q2 < k) { if (!used(q2)) bj = q2; q2 += 1 }
      }
      used(bj) = true
      out(p) = bj
      p += 1
    }
    new GenericArrayData(out)
  }

  /** ADC distance from an exact query vector to a PQ-coded corpus row. */
  def adcDist(qv: Column, codes: Column, cb: Seq[Seq[Double]],
              m: Int): Column =
    ColumnBridge.column(
      AdcDistExpr(ColumnBridge.expression(qv), ColumnBridge.expression(codes),
        cb.map(_.toArray).toArray, m))
}

/** struct<codes: array<int>, qerr: double> per input vector. */
case class PqEncodeExpr(child: Expression, cb: Array[Array[Double]], m: Int)
    extends UnaryExpression {

  require(m >= 1 && cb.nonEmpty && cb.head.length % m == 0,
    "codebook dim must divide into m subspaces")

  override def checkInputDataTypes(): TypeCheckResult =
    if (PqKernels.isNumericArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>/array<float>, got " +
        child.dataType.catalogString)

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("qerr", DoubleType, nullable = false)))
  override def prettyName: String = "pq_encode"
  override def nullable: Boolean = true

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  // equality on the codebook CONTENT, not array identity — otherwise
  // canonicalization treats two copies of the same plan as different and
  // subexpression elimination / exchange reuse break
  override def equals(other: Any): Boolean = other match {
    case PqEncodeExpr(c, b, mm) =>
      c == child && mm == m && b.length == cb.length &&
        b.indices.forall(i => java.util.Arrays.equals(b(i), cb(i)))
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(m),
      Int.box(cb.map(java.util.Arrays.hashCode).toSeq.hashCode()))

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val dim = cb(0).length
    if (v.numElements() != dim) return null
    val f = isFloat
    val sub = dim / m
    val codes = new Array[Int](m)
    var qerr = 0.0
    var s = 0
    while (s < m) {
      // argmin with NaN-last ordering (the oracle's row_number argmin):
      // the first entry always seeds, +Infinity competes normally, a NaN
      // distance never displaces a real one — an all-NaN subspace keeps
      // entry 0 with a NaN error term instead of emitting code -1
      var bj = -1; var bd = Double.NaN
      var j = 0
      while (j < cb.length) {
        val c = cb(j)
        var d = 0.0
        var t = 0
        while (t < sub) {
          val i = s * sub + t
          if (v.isNullAt(i)) return null
          val x = if (f) v.getFloat(i).toDouble else v.getDouble(i)
          val diff = x - c(i)
          d += diff * diff
          t += 1
        }
        if (bj < 0 || (!java.lang.Double.isNaN(d) &&
            (java.lang.Double.isNaN(bd) || d < bd))) { bd = d; bj = j }
        j += 1
      }
      codes(s) = bj; qerr += bd
      s += 1
    }
    PqKernels.pack(codes, qerr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cbRef = ctx.addReferenceObj("pqCb", cb, "double[][]")
      val s = ctx.freshName("s"); val j = ctx.freshName("j")
      val t = ctx.freshName("t"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val bd = ctx.freshName("bd")
      val bj = ctx.freshName("bj"); val codes = ctx.freshName("codes")
      val qerr = ctx.freshName("qerr"); val diff = ctx.freshName("diff")
      val dim = cb(0).length; val sub = dim / m
      val getX = if (isFloat) s"(double) $a.getFloat($i)"
                 else s"$a.getDouble($i)"
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $codes = new int[$m];
         |  double $qerr = 0.0;
         |  for (int $s = 0; $s < $m && !${ev.isNull}; $s++) {
         |    int $bj = -1; double $bd = Double.NaN;
         |    for (int $j = 0; $j < ${cb.length} && !${ev.isNull}; $j++) {
         |      double $d = 0.0;
         |      for (int $t = 0; $t < $sub; $t++) {
         |        int $i = $s * $sub + $t;
         |        if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |        double $diff = $getX - $cbRef[$j][$i];
         |        $d += $diff * $diff;
         |      }
         |      if (!${ev.isNull} && ($bj < 0 || (!Double.isNaN($d) &&
         |          (Double.isNaN($bd) || $d < $bd)))) { $bd = $d; $bj = $j; }
         |    }
         |    $codes[$s] = $bj; $qerr += $bd;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = graft.functions.PqKernels.pack($codes, $qerr);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(child = c)
}

/** array<int> of the nprobe nearest centroid indices, ordered by
  * (round-6 d², index). The whole selection runs in
  * [[PqKernels.probe]] — one static call from eval and generated code
  * alike, so the loop JITs identically on both paths. */
case class CentroidProbeExpr(child: Expression, cb: Array[Array[Double]],
                             nprobe: Int) extends UnaryExpression {

  require(nprobe >= 1 && nprobe <= cb.length, "nprobe must be in [1, k]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (PqKernels.isNumericArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>/array<float>, got " +
        child.dataType.catalogString)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "centroid_probe"
  override def nullable: Boolean = true

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  // content equality on the model (see PqEncodeExpr)
  override def equals(other: Any): Boolean = other match {
    case CentroidProbeExpr(c, b, np) =>
      c == child && np == nprobe && b.length == cb.length &&
        b.indices.forall(i => java.util.Arrays.equals(b(i), cb(i)))
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(nprobe),
      Int.box(cb.map(java.util.Arrays.hashCode).toSeq.hashCode()))

  override def nullSafeEval(a: Any): Any =
    PqKernels.probe(a.asInstanceOf[ArrayData], cb, nprobe, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cbRef = ctx.addReferenceObj("probeCb", cb, "double[][]")
      s"""
         |${ev.value} = graft.functions.PqKernels.probe(
         |  $a, $cbRef, $nprobe, $isFloat);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): CentroidProbeExpr =
    copy(child = c)
}

/** Σ_s ||q_sub(s) − codebook[codes(s)]_sub(s)||² — the per-pair ADC probe. */
case class AdcDistExpr(left: Expression, right: Expression,
                       cb: Array[Array[Double]], m: Int)
    extends BinaryExpression {

  require(m >= 1 && cb.nonEmpty && cb.head.length % m == 0,
    "codebook dim must divide into m subspaces")

  override def checkInputDataTypes(): TypeCheckResult = {
    val codesOk = right.dataType match {
      case ArrayType(IntegerType, _) => true
      case _                         => false
    }
    if (PqKernels.isNumericArray(left.dataType) && codesOk)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double|float>, array<int>), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_dist"
  override def nullable: Boolean = true

  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def equals(other: Any): Boolean = other match {
    case AdcDistExpr(l, r, b, mm) =>
      l == left && r == right && mm == m && b.length == cb.length &&
        b.indices.forall(i => java.util.Arrays.equals(b(i), cb(i)))
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(left, right, Int.box(m),
      Int.box(cb.map(java.util.Arrays.hashCode).toSeq.hashCode()))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val qv = a.asInstanceOf[ArrayData]
    val cs = b.asInstanceOf[ArrayData]
    val dim = cb(0).length
    if (qv.numElements() != dim || cs.numElements() != m) return null
    val f = isFloat
    val sub = dim / m
    var dist = 0.0
    var s = 0
    while (s < m) {
      if (cs.isNullAt(s)) return null
      val j = cs.getInt(s)
      if (j < 0 || j >= cb.length) return null
      val c = cb(j)
      var t = 0
      while (t < sub) {
        val i = s * sub + t
        if (qv.isNullAt(i)) return null
        val x = if (f) qv.getFloat(i).toDouble else qv.getDouble(i)
        val diff = x - c(i)
        dist += diff * diff
        t += 1
      }
      s += 1
    }
    dist
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cbRef = ctx.addReferenceObj("adcCb", cb, "double[][]")
      val s = ctx.freshName("s"); val t = ctx.freshName("t")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val dist = ctx.freshName("dist"); val diff = ctx.freshName("diff")
      val dim = cb(0).length; val sub = dim / m
      val getX = if (isFloat) s"(double) $a.getFloat($i)"
                 else s"$a.getDouble($i)"
      s"""
         |if ($a.numElements() != $dim || $b.numElements() != $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dist = 0.0;
         |  for (int $s = 0; $s < $m && !${ev.isNull}; $s++) {
         |    if ($b.isNullAt($s)) { ${ev.isNull} = true; break; }
         |    int $j = $b.getInt($s);
         |    if ($j < 0 || $j >= ${cb.length}) { ${ev.isNull} = true; break; }
         |    for (int $t = 0; $t < $sub; $t++) {
         |      int $i = $s * $sub + $t;
         |      if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |      double $diff = $getX - $cbRef[$j][$i];
         |      $dist += $diff * $diff;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dist;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDistExpr =
    copy(left = newLeft, right = newRight)
}
