package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** FAISS-style ADC (asymmetric distance computation) kernels for the PQ
  * compressed-domain scan (reference capability: ANN search at corpus
  * scale; see Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011 §IV.A).
  *
  * Nothing is ever decoded: the previous formulation reconstructed each
  * row to a dim-float array (`element_at` per subspace + `concat` + cast —
  * three allocations per row) and ran a dim-wide cosine against it. The
  * IVF path hoists all dot products into a per-QUERY lookup table
  * (`pq_lut`, m·ksub entries, built once per query row) carried through
  * the cell equi-join, making each pair `m` lookups and adds; the plain-PQ
  * cross join instead computes the subspace dots inline per pair
  * ([[PqAdcImpl.cosineDirect]] — see its note on why BNLJ must not carry
  * the LUT). Per-code quantities live in driver-precomputed reference
  * arrays (residual norms, centroid·residual cross terms). Cosine against
  * the reconstruction is recovered exactly:
  *
  *   cos(q, cent + resid) = (q·cent + Σⱼ q·cbⱼ[codeⱼ]) /
  *     (|q| · sqrt(|cent|² + 2·Σⱼ centⱼ·cbⱼ[codeⱼ] + Σⱼ |cbⱼ[codeⱼ]|²))
  *
  * (plain PQ is the cent = 0 special case). All kernels are static calls
  * from generated code, so the scan stays inside whole-stage codegen with
  * zero per-row allocation.
  */
object PqAdcImpl {

  /** lut[j·ksub + c] = (q_subⱼ · cbⱼ_c) / |q|  (|q| = 0 treated as 1). */
  def lut(q: ArrayData, cbFlat: Array[Double], m: Int, ksub: Int, sub: Int): ArrayData = {
    var nq = 0.0
    val len = math.min(m * sub, q.numElements())
    var i = 0
    while (i < len) { val v = q.getFloat(i).toDouble; nq += v * v; i += 1 }
    nq = math.sqrt(nq)
    if (nq == 0.0) nq = 1.0
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      val qOff = j * sub
      var c = 0
      while (c < ksub) {
        val cbOff = (j * ksub + c) * sub
        var dot = 0.0
        var i2 = 0
        while (i2 < sub) {
          val qi = qOff + i2
          if (qi < len) dot += cbFlat(cbOff + i2) * q.getFloat(qi)
          i2 += 1
        }
        out(j * ksub + c) = dot / nq
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** LUT-free PQ ADC cosine straight from the query floats and the code
    * row — O(dim) multiplies per pair, no per-query LUT column to carry.
    * Used by the plain-PQ cross join, where the m·ksub-entry LUT buys
    * nothing (the per-pair win over O(dim) is invisible next to join
    * overheads) and a 16 KB array per broadcast row is pure baggage; the
    * IVF path keeps the LUT variant because its per-pair work rides a
    * much larger candidate stream.
    */
  def cosineDirect(
      q: ArrayData, codes: ArrayData, cbFlat: Array[Double], n2: Array[Double],
      ksub: Int, sub: Int): Double = {
    val m = codes.numElements()
    val len = math.min(m * sub, q.numElements())
    var nq = 0.0
    var i = 0
    while (i < len) { val v = q.getFloat(i).toDouble; nq += v * v; i += 1 }
    nq = math.sqrt(nq)
    if (nq == 0.0) nq = 1.0
    var num = 0.0; var den = 0.0
    var j = 0
    while (j < m) {
      val idx = j * ksub + codes.getInt(j)
      val cbOff = idx * sub
      var dot = 0.0
      var i2 = 0
      while (i2 < sub) {
        val qi = j * sub + i2
        if (qi < len) dot += cbFlat(cbOff + i2) * q.getFloat(qi)
        i2 += 1
      }
      num += dot; den += n2(idx)
      j += 1
    }
    if (den == 0.0) 0.0 else (num / nq) / math.sqrt(den)
  }

  /** (q · cent_cell) / |q| — the per-probe term of the IVF-PQ numerator. */
  def centroidDot(q: ArrayData, cell: Int, coarseFlat: Array[Double], dim: Int): Double = {
    val len = math.min(dim, q.numElements())
    var nq = 0.0
    var i = 0
    while (i < len) { val v = q.getFloat(i).toDouble; nq += v * v; i += 1 }
    nq = math.sqrt(nq)
    if (nq == 0.0) nq = 1.0
    var dot = 0.0
    i = 0
    while (i < len) { dot += coarseFlat(cell * dim + i) * q.getFloat(i); i += 1 }
    dot / nq
  }

  /** Residual IVF-PQ ADC cosine (see object doc for the identity). */
  def cosineIvf(
      lut: ArrayData, codes: ArrayData, cell: Int, qcDot: Double,
      cn2: Array[Double], cross: Array[Double], n2: Array[Double],
      ksub: Int): Double = {
    var num = qcDot
    var den = cn2(cell)
    val m = codes.numElements()
    var j = 0
    while (j < m) {
      val idx = j * ksub + codes.getInt(j)
      num += lut.getDouble(idx)
      den += 2.0 * cross(cell * m * ksub + idx) + n2(idx)
      j += 1
    }
    if (den <= 0.0) 0.0 else num / math.sqrt(den)
  }
}

/** Per-query PQ lookup table over an `array<float>` query vector. */
case class PqLut(child: Expression, cbFlat: Array[Double], m: Int, ksub: Int, sub: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PqAdcImpl.lut(input.asInstanceOf[ArrayData], cbFlat, m, ksub, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cbRef = ctx.addReferenceObj("pqCbFlat", cbFlat, "double[]")
      s"${ev.value} = graft.functions.PqAdcImpl.lut($a, $cbRef, $m, $ksub, $sub);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** LUT-free cross-join ADC cosine over (query floats, code row) — see
  * [[PqAdcImpl.cosineDirect]] for why the cross-join path avoids the LUT.
  */
case class PqAdcCosineDirect(
    left: Expression, right: Expression,
    cbFlat: Array[Double], n2: Array[Double], ksub: Int, sub: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_cosine_direct"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(q: Any, codes: Any): Any =
    PqAdcImpl.cosineDirect(
      q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], cbFlat, n2, ksub, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cbRef = ctx.addReferenceObj("pqCbFlat", cbFlat, "double[]")
      val n2Ref = ctx.addReferenceObj("pqN2", n2, "double[]")
      s"${ev.value} = graft.functions.PqAdcImpl.cosineDirect($a, $b, $cbRef, $n2Ref, $ksub, $sub);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** (query · centroid[cell]) / |query| with the coarse table as a reference
  * object — the per-probe numerator term of residual IVF-PQ.
  */
case class CentroidDot(left: Expression, right: Expression, coarseFlat: Array[Double], dim: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "centroid_dot"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(q: Any, cell: Any): Any =
    PqAdcImpl.centroidDot(q.asInstanceOf[ArrayData], cell.asInstanceOf[Int], coarseFlat, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("coarseFlat", coarseFlat, "double[]")
      s"${ev.value} = graft.functions.PqAdcImpl.centroidDot($a, $b, $ref, $dim);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Residual IVF-PQ ADC cosine: children are (lut, codes, cell, qcDot);
  * the centroid norms, centroid·code cross-term table and code norms ride
  * as reference objects.
  */
case class PqAdcIvfCosine(
    first: Expression, second: Expression, third: Expression, fourth: Expression,
    cn2: Array[Double], cross: Array[Double], n2: Array[Double], ksub: Int)
    extends QuaternaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_ivf_cosine"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(lut: Any, codes: Any, cell: Any, qcDot: Any): Any =
    PqAdcImpl.cosineIvf(
      lut.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      cell.asInstanceOf[Int], qcDot.asInstanceOf[Double], cn2, cross, n2, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) => {
      val cn2Ref = ctx.addReferenceObj("ivfCn2", cn2, "double[]")
      val crossRef = ctx.addReferenceObj("ivfCross", cross, "double[]")
      val n2Ref = ctx.addReferenceObj("ivfN2", n2, "double[]")
      s"${ev.value} = graft.functions.PqAdcImpl.cosineIvf($a, $b, $c, $d, $cn2Ref, $crossRef, $n2Ref, $ksub);"
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

/** Column-API entry points. */
object PqAdc {
  def lut(q: Column, cb: Array[Array[Array[Double]]]): Column = {
    val m = cb.length; val ksub = cb.head.length; val sub = cb.head.head.length
    ColumnBridge.column(
      PqLut(ColumnBridge.expression(q), cb.flatten.flatten, m, ksub, sub))
  }

  def codeNorms(cb: Array[Array[Array[Double]]]): Array[Double] =
    cb.flatMap(_.map(c => c.map(x => x * x).sum))

  def cosineDirect(q: Column, codes: Column, cb: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqAdcCosineDirect(
      ColumnBridge.expression(q), ColumnBridge.expression(codes),
      cb.flatten.flatten, codeNorms(cb), cb.head.length, cb.head.head.length))

  def centroidDot(q: Column, cell: Column, coarse: Seq[Seq[Double]]): Column =
    ColumnBridge.column(CentroidDot(
      ColumnBridge.expression(q), ColumnBridge.expression(cell),
      coarse.flatten.toArray, coarse.head.length))

  /** cross[cell·m·ksub + j·ksub + c] = cent_cell_subⱼ · cbⱼ_c. */
  def crossTerms(coarse: Seq[Seq[Double]], cb: Array[Array[Array[Double]]]): Array[Double] = {
    val m = cb.length; val ksub = cb.head.length; val sub = cb.head.head.length
    val out = new Array[Double](coarse.size * m * ksub)
    for (cell <- coarse.indices; j <- 0 until m; c <- 0 until ksub) {
      var dot = 0.0
      var i = 0
      while (i < sub) { dot += coarse(cell)(j * sub + i) * cb(j)(c)(i); i += 1 }
      out(cell * m * ksub + j * ksub + c) = dot
    }
    out
  }

  def cosineIvf(
      lut: Column, codes: Column, cell: Column, qcDot: Column,
      coarse: Seq[Seq[Double]], cb: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqAdcIvfCosine(
      ColumnBridge.expression(lut), ColumnBridge.expression(codes),
      ColumnBridge.expression(cell), ColumnBridge.expression(qcDot),
      coarse.map(c => c.map(x => x * x).sum).toArray,
      crossTerms(coarse, cb), codeNorms(cb), cb.head.length))
}
