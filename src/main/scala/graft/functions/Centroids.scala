package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `n` nearest coarse-quantizer cells for an `array<float>` vector, as a
  * native codegen'd expression.
  *
  * Ranking is squared euclidean distance between the L2-normalized input
  * and each centroid: ||q̂ - c||² = 1 + ||c||² - 2·(q·c)/||q||, so per
  * centroid only the raw dot product is needed — the input is never
  * materialised in normalized form. Centroids ride along as a flat
  * `double[]` reference object (broadcast with the serialized plan), so
  * cell assignment is one fused loop per row: no row explosion, no
  * window, no shuffle — the IVF assignment cost is exactly one scan.
  * Ties break toward the lower cell id.
  */
case class NearestCentroids(child: Expression, centroids: Seq[Seq[Double]], n: Int)
    extends UnaryExpression {

  require(centroids.nonEmpty && n >= 1 && n <= centroids.size)
  private val dim = centroids.head.length
  private val flat: Array[Double] = centroids.flatten.toArray
  private val norm2: Array[Double] = centroids.map(c => c.map(x => x * x).sum).toArray

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    val len = math.min(dim, q.numElements())
    var nq = 0.0
    var i = 0
    while (i < len) { val v = q.getFloat(i).toDouble; nq += v * v; i += 1 }
    nq = math.sqrt(nq)
    // all-zero vector: dot products are 0 too, so nq=1 ranks cells by ||c||²
    // (deterministic minimum-norm assignment) instead of NaN-poisoning every
    // score and emitting cell -1
    if (nq == 0.0) nq = 1.0
    val bestIdx = Array.fill(n)(-1)
    val bestScore = Array.fill(n)(Double.MaxValue)
    var c = 0
    while (c < norm2.length) {
      var dot = 0.0
      var j = 0
      while (j < len) { dot += flat(c * dim + j) * q.getFloat(j); j += 1 }
      val s = norm2(c) - 2.0 * dot / nq
      var k = n - 1
      if (s < bestScore(k)) {
        while (k > 0 && s < bestScore(k - 1)) {
          bestScore(k) = bestScore(k - 1); bestIdx(k) = bestIdx(k - 1); k -= 1
        }
        bestScore(k) = s; bestIdx(k) = c
      }
      c += 1
    }
    new GenericArrayData(bestIdx)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // All locals via ctx.freshName (fused-twice safety, see Sketches).
      val flatRef = ctx.addReferenceObj("centroidsFlat", flat, "double[]")
      val norm2Ref = ctx.addReferenceObj("centroidsNorm2", norm2, "double[]")
      val len = ctx.freshName("len")
      val nq = ctx.freshName("nq")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val bestIdx = ctx.freshName("bestIdx")
      val bestScore = ctx.freshName("bestScore")
      val c = ctx.freshName("c")
      val dot = ctx.freshName("dot")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val k = ctx.freshName("k")
      s"""
         |int $len = Math.min($dim, $a.numElements());
         |double $nq = 0.0;
         |for (int $i = 0; $i < $len; $i++) {
         |  double $v = (double) $a.getFloat($i); $nq += $v * $v;
         |}
         |$nq = Math.sqrt($nq);
         |if ($nq == 0.0) $nq = 1.0;
         |int[] $bestIdx = new int[$n];
         |double[] $bestScore = new double[$n];
         |java.util.Arrays.fill($bestIdx, -1);
         |java.util.Arrays.fill($bestScore, Double.MAX_VALUE);
         |for (int $c = 0; $c < ${norm2.length}; $c++) {
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $len; $j++) {
         |    $dot += $flatRef[$c * $dim + $j] * (double) $a.getFloat($j);
         |  }
         |  double $s = $norm2Ref[$c] - 2.0 * $dot / $nq;
         |  int $k = $n - 1;
         |  if ($s < $bestScore[$k]) {
         |    while ($k > 0 && $s < $bestScore[$k - 1]) {
         |      $bestScore[$k] = $bestScore[$k - 1]; $bestIdx[$k] = $bestIdx[$k - 1]; $k--;
         |    }
         |    $bestScore[$k] = $s; $bestIdx[$k] = $c;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bestIdx);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Centroids {
  def nearest(vec: Column, centroids: Seq[Seq[Double]], n: Int): Column =
    ColumnBridge.column(NearestCentroids(ColumnBridge.expression(vec), centroids, n))
}
