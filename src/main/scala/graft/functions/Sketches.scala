package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native sketch expressions over pre-hashed token/shingle arrays
  * (`array<long>`). The higher-order-function formulations
  * (`transform`/`aggregate` lambdas) evaluate interpretively per element and
  * per permutation — O(k·n) interpreter dispatches per row. These emit one
  * fused loop with whole-stage codegen; on a 100 TB corpus the signature
  * computation is the map-side hot loop, so this is where codegen pays.
  */

/** k-permutation MinHash signature: sig[i] = min over h of xxhash64(h, seed=i). */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < numHashes) {
        val v = XXH64.hashLong(h, i.toLong)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // Every local must come from ctx.freshName: when this expression is
      // fused twice into one whole-stage-codegen function, fixed names
      // collide ("Redefinition of local variable") and Spark silently falls
      // back to interpreted eval.
      val sig = ctx.freshName("sig")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $a.getLong($j);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $v = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($h, (long) $i);
         |    if ($v < $sig[$i]) $sig[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash from token hashes: bit b of the result is set when more
  * token hashes have bit b set than unset.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // All locals via ctx.freshName — see MinHashSignature.doGenCode.
      val votes = ctx.freshName("votes")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      val b2 = ctx.freshName("b2")
      s"""
         |int[] $votes = new int[64];
         |int $n = $a.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $a.getLong($j);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b2 = 0; $b2 < 64; $b2++) { if ($votes[$b2] > 0) $out |= (1L << $b2); }
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane sign-bit bucket over an `array<float>` vector: bit p of
  * the result is set when `signs[p] · v >= 0`. The ±1 hyperplane matrix is
  * fixed at plan time and rides along as a flat `double[]` reference object,
  * so the whole bucket computation is one fused codegen loop — the
  * higher-order-function formulation evaluates `numPlanes` interpreted
  * `aggregate(zip_with(...))` lambdas per row instead.
  */
case class HyperplaneBits(child: Expression, signs: Seq[Seq[Double]])
    extends UnaryExpression {

  // > 64 planes would wrap `1L << p` (shift mod 64) and silently alias plane
  // p with plane p-64, corrupting buckets — fail at construction instead.
  require(signs.nonEmpty && signs.length <= 64,
    s"hyperplane_bits packs into a 64-bit bucket: need 1..64 planes, got ${signs.length}")

  private val numPlanes = signs.length
  private val dim = signs.head.length
  private val flat: Array[Double] = signs.flatten.toArray

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bits"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val len = math.min(dim, v.numElements())
    var bits = 0L
    var p = 0
    while (p < numPlanes) {
      var dot = 0.0
      var i = 0
      while (i < len) { dot += flat(p * dim + i) * v.getFloat(i); i += 1 }
      if (dot >= 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // All locals via ctx.freshName (fused-twice safety).
      val flatRef = ctx.addReferenceObj("hyperplaneSigns", flat, "double[]")
      val len = ctx.freshName("len")
      val bits = ctx.freshName("bits")
      val p = ctx.freshName("p")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |int $len = Math.min($dim, $a.numElements());
         |long $bits = 0L;
         |for (int $p = 0; $p < $numPlanes; $p++) {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $len; $i++) {
         |    $dot += $flatRef[$p * $dim + $i] * (double) $a.getFloat($i);
         |  }
         |  if ($dot >= 0) $bits |= (1L << $p);
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused whitespace tokenization + k-gram shingle hashing over a string
  * column: `out[i] = chain-hash of the hashes of tokens i..i+k-1`.
  *
  * Replaces the `transform(sequence(...), i -> xxhash64(concat_ws(' ',
  * slice(split(text), i, k))))` pipeline, which allocates the split array,
  * k-slices, and joined shingle strings per row and runs every lambda
  * interpreted. Here tokens are found in one pass over the UTF-8 bytes
  * (ASCII whitespace, matching `split('\\s+')` on ASCII text), each token
  * hashed in place (no copies), and k-grams combined with an xxh64 chain.
  * Shingle identities differ from the string formulation but are an
  * equivalent set fingerprint (collisions negligible); use where the
  * consumer needs shingle *sets*, not shingle strings.
  *
  * Codegen stays in whole-stage: the generated code is a single static
  * call, so the surrounding projection keeps its fused loop.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  private final val Seed = 42L // Spark's xxhash64 default seed

  /** One pass: tokenize on ASCII whitespace, hash tokens in place, emit
    * chained k-gram hashes. Fewer than k tokens → one hash over all of
    * them; zero tokens → empty array.
    */
  def compute(s: org.apache.spark.unsafe.types.UTF8String, k: Int): ArrayData = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val n = s.numBytes()
    val tokenHashes = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    var start = -1
    while (i <= n) {
      val ws = i == n || {
        val b = org.apache.spark.unsafe.Platform.getByte(base, offset + i)
        b == 32 || (b >= 9 && b <= 13)
      }
      if (ws) {
        if (start >= 0) {
          tokenHashes += XXH64.hashUnsafeBytes(base, offset + start, i - start, Seed)
          start = -1
        }
      } else if (start < 0) start = i
      i += 1
    }
    val m = tokenHashes.length
    if (m == 0) return new GenericArrayData(Array.emptyLongArray)
    val width = math.min(k, m)
    val out = new Array[Long](math.max(m - width + 1, 1))
    var j = 0
    while (j < out.length) {
      var acc = Seed
      var t = 0
      while (t < width) { acc = XXH64.hashLong(tokenHashes(j + t), acc); t += 1 }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }
}

object Sketches {
  def minhashSignature(hashes: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(hashes), numHashes))

  def shingleHashes(text: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), k))

  def simhash64(hashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(hashes)))

  def hyperplaneBits(vec: Column, signs: Seq[Seq[Double]]): Column =
    ColumnBridge.column(HyperplaneBits(ColumnBridge.expression(vec), signs))
}
