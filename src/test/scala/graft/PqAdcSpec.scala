package graft

import graft.functions.{PqAdc, PqAdcImpl}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import scala.util.Random

/** ADC kernels vs the naive reconstruct-then-cosine formulation. */
class PqAdcSpec extends SparkSpec {

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("plain-PQ direct ADC equals cosine against the reconstruction") {
    val rng = new Random(3)
    val m = 4; val ksub = 8; val sub = 3; val dim = m * sub
    val cb = Array.fill(m, ksub, sub)(rng.nextDouble() * 2 - 1)
    for (_ <- 1 to 20) {
      val q = Array.fill(dim)(rng.nextFloat() * 2 - 1)
      val codes = Array.fill(m)(rng.nextInt(ksub))
      val recon = (0 until m).flatMap(j => cb(j)(codes(j))).toArray
      val expected = cosine(q.map(_.toDouble), recon)
      val got = PqAdcImpl.cosineDirect(
        new GenericArrayData(q), new GenericArrayData(codes),
        cb.flatten.flatten, PqAdc.codeNorms(cb), ksub, sub)
      assert(math.abs(got - expected) < 1e-12, s"$got != $expected")
    }
  }

  test("residual IVF-PQ ADC equals cosine against centroid + decoded residual") {
    val rng = new Random(5)
    val m = 4; val ksub = 8; val sub = 3; val dim = m * sub; val nlist = 5
    val cb = Array.fill(m, ksub, sub)(rng.nextDouble() * 2 - 1)
    val coarse = Seq.fill(nlist)(Seq.fill(dim)(rng.nextDouble() * 2 - 1))
    val cn2 = coarse.map(c => c.map(x => x * x).sum).toArray
    val cross = PqAdc.crossTerms(coarse, cb)
    val n2 = PqAdc.codeNorms(cb)
    for (_ <- 1 to 20) {
      val q = Array.fill(dim)(rng.nextFloat() * 2 - 1)
      val cell = rng.nextInt(nlist)
      val codes = Array.fill(m)(rng.nextInt(ksub))
      val resid = (0 until m).flatMap(j => cb(j)(codes(j)))
      val re = coarse(cell).zip(resid).map { case (c, r) => c + r }.toArray
      val expected = cosine(q.map(_.toDouble), re)
      val lut = PqAdcImpl.lut(
        new GenericArrayData(q), cb.flatten.flatten, m, ksub, sub)
      val qcDot = PqAdcImpl.centroidDot(
        new GenericArrayData(q), cell, coarse.flatten.toArray, dim)
      val got = PqAdcImpl.cosineIvf(
        lut, new GenericArrayData(codes), cell, qcDot, cn2, cross, n2, ksub)
      assert(math.abs(got - expected) < 1e-12, s"$got != $expected")
    }
  }
}
