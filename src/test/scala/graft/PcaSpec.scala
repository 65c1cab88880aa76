package graft

import graft.operators.embed.Pca

/** Specs for the PCA operator (operators/embed/Pca): the Jacobi
  * eigensolver is pinned against analytically-known spectra, the full fit
  * against a planted dominant direction, and the distributed projection
  * against independent driver-side dot products.
  */
class PcaSpec extends SparkSpec {

  test("jacobi recovers a known rotated spectrum") {
    // diag(3, 1) rotated by 45°: A = R Λ Rᵀ
    val c = math.cos(math.Pi / 4); val s = math.sin(math.Pi / 4)
    val a = Array(
      Array(3 * c * c + 1 * s * s, (3 - 1) * c * s),
      Array((3 - 1) * c * s, 3 * s * s + 1 * c * c))
    val (vals, vecs) = Pca.jacobi(a)
    assert(vals.sorted.reverse.zip(Seq(3.0, 1.0)).forall {
      case (x, y) => math.abs(x - y) < 1e-12 })
    // eigen residual ‖A·v − λ·v‖ ≈ 0 for both pairs
    for (i <- 0 until 2) {
      val v = vecs(i)
      val av = Array.tabulate(2)(r => a(r)(0) * v(0) + a(r)(1) * v(1))
      val res = math.sqrt(
        math.pow(av(0) - vals(i) * v(0), 2) + math.pow(av(1) - vals(i) * v(1), 2))
      assert(res < 1e-12)
    }
  }

  test("jacobi eigenvectors of a 4x4 composed spectrum are orthonormal") {
    // A = Σ λ_k q_k q_kᵀ with a hand-built orthonormal basis (two Givens
    // rotations of the identity)
    def rot(d: Int, p: Int, q: Int, th: Double): Array[Array[Double]] = {
      val m = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
      m(p)(p) = math.cos(th); m(q)(q) = math.cos(th)
      m(p)(q) = -math.sin(th); m(q)(p) = math.sin(th)
      m
    }
    def mul(a: Array[Array[Double]], b: Array[Array[Double]]) =
      Array.tabulate(a.length, a.length)((i, j) =>
        (0 until a.length).map(k => a(i)(k) * b(k)(j)).sum)
    val qm = mul(rot(4, 0, 2, 0.7), rot(4, 1, 3, 1.1))
    val lam = Array(5.0, 2.0, 1.0, 0.5)
    val a = Array.tabulate(4, 4)((i, j) =>
      (0 until 4).map(k => lam(k) * qm(i)(k) * qm(j)(k)).sum)
    val (vals, vecs) = Pca.jacobi(a)
    assert(vals.sorted.reverse.zip(lam).forall {
      case (x, y) => math.abs(x - y) < 1e-10 })
    for (i <- 0 until 4; j <- 0 until 4) {
      val dot = (0 until 4).map(k => vecs(i)(k) * vecs(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-10)
    }
  }

  private def toyEmbeddings(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    // planted dominant direction u ∝ (3,1,0,0,-1,2)/√15 with amplitude ±2,
    // plus a small deterministic orthogonal wiggle
    val u = Array(3.0, 1.0, 0.0, 0.0, -1.0, 2.0).map(_ / math.sqrt(15.0))
    val w = Array(1.0, -3.0, 0.0, 0.0, 0.0, 0.0).map(_ / math.sqrt(10.0))
    (0 until 400).map { i =>
      val t = (i % 41).toDouble / 10.0 - 2.0
      val e = (i % 7).toDouble / 100.0 - 0.03
      (i.toLong, Array.tabulate(6)(d => (t * u(d) + e * w(d)).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("fit finds a planted dominant direction") {
    val f = Pca.fit(toyEmbeddings(), "embedding", 6, 2)
    assert(f.n === 400L)
    val u = Array(3.0, 1.0, 0.0, 0.0, -1.0, 2.0).map(_ / math.sqrt(15.0))
    val cos = f.vectors(0).zip(u).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.999, s"top component misaligned: cos=$cos")
    assert(f.values(0) > 10.0 * f.values(1))
    // sign fix: the largest-|component| entry is positive
    f.vectors.foreach { v =>
      assert(v(v.zipWithIndex.maxBy(p => math.abs(p._1))._2) > 0.0)
    }
  }

  test("distributed projection equals independent driver-side dot products") {
    val df = toyEmbeddings()
    val f = Pca.fit(df, "embedding", 6, 2)
    val got = Pca.project(df, "vec_id", "embedding", f)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // Spark's round() is HALF_UP away from zero; math.round is
    // floor(x+0.5), which differs on negative exact halves
    def halfUp(x: Double): Long =
      if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong
    val rows = df.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray)
    rows.foreach { case (id, e) =>
      val xq = e.map(v => halfUp(v.toDouble * 1e6) / 1e6)
      for (c <- 0 until 2) {
        val y = xq.indices.foldLeft(0.0)((acc, i) =>
          acc + f.vectors(c)(i) * (xq(i) - f.mean(i)))
        assert(got((id, c)) === halfUp(y * 1e6), s"vec $id comp $c")
      }
    }
  }
}
