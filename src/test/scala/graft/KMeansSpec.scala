package graft

import graft.operators.cluster.KMeans
import org.apache.spark.sql.functions._
import scala.util.Random

/** Distributed Lloyd: must recover planted well-separated clusters, drive
  * inertia monotonically down, and assign every point exactly once.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  /** Three orthogonal anchor directions + small noise — unambiguous under
    * the spherical metric.
    */
  private def planted(seed: Int, perCluster: Int, dim: Int = 12) = {
    val rng = new Random(seed)
    val anchors = Seq(0, 4, 8)
    val rows = for {
      (a, ci) <- anchors.zipWithIndex
      i <- 0 until perCluster
    } yield {
      val v = Array.fill(dim)(rng.nextFloat() * 0.05f)
      v(a) = 1f
      ((ci * perCluster + i).toLong, v.toSeq, ci)
    }
    rng.shuffle(rows).toDF("vec_id", "embedding", "truth")
  }

  test("recovers planted clusters and assigns every point once") {
    val df = planted(1, perCluster = 40).repartition(4)
    val fit = KMeans.fit(df, "vec_id", "embedding", k = 3, iters = 6)
    val joined = fit.assignments
      .join(df.select(col("vec_id").as("id"), col("truth")), "id")
      .collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(joined.length == 120, "every point assigned exactly once")
    // each fitted cell maps to exactly one planted cluster and vice versa
    val byCell = joined.groupBy(_._1).map { case (_, xs) => xs.map(_._2).distinct }
    assert(byCell.size == 3 && byCell.forall(_.size == 1),
      s"cells are not pure: $byCell")
  }

  test("inertia is monotonically non-increasing across iterations") {
    val df = planted(2, perCluster = 30)
    val fit = KMeans.fit(df, "vec_id", "embedding", k = 4, iters = 6)
    assert(fit.inertia.length == 6)
    fit.inertia.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a * (1 + 1e-9) + 1e-9, s"inertia rose: $a -> $b")
      case _ => ()
    }
  }

  test("handles k larger than the point count and zero vectors") {
    val tiny = Seq(
      (1L, Seq.fill(4)(0f)),
      (2L, Seq(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val fit = KMeans.fit(tiny, "vec_id", "embedding", k = 5, iters = 2)
    assert(fit.assignments.count() == 2)
    assert(fit.centroids.size == 5)
  }

  test("rejects invalid k and iters") {
    val df = planted(3, perCluster = 2)
    intercept[IllegalArgumentException] { KMeans.fit(df, "vec_id", "embedding", 0) }
    intercept[IllegalArgumentException] { KMeans.fit(df, "vec_id", "embedding", 2, 0) }
  }
}
