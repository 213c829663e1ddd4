package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic embedding corpora for the ANN measurement
  * harnesses (RecallProbe, LlmOpsSpec). The driver-shipped
  * `embeddings` table is UNIFORM random — its top-10 neighbors sit at
  * cosine ≈ 0.3, which is the documented hard instance for any
  * locality-sensitive method (nothing local to hash) and is too
  * isotropic for a PQ-vs-OPQ separation to exceed run noise. These
  * generators produce the two structured regimes real embedding
  * corpora exhibit:
  *
  *  - [[clustered]]: points = center·scale + unit noise → same-cluster
  *    cosine ≈ scale²/(scale²+1) (scale 3 → ≈ 0.9, the near-duplicate
  *    regime hyperplane LSH is built for).
  *  - [[anisotropic]]: clustered + exponentially decaying per-dim
  *    variance, then a fixed random rotation — the energy imbalance
  *    OPQ's learned rotation rebalances across PQ subspaces, invisible
  *    to plain PQ's axis-aligned split.
  *
  * Generation is driver-side (probe-harness sizes, ≤ ~100k×64 doubles)
  * and seeded with java.util.Random, whose algorithm is specified —
  * identical corpora across runs and JVMs.
  */
object SynthData {

  private val Dim = 64

  def clustered(spark: SparkSession, n: Int, centers: Int = 10,
      scale: Double = 3.0, seed: Long = 7L): DataFrame =
    make(spark, n, centers, scale, seed, anis = false)

  def anisotropic(spark: SparkSession, n: Int, centers: Int = 10,
      scale: Double = 3.0, seed: Long = 7L): DataFrame =
    make(spark, n, centers, scale, seed, anis = true)

  /** (vec_id, v, norm) frame matching [[operators.Similarity]]'s
    * corpus shape (v: array<double>, norm precomputed).
    */
  private def make(spark: SparkSession, n: Int, centers: Int,
      scale: Double, seed: Long, anis: Boolean): DataFrame = {
    val rnd = new java.util.Random(seed)
    val cs = Array.fill(centers, Dim)(rnd.nextGaussian())
    // decaying per-dim stddev: dim j carries exp(-j/16) of the energy
    val decay = Array.tabulate(Dim)(j => math.exp(-j / 16.0))
    // fixed rotation (QR of a gaussian matrix) so the imbalance is not
    // axis-aligned — otherwise plain PQ's split would accidentally win
    val rot = if (anis) orthonormal(Dim, rnd) else null
    val rows = (0 until n).map { i =>
      val c = cs(rnd.nextInt(centers))
      var v = Array.tabulate(Dim) { j =>
        val x = c(j) * scale + rnd.nextGaussian()
        if (anis) x * decay(j) else x
      }
      if (anis) v = Array.tabulate(Dim)(j =>
        (0 until Dim).foldLeft(0.0)((s, k) => s + rot(j)(k) * v(k)))
      (i.toLong, v.toSeq)
    }
    import spark.implicits._
    rows.toDF("vec_id", "v")
      .withColumn("norm", sqrt(operators.Dedup.dot(col("v"), col("v"))))
  }

  /** Gram-Schmidt orthonormalization of a seeded gaussian matrix. */
  private def orthonormal(d: Int, rnd: java.util.Random): Array[Array[Double]] = {
    val m = Array.fill(d, d)(rnd.nextGaussian())
    for (i <- 0 until d) {
      for (j <- 0 until i) {
        val dot = (0 until d).foldLeft(0.0)((s, k) => s + m(i)(k) * m(j)(k))
        for (k <- 0 until d) m(i)(k) -= dot * m(j)(k)
      }
      val nrm = math.sqrt((0 until d).foldLeft(0.0)((s, k) => s + m(i)(k) * m(i)(k)))
      for (k <- 0 until d) m(i)(k) /= nrm
    }
    m
  }
}
