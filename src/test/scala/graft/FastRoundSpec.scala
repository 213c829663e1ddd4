package graft

import graft.streaming.FastRound
import org.scalatest.funsuite.AnyFunSuite

/** BIT-identity property suite for [[FastRound]] against the
  * BigDecimal forms it replaces on the streaming hot path: every
  * emitted stream value is hash-compared against a batch dual, so
  * "close" is not enough — the fast path must agree in raw bit
  * pattern (signed zero included) on every input class, with the
  * adversarial near-tie band exercised explicitly (that is where the
  * guard must route to the BigDecimal fallback).
  */
class FastRoundSpec extends AnyFunSuite {

  private def bdScale(x: Double, s: Int): Double = BigDecimal.valueOf(x)
    .setScale(s, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
  private def bdInt0(y: Double): Double = BigDecimal.valueOf(y)
    .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
  private def bdLong0(y: Double): Long = BigDecimal.valueOf(y)
    .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong

  private def bits(x: Double) = java.lang.Double.doubleToRawLongBits(x)

  private def checkAll(x: Double): Unit = {
    assert(bits(FastRound.scale(x, 10000.0, 4)) == bits(bdScale(x, 4)),
      s"scale4 mismatch at $x (${bits(x)})")
    assert(bits(FastRound.scale(x, 1000000.0, 6)) == bits(bdScale(x, 6)),
      s"scale6 mismatch at $x (${bits(x)})")
    assert(bits(FastRound.int0(x)) == bits(bdInt0(x)),
      s"int0 mismatch at $x (${bits(x)})")
    assert(FastRound.long0(x) == bdLong0(x),
      s"long0 mismatch at $x (${bits(x)})")
  }

  test("random sweep across magnitudes, both signs") {
    val rnd = new java.util.Random(42)
    for (_ <- 1 to 300000) {
      // magnitudes from subnormal-ish to beyond the 2^52 exactness
      // cliff, so both the fast path and every fallback branch run
      val mag = math.pow(10.0, rnd.nextDouble() * 24 - 9)
      checkAll((rnd.nextDouble() * 2 - 1) * mag)
    }
  }

  test("adversarial near-ties: n + 0.5 nudged by k ulps") {
    val rnd = new java.util.Random(7)
    for (_ <- 1 to 100000) {
      val n = rnd.nextLong() % 1000000000L
      val base = n + 0.5
      val k = rnd.nextInt(9) - 4
      var y = base
      if (k > 0) (1 to k).foreach(_ => y = Math.nextUp(y))
      if (k < 0) (1 to -k).foreach(_ => y = Math.nextDown(y))
      checkAll(y)
      checkAll(y / 10000.0)   // lands near a tie after the ×10⁴ scale
      checkAll(y / 1000000.0) // lands near a tie after the ×10⁶ scale
    }
  }

  test("exact ties, zeros, signed zero, exact decimals, 2^52 cliff") {
    Seq(0.0, -0.0, 0.5, -0.5, 1.5, -1.5, 2.5, -2.5, 0.00005, -0.00005,
      0.000045, 0.0000005, -0.0000005, 0.1, -0.1, 101.5, 99.99995,
      -99.99995, 123.456789, 4.503599627370495e15, 4.503599627370497e15,
      9.007199254740992e15, 1e300, -1e300, Double.MinPositiveValue,
      -Double.MinPositiveValue).foreach(checkAll)
    // non-finite inputs: BigDecimal.valueOf throws — behavior preserved
    Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
      .foreach { y =>
        intercept[NumberFormatException](FastRound.int0(y)): Unit
        intercept[NumberFormatException](FastRound.long0(y)): Unit
        intercept[NumberFormatException](FastRound.scale(y, 10000.0, 4)): Unit
      }
  }
}
