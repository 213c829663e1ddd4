package graft.streaming

/** Bit-identical fast path for the `BigDecimal.valueOf(x)
  * .setScale(s, HALF_UP)` display rounds on the streaming hot path.
  *
  * The streaming folds round every emitted indicator the same way the
  * batch tier's `round()` does — via `BigDecimal.valueOf`, i.e.
  * HALF_UP on the SHORTEST-DECIMAL reading of the double — so stream
  * and batch rows stay byte-identical under the driver's hash. But
  * `BigDecimal.valueOf` walks Double.toString's binary-to-ASCII
  * machinery and allocates on every call, and the daily-bar stream
  * makes ~40 such calls per emitted bar (measured as the dominant
  * fold cost in jstack samples: FloatingDecimal frames inside the
  * update function).
  *
  * The fast path rounds the BINARY double directly and is provably
  * identical except within a guard band of a tie boundary: the
  * shortest-decimal reading differs from the binary value by at most
  * half an ulp, and the `x * pow` scaling adds at most one more
  * rounding — together < 4 ulp(y) ≈ 9e-16·|y|, while the guard band
  * is 1e-12·max(1, |y|), three orders of magnitude wider. Values
  * inside the band (true .5 ties and pathological near-ties), values
  * ≥ 2⁵² (integer arithmetic would lose exactness), and non-finite
  * inputs (valueOf throws — behavior preserved) all fall back to the
  * original BigDecimal computation. A property spec compares fast vs
  * BigDecimal bit patterns across magnitudes and adversarial
  * near-ties.
  */
private[graft] object FastRound {
  private val MaxExact = 4.503599627370496e15 // 2^52

  /** HALF_UP-to-integer of y when provably tie-safe, else NaN (the
    * caller's signal to take the BigDecimal path). Returns +0.0 for a
    * zero result regardless of input sign — BigDecimal has no -0.0,
    * and the driver hash is signed-zero-strict.
    */
  @inline private def tryInt(y: Double): Double = {
    if (!java.lang.Double.isFinite(y)) Double.NaN
    else {
      val a = math.abs(y)
      if (a >= MaxExact) Double.NaN
      else {
        val fl = math.floor(a)
        val f = a - fl
        if (math.abs(f - 0.5) <= 1e-12 * (if (a > 1.0) a else 1.0))
          Double.NaN
        else {
          val n = if (f > 0.5) fl + 1.0 else fl
          if (n == 0.0) 0.0 else if (y < 0.0) -n else n
        }
      }
    }
  }

  /** ≡ BigDecimal.valueOf(x).setScale(s, HALF_UP).toDouble, where
    * `pow` must be the exact double 10^s (s ≤ 15).
    */
  def scale(x: Double, pow: Double, s: Int): Double = {
    val n = tryInt(x * pow)
    if (java.lang.Double.isNaN(n))
      BigDecimal.valueOf(x)
        .setScale(s, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    else n / pow
  }

  /** ≡ BigDecimal.valueOf(y).setScale(0, HALF_UP).toDouble. */
  def int0(y: Double): Double = {
    val n = tryInt(y)
    if (java.lang.Double.isNaN(n))
      BigDecimal.valueOf(y)
        .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    else n
  }

  /** ≡ BigDecimal.valueOf(y).setScale(0, HALF_UP).toLong. */
  def long0(y: Double): Long = {
    val n = tryInt(y)
    if (java.lang.Double.isNaN(n))
      BigDecimal.valueOf(y)
        .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong
    else n.toLong
  }
}
