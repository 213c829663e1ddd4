package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CharNgrams, DeflateLen, MinHashShingles, PairCorr, SimHash64, VectorDot}
import graft.plans.EmaStrategy

/** SparkSessionExtensions entry point: registers graft's custom
  * Catalyst expressions and planner strategy for SQL use.
  *
  * Activate with
  * `spark.sql.extensions=graft.GraftExtensions` (cluster conf) or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (children: Seq[Expression]) => VectorDot(children(0), children(1))))
    def intLiteral(fn: String)(e: Expression, arg: String): Int = {
      if (!e.foldable)
        throw new IllegalArgumentException(s"$fn: $arg must be a literal")
      e.eval() match {
        case n: java.lang.Number => n.intValue()
        case other =>
          throw new IllegalArgumentException(
            s"$fn: $arg must be an integer literal, got $other")
      }
    }
    extensions.injectFunction((
      FunctionIdentifier("minhash_shingles"),
      new ExpressionInfo(classOf[MinHashShingles].getName, "minhash_shingles"),
      (children: Seq[Expression]) => MinHashShingles(children(0),
        intLiteral("minhash_shingles")(children(1), "numHashes"),
        intLiteral("minhash_shingles")(children(2), "shingleWidth"))))
    extensions.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children(0))))
    extensions.injectFunction((
      FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[CharNgrams].getName, "char_ngrams"),
      (children: Seq[Expression]) => CharNgrams(children(0),
        intLiteral("char_ngrams")(children(1), "n"))))
    extensions.injectFunction((
      FunctionIdentifier("deflate_len"),
      new ExpressionInfo(classOf[DeflateLen].getName, "deflate_len"),
      (children: Seq[Expression]) => DeflateLen(children(0))))
    extensions.injectFunction((
      FunctionIdentifier("pair_corr"),
      new ExpressionInfo(classOf[PairCorr].getName, "pair_corr"),
      (children: Seq[Expression]) => PairCorr(children(0), children(1),
        children(2), children(3),
        intLiteral("pair_corr")(children(4), "minDays"))))
    extensions.injectPlannerStrategy(_ => EmaStrategy)
  }
}
