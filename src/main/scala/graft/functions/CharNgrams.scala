package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All character n-grams of a string in one native pass.
  *
  * The declarative form — `transform(sequence(1, length(t)-1),
  * i -> substring(t, i, n))` — walks interpreted lambda machinery and
  * re-materializes the lambda variable per window; this expression
  * slices the UTF8String directly (char-indexed, so multi-byte text
  * is handled like `substring`). Output matches the HOF formulation
  * exactly: one n-gram per window start, empty for strings shorter
  * than n.
  */
case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType if n > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_ngrams: n must be positive, got $n")
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_ngrams expects a string column, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val len = s.numChars()
    if (len < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](len - n + 1)
      var i = 0
      while (i <= len - n) {
        out(i) = s.substringSQL(i + 1, n)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgrams {
  /** Column API: array of all `n`-char windows of a string column. */
  def char_ngrams(s: Column, n: Int): Column =
    GraftShim.column(CharNgrams(GraftShim.expression(s), n))
}
