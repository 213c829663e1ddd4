package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.DoubleType

/** Whole-operator form of the per-key EMA/MACD recurrence
  * (technical_indicators.py:117-130, 163-179): a custom LogicalPlan +
  * Strategy + SparkPlan, the (c)-tier extension point for semantics
  * Spark's operators can't express (an ordered per-key fold that must
  * not materialize groups).
  *
  * Unlike the RDD fallback in [[graft.operators.Recurrence]], the
  * physical node declares `requiredChildDistribution` /
  * `requiredChildOrdering`, so EnsureRequirements inserts an exchange
  * and sort ONLY when the child isn't already clustered by user_id and
  * sorted — after a same-spec Window pass the operator is a pure
  * zero-shuffle streaming map over InternalRows (no Row
  * deserialization at all).
  */
case class EmaAppend(child: LogicalPlan,
    emaAttrs: Seq[AttributeReference] = EmaAppend.freshAttrs())
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ emaAttrs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(emaAttrs)
  // the recurrence consumes these child columns even when downstream
  // projections don't — without this, ColumnPruning would drop them
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      child.output.filter(a => EmaAppend.requiredColumns(a.name)))
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): EmaAppend =
    copy(child = newChild)
}

object EmaAppend {
  val requiredColumns: Set[String] = Set("user_id", "ts", "event_id", "value")

  /** Output attributes are a constructor parameter so their exprIds
    * survive tree copies (a plain `val` would mint new ids on every
    * transform and break downstream attribute binding).
    */
  def freshAttrs(): Seq[AttributeReference] = Seq(
    "ema_12_raw", "ema_26_raw", "macd_raw", "macd_signal_raw", "macd_histogram_raw")
    .map(n => AttributeReference(n, DoubleType, nullable = true)())
}

object EmaStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case e: EmaAppend => EmaAppendExec(planLater(e.child), e.output) :: Nil
    case _ => Nil
  }
}

case class EmaAppendExec(child: SparkPlan, override val output: Seq[Attribute])
    extends UnaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output.drop(child.output.length))

  private val K12 = 2.0 / 13.0
  private val K26 = 2.0 / 27.0

  private def childAttr(name: String): Attribute =
    child.output.find(_.name == name).getOrElse(
      throw new IllegalStateException(s"EmaAppend child lacks column '$name'"))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(childAttr("user_id"))))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(childAttr("user_id"), Ascending),
      SortOrder(childAttr("ts"), Ascending),
      SortOrder(childAttr("event_id"), Ascending)))

  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val userIdx = child.output.indexWhere(_.name == "user_id")
    val valueIdx = child.output.indexWhere(_.name == "value")
    child.execute().mapPartitions { iter =>
      // project to UnsafeRow: direct actions (collect/getByteArrayRdd)
      // cast output rows to UnsafeRow, and buffering consumers must
      // not observe the shared mutable JoinedRow/GenericInternalRow
      val toUnsafe = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(output, output)
      val joined = new JoinedRow
      val extra = new GenericInternalRow(5)
      var cur = 0L
      var started = false
      var n = 0L
      var e12 = 0.0
      var e26 = 0.0
      iter.map { row =>
        val u = row.getLong(userIdx)
        val v = row.getDouble(valueIdx)
        if (!started || u != cur) { cur = u; started = true; n = 0L }
        n += 1
        if (n == 1) { e12 = v; e26 = v }
        else {
          e12 = v * K12 + e12 * (1.0 - K12)
          e26 = v * K26 + e26 * (1.0 - K26)
        }
        if (n >= 12) extra.update(0, e12) else extra.setNullAt(0)
        if (n >= 26) extra.update(1, e26) else extra.setNullAt(1)
        if (n >= 35) {
          extra.update(2, e12 - e26)
          extra.update(3, e12 - e26)
          extra.update(4, 0.0)
        } else { extra.setNullAt(2); extra.setNullAt(3); extra.setNullAt(4) }
        toUnsafe(joined(row, extra))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): EmaAppendExec =
    copy(child = newChild)
}
