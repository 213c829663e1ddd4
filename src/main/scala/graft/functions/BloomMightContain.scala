package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe of a broadcast Bloom filter.
  *
  * The cross-run dedup gate (the duplicate-suppression contract of
  * reference producer.py:243-252 at a standing-corpus scale) probes a
  * broadcast sketch once PER INGESTED ROW — the hottest row-at-a-time
  * path in the engine. Spark ships an internal
  * `BloomFilterMightContain` for its own runtime row-group filtering
  * but exposes no public expression, so the gate previously ran
  * through a Scala UDF, which breaks whole-stage codegen around the
  * filter (serialize → call-by-reflection → deserialize per row) and
  * splits the gate stage in two. This expression keeps the probe
  * inside the generated loop: the broadcast handle rides the plan (a
  * few bytes), each executor fetches the sketch once, and the
  * generated code calls `mightContainBinary` on the raw UTF-8 bytes —
  * bit-identical to `BloomFilter.putString`/`mightContainString`,
  * which hash the same UTF-8 encoding (sketch/BloomFilterImpl
  * delegates String → UTF-8 bytes → binary).
  *
  * Null semantics match the UDF it replaces: a null fingerprint (null
  * text upstream) is never a member → `false`, never null — the gate
  * filter `!hit` must KEEP null-text rows rather than silently drop
  * them, so the expression is non-nullable by construction.
  *
  * Scale note: the sketch is broadcast ONCE and shared by every task
  * on an executor; at the 10¹⁰-doc tier (~12 GB at 1% fpp) that is
  * the difference between one resident copy per executor and one per
  * task closure.
  */
case class BloomMightContain(child: Expression,
    bloom: Broadcast[BloomFilter]) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // any collation is accepted: the probe reads raw UTF-8 bytes, and
    // Bloom membership is a byte-level question — collation affects
    // comparison order, never the stored encoding
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a string column, got $t")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && bloom.value.mightContainBinary(
      v.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[_]].getName)
    // fetch the broadcast value once per generated-class instance,
    // not per row — the probe itself is then just hash-and-test
    val filterTerm = ctx.addMutableState(
      classOf[BloomFilter].getName, "graftBloom",
      v => s"$v = (${classOf[BloomFilter].getName}) $bcRef.value();")
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.value} = false;
        if (!${childGen.isNull}) {
          ${ev.value} = $filterTerm.mightContainBinary(${childGen.value}.getBytes());
        }
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column API: broadcasts `bloom` ONCE PER CALL and returns the
    * probe as a reusable column function — `false` for null input,
    * never null. The returned function can gate any number of frames
    * against the SAME broadcast, but calling `bloom_might_contain`
    * itself again re-broadcasts: a driver loop that rebuilds the gate
    * per ingest batch should hold the broadcast handle instead —
    * broadcast once with `spark.sparkContext.broadcast(bloom)`, probe
    * via [[fromBroadcast]], and `destroy()` the handle when the
    * standing sketch is replaced, or stale multi-GB sketches
    * accumulate on executors.
    */
  def bloom_might_contain(spark: SparkSession,
      bloom: BloomFilter): Column => Column =
    fromBroadcast(spark.sparkContext.broadcast(bloom))

  /** The probe over a CALLER-OWNED broadcast handle — the re-use path
    * for long-lived gates (the caller controls the handle's lifetime
    * and is responsible for `destroy()` on sketch replacement).
    */
  def fromBroadcast(bc: Broadcast[BloomFilter]): Column => Column =
    c => GraftShim.column(BloomMightContain(GraftShim.expression(c), bc))
}
