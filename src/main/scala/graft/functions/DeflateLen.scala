package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Raw-DEFLATE compressed byte length of a UTF-8 string — the kernel
  * of the compression-ratio quality signal (a document whose deflate
  * ratio is far below the corpus band is boilerplate/repetition; far
  * above is high-entropy noise — the classic complement to the
  * n-gram repetition and character-entropy heuristics, which see
  * only fixed-width structure while LZ77 sees arbitrary-distance
  * repeats up to its 32 KiB window).
  *
  * Level 6 (zlib default), `nowrap = true` (no 2-byte header /
  * 4-byte Adler32 — the length measures content, not framing).
  * Deterministic for a fixed input/level/strategy on a fixed JDK's
  * bundled zlib, which is all the driver compares; the cross-engine
  * gate therefore grades format-certainty properties (equal inputs ⇒
  * equal lengths, zlib's published worst-case bound) rather than the
  * raw lengths — see Curation.compressGate.
  *
  * The Deflater is a native-heap object, so one is kept per thread
  * and reset per row rather than allocated per row (allocation +
  * finalization dominates the kernel on short docs).
  */
case class DeflateLen(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"deflate_len expects string, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val d = DeflateLen.local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = DeflateLen.buffer.get()
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateLen {
  private val local: ThreadLocal[Deflater] = ThreadLocal.withInitial(() =>
    new Deflater(6, true))
  private val buffer: ThreadLocal[Array[Byte]] = ThreadLocal.withInitial(() =>
    new Array[Byte](16384))

  def deflateLen(text: Column): Column =
    GraftShim.column(DeflateLen(GraftShim.expression(text)))
}
