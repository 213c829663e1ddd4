package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature over the w-word shingles of a tokenized document,
  * computed in ONE native pass.
  *
  * The declarative formulation — build shingle strings with
  * transform+slice+concat_ws, hash them, then take 32 array_min's over
  * 32 transform'ed copies — walks interpreted HOF machinery 32× per
  * document and allocates every shingle string (measured ~5 s for 5k
  * docs). Here each word is xxhash64'd once, shingle hashes are
  * chained from word hashes (no string allocation), and all `numHashes`
  * running minima advance in the same pass: ~50× less work, same LSH
  * quality. Documents shorter than the shingle width contribute one
  * whole-document shingle so they still dedup exactly.
  */
case class MinHashShingles(child: Expression, numHashes: Int, shingleWidth: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_shingles expects array<string>, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    val wordHashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      wordHashes(i) = XXH64.hashUnsafeBytes(w.getBaseObject, w.getBaseOffset, w.numBytes(), 42L)
      i += 1
    }
    val mins = Array.fill(numHashes)(Long.MaxValue)
    def addShingle(h: Long): Unit = {
      var k = 0
      while (k < numHashes) {
        val hk = XXH64.hashLong(h, k.toLong)
        if (hk < mins(k)) mins(k) = hk
        k += 1
      }
    }
    if (n < shingleWidth) {
      var h = 0L
      var j = 0
      while (j < n) { h = XXH64.hashLong(wordHashes(j), h); j += 1 }
      addShingle(h)
    } else {
      var s = 0
      while (s <= n - shingleWidth) {
        var h = 0L
        var j = 0
        while (j < shingleWidth) { h = XXH64.hashLong(wordHashes(s + j), h); j += 1 }
        addShingle(h)
        s += 1
      }
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashShingles {
  /** Column API: `numHashes`-long minhash signature over
    * `shingleWidth`-word shingles of an array<string> column.
    */
  def minhash_shingles(words: Column, numHashes: Int, shingleWidth: Int): Column =
    GraftShim.column(MinHashShingles(GraftShim.expression(words), numHashes, shingleWidth))
}
