package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the dedup hot path.
  *
  * The composed forms were pathological: `transform(sequence(...), i =>
  * concat_ws(element_at(w,i), ...))` re-inlines (and so re-computes) the
  * `split` once per element_at — O(tokens²) string splitting per document —
  * and runs through interpreted lambdas. Likewise the 128-permutation
  * MinHash signature as 128 `array_min(transform(...))` columns was ~50M
  * interpreted lambda evals at sf0.1. Each expression here is one tight
  * JVM loop per row.
  */

/** Distinct word n-gram shingles of a text column (single-space
  * tokenization, empties dropped — same contract as
  * `filter(split(text, " "), length(_) > 0)` + windowed concat).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback with Serializable {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"word_shingles expects string, got ${child.dataType}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"word_shingles size must be >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString
      .split(' ').iterator.filter(_.nonEmpty).toArray
    val out = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= words.length) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
      out.add(sb.toString)
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Full MinHash signature in one pass: for permutation i,
  * sig[i] = min over base hashes h of (a(i)*h + b(i)) & mask31.
  * Input: array<long> of 31-bit base hashes; output: array<long> of
  * numHashes signature values. 31-bit arithmetic keeps every product
  * exact under ANSI mode.
  */
case class MinHashSignature(child: Expression, as: IndexedSeq[Long], bs: IndexedSeq[Long])
    extends UnaryExpression with CodegenFallback with Serializable {
  // IndexedSeq (not Array): case-class equality must be structural so two
  // identical minhash_sig calls are semanticEquals for Catalyst CSE

  private val Mask31 = 0x7fffffffL

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_signature expects array<long>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val m = hs.numElements()
    val sig = Array.fill(as.length)(Long.MaxValue)
    var j = 0
    while (j < m) {
      val h = hs.getLong(j)
      var i = 0
      while (i < as.length) {
        val v = (as(i) * h + bs(i)) & Mask31
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Polynomial rolling hash over a string's Unicode codepoints:
  * h = fold(cp, 0)((a, c) => (a*31 + c) mod 1e9+7). The classic
  * content-defined fingerprint (order-sensitive, incremental-friendly);
  * mirrored in DuckDB via list_reduce over ord(codepoint).
  */
case class RollingHash(child: Expression)
    extends UnaryExpression with CodegenFallback with Serializable {

  private val M = 1000000007L
  private val B = 31L

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"rolling_hash expects string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val it = input.asInstanceOf[UTF8String].toString.codePoints().iterator()
    var h = 0L
    while (it.hasNext) h = (h * B + it.next()) % M
    h
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))

  def word_shingles(c: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(c), n))

  def minhash_signature(c: Column, as: IndexedSeq[Long], bs: IndexedSeq[Long]): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(c), as, bs))
}
