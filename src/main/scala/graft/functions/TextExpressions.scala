package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  *
  * All three generate code (no CodegenFallback): a CodegenFallback leaf
  * forces the ENTIRE enclosing stage out of whole-stage codegen, so every
  * other expression in the d03/d04/t07 projections paid interpreter
  * overhead too. The generated code is a single static call into the same
  * loop `nullSafeEval` uses (the standard pattern for expressions whose
  * kernel doesn't benefit from inlining — what matters is not breaking
  * the stage around them).
  */

/** Distinct word n-gram shingles of a text column (single-space
  * tokenization, empties dropped — same contract as
  * `filter(split(text, " "), length(_) > 0)` + windowed concat).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"word_shingles expects string, got ${child.dataType}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"word_shingles size must be >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  /** The kernel; called from both interpreted eval and generated code. */
  def compute(input: UTF8String, n: Int): ArrayData = {
    val words = input.toString.split(' ').iterator.filter(_.nonEmpty).toArray
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
}

/** Full MinHash signature in one pass: for permutation i,
  * sig[i] = min over base hashes h of (a(i)*h + b(i)) & mask31.
  * Input: array<long> of 31-bit base hashes; output: array<long> of
  * numHashes signature values. 31-bit arithmetic keeps every product
  * exact under ANSI mode.
  */
case class MinHashSignature(child: Expression, as: IndexedSeq[Long], bs: IndexedSeq[Long])
    extends UnaryExpression with Serializable {
  // IndexedSeq (not Array): case-class equality must be structural so two
  // identical minhash_sig calls are semanticEquals for Catalyst CSE

  @transient private lazy val asArr: Array[Long] = as.toArray
  @transient private lazy val bsArr: Array[Long] = bs.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_signature expects array<long>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], asArr, bsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the parameter arrays ride along as reference objects — constants in
    // the generated class, not re-allocated per row
    val aRef = ctx.addReferenceObj("minhashAs", asArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashBs", bsArr, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSignature.compute($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  private val Mask31 = 0x7fffffffL

  /** The kernel; called from both interpreted eval and generated code. */
  def compute(hs: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
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
}

/** Polynomial rolling hash over a string's Unicode codepoints:
  * h = fold(cp, 0)((a, c) => (a*31 + c) mod 1e9+7). The classic
  * content-defined fingerprint (order-sensitive, incremental-friendly);
  * mirrored in DuckDB via list_reduce over ord(codepoint).
  */
case class RollingHash(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"rolling_hash expects string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  private val M = 1000000007L
  private val B = 31L

  /** The kernel; called from both interpreted eval and generated code. */
  def compute(input: UTF8String): Long = {
    val it = input.toString.codePoints().iterator()
    var h = 0L
    while (it.hasNext) h = (h * B + it.next()) % M
    h
  }
}

/** 60-bit SimHash over an array of shingles in one pass: per shingle the
  * hash is the first 15 hex chars of md5 (= first 8 bytes big-endian
  * >>> 4, exactly what DuckDB's hex-fold oracle computes), each of the 60
  * bits votes +1/-1, fingerprint bit k = sign of vote k. Replaces an
  * explode + 60-column vote aggregate (a full shuffle) with a row-local
  * loop — the fingerprint step of d05 becomes scan-speed.
  */
/** Fused byte-4-gram SimHash: slides a 4-byte window over the input
  * string's bytes, dedups grams in place (4 ASCII bytes pack into one
  * int key — no per-gram string allocation, no intermediate
  * array + array_distinct pass), and votes each DISTINCT gram's
  * md5-derived 60-bit hash exactly like [[SimHash60]]. Semantically the
  * m07 fingerprint — "distinct byte 4-grams vote a 60-bit SimHash" —
  * computed in one tight loop instead of
  * `simhash60(array_distinct(transform(sequence(...), substr(i,4))))`,
  * which materialized (len−3) UTF8String slices per row before hashing
  * (the measured m07 hot spot at sf0.1). On ASCII payloads (the
  * documented m07/m02 convention, and what the stand-in media() emits)
  * byte grams == the oracle's character substrings, so gate equality is
  * unchanged; the byte form is the operator's DECLARED semantics for
  * real (binary) payloads.
  */
case class ByteGramSimHash60(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"byte_gram_simhash60 expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    ByteGramSimHash60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ByteGramSimHash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteGramSimHash60 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  // reused per-thread gram buffer: dedup via sort + adjacent-skip over
  // packed ints — zero boxing, zero per-row set allocation (voting is
  // order-independent, so sorted iteration changes nothing)
  private val grams = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](1 << 12)
  }

  /** The kernel; called from both interpreted eval and generated code. */
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length - 3
    val votes = new Array[Int](60)
    val md = digest.get()
    val gram = new Array[Byte](4)
    var buf = grams.get()
    if (n > 0 && buf.length < n) {
      buf = new Array[Int](Integer.highestOneBit(n) << 1)
      grams.set(buf)
    }
    var i = 0
    while (i < n) {
      buf(i) = ((bytes(i) & 0xff) << 24) | ((bytes(i + 1) & 0xff) << 16) |
        ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
      i += 1
    }
    if (n > 0) java.util.Arrays.sort(buf, 0, n)
    i = 0
    while (i < n) {
      val key = buf(i)
      if (i == 0 || key != buf(i - 1)) {
        gram(0) = (key >>> 24).toByte; gram(1) = (key >>> 16).toByte
        gram(2) = (key >>> 8).toByte; gram(3) = key.toByte
        md.reset()
        val d = md.digest(gram)
        // first 15 hex chars == first 8 bytes as unsigned big-endian >>> 4
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        h = h >>> 4
        var k = 0
        while (k < 60) {
          if (((h >> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
          k += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < 60) { if (votes(k) > 0) fp |= (1L << k); k += 1 }
    fp
  }
}

case class SimHash60(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash60 expects array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The kernel; called from both interpreted eval and generated code. */
  def compute(shingles: ArrayData): Long = {
    val md = digest.get()
    val n = shingles.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(shingles.getUTF8String(i).getBytes)
      // first 15 hex chars == first 8 bytes as unsigned big-endian >>> 4
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = h >>> 4
      var k = 0
      while (k < 60) {
        if (((h >> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
        k += 1
      }
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < 60) { if (votes(k) > 0) fp |= (1L << k); k += 1 }
    fp
  }
}

/** Generator (UDTF role): all ordered pairs (a < b) of a long-array
  * column — one output row per pair. Used by the d03 inverted index:
  * after `collect_list(doc_id) group by shingle` (df-capped, so the
  * array is bounded), each posting list expands to its candidate pairs
  * in a single pass — replacing a second shuffle-heavy self-join of the
  * exploded index. Generators run under GenerateExec (not inside an
  * expression tree), so CodegenFallback here does not break the
  * surrounding whole-stage codegen the way a scalar fallback would.
  */
case class SortedIdPairs(child: Expression)
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback with Serializable {

  override def elementSchema: StructType = StructType(Seq(
    StructField("ida", LongType, nullable = false),
    StructField("idb", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"sorted_id_pairs expects array<long>, got $t")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < 2) Iterator.empty
    else {
      val ids = arr.toLongArray().clone()
      java.util.Arrays.sort(ids)
      new Iterator[InternalRow] {
        private var i = 0
        private var j = 1
        def hasNext: Boolean = i < ids.length - 1
        def next(): InternalRow = {
          val r = InternalRow(ids(i), ids(j))
          j += 1
          if (j >= ids.length) { i += 1; j = i + 1 }
          r
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-element 31-bit md5-derived base hashes of a string array: for
  * each element, the lower 31 bits of the shared cross-engine 60-bit
  * md5 prefix (DETERMINISM.md rules 8-10 — DuckDB rebuilds the same
  * value by folding 15 hex chars). One native call per ROW (the whole
  * array in a tight loop) instead of a `transform` lambda evaluating
  * md5/substring/conv expressions per ELEMENT — the d04 signature
  * input, where the per-element expression overhead dominated.
  */
case class Md5Hash31(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull must be false: the kernel hashes every element and the
    // declared output promises non-null; a null element would NPE inside
    // codegen. Callers with nullable elements (e.g. a raw split()) filter
    // first — a clear analysis error beats a runtime NPE.
    case ArrayType(StringType, false) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_hash31 expects array<string> with non-null elements, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    Md5Hash31.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash31.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Hash31 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The kernel; called from both interpreted eval and generated code. */
  def compute(strs: ArrayData): ArrayData = {
    val md = digest.get()
    val n = strs.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(strs.getUTF8String(i).getBytes)
      // first 15 hex chars == first 8 bytes as unsigned big-endian >>> 4
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      out(i) = (h >>> 4) & 0x7fffffffL
      i += 1
    }
    new GenericArrayData(out)
  }
}

object TextFunctions {
  def md5_hash31(c: Column): Column =
    ColumnBridge.column(Md5Hash31(ColumnBridge.expression(c)))

  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))

  def sorted_id_pairs(c: Column): Column =
    ColumnBridge.column(SortedIdPairs(ColumnBridge.expression(c)))

  def simhash60(c: Column): Column =
    ColumnBridge.column(SimHash60(ColumnBridge.expression(c)))

  def word_shingles(c: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(c), n))

  def minhash_signature(c: Column, as: IndexedSeq[Long], bs: IndexedSeq[Long]): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(c), as, bs))

  def byte_gram_simhash60(c: Column): Column =
    ColumnBridge.column(ByteGramSimHash60(ColumnBridge.expression(c)))
}
