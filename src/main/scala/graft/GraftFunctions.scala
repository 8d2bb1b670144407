package graft

import graft.functions.{DotProduct, DotProductLong, Md5Hash31, MinHashSignature, RollingHash, SimHash60, SortedIdPairs, WordShingles}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration for graft's native expressions, so `spark.sql` users
  * get them too:
  *
  *   vec_dot(a, b)                  — codegen'd array<double> dot product
  *   vec_dot_long(a, b)             — codegen'd array<bigint> dot product
  *   word_shingles(text, n)         — distinct word n-gram shingles
  *   minhash_sig(hashes, k)         — k-permutation MinHash signature
  *   rolling_hash(text)             — polynomial codepoint fingerprint
  *   simhash60(shingles)            — 60-bit md5-vote SimHash fingerprint
  *   md5_hash31(strings)            — per-element 31-bit md5-derived base hashes
  *   sorted_id_pairs(ids)           — generator: all a<b pairs of an id array
  *
  * Two paths:
  *   - [[GraftFunctions.register]] on an existing session;
  *   - `spark.sql.extensions=graft.GraftExtensions` at session build time
  *     (the standard extension-library hook).
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  private def arity(name: String, exprs: Seq[Expression], n: Int): Unit =
    if (exprs.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n arguments, got ${exprs.length}")

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> { exprs =>
      arity("vec_dot", exprs, 2); DotProduct(exprs(0), exprs(1))
    },
    "vec_dot_long" -> { exprs =>
      arity("vec_dot_long", exprs, 2); DotProductLong(exprs(0), exprs(1))
    },
    "word_shingles" -> { exprs =>
      arity("word_shingles", exprs, 2)
      val n = intArg(exprs(1), "shingle size")
      require(n >= 1, s"shingle size must be >= 1, got $n")
      WordShingles(exprs(0), n)
    },
    "minhash_sig" -> { exprs =>
      arity("minhash_sig", exprs, 2)
      val k = intArg(exprs(1), "signature size")
      require(k >= 1, s"signature size must be >= 1, got $k")
      val (as, bs) = Dedup31.params(k)
      MinHashSignature(exprs(0), as, bs)
    },
    "rolling_hash" -> { exprs =>
      arity("rolling_hash", exprs, 1); RollingHash(exprs(0))
    },
    "simhash60" -> { exprs =>
      arity("simhash60", exprs, 1); SimHash60(exprs(0))
    },
    "sorted_id_pairs" -> { exprs =>
      arity("sorted_id_pairs", exprs, 1); SortedIdPairs(exprs(0))
    },
    "md5_hash31" -> { exprs =>
      arity("md5_hash31", exprs, 1); Md5Hash31(exprs(0))
    },
  )

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** Deterministic 31-bit multiply-add MinHash parameter family (shared with
  * ops.Dedup — same splitmix64 derivation).
  */
private[graft] object Dedup31 {
  /** The one splitmix64 mixer every deterministic parameter family in
    * graft derives from (minhash permutations, LSH hyperplanes).
    */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private val Mask31 = 0x7fffffffL
  def params(k: Int): (IndexedSeq[Long], IndexedSeq[Long]) = (
    (0 until k).map(i => (splitmix64(2L * i + 1) & Mask31) | 1L),
    (0 until k).map(i => splitmix64(2L * i + 2) & Mask31))
}

/** `spark.sql.extensions` entry point: native SQL functions + the
  * advisory scale-lint optimizer rule.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
    e.injectOptimizerRule(_ => graft.plans.ScaleLint)
  }
}
