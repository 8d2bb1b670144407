package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Morton (z-order) clustering — the multi-dimensional layout technique
  * behind the OPTIMIZE ZORDER step of the public Delta/Iceberg engines
  * (Morton 1966): bit-interleaving two columns' bin indices makes BOTH
  * columns' value ranges narrow within any contiguous slice of the
  * curve, so per-file min/max statistics prune a two-predicate scan to
  * a handful of files where a single-column sort leaves one predicate
  * full-width in every file.
  *
  * Shared by p28 (the layout-planning report over the would-be file
  * manifest) and [[Zorder.write]] (the physical clustered write through
  * [[graft.sources.ShardWriter.writeClustered]]).
  *
  * Scale shape: pass 1 is ONE min/max row broadcast (the p07 two-pass
  * contract); pass 2 is row-local integer bit arithmetic — no corpus
  * exchange beyond the final range repartition the write needs anyway.
  * All arithmetic is exact-integer (truncating DIV, shifts, masks) so
  * the planning report and the DuckDB oracle agree bit-for-bit.
  */
object Zorder {

  /** Bits per dimension: a 256×256 grid, 16-bit Morton codes. */
  private[graft] val ZBits = 8
  private[graft] val ZGrid = 1L << ZBits

  /** Add 8-bit bins `ba`/`bb` and the 16-bit Morton code `z` for two
    * integral columns, keeping every input column. Bin = `(v - min) *
    * 256 DIV (range + 1)` — monotone, exact-integer, constant-bin on a
    * degenerate (single-value) dimension. Column names `ba`, `bb`, `z`
    * (and the `__z*` scratch prefix) are reserved on the input.
    */
  private[graft] def withZ(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val in = df
      .withColumn("__zva", aCol.cast("long"))
      .withColumn("__zvb", bCol.cast("long"))
    val mm = in.agg(
      min(col("__zva")).as("__mna"), max(col("__zva")).as("__mxa"),
      min(col("__zvb")).as("__mnb"), max(col("__zvb")).as("__mxb"))
    val binned = in.crossJoin(broadcast(mm))
      .withColumn("ba", expr(
        s"CASE WHEN __mxa > __mna THEN ((__zva - __mna) * $ZGrid) DIV (__mxa - __mna + 1) ELSE CAST(0 AS BIGINT) END"))
      .withColumn("bb", expr(
        s"CASE WHEN __mxb > __mnb THEN ((__zvb - __mnb) * $ZGrid) DIV (__mxb - __mnb + 1) ELSE CAST(0 AS BIGINT) END"))
    val z = (0 until ZBits).map { i =>
      shiftright(col("ba"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
        shiftright(col("bb"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
    }.reduce(_ + _)
    binned
      .withColumn("z", z)
      .drop("__zva", "__zvb", "__mna", "__mxa", "__mnb", "__mxb")
  }

  /** The bin basis a z-order layout was WRITTEN with. The read path's
    * pruning predicate must bin the query box with exactly these bounds
    * — a caller re-deriving them from memory (or from a table that has
    * since grown) silently mis-bins and mis-prunes, which is why
    * [[write]] persists this record as a `_zorder_manifest.json`
    * sidecar next to the files and [[loadManifest]] reads it back.
    */
  case class ZManifest(mna: Long, mxa: Long, mnb: Long, mxb: Long, zbits: Int)

  private val ManifestFile = "_zorder_manifest.json"

  /** Persist a bin basis as the layout's sidecar — factored from
    * [[write]] so layouts z-ordered by other writers (the clustered
    * incremental OPTIMIZE, [[Compaction.compactWhere]]) carry the same
    * record and [[loadManifest]] serves them all.
    */
  private[graft] def writeManifest(path: String, m: ZManifest): Unit =
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, ManifestFile),
      s"""{"mna":${m.mna},"mxa":${m.mxa},"mnb":${m.mnb},"mxb":${m.mxb},"zbits":${m.zbits}}""")

  private[graft] def manifestExists(path: String): Boolean =
    new java.io.File(path, ManifestFile).exists()

  /** The Morton code under a FROZEN basis as one row-local column over
    * two non-negative integral columns named `an`/`bn` — the expression
    * form of [[write]]'s bin + interleave, for writers that compose the
    * z order into their own plan (clustered compaction packs each day's
    * rows along this curve).
    */
  private[graft] def zExpr(an: String, bn: String, m: ZManifest): Column = {
    require(m.zbits == ZBits,
      s"basis written with zbits=${m.zbits}, writer uses $ZBits")
    def bin(cn: String, mn: Long, mx: Long): Column =
      if (mx > mn) expr(s"(($cn - $mn) * $ZGrid) DIV ${mx - mn + 1}") else lit(0L)
    val (ba, bb) = (bin(an, m.mna, m.mxa), bin(bn, m.mnb, m.mxb))
    (0 until ZBits).map { i =>
      shiftright(ba, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
        shiftright(bb, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
    }.reduce(_ + _)
  }

  /** Physically z-order `df` on `(aCol, bCol)` into `shards` range-
    * clustered parquet files under `path`. Every output file holds a
    * contiguous slice of the Morton curve (range bounds sampled by
    * RangePartitioner, rows sorted by `z` inside each file), so each
    * file's parquet min/max footer covers ≤ a curve-slice-narrow box of
    * BOTH clustered columns — the property the read-back pruning test
    * asserts and the p28 manifest plans for. The `ba`/`bb`/`z` columns
    * ride along in the output: `z` documents the layout and gives a
    * reader a directly range-prunable 1-D key for 2-D boxes.
    *
    * The writer-side min/max pass lands on the driver as FOUR longs
    * (one tiny aggregate — the p07 two-pass contract), which makes the
    * bins literal constants in the write plan AND gives the sidecar its
    * contents: the returned [[ZManifest]] is also persisted as
    * `_zorder_manifest.json` under `path` (underscore-prefixed, so
    * parquet readers ignore it), closing the round-12 gap where
    * [[boxPruningPredicate]] trusted whatever bounds the caller
    * remembered.
    */
  def write(df: DataFrame, path: String, aCol: Column, bCol: Column,
            shards: Int, maxRecordsPerFile: Long = 1000000L): ZManifest = {
    val in = df
      .withColumn("__zva", aCol.cast("long"))
      .withColumn("__zvb", bCol.cast("long"))
    val r = in.agg(
      min(col("__zva")), max(col("__zva")),
      min(col("__zvb")), max(col("__zvb"))).head
    val m = ZManifest(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), ZBits)
    def bin(cn: String, mn: Long, mx: Long): Column =
      if (mx > mn) expr(s"(($cn - $mn) * $ZGrid) DIV ${mx - mn + 1}")
      else lit(0L)
    val binned = in
      .withColumn("ba", bin("__zva", m.mna, m.mxa))
      .withColumn("bb", bin("__zvb", m.mnb, m.mxb))
    val z = (0 until ZBits).map { i =>
      shiftright(col("ba"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
        shiftright(col("bb"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
    }.reduce(_ + _)
    graft.sources.ShardWriter.writeClustered(
      binned.withColumn("z", z).drop("__zva", "__zvb"),
      path, Seq(col("z")), shards, maxRecordsPerFile)
    writeManifest(path, m)
    m
  }

  /** The bin basis persisted by [[write]] — the read path's source of
    * truth for [[boxPruningPredicate]]'s writer bounds.
    */
  def loadManifest(path: String): ZManifest = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new java.io.File(path, ManifestFile))
    require(node.get("zbits").asInt == ZBits,
      s"layout written with zbits=${node.get("zbits").asInt}, reader uses $ZBits")
    ZManifest(node.get("mna").asLong, node.get("mxa").asLong,
      node.get("mnb").asLong, node.get("mxb").asLong, node.get("zbits").asInt)
  }

  /** The Morton code of one (binA, binB) cell — the Scala twin of the
    * column-expression interleave in [[withZ]].
    */
  private[graft] def interleave(ba: Long, bb: Long): Long =
    (0 until ZBits).foldLeft(0L) { (acc, i) =>
      acc + (((ba >> i) & 1L) << (2 * i + 1)) + (((bb >> i) & 1L) << (2 * i))
    }

  /** READ path: the inclusive z ranges covering the bin box
    * [a0..a1]×[b0..b1] — what a 2-D predicate becomes on the 1-D sort
    * key the files are clustered by. Exact by construction (every box
    * cell's code enumerated, consecutive runs merged); when the merged
    * run count exceeds `maxRanges` the nearest gaps are coalesced, so
    * the result is a SUPERSET of the box — callers must AND the exact
    * column predicates on top (the ranges only exist to prune I/O).
    * An axis-aligned power-of-two box (the common grid-quantized case)
    * merges to ONE range. Driver-side work is O(box cells) over a
    * 256×256 grid — bounded, never corpus-dependent.
    */
  private[graft] def zRanges(a0: Long, a1: Long, b0: Long, b1: Long,
                             maxRanges: Int = 64): Seq[(Long, Long)] = {
    // maxRanges = 0 would coalesce to a single run and then MatchError
    // inside the sliding window — fail with the contract, not a crash
    require(maxRanges >= 1, s"maxRanges must be >= 1, got $maxRanges")
    require(a0 <= a1 && b0 <= b1 && a0 >= 0 && b0 >= 0 &&
      a1 < ZGrid && b1 < ZGrid, s"bin box out of the ${ZGrid}x$ZGrid grid")
    val codes = for (ba <- a0 to a1; bb <- b0 to b1) yield interleave(ba, bb)
    val sorted = codes.sorted
    val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    for (z <- sorted) runs.lastOption match {
      case Some((lo, hi)) if z == hi + 1 => runs(runs.length - 1) = (lo, z)
      case _                             => runs += ((z, z))
    }
    var merged = runs.toVector
    while (merged.length > maxRanges) {
      // coalesce the smallest gap: stays a superset, shrinks the list
      val gaps = merged.sliding(2).map { case Vector((_, h), (l, _)) => l - h }.toVector
      val i = gaps.indexOf(gaps.min)
      merged = (merged.take(i) :+ (merged(i)._1, merged(i + 1)._2)) ++ merged.drop(i + 2)
    }
    merged
  }

  /** The pruning predicate for a raw-value box over z-written files:
    * bins the box corners with the SAME two-pass min/max the writer
    * used (pass the writer corpus's min/max), translates to z ranges,
    * and ORs `z BETWEEN` terms — sargable, so the parquet reader skips
    * every file/row-group whose z footer stats miss all ranges. AND the
    * exact a/b predicates on top; this predicate alone may be a
    * superset (range coalescing, bin granularity).
    */
  def boxPruningPredicate(zCol: Column,
                          mna: Long, mxa: Long, mnb: Long, mxb: Long,
                          aLo: Long, aHi: Long, bLo: Long, bHi: Long): Column = {
    // a query box that misses the written data's value range entirely is
    // a legitimately EMPTY query: prune everything (the clamped corners
    // would otherwise invert and zRanges would reject the bin box)
    if (aHi < mna || aLo > mxa || bHi < mnb || bLo > mxb) return lit(false)
    def bin(v: Long, mn: Long, mx: Long): Long =
      if (mx > mn) (v - mn) * ZGrid / (mx - mn + 1) else 0L
    val ranges = zRanges(
      bin(aLo.max(mna), mna, mxa), bin(aHi.min(mxa), mna, mxa),
      bin(bLo.max(mnb), mnb, mxb), bin(bHi.min(mxb), mnb, mxb))
    ranges.map { case (lo, hi) => zCol.between(lit(lo), lit(hi)) }.reduce(_ || _)
  }

  /** [[boxPruningPredicate]] against the PERSISTED bin basis — the read
    * path that cannot mis-prune: the bounds come from the layout's own
    * sidecar ([[loadManifest]]), not from whatever the caller remembers
    * about the table at some earlier time.
    */
  def boxPruningPredicate(path: String, zCol: Column,
                          aLo: Long, aHi: Long, bLo: Long, bHi: Long): Column = {
    val m = loadManifest(path)
    boxPruningPredicate(zCol, m.mna, m.mxa, m.mnb, m.mxb, aLo, aHi, bLo, bHi)
  }
}
