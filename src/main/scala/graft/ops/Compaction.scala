package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the lakehouse OPTIMIZE maintenance pass: an
  * existing layout (p15's streaming sink writes one parquet file per
  * micro-batch per day — many tiny files by construction) is rewritten
  * into byte-budget-sized files, one per (day, file_idx), with a
  * deterministic plan so the rewrite is reproducible and a re-run of an
  * already-compacted layout is a no-op.
  *
  * The packing rule is m05's: rows take a deterministic md5 global
  * order inside their day and land in the file where their byte offset
  * starts — `file_idx = (running_sum − row_bytes − day_start) DIV
  * budget` — so records never split and a file overflows the budget by
  * at most its last record. `row_bytes` is the LOGICAL row size (fixed
  * field widths + the string column), the budget currency both engines
  * can compute exactly; physical parquet bytes differ by encoding, and
  * the before/after [[LayoutStats]] report carries the physical truth.
  *
  * Scale shape: the running sum is [[graft.plans.GlobalOrder
  * .withGlobalRunningSum]] over (day, md5, id) — ONE range exchange
  * (which the clustered write wants anyway) + a per-range-partition
  * window + P partial sums on the driver; the per-day rebase is a
  * days-sized aggregate broadcast back, so a heavy day never funnels
  * through one task the way a `PARTITION BY day` window would. The
  * write repartitions by (day, file_idx) so each planned file is
  * exactly one task's one output file. No stage is corpus × corpus;
  * driver work is O(range partitions + days).
  *
  * Determinism: byte sizes and offsets are exact integers in md5
  * order; the same rows always produce the same (day, file_idx)
  * layout, which is what makes re-compaction idempotent and lets the
  * p29 gate entry recompute the manifest FROM THE WRITTEN FILES and
  * hash-match it against the DuckDB-planned manifest.
  */
object Compaction {

  /** Logical bytes of one ingested event row: four fixed 8-byte fields
    * (event_id, user_id, day, value) + the event_type string.
    */
  private[graft] val RowOverheadBytes = 32L

  private[graft] def rowBytes: Column =
    lit(RowOverheadBytes) + length(col("event_type")).cast("long")

  /** The default within-day pack order: deterministic md5 shuffle of
    * the rows (content-independent, skew-proof). The CLUSTERED pass
    * swaps in [[zPackKey]] — same machinery, z-curve order.
    */
  private[graft] def defaultPackKey: Seq[Column] =
    Seq(md5(col("event_id").cast("string")), col("event_id"))

  /** The z-curve pack order under a frozen basis: Morton code of
    * (user_id, event_id) first, md5/id tiebreak — packing along this
    * key is what makes every output file cover a narrow box of BOTH
    * clustered columns (the OPTIMIZE ZORDER composition).
    */
  private[graft] def zPackKey(m: Zorder.ZManifest): Seq[Column] =
    Zorder.zExpr("user_id", "event_id", m) +: defaultPackKey

  /** The z bin basis of an event population — ONE tiny min/max
    * aggregate (the p07 two-pass contract). Callers freeze the result
    * in the layout's sidecar; they never re-derive it from a table
    * that has since grown.
    */
  private[graft] def zBasisOf(rows: DataFrame): Zorder.ZManifest = {
    val r = rows.agg(min(col("user_id")), max(col("user_id")),
      min(col("event_id")), max(col("event_id"))).head
    require(!r.isNullAt(0) && !r.isNullAt(2),
      "cannot derive a z basis from an empty population")
    Zorder.ZManifest(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      Zorder.ZBits)
  }

  /** The deterministic packing plan: input rows + `file_idx`, assigned
    * by per-day byte offset in `packKey` row order against `budget`.
    */
  private[graft] def planLayout(rows: DataFrame, budget: Long,
      packKey: Seq[Column] = defaultPackKey): DataFrame = {
    require(budget >= 1, s"byte budget must be >= 1, got $budget")
    planLayoutBy(rows, lit(budget), packKey)
  }

  /** [[planLayout]] with a per-row budget expression — p30's mixed
    * starting layout packs even days at the target budget and odd days
    * at litter size, all in one plan. The budget must be constant
    * within a day (the offset rule is per-day).
    */
  private[graft] def planLayoutBy(rows: DataFrame, budget: Column,
      packKey: Seq[Column] = defaultPackKey): DataFrame = {
    // planLayout's require() can't see a per-row budget — guard in the
    // expression so an invalid budget fails loudly instead of DIV'ing
    // by zero into null file_idx (rows silently vanishing from
    // partitionBy dirs) or negative file_idx dirs
    val guarded = when(budget >= 1, budget).otherwise(raise_error(
      concat(lit("byte budget must be >= 1, got "), budget.cast("string"))))
    val keyed = rows.withColumn("__cb", rowBytes).withColumn("__budget", guarded)
    val summed = graft.plans.GlobalOrder.withGlobalRunningSum(
      keyed, col("day") +: packKey, col("__cb"), "__cs")
    // rebase the GLOBAL running sum to a per-day offset: the day's first
    // row has the day's minimal exclusive prefix (__cs - __cb)
    val dayStart = summed.groupBy(col("day"))
      .agg(min(col("__cs") - col("__cb")).as("__d0"))
    summed.join(broadcast(dayStart), "day")
      .withColumn("file_idx", expr("(__cs - __cb - __d0) DIV __budget"))
      .drop("__cs", "__d0", "__budget")
  }

  /** The clustered write tail shared by [[compact]] and the p30 mixed
    * fixture: one shuffle partition per planned (day, file_idx) →
    * exactly one parquet file per planned entry; rows inside keep the
    * pack order so re-writes are byte-stable.
    */
  private[graft] def writeLayout(planned: DataFrame, outRoot: String,
      packKey: Seq[Column] = defaultPackKey): Unit =
    planned.drop("__cb")
      .repartition(col("day"), col("file_idx"))
      .sortWithinPartitions(
        Seq(col("day"), col("file_idx")) ++ packKey: _*)
      .write.mode("overwrite").partitionBy("day", "file_idx").parquet(outRoot)

  /** Physical layout stats (parquet file count + bytes on disk) — the
    * before/after manifest's "what did this actually buy" half.
    */
  case class LayoutStats(nFiles: Long, bytes: Long)

  private[graft] def layoutStats(root: String): LayoutStats = {
    val fs = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
    try {
      val parquet = fs.filter(p => p.toString.endsWith(".parquet") &&
        java.nio.file.Files.isRegularFile(p))
      val (n, b) = parquet.toArray.foldLeft((0L, 0L)) { case ((n, b), p) =>
        (n + 1, b + java.nio.file.Files.size(p.asInstanceOf[java.nio.file.Path]))
      }
      LayoutStats(n, b)
    } finally fs.close()
  }

  /** Rewrite the event layout under `inRoot` into byte-budget files
    * under `outRoot` (one file per planned (day, file_idx)) and return
    * the (before, after) physical stats. Deterministic: compacting an
    * already-compacted layout plans the identical file set.
    *
    * With `zorder = true` this is the FULL clustered rewrite — and the
    * z-basis REFRESH point (round-14 verdict gap #3): the Morton basis
    * is re-derived from the ENTIRE population being rewritten and a
    * fresh sidecar replaces whatever `outRoot` carried, so a layout
    * whose population has drifted far outside the original bins gets
    * its per-file min/max tightness back. This is exactly the refresh
    * [[compactWhere]] defers: the incremental pass must keep its basis
    * frozen (re-deriving from a grown table would re-bin — and so
    * breach — every already-clustered day), but a full rewrite touches
    * every row anyway, so re-binning is free and strictly sharpens
    * pruning. The division of labor: compactWhere = incremental,
    * frozen basis, breached days only; compact(zorder) = full rewrite,
    * fresh basis, every day re-clustered (also the recluster path for
    * a layout that is budget-compliant but packed in a stale order,
    * which the WHERE pass by design never touches).
    */
  def compact(s: SparkSession, inRoot: String, outRoot: String,
              budget: Long, zorder: Boolean = false,
              dayFilter: Option[Seq[Long]] = None): (LayoutStats, LayoutStats) = {
    val before = layoutStats(inRoot)
    val all = graft.streaming.IngestPipeline.readShards(s, inRoot)
    // dayFilter is maintainLayout's watermark restriction: a recluster
    // under a live writer rewrites the CLOSED history only (open days
    // stay in the live root), and the refreshed basis below derives
    // from exactly the population being rewritten
    val rows = dayFilter.map(ds => all.filter(col("day").isin(ds: _*))).getOrElse(all)
    if (!zorder) writeLayout(planLayout(rows, budget), outRoot)
    else {
      val m = zBasisOf(rows)
      val key = zPackKey(m)
      writeLayout(planLayout(rows, budget, key), outRoot, key)
      Zorder.writeManifest(outRoot, m) // refreshed basis supersedes any prior sidecar
    }
    (before, layoutStats(outRoot))
  }

  /** The plan's per-day file count WITHOUT planning: under the offset
    * rule a day's last row (max (md5, id)) starts at offset
    * `day_bytes − last_row_bytes`, so its file_idx — and hence the
    * day's planned file count − 1 — is that offset DIV budget. ONE
    * per-day aggregate (map-side combined, no global running sum, no
    * range exchange): the census a nightly no-op pass can afford at
    * 100 TB, exact by the same arithmetic [[planLayout]] packs with
    * (equivalence pinned in ScaleTechniquesSpec). Exact when no single
    * row exceeds the budget (then offsets step by ≤ budget and no
    * file_idx is skipped, so last_idx + 1 IS the distinct count) — the
    * same regime the packing rule's "overflows by at most its last
    * record" contract already assumes. A day holding a row LARGER than
    * the budget can skip file_idx values, so its closed-form count
    * reads HIGH — and since the census recomputes identically every
    * run, that day's breach would be suppressed PERMANENTLY, not
    * delayed (round-14 ADVICE #2). The `oversized` flag (max row bytes
    * > budget) marks exactly those days so [[compactWhere]] can price
    * them with the exact plan instead; in the normal regime the flag is
    * false everywhere and the census stays one closed-form aggregate.
    */
  private[graft] def plannedCountsByDay(rows: DataFrame, budget: Long,
      packKey: Seq[Column] = defaultPackKey): DataFrame =
    rows.withColumn("__cb", rowBytes)
      .groupBy(col("day"))
      .agg(sum(col("__cb")).as("__db"),
        max_by(col("__cb"), struct(packKey: _*)).as("__lb"),
        max(col("__cb")).as("__mb"))
      .select(col("day"), expr("(__db - __lb) DIV " + budget + " + 1").as("nf"),
        (col("__mb") > budget).as("oversized"))

  /** Crash recovery for [[compactWhere]]'s swap. The swap itself never
    * deletes before it has renamed (old dir aside into the stage as
    * `day=N.old`, staged dir in, THEN delete the aside copy — both
    * renames same-filesystem atomic), so at every crash point at least
    * one COMPLETE copy of each day exists: either the layout dir, or
    * the staged `day=N` (crash between aside-rename and move-in). On
    * entry, any staged `day=N` whose layout dir is missing is moved
    * back in; everything else in the stage — `.old` aside copies whose
    * swap completed, partial write debris, duplicates of days that
    * were never renamed aside — is superseded and dropped with it.
    */
  private def recoverStage(root: String): Unit = {
    val stage = new java.io.File(root, "_optimize_stage")
    if (stage.exists()) {
      Option(stage.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.isDirectory && f.getName.matches("day=-?\\d+")).foreach { d =>
          val dst = new java.io.File(root, d.getName)
          if (!dst.exists()) java.nio.file.Files.move(d.toPath, dst.toPath)
        }
      org.apache.commons.io.FileUtils.deleteDirectory(stage)
    }
  }

  /** Incremental OPTIMIZE (the `OPTIMIZE ... WHERE` maintenance pass):
    * rewrite IN PLACE only the days whose physical file count exceeds
    * what the deterministic plan needs at `budget`; healthy days' files
    * are left untouched byte-for-byte. The breach rule is exact, not a
    * heuristic threshold: a day already at the planned layout has
    * current == planned count (the plan is deterministic), so re-running
    * the pass is a guaranteed no-op — and a day whose current count
    * EQUALS the planned count while the layouts differ cannot exist
    * (litter packing is strictly finer except in the 1-file case, where
    * the layouts coincide).
    *
    * Scale shape — work ∝ fragmented days, end to end: the physical
    * census is a driver walk of day dirs (days are metadata-sized); the
    * planned census is [[plannedCountsByDay]] — one per-day aggregate,
    * NO range exchange, so the nightly no-breach pass never replans the
    * table; only when days breach does [[planLayout]] run, and then
    * over the breached days' rows ONLY (file_idx is per-day-rebased, so
    * the restricted plan is identical to the full plan's restriction —
    * and the day filter prunes the partitioned scan). On an object
    * store the stage-then-swap pair is the delete-then-commit a table
    * format would make transactional; [[recoverStage]] heals the one
    * non-atomic window on the next run.
    *
    * With `zorder = true` this is OPTIMIZE ... WHERE ... ZORDER BY
    * (user_id, event_id) — one rewrite that budget-packs AND clusters:
    * breached days' rows pack along the Morton curve ([[zPackKey]]),
    * so every rewritten file covers a narrow box of both columns (the
    * pruning stats [[manifestClustered]] reports). The bin basis is
    * FROZEN in the layout's `_zorder_manifest.json` sidecar (written on
    * first optimize if absent, loaded thereafter — Zorder's rule: a
    * basis re-derived from a table that has since grown silently
    * re-bins every already-clustered day, breaching the whole table).
    * KNOWN LIMIT of the incremental pass (by design): the breach rule
    * is file-COUNT only, so a day already at the target count but
    * packed in a stale order (md5, or an old basis) is never re-packed
    * by this pass — enabling `zorder` on an existing compliant layout
    * re-clusters only days that also breach the budget. Re-clustering
    * a compliant layout, and refreshing a drifted basis, is
    * [[compact]]`(zorder = true)`'s job: the full rewrite touches
    * every row anyway, so it re-derives the basis and re-packs all
    * days (round-14 ADVICE #1).
    *
    * `closed` is the WATERMARK contract for compacting under a live
    * writer: the maintenance pass may only touch days the stream has
    * finished with (closed(day) == true); open days are never censused,
    * never planned, never swapped — the stream keeps appending to them
    * while the pass runs (the Round14Spec seam test runs both
    * concurrently and pins conservation + open-day non-interference).
    *
    * Returns (breached days ascending, before stats, after stats).
    */
  def compactWhere(s: SparkSession, root: String, budget: Long,
                   zorder: Boolean = false,
                   closed: Long => Boolean = _ => true): (Seq[Long], LayoutStats, LayoutStats) = {
    require(budget >= 1, s"byte budget must be >= 1, got $budget")
    recoverStage(root)
    val before = layoutStats(root)
    val dayDirs = Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("day=") &&
        closed(f.getName.stripPrefix("day=").toLong))
    val current: Map[Long, Long] = dayDirs.map { d =>
      d.getName.stripPrefix("day=").toLong -> layoutStats(d.getAbsolutePath).nFiles
    }.toMap
    if (current.isEmpty) return (Nil, before, before)
    // EVERY scan below is partition-pruned to the closed days — under a
    // live writer, open days' in-flight files are never read, by the
    // census, the first-optimize basis, or the replan
    val closedRows = graft.streaming.IngestPipeline.readShards(s, root)
      .filter(col("day").isin(current.keys.toSeq: _*))
    val packKey =
      if (!zorder) defaultPackKey
      else zPackKey {
        if (Zorder.manifestExists(root)) Zorder.loadManifest(root)
        else {
          // first optimize of this layout: freeze the basis NOW and
          // persist the sidecar. The basis comes from the closed-day
          // snapshot only (the deterministic population this pass may
          // see); later values outside it bin beyond the grid edge —
          // the pack order stays total and deterministic, only pruning
          // sharpness degrades, which is what a basis refresh at the
          // next full rewrite is for.
          val m = zBasisOf(closedRows)
          Zorder.writeManifest(root, m)
          m
        }
      }
    // days-sized collect (the GlobalOrder-offsets budget)
    val censusRows = plannedCountsByDay(closedRows, budget, packKey)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // days holding a row larger than the budget: the closed-form count
    // reads high there (skipped file_idx values), which would suppress
    // the breach FOREVER (round-14 ADVICE #2) — price exactly those
    // days with the exact plan, restricted to them (partition-pruned),
    // so the normal no-breach pass still never replans the table
    val overDays = censusRows.collect { case (d, _, true) => d }
    val exactCount: Map[Long, Long] =
      if (overDays.isEmpty) Map.empty
      else planLayout(closedRows.filter(col("day").isin(overDays: _*)), budget, packKey)
        .groupBy(col("day")).agg(countDistinct(col("file_idx")).as("nf"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plannedCount: Map[Long, Long] =
      censusRows.map { case (d, nf, over) =>
        d -> (if (over) exactCount.getOrElse(d, nf) else nf)
      }.toMap
    val breached = current.collect {
      case (d, n) if n > plannedCount.getOrElse(d, 0L) => d
    }.toSeq.sorted
    if (breached.nonEmpty) {
      // the ONLY planning pass: breached days' rows, nothing else
      val planned = planLayout(
        graft.streaming.IngestPipeline.readShards(s, root)
          .filter(col("day").isin(breached: _*)), budget, packKey)
      // stage-then-swap: the rewrite reads the OLD files, so they must
      // survive until the staged write commits — write the breached
      // days under an underscore dir (parquet readers ignore it), then
      // swap each day dir on the driver.
      val stage = new java.io.File(root, "_optimize_stage")
      writeLayout(planned, stage.getAbsolutePath, packKey)
      breached.foreach { d =>
        val dst = new java.io.File(root, s"day=$d")
        val staged = new java.io.File(stage, s"day=$d")
        // fail LOUDLY before touching the live dir if the rewrite
        // produced nothing for a breached day (a day dir whose files
        // hold zero readable rows censuses as breached but plans no
        // output) — proceeding would rename the only copy aside and
        // crash, and recovery drops .old entries
        require(staged.exists(),
          s"staged rewrite missing for day=$d (zero readable rows in a " +
            s"breached day?) — refusing to swap")
        // rename-aside swap: never delete a copy before its replacement
        // is in place — a crash mid-deleteDirectory must not leave a
        // partially-deleted dir as the day's only copy (the aside copy
        // lives INSIDE the stage so recovery reclaims it)
        val aside = new java.io.File(stage, s"day=$d.old")
        if (dst.exists()) java.nio.file.Files.move(dst.toPath, aside.toPath)
        java.nio.file.Files.move(staged.toPath, dst.toPath)
        org.apache.commons.io.FileUtils.deleteDirectory(aside)
      }
      org.apache.commons.io.FileUtils.deleteDirectory(stage)
    }
    (breached, before, layoutStats(root))
  }

  /** Basis-drift rate of a layout population against its frozen sidecar
    * basis: the fraction of rows whose (user_id, event_id) falls
    * OUTSIDE the frozen basis box — [[graft.ops.Similarity]]'s corpus
    * migration rate, applied to the layout's geometry instead of the
    * index's codebook. The out-of-basis mass is the honest staleness
    * signal: rows INSIDE the frozen box keep their relative bins, so
    * their pruning never degrades under a frozen basis (any consistent
    * basis prunes them equally); rows BEYOND the edge bin past the
    * grid, where the interleave's bit truncation aliases them across
    * the curve — per-file min/max goes wide exactly in proportion to
    * this mass. (The tempting alternative — "fraction of rows a fresh
    * basis would re-BIN" — is hair-triggered: any basis change re-bins
    * essentially every row because the bin denominator moves, measured
    * 0.997 where this metric reads the true 0.5.)
    *
    * Scale shape: ONE row-local avg over four comparisons — no
    * exchange beyond the scan, no fresh basis needed to decide; the
    * census a nightly decision pass can afford at 100 TB.
    */
  private[graft] def basisDrift(rows: DataFrame, frozen: Zorder.ZManifest): Double = {
    val outside = col("user_id") < frozen.mna || col("user_id") > frozen.mxa ||
      col("event_id") < frozen.mnb || col("event_id") > frozen.mxb
    val r = rows.agg(avg(when(outside, 1.0d).otherwise(0.0d))).head
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  /** The drift-triggered LAYOUT maintenance decision — the index
    * lifecycle's s35/s36 rule applied to the clustered table, closing
    * the arc from the other side: [[basisDrift]] measures how far the
    * population has outgrown the frozen sidecar basis; a breach
    * (rate > threshold) runs the FULL clustered rewrite
    * ([[compact]]`(zorder = true)` into `reclusterRoot` — fresh basis,
    * every day re-packed, sidecar replaced); no breach runs the
    * incremental pass ([[compactWhere]]`(zorder = true)` in place —
    * frozen basis, breached days only). Returns (branch taken, measured
    * rate, root holding the maintained layout).
    *
    * Scale shape: the decision itself is one row-local avg — no
    * rewrite happens to decide; the incremental branch costs work ∝
    * breached days, the recluster branch one full rewrite — the price
    * the drift just justified.
    *
    * `closed` is the same WATERMARK contract [[compactWhere]] carries,
    * threaded through the WHOLE pass — under a live writer the nightly
    * decision must never read, census, or rewrite a day the stream is
    * still appending to: the drift census reads closed days only, the
    * append branch hands the watermark to compactWhere, and the
    * recluster branch rewrites the closed history only (open days stay
    * in the live root, and the refreshed basis covers exactly the
    * rewritten population). `None` (the default) is the no-writer fast
    * path: no day listing, no filter in the plan.
    *
    * `allowAppendInPlace = false` is for callers maintaining a SHARED
    * read-only root (the append branch mutates `root` in place; the
    * recluster branch writes its own): if the decision lands on append,
    * the pass fails loudly BEFORE touching anything instead of
    * compacting shared state.
    */
  def maintainLayout(s: SparkSession, root: String, budget: Long,
      threshold: Double, reclusterRoot: String,
      closed: Option[Long => Boolean] = None,
      allowAppendInPlace: Boolean = true): (String, Double, String) = {
    require(Zorder.manifestExists(root),
      s"maintainLayout needs a clustered layout (no basis sidecar under $root)")
    val frozen = Zorder.loadManifest(root)
    val closedDays: Option[Seq[Long]] = closed.map { f =>
      Option(new java.io.File(root).listFiles())
        .getOrElse(Array.empty[java.io.File])
        .filter(d => d.isDirectory && d.getName.startsWith("day="))
        .map(_.getName.stripPrefix("day=").toLong).filter(f).toSeq
    }
    val all = graft.streaming.IngestPipeline.readShards(s, root)
    val censusRows = closedDays
      .map(ds => all.filter(col("day").isin(ds: _*))).getOrElse(all)
    val rate = basisDrift(censusRows, frozen)
    if (rate > threshold) {
      compact(s, root, reclusterRoot, budget, zorder = true, dayFilter = closedDays)
      ("recluster", rate, reclusterRoot)
    } else {
      require(allowAppendInPlace,
        s"decision landed on the append branch (rate=$rate <= threshold=" +
          s"$threshold), which mutates $root in place — forbidden by the caller")
      compactWhere(s, root, budget, zorder = true,
        closed = closed.getOrElse((_: Long) => true))
      ("append", rate, root)
    }
  }

  /** The manifest recomputed FROM a compacted layout: per physical
    * (day, file_idx) partition — rows, logical bytes, event-id min/max
    * (the pruning stats a reader would use).
    */
  def manifestOf(s: SparkSession, root: String): DataFrame =
    s.read.parquet(root)
      .groupBy(col("day").cast("long").as("day"),
        col("file_idx").cast("long").as("file_idx"))
      .agg(count(lit(1)).as("n_rows"),
        sum(rowBytes).as("sum_bytes"),
        min(col("event_id")).as("min_event"),
        max(col("event_id")).as("max_event"))

  /** [[manifestOf]] for a CLUSTERED layout: per physical (day,
    * file_idx), both clustered columns' min/max alongside the packing
    * stats — the two-predicate data-skipping surface a z-ordered
    * rewrite exists to narrow (and what the parquet footers carry).
    */
  def manifestClustered(s: SparkSession, root: String): DataFrame =
    s.read.parquet(root)
      .groupBy(col("day").cast("long").as("day"),
        col("file_idx").cast("long").as("file_idx"))
      .agg(count(lit(1)).as("n_rows"),
        sum(rowBytes).as("sum_bytes"),
        min(col("user_id")).as("min_user"),
        max(col("user_id")).as("max_user"),
        min(col("event_id")).as("min_event"),
        max(col("event_id")).as("max_event"))
}
