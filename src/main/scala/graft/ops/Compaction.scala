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

  /** The deterministic packing plan: input rows + `file_idx`, assigned
    * by per-day byte offset in md5 row order against `budget`.
    */
  private[graft] def planLayout(rows: DataFrame, budget: Long): DataFrame = {
    require(budget >= 1, s"byte budget must be >= 1, got $budget")
    planLayoutBy(rows, lit(budget))
  }

  /** [[planLayout]] with a per-row budget expression — p30's mixed
    * starting layout packs even days at the target budget and odd days
    * at litter size, all in one plan. The budget must be constant
    * within a day (the offset rule is per-day).
    */
  private[graft] def planLayoutBy(rows: DataFrame, budget: Column): DataFrame = {
    val keyed = rows.withColumn("__cb", rowBytes).withColumn("__budget", budget)
    val summed = graft.plans.GlobalOrder.withGlobalRunningSum(
      keyed,
      Seq(col("day"), md5(col("event_id").cast("string")), col("event_id")),
      col("__cb"), "__cs")
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
    * md5 pack order so re-writes are byte-stable.
    */
  private[graft] def writeLayout(planned: DataFrame, outRoot: String): Unit =
    planned.drop("__cb")
      .repartition(col("day"), col("file_idx"))
      .sortWithinPartitions(col("day"), col("file_idx"),
        md5(col("event_id").cast("string")), col("event_id"))
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
    */
  def compact(s: SparkSession, inRoot: String, outRoot: String,
              budget: Long): (LayoutStats, LayoutStats) = {
    val before = layoutStats(inRoot)
    writeLayout(planLayout(
      graft.streaming.IngestPipeline.readShards(s, inRoot), budget), outRoot)
    (before, layoutStats(outRoot))
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
    * Scale shape: the physical census is a driver walk of day dirs
    * (days are metadata-sized, the same O(days) budget as the rebase
    * broadcast); the plan is ONE range exchange over the layout's rows;
    * only breached days' rows are shuffled into the clustered rewrite.
    * On an object store the pre-delete + append pair is the
    * delete-then-commit a table format would make transactional; the
    * layout is reconstructible from the plan either way.
    *
    * Returns (breached days ascending, before stats, after stats).
    */
  def compactWhere(s: SparkSession, root: String,
                   budget: Long): (Seq[Long], LayoutStats, LayoutStats) = {
    require(budget >= 1, s"byte budget must be >= 1, got $budget")
    val before = layoutStats(root)
    val dayDirs = Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
    val current: Map[Long, Long] = dayDirs.map { d =>
      d.getName.stripPrefix("day=").toLong -> layoutStats(d.getAbsolutePath).nFiles
    }.toMap
    val planned = planLayout(graft.streaming.IngestPipeline.readShards(s, root), budget)
    // days-sized collect (the GlobalOrder-offsets budget): planned file
    // count per day
    val plannedCount: Map[Long, Long] = planned
      .groupBy(col("day")).agg(countDistinct(col("file_idx")).as("nf"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val breached = current.collect {
      case (d, n) if n > plannedCount.getOrElse(d, 0L) => d
    }.toSeq.sorted
    if (breached.nonEmpty) {
      // stage-then-swap: the rewrite reads the OLD files, so they must
      // survive until the staged write commits — write the breached
      // days under an underscore dir (parquet readers ignore it), then
      // swap each day dir on the driver. The object-store form of the
      // delete-then-commit a table format makes transactional.
      val stage = new java.io.File(root, "_optimize_stage")
      org.apache.commons.io.FileUtils.deleteDirectory(stage)
      planned.filter(col("day").isin(breached: _*)).drop("__cb")
        .repartition(col("day"), col("file_idx"))
        .sortWithinPartitions(col("day"), col("file_idx"),
          md5(col("event_id").cast("string")), col("event_id"))
        .write.mode("overwrite").partitionBy("day", "file_idx")
        .parquet(stage.getAbsolutePath)
      breached.foreach { d =>
        val dst = new java.io.File(root, s"day=$d")
        org.apache.commons.io.FileUtils.deleteDirectory(dst)
        java.nio.file.Files.move(
          new java.io.File(stage, s"day=$d").toPath, dst.toPath)
      }
      org.apache.commons.io.FileUtils.deleteDirectory(stage)
    }
    (breached, before, layoutStats(root))
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
}
