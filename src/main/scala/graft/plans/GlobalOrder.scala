package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global-order operators.
  *
  * Spark's `Window.orderBy` with no `partitionBy` moves EVERY row through
  * one task (WindowExec warns about exactly this) — correct at test scale,
  * a single-machine bottleneck at 100 TB. The reference has the same
  * problem in miniature: its global sort is a single-threaded merge on the
  * master (`/root/reference/src/mapreduce.go:291-329`).
  *
  * The scalable plan is the classic two-pass one (what RDD.zipWithIndex
  * does internally): range-partition by the sort key so partitions hold
  * contiguous key ranges, compute a per-partition `row_number` (parallel,
  * partitioned WindowExec), and add each partition's start offset. The
  * offsets come from a per-partition count — P rows of metadata collected
  * to the driver, the same sample-sized driver traffic RangePartitioner
  * itself incurs — never row data.
  */
object GlobalOrder {

  private val Pid = "__graft_pid"

  /** The two-pass helpers collect ONE (pid, count|sum) row per partition
    * to the driver — O(partitions) driver memory, not O(rows). That is
    * ~12 bytes/partition: even a petabyte-scale job at one million
    * partitions collects ~12 MB, the same order as what
    * RangePartitioner's own bound sampling already moves. The ceiling
    * below turns the one way this goes wrong — a caller exploding
    * `spark.sql.shuffle.partitions` to tens of millions — into a loud
    * error instead of silent driver-heap pressure.
    */
  private[graft] val MaxDriverPartitions = 1 << 21

  private def checkDriverBound(nParts: Int, who: String): Unit =
    require(nParts <= MaxDriverPartitions,
      s"$who collected $nParts per-partition metadata rows to the driver " +
        s"(ceiling $MaxDriverPartitions); lower spark.sql.shuffle.partitions " +
        "or pre-coalesce the input - the two-pass order is O(partitions) " +
        "on the driver by design (see Scaladoc)")

  /** df + a global 1-based `rnCol` in `order` without any single-partition
    * exchange or window. Also returns the total row count (free — it is
    * the sum of the partition counts).
    *
    * The input is range-partitioned then persisted so the count job and
    * the main job see the identical partitioning; range bounds are
    * deterministic for a deterministic input anyway (fixed sampling seed),
    * so a cache eviction cannot change the result.
    */
  def withGlobalRowNumber(df: DataFrame, order: Seq[Column], rnCol: String): (DataFrame, Long) = {
    val ranged = df.repartitionByRange(order: _*)
      .withColumn(Pid, spark_partition_id())
      .persist()
    // guard BEFORE the collect: the partition count is known from the
    // plan, and tripping after materialization would document a ceiling
    // the driver heap already paid for (round-12 advice)
    checkDriverBound(ranged.rdd.getNumPartitions, "withGlobalRowNumber")
    val counts = ranged.groupBy(col(Pid)).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val total = counts.map(_._2).sum
    val offsets: Map[Int, Long] =
      counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _)).toMap
    val w = Window.partitionBy(col(Pid)).orderBy(order: _*)
    val out = ranged
      .withColumn(rnCol,
        row_number().over(w).cast("long") +
          coalesce(element_at(typedLit(offsets), col(Pid)), lit(0L)))
      .drop(Pid)
    (out, total)
  }

  /** df + a global running sum of `value` (cast to long) in `order`,
    * with no single-partition exchange or window — the same two-pass
    * shape as [[withGlobalRowNumber]]: range-partition on the order key,
    * per-partition PARTIAL sums to the driver (P rows of metadata), then
    * a partitioned running-sum window plus the partition's start offset.
    * The running sum is inclusive of the current row.
    */
  def withGlobalRunningSum(df: DataFrame, order: Seq[Column], value: Column,
                           sumCol: String): DataFrame =
    withGlobalRunningSumAndTotal(df, order, value, sumCol)._1

  /** [[withGlobalRunningSum]] plus the GRAND TOTAL of `value` — free on
    * the driver (it is the sum of the per-partition partials this pass
    * already collects), so callers sizing downstream work from the total
    * (e.g. a byte-budget writer choosing its output task count) get it
    * without a second pass over the data.
    */
  def withGlobalRunningSumAndTotal(df: DataFrame, order: Seq[Column], value: Column,
                                   sumCol: String): (DataFrame, Long) = {
    val v = "__graft_val"
    val ranged = df.withColumn(v, value.cast("long"))
      .repartitionByRange(order: _*)
      .withColumn(Pid, spark_partition_id())
      .persist()
    // same pre-collect guard as withGlobalRowNumber: trip on the plan's
    // partition count, before the driver-side materialization
    checkDriverBound(ranged.rdd.getNumPartitions, "withGlobalRunningSum")
    val partials = ranged.groupBy(col(Pid)).agg(sum(col(v)).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets: Map[Int, Long] =
      partials.map(_._1).zip(partials.map(_._2).scanLeft(0L)(_ + _)).toMap
    val w = Window.partitionBy(col(Pid)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = ranged
      .withColumn(sumCol,
        sum(col(v)).over(w) +
          coalesce(element_at(typedLit(offsets), col(Pid)), lit(0L)))
      .drop(Pid, v)
    (out, partials.map(_._2).sum)
  }

  /** ntile(k) over a global order, built from the global row number with
    * SQL-standard tile sizing: the first `n % k` tiles get `ceil(n/k)`
    * rows, the rest `floor(n/k)` — identical to `ntile(k) OVER (ORDER BY
    * ...)` but with no single-partition WindowExec in the plan.
    */
  def withGlobalNtile(df: DataFrame, order: Seq[Column], k: Int, tileCol: String): DataFrame = {
    val rn = "__graft_rn"
    val (numbered, n) = withGlobalRowNumber(df, order, rn)
    val base = n / k
    val rem  = n % k
    val cut  = rem * (base + 1) // rows in the (larger) first `rem` tiles
    // integer `div` (not `/`): double division truncates wrong near exact
    // multiples once counts get large. base == 0 (n < k) keeps every row
    // in the first branch, so the otherwise-branch's divisor is padded to
    // 1 purely to keep the (never-evaluated) expression well-formed.
    val safeBase = math.max(base, 1L)
    numbered
      .withColumn(tileCol,
        when(col(rn) <= cut, expr(s"($rn - 1) div ${base + 1} + 1"))
          .otherwise(expr(s"$rem + ($rn - 1 - $cut) div $safeBase + 1")))
      .drop(rn)
  }
}
