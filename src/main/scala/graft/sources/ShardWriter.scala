package graft.sources

import org.apache.spark.sql.{Column, DataFrame}

/** Training-shard output layout — the sink side of the prep pipeline
  * (p06): a directory per split, `shards` range-sharded files per split,
  * rows inside each shard contiguous in the given order (e.g. the p04
  * deterministic shuffle position).
  *
  * Scale notes: `repartitionByRange(shards, order)` gives every shard an
  * ordered SLICE of the keyspace (sampled range bounds — the same
  * mechanism as any global sort), `sortWithinPartitions` orders rows
  * inside each shard without any global-sort exchange, and
  * `maxRecordsPerFile` caps file size so one skewed shard cannot produce
  * a multi-GB file. Writing `partitionBy(partCol)` from range-sharded
  * tasks means each task appends to only the split dirs its slice
  * contains — no per-row driver involvement anywhere.
  */
object ShardWriter {
  def writeSharded(
      df: DataFrame,
      path: String,
      partCol: String,
      order: Seq[Column],
      shards: Int,
      maxRecordsPerFile: Long = 1000000L): Unit =
    df.repartitionByRange(shards, order: _*)
      // the partition column LEADS the task-side sort: the file writer
      // requires rows grouped by partition dir and would otherwise
      // re-sort by partCol alone (not stably), destroying the in-shard
      // order; with (partCol, order…) already sorted it skips its sort
      // and each file stays ordered
      .sortWithinPartitions((org.apache.spark.sql.functions.col(partCol) +: order): _*)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partCol)
      .mode("overwrite")
      .parquet(path)

  /** Range-clustered write without split dirs: `shards` ordered slices
    * of the `order` keyspace, rows sorted inside each file, so parquet
    * per-file min/max footers on the order columns (and anything
    * correlated with them — the z-order case) prune read-back scans.
    * Same scale mechanics as [[writeSharded]]: sampled range bounds,
    * no global-sort exchange, `maxRecordsPerFile` bounding skew.
    */
  def writeClustered(
      df: DataFrame,
      path: String,
      order: Seq[Column],
      shards: Int,
      maxRecordsPerFile: Long = 1000000L): Unit =
    df.repartitionByRange(shards, order: _*)
      .sortWithinPartitions(order: _*)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
}
