package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet star schema (TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * plan runs at sf0.001 (smoke), sf0.01 (oracle), sf0.1 (bench) — and, by
  * design, on a 100 TB warehouse: the reads are plain parquet scans, so
  * Catalyst pushes filters/column pruning into the scan and partition
  * pruning applies unchanged on a partitioned production layout.
  */
object Tables {
  /** Driver testdata has flipped physical types between rounds (events.ts,
    * round 8 — NANOS → µs NTZ). Integral width is the other exposed
    * class: every query, encoder, and test in the library treats
    * ids/keys/counts as BIGINT, so a regeneration that narrows a column
    * to int32 would fail `as[T]`-free code paths only at `getLong` /
    * arithmetic time. Widening Byte/Short/Int to Long at the ONE read
    * seam removes the class; it is a no-op on the current (all-long)
    * data, DuckDB promotes narrow ints in arithmetic, and the gate's
    * compare normalizes integer widths — so the oracles cannot tell.
    */
  private def widenIntegralCols(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, ShortType}
    val narrow = df.schema.fields.collect {
      case f if f.dataType == ByteType || f.dataType == ShortType ||
        f.dataType == IntegerType => f.name
    }
    if (narrow.isEmpty) df
    else df.select(df.columns.map(c =>
      if (narrow.contains(c)) col(c).cast(LongType).as(c) else col(c)): _*)
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    widenIntegralCols(spark.read.parquet(s"$dir/$name.parquet"))

  /** Scale-adaptive parallelism floor for kernel-heavy consumers —
    * guide §2.5's "input skew: one huge unsplittable file … otherwise
    * repartition immediately after the read". The driver's testdata
    * writes each table as ONE parquet file with ONE row group, so a
    * scan stage has one EFFECTIVE task no matter how many splits the
    * bench's 2 MB split config produces (a parquet row group is read
    * whole by the split holding its midpoint) — and every expensive
    * row-local kernel downstream of the scan (tokenize + explode, md5
    * gram folds, simhash votes, levenshtein, decimal partial
    * aggregation) inherits that single thread while the other 31 cores
    * idle. Measured (tools/SpreadProf, sf0.1): the d25-shaped 5-gram
    * md5 kernel 1.5 s → 0.65 s, a q01-shaped decimal aggregate
    * 2.0 s → 1.3 s, with per-task stage metrics showing 1283/260/163 ms
    * across the 3 "parallel" scan tasks before the fix.
    *
    * The condition makes it scale-adaptive rather than a local[32]
    * constant: a scan that already plans at least `defaultParallelism`
    * splits (ANY healthy 100 TB layout — production files carry one row
    * group per ~128 MB) passes through untouched, so no payload shuffle
    * is ever added at scale; only a row-group-starved scan pays one
    * round-robin exchange of the (already column-pruned) kernel input.
    * Streaming frames pass through unconditionally: micro-batch sources
    * size their own partitions and `.rdd` is undefined mid-plan on them.
    */
  def spread(df: DataFrame): DataFrame =
    if (df.isStreaming) df
    else {
      val s = df.sparkSession
      val target = s.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < target) df.repartition(target)
      else {
        // Many splits can still mean few EFFECTIVE tasks: a row group is
        // read whole by the split holding its midpoint, so a scan over a
        // few single-row-group files plans `target`+ splits of which all
        // but a handful are empty (lineitem at sf0.1: 32 splits, 1 row
        // group, one working task). Footers are consulted ONLY when the
        // file count is below `target` — a production layout with ≥ cores
        // files never pays any footer I/O — and cached per (path, len,
        // mtime) for the life of the process.
        val files = try df.inputFiles catch { case _: Throwable => Array.empty[String] }
        if (files.nonEmpty && files.length < target &&
            totalRowGroups(s, files) < target) df.repartition(target)
        else df
      }
    }

  /** Sum of parquet row-group counts across `files` (capped, saturating).
    * Non-parquet or unreadable files count as infinitely splittable so a
    * mixed source never triggers a spurious repartition.
    */
  private val rowGroupCache = new java.util.concurrent.ConcurrentHashMap[String, Int]()
  private def totalRowGroups(s: SparkSession, files: Array[String]): Int = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = s.sessionState.newHadoopConf()
    files.foldLeft(0) { (acc, f) =>
      val n = try {
        val p = new Path(f)
        val st = p.getFileSystem(conf).getFileStatus(p)
        val key = s"$f:${st.getLen}:${st.getModificationTime}"
        rowGroupCache.computeIfAbsent(key, _ => {
          val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
          try r.getFooter.getBlocks.size() finally r.close()
        })
      } catch { case _: Throwable => Int.MaxValue }
      if (acc.toLong + n > Int.MaxValue) Int.MaxValue else acc + n
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** The events table has been generated with THREE physical ts
    * encodings across driver rounds: parquet TIMESTAMP(NANOS) (reads as a
    * raw ns long under spark.sql.legacy.parquet.nanosAsLong — set in
    * every session builder here), µs TIMESTAMP (isAdjustedToUTC, reads
    * as TimestampType), and µs TIMESTAMP_NTZ (no UTC flag — the current
    * testdata; reads as TimestampNTZType). A real 100 TB warehouse reads
    * parquet written by many producers, so the loader normalizes ALL of
    * them to one logical type at ONE seam instead of assuming a single
    * physical encoding (the round-8 regression: ts flipped NANOS→NTZ
    * between gate runs and every unix_micros(ts) failed analysis).
    *
    * Target type: TimestampType at microsecond precision — the same
    * truncation DuckDB's epoch_us applies. The session time zone is
    * pinned UTC (Sessions.scala), so the NTZ→TZ cast reinterprets the
    * naive wall-clock as UTC: values are bit-identical to what the
    * adjusted-to-UTC encoding of the same instants reads as.
    *
    * `longUnit` applies only when ts arrives as a raw long and names the
    * epoch unit of those longs ("ns" | "us" | "ms" | "s"). Callers that
    * read from parquet derive it from the file footer via
    * [[eventTsLongUnit]]; the default "ns" matches the one long-typed
    * encoding the driver has ever produced (TIMESTAMP(NANOS)) and the
    * plain-int64 replay files the streaming tests write.
    */
  def normalizeEventTs(df: DataFrame, longUnit: String = "ns"): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        val us = longUnit match {
          case "ns" => expr("ts DIV 1000")
          case "us" => col("ts")
          case "ms" => expr("ts * 1000")
          case "s"  => expr("ts * 1000000")
          case u    => throw new IllegalArgumentException(s"unknown ts unit: $u")
        }
        df.withColumn("ts", timestamp_micros(us))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df // TimestampType: already the target
    }

  /** Epoch unit of a long-typed ts column, derived from the parquet
    * footer of the first matching file rather than assumed: a
    * TIMESTAMP-annotated INT64 names its unit explicitly; a plain
    * (unannotated) INT64 falls back to "ns" — the convention of the
    * nanos-era testdata and of the replay harness's sentinel rows.
    * `path` may be a single parquet file or a directory; `glob` selects
    * the table's files within a directory.
    */
  def eventTsLongUnit(s: SparkSession, path: String, glob: String = "*.parquet"): String = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    val conf = s.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isDirectory)
        fs.globStatus(new Path(p, glob)).headOption
          .getOrElse(throw new java.io.FileNotFoundException(s"$path/$glob"))
          .getPath
      else p
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      if (!schema.containsField("ts")) "ns"
      else schema.getType(schema.getFieldIndex("ts")).getLogicalTypeAnnotation match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          t.getUnit match {
            case TimeUnit.NANOS  => "ns"
            case TimeUnit.MICROS => "us"
            case TimeUnit.MILLIS => "ms"
          }
        case _ => "ns"
      }
    } finally reader.close()
  }

  def events(s: SparkSession, d: String): DataFrame = {
    // defensive: callers may hand us a session built without the flag
    // (it is a runtime SQL conf; if a future Spark makes it static this
    // no-ops and our own mains still set it at build time)
    try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    val df = table(s, d, "events")
    val unit =
      if (df.schema("ts").dataType == LongType)
        eventTsLongUnit(s, s"$d/events.parquet")
      else "ns"
    normalizeEventTs(df, unit)
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Cheap change fingerprint of a table file (or directory of part
    * files): total length + latest modification time. Used to key
    * build-once materializations (Graph.materializedOnce) so a caller
    * that REWRITES an input under the same path within one process gets
    * a fresh build instead of stale cached results.
    */
  def fileFingerprint(s: SparkSession, path: String): String = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    val st = fs.getFileStatus(p)
    if (!st.isDirectory) s"${st.getLen}-${st.getModificationTime}"
    else {
      val kids = fs.listStatus(p)
      s"${kids.map(_.getLen).sum}-${if (kids.isEmpty) 0L else kids.map(_.getModificationTime).max}"
    }
  }
}
