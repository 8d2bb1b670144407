package graft.core

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The reference engine's generic MapReduce contract, re-expressed on
  * Datasets.
  *
  * Reference semantics (see SURVEY.md §1.2; `/root/reference/src/mapreduce.go`):
  *   - user Map: whole input chunk -> list of (key, value) string pairs
  *     (`mapreduce.go:173-212`)
  *   - shuffle: hash(key) % nReduce, all values for one key reach exactly one
  *     reduce call (`mapreduce.go:167-171,235-240`)
  *   - user Reduce: (key, all values) -> one value (`mapreduce.go:248-258`)
  *   - observable output: total lexicographic order by key, `key: value`
  *     text lines (`mapreduce.go:312-328`)
  *
  * Spark-first mapping: `flatMap` -> `groupByKey` -> `mapGroups` -> `orderBy`.
  * The shuffle, barrier scheduling, retry and worker lifecycle of the
  * reference (master.go/worker.go) are inherited from Spark and not ported.
  *
  * Scale note (100 TB): the general contract (`run`) delivers the FULL value
  * list to one reduce call, so it cannot do map-side partial aggregation —
  * exactly like the reference, which ships every (k,v) record across the
  * shuffle (`mapreduce.go:194-211`). For algebraic reducers use
  * [[runReduced]] (reduceGroups => partial aggregation before shuffle) or
  * [[runAggregated]] (an [[Aggregator]], fully codegen-friendly partial/final
  * agg). A 100 TB word count must take one of those paths; `run` exists for
  * contract parity with non-algebraic user reducers.
  */
object MapReduceJob {

  /** General (non-algebraic) contract: reduce sees all values of a key.
    *
    * One shuffle: groupByKey hash-partitions on the key exactly like the
    * reference's FNV%nReduce bucketing (an explicit repartition(nReduce)
    * first would shuffle the data a second time for nothing). `nReduce`
    * is accepted for contract parity; the actual reduce parallelism is
    * governed by spark.sql.shuffle.partitions/AQE, which is the point of
    * building on Spark — results are partition-count invariant either way
    * (PropertySpec).
    */
  def run(
      input: Dataset[String],
      map: String => IterableOnce[(String, String)],
      reduce: (String, Iterator[String]) => String,
      nReduce: Int = 0): Dataset[(String, String)] = {
    val spark = input.sparkSession
    import spark.implicits._
    input
      .flatMap(map)
      .groupByKey(_._1)
      .mapGroups((k, vs) => (k, reduce(k, vs.map(_._2))))
  }

  /** Algebraic contract: value-merge function is associative+commutative, so
    * Spark applies it map-side first (partial aggregation — the combiner the
    * reference lacks). Correct path at scale.
    */
  def runReduced(
      input: Dataset[String],
      map: String => IterableOnce[(String, String)],
      merge: (String, String) => String): Dataset[(String, String)] = {
    val spark = input.sparkSession
    import spark.implicits._
    input
      .flatMap(map)
      .groupByKey(_._1)
      .reduceGroups((a: (String, String), b: (String, String)) => (a._1, merge(a._2, b._2)))
      .map(_._2)
  }

  /** Typed-Aggregator contract: zero/reduce/merge/finish, planned as a real
    * partial+final aggregate (HashAggregateExec) — the most Spark-native and
    * codegen-friendly form of the reference's Reduce.
    */
  def runAggregated[B: org.apache.spark.sql.Encoder, O: org.apache.spark.sql.Encoder](
      input: Dataset[String],
      map: String => IterableOnce[(String, String)],
      agg: Aggregator[String, B, O]): Dataset[(String, O)] = {
    val spark = input.sparkSession
    import spark.implicits._
    input
      .flatMap(map)
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn)
  }

  /** The reference's intermediate output contract (`mrtmp.<f>-res-<r>`):
    * nReduce hash-partitioned files, each sorted by key within the
    * partition (`mapreduce.go:243-247`). Spark form: repartition on the
    * key + sortWithinPartitions — no global shuffle-sort, which is why the
    * reference needs its single-threaded global Merge afterwards and
    * [[writeSortedText]] doesn't.
    */
  def writePartitionedSorted(result: Dataset[(String, String)], path: String, nReduce: Int): Unit =
    result
      .repartition(nReduce, col("_1"))
      .sortWithinPartitions(col("_1"))
      .select(concat(col("_1"), lit(": "), col("_2")).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)

  /** The reference's observable output contract: `key: value` lines, total
    * lexicographic order by key (`mapreduce.go:312-328`). Global order comes
    * from Spark's range-partitioned sort; a single text file (like the
    * reference's one merged output) needs coalesce(1) — at warehouse scale
    * drop the coalesce and keep one sorted file per range partition.
    */
  def writeSortedText(result: Dataset[(String, String)], path: String, singleFile: Boolean = true): Unit = {
    val sorted = result
      .orderBy(col("_1"))
      .select(concat(col("_1"), lit(": "), col("_2")).as("value"))
    (if (singleFile) sorted.coalesce(1) else sorted)
      .write.mode(SaveMode.Overwrite).text(path)
  }

  /** Word count — the reference's single shipped query
    * (`test_test.go:56-79`): whitespace-tokenize, count per token.
    * Expressed declaratively so Catalyst plans a partial+final hash
    * aggregate (strict improvement over the reference's combiner-less
    * shuffle of every `(word,"1")` pair).
    */
  def wordCount(lines: Dataset[String]): Dataset[(String, Long)] = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.toDF("line")
      .select(explode(split(col("line"), "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
  }
}
