package graft.queries

import graft.core.{MapReduceJob, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's one shipped query — frequency count over whitespace
  * tokens (`/root/reference/src/test_test.go:56-79`) — in two forms:
  *
  *   - `wc01_wordcount`: fully declarative (explode/split/groupBy/count) —
  *     Catalyst plans partial+final hash aggregation, the scan prunes to the
  *     `text` column. This is the 100 TB path.
  *   - `wc02_mapreduce_contract`: through [[graft.core.MapReduceJob.run]],
  *     the reference-parity generic contract (user closures, full value list
  *     per key) — proving the contract and the declarative plan agree.
  */
object WordCount extends QueryModule {

  private def wc01(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  private val wc01Sql =
    """SELECT word, count(*) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |WHERE length(word) > 0
      |GROUP BY word""".stripMargin

  /** Same result through the generic map/reduce contract: the map closure
    * whitespace-tokenizes and emits (word,"1") exactly like the reference's
    * MapFunc; the reduce closure parses-and-sums like ReduceFunc.
    */
  private def wc02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lines = Tables.documents(s, dir).select(col("text")).as[String]
    // single-space tokenization, matching wc01 and the oracle's
    // string_split(text, ' ') exactly (a \s+ split here would silently
    // diverge on any tab/newline in future corpora)
    MapReduceJob.run(
      lines,
      line => line.split(' ').iterator.filter(_.nonEmpty).map(w => (w, "1")),
      (_, values) => values.map(_.toLong).sum.toString)
      .toDF("word", "cnt_str")
  }

  private val wc02Sql =
    """SELECT word, CAST(count(*) AS VARCHAR) AS cnt_str
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |WHERE length(word) > 0
      |GROUP BY word""".stripMargin

  /** The reference's own benchmark workload (TestBasic shape:
    * `test_test.go:14-34` — 100k unique integer lines, nMap=50), run
    * through the generic contract including the global sort. Input is
    * generated (the reference generates its own too), but it is pure
    * `range(100000)` so DuckDB can regenerate it — every key is unique,
    * making the expected output simply each integer with count 1 (the
    * reference's own self-computed-oracle trick, `test_test.go:81-119`).
    * The line-by-line SORTED-file check additionally lives in
    * ReferenceParitySpec (the driver compare is multiset, order-blind).
    */
  private def wc03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lines = s.range(0, 100000).map(_.toString).repartition(50)
    MapReduceJob.run(
      lines,
      line => line.split("\\s+").iterator.filter(_.nonEmpty).map(w => (w, "1")),
      (_, vs) => vs.map(_.toInt).sum.toString)
      .toDF("word", "cnt_str")
      .orderBy(col("word"))
  }

  private val wc03Sql =
    """SELECT CAST(r AS VARCHAR) AS word, '1' AS cnt_str
      |FROM range(0, 100000) t(r)""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("wc01_wordcount", wc01, Some(wc01Sql)),
    QueryDef("wc02_mapreduce_contract", wc02, Some(wc02Sql)),
    QueryDef("wc03_parity_100k", wc03, Some(wc03Sql)),
  )
}
