package graft

import graft.core.MapReduceJob
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Seeded-random property tests for the MapReduce contract laws the
  * reference implies (SURVEY.md §5): the result is a pure function of the
  * logical input — invariant to partitioning (nMap/nReduce), and for
  * algebraic reducers identical to declarative groupBy aggregation.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def randomLines(rng: Random, maxLines: Int): Seq[String] = {
    val vocab = Vector.tabulate(rng.nextInt(30) + 3)(i => s"w$i")
    Seq.fill(rng.nextInt(maxLines) + 1)(
      Seq.fill(rng.nextInt(8))(vocab(rng.nextInt(vocab.size))).mkString(" "))
  }

  test("contract result is invariant to nReduce and input partitioning (10 seeded cases)") {
    import spark.implicits._
    for (seed <- 1 to 10) {
      val rng = new Random(seed)
      val lines = randomLines(rng, 200)
      val nReduce = rng.nextInt(7) + 1
      val nPart = rng.nextInt(5) + 1
      def wc(ds: org.apache.spark.sql.Dataset[String], r: Int) = MapReduceJob.run(
        ds, l => l.split(" ").iterator.filter(_.nonEmpty).map(w => (w, "1")),
        (_, vs) => vs.map(_.toInt).sum.toString, r).collect().toSet
      val base = wc(lines.toDS(), 1)
      assert(wc(lines.toDS().repartition(nPart), nReduce) === base, s"seed=$seed")
    }
  }

  test("contract sum-reduce equals declarative groupBy count (10 seeded cases)") {
    import spark.implicits._
    for (seed <- 11 to 20) {
      val rng = new Random(seed)
      val lines = randomLines(rng, 200).toDS()
      val contract = MapReduceJob.run(
        lines, l => l.split(" ").iterator.filter(_.nonEmpty).map(w => (w, "1")),
        (_, vs) => vs.map(_.toInt).sum.toString, 4)
        .collect().map { case (k, v) => (k, v.toLong) }.toSet
      val declarative = MapReduceJob.wordCount(lines).collect().toSet
      assert(contract === declarative, s"seed=$seed")
    }
  }

  test("GlobalOrder ntile equals single-window ntile on random sizes/k/partitioning (8 seeded cases)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    for (seed <- 31 to 38) {
      val rng = new Random(seed)
      val n = rng.nextInt(2000) + 1           // includes n < k edge cases
      val k = rng.nextInt(9) + 2
      val nPart = rng.nextInt(6) + 1
      // duplicate measure values force the tiebreak key to do real work
      val df = (0 until n).map(i => (i.toLong, (rng.nextInt(50)).toDouble))
        .toDF("id", "m").repartition(nPart)
      val got = graft.plans.GlobalOrder
        .withGlobalNtile(df, Seq(col("m").desc, col("id")), k, "t")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val want = df.select(col("id"),
          ntile(k).over(Window.orderBy(col("m").desc, col("id"))).cast("long").as("t"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want, s"seed=$seed n=$n k=$k parts=$nPart")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("SortedIdPairs emits exactly the C(n,2) ordered pairs (8 seeded cases)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    for (seed <- 41 to 48) {
      val rng = new Random(seed)
      val n = rng.nextInt(40) // includes 0 and 1 (no pairs)
      val ids = Seq.fill(n)(rng.nextLong().abs).distinct
      val df = Seq(Tuple1(ids)).toDF("ids")
      val got = df.select(
          graft.functions.TextFunctions.sorted_id_pairs(col("ids")).as(Seq("ida", "idb")))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val want = ids.sorted.combinations(2).map { case Seq(a, b) => (a, b) }.toSeq
      assert(got.sorted === want.sorted, s"seed=$seed n=${ids.size}")
      assert(got.forall(p => p._1 < p._2), s"seed=$seed order")
    }
  }

  test("non-commutative-safe: reduce sees every value of its key exactly once (5 seeded cases)") {
    import spark.implicits._
    for (seed <- 21 to 25) {
      val rng = new Random(seed)
      val lines = randomLines(rng, 100)
      // reduce concatenates sorted values: checks multiplicity, not order
      val out = MapReduceJob.run(
        lines.toDS(),
        l => l.split(" ").iterator.filter(_.nonEmpty).map(w => (w, w.length.toString)),
        (_, vs) => vs.toSeq.sorted.mkString(","), 3
      ).collect().toMap
      val expected = lines.flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) =>
          w -> ws.map(_.length.toString).toSeq.sorted.mkString(",") }
      assert(out === expected, s"seed=$seed")
    }
  }
}
