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
