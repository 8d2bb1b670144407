package graft.tools

import graft.core.MapReduceJob
import org.apache.spark.{SparkContext, TaskContext}
import org.apache.spark.sql.SparkSession

/** Fault-tolerance demo mirroring the reference's TestOneFailure
  * (`/root/reference/src/test_test.go:172-186`): there, a worker dies
  * after N RPCs and the master re-issues its tasks to surviving workers
  * (`master.go:39-72`). In Spark the same contract is task re-execution:
  * `local[4,3]` allows 3 attempts per task, the flaky map fails each
  * task's first attempt, the retry succeeds, and the job's result is
  * identical to a clean run.
  *
  * A main (not a ScalaTest suite) because it needs its own SparkContext
  * with a retrying master URL — the shared test session is local[4]
  * (maxFailures=1).
  */
object FaultDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.builder("local[4,3]", "4") // 3 task attempts
      // also exercises the builder-time extension injection path (the
      // ScalaTest suites share one session, so they can only test the
      // runtime GraftFunctions.register path)
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val lines = (0 until 5000).map(_.toString).toDS().repartition(8)

    val flaky = MapReduceJob.run(
      lines,
      line => {
        val tc = TaskContext.get()
        if (tc != null && tc.attemptNumber() == 0 && tc.partitionId() == 3)
          throw new RuntimeException("injected failure (first attempt, partition 3)")
        line.split("\\s+").iterator.filter(_.nonEmpty).map(w => (w, "1"))
      },
      (_, vs) => vs.map(_.toInt).sum.toString,
      nReduce = 4
    ).collect().toMap

    require(flaky.size == 5000, s"expected 5000 keys, got ${flaky.size}")
    require(flaky.values.forall(_ == "1"), "every unique token must count 1")
    println(s"[fault-demo] OK: job survived injected task failure; ${flaky.size} keys correct")

    val d = spark.sql("SELECT vec_dot(array(1.0d,2.0d), array(3.0d,4.0d)) AS d")
      .collect()(0).getDouble(0)
    require(d == 11.0, s"vec_dot via extensions returned $d")
    println("[fault-demo] OK: graft.GraftExtensions injected vec_dot into SQL")
    spark.stop()
  }
}
