package graft.tools

import graft.core.Sessions

/** Profiler for the StreamingGate entries: times each es* gate query
  * (cold then warm) at a given SF dir so state-store / micro-batch
  * overhead changes can be measured without a full bench sweep.
  *
  * Usage: runMain graft.tools.StreamGateProf [sfDir] [namePrefix]
  */
object StreamGateProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val prefix = if (args.length > 1) args(1) else "es"
    val spark = Sessions.local("32")
    for (q <- graft.streaming.StreamingGate.defs if q.name.startsWith(prefix)) {
      def once(): Double = {
        val t0 = System.nanoTime()
        q.fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once(); val warm = once()
      println(f"[sgprof] ${q.name}%-24s cold ${cold}%6.2fs warm ${warm}%6.2fs")
    }
    spark.stop()
  }
}
