package graft.tools

import graft.core.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main for operator substages (not part of the driver
  * contract). Usage: runMain graft.tools.Profile <sfDir>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.core.Sessions.local("32")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    spark.range(1000000).selectExpr("sum(id)").collect()

    val sh = graft.ops.Dedup.shingleArr(col("text"))
    time("shingleArr explode count") {
      Tables.documents(spark, dir).select(col("doc_id"), explode(sh).as("shingle")).count()
    }
    val shdf = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(sh).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("shkey"))
    time("hashed shingles count") { shdf.count() }
    val p = shdf.persist()
    time("persist materialize") { p.count() }
    time("self join count") {
      p.as("a").join(p.as("b"), col("a.shkey") === col("b.shkey") && col("a.doc_id") < col("b.doc_id")).count()
    }
    time("full d03") {
      graft.SparkEntry.queries("d03_ngram_jaccard")(spark, dir).write.format("noop").mode("overwrite").save()
    }
    time("full d04") {
      graft.SparkEntry.queries("d04_minhash_lsh")(spark, dir).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
