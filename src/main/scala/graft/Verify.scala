package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Failure loudness (the round-8 lesson): a query that throws used to
  * leave NO artifact at all, so the driver's gate file simply omitted it
  * and read as 100% green. Now every run writes `_ERRORS.json` — `{}`
  * when clean, `{name: "exception"}` per failed query otherwise — so the
  * dump directory always answers "which registry keys are missing and
  * why", and VerifyGateSpec asserts dumps ∪ errors == the registry.
  */
object Verify {
  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def jsonObj(pairs: Iterable[(String, String)]): String =
    pairs.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")

  /** Run each (name, query) against sfDir, dump `outDir/<name>` parquet,
    * and write `outDir/_ERRORS.json` (always — `{}` when clean). Returns
    * name → error message for every query that failed. Extracted from
    * main so the gate tripwire is testable with an injected registry.
    */
  def run(sfDir: String, outDir: String,
          queries: Seq[(String, (SparkSession, String) => DataFrame)],
          cpus: String): Map[String, String] = {
    var spark = graft.core.Sessions.local(cpus)
    new java.io.File(outDir).mkdirs()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // deterministic order; a query that kills the context (e.g. broadcast
    // OOM) must not zero every query after it — recreate the session.
    queries.foreach { case (name, fn) =>
      if (spark.sparkContext.isStopped)
        spark = graft.core.Sessions.local(cpus)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        errors(name) = s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(500)}"
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      if (!spark.sparkContext.isStopped)
        graft.core.Sessions.sweepPersistedState(spark)
    }
    Files.writeString(Paths.get(s"$outDir/_ERRORS.json"), jsonObj(errors))
    errors.toMap
  }

  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [queryName...] — names (for fast local
    // iteration on one query) are optional; the driver passes none.
    val (sfDir, outDir, only) = (args(0), args(1), args.drop(2).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.isEmpty || only(q._1))
    val errors = run(sfDir, outDir, selected, cpus)
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      jsonObj(SparkEntry.oracleSql))
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED: ${errors.keys.mkString(", ")}")
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
  }
}
