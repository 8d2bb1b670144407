package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 hardening tests: the d23 index-append law replayed over a
  * multi-ingest sequence (VERDICT r10 #4) — the invariant the DuckDB
  * gate certifies for ONE corpus/delta split, here driven through the
  * shape production actually runs: an index maintained across several
  * appends must stay byte-identical to a from-scratch rebuild.
  */
class Round11Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def index(src: DataFrame): DataFrame =
    graft.ops.Dedup.bandedOf(graft.ops.Dedup.shingledDocs(src))

  test("d23 replay: two successive banded-delta appends equal the full index rebuild") {
    val docs = graft.core.Tables.documents(spark, dir)
    // ingest 0 seeds the index; ingests 1 and 2 append their banded
    // delta WITHOUT touching the stored rows — the d22 maintenance shape
    val batches = (0 to 2).map(b => docs.filter(col("doc_id") % 3 === b))
    val appended = batches.map(index).reduce(_ unionByName _)
    val rebuilt = index(docs)
    assert(appended.exceptAll(rebuilt).isEmpty, "appended index has rows a rebuild lacks")
    assert(rebuilt.exceptAll(appended).isEmpty, "rebuild has rows the appended index lacks")
    // and the law is not vacuous: the index is non-trivial at this SF
    assert(rebuilt.count() > 0)
  }

  test("bench regression tripwire: an fp:diff slowdown fails LOUD in both summary lines") {
    // synthetic fixture (VERDICT r10 #5's "done" bar): a committed local
    // reference where one query is ≥2x-and-≥1 s slower AND its plan
    // fingerprint changed — the code-attributable case — must land in
    // the `regressions` field of BOTH the full and compact JSON lines;
    // an equally large fp:same mover (environmental) and an fp:diff
    // SPEEDUP (plan improvement awaiting a ref refresh) must not.
    val dir = java.nio.file.Files.createTempDirectory("benchreg").toFile
    val ref = new java.io.File(dir, "ref.json")
    java.nio.file.Files.writeString(ref.toPath,
      """{"metric":"total","queries":{"qa":1.0,"qb":1.0,"qc":8.0},
        |"plan_fp":{"qa":"aaa","qb":"bbb","qc":"ccc"},"sf":"/data/sf0.1"}""".stripMargin.replace("\n", ""))
    val results = Seq(
      "qa" -> (5.0, 5.0, Seq(5.0), 0.0, "zzz"), // 5x slower, plan CHANGED -> regression
      "qb" -> (4.0, 4.0, Seq(4.0), 0.0, "bbb"), // 4x slower, same plan -> environmental
      "qc" -> (2.0, 2.0, Seq(2.0), 0.0, "yyy")) // 4x FASTER, plan changed -> improvement
    val (deltaJson, regs) = Bench.deltaVsRef(results, "/x/sf0.1", ref.getAbsolutePath)
    assert(regs === Seq("qa"), s"regressions: $regs\n$deltaJson")
    val (full, compact) = Bench.renderSummary(results, "/x/sf0.1", "out.json", deltaJson, regs)
    for (line <- Seq(full, compact))
      assert(line.contains(""""regressions":["qa"]"""), line)
    // and the green path stays green: no regressions -> empty list
    val (fullOk, compactOk) = Bench.renderSummary(results, "/x/sf0.1", "out.json", "[]", Nil)
    for (line <- Seq(fullOk, compactOk))
      assert(line.contains(""""regressions":[]"""), line)
  }
}
