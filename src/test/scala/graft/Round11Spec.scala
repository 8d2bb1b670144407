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
}
