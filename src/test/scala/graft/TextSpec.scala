package graft

import graft.ops.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** Scrub-kernel (t08) behavior that the corpus oracle can't exercise:
  * the production PII patterns on injected rows (the synthetic corpus
  * has no digits, so email/phone match nothing there by construction).
  */
class TextSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("PII scrub: emails and phone numbers redact with exact hit counts") {
    val rows = Seq(
      (1L, "contact bob.smith+x@example.co.uk or sue@a.io today"),
      (2L, "call 415-555-1234 or 415.555.9999 not 12-34"),
      (3L, "no pii here at all"),
      (4L, "a@b.cd next to text")).toDF("id", "text")

    val emails = TextAnalysis.scrub(rows, "text", TextAnalysis.EmailPat, "<email>")
      .select("id", "scrubbed", "n_hits").collect().map(r => r.getLong(0) -> r).toMap
    assert(emails(1L).getString(1) === "contact <email> or <email> today")
    assert(emails(1L).getLong(2) === 2L)
    assert(emails(3L).getLong(2) === 0L)
    assert(emails(4L).getString(1) === "<email> next to text")

    val phones = TextAnalysis.scrub(rows, "text", TextAnalysis.PhonePat, "<phone>")
      .select("id", "scrubbed", "n_hits").collect().map(r => r.getLong(0) -> r).toMap
    assert(phones(2L).getString(1) === "call <phone> or <phone> not 12-34")
    assert(phones(2L).getLong(2) === 2L)
    assert(phones(1L).getLong(2) === 0L)
  }
}
