package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavior tests for the LLM-pipeline extension ops at sf0.001/sf0.01.
  * (Value-level correctness vs DuckDB is the driver's gate; these assert
  * the algorithmic properties the oracle can't express.)
  */
class OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("minhash-LSH (d04) recovers exactly the exact-jaccard pair set (d03) — recall 1.0") {
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val exact = SparkEntry.queries("d03_ngram_jaccard")(spark, sf)
        .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val lsh = SparkEntry.queries("d04_minhash_lsh")(spark, sf)
        .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(exact.nonEmpty, sf)
      assert(lsh === exact, sf)
    }
  }

  test("simhash (d05) pairs are a subset of exact near-dup pairs and deterministic") {
    val exact = SparkEntry.queries("d03_ngram_jaccard")(spark, dir)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def run() = SparkEntry.queries("d05_simhash")(spark, dir)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val first = run()
    assert(first.nonEmpty)
    assert(first.subsetOf(exact))
    assert(run() === first)
  }

  test("ANN-LSH (s03) neighbors carry the same sim values as brute force (s01)") {
    val exact = SparkEntry.queries("s01_cosine_knn")(spark, dir)
      .select("qid", "nid", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val approxAll = SparkEntry.queries("s03_ann_lsh")(spark, dir)
      .select("qid", "nid", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(approxAll.nonEmpty)
    // every candidate's re-scored sim must be bit-identical to the exact path
    val rescored = approxAll.filter { case (k, _) => exact.contains(k) }
    assert(rescored.nonEmpty)
    rescored.foreach { case (k, sim) => assert(sim === exact(k)) }
  }

  test("exact dedup (d01) keeps every distinct document once") {
    val df = SparkEntry.queries("d01_dedup_exact")(spark, dir)
    val total = df.count()
    val docs = graft.core.Tables.documents(spark, dir).count()
    assert(df.selectExpr("sum(n_copies)").collect()(0).getLong(0) === docs)
    assert(total <= docs)
  }

  test("multimodal features (m01) md5 matches a local digest") {
    import org.apache.spark.sql.functions.col
    val row = SparkEntry.queries("m01_multimodal_features")(spark, dir)
      .orderBy(col("doc_id")).limit(1).collect()(0)
    val text = graft.core.Tables.documents(spark, dir)
      .orderBy(col("doc_id")).limit(1).collect()(0).getAs[String]("text")
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(row.getAs[String]("payload_md5") === hex)
    assert(row.getAs[Long]("n_bytes") === text.getBytes("UTF-8").length.toLong)
  }

  test("approx sketches (q25) land within HLL/quantile error bounds of exact answers") {
    import org.apache.spark.sql.functions._
    val approx = SparkEntry.queries("q25_approx_sketches")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val exact = graft.core.Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("p"),
        countDistinct(col("l_suppkey")).as("s"),
        expr("percentile(l_extendedprice, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(approx.keySet === exact.keySet)
    for ((k, (ap, as_, am)) <- approx) {
      val (ep, es, em) = exact(k)
      assert(math.abs(ap - ep).toDouble / ep < 0.1, s"$k parts: $ap vs $ep")
      assert(math.abs(as_ - es).toDouble / es < 0.1, s"$k supps: $as_ vs $es")
      assert(math.abs(am - em) / em < 0.05, s"$k median: $am vs $em")
    }
  }

  test("langid (t03) emits a valid language for every document") {
    val langs = SparkEntry.queries("t03_langid")(spark, "/root/testdata/sf0.001")
      .select("pred_lang").collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("de", "en", "es", "fr", "und")))
  }
}
