package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 hardening tests: the d17 degree-ordered triangle
  * orientation under adversarial skew (VERDICT r9 #3), and related
  * invariants the DuckDB oracle can't express.
  */
class Round10Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Planted hot node: a 200-leaf star (0 triangles) unioned with a
    * 5-clique. Under the old id-ordered orientation a low-id hub apexes
    * C(200,2) = 19900 wedges; degree-ordering must direct every star
    * edge INTO the hub (out-degree 0) so the wedge work is the clique's
    * alone, while counts stay exact.
    */
  test("d17 kernel: degree-ordered orientation kills hub wedges, counts stay exact") {
    import spark.implicits._
    val hub = 0L
    val star = (1L to 200L).map(l => (hub, l)) // hub id sorts LOWEST: worst case for id-order
    val cliqueIds = Seq(1000L, 1001L, 1002L, 1003L, 1004L)
    val clique = for {
      a <- cliqueIds; b <- cliqueIds if a < b
    } yield (a, b)
    val edges = (star ++ clique).toDF("ida", "idb")

    // orientation: hub receives everything, emits nothing
    val oriented = graft.ops.Dedup.orientByDegree(edges).cache()
    val hubOut = oriented.filter(col("src") === hub).count()
    assert(hubOut === 0L, "hub (deg 200) must rank above all leaves (deg 1)")
    val maxOut = oriented.groupBy(col("src")).agg(count(lit(1)).as("out"))
      .agg(max(col("out"))).head().getLong(0)
    assert(maxOut <= 4L, s"max out-degree must be clique-bounded, got $maxOut")

    // counts: each clique node closes C(4,2)=6 triangles; star contributes none
    val got = graft.ops.Dedup.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === cliqueIds.map(_ -> 6L).toMap)
    oriented.unpersist()
  }

  test("q52 adaptive salt: fanout tracks measured skew; planted-hot-key corpus stays exact") {
    import graft.queries.Relational6.saltFor
    // uniform corpus degenerates to the plain join; hot key spreads to
    // ~average; fanout never exceeds the partition count
    assert(saltFor(1.0, 32) === 1)
    assert(saltFor(1.77, 32) === 2) // this testdata's actual regime
    assert(saltFor(600.0, 32) === 32)
    assert(saltFor(0.5, 32) === 1)

    // planted 30%-on-one-key corpus: q52 must choose a salt > 2 via the
    // p16 seam and still match the plain join bit-for-bit
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_skew").toFile
    val n = 10000
    val li = (0 until n).map { i =>
      val partkey = if (i % 10 < 3) 7L else (i % 500).toLong + 100L
      (i.toLong, partkey, 1.0 + (i % 5), 10.0 + (i % 7))
    }.toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    li.write.parquet(new java.io.File(out, "lineitem.parquet").getAbsolutePath)
    (0 until 700).map(i => (i.toLong, s"brand${i % 20}"))
      .toDF("p_partkey", "p_brand")
      .write.parquet(new java.io.File(out, "part.parquet").getAbsolutePath)
    try {
      val dir = out.getAbsolutePath
      val xAvg = graft.ops.Profiling.skewReport(spark, dir)
        .select(org.apache.spark.sql.functions.col("x_avg")).head().getDouble(0)
      assert(saltFor(xAvg, 32) > 2, s"planted 30% key must demand real fanout, x_avg=$xAvg")
      val got = SparkEntry.queries("q52_salted_skew_join")(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
      val want = graft.core.Tables.lineitem(spark, dir)
        .join(graft.core.Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          graft.core.Num.dsum(col("l_quantity")).as("sum_qty"),
          graft.core.Num.dsum(col("l_extendedprice")).as("sum_price"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
      assert(got === want, "salting must change partitioning and nothing else")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(out)
  }

  test("p26 temperature mixture: rarest stratum keeps all; kept share tracks sqrt(cmin/c)") {
    val dir = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("p26_temperature_mixture")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    val byLang = out.groupBy(_._2).view.mapValues { rs =>
      (rs.length.toLong, rs.count(_._3).toLong)
    }.toMap
    val cmin = byLang.values.map(_._1).min
    for ((lang, (c, kept)) <- byLang) {
      val f = math.sqrt(cmin.toDouble / c.toDouble)
      if (c == cmin)
        assert(kept === c, s"$lang is the rarest stratum and must keep everything")
      else {
        // hash-uniform keep rate concentrates around F_d; 3-sigma binomial band
        val sigma = math.sqrt(c * f * (1 - f))
        assert(math.abs(kept - c * f) <= 3 * sigma + 1,
          s"$lang kept $kept of $c, expected ~${c * f}")
      }
    }
    // determinism: a second run keeps the identical doc set
    val again = SparkEntry.queries("p26_temperature_mixture")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toSet
    assert(again === out.map(r => (r._1, r._3)).toSet)
  }

  test("es23: the RocksDB provider actually backs the state store and matches es02") {
    val dir = "/root/testdata/sf0.001"
    // gate-level equality: swapped backend, identical finalized output
    val hdfs = SparkEntry.queries("es02_tumbling_closed")(spark, dir)
      .collect().map(_.toString).sorted
    val rocks = SparkEntry.queries("es23_rocksdb_state")(spark, dir)
      .collect().map(_.toString).sorted
    assert(rocks === hdfs, "state backend must be a storage choice, not a semantics choice")
    // and the provider really is RocksDB: run the same stream holding the
    // query handle and look for rocksdb custom metrics in the progress
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      try spark.catalog.dropTempView("es23_probe") catch { case _: Throwable => () }
      val q = graft.streaming.EventStream.tumblingAgg(
          graft.streaming.EventStream.readEventsWith(spark, dir, None))
        .writeStream.format("memory").queryName("es23_probe")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val metricKeys = q.recentProgress
        .flatMap(_.stateOperators.flatMap(_.customMetrics.keySet.toArray.map(_.toString)))
      assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
        s"no rocksdb state-store metrics in progress: ${metricKeys.distinct.mkString(",")}")
    } finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("p26 edge: a single-language corpus keeps every document (threshold = 2^60)") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_p26edge").toFile
    (1L to 50L).map(i => (i, s"text $i", "en"))
      .toDF("doc_id", "text", "lang")
      .write.parquet(new java.io.File(out, "documents.parquet").getAbsolutePath)
    try {
      val rows = SparkEntry.queries("p26_temperature_mixture")(spark, out.getAbsolutePath)
        .collect()
      assert(rows.length === 50)
      assert(rows.forall(_.getBoolean(2)),
        "cmin == c for the only stratum: F = 1 exactly, nothing may drop")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(out)
  }

  test("d22 edge: an exact duplicate in the delta reports jaccard 1.0 against the smallest corpus match") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_d22edge").toFile
    // corpus ids 1,2,3 share one text; delta id 10 duplicates it exactly;
    // delta id 20 is unrelated; delta id 30 is too short to shingle
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words in this one entirely"),
      (10L, "alpha beta gamma delta epsilon zeta"),
      (20L, "unrelated content nothing shared here at all whatsoever"),
      (30L, "hi"))
    docs.toDF("doc_id", "text")
      .write.parquet(new java.io.File(out, "documents.parquet").getAbsolutePath)
    try {
      val rows = SparkEntry.queries("d22_incremental_lsh")(spark, out.getAbsolutePath)
        .collect().map(r => r.getLong(0) ->
          (Option(r.get(1)).map(_ => r.getLong(1)), r.getString(3))).toMap
      assert(rows.keySet === Set(10L, 20L, 30L), "every delta doc gets a verdict row")
      assert(rows(10L) === (Some(1L), "near"),
        "exact duplicate: jaccard 1.0, tie broken to the smallest corpus id")
      assert(rows(20L) === (None, "new"))
      assert(rows(30L) === (None, "new"), "shingle-less docs classify as new, not crash")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(out)
  }

  test("d22 sketch-index verdicts are consistent with d13's exact index") {
    // d22 candidates come from banded buckets (recall ≤ 1); d13 probes
    // the exact shingle inverted index (recall 1 at this df regime). So
    // every d22 'near' must be non-'new' under d13, and both must agree
    // the verified match clears the 0.5 threshold. Also report sketch
    // recall: the fraction of d13's near/exact docs d22's bands caught
    // (tuned by the d21-audited bands/rows point — at 32x4 it is 1.0 on
    // this corpus).
    val dir = "/root/testdata/sf0.01"
    val d22 = SparkEntry.queries("d22_incremental_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_ => r.getLong(1)),
        r.getString(3))).toSeq
    val d13 = SparkEntry.queries("d13_incremental_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d22.map(_._1).toSet === d13.keySet, "both classify the same delta")
    val d22near = d22.filter(_._3 == "near").map(_._1).toSet
    val d13dup = d13.collect { case (id, v) if v != "new" => id }.toSet
    assert(d22near.subsetOf(d13dup),
      s"sketch-index 'near' outside the exact index's dup set: ${d22near -- d13dup}")
    assert(d22near.nonEmpty, "the sf0.01 corpus contains near-dups in the delta")
    info(s"sketch recall vs exact index: ${d22near.size}/${d13dup.size}")
  }

  test("bench delta-vs-local: movers reported with fp attribution; SF mismatch mutes") {
    val dir = java.nio.file.Files.createTempDirectory("benchref").toFile
    val ref = new java.io.File(dir, "ref.json")
    java.nio.file.Files.writeString(ref.toPath,
      """{"metric":"total","queries":{"qa":1.0,"qb":1.0,"qc":1.0,"qd":1.0,"qe":1.0},
        |"plan_fp":{"qa":"aaa","qb":"bbb","qc":"ccc","qe":"eee"},"sf":"/data/sf0.1"}""".stripMargin.replace("\n", ""))
    def rec(w: Double, fp: String, suspect: Boolean = false) =
      Bench.QRec(w, w, Seq(w), 0.0, fp, suspect)
    val results = Seq(
      "qa" -> rec(5.0, "aaa"),   // 5x slower, same plan -> env
      "qb" -> rec(4.0, "xxx"),   // 4x slower, plan changed
      "qc" -> rec(1.1, "ccc"),   // within noise -> absent
      "qd" -> rec(3.0, "ddd"),   // mover, but ref has no fp
      // 9x mover whose record is LOAD-SUSPECT: the harness distrusts
      // its own stamp, so the delta table must not carry it (round-12
      // verdict #1: delta_vs_local never polluted by distrusted stamps)
      "qe" -> rec(9.0, "xxx", suspect = true))
    val (d, regs) = Bench.deltaVsRef(results, "/elsewhere/sf0.1", ref.getAbsolutePath)
    assert(d.contains(""""q":"qa"""") && d.contains(""""fp":"same""""), d)
    assert(d.contains(""""q":"qb"""") && d.contains(""""fp":"diff""""), d)
    assert(!d.contains("qc"), d)
    // the suspect 9x fp-diff mover: neither a delta row nor a regression
    assert(!d.contains("qe"), d)
    assert(!regs.contains("qe"), regs.toString)
    // no reference fingerprint: never claim "diff" (a code-attribution
    // statement) - report unknown
    assert(d.contains(""""q":"qd"""") && d.contains(""""fp":"unknown""""), d)
    // largest mover first
    assert(d.indexOf("\"qa\"") < d.indexOf("\"qb\""), d)
    // a reference recorded at a different SF is not comparable
    assert(Bench.deltaVsRef(results, "/data/sf0.01", ref.getAbsolutePath) === ("[]", Nil))
    // absent reference file: muted, never throws
    assert(Bench.deltaVsRef(results, "/data/sf0.1", "/nonexistent.json") === ("[]", Nil))
  }

  test("d17 kernel: orientation-independence — counts equal brute force on a random graph") {
    import spark.implicits._
    // deterministic pseudo-random graph on 40 nodes, ~25% density
    val n = 40
    val pairs = for {
      a <- 0 until n; b <- (a + 1) until n
      if ((a * 2654435761L + b * 40503L) % 97) < 24
    } yield (a.toLong, b.toLong)
    val edgeSet = pairs.toSet
    val want = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- pairs; (b2, c) <- pairs if b2 == b && edgeSet((a, c))) {
      want(a) += 1; want(b) += 1; want(c) += 1
    }
    val got = graft.ops.Dedup.triangleCounts(pairs.toDF("ida", "idb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want.toMap)
    assert(got.nonEmpty, "the random graph at 25% density must contain triangles")
  }
}
