package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Algorithmic-property tests for the round-9 third-continuation
  * operators (e18/e19, q49, t20, p22, d18, m09, es20) — value-level
  * correctness vs DuckDB is the driver's gate; these assert the
  * invariants the oracle can't express (partitions, bounds, fixture
  * recovery, cross-query conservation).
  */
class Round9Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("e18: every purchase is attributed exactly once and labels are closed") {
    val out = SparkEntry.queries("e18_attribution")(spark, dir).collect()
    val labels = out.map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("click", "view", "organic")))
    val total = out.map(_.getLong(1)).sum
    val purchases = graft.core.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase").count()
    assert(total === purchases, "attribution must partition the purchase set")
    // organic rows carry zero lag by construction
    out.filter(_.getString(0) == "organic").foreach(r => assert(r.getLong(3) === 0L))
  }

  test("e19: co-occurrence counts respect set bounds") {
    val out = SparkEntry.queries("e19_cooccurrence")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (a, b, nab, na, nb, nDays) =
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(a < b, "canonical pair order")
      assert(nab <= math.min(na, nb), "intersection bounded by either side")
      assert(na <= nDays && nb <= nDays, "per-type cells bounded by total cells")
    }
  }

  test("q49: struct-extrema match windowed argmax recomputation") {
    val out = SparkEntry.queries("q49_argmax_mode")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.nonEmpty)
    val p = graft.core.Tables.part(spark, dir)
    // mode_n is the true max count per brand; top/cheap prices bracket
    val counts = p.groupBy(col("p_brand"), col("p_type")).count()
      .groupBy(col("p_brand")).agg(max("count").as("mx"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (brand, r) =>
      assert(r.getAs[Long]("mode_n") === counts(brand), s"mode_n for $brand")
      assert(r.getAs[Double]("top_price") >= r.getAs[Double]("cheap_price"),
        "top_price >= cheap_price")
    }
  }

  test("t20: confusion rows partition each declared language's corpus") {
    val out = SparkEntry.queries("t20_langid_confusion")(spark, dir).collect()
    val byLang = out.groupBy(_.getString(0))
    byLang.foreach { case (_, rows) =>
      val nLang = rows.head.getLong(3)
      assert(rows.map(_.getLong(2)).sum === nLang, "cells sum to declared-lang total")
      assert(rows.map(_.getLong(4)).sum <= 1000000L, "floor shares never exceed 1e6")
    }
  }

  test("p22: quartiles ordered and flag counts bounded") {
    val out = SparkEntry.queries("p22_length_outliers")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, q1, q3, lo, hi) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(q1 <= q3, "quartile order")
      assert(lo + hi <= n, "flags bounded by doc count")
    }
  }

  test("d18: matrix is canonical and conserves the d03 pair mass") {
    val out = SparkEntry.queries("d18_source_dup_matrix")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getString(0) <= r.getString(1), "canonical source order"))
    val nPairs = SparkEntry.queries("d03_ngram_jaccard")(spark, dir).count()
    assert(out.map(_.getLong(2)).sum === nPairs, "every near-dup pair lands in one cell")
  }

  test("m09: the integrity scan recovers exactly the injected corruption set") {
    val docs = graft.core.Tables.documents(spark, dir)
    val expected = docs
      .filter(col("doc_id") % 97 === 0 && octet_length(col("text")) > 0).count()
    val expectedMissing = docs.filter(col("doc_id") % 97 === 0)
      .select(sum(least(lit(7L), octet_length(col("text")).cast("long"))))
      .collect()(0).getLong(0)
    val out = SparkEntry.queries("m09_payload_integrity")(spark, dir).collect()
    val trunc = out.filter(_.getString(1) == "truncated")
    assert(trunc.map(_.getLong(2)).sum === expected)
    assert(trunc.map(_.getLong(3)).sum === expectedMissing)
    val ok = out.filter(_.getString(1) == "ok")
    assert(ok.map(_.getLong(2)).sum + trunc.map(_.getLong(2)).sum === docs.count())
  }

  test("p12: shares partition the corpus and effective classes are bounded") {
    val out = SparkEntry.queries("p12_label_balance")(spark, dir).collect()
    assert(out.nonEmpty)
    val nLabels = out.length.toLong
    assert(math.abs(out.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    out.foreach { r =>
      val eff = r.getAs[Double]("effective_classes")
      assert(eff >= 1.0 - 1e-9 && eff <= nLabels + 1e-9,
        "inverse Simpson lies in [1, n_labels]")
    }
    val total = graft.core.Tables.table(spark, dir, "embeddings").count()
    assert(out.map(_.getAs[Long]("n_vecs")).sum === total)
  }

  test("e20: buckets partition the user set and bounds bracket the counts") {
    val out = SparkEntry.queries("e20_activity_histogram")(spark, dir).collect()
    assert(out.nonEmpty)
    val users = graft.core.Tables.events(spark, dir)
      .select(col("user_id")).distinct().count()
    assert(out.map(_.getAs[Long]("n_users")).sum === users)
    out.foreach { r =>
      assert(r.getAs[Long]("lo") <= r.getAs[Long]("hi"))
      assert(r.getAs[Long]("n_events") >= r.getAs[Long]("n_users") * r.getAs[Long]("lo"))
      assert(r.getAs[Long]("n_events") <= r.getAs[Long]("n_users") * r.getAs[Long]("hi"))
    }
    assert(math.abs(out.map(_.getAs[Double]("user_share")).sum - 1.0) < 1e-9)
    assert(math.abs(out.map(_.getAs[Double]("event_share")).sum - 1.0) < 1e-9)
  }

  test("t21: doc counts partition the corpus and flesch recomputes from the sums") {
    val out = SparkEntry.queries("t21_readability")(spark, dir).collect()
    assert(out.nonEmpty)
    val nDocs = graft.core.Tables.documents(spark, dir).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum === nDocs)
    out.foreach { r =>
      val w = r.getAs[Long]("n_words").toDouble
      val sEff = math.max(r.getAs[Long]("n_sentences"), 1L).toDouble
      val y = r.getAs[Long]("n_syllables").toDouble
      val expected = 206.835 - 1.015 * (w / sEff) - 84.6 * (y / math.max(w, 1.0))
      assert(r.getAs[Double]("flesch") === expected, "flesch is the declared formula")
    }
  }

  test("s17: cells partition the corpus and max bounds the mean") {
    val out = SparkEntry.queries("s17_quantization_error")(spark, dir).collect()
    assert(out.nonEmpty)
    val nVecs = graft.core.Tables.table(spark, dir, "embeddings").count()
    assert(out.map(_.getAs[Long]("n_members")).sum === nVecs)
    out.foreach { r =>
      assert(r.getAs[Double]("mean_err_q") <= r.getAs[Long]("max_err_q").toDouble + 1e-9)
      assert(r.getAs[Long]("n_members") > 0L)
    }
  }

  test("m10: modalities partition the corpus and quantiles are ordered") {
    val out = SparkEntry.queries("m10_storage_report")(spark, dir).collect()
    assert(out.length === 3)
    val docs = graft.core.Tables.documents(spark, dir)
    assert(out.map(_.getAs[Long]("n_records")).sum === docs.count())
    assert(math.abs(out.map(_.getAs[Double]("bytes_share")).sum - 1.0) < 1e-9)
    out.foreach { r =>
      assert(r.getAs[Long]("p50_bytes") <= r.getAs[Long]("p90_bytes"))
      assert(r.getAs[Long]("p90_bytes") <= r.getAs[Long]("max_bytes"))
    }
    val byMod = docs.groupBy((col("doc_id") % 3).as("k")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val names = Map(0L -> "image", 1L -> "audio", 2L -> "video")
    out.foreach { r =>
      val k = names.find(_._2 == r.getAs[String]("modality")).get._1
      assert(r.getAs[Long]("n_records") === byMod(k), s"count for modality $k")
    }
  }

  test("q50: compaction keeps one row per customer and the true latest order") {
    val out = SparkEntry.queries("q50_latest_compaction")(spark, dir).collect()
    val orders = graft.core.Tables.orders(spark, dir)
    assert(out.length === orders.select(col("o_custkey")).distinct().count())
    assert(out.map(_.getAs[Long]("n_orders")).sum === orders.count())
    val expect = orders
      .groupBy(col("o_custkey"))
      .agg(max(struct(unix_date(to_date(col("o_orderdate"))).cast("long"),
        col("o_orderkey"))).as("m"))
      .select(col("o_custkey"), col("m").getField("o_orderkey"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach(r =>
      assert(r.getAs[Long]("latest_orderkey") === expect(r.getAs[Long]("o_custkey"))))
  }

  test("d19: survivors belong to their cluster and token accounting balances") {
    val out = SparkEntry.queries("d19_best_survivor")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("cluster_size") >= 2L)
      assert(r.getAs[Long]("n_dropped") === r.getAs[Long]("cluster_size") - 1)
      assert(r.getAs[Long]("dropped_tokens") >= 0L)
    }
    // every multi-member cluster from d10's histogram is accounted for
    val hist = SparkEntry.queries("d10_cluster_sizes")(spark, dir).collect()
      .map(r => r.getAs[Long]("cluster_size") -> r.getAs[Long]("n_clusters")).toMap
    val expectedClusters = hist.filter(_._1 >= 2).values.sum
    assert(out.length.toLong === expectedClusters)
  }

  test("e21: cells partition the event log and dow/hour are in range") {
    val out = SparkEntry.queries("e21_seasonality")(spark, dir).collect()
    assert(out.nonEmpty)
    val total = graft.core.Tables.events(spark, dir).count()
    assert(out.map(_.getAs[Long]("n_events")).sum === total)
    assert(math.abs(out.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    out.foreach { r =>
      assert(r.getAs[Long]("dow") >= 0L && r.getAs[Long]("dow") <= 6L)
      assert(r.getAs[Long]("hour") >= 0L && r.getAs[Long]("hour") <= 23L)
    }
  }

  test("t22: the growth curve is monotone and its endpoints are exact") {
    val out = SparkEntry.queries("t22_heaps_curve")(spark, dir).collect()
      .sortBy(_.getAs[Long]("bucket"))
    assert(out.length === 10)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("cum_tokens") <= b.getAs[Long]("cum_tokens"))
      assert(a.getAs[Long]("cum_vocab") <= b.getAs[Long]("cum_vocab"))
    }
    val docs = graft.core.Tables.documents(spark, dir)
    val allToks = docs.select(explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0)
    assert(out.last.getAs[Long]("cum_tokens") === allToks.count())
    assert(out.last.getAs[Long]("cum_vocab") === allToks.distinct().count())
  }

  test("p23: every edge's matched+orphan+null partitions the child") {
    val out = SparkEntry.queries("p23_fk_integrity")(spark, dir).collect()
    assert(out.length === 4)
    out.foreach { r =>
      assert(r.getAs[Long]("n_matched") + r.getAs[Long]("n_orphan") +
        r.getAs[Long]("n_null_key") === r.getAs[Long]("n_child"), r.getAs[String]("fk_edge"))
    }
    val li = graft.core.Tables.lineitem(spark, dir).count()
    assert(out.filter(_.getAs[String]("fk_edge").startsWith("lineitem."))
      .forall(_.getAs[Long]("n_child") === li))
  }

  test("s18: filtered search honors the label predicate and ranks correctly") {
    val out = SparkEntry.queries("s18_filtered_search")(spark, dir).collect()
    assert(out.nonEmpty)
    val labels = graft.core.Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rows) =>
      rows.foreach { r =>
        assert(labels(r.getAs[Long]("nid")) === labels(qid), "neighbor shares the label")
        assert(r.getAs[Long]("nid") !== qid, "self excluded")
      }
      val byRank = rows.sortBy(_.getAs[Long]("rn"))
      assert(byRank.map(_.getAs[Long]("rn")).toSeq === (1L to rows.length).toSeq)
      byRank.sliding(2).foreach { case Array(a, b) =>
        assert(a.getAs[Double]("sim") >= b.getAs[Double]("sim"))
      }
    }
  }

  test("e22: cohorts partition the user base and shares sum to one") {
    val out = SparkEntry.queries("e22_bot_cohorts")(spark, dir).collect()
    assert(out.nonEmpty)
    val users = graft.core.Tables.events(spark, dir)
      .select(col("user_id")).distinct().count()
    assert(out.map(_.getAs[Long]("n_users")).sum === users)
    assert(out.map(_.getAs[Long]("n_events")).sum ===
      graft.core.Tables.events(spark, dir).count())
    assert(math.abs(out.map(_.getAs[Double]("event_share")).sum - 1.0) < 1e-9)
    val allowed = Set("bot_like", "heavy", "rapid", "normal")
    out.foreach(r => assert(allowed(r.getAs[String]("cohort"))))
  }

  test("t23: density report partitions docs and digit patterns are vacuous here") {
    val out = SparkEntry.queries("t23_pii_density")(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("n_docs")).sum ===
      graft.core.Tables.documents(spark, dir).count())
    out.foreach { r =>
      assert(r.getAs[Long]("email_hits") === 0L, "synthetic corpus has no emails")
      assert(r.getAs[Long]("phone_hits") === 0L, "synthetic corpus has no phones")
      assert(r.getAs[Long]("docs_with_hits") <= r.getAs[Long]("n_docs"))
      val expPpm = r.getAs[Long]("denylist_hits") * 1000000L /
        math.max(r.getAs[Long]("n_tokens"), 1L)
      assert(r.getAs[Long]("denylist_ppm") === expPpm)
    }
  }

  test("d20: the sweep is monotone and conserves the candidate-pair mass") {
    val out = SparkEntry.queries("d20_jaccard_sweep")(spark, dir).collect()
      .sortBy(_.getAs[Long]("threshold_tenths"))
    assert(out.length === 10)
    assert(out.head.getAs[Long]("n_pairs_ge") === out.map(_.getAs[Long]("n_bucket")).sum,
      "t=0 cumulative equals the full candidate mass")
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_pairs_ge") >= b.getAs[Long]("n_pairs_ge"))
      assert(a.getAs[Long]("n_pairs_ge") - b.getAs[Long]("n_pairs_ge") ===
        a.getAs[Long]("n_bucket"), "cumulative minus next = own bucket")
    }
  }

  test("q51: the page is the true first 20 rows past the cursor") {
    val out = SparkEntry.queries("q51_keyset_pagination")(spark, dir).collect()
    assert(out.length === 20)
    val cursor = java.time.LocalDate.of(1996, 1, 1).toEpochDay
    out.foreach(r => assert(r.getAs[Long]("od") >= cursor))
    val keys = out.map(r => (r.getAs[Long]("od"), r.getAs[Long]("o_orderkey")))
    assert(keys.sortBy(identity).toSeq === keys.toSeq, "page is sorted by the cursor key")
    val expect = graft.core.Tables.orders(spark, dir)
      .select(unix_date(to_date(col("o_orderdate"))).cast("long").as("od"), col("o_orderkey"))
      .filter(col("od") >= cursor)
      .orderBy(col("od"), col("o_orderkey")).limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.toSeq === expect.toSeq)
  }

  test("s19: no tombstoned vector appears on either side of the result") {
    val out = SparkEntry.queries("s19_tombstone_search")(spark, dir).collect()
    assert(out.nonEmpty)
    // the exact uhash("del_", ·) < 0.05 cohort, rebuilt from the shared
    // hash60 kernel so the test tracks the production rule
    val u = graft.ops.Sampling.hash60(
      concat(lit("del_"), col("vec_id").cast("string"))) / lit(1152921504606846976.0)
    val dead = graft.core.Tables.table(spark, dir, "embeddings")
      .select(col("vec_id")).filter(u < 0.05)
      .collect().map(_.getLong(0)).toSet
    assert(dead.nonEmpty, "the cohort must be non-trivial for this test to bite")
    out.foreach { r =>
      assert(!dead.contains(r.getAs[Long]("qid")), "tombstoned query excluded")
      assert(!dead.contains(r.getAs[Long]("nid")), "tombstoned neighbor excluded")
      assert(r.getAs[Long]("rn") >= 1L && r.getAs[Long]("rn") <= 5L)
    }
  }

  test("e23: session accounting matches e03 and conversion is bounded") {
    val out = SparkEntry.queries("e23_session_conversion")(spark, dir).collect()
    assert(out.nonEmpty)
    val sessions = SparkEntry.queries("e03_sessionize")(spark, dir).count()
    assert(out.map(_.getAs[Long]("n_sessions")).sum === sessions,
      "length buckets partition the e03 session set")
    out.foreach { r =>
      assert(r.getAs[Long]("n_converted") <= r.getAs[Long]("n_sessions"))
      assert(r.getAs[Long]("conversion_ppm") ===
        r.getAs[Long]("n_converted") * 1000000L / r.getAs[Long]("n_sessions"))
    }
  }

  test("m11: batches partition the corpus and modality columns are exhaustive") {
    val out = SparkEntry.queries("m11_batch_interleave")(spark, dir).collect()
    assert(out.nonEmpty)
    val docs = graft.core.Tables.documents(spark, dir).count()
    assert(out.map(_.getAs[Long]("n_records")).sum === docs)
    out.foreach { r =>
      assert(r.getAs[Long]("n_image") + r.getAs[Long]("n_audio") +
        r.getAs[Long]("n_video") === r.getAs[Long]("n_records"))
      val counts = Seq(r.getAs[Long]("n_image"), r.getAs[Long]("n_audio"),
        r.getAs[Long]("n_video"))
      assert(r.getAs[Long]("spread") === counts.max - counts.min)
      assert(r.getAs[Boolean]("balanced") ===
        (6L * (counts.max - counts.min) <= r.getAs[Long]("n_records")))
    }
    // full batches are exactly 64 except possibly the last
    assert(out.count(_.getAs[Long]("n_records") != 64L) <= 1)
  }

  test("p24: buckets partition the scored corpus and bounds bracket the mean") {
    val out = SparkEntry.queries("p24_dup_quality")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("size_bucket") >= 1L && r.getAs[Long]("size_bucket") <= 4L)
      assert(r.getAs[Double]("min_quality") <= r.getAs[Double]("mean_quality") + 1e-9)
      assert(r.getAs[Double]("mean_quality") <= r.getAs[Double]("max_quality") + 1e-9)
    }
    val scored = graft.core.Tables.documents(spark, dir).count()
    // every doc has a cluster label; only null-quality (zero-token) docs drop
    assert(out.map(_.getAs[Long]("n_docs")).sum <= scored)
    assert(out.map(_.getAs[Long]("n_docs")).sum > 0L)
  }

  test("d21: stage audit is consistent with d03's truth and d04's verified output") {
    val r = SparkEntry.queries("d21_lsh_stage_audit")(spark, dir).collect()
    assert(r.length === 1)
    val row = r.head
    val (nt, nc, nb) = (row.getAs[Long]("n_true"),
      row.getAs[Long]("n_candidates"), row.getAs[Long]("n_caught"))
    assert(nb <= math.min(nt, nc))
    assert(row.getAs[Long]("recall_ppm") === nb * 1000000L / math.max(nt, 1L))
    assert(row.getAs[Long]("precision_ppm") === nb * 1000000L / math.max(nc, 1L))
    assert(nt === SparkEntry.queries("d03_ngram_jaccard")(spark, dir).count(),
      "truth is exactly the d03 pair set")
    // d04 = verify(candidates) at the same 0.5 threshold, so its output
    // IS the caught set (df-cap vacuous on this data — the d03 contract)
    assert(nb === SparkEntry.queries("d04_minhash_lsh")(spark, dir).count())
  }

  test("d21: borderline j=0.5 pairs expose band misses — the audit bites") {
    // 40 doc pairs sharing EXACTLY half their shingle union (j = 0.5, the
    // threshold): at j=0.5 a 128-hash banded signature catches a pair with
    // only ~6% probability, so the stage audit must report recall < 1 —
    // the miss class the verify stage can never repair. Token namespaces
    // are disjoint per pair, so truth is exactly the 40 planted pairs.
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-d21").toString
    val rows = (0 until 40).flatMap { i =>
      val shared = (0 until 14).map(j => s"p${i}w$j")
      val a = shared ++ (14 until 20).map(j => s"p${i}y$j")
      val b = shared ++ (14 until 20).map(j => s"p${i}x$j")
      Seq((i.toLong, a.mkString(" "), "en", "src0", 100L),
        ((100 + i).toLong, b.mkString(" "), "en", "src0", 100L))
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(out + "/documents.parquet")
    try {
      val r = SparkEntry.queries("d21_lsh_stage_audit")(spark, out).collect().head
      assert(r.getAs[Long]("n_true") === 40L, "every planted pair is a true >=0.5 pair")
      val caught = r.getAs[Long]("n_caught")
      assert(caught < 40L, "some j=0.5 pair must be missed by the bands")
      assert(r.getAs[Long]("recall_ppm") === caught * 1000000L / 40L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("e24: the decayed leaderboard matches a driver-side recomputation") {
    val out = SparkEntry.queries("e24_recency_score")(spark, dir).collect()
    assert(out.length === 20)
    val days = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mxd = days.map(_._2).max
    val scores = days.groupBy(_._1).map { case (u, es) =>
      u -> (es.length.toLong,
        es.map(e => 1000000L >> math.min(mxd - e._2, 62L).toInt).sum)
    }
    val expect = scores.toSeq.sortBy { case (u, (_, sc)) => (-sc, u) }.take(20)
    assert(out.map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toSeq === expect)
  }

  test("q52: the salted join equals the plain join bit for bit") {
    val salted = SparkEntry.queries("q52_salted_skew_join")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val li = graft.core.Tables.lineitem(spark, dir)
    val pt = graft.core.Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))
    val plain = li.join(pt, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"),
        graft.core.Num.dsum(col("l_extendedprice")).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(salted === plain)
  }

  test("byte_gram_simhash60 equals the composed distinct-substring form on the corpus") {
    val t = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").cast("string").as("t"))
      .filter(length(col("t")) >= 4)
    val both = t.select(
      graft.functions.TextFunctions.byte_gram_simhash60(col("t")).as("fused"),
      graft.functions.TextFunctions.simhash60(
        array_distinct(transform(sequence(lit(1), length(col("t")) - 3),
          i => col("t").substr(i, lit(4))))).as("composed"))
    assert(both.filter(col("fused") =!= col("composed")).count() === 0L)
    // and on crafted edge rows: repeated grams, exactly-4, non-trivial dedup
    val edge = spark.createDataFrame(Seq(
      (1L, "aaaaaa"), (2L, "abcd"), (3L, "abcabcabc"), (4L, "xyzw pqrs xyzw")))
      .toDF("id", "t")
    val e = edge.select(
      graft.functions.TextFunctions.byte_gram_simhash60(col("t")).as("fused"),
      graft.functions.TextFunctions.simhash60(
        array_distinct(transform(sequence(lit(1), length(col("t")) - 3),
          i => col("t").substr(i, lit(4))))).as("composed"))
    assert(e.filter(col("fused") =!= col("composed")).count() === 0L)
  }

  test("es21: chained-stateful distinct counts equal the batch distinct on closed windows") {
    val sfDir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("es21_window_distinct_users")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    // batch recomputation: distinct (hour, user) per window, closed set only
    val ev = graft.core.Tables.events(spark, sfDir)
    val wmUs = ev.agg((floor(max(unix_micros(col("ts"))) / 1000) - 7200000L) * 1000L)
      .collect()(0).getLong(0)
    val batch = ev
      .select(unix_micros(date_trunc("hour", col("ts"))).as("b"), col("user_id"))
      .distinct()
      .groupBy(col("b")).agg(count(lit(1)).as("n"))
      .filter(col("b") + 3600000000L <= wmUs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === batch)
  }

  test("es20: matrix rows are internally consistent and match es02's closed totals") {
    val matrix = SparkEntry.queries("es20_window_matrix")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Seq(3, 4, 5, 6, 7).map(r.getLong))).toMap
    assert(matrix.nonEmpty)
    matrix.values.foreach { case (total, perType) =>
      assert(perType.sum === total, "type columns are exhaustive")
    }
    val es02 = SparkEntry.queries("es02_tumbling_closed")(spark, "/root/testdata/sf0.001")
      .groupBy(col("bucket_us")).agg(sum(col("n")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(matrix.keySet === es02.keySet, "same closed-window set as es02")
    matrix.foreach { case (b, (total, _)) => assert(es02(b) === total) }
  }
}
