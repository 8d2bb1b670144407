package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 regression pins: the day-local compaction census (no range
  * exchange on the no-breach pass), compactWhere's crash-recovery swap,
  * the per-row budget guard, and the degenerate-histogram bin clamp.
  */
class Round14Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def eventRows() = spark.read.parquet(s"$dir/events.parquet")
    .select(col("event_id"), col("user_id"),
      graft.queries.EventsQueries.epochDay(col("ts")).as("day"),
      col("event_type"), col("value"))

  // ---- day-local census (r13 verdict #1) --------------------------------

  test("census law: plannedCountsByDay equals the full plan's per-day file count") {
    import graft.ops.Compaction
    val rows = eventRows()
    try {
      for (budget <- Seq(256L, 1024L, 4096L)) {
        val planned = Compaction.planLayout(rows, budget)
          .groupBy(col("day")).agg(countDistinct(col("file_idx")).as("nf"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val census = Compaction.plannedCountsByDay(rows, budget)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(census === planned,
          s"census diverged from the plan at budget=$budget")
      }
    } finally graft.core.Sessions.sweepPersistedState(spark)
  }

  test("census plan: one hash aggregate exchange, no range exchange, no window") {
    import graft.ops.Compaction
    val plan = Compaction.plannedCountsByDay(eventRows(), 4096L)
      .queryExecution.executedPlan.toString
    // the no-breach nightly pass must never replan the table: the
    // census is ONE per-day aggregate — a global-order range exchange
    // or a running-sum window here is the r13 scale-killer resurfacing
    assert(!plan.toLowerCase.contains("rangepartitioning"),
      s"census plan contains a range exchange:\n$plan")
    assert(!plan.contains("Window"), s"census plan contains a window:\n$plan")
  }

  test("compactWhere crash matrix: uncommitted stages invisible, committed debris reclaimed") {
    import graft.ops.Compaction
    val base = java.nio.file.Files.createTempDirectory("graft_optrecover").toFile
    val root = new java.io.File(base, "layout").getAbsolutePath
    try {
      val budget = 1024L
      Compaction.writeLayout(Compaction.planLayoutBy(eventRows(),
        when(col("day") % 2 === 0, lit(budget)).otherwise(lit(128L))), root)
      def rowsNow() = graft.streaming.IngestPipeline.readShards(spark, root)
        .collect().map(_.toSeq.toList).groupBy(identity).view.mapValues(_.length).toMap
      val rowsBefore = rowsNow()

      // crash window A: a rewrite fully staged under _rewrites, never
      // committed — INVISIBLE to every reader (no rename ever made it
      // live), and the next pass censuses the old files as if the
      // crashed pass never ran
      val aDay = new java.io.File(root).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("day=")).head
      val orphan = new java.io.File(root, "_rewrites/rw-crashed00001")
      org.apache.commons.io.FileUtils.copyDirectory(
        aDay, new java.io.File(orphan, aDay.getName))
      assert(rowsNow() === rowsBefore,
        "an uncommitted stage must be invisible to readers")
      // young orphan stages survive recovery (they may be in flight)...
      Compaction.recoverLayout(root, staleMs = Long.MaxValue)
      assert(orphan.exists())
      // ...stale ones are vacuumed
      Compaction.recoverLayout(root, staleMs = 0)
      assert(!orphan.exists(), "a stale uncommitted stage must be vacuumed")
      val dayBackup = new java.io.File(base, "daybackup")
      org.apache.commons.io.FileUtils.copyDirectory(aDay, dayBackup)

      // the real pass: breached (odd) days committed into the log
      val (breached, _, after) = Compaction.compactWhere(spark, root, budget)
      assert(breached.nonEmpty && after.nFiles > 0)
      assert(rowsNow() === rowsBefore, "the committed rewrite must conserve rows")
      val logNow = Compaction.LayoutLog.read(new java.io.File(root))
      assert(logNow.keySet === breached.toSet)

      // crash window B: commit landed but the superseded plain day dirs
      // were never deleted — readers already serve the rewrite (the log
      // wins), and the next pass's recovery drops the debris
      val d0 = breached.head
      val resurrect = new java.io.File(root, s"day=$d0")
      org.apache.commons.io.FileUtils.copyDirectory(dayBackup, resurrect)
      assert(rowsNow() === rowsBefore,
        "a superseded plain day dir must be shadowed by the committed rewrite")
      Compaction.recoverLayout(root, staleMs = Long.MaxValue)
      assert(!resurrect.exists(),
        "recovery must reclaim a committed-over plain day dir (no age gate needed)")
      // and the pass stays idempotent from the committed state
      val (b2, _, a2) = Compaction.compactWhere(spark, root, budget)
      assert(b2.isEmpty && a2 === after)
      assert(rowsNow() === rowsBefore)
    } finally {
      graft.core.Sessions.sweepPersistedState(spark)
      org.apache.commons.io.FileUtils.deleteDirectory(base)
    }
  }

  test("planLayoutBy fails loudly on a zero or negative budget") {
    import graft.ops.Compaction
    val rows = eventRows().limit(10)
    for (bad <- Seq(0L, -5L)) {
      val e = intercept[Exception] {
        Compaction.planLayoutBy(rows, lit(bad)).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("byte budget must be >= 1")),
        s"budget=$bad must raise the guard, got: ${e.getMessage}")
    }
  }

  // ---- compaction under a live writer (r13 verdict #7) -------------------

  test("compact-under-append seam: closed days compact while the stream appends to open days") {
    import graft.ops.Compaction
    import graft.streaming.IngestPipeline
    val base = java.nio.file.Files.createTempDirectory("graft_seam").toFile
    val root = new java.io.File(base, "layout").getAbsolutePath
    try {
      val budget = 1024L
      val rows = eventRows()
      // litter EVERY day (the micro-batch debris shape)
      Compaction.writeLayout(Compaction.planLayoutBy(rows, lit(128L)), root)
      val days = rows.select(col("day")).distinct()
        .collect().map(_.getLong(0)).sorted
      val wm = days(days.length / 2) // watermark: days < wm are closed
      def rowsOf(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq.toList).groupBy(identity).view.mapValues(_.length).toMap
      val origRows = rowsOf(IngestPipeline.readShards(spark, root))
      def dayOf(p: String): Long =
        "day=(-?\\d+)".r.findFirstMatchIn(p).map(_.group(1).toLong).getOrElse(Long.MinValue)
      def layoutFiles(): Set[String] = {
        val fs = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
        try fs.toArray.map(_.toString).filter(_.endsWith(".parquet")).toSet
        finally fs.close()
      }
      val preFiles = layoutFiles()

      // the live writer: a real micro-batch stream of OPEN-day arrivals
      // (event_id shifted so appended rows are disjoint from the
      // layout's), publishing each batch into the live day dirs with
      // per-file ATOMIC renames — an appender that never exposes a
      // half-written file, the object-store visibility contract
      val src = new java.io.File(base, "src"); src.mkdirs()
      val srcStage = new java.io.File(base, "srcstage")
      spark.read.parquet(s"$dir/events.parquet")
        .filter(graft.queries.EventsQueries.epochDay(col("ts")) >= wm)
        .withColumn("event_id", col("event_id") + 10000000L)
        .repartition(8).write.parquet(srcStage.getAbsolutePath)
      srcStage.listFiles().filter(_.getName.endsWith(".parquet")).zipWithIndex
        .foreach { case (f, i) => java.nio.file.Files.move(f.toPath,
          new java.io.File(src, s"events_$i.parquet").toPath) }
      val appendStage = new java.io.File(base, "astage")
      val ev = graft.streaming.EventStream
        .readEventsWith(spark, src.getAbsolutePath, maxFilesPerTrigger = Some(1))
        .select(col("event_id"), col("user_id"),
          graft.queries.EventsQueries.epochDay(col("ts")).as("day"),
          col("event_type"), col("value"))
      val writeBatch: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
        (df, id) => {
          val staged = new java.io.File(appendStage, s"b$id")
          df.write.mode("overwrite").partitionBy("day").parquet(staged.getAbsolutePath)
          // each batch lands as its own file_idx leaf under the open
          // day — the micro-batch debris shape the layout's two-level
          // (day=/file_idx=) partitioning expects
          for (dd <- Option(staged.listFiles()).getOrElse(Array.empty[java.io.File])
                 if dd.getName.startsWith("day=");
               f <- dd.listFiles() if f.getName.endsWith(".parquet")) {
            val dstDir = new java.io.File(root, s"${dd.getName}/file_idx=${1000000L + id}")
            dstDir.mkdirs()
            java.nio.file.Files.move(f.toPath,
              new java.io.File(dstDir, s"append-$id-${f.getName}").toPath,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          }
        }
      val q = ev.writeStream.foreachBatch(writeBatch)
        .option("checkpointLocation", new java.io.File(base, "ckpt").getAbsolutePath)
        .start()
      // the maintenance pass runs WHILE the stream appends
      val breached =
        try Compaction.compactWhere(spark, root, budget, closed = _ < wm)._1
        finally { q.processAllAvailable(); q.stop() }
      // 1) the pass touched ONLY closed days
      assert(breached.nonEmpty && breached.forall(_ < wm),
        s"closed-day pass touched open days: $breached (wm=$wm)")
      // 2) every pre-existing open-day file survived, byte-path intact
      val postFiles = layoutFiles()
      val openPre = preFiles.filter(p => dayOf(p) >= wm)
      assert(openPre.subsetOf(postFiles),
        s"open-day files lost: ${openPre.diff(postFiles).take(3)}")
      // 3) conservation: layout rows == original + everything appended
      val appended = rowsOf(graft.core.Tables.events(spark, dir)
        .filter(graft.queries.EventsQueries.epochDay(col("ts")) >= wm)
        .select((col("event_id") + 10000000L).as("event_id"), col("user_id"),
          graft.queries.EventsQueries.epochDay(col("ts")).as("day"),
          col("event_type"), col("value")))
      val expected = (origRows.keySet ++ appended.keySet).map(k =>
        k -> (origRows.getOrElse(k, 0) + appended.getOrElse(k, 0))).toMap
      assert(rowsOf(IngestPipeline.readShards(spark, root)) === expected,
        "rows lost or duplicated under the concurrent append")
      // 4) closed days converged to the plan
      val expectClosed = Compaction.planLayout(
        IngestPipeline.readShards(spark, root).filter(col("day") < wm), budget)
        .select(col("day"), col("file_idx")).distinct().count()
      assert(postFiles.count(p => dayOf(p) < wm).toLong === expectClosed,
        "closed days must land exactly the plan's file set")
    } finally {
      graft.core.Sessions.sweepPersistedState(spark)
      org.apache.commons.io.FileUtils.deleteDirectory(base)
    }
  }

  // ---- OPTIMIZE ... ZORDER (r13 verdict #5) ------------------------------

  test("clustered OPTIMIZE: breached days z-packed, frozen basis, re-run no-op, pruning beats md5") {
    import graft.ops.{Compaction, Zorder}
    val base = java.nio.file.Files.createTempDirectory("graft_optz").toFile
    val zroot = new java.io.File(base, "zlayout").getAbsolutePath
    val mroot = new java.io.File(base, "mdlayout").getAbsolutePath
    try {
      val budget = 512L
      val rows = eventRows()
      val m = Compaction.zBasisOf(rows)
      val key = Compaction.zPackKey(m)
      // mixed start: even days packed at the z plan, odd days z-littered
      Compaction.writeLayout(Compaction.planLayoutBy(rows,
        when(col("day") % 2 === 0, lit(budget)).otherwise(lit(128L)), key), zroot, key)
      Zorder.writeManifest(zroot, m)
      val (breached, before, after) =
        Compaction.compactWhere(spark, zroot, budget, zorder = true)
      assert(breached.nonEmpty && breached.forall(_ % 2 == 1),
        s"only littered (odd) days may breach: $breached")
      assert(after.nFiles < before.nFiles)
      // the basis stays FROZEN: the pass loads the sidecar, never re-derives
      assert(Zorder.loadManifest(zroot) === m, "optimize must not rewrite the basis")
      // convergence: incremental == the full z plan's file set
      val expect = Compaction.planLayout(
        graft.streaming.IngestPipeline.readShards(spark, zroot), budget, key)
        .select(col("day"), col("file_idx")).distinct().count()
      assert(Compaction.layoutStats(zroot).nFiles === expect)
      // re-run: day-local census finds nothing, nothing moves
      val (b2, _, a2) = Compaction.compactWhere(spark, zroot, budget, zorder = true)
      assert(b2.isEmpty && a2 === after)
      // THE POINT of clustering: per-file min/max prunes a narrow
      // two-predicate box far better than the md5 shuffle pack — count
      // files a (user_id, event_id) box reader must open in each layout
      Compaction.writeLayout(
        Compaction.planLayout(rows, budget), mroot)
      def openCount(root: String, uLo: Long, uHi: Long, eLo: Long, eHi: Long) =
        Compaction.manifestClustered(spark, root).collect().count { r =>
          r.getLong(4) <= uHi && r.getLong(5) >= uLo &&
            r.getLong(6) <= eHi && r.getLong(7) >= eLo
        }
      val (uw, ew) = (m.mxa - m.mna, m.mxb - m.mnb)
      val (uLo, uHi) = (m.mna, m.mna + uw / 8)
      val (eLo, eHi) = (m.mnb, m.mnb + ew / 8)
      val zOpen = openCount(zroot, uLo, uHi, eLo, eHi)
      val mdOpen = openCount(mroot, uLo, uHi, eLo, eHi)
      val total = Compaction.layoutStats(zroot).nFiles
      info(s"box scan opens $zOpen of $total z files vs $mdOpen md5 files")
      assert(zOpen < mdOpen,
        s"z layout must prune harder than the md5 pack: $zOpen vs $mdOpen")
      assert(zOpen.toLong < total,
        "a 1/8-wide box must not open every z file")
    } finally {
      graft.core.Sessions.sweepPersistedState(spark)
      org.apache.commons.io.FileUtils.deleteDirectory(base)
    }
  }

  // ---- the trained index as a stored artifact (r13 verdict #2/#3) -------

  test("index artifact: stored chain equals a freshly trained chain; guards fire") {
    import graft.ops.{IndexArtifact, Similarity}
    try {
      val path = Similarity.sharedIndexPath(spark, dir, split = true)
      val m = IndexArtifact.loadManifest(path)
      val (gArrStored, rankedStored) = IndexArtifact.load(
        spark, path, m.probes, m.coarseGroups, verifyCounts = true)
      // the stored frames must be row-identical to training the same
      // population fresh — the artifact IS the chain, not a cache of
      // approximately it
      val pop = Similarity.vecs(spark, dir).filter(!Similarity.isDeltaVec)
      val (base, gArrFresh) = Similarity.trainedGroupArray(pop)
      val rankedFresh = Similarity.rankCellsTwoLevel(
        base, gArrFresh, "l2", m.coarseGroups, m.probes)
      def rset(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq.map(String.valueOf).toList).toSet
      assert(rset(rankedStored) === rset(rankedFresh),
        "stored ranking diverged from a fresh train")
      assert(gArrStored.collect().map(_.toString).toSeq ===
        gArrFresh.collect().map(_.toString).toSeq,
        "stored codebook diverged from a fresh train")
      assert(m.membershipRows === rankedStored.count())
      // a reader expecting different parameters must fail loudly
      intercept[IllegalArgumentException] {
        IndexArtifact.load(spark, path, m.probes + 1, m.coarseGroups)
      }
      // a manifest that disagrees with the stored tables must fail the
      // integrity check (simulated corruption on a COPY of the artifact)
      val tmp = java.nio.file.Files.createTempDirectory("graft_idx_corrupt").toFile
      try {
        org.apache.commons.io.FileUtils.copyDirectory(new java.io.File(path), tmp)
        java.nio.file.Files.writeString(
          new java.io.File(tmp, "_index_manifest.json").toPath,
          s"""{"probes":${m.probes},"coarseGroups":${m.coarseGroups},""" +
            s""""codebookRows":${m.codebookRows},"membershipRows":${m.membershipRows + 1}}""")
        intercept[IllegalArgumentException] {
          IndexArtifact.load(spark, tmp.getAbsolutePath, m.probes, m.coarseGroups,
            verifyCounts = true)
        }
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    } finally graft.core.Sessions.sweepPersistedState(spark)
  }

  test("index publish law: generation 2 = stored generation 1 + frozen-assigned arrivals") {
    import graft.ops.{IndexArtifact, Similarity}
    try {
      val path = Similarity.sharedIndexPath(spark, dir, split = true)
      val mm = IndexArtifact.loadManifest(path)
      val (gArr, ranked) = IndexArtifact.load(spark, path, mm.probes, mm.coarseGroups)
      val delta = Similarity.vecs(spark, dir).filter(Similarity.isDeltaVec)
      def mset(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq.map(String.valueOf).toList)
          .groupBy(identity).view.mapValues(_.length).toMap
      // the gate entry's published membership...
      val published = mset(SparkEntry.queries("s33_index_publish")(spark, dir))
      // ...must equal gen-1 membership + the delta's frozen assignment,
      // row for row — the append law through the disk round trip
      val law = mset(Similarity.membershipOf(ranked)
        .unionByName(Similarity.frozenAssign(delta, gArr)))
      assert(published === law, "publish diverged from the append law")
      // arrivals and corpus are disjoint: no vec_id may double-assign
      assert(published.values.forall(_ == 1), "a vec_id was published twice")
    } finally graft.core.Sessions.sweepPersistedState(spark)
  }

  // ---- degenerate histogram bins (r13 ADVICE #4) -------------------------

  test("histQuantileReport on a single-value column bins to 0, never null") {
    import spark.implicits._
    val li = (1 to 40)
      .map(i => (java.math.BigDecimal.valueOf(42.0), i.toLong, i))
      .toDF("l_extendedprice", "l_orderkey", "l_linenumber")
    try {
      val out = graft.queries.Relational3.histQuantileReport(li, 4).collect()
      assert(out.length === 3, "three percentile rows expected")
      for (r <- out) {
        assert(!r.isNullAt(r.fieldIndex("bin_match")),
          "degenerate column must not produce null bin_match")
        assert(r.getBoolean(r.fieldIndex("bin_match")),
          "constant column: every value sits in bin 0 on both legs")
        assert(r.getBoolean(r.fieldIndex("mass_ok")))
      }
    } finally graft.core.Sessions.sweepPersistedState(spark)
  }
}
