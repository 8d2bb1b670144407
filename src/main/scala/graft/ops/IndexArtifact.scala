package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The trained ANN index as an ON-DISK ARTIFACT — the relational form
  * of a FAISS index file: the codebook (one nested-group-array row, the
  * broadcast every probe fold rides) and the corpus membership/probe
  * ranking (vec_id, crn, cid — crn 1 is the membership cell, 1..probes
  * the probe list), each a parquet table, plus a `_index_manifest.json`
  * sidecar carrying the parameters the layout was trained under (the
  * [[Zorder]] sidecar discipline: a reader that re-derives parameters
  * from memory silently mis-probes; the artifact carries its own).
  *
  * Production trains ONCE, persists this artifact, and every serving
  * node loads it — retraining inside each query is the stateless-gate
  * shape, not the deployment shape (round-13 verdict #1 gap). The
  * write/load/verify lifecycle is certified by the s32 gate entry
  * (serves s30's answers FROM the stored artifact, same oracle) and by
  * Round14Spec round-trip pins.
  *
  * Scale shape: the codebook is one row (K·Dim doubles — broadcast
  * currency); membership is corpus×probes rows written once as a plain
  * columnar table and read back with filter pushdown (crn = 1 prunes to
  * the membership leg); no load-time pass touches the raw corpus.
  */
object IndexArtifact {

  private val ManifestFile = "_index_manifest.json"

  /** The parameters a stored index was built under. `probes` and
    * `coarseGroups` bind the ranking's semantics; the row counts let a
    * loader (or the s32 gate) verify integrity without re-training.
    */
  case class Manifest(probes: Int, coarseGroups: Int,
                      codebookRows: Long, membershipRows: Long)

  /** Persist codebook + membership under `path` and return the written
    * manifest. Overwrites any prior artifact at the path (idempotent —
    * re-writing the same trained frames lands the identical artifact).
    *
    * The write is STAGED (round-14 ADVICE): tables and manifest land in
    * a random `.tmp-*` sibling first, then the finished directory swaps
    * into place. The guarantee is CRASH-safety only: at every crash
    * point at least one complete artifact exists at or beside the path
    * (the prior artifact is renamed aside before the staged one moves
    * in, and only then deleted). It is NOT concurrent-reader-safe —
    * between the aside-rename and the move-in nothing exists at `path`,
    * so a reader resolving the bare path in that window gets
    * FileNotFound (round-15 ADVICE). Concurrent-reader safety requires
    * resolving through [[IndexGenerations]]' commit log, where
    * generation dirs are write-once and never republished in place.
    * This rename-based path is for PROCESS-PRIVATE store dirs
    * ([[graft.core.ProcessStore]] — local scratch by contract); the
    * shared-store publish path is [[writeFresh]] + the commit log,
    * which performs no renames at all.
    */
  def write(s: SparkSession, path: String, codebook: DataFrame,
            membership: DataFrame, probes: Int, coarseGroups: Int): Manifest = {
    val dst = new java.io.File(path)
    Option(dst.getParentFile).foreach(_.mkdirs())
    val tmp = new java.io.File(dst.getParentFile,
      dst.getName + ".tmp-" + java.util.UUID.randomUUID())
    val m =
      try {
        codebook.write.mode("overwrite").parquet(s"$tmp/codebook")
        membership.write.mode("overwrite").parquet(s"$tmp/membership")
        val mm = Manifest(probes, coarseGroups,
          s.read.parquet(s"$tmp/codebook").count(),
          s.read.parquet(s"$tmp/membership").count())
        java.nio.file.Files.writeString(
          new java.io.File(tmp, ManifestFile).toPath,
          s"""{"probes":${mm.probes},"coarseGroups":${mm.coarseGroups},""" +
            s""""codebookRows":${mm.codebookRows},"membershipRows":${mm.membershipRows}}""")
        mm
      } catch {
        case t: Throwable =>
          try org.apache.commons.io.FileUtils.deleteDirectory(tmp)
          catch { case _: Throwable => () }
          throw t
      }
    val aside = new java.io.File(dst.getParentFile,
      dst.getName + ".old-" + java.util.UUID.randomUUID())
    if (dst.exists()) java.nio.file.Files.move(dst.toPath, aside.toPath)
    java.nio.file.Files.move(tmp.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    if (aside.exists()) org.apache.commons.io.FileUtils.deleteDirectory(aside)
    m
  }

  /** Persist codebook + membership into `path`, which must not yet
    * exist — the COMMIT-LOG face of the writer (round-15 verdict #1):
    * plain writes only, no staging, no rename, because visibility is
    * the caller's commit protocol ([[IndexGenerations.publish]] stages
    * into a uniquely-named dir that no reader can resolve until the
    * write-once commit file names it). Object-store-safe by
    * construction: nothing here needs an atomic rename or a consistent
    * listing.
    */
  def writeFresh(s: SparkSession, path: String, codebook: DataFrame,
                 membership: DataFrame, probes: Int, coarseGroups: Int): Manifest = {
    val dst = new java.io.File(path)
    require(!dst.exists(), s"writeFresh target already exists: $path")
    Option(dst.getParentFile).foreach(_.mkdirs())
    codebook.write.parquet(s"$path/codebook")
    membership.write.parquet(s"$path/membership")
    val m = Manifest(probes, coarseGroups,
      s.read.parquet(s"$path/codebook").count(),
      s.read.parquet(s"$path/membership").count())
    java.nio.file.Files.writeString(
      new java.io.File(dst, ManifestFile).toPath,
      s"""{"probes":${m.probes},"coarseGroups":${m.coarseGroups},""" +
        s""""codebookRows":${m.codebookRows},"membershipRows":${m.membershipRows}}""")
    m
  }

  def loadManifest(path: String): Manifest = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new java.io.File(path, ManifestFile))
    Manifest(node.get("probes").asInt, node.get("coarseGroups").asInt,
      node.get("codebookRows").asLong, node.get("membershipRows").asLong)
  }

  /** Load (codebook, membership) from a stored artifact. Fails loudly
    * when the artifact was trained under different probe/coarse-group
    * parameters than the reader expects (Zorder's zbits rule), or —
    * with `verifyCounts` — when the stored tables disagree with the
    * manifest's row counts (the gate-entry integrity check; costs two
    * metadata-cheap columnar counts, so serving paths skip it).
    */
  def load(s: SparkSession, path: String, probes: Int, coarseGroups: Int,
           verifyCounts: Boolean = false): (DataFrame, DataFrame) = {
    val m = loadManifest(path)
    require(m.probes == probes && m.coarseGroups == coarseGroups,
      s"index trained at probes=${m.probes}/coarse=${m.coarseGroups}, " +
        s"reader expects probes=$probes/coarse=$coarseGroups")
    val codebook = s.read.parquet(s"$path/codebook")
    val membership = s.read.parquet(s"$path/membership")
    if (verifyCounts) {
      val (cb, mb) = (codebook.count(), membership.count())
      require(cb == m.codebookRows && mb == m.membershipRows,
        s"stored index corrupt: codebook $cb/${m.codebookRows} rows, " +
          s"membership $mb/${m.membershipRows} rows vs manifest")
    }
    (codebook, membership)
  }
}
