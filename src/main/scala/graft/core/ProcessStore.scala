package graft.core

/** Build-once, per-process keyed artifact directories — the ONE
  * implementation of "synchronized key → UUID-named dir under a
  * process-random temp base, reclaimed by a shutdown hook" that the
  * label store ([[graft.ops.Graph.materializedOnce]]), the trained
  * index store ([[graft.ops.Similarity]]), and the compaction bench
  * fixtures ([[graft.streaming.IngestPipeline]]) all ride. Round 14
  * grew three parallel copies of this pattern; a fix to the lifecycle
  * (locking, cleanup, key derivation) now lands once.
  *
  * Per-process scoping is the safety contract: a regenerated testdata
  * directory can never serve stale artifacts across JVM runs, and the
  * random base means concurrent gate + bench processes can never race
  * each other's paths (the round-13 ADVICE tmpdir race). Callers fold
  * an input fingerprint ([[Tables.fileFingerprint]]) into the key to
  * catch an input rewritten under the SAME path within one process.
  */
object ProcessStore {

  private lazy val base: java.io.File = {
    val f = java.nio.file.Files.createTempDirectory("graft_store").toFile
    // deleteOnExit is a no-op on non-empty directories — a recursive
    // shutdown hook is what actually reclaims the store
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try org.apache.commons.io.FileUtils.deleteDirectory(f)
      catch { case _: Throwable => () }))
    f
  }
  private val paths = scala.collection.mutable.HashMap[String, String]()

  /** The directory for `key`, building it on first request; every
    * later request returns the same path without re-building. `build`
    * runs under the store lock, so concurrent first requests for one
    * key build exactly once.
    */
  def once(key: String)(build: java.io.File => Unit): String =
    paths.synchronized {
      paths.getOrElseUpdate(key, {
        val f = new java.io.File(base,
          java.util.UUID.nameUUIDFromBytes(key.getBytes("UTF-8")).toString)
        build(f)
        f.getAbsolutePath
      })
    }

  /** A named scratch path under the store base (per-process random,
    * reclaimed at exit) — for working copies and per-run outputs that
    * are rebuilt rather than cached.
    */
  def scratch(name: String): java.io.File = new java.io.File(base, name)
}
