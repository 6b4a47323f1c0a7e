package graft.sources

/** Write-once materialization of derived storage layouts (tmpfs —
  * derived data, safe to drop), shared by the date-partitioned event
  * layout ([[Partitioned.eventsFor]]) and the ORC mirror
  * ([[OrcMirror.documentsFor]]).
  *
  * Contract (the round-5 [[Partitioned]] discipline, factored out):
  * idempotent and crash/concurrency-safe. The builder writes to a
  * PRIVATE temp directory and the result is atomically renamed into
  * place, so a reader can never observe a half-written layout and
  * concurrent driver JVMs can't clobber each other mid-write — the
  * loser of the rename race discards its (bitwise-identical, builds
  * are deterministic) copy. The `_SUCCESS` marker only ever exists
  * inside a fully-landed rename, so its presence is a sound re-build
  * gate; a directory WITHOUT it is a crashed pre-rename leftover and
  * is rebuilt. The cache key fingerprints the source files
  * (name/size/mtime), so a regenerated fixture at the same path lands
  * a fresh layout instead of silently serving the stale one.
  */
object Materialize {

  /** Root for materialized layouts: tmpfs, like the bench warehouse. */
  val Root = "/dev/shm/graft-partitioned"

  private val landed =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Per-path build locks: independent layouts (events partitioning vs
    * the ORC mirror, different corpora) build concurrently; only
    * same-path callers serialize.
    */
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Fingerprint of a source file or directory (name/size/mtime per
    * entry) — the staleness component of the layout cache key.
    */
  def stampOf(src: java.nio.file.Path): String =
    if (!java.nio.file.Files.exists(src)) "absent"
    else if (java.nio.file.Files.isDirectory(src)) {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(src)
      try s.iterator().asScala
        .map(p => s"${p.getFileName}:${java.nio.file.Files.size(p)}:" +
          s"${java.nio.file.Files.getLastModifiedTime(p).toMillis}")
        .toSeq.sorted.mkString("|")
      finally s.close()
    } else s"${java.nio.file.Files.size(src)}:" +
      s"${java.nio.file.Files.getLastModifiedTime(src).toMillis}"

  /** Ensure the layout `name` derived from `srcFile` (under corpus
    * `dir`) is landed, building it at most once per (source
    * fingerprint); returns the landed directory. `build` writes the
    * layout to the given PRIVATE temp path; it must be deterministic
    * (rename-race losers assume identical bytes).
    */
  def once(dir: String, name: String, srcFile: String)
      (build: String => Unit): String = {
    val stamp = stampOf(java.nio.file.Paths.get(srcFile))
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir|$stamp".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(12)
    val path = s"$Root/$key/$name"
    locks.computeIfAbsent(path, _ => new Object).synchronized {
      if (!landed.contains(path)) {
        val dst = java.nio.file.Paths.get(path)
        val marker = dst.resolve("_SUCCESS")
        if (!java.nio.file.Files.exists(marker)) {
          // build the layout FIRST, then decide whether dst still needs
          // clearing: the in-process lock doesn't cover other JVMs, so a
          // concurrent writer's atomic rename can land a valid layout at
          // any moment — re-checking the marker immediately before the
          // delete closes the check-then-delete window (we never clobber
          // a layout that landed after the outer check; marker-less dst
          // is a crashed pre-rename leftover no JVM ever reads)
          val tmp = dst.resolveSibling(
            s".tmp-$name-${java.util.UUID.randomUUID().toString.take(13)}")
          build(tmp.toString)
          if (!java.nio.file.Files.exists(marker)) {
            deleteRecursively(dst)
            try
              java.nio.file.Files.move(tmp, dst,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            catch {
              // either another JVM landed the (deterministic, identical)
              // layout between our delete and rename — keep theirs — or
              // the move failed outright (permissions, cross-filesystem
              // ATOMIC_MOVE): distinguish by the marker, and rethrow the
              // original failure rather than surfacing later as an
              // unrelated read error on an absent layout
              case e: java.nio.file.FileSystemException =>
                if (java.nio.file.Files.exists(marker)) deleteRecursively(tmp)
                else throw e
            }
          } else deleteRecursively(tmp) // concurrent JVM won; identical bytes
        }
        landed.add(path)
      }
    }
    path
  }

  def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }
}
