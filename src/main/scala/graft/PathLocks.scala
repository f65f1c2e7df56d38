package graft

/** Process-wide exclusive locks keyed by a path string — the one lock
  * machinery behind both the store's commit lock
  * ([[graft.memo.MemoEngine]]) and the artifact build lock
  * ([[graft.ops.ArtifactMeta.withBuildLock]]), kept in one place so the
  * subtle parts (monitor-then-OS-lock ordering, re-entrancy, release on
  * every path) cannot drift between copies.
  *
  * Two layers per acquisition:
  *  - a JVM monitor per key — threads sharing a driver queue here; also
  *    required because OS file locks are held per JVM (a second
  *    FileChannel.lock in the same JVM throws OverlappingFileLockException
  *    rather than queueing);
  *  - optionally an OS file lock — separate JVMs on a shared filesystem
  *    queue here, and the OS releases it if the holder dies, so a crashed
  *    holder can never wedge the resource the way a lock FILE would.
  *
  * Re-entrant per (thread, key): a thread already inside `exclusive(key)`
  * runs nested bodies directly (the IfAbsent-calls-write-primitive shape).
  * The monitor map holds one bare Object per distinct key the JVM ever
  * touches — bytes per key, not a handle cache, so no eviction is needed.
  */
private[graft] object PathLocks {

  private val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private val held: ThreadLocal[scala.collection.mutable.Set[String]] =
    ThreadLocal.withInitial(() => scala.collection.mutable.Set.empty[String])

  /** Run `f` holding the exclusive lock for `key`. `osLockFile`, when set,
    * is created (with parents) and file-locked for cross-process
    * exclusion — pass it when the resource lives on a local filesystem;
    * object stores with no lock primitive pass None and get JVM-only
    * serialization (the external-coordinator boundary, same as Delta's
    * LogStore). */
  def exclusive[T](key: String,
      osLockFile: Option[java.nio.file.Path])(f: => T): T = {
    if (held.get.contains(key)) return f
    val monitor = monitors.computeIfAbsent(key, _ => new Object)
    monitor.synchronized {
      held.get += key
      try osLockFile match {
        case Some(p) =>
          Option(p.getParent)
            .foreach(java.nio.file.Files.createDirectories(_))
          val ch = java.nio.channels.FileChannel.open(p,
            java.nio.file.StandardOpenOption.CREATE,
            java.nio.file.StandardOpenOption.WRITE)
          try {
            val lock = ch.lock()
            try f finally lock.release()
          } finally ch.close()
        case None => f
      } finally held.get -= key
    }
  }
}
