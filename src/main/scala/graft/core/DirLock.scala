package graft.core

/** Advisory per-directory mutual exclusion for read-modify-write
  * maintenance of on-disk state (version-chain commits, ANN generation
  * swaps). Two layers, both required:
  *  - a JVM-level ReentrantLock per (canonical dir, lock-file name) —
  *    JDK file locks are held per-PROCESS, so a second `lock()` on the
  *    same file from another thread of this JVM would throw
  *    OverlappingFileLockException instead of blocking;
  *  - an OS `FileChannel` lock on `<dir>/<name>` for cross-process
  *    writers (a library appender racing a serve process). The OS
  *    releases it when a holder crashes, so stale locks cannot wedge
  *    the directory.
  * Reentrant: nested acquisitions of the same (dir, name) from one
  * thread share the outermost file lock (depth-counted).
  *
  * READERS never take these locks — writers keep their commit protocol
  * of atomic pointer renames, so readers always see a complete state.
  *
  * ==Supported deployment envelope==
  * Multi-process WRITE coordination assumes every writer sees ONE
  * shared POSIX filesystem (local disk, or an NFS mount with working
  * advisory locks): `FileChannel` locks, atomic renames, and directory
  * listings are the primitives the commit protocol is built on —
  * matching the reference's single-node deployment shape. On OBJECT
  * STORAGE none of these exist (no advisory locks, no atomic rename):
  * two serve processes pointed at the same s3/gcs-backed chain would
  * silently race their pointer flips again, so chains there need a
  * conditional-PUT (compare-and-swap) coordination layer this library
  * does not provide. READERS are safe on any storage — they only ever
  * resolve a complete pointer file and immutable layer dirs.
  */
object DirLock {

  private final class Lk {
    val mu = new java.util.concurrent.locks.ReentrantLock()
    var depth = 0
    var ch: java.nio.channels.FileChannel = null
    var fl: java.nio.channels.FileLock = null
  }
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Lk]()

  def withLock[A](dir: String, name: String)(body: => A): A = {
    val d = new java.io.File(dir)
    d.mkdirs()
    val lk = locks.computeIfAbsent((d.getCanonicalPath, name), _ => new Lk)
    lk.mu.lock()
    try {
      if (lk.depth == 0) {
        lk.ch = java.nio.channels.FileChannel.open(
          new java.io.File(d, name).toPath,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try lk.fl = lk.ch.lock()
        catch { case t: Throwable => lk.ch.close(); lk.ch = null; throw t }
      }
      lk.depth += 1
      try body
      finally {
        lk.depth -= 1
        if (lk.depth == 0) {
          try lk.fl.release() finally lk.ch.close()
          lk.fl = null; lk.ch = null
        }
      }
    } finally lk.mu.unlock()
  }
}
