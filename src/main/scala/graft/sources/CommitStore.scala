package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The two storage primitives [[GenCommit]]'s atomicity rests on,
  * behind a seam (VERDICT r17 #3 — Delta's LogStore shape): every
  * fence in the protocol is one [[createExclusive]] (claims, commit
  * markers), and every staged promotion one [[promote]]. HDFS-semantics
  * stores (HDFS, local FS, ABFS, GCS) get both natively
  * ([[HdfsCommitStore]], the default); raw S3-style stores implement
  * create-exclusive as check-then-act, so two racing claimants can both
  * "win" — [[LockingCommitStore]] restores the fence through an
  * external mutex (a conditional-put table, a lock file service —
  * DynamoDB in S3A's committers), which is the ONLY primitive such a
  * store must add:
  *
  *  - PROMOTE needs no atomicity here. A non-atomic rename (S3's
  *    copy+delete) can expose a partial generation dir, but the
  *    protocol never reads one: a generation is invisible AND unread
  *    (partition-pruned) until its commit MARKER exists, and the marker
  *    is created — through the fence — only after every promote
  *    returned. The one rename-as-fence hazard (two racing renames
  *    nesting dirs) is already excluded because only the claim's owner
  *    ever renames.
  *  - The fence must be a real mutex on the PATH: [[createExclusive]]
  *    returns true for exactly one caller per path, ever. The lock
  *    adapter holds the mutex only around the check-then-create window
  *    — contention cost is one lock round-trip per claim, the extra
  *    bill SCALE.md records.
  *
  * Selected process-wide via [[GenCommit.store]] (a deployment choice,
  * like the Hadoop FS itself); the fault-injection matrix in
  * GenCommitSpec drives both adapters through both kill points.
  */
trait CommitStore {

  /** Atomic create-exclusive: true iff THIS call created the file —
    * the claim/marker fence.
    */
  def createExclusive(f: FileSystem, p: Path): Boolean

  /** Promote a fully-staged directory into the table tree. Need not be
    * atomic (see class doc); must be VISIBLE-ON-RETURN (the marker is
    * fenced in after it).
    */
  def promote(f: FileSystem, src: Path, dst: Path): Boolean
}

/** The HDFS-semantics adapter (default): native atomic create
  * (O_CREAT|O_EXCL locally, NameNode-atomic elsewhere) and native
  * rename.
  */
object HdfsCommitStore extends CommitStore {

  override def createExclusive(f: FileSystem, p: Path): Boolean = f match {
    case _: org.apache.hadoop.fs.LocalFileSystem |
         _: org.apache.hadoop.fs.RawLocalFileSystem =>
      val file = new java.io.File(p.toUri.getPath)
      val parent = file.getParentFile
      if (parent != null) parent.mkdirs()
      file.createNewFile()
    case other =>
      try { other.create(p, false).close(); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.io.IOException if other.exists(p) => false
      }
  }

  override def promote(f: FileSystem, src: Path, dst: Path): Boolean =
    f.rename(src, dst)
}

/** The conditional-put adapter for stores WITHOUT atomic
  * create-exclusive: `tryLock(key)` must atomically grant the named
  * mutex to exactly one caller (a DynamoDB conditional put, a lock
  * service row — the external primitive every lake format requires on
  * raw S3); `unlock` releases it. Under the held mutex the adapter runs
  * the plain check-then-create, which is now race-free per path. The
  * mutex is keyed by the file's full path string and never needs to
  * outlive the call.
  */
class LockingCommitStore(tryLock: String => Boolean,
    unlock: String => Unit,
    waitBudgetMs: Long = 30000L) extends CommitStore {

  override def createExclusive(f: FileSystem, p: Path): Boolean = {
    val key = p.toString
    // TIME-bounded wait on the mutex with exponential backoff + jitter
    // (ADVICE r18 low: a fixed 1000 × 2 ms spin gave up after ~2 s and
    // blamed a dead lock-holder — legitimate contention on a slow
    // external lock service exceeds that and failed commits spuriously;
    // the budget is a constructor choice, default 30 s). Losing the
    // LOCK race is not losing the CREATE race — the loser must still
    // observe the winner's outcome.
    val deadline = System.nanoTime() + waitBudgetMs * 1000000L
    var delayMs = 2L
    while (!tryLock(key)) {
      if (System.nanoTime() >= deadline) throw new IllegalStateException(
        s"LockingCommitStore: could not acquire the commit mutex for " +
          s"$key within $waitBudgetMs ms — a dead lock-holder (clear " +
          "the lock service entry) or a wait budget too small for this " +
          "lock service's latency (raise waitBudgetMs)")
      Thread.sleep(delayMs + java.util.concurrent.ThreadLocalRandom
        .current().nextLong(delayMs))
      delayMs = math.min(delayMs * 2, 200L)
    }
    try {
      if (f.exists(p)) false
      else { f.create(p, true).close(); true }
    } finally unlock(key)
  }

  // a plain (possibly copy+delete) rename is sufficient — see the
  // trait doc for why promote needs no atomicity in this protocol
  override def promote(f: FileSystem, src: Path, dst: Path): Boolean =
    f.rename(src, dst)
}
