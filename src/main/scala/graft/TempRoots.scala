package graft

/** Temp-directory registry for declared queries that must materialize
  * real on-disk state (q46b's pipeline source/target/ledger, q71's IVF
  * index, x21b's LSH index). Each bench/verify invocation creates a fresh
  * root, so without cleanup a round's repeated runs accumulate disk under
  * /tmp for the lifetime of the box (ADVICE r12). Deleting eagerly inside
  * the query body would be WRONG: the returned DataFrame is lazy and
  * re-reads the parquet whenever the driver consumes it (possibly more
  * than once — the bench runs each query repeatedly). One JVM shutdown
  * hook deletes every registered root instead: the files outlive every
  * possible evaluation of the plan, and the cleanup is bounded by the
  * JVM's own allocations, not /tmp history.
  */
object TempRoots {
  private val roots =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  // registered at most once, on first use
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var r = roots.poll()
      while (r != null) { deleteRecursively(r); r = roots.poll() }
    }))

  private def deleteRecursively(root: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try {
        walk.sorted(java.util.Comparator.reverseOrder())
          .forEach { p =>
            try Files.deleteIfExists(p)
            catch { case _: java.io.IOException => () } // best-effort at exit
          }
      } finally walk.close()
    }
  }

  /** Create a temp directory that is removed when this JVM exits. */
  def create(prefix: String): String = {
    hookInstalled
    val p = java.nio.file.Files.createTempDirectory(prefix)
    roots.add(p)
    p.toString
  }
}
