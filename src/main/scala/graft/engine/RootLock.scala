package graft.engine

/** Per-maintenance-root mutual exclusion, shared by every maintained
  * on-disk index family (the IVF/residual vector roots in
  * queries/Vectors.scala and the bucketed text indexes in
  * sources/Bucketed.scala / queries/Text.scala). The staged-write
  * protocols are crash-safe but NOT concurrency-safe on their own: a
  * writer racing another writer's pre-commit state can delete the only
  * copy of in-flight rows (see the flush-protocol note at
  * Vectors.withRootLock's call sites), and two bucketed appends can
  * interleave catalog inserts. Every maintenance entry point serializes
  * on TWO nested layers:
  *
  *  1. the root's JVM monitor (cheap, reentrancy-tracked) —
  *     intra-process exclusion;
  *  2. an exclusive POSIX file lock on `$root/.maintlock` (the C5 flock
  *     pattern from engine/Cache.scala) — CROSS-PROCESS exclusion,
  *     because the repo's own tooling runs a second JVM against the
  *     same roots (runtool alongside sbt is the committed launcher's
  *     stated purpose). Blocking lock, not tryLock: maintenance ops are
  *     short and callers want the op done, not an error
  *     (IvfRootFlockSpec pins that a second process's holder stalls
  *     maintenance until release).
  *
  * The file lock engages only for local (`file:`/schemeless) roots —
  * POSIX locks don't exist on HDFS/S3. A multi-process writer topology
  * on an object store coordinates through the lease-file protocol
  * ([[Lease]]) when `GRAFT_IVF_LEASE_TTL_MS` is set; otherwise the
  * contract fails LOUD: maintenance refuses to run unless the operator
  * acknowledges a single-writer topology (`GRAFT_IVF_SINGLE_WRITER=1`).
  * (The knobs keep their historical `IVF` names — they were introduced
  * for the vector roots — but govern every maintained root.) Readers of
  * committed files take no lock either way.
  */
object RootLock {

  private val rootLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private val heldRootLocks = ThreadLocal.withInitial[
    scala.collection.mutable.Set[String]](
    () => scala.collection.mutable.Set.empty[String])

  /** Whether a root lives on the local filesystem (where POSIX locks
    * exist and toRealPath canonicalization applies).
    */
  private def isLocalRoot(root: String): Boolean = {
    val scheme = new org.apache.hadoop.fs.Path(root).toUri.getScheme
    scheme == null || scheme == "file"
  }

  /** Canonical key for a maintenance root. Local roots resolve through
    * the FILESYSTEM (toRealPath when the dir exists, normalized absolute
    * path otherwise — resolution is read-only: pure readers like
    * loadCurve must never mkdir a mistyped root): "file:/tmp/idx",
    * "/tmp/idx", "/tmp/idx/" and a symlinked spelling of the same inode
    * fold to ONE key. Non-local roots keep their SCHEME AND AUTHORITY —
    * s3a://bucketA/idx and s3a://bucketB/idx are different roots and
    * must not share a cache entry or a reentrancy key (folding them
    * over-locks safely, but per-root VALUE caches keyed by this — the
    * curve/residual memos — would serve the wrong index's state on a
    * collision).
    */
  def canonicalRoot(root: String): String = {
    val uri = new org.apache.hadoop.fs.Path(root).toUri
    if (!isLocalRoot(root))
      s"${uri.getScheme}://${Option(uri.getAuthority).getOrElse("")}${uri.getPath}"
    else {
      val p = java.nio.file.Paths.get(uri.getPath)
      if (java.nio.file.Files.exists(p)) p.toRealPath().toString
      else p.toAbsolutePath.normalize().toString
    }
  }

  def withRoot[T](root: String)(body: => T): T = {
    val uri = new org.apache.hadoop.fs.Path(root).toUri
    val local = isLocalRoot(root)
    // the lock places a file under the root: ensure it exists BEFORE
    // canonicalizing so the key is the realpath (symlink-folded), not
    // the normalized fallback a not-yet-created root would get
    if (local)
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(uri.getPath))
    val key = canonicalRoot(root)
    // cross-process exclusion strategy for this root: local → POSIX
    // flock; non-local with a TTL configured → the lease-file protocol
    // (engine/Lease.scala: create-if-absent + owner + TTL + renewal);
    // non-local otherwise → fail LOUD unless the operator acknowledges
    // a single-writer topology. `graft.ivf.lease.force` routes LOCAL
    // roots through the lease too, so the wiring is testable end-to-end
    // without an object store.
    val useLease = leaseTtlMs.isDefined && (!local || leaseForce)
    if (!local && !useLease)
      // POSIX locks don't exist off the local FS: a silent no-op here
      // would let two writers on an object-store root replay the
      // recovery-deletes-live-flush race with no warning.
      require(singleWriterAck,
        s"maintenance root $root is non-local ($uri): cross-process " +
          "locking is unavailable off the local filesystem. Set " +
          "GRAFT_IVF_LEASE_TTL_MS=<ms> to coordinate writers through " +
          "the lease-file protocol, or GRAFT_IVF_SINGLE_WRITER=1 to " +
          "acknowledge a single-writer topology")
    rootLocks.computeIfAbsent(key, _ => new Object).synchronized {
      // reentrant: nested maintenance calls (stageInsert → recoverFlush)
      // already hold this thread's process lock — a second fcntl lock
      // from the same JVM would throw OverlappingFileLockException
      if (heldRootLocks.get().contains(key)) body
      else {
        val ch = if (!local || useLease) None else {
          val c = java.nio.channels.FileChannel.open(
            java.nio.file.Paths.get(key).resolve(".maintlock"),
            java.nio.file.StandardOpenOption.CREATE,
            java.nio.file.StandardOpenOption.WRITE)
          // a lock() failure (interrupt, overlapping-lock pathology the
          // canonical key didn't fold) must not leak the open channel
          try c.lock() // blocks until any other PROCESS's holder releases
          catch { case t: Throwable => c.close(); throw t }
          Some(c)
        }
        heldRootLocks.get().add(key)
        try {
          if (useLease) {
            val conf = org.apache.spark.sql.SparkSession.getActiveSession
              .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
              .map(_.sparkContext.hadoopConfiguration)
              .getOrElse(new org.apache.hadoop.conf.Configuration())
            val lp = new org.apache.hadoop.fs.Path(root, ".maintlease")
            Lease.withLease(
              lp.getFileSystem(conf), lp, Lease.jvmOwner, leaseTtlMs.get)(body)
          } else body
        } finally {
          heldRootLocks.get().remove(key)
          ch.foreach(_.close()) // close releases the lock
        }
      }
    }
  }

  /** Lease TTL for non-local maintenance roots (`GRAFT_IVF_LEASE_TTL_MS`
    * / prop `graft.ivf.lease.ttl.ms`): size it to dominate both the
    * longest maintenance op (renewal halves the risk) and the store's
    * metadata consistency lag.
    */
  private def leaseTtlMs: Option[Long] =
    sys.env.get("GRAFT_IVF_LEASE_TTL_MS")
      .orElse(sys.props.get("graft.ivf.lease.ttl.ms")).map(_.toLong)

  private def leaseForce: Boolean =
    sys.env.get("GRAFT_IVF_LEASE_FORCE")
      .orElse(sys.props.get("graft.ivf.lease.force")).contains("1")

  /** Operator acknowledgment that exactly one process maintains non-local
    * maintenance roots (`GRAFT_IVF_SINGLE_WRITER=1`; the system property
    * is the spec hook — env vars are immutable in-JVM).
    */
  private def singleWriterAck: Boolean =
    sys.env.get("GRAFT_IVF_SINGLE_WRITER")
      .orElse(sys.props.get("graft.ivf.single.writer"))
      .contains("1")
}
