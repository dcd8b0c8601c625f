package graft.streaming

/** Compaction mutual exclusion for the batch-dir streams — ONE `.clock`
  * protocol shared by [[DedupStream]]/[[NearDupStream]] (same layout),
  * [[GraphStream]] and [[EvalStream]], replacing their three copies of
  * the round-13 check-then-create lock. Round-13 ADVICE + verdict #6
  * hardening, in order:
  *
  *  - ACQUISITION is an atomic create-if-absent
  *    ([[StreamFs.createExclusive]] — `CreateFlag.CREATE` without
  *    OVERWRITE fails when the file exists), so two compactors racing
  *    on a free lock can no longer both pass an `exists()` check and
  *    both "acquire". Reclaiming a STALE lock is a rename-aside first
  *    (`.clock` → `.clock.stale`): renames are atomic and fail for the
  *    loser, so at most one reclaimer proceeds to the create.
  *  - The holder HEARTBEATS the lock mtime from a daemon timer every
  *    [[HeartbeatMs]], and staleness means "no heartbeat for
  *    [[StaleMs]]" — NOT "running longer than a fixed budget". A
  *    100 TB NND refinement that runs for hours is never falsely
  *    declared crashed while its JVM lives; a genuinely dead holder
  *    stops heartbeating and is reclaimed after [[StaleMs]].
  *  - Ingest streams call [[requireFree]] at micro-batch entry: the
  *    "run compaction while the ingest is idle" scaladoc contract is
  *    now a loud [[IllegalStateException]] instead of an operational
  *    footgun (a concurrent root rename-aside would strand a mid-flight
  *    batch write). A STALE lock does not block ingest — recovery
  *    ([[DedupStream.recover]] et al.) sweeps the dead compactor's
  *    stage as before.
  *
  * Object-store note: create-if-absent maps to a conditional PUT where
  * the connector supports it; where it does not, the lock degrades to
  * best-effort advisory — the data-path protocols never depend on the
  * lock for correctness of COMMITTED state (markers do that), only for
  * not interleaving maintenance with ingest. */
object CompactionLock {

  /** Holder bumps the lock mtime this often (daemon timer). */
  val HeartbeatMs: Long = 60L * 1000
  /** No heartbeat for this long ⇒ the holder is dead; several missed
    * beats of slack over [[HeartbeatMs]] absorbs FS mtime granularity
    * and scheduler stalls. */
  val StaleMs: Long = 10L * 60 * 1000

  def lockPath(root: String): String = root + ".clock"

  /** True when the lock file exists but its holder stopped
    * heartbeating [[StaleMs]] ago. */
  def stale(lock: String): Boolean =
    StreamFs.modificationTime(lock)
      .forall(_ < System.currentTimeMillis() - StaleMs)

  /** A LIVE compaction holds this root's lock. */
  def heldLive(root: String): Boolean = {
    val lock = lockPath(root)
    StreamFs.exists(lock) && !stale(lock)
  }

  /** Ingest-side guard: throw while a live compaction holds the root.
    * (Verdict #6 — all compacting streams call this at micro-batch
    * entry.) */
  def requireFree(root: String, op: String): Unit =
    if (heldLive(root))
      throw new IllegalStateException(
        s"$op: a live compaction holds ${lockPath(root)} — " +
          "run maintenance while the ingest is idle")

  /** Acquire the root's lock atomically (reclaiming a stale one via
    * rename-aside), heartbeat while `body` runs, release. Throws
    * [[java.io.IOException]] when a live holder exists. */
  def withLock[T](root: String)(body: => T): T = {
    val lock = lockPath(root)
    if (StreamFs.exists(lock)) {
      if (!stale(lock))
        throw new java.io.IOException(
          s"compaction already in progress: $lock")
      // dead holder: rename-aside (atomic; one winner), then create
      val aside = lock + ".stale"
      StreamFs.delete(aside)
      StreamFs.renameOrThrow(lock, aside)
      StreamFs.delete(aside)
    }
    StreamFs.createExclusive(lock)
    val hb = new java.util.Timer("graft-compact-heartbeat", true)
    hb.scheduleAtFixedRate(new java.util.TimerTask {
      override def run(): Unit =
        try StreamFs.touch(lock) catch { case _: Exception => () }
    }, HeartbeatMs, HeartbeatMs)
    try body
    finally { hb.cancel(); StreamFs.delete(lock) }
  }
}
