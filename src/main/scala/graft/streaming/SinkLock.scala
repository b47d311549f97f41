package graft.streaming

import org.apache.spark.sql.SparkSession

/** Single-writer exclusion for an on-disk sink root — the lock-file +
  * JVM-liveness discipline extracted from the metric store so it
  * exists exactly once and the corpus sink
  * ([[graft.sources.CorpusIO]]) can carry the same guard: without it,
  * a compact's verified double-rename can race a live ingest query's
  * `foreachBatch` — the second rename lands under a recreated primary
  * directory and the backup holding the only full copy is deleted on
  * the "success" path.
  *
  * Mechanism: a lock FILE next to the data names the live holder — an
  * ingest query's runId or a compact's `compact:<uuid>` token (a
  * runId is a bare UUID and can never collide with the prefix).
  * Liveness is probed JVM-globally ([[HtaStore.runIsActive]] /
  * [[HtaStore.compactIsActive]]) — per-session `spark.streams.active`
  * alone would miss a writer started from a sibling session — so a
  * lock left by a crashed or cleanly-stopped holder is detected as
  * stale and cleared by the next acquire. Read-check-write sequences
  * are made atomic within the JVM by the per-root monitor
  * ([[HtaStore.rootMonitor]]); the JVM is the honest exclusion scope
  * in local mode, and multi-driver deployments need an external
  * coordinator (the transactional-table-format story, SCALE.md §1).
  *
  * `what` names the protected thing in diagnostics ("store",
  * "corpus sink"); tests pin the "live" / "live ingest query" /
  * "compaction" phrases.
  */
private[graft] final class SinkLock(root: String, what: String) {

  private def lockFile = new org.apache.hadoop.fs.Path(s"$root/ingest.lock")

  private def fs(spark: SparkSession) = {
    val p = lockFile
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def lockedToken(spark: SparkSession): Option[String] = {
    val (hfs, lp) = fs(spark)
    if (!hfs.exists(lp)) None
    else {
      val in = hfs.open(lp)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    }
  }

  /** One liveness predicate for both lock-token kinds. */
  private def tokenIsLive(spark: SparkSession, held: String): Boolean =
    if (held.startsWith(SinkLock.CompactTokenPrefix))
      HtaStore.compactIsActive(held)
    else HtaStore.runIsActive(spark, held)

  private def describeToken(held: String): String =
    if (held.startsWith(SinkLock.CompactTokenPrefix)) s"compaction $held"
    else s"ingest query $held"

  /** One busy probe, shared by every lock operation: throw if the lock
    * file names a LIVE holder other than `exempt`. Callers hold the
    * per-root monitor — without it, two concurrent starts could both
    * read an empty lock and both acquire, leaving two live writers.
    */
  private def busyCheck(spark: SparkSession, exempt: Option[String]): Unit =
    lockedToken(spark).foreach { held =>
      if (!exempt.contains(held) && tokenIsLive(spark, held))
        throw new StoreBusyException(
          s"$what at $root is held by live ${describeToken(held)}; two " +
            "concurrent writers on one sink would interleave or destroy " +
            "batch directories")
    }

  /** The pre-start half of the ingest handshake: refuse while another
    * live holder exists, WITHOUT acquiring — called before the new
    * query exists, so a busy sink fails before anything starts
    * (throwing after `.start()` would leak a running, handle-less
    * second writer). If two starts race past this, the loser's
    * [[acquireIngest]] sees the winner's live lock and throws, and the
    * caller stops its query.
    */
  def assertNotBusy(spark: SparkSession): Unit =
    HtaStore.rootMonitor(root).synchronized {
      busyCheck(spark, exempt = None)
    }

  /** Record `runId` as the live ingest holder (lock file next to the
    * data). A compact refuses while the recorded query is still
    * active; a stale lock is cleared by the next acquire.
    */
  def acquireIngest(spark: SparkSession, runId: String): Unit =
    HtaStore.rootMonitor(root).synchronized {
      busyCheck(spark, exempt = Some(runId))
      val (hfs, lp) = fs(spark)
      val out = hfs.create(lp, true)
      try out.write(runId.getBytes("UTF-8")) finally out.close()
    }

  /** Run `body` holding the lock with a fresh compact token for its
    * WHOLE duration — entry-only exclusion would leave a window where
    * a start() begun mid-compact sees no lock, passes assertNotBusy,
    * and appends batch directories that the compact's rename+delete
    * would silently destroy. busyCheck treats a live compact token as
    * busy, so that start() fails loudly instead.
    */
  def withCompact[T](spark: SparkSession)(body: => T): T = {
    val token = SinkLock.CompactTokenPrefix + java.util.UUID.randomUUID()
    HtaStore.rootMonitor(root).synchronized {
      busyCheck(spark, exempt = None)
      // register BEFORE the file lands: a busy probe that reads our
      // token must find it live, never a just-written-but-unregistered
      // token it would misjudge as a stale crash
      HtaStore.registerCompact(token)
      // a failed lock write must unregister the token, or the sink is
      // wedged for the JVM's lifetime behind a "live" compact that
      // never ran (the half-written lock file itself is harmless: its
      // token is not live after unregistration, so busyCheck clears it
      // as stale)
      try {
        val (hfs, lp) = fs(spark)
        val out = hfs.create(lp, true)
        try out.write(token.getBytes("UTF-8")) finally out.close()
      } catch { case t: Throwable =>
        HtaStore.unregisterCompact(token); throw t
      }
    }
    try body
    finally HtaStore.rootMonitor(root).synchronized {
      HtaStore.unregisterCompact(token)
      // release only our own token — never a successor's lock (nothing
      // can legally replace a live compact token, but a crash-then-
      // recover path must not delete the recovering writer's lock)
      if (lockedToken(spark).contains(token)) {
        val (hfs, lp) = fs(spark)
        hfs.delete(lp, false)
      }
    }
  }
}

private[graft] object SinkLock {
  /** Lock-file values beginning with this prefix mark a live
    * compaction rather than a streaming query — see
    * [[HtaStore.registerCompact]].
    */
  val CompactTokenPrefix = "compact:"
}
