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

  /** One liveness predicate for all lock-token kinds: an ingest
    * query's runId (probed via the query registry) or a compact /
    * start-guard token (probed via JVM membership).
    */
  private def tokenIsLive(spark: SparkSession, held: String): Boolean =
    if (held.startsWith(SinkLock.CompactTokenPrefix) ||
        held.startsWith(SinkLock.StartTokenPrefix))
      HtaStore.compactIsActive(held)
    else HtaStore.runIsActive(spark, held)

  private def describeToken(held: String): String =
    if (held.startsWith(SinkLock.CompactTokenPrefix)) s"compaction $held"
    else if (held.startsWith(SinkLock.StartTokenPrefix))
      s"starting ingest query $held"
    else s"ingest query $held"

  private def writeLock(spark: SparkSession, token: String): Unit = {
    val (hfs, lp) = fs(spark)
    val out = hfs.create(lp, true)
    try out.write(token.getBytes("UTF-8")) finally out.close()
  }

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

  /** Cheap pre-start busy probe: refuse while another live holder
    * exists, WITHOUT acquiring — called before expensive pre-start
    * work so a busy sink fails fast. Exclusion itself comes from
    * [[startGuarded]]: if two starts race past this probe, the
    * loser's guard acquisition sees the winner's live token and
    * throws before its query ever exists.
    */
  def assertNotBusy(spark: SparkSession): Unit =
    HtaStore.rootMonitor(root).synchronized {
      busyCheck(spark, exempt = None)
    }

  /** Start an ingest query under the lock with NO unguarded window:
    * a fresh start-guard token is acquired BEFORE `start` runs (so a
    * compact beginning between the busy probe and the run-id write
    * cannot rename the tree out from under the query's first
    * batches — the query may commit batches the moment `.start()`
    * returns, before any post-start bookkeeping), swapped for the
    * query's runId once it exists, and the query is registered in the
    * JVM-global liveness registry. If anything fails, the query (if
    * created) is stopped — a thrown start must not leak a running,
    * handle-less writer — with the stop failure suppressed into the
    * original diagnosis, and the guard is released. ONE definition of
    * the whole handshake, shared by the metric store and the corpus
    * sink.
    */
  def startGuarded(spark: SparkSession)(
      start: => org.apache.spark.sql.streaming.StreamingQuery)
    : org.apache.spark.sql.streaming.StreamingQuery = {
    val token = SinkLock.StartTokenPrefix + java.util.UUID.randomUUID()
    HtaStore.rootMonitor(root).synchronized {
      busyCheck(spark, exempt = None)
      // register BEFORE the file lands (the withCompact discipline):
      // a busy probe must find our token live, never misjudge a
      // just-written-but-unregistered token as a stale crash
      HtaStore.registerCompact(token)
      try writeLock(spark, token)
      catch { case t: Throwable =>
        HtaStore.unregisterCompact(token); throw t
      }
    }
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      q = start
      HtaStore.registerRun(q)
      // swap guard → runId: we hold the lock, so no busy re-probe; the
      // monitor serializes same-JVM readers across the overwrite
      HtaStore.rootMonitor(root).synchronized {
        writeLock(spark, q.runId.toString)
      }
      q
    } catch { case e: Throwable =>
      if (q != null) {
        try q.stop() catch { case s: Throwable => e.addSuppressed(s) }
      }
      // release the guard only if the file still holds OUR token (the
      // swap may or may not have happened)
      HtaStore.rootMonitor(root).synchronized {
        if (lockedToken(spark).contains(token)) {
          val (hfs, lp) = fs(spark)
          hfs.delete(lp, false)
        }
      }
      throw e
    } finally HtaStore.unregisterCompact(token)
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
      try writeLock(spark, token)
      catch { case t: Throwable =>
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
  /** Lock-file values beginning with these prefixes mark a live
    * compaction / a query mid-start rather than a running streaming
    * query (a runId is a bare UUID and can never collide) — both
    * probed for liveness via JVM membership, see
    * [[HtaStore.registerCompact]].
    */
  val CompactTokenPrefix = "compact:"
  val StartTokenPrefix = "starting:"
}
