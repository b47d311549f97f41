package graft.streaming

import org.apache.spark.sql.SparkSession

/** Single-writer exclusion for an on-disk sink root — the lock-file
  * discipline extracted from the metric store so it exists exactly
  * once and the corpus sink ([[graft.sources.CorpusIO]]) can carry
  * the same guard: without it, a compact's verified double-rename can
  * race a live ingest query's `foreachBatch` — the second rename
  * lands under a recreated primary directory and the backup holding
  * the only full copy is deleted on the "success" path.
  *
  * Mechanism, round 16 (cross-JVM): the lock FILE next to the data is
  * claimed with `create(overwrite = false)` — the mint-marker
  * primitive ([[graft.operators.Similarity]]'s `_mint_v<n>`), atomic
  * on HDFS (namenode-serialized) and refused at create time on the
  * local FS — so two racing acquirers get one winner by construction
  * instead of last-write-wins. The file names the live holder: an
  * ingest query's runId or a compact's `compact:<uuid>` token (a
  * runId is a bare UUID and can never collide with the prefix).
  * Deciding whether a HELD lock is live is three-way:
  *  - the token is live in THIS JVM's registry
  *    ([[HtaStore.runIsActive]] / [[HtaStore.compactIsActive]],
  *    probed JVM-globally — per-session `spark.streams.active` alone
  *    would miss a writer started from a sibling session) → busy;
  *  - the token was MINTED by this JVM ([[JvmScope.ownsToken]]) and
  *    is no longer live → stale immediately (we know our own dead
  *    writers — a cleanly-stopped query's lock clears on the next
  *    acquire with no wait, the pre-round-16 behavior);
  *  - the token is FOREIGN (another JVM's writer): liveness is a
  *    HEARTBEAT LEASE — the holder refreshes the lock file's mtime
  *    every `staleMs / 4` ([[SinkLock.Heartbeat]]); a foreign lock
  *    younger than `spark.graft.sink.lockStaleMs` (default 60 s) is
  *    a live writer → busy, older is a crashed one → healed via
  *    rename arbitration (exactly one healer's rename succeeds) and
  *    claimed fresh.
  * Same-JVM read-check-write sequences stay serialized by the
  * per-root monitor. Lease honesty (the mint marker's caveat, shared):
  * a live holder paused past the staleness window without a heartbeat
  * — GC pause, FS hang — can be healed away; the heartbeat shrinks
  * that exposure to a process that is genuinely not running, and the
  * compact path's independent crash discipline (backup-dir guard,
  * verified double rename) bounds the damage of the residual. Object
  * stores without atomic create/rename need the
  * transactional-table-format story (SCALE.md §1) regardless.
  *
  * `what` names the protected thing in diagnostics ("store",
  * "corpus sink"); tests pin the "live" / "live ingest query" /
  * "compaction" / "another JVM" phrases. `scope` is the JVM identity
  * bundle — production uses the global one; the two-JVM specs pass
  * isolated scopes to simulate two drivers on one filesystem.
  */
private[graft] final class SinkLock(root: String, what: String,
                                    scope: SinkLock.JvmScope =
                                      SinkLock.GlobalJvmScope) {

  private def lockFile = new org.apache.hadoop.fs.Path(s"$root/ingest.lock")

  private def fs(spark: SparkSession) = {
    val p = lockFile
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def staleMs(spark: SparkSession): Long =
    spark.conf.get("spark.graft.sink.lockStaleMs", "60000").toLong

  private def lockedToken(spark: SparkSession): Option[String] = {
    val (hfs, lp) = fs(spark)
    SinkLock.readToken(hfs, lp)
  }

  /** One liveness predicate for all lock-token kinds: an ingest
    * query's runId (probed via the query registry) or a compact /
    * start-guard token (probed via JVM membership).
    */
  private def tokenIsLive(spark: SparkSession, held: String): Boolean =
    if (held.startsWith(SinkLock.CompactTokenPrefix) ||
        held.startsWith(SinkLock.StartTokenPrefix))
      scope.compactIsActive(held)
    else scope.runIsActive(spark, held)

  private def describeToken(held: String): String =
    if (held.startsWith(SinkLock.CompactTokenPrefix)) s"compaction $held"
    else if (held.startsWith(SinkLock.StartTokenPrefix))
      s"starting ingest query $held"
    else s"ingest query $held"

  private def writeLock(spark: SparkSession, token: String): Unit = {
    val (hfs, lp) = fs(spark)
    SinkLock.writeToken(hfs, lp, token)
    scope.noteOwnToken(token)
  }

  /** The three-way live/stale decision on a held token (see the class
    * doc): Some(description) when the holder is LIVE — this JVM's
    * registry, or a foreign token inside its heartbeat lease — None
    * when it is provably stale (our own dead writer, a foreign one
    * past the lease, or a lock that vanished mid-probe).
    */
  private def heldBusyReason(spark: SparkSession,
                             held: String): Option[String] = {
    if (tokenIsLive(spark, held))
      return Some(s"live ${describeToken(held)}")
    if (scope.ownsToken(held)) return None // our own, not live: stale
    // foreign token — another JVM's writer: the heartbeat lease decides
    val (hfs, lp) = fs(spark)
    val age =
      try System.currentTimeMillis() -
        hfs.getFileStatus(lp).getModificationTime
      catch { case _: java.io.FileNotFoundException => return None }
    if (age < staleMs(spark))
      Some(s"another JVM's ${describeToken(held)} " +
        s"(heartbeat $age ms old, lease ${staleMs(spark)} ms)")
    else None
  }

  /** One busy probe, shared by every lock operation: throw if the lock
    * file names a holder other than `exempt` that the three-way rule
    * judges live. Callers hold the per-root monitor — without it, two
    * same-JVM starts could interleave their read-check-write.
    */
  private def busyCheck(spark: SparkSession, exempt: Option[String]): Unit =
    lockedToken(spark).foreach { held =>
      if (!exempt.contains(held))
        heldBusyReason(spark, held).foreach { why =>
          throw new StoreBusyException(
            s"$what at $root is held by $why; two concurrent writers " +
              "on one sink would interleave or destroy batch " +
              "directories")
        }
    }

  /** Acquire the lock file for `token` with CREATE-EXCLUSIVE
    * semantics: a free path is claimed atomically; a held path is
    * judged by [[heldBusyReason]] — live throws, stale is healed via
    * rename arbitration (one winner on any FS) and claimed fresh. A
    * lost heal or re-claim race throws too: someone else claimed
    * first and the refusal is the correct answer.
    */
  private def claimLock(spark: SparkSession, token: String): Unit = {
    val (hfs, lp) = fs(spark)
    def tryCreate(): Boolean =
      try {
        val out = hfs.create(lp, false)
        try out.write(token.getBytes("UTF-8")) finally out.close()
        scope.noteOwnToken(token)
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException =>
          if (hfs.exists(lp)) false else throw e
      }
    if (tryCreate()) return
    lockedToken(spark) match {
      case None => // released in the probe instant — claim again
        if (!tryCreate()) throw new StoreBusyException(
          s"$what at $root: lost an acquisition race — a concurrent " +
            "writer claimed the sink first")
      case Some(held) =>
        heldBusyReason(spark, held).foreach { why =>
          throw new StoreBusyException(
            s"$what at $root is held by $why; two concurrent writers " +
              "on one sink would interleave or destroy batch " +
              "directories")
        }
        // stale: heal with rename arbitration, then claim fresh
        val reclaimed = new org.apache.hadoop.fs.Path(
          s"$root/ingest.lock.reclaimed.${java.util.UUID.randomUUID()}")
        val healed =
          try hfs.rename(lp, reclaimed)
          catch { case _: java.io.IOException => false }
        if (healed) hfs.delete(reclaimed, false)
        if (!healed || !tryCreate()) throw new StoreBusyException(
          s"$what at $root: lost the stale-lock heal race — a " +
            "concurrent writer claimed the sink first")
    }
  }

  /** Register-then-claim under the monitor — ONE definition of the
    * acquisition handshake for both lock operations. Registration
    * precedes the file (the withCompact discipline): a busy probe
    * that reads our token must find it live, never misjudge a
    * just-written-but-unregistered token as a stale crash. A failed
    * claim unregisters, or the sink wedges behind a "live" token that
    * never ran.
    */
  private def acquire(spark: SparkSession, token: String): Unit =
    scope.monitor(root).synchronized {
      scope.registerCompact(token)
      try claimLock(spark, token)
      catch { case t: Throwable =>
        scope.unregisterCompact(token); throw t
      }
    }

  /** Start a heartbeat refreshing the lock file's mtime while
    * `token` still holds it — the foreign-liveness lease. Ticks take
    * the per-root monitor and rewrite the file only when it still
    * carries our token; the task cancels itself once the holder is no
    * longer alive or the token left the file.
    */
  private def startHeartbeat(spark: SparkSession,
                             token: String): SinkLock.Heartbeat = {
    val (hfs, lp) = fs(spark)
    new SinkLock.Heartbeat(hfs, lp, scope.monitor(root), token,
      staleMs(spark))
  }

  /** Cheap pre-start busy probe: refuse while another live holder
    * exists, WITHOUT acquiring — called before expensive pre-start
    * work so a busy sink fails fast. Exclusion itself comes from
    * [[startGuarded]]: if two starts race past this probe, the
    * loser's guard acquisition loses the create-exclusive claim (or
    * reads the winner's live token) and throws before its query ever
    * exists.
    */
  def assertNotBusy(spark: SparkSession): Unit =
    scope.monitor(root).synchronized {
      busyCheck(spark, exempt = None)
    }

  /** Start an ingest query under the lock with NO unguarded window:
    * a fresh start-guard token is claimed BEFORE `start` runs (so a
    * compact beginning between the busy probe and the run-id write
    * cannot rename the tree out from under the query's first
    * batches — the query may commit batches the moment `.start()`
    * returns, before any post-start bookkeeping), swapped for the
    * query's runId once it exists — fenced: the swap verifies the
    * file still carries OUR guard, so a guard healed away by another
    * JVM during a pathological pause aborts the start instead of
    * silently overwriting the successor's claim — and the query is
    * registered in the JVM-global liveness registry. A heartbeat
    * keeps the lease fresh from claim until the query terminates. If
    * anything fails, the query (if created) is stopped — a thrown
    * start must not leak a running, handle-less writer — with the
    * stop failure suppressed into the original diagnosis, and the
    * guard is released. ONE definition of the whole handshake, shared
    * by the metric store and the corpus sink.
    */
  def startGuarded(spark: SparkSession)(
      start: => org.apache.spark.sql.streaming.StreamingQuery)
    : org.apache.spark.sql.streaming.StreamingQuery = {
    val token = SinkLock.StartTokenPrefix + java.util.UUID.randomUUID()
    acquire(spark, token)
    val hb = startHeartbeat(spark, token)
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      q = start
      scope.registerRun(spark, q)
      // swap guard → runId under the monitor, fenced on ownership
      scope.monitor(root).synchronized {
        if (!lockedToken(spark).contains(token))
          throw new StoreBusyException(
            s"$what at $root: this writer's start guard was healed " +
              "away mid-start (paused past the staleness lease) — " +
              "another JVM's writer owns the sink now")
        writeLock(spark, q.runId.toString)
        hb.swapToken(q.runId.toString)
      }
      val started = q
      hb.alive = () => started.isActive
      q
    } catch { case e: Throwable =>
      hb.cancel()
      if (q != null) {
        try q.stop() catch { case s: Throwable => e.addSuppressed(s) }
      }
      // release the guard only if the file still holds OUR token (the
      // swap may or may not have happened)
      scope.monitor(root).synchronized {
        if (lockedToken(spark).contains(token)) {
          val (hfs, lp) = fs(spark)
          hfs.delete(lp, false)
        }
      }
      throw e
    } finally scope.unregisterCompact(token)
  }

  /** Run `body` holding the lock with a fresh compact token for its
    * WHOLE duration — entry-only exclusion would leave a window where
    * a start() begun mid-compact sees no lock, passes assertNotBusy,
    * and appends batch directories that the compact's rename+delete
    * would silently destroy. busyCheck treats a live compact token as
    * busy, so that start() fails loudly instead. A heartbeat keeps
    * the lease fresh for compactions longer than the staleness
    * window.
    */
  def withCompact[T](spark: SparkSession)(body: => T): T = {
    val token = SinkLock.CompactTokenPrefix + java.util.UUID.randomUUID()
    acquire(spark, token)
    val hb = startHeartbeat(spark, token)
    try body
    finally {
      hb.cancel()
      scope.monitor(root).synchronized {
        scope.unregisterCompact(token)
        // release only our own token — never a successor's lock
        // (nothing can legally replace a live compact token, but a
        // crash-then-recover path must not delete the recovering
        // writer's lock)
        if (lockedToken(spark).contains(token)) {
          val (hfs, lp) = fs(spark)
          hfs.delete(lp, false)
        }
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

  private def readToken(hfs: org.apache.hadoop.fs.FileSystem,
                        lp: org.apache.hadoop.fs.Path): Option[String] =
    if (!hfs.exists(lp)) None
    else {
      val in = hfs.open(lp)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    }

  private def writeToken(hfs: org.apache.hadoop.fs.FileSystem,
                         lp: org.apache.hadoop.fs.Path,
                         token: String): Unit = {
    val out = hfs.create(lp, true)
    try out.write(token.getBytes("UTF-8")) finally out.close()
  }

  /** The JVM identity bundle the lock judges liveness against —
    * monitors, the run/compact registries, and the tokens this JVM
    * has ever minted. Production code uses [[GlobalJvmScope]]
    * (delegating to [[HtaStore]]'s JVM-global state); the two-JVM
    * race specs instantiate [[IsolatedJvmScope]]s so two drivers on
    * one filesystem can be simulated in one test JVM.
    */
  trait JvmScope {
    def monitor(root: String): Object
    def runIsActive(spark: SparkSession, runId: String): Boolean
    def compactIsActive(token: String): Boolean
    def registerCompact(token: String): Unit
    def unregisterCompact(token: String): Unit
    def registerRun(spark: SparkSession,
                    q: org.apache.spark.sql.streaming.StreamingQuery): Unit
    def ownsToken(token: String): Boolean
    def noteOwnToken(token: String): Unit
  }

  object GlobalJvmScope extends JvmScope {
    def monitor(root: String): Object = HtaStore.rootMonitor(root)
    def runIsActive(spark: SparkSession, runId: String): Boolean =
      HtaStore.runIsActive(spark, runId)
    def compactIsActive(token: String): Boolean =
      HtaStore.compactIsActive(token)
    def registerCompact(token: String): Unit =
      HtaStore.registerCompact(token)
    def unregisterCompact(token: String): Unit =
      HtaStore.unregisterCompact(token)
    def registerRun(spark: SparkSession,
                    q: org.apache.spark.sql.streaming.StreamingQuery)
      : Unit = HtaStore.registerRun(q)
    def ownsToken(token: String): Boolean = HtaStore.ownsToken(token)
    def noteOwnToken(token: String): Unit = HtaStore.noteOwnToken(token)
  }

  /** A second "JVM" for the cross-driver specs: fresh monitors,
    * registries and ownership — and deliberately NO fallback to
    * `spark.streams.active`, which is real-JVM-shared state the
    * simulated second driver must not see.
    */
  final class IsolatedJvmScope extends JvmScope {
    private val monitors =
      scala.collection.concurrent.TrieMap.empty[String, Object]
    private val compacts =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    private val own =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    private val runs = scala.collection.concurrent.TrieMap
      .empty[String, java.lang.ref.WeakReference[
        org.apache.spark.sql.streaming.StreamingQuery]]
    def monitor(root: String): Object =
      monitors.getOrElseUpdate(root, new Object)
    def runIsActive(spark: SparkSession, runId: String): Boolean =
      runs.get(runId).flatMap(r => Option(r.get)).exists(_.isActive)
    def compactIsActive(token: String): Boolean = compacts.contains(token)
    def registerCompact(token: String): Unit = {
      compacts.add(token); own.add(token); ()
    }
    def unregisterCompact(token: String): Unit = { compacts.remove(token); () }
    def registerRun(spark: SparkSession,
                    q: org.apache.spark.sql.streaming.StreamingQuery)
      : Unit = {
      runs.put(q.runId.toString, new java.lang.ref.WeakReference(q))
      own.add(q.runId.toString); ()
    }
    def ownsToken(token: String): Boolean = own.contains(token)
    def noteOwnToken(token: String): Unit = { own.add(token); () }
  }

  /** One shared daemon for every lock heartbeat in the JVM — ticks
    * are one small file rewrite each, so a single thread serves any
    * number of concurrently held locks.
    */
  private val heartbeatExec = {
    val ex = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val t = new Thread(r, "graft-sink-lock-heartbeat")
        t.setDaemon(true)
        t
      })
    ex
  }

  /** The lease refresher: every `staleMs / 4` rewrite the lock file
    * (bumping its mtime) while (a) the holder's `alive` probe still
    * says yes and (b) the file still carries OUR token — under the
    * per-root monitor, so a probe never reads a half-written file
    * from us. Self-cancelling: a terminated holder or a healed-away
    * token stops the ticks; the lock file is deliberately LEFT for
    * the next acquirer's stale-clear (the pre-round-16 release
    * semantics, now with ownership recorded so same-JVM clears stay
    * immediate). A transient FS error skips the tick and tries again
    * — one missed beat is harmless, the lease is 4 periods deep.
    */
  final class Heartbeat(hfs: org.apache.hadoop.fs.FileSystem,
                        lp: org.apache.hadoop.fs.Path,
                        monitor: Object,
                        initialToken: String,
                        staleMs: Long) {
    @volatile private var token: String = initialToken
    @volatile var alive: () => Boolean = () => true
    @volatile private var cancelled = false
    private val periodMs = math.max(50L, staleMs / 4)
    private val task = heartbeatExec.scheduleAtFixedRate(
      () => tick(), periodMs, periodMs,
      java.util.concurrent.TimeUnit.MILLISECONDS)
    def swapToken(t: String): Unit = { token = t }
    private def tick(): Unit =
      if (!cancelled) try {
        if (!alive()) { cancel(); return }
        monitor.synchronized {
          if (readToken(hfs, lp).contains(token))
            writeToken(hfs, lp, token)
          else cancel() // released or healed away: stop touching
        }
      } catch { case _: Throwable => () }
    def cancel(): Unit = { cancelled = true; task.cancel(false); () }
  }
}
