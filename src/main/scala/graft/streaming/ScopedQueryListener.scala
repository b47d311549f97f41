package graft.streaming

import org.apache.spark.sql.streaming.{StreamingQueryListener, StreamingQueryProgress}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Shared machinery for run-scoped observe-metric collectors
  * ([[IngestStats]], [[CorpusIngestStats]]): a bounded ring of
  * per-batch rows, scoped to ONE streaming query run. Extracted so the
  * scoping discipline exists exactly once — the two sides previously
  * carried identical copies of the bind/prune/ring logic, and a fix to
  * one (like the bind race below) would predictably miss the other.
  *
  * Concurrency contract: listeners are session-global and their events
  * arrive on the listener-bus thread while [[bind]] runs on the driver
  * thread. BOTH the bound-run check and the append happen inside the
  * buffer lock — checking outside it would let a foreign query's row
  * slip in between bind()'s prune and its own append, contaminating
  * the table forever.
  */
abstract class ScopedQueryListener[T] extends StreamingQueryListener {

  private val buf = mutable.ArrayBuffer.empty[T]
  private var boundRunId: Option[String] = None

  /** Ring cap — the buffer is bounded, not a leak. */
  protected def maxRetained: Int

  /** The run id a collected row carries (for bind()'s prune). */
  protected def runIdOf(row: T): String

  /** Build this collector's row from one batch's progress. */
  protected def rowOf(p: StreamingQueryProgress): T

  /** Scope this collector to one query run (the starting wrapper calls
    * this with its query's runId). Rows already collected from other
    * runs — possible in the window between listener registration and
    * query start — are pruned.
    */
  final def bind(runId: java.util.UUID): Unit = {
    val r = runId.toString
    buf.synchronized {
      boundRunId = Some(r)
      val keep = buf.filter(runIdOf(_) == r)
      buf.clear()
      buf ++= keep
    }
  }

  override final def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override final def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override final def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    // build the row OUTSIDE the lock (rowOf parses observedMetrics —
    // holding the lock through it would let a slow listener-bus event
    // block a driver thread inside bind()); the scope check stays
    // inside, atomic with the append, which is all the race fix needs
    val row = rowOf(p)
    buf.synchronized {
      if (!boundRunId.exists(_ != p.runId.toString)) {
        buf += row
        if (buf.length > maxRetained)
          buf.remove(0, buf.length - maxRetained)
      }
    }
  }

  /** An observed metric's field from this batch, 0 when absent. */
  protected final def obs(p: StreamingQueryProgress, name: String,
                          field: String): Long =
    Option(p.observedMetrics.get(name))
      .map(r => r.getAs[Long](field)).getOrElse(0L)

  /** The batch's wall duration. durationMs holds the total
    * ("triggerExecution") AND its component phases — summing the map
    * would double-count the batch, so the total is read directly and
    * the sum is only the fallback for progress events without it.
    */
  protected final def totalDuration(p: StreamingQueryProgress): Long =
    Option(p.durationMs.get("triggerExecution"))
      .map(_.toLong)
      .getOrElse(p.durationMs.asScala.values.map(_.toLong).sum)

  /** Consistent snapshot of the collected rows. */
  protected final def snapshot: Seq[T] = buf.synchronized(buf.toSeq)
}
