package graft.operators

import graft.core.{HistoryRequest, HistoryResponse}
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable
import scala.util.control.NonFatal

/** Read-side operational telemetry (S6/T6) — the reference tracks every
  * history request through a pending → active → completed/failed state
  * machine (`/root/reference/src/db_stats.cpp:43-115`) and republishes 7
  * derived read metrics with unit/quantity/description/scope metadata at
  * a configured rate (`db_stats.cpp:119-216`, timer wiring
  * `/root/reference/src/db.cpp:63-100`).
  *
  * Spark-native analogue: counters live on the driver (request dispatch
  * is a driver-side activity; the heavy lifting inside a request is the
  * distributed job itself), [[collect]] is the rate-timer tick — it
  * drains the interval's deltas into published [[QueryStats.Sample]]
  * rows, and [[toDF]] exposes the published stream as a table the same
  * way `IngestStats` does for the write side. The C5 rate derivations
  * (requests/s, B/s, mean pending time, utilization) happen in
  * [[collect]], mirroring `StatsMetrics::write`
  * (`db_stats.cpp:180-216`).
  */
object QueryStats {
  /** One published point of one stats metric — value plus the metadata
    * the reference attaches to the metric declaration
    * (`db_stats.cpp:132-178`).
    */
  final case class Sample(time_ns: Long, metric: String, value: Double,
                          unit: String, quantity: String,
                          description: String, scope: String)

  /** Per-request lifecycle token; timestamps in the collector's clock. */
  final class Token private[QueryStats] (private[QueryStats] val pendingSince: Long) {
    private[QueryStats] var activeSince: Long = 0L
  }

  private val MetricDefs: Seq[(String, String, String, String, String)] = Seq(
    // (suffix, unit, quantity, description, scope) — db_stats.cpp:132-178
    ("request.rate", "Hz", "rate", "rate of completed read-requests", "last"),
    ("data.rate", "B/s", "rate", "data rate for read payload", "last"),
    ("pending.time", "s", "time", "average time read-requests were pending", "last"),
    ("utilization", "", "utilization", "fraction of time spent on processing read-requests", "last"),
    ("pending.count", "", "", "number of pending read-requests", "point"),
    ("active.count", "", "", "number of actively processed read-requests", "point"),
    ("failed.count", "", "", "number of failed read-requests", "last"),
    // extension beyond the reference's 7: the slice of data.rate whose
    // byte size was ESTIMATED (status store reported no cached blocks;
    // rows × defaultSize) rather than measured off block sizes — a
    // consumer comparing data.rate across hosts must be able to tell
    // measured transfer from a guess
    ("data.estimated.rate", "B/s", "rate",
      "portion of the read payload data rate whose size was estimated, not measured", "last"))
}

/** @param prefix metric-name prefix, reference `stats.prefix` config —
  *               full names are `<prefix>read.<suffix>`
  * @param rateHz publication rate; must be > 0 (`db.cpp:66-75`)
  * @param clock  nanosecond clock, injectable for deterministic tests
  */
final class QueryStats(prefix: String = "graft.db.", rateHz: Double = 0.1,
                       clock: () => Long = () => System.nanoTime()) {
  import QueryStats._
  require(rateHz > 0, "invalid rate configured for stats") // db.cpp:68

  // interval deltas (reset by collect) + state levels (never reset) —
  // exactly StatsCollector::Stats (db_stats.cpp:78-102)
  private var completedCount, failedCount, startedCount, dataSize = 0L
  private var dataSizeEstimated = 0L // ⊆ dataSize; see data.estimated.rate
  private var pendingNs, activeNs = 0L
  private var inPending, inActive = 0L
  private var lastCollectNs = clock() // "collect empty stats right at the beginning"
  // a ring, not a leak: same retention policy as IngestStats — a
  // long-lived service ticking forever must not grow driver heap
  private val MaxRetained = 10000
  private val published = mutable.ArrayBuffer.empty[Sample]

  def pending(): Token = synchronized {
    inPending += 1
    new Token(clock())
  }

  def active(t: Token): Unit = synchronized {
    t.activeSince = clock()
    pendingNs += t.activeSince - t.pendingSince
    inPending -= 1
    startedCount += 1
    inActive += 1
  }

  /** @param estimated true when `sizeBytes` is an estimate (row count ×
    *                   `defaultSize`) rather than a measured block size —
    *                   the bytes still count into `data.rate`, and are
    *                   additionally surfaced via `data.estimated.rate`
    */
  def complete(t: Token, sizeBytes: Long, estimated: Boolean = false): Unit =
    synchronized {
      completedCount += 1
      inActive -= 1
      activeNs += clock() - t.activeSince
      dataSize += sizeBytes
      if (estimated) dataSizeEstimated += sizeBytes
    }

  def failed(t: Token): Unit = synchronized {
    inActive -= 1
    failedCount += 1
    activeNs += clock() - t.activeSince
  }

  /** The rate-timer tick: derive the 7 read metrics over the elapsed
    * interval, reset the deltas, append to the published stream
    * (`StatsMetrics::write`, db_stats.cpp:180-216). Returns the rows it
    * published.
    */
  def collect(): Seq[Sample] = synchronized {
    val now = clock()
    val duration = (now - lastCollectNs) / 1e9
    // two ticks in the same clock quantum (coarse nanoTime on VMs, or a
    // flush racing the scheduled tick): a no-op interval, not an error —
    // keep the deltas for the next real tick instead of dying
    if (duration <= 0) return Seq.empty
    lastCollectNs = now
    val meanPending =
      if (startedCount > 0) pendingNs / 1e9 / startedCount else 0.0
    val values = Map(
      "request.rate" -> completedCount / duration,
      "data.rate" -> dataSize / duration,
      "pending.time" -> meanPending,
      "utilization" -> activeNs / 1e9 / duration,
      "pending.count" -> inPending.toDouble,
      "active.count" -> inActive.toDouble,
      "failed.count" -> failedCount.toDouble,
      "data.estimated.rate" -> dataSizeEstimated / duration)
    completedCount = 0; failedCount = 0; startedCount = 0
    dataSize = 0; dataSizeEstimated = 0; pendingNs = 0; activeNs = 0
    val rows = MetricDefs.map { case (suffix, unit, quantity, desc, scope) =>
      Sample(now, s"${prefix}read.$suffix", values(suffix), unit, quantity, desc, scope)
    }
    published ++= rows
    if (published.size > MaxRetained)
      published.remove(0, published.size - MaxRetained)
    rows
  }

  /** All published samples as a table — the metric stream a downstream
    * monitoring consumer would subscribe to.
    */
  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    synchronized(published.toSeq).toDF()
  }
}

/** T5 per-request failure isolation: the reference wraps each read in a
  * try/catch and answers `handler.failed(id, message)` instead of taking
  * the service down (`/root/reference/src/async_hta_service.hpp:518-534`).
  */
final case class RequestError(metric: String, message: String)

/** The tracked, failure-isolated request dispatcher: [[HtaService.history]]
  * plus the reference's per-request lifecycle — stats transitions
  * (`async_hta_service.hpp:518` `read_pending`, then active inside the
  * strand) and the catch-all → `failed` reply.
  *
  * @param knownMetrics optional catalog gate: a request for a metric the
  *                     catalog doesn't know fails like the reference's
  *                     missing-HTA-metric lookup, instead of silently
  *                     aggregating over zero rows.
  */
final class QueryDispatcher(stats: QueryStats,
                            knownMetrics: Option[Set[String]] = None) {

  private def validate(req: HistoryRequest): Option[String] = req match {
    case _ if knownMetrics.exists(!_.contains(req.metric)) =>
      Some(s"unknown metric '${req.metric}'")
    case r: HistoryRequest.AggregateTimeline if r.startNs > r.endNs =>
      Some(s"malformed range [${r.startNs}, ${r.endNs}]")
    case r: HistoryRequest.FlexTimeline if r.startNs > r.endNs =>
      Some(s"malformed range [${r.startNs}, ${r.endNs}]")
    case r: HistoryRequest.Aggregate if r.startNs > r.endNs =>
      Some(s"malformed range [${r.startNs}, ${r.endNs}]")
    case r: HistoryRequest.AggregateTimeline if r.intervalMaxNs < 0 =>
      Some(s"negative interval_max ${r.intervalMaxNs}")
    case r: HistoryRequest.FlexTimeline if r.intervalMaxNs < 0 =>
      Some(s"negative interval_max ${r.intervalMaxNs}")
    case _ => None
  }

  /** The persisted RDD behind an eagerly localCheckpoint'ed frame (its
    * analyzed plan is a LogicalRDD wrapping exactly that RDD).
    */
  private def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }

  /** One request in, `Right(response)` or `Left(error)` out — never an
    * exception (NonFatal). The response is materialized ONCE here via an
    * eager localCheckpoint — like the reference, the service encodes the
    * full (per-metric, bounded) response before replying. The `data.rate`
    * byte figure is read off the checkpoint's persisted block sizes: no
    * second job over the frame, and actual row bytes instead of
    * `schema.defaultSize`'s fixed per-type guess (which overstates
    * strings and ignores row count variance).
    */
  def dispatch(req: HistoryRequest, sanitized: DataFrame,
               levels: Seq[Long]): Either[RequestError, HistoryResponse] = {
    import graft.core.{HistoryResponse => Resp}
    val t = stats.pending()
    stats.active(t)
    validate(req) match {
      case Some(msg) =>
        stats.failed(t)
        Left(RequestError(req.metric, msg))
      case None =>
        try {
          val resp = HtaService.history(req, sanitized, levels) match {
            case Resp.Aggregates(df) => Resp.Aggregates(df.localCheckpoint(true))
            case Resp.Raw(df) => Resp.Raw(df.localCheckpoint(true))
          }
          val sc = resp.df.sparkSession.sparkContext
          // getRDDStorageInfo reads the listener-bus-fed status store,
          // which drains asynchronously after the checkpoint job — wait
          // (bounded) until every partition's block has been reported
          // before reading sizes, or data.rate under-reports under load
          val (bytes, estimated) = checkpointRdd(resp.df).map { rdd =>
            val want = rdd.getNumPartitions
            if (want == 0) (0L, false) // empty plan: no blocks will report
            else {
              val deadline = System.currentTimeMillis() + 500
              var info = sc.getRDDStorageInfo.find(_.id == rdd.id)
              while (info.forall(_.numCachedPartitions < want) &&
                  System.currentTimeMillis() < deadline) {
                Thread.sleep(20)
                info = sc.getRDDStorageInfo.find(_.id == rdd.id)
              }
              info match {
                // partial sizes (blocks evicted / still draining) are an
                // honest lower bound — report them rather than stalling
                case Some(i) if i.numCachedPartitions > 0 =>
                  (i.memSize + i.diskSize, false)
                case _ =>
                  // status store never saw the blocks: estimate from the
                  // materialized rows instead of recording 0 (the rdd is
                  // already checkpointed, so count() is a local scan) —
                  // and FLAG it, so stats consumers can tell this guess
                  // apart from measured block sizes (data.estimated.rate)
                  (rdd.count() * resp.df.schema.defaultSize, true)
              }
            }
          }.getOrElse((0L, false))
          stats.complete(t, bytes, estimated)
          Right(resp)
        } catch {
          case NonFatal(e) =>
            stats.failed(t)
            Left(RequestError(req.metric, String.valueOf(e.getMessage)))
        }
    }
  }

  /** Free a response's checkpoint blocks once the reply has been
    * consumed/encoded. Without this a long-lived service accumulates
    * executor block-manager storage until the driver GCs the plan and
    * the ContextCleaner notices — at sustained request rates that lag
    * is real memory pressure.
    */
  def release(resp: HistoryResponse): Unit =
    checkpointRdd(resp.df).foreach(_.unpersist(blocking = false))
}
