package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** T6 operational telemetry — the reference republishes 14 derived
  * metrics about its own ingest/query activity at a fixed rate
  * (`/root/reference/src/db_stats.cpp:119-216`). Spark-native analogue:
  * `df.observe(...)` counters flow into each micro-batch's
  * `StreamingQueryProgress`; this listener collects them plus engine
  * timings into an `ingest_stats` table with the same derived-rate
  * arithmetic (C5: count/duration, utilization).
  */
object IngestStats {
  case class BatchStats(
      runId: String,
      batchId: Long,
      timestamp: String,
      numInputRows: Long,
      batchDurationMs: Long,
      nIn: Long, nNan: Long, nInf: Long, nRo: Long, nKept: Long,
      rowsPerSec: Double)
  /** Driver-side retention cap — the buffer is a ring, not a leak. */
  val MaxRetained = 10000
}

class IngestStats extends StreamingQueryListener {
  import IngestStats.BatchStats

  private val buf = mutable.ArrayBuffer.empty[BatchStats]
  // listeners are session-global: without scoping, rows from EVERY
  // query on the session interleave into this table
  @volatile private var boundRunId: Option[String] = None

  /** Scope this collector to one query run (StreamingIngest.start calls
    * this with its query's runId). Rows already collected from other
    * runs — possible in the window between listener registration and
    * query start — are pruned.
    */
  def bind(runId: java.util.UUID): Unit = {
    val r = runId.toString
    boundRunId = Some(r)
    buf.synchronized {
      val keep = buf.filter(_.runId == r)
      buf.clear()
      buf ++= keep
    }
  }

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    if (boundRunId.exists(_ != p.runId.toString)) return
    def obs(name: String, field: String): Long =
      Option(p.observedMetrics.get(name))
        .map(r => r.getAs[Long](field)).getOrElse(0L)
    // durationMs holds the total ("triggerExecution") AND its component
    // phases — summing the map double-counts the batch duration
    val dur = Option(p.durationMs.get("triggerExecution"))
      .map(_.toLong)
      .getOrElse(p.durationMs.asScala.values.map(_.toLong).sum)
    buf.synchronized {
      buf += BatchStats(
        p.runId.toString, p.batchId, p.timestamp, p.numInputRows, dur,
        obs("ingest_in", "n_in"), obs("ingest_in", "n_nan"),
        obs("ingest_in", "n_inf"), obs("ingest_in", "n_ro"),
        obs("ingest_out", "n_kept"),
        if (dur > 0) p.numInputRows.toDouble * 1000.0 / dur else 0.0)
      if (buf.length > IngestStats.MaxRetained)
        buf.remove(0, buf.length - IngestStats.MaxRetained)
    }
  }

  /** The stats table (C5 derivations included):
    * `n_dropped = n_in − n_kept`,
    * `n_nonmono = dropped − nan − inf − ro` (the four drop classes are
    * disjoint: RO rejection runs first, then NaN, then Inf).
    */
  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = buf.synchronized(buf.toSeq)
    rows.toDF()
      .withColumn("n_dropped",
        org.apache.spark.sql.functions.col("nIn") -
          org.apache.spark.sql.functions.col("nKept"))
      .withColumn("n_nonmono",
        org.apache.spark.sql.functions.col("n_dropped") -
          org.apache.spark.sql.functions.col("nNan") -
          org.apache.spark.sql.functions.col("nInf") -
          org.apache.spark.sql.functions.col("nRo"))
  }
}
