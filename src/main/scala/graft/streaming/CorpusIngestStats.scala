package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQueryListener

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** X26 operational telemetry — the corpus-side analogue of
  * [[IngestStats]] (S6): per micro-batch, how many JSONL lines
  * arrived, how many would quarantine (malformed vs field-incomplete
  * — the two evidence classes `CorpusIO.quarantine` separates), and
  * how many documents the first-occurrence dedup gate admitted. This
  * is the dashboard a production crawl actually watches: a malformed
  * spike means the upstream format changed, an incomplete spike means
  * a field was dropped at the source, and a dup-rate collapse means
  * the crawler is re-fetching old content. Counters ride
  * `df.observe(...)` into each batch's `StreamingQueryProgress`,
  * exactly like the metric side — zero extra passes over the data.
  */
object CorpusIngestStats {
  case class BatchStats(
      runId: String,
      batchId: Long,
      timestamp: String,
      nLines: Long,
      nMalformed: Long,
      nIncomplete: Long,
      nAdmitted: Long,
      batchDurationMs: Long)
  /** Driver-side retention cap — the buffer is a ring, not a leak. */
  val MaxRetained = 10000
}

class CorpusIngestStats extends StreamingQueryListener {
  import CorpusIngestStats.BatchStats

  private val buf = mutable.ArrayBuffer.empty[BatchStats]
  // listeners are session-global: without scoping, rows from EVERY
  // query on the session interleave into this table
  @volatile private var boundRunId: Option[String] = None

  /** Scope this collector to one query run (`CorpusIO.streamCurated`
    * calls this with its query's runId). Rows already collected from
    * other runs — possible in the window between listener
    * registration and query start — are pruned.
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
    val dur = Option(p.durationMs.get("triggerExecution"))
      .map(_.toLong)
      .getOrElse(p.durationMs.asScala.values.map(_.toLong).sum)
    buf.synchronized {
      buf += BatchStats(
        p.runId.toString, p.batchId, p.timestamp,
        obs("corpus_in", "n_lines"), obs("corpus_in", "n_malformed"),
        obs("corpus_in", "n_incomplete"), obs("corpus_out", "n_admitted"),
        dur)
      if (buf.length > CorpusIngestStats.MaxRetained)
        buf.remove(0, buf.length - CorpusIngestStats.MaxRetained)
    }
  }

  /** The stats table with the derived dashboard columns:
    * `n_clean = lines − malformed − incomplete` (what passed the
    * split), `n_dup_dropped = clean − admitted` (first-occurrence
    * rejections), and the two rates a crawl alerts on.
    */
  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.when
    val rows = buf.synchronized(buf.toSeq)
    rows.toDF()
      .withColumn("n_clean",
        col("nLines") - col("nMalformed") - col("nIncomplete"))
      .withColumn("n_dup_dropped", col("n_clean") - col("nAdmitted"))
      .withColumn("quarantine_rate",
        when(col("nLines") > 0,
          (col("nMalformed") + col("nIncomplete")).cast("double") /
            col("nLines").cast("double")).otherwise(0.0))
      .withColumn("admit_rate",
        when(col("nLines") > 0,
          col("nAdmitted").cast("double") / col("nLines").cast("double"))
          .otherwise(0.0))
  }
}
