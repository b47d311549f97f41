package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryProgress

/** T6 operational telemetry — the reference republishes 14 derived
  * metrics about its own ingest/query activity at a fixed rate
  * (`/root/reference/src/db_stats.cpp:119-216`). Spark-native analogue:
  * `df.observe(...)` counters flow into each micro-batch's
  * `StreamingQueryProgress`; this listener collects them plus engine
  * timings into an `ingest_stats` table with the same derived-rate
  * arithmetic (C5: count/duration, utilization). Scoping/ring
  * machinery comes from [[ScopedQueryListener]].
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

class IngestStats extends ScopedQueryListener[IngestStats.BatchStats] {
  import IngestStats.BatchStats

  override protected def maxRetained: Int = IngestStats.MaxRetained
  override protected def runIdOf(row: BatchStats): String = row.runId

  override protected def rowOf(p: StreamingQueryProgress): BatchStats = {
    val dur = totalDuration(p)
    BatchStats(
      p.runId.toString, p.batchId, p.timestamp, p.numInputRows, dur,
      obs(p, "ingest_in", "n_in"), obs(p, "ingest_in", "n_nan"),
      obs(p, "ingest_in", "n_inf"), obs(p, "ingest_in", "n_ro"),
      obs(p, "ingest_out", "n_kept"),
      if (dur > 0) p.numInputRows.toDouble * 1000.0 / dur else 0.0)
  }

  /** The stats table (C5 derivations included):
    * `n_dropped = n_in − n_kept`,
    * `n_nonmono = dropped − nan − inf − ro` (the four drop classes are
    * disjoint: RO rejection runs first, then NaN, then Inf).
    */
  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    snapshot.toDF()
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
