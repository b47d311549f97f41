package graft.sources

import graft.operators.Ingest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S4 — bulk backfill, the reference's `metricq_importer` path
  * (`/root/reference/src/tools/metricq_importer/importer.py:197-249`:
  * MySQL, 10 M-row chunks, N workers). Spark-native: `spark.read.jdbc`
  * with range partitioning replaces the hand-rolled chunk loop — each
  * partition is an independent task, the analogue of the importer's
  * async workers — and the result flows through the SAME sanitize +
  * rollup pipeline as streaming ingest (batch mode).
  *
  * The JDBC path cannot run in this zero-egress environment (no
  * database); [[fromDataFrame]] is the tested core, [[fromJdbc]] the
  * thin production wiring over it.
  */
object BulkImport {

  /** Backfill from any batch DataFrame of `(metric, time, value, seq)`:
    * sanitize (F1–F3) then level-0 rollup — identical semantics to
    * replaying the data through the streaming gate in one batch.
    * NOTE: the sanitize window partitions by metric, so a single-metric
    * import of billions of rows serializes into one task — chunk such
    * imports by time range and feed them through the streaming path
    * (anchor rows carry the cross-chunk segments), exactly like the
    * reference importer's 10 M-row chunks.
    */
  def fromDataFrame(points: DataFrame, intervalMin: Long): (DataFrame, DataFrame) = {
    val clean = Ingest.sanitize(points)
    (clean, Ingest.rollup(clean, intervalMin))
  }

  /** Production wiring: partitioned JDBC scan → backfill. `chunkRows`
    * mirrors the importer's 10 M-row chunking via partition count on the
    * `time` column (predicate pushdown gives each task a range scan).
    */
  def fromJdbc(spark: SparkSession, url: String, table: String,
               metricName: String, minTime: Long, maxTime: Long,
               numPartitions: Int, intervalMin: Long,
               props: java.util.Properties = new java.util.Properties)
      : (DataFrame, DataFrame) = {
    // jdbc() bounds only set the partition stride — the outer partitions
    // are unbounded predicates, so filter explicitly for a bounded import
    val raw = spark.read.jdbc(url, table, "timestamp", minTime, maxTime,
      numPartitions, props)
      .where(col("timestamp") >= minTime && col("timestamp") < maxTime)
      .select(lit(metricName).as("metric"),
        col("timestamp").as("time"),
        col("value"),
        col("timestamp").as("seq")) // importer reads in time order
    fromDataFrame(raw, intervalMin)
  }
}
