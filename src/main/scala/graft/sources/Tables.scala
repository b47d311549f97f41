package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  *
  * All engine time columns are int64 nanoseconds since epoch (`LongType`),
  * never `TimestampType` — Spark timestamps are µs precision and would
  * truncate the reference's ns semantics (SURVEY §1.4).
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet`'s `ts` column, normalized to raw Long ns. The
    * driver has generated this column as parquet `timestamp[ns]` (read as
    * Long via the legacy conf) in some rounds and `timestamp[us]` (read
    * as TIMESTAMP_NTZ — pandas writes isAdjustedToUTC=false) in others,
    * so dispatch on the type actually read. The NTZ→timestamp cast
    * interprets wall time in the session zone; every entry point pins
    * `spark.sql.session.timeZone=UTC` (build.sbt javaOptions + each
    * builder), matching DuckDB's naive-as-UTC `epoch_us(ts)` oracle.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = read(spark, dir, "events")
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampType =>
        df.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case TimestampNTZType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other => throw new IllegalStateException(
        s"events.ts: expected int64-ns, timestamp, or timestamp_ntz; got $other")
    }
  }

  /** The canonical time-series fixture `hta_points` (FIXTURES.md §2):
    * `(metric, time ns, value, seq)` derived deterministically from events.
    * `seq` is the arrival-order column used by the monotonic ingest gate
    * (the fixture defines arrival order as `(time, event_id)`).
    *
    * `time` is the µs-floored ns timestamp: DuckDB (the oracle engine)
    * reads parquet `timestamp[ns]` at µs precision, truncating toward
    * −∞ — and µs-aligned times also make every hold-segment duration an
    * exact integer µs, the precondition of the exact integer domain
    * (`operators/Ingest.scala`).
    */
  def htaPoints(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("event_type").as("metric"),
      eventTimeNs.as("time"),
      col("value"),
      col("event_id").as("seq"))

  /** The canonical event-time column: µs-floored ns (see class doc and
    * `OracleSql.tsNs`, its SQL twin — change both together or the
    * driver's hash gate breaks in the last 3 digits).
    */
  def eventTimeNs: org.apache.spark.sql.Column = {
    val ns = col("ts").cast("long")
    ns - ns % 1000L
  }
}
