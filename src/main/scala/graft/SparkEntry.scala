package graft

import graft.core.Intervals
import graft.operators.{HtaService, Ingest}
import graft.oracle.OracleSql
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a DuckDB-equivalent in [[oracleSql]]
  * (column names aligned; doubles produced by deterministic exact-domain
  * arithmetic — see `operators/Ingest.scala` doc).
  */
object SparkEntry {

  /** Fixed query parameters for the HTA history-request fixtures. */
  object Q {
    /** 1-hour level-0 interval; ladder = 1 h, 10 h, 100 h (30 d cap). */
    val IntervalMin: Long = 3600000000000L
    val Ladder: List[Long] = Intervals.ladder(IntervalMin) // 3.6e12, 3.6e13, 3.6e14
    /** 2024-01-05T00:00:00Z .. 2024-01-20T00:00:00Z in ns. */
    val Start: Long = 1704412800000000000L
    val End: Long = 1705708800000000000L
    /** Timeline request max interval → selects the 10 h level. */
    val TlIntervalMax: Long = 40000000000000L
    val Level1: Long = 36000000000000L
  }

  private def sanitized(s: SparkSession, dir: String): DataFrame =
    Ingest.sanitize(Tables.htaPoints(s, dir))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_rollup_1h")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A9 surface: grouped aggregation over lineitem (TPC-H Q1 shape)
    "q01_lineitem_agg" -> ((s, dir) => {
      Tables.read(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("base_c"),
          sum(round(col("l_discount") * 100).cast("long")).as("disc_c"),
          count(lit(1)).as("cnt"))
        .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
          (col("base_c").cast("double") / 100.0).as("sum_base"),
          ((col("disc_c").cast("double") / 100.0) / col("cnt")).as("avg_disc"),
          col("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    // F1+F2+F3: sanitized ingest (NaN/Inf drop + monotonic gate)
    "q02_sanitized_points" -> ((s, dir) =>
      sanitized(s, dir).select("metric", "time", "value")
        .orderBy("metric", "time")),
    // A1+A2: level-0 tumbling rollup with boundary-split integral
    "q03_rollup_1h" -> ((s, dir) =>
      Ingest.present(Ingest.rollup(sanitized(s, dir), Q.IntervalMin))
        .orderBy("metric", "bucket_start")),
    // A4: total-range AGGREGATE, exact edges
    "q04_hta_aggregate" -> ((s, dir) =>
      HtaService.aggregateRange(sanitized(s, dir), Q.Start, Q.End)
        .orderBy("metric")),
    // A5+A3: AGGREGATE_TIMELINE at the 10 h level (built by merging the
    // 1 h level — the oracle recomputes directly at 10 h, so a match
    // proves the hierarchy-merge property)
    "q05_timeline_10h" -> ((s, dir) =>
      HtaService.timeline(sanitized(s, dir), Q.Ladder, Q.Start, Q.End,
        Q.TlIntervalMax)),
    // A6: FLEX_TIMELINE raw branch (interval_max below the finest level)
    "q06_flex_raw" -> ((s, dir) =>
      HtaService.flexRaw(sanitized(s, dir), Q.Start, Q.End)),
    // A7: LAST_VALUE per metric
    "q07_last_value" -> ((s, dir) =>
      HtaService.lastValue(sanitized(s, dir)).orderBy("metric")),
    // W4: response delta-encoding of the timeline
    "q08_delta_encode" -> ((s, dir) =>
      HtaService.deltaEncode(
        HtaService.timeline(sanitized(s, dir), Q.Ladder, Q.Start, Q.End,
          Q.TlIntervalMax), "bucket_start")
        .select("metric", "bucket_start", "time_delta")
        .orderBy("metric", "bucket_start")),
    // A8: ingest skip counters
    "q09_skip_counters" -> ((s, dir) =>
      Ingest.skipCounters(Tables.htaPoints(s, dir)).orderBy("metric")),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_lineitem_agg" -> OracleSql.lineitemAggSql,
    "q02_sanitized_points" -> OracleSql.sanitizedSql,
    "q03_rollup_1h" -> OracleSql.rollupSql(Q.IntervalMin),
    "q04_hta_aggregate" -> OracleSql.aggregateSql(Q.Start, Q.End),
    "q05_timeline_10h" -> OracleSql.timelineSql(Q.Level1, Q.Start, Q.End),
    "q06_flex_raw" -> OracleSql.flexRawSql(Q.Start, Q.End),
    "q07_last_value" -> OracleSql.lastValueSql,
    "q08_delta_encode" -> OracleSql.deltaEncodeSql(Q.Level1, Q.Start, Q.End),
    "q09_skip_counters" -> OracleSql.skipCountersSql,
  )
}
