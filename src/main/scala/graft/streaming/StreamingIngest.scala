package graft.streaming

import graft.core.Intervals
import graft.operators.Ingest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming ingest — the reference's live path (SURVEY §3.1)
  * re-expressed: AMQP DataChunks become a streaming Dataset of points;
  * the per-metric strand becomes the hash shuffle of `groupByKey(metric)`;
  * the monotonic/NaN/Inf gate becomes keyed state in
  * `flatMapGroupsWithState`; `flush()`-then-ack becomes micro-batch
  * checkpoint commit + F3 idempotence (at-least-once ⇒ effectively-once,
  * ref async_hta_service.hpp:308,327 + :263-269).
  *
  * ## Level maintenance without read-modify-write
  *
  * The store is append-only (SURVEY §7 hard-part 5): each micro-batch
  * appends (a) its kept raw points and (b) *partial* level-0 bucket rows
  * computed from the batch. Because the Agg summary is a commutative
  * monoid (A3), partial bucket rows merge on read — `levels()` is a
  * groupBy-merge view — and [[HtaStore.compact]] folds them down
  * physically whenever convenient. No bucket row is ever updated in
  * place, so there are no upsert races; the only cross-batch coupling is
  * the hold segment that bridges a batch boundary, carried by the gate
  * state and replayed as an `anchor` row (segment-only, never re-counted).
  */
object StreamingIngest {

  case class Point(metric: String, time: Long, value: Double, seq: Long)

  /** Per-metric gate state: newest stored timestamp + its value (the
    * value seeds the bridging hold segment of the next batch).
    */
  case class GateState(maxTs: Long, lastValue: Double)

  /** A gated output row: `anchor = true` marks the carried previous point
    * (segment seed), `false` a newly kept point.
    */
  case class GatedPoint(metric: String, time: Long, value: Double, anchor: Boolean)

  /** The keyed-state monotonic gate (T1/T2). Within a batch, points are
    * processed in arrival (`seq`) order — the strand semantics. State
    * seeds from `seed` on first sight of a metric (the reference seeds
    * from `metric.range().second`, ref :259).
    */
  def gate(points: Dataset[Point], seed: Map[String, GateState])(
      implicit spark: SparkSession): Dataset[GatedPoint] = {
    import spark.implicits._
    points.groupByKey(_.metric)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (metric: String, it: Iterator[Point], state: GroupState[GateState]) =>
          val st0 = state.getOption.orElse(seed.get(metric))
          var maxTs = st0.map(_.maxTs).getOrElse(Long.MinValue)
          var lastV = st0.map(_.lastValue).getOrElse(Double.NaN)
          val anchor = st0.map(s => GatedPoint(metric, s.maxTs, s.lastValue, anchor = true))
          val kept = scala.collection.mutable.ArrayBuffer.empty[GatedPoint]
          it.toArray.sortBy(_.seq).foreach { p =>
            if (!p.value.isNaN && !p.value.isInfinite && p.time > maxTs) {
              maxTs = p.time
              lastV = p.value
              kept += GatedPoint(metric, p.time, p.value, anchor = false)
            }
          }
          if (kept.isEmpty) Iterator.empty
          else {
            state.update(GateState(maxTs, lastV))
            (anchor.iterator ++ kept.iterator)
          }
      }
  }

  /** Start the ingest query: gate → foreachBatch dual write into `store`.
    * Ack semantics (T4): the checkpoint commit happens after both writes
    * return — a replayed batch re-runs through the gate, whose state
    * already covers it, and appends nothing (effectively-once).
    */
  def start(spark: SparkSession, points: Dataset[Point], store: HtaStore,
            checkpoint: String, stats: Option[IngestStats] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    stats.foreach(spark.streams.addListener)
    // A8 skip counters as observable metrics (collected per micro-batch by
    // IngestStats; stateless classification — a NaN that is also stale
    // counts as NaN here, unlike the ref's check order, but totals agree)
    val observed = points.toDF()
      .observe("ingest_in",
        count(lit(1)).as("n_in"),
        sum(when(isnan(col("value")), 1L).otherwise(0L)).as("n_nan"),
        sum(when(!isnan(col("value")) &&
          abs(col("value")) === lit(Double.PositiveInfinity), 1L)
          .otherwise(0L)).as("n_inf"))
      .as[Point]
    val gated = gate(observed, store.seedState(spark))
    gated.toDF()
      .observe("ingest_out",
        sum(when(!col("anchor"), 1L).otherwise(0L)).as("n_kept"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        store.writeBatch(spark, batch)
      }
      .start()
  }
}

/** Parquet-backed append-only HTA store: `raw/` (kept points) +
  * `partials/` (level-0 partial buckets, merge-on-read).
  *
  * Layout for scale: raw is partitioned by metric and sorted by time
  * within files (range pruning via parquet min/max on sorted `time`);
  * partials are partitioned by `interval_ns` so a timeline query prunes
  * to one level directory. At 100 TB add a coarse time partition (day)
  * under metric — the bucket math is unchanged.
  */
class HtaStore(val root: String, val intervalMin: Long) {
  val levels: List[Long] = Intervals.ladder(intervalMin)
  private def rawPath = s"$root/raw"
  private def partialsPath = s"$root/partials"

  /** Seed the gate from what is already durable (restart path). */
  def seedState(spark: SparkSession): Map[String, StreamingIngest.GateState] = {
    import spark.implicits._
    if (!new java.io.File(rawPath).exists()) Map.empty
    else spark.read.parquet(rawPath)
      .groupBy("metric")
      .agg(max("time").as("t"), max_by(col("value"), col("time")).as("v"))
      .as[(String, Long, Double)].collect()
      .map { case (m, t, v) => m -> StreamingIngest.GateState(t, v) }.toMap
  }

  /** Append a gated micro-batch: raw points + level-0 partial buckets. */
  def writeBatch(spark: SparkSession, gated: DataFrame): Unit = {
    val batch = gated.cache()
    try {
      // no repartition: micro-batches are already metric-hashed by the
      // gate's groupByKey shuffle; partitionBy splits directories and the
      // local sort keeps row groups time-ordered for min/max pruning
      batch.filter(!col("anchor"))
        .select("metric", "time", "value")
        .sortWithinPartitions("metric", "time")
        .write.mode("append").partitionBy("metric").parquet(rawPath)
      val partial = Ingest.rollupWithAnchors(batch, intervalMin)
      partial.write.mode("append").partitionBy("interval_ns").parquet(partialsPath)
    } finally batch.unpersist()
  }

  def raw(spark: SparkSession): DataFrame = spark.read.parquet(rawPath)

  /** Merge-on-read level-0 view (exact: Agg is a monoid). */
  def level0(spark: SparkSession): DataFrame = {
    val p = spark.read.parquet(partialsPath)
      .filter(col("interval_ns") === intervalMin)
    p.groupBy("metric", "bucket_start").agg(
      min("min_v").as("min_v"),
      max("max_v").as("max_v"),
      sum("sum_c").as("sum_c"),
      sum("cnt").as("cnt"),
      sum("integral_cus").as("integral_cus"),
      sum("active_us").as("active_us"))
      .select(col("metric"), lit(intervalMin).as("interval_ns"),
        col("bucket_start"), col("min_v"), col("max_v"), col("sum_c"),
        col("cnt"), col("integral_cus"), col("active_us"))
  }

  /** Fold partials down physically (run whenever convenient — the
    * merge-on-read view is correct before and after).
    */
  def compact(spark: SparkSession): Unit = {
    val merged = level0(spark).cache()
    merged.count() // materialize before overwrite
    merged.write.mode("overwrite").partitionBy("interval_ns")
      .parquet(s"$root/partials_compacted")
    merged.unpersist()
    // swap directories
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val cur = Paths.get(partialsPath)
    val bak = Paths.get(s"$root/partials_old")
    Files.move(cur, bak)
    Files.move(Paths.get(s"$root/partials_compacted"), cur)
    Files.walk(bak).iterator().asScala.toSeq.reverse
      .foreach(p => Files.delete(p))
  }
}
