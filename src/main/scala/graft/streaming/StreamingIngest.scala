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

  /** Identity of a checkpoint as seen by the store: the stable batch-key
    * prefix (`tag`) plus the highest COMMITTED batch id. A batch
    * directory with a larger id was written by a crashed, uncommitted
    * batch that Spark will replay on restart — it is durable but not
    * trustworthy: the gate seed must ignore it (or the replay's
    * overwrite would erase its only copy) and [[HtaStore.compact]] must
    * carry it through unmerged (or the replay would double-count it).
    *
    * The path is canonicalized before hashing: "/ckpt/q1" and
    * "/ckpt/q1/" are the same checkpoint to Spark but would otherwise
    * get different tags, and a replayed batch under a new tag would
    * duplicate instead of overwrite.
    */
  def checkpointIdentity(spark: SparkSession, checkpoint: String): (String, Long) = {
    val hp = new org.apache.hadoop.fs.Path(checkpoint)
    val hfs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val canonical = hfs.makeQualified(hp).toString
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8")).map("%02x".format(_))
      .mkString.take(12)
    val cp = new org.apache.hadoop.fs.Path(s"$checkpoint/commits")
    val committedMax =
      if (!hfs.exists(cp)) -1L
      else hfs.listStatus(cp).map(_.getPath.getName)
        .flatMap(n => scala.util.Try(n.toLong).toOption)
        .foldLeft(-1L)(math.max)
    (tag, committedMax)
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
    val (ckptTag, committedMax) = checkpointIdentity(spark, checkpoint)
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
    val gated = gate(observed, store.seedState(spark, ckptTag, committedMax))
    gated.toDF()
      .observe("ingest_out",
        sum(when(!col("anchor"), 1L).otherwise(0L)).as("n_kept"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // idempotency key = (checkpoint identity, batchId): stable across
        // restarts of the same checkpoint (replay overwrites the same
        // directory) but distinct between queries (a fresh checkpoint
        // restarts batch ids at 0 and must not clobber prior batches)
        store.writeBatch(spark, batch, s"${ckptTag}_$batchId")
      }
      .start()
  }
}

/** Parquet-backed append-only HTA store: `raw/` (kept points) +
  * `partials/` (level-0 partial buckets, merge-on-read).
  *
  * ## Idempotent, batch-keyed writes
  *
  * Each micro-batch writes into its own `batch_id=<n>` directory with
  * OVERWRITE mode. A failure replay (checkpoint not yet committed →
  * state restored to the pre-batch version → the gate re-emits the
  * identical rows) overwrites the same directories with the same
  * content, so at-least-once execution converges to exactly-once
  * storage — including the half-written case where raw/ was flushed but
  * partials/ was not.
  *
  * Layout for scale: raw is partitioned by metric and sorted by time
  * within files (range pruning via parquet min/max on sorted `time`);
  * partials are partitioned by `interval_ns` so a timeline query prunes
  * to one level directory. At 100 TB add a coarse time partition (day)
  * under metric — the bucket math is unchanged — and replace the
  * directory-rename compaction with a transactional table format.
  */
class HtaStore(val root: String, val intervalMin: Long) {
  val levels: List[Long] = Intervals.ladder(intervalMin)
  private def rawPath = s"$root/raw"
  private def partialsPath = s"$root/partials"

  private def fs(spark: SparkSession, p: String) = {
    val hp = new org.apache.hadoop.fs.Path(p)
    (hp.getFileSystem(spark.sparkContext.hadoopConfiguration), hp)
  }

  /** Seed the gate from what is already durable AND committed: batch
    * directories of `ckptTag` with an id above `committedMaxBatch` were
    * written by a crashed, uncommitted batch that is about to be
    * replayed — seeding from them would gate out the replay and lose
    * the data (directories from other checkpoints are trusted as
    * committed). The map is captured in the gate closure — small at
    * our metric cardinality; use the `flatMapGroupsWithState`
    * initial-state overload when metrics number in the millions.
    */
  def seedState(spark: SparkSession, ckptTag: String,
                committedMaxBatch: Long): Map[String, StreamingIngest.GateState] = {
    import spark.implicits._
    val (hfs, hp) = fs(spark, rawPath)
    if (!hfs.exists(hp)) Map.empty
    else spark.read.parquet(rawPath)
      .filter(!col("batch_id").startsWith(s"${ckptTag}_") ||
        substring_index(col("batch_id"), "_", -1).cast("long") <= committedMaxBatch)
      .groupBy("metric")
      .agg(max("time").as("t"), max_by(col("value"), col("time")).as("v"))
      .as[(String, Long, Double)].collect()
      .map { case (m, t, v) => m -> StreamingIngest.GateState(t, v) }.toMap
  }

  /** Write a gated micro-batch idempotently (see class doc). */
  def writeBatch(spark: SparkSession, gated: DataFrame, batchKey: String): Unit = {
    val batch = gated.cache()
    try {
      // no repartition: micro-batches are already metric-hashed by the
      // gate's groupByKey shuffle; partitionBy splits directories and the
      // local sort keeps row groups time-ordered for min/max pruning
      batch.filter(!col("anchor"))
        .select("metric", "time", "value")
        .sortWithinPartitions("metric", "time")
        .write.mode("overwrite").partitionBy("metric")
        .parquet(s"$rawPath/batch_id=$batchKey")
      Ingest.rollupWithAnchors(batch, intervalMin)
        .write.mode("overwrite").partitionBy("interval_ns")
        .parquet(s"$partialsPath/batch_id=$batchKey")
    } finally batch.unpersist()
  }

  def raw(spark: SparkSession): DataFrame =
    spark.read.parquet(rawPath).drop("batch_id")

  /** Merge-on-read level-0 view (exact: Agg is a monoid — same merge as
    * the batch hierarchy builder).
    */
  def level0(spark: SparkSession): DataFrame =
    Ingest.mergeToLevel(
      spark.read.parquet(partialsPath)
        .filter(col("interval_ns") === intervalMin)
        .drop("interval_ns", "batch_id"),
      intervalMin)

  /** Fold partials down physically into a single batch directory.
    *
    * OFFLINE maintenance op: must not run concurrently with the
    * streaming query (it lists-then-deletes batch directories; a
    * concurrent append would be destroyed). Crash-safe via recovery on
    * entry: a crash between the two renames leaves `partials_old`
    * holding the data, restored on the next call.
    *
    * If the owning streaming query might have crashed mid-batch (any
    * stop that was not a clean `query.stop()` after
    * `processAllAvailable`), pass its checkpoint as `activeCheckpoint`:
    * the trailing batch directory that was written but never committed
    * is then carried through UNMERGED under its original batch key, so
    * the replay's overwrite still converges. Folding it into
    * `compacted` would let the replayed batch re-append its partials
    * and double-count that batch in the merge-on-read view.
    */
  def compact(spark: SparkSession, activeCheckpoint: Option[String] = None): Unit = {
    val (hfs, cur) = fs(spark, partialsPath)
    val bak = new org.apache.hadoop.fs.Path(s"$root/partials_old")
    val tmp = new org.apache.hadoop.fs.Path(s"$root/partials_compacted")
    // recovery from a previous crash
    if (hfs.exists(bak) && !hfs.exists(cur)) hfs.rename(bak, cur)
    if (hfs.exists(bak)) hfs.delete(bak, true)
    if (hfs.exists(tmp)) hfs.delete(tmp, true)

    import org.apache.spark.sql.functions.{col, lit, substring_index}
    val uncommitted: org.apache.spark.sql.Column = activeCheckpoint match {
      case Some(ckpt) =>
        val (tag, committedMax) = StreamingIngest.checkpointIdentity(spark, ckpt)
        col("batch_id").startsWith(s"${tag}_") &&
          substring_index(col("batch_id"), "_", -1).cast("long") > committedMax
      case None => lit(false)
    }
    val all = spark.read.parquet(partialsPath)
    val committedMerged = Ingest.mergeToLevel(
        all.filter(!uncommitted)
          .filter(col("interval_ns") === intervalMin)
          .drop("interval_ns", "batch_id"),
        intervalMin)
      .withColumn("batch_id", lit("compacted"))
    // uncommitted trailing-batch partials pass through byte-identical
    // under their original batch key
    val merged = committedMerged.unionByName(
      all.filter(uncommitted).select(committedMerged.columns.map(col): _*))
    merged.write.partitionBy("batch_id", "interval_ns").parquet(tmp.toString)
    // Hadoop rename signals failure by returning false — never delete
    // the backup unless both renames actually happened
    if (!hfs.rename(cur, bak))
      throw new java.io.IOException(s"compact: rename $cur -> $bak failed")
    if (!hfs.rename(tmp, cur)) {
      hfs.rename(bak, cur) // restore; next compact can retry
      throw new java.io.IOException(s"compact: rename $tmp -> $cur failed")
    }
    hfs.delete(bak, true)
  }
}
