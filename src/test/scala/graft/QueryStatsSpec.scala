package graft

import graft.core.{HistoryRequest => R, HistoryResponse => Resp}
import graft.operators.{HtaService, Ingest, QueryDispatcher, QueryStats, RequestError}
import graft.sources.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Read-side telemetry (S6/T6) + per-request failure isolation (T5):
  * the dispatcher must answer errors as values (reference
  * `handler.failed`, async_hta_service.hpp:518-534) and the stats
  * collector must reproduce the 7 derived read metrics of
  * db_stats.cpp:119-216 over a scripted request mix.
  */
class QueryStatsSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import SparkTestBase.sf

  private lazy val sanitized = Ingest.sanitize(Tables.htaPoints(spark, sf)).cache()
  private val levels = SparkEntry.Q.Ladder
  private val start = SparkEntry.Q.Start
  private val end = SparkEntry.Q.End

  /** Deterministic clock: advances 1 ms per reading, so every lifecycle
    * edge (pending→active, active→done) spans exactly 1 ms.
    */
  private def stepClock(): () => Long = {
    var now = 0L
    () => { now += 1000000L; now }
  }

  test("T5: malformed range and unknown metric answer Left, not an exception") {
    val stats = new QueryStats(clock = stepClock())
    val d = new QueryDispatcher(stats, knownMetrics = Some(Set("purchase")))
    val bad = d.dispatch(R.Aggregate("purchase", end, start), sanitized, levels)
    assert(bad == Left(RequestError("purchase", s"malformed range [$end, $start]")))
    val unknown = d.dispatch(R.LastValue("no_such_metric"), sanitized, levels)
    assert(unknown == Left(RequestError("no_such_metric", "unknown metric 'no_such_metric'")))
    val ok = d.dispatch(R.Aggregate("purchase", start, end), sanitized, levels)
    assert(ok.isRight)
    val Right(Resp.Aggregates(df)) = ok: @unchecked
    assert(df.count() == 1)
  }

  test("T5: an exception inside query execution is caught per request") {
    val stats = new QueryStats(clock = stepClock())
    val d = new QueryDispatcher(stats)
    // an empty level ladder makes the timeline path throw internally —
    // the dispatcher must convert it to Left, like handler.failed
    val r = d.dispatch(
      R.AggregateTimeline("purchase", start, end, 1000L), sanitized, Seq.empty)
    assert(r.isLeft)
    // and the service stays usable afterwards
    assert(d.dispatch(R.LastValue("purchase"), sanitized, levels).isRight)
  }

  test("S6/T6: scripted mix produces the 7 read metrics with reference semantics") {
    val stats = new QueryStats(prefix = "test.db.", clock = stepClock())
    val d = new QueryDispatcher(stats, knownMetrics = Some(Set("purchase")))
    // mix: 2 completed, 2 failed (one validation, one unknown metric)
    assert(d.dispatch(R.Aggregate("purchase", start, end), sanitized, levels).isRight)
    assert(d.dispatch(R.LastValue("purchase"), sanitized, levels).isRight)
    assert(d.dispatch(R.Aggregate("purchase", end, start), sanitized, levels).isLeft)
    assert(d.dispatch(R.LastValue("ghost"), sanitized, levels).isLeft)

    val rows = stats.collect()
    val byName = rows.map(s => s.metric -> s).toMap
    assert(byName.keySet == Set(
      "test.db.read.request.rate", "test.db.read.data.rate",
      "test.db.read.pending.time", "test.db.read.utilization",
      "test.db.read.pending.count", "test.db.read.active.count",
      "test.db.read.failed.count", "test.db.read.data.estimated.rate"))

    // 14 clock readings total: 1 construction + 4×(pending,active,done)
    // + this collect → duration = 14−1 = 13 ms; every edge is exactly 1 ms
    val duration = 13e-3
    def v(n: String) = byName(s"test.db.read.$n").value
    assert(math.abs(v("request.rate") - 2 / duration) < 1e-9)
    assert(v("failed.count") == 2.0)
    assert(v("pending.count") == 0.0 && v("active.count") == 0.0)
    assert(math.abs(v("pending.time") - 1e-3) < 1e-12) // 4 × 1 ms / 4 started
    assert(math.abs(v("utilization") - 4e-3 / duration) < 1e-9)
    assert(v("data.rate") > 0) // 2 completed responses carried payload

    // metadata mirrors db_stats.cpp:132-178
    val rate = byName("test.db.read.request.rate")
    assert(rate.unit == "Hz" && rate.quantity == "rate" && rate.scope == "last")
    assert(byName("test.db.read.pending.count").scope == "point")
    assert(byName("test.db.read.pending.time").unit == "s")
    assert(byName("test.db.read.data.rate").unit == "B/s")
    assert(byName("test.db.read.utilization").quantity == "utilization")

    // second tick: deltas were reset, levels persist
    val again = stats.collect().map(s => s.metric -> s.value).toMap
    assert(again("test.db.read.request.rate") == 0.0)
    assert(again("test.db.read.failed.count") == 0.0)
    assert(again("test.db.read.pending.count") == 0.0)

    // the published stream is queryable as a table: 2 ticks × 8 metrics
    // (the reference's 7 + the data.estimated.rate extension)
    val df = stats.toDF(spark)
    assert(df.count() == 16)
    assert(df.columns.toSet == Set(
      "time_ns", "metric", "value", "unit", "quantity", "description", "scope"))
  }

  test("byte accounting reads the checkpoint's block size: no extra job, release frees it") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    // listener events are async — a count is settled once it stops moving
    def settledJobs(): Int = {
      var prev = -1
      var cur = jobs.get()
      while (cur != prev) { Thread.sleep(200); prev = cur; cur = jobs.get() }
      cur
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // baseline: the same request materialized bare (checkpoint only)
      val Resp.Aggregates(base) =
        HtaService.history(R.Aggregate("purchase", start, end),
          sanitized, levels): @unchecked
      val bareCkpt = base.localCheckpoint(true)
      val baseline = settledJobs()
      bareCkpt.unpersist()

      jobs.set(0)
      val stats = new QueryStats(clock = stepClock())
      val d = new QueryDispatcher(stats)
      val Right(resp) =
        d.dispatch(R.Aggregate("purchase", start, end), sanitized, levels): @unchecked
      // byte accounting added NO job beyond the materialization itself —
      // the old count()-based estimate ran one more
      assert(settledJobs() == baseline,
        s"dispatch ran ${jobs.get()} jobs, expected the bare-checkpoint $baseline")
      // and the stat carried real nonzero payload bytes
      val rate = stats.collect().map(s => s.metric -> s.value).toMap
      assert(rate("graft.db.read.data.rate") > 0)

      // the checkpoint's blocks are registered … and release frees them
      def storedIds() = spark.sparkContext.getRDDStorageInfo
        .filter(i => i.memSize + i.diskSize > 0).map(_.id).toSet
      val before = storedIds()
      d.release(resp)
      val deadline = System.currentTimeMillis() + 20000
      while (storedIds().size >= before.size &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
      assert(storedIds().size < before.size,
        "release must drop the response's checkpoint blocks")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("estimated byte sizes are flagged separately from measured ones") {
    val stats = new QueryStats(clock = stepClock())
    val t1 = stats.pending(); stats.active(t1)
    stats.complete(t1, 100L) // measured
    val t2 = stats.pending(); stats.active(t2)
    stats.complete(t2, 40L, estimated = true) // rows × defaultSize guess
    val tick = stats.collect()
    val v = tick.map(s => s.metric -> s.value).toMap
    // 8 clock readings: construction + 2×(pending,active,complete) +
    // this collect → duration = 8−1 = 7 ms
    val duration = 7e-3
    // data.rate carries ALL bytes; data.estimated.rate only the flagged
    // slice — a consumer subtracts to get the measured portion
    assert(math.abs(v("graft.db.read.data.rate") - 140 / duration) < 1e-9)
    assert(math.abs(v("graft.db.read.data.estimated.rate") - 40 / duration) < 1e-9)
    // and the flag resets with the other interval deltas
    val again = stats.collect().map(s => s.metric -> s.value).toMap
    assert(again("graft.db.read.data.estimated.rate") == 0.0)
  }

  test("in-flight requests show up in the point-scope counts") {
    val stats = new QueryStats(clock = stepClock())
    val t1 = stats.pending()
    val t2 = stats.pending()
    stats.active(t1)
    val mid = stats.collect().map(s => s.metric -> s.value).toMap
    assert(mid("graft.db.read.pending.count") == 1.0)
    assert(mid("graft.db.read.active.count") == 1.0)
    stats.complete(t1, 10L)
    stats.active(t2)
    stats.failed(t2)
    val fin = stats.collect().map(s => s.metric -> s.value).toMap
    assert(fin("graft.db.read.pending.count") == 0.0)
    assert(fin("graft.db.read.active.count") == 0.0)
    assert(fin("graft.db.read.failed.count") == 1.0)
  }

  test("dogfood loop: published stats ingest and query back as ordinary metrics") {
    import org.apache.spark.sql.functions._
    // the reference's db_stats metrics are first-class bus metrics a db
    // instance can itself store (db_stats.cpp:119-178). Close the loop:
    // a scripted request mix publishes ticks, the published stream runs
    // through the ordinary ingest gate, and the engine's own query
    // surface answers LAST_VALUE over a self-metric.
    val stats = new QueryStats(prefix = "self.", clock = stepClock())
    val d = new QueryDispatcher(stats, knownMetrics = Some(Set("purchase")))
    (1 to 3).foreach { _ =>
      assert(d.dispatch(R.LastValue("purchase"), sanitized, levels).isRight)
      stats.collect()
    }
    val published = stats.toDF(spark)
    val pts = published.select(col("metric"), col("time_ns").as("time"),
      col("value"), col("time_ns").as("seq"))
    val clean = Ingest.sanitize(pts)
    // finite values + strictly monotonic ticks per metric ⇒ the gate
    // keeps every published sample
    assert(clean.count() == published.count())
    val r = new QueryDispatcher(new QueryStats(clock = stepClock()))
      .dispatch(R.LastValue("self.read.request.rate"), clean, levels)
    val Right(Resp.Raw(df)) = r: @unchecked
    val got = df.head()
    val lastTick = published
      .filter(col("metric") === "self.read.request.rate")
      .orderBy(col("time_ns").desc).head()
    assert(got.getAs[Long]("time") == lastTick.getAs[Long]("time_ns"))
    assert(got.getAs[Double]("value") == lastTick.getAs[Double]("value"))
  }
}
