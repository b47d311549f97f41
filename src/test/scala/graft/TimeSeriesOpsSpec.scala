package graft

import graft.operators.{Ingest, TimeSeriesOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TSDB analytics extensions: hand-computed fixtures for rate, LOCF
  * gap-fill, OHLC downsampling, alignment, and exact-moment correlation.
  */
class TimeSeriesOpsSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val M = 60000000000L // 1 min in ns
  private val T0 = 1704067200000000000L

  // (metric, time, value, seq) — two metrics, µs-aligned times
  private def pts = Seq(
    ("a", T0, 10.0, 1L),
    ("a", T0 + 10 * M, 16.0, 2L),
    ("a", T0 + 30 * M, 4.0, 3L),
    ("b", T0 + 5 * M, 2.0, 4L),
    ("b", T0 + 15 * M, 3.0, 5L)
  ).toDF("metric", "time", "value", "seq")

  test("rate: dv/dt per consecutive pair, value per second") {
    val got = TimeSeriesOps.rate(pts).orderBy("metric", "time")
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("a", T0 + 10 * M, 6.0 / 600.0),   // +6 over 10 min
      ("a", T0 + 30 * M, -12.0 / 1200.0),
      ("b", T0 + 15 * M, 1.0 / 600.0)))
  }

  test("counterRate: raw delta when monotone, current value on reset") {
    val got = TimeSeriesOps.counterRate(pts).orderBy("metric", "time")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("a", T0 + 10 * M, 0L, 6.0 / 600.0),  // +600c over 600 s
      ("a", T0 + 30 * M, 1L, 4.0 / 1200.0), // reset: increase = 400c
      ("b", T0 + 15 * M, 0L, 1.0 / 600.0)))
  }

  test("outliersMad: exact median/MAD, count beyond 3·MAD") {
    // c: five values near 1.0 plus one wild 100.0 —
    // med_c = 105, adevs {25,15,5,5,15,9895} → mad_c = 15, one outlier
    val c = Seq(
      ("c", T0, 1.0, 6L), ("c", T0 + M, 1.2, 7L), ("c", T0 + 2 * M, 0.8, 8L),
      ("c", T0 + 3 * M, 1.1, 9L), ("c", T0 + 4 * M, 0.9, 10L),
      ("c", T0 + 5 * M, 100.0, 11L)
    ).toDF("metric", "time", "value", "seq")
    val got = TimeSeriesOps.outliersMad(pts.unionByName(c)).orderBy("metric")
      .as[(String, Double, Double, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 1000.0, 600.0, 3L, 0L),  // adevs {0,600,600}: none > 1800
      ("b", 250.0, 50.0, 2L, 0L),    // interpolated median of two
      ("c", 105.0, 15.0, 6L, 1L)))
  }

  test("outliersMadApprox: rank-bounded vs exact, internally consistent counts") {
    import SparkTestBase.sf
    import graft.sources.Tables
    // real fixture data (hundreds of points per metric) — a 6-point
    // hand fixture can't distinguish sketch error from wrong answers
    val sanitized = Ingest.sanitize(Tables.htaPoints(spark, sf))
    val exact = TimeSeriesOps.outliersMad(sanitized)
      .as[(String, Double, Double, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val approx = TimeSeriesOps.outliersMadApprox(sanitized)
      .as[(String, Double, Double, Long, Long)].collect()
    assert(approx.nonEmpty && approx.length == exact.size)

    // rank-error assertion, the x58 SketchSpec convention: the sketch's
    // answer must be a value whose rank is within ±(n/accuracy + 1) of
    // the true median rank — measured by counting, NOT by interpolated
    // percentile bands (interpolation through a sparse value region
    // yields band edges many value-units from data only 1 rank away)
    val byMetric = Ingest.quantized(sanitized)
      .select(col("metric"), col("value_c").cast("double"))
      .as[(String, Double)].collect().groupBy(_._1)
      .map { case (m, rs) => m -> rs.map(_._2).sorted }
    def rankOk(values: Array[Double], a: Double, p: Double): Boolean = {
      val n = values.length.toDouble
      val lo = values.count(_ < a).toDouble
      val hi = values.count(_ <= a).toDouble
      val eps = n / 10000.0 + 1
      hi >= p * n - eps && lo <= p * n + eps
    }
    approx.foreach { case (m, medA, madA, nP, nOut) =>
      val (_, _, _, nPe, _) = exact(m)
      assert(nP == nPe, s"$m: point counts must be exact")
      val values = byMetric(m)
      assert(rankOk(values, medA, 0.5),
        s"$m: approx median $medA violates the rank-error bound")
      // the MAD sketch runs over deviations from the APPROX median —
      // bound its rank against that same stream
      val adevs = values.map(v => math.abs(v - medA)).sorted
      assert(rankOk(adevs, madA, 0.5),
        s"$m: approx MAD $madA violates the rank-error bound")
      // internal consistency: n_outliers is exactly the count implied
      // by the query's OWN published med/mad — recompute locally
      assert(nOut == adevs.count(_ > 3.0 * madA),
        s"$m: n_outliers inconsistent with published med/mad")
    }

    // plan shape: sketch aggregation, broadcast join-backs, no exact
    // row-buffering percentile anywhere
    val p = TimeSeriesOps.outliersMadApprox(sanitized)
      .queryExecution.sparkPlan.toString
    assert(p.contains("approx_percentile"), p)
    assert(!p.contains("partial_percentile("), "exact percentile leaked into the approx path")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("x84 verdict columns all hold on the fixture") {
    import SparkTestBase.sf
    val rows = SparkEntry.queries("x84_outlier_mad_approx")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("count_exact") && r.getAs[Boolean]("within_med") &&
        r.getAs[Boolean]("within_mad") &&
        r.getAs[Boolean]("outliers_consistent"), r.toString)
    }
  }

  test("gapFill: LOCF on the grid, NULL before first sample, exact-hit visible") {
    val got = TimeSeriesOps.gapFill(pts, T0, T0 + 30 * M, 15 * M)
      .orderBy("metric", "grid_time")
      .as[(String, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("a", T0, Some(10.0)),            // sample exactly at grid instant
      ("a", T0 + 15 * M, Some(16.0)),   // carried from t+10
      ("a", T0 + 30 * M, Some(4.0)),    // sample at instant wins over carry
      ("b", T0, None),                  // before first sample
      ("b", T0 + 15 * M, Some(3.0)),
      ("b", T0 + 30 * M, Some(3.0))))
  }

  test("interpolate: exact at samples, linear between, NULL outside [first,last]") {
    val got = TimeSeriesOps.interpolate(pts, T0, T0 + 30 * M, 15 * M)
      .orderBy("metric", "grid_time")
      .as[(String, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("a", T0, Some(10.0)),             // exact hit collapses to v1
      ("a", T0 + 15 * M, Some(16.0 + (4.0 - 16.0) * (5.0 / 20.0))), // 13.0
      ("a", T0 + 30 * M, Some(4.0)),     // exact hit ON the last sample: known
      ("b", T0, None),                   // before first sample
      ("b", T0 + 15 * M, Some(3.0)),     // exact hit on b's last sample
      ("b", T0 + 30 * M, None)))         // after last: no bracket, unknown
  }

  test("downsampleOhlc: open/high/low/close per bucket") {
    val got = TimeSeriesOps.downsampleOhlc(pts, 20 * M)
      .orderBy("metric", "bucket_start")
      .as[(String, Long, Double, Double, Double, Double, Long)].collect().toSeq
    assert(got == Seq(
      ("a", T0, 10.0, 16.0, 10.0, 16.0, 2L),
      ("a", T0 + 20 * M, 4.0, 4.0, 4.0, 4.0, 1L),
      ("b", T0, 2.0, 3.0, 2.0, 3.0, 2L)))
  }

  test("alignMetrics + corrMetrics against hand-computed moments") {
    val level = Ingest.rollup(Ingest.sanitize(pts), 20 * M)
    val aligned = TimeSeriesOps.alignMetrics(level, "a", "b")
      .orderBy("bucket_start")
      .as[(Long, Double, Long, Double, Long)].collect().toSeq
    // only bucket T0 has points for both metrics (a: 10+16, b: 2+3)
    assert(aligned == Seq((T0, 26.0, 2L, 5.0, 2L)))
    // single aligned bucket → zero variance → NULL correlation
    val r = TimeSeriesOps.corrMetrics(level, "a", "b")
      .as[(Long, Option[Double])].head()
    assert(r == ((1L, None)))
  }

  test("corrMetrics is ±1 on perfectly correlated bucket sums") {
    val perfect = Seq(
      ("x", T0 + 1 * M, 1.0, 1L), ("y", T0 + 2 * M, 2.0, 2L),
      ("x", T0 + 21 * M, 2.0, 3L), ("y", T0 + 22 * M, 4.0, 4L),
      ("x", T0 + 41 * M, 3.0, 5L), ("y", T0 + 42 * M, 6.0, 6L)
    ).toDF("metric", "time", "value", "seq")
    val level = Ingest.rollup(Ingest.sanitize(perfect), 20 * M)
    val r = TimeSeriesOps.corrMetrics(level, "x", "y").as[(Long, Double)].head()
    assert(r._1 == 3L && math.abs(r._2 - 1.0) < 1e-12)
  }

  test("eventFunnel: strict order, window edges, and the first-touch rule") {
    // window = 5; u1 converts fully; u2's click misses the window;
    // u3 clicks with no view (never enters); u4's click precedes its
    // view (strictly-after fails); u5 hits step 2 exactly AT the
    // window edge (<= passes) but its purchase shares the click's ts
    // (strictly-after fails); u6 pins FIRST-touch: its second view
    // would put the click in-window, but step 1 binds to the first.
    val ev = Seq(
      (1L, "view", 100L), (1L, "click", 101L), (1L, "purchase", 103L),
      (2L, "view", 100L), (2L, "click", 106L),
      (3L, "click", 100L), (3L, "purchase", 101L),
      (4L, "click", 99L), (4L, "view", 100L),
      (5L, "view", 100L), (5L, "click", 105L), (5L, "purchase", 105L),
      (6L, "view", 100L), (6L, "view", 110L), (6L, "click", 112L)
    ).toDF("user_id", "event_type", "ts")
    val got = TimeSeriesOps.eventFunnel(ev, Seq("view", "click", "purchase"), 5L)
      .as[(Long, String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "view", 5L, 1.0),      // u1, u2, u4, u5, u6
      (2L, "click", 2L, 0.4),     // u1, u5
      (3L, "purchase", 1L, 0.2))) // u1
  }

  test("retentionCohorts: cohort = first bucket; singleton and shared cohorts") {
    // bucket size 10: u1 active in buckets {0, 1, 3} (cohort 0),
    // u2 {1, 2} and u3 {1} share cohort 1 → its offset-1 cell keeps
    // only u2 (retention 0.5). Duplicate events inside one bucket
    // (u1's two ts in bucket 0) count the user once.
    val ev = Seq(
      (1L, "view", 0L), (1L, "view", 7L), (1L, "click", 12L), (1L, "view", 35L),
      (2L, "view", 11L), (2L, "click", 25L),
      (3L, "view", 19L)
    ).toDF("user_id", "event_type", "ts")
    val got = TimeSeriesOps.retentionCohorts(ev, 10L)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (0L, 0L, 1L, 1.0), (0L, 1L, 1L, 1.0), (0L, 3L, 1L, 1.0),
      (1L, 0L, 2L, 1.0), (1L, 1L, 1L, 0.5)))
  }

  test("availabilityReport: gap counting, downtime, permille; single-point span") {
    // a: deltas 10m, 20m with maxGap 15m → one gap of 20m over a 30m
    // span → availability = 10m·1000 div 30m = 333. b: no gap → 1000.
    // c: one point → zero span, defined as fully available.
    val one = pts.union(Seq(("c", T0, 1.0, 9L)).toDF(
      "metric", "time", "value", "seq"))
    val got = TimeSeriesOps.availabilityReport(one, 15 * M).orderBy("metric")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", T0, T0 + 30 * M, 3L, 1L, 20 * M, 30 * M, 333L),
      ("b", T0 + 5 * M, T0 + 15 * M, 2L, 0L, 0L, 10 * M, 1000L),
      ("c", T0, T0, 1L, 0L, 0L, 0L, 1000L)))
  }

  test("hourlyProfile: UTC hour cells, exact sums, two-op mean") {
    // T0 is 2024-01-01 00:00 UTC. a's samples sit at 00:00, 00:10,
    // 00:30 → all hour 0; b's at 00:05 and 00:15 → hour 0. Shift two
    // extra samples into hour 1 and hour 23 to pin the mod arithmetic.
    val H = 3600000000000L
    val more = pts.union(Seq(
      ("a", T0 + H + 5 * M, 7.0, 10L),
      ("a", T0 + 23 * H, 1.0, 11L)).toDF("metric", "time", "value", "seq"))
    val got = TimeSeriesOps.hourlyProfile(more).orderBy("metric", "hour")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("a", 0L, 3L, 3000L, 10.0),  // 10+16+4 → mean 10.0
      ("a", 1L, 1L, 700L, 7.0),
      ("a", 23L, 1L, 100L, 1.0),
      ("b", 0L, 2L, 500L, 2.5)))
  }

  test("breachEpisodes: island boundaries, single-sample wall time, longest run") {
    // threshold 5.00 (500c). m: values 6,7,3,8,9,2,6 at minutes
    // 0..6 → episodes {6,7} (2 samples, 1 min), {8,9} (2 samples,
    // 1 min), {6} (1 sample, 0 wall time) → 3 episodes, 5 breaching,
    // longest 2, breach_ns = 2 min. n: never breaches → NO row.
    val vals = Seq(6.0, 7.0, 3.0, 8.0, 9.0, 2.0, 6.0)
    val ev = vals.zipWithIndex.map { case (v, i) =>
      ("m", T0 + i * M, v, i.toLong)
    } :+ (("n", T0, 1.0, 99L))
    val got = TimeSeriesOps.breachEpisodes(
      ev.toDF("metric", "time", "value", "seq"), 500L)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("m", 3L, 5L, 2L, 2 * M)))
  }

  test("rollingZScore: partial windows dropped, zero-sigma guard, hand-checked z") {
    // n=3 over values 1,1,7,7,7 (centivalues 100..700): rows 1-2 have
    // no full window; row 3's window (100,100,700) has mu=300,
    // var=80000; row 4's (100,700,700) mu=500, var=80000; row 5's is
    // all-equal → z defined 0. Expected z uses the SAME IEEE ops.
    val ev = Seq(1.0, 1.0, 7.0, 7.0, 7.0).zipWithIndex.map {
      case (v, i) => ("m", T0 + i * M, v, i.toLong)
    }.toDF("metric", "time", "value", "seq")
    val got = TimeSeriesOps.rollingZScore(ev, 3).orderBy("time")
      .as[(String, Long, Long, Double, Boolean)].collect().toSeq
    val s = math.sqrt(80000.0)
    assert(got == Seq(
      ("m", T0 + 2 * M, 700L, 400.0 / s, false),
      ("m", T0 + 3 * M, 700L, 200.0 / s, false),
      ("m", T0 + 4 * M, 700L, 0.0, false)))
  }

  test("userSessions: island boundaries at the gap, ties never open a session") {
    // gap 10: u1 events at 0,5,7 (one session, span 7), 30,31 (second,
    // span 1), 60 (third, span 0); u2 has two events AT THE SAME
    // instant (tie → one session, span 0)
    val ev = Seq(
      (1L, 100L, 0L), (1L, 101L, 5L), (1L, 102L, 7L),
      (1L, 103L, 30L), (1L, 104L, 31L), (1L, 105L, 60L),
      (2L, 106L, 9L), (2L, 107L, 9L)
    ).toDF("user_id", "event_id", "ts")
    val got = TimeSeriesOps.userSessions(ev, 10L).orderBy("user_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 6L, 8L, 7L),
      (2L, 1L, 2L, 0L, 0L)))
  }

  test("conversionLag: first-touch t0, strictly-after rule, exact percentiles") {
    // u1: view@0 purchase@10 → lag 10; u2: view@0 purchase@30 → 30;
    // u3: view@0 purchase@50 → 50; u4: purchase BEFORE its view →
    // no conversion; u5: view only. p50 of {10,30,50} = 30,
    // p90 = 30 + 0.8·20 = 46 (linear interpolation, both engines)
    val ev = Seq(
      (1L, "view", 0L), (1L, "purchase", 10L),
      (2L, "view", 0L), (2L, "purchase", 30L),
      (3L, "view", 0L), (3L, "purchase", 50L),
      (4L, "purchase", 5L), (4L, "view", 8L),
      (5L, "view", 3L)
    ).toDF("user_id", "event_type", "ts")
    val got = TimeSeriesOps.conversionLag(ev, "view", "purchase")
      .as[(Long, Double, Double, Long)].collect().toSeq
    assert(got == Seq((3L, 30.0, 46.0, 50L)))
  }

  test("seasonalOutliers: flags the planted spike per hour, never the seasonality") {
    // a strongly diurnal metric: hour 0 sits at 10, hour 1 at 100 —
    // a GLOBAL median/MAD would flag entire hours; the seasonal rule
    // must flag exactly the one planted spike in each hour cell
    // (per-cell MAD is 0, so any deviation from the cell median trips)
    val H = 3600000000000L
    val ev = (Seq(10.0, 10.0, 10.0, 10.0, 50.0).zipWithIndex.map {
      case (v, i) => ("m", T0 + i * M, v, i.toLong)
    } ++ Seq(100.0, 100.0, 100.0, 100.0, 500.0).zipWithIndex.map {
      case (v, i) => ("m", T0 + H + i * M, v, 10L + i)
    }).toDF("metric", "time", "value", "seq")
    val got = TimeSeriesOps.seasonalOutliers(ev).orderBy("hour")
      .as[(String, Long, Double, Double, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("m", 0L, 1000.0, 0.0, 5L, 1L),
      ("m", 1L, 10000.0, 0.0, 5L, 1L)))
  }

  test("valueHeatmap: cell counts, extremes, negative-centivalue banding") {
    // bands of 500c (5 units); 20-min buckets. T0 is 20m-aligned, so
    // a's first two samples share a bucket and land in bands 2 and 3;
    // the third rolls into the next bucket, band 0. b's two samples
    // (200c, 300c) share a cell with exact extremes. neg: -6.0 →
    // -600c div 500 = -1 and -2.0 → -200c div 500 = 0 (int64 `div`
    // truncates toward zero — the pinned cross-engine convention).
    val neg = pts.union(Seq(("neg", T0, -6.0, 6L), ("neg", T0 + M, -2.0, 7L))
      .toDF("metric", "time", "value", "seq"))
    val b0 = T0 / (20 * M)
    val got = TimeSeriesOps.valueHeatmap(neg, 20 * M, 500L)
      .orderBy("metric", "t_bucket", "band")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", b0, 2L, 1L, 1000L, 1000L),
      ("a", b0, 3L, 1L, 1600L, 1600L),
      ("a", b0 + 1, 0L, 1L, 400L, 400L),
      ("b", b0, 0L, 2L, 200L, 300L),
      ("neg", b0, -1L, 1L, -600L, -600L),
      ("neg", b0, 0L, 1L, -200L, -200L)))
  }
}
