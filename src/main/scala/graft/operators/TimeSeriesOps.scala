package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Derived time-series analytics over the sanitized point set — the
  * operations a monitoring/TSDB consumer layers on top of the
  * reference's raw retrieval surface (rate-of-change, regular-grid
  * resampling, OHLC downsampling). Not present in the reference
  * (`/root/reference/src/async_hta_service.hpp:346-491` serves only the
  * 4 retrieval variants); declared extension surface per SURVEY §2.
  *
  * All outputs follow the exactness discipline (SCALE.md §6): per-row
  * arithmetic on exact integer domains with at most a fixed sequence of
  * IEEE ops per output value — no order-dependent float reductions.
  */
object TimeSeriesOps {

  /** Rate of change (value/second) between consecutive samples of each
    * metric — the Prometheus `rate`/`deriv` shape. One `lag` window per
    * metric (sorted storage makes this a local sort at scale).
    *
    * Exact: dv in centivalue (int64), dt in µs (int64); the rate is
    * two IEEE ops (divide, scale) on those exact operands.
    */
  def rate(sanitized: DataFrame): DataFrame = {
    val w = Window.partitionBy("metric").orderBy("time")
    Ingest.quantized(sanitized)
      .withColumn("prev_t", lag(col("time"), 1).over(w))
      .withColumn("prev_c", lag(col("value_c"), 1).over(w))
      .filter(col("prev_t").isNotNull)
      .select(col("metric"), col("time"),
        ((col("value_c") - col("prev_c")).cast("double") /
          expr("(time - prev_t) div 1000").cast("double") * 10000.0)
          .as("rate_per_s"))
  }

  /** Regular-grid resample with last-observation-carried-forward: one
    * row per (metric, grid instant) for grid times `startNs` to `endNs`
    * step `stepNs`, valued at the latest sample at-or-before the
    * instant (NULL before the first sample).
    *
    * The as-of lookup is the union trick (cf. [[AsOfJoin.asOf]]): grid
    * rows interleave with samples in one per-metric time order and a
    * running `last(value, ignoreNulls)` fills them — one shuffle on
    * `metric`, zero row explosion, vs the naive grid⋈points range join.
    */
  def gapFill(sanitized: DataFrame, startNs: Long, endNs: Long,
              stepNs: Long): DataFrame = {
    val w = Window.partitionBy("metric").orderBy(col("t"), col("is_grid"))
      .rowsBetween(Window.unboundedPreceding, 0)
    gridUnion(sanitized, startNs, endNs, stepNs)
      .withColumn("filled", last(col("value"), ignoreNulls = true).over(w))
      .filter(col("is_grid") === 1)
      .select(col("metric"), col("t").as("grid_time"), col("filled").as("value"))
  }

  /** Shared resampling scaffold: grid rows (one per metric × instant,
    * NULL value, `is_grid = 1`) unioned with the samples in one
    * per-metric `(t, is_grid)` order. The tie-break contract: a sample
    * exactly AT a grid instant sorts before the grid row, so running
    * fills and left brackets see it, forward frames starting at the
    * grid row do not. A NULL metric would fill its own NULL grid row
    * via the windows' partitionBy (which groups NULLs, unlike a join) —
    * excluded here.
    */
  private def gridUnion(sanitized: DataFrame, startNs: Long, endNs: Long,
                        stepNs: Long): DataFrame = {
    require(stepNs > 0 && endNs >= startNs)
    val clean = sanitized.filter(col("metric").isNotNull)
    val grid = clean.select("metric").distinct()
      .select(col("metric"),
        explode(sequence(lit(startNs), lit(endNs), lit(stepNs))).as("t"))
      .withColumn("value", lit(null).cast("double"))
      .withColumn("is_grid", lit(1))
    val pts = clean.select(col("metric"), col("time").as("t"),
      col("value"), lit(0).as("is_grid"))
    pts.unionByName(grid)
  }

  /** Linear-interpolation resample at a regular grid — [[gapFill]]'s
    * sibling for continuous quantities (LOCF holds counters, interp
    * suits gauges): value at grid t = v1 + (v2 − v1)·(t − t1)/(t2 − t1)
    * from the bracketing samples, NULL outside the CLOSED domain
    * [first, last] — a grid instant exactly ON the last sample has no
    * right bracket, but its value is known exactly, so it is emitted
    * (matching [[gapFill]], which also emits that point; beyond it,
    * NULL). Same union+window shape as gapFill — one shuffle on
    * metric, never a per-grid-row join against the point set (the
    * oracle does exactly those naive bracketing joins; the formula is
    * written in the same operation order in both engines, and IEEE
    * doubles make it bitwise reproducible).
    */
  def interpolate(sanitized: DataFrame, startNs: Long, endNs: Long,
                  stepNs: Long): DataFrame = {
    // per the gridUnion tie-break, a sample exactly at a grid instant
    // brackets from the left (t1 = t ⇒ the interpolation collapses to
    // v1 exactly) and is excluded from the forward frame
    val asc = Window.partitionBy("metric").orderBy(col("t"), col("is_grid"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val fwd = Window.partitionBy("metric").orderBy(col("t"), col("is_grid"))
      .rowsBetween(0, Window.unboundedFollowing)
    val sample = when(col("is_grid") === 0, struct(col("t"), col("value")))
    gridUnion(sanitized, startNs, endNs, stepNs)
      .withColumn("p1", last(sample, ignoreNulls = true).over(asc))
      .withColumn("p2", first(sample, ignoreNulls = true).over(fwd))
      .filter(col("is_grid") === 1)
      .select(col("metric"), col("t").as("grid_time"),
        when(col("p1").isNull, lit(null).cast("double"))
          // no right bracket, but the instant IS the last sample: its
          // value is exact — emit it instead of a surprising boundary
          // hole (gapFill emits this point too)
          .when(col("p2").isNull,
            when(col("p1.t") === col("t"), col("p1.value"))
              .otherwise(lit(null).cast("double")))
          .otherwise(col("p1.value") + (col("p2.value") - col("p1.value")) *
            ((col("t") - col("p1.t")).cast("double") /
              (col("p2.t") - col("p1.t")).cast("double"))).as("value"))
  }

  /** Multi-metric timeline alignment (SURVEY §2.5 J3): two metrics'
    * level buckets equi-joined on `bucket_start` — the time-bucket
    * alignment join that turns per-metric timelines into comparable
    * columns. Input is the internal exact level schema
    * ([[Ingest.rollup]]); only point-bearing buckets align (cnt > 0).
    * At scale both sides prune to one metric partition and the join is
    * a shuffle on bucket_start — never a cross product.
    */
  def alignMetrics(level: DataFrame, metricA: String, metricB: String): DataFrame = {
    def side(m: String, tag: String) = level
      .filter(col("metric") === m && col("cnt") > 0)
      .select(col("bucket_start"),
        (col("sum_c").cast("double") / 100.0).as(s"sum_$tag"),
        col("cnt").as(s"cnt_$tag"))
    side(metricA, "a").join(side(metricB, "b"), "bucket_start")
  }

  /** Pearson correlation of two metrics' aligned per-bucket sums,
    * computed from exact integer moments: the five sums (Σx, Σy, Σxy,
    * Σx², Σy²) ride int64 centivalue products (|sum_c| ≤ ~1e6 per
    * bucket ⇒ Σx² ≤ 1e12·buckets, inside int64 for any real range),
    * then r = (nΣxy − ΣxΣy) / (√(nΣx²−Σx²)·√(nΣy²−Σy²)) combines them
    * IN DOUBLE — the cross products nΣx², (Σx)² would overflow int64
    * beyond ~3000 dense buckets, while the double combination is a
    * fixed IEEE op sequence on exact inputs: deterministic at any
    * parallelism, unlike a float `corr()` reduction over rows.
    */
  def corrMetrics(level: DataFrame, metricA: String, metricB: String): DataFrame = {
    // stay in the exact centivalue domain end to end — a round-trip
    // through the presentation doubles could truncate on the cast back
    def side(m: String, tag: String) = level
      .filter(col("metric") === m && col("cnt") > 0)
      .select(col("bucket_start"), col("sum_c").as(tag))
    val aligned = side(metricA, "x").join(side(metricB, "y"), "bucket_start")
    aligned.agg(
        count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n"), {
        def d(c: String) = col(c).cast("double")
        val num = d("n") * d("sxy") - d("sx") * d("sy")
        val den =
          sqrt(d("n") * d("sxx") - d("sx") * d("sx")) *
            sqrt(d("n") * d("syy") - d("sy") * d("sy"))
        // zero variance on either side → undefined correlation → NULL
        // (explicit: ANSI mode would otherwise raise DIVIDE_BY_ZERO)
        when(den === 0.0, lit(null).cast("double"))
          .otherwise(num / den).as("corr_r")
      })
  }

  /** OHLC downsample: per (metric, epoch-aligned bucket) the first /
    * max / min / last sample values and the count — the candlestick
    * shape. Order-independent aggregates only (`min_by`/`max_by` ties
    * are impossible: post-gate times are unique per metric), so the
    * result is deterministic at any parallelism.
    */
  def downsampleOhlc(sanitized: DataFrame, intervalNs: Long): DataFrame =
    sanitized.groupBy(col("metric"),
      (col("time") - col("time") % lit(intervalNs)).as("bucket_start"))
      .agg(
        min_by(col("value"), col("time")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("time")).as("close"),
        count(lit(1)).as("n"))

  /** Reset-aware counter rate — the Prometheus `rate()` contract for
    * monotone counters: a negative delta means the counter restarted
    * at zero, so the increase since the previous sample is the current
    * value itself (the counter climbed from 0 to it), not the raw
    * difference. Same one-`lag`-window-per-metric shape as [[rate]];
    * `is_reset` is surfaced so consumers can audit how often the rule
    * fired. Exact: the increase stays in int64 centivalue, the rate is
    * the same two IEEE ops as [[rate]].
    */
  def counterRate(sanitized: DataFrame): DataFrame = {
    val w = Window.partitionBy("metric").orderBy("time")
    Ingest.quantized(sanitized)
      .withColumn("prev_t", lag(col("time"), 1).over(w))
      .withColumn("prev_c", lag(col("value_c"), 1).over(w))
      .filter(col("prev_t").isNotNull)
      .withColumn("reset", col("value_c") < col("prev_c"))
      // int64 0/1, not boolean: every oracle-facing column stays in the
      // exact numeric/string domains the gate's hash is proven on
      .select(col("metric"), col("time"),
        col("reset").cast("long").as("is_reset"),
        (when(col("reset"), col("value_c"))
          .otherwise(col("value_c") - col("prev_c")).cast("double") /
          expr("(time - prev_t) div 1000").cast("double") * 10000.0)
          .as("rate_per_s"))
  }

  /** Robust outlier summary per metric — median / MAD (median absolute
    * deviation), the standard-deviation-free dispersion pair that one
    * wild sample cannot drag, and the count of points beyond
    * `k`·MAD of the median (the robust z-score rule).
    *
    * Determinism: medians are exact `percentile` over the int64
    * centivalue domain (the q57 convention — Spark `percentile` and
    * DuckDB `quantile_cont` interpolate identically); the deviation,
    * the `k`·MAD threshold, and the comparison are a fixed IEEE op
    * sequence on those exact operands.
    *
    * Scale: two grouped exact percentiles + one broadcast join back on
    * `metric` (metric cardinality is config-sized). Exact percentile
    * buffers each metric's points within its group — the demonstration
    * path; [[outliersMadApprox]] is the 100 TB spelling: the same plan
    * shape with bounded-memory `approx_percentile` sketches (x58
    * measures their error bounds).
    */
  def outliersMad(sanitized: DataFrame, k: Double = 3.0): DataFrame = {
    val q = Ingest.quantized(sanitized)
    val med = q.groupBy("metric")
      .agg(expr("percentile(value_c, 0.5D)").as("med_c"))
    val dev = q.join(broadcast(med), "metric")
      .withColumn("adev", abs(col("value_c").cast("double") - col("med_c")))
    val mad = dev.groupBy("metric")
      .agg(expr("percentile(adev, 0.5D)").as("mad_c"))
    dev.join(broadcast(mad), "metric")
      .groupBy("metric")
      .agg(
        min("med_c").as("med_c"), // constant per metric; min = the value
        min("mad_c").as("mad_c"),
        count(lit(1)).as("n_points"),
        sum(when(col("adev") > lit(k) * col("mad_c"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** The 100 TB spelling of [[outliersMad]]: identical plan shape (two
    * grouped percentile aggregations + two broadcast join-backs), with
    * `approx_percentile` (KLL-style sketch, a fixed-size mergeable
    * buffer per group) replacing the exact `percentile` (which buffers
    * EVERY group row in the aggregation state — fine at config-sized
    * metric cardinality and bench-scale points-per-metric, unbounded
    * memory at 100 TB of points).
    *
    * `accuracy` bounds the RANK error: the returned median is the value
    * at some rank within `n/accuracy` of n/2, so it is always one of
    * the group's actual values (no interpolation — the one semantic
    * difference from the exact path, whose even-n median interpolates
    * between the two middle values) and lies between the group's exact
    * `(0.5 ± 1/accuracy)` quantiles. The outlier comparison then runs
    * against the sketched med/MAD with the same fixed IEEE op sequence.
    * [[outliersMad]] remains the oracle-checked demonstration path
    * (q71); TimeSeriesOpsSpec bounds this one against it by counted
    * rank error.
    */
  def outliersMadApprox(sanitized: DataFrame, k: Double = 3.0,
                        accuracy: Int = 10000): DataFrame = {
    require(accuracy > 0, s"accuracy must be positive, got $accuracy")
    val q = Ingest.quantized(sanitized)
    val med = q.groupBy("metric")
      .agg(expr(s"approx_percentile(value_c, 0.5D, $accuracy)")
        .cast("double").as("med_c"))
    val dev = q.join(broadcast(med), "metric")
      .withColumn("adev", abs(col("value_c").cast("double") - col("med_c")))
    val mad = dev.groupBy("metric")
      .agg(expr(s"approx_percentile(adev, 0.5D, $accuracy)").as("mad_c"))
    dev.join(broadcast(mad), "metric")
      .groupBy("metric")
      .agg(
        min("med_c").as("med_c"),
        min("mad_c").as("mad_c"),
        count(lit(1)).as("n_points"),
        sum(when(col("adev") > lit(k) * col("mad_c"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** First-touch sequential funnel over the events table: step 1 is
    * each user's FIRST `steps.head` event; every later step is the
    * first occurrence of its type strictly after the previous step's
    * match and within `windowNs` of it. "First-touch" is a committed
    * semantic choice (the rule several analytics products ship): a
    * user whose ONLY qualifying chain starts at a later step-1 event
    * does not convert — the alternative ("any qualifying chain")
    * needs per-user sequence scans; this one is |steps|−1 equi-joins.
    * Output: one row per step with the user count and the conversion
    * fraction vs step 1 (a single int/int divide).
    *
    * Scale shape: each step is one user-keyed partial-aggregated
    * groupBy and one user_id equi-join against the (shrinking)
    * reached set; the only NLJ is the 1-row step-1 base joined to the
    * |steps|-row summary.
    *
    * Unit discipline: the strict-after and window-edge comparisons
    * decide on raw `ts` values — a caller comparing against a
    * µs-domain oracle must pass µs-floored time
    * ([[graft.sources.Tables.eventTimeNs]]), as every other events
    * consumer does; sub-µs remainders would flip boundary
    * comparisons between engines.
    */
  def eventFunnel(events: DataFrame, steps: Seq[String],
                  windowNs: Long): DataFrame = {
    require(steps.size >= 2 && steps.distinct == steps && windowNs > 0,
      s"need >= 2 distinct steps and a positive window, got $steps / $windowNs")
    val first = events.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("ts").as("t"))
    val reached = steps.tail.scanLeft(first) { (prev, st) =>
      events.filter(col("event_type") === st)
        .join(prev.select(col("user_id"), col("t").as("tp")), "user_id")
        .filter(col("ts") > col("tp") && col("ts") <= col("tp") + windowNs)
        .groupBy("user_id").agg(min("ts").as("t"))
    }
    val counts = reached.zip(steps).zipWithIndex.map { case ((df, st), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit((i + 1).toLong).as("step"), lit(st).as("event_type"),
          col("n_users"))
    }.reduce(_ unionByName _)
    val base = counts.filter(col("step") === 1)
      .select(col("n_users").as("n_base"))
    counts.crossJoin(broadcast(base))
      .select(col("step"), col("event_type"), col("n_users"),
        when(col("n_base") > 0,
          col("n_users").cast("double") / col("n_base").cast("double"))
          .otherwise(lit(0.0)).as("frac_of_first"))
  }

  /** Retention cohorts over the events table: a user's cohort is the
    * `bucketNs` bucket of their first event; a (cohort, offset) cell
    * counts users active in the bucket `offset` buckets later, with
    * the retention fraction vs the cohort's own size (offset 0). The
    * dashboard behind every "week-N retention" chart.
    *
    * Scale shape: distinct (user, bucket) is ONE shuffle with partial
    * distinct; the cohort assignment is a user-keyed min; the join
    * back is a user_id equi-join; bucket arithmetic is exact int64
    * floor division so the cells hash identically in any engine.
    */
  def retentionCohorts(events: DataFrame, bucketNs: Long): DataFrame = {
    require(bucketNs > 0, s"bucketNs must be positive, got $bucketNs")
    val active = events
      .select(col("user_id"), expr(s"ts div ${bucketNs}L").as("bucket"))
      .distinct()
    val cohort = active.groupBy("user_id").agg(min("bucket").as("cohort_bucket"))
    val cells = active.join(cohort, "user_id")
      .groupBy(col("cohort_bucket"),
        (col("bucket") - col("cohort_bucket")).as("bucket_offset"))
      .agg(count(lit(1)).as("n_users"))
    val bases = cells.filter(col("bucket_offset") === 0)
      .select(col("cohort_bucket"), col("n_users").as("n_cohort"))
    cells.join(bases, Seq("cohort_bucket"))
      .select(col("cohort_bucket"), col("bucket_offset"), col("n_users"),
        (col("n_users").cast("double") / col("n_cohort").cast("double"))
          .as("retention"))
  }

  /** Per-metric data-availability report — the uptime dashboard a
    * monitoring consumer derives from the raw series: a delivery GAP
    * is a consecutive-sample delta exceeding `maxGapNs` (the series
    * was "absent" for that whole delta, the Prometheus staleness
    * convention); the report rolls up gap count, total downtime, and
    * availability in exact integer permille of the observed span.
    *
    * Scale posture: one `lag` window per metric over sorted storage,
    * then one partial-agg groupBy(metric) — the q42/q72 shape. All
    * columns are int64 ns arithmetic; the permille divides in the µs
    * domain (both operands ns-div-1000 first) so its ·1000 product
    * overflows int64 only past a ~292-year single-metric uptime — in
    * the raw ns domain the product would wrap silently (Spark) or
    * raise (DuckDB) at just ~107 days of span.
    */
  def availabilityReport(sanitized: DataFrame, maxGapNs: Long): DataFrame = {
    require(maxGapNs > 0, s"maxGapNs must be positive, got $maxGapNs")
    val w = Window.partitionBy("metric").orderBy("time")
    sanitized
      .withColumn("delta", col("time") - lag(col("time"), 1).over(w))
      .groupBy("metric")
      .agg(min("time").as("first_t"), max("time").as("last_t"),
        count(lit(1)).as("n_points"),
        sum(when(col("delta") > maxGapNs, 1L).otherwise(0L)).as("n_gaps"),
        sum(when(col("delta") > maxGapNs, col("delta")).otherwise(0L))
          .as("downtime_ns"))
      .withColumn("span_ns", col("last_t") - col("first_t"))
      .withColumn("availability_permille",
        when(expr("span_ns div 1000") > 0,
          expr("((span_ns - downtime_ns) div 1000) * 1000" +
            " div (span_ns div 1000)"))
          .otherwise(lit(1000L)))
  }

  /** Rolling z-score anomaly flags — the trailing-window detector
    * (each sample against the mean/σ of its own last `n` samples,
    * complementing the global q71 and seasonal x138 rules with a
    * drift-following baseline). Exact int64 rolling Σx and Σx² over
    * the centivalue domain feed ONE fixed IEEE shape per row
    * (μ = Σx/n; σ² = Σx²/n − μ·μ; z = (x − μ)/sqrt(σ²)); a zero-σ
    * window (all-equal values) reports z = 0 rather than dividing by
    * zero. Rows before a full window are not scored (NULL-free
    * output, the q42 lag convention).
    *
    * Scale posture: one per-metric window over sorted storage
    * computing both running sums in a single pass — the q42/q72
    * shape; no join, no second shuffle.
    */
  def rollingZScore(sanitized: DataFrame, n: Int, k: Double = 3.0): DataFrame = {
    require(n > 1, s"window must have at least 2 samples, got $n")
    val w = Window.partitionBy("metric").orderBy("time")
      .rowsBetween(-(n - 1), 0)
    val cnt = Window.partitionBy("metric").orderBy("time")
    Ingest.quantized(sanitized)
      .withColumn("rn", row_number().over(cnt))
      .withColumn("sx", sum("value_c").over(w))
      .withColumn("sxx", sum(col("value_c") * col("value_c")).over(w))
      .filter(col("rn") >= n)
      .withColumn("mu", col("sx").cast("double") / lit(n.toDouble))
      .withColumn("var0",
        col("sxx").cast("double") / lit(n.toDouble) - col("mu") * col("mu"))
      .withColumn("z",
        when(col("var0") <= 0.0, lit(0.0)).otherwise(
          (col("value_c").cast("double") - col("mu")) / sqrt(col("var0"))))
      .select(col("metric"), col("time"), col("value_c"), col("z"),
        (abs(col("z")) > k).as("is_anomaly"))
  }

  /** Batch sessionization — per-user gaps-and-islands with an
    * inactivity timeout (the batch twin of the q34/q49 session
    * windows, rolled up to the per-user session stats a product
    * dashboard reads): a new session starts when the gap to the
    * user's previous event exceeds `gapNs`. Per user: session count,
    * event count, total and longest session wall-time (single-event
    * sessions span 0 — the x135 convention).
    *
    * Scale posture: two per-user windows over one sort (lag + running
    * sum — the x135 island construction keyed by user), then two
    * bounded groupBys. Ties at one instant order by `event_id` so the
    * island ids are deterministic; a tie never opens a session (gap
    * 0 ≤ gapNs).
    */
  def userSessions(events: DataFrame, gapNs: Long): DataFrame = {
    require(gapNs > 0, s"gapNs must be positive, got $gapNs")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val runW = w.rowsBetween(Window.unboundedPreceding, 0)
    val tagged = events.select("user_id", "event_id", "ts")
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("ts") - col("prev") > gapNs, 1L)
          .otherwise(0L))
      .withColumn("session", sum("is_new").over(runW))
    val sess = tagged.groupBy("user_id", "session")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("s0"), max("ts").as("s1"))
    sess.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"),
        sum(col("s1") - col("s0")).as("total_session_ns"),
        max(col("s1") - col("s0")).as("longest_session_ns"))
  }

  /** Conversion-lag distribution — the funnel's timing companion
    * (x124 counts WHO converts; this reports HOW LONG first
    * `from` → first-strictly-after `to` takes): per converting user
    * the lag is `min ts(to) after t0` − `t0` where `t0 = min
    * ts(from)`, and the corpus-level row carries the converted-user
    * count with exact-percentile p50/p90 and max of the lag (the q57
    * `percentile` ≡ `quantile_cont` convention on the int64 ns
    * domain).
    *
    * Scale posture: two filtered per-user min-aggregations and one
    * user equi-join — partial aggregation everywhere, no window; the
    * final percentile reduces \|converted users\| rows.
    */
  def conversionLag(events: DataFrame, from: String, to: String): DataFrame = {
    val t0 = events.filter(col("event_type") === from)
      .groupBy("user_id").agg(min("ts").as("t0"))
    val lags = events.filter(col("event_type") === to)
      .join(t0, "user_id")
      .filter(col("ts") > col("t0"))
      .groupBy("user_id")
      .agg((min("ts") - min("t0")).as("lag_ns"))
    lags.agg(count(lit(1)).as("n_converted"),
      expr("percentile(lag_ns, 0.5D)").as("p50_ns"),
      expr("percentile(lag_ns, 0.9D)").as("p90_ns"),
      max("lag_ns").as("max_ns"))
  }

  /** Diurnal (hour-of-day) profile — the seasonality baseline an
    * anomaly detector compares against: per (metric, UTC hour-of-day),
    * sample count and mean value. The hour is exact integer arithmetic
    * on the ns domain (`(t div 3600e9) mod 24` — epoch is
    * midnight-aligned); the mean is int64 centivalue sums with ONE
    * final division, order-independent.
    *
    * Scale posture: ONE partial-agg groupBy into ≤ 24·|metrics| cells.
    */
  def hourlyProfile(sanitized: DataFrame): DataFrame =
    Ingest.quantized(sanitized)
      .groupBy(col("metric"),
        expr("(time div 3600000000000) % 24").as("hour"))
      .agg(count(lit(1)).as("cnt"), sum("value_c").as("sum_c"))
      .withColumn("mean_v",
        col("sum_c").cast("double") / col("cnt").cast("double") / 100.0)

  /** Threshold-breach episodes — the alerting roll-up: an EPISODE is a
    * maximal run of consecutive samples with `value_c > thresholdC`
    * (gaps-and-islands on the sample sequence, not wall time). Per
    * metric: episode count, breaching-sample count, the longest
    * episode's sample length, and total breach wall-time (Σ over
    * episodes of last_t − first_t; single-sample episodes contribute
    * 0 — wall-time needs two samples to span).
    *
    * Scale posture: two lag/running windows per metric over sorted
    * storage (island ids via the classic running count of
    * non-breaching rows), one groupBy(metric, island), one
    * groupBy(metric) — the q42/q72 shape with bounded intermediate
    * cardinality (≤ one island row per breaching run).
    */
  def breachEpisodes(sanitized: DataFrame, thresholdC: Long): DataFrame = {
    val w = Window.partitionBy("metric").orderBy("time")
      .rowsBetween(Window.unboundedPreceding, 0)
    val islands = Ingest.quantized(sanitized)
      .withColumn("ok", when(col("value_c") > thresholdC, 0L).otherwise(1L))
      .withColumn("island", sum("ok").over(w))
      .filter(col("ok") === 0L)
    val eps = islands.groupBy("metric", "island")
      .agg(count(lit(1)).as("n_samples"),
        min("time").as("first_t"), max("time").as("last_t"))
    eps.groupBy("metric")
      .agg(count(lit(1)).as("n_episodes"),
        sum("n_samples").as("n_breaching"),
        max("n_samples").as("longest_episode"),
        sum(col("last_t") - col("first_t")).as("breach_ns"))
  }

  /** Seasonality-aware robust outliers — [[outliersMad]]'s k·MAD rule
    * applied within each (metric, UTC hour-of-day) cell instead of
    * globally: a diurnal metric (nightly batch spikes, business-hours
    * load) makes the global rule flag its own seasonality; comparing
    * each sample against ITS HOUR's median/MAD is the detector a
    * monitoring consumer actually wants next to the [[hourlyProfile]]
    * baseline. Exact centivalue `percentile` per cell (the q57
    * convention), deviations and the k·MAD rule in the same fixed
    * IEEE shape as q71.
    *
    * Scale posture: two percentile aggregations into ≤ 24·|metrics|
    * rows (broadcast back), one final partial-agg groupBy — the q71
    * shape with a bounded extra key.
    */
  def seasonalOutliers(sanitized: DataFrame, k: Double = 3.0): DataFrame = {
    val q = Ingest.quantized(sanitized)
      .withColumn("hour", expr("(time div 3600000000000) % 24"))
    val med = q.groupBy("metric", "hour")
      .agg(expr("percentile(value_c, 0.5D)").as("med_c"))
    val dev = q.join(broadcast(med), Seq("metric", "hour"))
      .withColumn("adev", abs(col("value_c").cast("double") - col("med_c")))
    val mad = dev.groupBy("metric", "hour")
      .agg(expr("percentile(adev, 0.5D)").as("mad_c"))
    dev.join(broadcast(mad), Seq("metric", "hour"))
      .groupBy("metric", "hour")
      .agg(
        min("med_c").as("med_c"), // constant per cell; min = the value
        min("mad_c").as("mad_c"),
        count(lit(1)).as("n_points"),
        sum(when(col("adev") > lit(k) * col("mad_c"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Time × value heatmap — the Grafana-style distribution-over-time
    * panel: sample counts per (metric, tumbling `bucketNs` time
    * bucket, `bandC`-centivalue value band), with each cell's exact
    * centivalue extremes for band-edge rendering. Bands use integer
    * `div` on the EXACT centivalue domain (≡ DuckDB `//`, verified on
    * negatives), so negative values band identically in any engine.
    *
    * Scale posture: ONE partial-agg groupBy — the cell count is
    * bounded by (span/bucket)·(range/band)·|metrics| regardless of
    * sample volume, so the exchange shrinks map-side; no window, no
    * join, no sort.
    */
  def valueHeatmap(sanitized: DataFrame, bucketNs: Long, bandC: Long): DataFrame = {
    require(bucketNs > 0 && bandC > 0,
      s"bucketNs and bandC must be positive, got $bucketNs/$bandC")
    Ingest.quantized(sanitized)
      .groupBy(col("metric"),
        expr(s"time div ${bucketNs}L").as("t_bucket"),
        expr(s"value_c div ${bandC}L").as("band"))
      .agg(count(lit(1)).as("cnt"),
        min("value_c").as("min_c"), max("value_c").as("max_c"))
  }
}
