package graft.oracle

/** DuckDB SQL equivalents of the engine's HTA pipeline, composed from
  * shared CTE fragments. These run against the same parquet tables
  * (driver registers them by name — `events`, `lineitem`, …).
  *
  * Deliberate redundancy: where the Spark side *merges* levels (A3), the
  * oracle recomputes the rollup directly at the coarse interval — so a
  * hash match also proves the hierarchical-merge/level-consistency
  * property (SURVEY §5.2).
  */
object OracleSql {

  /** The canonical event-time expression: µs-floored ns. `epoch_us*1000`
    * (not `epoch_ns`) so the floor holds on every DuckDB version —
    * newer DuckDBs read parquet `timestamp[ns]` at full ns, which would
    * mismatch the Spark side's µs-floor (`Tables.htaPoints`).
    */
  val tsNs: String = "epoch_us(ts)*1000"


  /** Sanitized, quantized point set — F1/F2/F3 + centivalue.
    * Mirror of `Tables.htaPoints` → `Ingest.sanitize` → `Ingest.quantized`.
    */
  val ptsCte: String =
    s"""WITH pts0 AS (
      |  SELECT event_type AS metric, ${tsNs} AS t, value, event_id AS seq
      |  FROM events
      |  WHERE NOT isnan(value) AND NOT isinf(value)
      |), gate AS (
      |  SELECT metric, t, value,
      |         max(t) OVER (PARTITION BY metric ORDER BY seq
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_prev
      |  FROM pts0
      |), pts AS (
      |  SELECT metric, t, value, CAST(round(value*100) AS BIGINT) AS value_c
      |  FROM gate WHERE max_prev IS NULL OR t > max_prev
      |)""".stripMargin

  /** Exact-domain rollup at interval `i` — mirror of `Ingest.rollup`. */
  def levelCte(i: Long): String =
    s""", pagg AS (
       |  SELECT metric, t - t % $i AS bucket_start,
       |         min(value) AS min_v, max(value) AS max_v,
       |         sum(value_c) AS sum_c, count(*) AS cnt
       |  FROM pts GROUP BY 1, 2
       |), seg AS (
       |  SELECT metric, t, value_c,
       |         lead(t) OVER (PARTITION BY metric ORDER BY t) AS t_next
       |  FROM pts
       |), segx AS (
       |  SELECT metric, value_c, t, t_next,
       |         unnest(generate_series(t - t % $i,
       |                                (t_next-1) - (t_next-1) % $i,
       |                                $i)) AS bucket_start
       |  FROM seg WHERE t_next IS NOT NULL
       |), sagg AS (
       |  SELECT metric, bucket_start,
       |         sum(value_c * ((least(t_next, bucket_start + $i)
       |                         - greatest(t, bucket_start)) // 1000)) AS integral_cus,
       |         sum((least(t_next, bucket_start + $i)
       |              - greatest(t, bucket_start)) // 1000) AS active_us
       |  FROM segx GROUP BY 1, 2
       |), lvl AS (
       |  SELECT coalesce(p.metric, s.metric) AS metric,
       |         coalesce(p.bucket_start, s.bucket_start) AS bucket_start,
       |         p.min_v, p.max_v,
       |         coalesce(p.sum_c, 0) AS sum_c, coalesce(p.cnt, 0) AS cnt,
       |         coalesce(s.integral_cus, 0) AS integral_cus,
       |         coalesce(s.active_us, 0) AS active_us
       |  FROM pagg p FULL OUTER JOIN sagg s
       |    ON p.metric = s.metric AND p.bucket_start = s.bucket_start
       |)""".stripMargin

  /** Presentation projection of `lvl` — mirror of `Ingest.present`. */
  def presentSelect(i: Long, where: String = "", order: String = "metric, bucket_start"): String =
    s"""SELECT metric, CAST($i AS BIGINT) AS interval_ns, bucket_start,
       |       min_v, max_v,
       |       CAST(sum_c AS DOUBLE)/100.0 AS sum_v,
       |       CAST(cnt AS BIGINT) AS cnt,
       |       CAST(integral_cus AS DOUBLE)/1e8 AS integral_vs,
       |       CAST(active_us * 1000 AS BIGINT) AS active_ns
       |FROM lvl $where
       |ORDER BY $order""".stripMargin

  def rollupSql(i: Long): String = ptsCte + levelCte(i) + "\n" + presentSelect(i)

  def timelineSql(i: Long, startNs: Long, endNs: Long): String =
    ptsCte + levelCte(i) + "\n" +
      presentSelect(i, s"WHERE bucket_start + $i > $startNs AND bucket_start < $endNs")

  def sanitizedSql: String =
    ptsCte + "\nSELECT metric, t AS time, value FROM pts ORDER BY metric, time"

  /** Time-ranged sanitized points (inclusive bounds) — the q63 store
    * range-read oracle: `HtaStore.rawRange` over the batch-written
    * day-partitioned layout must return exactly this set.
    */
  def rangedRawSql(startNs: Long, endNs: Long): String =
    ptsCte + s"""
      |SELECT metric, t AS time, value FROM pts
      |WHERE t >= $startNs AND t <= $endNs
      |ORDER BY metric, time""".stripMargin

  def aggregateSql(startNs: Long, endNs: Long): String =
    ptsCte +
      s""", pagg AS (
         |  SELECT metric, min(value) AS min_v, max(value) AS max_v,
         |         sum(value_c) AS sum_c, count(*) AS cnt
         |  FROM pts WHERE t >= $startNs AND t <= $endNs GROUP BY 1
         |), seg AS (
         |  SELECT metric, t, value_c,
         |         lead(t) OVER (PARTITION BY metric ORDER BY t) AS t_next
         |  FROM pts
         |), sagg AS (
         |  SELECT metric,
         |         sum(value_c * ((least(t_next, $endNs)
         |                         - greatest(t, $startNs)) // 1000)) AS integral_cus,
         |         sum((least(t_next, $endNs)
         |              - greatest(t, $startNs)) // 1000) AS active_us
         |  FROM seg
         |  WHERE t_next IS NOT NULL AND t < $endNs AND t_next > $startNs
         |  GROUP BY 1
         |)
         |SELECT coalesce(p.metric, s.metric) AS metric,
         |       CAST($startNs AS BIGINT) AS time_delta,
         |       p.min_v, p.max_v,
         |       CAST(coalesce(p.sum_c, 0) AS DOUBLE)/100.0 AS sum_v,
         |       CAST(coalesce(p.cnt, 0) AS BIGINT) AS cnt,
         |       CAST(coalesce(s.integral_cus, 0) AS DOUBLE)/1e8 AS integral_vs,
         |       CAST(coalesce(s.active_us, 0) * 1000 AS BIGINT) AS active_ns
         |FROM pagg p FULL OUTER JOIN sagg s ON p.metric = s.metric
         |ORDER BY metric""".stripMargin

  def flexRawSql(startNs: Long, endNs: Long): String =
    ptsCte +
      s"\nSELECT metric, t AS time, value FROM pts " +
      s"WHERE t >= $startNs AND t <= $endNs ORDER BY metric, time"

  def lastValueSql: String =
    ptsCte +
      "\nSELECT metric, max(t) AS time, max_by(value, t) AS value " +
      "FROM pts GROUP BY metric ORDER BY metric"

  def deltaEncodeSql(i: Long, startNs: Long, endNs: Long): String =
    ptsCte + levelCte(i) +
      s""", tl AS (
         |  SELECT metric, bucket_start FROM lvl
         |  WHERE bucket_start + $i > $startNs AND bucket_start < $endNs
         |)
         |SELECT metric, bucket_start,
         |       bucket_start - lag(bucket_start, 1, 0)
         |         OVER (PARTITION BY metric ORDER BY bucket_start) AS time_delta
         |FROM tl ORDER BY metric, bucket_start""".stripMargin

  def skipCountersSql: String =
    s"""WITH pts0 AS (
      |  SELECT event_type AS metric, ${tsNs} AS t, value, event_id AS seq
      |  FROM events
      |), flagged AS (
      |  SELECT metric, t, value,
      |         max(CASE WHEN NOT isnan(value) AND NOT isinf(value) THEN t END)
      |           OVER (PARTITION BY metric ORDER BY seq
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_prev
      |  FROM pts0
      |), marked AS (
      |  SELECT metric,
      |         (max_prev IS NOT NULL AND t <= max_prev) AS nonmono,
      |         (NOT (max_prev IS NOT NULL AND t <= max_prev) AND isnan(value)) AS nan,
      |         (NOT (max_prev IS NOT NULL AND t <= max_prev)
      |          AND NOT isnan(value) AND isinf(value)) AS inf
      |  FROM flagged
      |)
      |SELECT metric,
      |       CAST(sum(CASE WHEN nan THEN 1 ELSE 0 END) AS BIGINT) AS skip_nan,
      |       CAST(sum(CASE WHEN inf THEN 1 ELSE 0 END) AS BIGINT) AS skip_inf,
      |       CAST(sum(CASE WHEN nonmono THEN 1 ELSE 0 END) AS BIGINT) AS skip_nonmono,
      |       count(*) AS n_total
      |FROM marked GROUP BY metric ORDER BY metric""".stripMargin

  /** F5/J1: input→logical metric rename via a tiny dimension (broadcast
    * join on the Spark side; unmapped names pass through).
    */
  def inputMappingSql: String =
    ptsCte +
      """
        |SELECT coalesce(m.logical, pts.metric) AS metric,
        |       count(*) AS n, max(t) AS max_time
        |FROM pts LEFT JOIN (
        |  SELECT * FROM (VALUES ('click','web.clicks'),
        |                        ('purchase','web.purchases')) t(input, logical)
        |) m ON pts.metric = m.input
        |GROUP BY 1 ORDER BY 1""".stripMargin

  def joinRevenueSql: String =
    """SELECT r_name, n_name,
      |       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
      |                * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0
      |         AS revenue,
      |       count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  def semiAntiSql: String =
    """WITH w AS (
      |  SELECT c_mktsegment, count(*) AS with_orders FROM customer
      |  WHERE EXISTS(SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  GROUP BY 1
      |), wo AS (
      |  SELECT c_mktsegment, count(*) AS without_orders FROM customer
      |  WHERE NOT EXISTS(SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  GROUP BY 1
      |)
      |SELECT coalesce(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
      |       CAST(coalesce(with_orders, 0) AS BIGINT) AS with_orders,
      |       CAST(coalesce(without_orders, 0) AS BIGINT) AS without_orders
      |FROM w FULL OUTER JOIN wo ON w.c_mktsegment = wo.c_mktsegment
      |ORDER BY 1""".stripMargin

  def windowSuiteSql: String =
    """WITH c AS (
      |  SELECT c_custkey, c_mktsegment, c_acctbal,
      |         CAST(round(c_acctbal*100) AS BIGINT) AS bal_c
      |  FROM customer
      |), r AS (
      |  SELECT *,
      |         row_number() OVER (PARTITION BY c_mktsegment
      |                            ORDER BY c_acctbal DESC, c_custkey) AS rn,
      |         sum(bal_c) OVER (PARTITION BY c_mktsegment
      |                          ORDER BY c_acctbal DESC, c_custkey
      |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_c,
      |         lag(c_acctbal) OVER (PARTITION BY c_mktsegment
      |                              ORDER BY c_acctbal DESC, c_custkey) AS prev_bal
      |  FROM c
      |)
      |SELECT c_mktsegment, c_custkey, c_acctbal,
      |       CAST(rn AS BIGINT) AS rn,
      |       CAST(run_c AS DOUBLE)/100.0 AS running_bal, prev_bal
      |FROM r WHERE rn <= 3
      |ORDER BY c_mktsegment, rn""".stripMargin

  def setOpsSql: String =
    """WITH cn AS (SELECT DISTINCT c_nationkey AS k FROM customer),
      |sn AS (SELECT DISTINCT s_nationkey AS k FROM supplier)
      |SELECT * FROM (
      |  SELECT 'both' AS tag, k FROM (SELECT k FROM cn INTERSECT SELECT k FROM sn)
      |  UNION ALL
      |  SELECT 'cust_only' AS tag, k FROM (SELECT k FROM cn EXCEPT SELECT k FROM sn)
      |  UNION ALL
      |  SELECT 'supp_only' AS tag, k FROM (SELECT k FROM sn EXCEPT SELECT k FROM cn)
      |)
      |ORDER BY tag, k""".stripMargin

  def jsonPropsSql: String =
    """SELECT event_type,
      |       CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
      |       CAST(min(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS min_k,
      |       CAST(max(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k,
      |       count(*) AS cnt
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  def rollupGroupingSql: String =
    """SELECT CAST(grouping(l_returnflag)*2 + grouping(l_linestatus) AS BIGINT) AS gid,
      |       l_returnflag, l_linestatus,
      |       sum(l_quantity) AS sum_qty,
      |       count(DISTINCT l_partkey) AS n_parts,
      |       count(*) AS cnt
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** As-of join oracle: DuckDB's native ASOF LEFT JOIN over deduped
    * per-(user, time) click/purchase streams.
    */
  def asOfSql: String =
    s"""WITH ev AS (
      |  SELECT event_id, user_id, event_type, value, ${tsNs} AS t
      |  FROM events
      |), clicks AS (
      |  SELECT user_id, t, max_by(value, event_id) AS value
      |  FROM ev WHERE event_type = 'click' GROUP BY user_id, t
      |), purchases AS (
      |  SELECT user_id, t, max_by(value, event_id) AS value
      |  FROM ev WHERE event_type = 'purchase' GROUP BY user_id, t
      |)
      |SELECT p.user_id, p.t AS time, p.value, c.value AS last_click_value
      |FROM purchases p ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id AND c.t <= p.t
      |ORDER BY p.user_id, time""".stripMargin

  /** Rate-of-change between consecutive samples — mirror of
    * `TimeSeriesOps.rate`: same exact integer operands, same two IEEE
    * ops (divide then scale) per output value.
    */
  def rateSql: String =
    ptsCte +
      """
        |, d AS (
        |  SELECT metric, t, value_c,
        |         lag(t) OVER (PARTITION BY metric ORDER BY t) AS prev_t,
        |         lag(value_c) OVER (PARTITION BY metric ORDER BY t) AS prev_c
        |  FROM pts
        |)
        |SELECT metric, t AS time,
        |       CAST(value_c - prev_c AS DOUBLE)
        |         / CAST((t - prev_t) // 1000 AS DOUBLE) * 10000.0 AS rate_per_s
        |FROM d WHERE prev_t IS NOT NULL
        |ORDER BY metric, time""".stripMargin

  /** Per-metric availability report — mirror of
    * `TimeSeriesOps.availabilityReport`: gaps are lag deltas >
    * `maxGapNs`, downtime is their exact int64 sum, and the permille
    * is the same integer quotient (`//` ≡ Spark `div`); sums CAST
    * back from DuckDB's HUGEINT widening.
    */
  def availabilitySql(maxGapNs: Long): String =
    ptsCte +
      s"""
         |, d AS (
         |  SELECT metric, t,
         |         t - lag(t) OVER (PARTITION BY metric ORDER BY t) AS delta
         |  FROM pts
         |), r AS (
         |  SELECT metric, min(t) AS first_t, max(t) AS last_t,
         |         CAST(count(*) AS BIGINT) AS n_points,
         |         CAST(sum(CASE WHEN delta > $maxGapNs THEN 1 ELSE 0 END)
         |              AS BIGINT) AS n_gaps,
         |         CAST(sum(CASE WHEN delta > $maxGapNs THEN delta ELSE 0 END)
         |              AS BIGINT) AS downtime_ns
         |  FROM d GROUP BY metric
         |)
         |SELECT metric, first_t, last_t, n_points, n_gaps, downtime_ns,
         |       last_t - first_t AS span_ns,
         |       CASE WHEN (last_t - first_t) // 1000 > 0
         |            THEN CAST(((last_t - first_t - downtime_ns) // 1000)
         |                      * 1000 AS BIGINT)
         |                 // ((last_t - first_t) // 1000)
         |            ELSE CAST(1000 AS BIGINT) END AS availability_permille
         |FROM r ORDER BY metric""".stripMargin

  /** Rolling z-score — mirror of `TimeSeriesOps.rollingZScore`: the
    * same exact int64 rolling sums and the same IEEE shape per row
    * (the repeated mu subexpression is deterministic, so recomputing
    * it equals Spark's column reuse bit-for-bit).
    */
  def rollingZScoreSql(n: Int, k: Double): String =
    ptsCte +
      s"""
         |, r AS (
         |  SELECT metric, t, value_c,
         |         row_number() OVER (PARTITION BY metric ORDER BY t) AS rn,
         |         CAST(sum(value_c) OVER w AS BIGINT) AS sx,
         |         CAST(sum(value_c * value_c) OVER w AS BIGINT) AS sxx
         |  FROM pts
         |  WINDOW w AS (PARTITION BY metric ORDER BY t
         |               ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW)
         |), s AS (
         |  SELECT metric, t, value_c,
         |         CAST(sx AS DOUBLE) / $n.0 AS mu,
         |         CAST(sxx AS DOUBLE) / $n.0
         |           - (CAST(sx AS DOUBLE) / $n.0)
         |             * (CAST(sx AS DOUBLE) / $n.0) AS var0
         |  FROM r WHERE rn >= $n
         |), z AS (
         |  SELECT metric, t, value_c,
         |         CASE WHEN var0 <= 0.0 THEN 0.0
         |              ELSE (CAST(value_c AS DOUBLE) - mu) / sqrt(var0)
         |              END AS z
         |  FROM s
         |)
         |SELECT metric, t AS time, value_c, z, abs(z) > $k AS is_anomaly
         |FROM z ORDER BY metric, time""".stripMargin

  /** Batch sessionization — mirror of `TimeSeriesOps.userSessions`:
    * same (t, event_id) ordering, same island construction, same
    * exact int64 roll-ups (sums CAST back from HUGEINT widening).
    */
  def userSessionsSql(gapNs: Long): String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, ${tsNs} AS t FROM events
       |), d AS (
       |  SELECT user_id, event_id, t,
       |         lag(t) OVER (PARTITION BY user_id
       |                      ORDER BY t, event_id) AS prev
       |  FROM e
       |), s AS (
       |  SELECT user_id, t,
       |         CAST(sum(CASE WHEN prev IS NULL OR t - prev > $gapNs
       |                       THEN 1 ELSE 0 END)
       |              OVER (PARTITION BY user_id ORDER BY t, event_id
       |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |              AS BIGINT) AS session
       |  FROM d
       |), sess AS (
       |  SELECT user_id, session, CAST(count(*) AS BIGINT) AS n_events,
       |         min(t) AS s0, max(t) AS s1
       |  FROM s GROUP BY user_id, session
       |)
       |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
       |       CAST(sum(n_events) AS BIGINT) AS n_events,
       |       CAST(sum(s1 - s0) AS BIGINT) AS total_session_ns,
       |       max(s1 - s0) AS longest_session_ns
       |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Conversion-lag distribution — mirror of
    * `TimeSeriesOps.conversionLag`: same first-touch t0, same
    * strictly-after rule, `quantile_cont` ≡ `percentile` (q57).
    */
  def conversionLagSql(from: String, to: String): String =
    s"""WITH e AS (
       |  SELECT user_id, event_type, ${tsNs} AS t FROM events
       |), v AS (
       |  SELECT user_id, min(t) AS t0 FROM e
       |  WHERE event_type = '$from' GROUP BY user_id
       |), lags AS (
       |  SELECT e.user_id, min(e.t) - min(v.t0) AS lag_ns
       |  FROM e JOIN v ON e.user_id = v.user_id
       |  WHERE e.event_type = '$to' AND e.t > v.t0
       |  GROUP BY e.user_id
       |)
       |SELECT CAST(count(*) AS BIGINT) AS n_converted,
       |       quantile_cont(lag_ns, 0.5) AS p50_ns,
       |       quantile_cont(lag_ns, 0.9) AS p90_ns,
       |       max(lag_ns) AS max_ns
       |FROM lags""".stripMargin

  /** Diurnal profile — mirror of `TimeSeriesOps.hourlyProfile`: exact
    * integer hour-of-day, int64 centivalue sums, the same two IEEE
    * ops (divide then scale) for the mean.
    */
  def hourlyProfileSql: String =
    ptsCte +
      """
        |SELECT metric, (t // 3600000000000) % 24 AS hour,
        |       CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(value_c) AS BIGINT) AS sum_c,
        |       CAST(sum(value_c) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |         / 100.0 AS mean_v
        |FROM pts GROUP BY metric, hour
        |ORDER BY metric, hour""".stripMargin

  /** Threshold-breach episodes — mirror of
    * `TimeSeriesOps.breachEpisodes`: same island ids (running count of
    * non-breaching samples), same exact int64 roll-ups.
    */
  def breachEpisodesSql(thresholdC: Long): String =
    ptsCte +
      s"""
         |, m AS (
         |  SELECT metric, t,
         |         CASE WHEN value_c > $thresholdC THEN 0 ELSE 1 END AS ok
         |  FROM pts
         |), isl AS (
         |  SELECT metric, t, ok,
         |         sum(ok) OVER (PARTITION BY metric ORDER BY t
         |                       ROWS BETWEEN UNBOUNDED PRECEDING
         |                       AND CURRENT ROW) AS island
         |  FROM m
         |), eps AS (
         |  SELECT metric, island, CAST(count(*) AS BIGINT) AS n_samples,
         |         min(t) AS first_t, max(t) AS last_t
         |  FROM isl WHERE ok = 0 GROUP BY metric, island
         |)
         |SELECT metric, CAST(count(*) AS BIGINT) AS n_episodes,
         |       CAST(sum(n_samples) AS BIGINT) AS n_breaching,
         |       max(n_samples) AS longest_episode,
         |       CAST(sum(last_t - first_t) AS BIGINT) AS breach_ns
         |FROM eps GROUP BY metric ORDER BY metric""".stripMargin

  /** Seasonal robust outliers — mirror of
    * `TimeSeriesOps.seasonalOutliers`: `outliersMadSql` keyed by
    * (metric, hour) with the same exact percentiles and IEEE shape.
    */
  def seasonalOutliersSql(k: Double): String =
    ptsCte +
      s"""
         |, ph AS (
         |  SELECT metric, (t // 3600000000000) % 24 AS hour, value_c
         |  FROM pts
         |), med AS (
         |  SELECT metric, hour, quantile_cont(value_c, 0.5) AS med_c
         |  FROM ph GROUP BY metric, hour
         |), dev AS (
         |  SELECT ph.metric, ph.hour,
         |         abs(CAST(value_c AS DOUBLE) - med_c) AS adev, med_c
         |  FROM ph JOIN med ON ph.metric = med.metric AND ph.hour = med.hour
         |), mad AS (
         |  SELECT metric, hour, quantile_cont(adev, 0.5) AS mad_c
         |  FROM dev GROUP BY metric, hour
         |)
         |SELECT dev.metric, dev.hour, min(dev.med_c) AS med_c,
         |       min(mad.mad_c) AS mad_c, count(*) AS n_points,
         |       CAST(sum(CASE WHEN adev > $k * mad.mad_c THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_outliers
         |FROM dev JOIN mad ON dev.metric = mad.metric AND dev.hour = mad.hour
         |GROUP BY dev.metric, dev.hour
         |ORDER BY dev.metric, dev.hour""".stripMargin

  /** Time × value heatmap — mirror of `TimeSeriesOps.valueHeatmap`:
    * same integer-quotient bucketing on the exact ns/centivalue
    * domains, one grouped count with exact cell extremes.
    */
  def valueHeatmapSql(bucketNs: Long, bandC: Long): String =
    ptsCte +
      s"""
         |SELECT metric, t // $bucketNs AS t_bucket, value_c // $bandC AS band,
         |       CAST(count(*) AS BIGINT) AS cnt,
         |       min(value_c) AS min_c, max(value_c) AS max_c
         |FROM pts GROUP BY metric, t_bucket, band
         |ORDER BY metric, t_bucket, band""".stripMargin

  /** Reset-aware counter rate — mirror of `TimeSeriesOps.counterRate`:
    * a negative delta reports the current value as the increase
    * (counter restarted at zero), same exact operands and IEEE op
    * order as [[rateSql]].
    */
  def counterRateSql: String =
    ptsCte +
      """
        |, d AS (
        |  SELECT metric, t, value_c,
        |         lag(t) OVER (PARTITION BY metric ORDER BY t) AS prev_t,
        |         lag(value_c) OVER (PARTITION BY metric ORDER BY t) AS prev_c
        |  FROM pts
        |)
        |SELECT metric, t AS time,
        |       CAST(value_c < prev_c AS BIGINT) AS is_reset,
        |       CAST(CASE WHEN value_c < prev_c THEN value_c
        |                 ELSE value_c - prev_c END AS DOUBLE)
        |         / CAST((t - prev_t) // 1000 AS DOUBLE) * 10000.0 AS rate_per_s
        |FROM d WHERE prev_t IS NOT NULL
        |ORDER BY metric, time""".stripMargin

  /** Robust per-metric outlier summary — mirror of
    * `TimeSeriesOps.outliersMad`: exact centivalue medians
    * (`quantile_cont` ≡ Spark `percentile`, the q57 convention), one
    * IEEE op sequence for the deviation and the k·MAD rule.
    */
  def outliersMadSql(k: Double): String =
    ptsCte +
      s"""
         |, med AS (
         |  SELECT metric, quantile_cont(value_c, 0.5) AS med_c
         |  FROM pts GROUP BY metric
         |), dev AS (
         |  SELECT pts.metric, abs(CAST(value_c AS DOUBLE) - med_c) AS adev, med_c
         |  FROM pts JOIN med ON pts.metric = med.metric
         |), mad AS (
         |  SELECT metric, quantile_cont(adev, 0.5) AS mad_c
         |  FROM dev GROUP BY metric
         |)
         |SELECT dev.metric, min(dev.med_c) AS med_c, min(mad.mad_c) AS mad_c,
         |       count(*) AS n_points,
         |       CAST(sum(CASE WHEN adev > $k * mad_c THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_outliers
         |FROM dev JOIN mad ON dev.metric = mad.metric
         |GROUP BY dev.metric ORDER BY dev.metric""".stripMargin

  /** Regular-grid LOCF resample — oracle via DuckDB's native ASOF LEFT
    * JOIN (latest sample at-or-before each grid instant).
    */
  def gapFillSql(startNs: Long, endNs: Long, stepNs: Long): String =
    ptsCte +
      s"""
         |, metrics AS (SELECT DISTINCT metric FROM pts),
         |grid AS (
         |  SELECT m.metric, g.t AS grid_time
         |  FROM metrics m,
         |       (SELECT unnest(generate_series($startNs, $endNs, $stepNs)) AS t) g
         |)
         |SELECT grid.metric, grid.grid_time, p.value
         |FROM grid ASOF LEFT JOIN pts p
         |  ON grid.metric = p.metric AND p.t <= grid.grid_time
         |ORDER BY grid.metric, grid.grid_time""".stripMargin

  /** Linear-interpolation resample — deliberately the NAIVE bracketing
    * form (correlated max/min per grid row + two value joins) vs the
    * Spark side's single union+window pass; the interpolation formula
    * is written in the same operation order so IEEE doubles agree
    * bitwise.
    */
  def interpolateSql(startNs: Long, endNs: Long, stepNs: Long): String =
    ptsCte +
      s"""
         |, metrics AS (SELECT DISTINCT metric FROM pts),
         |grid AS (
         |  SELECT m.metric, g.t AS grid_time
         |  FROM metrics m,
         |       (SELECT unnest(generate_series($startNs, $endNs, $stepNs)) AS t) g
         |), br AS (
         |  SELECT g.metric, g.grid_time,
         |         (SELECT max(p.t) FROM pts p
         |          WHERE p.metric = g.metric AND p.t <= g.grid_time) AS t1,
         |         (SELECT min(p.t) FROM pts p
         |          WHERE p.metric = g.metric AND p.t > g.grid_time) AS t2
         |  FROM grid g
         |)
         |SELECT br.metric, br.grid_time,
         |       CASE WHEN br.t1 IS NULL THEN NULL
         |            WHEN br.t2 IS NULL THEN
         |              CASE WHEN br.t1 = br.grid_time THEN p1.value END
         |            ELSE p1.value + (p2.value - p1.value) *
         |                 (CAST(br.grid_time - br.t1 AS DOUBLE) /
         |                  CAST(br.t2 - br.t1 AS DOUBLE))
         |       END AS value
         |FROM br
         |LEFT JOIN pts p1 ON p1.metric = br.metric AND p1.t = br.t1
         |LEFT JOIN pts p2 ON p2.metric = br.metric AND p2.t = br.t2
         |ORDER BY br.metric, br.grid_time""".stripMargin

  /** Time-weighted mean per coarse bucket — integral / active_time (ref
    * async_hta_service.hpp:381-388: the Aggregate fields this ratio is
    * derived from; SURVEY §1.1). Computed DIRECTLY from points at the
    * coarse interval, while the engine merges the fine level (A3) — a
    * hash match proves the merge path exact for the twm family. The
    * `/100.0` converts centivalue·µs/µs back to value units in the same
    * IEEE op order as the Spark side.
    */
  def twmSql(i: Long): String =
    ptsCte + levelCte(i) + s"""
       |SELECT metric, bucket_start,
       |       CAST(integral_cus AS DOUBLE) / CAST(active_us AS DOUBLE)
       |         / 100.0 AS twm,
       |       CAST(active_us * 1000 AS BIGINT) AS active_ns
       |FROM lvl WHERE active_us > 0
       |ORDER BY metric, bucket_start""".stripMargin

  /** OHLC downsample — order-independent aggregates only. */
  def ohlcSql(i: Long): String =
    ptsCte +
      s"""
         |SELECT metric, t - t % $i AS bucket_start,
         |       min_by(value, t) AS open, max(value) AS high,
         |       min(value) AS low, max_by(value, t) AS close,
         |       count(*) AS n
         |FROM pts GROUP BY 1, 2
         |ORDER BY metric, bucket_start""".stripMargin

  /** Multi-metric bucket alignment — mirror of
    * `TimeSeriesOps.alignMetrics` over the exact-domain rollup.
    */
  def alignMetricsSql(i: Long, metricA: String, metricB: String): String =
    ptsCte + levelCte(i) +
      s"""
         |SELECT a.bucket_start,
         |       CAST(a.sum_c AS DOUBLE)/100.0 AS sum_a,
         |       CAST(a.cnt AS BIGINT) AS cnt_a,
         |       CAST(b.sum_c AS DOUBLE)/100.0 AS sum_b,
         |       CAST(b.cnt AS BIGINT) AS cnt_b
         |FROM lvl a JOIN lvl b ON a.bucket_start = b.bucket_start
         |WHERE a.metric = '$metricA' AND b.metric = '$metricB'
         |  AND a.cnt > 0 AND b.cnt > 0
         |ORDER BY a.bucket_start""".stripMargin

  /** Pearson correlation from exact integer moments — mirror of
    * `TimeSeriesOps.corrMetrics` (same five int64 sums, same final
    * IEEE op sequence).
    */
  def corrMetricsSql(i: Long, metricA: String, metricB: String): String =
    ptsCte + levelCte(i) +
      s"""
         |, al AS (
         |  SELECT a.sum_c AS x, b.sum_c AS y
         |  FROM lvl a JOIN lvl b ON a.bucket_start = b.bucket_start
         |  WHERE a.metric = '$metricA' AND b.metric = '$metricB'
         |    AND a.cnt > 0 AND b.cnt > 0
         |), m AS (
         |  SELECT count(*) AS n,
         |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |         CAST(sum(x*y) AS BIGINT) AS sxy,
         |         CAST(sum(x*x) AS BIGINT) AS sxx,
         |         CAST(sum(y*y) AS BIGINT) AS syy
         |  FROM al
         |)
         |SELECT n,
         |       CASE WHEN sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
         |                      - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
         |                 * sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
         |                        - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)) = 0 THEN NULL
         |            ELSE (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
         |                  - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
         |                 / (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
         |                         - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
         |                    * sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
         |                           - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) END AS corr_r
         |FROM m""".stripMargin

  def topKSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  def lineitemAggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |       sum(l_quantity) AS sum_qty,
      |       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_base,
      |       (CAST(sum(CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE)/100.0)/count(*) AS avg_disc,
      |       count(*) AS cnt
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
