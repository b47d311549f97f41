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

  /** Sanitized, quantized point set — F1/F2/F3 + centivalue.
    * Mirror of `Tables.htaPoints` → `Ingest.sanitize` → `Ingest.quantized`.
    */
  val ptsCte: String =
    """WITH pts0 AS (
      |  SELECT event_type AS metric, epoch_ns(ts) AS t, value, event_id AS seq
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
      presentSelect(i, s"WHERE bucket_start + $i > $startNs AND bucket_start <= $endNs")

  def sanitizedSql: String =
    ptsCte + "\nSELECT metric, t AS time, value FROM pts ORDER BY metric, time"

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
         |  WHERE bucket_start + $i > $startNs AND bucket_start <= $endNs
         |)
         |SELECT metric, bucket_start,
         |       bucket_start - lag(bucket_start, 1, 0)
         |         OVER (PARTITION BY metric ORDER BY bucket_start) AS time_delta
         |FROM tl ORDER BY metric, bucket_start""".stripMargin

  def skipCountersSql: String =
    """WITH pts0 AS (
      |  SELECT event_type AS metric, epoch_ns(ts) AS t, value, event_id AS seq
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
