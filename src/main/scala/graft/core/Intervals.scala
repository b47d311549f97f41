package graft.core

/** Interval-hierarchy math (all times int64 nanoseconds since epoch).
  *
  * The reference stores, per metric, raw points plus one pre-aggregated
  * timeline per level; levels are `interval_min, interval_min×factor, …`
  * capped below 30 days (`/root/reference/src/tools/metricq_importer/
  * importer.py:61-91`: `interval_max` grows by `factor` while
  * `interval_max * factor < 2.592e15`).
  */
object Intervals {
  /** 30 days in ns — the reference's hierarchy cap (importer.py:75-81). */
  val CapNs: Long = 2592000000000000L

  val NsPerUs: Long = 1000L
  val NsPerSecond: Long = 1000000000L

  /** The level ladder: `min, min*f, …` while `level*f < cap`.
    * Mirrors importer.py:75-81 exactly.
    */
  def ladder(intervalMin: Long, factor: Long = 10L, cap: Long = CapNs): List[Long] = {
    require(intervalMin > 0 && factor > 1, s"bad ladder ($intervalMin, $factor)")
    // also bounds v*factor ≤ cap·factor, far from Long overflow
    require(intervalMin <= cap, s"interval_min $intervalMin above the $cap cap")
    val b = List.newBuilder[Long]
    var v = intervalMin
    b += v
    while (v * factor < cap) { v *= factor; b += v }
    b.result()
  }

  /** Epoch-aligned bucket start; `time` must be ≥ 0 (ns since epoch). */
  def bucketStart(timeNs: Long, intervalNs: Long): Long =
    timeNs - timeNs % intervalNs

  /** AGGREGATE_TIMELINE / FLEX level selection: the coarsest level whose
    * interval is ≤ `intervalMaxNs`; None → raw fallback
    * (ref async_hta_service.hpp:361-440 via `metric.retrieve(…, interval_max)`;
    * selection rule derived from public HTA docs).
    */
  def selectLevel(levels: Seq[Long], intervalMaxNs: Long): Option[Long] =
    levels.filter(_ <= intervalMaxNs) match {
      case Seq() => None
      case fits  => Some(fits.max)
    }
}
