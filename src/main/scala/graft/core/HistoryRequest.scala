package graft.core

/** The reference's query protocol: a 4-variant request enum answered per
  * metric (`/root/reference/src/async_hta_service.hpp:346-512`,
  * `HistoryRequest`/`HistoryResponse` protobuf). Times are int64 ns.
  */
sealed trait HistoryRequest { def metric: String }

object HistoryRequest {
  /** Rows of (time, Aggregate) from the coarsest level ≤ intervalMaxNs
    * (ref `:361-391`).
    */
  final case class AggregateTimeline(metric: String, startNs: Long,
                                     endNs: Long, intervalMaxNs: Long)
      extends HistoryRequest

  /** Adaptive: raw TimeValues when the range is finer than every level,
    * else aggregate rows (ref `:393-440`).
    */
  final case class FlexTimeline(metric: String, startNs: Long,
                                endNs: Long, intervalMaxNs: Long)
      extends HistoryRequest

  /** One exact Aggregate over the range (ref `:442-463`). */
  final case class Aggregate(metric: String, startNs: Long, endNs: Long)
      extends HistoryRequest

  /** Newest raw point (ref `:465-487`). */
  final case class LastValue(metric: String) extends HistoryRequest
}

/** FLEX responses are a variant: aggregate rows or raw values
  * (ref `std::get_if<std::vector<hta::Row>>` `:407`).
  */
sealed trait HistoryResponse {
  def df: org.apache.spark.sql.DataFrame
}
object HistoryResponse {
  /** Delta-encoded aggregate rows (schema of `Ingest.present` +
    * `time_delta`).
    */
  final case class Aggregates(df: org.apache.spark.sql.DataFrame) extends HistoryResponse
  /** Raw `(metric, time, value)` rows, delta-encoded time. */
  final case class Raw(df: org.apache.spark.sql.DataFrame) extends HistoryResponse
}
