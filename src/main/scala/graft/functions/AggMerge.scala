package graft.functions

import graft.core.Agg
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregators for the Agg monoid (SURVEY §2.9) — the user-facing
  * UDAF surface. `groupBy(...).agg(AggMerge.toColumn)` merges child
  * aggregates into a parent (A3); [[PointsToAgg]] folds raw `(time-ordered
  * within group is NOT required)` point stats into an Agg (A1's point
  * half; the segment half needs ordering and lives in `Ingest.rollup`).
  *
  * These exist for API ergonomics — the engine's own rollup uses plain
  * `groupBy.agg(min/max/sum)` which Catalyst plans with partial
  * aggregation and codegen (SURVEY §2.9: "built-ins cover it").
  */
object AggMerge extends Aggregator[Agg, Agg, Agg] {
  override def zero: Agg = Agg.empty
  override def reduce(b: Agg, a: Agg): Agg = Agg.merge(b, a)
  override def merge(b1: Agg, b2: Agg): Agg = Agg.merge(b1, b2)
  override def finish(r: Agg): Agg = r
  override def bufferEncoder: Encoder[Agg] = Encoders.product[Agg]
  override def outputEncoder: Encoder[Agg] = Encoders.product[Agg]
}

/** Fold sample values into the point-statistics half of an Agg. */
object PointsToAgg extends Aggregator[Double, Agg, Agg] {
  override def zero: Agg = Agg.empty
  override def reduce(b: Agg, v: Double): Agg = Agg.merge(b, Agg.ofPoint(v))
  override def merge(b1: Agg, b2: Agg): Agg = Agg.merge(b1, b2)
  override def finish(r: Agg): Agg = r
  override def bufferEncoder: Encoder[Agg] = Encoders.product[Agg]
  override def outputEncoder: Encoder[Agg] = Encoders.product[Agg]
}
