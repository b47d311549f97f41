package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY §4 "partition-by-key
  * parallelism" / prompt checklist "salting for skew").
  *
  * Spark's hash aggregation already solves skewed *low-cardinality
  * groupBy* via map-side partial aggregation, and AQE splits skewed
  * *join* partitions (`spark.sql.adaptive.skewJoin`). Salting is the
  * remaining tool for skewed **windows / groupByKey state** where one
  * key's rows must otherwise land on one task: spread each hot key over
  * `n` salt buckets, do per-bucket work, then merge buckets — valid
  * whenever the per-key operation is a commutative monoid (like `Agg`).
  */
object Salting {

  /** Deterministic salt in [0, n) derived from a distinguishing column
    * (NOT the group key — the point is to split within a key).
    */
  def salt(distinctBy: Column, n: Int): Column =
    pmod(hash(distinctBy), lit(n))

  /** Two-phase salted aggregation of the exact Agg components: stage 1
    * aggregates per (keys, salt), stage 2 merges the salt buckets —
    * bounded fan-in per task regardless of key skew.
    * Input needs `value`, `value_c`, plus the key columns.
    */
  def saltedPointAgg(df: DataFrame, keys: Seq[String], saltBy: String,
                     n: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    val stage1 = df
      .withColumn("__salt", salt(col(saltBy), n))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(
        min("value").as("min_v"),
        max("value").as("max_v"),
        sum("value_c").as("sum_c"),
        count(lit(1)).as("cnt"))
    stage1.groupBy(keyCols: _*)
      .agg(
        min("min_v").as("min_v"),
        max("max_v").as("max_v"),
        sum("sum_c").as("sum_c"),
        sum("cnt").as("cnt"))
  }
}
