package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — SURVEY §2.5 J3's "as-of join = union +
  * `last(value, ignoreNulls)` window" strategy.
  *
  * For each left row, attach the value of the latest right row with the
  * same key and `rightTime ≤ leftTime`. At 100 TB this beats the naive
  * range-join formulation (which explodes to |L|·|R| candidate pairs per
  * key before picking the max): one hash shuffle on the key, one ordered
  * window pass, zero row explosion — the same plan shape Spark uses for
  * sessionization.
  *
  * Rows with equal times: the right row is visible to the left row (≤
  * bound), enforced by sorting right (tag 0) before left (tag 1) at equal
  * timestamps. The right side must be unique per (key, time) for the
  * result to be well-defined — pre-dedupe if needed.
  */
object AsOfJoin {

  /** Range join via bucketing (SURVEY §2.5 J3 "range join"): count right
    * rows with the same key in `[leftTime − windowNs, leftTime)`.
    *
    * The naive formulation is a non-equi join — Spark plans it as a
    * broadcast nested loop, O(|L|·|R|) per key. Bucketing by
    * `windowNs`-wide epoch buckets turns it into an equi-join: a right
    * row can only qualify for left rows in its own or the next bucket,
    * so each right row is emitted twice (its bucket + successor), joined
    * on `(key, bucket)`, and the exact range predicate filters the rest.
    * One hash shuffle, 2× right-side amplification, no nested loop.
    */
  def countInWindow(left: DataFrame, right: DataFrame, key: String,
                    leftTime: String, rightTime: String, windowNs: Long,
                    countName: String): DataFrame = {
    val l = left.withColumn("__b", col(leftTime) - col(leftTime) % windowNs)
    val r = right.select(col(key).as("__k"), col(rightTime).as("__rt"))
      .withColumn("__b0", col("__rt") - col("__rt") % windowNs)
      .select(col("__k"), col("__rt"),
        explode(array(col("__b0"), col("__b0") + windowNs)).as("__b"))
    val joined = l.join(r,
      l(key) === col("__k") && l("__b") === r("__b") &&
        col("__rt") >= col(leftTime) - windowNs && col("__rt") < col(leftTime),
      "left")
    // left rows must be unique on their own columns (include an id)
    joined.groupBy(left.columns.map(l(_)): _*)
      .agg(count(col("__rt")).as(countName))
  }
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           valueCol: String, asOfName: String): DataFrame = {
    val l2 = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
      .withColumn("__v", lit(null).cast(right.schema(valueCol).dataType))
    val r2 = right.select(
      col(key),
      col(rightTime).as("__t"),
      lit(0).as("__tag"),
      col(valueCol).as("__v"))
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    u.withColumn(asOfName, last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .drop("__t", "__tag", "__v")
  }
}
