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
    // windowNs = 0 would make `time % 0` NULL and silently count 0
    // everywhere (or raise mid-job under ANSI) — fail fast instead
    require(windowNs > 0, "windowNs must be positive")
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
    // the value rides inside a struct so that a right row whose value is
    // genuinely NULL is still "the latest right row" (a bare
    // last(ignoreNulls) would skip it and resurrect an older value,
    // diverging from real as-of semantics and DuckDB's ASOF JOIN)
    val vType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", right.schema(valueCol).dataType)))
    val l2 = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
      .withColumn("__vs", lit(null).cast(vType))
    // NULL-key right rows must never fill anything: the window's
    // partitionBy groups NULL keys together (unlike a join, where NULL
    // never equals NULL), so they are excluded here — a NULL-key left
    // row then sits in a right-free partition and gets NULL, matching
    // join (and DuckDB ASOF JOIN) semantics
    val r2 = right.filter(col(key).isNotNull).select(
      col(key),
      col(rightTime).as("__t"),
      lit(0).as("__tag"),
      struct(col(valueCol).as("v")).as("__vs"))
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    u.withColumn(asOfName,
        last(col("__vs"), ignoreNulls = true).over(w).getField("v"))
      .filter(col("__tag") === 1)
      .drop("__t", "__tag", "__vs")
  }
}
