package graft

import graft.streaming.{HtaStore, StreamingIngest}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Store-layout pruning — SCALE.md §1's table, enforced: the partition
  * columns the store writes (`metric` under raw, `interval_ns` under
  * partials) must surface as PartitionFilters on the scan, so a
  * per-metric or per-level query touches only its directories.
  */
class StorePruningSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val H = 3600000000000L
  private val T0 = 1704067200000000000L

  private val D = HtaStore.DayNs

  private lazy val store = {
    val s = new HtaStore(
      java.nio.file.Files.createTempDirectory("hta-prune").toString, H)
    val gated = Seq(
      StreamingIngest.GatedPoint("m1", T0 + 1000L, 1.0, anchor = false),
      StreamingIngest.GatedPoint("m1", T0 + H + 1000L, 2.0, anchor = false),
      StreamingIngest.GatedPoint("m1", T0 + 3 * D + 1000L, 4.0, anchor = false),
      StreamingIngest.GatedPoint("m2", T0 + 2000L, 3.0, anchor = false)).toDF()
    s.writeBatch(spark, gated, "t_0")
    s
  }

  private def scanString(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")

  test("a per-metric raw read prunes to the metric directory") {
    val scan = scanString(store.raw(spark).filter(col("metric") === "m1"))
    assert(scan.contains("PartitionFilters") && scan.contains("metric#"),
      s"metric not a partition filter:\n$scan")
    // and the time predicate is pushed to the reader for row-group skipping
    val scan2 = scanString(store.raw(spark)
      .filter(col("metric") === "m1" && col("time") >= T0 + H))
    assert(scan2.contains("PushedFilters") &&
      scan2.contains("GreaterThanOrEqual(time"), s"time not pushed:\n$scan2")
  }

  test("a time-ranged raw read prunes to its day directories") {
    val ranged = store.rawRange(spark, T0, T0 + 2 * H)
    val scan = scanString(ranged)
    // the derived day range is a PARTITION filter (directory pruning),
    // the time range a pushed data filter (row-group skipping)
    assert(scan.contains("PartitionFilters") && scan.contains("day#"),
      s"day not a partition filter:\n$scan")
    assert(scan.contains("PushedFilters") &&
      scan.contains("GreaterThanOrEqual(time"), s"time not pushed:\n$scan")
    // the day-3 point is outside the range; the first two survive
    assert(ranged.select("value").as[Double].collect().toSet == Set(1.0, 2.0, 3.0))
    // and the layout really is one directory per metric-day
    assert(new java.io.File(s"${store.root}/raw/batch_id=t_0/metric=m1")
      .listFiles().count(_.getName.startsWith("day=")) == 2)
  }

  test("a level read prunes to one interval directory") {
    val scan = scanString(
      spark.read.parquet(s"${store.root}/partials")
        .filter(col("interval_ns") === H))
    assert(scan.contains("PartitionFilters") && scan.contains("interval_ns#"),
      s"interval_ns not a partition filter:\n$scan")
  }
}
