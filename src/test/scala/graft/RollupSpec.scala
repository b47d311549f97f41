package graft

import graft.operators.{HtaService, Ingest}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tiling / consistency invariants of the rollup (SURVEY §5.2), on the
  * deterministic sf0.001 fixture.
  */
class RollupSpec extends AnyFunSuite {
  import SparkTestBase.{sf, spark}

  private lazy val sanitized = Ingest.sanitize(Tables.htaPoints(spark, sf)).cache()
  private val H = 3600000000000L

  test("sanitize keeps only finite values and strictly increasing times") {
    import spark.implicits._
    val rows = sanitized.select("metric", "time", "value")
      .as[(String, Long, Double)].collect().groupBy(_._1)
    assert(rows.nonEmpty)
    rows.values.foreach { pts =>
      val times = pts.sortBy(_._2).map(_._2)
      assert(times.distinct.length == times.length)
      pts.foreach(p => assert(!p._3.isNaN && !p._3.isInfinite))
    }
  }

  test("tiling: bucket counts sum to point count") {
    val lvl = Ingest.rollup(sanitized, H).cache()
    val nPts = sanitized.count()
    val nInBuckets = lvl.agg(sum("cnt")).head.getLong(0)
    assert(nInBuckets == nPts)
  }

  test("tiling: active time sums to last−first per metric") {
    import spark.implicits._
    val lvl = Ingest.rollup(sanitized, H)
    val act = lvl.groupBy("metric").agg(sum("active_us").as("a"))
      .as[(String, Long)].collect().toMap
    val span = sanitized.groupBy("metric")
      .agg(((max("time") - min("time")) / 1000).cast("long").as("s"))
      .as[(String, Long)].collect().toMap
    assert(act == span)
  }

  test("integral is invariant under bucket width (A2 boundary split)") {
    import spark.implicits._
    def totals(i: Long): Map[String, Long] =
      Ingest.rollup(sanitized, i).groupBy("metric")
        .agg(sum("integral_cus").as("x")).as[(String, Long)].collect().toMap
    val a = totals(H)
    val b = totals(10 * H)
    val c = totals(7 * 60000000000L) // 7 min — not a divisor of anything
    assert(a == b && a == c)
  }

  test("level consistency: merge(level0 → 10h) == direct rollup at 10h") {
    val direct = Ingest.rollup(sanitized, 10 * H)
    val merged = Ingest.mergeToLevel(Ingest.rollup(sanitized, H), 10 * H)
    assert(direct.exceptAll(merged).isEmpty && merged.exceptAll(direct).isEmpty)
  }

  test("F3 idempotence: re-ingesting the sanitized output changes nothing") {
    val again = Ingest.sanitize(
      sanitized.select("metric", "time", "value").withColumn("seq", col("time")))
    assert(again.count() == sanitized.count())
  }

  test("AGGREGATE over bucket-aligned range equals sum of timeline buckets") {
    import spark.implicits._
    // [2024-01-05, 2024-01-20) are multiples of 1 h since epoch
    val start = SparkEntry.Q.Start
    val end = SparkEntry.Q.End
    val agg = HtaService.aggregateRange(sanitized, start, end)
      .select("metric", "cnt").as[(String, Long)].collect().toMap
    // closed-range point count minus points at exactly `end` (bucket
    // [end, end+H) excluded from the timeline slice below)
    val lvl = Ingest.rollup(sanitized, H)
      .filter(col("bucket_start") >= start && col("bucket_start") < end)
      .groupBy("metric").agg(sum("cnt").as("c")).as[(String, Long)].collect().toMap
    val atEnd = sanitized.filter(col("time") === end).count()
    assert(atEnd == 0)
    assert(agg == lvl)
  }

  test("lastValue equals per-metric max-time row") {
    import spark.implicits._
    val lv = HtaService.lastValue(sanitized)
      .as[(String, Long, Double)].collect().sortBy(_._1)
    val expect = sanitized.select("metric", "time", "value")
      .as[(String, Long, Double)].collect()
      .groupBy(_._1).map { case (_, v) => v.maxBy(_._2) }.toSeq.sortBy(_._1)
    assert(lv.toSeq == expect)
  }
}
