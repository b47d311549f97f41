package graft

import graft.operators.Ingest
import graft.plans.RollupSubstitution
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The Catalyst rollup-substitution rule: user aggregations over the
  * stored raw point table are answered from the materialized level —
  * transparently, with identical results (the deployed scenario: both
  * tables are parquet written by ingest).
  */
class RollupSubstitutionSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import SparkTestBase.sf
  import spark.implicits._

  private val H = 3600000000000L

  private lazy val (raw, level0) = {
    val root = Files.createTempDirectory("graft-subst").toString
    val clean = Ingest.sanitize(Tables.htaPoints(spark, sf))
    clean.write.parquet(s"$root/raw")
    val r = spark.read.parquet(s"$root/raw")
    Ingest.rollup(r, H).write.parquet(s"$root/level0")
    (r, spark.read.parquet(s"$root/level0"))
  }

  test("GROUP BY (metric, bucket) over stored raw is rewritten onto level-0") {
    RollupSubstitution.install(spark, raw, level0, H)
    try {
      val q = raw.groupBy(col("metric"),
          (col("time") - col("time") % (10 * H)).as("bucket"))
        .agg(min("value").as("mn"), max("value").as("mx"),
          count(lit(1)).as("cnt"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("min_v") && optimized.contains("bucket_start"),
        s"rule did not fire:\n$optimized")

      val got = q.as[(String, Long, Double, Double, Long)]
        .collect().sortBy(r => (r._1, r._2))
      RollupSubstitution.uninstall(spark)
      val expect = raw.groupBy(col("metric"),
          (col("time") - col("time") % (10 * H)).as("bucket"))
        .agg(min("value").as("mn"), max("value").as("mx"),
          count(lit(1)).as("cnt"))
        .as[(String, Long, Double, Double, Long)]
        .collect().sortBy(r => (r._1, r._2))
      assert(got.toSeq == expect.toSeq)
    } finally RollupSubstitution.uninstall(spark)
  }

  test("the rewrite also fires for SQL-text queries over the registered view") {
    RollupSubstitution.install(spark, raw, level0, H)
    try {
      raw.createOrReplaceTempView("hta_raw_v")
      val q = spark.sql(
        s"""SELECT metric, time - time % ${10 * H} AS bucket,
           |       min(value) AS mn, count(*) AS cnt
           |FROM hta_raw_v GROUP BY 1, 2""".stripMargin)
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("min_v") && optimized.contains("bucket_start"),
        s"rule did not fire for SQL:\n$optimized")
      assert(q.count() > 0)
    } finally RollupSubstitution.uninstall(spark)
  }

  test("timeline-shaped SQL (floor(time/I) + ORDER BY) rewrites onto the level") {
    // the floor spelling requires the non-negative-time assertion
    // (truncation vs floor bucket disagreement for negative times)
    RollupSubstitution.install(spark, raw, level0, H,
      assumeNonNegativeTime = true)
    try {
      raw.createOrReplaceTempView("hta_raw_v")
      val sqlText =
        s"""SELECT metric, floor(time / ${10 * H}) AS bucket,
           |       min(value) AS mn, max(value) AS mx, count(*) AS cnt
           |FROM hta_raw_v GROUP BY 1, 2 ORDER BY metric, bucket""".stripMargin
      val q = spark.sql(sqlText)
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("min_v") && optimized.contains("bucket_start"),
        s"rule did not fire for timeline SQL:\n$optimized")
      val got = q.as[(String, Long, Double, Double, Long)].collect().toSeq
      RollupSubstitution.uninstall(spark)
      val expect = spark.sql(sqlText)
        .as[(String, Long, Double, Double, Long)].collect().toSeq
      // ORDER BY preserved AND values hash-equal to the raw-scan plan
      assert(got == expect)
      assert(got == got.sortBy(r => (r._1, r._2)))
    } finally RollupSubstitution.uninstall(spark)
  }

  test("the floor spelling declines without the non-negative-time assertion") {
    RollupSubstitution.install(spark, raw, level0, H)
    try {
      raw.createOrReplaceTempView("hta_raw_v")
      val q = spark.sql(
        s"""SELECT metric, floor(time / ${10 * H}) AS bucket,
           |       min(value) AS mn FROM hta_raw_v GROUP BY 1, 2""".stripMargin)
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("bucket_start"),
        s"floor must decline without the assertion:\n$optimized")
    } finally RollupSubstitution.uninstall(spark)
  }

  test("the `time div I` bucket-index spelling rewrites too") {
    RollupSubstitution.install(spark, raw, level0, H)
    try {
      val q = raw.groupBy(col("metric"),
          expr(s"time div ${10 * H}").as("bucket"))
        .agg(min("value").as("mn"), count(lit(1)).as("cnt"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("min_v") && optimized.contains("bucket_start"),
        s"rule did not fire for div:\n$optimized")
      val got = q.as[(String, Long, Double, Long)]
        .collect().sortBy(r => (r._1, r._2))
      RollupSubstitution.uninstall(spark)
      val expect = raw.groupBy(col("metric"),
          expr(s"time div ${10 * H}").as("bucket"))
        .agg(min("value").as("mn"), count(lit(1)).as("cnt"))
        .as[(String, Long, Double, Long)]
        .collect().sortBy(r => (r._1, r._2))
      assert(got.toSeq == expect.toSeq)
    } finally RollupSubstitution.uninstall(spark)
  }

  test("bucket-aligned range + metric predicates rewrite; unaligned decline") {
    RollupSubstitution.install(spark, raw, level0, H)
    try {
      val lo = 1704412800000000000L // multiples of H (1 h)
      val hi = 1705708800000000000L
      def agg(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("metric"),
            (col("time") - col("time") % (10 * H)).as("bucket"))
          .agg(min("value").as("mn"), count(lit(1)).as("cnt"))
      // aligned range + metric filter: must fire AND match the raw result
      val q = agg(raw.filter(col("time") >= lo && col("time") < hi &&
        col("metric") =!= "login"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("min_v") && optimized.contains("bucket_start"),
        s"filtered rewrite did not fire:\n$optimized")
      val got = q.as[(String, Long, Double, Long)].collect().sortBy(r => (r._1, r._2))
      RollupSubstitution.uninstall(spark)
      val expect = agg(raw.filter(col("time") >= lo && col("time") < hi &&
        col("metric") =!= "login"))
        .as[(String, Long, Double, Long)].collect().sortBy(r => (r._1, r._2))
      assert(got.toSeq == expect.toSeq)
      assert(got.nonEmpty)

      // unaligned bound or value predicate: no rewrite, still correct
      RollupSubstitution.install(spark, raw, level0, H)
      val qUnaligned = agg(raw.filter(col("time") >= lo + 1))
      assert(!qUnaligned.queryExecution.optimizedPlan.toString.contains("min_v"))
      val qValue = agg(raw.filter(col("value") > 0))
      assert(!qValue.queryExecution.optimizedPlan.toString.contains("min_v"))
    } finally RollupSubstitution.uninstall(spark)
  }

  test("quantized sum and count(value) rewrite under the not-null assertion") {
    // a DataFrame memoizes its QueryExecution, so build a fresh one per
    // install configuration
    def qSum() = raw.groupBy(col("metric"),
        (col("time") - col("time") % (10 * H)).as("bucket"))
      .agg(sum(round(col("value") * 100).cast("long")).as("s_c"),
        count(col("value")).as("cv"))

    // without the assertion: nullable parquet schema → no rewrite
    RollupSubstitution.install(spark, raw, level0, H)
    assert(!qSum().queryExecution.optimizedPlan.toString.contains("sum_c"))
    RollupSubstitution.uninstall(spark)

    // with it (sanitize guarantees no NULL values): both rewrite
    RollupSubstitution.install(spark, raw, level0, H, assumeValueNotNull = true)
    try {
      val q = qSum()
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("sum_c") && optimized.contains("bucket_start"),
        s"quantized-sum rewrite did not fire:\n$optimized")
      val got = q.as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
      RollupSubstitution.uninstall(spark)
      val expect = qSum().as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
      assert(got.toSeq == expect.toSeq && got.nonEmpty)
    } finally RollupSubstitution.uninstall(spark)
  }

  test("avg(value) rewrites only under BOTH not-null and cent-grid assertions") {
    def qAvg() = raw.groupBy(col("metric"),
        (col("time") - col("time") % (10 * H)).as("bucket"))
      .agg(avg("value").as("a"), count(lit(1)).as("c"))

    // not-null alone must NOT unlock avg: sum_c is the sum of QUANTIZED
    // values, so off the 0.01 grid the rewrite would be systematically
    // wrong (up to 0.005/point), not last-ulp
    RollupSubstitution.install(spark, raw, level0, H, assumeValueNotNull = true)
    try assert(!qAvg().queryExecution.optimizedPlan.toString.contains("sum_c"))
    finally RollupSubstitution.uninstall(spark)

    RollupSubstitution.install(spark, raw, level0, H,
      assumeValueNotNull = true, assumeCentQuantized = true)
    try {
      val q = qAvg()
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("sum_c") && optimized.contains("bucket_start"),
        s"avg rewrite did not fire:\n$optimized")
      val got = q.as[(String, Long, Double, Long)].collect().sortBy(r => (r._1, r._2))
      RollupSubstitution.uninstall(spark)
      val expect = qAvg().as[(String, Long, Double, Long)].collect().sortBy(r => (r._1, r._2))
      assert(got.length == expect.length && got.nonEmpty)
      // exact integer-domain mean vs shuffle-order double sum: equal to
      // relative 1e-12 (the raw plan itself is not bitwise stable)
      got.zip(expect).foreach { case (g, e) =>
        assert(g._1 == e._1 && g._2 == e._2 && g._4 == e._4)
        assert(math.abs(g._3 - e._3) <= 1e-12 * math.max(1.0, math.abs(e._3)),
          s"avg mismatch: $g vs $e")
      }
    } finally RollupSubstitution.uninstall(spark)
  }

  test("plain sum(value) rewrites only under BOTH assertions, from the level scan") {
    def qSum() = raw.groupBy(col("metric"),
        (col("time") - col("time") % (10 * H)).as("bucket"))
      .agg(sum("value").as("s"), min("value").as("mn"))

    // not-null alone must NOT unlock it: sum_c sums QUANTIZED values,
    // so off the cent grid the rewrite would be systematically wrong
    RollupSubstitution.install(spark, raw, level0, H, assumeValueNotNull = true)
    try assert(!qSum().queryExecution.optimizedPlan.toString.contains("sum_c"))
    finally RollupSubstitution.uninstall(spark)

    RollupSubstitution.install(spark, raw, level0, H,
      assumeValueNotNull = true, assumeCentQuantized = true)
    try {
      val q = qSum()
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("sum_c") && optimized.contains("bucket_start"),
        s"sum rewrite did not fire:\n$optimized")
      // the LEVEL scan answers: no leaf of the optimized plan is raw
      val leaves = q.queryExecution.optimizedPlan.collectLeaves()
      assert(!leaves.exists(_.sameResult(raw.queryExecution.analyzed)),
        s"raw table still scanned:\n$optimized")
      val got = q.as[(String, Long, Double, Double)].collect().sortBy(r => (r._1, r._2))
      RollupSubstitution.uninstall(spark)
      val expect = qSum().as[(String, Long, Double, Double)].collect().sortBy(r => (r._1, r._2))
      assert(got.length == expect.length && got.nonEmpty)
      // exact integer-domain sum (one division) vs the raw plan's
      // shuffle-order double sum: equal to relative 1e-12 (the raw
      // plan itself is not bitwise stable), min bitwise-identical
      got.zip(expect).foreach { case (g, e) =>
        assert(g._1 == e._1 && g._2 == e._2 && g._4 == e._4)
        assert(math.abs(g._3 - e._3) <= 1e-12 * math.max(1.0, math.abs(e._3)),
          s"sum mismatch: $g vs $e")
      }
      // and BITWISE equality against the exact integer-domain spelling
      // on raw — the rewrite is (Σ sum_c)/100.0, which must be the same
      // double as Σ round(v·100) (int64) divided once
      val exact = raw.groupBy(col("metric"),
          (col("time") - col("time") % (10 * H)).as("bucket"))
        .agg((sum(round(col("value") * 100).cast("long")) / 100.0).as("s"),
          min("value").as("mn"))
        .as[(String, Long, Double, Double)].collect().sortBy(r => (r._1, r._2))
      assert(got.toSeq == exact.toSeq,
        "rewritten sum must be bit-identical to the integer-domain sum")
    } finally RollupSubstitution.uninstall(spark)
  }

  test("ladder: the coarsest dividing level answers; filters can demote a rung") {
    val root = Files.createTempDirectory("graft-ladder").toString
    Ingest.mergeToLevel(level0, 10 * H).write.parquet(s"$root/level1")
    val level1 = spark.read.parquet(s"$root/level1")
    def leafIn(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collectLeaves()
    def answersFrom(q: org.apache.spark.sql.DataFrame,
                    lvl: org.apache.spark.sql.DataFrame) =
      leafIn(q).exists(s => leafIn(lvl).exists(s.sameResult))

    RollupSubstitution.installLadder(spark, raw, Seq(level0 -> H, level1 -> (10 * H)))
    try {
      // grouped at 10 h: the 10 h level wins (10× fewer rows merged)
      val q10 = raw.groupBy(col("metric"),
          (col("time") - col("time") % (10 * H)).as("bucket"))
        .agg(min("value").as("mn"), count(lit(1)).as("cnt"))
      assert(answersFrom(q10, level1), "10h grouping should read the 10h level")
      // grouped at 1 h: only level-0 divides
      val q1 = raw.groupBy(col("metric"),
          (col("time") - col("time") % H).as("bucket"))
        .agg(min("value").as("mn"))
      assert(answersFrom(q1, level0) && !answersFrom(q1, level1))
      // 10 h grouping with an H-aligned (not 10H-aligned) bound: the
      // coarse rung can't map the filter — falls through to level-0,
      // still substituted, still correct
      val lo = 1704412800000000000L + H // 1 h past a 10 h boundary
      val qDemoted = raw.filter(col("time") >= lo)
        .groupBy(col("metric"),
          (col("time") - col("time") % (10 * H)).as("bucket"))
        .agg(min("value").as("mn"), count(lit(1)).as("cnt"))
      assert(answersFrom(qDemoted, level0) && !answersFrom(qDemoted, level1),
        "misaligned filter must demote to the finer level")

      val got = q10.as[(String, Long, Double, Long)].collect().sortBy(r => (r._1, r._2))
      val gotD = qDemoted.as[(String, Long, Double, Long)].collect().sortBy(r => (r._1, r._2))
      RollupSubstitution.uninstall(spark)
      val expect = raw.groupBy(col("metric"),
          (col("time") - col("time") % (10 * H)).as("bucket"))
        .agg(min("value").as("mn"), count(lit(1)).as("cnt"))
        .as[(String, Long, Double, Long)].collect().sortBy(r => (r._1, r._2))
      val expectD = raw.filter(col("time") >= lo)
        .groupBy(col("metric"),
          (col("time") - col("time") % (10 * H)).as("bucket"))
        .agg(min("value").as("mn"), count(lit(1)).as("cnt"))
        .as[(String, Long, Double, Long)].collect().sortBy(r => (r._1, r._2))
      assert(got.toSeq == expect.toSeq && got.nonEmpty)
      assert(gotD.toSeq == expectD.toSeq && gotD.nonEmpty)
    } finally RollupSubstitution.uninstall(spark)
  }

  test("time-weighted mean re-bucketing a level rewrites onto a coarser rung") {
    val root = Files.createTempDirectory("graft-twm").toString
    Ingest.mergeToLevel(level0, 10 * H).write.parquet(s"$root/level1")
    val level1 = spark.read.parquet(s"$root/level1")
    def leafIn(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collectLeaves()
    def answersFrom(q: org.apache.spark.sql.DataFrame,
                    lvl: org.apache.spark.sql.DataFrame) =
      leafIn(q).exists(s => leafIn(lvl).exists(s.sameResult))

    // the reference's time-weighted mean: integral / active_time
    // (SURVEY §1.1 Aggregate), re-bucketed from the fine level — the
    // hierarchical-merge read path, never a raw scan
    def qTwm() = level0.groupBy(col("metric"),
        (col("bucket_start") - col("bucket_start") % (10 * H)).as("bucket"))
      .agg((sum("integral_cus") / sum("active_us")).as("twm"),
        min("min_v").as("mn"), max("max_v").as("mx"),
        sum("cnt").as("points"))

    RollupSubstitution.installLadder(spark, raw,
      Seq(level0 -> H, level1 -> (10 * H)))
    try {
      val q = qTwm()
      assert(answersFrom(q, level1) && !answersFrom(q, level0),
        s"level re-bucketing should read the 10h rung:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect().toSeq
        .sortBy(r => (r.getString(0), r.getLong(1)))
      RollupSubstitution.uninstall(spark)
      val expect = qTwm().collect().toSeq
        .sortBy(r => (r.getString(0), r.getLong(1)))
      // int64-exact components + identical division order ⇒ bitwise equal
      assert(got == expect && got.nonEmpty)
    } finally RollupSubstitution.uninstall(spark)

    // SQL-text spelling of the same query fires too
    RollupSubstitution.installLadder(spark, raw,
      Seq(level0 -> H, level1 -> (10 * H)))
    try {
      level0.createOrReplaceTempView("hta_level0_v")
      val q = spark.sql(
        s"""SELECT metric, bucket_start - bucket_start % ${10 * H} AS bucket,
           |       sum(integral_cus) / sum(active_us) AS twm
           |FROM hta_level0_v GROUP BY 1, 2""".stripMargin)
      assert(answersFrom(q, level1),
        s"SQL time-weighted mean did not hit the rung:\n${q.queryExecution.optimizedPlan}")
      assert(q.count() > 0)
      // count(*) over a level counts fine buckets — not recorded in the
      // rung, so it must decline (raw correctness preserved)
      val qc = spark.sql(
        s"""SELECT metric, bucket_start - bucket_start % ${10 * H} AS bucket,
           |       count(*) AS n
           |FROM hta_level0_v GROUP BY 1, 2""".stripMargin)
      assert(!answersFrom(qc, level1), "count(*) must not merge rungs")
    } finally RollupSubstitution.uninstall(spark)
  }

  test("cnt=0 hold-only buckets survive the level re-bucketing rewrite") {
    // a metric whose fine level has a segment-only bucket (cnt = 0, NULL
    // min/max, nonzero active time): the rewrite must keep its group
    val minute = 60000000000L
    val pts = Seq(
      ("s1", 0L * minute, 1.0, 1L),
      ("s1", 100L * minute, 3.0, 2L)) // hold spans buckets 0..100 min
      .toDF("metric", "time", "value", "seq")
    val clean = Ingest.sanitize(pts)
    val root = Files.createTempDirectory("graft-hold").toString
    clean.write.parquet(s"$root/raw")
    val r = spark.read.parquet(s"$root/raw")
    Ingest.rollup(r, 10 * minute).write.parquet(s"$root/l0")
    val l0 = spark.read.parquet(s"$root/l0")
    Ingest.mergeToLevel(l0, 50 * minute).write.parquet(s"$root/l1")
    val l1 = spark.read.parquet(s"$root/l1")
    def qAgg(src: org.apache.spark.sql.DataFrame) = src.groupBy(col("metric"),
        (col("bucket_start") - col("bucket_start") % (50 * minute)).as("bucket"))
      .agg(sum("integral_cus").as("icus"), sum("active_us").as("aus"),
        sum("cnt").as("points"))
    RollupSubstitution.installLadder(spark, r,
      Seq(l0 -> (10 * minute), l1 -> (50 * minute)))
    try {
      val q = qAgg(l0)
      val optimized = q.queryExecution.optimizedPlan
      assert(optimized.collectLeaves().exists(s =>
        l1.queryExecution.optimizedPlan.collectLeaves().exists(s.sameResult)),
        s"hold-bucket query should read l1:\n$optimized")
      val got = q.as[(String, Long, Long, Long, Long)]
        .collect().sortBy(_._2).toSeq
      RollupSubstitution.uninstall(spark)
      val expect = qAgg(l0).as[(String, Long, Long, Long, Long)]
        .collect().sortBy(_._2).toSeq
      // bucket 50-100 min is hold-only at BOTH granularities (cnt = 0):
      // it must appear in both answers with identical integrals
      assert(got == expect && got.exists(_._5 == 0L), s"got $got")
    } finally RollupSubstitution.uninstall(spark)
  }

  test("non-derivable or misaligned aggregates are left untouched") {
    RollupSubstitution.install(spark, raw, level0, H)
    try {
      val q = raw.groupBy(col("metric"),
          (col("time") - col("time") % (10 * H)).as("bucket"))
        .agg(avg("value").as("a"))
      assert(!q.queryExecution.optimizedPlan.toString.contains("min_v"))
      assert(q.count() > 0)
      val q2 = raw.groupBy(col("metric"),
          (col("time") - col("time") % (H / 2)).as("bucket"))
        .agg(min("value").as("mn"))
      assert(!q2.queryExecution.optimizedPlan.toString.contains("min_v"))
      assert(q2.count() > 0)
    } finally RollupSubstitution.uninstall(spark)
  }
}
