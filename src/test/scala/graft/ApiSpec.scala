package graft

import graft.core.{Agg, HistoryRequest => R, HistoryResponse => Resp, MetricCatalog, MetricConfig}
import graft.functions.{AggMerge, PointsToAgg}
import graft.operators.{HtaService, Ingest}
import graft.sources.{BulkImport, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden request/response tests for the 4 history request types
  * (SURVEY §5.4, FIXTURES.md §5), catalog validation (S5), UDAF surface,
  * and the bulk-import path.
  */
class ApiSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import SparkTestBase.sf
  import spark.implicits._

  private lazy val sanitized = Ingest.sanitize(Tables.htaPoints(spark, sf)).cache()
  private val levels = SparkEntry.Q.Ladder
  private val start = SparkEntry.Q.Start
  private val end = SparkEntry.Q.End

  test("AGGREGATE_TIMELINE: delta-encoded rows from the selected level") {
    val Resp.Aggregates(df) = HtaService.history(
      R.AggregateTimeline("purchase", start, end, SparkEntry.Q.TlIntervalMax),
      sanitized, levels): @unchecked
    val rows = df.select("bucket_start", "time_delta").as[(Long, Long)]
      .collect().sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.head._2 == rows.head._1) // first delta is relative to epoch
    rows.sliding(2).foreach {
      case Array((b0, _), (b1, d1)) => assert(d1 == b1 - b0)
      case _ =>
    }
    // all buckets are 10 h aligned and overlap the range
    rows.foreach { case (b, _) =>
      assert(b % SparkEntry.Q.Level1 == 0 && b + SparkEntry.Q.Level1 > start && b < end)
    }
  }

  test("FLEX_TIMELINE: raw branch when interval_max is below the finest level") {
    val r1 = HtaService.history(
      R.FlexTimeline("purchase", start, end, 1000L), sanitized, levels)
    assert(r1.isInstanceOf[Resp.Raw])
    val r2 = HtaService.history(
      R.FlexTimeline("purchase", start, end, SparkEntry.Q.TlIntervalMax),
      sanitized, levels)
    assert(r2.isInstanceOf[Resp.Aggregates])
  }

  test("AGGREGATE: always exactly one aggregate; count 0 on a silent range") {
    val Resp.Aggregates(df) = HtaService.history(
      R.Aggregate("purchase", start, end), sanitized, levels): @unchecked
    val row = df.collect()
    assert(row.length == 1 && row.head.getAs[Long]("time_delta") == start)
    // ref :454-461 unconditionally adds one aggregate + time_delta=start
    val Resp.Aggregates(silent) = HtaService.history(
      R.Aggregate("purchase", 100L, 200L), sanitized, levels): @unchecked
    val z = silent.collect()
    assert(z.length == 1 && z.head.getAs[Long]("cnt") == 0L &&
      z.head.getAs[Long]("time_delta") == 100L)
  }

  test("LAST_VALUE: one row; empty metric → empty response (ref :473-486)") {
    val Resp.Raw(df) = HtaService.history(
      R.LastValue("purchase"), sanitized, levels): @unchecked
    assert(df.count() == 1)
    val Resp.Raw(none) = HtaService.history(
      R.LastValue("no.such.metric"), sanitized, levels): @unchecked
    assert(none.count() == 0)
  }

  test("catalog: ambiguous input mapping and mutation are rejected") {
    val a = MetricConfig("m.a", Some("in1"), "RW", 1000L, 100000L)
    val b = MetricConfig("m.b", Some("in1"), "RW", 1000L, 100000L)
    assert(MetricCatalog.build(Seq(a, b)).isLeft) // same input twice
    val cat = MetricCatalog.build(Seq(a)).toOption.get
    assert(cat.mappedName("in1") == "m.a" && cat.mappedName("x") == "x")
    assert(cat.reconfigure(Seq(a.copy(intervalMin = 2000L))).isLeft) // change
    val grown = cat.reconfigure(Seq(MetricConfig("m.c", None, "RW", 1000L, 100000L)))
    assert(grown.toOption.get.metrics.size == 2) // add-only OK
    assert(grown.toOption.get.subscribeList == Seq("in1", "m.c"))
  }

  test("catalog: mode is validated and RO metrics are query-only") {
    val bad = MetricCatalog.build(Seq(MetricConfig("m.x", None, "XX", 1000L, 100000L)))
    assert(bad == Left("invalid mode (want RW|RO): m.x=XX"))
    val cat = MetricCatalog.build(Seq(
      MetricConfig("m.ro", None, "RO", 1000L, 100000L),
      MetricConfig("m.rw", None, "RW", 1000L, 100000L))).toOption.get
    assert(cat.readOnlyMetrics == Set("m.ro"))
    assert(!cat.metrics("m.ro").writable && cat.metrics("m.rw").writable)
    // batch-side enforcement drops only the RO metric's rows
    val pts = Seq(("m.ro", 1L, 1.0), ("m.rw", 2L, 2.0))
      .toDF("metric", "time", "value")
    val kept = Ingest.enforceWritable(pts, cat.readOnlyMetrics)
      .select("metric").as[String].collect()
    assert(kept.toSeq == Seq("m.rw"))
  }

  test("catalog: parses the reference config-JSON shape") {
    val json =
      """{"type":"file","path":"/var/hta","threads":2,
        | "metrics": {"taurus.power": {"input": "taurusi_watts", "mode": "RW",
        |   "interval_min": 40000000000, "interval_max": 400000000000000,
        |   "interval_factor": 10}}}""".stripMargin
    val cat = MetricCatalog.fromJson(json)
    assert(cat.isRight)
    val c = cat.toOption.get.metrics("taurus.power")
    assert(c.input.contains("taurusi_watts"))
    assert(c.levels == List(40L, 400L, 4000L, 40000L, 400000L).map(_ * 1000000000L))
    assert(MetricCatalog.fromJson("""{"no": "metrics"}""").isLeft)
    // prefix metrics are a hard config error (ref hpp:161-165), not an
    // ignorable key — and prefix:false stays accepted
    val withPrefix =
      """{"metrics": {"taurus.": {"prefix": true,
        |   "interval_min": 1000, "interval_max": 100000}}}""".stripMargin
    assert(MetricCatalog.fromJson(withPrefix)
      .swap.exists(_.contains("prefix")))
    val falsePrefix =
      """{"metrics": {"taurus.power": {"prefix": false,
        |   "interval_min": 1000, "interval_max": 100000}}}""".stripMargin
    assert(MetricCatalog.fromJson(falsePrefix).isRight)
  }

  test("Aggregator UDAF: typed merge equals the plain groupBy merge") {
    val aggs = Seq(
      ("m1", Agg(1.0, 5.0, 9.0, 3, 100.0, 10L)),
      ("m1", Agg(0.5, 2.0, 2.5, 2, 50.0, 5L)),
      ("m2", Agg(7.0, 7.0, 7.0, 1, 0.0, 0L))).toDF("metric", "agg")
      .as[(String, Agg)]
    val merged = aggs.groupByKey(_._1).mapValues(_._2)
      .agg(AggMerge.toColumn).collect().toMap
    assert(merged("m1") == Agg(0.5, 5.0, 11.5, 5, 150.0, 15L))
    assert(merged("m2") == Agg(7.0, 7.0, 7.0, 1, 0.0, 0L))
    val pts = Seq(("a", 1.0), ("a", 3.0), ("b", 2.0)).toDS()
    val ptAgg = pts.groupByKey(_._1).mapValues(_._2)
      .agg(PointsToAgg.toColumn).collect().toMap
    assert(ptAgg("a") == Agg(1.0, 3.0, 4.0, 2, 0.0, 0L))
  }

  test("bulk import equals streaming-equivalent batch pipeline") {
    val (clean, lvl0) = BulkImport.fromDataFrame(
      Tables.htaPoints(spark, sf), SparkEntry.Q.IntervalMin)
    assert(clean.count() == sanitized.count())
    val direct = Ingest.rollup(sanitized, SparkEntry.Q.IntervalMin)
    assert(lvl0.exceptAll(direct).isEmpty && direct.exceptAll(lvl0).isEmpty)
  }

  test("S4: fromJdbc against embedded Derby equals fromDataFrame") {
    // the importer's MySQL source stood in by Derby in-memory — same
    // JDBC wiring (partitioned range scan on `timestamp`), zero egress
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val minute = 60000000000L
    val n = 500
    try {
      val st = conn.createStatement()
      // quoted lower-case names: `timestamp` is a reserved word in
      // Derby, and the production wiring hardcodes the importer's
      // lower-case MySQL column names
      st.execute("""CREATE TABLE samples ("timestamp" BIGINT, "value" DOUBLE)""")
      val ins = conn.prepareStatement("INSERT INTO samples VALUES (?, ?)")
      (0 until n).foreach { i =>
        ins.setLong(1, 1704067200000000000L + i * minute)
        ins.setDouble(2, (i % 7) * 0.25)
        ins.addBatch()
      }
      // an out-of-range row the explicit bound filter must exclude
      ins.setLong(1, 1704067200000000000L + (n + 100) * minute)
      ins.setDouble(2, 99.0)
      ins.addBatch()
      ins.executeBatch()

      val lo = 1704067200000000000L
      val hi = 1704067200000000000L + n * minute
      val (clean, lvl0) = BulkImport.fromJdbc(spark, url, "samples",
        "jdbc.m", lo, hi, numPartitions = 4, SparkEntry.Q.IntervalMin)

      val local = (0 until n).map(i =>
        ("jdbc.m", lo + i * minute, (i % 7) * 0.25, lo + i * minute))
        .toDF("metric", "time", "value", "seq")
      val (refClean, refLvl0) =
        BulkImport.fromDataFrame(local, SparkEntry.Q.IntervalMin)
      assert(clean.count() == n.toLong)
      assert(clean.exceptAll(refClean).isEmpty && refClean.exceptAll(clean).isEmpty)
      assert(lvl0.exceptAll(refLvl0).isEmpty && refLvl0.exceptAll(lvl0).isEmpty)
    } finally {
      conn.close()
      // in-memory Derby drop (throws SQLNonTransientConnectionException
      // with SQLState 08006 on success, per Derby's shutdown contract)
      try java.sql.DriverManager
        .getConnection("jdbc:derby:memory:graftjdbc;drop=true")
      catch { case _: java.sql.SQLException => () }
    }
  }
}
