package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error-bound enforcement for the sketch queries (x57/x58): their
  * driver-side check is rows-only (DuckDB's approx sketches differ),
  * so the published accuracy guarantees are asserted here against the
  * exact values computed in the same rows.
  */
class SketchSpec extends AnyFunSuite {
  import SparkTestBase.{sf, spark}

  test("approx_count_distinct stays within its relative-error guarantee") {
    val rows = SparkEntry.queries("x57_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_orders").toDouble
      // HLL++ rsd: default 0.05, the _hi column 0.005; allow 4 sigma
      assert(math.abs(r.getAs[Long]("approx_orders") - exact) <=
        4 * 0.05 * exact + 1, s"default-rsd estimate off: $r")
      assert(math.abs(r.getAs[Long]("approx_orders_hi") - exact) <=
        4 * 0.005 * exact + 1, s"high-precision estimate off: $r")
      // the query's own verdict columns must agree
      assert(r.getAs[Boolean]("within_default") && r.getAs[Boolean]("within_hi"),
        s"in-query verdict false: $r")
    }
  }

  test("percentile_approx respects the rank-error bound vs the true CDF") {
    val probs = Seq(0.5, 0.9, 0.99)
    val accuracy = 10000.0
    val rows = SparkEntry.queries("x58_approx_quantiles")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val values = graft.sources.Tables.read(spark, sf, "lineitem")
        .filter(col("l_returnflag") === flag)
        .select(col("l_extendedprice").cast("double"))
        .collect().map(_.getDouble(0)).sorted
      val n = values.length.toDouble
      val approx = Seq("approx_p50", "approx_p90", "approx_p99")
        .map(c => r.getAs[Double](c))
      probs.zip(approx).foreach { case (p, a) =>
        // guarantee: a value whose rank is within ±n/accuracy of p·n
        val lo = values.count(_ < a).toDouble   // smallest rank of a
        val hi = values.count(_ <= a).toDouble  // largest rank of a
        val eps = n / accuracy + 1
        assert(hi >= p * n - eps && lo <= p * n + eps,
          s"flag=$flag p=$p approx=$a rank=[$lo,$hi] n=$n")
      }
      // the query's own verdict columns must agree
      Seq("within_p50", "within_p90", "within_p99").foreach { c =>
        assert(r.getAs[Boolean](c), s"in-query verdict $c false: $r")
      }
    }
  }
}
