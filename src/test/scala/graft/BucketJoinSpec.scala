package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins — SCALE.md §4's claim that fact-fact
  * joins can pre-shuffle once at write time, demonstrated and
  * enforced: both sides bucketed by the join key join WITHOUT any
  * shuffle exchange, and the result matches the unbucketed join.
  */
class BucketJoinSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import SparkTestBase.sf

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a non-broadcast join so the exchange question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.read(spark, sf, "orders")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders_b").mode("overwrite")
        .saveAsTable("orders_b")
      Tables.read(spark, sf, "lineitem")
        .select("l_orderkey", "l_quantity")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/lineitem_b").mode("overwrite")
        .saveAsTable("lineitem_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))

      // the JOIN itself must consume the bucketing: no shuffle below it
      // (the groupBy above may still exchange on its own key)
      val plan = joined.queryExecution.sparkPlan
      val joinNode = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }.head
      val exchangesBelowJoin = joinNode.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchangesBelowJoin.isEmpty,
        s"bucketed join still shuffles:\n$joinNode")

      // and it is not just fast — it is right
      val unbucketed = Tables.read(spark, sf, "lineitem")
        .select("l_orderkey", "l_quantity")
        .join(Tables.read(spark, sf, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
      assert(joined.exceptAll(unbucketed).isEmpty &&
        unbucketed.exceptAll(joined).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("bucket-key aggregation needs no exchange; mismatched counts do") {
    val wh = java.nio.file.Files.createTempDirectory("graft-bucket2").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Seq(("li_b8a", "l_quantity", 8), ("li_b8b", "l_tax", 8),
          ("li_b4", "l_extendedprice", 4)).foreach { case (t, c, n) =>
        Tables.read(spark, sf, "lineitem").select(col("l_orderkey"), col(c))
          .write.bucketBy(n, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$wh/$t").mode("overwrite").saveAsTable(t)
      }
      // a groupBy on the bucket key consumes the persisted hash
      // distribution — partial AND final aggregation in one stage,
      // zero exchanges: the layout, not the query, paid the shuffle
      val agg = spark.table("li_b8a")
        .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      agg.collect()
      val ap = agg.queryExecution.executedPlan.toString
      assert(!ap.contains("Exchange"),
        s"bucket-key aggregation should not shuffle:\n$ap")

      // honest limit: co-location requires AGREEMENT on the bucket
      // count — an 8↔4 join re-shuffles at least one side
      val mixed = spark.table("li_b8b")
        .join(spark.table("li_b4"), "l_orderkey")
      mixed.collect()
      assert(mixed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Seq("li_b8a", "li_b8b", "li_b4").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
