package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val noData = args.length > 1 && args(1) == "nodata"
    val parts = if (args.length > 2) args(2) else "8"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._

    // q56 inline, instrumented
    val ev = sources.Tables.events(spark, sfDir).select(
      col("event_id"), col("user_id"), col("event_type"),
      expr("CAST(ts AS LONG) div 1000").as("us"))
    val t0 = System.nanoTime()
    val p = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "us")
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    val c = ev.filter(col("event_type") === "click")
      .select("user_id", "us")
      .as[(Long, Long)].collect().sortBy(_._2)
    println(f"COLLECT p=${p.length} c=${c.length} time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", parts)
    if (noData) ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val msP = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long)](ss)
    val msC = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)](ss)
    val pDf = msP.toDS().toDF("event_id", "p_user", "p_us")
      .withColumn("p_ts", timestamp_micros(col("p_us")))
      .withWatermark("p_ts", "1 hour")
    val cDf = msC.toDS().toDF("c_user", "c_us")
      .withColumn("c_ts", timestamp_micros(col("c_us")))
      .withWatermark("c_ts", "1 hour")
    val t1 = System.nanoTime()
    val q = pDf.join(cDf,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") < col("p_ts"))
      .select(col("event_id"), col("p_user").as("user_id"),
        col("p_us"), col("c_us"))
      .writeStream.outputMode("append")
      .format("memory").queryName("probe_join")
      .start()
    val pChunks = p.grouped(math.max(1, p.length / 3 + 1)).toSeq
    val cChunks = c.grouped(math.max(1, c.length / 3 + 1)).toSeq
    (0 until math.max(pChunks.length, cChunks.length)).foreach { i =>
      val tb = System.nanoTime()
      pChunks.lift(i).foreach(ch => msP.addData(ch.toSeq))
      cChunks.lift(i).foreach(ch => msC.addData(ch.toSeq))
      q.processAllAvailable()
      println(f"ROUND $i time=${(System.nanoTime() - tb) / 1e9}%.2fs batches=${q.recentProgress.length}")
    }
    q.stop()
    val n = ss.table("probe_join").count()
    println(f"TOTAL rows=$n stream_time=${(System.nanoTime() - t1) / 1e9}%.2fs")
    q.recentProgress.takeRight(12).foreach { pr =>
      println(f"BATCH ${pr.batchId} rows=${pr.numInputRows} durMs=${pr.batchDuration} " +
        pr.durationMs.toString)
    }
    spark.stop()
  }
}
