package graft

import org.apache.spark.sql.SparkSession

/** Temporary profiling harness (optimization round): runs one
  * MemoryStream gate fixture and prints per-batch duration and state
  * operator metrics from the streaming progress events.
  */
object ProfStream {
  def main(args: Array[String]): Unit = {
    val which = if (args.nonEmpty) args(0) else "x129"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rows = sources.Tables.read(spark, sfDir, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[sources.CorpusIO.CuratedDoc].collect().sortBy(_.doc_id)
    (1 to 2).foreach { round =>
      val t0 = System.nanoTime()
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      operators.Dedup.useRocksDbStateStore(ss)
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[sources.CorpusIO.CuratedDoc](ss)
      val kept = which match {
        case "x129" => operators.Dedup.streamingNearDupGateTtl(
          ms.toDS(), SparkEntry.ClusterJaccard,
          SparkEntry.GateHorizonMicros)(_.text, _.doc_id).toDF()
        case "x108" => operators.Dedup.streamingNearDupGate(
          ms.toDS(), SparkEntry.ClusterJaccard)(_.text, _.doc_id).toDF()
        case "x158" => operators.Dedup.streamingNearDupGate(
          ms.toDS(), SparkEntry.ClusterJaccard, hotBucketCap = 3)(
          _.text, _.doc_id).toDF()
        case "x162" => operators.Dedup.streamingNearDupVerdictsTaggedTtl(
          ms.toDS(), SparkEntry.ClusterJaccard,
          SparkEntry.GateHorizonMicros)(_.text, _.doc_id)
          .map(v => (v._1, v._2, v._3)).toDF("doc_id", "reason", "of_ord")
      }
      val t1 = System.nanoTime()
      val q = kept.writeStream.outputMode("append")
        .format("memory").queryName(s"prof_$which$round").start()
      rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { chunk =>
        ms.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val t2 = System.nanoTime()
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        println(s"ROUND$round batch=${p.batchId} rows=${p.numInputRows} " +
          s"triggerMs=${d.get("triggerExecution")} addBatch=${d.get("addBatch")} " +
          s"getBatch=${d.get("getBatch")} latestOffset=${d.get("latestOffset")} " +
          s"queryPlanning=${d.get("queryPlanning")} walCommit=${d.get("walCommit")} " +
          s"commitOffsets=${d.get("commitOffsets")}")
        p.stateOperators.foreach { so =>
          println(s"  state op=${so.operatorName} commitMs=${so.commitTimeMs} " +
            s"rowsUpdated=${so.numRowsUpdated} rowsTotal=${so.numRowsTotal} " +
            s"memUsed=${so.memoryUsedBytes} custom=${so.customMetrics}")
        }
      }
      q.stop()
      val t3 = System.nanoTime()
      val n = ss.table(s"prof_$which$round").count()
      println(f"ROUND$round $which rows=$n construct=${(t1 - t0) / 1e9}%.2f " +
        f"drive=${(t2 - t1) / 1e9}%.2f stop=${(t3 - t2) / 1e9}%.2f")
    }
    spark.stop()
  }
}
