package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Temporary profiling harness (optimization round): runs named
  * SparkEntry queries with a job listener, printing per-job wall time
  * and per-stage task totals so the expensive jobs inside a fixture
  * (checkpoint rounds, chunk writes, candidate joins) are visible
  * without the UI. `runMain graft.ProfQuery <q1,q2,...> [sfDir] [passes]`.
  */
object ProfQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 2
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobStart = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    @volatile var record = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (record) {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobStart.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobStart.remove(je.jobId).foreach { case (t0, desc) =>
          val dt = (System.nanoTime() - t0) / 1e9
          if (dt > 0.02)
            println(f"JOB ${je.jobId}%4d $dt%7.3f s  $desc")
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (record) {
          val si = sc.stageInfo
          val run = si.taskMetrics.executorRunTime / 1e3
          if (run > 0.1)
            println(f"  STAGE ${si.stageId}%4d tasks=${si.numTasks}%4d " +
              f"run=$run%7.2f s  ${si.name.take(90)}")
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try SparkEntry.prepare(spark, sfDir) catch { case e: Throwable =>
      System.err.println(s"[profquery] prepare failed: ${e.getMessage}")
    }
    (1 to passes).foreach { pass =>
      names.foreach { name =>
        val before = spark.sparkContext.getPersistentRDDs.keySet
        record = pass == passes  // profile the warm pass only
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch { case e: Throwable =>
          System.err.println(s"[profquery] $name failed: ${e.getMessage}")
        }
        record = false
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"QUERY $name pass=$pass $dt%7.3f s")
        SparkEntry.releaseNewlyPersisted(spark, before)
      }
    }
    spark.stop()
  }
}
