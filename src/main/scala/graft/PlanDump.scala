package graft

import org.apache.spark.sql.SparkSession

/** Plan evidence dumper: `runMain graft.PlanDump <outDir> <suffix> <q1,q2,...>`
  * writes `<outDir>/<query>_<suffix>.txt` with the formatted physical
  * plan of each named SparkEntry query (constructed against sf0.01 —
  * fixture queries run their construction as a side effect; the plan
  * captured is the returned frame's, the thing the driver's count()
  * executes).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir, suffix, list) = args.take(3)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val names = list.split(",").map(_.trim).filter(_.nonEmpty)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    try SparkEntry.prepare(spark, sfDir) catch { case e: Throwable =>
      System.err.println(s"[plandump] prepare failed: ${e.getMessage}")
    }
    names.foreach { name =>
      val before = spark.sparkContext.getPersistentRDDs.keySet
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), plan)
        println(s"PLAN $name -> $outDir/${name}_$suffix.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      } finally SparkEntry.releaseNewlyPersisted(spark, before)
    }
    spark.stop()
  }
}
