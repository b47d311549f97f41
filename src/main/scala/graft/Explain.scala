package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspector: `runMain graft.Explain <query> [sfDir] [mode]`.
  * Prints timing and the formatted physical plan for one SparkEntry query.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "formatted"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tc = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(f"CONSTRUCT $name time=${(System.nanoTime() - tc) / 1e9}%.2fs")
    if (mode != "none") df.explain(mode)
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"RUN$i $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
