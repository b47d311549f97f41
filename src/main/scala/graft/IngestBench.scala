package graft

import graft.sources.Tables
import graft.streaming.{HtaStore, StreamingIngest}
import org.apache.spark.sql.SparkSession

/** Ingest-throughput microbenchmark: the same point set pushed through
  * the FULL streaming path (gate + dual store write + checkpoint) in a
  * varying number of micro-batches. Shows where the time goes: cost is
  * dominated by per-batch fixed overhead (state-store commit, two
  * parquet writes, planning), not per-point work — the number that
  * matters at scale, where production batches carry millions of points
  * against the same fixed cost.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.IngestBench"
  * Prints one JSON line per batch count.
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val pts = Tables.htaPoints(spark, sfDir)
      .as[StreamingIngest.Point].collect().sortBy(_.seq)

    // warm the whole path (codegen, state store, parquet writers) on a
    // small slice so the measured runs see steady-state cost
    locally {
      val root = java.nio.file.Files.createTempDirectory("ib-warm").toString
      val ckpt = java.nio.file.Files.createTempDirectory("ib-warmck").toString
      val store = new HtaStore(root, SparkEntry.Q.IntervalMin)
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[StreamingIngest.Point](spark)
      val q = StreamingIngest.start(spark, ms.toDS(), store, ckpt)
      ms.addData(pts.take(1000).toSeq)
      q.processAllAvailable()
      q.stop()
    }

    Seq(1, 3, 8).foreach { nBatches =>
      val root = java.nio.file.Files.createTempDirectory("ib-store").toString
      val ckpt = java.nio.file.Files.createTempDirectory("ib-ckpt").toString
      val store = new HtaStore(root, SparkEntry.Q.IntervalMin)
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[StreamingIngest.Point](spark)
      val t0 = System.nanoTime()
      val q = StreamingIngest.start(spark, ms.toDS(), store, ckpt)
      pts.grouped(math.max(1, pts.length / nBatches + 1)).foreach { chunk =>
        ms.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      val n = store.raw(spark).count()
      println(f"""{"batches":$nBatches,"points":$n,"sec":$sec%.3f,"pts_per_s":${(n / sec).toLong}}""")
    }
    spark.stop()
  }
}
