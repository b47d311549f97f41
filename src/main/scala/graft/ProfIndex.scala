package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary profiling harness (optimization round): times the index
  * lifecycle fixtures' phases (build / append / compact / search).
  */
object ProfIndex {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }
    (1 to 2).foreach { round =>
      val emb = sources.Tables.read(spark, sfDir, "embeddings")
      val base = emb.filter(pmod(col("vec_id"), lit(5L)) =!= 4L)
      val rest = emb.filter(pmod(col("vec_id"), lit(5L)) === 4L)
      val qset = emb.filter(col("vec_id").isin(0L, 1L, 2L))
        .select("vec_id", "embedding")
      // x156 shape: build 80% + append 20% + compact + search
      val root = java.nio.file.Files.createTempDirectory("graft-profsq")
        .toString
      t(s"r$round-sq-build")(operators.Similarity.buildIvfSqIndex(base, root))
      t(s"r$round-sq-append")(operators.Similarity.appendToIvfSqIndex(
        rest, root, tag = "day2"))
      t(s"r$round-sq-compact")(operators.Similarity.compactIvfIndex(spark, root))
      val n1 = t(s"r$round-sq-search")(operators.Similarity.searchIvfSq(
        spark, root, qset, 5, nprobe = 2).count())
      println(s"ROWS sq $n1")
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
      // x157 shape on PQ
      val root2 = java.nio.file.Files.createTempDirectory("graft-profpq")
        .toString
      t(s"r$round-pq-build")(operators.Similarity.buildIvfPqIndex(base, root2))
      t(s"r$round-pq-append")(operators.Similarity.appendToIvfPqIndex(
        rest, root2, tag = "day2"))
      t(s"r$round-pq-compact")(operators.Similarity.compactIvfIndex(spark, root2))
      val n2 = t(s"r$round-pq-search")(operators.Similarity.searchIvfPqAdc(
        spark, root2, qset, 5, nprobe = 2).count())
      println(s"ROWS pq $n2")
      new scala.reflect.io.Directory(new java.io.File(root2)).deleteRecursively()
    }
    spark.stop()
  }
}
