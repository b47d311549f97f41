package graft

import graft.sources.{CorpusIO, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusIOSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import SparkTestBase.sf
  import spark.implicits._

  private def tmp(pfx: String) = Files.createTempDirectory(pfx).toString

  test("readJsonl: clean rows parse, malformed and keyless lines quarantine") {
    val dir = tmp("graft-jsonl")
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "src0", "n_chars": 11}""",
      """{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "src1", "n_chars": 7}""",
      """{"doc_id": 3, "text": "truncated""", // malformed JSON
      """not json at all""",
      """{"text": "no key", "lang": "en", "source": "src0", "n_chars": 6}""") // missing doc_id
    Files.write(java.nio.file.Paths.get(dir, "part0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val raw = CorpusIO.readJsonl(spark, dir)
    val clean = CorpusIO.cleanDocs(raw)
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(clean == Seq(
      (1L, "hello world", "en", "src0", 11L),
      (2L, "bonjour", "fr", "src1", 7L)))
    val quarantined = CorpusIO.quarantine(raw).as[String].collect().toSeq
    // two malformed lines keep their raw text; the keyless-but-valid
    // line quarantines with a null raw_line (it parsed, so nothing was
    // captured — the doc_id null IS the evidence)
    assert(quarantined.count(_ != null) == 2)
    assert(quarantined.length == 3)
    assert(quarantined.filter(_ != null).exists(_.contains("truncated")))
    // nothing lost: clean + quarantine partition the input lines
    assert(clean.length + quarantined.length == lines.length)
  }

  test("writeCurated round-trips; files-derived manifest equals source-side recomputation") {
    val docs = Tables.read(spark, sf, "documents")
    val dir = tmp("graft-curated")
    // the manifest is computed from the written files (one scan of the
    // curated output, no source-lineage re-execution)...
    val manifest = CorpusIO.writeCurated(docs, dir, buckets = 8)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    // read-back content equality (partition columns re-derive doc_id%8)
    val back = CorpusIO.readCurated(spark, dir)
    assert(back.count() == docs.count())
    assert(back.select(sum("n_chars")).head.getLong(0) ==
      docs.select(sum("n_chars")).head.getLong(0))
    // ...so comparing it against a recomputation from the SOURCE frame
    // proves the write lost/duplicated nothing, per partition
    val recomputed = docs
      .withColumn("part", pmod(col("doc_id"), lit(8L)))
      .groupBy("lang", "part")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
        min("doc_id").as("min_doc_id"), max("doc_id").as("max_doc_id"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(manifest == recomputed)
    // the stored manifest matches the returned one
    val stored = CorpusIO.readManifest(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(stored == manifest)
  }

  test("writeCurated of an all-rows-filtered corpus yields an empty manifest, not a crash") {
    val docs = Tables.read(spark, sf, "documents").filter(col("doc_id") < 0)
    val dir = tmp("graft-empty")
    val manifest = CorpusIO.writeCurated(docs, dir, buckets = 4)
    assert(manifest.count() == 0L)
    assert(CorpusIO.readManifest(spark, dir).count() == 0L)
  }

  test("readCurated lang filter prunes partitions before I/O") {
    val docs = Tables.read(spark, sf, "documents")
    val dir = tmp("graft-pruned")
    CorpusIO.writeCurated(docs, dir, buckets = 4)
    val en = CorpusIO.readCurated(spark, dir, Some("en"))
    val scan = en.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      s"lang filter must reach the scan as a partition filter:\n$scan")
    assert(en.count() == docs.filter(col("lang") === "en").count())
    // one file per (lang, part) partition: repartition before write
    // collapsed each partition into a single task's output
    val files = new java.io.File(s"$dir/data")
    def parquets(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(parquets)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    val perDir = parquets(files).groupBy(_.getParentFile.getPath)
    assert(perDir.nonEmpty)
    perDir.foreach { case (d, fs) =>
      assert(fs.size == 1, s"partition dir $d has ${fs.size} files")
    }
  }
}
