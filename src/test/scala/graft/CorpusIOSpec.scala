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
      """{"text": "no key", "lang": "en", "source": "src0", "n_chars": 6}""", // missing doc_id
      """{"doc_id": 4, "lang": "en", "source": "src0", "n_chars": 4}""") // keyed but missing text
    Files.write(java.nio.file.Paths.get(dir, "part0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val raw = CorpusIO.readJsonl(spark, dir)
    val clean = CorpusIO.cleanDocs(raw)
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(clean == Seq(
      (1L, "hello world", "en", "src0", 11L),
      (2L, "bonjour", "fr", "src1", 7L)))
    val quarantined = CorpusIO.quarantine(raw)
      .as[(String, String)].collect().toSeq
    // two malformed lines keep their raw text under reason=malformed;
    // the parsed-but-field-incomplete lines (missing key, missing
    // text) carry the JSON of the fields that DID parse under
    // reason=incomplete — BOTH classes must be attributable, never an
    // all-null row. The missing-text case is load-bearing: an
    // admitted null text would poison the streaming pipe's typed
    // dedup state and wedge the checkpoint replay
    assert(quarantined.length == 4)
    assert(quarantined.forall(_._2 != null),
      "every quarantine row must carry non-null evidence")
    val (malformed, incomplete) = quarantined.partition(_._1 == "malformed")
    assert(malformed.length == 2 && incomplete.length == 2)
    assert(incomplete.forall(_._1 == "incomplete"))
    assert(malformed.exists(_._2.contains("truncated")))
    // the keyless line's parsed fields survive; the textless line's
    // doc_id survives — the triage questions the old null row could
    // not answer
    assert(incomplete.exists(r =>
      r._2.contains("no key") && !r._2.contains("doc_id")))
    assert(incomplete.exists(r =>
      r._2.contains("\"doc_id\":4") && !r._2.contains("text")))
    // nothing lost: clean + quarantine partition the input lines
    assert(clean.length + quarantined.length == lines.length)
  }

  test("batch split shares the stream's invalid-id contract: negative doc_id quarantines, never admits") {
    // the pinned stream ≡ batch kept-set equivalence (the x103 oracle
    // technique) requires the SAME three-way split on both paths — a
    // batch path that admitted negative ids would diverge from the
    // stream (which must quarantine them: its gates' identity scheme
    // reserves negative ords for minted quarantine rows)
    val dir = tmp("graft-negid")
    val lines = Seq(
      """{"doc_id": 1, "text": "keep me", "lang": "en", "source": "s", "n_chars": 7}""",
      """{"doc_id": -5, "text": "contract breaker", "lang": "en", "source": "s", "n_chars": 16}""")
    Files.write(java.nio.file.Paths.get(dir, "part0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val raw = CorpusIO.readJsonl(spark, dir)
    val clean = CorpusIO.cleanDocs(raw).select("doc_id")
      .as[Long].collect().toSeq
    assert(clean == Seq(1L),
      s"batch cleanDocs must reject the negative id: $clean")
    val quar = CorpusIO.quarantine(raw)
      .as[(String, String)].collect().toSeq
    assert(quar.length == 1 && quar.head._1 == "invalid" &&
      quar.head._2.contains("-5"),
      s"negative id must quarantine as invalid with evidence: $quar")
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

  test("writeCurated zorderWithin: manifest unchanged, files z-clustered inside partitions") {
    val docs = Tables.read(spark, sf, "documents")
    val dirZ = tmp("graft-zsink")
    val dirP = tmp("graft-psink")
    // force several files per (lang, part) partition so per-file
    // min/max clustering is observable through the public reader
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "8")
    try {
      val mz = CorpusIO.writeCurated(docs, dirZ, buckets = 1,
          zorderWithin = true)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet
      val mp = CorpusIO.writeCurated(docs, dirP, buckets = 1)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet
      // the flag changes LAYOUT only — the manifest statement and the
      // row content are identical
      assert(mz == mp)
      assert(CorpusIO.readCurated(spark, dirZ).count() == docs.count())
      // per-file Morton-key intervals: sequential split of a sorted
      // task makes them pairwise disjoint within a partition in the
      // z-ordered tree; the plain tree (input order) must show real
      // overlap on the same key, or this test proves nothing
      def overlaps(dir: String): Int = {
        val keyed = graft.operators.Layout.withZorderKey(
          spark.read.parquet(s"$dir/data")
            .select(col("doc_id"), col("n_chars"), col("lang"),
              input_file_name().as("file")))
        keyed.groupBy("lang", "file")
          .agg(min("zkey").as("lo"), max("zkey").as("hi"))
          .collect().toSeq
          .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
          .groupBy(_._1).values.toSeq.map { fs =>
            val s = fs.sortBy(_._2)
            s.sliding(2).count {
              case Seq(a, b) => a._3 > b._2 // strict interior overlap
              case _ => false
            }
          }.sum
      }
      assert(overlaps(dirZ) == 0,
        "z-ordered partition files must carry disjoint key intervals")
      assert(overlaps(dirP) > 0,
        "plain-write files unexpectedly disjoint — fixture too small " +
          "to distinguish the layouts")
    } finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
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

  test("streaming ingest: stream ≡ batch dedup, quarantine evidence, restart resumes state") {
    val root = tmp("graft-scorpus")
    val in = s"$root/in"
    new java.io.File(in).mkdirs()
    def jline(id: Long, text: String) =
      s"""{"doc_id": $id, "text": "$text", "lang": "en", "source": "src0", "n_chars": ${text.length}}"""
    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(in, name),
        lines.mkString("\n").getBytes("UTF-8"))
    val stats = new graft.streaming.CorpusIngestStats
    val cur = CorpusIO.streamCurated(
      CorpusIO.readJsonlStream(spark, in), s"$root/out", s"$root/ck",
      buckets = 4, stats = Some(stats))
    // batch 0: an in-batch duplicate (ids 0/1 share text — min id wins)
    writeFile("f0.json",
      Seq(jline(0, "aa bb"), jline(1, "aa bb"), jline(2, "cc dd")))
    cur.processAllAvailable()
    // batch 1: a cross-batch duplicate (id 3 repeats batch 0's text)
    // plus quarantine bait that must not block the pipe — two
    // malformed lines AND the poison-pill shape: valid JSON with its
    // key but NO text, which the typed dedup state would NPE on if
    // the clean split ever admitted it (a streaming checkpoint then
    // replays the poison line forever — a wedged ingest)
    writeFile("f1.json", Seq(jline(3, "aa bb"), jline(4, "ee ff"),
      """{"doc_id": 9, "text":""", "junk line",
      """{"doc_id": 10, "lang": "en", "source": "src0", "n_chars": 4}"""))
    cur.processAllAvailable()
    cur.stop()
    // the X26 telemetry reconciles with the data the pipe moved:
    // batch 0 = 3 lines / 2 admitted (in-batch dup), batch 1 = 5
    // lines / 2 malformed / 1 incomplete / 1 admitted (cross-batch
    // dup). Listener events are async (stop() does not flush the
    // bus), so poll BEFORE removing the listener — removal first
    // would drop an in-flight event and flake; coalesce guards the
    // zero-rows-yet window where sum() is null
    val deadline = System.currentTimeMillis() + 20000
    def totals() = stats.toDF(spark)
      .agg(coalesce(sum("nLines"), lit(0L)),
        coalesce(sum("nMalformed"), lit(0L)),
        coalesce(sum("nIncomplete"), lit(0L)),
        coalesce(sum("nAdmitted"), lit(0L)),
        coalesce(sum("n_dup_dropped"), lit(0L)))
      .as[(Long, Long, Long, Long, Long)].head()
    var t = totals()
    while (t._1 < 8L && System.currentTimeMillis() < deadline) {
      Thread.sleep(200); t = totals()
    }
    spark.streams.removeListener(stats)
    assert(t == ((8L, 2L, 1L, 3L, 2L)),
      s"corpus ingest stats did not reconcile: $t")
    // restart against the SAME checkpoint: the dedup state and source
    // offsets must both survive — a post-restart duplicate (id 5) is
    // still a duplicate, a new doc (id 6) is admitted, and batches
    // 0/1 are not re-emitted into the sink
    writeFile("f2.json", Seq(jline(5, "aa bb"), jline(6, "gg hh")))
    val cur2 = CorpusIO.streamCurated(
      CorpusIO.readJsonlStream(spark, in), s"$root/out", s"$root/ck",
      buckets = 4)
    cur2.processAllAvailable()
    cur2.stop()
    val kept = CorpusIO.readCurated(spark, s"$root/out")
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    assert(kept == Set((0L, "aa bb"), (2L, "cc dd"), (4L, "ee ff"),
      (6L, "gg hh")))
    // batch equivalence on the same files: min doc_id per text
    val batch = CorpusIO.cleanDocs(CorpusIO.readJsonl(spark, in))
      .groupBy("text").agg(min("doc_id").as("doc_id"))
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    assert(kept == batch)
    // both malformed lines are quarantined with their raw text
    // intact; the keyed-but-textless line carries the JSON of its
    // parsed fields (doc_id 10 stays attributable) under
    // reason=incomplete. The rows came from the SAME streaming query
    // as the curated output — no second scan of the input exists — and
    // only batches that actually rejected lines wrote a quarantine
    // tree (batch 0 was all-clean)
    assert(new java.io.File(s"$root/out/quarantine").listFiles()
      .count(_.getName.startsWith("batch=")) == 1,
      "clean micro-batches must not grow empty quarantine dirs")
    val q = CorpusIO.readQuarantine(spark, s"$root/out")
      .select("reason", "raw_line").as[(String, String)].collect().toSeq
    assert(q.length == 3 && q.forall(_._2 != null))
    assert(q.count(_._1 == "malformed") == 2 &&
      q.exists(_._2.contains("\"doc_id\": 9")) &&
      q.exists(_._2 == "junk line"))
    val inc = q.filter(_._1 == "incomplete")
    assert(inc.length == 1 && inc.head._2.contains("\"doc_id\":10"))
  }

  test("compactCurated: churn — ingest, compact, ingest, crash-replay, compact; read-back identical") {
    val root = tmp("graft-ccompact")
    val in = s"$root/in"
    val out = s"$root/out"
    val ck = s"$root/ck"
    new java.io.File(in).mkdirs()
    def jline(id: Long, text: String) =
      s"""{"doc_id": $id, "text": "$text", "lang": "${if (id % 2 == 0) "en" else "fr"}", "source": "src0", "n_chars": ${text.length}}"""
    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(in, name),
        lines.mkString("\n").getBytes("UTF-8"))
    def drain(): Unit = {
      val c = CorpusIO.streamCurated(
        CorpusIO.readJsonlStream(spark, in), out, ck, buckets = 4)
      try c.processAllAvailable() finally c.stop()
    }
    def keptSet() = CorpusIO.readCurated(spark, out)
      .select("doc_id", "text", "lang").as[(Long, String, String)]
      .collect().toSet
    def batchDirs() = new java.io.File(s"$out/data").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).sorted.toSeq

    // two micro-batches (maxFilesPerTrigger=1), clean stop
    writeFile("f0.json", Seq(jline(0, "aa bb"), jline(1, "cc dd")))
    writeFile("f1.json", Seq(jline(2, "aa bb"), jline(3, "ee ff")))
    drain()
    assert(batchDirs().size == 2, "two per-batch trees before compact")
    val before = keptSet()
    CorpusIO.compactCurated(spark, out, None)
    // the committed trees folded into ONE; content is untouched; the
    // read schema carries no `batch` column (unified with writeCurated)
    assert(batchDirs() == Seq("batch=compacted"))
    assert(keptSet() == before)
    assert(!CorpusIO.readCurated(spark, out).columns.contains("batch"))
    // compaction is idempotent
    CorpusIO.compactCurated(spark, out, None)
    assert(batchDirs() == Seq("batch=compacted") && keptSet() == before)

    // more ingest against the SAME checkpoint appends a fresh batch
    // tree NEXT TO the compacted one (id 4 duplicates a compacted
    // text — the dedup state must still know it)
    writeFile("f2.json", Seq(jline(4, "aa bb"), jline(5, "gg hh")))
    drain()
    assert(batchDirs().size == 2)
    // simulate a crash window: batch 2's sink tree is on disk but its
    // checkpoint commit is gone — the StreamingSpec technique. A
    // compact told the query may replay MUST carry that tree through
    // unmerged under its original key: folding it would let the
    // replay's overwrite re-append its rows (double count)
    Files.delete(java.nio.file.Paths.get(s"$ck/commits/2"))
    // the local ChecksumFileSystem shadows every file with a .crc —
    // deleting only the commit file leaves a stale checksum that makes
    // the replay's commit rename throw FileAlreadyExists
    Files.deleteIfExists(java.nio.file.Paths.get(s"$ck/commits/.2.crc"))
    CorpusIO.compactCurated(spark, out, Some(ck))
    assert(batchDirs().size == 2 &&
      batchDirs().count(_ == "batch=compacted") == 1,
      s"uncommitted tail must survive unmerged: ${batchDirs()}")
    // restart: Spark replays batch 2 (offsets exist, commit missing),
    // the foreachBatch overwrite converges the carried tree in place
    drain()
    CorpusIO.compactCurated(spark, out, None)
    // every committed tree is now a generation (tiny same-order-of-
    // magnitude gens may or may not have merged — the ratio decides;
    // what is pinned is that NO raw batch tree survives a compact)
    assert(batchDirs().forall(_.matches("batch=compacted(_g\\d+)?")),
      s"raw batch trees survived the compact: ${batchDirs()}")
    // end state ≡ batch semantics over all files: min doc_id per text
    val batch = CorpusIO.cleanDocs(CorpusIO.readJsonl(spark, in))
      .groupBy("text").agg(min("doc_id").as("doc_id"))
      .count()
    assert(keptSet().size == batch.toInt)
    assert(keptSet() == Set((0L, "aa bb", "en"), (1L, "cc dd", "fr"),
      (3L, "ee ff", "fr"), (5L, "gg hh", "fr")))
    // one file per leaf partition dir inside every generation tree
    def parquets(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(parquets)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    parquets(new java.io.File(s"$out/data"))
      .groupBy(_.getParentFile.getPath).foreach { case (d, fs) =>
        assert(fs.size == 1, s"partition dir $d has ${fs.size} files")
      }
    // the refreshed manifest equals a recomputation from the kept docs
    val manifest = CorpusIO.readManifest(spark, out)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    val recomputed = CorpusIO.readCurated(spark, out)
      .groupBy("lang", "part")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
        min("doc_id").as("min_doc_id"), max("doc_id").as("max_doc_id"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(manifest == recomputed)
  }

  test("compactCurated is generational: compact cost ∝ intake, old generations untouched") {
    val root = tmp("graft-gens")
    val in = s"$root/in"
    val out = s"$root/out"
    val ck = s"$root/ck"
    new java.io.File(in).mkdirs()
    def jline(id: Long, text: String) =
      s"""{"doc_id": $id, "text": "$text", "lang": "en", "source": "s", "n_chars": ${text.length}}"""
    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(in, name),
        lines.mkString("\n").getBytes("UTF-8"))
    def drain(): Unit = {
      val c = CorpusIO.streamCurated(
        CorpusIO.readJsonlStream(spark, in), out, ck, buckets = 4)
      try c.processAllAvailable() finally c.stop()
    }
    def batchDirs() = new java.io.File(s"$out/data").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).sorted.toSeq
    def parquets(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(parquets)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    def snapshot(d: java.io.File) =
      parquets(d).map(f => (f.getPath, f.lastModified, f.length)).toSet
    // a big founding corpus (incompressible per-doc tokens so its
    // on-disk size dominates the tiny intake gens by far more than
    // the merge ratio), folded into the bootstrap generation
    writeFile("f0.json", (0 until 200).map(i =>
      jline(i, (0 until 40).map(j => s"w${i}x$j").mkString(" "))))
    drain()
    CorpusIO.compactCurated(spark, out, None)
    assert(batchDirs() == Seq("batch=compacted"))
    val bigGen = new java.io.File(s"$out/data/batch=compacted")
    val snap0 = snapshot(bigGen)
    // two tiny intake cycles: each compact must fold ONLY the new
    // batches — the founding generation's files stay bit-for-bit in
    // place (same paths, mtimes, lengths), which is the whole point:
    // compact cost ∝ intake since last compact, never ∝ corpus
    writeFile("f1.json",
      Seq(jline(1000, "aa bb cc dd"), jline(1001, "ee ff gg hh")))
    drain()
    CorpusIO.compactCurated(spark, out, None)
    assert(snapshot(bigGen) == snap0,
      "the founding generation was rewritten to absorb a tiny intake")
    assert(batchDirs() == Seq("batch=compacted", "batch=compacted_g1"))
    writeFile("f2.json",
      Seq(jline(1002, "ii jj kk ll"), jline(1003, "mm nn oo pp")))
    drain()
    CorpusIO.compactCurated(spark, out, None)
    assert(snapshot(bigGen) == snap0,
      "the founding generation was rewritten on the second cycle")
    // the two same-sized tiny generations violate the geometric
    // invariant and merge into a fresh youngest; the founding gen
    // does not participate
    assert(batchDirs().size == 2 &&
      batchDirs().head == "batch=compacted" &&
      batchDirs().forall(_.matches("batch=compacted(_g\\d+)?")),
      s"tiny generations failed to merge geometrically: ${batchDirs()}")
    // nothing lost or doubled across the generational layout, and the
    // manifest describes exactly the generations
    import spark.implicits._
    val ids = CorpusIO.readCurated(spark, out)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == ((0L until 200L) ++ Seq(1000L, 1001L, 1002L, 1003L)),
      s"generational fold lost/doubled rows: ${ids.length} ids")
    assert(CorpusIO.readManifest(spark, out)
      .agg(org.apache.spark.sql.functions.sum("n_docs")).head.getLong(0)
      == 204L)
  }

  test("compact's manifest refresh is incremental: committed generation rows are never re-read") {
    val root = tmp("graft-incman")
    val in = s"$root/in"
    val out = s"$root/out"
    val ck = s"$root/ck"
    new java.io.File(in).mkdirs()
    def jline(id: Long, text: String) =
      s"""{"doc_id": $id, "text": "$text", "lang": "en", "source": "s", "n_chars": ${text.length}}"""
    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(in, name),
        lines.mkString("\n").getBytes("UTF-8"))
    def drain(): Unit = {
      val c = CorpusIO.streamCurated(
        CorpusIO.readJsonlStream(spark, in), out, ck, buckets = 4)
      try c.processAllAvailable() finally c.stop()
    }
    // founding corpus (incompressible tokens — its size dwarfs the
    // intake, so the geometric merge never touches it), compacted
    writeFile("f0.json", (0 until 100).map(i =>
      jline(i, (0 until 40).map(j => s"w${i}x$j").mkString(" "))))
    drain()
    CorpusIO.compactCurated(spark, out, None)
    val m0 = CorpusIO.readManifest(spark, out)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    // corrupt EVERY data parquet file in the founding generation —
    // same length, garbage bytes — leaving only its per-generation
    // _manifest readable. If ANY step of the next compact (fold,
    // merge-sizing, manifest refresh) read a founding-generation row,
    // the corrupt footer would throw and fail this test; succeeding
    // is the direct proof that a compact run reads no parquet outside
    // the keys it folds plus the tiny per-generation manifests.
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    val founding = new java.io.File(s"$out/data/batch=compacted")
    val dataFiles = walk(founding)
      .filterNot(_.getPath.contains("/_manifest"))
    assert(dataFiles.nonEmpty, "fixture must have founding data files")
    dataFiles.foreach { f =>
      Files.write(f.toPath, Array.fill(f.length.toInt)('X'.toByte))
    }
    // tiny intake → compact: folds ONLY the fresh batch, merges the
    // corpus manifest from per-generation manifests
    writeFile("f1.json",
      Seq(jline(1000, "aa bb cc dd"), jline(1001, "ee ff gg hh")))
    drain()
    CorpusIO.compactCurated(spark, out, None)
    // the refreshed manifest is exactly the monoid merge of the
    // founding manifest and the intake's rows (buckets=4: ids 1000 →
    // part 0, 1001 → part 1; 4 tokens each)
    val intake = Seq(("en", 0L, 1L, 4L, 1000L, 1000L),
      ("en", 1L, 1L, 4L, 1001L, 1001L))
    val expected = (m0.toSeq ++ intake)
      .groupBy(r => (r._1, r._2)).map { case ((lang, part), rs) =>
        (lang, part, rs.map(_._3).sum, rs.map(_._4).sum,
          rs.map(_._5).min, rs.map(_._6).max)
      }.toSet
    val m1 = CorpusIO.readManifest(spark, out)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(m1 == expected,
      s"merged manifest diverged from the monoid merge:\n$m1\nvs\n$expected")
    // every generation carries its own manifest
    new java.io.File(s"$out/data").listFiles()
      .filter(_.getName.startsWith("batch=")).foreach { g =>
        assert(new java.io.File(g, "_manifest").isDirectory,
          s"generation ${g.getName} is missing its per-gen manifest")
      }
  }

  test("compact upgrades a manifest-less (pre-incremental) generation once") {
    val root = tmp("graft-manup")
    val in = s"$root/in"
    val out = s"$root/out"
    new java.io.File(in).mkdirs()
    Files.write(java.nio.file.Paths.get(in, "f0.json"),
      (0 until 20).map(i =>
        s"""{"doc_id": $i, "text": "tok$i aa bb", "lang": "${if (i % 2 == 0) "en" else "fr"}", "source": "s", "n_chars": 10}""")
        .mkString("\n").getBytes("UTF-8"))
    val c = CorpusIO.streamCurated(
      CorpusIO.readJsonlStream(spark, in), out, s"$root/ck", buckets = 4)
    try c.processAllAvailable() finally c.stop()
    CorpusIO.compactCurated(spark, out, None)
    // simulate a tree written before per-generation manifests existed
    val genManifest = new java.io.File(s"$out/data/batch=compacted/_manifest")
    assert(genManifest.isDirectory, "fold must write the per-gen manifest")
    assert(new scala.reflect.io.Directory(genManifest).deleteRecursively())
    // a fresh-batch-free compact recomputes it once (the documented
    // one-time upgrade scan) and the corpus manifest still equals a
    // full recomputation from the kept rows
    CorpusIO.compactCurated(spark, out, None)
    assert(genManifest.isDirectory, "upgrade must materialize the manifest")
    val manifest = CorpusIO.readManifest(spark, out)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    val recomputed = CorpusIO.readCurated(spark, out)
      .groupBy("lang", "part")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
        min("doc_id").as("min_doc_id"), max("doc_id").as("max_doc_id"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(manifest == recomputed && manifest.nonEmpty)
  }

  test("compactCurated folds the quarantine side with the same tail discipline") {
    val root = tmp("graft-qfold")
    val in = s"$root/in"
    val out = s"$root/out"
    val ck = s"$root/ck"
    new java.io.File(in).mkdirs()
    def jline(id: Long, text: String) =
      s"""{"doc_id": $id, "text": "$text", "lang": "en", "source": "s", "n_chars": ${text.length}}"""
    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(in, name),
        lines.mkString("\n").getBytes("UTF-8"))
    def drain(): Unit = {
      val c = CorpusIO.streamCurated(
        CorpusIO.readJsonlStream(spark, in), out, ck, buckets = 2)
      try c.processAllAvailable() finally c.stop()
    }
    def qDirs() = new java.io.File(s"$out/quarantine").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).sorted.toSeq
    import spark.implicits._
    def qRows() = CorpusIO.readQuarantine(spark, out)
      .select("reason", "raw_line").as[(String, String)].collect().toSet
    // two micro-batches, each with one malformed line
    writeFile("f0.json", Seq(jline(0, "aa bb"), "junk zero"))
    writeFile("f1.json", Seq(jline(1, "cc dd"), "junk one"))
    drain()
    assert(qDirs().size == 2)
    CorpusIO.compactCurated(spark, out, None)
    assert(qDirs() == Seq("batch=compacted"),
      s"quarantine batches must fold like the curated side: ${qDirs()}")
    assert(qRows() == Set(("malformed", "junk zero"),
      ("malformed", "junk one")))
    // idempotent: no fresh batches ⇒ the quarantine generation is not
    // rewritten (same files, mtimes, lengths)
    def snap() = new java.io.File(s"$out/quarantine/batch=compacted")
      .listFiles().map(f => (f.getPath, f.lastModified, f.length)).toSet
    val s0 = snap()
    CorpusIO.compactCurated(spark, out, None)
    assert(snap() == s0 && qDirs() == Seq("batch=compacted"),
      "a fresh-batch-free compact must not rewrite the quarantine gen")
    // new bait folds prior generation + new batch into ONE fresh gen
    writeFile("f2.json", Seq(jline(2, "ee ff"), "junk two"))
    drain()
    assert(qDirs().size == 2)
    CorpusIO.compactCurated(spark, out, None)
    assert(qDirs() == Seq("batch=compacted_g1"), s"got ${qDirs()}")
    assert(qRows().size == 3)
    // an uncommitted tail's quarantine tree survives unmerged so the
    // replay's overwrite converges instead of double-counting
    writeFile("f3.json", Seq(jline(3, "gg hh"), "junk three"))
    drain()
    Files.delete(java.nio.file.Paths.get(s"$ck/commits/3"))
    Files.deleteIfExists(java.nio.file.Paths.get(s"$ck/commits/.3.crc"))
    CorpusIO.compactCurated(spark, out, Some(ck))
    assert(qDirs().size == 2 &&
      qDirs().count(_ == "batch=compacted_g1") == 1,
      s"uncommitted quarantine tail must survive unmerged: ${qDirs()}")
    drain() // replay overwrites the tail tree in place
    CorpusIO.compactCurated(spark, out, None)
    assert(qDirs() == Seq("batch=compacted_g2"), s"got ${qDirs()}")
    assert(qRows() == Set(("malformed", "junk zero"),
      ("malformed", "junk one"), ("malformed", "junk two"),
      ("malformed", "junk three")),
      s"replay + fold double-counted or lost quarantine rows: ${qRows()}")
  }

  test("compactCurated fold recovers from every journal crash window") {
    val root = tmp("graft-genrec")
    val in = s"$root/in"
    val out = s"$root/out"
    new java.io.File(in).mkdirs()
    Files.write(java.nio.file.Paths.get(in, "f0.json"),
      Seq(
        """{"doc_id": 1, "text": "aa bb", "lang": "en", "source": "s", "n_chars": 5}""",
        """{"doc_id": 2, "text": "cc dd", "lang": "en", "source": "s", "n_chars": 5}""")
        .mkString("\n").getBytes("UTF-8"))
    val c = CorpusIO.streamCurated(
      CorpusIO.readJsonlStream(spark, in), out, s"$root/ck", buckets = 2)
    try c.processAllAvailable() finally c.stop()
    CorpusIO.compactCurated(spark, out, None)
    import spark.implicits._
    def kept() = CorpusIO.readCurated(spark, out)
      .select("doc_id").as[Long].collect().toSet
    val before = kept()
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(out).getFileSystem(conf)
    // window A: merged tree complete at gen_tmp, journal committed,
    // crash BEFORE the move — recovery must finish the move
    assert(new java.io.File(s"$out/data/batch=compacted")
      .renameTo(new java.io.File(s"$out/gen_tmp")))
    Files.write(java.nio.file.Paths.get(out, "_compact_journal"),
      "compacted".getBytes("UTF-8"))
    CorpusIO.compactCurated(spark, out, None)
    assert(kept() == before && !new java.io.File(s"$out/gen_tmp").exists()
      && !new java.io.File(s"$out/_compact_journal").exists(),
      "crash-before-move recovery failed")
    // window B: move landed, crash BEFORE the source deletes — the
    // journaled keys still sit on disk holding the SAME rows; recovery
    // must retire them (reading now would double-count)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(s"$out/data/batch=compacted"), fs,
      new org.apache.hadoop.fs.Path(s"$out/data/batch=777"), false, conf)
    Files.write(java.nio.file.Paths.get(out, "_compact_journal"),
      "compacted\n777".getBytes("UTF-8"))
    CorpusIO.compactCurated(spark, out, None)
    assert(kept() == before &&
      !new java.io.File(s"$out/data/batch=777").exists() &&
      !new java.io.File(s"$out/_compact_journal").exists(),
      "crash-before-delete recovery double-counted or left the journal")
    // no journal + stale gen_tmp: an incomplete build whose rows still
    // live in their sources — discarded on entry
    new java.io.File(s"$out/gen_tmp").mkdirs()
    Files.write(java.nio.file.Paths.get(out, "gen_tmp", "junk"),
      "x".getBytes("UTF-8"))
    CorpusIO.compactCurated(spark, out, None)
    assert(kept() == before && !new java.io.File(s"$out/gen_tmp").exists(),
      "stale gen_tmp must be discarded")
  }

  test("the TTL pipe's union reuses ONE parse: the quarantine branch is a ReusedExchange in the executed plan") {
    // the single-parse contract's drift pin: the shared repartition
    // must sit BELOW the mapPartitions pushdown barrier or Catalyst
    // pushes each branch's filter into the shared subtree and the
    // planner silently plans the JSONL source twice (the measured
    // round-13 2.00×). The heavy parse_factor measurement lives in
    // StressProof; this reads the executed micro-batch plan directly.
    val root = tmp("graft-reuse")
    val in = s"$root/in"
    new java.io.File(in).mkdirs()
    def jline(id: Long, text: String) =
      s"""{"doc_id": $id, "text": "$text", "lang": "en", "source": "src0", "n_chars": ${text.length}}"""
    Files.write(java.nio.file.Paths.get(in, "f0.json"),
      ((0 until 20).map(i => jline(i.toLong, s"alpha beta gamma $i")) :+
        "junk line").mkString("\n").getBytes("UTF-8"))
    // capture every micro-batch's executed-plan description: the
    // query's LAST execution is the trailing no-data watermark batch
    // (whose empty-folded branches have nothing to reuse), so the pin
    // must read the DATA batch's plan
    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    val pl = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          plans.synchronized { plans += s.physicalPlanDescription }; ()
        case _ => ()
      }
    }
    spark.sparkContext.addSparkListener(pl)
    val ss = graft.operators.Dedup.useRocksDbStateStore(spark.newSession())
    val cur = CorpusIO.streamCurated(
      CorpusIO.readJsonlStream(ss, in), s"$root/out", s"$root/ck",
      buckets = 2, nearDup = Some(0.5), nearDupTtlMicros = Some(5L))
    cur.processAllAvailable()
    cur.stop()
    val deadline = System.currentTimeMillis() + 15000
    def dataPlans() = plans.synchronized {
      plans.filter(p => p.contains("TransformWithState") &&
        p.contains("json")).toSeq
    }
    while (dataPlans().isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(200)
    spark.sparkContext.removeSparkListener(pl)
    val dp = dataPlans()
    assert(dp.nonEmpty, "no data-batch plan captured")
    assert(dp.exists(_.contains("ReusedExchange")),
      "the quarantine branch must reuse the clean branch's parse " +
        "exchange — the single-parse layout regressed to two source " +
        "subtrees")
    dp.filter(_.contains("ReusedExchange")).foreach { p =>
      val scans = "FileScan json".r.findAllIn(p).length
      assert(scans <= 1,
        s"a data batch's executed plan carries $scans JSONL scans — " +
          "expected one (the union's second subtree must be reused)")
    }
  }

  test("streamCurated with nearDupHotBucketCap: a boilerplate storm freezes the buckets, kept set unchanged") {
    val root = tmp("graft-capcorpus")
    val in = s"$root/in"
    new java.io.File(in).mkdirs()
    val hot = (1 to 40).map(i => s"hot$i").mkString(" ")
    val cold = (100 to 140).map(i => s"cold$i").mkString(" ")
    def jline(id: Long, text: String) =
      s"""{"doc_id": $id, "text": "$text", "lang": "en", "source": "src0", "n_chars": ${text.length}}"""
    val ss = graft.operators.Dedup.useRocksDbStateStore(spark.newSession())
    val cur = CorpusIO.streamCurated(
      CorpusIO.readJsonlStream(ss, in), s"$root/out", s"$root/ck",
      buckets = 4, nearDup = Some(0.5), nearDupHotBucketCap = Some(3))
    // a 10-doc identical-text storm + one unrelated doc: docs past
    // the cap auto-reject through the frozen buckets; the kept set is
    // what the uncapped gate would keep (identical text rejects
    // either way), the unrelated doc is untouched, and the band state
    // is FROZEN at the cap instead of growing with the storm
    Files.write(java.nio.file.Paths.get(in, "f0.json"),
      ((0 until 10).map(i => jline(i.toLong, hot)) :+ jline(10, cold))
        .mkString("\n").getBytes("UTF-8"))
    cur.processAllAvailable()
    val bandRows = cur.lastProgress.stateOperators.map(_.numRowsTotal).max
    cur.stop()
    import spark.implicits._
    val kept = CorpusIO.readCurated(spark, s"$root/out")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 10L),
      s"capped pipe kept $kept — expected the storm owner and the " +
        "unrelated doc only")
    // 4 hot buckets frozen at 3 + 4 cold-doc buckets + the doc store
    // (one row per stored doc) — far below the 11 docs × 4 bands an
    // unfrozen layout would hold
    assert(bandRows <= 30L,
      s"band state grew past the frozen cap through the pipe: $bandRows")
  }

  test("streamCurated with the near-dup gate: mutated copies rejected at the door, telemetry reconciles") {
    val root = tmp("graft-ndcorpus")
    val in = s"$root/in"
    new java.io.File(in).mkdirs()
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"tok$i").mkString(" ")
    def jline(id: Long, text: String) =
      s"""{"doc_id": $id, "text": "$text", "lang": "en", "source": "src0", "n_chars": ${text.length}}"""
    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(in, name),
        lines.mkString("\n").getBytes("UTF-8"))
    val stats = new graft.streaming.CorpusIngestStats
    // the unbounded gate's band op is transformWithState — RocksDB is
    // its required state-store provider
    val ss = graft.operators.Dedup.useRocksDbStateStore(spark.newSession())
    val cur = CorpusIO.streamCurated(
      CorpusIO.readJsonlStream(ss, in), s"$root/out", s"$root/ck",
      buckets = 4, stats = Some(stats), nearDup = Some(0.5))
    // batch 0: base doc + an in-batch EXACT copy (the gate subsumes
    // exact dedup) + an unrelated doc
    writeFile("f0.json",
      Seq(jline(0, base), jline(1, base), jline(2, other)))
    cur.processAllAvailable()
    // batch 1: a cross-batch MUTATED copy (near-dup, not exact — the
    // thing the exact gate cannot catch), a fresh doc, a malformed
    // line, AND a parsed-but-contract-breaking negative doc_id —
    // quarantine must ride the NEAR-DUP gate path too (empty text ⇒
    // no shingles ⇒ no LSH state), and the negative id must land in
    // quarantine as `invalid` instead of colliding with a minted
    // negative quarantine ord inside the gate's state machine
    writeFile("f1.json",
      Seq(jline(3, base + " tail42"), jline(4, "zz yy xx ww vv"),
        "gate-path junk", jline(-7, "contract breaker")))
    cur.processAllAvailable()
    cur.stop()
    import spark.implicits._
    val kept = CorpusIO.readCurated(spark, s"$root/out")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 2L, 4L),
      s"near-dup gate kept $kept — the mutated copy must be rejected at the door")
    val quar = CorpusIO.readQuarantine(spark, s"$root/out")
      .select("reason", "raw_line").as[(String, String)].collect().toSet
    assert(quar.size == 2 && quar.contains(("malformed", "gate-path junk")),
      s"quarantine must flow through the near-dup gate pipe: $quar")
    val invalid = quar.filter(_._1 == "invalid")
    assert(invalid.size == 1 && invalid.head._2.contains("-7"),
      s"negative doc_id must quarantine as invalid with evidence: $quar")
    // telemetry: the gate path emits one row per ADMITTED doc, so
    // n_admitted (and the derived dup-dropped) stay honest
    val deadline = System.currentTimeMillis() + 20000
    def totals() = stats.toDF(spark)
      .agg(coalesce(sum("nLines"), lit(0L)),
        coalesce(sum("nMalformed"), lit(0L)),
        coalesce(sum("nInvalid"), lit(0L)),
        coalesce(sum("nAdmitted"), lit(0L)),
        coalesce(sum("n_dup_dropped"), lit(0L)))
      .as[(Long, Long, Long, Long, Long)].head()
    var t = totals()
    while (t._1 < 7L && System.currentTimeMillis() < deadline) {
      Thread.sleep(200); t = totals()
    }
    spark.streams.removeListener(stats)
    assert(t == ((7L, 1L, 1L, 3L, 2L)),
      s"gate telemetry did not reconcile: $t")
  }

  test("audited pipe: every drop class leaves a reasoned record, per-reason counters reconcile, both layouts") {
    // near-dup rejects, a quality-door drop and a parse failure all
    // land in quarantine with their reason + evidence; the corpus_out
    // per-reason counters match the ledgered rows. Driven through
    // BOTH gate layouts — the unbounded one (quality drops take
    // minted negative ords around nothing) and the TTL one (they
    // ride the clean branch through the watermarked gate on their
    // real ords) — with a horizon wider than the corpus so the kept
    // sets must agree.
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"tok$i").mkString(" ")
    val lowq = Seq.fill(40)("aa").mkString(" ") // ttr 1/40 → score ≈ 0.14
    def jline(id: Long, text: String) =
      s"""{"doc_id": $id, "text": "$text", "lang": "en", "source": "src0", "n_chars": ${text.length}}"""
    Seq(false, true).foreach { ttl =>
      val root = tmp(s"graft-auditpipe$ttl")
      val in = s"$root/in"
      new java.io.File(in).mkdirs()
      def writeFile(name: String, lines: Seq[String]): Unit =
        Files.write(java.nio.file.Paths.get(in, name),
          lines.mkString("\n").getBytes("UTF-8"))
      val stats = new graft.streaming.CorpusIngestStats
      val ss = graft.operators.Dedup.useRocksDbStateStore(spark.newSession())
      val cur = CorpusIO.streamCurated(
        CorpusIO.readJsonlStream(ss, in), s"$root/out", s"$root/ck",
        buckets = 4, stats = Some(stats), nearDup = Some(0.5),
        minQuality = Some(3.0),
        nearDupTtlMicros = if (ttl) Some(1000000000L * 1000000L) else None,
        auditGateRejects = true)
      writeFile("f0.json",
        Seq(jline(0, base), jline(1, base), jline(2, lowq),
          "audit junk line"))
      cur.processAllAvailable()
      writeFile("f1.json",
        Seq(jline(3, base + " tail42"), jline(4, other)))
      cur.processAllAvailable()
      cur.stop()
      import spark.implicits._
      val kept = CorpusIO.readCurated(spark, s"$root/out")
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(0L, 4L),
        s"audited pipe (ttl=$ttl) kept $kept — expected the owner and " +
          "the unrelated doc only")
      val quar = CorpusIO.readQuarantine(spark, s"$root/out")
        .select(col("reason"),
          get_json_object(col("raw_line"), "$.doc_id").cast("long"),
          get_json_object(col("raw_line"), "$.of_ord").cast("long"))
        .as[(String, Option[Long], Option[Long])].collect()
      val nd = quar.filter(_._1 == "near_dup").sortBy(_._2)
      assert(nd.toSeq == Seq(("near_dup", Some(1L), Some(0L)),
          ("near_dup", Some(3L), Some(0L))),
        s"(ttl=$ttl) near-dup ledger wrong: ${nd.toSeq}")
      val lq = quar.filter(_._1 == "low_quality")
      assert(lq.length == 1 && lq.head._2 == Some(2L),
        s"(ttl=$ttl) quality ledger wrong: ${lq.toSeq}")
      assert(quar.count(_._1 == "malformed") == 1,
        s"(ttl=$ttl) parse failure must stay ledgered")
      // per-reason counters == the ledgered rows; the derived
      // dup-dropped column equals the near-dup ledger exactly
      val deadline = System.currentTimeMillis() + 20000
      def totals() = stats.toDF(spark)
        .agg(coalesce(sum("nNearDupDropped"), lit(0L)),
          coalesce(sum("nHotBucketDropped"), lit(0L)),
          coalesce(sum("nLowQualityDropped"), lit(0L)),
          coalesce(sum("nAdmitted"), lit(0L)),
          coalesce(sum("n_dup_dropped"), lit(0L)),
          coalesce(sum("n_quality_dropped"), lit(0L)))
        .as[(Long, Long, Long, Long, Long, Long)].head()
      var t = totals()
      while (t._4 < 2L && System.currentTimeMillis() < deadline) {
        Thread.sleep(200); t = totals()
      }
      spark.streams.removeListener(stats)
      assert(t == ((2L, 0L, 1L, 2L, 2L, 1L)),
        s"(ttl=$ttl) per-reason counters did not reconcile: $t")
    }
  }

  test("streamCurated with the TTL gate: horizon rejection + re-admission, quarantine rides the union, telemetry reconciles") {
    val root = tmp("graft-ttlcorpus")
    val in = s"$root/in"
    new java.io.File(in).mkdirs()
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"tok$i").mkString(" ")
    def jline(id: Long, text: String) =
      s"""{"doc_id": $id, "text": "$text", "lang": "en", "source": "src0", "n_chars": ${text.length}}"""
    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(in, name),
        lines.mkString("\n").getBytes("UTF-8"))
    val stats = new graft.streaming.CorpusIngestStats
    // the TTL gate's ops are transformWithState (round 14) — RocksDB
    // is its required state-store provider, as on the unbounded pipe
    val ss = graft.operators.Dedup.useRocksDbStateStore(spark.newSession())
    val cur = CorpusIO.streamCurated(
      CorpusIO.readJsonlStream(ss, in), s"$root/out", s"$root/ck",
      buckets = 4, stats = Some(stats), nearDup = Some(0.5),
      nearDupTtlMicros = Some(5L))
    // batch 0: base + an exact copy at gap 1 (inside the horizon —
    // rejected) + an unrelated doc
    writeFile("f0.json",
      Seq(jline(0, base), jline(1, base), jline(2, other)))
    cur.processAllAvailable()
    // batch 1: a mutated copy at gap 4 from the base (inside —
    // rejected), a malformed line AND a negative-id line (both must
    // ride the union around the watermarked gate: their minted
    // negative ords would be forever-late INSIDE it), and a re-crawl
    // of the base text at gap ≥ 16 from every seen near-dup — beyond
    // the horizon, so it is ADMITTED again (the TTL semantics, inside
    // the full pipe)
    writeFile("f1.json",
      Seq(jline(4, base + " tail42"), "ttl junk",
        jline(-3, "contract breaker"), jline(20, base)))
    cur.processAllAvailable()
    cur.stop()
    import spark.implicits._
    val kept = CorpusIO.readCurated(spark, s"$root/out")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 2L, 20L),
      s"TTL pipe kept $kept — expected within-horizon rejection of 1/4 " +
        "and beyond-horizon re-admission of 20")
    val quar = CorpusIO.readQuarantine(spark, s"$root/out")
      .select("reason", "raw_line").as[(String, String)].collect().toSet
    assert(quar.size == 2 && quar.contains(("malformed", "ttl junk")) &&
      quar.exists(q => q._1 == "invalid" && q._2.contains("-3")),
      s"quarantine must ride the union around the watermarked gate: $quar")
    // telemetry through the TTL layout's per-branch counters: 7 lines
    // (5 clean in + 1 malformed + 1 invalid), 5 gate passes (no
    // quality door), 3 admitted, 2 dup-dropped
    val deadline = System.currentTimeMillis() + 20000
    def totals() = stats.toDF(spark)
      .agg(coalesce(sum("nLines"), lit(0L)),
        coalesce(sum("nMalformed"), lit(0L)),
        coalesce(sum("nInvalid"), lit(0L)),
        coalesce(sum("nGatePass"), lit(0L)),
        coalesce(sum("nAdmitted"), lit(0L)),
        coalesce(sum("n_dup_dropped"), lit(0L)))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    var t = totals()
    while (t._1 < 7L && System.currentTimeMillis() < deadline) {
      Thread.sleep(200); t = totals()
    }
    ss.streams.removeListener(stats)
    assert(t == ((7L, 1L, 1L, 5L, 3L, 2L)),
      s"TTL-pipe telemetry did not reconcile: $t")
  }

  test("streamCurated refuses a quarantine directory in the retired file-sink layout") {
    val root = tmp("graft-qguard")
    new java.io.File(s"$root/out/quarantine/_spark_metadata").mkdirs()
    new java.io.File(s"$root/in").mkdirs()
    val e = intercept[IllegalStateException](
      CorpusIO.streamCurated(CorpusIO.readJsonlStream(spark, s"$root/in"),
        s"$root/out", s"$root/ck", buckets = 2))
    assert(e.getMessage.contains("archive it aside"),
      s"guard must carry the archive-aside instruction: ${e.getMessage}")
  }

  test("streamCurated with the quality gate: stream keeps exactly the batch gate's survivors") {
    val root = tmp("graft-qcorpus")
    val in = s"$root/in"
    new java.io.File(in).mkdirs()
    // rich doc (high TTR, long) passes any modest score; the one-word
    // docs score sqrt(1)·(1−|0−0.1|)·1 = 0.9 — a 2.0 gate drops them;
    // a duplicate of the rich doc still dedups AFTER the gate
    val rich = (1 to 40).map(i => s"tok$i").mkString(" ")
    def jline(id: Long, text: String) =
      s"""{"doc_id": $id, "text": "$text", "lang": "en", "source": "src0", "n_chars": ${text.length}}"""
    Files.write(java.nio.file.Paths.get(in, "f0.json"),
      Seq(jline(0, rich), jline(1, "tiny"), jline(2, "word"),
        jline(3, rich)).mkString("\n").getBytes("UTF-8"))
    val stats = new graft.streaming.CorpusIngestStats
    val cur = CorpusIO.streamCurated(
      CorpusIO.readJsonlStream(spark, in), s"$root/out", s"$root/ck",
      buckets = 4, stats = Some(stats), minQuality = Some(2.0))
    cur.processAllAvailable()
    cur.stop()
    import spark.implicits._
    val kept = CorpusIO.readCurated(spark, s"$root/out")
      .select("doc_id").as[Long].collect().toSet
    // batch reference through the SAME score definition: gate then
    // min-id-per-text dedup among survivors
    val batch = CorpusIO.cleanDocs(CorpusIO.readJsonl(spark, in))
      .filter(graft.operators.TextAnalysis.qualityScore(col("text")) >= 2.0)
      .groupBy("text").agg(min("doc_id").as("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == batch && kept == Set(0L),
      s"stream kept $kept, batch gate says $batch")
    // a corpus that never quarantined a line reads an EMPTY triage
    // table, not PATH_NOT_FOUND (empty batches skip the sink write)
    val q = CorpusIO.readQuarantine(spark, s"$root/out")
    assert(q.count() == 0L &&
      q.columns.toSeq == Seq("reason", "raw_line"),
      "healthy corpus must read an empty quarantine table")
    // telemetry attribution: 2 quality drops and 1 dup drop must land
    // in SEPARATE counters — folding gate drops into n_dup_dropped
    // fires the crawler's re-fetch alarm on a quality shift
    val deadline = System.currentTimeMillis() + 20000
    def totals() = stats.toDF(spark)
      .agg(coalesce(sum("n_clean"), lit(0L)),
        coalesce(sum("n_quality_dropped"), lit(0L)),
        coalesce(sum("n_dup_dropped"), lit(0L)),
        coalesce(sum("nAdmitted"), lit(0L)))
      .as[(Long, Long, Long, Long)].head()
    var t = totals()
    while (t._1 < 4L && System.currentTimeMillis() < deadline) {
      Thread.sleep(200); t = totals()
    }
    spark.streams.removeListener(stats)
    assert(t == ((4L, 2L, 1L, 1L)),
      s"gate drops misattributed: (clean, quality, dup, admitted) = $t")
  }

  test("quality-gated pipe: quarantine rows pass the door regardless of score") {
    // the split decides a quarantine row's fate BEFORE the quality
    // door; its neutral empty text scores 0.9 (split("") is one empty
    // token — no zero division even under ANSI), which a 2.0 gate
    // would drop — the q_reason disjunct must carry it through to the
    // quarantine sink anyway
    val root = tmp("graft-qdoor")
    val in = s"$root/in"
    new java.io.File(in).mkdirs()
    val rich = (1 to 40).map(i => s"tok$i").mkString(" ")
    Files.write(java.nio.file.Paths.get(in, "f0.json"),
      Seq(s"""{"doc_id": 0, "text": "$rich", "lang": "en", "source": "s", "n_chars": ${rich.length}}""",
        "door junk").mkString("\n").getBytes("UTF-8"))
    val cur = CorpusIO.streamCurated(
      CorpusIO.readJsonlStream(spark, in), s"$root/out", s"$root/ck",
      buckets = 2, minQuality = Some(2.0))
    try cur.processAllAvailable() finally cur.stop()
    import spark.implicits._
    assert(CorpusIO.readCurated(spark, s"$root/out")
      .select("doc_id").as[Long].collect().toSeq == Seq(0L))
    val quar = CorpusIO.readQuarantine(spark, s"$root/out")
      .select("reason", "raw_line").as[(String, String)].collect().toSeq
    assert(quar == Seq(("malformed", "door junk")),
      s"the quality door must not eat quarantine rows: $quar")
  }

  test("pre-tag sink upgrade: crashed bare tail converges, foreign bare dirs survive") {
    val root = tmp("graft-upgrade")
    val in = s"$root/in"
    val out = s"$root/out"
    val ck = s"$root/ck"
    new java.io.File(in).mkdirs()
    def jline(id: Long, text: String) =
      s"""{"doc_id": $id, "text": "$text", "lang": "en", "source": "s", "n_chars": ${text.length}}"""
    def drain(): Unit = {
      val c = CorpusIO.streamCurated(
        CorpusIO.readJsonlStream(spark, in), out, ck, buckets = 2)
      try c.processAllAvailable() finally c.stop()
    }
    Files.write(java.nio.file.Paths.get(in, "f0.json"),
      jline(0, "aa bb").getBytes("UTF-8"))
    Files.write(java.nio.file.Paths.get(in, "f1.json"),
      jline(1, "cc dd").getBytes("UTF-8"))
    drain() // batches 0, 1 committed under tagged keys
    val dataDir = new java.io.File(s"$out/data")
    // ---- simulate the PRE-TAG state this checkpoint would have left:
    // bare-id batch dirs on disk, no graft-id in the checkpoint (the
    // legacy marker is commits/ existing without it), batch 1's commit
    // gone (crashed mid-batch-1 before the upgrade)
    dataDir.listFiles().filter(_.getName.startsWith("batch=")).foreach { d =>
      val id = d.getName.substring(d.getName.lastIndexOf('_') + 1)
      assert(d.renameTo(new java.io.File(dataDir, s"batch=$id")))
    }
    Files.delete(java.nio.file.Paths.get(s"$ck/graft-id"))
    Files.deleteIfExists(java.nio.file.Paths.get(s"$ck/.graft-id.crc"))
    Files.delete(java.nio.file.Paths.get(s"$ck/commits/1"))
    Files.deleteIfExists(java.nio.file.Paths.get(s"$ck/commits/.1.crc"))
    // ---- compact-FIRST path (the documented crashed-query contract):
    // the bare tail must be recognized as THIS checkpoint's
    // uncommitted batch and carried unmerged — folding it would
    // double-count after the replay rewrites it under a tagged key
    CorpusIO.compactCurated(spark, out, Some(ck))
    val dirsAfter = dataDir.listFiles().map(_.getName)
      .filter(_.startsWith("batch=")).sorted.toSeq
    assert(dirsAfter.contains("batch=compacted") &&
      dirsAfter.contains("batch=1") && dirsAfter.size == 2,
      s"legacy bare tail must survive the compact unmerged: $dirsAfter")
    // ---- a foreign bare dir BEYOND the frontier successor (id 5,
    // e.g. left by a checkpoint wiped during the pre-tag era) must
    // survive the legacy replay untouched: only committedMax+1 can be
    // this checkpoint's own crashed tail
    new java.io.File(dataDir, "batch=5/lang=en/part=0").mkdirs()
    Tables.read(spark, sf, "documents").limit(1)
      .select(lit(888L).as("doc_id"), col("text"),
        lit("s").as("source"), lit(2L).as("n_chars"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$out/data/batch=5/lang=en/part=0")
    // ---- the upgraded query resumes: replays batch 1, deletes the
    // bare partial, rewrites it under its (adopted-identity) tag
    drain()
    assert(!new java.io.File(dataDir, "batch=1").exists(),
      "the replay must converge the bare partial away")
    assert(new java.io.File(dataDir, "batch=5").exists(),
      "a legacy replay must not touch foreign bare dirs beyond its own tail")
    CorpusIO.compactCurated(spark, out, None)
    import spark.implicits._
    val kept = CorpusIO.readCurated(spark, out)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(0L, 1L, 888L),
      s"upgrade window double-counted or lost foreign data: $kept")
    // ---- foreign protection: under a FRESH (wiped/recreated)
    // checkpoint, a colliding bare-id dir is ANOTHER incarnation's
    // committed data and must never be deleted, even though batch ids
    // restart at 0
    val root2 = tmp("graft-upgrade2")
    val in2 = s"$root2/in"
    new java.io.File(in2).mkdirs()
    new java.io.File(s"$root2/out/data/batch=0/lang=en/part=0").mkdirs()
    Tables.read(spark, sf, "documents").limit(1)
      .select(lit(999L).as("doc_id"), col("text"),
        lit("s").as("source"), lit(2L).as("n_chars"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$root2/out/data/batch=0/lang=en/part=0")
    Files.write(java.nio.file.Paths.get(in2, "f0.json"),
      jline(5, "ee ff").getBytes("UTF-8"))
    val c2 = CorpusIO.streamCurated(
      CorpusIO.readJsonlStream(spark, in2), s"$root2/out", s"$root2/ck",
      buckets = 2)
    try c2.processAllAvailable() finally c2.stop()
    assert(new java.io.File(s"$root2/out/data/batch=0").exists(),
      "a fresh checkpoint must not delete a foreign incarnation's bare dir")
    val ids = CorpusIO.readCurated(spark, s"$root2/out")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(5L, 999L))
  }

  test("corpus sink lock: live ingest blocks compact and a second writer; stale lock clears") {
    val root = tmp("graft-clock")
    val in = s"$root/in"
    val out = s"$root/out"
    new java.io.File(in).mkdirs()
    Files.write(java.nio.file.Paths.get(in, "f0.json"),
      """{"doc_id": 1, "text": "aa", "lang": "en", "source": "s", "n_chars": 2}"""
        .getBytes("UTF-8"))
    val cur = CorpusIO.streamCurated(
      CorpusIO.readJsonlStream(spark, in), out, s"$root/ck", buckets = 2)
    cur.processAllAvailable()
    // a live ingest query holds the lock — compact must not rename the
    // sink tree out from under its foreachBatch
    val e = intercept[graft.streaming.StoreBusyException](
      CorpusIO.compactCurated(spark, out, None))
    assert(e.getMessage.contains("live ingest query"))
    // a second writer on the SAME sink must refuse BEFORE starting and
    // must not leak a running, handle-less query
    val activeBefore = spark.streams.active.map(_.runId).toSet
    val e2 = intercept[graft.streaming.StoreBusyException](
      CorpusIO.streamCurated(
        CorpusIO.readJsonlStream(spark, in), out, s"$root/ck2", buckets = 2))
    assert(e2.getMessage.contains("live"))
    assert(spark.streams.active.map(_.runId).toSet == activeBefore,
      "refused second writer must not leak a running query")
    cur.stop()
    // terminated run ⇒ stale lock: compact clears it and proceeds,
    // releasing its own token on the way out
    CorpusIO.compactCurated(spark, out, None)
    assert(!new java.io.File(s"$out/ingest.lock").exists())
  }

  test("compactCurated recovers from a crash between the two directory renames") {
    val root = tmp("graft-ccrash")
    val in = s"$root/in"
    val out = s"$root/out"
    new java.io.File(in).mkdirs()
    Files.write(java.nio.file.Paths.get(in, "f0.json"),
      """{"doc_id": 1, "text": "aa", "lang": "en", "source": "s", "n_chars": 2}"""
        .getBytes("UTF-8"))
    val c = CorpusIO.streamCurated(
      CorpusIO.readJsonlStream(spark, in), out, s"$root/ck", buckets = 2)
    try c.processAllAvailable() finally c.stop()
    val before = CorpusIO.readCurated(spark, out)
      .select("doc_id").as[Long].collect().toSet
    // simulate the crash window: data moved to data_old, new dir absent
    assert(new java.io.File(s"$out/data")
      .renameTo(new java.io.File(s"$out/data_old")))
    CorpusIO.compactCurated(spark, out, None)
    assert(CorpusIO.readCurated(spark, out)
      .select("doc_id").as[Long].collect().toSet == before)
    assert(!new java.io.File(s"$out/data_old").exists())
  }
}
