package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus ingestion and curated-output I/O for the LLM-pipeline block
  * (SURVEY §2.10) — the boundary operators a 100 TB text pipeline needs
  * around the documents table: crawl dumps arrive as JSONL, curated
  * corpora leave as partitioned parquet with a manifest.
  *
  * The driver's correctness gate only sees parquet fixtures, so this
  * module is spec-verified (CorpusIOSpec): JSONL fixtures are written
  * to a temp dir and read back; the sink round-trips the documents
  * fixture and its manifest is recomputed independently.
  */
object CorpusIO {

  /** The documents-table schema plus the corrupt-record capture column.
    * DECLARED, not inferred: schema inference is a second full read of
    * the input — at crawl scale the inference pass alone costs more
    * than the ingest job, and a drifting input would silently change
    * downstream types instead of landing in quarantine.
    */
  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt", StringType)))

  /** Read a JSONL corpus dump with an explicit schema and PERMISSIVE
    * corrupt-record capture: malformed lines land whole in `_corrupt`
    * (all data columns null) instead of failing the job or being
    * silently dropped — at crawl scale some malformed records are a
    * certainty, and a pipeline must quarantine them with evidence, not
    * die at 80 % of a 100 TB pass (FAILFAST) or lose them without a
    * trace (DROPMALFORMED).
    *
    * Returns the full frame; [[cleanDocs]] / [[quarantine]] split it.
    * Scale shape: JSONL is splittable line-wise, so the scan
    * parallelizes like any text source; the declared schema prunes
    * parsing to the five needed fields.
    */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(DocSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** The data fields a document row must carry to be CLEAN — every
    * declared column. One list feeding both [[cleanDocs]] and
    * [[quarantine]] so the two filters always partition the input.
    */
  private val RequiredFields: Seq[String] =
    DocSchema.fieldNames.toSeq.filterNot(_ == "_corrupt")

  /** The two quarantine evidence classes, as the ONE spelling shared
    * by [[cleanDocs]], [[quarantine]] and [[streamCurated]]'s observe
    * counters — a change to the split rule that missed the telemetry
    * would silently misattribute drops (an uncounted drop class lands
    * in the derived dup-dropped column, corrupting exactly the signal
    * the dashboard alerts on). Both expressions are null-free
    * booleans (isNull/isNotNull never return NULL).
    */
  private def isMalformed: org.apache.spark.sql.Column =
    col("_corrupt").isNotNull
  private def isIncomplete: org.apache.spark.sql.Column =
    col("_corrupt").isNull &&
      RequiredFields.map(col(_).isNull).reduce(_ || _)

  /** Well-formed rows of a [[readJsonl]] frame: every declared field
    * PRESENT, not just parseable — a syntactically valid line missing
    * its key, its text, or any other declared field is quarantine
    * material. The all-fields rule is load-bearing for the streaming
    * pipe: [[streamCurated]] deserializes into the typed
    * [[CuratedDoc]] and keys dedup state on the text, so a single
    * admitted null would crash the batch, and a streaming checkpoint
    * REPLAYS the poison line on every restart — a permanently wedged
    * ingest, the exact failure mode this module exists to prevent.
    */
  def cleanDocs(raw: DataFrame): DataFrame =
    raw.filter(!isMalformed && !isIncomplete)
      .drop("_corrupt")

  /** Quarantined rows, each carrying its drop class and evidence:
    * `reason` is `malformed` (unparseable line) or `incomplete`
    * (parsed but missing a declared field), `raw_line` is the whole
    * captured line for malformed rows and the JSON of the fields that
    * DID parse for incomplete ones — previously that class quarantined
    * as an all-null row, which named the class but discarded the
    * doc_id/source/lang that were present and made triage ("which
    * record lost a field?") impossible. `to_json` omits null fields,
    * so the fallback is exactly the present evidence, at zero extra
    * passes (it rides the same projection). The classes come from the
    * SAME shared predicates the telemetry counts, so the split can
    * never drift from [[streamCurated]]'s observe counters.
    */
  def quarantine(raw: DataFrame): DataFrame =
    raw.filter(isMalformed || isIncomplete)
      .select(
        when(isMalformed, lit("malformed")).otherwise(lit("incomplete"))
          .as("reason"),
        coalesce(col("_corrupt"),
          to_json(struct(RequiredFields.map(col): _*))).as("raw_line"))

  /** Write a curated corpus as hive-partitioned parquet
    * `lang=<l>/part=<p>/` with a recomputed manifest at
    * `<path>/_manifest`. Returns the manifest frame.
    *
    * Layout discipline for 100 TB:
    *  - `part = doc_id % buckets` bounds partition count to
    *    |langs|·buckets regardless of corpus size, and the explicit
    *    `repartition(lang, part)` puts each output partition in ONE
    *    task — one file per partition, not one file per (task ×
    *    partition) — the classic small-files explosion
    *    `partitionBy` alone produces. File size inside a partition is
    *    then governed by `spark.sql.files.maxRecordsPerFile` when a
    *    partition outgrows one file.
    *  - the manifest (per-partition doc count, token sum, doc_id
    *    range) is the reader's integrity check and the planner's
    *    statistics source; it is computed from the files just written
    *    (one scan of the curated output — NOT a re-execution of the
    *    source frame's lineage), and CorpusIOSpec proves it equals a
    *    recomputation from the source frame, closing the loop.
    *  - readers filtering on `lang`/`part` prune directories before
    *    any I/O (PartitionFilters — pinned in CorpusIOSpec).
    */
  def writeCurated(docs: DataFrame, path: String,
                   buckets: Int = 256): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val out = docs.withColumn("part", pmod(col("doc_id"), lit(buckets.toLong)))
    out.repartition(col("lang"), col("part"))
      .write.partitionBy("lang", "part")
      .mode("overwrite").parquet(s"$path/data")
    // the manifest aggregates the FILES JUST WRITTEN, not the source
    // frame: re-aggregating `docs` would re-execute its whole upstream
    // lineage (a curation pipeline's dedup/filter/redact — a second
    // full pass at corpus scale) and would describe the lineage's
    // output, not what landed on disk; reading back costs one scan of
    // the (smaller) curated output and IS the integrity statement.
    // The schema is pinned from the written frame — inference would
    // throw on an all-rows-filtered (empty) corpus, which must yield
    // an empty manifest, not a crash after the data write
    writeManifest(docs.sparkSession.read.schema(out.schema)
      .parquet(s"$path/data"), path)
  }

  /** The ONE manifest aggregation (per-partition doc count, token sum,
    * doc_id range) — shared by [[writeCurated]] and [[compactCurated]]
    * so a streamed-then-compacted corpus and a batch-written one carry
    * the same integrity/statistics contract.
    */
  private def writeManifest(curated: DataFrame, path: String): DataFrame = {
    val manifest = curated
      .groupBy("lang", "part")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
        min("doc_id").as("min_doc_id"),
        max("doc_id").as("max_doc_id"))
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$path/_manifest")
    manifest
  }

  /** A well-formed corpus document as it flows through the streaming
    * ingest pipe — the typed row [[streamCurated]]'s keyed dedup state
    * operates on.
    */
  case class CuratedDoc(doc_id: Long, text: String, lang: String,
                        source: String, n_chars: Long)

  /** Streaming JSONL corpus source — the rolling-crawl sibling of
    * [[readJsonl]]: same DECLARED schema and PERMISSIVE
    * corrupt-record capture, over `readStream`'s file source (new
    * files under `path` become micro-batches; `maxFilesPerTrigger`
    * bounds batch size so one huge dump drop doesn't become one huge
    * batch). [[cleanDocs]] / [[quarantine]] split the stream exactly
    * as they split the batch frame.
    */
  def readJsonlStream(spark: SparkSession, path: String,
                      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(DocSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)

  /** A row of the streaming pipe's internal sum type: a clean document
    * (`q_reason` null, data fields populated, `ord = doc_id`) or a
    * quarantine line (`q_reason`/`q_raw` populated, data fields
    * neutral, `ord` a per-batch-unique NEGATIVE — see
    * [[streamCurated]]). One typed row for both kinds is what lets the
    * quarantine sink ride the curated query's single input pass
    * instead of a second streaming query re-reading every file.
    */
  private[graft] case class PipeDoc(ord: Long, doc_id: Long, text: String,
                                    lang: String, source: String,
                                    n_chars: Long, q_reason: String,
                                    q_raw: String)

  /** Streaming corpus ingestion (SURVEY §2.10 X26, the documents-side
    * analogue of the S2 metric ingest path): a [[readJsonlStream]]
    * frame flows clean-split → exact first-occurrence dedup
    * ([[graft.operators.Dedup.streamingFirstOccurrenceBy]], keyed on
    * the text's md5 hex — a constant ~32-byte string per key, never
    * document text) → curated-layout append via `foreachBatch` (the
    * same `lang=<l>/part=<p>/` discipline as [[writeCurated]], one
    * task per output partition per batch). The checkpoint carries both
    * the file-source offsets and the dedup state, so a restart
    * resumes exactly (no re-admitted duplicates, no lost batches) —
    * the ack-after-durable contract the metric side proves in
    * StreamingSpec.
    *
    * Quarantine rows (malformed/field-incomplete lines — the
    * [[quarantine]] classes with reason + evidence) are written to
    * `<outPath>/quarantine/batch=<key>` from the SAME query: they ride
    * through the pipe as tagged [[PipeDoc]] rows that every gate
    * passes through untouched (empty text ⇒ no shingles ⇒ no LSH
    * state; the exact gate's `bypass` ⇒ no boolean state), then split
    * from the admitted docs inside `foreachBatch` — ONE scan of the
    * crawl input serves both sinks, where the retired
    * `streamQuarantine` query paid a second full pass forever.
    * Quarantine `ord`s are per-batch-unique negatives minted by a
    * per-partition counter, so they can never collide with a clean
    * doc's `ord = doc_id` (doc_ids are non-negative by the pipe's
    * contract) and never merge rows in the gates' per-ord reduce.
    *
    * Stream ≡ batch: when files arrive in doc_id order, the kept set
    * is exactly batch `cleanDocs` + min-doc_id-per-fingerprint of the
    * same files — the x87/q31 oracle technique, pinned by the x103
    * CORRECTNESS row. Scale shape: one keyed-state exchange per batch
    * + the partitioned append; no batch-over-batch joins.
    *
    * `minQuality = Some(m)` puts the batch curation's quality gate at
    * the door (stateless per-row filter, BEFORE dedup — the
    * curateWith order, so a cluster's canonical doc is chosen among
    * gate survivors on both sides), evaluating the SAME
    * `TextAnalysis.qualityScore` column as the batch gate.
    */
  def streamCurated(raw: DataFrame, outPath: String, checkpointDir: String,
                    buckets: Int = 256,
                    stats: Option[graft.streaming.CorpusIngestStats] = None,
                    nearDup: Option[Double] = None,
                    minQuality: Option[Double] = None)
    : org.apache.spark.sql.streaming.StreamingQuery = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = raw.sparkSession
    import spark.implicits._
    // single-writer exclusion, the metric store's SinkLock discipline:
    // refuse a busy sink BEFORE the pre-start work (a live
    // compactCurated would rename this query's output tree out from
    // under it; a second writer would interleave batch dirs) —
    // exclusion itself comes from startGuarded below, which holds the
    // lock from BEFORE .start()
    val lock = sinkLock(outPath)
    lock.assertNotBusy(spark)
    // quarantine-format guard: a directory written by the retired
    // streamQuarantine file-sink (flat part files under a
    // _spark_metadata log; single-column `raw_line` in its oldest
    // form) must not be resumed into — parquet reads over a
    // mixed-layout directory sample one footer for the schema, so old
    // rows would either fail a `reason` projection or silently read it
    // as null. Fail fast with the archive-aside instruction instead of
    // leaving the hazard to a scaladoc migration note.
    val qmeta = new org.apache.hadoop.fs.Path(
      s"$outPath/quarantine/_spark_metadata")
    if (qmeta.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(qmeta))
      throw new IllegalStateException(
        s"$outPath/quarantine was written by the retired streamQuarantine " +
          "file-sink layout (flat files + _spark_metadata); archive it " +
          "aside before resuming — this query writes batch-keyed " +
          "(reason, raw_line) parquet and mixed layouts misread old rows")
    // batch keys carry the checkpoint INCARNATION tag (the metric
    // store's discipline, same helper): an operator who wipes and
    // recreates the checkpoint path restarts batch ids at 0, and a
    // bare-id key would make the new incarnation's batch 0 overwrite
    // the old incarnation's committed batch-0 directory while leaving
    // its later batches as duplicates. The tag also lets
    // [[compactCurated]] distinguish the live incarnation's
    // uncommitted tail from foreign committed batches.
    // legacyCkpt: pre-tag checkpoint (bare-id batch keys in ITS OWN
    // history)? Only then may a replay touch a bare dir — under a
    // wiped/recreated checkpoint, bare dirs are a foreign
    // incarnation's committed data. One graft-id read serves tag,
    // frontier and legacy bit.
    val (ckptTag, committedMax0, legacyCkpt) = graft.streaming
      .StreamingIngest.checkpointIdentityFull(spark, checkpointDir)
    // idempotent registration BEFORE start (the StreamingIngest
    // discipline): reusing one collector across restarts — the
    // pattern bind() supports — must not double-register it, or every
    // batch's counters arrive twice; registering before start means
    // no early batch's progress event is missed, and bind(runId)
    // after start scopes the collector
    stats.foreach { st =>
      spark.streams.removeListener(st)
      spark.streams.addListener(st)
    }
    // observe counters ride the batch's own pass — no extra scan: the
    // input split counts (the SHARED isMalformed/isIncomplete
    // predicates — the same Columns cleanDocs/quarantine filter on)
    // before cleanDocs, the admitted count after the dedup gate
    val observed = raw.observe("corpus_in",
      count(lit(1)).as("n_lines"),
      sum(when(isMalformed, 1L).otherwise(0L)).as("n_malformed"),
      sum(when(isIncomplete, 1L).otherwise(0L)).as("n_incomplete"))
    // ONE pass, both sinks: instead of filtering quarantine rows out
    // (and re-reading the input in a second query to recover them),
    // tag every line into the PipeDoc sum type. Quarantine rows get
    // NEUTRAL data fields — the empty text is load-bearing: no
    // shingles ⇒ the near-dup gate passes them with zero state — and
    // carry reason + evidence computed from the ORIGINAL columns
    // (to_json before the nulling, same spelling as [[quarantine]]).
    val qCond = isMalformed || isIncomplete
    val tagged = observed.select(
      when(qCond, lit(-1L)).otherwise(col("doc_id")).as("ord"),
      when(qCond, lit(-1L)).otherwise(col("doc_id")).as("doc_id"),
      when(qCond, lit("")).otherwise(col("text")).as("text"),
      when(qCond, lit("")).otherwise(col("lang")).as("lang"),
      when(qCond, lit("")).otherwise(col("source")).as("source"),
      when(qCond, lit(0L)).otherwise(col("n_chars")).as("n_chars"),
      when(isMalformed, lit("malformed"))
        .when(isIncomplete, lit("incomplete")).as("q_reason"),
      when(qCond, coalesce(col("_corrupt"),
        to_json(struct(RequiredFields.map(col): _*)))).as("q_raw"))
    // quality gate at the door (stateless per-row filter): the batch
    // curation order — gate first, dedup among survivors — via the
    // SAME TextAnalysis.qualityScore column the batch gate evaluates,
    // so stream ≡ batch by shared definition, not by parallel formulas.
    // Quarantine rows pass the door (they are not documents — their
    // fate was decided by the split). ALWAYS observed, counting CLEAN
    // survivors only (== n_clean when ungated, zero extra passes) so
    // the stats table can attribute gate drops separately — without
    // this counter a quality drop would masquerade as a dup rejection
    // and fire the wrong dashboard alarm
    val gated = minQuality.fold(tagged) { m =>
      tagged.filter(col("q_reason").isNotNull ||
        graft.operators.TextAnalysis.qualityScore(col("text")) >= m)
    }.observe("corpus_gated",
      sum(when(col("q_reason").isNull, 1L).otherwise(0L)).as("n_gate_pass"))
    // quarantine ords: per-batch-unique negatives from a per-partition
    // counter (the mapPartitions exists ONLY to hold that counter — a
    // row-local expression cannot). Uniqueness is what the gates'
    // per-ord reduce keys on; negativity is what keeps them disjoint
    // from clean ords (= non-negative doc_ids). Values vary across a
    // batch replay, which is safe: bypass rows never touch state and
    // the ord is dropped before either sink.
    val typed = gated.as[PipeDoc].mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      var c = 0L
      it.map { d =>
        if (d.q_reason == null) d
        else { c += 1; d.copy(ord = -((pid << 33) | c)) }
      }
    }
    // admission gate: exact first-occurrence by default; with
    // `nearDup = Some(threshold)` the streaming MinHash near-dup gate
    // instead — it subsumes exact dedup for every shingled doc
    // (identical text ⇒ identical bands ⇒ Jaccard 1), while
    // shingle-less docs (< 3 words) pass ungated on both the gate and
    // its batch oracle. State: band-bucket shingle-hash sets instead
    // of one boolean per fingerprint — production runs want the
    // RocksDB state-store provider (see SCALE.md §8d) at crawl
    // cardinality either way. Quarantine rows pass both gates without
    // creating state (no shingles / explicit bypass with a "q|" key a
    // 32-hex md5 can never produce).
    val first = nearDup match {
      case Some(t) =>
        graft.operators.Dedup.streamingNearDupGate(typed, t)(_.text, _.ord)
      case None =>
        graft.operators.Dedup.streamingFirstOccurrenceBy(typed)(
          d => if (d.q_reason != null) "q|" + d.ord
               else graft.operators.Dedup.md5Hex(d.text),
          _.ord, bypass = _.q_reason != null)
    }
    val q = lock.startGuarded(spark) {
      first.toDF()
        .observe("corpus_out",
          sum(when(col("q_reason").isNull, 1L).otherwise(0L))
            .as("n_admitted"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpointDir)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], batchId: Long) =>
          // two sinks consume this batch — pin it so the second action
          // re-reads the cached rows instead of re-executing the plan
          // (a re-execution would also re-drive the stateful gates)
          batch.persist()
          try {
          val out = batch.filter(col("q_reason").isNull)
            .select("doc_id", "text", "lang", "source", "n_chars")
            .withColumn("part", pmod(col("doc_id"), lit(buckets.toLong)))
          // per-batch OVERWRITE directory, not a bare append: a batch
          // that crashes mid-write replays under the SAME batchId with
          // the same deterministic content (the dedup state commits
          // after this hook returns), so the overwrite makes the sink
          // idempotent — the corpus-side spelling of the metric
          // store's marker discipline. `batch=` rides hive partition
          // discovery as the sink's idempotence ledger; [[readCurated]]
          // drops it and [[compactCurated]] folds committed keys away.
          // Upgrade-window convergence: a PRE-TAG checkpoint resuming
          // under this code replays its crashed batch under a tagged
          // key while the old code's bare `batch=<n>` partial survives
          // on disk — delete it, or it double-counts forever as
          // foreign-committed rows next to the tagged rewrite. Guarded
          // THREE ways so nothing else can ever match: the checkpoint
          // must be legacy (a wiped/recreated checkpoint restarts ids
          // at 0 and its bare-dir collisions are a FOREIGN
          // incarnation's committed data — deleting those is data
          // loss), the id must be EXACTLY the frontier successor
          // (batches commit sequentially, so committedMax0 + 1 is the
          // ONLY id the old code can have written without committing;
          // later ids colliding with bare dirs can only be foreign
          // data, and `>` would hold the delete window open for the
          // query's whole life), and the dir must exist. One
          // exists-probe on one batch ever, zero otherwise.
          if (legacyCkpt && batchId == committedMax0 + 1) {
            val bare = new org.apache.hadoop.fs.Path(
              s"$outPath/data/batch=$batchId")
            val lfs = bare.getFileSystem(
              batch.sparkSession.sparkContext.hadoopConfiguration)
            if (lfs.exists(bare)) lfs.delete(bare, true)
          }
          out.repartition(col("lang"), col("part"))
            .write.partitionBy("lang", "part").mode("overwrite")
            .parquet(s"$outPath/data/batch=${ckptTag}_$batchId")
          // quarantine sink from the SAME batch rows: reason + raw
          // evidence, per-batch overwrite directories for the same
          // replay idempotence as the curated side. Empty batches
          // skip the write — a quarantine tree must not grow one
          // empty dir per clean micro-batch forever.
          val quar = batch.filter(col("q_reason").isNotNull)
            .select(col("q_reason").as("reason"),
              col("q_raw").as("raw_line"))
          if (!quar.isEmpty)
            quar.coalesce(1).write.mode("overwrite")
              .parquet(s"$outPath/quarantine/batch=${ckptTag}_$batchId")
          } finally { batch.unpersist(); () }
          ()
        }
        .start()
    }
    stats.foreach(_.bind(q.runId))
    q
  }

  /** Read the quarantine side of a [[streamCurated]] sink back:
    * `(reason, raw_line)` rows, the per-batch idempotence key dropped
    * — the triage table ("which records lost a field this hour, and
    * what did the upstream actually send").
    */
  def readQuarantine(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/quarantine").drop("batch")

  /** The streamed curated tree as a declared schema: the document
    * fields in file order plus the `part` (bucket) and `batch`
    * (sink-idempotence key) partition columns. Declared so partition
    * types never depend on directory-name inference — a tag that
    * happens to be all digits must not flip `batch` to a numeric type
    * under [[compactCurated]]'s string predicates.
    */
  private val StreamedTreeSchema: StructType = StructType(
    DocSchema.fields.filterNot(_.name == "_corrupt") ++ Seq(
      StructField("part", LongType),
      StructField("batch", StringType)))

  /** Fold a [[streamCurated]] sink's committed per-batch directory
    * trees into ONE `batch=compacted` tree ([[writeCurated]]'s
    * one-file-per-(lang, part) discipline inside it) and refresh the
    * corpus `_manifest` — the maintenance op that keeps a continuously
    * ingesting corpus readable. Without it the sink grows one
    * `batch=<key>` tree per micro-batch forever — ~1,440/day at a
    * one-minute trigger, each fanning into up to |langs|·buckets leaf
    * dirs: the exact small-files/listing failure the metric store's
    * `compact()` exists to prevent. Returns the refreshed manifest.
    *
    * OFFLINE maintenance op, like the metric-side compact: it rewrites
    * the whole `data/` tree via the shared verified double-rename
    * (`HtaStore.recoverCompact`/`swapCompact` — crash recovery on
    * entry, backup dir until both renames land), so it must not run
    * concurrently with the ingest query.
    *
    * `activeCheckpoint` follows `HtaStore.compact`'s contract: if the
    * owning query might have crashed mid-batch (any stop that was not
    * a clean `stop()` after `processAllAvailable`), pass its
    * checkpoint — the trailing batch directory that was written but
    * never committed is then carried through UNMERGED under its
    * original key, so the replay's overwrite still converges; folding
    * it would let the replayed batch re-append its rows. `None` is
    * only safe after a clean stop, and that must be a conscious claim
    * by the caller (no default on purpose). Foreign-incarnation keys
    * are always trusted as committed — their checkpoints are gone, so
    * nothing can ever replay them.
    *
    * The refreshed manifest describes the COMPACTED (committed)
    * content; a crash after the swap but before the manifest write
    * leaves a stale manifest that the next compact refreshes —
    * manifest readers get at-least-as-old statistics, never corrupt
    * data. Scale shape: one scan of the tree, one
    * (batch, lang, part)-partitioned rewrite, one manifest scan of
    * the compacted output; no driver-side data path. Cost stated
    * honestly: each compact rewrites the WHOLE committed tree
    * (previous `compacted` content + new batches) — O(corpus), not
    * O(new batches). The right trade while compaction cadence ≫
    * ingest cadence (a daily compact's one corpus pass replaces
    * ~1,440 small trees); a deployment where the compacted corpus
    * dwarfs daily intake should move the curated sink onto a
    * transactional table format (the metric store's same top-end
    * note, SCALE.md §1), which subsumes this mechanism.
    */
  def compactCurated(spark: SparkSession, path: String,
                     activeCheckpoint: Option[String]): DataFrame =
    // single-writer exclusion for the WHOLE fold: a live ingest
    // query's foreachBatch firing between the swap's two renames
    // would recreate `data/` under the backup and the success-path
    // delete(bak) would destroy the only full copy — the exact race
    // the metric store's lock exists for, same SinkLock
    sinkLock(path).withCompact(spark) {
      compactCuratedLocked(spark, path, activeCheckpoint)
    }

  /** The ONE spelling of this sink's lock identity: the writer and
    * the compactor must name the same root and diagnostics label or
    * they stop excluding each other.
    */
  private def sinkLock(path: String) =
    new graft.streaming.SinkLock(path, "corpus sink")

  private def compactCuratedLocked(spark: SparkSession, path: String,
                                   activeCheckpoint: Option[String])
    : DataFrame = {
    import graft.streaming.{HtaStore, StreamingIngest}
    val dataPath = s"$path/data"
    val hp = new org.apache.hadoop.fs.Path(dataPath)
    val hfs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = hfs.makeQualified(hp)
    val bak = new org.apache.hadoop.fs.Path(s"$path/data_old")
    val tmp = new org.apache.hadoop.fs.Path(s"$path/data_compacted")
    HtaStore.recoverCompact(hfs, cur, bak, tmp)
    require(hfs.exists(cur),
      s"no curated tree at $dataPath — nothing to compact")
    val uncommittedTail: org.apache.spark.sql.Column =
      activeCheckpoint match {
        case Some(ckpt) =>
          val (tag, committedMax, legacy) =
            StreamingIngest.checkpointIdentityFull(spark, ckpt)
          // try_cast, not the ANSI cast: the `compacted` key (and any
          // foreign tag) must evaluate to false, not fail the scan
          val tagged = col("batch").startsWith(s"${tag}_") &&
            expr("try_cast(substring_index(batch, '_', -1) AS LONG)") >
              committedMax
          // a PRE-TAG checkpoint's own crashed tail sits on disk as a
          // BARE-id key the tagged predicate can't see — folding it
          // would double-count when the upgraded query replays it
          // under the tagged key (the compact-before-restart path of
          // the upgrade window). Bare keys count as this checkpoint's
          // tail ONLY when the checkpoint is actually legacy AND the
          // id is exactly the frontier successor — the one id the
          // old code can have written without committing; any other
          // bare key is foreign committed data and folds.
          if (legacy)
            tagged || expr("try_cast(batch AS LONG)") ===
              lit(committedMax + 1)
          else tagged
        case None => lit(false)
      }
    val all = spark.read.schema(StreamedTreeSchema).parquet(dataPath)
    // committed rows (incl. an existing `compacted` tree — compaction
    // is idempotent) fold to ONE key; the uncommitted tail passes
    // through under its original keys for the replay to overwrite
    all.withColumn("batch",
        when(uncommittedTail, col("batch")).otherwise(lit("compacted")))
      .repartition(col("batch"), col("lang"), col("part"))
      .write.partitionBy("batch", "lang", "part").parquet(tmp.toString)
    HtaStore.swapCompact(hfs, cur, bak, tmp)
    writeManifest(
      spark.read.schema(StreamedTreeSchema).parquet(dataPath)
        .filter(col("batch") === "compacted"),
      path)
  }

  /** Read a curated corpus back — batch-written ([[writeCurated]]),
    * streamed ([[streamCurated]]), or streamed-then-compacted — with
    * ONE schema: the document fields plus `lang`/`part`. Optionally
    * pruned to one language; the filter is a partition predicate, so
    * only that language's directories are listed and scanned.
    */
  def readCurated(spark: SparkSession, path: String,
                  lang: Option[String] = None): DataFrame = {
    // hive partition-directory inference types `part` as INT; pin it
    // back to the LongType it was written from so the round-trip (and
    // the manifest-vs-files comparison) is schema-stable
    // the streamed sink's `batch` partition level is its idempotence
    // ledger, not data — drop it (a no-op on batch-written layouts)
    // so all corpora read back identically
    val df = spark.read.parquet(s"$path/data").drop("batch")
      .withColumn("part", col("part").cast("long"))
    lang.fold(df)(l => df.filter(col("lang") === l))
  }

  /** The stored manifest of a curated corpus. */
  def readManifest(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/_manifest")
}
