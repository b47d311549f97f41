package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQueryProgress

/** X26 operational telemetry — the corpus-side analogue of
  * [[IngestStats]] (S6): per micro-batch, how many JSONL lines
  * arrived, how many would quarantine (malformed vs field-incomplete
  * vs contract-breaking negative-id `invalid` —
  * `CorpusIO.quarantine`'s three shared classes), and
  * how many documents the first-occurrence dedup gate admitted. This
  * is the dashboard a production crawl actually watches: a malformed
  * spike means the upstream format changed, an incomplete spike means
  * a field was dropped at the source, and a dup-rate collapse means
  * the crawler is re-fetching old content. Counters ride
  * `df.observe(...)` into each batch's `StreamingQueryProgress`,
  * exactly like the metric side — zero extra passes over the data.
  * Scoping/ring machinery comes from [[ScopedQueryListener]].
  */
object CorpusIngestStats {
  case class BatchStats(
      runId: String,
      batchId: Long,
      timestamp: String,
      nLines: Long,
      nMalformed: Long,
      nIncomplete: Long,
      nGatePass: Long,
      nAdmitted: Long,
      nInvalid: Long,
      nLateDroppedRows: Long,
      batchDurationMs: Long,
      nNearDupDropped: Long,
      nHotBucketDropped: Long,
      nLowQualityDropped: Long)
  /** Driver-side retention cap — the buffer is a ring, not a leak. */
  val MaxRetained = 10000
}

class CorpusIngestStats
    extends ScopedQueryListener[CorpusIngestStats.BatchStats] {
  import CorpusIngestStats.BatchStats

  override protected def maxRetained: Int = CorpusIngestStats.MaxRetained
  override protected def runIdOf(row: BatchStats): String = row.runId

  override protected def rowOf(p: StreamingQueryProgress): BatchStats =
    // TWO counter layouts, read additively (a query emits exactly one,
    // so every sum has one non-zero side): the linear pipes observe
    // input totals up front ("corpus_in"); the TTL pipe splits
    // quarantine around its watermarked gate and may not observe above
    // the split (a union would duplicate the CollectMetrics node and
    // double-count), so it carries per-branch counters instead —
    // "corpus_cin" (clean lines in) and "corpus_quar" (the three
    // quarantine classes) — and n_lines is their sum.
    BatchStats(
      p.runId.toString, p.batchId, p.timestamp,
      obs(p, "corpus_in", "n_lines") + obs(p, "corpus_cin", "n_clean_in") +
        obs(p, "corpus_quar", "n_malformed") +
        obs(p, "corpus_quar", "n_incomplete") +
        obs(p, "corpus_quar", "n_invalid"),
      obs(p, "corpus_in", "n_malformed") +
        obs(p, "corpus_quar", "n_malformed"),
      obs(p, "corpus_in", "n_incomplete") +
        obs(p, "corpus_quar", "n_incomplete"),
      obs(p, "corpus_gated", "n_gate_pass"),
      obs(p, "corpus_out", "n_admitted"),
      obs(p, "corpus_in", "n_invalid") + obs(p, "corpus_quar", "n_invalid"),
      // ROWS Spark's watermark filter dropped as LATE before the
      // stateful ops this batch — the horizon-gated pipe's silent
      // vanish mode made visible (the unbounded pipes have no
      // watermark, so the sum is structurally 0 there). UNIT IS PLAN
      // ROWS, not documents: a late shingled doc fans into k/r band
      // rows before the watermark filter, a shingle-less one is a
      // single row — the field name says Rows so nobody reconciles it
      // 1:1 against the line/doc counters. An observe() cannot count
      // this: the filter sits between two plan points no user column
      // survives, and a derived in−out metric spanning the gates
      // would misattribute the drop class (the round-10 lesson)
      p.stateOperators.map(_.numRowsDroppedByWatermark).sum,
      totalDuration(p),
      // the audited pipe's per-reason reject ledger counters
      // (structurally 0 when auditGateRejects is off — see
      // CorpusIO.streamCurated's corpus_out observe)
      obs(p, "corpus_out", "n_neardup_dropped"),
      obs(p, "corpus_out", "n_hotbucket_dropped"),
      obs(p, "corpus_out", "n_lowq_dropped"))

  /** The stats table with the derived dashboard columns:
    * `n_clean = lines − malformed − incomplete − invalid` (what
    * passed the split — all three quarantine classes excluded),
    * `n_quality_dropped = clean − gate_pass` (the minQuality
    * door; 0 when ungated since the gate counter is always observed),
    * `n_dup_dropped = gate_pass − admitted` (dedup rejections ONLY —
    * attributing gate drops here would fire the re-fetch alarm on a
    * quality shift; in the TTL pipe a WATERMARK-dropped late doc also
    * lands here, since it passed the door and was not admitted — the
    * separate `nLateDroppedRows` plan-row counter is the
    * disambiguator), and the two rates a crawl alerts on (the
    * quarantine rate covers all three classes). With the audited
    * pipe (`auditGateRejects`), the per-reason columns
    * `nNearDupDropped` / `nHotBucketDropped` / `nLowQualityDropped`
    * split the conflated derived drops by their ACTUAL ledgered
    * reason — the dashboard stops inferring what the quarantine
    * records now state.
    */
  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.when
    snapshot.toDF()
      .withColumn("n_clean",
        col("nLines") - col("nMalformed") - col("nIncomplete") -
          col("nInvalid"))
      .withColumn("n_quality_dropped", col("n_clean") - col("nGatePass"))
      .withColumn("n_dup_dropped", col("nGatePass") - col("nAdmitted"))
      .withColumn("quarantine_rate",
        when(col("nLines") > 0,
          (col("nMalformed") + col("nIncomplete") + col("nInvalid"))
            .cast("double") /
            col("nLines").cast("double")).otherwise(0.0))
      .withColumn("admit_rate",
        when(col("nLines") > 0,
          col("nAdmitted").cast("double") / col("nLines").cast("double"))
          .otherwise(0.0))
  }
}
