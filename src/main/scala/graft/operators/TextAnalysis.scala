package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines (SURVEY §2.10 X4):
  * quality scoring, language-ID heuristic, token counting, document
  * fingerprinting. All per-document (no cross-row float reductions), so
  * every output value is a deterministic expression of one row.
  */
object TextAnalysis {

  val Stopwords: Seq[String] = Seq("the", "a")

  /** Per-document quality features + a composite score:
    * token count, mean token length, stopword ratio, distinct-token
    * ratio, and `score = √tokens · (1−|stop_ratio−0.1|) · ttr`.
    * (`sqrt`, not `ln`: sqrt is correctly rounded per IEEE-754 in every
    * engine; `ln` is only faithfully rounded and may differ by 1 ulp
    * between Java and C runtimes — enough to break oracle hash parity.)
    */
  def quality(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("long")
    val stopCnt = size(filter(toks, t => t.isin(Stopwords.map(lit(_)): _*))).cast("long")
    val distinctCnt = size(array_distinct(toks)).cast("long")
    docs.select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      .withColumn("n_tokens", nTok)
      .withColumn("avg_token_len",
        (col("n_chars") - (col("n_tokens") - 1)).cast("double") /
          col("n_tokens").cast("double"))
      .withColumn("stopword_ratio", stopCnt.cast("double") / nTok.cast("double"))
      .withColumn("ttr", distinctCnt.cast("double") / nTok.cast("double"))
      .withColumn("quality_score", qualityScore(col("text")))
      .drop("text")
  }

  /** The composite quality score as ONE per-row Column — the single
    * definition [[quality]], [[curateWith]]'s gate, and the streaming
    * corpus pipe's `minQuality` door all evaluate, so the batch and
    * stream gates cannot drift. Same expression tree as the x26
    * columns (sqrt(n_tokens) · (1 − |stopword_ratio − 0.1|) · ttr),
    * bit-identical by construction.
    */
  def qualityScore(text: Column): Column = {
    val toks = split(text, " ")
    val nTok = size(toks).cast("long")
    val stopCnt = size(filter(toks, t => t.isin(Stopwords.map(lit(_)): _*))).cast("long")
    val distinctCnt = size(array_distinct(toks)).cast("long")
    val stopRatio = stopCnt.cast("double") / nTok.cast("double")
    val ttr = distinctCnt.cast("double") / nTok.cast("double")
    sqrt(nTok.cast("double")) * (lit(1.0) - abs(stopRatio - lit(0.1))) * ttr
  }

  /** Fixed keyword profiles for the n-gram-free language-ID heuristic.
    * (The synthetic corpus shares one vocabulary across `lang` labels, so
    * no heuristic can recover the label — the operator demonstrates the
    * mechanism: profile overlap scoring with a deterministic argmax.)
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("table", "key", "hash"),
    "en" -> Seq("the", "a", "fast"),
    "es" -> Seq("data", "row", "slow"),
    "fr" -> Seq("stream", "filter", "merge"),
    "zh" -> Seq("window", "spark", "batch"))

  /** Language-ID: score = |distinct tokens ∩ profile| per language;
    * predicted = first language (alphabetical) achieving the max score.
    */
  def langId(docs: DataFrame): DataFrame = {
    val toks = array_distinct(split(col("text"), " "))
    val scored = LangProfiles.foldLeft(
      docs.select(col("doc_id"), col("lang"), toks.as("toks"))) {
      case (df, (l, words)) =>
        df.withColumn(s"score_$l",
          size(array_intersect(col("toks"), array(words.map(lit(_)): _*))).cast("long"))
    }
    val best = greatest(LangProfiles.map { case (l, _) => col(s"score_$l") }: _*)
    // CASE chain in profile (alphabetical) order → first max wins; a doc
    // matching no profile at all is 'und', not the first language
    val predicted = when(best === 0, lit("und")).otherwise(
      LangProfiles.foldRight(lit("und"): Column) {
        case ((l, _), els) => when(col(s"score_$l") === best, lit(l)).otherwise(els)
      })
    scored
      .withColumn("predicted_lang", predicted)
      .withColumn("lang_score", best)
      .select("doc_id", "lang", "predicted_lang", "lang_score")
  }

  /** Token counting: whitespace tokens and a BPE-ish regex segmentation
    * (letter runs / digit runs / single other chars).
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ws_tokens"),
      regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long")
        .as("bpeish_tokens"))

  /** Document fingerprints: whole-content md5 + winnowing-style signature
    * (min md5 over 5-gram word shingles).
    */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(col("text")).as("content_fp"),
      array_min(transform(Dedup.shingles(col("text"), 5), s => md5(s)))
        .as("winnow_fp"))

  /** Deterministic content-addressed train/valid/test assignment:
    * bucket = first 4 hex chars of `md5(seed ∥ doc_id)` mod 10 →
    * 8/1/1 split. Pure per-row hashing — stable under reshuffling,
    * re-runs, and corpus growth (a doc's split never changes), which is
    * the property a 100 TB pipeline needs; a `rand()`-based split has
    * none of it. md5 keeps it engine-portable (oracle rule).
    */
  /** The ONE spelling of the deterministic 8/1/1 split rule, keyed on
    * an arbitrary id column: md5(seed||id) first-4-hex % 10 →
    * train (<8) / valid (=8) / test. Shared by [[splitAssign]] (keyed
    * on the doc id) and [[clusterSafeSplit]] (keyed on the cluster
    * representative) — the DuckDB mirrors in `OracleSqlExt` are pinned
    * to exactly this rule.
    */
  private def splitOf(id: Column, seed: String): Column = {
    // fused digest→int16, = conv(substring(md5(seed||id), 1, 4), 16, 10)
    val bucket = element_at(graft.functions.Md5Longs(
      concat(lit(seed), id.cast("string")), Seq((1, 4))), 1) % 10
    when(bucket < 8, "train").when(bucket === 8, "valid").otherwise("test")
  }

  def splitAssign(docs: DataFrame, seed: String = "graft"): DataFrame =
    // pass-through: downstream stages keep their columns without
    // re-joining the corpus
    docs.withColumn("split", splitOf(col("doc_id"), seed))

  /** Leakage-safe split (SURVEY §2.10 X30): every document inherits
    * the split of its near-dup CLUSTER representative (the cluster's
    * min doc_id, from [[Dedup.nearDupClusters]]/`starClusters`;
    * unclustered docs are their own representative) — the
    * [[splitAssign]] rule keyed on the representative id instead of
    * the document id, so two near-duplicate documents can NEVER
    * straddle train/valid/test. A plain per-doc split leaks: a
    * near-dup pair split across train and test inflates eval scores
    * with memorized content.
    *
    * Scale shape: one left equi-join docs↔clusters (the cluster table
    * is |clustered docs| rows, usually a small fraction), one per-row
    * md5 — no new shuffle beyond the join.
    */
  def clusterSafeSplit(docs: DataFrame, clusters: DataFrame,
                       seed: String = "graft"): DataFrame = {
    docs.select(col("doc_id"))
      .join(clusters.select(col("doc_id"), col("cluster")), Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("cluster"), col("doc_id")))
      .select(col("doc_id"), col("rep"),
        splitOf(col("rep"), seed).as("split"))
  }

  /** Curation drop-reason ledger (SURVEY §2.10 X31) — the audit trail
    * a production pipeline keeps alongside [[curate]]'s kept corpus:
    * for every candidate document (the non-held pool), the DECISION
    * and the first failing gate in fixed precedence order:
    *
    *   1. `low_quality`  — quality_score < minScore;
    *   2. `duplicate`    — in a near-dup cluster, not its min-id
    *                       representative AMONG THE NON-HELD
    *                       QUALITY-GATE SURVIVORS ([[curateWith]]'s
    *                       canonicalization rule — a cluster whose
    *                       canonical copy was low-quality still keeps
    *                       its best survivor, and the ledger must agree
    *                       or its "kept" rows contradict the curated
    *                       corpus; held members are excluded from the
    *                       slot because a representative that never
    *                       enters the corpus would shift its near-dups'
    *                       reason from `contaminated` to `duplicate` —
    *                       and, in a transitive chain, a member with NO
    *                       direct held overlap may then be kept, which
    *                       is the direct-overlap contamination policy
    *                       applied consistently);
    *   3. `contaminated` — shares ≥ 1 shingle with the held set;
    *   4. `kept`         — passed every gate.
    *
    * With `isHeld = lit(false)` (no held set — gate 3 never fires)
    * and the same (docs, minScore, clusters), the `kept` rows are
    * EXACTLY [[curateWith]]'s kept corpus — spec-pinned. The
    * precedence makes drop counts additive (each doc has exactly one
    * reason), which is what drop-rate dashboards and curation
    * regression diffs need — "why did 4 % more docs drop this crawl?"
    * is unanswerable from a bare kept set.
    *
    * Scale shape: the quality gate is per-row; the dup and
    * contamination signals are the already-scale-shaped [[Dedup]]
    * operators, joined back by doc_id equi-joins. No new shuffle
    * class.
    */
  def curationLedger(docs: DataFrame, minScore: Double,
                     clusters: DataFrame,
                     isHeld: Column): DataFrame = {
    val q = quality(docs).select(col("doc_id"), col("quality_score"))
    // canonicalize among NON-HELD quality survivors: a held cluster
    // member never enters the corpus, so it cannot absorb the
    // representative slot. For DIRECT near-dups of a held doc this
    // only changes the stated reason (they fall to the contamination
    // gate). In a transitive-closure chain it can also change
    // MEMBERSHIP: a member connected to the held doc only through
    // intermediaries (no shared shingle) can become representative
    // and be KEPT — deliberately, because the contamination policy is
    // DIRECT overlap (x46's rule); dropping such a doc before this
    // change was an accident of representative choice, not policy
    val survivingMembers = clusters.select("doc_id", "cluster")
      .join(docs.filter(!isHeld).select("doc_id"), "doc_id")
      .join(q.filter(col("quality_score") >= minScore).select("doc_id"),
        "doc_id")
    val dupDropped = survivingMembers
      .join(survivingMembers.groupBy("cluster").agg(min("doc_id").as("keep")),
        "cluster")
      .filter(col("doc_id") =!= col("keep"))
      .select(col("doc_id")).withColumn("is_dup", lit(true))
    val contaminated = Dedup.decontaminate(docs, isHeld)
      .select(col("doc_id")).withColumn("is_cont", lit(true))
    docs.filter(!isHeld).select(col("doc_id"))
      .join(q, "doc_id")
      .join(dupDropped, Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("quality_score") < minScore, "low_quality")
          .when(col("is_dup"), "duplicate")
          .when(col("is_cont"), "contaminated")
          .otherwise("kept").as("reason"))
  }

  /** Drift report between two [[curationLedger]] runs — the answer to
    * the question the ledger exists for: "why did N % more docs drop
    * this run?" Per reason, the document counts on each side, the
    * delta, and the churn decomposition: `n_entered` docs carrying
    * this reason only in `after` (new docs, or docs whose reason
    * shifted here), `n_left` only in `before`. Σ n_after − Σ n_before
    * over all reasons is the pool-size change; a reason whose
    * n_entered ≫ delta is a SHIFT (docs trading reasons — e.g. a
    * quality-bar tightening converting `duplicate` rows to
    * `low_quality`), not growth — the distinction a threshold-tuning
    * run reads first.
    *
    * Scale shape: one per-(doc, reason) full-outer equi-join of two
    * ledgers (each |pool| rows, already reduced), partially-aggregated
    * counts per reason — output rows = |reasons|.
    */
  def ledgerDrift(before: DataFrame, after: DataFrame): DataFrame = {
    val b = before.select(col("doc_id"), col("reason"))
      .withColumn("in_b", lit(true))
    val a = after.select(col("doc_id"), col("reason"))
      .withColumn("in_a", lit(true))
    b.join(a, Seq("doc_id", "reason"), "full_outer")
      .groupBy("reason")
      .agg(sum(when(col("in_b"), 1L).otherwise(0L)).as("n_before"),
        sum(when(col("in_a"), 1L).otherwise(0L)).as("n_after"),
        sum(when(col("in_a") && col("in_b").isNull, 1L).otherwise(0L))
          .as("n_entered"),
        sum(when(col("in_b") && col("in_a").isNull, 1L).otherwise(0L))
          .as("n_left"))
      .withColumn("delta", col("n_after") - col("n_before"))
  }

  /** Stratified view of [[splitAssign]]: per-(lang, split) counts —
    * the balance check a pipeline runs before training.
    */
  def splitCounts(docs: DataFrame, seed: String = "graft"): DataFrame =
    splitAssign(docs, seed).groupBy("lang", "split")
      .agg(count(lit(1)).as("n"))

  /** End-to-end corpus curation — the canonical training-data pipeline
    * composed from this module's stages in one plan:
    *  1. quality gate (`quality_score ≥ minScore`);
    *  2. near-dup canonicalization: within each [[Dedup.nearDupClusters]]
    *     cluster keep only the min-doc_id representative (an anti-join
    *     against the non-canonical members — no row explosion);
    *  3. deterministic stratified split ([[splitAssign]]).
    * Returns per-(lang, split) counts plus total kept characters — the
    * corpus report a curation run ends with.
    */
  def curate(docs: DataFrame, minScore: Double,
             jaccardThreshold: Double = 0.5, band: Long = 10L,
             seed: String = "graft"): DataFrame =
    curateWith(docs, minScore,
      Dedup.nearDupClusters(
        Dedup.jaccardPairs(docs, jaccardThreshold, band).select("doc_a", "doc_b")),
      seed)

  /** [[curate]] against a PRECOMPUTED `(doc_id, cluster)` table — a
    * curation pipeline materializes clustering once and every consumer
    * reuses it. A separate entry point (not an optional parameter) so
    * similarity parameters can never be silently ignored.
    *
    * Canonicalization happens AMONG the quality-gate survivors: each
    * cluster keeps its min-doc_id member that passed the gate, so a
    * cluster whose overall-min member was low-quality still contributes
    * its best surviving duplicate (dropping the whole cluster because
    * its worst copy was canonical would silently lose content).
    */
  def curateWith(docs: DataFrame, minScore: Double, clusters: DataFrame,
                 seed: String = "graft"): DataFrame = {
    // quality() already carries doc_id/lang/n_chars — one corpus scan
    val survivors = quality(docs).filter(col("quality_score") >= minScore)
    val clusteredSurvivors = survivors.select("doc_id")
      .join(clusters.select("doc_id", "cluster"), "doc_id")
    val dropped = clusteredSurvivors
      .withColumn("keep",
        min("doc_id").over(org.apache.spark.sql.expressions.Window
          .partitionBy("cluster")))
      .filter(col("doc_id") =!= col("keep"))
      .select("doc_id")
    splitAssign(survivors.join(dropped, Seq("doc_id"), "left_anti"), seed)
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars_total"))
  }

  /** Positional word n-grams of each document: `(doc_id, pos, gram)` for
    * every start position with a full n-gram. The per-doc `lead` window
    * partitions by doc_id — parallel across documents, never global.
    */
  private def positionalGrams(docs: DataFrame, n: Int,
                              carry: Seq[String] = Nil): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val toks = docs.select((col("doc_id") +: carry.map(col)) :+
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok")): _*)
    val withNext = (1 until n).foldLeft(toks)((df, i) =>
      df.withColumn(s"t$i", lead(col("tok"), i).over(w)))
    withNext.filter(col(s"t${n - 1}").isNotNull)
      .select((col("doc_id") +: carry.map(col)) :+ col("pos") :+
        concat_ws(" ", col("tok") +: (1 until n).map(i => col(s"t$i")): _*)
          .as("gram"): _*)
  }

  /** Shared tail of the span-removal family (x60 boilerplate strip,
    * x111 dup-span removal): drop the `(doc_id, pos)` rows in
    * `covered` and rebuild each document's text from the surviving
    * tokens in order. Fully-covered documents come back as empty
    * strings — dropping them is the quality gate's decision, not the
    * strip's. Per-doc bounded state only (anti equi-join + one
    * groupBy(doc_id)).
    */
  private def rebuildWithout(docs: DataFrame, covered: DataFrame): DataFrame = {
    val kept = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .join(covered, Seq("doc_id", "pos"), "left_anti")
    val rebuilt = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      sort_array(collect_list(struct(col("pos"), col("tok")))).as("arr"))
      .select(col("doc_id"), col("n_kept"),
        expr("array_join(transform(arr, x -> x.tok), ' ')").as("clean_text"))
    docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Gopher-style within-document repetition scores (Rae et al. 2021,
    * §A1.1 — "fraction of characters in the most frequent n-gram" /
    * "in duplicated n-grams", re-expressed over tokens):
    *
    *  - `top2_ratio`: occurrences of the most frequent 2-gram / total
    *    2-grams — high ⇒ a phrase loops;
    *  - `dup5_ratio`: fraction of 5-gram occurrences whose gram appears
    *    ≥ 2× in the doc — high ⇒ block-level self-repetition;
    *  - `ttr`: distinct tokens / tokens (type-token ratio).
    *
    * All three are int/int divisions of exact counts — one IEEE divide,
    * bit-identical in any engine. Scale: everything is per-doc (grouped
    * or windowed by doc_id) — parallel across the corpus, no cross-doc
    * state.
    */
  def repetitionScores(docs: DataFrame): DataFrame = {
    // ONE tokenize + window-shuffle pass computes leads 1–4; both gram
    // sizes project from the same rows (the 2-gram is a prefix of the
    // 5-gram's leads), so the explode/shuffle below the window is a
    // reused exchange instead of running per gram size. ttr is a pure
    // per-row expression over the docs scan — no shuffle at all.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val toks = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val leads = (1 until 5).foldLeft(toks)((df, i) =>
      df.withColumn(s"t$i", lead(col("tok"), i).over(w)))
    def gramCounts(n: Int): DataFrame = leads
      .filter(col(s"t${n - 1}").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("tok") +: (1 until n).map(i => col(s"t$i")): _*)
          .as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
    val top2 = gramCounts(2).groupBy("doc_id").agg(
      (max("cnt").cast("double") / sum("cnt").cast("double")).as("top2_ratio"))
    val dup5 = gramCounts(5).groupBy("doc_id").agg(
      (sum(when(col("cnt") >= 2, col("cnt")).otherwise(0L)).cast("double") /
        sum("cnt").cast("double")).as("dup5_ratio"))
    val t = split(col("text"), " ")
    docs.select(col("doc_id"),
        (size(array_distinct(t)).cast("double") /
          size(t).cast("double")).as("ttr"))
      .join(top2, Seq("doc_id"), "left")
      .join(dup5, Seq("doc_id"), "left")
      .select(col("doc_id"), col("top2_ratio"), col("dup5_ratio"), col("ttr"))
  }

  /** Cross-document boilerplate stripping (the C4/CCNet "remove spans
    * repeated across many pages" rule): any token covered by a word
    * `n`-gram that occurs in ≥ `minDf` distinct documents is removed,
    * and the document is rebuilt from the surviving tokens in order.
    *
    * Scale posture: document frequency is one shuffle on the gram; the
    * frequent set is by definition the small head of the distribution
    * (boilerplate), and the join back is a plain equi-join on `gram`
    * that AQE broadcasts when the set is small; coverage explodes ≤ n
    * rows per frequent-gram occurrence; the rebuild groups by doc_id
    * with per-doc bounded state. No all-pairs shape anywhere. Fully
    *-covered documents are kept as empty strings (dropping them is the
    * quality gate's decision, not the strip's).
    */
  def boilerplateStrip(docs: DataFrame, n: Int = 3, minDf: Long = 5): DataFrame = {
    // grams feed both the document-frequency aggregate and the
    // coverage join — different projections, no exchange reuse, so the
    // tokenize+lead-window pass would run twice (the Dedup
    // prefixPostings discipline; drivers release per-query persists)
    val grams = positionalGrams(docs, n).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val frequent = grams.groupBy("gram")
      .agg(countDistinct("doc_id").as("df"))
      .filter(col("df") >= minDf).select("gram")
    val covered = grams.join(frequent, "gram")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("pos"))
      .distinct()
    rebuildWithout(docs, covered)
  }

  /** Per-language token-budget sampling — the data-mixing primitive
    * ("take the first `budget` tokens of each language, doc_id order"):
    * keep every document whose cumulative token count BEFORE it is
    * under `budget`, with the exact running total.
    *
    * Two-phase so no task ever windows a whole language (a naive
    * `Window.partitionBy(lang)` serializes 100 TB of one language into
    * one task): docs are bucketed by `doc_id div bucketDocs`; a
    * bucket-level running sum (rows per language = doc-id range /
    * bucketDocs — tiny) yields each bucket's `prior` tokens; buckets
    * that start past the budget are dropped by the join, and the
    * per-doc window runs per (lang, bucket) — ≤ `bucketDocs` rows per
    * task at any corpus size, on the same (lang, bkt) exchange the
    * join already created. The oracle recomputes it as ONE naive
    * running sum per language, so the hash match proves the
    * decomposition exact.
    */
  def tokenBudgetSample(docs: DataFrame, budget: Long,
                        bucketDocs: Long = 1024L): DataFrame = {
    // div 0 would NULL every bucket (silently empty sample); a negative
    // size would reverse bucket order (prefix from the wrong end)
    require(bucketDocs > 0, s"bucketDocs must be positive, got $bucketDocs")
    val toks = bucketedTokens(docs, Seq("lang"), bucketDocs)
    val priors = bucketPriors(toks, Seq("lang"))
      .filter(col("prior") < budget) // later buckets cannot contribute
    bucketedCum(toks, priors, Seq("lang"))
      .filter(col("cum") - col("n_tokens") < budget)
      .select("doc_id", "lang", "n_tokens", "cum")
  }

  /** `(doc_id, keys…, n_tokens, bkt)` projection — phase 0 of the
    * two-phase running-sum decomposition shared by
    * [[tokenBudgetSample]], [[mixtureApply]] and [[packSequences]].
    */
  private def bucketedTokens(docs: DataFrame, keys: Seq[String],
                             bucketDocs: Long): DataFrame =
    docs.select(col("doc_id") +: keys.map(col) :+
      size(split(col("text"), " ")).cast("long").as("n_tokens") :+
      expr(s"doc_id div $bucketDocs").as("bkt"): _*)

  /** Phase 1: per-(keys, bkt) token totals with each bucket's
    * EXCLUSIVE prefix sum `prior`. The ordered window runs over the
    * post-aggregation bucket table (rows = doc-id range / bucketDocs
    * per key), never over docs; with `keys` empty the window is
    * global — over the same tiny table.
    */
  private def bucketPriors(toks: DataFrame, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wb =
      if (keys.isEmpty) Window.orderBy("bkt")
      else Window.partitionBy(keys.map(col): _*).orderBy("bkt")
    toks.groupBy((keys :+ "bkt").map(col): _*)
      .agg(sum("n_tokens").as("btoks"))
      .withColumn("prior", sum("btoks").over(wb) - col("btoks"))
      .drop("btoks")
  }

  /** Phase 2: join the (possibly filtered / budget-enriched) priors
    * back and run the per-doc running sum PER (keys, bkt) — ≤
    * `bucketDocs` rows per task at any corpus size. Extra columns on
    * `priors` (e.g. a per-key budget) survive the join.
    */
  private def bucketedCum(toks: DataFrame, priors: DataFrame,
                          keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wf = Window.partitionBy((keys :+ "bkt").map(col): _*).orderBy("doc_id")
    // no broadcast hint on the priors side: its row count is doc-id
    // range / bucketDocs, which at 1e10 docs and the default bucket
    // size is ~1e7 rows — a forced broadcast past the auto threshold
    // would risk driver/executor OOM exactly at the scale this
    // decomposition exists for. Size stats decide: small prior tables
    // auto-broadcast, huge ones shuffle on the (keys, bkt) exchange
    // the window needs anyway
    toks.join(priors, keys :+ "bkt")
      .withColumn("cum", col("prior") + sum("n_tokens").over(wf))
  }

  /** PII patterns, RE2-compatible on purpose (no backreferences or
    * lookaround): the redaction an auditor replays with a different
    * regex engine — or the DuckDB oracle — must find exactly the same
    * spans. Conservative shapes (strict emails, +CC-NNN-N… phones,
    * dotted-quad IPs) beat clever ones here: a false redaction
    * destroys training text silently.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,10}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** PII redaction — scrub emails, phone numbers, and IPv4 addresses
    * from `text`, each replaced by a typed placeholder, with per-class
    * hit counts (counted on the ORIGINAL text; pipelines route a
    * source to quarantine on its PII density, so the counts must not
    * depend on replacement order). Pure per-row codegen'd regexp
    * expressions — zero shuffle at any corpus size. The placeholders
    * are digit- and @-free, so a replacement never CREATES a later
    * class's match; a span can still belong to two classes (an
    * all-digit email local part is also a dotted quad), in which case
    * the earlier replacement consumes it — counts reflect the original
    * text, so `n_ips` may exceed the `<IP>` placeholders in
    * `clean_text` on such overlaps. Precedence: email > phone > IP.
    */
  def piiRedact(docs: DataFrame): DataFrame = {
    val t = col("text")
    docs.select(col("doc_id"),
      regexp_count(t, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(t, lit(PhoneRe)).cast("long").as("n_phones"),
      regexp_count(t, lit(Ipv4Re)).cast("long").as("n_ips"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, lit(EmailRe), lit("<EMAIL>")),
          lit(PhoneRe), lit("<PHONE>")),
        lit(Ipv4Re), lit("<IP>")).as("clean_text"))
  }

  /** Corpus-frequency document score — the cheap proxy for the
    * LM-perplexity quality filters (CCNet-style): a document whose
    * tokens are corpus-rare scores low, one whose tokens are common
    * scores high. `df(tok)` = exact count of documents containing the
    * token; `mean_df` = Σ df(tok) / n_tokens with ONE double division
    * per document (components stay int64-exact, so the output is
    * order-independent).
    *
    * Scale shape: one token-level exchange builds the df table (exact
    * distinct via the (tok, doc_id) dedup, partially aggregated), one
    * equi-join tokens↔df (broadcast when the vocabulary is small,
    * sort-merge when it is not — Spark's choice, both correct), one
    * per-doc aggregation. No collect, no cross product.
    */
  def corpusFreqScore(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val df = toks.distinct().groupBy("tok").agg(count(lit(1)).as("df"))
    toks.join(df, "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("df").as("df_sum"))
      .select(col("doc_id"), col("n_tokens"), col("df_sum"),
        (col("df_sum").cast("double") / col("n_tokens").cast("double"))
          .as("mean_df"))
  }

  /** Hashed-unigram importance weights — the DSIR shape (Xie et al.
    * 2023, "Data Selection for Language Models via Importance
    * Resampling"): tokens hash into `buckets` feature buckets, the
    * target (docs with `lang = targetLang`) and source (whole corpus)
    * bucket distributions are counted exactly, and each document's
    * weight is the ratio of its summed target-bucket mass to its
    * summed source-bucket mass — documents whose vocabulary looks
    * like the target domain score high and are kept preferentially
    * when sampling. NOTE: the paper scores by Σ log(p_tgt/p_src); a
    * ratio of sums is NOT a monotone transform of that sum of logs,
    * so per-document rankings can diverge from DSIR proper where
    * token-level ratios are extreme in both directions. The trade is
    * deliberate: Σcount/Σcount keeps every component int64-exact with
    * ONE double division per doc (`ln` is only faithfully rounded and
    * would break cross-engine hash parity), and the signal — "mass in
    * buckets the target language favors" — is the same feature family.
    * [[importanceWeightsLog]] is the canonical Σ-of-logs estimator,
    * sharing this plan shape and verified by ln-tolerance instead.
    *
    * Scale shape: ONE token-level exchange builds both distributions
    * (a single conditional aggregation; map-side partial counts into
    * ≤ `buckets` rows), the bucket table is `buckets` rows — broadcast
    * to the token scan — and the per-doc aggregation partials. A token
    * present in the corpus always has `src_n ≥ 1`, so the division
    * never sees zero.
    */
  def importanceWeights(docs: DataFrame, targetLang: String,
                        buckets: Int = 256): DataFrame = {
    val (toks, dist) = dsirDistributions(docs, targetLang, buckets)
    toks.join(broadcast(dist), "bkt")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum("tgt_n").as("tgt_sum"), sum("src_n").as("src_sum"))
      .select(col("doc_id"), col("n_tokens"), col("tgt_sum"), col("src_sum"),
        (col("tgt_sum").cast("double") / col("src_sum").cast("double"))
          .as("weight"))
  }

  /** The CANONICAL log-space DSIR estimator (Xie et al. 2023, eq. 3):
    * per-document log importance weight
    * `log w(x) = Σ_tokens [log p_tgt(bkt) − log p_src(bkt)]` over
    * hashed-unigram bucket distributions, Laplace-smoothed
    * (`p(b) = (n_b + 1)/(total + buckets)`) so an empty bucket
    * contributes a finite penalty instead of −∞. This is the sibling of
    * [[importanceWeights]] (same hashing, same distributions): that
    * spelling trades the paper's Σ-of-logs for an int64-exact ratio so
    * the driver can hash-compare it cross-engine; THIS one reproduces
    * the published estimator, verified by tolerance against DuckDB
    * `ln()` (tools/check_log_variants.py, |Δ| < 1e-9) rather than by
    * bit-exact hash — `ln` is only faithfully rounded, so the last ulp
    * may legitimately differ between engines.
    *
    * Scale shape: identical to the exact sibling — the token stream is
    * scanned and aggregated ONCE into the ≤ `buckets`-row distribution
    * table; the totals fold in via a single-partition window over those
    * ≤ `buckets` rows (256 rows through one task, not a second token
    * exchange); the per-bucket log-ratio is precomputed there so the
    * token-level join adds one double per row and sums.
    */
  def importanceWeightsLog(docs: DataFrame, targetLang: String,
                           buckets: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (toks, dist) = dsirDistributions(docs, targetLang, buckets)
    // totals over the bucket table itself — an empty-frame window is a
    // deliberate single-task funnel of ≤ `buckets` rows, cheaper than
    // re-aggregating the token stream for one scalar pair
    val tot = Window.partitionBy()
    val logRatio = dist
      .withColumn("src_tot", sum("src_n").over(tot))
      .withColumn("tgt_tot", sum("tgt_n").over(tot))
      .select(col("bkt"),
        (log((col("tgt_n") + 1).cast("double") /
             (col("tgt_tot") + buckets).cast("double")) -
         log((col("src_n") + 1).cast("double") /
             (col("src_tot") + buckets).cast("double"))).as("log_ratio"))
    toks.join(broadcast(logRatio), "bkt")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("log_ratio").as("log_weight"))
      .select(col("doc_id"), col("n_tokens"), col("log_weight"))
  }

  /** ONE tokenize → hash-bucket → dual-distribution prep shared by
    * [[importanceWeights]] and [[importanceWeightsLog]]: the siblings'
    * whole comparability story rests on identical hashing and
    * distribution semantics, so the pipeline exists exactly once.
    * Returns (token stream with `bkt`, ≤ `buckets`-row distribution
    * table with `src_n`/`tgt_n`).
    */
  private def dsirDistributions(docs: DataFrame, targetLang: String,
                                buckets: Int): (DataFrame, DataFrame) = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("tok"))
      // 4 hex nibbles < 2^16, exact in any engine; mod folds to buckets
      .withColumn("bkt",
        element_at(graft.functions.Md5Longs(col("tok"), Seq((1, 4))), 1)
          % buckets)
    // one conditional aggregation produces both distributions — two
    // separate groupBys + a join would scan/shuffle the token stream
    // twice for the same ≤ `buckets`-row table
    val dist = toks.groupBy("bkt").agg(
      count(lit(1)).as("src_n"),
      sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("tgt_n"))
    (toks, dist)
  }

  /** Sliding-window chunking — the RAG/embedding-prep primitive:
    * overlapping `size`-token windows every `stride` tokens (start
    * positions 0, stride, 2·stride, … while < doc length; tail chunks
    * run short rather than being dropped — the last tokens of a
    * document must land in some chunk). Emits a content fingerprint
    * and exact token count per chunk, not the chunk text — the
    * downstream embedder reads text by (doc_id, chunk_idx); the
    * pipeline tables stay narrow.
    *
    * Scale shape: pure per-row explode (≤ ⌈len/stride⌉ rows per doc),
    * zero shuffle. The tokenize-once projection rule applies
    * ([[paragraphDedup]]): the split array is materialized in its own
    * Project so the window lambda slices it instead of re-splitting
    * per chunk.
    */
  def chunkWindows(docs: DataFrame, size: Int = 12, stride: Int = 8): DataFrame = {
    require(size > 0 && stride > 0,
      s"size and stride must be positive, got size=$size stride=$stride")
    // split() yields >= 1 element for any non-null text ("" -> [""]), so
    // sequence(0, size-1, stride) is always well-formed — no empty guard
    // (which would re-split text in a pushed-down Filter predicate)
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("ts"))
    toks.select(col("doc_id"), size_(col("ts")).as("n_toks"),
        posexplode(expr(
          s"transform(sequence(0, size(ts) - 1, $stride), " +
            s"st -> array_join(slice(ts, st + 1, $size), ' '))"))
          .as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        least(lit(size.toLong),
          col("n_toks").cast("long") - col("chunk_idx") * stride)
          .as("n_chunk_tokens"),
        md5(col("chunk")).as("chunk_fp"))
  }

  // sql.functions.size, unshadowed from the `size`/`stride` parameters
  private def size_(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.size(c)

  /** Paragraph-level exact dedup with document reassembly — the
    * C4/Dolma line-dedup shape. Documents split into fixed `k`-token
    * chunks (the fixture corpus has no newlines, so token windows
    * stand in for paragraphs; a real corpus would split on '\n'), only
    * each chunk's FIRST occurrence in global (doc_id, chunk_idx) order
    * survives, and documents are reassembled from their kept chunks in
    * position order (a fully-deduplicated document stays as an empty
    * row — dropping it is a later gate's decision).
    *
    * Scale shape: one exchange hash-partitioned on the chunk string
    * for the first-occurrence window (at 100 TB, window on a 128-bit
    * chunk digest instead and keep the string out of the shuffle), one
    * partially-aggregated reassembly by doc_id. Never all-pairs; a
    * chunk duplicated a million times costs one partition's window
    * over a million SMALL rows, not a join blowup.
    */
  def paragraphDedup(docs: DataFrame, k: Int = 10): DataFrame = {
    require(k > 0, s"chunk size must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    // tokenize ONCE into its own projection and slice the materialized
    // array in the lambda — splitting inline would re-run the full
    // regex split per chunk index (Catalyst does not hoist
    // loop-invariant subexpressions out of higher-order-function
    // lambdas), turning chunking quadratic in document length.
    // CollapseProject keeps `ts` in its own Project because it is a
    // non-cheap alias referenced more than once; PlanAuditSpec pins
    // the single-split shape
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("ts"))
    val chunks = toks.select(col("doc_id"), posexplode(expr(
      s"transform(sequence(0, cast(ceil(size(ts) / $k.0) as int) - 1), " +
        s"i -> array_join(slice(ts, i * $k + 1, $k), ' '))"))
      .as(Seq("chunk_idx", "chunk")))
    val kept = chunks.withColumn("rn", row_number().over(
        Window.partitionBy("chunk").orderBy("doc_id", "chunk_idx")))
      .filter(col("rn") === 1)
    val rebuilt = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      sort_array(collect_list(struct(col("chunk_idx"), col("chunk")))).as("arr"))
      .select(col("doc_id"), col("n_kept"),
        expr("array_join(transform(arr, x -> x.chunk), ' ')").as("dedup_text"))
    docs.select(col("doc_id"),
        expr(s"cast(ceil(size(split(text, ' ')) / $k.0) as long)").as("n_chunks"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("dedup_text"), lit("")).as("dedup_text"))
  }

  /** TF-IDF-style top-`k` terms per document — the classic keyword /
    * feature-extraction pass (the reference's text block has no
    * counterpart; this is pipeline-native). The score stays in the
    * exact-integer domain: score = (tf · N_docs) / df with ONE double
    * division of int64 components per row (`ln`-free for cross-engine
    * hash parity — the same trade as [[importanceWeights]]). NOTE:
    * linear N/df is NOT rank-equivalent to textbook tf·ln(N/df) when
    * tf varies across a doc's terms (tf=4 at df=N/2 scores 8 but
    * tf·idf 2.77; tf=1 at df=N/9 scores 9 but tf·idf 2.20 — the
    * linear form rewards rarity more aggressively than the log-damped
    * one). Equivalence holds only among terms of equal tf; the
    * deliberate trade is deterministic cross-engine ranking. Ranking
    * by (score DESC, term) breaks score ties deterministically.
    * [[tfidfTopTermsLn]] is the canonical tf·ln(N/df) sibling, sharing
    * this plan shape and verified by ln-tolerance instead.
    *
    * Scale shape: one token-level exchange for per-(doc, term) tf
    * (map-side partials); the df table derives from the ALREADY
    * AGGREGATED tf rows (vocabulary-sized — no second corpus scan)
    * and joins back by term; the corpus-size scalar is a one-row
    * broadcast; the final top-k is a per-doc window whose partition is
    * document-sized, never corpus-sized, so it cannot skew.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame =
    tfidfTopK(docs, k,
      (col("tf") * col("n_docs")).cast("double") / col("df").cast("double"))

  /** The textbook log-damped TF-IDF: `score = tf · ln(N/df)` — the
    * sibling of [[tfidfTopTerms]], which trades the logarithm for a
    * linear `(tf·N)/df` so the score stays int64-exact under the
    * driver's cross-engine hash (the two rankings diverge when tf
    * varies across a doc's terms; see that doc). This one reproduces
    * the published weighting, verified by tolerance against DuckDB
    * `ln()` (tools/check_log_variants.py, |Δ| < 1e-9 per row) rather
    * than bit-exact hash. Ranking stays (score DESC, term) — a
    * ubiquitous term (df = N) scores exactly 0 and loses every tie to
    * rarer terms only through the deterministic term order.
    *
    * Scale shape: identical to the exact sibling — one token exchange
    * for per-(doc, term) tf, df derived from the aggregated tf rows,
    * one-row corpus-size broadcast, document-sized top-k windows.
    */
  def tfidfTopTermsLn(docs: DataFrame, k: Int = 3): DataFrame =
    tfidfTopK(docs, k, col("tf").cast("double") *
      log(col("n_docs").cast("double") / col("df").cast("double")))

  /** ONE tokenize → tf → df → rank pipeline shared by [[tfidfTopTerms]]
    * and [[tfidfTopTermsLn]] — only the `score` expression (over the
    * `tf`, `df`, `n_docs` columns) differs between the siblings, so
    * their tokenization, df derivation, and deterministic
    * (score DESC, term) tie-break can never drift apart.
    */
  private def tfidfTopK(docs: DataFrame, k: Int, score: Column): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // tf rows are distinct (doc, term) pairs, so counting them per term
    // IS the document frequency — no second pass over the corpus
    val dfTbl = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    tf.join(dfTbl, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", score)
      .withColumn("rank", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("rank").cast("long").as("rank"), col("score"))
  }

  /** URL host extraction + blocklist gate — the domain-level filter a
    * web-corpus pipeline runs before any content filter (cheapest
    * rejection first). The host is a per-row regexp capture of the
    * authority (scheme `://` up to the first `/`, `:`, `?` or `#`);
    * `kept` = 1 iff the host is NOT blocklisted. The blocklist joins
    * as a broadcast DataFrame rather than an `isin` literal — real
    * blocklists run to millions of hosts, far past what a plan can
    * inline but trivially inside broadcast range.
    */
  def urlHostFilter(docs: DataFrame, blocklist: DataFrame): DataFrame = {
    // nullif: a NULL or unparseable url yields host NULL (Spark's
    // regexp_extract returns "" on no-match, DuckDB NULL — nullif on
    // both sides makes the engines agree), and a NULL host is NOT
    // kept: a doc whose URL fails extraction must not sail through a
    // domain gate by accident
    val hosts = docs.select(col("doc_id"), col("url"),
      nullif(regexp_extract(col("url"),
        "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1), lit("")).as("host"))
    // distinct: real blocklist files carry duplicate entries; without
    // it a repeated host would duplicate every matching doc row
    hosts.join(
        broadcast(blocklist.select(col("host")).distinct()
          .withColumn("block_hit", lit(1L))),
        Seq("host"), "left")
      .select(col("doc_id"), col("host"),
        (col("host").isNotNull && col("block_hit").isNull)
          .cast("long").as("kept"))
  }

  /** Deterministic per-stratum uniform sample — `k` docs per stratum
    * selected by content-addressed md5 rank (the x47 split
    * convention: stable under corpus growth and reshuffling — a doc's
    * membership changes only when a better-ranked doc ENTERS its
    * stratum, never with partitioning or row order).
    *
    * Scale shape: a single per-stratum window would funnel each
    * stratum through ONE task (5 languages ⇒ 5 tasks for a 100 TB
    * corpus), so the top-k runs TWO-PHASE: per (stratum, doc-id
    * bucket) top-k first — `buckets`-way parallel, each window sees
    * 1/`buckets` of the stratum — then the true per-stratum top-k
    * over the ≤ `buckets`·`k` survivors. The result is identical to
    * the one-window spelling (the top-k of bucket-top-ks is the
    * global top-k), which is exactly what the DuckDB oracle runs.
    */
  def stratifiedSample(docs: DataFrame, strata: String, k: Int,
                       buckets: Int = 32): DataFrame = {
    require(k > 0 && buckets > 0,
      s"k and buckets must be positive, got k=$k buckets=$buckets")
    import org.apache.spark.sql.expressions.Window
    // 15 hex nibbles < 2^60: exact, positive int64 in any engine
    val ranked = docs.select(col("doc_id"), col(strata).as("stratum"))
      .withColumn("rk", element_at(graft.functions.Md5Longs(
        concat(lit("smp:"), col("doc_id").cast("string")), Seq((1, 15))), 1))
    val local = ranked
      .withColumn("bkt", pmod(col("doc_id"), lit(buckets.toLong)))
      .withColumn("lrn", row_number().over(
        Window.partitionBy("stratum", "bkt").orderBy(col("rk"), col("doc_id"))))
      .filter(col("lrn") <= k)
    local
      .withColumn("sample_rank", row_number().over(
        Window.partitionBy("stratum").orderBy(col("rk"), col("doc_id"))))
      .filter(col("sample_rank") <= k)
      .select(col("stratum"), col("doc_id"), col("rk"),
        col("sample_rank").cast("long").as("sample_rank"))
  }

  /** Corpus mixture reweighting (SURVEY §2.10 X21) — the data-mixing
    * planner: given the measured per-source token counts and a table of
    * target mixture weights, compute the downsample-only sampling plan
    * that realizes the target mixture exactly.
    *
    * With `W = Σ w_s` over the weighted sources, the largest total the
    * corpus can supply at the target mixture without upsampling any
    * source is `T* = min_s ⌊tokens_s·W / w_s⌋` (the binding source is
    * the one scarcest relative to its target share), and each source
    * keeps `keep_s = ⌊w_s·T* / W⌋ ≤ tokens_s`. All components are
    * int64-exact; the per-source `rate = keep_s / tokens_s` is the ONE
    * double division, so the output is order-independent and
    * cross-engine hash-stable. Sources absent from `weights` are
    * excluded from the plan entirely — the caller's target mixture IS
    * the output universe — and, symmetrically, a weighted source with
    * NO documents fails loudly at execution (silently dropping it
    * would renormalize W over the remaining sources, so a typo'd
    * source name would pass as a skewed-but-valid plan).
    *
    * Scale shape: one partially-aggregated per-source roll-up of token
    * counts (sources number in the dozens, tokens in the trillions — the
    * exchange moves |sources| rows per task), a broadcast join against
    * the weights table, and a global window over the |sources|-row
    * result to fold in (W, T*) — a deliberate single-task pass over a
    * table that is tiny by construction, not over data rows. No
    * token-level shuffle, no collect. Overflow headroom: `tokens_s·W` needs
    * tokens_s < 2^63/W ≈ 9e15 at W ≈ 1000 — comfortable at 100 TB
    * (~2.5e13 tokens).
    */
  def mixtureWeights(docs: DataFrame, weights: DataFrame): DataFrame =
    mixturePlan(docs, weights, capPct = 100L)
      .select(col("source"), col("weight").cast("long").as("weight"),
        col("n_docs"), col("n_tokens"),
        col("t_star"), col("keep_tokens"),
        (col("keep_tokens").cast("double") / col("n_tokens").cast("double"))
          .as("rate"))

  /** Temperature-scaled sampling shares (the mT5/XLM-R α-sampling
    * rule, Xue et al. 2021 §3.1 / Conneau et al. 2020 §3: sample
    * source s with probability ∝ p_s^α, α < 1 upweighting scarce
    * sources) — the third classic mixture planner beside the capped
    * downsample ([[mixtureWeights]]) and the DoReMi-style upsample
    * ([[mixtureWeightsCapped]]). Since the corpus-total denominator
    * cancels under normalization, share_s = T_s^α / Σ T^α directly.
    *
    * Determinism: only α where x^α is a correctly-rounded IEEE
    * primitive are accepted — 0.5 (`sqrt`) and 1.0 (identity) —
    * because `pow` carries platform-dependent last-ulp error and
    * would break the cross-engine hash. The Σ is a driver-free
    * ORDERED left fold (sort by source, `aggregate` from 0.0), bit-
    * reproducible in any engine — never a partition-order double sum.
    *
    * Scale shape: one per-source partial aggregation (|S| rows out),
    * the fold over the |S|-row frame, one broadcast scalar join back.
    */
  def temperatureMixture(docs: DataFrame, alpha: Double = 0.5): DataFrame = {
    require(alpha == 0.5 || alpha == 1.0,
      s"only exactly-rounded temperatures are engine-exact (0.5 via " +
        s"sqrt, 1.0 identity), got $alpha")
    val perSrc = docs.groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      .withColumn("weight",
        if (alpha == 0.5) sqrt(col("n_tokens").cast("double"))
        else col("n_tokens").cast("double"))
    val tot = perSrc.agg(expr(
      "aggregate(transform(sort_array(collect_list(struct(source, weight)))," +
        " x -> x.weight), 0D, (a, x) -> a + x)").as("tw"))
    perSrc.crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens"), col("weight"),
        (col("weight") / col("tw")).as("share"))
  }

  /** Upsampling mixture planner (SURVEY §2.10 X21, the DoReMi-style
    * completion of [[mixtureWeights]]): real target mixtures REPEAT
    * scarce high-quality sources instead of capping the whole corpus
    * at the scarcest one. Each source may supply up to
    * `cap_s = tokens_s · epochCapPct / 100` tokens (epochCapPct = 200
    * ⇒ at most two passes over the source), so
    * `T* = min_s ⌊cap_s·W / w_s⌋` and `keep_s = ⌊w_s·T* / W⌋ ≤ cap_s`
    * — the largest total the corpus supplies at the target mixture
    * without any source exceeding its repeat budget. The realization
    * rule is int64-exact: `n_epochs = keep_s div tokens_s` full passes
    * plus a `remainder = keep_s mod tokens_s`-token prefix (executed
    * by [[mixtureApplyCapped]]). `epochCapPct = 100` degenerates to
    * [[mixtureWeights]] exactly (cap_s = tokens_s) — spec-pinned.
    *
    * The cap is a PERCENT (int64) rather than a double epoch count so
    * every quantity stays in the exact integer domain — the same
    * cross-engine determinism trade as the rest of the mixture block.
    * Scale shape: identical to the downsample planner (one per-source
    * roll-up, |sources|-row window). Overflow headroom shrinks by
    * epochCapPct/100: tokens_s·capPct·W needs tokens_s <
    * 2^63/(capPct·W) ≈ 5e13 at capPct 200, W ≈ 1000 — still clear of
    * a 100 TB corpus per source.
    */
  def mixtureWeightsCapped(docs: DataFrame, weights: DataFrame,
                           epochCapPct: Long = 200L): DataFrame = {
    require(epochCapPct >= 100,
      s"epochCapPct < 100 would forbid even one full pass, got $epochCapPct")
    mixturePlan(docs, weights, epochCapPct)
      .select(col("source"), col("weight").cast("long").as("weight"),
        col("n_docs"), col("n_tokens"), col("cap_tokens"),
        col("t_star"), col("keep_tokens"),
        expr("keep_tokens div n_tokens").as("n_epochs"),
        expr("keep_tokens % n_tokens").as("remainder"),
        (col("keep_tokens").cast("double") / col("n_tokens").cast("double"))
          .as("rate"))
  }

  /** Shared planner core of [[mixtureWeights]] (capPct = 100) and
    * [[mixtureWeightsCapped]]: validated weights, per-source token
    * roll-up, per-source supply cap, and the (W, T*, keep) fold over
    * the |sources|-row table. ONE spelling so the two planners can
    * never drift on validation or arithmetic.
    */
  private def mixturePlan(docs: DataFrame, weights: DataFrame,
                          capPct: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // data-level validation fails LOUDLY at execution: a weight ≤ 0
    // would otherwise NULL its cap under non-ANSI integer division
    // (min() skips NULL, so the source silently never binds T*), and a
    // duplicate source row would double-count W — both are caller
    // config errors, and the weights table is tiny, so the per-row
    // checks are free
    val wDup = Window.partitionBy("source")
    val checked = weights
      .withColumn("__dup", count(lit(1)).over(wDup))
      .select(col("source"),
        when(col("weight").isNull || col("weight") <= 0, raise_error(concat(
          lit("mixtureWeights: null or non-positive weight for source "),
          col("source"))))
          .when(col("__dup") > 1, raise_error(concat(
            lit("mixtureWeights: duplicate weight rows for source "),
            col("source"))))
          .otherwise(col("weight")).as("weight"))
    val rollup = docs
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n").as("n_tokens"))
    // weights-side outer join, not inner: an inner join would silently
    // DROP a weight row whose source has no documents (a typo'd source
    // name in the target mixture), renormalizing W over the remaining
    // sources — a skewed plan passing as valid. A weighted source with
    // no corpus mass is the same class of caller config error as a
    // non-positive weight, and fails just as loudly. Both sides of the
    // join are post-aggregation |sources|-row tables, so the direction
    // swap moves no data-scale work
    val perSource = checked.join(broadcast(rollup), Seq("source"), "left")
      .select(col("source"), col("weight"), col("n_docs"),
        when(col("n_tokens").isNull, raise_error(concat(
          lit("mixtureWeights: weighted source has no documents: "),
          col("source"))))
          .otherwise(col("n_tokens")).as("n_tokens"))
    // global window over the POST-AGGREGATION table: |sources| rows
    // through one task by design (the corpus-sized input was already
    // reduced by the partial-aggregating groupBy above) — the same
    // ≤256-row single-task pattern as importanceWeightsLog's totals
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perSource
      .withColumn("cap_tokens", expr(s"n_tokens * $capPct DIV 100"))
      .withColumn("w_total", sum("weight").over(all))
      .withColumn("t_star",
        min(expr("cap_tokens * w_total DIV weight")).over(all))
      .withColumn("keep_tokens", expr("weight * t_star DIV w_total"))
  }

  /** Sequence packing index (SURVEY §2.10 X27) — the last step of a
    * pretraining data pipeline: conceptually concatenate every
    * document's tokens in `doc_id` order and cut the stream into
    * fixed `binTokens`-token training sequences (documents MAY
    * straddle a cut — the standard GPT-style packing). Emits each
    * document's position in the packed stream: `start_tok` (0-based
    * offset), `first_seq`/`last_seq` (the training-sequence ids it
    * lands in). A writer materializes sequence `s` by taking token
    * range `[s·binTokens, (s+1)·binTokens)` against this index.
    *
    * Scale shape: the global running sum is decomposed two-phase like
    * [[tokenBudgetSample]] — per-bucket totals (rows = doc-id range /
    * `bucketDocs`) roll up through ONE ordered window over the tiny
    * bucket table, then the per-doc window runs per bucket, ≤
    * `bucketDocs` rows per task at any corpus size. The oracle
    * recomputes it as ONE naive global window, so the hash match
    * proves the decomposition. All arithmetic is int64.
    */
  def packSequences(docs: DataFrame, binTokens: Long,
                    bucketDocs: Long = 1024L): DataFrame =
    packSequenceCounts(
      docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens")),
      binTokens, bucketDocs)

  /** [[packSequences]] over PRECOMPUTED `(doc_id, n_tokens)` rows —
    * the packer for streams that no longer carry text: materialized
    * repeat plans ([[mixtureApplyCapped]] epochs keyed by a surrogate
    * id), token-count manifests, chunk indexes. Identical two-phase
    * decomposition and int64 arithmetic; `doc_id` only needs to be a
    * unique int64 whose order IS the intended concatenation order
    * (gaps are fine — the bucket key is `doc_id div bucketDocs`, and
    * sparse buckets just run small).
    */
  def packSequenceCounts(counts: DataFrame, binTokens: Long,
                         bucketDocs: Long = 1024L): DataFrame = {
    require(binTokens > 0 && bucketDocs > 0,
      s"binTokens and bucketDocs must be positive, got $binTokens/$bucketDocs")
    val toks = counts.select(col("doc_id"), col("n_tokens"),
      expr(s"doc_id div $bucketDocs").as("bkt"))
    bucketedCum(toks, bucketPriors(toks, Nil), Nil)
      .select(col("doc_id"), col("n_tokens"),
        (col("cum") - col("n_tokens")).as("start_tok"),
        expr(s"(cum - n_tokens) div $binTokens").as("first_seq"),
        expr(s"(cum - 1) div $binTokens").as("last_seq"))
  }

  /** Execute a [[mixtureWeights]] plan (SURVEY §2.10 X21): keep each
    * source's documents in `doc_id` order until that source's
    * `keep_tokens` budget is exhausted (a document is kept iff the
    * cumulative token count BEFORE it is under budget — the
    * [[tokenBudgetSample]] rule with a per-source budget computed from
    * the target mixture instead of one global constant). The output
    * corpus realizes the plan: Σ n_tokens per source ∈
    * [keep_tokens, keep_tokens + max_doc_tokens).
    *
    * Scale shape: the same two-phase decomposition as
    * [[tokenBudgetSample]] — docs bucket by `doc_id div bucketDocs`; a
    * bucket-level running sum per source (tiny table) yields each
    * bucket's `prior`; buckets starting past budget drop at the join;
    * the per-doc window runs per (source, bucket) — ≤ `bucketDocs`
    * rows per task at any corpus size. The plan table (|sources| rows)
    * broadcasts everywhere it is consumed. The oracle recomputes it as
    * ONE naive running sum per source, so the hash match proves the
    * decomposition exact.
    */
  def mixtureApply(docs: DataFrame, weights: DataFrame,
                   bucketDocs: Long = 1024L): DataFrame = {
    require(bucketDocs > 0, s"bucketDocs must be positive, got $bucketDocs")
    val plan = mixtureWeights(docs, weights).select("source", "keep_tokens")
    val toks = bucketedTokens(docs, Seq("source"), bucketDocs)
    val priors = bucketPriors(toks, Seq("source"))
      .join(broadcast(plan), "source")
      .filter(col("prior") < col("keep_tokens"))
    bucketedCum(toks, priors, Seq("source"))
      .filter(col("cum") - col("n_tokens") < col("keep_tokens"))
      .select("doc_id", "source", "n_tokens", "cum")
  }

  /** Execute a [[mixtureWeightsCapped]] plan: each source's documents
    * are taken `n_epochs` full times, and documents in the
    * `remainder`-token prefix (the [[tokenBudgetSample]] rule against
    * the remainder budget) once more — emitted as a per-doc repeat
    * count `n_copies` rather than exploded rows, so the output stays
    * |kept docs| rows at any repeat factor and the downstream packer
    * materializes the copies. Docs outside both (zero full epochs,
    * past the remainder prefix) are dropped. With `epochCapPct = 100`
    * the kept set and cumulative sums equal [[mixtureApply]] exactly
    * (every n_copies = 1) — spec-pinned.
    *
    * Scale shape: the same two-phase (source, bucket) decomposition as
    * [[mixtureApply]]; the only difference is that a source with
    * n_epochs ≥ 1 keeps ALL its buckets (every doc appears at least
    * n_epochs times), so the bucket prune applies only to the
    * pure-remainder sources. The oracle recomputes it as ONE naive
    * running sum per source.
    */
  def mixtureApplyCapped(docs: DataFrame, weights: DataFrame,
                         epochCapPct: Long = 200L,
                         bucketDocs: Long = 1024L): DataFrame = {
    require(bucketDocs > 0, s"bucketDocs must be positive, got $bucketDocs")
    val plan = mixtureWeightsCapped(docs, weights, epochCapPct)
      .select("source", "n_epochs", "remainder")
    val toks = bucketedTokens(docs, Seq("source"), bucketDocs)
    val priors = bucketPriors(toks, Seq("source"))
      .join(broadcast(plan), "source")
      .filter(col("n_epochs") >= 1 || col("prior") < col("remainder"))
    bucketedCum(toks, priors, Seq("source"))
      .withColumn("n_copies", col("n_epochs") +
        when(col("cum") - col("n_tokens") < col("remainder"), 1L)
          .otherwise(0L))
      .filter(col("n_copies") > 0)
      .select("doc_id", "source", "n_tokens", "cum", "n_copies")
  }

  /** Per-source data card (SURVEY §2.10) — the release-report roll-up
    * a dataset ships with (datasheet/data-card convention): for every
    * source, document and token volumes, length extremes, and the
    * gate-relevant density signals (short-doc rate, PII-bearing-doc
    * rate) a consumer reads before training on it. Every aggregate is
    * an int64 count/sum — no double ever crosses the exchange — and
    * the three rates are one final division each, so the report is
    * order-independent and cross-engine hash-stable (the same rule as
    * every other oracle-facing double here).
    *
    * Scale shape: per-row codegen'd expressions (token counts, PII
    * regexes) feeding ONE partially-aggregated groupBy(source) —
    * |sources| rows out of the exchange at any corpus size; no join,
    * no window.
    */
  def sourceDataCard(docs: DataFrame, shortTokens: Long = 5L): DataFrame = {
    val nTok = size(split(col("text"), " ")).cast("long")
    val nPii = (regexp_count(col("text"), lit(EmailRe)) +
      regexp_count(col("text"), lit(PhoneRe)) +
      regexp_count(col("text"), lit(Ipv4Re))).cast("long")
    docs.select(col("source"), nTok.as("n_tokens"), nPii.as("n_pii"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        min("n_tokens").as("min_tokens"),
        max("n_tokens").as("max_tokens"),
        sum(when(col("n_tokens") < shortTokens, 1L).otherwise(0L))
          .as("n_short_docs"),
        sum(when(col("n_pii") > 0, 1L).otherwise(0L)).as("n_pii_docs"),
        sum("n_pii").as("n_pii_spans"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("min_tokens"), col("max_tokens"),
        (col("total_tokens").cast("double") / col("n_docs").cast("double"))
          .as("mean_tokens"),
        col("n_short_docs"),
        (col("n_short_docs").cast("double") / col("n_docs").cast("double"))
          .as("short_rate"),
        col("n_pii_docs"), col("n_pii_spans"),
        (col("n_pii_docs").cast("double") / col("n_docs").cast("double"))
          .as("pii_rate"))
  }

  /** Duplicated-n-gram span coverage (SURVEY §2.10 X22) — the exact
    * substring-dedup criterion of Lee et al. 2022 ("Deduplicating
    * Training Data Makes Language Models Better"), re-expressed over
    * token n-grams: a token position is DUPLICATED if it is covered by
    * at least one n-gram that occurs ≥ `minCount` times corpus-wide
    * (within-document repeats count — a looping doc is its own
    * duplicate). Emits per doc the exact covered-position count and
    * the coverage fraction (the paper's removal criterion is
    * `dup_frac` over a span threshold; surfacing the score lets the
    * caller pick the cut).
    *
    * This is the occurrence-count sibling of [[boilerplateStrip]]
    * (which keys on document frequency and rebuilds text): same
    * positional-gram machinery, different duplicate predicate,
    * score-not-strip output.
    *
    * Scale shape: one tokenize + per-doc window builds positional
    * grams (per-doc state only), one gram-level exchange counts
    * occurrences (map-side partial), the ≥ minCount gram set joins
    * back by gram equi-join (candidates ∝ duplicated mass, not n²),
    * and covered positions dedup per (doc, pos) on the doc-keyed
    * exchange. No collect, no cross product.
    */
  def dupSpanCoverage(docs: DataFrame, n: Int = 5,
                      minCount: Long = 2L): DataFrame = {
    require(n > 0 && minCount > 1,
      s"need n > 0 and minCount > 1, got n=$n minCount=$minCount")
    // persist: grams feed both the count aggregate and the coverage
    // join (the boilerplateStrip note)
    val grams = positionalGrams(docs, n).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dup = grams.groupBy("gram")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount).select("gram")
    val covered = grams.join(dup, "gram")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("pos"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_covered"))
    docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"),
        (coalesce(col("n_covered"), lit(0L)).cast("double") /
          col("n_tokens").cast("double")).as("dup_frac"))
  }

  /** Quality-band × duplication cross-table — the data-card
    * diagnostic "is the low-quality content ALSO the duplicated
    * content?", which decides whether the quality gate and the dedup
    * gate are redundant or complementary for a given corpus.
    * Documents band by `floor(ttr · bands)` (ttr = distinct-token
    * ratio from [[quality]] — one int/int IEEE divide, so the band
    * is engine-exact; ttr = 1.0 lands in its own closed top band),
    * and each band reports its doc count and the EXACT token-weighted
    * duplication: Σ covered / Σ tokens as int64 sums with one final
    * division — never a mean of per-doc doubles, whose addition order
    * differs across engines.
    *
    * Scale shape: [[dupSpanCoverage]]'s shape plus one doc_id
    * equi-join and one ≤ bands+1-row aggregation.
    */
  def qualityDupMatrix(docs: DataFrame, bands: Int = 10): DataFrame = {
    require(bands > 0, s"bands must be positive, got $bands")
    val q = quality(docs).select(col("doc_id"),
      floor(col("ttr") * bands).cast("long").as("ttr_band"))
    val d = dupSpanCoverage(docs).select("doc_id", "n_tokens", "n_covered")
    q.join(d, "doc_id")
      .groupBy("ttr_band")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum("n_covered").as("n_covered"))
      .withColumn("dup_frac",
        col("n_covered").cast("double") / col("n_tokens").cast("double"))
  }

  /** Per-language calibrated quality gate (the FineWeb-style
    * "drop the worst X % of each language" rule — a fixed global
    * threshold over-filters low-resource languages, so the cut is
    * calibrated per language). Score = `(distinct_tokens · 1000) div
    * n_tokens` — an INTEGER TTR in permille, engine-exact by
    * construction. Per language: `cut = (n · dropPermille) div 1000`
    * docs are dropped from the bottom; the threshold is the
    * (cut+1)-th smallest score and the gate keeps `score ≥
    * threshold` — ties AT the threshold are all kept (the keep-ties
    * convention: a calibration may drop fewer than `cut` docs, never
    * a doc scoring equal to a kept one; spec-pinned).
    *
    * Scale shape: the score domain is bounded ([0, 1000]), so the
    * k-th-smallest threshold needs NO per-doc sort or rank window —
    * one (lang, score) groupBy with map-side combine builds a
    * ≤ 1001-row histogram per language, and every window below runs
    * over that histogram, not over documents. This is the exact
    * spelling that survives 100 TB; a `row_number` over
    * `Window.partitionBy(lang)` would serialize each language into
    * one task (the same trap [[stratifiedSample]] documents).
    */
  def qualityCalibratedGate(docs: DataFrame, dropPermille: Int = 200): DataFrame = {
    require(dropPermille >= 0 && dropPermille < 1000,
      s"dropPermille must be in [0, 1000), got $dropPermille")
    import org.apache.spark.sql.expressions.Window
    val toks = split(col("text"), " ")
    val scored = docs.select(col("doc_id"), col("lang"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"))
      .withColumn("score_milli", expr("(n_distinct * 1000) div n_tokens"))
    val hist = scored.groupBy("lang", "score_milli")
      .agg(count(lit(1)).as("n_s"), sum("n_tokens").as("tok_s"))
    // cumulative + per-lang totals over the ≤1001-row histogram
    val cum = hist
      .withColumn("cum", sum("n_s").over(
        Window.partitionBy("lang").orderBy("score_milli")))
      .withColumn("n", sum("n_s").over(Window.partitionBy("lang")))
      .withColumn("cut", expr(s"(n * $dropPermille) div 1000"))
    val thr = cum.filter(col("cum") >= col("cut") + 1)
      .groupBy("lang").agg(min("score_milli").as("threshold"))
    cum.join(thr, "lang")
      .groupBy("lang")
      .agg(max("n").as("n_docs"), max("cut").as("cut_docs"),
        max("threshold").as("threshold"),
        sum(when(col("score_milli") >= col("threshold"), col("n_s"))
          .otherwise(lit(0L))).as("kept_docs"),
        sum(when(col("score_milli") >= col("threshold"), col("tok_s"))
          .otherwise(lit(0L))).as("kept_tokens"))
  }

  /** The ONE canonicalization rule for [[normalizedDedup]]: lowercase,
    * strip every char outside `[a-z0-9 ]`, collapse space runs, trim.
    * The DuckDB mirror in `OracleSqlExt` is pinned to exactly this
    * chain (with the `'g'` flag — DuckDB `regexp_replace` replaces
    * only the FIRST match by default, unlike Spark's).
    */
  def canonicalText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), lit("[^a-z0-9 ]"), lit("")),
      lit(" +"), lit(" ")))

  /** Normalization-canonical exact dedup (the C4/Dolma pre-dedup
    * canonicalization pass): documents that differ only in case,
    * punctuation, or whitespace runs are the same document. Each doc
    * reports its canonical fingerprint (`md5` of [[canonicalText]]),
    * its group's canonical owner (min doc_id — the x20/x69/x123
    * canonical-owner discipline), the copy count, and whether it is
    * the kept copy. One md5 groupBy + an equi-join back; nothing
    * pairwise, per-row expressions otherwise.
    */
  def normalizedDedup(docs: DataFrame): DataFrame = {
    val fp = docs.select(col("doc_id"),
      md5(canonicalText(col("text"))).as("canon_fp"))
    val groups = fp.groupBy("canon_fp")
      .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
    fp.join(groups, "canon_fp")
      .select(col("doc_id"), col("canon_fp"), col("canonical_id"),
        col("n_copies"), (col("doc_id") === col("canonical_id")).as("is_kept"))
  }

  /** ExactSubstr-style duplicate-span REMOVAL (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better" —
    * the remove-all-but-one rule, re-expressed over word `n`-grams):
    * a gram occurring ≥ `minCount` times corpus-wide (within-doc
    * repeats count, the x86 criterion) is a duplicated span, and
    * every token position covered by one is removed EXCEPT in the
    * gram's canonical owner — the minimum doc_id containing it —
    * which keeps its copy. The rule is per (doc, gram): a doc
    * canonical for gram A can still lose a position to an
    * overlapping gram B it does not own; within the canonical doc,
    * all of that gram's occurrences survive. Completes the x86/x60
    * family: coverage measures, boilerplate-strip removes
    * by document frequency, this removes by occurrence count with
    * keep-one semantics.
    *
    * Scale posture (same shape as boilerplateStrip): occurrence
    * count + min-owner is ONE groupBy(gram) with partial aggregation;
    * the join back is a gram equi-join; coverage explodes ≤ n rows
    * per duplicated occurrence; the rebuild is per-doc bounded. No
    * all-pairs shape, no window over anything wider than a doc.
    */
  def dupSpanRemove(docs: DataFrame, n: Int = 5, minCount: Long = 2L): DataFrame = {
    require(n > 0 && minCount > 1,
      s"need n > 0 and minCount > 1, got n=$n minCount=$minCount")
    // persist: grams feed both the count+owner aggregate and the
    // coverage join (the boilerplateStrip note)
    val grams = positionalGrams(docs, n).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dup = grams.groupBy("gram")
      .agg(count(lit(1)).as("cnt"), min("doc_id").as("canon_id"))
      .filter(col("cnt") >= minCount)
      .select("gram", "canon_id")
    val covered = grams.join(dup, "gram")
      .filter(col("doc_id") =!= col("canon_id"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("pos"))
      .distinct()
    rebuildWithout(docs, covered)
  }

  /** Cross-source contamination matrix — for every unordered pair of
    * sources, the EXACT Jaccard overlap of their distinct word
    * `n`-gram sets. The data-card companion to x46 decontamination
    * and x85 mixture planning: a high-overlap pair means the mixture
    * double-counts that content and per-source dedup understates
    * global duplication (cf. the cross-corpus analyses in Penedo et
    * al. 2023 §4 / Soldaini et al. 2024 §3, computed there with
    * sketches — exact here, the sketch is x57's territory).
    *
    * Scale posture: distinct (source, gram) is one shuffle with
    * partial distinct; the self-join is a gram equi-join producing
    * ≤ |S|² rows per distinct gram (|S| = #sources, small by
    * definition); sizes / pairs / intersections are all ≤ |S|²-row
    * frames the planner broadcasts. Output is |S|·(|S|−1)/2 rows.
    * `jaccard` is one int/int IEEE divide — cross-engine exact.
    */
  def sourceOverlapMatrix(docs: DataFrame, n: Int = 3): DataFrame = {
    require(n > 0, s"need n > 0, got n=$n")
    // persist: the distinct gram set feeds the per-source sizes AND
    // both sides of the intersection self-join — three consumers of
    // one tokenize+window+distinct pass (the boilerplateStrip note;
    // released by the caller — the CacheScope contract)
    val g = positionalGrams(docs, n, carry = Seq("source"))
      .select("source", "gram").distinct().persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = g.groupBy("source").agg(count(lit(1)).as("n_grams"))
    val inter = g.as("a").join(g.as("b"), "gram")
      .filter(col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_inter"))
    val srcs = docs.select("source").distinct()
    val pairs = srcs.as("a").join(srcs.as("b"),
        col("a.source") < col("b.source"))
      .select(col("a.source").as("source_a"), col("b.source").as("source_b"))
    pairs
      .join(inter, Seq("source_a", "source_b"), "left")
      .join(sizes.select(col("source").as("source_a"),
        col("n_grams").as("na")), Seq("source_a"), "left")
      .join(sizes.select(col("source").as("source_b"),
        col("n_grams").as("nb")), Seq("source_b"), "left")
      .select(col("source_a"), col("source_b"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"),
        (coalesce(col("na"), lit(0L)) + coalesce(col("nb"), lit(0L)) -
          coalesce(col("n_inter"), lit(0L))).as("n_union"))
      .withColumn("jaccard",
        when(col("n_union") > 0,
          col("n_inter").cast("double") / col("n_union").cast("double"))
          .otherwise(lit(0.0)))
  }

  /** BM25 top-k retrieval (Robertson/Spärck Jones, the Okapi scoring
    * every search-based curation loop runs over its corpus) for a
    * fixed query term set, with the LINEAR idf `(N − df + 0.5)/(df +
    * 0.5)` — the x77 exactness convention: the standard `ln` wrapper
    * is only faithfully rounded cross-engine, so the hash-checkable
    * variant drops it (monotone in the same df, so top-k order per
    * term is unchanged; multi-term mixes can differ from ln-BM25 —
    * documented trade, x83's territory).
    *
    * Determinism: every operand is an exact int64 (tf, df, N, dl,
    * Σdl) and the score is ONE fixed IEEE expression per (doc, term);
    * the per-doc total is a FIXED-ORDER sum over the query terms
    * (conditional-max pivot, never an order-dependent SUM over rows),
    * and the top-k order is total (score desc, doc_id).
    *
    * Scale posture: the token explode filters to the query terms AT
    * THE SCAN (|terms| tiny); tf is one partial-agg groupBy; df and
    * the corpus stats are broadcast scalars; dl joins on doc_id; the
    * top-k is a TakeOrderedAndProject. No window over the corpus.
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 20,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms,
      s"terms must be non-empty and distinct, got $terms")
    require(k > 0, s"k must be positive, got $k")
    val dl = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"))
    val tf = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      sum("dl").as("tot_tokens"))
    val scored = tf.join(broadcast(dfT), "tok").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf_lin",
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)))
      .withColumn("avgdl",
        col("tot_tokens").cast("double") / col("n_docs").cast("double"))
      .withColumn("part",
        col("idf_lin") * (col("tf").cast("double") * (lit(k1) + lit(1.0))) /
          (col("tf").cast("double") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
    val perTerm = terms.zipWithIndex.map { case (t, i) =>
      coalesce(max(when(col("tok") === t, col("part"))), lit(0.0)).as(s"s_$i")
    }
    scored.groupBy("doc_id").agg(perTerm.head, perTerm.tail: _*)
      .withColumn("score",
        terms.indices.map(i => col(s"s_$i")).reduceLeft(_ + _))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
      .select("doc_id", "score")
  }

  /** Language-ID confusion matrix — the corpus-level evaluation of
    * [[langId]] against the labeled `lang` column: one row per
    * (true lang, predicted lang) with count and within-language
    * fraction. On the shared-vocabulary synthetic fixture this
    * DOCUMENTS the heuristic's honest failure mode (the x27 note made
    * queryable); on a real corpus it is the router-quality dashboard.
    * Composes the x27 plan with one ≤ |langs|²-cell partial-agg
    * groupBy and a broadcast totals join.
    */
  def langConfusion(docs: DataFrame): DataFrame = {
    val cells = langId(docs).groupBy("lang", "predicted_lang")
      .agg(count(lit(1)).as("cnt"))
    // totals derive from the ≤ |langs|² cell table — re-running the
    // langId plan for them would scan and score the corpus twice
    val totals = cells.groupBy("lang").agg(sum("cnt").as("n_lang"))
    cells.join(broadcast(totals), "lang")
      .withColumn("frac",
        col("cnt").cast("double") / col("n_lang").cast("double"))
      .select("lang", "predicted_lang", "cnt", "frac")
  }

  /** Deterministic training-shard assignment — the "tokenize → shuffle
    * → shard" writer step of a pretraining pipeline: documents are laid
    * out in a content-addressed pseudo-random order (md5 of the doc id,
    * the x80 shuffle discipline — reproducible across runs and
    * engines, no RNG state) and cut into shards of `shardTokens`
    * tokens; a document belongs to the shard containing its START
    * position, so every doc lands in exactly one shard and shard sizes
    * vary by less than one max-doc length.
    *
    * Scale posture: the global running sum over the shuffled order is
    * the [[packSequences]] two-phase decomposition re-keyed for hash
    * order — the bucket is the first two hex chars of the hash (256
    * uniform buckets by construction), phase 1 windows over the
    * 256-row bucket table, phase 2 windows per bucket (corpus/256 rows
    * per task, and `bucketChars` widens to 4096/65536 buckets when
    * even that is too coarse). No global sort, no single-task window,
    * no driver round-trip.
    */
  def trainingShards(docs: DataFrame, shardTokens: Long,
                     bucketChars: Int = 2): DataFrame = {
    require(shardTokens > 0, s"shardTokens must be positive, got $shardTokens")
    require(bucketChars > 0 && bucketChars <= 8,
      s"bucketChars must be in [1,8], got $bucketChars")
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"),
        md5(col("doc_id").cast("string")).as("h"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("bkt", substring(col("h"), 1, bucketChars))
    val wb = Window.orderBy("bkt")
    val priors = toks.groupBy("bkt").agg(sum("n_tokens").as("btoks"))
      .withColumn("prior", sum("btoks").over(wb) - col("btoks"))
      .drop("btoks")
    val wf = Window.partitionBy("bkt").orderBy("h")
    toks.join(priors, "bkt")
      .withColumn("cum", col("prior") + sum("n_tokens").over(wf))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"(cum - n_tokens) div $shardTokens").as("shard"))
  }

  /** Shard manifest — the release datasheet of a [[trainingShards]]
    * run (the x106 data-card discipline applied to the writer's
    * output): per shard, doc/token volumes, id extremes, and the
    * language/source diversity a training run reads to confirm the
    * hash shuffle actually mixed the corpus (a shard dominated by one
    * source means the order key is broken). Emitting it from the same
    * plan that assigns shards keeps manifest ≡ recomputation — the
    * CorpusIO `_manifest` rule.
    *
    * Scale posture: [[trainingShards]]'s two-phase shape plus one
    * doc_id equi-join back to the metadata columns and ONE partial-agg
    * groupBy(shard) — output rows = shard count (corpus/shardTokens).
    */
  def shardManifest(docs: DataFrame, shardTokens: Long,
                    bucketChars: Int = 2): DataFrame =
    trainingShards(docs, shardTokens, bucketChars)
      .join(docs.select("doc_id", "lang", "source"), "doc_id")
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"),
        countDistinct("lang").as("n_langs"),
        countDistinct("source").as("n_sources"))

  /** Per-epoch deterministic reshuffle (SURVEY §2.10 X34c) — the
    * multi-epoch generalization of [[trainingShards]]: epoch `e`
    * orders the corpus by `md5(doc_id || ':' || e)`, so each epoch is
    * an INDEPENDENT reproducible permutation (different salt →
    * different order; same salt → bit-identical across runs and
    * engines — no RNG state to checkpoint) and shard assignment is
    * pure METADATA: re-epoching a 100 TB corpus moves zero bytes of
    * document data, it re-derives (epoch, doc_id → shard) and the
    * reader fetches docs by the new plan.
    *
    * Scale posture: the [[trainingShards]] two-phase running-sum
    * decomposition with every window additionally partitioned by
    * epoch — phase 1 is an (epochs × 256)-row bucket table, phase 2
    * windows over corpus/256 rows per (epoch, bucket) task. The
    * epoch explode multiplies rows by `epochs` (bounded, caller-
    * chosen), never the corpus scan count: one scan feeds all epochs.
    */
  def epochShards(docs: DataFrame, shardTokens: Long, epochs: Int,
                  bucketChars: Int = 2): DataFrame = {
    require(shardTokens > 0,
      s"shardTokens must be positive, got $shardTokens")
    require(epochs > 0 && epochs <= 64,
      s"epochs must be in [1,64], got $epochs")
    require(bucketChars > 0 && bucketChars <= 8,
      s"bucketChars must be in [1,8], got $bucketChars")
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("epoch",
        explode(sequence(lit(0L), lit(epochs - 1L))))
      .withColumn("h", md5(concat(col("doc_id").cast("string"),
        lit(":"), col("epoch").cast("string"))))
      .withColumn("bkt", substring(col("h"), 1, bucketChars))
    val wb = Window.partitionBy("epoch").orderBy("bkt")
    val priors = toks.groupBy("epoch", "bkt")
      .agg(sum("n_tokens").as("btoks"))
      .withColumn("prior", sum("btoks").over(wb) - col("btoks"))
      .drop("btoks")
    val wf = Window.partitionBy("epoch", "bkt").orderBy("h")
    toks.join(priors, Seq("epoch", "bkt"))
      .withColumn("cum", col("prior") + sum("n_tokens").over(wf))
      .select(col("epoch"), col("doc_id"), col("n_tokens"),
        expr(s"(cum - n_tokens) div $shardTokens").as("shard"))
  }

  /** Epoch-mixing audit (SURVEY §2.10 X34d) — the check that the
    * per-epoch salt actually RE-MIXES the corpus: per epoch-0 shard,
    * how many distinct epoch-1 shards do its documents scatter to,
    * and what is the largest clump that stays together? A broken salt
    * (epoch ignored) shows `n_next_shards = 1` and
    * `max_overlap = n_docs` — documents marching through every epoch
    * in the same cohort, the gradient-correlation failure mode epoch
    * reshuffling exists to prevent. A healthy shuffle scatters each
    * shard across ~min(n_docs, corpus/shardTokens) successors.
    *
    * One corpus scan: both epochs' assignments come from ONE
    * [[epochShards]] pass, folded to a (shard0, shard1) row per doc
    * by a conditional groupBy — no self-join of the window plan.
    */
  def epochMixingAudit(docs: DataFrame, shardTokens: Long,
                       bucketChars: Int = 2): DataFrame = {
    val wide = epochShards(docs, shardTokens, 2, bucketChars)
      .groupBy("doc_id")
      .agg(max(when(col("epoch") === 0L, col("shard"))).as("shard0"),
        max(when(col("epoch") === 1L, col("shard"))).as("shard1"))
    wide.groupBy("shard0", "shard1").agg(count(lit(1)).as("n"))
      .groupBy(col("shard0").as("shard"))
      .agg(sum("n").as("n_docs"),
        count(lit(1)).as("n_next_shards"),
        max("n").as("max_overlap"))
  }

  /** Per-document out-of-vocabulary rate against the corpus's own
    * top-`vocabK` unigram vocabulary — the exact-arithmetic sibling of
    * the CCNet perplexity gate ([[corpusFreqScore]] scores by mean
    * document frequency; this scores by the fraction of tokens a
    * fixed-size vocabulary cannot represent, the quantity a tokenizer
    * budget actually constrains). Vocabulary order is total
    * (count desc, token asc) so the cut is deterministic at ties.
    *
    * Scale posture: the vocabulary is one partial-agg groupBy(token)
    * into a TakeOrderedAndProject (top-k, never a global sort); the
    * membership join broadcasts the ≤`vocabK`-row vocab; the per-doc
    * roll-up is one groupBy(doc_id) with partial aggregation. Rate is
    * int64 counts with ONE final division — order-independent.
    */
  def oovRate(docs: DataFrame, vocabK: Int = 100): DataFrame = {
    require(vocabK > 0, s"vocabK must be positive, got $vocabK")
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(vocabK)
      .select(col("tok"), lit(1L).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }
}
