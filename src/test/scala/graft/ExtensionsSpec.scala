package graft

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  import SparkTestBase.{sf, spark}

  private lazy val docs = Tables.read(spark, sf, "documents").cache()
  private lazy val emb = Tables.read(spark, sf, "embeddings").cache()

  test("LSH candidate set contains every true near-dup pair (recall @ j>=0.9)") {
    import spark.implicits._
    val truth = Dedup.jaccardPairs(docs, 0.9, 50)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val cand = Dedup.lshCandidatePairs(docs)
      .as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "fixture should contain planted near-dups")
    assert(truth.subsetOf(cand),
      s"missed: ${truth.diff(cand)}")
  }

  test("lshAudit: band-honesty — identical shingle sets outside the length band verify but never hit") {
    import spark.implicits._
    // docs 1/2 share an IDENTICAL 3-gram set (one cycle of "x y z" vs
    // two) → identical MinHash signatures → guaranteed LSH candidate
    // at exact jaccard 1.0; but their n_chars differ by more than the
    // ±1 band, so the banded exact truth EXCLUDES the pair — it must
    // count in n_verified and NOT in n_true/n_hit. docs 3/4 are exact
    // duplicates (candidate AND truth); doc 5 is unrelated noise.
    val d = Seq(
      (1L, "x y z x y z"),
      (2L, "x y z x y z x y z x y z"),
      (3L, "p q r s t u v w"),
      (4L, "p q r s t u v w"),
      (5L, "completely different tokens sit here now"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val got = Dedup.lshAudit(d, Seq(0.5), band = 1L)
      .as[(Double, Long, Long, Long, Long, Double, Double)].collect()
    assert(got.toSeq == Seq((0.5, 2L, 2L, 1L, 1L, 1.0, 1.0)))
  }

  test("lshAudit: corpus sweep — n_cand threshold-free, counts monotone, ratios bounded") {
    import spark.implicits._
    val rows = Dedup.lshAudit(docs, Seq(0.5, 0.7, 0.9), band = 10)
      .orderBy("threshold")
      .as[(Double, Long, Long, Long, Long, Double, Double)].collect()
    assert(rows.length == 3 && rows.forall(_._4 > 0),
      "fixture should contain true near-dup pairs at every threshold")
    assert(rows.map(_._2).distinct.length == 1,
      "candidate count must not depend on the threshold")
    rows.foreach { case (_, cand, ver, tru, hit, p, r) =>
      assert(hit <= math.min(ver, tru) && ver <= cand)
      assert(p >= 0.0 && p <= 1.0 && r >= 0.0 && r <= 1.0)
    }
    // verified/true/hit all shrink (weakly) as the bar rises
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._3 <= lo._3 && hi._4 <= lo._4 && hi._5 <= lo._5)
    }
  }

  test("minhashNearDups == jaccardPairs at high threshold") {
    import spark.implicits._
    def s(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(s(Dedup.minhashNearDups(docs, 0.9)) == s(Dedup.jaccardPairs(docs, 0.9, 50)))
  }

  test("batch bucketCap: a planted megabucket contributes no pairs and is surfaced member-by-member") {
    import spark.implicits._
    // 8 identical docs (one 8-member bucket per band) + one mutated
    // near-dup pair: at cap=5 the megabucket's 28 intra-pairs vanish,
    // the small pair's bucket (2 ≤ 5) is untouched, and the skip
    // report carries exactly the 8 members × 4 bands
    val hot = (1 to 40).map(i => s"bat$i").mkString(" ")
    val base = (100 to 140).map(i => s"pair$i").mkString(" ")
    val d = ((0 until 8).map(i => (i.toLong, hot)) ++
      Seq((20L, base), (21L, base + " tail42")))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    def pairs(cap: Int) = Dedup.minhashNearDups(d, 0.5, bucketCap = cap)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val uncapped = pairs(Int.MaxValue)
    assert(uncapped.size == 28 + 1, s"fixture: ${uncapped.size} pairs")
    assert(pairs(5) == Set((20L, 21L)),
      "cap=5 must drop exactly the megabucket's pairs")
    val report = Dedup.lshOversizedBuckets(d, 5)
      .select("doc_id", "bucket_size").as[(Long, Long)].collect()
    assert(report.length == 8 * 4 && report.forall(_._2 == 8L) &&
      report.map(_._1).toSet == (0L until 8L).toSet,
      s"skip report must carry the 8 members x 4 bands: ${report.length}")
    // cap above every bucket ≡ uncapped (the default's drift pin)
    assert(pairs(8) == uncapped)
  }

  test("one-scan cap+report: pairs and skip report agree with the standalone ops and share one cached band table") {
    import spark.implicits._
    val hot = (1 to 40).map(i => s"bat$i").mkString(" ")
    val base = (100 to 140).map(i => s"pair$i").mkString(" ")
    val d = ((0 until 8).map(i => (i.toLong, hot)) ++
      Seq((20L, base), (21L, base + " tail42")))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    val combo = Dedup.lshCandidatePairsWithReport(d, 5)
    try {
      val gotPairs = combo.pairs.as[(Long, Long)].collect().toSet
      val refPairs = Dedup.lshCandidatePairs(d, bucketCap = 5)
        .as[(Long, Long)].collect().toSet
      assert(gotPairs == refPairs,
        s"combo pairs drifted from lshCandidatePairs: $gotPairs vs $refPairs")
      val gotRep = combo.oversized.select("doc_id", "band", "bucket_size")
        .as[(Long, Int, Long)].collect().sorted
      val refRep = Dedup.lshOversizedBuckets(d, 5)
        .select("doc_id", "band", "bucket_size")
        .as[(Long, Int, Long)].collect().sorted
      assert(gotRep.sameElements(refRep),
        "combo report drifted from lshOversizedBuckets")
      // the single-scan contract: BOTH outputs read the one cached
      // band table — the shingle→minhash→band pipeline runs once,
      // not once per output (at crawl scale the second run is a
      // second corpus scan)
      def usesCache(df: org.apache.spark.sql.DataFrame): Boolean =
        df.queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
        }.nonEmpty
      assert(usesCache(combo.pairs) && usesCache(combo.oversized),
        "both combo outputs must resolve to the cached band table")
    } finally combo.unpersist()
  }

  test("exactDedup keeps one row per group; group sizes sum to total") {
    import spark.implicits._
    val d = Dedup.exactDedup(docs.select("lang", "source", "doc_id", "n_chars"),
      Seq("lang", "source"), "doc_id")
    val keys = d.select("lang", "source").as[(String, String)].collect()
    assert(keys.distinct.length == keys.length)
    assert(d.agg(sum("group_size")).head.getLong(0) == docs.count())
  }

  test("nearDupClusters matches a local union-find over the same edges") {
    import spark.implicits._
    val pairs = Dedup.jaccardPairs(docs, 0.5, 10).select("doc_a", "doc_b")
    val edges = pairs.as[(Long, Long)].collect()
    // local union-find reference
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = parent.keys.map(x => x -> find(x)).toMap
    val got = Dedup.nearDupClusters(pairs)
      .select("doc_id", "cluster").as[(Long, Long)].collect().toMap
    assert(got == expect)
  }

  test("starClusters matches nearDupClusters on the fixture pairs") {
    import spark.implicits._
    val pairs = Dedup.jaccardPairs(docs, 0.5, 10).select("doc_a", "doc_b")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "cluster").as[(Long, Long)].collect().toMap
    assert(m(Dedup.starClusters(pairs)) == m(Dedup.nearDupClusters(pairs)))
  }

  test("starClusters converges on a chain that exceeds the propagation budget") {
    import spark.implicits._
    // a 200-node path: diameter 199, so min-label propagation at its
    // default 25-round budget must fail loudly...
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    assertThrows[IllegalStateException](Dedup.nearDupClusters(chain).collect())
    // ...while star contraction needs O(log n) rounds
    val got = Dedup.starClusters(chain)
      .select("doc_id", "cluster", "cluster_size")
      .as[(Long, Long, Long)].collect()
    assert(got.length == 200)
    assert(got.forall { case (_, c, s) => c == 0L && s == 200L })
  }

  test("splitAssign is deterministic and respects the 8/1/1 bucket rule") {
    import spark.implicits._
    def assign(d: org.apache.spark.sql.DataFrame) =
      graft.operators.TextAnalysis.splitAssign(d)
        .select("doc_id", "lang", "split")
        .as[(Long, String, String)].collect().sortBy(_._1)
    val a1 = assign(docs)
    val a2 = assign(docs.repartition(7))
    assert(a1.toSeq == a2.toSeq) // partition-layout invariant
    val bySplit = a1.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "valid", "test"))
    assert(bySplit("train") > bySplit("valid") && bySplit("train") > bySplit("test"))
  }

  test("brute-force cosine top-k matches a local reference computation") {
    import spark.implicits._
    val got = Similarity.topKBrute(emb, Seq(0L), 5)
      .select("vec_id", "rank").as[(Long, Long)].collect().sortBy(_._2).map(_._1)
    val vecs = emb.select(col("vec_id"),
        transform(col("embedding"), x => round(x.cast("double") * 10000).cast("long")).as("v"))
      .as[(Long, Seq[Long])].collect().toMap
    val q = vecs(0L)
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val expect = vecs.removed(0L).toSeq
      .map { case (id, v) => (id, cos(q, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
    assert(got.toSeq == expect)
  }

  test("native vec_quantize/vec_norm_sq/vec_dot are bitwise-equal to the HOF formulation") {
    import spark.implicits._
    // the HOF pipeline VecQuantize/VecNormSq/VecDot replaced — any
    // divergence (rounding mode, overflow, null handling) breaks the
    // DuckDB oracle hash, so assert exact equality on the real table
    val hof = emb.select(col("vec_id"),
        transform(col("embedding"), x =>
          round(x.cast("double") * 10000).cast("long")).as("vq"))
      .withColumn("n2", aggregate(col("vq"), lit(0L), (acc, x) => acc + x * x))
      .withColumn("dot_self", aggregate(
        zip_with(col("vq"), col("vq"), (x, y) => x * y), lit(0L), (acc, x) => acc + x))
    val native = emb.select(col("vec_id"),
        graft.functions.VecOps.quantize(col("embedding")).as("vq"))
      .withColumn("n2", graft.functions.VecOps.normSq(col("vq")))
      .withColumn("dot_self", graft.functions.VecOps.dot(col("vq"), col("vq")))
    val h = hof.as[(Long, Seq[Long], Long, Long)].collect().sortBy(_._1)
    val n = native.as[(Long, Seq[Long], Long, Long)].collect().sortBy(_._1)
    assert(h.length == n.length && h.nonEmpty)
    h.zip(n).foreach { case (a, b) => assert(a == b, s"mismatch at vec_id ${a._1}") }
  }

  test("Md5Longs equals the conv(substring(md5)) idiom it fused") {
    import spark.implicits._
    val fused = docs.select(col("doc_id"),
      graft.functions.Md5Longs(col("text"), Seq((1, 14), (17, 14), (1, 15), (1, 4))).as("f"))
    val idiom = docs.select(col("doc_id"), array(
      conv(substring(md5(col("text")), 1, 14), 16, 10).cast("long"),
      conv(substring(md5(col("text")), 17, 14), 16, 10).cast("long"),
      conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long"),
      conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long")).as("f"))
    val a = fused.as[(Long, Seq[Long])].collect().sortBy(_._1)
    val b = idiom.as[(Long, Seq[Long])].collect().sortBy(_._1)
    assert(a.nonEmpty && a.toSeq == b.toSeq)
  }

  test("vec exprs are nullable even over non-nullable children") {
    // vec_dot returns null on length mismatch and null elements; with
    // non-nullable literal-array children the expression must still
    // declare nullable=true or the generated code assigns a
    // FalseLiteral isNull (janino error → interpreted fallback writing
    // 0 for a "non-null" long)
    val r = spark.range(1).select(
      graft.functions.VecOps.dot(
        array(lit(1L), lit(2L)), array(lit(3L))).as("d"),
      graft.functions.VecOps.dot(
        array(lit(1L), lit(2L)), array(lit(3L), lit(4L))).as("ok"))
      .head()
    assert(r.isNullAt(0), "length mismatch must be NULL, not 0")
    assert(r.getLong(1) == 11L)
  }

  test("custom expressions join whole-stage codegen (compute call, no eval dispatch)") {
    // All four custom expressions implement doGenCode by calling their
    // shared `compute` body from the generated stage. If one regressed to
    // CodegenFallback the generated code would route through
    // `((Expression) references[i]).eval(row)` instead — assert the
    // direct compute call is what's in the compiled stage.
    import org.apache.spark.sql.execution.debug._
    val vecCode = codegenString(
      emb.select(graft.functions.VecOps.quantize(col("embedding")).as("vq"))
        .select(graft.functions.VecOps.normSq(col("vq")).as("n2"),
          graft.functions.VecOps.dot(col("vq"), col("vq")).as("d"))
        .queryExecution.executedPlan)
    assert(vecCode.contains(".compute("), s"no compute call in:\n$vecCode")
    assert(!vecCode.contains("CodegenFallback"), "vec exprs fell back")
    val shingleCode = codegenString(
      docs.select(graft.functions.WordShingles(col("text"), 3).as("sh"))
        .queryExecution.executedPlan)
    assert(shingleCode.contains(".compute("), s"no compute call in:\n$shingleCode")
    assert(!shingleCode.contains("CodegenFallback"), "word_shingles fell back")
  }

  test("word_grams keeps every occurrence in order; word_shingles dedups") {
    import spark.implicits._
    val t = Seq("a b a b a", "x", "").toDF("text")
    val grams = t.select(
        graft.functions.WordShingles.grams(col("text"), 2).as("g"))
      .as[Seq[String]].collect().toSeq
    assert(grams == Seq(Seq("a b", "b a", "a b", "b a"), Nil, Nil))
    val shingles = t.select(
        graft.functions.WordShingles(col("text"), 2).as("g"))
      .as[Seq[String]].collect().toSeq
    assert(shingles == Seq(Seq("a b", "b a"), Nil, Nil))
    // SQL surface agrees with the Column API
    graft.GraftExtensions.register(spark)
    t.createOrReplaceTempView("wg_t")
    assert(spark.sql("SELECT word_grams(text, 2) AS g FROM wg_t")
      .as[Seq[String]].collect().toSeq == grams)
  }

  test("decontaminateBloom is result-identical to the broadcast-exact path") {
    import spark.implicits._
    def s(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().toSet
    val mark = col("doc_id") % 20 === 0
    assert(s(Dedup.decontaminateBloom(docs, mark)) ==
      s(Dedup.decontaminate(docs, mark)))
    // and the exact verify join is NOT broadcast (the past-broadcast
    // scale path must shuffle, not collect the benchmark side)
    val (inner, cache) = Dedup.decontaminateBloomPlan(docs, mark, 3, 0.01)
    try {
      val plan = inner.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a shuffle join:\n$plan")
    } finally cache.unpersist()
  }

  test("tokenBudgetSample is invariant to bucket size and matches the naive window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    def s(bucketDocs: Long) =
      TextAnalysis.tokenBudgetSample(docs, 2000L, bucketDocs)
        .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    val two = s(64L)
    assert(two == s(7L) && two == s(1000000L)) // decomposition-invariant
    // naive single-window reference
    val w = Window.partitionBy("lang").orderBy("doc_id")
    val naive = docs.select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      .filter(col("cum") - col("n_tokens") < 2000L)
      .select("doc_id", "lang", "n_tokens", "cum")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(two == naive)
    assert(two.nonEmpty && two.size < docs.count(), "budget should bite")
  }

  test("semanticDedup: removed ⇔ lower-id within-cell neighbor at cos ≥ τ") {
    import spark.implicits._
    val pairs = Similarity.cosineNearDups(emb, 0.35)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    val expectDupOf = pairs.groupBy(_._2).map { case (b, ps) =>
      b -> ps.map(_._1).min }
    val got = Similarity.semanticDedup(emb, 0.35)
      .select("vec_id", "kept", "dup_of")
      .as[(Long, Long, Option[Long])].collect()
    assert(got.length == emb.count())
    got.foreach { case (id, kept, dupOf) =>
      assert(dupOf == expectDupOf.get(id), s"vec $id")
      assert((kept == 1L) == dupOf.isEmpty, s"vec $id")
    }
    assert(expectDupOf.nonEmpty, "threshold should remove something")
  }

  test("embedDecontaminate: hits are exactly the held-adjacent pairs") {
    import spark.implicits._
    val held = (id: Long) => id % 20 == 0
    // derive expected hits from the (symmetric) near-dup pair list
    val pairs = Similarity.cosineNearDups(emb, 0.3)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    val hits = pairs.flatMap { case (a, b) =>
      (if (held(a) && !held(b)) Seq(b -> a) else Nil) ++
        (if (held(b) && !held(a)) Seq(a -> b) else Nil) }
      .groupBy(_._1).map { case (v, hs) =>
        v -> (hs.length.toLong, hs.map(_._2).min) }
    val got = Similarity.embedDecontaminate(emb, col("vec_id") % 20 === 0, 0.3)
      .select("vec_id", "n_hits", "first_hit")
      .as[(Long, Long, Option[Long])].collect()
    assert(got.length == emb.count() - emb.filter(col("vec_id") % 20 === 0).count())
    got.foreach { case (id, n, first) =>
      assert(!held(id))
      hits.get(id) match {
        case Some((en, emin)) => assert(n == en && first.contains(emin), s"vec $id")
        case None             => assert(n == 0L && first.isEmpty, s"vec $id")
      }
    }
    assert(hits.nonEmpty, "threshold should flag something")
  }

  test("importanceWeights: exact bucket counts on a hand fixture") {
    import spark.implicits._
    // 'x', 'y', 'zzz' hash to distinct md5(1,4)%256 buckets (212/82/171)
    val d = Seq(
      (1L, "en", "x x"), (2L, "de", "x"), (3L, "de", "zzz"), (4L, "en", "y")
    ).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.importanceWeights(d, "en")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // src: x→3, y→1, zzz→1; tgt (en): x→2, y→1
    assert(got == Seq(
      (1L, 2L, 4L, 6L, 4.0 / 6.0), // two x tokens
      (2L, 1L, 2L, 3L, 2.0 / 3.0),
      (3L, 1L, 0L, 1L, 0.0),       // zzz absent from the target
      (4L, 1L, 1L, 1L, 1.0)))
  }

  test("chunkWindows: start grid, short tail, fingerprint of the window") {
    import spark.implicits._
    val words = (1 to 20).map(i => s"w$i")
    val d = Seq((1L, words.mkString(" ")), (2L, "a b c d e"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkWindows(d, size = 12, stride = 8)
      .as[(Long, Long, Long, String)].collect().sortBy(t => (t._1, t._2)).toSeq
    def fp(ws: Seq[String]) = java.security.MessageDigest.getInstance("MD5")
      .digest(ws.mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got == Seq(
      (1L, 0L, 12L, fp(words.slice(0, 12))),
      (1L, 1L, 12L, fp(words.slice(8, 20))),
      (1L, 2L, 4L, fp(words.slice(16, 20))),  // tail runs short
      (2L, 0L, 5L, fp(Seq("a", "b", "c", "d", "e")))))
  }

  test("IVF top-k is the label-restricted subset of brute force ranking") {
    import spark.implicits._
    val qLabel = emb.filter(col("vec_id") === 0L).select("label").head.getInt(0)
    val ivf = Similarity.topKIvf(emb, Seq(0L), 5)
      .select("vec_id").as[Long].collect().toSet
    val labels = emb.select("vec_id", "label").as[(Long, Int)].collect().toMap
    assert(ivf.forall(labels(_) == qLabel))
  }

  test("repetitionScores matches a local per-doc n-gram computation") {
    import spark.implicits._
    val got = TextAnalysis.repetitionScores(docs)
      .as[(Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect()
    assert(texts.nonEmpty)
    texts.take(50).foreach { case (id, t) =>
      val toks = t.split(" ", -1)
      def grams(n: Int) = toks.sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toSeq
      val c2 = grams(2).groupBy(identity).map(_._2.size)
      val c5 = grams(5).groupBy(identity).map(_._2.size)
      val (_, top2, dup5, ttr) = got(id)
      // docs shorter than the gram size have no grams — the operator
      // leaves the ratio NULL there, so only assert when grams exist
      if (c2.nonEmpty) assert(top2 == c2.max.toDouble / c2.sum)
      if (c5.nonEmpty) assert(dup5 == c5.filter(_ >= 2).sum.toDouble / c5.sum)
      assert(ttr == toks.distinct.length.toDouble / toks.length)
    }
  }

  test("boilerplateStrip removes exactly the tokens covered by frequent 3-grams") {
    import spark.implicits._
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect()
    // local reference: global 3-gram df, covered positions, rebuild
    val gramDocs = scala.collection.mutable.Map.empty[String, Set[Long]]
    texts.foreach { case (id, t) =>
      t.split(" ", -1).sliding(3).filter(_.length == 3).foreach { g =>
        val k = g.mkString(" ")
        gramDocs(k) = gramDocs.getOrElse(k, Set.empty) + id
      }
    }
    val frequent = gramDocs.collect { case (g, ds) if ds.size >= 5 => g }.toSet
    assert(frequent.nonEmpty, "fixture should contain repeated 3-grams")
    val expect = texts.map { case (id, t) =>
      val toks = t.split(" ", -1)
      val covered = toks.sliding(3).zipWithIndex
        .collect { case (g, i) if g.length == 3 && frequent(g.mkString(" ")) =>
          Seq(i, i + 1, i + 2) }.flatten.toSet
      val kept = toks.zipWithIndex.collect { case (tok, i) if !covered(i) => tok }
      id -> (toks.length.toLong, kept.length.toLong, kept.mkString(" "))
    }.toMap
    val got = TextAnalysis.boilerplateStrip(docs)
      .as[(Long, Long, Long, String)].collect()
    assert(got.length == texts.length)
    got.foreach { case (id, nTok, nKept, clean) =>
      assert((nTok, nKept, clean) == expect(id), s"doc $id")
    }
  }

  test("piiRedact scrubs emails, phones, IPs with exact counts") {
    import spark.implicits._
    val rows = Seq(
      (1L, "mail bob.smith+x@corp.example.org now and alice@ex.io too"),
      (2L, "call +49-555-12345 or +1-555-0042 from 192.168.0.1 ok"),
      (3L, "edge 999.1.2.3 still matches but 1.2.3 does not; x@y.z no"),
      (4L, "clean text with nothing to hide")).toDF("doc_id", "text")
    val got = TextAnalysis.piiRedact(rows)
      .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 0L, 0L,
      "mail <EMAIL> now and <EMAIL> too")))
    assert(got(2L) == ((2L, 0L, 2L, 1L,
      "call <PHONE> or <PHONE> from <IP> ok")))
    // dotted-quad needs all four octets; x@y.z fails the {2,} TLD rule
    assert(got(3L) == ((3L, 0L, 0L, 1L,
      "edge <IP> still matches but 1.2.3 does not; x@y.z no")))
    assert(got(4L) == ((4L, 0L, 0L, 0L, "clean text with nothing to hide")))
  }

  test("piiRedact is idempotent and count-stable on the fixture corpus") {
    import spark.implicits._
    // placeholders are digit- and @-free, so a second pass must find
    // nothing: redact ∘ redact = redact, and counts on redacted text
    // are all zero — the property that makes re-running a pipeline
    // stage safe
    val dirty = docs.select(col("doc_id"),
      concat(col("text"), lit(" a"), col("doc_id").cast("string"),
        lit("@b.io via 10.1."), (col("doc_id") % 200).cast("string"),
        lit(".9 or +1-555-1234")).as("text"))
    val once = TextAnalysis.piiRedact(dirty)
    val twice = TextAnalysis.piiRedact(
      once.select(col("doc_id"), col("clean_text").as("text")))
    val t = twice.select("doc_id", "n_emails", "n_phones", "n_ips", "clean_text")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(t.nonEmpty && t.forall(r => r._2 == 0 && r._3 == 0 && r._4 == 0))
    val onceTexts = once.select("doc_id", "clean_text")
      .as[(Long, String)].collect().toMap
    assert(t.forall(r => r._5 == onceTexts(r._1)))
  }

  test("paragraphDedup invariants: distinct chunks conserved, order kept") {
    import spark.implicits._
    val withHeader = docs.select(col("doc_id"),
      concat(lit("h1 h2 h3 h4 h5 h6 h7 h8 h9 h10 "), col("text")).as("text"))
    val out = TextAnalysis.paragraphDedup(withHeader, k = 10)
      .as[(Long, Long, Long, String)].collect()
    // conservation: total kept chunks across the corpus == number of
    // DISTINCT chunks (each survives exactly once, none invented)
    val allChunks = withHeader.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().flatMap { case (_, t) =>
        t.split(" ", -1).grouped(10).map(_.mkString(" ")) }
    assert(out.map(_._3).sum == allChunks.distinct.length.toLong)
    // the shared header is kept exactly once, in the min-doc_id row
    val headerKeepers = out.filter(_._4.startsWith("h1 h2 h3 h4 h5"))
    assert(headerKeepers.map(_._1).toSeq == Seq(out.map(_._1).min))
    // per doc: kept text is a subsequence of the doc's own chunk list
    // (order preserved, nothing reordered)
    val chunksOf = withHeader.as[(Long, String)].collect().toMap
    out.filter(_._4.nonEmpty).foreach { case (id, _, _, dedup) =>
      val mine = chunksOf(id).split(" ", -1).grouped(10).map(_.mkString(" ")).toSeq
      val keptSeq = scala.collection.mutable.ArrayBuffer.empty[String]
      var rest = dedup
      // kept chunks are 10-token strings joined by ' '; recover them by
      // matching against the doc's own chunk sequence in order
      mine.foreach { c =>
        if (rest == c) { keptSeq += c; rest = "" }
        else if (rest.startsWith(c + " ")) { keptSeq += c; rest = rest.drop(c.length + 1) }
      }
      assert(rest.isEmpty, s"doc $id kept text is not an in-order chunk subsequence")
    }
  }

  test("corpusFreqScore: exact df join-back, hand-computed") {
    import spark.implicits._
    // df: a=3 docs, b=2, c=1, d=1 (df counts DOCS, not occurrences —
    // doc 1's repeated "a" adds once)
    val rows = Seq(
      (1L, "a a b"),
      (2L, "a b c"),
      (3L, "a d")).toDF("doc_id", "text")
    val got = TextAnalysis.corpusFreqScore(rows)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 3L, 8L, 8.0 / 3.0), // a+a+b = 3+3+2
      (2L, 3L, 6L, 2.0),       // 3+2+1
      (3L, 2L, 4L, 2.0)))      // 3+1
  }

  test("paragraphDedup keeps first occurrences and reassembles in order") {
    import spark.implicits._
    // k=3 chunks: doc 1 = [a b c][d e f], doc 2 repeats doc 1's first
    // chunk at idx 0 and has its own tail; doc 3 = doc 1 entirely; doc 4
    // duplicates a chunk WITHIN itself
    val rows = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c x y z"),
      (3L, "a b c d e f"),
      (4L, "p q r p q r p q")).toDF("doc_id", "text")
    val got = TextAnalysis.paragraphDedup(rows, k = 3)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 2L, "a b c d e f")))
    assert(got(2L) == ((2L, 2L, 1L, "x y z")))
    assert(got(3L) == ((3L, 2L, 0L, ""))) // fully deduplicated, row kept
    // within-doc dup: second "p q r" dropped, ragged tail "p q" is its
    // own chunk and survives
    assert(got(4L) == ((4L, 3L, 2L, "p q r p q")))
  }

  test("frameSample: frame boundaries, tail frame, stride, empty payload") {
    import spark.implicits._
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val media = Seq((1L, "0123456789"), (2L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"),
        lit("text/plain").as("fmt"))
    // 10 bytes at frameBytes=4 → frames 0..2; stride 2 keeps 0 and 2;
    // frame 2 is the 2-byte tail. The empty payload yields NO rows
    // (not a zero-length frame).
    val got = Multimodal.frameSample(media, frameBytes = 4, stride = 2)
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._2).toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 4L, md5hex("0123")),
      (1L, 2L, 8L, 2L, md5hex("89"))))
  }

  test("frameDedup: duplicated media owns nothing; the canonical copy owns everything") {
    import spark.implicits._
    // docs 1/2 are byte-identical (4 frames each: three "A"*64 repeats
    // + an "A"*8 tail → 2 DISTINCT frame contents); doc 3 is unique.
    // Owner = min doc_id per frame md5: doc 1 owns both of its
    // contents, doc 2 owns none (pure re-upload), doc 3 owns its own.
    val media = Seq((1L, "A" * 200), (2L, "A" * 200), (3L, "B" * 200))
      .toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"),
        lit("text/plain").as("fmt"))
    val got = Multimodal.frameDedup(media)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 4L, 2L, 2L, 1.0),
      (2L, 4L, 2L, 0L, 0.0),
      (3L, 4L, 2L, 2L, 1.0)))
  }

  test("resizeStub: byte decimation length + digest; partition-invariant") {
    import spark.implicits._
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val media = Seq((1L, "abcdefghij"), (2L, "xy"), (3L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"),
        lit("text/plain").as("fmt"))
    val expect = Seq(
      (1L, 10L, 3L, md5hex("aei")),   // bytes 0, 4, 8
      (2L, 2L, 1L, md5hex("x")),
      (3L, 0L, 0L, md5hex("")))       // empty in, md5 of zero bytes out
    val got = Multimodal.resizeStub(spark, media, factor = 4)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == expect)
    val reshuffled = Multimodal.resizeStub(spark, media.repartition(5), factor = 4)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(reshuffled == expect)
  }

  test("multimodal feature extraction: md5 + byte length round-trip") {
    import spark.implicits._
    val feats = Multimodal.extractFeatures(spark, Multimodal.asMediaTable(docs))
      .as[Multimodal.MediaFeatures].collect().map(f => f.doc_id -> f).toMap
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect()
    texts.take(20).foreach { case (id, t) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val f = feats(id)
      assert(f.sha == hex && f.n_bytes == t.getBytes("UTF-8").length.toLong)
      assert(f.head_byte == (t.head.toInt & 0xff))
      // text payloads must never probe as images
      assert(f.width == -1L && f.height == -1L && f.codec == null)
    }
  }

  test("multimodal image probe decodes real PNG/JPEG headers") {
    import spark.implicits._
    // real image bytes, JDK-encoded in memory — the decode path under
    // test is the same javax.imageio probe a production corpus would hit
    def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => img.setRGB(x, 0, x * 31))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos))
      bos.toByteArray
    }
    val png = imageBytes(37, 21, "png")
    val jpg = imageBytes(64, 48, "jpg")
    val media = Seq(
      Multimodal.MediaRow(1L, png, "image/png"),
      Multimodal.MediaRow(2L, jpg, "image/jpeg"),
      Multimodal.MediaRow(3L, png.take(8), "image/png"), // truncated header
      Multimodal.MediaRow(4L, Array[Byte](), "application/octet-stream"))
      .toDF()
    val got = Multimodal.extractFeatures(spark, media)
      .as[Multimodal.MediaFeatures].collect().map(f => f.doc_id -> f).toMap
    assert((got(1L).width, got(1L).height, got(1L).codec) == (37L, 21L, "png"))
    assert((got(2L).width, got(2L).height, got(2L).codec) == (64L, 48L, "jpeg"))
    // a truncated header and an empty blob degrade to byte features,
    // never a task failure
    assert(got(3L).codec == null && got(3L).width == -1L)
    assert(got(4L).codec == null && got(4L).n_bytes == 0L && got(4L).head_byte == -1L)
  }

  test("crossCorpusPairs == the straddling subset of jaccardPairs") {
    import spark.implicits._
    val ref = col("doc_id") % 5 === 0
    val cross = Dedup.crossCorpusPairs(docs, ref, 0.5, 10)
      .as[(Long, Long, Double)].collect().toSet
    // ground truth: the self-join pairs, restricted to pairs that
    // straddle the new/ref split, re-oriented as (new, ref)
    val straddle = Dedup.jaccardPairs(docs, 0.5, 10)
      .as[(Long, Long, Double)].collect().flatMap { case (a, b, j) =>
        if (a % 5 == 0 && b % 5 != 0) Some((b, a, j))
        else if (a % 5 != 0 && b % 5 == 0) Some((a, b, j))
        else None
      }.toSet
    assert(cross.nonEmpty, "fixture should contain cross-split near-dups")
    assert(cross == straddle)
  }

  test("tfidfTopTerms: hand fixture with a score tie broken by term") {
    import spark.implicits._
    // N=2. doc 1 tf: x→2, y→1; doc 2 tf: x→1, z→1. df: x→2, y→1, z→1.
    // doc 1 scores: x = 2·2/2 = 2.0, y = 1·2/1 = 2.0 — a genuine tie,
    // broken by term ("x" < "y"); doc 2: z = 2.0 outranks x = 1.0.
    val d = Seq((1L, "x x y"), (2L, "x z")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(d, 3)
      .as[(Long, String, Long, Long, Long, Double)]
      .collect().sortBy(t => (t._1, t._5)).toSeq
    assert(got == Seq(
      (1L, "x", 2L, 2L, 1L, 2.0), (1L, "y", 1L, 1L, 2L, 2.0),
      (2L, "z", 1L, 1L, 1L, 2.0), (2L, "x", 1L, 2L, 2L, 1.0)))
  }

  test("importanceWeightsLog: canonical Σ-of-logs vs independent Math.log ground truth") {
    import spark.implicits._
    // same fixture as the exact sibling: src x→3, y→1, zzz→1 (tot 5);
    // tgt (en) x→2, y→1, zzz→0 (tot 3); Laplace +1 over 256 buckets
    val d = Seq(
      (1L, "en", "x x"), (2L, "de", "x"), (3L, "de", "zzz"), (4L, "en", "y")
    ).toDF("doc_id", "lang", "text")
    def lr(tgtN: Long, srcN: Long): Double =
      math.log((tgtN + 1).toDouble / (3 + 256)) -
        math.log((srcN + 1).toDouble / (5 + 256))
    val expected = Map(
      1L -> (2L, 2 * lr(2, 3)), // two x tokens
      2L -> (1L, lr(2, 3)),
      3L -> (1L, lr(0, 1)),     // zzz absent from target: smoothed, finite
      4L -> (1L, lr(1, 1)))
    val got = TextAnalysis.importanceWeightsLog(d, "en")
      .as[(Long, Long, Double)].collect()
    assert(got.length == 4)
    got.foreach { case (id, n, w) =>
      val (en, ew) = expected(id)
      assert(n == en, s"doc $id token count")
      assert(math.abs(w - ew) < 1e-9, s"doc $id: got $w expected $ew")
      assert(!w.isInfinite && !w.isNaN, s"doc $id: smoothing must keep w finite")
    }
    // sanity across the siblings: both estimators agree the pure-target
    // doc 4 (y, in-target) outranks doc 3 (zzz, absent from target)
    val exact = TextAnalysis.importanceWeights(d, "en")
      .as[(Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r._5).toMap
    assert(exact(4L) > exact(3L) && expected(4L)._2 > expected(3L)._2)
  }

  test("tfidfTopTermsLn: tf·ln(N/df) vs Math.log, rank divergence from the linear sibling") {
    import spark.implicits._
    // N=10, engineered so the two spellings RANK doc 1 differently:
    //   "r": tf=1, df=1  → linear 1·10/1 = 10   ln 1·ln(10) ≈ 2.303
    //   "b": tf=4, df=5  → linear 4·10/5 = 8    ln 4·ln(2)  ≈ 2.773
    // linear ranks r above b (rarity rewarded aggressively); the
    // log-damped canonical form ranks b above r — exactly the
    // documented divergence a paper-reproducing user cares about
    val d = (Seq((1L, "b b b b r")) ++ (2L to 5L).map(i => (i, "b")) ++
      (6L to 10L).map(i => (i, "z"))).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTermsLn(d, 2)
      .as[(Long, String, Long, Long, Long, Double)].collect()
      .filter(_._1 == 1L).sortBy(_._5)
    def score(tf: Long, df: Long): Double = tf * math.log(10.0 / df)
    got.foreach { case (_, term, tf, df, _, s) =>
      assert(math.abs(s - score(tf, df)) < 1e-9, s"term $term")
    }
    assert(got.map(_._2).toSeq == Seq("b", "r"), "ln ranking: b above r")
    val lin = TextAnalysis.tfidfTopTerms(d, 2)
      .as[(Long, String, Long, Long, Long, Double)].collect()
      .filter(_._1 == 1L).sortBy(_._5).map(_._2).toSeq
    assert(lin == Seq("r", "b"), "linear ranking: r above b")
  }

  test("urlHostFilter: authority capture stops at /, :, ? and #") {
    import spark.implicits._
    val d = Seq(
      (1L, "https://a.com/p"), (2L, "http://b.org:8080/x?y"),
      (3L, "https://c.net?q=1"), (4L, "ftp://a.com#frag"))
      .toDF("doc_id", "url")
    val got = TextAnalysis.urlHostFilter(d, Seq("a.com").toDF("host"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a.com", 0L), (2L, "b.org", 1L),
      (3L, "c.net", 1L), (4L, "a.com", 0L)))
  }

  test("urlHostFilter: null/unparseable urls are not kept; dup blocklist rows don't multiply") {
    import spark.implicits._
    val d = Seq((1L, "https://a.com/p"), (2L, "not a url"), (3L, null))
      .toDF("doc_id", "url")
    // duplicate blocklist entries (real blocklist files have them)
    // must not duplicate matching doc rows
    val got = TextAnalysis.urlHostFilter(d, Seq("a.com", "a.com").toDF("host"))
      .as[(Long, Option[String], Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, Some("a.com"), 0L), (2L, None, 0L), (3L, None, 0L)))
  }

  test("noveltyRatio: zero-hit docs stay, sub-n-gram docs drop") {
    import spark.implicits._
    // ref doc 0 shingles: {a b c, b c d}; doc 1 shares one of two,
    // doc 2 shares none (fully novel), doc 3 is too short to shingle
    val d = Seq((0L, "a b c d"), (1L, "a b c x"), (2L, "p q r"), (3L, "p q"))
      .map { case (id, t) => (id, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    val got = Dedup.noveltyRatio(d, col("doc_id") === 0, 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, 1L, 0.5), (2L, 1L, 0L, 1.0)))
  }

  test("stratifiedSample: two-phase bucket top-k equals the one-window top-k") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val k = 10
    val got = TextAnalysis.stratifiedSample(docs, "lang", k)
      .as[(String, Long, Long, Long)].collect().toSet
    // the oracle spelling: ONE window per stratum over the same rank
    val naive = docs
      .select(col("lang").as("stratum"), col("doc_id"))
      .withColumn("rk", element_at(graft.functions.Md5Longs(
        concat(lit("smp:"), col("doc_id").cast("string")), Seq((1, 15))), 1))
      .withColumn("sample_rank", row_number().over(
        Window.partitionBy("stratum").orderBy(col("rk"), col("doc_id"))))
      .filter(col("sample_rank") <= k)
      .select(col("stratum"), col("doc_id"), col("rk"),
        col("sample_rank").cast("long"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == naive)
    // every stratum contributes min(k, |stratum|) rows
    val sizes = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val perStratum = got.toSeq.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perStratum == sizes.view.mapValues(n => math.min(k.toLong, n).toInt).toMap)
  }

  test("mixtureWeights: hand fixture — binding source saturates, plan is feasible") {
    import spark.implicits._
    // a: 100 tokens weight 1, b: 100 tokens weight 3 → W=4.
    // caps: a ⌊100·4/1⌋=400, b ⌊100·4/3⌋=133 → T*=133 (b binds).
    // keep: a ⌊1·133/4⌋=33, b ⌊3·133/4⌋=99 ≤ 100 ✓
    val d = Seq(
      ("a", Seq.fill(100)("t").mkString(" ")),
      ("b", Seq.fill(100)("t").mkString(" "))).toDF("source", "text")
    val w = Seq(("a", 1L), ("b", 3L)).toDF("source", "weight")
    val got = TextAnalysis.mixtureWeights(d, w)
      .select("source", "weight", "n_tokens", "t_star", "keep_tokens")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 1L, 100L, 133L, 33L), ("b", 3L, 100L, 133L, 99L)))
  }

  test("mixtureWeights invariants on the fixture corpus: keep ≤ have, mixture hit") {
    import spark.implicits._
    val weights = SparkEntry.fixtureSourceWeights(docs)
    val rows = TextAnalysis.mixtureWeights(docs, weights)
      .select("weight", "n_tokens", "t_star", "keep_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    val wTotal = rows.map(_._1).sum
    val tStar = rows.head._3
    rows.foreach { case (w, have, ts, keep) =>
      assert(ts == tStar, "T* is a global scalar")
      assert(keep <= have, "downsample-only: never upsample a source")
      assert(keep == w * tStar / wTotal, "keep realizes the target share of T*")
    }
    // the binding source's cap IS T* (some source saturates the plan)
    assert(rows.exists { case (w, have, _, _) => have * wTotal / w == tStar })
  }

  test("dupSpanCoverage: hand fixture with within-doc and cross-doc duplicates") {
    import spark.implicits._
    // doc 1: "a b c d e a b c d e" — the 5-gram "a b c d e" occurs at
    // pos 0 and 5 (count 2) → all 10 positions covered. Cross-gram
    // occurrences like "b c d e a" occur only once each.
    // doc 2: "a b c d e x y z w v" — "a b c d e" covers pos 0-4 only.
    // doc 3: "p q r s t" — unique 5-gram, count 1 → nothing covered.
    val d = Seq(
      (1L, "a b c d e a b c d e"),
      (2L, "a b c d e x y z w v"),
      (3L, "p q r s t")).toDF("doc_id", "text")
    val got = TextAnalysis.dupSpanCoverage(d)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 10L, 10L, 1.0), (2L, 10L, 5L, 0.5), (3L, 5L, 0L, 0.0)))
  }

  test("qualityDupMatrix: planted cross-table; totals reconcile with x86") {
    import spark.implicits._
    // docs 1/2: identical, all-distinct tokens → ttr band 10, fully
    // covered; doc 3: one repeated token → band 1, fully covered by
    // its own within-doc repeats; doc 4: unique all-distinct → band
    // 10 with zero coverage. Band 10 therefore mixes covered and
    // clean docs (20/30), band 1 is pure duplication.
    val d = Seq(
      (1L, "a b c d e f g h i j"), (2L, "a b c d e f g h i j"),
      (3L, "p p p p p p p p p p"), (4L, "q r s t u v w x y z"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val got = TextAnalysis.qualityDupMatrix(d)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 1L, 10L, 10L, 1.0),
      (10L, 3L, 30L, 20L, 20.0 / 30.0)))
    // fixture-corpus reconciliation: band doc counts partition the
    // corpus and the int64 totals equal the x86 coverage totals
    val m = TextAnalysis.qualityDupMatrix(docs)
    val (td, tt, tc) = m.agg(sum("n_docs"), sum("n_tokens"), sum("n_covered"))
      .as[(Long, Long, Long)].head()
    val (ct, cc) = TextAnalysis.dupSpanCoverage(docs)
      .agg(sum("n_tokens"), sum("n_covered")).as[(Long, Long)].head()
    assert(td == docs.count() && tt == ct && tc == cc)
  }

  test("qualityCalibratedGate: per-lang histogram threshold; keep-ties may drop fewer than cut") {
    import spark.implicits._
    // 10 tokens per doc with d distinct → score_milli = d·100 exactly.
    // en plants a TIE at the threshold: scores [200,200,300,400,500],
    // cut = 5·200‰ = 1, threshold = 2nd smallest = 200, and BOTH
    // 200-docs are kept (keep-ties: drops 0 < cut docs). fr has
    // distinct scores [100..500]: the cut drops exactly one doc.
    def txt(d: Int) = (0 until 10).map(i => s"t${i % d}").mkString(" ")
    val d = (Seq((1L, 2), (2L, 2), (3L, 3), (4L, 4), (5L, 5)).map {
      case (id, k) => (id, txt(k), "en")
    } ++ Seq((6L, 1), (7L, 2), (8L, 3), (9L, 4), (10L, 5)).map {
      case (id, k) => (id, txt(k), "fr")
    }).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.qualityCalibratedGate(d)
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("en", 5L, 1L, 200L, 5L, 50L),
      ("fr", 5L, 1L, 200L, 4L, 40L)))
    // dropPermille = 0 → cut 0, threshold = per-lang min score, keep all
    val all = TextAnalysis.qualityCalibratedGate(d, dropPermille = 0)
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(all == Seq(
      ("en", 5L, 0L, 200L, 5L, 50L),
      ("fr", 5L, 0L, 100L, 5L, 50L)))
  }

  test("normalizedDedup: case/punct/whitespace variants collapse to one canonical owner") {
    import spark.implicits._
    val d = Seq(
      (1L, "Hello, World!"), (2L, "hello world"),
      (3L, "  hello   world  "), (4L, "unique doc"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.normalizedDedup(d)
      .as[(Long, String, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(got.map(r => (r._1, r._3, r._4, r._5)) == Seq(
      (1L, 1L, 3L, true), (2L, 1L, 3L, false),
      (3L, 1L, 3L, false), (4L, 4L, 1L, true)))
    // all three variants share one fingerprint, the unique doc doesn't
    assert(got.take(3).map(_._2).distinct.size == 1 && got(3)._2 != got.head._2)
    // fixture-corpus invariant: kept copies == distinct fingerprints
    val m = TextAnalysis.normalizedDedup(docs)
    assert(m.filter(col("is_kept")).count() ==
      m.select("canon_fp").distinct().count())
  }

  test("dupSpanRemove: min-doc_id owner keeps its copy, non-owners lose covered spans") {
    import spark.implicits._
    // doc 1 owns "a b c d e" (min doc_id); doc 2 carries the same gram
    // and loses pos 0-4; doc 3's within-doc repeat ("k k k k k" at pos
    // 0 and 1, count 2) survives whole because doc 3 IS the owner and
    // the rule is per (doc, gram); doc 4 is shorter than n → untouched.
    val d = Seq(
      (1L, "a b c d e x y z w v"),
      (2L, "a b c d e p q r s t"),
      (3L, "k k k k k k"),
      (4L, "m n")).toDF("doc_id", "text")
    val got = TextAnalysis.dupSpanRemove(d)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 10L, 10L, "a b c d e x y z w v"),
      (2L, 10L, 5L, "p q r s t"),
      (3L, 6L, 6L, "k k k k k k"),
      (4L, 2L, 2L, "m n")))
  }

  test("dupSpanRemove: owning gram A does not shield positions covered by foreign gram B") {
    import spark.implicits._
    // A = "a b c d e" (docs 1, 2 → owner 1); B = "b c d e f"
    // (docs 0, 1 → owner 0). Doc 1 owns A but B covers its pos 1-5,
    // so only pos 0 survives — the per-(doc, gram) semantics exactly.
    val d = Seq(
      (0L, "q b c d e f"),
      (1L, "a b c d e f"),
      (2L, "a b c d e x")).toDF("doc_id", "text")
    val got = TextAnalysis.dupSpanRemove(d)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 6L, 6L, "q b c d e f"),
      (1L, 6L, 1L, "a"),
      (2L, 6L, 1L, "x")))
  }

  test("sourceOverlapMatrix: exact distinct-gram Jaccard, all pairs present, no NaN") {
    import spark.implicits._
    // s1 = {a b c, b c d, b c q} (the repeated "a b c" across its two
    // docs counts once — DISTINCT per source); s2 = {b c d, c d e};
    // s3 = {zz yy xx}; s4/s5 have no 3-grams at all → every pair
    // involving them shows up with n_inter 0, and the s4-s5 pair's
    // 0/0 is pinned to 0.0, not NaN.
    val d = Seq(
      (1L, "s1", "a b c d"), (2L, "s1", "a b c q"),
      (3L, "s2", "b c d e"), (4L, "s3", "zz yy xx"),
      (5L, "s4", "m n"), (6L, "s5", "o p"))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.sourceOverlapMatrix(d)
      .as[(String, String, Long, Long, Double)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      ("s1", "s2", 1L, 4L, 0.25), ("s1", "s3", 0L, 4L, 0.0),
      ("s1", "s4", 0L, 3L, 0.0), ("s1", "s5", 0L, 3L, 0.0),
      ("s2", "s3", 0L, 3L, 0.0), ("s2", "s4", 0L, 2L, 0.0),
      ("s2", "s5", 0L, 2L, 0.0), ("s3", "s4", 0L, 1L, 0.0),
      ("s3", "s5", 0L, 1L, 0.0), ("s4", "s5", 0L, 0L, 0.0)))
  }

  test("temperatureMixture: α=0.5 compresses shares toward uniform; fold order-invariant") {
    import spark.implicits._
    val t5 = TextAnalysis.temperatureMixture(docs, 0.5)
      .as[(String, Long, Double, Double)].collect().sortBy(_._1).toSeq
    val t1 = TextAnalysis.temperatureMixture(docs, 1.0)
      .as[(String, Long, Double, Double)].collect().sortBy(_._1).toSeq
    // α=1 is the identity mixture: share == exact token share
    val total = t1.map(_._2).sum.toDouble
    t1.foreach { case (_, n, _, s) => assert(math.abs(s - n / total) < 1e-12) }
    // shares are a distribution in both temperatures
    for (t <- Seq(t5, t1)) {
      assert(math.abs(t.map(_._4).sum - 1.0) < 1e-12)
      assert(t.forall(_._4 > 0.0))
    }
    // α=0.5 upweights scarce sources: the max/min share ratio strictly
    // shrinks (the fixture's sources are not uniform)
    def spread(t: Seq[(String, Long, Double, Double)]) =
      t.map(_._4).max / t.map(_._4).min
    assert(spread(t1) > 1.0 + 1e-9, "fixture should have non-uniform sources")
    assert(spread(t5) < spread(t1))
    // the ordered fold makes the result partition-order-invariant:
    // a reshuffled input yields bit-identical doubles
    val reshuffled = TextAnalysis.temperatureMixture(docs.repartition(7), 0.5)
      .as[(String, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(reshuffled == t5)
    intercept[IllegalArgumentException](
      TextAnalysis.temperatureMixture(docs, 0.3))
  }

  test("mixtureApply: bucket-size invariant; realized tokens land in [keep, keep+max)") {
    import spark.implicits._
    val weights = SparkEntry.fixtureSourceWeights(docs)
    def run(b: Long) = TextAnalysis.mixtureApply(docs, weights, b)
      .as[(Long, String, Long, Long)].collect().toSet
    val got = run(64L)
    assert(got == run(7L) && got == run(100000L),
      "the two-phase decomposition must not depend on bucket size")
    val plan = TextAnalysis.mixtureWeights(docs, weights)
      .select("source", "keep_tokens").as[(String, Long)].collect().toMap
    val maxDoc = got.map(_._3).max
    val srcDocs = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    got.groupBy(_._2).foreach { case (src, rows) =>
      val realized = rows.toSeq.map(_._3).sum
      // keep-while-prior-under-budget ⇒ either the source ran out of
      // docs, or the kept prefix reaches the budget
      assert(rows.size == srcDocs(src) || realized >= plan(src),
        s"$src under-filled ($realized < ${plan(src)}) with docs left unkept")
      assert(realized < plan(src) + maxDoc,
        s"$src overshot its budget by a whole document")
    }
    // every source in the plan contributes at least one doc (budgets
    // are far above one doc on this fixture)
    assert(got.map(_._2) == plan.keySet)
  }

  test("packSequences: hand fixture with a straddling doc; bucket-size invariant") {
    import spark.implicits._
    // tokens: 3, 2, 4; bin 4 ⇒ doc1 [0,3)→seq 0; doc2 [3,5)→seqs 0-1
    // (straddles the cut at 4); doc3 [5,9)→seqs 1-2
    val d = Seq((1L, "a b c"), (2L, "d e"), (3L, "f g h i"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.packSequences(d, 4L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 3L, 0L, 0L, 0L), (2L, 2L, 3L, 0L, 1L),
      (3L, 4L, 5L, 1L, 2L)))
    // corpus fixture: decomposition invariant to bucket size, and the
    // packed stream is gapless (start_tok = prefix sum of n_tokens)
    def run(b: Long) = TextAnalysis.packSequences(docs, 512L, b)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val ref = run(100000L)
    assert(run(64L) == ref && run(7L) == ref)
    ref.foldLeft(0L) { case (expectStart, (_, n, start, first, last)) =>
      assert(start == expectStart, "packed stream must be gapless")
      assert(first == start / 512L && last == (start + n - 1) / 512L)
      start + n
    }
  }

  test("snapshotDiff: all four statuses on a hand fixture") {
    import spark.implicits._
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val nw = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(old, nw)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "removed"), (2L, "unchanged"),
      (3L, "changed"), (4L, "added")))
  }

  test("snapshotDiff: null-text rows classify by id presence, not fingerprint") {
    import spark.implicits._
    // md5(NULL) is NULL — presence must come from the join sides, and
    // null-vs-null fingerprints compare null-safely as unchanged
    val old = Seq((1L, null: String), (2L, null: String), (3L, "c"))
      .toDF("doc_id", "text")
    val nw = Seq((2L, null: String), (3L, null: String), (4L, null: String))
      .toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(old, nw)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "removed"), (2L, "unchanged"),
      (3L, "changed"), (4L, "added")))
  }

  test("mixtureWeights rejects non-positive weights and duplicate source rows") {
    import spark.implicits._
    val d = Seq(("a", "t t"), ("b", "t")).toDF("source", "text")
    val zero = Seq(("a", 1L), ("b", 0L)).toDF("source", "weight")
    val e1 = intercept[Exception] {
      TextAnalysis.mixtureWeights(d, zero).collect()
    }
    assert(e1.getMessage.contains("non-positive weight") ||
      Option(e1.getCause).exists(_.getMessage.contains("non-positive weight")))
    val dup = Seq(("a", 1L), ("a", 2L), ("b", 1L)).toDF("source", "weight")
    val e2 = intercept[Exception] {
      TextAnalysis.mixtureWeights(d, dup).collect()
    }
    assert(e2.getMessage.contains("duplicate weight rows") ||
      Option(e2.getCause).exists(_.getMessage.contains("duplicate weight rows")))
    // a NULL weight must raise too — `weight <= 0` alone evaluates to
    // NULL and would sail through both branches silently
    val withNull = Seq(("a", java.lang.Long.valueOf(1L)),
      ("b", null: java.lang.Long)).toDF("source", "weight")
    val e3 = intercept[Exception] {
      TextAnalysis.mixtureWeights(d, withNull).collect()
    }
    assert(e3.getMessage.contains("null or non-positive") ||
      Option(e3.getCause).exists(_.getMessage.contains("null or non-positive")))
  }

  test("annRecall: hits equal the local brute∩ivf intersection per query") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L)
    val brute = Similarity.topKBrute(emb, ids, 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.topKIvf(emb, ids, 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val got = Similarity.annRecall(emb, ids, 5)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == ids)
    got.foreach { case (qid, nBrute, nHit, recall) =>
      assert(nBrute == 5L)
      val expectHit = brute.count(p => p._1 == qid && ivf(p))
      assert(nHit == expectHit.toLong)
      assert(recall == nHit.toDouble / nBrute)
      assert(nHit <= nBrute)
    }
  }

  test("topKSignLsh: results are cosine-ranked true candidates, and buckets prune") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L)
    val got = Similarity.topKSignLsh(emb, ids, 5)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    // per query: ranks are 1..n and cosine non-increasing in rank
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4
        case _ => true
      })
    }
    // the LSH top-k re-rank is exact cosine: any result also in the
    // brute-force top-k must carry the identical cosine
    val brute = Similarity.topKBrute(emb, ids, 5)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    got.foreach { case (q, v, _, c) =>
      brute.get((q, v)).foreach(bc => assert(bc == c))
    }
  }

  test("signLshRecall: hits equal the local brute∩lsh intersection; buckets prune the scan") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L)
    val brute = Similarity.topKBrute(emb, ids, 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.topKSignLsh(emb, ids, 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    // banding genuinely pruned: some query's candidate top-k is not
    // simply the brute top-k (otherwise the fixture proves nothing) —
    // structural, not a recall-quality assertion
    assert(lsh.size <= brute.size)
    val got = Similarity.signLshRecall(emb, ids, 5)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == ids)
    got.foreach { case (qid, nBrute, nHit, recall) =>
      assert(nBrute == 5L)
      val expectHit = brute.count(p => p._1 == qid && lsh(p))
      assert(nHit == expectHit.toLong)
      assert(recall == nHit.toDouble / nBrute)
    }
  }

  test("topKSignLsh: corpus smaller than the anchor budget still answers") {
    import spark.implicits._
    // 6 vectors but 4×4 bits want 32 anchors: pairs truncate to the
    // available prefix, the trailing unpaired anchor is dropped, and
    // the operator still returns a ranked result instead of throwing
    val rows = (0L until 6L).map(i =>
      (i, Array.tabulate(8)(d => (i + 1).toFloat * (d + 1)), i % 2))
    val tiny = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.topKSignLsh(tiny, Seq(0L), 3)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.forall(_._1 == 0L))
    assert(got.map(_._3).sorted.toSeq == (1L to got.length).toSeq)
  }

  test("pqCodes: m=1 degenerates to the kmeansIter assignment exactly") {
    import spark.implicits._
    // one subspace spanning the whole vector ⇒ the PQ codebook IS the
    // Lloyd centroid table and the code argmin IS the Lloyd argmin —
    // code == new_label and the quantization error == the Lloyd d2,
    // row for row. Pins the two learners to one definition of
    // "nearest centroid in exact int64 space".
    val pq = Similarity.pqCodes(emb, m = 1, dims = 64)
      .select(col("vec_id"), col("code"), col("d2").as("pq_d2"))
    val lloyd = Similarity.kmeansIter(emb)
      .select(col("vec_id"), col("new_label"), col("d2"))
    val joined = pq.join(lloyd, "vec_id")
    assert(joined.count() == emb.count())
    assert(joined.filter(col("code") =!= col("new_label") ||
      col("pq_d2") =!= col("d2")).count() == 0L)
  }

  test("pqCodes/topKPqAdc: zero-distortion corpus — codes lossless, ADC == exact L2") {
    import spark.implicits._
    // every vector IS its group centroid (members identical within a
    // label), so the learned codewords reproduce the vectors exactly:
    // quantization error must be 0 on every row, and the ADC distance
    // table lookups must equal the true distances — topKPqAdc and
    // topKBruteL2 must agree rank-for-rank including the distance.
    val vecs = for (g <- 0 until 4; i <- 0 until 5) yield
      (g * 5L + i, g, Array.fill(64)(g * 0.25f + 0.05f))
    val fix = vecs.toDF("vec_id", "label", "embedding")
    assert(Similarity.pqCodes(fix).filter(col("d2") =!= 0L).count() == 0L)
    val adc = Similarity.topKPqAdc(fix, Seq(0L), 7)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._3)
    val brute = Similarity.topKBruteL2(fix, Seq(0L), 7)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._3)
    assert(adc.toSeq == brute.toSeq)
    val rec = Similarity.pqRecall(fix, Seq(0L, 5L), 7)
      .select("recall").as[Double].collect()
    assert(rec.toSeq == Seq(1.0, 1.0))
  }

  test("pqCodes: one code per (vector, subspace); codes drawn from the label set") {
    import spark.implicits._
    val codes = Similarity.pqCodes(emb)
    assert(codes.count() == emb.count() * 8)
    assert(codes.select("vec_id", "sub").distinct().count() == emb.count() * 8)
    val labels = emb.select(col("label").cast("long")).as[Long].collect().toSet
    val used = codes.select("code").as[Long].collect().toSet
    assert(used.subsetOf(labels))
    assert(codes.filter(col("d2") < 0L).count() == 0L)
  }

  test("topKIvfPqAdc: results confined to the query's cell; ≡ ADC re-ranked within it") {
    import spark.implicits._
    // (a) every returned neighbor shares the query's coarse cell —
    // the prune's defining property; (b) the composed search equals
    // the plain ADC ranking restricted to that cell and re-ranked —
    // pruning changes the candidate set, never the metric.
    val res = Similarity.topKIvfPqAdc(emb, Seq(0L, 1L, 2L), 5)
    val lbl = emb.select(col("vec_id"), col("label"))
    val crossCell = res.join(lbl, "vec_id")
      .join(lbl.select(col("vec_id").as("q_id"), col("label").as("q_label")),
        "q_id")
      .filter(col("label") =!= col("q_label"))
    assert(crossCell.count() == 0L)
    val n = emb.count().toInt
    val within = Similarity.topKPqAdc(emb, Seq(0L, 1L, 2L), n)
      .join(lbl, "vec_id")
      .join(lbl.select(col("vec_id").as("q_id"), col("label").as("q_label")),
        "q_id")
      .filter(col("label") === col("q_label"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("adc_d2").asc, col("vec_id"))
    val expected = within
      .withColumn("rerank", row_number().over(w).cast("long"))
      .filter(col("rerank") <= 5)
      .select(col("q_id"), col("vec_id"), col("rerank").as("rank"), col("adc_d2"))
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._3)).toSeq
    val got = res.as[(Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._3)).toSeq
    assert(got == expected)
  }

  test("topKIvfPqAdc: zero-distortion corpus — own-group members at distance 0") {
    import spark.implicits._
    val vecs = for (g <- 0 until 4; i <- 0 until 5) yield
      (g * 5L + i, g, Array.fill(64)(g * 0.25f + 0.05f))
    val fix = vecs.toDF("vec_id", "label", "embedding")
    val got = Similarity.topKIvfPqAdc(fix, Seq(0L), 4)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._3).toSeq
    assert(got == Seq((0L, 1L, 1L, 0L), (0L, 2L, 2L, 0L),
      (0L, 3L, 3L, 0L), (0L, 4L, 4L, 0L)))
  }

  test("pqDistortion: totals reconcile with pqCodes; zero on the lossless corpus") {
    import spark.implicits._
    val rows = Similarity.pqDistortion(emb)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(rows.map(_._1) == (0L until 8L))
    assert(rows.forall(_._2 == emb.count()))
    val total = Similarity.pqCodes(emb)
      .agg(sum("d2")).head.getLong(0)
    assert(rows.map(_._3).sum == total)
    assert(rows.forall(r => r._4 >= 0L && r._5 >= 0.0))
    val vecs = for (g <- 0 until 4; i <- 0 until 5) yield
      (g * 5L + i, g, Array.fill(64)(g * 0.25f + 0.05f))
    val fix = vecs.toDF("vec_id", "label", "embedding")
    assert(Similarity.pqDistortion(fix)
      .filter(col("total_d2") =!= 0L || col("max_d2") =!= 0L).count() == 0L)
  }

  test("kmeansIter: one Lloyd step repairs a corrupted assignment") {
    import spark.implicits._
    // two tight planted clusters around (1,0,…) and (0,1,…); vectors 0
    // and 5 start mislabeled — their cluster's centroid is still
    // dominated by correctly-labeled mass, so one iteration moves
    // exactly the two defectors and nothing else
    def v(main: Int, eps: Float): Seq[Float] =
      Seq.tabulate(4)(i => if (i == main) 1.0f + eps else eps)
    val rows = Seq(
      (0L, v(0, 0.001f), 1), (1L, v(0, 0.002f), 0), (2L, v(0, 0.003f), 0),
      (3L, v(0, 0.004f), 0), (4L, v(1, 0.001f), 1), (5L, v(1, 0.002f), 0),
      (6L, v(1, 0.003f), 1), (7L, v(1, 0.004f), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.kmeansIter(emb)
      .select("vec_id", "new_label", "moved")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(out.map(r => r._1 -> r._2).toMap ==
      Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
        4L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 1L))
    assert(out.count(_._3) == 2, "exactly the two defectors move")
    // a second iteration from the repaired labels is a fixed point
    val again = Similarity.kmeansIter(
      emb.drop("label").join(
        Similarity.kmeansIter(emb).select(col("vec_id"),
          col("new_label").cast("int").as("label")), "vec_id"))
    assert(again.filter(col("moved")).count() == 0L)
  }

  test("hostRank iteration: hand graph with sink, fan-out, and unlinked host") {
    import graft.operators.HostGraph
    import spark.implicits._
    // a→b, a→c, b→a; d unlinked; c is a sink (sheds its mass)
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "a")).toDF("src", "dst")
    val r0 = HostGraph.uniformRanks(Seq("a", "b", "c", "d").toDF("host"))
    val r1 = HostGraph.rankIter(edges, r0)
      .as[(String, Long)].collect().toMap
    val S = HostGraph.Scale
    // a gets all of b: (15S + 85·S) div 100 = S
    assert(r1("a") == (15 * S + 85 * S) / 100)
    // b and c each get half of a (out_deg 2, trunc div)
    assert(r1("b") == (15 * S + 85 * (S / 2)) / 100)
    assert(r1("c") == r1("b"))
    // d: damped base only
    assert(r1("d") == 15 * S / 100)
    // iterating preserves the universe and never goes negative
    val r2 = HostGraph.rankIter(edges, HostGraph.rankIter(edges, r0))
    assert(r2.count() == 4 && r2.filter(col("rank") < 0).count() == 0)
  }

  test("curationLedger: partition of the candidate pool, precedence respected") {
    import spark.implicits._
    val held = col("doc_id") % 20 === 0
    val clusters = Dedup.nearDupClusters(
      Dedup.jaccardPairs(docs, 0.5, 10).select("doc_a", "doc_b"))
    val ledger = TextAnalysis.curationLedger(docs, 2.0, clusters, held)
      .as[(Long, String)].collect().toMap
    // exactly one decision per non-held doc
    val pool = docs.filter(held === false).select("doc_id").as[Long].collect().toSet
    assert(ledger.keySet == pool)
    // independent signals — the dup rule canonicalizes among NON-HELD
    // QUALITY SURVIVORS (curateWith's rule + the held exclusion: a
    // held canonical copy never enters the corpus, so it must not
    // absorb the representative slot), so the local recomputation must
    // too
    val quality = TextAnalysis.quality(docs)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    val dupDropped = clusters.as[(Long, Long, Long)].collect()
      .filter(t => quality(t._1) >= 2.0 && t._1 % 20 != 0)
      .groupBy(_._2).values.flatMap { g =>
        val keep = g.map(_._1).min; g.map(_._1).filter(_ != keep)
      }.toSet
    val contaminated = Dedup.decontaminate(docs, held)
      .select("doc_id").as[Long].collect().toSet
    ledger.foreach { case (id, reason) =>
      val expected =
        if (quality(id) < 2.0) "low_quality"
        else if (dupDropped(id)) "duplicate"
        else if (contaminated(id)) "contaminated"
        else "kept"
      assert(reason == expected, s"doc $id: $reason != $expected")
    }
  }

  test("crawlNoveltySeries: first batch fully novel; novelty == first-seen fraction") {
    import spark.implicits._
    val out = Dedup.crawlNoveltySeries(docs, expr("doc_id div 100"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out.nonEmpty)
    // batch 0 has no predecessor — everything it contains is new
    val (c0, g0, n0, nov0) = out.head
    assert(c0 == 0L && n0 == g0 && nov0 == 1.0)
    out.foreach { case (_, grams, nw, nov) =>
      assert(nw <= grams && nov == nw.toDouble / grams.toDouble)
    }
    // equivalence with the naive spelling: new in batch b = distinct
    // grams of b minus the union of all earlier batches' grams
    val byBatch = docs.select(expr("doc_id div 100").as("c"),
      explode(Dedup.shingles(col("text"))).as("g"))
      .distinct().as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    out.foreach { case (c, grams, nw, _) =>
      val earlier = byBatch.filter(_._1 < c).values.flatten.toSet
      assert(grams == byBatch(c).size.toLong)
      assert(nw == byBatch(c).diff(earlier).size.toLong, s"batch $c")
    }
  }

  test("curationLedger with no held set reconciles exactly with curateWith") {
    import spark.implicits._
    val clusters = Dedup.nearDupClusters(
      Dedup.jaccardPairs(docs, 0.5, 10).select("doc_a", "doc_b"))
    // no held set ⇒ the contamination gate never fires, and the
    // ledger's kept rows must BE curateWith's kept corpus
    val keptIds = TextAnalysis.curationLedger(docs, 3.0, clusters, lit(false))
      .filter(col("reason") === "kept").select("doc_id")
      .as[Long].collect().toSet
    val curated = TextAnalysis.curateWith(docs, 3.0, clusters)
      .agg(sum("n_docs")).as[Long].head()
    assert(keptIds.size.toLong == curated,
      s"ledger kept ${keptIds.size} but curateWith kept $curated")
    // and the per-(lang, split) breakdown matches too
    val ledgerCounts = TextAnalysis.splitAssign(
      docs.join(keptIds.toSeq.toDF("doc_id"), "doc_id"))
      .groupBy("lang", "split").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().toSet
    val curateCounts = TextAnalysis.curateWith(docs, 3.0, clusters)
      .select("lang", "split", "n_docs")
      .as[(String, String, Long)].collect().toSet
    assert(ledgerCounts == curateCounts)
  }

  test("clusterSafeSplit: near-dup pairs never straddle splits; singletons match splitAssign") {
    import spark.implicits._
    val pairs = Dedup.jaccardPairs(docs, 0.5, 10).select("doc_a", "doc_b")
    val clusters = Dedup.nearDupClusters(pairs)
    val split = TextAnalysis.clusterSafeSplit(docs, clusters)
      .as[(Long, Long, String)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    // the leakage property: both ends of every near-dup pair share a split
    val ps = pairs.as[(Long, Long)].collect()
    assert(ps.nonEmpty)
    ps.foreach { case (a, b) =>
      assert(split(a)._2 == split(b)._2, s"pair ($a,$b) straddles splits")
    }
    // unclustered docs keep the plain per-doc assignment (same rule, rep = self)
    val clustered = clusters.select("doc_id").as[Long].collect().toSet
    val plain = TextAnalysis.splitAssign(docs)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    split.foreach { case (id, (rep, s)) =>
      if (!clustered(id)) {
        assert(rep == id && s == plain(id), s"singleton $id diverged")
      }
    }
  }

  test("topKIvfProbe: probing all cells equals brute force; recall is monotone in nprobe") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L)
    def s(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    def full(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Double)].collect().toSet
    val brute = s(Similarity.topKBrute(emb, ids, 5))
    val nCells = emb.select("label").distinct().count().toInt
    // nprobe = |cells| degenerates to brute force exactly — FULL rows,
    // so ranks and cosines are pinned, not just the neighbor set
    assert(full(Similarity.topKIvfProbe(emb, ids, 5, nCells)) ==
      full(Similarity.topKBrute(emb, ids, 5)))
    // more probes never lose a brute-force hit a narrower probe found
    val p1 = s(Similarity.topKIvfProbe(emb, ids, 5, 1))
    val p2 = s(Similarity.topKIvfProbe(emb, ids, 5, 2))
    assert((p1 & brute).subsetOf(p2 & brute),
      "widening the probe set must not lose true neighbors")
  }

  test("probed composed searches: full probe ≡ un-pruned SDC/ADC; hits monotone in nprobe") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L)
    val nCells = emb.select("label").distinct().count().toInt
    // over-provisioned probe degenerates to the un-pruned search
    // EXACTLY — full rows, so ranks and int64 distances are pinned,
    // not just the neighbor sets (the x95/x99 reachable-ceiling
    // discipline applied to both composed indexes)
    def full(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Long)].collect().toSet
    assert(full(Similarity.topKIvfSqProbed(emb, ids, 5, nCells)) ==
      full(Similarity.topKSq(emb, ids, 5)),
      "nprobe >= |cells| must equal un-pruned SDC bit-for-bit")
    assert(full(Similarity.topKIvfPqAdcProbed(emb, ids, 5, nCells)) ==
      full(Similarity.topKPqAdc(emb, ids, 5)),
      "nprobe >= |cells| must equal un-pruned ADC bit-for-bit")
    // monotone vs the un-pruned truth IN THE SAME METRIC: probed cell
    // sets are prefixes of one centroid ranking, so a truth member a
    // narrow probe found can only be displaced by globally-better
    // candidates — which are themselves truth members
    def s(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val sqTruth = s(Similarity.topKSq(emb, ids, 5))
    assert((s(Similarity.topKIvfSqProbed(emb, ids, 5, 1)) & sqTruth)
      .subsetOf(s(Similarity.topKIvfSqProbed(emb, ids, 5, 2)) & sqTruth),
      "widening the SQ probe set must not lose SDC-truth neighbors")
    val adcTruth = s(Similarity.topKPqAdc(emb, ids, 5))
    assert((s(Similarity.topKIvfPqAdcProbed(emb, ids, 5, 1)) & adcTruth)
      .subsetOf(
        s(Similarity.topKIvfPqAdcProbed(emb, ids, 5, 2)) & adcTruth),
      "widening the ADC probe set must not lose ADC-truth neighbors")
  }

  test("composed probe curves: ceiling reads exactly 1.0, recall monotone per query") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L)
    val nCells = emb.select("label").distinct().count().toInt
    // single-point equivalence needs no spec: the curve and the
    // single searches share sqProbedMulti/adcProbedMulti by
    // construction — what is pinned here is the curve's CONTENT: the
    // over-provisioned point equals the un-pruned truth (recall 1.0)
    // and recall never decreases as the probe set widens
    for (curve <- Seq(
      Similarity.sqProbedRecallCurve(emb, ids, 5, Seq(1, 2, nCells)),
      Similarity.adcProbedRecallCurve(emb, ids, 5, Seq(1, 2, nCells)))) {
      val rows = curve.select("nprobe", "q_id", "recall")
        .as[(Long, Long, Double)].collect()
      assert(rows.length == 9)
      assert(rows.filter(_._1 == nCells.toLong).forall(_._3 == 1.0),
        s"over-provisioned probe must hit the un-pruned truth exactly: " +
          rows.filter(_._1 == nCells.toLong).mkString(", "))
      rows.groupBy(_._2).foreach { case (q, rs) =>
        val byProbe = rs.sortBy(_._1).map(_._3)
        assert(byProbe.zip(byProbe.tail).forall { case (a, b) => a <= b },
          s"recall not monotone for query $q: ${byProbe.mkString(", ")}")
      }
    }
  }

  test("kmeansConverge reaches a fixed point and reports iterations") {
    import spark.implicits._
    val (assign, iters) = Similarity.kmeansConverge(emb, maxIter = 20)
    assert(iters >= 1 && iters <= 20)
    // converged means one more step moves nothing
    val relabeled = emb.drop("label")
      .join(assign.select(col("vec_id"), col("label").cast("int").as("label")),
        "vec_id")
    assert(Similarity.kmeansIter(relabeled).filter(col("moved")).count() == 0L)
    // every vector keeps exactly one label
    assert(assign.count() == emb.count())
    assert(assign.select("vec_id").distinct().count() == emb.count())
  }

  test("annRecall is 1.0 when every vector shares one IVF cell") {
    import spark.implicits._
    // single-cell corpus: IVF prunes nothing, so the pruned search IS
    // brute force and recall must be exactly 1 for every query
    val one = emb.withColumn("label", lit(0))
    val got = Similarity.annRecall(one, Seq(0L, 1L), 3)
      .select("recall").as[Double].collect().toSeq
    assert(got == Seq(1.0, 1.0))
  }

  test("mixtureWeightsCapped at 100% degenerates to mixtureWeights exactly") {
    import spark.implicits._
    val w = SparkEntry.fixtureSourceWeights(docs)
    val down = TextAnalysis.mixtureWeights(docs, w)
      .select("source", "weight", "n_docs", "n_tokens", "t_star",
        "keep_tokens", "rate")
      .as[(String, Long, Long, Long, Long, Long, Double)].collect().toSet
    val capped = TextAnalysis.mixtureWeightsCapped(docs, w, epochCapPct = 100L)
      .select("source", "weight", "n_docs", "n_tokens", "t_star",
        "keep_tokens", "rate")
      .as[(String, Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(capped == down)
    // and the realization columns are consistent at any cap
    TextAnalysis.mixtureWeightsCapped(docs, w, SparkEntry.MixtureEpochCapPct)
      .select("n_tokens", "cap_tokens", "keep_tokens", "n_epochs", "remainder")
      .as[(Long, Long, Long, Long, Long)].collect()
      .foreach { case (toks, cap, keep, epochs, rem) =>
        assert(keep <= cap && cap == toks * SparkEntry.MixtureEpochCapPct / 100)
        assert(keep == epochs * toks + rem && rem >= 0 && rem < toks)
      }
  }

  test("mixtureApplyCapped: realized tokens land in [keep, keep+max); 100% ≡ mixtureApply") {
    import spark.implicits._
    val w = SparkEntry.fixtureSourceWeights(docs)
    val plan = TextAnalysis.mixtureWeightsCapped(docs, w,
      SparkEntry.MixtureEpochCapPct)
      .select("source", "keep_tokens").as[(String, Long)].collect().toMap
    val out = TextAnalysis.mixtureApplyCapped(docs, w,
      SparkEntry.MixtureEpochCapPct, bucketDocs = 64L)
      .select("source", "n_tokens", "n_copies")
      .as[(String, Long, Long)].collect()
    assert(out.exists(_._3 >= 2), "fixture cap should force real upsampling")
    val bySource = out.groupBy(_._1)
    assert(bySource.keySet == plan.keySet)
    bySource.foreach { case (src, rows) =>
      val realized = rows.map(r => r._2 * r._3).sum
      val maxDoc = rows.map(_._2).max
      assert(realized >= plan(src) && realized < plan(src) + maxDoc,
        s"$src realized $realized outside [${plan(src)}, ${plan(src)} + $maxDoc)")
    }
    // cap 100: the kept set, cumulative sums, and copy counts collapse
    // to the downsample executor
    val at100 = TextAnalysis.mixtureApplyCapped(docs, w, 100L, bucketDocs = 64L)
      .select("doc_id", "source", "n_tokens", "cum", "n_copies")
      .as[(Long, String, Long, Long, Long)].collect()
    assert(at100.forall(_._5 == 1L))
    val down = TextAnalysis.mixtureApply(docs, w, bucketDocs = 64L)
      .select("doc_id", "source", "n_tokens", "cum")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(at100.map(t => (t._1, t._2, t._3, t._4)).toSet == down)
  }

  test("mixtureWeights fails loudly when a weighted source has no documents") {
    import spark.implicits._
    // a typo'd source name in the target mixture must not be silently
    // dropped (that would renormalize W over the remaining sources and
    // ship a skewed plan as valid)
    val d = Seq(("a", "t t"), ("b", "t")).toDF("source", "text")
    val typo = Seq(("a", 1L), ("bb", 2L)).toDF("source", "weight")
    val e = intercept[Exception] {
      TextAnalysis.mixtureWeights(d, typo).collect()
    }
    assert(e.getMessage.contains("has no documents") ||
      Option(e.getCause).exists(_.getMessage.contains("has no documents")))
  }

  test("annRecallCurve: monotone per query, ceiling point is brute (recall 1.0)") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L)
    val curve = Similarity.annRecallCurve(emb, ids, 5, SparkEntry.RecallCurveProbes)
      .select("nprobe", "q_id", "n_brute", "n_hit", "recall")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(curve.length == SparkEntry.RecallCurveProbes.length * ids.length)
    // recall non-decreasing in nprobe for every query: more probes only
    // add candidates, and top-k over a superset only improves
    curve.groupBy(_._2).values.foreach { rows =>
      val byProbe = rows.sortBy(_._1).map(_._5)
      assert(byProbe.zip(byProbe.tail).forall { case (a, b) => a <= b },
        s"non-monotone recall: ${rows.toSeq}")
    }
    // the over-provisioned probe count covers every cell ⇒ brute force
    assert(curve.filter(_._1 == SparkEntry.RecallCurveProbes.last.toLong)
      .forall(_._5 == 1.0))
    // each curve point is exactly the single-point audit at that nprobe
    SparkEntry.RecallCurveProbes.foreach { p =>
      val point = Similarity.annRecall(emb, ids, 5, Some(p))
        .select("q_id", "n_hit").as[(Long, Long)].collect().toSet
      assert(curve.filter(_._1 == p.toLong).map(r => (r._2, r._4)).toSet == point)
    }
  }

  test("kmeansConverge reliable checkpointing matches the local-checkpoint path") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val (fast, itFast) = Similarity.kmeansConverge(emb, maxIter = 20)
    val (rel, itRel) =
      Similarity.kmeansConverge(emb, maxIter = 20, reliable = true)
    assert(itFast == itRel)
    assert(fast.select("vec_id", "label").as[(Long, Int)].collect().toSet ==
      rel.select("vec_id", "label").as[(Long, Int)].collect().toSet)
  }

  test("learn-then-search: one Lloyd step over corrupted cells recovers recall") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L)
    // corrupt 1 in 8 cell assignments — the given-cell IVF search now
    // scans the WRONG cell for the corrupted queries/neighbors; a
    // single Lloyd relabel (the x94 composition) must win back recall,
    // which is the point of learning the cells before searching them
    val nCells = emb.select(max("label")).as[Int].head() + 1
    val corrupted = emb.withColumn("label",
      when(col("vec_id") % 8 === 0,
        ((col("label") + 1) % nCells).cast("int"))
        .otherwise(col("label")))
    def totalHits(e: org.apache.spark.sql.DataFrame): Long =
      Similarity.annRecall(e, ids, 5).agg(sum("n_hit")).as[Long].head()
    val given = totalHits(corrupted)
    val relabeled = corrupted.drop("label").join(
      Similarity.kmeansIter(corrupted)
        .select(col("vec_id"), col("new_label").cast("int").as("label")),
      "vec_id")
    val learned = totalHits(relabeled)
    assert(learned >= given,
      s"learned-cell recall $learned < given-cell recall $given")
    // and the repair is visible, not vacuous: the corrupted search must
    // actually have lost ground for the comparison to mean anything
    assert(given < ids.length * 5L,
      "fixture corruption did not degrade the given-cell search")
  }

  test("curationLedger: a held representative cannot absorb the slot — " +
    "its near-dups read contaminated, not duplicate") {
    import spark.implicits._
    // three identical docs: 0 is held, 1 and 2 are candidates. Among
    // NON-HELD survivors the representative is 1 → doc 1 falls to the
    // contamination gate (it shares every shingle with held doc 0);
    // doc 2 is 1's duplicate. The pre-fix rule made doc 1 'duplicate'
    // of a representative that never enters the corpus
    val t = "alpha beta gamma delta epsilon"
    val d = Seq((0L, t), (1L, t), (2L, t))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val clusters = Dedup.nearDupClusters(
      Dedup.jaccardPairs(d, 0.5, 10).select("doc_a", "doc_b"))
    val got = TextAnalysis.curationLedger(d, 1.0, clusters,
      col("doc_id") === 0)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "contaminated", 2L -> "duplicate"))
  }

  test("mixture→pack composition: gapless token stream over the materialized epochs") {
    import spark.implicits._
    val out = SparkEntry.queries("x104_mixture_pack")(spark, sf)
      .select("epoch", "doc_id", "n_tokens", "start_tok", "first_seq", "last_seq")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out.exists(_._1 >= 1), "cap should materialize repeat epochs")
    // the packed stream is a gapless concatenation in (epoch, doc_id)
    // order: each doc starts exactly where the previous one ended
    out.foldLeft(0L) { case (cursor, (_, _, n, start, first, last)) =>
      assert(start == cursor, s"gap at start_tok $start, expected $cursor")
      assert(first == start / 512 && last == (start + n - 1) / 512)
      cursor + n
    }
    // total packed tokens == the executor's realized token count
    val w = SparkEntry.fixtureSourceWeights(docs)
    val realized = TextAnalysis.mixtureApplyCapped(docs, w,
      SparkEntry.MixtureEpochCapPct, bucketDocs = 64L)
      .agg(sum(col("n_tokens") * col("n_copies"))).as[Long].head()
    assert(out.map(_._3).sum == realized)
  }

  test("incremental curate: reprocess set is exactly added ∪ changed (churn-bounded)") {
    import spark.implicits._
    // the x102 synthesis: every 10th id deleted and reborn at +1e6
    // (an add), every 7th survivor revised (a change) — incremental
    // work must be bounded by this churn, never by corpus size
    val newSnap = docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      .unionByName(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val reproc = Dedup.snapshotDiff(docs, newSnap)
      .filter(col("status").isin("added", "changed"))
      .select("doc_id").as[Long].collect().toSet
    val ids = docs.select("doc_id").as[Long].collect().toSet
    val expect = ids.filter(_ % 10 == 0).map(_ + 1000000L) ++
      ids.filter(id => id % 10 != 0 && id % 7 == 0)
    assert(reproc == expect)
    // the ledger over the increment decides every reprocess doc except
    // the held ones — one decision per candidate, nothing from the
    // unchanged bulk
    val ledger = SparkEntry.queries("x102_incremental_curate")(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    assert(ledger == reproc.filterNot(_ % 20 == 0))
  }

  test("curationLedger: closure member with NO direct held overlap is kept " +
    "once the held representative steps aside") {
    import spark.implicits._
    // cluster {0 held, 1, 2} as a transitive chain: doc 1 shares no
    // shingle with held doc 0 (doc 2 bridges them). With the held doc
    // barred from the representative slot, doc 1 becomes rep and is
    // KEPT — membership, not just attribution, deliberately follows
    // the DIRECT-overlap contamination policy; doc 2 is doc 1's
    // duplicate (gate 2 fires before its own direct contamination)
    val d = Seq((0L, "p q r s"), (1L, "u v w x"), (2L, "p q r s u v w x"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val clusters = Seq((0L, 0L), (1L, 0L), (2L, 0L)).toDF("doc_id", "cluster")
    val got = TextAnalysis.curationLedger(d, 0.5, clusters,
      col("doc_id") === 0)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "kept", 2L -> "duplicate"))
  }

  test("ledgerDrift: threshold tightening reads as a reason SHIFT, not growth") {
    import spark.implicits._
    val clusters = Dedup.nearDupClusters(
      Dedup.jaccardPairs(docs, 0.5, 10).select("doc_a", "doc_b"))
    val held = col("doc_id") % 20 === 0
    val loose = TextAnalysis.curationLedger(docs, 2.0, clusters, held)
    val tight = TextAnalysis.curationLedger(docs, 4.0, clusters, held)
    val drift = TextAnalysis.ledgerDrift(loose, tight)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6))).toMap
    // identical pool on both sides: per-reason deltas sum to zero,
    // and every (entered, left, delta) triple is internally consistent
    assert(drift.values.map(_._5).sum == 0L)
    drift.foreach { case (r, (nb, na, entered, left, delta)) =>
      assert(delta == na - nb && delta == entered - left, s"reason $r")
    }
    // tightening the bar can only grow low_quality and shrink the rest
    assert(drift("low_quality")._5 > 0)
    assert(drift("kept")._5 <= 0 && drift("duplicate")._5 <= 0 &&
      drift("contaminated")._5 <= 0)
    // cross-check against independently computed ledgers
    val lm = loose.as[(Long, String)].collect().toMap
    val tm = tight.as[(Long, String)].collect().toMap
    assert(drift("low_quality")._2 ==
      tm.values.count(_ == "low_quality").toLong)
    assert(drift("low_quality")._3 ==
      tm.count { case (id, r) => r == "low_quality" && lm(id) != r }.toLong)
  }

  test("sourceDataCard: hand fixture — counts, extremes, densities") {
    import spark.implicits._
    val d = Seq(
      (1L, "s1", "a b c"),                          // 3 toks, short
      (2L, "s1", "mail x@y.io now go"),             // 4 toks, short, 1 email
      (3L, "s1", "one two three four five six"),    // 6 toks
      (4L, "s2", "ping 10.0.0.1 and +1-555-1234 ok")) // 5 toks, ip+phone
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.sourceDataCard(d)
      .as[(String, Long, Long, Long, Long, Double, Long, Double, Long, Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("s1", 3L, 13L, 3L, 6L, 13.0 / 3.0, 2L, 2.0 / 3.0, 1L, 1L, 1.0 / 3.0),
      ("s2", 1L, 5L, 5L, 5L, 5.0, 0L, 0.0, 1L, 2L, 1.0)))
  }

  test("shingle-less docs are stateless admitted passengers in BOTH tagged gates") {
    import spark.implicits._
    // the audited pipe floats a quality-dropped doc through the gate
    // with its text EMPTIED (CorpusIO.qualityAudited) — the cost
    // contract the pipe relies on: zero state rows and zero probes,
    // every passenger admitted. Mixed empty and sub-shingle texts,
    // with exact repeats that only a SHINGLED path could reject.
    val rows = (0L until 40L).map(i => (i, if (i % 2 == 0) "" else "two words"))
    for (ttl <- Seq(false, true)) {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      Dedup.useRocksDbStateStore(ss)
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)](ss)
      val tagged =
        if (ttl) Dedup.streamingNearDupVerdictsTaggedTtl(
          ms.toDS(), 0.5, 1000000L)(_._2, _._1)
        else Dedup.streamingNearDupVerdictsTagged(ms.toDS(), 0.5)(_._2, _._1)
      val q = tagged.map(v => (v._1, v._2)).toDF("doc_id", "reason")
        .writeStream.outputMode("append").format("memory")
        .queryName(s"gate_passengers_$ttl").start()
      try rows.grouped(20).foreach { c =>
        ms.addData(c.toSeq); q.processAllAvailable()
      } catch { case e: Throwable =>
        try q.stop() catch { case s2: Throwable => e.addSuppressed(s2) }
        throw e
      }
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).toSeq
      q.stop()
      assert(stateRows.forall(_ == 0L),
        s"ttl=$ttl: shingle-less docs must create NO state anywhere " +
          s"in the chain, got per-op rows $stateRows")
      val got = ss.table(s"gate_passengers_$ttl")
        .select("doc_id", "reason").as[(Long, String)].collect()
      assert(got.length == rows.length &&
        got.forall(_._2 == Dedup.ReasonAdmitted),
        s"ttl=$ttl: every passenger must flow out admitted")
    }
  }

  test("streamingNearDupGate: kept set equals the batch smaller-id verified-neighbor filter") {
    import spark.implicits._
    val rows = docs.select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1)
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    Dedup.useRocksDbStateStore(ss)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](ss)
    val q = Dedup.streamingNearDupGate(ms.toDS(), 0.5)(_._2, _._1)
      .toDF("doc_id", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("gate_vs_batch").start()
    // three id-RANGE chunks: cross-batch rejection exercises state
    rows.grouped(rows.length / 3 + 1).foreach { c =>
      ms.addData(c.toSeq); q.processAllAvailable()
    }
    // the scale claims as observed metrics: exactly THREE keyed-state
    // ops (band-bucket candidates + doc-keyed shingle store + per-doc
    // reduce), and the reduce is genuinely STATELESS — zero state rows
    // across the whole run (state.update is never called), so its
    // state store can never grow; the other two hold the seen band
    // buckets and the once-per-doc shingle arrays.
    val ops = q.lastProgress.stateOperators
    assert(ops.length == 3,
      s"gate must plan exactly three keyed-state ops, got ${ops.length}")
    assert(ops.map(_.numRowsTotal).count(_ == 0L) == 1,
      s"exactly one op (the reduce) is stateless: ${ops.map(_.numRowsTotal).toSeq}")
    assert(ops.map(_.numRowsTotal).count(_ > 0L) == 2,
      s"band buckets AND the doc store must hold rows: ${ops.map(_.numRowsTotal).toSeq}")
    q.stop()
    val kept = ss.table("gate_vs_batch").select("doc_id")
      .as[Long].collect().toSet
    // batch form of "has a previously seen verified near-dup" under
    // id-ordered arrival: appears as doc_b of a verified LSH pair
    val rejected = Dedup.minhashNearDups(docs, 0.5)
      .select("doc_b").as[Long].collect().toSet
    assert(rejected.nonEmpty, "fixture should reject some near-dups")
    assert(kept == rows.map(_._1).toSet -- rejected)
  }

  test("gate band keys match the batch MinHash banding bit-for-bit") {
    import spark.implicits._
    // DataFrame side: the exact lshCandidatePairs banding spelling
    val sig = Dedup.withMinhashSignature(
      Dedup.shingled(docs).filter(size(col("sh")) > 0))
    val nBands = 12 / 3
    val dfBands = sig.select(col("doc_id"),
      explode(array((0 until nBands).map { j =>
        concat_ws("|", lit(j.toString),
          md5(concat_ws("|", (0 until 3).map(o => col(s"h${j * 3 + o}")): _*)))
      }: _*)).as("key"))
      .as[(Long, String)].collect().toSet
    // JVM side: the gate's per-row construction over the same texts
    val local = docs.select("doc_id", "text").as[(Long, String)].collect()
      .flatMap { case (id, t) =>
        Dedup.localShinglesAndBands(t, 12, 3)._2.map(b => (id, b))
      }.toSet
    assert(dfBands.nonEmpty && dfBands == local,
      "JVM band keys must equal the DataFrame construction")
  }

  test("gate: shingle-less docs pass ungated; in-batch near-dup keeps the min ord; state rejects across batches") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"tok$i").mkString(" ")
    val b0 = Seq((1L, "x y"), (2L, "x y"), (10L, base),
      (11L, base + " tail42"), (20L, other))
    val b1 = Seq((30L, base + " tail43"), (31L, "x y"))
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    Dedup.useRocksDbStateStore(ss)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](ss)
    val q = Dedup.streamingNearDupGate(ms.toDS(), 0.5)(_._2, _._1)
      .toDF("doc_id", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("gate_semantics").start()
    ms.addData(b0); q.processAllAvailable()
    ms.addData(b1); q.processAllAvailable()
    q.stop()
    val kept = ss.table("gate_semantics").select("doc_id")
      .as[Long].collect().toSet
    // 1, 2, 31: shingle-less (2 words < 3-gram width) — ungated even
    // as exact duplicates of each other; 10: min of its group; 11:
    // in-batch near-dup of 10; 30: cross-batch near-dup via state;
    // 20: unrelated
    assert(kept == Set(1L, 2L, 10L, 20L, 31L))
  }

  test("gate state stores each doc's shingle set exactly ONCE — measured, not asserted in prose") {
    import spark.implicits._
    // the round-12 layout's state cost, read back through the
    // state-store source so the bound SCALE §8d quotes is a measured
    // constant: the doc-keyed store holds every shingled doc's 56-bit
    // hash array exactly once (1×, down from the retired per-bucket
    // layout's k/r = 4 copies), the band buckets hold only ords (one
    // 8-byte long per doc per band), and the reduce holds nothing
    val texts = Seq(
      (1L, (1 to 40).map(i => s"tok$i").mkString(" ")),
      (2L, (50 to 75).map(i => s"alt$i").mkString(" ")),
      (3L, "aa bb"), // shingle-less: must create NO state at all
      (4L, (80 to 130).map(i => s"third$i").mkString(" ")))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-gstate")
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    Dedup.useRocksDbStateStore(ss)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](ss)
    val q = Dedup.streamingNearDupGate(ms.toDS(), 0.5)(_._2, _._1)
      .toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .format("memory").queryName("gate_state_bytes").start()
    ms.addData(texts.take(2)); q.processAllAvailable()
    ms.addData(texts.drop(2)); q.processAllAvailable()
    q.stop()
    // operator ids are assigned by the planner, not plan order — read
    // all three stores and classify by their measured shape (both
    // array-state stores share the value schema, so shape IS the id)
    def store(opId: Int) = {
      def base = ss.read.format("statestore")
        .option("path", ckpt.toString).option("operatorId", opId.toString)
      scala.util.Try {
        val st = base.load()
        (st.count(),
          st.select(coalesce(sum(size(col("value.groupState.value"))),
            lit(0)).cast("long")).as[Long].head())
      }.orElse(scala.util.Try {
        // the transformWithState band op: a named ListState read back
        // flattened — one row per (bucket, ord) element, so buckets =
        // distinct keys and the ord-long payload = element count
        val st = base.option("stateVarName", "ords").load()
        (st.select(col("key")).distinct().count(), st.count())
      }).getOrElse((0L, 0L))
    }
    val shapes = (0 to 2).map(i =>
      scala.util.Try(store(i)).getOrElse((0L, 0L))).sorted
    // irreducible: each shingled doc's distinct-hash count, once
    val perDoc = texts.map { case (_, t) =>
      Dedup.localShinglesAndBands(t, 12, 3)._1.length.toLong
    }
    assert(perDoc(2) == 0L, "fixture: doc 3 must be shingle-less")
    val irreducible = perDoc.sum
    // expected shapes, sorted by (rows, longs):
    //  - the stateless reduce: 0 rows
    //  - the doc-keyed shingle store: 3 rows (one per SHINGLED doc —
    //    the tiny doc creates none), payload == irreducible (the 1×)
    //  - the band buckets: 12 rows (3 docs × 4 bands, no collisions),
    //    payload == 12 ord longs (8 B per doc per band)
    assert(shapes == Seq((0L, 0L), (3L, irreducible), (12L, 12L)),
      s"gate state moved off the 1×-shingles + ords-only layout: " +
        s"$shapes (irreducible=$irreducible)")
    new scala.reflect.io.Directory(ckpt.toFile).deleteRecursively()
    ()
  }

  test("gate TTL state is the unbounded gate's 1×-shingles + ords-only layout — measured") {
    import spark.implicits._
    // the round-14 port: the TTL gate runs the SAME 3-op state layout
    // as the unbounded gate (band buckets hold only ords, the
    // doc-keyed store holds each shingle set exactly once, the reduce
    // holds nothing) — k/r = 4× less state than the retired
    // per-bucket-copy design. Horizon wider than the fixture so
    // nothing evicts during the measurement; the eviction spec below
    // pins the other half (state → 0 past the horizon).
    val texts = Seq(
      (1L, (1 to 40).map(i => s"tok$i").mkString(" ")),
      (2L, (50 to 75).map(i => s"alt$i").mkString(" ")),
      (3L, "aa bb"), // shingle-less: must create NO state at all
      (4L, (80 to 130).map(i => s"third$i").mkString(" ")))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tstate")
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    Dedup.useRocksDbStateStore(ss)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](ss)
    val q = Dedup.streamingNearDupGateTtl(
        ms.toDS(), 0.5, 1000000000L * 1000000L)(_._2, _._1)
      .toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .format("memory").queryName("gate_ttl_state_bytes").start()
    ms.addData(texts.take(2)); q.processAllAvailable()
    ms.addData(texts.drop(2)); q.processAllAvailable()
    q.stop()
    // operator ids are planner-assigned — classify the three stores
    // by measured shape, reading each through the spelling its
    // operator type supports (Try cascade, as the unbounded spec)
    def store(opId: Int): (Long, Long) = {
      def base = ss.read.format("statestore")
        .option("path", ckpt.toString).option("operatorId", opId.toString)
      scala.util.Try {
        // the stateless reduce (flatMapGroupsWithState, never writes)
        val st = base.load()
        (st.count(),
          st.select(coalesce(sum(size(col("value.groupState.value"))),
            lit(0)).cast("long")).as[Long].head())
      }.orElse(scala.util.Try {
        // the band op: named ListState, flattened one row per element
        val st = base.option("stateVarName", "ords").load()
        (st.select(col("key")).distinct().count(), st.count())
      }).orElse(scala.util.Try {
        // the doc store: named ValueState holding the hash array
        val st = base.option("stateVarName", "sh").load()
        val longs = scala.util.Try(
          st.select(coalesce(sum(size(col("value.value"))), lit(0))
            .cast("long")).as[Long].head())
          .getOrElse(st.select(coalesce(sum(size(col("value"))), lit(0))
            .cast("long")).as[Long].head())
        (st.count(), longs)
      }).getOrElse((0L, 0L))
    }
    val shapes = (0 to 2).map(i =>
      scala.util.Try(store(i)).getOrElse((0L, 0L))).sorted
    val perDoc = texts.map { case (_, t) =>
      Dedup.localShinglesAndBands(t, 12, 3)._1.length.toLong
    }
    assert(perDoc(2) == 0L, "fixture: doc 3 must be shingle-less")
    val irreducible = perDoc.sum
    // same expected shapes as the unbounded spec: reduce 0, doc store
    // 3 rows / irreducible longs (the 1×), band 12 rows / 12 ords
    assert(shapes == Seq((0L, 0L), (3L, irreducible), (12L, 12L)),
      s"TTL gate state moved off the 1×-shingles + ords-only layout: " +
        s"$shapes (irreducible=$irreducible)")
    new scala.reflect.io.Directory(ckpt.toFile).deleteRecursively()
    ()
  }

  test("gate TTL: rejects within horizon, re-admits beyond it, and evicts state") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val sec = 1000000L // ords are event-time µs; seconds keep the
    val horizon = 100L * sec // timeout mechanics in real ms territory
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    Dedup.useRocksDbStateStore(ss)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](ss)
    val q = Dedup.streamingNearDupGateTtl(ms.toDS(), 0.5, horizon)(_._2, _._1)
      .toDF("ord", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("gate_ttl").start()
    // batch 1: 10s owner admitted, 11s in-batch near-dup rejected
    ms.addData(Seq((10L * sec, base), (11L * sec, base + " tail42")))
    q.processAllAvailable()
    // batch 2: 50s — within horizon of 10s via state → rejected
    ms.addData(Seq((50L * sec, base + " tail43")))
    q.processAllAvailable()
    // batch 3: 200s — nearest seen near-dup is 50s, gap 150s > 100s
    // → RE-ADMITTED (the TTL semantic)
    ms.addData(Seq((200L * sec, base + " tail44")))
    q.processAllAvailable()
    // batch 4: 260s — within horizon of the re-admitted 200s → rejected
    // (state holds every SEEN doc in-horizon, admitted or not)
    ms.addData(Seq((260L * sec, base + " tail45")))
    q.processAllAvailable()
    val bandRows = q.lastProgress.stateOperators.map(_.numRowsTotal).max
    // batches 5/6: SHINGLE-LESS docs far in the future — they create
    // no state of their own but advance the watermark past every
    // bucket's timeout, so batch 6's timeout sweep must leave the
    // band-state store EMPTY (shingle-less pass-through + eviction,
    // pinned together)
    ms.addData(Seq((10000L * sec, "zz yy")))
    q.processAllAvailable()
    ms.addData(Seq((10001L * sec, "aa bb")))
    q.processAllAvailable()
    val afterRows = q.lastProgress.stateOperators.map(_.numRowsTotal).max
    q.stop()
    val kept = ss.table("gate_ttl").select("ord").as[Long].collect().toSet
    assert(kept == Set(10L * sec, 200L * sec, 10000L * sec, 10001L * sec),
      s"TTL gate verdicts wrong: kept $kept")
    assert(bandRows > 0L && afterRows == 0L,
      s"event-time timeout must evict every idle bucket: $bandRows -> $afterRows")
  }

  test("the TTL chain starts under Spark's DEFAULT static correctness checker — no opt-out") {
    import spark.implicits._
    // the retired flatMapGroupsWithState layout tripped the
    // watermark-plus-chained-stateful rule and needed the (now
    // retired) withChainedStatefulOverride scope; the round-14
    // transformWithState chain declares its event-time flow
    // explicitly and must pass the checker AT ITS DEFAULT — this pin
    // fails loudly if a future Spark version re-flags the chain (the
    // remedy then is a scoped opt-out, not a silent session-wide one)
    val key = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    Dedup.useRocksDbStateStore(ss)
    assert(ss.conf.get(key) == "true",
      s"fixture: the checker must be at its default, got ${ss.conf.get(key)}")
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](ss)
    val q = Dedup.streamingNearDupGateTtl(ms.toDS(), 0.5, 1000000L)(_._2, _._1)
      .toDF("ord", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("gate_default_checker").start()
    ms.addData(Seq((1000000L, "aa bb cc")))
    q.processAllAvailable()
    ms.addData(Seq((2000000L, "dd ee ff")))
    q.processAllAvailable()
    q.stop()
    assert(ss.table("gate_default_checker").count() == 2L)
  }

  test("gate TTL: late arrivals surface in nLateDroppedRows instead of vanishing silently") {
    import spark.implicits._
    val sec = 1000000L
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    Dedup.useRocksDbStateStore(ss)
    val stats = new graft.streaming.CorpusIngestStats
    ss.streams.removeListener(stats)
    ss.streams.addListener(stats)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](ss)
    val q = Dedup.streamingNearDupGateTtl(ms.toDS(), 0.5, 100L * sec)(_._2, _._1)
      .toDF("ord", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("gate_late").start()
    stats.bind(q.runId)
    // batch 1 advances the watermark to ~200s; batch 2 plants ONE
    // genuinely-late shingle-less doc (exactly one band row, so the
    // counter's unit is clean) next to a live one
    ms.addData(Seq((200L * sec, "live one")))
    q.processAllAvailable()
    ms.addData(Seq((5L * sec, "late doc"), (300L * sec, "also live")))
    q.processAllAvailable()
    q.stop()
    // the late doc vanished from the OUTPUT (the documented contract
    // failure mode)...
    val kept = ss.table("gate_late").select("ord").as[Long].collect().toSet
    assert(kept == Set(200L * sec, 300L * sec),
      s"late doc must be dropped by the watermark, kept: $kept")
    // ...but the OPERATOR sees the volume: exactly its one band row,
    // attributed to late-drop, not inferred from an in-out diff
    val deadline = System.currentTimeMillis() + 20000
    def lateTotal() = stats.toDF(ss)
      .agg(org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.sum("nLateDroppedRows"),
        org.apache.spark.sql.functions.lit(0L)))
      .as[Long].head()
    var t = lateTotal()
    while (t < 1L && System.currentTimeMillis() < deadline) {
      Thread.sleep(200); t = lateTotal()
    }
    ss.streams.removeListener(stats)
    assert(t == 1L, s"late-drop telemetry did not reconcile: $t")
  }

  test("gate hot-bucket circuit breaker: the bucket freezes at the cap, verdicts on non-hot docs unchanged") {
    import spark.implicits._
    val hot = (1 to 40).map(i => s"hot$i").mkString(" ")
    val cold = (100 to 140).map(i => s"cold$i").mkString(" ")
    // drive each gate over one boilerplate storm (10 identical docs —
    // they share all 4 band buckets) plus one unrelated doc, at
    // cap = 3: the first doc owns the buckets, docs 2-3 reject by
    // ordinary verification while the buckets grow to the cap, docs
    // 4+ reject through the breaker with the buckets FROZEN at 3
    // ords each — measured through the band op's state rows — and
    // the unrelated doc's admission is untouched. On this corpus the
    // VERDICTS are identical to the uncapped gate (identical text
    // rejects either way), which is the point: the breaker changes
    // the cost, 12 stored ords instead of 40 and O(1) emission per
    // storm arrival instead of O(bucket).
    def drive(ttl: Boolean): (Set[Long], Long) = {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      Dedup.useRocksDbStateStore(ss)
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)](ss)
      val gated =
        if (ttl) Dedup.streamingNearDupGateTtl(ms.toDS(), 0.5,
          1000000000L * 1000000L, hotBucketCap = 3)(_._2, _._1)
        else Dedup.streamingNearDupGate(ms.toDS(), 0.5,
          hotBucketCap = 3)(_._2, _._1)
      val q = gated.toDF("ord", "text")
        .writeStream.outputMode("append").format("memory")
        .queryName("gate_breaker").start()
      ms.addData((0 until 10).map(i => (i.toLong, hot)) :+ (10L, cold))
      q.processAllAvailable()
      // a SECOND storm batch: every arrival hits the frozen buckets —
      // band state must not grow past the cap
      ms.addData((20 until 25).map(i => (i.toLong, hot)))
      q.processAllAvailable()
      val bandOrds = q.lastProgress.stateOperators
        .map(_.numRowsTotal).max
      q.stop()
      val kept = ss.table("gate_breaker").select("ord").as[Long]
        .collect().toSet
      (kept, bandOrds)
    }
    Seq(false, true).foreach { ttl =>
      val (kept, bandOrds) = drive(ttl)
      assert(kept == Set(0L, 10L),
        s"breaker (ttl=$ttl) verdicts wrong: kept $kept — the storm " +
          "owner and the unrelated doc must be admitted, nothing else")
      // 4 hot buckets frozen at 3 ords + the cold doc's 4 buckets ×
      // 1 ord = 16 band ords; the doc-keyed store adds one row per
      // stored doc (4 hot before freeze... exactly: docs 0,1,2 and
      // cold and (ttl) their four rows) — bound loosely: without the
      // breaker the two storms alone would store 15 docs × 4 = 60
      // band ords, so anything ≤ 30 proves the freeze
      assert(bandOrds <= 30L,
        s"breaker (ttl=$ttl) band state grew past the frozen cap: " +
          s"$bandOrds rows")
    }
  }

  test("TTL gate prune is watermark-sound: a reordered doc still rejects against an entry a newest-ord prune would have dropped") {
    import spark.implicits._
    // the round-14 prune dropped bucket entries by `newest − e >
    // horizon`, but Spark admits slightly-reordered rows above the
    // PREVIOUS batch's watermark — a doc in that ms-wide gap could
    // still be within horizon of a just-pruned entry, silently
    // ADMITTING a true near-dup. Construct exactly that arrival:
    //   e = (0, A)      owner
    //   f = (5500, B)   shares A's single k=3/r=3 band bucket at
    //                   exact jaccard < threshold (advances the
    //                   bucket's newest past e's horizon — the
    //                   newest-based prune would drop e here)
    //   o = (4800, A)   reordered but above the watermark; within
    //                   horizon of e → MUST reject
    // the (A, B) pair is found by search over a pool of texts that
    // share a 24-token prefix and differ in their 16-token tails:
    // every pair sits at exact jaccard 22/54 ≈ 0.41 < 0.5, and the
    // single k=3/r=3 band collides for a deterministic-but-sparse
    // subset of pairs — take the first one LSH itself reports.
    val base = (1 to 40).map(i => s"base$i")
    val cands = (1 to 300).map { i =>
      (i.toLong, (base.take(24) ++ (25 to 40).map(j => s"alt${i}_$j"))
        .mkString(" "))
    }
    val pool = cands.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val (pa, pb) = Dedup.lshCandidatePairs(pool, k = 3, r = 3)
      .orderBy("doc_a", "doc_b").as[(Long, Long)].head()
    val textA = cands(pa.toInt - 1)._2
    val textB = cands(pb.toInt - 1)._2
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    Dedup.useRocksDbStateStore(ss)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](ss)
    val q = Dedup.streamingNearDupGateTtl(ms.toDS(), 0.5, 5000L,
        k = 3, r = 3)(_._2, _._1)
      .toDF("ord", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("gate_ttl_reorder").start()
    ms.addData(Seq((0L, textA)))
    q.processAllAvailable() // watermark -> 999 ms
    ms.addData(Seq((5500L, textB))) // B admitted (gap 5500 > 5000);
    q.processAllAvailable() // watermark -> 1004 ms; e's expiry is
    // 1006 ms — still retained under the watermark inequality (a
    // newest-based prune would have rewritten [0, 5500] -> [5500])
    ms.addData(Seq((4800L, textA))) // event time 1004.8 ms > 1004 ms:
    q.processAllAvailable() // admitted by the late filter, within
    q.stop() // horizon of e (gap 4800) -> must probe e and reject
    val kept = ss.table("gate_ttl_reorder").select("ord").as[Long]
      .collect().toSet
    assert(kept == Set(0L, 5500L),
      s"kept $kept — the reordered near-dup at 4800 must reject " +
        "against the retained owner at 0 (jaccard(A,B) < threshold, " +
        "so only a pruned owner could explain an admission)")
  }

  test("armed breaker on the TTL gate is eviction-independent: identical verdicts under three eviction-lag schedules") {
    import spark.implicits._
    val hot = (1 to 40).map(i => s"hot$i").mkString(" ")
    val other = (100 to 140).map(i => s"spc$i").mkString(" ")
    val h = 1000000L // 1 s horizon (ords are event-time µs)
    // the cap margin: e1..e3 fill the bucket, o4 lands at live
    // occupancy 3 = cap (hot-reject fires), o5 arrives with every
    // earlier entry beyond its horizon — live occupancy 0, so o5
    // must be ADMITTED no matter how much aged state is still
    // RETAINED (the round-14 carve-out rejected it when eviction
    // lagged). Three drives vary only the batching, i.e. how far
    // eviction lags behind the data at o5's probe:
    //   A: everything in one batch (nothing evicted yet)
    //   B: o5 alone in a second batch (still nothing evicted)
    //   C: a spacer batch advances the watermark past e1..e3's
    //      expiry first (bucket fully evicted before o5)
    def drive(batches: Seq[Seq[(Long, String)]]): Set[Long] = {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      Dedup.useRocksDbStateStore(ss)
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)](ss)
      val q = Dedup.streamingNearDupGateTtl(ms.toDS(), 0.5, h,
          hotBucketCap = 3)(_._2, _._1)
        .toDF("ord", "text")
        .writeStream.outputMode("append").format("memory")
        .queryName("gate_ttl_cap_lag").start()
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      q.stop()
      ss.table("gate_ttl_cap_lag").select("ord").as[Long].collect().toSet
    }
    val storm = Seq((0L, hot), (10L, hot), (20L, hot), (30L, hot))
    val o5 = (6000000L, hot)
    val spacer = (3000000L, other)
    val a = drive(Seq(storm :+ o5))
    val b = drive(Seq(storm, Seq(o5)))
    val c = drive(Seq(storm, Seq(spacer), Seq(o5)))
    assert(a == Set(0L, 6000000L),
      s"drive A verdicts wrong: $a — owner admitted, 10/20 verified " +
        "rejects, 30 hot-rejected at the margin, 6000000 re-admitted")
    assert(b == a, s"verdicts depend on batching alone: $b vs $a")
    assert(c == a + spacer._1,
      s"verdicts depend on eviction lag: $c vs ${a + spacer._1}")
  }

  test("gate: a duplicate ord fails loudly instead of silently merging docs") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    Dedup.useRocksDbStateStore(ss)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](ss)
    val q = Dedup.streamingNearDupGate(ms.toDS(), 0.5)(_._2, _._1)
      .toDF("ord", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("gate_dup_ord").start()
    ms.addData(Seq((5L, base), (5L, base)))
    val e = intercept[Exception] { q.processAllAvailable() }
    try q.stop() catch { case _: Throwable => () }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("duplicate ord"))),
      s"expected the loud ord-uniqueness guard, got: $e")
    // CROSS-BATCH tie between two DISTINCT docs: the doc store finds
    // ord 9 re-arriving with a different shingle set — admitting the
    // second doc under the first's stored shingles would corrupt
    // every later verdict on that ord, so it must fail loudly too
    // (an identical-set re-arrival is indistinguishable from a batch
    // replay and flows through, which is harmless by construction)
    val other = (100 to 140).map(i => s"alt$i").mkString(" ")
    val ms2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](ss)
    val q2 = Dedup.streamingNearDupGate(ms2.toDS(), 0.5)(_._2, _._1)
      .toDF("ord", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("gate_dup_ord_xbatch").start()
    ms2.addData(Seq((9L, base)))
    q2.processAllAvailable()
    ms2.addData(Seq((9L, other)))
    val e2 = intercept[Exception] { q2.processAllAvailable() }
    try q2.stop() catch { case _: Throwable => () }
    assert(causes(e2).exists(c =>
      Option(c.getMessage).exists(_.contains("DIFFERENT shingle set"))),
      s"expected the cross-batch ord-tie guard, got: $e2")
  }

  test("compactIvfIndex: fragmented cells fold into a fresh generation; untouched cells' files carry over verbatim") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-anncpt")
    try {
      def parquets(d: java.io.File): Seq[java.io.File] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
          else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
        walk(d)
      }
      def snapshot(dir: String) = parquets(new java.io.File(dir))
        .map(f => (f.getPath, f.lastModified, f.length)).toSet
      Similarity.buildIvfSqIndex(emb, s"$root/sq")
      // two tagged appends fragment ONLY the touched cell (label 0) —
      // the other cells must stay single-dir so the
      // cost-∝-fragmentation pin below has untouched cells to watch
      val extra1 = emb.filter(col("vec_id") < 50L && col("label") === 0)
        .select((col("vec_id") + 200000L).as("vec_id"),
          col("embedding"), col("label"))
      val extra2 = emb.filter(col("vec_id") < 50L && col("label") === 0)
        .select((col("vec_id") + 300000L).as("vec_id"),
          col("embedding"), col("label"))
      Similarity.appendToIvfSqIndex(extra1, s"$root/sq", tag = "d1")
      Similarity.appendToIvfSqIndex(extra2, s"$root/sq", tag = "d2")
      assert(new java.io.File(s"$root/sq/gens").listFiles()
        .count(_.getName.startsWith("gen=")) == 3,
        "fixture must stage three generations (build + two appends)")
      val queries = emb.filter(col("vec_id").isin(0L, 1L, 2L))
        .select("vec_id", "embedding")
      def hits() = Similarity.searchIvfSq(spark, s"$root/sq", queries, 5,
          nprobe = 2)
        .as[(Long, Long, Long, Long)].collect().toSet
      val before = hits()
      val learned0 = snapshot(s"$root/sq/learned_v1")
      // untouched cells (every label but 0 lives only in gen=b1) must
      // not be read, rewritten or moved — compact cost ∝ fragmented
      // cells, never corpus (snapshot their files bit-for-bit)
      val untouched0 = parquets(new java.io.File(s"$root/sq/gens/gen=b1"))
        .filter(_.getParentFile.getName != "label=0")
        .map(f => (f.getPath, f.lastModified, f.length)).toSet
      assert(untouched0.nonEmpty, "fixture must have untouched cells")
      Similarity.compactIvfIndex(spark, s"$root/sq")
      // the published snapshot resolves each label to exactly one dir
      // with exactly one file; untouched cells' files carried over
      // VERBATIM (same path, mtime, length); learned tables
      // bit-untouched; content invariant
      val filesNow = Similarity.readIndexCodes(spark, s"$root/sq")
        .inputFiles.toSeq.map(_.stripPrefix("file:"))
      filesNow.groupBy(f => f.split('/').reverse.find(_.startsWith("label="))
          .get).foreach { case (l, fs) =>
        assert(fs.size == 1, s"cell $l still fragmented after compact: $fs")
      }
      assert(untouched0.subsetOf(filesNow.map { f =>
        val jf = new java.io.File(f)
        (jf.getPath, jf.lastModified, jf.length)
      }.toSet), "compact rewrote untouched cells — cost must be " +
        "∝ fragmentation, and carried-over files must be bit-identical")
      assert(snapshot(s"$root/sq/learned_v1") == learned0,
        "compact must not touch the learned tables")
      assert(hits() == before, "compaction must be content-invisible")
      // a second compact on the already-folded tree is a no-op: no
      // fragmented cells → no rewrite, no new version
      val v = Similarity.currentIndexVersion(spark, s"$root/sq")
      Similarity.compactIvfIndex(spark, s"$root/sq")
      assert(Similarity.currentIndexVersion(spark, s"$root/sq") == v,
        "compact of an unfragmented index must publish nothing")
      // null-label rows are refused AT WRITE TIME with the contract
      // spelled out — and because the failed staging was never
      // published, the index is untouched (snapshot isolation also
      // isolates failures)
      val eNull = intercept[Exception](
        Similarity.appendToIvfSqIndex(
          emb.filter(col("vec_id") === 1L)
            .select(lit(500000L).as("vec_id"), col("embedding"),
              lit(null).cast("int").as("label")),
          s"$root/sq", tag = "dnull"))
      def msgs(t: Throwable): String =
        if (t == null) "" else t.toString + msgs(t.getCause)
      assert(msgs(eNull).contains("null label"),
        s"null-label append must raise with the contract: $eNull")
      assert(hits() == before,
        "a failed append staged but never published — readers must " +
          "see the untouched snapshot")
    } finally {
      val _ = new scala.reflect.io.Directory(root.toFile).deleteRecursively()
    }
  }

  test("index reads are lock-free consistent snapshots: searches pinned before compact and retrain survive the publish") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-annsnap")
    // grace 0 pins the STRUCTURAL newest-two guarantee (the round-13
    // semantics) — the age floor on top of it has its own spec below
    spark.conf.set("spark.graft.index.manifestGraceMs", "0")
    try {
      val base = emb.filter(pmod(col("vec_id"), lit(5L)) =!= 4L)
      val rest = emb.filter(pmod(col("vec_id"), lit(5L)) === 4L)
      val queries = emb.filter(col("vec_id").isin(0L, 1L, 2L))
        .select("vec_id", "embedding")
      def search() = Similarity.searchIvfSq(spark, s"$root/sq", queries, 5,
        nprobe = 2)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, Long, Long, Long)].collect().toSet
      Similarity.buildIvfSqIndex(base, s"$root/sq")                  // v1
      Similarity.appendToIvfSqIndex(rest, s"$root/sq", tag = "d1")   // v2
      val expected = rows(search())
      // pin a search against v2, THEN let a compact publish v3: the
      // pinned plan's file list must stay complete and consistent —
      // retirement protects the newest TWO manifests' trees
      val pinned = search()
      Similarity.compactIvfIndex(spark, s"$root/sq")                 // v3
      assert(Similarity.currentIndexVersion(spark, s"$root/sq") == 3)
      assert(rows(pinned) == expected,
        "a search pinned before the compact must return the complete " +
          "pre-compact snapshot")
      assert(rows(search()) == expected, "compaction is content-invisible")
      // zero-downtime retrain: pin v3, REBUILD (new quantizer, new
      // learned tables) as v4 — the pinned search still completes
      // against v3's tree, new searches see the retrained index
      val pinned3 = search()
      Similarity.buildIvfSqIndex(emb, s"$root/sq")                   // v4
      assert(Similarity.currentIndexVersion(spark, s"$root/sq") == 4)
      assert(rows(pinned3) == expected,
        "a search pinned before the retrain must return the complete " +
          "pre-retrain snapshot")
      assert(rows(search()) ==
        rows(Similarity.topKIvfSqProbed(emb, Seq(0L, 1L, 2L), 5,
          nprobe = 2)),
        "post-retrain searches must serve the retrained index")
      // ... and the grace window is exactly one cycle: the NEXT writer
      // retires everything v4/v5 do not reference — the pre-retrain
      // generations and learned tables are reclaimed, not leaked
      val extra = emb.filter(col("vec_id") === 0L)
        .select(lit(700000L).as("vec_id"), col("embedding"), col("label"))
      Similarity.appendToIvfSqIndex(extra, s"$root/sq", tag = "d2")  // v5
      val top = new java.io.File(s"$root/sq").listFiles().map(_.getName)
      assert(top.count(_.startsWith("manifest_v")) == 2,
        s"only the newest two manifests may remain: ${top.toSeq}")
      assert(!top.contains("learned_v1"),
        "the retired quantizer's learned tables must be reclaimed")
      assert(top.contains("learned_v4"))
      val gens = new java.io.File(s"$root/sq/gens").listFiles()
        .map(_.getName).toSet
      assert(gens == Set("gen=b4", "gen=a5-d2"),
        s"pre-retrain generations must be reclaimed, got $gens")
    } finally {
      spark.conf.unset("spark.graft.index.manifestGraceMs")
      val _ = new scala.reflect.io.Directory(root.toFile).deleteRecursively()
    }
  }

  test("manifest retention has an age floor: back-to-back publishes cannot retire a young pinned snapshot") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-anngrace")
    try {
      val base = emb.filter(pmod(col("vec_id"), lit(5L)) =!= 4L)
      val queries = emb.filter(col("vec_id").isin(0L, 1L, 2L))
        .select("vec_id", "embedding")
      def search() = Similarity.searchIvfSq(spark, s"$root/sq", queries, 5,
        nprobe = 2)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, Long, Long, Long)].collect().toSet
      Similarity.buildIvfSqIndex(base, s"$root/sq")                  // v1
      val expected = rows(search())
      // pin a plan against v1, then publish THREE more versions in
      // quick succession — append + compact + retrain, the worst-case
      // daily-cron pairing squeezed into one instant. Under the
      // newest-two rule alone v1's tree would be retired at the third
      // publish; the default 15-minute age floor must keep every one
      // of these seconds-old snapshots alive, so the pinned plan
      // still collects bit-identically.
      val pinned = search()
      val extra = emb.filter(col("vec_id") === 0L)
        .select(lit(900000L).as("vec_id"), col("embedding"), col("label"))
      Similarity.appendToIvfSqIndex(extra, s"$root/sq", tag = "g1") // v2
      Similarity.compactIvfIndex(spark, s"$root/sq")                // v3
      Similarity.buildIvfSqIndex(base, s"$root/sq")                 // v4
      assert(Similarity.currentIndexVersion(spark, s"$root/sq") == 4)
      assert(rows(pinned) == expected,
        "a pinned search younger than the grace window must survive " +
          "any number of rapid publishes")
      // retention growth is bounded by the window: all four young
      // manifests are retained now (grace), and a writer entering
      // after the window expires retires everything the newest two
      // don't reference — proven at grace 0 by the snapshot spec
      val top = new java.io.File(s"$root/sq").listFiles().map(_.getName)
      assert(top.count(_.startsWith("manifest_v")) == 4,
        s"all in-grace manifests must be retained: ${top.toSeq}")
    } finally {
      val _ = new scala.reflect.io.Directory(root.toFile).deleteRecursively()
    }
  }

  test("manifest minting is create-exclusive: a held version refuses cleanly, a crashed claim heals by age") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-annmint")
    try {
      val base = emb.filter(pmod(col("vec_id"), lit(5L)) =!= 4L)
      Similarity.buildIvfSqIndex(base, s"$root/sq") // v1
      // another JVM's LIVE claim on v2: fresh mint marker, no
      // manifest — on the POSIX local FS the retired probe→rename
      // tripwire was weakest exactly here (rename overwrites), so
      // this is the prevention upgrade's home turf
      val mint = java.nio.file.Paths.get(s"$root/sq/_mint_v2")
      java.nio.file.Files.write(mint,
        "other-driver".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val day = emb.filter(col("vec_id") < 10L)
        .select((col("vec_id") + 910000L).as("vec_id"),
          col("embedding"), col("label"))
      val e = intercept[java.util.ConcurrentModificationException] {
        Similarity.appendToIvfSqIndex(day, s"$root/sq", tag = "mint1")
      }
      assert(e.getMessage.contains("minted right now"), e.getMessage)
      assert(Similarity.currentIndexVersion(spark, s"$root/sq") == 1,
        "the loser must publish nothing — one winner per version")
      // the claimant CRASHED: its marker ages past MintStaleMs with
      // no manifest — the same operation re-run heals the claim and
      // publishes (a crash cannot poison the version)
      assert(mint.toFile.setLastModified(
        System.currentTimeMillis() - Similarity.MintStaleMs - 60000L))
      Similarity.appendToIvfSqIndex(day, s"$root/sq", tag = "mint1")
      assert(Similarity.currentIndexVersion(spark, s"$root/sq") == 2)
      // the winner's marker now guards the published v2: a late
      // same-version minter refuses at the CLAIM, before any rename
      // could reach the published file
      val e2 = intercept[java.util.ConcurrentModificationException] {
        Similarity.publishManifestForSpec(spark, s"$root/sq", 2)
      }
      assert(e2.getMessage.contains("concurrent writer"), e2.getMessage)
    } finally {
      val _ = new scala.reflect.io.Directory(root.toFile).deleteRecursively()
    }
  }

  test("the mint lease is fenced: a claim healed away mid-publish aborts, staging deleted, successor untouched") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-annfence")
    try {
      val base = emb.filter(pmod(col("vec_id"), lit(5L)) =!= 4L)
      Similarity.buildIvfSqIndex(base, s"$root/sq") // v1
      val mint = java.nio.file.Paths.get(s"$root/sq/_mint_v2")
      // simulate the unfenced-lease hazard: this writer pauses past
      // MintStaleMs between claim and rename; a successor heals the
      // claim away and owns the version when the pause ends. Without
      // the pre-rename ownership fence, the paused writer's rename
      // would silently overwrite whatever the successor publishes.
      // (Written through the Hadoop FS, as a real successor would —
      // a direct NIO overwrite would orphan the CRC sidecar.)
      val hfs = new org.apache.hadoop.fs.Path(s"$root/sq")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      Similarity.mintPauseForSpec = Some(() => {
        val out = hfs.create(
          new org.apache.hadoop.fs.Path(s"$root/sq/_mint_v2"), true)
        try out.write("successor-claim".getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      })
      try {
        val e = intercept[java.util.ConcurrentModificationException] {
          Similarity.publishManifestForSpec(spark, s"$root/sq", 2)
        }
        assert(e.getMessage.contains("healed away"), e.getMessage)
      } finally Similarity.mintPauseForSpec = None
      // the fenced-away writer published nothing, deleted its staging,
      // and did NOT release the SUCCESSOR's marker (release is
      // ownership-checked)
      assert(Similarity.currentIndexVersion(spark, s"$root/sq") == 1,
        "the fenced-away writer must publish nothing")
      val top = new java.io.File(s"$root/sq").listFiles().map(_.getName)
      assert(!top.exists(_.startsWith("_manifest_tmp_")),
        s"the fenced-away writer must delete its staging: ${top.toSeq}")
      assert(new String(java.nio.file.Files.readAllBytes(mint),
        java.nio.charset.StandardCharsets.UTF_8) == "successor-claim",
        "the loser must not delete the successor's claim")
    } finally {
      val _ = new scala.reflect.io.Directory(root.toFile).deleteRecursively()
    }
  }

  test("a failed publish releases its mint claim: the same version retries immediately") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-annrelease")
    try {
      val base = emb.filter(pmod(col("vec_id"), lit(5L)) =!= 4L)
      Similarity.buildIvfSqIndex(base, s"$root/sq") // v1
      // a transient failure between claim and rename (a staging write
      // error in the wild) — the old code released the marker only
      // after a successful rename, so the failure leaked the claim and
      // every retry of the version hit "being minted right now" for
      // MintStaleMs: a robustness regression vs the detect-only
      // tripwire, fixed by the catch-path release
      Similarity.mintPauseForSpec = Some(() =>
        throw new java.io.IOException("simulated staging failure"))
      try {
        val e = intercept[java.io.IOException] {
          Similarity.publishManifestForSpec(spark, s"$root/sq", 2)
        }
        assert(e.getMessage.contains("simulated staging failure"))
      } finally Similarity.mintPauseForSpec = None
      assert(!new java.io.File(s"$root/sq/_mint_v2").exists(),
        "a failed (non-crashed) writer must release its claim")
      // immediate same-process retry succeeds — no MintStaleMs wait
      Similarity.publishManifestForSpec(spark, s"$root/sq", 2)
      assert(Similarity.currentIndexVersion(spark, s"$root/sq") == 2)
    } finally {
      val _ = new scala.reflect.io.Directory(root.toFile).deleteRecursively()
    }
  }

  test("a two-writer version race refuses by name and leaves the loser's staging intact") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-annrace")
    try {
      val base = emb.filter(pmod(col("vec_id"), lit(5L)) =!= 4L)
      Similarity.buildIvfSqIndex(base, s"$root/sq")                  // v1
      // a SECOND driver's in-flight staging (version ahead of the
      // published tip) — a writer outside this driver's SinkLock
      // lease (or inside its heal residual) may stage concurrently,
      // so retirement must not reclaim it
      val foreign = new java.io.File(s"$root/sq/gens/gen=a2-foreign/label=0")
      assert(foreign.mkdirs())
      java.nio.file.Files.write(
        java.nio.file.Paths.get(foreign.getPath, "part-foreign.parquet"),
        Array[Byte](1, 2, 3))
      // this writer's own maintenance entry (compact on an
      // unfragmented index runs retirement and nothing else)
      Similarity.compactIvfIndex(spark, s"$root/sq")
      assert(foreign.exists(),
        "retirement reclaimed another writer's in-flight staging — " +
          "gens newer than the published tip must be left alone")
      // the race itself: the other driver publishes v2 first; this
      // writer's publish of v2 must refuse by name, not overwrite
      val v1txt = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$root/sq/manifest_v1"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$root/sq/manifest_v2"), v1txt)
      val day = emb.filter(col("vec_id") < 10L)
        .select((col("vec_id") + 910000L).as("vec_id"),
          col("embedding"), col("label"))
      // the appender resolves the (hand-published) v2 and mints v3 —
      // so to force the collision, publish v3 out from under it too,
      // through the same hand-placement, and drive the private
      // publish path directly at the colliding version
      val e = intercept[java.util.ConcurrentModificationException] {
        Similarity.publishManifestForSpec(spark, s"$root/sq", 2)
      }
      assert(e.getMessage.contains("concurrent writer"),
        s"expected the named race refusal, got: ${e.getMessage}")
      // ...and the ordinary writer path simply lands AFTER the
      // winner: the append re-enters against v2 and publishes v3
      Similarity.appendToIvfSqIndex(day, s"$root/sq", tag = "r1")
      assert(Similarity.currentIndexVersion(spark, s"$root/sq") == 3)
      // once the tip passes the foreign staging's version, it is a
      // crashed writer's remnant and IS reclaimed (one publish later)
      Similarity.compactIvfIndex(spark, s"$root/sq")
      assert(!foreign.exists(),
        "a staging older than the published tip is a crashed writer's " +
          "remnant and must be reclaimed")
    } finally {
      val _ = new scala.reflect.io.Directory(root.toFile).deleteRecursively()
    }
  }

  test("steady-state searches resolve the manifest without a directory listing") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-annhint")
    try {
      val base = emb.filter(pmod(col("vec_id"), lit(5L)) =!= 4L)
      val queries = emb.filter(col("vec_id").isin(0L, 1L, 2L))
        .select("vec_id", "embedding")
      def search() = Similarity.searchIvfSq(spark, s"$root/sq", queries, 5,
        nprobe = 2).collect().length
      Similarity.buildIvfSqIndex(base, s"$root/sq")                  // v1
      assert(search() > 0)
      // repeat searches ride the version hint: existence probes plus
      // one manifest read, zero LISTs of the index root (on an object
      // store a LIST is a remote metadata round-trip per query)
      val lists0 = Similarity.manifestListCount.get()
      assert(search() > 0)
      assert(Similarity.manifestListCount.get() == lists0,
        "a repeat search paid a directory listing — the version-hint " +
          "fast path regressed")
      // a publish advances the hint by existence-walk, still no LIST
      val extra = emb.filter(col("vec_id") === 0L)
        .select(lit(920000L).as("vec_id"), col("embedding"), col("label"))
      Similarity.appendToIvfSqIndex(extra, s"$root/sq", tag = "h1") // v2
      // simulate a reader JVM whose hint lags the publish (same-JVM
      // publishes refresh the local hint, so force it back)
      Similarity.resetManifestHintForSpec(s"$root/sq", 1)
      val lists1 = Similarity.manifestListCount.get()
      assert(Similarity.readIndexCodes(spark, s"$root/sq")
        .filter(col("vec_id") === 920000L).count() == 1L,
        "the post-publish search must see the new version")
      assert(Similarity.manifestListCount.get() == lists1,
        "resolving a NEWER version from a stale hint must walk " +
          "forward by existence probes, not re-list")
    } finally {
      val _ = new scala.reflect.io.Directory(root.toFile).deleteRecursively()
    }
  }

  test("index append is exactly-once under a caller tag: replay and crash-replay converge") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-annxo")
    try {
      val base = emb.filter(pmod(col("vec_id"), lit(5L)) =!= 4L)
      def codeCount() = Similarity.readIndexCodes(spark, s"$root/sq").count()
      def version() = Similarity.currentIndexVersion(spark, s"$root/sq")
      Similarity.buildIvfSqIndex(base, s"$root/sq")                  // v1
      val n0 = codeCount()
      val day1 = emb.filter(col("vec_id") < 50L)
        .select((col("vec_id") + 200000L).as("vec_id"),
          col("embedding"), col("label"))
      Similarity.appendToIvfSqIndex(day1, s"$root/sq", tag = "d1")   // v2
      assert(codeCount() == n0 + 50 && version() == 2)
      // verbatim replay of a published tag: a no-op — no duplicate
      // rows, no version bump (the delivery ledger IS the manifest)
      Similarity.appendToIvfSqIndex(day1, s"$root/sq", tag = "d1")
      assert(codeCount() == n0 + 50 && version() == 2,
        "replaying a published append tag must be a no-op")
      // crash-replay: the publish is the LAST step of an append, so a
      // crash leaves exactly this state — a staged generation and the
      // OLD manifest. Simulate by appending d2 and deleting its
      // manifest; the staged rows must be invisible, and replaying d2
      // must converge to exactly-once
      val day2 = emb.filter(col("vec_id") < 30L)
        .select((col("vec_id") + 300000L).as("vec_id"),
          col("embedding"), col("label"))
      Similarity.appendToIvfSqIndex(day2, s"$root/sq", tag = "d2")   // v3
      assert(new java.io.File(s"$root/sq/manifest_v3").delete(),
        "fixture: simulate a crash between staging and publish")
      assert(codeCount() == n0 + 50 && version() == 2,
        "an unpublished staging must be invisible to readers")
      Similarity.appendToIvfSqIndex(day2, s"$root/sq", tag = "d2")   // v3
      assert(codeCount() == n0 + 50 + 30 && version() == 3,
        "replaying the crashed append must converge to exactly-once")
      // a REBUILD carries the tag ledger forward: the retrain reads a
      // corpus that already contains every delivered append's vectors,
      // so a queued replay of a pre-rebuild tag must stay a no-op —
      // wiping the ledger would re-admit it as a double delivery
      Similarity.buildIvfSqIndex(
        base.select("vec_id", "embedding", "label")
          .union(day1).union(day2), s"$root/sq")                      // v4
      val n4 = codeCount()
      assert(version() == 4 && n4 == n0 + 50 + 30)
      Similarity.appendToIvfSqIndex(day1, s"$root/sq", tag = "d1")
      assert(codeCount() == n4 && version() == 4,
        "a rebuild must carry the append-tag ledger — replaying a " +
          "pre-rebuild tag re-delivered its rows")
    } finally {
      val _ = new scala.reflect.io.Directory(root.toFile).deleteRecursively()
    }
  }

  test("streaming index append is exactly-once per micro-batch and survives a checkpoint restart") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-annstr")
    try {
      val base = emb.filter(pmod(col("vec_id"), lit(5L)) =!= 4L)
      def codeCount() = Similarity.readIndexCodes(spark, s"$root/sq").count()
      def version() = Similarity.currentIndexVersion(spark, s"$root/sq")
      Similarity.buildIvfSqIndex(base, s"$root/sq")                  // v1
      val n0 = codeCount()
      def chunk(lo: Long, hi: Long) = emb
        .filter(col("vec_id") >= lo && col("vec_id") < hi)
        .select((col("vec_id") + 400000L).as("vec_id"),
          col("embedding"), col("label"))
      // file source, not MemoryStream: the restart leg resumes the
      // CHECKPOINT, which a per-instance MemoryStream cannot serve
      val inDir = s"$root/in"
      new java.io.File(inDir).mkdirs()
      def drop(name: String, lo: Long, hi: Long): Unit = {
        // stage then move atomically into the source dir (the file
        // source must never list a half-written part file)
        chunk(lo, hi).coalesce(1).write.mode("overwrite")
          .parquet(s"$root/stage")
        new java.io.File(s"$root/stage").listFiles()
          .filter(_.getName.startsWith("part-")).zipWithIndex
          .foreach { case (f, i) =>
            java.nio.file.Files.move(f.toPath,
              java.nio.file.Paths.get(inDir, s"$name-$i.parquet"))
          }
      }
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)),
        org.apache.spark.sql.types.StructField("label",
          org.apache.spark.sql.types.IntegerType)))
      // compactRatio = 0: this spec isolates the exactly-once
      // delivery machinery, whose version arithmetic (one publish per
      // absorbed batch) the assertions below pin; auto-compaction has
      // its own spec
      def startStream() = Similarity.streamAppendToIvfIndex(
        ss.readStream.schema(schema).parquet(inDir),
        s"$root/sq", s"$root/ck", compactRatio = 0L)
      val q = startStream()
      drop("c0", 0L, 20L); q.processAllAvailable()  // batch 0
      drop("c1", 20L, 30L); q.processAllAvailable() // batch 1
      // an EMPTY trigger publishes nothing
      q.processAllAvailable()
      q.stop()
      assert(codeCount() == n0 + 30 && version() == 3,
        s"two streamed micro-batches must append exactly once each: " +
          s"${codeCount() - n0} rows, v${version()}")
      // a REPLAYED batch is a no-op: re-enter batch 1's rows under its
      // derived tag (incarnation-scoped, read from the checkpoint the
      // same way the stream derives it)
      val tag = graft.streaming.StreamingIngest
        .checkpointIdentityFull(spark, s"$root/ck")._1
      Similarity.appendToIvfSqIndex(chunk(20L, 30L), s"$root/sq",
        tag = s"s${tag}_1")
      assert(codeCount() == n0 + 30 && version() == 3,
        "replaying a streamed batch's tag must be a no-op — the " +
          "manifest ledger is the exactly-once mechanism")
      // a RESTARTED query on the same checkpoint resumes batch ids
      // (no aliasing with the committed 0/1) and keeps absorbing
      val q2 = startStream()
      drop("c2", 30L, 35L); q2.processAllAvailable()
      q2.stop()
      assert(codeCount() == n0 + 35 && version() == 4,
        s"the restarted stream must keep absorbing: ${codeCount() - n0}")
      // the PQ dispatch leg: the same stream absorbed into an IVFADC
      // index (kind read from the manifest per batch)
      Similarity.buildIvfPqIndex(base, s"$root/pq")
      val p0 = Similarity.readIndexCodes(spark, s"$root/pq").count()
      val q3 = Similarity.streamAppendToIvfIndex(
        ss.readStream.schema(schema).parquet(inDir),
        s"$root/pq", s"$root/ckpq", compactRatio = 0L)
      q3.processAllAvailable() // absorbs all three dropped files
      q3.stop()
      // PQ codes are one row per (vec_id, sub): 8 subspaces per vector
      assert(Similarity.readIndexCodes(spark, s"$root/pq").count() ==
        p0 + 35 * 8,
        "the PQ dispatch leg must absorb the streamed vectors")
    } finally {
      val _ = new scala.reflect.io.Directory(root.toFile).deleteRecursively()
    }
  }

  test("absorber auto-compaction: the size-ratio trigger bounds referenced generations, content identical to the uncompacted run") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-annauto")
    try {
      val base = emb.filter(pmod(col("vec_id"), lit(5L)) =!= 4L)
      val rest = emb.filter(pmod(col("vec_id"), lit(5L)) === 4L)
        .select("vec_id", "embedding", "label")
        .as[(Long, Array[Float], Int)].collect().sortBy(_._1)
      val chunks = rest.grouped(math.max(1, rest.length / 8)).toSeq
      def drive(path: String, ratio: Long): Seq[Int] = {
        Similarity.buildIvfSqIndex(base, path)
        val ss = spark.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "4")
        val ms = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, Array[Float], Int)](ss)
        val q = Similarity.streamAppendToIvfIndex(
          ms.toDS().toDF("vec_id", "embedding", "label"),
          path, s"$path-ck", compactRatio = ratio)
        val gensPerBatch =
          try chunks.map { c =>
            ms.addData(c.toSeq); q.processAllAvailable()
            Similarity.referencedGens(spark, path).size
          } catch { case e: Throwable =>
            try q.stop() catch { case st: Throwable => e.addSuppressed(st) }
            throw e
          }
        q.stop()
        gensPerBatch
      }
      val auto = drive(s"$root/auto", 4L)
      val off = drive(s"$root/off", 0L)
      // off: one new generation per absorbed batch, forever — the
      // listing hazard the trigger exists for
      assert(off.last == chunks.length + 1, s"off-run gens: $off")
      // auto: the ratio invariant keeps the referenced set BOUNDED
      // at every point of the stream, and a compaction genuinely ran
      assert(auto.forall(_ <= 6),
        s"auto-compaction must bound referenced generations: $auto")
      assert(auto.last < off.last,
        s"no compaction ever fired: $auto vs $off")
      // content is invariant under the maintenance: same code rows,
      // same search results as the uncompacted twin
      assert(Similarity.readIndexCodes(spark, s"$root/auto").count() ==
        Similarity.readIndexCodes(spark, s"$root/off").count())
      val queries = emb.filter(col("vec_id").isin(0L, 1L, 2L))
        .select("vec_id", "embedding")
      def top(path: String) = Similarity.searchIvfSq(spark, path,
          queries, 5, nprobe = 2)
        .select("q_id", "rank", "vec_id").as[(Long, Long, Long)]
        .collect().sortBy(r => (r._1, r._2))
      assert(top(s"$root/auto").sameElements(top(s"$root/off")),
        "auto-compaction changed search content")
    } finally {
      val _ = new scala.reflect.io.Directory(root.toFile).deleteRecursively()
    }
  }

  test("a pre-manifest flat index tree is diagnosed by name, not as a crashed build") {
    val root = java.nio.file.Files.createTempDirectory("graft-annleg")
    try {
      // the round-12 layout: a codes/ tree at the root, no manifest —
      // an intact index in a retired format; the resolver must name
      // the format and the remedy instead of claiming nothing exists
      assert(new java.io.File(s"$root/sq/codes/label=0").mkdirs())
      val e = intercept[IllegalArgumentException](
        Similarity.searchIvfSq(spark, s"$root/sq",
          emb.filter(col("vec_id") === 0L).select("vec_id", "embedding"),
          5))
      assert(e.getMessage.contains("retired flat layout"),
        s"legacy tree must be diagnosed by name: ${e.getMessage}")
      // a genuinely absent index keeps the never-built message
      val e2 = intercept[IllegalArgumentException](
        Similarity.searchIvfSq(spark, s"$root/nothing",
          emb.filter(col("vec_id") === 0L).select("vec_id", "embedding"),
          5))
      assert(e2.getMessage.contains("no published index"),
        s"absent index must say never-built: ${e2.getMessage}")
      // ... and the instructed rebuild RECLAIMS the flat tree instead
      // of leaving a corpus-sized copy at the root forever
      Similarity.buildIvfSqIndex(emb, s"$root/sq")
      assert(!new java.io.File(s"$root/sq/codes").exists(),
        "rebuild must reclaim the retired flat codes/ tree")
      assert(Similarity.searchIvfSq(spark, s"$root/sq",
        emb.filter(col("vec_id") === 0L).select("vec_id", "embedding"),
        5).count() == 5L)
    } finally {
      val _ = new scala.reflect.io.Directory(root.toFile).deleteRecursively()
    }
  }

  test("compactIvfIndex refuses loudly when the manifest kind and code footers disagree") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-annkind")
    try {
      Similarity.buildIvfSqIndex(emb, s"$root/sq")
      val extra = emb.filter(col("vec_id") < 50L && col("label") === 0)
        .select((col("vec_id") + 200000L).as("vec_id"),
          col("embedding"), col("label"))
      Similarity.appendToIvfSqIndex(extra, s"$root/sq", tag = "d1")
      // hand-tamper the published manifest: flip its kind line — the
      // rewrite would then read SQ files through the PQ schema and
      // null the payload columns, silent and irrecoverable, so the
      // footer check must refuse BEFORE any rewrite
      val mf = new java.io.File(s"$root/sq/manifest_v2")
      assert(mf.isFile)
      val txt = new String(
        java.nio.file.Files.readAllBytes(mf.toPath), "UTF-8")
      java.nio.file.Files.write(mf.toPath,
        txt.replace("kind sq", "kind pq").getBytes("UTF-8"))
      // drop the local FS's checksum sidecar — the tamper is the test
      val _ = new java.io.File(s"$root/sq/.manifest_v2.crc").delete()
      val e = intercept[IllegalArgumentException](
        Similarity.compactIvfIndex(spark, s"$root/sq"))
      assert(e.getMessage.contains("refusing to rewrite"),
        s"kind mismatch must refuse the rewrite: ${e.getMessage}")
      // the kind gate guards searches too — a PQ-claiming manifest
      // routes searchIvfSq callers away before any wrong-schema read
      val eS = intercept[IllegalArgumentException](
        Similarity.searchIvfSq(spark, s"$root/sq",
          emb.filter(col("vec_id") === 0L).select("vec_id", "embedding"),
          5))
      assert(eS.getMessage.contains("searchIvfSq reads SQ indexes"),
        s"kind mismatch must refuse the search: ${eS.getMessage}")
    } finally {
      val _ = new scala.reflect.io.Directory(root.toFile).deleteRecursively()
    }
  }

  test("index geometry is validated loudly: wrong-dimension vectors are refused") {
    val root = java.nio.file.Files.createTempDirectory("graft-anndim")
    try {
      Similarity.buildIvfSqIndex(emb, s"$root/sq")
      Similarity.buildIvfPqIndex(emb, s"$root/pq")
      // a 32-dim frame against the 64-dim index: without the check
      // the SQ transform would code truncated vectors and the PQ
      // slice would fan short subvectors — silently wrong distances,
      // the one failure an index API must never make quiet
      val shortEmb = emb.select(col("vec_id"),
        slice(col("embedding"), 1, 32).as("embedding"), col("label"))
      for ((name, op) <- Seq[(String, () => Any)](
        ("appendToIvfSqIndex", () =>
          Similarity.appendToIvfSqIndex(shortEmb, s"$root/sq", tag = "g1")),
        ("appendToIvfPqIndex", () =>
          Similarity.appendToIvfPqIndex(shortEmb, s"$root/pq", tag = "g2")),
        ("searchIvfSq", () =>
          Similarity.searchIvfSq(spark, s"$root/sq",
            shortEmb.select("vec_id", "embedding"), 5)),
        ("searchIvfPqAdc", () =>
          Similarity.searchIvfPqAdc(spark, s"$root/pq",
            shortEmb.select("vec_id", "embedding"), 5)))) {
        val e = intercept[IllegalArgumentException] { op(); () }
        assert(e.getMessage.contains("dim 32 != index dim 64"),
          s"$name must refuse the geometry mismatch: ${e.getMessage}")
      }
      // a MIXED-width frame must be refused too — the old one-row
      // sample would pass it and code the wrong-width rows into
      // truncated arrays with silently wrong distances
      val mixed = emb.filter(col("vec_id") < 10L)
        .select(col("vec_id"), col("embedding"), col("label"))
        .union(shortEmb.filter(col("vec_id") >= 10L && col("vec_id") < 20L))
      val eMx = intercept[IllegalArgumentException](
        Similarity.appendToIvfSqIndex(mixed, s"$root/sq", tag = "g3"))
      assert(eMx.getMessage.contains("dim 32..64 != index dim 64"),
        s"mixed-width frame must be refused: ${eMx.getMessage}")
    } finally {
      val _ = new scala.reflect.io.Directory(root.toFile).deleteRecursively()
    }
  }

  test("gate TTL: an ms-aligned ord equal to the prior batch's max survives the watermark") {
    import spark.implicits._
    // the watermark is ms-floored; with a 0 delay a doc whose lifted
    // ord lands EXACTLY on the previous batch's watermark (every ord
    // a whole ms — realistic crawl timestamps) was dropped as late
    // and VANISHED. The 1 ms watermark slack keeps it flowing; a
    // novel doc must be ADMITTED, not lost.
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val other = (1 to 40).map(i => s"unrel$i").mkString(" ")
    val sec = 1000000L
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    Dedup.useRocksDbStateStore(ss)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](ss)
    val q = Dedup.streamingNearDupGateTtl(ms.toDS(), 0.5, 100L * sec)(_._2, _._1)
      .toDF("ord", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("gate_ttl_tie").start()
    ms.addData(Seq((5L * sec, base)))
    q.processAllAvailable()
    // one µs inside the watermark's floored ms (lifted 5999.999 ms vs
    // the 5999 ms watermark), unrelated content → must be admitted.
    // Under a 0 ms delay this row sits at or below the watermark and
    // vanished; it is also the slightly-reordered arrival (ord below
    // the prior batch's max, above the watermark) the eviction-clamp
    // protects. Distinct ord: a cross-batch ord TIE now fails loudly
    // in the doc store (its own spec below).
    ms.addData(Seq((5L * sec - 1L, other)))
    q.processAllAvailable()
    q.stop()
    val kept = ss.table("gate_ttl_tie").select("text").as[String]
      .collect().toSet
    assert(kept == Set(base, other),
      s"boundary doc was dropped by the watermark: kept ${kept.size} docs")
  }

  test("gate TTL: a cross-batch ord tie between distinct docs fails loudly") {
    import spark.implicits._
    // the round-14 doc-keyed store gives the TTL gate the unbounded
    // gate's tie detection: an ord re-arriving with a DIFFERENT
    // shingle set is two documents sharing an identity — corrupted
    // verdicts if admitted — so it must kill the query by name
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val other = (1 to 40).map(i => s"unrel$i").mkString(" ")
    val sec = 1000000L
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    Dedup.useRocksDbStateStore(ss)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](ss)
    val q = Dedup.streamingNearDupGateTtl(ms.toDS(), 0.5, 100L * sec)(_._2, _._1)
      .toDF("ord", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("gate_ttl_dup_ord").start()
    ms.addData(Seq((5L * sec, base)))
    q.processAllAvailable()
    ms.addData(Seq((5L * sec, other)))
    val e = intercept[Exception] { q.processAllAvailable() }
    try q.stop() catch { case _: Throwable => () }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => Option(c.getMessage)
        .exists(_.contains("DIFFERENT shingle set"))),
      s"expected the ord-tie refusal, got: ${e.getMessage}")
  }

  test("gate TTL with a horizon wider than the corpus equals the unbounded gate") {
    import spark.implicits._
    val rows = docs.select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1)
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    Dedup.useRocksDbStateStore(ss)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](ss)
    val q = Dedup.streamingNearDupGateTtl(
      ms.toDS(), 0.5, Long.MaxValue / 4)(_._2, _._1)
      .toDF("doc_id", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("gate_ttl_wide").start()
    rows.grouped(rows.length / 3 + 1).foreach { c =>
      ms.addData(c.toSeq); q.processAllAvailable()
    }
    q.stop()
    val kept = ss.table("gate_ttl_wide").select("doc_id")
      .as[Long].collect().toSet
    // the drift pin between the two state machines: with nothing ever
    // beyond the horizon, TTL ≡ the x108 closed form
    val rejected = Dedup.minhashNearDups(docs, 0.5)
      .select("doc_b").as[Long].collect().toSet
    assert(kept == rows.map(_._1).toSet -- rejected)
  }

  test("dupSpanCoverage: docs shorter than n are uncovered, not dropped") {
    import spark.implicits._
    val d = Seq((1L, "a b"), (2L, "a b"), (3L, "a b c d e"),
      (4L, "a b c d e")).toDF("doc_id", "text")
    val got = TextAnalysis.dupSpanCoverage(d)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // "a b" repeats but is shorter than a 5-gram → no gram, no coverage;
    // docs 3/4 share their single 5-gram → fully covered
    assert(got == Seq((1L, 2L, 0L, 0.0), (2L, 2L, 0L, 0.0),
      (3L, 5L, 5L, 1.0), (4L, 5L, 5L, 1.0)))
  }

  test("trainingShards: two-phase equals the naive global running sum; " +
       "bucket width is an implementation detail") {
    import spark.implicits._
    val shardTokens = 512L
    val got = TextAnalysis.trainingShards(docs, shardTokens)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // naive reference: one global md5-ordered running sum on the driver
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(id: Long) = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val naive = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .as[(Long, Long)].collect()
      .map { case (id, n) => (hex(id), id, n) }.sortBy(_._1)
      .scanLeft(("", 0L, 0L, 0L)) { case ((_, _, _, cum), (h, id, n)) =>
        (h, id, n, cum + n)
      }.drop(1)
      .map { case (_, id, n, cum) => (id, n, (cum - n) / shardTokens) }
      .sortBy(_._1).toSeq
    assert(got == naive)
    assert(got.map(_._3).distinct.length > 1, "fixture should span shards")
    // the 16-bucket (1 hex char) and 256-bucket decompositions agree —
    // bucketing never changes the assignment, only the task shape
    val coarse = TextAnalysis.trainingShards(docs, shardTokens, bucketChars = 1)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(coarse == got)
  }

  test("bm25TopK: hand-checked scores, rare term dominates, fixed-order sum") {
    import spark.implicits._
    // N=3, avgdl=4: d1 has both terms, d2 one hit of 'rare',
    // d3 'common' twice. df(rare)=2, df(common)=2 → same idf; what
    // separates docs is tf saturation and dl normalization.
    val d = Seq(
      (1L, "rare common x y"),
      (2L, "rare a b c"),
      (3L, "common common z w")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(d, Seq("rare", "common"), k = 3)
      .as[(Long, Double)].collect().toSeq
    val k1 = 1.2; val b = 0.75
    def part(tf: Long, df: Long, dl: Long): Double =
      ((3.0 - df.toDouble + 0.5) / (df.toDouble + 0.5)) *
        (tf.toDouble * (k1 + 1.0)) /
        (tf.toDouble + k1 * (1.0 - b + b * dl.toDouble / 4.0))
    val exp = Seq(
      1L -> (part(1, 2, 4) + part(1, 2, 4)),
      3L -> (0.0 + part(2, 2, 4)),
      2L -> (part(1, 2, 4) + 0.0)).sortBy { case (id, s) => (-s, id) }
    assert(got == exp.map { case (id, s) => (id, s) },
      s"got $got expected $exp")
  }

  test("langConfusion: cells reconcile to per-language totals, fracs sum to 1") {
    import spark.implicits._
    val got = TextAnalysis.langConfusion(docs)
      .as[(String, String, Long, Double)].collect().toSeq
    val perLang = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val cellSums = got.groupBy(_._1).map { case (l, rows) =>
      l -> rows.map(_._3).sum
    }
    assert(cellSums == perLang, s"cells $cellSums vs corpus $perLang")
    got.groupBy(_._1).foreach { case (l, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9,
        s"$l fracs do not sum to 1: $rows")
    }
  }

  test("shardManifest reconciles with the corpus and the assignment") {
    import spark.implicits._
    val man = TextAnalysis.shardManifest(docs, 512L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val nDocs = docs.count()
    val nToks = docs.select(sum(size(split(col("text"), " ")).cast("long")))
      .as[Long].head()
    assert(man.map(_._2).sum == nDocs, "every doc in exactly one shard row")
    assert(man.map(_._3).sum == nToks, "token totals reconcile")
    // the hash shuffle mixes: with 500 docs over ~14 shards, every
    // shard must draw from more than one language and source
    assert(man.forall(r => r._6 > 1 && r._7 > 1),
      s"a shard is single-source — the shuffle key is broken: $man")
  }

  test("sqCodes: exact affine codes on a planted grid; uniform scale makes SDC ≡ L2") {
    import spark.implicits._
    // unit square corners: per-dim extremes are {0, 1.0} → codes land
    // exactly on 0/255 (the affine map is exact at the endpoints), and
    // with BOTH dims sharing one scale, SDC distance is a monotone
    // transform of true L2 — recall must be 1.0
    val d = Seq(
      (0L, 0, Array(0.0f, 0.0f)), (1L, 0, Array(1.0f, 0.0f)),
      (2L, 0, Array(0.0f, 1.0f)), (3L, 0, Array(1.0f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val codes = Similarity.sqCodes(d)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(codes == Seq(
      (0L, 0L, 0L), (0L, 1L, 0L), (1L, 0L, 255L), (1L, 1L, 0L),
      (2L, 0L, 0L), (2L, 1L, 255L), (3L, 0L, 255L), (3L, 1L, 255L)))
    val rec = Similarity.sqRecall(d, Seq(0L), 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rec == Seq((0L, 3L, 3L, 1.0)))
    // corpus sanity on the real fixture: every code is a byte
    val span = Similarity.sqCodes(emb)
      .agg(min("code"), max("code")).as[(Long, Long)].head()
    assert(span._1 >= 0L && span._2 <= 255L)
  }

  test("topKIvfSq over one cell equals topKSq (the x95 degenerate-prune property)") {
    import spark.implicits._
    // with every vector in ONE cell the prune is a no-op, so the
    // composed search must equal plain SDC result-for-result
    val one = emb.withColumn("label", lit(0))
    val ivf = Similarity.topKIvfSq(one, Seq(0L, 1L, 2L), 5)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._3)).toSeq
    val flat = Similarity.topKSq(one, Seq(0L, 1L, 2L), 5)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(ivf == flat)
    assert(ivf.nonEmpty)
  }

  test("truncatedDimRecall: full-dimension point is the recall-1.0 anchor") {
    import spark.implicits._
    val got = Similarity.truncatedDimRecall(emb, Seq(0L, 1L, 2L), 5,
        SparkEntry.TruncDims)
      .as[(Long, Long, Long, Double, Long)].collect()
    assert(got.length == SparkEntry.TruncDims.length * 3)
    val full = got.filter(_._5 == 64L)
    assert(full.nonEmpty && full.forall(_._4 == 1.0),
      s"the full-dim curve point must equal brute: ${full.toSeq}")
    assert(got.forall(r => r._3 <= r._2 && r._2 == 5L))
  }

  test("oovRate: vocabulary cut is total-ordered at ties; counts hand-checked") {
    import spark.implicits._
    // counts: a=4, b=3, c=2, d=2, e=1 → top-3 by (cnt desc, tok asc)
    // is {a, b, c} — the c/d tie at 2 breaks lexically, d is OOV
    val d = Seq(
      (1L, "a a b c d"),
      (2L, "a b c d e"),
      (3L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.oovRate(d, vocabK = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 5L, 1L, 1.0 / 5.0),   // d
      (2L, 5L, 2L, 2.0 / 5.0),   // d, e
      (3L, 2L, 0L, 0.0)))
  }

  test("persisted ANN indexes: search-from-tables ≡ inline probed search, bit for bit") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L)
    val root = java.nio.file.Files.createTempDirectory("graft-annidx")
    try {
      val queries = emb.filter(col("vec_id").isin(ids: _*))
        .select("vec_id", "embedding")
      // full rows — ranks AND int64 distances pinned, not just the
      // neighbor sets: the searcher runs the inline path's own shared
      // cores against the persisted tables, so nothing may drift
      def full(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, Long, Long, Long)].collect().toSet
      Similarity.buildIvfSqIndex(emb, s"$root/sq")
      assert(full(Similarity.searchIvfSq(spark, s"$root/sq", queries, 5,
          nprobe = 2)) ==
        full(Similarity.topKIvfSqProbed(emb, ids, 5, nprobe = 2)),
        "IVF-SQ search-from-tables must equal the inline probed search")
      Similarity.buildIvfPqIndex(emb, s"$root/pq")
      assert(full(Similarity.searchIvfPqAdc(spark, s"$root/pq", queries, 5,
          nprobe = 2)) ==
        full(Similarity.topKIvfPqAdcProbed(emb, ids, 5, nprobe = 2)),
        "IVFADC search-from-tables must equal the inline probed search")
      // the persisted code tables are cell-partitioned on disk — the
      // layout that makes the probed-cell restriction a partition
      // prune over the compressed representation at 100 TB
      val nCells = emb.select("label").distinct().count().toInt
      for (idx <- Seq("sq", "pq")) {
        val dirs = new java.io.File(s"$root/$idx/gens/gen=b1").listFiles()
          .filter(_.isDirectory).map(_.getName)
          .count(_.startsWith("label="))
        assert(dirs == nCells,
          s"$idx codes must be partitioned by cell: $dirs dirs, $nCells cells")
      }
    } finally {
      val _ = new scala.reflect.io.Directory(root.toFile).deleteRecursively()
    }
  }

  test("index append freezes the quantizer: learned tables untouched, appended vectors retrievable") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-annapp")
    try {
      def snapshot(dir: String): Set[(String, Long, Long)] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(dir))
          .map(f => (f.getPath, f.lastModified, f.length)).toSet
      }
      // a new vector IDENTICAL to query 0's embedding: its SQ/PQ code
      // distance to q0 is exactly 0, so if the append made it
      // searchable at all it MUST surface in q0's top-k
      val clone = emb.filter(col("vec_id") === 0L)
        .select(lit(100000L).as("vec_id"), col("embedding"), col("label"))
      val queries = emb.filter(col("vec_id") === 0L)
        .select("vec_id", "embedding")
      Similarity.buildIvfSqIndex(emb, s"$root/sq")
      Similarity.buildIvfPqIndex(emb, s"$root/pq")
      val frozen = Seq(s"$root/sq/learned_v1", s"$root/pq/learned_v1")
      val before = frozen.map(d => d -> snapshot(d)).toMap
      Similarity.appendToIvfSqIndex(clone, s"$root/sq", tag = "d1")
      Similarity.appendToIvfPqIndex(clone, s"$root/pq", tag = "d1")
      // the frozen-quantizer proof: not one learned-table byte moved
      frozen.foreach { d =>
        assert(snapshot(d) == before(d),
          s"append must not touch the learned table at $d")
      }
      // probe EVERY cell so the pin is deterministic: the clone's code
      // distance to q0 is exactly 0, so once its cell is probed it
      // cannot miss the top-k (the fixture's labels are not learned
      // cells, so q0's own cell need not rank in its 2 nearest —
      // cell-ranking quality is the recall curves' axis, not this
      // test's)
      val sqHits = Similarity.searchIvfSq(spark, s"$root/sq", queries, 5,
          nprobe = 1000)
        .select("vec_id").as[Long].collect().toSet
      assert(sqHits.contains(100000L),
        s"appended exact clone missing from SQ top-k: $sqHits")
      val pqHits = Similarity.searchIvfPqAdc(spark, s"$root/pq", queries, 5,
          nprobe = 1000)
        .select("vec_id").as[Long].collect().toSet
      assert(pqHits.contains(100000L),
        s"appended exact clone missing from ADC top-k: $pqHits")
    } finally {
      val _ = new scala.reflect.io.Directory(root.toFile).deleteRecursively()
    }
  }

  test("taggedGateRun sharing: consumer view is identical before and " +
    "after its carrier rebuilds the memoized run") {
    import spark.implicits._
    def keptTtl() = SparkEntry.queries("x129_stream_gate_ttl")(spark, sf)
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    // first access: the consumer builds the memo tree itself
    val first = keptTtl()
    // carrier invocation REBUILDS the configuration's run (deletes the
    // consumer-built tree, drains a fresh one)
    val tagged = SparkEntry.queries("x162_gate_ttl_audit_reasons")(spark, sf)
      .select("doc_id", "reason")
      .as[(Long, String)].collect().toSeq
    // consumer again: now a view over the CARRIER's tree — must be
    // byte-identical to its own build (memo keying + rebuild
    // consistency), and exactly the carrier's admitted set (the view
    // definition: gate ≡ tagged filtered to admitted)
    val second = keptTtl()
    assert(second == first)
    assert(second.map(_._1).toSet ==
      tagged.collect { case (id, r)
        if r == graft.operators.Dedup.ReasonAdmitted => id }.toSet)
  }
}
