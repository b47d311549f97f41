package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Materialized-rollup substitution — the reference's core performance
  * idea (answer coarse aggregations from pre-built levels, never scan
  * raw; SURVEY §4 row 1) implemented *inside Catalyst*, so it applies to
  * any user query over the raw point table, SQL or DataFrame.
  *
  * A logical `Aggregate` grouped by `(metric, <bucket>)` over the
  * registered raw point plan — where `<bucket>` is any of the timeline
  * spellings `time - time % I`, `time div I`, or `floor(time / I)` —
  * computing only rollup-derivable aggregates (`min(value)`,
  * `max(value)`, `count(*)`/`count(value)`; under the install-time
  * data assertions also quantized-sum, plain `sum(value)`, and
  * `avg(value)`), is rewritten to aggregate
  * the registered level-0 table instead — merging `I / interval₀`
  * bucket rows per output row instead of scanning every point. An
  * ORDER BY above the aggregate is untouched (output attributes keep
  * their ids) and sorts the rewritten result identically. Correct because level buckets tile the raw points exactly
  * (tiling property, `PropertySpec`) and the Agg components form a
  * monoid (A3).
  *
  * A registered LEVEL plan can itself be the aggregation source: a
  * re-bucketing `Aggregate` grouped by `(metric, <bucket over
  * bucket_start>)` merging the monoid columns (`min(min_v)`,
  * `max(max_v)`, `sum(sum_c/cnt/integral_cus/active_us)`) is answered
  * from the coarsest dividing rung that is an exact merge of the
  * source. Result expressions may combine mapped aggregates
  * arbitrarily — in particular the reference's time-weighted mean
  * `sum(integral_cus) / sum(active_us)` (SURVEY §1.1 Aggregate:
  * integral/active_time) rewrites onto the rung with int64-exact
  * components, so the substituted answer is value-identical.
  *
  * Output attributes keep their original `exprId`s, so the rewrite is
  * invisible to the rest of the plan.
  */
object RollupSubstitution {

  /** `levels` is the registered ladder, ascending by interval — the rule
    * answers from the COARSEST level that divides the query's bucket
    * (fewest rows merged per output group).
    */
  final case class Entry(rawPlan: LogicalPlan,
                         levels: Seq[(LogicalPlan, Long)],
                         valueNotNull: Boolean,
                         centQuantized: Boolean,
                         nonNegativeTime: Boolean)

  private val registry =
    scala.collection.concurrent.TrieMap.empty[SparkSession, Entry]

  /** Register the raw↔level pair for a session. `raw` must expose
    * `(metric, time, value, …)`, `level0` the internal exact level schema
    * (`Ingest.rollup` output) at `intervalNs`.
    *
    * `assumeValueNotNull`: the caller asserts the raw `value` column
    * contains no NULLs even though its schema is nullable (true for any
    * table written by `Ingest.sanitize` — the NaN filter also drops
    * NULLs because `!isnan(NULL)` is NULL). This unlocks the
    * `count(value)`, quantized-sum, and `avg(value)` mappings, which are
    * wrong in the presence of NULL values (the level's cnt/sum_c count
    * rows / treat an all-NULL bucket as 0, where raw count skips NULLs /
    * sums to NULL).
    *
    * `assumeCentQuantized`: the caller additionally asserts every raw
    * `value` lies exactly on the 0.01 grid (`value == round(value*100)
    * / 100`). Required by the `avg(value)` and plain `sum(value)`
    * mappings: the level's `sum_c` is `Σ round(value·100)`, so the
    * rewritten mean/sum is over QUANTIZED values — exact only on the
    * grid, and up to 0.005/point systematic error off it. The
    * quantized-sum mapping does NOT need this (the query itself asks
    * for `sum(round(value*100)::long)`).
    */
  def install(spark: SparkSession, raw: DataFrame, level0: DataFrame,
              intervalNs: Long, assumeValueNotNull: Boolean = false,
              assumeCentQuantized: Boolean = false,
              assumeNonNegativeTime: Boolean = false): Unit =
    installLadder(spark, raw, Seq(level0 -> intervalNs), assumeValueNotNull,
      assumeCentQuantized, assumeNonNegativeTime)

  /** Register a whole level ladder (A5's `Intervals.ladder` materialized
    * by ingest): queries bucketed at a coarse interval merge the coarsest
    * dividing level instead of always paying the level-0 merge — at a
    * 10×-per-level ladder that is 10× fewer input rows per rung.
    *
    * `assumeNonNegativeTime`: the caller asserts every raw `time` is
    * ≥ 0 (the engine's ns-since-epoch TimePoint domain). Required by
    * the `floor(time / I)` bucket-spelling mapping: level buckets tile
    * by truncation (`t - t % L`), which for negative times disagrees
    * with floor buckets — a t = -101, L = 10, I = 100 row floors to
    * bucket -2 on raw but its truncation bucket_start -100 floors to
    * -1. Without the assertion the floor spelling declines (raw scan,
    * still correct); the `div` spelling is truncation-consistent and
    * never needs it.
    */
  def installLadder(spark: SparkSession, raw: DataFrame,
                    ladder: Seq[(DataFrame, Long)],
                    assumeValueNotNull: Boolean = false,
                    assumeCentQuantized: Boolean = false,
                    assumeNonNegativeTime: Boolean = false): Unit = {
    require(ladder.nonEmpty, "ladder must contain at least one level")
    require(ladder.forall(_._2 > 0), "level intervals must be positive")
    require(ladder.map(_._2).distinct.size == ladder.size,
      "duplicate level intervals in ladder")
    // sum_c included: the quantized-sum mapping dereferences it, and
    // declining at install time beats a NoSuchElementException inside
    // the optimizer
    val needed = Seq("metric", "bucket_start", "min_v", "max_v", "cnt", "sum_c")
    ladder.foreach { case (level, i) =>
      val missing = needed.filterNot(level.columns.contains)
      require(missing.isEmpty,
        s"level at interval $i is missing required columns: ${missing.mkString(", ")}")
    }
    require(Seq("metric", "time", "value").forall(raw.columns.contains),
      "raw must expose (metric, time, value)")
    registry.put(spark,
      Entry(raw.queryExecution.analyzed,
        ladder.sortBy(_._2).map { case (df, i) => (df.queryExecution.analyzed, i) },
        assumeValueNotNull, assumeCentQuantized, assumeNonNegativeTime))
    // the injected rule has no removal API, so install/uninstall/install
    // cycles must reuse the instance already present for this session
    // instead of appending another (each extra instance re-scans every
    // plan forever)
    installLock.synchronized {
      val present = spark.experimental.extraOptimizations.exists {
        case r: RollupSubstitutionRule => r.session eq spark
        case _ => false
      }
      if (!present)
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ new RollupSubstitutionRule(spark)
    }
  }

  def uninstall(spark: SparkSession): Unit = {
    // the rule stays in extraOptimizations (no removal API) but becomes
    // a no-op without a registry entry; no global session set is kept,
    // so a stopped session is retained only by its own rule instance
    registry.remove(spark)
  }

  private val installLock = new Object

  private[plans] def entryFor(spark: SparkSession): Option[Entry] =
    registry.get(spark)
}

class RollupSubstitutionRule(private[plans] val session: SparkSession)
    extends Rule[LogicalPlan] {
  private def spark = session

  override def apply(plan: LogicalPlan): LogicalPlan =
    RollupSubstitution.entryFor(spark) match {
      case None => plan
      case Some(entry) =>
        plan.transformUp {
          case agg @ Aggregate(groups, results, child, _) =>
            unwrap(child, entry).flatMap { case (g2, base, filterOpt) =>
              val groupsI = groups.map(g2)
              val resultsI = results.map(r =>
                g2(r) match { case ne: NamedExpression => ne; case e => Alias(e, r.name)(exprId = r.exprId) })
              rewrite(groupsI, resultsI, base, filterOpt.map(g2), entry)
            }.getOrElse(agg)
        }
    }

  /** Accept the raw plan — or a registered LEVEL plan, for re-bucketing
    * a fine timeline onto a coarser rung — directly, under one Project
    * (the optimizer's `PullOutGroupingExpressions` inserts one), and/or
    * above one Filter (pushdown has already run when extraOptimizations
    * fire, so a user WHERE sits directly on the scan). Returns a
    * substitution inlining the projection's aliases, the base plan, and
    * the filter condition (validated and mapped by [[rewrite]]).
    */
  private def unwrap(child: LogicalPlan, entry: RollupSubstitution.Entry)
      : Option[(Expression => Expression, LogicalPlan, Option[Expression])] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}
    def known(c: LogicalPlan): Boolean =
      c.sameResult(entry.rawPlan) || entry.levels.exists(l => c.sameResult(l._1))
    def base(c: LogicalPlan): Option[(LogicalPlan, Option[Expression])] = c match {
      case Filter(cond, inner) if known(inner) => Some((inner, Some(cond)))
      case c if known(c) => Some((c, None))
      case _ => None
    }
    child match {
      case p: Project =>
        base(p.child).map { case (b, f) =>
          val m = p.projectList.collect {
            case a @ Alias(e, _) => a.exprId -> e
          }.toMap
          (e => e.transformUp {
            case a: Attribute if m.contains(a.exprId) => m(a.exprId)
          }, b, f)
        }
      case c => base(c).map { case (b, f) => (identity[Expression] _, b, f) }
    }
  }

  private def rewrite(groups: Seq[Expression],
                      results: Seq[NamedExpression], child: LogicalPlan,
                      filterOpt: Option[Expression],
                      entry: RollupSubstitution.Entry): Option[LogicalPlan] = {
    def childAttr(name: String): Option[Attribute] =
      child.output.find(_.name == name)

    // the aggregation source: the raw point table (srcLevelNs = None), or
    // a registered LEVEL being re-bucketed onto a coarser rung — the
    // reference's hierarchical-merge read path (A3), which also serves
    // the time-weighted mean Σintegral/Σactive_time, the one
    // rollup-derivable family a raw-table Aggregate can't spell (it
    // needs lag segmentation, not a plain GROUP BY)
    val srcLevelNs: Option[Long] =
      if (child.sameResult(entry.rawPlan)) None
      else entry.levels.find { case (p, _) => child.sameResult(p) } match {
        case Some((_, l)) => Some(l)
        case None => return None
      }

    // the time-like attribute users bucket over: raw `time`, or the fine
    // level's `bucket_start`
    val (metricAttr, timeAttr) = (childAttr("metric"),
        childAttr(if (srcLevelNs.isEmpty) "time" else "bucket_start")) match {
      case (Some(m), Some(t)) => (m, t)
      case _ => return None
    }
    val valueAttr = srcLevelNs match {
      case None => childAttr("value") match {
        case Some(v) => v
        case None => return None
      }
      case Some(_) => metricAttr // unused on the level source
    }

    // grouping must be exactly {metric, <bucket spelling over time>}
    // with some registered level dividing the bucket interval. Three
    // spellings users write for timelines are recognized: the engine's
    // `time - time % I` (bucket start), integer division `time div I`
    // (bucket index), and SQL's `floor(time / I)` (bucket index via
    // double division). The floor form is exact for the engine's
    // µs-floored time domain: after the long→double cast every time
    // sits ≥ (1000−256)/I = 744/I quotient-units from the nearest
    // integer, while half-ulp of the quotient at these magnitudes is
    // ≤ 322/I — the floor can never cross a bucket boundary, and the
    // identical argument covers `bucket_start` on the level side.
    def bucketIntervalOf(e: Expression): Option[Long] = e match {
      case Subtract(t: Attribute, Remainder(t2: Attribute, Literal(i: Long, _), _), _)
          if t.exprId == timeAttr.exprId && t2.exprId == timeAttr.exprId &&
            i > 0 => Some(i)
      case IntegralDivide(t: Attribute, Literal(i: Long, _), _)
          if t.exprId == timeAttr.exprId && i > 0 => Some(i)
      // gated on the install-time non-negative-time assertion: level
      // buckets tile by truncation, which disagrees with floor buckets
      // for negative times (see installLadder doc)
      case Floor(Divide(Cast(t: Attribute, org.apache.spark.sql.types.DoubleType, _, _),
          Literal(d: Double, _), _))
          if entry.nonNegativeTime && t.exprId == timeAttr.exprId &&
            d > 0 && d == math.rint(d) && d < 9.2e18 => Some(d.toLong)
      case _ => None
    }
    // a rung can answer when it divides the query bucket; answering for
    // a LEVEL source additionally requires the rung to be an exact merge
    // of it (a coarser multiple — the A3 construction), else no benefit
    def admissible(levelNs: Long, iv: Long): Boolean =
      iv % levelNs == 0 &&
        srcLevelNs.forall(s => levelNs % s == 0 && levelNs > s)
    val bucketGroups = groups.flatMap(g => bucketIntervalOf(g).map(g -> _))
      .filter { case (_, iv) => entry.levels.exists(e => admissible(e._2, iv)) }
    val metricGroups = groups.collect {
      case a: Attribute if a.exprId == metricAttr.exprId => a
    }
    if (bucketGroups.size != 1 || metricGroups.size != 1 || groups.size != 2)
      return None
    val (bucketExpr, i) = bucketGroups.head

    // attempt against one rung of the ladder
    def rewriteOn(levelPlan: LogicalPlan, levelNs: Long): Option[LogicalPlan] = {
    def lvlAttr(name: String): Attribute =
      levelPlan.output.find(_.name == name).get

    val lvlMetric = lvlAttr("metric")
    val lvlBucket = lvlAttr("bucket_start")
    // the level-side bucket key is the SAME user expression over
    // bucket_start (every raw time in a level bucket shares its bucket
    // key with the bucket's start, since the level interval divides I) —
    // substituting the attribute preserves the user's exact spelling,
    // eval modes included
    def onLevelBucket(e: Expression): Expression = e.transformUp {
      case a: Attribute if a.exprId == timeAttr.exprId => lvlBucket
    }
    val newBucketExpr = onLevelBucket(bucketExpr)

    def mapAgg(fn: AggregateFunction): Option[Expression] = fn match {
      case Min(v: Attribute) if v.exprId == valueAttr.exprId =>
        Some(AggregateExpression(Min(lvlAttr("min_v")), Complete, isDistinct = false))
      case Max(v: Attribute) if v.exprId == valueAttr.exprId =>
        Some(AggregateExpression(Max(lvlAttr("max_v")), Complete, isDistinct = false))
      // count(<literal>) is count(*) only for NON-NULL literals —
      // count(NULL) is 0 for every group and must decline
      case Count(Seq(Literal(v, _))) if v != null =>
        Some(Coalesce(Seq(
          AggregateExpression(Sum(lvlAttr("cnt")), Complete, isDistinct = false),
          Literal(0L))))
      // count(value) ≠ count(*) when value can be NULL, and the level's
      // cnt counts rows, not non-null values — only derivable when the
      // raw value attribute is provably non-nullable (or install()
      // asserted data-level non-nullness); otherwise decline the
      // rewrite (the query falls back to the raw scan, still correct)
      case Count(Seq(v: Attribute))
          if v.exprId == valueAttr.exprId && (!v.nullable || entry.valueNotNull) =>
        Some(Coalesce(Seq(
          AggregateExpression(Sum(lvlAttr("cnt")), Complete, isDistinct = false),
          Literal(0L))))
      // the exact-domain quantization idiom sum(CAST(round(value*100) AS
      // BIGINT)) IS the level's sum_c — derivable under the same
      // no-NULL-values assertion (an all-NULL bucket sums to NULL on raw
      // but was folded to 0 in the level)
      // eval mode preserved: try_sum must stay try_sum after the
      // rewrite, or an int64 overflow would wrap/throw instead of
      // returning NULL — a silent answer change only when the rule fires
      case Sum(e, mode) if entry.valueNotNull && isQuantizedValue(e) =>
        Some(AggregateExpression(Sum(lvlAttr("sum_c"), mode), Complete,
          isDistinct = false))
      // avg(value) = (Σ sum_c / 100) / Σ cnt — requires BOTH install
      // assertions: no NULL values AND cent-quantized values (sum_c is
      // Σ round(v·100), so off the 0.01 grid this mean is the mean of
      // quantized values, up to 0.005/point wrong — see install()).
      // cnt > 0 is guaranteed by the baseCond bucket filter, so the
      // division can't hit zero. On the grid the rewritten form is the
      // exact integer-domain sum divided once, vs the raw plan's
      // shuffle-order double sum (itself not bitwise stable run-to-run)
      case Average(v: Attribute, _)
          if v.exprId == valueAttr.exprId && entry.valueNotNull &&
            entry.centQuantized =>
        val sumC = Cast(
          AggregateExpression(Sum(lvlAttr("sum_c")), Complete, isDistinct = false),
          org.apache.spark.sql.types.DoubleType)
        val cntS = Cast(
          AggregateExpression(Sum(lvlAttr("cnt")), Complete, isDistinct = false),
          org.apache.spark.sql.types.DoubleType)
        Some(Divide(Divide(sumC, Literal(100.0), EvalMode.LEGACY),
          cntS, EvalMode.LEGACY))
      // plain sum(value) = Σ sum_c / 100 — the same dual assertion as
      // avg: sum_c is Σ round(v·100), so off the cent grid the rewrite
      // is systematically wrong, and NULL values would vanish into the
      // level's 0-fold. On the grid, one int64 sum + one correctly-
      // rounded division replaces the raw plan's shuffle-order double
      // sum (itself not bitwise stable run-to-run). The double sum
      // cannot overflow where the int64 one could — the same accepted
      // exposure as the avg mapping (9.2e16 currency units)
      case Sum(v: Attribute, _)
          if v.exprId == valueAttr.exprId && entry.valueNotNull &&
            entry.centQuantized =>
        Some(Divide(Cast(
          AggregateExpression(Sum(lvlAttr("sum_c")), Complete, isDistinct = false),
          org.apache.spark.sql.types.DoubleType), Literal(100.0),
          EvalMode.LEGACY))
      case _ => None
    }

    def isQuantizedValue(e: Expression): Boolean = e match {
      case Cast(Round(Multiply(v: Attribute, Literal(c, _), _), Literal(0, _), _),
          t, _, _) =>
        v.exprId == valueAttr.exprId && c == 100.0 &&
          t == org.apache.spark.sql.types.LongType
      case _ => false
    }

    // the level-source monoid merges: re-bucketing a fine rung sums /
    // min-maxes its exact integer-domain components — including the
    // time-weighted mean's Σ integral_cus and Σ active_us, so that
    // rewrite is value-identical, not just statistically close
    val mergeable = Seq("sum_c", "cnt", "integral_cus", "active_us")
    def mapAggLvl(fn: AggregateFunction): Option[Expression] = fn match {
      case Min(v: Attribute) if childAttr("min_v").exists(_.exprId == v.exprId) =>
        Some(AggregateExpression(Min(lvlAttr("min_v")), Complete, isDistinct = false))
      case Max(v: Attribute) if childAttr("max_v").exists(_.exprId == v.exprId) =>
        Some(AggregateExpression(Max(lvlAttr("max_v")), Complete, isDistinct = false))
      case Sum(v: Attribute, mode) =>
        // safe lookup: install() only mandates the 6 base columns, so a
        // rung without integral/active columns declines instead of NPEs.
        // Eval mode preserved: a try_sum keeps its NULL-on-overflow
        // semantics on the rewritten plan
        mergeable.find(n => childAttr(n).exists(_.exprId == v.exprId))
          .flatMap(n => levelPlan.output.find(_.name == n))
          .map(a => AggregateExpression(Sum(a, mode), Complete,
            isDistinct = false))
      // count(*) over a level counts FINE BUCKETS, which a coarser rung
      // does not record — decline (likewise avg, count(col), etc.)
      case _ => None
    }
    val mapFn: AggregateFunction => Option[Expression] =
      if (srcLevelNs.isEmpty) mapAgg else mapAggLvl

    // a result may be ANY expression combining mapped aggregates, the
    // group keys, and literals — e.g. the reference's time-weighted mean
    // sum(integral_cus) / sum(active_us), or a cents→value division.
    // Recursion stops at aggregates (FILTER (WHERE …) / DISTINCT clauses
    // are not derivable from merged buckets — rewriting them as plain
    // merges would silently return wrong counts, so they decline),
    // substitutes the group keys, and refuses any other reference to
    // the source table.
    def mapResultExpr(e: Expression): Option[Expression] = e match {
      case AggregateExpression(fn, _, false, None, _) => mapFn(fn)
      case _: AggregateExpression => None
      case ex if ex.semanticEquals(bucketExpr) => Some(newBucketExpr)
      case a: Attribute if a.exprId == metricAttr.exprId => Some(lvlMetric)
      case _: Attribute => None
      case other =>
        val kids = other.children.map(mapResultExpr)
        if (kids.exists(_.isEmpty)) None
        else Some(other.withNewChildren(kids.map(_.get)))
    }

    val newResults = results.map {
      case a: Attribute if a.exprId == metricAttr.exprId =>
        Alias(lvlMetric, a.name)(exprId = a.exprId)
      case al @ Alias(e, name) =>
        mapResultExpr(e) match {
          case Some(m) => Alias(m, name)(exprId = al.exprId)
          case None => return None
        }
      case _ => return None
    }

    // A WHERE on the scan is derivable when every conjunct selects whole
    // level buckets: time bounds aligned to the LEVEL interval (>= L /
    // < U with L, U ≡ 0 mod interval₀ cut exactly between buckets — the
    // filtered raw row set equals the row set under the mapped bucket
    // filter, so even groups the coarser grouping only partially covers
    // agree), and predicates over the metric attribute alone (they
    // depend only on the group key, so filtering merged buckets equals
    // filtering raw rows). Anything else declines the rewrite.
    def mapPredicate(e: Expression): Option[Expression] = e match {
      case And(l, r) =>
        for { a <- mapPredicate(l); b <- mapPredicate(r) } yield And(a, b)
      // inferred null guard: a NULL-time row could only contribute to
      // the NULL bucket, so the two filters exclude identical content
      case IsNotNull(t: Attribute) if t.exprId == timeAttr.exprId =>
        Some(IsNotNull(lvlBucket))
      // bounds must be strictly positive: `time - time % I` truncates
      // toward zero, so bucket 0 spans (-I, +I) and a cut at or below 0
      // is NOT a bucket boundary for pre-epoch timestamps — a t = -1 row
      // shares bucket 0 with [0, I) rows and would leak through the
      // mapped filter
      case GreaterThanOrEqual(t: Attribute, l @ Literal(v: Long, _))
          if t.exprId == timeAttr.exprId && v > 0 && v % levelNs == 0 =>
        Some(GreaterThanOrEqual(lvlBucket, l))
      case LessThan(t: Attribute, l @ Literal(v: Long, _))
          if t.exprId == timeAttr.exprId && v > 0 && v % levelNs == 0 =>
        Some(LessThan(lvlBucket, l))
      case p if p.references.nonEmpty &&
          p.references.forall(_.exprId == metricAttr.exprId) &&
          p.deterministic =>
        Some(p.transformUp {
          case a: Attribute if a.exprId == metricAttr.exprId => lvlMetric
        })
      case _ => None
    }
    val mappedFilter = filterOpt match {
      case None => Some(None)
      case Some(cond) => mapPredicate(cond).map(Some(_))
    }
    val mapped = mappedFilter match {
      case Some(f) => f
      case None => return None
    }

    val newGroups = Seq[Expression](lvlMetric, newBucketExpr)
    // raw source: segment-only buckets (cnt = 0) carry no points — a raw
    // point aggregation would not produce their groups, so exclude them.
    // LEVEL source: cnt = 0 rows are real source rows (hold segments
    // carrying integral/active_time) that DO produce groups — keep them
    val conds = (if (srcLevelNs.isEmpty)
        Seq(GreaterThan(lvlAttr("cnt"), Literal(0L))) else Seq.empty) ++
      mapped.toSeq
    val levelRows =
      if (conds.isEmpty) levelPlan
      else org.apache.spark.sql.catalyst.plans.logical.Filter(
        conds.reduce(And), levelPlan)
    Some(Aggregate(newGroups, newResults, levelRows))
    } // rewriteOn

    // coarsest dividing level first: 10× fewer merged rows per rung; a
    // coarser level can still lose to a finer one on FILTER alignment
    // (bounds cut at level-0 boundaries but inside a coarse bucket), so
    // fall through the ladder until a level admits the whole rewrite
    entry.levels
      .filter { case (_, l) => admissible(l, i) }
      .sortBy { case (_, l) => -l }
      .iterator
      .map { case (plan, l) => rewriteOn(plan, l) }
      .collectFirst { case Some(p) => p }
  }
}
