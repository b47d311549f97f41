package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-graph centrality (SURVEY §2.10 X29) — the link-graph quality
  * signal crawl pipelines compute over hosts (Common Crawl publishes
  * harmonic/PageRank-style host ranks; pipelines join them back as a
  * document quality prior). One damped power-iteration step over an
  * edge list, in EXACT int64 arithmetic so iterations are
  * bit-deterministic in any engine:
  *
  *   rank'(h) = (15·SCALE + 85·Σ_{(s,h)∈E} (rank(s) div out(s))) div 100
  *
  * i.e. damping 0.85 and a uniform base, all in integer thirds of the
  * classic formulation — truncating division sheds at most out(s)−1
  * rank units per source per step (bounded, documented), and dangling
  * hosts / edges to hosts outside the rank universe shed their mass
  * exactly as the classic simplification does. The rank universe IS
  * the `ranks` frame: hosts never linked keep the damped base.
  *
  * Scale shape per iteration: one out-degree aggregation over edges
  * (partial), one equi-join edges↔ranks on the source (sort-merge at
  * web scale, broadcast when the rank table is small), one partial
  * re-aggregation of contributions by destination, one left join back
  * to the rank universe. No window, no collect, no driver-side state —
  * iterating is re-calling with the returned frame.
  */
object HostGraph {

  /** Uniform initial rank — SCALE units per host. */
  val Scale = 1000000L

  def uniformRanks(hosts: DataFrame): DataFrame =
    hosts.select(col("host")).distinct().withColumn("rank", lit(Scale))

  /** One damped iteration; `edges` is a DISTINCT (src, dst) edge list
    * (dedupe upstream — multi-edges would double-count contributions).
    */
  def rankIter(edges: DataFrame, ranks: DataFrame): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("out_deg"))
    val contrib = edges.join(deg, "src")
      .join(ranks.select(col("host").as("src"), col("rank")), "src")
      .select(col("dst").as("host"), expr("rank div out_deg").as("c"))
      .groupBy("host").agg(sum("c").as("in_sum"))
    ranks.join(contrib, Seq("host"), "left")
      .select(col("host"),
        expr(s"(15 * ${Scale}L + 85 * coalesce(in_sum, 0L)) div 100")
          .as("rank"))
  }
}
