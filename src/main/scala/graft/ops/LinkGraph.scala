package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics over the web corpus: fixed-point PageRank — the
  * canonical iterated join+aggregate workload of web-scale curation (domain
  * authority as a quality prior, crawl prioritization, spam demotion).
  *
  * Determinism: ranks are BIGINT parts-per-billion with floor division at
  * every step (damping 0.85 as ·85/100, teleport 0.15/n as 150000000 div n),
  * so Spark and the DuckDB oracle agree bit-for-bit after any number of
  * rounds — libm-free, addition-order-free (integer sums commute exactly).
  * Mass lost to floors and to dangling nodes is NOT redistributed (the
  * simplification most production PR variants make); ranks remain a
  * deterministic total preorder, which is all a quality prior needs.
  *
  * Scale notes: each round is edges ⋈ ranks (shuffle on src, the edge table
  * partitioned once and reused) followed by ONE partial-aggregating exchange
  * on dst — the BSP round of Pregel-style PR, expressed relationally so AQE
  * sizes/skew-splits every round (a celebrity page with 10^8 in-links is a
  * hot REDUCE key with map-side combine, never a hot build side). The
  * iteration count is fixed and small (rank deltas decay geometrically; 3
  * rounds order a quality prior), so the lineage stays bounded — at a
  * production round count you'd checkpoint ranks every ~10 rounds through
  * the Snapshots writer rather than grow one plan.
  *
  * The graph is synthesized deterministically (k pseudo-random out-links per
  * doc via hash arithmetic over the contiguous base-doc id space) — the
  * corpus fixture has no real hyperlinks; the OPERATOR is the deliverable.
  */
object LinkGraph {

  /** Out-link edges: 3 quadratic-residue targets per base doc (self-links
    * dropped, duplicate targets collapsed) — many-to-one by design so the
    * graph has hubs and leaves. */
  def edges(docs: DataFrame): DataFrame = {
    val nodes = docs.filter(col("doc_id") < 1000000L).select(col("doc_id"))
    val n = nodes.agg(count(lit(1)).as("n"))
    nodes.crossJoin(broadcast(n)) // 1-row total, broadcast by construction
      .withColumn("k", explode(expr("sequence(0, 2)")))
      // quadratic map, NOT affine: x*48271+c mod n is a permutation whenever
      // gcd(48271, n) = 1, which would pin every in-degree at exactly 3 — a
      // quadratic residue map is many-to-one, so the graph grows real hubs
      // (hot reduce keys) and leaves (zero in-links), the shapes PR exists
      // to rank and the skew the plan must absorb
      .withColumn("dst", expr("(doc_id * doc_id + k * 7919 + 13) % n"))
      .filter(col("dst") =!= col("doc_id"))
      .select(col("doc_id").as("src"), col("dst"))
      .distinct()
  }

  /** q140: `iterations` rounds of fixed-point PageRank; per node the final
    * rank (ppb) plus in/out degree. */
  def pageRank(docs: DataFrame, iterations: Int = 3): DataFrame = {
    val nodes = docs.filter(col("doc_id") < 1000000L).select(col("doc_id"))
    val n = nodes.agg(count(lit(1)).as("n"))
    val withN = nodes.crossJoin(broadcast(n))
    val e = edges(docs)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    var ranks = withN.select(col("doc_id"), expr("1000000000 div n").as("r"))
    for (_ <- 1 to iterations) {
      val contrib = e.join(deg, "src")
        .join(ranks.select(col("doc_id").as("src"), col("r")), "src")
        .select(col("dst").as("doc_id"), expr("r div outdeg").as("c"))
        .groupBy(col("doc_id")).agg(sum(col("c")).as("m"))
      ranks = withN.join(contrib, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (expr("150000000 div n") +
            expr("(85 * coalesce(m, CAST(0 AS BIGINT))) div 100")).as("r"))
    }
    val indeg = e.select(col("dst").as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_in"))
    ranks
      .join(indeg, Seq("doc_id"), "left")
      .join(deg.select(col("src").as("doc_id"), col("outdeg")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("r").as("rank_ppb"),
        coalesce(col("n_in"), lit(0L)).as("n_in"),
        coalesce(col("outdeg"), lit(0L)).as("n_out"))
  }
}
