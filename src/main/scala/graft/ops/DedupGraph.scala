package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Global duplicate-cluster resolution — the step AFTER pair generation that
  * every production dedup run needs (C4/RefinedWeb/SlimPajama keep one doc
  * per *connected component* of the dup graph, not one per pair): exact-dup
  * edges ∪ verified near-dup edges → connected components → a canonical doc
  * (the component's min id) plus the cluster size for removal accounting.
  *
  * Scale notes: components are computed by min-label propagation with pointer
  * jumping (comp ← min over {self} ∪ neighbor comps, then comp ← comp(comp)),
  * the DataFrame form of the two-phase star-contraction family (Kiveris et al.
  * "Connected Components in MapReduce and Beyond", SoCC'14). Propagation alone
  * converges in O(diameter) rounds; the pointer-jump halves label-tree depth
  * each round, giving O(log n) rounds on adversarial chain graphs (a chain of
  * mutually-truncated near-dups is exactly such a graph). Every round is two
  * bounded shuffles over the EDGE table (never docs²), partial-aggregating
  * `min` both times, so each round is AQE-sized and skew-splittable; the
  * convergence check reduces one BIGINT to the driver per round — the same
  * small-state iterate as the k-means trainer (AnnSearch).
  */
object DedupGraph {

  /** Undirected dup edges (doc_a < doc_b) over the corpus: exact-content
    * pairs (each content cluster's min id paired with every other member —
    * a star, which is enough for connectivity) ∪ LSH-candidate pairs whose
    * exact n-gram Jaccard clears `jaccardMin`. Pair generation is the
    * bucketed LSH family from [[TextOps]] — never all-pairs. */
  def dupEdges(docs: DataFrame, jaccardMin: Double = 0.9): DataFrame = {
    val exact = docs
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_a"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .join(docs.select(col("doc_id").as("doc_b"), md5(col("text")).as("h")), "h")
      .filter(col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
    val near = TextOps.ngramJaccard(docs)
      .filter(col("jaccard") >= jaccardMin)
      .select(col("doc_a"), col("doc_b"))
    exact.unionByName(near).distinct()
  }

  /** Connected components of an undirected (doc_a, doc_b) edge table.
    * Returns (doc_id, component) for every endpoint, component = the min
    * doc_id reachable. Deterministic at any partitioning: every step is a
    * `min` aggregate. `maxIters` is a safety bound far above the O(log n)
    * convergence of propagate+jump.
    *
    * Each round's label table is `localCheckpoint`ed, not merely cached:
    * one iteration references the previous labels four times (propagate ×2,
    * jump ×2), so an un-truncated logical plan QUADRUPLES per round and by
    * round ~10 the planner itself (cache-match walks, plan stringification)
    * is exponentially slower than the data — caching bounds recompute but
    * not plan size. Checkpointing pins each round to a constant-size plan,
    * the standard Spark iterate discipline (on a multi-executor cluster
    * swap in `checkpoint()` against reliable storage if executor loss
    * mid-loop must be survivable — the loop is otherwise restartable from
    * its inputs, so local is the right default). */
  def components(edges: DataFrame, maxIters: Int = 25): DataFrame = {
    val und = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    // materialize the (bounded, dup-density-sized) edge list once; every
    // round joins against it — checkpointed so the (possibly expensive)
    // pair-generation lineage is cut from every round's plan
    val undC = und.localCheckpoint()
    // SEED = round-1 propagate for free: comp₀(v) = min({v} ∪ neighbors) is
    // one partial-aggregating min over the edge table itself — no join (the
    // old identity seed paid a full join round to reach the same state).
    // Star components (the dominant dup shape: exact-content groups are
    // emitted as stars) are fully labelled by the seed alone, so the loop
    // often runs exactly one confirming round.
    var labels = undC.select(col("src").as("doc_id"), col("dst").as("comp"))
      .unionByName(undC.select(col("src").as("doc_id"), col("src").as("comp")))
      .groupBy(col("doc_id")).agg(min(col("comp")).as("comp"))
      .localCheckpoint()
    var converged = false
    var it = 0
    // Convergence by MONOTONE LABEL SUM for numeric ids: every round maps
    // comp(v) → min(comp(v), …) then comp(comp(v)) ≤ comp(v), so per-doc
    // labels never increase; Σcomp is therefore equal between rounds iff NO
    // row changed (all deltas ≤ 0 and Σdelta = 0 ⇒ all 0) — the identical
    // fixpoint the old changed-row join detected, for the cost of one local
    // scan of the just-checkpointed partitions. The r5 shape paid, per
    // round, a labels⋈labels exchange + join just to find one changed row.
    // Σ fits BIGINT for n·max_id < 2⁶³ (1.34 M docs × 2.6e10 ids at the
    // ×256 leg ≈ 3.4e16; a deployment past ~10¹⁴ id-docs swaps in a DECIMAL
    // sum). Non-numeric ids (the host-name graph of q153) cannot sum — they
    // keep the r5 changed-row join, which is fine at host-graph cardinality.
    // The propagate is the UNION form — labels ∪ edge-carried neighbor
    // labels into ONE partial-aggregating min — one fewer exchange per
    // round than the aggregate-then-left-join form, same minima.
    val numericIds = edges.schema.fields.head.dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    // seed-aware init: a graph the seed already labelled (all-star) then
    // exits after one confirming round instead of two
    var prevSum: Option[Any] =
      if (numericIds) Option(labels.agg(sum(col("comp"))).collect()(0).get(0))
      else None
    while (!converged && it < maxIters) {
      // propagate: comp ← min(own comp, neighbors' comps)
      val contrib = undC
        .join(labels.select(col("doc_id").as("dst"), col("comp")), "dst")
        .select(col("src").as("doc_id"), col("comp"))
      val prop = contrib.unionByName(labels)
        .groupBy(col("doc_id")).agg(min(col("comp")).as("comp"))
      // pointer jump: comp ← comp(comp) — labels are min-ids so the label
      // table itself maps old roots to newer, smaller roots
      val next = prop
        .join(prop.select(col("doc_id").as("comp"), col("comp").as("comp2")), Seq("comp"), "left")
        .select(col("doc_id"), coalesce(col("comp2"), col("comp")).as("comp"))
        .localCheckpoint()
      if (numericIds) {
        val s = Option(next.agg(sum(col("comp"))).collect()(0).get(0))
        // None == None on an empty edge set: converges after one round
        converged = s == prevSum
        prevSum = s
      } else {
        val changed = next.join(labels.withColumnRenamed("comp", "prev"), "doc_id")
          .filter(col("comp") =!= col("prev")).limit(1).count()
        converged = changed == 0L
      }
      labels = next
      it += 1
    }
    labels.select(col("doc_id"), col("comp").as("component"))
  }

  /** q132: SemDeDup-style SEMANTIC dedup ledger — near-duplicate *meaning*,
    * not near-duplicate *bytes* (Abbas et al. 2023: paraphrases, boilerplate
    * rewrites and template spins share embeddings, not shingles). Pairs come
    * from the SRP multi-table candidate path ([[graft.ops.AnnSearch]]
    * `nearDupPairs` — bucketed, capped, never all-pairs) at cosine ≥
    * `cosMin`; the same min-label propagation then closes them into
    * components so a chain of pairwise-similar paraphrases collapses to ONE
    * kept representative (pair-level keep-one would leave half of every odd
    * chain in the corpus). Output: one ledger row per vector that
    * participates in any semantic-dup relation. */
  def semanticDedup(pairs: DataFrame, cosMin: Double = 0.35): DataFrame = {
    val edges = pairs.filter(col("cos") >= cosMin)
      .select(col("va").as("doc_a"), col("vb").as("doc_b"))
    val comp = components(edges)
    val sizes = comp.groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "component")
      .select(col("doc_id").as("vec_id"), col("component"), col("cluster_size"),
        (col("doc_id") === col("component")).cast("int").as("keep"))
  }

  /** q142: canonical-document selection by QUALITY — inside each dup
    * component, keep the member with the best classifier score instead of
    * the smallest id (the policy step RefinedWeb/FineWeb-style pipelines run
    * after clustering: of N copies, retain the least-mangled one; min-id
    * keep would happily retain the truncated clone). Winner = max score,
    * ties broken by min doc_id via one `min(struct)` partial aggregate —
    * never a per-component window. Composes two oracle-checked chains
    * (dup components ∘ hashed quality classifier) end-to-end. */
  def canonicalPick(docs: DataFrame): DataFrame = {
    val comp = components(dupEdges(docs))
    val scored = QualityModels.qualityClassifier(docs)
      .select(col("doc_id"), col("avg_shift_ppk").as("score"))
    val m = comp.join(scored, "doc_id")
    val win = m.groupBy(col("component"))
      .agg(min(struct((-col("score")).as("ns"), col("doc_id").as("id"))).as("w"))
      .select(col("component"), col("w.id").as("winner"))
    m.join(win, "component")
      .select(col("doc_id"), col("component"), col("score"),
        (col("doc_id") === col("winner")).cast("int").as("keep"))
  }

  /** q118: every doc that participates in any dup relation, its component's
    * canonical id, and the component size — the keep/drop ledger of a
    * cluster-level dedup pass (keep ⇔ doc_id = component). */
  def dupComponents(docs: DataFrame, jaccardMin: Double = 0.9): DataFrame = {
    val comp = components(dupEdges(docs, jaccardMin))
    val sizes = comp.groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "component")
      .select(col("doc_id"), col("component"), col("cluster_size"),
        (col("doc_id") === col("component")).cast("int").as("keep"))
  }
}
