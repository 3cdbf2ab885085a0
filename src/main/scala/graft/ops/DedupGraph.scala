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
    val near = TextOps.ngramJaccardFrom(TextOps.shingleHashes(docs))
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
    var labels = undC.select(col("src").as("doc_id")).distinct()
      .withColumn("comp", col("doc_id")).localCheckpoint()
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      // propagate: comp ← min(own comp, neighbors' comps)
      val viaNbr = undC
        .join(labels.select(col("doc_id").as("dst"), col("comp")), "dst")
        .groupBy(col("src").as("doc_id")).agg(min(col("comp")).as("nc"))
      val prop = labels.join(viaNbr, Seq("doc_id"), "left")
        .select(col("doc_id"), least(col("comp"), coalesce(col("nc"), col("comp"))).as("comp"))
      // pointer jump: comp ← comp(comp) — labels are min-ids so the label
      // table itself maps old roots to newer, smaller roots
      val next = prop
        .join(prop.select(col("doc_id").as("comp"), col("comp").as("comp2")), Seq("comp"), "left")
        .select(col("doc_id"), coalesce(col("comp2"), col("comp")).as("comp"))
        .localCheckpoint()
      val changed = next.join(labels.withColumnRenamed("comp", "prev"), "doc_id")
        .filter(col("comp") =!= col("prev")).limit(1).count()
      labels = next
      converged = changed == 0L
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
