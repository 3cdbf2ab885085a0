package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]`), for embedding-based near-dup detection and similarity
  * retrieval at corpus scale.
  *
  * Determinism design: embeddings are quantized to int millis
  * (`round(x*1000)` — int8-style quantization, standard at scale), so dot
  * products and norms are exact BIGINT sums — order-insensitive, bit-equal in
  * any engine; only the final cosine divides in double.
  *
  * Two paths:
  *  - [[bruteTopK]]: exact top-k by quantized cosine — the baseline. Long-form
  *    (vec, pos, val) join so partial aggregation handles the fan-out.
  *  - [[srpTopK]] / [[nearDupPairs]]: scale paths — sign-random-projection
  *    buckets (adaptive bit count, multiple tables) prune candidates before
  *    the exact rerank; only intra-bucket pairs are scored.
  */
object AnnSearch {

  /** Long form (vec_id, pos, q) with quantized values. Zero terms are kept:
    * dropping them (mirrored in the oracle's qt CTE) would shrink the join
    * fan-in slightly, but the synthetic embeddings have almost no exact
    * zeros, so the plumbing stays simpler. */
  def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("pos"),
        round(col("v").cast("double") * 1000.0).cast("long").as("q"))

  /** ARRAY form of the quantization — same per-element `round(v·1000)` (the
    * identical Spark `round`, HALF_UP), kept as one `array<bigint>` per
    * vector so signature/rerank math can run per row instead of over a
    * posexploded (vec, pos, q) table. */
  def quantizedArr(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), expr(
      "transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1000.0) AS BIGINT))").as("qa"))

  def norms(quant: DataFrame): DataFrame =
    quant.groupBy(col("vec_id")).agg(sum(col("q") * col("q")).as("n2"))

  /** Norms off the array form: one higher-order `aggregate` per row — no
    * explode, no exchange; integer sums commute so values match [[norms]]. */
  def normsArr(qarr: DataFrame): DataFrame =
    qarr.select(col("vec_id"),
      expr("aggregate(qa, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)").as("n2"))

  /** Exact top-k neighbors of the query vectors (vec_id % queryMod == 0),
    * excluding self. Output: (qvec, rank, vec, cos). */
  def bruteTopK(emb: DataFrame, k: Int = 5, queryMod: Int = 250): DataFrame = {
    val q = quantized(emb).cache()
    val n = norms(q)
    val queries = q.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qvec"), col("pos"), col("q").as("qq"))
    val dots = queries.join(q, "pos")
      .groupBy(col("qvec"), col("vec_id").as("vec"))
      .agg(sum(col("qq") * col("q")).as("dot"))
      .filter(col("qvec") =!= col("vec"))
    val scored = dots
      .join(n.select(col("vec_id").as("qvec"), col("n2").as("qn")), "qvec")
      .join(n.select(col("vec_id").as("vec"), col("n2").as("vn")), "vec")
      .select(col("qvec"), col("vec"),
        (col("dot").cast("double") / (sqrt(col("qn").cast("double")) * sqrt(col("vn").cast("double")))).as("cos"))
    val w = Window.partitionBy(col("qvec")).orderBy(col("cos").desc, col("vec").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qvec"), col("rank"), col("vec"), col("cos"))
  }

  /** Sign-random-projection bucket id: sign bits of dot products with
    * deterministic ±1 hyperplanes. The sign for (table, hyperplane b, pos) is
    * a mid bit of a Knuth multiplicative hash — a LINEAR parity like
    * (pos·197 + b·131) % 2 degenerates to one hyperplane repeated up to sign
    * (all odd multipliers preserve parity), which this must avoid. */
  def srpBuckets(emb: DataFrame, nBits: Int = 8, tableSeed: Int = 0): DataFrame =
    // FUSED ([[graft.functions.GraftAnn.srpBucket]]): the posexplode →
    // nBits-sum aggregate → sign recombination collapses to one per-row
    // array pass — no generator, no exchange, bit-identical bucket ids
    // (same Knuth-hash hyperplane signs; integer sums commute)
    quantizedArr(emb).select(col("vec_id"),
      graft.functions.SrpBucket.srpBucket(col("qa"), nBits, tableSeed).as("bucket"))

  /** Multi-table SRP ANN (the production scale path): candidates = vectors
    * sharing a bucket in ANY of `tables` hyperplane families (classic
    * multi-table LSH recall amplification), exact quantized-cosine rerank,
    * top-k per query. Only intra-bucket pairs are ever scored.
    *
    * Knobs trade candidate count vs recall: each bit halves (roughly) the
    * bucket population; each table multiplies recall. Measured on the
    * synthetic embeddings (weakly clustered, neighbor cos ≈ 0.4):
    * (2 bits, 12 tables) → recall@5 = 0.95; (4, 8) → 0.50. Tightly-clustered
    * real text embeddings support more bits at the same recall. */
  def srpTopK(emb: DataFrame, k: Int = 5, nBits: Int = 4, tables: Int = 8,
      queryMod: Int = 250): DataFrame = {
    val q = quantized(emb).cache()
    val n = norms(q)
    val cand = (0 until tables).map { t =>
      val b = srpBuckets(emb, nBits, t)
      val left = b.filter(col("vec_id") % queryMod === 0)
        .select(col("bucket"), col("vec_id").as("qvec"))
      val right = b.select(col("bucket"), col("vec_id").as("vec"))
      left.join(right, "bucket").filter(col("qvec") =!= col("vec"))
        .select("qvec", "vec")
    }.reduce(_ unionByName _).distinct()
    val ql = q.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qvec"), col("pos"), col("q").as("qq"))
    val dots = cand
      .hint("shuffle_hash") // build = candidate chain; posexploded q is 256× under-estimated
      .join(ql, "qvec")
      .hint("shuffle_hash")
      .join(q.select(col("vec_id").as("vec"), col("pos"), col("q")), Seq("vec", "pos"))
      .groupBy(col("qvec"), col("vec"))
      .agg(sum(col("qq") * col("q")).as("dot"))
    val scored = dots
      .join(n.select(col("vec_id").as("qvec"), col("n2").as("qn")), "qvec")
      .join(n.select(col("vec_id").as("vec"), col("n2").as("vn")), "vec")
      .select(col("qvec"), col("vec"),
        (col("dot").cast("double") / (sqrt(col("qn").cast("double")) * sqrt(col("vn").cast("double")))).as("cos"))
    val w = Window.partitionBy(col("qvec")).orderBy(col("cos").desc, col("vec").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qvec"), col("rank"), col("vec"), col("cos"))
  }

  /** IVF (inverted-file) ANN — the cluster-pruned COMPARISON BASELINE beside
    * the hash-pruned SRP tables: a deterministic coarse quantizer (every
    * `centroidMod`-th vector stands in for a trained centroid set), each
    * vector assigned to its best centroid's list (argmax cos; |v| cancels so
    * the score is dot/√|c|²), queries probe the `nProbe` nearest lists and
    * exact-rerank only those candidates.
    *
    * PRODUCTION-PATH VERDICT (round-4 sweep + round-5 bounded retune,
    * `graft.tools.IvfTune`, recorded in AnnSpec): the round-4 grid
    * (C ≤ 40) topped out at recall@5 = 0.525 at a 10 % scan; the round-5
    * levers — finer quantization and SOAR-style multi-assignment
    * (`nAssign`) — clear the bar: C = 80 (≈25 vecs/list, kmeans++ +
    * 3 Lloyd rounds), nProbe = 8 reaches recall@5 = 0.600 at a MEASURED
    * 9.9 % scanned fraction, and nAssign = 2 extends the curve to
    * 0.725 at 19 %. Multi-table SRP ([[srpTopK]], recall 0.95 at
    * comparable budget) remains the engine's production ANN path on these
    * weakly-clustered synthetic embeddings (neighbor cos ≈ 0.4); IVF is a
    * bar-meeting baseline a tightly-clustered real corpus would
    * re-promote.
    *
    * Scale shape: assignment is O(N·C·d) map work against a BROADCAST
    * centroid table (C ≪ N); the probe→candidate join shuffles on the list
    * id (lists ≈ N/C vectors); rerank cost is nProbe/C of brute force. */
  def ivfTopK(emb: DataFrame, k: Int = 5, nProbe: Int = 3, centroidMod: Int = 50,
      queryMod: Int = 250): DataFrame = {
    val q = quantized(emb).cache()
    val n = norms(q)
    val cq = q.filter(col("vec_id") % centroidMod === 7)
      .select(col("vec_id").as("cid"), col("pos"), col("q").as("cq"))
    val cn = n.filter(col("vec_id") % centroidMod === 7)
      .select(col("vec_id").as("cid"), col("n2").as("cn2"))
    val scores = q.join(broadcast(cq), "pos")
      .groupBy(col("vec_id"), col("cid"))
      .agg(sum(col("q") * col("cq")).as("dot"))
      .join(broadcast(cn), "cid")
      .withColumn("score", col("dot").cast("double") / sqrt(col("cn2").cast("double")))
    val assign = scores.groupBy(col("vec_id"))
      .agg(min(struct((-col("score")).as("ns"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"))
    val wq = Window.partitionBy(col("vec_id")).orderBy(col("score").desc, col("cid").asc)
    val probes = scores.filter(col("vec_id") % queryMod === 0)
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= nProbe)
      .select(col("vec_id").as("qvec"), col("cid"))
    val cand = probes.join(assign, "cid")
      .filter(col("qvec") =!= col("vec_id"))
      .select(col("qvec"), col("vec_id").as("vec")).distinct()
    val dots = cand
      .hint("shuffle_hash")
      .join(q.select(col("vec_id").as("qvec"), col("pos"), col("q").as("qq")), "qvec")
      .hint("shuffle_hash")
      .join(q.select(col("vec_id").as("vec"), col("pos"), col("q")), Seq("vec", "pos"))
      .groupBy(col("qvec"), col("vec"))
      .agg(sum(col("qq") * col("q")).as("dot"))
    val scored = dots
      .join(n.select(col("vec_id").as("qvec"), col("n2").as("qn")), "qvec")
      .join(n.select(col("vec_id").as("vec"), col("n2").as("vn")), "vec")
      .select(col("qvec"), col("vec"),
        (col("dot").cast("double") / (sqrt(col("qn").cast("double")) * sqrt(col("vn").cast("double")))).as("cos"))
    val w = Window.partitionBy(col("qvec")).orderBy(col("cos").desc, col("vec").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qvec"), col("rank"), col("vec"), col("cos"))
  }

  /** One distributed Lloyd (k-means) iteration over the quantized embeddings
    * (q80) — the clustering step every IVF/embedding-curation pipeline
    * re-runs at scale. E-step: argmax-cosine assignment against the
    * deterministic coarse centroid subset (`vec_id % centroidMod == 7`, the
    * same quantizer [[ivfTopK]] probes). M-step: per-(cluster, dim) EXACT
    * BIGINT component sums + member counts — quantized sums are
    * order-insensitive where float means are not; the caller divides when a
    * float centroid is wanted.
    *
    * Scale shape: centroids broadcast; the E-step is one partial-aggregating
    * groupBy per (vector, centroid) dot; the M-step is one partial-aggregating
    * groupBy on (cluster, dim) — two bounded shuffles, no iteration inside
    * the plan (drive rounds from the caller). */
  def kmeansStep(emb: DataFrame, centroidMod: Int = 50): DataFrame = {
    val q = quantized(emb).cache()
    val cq = q.filter(col("vec_id") % centroidMod === 7)
      .select(col("vec_id").as("cid"), col("pos"), col("q").as("cq"))
    val cn = norms(q).filter(col("vec_id") % centroidMod === 7)
      .select(col("vec_id").as("cid"), col("n2").as("cn2"))
    val assign = q.join(broadcast(cq), "pos")
      .groupBy(col("vec_id"), col("cid"))
      .agg(sum(col("q") * col("cq")).as("dot"))
      .join(broadcast(cn), "cid")
      .withColumn("score", col("dot").cast("double") / sqrt(col("cn2").cast("double")))
      .groupBy(col("vec_id"))
      .agg(min(struct((-col("score")).as("ns"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"))
    q.join(assign.hint("shuffle_hash"), "vec_id")
      .groupBy(col("cid"), col("pos"))
      .agg(sum(col("q")).as("sum_q"), count(lit(1)).as("n_members"))
  }

  /** Float centroids from one [[kmeansStep]] M-step: component mean per
    * (cluster, dim). The trained table plugs straight into [[ivfTopKWith]]
    * — the compose-don't-iterate path a production IVF build runs a few
    * rounds of before freezing the quantizer. */
  def trainedCentroids(emb: DataFrame, centroidMod: Int = 50): DataFrame =
    kmeansStep(emb, centroidMod)
      .select(col("cid"), col("pos"),
        (col("sum_q").cast("double") / col("n_members").cast("double")).as("cq"))

  /** One Lloyd round against an ARBITRARY float centroid table: E-step
    * assignment (argmax dot/√|c|², broadcast centroids), M-step component
    * means. Same two-bounded-shuffle shape as [[kmeansStep]]. */
  def kmeansStepWith(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val q = quantized(emb).cache()
    val cents = centroids
    val cn = cents.groupBy(col("cid")).agg(sum(col("cq") * col("cq")).as("cn2"))
    val assign = q.join(broadcast(cents), "pos")
      .groupBy(col("vec_id"), col("cid"))
      .agg(sum(col("q").cast("double") * col("cq")).as("dot"))
      .join(broadcast(cn), "cid")
      .withColumn("score", col("dot") / sqrt(col("cn2")))
      .groupBy(col("vec_id"))
      .agg(min(struct((-col("score")).as("ns"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"))
    q.join(assign.hint("shuffle_hash"), "vec_id")
      .groupBy(col("cid"), col("pos"))
      .agg((sum(col("q")).cast("double") / count(lit(1)).cast("double")).as("cq"))
  }

  /** Multi-round Lloyd driver loop — the production IVF training job.
    * Round state is the centroid table only (~C·d rows): each round it is
    * collected, re-localized and re-broadcast — the canonical Spark
    * iterate-with-small-state shape (lineage stays one round deep; the big
    * embedding table is scanned once per round, never iterated over on the
    * driver). Returns (cid, pos, cq) after `rounds` rounds. */
  def kmeansIterate(emb: DataFrame, rounds: Int, centroidMod: Int = 50): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    var cents = trainedCentroids(emb, centroidMod)
    for (_ <- 2 to rounds) {
      val local = cents.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
      cents = kmeansStepWith(emb, local.toDF("cid", "pos", "cq"))
    }
    cents
  }

  /** Deterministic kmeans++-style seeding: farthest-first traversal in
    * cosine distance over a collected sample of the quantized vectors
    * (`vec_id % sampleMod == 0`; the full table at test scale, a bounded
    * sample at 100 TB — seeding state is C·d either way, the canonical
    * small-state driver step). Replaces the id-subset quantizer
    * (`vec_id % 50 == 7`) whose centroids were just arbitrary corpus
    * vectors: farthest-first spreads the seeds across the direction space,
    * which is exactly what the weakly-clustered synthetic embeddings punish
    * the id-subset for. Start = lowest vec_id; every tie breaks to the
    * lowest index — fully deterministic, no RNG. */
  def seedCentroidsPP(emb: DataFrame, c: Int = 40, sampleMod: Int = 1): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val rows = quantized(emb).filter(col("vec_id") % sampleMod === 0)
      .groupBy(col("vec_id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("q")))).as("v"))
      .collect()
    val vecs: Array[(Long, Array[Double])] = rows.map { r =>
      val arr = r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1).toDouble).toArray
      (r.getLong(0), arr)
    }.sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val units = vecs.map { case (_, v) =>
      val n = math.sqrt(dot(v, v)); v.map(_ / n)
    }
    val chosen = scala.collection.mutable.ArrayBuffer[Int](0)
    val taken = Array.fill(units.length)(false); taken(0) = true
    val minDist = Array.fill(units.length)(Double.MaxValue)
    while (chosen.size < math.min(c, units.length)) {
      val last = units(chosen.last)
      var bestI = -1; var bestD = -1.0
      var i = 0
      while (i < units.length) {
        val d = 1.0 - dot(units(i), last)
        if (d < minDist(i)) minDist(i) = d
        if (!taken(i) && minDist(i) > bestD) { bestD = minDist(i); bestI = i }
        i += 1
      }
      chosen += bestI; taken(bestI) = true
    }
    chosen.zipWithIndex.flatMap { case (idx, cid) =>
      vecs(idx)._2.zipWithIndex.map { case (qv, pos) => (cid.toLong, pos, qv) }
    }.toSeq.toDF("cid", "pos", "cq")
  }

  /** Multi-round Lloyd from an ARBITRARY initial centroid table — the
    * production IVF training loop: kmeans++ seeding ([[seedCentroidsPP]])
    * followed by collect/re-broadcast rounds of [[kmeansStepWith]]. */
  def kmeansIterateFrom(emb: DataFrame, init: DataFrame, rounds: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    var cents = init
    for (_ <- 1 to rounds) {
      val local = cents.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
      cents = kmeansStepWith(emb, local.toDF("cid", "pos", "cq"))
    }
    cents
  }

  /** Candidate (qvec, vec) pairs an IVF probe reranks, against an arbitrary
    * centroid table — the first half of [[ivfTopKWith]], exposed standalone
    * so the tuning sweep can measure the ACTUAL scanned fraction: probed
    * lists are population-skewed after Lloyd rounds, so the nominal
    * nProbe/C badly under- or over-states the real rerank cost.
    *
    * `nAssign` > 1 indexes each vector under its `nAssign` best lists
    * (multi-assignment / spilled lists, the SOAR-family recall lever):
    * the index grows nAssign×, queries keep probing nProbe lists, and a
    * true neighbor straddling a Voronoi boundary is findable from either
    * side. The scanned fraction is still MEASURED (candidates are distinct
    * pairs), so the recall-at-cost comparison stays honest. */
  def ivfCandidatesWith(emb: DataFrame, centroids: DataFrame, nProbe: Int = 3,
      queryMod: Int = 250, nAssign: Int = 1): DataFrame = {
    val q = quantized(emb)
    val cn = centroids.groupBy(col("cid")).agg(sum(col("cq") * col("cq")).as("cn2"))
    val scores = q.join(broadcast(centroids), "pos")
      .groupBy(col("vec_id"), col("cid"))
      .agg(sum(col("q").cast("double") * col("cq")).as("dot"))
      .join(broadcast(cn), "cid")
      .withColumn("score", col("dot") / sqrt(col("cn2")))
    val wq = Window.partitionBy(col("vec_id")).orderBy(col("score").desc, col("cid").asc)
    val assign =
      if (nAssign <= 1)
        // single assignment stays the partial-aggregating min(struct) shape
        // (no window, map-side combine)
        scores.groupBy(col("vec_id"))
          .agg(min(struct((-col("score")).as("ns"), col("cid"))).as("m"))
          .select(col("vec_id"), col("m.cid").as("cid"))
      else
        scores.withColumn("rn", row_number().over(wq)).filter(col("rn") <= nAssign)
          .select(col("vec_id"), col("cid"))
    val probes = scores.filter(col("vec_id") % queryMod === 0)
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= nProbe)
      .select(col("vec_id").as("qvec"), col("cid"))
    probes.join(assign, "cid")
      .filter(col("qvec") =!= col("vec_id"))
      .select(col("qvec"), col("vec_id").as("vec")).distinct()
  }

  /** IVF top-k against an ARBITRARY centroid table (cid, pos, cq: double) —
    * the generalized form of [[ivfTopK]] (whose deterministic quantizer is
    * the oracle-checked instance). Same plan shape: broadcast centroids,
    * one assignment aggregate, list-id shuffle, exact rerank of probed
    * lists only. */
  def ivfTopKWith(emb: DataFrame, centroids: DataFrame, k: Int = 5,
      nProbe: Int = 3, queryMod: Int = 250, nAssign: Int = 1): DataFrame = {
    val q = quantized(emb).cache()
    val n = norms(q)
    val cents = centroids.cache()
    val cand = ivfCandidatesWith(emb, cents, nProbe, queryMod, nAssign)
    val dots = cand
      .hint("shuffle_hash")
      .join(q.select(col("vec_id").as("qvec"), col("pos"), col("q").as("qq")), "qvec")
      .hint("shuffle_hash")
      .join(q.select(col("vec_id").as("vec"), col("pos"), col("q")), Seq("vec", "pos"))
      .groupBy(col("qvec"), col("vec"))
      .agg(sum(col("qq") * col("q")).as("dot"))
    val scored = dots
      .join(n.select(col("vec_id").as("qvec"), col("n2").as("qn")), "qvec")
      .join(n.select(col("vec_id").as("vec"), col("n2").as("vn")), "vec")
      .select(col("qvec"), col("vec"),
        (col("dot").cast("double") / (sqrt(col("qn").cast("double")) * sqrt(col("vn").cast("double")))).as("cos"))
    val w = Window.partitionBy(col("qvec")).orderBy(col("cos").desc, col("vec").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qvec"), col("rank"), col("vec"), col("cos"))
  }

  /** Adaptive SRP bit count: the smallest b with 2^b ≥ ceil(n/targetBucket),
    * clamped to [2, 16] — so expected bucket population stays ≈ targetBucket
    * as the corpus grows and intra-bucket pair work stays ~n·targetBucket
    * (LINEAR in n) instead of the O(n²/2^bits) a fixed bit count degrades to.
    * Mirrored in the oracle from the same count via length(bin(m−1)). */
  def adaptiveBits(n: Long, targetBucket: Int): Int = {
    val m = (n + targetBucket - 1) / targetBucket
    if (m <= 1) 2
    else math.max(2, math.min(16, 64 - java.lang.Long.numberOfLeadingZeros(m - 1)))
  }

  /** Candidate near-duplicate pairs: union over `tables` independent SRP
    * hyperplane families of CAPPED intra-bucket pairs, with the bit count
    * chosen from the corpus size ([[adaptiveBits]]).
    *
    * Two mechanisms bound the work:
    *  - adaptive bits keep EXPECTED bucket population ≈ targetBucket, but
    *    co-directional clusters share every SRP sign and cannot be split by
    *    more hyperplanes;
    *  - so within each bucket every vector pairs only with its next `cap`
    *    neighbors in a per-table hash order — pair count ≤ tables·cap·n,
    *    STRICTLY linear, as an equi-join on (bucket, rank+k) (no m² blowup
    *    even transiently). Each table uses a different order, so a pair
    *    missed in one table's window is recovered by another (measured in
    *    AnnSpec); only degenerate mega-clusters lose recall, and those are
    *    exact-dup territory anyway. */
  def nearDupCandidates(emb: DataFrame, targetBucket: Int = 32, tables: Int = 8,
      cap: Int = 8, nDocs: Long = -1L): DataFrame = {
    val nBits = adaptiveBits(if (nDocs >= 0) nDocs else emb.count(), targetBucket)
    (0 until tables).map { t =>
      // vec_id tie-break: two vectors colliding mod 1e9+7 in one bucket must
      // rank deterministically (and identically to the SQL oracle)
      val w = Window.partitionBy(col("bucket"))
        .orderBy(((col("vec_id") + lit(t * 7919)) * lit(2654435761L)) % lit(1000000007L),
          col("vec_id"))
      val r = srpBuckets(emb, nBits, t).withColumn("rn", row_number().over(w))
      val probe = r.withColumn("k", explode(sequence(lit(1), lit(cap))))
        .select(col("bucket"), col("vec_id").as("ia"), (col("rn") + col("k")).as("rn"))
      probe.join(r.select(col("bucket"), col("vec_id").as("ib"), col("rn")), Seq("bucket", "rn"))
        .select(least(col("ia"), col("ib")).as("va"), greatest(col("ia"), col("ib")).as("vb"))
    }.reduce(_ unionByName _).distinct()
  }

  /** Scored-pairs artifact location: keyed by the sf dir name, the corpus
    * size and a logic version, so a stale artifact from an older code
    * revision or another scale can never satisfy a read. */
  def nearDupPairsArtifactPath(sfDir: String, n: Long): String =
    s"/tmp/graft_artifacts/neardup_pairs_v1_${new java.io.File(sfDir).getName}_$n"

  /** Compute the near-dup scored pairs ONCE and persist them (the
    * `dedupArtifacts` pattern): the production pipeline materializes the
    * candidate+cosine table as an artifact and every report reads it. The
    * builder (q49) returns the READ-BACK of what it wrote, so its measured
    * cost is the honest end-to-end build; sibling reports (q94) call
    * [[readNearDupPairs]] and pay only the artifact scan.
    *
    * Publish is ATOMIC: the pairs land in a staging directory and move into
    * the live path with one rename, so a crash mid-write can never leave a
    * torn artifact a later reader would trust ([[readNearDupPairs]] also
    * requires the committer's _SUCCESS marker). */
  def writeNearDupPairs(emb: DataFrame, sfDir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val n = emb.count()
    val path = nearDupPairsArtifactPath(sfDir, n)
    val staging = path + ".staging"
    nearDupPairsN(emb, n).write.mode("overwrite").parquet(staging)
    val live = Paths.get(path)
    // delete-then-rename: a crash between the two leaves NO live dir, and
    // the reader falls back to the inline chain
    if (Files.isDirectory(live)) {
      Files.walk(live).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    Files.move(Paths.get(staging), live, StandardCopyOption.ATOMIC_MOVE)
    emb.sparkSession.read.parquet(path)
  }

  /** Read the persisted pairs artifact; falls back to the inline chain when
    * no COMMITTED artifact exists (standalone report run, or a torn write —
    * the _SUCCESS marker gates trust). */
  def readNearDupPairs(emb: DataFrame, sfDir: String): DataFrame = {
    val n = emb.count()
    val path = nearDupPairsArtifactPath(sfDir, n)
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS")))
      emb.sparkSession.read.parquet(path)
    else nearDupPairsN(emb, n)
  }

  /** Embedding-cosine near-dup pairs (q49 scale path): adaptive multi-table
    * SRP candidates, then the exact quantized-cosine rerank. Replaces the
    * round-1 fixed-8-bit single-table form whose intra-bucket pair count grew
    * O(n²/256). */
  def nearDupPairs(emb: DataFrame, targetBucket: Int = 32, tables: Int = 8): DataFrame =
    nearDupPairsN(emb, -1L, targetBucket, tables)

  /** [[nearDupPairs]] with the corpus count supplied by a caller that
    * already paid for it (the artifact helpers) — avoids a second full
    * count job per invocation. */
  private def nearDupPairsN(emb: DataFrame, nDocs: Long,
      targetBucket: Int = 32, tables: Int = 8): DataFrame = {
    val cand = nearDupCandidates(emb, targetBucket, tables, nDocs = nDocs)
    // ARRAY-form rerank: attach each side's quantized array + norm with two
    // narrow vec_id joins and compute the dot per PAIR ROW via
    // zip_with/aggregate — the (vec,pos,q)-exploded form shuffled dim× more
    // rows through two shuffle_hash joins plus a (va,vb) aggregate exchange.
    // Integer sums commute, so dot/norm values (and the one double divide)
    // are bit-identical.
    val qa = quantizedArr(emb)
      .withColumn("n2", expr("aggregate(qa, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"))
    cand
      .join(qa.select(col("vec_id").as("va"), col("qa").as("qaa"), col("n2").as("na")), "va")
      .join(qa.select(col("vec_id").as("vb"), col("qa").as("qab"), col("n2").as("nb")), "vb")
      .select(col("va"), col("vb"),
        expr("aggregate(zip_with(qaa, qab, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, x) -> acc + x)")
          .as("dot"),
        col("na"), col("nb"))
      .select(col("va"), col("vb"),
        (col("dot").cast("double") / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))).as("cos"))
  }
}
