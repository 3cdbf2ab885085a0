package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Agreement
import graft.pipeline.Inundate
import graft.synth.Synth

/** Per-round benchmark: one JSON line on stdout.
  * Headline metric: flagship spatial-join + tile-assignment throughput in
  * pages/sec (scan → geocode → H3 encode → PIP broadcast join → rating
  * interp → depth/class → mosaic → agreement → metrics), on an 8×-exploded
  * pages table. `queries` carries per-operator wall seconds.
  */
object Bench {

  /** Points table multiplied `m`× with distinct pids (bench-scale corpus). */
  def scaledPoints(spark: SparkSession, sfDir: String, m: Int, parts: Int): DataFrame =
    Synth.withGeo(
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select((col("l_orderkey") * 8 + col("l_linenumber")).cast("long").as("pid0"))
        .repartition(parts, col("pid0"))
        .withColumn("j", explode(sequence(lit(0), lit(m - 1))))
        .select((col("pid0") + col("j") * 50000000L).as("pid")))

  /** Web corpus multiplied `m`× (m ≤ 312): distinct doc_ids and a per-copy
    * AFFINE-permuted alphabet (x → a·x + b mod 26, a coprime to 26 — the
    * classical affine cipher; 12 units × 26 shifts = 312 distinct
    * permutations), making the copies m INDEPENDENT shards of the same
    * duplicate distribution — each shard replicates the base corpus's
    * engineered clone structure but shares (essentially) no shingles across
    * shards: two distinct affine maps agree on at most 2 letters (same a →
    * 0; different a → gcd(a₁−a₂, 26) = 2 ⇒ 0 or 2 fixed points), so a
    * cross-shard 8-gram collision needs a gram drawn ENTIRELY from a
    * specific ≤2-letter set (e.g. "anananan") — and even such an isolated
    * shared shingle cannot become an LSH candidate (a band needs 4
    * consecutive minhash agreements). Every dedup-family operator therefore
    * scales LINEARLY on it (an exact-copy explode would instead manufacture
    * m-sized duplicate cliques and quadratic pair counts the real crawl
    * doesn't have). Shards 0–25 (a = 1) reproduce the old pure-rotation
    * scheme exactly. */
  def scaledCorpus(spark: SparkSession, sfDir: String, m: Int): DataFrame = {
    val units = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25) // coprime to 26
    require(m >= 1 && m <= 26 * units.size,
      s"m=$m: beyond ${26 * units.size} shards the affine-permutation space " +
        "wraps and identical-alphabet shard pairs manufacture cross-shard " +
        "duplicate cliques (below it, distinct permutations share at most " +
        "2 fixed letters — no realistic 8-gram collides)")
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val base = Synth.corpus(spark, sfDir)
    (0 until m).map { j =>
      val a = units(j / 26); val b = j % 26
      val perm = (0 until 26).map(i => alpha((a * i + b) % 26)).mkString
      base.select((col("doc_id") + lit(j.toLong * 100000000L)).as("doc_id"),
        translate(col("text"), alpha, perm).as("text"), col("lang"))
    }.reduce(_ unionByName _)
  }

  /** One flagship end-to-end run; returns (rows processed, seconds).
    * Single action: the contingency counts and the processed-page total come
    * out of ONE aggregate over the mosaic (no recomputation). */
  def flagship(spark: SparkSession, sfDir: String, m: Int, parts: Int): (Long, Double) = {
    val t0 = System.nanoTime()
    val pts = scaledPoints(spark, sfDir, m, parts)
    if (sys.env.get("SPARK_GRAFT_STAGE").contains("tiles")) {
      // shuffle-free variant (diagnosis): stop before the mosaic exchange
      val row = Inundate.tiles(spark, pts)
        .agg(count(lit(1)).as("n"), sum(col("depth")).as("s")).collect()(0)
      return (row.getLong(0), (System.nanoTime() - t0) / 1e9)
    }
    val mosaic = Inundate.mosaic(Inundate.tiles(spark, pts))
    val agr = Agreement.withMaskFlag(spark, mosaic).select(
      when(col("mskd") === 1, lit(4))
        .otherwise((col("depth_max") > 0).cast("int") * 2 + Agreement.benchWet(col("cell")))
        .as("agreement"),
      col("n_points"))
    val row = agr.agg(
      count(when(col("agreement") === 0, 1)).as("tn"),
      count(when(col("agreement") === 1, 1)).as("fn"),
      count(when(col("agreement") === 2, 1)).as("fp"),
      count(when(col("agreement") === 3, 1)).as("tp"),
      count(when(col("agreement") === 4, 1)).as("masked"),
      sum(col("n_points")).as("n_pages")).collect()(0)
    (row.getLong(5), (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // ×256 (≈152M pages, the pinned-scaling protocol's input): the ×64 job
    // was short enough (~4 s) that JIT/GC/page-cache noise moved the
    // single-sample headline 30 % run-to-run; at ×256 the measured best-of-3
    // reproduces the taskset-pinned figure (~35M pages/s) within ~3 %
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "256").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm JIT/codegen caches with a tiny run, then measure. The official
    // headline is BEST-of-N (default 3): the un-pinned single-sample figure
    // swung 30 % round-to-round on a shared host (r4: 12.71M committed vs
    // 9.83M driver re-run, both "the" headline) — contention only ever adds
    // time, so the best sample is the reproducible estimator of the quiet
    // figure. All samples are recorded alongside it.
    // warm-up at the REAL mult (tiny sf, so it's seconds): the explode +
    // join codegen paths must be JIT-hot before the first sample — a mult=1
    // warm-up left the first official sample ~25 % cold (17.2M vs 23.5M in
    // the same run) and wasted a third of the best-of-N budget
    flagship(spark, "/root/testdata/sf0.001", mult, cpus)
    // clamped to ≥1: minBy on an empty run list would kill the bench before
    // the provisional record is written
    val flagReps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_FLAG_REPS", "3").toInt)
    val flagRuns = (1 to flagReps).map { _ =>
      val r = flagship(spark, sfDir, mult, cpus * 3)
      spark.catalog.clearCache()
      r
    }
    val (rows, secs) = flagRuns.minBy(_._2)
    val pagesPerSec = rows / secs
    val flagSamples = flagRuns.map(r => f"${r._1 / r._2}%.0f").mkString("[", ",", "]")

    // best-of-N per query: one JVM-noise outlier (GC pause, JIT recompile,
    // a neighbor's page-cache churn) must not land in the official record —
    // round 2's record showed a 39 s entry for a query that measures 3.6 s
    // clean, and the regression table built on it was wrong
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    def timeOnce(f: () => Unit): Double = {
      val t0 = System.nanoTime()
      val ok = try { f(); true } catch {
        case e: Throwable => System.err.println(s"[bench] FAILED: $e"); false
      }
      val s = (System.nanoTime() - t0) / 1e9
      // drop cached tables so storage-memory pressure from one run can't
      // evict/spill and distort the next measurement
      spark.catalog.clearCache()
      if (ok) s else -1.0
    }
    // best of the SUCCESSFUL reps; a failed query records -1.0 (visible in
    // the JSON) rather than a phantom near-zero wall time. Adaptive: only
    // measurements where JVM noise is material (0.7 s – 60 s) get the extra
    // reps — sub-second queries sit in the noise band regardless, and
    // re-running a minute-scale job doubles wall for little evidence, so
    // the whole sweep stays inside a round-driver-friendly budget
    def best(f: () => Unit, upper: Double = 60.0): Double = {
      val first = timeOnce(f)
      if (first < 0) // transient failure: retry (at least once, even when
        // reps = 1 — the retry budget is for failures, not extra samples)
        (1 to math.max(1, reps - 1)).map(_ => timeOnce(f))
          .filter(_ >= 0).minOption.getOrElse(-1.0)
      else if (first < 0.7 || first > upper) first
      else (first +: (2 to reps).map(_ => timeOnce(f)).filter(_ >= 0)).min
    }
    val only = sys.env.get("SPARK_GRAFT_ONLY") // e.g. "dedup" = skip the sweep
    if (only.contains("explain")) {
      // same default AND same per-leg AQE sizing as the measured leg below —
      // the plan inspected must be the plan the record ran
      val dmult0 = sys.env.getOrElse("SPARK_GRAFT_DEDUP_MULT", "256").toInt
      spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        cpus * 8 * math.max(1, dmult0 / 64))
      val df = graft.ops.TextOps.curate(scaledCorpus(spark, sfDir, dmult0))
      df.explain("cost")
      spark.stop(); return
    }
    // dedup family at corpus scale: the docs/sec headline (the sf corpus is
    // only ~5k docs — fixed overhead, not throughput; the sharded ×mult
    // corpus is the honest linear-workload measurement). Runs BEFORE the
    // per-query sweep: 25 minutes of accumulated codegen classes, cleaner
    // backlog and GC aging measurably degrade late heavy jobs (the ×16 leg
    // lost 2-5× per-doc throughput when it ran last), so the throughput
    // headlines get the fresh-JVM window and the relative-only query sweep
    // runs in the aged one. Materialized to
    // parquet ONCE per mult: a production corpus is one table with real
    // file stats, not a 16-branch union whose translate() synthesis would
    // otherwise be re-derived in every operator subtree (and whose
    // generator-based size estimates mislead the planner). Measured at TWO
    // corpus sizes — flat docs/sec between them is the linearity evidence
    // the 100 TB claim rests on.
    // ×256 default (legs ×16/×64/×256, ≈1.34M docs at sf0.1): round 5 moved
    // the official linearity record one order up — ×64 (last round's largest
    // leg) is now the MID leg, so the headline ratio compares ~334k vs ~1.34M
    // docs and a sub-linear tail has to show up at the scale a user would
    // actually run
    val dmult = sys.env.getOrElse("SPARK_GRAFT_DEDUP_MULT", "256").toInt
    val dmultSmall = math.max(1, dmult / 4)
    val dmultTiny = math.max(1, dmult / 16)
    // THREE corpus sizes (×dmult/16, ×dmult/4, ×dmult — default 16/64/256):
    // flat docs/sec between the two LARGEST legs is the linearity evidence
    // (the tiny→mid ratio mostly shows fixed overhead amortizing). The tiny
    // leg is skipped when a small SPARK_GRAFT_DEDUP_MULT collapses it onto
    // the mid leg — rerunning an identical workload twice would only emit a
    // noise-vs-noise ratio.
    val legs: Seq[Int] = (Seq(dmultTiny, dmultSmall, dmult).distinct.sorted)
    // Each op runs its legs CONSECUTIVELY (legs inner loop, ops outer), so a
    // per-op ratio compares samples minutes apart. The previous shape (ops
    // inner) put the whole small-leg sequence between an op's two samples:
    // 20+ minutes of JVM aging (codegen classes, cleaner backlog — the
    // measured 2-5× late-job degradation) landed entirely on the large leg
    // and printed phantom sub-linear ratios (para_dedup read 0.18 in-run vs
    // 0.59 in a fresh-JVM probe of the same binaries). Ascending order keeps
    // the residual within-op bias AGAINST the large leg — conservative.
    // Corpora are materialized up front (unmeasured): a production corpus is
    // one parquet table with real file stats, not a 256-branch translate()
    // union re-derived in every operator subtree.
    val corpora: Map[Int, Long] = legs.map { m =>
      scaledCorpus(spark, sfDir, m).write.mode("overwrite")
        .parquet(s"/tmp/graft_scaled_corpus_x$m")
      m -> spark.read.parquet(s"/tmp/graft_scaled_corpus_x$m").count()
    }.toMap
    // SPARK_GRAFT_DEDUP_OPS=incr_dedup,jaccard — fresh-JVM single-op
    // probes: even with per-op leg windows the full sequence ages the JVM,
    // so a sub-linear ratio must be reproduced in isolation before it is
    // believed
    val opFilter = sys.env.get("SPARK_GRAFT_DEDUP_OPS").map(_.split(",").toSet)
    val allOps: Seq[(String, DataFrame => DataFrame)] = Seq(
      "exact" -> (c => graft.ops.TextOps.exactDupGroups(c)),
      "minhash" -> (c => graft.ops.TextOps.minhashWide(c)),
      "lsh_pairs" -> (c => graft.ops.TextOps.lshPairs(c)),
      "jaccard" -> (c => graft.ops.TextOps.ngramJaccard(c)),
      "simhash" -> (c => graft.ops.TextOps.simhash16(c)),
      "fingerprint" -> (c => graft.ops.TextOps.fingerprint(c)),
      "curation" -> (c => graft.ops.TextOps.curate(c)),
      "para_dedup" -> (c => graft.ops.WebCuration.paragraphDedup(c)),
      // idSplit = 1e6: base = shard 0's ORIGINAL docs, batch = shard 0's
      // clones + every other shard — the verify join sees real near-dup
      // candidates (an inter-shard split would find zero by construction
      // and measure only shingling/banding)
      "incr_dedup" -> (c => graft.ops.TextOps.incrementalDedup(c, 1000000L)),
      // the one ITERATIVE op (min-label propagation + pointer jumping over
      // the dup-edge table): edges scale linearly with shards (per-shard
      // clone structure, no cross-shard dups) and rounds stay O(log max
      // cluster) — constant here — so end-to-end docs/sec must stay flat;
      // a sub-linear ratio would mean the loop's per-round cost picked up
      // a corpus-sized term
      "dup_components" -> (c => graft.ops.DedupGraph.dupComponents(c)),
      // round-5 additions: the span-level duplication profile (corpus-sized
      // shingle join — the jaccard family's cost shape) and the BPE pair
      // count (word-level map + one partial agg + TakeOrdered)
      "dup_spans" -> (c => graft.ops.TextOps.dupSpanProfile(c)),
      "bpe_pairs" -> (c => graft.ops.Lexicon.bpePairs(c)))
    val dedupOps = opFilter.fold(allOps)(f => allOps.filter(o => f(o._1)))
    // Shuffle parallelism sized to the DATA, not the core count — scoped to
    // the dedup legs and scaled PER LEG: with AQE's initial partition count
    // raised, each exchange starts wide and AQE coalesces from MEASURED
    // bytes, so a shuffle whose payload grows with the corpus (fingerprint's
    // partial collect_set is set-union — it cannot collapse map-side, the
    // exchange stays corpus-sized) keeps constant bytes per reduce
    // partition instead of crossing the spill threshold between legs. A
    // FIXED initial count (cpus·8, the r4 config) capped reduce parallelism:
    // ×256 carried 4× the bytes per partition vs ×64 and fingerprint read
    // 0.64 in a fresh-JVM probe while every map-side-collapsing sibling
    // (minhash/simhash: a few longs per doc after partial agg) stayed ~1.
    // Overshooting is near-free — AQE merges small partitions — which is
    // exactly the 100 TB sizing rule: start wide, let the optimizer shrink.
    // The sweep/flagship keep the plain `cpus` config; restored after.
    val opLegSecs: Seq[(String, Seq[(Int, Double)])] =
      try dedupOps.map { case (nm, f) =>
        nm -> legs.map { m =>
          spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            cpus * 8 * math.max(1, m / 64))
          val c = spark.read.parquet(s"/tmp/graft_scaled_corpus_x$m")
          // higher single-sample cutoff than the sweep (600 s vs 60 s): the
          // large-leg walls run 100-200 s and the RATIO between legs is the
          // headline — a single draw on the big leg wobbled fingerprint's
          // ratio 0.64-0.72 run-to-run, past the 0.7 linearity bar and back
          m -> best(() => { f(c).queryExecution.toRdd.count(); () }, upper = 600.0)
        }
      } finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.initialPartitionNum")
    def legSecs(m: Int): Seq[(String, Double)] =
      opLegSecs.map { case (nm, ls) => nm -> ls.toMap.getOrElse(m, -1.0) }
    val tinyLeg: Option[(Long, Seq[(String, Double)])] =
      if (dmultTiny < dmultSmall) Some((corpora(dmultTiny), legSecs(dmultTiny))) else None
    val (docsSmall, secsSmall) = (corpora(dmultSmall), legSecs(dmultSmall))
    val (nDocs, dedupSecs) = (corpora(dmult), legSecs(dmult))
    def obj(xs: Seq[(String, Double)], f0: Double => String) =
      xs.map { case (k, v) => "\"" + k + "\":" + f0(v) }.mkString("{", ",", "}")
    // an op that failed ALL reps has wall = -1.0: keep the -1 visible in
    // `secs` but emit null (not negative garbage) for every derived
    // throughput/ratio entry
    def dps(docs: Long, v: Double): String =
      if (v < 0) "null" else f"${docs / v}%.0f"
    val dsec = obj(dedupSecs, v => f"$v%.3f")
    val ddps = obj(dedupSecs, v => dps(nDocs, v))
    val ddpsSmall = obj(secsSmall, v => dps(docsSmall, v))
    // dps ratio large/small corpus: ~1 = linear cost, >1 = fixed overhead
    // amortizing away, <1 = superlinear cost creeping in
    def ratio(big: Seq[(String, Double)], nBig: Long,
        small: Seq[(String, Double)], nSmall: Long): String =
      obj(big.zip(small).map { case ((k, vL), (_, vS)) =>
        k -> (if (vL < 0 || vS < 0) Double.NaN else (nBig / vL) / (nSmall / vS)) },
        v => if (v.isNaN) "null" else f"$v%.2f")
    val dlin = ratio(dedupSecs, nDocs, secsSmall, docsSmall)
    val tinyJson = tinyLeg.map { case (docsTiny, secsTiny) =>
      s""","docs_tiny":$docsTiny,"mult_tiny":$dmultTiny""" +
        s""","docs_per_sec_tiny":${obj(secsTiny, v => dps(docsTiny, v))}""" +
        s""","dps_ratio_small_over_tiny":${ratio(secsSmall, docsSmall, secsTiny, docsTiny)}"""
    }.getOrElse("")


    // only a FULL run may touch the official record — smoke/partial runs
    // (SPARK_GRAFT_ONLY set) once clobbered the committed round record
    def writeRecord(line: String): Unit =
      if (only.isEmpty) try {
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get("BENCH"))
        java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH/last_bench.json"), line + "\n")
      } catch { case _: Throwable => () }
    def jsonLine(qs: String): String =
      s"""{"metric":"flagship pages/sec (rows=$rows, ${cpus} cores, x$mult, best of $flagReps)","value":${f"$pagesPerSec%.1f"},"unit":"pages/sec","reps":$reps,"flagship_samples":$flagSamples,"queries":$qs,"dedup":{"docs":$nDocs,"mult":$dmult,"secs":$dsec,"docs_per_sec":$ddps,"docs_small":$docsSmall,"mult_small":$dmultSmall,"docs_per_sec_small":$ddpsSmall$tinyJson,"dps_ratio_large_over_small":$dlin},"sf":"$sfDir"}"""
    // provisional record NOW: if the per-query sweep is killed by an outer
    // timeout, the flagship + dedup headlines still survive on disk
    writeRecord(jsonLine("{}"))

    val results = (if (only.contains("dedup")) Seq.empty
      else SparkEntry.queries.toSeq.sortBy(_._1)).map { case (name, fn) =>
      // toRdd.count() materializes EVERY output column — a plain count()
      // would let Catalyst prune the expensive expressions out of the plan
      name -> best(() => { fn(spark, sfDir).queryExecution.toRdd.count(); () })
    }
    val qs = (results :+ ("flagship_e2e" -> secs))
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")

    val line = jsonLine(qs)
    // bare line on stdout (run/outputStrategy := StdoutOutput keeps it
    // unprefixed) + a file copy so the driver can always recover the metric
    println(line)
    writeRecord(line)
    // the full line above (~3 KB) can overflow a stdout tail-capture window
    // mid-line; the LAST line is a compact headline-only record (< 500 bytes,
    // no per-query map) so any reasonable tail parses it
    println(s"""{"metric":"flagship pages/sec (rows=$rows, ${cpus} cores, x$mult, best of $flagReps)","value":${f"$pagesPerSec%.1f"},"unit":"pages/sec","reps":$reps,"flagship_samples":$flagSamples,"queries":{"flagship_e2e":${f"$secs%.3f"}},"sf":"$sfDir"}""")
    spark.stop()
  }
}
