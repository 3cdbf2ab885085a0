package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geo.Cells
import graft.ops._
import graft.pipeline.Inundate
import graft.synth.Synth
import OracleSql._

/** Driver contract — one `queries` entry (+ DuckDB oracle) per implemented
  * operator from SURVEY.md §2. Column names are aliased identically on both
  * sides (driver hashes values under name-sorted columns).
  */
object SparkEntry {

  /** Flagship query on sf0.001: the full inundate + mosaic pipeline
    * (SURVEY.md §3.2). */
  def entry(spark: SparkSession): DataFrame =
    Inundate.run(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1-S4 scan + deterministic geocode synthesis (§2.10 #6)
    "q01_geocode" -> ((s, dir) =>
      Synth.points(s, dir).select(col("pid"), col("lat"), col("lng"), col("hand"))),

    // §2.10 #1 cell codec: encode + parent (raster georeferencing analog)
    "q02_cell_encode" -> ((s, dir) =>
      Synth.points(s, dir).select(
        col("pid"), col("cell"),
        Cells.cellToParentCol(col("cell"), Cells.BaseRes, Cells.CoarseRes).as("parent5"))),

    // J3 point-in-polygon broadcast join (core custom operator)
    "q03_pip_join" -> ((s, dir) =>
      SpatialJoin.assign(s, Synth.points(s, dir)).select(
        col("pid"), col("hydroid").cast("long").as("hydroid"),
        col("feature_id").cast("long").as("feature_id"), col("huc8"))),

    // SRC synthesis: 84-knot Manning-like rating curves (gage subset)
    "q04_hydrotable" -> ((s, _) =>
      Synth.hydrotable(s).filter(col("hydroid") % 199 === 0)
        .select(col("hydroid"), col("stage"), col("discharge_cms"))),

    // J1+A5: forecast join + np.interp stage (the hot join)
    "q05_interp_stage" -> ((s, _) =>
      RatingInterp.stages(Synth.hydrotable(s), Synth.forecast(s))
        .select(col("hydroid"), col("stage_m"))),

    // §3.2 pixel kernel: depth/class per point-tile
    "q06_tiles" -> ((s, dir) =>
      Inundate.tiles(s, Synth.points(s, dir)).select(
        col("pid"), col("hydroid").cast("long").as("hydroid"),
        col("hand"), col("stage_m"), col("depth"), col("clazz"))),

    // A6 mosaic: per-cell max (nanmax analog)
    "q07_mosaic" -> ((s, dir) =>
      Inundate.run(s, dir).select(
        col("cell"), col("depth_max"), col("clazz"), col("n_points"))),

    // A1/A3 zonal min/max + counts per catchment
    "q08_zonal" -> ((s, dir) =>
      SpatialJoin.assign(s, Synth.points(s, dir))
        .groupBy(col("hydroid").cast("long").as("hydroid"))
        .agg(min(col("hand")).as("hand_min"), max(col("hand")).as("hand_max"),
          count(lit(1)).as("n"))),

    // J2/J5 kNN nearest-gage with distance cap
    "q09_knn_gage" -> ((s, dir) =>
      KnnJoin.nearestGage(s, Synth.points(s, dir)).select(
        col("pid"), col("nn_hydroid").cast("long").as("nn_hydroid"), col("nn_dist2"))),

    // North-rule skew: salted two-stage agg over dense coarse cells
    "q10_salted_hot" -> ((s, dir) =>
      SaltedAgg.countAndMax(Synth.points(s, dir),
        col("ccell"), col("pid"), col("hand"), 32)
        .select(col("k"), col("n"), col("mx"))),

    // §3.3 agreement raster: predicted vs benchmark per cell
    "q11_agreement" -> ((s, dir) =>
      Agreement.agreement(s, Inundate.run(s, dir)).select(col("cell"), col("agreement"))),

    // A7+A8 contingency counts + CSI/TPR/FAR/MCC/ACC/F1/bias
    "q12_metrics" -> ((s, dir) =>
      Agreement.metrics(Agreement.agreement(s, Inundate.run(s, dir)))),

    // ---- training-data pipeline ops over the web-text corpus ----

    // exact dedup (hash-groupBy)
    "q13_dedup_exact" -> ((s, dir) => TextOps.exactDupGroups(Synth.corpus(s, dir))),

    // MinHash signatures (long form)
    "q14_minhash" -> ((s, dir) =>
      TextOps.minhashLong(Synth.corpus(s, dir))
        .select(col("doc_id"), col("seed").cast("int").as("seed"), col("minh"))),

    // LSH band-bucket candidate pairs
    "q15_lsh_pairs" -> ((s, dir) => TextOps.lshPairs(Synth.corpus(s, dir))),

    // exact n-gram Jaccard verification of the candidates
    "q16_jaccard" -> ((s, dir) => TextOps.ngramJaccard(Synth.corpus(s, dir))),

    // SimHash fingerprints
    "q17_simhash" -> ((s, dir) => TextOps.simhash16(Synth.corpus(s, dir))),

    // language-ID heuristic (marker-count argmax)
    "q18_langid" -> ((s, dir) => TextOps.langId(Synth.corpus(s, dir))),

    // quality scoring features + keep flag
    "q19_quality" -> ((s, dir) => TextOps.quality(Synth.corpus(s, dir))),

    // k-min document fingerprint
    "q20_fingerprint" -> ((s, dir) => TextOps.fingerprint(Synth.corpus(s, dir))),

    // composed curation pipeline: quality ∧ ¬exact-dup ∧ ¬near-dup
    "q50_curation" -> ((s, dir) => TextOps.curate(Synth.corpus(s, dir))),

    // token counting: whitespace + BPE-ish regex segmentation
    "q51_tokens" -> ((s, dir) => TextOps.tokenCounts(Synth.corpus(s, dir))),

    // repetition filter: most-frequent-shingle share (Gopher-style quality gate)
    "q71_repetition" -> ((s, dir) => TextOps.repetition(Synth.corpus(s, dir))),

    // brute-force quantized-cosine top-k ANN
    "q21_ann_brute" -> ((s, dir) =>
      AnnSearch.bruteTopK(s.read.parquet(s"$dir/embeddings.parquet"))),

    // SRP bucket assignment (the LSH scale path for ANN)
    "q22_srp_buckets" -> ((s, dir) =>
      AnnSearch.srpBuckets(s.read.parquet(s"$dir/embeddings.parquet"))),

    // IVF ANN: deterministic coarse quantizer, nProbe nearest lists, exact
    // rerank — the cluster-pruned scale path beside the SRP hash tables
    "q72_ivf_topk" -> ((s, dir) =>
      AnnSearch.ivfTopK(s.read.parquet(s"$dir/embeddings.parquet"))),

    // embedding-cosine near-dup pairs: adaptive multi-table SRP candidates
    // (bit count from corpus size → bucket population ≈ constant) ≥ threshold.
    // This is the ARTIFACT BUILDER: the scored-pair table is persisted once
    // and read back (the cost measured here is the honest end-to-end build)
    "q49_embed_neardup" -> ((s, dir) =>
      AnnSearch.writeNearDupPairs(s.read.parquet(s"$dir/embeddings.parquet"), dir)
        .filter(col("cos") >= 0.35)
        .select(col("va"), col("vb"), col("cos"))),

    // near-dup threshold tuning: cosine-band histogram over ALL candidate
    // pairs (what moves if the dedup cut-off shifts a band) — reads the
    // persisted pairs artifact; reports don't re-derive the SRP chain
    "q94_neardup_hist" -> ((s, dir) =>
      AnnSearch.readNearDupPairs(s.read.parquet(s"$dir/embeddings.parquet"), dir)
        .select(floor(col("cos") * lit(10.0)).cast("long").as("band"), col("cos"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_pairs"),
          min(col("cos")).as("cos_min"), max(col("cos")).as("cos_max"))),

    // ---- graph ops (§2.9) over the synthetic stream network ----

    // network synthesis (reach table)
    "q23_reaches" -> ((s, _) =>
      StreamNet.reaches(s).select(col("hydroid").cast("long").as("hydroid"), col("huc8"),
        col("order_").cast("int").as("order_"), col("length_km"),
        col("to_node").cast("long").as("to_node"))),

    // G2 endpoints via anti-join semantics
    "q24_endpoints" -> ((s, _) =>
      StreamNet.endpoints(StreamNet.reaches(s))
        .select(col("hydroid").cast("long").as("hydroid"), col("is_outlet"), col("is_headwater"))),

    // G3 arbolate sum — per-HUC in-memory kernel vs recursive-CTE oracle
    "q25_arbolate" -> ((s, _) =>
      StreamNet.arbolate(s, StreamNet.reaches(s))
        .select(col("huc8"), col("hydroid").cast("long").as("hydroid"), col("arbolate_km"))),

    // G4 level-path assignment (deterministic confluence tie-breaks)
    "q26_levelpath" -> ((s, _) =>
      StreamNet.levelPaths(s, StreamNet.reaches(s))
        .select(col("huc8"), col("hydroid").cast("long").as("hydroid"),
          col("levelpath_id").cast("long").as("levelpath_id"))),

    // G1+G5 NextDownID resolved from node-coordinate self-join
    "q27_next_down" -> ((s, _) =>
      StreamNet.resolveNextDown(StreamNet.reaches(s))
        .select(col("hydroid").cast("long").as("hydroid"),
          col("next_down_id").cast("long").as("next_down_id"))),

    // A10/W2: HUC-scoped sequence ids (deterministic row_number)
    "q28_seq_ids" -> ((s, _) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("huc8")).orderBy(col("hydroid"))
      StreamNet.reaches(s)
        .withColumn("seq", row_number().over(w))
        .select(col("hydroid").cast("long").as("hydroid"),
          concat(substring(col("huc8"), 5, 4), lpad(col("seq").cast("string"), 4, "0")).as("hydro_str"))
    }),

    // W3 generator: split reaches into 0.5 km segments
    "q29_segments" -> ((s, _) =>
      StreamNet.segments(StreamNet.reaches(s))
        .select(col("hydroid").cast("long").as("hydroid"), col("seg").cast("int").as("seg"),
          col("seg_start"), col("seg_end"))),

    // ---- relational/window coverage (§2.2-2.8) over the TPC-H tables ----

    // J8 as-of/nearest-value join: per part, lineitem row with quantity
    // closest to 25 (argmin via min(struct(...)), hash-agg, no sort)
    "q30_asof_minby" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      li.groupBy(col("l_partkey"))
        .agg(min(struct(abs(col("l_quantity") - 25), col("l_orderkey"),
          col("l_linenumber"), col("l_quantity"))).as("m"))
        .select(col("l_partkey"), col("m.l_orderkey").as("best_order"),
          col("m.l_linenumber").as("best_line"), col("m.l_quantity").as("best_qty"))
    }),

    // W3 cumulative sum with RANGE frame (ties share the value → deterministic)
    "q31_cumsum" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_shipdate"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
          sum(col("l_quantity")).over(w).as("cum_qty"))
    }),

    // J9/J10 semi + anti joins: customers with and without orders — ONE plan,
    // one action: left join against the distinct order-customer set, then a
    // conditional aggregate (semi ≡ matched, anti ≡ unmatched). At 100 TB this
    // is a single scan of each table instead of two.
    "q32_semi_anti" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
      val o = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_custkey")).distinct()
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .agg(count(when(col("o_custkey").isNotNull, 1)).as("n_with_orders"),
          count(when(col("o_custkey").isNull, 1)).as("n_without_orders"))
    }),

    // grouping-sets rollup (free in Spark; absent in the reference — §2.4)
    "q33_rollup" -> ((s, dir) =>
      s.read.parquet(s"$dir/orders.parquet")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))),

    // P7 keep-largest-duplicate: per order, the max-quantity line
    "q34_keep_largest" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_quantity").desc, col("l_linenumber").asc)
      s.read.parquet(s"$dir/lineitem.parquet")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),

    // §2.7 set ops: supplier vs customer nations (except / intersect / union)
    "q35_setops" -> ((s, dir) => {
      val sn = s.read.parquet(s"$dir/supplier.parquet").select(col("s_nationkey").as("k")).distinct()
      val cn = s.read.parquet(s"$dir/customer.parquet").select(col("c_nationkey").as("k")).distinct()
      sn.except(cn).withColumn("op", lit("supplier_only"))
        .unionByName(cn.except(sn).withColumn("op", lit("customer_only")))
        .unionByName(sn.intersect(cn).withColumn("op", lit("both")))
    }),

    // P8 sentinel handling: nullif/coalesce round-trip (−999 convention)
    "q36_sentinels" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_linenumber"),
          coalesce(nullif(col("l_discount"), lit(0.0)), lit(-999.0)).as("disc_sentinel"),
          nullif(col("l_discount"), lit(0.0)).isNull.cast("int").as("was_zero"))),

    // event sessionization: 30-min-gap sessions per user (lag + running sum)
    "q37_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      s.read.parquet(s"$dir/events.parquet")
        .withColumn("us", unix_micros(col("ts").cast("timestamp")))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("new_sess",
          (col("prev_us").isNull || (col("us") - col("prev_us")) > 1800000000L).cast("int"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("new_sess")).as("n_sessions"))
    }),

    // A9 pivot: per-source doc counts by language
    "q38_pivot" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .groupBy(col("source"))
        .pivot("lang", Seq("en", "es", "de", "fr", "zh")).count()
        .select(col("source"),
          coalesce(col("en"), lit(0L)).as("en"), coalesce(col("es"), lit(0L)).as("es"),
          coalesce(col("de"), lit(0L)).as("de"), coalesce(col("fr"), lit(0L)).as("fr"),
          coalesce(col("zh"), lit(0L)).as("zh"))),

    // §2.8 scalar-function surface: string/math kernels (exact-parity forms)
    "q39_scalar_funcs" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_linenumber"),
          lpad((col("l_orderkey") % 997).cast("string"), 4, "0").as("bucket"),
          lower(concat(col("l_returnflag"), col("l_linestatus"))).as("rf"),
          substring(col("l_returnflag"), 1, 1).as("rf1"),
          col("l_returnflag").startsWith("R").cast("int").as("is_r"),
          floor(sqrt(col("l_quantity")) * 10000).cast("long").as("sqrt_q4"),
          abs(col("l_quantity") - 25).as("absd"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))),

    // A11/S11 per-HUC aggregation of the tile table (union-by-partition analog)
    "q40_huc_rollup" -> ((s, dir) =>
      Inundate.tiles(s, Synth.points(s, dir))
        .groupBy(col("huc8"))
        .agg(count(lit(1)).as("n_tiles"),
          count(when(col("depth") > 0, 1)).as("n_wet"),
          max(col("depth")).as("max_depth"),
          countDistinct(col("cell")).as("n_cells"))),

    // multimodal binary columns: metadata + frame-sample digests (stub codec)
    "q42_multimodal" -> ((s, dir) => Multimodal.decodeMeta(Synth.pages(s, dir))),

    // G6 short-reach rating graft: donor selection by join rule
    "q43_rating_graft" -> ((s, _) =>
      StreamNet.ratingGraft(StreamNet.reaches(s))
        .select(col("hydroid").cast("long").as("hydroid"), col("length_km"),
          col("donor_id").cast("long").as("donor_id"))),

    // G8 waterbody walk: follow downstream until out of the lake set
    "q44_waterbody_walk" -> ((s, _) =>
      StreamNet.waterbodyExit(s, StreamNet.reaches(s))
        .select(col("huc8"), col("hydroid").cast("long").as("hydroid"),
          col("exit_node").cast("long").as("exit_node"))),

    // S6 point sampling: lookup join of gage points into the cell table
    // (window sample at CoarseRes — the masked-window read analog)
    "q48_point_sample" -> ((s, dir) => {
      import s.implicits._
      val gageCells = Synth.catchmentList.filter(c => Synth.isGage(c.hydroid))
        .map(c => (c.hydroid.toLong,
          graft.geo.Cells.latLngToCell(c.lat_c, c.lng_c, graft.geo.Cells.CoarseRes)))
        .toDF("gage_id", "ccell")
      Synth.points(s, dir)
        .join(broadcast(gageCells), "ccell") // sample the raster around gages
        .groupBy(col("gage_id"))
        .agg(min(col("hand")).as("hand_min"), count(lit(1)).as("n_samples"))
    }),

    // J5 conflation: per-catchment gage by majority vote of member points
    "q47_knn_mode" -> ((s, dir) => {
      val pts = Synth.points(s, dir)
      KnnJoin.modeConflation(SpatialJoin.assign(s, pts), KnnJoin.nearestGage(s, pts))
    }),

    // P2 error taxonomy: per-unit status codes (60/64/0) as data rows
    "q46_unit_status" -> ((s, dir) =>
      Inundate.unitStatus(s, Synth.points(s, dir))),

    // J12 interval membership: CatFIM stage-threshold categories
    "q45_catfim" -> ((s, _) => {
      val stg = RatingInterp.stages(Synth.hydrotable(s), Synth.forecast(s))
      stg.select(col("hydroid"), col("stage_m"),
        (lit(1.0) + (col("hydroid") % 4) * lit(0.5)).as("t_action"))
        .withColumn("category",
          when(col("stage_m") >= col("t_action") + 2.5, lit("major"))
            .when(col("stage_m") >= col("t_action") + 1.0, lit("moderate"))
            .when(col("stage_m") >= col("t_action"), lit("action"))
            .otherwise(lit("none")))
        .select(col("hydroid"), col("stage_m"), col("category"))
    }),

    // ---- SRC calibration family (lifecycle step 5; §2 A2/A9 analogs) ----

    // bankfull identification: argmin |NWM bankfull flow − SRC discharge|
    // per HydroID (identify_src_bankfull.py:98,129-134)
    "q52_bankfull" -> ((s, _) => Calibration.bankfull(Calibration.srcGeom(s))),

    // channel/overbank subdivision + Manning recompute per portion
    // (subdiv_chan_obank_src.py:218-291); HR^(2/3) via the bit-portable
    // fixed-iteration Newton cube root
    "q53_subdiv" -> ((s, _) =>
      Calibration.subdivide(Calibration.srcGeom(s).filter(col("hydroid") % 7 === 3))
        .select(col("hydroid"), col("stage"), col("vol_chan"),
          col("q_chan"), col("q_ob"), col("q_subdiv"))),

    // roughness calibration: per-HydroID median coef, feature-group mean
    // fallback, applied back to the SRC (src_roughness_optimization.py:276-400,546-561)
    "q54_roughness" -> ((s, _) => Calibration.roughness(s)),

    // flow-based CatFIM: per-site per-magnitude threshold FLOWS pushed
    // through the rating curve (generate_categorical_fim_flows.py:148-300)
    "q55_catfim_flow" -> ((s, _) => CatFim.catfimFlow(s)),

    // CatFIM interval stages: whole-number inundation steps between
    // consecutive thresholds (+5 past major)
    "q67_catfim_intervals" -> ((s, _) => CatFim.stageIntervals(s)),

    // S11 merged-raster reprojection analog: resample the mosaic onto a
    // TARGET grid (half the resolution, origin shifted 0.02°) — nearest-
    // neighbor reassignment by centroid + per-target-cell max, the relational
    // form of gdalwarp over the merged HUC raster
    "q70_resample" -> ((s, dir) => {
      val mos = Inundate.run(s, dir)
        .withColumn("clat", Cells.centroidLatCol(col("cell"), Cells.BaseRes))
        .withColumn("clng", Cells.centroidLngCol(col("cell"), Cells.BaseRes))
      mos.groupBy(
        (floor((col("clat") + lit(90.0) - lit(0.02)) / lit(180.0) * lit(2048.0)).cast("long") * 4096
          + floor((col("clng") + lit(180.0) - lit(0.02)) / lit(360.0) * lit(4096.0)).cast("long"))
          .as("tcell"))
        .agg(max(col("depth_max")).as("depth_max"),
          count(lit(1)).as("n_src"),
          sum(col("n_points")).as("n_points"))
    }),

    // J4 distributed spatial overlay: catchment × exclusion-mask polygon
    // intersections via the co-located cover join (both sides cell-keyed —
    // the n×m polygon cross never materializes), closed-form rect∩rect areas
    "q68_overlay" -> ((s, _) => {
      def el(ring: org.apache.spark.sql.Column, i: Int) = element_at(ring, i)
      val cats = Synth.catchmentCover(s).select(col("ccell"), col("hydroid"), col("ring"))
      val masks = Synth.maskCover(s)
        .select(col("ccell"), col("mask_id"), col("ring").as("mring"))
      cats.join(masks, "ccell")
        .withColumn("ilat",
          greatest(lit(0.0), least(el(col("ring"), 6), el(col("mring"), 6))
            - greatest(el(col("ring"), 2), el(col("mring"), 2))))
        .withColumn("ilng",
          greatest(lit(0.0), least(el(col("ring"), 3), el(col("mring"), 3))
            - greatest(el(col("ring"), 1), el(col("mring"), 1))))
        .filter(col("ilat") > 0.0 && col("ilng") > 0.0)
        .select(col("hydroid").cast("long").as("hydroid"), col("mask_id"),
          (col("ilat") * col("ilng")).as("inter_deg2"))
        .distinct()
    }),

    // tile pyramid: multi-resolution rollup CHAIN (12→10→8→6) — each level
    // aggregates the one above it, not the base (the raster-pyramid trick:
    // log-levels of shrinking aggregates instead of 3 full scans)
    "q69_tile_pyramid" -> ((s, dir) => {
      val mos = Inundate.run(s, dir)
        .select(col("cell"), (col("depth_max") > 0).cast("int").as("wet"))
      val l10 = mos.groupBy(Cells.cellToParentCol(col("cell"), Cells.BaseRes, 10).as("tile"))
        .agg(count(lit(1)).as("n_cells"), sum(col("wet")).as("n_wet"))
        .withColumn("res", lit(10))
      val l8 = l10.groupBy(Cells.cellToParentCol(col("tile"), 10, 8).as("tile"))
        .agg(sum(col("n_cells")).as("n_cells"), sum(col("n_wet")).as("n_wet"))
        .withColumn("res", lit(8))
      val l6 = l8.groupBy(Cells.cellToParentCol(col("tile"), 8, 6).as("tile"))
        .agg(sum(col("n_cells")).as("n_cells"), sum(col("n_wet")).as("n_wet"))
        .withColumn("res", lit(6))
      l10.unionByName(l8).unionByName(l6)
        .select(col("res"), col("tile"), col("n_cells"), col("n_wet"))
    }),

    // bathymetric SRC adjustment: sparse survey corrections merged in,
    // geometry adjusted, Manning discharge recomputed, stage-0 forced to 0
    // (bathymetric_adjustment.py:60-130)
    "q66_bathymetry" -> ((s, _) => Calibration.bathymetry(s)),

    // downstream group-coefficient walk: uncalibrated reaches within 8 km of
    // the last run of >=2 consecutive calibrated reaches inherit its mean
    // coef — branch_network_tracer + group_manningn_calc as window algebra
    "q65_group_roughness" -> ((s, _) => Calibration.groupRoughness(s)),

    // multi-benchmark master-metrics assembly: one mosaic evaluated against
    // every (benchmark_source × magnitude), melted to the long master table
    // (synthesize_test_cases.py:22-293)
    "q56_master_metrics" -> ((s, dir) =>
      Agreement.masterMetrics(Inundate.run(s, dir))),

    // src.json round-trip: per-HydroID knot lists → to_json → from_json →
    // re-exploded rows (add_crosswalk.py:407-430); the oracle is the identity,
    // so any JSON mangling of doubles breaks the hash
    "q57_src_json" -> ((s, _) => {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("knots", ArrayType(StructType(Seq(
        StructField("i", IntegerType), StructField("stage", DoubleType),
        StructField("q", DoubleType)))))))
      Synth.hydrotable(s).filter(col("hydroid") % 199 === 0)
        .groupBy(col("hydroid"))
        .agg(to_json(struct(sort_array(collect_list(struct(col("i").cast("int").as("i"),
          col("stage"), col("discharge_cms").as("q")))).as("knots"))).as("js"))
        .select(col("hydroid"), from_json(col("js"), schema).as("p"))
        .select(col("hydroid"), explode(col("p.knots")).as("k"))
        .select(col("hydroid"), col("k.i").as("i"), col("k.stage").as("stage"),
          col("k.q").as("discharge_cms"))
    }),

    // inundation-extent dissolve: wet cells → per-extent bbox + boundary
    // count + area (mosaic_inundation.py:153-188 polygonize/dissolve analog)
    "q58_extent_dissolve" -> ((s, dir) =>
      graft.pipeline.Extents.dissolve(Inundate.run(s, dir))),

    // connected-component labeling of wet extents (polygonize proper):
    // per-extent union-find kernel, label = min cell id per component
    "q64_extent_components" -> ((s, dir) =>
      graft.pipeline.Extents.components(Inundate.run(s, dir))),

    // the COMPLETE master-CSV metric family (~36 columns) from one agreement
    // raster (tools_shared_functions.py:277-380)
    "q59_full_metrics" -> ((s, dir) =>
      Agreement.fullMetrics(Agreement.agreement(s, Inundate.run(s, dir)))),

    // A9 pivot on the real calibration table: per-HydroID coefficient per
    // observation slot (df_nvalues pivot_table analog,
    // src_roughness_optimization.py:313-316)
    "q60_calb_pivot" -> ((s, _) =>
      Calibration.obsCoefs(s).filter(col("qsrc") > 0.0)
        .groupBy(col("hydroid")).pivot("j", Seq(0, 1, 2)).agg(min(col("coef")))
        .select(col("hydroid"), col("0").as("coef_j0"), col("1").as("coef_j1"),
          col("2").as("coef_j2"))),

    // A2 zonal min within lateral cost tolerance, applied back to thalweg
    // cells under an elevation-difference threshold
    // (adjust_thalweg_lateral.py:10-60): two-stage zonal min + broadcast-back
    "q63_thalweg_adjust" -> ((s, dir) => {
      val pts = SpatialJoin.assign(s, Synth.points(s, dir))
        .withColumn("lat_c",
          (floor(col("hydroid") / lit(144)).cast("long") + lit(0.5)) * lit(1.25) - lit(90.0))
        .withColumn("lng_c",
          ((col("hydroid") % 144) + lit(0.5)) * lit(2.5) - lit(180.0))
        .withColumn("cost",
          (col("lat") - col("lat_c")) * (col("lat") - col("lat_c"))
            + (col("lng") - col("lng_c")) * (col("lng") - col("lng_c")))
      val zmin = pts.filter(col("cost") <= 1.0 && col("hand") > 0.0)
        .groupBy(col("hydroid")).agg(min(col("hand")).as("zmin"))
      pts.join(broadcast(zmin), Seq("hydroid"), "left")
        .select(col("pid"), col("hydroid").cast("long").as("hydroid"), col("hand"),
          col("zmin"),
          (col("pid") % 11 === 0).cast("int").as("thalweg"),
          when(col("pid") % 11 === 0 && col("zmin").isNotNull &&
            col("zmin") < col("hand") && col("hand") - col("zmin") <= 2.0,
            col("zmin")).otherwise(col("hand")).as("hand_adj"))
    }),

    // §2.8 map functions: per-order line→quantity map via map_from_entries,
    // probed with element_at / map_keys (plain-column output for the oracle).
    // The synthetic lineitem has duplicate (orderkey, linenumber) pairs, so
    // lines are pre-aggregated (max qty) before the map is built.
    "q61_map_funcs" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(max(col("l_quantity")).as("qty"))
        .groupBy(col("l_orderkey"))
        .agg(map_from_entries(sort_array(collect_list(
          struct(col("l_linenumber"), col("qty"))))).as("m"))
        .select(col("l_orderkey"),
          size(map_keys(col("m"))).as("n_lines"),
          element_at(col("m"), 1).as("qty_line1"),
          element_at(col("m"), array_max(map_keys(col("m")))).as("qty_maxline"))),

    // §2.8 higher-order array functions: quantized dot product of adjacent
    // embedding vectors via zip_with + aggregate (exact BIGINT arithmetic)
    "q62_hof_dot" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      val a = e.select(col("vec_id"), col("embedding").as("ea"))
      val b = e.select((col("vec_id") - 1).as("vec_id"), col("embedding").as("eb"))
      a.join(b, "vec_id")
        .select(col("vec_id"),
          aggregate(
            zip_with(col("ea"), col("eb"), (x, y) =>
              round(x.cast("double") * 1000.0).cast("long")
                * round(y.cast("double") * 1000.0).cast("long")),
            lit(0L), (acc, z) => acc + z).as("dot"))
    }),

    // paragraph-level global dedup (C4/CCNet boilerplate pass): first
    // occurrence of each paragraph survives; docs report kept counts + the
    // reassembled clean text
    "q73_para_dedup" -> ((s, dir) =>
      WebCuration.paragraphDedup(Synth.corpus(s, dir))),

    // URL canonicalization + refetch collapse over the synthetic fetch log
    // (strip query/fragment, lowercase, host extraction — split_part algebra)
    "q74_url_canon" -> ((s, dir) =>
      WebCuration.canonicalUrls(Synth.pages(s, dir))),

    // CatFIM site-acceptance workflow: thresholds complete, record flow
    // inside the rating curve's domain, coordinate-accuracy gate
    "q75_catfim_sites" -> ((s, _) => CatFim.siteAcceptance(s)),

    // MERGE INTO analog over the forecast snapshot: revised rows replace,
    // new features insert, the rest pass through (anti-join + union)
    "q76_merge_upsert" -> ((s, _) =>
      graft.pipeline.Maintenance.mergeUpsert(
        Synth.forecast(s), graft.pipeline.Maintenance.forecastRevisions(s), "feature_id")),

    // compaction planning: bin-pack per-HUC8 partition sizes into ~4096-row
    // rewrite tasks (Iceberg rewriteDataFiles planner as window algebra)
    "q77_compaction" -> ((s, dir) =>
      graft.pipeline.Maintenance.hucCompactionPlan(s, dir)),

    // PII scrubbing: redact email/phone spans, count redactions per doc
    "q78_pii_scrub" -> ((s, dir) =>
      WebCuration.piiScrub(Synth.corpus(s, dir))),

    // FR+MS composite inundation: mainstem high-flow model composited with
    // the full-resolution model by per-cell max depth
    "q87_composite" -> ((s, dir) => Inundate.compositeMosaic(s, dir)),

    // gage snap-to-line: planar segment projection with clamp (shapely
    // project+interpolate analog, pure codegen'd scalar math)
    "q86_gage_snap" -> ((s, _) =>
      StreamNet.gageSnap(StreamNet.reaches(s))),

    // JSON property extraction over the REAL events table (src.json scalar
    // family on driver data, not synthetic): get_json_object + typed agg
    "q85_json_props" -> ((s, dir) =>
      s.read.parquet(s"$dir/events.parquet")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("k")).as("k_min"),
          max(col("k")).as("k_max"), sum(col("k")).as("k_sum"))),

    // multimodal frame sampling: evenly-strided byte windows per binary
    // payload (video frame-sample plumbing as a relational generator)
    "q84_frame_sample" -> ((s, dir) =>
      Multimodal.frameSample(Synth.pages(s, dir))),

    // incremental dedup: new batch LSH-checked against the existing corpus
    // only (no batch×batch / base×base pairs; no corpus-wide re-LSH)
    "q83_incr_dedup" -> ((s, dir) =>
      TextOps.incrementalDedup(Synth.corpus(s, dir))),

    // sierra test: FIM SRC vs USGS rating curve interpolated at the 5 NWM
    // recurrence-interval flows, per-gage elevation differences
    "q82_sierra" -> ((s, _) => Calibration.sierraTest(s)),

    // one distributed Lloyd (k-means) iteration: broadcast-centroid E-step,
    // exact quantized M-step sums (order-insensitive where float means
    // are not)
    "q80_kmeans_step" -> ((s, dir) =>
      AnnSearch.kmeansStep(s.read.parquet(s"$dir/embeddings.parquet"))),

    // deterministic stratified subsample: per-language quota in
    // content-hash order (training-mix balancing, no RNG)
    "q81_stratified" -> ((s, dir) =>
      WebCuration.stratifiedSample(Synth.corpus(s, dir))),

    // G6 FULL donor ladder: short-reach rating graft with the reference's
    // complete case ladder (upstream max-order winner / downstream / self)
    // and the donor's curve applied back (add_crosswalk.py:110-318)
    "q79_rating_graft_full" -> ((s, _) =>
      StreamNet.ratingGraftFull(s, StreamNet.reaches(s))),

    // USGS rating-trace calibration: gage coefficients propagated along the
    // level path up/downstream to 8 km, lake/branch breaks, nearest-gage-wins
    "q88_rating_trace" -> ((s, _) => Calibration.usgsRatingTrace(s)),

    // dedup report: exact-content cluster-size histogram (C4-style removal
    // accounting — clusters, docs held, docs a keep-one pass removes)
    "q93_dup_clusters" -> ((s, dir) =>
      TextOps.dupClusterStats(Synth.corpus(s, dir))),

    // version-regression diff: new vs previous master metrics, melted per
    // stat with an orientation-aware regression verdict (the release gate)
    "q89_version_regression" -> ((s, dir) =>
      Agreement.versionRegression(Inundate.run(s, dir))),

    // levee–levelpath association: single-sided buffers, protected-side
    // resolution, not-found double buffers, crossing-count post-filters
    "q90_levee_assoc" -> ((s, _) => Levees.associate(s)),

    // bridge healing + flows: per-bridge-buffer zonal max HAND pushed
    // through the rating curve (both thresholds), ft/cfs conversions
    "q91_bridge_flows" -> ((s, dir) =>
      Bridges.bridgeFlows(s, Synth.points(s, dir))),

    // manual calibration overrides: operator coefficient table merged over
    // the hydrotable, discharge = postcalb / coef, provenance kept
    "q92_manual_calb" -> ((s, _) => Calibration.manualCalibration(s)),

    // per-catchment alpha metrics ("FIM Performance" layer): the full
    // contingency-metric family PER HydroID per (benchmark, magnitude) —
    // the reference's 20-32 h test_case_by_hydro_id workload as one plan
    "q95_alpha_by_hydroid" -> ((s, dir) =>
      Agreement.alphaByHydroId(s, Inundate.run(s, dir))),

    // crosswalk evaluation: per-HUC intersection-count agreement + upstream
    // connectivity accuracy of the (error-injected) crosswalk
    "q96_crosswalk_eval" -> ((s, _) => NetworkEval.crosswalkEval(s)),

    // ras2fim rating calibration database: curve row nearest each NWM
    // recurrence flow (as-of join), HAND and 10%-variance quality gates
    "q97_ras2fim_rating" -> ((s, _) => Calibration.ras2fimRating(s)),

    // flow-continuity mass balance: per-confluence upstream discharge sum vs
    // forecast discharge, SAPE error term, sparse-forecast fillna(0) path
    "q98_continuity" -> ((s, _) => NetworkEval.continuity(s)),

    // branch-outlet backpool mitigation: outlier-sized outlet catchments
    // flagged (exact integer mean/std), flowline trimmed, slope reclamped
    "q99_backpool" -> ((s, dir) => NetworkEval.backpool(s, Synth.points(s, dir))),

    // AGREE DEM stream burn: distance transform + nearest-value allocation
    // as block-halo equi-joins, smooth/sharp drop composition
    "q100_agree_burn" -> ((s, _) => Terrain.agreeBurn(s)),

    // headwater flow accumulation + stream-pixel threshold (accuflux
    // direction=up) over the MERGE-forming net (the plain reach net's
    // downstream map is a permutation — accumulation would stay at 1)
    "q101_accuflux" -> ((s, _) =>
      Terrain.accuflux(s, NetworkEval.confluenceNet(s))
        .select(col("huc8"), col("hydroid").cast("long").as("hydroid"),
          col("flowaccum"), col("stream_pixel"))),

    // REM/HAND detrend: per-catchment thalweg-min elevation applied back
    // to every cell, nodata where the catchment has no thalweg pixel
    "q102_rem" -> ((s, dir) =>
      Terrain.rem(SpatialJoin.assign(s, Synth.points(s, dir)))),

    // SRC finalize: hydraulic columns re-derived + Manning discharge via
    // the bit-portable Newton x^(2/3) chain, stage-0 zeroed
    "q103_src_finalize" -> ((s, _) => Calibration.finalizeSrcs(s)),

    // Manning's-N reset + small-segment donor replacement (the in-place
    // id-ordered loop resolved to a depth-2 closed form)
    "q104_mannings_reset" -> ((s, _) =>
      Calibration.resetMannings(s, StreamNet.reaches(s))),

    // unit-error gate: error units counted over the status table, abort
    // code 62 only past BOTH thresholds (min count AND min percent)
    "q105_unit_error_gate" -> ((s, dir) =>
      Inundate.unitStatus(s, Synth.points(s, dir))
        .agg(count(lit(1)).as("n_units"),
          count(when(col("status") =!= 0, 1)).as("n_errors"))
        .select(col("n_units"), col("n_errors"),
          (col("n_errors").cast("double") / col("n_units").cast("double")
            * lit(100.0)).as("pct_errors"),
          when(col("n_errors") > 10
            && col("n_errors").cast("double") / col("n_units").cast("double")
               * lit(100.0) >= 10.0, lit(62)).otherwise(lit(0)).as("return_code"))),

    // national metric rollup: per-catchment contingency counts summed per
    // (benchmark, magnitude), metric family recomputed over the SUMS (the
    // reference aggregates count JSONs, never averages ratios)
    "q106_aggregate_metrics" -> ((s, dir) =>
      Agreement.aggregateMetrics(s, Inundate.run(s, dir))),

    // composite variable roughness: channel-volume ratio blends channel and
    // overbank n per knot; incomplete roughness table falls back
    "q107_vary_mannings" -> ((s, _) => Calibration.variableMannings(s)),

    // water-surface fillnodata: exact integer-weighted IDW within radius 4,
    // depth = interpolated WSE - DEM, nodata past max search distance
    "q108_interp_wse" -> ((s, _) => Terrain.interpolateWse(s)),

    // flood-impact CSI over structures + roads vs two extents (incl. the
    // reference's LEFT-merge TP quirk)
    "q109_flood_impact" -> ((s, dir) =>
      Impact.floodImpact(s, Inundate.run(s, dir))),

    // deep-flooding check: masked depth threshold per analysis polygon
    "q110_deep_flooding" -> ((s, dir) =>
      Impact.deepFlooding(s, Inundate.run(s, dir))),

    // levee burn-in: NLD crest grid maximum-composited into the DEM
    "q111_levee_burn" -> ((s, _) => Terrain.burnInLevees(s)),

    // catchment-boundary inundation errors: wet cells whose dry 4-neighbor
    // lies in a DIFFERENT catchment (HAND truncation artifacts)
    "q112_boundary_errors" -> ((s, dir) =>
      Impact.catchmentBoundaryErrors(s, Inundate.run(s, dir))),

    // missing-FIM analysis: zero-REM seed cells + thalweg-notch HydroIDs
    // per stream order
    "q113_missing_fim" -> ((s, dir) =>
      Impact.missingFim(s, SpatialJoin.assign(s, Synth.points(s, dir)))),

    // AGREE over a holey DEM: the agreedem.py:230-238 allocation fallbacks
    // (vectallo -> own elev - drop, bufallo -> own elev), exercised by a
    // river-line gap and rim-blocking flank holes
    "q115_agree_nodata" -> ((s, _) => Terrain.agreeBurnWithHoles(s)),

    // gval arbitrary pairing dictionary: 3-class depth candidate mapped to
    // agreement codes by a broadcast pairing TABLE, not a hard-coded ladder
    // (tools_shared_functions.py:442-455's configurable pairing_dictionary)
    "q114_pairing_agreement" -> ((s, dir) =>
      Agreement.agreementWithPairing(s, Inundate.run(s, dir),
          when(col("depth_max") > 0.5, 2).when(col("depth_max") > 0.0, 1).otherwise(0),
          Agreement.pairingTable(s, Agreement.DepthClassPairing))
        .groupBy(col("agreement")).agg(count(lit(1)).as("n"))),

    // S9/S13 promoted to an oracle row: write a partitioned snapshot table
    // (resumable sink + manifest commit), read it BACK off disk, and compare
    // per-partition content stats + the manifest's row counts against the
    // source-side oracle — any sink, read-back, or lineage corruption breaks
    // the hash
    "q116_snapshot_roundtrip" -> ((s, dir) => {
      val table = s"/tmp/graft_artifacts/q116_${new java.io.File(dir).getName}"
      graft.pipeline.Snapshots.deleteRecursively(java.nio.file.Paths.get(table))
      val src = SpatialJoin.assign(s, Synth.points(s, dir))
        .select(col("pid"), col("hydroid").cast("long").as("hydroid"),
          col("huc8"), col("hand"))
      graft.pipeline.Snapshots.writeResumable(s, src, table, "huc8")
      val back = graft.pipeline.Snapshots.readTable(s, table)
      back.groupBy(col("huc8"))
        .agg(count(lit(1)).as("n_rows"), sum(col("pid")).as("pid_sum"),
          min(col("hand")).as("hand_min"), max(col("hand")).as("hand_max"))
        .join(graft.pipeline.Snapshots.lineage(s, table)
          .select(col("part").as("huc8"), col("rows").as("n_manifest")), "huc8")
    }),

    // §2.10 #4 promoted to an oracle row: the typed-Aggregator interp UDAF
    // and the relational bracketing aggregation run side by side per
    // catchment — the oracle emits ONE formula for both columns, so any
    // divergence between the two implementations hash-fails
    "q117_interp_udaf" -> ((s, _) =>
      Synth.hydrotable(s).filter(col("lake_id") === -999)
        .join(broadcast(Synth.forecast(s)), "feature_id")
        .groupBy(col("hydroid"))
        .agg(RatingInterp.stageExpr.as("stage_m"),
          RatingInterp.interpUdaf.as("stage_udaf"))),

    // cluster-level dedup ledger: exact-content + verified near-dup edges →
    // connected components (min-label propagation + pointer jumping) →
    // canonical doc + cluster size — the keep-one-per-COMPONENT pass that
    // follows pair generation in C4/RefinedWeb-style dedup
    "q118_dup_components" -> ((s, dir) =>
      DedupGraph.dupComponents(Synth.corpus(s, dir))),

    // benchmark decontamination: the eval set's (base docs ≡ 0 mod 37)
    // distinct 8-gram hashes broadcast against the corpus shingle table;
    // per-doc overlap count + contamination flag (GPT-3-style n-gram leak
    // check)
    "q119_decontaminate" -> ((s, dir) => {
      val c = Synth.corpus(s, dir)
      TextOps.decontaminate(c,
        c.filter(col("doc_id") < 1000000L && col("doc_id") % 37 === 0))
    }),

    // corpus boilerplate heavy hitters: top-20 shingle hashes by document
    // frequency (partial agg → TakeOrderedAndProject, no global sort)
    "q120_shingle_topk" -> ((s, dir) => TextOps.shingleTopK(Synth.corpus(s, dir))),

    // per-doc salient terms: rational TF-IDF (tf·N/df, one double division)
    // top-3 per doc with total-ordered ties
    "q121_tfidf" -> ((s, dir) => Lexicon.tfidfTopK(Synth.corpus(s, dir))),

    // inverted-index probe: full postings (doc, tf) for one probe doc's
    // term set — broadcast term set against the postings table
    "q122_postings" -> ((s, dir) => Lexicon.postingsProbe(Synth.corpus(s, dir))),

    // vocabulary statistics: df / total tf / id range per word — scalar
    // aggregates only, no posting arrays (stop-word lists are corpus-sized)
    "q123_vocab" -> ((s, dir) => Lexicon.vocabulary(Synth.corpus(s, dir))),

    // sequence-packing ledger: concatenate-then-chunk at 2048 tokens per
    // window, hash-sharded writers — each doc's token interval and the
    // windows it spans
    "q124_seq_pack" -> ((s, dir) => Packing.seqPack(Synth.corpus(s, dir))),

    // temperature mix plan: per-language doc/token mass, α=1/2 weight via
    // exact integer sqrt, normalized weight + integer doc quota
    "q125_mix_weights" -> ((s, dir) => Packing.mixWeights(Synth.corpus(s, dir))),

    // span-level duplication profile (duplicated-substring dedup view):
    // per-doc duplicated-shingle count/fraction + heavy-dup verdict
    "q126_dup_spans" -> ((s, dir) => TextOps.dupSpanProfile(Synth.corpus(s, dir))),

    // one BPE-style merge iteration: top-20 adjacent word pairs, total-ordered
    "q127_bpe_pairs" -> ((s, dir) => Lexicon.bpePairs(Synth.corpus(s, dir))),

    // physical-layout evidence: Z-order vs hash bucket zone maps + bbox skip
    "q128_zorder_skip" -> ((s, dir) => Layout.zoneMaps(Synth.points(s, dir),
      ProbeRowLo, ProbeRowHi, ProbeColLo, ProbeColHi)),

    // rational-surprisal (perplexity-proxy) quality bucketing
    "q129_rarity_bucket" -> ((s, dir) => Lexicon.rarityBuckets(Synth.corpus(s, dir))),

    // per-domain cap: keep top-2 canonical URLs per host
    "q130_domain_cap" -> ((s, dir) => WebCuration.domainCap(Synth.pages(s, dir))),

    // exact per-language length percentiles via a value-domain histogram —
    // no global sort, no approx sketch (nearest-rank cuts as integer
    // comparisons, so the oracle matches bitwise)
    "q131_length_quantiles" -> ((s, dir) =>
      Lexicon.lengthQuantiles(Synth.corpus(s, dir))),

    // SemDeDup-style semantic dedup: SRP near-dup pairs closed into
    // connected components → keep-one-per-MEANING ledger
    "q132_semantic_dedup" -> ((s, dir) =>
      DedupGraph.semanticDedup(
        AnnSearch.nearDupPairs(s.read.parquet(s"$dir/embeddings.parquet")))),

    // fuzzy benchmark decontamination: eval bands ⋈ corpus bands (MinHash
    // LSH), exact-Jaccard verify, per-doc best eval match + leak flag
    "q133_fuzzy_decontam" -> ((s, dir) => {
      val ev = col("doc_id") < 1000000L && col("doc_id") % 37 === 0
      TextOps.fuzzyDecontaminate(Synth.corpus(s, dir), ev)
    }),

    // exact-substring dedup removal ledger: duplicated gram positions merged
    // into maximal char intervals (per-doc gaps-and-islands over the
    // dup-density-scoped survivors)
    "q134_dup_span_removal" -> ((s, dir) =>
      TextOps.dupSpanRemoval(Synth.corpus(s, dir))),

    // deterministic KMV distinct-cardinality estimate per language — the
    // oracle-checkable HyperLogLog stand-in (dense_rank ≤ k pushed into
    // WindowGroupLimit map-side heaps; exact column is the comparison)
    "q135_kmv_distinct" -> ((s, dir) =>
      TextOps.kmvDistinct(Synth.corpus(s, dir))),

    // sharded Bloom-filter membership pre-filter: base (even ids) builds
    // 64 × 1008-bit filters in one agg; the odd-id batch probes via a
    // broadcast of the (≤ 1024-row) filter table — deterministic false
    // positives audited against the exact column
    "q136_bloom_probe" -> ((s, dir) => {
      val c = Synth.corpus(s, dir)
      BloomIndex.probe(c.filter(col("doc_id") % 2 === 0),
        c.filter(col("doc_id") % 2 === 1))
    }),

    // bigram-LM fluency scoring (CCNet perplexity-filter shape) in exact
    // rational arithmetic: mean conditional bigram probability in ppm
    "q137_bigram_lm" -> ((s, dir) =>
      QualityModels.bigramLmScore(Synth.corpus(s, dir))),

    // hashed-feature linear quality classifier: map-only scoring with
    // frozen hash-derived integer weights + one per-doc aggregate
    "q138_quality_classifier" -> ((s, dir) =>
      QualityModels.qualityClassifier(Synth.corpus(s, dir))),

    // deterministic epoch shuffle: global training position via key-prefix
    // range buckets + per-bucket ranks + a 1024-row offset broadcast (never
    // a one-partition global sort)
    "q139_epoch_order" -> ((s, dir) =>
      Packing.epochOrder(Synth.corpus(s, dir))),

    // fixed-point PageRank (3 rounds, ppb integer ranks): iterated
    // edges ⋈ ranks + one partial-aggregating exchange per round — the
    // BSP link-analysis workload as pure relational algebra
    "q140_pagerank" -> ((s, dir) =>
      LinkGraph.pageRank(Synth.corpus(s, dir))),

    // crawl-frontier politeness schedule: per-host FIFO dealt into fetch
    // ticks at 2 requests/host/tick
    "q141_frontier" -> ((s, dir) =>
      WebCuration.frontierSchedule(Synth.pages(s, dir))),

    // canonical pick: inside each dup component keep the HIGHEST-QUALITY
    // member (classifier score, min-id tiebreak) — dedup ∘ quality composed
    "q142_canonical_pick" -> ((s, dir) =>
      DedupGraph.canonicalPick(Synth.corpus(s, dir))),

    // anchor-text aggregation: each in-link carries its source page's lead
    // terms; per target the top-3 terms by in-link frequency (one
    // partial-aggregating exchange + WindowGroupLimit top-k)
    "q143_anchor_text" -> ((s, dir) =>
      LinkGraph.anchorText(Synth.corpus(s, dir))),

    // host-graph condensation: page edges collapsed to weighted host-pair
    // edges (the step that makes 10^12-page authority analytics tractable)
    "q144_host_graph" -> ((s, dir) =>
      LinkGraph.hostGraph(Synth.pages(s, dir), Synth.corpus(s, dir))),

    // refetch content-drift ranking: closed-form per-fetch change flags,
    // two partial aggs to host grain — the crawler revisit-policy signal
    "q145_content_drift" -> ((s, dir) =>
      WebCuration.contentDrift(Synth.pages(s, dir))),

    // host-level boilerplate removal: paragraphs on ≥50 % of a host's pages
    // are template chrome, dropped host-wide (one partial-aggregating
    // presence count + a same-key join back — no windows)
    "q146_host_boilerplate" -> ((s, dir) =>
      WebCuration.hostBoilerplate(Synth.pages(s, dir))),

    // mirror-host detection: host pairs sharing ≥3 byte-identical docs,
    // hash fan-out capped before pairing (the anti-explosion guard)
    "q147_mirror_hosts" -> ((s, dir) =>
      WebCuration.mirrorHosts(Synth.pages(s, dir))),

    // HITS hubs & authorities, 2 mutual-reinforcement rounds on the integer
    // ppm grid (max-normalized — every intermediate exact BIGINT)
    "q148_hits" -> ((s, dir) =>
      LinkGraph.hits(Synth.corpus(s, dir))),

    // host-reputation rollup: dup-content share + classifier score at host
    // grain → blocklist verdict (mirror-block / low-quality / keep)
    "q149_host_reputation" -> ((s, dir) =>
      WebCuration.hostReputation(Synth.pages(s, dir))),

    // DSIR-style importance weighting: hashed-bucket target/raw probability
    // ratio (ppm, add-one smoothed), model built in ONE exchange, scoring
    // map-only off a ≤4096-row broadcast
    "q150_importance_weights" -> ((s, dir) =>
      QualityModels.importanceWeights(Synth.corpus(s, dir))),

    // source-pair shingle-overlap matrix: distinct (source, hb) in one
    // partial pass, hash-keyed pair join, exact-ppm Jaccard per cell
    "q151_source_overlap" -> ((s, dir) =>
      TextOps.sourceOverlap(s.read.parquet(s"$dir/documents.parquet"))),

    // asymmetric containment over LSH candidates: quote/subset detection
    // (|A∩B|/|A| vs /|B| in exact ppm) + the keep-the-superset relation
    "q152_containment" -> ((s, dir) =>
      TextOps.containment(Synth.corpus(s, dir))),

    // reciprocal-link farm detection: above-average mutual host pairs
    // closed into components over the CONDENSED host graph
    "q153_link_farms" -> ((s, dir) =>
      LinkGraph.linkFarms(Synth.pages(s, dir), Synth.corpus(s, dir))),

    // robots-style longest-prefix-match URL filtering: broadcast rule
    // table, map-only match, one max(struct) winner per URL
    "q154_robots_filter" -> ((s, dir) =>
      WebCuration.robotsFilter(Synth.pages(s, dir))),

    // crawl-budget allocation: reputation verdict gates, drift bucket
    // scales — two host-grain chains composed end-to-end
    "q155_crawl_budget" -> ((s, dir) =>
      WebCuration.crawlBudget(Synth.pages(s, dir))),

    // curation-gate agreement: per-language Cohen's kappa between the
    // heuristic gate and the hashed classifier (exact signed ppm)
    "q156_gate_agreement" -> ((s, dir) =>
      QualityModels.gateAgreement(Synth.corpus(s, dir))),

    // TPC-H Q1 shape with exact arithmetic (sum of ints, min/max, avg)
    "q41_tpch_q1" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("sum_cents")))
  )

  /** q128 probe bbox — the NYC-cluster rows/cols at BaseRes, computed from
    * the same codec the engine uses so Spark and oracle share literals. */
  private val ProbeRowLo = Cells.latToRow(40.0, Cells.BaseRes)
  private val ProbeRowHi = Cells.latToRow(42.0, Cells.BaseRes)
  private val ProbeColLo = Cells.lngToCol(-74.0, Cells.BaseRes)
  private val ProbeColHi = Cells.lngToCol(-72.0, Cells.BaseRes)

  /** Shared q95/q106 oracle chain: per-(catchment, benchmark, magnitude)
    * contingency counts from ONE mosaic pass (mirrors
    * [[graft.ops.Agreement.alphaByHydroId]]'s counting stage). */
  private def alphaCountCtes: Seq[String] = {
    val combos = graft.ops.Agreement.MasterCombos.map { case (src, mag, k, w, t) =>
      s"('$src', '$mag', $k, $w, CAST($t AS DOUBLE))"
    }.mkString(", ")
    Seq(pts, asg, ht, fc, stg, til, mos,
      s"""cmb AS (SELECT * FROM (VALUES $combos) v(bench, mag, k, w, t))""",
      """mcn AS (
        |  SELECT cell, depth_max,
        |    ((cell // 268435456) % 268435456) AS crow, (cell % 268435456) AS ccol,
        |    (((cell // 268435456) % 268435456) + CAST(0.5 AS DOUBLE)) / 4096.0 * 180.0 - 90.0 AS clat,
        |    ((cell % 268435456) + CAST(0.5 AS DOUBLE)) / 8192.0 * 360.0 - 180.0 AS clng
        |  FROM mos
        |)""".stripMargin,
      s"""agh AS (
         |  SELECT CAST(floor((clat + 90.0) / 1.25) AS BIGINT) * 144
         |           + CAST(floor((clng + 180.0) / 2.5) AS BIGINT) AS hydroid,
         |    bench, mag,
         |    CASE WHEN (crow * 29 + ccol * 13) % 50 = 0 THEN 4
         |         ELSE (CASE WHEN depth_max > t THEN 1 ELSE 0 END) * 2
         |              + CASE WHEN (crow * 31 + ccol * 17 + k) % 10 < w THEN 1 ELSE 0 END
         |    END AS agreement
         |  FROM mcn CROSS JOIN cmb
         |)""".stripMargin,
      s"""c95 AS (
         |  SELECT hydroid, $huc8FromHydroid AS huc8, bench, mag,
         |    count(CASE WHEN agreement = 0 THEN 1 END) AS tn,
         |    count(CASE WHEN agreement = 1 THEN 1 END) AS fn,
         |    count(CASE WHEN agreement = 2 THEN 1 END) AS fp,
         |    count(CASE WHEN agreement = 3 THEN 1 END) AS tp,
         |    count(CASE WHEN agreement = 4 THEN 1 END) AS masked
         |  FROM agh GROUP BY hydroid, bench, mag
         |)""".stripMargin)
  }

  /** The guarded metric projection over contingency-count columns — mirrors
    * [[graft.ops.Agreement]]'s `contingencyMetricSelect` (NA ⇔ NULL on a
    * zero denominator; identical formula text). Shared by q95 (per-catchment
    * grain) and q106 (summed national grain). */
  private def contingencyMetricSql(keys: String, from: String): String = {
    def d(c: String) = s"CAST($c AS DOUBLE)"
    val tot = "CAST(tn + fn + fp + tp AS DOUBLE)"
    val aref = s"(${d("tp")} + ${d("fp")}) * (${d("tp")} + ${d("fn")}) / $tot"
    s"""SELECT $keys, tn, fn, fp, tp, masked,
       |  $tot * CAST(100.0 AS DOUBLE) / CAST(1000000.0 AS DOUBLE) AS contingency_tot_area_km2,
       |  CASE WHEN ${d("tp")} + ${d("fp")} + ${d("fn")} <> 0 THEN ${d("tp")} / (${d("tp")} + ${d("fp")} + ${d("fn")}) END AS csi,
       |  CASE WHEN ${d("tp")} + ${d("fp")} <> 0 THEN ${d("fp")} / (${d("tp")} + ${d("fp")}) END AS far,
       |  CASE WHEN ${d("tp")} + ${d("fn")} <> 0 THEN ${d("tp")} / (${d("tp")} + ${d("fn")}) END AS tpr,
       |  CASE WHEN ${d("tn")} + ${d("fp")} <> 0 THEN ${d("tn")} / (${d("tn")} + ${d("fp")}) END AS tnr,
       |  CASE WHEN ${d("tp")} + ${d("fp")} <> 0 THEN ${d("tp")} / (${d("tp")} + ${d("fp")}) END AS ppv,
       |  CASE WHEN ${d("tn")} + ${d("fn")} <> 0 THEN ${d("tn")} / (${d("tn")} + ${d("fn")}) END AS npv,
       |  CASE WHEN (${d("tp")} + ${d("fn")}) * (${d("tn")} + ${d("fp")}) <> 0
       |       THEN (${d("tp")} / (${d("tp")} + ${d("fn")}) + ${d("tn")} / (${d("tn")} + ${d("fp")})) / CAST(2.0 AS DOUBLE) END AS bal_acc,
       |  CASE WHEN (${d("tp")} + ${d("fp")}) * (${d("tp")} + ${d("fn")}) * (${d("tn")} + ${d("fp")}) * (${d("tn")} + ${d("fn")}) <> 0
       |       THEN (${d("tp")} * ${d("tn")} - ${d("fp")} * ${d("fn")})
       |            / sqrt((${d("tp")} + ${d("fp")}) * (${d("tp")} + ${d("fn")}) * (${d("tn")} + ${d("fp")}) * (${d("tn")} + ${d("fn")})) END AS mcc,
       |  CASE WHEN ${d("tp")} + ${d("fp")} + ${d("fn")} - $aref <> 0
       |       THEN (${d("tp")} - $aref) / (${d("tp")} + ${d("fp")} + ${d("fn")} - $aref) END AS equitable_threat_score,
       |  (${d("tp")} + ${d("fn")}) / $tot AS prevalence,
       |  CASE WHEN ${d("tp")} + ${d("fn")} <> 0 THEN (${d("tp")} + ${d("fp")}) / (${d("tp")} + ${d("fn")}) END AS bias,
       |  CASE WHEN ${d("tp")} * 2 + ${d("fp")} + ${d("fn")} <> 0 THEN ${d("tp")} * 2 / (${d("tp")} * 2 + ${d("fp")} + ${d("fn")}) END AS f1_score,
       |  ${d("masked")} / ($tot + ${d("masked")}) * 100 AS masked_perc
       |FROM $from""".stripMargin
  }

  /** The hydraulic-geometry + Newton x^(2/3) oracle chain shared by
    * q103/q104/q107 — mirrors [[graft.ops.Calibration]]'s `fullGeom`
    * step for step (identical formula text, so the three queries cannot
    * desynchronize from the Scala side or from each other). `fgSelect` is
    * the SELECT prefix carrying whatever extra srcg columns the query
    * needs alongside the shared geometry derivation. */
  private def manningChainCtes(fgSelect: String): Seq[String] = Seq(
    s"""fg AS (
       |  SELECT $fgSelect,
       |    bed_area / length_km / CAST(1000.0 AS DOUBLE) AS wetted_perimeter,
       |    volume / length_km / CAST(1000.0 AS DOUBLE) AS wet_area
       |  FROM srcg
       |)""".stripMargin,
    """fh AS (
      |  SELECT *, CASE WHEN wetted_perimeter > CAST(0.0 AS DOUBLE)
      |                 THEN wet_area / wetted_perimeter
      |                 ELSE CAST(0.0 AS DOUBLE) END AS hydraulic_radius
      |  FROM fg
      |)""".stripMargin,
    """fx AS (
      |  SELECT *, CASE WHEN hydraulic_radius > CAST(0.0 AS DOUBLE)
      |                 THEN hydraulic_radius * hydraulic_radius
      |                 ELSE CAST(1.0 AS DOUBLE) END AS x2f
      |  FROM fh
      |)""".stripMargin,
    "f0 AS (SELECT *, sqrt(sqrt(x2f)) AS yf FROM fx)") ++
    (1 to 8).map(k =>
      s"""f$k AS (SELECT * REPLACE (
         |  (CAST(2.0 AS DOUBLE) * yf + x2f / (yf * yf)) / CAST(3.0 AS DOUBLE)
         |    AS yf) FROM f${k - 1})""".stripMargin)

  def oracleSql: Map[String, String] = Map(
    "q01_geocode" -> withCtes(pts)("SELECT pid, lat, lng, hand FROM pts"),

    "q02_cell_encode" -> withCtes(pts, asg)(
      """SELECT pid, cell,
        |  5 * 72057594037927936 + (((cell // 268435456) % 268435456) >> 7) * 268435456
        |    + ((cell % 268435456) >> 7) AS parent5
        |FROM asg""".stripMargin),

    "q03_pip_join" -> withCtes(pts, asg)(
      s"SELECT pid, hydroid, 1000000 + hydroid AS feature_id, $huc8FromHydroid AS huc8 FROM asg"),

    "q04_hydrotable" -> withCtes(ht)(
      "SELECT hydroid, stage, discharge_cms FROM ht WHERE hydroid % 199 = 0"),

    "q05_interp_stage" -> withCtes(ht, fc, stg)("SELECT hydroid, stage_m FROM stg"),

    "q06_tiles" -> withCtes(pts, asg, ht, fc, stg, til)(
      """SELECT pid, hydroid, hand, stage_m, depth,
        |  CAST(CASE WHEN depth > 0 THEN hydroid ELSE -hydroid END AS INT) AS clazz
        |FROM til""".stripMargin),

    "q07_mosaic" -> withCtes(pts, asg, ht, fc, stg, til)(
      """SELECT cell, max(depth) AS depth_max,
        |  max(CAST(CASE WHEN depth > 0 THEN hydroid ELSE -hydroid END AS INT)) AS clazz,
        |  count(*) AS n_points
        |FROM til GROUP BY cell""".stripMargin),

    "q08_zonal" -> withCtes(pts, asg)(
      """SELECT hydroid, min(hand) AS hand_min, max(hand) AS hand_max, count(*) AS n
        |FROM asg GROUP BY hydroid""".stripMargin),

    "q09_knn_gage" -> withCtes(pts,
      """gc AS (
        |  SELECT hydroid,
        |    (CAST(floor(hydroid / 144) AS BIGINT) + CAST(0.5 AS DOUBLE)) * CAST(1.25 AS DOUBLE)
        |      - CAST(90.0 AS DOUBLE) AS lat_c,
        |    ((hydroid % 144) + CAST(0.5 AS DOUBLE)) * CAST(2.5 AS DOUBLE)
        |      - CAST(180.0 AS DOUBLE) AS lng_c
        |  FROM (SELECT 199 * x AS hydroid FROM generate_series(0, 104) t(x))
        |)""".stripMargin,
      """d AS (
        |  SELECT p.pid, gc.hydroid,
        |    (p.lat - gc.lat_c) * (p.lat - gc.lat_c) + (p.lng - gc.lng_c) * (p.lng - gc.lng_c) AS d2
        |  FROM pts p CROSS JOIN gc
        |  WHERE (p.lat - gc.lat_c) * (p.lat - gc.lat_c) + (p.lng - gc.lng_c) * (p.lng - gc.lng_c) <= 25.0
        |)""".stripMargin,
      "m AS (SELECT pid, min(d2) AS md FROM d GROUP BY pid)")(
      """SELECT p.pid, w.nn_hydroid, w.nn_dist2
        |FROM (SELECT DISTINCT pid FROM pts) p LEFT JOIN (
        |  SELECT d.pid, min(d.hydroid) AS nn_hydroid, m.md AS nn_dist2
        |  FROM d JOIN m ON d.pid = m.pid AND d.d2 = m.md
        |  GROUP BY d.pid, m.md) w ON p.pid = w.pid""".stripMargin),

    "q10_salted_hot" -> withCtes(pts)(
      """SELECT 5 * 72057594037927936
        |    + CAST(floor((lat + 90.0) / 180.0 * 32.0) AS BIGINT) * 268435456
        |    + CAST(floor((lng + 180.0) / 360.0 * 64.0) AS BIGINT) AS k,
        |  count(*) AS n, max(hand) AS mx
        |FROM pts GROUP BY 1""".stripMargin),

    "q11_agreement" -> withCtes(pts, asg, ht, fc, stg, til, mos, mrects, agr)(
      "SELECT cell, agreement FROM agr"),

    "q12_metrics" -> withCtes(pts, asg, ht, fc, stg, til, mos, mrects, agr,
      """c AS (
        |  SELECT count(CASE WHEN agreement = 0 THEN 1 END) AS tn,
        |         count(CASE WHEN agreement = 1 THEN 1 END) AS fn,
        |         count(CASE WHEN agreement = 2 THEN 1 END) AS fp,
        |         count(CASE WHEN agreement = 3 THEN 1 END) AS tp,
        |         count(CASE WHEN agreement = 4 THEN 1 END) AS masked
        |  FROM agr
        |)""".stripMargin)(
      """SELECT tn, fn, fp, tp, masked,
        |  CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE) + CAST(fn AS DOUBLE)) AS csi,
        |  CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE)) AS tpr,
        |  CAST(fp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)) AS far,
        |  (CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE) - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
        |    / sqrt((CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)) * (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
        |           * (CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE)) * (CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE))) AS mcc,
        |  (CAST(tp AS DOUBLE) + CAST(tn AS DOUBLE))
        |    / (CAST(tp AS DOUBLE) + CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE) + CAST(fn AS DOUBLE)) AS acc,
        |  CAST(tp AS DOUBLE) * 2 / (CAST(tp AS DOUBLE) * 2 + CAST(fp AS DOUBLE) + CAST(fn AS DOUBLE)) AS f1,
        |  (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)) / (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE)) AS bias
        |FROM c""".stripMargin),

    "q51_tokens" -> withCtes(corpus)(
      """SELECT doc_id,
        |  CAST(length(text) - length(replace(text, ' ', '')) AS INT) + 1 AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9 ]')) AS INT) AS bpeish_tokens
        |FROM corpus""".stripMargin),

    "q50_curation" -> withCtes(corpus, sh, mh, bnd, prs,
      """dsh AS (SELECT DISTINCT doc_id,
        |  CAST('0x' || substring(md5(sh), 1, 15) AS BIGINT) AS hb FROM sh)""".stripMargin,
      "sz AS (SELECT doc_id, count(*) AS sz FROM dsh GROUP BY doc_id)",
      """inter AS (
        |  SELECT p2.doc_a, p2.doc_b, count(*) AS i
        |  FROM prs p2 JOIN dsh a ON p2.doc_a = a.doc_id
        |  JOIN dsh b ON p2.doc_b = b.doc_id AND a.hb = b.hb
        |  GROUP BY p2.doc_a, p2.doc_b
        |)""".stripMargin,
      """jac AS (
        |  SELECT p.doc_a, p.doc_b,
        |    CAST(coalesce(i.i, 0) AS DOUBLE) / CAST(sa.sz + sb.sz - coalesce(i.i, 0) AS DOUBLE) AS jaccard
        |  FROM prs p
        |  LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
        |  JOIN sz sa ON sa.doc_id = p.doc_a
        |  JOIN sz sb ON sb.doc_id = p.doc_b
        |)""".stripMargin,
      """ql AS (
        |  SELECT doc_id, CAST(nt AS INT) AS n_tokens,
        |    CAST(al AS DOUBLE) / CAST(nt AS DOUBLE) AS mean_word_len,
        |    CAST(st AS DOUBLE) / CAST(nt AS DOUBLE) AS stop_ratio
        |  FROM (SELECT doc_id,
        |          CAST(length(text) - length(replace(text, ' ', '')) AS INT) + 1 AS nt,
        |          length(replace(text, ' ', '')) AS al,
        |          CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5 AS INT) AS st
        |        FROM corpus)
        |  WHERE nt >= 16 AND CAST(al AS DOUBLE) / CAST(nt AS DOUBLE) >= 2.0
        |    AND CAST(al AS DOUBLE) / CAST(nt AS DOUBLE) <= 12.0
        |)""".stripMargin,
      """dlose AS (
        |  SELECT c.doc_id FROM corpus c
        |  JOIN (SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n
        |        FROM corpus GROUP BY md5(text) HAVING count(*) > 1) g
        |    ON md5(c.text) = g.h
        |  WHERE c.doc_id <> g.keeper
        |)""".stripMargin,
      """nlose AS (
        |  SELECT DISTINCT doc_b AS doc_id FROM jac WHERE jaccard >= CAST(0.9 AS DOUBLE)
        |)""".stripMargin)(
      """SELECT q.doc_id, q.n_tokens, q.mean_word_len, q.stop_ratio
        |FROM ql q
        |WHERE NOT EXISTS (SELECT 1 FROM dlose d WHERE d.doc_id = q.doc_id)
        |  AND NOT EXISTS (SELECT 1 FROM nlose n WHERE n.doc_id = q.doc_id)""".stripMargin),

    "q71_repetition" -> withCtes(corpus, sh,
      """rc AS (
        |  SELECT doc_id, hb, count(*) AS cnt
        |  FROM (SELECT doc_id, CAST('0x' || substring(md5(sh), 1, 15) AS BIGINT) AS hb FROM sh)
        |  GROUP BY doc_id, hb
        |)""".stripMargin)(
      """SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_shingles, count(*) AS n_distinct,
        |  max(cnt) AS top_n,
        |  CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS rep_ratio,
        |  CAST(CASE WHEN CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) <= CAST(0.2 AS DOUBLE)
        |       THEN 1 ELSE 0 END AS INT) AS keep_rep
        |FROM rc GROUP BY doc_id""".stripMargin),

    "q13_dedup_exact" -> withCtes(corpus)(
      """SELECT md5(text) AS text_md5, count(*) AS n, min(doc_id) AS keep_doc, max(doc_id) AS max_doc
        |FROM corpus GROUP BY md5(text) HAVING count(*) > 1""".stripMargin),

    "q14_minhash" -> withCtes(corpus, sh, mh)(
      "SELECT doc_id, CAST(seed AS INT) AS seed, minh FROM mh"),

    "q15_lsh_pairs" -> withCtes(corpus, sh, mh, bnd, prs)("SELECT doc_a, doc_b FROM prs"),

    "q16_jaccard" -> withCtes(corpus, sh, mh, bnd, prs,
      """dsh AS (SELECT DISTINCT doc_id,
        |  CAST('0x' || substring(md5(sh), 1, 15) AS BIGINT) AS hb FROM sh)""".stripMargin,
      "sz AS (SELECT doc_id, count(*) AS sz FROM dsh GROUP BY doc_id)",
      """inter AS (
        |  SELECT p2.doc_a, p2.doc_b, count(*) AS i
        |  FROM prs p2 JOIN dsh a ON p2.doc_a = a.doc_id
        |  JOIN dsh b ON p2.doc_b = b.doc_id AND a.hb = b.hb
        |  GROUP BY p2.doc_a, p2.doc_b
        |)""".stripMargin)(
      """SELECT p.doc_a, p.doc_b,
        |  CAST(coalesce(i.i, 0) AS DOUBLE) / CAST(sa.sz + sb.sz - coalesce(i.i, 0) AS DOUBLE) AS jaccard
        |FROM prs p
        |LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
        |JOIN sz sa ON sa.doc_id = p.doc_a
        |JOIN sz sb ON sb.doc_id = p.doc_b""".stripMargin),

    "q17_simhash" -> {
      val sums = (0 until 16).map(k =>
        s"sum(CASE WHEN ((position(substring(h, ${k / 4 + 1}, 1) IN '0123456789abcdef') - 1) >> ${3 - k % 4}) % 2 = 1 THEN 1 ELSE -1 END) AS s$k")
        .mkString(",\n      ")
      val fp = (0 until 16).map(k => s"CASE WHEN s$k > 0 THEN ${1L << k} ELSE 0 END").mkString(" + ")
      withCtes(corpus, sh)(
        s"""SELECT doc_id, CAST($fp AS BIGINT) AS simhash
           |FROM (SELECT doc_id,
           |      $sums
           |      FROM (SELECT doc_id, md5(sh) AS h FROM sh) GROUP BY doc_id)""".stripMargin)
    },

    "q18_langid" -> withCtes(corpus,
      """lc AS (
        |  SELECT doc_id, lang,
        |    CAST((length(t2) - length(replace(t2, ' scan ', ''))) / 6 AS INT) AS c_en,
        |    CAST((length(t2) - length(replace(t2, ' join ', ''))) / 6 AS INT) AS c_es,
        |    CAST((length(t2) - length(replace(t2, ' sort ', ''))) / 6 AS INT) AS c_de,
        |    CAST((length(t2) - length(replace(t2, ' hash ', ''))) / 6 AS INT) AS c_fr,
        |    CAST((length(t2) - length(replace(t2, ' batch ', ''))) / 7 AS INT) AS c_zh
        |  FROM (SELECT doc_id, lang, ' ' || text || ' ' AS t2 FROM corpus)
        |)""".stripMargin)(
      """SELECT doc_id, lang,
        |  CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
        |       WHEN c_es >= c_de AND c_es >= c_fr AND c_es >= c_zh THEN 'es'
        |       WHEN c_de >= c_fr AND c_de >= c_zh THEN 'de'
        |       WHEN c_fr >= c_zh THEN 'fr' ELSE 'zh' END AS lang_pred,
        |  c_en, c_es, c_de, c_fr, c_zh
        |FROM lc""".stripMargin),

    "q19_quality" -> withCtes(corpus)(
      """SELECT doc_id, CAST(nc AS INT) AS n_chars_m, CAST(nt AS INT) AS n_tokens,
        |  CAST(al AS DOUBLE) / CAST(nt AS DOUBLE) AS mean_word_len,
        |  CAST(st AS DOUBLE) / CAST(nt AS DOUBLE) AS stop_ratio,
        |  CASE WHEN nt >= 16 AND CAST(al AS DOUBLE) / CAST(nt AS DOUBLE) >= 2.0
        |            AND CAST(al AS DOUBLE) / CAST(nt AS DOUBLE) <= 12.0 THEN 1 ELSE 0 END AS keep
        |FROM (SELECT doc_id, length(text) AS nc,
        |        CAST(length(text) - length(replace(text, ' ', '')) AS INT) + 1 AS nt,
        |        length(replace(text, ' ', '')) AS al,
        |        CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5 AS INT) AS st
        |      FROM corpus)""".stripMargin),

    "q20_fingerprint" -> withCtes(corpus, sh,
      """dsh AS (SELECT DISTINCT doc_id,
        |  CAST('0x' || substring(md5(sh), 1, 15) AS BIGINT) AS hb FROM sh)""".stripMargin)(
      """SELECT doc_id,
        |  CAST(min(CASE WHEN rn = 1 THEN hb END) AS VARCHAR) || '-'
        |    || CAST(min(CASE WHEN rn = 2 THEN hb END) AS VARCHAR) || '-'
        |    || CAST(min(CASE WHEN rn = 3 THEN hb END) AS VARCHAR) || '-'
        |    || CAST(min(CASE WHEN rn = 4 THEN hb END) AS VARCHAR) AS fp,
        |  count(*) AS k
        |FROM (SELECT doc_id, hb, row_number() OVER (PARTITION BY doc_id ORDER BY hb) AS rn
        |      FROM dsh)
        |WHERE rn <= 4 GROUP BY doc_id""".stripMargin),

    "q21_ann_brute" -> withCtes(qt, nrm,
      """dots AS (
        |  SELECT a.vec_id AS qvec, b.vec_id AS vec, CAST(sum(a.q * b.q) AS BIGINT) AS dot
        |  FROM qt a JOIN qt b ON a.pos = b.pos
        |  WHERE a.vec_id % 250 = 0 AND a.vec_id <> b.vec_id
        |  GROUP BY a.vec_id, b.vec_id
        |)""".stripMargin,
      """scored AS (
        |  SELECT d.qvec, d.vec,
        |    CAST(d.dot AS DOUBLE) / (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(vn.n2 AS DOUBLE))) AS cos
        |  FROM dots d JOIN nrm qn ON d.qvec = qn.vec_id JOIN nrm vn ON d.vec = vn.vec_id
        |)""".stripMargin)(
      """SELECT qvec, CAST(rank AS INT) AS rank, vec, cos
        |FROM (SELECT qvec, vec, cos,
        |        row_number() OVER (PARTITION BY qvec ORDER BY cos DESC, vec ASC) AS rank
        |      FROM scored)
        |WHERE rank <= 5""".stripMargin),

    "q22_srp_buckets" -> {
      val sums = (0 until 8).map(b =>
        s"sum(q * ((((pos + ${b * 37 + 1}) * 2654435761 >> 13) & 1) * 2 - 1)) AS p$b").mkString(",\n      ")
      val bucket = (0 until 8).map(b => s"CASE WHEN p$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
      withCtes(qt)(
        s"""SELECT vec_id, CAST($bucket AS BIGINT) AS bucket
           |FROM (SELECT vec_id,
           |      $sums
           |      FROM qt GROUP BY vec_id)""".stripMargin)
    },

    "q72_ivf_topk" -> withCtes(qt, nrm,
      "cvq AS (SELECT vec_id AS cid, pos, q AS cq FROM qt WHERE vec_id % 50 = 7)",
      "cnr AS (SELECT vec_id AS cid, n2 AS cn2 FROM nrm WHERE vec_id % 50 = 7)",
      """ivfd AS (
        |  SELECT a.vec_id, c.cid, CAST(sum(a.q * c.cq) AS BIGINT) AS dot
        |  FROM qt a JOIN cvq c ON a.pos = c.pos
        |  GROUP BY a.vec_id, c.cid
        |)""".stripMargin,
      """ivfs AS (
        |  SELECT d.vec_id, d.cid, CAST(d.dot AS DOUBLE) / sqrt(CAST(n.cn2 AS DOUBLE)) AS score
        |  FROM ivfd d JOIN cnr n ON d.cid = n.cid
        |)""".stripMargin,
      """asg72 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid ASC) AS rn
        |    FROM ivfs) WHERE rn = 1
        |)""".stripMargin,
      """prb AS (
        |  SELECT vec_id AS qvec, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid ASC) AS rn
        |    FROM ivfs WHERE vec_id % 250 = 0) WHERE rn <= 3
        |)""".stripMargin,
      """cnd AS (
        |  SELECT DISTINCT p.qvec, a.vec_id AS vec
        |  FROM prb p JOIN asg72 a ON p.cid = a.cid
        |  WHERE p.qvec <> a.vec_id
        |)""".stripMargin,
      """dt72 AS (
        |  SELECT c.qvec, c.vec, CAST(sum(x.q * y.q) AS BIGINT) AS dot
        |  FROM cnd c JOIN qt x ON x.vec_id = c.qvec
        |  JOIN qt y ON y.vec_id = c.vec AND y.pos = x.pos
        |  GROUP BY c.qvec, c.vec
        |)""".stripMargin,
      """sc72 AS (
        |  SELECT d.qvec, d.vec,
        |    CAST(d.dot AS DOUBLE) / (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(vn.n2 AS DOUBLE))) AS cos
        |  FROM dt72 d JOIN nrm qn ON d.qvec = qn.vec_id JOIN nrm vn ON d.vec = vn.vec_id
        |)""".stripMargin)(
      """SELECT qvec, CAST(rank AS INT) AS rank, vec, cos
        |FROM (SELECT qvec, vec, cos,
        |        row_number() OVER (PARTITION BY qvec ORDER BY cos DESC, vec ASC) AS rank
        |      FROM sc72)
        |WHERE rank <= 5""".stripMargin),

    "q49_embed_neardup" -> neardupOracle(
      """SELECT d.va, d.vb,
        |  CAST(d.dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos
        |FROM dts d JOIN nrm na ON d.va = na.vec_id JOIN nrm nb ON d.vb = nb.vec_id
        |WHERE CAST(d.dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
        |  >= CAST(0.35 AS DOUBLE)""".stripMargin),

    "q94_neardup_hist" -> neardupOracle(
      """SELECT CAST(floor(cosv * CAST(10.0 AS DOUBLE)) AS BIGINT) AS band,
        |  count(*) AS n_pairs, min(cosv) AS cos_min, max(cosv) AS cos_max
        |FROM (SELECT CAST(d.dot AS DOUBLE)
        |        / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosv
        |      FROM dts d JOIN nrm na ON d.va = na.vec_id JOIN nrm nb ON d.vb = nb.vec_id)
        |GROUP BY CAST(floor(cosv * CAST(10.0 AS DOUBLE)) AS BIGINT)""".stripMargin),
  ) ++ oracleSqlRest

  /** Shared oracle-CTE chain for the adaptive multi-table SRP near-dup
    * candidates (q49/q94): adaptive nBits (masked to the first `nb` of 16
    * bit-sums, nb from the corpus count — the same integer formula as
    * AnnSearch.adaptiveBits) × 8 hyperplane tables, mirroring
    * AnnSearch.nearDupPairs; `body` runs over the dts/nrm tables. */
  private def neardupOracle(body: String): String =
    withCtes(neardupCtes: _*)(body)

  /** [[neardupOracle]] with extra (possibly recursive) CTEs appended — the
    * q132 semantic-dedup oracle closes the scored pairs into connected
    * components with a recursive reachability walk. */
  private def neardupRecursiveOracle(extra: Seq[String])(body: String): String =
    withRecursiveCtes((neardupCtes ++ extra): _*)(body)

  private def neardupCtes: Seq[String] = {
      val tables = 8
      def bktCte(t: Int): String = {
        val sums = (0 until 16).map(b =>
          s"sum(q * ((((pos + ${t * 1009 + b * 37 + 1}) * 2654435761 >> 13) & 1) * 2 - 1)) AS p$b")
          .mkString(",\n        ")
        val bucket = (0 until 16).map(b =>
          s"CASE WHEN $b < (SELECT nb FROM nbv) AND p$b > 0 THEN ${1L << b} ELSE 0 END")
          .mkString(" + ")
        s"""bkt$t AS (
           |  SELECT vec_id, CAST($bucket AS BIGINT) AS bucket
           |  FROM (SELECT vec_id,
           |        $sums
           |        FROM qt GROUP BY vec_id))""".stripMargin
      }
      // capped window pairs: rank within bucket by a per-table hash order,
      // each vector pairs with its next 8 neighbors (equi-join on rank+k)
      val rankCtes = (0 until tables).map(t =>
        s"""rt$t AS (
           |  SELECT vec_id, bucket,
           |    row_number() OVER (PARTITION BY bucket
           |      ORDER BY ((vec_id + ${t * 7919}) * 2654435761) % 1000000007, vec_id) AS rn
           |  FROM bkt$t)""".stripMargin)
      val unions = (0 until tables).map(t =>
        s"""SELECT least(a.vec_id, b.vec_id) AS va, greatest(a.vec_id, b.vec_id) AS vb
           |    FROM (SELECT vec_id, bucket, rn + k.k AS rn
           |          FROM rt$t, generate_series(1, 8) k(k)) a
           |    JOIN rt$t b ON a.bucket = b.bucket AND a.rn = b.rn""".stripMargin)
        .mkString("\n    UNION ALL\n    ")
      Seq(qt, nrm,
        """nbv AS (
          |  SELECT CASE WHEN m <= 1 THEN 2 ELSE greatest(2, least(16, length(bin(m - 1)))) END AS nb
          |  FROM (SELECT (count(*) + 31) // 32 AS m FROM embeddings)
          |)""".stripMargin) ++ (0 until tables).map(bktCte) ++ rankCtes ++ Seq(
        s"""cp AS (
           |  SELECT DISTINCT va, vb FROM (
           |    $unions
           |  )
           |)""".stripMargin,
        """dts AS (
          |  SELECT c.va, c.vb, CAST(sum(x.q * y.q) AS BIGINT) AS dot
          |  FROM cp c JOIN qt x ON x.vec_id = c.va
          |  JOIN qt y ON y.vec_id = c.vb AND y.pos = x.pos
          |  GROUP BY c.va, c.vb
          |)""".stripMargin)
  }

  // ---- shared link-graph CTEs (q140/q143/q144): nodes = base corpus docs,
  // edges = the 3-quadratic-residue-target synthetic graph ----
  /** Mirrored-pages fixture (q147/q149/q155): every 3rd page duplicated on
    * host m-<host>. */
  private val mirPgm =
    """pgm AS (
      |  SELECT 'https://' || source || '.example.com/doc/'
      |      || CAST(doc_id AS VARCHAR) AS url, text
      |  FROM documents
      |  UNION ALL
      |  SELECT 'https://m-' || source || '.example.com/doc/'
      |      || CAST(doc_id AS VARCHAR) AS url, text
      |  FROM documents WHERE doc_id % 3 = 0
      |)""".stripMargin

  /** Host-reputation chain over the mirrored fixture (q149/q155). */
  private val repCtes: Seq[String] = Seq(mirPgm,
    """rwd AS (
      |  SELECT split_part(url, '/', 3) AS host, ws[g.i] AS w
      |  FROM (SELECT url, string_split(text, ' ') AS ws FROM pgm)
      |  CROSS JOIN generate_series(1, 128) g(i)
      |  WHERE g.i <= len(ws)
      |)""".stripMargin,
    """rsc AS (
      |  SELECT host, count(*) AS n_words,
      |    sum(((CAST('0x' || substring(md5(w), 1, 15) AS BIGINT) % 4096)
      |          * 2654435761) % 2003 - 1001) AS w_sum
      |  FROM rwd GROUP BY host
      |)""".stripMargin,
    """rhs AS (
      |  SELECT split_part(url, '/', 3) AS host, url,
      |    CAST('0x' || substring(md5(text), 1, 15) AS BIGINT) AS hb
      |  FROM pgm
      |)""".stripMargin,
    "roc AS (SELECT hb, count(*) AS nocc FROM rhs GROUP BY hb)",
    """rdp AS (
      |  SELECT host, count(*) AS n_pages,
      |    sum(CASE WHEN o.nocc >= 2 THEN 1 ELSE 0 END) AS n_dup_pages
      |  FROM rhs h JOIN roc o ON h.hb = o.hb GROUP BY host
      |)""".stripMargin,
    """rvd AS (
      |  SELECT d.host, d.n_pages, d.n_dup_pages,
      |    d.n_dup_pages * 1000000 // d.n_pages AS dup_ppm,
      |    ((s.w_sum + 1001 * s.n_words) * 1000) // s.n_words AS score_ppk,
      |    CASE WHEN d.n_dup_pages * 1000000 // d.n_pages >= 500000
      |           THEN 'mirror-block'
      |         WHEN ((s.w_sum + 1001 * s.n_words) * 1000) // s.n_words < 1001000
      |           THEN 'low-quality'
      |         ELSE 'keep' END AS verdict
      |  FROM rdp d JOIN rsc s ON d.host = s.host
      |)""".stripMargin)

  /** Content-drift chain at host grain (q145/q155). */
  private val driftCtes: Seq[String] = Seq(
    """ftc AS (
      |  SELECT CAST(doc_id AS BIGINT) AS pid,
      |    source || '.example.com' AS host, g.f AS f
      |  FROM documents CROSS JOIN generate_series(0, 2) g(f)
      |  WHERE g.f <= doc_id % 3
      |)""".stripMargin,
    """chg AS (
      |  SELECT pid, host,
      |    CASE WHEN f = 0 THEN 0
      |         WHEN ((pid // (f + 1)) % 3) <> ((pid // f) % 3) THEN 1
      |         ELSE 0 END AS changed
      |  FROM ftc
      |)""".stripMargin,
    """pdu AS (
      |  SELECT pid, host, count(*) - 1 AS n_refetches,
      |    sum(changed) AS n_changed
      |  FROM chg GROUP BY pid, host
      |)""".stripMargin,
    """hdr AS (
      |  SELECT host, CAST(count(*) AS BIGINT) AS n_urls,
      |    CAST(sum(n_refetches) AS BIGINT) AS n_refetches,
      |    CAST(sum(n_changed) AS BIGINT) AS n_changed
      |  FROM pdu GROUP BY host
      |)""".stripMargin,
    """bkt AS (
      |  SELECT host,
      |    CASE WHEN n_refetches > 0 AND (n_changed * 1000000) // n_refetches >= 500000 THEN 'volatile'
      |         WHEN n_refetches > 0 AND n_changed > 0 THEN 'drifting'
      |         ELSE 'static' END AS bucket
      |  FROM hdr
      |)""".stripMargin)

  private val lgNds = "nds AS (SELECT doc_id FROM corpus WHERE doc_id < 1000000)"
  private val lgNtot = "ntot AS (SELECT count(*) AS n FROM nds)"
  private val lgEdg =
    """edg AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT doc_id AS src, (doc_id * doc_id + g.k * 7919 + 13) % t.n AS dst
      |    FROM nds CROSS JOIN ntot t CROSS JOIN generate_series(0, 2) g(k))
      |  WHERE dst <> src
      |)""".stripMargin

  private def oracleSqlRest: Map[String, String] = Map(

    "q23_reaches" -> withCtes(net)(
      "SELECT hydroid, huc8, order_, length_km, to_node FROM net"),

    // dup-graph connected components: exact-content star edges ∪ Jaccard-
    // verified LSH pairs, closed by a recursive reachability walk; the Spark
    // side's min-label propagation must converge to the same min-reachable-id
    "q118_dup_components" -> withRecursiveCtes(corpus, sh, mh, bnd, prs,
      dsh, shSz, shInter, jacCte,
      """epr AS (
        |  SELECT g.doc_a, c.doc_id AS doc_b
        |  FROM corpus c JOIN (SELECT md5(text) AS h, min(doc_id) AS doc_a, count(*) AS n
        |                      FROM corpus GROUP BY md5(text) HAVING count(*) > 1) g
        |    ON md5(c.text) = g.h
        |  WHERE c.doc_id <> g.doc_a
        |)""".stripMargin,
      """edg AS (
        |  SELECT DISTINCT doc_a, doc_b FROM (
        |    SELECT doc_a, doc_b FROM epr
        |    UNION ALL
        |    SELECT doc_a, doc_b FROM jac WHERE jaccard >= CAST(0.9 AS DOUBLE))
        |)""".stripMargin,
      """und AS (
        |  SELECT doc_a AS a, doc_b AS b FROM edg
        |  UNION ALL
        |  SELECT doc_b AS a, doc_a AS b FROM edg
        |)""".stripMargin,
      "nds AS (SELECT DISTINCT a AS doc_id FROM und)",
      """reach AS (
        |  SELECT doc_id AS node, doc_id AS r FROM nds
        |  UNION
        |  SELECT u.b AS node, reach.r AS r FROM reach JOIN und u ON u.a = reach.node
        |)""".stripMargin,
      "cmp AS (SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node)",
      "csz AS (SELECT component, count(*) AS cluster_size FROM cmp GROUP BY component)")(
      """SELECT c.doc_id, c.component, s.cluster_size,
        |  CAST(CASE WHEN c.doc_id = c.component THEN 1 ELSE 0 END AS INT) AS keep
        |FROM cmp c JOIN csz s ON c.component = s.component""".stripMargin),

    // benchmark decontamination: eval shingle set ⋈ corpus distinct shingles
    "q119_decontaminate" -> withCtes(corpus, sh, dsh,
      "esh AS (SELECT DISTINCT hb FROM dsh WHERE doc_id < 1000000 AND doc_id % 37 = 0)",
      "szq AS (SELECT doc_id, count(*) AS n_shingles FROM dsh GROUP BY doc_id)",
      """ovq AS (SELECT d.doc_id, count(*) AS n_overlap
        |        FROM dsh d JOIN esh e ON d.hb = e.hb GROUP BY d.doc_id)""".stripMargin)(
      """SELECT o.doc_id, s.n_shingles, o.n_overlap,
        |  CAST(o.n_overlap AS DOUBLE) / CAST(s.n_shingles AS DOUBLE) AS overlap_frac,
        |  CAST(CASE WHEN CAST(o.n_overlap AS DOUBLE) / CAST(s.n_shingles AS DOUBLE)
        |              >= CAST(0.2 AS DOUBLE) THEN 1 ELSE 0 END AS INT) AS contaminated
        |FROM ovq o JOIN szq s ON o.doc_id = s.doc_id""".stripMargin),

    // shingle heavy hitters: total-ordered top-20 by document frequency
    "q120_shingle_topk" -> withCtes(corpus, sh, dsh)(
      "SELECT hb, count(*) AS df_docs FROM dsh GROUP BY hb ORDER BY df_docs DESC, hb LIMIT 20"),

    // rational TF-IDF top-3 terms per doc (tf·N exact BIGINT, one division)
    "q121_tfidf" -> withCtes(corpus, wrd,
      "tfq AS (SELECT doc_id, w, count(*) AS tf FROM wrd GROUP BY doc_id, w)",
      "dfq AS (SELECT w, count(*) AS df_docs FROM tfq GROUP BY w)",
      "ndc AS (SELECT count(*) AS n_docs FROM corpus)",
      """scq AS (
        |  SELECT t.doc_id, t.w, t.tf, d.df_docs,
        |    CAST(t.tf * n.n_docs AS DOUBLE) / CAST(d.df_docs AS DOUBLE) AS score
        |  FROM tfq t JOIN dfq d ON t.w = d.w CROSS JOIN ndc n
        |)""".stripMargin,
      """rkq AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w) AS rnk
        |  FROM scq
        |)""".stripMargin)(
      """SELECT doc_id, w, tf, df_docs, score, CAST(rnk AS INT) AS rnk
        |FROM rkq WHERE rnk <= 3""".stripMargin),

    // inverted-index probe: postings for doc 7's term set
    "q122_postings" -> withCtes(corpus, wrd,
      "tfq AS (SELECT doc_id, w, count(*) AS tf FROM wrd GROUP BY doc_id, w)",
      "trm AS (SELECT DISTINCT w FROM wrd WHERE doc_id = 7)")(
      "SELECT t.w, t.doc_id, t.tf FROM tfq t JOIN trm ON t.w = trm.w"),

    // vocabulary stats: scalar aggregates per word
    "q123_vocab" -> withCtes(corpus, wrd,
      "tfq AS (SELECT doc_id, w, count(*) AS tf FROM wrd GROUP BY doc_id, w)")(
      """SELECT w, count(*) AS df_docs, CAST(sum(tf) AS BIGINT) AS tf_total,
        |  min(doc_id) AS doc_min, max(doc_id) AS doc_max
        |FROM tfq GROUP BY w""".stripMargin),

    // sequence packing: per-shard running token offsets, windows spanned
    "q124_seq_pack" -> withCtes(corpus,
      """tok AS (
        |  SELECT doc_id, CAST(doc_id % 64 AS INT) AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM corpus
        |)""".stripMargin,
      """cum AS (
        |  SELECT *, sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tok_end
        |  FROM tok
        |)""".stripMargin)(
      """SELECT doc_id, shard, n_tokens,
        |  CAST(tok_end - n_tokens AS BIGINT) AS tok_start,
        |  CAST(tok_end AS BIGINT) AS tok_end,
        |  CAST((tok_end - n_tokens) // 2048 AS BIGINT) AS seq_first,
        |  CAST((tok_end - 1) // 2048 AS BIGINT) AS seq_last,
        |  CAST((tok_end - 1) // 2048 - (tok_end - n_tokens) // 2048 + 1 AS BIGINT) AS n_seqs
        |FROM cum""".stripMargin),

    // mix plan: α=1/2 weights via exact integer sqrt + correction ladder
    "q125_mix_weights" -> withCtes(corpus,
      """per AS (
        |  SELECT lang, count(*) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM corpus GROUP BY lang
        |)""".stripMargin,
      """wq AS (
        |  SELECT lang, n_docs, n_tokens,
        |    CASE WHEN s1 * s1 > n_docs THEN s1 - 1
        |         WHEN (s1 + 1) * (s1 + 1) <= n_docs THEN s1 + 1
        |         ELSE s1 END AS w_sqrt
        |  FROM (SELECT *, CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS s1 FROM per)
        |)""".stripMargin,
      "tot AS (SELECT CAST(sum(w_sqrt) AS BIGINT) AS w_total FROM wq)")(
      """SELECT lang, n_docs, n_tokens, w_sqrt,
        |  CAST(w_sqrt AS DOUBLE) / CAST(w_total AS DOUBLE) AS weight,
        |  CAST((w_sqrt * 1000000) // w_total AS BIGINT) AS quota_docs
        |FROM wq CROSS JOIN tot""".stripMargin),

    // span-level duplication profile: df per shingle hash, per-doc dup share
    "q126_dup_spans" -> withCtes(corpus, sh, dsh,
      "dfq AS (SELECT hb, count(*) AS df_docs FROM dsh GROUP BY hb)")(
      """SELECT d.doc_id, count(*) AS n_shingles,
        |  CAST(sum(CASE WHEN f.df_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |  CAST(sum(CASE WHEN f.df_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS dup_frac,
        |  CAST(CASE WHEN CAST(sum(CASE WHEN f.df_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) >= CAST(0.5 AS DOUBLE)
        |    THEN 1 ELSE 0 END AS INT) AS heavy_dup
        |FROM dsh d JOIN dfq f ON d.hb = f.hb GROUP BY d.doc_id""".stripMargin),

    // BPE merge step: adjacent word pairs from the bounded word table
    "q127_bpe_pairs" -> withCtes(corpus, wrd,
      """bpr AS (
        |  SELECT a.w AS w1, b.w AS w2
        |  FROM wrd a JOIN wrd b ON a.doc_id = b.doc_id AND b.p = a.p + 1
        |)""".stripMargin)(
      """SELECT w1, w2, count(*) AS n_pairs FROM bpr GROUP BY w1, w2
        |ORDER BY n_pairs DESC, w1, w2 LIMIT 20""".stripMargin),

    // Z-order vs hash layout zone maps: Morton interleave via exact integer
    // arithmetic, prefix buckets, per-bucket min/max + probe-box skip verdict
    "q128_zorder_skip" -> {
      val zexpr = (0 until graft.ops.Layout.ZBits).map { b =>
        s"((cr // ${1L << b}) % 2) * ${1L << (2 * b + 1)} + ((cc // ${1L << b}) % 2) * ${1L << (2 * b)}"
      }.mkString(" + ")
      withCtes(pts,
        """zc AS (
          |  SELECT pid,
          |    CAST(floor((lat + 90.0) / 180.0 * 4096.0) AS BIGINT) AS cr,
          |    CAST(floor((lng + 180.0) / 360.0 * 8192.0) AS BIGINT) AS cc
          |  FROM pts
          |)""".stripMargin,
        s"zk AS (SELECT pid, cr, cc, $zexpr AS zkey FROM zc)",
        s"""lay AS (
           |  SELECT 'zorder' AS layout, zkey // ${1L << graft.ops.Layout.BucketShift} AS bucket, cr, cc FROM zk
           |  UNION ALL
           |  SELECT 'hash' AS layout, pid % 64 AS bucket, cr, cc FROM zc
           |)""".stripMargin)(
        s"""SELECT layout, bucket, count(*) AS n_pages,
           |  min(cr) AS row_min, max(cr) AS row_max,
           |  min(cc) AS col_min, max(cc) AS col_max,
           |  CAST(CASE WHEN min(cr) <= $ProbeRowHi AND max(cr) >= $ProbeRowLo
           |    AND min(cc) <= $ProbeColHi AND max(cc) >= $ProbeColLo
           |    THEN 0 ELSE 1 END AS INT) AS can_skip
           |FROM lay GROUP BY layout, bucket""".stripMargin)
    },

    // rational surprisal: rarity = corpus_tokens DIV word_count (exact
    // BIGINT), per-doc integer sum, one division, fixed-threshold buckets
    "q129_rarity_bucket" -> withCtes(corpus, wrd,
      "tfw AS (SELECT w, count(*) AS tf_total FROM wrd GROUP BY w)",
      "ntot AS (SELECT count(*) AS n_total FROM wrd)",
      "rar AS (SELECT w, n_total // tf_total AS rarity FROM tfw CROSS JOIN ntot)",
      """dsc AS (
        |  SELECT d.doc_id, count(*) AS n_tokens,
        |    CAST(sum(r.rarity) AS BIGINT) AS rarity_sum
        |  FROM wrd d JOIN rar r ON d.w = r.w GROUP BY d.doc_id
        |)""".stripMargin,
      """msc AS (
        |  SELECT doc_id, n_tokens, rarity_sum,
        |    CAST(rarity_sum AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS mean_rarity
        |  FROM dsc
        |)""".stripMargin)(
      """SELECT doc_id, n_tokens, rarity_sum, mean_rarity,
        |  CASE WHEN mean_rarity < CAST(10.0 AS DOUBLE) THEN 'common'
        |       WHEN mean_rarity < CAST(100.0 AS DOUBLE) THEN 'typical'
        |       WHEN mean_rarity < CAST(1000.0 AS DOUBLE) THEN 'rare'
        |       ELSE 'exotic' END AS bucket
        |FROM msc""".stripMargin),

    // per-domain cap over the canonical-URL table (q74 chain + ranked cut)
    "q130_domain_cap" -> withCtes(flog,
      """cano AS (
        |  SELECT pid, fetch_ts,
        |    lower(split_part(split_part(raw, '#', 1), '?', 1)) AS canon
        |  FROM flog
        |)""".stripMargin,
      """cu AS (
        |  SELECT canon, split_part(canon, '/', 3) AS host,
        |    count(*) AS n_fetches, max(fetch_ts) AS latest_ts, min(pid) AS first_pid
        |  FROM cano GROUP BY canon, split_part(canon, '/', 3)
        |)""".stripMargin,
      """rkd AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY host ORDER BY n_fetches DESC, canon) AS rnk
        |  FROM cu
        |)""".stripMargin)(
      """SELECT host, canon, n_fetches, latest_ts, first_pid, CAST(rnk AS INT) AS rnk
        |FROM rkd WHERE rnk <= 2""".stripMargin),

    // exact nearest-rank percentiles over the (lang × length) histogram;
    // the rank cuts are integer comparisons (cum·den ≥ num·N ⇔ cum ≥ ⌈q·N⌉)
    "q131_length_quantiles" -> withCtes(corpus,
      """lq AS (
        |  SELECT lang,
        |    CAST(least(len(string_split(text, ' ')), 128) AS BIGINT) AS n_tokens
        |  FROM corpus
        |)""".stripMargin,
      """lh AS (SELECT lang, n_tokens, count(*) AS cnt
        |       FROM lq GROUP BY lang, n_tokens)""".stripMargin,
      """lc AS (
        |  SELECT lang, n_tokens, cnt,
        |    sum(cnt) OVER (PARTITION BY lang ORDER BY n_tokens
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM lh
        |)""".stripMargin,
      "lt AS (SELECT lang, sum(cnt) AS n_docs FROM lh GROUP BY lang)")(
      """SELECT c.lang, max(t.n_docs) AS n_docs,
        |  min(CASE WHEN c.cum * 2 >= t.n_docs THEN c.n_tokens END) AS p50,
        |  min(CASE WHEN c.cum * 10 >= t.n_docs * 9 THEN c.n_tokens END) AS p90,
        |  min(CASE WHEN c.cum * 100 >= t.n_docs * 99 THEN c.n_tokens END) AS p99,
        |  max(c.n_tokens) AS n_max
        |FROM lc c JOIN lt t ON c.lang = t.lang
        |GROUP BY c.lang""".stripMargin),

    // semantic-dedup ledger: the SRP scored-pair chain (same CTEs as q49)
    // at cos ≥ 0.35, closed by a recursive reachability walk to components
    "q132_semantic_dedup" -> neardupRecursiveOracle(Seq(
      """spr AS (
        |  SELECT d.va, d.vb
        |  FROM dts d JOIN nrm na ON d.va = na.vec_id
        |  JOIN nrm nb ON d.vb = nb.vec_id
        |  WHERE CAST(d.dot AS DOUBLE)
        |      / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
        |    >= CAST(0.35 AS DOUBLE)
        |)""".stripMargin,
      """und132 AS (
        |  SELECT va AS a, vb AS b FROM spr
        |  UNION ALL
        |  SELECT vb AS a, va AS b FROM spr
        |)""".stripMargin,
      "nds132 AS (SELECT DISTINCT a AS vec_id FROM und132)",
      """reach132 AS (
        |  SELECT vec_id AS node, vec_id AS r FROM nds132
        |  UNION
        |  SELECT u.b AS node, reach132.r AS r
        |  FROM reach132 JOIN und132 u ON u.a = reach132.node
        |)""".stripMargin,
      "cmp132 AS (SELECT node AS vec_id, min(r) AS component FROM reach132 GROUP BY node)",
      """csz132 AS (SELECT component, count(*) AS cluster_size
        |           FROM cmp132 GROUP BY component)""".stripMargin))(
      """SELECT c.vec_id, c.component, s.cluster_size,
        |  CAST(CASE WHEN c.vec_id = c.component THEN 1 ELSE 0 END AS INT) AS keep
        |FROM cmp132 c JOIN csz132 s ON c.component = s.component""".stripMargin),

    // fuzzy decontamination: eval-side bands ⋈ corpus-side bands (no id
    // ordering — eval ids are interleaved with corpus ids), exact Jaccard
    // over the candidate pairs, per-corpus-doc argmax eval match
    "q133_fuzzy_decontam" -> withCtes(corpus, sh, mh, bnd,
      """fprs AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bnd a JOIN bnd b ON a.band = b.band AND a.k0 = b.k0
        |    AND a.k1 = b.k1 AND a.k2 = b.k2 AND a.k3 = b.k3
        |  WHERE (a.doc_id < 1000000 AND a.doc_id % 37 = 0)
        |    AND NOT (b.doc_id < 1000000 AND b.doc_id % 37 = 0)
        |)""".stripMargin,
      dsh,
      "fsz AS (SELECT doc_id, count(*) AS sz FROM dsh GROUP BY doc_id)",
      """fint AS (
        |  SELECT p2.doc_a, p2.doc_b, count(*) AS i
        |  FROM fprs p2 JOIN dsh a ON p2.doc_a = a.doc_id
        |  JOIN dsh b ON p2.doc_b = b.doc_id AND a.hb = b.hb
        |  GROUP BY p2.doc_a, p2.doc_b
        |)""".stripMargin,
      """fj AS (
        |  SELECT p.doc_a, p.doc_b,
        |    CAST(coalesce(i.i, 0) AS DOUBLE) / CAST(sa.sz + sb.sz - coalesce(i.i, 0) AS DOUBLE) AS jaccard
        |  FROM fprs p
        |  LEFT JOIN fint i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
        |  JOIN fsz sa ON sa.doc_id = p.doc_a
        |  JOIN fsz sb ON sb.doc_id = p.doc_b
        |)""".stripMargin)(
      """SELECT doc_b AS doc_id, doc_a AS eval_doc, jaccard,
        |  CAST(CASE WHEN jaccard >= CAST(0.5 AS DOUBLE) THEN 1 ELSE 0 END AS INT) AS leaked
        |FROM (SELECT doc_a, doc_b, jaccard,
        |        row_number() OVER (PARTITION BY doc_b ORDER BY jaccard DESC, doc_a ASC) AS rn
        |      FROM fj)
        |WHERE rn = 1""".stripMargin),

    // exact-substring removal intervals: positional grams × cross-doc df ≥ 2,
    // per-doc gaps-and-islands merge of overlapping [pos, pos+7] spans
    "q134_dup_span_removal" -> withCtes(corpus, sh, dsh,
      """psh AS (
        |  SELECT c.doc_id, CAST(g.i AS BIGINT) AS pos,
        |    CAST('0x' || substring(md5(substring(c.text, g.i, 8)), 1, 15) AS BIGINT) AS hb
        |  FROM corpus c CROSS JOIN generate_series(1, 505) g(i)
        |  WHERE g.i <= least(length(c.text), 512) - 7
        |)""".stripMargin,
      "sdf AS (SELECT hb, count(*) AS df_docs FROM dsh GROUP BY hb)",
      """dpp AS (SELECT p.doc_id, p.pos
        |        FROM psh p JOIN sdf f ON p.hb = f.hb AND f.df_docs >= 2)""".stripMargin,
      """sisl AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
        |      OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) >= 8
        |    THEN 1 ELSE 0 END AS new_island
        |  FROM dpp
        |)""".stripMargin,
      """sisl2 AS (
        |  SELECT doc_id, pos,
        |    CAST(sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
        |  FROM sisl
        |)""".stripMargin)(
      """SELECT doc_id, island, min(pos) AS span_start, max(pos) + 7 AS span_end,
        |  max(pos) + 7 - min(pos) + 1 AS span_len, count(*) AS n_grams
        |FROM sisl2 GROUP BY doc_id, island""".stripMargin),

    // KMV distinct-cardinality estimate: k-th smallest distinct 60-bit hash
    // per language; exact count beside it as the comparison baseline
    "q135_kmv_distinct" -> withCtes(corpus, sh, dsh,
      """dshl AS (SELECT DISTINCT c.lang, s.hb
        |         FROM dsh s JOIN corpus c ON s.doc_id = c.doc_id)""".stripMargin,
      """krk AS (SELECT lang, hb,
        |  dense_rank() OVER (PARTITION BY lang ORDER BY hb) AS rnk FROM dshl)""".stripMargin,
      """kst AS (SELECT lang, max(hb) AS kth, count(*) AS n_kept
        |        FROM krk WHERE rnk <= 64 GROUP BY lang)""".stripMargin,
      "kex AS (SELECT lang, count(*) AS n_exact FROM dshl GROUP BY lang)")(
      """SELECT s.lang, e.n_exact, s.n_kept,
        |  CASE WHEN s.n_kept < 64 THEN CAST(s.n_kept AS DOUBLE)
        |       ELSE CAST(63 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
        |            / CAST(s.kth AS DOUBLE) END AS kmv_estimate
        |FROM kst s JOIN kex e ON s.lang = e.lang""".stripMargin),

    // sharded Bloom filter: build from even-id content hashes, probe odd ids;
    // double-hashed positions (h1 + k·h2 mod 1008), 63 usable bits per word
    "q136_bloom_probe" -> withCtes(corpus,
      """bky AS (
        |  SELECT doc_id, hb, CAST((hb // 1048576) % 64 AS INT) AS shard,
        |    hb % 1008 AS h1, 1 + (hb % 1007) AS h2
        |  FROM (SELECT doc_id,
        |          CAST('0x' || substring(md5(text), 1, 15) AS BIGINT) AS hb
        |        FROM corpus)
        |)""".stripMargin,
      """bfl AS (
        |  SELECT shard, CAST(p // 63 AS INT) AS word,
        |    bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INT)) AS bits
        |  FROM (SELECT b.shard, (b.h1 + g.k * b.h2) % 1008 AS p
        |        FROM (SELECT DISTINCT hb, shard, h1, h2 FROM bky
        |              WHERE doc_id % 2 = 0) b
        |        CROSS JOIN generate_series(0, 2) g(k))
        |  GROUP BY shard, CAST(p // 63 AS INT)
        |)""".stripMargin,
      """bht AS (
        |  SELECT p.doc_id, p.hb,
        |    min(CAST((coalesce(f.bits, CAST(0 AS BIGINT)) >> CAST(p.p % 63 AS INT)) % 2 AS INT)) AS maybe_present
        |  FROM (SELECT doc_id, hb, shard, (h1 + g.k * h2) % 1008 AS p
        |        FROM bky CROSS JOIN generate_series(0, 2) g(k)
        |        WHERE doc_id % 2 = 1) p
        |  LEFT JOIN bfl f ON f.shard = p.shard AND f.word = CAST(p.p // 63 AS INT)
        |  GROUP BY p.doc_id, p.hb
        |)""".stripMargin)(
      """SELECT h.doc_id, h.maybe_present,
        |  CAST(CASE WHEN e.hb IS NOT NULL THEN 1 ELSE 0 END AS INT) AS present_exact
        |FROM bht h LEFT JOIN (SELECT DISTINCT hb FROM bky WHERE doc_id % 2 = 0) e
        |  ON h.hb = e.hb""".stripMargin),

    // bigram LM: conditional probability in ppm from the distinct-bigram
    // table (prefix mass = sum of c12 per w1 — one corpus count pass)
    "q137_bigram_lm" -> withCtes(corpus, wrd,
      """bgr AS (
        |  SELECT a.doc_id, a.w AS w1, b.w AS w2
        |  FROM wrd a JOIN wrd b ON a.doc_id = b.doc_id AND b.p = a.p + 1
        |)""".stripMargin,
      "c12q AS (SELECT w1, w2, count(*) AS c12 FROM bgr GROUP BY w1, w2)",
      "c1q AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12q GROUP BY w1)",
      """scq AS (SELECT c.w1, c.w2,
        |  CAST((c.c12 * 1000000) // p.c1 AS BIGINT) AS cond_ppm
        |FROM c12q c JOIN c1q p ON c.w1 = p.w1)""".stripMargin)(
      """SELECT g.doc_id, count(*) AS n_bigrams,
        |  CAST(sum(s.cond_ppm) AS BIGINT) AS ppm_sum,
        |  CAST(sum(s.cond_ppm) // count(*) AS BIGINT) AS mean_ppm,
        |  CASE WHEN sum(s.cond_ppm) // count(*) >= 500000 THEN 'fluent'
        |       WHEN sum(s.cond_ppm) // count(*) >= 100000 THEN 'typical'
        |       ELSE 'surprising' END AS bucket
        |FROM bgr g JOIN scq s ON g.w1 = s.w1 AND g.w2 = s.w2
        |GROUP BY g.doc_id""".stripMargin),

    // hashed linear classifier: md5-bucket features, hash-derived integer
    // weights in [-1001, 1001], shifted non-negative per-word mean
    "q138_quality_classifier" -> withCtes(corpus, wrd,
      """wgt AS (
        |  SELECT doc_id,
        |    ((CAST('0x' || substring(md5(w), 1, 15) AS BIGINT) % 4096)
        |      * 2654435761) % 2003 - 1001 AS weight
        |  FROM wrd
        |)""".stripMargin)(
      """SELECT doc_id, count(*) AS n_words, CAST(sum(weight) AS BIGINT) AS w_sum,
        |  CAST(((sum(weight) + 1001 * count(*)) * 1000) // count(*) AS BIGINT) AS avg_shift_ppk,
        |  CAST(CASE WHEN ((sum(weight) + 1001 * count(*)) * 1000) // count(*)
        |              >= 1001000 THEN 1 ELSE 0 END AS INT) AS keep
        |FROM wgt GROUP BY doc_id""".stripMargin),

    // epoch shuffle: the oracle is the straight global row_number over the
    // hash key — the engine's bucketed prefix-sum form must agree exactly
    "q139_epoch_order" -> withCtes(corpus,
      """eky AS (
        |  SELECT doc_id,
        |    CAST('0x' || substring(md5('ep0:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS okey
        |  FROM corpus
        |)""".stripMargin)(
      """SELECT doc_id, okey, CAST(okey // 1125899906842624 AS INT) AS bucket,
        |  CAST(row_number() OVER (ORDER BY okey, doc_id) - 1 AS BIGINT) AS global_pos
        |FROM eky""".stripMargin),

    // fixed-point PageRank, 3 unrolled rounds: hash-derived 3-out-link graph
    // over the contiguous base-doc id space; damping 85/100, teleport
    // 150000000 div n, every step floor-divided BIGINT ppb
    "q140_pagerank" -> withCtes(corpus, lgNds, lgNtot, lgEdg,
      "odg AS (SELECT src, count(*) AS outdeg FROM edg GROUP BY src)",
      "idg AS (SELECT dst, count(*) AS n_in FROM edg GROUP BY dst)",
      "pr0 AS (SELECT doc_id, 1000000000 // t.n AS r FROM nds CROSS JOIN ntot t)",
      """pr1 AS (
        |  SELECT nd.doc_id, (150000000 // t.n) + (85 * coalesce(s.m, 0)) // 100 AS r
        |  FROM nds nd CROSS JOIN ntot t
        |  LEFT JOIN (SELECT e.dst AS doc_id, CAST(sum(p.r // o.outdeg) AS BIGINT) AS m
        |             FROM edg e JOIN odg o ON e.src = o.src
        |             JOIN pr0 p ON e.src = p.doc_id GROUP BY e.dst) s
        |    ON nd.doc_id = s.doc_id
        |)""".stripMargin,
      """pr2 AS (
        |  SELECT nd.doc_id, (150000000 // t.n) + (85 * coalesce(s.m, 0)) // 100 AS r
        |  FROM nds nd CROSS JOIN ntot t
        |  LEFT JOIN (SELECT e.dst AS doc_id, CAST(sum(p.r // o.outdeg) AS BIGINT) AS m
        |             FROM edg e JOIN odg o ON e.src = o.src
        |             JOIN pr1 p ON e.src = p.doc_id GROUP BY e.dst) s
        |    ON nd.doc_id = s.doc_id
        |)""".stripMargin,
      """pr3 AS (
        |  SELECT nd.doc_id, (150000000 // t.n) + (85 * coalesce(s.m, 0)) // 100 AS r
        |  FROM nds nd CROSS JOIN ntot t
        |  LEFT JOIN (SELECT e.dst AS doc_id, CAST(sum(p.r // o.outdeg) AS BIGINT) AS m
        |             FROM edg e JOIN odg o ON e.src = o.src
        |             JOIN pr2 p ON e.src = p.doc_id GROUP BY e.dst) s
        |    ON nd.doc_id = s.doc_id
        |)""".stripMargin)(
      """SELECT p.doc_id, CAST(p.r AS BIGINT) AS rank_ppb,
        |  CAST(coalesce(i.n_in, 0) AS BIGINT) AS n_in,
        |  CAST(coalesce(o.outdeg, 0) AS BIGINT) AS n_out
        |FROM pr3 p
        |LEFT JOIN idg i ON p.doc_id = i.dst
        |LEFT JOIN odg o ON p.doc_id = o.src""".stripMargin),

    // frontier schedule: per-host FIFO by (warc_ts, url), 2 fetches per tick
    "q141_frontier" -> withCtes(
      """pgu AS (
        |  SELECT 'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
        |    1700000000 + CAST(doc_id AS BIGINT) * 37 AS ts
        |  FROM documents
        |)""".stripMargin,
      """fsl AS (
        |  SELECT url, split_part(url, '/', 3) AS host,
        |    CAST(row_number() OVER (PARTITION BY split_part(url, '/', 3)
        |      ORDER BY ts, url) - 1 AS BIGINT) AS slot
        |  FROM pgu
        |)""".stripMargin)(
      "SELECT host, url, slot, CAST(slot // 2 AS BIGINT) AS tick FROM fsl"),

    // anchor-text aggregation: in-link lead-term counts per target, top-3
    // under the (n_links desc, w asc) total order — the engine's
    // WindowGroupLimit ≡ the oracle's row_number cut
    "q143_anchor_text" -> withCtes(corpus, lgNds, lgNtot, lgEdg,
      """anc AS (
        |  SELECT doc_id AS src, ws[g.i] AS w
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
        |        FROM corpus WHERE doc_id < 1000000)
        |  CROSS JOIN generate_series(1, 3) g(i)
        |  WHERE g.i <= len(ws)
        |)""".stripMargin,
      """acn AS (
        |  SELECT e.dst AS doc_id, a.w, count(*) AS n_links
        |  FROM edg e JOIN anc a ON e.src = a.src
        |  GROUP BY e.dst, a.w
        |)""".stripMargin,
      """ark AS (
        |  SELECT doc_id, w, n_links,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY n_links DESC, w) AS rnk
        |  FROM acn
        |)""".stripMargin)(
      """SELECT doc_id, w, CAST(n_links AS BIGINT) AS n_links,
        |  CAST(rnk AS INT) AS rnk
        |FROM ark WHERE rnk <= 3""".stripMargin),

    // host-graph condensation: page edges → weighted host-pair edges,
    // self-host edges dropped
    "q144_host_graph" -> withCtes(corpus, lgNds, lgNtot, lgEdg,
      """hst AS (
        |  SELECT CAST(doc_id AS BIGINT) AS pid,
        |    source || '.example.com' AS host
        |  FROM documents
        |)""".stripMargin)(
      """SELECT sh.host AS src_host, dh.host AS dst_host,
        |  CAST(count(*) AS BIGINT) AS n_links,
        |  CAST(count(DISTINCT e.src) AS BIGINT) AS n_src_pages
        |FROM edg e
        |JOIN hst sh ON e.src = sh.pid
        |JOIN hst dh ON e.dst = dh.pid
        |WHERE sh.host <> dh.host
        |GROUP BY sh.host, dh.host""".stripMargin),

    // refetch content-drift: closed-form per-fetch change flags (v(f) vs
    // v(f-1), both pure functions of (pid, f)), rolled up to host grain
    "q145_content_drift" -> withCtes(
      """ftc AS (
        |  SELECT CAST(doc_id AS BIGINT) AS pid,
        |    source || '.example.com' AS host, g.f AS f
        |  FROM documents CROSS JOIN generate_series(0, 2) g(f)
        |  WHERE g.f <= doc_id % 3
        |)""".stripMargin,
      """chg AS (
        |  SELECT pid, host,
        |    CASE WHEN f = 0 THEN 0
        |         WHEN ((pid // (f + 1)) % 3) <> ((pid // f) % 3) THEN 1
        |         ELSE 0 END AS changed
        |  FROM ftc
        |)""".stripMargin,
      """pdu AS (
        |  SELECT pid, host, count(*) - 1 AS n_refetches,
        |    sum(changed) AS n_changed
        |  FROM chg GROUP BY pid, host
        |)""".stripMargin,
      """hdr AS (
        |  SELECT host, CAST(count(*) AS BIGINT) AS n_urls,
        |    CAST(sum(n_refetches) AS BIGINT) AS n_refetches,
        |    CAST(sum(n_changed) AS BIGINT) AS n_changed
        |  FROM pdu GROUP BY host
        |)""".stripMargin)(
      """SELECT host, n_urls, n_refetches, n_changed,
        |  CAST(CASE WHEN n_refetches = 0 THEN 0
        |       ELSE (n_changed * 1000000) // n_refetches END AS BIGINT) AS drift_ppm,
        |  CASE WHEN n_refetches > 0 AND (n_changed * 1000000) // n_refetches >= 500000 THEN 'volatile'
        |       WHEN n_refetches > 0 AND n_changed > 0 THEN 'drifting'
        |       ELSE 'static' END AS bucket
        |FROM hdr""".stripMargin),

    // host boilerplate: paragraph present on ≥50 % of a host's pages (host
    // ≥2 pages) dropped host-wide; banner fixture = 12 'b-<host>' words
    // prepended (occupies exactly one paragraph window)
    "q146_host_boilerplate" -> withCtes(
      """pgb AS (
        |  SELECT CAST(doc_id AS BIGINT) AS pid,
        |    source || '.example.com' AS host,
        |    repeat('b-' || source || '.example.com' || ' ', 12) || text AS text
        |  FROM documents
        |)""".stripMargin,
      """bpr AS (
        |  SELECT pid, host, CAST((g.i - 1) // 12 AS INT) AS para_id,
        |    string_agg(ws[g.i], ' ' ORDER BY g.i) AS para
        |  FROM (SELECT pid, host, string_split(text, ' ') AS ws FROM pgb)
        |  CROSS JOIN generate_series(1, 160) g(i)
        |  WHERE g.i <= len(ws)
        |  GROUP BY pid, host, CAST((g.i - 1) // 12 AS INT)
        |)""".stripMargin,
      """bph AS (
        |  SELECT pid, host, para_id, para,
        |    CAST('0x' || substring(md5(para), 1, 15) AS BIGINT) AS h
        |  FROM bpr
        |)""".stripMargin,
      "bhp AS (SELECT host, count(*) AS h_pages FROM pgb GROUP BY host)",
      """bfl AS (
        |  SELECT f.host, f.h, 1 AS boiler
        |  FROM (SELECT host, h, count(DISTINCT pid) AS n_with
        |        FROM bph GROUP BY host, h) f
        |  JOIN bhp ON f.host = bhp.host
        |  WHERE f.n_with * 100 >= bhp.h_pages * 50 AND bhp.h_pages >= 2
        |)""".stripMargin)(
      """SELECT p.pid, p.host, CAST(count(*) AS BIGINT) AS n_paras,
        |  CAST(sum(coalesce(b.boiler, 0)) AS BIGINT) AS n_boiler,
        |  CASE WHEN count(*) > sum(coalesce(b.boiler, 0))
        |       THEN string_agg(p.para, ' | ' ORDER BY p.para_id)
        |            FILTER (WHERE b.boiler IS NULL)
        |       ELSE NULL END AS clean_text
        |FROM bph p LEFT JOIN bfl b ON p.host = b.host AND p.h = b.h
        |GROUP BY p.pid, p.host""".stripMargin),

    // mirror hosts: host pairs sharing ≥3 byte-identical docs (hash fan-out
    // capped at 16 hosts before pairing); fixture mirrors every 3rd page
    // onto host m-<host>
    "q147_mirror_hosts" -> withCtes(mirPgm,
      """mhh AS (
        |  SELECT DISTINCT split_part(url, '/', 3) AS host,
        |    CAST('0x' || substring(md5(text), 1, 15) AS BIGINT) AS hb
        |  FROM pgm
        |)""".stripMargin,
      "msz AS (SELECT host, count(*) AS n_docs FROM mhh GROUP BY host)",
      """mel AS (SELECT hb FROM mhh GROUP BY hb
        |  HAVING count(*) >= 2 AND count(*) <= 16)""".stripMargin,
      "meh AS (SELECT mhh.host, mhh.hb FROM mhh JOIN mel ON mhh.hb = mel.hb)",
      """mpr AS (
        |  SELECT a.host AS host_a, b.host AS host_b, count(*) AS n_shared
        |  FROM meh a JOIN meh b ON a.hb = b.hb AND a.host < b.host
        |  GROUP BY a.host, b.host
        |  HAVING count(*) >= 3
        |)""".stripMargin)(
      """SELECT p.host_a, p.host_b, CAST(p.n_shared AS BIGINT) AS n_shared,
        |  CAST(p.n_shared * 1000000 // least(sa.n_docs, sb.n_docs) AS BIGINT)
        |    AS overlap_ppm
        |FROM mpr p
        |JOIN msz sa ON p.host_a = sa.host
        |JOIN msz sb ON p.host_b = sb.host""".stripMargin),

    // HITS, 2 unrolled mutual-reinforcement rounds: integer ppm grid,
    // max-normalized (floor division), hubs seeded at 10^6
    "q148_hits" -> withCtes(corpus, lgNds, lgNtot, lgEdg,
      """a1r AS (SELECT dst AS doc_id, CAST(sum(1000000) AS BIGINT) AS raw
        |  FROM edg GROUP BY dst)""".stripMargin,
      "a1m AS (SELECT max(raw) AS mx FROM a1r)",
      """a1 AS (SELECT nd.doc_id, coalesce(r.raw, 0) * 1000000 // m.mx AS s
        |  FROM nds nd CROSS JOIN a1m m LEFT JOIN a1r r ON nd.doc_id = r.doc_id)""".stripMargin,
      """h1r AS (SELECT e.src AS doc_id, CAST(sum(a.s) AS BIGINT) AS raw
        |  FROM edg e JOIN a1 a ON e.dst = a.doc_id GROUP BY e.src)""".stripMargin,
      "h1m AS (SELECT max(raw) AS mx FROM h1r)",
      """h1 AS (SELECT nd.doc_id, coalesce(r.raw, 0) * 1000000 // m.mx AS s
        |  FROM nds nd CROSS JOIN h1m m LEFT JOIN h1r r ON nd.doc_id = r.doc_id)""".stripMargin,
      """a2r AS (SELECT e.dst AS doc_id, CAST(sum(h.s) AS BIGINT) AS raw
        |  FROM edg e JOIN h1 h ON e.src = h.doc_id GROUP BY e.dst)""".stripMargin,
      "a2m AS (SELECT max(raw) AS mx FROM a2r)",
      """a2 AS (SELECT nd.doc_id, coalesce(r.raw, 0) * 1000000 // m.mx AS s
        |  FROM nds nd CROSS JOIN a2m m LEFT JOIN a2r r ON nd.doc_id = r.doc_id)""".stripMargin,
      """h2r AS (SELECT e.src AS doc_id, CAST(sum(a.s) AS BIGINT) AS raw
        |  FROM edg e JOIN a2 a ON e.dst = a.doc_id GROUP BY e.src)""".stripMargin,
      "h2m AS (SELECT max(raw) AS mx FROM h2r)",
      """h2 AS (SELECT nd.doc_id, coalesce(r.raw, 0) * 1000000 // m.mx AS s
        |  FROM nds nd CROSS JOIN h2m m LEFT JOIN h2r r ON nd.doc_id = r.doc_id)""".stripMargin)(
      """SELECT a2.doc_id, CAST(a2.s AS BIGINT) AS auth_ppm,
        |  CAST(h2.s AS BIGINT) AS hub_ppm
        |FROM a2 JOIN h2 ON a2.doc_id = h2.doc_id""".stripMargin),

    // host reputation: dup-content ppm + hashed-classifier score at host
    // grain → mirror-block / low-quality / keep (mirrored fixture)
    "q149_host_reputation" -> withCtes(repCtes: _*)(
      """SELECT host, CAST(n_pages AS BIGINT) AS n_pages,
        |  CAST(n_dup_pages AS BIGINT) AS n_dup_pages,
        |  CAST(dup_ppm AS BIGINT) AS dup_ppm,
        |  CAST(score_ppk AS BIGINT) AS score_ppk, verdict
        |FROM rvd""".stripMargin),

    // DSIR importance weighting: bucketed add-one target/raw ratio on a ppb
    // grid, clamp mirrored, per-doc mean ppm + keep verdict
    "q150_importance_weights" -> withCtes(corpus,
      """iwd AS (
        |  SELECT doc_id, lang, ws[g.i] AS w
        |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM corpus)
        |  CROSS JOIN generate_series(1, 128) g(i)
        |  WHERE g.i <= len(ws)
        |)""".stripMargin,
      """ibk AS (
        |  SELECT doc_id,
        |    CAST('0x' || substring(md5(w), 1, 15) AS BIGINT) % 4096 AS bucket,
        |    lang
        |  FROM iwd
        |)""".stripMargin,
      """ict AS (
        |  SELECT bucket, count(*) AS c_r,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_t
        |  FROM ibk GROUP BY bucket
        |)""".stripMargin,
      "itt AS (SELECT sum(c_r) AS tot_r, sum(c_t) AS tot_t FROM ict)",
      """irt AS (
        |  SELECT bucket,
        |    (c_t + 1) * 1000000000 // (tot_t + 4096) AS pt_ppb,
        |    (c_r + 1) * 1000000000 // (tot_r + 4096) AS pr_ppb
        |  FROM ict CROSS JOIN itt
        |)""".stripMargin,
      """ir2 AS (SELECT bucket,
        |  pt_ppb * 1000000 // greatest(pr_ppb, 1) AS r_ppm FROM irt)""".stripMargin)(
      """SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(r.r_ppm) // count(*) AS BIGINT) AS score_ppm,
        |  CAST(CASE WHEN sum(r.r_ppm) // count(*) >= 1000000
        |       THEN 1 ELSE 0 END AS INT) AS keep
        |FROM ibk b JOIN ir2 r ON b.bucket = r.bucket
        |GROUP BY b.doc_id""".stripMargin),

    // source-pair shingle overlap: distinct (source, 60-bit shingle hash),
    // pair join on the hash, exact-ppm set Jaccard
    "q151_source_overlap" -> withCtes(
      """ssh AS (
        |  SELECT DISTINCT source,
        |    CAST('0x' || substring(md5(substring(text, g.i, 8)), 1, 15) AS BIGINT) AS hb
        |  FROM documents CROSS JOIN generate_series(1, 505) g(i)
        |  WHERE length(text) >= 8 AND g.i <= least(length(text), 512) - 7
        |)""".stripMargin,
      "ssz AS (SELECT source, count(*) AS sz FROM ssh GROUP BY source)",
      """spr AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    count(*) AS n_shared
        |  FROM ssh a JOIN ssh b ON a.hb = b.hb AND a.source < b.source
        |  GROUP BY a.source, b.source
        |)""".stripMargin)(
      """SELECT p.source_a, p.source_b, CAST(p.n_shared AS BIGINT) AS n_shared,
        |  CAST(sa.sz AS BIGINT) AS sz_a, CAST(sb.sz AS BIGINT) AS sz_b,
        |  CAST(p.n_shared * 1000000 // (sa.sz + sb.sz - p.n_shared) AS BIGINT)
        |    AS jaccard_ppm
        |FROM spr p
        |JOIN ssz sa ON p.source_a = sa.source
        |JOIN ssz sb ON p.source_b = sb.source""".stripMargin),

    // asymmetric containment over the LSH candidate pairs: floor-ppm
    // |A∩B|/|A| and /|B| + the keep-the-superset relation verdict
    "q152_containment" -> withCtes(corpus, sh, mh, bnd, prs,
      dsh, shSz, shInter)(
      """SELECT p.doc_a, p.doc_b,
        |  CAST(coalesce(i.i, 0) AS BIGINT) AS n_shared,
        |  CAST(sa.sz AS BIGINT) AS sz_a, CAST(sb.sz AS BIGINT) AS sz_b,
        |  CAST(coalesce(i.i, 0) * 1000000 // sa.sz AS BIGINT) AS cont_a_ppm,
        |  CAST(coalesce(i.i, 0) * 1000000 // sb.sz AS BIGINT) AS cont_b_ppm,
        |  CASE WHEN coalesce(i.i, 0) * 1000000 // sa.sz >= 900000
        |         AND coalesce(i.i, 0) * 1000000 // sb.sz >= 900000
        |         THEN 'near-equal'
        |       WHEN coalesce(i.i, 0) * 1000000 // sa.sz >= 900000
        |         THEN 'a-in-b'
        |       WHEN coalesce(i.i, 0) * 1000000 // sb.sz >= 900000
        |         THEN 'b-in-a'
        |       ELSE 'partial' END AS relation
        |FROM prs p
        |LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
        |JOIN sz sa ON sa.doc_id = p.doc_a
        |JOIN sz sb ON sb.doc_id = p.doc_b""".stripMargin),

    // link farms: reciprocal host pairs at/above mean mutual weight,
    // closed into components (recursive reachability, min host label)
    "q153_link_farms" -> withRecursiveCtes(corpus, lgNds, lgNtot, lgEdg,
      """hst AS (
        |  SELECT CAST(doc_id AS BIGINT) AS pid,
        |    source || '.example.com' AS host
        |  FROM documents
        |)""".stripMargin,
      """hge AS (
        |  SELECT sh.host AS src_host, dh.host AS dst_host, count(*) AS n_links
        |  FROM edg e
        |  JOIN hst sh ON e.src = sh.pid
        |  JOIN hst dh ON e.dst = dh.pid
        |  WHERE sh.host <> dh.host
        |  GROUP BY sh.host, dh.host
        |)""".stripMargin,
      """rcp AS (
        |  SELECT a.src_host AS host_a, a.dst_host AS host_b,
        |    least(a.n_links, b.n_links) AS mutual
        |  FROM hge a JOIN hge b
        |    ON a.src_host = b.dst_host AND a.dst_host = b.src_host
        |  WHERE a.src_host < a.dst_host
        |)""".stripMargin,
      "rct AS (SELECT sum(mutual) AS s, count(*) AS c FROM rcp)",
      """rst AS (SELECT host_a, host_b FROM rcp CROSS JOIN rct
        |  WHERE mutual * c >= s)""".stripMargin,
      """und AS (
        |  SELECT host_a AS a, host_b AS b FROM rst
        |  UNION ALL
        |  SELECT host_b AS a, host_a AS b FROM rst
        |)""".stripMargin,
      "hns AS (SELECT DISTINCT a AS host FROM und)",
      """reach AS (
        |  SELECT host AS node, host AS r FROM hns
        |  UNION
        |  SELECT u.b AS node, reach.r AS r FROM reach JOIN und u ON u.a = reach.node
        |)""".stripMargin,
      "cmp AS (SELECT node AS host, min(r) AS farm_host FROM reach GROUP BY node)",
      "dg AS (SELECT a AS host, count(*) AS n_partners FROM und GROUP BY a)",
      "fs AS (SELECT farm_host, count(*) AS farm_size FROM cmp GROUP BY farm_host)")(
      """SELECT c.host, c.farm_host,
        |  CAST(f.farm_size AS BIGINT) AS farm_size,
        |  CAST(d.n_partners AS BIGINT) AS n_partners
        |FROM cmp c
        |JOIN fs f ON c.farm_host = f.farm_host
        |JOIN dg d ON c.host = d.host""".stripMargin),

    // robots longest-prefix match: per-host rule table, winner by
    // (len desc, allow desc, prefix desc) ≡ the engine's max(struct)
    "q154_robots_filter" -> withCtes(
      """rpg AS (
        |  SELECT 'https://' || source || '.example.com/doc/'
        |      || CAST(doc_id AS VARCHAR) AS url,
        |    source || '.example.com' AS host,
        |    '/doc/' || CAST(doc_id AS VARCHAR) AS path
        |  FROM documents
        |)""".stripMargin,
      "rhx AS (SELECT DISTINCT source || '.example.com' AS host FROM documents)",
      """rrl AS (
        |  SELECT host, '/doc/' AS prefix, 0 AS allow FROM rhx
        |  UNION ALL
        |  SELECT host, '/doc/1' AS prefix, 1 AS allow FROM rhx
        |  UNION ALL
        |  SELECT host,
        |    '/doc/' || CAST(CAST('0x' || substring(md5(host), 1, 15) AS BIGINT) % 10 AS VARCHAR) AS prefix,
        |    0 AS allow
        |  FROM rhx
        |)""".stripMargin,
      """rmt AS (
        |  SELECT p.url, p.host, r.prefix, r.allow
        |  FROM rpg p JOIN rrl r
        |    ON p.host = r.host AND starts_with(p.path, r.prefix)
        |)""".stripMargin,
      """rwn AS (
        |  SELECT url, host, prefix, allow, length(prefix) AS len,
        |    row_number() OVER (PARTITION BY url
        |      ORDER BY length(prefix) DESC, allow DESC, prefix DESC) AS rn
        |  FROM rmt
        |)""".stripMargin)(
      """SELECT url, host, CAST(len AS INT) AS rule_len,
        |  CAST(allow AS INT) AS allowed, prefix AS rule_prefix
        |FROM rwn WHERE rn = 1""".stripMargin),

    // crawl budget: reputation chain ∘ drift chain, verdict-gated
    // drift-scaled fetch budget
    "q155_crawl_budget" -> withCtes((repCtes ++ driftCtes): _*)(
      """SELECT v.host, CAST(v.n_pages AS BIGINT) AS n_pages, v.verdict,
        |  coalesce(b.bucket, 'static') AS bucket,
        |  CAST(v.n_pages * (CASE WHEN v.verdict <> 'keep' THEN 0
        |       WHEN coalesce(b.bucket, 'static') = 'volatile' THEN 4
        |       WHEN coalesce(b.bucket, 'static') = 'drifting' THEN 2
        |       ELSE 1 END) AS BIGINT) AS budget_fetches
        |FROM rvd v LEFT JOIN bkt b ON v.host = b.host""".stripMargin),

    // gate agreement: q19 heuristic keep vs q138 classifier keep per lang;
    // kappa with the sign factored out of the division (div vs // parity)
    "q156_gate_agreement" -> withCtes(corpus, wrd,
      """gqh AS (
        |  SELECT doc_id,
        |    CASE WHEN nt >= 16 AND CAST(al AS DOUBLE) / CAST(nt AS DOUBLE) >= 2.0
        |              AND CAST(al AS DOUBLE) / CAST(nt AS DOUBLE) <= 12.0
        |         THEN 1 ELSE 0 END AS keep_h
        |  FROM (SELECT doc_id,
        |          CAST(length(text) - length(replace(text, ' ', '')) AS INT) + 1 AS nt,
        |          length(replace(text, ' ', '')) AS al
        |        FROM corpus)
        |)""".stripMargin,
      """gqw AS (
        |  SELECT doc_id,
        |    ((CAST('0x' || substring(md5(w), 1, 15) AS BIGINT) % 4096)
        |      * 2654435761) % 2003 - 1001 AS weight
        |  FROM wrd
        |)""".stripMargin,
      """gqc AS (
        |  SELECT doc_id,
        |    CASE WHEN ((sum(weight) + 1001 * count(*)) * 1000) // count(*)
        |              >= 1001000 THEN 1 ELSE 0 END AS keep_c
        |  FROM gqw GROUP BY doc_id
        |)""".stripMargin,
      """gtb AS (
        |  SELECT c.lang, count(*) AS n,
        |    sum(CASE WHEN keep_h = 1 AND keep_c = 1 THEN 1 ELSE 0 END) AS n11,
        |    sum(CASE WHEN keep_h = 1 AND keep_c = 0 THEN 1 ELSE 0 END) AS n10,
        |    sum(CASE WHEN keep_h = 0 AND keep_c = 1 THEN 1 ELSE 0 END) AS n01,
        |    sum(CASE WHEN keep_h = 0 AND keep_c = 0 THEN 1 ELSE 0 END) AS n00
        |  FROM corpus c
        |  JOIN gqh h ON c.doc_id = h.doc_id
        |  JOIN gqc q ON c.doc_id = q.doc_id
        |  GROUP BY c.lang
        |)""".stripMargin)(
      """SELECT lang, CAST(n AS BIGINT) AS n,
        |  CAST(n11 AS BIGINT) AS n11, CAST(n10 AS BIGINT) AS n10,
        |  CAST(n01 AS BIGINT) AS n01, CAST(n00 AS BIGINT) AS n00,
        |  CAST((n11 + n00) * 1000000 // n AS BIGINT) AS po_ppm,
        |  CAST(((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) * 1000000
        |       // (n * n) AS BIGINT) AS pe_ppm,
        |  CAST(CASE WHEN (n * n - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))) = 0
        |         THEN 0
        |       WHEN ((n11 + n00) * n - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))) < 0
        |         THEN -((-((n11 + n00) * n - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))) * 1000000
        |               // (n * n - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))))
        |       ELSE ((n11 + n00) * n - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))) * 1000000
        |            // (n * n - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))
        |       END AS BIGINT) AS kappa_ppm
        |FROM gtb""".stripMargin),

    // canonical pick: q118's component chain ∘ q138's classifier chain;
    // winner per component = (score desc, doc_id asc) — the engine's
    // min(struct) ≡ the oracle's row_number = 1
    "q142_canonical_pick" -> withRecursiveCtes(corpus, sh, mh, bnd, prs,
      dsh, shSz, shInter, jacCte, wrd,
      """epr AS (
        |  SELECT g.doc_a, c.doc_id AS doc_b
        |  FROM corpus c JOIN (SELECT md5(text) AS h, min(doc_id) AS doc_a, count(*) AS n
        |                      FROM corpus GROUP BY md5(text) HAVING count(*) > 1) g
        |    ON md5(c.text) = g.h
        |  WHERE c.doc_id <> g.doc_a
        |)""".stripMargin,
      """edg AS (
        |  SELECT DISTINCT doc_a, doc_b FROM (
        |    SELECT doc_a, doc_b FROM epr
        |    UNION ALL
        |    SELECT doc_a, doc_b FROM jac WHERE jaccard >= CAST(0.9 AS DOUBLE))
        |)""".stripMargin,
      """und AS (
        |  SELECT doc_a AS a, doc_b AS b FROM edg
        |  UNION ALL
        |  SELECT doc_b AS a, doc_a AS b FROM edg
        |)""".stripMargin,
      "nds AS (SELECT DISTINCT a AS doc_id FROM und)",
      """reach AS (
        |  SELECT doc_id AS node, doc_id AS r FROM nds
        |  UNION
        |  SELECT u.b AS node, reach.r AS r FROM reach JOIN und u ON u.a = reach.node
        |)""".stripMargin,
      "cmp AS (SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node)",
      """wgt AS (
        |  SELECT doc_id,
        |    ((CAST('0x' || substring(md5(w), 1, 15) AS BIGINT) % 4096)
        |      * 2654435761) % 2003 - 1001 AS weight
        |  FROM wrd
        |)""".stripMargin,
      """scr AS (
        |  SELECT doc_id,
        |    CAST(((sum(weight) + 1001 * count(*)) * 1000) // count(*) AS BIGINT) AS score
        |  FROM wgt GROUP BY doc_id
        |)""".stripMargin,
      """mcs AS (
        |  SELECT c.doc_id, c.component, s.score,
        |    row_number() OVER (PARTITION BY c.component
        |      ORDER BY s.score DESC, c.doc_id) AS rn
        |  FROM cmp c JOIN scr s ON c.doc_id = s.doc_id
        |)""".stripMargin)(
      """SELECT doc_id, component, score,
        |  CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS INT) AS keep
        |FROM mcs""".stripMargin),

    "q93_dup_clusters" -> withCtes(corpus,
      """cl93 AS (
        |  SELECT md5(text) AS h, count(*) AS cluster_size FROM corpus GROUP BY md5(text)
        |)""".stripMargin)(
      """SELECT cluster_size, count(*) AS n_clusters,
        |  cluster_size * count(*) AS n_docs,
        |  (cluster_size - 1) * count(*) AS n_removed
        |FROM cl93 GROUP BY cluster_size""".stripMargin),

    "q88_rating_trace" -> withRecursiveCtes(net, closure, arboAgg, chosenCte, lpCte,
      """tr AS (
        |  SELECT n.hydroid, l.branch, (n.hydroid // 144) % 8 AS lr, n.length_km,
        |    CASE WHEN n.hydroid % 97 = 0 THEN 1 ELSE 0 END AS lake
        |  FROM net n JOIN lp l ON n.hydroid = l.hydroid
        |)""".stripMargin,
      """trw AS (
        |  SELECT *,
        |    sum(length_km) OVER (PARTITION BY branch ORDER BY lr DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumdown,
        |    min(CASE WHEN lake = 1 THEN lr END) OVER (PARTITION BY branch ORDER BY lr DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS minlakeup,
        |    sum(length_km) OVER (PARTITION BY branch ORDER BY lr ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumup,
        |    max(CASE WHEN lake = 1 THEN lr END) OVER (PARTITION BY branch ORDER BY lr ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS maxlakedown,
        |    lead(length_km) OVER (PARTITION BY branch ORDER BY lr ASC) AS len_next
        |  FROM tr
        |)""".stripMargin,
      """trw2 AS (
        |  SELECT *, lead(maxlakedown) OVER (PARTITION BY branch ORDER BY lr ASC) AS maxlakenext
        |  FROM trw
        |)""".stripMargin,
      """gg AS (
        |  SELECT hydroid AS gage_id, branch, lr AS lr_g, cumdown AS cumdown_g,
        |         cumup AS cumup_g, length_km AS len_g
        |  FROM trw2 WHERE hydroid % 199 = 0
        |)""".stripMargin,
      """cand AS (
        |  SELECT r.hydroid, g.gage_id, r.cumdown - g.cumdown_g + g.len_g AS dist_km, 1 AS dir_down
        |  FROM trw2 r JOIN gg g ON r.branch = g.branch
        |  WHERE r.lr <= g.lr_g AND r.cumdown - g.cumdown_g + g.len_g < CAST(8.0 AS DOUBLE)
        |    AND (r.minlakeup IS NULL OR r.minlakeup > g.lr_g)
        |  UNION ALL
        |  SELECT r.hydroid, g.gage_id, r.cumup - g.cumup_g + r.len_next AS dist_km, 0 AS dir_down
        |  FROM trw2 r JOIN gg g ON r.branch = g.branch
        |  WHERE r.lr >= g.lr_g + 1 AND r.len_next IS NOT NULL
        |    AND r.cumup - g.cumup_g + r.len_next < CAST(8.0 AS DOUBLE)
        |    AND (r.maxlakenext IS NULL OR r.maxlakenext <= g.lr_g)
        |)""".stripMargin)(
      """SELECT hydroid, gage_id, dist_km, dir_down,
        |  ((gage_id * 31 + 7) % 11 - 5) * CAST(0.05 AS DOUBLE) + CAST(1.0 AS DOUBLE) AS calb_coef_usgs
        |FROM (SELECT *, row_number() OVER (PARTITION BY hydroid ORDER BY dist_km, gage_id) AS rn
        |      FROM cand)
        |WHERE rn = 1""".stripMargin),

    "q89_version_regression" -> {
      def d(c: String) = s"CAST($c AS DOUBLE)"
      val row = "((cell // 268435456) % 268435456)"
      val colc = "(cell % 268435456)"
      def agrSql(k: Int, w: Int, t: String): String =
        s"""CASE WHEN ($row * 29 + $colc * 13) % 50 = 0 THEN 4
           |     ELSE (CASE WHEN depth_max > $t THEN 1 ELSE 0 END) * 2
           |          + CASE WHEN ($row * 31 + $colc * 17 + $k) % 10 < $w THEN 1 ELSE 0 END
           |END""".stripMargin
      def tSql(t: Double): String = s"CAST($t AS DOUBLE)"
      val versions = Seq(("new", 0.0), ("prev", 0.25))
      val counts = versions.flatMap { case (v, dlt) =>
        graft.ops.Agreement.MasterCombos.flatMap { case (src, mag, k, w, t) =>
          (0 to 4).map(c =>
            s"count(CASE WHEN ${agrSql(k, w, tSql(t + dlt))} = $c THEN 1 END) AS c${c}_${src}_${mag}_$v")
        }
      }.mkString(",\n    ")
      // metric formula per stat from count column names (q56's family)
      def m(stat: String, tn: String, fn: String, fp: String, tp: String): String = stat match {
        case "csi" => s"${d(tp)} / (${d(tp)} + ${d(fp)} + ${d(fn)})"
        case "tpr" => s"${d(tp)} / (${d(tp)} + ${d(fn)})"
        case "far" => s"${d(fp)} / (${d(tp)} + ${d(fp)})"
        case "mcc" => s"(${d(tp)} * ${d(tn)} - ${d(fp)} * ${d(fn)}) / sqrt((${d(tp)} + ${d(fp)}) * (${d(tp)} + ${d(fn)}) * (${d(tn)} + ${d(fp)}) * (${d(tn)} + ${d(fn)}))"
        case "acc" => s"(${d(tp)} + ${d(tn)}) / (${d(tp)} + ${d(tn)} + ${d(fp)} + ${d(fn)})"
        case "f1"  => s"${d(tp)} * 2 / (${d(tp)} * 2 + ${d(fp)} + ${d(fn)})"
        case "bias" => s"(${d(tp)} + ${d(fp)}) / (${d(tp)} + ${d(fn)})"
      }
      val unions = graft.ops.Agreement.MasterCombos.flatMap { case (src, mag, _, _, _) =>
        def c(i: Int, v: String) = s"c${i}_${src}_${mag}_$v"
        graft.ops.Agreement.MetricOrientation.map { case (stat, orient) =>
          val vN = m(stat, c(0, "new"), c(1, "new"), c(2, "new"), c(3, "new"))
          val vP = m(stat, c(0, "prev"), c(1, "prev"), c(2, "prev"), c(3, "prev"))
          val verdict = orient match {
            case 1  => s"CASE WHEN ($vN) - ($vP) < 0 THEN 1 ELSE 0 END"
            case -1 => s"CASE WHEN ($vN) - ($vP) > 0 THEN 1 ELSE 0 END"
            case 0  => s"CASE WHEN abs(($vN) - CAST(1.0 AS DOUBLE)) > abs(($vP) - CAST(1.0 AS DOUBLE)) THEN 1 ELSE 0 END"
          }
          s"""SELECT '$src' AS benchmark_source, '$mag' AS magnitude, '$stat' AS stat,
             |  $vN AS value, $vP AS value_prev, ($vN) - ($vP) AS diff,
             |  $verdict AS regressed
             |FROM c89""".stripMargin
        }
      }.mkString("\nUNION ALL\n")
      withCtes(pts, asg, ht, fc, stg, til, mos,
        s"c89 AS (\n  SELECT $counts\n  FROM mos\n)")(unions)
    },

    "q92_manual_calb" -> withCtes(
      """ht92 AS (
        |  SELECT hydroid, 1000000 + hydroid AS feature_id, i, stage,
        |    (hydroid % 7 + 1) * stage
        |      + ((hydroid % 5) * CAST(0.5 AS DOUBLE) + CAST(0.5 AS DOUBLE)) * stage * stage AS postcalb_discharge_cms
        |  FROM (SELECT h.hydroid, s.i, s.i * CAST(0.3048 AS DOUBLE) AS stage
        |        FROM (SELECT a.x * 144 + b.x AS hydroid
        |              FROM generate_series(0, 143) a(x), generate_series(0, 143) b(x)) h,
        |             generate_series(0, 83) s(i))
        |  WHERE i % 7 = 0
        |)""".stripMargin,
      """man AS (
        |  SELECT 1000000 + x AS feature_id,
        |    ((1000000 + x) % 9 + 2) / CAST(4.0 AS DOUBLE) AS calb_coef_manual
        |  FROM generate_series(0, 20735) t(x)
        |  WHERE (1000000 + x) % 37 = 0
        |)""".stripMargin)(
      """SELECT h.hydroid, h.feature_id, CAST(h.i AS BIGINT) AS i, h.stage,
        |  h.postcalb_discharge_cms, m.calb_coef_manual,
        |  CASE WHEN m.calb_coef_manual IS NULL THEN h.postcalb_discharge_cms
        |       ELSE h.postcalb_discharge_cms / m.calb_coef_manual END AS discharge_cms,
        |  CASE WHEN m.calb_coef_manual IS NOT NULL THEN 1 ELSE 0 END AS calb_applied
        |FROM ht92 h LEFT JOIN man m ON h.feature_id = m.feature_id""".stripMargin),

    "q95_alpha_by_hydroid" -> withCtes(alphaCountCtes: _*)(
      contingencyMetricSql("hydroid, huc8, bench, mag",
        "c95 WHERE tn + fn + fp + tp > 0")),

    "q106_aggregate_metrics" -> withCtes((alphaCountCtes :+
      """c106 AS (
        |  SELECT bench, mag, CAST(sum(tn) AS BIGINT) AS tn,
        |    CAST(sum(fn) AS BIGINT) AS fn, CAST(sum(fp) AS BIGINT) AS fp,
        |    CAST(sum(tp) AS BIGINT) AS tp, CAST(sum(masked) AS BIGINT) AS masked,
        |    count(*) AS n_cases
        |  FROM c95 WHERE tn + fn + fp + tp > 0 GROUP BY bench, mag
        |)""".stripMargin): _*)(
      contingencyMetricSql("bench, mag, n_cases", "c106")),

    "q96_crosswalk_eval" -> withCtes(net,
      """xwk AS (
        |  SELECT hydroid, huc8, to_node,
        |    CASE WHEN hydroid % 11 = 3 AND to_node >= 0 THEN to_node
        |         ELSE hydroid END + 1000000 AS xw_fid
        |  FROM net
        |)""".stripMargin,
      "upa AS (SELECT to_node AS hydroid, hydroid AS up_id FROM net WHERE to_node >= 0)",
      """ixn AS (
        |  SELECT huc8, hydroid, xw_fid, hydroid + 1000000 AS cand_fid, 2 AS ipts FROM xwk
        |  UNION ALL
        |  SELECT huc8, hydroid, xw_fid, to_node + 1000000 AS cand_fid, 1 AS ipts
        |  FROM xwk WHERE to_node >= 0
        |  UNION ALL
        |  SELECT x.huc8, x.hydroid, x.xw_fid, u.up_id + 1000000 AS cand_fid, 1 AS ipts
        |  FROM xwk x JOIN upa u ON u.hydroid = x.hydroid
        |)""".stripMargin,
      """mm1 AS (
        |  SELECT huc8,
        |    count(CASE WHEN (cand_fid = xw_fid) = (ipts = 2) THEN 1 END) AS correct,
        |    count(*) AS total
        |  FROM ixn GROUP BY huc8
        |)""".stripMargin,
      """ufl AS (
        |  SELECT x.hydroid, list_sort(list(DISTINCT x2.xw_fid)) AS upstream_fids
        |  FROM xwk x JOIN upa u ON u.hydroid = x.hydroid
        |             JOIN xwk x2 ON x2.hydroid = u.up_id
        |  GROUP BY x.hydroid
        |)""".stripMargin,
      """nfl AS (
        |  SELECT hydroid + 1000000 AS fid,
        |    list_sort(list(DISTINCT up_id + 1000000)) AS nwm_fids
        |  FROM upa GROUP BY hydroid
        |)""".stripMargin,
      """stt AS (
        |  SELECT x.huc8,
        |    CASE WHEN uf.upstream_fids IS NULL THEN 3
        |         WHEN list_contains(uf.upstream_fids, x.xw_fid) THEN -1
        |         WHEN uf.upstream_fids = COALESCE(nf.nwm_fids, CAST([] AS BIGINT[])) THEN 0
        |         ELSE 1 END AS status
        |  FROM xwk x LEFT JOIN ufl uf ON uf.hydroid = x.hydroid
        |             LEFT JOIN nfl nf ON nf.fid = x.xw_fid
        |)""".stripMargin,
      """mm2 AS (
        |  SELECT huc8, count(CASE WHEN status = 0 THEN 1 END) AS correct,
        |    count(*) AS total
        |  FROM stt WHERE status >= 0 GROUP BY huc8
        |)""".stripMargin)(
      """SELECT huc8, 'intersections' AS method, correct, total,
        |  CAST(correct AS DOUBLE) / CAST(total AS DOUBLE) AS proportion FROM mm1
        |UNION ALL
        |SELECT huc8, 'network' AS method, correct, total,
        |  CAST(correct AS DOUBLE) / CAST(total AS DOUBLE) AS proportion FROM mm2""".stripMargin),

    "q97_ras2fim_rating" -> withCtes(
      """c97 AS (
        |  SELECT hydroid, stage,
        |    (hydroid % 9 + 2) * stage
        |      + ((hydroid % 4) * CAST(0.3 AS DOUBLE) + CAST(0.4 AS DOUBLE)) * stage * stage AS q_ras,
        |    stage - CAST(0.25 AS DOUBLE) AS hand
        |  FROM (SELECT h.hydroid, s.i * CAST(0.3048 AS DOUBLE) AS stage
        |        FROM (SELECT a.x * 144 + b.x AS hydroid
        |              FROM generate_series(0, 143) a(x), generate_series(0, 143) b(x)) h,
        |             generate_series(0, 83) s(i))
        |  WHERE hydroid % 31 = 5 AND hydroid % 97 <> 0
        |)""".stripMargin,
      """r97 AS (
        |  SELECT hydroid,
        |    ['2_0_year','5_0_year','10_0_year','25_0_year','50_0_year'][k.k + 1] AS nwm_recur,
        |    (((hydroid * 37 + 19) % 3000) / 10.0 + CAST(10.0 AS DOUBLE))
        |      * (CAST(1.0 AS DOUBLE) + k.k * CAST(0.8 AS DOUBLE)) AS nwm_recur_flow_cms
        |  FROM (SELECT a.x * 144 + b.x AS hydroid
        |        FROM generate_series(0, 143) a(x), generate_series(0, 143) b(x)),
        |       generate_series(0, 4) k(k)
        |  WHERE hydroid % 31 = 5 AND hydroid % 97 <> 0
        |)""".stripMargin,
      """j97 AS (
        |  SELECT c.hydroid, r.nwm_recur, r.nwm_recur_flow_cms, c.stage, c.hand, c.q_ras,
        |    row_number() OVER (PARTITION BY c.hydroid, r.nwm_recur
        |      ORDER BY abs(c.q_ras - r.nwm_recur_flow_cms), c.stage) AS rn
        |  FROM c97 c JOIN r97 r ON c.hydroid = r.hydroid
        |)""".stripMargin)(
      s"""SELECT 'xs_' || CAST(hydroid AS VARCHAR) AS location_id, hydroid,
         |  hydroid + 1000000 AS feature_id, $huc8FromHydroid AS huc8,
         |  nwm_recur, hand, q_ras AS discharge_cms, nwm_recur_flow_cms,
         |  abs((q_ras - nwm_recur_flow_cms) / q_ras) AS check_variance
         |FROM j97
         |WHERE rn = 1 AND hand > CAST(0.0 AS DOUBLE)
         |  AND abs((q_ras - nwm_recur_flow_cms) / q_ras) < CAST(0.1 AS DOUBLE)""".stripMargin),

    "q98_continuity" -> withCtes(
      """net98 AS (
        |  SELECT hydroid,
        |    lpad(CAST(CAST(floor(floor(hydroid / 144) / 8) * 18 + floor((hydroid % 144) / 8) AS BIGINT) AS VARCHAR), 8, '0') AS huc8,
        |    CAST(CASE WHEN (CAST(floor(hydroid / 144) AS BIGINT) % 8) = 0 THEN -1
        |         ELSE (CAST(floor(hydroid / 144) AS BIGINT) - 1) * 144 + (hydroid % 144)
        |              - (hydroid % 8) + CAST(floor((hydroid % 8) / 2) AS BIGINT)
        |    END AS BIGINT) AS to_node
        |  FROM (SELECT a.x * 144 + b.x AS hydroid
        |        FROM generate_series(0, 143) a(x), generate_series(0, 143) b(x))
        |)""".stripMargin,
      """flw AS (
        |  SELECT hydroid, huc8, to_node,
        |    CASE WHEN (hydroid + 1000000) % 5 <> 2
        |         THEN ((hydroid + 1000000) * 53 + 7) % 9000 ELSE 0 END AS qt
        |  FROM net98
        |)""".stripMargin,
      """upq AS (
        |  SELECT to_node AS hydroid, sum(qt) AS exp_tenths, count(*) AS n_up
        |  FROM flw WHERE to_node >= 0 GROUP BY to_node
        |)""".stripMargin)(
      """SELECT f.hydroid, f.huc8, u.n_up,
        |  f.qt / 10.0 AS discharge,
        |  u.exp_tenths / 10.0 AS expected_discharge,
        |  f.qt / 10.0 - u.exp_tenths / 10.0 AS diff,
        |  CASE WHEN abs(f.qt / 10.0) + abs(u.exp_tenths / 10.0) <> 0
        |       THEN CAST(100.0 AS DOUBLE) * abs(f.qt / 10.0 - u.exp_tenths / 10.0)
        |            / (abs(f.qt / 10.0) + abs(u.exp_tenths / 10.0)) END AS sape,
        |  CASE WHEN f.qt / 10.0 = 0.0 THEN 1 ELSE 0 END AS no_flow
        |FROM flw f JOIN upq u ON f.hydroid = u.hydroid
        |WHERE u.n_up > 1""".stripMargin),

    "q99_backpool" -> withCtes(pts, asg, net,
      s"""cnt99 AS (
         |  SELECT hydroid, $huc8FromHydroid AS huc8, count(*) AS n_pts
         |  FROM asg GROUP BY hydroid
         |)""".stripMargin,
      """st99 AS (
        |  SELECT huc8, count(*) AS n_cat, sum(n_pts) AS sum_n,
        |    sum(n_pts * n_pts) AS sum_sq
        |  FROM cnt99 GROUP BY huc8
        |)""".stripMargin,
      """sd99 AS (
        |  SELECT huc8,
        |    CAST(sum_n AS DOUBLE) / CAST(n_cat AS DOUBLE) AS mean_pts,
        |    CASE WHEN n_cat > 1
        |         THEN sqrt(CAST(n_cat * sum_sq - sum_n * sum_n AS DOUBLE)
        |                   / CAST(n_cat * (n_cat - 1) AS DOUBLE)) END AS std_pts
        |  FROM st99
        |)""".stripMargin,
      """ot99 AS (
        |  SELECT n.hydroid, n.huc8, n.length_km,
        |    CAST(0.001 AS DOUBLE) + (n.hydroid % 11) * CAST(0.0005 AS DOUBLE) AS slope,
        |    c.n_pts, s.mean_pts, s.std_pts,
        |    CASE WHEN abs(CAST(c.n_pts AS DOUBLE) - s.mean_pts) > s.std_pts
        |         THEN 1 ELSE 0 END AS flagged
        |  FROM net n
        |    JOIN cnt99 c ON c.hydroid = n.hydroid AND c.huc8 = n.huc8
        |    JOIN sd99 s ON s.huc8 = n.huc8
        |  WHERE n.to_node = -1
        |)""".stripMargin)(
      """SELECT hydroid, huc8, n_pts, mean_pts, std_pts, flagged, length_km,
        |  CASE WHEN flagged = 1 THEN length_km * CAST(0.75 AS DOUBLE)
        |       ELSE length_km END AS trimmed_length_km,
        |  slope,
        |  CASE WHEN flagged = 1
        |       THEN greatest(slope * length_km / (length_km * CAST(0.75 AS DOUBLE)),
        |                     CAST(0.002 AS DOUBLE))
        |       ELSE slope END AS slope_adj
        |FROM ot99""".stripMargin),

    "q100_agree_burn" -> {
      // elevation closed form of a decoded gid — exact dyadic doubles
      def elevSql(gid: String): String =
        s"((($gid // 144) * 31 + ($gid % 144) * 17) % 400) / CAST(4.0 AS DOUBLE)" +
          s" + ($gid // 144) / CAST(4.0 AS DOUBLE)"
      // nearest candidate within Chebyshev 6 as packed min(d2 * 2^20 + gid)
      def nnSql(probe: String, cand: String, filter: String): String =
        s"""SELECT g.gid, min(CAST((v.r - g.r) * (v.r - g.r)
           |    + (v.c - g.c) * (v.c - g.c) AS BIGINT) * 1048576 + v.gid) AS packed
           |  FROM $probe g JOIN $cand v
           |    ON $filter
           |    AND v.r BETWEEN g.r - 6 AND g.r + 6
           |    AND v.c BETWEEN g.c - 6 AND g.c + 6
           |  GROUP BY g.gid""".stripMargin
      withCtes(
        """g100 AS (
          |  SELECT r.x * 144 + c.x AS gid, r.x AS r, c.x AS c,
          |    ((r.x * 31 + c.x * 17) % 400) / CAST(4.0 AS DOUBLE)
          |      + r.x / CAST(4.0 AS DOUBLE) AS elev,
          |    CASE WHEN c.x % 12 = 5 OR r.x % 36 = 18 THEN 1 ELSE 0 END AS river
          |  FROM generate_series(0, 143) r(x), generate_series(0, 143) c(x)
          |)""".stripMargin,
        s"vnn AS (${nnSql("g100", "g100", "v.river = 1")})",
        s"""vd AS (
           |  SELECT g.*, v.packed // 1048576 AS vd2, v.packed % 1048576 AS vgid,
           |    sqrt(CAST(v.packed // 1048576 AS DOUBLE)) AS vectdist,
           |    ${elevSql("(v.packed % 1048576)")} - CAST(10.0 AS DOUBLE) AS vectallo,
           |    CASE WHEN CAST(v.packed // 1048576 AS DOUBLE) > CAST(10.5625 AS DOUBLE)
           |         THEN 1 ELSE 0 END AS outside
           |  FROM g100 g JOIN vnn v ON g.gid = v.gid
           |)""".stripMargin,
        s"bnn AS (${nnSql("(SELECT * FROM vd WHERE outside = 0)",
          "(SELECT * FROM vd WHERE outside = 1)", "1 = 1")})",
        s"""bb AS (
           |  SELECT t.*,
           |    CASE WHEN t.outside = 1 THEN 0 ELSE b.packed // 1048576 END AS bd2,
           |    CASE WHEN t.outside = 1 THEN t.gid ELSE b.packed % 1048576 END AS bgid
           |  FROM vd t LEFT JOIN bnn b ON t.gid = b.gid
           |)""".stripMargin,
        s"""f100 AS (
           |  SELECT *, sqrt(CAST(bd2 AS DOUBLE)) AS bufdist,
           |    ${elevSql("bgid")} AS bufallo
           |  FROM bb
           |)""".stripMargin)(
        """SELECT gid, CAST(river AS INT) AS river, elev, vd2, vgid, vectallo,
          |  bd2, bgid, bufallo,
          |  vectallo + (bufallo - vectallo) / (bufdist + vectdist) * vectdist AS smoelev,
          |  CASE WHEN river = 1
          |       THEN vectallo + (bufallo - vectallo) / (bufdist + vectdist) * vectdist
          |            - CAST(1000.0 AS DOUBLE)
          |       WHEN outside = 1 THEN elev
          |       ELSE vectallo + (bufallo - vectallo) / (bufdist + vectdist) * vectdist
          |  END AS agree_elev
          |FROM f100""".stripMargin)
    },

    "q101_accuflux" -> withRecursiveCtes(
      """net98 AS (
        |  SELECT hydroid,
        |    lpad(CAST(CAST(floor(floor(hydroid / 144) / 8) * 18 + floor((hydroid % 144) / 8) AS BIGINT) AS VARCHAR), 8, '0') AS huc8,
        |    CAST(CASE WHEN (CAST(floor(hydroid / 144) AS BIGINT) % 8) = 0 THEN -1
        |         ELSE (CAST(floor(hydroid / 144) AS BIGINT) - 1) * 144 + (hydroid % 144)
        |              - (hydroid % 8) + CAST(floor((hydroid % 8) / 2) AS BIGINT)
        |    END AS BIGINT) AS to_node
        |  FROM (SELECT a.x * 144 + b.x AS hydroid
        |        FROM generate_series(0, 143) a(x), generate_series(0, 143) b(x))
        |)""".stripMargin,
      """hw AS (
        |  SELECT hydroid FROM net98 n
        |  WHERE hydroid % 13 = 2
        |    AND NOT EXISTS (SELECT 1 FROM net98 u WHERE u.to_node = n.hydroid)
        |)""".stripMargin,
      """walk AS (
        |  SELECT hydroid AS node FROM hw
        |  UNION ALL
        |  SELECT n.to_node AS node FROM walk w JOIN net98 n ON w.node = n.hydroid
        |  WHERE n.to_node >= 0
        |)""".stripMargin,
      "acc AS (SELECT node, count(*) AS flowaccum FROM walk GROUP BY node)")(
      """SELECT n.huc8, n.hydroid, coalesce(a.flowaccum, 0) AS flowaccum,
        |  CAST(CASE WHEN coalesce(a.flowaccum, 0) > 0 THEN 25 ELSE 0 END AS INT)
        |    AS stream_pixel
        |FROM net98 n LEFT JOIN acc a ON n.hydroid = a.node""".stripMargin),

    "q102_rem" -> withCtes(pts, asg,
      """zm AS (
        |  SELECT hydroid, min(hand) AS zmin FROM asg WHERE pid % 23 = 1
        |  GROUP BY hydroid
        |)""".stripMargin)(
      """SELECT a.pid, a.hydroid, a.hand AS dem,
        |  CASE WHEN z.zmin IS NULL THEN CAST(-9999.0 AS DOUBLE)
        |       ELSE a.hand - z.zmin END AS rem
        |FROM asg a LEFT JOIN zm z ON a.hydroid = z.hydroid""".stripMargin),

    "q103_src_finalize" -> withCtes(srcg +: manningChainCtes(
      """hydroid, 1000000 + hydroid AS feature_id, i, stage, channel_n,
        |    slope,
        |    surface_area / length_km / CAST(1000.0 AS DOUBLE) AS top_width""".stripMargin): _*)(
      """SELECT hydroid, feature_id, CAST(i AS BIGINT) AS i, stage, top_width,
        |  wetted_perimeter, wet_area, hydraulic_radius,
        |  CASE WHEN stage = CAST(0.0 AS DOUBLE) THEN CAST(0.0 AS DOUBLE)
        |       WHEN hydraulic_radius > CAST(0.0 AS DOUBLE)
        |       THEN wet_area * yf * sqrt(slope) / channel_n
        |       ELSE CAST(0.0 AS DOUBLE) END AS discharge_cms
        |FROM f8""".stripMargin),

    "q104_mannings_reset" -> withCtes(Seq(srcg, net) ++
      manningChainCtes("hydroid, i, stage, slope") ++ Seq(
      """rq AS (
        |  SELECT hydroid, i, stage,
        |    CASE WHEN stage = CAST(0.0 AS DOUBLE) THEN CAST(0.0 AS DOUBLE)
        |         WHEN hydraulic_radius > CAST(0.0 AS DOUBLE)
        |         THEN wet_area * yf * sqrt(slope) / CAST(0.06 AS DOUBLE)
        |         ELSE CAST(0.0 AS DOUBLE) END AS q_reset
        |  FROM f8
        |)""".stripMargin,
      """ups AS (
        |  SELECT to_node AS hydroid, count(*) AS n_up,
        |    min((8 - order_) * 16777216 + hydroid) AS upk
        |  FROM net WHERE to_node >= 0 GROUP BY to_node
        |)""".stripMargin,
      """dn1 AS (
        |  SELECT n.hydroid,
        |    (((n.hydroid * 7 + 3) % 40) / CAST(20.0 AS DOUBLE) < CAST(0.25 AS DOUBLE)
        |      AND n.length_km < CAST(1.2 AS DOUBLE)
        |      AND n.hydroid % 97 <> 0) AS small,
        |    CASE WHEN u.n_up >= 1 THEN u.upk % 16777216
        |         WHEN n.to_node >= 0 THEN n.to_node
        |         ELSE n.hydroid END AS donor1,
        |    u.n_up IS NULL AS headwater
        |  FROM net n LEFT JOIN ups u ON n.hydroid = u.hydroid
        |)""".stripMargin,
      """dnr AS (
        |  SELECT a.hydroid,
        |    CASE WHEN NOT a.small THEN NULL
        |         WHEN a.headwater AND b.small THEN b.donor1
        |         ELSE a.donor1 END AS donor_id,
        |    CASE WHEN a.small THEN 1 ELSE 0 END AS is_small
        |  FROM dn1 a LEFT JOIN dn1 b ON a.donor1 = b.hydroid
        |)""".stripMargin): _*)(
      """SELECT s.hydroid, s.i, s.stage, CAST(0.06 AS DOUBLE) AS manning_n,
        |  CASE WHEN d.donor_id IS NOT NULL THEN dq.q_reset
        |       ELSE s.q_reset END AS discharge_cms,
        |  d.donor_id, CAST(d.is_small AS INT) AS is_small
        |FROM rq s JOIN dnr d ON s.hydroid = d.hydroid
        |LEFT JOIN rq dq ON dq.hydroid = d.donor_id AND dq.i = s.i""".stripMargin),

    "q105_unit_error_gate" -> withCtes(pts, asg,
      """hagg AS (
        |  SELECT lpad(CAST(CAST(floor(floor(hydroid / 144) / 8) * 18 + floor((hydroid % 144) / 8) AS BIGINT) AS VARCHAR), 8, '0') AS huc8,
        |    count(*) AS n_pts,
        |    count(CASE WHEN hydroid % 97 <> 0 THEN 1 END) AS n_ok
        |  FROM asg GROUP BY 1
        |)""".stripMargin,
      """ust AS (
        |  SELECT u.huc8,
        |    CASE WHEN a.huc8 IS NULL THEN 60 WHEN a.n_ok = 0 THEN 64 ELSE 0 END AS status
        |  FROM (SELECT lpad(CAST(x.x * 18 + y.x AS VARCHAR), 8, '0') AS huc8
        |        FROM generate_series(0, 17) x(x), generate_series(0, 17) y(x)) u
        |  LEFT JOIN hagg a ON u.huc8 = a.huc8
        |)""".stripMargin,
      """gat AS (
        |  SELECT count(*) AS n_units,
        |    count(CASE WHEN status <> 0 THEN 1 END) AS n_errors
        |  FROM ust
        |)""".stripMargin)(
      """SELECT n_units, n_errors,
        |  CAST(n_errors AS DOUBLE) / CAST(n_units AS DOUBLE) * CAST(100.0 AS DOUBLE)
        |    AS pct_errors,
        |  CAST(CASE WHEN n_errors > 10
        |        AND CAST(n_errors AS DOUBLE) / CAST(n_units AS DOUBLE)
        |            * CAST(100.0 AS DOUBLE) >= CAST(10.0 AS DOUBLE)
        |       THEN 62 ELSE 0 END AS INT) AS return_code
        |FROM gat""".stripMargin),

    "q107_vary_mannings" -> withCtes(Seq(srcg, bfq) ++ manningChainCtes(
      """hydroid, 1000000 + hydroid AS feature_id, i, stage, slope,
        |    channel_n, volume, bankfull_flow, discharge_cms""".stripMargin) ++ Seq(
      """mann AS (
        |  SELECT 1000000 + x AS feature_id,
        |    CAST(0.02 AS DOUBLE) + ((1000000 + x) % 9) * CAST(0.005 AS DOUBLE) AS vm_channel_n,
        |    CAST(0.08 AS DOUBLE) + ((1000000 + x) % 5) * CAST(0.02 AS DOUBLE) AS vm_overbank_n
        |  FROM generate_series(0, 20735) t(x) WHERE (1000000 + x) % 17 <> 4
        |)""".stripMargin,
      """rt7 AS (
        |  SELECT f.*, b.volume_bankfull, m.vm_channel_n, m.vm_overbank_n,
        |    CASE WHEN f.stage = CAST(0.0 AS DOUBLE) THEN CAST(1.0 AS DOUBLE)
        |         ELSE b.volume_bankfull / f.volume END AS ratio0
        |  FROM f8 f JOIN bfq b ON f.hydroid = b.hydroid
        |  LEFT JOIN mann m ON f.feature_id = m.feature_id
        |)""".stripMargin,
      """rr7 AS (
        |  SELECT *, CASE WHEN bankfull_flow > CAST(0.0 AS DOUBLE)
        |         THEN (CASE WHEN ratio0 <= CAST(1.0 AS DOUBLE) THEN ratio0
        |               ELSE CAST(1.0 AS DOUBLE) END)
        |         ELSE CAST(0.0 AS DOUBLE) END AS chann_volume_ratio
        |  FROM rt7
        |)""".stripMargin,
      """cc7 AS (
        |  SELECT *, chann_volume_ratio * vm_channel_n
        |    + (CAST(1.0 AS DOUBLE) - chann_volume_ratio) * vm_overbank_n AS comp_n
        |  FROM rr7
        |)""".stripMargin): _*)(
      """SELECT hydroid, feature_id, i, stage, chann_volume_ratio,
        |  CAST(CASE WHEN comp_n IS NOT NULL THEN 1 ELSE 0 END AS INT) AS vmann_on,
        |  CASE WHEN comp_n IS NOT NULL THEN comp_n ELSE channel_n END AS vmann_manning_n,
        |  CASE WHEN comp_n IS NULL THEN discharge_cms
        |       WHEN hydraulic_radius > CAST(0.0 AS DOUBLE)
        |       THEN wet_area * yf * sqrt(slope) / comp_n
        |       ELSE CAST(0.0 AS DOUBLE) END AS vmann_discharge_cms
        |FROM cc7""".stripMargin),

    "q108_interp_wse" -> withCtes(
      """g108 AS (
        |  SELECT r.x * 144 + c.x AS gid, r.x AS r, c.x AS c,
        |    ((r.x * 31 + c.x * 17) % 400) / CAST(4.0 AS DOUBLE)
        |      + r.x / CAST(4.0 AS DOUBLE) AS elev,
        |    CASE WHEN (r.x * 7 + c.x * 3) % 5 <> 0 THEN 1 ELSE 0 END AS valid,
        |    ((r.x * 31 + c.x * 17) % 400) / CAST(4.0 AS DOUBLE)
        |      + r.x / CAST(4.0 AS DOUBLE)
        |      + ((r.x * 5 + c.x * 11) % 8) / CAST(4.0 AS DOUBLE) AS wse
        |  FROM generate_series(0, 143) r(x), generate_series(0, 143) c(x)
        |)""".stripMargin,
      """pr8 AS (
        |  SELECT g.gid,
        |    CAST((v.r - g.r) * (v.r - g.r) + (v.c - g.c) * (v.c - g.c) AS BIGINT) AS d2,
        |    CAST(v.wse * 4 AS BIGINT) AS vq
        |  FROM g108 g JOIN g108 v ON g.valid = 0 AND v.valid = 1
        |    AND v.r BETWEEN g.r - 4 AND g.r + 4
        |    AND v.c BETWEEN g.c - 4 AND g.c + 4
        |)""".stripMargin,
      """ag8 AS (
        |  SELECT gid,
        |    CAST(sum(CAST(floor(CAST(1048576.0 AS DOUBLE) / CAST(d2 AS DOUBLE)) AS BIGINT) * vq) AS BIGINT) AS num,
        |    CAST(sum(CAST(floor(CAST(1048576.0 AS DOUBLE) / CAST(d2 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS den
        |  FROM pr8 GROUP BY gid
        |)""".stripMargin)(
      """SELECT g.gid, CAST(g.valid AS INT) AS valid,
        |  CASE WHEN g.valid = 1 THEN g.wse
        |       WHEN a.den IS NOT NULL
        |       THEN CAST(a.num AS DOUBLE) / CAST(a.den AS DOUBLE) / CAST(4.0 AS DOUBLE)
        |       ELSE CAST(-9999.0 AS DOUBLE) END AS wse_filled,
        |  CASE WHEN g.valid = 0 AND a.den IS NULL THEN CAST(-9999.0 AS DOUBLE)
        |       ELSE (CASE WHEN g.valid = 1 THEN g.wse
        |             ELSE CAST(a.num AS DOUBLE) / CAST(a.den AS DOUBLE) / CAST(4.0 AS DOUBLE) END)
        |            - g.elev END AS depth
        |FROM g108 g LEFT JOIN ag8 a ON g.gid = a.gid""".stripMargin),

    "q109_flood_impact" -> withCtes(pts, asg, ht, fc, stg, til, mos, net,
      "wetb AS (SELECT cell FROM mos WHERE depth_max > CAST(0.5 AS DOUBLE))",
      "wett AS (SELECT cell FROM mos WHERE depth_max > CAST(0.25 AS DOUBLE) AND cell % 7 <> 3)",
      """stc AS (
        |  SELECT objectid, 'structure' AS ftype,
        |    12 * 72057594037927936
        |      + CAST(floor((lat + 90.0) / 180.0 * 4096.0) AS BIGINT) * 268435456
        |      + CAST(floor((lng + 180.0) / 360.0 * 8192.0) AS BIGINT) AS cell
        |  FROM (SELECT objectid,
        |          CASE WHEN pid % 5 = 0 THEN 40.0 + ((pid * 131 + 17) % 2000) / 1000.0
        |               ELSE ((pid * 48271 + 11) % 160000) / 1000.0 - 80.0 END AS lat,
        |          CASE WHEN pid % 5 = 0 THEN -74.0 + ((pid * 137 + 29) % 2000) / 1000.0
        |               ELSE ((pid * 69621 + 7) % 360000) / 1000.0 - 180.0 END AS lng
        |        FROM (SELECT x AS objectid, x * 13 + 7 AS pid
        |              FROM generate_series(0, 4999) t(x)))
        |)""".stripMargin,
      """rd0 AS (
        |  SELECT hydroid,
        |    (CAST(floor(hydroid / 144) AS BIGINT) + CAST(0.5 AS DOUBLE)) * CAST(1.25 AS DOUBLE)
        |      - CAST(90.0 AS DOUBLE) AS from_lat,
        |    ((hydroid % 144) + CAST(0.5 AS DOUBLE)) * CAST(2.5 AS DOUBLE)
        |      - CAST(180.0 AS DOUBLE) AS from_lng,
        |    CASE WHEN to_node < 0
        |      THEN (CAST(floor(hydroid / 144) AS BIGINT) + CAST(0.5 AS DOUBLE)) * CAST(1.25 AS DOUBLE)
        |           - CAST(90.0 AS DOUBLE) - CAST(1.25 AS DOUBLE)
        |      ELSE (CAST(floor(to_node / 144) AS BIGINT) + CAST(0.5 AS DOUBLE)) * CAST(1.25 AS DOUBLE)
        |           - CAST(90.0 AS DOUBLE) END AS to_lat,
        |    CASE WHEN to_node < 0
        |      THEN ((hydroid % 144) + CAST(0.5 AS DOUBLE)) * CAST(2.5 AS DOUBLE) - CAST(180.0 AS DOUBLE)
        |      ELSE ((to_node % 144) + CAST(0.5 AS DOUBLE)) * CAST(2.5 AS DOUBLE) - CAST(180.0 AS DOUBLE)
        |    END AS to_lng
        |  FROM net
        |)""".stripMargin,
      """rds AS (
        |  SELECT hydroid AS objectid, 'road' AS ftype,
        |    12 * 72057594037927936
        |      + CAST(floor((lat + 90.0) / 180.0 * 4096.0) AS BIGINT) * 268435456
        |      + CAST(floor((lng + 180.0) / 360.0 * 8192.0) AS BIGINT) AS cell
        |  FROM (SELECT hydroid,
        |          from_lat + (j.j / CAST(4.0 AS DOUBLE)) * (to_lat - from_lat) AS lat,
        |          from_lng + (j.j / CAST(4.0 AS DOUBLE)) * (to_lng - from_lng) AS lng
        |        FROM rd0 CROSS JOIN generate_series(0, 4) j(j))
        |)""".stripMargin,
      "fts AS (SELECT * FROM stc UNION ALL SELECT * FROM rds)",
      """ib9 AS (SELECT DISTINCT f.objectid, f.ftype
        |  FROM fts f JOIN wetb w ON f.cell = w.cell)""".stripMargin,
      """it9 AS (SELECT DISTINCT f.objectid, f.ftype
        |  FROM fts f JOIN wett w ON f.cell = w.cell)""".stripMargin,
      """fo9 AS (
        |  SELECT b.objectid IS NOT NULL AS in_b, t.objectid IS NOT NULL AS in_t,
        |    coalesce(b.ftype, t.ftype) AS ftype
        |  FROM ib9 b FULL JOIN it9 t
        |    ON b.objectid = t.objectid AND b.ftype = t.ftype
        |)""".stripMargin,
      """cn9 AS (
        |  SELECT count(CASE WHEN in_b AND ftype = 'structure' THEN 1 END) AS n_struct_bench,
        |    count(CASE WHEN in_b AND ftype = 'road' THEN 1 END) AS n_road_bench,
        |    count(CASE WHEN in_t AND ftype = 'structure' THEN 1 END) AS n_struct_test,
        |    count(CASE WHEN in_t AND ftype = 'road' THEN 1 END) AS n_road_test,
        |    count(CASE WHEN in_b THEN 1 END) AS tp,
        |    count(CASE WHEN in_b AND NOT in_t THEN 1 END) AS fn,
        |    count(CASE WHEN in_t AND NOT in_b THEN 1 END) AS fp
        |  FROM fo9
        |)""".stripMargin)(
      """SELECT n_struct_bench, n_road_bench, n_struct_test, n_road_test, tp, fn, fp,
        |  CASE WHEN tp + fn + fp <> 0
        |       THEN CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE) + CAST(fp AS DOUBLE))
        |  END AS csi
        |FROM cn9""".stripMargin),

    "q110_deep_flooding" -> withCtes(pts, asg, ht, fc, stg, til, mos, mrects,
      """mc10 AS (
        |  SELECT cell, depth_max,
        |    (((cell // 268435456) % 268435456) + CAST(0.5 AS DOUBLE)) / 4096.0 * 180.0 - 90.0 AS clat,
        |    ((cell % 268435456) + CAST(0.5 AS DOUBLE)) / 8192.0 * 360.0 - 180.0 AS clng
        |  FROM mos
        |)""".stripMargin,
      """df10 AS (
        |  SELECT m.mask_id, c.depth_max
        |  FROM mc10 c JOIN mrects m
        |    ON c.clat >= m.lat_min AND c.clat < m.lat_max
        |   AND c.clng >= m.lng_min AND c.clng < m.lng_max
        |)""".stripMargin,
      """ag10 AS (
        |  SELECT mask_id, count(*) AS n_cells,
        |    count(CASE WHEN depth_max > CAST(2.0 AS DOUBLE) THEN 1 END) AS n_deep,
        |    max(CASE WHEN depth_max > CAST(2.0 AS DOUBLE) THEN depth_max END) AS max_deep
        |  FROM df10 GROUP BY mask_id
        |)""".stripMargin)(
      """SELECT mask_id, n_cells, n_deep, max_deep,
        |  CAST(n_deep AS DOUBLE) / CAST(n_cells AS DOUBLE) * CAST(100.0 AS DOUBLE) AS pct_deep
        |FROM ag10""".stripMargin),

    "q111_levee_burn" -> withCtes(
      """g111 AS (
        |  SELECT r.x * 144 + c.x AS gid, r.x AS r, c.x AS c,
        |    ((r.x * 31 + c.x * 17) % 400) / CAST(4.0 AS DOUBLE)
        |      + r.x / CAST(4.0 AS DOUBLE) AS elev
        |  FROM generate_series(0, 143) r(x), generate_series(0, 143) c(x)
        |)""".stripMargin,
      """n111 AS (
        |  SELECT gid, elev,
        |    CASE WHEN r % 24 = 6
        |      THEN elev + ((r * 3 + c * 7) % 20) / CAST(4.0 AS DOUBLE) + CAST(2.0 AS DOUBLE)
        |      ELSE CAST(-9999.0 AS DOUBLE) END AS nld
        |  FROM g111
        |)""".stripMargin)(
      "SELECT gid, elev, nld, greatest(elev, nld) AS burned_elev FROM n111"),

    "q112_boundary_errors" -> withCtes(pts, asg, ht, fc, stg, til, mos,
      "wetc AS (SELECT cell FROM mos WHERE depth_max > CAST(0.0 AS DOUBLE))",
      """nb12 AS (
        |  SELECT cell, 12 * 72057594037927936
        |    + (((cell // 268435456) % 268435456) + dr) * 268435456
        |    + ((cell % 268435456) + dc) AS ncell
        |  FROM wetc CROSS JOIN (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) o(dr, dc)
        |)""".stripMargin,
      """dr12 AS (
        |  SELECT n.cell, n.ncell FROM nb12 n
        |  LEFT JOIN wetc w ON n.ncell = w.cell WHERE w.cell IS NULL
        |)""".stripMargin,
      """hy12 AS (
        |  SELECT cell, ncell,
        |    (((cell // 268435456) % 268435456) + CAST(0.5 AS DOUBLE)) / 4096.0 * 180.0 - 90.0 AS clat,
        |    ((cell % 268435456) + CAST(0.5 AS DOUBLE)) / 8192.0 * 360.0 - 180.0 AS clng,
        |    (((ncell // 268435456) % 268435456) + CAST(0.5 AS DOUBLE)) / 4096.0 * 180.0 - 90.0 AS nlat,
        |    ((ncell % 268435456) + CAST(0.5 AS DOUBLE)) / 8192.0 * 360.0 - 180.0 AS nlng
        |  FROM dr12
        |)""".stripMargin,
      """er12 AS (
        |  SELECT CAST(floor((clat + 90.0) / 1.25) AS BIGINT) * 144
        |           + CAST(floor((clng + 180.0) / 2.5) AS BIGINT) AS hydroid,
        |    cell
        |  FROM hy12
        |  WHERE nlat >= CAST(-90.0 AS DOUBLE) AND nlat < CAST(90.0 AS DOUBLE)
        |    AND nlng >= CAST(-180.0 AS DOUBLE) AND nlng < CAST(180.0 AS DOUBLE)
        |    AND (CAST(floor((clat + 90.0) / 1.25) AS BIGINT) * 144
        |           + CAST(floor((clng + 180.0) / 2.5) AS BIGINT))
        |        <> (CAST(floor((nlat + 90.0) / 1.25) AS BIGINT) * 144
        |           + CAST(floor((nlng + 180.0) / 2.5) AS BIGINT))
        |)""".stripMargin)(
      """SELECT hydroid, count(DISTINCT cell) AS n_error_cells
        |FROM er12 GROUP BY hydroid HAVING count(DISTINCT cell) >= 3""".stripMargin),

    "q113_missing_fim" -> withCtes(pts, asg,
      """zm AS (
        |  SELECT hydroid, min(hand) AS zmin FROM asg WHERE pid % 23 = 1
        |  GROUP BY hydroid
        |)""".stripMargin,
      """rm13 AS (
        |  SELECT a.pid, a.hydroid,
        |    CASE WHEN z.zmin IS NULL THEN CAST(-9999.0 AS DOUBLE)
        |         ELSE a.hand - z.zmin END AS rem
        |  FROM asg a LEFT JOIN zm z ON a.hydroid = z.hydroid
        |)""".stripMargin,
      """ph13 AS (
        |  SELECT CAST(hydroid % 8 + 1 AS INT) AS order_, hydroid,
        |    count(*) AS n_cells,
        |    count(CASE WHEN rem = CAST(0.0 AS DOUBLE) THEN 1 END) AS n_rem0
        |  FROM rm13 GROUP BY 1, 2
        |)""".stripMargin,
      "tt13 AS (SELECT count(*) AS n_total FROM rm13)")(
      """SELECT order_, count(*) AS n_hydroids,
        |  CAST(sum(n_cells) AS BIGINT) AS n_cells,
        |  CAST(sum(n_rem0) AS BIGINT) AS n_rem0_cells,
        |  count(CASE WHEN n_rem0 = 0 THEN 1 END) AS n_notch_hydroids,
        |  CAST(CAST(sum(n_rem0) AS BIGINT) AS DOUBLE) / CAST(n_total AS DOUBLE)
        |    * CAST(100.0 AS DOUBLE) AS pct_rem0
        |FROM ph13 CROSS JOIN tt13
        |GROUP BY order_, n_total""".stripMargin),

    "q114_pairing_agreement" -> withCtes(pts, asg, ht, fc, stg, til, mos, mrects,
      """pair AS (SELECT * FROM (VALUES (0,0,0), (0,1,1), (1,0,2), (1,1,3),
        |  (2,0,4), (2,1,5), (4,0,6), (4,1,6)) v(cand, bench, agreement))""".stripMargin,
      """cb AS (
        |  SELECT cell,
        |    CASE WHEN EXISTS (SELECT 1 FROM mrects m
        |           WHERE clat >= m.lat_min AND clat < m.lat_max
        |             AND clng >= m.lng_min AND clng < m.lng_max) THEN 4
        |         WHEN depth_max > CAST(0.5 AS DOUBLE) THEN 2
        |         WHEN depth_max > 0.0 THEN 1 ELSE 0 END AS cand,
        |    CASE WHEN (((cell // 268435456) % 268435456) * 31 + (cell % 268435456) * 17) % 10 < 4
        |         THEN 1 ELSE 0 END AS bench
        |  FROM (SELECT cell, depth_max,
        |          (((cell // 268435456) % 268435456) + CAST(0.5 AS DOUBLE)) / 4096.0 * 180.0 - 90.0 AS clat,
        |          ((cell % 268435456) + CAST(0.5 AS DOUBLE)) / 8192.0 * 360.0 - 180.0 AS clng
        |        FROM mos)
        |)""".stripMargin)(
      """SELECT p.agreement, count(*) AS n
        |FROM cb JOIN pair p ON cb.cand = p.cand AND cb.bench = p.bench
        |GROUP BY 1""".stripMargin),

    "q115_agree_nodata" -> {
      def elevSql(gid: String): String =
        s"((($gid // 144) * 31 + ($gid % 144) * 17) % 400) / CAST(4.0 AS DOUBLE)" +
          s" + ($gid // 144) / CAST(4.0 AS DOUBLE)"
      def nnSql(probe: String, cand: String, filter: String): String =
        s"""SELECT g.gid, min(CAST((v.r - g.r) * (v.r - g.r)
           |    + (v.c - g.c) * (v.c - g.c) AS BIGINT) * 1048576 + v.gid) AS packed
           |  FROM $probe g JOIN $cand v
           |    ON $filter
           |    AND v.r BETWEEN g.r - 6 AND g.r + 6
           |    AND v.c BETWEEN g.c - 6 AND g.c + 6
           |  GROUP BY g.gid""".stripMargin
      withCtes(
        """g115 AS (
          |  SELECT r.x * 144 + c.x AS gid, r.x AS r, c.x AS c,
          |    ((r.x * 31 + c.x * 17) % 400) / CAST(4.0 AS DOUBLE)
          |      + r.x / CAST(4.0 AS DOUBLE) AS elev,
          |    CASE WHEN c.x % 12 = 5 OR r.x % 36 = 18 THEN 1 ELSE 0 END AS river
          |  FROM generate_series(0, 143) r(x), generate_series(0, 143) c(x)
          |  WHERE NOT ((r.x BETWEEN 106 AND 118
          |              AND (c.x BETWEEN 44 AND 49 OR c.x BETWEEN 57 AND 62))
          |             OR (r.x BETWEEN 25 AND 47 AND c.x = 17))
          |)""".stripMargin,
        s"vnn115 AS (${nnSql("g115", "g115", "v.river = 1")})",
        s"""vd115 AS (
           |  SELECT g.*,
           |    CASE WHEN v.gid IS NULL THEN 1 ELSE 0 END AS vfb,
           |    v.packed // 1048576 AS vd2, v.packed % 1048576 AS vgid,
           |    sqrt(CAST(v.packed // 1048576 AS DOUBLE)) AS vectdist,
           |    CASE WHEN v.gid IS NULL THEN g.elev - CAST(10.0 AS DOUBLE)
           |         ELSE ${elevSql("(v.packed % 1048576)")} - CAST(10.0 AS DOUBLE) END AS vectallo,
           |    CASE WHEN v.gid IS NULL
           |           OR CAST(v.packed // 1048576 AS DOUBLE) > CAST(10.5625 AS DOUBLE)
           |         THEN 1 ELSE 0 END AS outside
           |  FROM g115 g LEFT JOIN vnn115 v ON g.gid = v.gid
           |)""".stripMargin,
        s"bnn115 AS (${nnSql("(SELECT * FROM vd115 WHERE outside = 0)",
          "(SELECT * FROM vd115 WHERE outside = 1)", "1 = 1")})",
        s"""bb115 AS (
           |  SELECT t.*,
           |    CASE WHEN t.outside = 0 AND b.gid IS NULL THEN 1 ELSE 0 END AS bfb,
           |    CASE WHEN t.outside = 1 OR b.gid IS NULL THEN 0
           |         ELSE b.packed // 1048576 END AS bd2,
           |    CASE WHEN b.gid IS NULL THEN t.gid ELSE b.packed % 1048576 END AS bgid
           |  FROM vd115 t LEFT JOIN bnn115 b ON t.gid = b.gid
           |)""".stripMargin,
        s"""f115 AS (
           |  SELECT *, sqrt(CAST(bd2 AS DOUBLE)) AS bufdist,
           |    ${elevSql("bgid")} AS bufallo
           |  FROM bb115
           |)""".stripMargin,
        """s115 AS (
          |  SELECT *,
          |    CASE WHEN bufdist + vectdist = CAST(0.0 AS DOUBLE) THEN vectallo
          |         ELSE vectallo + (bufallo - vectallo) / (bufdist + vectdist) * vectdist
          |    END AS smoelev
          |  FROM f115
          |)""".stripMargin)(
        """SELECT gid, CAST(river AS INT) AS river, elev, CAST(vfb AS INT) AS vfb,
          |  vd2, vgid, vectallo, CAST(bfb AS INT) AS bfb, bd2, bgid, bufallo,
          |  smoelev,
          |  CASE WHEN river = 1 THEN smoelev - CAST(1000.0 AS DOUBLE)
          |       WHEN outside = 1 THEN elev
          |       ELSE smoelev END AS agree_elev
          |FROM s115""".stripMargin)
    },

    "q116_snapshot_roundtrip" -> withCtes(pts, asg)(
      s"""SELECT $huc8FromHydroid AS huc8, count(*) AS n_rows,
         |  CAST(sum(pid) AS BIGINT) AS pid_sum,
         |  min(hand) AS hand_min, max(hand) AS hand_max,
         |  count(*) AS n_manifest
         |FROM asg GROUP BY 1""".stripMargin),

    "q117_interp_udaf" -> withCtes(ht, fc, stg)(
      "SELECT hydroid, stage_m, stage_m AS stage_udaf FROM stg"),

    "q91_bridge_flows" -> {
      def interpSql(t: String): String =
        s"""CASE WHEN max(CASE WHEN h.stage <= t.$t THEN h.discharge_cms END) IS NULL THEN min(h.discharge_cms)
           |     WHEN min(CASE WHEN h.stage > t.$t THEN h.discharge_cms END) IS NULL THEN max(h.discharge_cms)
           |     ELSE max(CASE WHEN h.stage <= t.$t THEN h.discharge_cms END)
           |        + (max(t.$t) - max(CASE WHEN h.stage <= t.$t THEN h.stage END))
           |        * (min(CASE WHEN h.stage > t.$t THEN h.discharge_cms END)
           |           - max(CASE WHEN h.stage <= t.$t THEN h.discharge_cms END))
           |        / (min(CASE WHEN h.stage > t.$t THEN h.stage END)
           |           - max(CASE WHEN h.stage <= t.$t THEN h.stage END))
           |END""".stripMargin
      withCtes(pts, ht,
        """brg AS (
          |  SELECT k AS bridge_id,
          |    (floor(k / 144) + CAST(0.5 AS DOUBLE)) * CAST(1.25 AS DOUBLE) - 90.0
          |      + ((k * 17) % 100) / 1000.0 - CAST(0.05 AS DOUBLE) AS blat,
          |    ((k % 144) + CAST(0.5 AS DOUBLE)) * CAST(2.5 AS DOUBLE) - 180.0
          |      + ((k * 23) % 100) / 1000.0 - CAST(0.05 AS DOUBLE) AS blng
          |  FROM (SELECT a.x * 144 + b.x AS k
          |        FROM generate_series(0, 143) a(x), generate_series(0, 143) b(x))
          |  WHERE k % 151 = 0
          |)""".stripMargin,
        """thr AS (
          |  SELECT b.bridge_id, max(p.hand) AS threshold_hand, count(*) AS n_pts
          |  FROM pts p JOIN brg b
          |    ON p.lat >= b.blat - CAST(1.5 AS DOUBLE) AND p.lat < b.blat + CAST(1.5 AS DOUBLE)
          |   AND p.lng >= b.blng - CAST(1.5 AS DOUBLE) AND p.lng < b.blng + CAST(1.5 AS DOUBLE)
          |  GROUP BY b.bridge_id
          |)""".stripMargin,
        """thr2 AS (
          |  SELECT *, threshold_hand * CAST(0.75 AS DOUBLE) AS threshold_hand_75 FROM thr
          |)""".stripMargin,
        s"""bfl AS (
           |  SELECT t.bridge_id,
           |    max(t.threshold_hand) AS threshold_hand,
           |    max(t.threshold_hand_75) AS threshold_hand_75,
           |    max(t.n_pts) AS n_pts,
           |    ${interpSql("threshold_hand")} AS threshold_discharge,
           |    ${interpSql("threshold_hand_75")} AS threshold_discharge75
           |  FROM ht h JOIN thr2 t ON h.hydroid = t.bridge_id
           |  GROUP BY t.bridge_id
           |)""".stripMargin)(
        """SELECT bridge_id, threshold_hand, threshold_hand_75, n_pts,
          |  threshold_discharge, threshold_discharge75,
          |  threshold_hand * CAST(3.28084 AS DOUBLE) AS threshold_hand_ft,
          |  threshold_hand_75 * CAST(3.28084 AS DOUBLE) AS threshold_hand_75_ft,
          |  threshold_discharge * CAST(35.3147 AS DOUBLE) AS threshold_discharge_cfs,
          |  threshold_discharge75 * CAST(35.3147 AS DOUBLE) AS threshold_discharge_75_cfs
          |FROM bfl""".stripMargin)
    },

    "q90_levee_assoc" -> {
      // segment∩rect: closed bbox overlap + supporting-line corner test
      def segRect(rx0: String, rx1: String, ry0: String, ry1: String): String = {
        def side(cx: String, cy: String) =
          s"((s.xt - s.xf) * (($cy) - s.yf) - (s.yt - s.yf) * (($cx) - s.xf))"
        val s1 = side(rx0, ry0); val s2 = side(rx1, ry0)
        val s3 = side(rx1, ry1); val s4 = side(rx0, ry1)
        s"""greatest(least(s.xf, s.xt), $rx0) <= least(greatest(s.xf, s.xt), $rx1)
           |   AND greatest(least(s.yf, s.yt), $ry0) <= least(greatest(s.yf, s.yt), $ry1)
           |   AND least($s1, $s2, $s3, $s4) <= 0 AND greatest($s1, $s2, $s3, $s4) >= 0""".stripMargin
      }
      withRecursiveCtes(net, closure, arboAgg, chosenCte, lpCte,
        """lv0 AS (
          |  SELECT l,
          |    ((l * 13 + 7) % 142 + 1) * CAST(1.25 AS DOUBLE) - 90.0 AS y,
          |    ((l * 29 + 3) % 138) * CAST(2.5 AS DOUBLE) - 180.0 + CAST(0.5 AS DOUBLE) AS x0,
          |    ((l * 29 + 3) % 138 + 2 + l % 3) * CAST(2.5 AS DOUBLE) - 180.0 + CAST(0.5 AS DOUBLE) AS x1,
          |    CAST(0.25 AS DOUBLE) + (l % 4) * CAST(0.125 AS DOUBLE) AS d
          |  FROM generate_series(0, 119) t(l)
          |)""".stripMargin,
        """lv AS (
          |  SELECT l, y, x0, x1, x0 + CAST(2.5 AS DOUBLE) AS a_x0,
          |    CASE WHEN l % 7 = 0 THEN y + CAST(5.0 AS DOUBLE)
          |         WHEN l % 5 = 0 THEN y - CAST(0.25 AS DOUBLE)
          |         WHEN l % 2 = 0 THEN y + CAST(0.125 AS DOUBLE)
          |         ELSE y - CAST(0.125 AS DOUBLE) - d END AS a_lat_min,
          |    CASE WHEN l % 7 = 0 THEN y + CAST(5.5 AS DOUBLE)
          |         WHEN l % 5 = 0 THEN y + d
          |         WHEN l % 2 = 0 THEN y + CAST(0.125 AS DOUBLE) + d
          |         ELSE y - CAST(0.125 AS DOUBLE) END AS a_lat_max
          |  FROM lv0
          |)""".stripMargin,
        """hits AS (
          |  SELECT DISTINCT b.l
          |  FROM lv b JOIN lv a ON least(b.x1, a.x1) - greatest(b.x0, a.a_x0) > 0
          |   AND (least(b.y + CAST(0.5 AS DOUBLE), a.a_lat_max) - greatest(b.y, a.a_lat_min) > 0
          |     OR least(b.y, a.a_lat_max) - greatest(b.y - CAST(0.5 AS DOUBLE), a.a_lat_min) > 0)
          |)""".stripMargin,
        """sidesq AS (
          |  SELECT l,
          |    greatest(CAST(0.0 AS DOUBLE), least(x1, x1) - greatest(x0, a_x0))
          |      * greatest(CAST(0.0 AS DOUBLE),
          |        least(y + CAST(0.5 AS DOUBLE), a_lat_max) - greatest(y, a_lat_min)) AS left_area,
          |    greatest(CAST(0.0 AS DOUBLE), least(x1, x1) - greatest(x0, a_x0))
          |      * greatest(CAST(0.0 AS DOUBLE),
          |        least(y, a_lat_max) - greatest(y - CAST(0.5 AS DOUBLE), a_lat_min)) AS right_area
          |  FROM lv
          |)""".stripMargin,
        """sides AS (
          |  SELECT l, CASE WHEN left_area < right_area THEN 'left' ELSE 'right' END AS levee_side
          |  FROM sidesq WHERE left_area > 0 OR right_area > 0
          |)""".stripMargin,
        """seg AS (
          |  SELECT l.branch AS levelpath_id, n.hydroid,
          |    ((n.hydroid % 144) + CAST(0.5 AS DOUBLE)) * CAST(2.5 AS DOUBLE) - 180.0 AS xf,
          |    (floor(n.hydroid / 144) + CAST(0.5 AS DOUBLE)) * CAST(1.25 AS DOUBLE) - 90.0 AS yf,
          |    CASE WHEN n.to_node = -1
          |         THEN ((n.hydroid % 144) + CAST(0.5 AS DOUBLE)) * CAST(2.5 AS DOUBLE) - 180.0
          |         ELSE ((n.to_node % 144) + CAST(0.5 AS DOUBLE)) * CAST(2.5 AS DOUBLE) - 180.0 END AS xt,
          |    CASE WHEN n.to_node = -1
          |         THEN (floor(n.hydroid / 144) + CAST(0.5 AS DOUBLE)) * CAST(1.25 AS DOUBLE) - 90.0 - CAST(1.25 AS DOUBLE)
          |         ELSE (floor(n.to_node / 144) + CAST(0.5 AS DOUBLE)) * CAST(1.25 AS DOUBLE) - 90.0 END AS yt
          |  FROM net n JOIN lp l ON n.hydroid = l.hydroid
          |)""".stripMargin,
        s"""arects AS (
           |  SELECT v.l, v.x0, v.x1, v.y AS ry0, v.y + CAST(0.5 AS DOUBLE) AS ry1
           |  FROM lv v JOIN sides sd ON v.l = sd.l AND sd.levee_side = 'left'
           |  UNION ALL
           |  SELECT v.l, v.x0, v.x1, v.y - CAST(0.5 AS DOUBLE) AS ry0, v.y AS ry1
           |  FROM lv v JOIN sides sd ON v.l = sd.l AND sd.levee_side = 'right'
           |  UNION ALL
           |  SELECT v.l, v.x0, v.x1, v.y - CAST(1.0 AS DOUBLE) AS ry0, v.y + CAST(1.0 AS DOUBLE) AS ry1
           |  FROM lv v WHERE v.l NOT IN (SELECT l FROM hits)
           |)""".stripMargin,
        s"""pairs AS (
           |  SELECT DISTINCT r.l AS levee_id, s.levelpath_id
           |  FROM arects r JOIN seg s
           |    ON ${segRect("r.x0", "r.x1", "r.ry0", "r.ry1")}
           |)""".stripMargin,
        """crs AS (
          |  SELECT v.l AS levee_id, s.levelpath_id, count(*) AS n_crossings
          |  FROM seg s JOIN lv v ON (s.yf - v.y) * (s.yt - v.y) < 0
          |    AND s.xf + (v.y - s.yf) * (s.xt - s.xf) / (s.yt - s.yf) >= v.x0
          |    AND s.xf + (v.y - s.yf) * (s.xt - s.xf) / (s.yt - s.yf) <= v.x1
          |  GROUP BY v.l, s.levelpath_id
          |)""".stripMargin,
        s"""tch AS (
           |  SELECT DISTINCT v.l AS levee_id, s.levelpath_id
           |  FROM lv v JOIN seg s
           |    ON ${segRect("v.a_x0", "v.x1", "v.a_lat_min", "v.a_lat_max")}
           |)""".stripMargin)(
        """SELECT p.levee_id, p.levelpath_id,
          |  coalesce(sd.levee_side, 'none') AS levee_side,
          |  coalesce(c.n_crossings, 0) AS n_crossings
          |FROM pairs p
          |LEFT JOIN crs c ON c.levee_id = p.levee_id AND c.levelpath_id = p.levelpath_id
          |LEFT JOIN tch t ON t.levee_id = p.levee_id AND t.levelpath_id = p.levelpath_id
          |LEFT JOIN sides sd ON sd.l = p.levee_id
          |WHERE coalesce(c.n_crossings, 0) <> 1
          |  AND NOT (coalesce(c.n_crossings, 0) = 0 AND t.levee_id IS NOT NULL)""".stripMargin)
    },

    "q24_endpoints" -> withCtes(net)(
      """SELECT n.hydroid, CASE WHEN n.to_node = -1 THEN 1 ELSE 0 END AS is_outlet,
        |  CASE WHEN u.hydroid IS NULL THEN 1 ELSE 0 END AS is_headwater
        |FROM net n LEFT JOIN (SELECT DISTINCT to_node AS hydroid FROM net WHERE to_node >= 0) u
        |  ON n.hydroid = u.hydroid""".stripMargin),

    "q25_arbolate" -> withRecursiveCtes(net, closure)(
      """SELECT n2.huc8, c.d AS hydroid, sum(n.length_km) AS arbolate_km
        |FROM cl c JOIN net n ON c.u = n.hydroid JOIN net n2 ON c.d = n2.hydroid
        |GROUP BY n2.huc8, c.d""".stripMargin),

    "q26_levelpath" -> withRecursiveCtes(net, closure, arboAgg, chosenCte, lpCte)(
      """SELECT n.huc8, lp.hydroid, lp.branch AS levelpath_id
        |FROM lp JOIN net n ON lp.hydroid = n.hydroid""".stripMargin),

    "q27_next_down" -> withCtes(net)(
      "SELECT hydroid, to_node AS next_down_id FROM net"),

    "q28_seq_ids" -> withCtes(net)(
      """SELECT hydroid, substring(huc8, 5, 4)
        |  || lpad(CAST(CAST(row_number() OVER (PARTITION BY huc8 ORDER BY hydroid) AS INT) AS VARCHAR), 4, '0') AS hydro_str
        |FROM net""".stripMargin),

    "q29_segments" -> withCtes(net)(
      """SELECT hydroid, CAST(g.i AS INT) AS seg,
        |  (g.i - 1) * CAST(0.5 AS DOUBLE) AS seg_start,
        |  least(g.i * CAST(0.5 AS DOUBLE), length_km) AS seg_end
        |FROM net CROSS JOIN generate_series(1, 4) g(i)
        |WHERE g.i <= CAST(ceil(length_km / CAST(0.5 AS DOUBLE)) AS INT)""".stripMargin),

    "q30_asof_minby" ->
      """SELECT l_partkey, l_orderkey AS best_order, l_linenumber AS best_line, l_quantity AS best_qty
        |FROM (SELECT l_partkey, l_orderkey, l_linenumber, l_quantity,
        |        row_number() OVER (PARTITION BY l_partkey
        |          ORDER BY abs(l_quantity - 25), l_orderkey, l_linenumber) AS rn
        |      FROM lineitem)
        |WHERE rn = 1""".stripMargin,

    "q31_cumsum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
        |  sum(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_qty
        |FROM lineitem""".stripMargin,

    "q32_semi_anti" ->
      """SELECT
        |  (SELECT count(*) FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_with_orders,
        |  (SELECT count(*) FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_without_orders""".stripMargin,

    "q33_rollup" ->
      "SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)",

    "q34_keep_largest" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM (SELECT l_orderkey, l_linenumber, l_quantity,
        |        row_number() OVER (PARTITION BY l_orderkey
        |          ORDER BY l_quantity DESC, l_linenumber ASC) AS rn
        |      FROM lineitem)
        |WHERE rn = 1""".stripMargin,

    "q35_setops" ->
      """SELECT k, 'supplier_only' AS op FROM
        |  (SELECT DISTINCT s_nationkey AS k FROM supplier EXCEPT SELECT DISTINCT c_nationkey FROM customer)
        |UNION ALL
        |SELECT k, 'customer_only' AS op FROM
        |  (SELECT DISTINCT c_nationkey AS k FROM customer EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT k, 'both' AS op FROM
        |  (SELECT DISTINCT s_nationkey AS k FROM supplier INTERSECT SELECT DISTINCT c_nationkey FROM customer)""".stripMargin,

    "q36_sentinels" ->
      """SELECT l_orderkey, l_linenumber,
        |  coalesce(nullif(l_discount, CAST(0.0 AS DOUBLE)), CAST(-999.0 AS DOUBLE)) AS disc_sentinel,
        |  CASE WHEN nullif(l_discount, CAST(0.0 AS DOUBLE)) IS NULL THEN 1 ELSE 0 END AS was_zero
        |FROM lineitem""".stripMargin,

    "q37_sessionize" ->
      """SELECT user_id, count(*) AS n_events, CAST(sum(new_sess) AS BIGINT) AS n_sessions
        |FROM (SELECT user_id,
        |        CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |      FROM (SELECT user_id, ts,
        |              lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |            FROM events))
        |GROUP BY user_id""".stripMargin,

    "q38_pivot" ->
      """SELECT source,
        |  count(CASE WHEN lang = 'en' THEN 1 END) AS en,
        |  count(CASE WHEN lang = 'es' THEN 1 END) AS es,
        |  count(CASE WHEN lang = 'de' THEN 1 END) AS de,
        |  count(CASE WHEN lang = 'fr' THEN 1 END) AS fr,
        |  count(CASE WHEN lang = 'zh' THEN 1 END) AS zh
        |FROM documents GROUP BY source""".stripMargin,

    "q39_scalar_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  lpad(CAST(l_orderkey % 997 AS VARCHAR), 4, '0') AS bucket,
        |  lower(l_returnflag || l_linestatus) AS rf,
        |  substring(l_returnflag, 1, 1) AS rf1,
        |  CASE WHEN l_returnflag LIKE 'R%' THEN 1 ELSE 0 END AS is_r,
        |  CAST(floor(sqrt(l_quantity) * 10000) AS BIGINT) AS sqrt_q4,
        |  abs(l_quantity - 25) AS absd,
        |  CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
        |FROM lineitem""".stripMargin,

    "q40_huc_rollup" -> withCtes(pts, asg, ht, fc, stg, til)(
      s"""SELECT $huc8FromHydroid AS huc8, count(*) AS n_tiles,
         |  count(CASE WHEN depth > 0 THEN 1 END) AS n_wet,
         |  max(depth) AS max_depth,
         |  count(DISTINCT cell) AS n_cells
         |FROM til GROUP BY 1""".stripMargin),

    "q42_multimodal" ->
      """SELECT CAST(doc_id AS BIGINT) AS pid, CAST(length(text) AS INT) AS n_bytes,
        |  md5(substring(text, 1, 64)) AS thumb_md5,
        |  md5(substring(text, 33, 32)) AS frame1_md5
        |FROM documents""".stripMargin,

    "q43_rating_graft" -> withCtes(net)(
      """SELECT hydroid, length_km,
        |  CASE WHEN length_km < CAST(1.25 AS DOUBLE) AND to_node >= 0 THEN to_node
        |       ELSE hydroid END AS donor_id
        |FROM net""".stripMargin),

    "q44_waterbody_walk" -> withRecursiveCtes(net,
      """wb AS (
        |  SELECT hydroid, huc8, to_node AS cur FROM net WHERE hydroid % 97 = 0
        |  UNION ALL
        |  SELECT wb.hydroid, wb.huc8, n.to_node AS cur
        |  FROM wb JOIN net n ON wb.cur = n.hydroid
        |  WHERE wb.cur >= 0 AND wb.cur % 97 = 0
        |)""".stripMargin)(
      "SELECT huc8, hydroid, cur AS exit_node FROM wb WHERE cur < 0 OR cur % 97 <> 0"),

    "q48_point_sample" -> withCtes(pts, asg,
      """gc AS (
        |  SELECT hydroid,
        |    (CAST(floor(hydroid / 144) AS BIGINT) + CAST(0.5 AS DOUBLE)) * CAST(1.25 AS DOUBLE)
        |      - CAST(90.0 AS DOUBLE) AS lat_c,
        |    ((hydroid % 144) + CAST(0.5 AS DOUBLE)) * CAST(2.5 AS DOUBLE)
        |      - CAST(180.0 AS DOUBLE) AS lng_c
        |  FROM (SELECT 199 * x AS hydroid FROM generate_series(0, 104) t(x))
        |)""".stripMargin,
      """g48 AS (
        |  SELECT hydroid AS gage_id,
        |    5 * 72057594037927936
        |      + CAST(floor((lat_c + 90.0) / 180.0 * 32.0) AS BIGINT) * 268435456
        |      + CAST(floor((lng_c + 180.0) / 360.0 * 64.0) AS BIGINT) AS ccell
        |  FROM gc
        |)""".stripMargin)(
      """SELECT g.gage_id, min(p.hand) AS hand_min, count(*) AS n_samples
        |FROM g48 g JOIN (SELECT pid, hand,
        |    5 * 72057594037927936
        |      + CAST(floor((lat + 90.0) / 180.0 * 32.0) AS BIGINT) * 268435456
        |      + CAST(floor((lng + 180.0) / 360.0 * 64.0) AS BIGINT) AS ccell
        |  FROM pts) p ON p.ccell = g.ccell
        |GROUP BY g.gage_id""".stripMargin),

    "q47_knn_mode" -> withCtes(pts, asg,
      """gc AS (
        |  SELECT hydroid,
        |    (CAST(floor(hydroid / 144) AS BIGINT) + CAST(0.5 AS DOUBLE)) * CAST(1.25 AS DOUBLE)
        |      - CAST(90.0 AS DOUBLE) AS lat_c,
        |    ((hydroid % 144) + CAST(0.5 AS DOUBLE)) * CAST(2.5 AS DOUBLE)
        |      - CAST(180.0 AS DOUBLE) AS lng_c
        |  FROM (SELECT 199 * x AS hydroid FROM generate_series(0, 104) t(x))
        |)""".stripMargin,
      """d AS (
        |  SELECT p.pid, gc.hydroid,
        |    (p.lat - gc.lat_c) * (p.lat - gc.lat_c) + (p.lng - gc.lng_c) * (p.lng - gc.lng_c) AS d2
        |  FROM (SELECT DISTINCT pid, lat, lng FROM pts) p CROSS JOIN gc
        |  WHERE (p.lat - gc.lat_c) * (p.lat - gc.lat_c) + (p.lng - gc.lng_c) * (p.lng - gc.lng_c) <= 25.0
        |)""".stripMargin,
      "m AS (SELECT pid, min(d2) AS md FROM d GROUP BY pid)",
      """nnf AS (
        |  SELECT d.pid, min(d.hydroid) AS nn
        |  FROM d JOIN m ON d.pid = m.pid AND d.d2 = m.md GROUP BY d.pid
        |)""".stripMargin,
      """votes AS (
        |  SELECT a.hydroid, n.nn, count(*) AS votes
        |  FROM asg a JOIN nnf n ON a.pid = n.pid GROUP BY a.hydroid, n.nn
        |)""".stripMargin,
      """tot AS (
        |  SELECT hydroid, max(votes) AS mx, CAST(sum(votes) AS BIGINT) AS n_votes
        |  FROM votes GROUP BY hydroid
        |)""".stripMargin)(
      """SELECT v.hydroid, min(CASE WHEN v.votes = t.mx THEN v.nn END) AS gage_mode,
        |  t.mx AS mode_votes, t.n_votes
        |FROM votes v JOIN tot t ON v.hydroid = t.hydroid
        |GROUP BY v.hydroid, t.mx, t.n_votes""".stripMargin),

    "q46_unit_status" -> withCtes(pts, asg,
      """hagg AS (
        |  SELECT lpad(CAST(CAST(floor(floor(hydroid / 144) / 8) * 18 + floor((hydroid % 144) / 8) AS BIGINT) AS VARCHAR), 8, '0') AS huc8,
        |    count(*) AS n_pts,
        |    count(CASE WHEN hydroid % 97 <> 0 THEN 1 END) AS n_ok
        |  FROM asg GROUP BY 1
        |)""".stripMargin)(
      """SELECT u.huc8,
        |  CAST(CASE WHEN a.huc8 IS NULL THEN 60 WHEN a.n_ok = 0 THEN 64 ELSE 0 END AS INT) AS status,
        |  coalesce(a.n_pts, 0) AS n_pts, coalesce(a.n_ok, 0) AS n_ok
        |FROM (SELECT lpad(CAST(x.x * 18 + y.x AS VARCHAR), 8, '0') AS huc8
        |      FROM generate_series(0, 17) x(x), generate_series(0, 17) y(x)) u
        |LEFT JOIN hagg a ON u.huc8 = a.huc8""".stripMargin),

    "q45_catfim" -> withCtes(ht, fc, stg)(
      """SELECT hydroid, stage_m,
        |  CASE WHEN stage_m >= t_action + CAST(2.5 AS DOUBLE) THEN 'major'
        |       WHEN stage_m >= t_action + CAST(1.0 AS DOUBLE) THEN 'moderate'
        |       WHEN stage_m >= t_action THEN 'action'
        |       ELSE 'none' END AS category
        |FROM (SELECT hydroid, stage_m,
        |        CAST(1.0 AS DOUBLE) + (hydroid % 4) * CAST(0.5 AS DOUBLE) AS t_action
        |      FROM stg)""".stripMargin),

    "q52_bankfull" -> withCtes(srcg, bfq)(
      """SELECT hydroid, stage_bankfull, volume_bankfull, bedarea_bankfull,
        |  surfarea_bankfull, qdiff_bankfull FROM bfq""".stripMargin),

    "q53_subdiv" -> withCtes(Seq(srcg, bfq,
      """sd0 AS (
        |  SELECT s.hydroid, s.stage, s.length_km, s.slope, s.channel_n, s.overbank_n,
        |    s.volume, s.bed_area, b.stage_bankfull, b.volume_bankfull,
        |    b.bedarea_bankfull, b.surfarea_bankfull,
        |    CASE WHEN s.stage <= b.stage_bankfull THEN s.volume
        |         ELSE b.volume_bankfull + (s.stage - b.stage_bankfull) * b.surfarea_bankfull
        |    END AS vol_chan,
        |    CASE WHEN s.stage <= b.stage_bankfull THEN s.bed_area ELSE b.bedarea_bankfull END AS bed_chan
        |  FROM srcg s JOIN bfq b ON s.hydroid = b.hydroid
        |  WHERE s.hydroid % 7 = 3
        |)""".stripMargin,
      """sd1 AS (
        |  SELECT *,
        |    CASE WHEN stage <= stage_bankfull THEN bed_chan / length_km / CAST(1000.0 AS DOUBLE)
        |         ELSE bed_chan / length_km / CAST(1000.0 AS DOUBLE)
        |              + (stage - stage_bankfull) * CAST(2.0 AS DOUBLE)
        |    END AS wp_chan,
        |    CASE WHEN stage > stage_bankfull THEN volume - vol_chan ELSE CAST(0.0 AS DOUBLE) END AS vol_ob,
        |    CASE WHEN stage > stage_bankfull THEN bed_area - bed_chan ELSE CAST(0.0 AS DOUBLE) END AS bed_ob,
        |    vol_chan / length_km / CAST(1000.0 AS DOUBLE) AS wa_chan
        |  FROM sd0
        |)""".stripMargin,
      """sd2 AS (
        |  SELECT *,
        |    bed_ob / length_km / CAST(1000.0 AS DOUBLE) AS wp_ob,
        |    CASE WHEN wp_chan > CAST(0.0 AS DOUBLE) THEN wa_chan / wp_chan ELSE CAST(0.0 AS DOUBLE) END AS hr_chan,
        |    vol_ob / length_km / CAST(1000.0 AS DOUBLE) AS wa_ob
        |  FROM sd1
        |)""".stripMargin,
      """sd3 AS (
        |  SELECT *, CASE WHEN wp_ob > CAST(0.0 AS DOUBLE) THEN wa_ob / wp_ob ELSE CAST(0.0 AS DOUBLE) END AS hr_ob
        |  FROM sd2
        |)""".stripMargin,
      """sd4 AS (
        |  SELECT *,
        |    CASE WHEN hr_chan > CAST(0.0 AS DOUBLE) THEN hr_chan * hr_chan ELSE CAST(1.0 AS DOUBLE) END AS x2c,
        |    CASE WHEN hr_ob > CAST(0.0 AS DOUBLE) THEN hr_ob * hr_ob ELSE CAST(1.0 AS DOUBLE) END AS x2o
        |  FROM sd3
        |)""".stripMargin) ++ newtonCtes: _*)(
      """SELECT hydroid, stage, vol_chan, q_chan, q_ob, q_chan + q_ob AS q_subdiv
        |FROM (SELECT hydroid, stage, vol_chan,
        |        CASE WHEN hr_chan > CAST(0.0 AS DOUBLE)
        |             THEN wa_chan * yc * sqrt(slope) / channel_n ELSE CAST(0.0 AS DOUBLE) END AS q_chan,
        |        CASE WHEN hr_ob > CAST(0.0 AS DOUBLE)
        |             THEN wa_ob * yo * sqrt(slope) / overbank_n ELSE CAST(0.0 AS DOUBLE) END AS q_ob
        |      FROM i8)""".stripMargin),

    "q54_roughness" -> withCtes(srcg, obsu, obsq, coefq,
      """medq AS (
        |  SELECT hydroid, sum(coef) / count(*) AS calb_hydroid
        |  FROM (SELECT hydroid, coef,
        |          row_number() OVER (PARTITION BY hydroid ORDER BY coef) AS rn,
        |          count(*) OVER (PARTITION BY hydroid) AS n
        |        FROM coefq
        |        WHERE qsrc > CAST(0.0 AS DOUBLE)
        |          AND chn < CAST(0.8 AS DOUBLE) AND chn > CAST(0.001 AS DOUBLE)
        |          AND obn < CAST(0.8 AS DOUBLE) AND obn > CAST(0.001 AS DOUBLE))
        |  WHERE rn = floor((n + 1) / 2.0) OR rn = floor((n + 2) / 2.0)
        |  GROUP BY hydroid
        |)""".stripMargin,
      """grpq AS (
        |  SELECT fg, sum(calb_hydroid) / count(*) AS calb_featgrp
        |  FROM (SELECT hydroid - hydroid % 2 AS fg, calb_hydroid FROM medq)
        |  GROUP BY fg
        |)""".stripMargin)(
      """SELECT u.hydroid, u.stage, u.discharge_cms AS precalb_cms,
        |  coalesce(m.calb_hydroid, g.calb_featgrp) AS calb_coef_final,
        |  CASE WHEN coalesce(m.calb_hydroid, g.calb_featgrp) IS NULL THEN u.discharge_cms
        |       WHEN u.discharge_cms = CAST(0.0 AS DOUBLE) THEN CAST(0.0 AS DOUBLE)
        |       ELSE u.discharge_cms / coalesce(m.calb_hydroid, g.calb_featgrp)
        |  END AS discharge_calb,
        |  CASE WHEN coalesce(m.calb_hydroid, g.calb_featgrp) IS NOT NULL THEN 'True' ELSE 'False' END AS calb_applied
        |FROM srcg u
        |LEFT JOIN medq m ON u.hydroid = m.hydroid
        |LEFT JOIN grpq g ON u.hydroid - u.hydroid % 2 = g.fg
        |WHERE u.hydroid % 23 < 4 AND u.i % 7 = 0""".stripMargin),

    "q55_catfim_flow" -> withCtes(ht, fc,
      """sites AS (
        |  SELECT hydroid, m.m AS m,
        |    CASE WHEN m.m = 0 THEN 'action' WHEN m.m = 1 THEN 'minor'
        |         WHEN m.m = 2 THEN 'moderate' WHEN m.m = 3 THEN 'major'
        |         ELSE 'record' END AS magnitude,
        |    (((hydroid * 53 + 11) % 4000) / 10.0 + CAST(5.0 AS DOUBLE))
        |      * (CAST(1.0 AS DOUBLE) + m.m * CAST(0.75 AS DOUBLE)) AS discharge
        |  FROM (SELECT a.x * 144 + b.x AS hydroid
        |        FROM generate_series(0, 143) a(x), generate_series(0, 143) b(x)),
        |       generate_series(0, 4) m(m)
        |  WHERE hydroid % 41 = 0 AND hydroid % 97 <> 0
        |)""".stripMargin,
      """cstg AS (
        |  SELECT hydroid, m, magnitude, discharge,
        |    CASE WHEN max(CASE WHEN discharge_cms <= discharge THEN stage END) IS NULL THEN min(stage)
        |         WHEN min(CASE WHEN discharge_cms > discharge THEN stage END) IS NULL THEN max(stage)
        |         ELSE max(CASE WHEN discharge_cms <= discharge THEN stage END)
        |            + (max(discharge) - max(CASE WHEN discharge_cms <= discharge THEN discharge_cms END))
        |            * (min(CASE WHEN discharge_cms > discharge THEN stage END)
        |               - max(CASE WHEN discharge_cms <= discharge THEN stage END))
        |            / (min(CASE WHEN discharge_cms > discharge THEN discharge_cms END)
        |               - max(CASE WHEN discharge_cms <= discharge THEN discharge_cms END))
        |    END AS stage_m
        |  FROM (SELECT s.hydroid, s.m, s.magnitude, s.discharge, ht.stage, ht.discharge_cms
        |        FROM ht JOIN sites s ON ht.hydroid = s.hydroid)
        |  GROUP BY hydroid, m, magnitude, discharge
        |)""".stripMargin)(
      """SELECT c.hydroid, c.magnitude, c.discharge AS mag_flow, c.stage_m,
        |  CASE WHEN f.q_now >= c.discharge THEN 1 ELSE 0 END AS is_active
        |FROM cstg c
        |JOIN (SELECT feature_id - 1000000 AS hydroid, discharge AS q_now FROM fc) f
        |  ON c.hydroid = f.hydroid""".stripMargin),

    "q65_group_roughness" -> withRecursiveCtes(net, closure, arboAgg, chosenCte, lpCte,
      srcg, obsu, obsq, coefq,
      """medq AS (
        |  SELECT hydroid, sum(coef) / count(*) AS calb_hydroid
        |  FROM (SELECT hydroid, coef,
        |          row_number() OVER (PARTITION BY hydroid ORDER BY coef) AS rn,
        |          count(*) OVER (PARTITION BY hydroid) AS n
        |        FROM coefq
        |        WHERE qsrc > CAST(0.0 AS DOUBLE)
        |          AND chn < CAST(0.8 AS DOUBLE) AND chn > CAST(0.001 AS DOUBLE)
        |          AND obn < CAST(0.8 AS DOUBLE) AND obn > CAST(0.001 AS DOUBLE))
        |  WHERE rn = floor((n + 1) / 2.0) OR rn = floor((n + 2) / 2.0)
        |  GROUP BY hydroid
        |)""".stripMargin,
      """base65 AS (
        |  SELECT l.hydroid, l.branch AS levelpath_id, n.length_km, a.arbolate_km, m.calb_hydroid
        |  FROM lp l JOIN net n ON l.hydroid = n.hydroid
        |  JOIN arbo a ON l.hydroid = a.hydroid
        |  LEFT JOIN medq m ON l.hydroid = m.hydroid
        |)""".stripMargin,
      """w1 AS (
        |  SELECT *,
        |    CASE WHEN calb_hydroid IS NOT NULL THEN 1 ELSE 0 END AS is_calb,
        |    sum(length_km) OVER win AS cumlen,
        |    sum(coalesce(calb_hydroid, CAST(0.0 AS DOUBLE))) OVER win AS cumcoef,
        |    sum(CASE WHEN calb_hydroid IS NOT NULL THEN 1 ELSE 0 END) OVER win AS k
        |  FROM base65
        |  WINDOW win AS (PARTITION BY levelpath_id ORDER BY arbolate_km, hydroid
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)""".stripMargin,
      """w2 AS (
        |  SELECT *, coalesce(lag(is_calb, 1) OVER
        |    (PARTITION BY levelpath_id ORDER BY arbolate_km, hydroid), 0) AS prev_calb
        |  FROM w1
        |)""".stripMargin,
      """w3 AS (
        |  SELECT *, CASE WHEN is_calb = 1 AND prev_calb = 0 THEN 1 ELSE 0 END AS island_start
        |  FROM w2
        |)""".stripMargin,
      """w4 AS (
        |  SELECT *,
        |    last_value(CASE WHEN is_calb = 1 THEN cumlen END IGNORE NULLS) OVER win4 AS e_cumlen,
        |    last_value(CASE WHEN is_calb = 1 THEN cumcoef END IGNORE NULLS) OVER win4 AS e_cumcoef,
        |    last_value(CASE WHEN island_start = 1 THEN cumcoef - calb_hydroid END IGNORE NULLS) OVER win4 AS base_cumcoef,
        |    last_value(CASE WHEN island_start = 1 THEN k - 1 END IGNORE NULLS) OVER win4 AS base_k
        |  FROM w3
        |  WINDOW win4 AS (PARTITION BY levelpath_id ORDER BY arbolate_km, hydroid
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)""".stripMargin)(
      """SELECT hydroid, levelpath_id, CAST(is_calb AS INT) AS is_calb,
        |  CASE WHEN is_calb = 0 THEN cumlen - e_cumlen END AS accum_dist,
        |  CASE WHEN is_calb = 0 AND e_cumlen IS NOT NULL
        |            AND cumlen - e_cumlen < CAST(8.0 AS DOUBLE) AND k - base_k > 1
        |       THEN (e_cumcoef - base_cumcoef) / (k - base_k) END AS group_calb_coef,
        |  coalesce(calb_hydroid,
        |    CASE WHEN is_calb = 0 AND e_cumlen IS NOT NULL
        |              AND cumlen - e_cumlen < CAST(8.0 AS DOUBLE) AND k - base_k > 1
        |         THEN (e_cumcoef - base_cumcoef) / (k - base_k) END) AS calb_final
        |FROM w4""".stripMargin),

    "q70_resample" -> withCtes(pts, asg, ht, fc, stg, til,
      """mos70 AS (
        |  SELECT cell, max(depth) AS depth_max, count(*) AS n_points FROM til GROUP BY cell
        |)""".stripMargin,
      """cen70 AS (
        |  SELECT cell, depth_max, n_points,
        |    (((cell // 268435456) % 268435456) + CAST(0.5 AS DOUBLE)) / 4096.0 * 180.0 - 90.0 AS clat,
        |    ((cell % 268435456) + CAST(0.5 AS DOUBLE)) / 8192.0 * 360.0 - 180.0 AS clng
        |  FROM mos70
        |)""".stripMargin)(
      """SELECT CAST(floor((clat + 90.0 - CAST(0.02 AS DOUBLE)) / 180.0 * 2048.0) AS BIGINT) * 4096
        |    + CAST(floor((clng + 180.0 - CAST(0.02 AS DOUBLE)) / 360.0 * 4096.0) AS BIGINT) AS tcell,
        |  max(depth_max) AS depth_max, count(*) AS n_src,
        |  CAST(sum(n_points) AS BIGINT) AS n_points
        |FROM cen70 GROUP BY 1""".stripMargin),

    "q68_overlay" -> withCtes(mrects,
      """cbx AS (
        |  SELECT hydroid,
        |    CAST(floor(hydroid / 144) AS BIGINT) * CAST(1.25 AS DOUBLE) - CAST(90.0 AS DOUBLE) AS lat_min,
        |    (CAST(floor(hydroid / 144) AS BIGINT) + 1) * CAST(1.25 AS DOUBLE) - CAST(90.0 AS DOUBLE) AS lat_max,
        |    (hydroid % 144) * CAST(2.5 AS DOUBLE) - CAST(180.0 AS DOUBLE) AS lng_min,
        |    ((hydroid % 144) + 1) * CAST(2.5 AS DOUBLE) - CAST(180.0 AS DOUBLE) AS lng_max
        |  FROM (SELECT a.x * 144 + b.x AS hydroid
        |        FROM generate_series(0, 143) a(x), generate_series(0, 143) b(x))
        |)""".stripMargin)(
      """SELECT hydroid, mask_id, ilat * ilng AS inter_deg2
        |FROM (SELECT c.hydroid, m.mask_id,
        |        greatest(CAST(0.0 AS DOUBLE), least(c.lat_max, m.lat_max) - greatest(c.lat_min, m.lat_min)) AS ilat,
        |        greatest(CAST(0.0 AS DOUBLE), least(c.lng_max, m.lng_max) - greatest(c.lng_min, m.lng_min)) AS ilng
        |      FROM cbx c CROSS JOIN mrects m)
        |WHERE ilat > CAST(0.0 AS DOUBLE) AND ilng > CAST(0.0 AS DOUBLE)""".stripMargin),

    "q69_tile_pyramid" -> withCtes(pts, asg, ht, fc, stg, til, mos,
      """wetm AS (
        |  SELECT cell, CAST(CASE WHEN depth_max > 0.0 THEN 1 ELSE 0 END AS INT) AS wet FROM mos
        |)""".stripMargin)(
      """SELECT 10 AS res,
        |  10 * 72057594037927936 + (((cell // 268435456) % 268435456) >> 2) * 268435456
        |    + ((cell % 268435456) >> 2) AS tile,
        |  count(*) AS n_cells, CAST(sum(wet) AS BIGINT) AS n_wet
        |FROM wetm GROUP BY 2
        |UNION ALL
        |SELECT 8 AS res,
        |  8 * 72057594037927936 + (((cell // 268435456) % 268435456) >> 4) * 268435456
        |    + ((cell % 268435456) >> 4) AS tile,
        |  count(*) AS n_cells, CAST(sum(wet) AS BIGINT) AS n_wet
        |FROM wetm GROUP BY 2
        |UNION ALL
        |SELECT 6 AS res,
        |  6 * 72057594037927936 + (((cell // 268435456) % 268435456) >> 6) * 268435456
        |    + ((cell % 268435456) >> 6) AS tile,
        |  count(*) AS n_cells, CAST(sum(wet) AS BIGINT) AS n_wet
        |FROM wetm GROUP BY 2""".stripMargin),

    "q67_catfim_intervals" -> withCtes(
      """iv AS (
        |  SELECT hydroid, m.m AS m,
        |    CAST(1.0 AS DOUBLE) + (hydroid % 4) * CAST(0.5 AS DOUBLE)
        |      + m.m * ((hydroid % 3) * CAST(1.5 AS DOUBLE)) AS t,
        |    CAST(1.0 AS DOUBLE) + (hydroid % 4) * CAST(0.5 AS DOUBLE)
        |      + (m.m + 1) * ((hydroid % 3) * CAST(1.5 AS DOUBLE)) AS t_next
        |  FROM (SELECT a.x * 144 + b.x AS hydroid
        |        FROM generate_series(0, 143) a(x), generate_series(0, 143) b(x)),
        |       generate_series(0, 3) m(m)
        |  WHERE hydroid % 41 = 0 AND hydroid % 97 <> 0
        |)""".stripMargin,
      """bounds AS (
        |  SELECT hydroid, m,
        |    CAST(floor(t) + CASE WHEN t = floor(t) THEN 1 ELSE 2 END AS BIGINT) AS lo,
        |    CASE WHEN m < 3 THEN CAST(floor(t_next) AS BIGINT)
        |         ELSE CAST(floor(t) + CASE WHEN t = floor(t) THEN 1 ELSE 2 END AS BIGINT) + 5
        |    END AS hi
        |  FROM iv
        |)""".stripMargin)(
      """SELECT hydroid,
        |  CASE WHEN m = 0 THEN 'action' WHEN m = 1 THEN 'minor'
        |       WHEN m = 2 THEN 'moderate' ELSE 'major' END AS category,
        |  v.v AS interval_stage
        |FROM bounds CROSS JOIN generate_series(0, 30) v(v)
        |WHERE hi - 1 >= lo AND v.v >= lo AND v.v <= hi - 1""".stripMargin),

    "q66_bathymetry" -> {
      val newton = {
        val seed = "ib0 AS (SELECT *, sqrt(sqrt(x2b)) AS yb FROM b4)"
        val steps = (1 to 8).map(k =>
          s"ib$k AS (SELECT * REPLACE ((CAST(2.0 AS DOUBLE) * yb + x2b / (yb * yb)) / CAST(3.0 AS DOUBLE) AS yb) FROM ib${k - 1})")
        seed +: steps
      }
      withCtes(Seq(srcg,
        """bathyd AS (
          |  SELECT hydroid,
          |    ((hydroid * 29 + 5) % 500) / 10.0 AS missing_xs,
          |    ((hydroid * 17 + 3) % 200) / 10.0 AS missing_wp
          |  FROM (SELECT a.x * 144 + b.x AS hydroid
          |        FROM generate_series(0, 143) a(x), generate_series(0, 143) b(x))
          |  WHERE hydroid % 13 = 0
          |)""".stripMargin,
        """b0 AS (
          |  SELECT s.hydroid, s.stage, s.length_km, s.slope, s.channel_n,
          |    s.volume, s.bed_area, b.missing_xs, b.missing_wp,
          |    coalesce(b.missing_xs, CAST(0.0 AS DOUBLE)) AS mxs,
          |    coalesce(b.missing_wp, CAST(0.0 AS DOUBLE)) AS mwp
          |  FROM srcg s LEFT JOIN bathyd b ON s.hydroid = b.hydroid
          |  WHERE s.hydroid % 5 = 2 AND s.i % 7 = 0
          |)""".stripMargin,
        """b1 AS (
          |  SELECT *,
          |    volume + mxs * (length_km * CAST(1000.0 AS DOUBLE)) AS vol_adj,
          |    bed_area + mwp * (length_km * CAST(1000.0 AS DOUBLE)) AS bed_adj,
          |    bed_area / length_km / CAST(1000.0 AS DOUBLE) + mwp AS wp_adj
          |  FROM b0
          |)""".stripMargin,
        """b2 AS (
          |  SELECT *, vol_adj / length_km / CAST(1000.0 AS DOUBLE) AS wa_adj FROM b1
          |)""".stripMargin,
        """b3 AS (
          |  SELECT *, CASE WHEN wp_adj > CAST(0.0 AS DOUBLE) THEN wa_adj / wp_adj ELSE CAST(0.0 AS DOUBLE) END AS hr_adj
          |  FROM b2
          |)""".stripMargin,
        """b4 AS (
          |  SELECT *, CASE WHEN hr_adj > CAST(0.0 AS DOUBLE) THEN hr_adj * hr_adj ELSE CAST(1.0 AS DOUBLE) END AS x2b
          |  FROM b3
          |)""".stripMargin) ++ newton: _*)(
        """SELECT hydroid, stage,
          |  CASE WHEN missing_xs IS NOT NULL THEN 'USACE eHydro' ELSE '' END AS bathy_source,
          |  vol_adj,
          |  CASE WHEN stage = CAST(0.0 AS DOUBLE) THEN CAST(0.0 AS DOUBLE)
          |       WHEN hr_adj > CAST(0.0 AS DOUBLE) THEN wa_adj * yb * sqrt(slope) / channel_n
          |       ELSE CAST(0.0 AS DOUBLE) END AS discharge_adj
          |FROM ib8""".stripMargin)
    },

    "q56_master_metrics" -> {
      def d(c: String) = s"CAST($c AS DOUBLE)"
      def metricsSql(tn: String, fn: String, fp: String, tp: String): String =
        s"""${d(tp)} / (${d(tp)} + ${d(fp)} + ${d(fn)}) AS csi,
           |  ${d(tp)} / (${d(tp)} + ${d(fn)}) AS tpr,
           |  ${d(fp)} / (${d(tp)} + ${d(fp)}) AS far,
           |  (${d(tp)} * ${d(tn)} - ${d(fp)} * ${d(fn)})
           |    / sqrt((${d(tp)} + ${d(fp)}) * (${d(tp)} + ${d(fn)}) * (${d(tn)} + ${d(fp)}) * (${d(tn)} + ${d(fn)})) AS mcc,
           |  (${d(tp)} + ${d(tn)}) / (${d(tp)} + ${d(tn)} + ${d(fp)} + ${d(fn)}) AS acc,
           |  ${d(tp)} * 2 / (${d(tp)} * 2 + ${d(fp)} + ${d(fn)}) AS f1,
           |  (${d(tp)} + ${d(fp)}) / (${d(tp)} + ${d(fn)}) AS bias""".stripMargin
      val row = "((cell // 268435456) % 268435456)"
      val colc = "(cell % 268435456)"
      def agrSql(k: Int, w: Int, t: String): String =
        s"""CASE WHEN ($row * 29 + $colc * 13) % 50 = 0 THEN 4
           |     ELSE (CASE WHEN depth_max > $t THEN 1 ELSE 0 END) * 2
           |          + CASE WHEN ($row * 31 + $colc * 17 + $k) % 10 < $w THEN 1 ELSE 0 END
           |END""".stripMargin
      val counts = graft.ops.Agreement.MasterCombos.flatMap { case (src, mag, k, w, t) =>
        val tSql = if (t == 0.5) "CAST(0.5 AS DOUBLE)" else "CAST(0.0 AS DOUBLE)"
        (0 to 4).map(c =>
          s"count(CASE WHEN ${agrSql(k, w, tSql)} = $c THEN 1 END) AS c${c}_${src}_$mag")
      }.mkString(",\n    ")
      val unions = graft.ops.Agreement.MasterCombos.map { case (src, mag, _, _, _) =>
        def c(i: Int) = s"c${i}_${src}_$mag"
        s"""SELECT 'graft_r2' AS version, '$src' AS benchmark_source, '$mag' AS magnitude,
           |  ${c(0)} AS tn, ${c(1)} AS fn, ${c(2)} AS fp, ${c(3)} AS tp, ${c(4)} AS masked,
           |  ${metricsSql(c(0), c(1), c(2), c(3))}
           |FROM c56""".stripMargin
      }.mkString("\nUNION ALL\n")
      withCtes(pts, asg, ht, fc, stg, til, mos,
        s"c56 AS (\n  SELECT ${counts}\n  FROM mos\n)")(unions)
    },

    "q57_src_json" -> withCtes(srcg)(
      "SELECT hydroid, CAST(i AS INT) AS i, stage, discharge_cms FROM srcg WHERE hydroid % 199 = 0"),

    "q64_extent_components" -> withRecursiveCtes(pts, asg, ht, fc, stg, til,
      mos58, wet58, nbr58,
      """reach64 AS (
        |  SELECT cell, clazz, cell AS lbl FROM wet58
        |  UNION
        |  SELECT e.cell, e.clazz, r.lbl
        |  FROM reach64 r JOIN nbr58 e ON e.ncell = r.cell AND e.clazz = r.clazz
        |)""".stripMargin,
      """comp64 AS (
        |  SELECT cell, clazz, min(lbl) AS comp FROM reach64 GROUP BY cell, clazz
        |)""".stripMargin)(
      """SELECT clazz AS hydroid, comp, count(*) AS n_cells
        |FROM comp64 GROUP BY clazz, comp""".stripMargin),

    "q59_full_metrics" -> {
      def d(c: String) = s"CAST($c AS DOUBLE)"
      val tot = "CAST(tn + fn + fp + tp AS DOUBLE)"
      val aref = s"(${d("tp")} + ${d("fp")}) * (${d("tp")} + ${d("fn")}) / $tot"
      val area = "CAST(2.5E7 AS DOUBLE)"
      val km = "CAST(1000000.0 AS DOUBLE)"
      withCtes(pts, asg, ht, fc, stg, til, mos, mrects, agr,
        """c AS (
          |  SELECT count(CASE WHEN agreement = 0 THEN 1 END) AS tn,
          |         count(CASE WHEN agreement = 1 THEN 1 END) AS fn,
          |         count(CASE WHEN agreement = 2 THEN 1 END) AS fp,
          |         count(CASE WHEN agreement = 3 THEN 1 END) AS tp,
          |         count(CASE WHEN agreement = 4 THEN 1 END) AS masked
          |  FROM agr
          |)""".stripMargin)(
        s"""SELECT tn, fn, fp, tp, masked,
           |  tn + fn + fp + tp AS contingency_tot_count,
           |  ${d("tp")} / (${d("tp")} + ${d("fp")} + ${d("fn")}) AS csi,
           |  ${d("tp")} / (${d("tp")} + ${d("fn")}) AS tpr,
           |  ${d("fp")} / (${d("tp")} + ${d("fp")}) AS far,
           |  (${d("tp")} * ${d("tn")} - ${d("fp")} * ${d("fn")})
           |    / sqrt((${d("tp")} + ${d("fp")}) * (${d("tp")} + ${d("fn")}) * (${d("tn")} + ${d("fp")}) * (${d("tn")} + ${d("fn")})) AS mcc,
           |  (${d("tp")} + ${d("tn")}) / (${d("tp")} + ${d("tn")} + ${d("fp")} + ${d("fn")}) AS acc,
           |  ${d("tp")} * 2 / (${d("tp")} * 2 + ${d("fp")} + ${d("fn")}) AS f1,
           |  (${d("tp")} + ${d("fp")}) / (${d("tp")} + ${d("fn")}) AS bias,
           |  ${d("tn")} / (${d("tn")} + ${d("fp")}) AS tnr,
           |  ${d("fn")} / (${d("fn")} + ${d("tp")}) AS pnd,
           |  ${d("tp")} / (${d("tp")} + ${d("fp")}) AS ppv,
           |  ${d("tn")} / (${d("tn")} + ${d("fn")}) AS npv,
           |  (${d("tp")} / (${d("tp")} + ${d("fn")}) + ${d("tn")} / (${d("tn")} + ${d("fp")})) / CAST(2.0 AS DOUBLE) AS bal_acc,
           |  (${d("tp")} + ${d("fn")}) / $tot AS prevalence,
           |  (${d("tp")} - $aref) / (${d("tp")} + ${d("fp")} + ${d("fn")} - $aref) AS equitable_threat_score,
           |  ${d("fp")} / (${d("fp")} + ${d("tn")}) AS fpr,
           |  ${d("fn")} / (${d("fn")} + ${d("tn")}) AS false_omission_rate,
           |  sqrt((${d("tp")} / (${d("tp")} + ${d("fp")})) * (${d("tp")} / (${d("tp")} + ${d("fn")}))) AS fowlkes_mallows_index,
           |  (${d("tp")} / (${d("tp")} + ${d("fn")})) / (${d("fp")} / (${d("fp")} + ${d("tn")})) AS positive_likelihood_ratio,
           |  (${d("fn")} / (${d("fn")} + ${d("tp")})) / (${d("tn")} / (${d("tn")} + ${d("fp")})) AS negative_likelihood_ratio,
           |  (sqrt((${d("tp")} / (${d("tp")} + ${d("fn")})) * (${d("fp")} / (${d("fp")} + ${d("tn")}))) - ${d("fp")} / (${d("fp")} + ${d("tn")}))
           |    / (${d("tp")} / (${d("tp")} + ${d("fn")}) - ${d("fp")} / (${d("fp")} + ${d("tn")})) AS prevalence_threshold,
           |  ${d("tp")} / $tot * 100 AS tp_perc,
           |  ${d("fp")} / $tot * 100 AS fp_perc,
           |  ${d("tn")} / $tot * 100 AS tn_perc,
           |  ${d("fn")} / $tot * 100 AS fn_perc,
           |  (${d("tp")} + ${d("fp")}) / $tot * 100 AS pred_positive_perc,
           |  (${d("tn")} + ${d("fn")}) / $tot * 100 AS pred_negative_perc,
           |  (${d("tp")} + ${d("fn")}) / $tot * 100 AS obs_positive_perc,
           |  (${d("tn")} + ${d("fp")}) / $tot * 100 AS obs_negative_perc,
           |  (${d("tp")} + ${d("fp")}) / $tot * 100 - (${d("tp")} + ${d("fn")}) / $tot * 100 AS positive_diff_perc,
           |  ${d("masked")} / ($tot + ${d("masked")}) * 100 AS masked_perc,
           |  $area AS cell_area_m2,
           |  ${d("tp")} * $area / $km AS tp_area_km2,
           |  ${d("fp")} * $area / $km AS fp_area_km2,
           |  ${d("tn")} * $area / $km AS tn_area_km2,
           |  ${d("fn")} * $area / $km AS fn_area_km2,
           |  $tot * $area / $km AS contingency_tot_area_km2,
           |  (${d("tp")} + ${d("fp")}) * $area / $km AS pred_positive_area_km2,
           |  (${d("tn")} + ${d("fn")}) * $area / $km AS pred_negative_area_km2,
           |  (${d("tp")} + ${d("fn")}) * $area / $km AS obs_positive_area_km2,
           |  (${d("tn")} + ${d("fp")}) * $area / $km AS obs_negative_area_km2,
           |  (${d("tp")} + ${d("fp")}) * $area / $km - (${d("tp")} + ${d("fn")}) * $area / $km AS positive_diff_area_km2
           |FROM c""".stripMargin)
    },

    "q60_calb_pivot" -> withCtes(srcg, obsu, obsq, coefq)(
      """SELECT hydroid,
        |  min(CASE WHEN j = 0 THEN coef END) AS coef_j0,
        |  min(CASE WHEN j = 1 THEN coef END) AS coef_j1,
        |  min(CASE WHEN j = 2 THEN coef END) AS coef_j2
        |FROM coefq WHERE qsrc > CAST(0.0 AS DOUBLE)
        |GROUP BY hydroid""".stripMargin),

    "q58_extent_dissolve" -> withCtes(pts, asg, ht, fc, stg, til, mos58, wet58, nbr58,
      """deg58 AS (
        |  SELECT n.cell, n.clazz, count(w.cell) AS nn
        |  FROM nbr58 n LEFT JOIN wet58 w ON n.ncell = w.cell AND n.clazz = w.clazz
        |  GROUP BY n.cell, n.clazz
        |)""".stripMargin)(
      """SELECT clazz AS hydroid, count(*) AS n_cells,
        |  count(CASE WHEN nn < 4 THEN 1 END) AS n_boundary,
        |  min((((cell // 268435456) % 268435456) + CAST(0.5 AS DOUBLE)) / 4096.0 * 180.0 - 90.0) AS lat_min,
        |  max((((cell // 268435456) % 268435456) + CAST(0.5 AS DOUBLE)) / 4096.0 * 180.0 - 90.0) AS lat_max,
        |  min(((cell % 268435456) + CAST(0.5 AS DOUBLE)) / 8192.0 * 360.0 - 180.0) AS lng_min,
        |  max(((cell % 268435456) + CAST(0.5 AS DOUBLE)) / 8192.0 * 360.0 - 180.0) AS lng_max,
        |  count(*) * (CAST(180.0 AS DOUBLE) / 4096.0) * (CAST(360.0 AS DOUBLE) / 8192.0) AS area_deg2
        |FROM deg58 GROUP BY clazz""".stripMargin),

    "q63_thalweg_adjust" -> withCtes(pts, asg,
      """zc AS (
        |  SELECT pid, hydroid, hand, lat, lng,
        |    (CAST(floor(hydroid / 144) AS BIGINT) + CAST(0.5 AS DOUBLE)) * CAST(1.25 AS DOUBLE)
        |      - CAST(90.0 AS DOUBLE) AS lat_c,
        |    ((hydroid % 144) + CAST(0.5 AS DOUBLE)) * CAST(2.5 AS DOUBLE)
        |      - CAST(180.0 AS DOUBLE) AS lng_c
        |  FROM asg
        |)""".stripMargin,
      """zcost AS (
        |  SELECT *, (lat - lat_c) * (lat - lat_c) + (lng - lng_c) * (lng - lng_c) AS cost
        |  FROM zc
        |)""".stripMargin,
      """zmin AS (
        |  SELECT hydroid, min(hand) AS zmin
        |  FROM zcost WHERE cost <= CAST(1.0 AS DOUBLE) AND hand > CAST(0.0 AS DOUBLE)
        |  GROUP BY hydroid
        |)""".stripMargin)(
      """SELECT z.pid, z.hydroid, z.hand, m.zmin,
        |  CAST(CASE WHEN z.pid % 11 = 0 THEN 1 ELSE 0 END AS INT) AS thalweg,
        |  CASE WHEN z.pid % 11 = 0 AND m.zmin IS NOT NULL AND m.zmin < z.hand
        |            AND z.hand - m.zmin <= CAST(2.0 AS DOUBLE)
        |       THEN m.zmin ELSE z.hand END AS hand_adj
        |FROM zcost z LEFT JOIN zmin m ON z.hydroid = m.hydroid""".stripMargin),

    "q61_map_funcs" ->
      """SELECT l_orderkey, CAST(count(*) AS INT) AS n_lines,
        |  min(CASE WHEN l_linenumber = 1 THEN qty END) AS qty_line1,
        |  arg_max(qty, l_linenumber) AS qty_maxline
        |FROM (SELECT l_orderkey, l_linenumber, max(l_quantity) AS qty
        |      FROM lineitem GROUP BY l_orderkey, l_linenumber)
        |GROUP BY l_orderkey""".stripMargin,

    "q62_hof_dot" -> withCtes(qt)(
      """SELECT a.vec_id, CAST(sum(a.q * b.q) AS BIGINT) AS dot
        |FROM qt a JOIN qt b ON a.vec_id = b.vec_id - 1 AND a.pos = b.pos
        |GROUP BY a.vec_id""".stripMargin),

    "q73_para_dedup" -> withCtes(corpus, wrd, par, kpt)(
      """SELECT doc_id, count(*) AS n_paras, CAST(sum(kept) AS BIGINT) AS n_kept,
        |  string_agg(para, ' | ' ORDER BY para_id) FILTER (WHERE kept = 1) AS clean_text
        |FROM kpt GROUP BY doc_id""".stripMargin),

    "q74_url_canon" -> withCtes(flog,
      """cano AS (
        |  SELECT pid, fetch_ts,
        |    lower(split_part(split_part(raw, '#', 1), '?', 1)) AS canon
        |  FROM flog
        |)""".stripMargin)(
      """SELECT canon, split_part(canon, '/', 3) AS host,
        |  count(*) AS n_fetches, max(fetch_ts) AS latest_ts, min(pid) AS first_pid
        |FROM cano GROUP BY canon, split_part(canon, '/', 3)""".stripMargin),

    "q75_catfim_sites" -> withCtes(ht,
      """sites AS (
        |  SELECT hydroid, m.m AS m,
        |    CASE WHEN m.m = 0 THEN 'action' WHEN m.m = 1 THEN 'minor'
        |         WHEN m.m = 2 THEN 'moderate' WHEN m.m = 3 THEN 'major'
        |         ELSE 'record' END AS magnitude,
        |    (((hydroid * 53 + 11) % 4000) / 10.0 + CAST(5.0 AS DOUBLE))
        |      * (CAST(1.0 AS DOUBLE) + m.m * CAST(0.75 AS DOUBLE)) AS discharge
        |  FROM (SELECT a.x * 144 + b.x AS hydroid
        |        FROM generate_series(0, 143) a(x), generate_series(0, 143) b(x)),
        |       generate_series(0, 4) m(m)
        |  WHERE hydroid % 41 = 0 AND hydroid % 97 <> 0
        |)""".stripMargin,
      """thrq AS (
        |  SELECT hydroid, count(*) AS n_mags,
        |    max(CASE WHEN magnitude = 'record' THEN discharge END) AS record_flow
        |  FROM sites GROUP BY hydroid
        |)""".stripMargin,
      "qmx AS (SELECT hydroid, max(discharge_cms) AS q_curve_max FROM ht GROUP BY hydroid)")(
      """SELECT t.hydroid, t.n_mags, t.record_flow, q.q_curve_max,
        |  CAST(CASE WHEN t.record_flow <= q.q_curve_max THEN 1 ELSE 0 END AS INT) AS flow_in_range,
        |  CAST(CASE WHEN t.hydroid % 11 <> 3 THEN 1 ELSE 0 END AS INT) AS coord_ok,
        |  CAST(CASE WHEN t.record_flow <= q.q_curve_max AND t.hydroid % 11 <> 3
        |            AND t.n_mags = 5 THEN 1 ELSE 0 END AS INT) AS accepted
        |FROM thrq t JOIN qmx q ON t.hydroid = q.hydroid""".stripMargin),

    "q76_merge_upsert" -> withCtes(fc,
      """upd AS (
        |  SELECT feature_id, discharge * CAST(1.2 AS DOUBLE) AS discharge
        |  FROM fc WHERE feature_id % 13 = 0
        |  UNION ALL
        |  SELECT 2000000 + x AS feature_id, ((x * 91 + 3) % 5000) / 10.0 AS discharge
        |  FROM generate_series(0, 99) t(x)
        |)""".stripMargin)(
      """SELECT f.feature_id, f.discharge, 'base' AS src FROM fc f
        |WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.feature_id = f.feature_id)
        |UNION ALL
        |SELECT feature_id, discharge, 'upd' AS src FROM upd""".stripMargin),

    "q77_compaction" -> withCtes(pts, asg,
      s"""sz AS (
         |  SELECT $huc8FromHydroid AS huc8, count(*) AS n_rows
         |  FROM asg GROUP BY 1
         |)""".stripMargin,
      """cum AS (
        |  SELECT huc8, n_rows,
        |    CAST(COALESCE(sum(n_rows) OVER (ORDER BY huc8
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        |  FROM sz
        |)""".stripMargin)(
      """SELECT huc8, n_rows, cum_before,
        |  CAST(floor(CAST(cum_before AS DOUBLE) / CAST(4096.0 AS DOUBLE)) AS BIGINT) AS task
        |FROM cum""".stripMargin),

    "q78_pii_scrub" -> withCtes(corpus,
      """drt AS (
        |  SELECT doc_id,
        |    text || repeat(' user' || CAST(doc_id AS VARCHAR) || '@mail'
        |                     || CAST(doc_id % 7 AS VARCHAR) || '.example.com',
        |                   CAST(doc_id % 3 AS INT))
        |         || (CASE WHEN doc_id % 5 = 0
        |               THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |               ELSE '' END) AS dirty
        |  FROM corpus
        |)""".stripMargin)(
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(dirty, '[a-z0-9]+@[a-z0-9.]+')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(dirty, '\+1-555-[0-9]{4}')) AS INT) AS n_phones,
        |  regexp_replace(regexp_replace(dirty, '[a-z0-9]+@[a-z0-9.]+', '<EMAIL>', 'g'),
        |                 '\+1-555-[0-9]{4}', '<PHONE>', 'g') AS clean
        |FROM drt""".stripMargin),

    "q87_composite" -> withCtes(pts, asg, ht, fc, stg, til,
      "fcms AS (SELECT feature_id, discharge * CAST(1.5 AS DOUBLE) AS discharge FROM fc)",
      """stgms AS (
        |  SELECT hydroid,
        |    CASE WHEN max(CASE WHEN discharge_cms <= discharge THEN stage END) IS NULL THEN min(stage)
        |         WHEN min(CASE WHEN discharge_cms > discharge THEN stage END) IS NULL THEN max(stage)
        |         ELSE max(CASE WHEN discharge_cms <= discharge THEN stage END)
        |            + (max(discharge) - max(CASE WHEN discharge_cms <= discharge THEN discharge_cms END))
        |            * (min(CASE WHEN discharge_cms > discharge THEN stage END)
        |               - max(CASE WHEN discharge_cms <= discharge THEN stage END))
        |            / (min(CASE WHEN discharge_cms > discharge THEN discharge_cms END)
        |               - max(CASE WHEN discharge_cms <= discharge THEN discharge_cms END))
        |    END AS stage_m
        |  FROM (SELECT ht.hydroid, ht.stage, ht.discharge_cms, f.discharge
        |        FROM ht JOIN fcms f ON ht.feature_id = f.feature_id
        |        WHERE ht.hydroid % 97 <> 0)
        |  GROUP BY hydroid
        |)""".stripMargin,
      """tilms AS (
        |  SELECT a.cell,
        |    CASE WHEN s.stage_m - a.hand > 0.0 THEN s.stage_m - a.hand ELSE 0.0 END AS depth
        |  FROM asg a JOIN stgms s ON a.hydroid = s.hydroid
        |  WHERE (a.hydroid % 8) + 1 >= 5
        |)""".stripMargin,
      """uc AS (
        |  SELECT cell, depth, 0 AS ms FROM til
        |  UNION ALL
        |  SELECT cell, depth, 1 AS ms FROM tilms
        |)""".stripMargin)(
      """SELECT cell, depth_comp, depth_ms, depth_fr, n_ms,
        |  CAST(CASE WHEN depth_ms IS NOT NULL AND depth_ms > depth_fr
        |       THEN 1 ELSE 0 END AS INT) AS ms_wins
        |FROM (SELECT cell, max(depth) AS depth_comp,
        |        max(CASE WHEN ms = 1 THEN depth END) AS depth_ms,
        |        max(CASE WHEN ms = 0 THEN depth END) AS depth_fr,
        |        count(CASE WHEN ms = 1 THEN 1 END) AS n_ms
        |      FROM uc GROUP BY cell)""".stripMargin),

    "q86_gage_snap" -> withCtes(net,
      """rch AS (
        |  SELECT hydroid,
        |    (CAST(floor(hydroid / 144) AS BIGINT) + CAST(0.5 AS DOUBLE)) * CAST(1.25 AS DOUBLE)
        |      - CAST(90.0 AS DOUBLE) AS from_lat,
        |    ((hydroid % 144) + CAST(0.5 AS DOUBLE)) * CAST(2.5 AS DOUBLE)
        |      - CAST(180.0 AS DOUBLE) AS from_lng,
        |    CASE WHEN to_node < 0
        |      THEN (CAST(floor(hydroid / 144) AS BIGINT) + CAST(0.5 AS DOUBLE)) * CAST(1.25 AS DOUBLE)
        |           - CAST(90.0 AS DOUBLE) - CAST(1.25 AS DOUBLE)
        |      ELSE (CAST(floor(to_node / 144) AS BIGINT) + CAST(0.5 AS DOUBLE)) * CAST(1.25 AS DOUBLE)
        |           - CAST(90.0 AS DOUBLE) END AS to_lat,
        |    CASE WHEN to_node < 0
        |      THEN ((hydroid % 144) + CAST(0.5 AS DOUBLE)) * CAST(2.5 AS DOUBLE) - CAST(180.0 AS DOUBLE)
        |      ELSE ((to_node % 144) + CAST(0.5 AS DOUBLE)) * CAST(2.5 AS DOUBLE) - CAST(180.0 AS DOUBLE)
        |    END AS to_lng
        |  FROM net WHERE hydroid % 199 = 0
        |)""".stripMargin,
      """gsn AS (
        |  SELECT hydroid, from_lat, from_lng, to_lat, to_lng,
        |    from_lat + ((hydroid * 13) % 100) / 1000.0 - CAST(0.05 AS DOUBLE) AS glat,
        |    from_lng + ((hydroid * 29) % 100) / 1000.0 - CAST(0.05 AS DOUBLE) AS glng
        |  FROM rch
        |)""".stripMargin,
      """prj AS (
        |  SELECT *, least(greatest(
        |    ((glng - from_lng) * (to_lng - from_lng) + (glat - from_lat) * (to_lat - from_lat))
        |      / ((to_lng - from_lng) * (to_lng - from_lng) + (to_lat - from_lat) * (to_lat - from_lat)),
        |    CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE)) AS t
        |  FROM gsn
        |)""".stripMargin,
      """snp AS (
        |  SELECT hydroid, glat, glng, t,
        |    from_lat + t * (to_lat - from_lat) AS snap_lat,
        |    from_lng + t * (to_lng - from_lng) AS snap_lng
        |  FROM prj
        |)""".stripMargin)(
      """SELECT hydroid, glat, glng, t, snap_lat, snap_lng,
        |  (glng - snap_lng) * (glng - snap_lng) + (glat - snap_lat) * (glat - snap_lat) AS dist2
        |FROM snp""".stripMargin),

    "q85_json_props" ->
      """SELECT event_type, count(*) AS n,
        |  min(CAST(json_extract_string(props, '$.k') AS INT)) AS k_min,
        |  max(CAST(json_extract_string(props, '$.k') AS INT)) AS k_max,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_sum
        |FROM events GROUP BY event_type""".stripMargin,

    "q84_frame_sample" -> withCtes(
      """pgs AS (
        |  SELECT CAST(doc_id AS BIGINT) AS pid, text, length(text) AS n_bytes
        |  FROM documents
        |)""".stripMargin,
      """frq AS (
        |  SELECT pid, k.k AS k, text,
        |    1 + k.k * CAST(floor((n_bytes - 24) / CAST(4.0 AS DOUBLE)) AS BIGINT) AS off
        |  FROM pgs CROSS JOIN generate_series(0, 3) k(k)
        |  WHERE n_bytes >= 24
        |)""".stripMargin)(
      """SELECT pid, CAST(k AS INT) AS k, CAST(off AS INT) AS off,
        |  md5(substring(text, CAST(off AS INT), 24)) AS frame_md5
        |FROM frq""".stripMargin),

    "q83_incr_dedup" -> withCtes(corpus, sh, mh, bnd, prs,
      "iprs AS (SELECT doc_a, doc_b FROM prs WHERE doc_a < 1000000 AND doc_b >= 1000000)",
      """dsh AS (SELECT DISTINCT doc_id,
        |  CAST('0x' || substring(md5(sh), 1, 15) AS BIGINT) AS hb FROM sh)""".stripMargin,
      "sz AS (SELECT doc_id, count(*) AS sz FROM dsh GROUP BY doc_id)",
      """inter AS (
        |  SELECT p2.doc_a, p2.doc_b, count(*) AS i
        |  FROM iprs p2 JOIN dsh a ON p2.doc_a = a.doc_id
        |  JOIN dsh b ON p2.doc_b = b.doc_id AND a.hb = b.hb
        |  GROUP BY p2.doc_a, p2.doc_b
        |)""".stripMargin,
      """ij AS (
        |  SELECT p.doc_a, p.doc_b,
        |    CAST(coalesce(i.i, 0) AS DOUBLE) / CAST(sa.sz + sb.sz - coalesce(i.i, 0) AS DOUBLE) AS jaccard
        |  FROM iprs p
        |  LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
        |  JOIN sz sa ON sa.doc_id = p.doc_a
        |  JOIN sz sb ON sb.doc_id = p.doc_b
        |)""".stripMargin)(
      """SELECT doc_b AS doc_id, doc_a AS match_doc, jaccard,
        |  CAST(CASE WHEN jaccard >= CAST(0.9 AS DOUBLE) THEN 1 ELSE 0 END AS INT) AS is_dup
        |FROM (SELECT doc_a, doc_b, jaccard,
        |        row_number() OVER (PARTITION BY doc_b ORDER BY jaccard DESC, doc_a ASC) AS rn
        |      FROM ij)
        |WHERE rn = 1""".stripMargin),

    "q82_sierra" -> withCtes(ht,
      """usgk AS (
        |  SELECT hydroid, stage,
        |    (hydroid % 9 + 2) * stage
        |      + ((hydroid % 4) * CAST(0.3 AS DOUBLE) + CAST(0.4 AS DOUBLE)) * stage * stage AS discharge_cms
        |  FROM (SELECT h.hydroid, s.i * CAST(0.3048 AS DOUBLE) AS stage
        |        FROM (SELECT a.x * 144 + b.x AS hydroid
        |              FROM generate_series(0, 143) a(x), generate_series(0, 143) b(x)) h,
        |             generate_series(0, 83) s(i))
        |  WHERE hydroid % 199 = 0 AND hydroid % 97 <> 0
        |)""".stripMargin,
      """rcr AS (
        |  SELECT hydroid,
        |    CASE k.k WHEN 0 THEN 2 WHEN 1 THEN 5 WHEN 2 THEN 10 WHEN 3 THEN 25
        |         ELSE 50 END AS interval,
        |    (((hydroid * 37 + 19) % 3000) / 10.0 + CAST(10.0 AS DOUBLE))
        |      * (CAST(1.0 AS DOUBLE) + k.k * CAST(0.8 AS DOUBLE)) AS discharge
        |  FROM (SELECT a.x * 144 + b.x AS hydroid
        |        FROM generate_series(0, 143) a(x), generate_series(0, 143) b(x)),
        |       generate_series(0, 4) k(k)
        |  WHERE hydroid % 199 = 0 AND hydroid % 97 <> 0
        |)""".stripMargin,
      """fstg AS (
        |  SELECT hydroid, interval, discharge,
        |    CASE WHEN max(CASE WHEN discharge_cms <= discharge THEN stage END) IS NULL THEN min(stage)
        |         WHEN min(CASE WHEN discharge_cms > discharge THEN stage END) IS NULL THEN max(stage)
        |         ELSE max(CASE WHEN discharge_cms <= discharge THEN stage END)
        |            + (max(discharge) - max(CASE WHEN discharge_cms <= discharge THEN discharge_cms END))
        |            * (min(CASE WHEN discharge_cms > discharge THEN stage END)
        |               - max(CASE WHEN discharge_cms <= discharge THEN stage END))
        |            / (min(CASE WHEN discharge_cms > discharge THEN discharge_cms END)
        |               - max(CASE WHEN discharge_cms <= discharge THEN discharge_cms END))
        |    END AS fim_stage
        |  FROM (SELECT h.hydroid, h.stage, h.discharge_cms, r.interval, r.discharge
        |        FROM ht h JOIN rcr r ON h.hydroid = r.hydroid
        |        WHERE h.hydroid % 199 = 0 AND h.hydroid % 97 <> 0)
        |  GROUP BY hydroid, interval, discharge
        |)""".stripMargin,
      """ustg AS (
        |  SELECT hydroid, interval, discharge,
        |    CASE WHEN max(CASE WHEN discharge_cms <= discharge THEN stage END) IS NULL THEN min(stage)
        |         WHEN min(CASE WHEN discharge_cms > discharge THEN stage END) IS NULL THEN max(stage)
        |         ELSE max(CASE WHEN discharge_cms <= discharge THEN stage END)
        |            + (max(discharge) - max(CASE WHEN discharge_cms <= discharge THEN discharge_cms END))
        |            * (min(CASE WHEN discharge_cms > discharge THEN stage END)
        |               - max(CASE WHEN discharge_cms <= discharge THEN stage END))
        |            / (min(CASE WHEN discharge_cms > discharge THEN discharge_cms END)
        |               - max(CASE WHEN discharge_cms <= discharge THEN discharge_cms END))
        |    END AS usgs_stage
        |  FROM (SELECT u.hydroid, u.stage, u.discharge_cms, r.interval, r.discharge
        |        FROM usgk u JOIN rcr r ON u.hydroid = r.hydroid)
        |  GROUP BY hydroid, interval, discharge
        |)""".stripMargin)(
      """SELECT f.hydroid, f.interval, f.discharge AS flow, f.fim_stage,
        |  u.usgs_stage, f.fim_stage - u.usgs_stage AS elev_diff
        |FROM fstg f JOIN ustg u
        |  ON f.hydroid = u.hydroid AND f.interval = u.interval
        |     AND f.discharge = u.discharge""".stripMargin),

    "q80_kmeans_step" -> withCtes(qt, nrm,
      "cvq AS (SELECT vec_id AS cid, pos, q AS cq FROM qt WHERE vec_id % 50 = 7)",
      "cnr AS (SELECT vec_id AS cid, n2 AS cn2 FROM nrm WHERE vec_id % 50 = 7)",
      """kmd AS (
        |  SELECT a.vec_id, c.cid, CAST(sum(a.q * c.cq) AS BIGINT) AS dot
        |  FROM qt a JOIN cvq c ON a.pos = c.pos
        |  GROUP BY a.vec_id, c.cid
        |)""".stripMargin,
      """kms AS (
        |  SELECT d.vec_id, d.cid, CAST(d.dot AS DOUBLE) / sqrt(CAST(n.cn2 AS DOUBLE)) AS score
        |  FROM kmd d JOIN cnr n ON d.cid = n.cid
        |)""".stripMargin,
      """kma AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid ASC) AS rn
        |    FROM kms) WHERE rn = 1
        |)""".stripMargin)(
      """SELECT a.cid, q.pos, CAST(sum(q.q) AS BIGINT) AS sum_q,
        |  count(*) AS n_members
        |FROM qt q JOIN kma a ON q.vec_id = a.vec_id
        |GROUP BY a.cid, q.pos""".stripMargin),

    "q81_stratified" -> withCtes(corpus,
      """shash AS (
        |  SELECT doc_id, lang,
        |    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM corpus
        |)""".stripMargin,
      """srank AS (
        |  SELECT doc_id, lang, h,
        |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk,
        |    CAST(ceil(count(*) OVER (PARTITION BY lang) * CAST(0.3 AS DOUBLE)) AS BIGINT) AS quota
        |  FROM shash
        |)""".stripMargin)(
      "SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk, quota FROM srank WHERE rk <= quota"),

    "q79_rating_graft_full" -> withCtes(net, ht,
      """shrt AS (
        |  SELECT hydroid, to_node FROM net
        |  WHERE ((hydroid % 13) + 5) * CAST(0.4 AS DOUBLE) < CAST(3.0 AS DOUBLE)
        |    AND length_km < CAST(1.25 AS DOUBLE)
        |    AND hydroid % 97 <> 0
        |)""".stripMargin,
      """upw AS (
        |  SELECT hydroid, up_id AS up_donor FROM (
        |    SELECT s.hydroid, u.hydroid AS up_id,
        |      row_number() OVER (PARTITION BY s.hydroid
        |        ORDER BY u.order_ DESC, u.hydroid) AS rn
        |    FROM shrt s JOIN net u ON u.to_node = s.hydroid)
        |  WHERE rn = 1
        |)""".stripMargin,
      """don AS (
        |  SELECT s.hydroid,
        |    COALESCE(w.up_donor, CASE WHEN s.to_node >= 0 THEN s.to_node END,
        |             s.hydroid) AS donor_id,
        |    CASE WHEN w.up_donor IS NOT NULL THEN 'upstream'
        |         WHEN s.to_node >= 0 THEN 'downstream' ELSE 'self' END AS rule
        |  FROM shrt s LEFT JOIN upw w ON s.hydroid = w.hydroid
        |)""".stripMargin,
      """kn AS (
        |  SELECT hydroid AS donor_id, i, stage, discharge_cms AS discharge_grafted
        |  FROM (SELECT hydroid, stage, discharge_cms,
        |          CAST(round(stage / CAST(0.3048 AS DOUBLE)) AS BIGINT) AS i
        |        FROM ht)
        |  WHERE i % 21 = 0
        |)""".stripMargin)(
      """SELECT d.hydroid, d.donor_id, d.rule, k.i, k.stage, k.discharge_grafted
        |FROM don d JOIN kn k ON k.donor_id = d.donor_id""".stripMargin),

    "q41_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |  count(*) AS n, sum(l_quantity) / count(*) AS avg_qty,
        |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin
  )
}
