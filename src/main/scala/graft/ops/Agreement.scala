package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geo.Cells

/** Evaluation lifecycle — SURVEY.md §3.3 (`tools/tools_shared_functions.py`):
  * predicted vs benchmark extents per cell → agreement class → contingency
  * metrics. Class coding follows the reference
  * (`tools_shared_functions.py:400-406,442-455`):
  *   0 TN / 1 FN / 2 FP / 3 TP / 4 masked.
  *
  * The synthetic benchmark extent is a pure function of the cell id (row/col
  * hash), mirroring the driver-side oracle bit-for-bit; masked cells are the
  * exclusion-polygon analog (`tools_shared_functions.py:457-509`).
  */
object Agreement {

  def cellRow(cell: Column): Column =
    shiftright(cell, Cells.ROW_BITS.toInt)
      .bitwiseAND(lit((1L << (Cells.RES_BITS - Cells.ROW_BITS)) - 1L))
  def cellCol(cell: Column): Column = cell.bitwiseAND(lit((1L << Cells.ROW_BITS) - 1L))

  /** Benchmark wet flag per cell (0/1) — deterministic extent synth. */
  def benchWet(cell: Column): Column =
    ((cellRow(cell) * 31 + cellCol(cell) * 17) % 10 < 4).cast("int")

  /** Legacy hash exclusion mask — kept for the multi-benchmark combos (q56),
    * where every combo derives a synthetic extent family from the cell id.
    * The evaluation path proper ([[agreement]]) masks by REAL exclusion
    * polygons ([[graft.synth.Synth.maskCover]]). */
  def isMasked(cell: Column): Column =
    (cellRow(cell) * 29 + cellCol(cell) * 13) % 50 === 0

  /** mosaic + `mskd` flag (1 ⇔ the cell centroid falls inside any exclusion
    * mask polygon): centroid → coarse-cell broadcast join against the mask
    * cover → codegen'd PIP, re-aggregated per cell. The mosaic is already
    * hash-partitioned by cell from its own groupBy and the mask join is
    * broadcast, so the re-aggregation reuses that partitioning — no extra
    * exchange at any scale. All non-cell columns are carried through with
    * max() (they are constant per cell). */
  def withMaskFlag(spark: SparkSession, mosaic: DataFrame): DataFrame = {
    import graft.geo.{Cells, PointInPolygon}
    val wc = mosaic
      .withColumn("clat", Cells.centroidLatCol(col("cell"), Cells.BaseRes))
      .withColumn("clng", Cells.centroidLngCol(col("cell"), Cells.BaseRes))
      .withColumn("ccell", Cells.cellToParentCol(col("cell"), Cells.BaseRes, Cells.CoarseRes))
    val carried = mosaic.columns.filter(_ != "cell").map(c => max(col(c)).as(c))
    val mskd = max(when(col("ring").isNotNull &&
      PointInPolygon.stContains(col("ring"), col("clng"), col("clat")), 1).otherwise(0)).as("mskd")
    wc.join(broadcast(graft.synth.Synth.maskCover(spark)), Seq("ccell"), "left")
      .groupBy(col("cell"))
      .agg((carried :+ mskd).head, (carried :+ mskd).tail: _*)
  }

  /** mosaic(cell, depth_max, …) → (cell, agreement), with the exclusion-mask
    * class (4) decided by the REAL mask polygons
    * (`tools_shared_functions.py:457-509`), not a hash. */
  def agreement(spark: SparkSession, mosaic: DataFrame): DataFrame =
    withMaskFlag(spark, mosaic).select(
      col("cell"),
      when(col("mskd") === 1, lit(4))
        .otherwise((col("depth_max") > 0).cast("int") * 2 + benchWet(col("cell")))
        .cast("int").as("agreement"))

  /** The reference's DEFAULT pairing dictionary
    * (`tools_shared_functions.py:442-455`): (candidate_class,
    * benchmark_class) → agreement, candidate 4 = masked-by-polygon. The
    * nodata rows ((·,10)/(10,·) → 10) are omitted — the synthetic mosaic has
    * no nodata cells; [[graft.ops.Terrain]] owns nodata semantics. */
  val DefaultPairing: Seq[(Int, Int, Int)] =
    Seq((0, 0, 0), (0, 1, 1), (1, 0, 2), (1, 1, 3), (4, 0, 4), (4, 1, 4))

  /** A non-default multi-threshold pairing (q114): candidate is a 3-class
    * depth bin (0 dry / 1 shallow / 2 deep), agreement 0-5 = bin×bench,
    * 6 = masked — the "custom class pairing" a gval user would pass. */
  val DepthClassPairing: Seq[(Int, Int, Int)] =
    Seq((0, 0, 0), (0, 1, 1), (1, 0, 2), (1, 1, 3), (2, 0, 4), (2, 1, 5),
      (4, 0, 6), (4, 1, 6))

  def pairingTable(spark: SparkSession, pairing: Seq[(Int, Int, Int)]): DataFrame = {
    import spark.implicits._
    pairing.toDF("cand", "bench", "agreement")
  }

  /** gval-style agreement from an ARBITRARY pairing dictionary — the
    * generalized form of [[agreement]]: the (candidate, benchmark) →
    * agreement map arrives as a TABLE (broadcast, a handful of rows), not a
    * hard-coded `when`-ladder, so a user with a custom multi-class pairing
    * passes data instead of extending Scala
    * (`tools_shared_functions.py:442-455`'s configurable
    * `pairing_dictionary`). Masking stays faithful to the reference: the
    * candidate class is overwritten to 4 by the exclusion polygons and the
    * pairing table itself decides what (4, ·) maps to. With
    * [[DefaultPairing]] and a wet/dry candidate this reproduces
    * [[agreement]] bit-for-bit (spec-asserted). */
  def agreementWithPairing(spark: SparkSession, mosaic: DataFrame,
      candidateClass: Column, pairing: DataFrame): DataFrame =
    withMaskFlag(spark, mosaic)
      .select(col("cell"),
        when(col("mskd") === 1, lit(4)).otherwise(candidateClass).cast("int").as("cand"),
        benchWet(col("cell")).cast("int").as("bench"))
      .join(broadcast(pairing), Seq("cand", "bench"), "left")
      .select(col("cell"), col("agreement").cast("int").as("agreement"))

  /** The reference's printworthy metric family from contingency-count
    * columns (`tools_shared_functions.py:1666-1689`): CSI, TPR, FAR, MCC,
    * ACC, F1, plus bias — exact double arithmetic from BIGINT counts,
    * shared by [[metrics]] (q12) and [[masterMetrics]] (q56). */
  def metricCols(tnC: Column, fnC: Column, fpC: Column, tpC: Column): Seq[Column] = {
    val tp = tpC.cast("double"); val tn = tnC.cast("double")
    val fp = fpC.cast("double"); val fn = fnC.cast("double")
    Seq(
      (tp / (tp + fp + fn)).as("csi"),
      (tp / (tp + fn)).as("tpr"),
      (fp / (tp + fp)).as("far"),
      ((tp * tn - fp * fn) /
        sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))).as("mcc"),
      ((tp + tn) / (tp + tn + fp + fn)).as("acc"),
      (tp * 2 / (tp * 2 + fp + fn)).as("f1"),
      ((tp + fp) / (tp + fn)).as("bias"))
  }

  /** Contingency counts + metrics for one agreement raster (q12). */
  def metrics(agreementDf: DataFrame): DataFrame = {
    val counted = agreementDf.agg(
      count(when(col("agreement") === 0, 1)).as("tn"),
      count(when(col("agreement") === 1, 1)).as("fn"),
      count(when(col("agreement") === 2, 1)).as("fp"),
      count(when(col("agreement") === 3, 1)).as("tp"),
      count(when(col("agreement") === 4, 1)).as("masked"))
    counted.select(Seq(col("tn"), col("fn"), col("fp"), col("tp"), col("masked")) ++
      metricCols(col("tn"), col("fn"), col("fp"), col("tp")): _*)
  }

  /** The COMPLETE master-CSV metric family (q59) — every derived statistic
    * the reference writes per evaluation row
    * (`tools/tools_shared_functions.py:277-380`,
    * `tools/synthesize_test_cases.py:48-88`): the 7 headline metrics plus
    * TNR/PND/PPV/NPV/Bal_ACC/prevalence/equitable-threat-score, the percent
    * family, and the cell-area → km² family. All exact double arithmetic
    * from the BIGINT contingency counts. */
  def fullMetrics(agreementDf: DataFrame, cellAreaM2: Double = 25000000.0): DataFrame = {
    val counted = agreementDf.agg(
      count(when(col("agreement") === 0, 1)).as("tn"),
      count(when(col("agreement") === 1, 1)).as("fn"),
      count(when(col("agreement") === 2, 1)).as("fp"),
      count(when(col("agreement") === 3, 1)).as("tp"),
      count(when(col("agreement") === 4, 1)).as("masked"))
    val tp = col("tp").cast("double"); val tn = col("tn").cast("double")
    val fp = col("fp").cast("double"); val fn = col("fn").cast("double")
    val totD = (col("tn") + col("fn") + col("fp") + col("tp")).cast("double")
    val aref = (tp + fp) * (tp + fn) / totD
    val a = lit(cellAreaM2)
    counted.select(Seq(
      col("tn"), col("fn"), col("fp"), col("tp"), col("masked"),
      (col("tn") + col("fn") + col("fp") + col("tp")).as("contingency_tot_count")) ++
      metricCols(col("tn"), col("fn"), col("fp"), col("tp")) ++ Seq(
      (tn / (tn + fp)).as("tnr"),
      (fn / (fn + tp)).as("pnd"),
      (tp / (tp + fp)).as("ppv"),
      (tn / (tn + fn)).as("npv"),
      ((tp / (tp + fn) + tn / (tn + fp)) / lit(2.0)).as("bal_acc"),
      ((tp + fn) / totD).as("prevalence"),
      ((tp - aref) / (tp + fp + fn - aref)).as("equitable_threat_score"),
      // the remaining gval CatStats keys (reference stat dict,
      // tools_shared_functions.py:277-380) — canonical definitions
      (fp / (fp + tn)).as("fpr"),
      (fn / (fn + tn)).as("false_omission_rate"),
      sqrt((tp / (tp + fp)) * (tp / (tp + fn))).as("fowlkes_mallows_index"),
      ((tp / (tp + fn)) / (fp / (fp + tn))).as("positive_likelihood_ratio"),
      ((fn / (fn + tp)) / (tn / (tn + fp))).as("negative_likelihood_ratio"),
      ((sqrt((tp / (tp + fn)) * (fp / (fp + tn))) - fp / (fp + tn))
        / (tp / (tp + fn) - fp / (fp + tn))).as("prevalence_threshold"),
      (tp / totD * 100).as("tp_perc"),
      (fp / totD * 100).as("fp_perc"),
      (tn / totD * 100).as("tn_perc"),
      (fn / totD * 100).as("fn_perc"),
      ((tp + fp) / totD * 100).as("pred_positive_perc"),
      ((tn + fn) / totD * 100).as("pred_negative_perc"),
      ((tp + fn) / totD * 100).as("obs_positive_perc"),
      ((tn + fp) / totD * 100).as("obs_negative_perc"),
      ((tp + fp) / totD * 100 - (tp + fn) / totD * 100).as("positive_diff_perc"),
      (col("masked").cast("double") / (totD + col("masked").cast("double")) * 100).as("masked_perc"),
      a.as("cell_area_m2"),
      (tp * a / lit(1000000.0)).as("tp_area_km2"),
      (fp * a / lit(1000000.0)).as("fp_area_km2"),
      (tn * a / lit(1000000.0)).as("tn_area_km2"),
      (fn * a / lit(1000000.0)).as("fn_area_km2"),
      (totD * a / lit(1000000.0)).as("contingency_tot_area_km2"),
      ((tp + fp) * a / lit(1000000.0)).as("pred_positive_area_km2"),
      ((tn + fn) * a / lit(1000000.0)).as("pred_negative_area_km2"),
      ((tp + fn) * a / lit(1000000.0)).as("obs_positive_area_km2"),
      ((tn + fp) * a / lit(1000000.0)).as("obs_negative_area_km2"),
      ((tp + fp) * a / lit(1000000.0) - (tp + fn) * a / lit(1000000.0)).as("positive_diff_area_km2")): _*)
  }

  /** Multi-benchmark master-metrics assembly (q56) — the engine's form of
    * `tools/synthesize_test_cases.py:22-293`: evaluate the SAME predicted
    * mosaic against every (benchmark_source × magnitude) combination and melt
    * the per-combo contingency metrics into one long master table (one row
    * per combo, metric columns — the master CSV's shape). Each synthetic
    * benchmark source shifts the extent hash; each magnitude widens the
    * benchmark extent and moves the predicted wet threshold. ONE pass over
    * the mosaic: all combos are conditional aggregates of the same scan. */
  val MasterCombos: Seq[(String, String, Int, Int, Double)] = Seq(
    // (benchmark_source, magnitude, hash shift k, bench width w, pred threshold t)
    ("ble", "100yr", 0, 4, 0.5),
    ("ble", "500yr", 0, 6, 0.0),
    ("nws", "100yr", 7, 4, 0.5),
    ("nws", "500yr", 7, 6, 0.0))

  def comboAgreement(cell: Column, depthMax: Column, k: Int, w: Int, t: Double): Column =
    when(isMasked(cell), lit(4))
      .otherwise((depthMax > t).cast("int") * 2 +
        ((cellRow(cell) * 31 + cellCol(cell) * 17 + k) % 10 < w).cast("int"))
      .cast("int")

  def masterMetrics(mosaic: DataFrame, version: String = "graft_r2"): DataFrame = {
    val countExprs = MasterCombos.flatMap { case (src, mag, k, w, t) =>
      val agr = comboAgreement(col("cell"), col("depth_max"), k, w, t)
      (0 to 4).map(c => count(when(agr === c, 1)).as(s"c${c}_${src}_$mag"))
    }
    val counted = mosaic.agg(countExprs.head, countExprs.tail: _*)
    val rows = MasterCombos.map { case (src, mag, _, _, _) =>
      def c(i: Int) = col(s"c${i}_${src}_$mag")
      struct(Seq(lit(version).as("version"), lit(src).as("benchmark_source"),
        lit(mag).as("magnitude"), c(0).as("tn"), c(1).as("fn"), c(2).as("fp"),
        c(3).as("tp"), c(4).as("masked")) ++
        metricCols(c(0), c(1), c(2), c(3)): _*)
    }
    counted.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Per-catchment alpha metrics (q95) — the "FIM Performance" layer,
    * `tools/test_case_by_hydro_id.py:29-34` (docstring: "approximately 20 to
    * 32 hours to complete"), `:45-50` (zonal_stats of the agreement raster
    * per catchment polygon), `:57-133` (`compute_stats_from_contingency_
    * table` per HydroID), `:203-283` (drive over benchmark × magnitude).
    *
    * The reference rasterizes every catchment polygon against every
    * agreement raster for every (benchmark, magnitude) combo, serially per
    * HUC. Here the whole workload is ONE plan: the zonal key (owning
    * catchment of each cell centroid) comes from the broadcast PIP join the
    * engine already uses for points, all 4 combos × 5 agreement classes
    * become conditional counts in a single partial-aggregating HashAggregate
    * keyed on hydroid, and the melt + metric algebra is per-row expression
    * work on the counted rows (one row per catchment × combo).
    *
    * Metric semantics follow the reference exactly: a metric whose
    * denominator is zero is NA (`compute_stats_from_contingency_table`
    * returns 'NA' on ZeroDivisionError) → NULL here, and catchment×combo
    * groups with an all-masked/empty contingency total are dropped
    * (`test_case_by_hydro_id.py:86-88`). cell_area defaults to the
    * reference's 100 m² (10 m pixels, `:92`). */
  def alphaByHydroId(spark: SparkSession, mosaic: DataFrame,
      cellAreaM2: Double = 100.0): DataFrame = {
    import graft.geo.Cells
    val withGeo = mosaic
      .withColumn("lat", Cells.centroidLatCol(col("cell"), Cells.BaseRes))
      .withColumn("lng", Cells.centroidLngCol(col("cell"), Cells.BaseRes))
      .withColumn("ccell", Cells.cellToParentCol(col("cell"), Cells.BaseRes, Cells.CoarseRes))
    val assigned = SpatialJoin.assign(withGeo, graft.synth.Synth.catchmentCover(spark))
    val countExprs = MasterCombos.flatMap { case (src, mag, k, w, t) =>
      val agr = comboAgreement(col("cell"), col("depth_max"), k, w, t)
      (0 to 4).map(c => count(when(agr === c, 1)).as(s"c${c}_${src}_$mag"))
    }
    val counted = assigned
      .groupBy(col("hydroid").cast("long").as("hydroid"), col("huc8"))
      .agg(countExprs.head, countExprs.tail: _*)
    val rows = MasterCombos.map { case (src, mag, _, _, _) =>
      def c(i: Int) = col(s"c${i}_${src}_$mag")
      struct(lit(src).as("bench"), lit(mag).as("mag"), c(0).as("tn"),
        c(1).as("fn"), c(2).as("fp"), c(3).as("tp"), c(4).as("masked"))
    }
    val melted = counted
      .select(col("hydroid"), col("huc8"), explode(array(rows: _*)).as("r"))
      .select(col("hydroid"), col("huc8"), col("r.*"))
      .filter(col("tn") + col("fn") + col("fp") + col("tp") > 0)
    contingencyMetricSelect(melted,
      Seq(col("hydroid"), col("huc8"), col("bench"), col("mag")), cellAreaM2)
  }

  /** The shared per-row metric projection over contingency-count columns
    * (tn/fn/fp/tp/masked) — NA (NULL) when a metric's denominator is zero,
    * with identical guard conditions in the oracle. Used by
    * [[alphaByHydroId]] (per-catchment grain) and [[aggregateMetrics]]
    * (summed national grain). */
  private def contingencyMetricSelect(melted: DataFrame, keyCols: Seq[Column],
      cellAreaM2: Double): DataFrame = {
    val tp = col("tp").cast("double"); val tn = col("tn").cast("double")
    val fp = col("fp").cast("double"); val fn = col("fn").cast("double")
    val totD = (col("tn") + col("fn") + col("fp") + col("tp")).cast("double")
    val aref = (tp + fp) * (tp + fn) / totD
    melted.select(keyCols ++ Seq(
      col("tn"), col("fn"), col("fp"), col("tp"), col("masked"),
      (totD * lit(cellAreaM2) / lit(1000000.0)).as("contingency_tot_area_km2"),
      when(tp + fp + fn =!= 0.0, tp / (tp + fp + fn)).as("csi"),
      when(tp + fp =!= 0.0, fp / (tp + fp)).as("far"),
      when(tp + fn =!= 0.0, tp / (tp + fn)).as("tpr"),
      when(tn + fp =!= 0.0, tn / (tn + fp)).as("tnr"),
      when(tp + fp =!= 0.0, tp / (tp + fp)).as("ppv"),
      when(tn + fn =!= 0.0, tn / (tn + fn)).as("npv"),
      when((tp + fn) * (tn + fp) =!= 0.0,
        (tp / (tp + fn) + tn / (tn + fp)) / lit(2.0)).as("bal_acc"),
      when((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn) =!= 0.0,
        (tp * tn - fp * fn) /
          sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))).as("mcc"),
      when(tp + fp + fn - aref =!= 0.0,
        (tp - aref) / (tp + fp + fn - aref)).as("equitable_threat_score"),
      ((tp + fn) / totD).as("prevalence"),
      when(tp + fn =!= 0.0, (tp + fp) / (tp + fn)).as("bias"),
      when(tp * 2 + fp + fn =!= 0.0, tp * 2 / (tp * 2 + fp + fn)).as("f1_score"),
      (col("masked").cast("double") / (totD + col("masked").cast("double")) * 100)
        .as("masked_perc")): _*)
  }

  /** National metric rollup (q106) — `tools/aggregate_metrics.py:203-307`:
    * the reference sums the per-test-case contingency-count JSONs per
    * magnitude and recomputes the full metric family over the summed
    * counts (NOT an average of per-case metrics — the counts aggregate,
    * the ratios don't). The engine mirrors that shape exactly: the
    * [[alphaByHydroId]] per-catchment counts are summed per (benchmark,
    * magnitude) — a 20 k-row second-stage aggregate, negligible next to
    * the one fact-table pass both share — and the same guarded metric
    * projection runs over the sums. `n_cases` is the reference's
    * "aggregated metrics over N test cases" count. */
  def aggregateMetrics(spark: SparkSession, mosaic: DataFrame,
      cellAreaM2: Double = 100.0): DataFrame = {
    val summed = alphaByHydroId(spark, mosaic, cellAreaM2)
      .groupBy(col("bench"), col("mag"))
      .agg(sum(col("tn")).as("tn"), sum(col("fn")).as("fn"),
        sum(col("fp")).as("fp"), sum(col("tp")).as("tp"),
        sum(col("masked")).as("masked"), count(lit(1)).as("n_cases"))
    contingencyMetricSelect(summed,
      Seq(col("bench"), col("mag"), col("n_cases")), cellAreaM2)
  }

  /** The 7 headline metric names in [[metricCols]] order, with each stat's
    * regression orientation: +1 bigger-is-better, −1 smaller-is-better,
    * 0 closer-to-one-is-better (bias). */
  val MetricOrientation: Seq[(String, Int)] = Seq(
    "csi" -> 1, "tpr" -> 1, "far" -> -1, "mcc" -> 1, "acc" -> 1, "f1" -> 1, "bias" -> 0)

  /** Version-regression diff of the master metrics (q89) —
    * `tools/tools_shared_functions.py:119-133` (`check_for_regression`): the
    * release gate a FIM user runs every version — every stat of the new
    * build's master-metrics table minus the previous version's, melted one
    * row per (benchmark, magnitude, stat), with a regression verdict per the
    * stat's orientation. The "previous version" is the same evaluation with
    * every predicted-wet threshold raised 0.25 m (a deterministic stand-in
    * for last release's model).
    *
    * Scale shape: ONE pass over the mosaic — both versions' contingency
    * counts are conditional aggregates of the same scan (2 versions × 4
    * combos × 5 classes = 40 counters in one partial-aggregating
    * HashAggregate); the melt + diff is driver-free expression algebra on
    * the single counted row. */
  def versionRegression(mosaic: DataFrame,
      prevThresholdDelta: Double = 0.25): DataFrame = {
    val versions = Seq(("new", 0.0), ("prev", prevThresholdDelta))
    val countExprs = versions.flatMap { case (v, d) =>
      MasterCombos.flatMap { case (src, mag, k, w, t) =>
        val agr = comboAgreement(col("cell"), col("depth_max"), k, w, t + d)
        (0 to 4).map(c => count(when(agr === c, 1)).as(s"c${c}_${src}_${mag}_$v"))
      }
    }
    val counted = mosaic.agg(countExprs.head, countExprs.tail: _*)
    val rows = MasterCombos.flatMap { case (src, mag, _, _, _) =>
      def cs(v: String) = (0 to 4).map(i => col(s"c${i}_${src}_${mag}_$v"))
      val Seq(tnN, fnN, fpN, tpN, _) = cs("new")
      val Seq(tnP, fnP, fpP, tpP, _) = cs("prev")
      val newM = metricCols(tnN, fnN, fpN, tpN)
      val prevM = metricCols(tnP, fnP, fpP, tpP)
      MetricOrientation.zipWithIndex.map { case ((stat, orient), i) =>
        val v = newM(i); val p = prevM(i)
        val regressed = orient match {
          case 1  => (v - p < 0).cast("int")
          case -1 => (v - p > 0).cast("int")
          case 0  => (abs(v - lit(1.0)) > abs(p - lit(1.0))).cast("int")
        }
        struct(lit(src).as("benchmark_source"), lit(mag).as("magnitude"),
          lit(stat).as("stat"), v.as("value"), p.as("value_prev"),
          (v - p).as("diff"), regressed.as("regressed"))
      }
    }
    counted.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }
}
