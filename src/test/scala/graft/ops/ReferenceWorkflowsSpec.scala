package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.pipeline.Inundate
import graft.synth.Synth

/** Behavior gates for the round-3 reference workflows: USGS rating trace
  * (q88), version regression (q89), levee association (q90), bridge heal +
  * flows (q91), manual calibration (q92). Value-level parity is the DuckDB
  * oracle's job; these lock the semantic invariants.
  */
class ReferenceWorkflowsSpec extends SparkTestBase {

  test("rating trace: bounded by 8 km, on-path only, nearest gage wins, lake breaks hold") {
    val rows = Calibration.usgsRatingTrace(spark).collect()
    assert(rows.nonEmpty)
    // one winner per hydroid (nearest-gage-wins resolved)
    assert(rows.map(_.getAs[Int]("hydroid")).distinct.length == rows.length)
    // every trace distance below the cap, positive
    assert(rows.forall { r =>
      val d = r.getAs[Double]("dist_km"); d > 0.0 && d < 8.0
    })
    // a non-lake gage reach is always in its own downstream trace at
    // dist = its own length (unless a nearer gage claimed it — same reach
    // can't be nearer than itself, so the gage must win its own reach)
    val gageRows = rows.filter(r => r.getAs[Int]("hydroid") % 199 == 0)
    assert(gageRows.nonEmpty)
    gageRows.foreach { r =>
      assert(r.getAs[Int]("gage_id") == r.getAs[Int]("hydroid"))
      assert(r.getAs[Int]("dir_down") == 1)
      assert(r.getAs[Double]("dist_km") == StreamNet.lengthOf(r.getAs[Int]("hydroid")))
    }
    // lake reaches never receive a coefficient downstream-inclusively from
    // themselves; any lake hydroid present must have come via the upstream
    // quirk of a DIFFERENT gage — and a lake at the gage empties downstream
    rows.filter(_.getAs[Int]("hydroid") % 97 == 0).foreach { r =>
      assert(r.getAs[Int]("hydroid") != r.getAs[Int]("gage_id"))
    }
  }

  test("version regression: 28 rows, diff = value - value_prev, orientation-aware verdicts") {
    val rows = Agreement.versionRegression(Inundate.run(spark, sf0001)).collect()
    assert(rows.length == 4 * 7)
    rows.foreach { r =>
      val v = r.getAs[Double]("value"); val p = r.getAs[Double]("value_prev")
      assert(r.getAs[Double]("diff") == v - p)
      val reg = r.getAs[Int]("regressed")
      r.getAs[String]("stat") match {
        case "far"  => assert(reg == (if (v - p > 0) 1 else 0))
        case "bias" => assert(reg == (if (math.abs(v - 1) > math.abs(p - 1)) 1 else 0))
        case _      => assert(reg == (if (v - p < 0) 1 else 0))
      }
    }
    // raising the wet threshold must move SOME stat (the versions differ)
    assert(rows.exists(_.getAs[Double]("diff") != 0.0))
  }

  test("levee association: once-crossers dropped, all sides exercised, sides legal") {
    val rows = Levees.associate(spark).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_crossings") != 1L, "a single-crossing pair survived")
      assert(Set("left", "right", "none").contains(r.getAs[String]("levee_side")))
    }
    val sides = rows.map(_.getAs[String]("levee_side")).toSet
    assert(sides == Set("left", "right", "none"),
      s"scene no longer exercises every side branch: $sides")
  }

  test("bridge flows: 75% stage gives <= discharge on monotone curves; unit conversions exact") {
    val rows = Bridges.bridgeFlows(spark, Synth.points(spark, sf0001)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[Double]("threshold_hand")
      assert(r.getAs[Double]("threshold_hand_75") == t * 0.75)
      assert(r.getAs[Double]("threshold_discharge75") <= r.getAs[Double]("threshold_discharge"))
      assert(r.getAs[Double]("threshold_hand_ft") == t * 3.28084)
      assert(r.getAs[Double]("threshold_discharge_cfs") ==
        r.getAs[Double]("threshold_discharge") * 35.3147)
      assert(r.getAs[Long]("n_pts") > 0L)
    }
  }

  test("alpha by hydroid: cell conservation per combo, NA guards, bounded metrics") {
    val mosaic = Inundate.run(spark, sf0001).cache()
    val rows = Agreement.alphaByHydroId(spark, mosaic).collect()
    assert(rows.nonEmpty)
    // every kept group has a positive contingency total (reference drops
    // tot_pop == 0 groups)
    rows.foreach { r =>
      val tot = r.getAs[Long]("tn") + r.getAs[Long]("fn") +
        r.getAs[Long]("fp") + r.getAs[Long]("tp")
      assert(tot > 0)
      val csi = r.getAs[java.lang.Double]("csi")
      if (csi != null) assert(csi >= 0.0 && csi <= 1.0)
      val mp = r.getAs[Double]("masked_perc")
      assert(mp >= 0.0 && mp <= 100.0)
    }
    // conservation: per combo, the per-catchment contingency totals must sum
    // to the number of non-masked cells in the mosaic (each cell belongs to
    // exactly one catchment)
    val combo = rows.filter(r => r.getAs[String]("bench") == "ble" &&
      r.getAs[String]("mag") == "100yr")
    val sumTot = combo.map(r => r.getAs[Long]("tn") + r.getAs[Long]("fn") +
      r.getAs[Long]("fp") + r.getAs[Long]("tp")).sum
    val (_, _, k, w, t) = Agreement.MasterCombos.head
    val nonMasked = mosaic.filter(
      Agreement.comboAgreement(col("cell"), col("depth_max"), k, w, t) =!= 4).count()
    assert(sumTot == nonMasked, s"conservation broke: $sumTot != $nonMasked")
    mosaic.unpersist()
  }

  test("crosswalk eval: both methods per huc, error injection measurably below 1.0") {
    val rows = NetworkEval.crosswalkEval(spark).collect()
    assert(rows.length == 18 * 18 * 2) // every HUC × {intersections, network}
    rows.foreach { r =>
      val c = r.getAs[Long]("correct"); val tot = r.getAs[Long]("total")
      assert(c >= 0 && c <= tot && tot > 0)
      assert(r.getAs[Double]("proportion") == c.toDouble / tot.toDouble)
    }
    def overall(m: String) = {
      val rs = rows.filter(_.getAs[String]("method") == m)
      rs.map(_.getAs[Long]("correct")).sum.toDouble / rs.map(_.getAs[Long]("total")).sum
    }
    // the injected ~9% error must be visible to BOTH methods, but most of
    // the crosswalk is correct
    assert(overall("intersections") < 1.0 && overall("intersections") > 0.5)
    assert(overall("network") < 1.0 && overall("network") > 0.3)
  }

  test("ras2fim rating: gates hold and the selected knot is truly the nearest") {
    val rows = Calibration.ras2fimRating(spark).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("hand") > 0.0)
      assert(r.getAs[Double]("check_variance") < 0.1)
      assert(r.getAs[String]("location_id") == s"xs_${r.getAs[Long]("hydroid")}")
    }
    // nearest-knot property, recomputed independently for a sample
    rows.take(20).foreach { r =>
      val h = r.getAs[Long]("hydroid"); val f = r.getAs[Double]("nwm_recur_flow_cms")
      val qs = (0 until 84).map { i =>
        val s = i * 0.3048
        (h % 9 + 2) * s + ((h % 4) * 0.3 + 0.4) * s * s
      }
      val bestDiff = qs.map(q => math.abs(q - f)).min
      assert(math.abs(r.getAs[Double]("discharge_cms") - f) == bestDiff)
    }
  }

  test("continuity: every row is a 2-way confluence with an exact upstream sum") {
    val rows = NetworkEval.continuity(spark).collect()
    assert(rows.length == 18 * 18 * 7 * 4) // 7 receiving rows × 4 merge columns per HUC
    val qtOf = (h: Long) =>
      if ((h + 1000000L) % 5 != 2) ((h + 1000000L) * 53 + 7) % 9000 else 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("n_up") == 2)
      val h = r.getAs[Long]("hydroid")
      // recompute the two upstream contributors from the merge topology
      val rr = h / 144; val c = h % 144; val lc = c % 8
      val ups = (0 until 8).filter(u => u / 2 == lc)
        .map(u => (rr + 1) * 144 + (c - lc) + u)
      assert(ups.length == 2)
      assert(r.getAs[Double]("expected_discharge") == ups.map(qtOf).sum / 10.0)
      val sape = r.getAs[java.lang.Double]("sape")
      if (r.getAs[Double]("discharge") == 0.0 &&
          r.getAs[Double]("expected_discharge") == 0.0)
        assert(sape == null)
      else assert(sape != null && sape >= 0.0 && sape <= 200.0)
    }
  }

  test("backpool: outlier flag from exact integer stats; trim/clamp only when flagged") {
    val rows = NetworkEval.backpool(spark, Synth.points(spark, sf0001)).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[Int]("flagged") == 1), "scene exercises the trim path")
    assert(rows.exists(_.getAs[Int]("flagged") == 0))
    rows.foreach { r =>
      val len = r.getAs[Double]("length_km")
      if (r.getAs[Int]("flagged") == 1) {
        assert(r.getAs[Double]("trimmed_length_km") == len * 0.75)
        assert(r.getAs[Double]("slope_adj") >= 0.002)
        assert(r.getAs[Double]("slope_adj") >= r.getAs[Double]("slope"))
      } else {
        assert(r.getAs[Double]("trimmed_length_km") == len)
        assert(r.getAs[Double]("slope_adj") == r.getAs[Double]("slope"))
      }
    }
  }

  test("manual calibration: coef < 1 raises discharge, > 1 lowers, null passes through") {
    val rows = Calibration.manualCalibration(spark)
      .filter(col("stage") > 0).limit(50000).collect()
    assert(rows.exists(_.getAs[Int]("calb_applied") == 1))
    assert(rows.exists(_.getAs[Int]("calb_applied") == 0))
    rows.foreach { r =>
      val pre = r.getAs[Double]("postcalb_discharge_cms")
      val post = r.getAs[Double]("discharge_cms")
      if (r.getAs[Int]("calb_applied") == 0) assert(post == pre)
      else {
        val c = r.getAs[Double]("calb_coef_manual")
        assert(post == pre / c)
        if (c > 1.0) assert(post < pre) else if (c < 1.0) assert(post > pre)
      }
    }
  }
}
