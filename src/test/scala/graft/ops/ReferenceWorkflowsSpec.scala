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
