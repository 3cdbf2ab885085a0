package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Bit-compat of the reference's 4-dp stage rounding
  * (`tools/inundation.py:675` `stages.round(4)` — numpy scales by 10⁴ and
  * rints half-even on the scaled double). [[RatingInterp.npRound4]] locks
  * those semantics; golden values generated with numpy itself. Note plain
  * `bround(x, 4)` (decimal half-even) would give 1.2345 for 1.23455 while
  * numpy gives 1.2346 — the scaled form matches numpy.
  */
class RoundingSpec extends SparkTestBase {

  test("npRound4 matches np.round(x, 4) golden cases") {
    import spark.implicits._
    val cases = Seq(
      (1.23456, 1.2346),
      (1.23454, 1.2345),
      (1.23455, 1.2346), // fp-multiply pushes the scaled value above .5
      (0.00005, 0.0), // scaled value is exactly 0.5 → half-even → 0
      (0.00025, 0.0002), // exactly 2.5 scaled → half-even → 2
      (20.037334141240397, 20.0373),
      (0.0, 0.0),
      (-1.23456, -1.2346))
    val got = cases.map(_._1).toDF("x")
      .select(RatingInterp.npRound4(col("x")).as("r")).collect().map(_.getDouble(0))
    cases.zip(got).foreach { case ((in, exp), g) =>
      assert(g == exp, s"input $in: got $g expected $exp")
    }
  }
}
