package graft.ops

import org.apache.spark.sql.functions._
import graft.{SharedSpark, SparkTestBase}
import graft.geo.Cells
import graft.synth.Synth

/** Behavioral specs for the physical-layout evidence op (q128): the Morton
  * key must order-preserve locality, zone maps must be exact min/max, and
  * Z-order bucketing must prune strictly better than hash bucketing on a
  * clustered probe box. */
class LayoutSpec extends SparkTestBase {
  import SharedSpark.spark.implicits._

  private val rLo = Cells.latToRow(40.0, Cells.BaseRes)
  private val rHi = Cells.latToRow(42.0, Cells.BaseRes)
  private val cLo = Cells.lngToCol(-74.0, Cells.BaseRes)
  private val cHi = Cells.lngToCol(-72.0, Cells.BaseRes)

  test("zkey: interleave is exact and monotone in each axis at fixed other axis") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (4095L, 8191L), (2958L, 2412L))
      .toDF("r", "c").select(Layout.zkey($"r", $"c").as("z"), $"r", $"c")
    val got = df.as[(Long, Long, Long)].collect().map(t => (t._2, t._3) -> t._1).toMap
    // bit b of row lands at 2b+1, of col at 2b
    assert(got((0L, 0L)) == 0L && got((1L, 0L)) == 2L && got((0L, 1L)) == 1L)
    // max key fits in 26 bits (col has 13 bits, row 12)
    assert(got((4095L, 8191L)) < (1L << 26))
    // reference implementation cross-check
    def zref(r: Long, c: Long): Long =
      (0 until 13).map(b => (((r >> b) & 1L) << (2 * b + 1)) | (((c >> b) & 1L) << (2 * b))).sum
    got.foreach { case ((r, c), z) => assert(z == zref(r, c)) }
  }

  test("zoneMaps: both layouts cover all points; zone maps are exact min/max") {
    val pts = Synth.points(spark, sf0001)
    val n = pts.count()
    val out = Layout.zoneMaps(pts, rLo, rHi, cLo, cHi).cache()
    val totals = out.groupBy($"layout").agg(sum($"n_pages").as("t"))
      .as[(String, Long)].collect().toMap
    assert(totals("zorder") == n && totals("hash") == n)
    // exact zone maps: recompute one zorder bucket brute-force
    val mask = (1L << Cells.ROW_BITS) - 1L
    val rc = pts.select($"pid",
      shiftright($"cell", Cells.ROW_BITS.toInt).bitwiseAND(lit(mask)).as("cr"),
      $"cell".bitwiseAND(lit(mask)).as("cc"))
    val someBucket = out.filter($"layout" === "zorder").select($"bucket").as[Long].head()
    val brute = rc.withColumn("b", shiftright(Layout.zkey($"cr", $"cc"), Layout.BucketShift))
      .filter($"b" === someBucket)
      .agg(min($"cr"), max($"cr"), min($"cc"), max($"cc"), count(lit(1)))
      .as[(Long, Long, Long, Long, Long)].head()
    val zrow = out.filter($"layout" === "zorder" && $"bucket" === someBucket)
      .select($"row_min", $"row_max", $"col_min", $"col_max", $"n_pages")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(zrow == brute)
    out.unpersist()
  }

  test("zoneMaps: Z-order prunes the clustered probe box strictly better than hash") {
    val pts = Synth.points(spark, sf0001)
    val out = Layout.zoneMaps(pts, rLo, rHi, cLo, cHi).cache()
    val skipFrac = out.groupBy($"layout")
      .agg((sum($"can_skip").cast("double") / count(lit(1))).as("f"))
      .as[(String, Double)].collect().toMap
    // hash buckets all contain cluster points (every bucket spans the globe):
    // nothing skippable; Z-order confines the cluster to few prefix buckets
    assert(skipFrac("hash") == 0.0)
    assert(skipFrac("zorder") > 0.5, s"zorder skip frac = ${skipFrac("zorder")}")
    // skip verdicts are sound: no skipped bucket contains a probe-box point
    val mask = (1L << Cells.ROW_BITS) - 1L
    val inBox = pts.select(
      shiftright($"cell", Cells.ROW_BITS.toInt).bitwiseAND(lit(mask)).as("cr"),
      $"cell".bitwiseAND(lit(mask)).as("cc"))
      .filter($"cr".between(rLo, rHi) && $"cc".between(cLo, cHi))
      .withColumn("bucket", shiftright(Layout.zkey($"cr", $"cc"), Layout.BucketShift))
      .select($"bucket").distinct()
    val skippedWithPoints = out.filter($"layout" === "zorder" && $"can_skip" === 1)
      .join(inBox, "bucket")
    assert(skippedWithPoints.count() == 0)
    out.unpersist()
  }
}
