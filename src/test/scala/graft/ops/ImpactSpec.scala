package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.pipeline.Inundate

/** q106-q110 invariants: rollup consistency, the LEFT-merge TP quirk,
  * exact-IDW partitioning invariance, mask accounting. */
class ImpactSpec extends SparkTestBase {

  lazy val mosaic = Inundate.run(spark, sf0001).cache()

  test("aggregate metrics: counts are the exact sums of the per-catchment rows") {
    val per = Agreement.alphaByHydroId(spark, mosaic)
      .groupBy(col("bench"), col("mag"))
      .agg(sum(col("tp")).as("tp_sum"), count(lit(1)).as("n"))
    val agg = Agreement.aggregateMetrics(spark, mosaic)
      .select(col("bench"), col("mag"), col("tp"), col("n_cases"))
    val joined = per.join(agg, Seq("bench", "mag"))
    assert(joined.count() == Agreement.MasterCombos.size)
    assert(joined.filter(col("tp_sum") =!= col("tp")
      || col("n") =!= col("n_cases")).count() == 0)
  }

  test("flood impact: the reference's LEFT-merge TP equals ALL benchmark-impacted") {
    val row = Impact.floodImpact(spark, mosaic).head()
    val tp = row.getAs[Long]("tp"); val fn = row.getAs[Long]("fn")
    val sb = row.getAs[Long]("n_struct_bench"); val rb = row.getAs[Long]("n_road_bench")
    // the quirk: tp = every benchmark-impacted feature (so tp >= fn always,
    // and tp = n_struct_bench + n_road_bench)
    assert(tp == sb + rb)
    assert(fn <= tp)
    assert(row.getAs[Double]("csi") > 0.0 && row.getAs[Double]("csi") <= 1.0)
  }

  test("interpolated WSE is partitioning-invariant (integer-weighted IDW)") {
    val a = Terrain.interpolateWse(spark)
      .select(col("gid"), col("wse_filled")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "5")
    val b = Terrain.interpolateWse(s2)
      .select(col("gid"), col("wse_filled")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(a == b) // bit-identical, not approximately equal
    // filled values interpolate: every filled cell sits inside the global
    // valid WSE range
    val g = Terrain.interpolateWse(spark).cache()
    val Seq(lo, hi) = Seq(min(col("wse_filled")), max(col("wse_filled")))
      .map(e => g.filter(col("valid") === 1).agg(e).head().getDouble(0))
    assert(g.filter(col("valid") === 0 && col("wse_filled") =!= -9999.0
      && (col("wse_filled") < lo || col("wse_filled") > hi)).count() == 0)
    g.unpersist()
  }

  test("deep flooding: every reported polygon's deep count is consistent") {
    val out = Impact.deepFlooding(spark, mosaic).cache()
    assert(out.count() > 0)
    assert(out.filter(col("n_deep") > col("n_cells")).count() == 0)
    assert(out.filter(col("n_deep") > 0 && col("max_deep") <= 2.0).count() == 0)
    assert(out.filter(col("n_deep") === 0 && col("max_deep").isNotNull).count() == 0)
    out.unpersist()
  }
}
