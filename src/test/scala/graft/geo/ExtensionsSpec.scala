package graft.geo

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.synth.Synth
import PointInPolygon.stContains

class ExtensionsSpec extends SparkTestBase {

  test("SimplifyRectPip rewrites literal-rectangle st_contains into range predicates") {
    val pts = Synth.points(spark, sf0001)
    // a fixed query window over the hotspot (rect ring, same layout as synth)
    val ring = Array(-74.0, 40.0, -71.5, 40.0, -71.5, 42.5, -74.0, 42.5)
    val q = pts.filter(stContains(lit(ring), col("lng"), col("lat")))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("st_contains"), optimized)
    assert(optimized.contains(">= -74.0") || optimized.contains("-74.0"))
    // results match the expression evaluated directly (rule is semantics-preserving)
    val expected = pts.collect().count { r =>
      Geom.contains(ring, r.getAs[Double]("lng"), r.getAs[Double]("lat"))
    }
    assert(q.count() == expected)
    assert(q.count() > 0)
  }

  test("non-rectangular literal ring is left to the st_contains expression") {
    val pts = Synth.points(spark, sf0001)
    val tri = Array(-74.0, 40.0, -70.0, 40.0, -72.0, 43.0)
    val q = pts.filter(stContains(lit(tri), col("lng"), col("lat")))
    assert(q.queryExecution.optimizedPlan.toString.contains("st_contains"))
    val expected = pts.collect().count { r =>
      Geom.contains(tri, r.getAs[Double]("lng"), r.getAs[Double]("lat"))
    }
    assert(q.count() == expected)
  }

  test("rewritten predicate is pushed down to the parquet scan") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity").as("lng"), col("l_tax").as("lat"))
    val ring = Array(10.0, 0.0, 30.0, 0.0, 30.0, 1.0, 10.0, 1.0)
    val q = li.filter(stContains(lit(ring), col("lng"), col("lat")))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(l_quantity,10.0)"), plan.take(1500))
  }
}
