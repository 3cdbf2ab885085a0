package graft.geo

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData

/** Optimizer rule (SURVEY.md §4 / §7.3 "custom logical Rule"): a foldable
  * axis-aligned-rectangle `st_contains(ring, lng, lat)` predicate is
  * rewritten into four comparisons
  * `lng >= xMin AND lng < xMax AND lat >= yMin AND lat < yMax`
  * — exactly the half-open semantics of the crossing-number test for
  * rectangles ([[Geom.contains]]). The comparisons then participate in
  * further Catalyst optimization (predicate pushdown to the scan, bbox →
  * cell-range pruning), which an opaque expression would block.
  *
  * Fires only on literal rings (e.g. a user's fixed query window); the
  * per-row broadcast-polygon join path is untouched.
  */
object SimplifyRectPip extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case p @ PointInPolygon(ring, lng, lat) if ring.foldable =>
      val evaled = ring.eval()
      if (evaled == null) p
      else {
        val a = evaled.asInstanceOf[ArrayData].toDoubleArray()
        val isRect = a.length == 8 &&
          a(1) == a(3) && a(2) == a(4) && a(5) == a(7) && a(6) == a(0)
        if (!isRect) p
        else {
          val xMin = math.min(a(0), a(2)); val xMax = math.max(a(0), a(2))
          val yMin = math.min(a(1), a(5)); val yMax = math.max(a(1), a(5))
          And(
            And(GreaterThanOrEqual(lng, Literal(xMin)), LessThan(lng, Literal(xMax))),
            And(GreaterThanOrEqual(lat, Literal(yMin)), LessThan(lat, Literal(yMax))))
        }
      }
  }
}

/** `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.geo.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => SimplifyRectPip)
}
