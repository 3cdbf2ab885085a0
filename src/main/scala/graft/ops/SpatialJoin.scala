package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geo.PointInPolygon.stContains
import graft.synth.Synth

/** Broadcast point-in-polygon spatial join — the engine's core custom
  * operator (SURVEY.md §2.3 J3; replaces `gpd.sjoin` /
  * `gdal_rasterize -a HydroID`).
  *
  * Plan shape (scale rationale):
  *  1. points carry a CoarseRes cell id (`ccell`) — computed by codegen'd
  *     column arithmetic, no UDF.
  *  2. the polygon set is exploded to its covering coarse cells and
  *     **broadcast** (dimension side, ~MBs even for national-scale NWM
  *     catchment counts) — so the join is a broadcast-hash join on `ccell`:
  *     ZERO shuffle of the fact (pages) side at any scale.
  *  3. exact containment via the codegen'd [[graft.geo.PointInPolygon]]
  *     expression filters candidates (~10 per point) to the unique owner.
  *
  * At 100 TB this is a map-only stage: scan → project → BHJ → filter, fully
  * inside whole-stage codegen.
  */
object SpatialJoin {

  /** Assign each point (needs lat/lng/ccell columns) its containing
    * catchment. Inner join: points outside every polygon are dropped (the
    * grid partitions the globe, so here every point matches exactly once). */
  def assign(points: DataFrame, cover: DataFrame): DataFrame =
    points
      .join(broadcast(cover), "ccell")
      .filter(stContains(col("ring"), col("lng"), col("lat")))
      .drop("ring")

  def assign(spark: SparkSession, points: DataFrame): DataFrame =
    assign(points, Synth.catchmentCover(spark))
}
