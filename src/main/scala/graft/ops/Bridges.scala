package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geo.Cells
import graft.synth.Synth

/** Bridge healing + bridge-point flows — `src/heal_bridges_osm.py`.
  *
  * The reference buffers every OSM bridge point, takes the zonal MAX of the
  * HAND grid inside the buffer (`:29-39`, `zonal_stats(..., stats="max",
  * all_touched=True)`) as the bridge's healed threshold stage, derives the
  * 75 %-threatened stage (`:16,169`: `threshold_hand_75 = threshold_hand ·
  * 0.75`), and pushes both stages through the bridge catchment's rating
  * curve with `np.interp` (`:188-196`, `flow_lookup` /
  * `flows_from_hydrotable`) plus ft/cfs unit conversions (`:203-206`).
  *
  * Engine form: bridges are a deterministic tiny dimension (every 151st
  * catchment carries one, jittered off the centroid). The buffer is a
  * Chebyshev square; its CoarseRes cell cover is the broadcast side of a
  * cover equi-join against the geocoded point table (the HAND "grid"), so
  * the zonal max is one partial-aggregating pass over the fact scan — the
  * same shape as the mask/zonal family (q40), never a nested-loop join.
  * The flow lookup joins the ~hundreds-row threshold table back into the
  * hydrotable broadcast-side and interpolates BOTH stages in one
  * conditional-aggregation pass (A5's bracket algebra with stage/discharge
  * roles swapped: here the known value is a stage, the interpolated one a
  * discharge).
  */
object Bridges {

  /** Chebyshev buffer half-width in degrees. */
  val BufferDeg = 1.5

  final case class Bridge(bridge_id: Int, blat: Double, blng: Double,
      lat_min: Double, lat_max: Double, lng_min: Double, lng_max: Double)

  /** Driver-side bridge list (tiny dimension, ~137 rows): every 151st
    * catchment, point jittered ±0.05° off the centroid (stays inside the
    * catchment, so the bridge's HydroID is its grid catchment). */
  lazy val bridgeList: IndexedSeq[Bridge] =
    for (k <- 0 until Synth.CatRows * Synth.CatCols if k % 151 == 0) yield {
      val c = Synth.catchmentList(k)
      val blat = c.lat_c + ((k * 17) % 100) / 1000.0 - 0.05
      val blng = c.lng_c + ((k * 23) % 100) / 1000.0 - 0.05
      Bridge(k, blat, blng,
        blat - BufferDeg, blat + BufferDeg, blng - BufferDeg, blng + BufferDeg)
    }

  /** (ccell, bridge…) buffer-cover table — broadcast side of the zonal join. */
  def bridgeCover(spark: SparkSession): DataFrame = {
    import spark.implicits._
    bridgeList.flatMap { b =>
      Cells.cover(math.max(-90.0, b.lat_min), math.min(90.0, math.nextDown(b.lat_max)),
          math.max(-180.0, b.lng_min), math.min(180.0, math.nextDown(b.lng_max)),
          Cells.CoarseRes)
        .map(cc => (cc, b.bridge_id, b.lat_min, b.lat_max, b.lng_min, b.lng_max))
    }.toDF("ccell", "bridge_id", "lat_min", "lat_max", "lng_min", "lng_max")
  }

  /** Per-bridge healed threshold: zonal max HAND over the buffered points
    * (bridges whose buffer holds no point produce no row — the reference
    * skips bridges off the HAND grid). */
  def healedThresholds(spark: SparkSession, points: DataFrame): DataFrame =
    points
      .join(broadcast(bridgeCover(spark)), "ccell")
      .filter(col("lat") >= col("lat_min") && col("lat") < col("lat_max") &&
        col("lng") >= col("lng_min") && col("lng") < col("lng_max"))
      .groupBy(col("bridge_id"))
      .agg(max(col("hand")).as("threshold_hand"), count(lit(1)).as("n_pts"))
      .withColumn("threshold_hand_75", col("threshold_hand") * lit(0.75))

  /** np.interp with stage as the sample axis: discharge at stage `t`
    * (clamped at the curve ends), as order-insensitive conditional aggs. */
  def flowAt(t: Column): Column = {
    val loQ = max(when(col("stage") <= t, col("discharge_cms")))
    val loS = max(when(col("stage") <= t, col("stage")))
    val hiQ = min(when(col("stage") > t, col("discharge_cms")))
    val hiS = min(when(col("stage") > t, col("stage")))
    when(loQ.isNull, min(col("discharge_cms")))
      .when(hiQ.isNull, max(col("discharge_cms")))
      .otherwise(loQ + (max(t) - loS) * (hiQ - loQ) / (hiS - loS))
  }

  /** q91: thresholds + rating-curve flow lookup + unit conversions. */
  def bridgeFlows(spark: SparkSession, points: DataFrame): DataFrame = {
    val thr = healedThresholds(spark, points)
    Synth.hydrotable(spark)
      .join(broadcast(thr), col("hydroid") === col("bridge_id"))
      .groupBy(col("bridge_id"))
      .agg(max(col("threshold_hand")).as("threshold_hand"),
        max(col("threshold_hand_75")).as("threshold_hand_75"),
        max(col("n_pts")).as("n_pts"),
        flowAt(col("threshold_hand")).as("threshold_discharge"),
        flowAt(col("threshold_hand_75")).as("threshold_discharge75"))
      .select(col("bridge_id"), col("threshold_hand"), col("threshold_hand_75"),
        col("n_pts"), col("threshold_discharge"), col("threshold_discharge75"),
        (col("threshold_hand") * lit(3.28084)).as("threshold_hand_ft"),
        (col("threshold_hand_75") * lit(3.28084)).as("threshold_hand_75_ft"),
        (col("threshold_discharge") * lit(35.3147)).as("threshold_discharge_cfs"),
        (col("threshold_discharge75") * lit(35.3147)).as("threshold_discharge_75_cfs"))
  }
}
