package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geo.Cells
import graft.ops._
import graft.pipeline.Inundate
import graft.synth.Synth
import OracleSql._

/** Driver contract — one `queries` entry (+ DuckDB oracle) per implemented
  * operator from SURVEY.md §2. Column names are aliased identically on both
  * sides (driver hashes values under name-sorted columns).
  */
object SparkEntry {

  /** Flagship query on sf0.001: the full inundate + mosaic pipeline
    * (SURVEY.md §3.2). */
  def entry(spark: SparkSession): DataFrame =
    Inundate.run(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1-S4 scan + deterministic geocode synthesis (§2.10 #6)
    "q01_geocode" -> ((s, dir) =>
      Synth.points(s, dir).select(col("pid"), col("lat"), col("lng"), col("hand"))),

    // §2.10 #1 cell codec: encode + parent (raster georeferencing analog)
    "q02_cell_encode" -> ((s, dir) =>
      Synth.points(s, dir).select(
        col("pid"), col("cell"),
        Cells.cellToParentCol(col("cell"), Cells.BaseRes, Cells.CoarseRes).as("parent5"))),

    // J3 point-in-polygon broadcast join (core custom operator)
    "q03_pip_join" -> ((s, dir) =>
      SpatialJoin.assign(s, Synth.points(s, dir)).select(
        col("pid"), col("hydroid").cast("long").as("hydroid"),
        col("feature_id").cast("long").as("feature_id"), col("huc8"))),

    // SRC synthesis: 84-knot Manning-like rating curves (gage subset)
    "q04_hydrotable" -> ((s, _) =>
      Synth.hydrotable(s).filter(col("hydroid") % 199 === 0)
        .select(col("hydroid"), col("stage"), col("discharge_cms"))),

    // J1+A5: forecast join + np.interp stage (the hot join)
    "q05_interp_stage" -> ((s, _) =>
      RatingInterp.stages(Synth.hydrotable(s), Synth.forecast(s))
        .select(col("hydroid"), col("stage_m"))),

    // §3.2 pixel kernel: depth/class per point-tile
    "q06_tiles" -> ((s, dir) =>
      Inundate.tiles(s, Synth.points(s, dir)).select(
        col("pid"), col("hydroid").cast("long").as("hydroid"),
        col("hand"), col("stage_m"), col("depth"), col("clazz"))),

    // A6 mosaic: per-cell max (nanmax analog)
    "q07_mosaic" -> ((s, dir) =>
      Inundate.run(s, dir).select(
        col("cell"), col("depth_max"), col("clazz"), col("n_points"))),

    // A1/A3 zonal min/max + counts per catchment
    "q08_zonal" -> ((s, dir) =>
      SpatialJoin.assign(s, Synth.points(s, dir))
        .groupBy(col("hydroid").cast("long").as("hydroid"))
        .agg(min(col("hand")).as("hand_min"), max(col("hand")).as("hand_max"),
          count(lit(1)).as("n"))),

    // J2/J5 kNN nearest-gage with distance cap
    "q09_knn_gage" -> ((s, dir) =>
      KnnJoin.nearestGage(s, Synth.points(s, dir)).select(
        col("pid"), col("nn_hydroid").cast("long").as("nn_hydroid"), col("nn_dist2"))),

    // North-rule skew: salted two-stage agg over dense coarse cells
    "q10_salted_hot" -> ((s, dir) =>
      SaltedAgg.countAndMax(Synth.points(s, dir),
        col("ccell"), col("pid"), col("hand"), 32)
        .select(col("k"), col("n"), col("mx")))
  )

  def oracleSql: Map[String, String] = Map(
    "q01_geocode" -> withCtes(pts)("SELECT pid, lat, lng, hand FROM pts"),

    "q02_cell_encode" -> withCtes(pts, asg)(
      """SELECT pid, cell,
        |  5 * 72057594037927936 + (((cell // 268435456) % 268435456) >> 7) * 268435456
        |    + ((cell % 268435456) >> 7) AS parent5
        |FROM asg""".stripMargin),

    "q03_pip_join" -> withCtes(pts, asg)(
      s"SELECT pid, hydroid, 1000000 + hydroid AS feature_id, $huc8FromHydroid AS huc8 FROM asg"),

    "q04_hydrotable" -> withCtes(ht)(
      "SELECT hydroid, stage, discharge_cms FROM ht WHERE hydroid % 199 = 0"),

    "q05_interp_stage" -> withCtes(ht, fc, stg)("SELECT hydroid, stage_m FROM stg"),

    "q06_tiles" -> withCtes(pts, asg, ht, fc, stg, til)(
      """SELECT pid, hydroid, hand, stage_m, depth,
        |  CAST(CASE WHEN depth > 0 THEN hydroid ELSE -hydroid END AS INT) AS clazz
        |FROM til""".stripMargin),

    "q07_mosaic" -> withCtes(pts, asg, ht, fc, stg, til)(
      """SELECT cell, max(depth) AS depth_max,
        |  max(CAST(CASE WHEN depth > 0 THEN hydroid ELSE -hydroid END AS INT)) AS clazz,
        |  count(*) AS n_points
        |FROM til GROUP BY cell""".stripMargin),

    "q08_zonal" -> withCtes(pts, asg)(
      """SELECT hydroid, min(hand) AS hand_min, max(hand) AS hand_max, count(*) AS n
        |FROM asg GROUP BY hydroid""".stripMargin),

    "q09_knn_gage" -> withCtes(pts,
      """gc AS (
        |  SELECT hydroid,
        |    (CAST(floor(hydroid / 144) AS BIGINT) + CAST(0.5 AS DOUBLE)) * CAST(1.25 AS DOUBLE)
        |      - CAST(90.0 AS DOUBLE) AS lat_c,
        |    ((hydroid % 144) + CAST(0.5 AS DOUBLE)) * CAST(2.5 AS DOUBLE)
        |      - CAST(180.0 AS DOUBLE) AS lng_c
        |  FROM (SELECT 199 * x AS hydroid FROM generate_series(0, 104) t(x))
        |)""".stripMargin,
      """d AS (
        |  SELECT p.pid, gc.hydroid,
        |    (p.lat - gc.lat_c) * (p.lat - gc.lat_c) + (p.lng - gc.lng_c) * (p.lng - gc.lng_c) AS d2
        |  FROM pts p CROSS JOIN gc
        |  WHERE (p.lat - gc.lat_c) * (p.lat - gc.lat_c) + (p.lng - gc.lng_c) * (p.lng - gc.lng_c) <= 25.0
        |)""".stripMargin,
      "m AS (SELECT pid, min(d2) AS md FROM d GROUP BY pid)")(
      """SELECT p.pid, w.nn_hydroid, w.nn_dist2
        |FROM (SELECT DISTINCT pid FROM pts) p LEFT JOIN (
        |  SELECT d.pid, min(d.hydroid) AS nn_hydroid, m.md AS nn_dist2
        |  FROM d JOIN m ON d.pid = m.pid AND d.d2 = m.md
        |  GROUP BY d.pid, m.md) w ON p.pid = w.pid""".stripMargin),

    "q10_salted_hot" -> withCtes(pts)(
      """SELECT 5 * 72057594037927936
        |    + CAST(floor((lat + 90.0) / 180.0 * 32.0) AS BIGINT) * 268435456
        |    + CAST(floor((lng + 180.0) / 360.0 * 64.0) AS BIGINT) AS k,
        |  count(*) AS n, max(hand) AS mx
        |FROM pts GROUP BY 1""".stripMargin)
  )
}
