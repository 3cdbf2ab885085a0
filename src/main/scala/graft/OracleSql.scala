package graft

/** DuckDB oracle SQL — textual mirrors of the engine's arithmetic. Every
  * formula here is kept in exact correspondence with the Column expressions
  * in graft.synth.Synth / graft.ops.* : only IEEE-754 +,-,*,/ on doubles,
  * exact BIGINT arithmetic, floor, and order-insensitive aggregates
  * (min/max/count/sum-of-int), so Spark and DuckDB produce bit-identical
  * values.
  */
object OracleSql {

  /** Geocoded points from lineitem (pid = l_orderkey*8 + l_linenumber). */
  val pts: String =
    """pts AS (
      |  SELECT pid,
      |    CASE WHEN pid % 5 = 0 THEN 40.0 + ((pid * 131 + 17) % 2000) / 1000.0
      |         ELSE ((pid * 48271 + 11) % 160000) / 1000.0 - 80.0 END AS lat,
      |    CASE WHEN pid % 5 = 0 THEN -74.0 + ((pid * 137 + 29) % 2000) / 1000.0
      |         ELSE ((pid * 69621 + 7) % 360000) / 1000.0 - 180.0 END AS lng,
      |    ((pid * 97 + 13) % 5000) / 1000.0 AS hand
      |  FROM (SELECT CAST(l_orderkey * 8 + l_linenumber AS BIGINT) AS pid FROM lineitem)
      |)""".stripMargin

  /** Catchment assignment by grid floor arithmetic (the closed form of the
    * engine's ray-cast PIP against the grid polygons). */
  val asg: String =
    """asg AS (
      |  SELECT pid, lat, lng, hand,
      |    CAST(floor((lat + 90.0) / 1.25) AS BIGINT) * 144
      |      + CAST(floor((lng + 180.0) / 2.5) AS BIGINT) AS hydroid,
      |    12 * 72057594037927936 + CAST(floor((lat + 90.0) / 180.0 * 4096.0) AS BIGINT) * 268435456
      |      + CAST(floor((lng + 180.0) / 360.0 * 8192.0) AS BIGINT) AS cell
      |  FROM pts
      |)""".stripMargin

  val huc8FromHydroid: String =
    "lpad(CAST(CAST(floor(floor(hydroid / 144) / 8) * 18 + floor((hydroid % 144) / 8) AS BIGINT) AS VARCHAR), 8, '0')"

  /** Synthetic hydrotable: 84 knots × 20736 catchments. */
  val ht: String =
    """ht AS (
      |  SELECT hydroid, 1000000 + hydroid AS feature_id, stage,
      |    (hydroid % 7 + 1) * stage
      |      + ((hydroid % 5) * CAST(0.5 AS DOUBLE) + CAST(0.5 AS DOUBLE)) * stage * stage AS discharge_cms
      |  FROM (SELECT h.hydroid, s.i * CAST(0.3048 AS DOUBLE) AS stage
      |        FROM (SELECT a.x * 144 + b.x AS hydroid
      |              FROM generate_series(0, 143) a(x), generate_series(0, 143) b(x)) h,
      |             generate_series(0, 83) s(i))
      |)""".stripMargin

  val fc: String =
    """fc AS (
      |  SELECT 1000000 + x AS feature_id,
      |    (((1000000 + x) * 53 + 7) % 9000) / 10.0 AS discharge
      |  FROM generate_series(0, 20735) t(x)
      |)""".stripMargin

  /** np.interp bracketing via conditional aggregation (lake rows filtered:
    * hydroid % 97 = 0 ⇔ LakeID ≠ -999). */
  val stg: String =
    """stg AS (
      |  SELECT hydroid,
      |    CASE WHEN max(CASE WHEN discharge_cms <= discharge THEN stage END) IS NULL THEN min(stage)
      |         WHEN min(CASE WHEN discharge_cms > discharge THEN stage END) IS NULL THEN max(stage)
      |         ELSE max(CASE WHEN discharge_cms <= discharge THEN stage END)
      |            + (max(discharge) - max(CASE WHEN discharge_cms <= discharge THEN discharge_cms END))
      |            * (min(CASE WHEN discharge_cms > discharge THEN stage END)
      |               - max(CASE WHEN discharge_cms <= discharge THEN stage END))
      |            / (min(CASE WHEN discharge_cms > discharge THEN discharge_cms END)
      |               - max(CASE WHEN discharge_cms <= discharge THEN discharge_cms END))
      |    END AS stage_m
      |  FROM (SELECT ht.hydroid, ht.stage, ht.discharge_cms, fc.discharge
      |        FROM ht JOIN fc ON ht.feature_id = fc.feature_id
      |        WHERE ht.hydroid % 97 <> 0)
      |  GROUP BY hydroid
      |)""".stripMargin

  /** Per-point tile: depth/class kernel. */
  val til: String =
    """til AS (
      |  SELECT a.pid, a.cell, a.hydroid, a.hand, s.stage_m,
      |    CASE WHEN s.stage_m - a.hand > 0.0 THEN s.stage_m - a.hand ELSE 0.0 END AS depth
      |  FROM asg a JOIN stg s ON a.hydroid = s.hydroid
      |)""".stripMargin

  def withCtes(ctes: String*)(body: String): String =
    "WITH " + ctes.mkString(",\n") + "\n" + body
}
