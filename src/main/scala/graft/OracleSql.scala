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

  val mos: String = "mos AS (SELECT cell, max(depth) AS depth_max FROM til GROUP BY cell)"

  /** Exclusion mask rectangles — mirror of [[graft.synth.Synth.maskList]]. */
  val mrects: String =
    """mrects AS (
      |  SELECT k AS mask_id,
      |         ((k * 37 + 5) % 150) - CAST(85.0 AS DOUBLE) AS lat_min,
      |         (((k * 37 + 5) % 150) - CAST(85.0 AS DOUBLE)) + (3 + k % 4) AS lat_max,
      |         ((k * 73 + 11) % 330) - CAST(175.0 AS DOUBLE) AS lng_min,
      |         (((k * 73 + 11) % 330) - CAST(175.0 AS DOUBLE)) + (4 + k % 5) AS lng_max
      |  FROM generate_series(0, 39) t(k)
      |)""".stripMargin

  /** Agreement class per cell: 0 TN / 1 FN / 2 FP / 3 TP / 4 masked
    * (`tools_shared_functions.py:400-406`); benchmark extent is a row/col
    * hash; the exclusion mask is the REAL polygon test — centroid inside any
    * mrects rectangle (closed form of the engine's cover + ray-cast PIP). */
  val agr: String =
    """agr AS (
      |  SELECT cell,
      |    CAST(CASE WHEN EXISTS (SELECT 1 FROM mrects m
      |           WHERE clat >= m.lat_min AND clat < m.lat_max
      |             AND clng >= m.lng_min AND clng < m.lng_max) THEN 4
      |         ELSE (CASE WHEN depth_max > 0.0 THEN 1 ELSE 0 END) * 2
      |              + CASE WHEN (((cell // 268435456) % 268435456) * 31 + (cell % 268435456) * 17) % 10 < 4
      |                THEN 1 ELSE 0 END
      |    END AS INT) AS agreement
      |  FROM (SELECT cell, depth_max,
      |          (((cell // 268435456) % 268435456) + CAST(0.5 AS DOUBLE)) / 4096.0 * 180.0 - 90.0 AS clat,
      |          ((cell % 268435456) + CAST(0.5 AS DOUBLE)) / 8192.0 * 360.0 - 180.0 AS clng
      |        FROM mos)
      |)""".stripMargin

  // ---- web-text corpus + dedup family ----

  /** documents + exact clones (every 40th) + truncated near-clones (every 50th). */
  val corpus: String =
    """corpus AS (
      |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang FROM documents
      |  UNION ALL
      |  SELECT CAST(doc_id + 2000000 AS BIGINT) AS doc_id, text, lang
      |  FROM documents WHERE doc_id % 40 = 0
      |  UNION ALL
      |  SELECT CAST(doc_id + 1000000 AS BIGINT) AS doc_id,
      |    substring(text, 1, CAST(length(text) - 10 AS INT)) AS text, lang
      |  FROM documents WHERE doc_id % 50 = 0
      |)""".stripMargin

  /** char 8-grams of the first 512 chars (uncorrelated series + bound filter
    * because this DuckDB build lacks lateral generate_series). */
  val sh: String =
    """sh AS (
      |  SELECT c.doc_id, substring(c.text, g.i, 8) AS sh
      |  FROM corpus c CROSS JOIN generate_series(1, 505) g(i)
      |  WHERE g.i <= least(length(c.text), 512) - 7
      |)""".stripMargin

  val mh: String =
    """mh AS (
      |  SELECT doc_id, s.seed,
      |    min((hb * (s.seed * 4099 + 17) + (s.seed * 7907 + 31)) % 1000000007) AS minh
      |  FROM (SELECT doc_id,
      |          CAST('0x' || substring(md5(sh), 1, 15) AS BIGINT) % 1000000007 AS hb
      |        FROM sh)
      |       CROSS JOIN generate_series(0, 15) s(seed)
      |  GROUP BY doc_id, s.seed
      |)""".stripMargin

  val bnd: String =
    """bnd AS (
      |  SELECT doc_id, CAST(floor(seed / 4) AS INT) AS band,
      |    min(CASE WHEN seed % 4 = 0 THEN minh END) AS k0,
      |    min(CASE WHEN seed % 4 = 1 THEN minh END) AS k1,
      |    min(CASE WHEN seed % 4 = 2 THEN minh END) AS k2,
      |    min(CASE WHEN seed % 4 = 3 THEN minh END) AS k3
      |  FROM mh GROUP BY doc_id, CAST(floor(seed / 4) AS INT)
      |)""".stripMargin

  val prs: String =
    """prs AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bnd a JOIN bnd b ON a.band = b.band AND a.k0 = b.k0 AND a.k1 = b.k1
      |    AND a.k2 = b.k2 AND a.k3 = b.k3 AND a.doc_id < b.doc_id
      |)""".stripMargin

  // ---- shared dedup-verify chain (distinct shingle-hash table → exact
  // Jaccard over the LSH candidate pairs) — the q16 chain, promoted to vals
  // for the dup-graph / decontamination / heavy-hitter family ----

  val dsh: String =
    """dsh AS (SELECT DISTINCT doc_id,
      |  CAST('0x' || substring(md5(sh), 1, 15) AS BIGINT) AS hb FROM sh)""".stripMargin

  val shSz: String = "sz AS (SELECT doc_id, count(*) AS sz FROM dsh GROUP BY doc_id)"

  val shInter: String =
    """inter AS (
      |  SELECT p2.doc_a, p2.doc_b, count(*) AS i
      |  FROM prs p2 JOIN dsh a ON p2.doc_a = a.doc_id
      |  JOIN dsh b ON p2.doc_b = b.doc_id AND a.hb = b.hb
      |  GROUP BY p2.doc_a, p2.doc_b
      |)""".stripMargin

  val jacCte: String =
    """jac AS (
      |  SELECT p.doc_a, p.doc_b,
      |    CAST(coalesce(i.i, 0) AS DOUBLE) / CAST(sa.sz + sb.sz - coalesce(i.i, 0) AS DOUBLE) AS jaccard
      |  FROM prs p
      |  LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
      |  JOIN sz sa ON sa.doc_id = p.doc_a
      |  JOIN sz sb ON sb.doc_id = p.doc_b
      |)""".stripMargin

  // ---- paragraph-level dedup (q73) ----

  /** Words of each corpus doc (1-based split index → 0-based word pos);
    * bounded series because this DuckDB build lacks lateral generate_series. */
  val wrd: String =
    """wrd AS (
      |  SELECT doc_id, g.i - 1 AS p, ws[g.i] AS w
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM corpus)
      |  CROSS JOIN generate_series(1, 128) g(i)
      |  WHERE g.i <= len(ws)
      |)""".stripMargin

  /** Fixed 12-word paragraphs, text rebuilt in word order. */
  val par: String =
    """par AS (
      |  SELECT doc_id, CAST(floor(p / 12.0) AS INT) AS para_id,
      |         string_agg(w, ' ' ORDER BY p) AS para
      |  FROM wrd GROUP BY doc_id, CAST(floor(p / 12.0) AS INT)
      |)""".stripMargin

  /** First-occurrence winner per paragraph hash (ordered by doc, position);
    * the 60-bit BIGINT key mirrors the engine's narrow shuffle key. */
  val kpt: String =
    """kpt AS (
      |  SELECT doc_id, para_id, para,
      |    CASE WHEN row_number() OVER (
      |           PARTITION BY CAST('0x' || substring(md5(para), 1, 15) AS BIGINT)
      |           ORDER BY doc_id, para_id) = 1 THEN 1 ELSE 0 END AS kept
      |  FROM par
      |)""".stripMargin

  // ---- URL canonicalization (q74) ----

  /** Synthetic fetch log: 1–3 fetches per page with deterministic URL noise —
    * mirror of [[graft.ops.WebCuration.fetchLog]] over
    * [[graft.synth.Synth.pages]]. */
  val flog: String =
    """flog AS (
      |  SELECT pid, f,
      |    1700000000 + pid * 37 + f * 86400 AS fetch_ts,
      |    (CASE WHEN (pid + f) % 7 = 0 THEN upper(url) ELSE url END)
      |      || (CASE WHEN (pid + f) % 3 = 0
      |            THEN '?utm_source=feed&ref=' || CAST(pid % 7 AS VARCHAR) ELSE '' END)
      |      || (CASE WHEN (pid + f) % 4 = 0
      |            THEN '#sec' || CAST(pid % 5 AS VARCHAR) ELSE '' END) AS raw
      |  FROM (SELECT CAST(doc_id AS BIGINT) AS pid,
      |          'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url
      |        FROM documents)
      |  CROSS JOIN generate_series(0, 2) g(f)
      |  WHERE g.f <= pid % 3
      |)""".stripMargin

  // ---- SRC calibration family (q52-q54) ----

  /** SRC with channel-geometry columns — mirror of
    * [[graft.ops.Calibration.srcGeom]] (same formula text). */
  val srcg: String =
    """srcg AS (
      |  SELECT hydroid, i, stage,
      |    (hydroid % 7 + 1) * stage
      |      + ((hydroid % 5) * CAST(0.5 AS DOUBLE) + CAST(0.5 AS DOUBLE)) * stage * stage AS discharge_cms,
      |    CAST(1.0 AS DOUBLE) + (hydroid % 8) * CAST(0.125 AS DOUBLE) AS length_km,
      |    CAST(0.001 AS DOUBLE) + (hydroid % 11) * CAST(0.0005 AS DOUBLE) AS slope,
      |    CAST(0.03 AS DOUBLE) + (hydroid % 6) * CAST(0.01 AS DOUBLE) AS channel_n,
      |    CAST(0.1 AS DOUBLE) + (hydroid % 4) * CAST(0.025 AS DOUBLE) AS overbank_n,
      |    area_base + (hydroid % 3 + 1) * CAST(40.0 AS DOUBLE) * stage AS surface_area,
      |    area_base * stage + (hydroid % 3 + 1) * CAST(20.0 AS DOUBLE) * stage * stage AS volume,
      |    area_base + (hydroid % 3 + 1) * CAST(50.0 AS DOUBLE) * stage AS bed_area,
      |    ((hydroid * 61 + 23) % 7000) / 10.0 AS bankfull_flow
      |  FROM (SELECT h.hydroid, s.i, s.i * CAST(0.3048 AS DOUBLE) AS stage,
      |               (h.hydroid % 13 + 5) * CAST(100.0 AS DOUBLE) AS area_base
      |        FROM (SELECT a.x * 144 + b.x AS hydroid
      |              FROM generate_series(0, 143) a(x), generate_series(0, 143) b(x)) h,
      |             generate_series(0, 83) s(i))
      |)""".stripMargin

  /** Bankfull row per HydroID: argmin |bankfull_flow − Q| over stages > 0,
    * ties to the lowest stage (pandas idxmin on a stage-sorted frame). */
  val bfq: String =
    """bfq AS (
      |  SELECT hydroid, stage AS stage_bankfull, volume AS volume_bankfull,
      |    bed_area AS bedarea_bankfull, surface_area AS surfarea_bankfull,
      |    qdiff AS qdiff_bankfull
      |  FROM (SELECT *, row_number() OVER (PARTITION BY hydroid ORDER BY qdiff, stage) AS rn
      |        FROM (SELECT *, abs(bankfull_flow - discharge_cms) AS qdiff
      |              FROM srcg WHERE stage > CAST(0.0 AS DOUBLE)))
      |  WHERE rn = 1
      |)""".stripMargin

  /** Synthetic calibration observations + per-obs coefficients — mirrors of
    * [[graft.ops.Calibration.observations]] / [[graft.ops.Calibration.obsCoefs]]. */
  val obsu: String =
    """obsu AS (
      |  SELECT hydroid, j.j AS j, (hydroid * 7 + j.j * 31) % 84 AS ki
      |  FROM (SELECT a.x * 144 + b.x AS hydroid
      |        FROM generate_series(0, 143) a(x), generate_series(0, 143) b(x)),
      |       generate_series(0, 2) j(j)
      |  WHERE hydroid % 23 < 2 AND hydroid % 97 <> 0
      |)""".stripMargin

  val obsq: String =
    """obsq AS (
      |  SELECT o.hydroid, o.j, g.discharge_cms AS qsrc, g.channel_n, g.overbank_n,
      |    g.discharge_cms * (((o.hydroid * 31 + o.j * 17) % 1000) / 100.0 + CAST(0.05 AS DOUBLE)) AS qobs
      |  FROM obsu o JOIN srcg g ON o.hydroid = g.hydroid AND o.ki = g.i
      |)""".stripMargin

  val coefq: String =
    """coefq AS (
      |  SELECT *, coef * channel_n AS chn, coef * overbank_n AS obn
      |  FROM (SELECT *, qobs / qsrc AS coef FROM obsq)
      |)""".stripMargin

  /** Newton-cbrt chain CTEs for the Manning recompute: i0 seeds yc/yo with
    * sqrt(sqrt(x²)), i1..i8 iterate y ← (2y + x²/y²)/3 — matching
    * [[graft.ops.Calibration]]'s fixed-iteration chain step for step. */
  def newtonCtes: Seq[String] = {
    val seed = "i0 AS (SELECT *, sqrt(sqrt(x2c)) AS yc, sqrt(sqrt(x2o)) AS yo FROM sd4)"
    val steps = (1 to 8).map { k =>
      s"""i$k AS (SELECT * REPLACE (
         |  (CAST(2.0 AS DOUBLE) * yc + x2c / (yc * yc)) / CAST(3.0 AS DOUBLE) AS yc,
         |  (CAST(2.0 AS DOUBLE) * yo + x2o / (yo * yo)) / CAST(3.0 AS DOUBLE) AS yo) FROM i${k - 1})""".stripMargin
    }
    seed +: steps
  }

  // ---- wet-extent raster→vector (q58/q64) ----

  /** Mosaic with the signed-class winner, wet subset, and exploded 4-neighbor
    * ids — mirrors of [[graft.pipeline.Extents]]. */
  val mos58: String =
    """mos58 AS (
      |  SELECT cell, max(CAST(CASE WHEN depth > 0 THEN hydroid ELSE -hydroid END AS INT)) AS clazz
      |  FROM til GROUP BY cell
      |)""".stripMargin

  val wet58: String = "wet58 AS (SELECT cell, clazz FROM mos58 WHERE clazz > 0)"

  val nbr58: String =
    """nbr58 AS (
      |  SELECT cell, clazz,
      |    12 * 72057594037927936 + (((cell // 268435456) % 268435456) + dr) * 268435456
      |      + ((cell % 268435456) + dc) AS ncell
      |  FROM wet58 CROSS JOIN (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) o(dr, dc)
      |)""".stripMargin

  // ---- synthetic stream network (graph ops G1-G5) ----

  /** Closed-form reach network: lr = floor(h/144) % 8, lc = h % 8 (144 ≡ 0
    * mod 8); downstream (lr−1, lc + (lc%3 − 1) clamped); lr=0 → −1. */
  val net: String =
    """net AS (
      |  SELECT hydroid,
      |    lpad(CAST(CAST(floor(floor(hydroid / 144) / 8) * 18 + floor((hydroid % 144) / 8) AS BIGINT) AS VARCHAR), 8, '0') AS huc8,
      |    CAST(1 + hydroid % 8 AS INT) AS order_,
      |    CAST(1.0 AS DOUBLE) + (hydroid % 8) * CAST(0.125 AS DOUBLE) AS length_km,
      |    CAST(CASE WHEN (CAST(floor(hydroid / 144) AS BIGINT) % 8) = 0 THEN -1
      |         ELSE (CAST(floor(hydroid / 144) AS BIGINT) - 1) * 144 + (hydroid % 144) - (hydroid % 8)
      |              + CASE WHEN (hydroid % 8) + ((hydroid % 8) % 3 - 1) < 0
      |                       OR (hydroid % 8) + ((hydroid % 8) % 3 - 1) > 7
      |                     THEN (hydroid % 8) ELSE (hydroid % 8) + ((hydroid % 8) % 3 - 1) END
      |    END AS BIGINT) AS to_node
      |  FROM (SELECT a.x * 144 + b.x AS hydroid
      |        FROM generate_series(0, 143) a(x), generate_series(0, 143) b(x))
      |)""".stripMargin

  /** Arbolate sums via recursive transitive closure (lengths are dyadic →
    * exact sums, order-insensitive). Standalone query (WITH RECURSIVE). */
  val closure: String =
    """cl AS (
      |  SELECT hydroid AS u, hydroid AS d FROM net
      |  UNION ALL
      |  SELECT cl.u, n.to_node AS d FROM cl JOIN net n ON cl.d = n.hydroid WHERE n.to_node >= 0
      |)""".stripMargin

  val arboAgg: String =
    """arbo AS (
      |  SELECT c.d AS hydroid, sum(n.length_km) AS arbolate_km
      |  FROM cl c JOIN net n ON c.u = n.hydroid
      |  GROUP BY c.d
      |)""".stripMargin

  /** Level-path assignment CTEs (G4) — deterministic confluence tie-breaks,
    * shared by q26 and the group-roughness walk (q65). */
  val chosenCte: String =
    """chosen AS (
      |  SELECT parent, hydroid AS chosen FROM (
      |    SELECT n.to_node AS parent, n.hydroid,
      |      row_number() OVER (PARTITION BY n.to_node
      |        ORDER BY n.order_ DESC, a.arbolate_km DESC, n.hydroid DESC) AS rn
      |    FROM net n JOIN arbo a ON n.hydroid = a.hydroid WHERE n.to_node >= 0)
      |  WHERE rn = 1
      |)""".stripMargin

  val lpCte: String =
    """lp AS (
      |  SELECT n.hydroid, n.hydroid AS branch
      |  FROM net n LEFT JOIN chosen c ON c.parent = n.to_node AND c.chosen = n.hydroid
      |  WHERE n.to_node = -1 OR c.chosen IS NULL
      |  UNION ALL
      |  SELECT c.chosen AS hydroid, lp.branch
      |  FROM lp JOIN chosen c ON c.parent = lp.hydroid
      |)""".stripMargin

  def withRecursiveCtes(ctes: String*)(body: String): String =
    "WITH RECURSIVE " + ctes.mkString(",\n") + "\n" + body

  // ---- ANN over embeddings (quantized long form; pos is 0-based) ----

  val qt: String =
    """qt AS (
      |  SELECT vec_id, g.i - 1 AS pos,
      |    CAST(round(CAST(embedding[g.i] AS DOUBLE) * CAST(1000.0 AS DOUBLE)) AS BIGINT) AS q
      |  FROM embeddings CROSS JOIN generate_series(1, 256) g(i)
      |  WHERE g.i <= len(embedding)
      |)""".stripMargin

  val nrm: String =
    "nrm AS (SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS n2 FROM qt GROUP BY vec_id)"

  def withCtes(ctes: String*)(body: String): String =
    "WITH " + ctes.mkString(",\n") + "\n" + body
}
