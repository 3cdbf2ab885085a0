package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.geo.Cells
import graft.ops.Agreement

/** Inundation-extent dissolve (q58) — the raster→vector output step of
  * `tools/mosaic_inundation.py:153-188` (gdal polygonize + dissolve): wet
  * mosaic cells grouped into per-catchment extents with
  *  - cell count and nominal area,
  *  - bbox of cell centroids (the extent geometry a GIS consumer gets),
  *  - boundary-cell count: cells with fewer than 4 same-extent wet
  *    4-neighbors — the marching-squares-style perimeter measure that a full
  *    polygon tracer would walk.
  *
  * Scale shape: one self-equi-join of the wet-cell set against its exploded
  * neighbor ids (linear fan-out ×4), then two hash aggregations — no
  * all-pairs, no driver-side geometry. Off-grid neighbor ids (row −1 / 4096,
  * col −1 / 8192) can never match a real wet cell, so edges fall out as
  * boundary cells without special-casing.
  */
object Extents {

  /** mosaic (cell, clazz, …) → one row per wet extent (clazz > 0 ⇔ wet,
    * clazz = hydroid by the sign convention of `tools/inundation.py:350-359`). */
  def dissolve(mosaic: DataFrame): DataFrame = {
    val wet = mosaic.filter(col("clazz") > 0).select(col("cell"), col("clazz"))
    val row = Agreement.cellRow(col("cell"))
    val c = Agreement.cellCol(col("cell"))
    val base = lit(Cells.BaseRes.toLong << Cells.RES_BITS)
    val step = lit(1L << Cells.ROW_BITS)
    val nbr = wet.select(col("cell"), col("clazz"), explode(array(
      base + (row + 1) * step + c,
      base + (row - 1) * step + c,
      base + row * step + (c + 1),
      base + row * step + (c - 1))).as("ncell"))
    val wetN = wet.select(col("cell").as("ncell"), col("clazz"), lit(1).as("hit"))
    val deg = nbr.join(wetN, Seq("ncell", "clazz"), "left")
      .groupBy(col("cell"), col("clazz"))
      .agg(count(col("hit")).as("nn"))
    deg
      .withColumn("clat", Cells.centroidLatCol(col("cell"), Cells.BaseRes))
      .withColumn("clng", Cells.centroidLngCol(col("cell"), Cells.BaseRes))
      .groupBy(col("clazz").as("hydroid"))
      .agg(count(lit(1)).as("n_cells"),
        count(when(col("nn") < 4, 1)).as("n_boundary"),
        min(col("clat")).as("lat_min"), max(col("clat")).as("lat_max"),
        min(col("clng")).as("lng_min"), max(col("clng")).as("lng_max"),
        (count(lit(1)) * (lit(180.0) / lit(4096.0)) * (lit(360.0) / lit(8192.0)))
          .as("area_deg2"))
  }
}
