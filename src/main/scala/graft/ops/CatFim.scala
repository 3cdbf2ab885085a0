package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.synth.Synth

/** Flow-based categorical FIM (q55) —
  * `tools/catfim/generate_categorical_fim_flows.py:148-300` +
  * `generate_categorical_fim.py:1060-1190`: each AHPS site carries a
  * per-magnitude threshold FLOW table (action / minor / moderate / major /
  * record); each magnitude's flow is pushed through the site's rating curve
  * (np.interp) to get the categorical inundation stage, and the current
  * forecast classifies which categories are active (forecast ≥ threshold
  * flow).
  *
  * Scale shape: the site×magnitude dimension (~5 rows per gage) is broadcast
  * into the hydrotable knot scan; the interp is the same conditional
  * aggregation as the flagship's A5 (partial-agg friendly, grouped by
  * (site, magnitude)); the forecast join is a broadcast. No wide shuffle.
  */
object CatFim {

  val Magnitudes: Seq[String] = Seq("action", "minor", "moderate", "major", "record")

  /** Per-site per-magnitude threshold flows: deterministic base flow per
    * site, each magnitude 75 % higher than the last (the WRDS threshold
    * table analog). Sites = every 41st non-lake catchment. */
  def siteThresholds(spark: SparkSession): DataFrame = {
    val magName = when(col("m") === 0, lit("action"))
      .when(col("m") === 1, lit("minor"))
      .when(col("m") === 2, lit("moderate"))
      .when(col("m") === 3, lit("major"))
      .otherwise(lit("record"))
    spark.range(0, (Synth.CatRows * Synth.CatCols).toLong)
      .select(col("id").as("hydroid"))
      .filter(col("hydroid") % 41 === 0 && col("hydroid") % 97 =!= 0)
      .withColumn("m", explode(sequence(lit(0), lit(4))))
      .withColumn("magnitude", magName)
      .withColumn("discharge",
        (((col("hydroid") * 53 + 11) % 4000) / lit(10.0) + lit(5.0))
          * (lit(1.0) + col("m") * lit(0.75)))
  }

  /** (hydroid, magnitude, mag_flow, stage_m, is_active): categorical stage
    * per site and magnitude + whether the current forecast activates it. */
  def catfimFlow(spark: SparkSession): DataFrame = {
    val ht = Synth.hydrotable(spark).filter(col("lake_id") === -999)
    val interp = ht.join(broadcast(siteThresholds(spark)), "hydroid")
      .groupBy(col("hydroid"), col("m"), col("magnitude"), col("discharge"))
      .agg(RatingInterp.stageExpr.as("stage_m"))
    val qNow = Synth.forecast(spark)
      .select((col("feature_id") - 1000000L).as("hydroid"), col("discharge").as("q_now"))
    interp.join(broadcast(qNow), "hydroid")
      .select(col("hydroid"), col("magnitude"),
        col("discharge").as("mag_flow"), col("stage_m"),
        (col("q_now") >= col("discharge")).cast("int").as("is_active"))
  }
}
