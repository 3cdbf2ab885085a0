package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types._
import graft.ops.RatingInterp

/** Structured-Streaming front end: the reference is batch-only (forecast CSV
  * per run, `tools/inundation.py:596-606`); the Spark-native engine upgrades
  * the forecast side to a stream — each micro-batch of (feature_id,
  * discharge, event_ts) recomputes interpolated stages against the static
  * hydrotable, with a watermark for late forecasts.
  */
object ForecastStream {

  val forecastSchema: StructType = StructType(Seq(
    StructField("feature_id", LongType), StructField("discharge", DoubleType),
    StructField("event_ts", TimestampType)))

  /** Windowed per-feature max-discharge stream (watermarked). */
  def windowedMaxDischarge(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(forecastSchema).parquet(dir)
      .withWatermark("event_ts", "10 minutes")
      .groupBy(window(col("event_ts"), "5 minutes"), col("feature_id"))
      .agg(max(col("discharge")).as("discharge"), count(lit(1)).as("n_updates"))

  /** Per-micro-batch stage recomputation: stream–static join + interp, via
    * foreachBatch (the operational pattern: each batch is "a forecast run"). */
  def stagesPerBatch(spark: SparkSession, dir: String, hydrotable: DataFrame)
      (sink: (DataFrame, Long) => Unit): StreamingQuery =
    spark.readStream.schema(forecastSchema).parquet(dir)
      .writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val fc = batch.select(col("feature_id"), col("discharge"))
          .groupBy("feature_id").agg(max("discharge").as("discharge"))
        sink(RatingInterp.stages(hydrotable, fc), id)
      }
      .start()

  final case class FeatureState(featureId: Long, maxQ: Double, n: Long)

  /** Stateful running max discharge per feature across all micro-batches
    * (KeyValueGroupedDataset.mapGroupsWithState — custom state op). */
  def runningMax(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.readStream.schema(forecastSchema).parquet(dir)
      .as[(Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (fid: Long, rows: Iterator[(Long, Double, java.sql.Timestamp)], st: GroupState[FeatureState]) =>
          val prev = st.getOption.getOrElse(FeatureState(fid, Double.NegativeInfinity, 0L))
          val batchMax = rows.foldLeft(prev) { (acc, r) =>
            FeatureState(fid, math.max(acc.maxQ, r._2), acc.n + 1)
          }
          st.update(batchMax)
          batchMax
      }
      .toDF()
  }
}
