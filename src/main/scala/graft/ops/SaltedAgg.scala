package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-stage salted aggregation for skewed keys — the engine's explicit skew
  * mitigation (north rule). The reference's answer to the same problem was to
  * *drop data* in dense HUCs (`src/derive_level_paths.py:62-71`,
  * HIGH_STREAM_DENSITY_HUCS); we keep all rows and split hot groups across
  * `nSalts` reducers, then combine the partials.
  *
  * Only algebraic aggregates (count/sum/min/max) are supported — exactly the
  * ones whose two-stage form is lossless and order-insensitive, so the result
  * is bit-identical to the direct groupBy (property-tested).
  */
object SaltedAgg {

  /** countAndMax: per-key row count and max of `valueCol`, salted.
    * Salt derives from a row-deterministic column (no rand(): resumability
    * and retry-stability require deterministic salts). */
  def countAndMax(df: DataFrame, key: Column, saltSrc: Column, valueCol: Column, nSalts: Int): DataFrame =
    df.groupBy(key.as("k"), (saltSrc % nSalts).as("salt"))
      .agg(count(lit(1)).as("pc"), max(valueCol).as("pm"))
      .groupBy(col("k"))
      .agg(sum(col("pc")).as("n"), max(col("pm")).as("mx"))
}
