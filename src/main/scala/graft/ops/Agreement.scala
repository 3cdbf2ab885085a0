package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import graft.geo.Cells

/** Evaluation lifecycle — SURVEY.md §3.3 (`tools/tools_shared_functions.py`):
  * predicted vs benchmark extents per cell → agreement class → contingency
  * metrics. Class coding follows the reference
  * (`tools_shared_functions.py:400-406,442-455`):
  *   0 TN / 1 FN / 2 FP / 3 TP / 4 masked.
  *
  * The synthetic benchmark extent is a pure function of the cell id (row/col
  * hash), mirroring the driver-side oracle bit-for-bit; masked cells are the
  * exclusion-polygon analog (`tools_shared_functions.py:457-509`).
  */
object Agreement {

  def cellRow(cell: Column): Column =
    shiftright(cell, Cells.ROW_BITS.toInt)
      .bitwiseAND(lit((1L << (Cells.RES_BITS - Cells.ROW_BITS)) - 1L))
  def cellCol(cell: Column): Column = cell.bitwiseAND(lit((1L << Cells.ROW_BITS) - 1L))

  /** Benchmark wet flag per cell (0/1) — deterministic extent synth. */
  def benchWet(cell: Column): Column =
    ((cellRow(cell) * 31 + cellCol(cell) * 17) % 10 < 4).cast("int")

  /** Exclusion mask per cell — the masked-area analog. */
  def isMasked(cell: Column): Column =
    (cellRow(cell) * 29 + cellCol(cell) * 13) % 50 === 0

  /** mosaic(cell, depth_max, …) → (cell, agreement). */
  def agreement(mosaic: DataFrame): DataFrame =
    mosaic.select(
      col("cell"),
      when(isMasked(col("cell")), lit(4))
        .otherwise((col("depth_max") > 0).cast("int") * 2 + benchWet(col("cell")))
        .cast("int").as("agreement"))

  /** Contingency counts + the reference's printworthy metrics
    * (`tools_shared_functions.py:1666-1689`): CSI, TPR, FAR, MCC, ACC, F1,
    * plus bias. All derived in exact double arithmetic from BIGINT counts. */
  def metrics(agreementDf: DataFrame): DataFrame = {
    val counted = agreementDf.agg(
      count(when(col("agreement") === 0, 1)).as("tn"),
      count(when(col("agreement") === 1, 1)).as("fn"),
      count(when(col("agreement") === 2, 1)).as("fp"),
      count(when(col("agreement") === 3, 1)).as("tp"),
      count(when(col("agreement") === 4, 1)).as("masked"))
    val tp = col("tp").cast("double"); val tn = col("tn").cast("double")
    val fp = col("fp").cast("double"); val fn = col("fn").cast("double")
    counted.select(
      col("tn"), col("fn"), col("fp"), col("tp"), col("masked"),
      (tp / (tp + fp + fn)).as("csi"),
      (tp / (tp + fn)).as("tpr"),
      (fp / (tp + fp)).as("far"),
      ((tp * tn - fp * fn) /
        sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))).as("mcc"),
      ((tp + tn) / (tp + tn + fp + fn)).as("acc"),
      (tp * 2 / (tp * 2 + fp + fn)).as("f1"),
      ((tp + fp) / (tp + fn)).as("bias"))
  }
}
