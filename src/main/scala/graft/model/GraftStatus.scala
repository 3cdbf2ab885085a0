package graft.model

/** The reference's error taxonomy preserved as a typed status model
  * (`src/utils/fim_enums.py` FIM_exit_codes; raised at
  * `src/derive_level_paths.py:47,60`, `src/split_flows.py:155,248,283`).
  * The reference signals these as process exit codes across its GNU-parallel
  * process boundaries; in the Spark engine a failed unit must not kill the
  * job, so units report status rows instead (per-partition status table,
  * same spirit as the lineage table) and the codes ride along.
  */
object GraftStatus extends Enumeration {
  val Success: GraftStatus.Value = Value(0)
  val Fail: GraftStatus.Value = Value(1)
  val UnitNoBranches: GraftStatus.Value = Value(60)
  val NoFlowlinesExist: GraftStatus.Value = Value(61)
  val ExcessUnitErrors: GraftStatus.Value = Value(62)
  val NoBranchLevelpathsExist: GraftStatus.Value = Value(63)
  val NoValidCrosswalks: GraftStatus.Value = Value(64)
}

/** Typed unit-failure carrying the reference exit code — thrown by operators
  * when a required intermediate comes up empty (the analog of
  * `tools/inundation.py:592-594`'s NoForecastFound / hydroTable assertions). */
final case class GraftUnitException(code: GraftStatus.Value, unit: String, msg: String)
    extends RuntimeException(s"[${code.id}:$code] unit=$unit $msg")
