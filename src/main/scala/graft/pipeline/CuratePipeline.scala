package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextOps
import graft.synth.Synth

/** End-to-end corpus curation with Iceberg-style persistence — the composed
  * operational job a training-data pipeline actually runs: the q50 curation
  * plan (quality gate ∧ ¬exact-dup ∧ ¬near-dup) joined back to the surviving
  * raw text, committed as a resumable snapshot table partitioned by `lang`
  * with per-partition lineage (row counts, content fingerprints, token-count
  * ranges for stats-based partition skipping).
  *
  * Kill/rerun recomputes ONLY missing partitions ([[Snapshots.writeResumable]]),
  * so a failed 100 TB curation run resumes at partition granularity instead
  * of restarting — the same per-HUC rerun discipline the reference's
  * `fim_pipeline.sh` uses for hydrofabric builds, applied to the corpus. */
object CuratePipeline {

  def run(spark: SparkSession, sfDir: String, table: String): Seq[Snapshots.PartitionLineage] = {
    val docs = Synth.corpus(spark, sfDir)
    val curated = TextOps.curate(docs)
      .join(docs.select(col("doc_id"), col("text"), col("lang")), "doc_id")
    Snapshots.writeResumable(spark, curated, table, "lang", statsCol = Some("n_tokens"))
  }
}
