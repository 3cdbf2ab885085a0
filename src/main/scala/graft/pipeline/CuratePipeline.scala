package graft.pipeline

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.TextOps
import graft.synth.Synth
import java.nio.file.{Files, Paths, StandardOpenOption}

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
  * `fim_pipeline.sh` uses for hydrofabric builds, applied to the corpus.
  *
  * Run-level metrics (kept docs/tokens) come from `Dataset.observe` — they
  * ride the write job itself (zero extra scans) and land in the manifest
  * directory's `metrics.jsonl`, the run-metrics table of the north rule. */
object CuratePipeline {

  def run(spark: SparkSession, sfDir: String, table: String): Seq[Snapshots.PartitionLineage] = {
    val docs = Synth.corpus(spark, sfDir)
    val obs = Observation()
    val curated = TextOps.curate(docs)
      .join(docs.select(col("doc_id"), col("text"), col("lang")), "doc_id")
      .observe(obs, count(lit(1)).as("curated_docs"), sum(col("n_tokens")).as("curated_tokens"))
    val lineage = Snapshots.writeResumable(spark, curated, table, "lang",
      statsCol = Some("n_tokens"))
    // the observe node sits below writeResumable's already-committed filter,
    // so these are CORPUS-level curation metrics for the run (stable across
    // resumes), not just this run's delta
    val m = obs.get
    val line = s"""{"ts":${System.currentTimeMillis()},"curated_docs":${m("curated_docs")},""" +
      s""""curated_tokens":${m("curated_tokens")},"committed_parts":${lineage.size}}"""
    val f = Paths.get(table, "_graft_manifest", "metrics.jsonl")
    Files.createDirectories(f.getParent)
    Files.write(f, (line + "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    lineage
  }

  /** The run-metrics table (one row per run). */
  def metrics(spark: SparkSession, table: String): org.apache.spark.sql.DataFrame = {
    val f = Paths.get(table, "_graft_manifest", "metrics.jsonl")
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val lines =
      if (!Files.exists(f)) Seq.empty[String]
      else Files.readAllLines(f).asScala.toSeq
    spark.read.json(lines.toDS())
  }
}
