package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Bench
import graft.ops._

/** Round-6 optimization harness (guide §1): per-op isolation timings over the
  * SAME scaled corpus and the SAME action (`queryExecution.toRdd.count()`) as
  * the frozen `graft.Bench` dedup campaign, plus sub-chain probes that
  * attribute an op's wall to its stages, plus `.explain("formatted")` dumps
  * for plans/r06/. Never writes BENCH/last_bench.json.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_DEDUP_MULT,
  * SPARK_GRAFT_EXTRA_OPS (comma list; default all), SPARK_GRAFT_EXTRA_REPS,
  * SPARK_GRAFT_EXTRA_PLANDIR (dump plans instead of timing).
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val dmult = sys.env.getOrElse("SPARK_GRAFT_DEDUP_MULT", "64").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPS", "1").toInt
    val planDir = sys.env.get("SPARK_GRAFT_EXTRA_PLANDIR")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val path = s"/tmp/graft_scaled_corpus_x$dmult"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
      Bench.scaledCorpus(spark, sfDir, dmult).write.mode("overwrite").parquet(path)
    val c = spark.read.parquet(path)
    // same per-leg AQE sizing as the frozen bench campaign
    spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      cpus * 8 * math.max(1, dmult / 64))

    val ops: Seq[(String, DataFrame => DataFrame)] = Seq(
      "exact" -> (c => TextOps.exactDupGroups(c)),
      "minhash" -> (c => TextOps.minhashWide(c)),
      "lsh_pairs" -> (c => TextOps.lshPairs(c)),
      "jaccard" -> (c => TextOps.ngramJaccard(c)),
      "simhash" -> (c => TextOps.simhash16(c)),
      "fingerprint" -> (c => TextOps.fingerprint(c)),
      "curation" -> (c => TextOps.curate(c)),
      "para_dedup" -> (c => WebCuration.paragraphDedup(c)),
      "incr_dedup" -> (c => TextOps.incrementalDedup(c, 1000000L)),
      "dup_components" -> (c => DedupGraph.dupComponents(c)),
      "dup_spans" -> (c => TextOps.dupSpanProfile(c)),
      "bpe_pairs" -> (c => Lexicon.bpePairs(c)),
      // sub-chain probes (not bench legs): stage attribution
      "probe_shingle_hashes" -> (c => TextOps.shingleHashes(c)),
      "probe_shingles_multiset" -> (c => TextOps.shingles(c)),
      "probe_minhash_bands" -> (c => TextOps.lshBands(c)),
      "probe_repetition" -> (c => TextOps.repetition(c)),
      "probe_kmv" -> (c => TextOps.kmvDistinct(c)),
      "probe_dup_span_removal" -> (c => TextOps.dupSpanRemoval(c)),
      "probe_containment" -> (c => TextOps.containment(c)))

    val filter = sys.env.get("SPARK_GRAFT_EXTRA_OPS").map(_.split(",").toSet)
    val sel = filter.fold(ops)(f => ops.filter(o => f(o._1)))

    planDir match {
      case Some(dir) =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        sel.foreach { case (nm, f) =>
          val plan = f(c).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/$nm.txt"), plan)
          println(s"[extra] wrote $dir/$nm.txt")
        }
      case None =>
        val results = sel.map { case (nm, f) =>
          val secs = (1 to reps).map { _ =>
            spark.sparkContext.setJobDescription(s"extra: $nm x$dmult")
            val t0 = System.nanoTime()
            f(c).queryExecution.toRdd.count()
            val s = (System.nanoTime() - t0) / 1e9
            spark.catalog.clearCache()
            s
          }
          println(f"[extra] $nm%-24s x$dmult min=${secs.min}%8.3f  all=${secs.map(x => f"$x%.3f").mkString(",")}")
          nm -> secs.min
        }
        println(results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
          .mkString(s"""{"extra_mult":$dmult,"secs":{""", ",", "}}"))
    }
    spark.stop()
  }
}
