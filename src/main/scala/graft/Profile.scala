package graft

import org.apache.spark.sql.SparkSession
import graft.ops.TextOps
import graft.synth.Synth

/** Ad-hoc profiling main for slow queries (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }
    val corpus = Synth.corpus(spark, sfDir)
    t("corpus")(corpus.count())
    t("shingles")(TextOps.shingles(corpus).count())
    t("minhashLong")(TextOps.minhashLong(corpus).count())
    t("lshBands")(TextOps.lshBands(corpus).count())
    t("lshPairs")(TextOps.lshPairs(corpus).queryExecution.toRdd.count())
    t("jaccard")(TextOps.ngramJaccard(corpus).queryExecution.toRdd.count())
    t("minhashFull")(TextOps.minhashLong(corpus).queryExecution.toRdd.count())
    t("simhashFull")(TextOps.simhash16(corpus).queryExecution.toRdd.count())
    t("fingerprintFull")(TextOps.fingerprint(corpus).queryExecution.toRdd.count())
    // curate decomposition (q50's cost structure)
    spark.catalog.clearCache()
    t("quality")(TextOps.quality(corpus).filter(org.apache.spark.sql.functions.col("keep") === 1)
      .queryExecution.toRdd.count())
    spark.catalog.clearCache()
    t("jaccard_chain")(TextOps.ngramJaccard(corpus).queryExecution.toRdd.count())
    spark.catalog.clearCache()
    t("curate_full")(TextOps.curate(corpus).queryExecution.toRdd.count())
    t("curate_warm")(TextOps.curate(corpus).queryExecution.toRdd.count())
    spark.stop()
  }
}
