package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Stage decomposition for the incremental-dedup leg (dev tool): times each
  * sub-plan of [[TextOps.incrementalDedup]] over a pre-materialized scaled
  * corpus (`/tmp/graft_scaled_corpus_x<m>`), under the bench leg's exact
  * AQE configuration, so a sub-linear large/mid docs-per-second ratio can
  * be attributed to a stage instead of guessed at. */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val m = sys.env.getOrElse("SPARK_GRAFT_DEDUP_MULT", "256").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // heap comes from build.sbt's javaOptions (-Xmx at JVM launch) — setting
    // spark.driver.memory on an in-process builder would be a silent no-op
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the bench leg's exact AQE configuration, including its per-leg scaling
    // (Bench sizes the initial partition count to the corpus, cpus·8·m/64)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      cpus * 8 * math.max(1, m / 64))
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF x$m $name: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }
    val docs = spark.read.parquet(s"/tmp/graft_scaled_corpus_x$m")
    t("docs")(docs.count())
    val idSplit = 1000000L
    val sh = TextOps.shingleHashes(docs)
    t("sh_materialize")(sh.count())
    val bands = TextOps.bandsOf(TextOps.minhashWideFrom(sh))
    t("bands")(bands.queryExecution.toRdd.count())
    val bandsC = bands.cache()
    t("bands_cache")(bandsC.count())
    val keys = Seq("band", "k0", "k1", "k2", "k3")
    val base = bandsC.filter(col("doc_id") < idSplit).withColumnRenamed("doc_id", "doc_a")
    val batch = bandsC.filter(col("doc_id") >= idSplit).withColumnRenamed("doc_id", "doc_b")
    val pairs = base.join(batch, keys).select("doc_a", "doc_b").distinct().cache()
    t("pairs")(pairs.count())
    val baseSh = sh.filter(col("doc_id") < idSplit)
    val batchSh = sh.filter(col("doc_id") >= idSplit)
    // the pairs-scoped semi-join reduction, as in incrementalDedupAgainst
    val docsB = pairs.select(col("doc_b").as("doc_id")).distinct()
    val batchShP = batchSh.join(docsB, Seq("doc_id"), "left_semi")
    t("szb")(batchShP.groupBy(col("doc_id").as("doc_b")).agg(count(lit(1)).as("szb"))
      .queryExecution.toRdd.count())
    val docsA = pairs.select(col("doc_a").as("doc_id")).distinct()
    val baseShP = baseSh.join(docsA, Seq("doc_id"), "left_semi")
    val inter = pairs
      .hint("shuffle_hash")
      .join(baseShP.select(col("doc_id").as("doc_a"), col("hb")), "doc_a")
      .hint("shuffle_hash")
      .join(batchShP.select(col("doc_id").as("doc_b"), col("hb")), Seq("doc_b", "hb"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("i"))
    t("inter")(inter.queryExecution.toRdd.count())
    t("full")(TextOps.incrementalDedup(docs, idSplit).queryExecution.toRdd.count())
    spark.stop()
  }
}
