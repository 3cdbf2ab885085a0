package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Scratch numbers for the round-6 optimization notes (dev tool). */
object QuickProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val dmult = sys.env.getOrElse("SPARK_GRAFT_DEDUP_MULT", "256").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      cpus * 8 * math.max(1, dmult / 64))
    val c = spark.read.parquet(s"/tmp/graft_scaled_corpus_x$dmult")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
      r
    }
    // ngramJaccard decomposition (mirrors jaccardVerify)
    val sh = TextOps.shingleHashes(c)
    t("dsh pass")(sh.queryExecution.toRdd.count())
    val bands = TextOps.lshBands(c)
    t("bands (fused)")(bands.queryExecution.toRdd.count())
    val cached = bands.cache()
    t("bands cache")(cached.count())
    val keys = Seq("band", "k0", "k1", "k2", "k3")
    val a = cached.withColumnRenamed("doc_id", "doc_a")
    val b2 = cached.withColumnRenamed("doc_id", "doc_b")
    val rawPairs = a.join(b2, keys).filter(col("doc_a") < col("doc_b"))
    t("raw band collisions")(rawPairs.count())
    val pairs = rawPairs.select("doc_a", "doc_b").distinct().cache()
    t("distinct pairs")(pairs.count())
    val pairDocs = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    t("pairDocs")(pairDocs.count())
    val shP = sh.join(pairDocs, Seq("doc_id"), "left_semi").cache()
    t("shP semi-join + cache")(shP.count())
    val inter = pairs
      .hint("shuffle_hash")
      .join(shP.select(col("doc_id").as("doc_a"), col("hb")), "doc_a")
      .hint("shuffle_hash")
      .join(shP.select(col("doc_id").as("doc_b"), col("hb")), Seq("doc_b", "hb"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("i"))
    t("inter")(inter.count())
    t("full jaccard")(TextOps.ngramJaccard(c).queryExecution.toRdd.count())
    spark.stop()
  }
}
