package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Agreement
import graft.pipeline.Inundate
import graft.synth.Synth

/** Per-round benchmark: one JSON line on stdout.
  * Headline metric: flagship spatial-join + tile-assignment throughput in
  * pages/sec (scan → geocode → H3 encode → PIP broadcast join → rating
  * interp → depth/class → mosaic → agreement → metrics), on an 8×-exploded
  * pages table. `queries` carries per-operator wall seconds.
  */
object Bench {

  /** Points table multiplied `m`× with distinct pids (bench-scale corpus). */
  def scaledPoints(spark: SparkSession, sfDir: String, m: Int, parts: Int): DataFrame =
    Synth.withGeo(
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select((col("l_orderkey") * 8 + col("l_linenumber")).cast("long").as("pid0"))
        .repartition(parts, col("pid0"))
        .withColumn("j", explode(sequence(lit(0), lit(m - 1))))
        .select((col("pid0") + col("j") * 50000000L).as("pid")))

  /** One flagship end-to-end run; returns (rows processed, seconds). */
  def flagship(spark: SparkSession, sfDir: String, m: Int, parts: Int): (Long, Double) = {
    val t0 = System.nanoTime()
    val pts = scaledPoints(spark, sfDir, m, parts)
    val mosaic = Inundate.mosaic(Inundate.tiles(spark, pts))
    val metrics = Agreement.metrics(Agreement.agreement(mosaic))
    val nTiles = mosaic.agg(sum(col("n_points"))).collect()(0).getLong(0)
    metrics.collect()
    (nTiles, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm JIT/codegen caches with a tiny run, then measure
    flagship(spark, "/root/testdata/sf0.001", 1, cpus)
    val (rows, secs) = flagship(spark, sfDir, mult, cpus * 3)
    val pagesPerSec = rows / secs

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // toRdd.count() materializes EVERY output column — a plain count()
      // would let Catalyst prune the expensive expressions out of the plan
      try { fn(spark, sfDir).queryExecution.toRdd.count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = (results :+ ("flagship_e2e" -> secs))
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    println(s"""{"metric":"flagship pages/sec (rows=$rows, ${cpus} cores, x$mult)","value":${f"$pagesPerSec%.1f"},"unit":"pages/sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
