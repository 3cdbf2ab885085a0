package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.synth.Synth
import java.nio.file.Files

/** North-rule scale behaviors beyond the operators themselves: AQE skew-join
  * splitting on the hotspot key, range partitioning on the cell prefix for
  * spatially-clustered output, and the auxiliary sink formats.
  */
class ScaleBehaviorSpec extends SparkTestBase {

  test("AQE splits the hotspot ccell partition in a shuffle join (skew-join)") {
    // hotspot key: half of all pages collapse onto one coarse cell (the
    // urban-cluster regime at its worst). The repartition matters beyond the
    // test: AQE splits a skewed reduce partition by MAP-INDEX ranges, so a
    // single-mapper upstream (one parquet file) is unsplittable — real inputs
    // need multiple map tasks for skew-join mitigation to have any effect.
    val pts = Synth.points(spark, sf001)
      .withColumn("ccell", when(col("pid") % 2 === 0, lit(0L)).otherwise(col("ccell")))
      .repartition(8, col("pid"))
    // plain (non-aggregated) dimension: skew splitting pattern-matches
    // SMJ(Sort(Shuffle), Sort(Shuffle)) — an agg between shuffle and join
    // would block it (that shape is what SaltedAgg is for)
    import spark.implicits._
    val dim = (0L +: graft.geo.Cells.cover(-90, 89.9, -180, 179.9, graft.geo.Cells.CoarseRes).toSeq)
      .toDF("ccell").withColumn("cc_n", lit(1L))
    val conf = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.logLevel" -> "WARN")
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = pts.join(dim, "ccell")
      val n = joined.collect().length.toLong // executes THIS plan → AQE final
      assert(n == pts.count())
      val plan = joined.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin") && plan.contains("skew=true"), plan.take(2000))
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(x => spark.conf.set(k, x))
    }
  }

  test("range partitioning on the cell prefix clusters output spatially") {
    val tiles = Inundate.tiles(spark, Synth.points(spark, sf0001))
      .select(col("cell"), col("depth"), col("clazz"))
    val ranged = tiles.repartitionByRange(8, col("cell"))
    assert(ranged.queryExecution.executedPlan.toString.contains("rangepartitioning"))
    // partitions hold disjoint, ordered cell ranges
    import spark.implicits._
    val bounds = ranged.mapPartitions { it =>
      val cells = it.map(_.getLong(0)).toSeq
      if (cells.isEmpty) Iterator.empty
      else Iterator((cells.min, cells.max))
    }.collect().sortBy(_._1)
    bounds.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2)
      case _ =>
    }
  }

  test("csv and json sinks round-trip the metrics table") {
    val dir = Files.createTempDirectory("graft_sinks").toString
    val metrics = graft.ops.Agreement.metrics(
      graft.ops.Agreement.agreement(spark, Inundate.run(spark, sf0001)))
    metrics.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    metrics.write.mode("overwrite").json(s"$dir/json")
    val backJson = spark.read.json(s"$dir/json")
    assert(backJson.count() == 1)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(s"$dir/csv")
    assert(back.count() == 1)
    // key metric survives the round trip exactly (json preserves doubles)
    val csi = metrics.collect()(0).getAs[Double]("csi")
    assert(backJson.collect()(0).getAs[Double]("csi") == csi)
  }
}
