package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.synth.Synth

/** Bucketing = the co-located-join strategy for repeated joins/aggs on the
  * same key at 100 TB (SURVEY.md §4 partitioning row): pre-shuffle once at
  * write time, then joins and aggregations on the bucket key need no
  * exchange at read time.
  */
class BucketingSpec extends SparkTestBase {

  test("bucketed tables: join + agg on the bucket key run with zero shuffle") {
    val assigned = graft.ops.SpatialJoin.assign(spark, Synth.points(spark, sf0001))
      .select(col("pid"), col("hydroid").cast("long").as("hydroid"), col("hand"))
    spark.sql("DROP TABLE IF EXISTS pts_bucketed")
    assigned.write.bucketBy(8, "hydroid").sortBy("hydroid")
      .mode("overwrite").saveAsTable("pts_bucketed")

    val t = spark.table("pts_bucketed")
    // zonal agg on the bucket key: no exchange between partial and final
    val agg = t.groupBy(col("hydroid")).agg(min(col("hand")).as("mn"), count(lit(1)).as("n"))
    agg.collect()
    val aggPlan = agg.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!aggPlan.contains("Exchange"), aggPlan.take(1500))

    // self-join on the bucket key: no shuffle on either side
    val j = t.as("a").join(t.as("b"), "hydroid")
    j.count()
    val jPlan = j.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!jPlan.contains("ShuffleExchange") && !jPlan.contains("Exchange hashpartitioning"),
      jPlan.take(1500))

    // and the results equal the unbucketed computation
    val direct = assigned.groupBy(col("hydroid")).agg(min(col("hand")).as("mn"), count(lit(1)).as("n"))
    assert(agg.except(direct).isEmpty && direct.except(agg).isEmpty)
  }
}
