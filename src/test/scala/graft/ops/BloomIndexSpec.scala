package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, SharedSpark}

/** Behavioral specs for the sharded Bloom pre-filter: the structural
  * guarantees (no false negatives, maybe ⊇ exact) and the bounded filter
  * size. Bit-parity incl. deterministic false positives is the q136 oracle
  * row; partitioning-invariance is InvarianceSpec. */
class BloomIndexSpec extends SparkTestBase {
  import SharedSpark.spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))

  test("bloom probe: zero false negatives; maybe_present dominates exact") {
    val base = docs((0L until 200L).map(i => (i * 2, s"base doc number $i")): _*)
    val batch = docs(
      // 50 batch docs share base content, 150 are fresh
      ((0L until 50L).map(i => (10000 + i, s"base doc number $i")) ++
        (0L until 150L).map(i => (20000 + i, s"fresh doc number $i"))): _*)
    val got = BloomIndex.probe(base, batch)
      .select("doc_id", "maybe_present", "present_exact")
      .as[(Long, Int, Int)].collect()
    assert(got.length == 200)
    // the Bloom guarantee: present ⇒ maybe (no false negatives, ever)
    assert(got.forall { case (_, maybe, exact) => maybe >= exact },
      "a present_exact doc slipped past the filter (false negative)")
    assert(got.count(_._3 == 1) == 50, "exact membership must match the overlap")
  }

  test("bloom filter table is bounded by shards × words regardless of base size") {
    val base = docs((0L until 500L).map(i => (i, s"filler text $i")): _*)
    val filt = BloomIndex.build(base)
    assert(filt.count() <= BloomIndex.Shards.toLong * BloomIndex.WordsPerShard)
    // no bit 63: every word stays non-negative so >> semantics are portable
    assert(filt.filter(col("bits") < 0).count() == 0)
  }

  test("production probe vs a persisted filter is map-only: zero shuffle exchanges") {
    val base = docs((0L until 100L).map(i => (i, s"doc $i")): _*)
    // persist the filter as production would, so the probe plan is measured
    // against an artifact scan, not against the build's own aggregation
    val dir = java.nio.file.Files.createTempDirectory("bloomfilt").toString
    BloomIndex.build(base).write.mode("overwrite").parquet(dir)
    val filt = SharedSpark.spark.read.parquet(dir)
    val batch = docs((0L until 100L).map(i => (1000 + i, s"doc ${i * 2}")): _*)
    val out = BloomIndex.probeAgainst(filt, batch)
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"),
      s"bloom probe must not shuffle the batch:\n${plan.take(3000)}")
    // and it still computes the same maybe_present as the audit wrapper
    val viaProbe = BloomIndex.probe(base, batch)
      .select("doc_id", "maybe_present").as[(Long, Int)].collect().toMap
    val viaArtifact = out.select("doc_id", "maybe_present")
      .as[(Long, Int)].collect().toMap
    assert(viaProbe == viaArtifact)
  }

  test("bloom probe is deterministic (two runs, identical rows)") {
    val base = docs((0L until 50L).map(i => (i, s"doc $i")): _*)
    val batch = docs((0L until 50L).map(i => (100 + i, s"doc ${i * 3}")): _*)
    val a = BloomIndex.probe(base, batch).collect().map(_.toString).sorted
    val b = BloomIndex.probe(base, batch).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
