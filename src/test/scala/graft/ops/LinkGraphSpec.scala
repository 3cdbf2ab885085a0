package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, SharedSpark}

/** Behavioral specs for the link-graph ops: PageRank structural invariants
  * on the synthetic 3-out-link graph. Bit-parity with the unrolled DuckDB
  * iteration is the q140 oracle row. */
class LinkGraphSpec extends SparkTestBase {
  import SharedSpark.spark.implicits._

  private def docs(n: Long) =
    (0L until n).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))

  test("pageRank: one row per node; ranks positive; mass ≤ 1e9 (floor loss only)") {
    val d = docs(200)
    val got = LinkGraph.pageRank(d)
      .select("doc_id", "rank_ppb", "n_in", "n_out")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == 200)
    assert(got.forall(_._2 > 0), "teleport guarantees a positive rank")
    val mass = got.map(_._2).sum
    assert(mass <= 1000000000L, s"floors only ever LOSE mass: $mass")
    assert(mass >= 900000000L, s"losses are floor-sized, not structural: $mass")
    // out-degree ≤ 3 by construction; in-degree sums to edge count
    assert(got.forall(_._4 <= 3))
    assert(got.map(_._3).sum == got.map(_._4).sum)
  }

  test("pageRank: a node every other node links to outranks a leaf") {
    // hand-built graph via the same hash formula is opaque; instead assert
    // the monotonicity the algorithm must deliver on the synthetic graph:
    // rank correlates with in-degree at the extremes
    val got = LinkGraph.pageRank(docs(500))
      .select("rank_ppb", "n_in").as[(Long, Long)].collect()
    val maxIn = got.maxBy(_._2)
    val zeroIn = got.filter(_._2 == 0)
    assert(zeroIn.nonEmpty, "the hash graph leaves some nodes unreferenced")
    assert(zeroIn.forall(_._1 < maxIn._1),
      "the most-linked node must outrank every unreferenced node")
  }

  test("pageRank: deterministic across runs") {
    val d = docs(100)
    val a = LinkGraph.pageRank(d).collect().map(_.toString).sorted
    val b = LinkGraph.pageRank(d).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
