package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.AnnSearch

/** One-off IVF quantizer tuning sweep: recall@5 vs brute force across
  * seeding strategy × Lloyd rounds × list count × nProbe, with the scanned
  * candidate fraction printed next to each recall so the comparison is at
  * matched cost. Drives the round-4 "IVF recall ≥ 0.6 at ≤ 10 % scanned,
  * or demote" decision; results are recorded in AnnSpec + BENCH/BASELINE.md.
  */
object IvfTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(
      sys.env.getOrElse("SPARK_GRAFT_EMB", "/root/testdata/sf0.1/embeddings.parquet")).cache()
    val nVec = emb.count()
    val brute = AnnSearch.bruteTopK(emb, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val nQ = brute.map(_._1).size
    def recallOf(rows: Array[org.apache.spark.sql.Row]): Double =
      brute.intersect(rows.map(r => (r.getLong(0), r.getLong(2))).toSet).size.toDouble / brute.size

    if (sys.env.get("SPARK_GRAFT_IVF_GRID").contains("r5")) {
      // Round-5 bounded attempt (VERDICT item 9): the two untried levers at
      // matched MEASURED scan cost — finer quantization (C=80: ~25 vecs per
      // list) and SOAR-style multi-assignment (each vector indexed under its
      // 2 best lists, so boundary-straddling neighbors are findable from
      // either side). kmeans++ + 3 Lloyd rounds fixed (the r4 winner).
      for (c <- Seq(40, 80)) {
        val init = AnnSearch.seedCentroidsPP(emb, c)
        val cents = AnnSearch.kmeansIterateFrom(emb, init, 3).cache()
        cents.count()
        for (na <- Seq(1, 2); p <- Seq(2, 4, 6, 8)) {
          val res = AnnSearch.ivfTopKWith(emb, cents, 5, nProbe = p, nAssign = na).collect()
          val nCand = AnnSearch.ivfCandidatesWith(emb, cents, nProbe = p, nAssign = na).count()
          val scan = nCand.toDouble / (nQ.toDouble * nVec)
          println(f"[ivftune] C=$c%d seed=pp    rounds=3 nAssign=$na%d nProbe=$p%d " +
            f"scan=$scan%.3f recall@5=${recallOf(res)}%.3f")
        }
        cents.unpersist()
      }
      spark.stop(); return
    }
    for (c <- Seq(20, 40)) {
      val seeds = Map(
        "idsub" -> AnnSearch.trainedCentroids(emb, centroidMod = (nVec / c).toInt),
        "pp" -> AnnSearch.seedCentroidsPP(emb, c))
      for ((sname, init) <- seeds; rounds <- Seq(0, 3, 8)) {
        val cents = if (rounds == 0) init
          else AnnSearch.kmeansIterateFrom(emb, init, rounds)
        val centsC = cents.cache(); centsC.count()
        for (p <- Seq(1, 2, 3, 4, 6)) {
          val res = AnnSearch.ivfTopKWith(emb, centsC, 5, nProbe = p).collect()
          // MEASURED scanned fraction: distinct rerank candidates per query
          // over the corpus (probed lists are population-skewed, so the
          // nominal nProbe/C mis-states the real cost)
          val nCand = AnnSearch.ivfCandidatesWith(emb, centsC, nProbe = p).count()
          val scan = nCand.toDouble / (nQ.toDouble * nVec)
          val nominal = p.toDouble / c
          println(f"[ivftune] C=$c%d seed=$sname%-5s rounds=$rounds%d nProbe=$p%d " +
            f"scan=$scan%.3f (nominal=$nominal%.3f) recall@5=${recallOf(res)}%.3f")
        }
        centsC.unpersist()
      }
    }
    spark.stop()
  }
}
