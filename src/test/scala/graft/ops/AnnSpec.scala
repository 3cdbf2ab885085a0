package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class AnnSpec extends SparkTestBase {

  lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()

  test("brute top-k: correct k, no self-match, cos in [-1,1], ranks ordered") {
    val rows = AnnSearch.bruteTopK(emb, k = 5).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (qv, rs) =>
      assert(rs.length == 5)
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to 5))
      rs.foreach { r =>
        assert(r.getLong(2) != qv)
        assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9)
      }
      // cos non-increasing with rank
      val byRank = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("brute top-1 matches driver-side exact cosine argmax") {
    val vecs = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray.map(f => math.round(f.toDouble * 1000.0)))
      .toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) * math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val top1 = AnnSearch.bruteTopK(emb, k = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    top1.foreach { case (qv, (vec, c)) =>
      val best = vecs.filter(_._1 != qv)
        .map { case (id, v) => (id, cos(vecs(qv), v)) }
        .maxBy { case (id, s) => (s, -id) }
      assert(best._1 == vec && best._2 == c, s"qvec=$qv")
    }
  }

  test("multi-table SRP ANN reaches recall@5 >= 0.9 vs brute force (2 bits x 12 tables)") {
    val embBig = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val brute = AnnSearch.bruteTopK(embBig, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = AnnSearch.srpTopK(embBig, 5, nBits = 2, tables = 12).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = brute.intersect(approx).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall=$recall")
  }

  test("IVF ANN: measured recall@5 vs brute force; candidates a fraction of the corpus") {
    val embBig = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val brute = AnnSearch.bruteTopK(embBig, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = AnnSearch.ivfTopK(embBig, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    // C = N/50 = 40 lists, nProbe 3 ⇒ candidates ≈ 7.5 % of the corpus.
    // Measured recall@5 = 0.275 — 3.7× better than random candidate
    // selection, but far below the multi-table SRP path's 0.95: on these
    // WEAKLY-clustered synthetic embeddings (neighbor cos ≈ 0.4) true
    // neighbors scatter across IVF lists, the documented failure mode that
    // makes SRP the preferred scale path here. Gate on the relative lift so
    // the probe targeting itself is still verified.
    val scannedFraction = 3.0 / 40.0
    assert(recall >= 3 * scannedFraction, s"recall=$recall (scanned $scannedFraction)")
  }

  test("IVF with one trained Lloyd round: recall pair recorded, trained >= untrained") {
    val embBig = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").cache()
    val brute = AnnSearch.bruteTopK(embBig, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recallOf(rows: Array[org.apache.spark.sql.Row]): Double =
      brute.intersect(rows.map(r => (r.getLong(0), r.getLong(2))).toSet).size.toDouble / brute.size
    val untrained = recallOf(AnnSearch.ivfTopK(embBig, 5).collect())
    val trained = recallOf(
      AnnSearch.ivfTopKWith(embBig, AnnSearch.trainedCentroids(embBig), 5).collect())
    val trained2 = recallOf(
      AnnSearch.ivfTopKWith(embBig, AnnSearch.kmeansIterate(embBig, 2), 5).collect())
    info(s"IVF recall@5: untrained=$untrained 1-round=$trained 2-round=$trained2")
    // an M-step moves centroids toward their members' means — the lists a
    // query probes then hold more of its true neighborhood
    assert(trained >= untrained, s"trained=$trained < untrained=$untrained")
    assert(trained2 >= untrained, s"trained2=$trained2 < untrained=$untrained")
    // the nProbe knob: more probed lists = proportionally more scanned
    // candidates and monotonically more recall — the trade a user tunes
    val cents = AnnSearch.trainedCentroids(embBig)
    val curve = Seq(1, 3, 6).map(p =>
      p -> recallOf(AnnSearch.ivfTopKWith(embBig, cents, 5, nProbe = p).collect()))
    info(s"IVF recall@5 vs nProbe (trained): $curve")
    curve.sliding(2).foreach { case Seq((_, a), (_, b)) =>
      assert(b >= a, s"recall fell as nProbe grew: $curve")
    }

    // ROUND-4 TUNING VERDICT (full grid: graft.tools.IvfTune — seeding
    // {id-subset, kmeans++ farthest-first} × Lloyd rounds {0,3,8} × lists
    // {20,40} × nProbe {1,2,3,4,6}): the best 10%-scan config is C=40,
    // id-subset seed + 3 Lloyd rounds, nProbe=4 → recall@5 = 0.525; kmeans++
    // seeding converges into the same 0.45-0.48 band, and 0.6 recall needs
    // ≥ 15-20% of the corpus scanned regardless of seeding or rounds. The
    // weakly-clustered synthetic embeddings (neighbor cos ≈ 0.4) scatter
    // true neighborhoods across lists — a data property, not a plan defect.
    // This assert pins the tuned band so a regression is visible.
    val tuned = recallOf(AnnSearch.ivfTopKWith(
      embBig,
      AnnSearch.kmeansIterateFrom(embBig, AnnSearch.trainedCentroids(embBig), 3),
      5, nProbe = 4).collect())
    info(s"IVF best-at-10%-scan (C=40, 3 rounds, nProbe=4): recall@5 = $tuned")
    assert(tuned >= 0.45, s"tuned IVF fell below its recorded band: $tuned")

    // ROUND-5 BOUNDED RETUNE (graft.tools.IvfTune SPARK_GRAFT_IVF_GRID=r5 —
    // lists {40,80} × nAssign {1,2} × nProbe {2,4,6,8}, kmeans++ + 3 rounds
    // fixed): FINER quantization clears the bar the r4 grid could not —
    // C=80 (~25 vecs/list), nProbe=8 reaches recall@5 = 0.600 at a MEASURED
    // 9.9% scanned fraction (the "≥0.6 at ≤10% scan" re-promotion bar).
    // SOAR-style multi-assignment (nAssign=2) is the better lever at coarse
    // C (C=40: 0.525@9.9% vs 0.475@10% single-assign) and extends the
    // recall-vs-scan curve monotonically to 0.725@19% (C=80, nAssign=2,
    // nProbe=8). VERDICT UNCHANGED IN RANK: SRP (0.95) stays the production
    // path — IVF at the bar is a legitimate baseline a tightly-clustered
    // real corpus would re-promote, no longer a failed one. Pinned here.
    val c80 = AnnSearch.kmeansIterateFrom(embBig, AnnSearch.seedCentroidsPP(embBig, 80), 3)
      .cache()
    val tuned80 = recallOf(
      AnnSearch.ivfTopKWith(embBig, c80, 5, nProbe = 8).collect())
    val nCand = AnnSearch.ivfCandidatesWith(embBig, c80, nProbe = 8).count()
    val scan80 = nCand.toDouble / (brute.map(_._1).size.toDouble * embBig.count())
    info(f"IVF r5 retune (C=80, pp+3 rounds, nProbe=8): recall@5 = $tuned80 at scan=$scan80%.3f")
    assert(tuned80 >= 0.55, s"retuned IVF fell below its recorded band: $tuned80")
    assert(scan80 <= 0.12, f"retuned IVF scan fraction drifted above budget: $scan80%.3f")
    // multi-assignment dominates single-assignment at equal C and probe
    // count (the index holds each vector twice, so every query sees a
    // superset of the single-assign candidates)
    val dual = recallOf(
      AnnSearch.ivfTopKWith(embBig, c80, 5, nProbe = 6, nAssign = 2).collect())
    val single = recallOf(
      AnnSearch.ivfTopKWith(embBig, c80, 5, nProbe = 6).collect())
    info(s"IVF nAssign=2 vs 1 (C=80, nProbe=6): $dual vs $single")
    assert(dual >= single, s"multi-assignment lost recall: $dual < $single")
    c80.unpersist()
  }

  test("kmeans++ seeding: deterministic, C distinct spread-out centroids") {
    val s1 = AnnSearch.seedCentroidsPP(emb, c = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val s2 = AnnSearch.seedCentroidsPP(emb, c = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(s1.toSet == s2.toSet, "seeding is not deterministic")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    assert(s1.map(_._1).distinct.length == 10)
    assert(s1.length == 10 * dim)
    // farthest-first must pick DIFFERENT directions: no two seeds identical
    val byCid = s1.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(byCid.values.toSeq.distinct.length == 10, "duplicate seed centroid")
  }

  test("SRP buckets: clones of the same vector share a bucket; buckets bounded") {
    val b = AnnSearch.srpBuckets(emb).collect()
    assert(b.length == emb.count())
    b.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(1) < 256))
    // near-dup rerank only scores candidate pairs and agrees with brute cosine
    val pairCos = AnnSearch.nearDupPairs(emb).filter(col("va") % 250 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val brute = AnnSearch.bruteTopK(emb, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val common = pairCos.keySet.intersect(brute.keySet)
    common.foreach(k => assert(pairCos(k) == brute(k)))
  }

  test("near-dup pairs artifact: builder read-back == inline chain, reports read it") {
    def asSet(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inline0 = asSet(AnnSearch.nearDupPairs(emb).collect())
    val built = asSet(AnnSearch.writeNearDupPairs(emb, sf0001).collect())
    assert(built == inline0, "artifact read-back diverged from the inline chain")
    val path = AnnSearch.nearDupPairsArtifactPath(sf0001, emb.count())
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(path)))
    // the report path must hit the artifact (bit-identical), and still work
    // standalone when the artifact is absent
    assert(asSet(AnnSearch.readNearDupPairs(emb, sf0001).collect()) == inline0)
    val orphanDir = sf0001 + "_no_artifact"
    assert(asSet(AnnSearch.readNearDupPairs(emb, orphanDir).collect()) == inline0)
  }

  test("near-dup candidate generation is sub-quadratic: 4x corpus => ~4x pairs, +2 bits") {
    // 4x the corpus with NEW vectors from the same distribution (coordinate
    // rotations of the originals — distinct directions, same norms/cluster
    // structure). Identical clones would be the wrong test: true duplicates
    // legitimately produce all their pairs, which is super-linear by itself.
    val n1 = emb.count()
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val emb4 = (0 until 4).map { s =>
      val rot =
        if (s == 0) col("embedding")
        else concat(slice(col("embedding"), s * 16 + 1, dim - s * 16),
          slice(col("embedding"), 1, s * 16))
      emb.select((col("vec_id") + lit(s * 1000000L)).as("vec_id"), rot.as("embedding"))
    }.reduce(_ unionByName _)
    assert(AnnSearch.adaptiveBits(4 * n1, 32) == AnnSearch.adaptiveBits(n1, 32) + 2)
    val c1 = AnnSearch.nearDupCandidates(emb).count()
    val c4 = AnnSearch.nearDupCandidates(emb4).count()
    // the capped-window design bounds candidates by tables*cap*n — assert the
    // absolute linear bound AND the growth ratio (quadratic would be 16x)
    assert(c1 <= 8L * 8 * n1, s"c1=$c1 exceeds the tables*cap*n bound")
    assert(c4 <= 8L * 8 * 4 * n1, s"c4=$c4 exceeds the tables*cap*n bound")
    assert(c4 <= 6 * c1, s"candidate pairs grew ${c4.toDouble / c1}x for a 4x corpus")
    assert(c4 >= c1, "4x corpus should not shrink candidates")
  }
}
