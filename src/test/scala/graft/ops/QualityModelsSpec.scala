package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, SharedSpark}

/** Behavioral specs for the model-based scorers: hand-checkable LM
  * conditional probabilities and classifier sums. Bit-parity with DuckDB is
  * the q137/q138 oracle rows. */
class QualityModelsSpec extends SparkTestBase {
  import SharedSpark.spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))

  test("bigram LM: conditional ppm is exact count ratio; buckets split on mean") {
    // corpus bigrams: "a b" ×3, "a c" ×1 → c1(a)=4, cond(a,b)=750000 ppm,
    // cond(a,c)=250000 ppm
    val d = docs(1L -> "a b", 2L -> "a b", 3L -> "a b", 4L -> "a c")
    val got = QualityModels.bigramLmScore(d)
      .select("doc_id", "n_bigrams", "mean_ppm", "bucket")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 1L, 750000L, "fluent")))
    assert(got(4L) == ((4L, 1L, 250000L, "typical")))
  }

  test("bigram LM: one-word docs produce no row (no bigrams)") {
    val d = docs(1L -> "solo", 2L -> "two words")
    val ids = QualityModels.bigramLmScore(d).select("doc_id").as[Long].collect()
    assert(ids.toSeq == Seq(2L))
  }

  test("classifier: score is the sum of hash-bucket weights; keep ⇔ mean ≥ 0") {
    val d = docs(1L -> "alpha beta gamma", 2L -> "alpha alpha alpha")
    // replicate the frozen weight function column-for-column
    val w = d.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("weight", expr(
        s"((CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT) % ${QualityModels.FeatureDim})"
          + " * 2654435761) % 2003 - 1001"))
      .groupBy("doc_id").agg(sum("weight").as("expect"))
    val got = QualityModels.qualityClassifier(d)
      .join(w, "doc_id")
      .select(col("doc_id"), col("w_sum"), col("expect"), col("n_words"),
        col("avg_shift_ppk"), col("keep"))
      .as[(Long, Long, Long, Long, Long, Int)].collect()
    got.foreach { case (id, wSum, expect, n, avg, keep) =>
      assert(wSum == expect, s"doc $id score mismatch")
      assert(avg == (wSum + 1001 * n) * 1000 / n)
      assert(keep == (if (avg >= 1001000L) 1 else 0))
    }
    // repeated word = 3× its weight, so doc 2's sum is 3× alpha's weight
    val m = got.map(r => r._1 -> r._2).toMap
    assert(m(2L) % 3 == 0)
  }

  test("importance weights: target-only vocabulary scores above raw-only; ratios match a hand recompute") {
    // two disjoint vocabularies: target docs say "aa bb", raw-only docs say
    // "cc dd" — a target-looking doc must score strictly higher
    val d = Seq(
      (1L, "aa bb aa bb", "en"), (2L, "aa bb aa bb", "en"),
      (3L, "cc dd cc dd", "fr"), (4L, "cc dd cc dd", "fr"),
      (5L, "aa bb cc dd", "de") // mixed, non-target
    ).toDF("doc_id", "text", "lang")
    val got = QualityModels.importanceWeights(d)
      .select($"doc_id", $"n_words", $"score_ppm", $"keep")
      .as[(Long, Long, Long, Int)].collect().map(r => r._1 -> r).toMap
    assert(got.size == 5 && got.values.forall(_._2 == 4L))
    // hand recompute of the bucketed model (4 distinct words, no collisions
    // assumed — verified below by checking bucket count)
    val words = d.select(explode(split($"text", " ")).as("w"), $"lang")
    val nBuckets = words.select(expr(
      s"CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT) % ${QualityModels.FeatureDim}"))
      .distinct().count()
    assert(nBuckets == 4, "fixture words must land in distinct buckets")
    // tot_r = 20, tot_t = 8; target word: c_t=5? no — aa appears 2/doc in
    // docs 1,2 (target) + 1 in doc 5 ⇒ c_r=5, c_t=4; cc: c_r=5, c_t=0
    def ptPpb(ct: Long) = (ct + 1) * 1000000000L / (8 + 4096)
    def prPpb(cr: Long) = (cr + 1) * 1000000000L / (20 + 4096)
    def rPpm(ct: Long, cr: Long) = ptPpb(ct) * 1000000L / math.max(prPpb(cr), 1L)
    val rT = rPpm(4, 5) // aa / bb
    val rR = rPpm(0, 5) // cc / dd
    assert(got(1L)._3 == rT && got(3L)._3 == rR)
    assert(got(5L)._3 == (2 * rT + 2 * rR) / 4)
    assert(got(1L)._3 > got(5L)._3 && got(5L)._3 > got(3L)._3,
      "score must order target > mixed > raw-only")
    // keep is a pure threshold of the recomputed score (at this fixture
    // size add-one smoothing pulls every ratio below 1 — the ORDER is the
    // invariant; the absolute bar only separates at corpus scale)
    assert(got(1L)._4 == (if (rT >= 1000000L) 1 else 0))
    assert(got(3L)._4 == (if (rR >= 1000000L) 1 else 0))
  }

  test("gate agreement: contingency partitions each language; kappa matches a hand recompute") {
    val d = graft.synth.Synth.corpus(SharedSpark.spark, sf0001)
    val got = QualityModels.gateAgreement(d)
      .select($"lang", $"n", $"n11", $"n10", $"n01", $"n00", $"kappa_ppm")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val perLang = d.groupBy($"lang").count().as[(String, Long)].collect().toMap
    got.foreach { case (lang, n, n11, n10, n01, n00, kappa) =>
      assert(n === perLang(lang), s"$lang: contingency must cover every doc")
      assert(n11 + n10 + n01 + n00 === n)
      // hand kappa in exact integer arithmetic, sign factored out
      val pe = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
      val num = (n11 + n00) * n - pe
      val den = n * n - pe
      val exp = if (den == 0) 0L
        else if (num < 0) -((-num) * 1000000L / den)
        else num * 1000000L / den
      assert(kappa === exp, s"$lang kappa")
      assert(kappa >= -1000000L && kappa <= 1000000L)
    }
  }
}
