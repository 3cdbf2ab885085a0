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
}
