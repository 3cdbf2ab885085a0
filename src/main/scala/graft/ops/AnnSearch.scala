package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]`), for embedding-based near-dup detection and similarity
  * retrieval at corpus scale.
  *
  * Determinism design: embeddings are quantized to int millis
  * (`round(x*1000)` — int8-style quantization, standard at scale), so dot
  * products and norms are exact BIGINT sums — order-insensitive, bit-equal in
  * any engine; only the final cosine divides in double.
  *
  * Two paths:
  *  - [[bruteTopK]]: exact top-k by quantized cosine — the baseline. Long-form
  *    (vec, pos, val) join so partial aggregation handles the fan-out.
  *  - [[lshBucketTopK]]: scale path — sign-random-projection buckets (SimHash
  *    over quantized coordinates) prune candidates before the exact rerank;
  *    only intra-bucket pairs are scored.
  */
object AnnSearch {

  /** Long form (vec_id, pos, q) with quantized values; drops zero terms
    * (they contribute nothing to dot products). */
  def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("pos"),
        round(col("v").cast("double") * 1000.0).cast("long").as("q"))

  def norms(quant: DataFrame): DataFrame =
    quant.groupBy(col("vec_id")).agg(sum(col("q") * col("q")).as("n2"))

  /** Exact top-k neighbors of the query vectors (vec_id % queryMod == 0),
    * excluding self. Output: (qvec, rank, vec, cos). */
  def bruteTopK(emb: DataFrame, k: Int = 5, queryMod: Int = 250): DataFrame = {
    val q = quantized(emb).cache()
    val n = norms(q)
    val queries = q.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qvec"), col("pos"), col("q").as("qq"))
    val dots = queries.join(q, "pos")
      .groupBy(col("qvec"), col("vec_id").as("vec"))
      .agg(sum(col("qq") * col("q")).as("dot"))
      .filter(col("qvec") =!= col("vec"))
    val scored = dots
      .join(n.select(col("vec_id").as("qvec"), col("n2").as("qn")), "qvec")
      .join(n.select(col("vec_id").as("vec"), col("n2").as("vn")), "vec")
      .select(col("qvec"), col("vec"),
        (col("dot").cast("double") / (sqrt(col("qn").cast("double")) * sqrt(col("vn").cast("double")))).as("cos"))
    val w = Window.partitionBy(col("qvec")).orderBy(col("cos").desc, col("vec").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qvec"), col("rank"), col("vec"), col("cos"))
  }

  /** Sign-random-projection bucket id: sign bits of dot products with
    * deterministic ±1 hyperplanes (hyperplane b, pos p → sign from parity of
    * (b*131 + p*197) % 2). Vectors sharing a bucket are near in angle. */
  def srpBuckets(emb: DataFrame, nBits: Int = 8): DataFrame = {
    val q = quantized(emb)
    val bitSums = (0 until nBits).map { b =>
      sum(col("q") * (((col("pos") * 197 + b * 131) % 2) * 2 - 1)).as(s"p$b")
    }
    val sums = q.groupBy(col("vec_id")).agg(bitSums.head, bitSums.tail: _*)
    val bucket = (0 until nBits).map(b =>
      when(col(s"p$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    sums.select(col("vec_id"), bucket.as("bucket"))
  }

  /** Bucketed ANN: exact cosine only within SRP buckets (plus rank). */
  def lshBucketTopK(emb: DataFrame, k: Int = 5): DataFrame = {
    val b = srpBuckets(emb)
    val q = quantized(emb).cache()
    val n = norms(q)
    val withB = q.join(b, "vec_id")
    val left = withB.select(col("bucket"), col("vec_id").as("va"), col("pos"), col("q").as("qa"))
    val right = withB.select(col("bucket"), col("vec_id").as("vb"), col("pos"), col("q").as("qb"))
    val dots = left.join(right, Seq("bucket", "pos"))
      .filter(col("va") < col("vb"))
      .groupBy(col("va"), col("vb"))
      .agg(sum(col("qa") * col("qb")).as("dot"))
    dots
      .join(n.select(col("vec_id").as("va"), col("n2").as("na")), "va")
      .join(n.select(col("vec_id").as("vb"), col("n2").as("nb")), "vb")
      .select(col("va"), col("vb"),
        (col("dot").cast("double") / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))).as("cos"))
  }
}
