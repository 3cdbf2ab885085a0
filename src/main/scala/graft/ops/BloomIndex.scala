package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sharded Bloom-filter membership pre-filter — the constant-memory front
  * gate of incremental dedup at crawl scale: before a new batch pays the
  * LSH band join against the persisted base (TextOps.incrementalDedup), a
  * Bloom probe against the base's content hashes rejects the (overwhelming)
  * fresh majority with zero shuffle. False positives are inherent to the
  * structure (Bloom, CACM 1970) and DETERMINISTIC here — both the engine and
  * the oracle compute the same bit tests, so the per-doc `maybe_present` /
  * `present_exact` pair is bit-checkable, false positives included (the
  * probe reports both columns precisely so the FP rate is auditable).
  *
  * Scale notes: the filter is SHARDED — `Shards` independent 1008-bit
  * filters keyed by a high-bit slice of the content hash — so capacity
  * scales by adding shards (at 10^12 docs you size shards ~ docs/10^6 and
  * the table stays ~0.1% of corpus bytes), and the build is ONE
  * partial-aggregating exchange of (shard, word) → bit_or — 16 longs per
  * shard, never a per-key set. The probe side broadcasts the filter table
  * (definitionally small: Shards × 16 rows) against the batch, so probing
  * never shuffles the batch at all. Bit ops stay in 63 bits per word
  * (bit 63 untouched) so signed BIGINT semantics are identical in Spark and
  * DuckDB. k = 3 probe positions come from double hashing
  * (h1 + k·h2 mod 1008 — Kirsch & Mitzenmacher 2006), all arithmetic well
  * inside 2^62 so neither engine can overflow.
  */
object BloomIndex {

  /** Independent filters; shard key = a high-bit slice of the content hash
    * (decorrelated from the in-shard bit positions, which use the low bits). */
  val Shards = 64

  /** 16 longs × 63 usable bits = 1008 bits per shard. */
  val WordsPerShard = 16
  val BitsPerShard: Int = WordsPerShard * 63
  val KHashes = 3

  /** 60-bit portable content hash (same md5-prefix hash as the whole dedup
    * family, so base and probe agree with the DuckDB oracle). */
  private def contentHash(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** (doc_id, hb, shard) for every doc. */
  private def keyed(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), contentHash(col("text")).as("hb"))
      .withColumn("shard", expr(s"(hb div 1048576) % $Shards").cast("int"))

  /** One row per (key, k): the k-th probe position split into (word, bit). */
  private def positions(keys: DataFrame): DataFrame =
    keys
      .withColumn("h1", expr(s"hb % $BitsPerShard"))
      .withColumn("h2", expr(s"1 + (hb % ${BitsPerShard - 1})"))
      .withColumn("k", explode(expr(s"sequence(0, ${KHashes - 1})")))
      .withColumn("p", expr(s"(h1 + k * h2) % $BitsPerShard"))
      .withColumn("word", expr("p div 63").cast("int"))
      .withColumn("bit", expr("p % 63").cast("int"))

  /** The filter table: (shard, word, bits) — at most Shards × WordsPerShard
    * rows, built in one partial-aggregating exchange over the base's
    * DISTINCT content hashes. */
  def build(base: DataFrame): DataFrame =
    positions(keyed(base).select(col("hb"), col("shard")).distinct())
      .groupBy(col("shard"), col("word"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").as("bits"))

  /** The production probe: per batch doc, `maybe_present` = all k probe bits
    * set in `filt` (a filter table from [[build]], in production a persisted
    * artifact). MAP-ONLY on the batch: the k probe positions are computed as
    * COLUMNS (never exploded into rows) and each is resolved by its own
    * broadcast join against the tiny filter table, AND-ed with `least` — so
    * the batch side has zero exchanges, not even the one-row-per-doc
    * re-aggregation an explode→groupBy(doc_id) shape would pay. At 10^12
    * docs that is the difference between a pure scan and a corpus-wide
    * shuffle whose only purpose is undoing the explode. */
  def probeAgainst(filt: DataFrame, batch: DataFrame): DataFrame = {
    var cur = keyed(batch)
      .withColumn("h1", expr(s"hb % $BitsPerShard"))
      .withColumn("h2", expr(s"1 + (hb % ${BitsPerShard - 1})"))
    for (k <- 0 until KHashes) {
      cur = cur
        .withColumn(s"p$k", expr(s"(h1 + $k * h2) % $BitsPerShard"))
        .withColumn(s"word$k", expr(s"p$k div 63").cast("int"))
        .join(broadcast(filt.select(col("shard"), col("word").as(s"word$k"),
          col("bits").as(s"bits$k"))), Seq("shard", s"word$k"), "left")
        .withColumn(s"hit$k", expr(
          s"CAST(shiftright(coalesce(bits$k, CAST(0 AS BIGINT)), CAST(p$k % 63 AS INT)) % 2 AS INT)"))
    }
    cur.select(col("doc_id"), col("hb"),
      least((0 until KHashes).map(k => col(s"hit$k")): _*).as("maybe_present"))
  }

  /** q136: probe `batch` against the filter built from `base` — per probe
    * doc: `maybe_present` (all k bits set; includes deterministic false
    * positives) and `present_exact` (the ground-truth content match, so the
    * two columns audit the FP rate row by row). The Bloom leg is
    * [[probeAgainst]] — map-only on the batch; in production only
    * `maybe_present = 1` rows (dup density × (1 + FP rate) of the batch)
    * proceed to the exact join / band join. The `present_exact` audit column
    * here pays the hash equi-join the filter exists to avoid — it is the
    * correctness oracle's ground truth, not part of the production path. */
  def probe(base: DataFrame, batch: DataFrame): DataFrame = {
    val baseHashes = keyed(base).select(col("hb")).distinct()
    probeAgainst(build(base), batch)
      .join(baseHashes.withColumn("present_exact", lit(1)), Seq("hb"), "left")
      .select(col("doc_id"), col("maybe_present"),
        coalesce(col("present_exact"), lit(0)).as("present_exact"))
  }
}
