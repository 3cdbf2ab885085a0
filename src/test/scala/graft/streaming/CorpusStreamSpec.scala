package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import java.nio.file.Files

class CorpusStreamSpec extends SparkTestBase {

  private val goodText = (1 to 20).map(i => s"word$i").mkString(" ") // passes gate
  private val shortText = "too short" // fails gate (n_tokens < 16)

  private def writeBatch(dir: String, rows: Seq[(Long, String, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "secs")
      .select(col("doc_id"), col("text"), timestamp_seconds(col("secs")).as("event_ts"))
      .coalesce(1).write.mode("append").parquet(dir)
  }

  test("streaming ingest: exact dedup within watermark + quality gate, bounded state") {
    val dir = Files.createTempDirectory("graft_cstream").toString
    writeBatch(dir, Seq((1L, goodText, 1000L), (2L, shortText, 1010L)))
    val q = CorpusStream.dedupIngest(spark, dir)
      .writeStream.outputMode("append").format("memory").queryName("cingest").start()
    try {
      q.processAllAvailable()
      // duplicate of doc 1's content in a later micro-batch, plus a new doc
      writeBatch(dir, Seq((3L, goodText, 1100L), (4L, goodText + " extra", 1120L)))
      q.processAllAvailable()
      // watermark advances; emit what's final
      writeBatch(dir, Seq((5L, goodText + " tail", 5000L)))
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM cingest").collect().map(_.getLong(0)).toSet
      assert(ids.contains(1L), s"first occurrence must pass: $ids")
      assert(!ids.contains(2L), "short doc must fail the quality gate")
      assert(!ids.contains(3L), "within-watermark duplicate must be dropped")
      assert(ids.contains(4L) && ids.contains(5L))
    } finally q.stop()
  }

  test("incremental ingest: micro-batches LSH-dedup against the growing artifact store") {
    val base = Files.createTempDirectory("graft_incr")
    val (in, art, out) = (s"$base/in", s"$base/art", s"$base/out")
    // long texts so the 8-gram shingle sets are rich enough for LSH
    def text(seed: Int) = (1 to 40).map(i => s"tok${seed}x${i * seed % 97}").mkString(" ")
    writeBatch(in, Seq((1L, text(3), 1000L), (2L, text(5), 1010L)))
    val q = CorpusStream.incrementalIngest(spark, in, art, out)
    try {
      q.processAllAvailable()
      // batch 2: an exact clone of doc 1's content under a NEW id (near-dup
      // of the STORE, not of anything in its own batch) plus a fresh doc
      writeBatch(in, Seq((10L, text(3), 2000L), (11L, text(7), 2010L)))
      q.processAllAvailable()
      val ids = spark.read.parquet(out).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L, 11L), s"expected clone 10 rejected, got $ids")
      // artifacts hold bands for exactly the accepted docs — batch 3 dedups
      // against doc 11 (accepted in batch 2), proving the store GREW
      val bandIds = spark.read.parquet(s"$art/bands").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(bandIds == Set(1L, 2L, 11L), s"artifact store wrong: $bandIds")
      writeBatch(in, Seq((20L, text(7), 3000L)))
      q.processAllAvailable()
      val ids3 = spark.read.parquet(out).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids3 == Set(1L, 2L, 11L), s"clone of a batch-2 acceptee must be rejected: $ids3")
      // REPLAY: doc 11 re-arrives after its artifacts committed (the crash-
      // between-artifact-and-sink window). Its best match in the store is
      // ITSELF, so it must be re-accepted (no loss) — sink is at-least-once,
      // so the duplicate row is expected and collapsible by content hash —
      // while the artifact store must NOT double-append its bands
      writeBatch(in, Seq((11L, text(7), 4000L)))
      q.processAllAvailable()
      assert(spark.read.parquet(out).filter(col("doc_id") === 11L).count() == 2,
        "replayed doc lost: self-match must re-accept")
      val bands11 = spark.read.parquet(s"$art/bands")
        .filter(col("doc_id") === 11L).count()
      assert(bands11 == graft.ops.TextOps.NumBands,
        s"artifact store double-appended a replayed doc: $bands11 band rows")
    } finally q.stop()
  }

  test("dedup state survives a checkpointed restart (kill query, new batch, resume)") {
    val base = Files.createTempDirectory("graft_ckpt")
    val (in, out, chk) = (s"$base/in", s"$base/out", s"$base/chk")
    def start() = CorpusStream.dedupIngest(spark, in)
      .writeStream.outputMode("append")
      .option("checkpointLocation", chk).format("parquet").option("path", out)
      .start()
    writeBatch(in, Seq((1L, goodText, 1000L)))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // the query is GONE; a duplicate of doc 1 arrives plus a new doc
    writeBatch(in, Seq((3L, goodText, 1100L), (4L, goodText + " extra", 1120L)))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val ids = spark.read.parquet(out).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(1L) && ids.contains(4L))
    // the restarted query recovered the dedup state store from the
    // checkpoint — the pre-restart content hash still blocks doc 3
    assert(!ids.contains(3L), s"state lost across restart: $ids")
  }
}
