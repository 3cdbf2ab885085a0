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
