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
}
