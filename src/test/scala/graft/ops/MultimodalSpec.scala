package graft.ops

import graft.SparkTestBase
import graft.synth.Synth

class MultimodalSpec extends SparkTestBase {

  test("batched stub decoder aligns with the column path (same bytes seen)") {
    val pages = Synth.pages(spark, sf0001)
    val colPath = Multimodal.decodeMeta(pages).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    val batch = Multimodal.decodeBatched(pages).collect()
    assert(batch.length == colPath.size)
    batch.foreach { m =>
      val (nBytes, thumb) = colPath(m.pid)
      assert(m.n_bytes == nBytes)
      assert(m.thumb_md5 == thumb)
      assert(m.width >= 1 && m.width <= 1920 && m.height >= 1 && m.height <= 1080)
    }
  }

  test("corpus ASCII invariant: q42's byte-offset slices equal the oracle's char-offset slices") {
    // decodeMeta slices the binary `html` column at BYTE offsets while the
    // q42 oracle slices `text` at CHAR offsets; they agree iff the corpus is
    // pure ASCII (1 byte per char). Any multi-byte character would silently
    // break bit-parity — lock the invariant in.
    import org.apache.spark.sql.functions._
    val nonAscii = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(octet_length(encode(col("text"), "UTF-8")) =!= length(col("text")))
      .count()
    assert(nonAscii == 0, "documents.text must be pure ASCII for q42 byte/char parity")
  }
}
