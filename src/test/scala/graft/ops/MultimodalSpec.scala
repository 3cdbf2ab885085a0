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
}
