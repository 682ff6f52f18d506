package graft.queries

import graft.SparkSpec

/** txt_cdc_chunks: content-defined boundaries must re-synchronize
  * after an insertion — the property fixed-size chunking lacks. */
class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(docsBySource: Seq[(String, Seq[String])])
      : java.nio.file.Path = {
    val d = tmpDir("graft-cdc")
    val rows = docsBySource.zipWithIndex.map { case ((src, toks), i) =>
      val text = toks.mkString(" ")
      (i.toLong, text, "en", src, text.length.toLong)
    }
    writeFixture(d, "documents",
      rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    d
  }

  private val base = (0 until 200).map(i => s"tok${i * 7 % 97}x$i")

  test("identical documents share every chunk") {
    val d = corpus(Seq("a" -> base, "b" -> base))
    val out = TextQueries.cdcChunks(spark, d.toString).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getDouble(4))).toMap
    assert(out.keySet == Set("a", "b"))
    out.values.foreach { case (n, dup, frac) =>
      assert(n > 3, "expected several chunks from 200 tokens")
      assert(dup == n, "identical docs must duplicate every chunk")
      assert(frac == 1.0)
    }
  }

  test("a front insertion re-synchronizes downstream chunk boundaries") {
    // doc b = doc a with one token inserted near the front; fixed-size
    // chunking would desynchronize every downstream chunk, CDC must
    // recover most of them
    val d = corpus(Seq("a" -> base, "b" -> (base.take(3) ++
      Seq("INSERTED") ++ base.drop(3))))
    val out = TextQueries.cdcChunks(spark, d.toString).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getDouble(4))).toMap
    val (nA, dupA, fracA) = out("a")
    assert(dupA > 0, "no chunk re-synchronized after the insertion")
    assert(fracA > 0.5,
      s"only $dupA/$nA chunks recovered — boundaries did not resync")
    // and the fixed-size comparison on the SAME corpus: txt_chunk_dupes
    // (32-token aligned chunks) finds nothing after the shift
    val fixed = TextQueries.chunkDupes(spark, d.toString).collect()
    assert(fixed.isEmpty,
      "fixed chunking unexpectedly survived the insertion shift")
  }
}
