package graft.queries

import graft.SparkSpec

/** txt_zipf_fit: a planted power law fits at slope ~ -1 with high r²;
  * the templated testdata is correctly flagged un-Zipfian. */
class ZipfFitSpec extends SparkSpec {
  import spark.implicits._

  test("a planted 1/r distribution fits slope -1 with high r2") {
    val d = tmpDir("graft-zipf")
    // counts c_r = floor(3000/r) for ranks 1..80, spread over docs of
    // ~60 tokens each
    val toks = (1 to 80).flatMap(r => Seq.fill(3000 / r)(s"w$r"))
    val docsDf = toks.grouped(60).zipWithIndex.map { case (g, i) =>
      val text = g.mkString(" ")
      (i.toLong, text, "en", "srcA", text.length.toLong)
    }.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
    writeFixture(d, "documents", docsDf)
    val r = TextQueries.zipfFit(spark, d.toString).collect().head
    assert(r.getLong(0) == 80L)
    val slope = r.getDouble(1)
    assert(slope > -1.1 && slope < -0.9, s"slope $slope")
    assert(r.getDouble(3) > 0.98, s"r2 ${r.getDouble(3)}")
  }

  test("the templated corpus is flagged un-Zipfian") {
    val r = TextQueries.zipfFit(spark, "/root/testdata/sf0.001")
      .collect().head
    // near-uniform token usage: flat slope, poor fit — the screening
    // signal this audit exists to produce
    assert(r.getDouble(1) > -0.5, s"slope ${r.getDouble(1)}")
    assert(r.getDouble(3) < 0.5, s"r2 ${r.getDouble(3)}")
  }
}
