package graft.queries

import graft.SparkSpec

/** txt_dataset_card: every published number re-derives from the raw
  * table. */
class DatasetCardSpec extends SparkSpec {
  import spark.implicits._

  test("card fields reconcile with direct computations") {
    val dir = "/root/testdata/sf0.001"
    val r = TextQueries.datasetCard(spark, dir).collect().head
    val d = graft.util.Tables.load(spark, dir, "documents").collect()
      .map(x => (x.getString(1), x.getString(2), x.getString(3),
        x.getLong(4)))
    assert(r.getLong(0) == d.length)
    assert(r.getLong(1) == d.map(_._3).distinct.length)
    assert(r.getLong(2) == d.map(_._2).distinct.length)
    assert(r.getLong(3) ==
      d.map(_._1.split(" ").length.toLong).sum)
    assert(r.getLong(4) == d.map(_._4).sum)
    val distinctTexts = d.map(_._1).distinct.length
    assert(r.getLong(5) == distinctTexts)
    assert(r.getDouble(6) ==
      (d.length - distinctTexts).toDouble / d.length)
    val byLang = d.groupBy(_._2).view.mapValues(_.length).toMap
    val maxN = byLang.values.max
    // query tie-break: highest count, then lang ascending
    val top = byLang.filter(_._2 == maxN).keys.min
    assert(r.getString(9) == top)
    assert(math.abs(r.getDouble(10) - maxN.toDouble / d.length) < 1e-12)
  }

  test("a corpus with planted exact duplicates reports the dup rate") {
    val d = tmpDir("graft-card")
    val docsDf = (0 until 40).map { i =>
      val text = if (i % 4 == 0) "same exact text here"
        else s"unique text number $i"
      (i.toLong, text, "en", "srcA", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    writeFixture(d, "documents", docsDf)
    val r = TextQueries.datasetCard(spark, d.toString).collect().head
    // 10 copies of one text collapse to 1 distinct -> 9/40 dup rate
    assert(r.getLong(5) == 31L)
    assert(math.abs(r.getDouble(6) - 9.0 / 40.0) < 1e-12)
    assert(r.getString(9) == "en" && r.getDouble(10) == 1.0)
  }
}
