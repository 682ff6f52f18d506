package graft.queries

import graft.SparkSpec

/** util_importance_resample: DSIR-style selection must prefer
  * target-distribution documents using text features only. */
class ImportanceResampleSpec extends SparkSpec {
  import spark.implicits._

  test("disjoint-vocabulary fixture: target-language docs score higher") {
    val d = tmpDir("graft-dsir")
    // en docs draw from one vocabulary, zh docs from another; a
    // bag-of-buckets importance weight must separate them cleanly
    val enWords = (0 until 30).map(i => s"alpha$i")
    val zhWords = (0 until 30).map(i => s"omega$i")
    val docs = (0 until 40).map { i =>
      val (lang, words) = if (i % 2 == 0) ("en", enWords) else ("zh", zhWords)
      val text = (0 until 50).map(j => words((i + j) % words.length))
        .mkString(" ")
      (i.toLong, text, lang, s"src${i % 4}", text.length.toLong)
    }
    writeFixture(d, "documents",
      docs.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = ProfileQueries.importanceResample(spark, d.toString).collect()
    val byLang = rows.groupBy(_.getString(1))
    // every en doc outranks every zh doc
    val minEn = byLang("en").map(_.getLong(3)).min
    val maxZh = byLang("zh").map(_.getLong(3)).max
    assert(minEn > maxZh, s"min en weight $minEn vs max zh $maxZh")
    assert(minEn > 0L && maxZh < 0L)
  }

  test("real corpus: the selected pool over-represents the target slice") {
    val all = graft.util.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val base = all.filter($"lang" === "en").count().toDouble / all.count()
    val sel = ProfileQueries.importanceResample(spark, "/root/testdata/sf0.01")
      .collect()
    assert(sel.length == 100)
    val enFrac = sel.count(_.getString(1) == "en") / 100.0
    assert(enFrac > base + 0.1,
      s"selected en fraction $enFrac vs corpus base rate $base")
    // ordering is by per-token weight desc with doc_id tie-break
    val ws = sel.map(_.getDouble(4)).toSeq
    assert(ws == ws.sorted(Ordering[Double].reverse))
  }
}
