package graft.sources

import graft.SparkSpec

/** TextIndexLayout.driftAudit: zero drift against the build corpus,
  * and a planted composition shift must surface as the top drifted
  * terms with the global stats moving accordingly. */
class TextIndexDriftSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(d: java.nio.file.Path,
      texts: Seq[(Long, String)]): Unit =
    writeFixture(d, "documents",
      texts.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars"))

  private def drop(prefix: String): Unit = dropPrefix(prefix)

  private def baseCorpus: Seq[(Long, String)] = (0L until 20L).map { i =>
    i -> s"alpha beta gamma w$i x$i y$i z$i common"
  }

  test("audit against the build corpus reports zero drift everywhere") {
    val d = tmpDir("graft-drift0")
    writeDocs(d, baseCorpus)
    drop("drift0")
    TextIndexLayout.build(spark, d.toString, "drift0", buckets = 2)
    try {
      val rows = TextIndexLayout.driftAudit(spark, d.toString, "drift0")
        .collect()
      assert(rows.nonEmpty)
      for (r <- rows) {
        assert(r.getAs[Long]("drift_micro") == 0L, r.toString)
        assert(r.getAs[Long]("df_frozen") == r.getAs[Long]("df_now"))
        assert(r.getAs[Long]("n_docs_frozen") == r.getAs[Long]("n_docs_now"))
        assert(r.getAs[Double]("avgdl_frozen") == r.getAs[Double]("avgdl_now"))
      }
    } finally drop("drift0")
  }

  test("a planted composition shift surfaces as the top drifted terms") {
    val dBuild = tmpDir("graft-driftA")
    writeDocs(dBuild, baseCorpus)
    drop("driftA")
    TextIndexLayout.build(spark, dBuild.toString, "driftA", buckets = 2)
    try {
      // live corpus: the build docs plus 60 long docs dominated by a
      // NEW term and by "alpha" (so one OOV term and one df explosion)
      val grown = baseCorpus ++ (100L until 160L).map { i =>
        i -> ("surge alpha " + (0 until 20).map(j => s"f${i}g$j").mkString(" "))
      }
      val dLive = tmpDir("graft-driftB")
      writeDocs(dLive, grown)
      val rows = TextIndexLayout.driftAudit(spark, dLive.toString, "driftA")
        .collect()
      val byTerm = rows.map(r =>
        r.getAs[String]("term") -> r.getAs[Long]("drift_micro")).toMap
      // the OOV surge term: df 0 -> 60, the largest possible drift
      assert(byTerm.contains("surge"), byTerm.keys.toSeq.sorted.mkString(","))
      assert(rows.head.getAs[String]("term") != null)
      val surge = byTerm("surge")
      assert(surge == math.round(math.abs(math.log(61.0 / 1.0)) * 1e6))
      // alpha's df tripled -> present and drifted, but below the OOV term
      assert(byTerm.contains("alpha"))
      assert(byTerm("alpha") < surge && byTerm("alpha") > 0L)
      // global stats moved: corpus grew 4x, avgdl grew (long new docs)
      val r0 = rows.head
      assert(r0.getAs[Long]("n_docs_frozen") == 20L)
      assert(r0.getAs[Long]("n_docs_now") == 80L)
      assert(r0.getAs[Double]("avgdl_now") > r0.getAs[Double]("avgdl_frozen"))
    } finally drop("driftA")
  }
}
