package graft.sources

import graft.SparkSpec

/** TextIndexLayout.servePrf: expansion must bridge the synonymy gap —
  * a relevant document sharing NO literal term with the query becomes
  * reachable through the feedback docs' vocabulary — without
  * disturbing queries whose first pass was already right. */
class PrfSpec extends SparkSpec {
  import spark.implicits._

  /** Corpus: topic docs 1..4 mix "car auto" vocabulary; doc 5 is the
    * synonym-only target ("auto" vocabulary, never "car"); docs 6+ are
    * unrelated noise. Query 100 says only "car": pass 1 finds the
    * mixed docs; their "auto" terms expand the query; pass 2 can now
    * score doc 5. */
  private lazy val dir = {
    val d = tmpDir("graft-prf")
    def noise(i: Long, n: Int): String =
      (0 until n).map(j => s"n${i}w$j").mkString(" ")
    val docs = Seq(
      1L -> ("car auto engine wheel " + noise(1, 8)),
      2L -> ("car auto motor drive " + noise(2, 8)),
      3L -> ("car auto engine motor " + noise(3, 8)),
      4L -> ("car auto wheel drive " + noise(4, 8)),
      5L -> ("auto engine motor wheel drive " + noise(5, 7)),
      6L -> noise(6, 12),
      7L -> noise(7, 12),
      8L -> noise(8, 12))
    writeFixture(d, "documents",
      docs.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    d
  }

  private def drop(prefix: String): Unit = dropPrefix(prefix)

  test("feedback expansion reaches the synonym-only document") {
    drop("prf")
    TextIndexLayout.build(spark, dir.toString, "prf", buckets = 2)
    try {
      val q = Seq((100L, "car")).toDF("q_id", "text")
      val firstPass = TextIndexLayout.serve(spark, "prf", q)
        .select("doc_id").as[Long].collect().toSet
      assert(!firstPass.contains(5L),
        s"fixture broken: doc 5 must be invisible to the literal query, got $firstPass")
      val prf = TextIndexLayout.servePrf(spark, "prf", q,
        kFb = 3, nExp = 4)
        .select("doc_id").as[Long].collect().toSet
      assert(prf.contains(5L), s"expansion failed to reach doc 5: $prf")
      // and the on-topic first-pass docs are still retrieved
      assert(Set(1L, 2L, 3L, 4L).subsetOf(prf))
      assert(!prf.exists(_ >= 6L), s"noise docs retrieved: $prf")
    } finally drop("prf")
  }

  test("a query already covered by its literal terms keeps its top document") {
    drop("prf2")
    TextIndexLayout.build(spark, dir.toString, "prf2", buckets = 2)
    try {
      val q = Seq((200L, "engine motor wheel drive")).toDF("q_id", "text")
      val top1 = TextIndexLayout.serve(spark, "prf2", q)
        .filter(org.apache.spark.sql.functions.col("rank") === 1)
        .select("doc_id").as[Long].head()
      val prfTop1 = TextIndexLayout.servePrf(spark, "prf2", q)
        .filter(org.apache.spark.sql.functions.col("rank") === 1)
        .select("doc_id").as[Long].head()
      assert(top1 == 5L && prfTop1 == 5L)
    } finally drop("prf2")
  }
}
