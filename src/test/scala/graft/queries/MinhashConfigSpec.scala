package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The MinHash geometry dial must actually move recall: on planted
  * MID-jaccard pairs (j ≈ 0.33, just above the 0.3 verify floor) the
  * shipped 4×4 banding catches almost nothing (per-pair catch
  * ≈ 1−(1−j⁴)⁴ ≈ 5%) while 8×2 catches most (≈ 1−(1−j²)⁸ ≈ 60%) —
  * and everything either config emits is exact-verified ≥ 0.3. On the
  * synthetic corpus the two coincide (its near-dups are all j ≥ 0.7,
  * where both catch ~everything); this fixture is the regime the 8×2
  * point exists for. */
class MinhashConfigSpec extends SparkSpec {

  private lazy val fixtureDir = {
    val dir = tmpDir("minhash-config")
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    def words(n: Int): Seq[String] =
      Seq.fill(n)(Seq.fill(4 + rnd.nextInt(5))(
        ('a' + rnd.nextInt(26)).toChar).mkString)
    // 12 planted pairs: A = X ++ Y, B = X ++ Z with |X|=|Y|=|Z|=20
    // tokens -> shingle jaccard ~ (20-2)/(2*38-18) ~ 0.31
    val rows = (0 until 12).flatMap { i =>
      val x = words(20); val y = words(20); val z = words(20)
      Seq((1000L + 2 * i, (x ++ y).mkString(" ")),
        (1000L + 2 * i + 1, (x ++ z).mkString(" ")))
    } ++ (0 until 30).map(i => (2000L + i, words(40).mkString(" ")))
    val df = rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("planted"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    writeFixture(dir, "documents", df)
    dir.toString
  }

  test("8x2 banding catches the mid-jaccard regime 4x4 misses") {
    def caught(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("doc_a"), col("doc_b"), col("jaccard")).collect()
        .map { r =>
          assert(r.getDouble(2) >= 0.3) // both configs exact-verify
          (r.getLong(0), r.getLong(1))
        }.toSet
    val planted = (0 until 12)
      .map(i => (1000L + 2 * i, 1000L + 2 * i + 1)).toSet
    val c44 = caught(DedupQueries.minhashPairs(spark, fixtureDir))
      .intersect(planted)
    val c82 = caught(DedupQueries.minhashPairs8x2(spark, fixtureDir))
      .intersect(planted)
    // measured on this fixture (deterministic): the dial must show a
    // real gap, not noise
    assert(c82.size >= c44.size + 4,
      s"8x2 caught ${c82.size}, 4x4 caught ${c44.size} of 12 planted")
    // unrelated docs never pair (verify floor holds in both configs)
    assert(!caught(DedupQueries.minhashPairs8x2(spark, fixtureDir))
      .exists(p => p._1 >= 2000L && p._2 >= 2000L))
  }
}
