package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed fact: one hot key with 10k rows, long tail of 50
  private val fact = ((1 to 10000).map(i => (i.toLong, 1L)) ++
    (1 to 50).map(i => (100000L + i, 1L + i % 7)))
    .toDF("row_id", "k")
  private val dim = (1L to 10L).map(k => (k, s"name$k")).toDF("k", "label")

  test("salted join equals the plain join") {
    val plain = fact.join(dim, "k")
      .select("row_id", "label").as[(Long, String)].collect().toSet
    val salted = SaltedJoin.inner(fact, dim, "k", salts = 8)
      .select("row_id", "label").as[(Long, String)].collect().toSet
    assert(salted == plain)
    assert(salted.size == 10050)
  }

  test("the hot key's rows spread across many salt buckets") {
    val salts = 8
    val spread = fact
      .withColumn("__salt",
        pmod(xxhash64(col("row_id"), col("k")), lit(salts.toLong)).cast("int"))
      .filter(col("k") === 1L)
      .select(countDistinct(col("__salt"))).as[Long].head()
    assert(spread == salts.toLong)
  }

  test("salts are deterministic across re-evaluation (retry safety)") {
    val a = SaltedJoin.inner(fact, dim, "k", 8).count()
    val b = SaltedJoin.inner(fact, dim, "k", 8).count()
    assert(a == b && a == 10050L)
  }
}
