package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** StreamHeavyHitters: the MG guarantee must hold CONTINUOUSLY — at
  * every micro-batch boundary the candidate set contains every key
  * above the running N/(m+1) threshold, with O(m) state. */
class StreamHeavyHittersSpec extends SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val M = 4

  test("zero false negatives across micro-batches; state stays bounded") {
    val rnd = new scala.util.Random(29)
    def noise(n: Int): Seq[String] = Seq.fill(n)(s"n${rnd.nextInt(80)}")
    // batch 1+2 make "alpha" heavy; "beta" becomes heavy only once
    // batch 3 lands — the continuously-updated sketch must catch both
    val b1 = rnd.shuffle(Seq.fill(300)("alpha") ++ noise(400))
    val b2 = rnd.shuffle(Seq.fill(300)("alpha") ++ noise(400))
    val b3 = rnd.shuffle(Seq.fill(900)("beta") ++ noise(100))
    val all = b1 ++ b2 ++ b3
    val threshold = all.size / (M + 1) // 2400/5 = 480
    val over = all.groupBy(identity).collect {
      case (k, g) if g.size > threshold => k
    }.toSet
    assert(over == Set("alpha", "beta"))

    val mem = MemoryStream[String]
    val q = StreamHeavyHitters.candidates(mem.toDF().toDF("token"), "token", M)
      .writeStream.format("memory").queryName("shh_out")
      .outputMode("complete").start()
    try {
      for (b <- Seq(b1, b2, b3)) {
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val cands = spark.table("shh_out")
      .select(explode(col("candidates"))).as[String].collect().toSet
    assert(cands.size <= M, s"state exceeded capacity: $cands")
    assert(over.subsetOf(cands), s"missed heavy keys: $over vs $cands")
  }

  test("restart-free monotone capacity: heavy key present immediately after its batch") {
    val mem = MemoryStream[String]
    val q = StreamHeavyHitters.candidates(mem.toDF().toDF("token"), "token", M)
      .writeStream.format("memory").queryName("shh_out2")
      .outputMode("complete").start()
    try {
      mem.addData(Seq.fill(50)("early"): _*)
      q.processAllAvailable()
      val afterB1 = spark.table("shh_out2")
        .select(explode(col("candidates"))).as[String].collect().toSet
      assert(afterB1 == Set("early"))
      mem.addData(Seq.fill(500)("late"): _*)
      q.processAllAvailable()
      val afterB2 = spark.table("shh_out2")
        .select(explode(col("candidates"))).as[String].collect().toSet
      assert(afterB2.contains("late"))
      assert(afterB2.contains("early")) // no decrement pressure yet
    } finally q.stop()
  }
}
