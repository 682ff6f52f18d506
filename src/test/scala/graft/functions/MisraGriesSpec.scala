package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.TextQueries

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private val agg = MisraGriesAgg(4)

  /** Sequential reference fold over one partition's worth of keys. */
  private def foldAll(keys: Seq[String]): MgBuf =
    keys.foldLeft(agg.zero)(agg.reduce)

  test("buffer never exceeds capacity and counts stay positive") {
    val rnd = new scala.util.Random(7)
    val keys = Seq.fill(5000)(s"k${rnd.nextInt(200)}")
    var b = agg.zero
    for (k <- keys) {
      b = agg.reduce(b, k)
      assert(b.counts.size <= 4)
      assert(b.counts.values.forall(_ > 0L))
    }
  }

  test("zero false negatives: every key above N/(m+1) survives, any merge tree") {
    // planted Zipf-ish stream: two heavy keys over a 100-key noise floor
    val rnd = new scala.util.Random(11)
    val keys = new scala.util.Random(3).shuffle(
      Seq.fill(600)("heavy_a") ++ Seq.fill(400)("heavy_b") ++
        Seq.tabulate(1000)(i => s"noise${rnd.nextInt(100)}"))
    val n = keys.size
    val threshold = n / (4 + 1) // 400
    val exactOver = keys.groupBy(identity).collect {
      case (k, g) if g.size > threshold => k
    }.toSet
    assert(exactOver == Set("heavy_a")) // 600 > 400; heavy_b is exactly at 400

    // single partition
    assert(exactOver.subsetOf(agg.finish(foldAll(keys)).toSet))

    // arbitrary merge trees: split into p chunks, merge left-to-right
    // and right-to-left — the guarantee must hold under both
    for (p <- Seq(2, 3, 7, 16)) {
      val bufs = keys.grouped(math.max(1, n / p)).map(foldAll).toSeq
      val l2r = bufs.reduceLeft(agg.merge)
      val r2l = bufs.reduceRight(agg.merge)
      assert(exactOver.subsetOf(agg.finish(l2r).toSet))
      assert(exactOver.subsetOf(agg.finish(r2l).toSet))
    }
  }

  test("merge undercount stays within the mergeable-summaries bound") {
    val rnd = new scala.util.Random(23)
    val keys = Seq.fill(800)("big") ++ Seq.tabulate(2000)(_ => s"n${rnd.nextInt(50)}")
    val n = keys.size
    for (p <- Seq(1, 4, 9)) {
      val bufs = keys.grouped(math.max(1, n / p)).map(foldAll).toSeq
      val merged = bufs.reduceLeft(agg.merge)
      val est = merged.counts.getOrElse("big", 0L)
      assert(est <= 800L, "MG estimates never overcount")
      assert(800L - est <= n / (4 + 1), s"undercount ${800L - est} > N/(m+1)")
    }
  }

  test("txt_heavy_hitters equals the exact group-by at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = TextQueries.heavyHitters(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val tok = graft.util.Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
    val total = tok.count()
    val want = tok.groupBy("token").count()
      .filter(col("count") * (TextQueries.HhCap + 1L) > total)
      .orderBy(col("count").desc, col("token"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(want.nonEmpty, "fixture should produce a non-trivial result")
    assert(got == want)
  }

  test("candidate pass is distribution-robust: repartitioned input, same result") {
    val dir = "/root/testdata/sf0.001"
    val tok = graft.util.Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
    val mg = udaf(agg, org.apache.spark.sql.Encoders.STRING)
    val once = tok.agg(mg(col("token")).as("c"))
      .select(explode(col("c"))).as[String].collect().toSet
    val shuffled = tok.repartition(13).agg(mg(col("token")).as("c"))
      .select(explode(col("c"))).as[String].collect().toSet
    // candidate SETS may differ at the margin between partitionings;
    // the guarantee is about keys above threshold — both runs must
    // keep every such key
    val total = tok.count()
    val over = tok.groupBy("token").count()
      .filter(col("count") * 5L > total) // m=4 here, threshold N/5
      .select("token").as[String].collect().toSet
    assert(over.subsetOf(once))
    assert(over.subsetOf(shuffled))
  }
}
