package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multi-probe LSH is the planes dial's missing half: more planes cut
  * candidate volume exponentially but cost recall; Hamming-1 probing
  * buys the recall back for a ≤(planes+1)× multiplier. Pinned here in
  * both directions on the regimes that matter:
  *
  *  - RECALL (planted-cluster fixture, the structure LSH exists to
  *    find): multi-probe at p planes dominates single-probe at p (its
  *    candidate set is a superset), and 12-plane multi-probe must
  *    reach at least 8-plane single-probe recall — i.e. "more planes
  *    + probes" loses nothing vs "fewer planes alone";
  *  - VOLUME (real corpus): 12-plane multi-probe's candidate volume
  *    must stay UNDER 8-plane single-probe's — 13 probes of 1/4096
  *    buckets vs 1 probe of a 1/256 bucket — so the trade is a pure
  *    win at scale.
  */
class MultiProbeSpec extends SparkSpec {
  import spark.implicits._

  /** Same planted geometry as LshScalingSpec: 25 clusters x 40
    * near-copies; every vector's true top-10 are cluster-mates. */
  private lazy val dir = {
    val d = tmpDir("graft-multiprobe")
    val rnd = new scala.util.Random(11)
    def unit(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val rows = for {
      c <- 0 until 25
      center = Array.fill(64)(rnd.nextGaussian())
      m <- 0 until 40
    } yield ((c * 40 + m).toLong,
      unit(center.map(_ + 0.03 * rnd.nextGaussian())).toSeq, c)
    writeFixture(d, "embeddings", rows.toDF("vec_id", "embedding", "label"))
    d
  }

  private def recallOf(topk: org.apache.spark.sql.DataFrame): Double = {
    val truth = SimilarityQueries.bruteTopK(spark, dir.toString).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = topk.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = truth.map { case (q, t) => (t & got.getOrElse(q, Set.empty)).size }.sum
    hits.toDouble / truth.values.map(_.size).sum
  }

  test("probing dominates single-probe recall; 12p multi beats 8p single") {
    val sp8 = recallOf(SimilarityQueries.lshTopKPlanes(spark, dir.toString, 8))
    val sp12 = recallOf(SimilarityQueries.lshTopKPlanes(spark, dir.toString, 12))
    val mp12 = recallOf(SimilarityQueries.lshMultiProbePlanes(spark, dir.toString, 12))
    info(f"recall@10: single 8p $sp8%.3f, single 12p $sp12%.3f, multi 12p $mp12%.3f")
    // superset of candidates => never worse than single-probe
    assert(mp12 >= sp12, f"multi $mp12%.3f < single $sp12%.3f at 12 planes")
    // the headline trade: 12 planes + probes recovers >= 8-plane recall
    assert(mp12 >= sp8 - 1e-9, f"multi-12 $mp12%.3f under single-8 $sp8%.3f")
  }

  test("12-plane multi-probe candidate volume stays under 8-plane single-probe") {
    val real = "/root/testdata/sf0.01"
    def buckets(planes: Int) =
      SimilarityQueries.lshBuckets(spark, real, planes)
    def singleVolume(planes: Int): Long = {
      val b = buckets(planes)
      val members = b.groupBy("bucket").agg(count(lit(1)).as("n"))
      b.filter(col("vec_id") % 50 === 0)
        .groupBy("bucket").agg(count(lit(1)).as("nq"))
        .join(members, "bucket")
        .agg(sum(col("nq") * (col("n") - 1))).head.getLong(0)
    }
    def multiVolume(planes: Int): Long = {
      val b = buckets(planes)
      val members = b.groupBy("bucket").agg(count(lit(1)).as("n"))
      val nQueries = b.filter(col("vec_id") % 50 === 0).count()
      val probeSet = array(col("bucket") +:
        (0 until planes).map(p => expr(s"bucket ^ ${1L << p}")): _*)
      val probed = b.filter(col("vec_id") % 50 === 0)
        .select(explode(probeSet).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("nq"))
        .join(members, "bucket")
        .agg(sum(col("nq") * col("n"))).head.getLong(0)
      probed - nQueries // self only ever appears in the own-bucket probe
    }
    val sp8 = singleVolume(8)
    val mp12 = multiVolume(12)
    info(s"candidate volume sf0.01: single 8p $sp8, multi 12p $mp12")
    assert(mp12 < sp8, s"multi-12 volume $mp12 not under single-8 $sp8")
    assert(mp12 > 0)
  }
}
