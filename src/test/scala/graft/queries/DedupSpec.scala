package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-duplicate fixtures: the approximate dedup paths (MinHash
  * LSH banding, SimHash chunking) must recover the near-dup pairs the
  * exact n-gram Jaccard finds. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val d = tmpDir("graft-dedup")
    // long enough (64 tokens) that a one-token change lands within the
    // SimHash guaranteed radius (hamming 3 here) — on short docs a
    // single token flips too many majority votes to count as near-dup
    // under the production radius-3 contract
    val base = "the quick brown fox jumps over the lazy dog near the old stone bridge every sunny morning while birds sing loud songs across the green valley fields" +
      " then the silver river winds past tall oak trees where children play simple games under warm afternoon light and farmers carry fresh apples toward the busy market square before evening rain arrives quietly over distant purple hills"
    val nearDup = base.replace("sunny", "rainy") // one token changed
    val other = "completely different text about spark catalyst optimizer rules and physical plans with columnar batches"
    val docs = Seq(
      (0L, base, "en", "srcA", base.length.toLong),
      (1L, nearDup, "en", "srcA", nearDup.length.toLong),
      (2L, base, "en", "srcB", base.length.toLong), // exact dup of 0, other source
      (3L, other, "en", "srcB", other.length.toLong),
      (4L, "another unrelated document mentioning window functions aggregates and shuffle partitions in distributed engines", "en", "srcB", 100L),
      (5L, other, "en", "srcB", other.length.toLong), // exact dup of 3, same source
      (6L, "two tokens", "en", "srcB", 10L)) // <3 tokens: no shingles
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    writeFixture(d, "documents", docs)
    d
  }

  test("exact dedup counts duplicate texts per source") {
    val r = DedupQueries.exact(spark, dir.toString).collect()
      .map(x => x.getAs[String]("source") -> x.getAs[Long]("n_dup_docs")).toMap
    // srcA: two distinct texts; srcB: docs 3 and 5 share a text
    assert(r == Map("srcA" -> 0L, "srcB" -> 1L))
  }

  test("docs with fewer than 3 tokens still get a simhash row (oracle emits simhash=0)") {
    val sig = DedupQueries.simhash(spark, dir.toString).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sig.keySet == (0L to 6L).toSet)
    assert(sig(6L) == 0L)
  }

  test("n-gram Jaccard finds planted near-dups and exact dup") {
    val pairs = DedupQueries.ngramJaccard(spark, dir.toString).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).toSeq
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    assert(pairSet == Set((0L, 1L), (0L, 2L), (1L, 2L), (3L, 5L)), pairs)
    val exactPair = pairs.find(p => p._1 == 0L && p._2 == 2L).get
    assert(exactPair._3 == 1.0)
  }

  test("pagerank over the dup graph conserves mass; regular components rank uniformly") {
    // fixture graph: {0,1,2} near-dup triangle + {3,5} exact-dup pair —
    // both components are regular, so stationary PageRank is uniform;
    // with 3 fixed-point iterations every node must hold ~1/5 of the
    // mass and the total must be UNIT minus only integer-truncation
    // dust (< n picos per division site per round)
    val pr = DedupQueries.pagerankRanks(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pr.keySet == Set(0L, 1L, 2L, 3L, 5L), pr.toString)
    val unit = 1000000000000L
    val total = pr.values.sum
    assert(total <= unit && total > (unit * 99L) / 100L, s"mass $total")
    assert(pr.values.toSet.size == 1,
      s"regular-graph ranks must be uniform: $pr")
  }

  test("triangle counts separate the mutual-dup clique from the plain pair") {
    // {0,1,2} is a 3-clique (cc = 1.0 each: safe to collapse to one
    // canonical doc); {3,5} is a bare edge (deg 1, no triangle, cc 0)
    val r = DedupQueries.triangles(spark, dir.toString).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("deg"), x.getAs[Long]("tri_cnt"),
          x.getAs[Long]("cc_micro")))).toMap
    assert(r.keySet == Set(0L, 1L, 2L, 3L, 5L), r.toString)
    Seq(0L, 1L, 2L).foreach { id =>
      assert(r(id) == ((2L, 1L, 1000000L)), s"doc $id: ${r(id)}")
    }
    Seq(3L, 5L).foreach { id =>
      assert(r(id) == ((1L, 0L, 0L)), s"doc $id: ${r(id)}")
    }
  }

  test("MinHash LSH banding recovers the same pairs as exact Jaccard") {
    val exact = DedupQueries.ngramJaccard(spark, dir.toString).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val lsh = DedupQueries.minhashPairs(spark, dir.toString).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(lsh == exact)
  }

  test("SimHash signatures of near-dups are close, unrelated docs far") {
    val sig = DedupQueries.simhash(spark, dir.toString).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(sig(a) ^ sig(b))
    assert(ham(0L, 2L) == 0) // identical text
    assert(ham(0L, 1L) < ham(0L, 3L))
    assert(ham(0L, 1L) < ham(0L, 4L))
    val pairs = DedupQueries.simhashPairs(spark, dir.toString).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((0L, 2L)))
    assert(pairs.contains((0L, 1L)))
    // recall completeness on real signatures: the banded candidate join
    // must recover EXACTLY the brute-force all-pairs result at the
    // guaranteed radius (pigeonhole: radius <= bands-1)
    val ids = sig.keySet.toSeq.sorted
    val brute = (for {
      a <- ids; b <- ids if a < b
      if ham(a, b) <= DedupQueries.SimhashRadius
    } yield (a, b)).toSet
    assert(pairs == brute)
  }

  test("embedding cosine near-dup finds planted near-identical vectors") {
    val d = tmpDir("graft-emb")
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val rnd = new scala.util.Random(7)
    def randVec(): Array[Float] = unit(Array.fill(64)(rnd.nextGaussian().toFloat))
    val a = randVec()
    val aNear = unit(a.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x })
    val rows = Seq(
      (0L, a.toSeq, 1), (50L, aNear.toSeq, 1),
      (100L, randVec().toSeq, 1), (150L, randVec().toSeq, 2),
      (200L, randVec().toSeq, 2))
    writeFixture(d, "embeddings", rows.toDF("vec_id", "embedding", "label"))
    val pairs = DedupQueries.embeddingCosine(spark, d.toString).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
        r.getAs[Double]("cosine")))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 50L && p._3 > 0.99), pairs.toSeq)
  }

  test("source overlap matrix reconciles exactly with the verified pair graph") {
    val sf = "/root/testdata/sf0.001"
    val mat = DedupQueries.sourceOverlap(spark, sf).collect()
    assert(mat.nonEmpty)
    // independent recompute from the pair list + the raw source labels
    val pairs = DedupQueries.minhashPairs(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val srcOf = graft.util.Tables.load(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    val directed = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val expPairs = directed.groupBy { case (d, o) => (srcOf(d), srcOf(o)) }
      .view.mapValues(_.length).toMap
    val expHits = directed.groupBy { case (d, o) => (srcOf(d), srcOf(o)) }
      .view.mapValues(_.map(_._1).distinct.length).toMap
    assert(mat.length == expPairs.size)
    for (r <- mat) {
      val key = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      assert(r.getAs[Long]("n_pairs") == expPairs(key).toLong, key)
      assert(r.getAs[Long]("n_docs_hit") == expHits(key).toLong, key)
      assert(r.getAs[Long]("n_docs_hit") <= r.getAs[Long]("n_docs_a"), key)
      assert(r.getAs[Long]("share_bp") ==
        r.getAs[Long]("n_docs_hit") * 10000L / r.getAs[Long]("n_docs_a"), key)
    }
    // pair symmetry: the (A,B) and (B,A) rows count the same pair set
    val byKey = mat.map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
      r.getAs[Long]("n_pairs")).toMap
    for (((a, b), n) <- byKey if a != b) assert(byKey((b, a)) == n, (a, b))
  }
}
