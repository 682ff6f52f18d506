package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-case contract of the perceptual media tier: a re-encoded
  * twin (same asset, small region-confined byte change — different
  * digest, so exact CAS dedup provably misses it) must be caught,
  * an unrelated asset must not, a bit-exact copy lands at Hamming 0
  * with same_bytes=true, and an edit spanning every tile falls
  * outside the one-tile verify bound. All planted assets share a
  * modality (doc_id ≡ 0 mod 3) so format scoping cannot mask a miss. */
class MediaNearDupSpec extends SparkSpec {

  private def rndText(seed: Int, words: Int): String = {
    val r = new scala.util.Random(seed)
    Seq.fill(words)(Seq.fill(3 + r.nextInt(7))(
      ('a' + r.nextInt(26)).toChar).mkString).mkString(" ")
  }

  private lazy val fixtureDir = {
    val dir = tmpDir("media-near-dup")
    import spark.implicits._
    val base = rndText(7, 70) // ~400 bytes
    // region-confined re-encode: same length, 2 bytes changed mid-payload
    val twin = base.substring(0, 200) + "QQ" + base.substring(202)
    val copy = base // bit-exact duplicate
    val unrelated = rndText(8, 70)
    // a HEAVY edit touching every tile: a 40-byte run replaced per
    // quarter (~40% of the payload, spread everywhere) — a genuinely
    // different asset, past "one tile's worth of bits"
    val l = base.length
    val everywhere = {
      val sb = new StringBuilder(base)
      Seq(l / 8, 3 * l / 8, 5 * l / 8, 7 * l / 8).foreach(i =>
        (0 until 40).foreach(j =>
          sb.setCharAt(i + j, if (base.charAt(i + j) == 'Q') 'R' else 'Q')))
      sb.toString
    }
    val df = Seq(
      (0L, base), (3L, twin), (6L, copy), (9L, unrelated),
      (12L, everywhere))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("planted"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    writeFixture(dir, "documents", df)
    dir.toString
  }

  test("re-encoded twin caught; unrelated not; exact copy at Hamming 0") {
    val pairs = MultimodalQueries.nearDupPairs(spark, fixtureDir)
      .collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        (r.getAs[Long]("hamming"), r.getAs[Boolean]("same_bytes"))))
      .toMap
    // the CAS-miss catch: different bytes, caught perceptually
    val twin = pairs.get((0L, 3L))
    assert(twin.isDefined, s"re-encoded twin missed: $pairs")
    assert(!twin.get._2, "twin must differ in bytes (else CAS covers it)")
    assert(twin.get._1 <= 15L)
    // bit-exact copy: Hamming 0, flagged as CAS-covered
    assert(pairs.get((0L, 6L)).contains((0L, true)), pairs.toString)
    // the copy is also a twin of the twin (transitively near)
    assert(pairs.contains((3L, 6L)))
    // unrelated asset: no pair with anything
    assert(!pairs.keys.exists(k => k._1 == 9L || k._2 == 9L), pairs.toString)
  }

  test("an every-tile edit exceeds the one-tile verify bound") {
    val sig = MultimodalQueries.perceptualSigOf(
      graft.util.Tables.load(spark, fixtureDir, "documents"))
      .select(col("doc_id"), col("psig")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ham = java.lang.Long.bitCount(sig(0L) ^ sig(12L))
    // per-tile single-byte flips leave no tile signature intact enough
    // to stay inside "one tile's worth of bits" — this is the
    // documented boundary of the near-dup contract, not a bug
    assert(ham > 15, s"every-tile edit landed at hamming $ham")
    // candidacy may or may not arise (some tile can still vote
    // identically); the verify bound is what excludes it
    val pairs = MultimodalQueries.nearDupPairs(spark, fixtureDir).collect()
    assert(!pairs.exists(r => r.getAs[Long]("doc_a") == 12L ||
      r.getAs[Long]("doc_b") == 12L))
  }

  test("decontamination: zero false negatives vs brute force; bloom twin bit-identical") {
    // sf0.01: the sf0.001 corpus has no cross-split perceptual pair
    // under the stride-2 signature (both dirs hold 500 docs)
    val dir = "/root/testdata/sf0.01"
    val sigs = MultimodalQueries.perceptualSigOf(
      graft.util.Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("media_format"), col("psig")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // independent driver-side reimplementation: every same-format
    // (train, eval) pair at Hamming <= 15 sharing >= 1 exact tile,
    // then best-per-train (min hamming, tie min eval id)
    def tiles(p: Long): Seq[Long] = (0 until 4).map(q => (p >> (15 * q)) & 0x7fffL)
    val eval = sigs.filter(_._1 % 10 == 0)
    val train = sigs.filterNot(_._1 % 10 == 0)
    val expected = train.flatMap { case (td, tf, tp) =>
      val ms = eval.filter { case (ed, ef, ep) =>
        ef == tf && java.lang.Long.bitCount(tp ^ ep) <= 15 &&
          tiles(tp).zip(tiles(ep)).exists(t => t._1 == t._2)
      }
      if (ms.isEmpty) None
      else {
        val best = ms.minBy { case (ed, _, ep) =>
          (java.lang.Long.bitCount(tp ^ ep), ed) }
        Some((tf, td, best._1,
          java.lang.Long.bitCount(tp ^ best._3).toLong))
      }
    }.sortBy(_._2).toSeq
    val got = MultimodalQueries.decontaminate(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.nonEmpty)
    assert(got == expected)
    // the bloom-pruned twin is bit-identical (false negatives
    // impossible: the equi-join after the probe is exact)
    val bloomed = MultimodalQueries.decontaminateBloom(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(bloomed == got)
  }

  test("native psig kernel is bit-identical to the HOF definition") {
    // the codegen'd kernel vs the built-in-HOF form the oracle
    // mirrors, row-for-row over real data + the planted fixture
    for (d <- Seq("/root/testdata/sf0.001", fixtureDir)) {
      val in = graft.util.Tables.load(spark, d, "documents")
        .select(col("doc_id"), col("text"))
      val native = MultimodalQueries.perceptualSigOf(in)
        .select(col("doc_id"), col("psig")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val hof = MultimodalQueries.perceptualSigHofOf(in)
        .select(col("doc_id"), col("psig")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(native.nonEmpty)
      assert(native == hof, s"kernel drift at $d")
    }
  }

  test("region-confined edits share >= 1 exact tile (candidacy by construction)") {
    val sig = MultimodalQueries.perceptualSigOf(
      graft.util.Tables.load(spark, fixtureDir, "documents"))
      .select(col("doc_id"), col("psig")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def tiles(p: Long): Seq[Long] =
      (0 until 4).map(q => (p >> (15 * q)) & 0x7fffL)
    val shared = tiles(sig(0L)).zip(tiles(sig(3L))).count(t => t._1 == t._2)
    // a same-length edit confined to one region leaves the other
    // tiles' windows untouched — their signatures are BIT-IDENTICAL,
    // so the tile equi-join finds the pair deterministically
    assert(shared >= 2, s"only $shared tiles shared")
  }
}
