package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** txt_blocklist_scrub and emb_hard_negatives: the mask/drop policy
  * must fire on planted documents exactly, and the mined negatives
  * must sit strictly inside the cosine band — near-positives excluded,
  * hardest first. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("blocklist scrub: planted mask and drop cases account exactly") {
    val d = tmpDir("graft-scrub")
    // doc 1: 2 blocked of 20 (10% == threshold, NOT above -> masked)
    // doc 2: 3 blocked of 20 (15% > 10% -> dropped)
    // doc 3: clean
    val filler = (1 to 18).map(i => s"w$i").mkString(" ")
    val rows = Seq(
      (1L, "s1", "en", 1L, s"customer spark $filler"),
      (2L, "s1", "en", 1L, s"customer spark vector ${(1 to 17).map(i => s"w$i").mkString(" ")}"),
      (3L, "s1", "en", 1L, filler + " w19 w20"))
    writeFixture(d, "documents",
      rows.toDF("doc_id", "source", "lang", "n_chars", "text"))
    val out = TextQueries.blocklistScrub(spark, d.toString).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("n_docs_hit") == 2L)
    assert(r.getAs[Long]("n_blocked") == 5L)
    assert(r.getAs[Long]("n_dropped") == 1L)
    assert(r.getAs[Long]("n_kept") == 2L)
    // kept after mask: doc1 (20-2=18) + doc3 (20-0=20) = 38
    assert(r.getAs[Long]("kept_tokens_after_mask") == 38L)
  }

  test("blocklist scrub: real-corpus accounting is internally consistent") {
    val rows = TextQueries.blocklistScrub(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("n_dropped") + r.getAs[Long]("n_kept")
        == r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_blocked") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("kept_tokens_after_mask")
        <= r.getAs[Long]("n_tokens"))
    }
    // the stand-in wordlist is chosen to actually fire on the corpus
    assert(rows.map(_.getAs[Long]("n_blocked")).sum > 0L)
  }

  test("hard negatives: band excludes near-positives, hardest ranked first") {
    val rnd = new scala.util.Random(17)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val anchor = unit(Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    // blend toward a second random direction to hit a target cosine
    val other = unit(Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    def blend(c: Double): Array[Float] = {
      // construct a vector at cosine ~c from anchor inside the
      // anchor/other plane (Gram-Schmidt)
      val dot = anchor.zip(other).map { case (a, b) => a.toDouble * b }.sum
      val orth = unit(other.zip(anchor).map { case (o, a) =>
        (o - (dot * a).toFloat) })
      val s = math.sqrt(1 - c * c)
      anchor.zip(orth).map { case (a, o) => (c * a + s * o).toFloat }
    }
    val rows = Seq(
      (0L, "q", anchor), // the anchor (vec_id % 50 == 0 -> query)
      (101L, "pos", blend(0.95)), // near-positive: excluded
      (102L, "hn1", blend(0.70)), // hardest negative
      (103L, "hn2", blend(0.50)),
      (104L, "hn3", blend(0.35)),
      (105L, "easy", blend(0.05))) // too easy: excluded
    val d = tmpDir("graft-hardneg")
    writeFixture(d, "embeddings", rows.toDF("vec_id", "label", "embedding"))
    val out = SimilarityQueries.hardNegatives(spark, d.toString)
      .filter(col("q_id") === 0L).collect()
    val ids = out.map(_.getAs[Long]("n_id")).toSeq
    assert(!ids.contains(101L), s"near-positive mined: $ids")
    assert(!ids.contains(105L), s"easy negative mined: $ids")
    // LSH buckets may drop a band member, but whatever is mined must
    // be ranked hardest-first and 102 (cos .70, bucket-biased to
    // collide with the anchor) must be present
    assert(ids.contains(102L), s"hardest negative missed: $ids")
    val cosines = out.map(_.getAs[Double]("cosine")).toSeq
    assert(cosines == cosines.sorted.reverse)
    assert(cosines.forall(c => c >= 0.30 && c < 0.80))
  }

  test("epoch plan: replication arithmetic reconciles; budget approached") {
    val rows = ProfileQueries.epochPlan(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val planned = r.getAs[Long]("planned_tokens")
      assert(planned == r.getAs[Long]("full_epochs") * r.getAs[Long]("n_tokens")
        + r.getAs[Long]("extra_tokens"))
      assert(r.getAs[Long]("extra_docs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("frac_micro") >= 0L
        && r.getAs[Long]("frac_micro") <= 1000000L)
      // the fractional-epoch draw lands the plan near its target: the
      // residual is bounded by the longest doc's tokens on either side
      // in expectation; allow a loose 25% band per source
      val target = r.getAs[Double]("target_tokens")
      assert(math.abs(planned - target) <= math.max(64.0, target * 0.25),
        s"${r.getAs[String]("source")}: planned $planned target $target")
    }
    // the whole point of temperature mixing: small sources get MORE
    // epochs than large ones (sqrt weighting)
    val byTokens = rows.sortBy(_.getAs[Long]("n_tokens"))
    assert(byTokens.head.getAs[Long]("full_epochs")
      >= byTokens.last.getAs[Long]("full_epochs"))
  }

  test("domain cap: quota held; kept slice dominates dropped slice by score") {
    import org.apache.spark.sql.functions._
    val kept = ProfileQueries.domainCap(spark, "/root/testdata/sf0.001")
      .collect()
    assert(kept.nonEmpty)
    val bySrc = kept.groupBy(_.getAs[String]("source"))
    for ((src, rows) <- bySrc) {
      assert(rows.length <= 15, src)
      // ranks are contiguous from 1 (no holes from the cap filter)
      assert(rows.map(_.getAs[Long]("src_rank")).sorted
        .sameElements(1L to rows.length.toLong), src)
      // descending score along rank, doc_id tie-break ascending
      val sorted = rows.sortBy(_.getAs[Long]("src_rank"))
      sorted.sliding(2).foreach { case Array(a, b) =>
        val (sa, sb) = (a.getAs[Long]("score_micro"), b.getAs[Long]("score_micro"))
        assert(sa > sb || (sa == sb &&
          a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")), src)
      case _ => ()
      }
    }
    // the kept slice must dominate the dropped slice: per source, the
    // worst kept score >= the best score among docs NOT kept
    val all = graft.util.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("source"), col("doc_id"),
        floor(size(array_distinct(split(col("text"), " "))).cast("long") * lit(1000000L) /
          size(split(col("text"), " ")).cast("long")).cast("long").as("score_micro"))
      .collect()
    val keptIds = kept.map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"))).toSet
    for ((src, rows) <- bySrc) {
      val worstKept = rows.map(_.getAs[Long]("score_micro")).min
      val dropped = all.filter(r => r.getAs[String]("source") == src &&
        !keptIds((src, r.getAs[Long]("doc_id"))))
      if (dropped.nonEmpty)
        assert(dropped.map(_.getAs[Long]("score_micro")).max <= worstKept, src)
    }
  }

  test("pii scrub: planted classes count exactly; edge strings excluded") {
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, "contact me at alice.smith+spam@example-mail.co.uk or bob@x.io today", "en", "srcA"),
      (2L, "server at 10.0.255.7 and 192.168.1.1 responded", "en", "srcA"),
      (3L, "call 555-867-5309 re card 4111111111111111 now", "en", "srcB"),
      (4L, "clean document with no personal data at all", "en", "srcB"),
      (5L, "edge: not-an-ip 1.2.3 and short 12345 digits", "en", "srcB"))
    val d = tmpDir("graft-pii")
    writeFixture(d, "documents", rows.toDF("doc_id", "text", "lang", "source"))
    val out = TextQueries.piiScrub(spark, d.toString).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("pii_class")) ->
        ((r.getAs[Long]("n_hits"), r.getAs[Long]("n_docs_hit"),
          r.getAs[Long]("masked_chars")))).toMap
    assert(out.size == 8) // 2 sources x 4 classes, zero rows included
    assert(out(("srcA", "email")) == ((2L, 1L,
      "alice.smith+spam@example-mail.co.uk".length + "bob@x.io".length)))
    assert(out(("srcA", "ipv4")) == ((2L, 1L,
      "10.0.255.7".length + "192.168.1.1".length)))
    assert(out(("srcB", "phone")) == ((1L, 1L, "555-867-5309".length.toLong)))
    assert(out(("srcB", "digit_run")) == ((1L, 1L, 16L)))
    // the near-miss strings (1.2.3, 12345) must NOT count
    assert(out(("srcB", "ipv4")) == ((0L, 0L, 0L)))
    assert(out(("srcA", "phone")) == ((0L, 0L, 0L)))
  }

  test("pii scrub: shipped corpus is pii-free — every class reports zero") {
    val out = TextQueries.piiScrub(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    for (r <- out) {
      assert(r.getAs[Long]("n_hits") == 0L, r)
      assert(r.getAs[Long]("masked_chars") == 0L, r)
    }
  }

  test("novelty: copies count zero novel; novel mass sums to distinct shingles") {
    import org.apache.spark.sql.functions._
    // srcA doc 1 is first with its content; srcB doc 2 is an exact
    // copy (zero novel), doc 3 is fresh (all novel)
    val t1 = (1 to 30).map(i => s"a$i").mkString(" ")
    val t3 = (1 to 25).map(i => s"b$i").mkString(" ")
    val rows = Seq(
      (1L, t1, "en", "srcA"), (2L, t1, "en", "srcB"), (3L, t3, "en", "srcB"))
    val d = tmpDir("graft-novelty")
    writeFixture(d, "documents", rows.toDF("doc_id", "text", "lang", "source"))
    val out = TextQueries.novelty(spark, d.toString).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_postings"), r.getAs[Long]("n_novel"),
          r.getAs[Long]("novelty_bp")))).toMap
    assert(out("srcA") == ((28L, 28L, 10000L)), out)   // 30 tokens → 28 shingles
    assert(out("srcB") == ((51L, 23L, 23L * 10000L / 51L)), out) // copy 0 + fresh 23
    // real corpus: total novel rows == number of distinct shingles
    val real = TextQueries.novelty(spark, "/root/testdata/sf0.001").collect()
    val totNovel = real.map(_.getAs[Long]("n_novel")).sum
    import graft.functions.TextFunctions.{shingleHashesOfToks, tokens}
    val distinctShingles = graft.util.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(shingleHashesOfToks(tokens(col("text")), 3)).as("s"))
      .agg(count_distinct(col("s"))).head().getLong(0)
    assert(totNovel == distinctShingles, s"$totNovel != $distinctShingles")
    for (r <- real)
      assert(r.getAs[Long]("novelty_bp") >= 0L &&
        r.getAs[Long]("novelty_bp") <= 10000L, r)
  }

  test("hard negatives: real-corpus output respects the band per anchor") {
    val out = SimilarityQueries.hardNegatives(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val c = r.getAs[Double]("cosine")
      assert(c >= 0.30 && c < 0.80, r.toString)
    }
    // ranks are 1..k dense per anchor
    out.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq
        == (1L to rs.length.toLong).toSeq)
    }
  }
}
