package graft.queries

import graft.SparkSpec

/** txt_dup_spans is the alignment-free substring dedup signal: a
  * shared 16-token passage must be found wherever it sits in each
  * document, including offsets where txt_chunk_dupes' fixed
  * non-overlapping 32-token chunking provably cannot see it. */
class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  /** Three 64-token docs built from unique filler plus one shared
    * 16-token passage planted at DIFFERENT offsets: doc 0 at token 5,
    * doc 1 at token 21 (straddles doc 1's first 32-token chunk
    * boundary), doc 2 has no passage. Fillers are globally unique
    * words, so the planted passage windows are the only cross-doc
    * collisions. */
  private lazy val dir = {
    val d = tmpDir("graft-dupspans")
    val passage = (0 until 16).map(i => s"shared$i").mkString(" ")
    def filler(doc: Int, n: Int, from: Int): String =
      (from until from + n).map(i => s"u${doc}w$i").mkString(" ")
    val doc0 = Seq(filler(0, 5, 0), passage, filler(0, 43, 5)).mkString(" ")
    val doc1 = Seq(filler(1, 21, 0), passage, filler(1, 27, 21)).mkString(" ")
    val doc2 = filler(2, 64, 0)
    val docs = Seq((0L, doc0), (1L, doc1), (2L, doc2))
      .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    writeFixture(d, "documents", docs)
    d
  }

  test("misaligned shared passage is found; chunk dedup misses it") {
    val spans = TextQueries.dupSpans(spark, dir.toString).collect()
    // exactly one window pair collides (the full planted passage;
    // every other window mixes unique filler words)
    assert(spans.length == 1, spans.mkString("\n"))
    val s = spans.head
    assert(s.getAs[Long]("n_docs") == 2L)
    assert(s.getAs[Long]("n_occ") == 2L)
    assert(s.getAs[Long]("first_doc") == 0L)
    assert(s.getAs[Long]("first_pos") == 5L)
    // the fixed-chunk query cannot see it: doc0's chunk 0 is
    // filler+passage+filler, doc1's chunks split the passage at
    // token 32 — no 32-token chunk is shared verbatim
    val chunks = TextQueries.chunkDupes(spark, dir.toString).collect()
    assert(chunks.isEmpty, chunks.mkString("\n"))
  }

  test("span coverage: planted passage covers exactly its 16 positions") {
    val cov = TextQueries.spanCoverage(spark, dir.toString).collect()
    assert(cov.length == 2) // doc 2 has no duplicated span → no row
    val byDoc = cov.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byDoc(0L).getAs[Long]("dup_positions") == 16L)
    assert(byDoc(1L).getAs[Long]("dup_positions") == 16L)
    assert(byDoc(0L).getAs[Double]("coverage") == 16.0 / 64.0)
  }

  test("span coverage is an interval UNION: overlapping windows count once") {
    // a 17-token shared passage yields two overlapping duplicated
    // windows but must cover 17 positions, not 32
    val d = tmpDir("graft-spancov")
    val passage = (0 until 17).map(i => s"ovl$i").mkString(" ")
    def filler(doc: Int, n: Int): String =
      (0 until n).map(i => s"v${doc}w$i").mkString(" ")
    val docs = Seq(
      (0L, s"${filler(0, 10)} $passage ${filler(0, 13) /* 40 toks */}"),
      (1L, s"$passage ${filler(1, 23)}"))
      .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    writeFixture(d, "documents", docs)
    val cov = TextQueries.spanCoverage(spark, d.toString).collect()
    assert(cov.length == 2)
    cov.foreach(r => assert(r.getAs[Long]("dup_positions") == 17L,
      r.toString))
  }

  test("strip spans: globally-first occurrence kept, others stripped") {
    val rows = TextQueries.stripSpans(spark, dir.toString).collect()
    // doc 0 holds the first occurrence (min doc) → nothing stripped
    // from it; doc 1 loses exactly the 16 planted tokens; doc 2 clean
    assert(rows.length == 1, rows.mkString("\n"))
    val r = rows.head
    assert(r.getAs[Long]("doc_id") == 1L)
    assert(r.getAs[Long]("stripped_tokens") == 16L)
    assert(r.getAs[Long]("kept_tokens") == 64L - 16L)
  }

  test("strip spans: within-doc boilerplate is stripped too") {
    // one doc repeats a 16-token passage twice with unique filler
    // between — the second occurrence strips even with n_docs == 1
    val d = tmpDir("graft-stripintra")
    val passage = (0 until 16).map(i => s"rep$i").mkString(" ")
    val mid = (0 until 20).map(i => s"m$i").mkString(" ")
    val t = s"$passage $mid $passage"
    val docs = Seq((0L, t), (1L, (0 until 30).map(i => s"z$i").mkString(" ")))
      .map { case (id, x) => (id, x, "en", "src0", x.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    writeFixture(d, "documents", docs)
    val rows = TextQueries.stripSpans(spark, d.toString).collect()
    assert(rows.length == 1, rows.mkString("\n"))
    assert(rows.head.getAs[Long]("doc_id") == 0L)
    assert(rows.head.getAs[Long]("stripped_tokens") == 16L)
  }

  test("no false spans on a duplicate-free corpus") {
    val d = tmpDir("graft-dupspans-neg")
    val docs = (0L until 4L).map { id =>
      val t = (0 until 40).map(i => s"only${id}x$i").mkString(" ")
      (id, t, "en", "src0", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    writeFixture(d, "documents", docs)
    assert(TextQueries.dupSpans(spark, d.toString).collect().isEmpty)
  }
}
