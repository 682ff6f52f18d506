package graft.queries

import scala.collection.mutable

import graft.SparkSpec

/** Pins `txt_bpe_merges`/`txt_bpe_encode` to textbook BPE semantics
  * via an in-memory reference implementation, on a fixture built to
  * stress exactly the cases where a string-replace encoding of the
  * merge walk can silently diverge:
  *
  *  - adjacent occurrences of the merge pair ("abab": greedy
  *    left-to-right must merge BOTH — a shared-delimiter encoding
  *    drops every second one),
  *  - self-pair runs ("aaaa" -> aa,aa not aa,a,a... and never an
  *    overlapping triple),
  *  - count ties (must break to the lexicographically smaller pair),
  *  - multi-round interaction (round 2 pairs built from round 1's
  *    merged symbols).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Docs chosen so pair counts are distinct enough to order rounds
    * deterministically while still exercising runs and ties. */
  private val docTexts = Seq(
    "abab abab aaaa",
    "abab baba cdcd",
    "aaaa aaab cdcd",
    "xy xy")

  private lazy val dir = {
    val d = tmpDir("graft-bpe")
    val rows = docTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    writeFixture(d, "documents", rows.toDF("doc_id", "text"))
    d
  }

  /** Reference BPE: overlapping adjacent-pair counts weighted by word
    * frequency; merge applied as the standard greedy left-to-right
    * non-overlapping walk. */
  private def refBpe(rounds: Int)
      : (Seq[(Long, String, String, Long)], Map[String, Int]) = {
    val freq = docTexts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var syms: Map[String, List[String]] =
      freq.keys.map(w => w -> w.map(_.toString).toList).toMap
    val merges = (1 to rounds).map { r =>
      val counts = mutable.Map.empty[(String, String), Long]
      for ((w, f) <- freq; Seq(a, b) <- syms(w).sliding(2))
        counts((a, b)) = counts.getOrElse((a, b), 0L) + f
      val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, s"$a $b") }
      def mergeWalk(s: List[String]): List[String] = s match {
        case x :: y :: rest if x == a && y == b => (a + b) :: mergeWalk(rest)
        case x :: rest => x :: mergeWalk(rest)
        case Nil => Nil
      }
      syms = syms.map { case (w, s) => w -> mergeWalk(s) }
      (r.toLong, s"$a $b", a + b, n)
    }
    (merges, syms.map { case (w, s) => w -> s.size })
  }

  test("merge table matches the reference walk round by round") {
    val got = TextQueries.bpeMerges(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val (want, _) = refBpe(4)
    assert(got == want, s"got $got\nwant $want")
  }

  test("per-doc encoded token counts match the reference symbolization") {
    val (_, wordLen) = refBpe(4)
    val want = docTexts.zipWithIndex.map { case (t, i) =>
      val words = t.split(" ").filter(_.nonEmpty)
      (i.toLong, words.length.toLong, words.map(w => wordLen(w).toLong).sum)
    }
    val got = TextQueries.bpeEncode(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"got $got\nwant $want")
  }

  test("a count tie breaks to the lexicographically smaller pair") {
    // in round 1, "cdcd" x2 gives (c,d)=4 — crafted below "a b"'s
    // count; build a corpus where two pairs tie exactly and the
    // smaller string must win in both the query and the reference
    val d = tmpDir("graft-bpe-tie")
    writeFixture(d, "documents", Seq((0L, "zy zy xw xw"))
      .toDF("doc_id", "text"))
    val first = TextQueries.bpeMerges(spark, d.toString).collect().head
    // (x,w) and (z,y) both count 2: "x w" < "z y" lexicographically
    assert(first.getString(1) == "x w", first.toString)
  }
}
