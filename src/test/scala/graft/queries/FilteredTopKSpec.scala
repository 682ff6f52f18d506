package graft.queries

import graft.SparkSpec

/** ann_filtered_topk: pre-filter semantics — every result satisfies
  * the predicate, and coverage beats post-filtering a generic top-k. */
class FilteredTopKSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every neighbor satisfies the metadata predicate") {
    val out = SimilarityQueries.filteredTopK(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getInt(2) % 3 == 0))
    out.groupBy(_.getLong(0)).foreach { case (_, grp) =>
      assert(grp.map(_.getLong(1)).distinct.length == grp.length)
      assert(grp.map(_.getLong(4)).sorted.toSeq == (1L to grp.length).toSeq)
    }
  }

  test("pre-filtering returns at least as many in-filter hits as post-filtering") {
    val pre = SimilarityQueries.filteredTopK(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    // the naive composition: generic top-10, THEN apply the filter
    val post = SimilarityQueries.lshMultiProbe(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.toSeq).toMap
    val labels = graft.util.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val postCounts = post.map { case (q, ns) =>
      q -> ns.count { case (_, n) => labels(n) % 3 == 0 } }
    postCounts.foreach { case (q, pc) =>
      assert(pre.getOrElse(q, 0) >= pc,
        s"query $q: pre ${pre.getOrElse(q, 0)} < post $pc")
    }
    // and strictly better somewhere, else the distinction is vacuous
    assert(postCounts.exists { case (q, pc) => pre.getOrElse(q, 0) > pc })
  }
}
