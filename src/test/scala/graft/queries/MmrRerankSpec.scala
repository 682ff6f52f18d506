package graft.queries

import graft.SparkSpec

/** emb_mmr_rerank: the relational unrolled greedy must equal a
  * straightforward reference implementation of MMR run over the same
  * shortlist, and must actually diversify a redundant shortlist. */
class MmrRerankSpec extends SparkSpec {
  import spark.implicits._

  private val Lambda = 0.7
  private val OneMinus = 1.0 - Lambda

  // same sequential-fold arithmetic as TextFunctions.dot/norm2
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }
  private def nrm(a: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i).toDouble * a(i).toDouble; i += 1 }
    math.sqrt(acc)
  }

  test("relational greedy equals the reference MMR over the shortlist") {
    val dir = "/root/testdata/sf0.001"
    val vecs = graft.util.Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val shortlist = SimilarityQueries.lshMultiProbe(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val got = SimilarityQueries.mmrRerank(spark, dir).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq }

    val expect = shortlist.groupBy(_._1).map { case (q, cands) =>
      val rel = cands.map(c => c._2 -> c._3).toMap
      def sim(x: Long, y: Long) =
        dot(vecs(x), vecs(y)) / (nrm(vecs(x)) * nrm(vecs(y)))
      var picked = Vector(rel.toSeq.maxBy { case (id, r) => (r, -id) }._1)
      while (picked.length < 4 && picked.length < rel.size) {
        val next = rel.keys.filterNot(picked.contains).map { d =>
          val maxSel = picked.map(s => sim(d, s)).max
          d -> (Lambda * rel(d) - OneMinus * maxSel)
        }.toSeq.maxBy { case (id, s) => (s, -id) }._1
        picked :+= next
      }
      q -> picked.toSeq
    }
    assert(got.keySet == expect.keySet)
    expect.foreach { case (q, ids) =>
      assert(got(q) == ids, s"query $q: got ${got(q)} expected $ids")
    }
  }

  test("picks are distinct and pick 1 is the relevance argmax") {
    val rows = SimilarityQueries
      .mmrRerank(spark, "/root/testdata/sf0.001").collect()
    rows.groupBy(_.getLong(0)).foreach { case (q, grp) =>
      assert(grp.map(_.getLong(1)).distinct.length == grp.length)
      val p1 = grp.find(_.getLong(2) == 1L).get
      assert(grp.forall(_.getDouble(3) <= p1.getDouble(3)),
        s"query $q pick1 is not the most relevant")
    }
  }
}
