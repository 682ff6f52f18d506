package graft.queries

import graft.SparkSpec

/** Structural SCD2 invariants the hash oracle can't state directly:
  * version chains per key must be well-formed regardless of how the
  * classification CASE evolves. */
class Scd2MergeSpec extends SparkSpec {

  private val Open = 99999999L

  test("every key's version chain is well-formed") {
    val rows = ProfileQueries.scd2Merge(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))) // key, vf, vt
      .toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (k, vs) =>
      // at most one open version
      assert(vs.count(_._3 == Open) <= 1, s"key $k has two open rows")
      // closed versions end after they start, at the next version's start
      vs.filter(_._3 != Open).foreach { case (_, vf, vt) =>
        assert(vt > vf, s"key $k: empty interval [$vf, $vt)")
      }
      val sorted = vs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq((_, _, vt1), (_, vf2, _)) =>
          assert(vt1 == vf2, s"key $k: gap between versions ($vt1 != $vf2)")
        case _ => ()
      }
      // chains are 1 or 2 versions in this two-snapshot merge
      assert(vs.size <= 2, s"key $k emitted ${vs.size} versions")
    }
    // all four outcomes actually occur in the fixture
    val byShape = rows.groupBy(_._1).values.toSeq
    assert(byShape.exists(v => v.size == 2)) // changed keys
    assert(byShape.exists(v => v.size == 1 && v.head._2 == 200L)) // inserts
    assert(byShape.exists(v =>
      v.size == 1 && v.head._3 != Open)) // deletes
    assert(byShape.exists(v =>
      v.size == 1 && v.head._2 == 100L && v.head._3 == Open)) // unchanged
  }
}
