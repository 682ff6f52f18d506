package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two non-monotone branches of the incremental curation state —
  * branches the driver testdata can never reach (no posting list
  * exceeds 25 docs, no LSH bucket exceeds 1000 vectors), so each gets
  * a planted fixture big enough to cross its cap:
  *
  *  - contamPairsState: a shingle whose df CROSSES the posting cap
  *    stops counting toward every stored pair — pairs whose margin
  *    was the crossing shingle must drop, pairs with enough other
  *    overlap must survive with the recomputed (smaller) common;
  *  - cosPairsState: a delta growing an LSH bucket past the md5 pool
  *    cap EVICTS corpus vectors from the pool — pairs whose only
  *    canonical witness was the evicted membership must drop.
  *
  * Both asserted byte-equal to the online recompute over corpus ∪
  * delta (the same equality CuratedDeltaSpec pins end to end on real
  * data, where these branches stay cold). */
class CurateStateSpec extends SparkSpec {
  import spark.implicits._

  private def assertSameRows(got: DataFrame, want: DataFrame,
      what: String): Unit = {
    val extra = got.exceptAll(want).count()
    val missing = want.exceptAll(got).count()
    assert(extra == 0 && missing == 0,
      s"$what drifted from the online recompute: +$extra extra, " +
        s"-$missing missing (of ${want.count()} expected)")
  }

  test("posting-cap crossing: affected pairs recompute exactly") {
    // 998 corpus docs all sharing shingle "x x x" (df 998 <= 1000);
    // 5 delta docs push it to 1003 — the cap crossing. Pattern A
    // pairs (i < 250) share 3 of 4 shingles: containment 3/4 with the
    // crossing shingle, 2/4 without — they SURVIVE the recompute at
    // exactly the floor. Pattern B pairs share 2 of 3: 2/3 with,
    // 1/3 without — they DROP.
    val corpus = (0 until 499).flatMap { i =>
      if (i < 250) Seq(
        (2L * i, "s", s"x x x a$i a$i b$i"),
        (2L * i + 1, "s", s"x x x a$i a$i c$i"))
      else Seq(
        (2L * i, "s", s"x x x g$i h$i"),
        (2L * i + 1, "s", s"x x x g$i k$i"))
    }
    val delta = (0 until 5).map(j => (10000L + j, "s", s"x x x d$j e$j"))
    val cDocs = corpus.toDF("doc_id", "source", "text")
    val dDocs = delta.toDF("doc_id", "source", "text")
    val uDocs = cDocs.unionByName(dDocs)

    val baseC = DedupQueries.curateBaseOf(cDocs).localCheckpoint(true)
    val baseU = DedupQueries.curateBaseOf(uDocs).localCheckpoint(true)
    val shC = DedupQueries.shinglesOf(cDocs).localCheckpoint(true)
    val (storedF, postC) = DedupQueries.contamPairsFrom(baseC, shC)
    val stored = storedF.localCheckpoint(true)
    postC.unpersist(false)
    assert(stored.count() > 0, "fixture produced no corpus pairs")

    val got = DedupQueries.contamPairsState(
      DedupQueries.withSizes(shC),
      DedupQueries.withSizes(DedupQueries.shinglesOf(dDocs)),
      baseU.select(col("doc_id"), col("is_train")),
      dDocs.select(col("doc_id")),
      stored)
    val (wantF, postU) = DedupQueries.contamPairsFrom(baseU,
      DedupQueries.shinglesOf(uDocs))
    val want = wantF.localCheckpoint(true)
    postU.unpersist(false)
    // fixture strength: the crossing genuinely dropped pairs AND
    // genuinely kept recomputed ones
    val dropped = stored.select("eval_doc", "doc_id")
      .exceptAll(want.select("eval_doc", "doc_id")).count()
    assert(dropped > 0, "no pair dropped — crossing branch not exercised")
    assert(want.count() > 0, "all pairs dropped — recompute-keep not exercised")
    assertSameRows(got, want, "contamination state")
  }

  test("LSH pool-cap eviction: touched-bucket pairs recompute exactly") {
    // 1100 near-identical corpus vectors collapse into ONE bucket per
    // band (projections dominated by the shared base direction); 150
    // delta twins grow it to 1250 — the md5 pool keep-rate drops from
    // 1000/1100 to 1000/1250 and ~10% of corpus vectors fall out of
    // the pool, killing every pair they canonically generated.
    val base = Array.tabulate(64)(k => 1f + k * 0.01f)
    val rnd = new scala.util.Random(23)
    def near(): Array[Float] = base.map(_ + (rnd.nextFloat() - 0.5f) * 0.002f)
    val cVecs = (0L until 1100L).map(id => (id, near()))
      .toDF("vec_id", "embedding")
    val dVecs = (5000L until 5150L).map(id => (id, near()))
      .toDF("vec_id", "embedding")
    val uVecs = cVecs.unionByName(dVecs)

    val eC = DedupQueries.normedDirVecs(cVecs)
    val eU = DedupQueries.normedDirVecs(uVecs)
    val storedBands = DedupQueries.cosineBandsOf(eC).localCheckpoint(true)
    // fixture strength: one bucket per band, all 1100 members
    val maxBucket = storedBands.groupBy("band", "code").count()
      .agg(max("count")).head.getLong(0)
    assert(maxBucket == 1100L,
      s"corpus did not collapse into one bucket (max=$maxBucket)")
    val stored = DedupQueries.cosineLshFromBands(eC, storedBands)
      .localCheckpoint(true)
    assert(stored.count() > 0)

    val got = DedupQueries.cosPairsState(eU, storedBands,
      DedupQueries.cosineBandsOf(DedupQueries.normedDirVecs(dVecs)),
      stored, dVecs.select(col("vec_id")))
    val uBands = DedupQueries.cosineBandsOf(eU).localCheckpoint(true)
    val want = DedupQueries.cosineLshFromBands(eU, uBands)
      .localCheckpoint(true)
    val dropped = stored.select("vec_a", "vec_b")
      .exceptAll(want.select("vec_a", "vec_b")).count()
    assert(dropped > 0, "no pair dropped — pool eviction not exercised")
    assertSameRows(got, want, "cosine pair state")
  }
}
