package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.DedupQueries

/** The s-keyed inverted sidecar (`<ddPrefix>_cm`) must be an EXACT
  * serving twin of the corpus-scan decontamination check — byte-equal
  * flags on the real gate path (fresh and replayed), byte-equal at the
  * union-cap boundary on planted frames — and must mirror the primary
  * shingle table through append and purge+compact (the two postings
  * copies may never disagree). */
class ContamSidecarSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val dPred = col("doc_id") % 5 === 3

  private def deltaDocs = spark.read.parquet(s"$dir/documents.parquet")
    .filter(dPred).select(col("doc_id"), col("source"), col("text"))

  private def deltaVecs = spark.read.parquet(s"$dir/embeddings.parquet")
    .filter(col("vec_id") % 5 === 3)
    .select(col("vec_id"), col("embedding"))

  private def withSidecar[T](on: Boolean)(body: => T): T =
    try {
      spark.conf.set("graft.contam.sidecar", on.toString)
      body
    } finally spark.conf.unset("graft.contam.sidecar")

  test("gate verdicts: sidecar-served == corpus-scan, fresh and replayed") {
    dropPrefix("csc")
    IngestGate.build(spark, dir, "csc", buckets = 4,
      whereDocs = !dPred, whereVecs = !(col("vec_id") % 5 === 3))
    try {
      def verdicts(): Seq[org.apache.spark.sql.Row] =
        IngestGate.checkDelta(spark, dir, "csc", deltaDocs, deltaVecs)
          .orderBy("doc_id").collect().toSeq
      val viaCm = withSidecar(on = true)(verdicts())
      val viaScan = withSidecar(on = false)(verdicts())
      assert(viaCm.nonEmpty)
      assert(viaCm == viaScan)
      // and the verdict actually fires somewhere at this SF — an
      // all-zero column would make the equality vacuous
      assert(viaCm.exists(_.getAs[Long]("eval_contam") == 1L))

      // replay: file the batch, re-check on BOTH paths — identical to
      // the pre-append verdicts (the sidecar's delta-id anti-join
      // hides its own filed copies exactly like the corpus scan's)
      IngestGate.appendDelta(spark, "csc", deltaDocs, deltaVecs,
        buckets = 4)
      assert(withSidecar(on = true)(verdicts()) == viaCm)
      assert(withSidecar(on = false)(verdicts()) == viaCm)
    } finally dropPrefix("csc")
  }

  test("sidecar mirrors the primary postings through build, append, and purge+compact") {
    dropPrefix("cscm")
    IngestGate.build(spark, dir, "cscm", buckets = 4,
      whereDocs = !dPred, whereVecs = !(col("vec_id") % 5 === 3))
    try {
      def mirror(): Unit = {
        val primary = BucketedTables.read(spark, "cscm_dd_shingles")
          .join(BucketedTables.read(spark, "cscm_split"), Seq("doc_id"))
          .select(col("s"), col("doc_id"), col("n"), col("is_train"))
          .collect().toSet
        val sidecar = BucketedTables
          .read(spark, DedupIndexLayout.cmTable("cscm_dd"))
          .select(col("s"), col("doc_id"), col("n"), col("is_train"))
          .collect().toSet
        assert(sidecar == primary)
      }
      mirror()
      IngestGate.appendDelta(spark, "cscm", deltaDocs, deltaVecs,
        buckets = 4)
      mirror()
      // purge a filed doc; compact must erase its rows from BOTH
      // postings copies in the same pass
      val victim = spark.table("cscm_dd_shingles")
        .select(col("doc_id")).head().getLong(0)
      DedupIndexLayout.purgeDocs(spark, "cscm_dd",
        Seq(victim).toDF("doc_id"))
      DedupIndexLayout.compact(spark, "cscm_dd", buckets = 4)
      assert(spark.table("cscm_dd_shingles")
        .filter(col("doc_id") === victim).count() == 0L)
      assert(spark.table(DedupIndexLayout.cmTable("cscm_dd"))
        .filter(col("doc_id") === victim).count() == 0L)
      // note: the split table keeps the victim's row — tombstoning is
      // the dd layout's lifecycle; the mirror invariant is re-checked
      // on the surviving doc set
      val primaryLeft = BucketedTables.read(spark, "cscm_dd_shingles")
        .select(col("s"), col("doc_id"), col("n")).collect().toSet
      val sidecarLeft = BucketedTables
        .read(spark, DedupIndexLayout.cmTable("cscm_dd"))
        .select(col("s"), col("doc_id"), col("n")).collect().toSet
      assert(sidecarLeft == primaryLeft)
    } finally dropPrefix("cscm")
  }

  test("union-cap boundary: sidecar twin == corpus-scan twin on planted frames, flags exact") {
    // planted postings, is_train controlled directly (no text needed):
    //  - shingle 1: cold (df 2) — carried by eval doc 100 (n_eval=2)
    //    and train doc 200
    //  - shingle 2: eval doc 100's second shingle
    //  - shingle 98: old_df 997 + d_cnt 3 = 1000 == MaxPostingList —
    //    EXACTLY at the cap, still cold (boundary inclusion)
    //  - shingle 99: old_df 998 + d_cnt 3 = 1001 — one past the cap,
    //    hot, excluded
    // delta: D1 (train) shares {1} with eval 100 → common/n_eval =
    // 1/2 ≥ 0.5 → FLAGGED; D2 (train) shares only {98} with eval 300
    // (n_eval=1, ratio 1) → flagged THROUGH the at-cap shingle; D3
    // (train) shares only {99} with eval 400 → NOT flagged (hot); D4
    // is eval-side → never flagged.
    // 98: 996 + doc 300 → old_df 997; +3 delta carriers = 1000 == cap
    // 99: 997 + doc 400 → old_df 998; +3 delta carriers = 1001 >  cap
    val evalHot = (1L to 997L).map(i => (400L + i, 99L, 1L, false))
    val evalHot98 = (1L to 996L).map(i => (2000L + i, 98L, 1L, false))
    val corpus = (Seq(
      (100L, 1L, 2L, false), (100L, 2L, 2L, false),
      (200L, 1L, 1L, true),
      (300L, 98L, 1L, false),
      (400L, 99L, 1L, false)) ++ evalHot ++ evalHot98)
      .toDF("doc_id", "s", "n", "is_train")
    // old_df(1)=2, old_df(2)=1, old_df(98)=995+1+1=997, 99: 996+1+1=998
    val shD = Seq(
      (10L, 1L, 2L), (10L, 3L, 2L),
      (11L, 98L, 1L),
      (12L, 99L, 1L),
      (13L, 1L, 1L),
      // two more delta docs carrying 98 and 99 so d_cnt(98)=3 lands
      // the union df exactly ON the cap and d_cnt(99)=3 one past it
      (14L, 98L, 2L), (14L, 99L, 2L),
      (15L, 98L, 2L), (15L, 99L, 2L))
      .toDF("doc_id", "s", "n")
    val ids = Seq(10L, 11L, 12L, 13L, 14L, 15L).toDF("doc_id")
    val trainIds = Seq(10L, 11L, 12L, 13L, 14L, 15L).toDF("doc_id")

    val viaScan = DedupQueries.contamDeltaFlags(
        corpus.select(col("doc_id"), col("s"), col("n")), shD,
        corpus.select(col("doc_id"), col("is_train")).distinct(),
        trainIds)
      .collect().map(_.getLong(0)).toSet
    val viaCm = DedupQueries.contamDeltaFlagsCm(spark, corpus, shD, ids,
        trainIds)
      .collect().map(_.getLong(0)).toSet
    assert(viaScan == viaCm)
    // exact expectation: 10 via cold shingle 1 (ratio 1/2), 11 via
    // the AT-cap shingle 98 vs eval 300 and the planted 98-carriers
    // (ratio 1), 14/15 likewise via 98; 12 only via the hot 99 →
    // excluded; 13 via shingle 1 vs eval 100: common=1, n_eval=2 →
    // ratio 0.5 → included (the ≥ floor)
    assert(viaCm == Set(10L, 11L, 13L, 14L, 15L), viaCm.toSeq.sorted)
  }

  test("sidecar path above the IN-pushdown gate (broadcast semi-join leg) stays byte-equal") {
    // force the >MaxPushdownIn branch with a tiny key budget is not
    // possible (MaxPushdownIn is a constant), so plant a delta whose
    // DISTINCT shingle count exceeds it cheaply: 5000 synthetic
    // shingles across two docs, one shared with an eval corpus doc
    val corpus = Seq((1L, 7L, 1L, false), (2L, 7L, 1L, true))
      .toDF("doc_id", "s", "n", "is_train")
    val shD = ((1L to 5000L).map(i => (50L, 1000L + i, 5001L)) :+
      ((50L, 7L, 5001L))).toDF("doc_id", "s", "n")
    val ids = Seq(50L).toDF("doc_id")
    val trainIds = Seq(50L).toDF("doc_id")
    val viaScan = DedupQueries.contamDeltaFlags(
        corpus.select(col("doc_id"), col("s"), col("n")), shD,
        corpus.select(col("doc_id"), col("is_train")).distinct(),
        trainIds)
      .collect().map(_.getLong(0)).toSet
    val viaCm = DedupQueries.contamDeltaFlagsCm(spark, corpus, shD, ids,
        trainIds)
      .collect().map(_.getLong(0)).toSet
    assert(viaScan == viaCm)
    // doc 50 contains eval doc 1 entirely (common=1, n_eval=1)
    assert(viaCm == Set(50L))
  }
}
