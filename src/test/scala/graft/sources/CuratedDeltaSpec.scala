package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.DedupQueries

/** Incremental curated-corpus refresh: a corpus-only build plus one
  * delta refresh must serve the BYTE-IDENTICAL artifact (docs,
  * manifest, handoff gate) as a full build over corpus ∪ delta — the
  * restricted-equality discipline of dedup_delta_pairs applied to the
  * whole 8-stage composite, including its global couplings (exact
  * keep-min evictions, mix-rate flips, delta-eval contamination of
  * corpus-train docs). A replayed refresh must change nothing. */
class CuratedDeltaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // prefix sweep (catalog + orphaned warehouse dirs): enumerating
  // table names here leaked `_cos_geom`/`_dd_ids` orphans across JVMs
  private def dropAll(prefix: String): Unit = dropPrefix(prefix)

  test("refresh == full rebuild over corpus ∪ delta; replay idempotent") {
    dropAll("curd"); dropAll("curd_ref")
    // the full-corpus reference artifact
    CuratedCorpusLayout.build(spark, dir, "curd_ref", buckets = 4)
    val refDocs = CuratedCorpusLayout.serve(spark, "curd_ref")
      .orderBy(col("doc_id")).collect().toSeq
    val refManifest = CuratedCorpusLayout.manifest(spark, "curd_ref")
      .orderBy(col("stage")).collect().toSeq
    assert(refDocs.nonEmpty)

    // corpus-only incremental build, then one snapshot refresh
    CuratedCorpusLayout.buildIncremental(spark, dir, "curd", buckets = 4,
      where = !DedupQueries.DeltaPred,
      whereVec = col("vec_id") % 5 =!= 3)
    val deltaDocs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(DedupQueries.DeltaPred)
      .select(col("doc_id"), col("source"), col("text"))
    val deltaVecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 5 === 3)
      .select(col("vec_id"), col("embedding"))
    // the corpus-only artifact must differ from the union reference
    // (otherwise the equality below proves nothing)
    val preDocs = CuratedCorpusLayout.serve(spark, "curd")
      .orderBy(col("doc_id")).collect().toSeq
    assert(preDocs != refDocs, "delta split changed nothing — weak fixture")

    CuratedCorpusLayout.refresh(spark, dir, "curd", deltaDocs, deltaVecs,
      buckets = 4)
    val gotDocs = CuratedCorpusLayout.serve(spark, "curd")
      .orderBy(col("doc_id")).collect().toSeq
    assert(gotDocs == refDocs,
      s"refresh drifted from the full rebuild: got ${gotDocs.size} rows, " +
        s"ref ${refDocs.size}; first diff: ${
          gotDocs.zipAll(refDocs, null, null).find(p => p._1 != p._2)}")
    val gotManifest = CuratedCorpusLayout.manifest(spark, "curd")
      .orderBy(col("stage")).collect().toSeq
    assert(gotManifest == refManifest,
      s"manifest drifted:\n$gotManifest\n$refManifest")
    val gate = CuratedCorpusLayout.verifyHandoff(spark, "curd")
      .collect().head
    assert(gate.getAs[Boolean]("ok"), gate.toString)

    // replay: the identical refresh must reconverge to the same state
    CuratedCorpusLayout.refresh(spark, dir, "curd", deltaDocs, deltaVecs,
      buckets = 4)
    val replayDocs = CuratedCorpusLayout.serve(spark, "curd")
      .orderBy(col("doc_id")).collect().toSeq
    assert(replayDocs == refDocs, "replayed refresh drifted")
    val replayManifest = CuratedCorpusLayout.manifest(spark, "curd")
      .orderBy(col("stage")).collect().toSeq
    assert(replayManifest == refManifest, "replayed manifest drifted")

    // compaction erases evicted rows physically; serve unchanged
    CuratedCorpusLayout.compactDocs(spark, "curd", buckets = 4)
    val compacted = CuratedCorpusLayout.serve(spark, "curd")
      .orderBy(col("doc_id")).collect().toSeq
    assert(compacted == refDocs, "compaction changed served rows")
    dropAll("curd"); dropAll("curd_ref")
  }

  test("refresh honors the persisted W=8 geometry; missing sidecar fails") {
    dropAll("curw"); dropAll("curw_ref")
    // full incremental build over corpus ∪ delta at the WIDE-band
    // geometry (4 bands × 8 planes — the dial a 100× corpus turns)
    CuratedCorpusLayout.buildIncremental(spark, dir, "curw_ref",
      buckets = 4, cosNBands = 4, cosPlanesPerBand = 8)
    val refDocs = CuratedCorpusLayout.serve(spark, "curw_ref")
      .orderBy(col("doc_id")).collect().toSeq
    val refManifest = CuratedCorpusLayout.manifest(spark, "curw_ref")
      .orderBy(col("stage")).collect().toSeq
    assert(refDocs.nonEmpty)

    // corpus-only build at W=8, then one refresh: the delta must be
    // banded under the PERSISTED geometry (a default-W=6 delta would
    // probe disjoint buckets and silently miss cross-set near-dups)
    CuratedCorpusLayout.buildIncremental(spark, dir, "curw", buckets = 4,
      where = !DedupQueries.DeltaPred,
      whereVec = col("vec_id") % 5 =!= 3,
      cosNBands = 4, cosPlanesPerBand = 8)
    val deltaDocs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(DedupQueries.DeltaPred)
      .select(col("doc_id"), col("source"), col("text"))
    val deltaVecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 5 === 3)
      .select(col("vec_id"), col("embedding"))
    CuratedCorpusLayout.refresh(spark, dir, "curw", deltaDocs, deltaVecs,
      buckets = 4)
    val gotDocs = CuratedCorpusLayout.serve(spark, "curw")
      .orderBy(col("doc_id")).collect().toSeq
    assert(gotDocs == refDocs,
      s"W=8 refresh drifted from the W=8 rebuild: got ${gotDocs.size}, " +
        s"ref ${refDocs.size}")
    val gotManifest = CuratedCorpusLayout.manifest(spark, "curw")
      .orderBy(col("stage")).collect().toSeq
    assert(gotManifest == refManifest)

    // a prefix without the geometry sidecar must refuse to refresh —
    // banding a delta under a guessed geometry is silent recall loss
    spark.sql("DROP TABLE IF EXISTS curw_cos_geom")
    val e = intercept[IllegalArgumentException] {
      CuratedCorpusLayout.refresh(spark, dir, "curw", deltaDocs, deltaVecs,
        buckets = 4)
    }
    assert(e.getMessage.contains("_cos_geom"), e.getMessage)
    dropAll("curw"); dropAll("curw_ref")
  }

  test("AUTO geometry: thresholds scale with the corpus; floor at W=6") {
    // pure resolution: smallest W with nVecs/2^W <= AutoTargetPostings,
    // floored at the recall-favoring audit default, capped at 16
    assert(CuratedCorpusLayout.autoPlanesPerBand(0L) == 6)
    assert(CuratedCorpusLayout.autoPlanesPerBand(2000L) == 6) // sf0.1
    assert(CuratedCorpusLayout.autoPlanesPerBand(65536L) == 6) // 1024·2^6
    assert(CuratedCorpusLayout.autoPlanesPerBand(65537L) == 7)
    assert(CuratedCorpusLayout.autoPlanesPerBand(100000L) == 7) // 50× decade
    assert(CuratedCorpusLayout.autoPlanesPerBand(200000L) == 8) // 100× decade
    assert(CuratedCorpusLayout.autoPlanesPerBand(Long.MaxValue) == 16)
    // at W: postings bound holds (n/2^W ≤ target < n/2^(W-1) when above
    // the floor) — the defining inequality, checked at the 100× point
    val w = CuratedCorpusLayout.autoPlanesPerBand(200000L)
    assert(200000L / (1L << w) <= CuratedCorpusLayout.AutoTargetPostings)
    assert(200000L / (1L << (w - 1)) >
      CuratedCorpusLayout.AutoTargetPostings)
  }

  test("AUTO default build == explicit W=6 build at bounded SF") {
    dropAll("cura"); dropAll("cura_ref")
    // the default is now AUTO; at spec SF it must resolve to the W=6
    // floor and persist it — byte-identical state to the explicit build
    CuratedCorpusLayout.buildIncremental(spark, dir, "cura", buckets = 4)
    CuratedCorpusLayout.buildIncremental(spark, dir, "cura_ref",
      buckets = 4, cosPlanesPerBand = DedupQueries.CosineLshBandPlanes)
    val geom = spark.table("cura_cos_geom").head()
    assert(geom.getAs[Int]("planes_per_band") == 6,
      s"auto resolved ${geom.getAs[Int]("planes_per_band")}, expected the floor")
    def state(p: String) = (
      CuratedCorpusLayout.serve(spark, p).orderBy(col("doc_id"))
        .collect().toSeq,
      CuratedCorpusLayout.manifest(spark, p).orderBy(col("stage"))
        .collect().toSeq,
      spark.table(s"${p}_cos_pairs").orderBy(col("vec_a"), col("vec_b"))
        .collect().toSeq)
    assert(state("cura") == state("cura_ref"),
      "auto-geometry build drifted from the explicit W=6 build")
    dropAll("cura"); dropAll("cura_ref")
  }

  test("incremental build over the full corpus equals the plain build") {
    dropAll("curi"); dropAll("curi_ref")
    CuratedCorpusLayout.build(spark, dir, "curi_ref", buckets = 4)
    CuratedCorpusLayout.buildIncremental(spark, dir, "curi", buckets = 4)
    val ref = CuratedCorpusLayout.serve(spark, "curi_ref")
      .orderBy(col("doc_id")).collect().toSeq
    val got = CuratedCorpusLayout.serve(spark, "curi")
      .orderBy(col("doc_id")).collect().toSeq
    assert(ref.nonEmpty && got == ref)
    val refM = CuratedCorpusLayout.manifest(spark, "curi_ref")
      .orderBy(col("stage")).collect().toSeq
    val gotM = CuratedCorpusLayout.manifest(spark, "curi")
      .orderBy(col("stage")).collect().toSeq
    assert(gotM == refM)
    dropAll("curi"); dropAll("curi_ref")
  }
}
