package graft.sources

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.queries.TextQueries

/** Maintenance contract of [[BucketedTables.compact]] on both
  * persisted index layouts: after N delta appends the file count per
  * bucket has grown N+1-fold; compaction re-bounds it to one file per
  * bucket while leaving the served results byte-identical and the
  * bucket spec intact (further appends still validate against the
  * catalog and serving still reads the bucketed layout). */
class CompactIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ANN index: N deltas grow files per bucket; compact re-bounds; serve identical") {
    dropPrefix("ann_cmp")
    val buckets = 4
    AnnIndexLayout.build(spark, dir, "ann_cmp", buckets,
      where = col("vec_id") < 200L)
    try {
      AnnIndexLayout.appendDelta(spark, dir, "ann_cmp",
        col("vec_id") >= 200L && col("vec_id") < 350L, buckets)
      AnnIndexLayout.appendDelta(spark, dir, "ann_cmp",
        col("vec_id") >= 350L, buckets)
      // build + 2 deltas -> 3 file generations per (non-empty) bucket;
      // a bucket only yields a file when some key hashes into it (the
      // cells table has few distinct cell ids), so counts are relative
      val phys = AnnIndexLayout.livePrefix(spark, "ann_cmp")
      val cellsBefore = spark.table(s"${phys}_cells").inputFiles.length
      val codesBefore = spark.table(s"${phys}_codes").inputFiles.length

      val before = AnnIndexLayout.query(spark, dir, "ann_cmp")
        .collect().toSeq
      assert(before.nonEmpty)
      AnnIndexLayout.compact(spark, "ann_cmp", buckets)
      val cellsAfter = spark.table(s"${phys}_cells").inputFiles.length
      val codesAfter = spark.table(s"${phys}_codes").inputFiles.length
      assert(cellsAfter <= buckets && cellsBefore >= 2 * cellsAfter,
        s"cells files $cellsBefore -> $cellsAfter")
      assert(codesAfter <= buckets && codesBefore >= 2 * codesAfter,
        s"codes files $codesBefore -> $codesAfter")
      val after = AnnIndexLayout.query(spark, dir, "ann_cmp")
        .collect().toSeq
      assert(after == before)

      // the bucket spec survived the swap: another delta append still
      // validates against the catalog (a drifted spec fails loudly)
      AnnIndexLayout.appendDelta(spark, dir, "ann_cmp",
        col("vec_id") >= 350L, buckets) // no-op rows (anti-joined away)
      assert(AnnIndexLayout.query(spark, dir, "ann_cmp")
        .collect().toSeq == before)
    } finally dropPrefix("ann_cmp")
  }

  test("text index: compact re-bounds postings files; serve identical") {
    dropPrefix("txt_cmp")
    val buckets = 4
    TextIndexLayout.build(spark, dir, "txt_cmp", buckets,
      where = col("doc_id") < 250L)
    try {
      TextIndexLayout.appendDelta(spark, dir, "txt_cmp",
        col("doc_id") >= 250L && col("doc_id") < 400L, buckets)
      TextIndexLayout.appendDelta(spark, dir, "txt_cmp",
        col("doc_id") >= 400L, buckets)
      val phys = TextIndexLayout.livePrefix(spark, "txt_cmp")
      val postBefore = spark.table(s"${phys}_postings").inputFiles.length
      assert(postBefore >= 2 * buckets, s"postings files $postBefore")

      val before = TextIndexLayout.query(spark, dir, "txt_cmp")
        .collect().toSeq
      assert(before.nonEmpty)
      TextIndexLayout.compact(spark, "txt_cmp", buckets)
      // the vocabulary hashes into every bucket, so the compacted
      // table is exactly one file per bucket
      assert(spark.table(s"${phys}_postings").inputFiles.length == buckets)
      assert(TextIndexLayout.query(spark, dir, "txt_cmp")
        .collect().toSeq == before)

      TextIndexLayout.appendDelta(spark, dir, "txt_cmp",
        col("doc_id") >= 400L, buckets) // already filed -> appends nothing
      assert(spark.table(s"${phys}_postings").inputFiles.length == buckets)
    } finally dropPrefix("txt_cmp")
  }
}
