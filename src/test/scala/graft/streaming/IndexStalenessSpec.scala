package graft.streaming

import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec
import graft.sources.TextIndexLayout

/** Index staleness paging: the audit scalars must read ~zero for a
  * fresh index, grow when OOV documents stream in, raise the alert
  * only after a sustained breach, and clear after a rebuild — the
  * HighEventFailureRate raise/clear discipline applied to geometry
  * drift. */
class IndexStalenessSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def drop(prefix: String): Unit = dropPrefix(prefix)

  test("a fresh index audits clean; a drifted corpus raises; rebuild clears") {
    // fixture: the real corpus plus a wave of OOV documents that the
    // frozen vocabulary has never seen (every token novel), long
    // enough to also move avgdl
    val d = tmpDir("graft-staleness")
    val baseDocs = graft.util.Tables.load(spark, dir, "documents")
    writeFixture(d, "documents", baseDocs)
    TextIndexLayout.build(spark, d.toString, "stale_idx", buckets = 4)

    try {
      val mon = new IndexStalenessMonitor(
        oovMassPpm = 50000L, avgdlShiftPpm = 100000L, sustainMs = 1000L)

      // t=0: corpus == build corpus -> both scalars exactly zero
      val (oov0, avg0) = mon.check(spark, d.toString, "stale_idx", 0L)
      assert(oov0 == 0L && avg0 == 0L)
      assert(!mon.firing)

      // the corpus grows by OOV documents (novel vocabulary)
      val maxId = baseDocs.agg(org.apache.spark.sql.functions.max(col("doc_id")))
        .head().getLong(0)
      val oovDocs = (1 to 200).map { i =>
        val text = (1 to 40).map(j => s"zzqnovel${i}_$j").mkString(" ")
        (maxId + i, s"src_oov", "xx", text.length.toLong, text)
      }.toDF("doc_id", "source", "lang", "n_chars", "text")
        .select(baseDocs.columns.map(col): _*) // align column order
      writeFixture(d, "documents", baseDocs.unionByName(oovDocs))

      // t=1s: breach measured, but not yet sustained -> no page
      val (oov1, _) = mon.check(spark, d.toString, "stale_idx", 1000L)
      assert(oov1 > 50000L, s"planted OOV mass only $oov1 ppm")
      assert(!mon.firing)
      // t=2.5s: still breached, sustain window passed -> page
      mon.check(spark, d.toString, "stale_idx", 2500L)
      assert(mon.firing)

      // the operator pays the rebuild: new geometry covers the corpus
      TextIndexLayout.build(spark, d.toString, "stale_idx", buckets = 4)
      val (oov2, avg2) = mon.check(spark, d.toString, "stale_idx", 3000L)
      assert(oov2 == 0L && avg2 == 0L)
      assert(!mon.firing)

      val t = mon.transitions
      assert(t.map(_.firing) == Seq(true, false), t.mkString(", "))
      assert(t.head.atMs == 2500L && t.last.atMs == 3000L)
    } finally drop("stale_idx")
  }

  test("sustained-breach semantics match the AlertMonitor rule") {
    val mon = new IndexStalenessMonitor(
      oovMassPpm = 10000L, avgdlShiftPpm = 100000L, sustainMs = 2000L)
    mon.record(0L, 20000L, 0L) // breach starts
    assert(!mon.firing)
    mon.record(1000L, 20000L, 0L) // sustained 1s < 2s
    assert(!mon.firing)
    mon.record(1500L, 0L, 0L) // recovers -> sustain resets
    mon.record(2500L, 20000L, 0L) // new breach epoch
    assert(!mon.firing)
    mon.record(4500L, 20000L, 0L) // sustained 2s -> fire
    assert(mon.firing)
    mon.record(5000L, 0L, 0L) // level drops -> clears immediately
    assert(!mon.firing)
    // avgdl leg pages on its own
    mon.record(7000L, 0L, 200000L)
    mon.record(9000L, 0L, 200000L)
    assert(mon.firing)
    assert(mon.transitions.map(_.firing) == Seq(true, false, true))
  }

  test("the audit rides the delta-maintenance stream's cadence") {
    // the deployment wiring: each maintainStream micro-batch appends
    // its delta, then the monitor audits — a replayed/ongoing stream
    // of OOV docs walks the index into a page without any manual step
    val d = tmpDir("graft-staleness-stream")
    writeFixture(d, "documents", graft.util.Tables.load(spark, dir, "documents"))
    TextIndexLayout.build(spark, d.toString, "stale_str", buckets = 4)
    try {
      val mon = new IndexStalenessMonitor(
        oovMassPpm = 50000L, avgdlShiftPpm = 1000000L, sustainMs = 0L)
      implicit val sqlCtx = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      var at = 0L
      val q = mem.toDF().toDF("doc_id", "text").writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          TextIndexLayout.appendDeltaDocs(spark, "stale_str", batch, 4)
          // the live corpus the audit sees = base + streamed so far;
          // the spec materializes it the way a real pipeline's raw
          // sink would
          val streamed = spark.table(
            s"${TextIndexLayout.livePrefix(spark, "stale_str")}_postings")
          val _ = streamed.count() // force delta visibility
          at += 1000L
          mon.check(spark, d.toString, "stale_str", at)
          ()
        }
        .start()
      try {
        // batch 1: in-vocabulary delta (recycled corpus text) -> quiet
        val recycled = graft.util.Tables.load(spark, dir, "documents")
          .orderBy(col("doc_id")).limit(3)
          .select(col("doc_id") + 100000L, col("text"))
          .as[(Long, String)].collect().toSeq
        mem.addData(recycled: _*)
        q.processAllAvailable()
        assert(!mon.firing)
        // batch 2: the CORPUS ITSELF drifts (OOV wave lands in the raw
        // store); the audit compares live corpus vs frozen vocab.
        // Rebuild the fixture from the pristine source dir — reading
        // back the fixture while overwriting it races the scan
        val base = graft.util.Tables.load(spark, dir, "documents")
        val oovDocs = (1 to 300).map { i =>
          val text = (1 to 40).map(j => s"qqxnovel${i}_$j").mkString(" ")
          (200000L + i, "src_oov", "xx", text.length.toLong, text)
        }.toDF("doc_id", "source", "lang", "n_chars", "text")
          .select(base.columns.map(col): _*)
        writeFixture(d, "documents", base.unionByName(oovDocs))
        mem.addData((999999L, "trigger tick") : (Long, String))
        q.processAllAvailable()
        assert(mon.firing, mon.transitions.mkString(", "))
      } finally q.stop()
    } finally dropPrefix("stale_str")
  }
}
