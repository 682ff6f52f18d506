package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.MultimodalQueries

/** The unified ingest gate must agree with the oracle-checked
  * `mm_ingest_accounting` query, re-emit identical verdicts on a
  * replayed (already-appended) batch, and keep its verdicts stable
  * through a two-micro-batch streamed ingest. */
class IngestGateSpec extends SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val dir = "/root/testdata/sf0.001"

  // prefix sweep (catalog + orphaned warehouse dirs) — see SparkSpec
  private def dropAll(prefix: String): Unit = dropPrefix(prefix)

  private def corpusBuild(prefix: String): Unit =
    IngestGate.build(spark, dir, prefix, buckets = 4,
      whereDocs = !(col("doc_id") % 5 === 3),
      whereVecs = !(col("vec_id") % 5 === 3))

  private def deltaDocs = spark.read.parquet(s"$dir/documents.parquet")
    .filter(col("doc_id") % 5 === 3)
    .select(col("doc_id"), col("source"), col("text"))

  private def deltaVecs = spark.read.parquet(s"$dir/embeddings.parquet")
    .filter(col("vec_id") % 5 === 3)
    .select(col("vec_id"), col("embedding"))

  test("gate rollup equals the registered query; replay is identical") {
    dropAll("ig")
    corpusBuild("ig")
    try {
      val verdicts = IngestGate.checkDelta(spark, dir, "ig",
        deltaDocs, deltaVecs).localCheckpoint(true)
      // keep == no modality flagged, row per delta doc
      assert(verdicts.count() == deltaDocs.count())
      assert(verdicts.filter(col("keep") =!=
        (col("text_dup") === 0L && col("media_dup") === 0L &&
          col("sem_dup") === 0L)).count() == 0)
      // the gate's rollup IS the oracle-checked query
      val fromGate = IngestGate.accountingOf(verdicts).collect().toSeq
      val registered = MultimodalQueries.ingestAccounting(spark, dir)
        .collect().toSeq
      assert(fromGate.nonEmpty && fromGate == registered,
        s"gate drifted from mm_ingest_accounting:\n$fromGate\n$registered")
      // crossmodal verdicts actually split (fixture strength)
      val kinds = verdicts.select(col("crossmodal")).distinct()
        .as[String].collect().toSet
      assert(kinds.contains("none") && (kinds - "none").nonEmpty, kinds)
      // the eval-leak verdict reconciles with dedup_contam_delta
      import org.apache.spark.sql.types.LongType
      val fromGateContam = verdicts.filter(col("is_train"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_new_train"),
          sum(col("eval_contam")).as("n_contam"))
        .select(col("source"), col("n_new_train"), col("n_contam"),
          floor(col("n_contam") * lit(10000L) / col("n_new_train"))
            .cast(LongType).as("contam_share_bp"))
        .orderBy(col("source")).collect().toSeq
      val registeredContam = graft.queries.DedupQueries
        .contamDelta(spark, dir).collect().toSeq
      assert(fromGateContam == registeredContam,
        s"gate eval_contam drifted from dedup_contam_delta:\n" +
          s"$fromGateContam\n$registeredContam")
      // train_ok is the conjunction it claims to be
      assert(verdicts.filter(col("train_ok") =!=
        (col("keep") && col("is_train") && col("eval_contam") === 0L))
        .count() == 0)

      // replay: file the batch, re-check — byte-identical verdicts
      IngestGate.appendDelta(spark, "ig", deltaDocs, deltaVecs, buckets = 4)
      val replay = IngestGate.checkDelta(spark, dir, "ig",
        deltaDocs, deltaVecs)
      assert(replay.orderBy("doc_id").collect().toSeq ==
        verdicts.orderBy("doc_id").collect().toSeq, "replay drifted")
    } finally dropAll("ig")
  }

  test("two-micro-batch streamed ingest: emitted verdicts reconverge") {
    dropAll("igs")
    corpusBuild("igs")
    try {
      val oneShot = IngestGate.checkDelta(spark, dir, "igs",
        deltaDocs, deltaVecs).orderBy("doc_id").collect().toSeq
      val rows = deltaDocs
        .join(deltaVecs.select(col("vec_id").as("doc_id"), col("embedding")),
          Seq("doc_id"), "left")
        .as[(Long, String, String, Option[Array[Float]])]
        .collect().sortBy(_._1)
      val (b1, b2) = rows.splitAt(rows.length / 2)
      val mem = MemoryStream[(Long, String, String, Option[Array[Float]])]
      val emitted = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Seq[org.apache.spark.sql.Row])]
      val q = IngestGate.ingestStream(spark, dir, "igs",
        mem.toDF().toDF("doc_id", "source", "text", "embedding"),
        buckets = 4) { (batchVerdicts, batchId) =>
        emitted += ((batchId, batchVerdicts.orderBy("doc_id").collect().toSeq))
      }
      try {
        mem.addData(b1.toSeq); q.processAllAvailable()
        mem.addData(b2.toSeq); q.processAllAvailable()
      } finally q.stop()
      assert(emitted.map(_._2.size).sum == rows.length)
      // after both batches are filed, a full replay check returns the
      // one-shot verdicts exactly (check-first semantics mean a batch-1
      // doc whose first dup partner arrived in batch 2 was emitted as
      // keep at batch 1 — the pair itself was still emitted in batch
      // 2's check; the INDEX state converges to the one-shot world)
      val converged = IngestGate.checkDelta(spark, dir, "igs",
        deltaDocs, deltaVecs).orderBy("doc_id").collect().toSeq
      assert(converged == oneShot, "streamed ingest state diverged")
    } finally dropAll("igs")
  }

  test("planted shift raises the staleness alert through the gate's stream") {
    // the AnnStalenessSpec shift fixture, driven through the COMPOSITE
    // ingest path: a delta of vectors collapsed around one direction
    // the corpus barely occupies must raise the when-to-retrain signal
    // from inside ingestStream itself — the gate appends to the ANN
    // index every batch, so it must also hear when that index's frozen
    // geometry has rotted (previously only maintainStream did).
    val rnd = new scala.util.Random(41)
    def noise(): Array[Float] = Array.fill(64)(rnd.nextFloat() * 2f - 1f)
    val spike = Array.tabulate(64)(i => if (i < 4) 8f else 0.05f)
    def textOf(id: Long): String =
      s"gate staleness fixture document $id with filler tokens " +
        s"alpha$id beta${id * 31} gamma${id * 67} delta epsilon zeta eta"
    val corpus = (200L until 1000L).map(id =>
      (id, s"src${id % 3}", textOf(id), noise()))
    val delta = (0L until 200L).map { id =>
      val n = noise()
      (id, "d", textOf(id), spike.zip(n).map { case (s, x) => s + 0.1f * x })
    }
    val d = tmpDir("graft-gate-stale")
    writeFixture(d, "documents",
      (corpus ++ delta).map { case (i, s, t, _) => (i, s, t) }
        .toDF("doc_id", "source", "text"))
    writeFixture(d, "embeddings",
      (corpus ++ delta).map { case (i, _, _, e) => (i, "l", e) }
        .toDF("vec_id", "label", "embedding"))
    dropAll("igm")
    IngestGate.build(spark, d.toString, "igm", buckets = 4,
      whereDocs = col("doc_id") >= 200L, whereVecs = col("vec_id") >= 200L)
    try {
      val monitor = new graft.streaming.AnnStalenessMonitor()
      val rows = delta.map { case (i, s, t, e) => (i, s, t, Option(e)) }
      val (b1, b2) = rows.splitAt(rows.length / 2)
      val mem = MemoryStream[(Long, String, String, Option[Array[Float]])]
      val q = IngestGate.ingestStream(spark, d.toString, "igm",
        mem.toDF().toDF("doc_id", "source", "text", "embedding"),
        buckets = 4, monitor = Some(monitor)) { (_, _) => () }
      try {
        mem.addData(b1); q.processAllAvailable()
        mem.addData(b2); q.processAllAvailable()
      } finally q.stop()
      assert(monitor.firing,
        s"planted shift did not raise through the gate: " +
          monitor.transitions.toString)
    } finally dropAll("igm")
  }
}
