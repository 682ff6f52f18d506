package graft.sources

import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** The writer-quiesce contract of [[BucketedTables]]: plain parquet
  * has no commit protocol, so an append landing between a maintenance
  * pass's snapshot read and its directory swap would be silently lost
  * with the replaced directory. The per-table lock makes that race
  * IMPOSSIBLE in one JVM: the append waits out the swap and lands in
  * the compacted directory — absorbed, never lost. */
class QuiesceSpec extends SparkSpec {
  import spark.implicits._

  test("an append racing a compaction waits for the swap and is absorbed") {
    dropPrefix("quiesce")
    val t = "quiesce_race"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    try {
      BucketedTables.writeBucketed(
        (1L to 100L).toDF("id"), t, "id", 4)

      // the compaction thread holds the table lock across a transform
      // that (a) signals it is inside the quiesced window and (b) stays
      // there long enough for the append to arrive mid-pass
      val inWindow = new CountDownLatch(1)
      val compactErr =
        new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val slow: DataFrame => DataFrame = { df =>
        inWindow.countDown()
        Thread.sleep(1500)
        df
      }
      val compactor = new Thread(() =>
        try BucketedTables.compact(spark, t, "id", 4, slow)
        catch { case e: Throwable => compactErr.set(e) })
      compactor.start()
      inWindow.await()

      // WITHOUT the lock this append's files land in the pre-swap
      // directory and vanish with it (the lost-update the old "run
      // with writers stopped" comment warned about); WITH it the call
      // blocks here until the swap completes, then appends to the
      // compacted table
      val t0 = System.nanoTime()
      BucketedTables.appendBucketed((101L to 110L).toDF("id"), t, "id", 4)
      val waitedMs = (System.nanoTime() - t0) / 1e6
      compactor.join()
      assert(compactErr.get() == null, s"compactor threw: ${compactErr.get()}")

      // nothing lost: compacted rows AND the racing append's rows
      val ids = spark.table(t).as[Long].collect().sorted.toSeq
      assert(ids == (1L to 110L), s"rows lost/duplicated: n=${ids.size}")
      // and the append really was quiesced, not lucky ordering
      assert(waitedMs > 200.0, s"append did not wait (waited $waitedMs ms)")
    } finally dropPrefix("quiesce")
  }

  test("compaction under the lock still bounds files per bucket") {
    val t = "quiesce_files"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    try {
      BucketedTables.writeBucketed((1L to 50L).toDF("id"), t, "id", 4)
      BucketedTables.appendBucketed((51L to 100L).toDF("id"), t, "id", 4)
      assert(spark.table(t).inputFiles.length > 4)
      BucketedTables.compact(spark, t, "id", 4)
      assert(spark.table(t).inputFiles.length <= 4)
      assert(spark.table(t).count() == 100L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
