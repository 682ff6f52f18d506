package graft.sources

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The sweep-vs-deferred-drop race ([[GenerationPointer.sweepStale]]'s
  * `keepGenerations` guard): a deployment that published with
  * `dropSuperseded = false` PRECISELY to protect an in-flight query
  * over generation N−1 must not lose that protection the moment the
  * next build starts — the build-start sweep keeps N−1 alive, only the
  * explicit `keepGenerations = 0` post-latency sweep reclaims it. Also
  * pins the retained-bytes bound (N−2 is swept by the next build) and
  * the legacy logical-name leak heal (a first generational build over
  * a pre-pointer deployment crashed between publish and the legacy
  * drop no longer leaks those tables forever). */
class GenerationSweepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private case class Boom(at: String) extends RuntimeException(at)

  test("build-start sweep keeps generation N-1 alive under deferred drop; keepGenerations=0 reclaims; N-2 is bounded away") {
    dropPrefix("gsw")
    try {
      TextIndexLayout.build(spark, dir, "gsw", buckets = 4,
        where = col("doc_id") < 200L, dropSuperseded = false)
      val gen1 = TextIndexLayout.livePrefix(spark, "gsw")

      // a long-running reader resolved gen1 BEFORE the rebuild
      val inFlight = spark.table(s"${gen1}_postings")

      // second build: its build-start sweep must NOT drop gen1 (the
      // r15/r16 race: the unguarded sweep recreated exactly the drop
      // the deferred-drop flag exists to avoid)
      TextIndexLayout.build(spark, dir, "gsw", buckets = 4,
        where = col("doc_id") < 400L, dropSuperseded = false)
      val gen2 = TextIndexLayout.livePrefix(spark, "gsw")
      assert(gen2 != gen1)
      assert(spark.catalog.tableExists(s"${gen1}_postings"))
      // the in-flight plan still completes against gen1
      assert(inFlight.count() > 0L)

      // third build: at ITS build-start sweep gen1 is still live−1
      // (the publish that makes it live−2 happens later in the same
      // build), so gen1 survives build 3 — the retained set is at most
      // {live, live−1, live−2} between builds…
      TextIndexLayout.build(spark, dir, "gsw", buckets = 4,
        dropSuperseded = false)
      val gen3 = TextIndexLayout.livePrefix(spark, "gsw")
      assert(gen3 != gen2)
      assert(spark.catalog.tableExists(s"${gen1}_postings"))

      // …and build 4's start sweep (live = gen3, guard keeps gen2)
      // reclaims gen1: the bound is real, not monotone growth
      TextIndexLayout.build(spark, dir, "gsw", buckets = 4,
        dropSuperseded = false)
      val gen4 = TextIndexLayout.livePrefix(spark, "gsw")
      assert(!spark.catalog.tableExists(s"${gen1}_postings"))
      assert(spark.catalog.tableExists(s"${gen2}_postings"))

      // the explicit post-latency sweep reclaims every superseded
      // generation; the live one keeps serving
      val served = TextIndexLayout.query(spark, dir, "gsw").collect().toSeq
      TextIndexLayout.sweepStaleGenerations(spark, "gsw",
        keepGenerations = 0)
      assert(!spark.catalog.tableExists(s"${gen2}_postings"))
      assert(!spark.catalog.tableExists(s"${gen3}_postings"))
      assert(spark.catalog.tableExists(s"${gen4}_postings"))
      assert(TextIndexLayout.query(spark, dir, "gsw")
        .collect().toSeq == served)
    } finally dropPrefix("gsw")
  }

  test("ann: same guard through the shared machinery") {
    dropPrefix("gswa")
    try {
      AnnIndexLayout.build(spark, dir, "gswa", buckets = 4,
        where = col("vec_id") < 600L, dropSuperseded = false)
      val gen1 = AnnIndexLayout.livePrefix(spark, "gswa")
      AnnIndexLayout.build(spark, dir, "gswa", buckets = 4,
        where = col("vec_id") < 900L, dropSuperseded = false)
      assert(AnnIndexLayout.livePrefix(spark, "gswa") != gen1)
      assert(spark.catalog.tableExists(s"${gen1}_cells"))
      AnnIndexLayout.sweepStaleGenerations(spark, "gswa",
        keepGenerations = 0)
      assert(!spark.catalog.tableExists(s"${gen1}_cells"))
    } finally dropPrefix("gswa")
  }

  test("legacy logical-name tables no longer leak when the first generational build crashes after publish") {
    dropPrefix("gswl")
    try {
      // fabricate a PRE-POINTER deployment: index tables at the
      // logical names, no `_livegen` view
      TextIndexLayout.build(spark, dir, "gswl_seed", buckets = 4,
        where = col("doc_id") < 200L)
      val seed = TextIndexLayout.livePrefix(spark, "gswl_seed")
      Seq("vocab", "stats", "postings").foreach(t =>
        spark.table(s"${seed}_$t").write.mode("overwrite")
          .format("parquet").saveAsTable(s"gswl_$t"))
      assert(!spark.catalog.tableExists(
        GenerationPointer.view("gswl")))

      // first generational build over it, killed between the pointer
      // flip and the superseded/legacy drop
      val thrown = intercept[Boom] {
        TextIndexLayout.buildImpl(spark, dir, "gswl", 4,
          col("doc_id") >= 0L, dropSuperseded = true,
          step => if (step == "after-publish") throw Boom(step))
      }
      assert(thrown.at == "after-publish")
      // the leak window: pointer live, legacy tables still present
      assert(spark.catalog.tableExists(s"gswl_postings"))

      // the NEXT default build heals it (the drop is unconditional,
      // not cur.isEmpty-gated)
      TextIndexLayout.build(spark, dir, "gswl", buckets = 4)
      assert(!spark.catalog.tableExists(s"gswl_postings"))
      assert(!spark.catalog.tableExists(s"gswl_vocab"))
      assert(TextIndexLayout.query(spark, dir, "gswl")
        .collect().nonEmpty)
    } finally { dropPrefix("gswl"); dropPrefix("gswl_seed") }
  }
}
