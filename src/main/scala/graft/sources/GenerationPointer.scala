package graft.sources

import org.apache.spark.sql.SparkSession

/** ATOMIC multi-table index publication — the `_livegen` pointer
  * machinery [[AnnIndexLayout]] introduced, extracted so every
  * multi-table layout publishes the same way.
  *
  * The problem it closes: a rebuild of an index whose state spans
  * several tables (postings + vocab/stats geometry; cells + codes +
  * codebook) cannot publish by swapping tables one at a time — each
  * per-table swap is atomic, but a reader BETWEEN two swaps resolves a
  * mixed set (new postings scored against old idf geometry: internally
  * consistent nowhere, wrong silently). Instead, every build writes
  * its complete table set under a GENERATION prefix
  * (`<prefix>_g<N>_<table>`) and publishes by flipping the 1-row
  * pointer view `<prefix>_livegen` with one `CREATE OR REPLACE VIEW` —
  * ONE atomic catalog operation for the whole set. Readers resolve the
  * physical prefix through [[livePrefix]] and always see one COMPLETE
  * generation: before the flip the old one, after it the new one,
  * never a mix, never a missing table.
  *
  * Crash algebra: a build crashing before the flip leaves the live
  * generation untouched and serving (the half-built one is swept by
  * the next build's [[sweepStale]]); crashing after the flip but
  * before the superseded drop costs bytes, never correctness (swept
  * likewise). Deployments with long-running concurrent queries defer
  * the superseded drop (`dropSuperseded = false` on the layout's
  * build) and run the sweep after their max query latency, so an
  * in-flight plan over the old generation never races its drop.
  *
  * Tombstones and other LOGICAL state intentionally stay at the
  * logical prefix — they must keep filtering across rebuilds.
  */
private[sources] object GenerationPointer {

  /** The pointer view's name. */
  def view(prefix: String): String = s"${prefix}_livegen"

  /** The published generation number, if any. */
  def liveGen(spark: SparkSession, prefix: String): Option[Long] =
    if (!spark.catalog.tableExists(view(prefix))) None
    else Some(spark.table(view(prefix)).head().getAs[Long]("gen"))

  /** The PHYSICAL prefix of the live generation. Loud when nothing is
    * published: resolving a half-built generation is exactly what the
    * pointer exists to prevent. */
  def livePrefix(spark: SparkSession, prefix: String): String = {
    val g = liveGen(spark, prefix).getOrElse(throw new IllegalStateException(
      s"$prefix: no published index generation (no ${view(prefix)} " +
        "view) — run build first"))
    s"${prefix}_g$g"
  }

  /** The physical prefix the NEXT build writes under, with its
    * generation number. */
  def nextPrefix(spark: SparkSession, prefix: String): (String, Long) = {
    val next = liveGen(spark, prefix).getOrElse(0L) + 1L
    (s"${prefix}_g$next", next)
  }

  /** PUBLISH generation `gen`: one atomic catalog operation. Every
    * reader resolving after this sees the new generation's complete
    * table set; every reader that resolved before it keeps the
    * complete old set. */
  def publish(spark: SparkSession, prefix: String, gen: Long): Unit =
    spark.sql(s"CREATE OR REPLACE VIEW ${view(prefix)} AS " +
      s"SELECT CAST($gen AS BIGINT) AS gen")

  private def genPattern(prefix: String) =
    s"(?i)${java.util.regex.Pattern.quote(prefix)}_g(\\d+)_.*".r

  /** Drop one generation's tables (and any orphaned directories). */
  def dropGeneration(spark: SparkSession, prefix: String, gen: Long,
      tables: Seq[String]): Unit =
    tables.foreach(t =>
      BucketedTables.dropWithOrphanDir(spark, s"${prefix}_g${gen}_$t"))

  /** Sweep every generation EXCEPT the live one: catalog tables first,
    * then warehouse directories no catalog entry owns (a crashed
    * build's half-written generation, or a crashed post-publish drop's
    * leftovers — both from this or a previous session). Pattern-driven,
    * so it needs no per-layout table list. */
  def sweepStale(spark: SparkSession, prefix: String): Unit = {
    val keep = liveGen(spark, prefix)
    val pat = genPattern(prefix)
    spark.catalog.listTables().collect().map(_.name).foreach {
      case n @ pat(g) if !keep.contains(g.toLong) =>
        BucketedTables.dropWithOrphanDir(spark, n)
      case _ => ()
    }
    val wh = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath)
    val fs = wh.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(wh)) fs.listStatus(wh).map(_.getPath.getName).foreach {
      // managed dirs are named after their table; clearOrphanDir no-ops
      // when the catalog owns it (live data) and require-guards the path
      case n @ pat(g) if !keep.contains(g.toLong) =>
        BucketedTables.clearOrphanDir(spark, n)
      case _ => ()
    }
  }
}
