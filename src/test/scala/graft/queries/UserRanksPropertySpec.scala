package graft.queries


import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.SparkSpec
import graft.util.Tables

/** The r7 ev_user_ranks rework replaces ntile/rank/dense_rank windows
  * with range-bucketed positions and domain joins. The oracle pins two
  * data points (150 and 1500 users); this spec pins the general
  * equivalence: on arbitrary crafted corpora — tiny n (every n % 4
  * residue), heavy spend ties straddling bucket boundaries, single
  * user — the scale-shaped plan must be byte-identical to the plain
  * window formulation it replaced. */
class UserRanksPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Write a synthetic events table in the driver's parquet layout
    * (ts = int64 nanos) and return the dir. */
  private def writeEvents(
      rows: Seq[(Long, Long, Long, String, Double, String)]): String = {
    val dir = tmpDir("graft-ur").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** The pre-rework formulation: global windows over the per-user
    * aggregate. Correct at any n, unscalable — the test oracle. */
  private def windowed(dir: String) = {
    val ev = Tables.load(spark, dir, "events")
    val firsts = ev
      .withColumn("rn", row_number().over(Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("first_event_type"))
    val isPurchase = col("event_type") === "purchase"
    val agg = ev.groupBy(col("user_id")).agg(
      count(lit(1)).as("n_events"),
      Tables.countIf(isPurchase).as("n_purchases"),
      coalesce(sum(when(isPurchase, col("value").cast(Tables.Money))),
        lit(0).cast(Tables.Money)).cast(DoubleType).as("spend"))
    agg.join(firsts, "user_id")
      .withColumn("spend_quartile",
        ntile(4).over(Window.orderBy(col("spend"), col("user_id"))).cast(LongType))
      .withColumn("events_rank",
        rank().over(Window.orderBy(col("n_events").desc)).cast(LongType))
      .withColumn("events_dense_rank",
        dense_rank().over(Window.orderBy(col("n_events").desc)).cast(LongType))
      .orderBy(col("user_id"))
      .select("user_id", "n_events", "n_purchases", "spend",
        "first_event_type", "spend_quartile", "events_rank", "events_dense_rank")
  }

  private def check(dir: String, label: String): Unit = {
    val got = EventsQueries.userRanks(spark, dir)
      .select("user_id", "n_events", "n_purchases", "spend",
        "first_event_type", "spend_quartile", "events_rank", "events_dense_rank")
      .collect().map(_.toString).toSeq
    val want = windowed(dir).collect().map(_.toString).toSeq
    assert(got == want, s"case $label:\n got=${got.take(8)}\nwant=${want.take(8)}")
  }

  test("scale-shaped ranks == window ranks on crafted corpora") {
    val types = Seq("click", "error", "purchase", "signup", "view")
    // every n % 4 residue incl. n < 4, plus a larger corpus
    for (nUsers <- Seq(1, 2, 3, 4, 5, 6, 7, 101)) {
      val rnd = new scala.util.Random(1234 + nUsers)
      val rows = for {
        u <- 0L until nUsers.toLong
        i <- 0 until (1 + rnd.nextInt(5))
      } yield {
        val t = types(rnd.nextInt(types.size))
        // coarse values force heavy spend ties (incl. the 0-purchase
        // spend=0.0 tie class) straddling quartile boundaries
        val v = (rnd.nextInt(3) * 50).toDouble
        val ts = 1704067200000000000L + (rnd.nextInt(86400).toLong * 1000000000L)
        (u * 1000 + i, ts, u, t, v, s"""{"k": ${rnd.nextInt(100)}}""")
      }
      check(writeEvents(rows), s"n=$nUsers")
    }
  }
}
