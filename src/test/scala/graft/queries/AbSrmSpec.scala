package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** ev_ab_srm: a balanced assignment passes, a broken one flags. */
class AbSrmSpec extends SparkSpec {
  import spark.implicits._

  private def eventsOf(userIds: Seq[Long]): java.nio.file.Path = {
    val d = tmpDir("graft-srm")
    val rows = userIds.zipWithIndex.map { case (u, i) =>
      (i.toLong, Timestamp.valueOf("2024-03-04 10:00:00"), u, "view",
        1.0, """{"k":1}""")
    }
    writeFixture(d, "events",
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    d
  }

  test("a perfectly balanced assignment does not flag") {
    // users 0..299: exactly 100 per arm
    val d = eventsOf(0L until 300L)
    val rows = EventsQueries.abSrm(spark, d.toString).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(1) == 100L)
      assert(r.getLong(4) == 0L) // chi2 total micro
      assert(r.getLong(5) == 0L)
    }
  }

  test("a completely dead arm still contributes its chi-square term") {
    // regression: variant_b gets ZERO users (users 0..11 cover only
    // residues 0 and 1 when filtered) — the dead arm must appear with
    // users=0 and its (0-e)^2/e term, the largest in the statistic
    val ids = (0L until 36L).filter(u => u % 3 != 2)
    val d = eventsOf(ids)
    val rows = EventsQueries.abSrm(spark, d.toString).collect()
    assert(rows.length == 3, "dead arm missing from the output")
    val dead = rows.find(_.getString(0) == "variant_b").get
    assert(dead.getLong(1) == 0L)
    // e = 24/3 = 8; chi2 = 2*(12-8)^2/8 + (0-8)^2/8 = 4 + 8 = 12
    assert(rows.head.getLong(4) == 12000000L)
    assert(rows.forall(_.getLong(5) == 1L), "dead-arm SRM not flagged")
  }

  test("an arm losing half its users flags sample-ratio mismatch") {
    // drop every second control user (user_id % 3 == 0): redirect-bug
    // shape; chi2 must blow past 5.991
    val ids = (0L until 300L).filterNot(u => u % 3 == 0 && (u / 3) % 2 == 0)
    val d = eventsOf(ids)
    val rows = EventsQueries.abSrm(spark, d.toString).collect()
    assert(rows.forall(_.getLong(5) == 1L), "SRM not flagged")
    val control = rows.find(_.getString(0) == "control").get
    assert(control.getLong(1) == 50L)
    assert(rows.head.getLong(4) > 5991000L)
  }
}
