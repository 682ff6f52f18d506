package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** util_table_checksums: mutation sensitivity and the XOR-additivity
  * that makes the manifest incrementally maintainable. */
class TableChecksumsSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDir(rows: Seq[(Long, Double)]): java.nio.file.Path = {
    val d = tmpDir("graft-cksum")
    writeFixture(d, "events", rows.map { case (id, v) =>
      (id, Timestamp.valueOf("2024-03-04 10:00:00"), 1L, "view", v,
        """{"k":1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    // the manifest also reads documents/orders; give it tiny ones
    writeFixture(d, "documents",
      Seq((1L, "t", "en", "s", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    writeFixture(d, "orders",
      Seq((1L, 1L, "O", Timestamp.valueOf("2024-03-04 00:00:00"),
        "1-URGENT", 10.0))
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
          "o_orderpriority", "o_totalprice"))
    d
  }

  private def eventsChecksum(d: java.nio.file.Path): (Long, Long) = {
    val r = ProfileQueries.tableChecksums(spark, d.toString).collect()
      .find(_.getString(0) == "events").get
    (r.getLong(1), r.getLong(2))
  }

  test("a one-cent mutation in one row flips the checksum, not the count") {
    val base = (1L to 100L).map(i => (i, i * 1.5))
    val (n1, c1) = eventsChecksum(eventsDir(base))
    val (n2, c2) = eventsChecksum(eventsDir(
      base.updated(41, (42L, 42 * 1.5 + 0.01))))
    assert(n1 == 100L && n2 == 100L)
    assert(c1 != c2, "checksum blind to a value mutation")
  }

  test("XOR additivity: whole == part1 xor part2") {
    val rows = (1L to 100L).map(i => (i, i * 2.0))
    val (_, whole) = eventsChecksum(eventsDir(rows))
    val (_, p1) = eventsChecksum(eventsDir(rows.take(60)))
    val (_, p2) = eventsChecksum(eventsDir(rows.drop(60)))
    assert(whole == (p1 ^ p2),
      "manifest not incrementally maintainable by partition XOR")
  }
}
