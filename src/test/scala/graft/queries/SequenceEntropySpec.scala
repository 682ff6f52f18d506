package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** ev_sequence_entropy: a deterministic cycle is fully predictable;
  * the memoryless testdata shows no gain. */
class SequenceEntropySpec extends SparkSpec {
  import spark.implicits._

  test("a deterministic event cycle has zero conditional entropy") {
    val d = tmpDir("graft-seqent")
    val cycle = Seq("view", "click", "purchase")
    val rows = for (u <- 1L to 10L; i <- 0 until 12) yield {
      ((u * 100 + i), Timestamp.valueOf(f"2024-03-04 10:${i}%02d:00"),
        u, cycle(i % 3), 1.0, """{"k":1}""")
    }
    writeFixture(d, "events",
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r = EventsQueries.sequenceEntropy(spark, d.toString).collect().head
    assert(math.abs(r.getDouble(2)) < 1e-9,
      s"cycle not fully predictable: H_cond ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-9)
    // marginal over transition FROM-counts: the 12-event cycle yields
    // per-user from-counts (4,4,3), so p = (4/11, 4/11, 3/11)
    val expected = -Seq(4.0 / 11, 4.0 / 11, 3.0 / 11)
      .map(p => p * math.log(p)).sum
    assert(math.abs(r.getDouble(1) - expected) < 1e-6)
  }

  test("memoryless testdata: H_cond <= H_marg ~ ln(5), tiny gain") {
    val r = EventsQueries
      .sequenceEntropy(spark, "/root/testdata/sf0.001").collect().head
    assert(r.getDouble(1) <= math.log(5.0) + 1e-9)
    assert(r.getDouble(1) > 0.9 * math.log(5.0))
    assert(r.getDouble(2) <= r.getDouble(1))
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 0.05,
      s"unexpected sequence structure: gain ${r.getDouble(3)}")
  }
}
