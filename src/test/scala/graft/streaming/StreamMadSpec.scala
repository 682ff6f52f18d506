package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** madAuditHourly: the stream maintains the hourly sink, the audit
  * reads it with the oracle-checked MAD math — a planted payment
  * spike must be the only flagged hour. */
class StreamMadSpec extends SparkSpec {

  private def payment(time: String, cust: String, session: Int,
      amount: Double): String =
    s"""{"event_type": "bill_payment", "event_time": "$time", "payload": {"customer_id": "$cust", "session_id": $session, "channel": "web_portal", "payment_amount": $amount}}"""

  test("a payment spike in the streamed sink is flagged by the MAD audit") {
    val in = tmpDir("graft-smad-in")
    val ckpt = tmpDir("graft-smad-ckpt")
    val out = tmpDir("graft-smad-out")

    // 10 quiet hours of ~100 total payments, one 10x spike at hour 17
    val lines = (8 until 18).flatMap { h =>
      val amounts =
        if (h == 17) Seq(500.0, 500.0)
        else Seq(50.0, 50.0 + h % 3)
      amounts.zipWithIndex.map { case (a, i) =>
        payment(f"2025-06-05T$h%02d:1$i:00Z", s"CUST$h$i", h * 10 + i, a)
      }
    }
    Files.write(in.resolve("events.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val q = EventsPipeline.start(spark, in.toString, ckpt.toString,
      out.toString, Trigger.AvailableNow())
    q.awaitTermination()

    val audit = EventsPipeline.madAuditHourly(spark, out.toString).collect()
    assert(audit.length == 10)
    val flagged = audit.filter(_.getLong(5) == 1L)
      .map(r => new java.sql.Timestamp(r.getLong(0) / 1000L).toString).toSeq
    assert(flagged == Seq("2025-06-05 17:00:00.0"), s"flagged $flagged")
    // quiet hours score low under the robust baseline
    val quietScores = audit.filter(_.getLong(5) == 0L)
      .filter(!_.isNullAt(4)).map(_.getDouble(4))
    assert(quietScores.forall(_ <= 3.0))
  }
}
