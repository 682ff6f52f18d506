package graft.streaming

import scala.util.Random

import graft.SparkSpec

/** Property tests (SURVEY.md §5.2): aggregate invariants over random
  * event streams — additive metrics merge across arbitrary splits,
  * distinct metrics are subadditive, and input order never matters.
  * Seeded generation (no scalatestplus bridge in the offline cache). */
class MetricsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def genEvent(rnd: Random): String = {
    val types = Seq("user_login", "tariff_switch", "bill_payment",
      "energy_consumed", "incentive_claim", "view_tariffs", "user_logout")
    val tpe = types(rnd.nextInt(types.length))
    val hour = 10 + rnd.nextInt(4)
    val minute = rnd.nextInt(60)
    val cust = 1 + rnd.nextInt(5)
    val session = 100 + rnd.nextInt(11)
    val amounts = Seq("7.5", "20.25", "-3.0", "abc", "100.0")
    val amount = amounts(rnd.nextInt(amounts.length))
    val energies = Seq("1.369", "49.783", "10.0")
    val energy = energies(rnd.nextInt(energies.length))
    val extra = tpe match {
      case "tariff_switch" | "incentive_claim" | "view_tariffs" =>
        s""", "tariff_type": "green", "payment_amount": "$amount""""
      case "bill_payment" => s""", "payment_amount": "$amount""""
      case "energy_consumed" => s""", "energy_consumed": "$energy""""
      case _ => ""
    }
    f"""{"event_type": "$tpe", "event_time": "2025-06-04T$hour%02d:$minute%02d:00Z", "payload": {"customer_id": "CUST$cust", "session_id": $session, "channel": "web"$extra}}"""
  }

  private def agg(lines: Seq[String]) =
    EventsPipeline.hourlyMetrics(EventsPipeline.rawEvents(
      EventsPipeline.parseAndValidate(lines.toDF("value")))).collect()
      .map(r => r.getAs[java.sql.Timestamp]("hour") -> r).toMap

  private val additive = Seq("tariff_switches", "green_tariff_switches",
    "incentive_claims", "total_logins", "payment_events")
  private val decimals = Seq("total_switch_revenue", "total_incentive_payouts",
    "total_payments", "total_energy_consumed")
  private val distincts = Seq("new_sessions", "active_customers")

  test("additive metrics merge across splits; distincts are subadditive; order-invariant") {
    for (iter <- 0 until 5) {
      val rnd = new Random(1000 + iter)
      val events = Seq.fill(40)(genEvent(rnd))
      val cut = rnd.nextInt(events.length + 1)

      val whole = agg(events)
      val left = agg(events.take(cut))
      val right = agg(events.drop(cut))

      def part(m: Map[java.sql.Timestamp, org.apache.spark.sql.Row],
          h: java.sql.Timestamp, f: String): Long =
        m.get(h).map(_.getAs[Long](f)).getOrElse(0L)
      def partDec(m: Map[java.sql.Timestamp, org.apache.spark.sql.Row],
          h: java.sql.Timestamp, f: String): BigDecimal =
        m.get(h).map(r => BigDecimal(r.getAs[java.math.BigDecimal](f)))
          .getOrElse(BigDecimal(0))

      for ((h, w) <- whole) {
        for (f <- additive)
          assert(w.getAs[Long](f) == part(left, h, f) + part(right, h, f),
            s"iter=$iter $f @ $h")
        for (f <- decimals)
          assert(BigDecimal(w.getAs[java.math.BigDecimal](f)) ==
            partDec(left, h, f) + partDec(right, h, f), s"iter=$iter $f @ $h")
        for (f <- distincts) {
          assert(w.getAs[Long](f) <= part(left, h, f) + part(right, h, f),
            s"iter=$iter $f @ $h")
          assert(w.getAs[Long](f) >=
            math.max(part(left, h, f), part(right, h, f)), s"iter=$iter $f @ $h")
        }
      }

      // order invariance (the reference's shuffle-replay flag,
      // producer/producer.py:45-46)
      val shuffled = agg(new Random(iter).shuffle(events))
      assert(shuffled.keySet == whole.keySet, s"iter=$iter")
      for ((h, w) <- whole; f <- additive ++ distincts)
        assert(shuffled(h).getAs[Long](f) == w.getAs[Long](f), s"iter=$iter $f")
    }
  }
}
