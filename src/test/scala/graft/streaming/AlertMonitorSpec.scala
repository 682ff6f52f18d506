package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reference's HighEventFailureRate alert
  * (monitoring/prometheus/alerts.yml:5-12): >5 failures/min sustained
  * for 1 minute raises, recovery clears. Rule logic is driven through
  * crafted timelines; the listener extraction path is exercised
  * against a real observed streaming query. */
class AlertMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val minute = 60000L

  test("stays silent at a failure rate below the threshold") {
    val m = new AlertMonitor(failuresPerMinute = 5.0)
    // 3 failures/min for five minutes: one failure every 20s
    for (t <- 0L to (5 * minute) by 20000L) {
      m.record(t, 1)
      assert(!m.firing, s"fired at t=$t")
    }
    assert(m.transitions.isEmpty)
    assert(m.totalInvalid == 16)
  }

  test("fires only after the burst sustains for a minute, then clears") {
    val m = new AlertMonitor(failuresPerMinute = 5.0)
    // 2 failures per 10s sample: the 1-min rate crosses 5/min at
    // t=20s (samples 0+10+20 = 6 in window); the `for 1m` sustain
    // means the alert may raise no earlier than t=80s
    var t = 0L
    while (t < 80000L) {
      m.record(t, 2)
      assert(!m.firing, s"fired before sustain at t=$t")
      t += 10000L
    }
    m.record(t, 2) // t = 80s: breach (since 20s) has sustained a minute
    assert(m.firing)
    // burst stops; the window drains below threshold -> alert clears
    while (t <= 4 * minute) { t += 10000L; m.record(t, 0) }
    assert(!m.firing)
    assert(m.transitions.map(_.firing) == Seq(true, false))
    assert(m.transitions.head.ratePerMin > 5.0)
  }

  test("a spike that leaves the window before the sustain elapses never raises") {
    val m = new AlertMonitor(failuresPerMinute = 5.0)
    // one 15-failure sample at t=0: rate 15/min immediately, but the
    // spike falls out of the 60s window exactly as the sustain would
    // complete — Prometheus `for` semantics say no alert
    var t = 0L
    m.record(t, 15)
    while (t < 3 * minute) {
      assert(!m.firing, s"fired at t=$t")
      t += 10000L
      m.record(t, 0)
    }
    assert(!m.firing)
    assert(m.transitions.isEmpty)
  }

  test("idle events keep evaluating: silence clears a firing alert") {
    val m = new AlertMonitor(failuresPerMinute = 5.0)
    // drive to firing exactly as the sustain test does
    var t = 0L
    while (t <= 80000L) { m.record(t, 2); t += 10000L }
    assert(m.firing)
    // the source goes quiet: no progress events, only idle ticks.
    // Without clock advancement the alert would stay raised forever;
    // the drained window must clear it, as Prometheus's timer
    // evaluation would. (Idle timestamps continue the same epoch-ms
    // timeline record() was driven on.)
    val ctor = classOf[org.apache.spark.sql.streaming.StreamingQueryListener.QueryIdleEvent]
      .getConstructor(classOf[java.util.UUID], classOf[java.util.UUID], classOf[String])
    for (dt <- 10000L to (3 * minute) by 10000L) {
      val ev = ctor.newInstance(java.util.UUID.randomUUID(),
        java.util.UUID.randomUUID(),
        java.time.Instant.ofEpochMilli(t + dt).toString)
      m.onQueryIdle(ev)
    }
    assert(!m.firing)
    assert(m.transitions.map(_.firing) == Seq(true, false))
    assert(m.totalInvalid == 18) // ticks add no failures
  }

  test("idle events respect onlyQuery: a foreign query's idle tick is ignored") {
    val m = new AlertMonitor(failuresPerMinute = 5.0, onlyQuery = Some("mine"))
    var t = 0L
    while (t <= 80000L) { m.record(t, 2); t += 10000L }
    assert(m.firing)
    val ctor = classOf[org.apache.spark.sql.streaming.StreamingQueryListener.QueryIdleEvent]
      .getConstructor(classOf[java.util.UUID], classOf[java.util.UUID], classOf[String])
    val ev = ctor.newInstance(java.util.UUID.randomUUID(),
      java.util.UUID.randomUUID(),
      java.time.Instant.ofEpochMilli(10 * minute).toString)
    m.onQueryIdle(ev) // unmatched id: must not advance this monitor's clock
    assert(m.firing)
  }

  test("a name-addressed monitor ticks on idle from startup, before any progress") {
    import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryStartedEvent}
    val m = new AlertMonitor(failuresPerMinute = 5.0, onlyQuery = Some("mine"))
    // seed a firing state through the rule core, then verify the
    // LISTENER path alone can clear it: the started event (which DOES
    // carry the name) binds the id, so idle ticks — which carry only
    // ids — match even though no progress event ever arrived
    var t = 0L
    while (t <= 80000L) { m.record(t, 2); t += 10000L }
    assert(m.firing)
    val id = java.util.UUID.randomUUID()
    m.onQueryStarted(new QueryStartedEvent(id, java.util.UUID.randomUUID(),
      "mine", java.time.Instant.ofEpochMilli(t).toString))
    val idleCtor = classOf[QueryIdleEvent]
      .getConstructor(classOf[java.util.UUID], classOf[java.util.UUID], classOf[String])
    for (dt <- 10000L to (3 * minute) by 10000L)
      m.onQueryIdle(idleCtor.newInstance(id, java.util.UUID.randomUUID(),
        java.time.Instant.ofEpochMilli(t + dt).toString))
    assert(!m.firing, "idle ticks from a started-but-never-progressed query must clear")
    assert(m.transitions.map(_.firing) == Seq(true, false))
  }

  test("restart under the same name re-binds: the old run's idle ticks are ignored") {
    import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryStartedEvent}
    val m = new AlertMonitor(failuresPerMinute = 5.0, onlyQuery = Some("mine"))
    var t = 0L
    while (t <= 80000L) { m.record(t, 2); t += 10000L }
    assert(m.firing)
    val oldId = java.util.UUID.randomUUID()
    val newId = java.util.UUID.randomUUID()
    m.onQueryStarted(new QueryStartedEvent(oldId, java.util.UUID.randomUUID(),
      "mine", java.time.Instant.ofEpochMilli(t).toString))
    // overlapping restart: a NEW query takes the name while the old one
    // is still winding down — the monitor must follow the latest start
    m.onQueryStarted(new QueryStartedEvent(newId, java.util.UUID.randomUUID(),
      "mine", java.time.Instant.ofEpochMilli(t).toString))
    val idleCtor = classOf[QueryIdleEvent]
      .getConstructor(classOf[java.util.UUID], classOf[java.util.UUID], classOf[String])
    // the stopping query's idle events (old id) must NOT advance the
    // clock: only the new incarnation's silence counts
    m.onQueryIdle(idleCtor.newInstance(oldId, java.util.UUID.randomUUID(),
      java.time.Instant.ofEpochMilli(10 * minute).toString))
    assert(m.firing, "a foreign (superseded) run id advanced the clock")
    m.onQueryIdle(idleCtor.newInstance(newId, java.util.UUID.randomUUID(),
      java.time.Instant.ofEpochMilli(10 * minute).toString))
    assert(!m.firing)
  }

  test("overlapping restart: the old run's late progress cannot steal the id binding") {
    import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent}
    import org.apache.spark.sql.streaming.StreamingQueryProgress
    val m = new AlertMonitor(failuresPerMinute = 5.0, onlyQuery = Some("mine"))
    var t = 0L
    while (t <= 80000L) { m.record(t, 2); t += 10000L }
    assert(m.firing)
    val oldId = java.util.UUID.randomUUID()
    val newId = java.util.UUID.randomUUID()
    def progressEvent(id: java.util.UUID, atMs: Long, invalid: Long): QueryProgressEvent = {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("invalid_events",
          org.apache.spark.sql.types.LongType)))
      val row = new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](invalid), schema)
      val om = new java.util.HashMap[String, org.apache.spark.sql.Row]()
      om.put("graft_ingest", row)
      val pc = classOf[StreamingQueryProgress].getDeclaredConstructors.head
      pc.setAccessible(true)
      val p = pc.newInstance(id, java.util.UUID.randomUUID(), "mine",
        java.time.Instant.ofEpochMilli(atMs).toString,
        java.lang.Long.valueOf(0L), java.lang.Long.valueOf(0L),
        new java.util.HashMap[String, java.lang.Long](),
        new java.util.HashMap[String, String](),
        Array.empty[org.apache.spark.sql.streaming.StateOperatorProgress],
        Array.empty[org.apache.spark.sql.streaming.SourceProgress],
        null, om).asInstanceOf[StreamingQueryProgress]
      val ec = classOf[QueryProgressEvent]
        .getDeclaredConstructor(classOf[StreamingQueryProgress])
      ec.setAccessible(true)
      ec.newInstance(p)
    }
    m.onQueryStarted(new QueryStartedEvent(oldId, java.util.UUID.randomUUID(),
      "mine", java.time.Instant.ofEpochMilli(t).toString))
    m.onQueryProgress(progressEvent(oldId, t, 2L))
    // restart: the new incarnation takes the name and the binding
    m.onQueryStarted(new QueryStartedEvent(newId, java.util.UUID.randomUUID(),
      "mine", java.time.Instant.ofEpochMilli(t).toString))
    // the stopping run's LAST progress arrives after the new start —
    // it still counts toward the window (same name) but must not
    // re-bind the idle matching to the superseded id
    m.onQueryProgress(progressEvent(oldId, t, 2L))
    val idleCtor = classOf[QueryIdleEvent]
      .getConstructor(classOf[java.util.UUID], classOf[java.util.UUID], classOf[String])
    m.onQueryIdle(idleCtor.newInstance(newId, java.util.UUID.randomUUID(),
      java.time.Instant.ofEpochMilli(10 * minute).toString))
    assert(!m.firing,
      "the new run's idle tick was ignored: a late old-run progress stole the binding")
  }

  test("listener path: invalid counts flow from a live observed query") {
    implicit val sqlCtx = spark.sqlContext
    // sustain=0 so one bad micro-batch raises immediately
    val m = new AlertMonitor(failuresPerMinute = 0.5, sustainMs = 0L)
    spark.streams.addListener(m)
    val mem = MemoryStream[String]
    val q = EventsPipeline.parseAndValidate(mem.toDF())
      .observe("graft_ingest",
        count(when(col("reason") === "valid", 1)).as("valid_events"),
        count(when(col("reason") =!= "valid", 1)).as("invalid_events"))
      .writeStream.format("noop").outputMode("append").start()
    try {
      mem.addData(
        """{"event_type": "user_login", "event_time": "2025-06-04T12:01:00Z", "payload": {"customer_id": "CUST01", "session_id": 1, "channel": "web_portal"}}""",
        "not json at all",
        """{"event_type": "tariff_switch", "event_time": "2025-06-04T12:00:00Z", "payload": {"customer_id": "x"}}""")
      q.processAllAvailable()
      // listener bus delivery is async relative to processAllAvailable
      val deadline = System.currentTimeMillis() + 30000L
      while (m.totalInvalid < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(50L)
      assert(m.totalInvalid == 2)
      assert(m.firing)
    } finally {
      q.stop()
      spark.streams.removeListener(m)
    }
  }
}
