package graft.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table loaders + cross-engine determinism helpers.
  *
  * Every query in [[graft.SparkEntry]] is hash-compared against DuckDB
  * running the same ANSI SQL over the same parquet files, so numeric and
  * temporal outputs must be *bitwise* reproducible across engines:
  *
  *  - SUM over doubles is order-dependent (parallel partial aggregation);
  *    we sum exact decimals and cast the final value to double.
  *  - Timestamps are emitted as epoch microseconds (BIGINT) to sidestep
  *    parquet isAdjustedToUTC / naive-timestamp mismatches between
  *    engines.
  *  - Ratios are computed double/double AFTER the exact aggregation.
  */
object Tables {

  /** All driver-generated tables (TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts arrives in one of two physical layouts depending on the
    // generator build: TIMESTAMP(NANOS) (pandas/arrow default — Spark's
    // parquet converter rejects it, so read the raw int64 nanos and
    // rebuild at micro precision, which is also what DuckDB keeps), or
    // a plain micro-precision timestamp (decodes as TIMESTAMP_NTZ and
    // is normalized by the fold below). Detect from the decoded type.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    val withTs =
      if (name == "events" && raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    // Millis-precision columns arrive as TIMESTAMP_NTZ; normalize to
    // TimestampType (session TZ is UTC, so wall clock == instant).
    withTs.schema.fields.foldLeft(withTs) { (df, f) =>
      if (f.dataType == TimestampNTZType)
        df.withColumn(f.name, col(f.name).cast(TimestampType))
      else df
    }
  }

  /** Register every table as a temp view so `spark.sql` mirrors the
    * DuckDB oracle text as closely as possible. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  // ---- determinism helpers -------------------------------------------

  /** Exact decimal type wide enough for any sf<=1 sum of 2-dp inputs. */
  val Money: DecimalType = DecimalType(28, 6)

  /** Order-independent sum of a double column: exact decimal internally,
    * double on the way out. DuckDB twin: CAST(SUM(CAST(x AS
    * DECIMAL(28,6))) AS DOUBLE). */
  def dsum(c: Column): Column = sum(c.cast(Money)).cast(DoubleType)

  /** Conditional decimal-exact sum. DuckDB twin: SUM(CASE WHEN p THEN
    * CAST(x AS DECIMAL(28,6)) END) :: DOUBLE */
  def dsumIf(p: Column, c: Column): Column =
    sum(when(p, c.cast(Money))).cast(DoubleType)

  /** Count rows matching a predicate; BIGINT both engines.
    * DuckDB twin: COUNT(*) FILTER (WHERE p) — but COALESCE'd to match
    * Spark's count(when(p,1)) which never returns null. */
  def countIf(p: Column): Column = count(when(p, lit(1)))

  /** Timestamp -> epoch microseconds (BIGINT). DuckDB twin: epoch_us(ts). */
  def epochUs(c: Column): Column = unix_micros(c)

  /** Guarded ratio a/b with b=0 -> NULL, evaluated in double. */
  def ratio(a: Column, b: Column): Column =
    a.cast(DoubleType) / nullif(b.cast(DoubleType), lit(0.0))

  /** Eagerly materialize a SMALL result frame, then release the cached
    * intermediates that fed it. A query that persists a corpus-grain
    * intermediate for multi-consumer reuse must not leave that cache
    * entry alive for the rest of the session (a 160-query Verify run
    * would accumulate blocks until LRU eviction); but it also cannot
    * unpersist before the lazy result is consumed. localCheckpoint
    * (eager) pins the finished rows at the RDD layer — outside the
    * cacheManager, reclaimed by the ContextCleaner once the returned
    * frame is garbage-collected — after which the intermediates are
    * safe to drop immediately. Only for audit/top-k/scalar-grain
    * results; corpus-sized outputs should stream to their sink instead. */
  def released(result: DataFrame, cached: org.apache.spark.sql.Dataset[_]*): DataFrame = {
    // stash the pre-checkpoint execution: the checkpoint materializes
    // exactly this physical plan, but the returned frame's own plan is
    // truncated to an RDD scan — PlanSpec pins read the stash so the
    // scale-shape guards keep seeing the plan that actually ran
    lastReleasedPlan = Some(result.queryExecution)
    val out = result.localCheckpoint(eager = true)
    cached.foreach(_.unpersist(blocking = false))
    out
  }

  /** The [[QueryExecution]] of the most recent [[released]] result —
    * set at query-construction time, consumed by plan-shape tests.
    * Nested released calls overwrite inner with outer (construction
    * order), which is the plan a caller would want pinned. */
  @volatile var lastReleasedPlan: Option[org.apache.spark.sql.execution.QueryExecution] = None
}
