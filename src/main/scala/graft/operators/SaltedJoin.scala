package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join — the skew-mitigation pattern for joins whose key
  * distribution has hot keys that would pin a whole shuffle partition
  * to one task.
  *
  * Mechanics: every fact row gets a deterministic salt in [0, S); the
  * (small) build side is replicated S ways with all salts; the join
  * key becomes (key, salt), so a hot key's rows spread across S tasks
  * instead of one. Cost: S-fold replication of the build side —
  * bounded and chosen by the caller; the fact side is never
  * replicated.
  *
  * The salt derives from a hash of the whole fact row, NOT rand():
  * task retries and speculative execution must re-derive identical
  * salts or the join double-counts/drops rows under failure — the
  * classic correctness bug in naive salting at cluster scale.
  *
  * == Division of labor vs AQE skew-join (measured in AqeSkewJoinSpec
  * on the util_skew_profile top-key distribution) ==
  *
  * For a plain shuffled equi-join, prefer AQE: it detects the
  * oversized partition at runtime and splits it (no salting code, no
  * replication factor to tune), and a broadcast join sidesteps skew
  * entirely. This operator remains the ONLY lever in four measured
  * situations:
  *
  *  1. Skewed AGGREGATIONS: a reduce must see every row of its key;
  *     only pre-salting (two-phase aggregate) splits that work.
  *  2. Stream-stream joins: Structured Streaming has no adaptive
  *     re-planning mid-stream.
  *  3. Aggregate-fed joins: AQE's OptimizeSkewedJoin pattern-matches
  *     Sort DIRECTLY over a shuffle stage on both sides — a
  *     distinct/groupBy whose final aggregate sits between the
  *     shuffle and the join silently defeats the rule.
  *  4. Single-mapper hot keys: AQE splits a skewed partition along
  *     MAPPER boundaries, so a hot key emitted by one upstream task
  *     is unsplittable ("number of skewed partitions: 0"); salting
  *     re-keys the rows instead of re-reading map outputs, so it has
  *     no such constraint.
  *
  * And one measurement caveat worth its own line: AQE's skew stats
  * are COMPRESSED map-output bytes — low-entropy hot rows can lz4 far
  * below every threshold and read as "not skewed" while still
  * dominating a task's row count.
  */
object SaltedJoin {

  /** Inner-join `fact` to `dim` on `key`, salted `salts` ways. Output
    * columns: fact's then dim's (minus the duplicate key). */
  def inner(fact: DataFrame, dim: DataFrame, key: String,
            salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val factCols = fact.columns.map(col).toSeq
    val f = fact.withColumn("__salt",
      pmod(xxhash64(factCols: _*), lit(salts.toLong)).cast("int"))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }
}
