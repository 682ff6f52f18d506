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
  * (Spark's AQE skew-join handles sort-merge skew automatically at
  * runtime; explicit salting remains the tool for skewed AGGREGATIONS
  * feeding a join, for deterministic layout, and for engines/paths AQE
  * does not cover. Both paths coexist here.)
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
