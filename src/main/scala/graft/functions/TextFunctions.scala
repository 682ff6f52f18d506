package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic, cross-engine text/hash primitives.
  *
  * Every helper here has a byte-identical DuckDB SQL twin (the `*Sql`
  * strings) so results hash-match the driver's oracle:
  *
  *  - [[h60]]: the first 15 hex digits of md5 as a non-negative BIGINT
  *    (60 bits — fits int64 in both engines, no sign issues).
  *  - token shingles: n-token windows joined by ' ', hashed with h60.
  *  - all arithmetic stays in exact int64 or in IEEE doubles evaluated
  *    in the same association order on both engines.
  *
  * The reference has no text operators at all (its only string op is
  * `strip()`, producer/producer.py:65); this module is the north-star
  * extension surface for LLM-training-data pipelines (BASELINE.json).
  */
object TextFunctions {

  /** 60-bit md5 prefix hash. DuckDB twin: [[h60Sql]]. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  def h60Sql(e: String): String =
    s"CAST(CONCAT('0x', substr(md5($e),1,15)) AS BIGINT)"

  /** Bounded-pool sampling predicate: keep a row iff its 20-bit md5
    * hash clears a rate of cap/blockSize — i.e. ALL rows pass while
    * the block is at or under `cap`, and an expected `cap`-sized
    * deterministic sample passes once blocks outgrow it. The one
    * definition serves every capped self-join (ann_knn_join,
    * dedup_embedding_cosine); keep [[h60PoolSql]] in lockstep. */
  def h60Pool(id: Column, blockSize: Column, cap: Long): Column =
    h60(id.cast(StringType)) % lit(1048576L) * blockSize < lit(1048576L * cap)

  /** DuckDB twin of [[h60Pool]]. */
  def h60PoolSql(idExpr: String, blockSizeExpr: String, cap: Long): String =
    s"${h60Sql(s"CAST($idExpr AS VARCHAR)")} % 1048576 * $blockSizeExpr < 1048576 * $cap"

  /** Whitespace tokens (testdata text is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct h60 hashes of all n-token shingles; empty if fewer than
    * n tokens. DuckDB twin: [[shingleHashesSql]].
    *
    * PERF: pass an already-projected token-array *attribute* (not
    * `split(text)` inline). Catalyst substitutes the argument expression
    * into every reference — including the per-element `slice` inside the
    * transform lambda — so an inline split would re-tokenize the text
    * once per shingle (~50x per doc, the round-1 dedup hotspot). */
  def shingleHashesOfToks(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(
        transform(
          sequence(lit(0), size(toks) - n),
          i => h60(concat_ws(" ", slice(toks, i + lit(1), lit(n)))))))
      .otherwise(array().cast(ArrayType(LongType)))

  /** Convenience form for single-use projections; see the PERF note on
    * [[shingleHashesOfToks]] before using this in a lambda-heavy plan. */
  def shingleHashes(text: Column, n: Int): Column =
    shingleHashesOfToks(tokens(text), n)

  def shingleHashesSql(n: Int): String = {
    val h = h60Sql(s"array_to_string(string_split(text,' ')[i:i+${n - 1}],' ')")
    s"""CASE WHEN len(string_split(text,' ')) >= $n
       | THEN list_distinct(list_transform(
       |        generate_series(1, len(string_split(text,' '))-${n - 1}), i -> $h))
       | ELSE CAST([] AS BIGINT[]) END""".stripMargin.replaceAll("\n\\s*", " ")
  }

  // ---- MinHash parameters (shared by Spark plan and oracle SQL) ------

  /** Modulus for the universal hash family: 2^31-1 (Mersenne prime).
    * With h30 < 2^30 and a < 2^31, a*h30+b < 2^61 — exact in int64 on
    * both engines. */
  val MinHashP: Long = 2147483647L

  /** h30: shingle hash reduced below 2^30 so the product fits int64. */
  val MinHashM: Long = 1073741824L

  /** k=16 fixed odd multipliers / offsets (Knuth multiplicative style,
    * deterministic; same literals are embedded in the oracle SQL). */
  val MinHashA: Seq[Long] = (1 to 16).map(i => ((i.toLong * 2654435761L) % MinHashP) | 1L)
  val MinHashB: Seq[Long] = (1 to 16).map(i => (i.toLong * 1779033703L) % MinHashP)

  /** i-th universal hash of a shingle-hash column. */
  def minHash(i: Int, s: Column): Column =
    (lit(MinHashA(i)) * (s % MinHashM) + lit(MinHashB(i))) % MinHashP

  def minHashSql(i: Int, e: String): String =
    s"(${MinHashA(i)} * ($e % $MinHashM) + ${MinHashB(i)}) % $MinHashP"

  // ---- SimHash -------------------------------------------------------

  /** 60-bit SimHash of an array-of-h60-shingles expression: for each
    * bit, majority vote (2*ones > n) sets the bit. Exact int64
    * arithmetic; the Spark side uses the equivalent relational
    * formulation (DedupQueries.simhashSig). */
  def simHashSql(shExpr: String): String =
    s"""list_sum(list_transform(generate_series(0, 59),
       |  b -> CASE WHEN 2 * len(list_filter($shExpr, s -> (s >> b) & 1 = 1)) > len($shExpr)
       |            THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END))""".stripMargin
      .replaceAll("\n\\s*", " ")

  // ---- vector math ---------------------------------------------------

  /** Sequential left-fold dot product of two float-array columns in
    * double — same evaluation order as DuckDB's list_sum over
    * list_transform, so results are bit-identical. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, 64), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  /** Sum of squares (for norms). */
  def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType))

  def norm2Sql(a: String): String =
    s"list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"

  // ---- random-hyperplane LSH (shared plane literals) -----------------

  /** ±1.0 hyperplane components, deterministically derived from md5 of
    * "plane:p:j" at plan-build time; the identical literals are pasted
    * into the oracle SQL, so both engines see the same planes. */
  def planeSign(p: Int, j: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane:$p:$j".getBytes("UTF-8"))
    if ((d(0) & 1) == 1) 1.0 else -1.0
  }

  def planeSigns(p: Int, dim: Int): Seq[Double] =
    (0 until dim).map(j => planeSign(p, j))
}
