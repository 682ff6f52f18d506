package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.util.Tables
import graft.util.Tables._

/** Data-profiling operator: per-column statistics of a table in ONE
  * scan — the "what is actually in this 100 TB table" pass every
  * training-data pipeline runs before touching anything else.
  *
  * Scale design: all per-column aggregates (null counts, distincts,
  * extrema) compute in a single aggregation over a single fact scan —
  * the long-form output is produced by exploding the one aggregated
  * row, NOT by a UNION ALL of per-column subqueries (which would scan
  * the table once per column; the oracle SQL does exactly that because
  * DuckDB reads 7k rows, but at cluster scale the single-pass shape is
  * the point). Exact distincts here for oracle parity; swap
  * approx_count_distinct at the 100 TB tier.
  */
object ProfileQueries {

  /** Profile of the `orders` table: one row per column with null
    * counts, distinct counts, numeric extrema (timestamps as epoch-us)
    * and string extrema. */
  def ordersProfile(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")

    def numStats(c: String, expr0: Column): Seq[Column] = Seq(
      count(expr0).as(s"nn_$c"), count_distinct(expr0).as(s"nd_$c"),
      min(expr0).cast(DoubleType).as(s"mn_$c"),
      max(expr0).cast(DoubleType).as(s"mx_$c"))
    def strStats(c: String): Seq[Column] = Seq(
      count(col(c)).as(s"nn_$c"), count_distinct(col(c)).as(s"nd_$c"),
      min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c"))

    val numeric = Seq("o_orderkey", "o_custkey", "o_totalprice")
    val strings = Seq("o_orderstatus", "o_orderpriority")
    val aggs: Seq[Column] =
      numeric.flatMap(c => numStats(c, col(c))) ++
        numStats("o_orderdate", epochUs(col("o_orderdate"))) ++
        strings.flatMap(strStats)

    val one = o.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val rows = (numeric :+ "o_orderdate").map { c =>
      struct(lit(c).as("col_name"), col("n_rows"),
        (col("n_rows") - col(s"nn_$c")).as("n_null"),
        col(s"nd_$c").as("n_distinct"),
        col(s"mn_$c").as("min_num"), col(s"mx_$c").as("max_num"),
        lit(null).cast(StringType).as("min_str"),
        lit(null).cast(StringType).as("max_str"))
    } ++ strings.map { c =>
      struct(lit(c).as("col_name"), col("n_rows"),
        (col("n_rows") - col(s"nn_$c")).as("n_null"),
        col(s"nd_$c").as("n_distinct"),
        lit(null).cast(DoubleType).as("min_num"),
        lit(null).cast(DoubleType).as("max_num"),
        col(s"mn_$c").as("min_str"), col(s"mx_$c").as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_name"))
  }

  val ordersProfileSql: String = {
    def numRow(c: String, e: String) =
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |       count(*) - count($e) AS n_null,
         |       count(DISTINCT $e) AS n_distinct,
         |       CAST(min($e) AS DOUBLE) AS min_num,
         |       CAST(max($e) AS DOUBLE) AS max_num,
         |       CAST(NULL AS VARCHAR) AS min_str,
         |       CAST(NULL AS VARCHAR) AS max_str
         |FROM orders""".stripMargin
    def strRow(c: String) =
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |       count(*) - count($c) AS n_null,
         |       count(DISTINCT $c) AS n_distinct,
         |       CAST(NULL AS DOUBLE) AS min_num,
         |       CAST(NULL AS DOUBLE) AS max_num,
         |       min($c) AS min_str,
         |       max($c) AS max_str
         |FROM orders""".stripMargin
    Seq(
      numRow("o_orderkey", "o_orderkey"),
      numRow("o_custkey", "o_custkey"),
      numRow("o_totalprice", "o_totalprice"),
      numRow("o_orderdate", "epoch_us(o_orderdate)"),
      strRow("o_orderstatus"),
      strRow("o_orderpriority"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  // ---------------------------------------------------------------------
  // util_hash_split: deterministic train/valid/test assignment
  // ---------------------------------------------------------------------

  /** 80/10/10 train/valid/test split keyed on a CONTENT hash, not a
    * row id or rand(): the same document always lands in the same
    * split across re-crawls, re-partitions, retries, and dataset
    * versions — the leakage-safe way to split training corpora (an id
    * or random split reassigns on every rebuild, leaking test docs
    * into train). Pure per-row map + one tiny shuffle for the audit
    * rollup. */
  def hashSplit(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.h60
    val bucket = pmod(h60(col("text")), lit(100L))
    val split = when(bucket < 80, "train")
      .when(bucket < 90, "valid").otherwise("test")
    Tables.load(spark, dir, "documents")
      .select(split.as("split"), col("doc_id"), col("n_chars"))
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("split"))
  }

  val hashSplitSql: String = {
    import graft.functions.TextFunctions.h60Sql
    s"""WITH assigned AS (
       |  SELECT CASE WHEN ${h60Sql("text")} % 100 < 80 THEN 'train'
       |              WHEN ${h60Sql("text")} % 100 < 90 THEN 'valid'
       |              ELSE 'test' END AS split,
       |         doc_id, n_chars
       |  FROM documents)
       |SELECT split, count(*) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM assigned
       |GROUP BY split
       |ORDER BY split""".stripMargin
  }

  // ---------------------------------------------------------------------
  // util_stratified_sample: deterministic balanced per-class sample
  // ---------------------------------------------------------------------

  /** Up to K documents per source, chosen by CONTENT-hash order — the
    * balanced-subset builder for training mixes (per-domain caps,
    * eval-set carving). Hash order gives a uniform-ish pseudo-random
    * pick that is reproducible across rebuilds/retries, unlike
    * rand()-based sampling. One shuffle (window by source). A hot
    * source sorts only its own partitionful of (hash, id) pairs; if a
    * single class is itself huge, pre-filter on a hash threshold
    * (hk < K/n quantile) before ranking — the two-phase top-K. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.h60
    val K = 20
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("hk"), col("doc_id"))
    Tables.load(spark, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"),
        h60(col("text")).as("hk"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= K)
      .select(col("source"), col("rn"), col("doc_id"), col("n_chars"))
      .orderBy(col("source"), col("rn"))
  }

  val stratifiedSampleSql: String = {
    import graft.functions.TextFunctions.h60Sql
    s"""WITH ranked AS (
       |  SELECT source, doc_id, n_chars,
       |         CAST(row_number() OVER (PARTITION BY source ORDER BY ${h60Sql("text")}, doc_id) AS BIGINT) AS rn
       |  FROM documents)
       |SELECT source, rn, doc_id, n_chars
       |FROM ranked WHERE rn <= 20
       |ORDER BY source, rn""".stripMargin
  }

  // ---------------------------------------------------------------------
  // util_pseudonymize: stable keyed pseudonyms + k-anonymity audit
  // ---------------------------------------------------------------------

  /** Privacy pass every shared training corpus needs: raw user ids are
    * replaced by STABLE keyed pseudonyms (sha256 of salt||id — same id
    * always maps to the same token, so joins/sessionization over the
    * pseudonymized data still work), and the release is audited for
    * k-anonymity over the quasi-identifier grain an attacker would
    * pivot on (event_type x hour-of-day): any cell with fewer than
    * K=5 distinct users is flagged for suppression.
    *
    * Scale shape: the hash is a codegen'd map-side projection (no
    * shuffle, no UDF); the audit is one distinct-expand + group-by on
    * the quasi-identifier key. The salt is a literal here; in
    * production it is a keyed secret so pseudonyms don't join across
    * releases. min(pseudonym) pins actual hash bytes into the oracle
    * compare, so the cross-engine check covers the hashing itself, not
    * just the counts. */
  def pseudonymize(spark: SparkSession, dir: String): DataFrame = {
    val K = 5
    val pseudo = sha2(concat(lit("graft-salt-v1:"),
      col("user_id").cast(StringType)), 256)
    Tables.load(spark, dir, "events")
      .select(col("event_type"), hour(col("ts")).as("hour_of_day"),
        pseudo.as("pseudonym"))
      .groupBy(col("event_type"), col("hour_of_day"))
      .agg(
        count(lit(1)).as("n_events"),
        count_distinct(col("pseudonym")).as("n_users"),
        min(col("pseudonym")).as("pseudo_sample"))
      .select(col("event_type"), col("hour_of_day").cast(LongType),
        col("n_events"), col("n_users"),
        (col("n_users") >= K).as("k_ok"), col("pseudo_sample"))
      .orderBy(col("event_type"), col("hour_of_day"))
  }

  val pseudonymizeSql: String =
    """SELECT event_type,
      |       CAST(hour(ts) AS BIGINT) AS hour_of_day,
      |       count(*) AS n_events,
      |       count(DISTINCT sha256('graft-salt-v1:' || CAST(user_id AS VARCHAR))) AS n_users,
      |       count(DISTINCT sha256('graft-salt-v1:' || CAST(user_id AS VARCHAR))) >= 5 AS k_ok,
      |       min(sha256('graft-salt-v1:' || CAST(user_id AS VARCHAR))) AS pseudo_sample
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // util_skew_profile: join-key skew diagnostic
  // ---------------------------------------------------------------------

  /** The pre-flight check behind every salting decision
    * ([[graft.operators.SaltedJoin]]): per-key row counts for the
    * heaviest join keys, each key's share of the table and its ratio
    * to the mean key. A key with x_mean >> 10 is the straggler
    * partition at shuffle time; this query is how you find it BEFORE
    * the 100 TB join, not from a hung stage.
    *
    * Scale shape: one shuffle (groupBy key, counts map-side combined);
    * the scalar totals cross-join back as a broadcast; the final rank
    * window runs on the reduced key grain (|keys| rows, never the
    * fact). */
  def skewProfile(spark: SparkSession, dir: String): DataFrame = {
    val byKey = Tables.load(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_rows"))
    val tot = byKey.agg(
      sum(col("n_rows")).as("total"),
      count(lit(1)).as("n_keys"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_rows").desc, col("user_id"))
    // global window is fine here: it ranks the aggregated key grain
    // (|distinct keys| rows), not the fact
    byKey.crossJoin(tot) // 1-row scalar, broadcast
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= 20)
      .select(col("rnk"), col("user_id"), col("n_rows"),
        (lit(100.0) * col("n_rows").cast(DoubleType) /
          col("total").cast(DoubleType)).as("share_pct"),
        (col("n_rows").cast(DoubleType) * col("n_keys").cast(DoubleType) /
          col("total").cast(DoubleType)).as("x_mean"))
      .orderBy(col("rnk"))
  }

  val skewProfileSql: String =
    """WITH by_key AS (
      |  SELECT user_id, count(*) AS n_rows FROM events GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(n_rows) AS BIGINT) AS total, count(*) AS n_keys
      |  FROM by_key),
      |ranked AS (
      |  SELECT CAST(row_number() OVER (ORDER BY n_rows DESC, user_id) AS BIGINT) AS rnk,
      |         user_id, n_rows, total, n_keys
      |  FROM by_key, tot)
      |SELECT rnk, user_id, n_rows,
      |       100.0 * CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE) AS share_pct,
      |       CAST(n_rows AS DOUBLE) * CAST(n_keys AS DOUBLE) / CAST(total AS DOUBLE) AS x_mean
      |FROM ranked WHERE rnk <= 20
      |ORDER BY rnk""".stripMargin

  // ---------------------------------------------------------------------
  // ev_user_cms: count-min-sketch heavy hitters (third sketch family)
  // ---------------------------------------------------------------------

  /** Count-min-sketch frequency audit: one mergeable sub-linear sketch
    * of the event stream's user_id frequencies (eps=0.1% of N,
    * confidence 99%), queried for the exact top-20 keys so the
    * overcount property (cms_n >= exact_n, bounded by eps*N) is
    * visible row by row. Completes the sketch shelf next to HLL++
    * (ev_hourly_metrics_approx) and Greenwald-Khanna
    * (txt_quantiles_approx).
    *
    * Scale shape: the sketch is ONE partial-aggregated pass (each
    * executor sketches its partition, buffers merge associatively —
    * exactly how you'd count 100 TB of token frequencies in fixed
    * memory); the driver holds only the fixed-size sketch bytes, never
    * keys. The estimates are a MAP-SIDE expression
    * ([[graft.functions.SketchExpressions.CmsEstimate]]): the sketch
    * bytes ride the plan as a broadcast-style literal and each audited
    * key pays one O(depth) probe inside codegen, so the audit list
    * size is unbounded — the driver collects only the final top-k,
    * never an estimate loop. No DuckDB oracle (sketch internals aren't
    * SQL-expressible); the driver records rows>0 and
    * ExtensionOpsSpec asserts the CMS error bounds + the
    * no-driver-estimate plan shape. */
  def userCms(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.SketchExpressions.ensureRegistered(spark)
    val ev = Tables.load(spark, dir, "events").select(col("user_id"))
    val skBytes = ev
      .agg(count_min_sketch(col("user_id"), lit(0.001), lit(0.99),
        lit(42)).as("sk"))
      .head.getAs[Array[Byte]](0)
    ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("user_id"))
      .limit(20)
      .select(col("user_id"), col("exact_n"),
        call_function("graft_cms_est", lit(skBytes), col("user_id"))
          .as("cms_n"))
      .orderBy(col("exact_n").desc, col("user_id"))
  }

  // ---------------------------------------------------------------------
  // util_temperature_mix: multi-source training-mix weights
  // ---------------------------------------------------------------------

  /** The data-mixing calculation behind every multi-corpus training
    * run (GPT-3 / LLaMA style): per-source sampling weights under
    * temperature T=2 — w_i ∝ n_tokens_i^(1/T) = sqrt(n_tokens_i) —
    * which upweights small sources relative to proportional sampling;
    * plus each source's expected token draw under a fixed budget and
    * the implied oversample factor (epochs over that source).
    *
    * Determinism: sqrt is IEEE-exact (unlike pow, whose libm differs
    * across engines), and the cross-source normalizer sums
    * MICRO-QUANTIZED int64 weights (the kmeansStep idiom) so the
    * 20-source fold is order-free; every downstream ratio divides the
    * same two numbers on both engines.
    *
    * Scale shape: one map-side-combined aggregate over the corpus to
    * the |sources| grain, then a 1-row scalar crossJoin (broadcast). */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val Budget = 1000000.0 // tokens drawn per mixing epoch
    val bySource = Tables.load(spark, dir, "documents")
      .select(col("source"),
        size(split(col("text"), " ")).cast(LongType).as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(sqrt(col("n_tokens").cast(DoubleType)) * lit(1e6))
          .cast(LongType).as("w_q"))
    val tot = bySource.agg(sum(col("w_q")).as("w_tot"))
    bySource.crossJoin(tot) // 1-row scalar, broadcast
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (col("w_q").cast(DoubleType) / col("w_tot").cast(DoubleType))
          .as("mix_weight"),
        (lit(Budget) * col("w_q").cast(DoubleType) /
          col("w_tot").cast(DoubleType)).as("expected_tokens"),
        (lit(Budget) * col("w_q").cast(DoubleType) /
          col("w_tot").cast(DoubleType) /
          col("n_tokens").cast(DoubleType)).as("oversample_factor"))
      .orderBy(col("source"))
  }

  val temperatureMixSql: String =
    """WITH by_source AS (
      |  SELECT source, count(*) AS n_docs,
      |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |w AS (
      |  SELECT source, n_docs, n_tokens,
      |         CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT) AS w_q
      |  FROM by_source),
      |tot AS (SELECT CAST(sum(w_q) AS BIGINT) AS w_tot FROM w)
      |SELECT source, n_docs, n_tokens,
      |       CAST(w_q AS DOUBLE) / CAST(w_tot AS DOUBLE) AS mix_weight,
      |       1000000.0 * CAST(w_q AS DOUBLE) / CAST(w_tot AS DOUBLE) AS expected_tokens,
      |       1000000.0 * CAST(w_q AS DOUBLE) / CAST(w_tot AS DOUBLE)
      |         / CAST(n_tokens AS DOUBLE) AS oversample_factor
      |FROM w, tot
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // util_epoch_plan: replication plan for the temperature-mix budget
  // ---------------------------------------------------------------------

  /** Token budget drawn per mixing epoch — [[temperatureMix]]'s own
    * Budget, restated. Interpolated into BOTH engines. */
  private val EpochBudget = 1000000.0

  /** The REPLICATION half of temperature mixing ([[temperatureMix]]
    * reports oversample factors; `pipeline_curate` applies the
    * DOWN-sample side): turn each source's τ=0.5 target share of the
    * token budget into an executable plan — `full_epochs` whole
    * passes over the source plus a deterministic FRACTIONAL epoch
    * (each doc draws a content-hash uniform; draws below the
    * fractional part's micro-threshold replicate once more). This is
    * how real mixes oversample small high-value sources (the LLaMA /
    * Pile recipe tables): repetition counts per source, not
    * per-document lottery at load time. The plan's realized token
    * count is reported against its target so the residual is visible
    * (planned = full·n_tokens + extra_tokens reconciles exactly —
    * spec'd).
    *
    * Scale shape: one corpus pass to the per-doc (source, tokens,
    * draw) grain, a |sources| rollup, 1-row broadcast total, and one
    * map-side per-doc threshold compare re-aggregated to |sources| —
    * no explode, no replication materialized (the plan is the
    * OUTPUT; the training loader executes it). Determinism: draws are
    * content-hash integers, thresholds micro-quantized. */
  def epochPlan(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.h60
    val perDoc = Tables.load(spark, dir, "documents")
      .select(col("source"),
        size(split(col("text"), " ")).cast(LongType).as("n_tok"),
        pmod(h60(concat(col("text"), lit(":epoch"))), lit(1000000L))
          .as("draw"))
      .persist() // (source, n_tok, draw) grain: one tokenizing corpus
                 // pass feeds both the rollup and the fractional-epoch
                 // draw filter (text itself never cached)
    val bySource = perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(sqrt(col("n_tokens").cast(DoubleType)) * lit(1e6))
          .cast(LongType).as("w_q"))
    val tot = bySource.agg(sum(col("w_q")).as("w_tot"))
    val target = lit(EpochBudget) * col("w_q").cast(DoubleType) /
      col("w_tot").cast(DoubleType)
    val plan = bySource.crossJoin(broadcast(tot)) // 1-row scalar
      .select(col("source"), col("n_docs"), col("n_tokens"),
        target.as("target_tokens"),
        floor(target / col("n_tokens").cast(DoubleType)).cast(LongType)
          .as("full_epochs"))
      .withColumn("frac_micro",
        round((col("target_tokens") / col("n_tokens").cast(DoubleType) -
          col("full_epochs").cast(DoubleType)) * 1e6).cast(LongType))
    val extra = perDoc.join(broadcast(plan.select(col("source"),
        col("frac_micro"))), "source")
      .filter(col("draw") < col("frac_micro"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("extra_docs"), sum(col("n_tok")).as("extra_tokens"))
    Tables.released(
      plan.join(extra, Seq("source"), "left")
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("target_tokens"), col("full_epochs"), col("frac_micro"),
          coalesce(col("extra_docs"), lit(0L)).as("extra_docs"),
          coalesce(col("extra_tokens"), lit(0L)).as("extra_tokens"),
          (col("full_epochs") * col("n_tokens") +
            coalesce(col("extra_tokens"), lit(0L))).as("planned_tokens"))
        .orderBy(col("source")),
      perDoc)
  }

  val epochPlanSql: String = {
    import graft.functions.TextFunctions.h60Sql
    s"""WITH per_doc AS (
       |  SELECT source,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |         ${h60Sql("text || ':epoch'")} % 1000000 AS draw
       |  FROM documents),
       |by_source AS (
       |  SELECT source, count(*) AS n_docs,
       |         CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |         CAST(round(sqrt(CAST(sum(n_tok) AS DOUBLE)) * 1e6) AS BIGINT) AS w_q
       |  FROM per_doc GROUP BY 1),
       |tot AS (SELECT CAST(sum(w_q) AS BIGINT) AS w_tot FROM by_source),
       |plan AS (
       |  SELECT source, n_docs, n_tokens,
       |         $EpochBudget * CAST(w_q AS DOUBLE) / CAST(w_tot AS DOUBLE)
       |           AS target_tokens,
       |         CAST(floor(($EpochBudget * CAST(w_q AS DOUBLE) / CAST(w_tot AS DOUBLE))
       |           / CAST(n_tokens AS DOUBLE)) AS BIGINT) AS full_epochs
       |  FROM by_source, tot),
       |plan2 AS (
       |  SELECT *, CAST(round((target_tokens / CAST(n_tokens AS DOUBLE)
       |           - CAST(full_epochs AS DOUBLE)) * 1e6) AS BIGINT) AS frac_micro
       |  FROM plan),
       |extra AS (
       |  SELECT p.source, count(*) AS extra_docs,
       |         CAST(sum(p.n_tok) AS BIGINT) AS extra_tokens
       |  FROM per_doc p JOIN plan2 ON p.source = plan2.source
       |  WHERE p.draw < plan2.frac_micro
       |  GROUP BY 1)
       |SELECT plan2.source, n_docs, n_tokens, target_tokens, full_epochs,
       |       frac_micro,
       |       COALESCE(extra_docs, 0) AS extra_docs,
       |       COALESCE(extra_tokens, 0) AS extra_tokens,
       |       full_epochs * n_tokens + COALESCE(extra_tokens, 0)
       |         AS planned_tokens
       |FROM plan2 LEFT JOIN extra ON plan2.source = extra.source
       |ORDER BY plan2.source""".stripMargin
  }

  // ---------------------------------------------------------------------
  // util_weighted_sample: deterministic weighted per-stratum sampling
  // ---------------------------------------------------------------------

  /** Weighted sampling without replacement, per stratum — the
    * Efraimidis–Spirakis exponential race: each doc draws a uniform
    * u from its content hash and competes with key −ln(u)/w; the K
    * smallest keys per source are EXACTLY a weight-proportional
    * sample without replacement (the doc winning round 1 has
    * P = w_i/Σw — WeightedSampleSpec proves that property
    * empirically over simulated seeds). Weight = n_chars, i.e.
    * sample probability proportional to document size, the usual
    * token-budget draw; [[stratifiedSample]] is the unweighted twin.
    *
    * Determinism: u = (h60(text)+1)/2^60 is pure integer→double
    * arithmetic (exact on both engines); the ONLY transcendental
    * (ln) is quantized to nano units like [[TextQueries.tfidf]]'s
    * milli scores, then ties break on doc_id.
    *
    * Scale shape: one map-side keyed projection (no pre-shuffle),
    * then the per-source rn ≤ K window — Spark plans it as a
    * WindowGroupLimit, so every partition keeps only its local
    * top-K before the single |sources|-keyed shuffle. No corpus
    * sort, no driver-side sampling state. */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.h60
    val K = 20
    val u = (h60(col("text")) + lit(1L)).cast(DoubleType) /
      lit(1152921504606846976L).cast(DoubleType) // 2^60: u in (0, 1]
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("key_nano"), col("doc_id"))
    Tables.load(spark, dir, "documents")
      .filter(col("n_chars") > 0L)
      .select(col("source"), col("doc_id"), col("n_chars"),
        round(-log(u) / col("n_chars").cast(DoubleType) * lit(1e9))
          .cast(LongType).as("key_nano"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= K)
      .select(col("source"), col("rn"), col("doc_id"), col("n_chars"),
        col("key_nano"))
      .orderBy(col("source"), col("rn"))
  }

  val weightedSampleSql: String = {
    import graft.functions.TextFunctions.h60Sql
    s"""WITH keyed AS (
       |  SELECT source, doc_id, n_chars,
       |         CAST(round(-ln(CAST(${h60Sql("text")} + 1 AS DOUBLE)
       |             / CAST(1152921504606846976 AS DOUBLE))
       |           / CAST(n_chars AS DOUBLE) * 1e9) AS BIGINT) AS key_nano
       |  FROM documents WHERE n_chars > 0),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY source
       |              ORDER BY key_nano, doc_id) AS BIGINT) AS rn
       |  FROM keyed)
       |SELECT source, rn, doc_id, n_chars, key_nano
       |FROM ranked WHERE rn <= 20
       |ORDER BY source, rn""".stripMargin
  }

  // ---------------------------------------------------------------------
  // util_domain_cap: per-source quota keeping the highest-quality docs
  // ---------------------------------------------------------------------

  /** Max documents kept per source. Interpolated into BOTH engines. */
  private val DomainCapK = 15

  /** Per-domain capping (the RefinedWeb/Dolma anti-over-representation
    * pass): no single domain may contribute more than [[DomainCapK]]
    * documents, and when a domain is over quota the KEPT subset is the
    * highest-quality slice, not a random one — rank within source by a
    * deterministic quality score (type-token ratio, micro-quantized)
    * and keep the top K. Complements [[weightedSample]] (a random
    * race) and [[stratifiedSample]] (proportional): this is the
    * quality-ORDERED quota real curation stacks apply to SEO-spam
    * domains.
    *
    * Scale shape: one tokenize pass to a 4-column grain, then a
    * per-source top-K window — Spark plans a WindowGroupLimit, so each
    * partition keeps only its local top K before the single
    * |sources|-keyed shuffle (plan-pinned). Determinism: score is
    * int64 micro TTR; ties break by doc_id. */
  def domainCap(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    Tables.load(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        split(col("text"), " ").as("toks"))
      .select(col("source"), col("doc_id"),
        size(col("toks")).cast(LongType).as("n_tok"),
        size(array_distinct(col("toks"))).cast(LongType).as("n_uniq"))
      .filter(col("n_tok") > 0L)
      .withColumn("score_micro",
        floor(col("n_uniq") * lit(1000000L) / col("n_tok")).cast(LongType))
      .withColumn("src_rank", row_number().over(w).cast(LongType))
      .filter(col("src_rank") <= DomainCapK)
      .select(col("source"), col("src_rank"), col("doc_id"),
        col("n_tok"), col("score_micro"))
      .orderBy(col("source"), col("src_rank"))
  }

  val domainCapSql: String =
    s"""WITH scored AS (
       |  SELECT source, doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
       |           AS n_uniq
       |  FROM documents),
       |ranked AS (
       |  SELECT source, doc_id, n_tok,
       |         CAST(floor(n_uniq * 1000000 / n_tok) AS BIGINT) AS score_micro
       |  FROM scored WHERE n_tok > 0),
       |topk AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY source
       |              ORDER BY score_micro DESC, doc_id) AS BIGINT) AS src_rank
       |  FROM ranked)
       |SELECT source, src_rank, doc_id, n_tok, score_micro
       |FROM topk WHERE src_rank <= $DomainCapK
       |ORDER BY source, src_rank""".stripMargin

  // ---------------------------------------------------------------------
  // util_scd2_merge: slowly-changing-dimension type-2 snapshot merge
  // ---------------------------------------------------------------------

  /** The canonical warehouse history operator: merge yesterday's
    * dimension snapshot with today's into SCD type-2 rows — changed
    * keys close their old version and open a new one, inserts open,
    * deletes close, unchanged keys keep one open row. The engine's
    * upsert sink (`EventsPipeline`, A2) is the latest-wins half of
    * this; SCD2 is the keep-history half.
    *
    * The two snapshots derive DETERMINISTICALLY from the customer
    * table (no wall clock, identical in both engines): the old
    * snapshot rewrites c_mktsegment to 'LEGACY' for custkey % 5 = 0
    * (simulated attribute drift) and lacks custkey % 11 = 0 (today's
    * inserts); the new snapshot lacks custkey % 13 = 0 (today's
    * deletes). Validity stamps are literal epochs (old = 100,
    * new = 200, open = NULL).
    *
    * Scale shape: ONE null-safe full-outer sort-merge join on the
    * dimension key, per-key classification, and an explode emitting
    * at most 2 rows per key — no windows, no second pass over either
    * snapshot. At 100 TB this is exactly the nightly dim-merge plan
    * you want: both sides shuffle once on the join key. */
  def scd2Merge(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val old = cust.filter(col("c_custkey") % 11 =!= 0)
      .select(col("c_custkey"),
        when(col("c_custkey") % 5 === 0, lit("LEGACY"))
          .otherwise(col("c_mktsegment")).as("seg"),
        col("c_acctbal").as("bal"))
    val neu = cust.filter(col("c_custkey") % 13 =!= 0)
      .select(col("c_custkey"), col("c_mktsegment").as("seg"),
        col("c_acctbal").as("bal"))
    // open rows carry a sentinel close (both engines emit the same
    // literal): NULL would be semantically nicer but adds nothing to
    // the operator and everything to cross-engine row ordering
    val Open = 99999999L
    def ver(seg: Column, bal: Column, vf: Long, vt: Long): Column =
      struct(seg.as("seg"), bal.as("bal"),
        lit(vf).as("valid_from"), lit(vt).as("valid_to"))
    val j = old.as("o").join(neu.as("n"),
      col("o.c_custkey") === col("n.c_custkey"), "full_outer")
    val changed = !(col("o.seg") <=> col("n.seg")) ||
      !(col("o.bal") <=> col("n.bal"))
    j.select(
        coalesce(col("o.c_custkey"), col("n.c_custkey")).as("c_custkey"),
        explode(
          when(col("o.c_custkey").isNull, // insert
            array(ver(col("n.seg"), col("n.bal"), 200L, Open)))
          .when(col("n.c_custkey").isNull, // delete
            array(ver(col("o.seg"), col("o.bal"), 100L, 200L)))
          .when(changed,
            array(ver(col("o.seg"), col("o.bal"), 100L, 200L),
              ver(col("n.seg"), col("n.bal"), 200L, Open)))
          .otherwise(
            array(ver(col("n.seg"), col("n.bal"), 100L, Open)))
          ).as("v"))
      .select(col("c_custkey"), col("v.seg").as("c_mktsegment"),
        col("v.bal").as("c_acctbal"), col("v.valid_from"), col("v.valid_to"))
      .orderBy(col("c_custkey"), col("valid_from"))
  }

  val scd2MergeSql: String =
    """WITH old AS (
      |  SELECT c_custkey,
      |         CASE WHEN c_custkey % 5 = 0 THEN 'LEGACY' ELSE c_mktsegment END AS seg,
      |         c_acctbal AS bal
      |  FROM customer WHERE c_custkey % 11 != 0),
      |new AS (
      |  SELECT c_custkey, c_mktsegment AS seg, c_acctbal AS bal
      |  FROM customer WHERE c_custkey % 13 != 0),
      |j AS (
      |  SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
      |         o.seg AS oseg, o.bal AS obal, n.seg AS nseg, n.bal AS nbal,
      |         o.c_custkey IS NULL AS ins, n.c_custkey IS NULL AS del,
      |         (o.seg IS DISTINCT FROM n.seg
      |           OR o.bal IS DISTINCT FROM n.bal) AS chg
      |  FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey)
      |SELECT c_custkey, nseg AS c_mktsegment, nbal AS c_acctbal,
      |       CAST(200 AS BIGINT) AS valid_from, CAST(99999999 AS BIGINT) AS valid_to
      |  FROM j WHERE ins
      |UNION ALL
      |SELECT c_custkey, oseg, obal, 100, 200 FROM j WHERE del
      |UNION ALL
      |SELECT c_custkey, oseg, obal, 100, 200 FROM j WHERE NOT ins AND NOT del AND chg
      |UNION ALL
      |SELECT c_custkey, nseg, nbal, 200, 99999999 FROM j WHERE NOT ins AND NOT del AND chg
      |UNION ALL
      |SELECT c_custkey, nseg, nbal, 100, 99999999 FROM j WHERE NOT ins AND NOT del AND NOT chg
      |ORDER BY c_custkey, valid_from""".stripMargin

  // ---------------------------------------------------------------------
  // util_k_anonymity: generalization-ladder k-anonymity audit
  // ---------------------------------------------------------------------

  private val AnonK = 5

  /** K-anonymity with a generalization hierarchy — the privacy audit a
    * training-data pipeline runs before shipping user-adjacent tables:
    * every row must share its quasi-identifier tuple with ≥ k−1 others
    * or be GENERALIZED until it does. Quasi-identifiers here are
    * (market segment, nation); the ladder is nation → region → full
    * suppression: each customer is assigned the FINEST level whose
    * equivalence class reaches k, and the output is the anonymized
    * class accounting (level, segment, geo, class size) — every class
    * in it has n ≥ k except the terminal suppressed bucket, which
    * absorbs whatever even (*, *) could not protect.
    *
    * Scale: one customer scan; nation/region are broadcast dims; the
    * two class-size frames are |segments × nations|-bounded and
    * broadcast back; the final rollup groups on coarse keys. No
    * corpus-vs-corpus join anywhere ([[pseudonymize]] is the
    * column-level complement — this is the row-level re-identification
    * audit). */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment").as("seg"),
        col("c_nationkey"))
    val n = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name").as("nation"),
        col("n_regionkey"))
    val r = Tables.load(spark, dir, "region")
      .select(col("r_regionkey"), col("r_name").as("region"))
    val base = c
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("seg"), col("nation"), col("region"))
    val l0 = base.groupBy(col("seg"), col("nation"))
      .agg(count(lit(1)).as("n0"))
    val withN0 = base.join(broadcast(l0), Seq("seg", "nation"))
    // the level-1 census runs over the level-0 FAILERS only: a
    // published level-1 class contains just the rows generalized into
    // it, so counting all (seg, region) rows would certify classes
    // whose published size is below k (KAnonymitySpec caught exactly
    // this on the real data — the standard local-recoding subtlety)
    val l1 = withN0.filter(col("n0") < AnonK)
      .groupBy(col("seg"), col("region"))
      .agg(count(lit(1)).as("n1"))
    val leveled = withN0
      .join(broadcast(l1), Seq("seg", "region"), "left_outer")
      .select(col("seg"), col("nation"), col("region"),
        when(col("n0") >= AnonK, lit(0L))
          .when(col("n1") >= AnonK, lit(1L))
          .otherwise(lit(2L)).as("level"))
    leveled
      .select(col("level"),
        when(col("level") === 2L, lit("*")).otherwise(col("seg")).as("seg_out"),
        when(col("level") === 0L, col("nation"))
          .when(col("level") === 1L, col("region"))
          .otherwise(lit("*")).as("geo_out"))
      .groupBy(col("level"), col("seg_out"), col("geo_out"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("level"), col("seg_out"), col("geo_out"))
  }

  val kAnonymitySql: String =
    s"""WITH base AS (
       |  SELECT c_custkey, c_mktsegment AS seg, n_name AS nation, r_name AS region
       |  FROM customer
       |  JOIN nation ON c_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey),
       |l0 AS (SELECT seg, nation, count(*) AS n0 FROM base GROUP BY 1, 2),
       |b0 AS (
       |  SELECT base.seg, base.nation, base.region, n0
       |  FROM base JOIN l0 ON base.seg = l0.seg AND base.nation = l0.nation),
       |l1 AS (
       |  SELECT seg, region, count(*) AS n1
       |  FROM b0 WHERE n0 < $AnonK GROUP BY 1, 2),
       |leveled AS (
       |  SELECT b0.seg, b0.nation, b0.region,
       |         CASE WHEN n0 >= $AnonK THEN 0
       |              WHEN n1 >= $AnonK THEN 1
       |              ELSE 2 END AS level
       |  FROM b0
       |  LEFT JOIN l1 ON b0.seg = l1.seg AND b0.region = l1.region)
       |SELECT CAST(level AS BIGINT) AS level,
       |       CASE WHEN level = 2 THEN '*' ELSE seg END AS seg_out,
       |       CASE WHEN level = 0 THEN nation
       |            WHEN level = 1 THEN region
       |            ELSE '*' END AS geo_out,
       |       count(*) AS n_rows
       |FROM leveled
       |GROUP BY 1, 2, 3
       |ORDER BY level, seg_out, geo_out""".stripMargin

  // ---------------------------------------------------------------------
  // util_table_diff: keyed row-level reconciliation of two versions
  // ---------------------------------------------------------------------

  /** Data-diff between two versions of a keyed table — the
    * reconciliation pass a pipeline migration runs to prove the new
    * path reproduces the old one (and, when it doesn't, WHAT moved):
    * FULL OUTER join on the key, row-content hash comparison, and a
    * per-status accounting of added / removed / changed / unchanged
    * keys with their key ranges. Version B is derived in-query from
    * customer with a deterministic synthetic mutation set (every 97th
    * key's balance bumped, every 101st dropped, every 103rd re-keyed
    * as an insert) so both engines diff identical inputs; in
    * deployment the two sides are two table snapshots.
    *
    * Determinism: the content hash is md5 over pipe-joined NORMALIZED
    * fields — the balance enters as exact cents (round(x·100) int64),
    * never a float's string form, which differs across engines.
    *
    * Scale: one shuffle per side on the key (the join), counters
    * aggregate map-side; nothing is collected. Sample keys are
    * min/max per status — bounded output regardless of diff size. */
  def tableDiff(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast(LongType).as("cents"))
    val a = base
    val b = base
      .filter(col("c_custkey") % 101 =!= 0) // removed in B
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        when(col("c_custkey") % 97 === 0, col("cents") + 1000L)
          .otherwise(col("cents")).as("cents")) // changed in B
      .unionByName(
        base.filter(col("c_custkey") % 103 === 0)
          .select((col("c_custkey") + 10000000L).as("c_custkey"),
            col("c_name"), col("c_mktsegment"), col("cents"))) // added in B
    def hashed(df: DataFrame, h: String): DataFrame =
      df.select(col("c_custkey"),
        md5(concat_ws("|", col("c_name"), col("c_mktsegment"),
          col("cents"))).as(h))
    val status = hashed(a, "ha")
      .join(hashed(b, "hb"), Seq("c_custkey"), "full_outer")
      .select(col("c_custkey"),
        when(col("ha").isNull, "added")
          .when(col("hb").isNull, "removed")
          .when(col("ha") === col("hb"), "unchanged")
          .otherwise("changed").as("status"))
    status.groupBy(col("status"))
      .agg(count(lit(1)).as("n"),
        min(col("c_custkey")).as("min_key"),
        max(col("c_custkey")).as("max_key"))
      .orderBy(col("status"))
  }

  val tableDiffSql: String =
    """WITH base AS (
      |  SELECT c_custkey, c_name, c_mktsegment,
      |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      |  FROM customer),
      |b AS (
      |  SELECT c_custkey, c_name, c_mktsegment,
      |         CASE WHEN c_custkey % 97 = 0 THEN cents + 1000 ELSE cents END AS cents
      |  FROM base WHERE c_custkey % 101 != 0
      |  UNION ALL
      |  SELECT c_custkey + 10000000, c_name, c_mktsegment, cents
      |  FROM base WHERE c_custkey % 103 = 0),
      |ha AS (SELECT c_custkey, md5(concat_ws('|', c_name, c_mktsegment, cents)) AS ha FROM base),
      |hb AS (SELECT c_custkey, md5(concat_ws('|', c_name, c_mktsegment, cents)) AS hb FROM b),
      |st AS (
      |  SELECT COALESCE(ha.c_custkey, hb.c_custkey) AS c_custkey,
      |         CASE WHEN ha.ha IS NULL THEN 'added'
      |              WHEN hb.hb IS NULL THEN 'removed'
      |              WHEN ha.ha = hb.hb THEN 'unchanged'
      |              ELSE 'changed' END AS status
      |  FROM ha FULL OUTER JOIN hb ON ha.c_custkey = hb.c_custkey)
      |SELECT status, count(*) AS n,
      |       min(c_custkey) AS min_key, max(c_custkey) AS max_key
      |FROM st
      |GROUP BY status
      |ORDER BY status""".stripMargin

  // ---------------------------------------------------------------------
  // util_mix_kl: divergence of the corpus mix from the sampling target
  // ---------------------------------------------------------------------

  /** KL(p‖q) between the OBSERVED token mix p and the τ=0.5
    * temperature target q that [[temperatureMix]] publishes — the
    * drift monitor a mixing pipeline runs each ingest epoch: when the
    * divergence grows, the corpus composition has moved and the
    * sampling weights need re-fitting. Per-source contributions
    * p·ln(p/q) are emitted so the drifting sources are attributable;
    * the ln is quantized once per source (the bigramLogprob
    * discipline) and everything else is exact integer/IEEE division.
    *
    * Scale: the same one corpus pass as temperatureMix, then
    * |sources|-grain arithmetic under two 1-row broadcast scalars. */
  def mixKl(spark: SparkSession, dir: String): DataFrame = {
    val bySource = Tables.load(spark, dir, "documents")
      .select(col("source"),
        size(split(col("text"), " ")).cast(LongType).as("n_tok"))
      .groupBy(col("source"))
      .agg(sum(col("n_tok")).as("n_tokens"))
      .select(col("source"), col("n_tokens"),
        round(sqrt(col("n_tokens").cast(DoubleType)) * lit(1e6))
          .cast(LongType).as("w_q"))
      .persist() // |sources| rows; feeds both totals and the output
    bySource.count()
    val tot = bySource.agg(
      sum(col("n_tokens")).as("t_tot"), sum(col("w_q")).as("w_tot"))
    val p = col("n_tokens").cast(DoubleType) / col("t_tot").cast(DoubleType)
    val q = col("w_q").cast(DoubleType) / col("w_tot").cast(DoubleType)
    Tables.released(
      bySource.crossJoin(broadcast(tot)) // 1-row scalars
        .select(col("source"), col("n_tokens"),
          p.as("p_obs"), q.as("q_target"),
          (p * (round(log(p / q) * lit(1e6)).cast(LongType)
            .cast(DoubleType) / lit(1e6))).as("kl_contrib"))
        .orderBy(col("source")),
      bySource)
  }

  val mixKlSql: String =
    """WITH by_source AS (
      |  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |w AS (
      |  SELECT source, n_tokens,
      |         CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT) AS w_q
      |  FROM by_source),
      |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t_tot,
      |               CAST(sum(w_q) AS BIGINT) AS w_tot FROM w)
      |SELECT source, n_tokens,
      |       CAST(n_tokens AS DOUBLE) / CAST(t_tot AS DOUBLE) AS p_obs,
      |       CAST(w_q AS DOUBLE) / CAST(w_tot AS DOUBLE) AS q_target,
      |       (CAST(n_tokens AS DOUBLE) / CAST(t_tot AS DOUBLE)) *
      |         (CAST(CAST(round(ln((CAST(n_tokens AS DOUBLE) / CAST(t_tot AS DOUBLE)) /
      |           (CAST(w_q AS DOUBLE) / CAST(w_tot AS DOUBLE))) * 1e6) AS BIGINT) AS DOUBLE) / 1e6)
      |         AS kl_contrib
      |FROM w, tot
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // util_ks_drift: per-source two-sample Kolmogorov–Smirnov drift
  // ---------------------------------------------------------------------

  /** Distribution drift as a TEST, not just a divergence number
    * ([[mixKl]] reports KL of the source MIX; this asks whether each
    * source's per-document length DISTRIBUTION differs from the rest
    * of the corpus): the two-sample Kolmogorov–Smirnov statistic of
    * every source against its complement, with the α=0.05 critical
    * value next to it so the row IS the accept/reject decision. The
    * max |ECDF_s − ECDF_rest| is exact int64 arithmetic — ECDFs are
    * compared by cross-multiplication on the common denominator
    * n_s·(N−n_s), so no float CDF ever exists; only the final micro
    * ratios divide. The achieving length is reported (min length on
    * ties) — where to LOOK when the test fires.
    *
    * Scale shape: one tokenize pass to a (source, len) count grain,
    * then everything runs on the |sources|×|distinct lens| evaluation
    * grid (jump points of either ECDF — bounded: quantize lengths
    * before the grain if doc lengths are unbounded); the complement's
    * cumulative counts come from the global cumulative minus the
    * source's own, so no second corpus pass. Overflow bound: the
    * cross-multiplied numerator times 1e6 must fit int64 — holds to
    * ~3e6 docs per side; rescale the micro factor beyond that. */
  def ksDrift(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("x"))
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("num").desc, col("x"))
    val cnt = Tables.load(spark, dir, "documents")
      .select(col("source"),
        size(split(col("text"), " ")).cast(LongType).as("x"))
      .groupBy(col("source"), col("x")).agg(count(lit(1)).as("c"))
      .persist() // (source, len) grain: feeds per-source totals, the
                 // global length marginal, and the evaluation grid
    val nSrc = cnt.groupBy(col("source")).agg(sum(col("c")).as("n_s"))
    val gx = cnt.groupBy(col("x")).agg(sum(col("c")).as("g"))
    val tot = gx.agg(sum(col("g")).as("n"))
    val grid = nSrc.crossJoin(broadcast(gx)) // |sources| × |jump points|
      .join(cnt, Seq("source", "x"), "left_outer")
      .select(col("source"), col("n_s"), col("x"), col("g"),
        coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("cum_s", sum(col("c")).over(w))
      .withColumn("cum_g", sum(col("g")).over(w))
    val scored = grid.crossJoin(broadcast(tot)) // 1-row scalar
      .withColumn("m", col("n") - col("n_s"))
      .withColumn("num", abs(col("cum_s") * col("m") -
        (col("cum_g") - col("cum_s")) * col("n_s")))
    Tables.released(
      scored.withColumn("rn", row_number().over(rw))
        .filter(col("rn") === 1)
        .select(col("source"), col("n_s").as("n_docs"),
          col("m").as("n_rest"), col("x").as("at_len"),
          floor(col("num") * lit(1000000L) / (col("n_s") * col("m")))
            .cast(LongType).as("d_micro"),
          floor(lit(1.358) * sqrt((col("n_s") + col("m")).cast(DoubleType) /
            (col("n_s") * col("m")).cast(DoubleType)) * lit(1000000.0))
            .cast(LongType).as("crit_micro"))
        .withColumn("drifted", col("d_micro") > col("crit_micro"))
        .orderBy(col("source")),
      cnt)
  }

  val ksDriftSql: String =
    """WITH lens AS (
      |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS x
      |  FROM documents),
      |cnt AS (
      |  SELECT source, x, CAST(count(*) AS BIGINT) AS c
      |  FROM lens GROUP BY 1, 2),
      |nsrc AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM cnt GROUP BY 1),
      |gx AS (SELECT x, CAST(sum(c) AS BIGINT) AS g FROM cnt GROUP BY 1),
      |tot AS (SELECT CAST(sum(g) AS BIGINT) AS n FROM gx),
      |grid AS (
      |  SELECT s.source, s.n_s, gx.x, gx.g, COALESCE(cnt.c, 0) AS c
      |  FROM nsrc s CROSS JOIN gx
      |  LEFT JOIN cnt ON cnt.source = s.source AND cnt.x = gx.x),
      |cum AS (
      |  SELECT source, n_s, x,
      |         CAST(sum(c) OVER (PARTITION BY source ORDER BY x) AS BIGINT) AS cum_s,
      |         CAST(sum(g) OVER (PARTITION BY source ORDER BY x) AS BIGINT) AS cum_g
      |  FROM grid),
      |scored AS (
      |  SELECT source, n_s, tot.n - n_s AS m, x,
      |         abs(cum_s * (tot.n - n_s) - (cum_g - cum_s) * n_s) AS num
      |  FROM cum, tot),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY source
      |              ORDER BY num DESC, x) AS rn
      |  FROM scored)
      |SELECT source, n_s AS n_docs, m AS n_rest, x AS at_len,
      |       CAST(floor(num * 1000000 / (n_s * m)) AS BIGINT) AS d_micro,
      |       CAST(floor(1.358 * sqrt(CAST(n_s + m AS DOUBLE)
      |         / (CAST(n_s AS DOUBLE) * m)) * 1000000) AS BIGINT) AS crit_micro,
      |       CAST(floor(num * 1000000 / (n_s * m)) AS BIGINT) >
      |         CAST(floor(1.358 * sqrt(CAST(n_s + m AS DOUBLE)
      |           / (CAST(n_s AS DOUBLE) * m)) * 1000000) AS BIGINT) AS drifted
      |FROM ranked WHERE rn = 1
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // util_importance_resample: DSIR-style data selection toward a target
  // distribution (hashed n-gram importance weights)
  // ---------------------------------------------------------------------

  /** Hashed-feature bucket count (DSIR's hashed n-gram dimension).
    * Interpolated into BOTH engines. */
  private val DsirBuckets = 1024L

  /** Docs selected. */
  private val DsirTopK = 100

  /** Data Selection via Importance Resampling (Xie et al. 2023,
    * arXiv:2302.03169): score every raw document by how target-like
    * its hashed unigram distribution is — log p_target(d) −
    * log p_raw(d) under two smoothed bag-of-buckets models — and keep
    * the top-scoring docs. Here the target is the `lang = 'en'`
    * slice, so the selected pool should over-represent English
    * without ever reading the `lang` column at selection time (the
    * whole point: the weight is computed from TEXT features, usable
    * when no label exists on the raw side).
    *
    * Scale shape: one tokenize pass to the (doc, bucket, n) grain —
    * the only corpus-grain shuffle; both feature models are
    * B=[[DsirBuckets]]-row aggregates of that grain whose log-ratio
    * table broadcasts back onto it; the per-doc weight is an exact
    * int64 dot of (count, micro-quantized log-ratio); selection is
    * TakeOrdered — no global window. Determinism: the single ln per
    * bucket is micro-quantized (the bigramLogprob discipline), weight
    * sums are exact int64, ties break on doc_id. */
  def importanceResample(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.h60
    val grain = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("term"))
      .select(col("doc_id"), col("lang"),
        (h60(col("term")) % DsirBuckets).as("b"))
      .groupBy(col("doc_id"), col("lang"), col("b"))
      .agg(count(lit(1)).as("n"))
      .persist() // feeds target model, raw model, and the weight pass
    grain.count()
    val tgt = grain.filter(col("lang") === "en")
      .groupBy(col("b")).agg(sum(col("n")).as("nt"))
    val raw = grain.groupBy(col("b")).agg(sum(col("n")).as("ns"))
    val tots = grain.agg(
      sum(when(col("lang") === "en", col("n"))).as("tt"),
      sum(col("n")).as("ts"))
    val lr = raw.join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(tots)) // 1-row scalar
      .select(col("b"),
        round((log((coalesce(col("nt"), lit(0L)) + 1).cast(DoubleType) /
          (col("tt") + DsirBuckets).cast(DoubleType)) -
          log((col("ns") + 1).cast(DoubleType) /
            (col("ts") + DsirBuckets).cast(DoubleType))) * 1e6)
          .cast(LongType).as("lr_micro"))
    Tables.released(
      grain.join(broadcast(lr), "b") // B rows — map-side
        .groupBy(col("doc_id"))
        .agg(min(col("lang")).as("lang"), sum(col("n")).as("n_tok"),
          sum(col("n") * col("lr_micro")).as("w_micro"))
        // rank on the per-token average log-ratio: the raw sum scales
        // with document length, so short off-target docs outrank long
        // on-target ones; normalizing removes the length confound
        .withColumn("w_per_tok",
          col("w_micro").cast(DoubleType) / col("n_tok").cast(DoubleType))
        .orderBy(col("w_per_tok").desc, col("doc_id"))
        .limit(DsirTopK)
        .select(col("doc_id"), col("lang"), col("n_tok"), col("w_micro"),
          col("w_per_tok")),
      grain)
  }

  val importanceResampleSql: String = {
    import graft.functions.TextFunctions.h60Sql
    s"""WITH grain AS (
       |  SELECT doc_id, lang, ${h60Sql("term")} % $DsirBuckets AS b,
       |         count(*) AS n
       |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
       |        FROM documents)
       |  GROUP BY 1, 2, 3),
       |tgt AS (
       |  SELECT b, CAST(sum(n) AS BIGINT) AS nt
       |  FROM grain WHERE lang = 'en' GROUP BY 1),
       |raw AS (SELECT b, CAST(sum(n) AS BIGINT) AS ns FROM grain GROUP BY 1),
       |tots AS (
       |  SELECT CAST(sum(CASE WHEN lang = 'en' THEN n END) AS BIGINT) AS tt,
       |         CAST(sum(n) AS BIGINT) AS ts
       |  FROM grain),
       |lr AS (
       |  SELECT raw.b,
       |         CAST(round((ln(CAST(COALESCE(nt, 0) + 1 AS DOUBLE)
       |             / CAST(tt + $DsirBuckets AS DOUBLE))
       |           - ln(CAST(ns + 1 AS DOUBLE)
       |             / CAST(ts + $DsirBuckets AS DOUBLE))) * 1e6) AS BIGINT)
       |           AS lr_micro
       |  FROM raw LEFT JOIN tgt ON raw.b = tgt.b, tots)
       |SELECT doc_id, lang, n_tok, w_micro,
       |       CAST(w_micro AS DOUBLE) / CAST(n_tok AS DOUBLE) AS w_per_tok
       |FROM (
       |  SELECT doc_id, min(lang) AS lang,
       |         CAST(sum(n) AS BIGINT) AS n_tok,
       |         CAST(sum(n * lr_micro) AS BIGINT) AS w_micro
       |  FROM grain JOIN lr USING (b)
       |  GROUP BY doc_id)
       |ORDER BY w_per_tok DESC, doc_id
       |LIMIT $DsirTopK""".stripMargin
  }

  // ---------------------------------------------------------------------
  // util_gdpr_purge: right-to-be-forgotten erasure accounting
  // ---------------------------------------------------------------------

  /** Erasure-request rate stand-in: 1-in-20 users (20-bit md5
    * threshold), the deterministic twin of an external request table.
    * Interpolated into BOTH engines. */
  private val PurgeModulus = 20L

  /** Right-to-be-forgotten pre-flight: before an erasure batch runs,
    * account exactly what it will remove — per event type, the rows
    * and exact value leaving, the rows staying, and the distinct
    * requesting users touched. The request list here is derived from
    * a deterministic hash so the oracle can rebuild it; in production
    * it is an external table with the same plan: requests semi-join
    * the fact table, never the reverse.
    *
    * Scale shape: ONE events pass; the request membership is a
    * broadcast hash join against the (bounded, distinct) request
    * list, the rollup is |types| groups map-side combined. The purge
    * itself is the same join with LeftAnti (asserted equivalent in
    * GdprPurgeSpec); at 100 TB both stay broadcast while the request
    * list fits (its size is regulator-bounded), else AQE picks the
    * shuffled semi-join with the same semantics. */
  /** The erasure-request list — ONE derivation shared by the
    * accounting query and the purge itself, so the two can never
    * drift on membership. */
  private def purgeRequests(ev: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.h60
    ev.select(col("user_id")).distinct()
      .filter(h60(col("user_id").cast(StringType)) % PurgeModulus === 0)
  }

  def gdprPurge(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val requests = purgeRequests(ev).withColumn("req", lit(1L))
    ev.join(broadcast(requests), Seq("user_id"), "left")
      .groupBy(col("event_type"))
      .agg(
        countIf(col("req").isNotNull).as("n_purged"),
        countIf(col("req").isNull).as("n_kept"),
        dsumIf(col("req").isNotNull, col("value")).as("purged_value"),
        count_distinct(when(col("req").isNotNull, col("user_id")))
          .as("n_purged_users"))
      .orderBy(col("event_type"))
  }

  val gdprPurgeSql: String = {
    import graft.functions.TextFunctions.h60Sql
    s"""WITH requests AS (
       |  SELECT DISTINCT user_id FROM events
       |  WHERE ${h60Sql("CAST(user_id AS VARCHAR)")} % $PurgeModulus = 0),
       |flagged AS (
       |  SELECT e.event_type, e.value, e.user_id,
       |         CASE WHEN r.user_id IS NOT NULL THEN 1 END AS req
       |  FROM events e LEFT JOIN requests r ON e.user_id = r.user_id)
       |SELECT event_type,
       |       count(CASE WHEN req IS NOT NULL THEN 1 END) AS n_purged,
       |       count(CASE WHEN req IS NULL THEN 1 END) AS n_kept,
       |       CAST(sum(CASE WHEN req IS NOT NULL
       |                     THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE)
       |         AS purged_value,
       |       count(DISTINCT CASE WHEN req IS NOT NULL THEN user_id END)
       |         AS n_purged_users
       |FROM flagged
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin
  }

  /** The purge itself: the same request list anti-joined away — the
    * action [[gdprPurge]] accounts for. Exposed for the spec. */
  private[graft] def gdprPurged(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    ev.join(broadcast(purgeRequests(ev)), Seq("user_id"), "left_anti")
  }

  // ---------------------------------------------------------------------
  // util_table_checksums: order-free content manifest for data contracts
  // ---------------------------------------------------------------------

  /** Content manifest: per table, the row count and an ORDER-FREE
    * int64 content checksum (XOR of per-row h60 over a canonical
    * string of ALL contract columns) — the cheap whole-table
    * fingerprint a producer publishes and a consumer re-derives to
    * prove a handoff was lossless, before anyone pays for the
    * row-level [[tableDiff]]. XOR folding is order-free, never
    * overflows at ANY row count, and is incrementally maintainable
    * (append a partition = XOR its partial in; delete = XOR it out);
    * its one blind spot — identical rows cancelling pairwise — is
    * closed by putting the unique key in the canonical string.
    *
    * Scale shape: one scan per table, map-side-combined fold — no
    * shuffle beyond the 1-row aggregates. Numeric columns ride as
    * exact cents/plain ints so the canonical string never sees a
    * float's engine-specific rendering, and both engines use
    * concat_ws (identical NULL-skipping — plain CONCAT would keep
    * the separator and diverge); the canonical contract columns are
    * non-nullable, which is what keeps NULL-skipping from colliding
    * two rows (the tableDiff discipline). */
  def tableChecksums(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.h60
    def manifest(table: String, canon: Column): DataFrame =
      Tables.load(spark, dir, table)
        .select(h60(canon).as("chk"))
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(chk)").as("checksum"))
        .select(lit(table).as("tbl"), col("n_rows"), col("checksum"))
    val events = manifest("events",
      concat_ws("|", col("event_id"), Tables.epochUs(col("ts")),
        col("user_id"), col("event_type"),
        round(col("value").cast(Tables.Money) * 100).cast(LongType),
        col("props")))
    val documents = manifest("documents",
      concat_ws("|", col("doc_id"), md5(col("text")), col("lang"),
        col("source"), col("n_chars")))
    val orders = manifest("orders",
      concat_ws("|", col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), Tables.epochUs(col("o_orderdate")),
        col("o_orderpriority"),
        round(col("o_totalprice").cast(Tables.Money) * 100).cast(LongType)))
    events.unionByName(documents).unionByName(orders)
      .orderBy(col("tbl"))
  }

  val tableChecksumsSql: String = {
    import graft.functions.TextFunctions.h60Sql
    def m(table: String, canon: String): String =
      s"""SELECT '$table' AS tbl, count(*) AS n_rows,
         |       CAST(bit_xor(${h60Sql(canon)}) AS BIGINT) AS checksum
         |FROM $table""".stripMargin
    Seq(
      m("events",
        """concat_ws('|', event_id, epoch_us(ts), user_id, event_type,
          |  CAST(round(CAST(value AS DECIMAL(28,6)) * 100) AS BIGINT), props)"""
          .stripMargin.replaceAll("\n\\s*", " ")),
      m("documents",
        "concat_ws('|', doc_id, md5(text), lang, source, n_chars)"),
      m("orders",
        """concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
          |  epoch_us(o_orderdate), o_orderpriority,
          |  CAST(round(CAST(o_totalprice AS DECIMAL(28,6)) * 100) AS BIGINT))"""
          .stripMargin.replaceAll("\n\\s*", " ")))
      .mkString("", "\nUNION ALL\n", "\nORDER BY tbl")
  }

  val all: Seq[(String, ((SparkSession, String) => DataFrame), String)] = Seq(
    ("util_column_profile", ordersProfile _, ordersProfileSql),
    ("util_importance_resample", importanceResample _, importanceResampleSql),
    ("util_gdpr_purge", gdprPurge _, gdprPurgeSql),
    ("util_table_checksums", tableChecksums _, tableChecksumsSql),
    ("util_hash_split", hashSplit _, hashSplitSql),
    ("util_stratified_sample", stratifiedSample _, stratifiedSampleSql),
    ("util_pseudonymize", pseudonymize _, pseudonymizeSql),
    ("util_skew_profile", skewProfile _, skewProfileSql),
    ("util_temperature_mix", temperatureMix _, temperatureMixSql),
    ("util_epoch_plan", epochPlan _, epochPlanSql),
    ("util_weighted_sample", weightedSample _, weightedSampleSql),
    ("util_domain_cap", domainCap _, domainCapSql),
    ("util_scd2_merge", scd2Merge _, scd2MergeSql),
    ("util_k_anonymity", kAnonymity _, kAnonymitySql),
    ("util_mix_kl", mixKl _, mixKlSql),
    ("util_ks_drift", ksDrift _, ksDriftSql),
    ("util_table_diff", tableDiff _, tableDiffSql),
    ("ev_user_cms", userCms _, null))
}
