package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariant checks for the round-3 extension operators (rollup,
  * dedup clusters, int8 quantization, stopword filter) — the oracle
  * hash-compare is the exactness gate; these pin the semantics. */
class ExtensionOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("ev_type_rollup levels are internally consistent") {
    val rows = EventsQueries.typeRollup(spark, dir).collect()
    val cells = rows.filter(_.getAs[Long]("gid") == 0L)
    val days = rows.filter(_.getAs[Long]("gid") == 1L)
    val total = rows.filter(_.getAs[Long]("gid") == 3L)
    assert(total.length == 1)
    // grand total row count == sum of day subtotals == sum of cells
    assert(total.head.getAs[Long]("n_events") ==
      days.map(_.getAs[Long]("n_events")).sum)
    assert(total.head.getAs[Long]("n_events") ==
      cells.map(_.getAs[Long]("n_events")).sum)
    // every day subtotal equals the sum of its cells
    val cellsByDay = cells.groupBy(_.getAs[String]("d"))
    days.foreach { d =>
      assert(d.getAs[Long]("n_events") ==
        cellsByDay(d.getAs[String]("d")).map(_.getAs[Long]("n_events")).sum)
    }
  }

  test("dedup_clusters is a valid components labeling of the pair graph") {
    val pairs = DedupQueries.minhashPairs(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val out = DedupQueries.clusters(spark, dir).collect()
    val label = out.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    // every near-dup pair ends up in one cluster
    pairs.foreach { case (a, b) => assert(label(a) == label(b)) }
    // the label is the component minimum and sizes/canonical agree
    val members = label.groupBy(_._2).view.mapValues(_.keys.toSet).toMap
    members.foreach { case (lbl, docs) => assert(lbl == docs.min) }
    out.foreach { r =>
      assert(r.getAs[Long]("cluster_size") ==
        members(r.getAs[Long]("cluster_id")).size)
      assert(r.getAs[Boolean]("is_canonical") ==
        (r.getAs[Long]("doc_id") == r.getAs[Long]("cluster_id")))
    }
    // labels cover exactly the docs that appear in some pair
    assert(label.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
  }

  test("dedup_semantic_clean attributions partition the corpus") {
    val rows = DedupQueries.semanticClean(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_semantic_dups") + r.getAs[Long]("n_kept") ==
        r.getAs[Long]("n_docs"), r.toString)
    }
    // dup count agrees with the distinct higher-id side of the pair query
    val nDups = DedupQueries.embeddingCosine(spark, dir)
      .select("vec_b").distinct().count()
    assert(rows.map(_.getAs[Long]("n_semantic_dups")).sum == nDups)
  }

  test("ev_business_kpis period bounds are parameters (Grafana timeFrom/To)") {
    val default = EventsQueries.businessKpis(spark, dir).collect().toSeq
    // the registered query IS the defaulted form (oracle unchanged)
    assert(default ==
      graft.SparkEntry.queries("ev_business_kpis")(spark, dir).collect().toSeq)
    // a different window must actually move the aggregates
    val shifted = EventsQueries
      .businessKpis(spark, dir, "2024-01-01", "2024-01-08", "2024-01-16")
      .collect().toSeq
    assert(shifted.head.getAs[Long]("cur_purchases") !=
      default.head.getAs[Long]("cur_purchases"))
  }

  test("emb_quantize is a faithful symmetric int8 code") {
    val out = SimilarityQueries.quantizeInt8(spark, dir)
      .select($"vec_id", $"max_abs", $"scale", $"qvec_csv", $"qvec_checksum")
      .collect()
    val embs = graft.util.Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val q = r.getAs[String]("qvec_csv").split(',').toSeq.map(_.toInt)
      // the emitted checksum is the position-weighted sum of the codes
      assert(r.getAs[Long]("qvec_checksum") ==
        q.zipWithIndex.map { case (x, i) => x.toLong * (i + 1) }.sum)
      val v = embs(r.getAs[Long]("vec_id")).map(_.toDouble)
      val scale = r.getAs[Double]("scale")
      assert(q.forall(x => math.abs(x) <= 127))
      // the max-|x| component quantizes to exactly +/-127
      assert(q.map(math.abs).max == 127)
      // dequantization error bounded by half a quantization step
      q.zip(v).foreach { case (qi, vi) =>
        assert(math.abs(qi / scale - vi) <= 0.5 / scale + 1e-12)
      }
    }
  }

  test("txt_quantiles_approx tracks the exact percentiles within sketch error") {
    def byKey(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[String]("source") -> r).toMap
    val exact = byKey(TextQueries.lenQuantiles(spark, dir))
    val approx = byKey(TextQueries.lenQuantilesApprox(spark, dir))
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (src, e) =>
      val a = approx(src)
      assert(a.getAs[Long]("n_docs") == e.getAs[Long]("n_docs"))
      assert(a.getAs[Long]("max_tokens") == e.getAs[Long]("max_tokens"))
      Seq("p25", "p50", "p75", "p99").foreach { q =>
        val ev = e.getAs[Double](q)
        val av = a.getAs[Long](q).toDouble // sketch returns a real sample
        // GK with accuracy 1000 on these group sizes: within 5% of exact
        assert(math.abs(av - ev) <= math.max(0.05 * ev, 2.0), s"$src.$q: $av vs $ev")
      }
    }
  }

  test("dedup_corpus_clean attributions are a partition of the corpus") {
    val rows = DedupQueries.corpusClean(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // every document is accounted for exactly once
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("n_low_quality") + r.getAs[Long]("n_dupes_removed") +
          r.getAs[Long]("n_kept"), r.toString)
      assert(r.getAs[Long]("kept_tokens") >= r.getAs[Long]("n_kept") * 16)
    }
    // total kept never exceeds distinct qualified content hashes
    val totalKept = rows.map(_.getAs[Long]("n_kept")).sum
    assert(totalKept > 0)
  }

  test("ann_int8_topk retains high recall against the exact float top-k") {
    def topSets(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topSets(SimilarityQueries.bruteTopK(spark, dir))
    val q8 = topSets(SimilarityQueries.int8TopK(spark, dir))
    assert(exact.keySet == q8.keySet)
    val recalls = exact.map { case (q, ex) =>
      (ex intersect q8(q)).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall@10 = $mean")
  }

  test("txt_stopword_filter agrees with an independent SQL recomputation") {
    val got = TextQueries.stopwordFilter(spark, dir)
      .select("doc_id", "n_tokens", "n_kept")
      .as[(Long, Long, Long)].collect().toSet
    graft.util.Tables.load(spark, dir, "documents")
      .createOrReplaceTempView("docs_sw")
    val expected = spark.sql(
      """SELECT doc_id,
        |  size(split(text, ' ')) AS n_tokens,
        |  size(filter(split(text, ' '),
        |    x -> NOT array_contains(array('join','hash','row','scan','filter'), x)
        |         AND length(x) >= 3)) AS n_kept
        |FROM docs_sw""".stripMargin)
      .as[(Long, Int, Int)].collect()
      .map(t => (t._1, t._2.toLong, t._3.toLong)).toSet
    assert(got == expected)
    assert(got.forall { case (_, n, k) => k <= n })
  }

  test("emb_kmeans_step output is a partition of the corpus with sane inertia") {
    val rows = SimilarityQueries.kmeansStep(spark, dir).collect()
    val corpus = graft.util.Tables.load(spark, dir, "embeddings").count()
    assert(rows.nonEmpty && rows.length <= 8)
    assert(rows.map(_.getAs[Long]("n_members")).sum == corpus)
    // every seed belongs to its own cluster (d2 = 0), so inertia is
    // finite and non-negative, and each listed cluster is non-empty
    assert(rows.forall(_.getAs[Long]("inertia_q") >= 0L))
    assert(rows.forall(_.getAs[Long]("n_members") >= 1L))
    assert(rows.forall(r => !r.getAs[Double]("centroid_norm").isNaN))
  }

  test("dedup_contamination flags only cross-split near-dups, one row per eval doc") {
    val rows = DedupQueries.contamination(spark, dir).collect()
    assert(rows.nonEmpty) // planted near-dups straddle the split at this SF
    val evalDocs = rows.map(_.getAs[Long]("eval_doc"))
    assert(evalDocs.distinct.length == evalDocs.length) // top-1 per eval doc
    assert(rows.forall(r => Set("valid", "test")(r.getAs[String]("split"))))
    assert(rows.forall { r =>
      val c = r.getAs[Double]("containment"); c >= 0.5 && c <= 1.0
    })
    // split labels agree with the util_hash_split assignment rule
    import graft.functions.TextFunctions.h60
    val splitOf = graft.util.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), pmod(h60(col("text")), lit(100L)).as("b"))
      .collect().map(r => r.getLong(0) ->
        (if (r.getLong(1) < 80) "train" else if (r.getLong(1) < 90) "valid" else "test"))
      .toMap
    assert(rows.forall(r =>
      splitOf(r.getAs[Long]("eval_doc")) == r.getAs[String]("split")))
    assert(rows.forall(r => splitOf(r.getAs[Long]("train_doc")) == "train"))
  }

  test("ev_retention_cohorts is a consistent retention matrix") {
    val rows = EventsQueries.retentionCohorts(spark, dir).collect()
    assert(rows.nonEmpty)
    // offset 0 is the cohort itself: full retention by definition
    rows.filter(_.getAs[Long]("week_offset") == 0L).foreach { r =>
      assert(r.getAs[Long]("n_active") == r.getAs[Long]("cohort_size"))
      assert(r.getAs[Double]("retention") == 1.0)
    }
    assert(rows.forall(r => r.getAs[Long]("week_offset") >= 0L))
    assert(rows.forall(r =>
      r.getAs[Long]("n_active") <= r.getAs[Long]("cohort_size")))
  }

  test("txt_pack_sequences conserves tokens and numbers windows densely") {
    val rows = TextQueries.packSequences(spark, dir).collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    // token conservation per source
    val totals = graft.util.Tables.load(spark, dir, "documents")
      .selectExpr("source", "size(split(text, ' ')) AS n")
      .groupBy("source").sum("n").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource.foreach { case (src, rs) =>
      assert(rs.map(_.getAs[Long]("seq_tokens")).sum == totals(src))
      // seq ids are dense from 0 (no empty windows emitted, ids sorted)
      val ids = rs.map(_.getAs[Long]("seq_id")).sorted
      assert(ids.head == 0L)
      assert(rs.forall(_.getAs[Long]("n_docs") >= 1L))
    }
  }

  test("emb_power_iteration emits a unit-ish direction over the full corpus") {
    val r = SimilarityQueries.powerIteration(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_vecs") ==
      graft.util.Tables.load(spark, dir, "embeddings").count())
    assert(row.getAs[Double]("anorm") > 0.0)
    Seq("v1_0", "v1_31", "v1_63").foreach { c =>
      val v = row.getAs[Double](c)
      assert(math.abs(v) <= 1.0 && !v.isNaN)
    }
  }

  test("emb_pca2 deflated direction is orthogonal to v1 and subdominant") {
    val r1 = SimilarityQueries.powerIteration(spark, dir).collect().head
    val r2 = SimilarityQueries.pca2(spark, dir).collect()
    assert(r2.length == 1)
    val row = r2.head
    assert(row.getAs[Long]("n_vecs") == r1.getAs[Long]("n_vecs"))
    // deflation removed the v1 component: the audit dot is ~0 (the
    // residual is one power step's float error, not a real component)
    assert(math.abs(row.getAs[Double]("v1_dot_v2")) < 1e-6,
      s"v1_dot_v2 = ${row.getAs[Double]("v1_dot_v2")}")
    // the residual direction carries strictly less energy than v1
    val a2 = row.getAs[Double]("anorm2")
    assert(a2 > 0.0 && a2 < r1.getAs[Double]("anorm"),
      s"anorm2 $a2 vs anorm ${r1.getAs[Double]("anorm")}")
    Seq("v2_0", "v2_31", "v2_63").foreach { c =>
      val v = row.getAs[Double](c)
      assert(math.abs(v) <= 1.0 && !v.isNaN)
    }
  }

  test("txt_bigram_logprob scores every multi-token doc with non-positive logprob") {
    val rows = TextQueries.bigramLogprob(spark, dir).collect()
    val expected = graft.util.Tables.load(spark, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(rows.length == expected)
    // probabilities <= 1 -> every per-doc sum of n*ln(p) is <= 0
    assert(rows.forall(_.getAs[Long]("score_micro") <= 0L))
    assert(rows.forall(_.getAs[Double]("avg_micro") <= 0.0))
    assert(rows.forall(_.getAs[Long]("n_bigrams") >= 1L))
  }

  /** Exact L2 top-10 per query (every 50th vec) — the shared recall
    * oracle for the PQ tests; computed once per suite run. */
  private lazy val exactL2Top10: Map[Long, Set[Long]] = {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val e = graft.util.Tables.load(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val n = e.select(col("vec_id").as("n_id"), col("embedding").as("nv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("d2"), col("n_id"))
    q.crossJoin(n).filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (expr("graft_norm2(qv)") + expr("graft_norm2(nv)") -
          lit(2.0) * expr("graft_dot(qv, nv)")).as("d2"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select("q_id", "n_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  /** Mean recall@10 of an ANN result (q_id, n_id) vs [[exactL2Top10]]. */
  private def meanRecall(df: org.apache.spark.sql.DataFrame): Double = {
    val got = df.select("q_id", "n_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(exactL2Top10.keySet == got.keySet)
    val r = exactL2Top10.map { case (qid, ex) =>
      (ex intersect got(qid)).size.toDouble / ex.size
    }
    r.sum / r.size
  }

  /** Seed-codebook recall, shared by both PQ tests (one pqTopK run). */
  private lazy val seedRecall: Double = {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    meanRecall(SimilarityQueries.pqTopK(spark, dir))
  }

  test("ann_pq_topk recalls most of the exact L2 top-k after re-rank") {
    // structure-free random vectors are the PQ worst case (distance
    // concentration); measured 0.82 with M=16, k=31, R=50
    assert(seedRecall >= 0.7, s"mean recall@10 = $seedRecall")
  }

  test("ann_pq_learned: trained codebooks beat the seed-codebook recall") {
    val seed = seedRecall
    val learned = meanRecall(SimilarityQueries.pqLearnedTopK(spark, dir))
    info(s"recall@10: seed=$seed learned=$learned")
    // the whole point of training: Lloyd's-refined per-subspace
    // codebooks must beat the deterministic seed vectors (measured:
    // seed 0.82 -> learned 0.89 at this SF)
    assert(learned > seed, s"learned=$learned !> seed=$seed")
    assert(learned >= 0.85, s"learned recall@10 = $learned")
  }

  test("util_pseudonymize audit partitions the events and flags k-anonymity") {
    val rows = ProfileQueries.pseudonymize(spark, dir).collect()
    val total = graft.util.Tables.load(spark, dir, "events").count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total)
    rows.foreach { r =>
      val nUsers = r.getAs[Long]("n_users")
      assert(nUsers >= 1L && nUsers <= r.getAs[Long]("n_events"))
      assert(r.getAs[Boolean]("k_ok") == (nUsers >= 5L))
      // sha256 hex: 64 lowercase hex chars, never a raw id
      val p = r.getAs[String]("pseudo_sample")
      assert(p.matches("[0-9a-f]{64}"), p)
    }
    // stable pseudonyms: a second run produces the identical audit
    val again = ProfileQueries.pseudonymize(spark, dir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("ev_user_cms estimates respect the count-min overcount bound") {
    val ev = graft.util.Tables.load(spark, dir, "events")
    val n = ev.count()
    val nKeys = ev.select("user_id").distinct().count()
    val rows = ProfileQueries.userCms(spark, dir).collect()
    assert(rows.length == math.min(20L, nKeys))
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_n")
      val est = r.getAs[Long]("cms_n")
      // CMS never undercounts; overcount <= eps*N (w.h.p.), eps=0.001
      assert(est >= exact, s"undercount: $est < $exact")
      assert(est - exact <= math.max(1L, (0.001 * n).toLong),
        s"overcount ${est - exact} beyond eps*N")
    }
    // the estimates are computed by the MAP-SIDE expression, not a
    // driver loop: the plan carries graft_cms_est (inside the final
    // top-k project — the executed TakeOrderedAndProject elides its
    // project list in toString, so pin the optimized logical plan)
    // and the only driver-side artifact is the final collected top-k
    val p = ProfileQueries.userCms(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(p.contains("graft_cms_est"), p)
    // a driver-computed estimate column would reach the plan as a
    // LocalRelation of pre-built rows — it must not
    assert(!p.contains("LocalRelation"), p)
  }

  test("util_skew_profile shares are consistent and ranked") {
    val nKeys = graft.util.Tables.load(spark, dir, "events")
      .select("user_id").distinct().count()
    val rows = ProfileQueries.skewProfile(spark, dir).collect()
    assert(rows.length == math.min(20L, nKeys))
    // ranked by weight, shares in (0, 100], x_mean positive
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n_rows") >= b.getAs[Long]("n_rows"))
      case _ => ()
    }
    rows.foreach { r =>
      val s = r.getAs[Double]("share_pct")
      assert(s > 0.0 && s <= 100.0)
      assert(r.getAs[Double]("x_mean") > 0.0)
    }
  }

  test("ev_funnel_sequences matches a driver-side brute-force chain count") {
    val got = EventsQueries.funnelSequences(spark, dir)
      .select("user_id", "n_view_click", "n_full_chain")
      .as[(Long, Long, Long)].collect()
      .map { case (u, vc, fc) => u -> (vc, fc) }.toMap
    val events = graft.util.Tables.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val expected = events.groupBy(_._1).map { case (u, evs) =>
      val types = evs.sortBy(e => (e._2, e._3)).map(_._4)
      val vc = types.sliding(2).count(w =>
        w.length == 2 && w(0) == "view" && w(1) == "click")
      val fc = types.sliding(3).count(w =>
        w.length == 3 && w(0) == "view" && w(1) == "click" &&
          w(2) == "purchase")
      u -> (vc.toLong, fc.toLong)
    }
    assert(got == expected)
    // the data actually exercises both chain lengths
    assert(got.values.map(_._1).sum > 0L)
  }

  test("txt_quality_gate attributions partition the corpus, all reasons fire") {
    val rows = TextQueries.qualityGate(spark, dir).collect()
    val corpus = graft.util.Tables.load(spark, dir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == corpus)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("n_short") + r.getAs[Long]("n_low_ttr") +
          r.getAs[Long]("n_stoppy") + r.getAs[Long]("n_kept"), r.toString)
    }
    // thresholds are calibrated so every gate actually fires corpus-wide
    for (c <- Seq("n_short", "n_low_ttr", "n_stoppy", "n_kept"))
      assert(rows.map(_.getAs[Long](c)).sum > 0L, c)
    // kept docs carry the token budget
    assert(rows.map(_.getAs[Long]("kept_tokens")).sum >
      rows.map(_.getAs[Long]("n_kept")).sum * 16)
  }

  test("util_temperature_mix weights normalize and upweight small sources") {
    val rows = ProfileQueries.temperatureMix(spark, dir).collect()
    assert(rows.length > 1)
    val wsum = rows.map(_.getAs[Double]("mix_weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-9, s"weights sum to $wsum")
    val esum = rows.map(_.getAs[Double]("expected_tokens")).sum
    assert(math.abs(esum - 1000000.0) < 1e-3)
    // temperature < 1 exponent: smaller sources get MORE than their
    // proportional share, so oversample factors decrease with size
    val bySize = rows.sortBy(_.getAs[Long]("n_tokens"))
    bySize.sliding(2).foreach {
      case Array(small, big) =>
        assert(small.getAs[Double]("oversample_factor") >=
          big.getAs[Double]("oversample_factor"))
      case _ => ()
    }
  }

  test("txt_length_deciles covers the corpus with non-overlapping bins") {
    val rows = TextQueries.lengthDeciles(spark, dir).collect()
      .sortBy(_.getAs[Long]("decile"))
    val corpus = graft.util.Tables.load(spark, dir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == corpus)
    assert(rows.forall { r =>
      val d = r.getAs[Long]("decile"); d >= 1L && d <= 10L
    })
    // bins are ordered and disjoint: each decile's max length is below
    // the next decile's min length
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("max_chars") < b.getAs[Long]("min_chars"))
      case _ => ()
    }
  }
}
