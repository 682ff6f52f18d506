package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MEASURED recall for the banded cosine-LSH dedup — the check the
  * per-plane bound in the docstring cannot substitute for.
  *
  * Fixture: 200 random unit-ish base vectors plus planted near-dup
  * twins at controlled cosines (0.95 and 0.88 — where near-dups live)
  * and a band of decoys near the 0.4 verify floor. Ground truth is the
  * exact all-pairs cosine join computed in-process. Asserts:
  *
  *  1. zero false positives (every reported pair is a true >= 0.4 pair
  *     — the exact verify guarantees this regardless of the blocking);
  *  2. per-tier recall floors consistent with the OR-construction's
  *     1-(1-(1-theta/pi)^W)^B catch probability (0.95 tier ~ 0.95
  *     expected, assert >= 0.80; 0.88 tier ~ 0.83 expected, assert
  *     >= 0.65);
  *  3. the banded index strictly beats the single AND-only 8-plane
  *     table it replaced, measured on the same data — the round-8
  *     design's ~2.5%-at-the-floor weakness, quantified.
  */
class CosineLshRecallSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64

  private def unit(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  /** A vector at exactly `cos` cosine from v: cos*v + sin*u with u a
    * unit vector orthogonal to v (Gram-Schmidt on a random draw). */
  private def planted(rnd: scala.util.Random, v: Array[Double],
      cos: Double): Array[Double] = {
    val raw = Array.fill(Dim)(rnd.nextGaussian())
    val d = raw.zip(v).map { case (a, b) => a * b }.sum
    val u = unit(raw.zip(v).map { case (a, b) => a - d * b })
    val s = math.sqrt(1.0 - cos * cos)
    v.zip(u).map { case (a, b) => cos * a + s * b }
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    dot / math.sqrt(na * nb)
  }

  test("banded LSH recall per cosine tier; strictly beats the AND-only table") {
    val rnd = new scala.util.Random(42)
    val bases = Array.fill(200)(unit(Array.fill(Dim)(rnd.nextGaussian())))
    // planted twins: ids 1000+i at cosine 0.95 of base i (i < 70),
    // ids 2000+i at cosine 0.88 (70 <= i < 140), ids 3000+i at 0.45
    // (140 <= i < 170, the verify-floor decoys)
    val rows = Seq.newBuilder[(Long, Array[Float])]
    bases.zipWithIndex.foreach { case (v, i) =>
      rows += ((i.toLong, v.map(_.toFloat)))
      if (i < 70) rows += ((1000L + i, planted(rnd, v, 0.95).map(_.toFloat)))
      else if (i < 140) rows += ((2000L + i, planted(rnd, v, 0.88).map(_.toFloat)))
      else if (i < 170) rows += ((3000L + i, planted(rnd, v, 0.45).map(_.toFloat)))
    }
    val all = rows.result()
    val dir = tmpDir("graft-lsh-recall")
    writeFixture(dir, "embeddings",
      all.map { case (id, e) => (id, e, 0) }.toDF("vec_id", "embedding", "label"))

    // exact all-pairs ground truth (in-process; 340^2/2 pairs)
    val truth = (for {
      i <- all.indices; j <- (i + 1) until all.length
      (ia, ea) = all(i); (ib, eb) = all(j)
      c = cosine(ea, eb) if c >= 0.4
    } yield {
      val (lo, hi) = if (ia < ib) (ia, ib) else (ib, ia)
      ((lo, hi), c)
    }).toMap

    val found = DedupQueries.cosineLsh(spark, dir.toString).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet

    // 1. exact verify -> no false positives, ever
    assert(found.forall(truth.contains),
      s"false positives: ${found.filterNot(truth.contains).take(5)}")

    def recall(lo: Double, hi: Double): (Double, Int) = {
      val tier = truth.collect { case (p, c) if c >= lo && c < hi => p }.toSet
      (if (tier.isEmpty) 1.0 else
        tier.count(found).toDouble / tier.size, tier.size)
    }
    // 2. recall floors where near-dups live
    val (r95, n95) = recall(0.93, 1.01)
    val (r88, n88) = recall(0.85, 0.93)
    val (rFloor, nFloor) = recall(0.40, 0.60)
    assert(n95 >= 70 && n88 >= 70, s"fixture broken: $n95/$n88 tier pairs")
    assert(r95 >= 0.80, s"recall at cosine~0.95: $r95 ($n95 pairs)")
    assert(r88 >= 0.65, s"recall at cosine~0.88: $r88 ($n88 pairs)")

    // 3. the replaced single 8-plane AND table, on the same corpus:
    // candidate iff ALL 8 signs agree (one bucket), then exact verify
    val byId = graft.util.Tables.load(spark, dir.toString, "embeddings")
      .withColumn("bucket", SimilarityQueries.bucketCode(8))
      .select(col("vec_id"), col("bucket")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val andOnly = truth.keysIterator
      .filter { case (a, b) => byId(a) == byId(b) }.toSet
    val bandedAll = truth.keysIterator.count(found)
    assert(bandedAll > andOnly.size,
      s"banding did not beat AND-only: $bandedAll vs ${andOnly.size}")
    info(f"recall cosine~0.95: $r95%.2f ($n95 pairs), " +
      f"~0.88: $r88%.2f ($n88 pairs), floor [0.4,0.6): $rFloor%.2f " +
      f"($nFloor pairs); banded ${bandedAll}/${truth.size} vs " +
      s"AND-only ${andOnly.size}/${truth.size}")
  }
}
