package graft.queries

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Pigeonhole guarantee of the parametric SimHash banding
  * (DedupQueries.simhashPairs): with b chunks of w bits tiling the
  * 60-bit signature, any pair at Hamming distance <= b-1 differs in at
  * most b-1 chunks and therefore SHARES at least one — so the
  * chunk-equality candidate join has provably complete recall at any
  * radius <= b-1. Pure-arithmetic property (no Spark): the same chunk
  * extraction `(sig >> w*j) % 2^w` is interpolated into both the
  * DataFrame code and the DuckDB oracle, so proving the arithmetic
  * proves both engines. */
class SimhashBandingPropertySpec extends AnyFunSuite {

  /** All banding configs that tile 60 bits with a usable radius. */
  private val configs = Seq(2 -> 30, 3 -> 20, 4 -> 15, 5 -> 12, 6 -> 10)

  private def chunks(sig: Long, bands: Int, width: Int): Seq[Long] =
    (0 until bands).map(j => (sig >>> (width * j)) % (1L << width))

  test("the shipped config is a valid tiling with radius <= bands-1") {
    assert(DedupQueries.SimhashBands * DedupQueries.SimhashWidth == 60)
    assert(DedupQueries.SimhashRadius <= DedupQueries.SimhashBands - 1)
  }

  test("Hamming <= bands-1 pairs always share a chunk (all tilings)") {
    val rnd = new Random(42)
    for ((bands, width) <- configs; _ <- 1 to 2000) {
      val sig = rnd.nextLong() & ((1L << 60) - 1)
      val k = rnd.nextInt(bands) // 0 to bands-1 flips
      val flips = rnd.shuffle((0 until 60).toList).take(k)
      val other = flips.foldLeft(sig)((s, p) => s ^ (1L << p))
      assert(java.lang.Long.bitCount(sig ^ other) <= bands - 1)
      assert(
        chunks(sig, bands, width).zip(chunks(other, bands, width))
          .exists { case (a, b) => a == b },
        s"no shared chunk at bands=$bands width=$width flips=$flips")
    }
  }

  test("the bound is tight: hamming == bands can miss every chunk") {
    for ((bands, width) <- configs) {
      // flip one bit in every chunk: hamming = bands, zero shared chunks
      val sig = 0L
      val other = (0 until bands).map(j => 1L << (width * j)).sum
      assert(java.lang.Long.bitCount(sig ^ other) == bands)
      assert(!chunks(sig, bands, width).zip(chunks(other, bands, width))
        .exists { case (a, b) => a == b })
    }
  }

  test("radius wider than bands-1 loses recall (witness pair)") {
    // the same witness shows why SimhashRadius must not exceed bands-1:
    // a pair at hamming bands <= old radius would silently vanish from
    // the candidate set
    val b = DedupQueries.SimhashBands
    val w = DedupQueries.SimhashWidth
    val other = (0 until b).map(j => 1L << (w * j)).sum
    assert(java.lang.Long.bitCount(other) == b)
    assert(b > DedupQueries.SimhashRadius)
    assert(!chunks(0L, b, w).zip(chunks(other, b, w)).exists(p => p._1 == p._2))
  }
}
