package graft.queries

import scala.util.Random

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PerceptualSigImpl

/** Structural recall guarantee of the perceptual tile signature
  * (MultimodalQueries / PerceptualSigImpl): tile q's windows start at
  * character positions [⌊qL/4⌋, ⌊(q+1)L/4⌋), each reading at most
  * [[PerceptualSigImpl.Win]] characters forward — so a SAME-LENGTH
  * edit confined to a contiguous byte region perturbs only the tiles
  * whose window span intersects the region (the window bleed extends
  * a tile's span Win−1 characters past its end). Any region shorter
  * than one tile span can intersect at most 2 adjacent tile spans,
  * leaving ≥2 tiles BIT-IDENTICAL — candidacy via exact tile equality
  * is therefore guaranteed, independent of stride, vote margins, or
  * the hash. Pure-arithmetic property over the NATIVE kernel (which
  * MediaNearDupSpec proves bit-equal to the DataFrame/oracle
  * definition), randomized over lengths, edit positions, and edit
  * widths. */
class TileCandidacyPropertySpec extends AnyFunSuite {

  private def psig(s: String): Long =
    PerceptualSigImpl.psig(UTF8String.fromString(s))

  private def tiles(p: Long): Seq[Long] =
    (0 until PerceptualSigImpl.Tiles)
      .map(q => (p >>> (PerceptualSigImpl.TileBits * q)) &
        ((1L << PerceptualSigImpl.TileBits) - 1))

  /** Tiles whose window span [⌊qL/4⌋, ⌊(q+1)L/4⌋+Win−1) intersects
    * the edited region [from, until). */
  private def touched(len: Int, from: Int, until: Int): Set[Int] =
    (0 until PerceptualSigImpl.Tiles).filter { q =>
      val lo = len.toLong * q / PerceptualSigImpl.Tiles
      val hi = len.toLong * (q + 1) / PerceptualSigImpl.Tiles - 1 +
        (PerceptualSigImpl.Win - 1)
      from <= hi && until - 1 >= lo
    }.toSet

  test("a region-confined same-length edit leaves every untouched tile bit-identical") {
    val rnd = new Random(19)
    for (_ <- 1 to 500) {
      val len = 40 + rnd.nextInt(600)
      val base = Array.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString
      val width = 1 + rnd.nextInt(math.max(1, len / 4))
      val from = rnd.nextInt(len - width + 1)
      val edited = {
        val a = base.toCharArray
        (from until from + width).foreach(i =>
          a(i) = if (a(i) == 'z') 'y' else (a(i) + 1).toChar)
        new String(a)
      }
      val tA = tiles(psig(base))
      val tB = tiles(psig(edited))
      val t = touched(len, from, from + width)
      for (q <- 0 until PerceptualSigImpl.Tiles if !t.contains(q))
        assert(tA(q) == tB(q),
          s"untouched tile $q drifted (len=$len from=$from width=$width)")
      // an edit narrower than one tile span intersects <= 2 spans ->
      // >= 2 tiles stay identical -> the pair is ALWAYS a candidate
      if (width < len / PerceptualSigImpl.Tiles - PerceptualSigImpl.Win) {
        assert(t.size <= 2, s"len=$len from=$from width=$width touched=$t")
        assert(tA.zip(tB).count(p => p._1 == p._2) >= 2)
      }
    }
  }

  test("the shipped geometry tiles the 60-bit signature") {
    assert(PerceptualSigImpl.Tiles * PerceptualSigImpl.TileBits == 60)
    assert(PerceptualSigImpl.Win > PerceptualSigImpl.Stride)
  }
}
