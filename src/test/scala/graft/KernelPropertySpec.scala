package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.catalyst.util.GenericArrayData

import graft.ext.{SimHashSig, SimHashTables}

/** Randomized properties for the bit-twiddling kernels — pure JVM, no
  * Spark session. The fixed-vector pins in ExtSpec catch emit typos; these
  * catch the MATH: the two-level pigeonhole recall theorem x07's exactness
  * rests on is checked against adversarially-flipped signatures, and the
  * key/signature layouts are recomputed by deliberately different
  * constructions (bit arrays, not shift arithmetic) so a shared systematic
  * error cannot cancel out.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(500)
        .withInitialSeed(org.scalacheck.rng.Seed(0xC0FFEE_5EEDL)), p)
    assert(res.passed, s"$name: $res")
  }

  private def keysOf(sig: Long): Set[Long] = {
    val a = SimHashTables.tables(sig)
    (0 until a.numElements()).map(a.getLong).toSet
  }

  test("pigeonhole recall: any pair within Hamming 7 shares a bucket key") {
    // THE theorem x07's exact recall rests on. b is a copy of a with
    // 0..7 distinct random bits flipped — including the adversarial edges
    // (flips clustered in one byte, spread across all, touching bits
    // 0/63). If the splice in tables() dropped or duplicated a bit, some
    // flip pattern here would find a qualifying pair with no shared key.
    val gen = for {
      a <- Gen.long
      n <- Gen.choose(0, 7)
      bits <- Gen.pick(n, 0 until 64)
    } yield (a, bits.foldLeft(a)((s, b) => s ^ (1L << b)))
    check("pigeonhole", Prop.forAll(gen) { case (a, b) =>
      keysOf(a).intersect(keysOf(b)).nonEmpty
    })
  }

  test("simhash_tables layout == an independent bit-array construction") {
    // rebuild each key from a boolean-array rendering of the signature —
    // no shifts, no masks — so the production shift arithmetic is checked
    // against a structurally different computation
    def reference(sig: Long): IndexedSeq[Long] = {
      val bits = Array.tabulate(64)(i => (sig >>> i & 1L) == 1L)
      for { j <- 0 until 8; k <- 0 until 8 } yield {
        val chunk = (0 until 8).foldLeft(0L)((acc, i) =>
          acc | (if (bits(j * 8 + i)) 1L << i else 0L))
        val rem = bits.indices.filterNot(i => i / 8 == j).map(bits)
        val sub = (0 until 7).foldLeft(0L)((acc, i) =>
          acc | (if (rem(k * 7 + i)) 1L << i else 0L))
        ((j * 8 + k).toLong << 15) | (chunk << 7) | sub
      }
    }
    check("layout", Prop.forAll(Gen.long) { sig =>
      val a = SimHashTables.tables(sig)
      (0 until 64).forall(i => a.getLong(i) == reference(sig)(i))
    })
  }

  test("simhash_sig == an independent majority-vote reference") {
    val gen = Gen.nonEmptyListOf(Gen.long)
    check("sig", Prop.forAll(gen) { hs =>
      val expected = (0 until 64).foldLeft(0L) { (acc, i) =>
        val ones = hs.count(h => (h >>> i & 1L) == 1L)
        if (2 * ones >= hs.length) acc | (1L << i) else acc
      }
      SimHashSig.sig(new GenericArrayData(hs.toArray)) == expected
    })
  }

  test("cuts_bucket binary search == the linear count, any sorted cuts") {
    // the kernel's upper-bound search against the definitional linear
    // scan "count of cuts ≤ v", over random cut sets (duplicates allowed
    // pre-sort — the operator dedups, but the search must be right even
    // on plateaus), values inside/outside/at every cut, and ±∞
    val gen = for {
      raw <- Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6))
      cuts = raw.distinct.sorted
      v <- Gen.oneOf(
        Gen.choose(-2e6, 2e6),
        Gen.oneOf(cuts), // exact tie on a cut
        Gen.const(Double.NegativeInfinity),
        Gen.const(Double.PositiveInfinity))
    } yield (cuts, v)
    check("cuts_bucket", Prop.forAll(gen) { case (cuts, v) =>
      graft.ext.CutsBucket.bucket(v,
        new GenericArrayData(cuts.toArray)) == cuts.count(_ <= v)
    })
  }
}
