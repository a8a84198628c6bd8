package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BloomProbe

/** ScalaCheck properties of the Bloom kernel behind `bloom_bits_agg` /
  * `bloom_might_contain` — the probe/update/merge arithmetic is pure
  * driver-side code, so the join-correctness-critical invariants get
  * hundreds of generated cases without a Spark session:
  *
  *  - NO FALSE NEGATIVES, ever: a dropped fact row would silently wrong
  *    the prefiltered join (false positives only cost a wasted row
  *    through the residual exact join);
  *  - merge (bitwise OR) ≡ sequential build, any split: the partial
  *    per-partition aggregation must converge on the single-partition
  *    blob whatever the row distribution;
  *  - serialization round-trips bits and hash count exactly.
  */
class BloomPropertiesSpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, s"$name: ${r.status}")
  }

  private val keysGen: Gen[List[Long]] =
    Gen.listOfN(64, Gen.chooseNum(Long.MinValue, Long.MaxValue))

  test("no false negatives for any key set") {
    check("no-false-negatives", Prop.forAll(keysGen) { keys =>
      val bits = new Array[Long](1024) // 64 Ki bits
      keys.foreach(k => BloomProbe.set(bits, k, 5))
      keys.forall(k => BloomProbe.contains(bits, k, 5))
    })
  }

  test("merged partial builds equal the sequential build for any split") {
    check("merge-assoc", Prop.forAll(keysGen, Gen.chooseNum(0, 64)) { (keys, cut0) =>
      val cut = math.min(cut0, keys.size)
      val whole = new Array[Long](256)
      keys.foreach(k => BloomProbe.set(whole, k, 5))
      val a = new Array[Long](256)
      val b = new Array[Long](256)
      keys.take(cut).foreach(k => BloomProbe.set(a, k, 5))
      keys.drop(cut).foreach(k => BloomProbe.set(b, k, 5))
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      java.util.Arrays.equals(a, whole)
    })
  }

  test("blob serialization round-trips bits and hash count") {
    check("serde", Prop.forAll(keysGen, Gen.chooseNum(1, 16)) { (keys, k) =>
      val bits = new Array[Long](128)
      keys.foreach(key => BloomProbe.set(bits, key, k))
      val blob = BloomProbe.serialize(k, bits)
      BloomProbe.deserializeHashes(blob) == k &&
        java.util.Arrays.equals(BloomProbe.deserializeBits(blob), bits)
    })
  }

  test("mix64 is a bijection on sampled inputs (distinct keys stay distinct)") {
    check("mix64-inj", Prop.forAll(keysGen) { keys =>
      keys.distinct.map(BloomProbe.mix64).distinct.size == keys.distinct.size
    })
  }
}
