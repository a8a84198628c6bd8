package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.plan.{Analyzer, PartitionStrategy, PlanConfig}

/** ScalaCheck properties for the planning invariants the reference only
  * documents (SURVEY.md §5): hash-mod slices are disjoint and exhaustive
  * over ANY key distribution, and the auto partition-count strategy is
  * odd, bounded, and monotone in table size. Pure driver logic — no
  * Spark session needed, hundreds of cases per property.
  */
class SlicePropertiesSpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, s"$name: ${r.status}")
  }

  // the portable slice-key arithmetic (Scans.sliceKeyPortable) as plain
  // Scala: key = fold(a*31 + b), slice = floorMod(key, n)
  private def sliceOf(keys: Seq[Long], n: Int): Int =
    java.lang.Math.floorMod(keys.reduce((a, b) => a * 31 + b), n.toLong).toInt

  test("hash-mod slices are disjoint and exhaustive for any keys and any N") {
    check("disjoint+exhaustive", Prop.forAll(
      Gen.nonEmptyListOf(Gen.listOfN(2,
        Gen.chooseNum(Long.MinValue / 64, Long.MaxValue / 64))),
      Gen.chooseNum(1, 64)) { (rows, n) =>
      val assigned = rows.map(r => sliceOf(r, n))
      val histogram = assigned.groupBy(identity).view.mapValues(_.size)
      assigned.forall(s => s >= 0 && s < n) &&
        histogram.values.sum == rows.size
    })
  }

  test("slice assignment is deterministic (same key -> same slice)") {
    check("deterministic", Prop.forAll(
      Gen.listOfN(2, Gen.chooseNum(-1000000L, 1000000L)),
      Gen.chooseNum(1, 128)) { (keys, n) =>
      sliceOf(keys, n) == sliceOf(keys, n)
    })
  }

  private def meta(sizeGb: Double, rows: Long) = TableMeta(
    "main", "t", Storage.Heap, rowCount = rows,
    sizeBytes = (sizeGb * 1024 * 1024 * 1024).toLong)

  test("auto partition count is odd, within [3, 3*tasks] pre-cap, capped") {
    check("auto-bounds", Prop.forAll(
      Gen.chooseNum(0.0, 512.0), Gen.chooseNum(0L, 100000000L),
      Gen.chooseNum(1, 32)) { (gb, rows, tasks) =>
      val conf = PlanConfig(tasks = tasks)
      val n = Analyzer.logicalPartitionCount(meta(gb, rows), conf)
      n % 2 == 1 && n >= 3 &&
        n <= math.min(3 * tasks + 1, conf.maxLogicalPartitions + 1)
    })
  }

  test("auto partition count is monotone in table size") {
    check("auto-monotone", Prop.forAll(
      Gen.chooseNum(1.0, 200.0), Gen.chooseNum(1.0, 200.0)) { (a, b) =>
      val conf = PlanConfig()
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      Analyzer.logicalPartitionCount(meta(lo, 0), conf) <=
        Analyzer.logicalPartitionCount(meta(hi, 0), conf)
    })
  }

  test("count strategy respects the odd-rounding and the cap") {
    check("count-odd-cap", Prop.forAll(Gen.chooseNum(1, 1000)) { n =>
      val conf = PlanConfig(strategy = PartitionStrategy.Count(n))
      val c = Analyzer.logicalPartitionCount(meta(10, 1000), conf)
      c % 2 == 1 && c <= conf.maxLogicalPartitions + 1
    })
  }
}
