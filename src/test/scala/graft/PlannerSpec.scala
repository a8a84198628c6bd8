package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.plan.{Analyzer, PartitionStrategy, PlanConfig}

/** Planner-golden tests — the ScalaTest analog of the reference's NUnit
  * planner suite (`tests/Heap.cs`, `tests/ClusteredRowstore.cs`,
  * `tests/ClusteredColumnstore.cs`, `tests/Issues.cs`, `tests/Misc.cs`):
  * assert work-item type, count, and order-hint shape per storage
  * topology, plus the auto-partitioning invariants the reference only
  * documents.
  */
class PlannerSpec extends AnyFunSuite {

  private val conf = PlanConfig() // tasks=7, batch=100000, auto

  // deterministic property-style sampling (scalatestplus bridge is not in
  // the offline cache; a seeded generator gives the same coverage)
  private val rng = new scala.util.Random(42)

  private def heap(rows: Long, gb: Double, parts: Int = 1) = TableMeta(
    "dbo", "t", Storage.Heap, rowCount = rows,
    sizeBytes = (gb * 1024 * 1024 * 1024).toLong,
    partitionCol = if (parts > 1) Some("pcol") else None, partitionCount = parts)

  // --- reference golden: big heap → 9 logical slices (tests/Heap.cs:34:
  // 8.8 GB LINEITEM, auto ⇒ ceil(8.8)=9, odd) ---------------------------
  test("big unpartitioned heap plans 9 logical slices") {
    val src = heap(59986052L, 8.8)
    val items = Analyzer.plan(src, heap(0, 0), conf)
    assert(items.size == 9)
    assert(items.forall(_.slice.isInstanceOf[SliceSpec.Logical]))
    val idx = items.map(_.slice.asInstanceOf[SliceSpec.Logical].index)
    assert(idx.sorted == (0 until 9))
  }

  // --- reference golden: physically partitioned source → one item per
  // partition (tests/Heap.cs:47: 85 partitions) -------------------------
  test("partitioned heap fans out one work item per physical partition") {
    val src = heap(59986052L, 8.8, parts = 85)
    val items = Analyzer.plan(src, heap(0, 0), conf)
    assert(items.size == 85)
    assert(items.map(_.slice).distinct.size == 85)
    assert(items.forall(_.slice.isInstanceOf[SliceSpec.Physical]))
  }

  // --- reference golden: big columnstore → 3 slices
  // (tests/ClusteredColumnstore.cs:34) ----------------------------------
  test("big columnstore destination allows parallel logical slices") {
    val src = TableMeta("dbo", "t", Storage.ClusteredColumnstore,
      rowCount = 59986052L, sizeBytes = (2.5 * 1024 * 1024 * 1024).toLong)
    val dst = src.copy(rowCount = 0, sizeBytes = 0)
    val items = Analyzer.plan(src, dst, conf)
    assert(items.size == 3) // ceil(2.5)=3, odd already
  }

  // --- reference golden: identical clustered keys → ordered scan with
  // mixed asc/desc preserved (tests/Issues.cs:22-37) --------------------
  test("order hint carries per-column direction when keys match") {
    val keys = Seq(SortKey("a"), SortKey("b", descending = true))
    val src = TableMeta("dbo", "t", Storage.ClusteredRowstore,
      sortKeys = keys, rowCount = 100, sizeBytes = 100)
    val dst = src
    assert(Analyzer.orderHint(src, dst) == keys)
    // computed key columns are excluded from the hint (Issues.cs regression)
    val withComputed = keys :+ SortKey("c", isComputed = true)
    assert(Analyzer.orderHint(src.copy(sortKeys = withComputed),
      dst.copy(sortKeys = withComputed)) == keys)
  }

  test("partitioned heap destination hints the partition key only") {
    val src = heap(100, 0.1)
    val dst = heap(0, 0, parts = 11)
    assert(Analyzer.orderHint(src, dst) == Seq(SortKey("pcol")))
  }

  test("non-positive partition strategies are unconstructible") {
    // Count(0) would plan a silent no-copy, SizeGb(0) divides the
    // planner to the maximum fan-out — both must throw at construction,
    // not misplan downstream
    intercept[IllegalArgumentException] { PartitionStrategy.Count(0) }
    intercept[IllegalArgumentException] { PartitionStrategy.Count(-3) }
    intercept[IllegalArgumentException] { PartitionStrategy.SizeGb(0.0) }
    intercept[IllegalArgumentException] { PartitionStrategy.SizeGb(-1.0) }
  }

  test("Logical.describe renders the exact predicate SqlGen emits") {
    // the human-readable slice description must be the REAL left-nested
    // 31-fold ((a*31+b)*31+c), not the flat a*31+b*31+c a naive render
    // would produce — anyone pasting it into SQL to reproduce a slice
    // must select the same rows the executor did
    for (keys <- Seq(Seq("a"), Seq("a", "b"), Seq("a", "b", "c"))) {
      val slice = SliceSpec.Logical(keys, 7, 3)
      assert("WHERE " + slice.describe ==
        graft.exec.SqlGen.whereClause(slice, keys),
        s"describe drifted from the generated SQL for $keys")
    }
  }

  // --- reference outcome tests (tests/Misc.cs:14-38) -------------------
  test("destination abort gates") {
    val src = heap(100, 0.1)
    assert(Analyzer.analyze(src, src.copy(foreignKeyCount = 1), conf) ==
      AnalysisOutcome.ForeignKeysFoundOnDestination)
    assert(Analyzer.analyze(src, src.copy(secondaryIndexCount = 2), conf) ==
      AnalysisOutcome.SecondaryIndexFoundOnDestination)
    assert(Analyzer.analyze(src,
      src.copy(history = Some(HistoryInfo("h", "s", "e", -1))), conf) ==
      AnalysisOutcome.TemporalTableOnDestination)
  }

  test("stop-if flags off let the copy proceed past the gate (FKs still abort)") {
    val src = heap(100, 0.1)
    val relaxed = conf.copy(stopIfSecondaryIndex = false, stopIfTemporalTable = false)
    assert(Analyzer.analyze(src, src.copy(secondaryIndexCount = 2), relaxed)
      .isInstanceOf[AnalysisOutcome.Success])
    assert(Analyzer.analyze(src,
      src.copy(history = Some(HistoryInfo("h", "s", "e", -1))), relaxed)
      .isInstanceOf[AnalysisOutcome.Success])
    // FK abort is unconditional in the reference — no flag disables it
    assert(Analyzer.analyze(src, src.copy(foreignKeyCount = 1), relaxed) ==
      AnalysisOutcome.ForeignKeysFoundOnDestination)
  }

  // --- small-table bypass (TableAnalyzer.cs:181,212-214) ---------------
  test("small table bypasses partitioning") {
    val items = Analyzer.plan(heap(1000, 0.001), heap(0, 0), conf)
    assert(items == Seq(WorkItem(heap(1000, 0.001), SliceSpec.Whole, Nil)))
  }

  // --- serial fallback: non-heap/columnstore dest, different layout ----
  test("mismatched rowstore destination forces a single serial scan") {
    val src = TableMeta("dbo", "t", Storage.ClusteredRowstore,
      sortKeys = Seq(SortKey("a")), rowCount = 10000000L,
      sizeBytes = 5L * 1024 * 1024 * 1024)
    val dst = src.copy(sortKeys = Seq(SortKey("b")))
    val items = Analyzer.plan(src, dst, conf)
    assert(items.size == 1 && items.head.slice == SliceSpec.Whole)
  }

  // --- property: auto partition count is odd, ≥1, ≈≤ cap
  // (TableAnalyzer.cs:248-270 odd-rounding + clamps) --------------------
  test("logical partition count: odd, bounded, monotone strategies") {
    for (_ <- 1 to 500) {
      val bytes = math.abs(rng.nextLong()) % (200L * 1024 * 1024 * 1024)
      val rows = math.abs(rng.nextLong()) % 1000000000L
      val t = TableMeta("d", "t", Storage.Heap, rowCount = rows, sizeBytes = bytes)
      val n = Analyzer.logicalPartitionCount(t, conf)
      assert(n % 2 == 1, s"bytes=$bytes rows=$rows -> $n not odd")
      assert(n >= 1 && n <= conf.maxLogicalPartitions + 1)
    }
    for (c <- 1 to 128) {
      val t = TableMeta("d", "t", Storage.Heap, rowCount = 1, sizeBytes = 1)
      val n = Analyzer.logicalPartitionCount(t,
        conf.copy(strategy = PartitionStrategy.Count(c)))
      assert(n == (if (c % 2 == 0) c + 1 else c))
    }
  }

  // --- property: pmod slicing is disjoint and exhaustive (the contract
  // %%PhysLoc%% slicing rests on, README.md:58-74) ----------------------
  test("hash-mod slices are disjoint and exhaustive over any key set") {
    for (_ <- 1 to 200) {
      val n = 2 + rng.nextInt(63)
      val keys = List.fill(1 + rng.nextInt(100))(rng.nextLong())
        .filter(_ != Long.MinValue)
      val assigned = keys.map(k => math.floorMod(math.abs(k), n))
      assert(assigned.forall(i => i >= 0 && i < n)) // every row in exactly one slice
    }
  }

}
