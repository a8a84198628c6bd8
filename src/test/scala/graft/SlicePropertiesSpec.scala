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

  // --- ordered include/exclude table-list fold (SmartBulkCopy.cs:870-904) ---

  private val nameGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "a1", "a2")
  private val patternGen: Gen[String] = Gen.oneOf(
    nameGen,                        // literal include
    nameGen.map("+:" + _),          // explicit include
    nameGen.map("-:" + _),          // literal exclude
    Gen.oneOf("*", "a*", "-:*", "-:a*", "+:*")) // wildcards

  test("table-list fold: output is distinct and only from catalog or literal adds") {
    val catalog = Seq("alpha", "beta", "gamma", "a1", "a2")
    check("fold-soundness", Prop.forAll(Gen.listOf(patternGen)) { pats =>
      val out = graft.exec.Pipeline.expandTableList(pats, catalog)
      val literalAdds = pats.filterNot(_.startsWith("-:"))
        .map(p => if (p.startsWith("+:")) p.drop(2) else p)
        .filterNot(_.contains("*"))
      out.distinct == out &&
        out.forall(n => catalog.contains(n) || literalAdds.contains(n))
    })
  }

  test("table-list fold: a trailing exclude-all always empties the list") {
    check("fold-exclude-all", Prop.forAll(Gen.listOf(patternGen)) { pats =>
      // "-:*" removes the first occurrence of every catalog name, and
      // repeated application must converge to the empty list — so
      // appending enough exclude-alls (one per possible duplicate = one
      // per pattern) drains everything that came from the catalog
      val catalog = Seq("alpha", "beta", "gamma", "a1", "a2")
      val drained = graft.exec.Pipeline.expandTableList(
        pats ++ Seq.fill(pats.size + 1)("-:*"), catalog)
      drained.forall(!catalog.contains(_))
    })
  }

  test("table-list fold: add/remove of the same name cancels pairwise") {
    val catalog = Seq("alpha", "beta")
    check("fold-cancel", Prop.forAll(Gen.chooseNum(1, 5)) { k =>
      // k adds followed by k removes leave no copy; k adds and k-1
      // removes leave exactly one (first-occurrence Remove semantics)
      val adds = Seq.fill(k)("+:alpha")
      val none = graft.exec.Pipeline.expandTableList(
        adds ++ Seq.fill(k)("-:alpha"), catalog)
      val one = graft.exec.Pipeline.expandTableList(
        adds ++ Seq.fill(k - 1)("-:alpha"), catalog)
      !none.contains("alpha") && one.contains("alpha")
    })
  }

  test("CopyConfig round-trips any well-formed options block") {
    // generate a config JSON from typed values, parse it back, and the
    // typed values must survive — the reference's parse matrix
    // (SmartBulkCopyConfig.cs:118-222) as a property, not five examples
    val genLp = Gen.oneOf(
      Gen.const("auto"),
      Gen.chooseNum(1, 128).map(_.toString),
      Gen.chooseNum(1, 64).map(n => s"${n}gb"))
    check("config-roundtrip", Prop.forAll(
      Gen.chooseNum(1, 32), Gen.chooseNum(1, 1000000), genLp,
      Gen.oneOf("none", "readonly", "read-only", "snapshot"),
      Gen.oneOf(true, false), Gen.oneOf(true, false), Gen.oneOf(true, false)
    ) { (tasks, batch, lp, safe, stopSec, stopTemp, trunc) =>
      val json =
        s"""{"source": {"connection-string": "/src"},
           |"destination": {"connection-string": "/dst"},
           |"options": {"tasks": $tasks, "batch-size": $batch,
           |  "logical-partitions": "$lp", "safe-check": "$safe",
           |  "truncate-tables": $trunc,
           |  "stop-if": {"secondary-indexes": $stopSec,
           |              "temporal-table": $stopTemp}}}""".stripMargin
      val cfg = CopyConfig.parse(json, _ => None)
      val lpOk = cfg.plan.strategy match {
        case PartitionStrategy.Auto       => lp == "auto"
        case PartitionStrategy.Count(n)   => lp == n.toString
        case PartitionStrategy.SizeGb(gb) => lp == s"${gb.toInt}gb"
      }
      cfg.plan.tasks == tasks && cfg.plan.batchSize == batch && lpOk &&
        cfg.safeCheck == (if (safe == "read-only") "readonly" else safe) &&
        cfg.truncateTables == trunc &&
        cfg.plan.stopIfSecondaryIndex == stopSec &&
        cfg.plan.stopIfTemporalTable == stopTemp
    })
  }

  test("lossless fixture encode/decode roundtrip is exact for any doc id") {
    import graft.ops.{MediaRecord, MultimodalQueries}
    import MultimodalQueries.RasterFixtures
    // the REAL ImageIO decodes must recover dims and mean-channel
    // features bit-exactly from the compressed payload for every id the
    // corpus could ever present — PNG/BMP/GIF are lossless here (GIF's
    // palette holds ≤2 colors), the fixture colors are pure functions of
    // the id, and the feature arithmetic matches the DuckDB oracle's
    // (same exact IEEE-754 division)
    for (fmt <- Seq("png", "bmp", "gif"))
      check(s"$fmt-roundtrip", Prop.forAll(Gen.chooseNum(0L, Long.MaxValue / 64)) { id =>
        val f = MultimodalQueries.decodeImage(
          MediaRecord(id, fmt, RasterFixtures.encode(fmt, id), 0, 0, 3))
        val (w, h) = RasterFixtures.dims(fmt, id)
        val (e0, e1, e2, e3) = RasterFixtures.meanFeatures(fmt, id)
        f.width == w && f.height == h && f.n_bytes == w.toLong * h * 3 &&
          f.feat_0 == e0 && f.feat_1 == e1 && f.feat_2 == e2 && f.feat_3 == e3
      })
  }
}
