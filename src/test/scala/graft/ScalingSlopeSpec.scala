package graft

import org.scalatest.funsuite.AnyFunSuite

/** Empirical scaling-slope gate over the committed bench artifacts:
  * sf0.001 → sf0.1 is 100× the data, so a key whose best time grows by
  * more than the declared bound is empirically super-linear and will
  * not survive a further 100× — the in-CI backstop for every "would
  * this plan hold at 100 TB" claim (`tools/scaling_slope.py` is the
  * same check for the driver/judge pipeline). Min-basis: medians carry
  * measurement-window noise; mins are the query's demonstrated cost.
  *
  * The artifacts are committed by the bench run, so this spec also
  * fails if either disappears — a round that stops committing the
  * sf0.001 map loses its scaling evidence. Two hazards this spec
  * refuses to inherit from the artifact format: (1) a key that FAILED
  * at either scale lands in the artifact's "failures" array, not the
  * timing map — silently intersecting the maps would exempt exactly
  * the worst scaling outcome (a query that stops succeeding at 100×
  * data), so any failure entry fails the gate; (2) the artifact is
  * parsed with a real JSON parser (Jackson, already on the classpath
  * via Spark) — a regex would silently return a partial map the
  * moment the serialization gains a field or whitespace.
  */
class ScalingSlopeSpec extends AnyFunSuite {

  /** Sub-50 ms sf0.001 times are session fixed costs (parquet footer
    * reads, codegen), not data-proportional work — flooring the
    * denominator keeps the ratio meaningful. */
  private val NoiseFloorSec = 0.05
  private val Bound = 30.0

  /** (min-seconds per key, failed keys) from a committed bench map. */
  private def artifactOf(path: String): (Map[String, Double], Seq[String]) = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    val qs = root.path("queries")
    assert(qs.isObject, s"$path: no queries object")
    val mins = scala.collection.mutable.Map.empty[String, Double]
    qs.properties().forEach { e =>
      val mn = e.getValue.path("min")
      assert(mn.isNumber, s"$path: ${e.getKey} has no numeric min")
      mins(e.getKey) = mn.asDouble()
    }
    val fails = scala.collection.mutable.Buffer.empty[String]
    root.path("failures").forEach(n => fails += n.asText())
    (mins.toMap, fails.toSeq)
  }

  test("no key's min grows more than 30x across 100x data (sf0.001 -> sf0.1)") {
    val (big, bigFails) = artifactOf("BENCH_full.json")
    val (small, smallFails) = artifactOf("BENCH_full_sf001.json")
    assert(big.nonEmpty, "BENCH_full.json missing or empty")
    assert(small.nonEmpty, "BENCH_full_sf001.json missing or empty")
    // a key with no successful run at either scale is the gate's worst
    // case, not an exemption
    assert(bigFails.isEmpty,
      s"keys failed outright at sf0.1: ${bigFails.mkString(", ")}")
    assert(smallFails.isEmpty,
      s"keys failed outright at sf0.001: ${smallFails.mkString(", ")}")
    // and a key present at one scale but missing at the other has no
    // slope at all — it must not silently drop out of the intersection
    val missing = (big.keySet diff small.keySet) ++ (small.keySet diff big.keySet)
    assert(missing.isEmpty,
      s"keys present at only one scale: ${missing.toSeq.sorted.mkString(", ")}")
    val common = big.keySet intersect small.keySet
    assert(common.size >= 100,
      s"suspiciously few common keys (${common.size}) — artifact truncated?")
    val over = common.toSeq
      .map(k => (k, big(k) / math.max(small(k), NoiseFloorSec)))
      .filter(_._2 > Bound)
      .sortBy(-_._2)
    assert(over.isEmpty,
      over.map { case (k, r) => f"$k grows $r%.1fx over 100x data" }
        .mkString("super-linear keys:\n", "\n", ""))
  }
}
