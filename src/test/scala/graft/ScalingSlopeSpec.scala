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
  * sf0.001 map loses its scaling evidence.
  */
class ScalingSlopeSpec extends AnyFunSuite {

  /** Sub-50 ms sf0.001 times are session fixed costs (parquet footer
    * reads, codegen), not data-proportional work — flooring the
    * denominator keeps the ratio meaningful. */
  private val NoiseFloorSec = 0.05
  private val Bound = 30.0

  private val entryRe =
    """"([A-Za-z0-9_]+)":\{"min":([0-9.eE+-]+),"median":([0-9.eE+-]+)\}""".r

  private def minsOf(path: String): Map[String, Double] = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    entryRe.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  test("no key's min grows more than 30x across 100x data (sf0.001 -> sf0.1)") {
    val big = minsOf("BENCH_full.json")
    val small = minsOf("BENCH_full_sf001.json")
    assert(big.nonEmpty, "BENCH_full.json missing or empty")
    assert(small.nonEmpty, "BENCH_full_sf001.json missing or empty")
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
