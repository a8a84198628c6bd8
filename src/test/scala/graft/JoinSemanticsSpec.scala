package graft

import org.apache.spark.sql.functions._
import graft.ops.JoinQueries

/** Edge-case semantics the testdata cannot exercise (no equal-timestamp
  * collisions exist in events at test SF — verified): the as-of join's
  * strict `<` tie rule.
  */
class JoinSemanticsSpec extends SparkSpecBase {

  test("as-of join excludes an equal-timestamp click (strict <)") {
    import spark.implicits._
    val events = Seq(
      // user 1: click at 1000, purchase at 1000 (tie) → no match
      (1L, 1L, "click", 1000L),
      (10L, 1L, "purchase", 1000L),
      // user 2: click at 900, purchase at 1000 → matches 900;
      // a later click at 1000 ties with nothing
      (2L, 2L, "click", 900L),
      (20L, 2L, "purchase", 1000L),
      // user 3: purchase with no prior click → null
      (30L, 3L, "purchase", 500L),
      // user 4: two clicks before the purchase → most recent wins
      (4L, 4L, "click", 100L),
      (5L, 4L, "click", 200L),
      (40L, 4L, "purchase", 300L)
    ).toDF("event_id", "user_id", "event_type", "ms")
    val got = JoinQueries.asOfLastClick(events)
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got(10L).isEmpty)        // tie: equal-ms click must NOT match
    assert(got(20L).contains(900L))
    assert(got(30L).isEmpty)
    assert(got(40L).contains(200L)) // most recent prior click
  }
}
