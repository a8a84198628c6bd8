package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** One verify pass over `queries`: dump each result under `outDir`,
    * write the oracle manifest and the errors manifest, and report
    * (thrown errors, declared-but-missing result dirs). A throwing query
    * must surface as an ERROR ROW in the correctness record, never as a
    * silently shrunk surface (r8: 16 keys vanished from
    * CORRECTNESS_r08.json because failures only went to stderr).
    * Extracted from main so the failure path itself is spec-testable
    * (`VerifySpec` feeds a deliberately-throwing query and asserts it
    * lands in errors.json and fails the run).
    */
  def run(
      spark: SparkSession,
      queries: Map[String, (SparkSession, String) => DataFrame],
      oracleSql: Map[String, String],
      sfDir: String,
      outDir: String): (Map[String, String], Set[String]) = {
    new java.io.File(outDir).mkdirs()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    queries.foreach { case (name, fn) =>
      // delete any STALE result dir for this key first: a reused outDir
      // (the documented local-iteration loop) must never let a previous
      // run's parquet satisfy this run's completeness check — a query
      // whose write silently produced nothing would read as a false
      // PASS, the exact failure mode the belt-and-braces check exists
      // to catch
      graft.exec.Fs.deleteTree(java.nio.file.Paths.get(outDir, name))
      // NonFatal only: an OOM/LinkageError recorded as an error row
      // would keep running the remaining queries in a heap-exhausted or
      // link-broken JVM — cascading hangs and garbage results instead
      // of a prompt death; an interrupt (Ctrl-C) must stop the pass,
      // not be eaten as one more row
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}"
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // errors.json is written unconditionally (empty object = clean run) so
    // its absence can never be confused with success, and is truncated per
    // message — one pathological stack must not balloon the manifest.
    // Truncation lands on a CODEPOINT boundary: take(2000) on a String
    // counts UTF-16 units and can split a surrogate pair, and the lone
    // high surrogate (>= 0x20, so the escaper passes it raw) would make
    // writeString's UTF-8 encoder throw AFTER every query already ran —
    // losing the whole manifest to the truncation that exists to protect it.
    def truncAtCodepoint(s: String, n: Int): String =
      if (s.length <= n) s
      else if (Character.isHighSurrogate(s.charAt(n - 1))) s.take(n - 1)
      else s.take(n)
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(truncAtCodepoint(v, 2000))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    // Belt-and-braces: the dumped result dirs must be exactly the declared
    // key set — catches failure modes that never threw, e.g. a query whose
    // write produced nothing.
    val dumped = Option(new java.io.File(outDir).listFiles()).getOrElse(Array())
      .filter(_.isDirectory).map(_.getName).toSet
    (errors.toMap, queries.keySet -- dumped)
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter (local iteration)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    // unknown names FAIL LOUDLY: a typo'd filter silently matching
    // nothing would run zero queries and exit 0 — a green gate for a
    // key that was never executed
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      if (unknown.nonEmpty) {
        System.err.println(
          s"[verify] unknown query name(s): ${unknown.mkString(",")}")
        sys.exit(2)
      }
    }
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // a FILTERED run scopes the oracle manifest to the filter too: the
    // stale-dir delete only covers selected keys, so an unfiltered
    // manifest over a reused outDir would pair THIS build's oracle SQL
    // with a previous build's parquet for every unselected key — old
    // results reading as this run's correctness, the exact false-PASS
    // the stale-dir delete exists to prevent
    val oracles = SparkEntry.oracleSql
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val (errors, missing) = run(spark, selected, oracles, sfDir, outDir)
    spark.stop()
    if (errors.nonEmpty || missing.nonEmpty) {
      System.err.println(
        s"[verify] FAILED: ${errors.size} threw, missing dirs: ${missing.mkString(",")}")
      sys.exit(1)
    }
  }
}
