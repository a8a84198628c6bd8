package graft.ops

import org.apache.spark.sql.functions._
import graft.exec.Scans

/** Source-format coverage beyond parquet/JDBC: CSV and JSON-lines round
  * trips. The reference speaks only TDS; a Spark-native engine's source
  * surface is `spark.read.<format>` with an EXPLICIT schema (inference
  * is a full extra pass over 100 TB — never rely on it at scale). Each
  * query writes a table out in the text format, reads it back, and
  * aggregates; the oracle recomputes from the original parquet, so the
  * round trip must be value-lossless.
  */
object SourceQueries {

  // Per-PROCESS and per-CORPUS scratch root: two drivers on one machine
  // must never share a staging directory, and two corpora in ONE driver
  // (Verify at sf0.01 interleaving with a bench run at sf0.1 — the
  // same-JVM scenario the staged-state caches defend against) must not
  // either — the staged bytes are corpus-DEPENDENT, so a shared path
  // can surface as FileNotFound mid-overwrite or an aggregate silently
  // computed over a mix of both corpora's part files. THE shared
  // scratch-path contract (proc tag + corpusKey + exit reclamation) is
  // PersistedState.scratchFallback — calling it, not re-implementing
  // it, so a change to the contract cannot fork here.
  //
  // Per-INVOCATION uniqueness besides: the roundtrip bodies write
  // eagerly and return a LAZY read-back, so two threads of one driver
  // running the same key against the same corpus would otherwise race
  // overwrite-vs-scan on a fixed path (FileNotFound mid-query, or an
  // aggregate over a mix of old and new part files) — the same hazard
  // source_csv_malformed's atomic-rename publish defends, solved here
  // by never sharing a destination at all. The suffix dirs are small,
  // bounded by invocations per process, and reclaimed with the scratch
  // root at exit.
  private def tmp(dir: String, name: String): String =
    s"${PersistedState.scratchFallback(dir, "sources")}/${name}_" +
      java.util.UUID.randomUUID().toString.take(8)

  val entries: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // source_csv_roundtrip — CSV with header, explicit schema on read
    // (no inference pass), losslessness proven by aggregate equality.
    // ------------------------------------------------------------------
    QueryDef("source_csv_roundtrip",
      """SELECT count(*) AS n_rows,
        |       CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
        |       min(n_name) AS first_name, max(n_name) AS last_name
        |FROM nation""".stripMargin) { (s, dir) =>
      val dest = tmp(dir, "nation_csv")
      val src = Scans.table(s, dir, "nation")
      src.write.mode("overwrite").option("header", "true").csv(dest)
      s.read.option("header", "true").schema(src.schema).csv(dest)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("n_nationkey")).cast("long").as("key_sum"),
          min(col("n_name")).as("first_name"),
          max(col("n_name")).as("last_name"))
    },

    // ------------------------------------------------------------------
    // source_orc_roundtrip — the second columnar format: ORC write +
    // read-back with predicate pushdown (ORC carries row-group stats
    // like parquet, so the filter prunes stripes at scale). Aggregate
    // proves value fidelity across the format boundary.
    // ------------------------------------------------------------------
    QueryDef("source_orc_roundtrip",
      """SELECT c_mktsegment, count(*) AS n_customers,
        |       round(sum(c_acctbal), 2) AS total_bal
        |FROM customer WHERE c_custkey <= 1000
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      val dest = tmp(dir, "customer_orc")
      val src = Scans.table(s, dir, "customer")
      src.write.mode("overwrite").orc(dest)
      s.read.orc(dest)
        .filter(col("c_custkey") <= 1000) // pushes into the ORC scan
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("c_acctbal")), 2).as("total_bal"))
        .orderBy(col("c_mktsegment"))
    },

    // ------------------------------------------------------------------
    // source_schema_merge — schema evolution across parquet batches: an
    // old batch (key, name) and a new batch (key, regionkey) read back
    // as ONE table under mergeSchema, missing columns null-filled. The
    // shape every long-lived 100 TB dataset hits when a column is added
    // mid-stream; merge happens at footer level, no data rewrite.
    // ------------------------------------------------------------------
    QueryDef("source_schema_merge",
      """SELECT count(*) AS n_rows,
        |       count(n_name) AS with_name,
        |       count(n_regionkey) AS with_region,
        |       CAST(sum(n_nationkey) AS BIGINT) AS key_sum
        |FROM (
        |  SELECT n_nationkey, n_name, CAST(NULL AS BIGINT) AS n_regionkey
        |  FROM nation
        |  UNION ALL
        |  SELECT n_nationkey, CAST(NULL AS VARCHAR), n_regionkey
        |  FROM nation) u""".stripMargin) { (s, dir) =>
      val dest = tmp(dir, "nation_evolving")
      val src = Scans.table(s, dir, "nation")
      src.select(col("n_nationkey"), col("n_name"))
        .write.mode("overwrite").parquet(s"$dest/batch_v1")
      src.select(col("n_nationkey"), col("n_regionkey"))
        .write.mode("overwrite").parquet(s"$dest/batch_v2")
      s.read.option("mergeSchema", "true")
        .parquet(s"$dest/batch_v1", s"$dest/batch_v2")
        .agg(count(lit(1)).as("n_rows"),
          count(col("n_name")).as("with_name"),
          count(col("n_regionkey")).as("with_region"),
          sum(col("n_nationkey")).cast("long").as("key_sum"))
    },

    // ------------------------------------------------------------------
    // source_json_roundtrip — JSON lines, explicit schema on read;
    // timestamps survive as ISO-8601 under the UTC session. Aggregate
    // per status proves value + type fidelity.
    // ------------------------------------------------------------------
    QueryDef("source_json_roundtrip",
      """SELECT o_orderstatus, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS total_price,
        |       CAST(min(CAST(o_orderdate AS DATE)) AS VARCHAR) AS first_date
        |FROM orders WHERE o_orderkey < 5000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val dest = tmp(dir, "orders_json")
      val src = Scans.table(s, dir, "orders").filter(col("o_orderkey") < 5000)
      src.write.mode("overwrite").json(dest)
      s.read.schema(src.schema).json(dest)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total_price"),
          // ISO string, not DateType: date objects hash differently
          // across the oracle's and Spark's pandas materializations
          min(to_date(col("o_orderdate"))).cast("string").as("first_date"))
        .orderBy(col("o_orderstatus"))
    },

    // ------------------------------------------------------------------
    // source_csv_malformed — dirty-ingest audit: a CSV feed with broken
    // rows read under PERMISSIVE mode with a corrupt-record column —
    // the real-world ingestion posture (FAILFAST kills a 100 TB load on
    // row one; DROPMALFORMED silently shrinks the dataset; PERMISSIVE
    // quarantines). The fixture is inline (like text_pii_scrub's),
    // chosen so row verdicts are parser-unambiguous: bad arity or a
    // non-numeric amount is corrupt, everything else clean. The oracle
    // independently re-judges the same lines with split + regex and
    // must land on the identical quarantine counts and clean-row sums.
    // ------------------------------------------------------------------
    QueryDef("source_csv_malformed",
      s"""WITH raw(line) AS (VALUES
        |  ${CsvFixture.lines
             // SQL-escape the single quotes: the fixture is a DIRTY-CSV
             // fixture meant to grow malformed rows, and an apostrophe
             // line (o'hara) would otherwise break the oracle's parse
             // far from the one-line fixture edit that caused it
             .map(l => s"('${l.replace("'", "''")}')").mkString(",\n  ")}),
        |p AS (SELECT string_split(line, ',') AS f FROM raw),
        |j AS (SELECT
        |        len(f) = 3
        |          AND regexp_matches(f[1], '^[0-9]+$$')
        |          AND regexp_matches(f[3], '^-?[0-9]+(\\.[0-9]+)?$$') AS ok,
        |        f FROM p)
        |SELECT count(*) AS n_rows,
        |       CAST(count(CASE WHEN ok THEN 1 END) AS BIGINT) AS n_clean,
        |       CAST(count(CASE WHEN NOT ok THEN 1 END) AS BIGINT) AS n_corrupt,
        |       round(sum(CASE WHEN ok THEN CAST(f[3] AS DOUBLE) END), 2)
        |         AS clean_amount
        |FROM j""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.types._
      val dest = tmp(dir, "malformed_csv")
      // stage the fixture as a real CSV file — the ingest path under
      // test is spark.read.csv, not an in-memory frame. The root is
      // per-process (see tmp), and the publish is ATOMIC anyway (write
      // to a temp name, rename into place) so even concurrent THREADS
      // of this driver see either the old complete file or the new
      // complete one, never a truncated mid-write state. The temp name
      // is dot-prefixed so Spark's directory listing ignores it even if
      // a crashed writer strands one.
      val dir0 = new java.io.File(dest)
      dir0.mkdirs()
      val staged = java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dest,
          s".feed.csv.tmp-${java.lang.ProcessHandle.current().pid()}-${Thread.currentThread().getId}"),
        CsvFixture.lines.mkString("", "\n", "\n"))
      java.nio.file.Files.move(staged,
        java.nio.file.Paths.get(dest, "feed.csv"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("name", StringType),
        StructField("amount", DoubleType),
        StructField("_corrupt_record", StringType)))
      // The quarantine verdict needs the FULL row parsed: under column
      // pruning the CSV parser only parses required columns, so an
      // aggregate that never touches `id` would silently miss a bad-id
      // row (Spark's documented corrupt-record caveat — observed here:
      // 2 corrupt instead of 4 without this). Materialize complete rows
      // first. localCheckpoint stores UNREPLICATED executor blocks — a
      // lost executor between checkpoint and action is unrecoverable
      // (lineage is cut) — which is acceptable for this 10-line inline
      // fixture; a real 100 TB ingest lands the parsed feed to durable
      // staging instead, exactly what the quarantine posture wants.
      s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(dest)
        .localCheckpoint(true)
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("_corrupt_record").isNull, 1)).cast("long")
            .as("n_clean"),
          count(col("_corrupt_record")).cast("long").as("n_corrupt"),
          round(sum(when(col("_corrupt_record").isNull, col("amount"))), 2)
            .as("clean_amount"))
    })

  /** The malformed-feed fixture: verdicts must be parser-unambiguous
    * (see source_csv_malformed). 6 clean rows, 4 corrupt (extra field,
    * missing field, non-numeric amount, non-numeric id).
    */
  private object CsvFixture {
    val lines: Seq[String] = Seq(
      "1,alice,10.50",
      "2,bob,20.00",
      "3,carol,extra,7.25",   // arity 4 → corrupt
      "4,dan,-3.75",
      "5,erin",               // arity 2 → corrupt
      "6,frank,abc",          // non-numeric amount → corrupt
      "7,grace,0.25",
      "x8,henry,5.00",        // non-numeric id → corrupt
      "9,iris,12.5",
      "10,judy,100.0")
  }
}
