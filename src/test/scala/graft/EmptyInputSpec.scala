package graft

/** Empty-corpus robustness sweep: every declared query must EXECUTE
  * (plan + run + collect) against a corpus with the production schema
  * and ZERO rows in every table. At 100 TB this is not a corner case —
  * a tenant filter, a date partition, or a predicate pushdown routinely
  * reduces an input to nothing, and a query that throws on empty input
  * (a bare `.head` on a collected aggregate, a null threshold fed into
  * a cast, a seq.max over no elements) is a production outage, not a
  * test artifact. Results are NOT oracle-checked here (DuckDB's gate
  * covers the populated corpus); the contract is narrower: no query may
  * crash, and scalar-aggregate rows that do come back must not smuggle
  * sentinel garbage in place of NULL/zero.
  */
class EmptyInputSpec extends SparkSpecBase {

  /** Empty mirror of the sf0.001 corpus: same schemas (read from the
    * real footers), zero rows, same `<table>.parquet` layout. */
  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_sf")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    sys.addShutdownHook(graft.exec.Fs.deleteTree(dir))
    dir.toString
  }

  test("every declared query executes against a zero-row corpus") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).collect(); None }
        catch { case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse("").linesIterator
            .take(1).mkString.take(160)
          Some(s"$name: ${e.getClass.getSimpleName}: $msg")
        }
    }
    assert(failures.isEmpty,
      s"queries crash on an empty corpus (${failures.size}):\n  " +
        failures.mkString("\n  "))
  }
}
