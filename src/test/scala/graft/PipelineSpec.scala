package graft

import org.apache.spark.sql.functions._
import graft.exec.{Pipeline, Retry, Scans}
import graft.meta.Catalog
import graft.model._
import graft.plan.{PartitionStrategy, PlanConfig}

/** End-to-end copy-pipeline tests — the analog of the reference's e2e CI
  * copy + rowcount reconciliation (`.github/workflows/main.yml:20-27`,
  * `SmartBulkCopy.cs:296-339`), against a tmp destination directory.
  */
class PipelineSpec extends SparkSpecBase {

  private def destDir =
    java.nio.file.Files.createTempDirectory("graft_pipe").toString

  test("full copy: partitioned rowstore source reconciles") {
    val src = Catalog.collect(spark, sfDir, "lineitem")
    val dst = src.copy(foreignKeyCount = 0, secondaryIndexCount = 0, history = None)
    val r = Pipeline.copyTable(spark, sfDir, destDir, src, dst,
      PlanConfig(batchSize = 1000))
    assert(r.ok, s"reconciliation failed: $r")
    assert(r.sliceKind == "physical" && r.workItems == 7)
  }

  test("full copy: logical slices reconcile and land ordered") {
    val src = Catalog.collect(spark, sfDir, "orders")
    val dst = src.copy(storage = Storage.Heap, foreignKeyCount = 0,
      secondaryIndexCount = 0, history = None)
    val d = destDir
    val r = Pipeline.copyTable(spark, sfDir, d, src, dst,
      PlanConfig(batchSize = 100, strategy = PartitionStrategy.Count(5)))
    assert(r.ok && r.workItems == 5 && r.sliceKind == "logical")
    // destination content equals source content (value-level, not count)
    val a = Scans.table(spark, sfDir, "orders")
    val b = spark.read.parquet(s"$d/orders.parquet")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("small table takes the bypass and still reconciles") {
    val src = Catalog.collect(spark, sfDir, "region")
    val r = Pipeline.copyTable(spark, sfDir, destDir, src, src.copy(), PlanConfig())
    assert(r.ok && r.workItems == 1 && r.sliceKind == "none")
  }

  test("wildcard table-list expansion: include, exclude, distinct") {
    val all = Pipeline.expandTableList(Seq("*"))
    assert(all == Catalog.tableNames)
    assert(Pipeline.expandTableList(Seq("*", "-:e*")) ==
      Catalog.tableNames.filterNot(_.startsWith("e")))
    assert(Pipeline.expandTableList(Seq("lineitem", "+:orders", "lineitem")) ==
      Seq("lineitem", "orders"))
    assert(Pipeline.expandTableList(Seq("no_match_*")) == Nil)
  }

  test("retry: transient errors retry, fatal errors rethrow") {
    var n = 0
    val r = Retry.withRetry(3) {
      n += 1; if (n < 3) throw new java.io.IOException("transient"); n }
    assert(r == 3)
    var m = 0
    intercept[IllegalStateException] {
      Retry.withRetry(3) { m += 1; throw new IllegalStateException("fatal") }
    }
    assert(m == 1) // no retry on non-transient
    intercept[Retry.RetriesExhausted] {
      Retry.withRetry(2) { throw new java.io.IOException("always") }
    }
  }

  test("retry: JDBC SQLState/vendor-code whitelist classifies correctly") {
    // driver-classified transient type retries
    var a = 0
    assert(Retry.withRetry(3) { a += 1
      if (a < 2) throw new java.sql.SQLTransientConnectionException("conn lost")
      a } == 2)
    // vendor code from the reference's whitelist (Azure throttling 40613)
    var b = 0
    assert(Retry.withRetry(3) { b += 1
      if (b < 2) throw new java.sql.SQLException("unavailable", "S0001", 40613)
      b } == 2)
    // SQLState class 40 (deadlock) wrapped in a Spark-style outer
    // exception: the cause chain is unwrapped before classifying
    var c = 0
    assert(Retry.withRetry(3) { c += 1
      if (c < 2) throw new RuntimeException("Job aborted.",
        new java.sql.SQLException("deadlock victim", "40001", 1205))
      c } == 2)
    // non-transient: syntax error rethrows immediately, no retry
    var m = 0
    intercept[java.sql.SQLSyntaxErrorException] {
      Retry.withRetry(3) { m += 1
        throw new java.sql.SQLSyntaxErrorException("bad sql", "42X01") }
    }
    assert(m == 1)
  }

  test("jdbc overwrite+truncate keeps table identity (secondary index survives)") {
    import graft.exec.Scans
    val url = s"jdbc:derby:${destDir}/truncdb;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val df = Scans.table(spark, sfDir, "region")
    df.write.mode("overwrite").jdbc(url, "graft_region_t", props) // create
    // out-of-band DDL the destination owner applied — a drop/recreate
    // overwrite would silently destroy it; truncate+append must not
    def withConn[T](f: java.sql.Connection => T): T = {
      val conn = java.sql.DriverManager.getConnection(url)
      try f(conn) finally conn.close()
    }
    withConn(_.createStatement().execute(
      "CREATE INDEX ix_trunc_probe ON graft_region_t(\"r_regionkey\")"))
    df.write.mode("overwrite").option("truncate", true)
      .jdbc(url, "graft_region_t", props)
    val indexSurvived = withConn { conn =>
      val rs = conn.createStatement().executeQuery(
        "SELECT COUNT(*) FROM SYS.SYSCONGLOMERATES WHERE CONGLOMERATENAME = 'IX_TRUNC_PROBE'")
      rs.next(); rs.getInt(1) == 1
    }
    assert(indexSurvived, "overwrite dropped/recreated the table (index lost)")
    assert(spark.read.jdbc(url, "graft_region_t", props).count() == df.count())
  }

  test("copyFrame on a SUBSET of logical slices returns only those slices") {
    val src = Catalog.collect(spark, sfDir, "orders")
    val keys = Seq("o_orderkey")
    val items = (0 until 3).map(i => // 3 of 9 slices — e.g. a retry batch
      WorkItem(src, SliceSpec.Logical(keys, 9, i), orderHint = Nil))
    val subset = Pipeline.copyFrame(spark, sfDir, items)
    val key = graft.exec.Scans.sliceKeyPortable(keys)
    val expected = graft.exec.Scans.table(spark, sfDir, "orders")
      .filter(pmod(abs(key), lit(9L)) < 3).count()
    assert(subset.count() == expected)
    assert(expected < graft.exec.Scans.table(spark, sfDir, "orders").count())
  }

  test("generated SQL renders a key-less logical slice via xxhash64") {
    import graft.exec.{Scans, SqlGen}
    val src = Catalog.collect(spark, sfDir, "region").copy(sortKeys = Nil)
    val items = (0 until 3).map(i =>
      WorkItem(src, SliceSpec.Logical(Nil, 3, i), orderHint = Nil))
    items.foreach { item =>
      val viaSql = SqlGen.run(spark, sfDir, item)
      val viaApi = Scans.forWorkItem(spark, sfDir, item)
      assert(viaSql.exceptAll(viaApi).count() == 0 &&
        viaApi.exceptAll(viaSql).count() == 0, s"slice ${item.slice} disagrees")
    }
    // and the three key-less slices partition the table
    val total = items.map(SqlGen.run(spark, sfDir, _).count()).sum
    assert(total == Scans.table(spark, sfDir, "region").count())
  }

  test("generated SQL text agrees with the DataFrame plan for the same work item") {
    import graft.exec.{Scans, SqlGen}
    val meta = Catalog.collect(spark, sfDir, "lineitem")
    val item = WorkItem(meta, SliceSpec.Logical(Seq("l_orderkey", "l_linenumber"), 9, 3),
      orderHint = Seq(SortKey("l_orderkey"), SortKey("l_linenumber", descending = true)))
    val viaSql = SqlGen.run(spark, sfDir, item)
    val viaApi = Scans.forWorkItem(spark, sfDir, item)
    assert(viaSql.exceptAll(viaApi).count() == 0 &&
      viaApi.exceptAll(viaSql).count() == 0)
    assert(viaSql.count() > 0)
  }

  test("incremental copy is idempotent across runs and reconciles") {
    val fn = SparkEntry.queries("pipeline_incremental_copy")
    val a = fn(spark, sfDir).collect().toSeq
    val b = fn(spark, sfDir).collect().toSeq
    assert(a == b) // reseed-and-append is deterministic run to run
    assert(a.head.getAs[Boolean]("is_match"))
    assert(a.head.getAs[Long]("appended_rows") > 0)
  }

  test("truncate removes the destination footprint") {
    import graft.exec.{Scans, Sinks}
    val d = s"$destDir/trunc_target.parquet"
    Sinks.bulkInsert(Scans.table(spark, sfDir, "region"), d, overwrite = true)
    assert(spark.read.parquet(d).count() > 0)
    Sinks.truncate(spark, d)
    assert(!new java.io.File(d).exists())
  }

  test("safety check fails for a missing table") {
    assert(Pipeline.safetyCheck(spark, sfDir, "lineitem"))
    assert(!Pipeline.safetyCheck(spark, sfDir, "no_such"))
  }

  test("safety check sees data files nested under partition directories") {
    import graft.exec.Scans
    val d = destDir
    Scans.table(spark, sfDir, "region")
      .withColumn("pk", col("r_regionkey") % 2)
      .write.partitionBy("pk").parquet(s"$d/parted.parquet")
    assert(Pipeline.safetyCheck(spark, d, "parted"))
  }

  test("committedRowCount: many files in parallel, uncommitted attempts ignored") {
    import graft.exec.{Scans, Sinks}
    val d = destDir
    val dest = s"$d/orders.parquet"
    val src = Scans.table(spark, sfDir, "orders")
    src.repartition(24).write.parquet(dest) // 24 committed footers
    val n = src.count()
    assert(Sinks.committedRowCount(spark, dest) == n)
    // plant leftovers a crashed prior writer would leave behind: a
    // task-attempt file under _temporary and a dot-prefixed stray —
    // spark.read.parquet ignores both, so reconciliation must too
    val committed = new java.io.File(dest).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val attempt = new java.io.File(
      s"$dest/_temporary/0/task_0001/part-crashed.parquet")
    attempt.getParentFile.mkdirs()
    java.nio.file.Files.copy(committed.toPath, attempt.toPath)
    val stray = new java.io.File(s"$dest/.stale.parquet")
    java.nio.file.Files.copy(committed.toPath, stray.toPath)
    assert(Sinks.committedRowCount(spark, dest) == n,
      "uncommitted files inflated the committed count")
    assert(spark.read.parquet(dest).count() == n) // the contract we mirror
  }
}
