package graft

import graft.exec.Scans
import graft.meta.Catalog
import graft.model._

/** Exit-code mapping of the `graft.Copy` entry point — the analog of the
  * reference's outcome tests (`tests/Misc.cs:14-38`) plus the runtime
  * failure classes (`SmartBulkCopy.cs:216-250`): analysis failures exit
  * with the `AnalysisOutcome` ordinal (`TableAnalyzer.cs:10-19`), copy
  * errors with 3, reconciliation mismatches with 2.
  */
class CopySpec extends SparkSpecBase {

  private def destDir =
    java.nio.file.Files.createTempDirectory("graft_copy").toString

  test("clean run exits 0") {
    assert(Copy.run(spark, sfDir, destDir, Seq("region", "nation")) == 0)
  }

  test("foreign keys on the destination exit with the FK ordinal (5)") {
    val dst = Catalog.collect(spark, sfDir, "region")
      .copy(storage = Storage.Heap, secondaryIndexCount = 0, history = None,
        foreignKeyCount = 1)
    assert(Copy.run(spark, sfDir, destDir, Seq("region"),
      destMeta = Map("region" -> dst)) == 5)
  }

  test("temporal destination exits 6; secondary index exits 4") {
    val base = Catalog.collect(spark, sfDir, "region")
      .copy(storage = Storage.Heap, foreignKeyCount = 0,
        secondaryIndexCount = 0, history = None)
    assert(Copy.run(spark, sfDir, destDir, Seq("region"),
      destMeta = Map("region" ->
        base.copy(history = Some(HistoryInfo("region_history", "vf", "vt", 90))))) == 6)
    assert(Copy.run(spark, sfDir, destDir, Seq("region"),
      destMeta = Map("region" -> base.copy(secondaryIndexCount = 1))) == 4)
  }

  test("missing source table exits 2 before any copy") {
    assert(Copy.run(spark, sfDir, destDir, Seq("no_such_table")) == 2)
  }

  test("forced count mismatch exits 2") {
    val d = destDir
    // destination interference during the run: an extra committed file
    // lands in the destination after the load — reconciliation must
    // catch the inflated count, exactly CheckResults' job
    val code = Copy.run(spark, sfDir, d, Seq("region"),
      postCopyHook = t => Scans.table(spark, sfDir, t).limit(1)
        .write.mode("append").parquet(s"$d/$t.parquet"))
    assert(code == 2)
  }

  test("copy-phase task error exits 3") {
    assert(Copy.run(spark, sfDir, destDir, Seq("region", "nation"),
      postCopyHook = t =>
        if (t == "nation") throw new RuntimeException("injected task failure")) == 3)
  }

  test("analysis failure aborts BEFORE any table is copied") {
    val d = destDir
    val dst = Catalog.collect(spark, sfDir, "nation")
      .copy(storage = Storage.Heap, secondaryIndexCount = 0, history = None,
        foreignKeyCount = 1)
    // region analyzes clean but nation's FK must abort the whole run
    // during analysis — so region's destination is never written
    assert(Copy.run(spark, sfDir, d, Seq("region", "nation"),
      destMeta = Map("nation" -> dst)) == 5)
    assert(!new java.io.File(s"$d/region.parquet").exists(),
      "analysis failure must fail fast before the copy phase")
  }
}
