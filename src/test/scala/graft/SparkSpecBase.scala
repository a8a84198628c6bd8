package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs; mirrors the Verify/Bench session
  * config (UTC, nanosAsLong for events.ts).
  */
trait SparkSpecBase extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpecBase.session

  val sfDir = "/root/testdata/sf0.001"

  // --- shared file-tree helpers for the persisted-layout contract
  // specs (incremental append, retrain rewrite, no-op lock) — ONE
  // definition so a change to the layout's file-tree contract (e.g. a
  // new metadata file) is fixed in one place, not per-spec copies ----

  /** (relative path -> byte size) of a layout's DATA files — Spark
    * `_`/`.`-prefixed metadata excluded, because write jobs legitimately
    * refresh `_SUCCESS` even when no data file changes. */
  def dataFileSizes(layout: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Paths.get(layout)
    val walk = java.nio.file.Files.walk(base)
    try walk.iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        !p.getFileName.toString.startsWith("_") &&
        !p.getFileName.toString.startsWith("."))
      .map(p => base.relativize(p).toString -> java.nio.file.Files.size(p))
      .toMap
    finally walk.close()
  }

  /** (relative path -> (size, mtime)) over ALL files including
    * metadata — the strict form for no-op locks, where not even a
    * `_SUCCESS` refresh is allowed to run. */
  def fileTreeStrict(layout: String): Map[String, (Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Paths.get(layout)
    val walk = java.nio.file.Files.walk(base)
    try walk.iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p))
      .map(p => base.relativize(p).toString ->
        (java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis))
      .toMap
    finally walk.close()
  }

  /** Recursive delete of a throwaway spec directory. */
  def deleteTree(root: java.nio.file.Path): Unit =
    graft.exec.Fs.deleteTree(root)
}

object SparkSpecBase {
  // one session across all suites — sbt runs suites sequentially in one JVM
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      // same ObjectHashAggregate headroom as Verify/Bench (simhash_votes
      // holds one small fixed-size buffer per group)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 65536)
      // per-process like GraftSession: a concurrent Verify/Bench JVM must
      // never share the warehouse the bucketed-table tests rewrite
      .config("spark.sql.warehouse.dir",
        System.getProperty("java.io.tmpdir") + "/graft_warehouse_" +
          java.lang.ProcessHandle.current().pid())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // testdata is read-only: persisted pipeline state goes to scratch
    // instead of its production default beside the corpus
    graft.ops.PersistedState.relocateToScratch(s)
    // pin derby.system.home before ANY spec can boot the embedded
    // engine: a spec reaching a raw jdbc:derby: URL (PipelineSpec's
    // truncate probe) ahead of DerbyEnv would otherwise drop derby.log
    // into the repo root for the rest of the JVM
    graft.exec.DerbyEnv.home
    s
  }
}
