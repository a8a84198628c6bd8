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
      .config("spark.sql.warehouse.dir",
        System.getProperty("java.io.tmpdir") + "/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // testdata is read-only: persisted pipeline state goes to scratch
    // instead of its production default beside the corpus
    graft.ops.PersistedState.relocateToScratch(s)
    s
  }
}
