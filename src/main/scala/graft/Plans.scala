package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor — dumps the formatted physical plan of selected declared
  * queries so scan pushdown (`PushedFilters`, `ReadSchema`), join
  * strategies (BroadcastHashJoin vs SortMergeJoin), and whole-stage
  * codegen spans can be reviewed and iterated on. Not part of the driver
  * contract; a development tool (`sbt "runMain graft.Plans [keys...]"`).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // testdata is read-only: persisted pipeline state goes to scratch
    // instead of its production default beside the corpus
    graft.ops.PersistedState.relocateToScratch(spark)
    val keys =
      if (args.nonEmpty) args.toSeq
      else Seq("scan_project", "scan_physical_partition", "join_broadcast_dim",
        "join_shuffle_fact", "bucketed_join_colocated", "dedup_minhash_lsh",
        "sim_brute_force_topk", "sim_ivf_topk", "sim_ivf_write_layout",
        "unpivot_agg", "events_window_agg")
    keys.foreach { k =>
      SparkEntry.queries.get(k) match {
        case Some(fn) =>
          println(s"\n================ $k ================")
          try println(fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
          catch { case e: Exception => println(s"FAILED: ${e.getMessage}") }
        case None => println(s"\n================ $k: NO SUCH QUERY ================")
      }
    }
    spark.stop()
  }
}
