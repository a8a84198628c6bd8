package graft.exec

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.SortKey

/** Sink builders — the Spark realization of the reference's destination
  * side: `TRUNCATE TABLE` prep (`SmartBulkCopy.cs:391-396`), transactional
  * `SqlBulkCopy` batch insert (`:440-561`), and order-hinted load
  * (`:492-509`). The file-sink analog is parquet with overwrite/append and
  * `sortWithinPartitions` before write; per-work-item transactionality maps
  * to Spark's task commit protocol (each task's output file commits
  * atomically, failed tasks leave no visible data).
  */
object Sinks {

  /** Destination prep: `TRUNCATE TABLE t` — reference
    * `SmartBulkCopy.cs:391-396` (issued as its own step before the load,
    * `:169-176`). For a file sink, truncation removes the destination
    * footprint; loads that immediately rewrite can instead rely on
    * `SaveMode.Overwrite` in [[bulkInsert]].
    */
  def truncate(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Transactional batch insert — reference `SmartBulkCopy.cs:440-561`.
    * `batchSizeRows` maps the reference's insert batch (default 100000,
    * forced ≥102400 for columnstore destinations, `SmartBulkCopy.cs:511-516`)
    * to parquet row-group sizing via files.maxRecordsPerFile-style batching;
    * ordering maps the reference's ColumnOrderHints
    * (`SmartBulkCopy.cs:492-509`).
    */
  def bulkInsert(
      df: DataFrame,
      path: String,
      orderHint: Seq[SortKey] = Nil,
      overwrite: Boolean = false,
      columnstoreDest: Boolean = false,
      batchSizeRows: Int = 100000): Unit = {
    val batch = if (columnstoreDest) math.max(batchSizeRows, 102400) else batchSizeRows
    val ordered = Scans.orderedWithinPartitions(df, orderHint)
    ordered.write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.Append)
      .option("maxRecordsPerFile", batch.toLong * 10) // keep row groups healthy
      .parquet(path)
  }

  /** Rowcount reconciliation — reference `SmartBulkCopy.cs:296-339`:
    * per table, compare source vs destination rowcounts; any mismatch is a
    * hard failure (exit code 2).
    */
  def rowcountCheck(src: DataFrame, dst: DataFrame): (Long, Long, Boolean) = {
    val s = src.count()
    val d = dst.count()
    (s, d, s == d)
  }

  /** Committed destination row count from the parquet FOOTERS — the
    * analog of the reference's reconciliation source
    * `sys.dm_db_partition_stats` (`SmartBulkCopy.cs:302-313`), which is
    * a metadata view, not a table scan. Footers are written by the task
    * commit protocol, so their row counts ARE the committed state; no
    * data pages are read.
    */
  def committedRowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val it = fs.listFiles(root, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(fs.getFileStatus(f.getPath), conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try total += reader.getRecordCount finally reader.close()
      }
    }
    total
  }

  /** Identity-sync analog — reference `SmartBulkCopy.cs:341-389`: read the
    * current identity value from the source (`IDENT_CURRENT` CTE) and
    * reseed the destination. For a file sink the "identity" is the max of
    * the identity column; the verify read-back (`:375-384`) is the second
    * element.
    */
  def identityCurrent(df: DataFrame, idCol: String): Long =
    df.agg(max(col(idCol)).cast("long")).collect()(0).getLong(0)
}
