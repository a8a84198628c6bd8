package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.exec.{Pipeline, Scans}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 declares one entry in
  * [[queries]]; SQL-expressible ones also declare the equivalent ANSI SQL
  * in [[oracleSql]] for the driver's DuckDB hash-compare.
  */
object SparkEntry {

  /** All declared capabilities, core + extensions. */
  def registry: Seq[QueryDef] =
    CoreQueries.entries ++ MetaQueries.entries ++ PipelineQueries.entries ++
      TextQueries.entries ++ SimilarityQueries.entries ++
      EventQueries.entries ++ MultimodalQueries.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The reference's headline capability is the partition-parallel scan
    * (BASELINE.md): here lineitem is read as the union of its 7 physical
    * partition scans — each prunable and independently schedulable — and
    * aggregated into the classic pricing summary.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = Scans.table(spark, dir, "lineitem")
    val partitions = (1 to 7).map(n =>
      Scans.physicalPartition(li, Pipeline.partitionNumber(col("l_shipdate")), lit(n)))
    partitions.reduce(_ unionAll _)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
