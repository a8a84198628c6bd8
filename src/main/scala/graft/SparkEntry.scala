package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.exec.Scans
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
      JdbcQueries.entries ++ SourceQueries.entries ++
      JoinQueries.entries ++ RelationalQueries.entries ++
      TextQueries.entries ++ SimilarityQueries.entries ++
      EventQueries.entries ++ MultimodalQueries.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The reference's headline capability is the partition-parallel scan
    * (BASELINE.md). In Spark the fan-out lives in the DATA layout, not
    * in manual query unions: one declarative scan over the partitioned
    * table, partial aggregation map-side per partition, one shuffle on
    * the tiny group key. (The per-partition work-item fan-out — the
    * reference's queue — is `Pipeline.copyFrame`, exercised by the
    * bulk_insert queries.)
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    // partitions 1..7 expressed as raw shipdate bounds so the predicate
    // reaches the parquet scan (PushedFilters row-group pruning) instead
    // of evaluating year() per row
    Scans.table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("2002-01-01").cast("timestamp"))
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
