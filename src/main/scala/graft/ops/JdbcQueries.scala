package graft.ops

import org.apache.spark.sql.functions._
import graft.exec.Scans

/** The DB-to-DB copy story on a real SQL database — embedded Derby (ships
  * with Spark). This is the closest analog of the reference's actual
  * runtime shape: `SqlBulkCopy`-style batched JDBC inserts on the sink
  * side (`SmartBulkCopy.cs:440-561`) and a PARTITION-PARALLEL read via
  * `spark.read.jdbc(url, table, predicates, props)` — one SQL predicate
  * per work item, each executor task opening its own cursor, which is
  * precisely the reference's `WHERE ABS(%%PhysLoc%%) % N = n` slice scan
  * (`CopyInfo.cs:58-68`) and the SURVEY.md §2 JDBC mapping.
  */
object JdbcQueries {

  private def dbDir(name: String): String = {
    val home = s"${System.getProperty("java.io.tmpdir")}/graft_derby"
    // keep derby.log out of the working directory
    System.setProperty("derby.system.home", home)
    new java.io.File(home).mkdirs()
    s"$home/$name"
  }

  private def props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  val entries: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // jdbc_bulk_copy — full round trip: parquet source → batched JDBC
    // insert into Derby (the bulk_insert_sink against a live SQL
    // engine) → partition-parallel JDBC read-back with a 4-slice
    // hash-mod predicates array (4 concurrent cursors, the reference's
    // logical-partition scan) → aggregate. The oracle recomputes the
    // aggregate from the source table: the round trip must be lossless.
    // ------------------------------------------------------------------
    QueryDef("jdbc_bulk_copy",
      """SELECT c_mktsegment, count(*) AS n_customers,
        |       round(sum(c_acctbal), 2) AS total_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) {
      (s, dir) =>
      val url = s"jdbc:derby:${dbDir("copydb")};create=true"
      // TRUNCATE-then-append semantics, not drop/recreate: the reference
      // issues `TRUNCATE TABLE` as its own prep step and bulk-inserts
      // into the EXISTING table (`SmartBulkCopy.cs:391-396`), preserving
      // grants/indexes/identity. Spark's truncate option makes overwrite
      // do exactly that when the table already exists (spec-asserted via
      // a surviving secondary index in PipelineSpec).
      Scans.table(s, dir, "customer")
        .write.mode("overwrite")
        .option("truncate", true)
        .option("batchsize", 1000) // SqlBulkCopy BatchSize analog
        .jdbc(url, "graft_customer", props)
      // the reference's logical-partition scan as a JDBC predicates
      // array: disjoint + exhaustive MOD slices, one task per slice
      val predicates = (0 until 4)
        .map(i => s"""MOD(ABS("c_custkey"), 4) = $i""").toArray
      val back = s.read.jdbc(url, "graft_customer", predicates, props)
      back.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("c_acctbal")), 2).as("total_bal"))
        .orderBy(col("c_mktsegment"))
    },

    // ------------------------------------------------------------------
    // jdbc_pushdown_scan — predicate + projection pushdown INTO the SQL
    // source: the filter and column list travel to Derby as generated
    // SQL (visible as PushedFilters on the JDBCRelation scan), so the
    // executor pulls only matching rows of the two columns — the
    // reference's generated `SELECT <cols> … WHERE …` text, produced by
    // Catalyst instead of string assembly.
    // ------------------------------------------------------------------
    QueryDef("jdbc_pushdown_scan",
      """SELECT n_nationkey, n_name FROM nation
        |WHERE n_regionkey IN (1, 2) ORDER BY n_nationkey""".stripMargin) {
      (s, dir) =>
      val url = s"jdbc:derby:${dbDir("pushdb")};create=true"
      Scans.table(s, dir, "nation")
        .write.mode("overwrite").jdbc(url, "graft_nation", props)
      s.read.jdbc(url, "graft_nation", props)
        .filter(col("n_regionkey").isin(1, 2))
        .select(col("n_nationkey"), col("n_name"))
        .orderBy(col("n_nationkey"))
    })
}
