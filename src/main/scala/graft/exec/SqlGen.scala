package graft.exec

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model._

/** SQL-text generation — the reference's core mechanism: every scan it
  * runs is assembled as `SELECT <cols> FROM <t> [WHERE <pred>]
  * [ORDER BY <keys>]` text (`client/SmartBulkCopy.cs:422-438`,
  * `client/CopyInfo.cs:24-68`). This module renders the same shapes in
  * Spark SQL dialect (backtick quoting = the QUOTENAME analog,
  * `SmartBulkCopy.cs:836`) and executes them with `spark.sql` over
  * registered views — proving the engine's ROW results and its SQL
  * surface agree (PipelineSpec compares via exceptAll). Plan shapes
  * intentionally differ on one axis: this surface renders the
  * reference's literal global `ORDER BY` (text fidelity), while the
  * engine's own executor uses sortWithinPartitions — per-partition
  * order is all the partition-parallel sink consumes, and a global
  * range-shuffle would pay for a total order nothing reads
  * (`Scans.orderedWithinPartitions`).
  */
object SqlGen {

  /** QUOTENAME analog: `[col]` → backtick-quoted identifier. */
  def quote(name: String): String = s"`${name.replace("`", "``")}`"

  /** Select-list text: every column except the excluded ones, in table
    * order — reference `CopyInfo.cs:24-27` + exclusion policy
    * `TableInfoCollector.cs:395-408`. Never `SELECT *`.
    */
  def selectList(allColumns: Seq[String], excluded: Seq[String]): String =
    allColumns.filterNot(excluded.contains(_)).map(quote).mkString(", ")

  /** WHERE text for a slice — reference `CopyInfo.cs:47-68`. The logical
    * slice renders the portable arithmetic key (`a*31+b`), the same
    * expression [[Scans.sliceKeyPortable]] builds as a Column; a
    * key-less table falls back to `xxhash64` over every selected column
    * (the [[Scans.sliceKeyHash]] analog — the planner legitimately emits
    * `Logical(Nil, …)` for key-less heaps).
    */
  def whereClause(slice: SliceSpec, allColumns: Seq[String]): String = slice match {
    case SliceSpec.Whole => ""
    case SliceSpec.Physical(pcol, n) =>
      // range form of `$partition.pf(col) = n`, with PLAIN string
      // literals: Spark's analyzer casts the string side to the COLUMN's
      // own type (date, timestamp, or ntz — the three encodings the
      // testdata contract accepts), so the predicate pushes down for
      // every one of them. A typed TIMESTAMP literal against a DATE
      // column would instead cast the COLUMN, lose PushedFilters, and
      // full-scan each physical slice — the drift the DataFrame twin
      // (Scans.physicalPartitionRange, which casts the literal) exists
      // to prevent.
      val lo = Scans.DefaultEpochYear + n
      s"WHERE ${quote(pcol)} >= '$lo-01-01' AND ${quote(pcol)} < '${lo + 1}-01-01'"
    case SliceSpec.Logical(keys, count, index) =>
      val key =
        if (keys.nonEmpty)
          // COALESCE mirrors Scans.sliceKeyPortable's NULL-safe cast:
          // a NULL key would match NO slice's WHERE, silently dropping
          // the row from the whole copy — the twins must agree on the
          // fold bit for bit
          keys.map(c => s"COALESCE(CAST(${quote(c)} AS BIGINT), 0)")
            .reduce((a, b) => s"($a * 31 + $b)")
        else s"xxhash64(${allColumns.map(quote).mkString(", ")})"
      s"WHERE pmod(abs($key), $count) = $index"
  }

  /** ORDER BY text with per-column direction — reference
    * `TableInfoCollector.cs:52-58` (computed key columns excluded).
    */
  def orderByClause(keys: Seq[SortKey]): String = {
    // filter BEFORE the emptiness check: an order hint of ONLY computed
    // keys must produce no clause at all, not a bare "ORDER BY " that
    // fails to parse
    val sortable = keys.filterNot(_.isComputed)
    if (sortable.isEmpty) ""
    else "ORDER BY " + sortable
      .map(k => s"${quote(k.col)}${if (k.descending) " DESC" else ""}")
      .mkString(", ")
  }

  /** Full generated SELECT for one work item over a registered view
    * (`fromName` overrides the FROM target when the view is registered
    * under a scoped name; the statement text is otherwise identical). */
  def selectFor(item: WorkItem, allColumns: Seq[String],
      fromName: Option[String] = None): String =
    Seq(
      s"SELECT ${selectList(allColumns, item.table.excludedColumns)}",
      s"FROM ${quote(fromName.getOrElse(item.table.name))}",
      whereClause(item.slice,
        allColumns.filterNot(item.table.excludedColumns.contains(_))),
      orderByClause(item.orderHint)
    ).filter(_.nonEmpty).mkString(" ")

  /** Register the table as a temp view and run the generated text. The
    * view name is PER-CALL unique, never the bare table name: a
    * session-global view named `lineitem` races across threads/corpora
    * sharing one session (B's re-register landing between A's register
    * and A's sql() silently resolves A's SELECT against B's corpus) and
    * permanently clobbers any user view of that name. The view is
    * dropped once the statement is ANALYZED — the returned frame holds
    * the resolved relation, not the name. */
  def run(spark: SparkSession, sfDir: String, item: WorkItem): DataFrame = {
    val df = Scans.table(spark, sfDir, item.table.name)
    val view = s"${item.table.name}_sqlgen_${java.util.UUID.randomUUID()
      .toString.replace("-", "")}"
    df.createOrReplaceTempView(view)
    try spark.sql(selectFor(item, df.columns.toSeq, fromName = Some(view)))
    finally spark.catalog.dropTempView(view)
  }
}
