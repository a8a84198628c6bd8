package graft.model

/** Core metadata model — the Spark-native re-expression of the reference's
  * per-table metadata (reference: `client/TableInfoCollector.cs:91-117`
  * `TableInfo`, `:34-67` `Index`/`IndexColumn`, `:24-28` `TableSize`,
  * `:12-23` `HistoryInfo`/`TableType`).
  *
  * The reference engine is a metadata-driven parallel dataflow pipeline:
  * it introspects a source catalog, plans partition-parallel scans, and
  * streams each scan into a transactional bulk insert. Here the same
  * model drives a planner (`graft.plan.Analyzer`) that emits [[WorkItem]]s
  * executed as Spark jobs (`graft.exec.Pipeline`).
  */

/** Storage layout of a table — reference `TableInfoCollector.cs:69-89`
  * (`UnknownIndex` / `Heap` / `RowStoreClusteredIndex` /
  * `ColumnStoreClusteredIndex`).
  */
sealed trait Storage {
  /** Only a rowstore clustered index carries an ORDER BY key list
    * (reference `TableInfoCollector.cs:48,52-58`; columnstore renders an
    * empty ORDER BY, `:83-89`).
    */
  def ordered: Boolean = this == Storage.ClusteredRowstore
}
object Storage {
  case object Heap extends Storage
  case object ClusteredRowstore extends Storage
  case object ClusteredColumnstore extends Storage
}

/** One key column of an index with its sort direction — reference
  * `TableInfoCollector.cs:34-40` (`IndexColumn.IsDescending`,
  * `IsComputed`). The reference's `PartitionOrdinal` fact lives in
  * [[TableMeta.partitionCol]] (and the synthesized
  * `sys.index_columns.partition_ordinal` in `graft.meta.Catalog`), not
  * here — a field on this class would be a second, never-read copy.
  */
final case class SortKey(
    col: String,
    descending: Boolean = false,
    isComputed: Boolean = false)

/** Temporal-table orchestration metadata — reference
  * `TableInfoCollector.cs:12-18`.
  */
final case class HistoryInfo(
    historyTable: String,
    periodStartColumn: String,
    periodEndColumn: String,
    retentionDays: Int) // -1 == INFINITE (reference `TableInfoCollector.cs:447` ISNULL(NULLIF(...),-1))

/** Catalog entry for one table — reference `TableInfoCollector.cs:91-117`. */
final case class TableMeta(
    schema: String,
    name: String,
    storage: Storage,
    sortKeys: Seq[SortKey] = Nil,
    partitionCol: Option[String] = None,
    partitionCount: Int = 1,
    rowCount: Long = 0L,
    sizeBytes: Long = 0L,
    secondaryIndexCount: Int = 0,
    foreignKeyCount: Int = 0,
    history: Option[HistoryInfo] = None,
    /** columns dropped from the copy projection: computed / column-set /
      * rowversion (reference `TableInfoCollector.cs:395-408`). */
    excludedColumns: Seq[String] = Nil) {
  def qualifiedName: String = s"$schema.$name"
  def isPartitioned: Boolean = partitionCount > 1
  def sizeGb: Double = sizeBytes / (1024.0 * 1024.0 * 1024.0)
}

/** How one work item slices its table — reference `CopyInfo.cs:34-68`
  * (`NoPartitionsCopyInfo` / `PhysicalPartitionCopyInfo` /
  * `LogicalPartitionCopyInfo`).
  */
sealed trait SliceSpec {
  /** Human-readable predicate, mirroring the reference's generated WHERE
    * text (`CopyInfo.cs:47-56`, `:58-68`). */
  def describe: String
}
object SliceSpec {
  /** Whole-table scan, no predicate (`CopyInfo.cs:34-44`). */
  case object Whole extends SliceSpec {
    def describe = ""
  }
  /** One physical partition: the reference emits
    * `WHERE $partition.pf(col) = n` (`CopyInfo.cs:47-56`); on a
    * partition-keyed file source this is partition pruning on the key
    * column value.
    */
  final case class Physical(partitionCol: String, partitionNumber: Int)
      extends SliceSpec {
    def describe = s"$$partition($partitionCol) = $partitionNumber"
  }
  /** One hash-mod logical slice of an unpartitioned table: the reference
    * emits `WHERE ABS(CAST(%%PhysLoc%% AS BIGINT)) % N = i`
    * (`CopyInfo.cs:58-68`). `%%PhysLoc%%` has no Spark meaning; the
    * faithful contract is "deterministic, disjoint, exhaustive slicing of
    * an immutable snapshot" — realized as `pmod(hash(keys), N) = i`.
    */
  final case class Logical(keyCols: Seq[String], count: Int, index: Int)
      extends SliceSpec {
    // mirrors the REAL predicate both realizations emit (Scans.
    // sliceKeyPortable / SqlGen.whereClause): a LEFT-NESTED integer
    // 31-fold over the key columns — ((a*31+b)*31+c), the same reduce
    // both executors run, NOT the flat a*31+b*31+c a plain mkString
    // would render; never Spark's hash(). Keyed equality with the
    // generated SQL is pinned in PlannerSpec. The key-less form hashes
    // the work item's SELECTED column list, which this slice object
    // does not carry — the placeholder says so explicitly, because a
    // literal `xxhash64(*)` pasted over the raw table would hash the
    // EXCLUDED columns too and select different rows than the executor
    // (SqlGen.whereClause enumerates the filtered list).
    def describe =
      if (keyCols.nonEmpty) {
        // COALESCE mirrors the executors' NULL-safe cast (a NULL key
        // folds as 0 so the row still lands in exactly one slice)
        val fold = keyCols
          .map(c => s"COALESCE(CAST(`${c.replace("`", "``")}` AS BIGINT), 0)")
          .reduce((a, b) => s"($a * 31 + $b)")
        s"pmod(abs($fold), $count) = $index"
      } else s"pmod(abs(xxhash64(<selected columns>)), $count) = $index"
  }
}

/** One independent scan→load work item — reference `CopyInfo.cs:13-32`.
  * The reference's only IR is a flat `List&lt;CopyInfo&gt;` drained by a
  * worker pool; in Spark the fan-out is encoded in the DataFrame's
  * partitioning and the scheduler replaces the queue.
  */
final case class WorkItem(
    table: TableMeta,
    slice: SliceSpec,
    /** ORDER BY keys for the scan / order hint for the insert — only when
      * source & destination clustered keys match
      * (`TableAnalyzer.cs:148-172`, `SmartBulkCopy.cs:429-438,492-509`). */
    orderHint: Seq[SortKey])

/** Planner outcome codes — reference `TableAnalyzer.cs:10-19` mapped to
  * process exit codes in `SmartBulkCopy.cs:158-161`.
  */
sealed trait AnalysisOutcome
object AnalysisOutcome {
  final case class Success(items: Seq[WorkItem]) extends AnalysisOutcome
  case object TableNotFound extends AnalysisOutcome
  case object ForeignKeysFoundOnDestination extends AnalysisOutcome
  case object SecondaryIndexFoundOnDestination extends AnalysisOutcome
  case object TemporalTableOnDestination extends AnalysisOutcome
}
