package graft.plan

import graft.model._

/** Copy-plan configuration — the subset of the reference's JSON config
  * that drives planning (reference `client/SmartBulkCopyConfig.cs`):
  * `tasks` (1..32, `:48-58`), `batch-size` (default 100000, `:39-46`),
  * tri-modal `logical-partitions` (`"auto"` / `"<n>gb"` / count,
  * `:60-80,152-170`).
  */
sealed trait PartitionStrategy
object PartitionStrategy {
  case object Auto extends PartitionStrategy
  // non-positive values guard at CONSTRUCTION, not deep in the planner:
  // Count(0) would plan zero slices (a silent no-copy) and SizeGb(0)
  // divides to Infinity — the maximum fan-out (129 slices) for a config
  // value that is plainly invalid. The require throws
  // IllegalArgumentException, which CopyConfig's loader and Copy.main
  // already map to exit 1 like every other malformed option.
  final case class Count(n: Int) extends PartitionStrategy {
    require(n > 0, s"logical-partitions count must be positive; got: $n")
  }
  final case class SizeGb(gb: Double) extends PartitionStrategy {
    require(gb > 0, s"logical-partitions size must be positive; got: $gb")
  }
}

final case class PlanConfig(
    tasks: Int = 7,
    batchSize: Int = 100000,
    strategy: PartitionStrategy = PartitionStrategy.Auto,
    /** reference bound: logical partitions ≤ 128 (`SmartBulkCopyConfig.cs:74`) */
    maxLogicalPartitions: Int = 128,
    /** stop-if flags, default ON; an explicit false lets the copy proceed
      * past that destination condition with degraded load performance —
      * reference `SmartBulkCopyConfig.cs:10-15` ([Flags] enum, default
      * `SecondaryIndex | TemporalTable`), enforced at
      * `TableAnalyzer.cs:66-99`.
      */
    stopIfSecondaryIndex: Boolean = true,
    stopIfTemporalTable: Boolean = true) {
  require(tasks >= 1 && tasks <= 32, "tasks must be in [1,32]") // SmartBulkCopyConfig.cs:55
  // same construction-time rejection Count(0)/SizeGb(0) get: a zero
  // batch size reaches logicalPartitionCount's rowCount/(batchSize*10)
  // as a raw ArithmeticException (no exit-code line), and a negative
  // one flows silently into planning and the JDBC writer's batchsize
  require(batchSize >= 1, s"batch-size must be >= 1, got $batchSize")
}

/** The planner — Spark-native re-expression of the reference's
  * rule-based planning matrix (`client/TableAnalyzer.cs:39-352`).
  *
  * Pure function `(srcMeta, dstMeta, conf) => AnalysisOutcome`, so the
  * planner-golden tests of the reference (`tests/Heap.cs`,
  * `tests/ClusteredRowstore.cs`, `tests/ClusteredColumnstore.cs`,
  * `tests/Issues.cs`) have direct ScalaTest analogs.
  */
object Analyzer {

  /** Validity gates — reference `TableAnalyzer.cs:39-107`:
    * destination FKs always abort; secondary indexes and temporal
    * tables abort only while their stop-if flag is ON
    * (`TableAnalyzer.cs:66-99`, `tests/Misc.cs:14-38`) — turning a flag
    * off accepts the slower load instead of stopping.
    */
  def analyze(src: TableMeta, dst: TableMeta, conf: PlanConfig): AnalysisOutcome = {
    if (dst.foreignKeyCount > 0)
      AnalysisOutcome.ForeignKeysFoundOnDestination
    else if (dst.secondaryIndexCount > 0 && conf.stopIfSecondaryIndex)
      AnalysisOutcome.SecondaryIndexFoundOnDestination
    else if (dst.history.nonEmpty && conf.stopIfTemporalTable)
      AnalysisOutcome.TemporalTableOnDestination
    else
      AnalysisOutcome.Success(plan(src, dst, conf))
  }

  /** Partition decision matrix — reference `TableAnalyzer.cs:109-233`.
    *
    * Parallel load is allowed iff one of (`TableAnalyzer.cs:109-145`):
    *   - source partitioned ∧ destination heap
    *   - source heap ∧ destination heap
    *   - source unpartitioned ∧ destination heap
    *   - source and destination identically partitioned and ordered
    *   - destination columnstore
    * otherwise a single serial scan is used.
    */
  def plan(src: TableMeta, dst: TableMeta, conf: PlanConfig): Seq[WorkItem] = {
    val order = orderHint(src, dst)
    val parallelOk = parallelAllowed(src, dst)
    // Small-table bypass: single unpartitioned scan when rowcount ≤ batch
    // and size ≤ 1 GB (reference `TableAnalyzer.cs:181,212-214`).
    val small = src.rowCount <= conf.batchSize && src.sizeGb <= 1.0

    if (!parallelOk || small) {
      Seq(WorkItem(src, SliceSpec.Whole, order))
    } else if (src.isPartitioned) {
      // One work item per physical partition, all runnable in parallel
      // (reference `TableAnalyzer.cs:288-352`, fan-out at `:340-349`).
      val pcol = src.partitionCol.getOrElse(
        throw new IllegalArgumentException(s"${src.qualifiedName}: partitioned but no partition column"))
      (1 to src.partitionCount).map(n => WorkItem(src, SliceSpec.Physical(pcol, n), order))
    } else {
      val n = logicalPartitionCount(src, conf)
      if (n <= 1) Seq(WorkItem(src, SliceSpec.Whole, order))
      else {
        val keys =
          if (src.sortKeys.nonEmpty) src.sortKeys.filterNot(_.isComputed).map(_.col)
          else Nil // hash over all columns at scan-build time (physloc analog)
        (0 until n).map(i => WorkItem(src, SliceSpec.Logical(keys, n, i), order))
      }
    }
  }

  /** Reference `TableAnalyzer.cs:109-145`. */
  def parallelAllowed(src: TableMeta, dst: TableMeta): Boolean = {
    val identicallyPartitionedAndOrdered =
      src.isPartitioned && dst.isPartitioned &&
        src.partitionCol == dst.partitionCol &&
        src.partitionCount == dst.partitionCount &&
        src.sortKeys == dst.sortKeys
    (dst.storage == Storage.Heap) ||
    (dst.storage == Storage.ClusteredColumnstore) ||
    identicallyPartitionedAndOrdered
  }

  /** Order-hint election — reference `TableAnalyzer.cs:148-172`:
    * when source and destination clustered rowstore keys are identical,
    * scan ORDER BY those keys (computed key columns excluded,
    * `TableInfoCollector.cs:48,52-58`) so the destination skips its sort;
    * for partitioned heap/columnstore destinations the hint is the
    * partition key only (`SmartBulkCopy.cs:492-509`).
    */
  def orderHint(src: TableMeta, dst: TableMeta): Seq[SortKey] = {
    // "carries an ORDER BY" is Storage.ordered — the ONE definition of
    // which layouts are order-bearing (reference TableInfoCollector.cs:
    // 48,83-89), not a storage-value comparison re-derived here
    if (src.storage.ordered && dst.storage.ordered &&
        src.sortKeys.nonEmpty && src.sortKeys == dst.sortKeys)
      src.sortKeys.filterNot(_.isComputed)
    else if (dst.isPartitioned && dst.partitionCol.nonEmpty &&
             (dst.storage == Storage.Heap || dst.storage == Storage.ClusteredColumnstore))
      dst.partitionCol.map(SortKey(_)).toSeq
    else Nil
  }

  /** Logical-partition count — reference `TableAnalyzer.cs:235-286`:
    *   - Auto: 1 per GB; if &lt; 1 GB but rows &gt; batch×10, rows/(batch×10);
    *     clamp to [3, 3×tasks] (`:248-261`)
    *   - SizeGb: ceil(size / gb-per-partition)
    *   - Count: fixed
    * Capped at `maxLogicalPartitions` (`SmartBulkCopyConfig.cs:74`),
    * THEN rounded **up to odd** for better hash-mod distribution
    * (`:270`, `docs/CONFIG.md:23-32`) — so an even cap yields cap+1:
    * the result is bounded by `maxLogicalPartitions + 1`, the contract
    * the property tests pin (odd-rounding deliberately wins over the
    * exact cap).
    */
  def logicalPartitionCount(t: TableMeta, conf: PlanConfig): Int = {
    val raw: Long = conf.strategy match {
      case PartitionStrategy.Auto =>
        val byte = math.ceil(t.sizeGb).toLong
        val base =
          if (t.sizeGb >= 1.0) byte
          else if (t.rowCount > conf.batchSize.toLong * 10)
            t.rowCount / (conf.batchSize.toLong * 10)
          else 1L
        math.min(math.max(base, 3L), 3L * conf.tasks)
      case PartitionStrategy.Count(n)   => n.toLong
      case PartitionStrategy.SizeGb(gb) => math.max(1L, math.ceil(t.sizeGb / gb).toLong)
    }
    val capped = math.min(raw, conf.maxLogicalPartitions.toLong).toInt
    if (capped % 2 == 0) capped + 1 else capped // odd-rounding, TableAnalyzer.cs:270
  }
}
