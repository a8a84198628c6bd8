package graft

import org.apache.spark.sql.SparkSession
import graft.exec.{Pipeline, Scans, Sinks}
import graft.meta.Catalog
import graft.model._
import graft.plan.{Analyzer, PlanConfig}

/** Process entry point for a whole-catalog copy run, mapping the outcome
  * to the reference's exit-code taxonomy so a caller scripting the engine
  * can branch on the failure class — reference `Program.cs:9-27` returning
  * `SmartBulkCopy.Copy()`'s int (`SmartBulkCopy.cs:74-250`):
  *
  *   - analysis failure → the `AnalysisOutcome` enum ORDINAL
  *     (`return (int)(tar.Outcome)`, `SmartBulkCopy.cs:158-161`; enum
  *     values `TableAnalyzer.cs:10-19`) — e.g. FKs on the destination
  *     exit with 5, a temporal destination with 6;
  *   - copy-phase task errors → 3 (`SmartBulkCopy.cs:246-250`);
  *   - rowcount reconciliation mismatch → 2 (`SmartBulkCopy.cs:220-224`;
  *     the reference reuses 2 for a missing source table via the enum
  *     ordinal — a collision we reproduce faithfully);
  *   - success → 0.
  *
  * Phase order mirrors the orchestrator: expand table list → analyze ALL
  * tables (fail fast before any copy, `SmartBulkCopy.cs:155-161`) → copy
  * each → reconcile each (`CheckResults`, `SmartBulkCopy.cs:216-245`).
  */
object Copy {

  /** Reference `TableAnalyzer.cs:10-19` ordinals (Success=0,
    * AnalysisNotCompleted=1, SourceTableDoNotExist=2,
    * DestinationTableDoNotExists=3, SecondaryIndexFoundOnDestination=4,
    * ForeignKeysFoundOnDestination=5, DestinationIsTemporalTable=6).
    * Our model merges the two not-found cases into [[AnalysisOutcome.TableNotFound]],
    * mapped to the source-side ordinal.
    */
  def analysisExitCode(o: AnalysisOutcome): Int = o match {
    case _: AnalysisOutcome.Success                       => 0
    case AnalysisOutcome.TableNotFound                    => 2
    case AnalysisOutcome.SecondaryIndexFoundOnDestination => 4
    case AnalysisOutcome.ForeignKeysFoundOnDestination    => 5
    case AnalysisOutcome.TemporalTableOnDestination       => 6
  }

  /** Run a full copy and return the process exit code (testable seam —
    * `main` wraps it in `sys.exit`).
    *
    * `destDir` selects the sink kind: a filesystem path lands parquet
    * tables; a `jdbc:` URL lands batched partition-parallel INSERTs into
    * the live database (the reference's actual destination shape), with
    * reconciliation counting the destination table and `sync-identity`
    * reseeding the real generator via `ALTER TABLE … RESTART WITH`
    * ([[Sinks.reseedIdentityJdbc]]) instead of the sidecar.
    *
    * `destMeta` overrides the destination-side [[TableMeta]] per table
    * (the analog of collecting the destination catalog,
    * `SmartBulkCopy.cs:143-152`); tables without an override get a clean
    * heap destination. `postCopyHook` runs inside each table's copy
    * phase, after its load — a throw there is a copy-phase task error
    * (exit 3), and destination interference it causes (extra committed
    * files) surfaces in the reconciliation phase (exit 2), exactly the
    * two runtime failure classes the reference distinguishes.
    */
  def run(
      spark: SparkSession,
      sfDir: String,
      destDir: String,
      patterns: Seq[String],
      conf: PlanConfig = PlanConfig(),
      destMeta: Map[String, TableMeta] = Map.empty,
      postCopyHook: String => Unit = _ => (),
      /** reference `truncate-tables` (default false,
        * `SmartBulkCopyConfig.cs:104` — matched here so a caller porting
        * a reference workflow gets append-not-destroy semantics unless
        * they opt in): OFF appends, so a non-empty destination surfaces
        * as a reconciliation mismatch (exit 2). The argv entry point
        * passes true explicitly to keep its historical truncate-first
        * behavior. */
      truncateTables: Boolean = false,
      retryMaxAttempts: Int = 5,
      retryDelayIncrementMs: Long = 0L,
      /** reference `safe-check` (`SmartBulkCopy.cs:111-133`):
        * `"readonly"` snapshots each source's committed-file footprint
        * (mtime+length) before the copy phase and re-stats after — any
        * delta fails the run with 2, the immutability violation the gate
        * exists for. `"snapshot"` trusts an external snapshot (parquet
        * inputs are immutable paths; nothing to re-check); `"none"`
        * skips the stability probe entirely. */
      safeCheck: String = "readonly",
      /** reference `command-timeout` (`SmartBulkCopyConfig.cs:93-102`,
        * applied per SQL command): a per-table bound on the copy. Each
        * table's load runs under its own Spark job group; a table still
        * loading at the deadline has its job group cancelled and counts
        * as a copy-phase task error (exit 3) instead of wedging the run.
        * <=0 disables the bound. */
      commandTimeoutSec: Int = 0,
      /** reference `sync-identity` (`SmartBulkCopy.cs:227-244`): after a
        * clean CheckResults, for every copied table with an identity
        * column read the source `IDENT_CURRENT`, reseed the destination,
        * and read the seed back — an unverifiable reseed fails the run
        * with 2 (`:375-384`). */
      syncIdentity: Boolean = false,
      /** reseed executor (testable seam, defaults to the real sidecar
        * write): the spec injects a faulty reseed to prove the read-back
        * verify catches it, the reference's error branch. FILE-SINK ONLY:
        * a `jdbc:` destination always reseeds the live generator via
        * [[Sinks.reseedIdentityJdbc]] (its failure branch is exercised
        * against a real generator-less Derby table in CopySpec). */
      reseedIdentity: (SparkSession, String, String, Long) => Unit =
        Sinks.reseedIdentity): Int = {
    // Sink-kind switch: a `jdbc:` destination runs the copy, the
    // reconciliation count, and the identity sync against the LIVE
    // database (the reference's actual destination shape) instead of the
    // parquet file sink. Everything source-side — analysis, safe-check
    // footprints, timeouts — is sink-agnostic and shared.
    // normalize + validate the safe-check mode HERE, not just in the
    // config loader: a direct caller passing the config surface's
    // "read-only" spelling (or any typo) would otherwise silently run
    // with the immutability gate OFF — exactly the failure the gate
    // exists to catch. IllegalArgumentException maps to exit 1 in main.
    // SHARED normalizer with the loader, so the mode list cannot fork.
    val safeCheckMode = CopyConfig.normalizeSafeCheck(safeCheck)
    val jdbcDest = destDir.startsWith("jdbc:")
    def jdbcProps: java.util.Properties = {
      val p = new java.util.Properties()
      if (destDir.startsWith("jdbc:derby:"))
        p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      p
    }
    val tables = Pipeline.expandTableList(patterns)
    // an empty expansion (e.g. a typo'd wildcard matching nothing) must
    // NOT fall through to a vacuous success: every later phase iterates
    // the empty list and the run would exit 0 having copied nothing —
    // the reference aborts when the table list is empty
    if (tables.isEmpty) {
      System.err.println(
        s"[copy] table list is empty (patterns: ${patterns.mkString(",")})")
      return analysisExitCode(AnalysisOutcome.TableNotFound)
    }

    // Analysis phase: collect + analyze every table BEFORE any copy —
    // the first non-success outcome aborts the whole run with its code.
    val analyzed: Seq[(TableMeta, TableMeta)] = tables.map { t =>
      if (!Catalog.declared.contains(t) || !Pipeline.safetyCheck(spark, sfDir, t))
        return analysisExitCode(AnalysisOutcome.TableNotFound)
      val src = Catalog.collect(spark, sfDir, t)
      val dst = destMeta.getOrElse(t, Pipeline.cleanDest(src))
      Analyzer.analyze(src, dst, conf) match {
        case _: AnalysisOutcome.Success => (src, dst)
        case failure                    => return analysisExitCode(failure)
      }
    }

    // safe-check "readonly": footprint snapshot BEFORE the first slice
    // reads — stability is re-verified after the copy phase.
    val preFootprint: Map[String, Map[String, (Long, Long)]] =
      if (safeCheckMode == "readonly")
        analyzed.map { case (src, _) =>
          src.name -> Pipeline.sourceFootprint(spark, sfDir, src.name)
        }.toMap
      else Map.empty

    // Copy phase: per-table errors don't stop the other tables (the
    // reference's worker pool drains the whole queue; errored items are
    // counted, `SmartBulkCopy.cs:246-250`).
    var erroredTasks = 0
    analyzed.foreach { case (src, dst) =>
      try {
        withCommandTimeout(spark, src.name, commandTimeoutSec) {
          if (jdbcDest)
            Pipeline.copyTableJdbc(spark, sfDir, destDir, jdbcProps, src, dst,
              conf, truncateDest = truncateTables,
              retryMaxAttempts = retryMaxAttempts,
              retryDelayIncrementMs = retryDelayIncrementMs)
          else
            // reconcile = false: this orchestrated path runs its own
            // CheckResults phase over ALL tables below — the reference's
            // single reconciliation point — so copyTable's per-table
            // count pair would re-list every destination's footers (and
            // re-scan a stats-less source) for a result nobody reads
            Pipeline.copyTable(spark, sfDir, destDir, src, dst, conf,
              truncateDest = truncateTables,
              retryMaxAttempts = retryMaxAttempts,
              retryDelayIncrementMs = retryDelayIncrementMs,
              reconcile = false)
          postCopyHook(src.name)
        }
      } catch { case e: Exception =>
        // the reference's worker pool logs errored items as it counts
        // them — an exit 3 with no line naming the failed table(s) gives
        // the operator nothing to act on
        System.err.println(s"[copy] ${src.name} failed: $e")
        erroredTasks += 1
      }
    }
    if (erroredTasks > 0) return 3

    // safe-check "readonly" re-stat: a source whose committed footprint
    // changed under the running slices may have fed different slices
    // different data — fail hard even if rowcounts happen to agree.
    val mutatedSources = preFootprint.exists { case (name, before) =>
      Pipeline.sourceFootprint(spark, sfDir, name) != before
    }
    if (mutatedSources) return 2

    // CheckResults phase (`SmartBulkCopy.cs:216-245`): recount both ends
    // after ALL copies are done. Source side reuses the analysis-phase
    // count ONLY when the run holds evidence it is still current:
    //   - "readonly": the footprint re-stat above just proved every
    //     source byte-identical since that count was taken — a recount
    //     would double the run's source-side IO at 100 TB for zero
    //     extra verification;
    //   - "snapshot": the caller DECLARED the inputs externally
    //     immutable (an immutable snapshot path); trusting the declared
    //     count is that mode's contract — a caller who wants the gate
    //     picks readonly;
    //   - "none": no stability evidence of any kind, so CheckResults
    //     recounts the source for real, reproducing the reference's
    //     unconditional recount — otherwise a source mutated during the
    //     copy would silently pass the final rowcount gate on the
    //     stale analysis-phase number (and the per-process
    //     Catalog.collect cache would keep feeding that stale count to
    //     every later phase).
    val allMatch = analyzed.forall { case (src, dst) =>
      val destRows =
        // one-scalar COUNT(*) (Sinks.jdbcRowCount): spark.read.jdbc's
        // V1 relation has no aggregate pushdown, so counting through it
        // streams O(rows) over one connection per reconciled table
        if (jdbcDest) Sinks.jdbcRowCount(destDir, dst.name, jdbcProps)
        else Sinks.committedRowCount(spark, s"$destDir/${dst.name}.parquet")
      val srcRows =
        if (safeCheckMode != "none" && src.rowCount > 0L) src.rowCount
        else Scans.table(spark, sfDir, src.name).count()
      srcRows == destRows
    }
    if (!allMatch) return 2

    // SyncIdentity (`SmartBulkCopy.cs:227-244`): only after ALL rowcounts
    // check out; tables without an identity column are skipped (the
    // reference CTE's TableHasIdentity filter). Reseed to the source's
    // current value, then verify by reading the destination back.
    if (syncIdentity) {
      val synced = analyzed.forall { case (src, dst) =>
        Catalog.identityColumns.get(src.name).forall { idCol =>
          val ic = Sinks.identityCurrent(
            Scans.table(spark, sfDir, src.name), idCol)
          if (jdbcDest) {
            // live generator: RESTART WITH sets the NEXT value, so the
            // sequence continues after the source's IDENT_CURRENT; a
            // destination without the generator (or any reseed failure)
            // is the reference's unverifiable-reseed branch → 2
            try {
              Sinks.reseedIdentityJdbc(destDir, dst.name, idCol, ic + 1, jdbcProps)
              Sinks.identitySeedJdbc(destDir, dst.name, idCol, jdbcProps)
                .contains(ic + 1)
            } catch { case _: java.sql.SQLException => false }
          } else {
            val dest = s"$destDir/${dst.name}.parquet"
            reseedIdentity(spark, dest, idCol, ic)
            Sinks.identitySeed(spark, dest).contains((idCol, ic))
          }
        }
      }
      if (!synced) return 2
    }
    0
  }

  /** Per-table copy bound — the reference's `command-timeout` realized on
    * Spark's cancellation surface: the body runs on a dedicated thread
    * whose jobs all carry one job group; at the deadline the group is
    * cancelled (`interruptOnCancel = true` interrupts running tasks) and
    * a [[java.util.concurrent.TimeoutException]] propagates to the
    * copy-phase error counter. Thread-locality of `setJobGroup` is the
    * reason for the dedicated thread: the group must tag exactly this
    * table's jobs, not whatever else the caller's thread submits next.
    */
  private[graft] def withCommandTimeout[T](
      spark: SparkSession, table: String, timeoutSec: Int)(body: => T): T = {
    if (timeoutSec <= 0) return body
    val sc = spark.sparkContext
    val groupId = s"graft-copy-$table"
    // named + daemon: the worker is identifiable in thread dumps (the
    // cleanup spec counts survivors by this prefix) and can never pin a
    // JVM exit if an interrupt is swallowed mid-shutdown
    val exec = java.util.concurrent.Executors.newSingleThreadExecutor(
      new java.util.concurrent.ThreadFactory {
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-copy-timeout-$table")
          t.setDaemon(true)
          t
        }
      })
    val fut = exec.submit(new java.util.concurrent.Callable[T] {
      def call(): T = {
        sc.setJobGroup(groupId, s"graft copy $table", interruptOnCancel = true)
        try body finally sc.clearJobGroup()
      }
    })
    try fut.get(timeoutSec.toLong, java.util.concurrent.TimeUnit.SECONDS)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        sc.cancelJobGroup(groupId)
        fut.cancel(true)
        throw new java.util.concurrent.TimeoutException(
          s"command-timeout: copy of $table exceeded ${timeoutSec}s")
      case e: java.util.concurrent.ExecutionException =>
        // rethrow the CAUSE unconditionally: an Error cause (OOM,
        // LinkageError) kept inside the ExecutionException wrapper would
        // be caught by the copy phase's `case e: Exception` counter and
        // downgrade a fatal JVM condition to one errored table — the
        // run would keep copying in a heap-exhausted JVM. Without a
        // timeout the same Error crashes the run; behavior must not
        // diverge on a config knob.
        throw Option[Throwable](e.getCause).getOrElse(e)
    } finally exec.shutdownNow()
  }

  /** Config-file entry (testable seam): load the reference-schema JSON at
    * `path` and run the copy it describes. Any config-load failure exits
    * 1 — the reference crashes out of `Program.cs` main on
    * `ArgumentException`, i.e. non-zero to the shell before any copy.
    */
  def runFromConfigFile(
      spark: SparkSession,
      path: String,
      env: String => Option[String] = sys.env.get): Int = {
    // only the LOAD maps to exit 1 — a runtime failure during the copy
    // itself must keep its own class (crash, or run()'s 2/3), never be
    // mislabeled a config error
    val cfg =
      try CopyConfig.load(path, env)
      catch {
        case e @ (_: IllegalArgumentException | _: java.io.IOException) =>
          System.err.println(s"graft.Copy config error: ${e.getMessage}")
          return 1
      }
    // the reference's compatibility-mode only switches its bulk-write
    // call style (sync WriteToServer vs async, SmartBulkCopy.cs:78-80,
    // :528-535) with identical results and logs the mode; Spark writes
    // are already synchronous, so the mode is acknowledged, not silent
    if (cfg.compatibilityMode)
      System.err.println("[copy] compatibility-mode requested: write path " +
        "is already synchronous in this engine; results are identical")
    run(spark, cfg.sourceDir, cfg.destDir, cfg.tablePatterns, cfg.plan,
      truncateTables = cfg.truncateTables,
      retryMaxAttempts = cfg.retryMaxAttempt,
      // the reference's delay-increment is seconds between attempts
      // (SmartBulkCopyConfig.cs:112, attempt backoff at SmartBulkCopy.cs)
      retryDelayIncrementMs = cfg.retryDelayIncrement * 1000L,
      safeCheck = cfg.safeCheck,
      commandTimeoutSec = cfg.commandTimeout,
      syncIdentity = cfg.syncIdentity)
  }

  def main(args: Array[String]): Unit = {
    val viaConfig = args.headOption.contains("--config")
    val sfDir = args.headOption.filterNot(_ == "--config").getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    val destDir = args.lift(1).filter(_ => !viaConfig).getOrElse(
      s"${System.getProperty("java.io.tmpdir")}/graft_copy_run")
    val patterns = if (!viaConfig && args.length > 2) args.drop(2).toSeq else Seq("*")
    // the SHARED session config (GraftSession) — this main used to carry
    // a drifted verbatim copy, so copies could run under different
    // session semantics (extensions, aggregate headroom, warehouse) than
    // the verified engine
    val spark = GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"),
      master = sys.env.get("SPARK_GRAFT_MASTER"))
    val code =
      try {
        if (viaConfig)
          runFromConfigFile(spark, args.lift(1).getOrElse(
            throw new IllegalArgumentException("--config needs a file path")))
        // argv path keeps its historical truncate-first behavior; the
        // config path uses the reference's false default
        else run(spark, sfDir, destDir, patterns, truncateTables = true)
      } catch {
        case e: IllegalArgumentException =>
          System.err.println(s"graft.Copy usage error: ${e.getMessage}"); 1
      } finally spark.stop()
    println(s"graft.Copy exit=$code")
    sys.exit(code)
  }
}
