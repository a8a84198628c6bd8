package graft.exec

/** Embedded-Derby environment, centralized so no query body mutates
  * process-global state as a side effect of running.
  *
  * `derby.system.home` is consulted exactly once, at the engine's first
  * boot; re-pointing it later is a silent no-op for the running engine but
  * still visible to every other session sharing the JVM. So it is set HERE,
  * once, only if the embedder has not already chosen a home — session
  * setup, not query execution. All database URLs in this codebase use
  * absolute `jdbc:derby:/…` paths, so the property only governs where
  * `derby.log` lands, never where data lives.
  */
object DerbyEnv {

  /** Per-PROCESS scratch root for the bench databases, evaluated lazily
    * exactly once per JVM. Embedded Derby allows ONE booting JVM per
    * database — under a fixed shared path a second concurrent driver on
    * the machine (Verify beside a bench loop, the same dual-JVM scenario
    * the staged parquet roots defend against) fails its boot with
    * XJ040/XSDB6, a spurious error indistinguishable from a real
    * regression. The cost is that sequential runs rebuild instead of
    * truncating — each query stages its own tables anyway.
    */
  lazy val home: String = {
    // the home rides Fs.scratchBase (SPARK_GRAFT_SCRATCH, else a
    // writable RAM-backed tmpfs, else java.io.tmpdir): every Derby
    // commit fsyncs its transaction log against this filesystem — the
    // same per-operation durability I/O the streaming checkpoint WAL
    // pays — and the per-pid databases are throwaway by construction
    // (deleted at exit, unreachable by any later process)
    val h = s"${Fs.scratchBase}/graft_derby_" +
      s"${java.lang.ProcessHandle.current().pid()}"
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home", h)
    new java.io.File(h).mkdirs()
    // Per-pid naming makes the home garbage the moment this process
    // ends (no later run can reuse a dead pid's path), so reclaim it at
    // exit — the same accumulation fix the warehouse/staging/persisted-
    // state roots carry via Fs.deleteOnExit. The databases under the
    // home are shut down FIRST (so their locks/fds release before the
    // tree delete) — PER DATABASE, never the engine-wide
    // `jdbc:derby:;shutdown=true`: shutdown hooks run concurrently and
    // unordered, and an engine-wide shutdown would kill databases that
    // do not belong to graft (a host application embedding these
    // classes with its own Derby DB would lose its final commit to our
    // cleanup). Scanning for service.properties also means a run that
    // never touched Derby doesn't BOOT the engine at exit just to shut
    // it down. All steps best-effort — cleanup must never turn a clean
    // exit into a failure.
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try {
        val dirs = Option(new java.io.File(h).listFiles()).getOrElse(Array())
          .filter(d => d.isDirectory &&
            new java.io.File(d, "service.properties").isFile)
        dirs.foreach { d =>
          // Derby signals a clean single-DB shutdown by throwing 08006
          try java.sql.DriverManager.getConnection(
            s"jdbc:derby:${d.getAbsolutePath};shutdown=true")
          catch { case _: Throwable => () }
        }
      } catch { case _: Throwable => () }
      try Fs.deleteTree(java.nio.file.Paths.get(h))
      catch { case _: Exception => () }
    }, "graft-derby-cleanup"))
    h
  }

  /** Absolute path for a named long-lived database under [[home]]. */
  def dbPath(name: String): String = { home; s"$home/$name" }

  /** A fresh per-run database root — for queries whose destination must
    * not persist beyond the run. Pair with [[shutdownAndDelete]].
    */
  def scratchDbRoot(prefix: String): java.nio.file.Path = {
    home // ensure the engine boots with a home even for scratch DBs
    val root = Fs.scratchDir(prefix)
    // belt for interrupted runs: the happy path deletes via
    // shutdownAndDelete's finally, but a Ctrl-C between create and
    // finally would otherwise leak one uniquely-named Derby scratch DB
    // per interrupted run — the exact tmp-accumulation class every
    // other scratch root already guards via deleteOnExit (deleting an
    // already-deleted root is a no-op)
    Fs.deleteOnExit(root)
    root
  }

  /** Cleanly shut down ONE database (Derby signals success via
    * SQLException 08006) and remove its scratch root — the query leaves no
    * persistent database behind.
    */
  def shutdownAndDelete(dbPath: String, root: java.nio.file.Path): Unit = {
    try java.sql.DriverManager.getConnection(s"jdbc:derby:$dbPath;shutdown=true")
    catch { case _: java.sql.SQLException => () } // success path throws
    Fs.deleteTree(root)
  }
}
