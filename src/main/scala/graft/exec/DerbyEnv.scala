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

  /** Fixed scratch root for long-lived bench databases (reused across runs
    * by design — e.g. the copy-destination DBs that a later run truncates).
    * Evaluated lazily exactly once per JVM.
    */
  lazy val home: String = {
    val h = s"${System.getProperty("java.io.tmpdir")}/graft_derby"
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home", h)
    new java.io.File(h).mkdirs()
    h
  }

  /** Absolute path for a named long-lived database under [[home]]. */
  def dbPath(name: String): String = { home; s"$home/$name" }

  /** A fresh per-run database root — for queries whose destination must
    * not persist beyond the run. Pair with [[shutdownAndDelete]].
    */
  def scratchDbRoot(prefix: String): java.nio.file.Path = {
    home // ensure the engine boots with a home even for scratch DBs
    java.nio.file.Files.createTempDirectory(prefix)
  }

  /** Cleanly shut down ONE database (Derby signals success via
    * SQLException 08006) and remove its scratch root — the query leaves no
    * persistent database behind.
    */
  def shutdownAndDelete(dbPath: String, root: java.nio.file.Path): Unit = {
    try java.sql.DriverManager.getConnection(s"jdbc:derby:$dbPath;shutdown=true")
    catch { case _: java.sql.SQLException => () } // success path throws
    if (java.nio.file.Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(root)
      val paths = try walk.iterator().asScala.toSeq.reverse finally walk.close()
      paths.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
