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

  // (A dual-full-scan rowcountCheck(src, dst) helper existed here and
  // was removed: the committed-footer reconciliation below is the live
  // path — reference `SmartBulkCopy.cs:296-339` recounts via the
  // metadata view, not a table scan — and an unused near-twin invites
  // callers to pick the expensive one.)

  /** Committed destination row count from the parquet FOOTERS — the
    * analog of the reference's reconciliation source
    * `sys.dm_db_partition_stats` (`SmartBulkCopy.cs:302-313`), which is
    * a metadata view, not a table scan. Footers are written by the task
    * commit protocol, so their row counts ARE the committed state; no
    * data pages are read.
    */
  def committedRowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = committedFiles(spark, path)
    // Footer reads are independent metadata GETs — fan them out on a
    // bounded pool so reconciliation latency stays ~constant in file
    // count against an object store (a serial loop would tail every
    // copy with files × RTT on the driver).
    if (files.isEmpty) 0L
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(16, files.size))
      try {
        val futures = files.map { f =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            def call(): Long = {
              val in = org.apache.parquet.hadoop.util.HadoopInputFile
                .fromStatus(f, conf)
              val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
              try reader.getRecordCount finally reader.close()
            }
          })
        }
        futures.map(_.get()).sum
      } finally pool.shutdown()
    }
  }

  /** The COMMITTED parquet data files under a destination root, via the
    * Hadoop `FileSystem` of the path (works identically on local disk,
    * HDFS and object stores — never `java.io.File`). Only committed files
    * are returned: any path segment starting with `_` or `.` below the
    * root is skipped — task-attempt output under a leftover `_temporary`
    * dir (crashed prior writer) and commit-protocol markers are exactly
    * what `spark.read.parquet` itself ignores; listing them would corrupt
    * reconciliation on a subsequent append, and compaction would rewrite
    * uncommitted rows. Shared by [[committedRowCount]] and the
    * maintenance ops (`pipeline_compact`).
    */
  /** Segment-wise hidden-ness below `root`: any `_`/`.`-prefixed path
    * segment under the root marks the file uncommitted (commit-protocol
    * markers, `_temporary` staging) — a part file nested under a
    * leftover `_temporary` dir is uncommitted even though its own name
    * looks committed. ONE definition, shared by [[committedFiles]] and
    * the safety gate (`Pipeline.safetyCheck`), so a convention change
    * can never make the gate and reconciliation classify the same file
    * differently.
    */
  def hiddenBelow(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.Path => Boolean = {
    val rootPath = fs.makeQualified(root).toUri.getPath
    p => fs.makeQualified(p).toUri.getPath.stripPrefix(rootPath)
      .split('/').exists(seg => seg.startsWith("_") || seg.startsWith("."))
  }

  /** The WHOLE committed-data-file predicate (regular file, `.parquet`
    * suffix, no hidden segment) — one definition for reconciliation
    * ([[committedFiles]]) and the safety gate (`Pipeline.safetyCheck`),
    * same reasoning as [[hiddenBelow]]: a suffix-convention change
    * applied to one site only would make the gate and reconciliation
    * classify the same file differently. */
  def committedDataFile(
      isHidden: org.apache.hadoop.fs.Path => Boolean)(
      f: org.apache.hadoop.fs.FileStatus): Boolean =
    f.isFile && f.getPath.getName.endsWith(".parquet") && !isHidden(f.getPath)

  def committedFiles(
      spark: SparkSession,
      path: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val keep = committedDataFile(hiddenBelow(fs, root)) _
    val files = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      if (keep(f)) files += f
    }
    files.toSeq
  }

  /** Identity-sync analog — reference `SmartBulkCopy.cs:341-389`: read the
    * current identity value from the source (`IDENT_CURRENT` CTE) and
    * reseed the destination. For a file sink the "identity" is the max of
    * the identity column; the verify read-back (`:375-384`) is the second
    * element.
    */
  def identityCurrent(df: DataFrame, idCol: String): Long =
    // coalesce: max() is NULL on an empty (or all-NULL) source, and the
    // reference's IDENT_CURRENT answers on empty tables too — 0 makes
    // every downstream use degrade correctly (a watermark of 0 selects
    // the whole source as delta; a reseed to 0 restarts the sequence)
    // instead of an NPE aborting the run
    df.agg(coalesce(max(col(idCol)).cast("long"), lit(0L)))
      .collect()(0).getLong(0)

  /** Reseed the destination's identity generator — the file-sink analog of
    * `dbcc checkident('t', reseed, ic)` (reference `SmartBulkCopy.cs:
    * 372-374`): a table directory has no live generator, so the seed is
    * recorded in a `_graft_identity_seed.json` sidecar under the table
    * root. The `_` prefix keeps it invisible to every scan and to
    * [[committedRowCount]]/[[committedFiles]] — it is destination catalog
    * state, not data. A writer appending to the copied table continues
    * the sequence from here, exactly what the reseed buys a SQL user.
    */
  def reseedIdentity(spark: SparkSession, tablePath: String, idCol: String, seed: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(tablePath, "_graft_identity_seed.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    // Jackson-serialized, never raw interpolation: an exotic (or
    // hostile) column spelling with a quote/backslash/control char must
    // produce VALID JSON — the same threat model quoteIdent states for
    // statements; a malformed sidecar would make the read-back verify
    // throw instead of reporting a mismatch (exit 2)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().createObjectNode()
    node.put("column", idCol)
    node.put("seed", seed)
    try out.write(node.toString.getBytes("UTF-8"))
    finally out.close()
  }

  /** Destination-table existence via connection metadata — the ONE
    * definition the JDBC append guard and the streaming upsert share.
    * The name is LIKE-escaped before reaching `getTables` ('_' and '%'
    * are wildcards in its pattern argument, so an unescaped
    * "stream_events" also matches "streamXevents"), and the case-folded
    * spelling is probed too (unquoted identifiers store folded —
    * Derby/most engines upper). Throws on connection failure: absence
    * and unreachability are DIFFERENT answers, and hiding the latter
    * behind a sentinel is how a guard gets spuriously tripped or
    * silently disabled.
    */
  def jdbcTableExists(
      url: String, table: String, props: java.util.Properties): Boolean = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try jdbcTableExists(conn, table) finally conn.close()
  }

  /** Connection-reusing overload: a caller that already holds the
    * connection (the streaming upsert probes and then DELETEs on one)
    * must not pay a second connection per micro-batch for the probe.
    *
    * The probe is scoped to the connection's CURRENT schema (the schema
    * the subsequent unqualified read/load resolves against): with a null
    * schema pattern, a same-named table in ANY other schema — another
    * user's, say — would make the probe answer true while the load's
    * count resolves a DIFFERENT (or absent) table, turning the append
    * guard into either a spurious 'table not found' failure or a probe
    * of the wrong table. Drivers that don't expose a current schema
    * (null / SQLFeatureNotSupported) fall back to the unscoped search.
    * Matches are verified by exact CASE-INSENSITIVE name (and schema)
    * equality on the result rows: case-insensitive because identifier
    * case is catalog folding, not identity — a table stored as
    * `Stream_Events` on a case-insensitive engine IS the table an
    * unqualified `stream_events` load resolves, and an exact-case
    * filter would turn the probe false for it (silently disabling the
    * streaming upsert's idempotency DELETE). Wildcards stay tight
    * either way: `STREAMXEVENTS` never equals `stream_events` under
    * any case folding, so a driver reporting an empty or multi-char
    * `getSearchStringEscape` — where LIKE wildcards can't be escaped
    * at all — still can't produce a false positive via a live '_'/'%'.
    */
  def jdbcTableExists(conn: java.sql.Connection, table: String): Boolean = {
    val meta = conn.getMetaData
    // A SCHEMA-QUALIFIED name ("APP.stream_events") names its own
    // schema: the probe must scope there, not to the connection's
    // current schema — the dot is NOT part of any TABLE_NAME, so
    // passing the full string as the name pattern matches nothing and
    // the probe answers false for a table the load resolves fine
    // (silently skipping the streaming upsert's idempotency DELETE on
    // every replayed batch). Simple two-part split: the engine's names
    // never carry quoted dots.
    val dot = table.indexOf('.')
    val (schema, name) =
      if (dot > 0 && dot < table.length - 1)
        (table.substring(0, dot), table.substring(dot + 1))
      else (currentSchemaOrNull(conn), table)
    val escaped = likeEscaper(meta)
    // Schema scoping happens in the CASE-INSENSITIVE post-filter on
    // TABLE_SCHEM, with a null (unscoped) schema PATTERN: getTables
    // patterns are case-sensitive, so a pattern spelled in any one fold
    // misses a catalog that stored the schema in another ("app" never
    // pattern-matches APP even though they name the same schema) —
    // whereas equalsIgnoreCase covers every fold at once. The result
    // set stays tiny either way: it is bounded by same-NAMED tables
    // across schemas, and the name pattern is LIKE-escaped tight.
    def one(n: String): Boolean = {
      val rs = meta.getTables(null, null, escaped(n), null)
      try {
        var found = false
        while (!found && rs.next())
          found = n.equalsIgnoreCase(rs.getString("TABLE_NAME")) &&
            (schema == null || schema.equalsIgnoreCase(rs.getString("TABLE_SCHEM")))
        found
      } finally rs.close()
    }
    // probe the literal spelling plus BOTH catalog folds of the NAME:
    // engines fold unquoted DDL to upper (Derby, Oracle, DB2) or to
    // lower (PostgreSQL), and getTables name patterns are
    // case-sensitive on both — a miss here silently disables the
    // append-retry guard downstream
    Seq(name,
      name.toUpperCase(java.util.Locale.ROOT),
      name.toLowerCase(java.util.Locale.ROOT)).distinct.exists(one)
  }

  /** The connection's current schema, or null where the driver doesn't
    * expose one (pre-JDBC-4.1, or SQLFeatureNotSupported) — null means
    * "search unscoped; the exact post-filter guards". */
  private def currentSchemaOrNull(conn: java.sql.Connection): String =
    try conn.getSchema
    catch {
      case _: java.sql.SQLException => null
      case _: AbstractMethodError   => null // pre-JDBC-4.1 driver
    }

  /** LIKE-pattern escaper for `DatabaseMetaData.getTables` arguments:
    * '_' and '%' are wildcards in BOTH the schema and table pattern
    * slots, so any identifier passed there raw LIKE-matches sibling
    * names (`my_schema` matches `myXschema`). Only a single-char
    * `getSearchStringEscape` is usable in a LIKE pattern; an empty or
    * multi-char one would corrupt the pattern instead of escaping it —
    * then wildcards stay live and the caller's exact post-filter on
    * TABLE_NAME/TABLE_SCHEM is the guard. */
  private def likeEscaper(
      meta: java.sql.DatabaseMetaData): String => String = {
    val esc = meta.getSearchStringEscape
    val escOk = esc != null && esc.length == 1
    (n: String) =>
      if (!escOk) n
      else n.flatMap { c =>
        if (c.toString == esc || c == '_' || c == '%') s"$esc$c"
        else c.toString
      }
  }

  /** Live-database reseed — the literal `DBCC CHECKIDENT('t', RESEED, n)`
    * analog (reference `SmartBulkCopy.cs:372-374`) against a JDBC
    * destination: `ALTER TABLE … ALTER COLUMN … RESTART WITH n` restarts
    * the destination's identity GENERATOR (Derby's reseed statement —
    * Derby is the engine's embedded live-SQL stand-in throughout; another
    * dialect swaps the statement text here). Generator semantics:
    * `RESTART WITH n` makes `n` the NEXT generated value, so callers
    * syncing to a source `IDENT_CURRENT` of `ic` pass `ic + 1` — the
    * post-copy insert then continues the sequence exactly where the
    * source left off (proved live by `jdbc_identity_reseed`).
    */
  def reseedIdentityJdbc(
      url: String, table: String, idCol: String, restartWith: Long,
      // same credential channel as every other JDBC entry point here —
      // a credentialed destination that copies fine must not fail its
      // identity sync because this one call dropped the Properties
      props: java.util.Properties = new java.util.Properties()): Unit = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val target = resolveIdentityTarget(conn, table, idCol).getOrElse(
        throw new java.sql.SQLException(
          s"identity target $table.$idCol not found in destination catalog"))
      val st = conn.createStatement()
      try st.execute(
        s"""ALTER TABLE ${quoteIdent(target._1)} ALTER COLUMN ${quoteIdent(target._2)} RESTART WITH $restartWith""")
      finally st.close()
    } finally conn.close()
  }

  /** SQL-safe identifier quoting: the stored catalog spelling wrapped in
    * double quotes with embedded quotes doubled — identifiers never reach
    * a statement string raw, so an exotic (or hostile) config/catalog name
    * can neither break the statement nor inject SQL.
    */
  private def quoteIdent(name: String): String =
    "\"" + name.replace("\"", "\"\"") + "\""

  /** One-scalar destination rowcount over a plain JDBC connection — the
    * probe the append-retry guard and the reconciliation counter use.
    * `spark.read.jdbc(...).count()` is the wrong tool here: the V1 JDBC
    * relation has no aggregate pushdown, so a "count" streams one value
    * per row through a single connection — O(rows) transfer per probe,
    * run once pre-load plus once per retry attempt, minutes against a
    * big destination. `SELECT COUNT(*)` returns one scalar and lets the
    * database do what databases do. The identifier resolves through the
    * stored catalog spelling where available (same case rules as the
    * identity sync); a table the catalog probe can't resolve counts
    * under its literal quoted spelling and fails loudly if absent.
    */
  def jdbcRowCount(
      url: String, table: String, props: java.util.Properties): Long = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try rowCountOn(conn, table) finally conn.close()
  }

  /** Existence-guarded rowcount on ONE connection — the append-retry
    * guard's probe (`Pipeline.copyTableJdbc`). None = table absent (a
    * legitimate first load). Folding exists + count into a single
    * connection matters because the guard probes once pre-load PLUS
    * once per retry attempt: the split form paid two connections per
    * probe (the exact cost the connection-reusing jdbcTableExists
    * overload was created to avoid).
    */
  def jdbcRowCountIfExists(
      url: String, table: String,
      props: java.util.Properties): Option[Long] = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      if (!jdbcTableExists(conn, table)) None
      else Some(rowCountOn(conn, table))
    } finally conn.close()
  }

  private def rowCountOn(conn: java.sql.Connection, table: String): Long = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(s"SELECT COUNT(*) FROM ${countIdentifier(conn, table)}")
      try { rs.next(); rs.getLong(1) } finally rs.close()
    } finally st.close()
  }

  /** The SQL identifier the COUNT statement names — the count path's
    * twin of jdbcTableExists' two-part split. A SCHEMA-QUALIFIED name
    * ("APP.stream_events") must quote each part SEPARATELY: wrapping the
    * whole dotted string as one identifier produces
    * `SELECT COUNT(*) FROM "APP.stream_events"` — a single (absent)
    * table whose name contains a dot — so the append-retry probe would
    * report exists=true (the existence overload splits correctly) and
    * then fail the count, aborting a load whose first-load path worked
    * fine before the qualified-name support landed. Each part resolves
    * to its STORED catalog spelling where the catalog can supply one
    * (same fold rules as the unqualified path); an unresolvable name
    * counts under its literal quoted parts and fails loudly if absent.
    */
  private def countIdentifier(conn: java.sql.Connection, table: String): String = {
    val dot = table.indexOf('.')
    if (dot > 0 && dot < table.length - 1) {
      val (schemaPart, namePart) = (table.substring(0, dot), table.substring(dot + 1))
      val stored =
        try storedQualifiedName(conn, schemaPart, namePart)
        catch { case _: java.sql.SQLException => None }
      val (s, n) = stored.getOrElse((schemaPart, namePart))
      quoteIdent(s) + "." + quoteIdent(n)
    } else {
      val stored =
        try storedTableName(conn, table) catch { case _: java.sql.SQLException => None }
      quoteIdent(stored.getOrElse(table))
    }
  }

  /** The STORED catalog spellings of a schema-qualified (schema, table)
    * pair, case-insensitively on BOTH parts — the qualified twin of
    * [[storedTableName]]. The schema PATTERN slot is left null and the
    * scope enforced by a case-insensitive post-filter on TABLE_SCHEM
    * (patterns are case-sensitive, so any one spelling of the schema
    * would miss a catalog that folded it differently — the same
    * reasoning as jdbcTableExists); the name pattern is probed across
    * the literal spelling plus both catalog folds, LIKE-escaped, which
    * bounds the result set to same-named tables across schemas. An
    * exact-case match on both parts wins; otherwise a UNIQUE
    * case-insensitive match; ambiguity resolves to None — the caller
    * falls back to the literal spelling rather than guess.
    */
  private def storedQualifiedName(
      conn: java.sql.Connection, schema: String,
      name: String): Option[(String, String)] = {
    val meta = conn.getMetaData
    val escaped = likeEscaper(meta)
    var exact: Option[(String, String)] = None
    val folded = scala.collection.mutable.LinkedHashSet.empty[(String, String)]
    val patterns = Seq(name,
      name.toUpperCase(java.util.Locale.ROOT),
      name.toLowerCase(java.util.Locale.ROOT)).distinct
    patterns.foreach { pat =>
      if (exact.isEmpty) {
        val rs = meta.getTables(null, null, escaped(pat), null)
        try while (exact.isEmpty && rs.next()) {
          val s = rs.getString("TABLE_SCHEM")
          val n = rs.getString("TABLE_NAME")
          if (s != null && s.equalsIgnoreCase(schema) && n.equalsIgnoreCase(name)) {
            if (s == schema && n == name) exact = Some((s, n))
            else folded += ((s, n))
          }
        } finally rs.close()
      }
    }
    exact.orElse(if (folded.size == 1) folded.headOption else None)
  }

  /** The STORED catalog spelling of a table name in the connection's
    * current schema (case-insensitive lookup, exact match preferred) —
    * so quoted statements hit the same table an unqualified Spark load
    * resolves, whatever the catalog's fold. */
  private def storedTableName(
      conn: java.sql.Connection, table: String): Option[String] = {
    val meta = conn.getMetaData
    val schema = currentSchemaOrNull(conn)
    // The schema is LIKE-ESCAPED like every other getTables pattern slot
    // (a schema containing '_' would otherwise match sibling schemas and
    // a same-named table there would break the unique-folded-name rule),
    // and result rows are verified on TABLE_SCHEM besides — escaping
    // alone can't guard when the driver's escape char is unusable.
    val escaped = likeEscaper(meta)
    val rs = meta.getTables(
      null, if (schema == null) null else escaped(schema), "%", null)
    try {
      var exact: Option[String] = None
      val folded = scala.collection.mutable.Buffer.empty[String]
      while (rs.next()) {
        val inSchema = schema == null ||
          schema.equalsIgnoreCase(rs.getString("TABLE_SCHEM"))
        if (inSchema) {
          val n = rs.getString("TABLE_NAME")
          if (n == table) exact = Some(n)
          else if (n.equalsIgnoreCase(table)) folded += n
        }
      }
      exact.orElse(if (folded.size == 1) folded.headOption else None)
    } finally rs.close()
  }

  /** Resolve the STORED spellings of (table, identity column) from the
    * destination catalog, case-insensitively on BOTH identifiers — a
    * destination created with unquoted DDL stores them uppercase, one
    * created with quoted lowercase DDL stores them as written; the sync
    * must find the generator either way. An exact-case match wins;
    * otherwise a UNIQUE case-insensitive match; two columns differing only
    * by case resolve to None — unverifiable, never a guess.
    */
  private def resolveIdentityTarget(
      conn: java.sql.Connection, table: String, idCol: String): Option[(String, String)] = {
    val st = conn.prepareStatement(
      """SELECT t.TABLENAME, c.COLUMNNAME FROM SYS.SYSCOLUMNS c
        |JOIN SYS.SYSTABLES t ON c.REFERENCEID = t.TABLEID
        |WHERE UPPER(t.TABLENAME) = UPPER(?) AND UPPER(c.COLUMNNAME) = UPPER(?)""".stripMargin)
    try {
      st.setString(1, table)
      st.setString(2, idCol)
      val rs = st.executeQuery()
      val rows = Iterator.continually(rs)
        .takeWhile(_.next())
        .map(r => (r.getString(1), r.getString(2)))
        .toList
      rows.find { case (t, c) => t == table && c == idCol }
        .orElse(if (rows.size == 1) rows.headOption else None)
    } finally st.close()
  }

  /** Read-back of a live destination's identity generator from the Derby
    * catalog (`SYS.SYSCOLUMNS.AUTOINCREMENTVALUE`) — the second
    * `IDENT_CURRENT` probe (`SmartBulkCopy.cs:375-384`) for the JDBC
    * sink: the reseed must be OBSERVABLE on the destination, never
    * assumed. `None` when the column carries no generator (the
    * destination's `TableHasIdentity = 0` case — and the unverifiable-
    * reseed failure class when a sync was requested anyway). Identifier
    * matching is case-insensitive on BOTH table and column (via
    * [[resolveIdentityTarget]]) so a destination whose identity column was
    * created unquoted (stored uppercase) still verifies.
    */
  def identitySeedJdbc(url: String, table: String, idCol: String,
      props: java.util.Properties = new java.util.Properties()): Option[Long] = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      resolveIdentityTarget(conn, table, idCol).flatMap { case (t, c) =>
        val st = conn.prepareStatement(
          """SELECT c.AUTOINCREMENTVALUE FROM SYS.SYSCOLUMNS c
            |JOIN SYS.SYSTABLES t ON c.REFERENCEID = t.TABLEID
            |WHERE t.TABLENAME = ? AND c.COLUMNNAME = ?""".stripMargin)
        try {
          st.setString(1, t)
          st.setString(2, c)
          val rs = st.executeQuery()
          if (!rs.next()) None
          else {
            val v = rs.getLong(1)
            if (rs.wasNull()) None else Some(v)
          }
        } finally st.close()
      }
    } finally conn.close()
  }

  /** Read-back of the destination identity seed — the second
    * `IDENT_CURRENT` probe of the reference's sync
    * (`SmartBulkCopy.cs:375-384`): the reseed must be OBSERVABLE on the
    * destination, never assumed. `None` when no seed was ever recorded
    * (the destination's `TableHasIdentity = 0` case).
    */
  def identitySeed(spark: SparkSession, tablePath: String): Option[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(tablePath, "_graft_identity_seed.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(p)
      try in.readFully(0L, buf) finally in.close()
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new String(buf, "UTF-8"))
      Some((node.get("column").asText(), node.get("seed").asLong()))
    }
  }
}
