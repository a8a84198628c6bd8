package graft

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import graft.plan.{PartitionStrategy, PlanConfig}

/** JSON config file for the `graft.Copy` entry point — the reference's
  * `smartbulkcopy.config` surface (`SmartBulkCopyConfig.cs:118-222`,
  * golden fixture `tests/smartbulkcopy.config.test.json`):
  *
  *   - `source` / `destination` → `connection-string`, falling back to
  *     the `source-connection-string` / `destination-connection-string`
  *     process environment variables when the key is absent
  *     (`SmartBulkCopyConfig.cs:141-142`). For this engine a "connection
  *     string" is the directory holding the parquet tables.
  *   - `tables`: `include`/`exclude` arrays mapped to ordered `+:`/`-:`
  *     fold entries (`SmartBulkCopyConfig.cs:204-214`), or the legacy
  *     flat `tables` array passed through verbatim (`:215-219`) — both
  *     feed [[graft.exec.Pipeline.expandTableList]]'s ordered fold.
  *   - `options`: `tasks`, `batch-size`, tri-modal `logical-partitions`
  *     (`"auto"` | `"<n>gb"` | `"<count>"`, `:152-170`), `safe-check`
  *     (`none|readonly|read-only|snapshot`, `:174-193`), `stop-if`
  *     subtraction flags — default ON, an explicit false removes one
  *     (`:194-199`) — plus `truncate-tables` and
  *     `retry-connection.max-attempt` / `.delay-increment`.
  *
  * Malformed values throw [[IllegalArgumentException]] exactly where the
  * reference throws `ArgumentException`; `Copy` maps any load failure to
  * exit 1.
  */
final case class CopyConfig(
    sourceDir: String,
    destDir: String,
    tablePatterns: Seq[String],
    plan: PlanConfig,
    /** `none | readonly | snapshot` — the reference's mode picks WHICH
      * server-side immutability query runs (`SmartBulkCopy.cs:111-133`).
      * Here every mode keeps the existence/well-formedness probe;
      * `readonly` additionally snapshots each source's committed-file
      * footprint before the copy and re-verifies it after (mutation ⇒
      * exit 2); `snapshot`/`none` trust the source. */
    safeCheck: String,
    truncateTables: Boolean,
    retryMaxAttempt: Int,
    retryDelayIncrement: Int,
    /** Per-table copy bound in seconds (`SmartBulkCopyConfig.cs:93-102`,
      * the reference applies it per SQL command): enforced by
      * [[graft.Copy]] as a job-group cancellation deadline around each
      * table's load — a wedged copy exits 3 instead of hanging. */
    commandTimeout: Int,
    /** Post-check identity synchronization (`SmartBulkCopy.cs:227-244`):
      * reseed each identity table's destination to the source's current
      * value and verify by read-back; a failed verify exits 2. */
    syncIdentity: Boolean,
    /** Reference `compatibility-mode` (`SmartBulkCopyConfig.cs:31,148`):
      * switches its bulk write from async to the synchronous
      * `WriteToServer` call with identical results. Spark writes are
      * already synchronous, so [[graft.Copy]] acknowledges the flag with
      * a log line and changes nothing. */
    compatibilityMode: Boolean)

object CopyConfig {

  /** The ONE safe-check normalizer (reference alias surface,
    * `SmartBulkCopy.cs:174-193`): 'read-only' folds to 'readonly',
    * anything outside the three modes throws. Shared by the config
    * loader AND `Copy.run`'s direct-caller validation — two inline
    * copies of the alias match would let the mode list fork (a mode
    * added to one site silently rejected, or accepted unvalidated, by
    * the other). */
  def normalizeSafeCheck(mode: String): String =
    mode.toLowerCase(java.util.Locale.ROOT) match {
      case "read-only"                            => "readonly"
      case m @ ("readonly" | "none" | "snapshot") => m
      case other => throw new IllegalArgumentException(
        s"safe-check can only contain 'none', 'readonly' or 'snapshot'; got: $other")
    }

  def load(path: String, env: String => Option[String] = sys.env.get): CopyConfig =
    parse(java.nio.file.Files.readString(java.nio.file.Paths.get(path)), env)

  def parse(json: String, env: String => Option[String] = sys.env.get): CopyConfig = {
    val root =
      try new ObjectMapper().readTree(json)
      catch { case e: Exception =>
        throw new IllegalArgumentException(s"config is not valid JSON: ${e.getMessage}")
      }
    if (root == null || !root.isObject)
      throw new IllegalArgumentException("config root must be a JSON object")

    def at(node: JsonNode, key: String): Option[JsonNode] =
      Option(node.get(key)).filterNot(_.isNull)

    def conn(side: String): String =
      at(root, side).flatMap(at(_, "connection-string")).map { n =>
        // a container node stringifies to "" — the run would proceed
        // with an empty source/destination dir and fail far away as
        // TableNotFound instead of the load-time exit 1 every other
        // malformed option gets
        if (!n.isTextual) throw new IllegalArgumentException(
          s"$side.connection-string must be a string")
        n.asText()
      }
        .orElse(env(s"$side-connection-string"))
        .getOrElse(throw new IllegalArgumentException(
          s"no $side connection string in config or environment"))

    // tables: include/exclude form wins; legacy flat array passes through
    val patterns: Seq[String] = at(root, "tables") match {
      case Some(t) if t.isObject =>
        // a wrongly-typed include/exclude must THROW, not silently
        // vanish — a scalar exclude that parses as "no excludes" would
        // copy (and with truncate on, destroy) tables the user excluded
        def arr(key: String, prefix: String): Seq[String] = at(t, key) match {
          case Some(a) if a.isArray =>
            (0 until a.size).map { i =>
              val e = a.get(i)
              // a container element stringifies to "" — an exclude of
              // "" matches nothing, silently un-excluding the table
              if (!e.isTextual) throw new IllegalArgumentException(
                s"tables.$key entries must be strings")
              prefix + e.asText()
            }
          case Some(_) =>
            throw new IllegalArgumentException(s"tables.$key must be an array")
          case None => Nil
        }
        val inc = arr("include", "+:")
        if (inc.isEmpty)
          throw new IllegalArgumentException("tables.include must be a non-empty array")
        inc ++ arr("exclude", "-:")
      case Some(t) if t.isArray =>
        (0 until t.size).map { i =>
          val e = t.get(i)
          // same strictness as include/exclude: a nested array or null
          // stringifies to ""/"null", silently breaking the pattern it
          // was meant to be — reject at load time (exit 1), not at the
          // far-away TableNotFound the mangled pattern produces later
          if (!e.isTextual) throw new IllegalArgumentException(
            "tables entries must be strings")
          e.asText()
        }
      case Some(_) =>
        throw new IllegalArgumentException("tables must be an object or an array")
      case None => Seq("*")
    }

    val opts = at(root, "options")
    def opt(key: String): Option[JsonNode] = opts.flatMap(at(_, key))

    // tri-modal logical-partitions (SmartBulkCopyConfig.cs:152-170):
    // empty/"auto" → Auto; "<n>gb" → Size; integer → Count; else throw.
    // A container node must REJECT here, not silently parse: its
    // asText() is "", which the nonEmpty filter maps to Auto — a user's
    // {"count": 16} object would silently replace their intended fixed
    // count with Auto.
    opt("logical-partitions").foreach { n =>
      if (n.isContainerNode) throw new IllegalArgumentException(
        "logical-partitions must be a string or number (auto, <n>, <n>gb)")
    }
    val strategy = opt("logical-partitions").map(_.asText().toLowerCase.trim)
      .filter(_.nonEmpty) match {
      case None | Some("auto") => PartitionStrategy.Auto
      case Some(lp) if lp.endsWith("gb") =>
        // integer GB only — the reference int.Parses the size
        // (SmartBulkCopyConfig.cs:152-170), so "8.5gb"/"1e2gb" reject
        val n = lp.dropRight(2).trim
        val gb =
          try n.toInt
          catch { case _: NumberFormatException =>
            throw new IllegalArgumentException(s"bad logical-partitions size: $lp")
          }
        // non-positive sizes reject at CONSTRUCTION —
        // PartitionStrategy.SizeGb's own require is the one copy of the
        // bound, and its IllegalArgumentException maps to exit 1 here
        // exactly like a loader-thrown one
        PartitionStrategy.SizeGb(gb.toDouble)
      case Some(lp) =>
        val n =
          try lp.toInt
          catch { case _: NumberFormatException =>
            throw new IllegalArgumentException(
              "logical-partitions can only contain \"auto\", a number (eg: 7) " +
                s"or a size in GB (eg: 10GB); got: $lp")
          }
        // non-positive counts reject at CONSTRUCTION (the
        // PartitionStrategy.Count require — one copy of the bound)
        PartitionStrategy.Count(n)
    }

    val safeCheck = opt("safe-check").map(_.asText())
      .fold("readonly")(normalizeSafeCheck)

    // STRICT boolean: only a JSON true/false (or the exact strings
    // "true"/"false") is accepted — Jackson's lenient asBoolean would
    // turn "yes"/"True"/1 into the DEFAULT silently, so a user writing
    // "truncate-tables": "yes" would run an append and fail
    // reconciliation with no hint why, and "stop-if" gates they thought
    // disabled would still abort the run. Same hazard class as the
    // fractional batch-size asIntStrict rejects.
    def asBooleanStrict(n: JsonNode, key: String): Boolean =
      if (n.isBoolean) n.asBoolean()
      else n.asText() match {
        case "true"  => true
        case "false" => false
        case other => throw new IllegalArgumentException(
          s"$key must be true or false; got: $other")
      }

    // stop-if flags default ON; only an explicit false removes one.
    // A scalar where the OBJECT belongs must throw (the
    // retry-connection rule): a user's "stop-if": false would silently
    // leave both gates ON — the copy then aborts on a destination
    // index the user explicitly tried to allow, with no hint why.
    opt("stop-if").foreach { n =>
      if (!n.isObject) throw new IllegalArgumentException(
        "stop-if must be an object with secondary-index/temporal-table flags")
    }
    val stopIf = opt("stop-if")
    def stopFlag(key: String): Boolean =
      stopIf.flatMap(at(_, key))
        .forall(asBooleanStrict(_, s"stop-if.$key"))

    def asIntStrict(n: JsonNode, key: String): Int =
      if (n.isIntegralNumber && n.canConvertToInt) n.asInt()
      // a fractional number must REJECT, not truncate — batch-size 0.5
      // silently becoming 0 would change copy behavior with no error
      else if (n.isNumber)
        throw new IllegalArgumentException(s"$key must be an integer")
      else try n.asText().toInt
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"$key must be an integer")
      }
    def intOpt(key: String, default: Int): Int =
      opt(key).map(asIntStrict(_, key)).getOrElse(default)
    // a scalar where the retry OBJECT belongs must throw, not silently
    // run with default retry policy
    opt("retry-connection").foreach { n =>
      if (!n.isObject) throw new IllegalArgumentException(
        "retry-connection must be an object with max-attempt/delay-increment")
    }
    def retryOpt(key: String, default: Int): Int =
      opt("retry-connection").flatMap(at(_, key))
        .map(asIntStrict(_, s"retry-connection.$key")).getOrElse(default)

    val plan =
      try PlanConfig(
        tasks = intOpt("tasks", 7),
        batchSize = intOpt("batch-size", 100000),
        strategy = strategy,
        stopIfSecondaryIndex = stopFlag("secondary-indexes"),
        stopIfTemporalTable = stopFlag("temporal-table"))
      catch { case e: IllegalArgumentException =>
        throw new IllegalArgumentException(s"bad options: ${e.getMessage}")
      }

    CopyConfig(
      sourceDir = conn("source"),
      destDir = conn("destination"),
      tablePatterns = patterns,
      plan = plan,
      safeCheck = safeCheck,
      // reference default: false (SmartBulkCopyConfig.cs:104)
      truncateTables = opt("truncate-tables")
        .exists(asBooleanStrict(_, "truncate-tables")),
      retryMaxAttempt = retryOpt("max-attempt", 5),
      retryDelayIncrement = retryOpt("delay-increment", 10),
      commandTimeout = intOpt("command-timeout", 90 * 60),
      syncIdentity = opt("sync-identity")
        .exists(asBooleanStrict(_, "sync-identity")),
      compatibilityMode = opt("compatibility-mode")
        .exists(asBooleanStrict(_, "compatibility-mode")))
  }
}
