package graft.ops

import org.apache.spark.sql.SparkSession

/** Session confs governing where queries keep PERSISTED pipeline state
  * (the incremental-dedup fingerprint index, the IVF cell layout). The
  * production default co-locates state with the corpus it indexes
  * (`<dir>/_graft_fp_index`, `<dir>/_graft_ivf_layout`); these keys
  * relocate it when the corpus storage is read-only.
  *
  * Every entry point that runs declared queries against read-only
  * sources (this repo's testdata) must call [[relocateToScratch]] —
  * one shared helper so a new entry point can't forget half the keys.
  */
object PersistedState {

  val FpIndexDirKey = "graft.fp.index.dir"
  val IvfLayoutDirKey = "graft.ivf.layout.dir"

  // Scratch roots are per-PROCESS: the staged-once-per-JVM guards
  // (fpIndexStaged etc.) are process-local, so two driver JVMs against
  // the same corpus would otherwise race overwrite-then-read on one
  // shared index path (JVM A's overwrite deletes the directory while
  // JVM B's anti-join scans it). Same hazard class as the source-staging
  // root, fixed the same way. Deterministic within a process, so every
  // session of one JVM shares one staging.
  private val procTag: Long = java.lang.ProcessHandle.current().pid()

  /** Point all persisted-state defaults at local scratch space. */
  def relocateToScratch(spark: SparkSession): Unit = {
    val tmp = System.getProperty("java.io.tmpdir")
    spark.conf.set(FpIndexDirKey, s"$tmp/graft_fp_index_$procTag")
    spark.conf.set(IvfLayoutDirKey, s"$tmp/graft_ivf_layout_$procTag")
    // per-pid roots are unreachable once this process ends — reclaim
    graft.exec.Fs.deleteOnExit(java.nio.file.Paths.get(s"$tmp/graft_fp_index_$procTag"))
    graft.exec.Fs.deleteOnExit(java.nio.file.Paths.get(s"$tmp/graft_ivf_layout_$procTag"))
  }

  /** Short corpus-dir digest — the collision key for relocated state
    * roots, shared by every store so their layouts can never diverge. */
  def corpusKey(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString

  /** Last-resort scratch location for `subdir` state of `dir`, used when
    * the beside-the-corpus default is unwritable (read-only storage and
    * no relocation conf set — e.g. a driver that never calls
    * [[relocateToScratch]]). */
  def scratchFallback(dir: String, subdir: String): String = {
    val root =
      s"${System.getProperty("java.io.tmpdir")}/graft_${subdir}_$procTag"
    // per-pid scratch is garbage after this process — reclaim at exit
    graft.exec.Fs.deleteOnExit(java.nio.file.Paths.get(root))
    s"$root/${corpusKey(dir)}"
  }

  /** Write persisted state via `write(path)` at the preferred location,
    * falling back to scratch when the BESIDE-THE-CORPUS DEFAULT is
    * unwritable (read-only corpus storage, no relocation conf). The
    * location is chosen by an up-front writability PROBE (mkdirs of the
    * state dir), never by catching the write's own failure: a transient
    * compute error mid-write must propagate, not silently divert
    * durable state to node-local scratch for the rest of the JVM. An
    * explicitly configured location (`confKey` set) never falls back —
    * a misconfigured conf must fail loudly. Returns the path written.
    */
  def writeWithFallback(spark: SparkSession, confKey: String,
      preferred: String, dir: String, subdir: String)(
      write: String => Unit): String = {
    def preferredWritable: Boolean =
      try {
        val p = new org.apache.hadoop.fs.Path(preferred)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.mkdirs(p) && {
          // mkdirs on an ALREADY-EXISTING dir is a no-op success even on
          // read-only storage (a state dir staged while writable, or
          // copied along with the corpus) — prove writability with a
          // real create+delete, or the later parquet write throws where
          // the fallback should have engaged
          val probe = new org.apache.hadoop.fs.Path(p,
            s".graft_write_probe_$procTag")
          fs.create(probe, true).close()
          fs.delete(probe, false)
          true
        }
      } catch {
        // only a PERMISSION/read-only verdict selects the fallback; any
        // other probe failure (HDFS safe-mode, an object store's 503)
        // PROPAGATES — the same rule the write itself follows, because a
        // momentary blip at probe time would otherwise silently divert
        // durable state to node-local scratch for the rest of the JVM
        // (callers cache the chosen path), never populate the production
        // location, and lose appended history with the node
        case _: org.apache.hadoop.security.AccessControlException => false
        case _: java.nio.file.AccessDeniedException               => false
        // the preferred path can NEVER be a state dir (a corpus that is
        // itself a file, or a file squatting on the dir name) — as
        // permanent as a permission denial
        case _: org.apache.hadoop.fs.ParentNotDirectoryException  => false
        case _: java.nio.file.FileAlreadyExistsException          => false
        case _: org.apache.hadoop.fs.FileAlreadyExistsException   => false
        case e: java.io.IOException if {
          val m = Option(e.getMessage).getOrElse("")
            .toLowerCase(java.util.Locale.ROOT)
          m.contains("read-only") || m.contains("permission denied") ||
            m.contains("access denied")
        } => false
      }
    val target =
      if (spark.conf.getOption(confKey).nonEmpty || preferredWritable) preferred
      else {
        val fallback = scratchFallback(dir, subdir)
        System.err.println(
          s"[graft] persisted-state location $preferred is not writable; " +
            s"using $fallback — set $confKey to choose explicitly")
        fallback
      }
    write(target)
    target
  }
}
