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

  /** Point all persisted-state defaults at local scratch space. */
  def relocateToScratch(spark: SparkSession): Unit = {
    val tmp = System.getProperty("java.io.tmpdir")
    spark.conf.set(FpIndexDirKey, s"$tmp/graft_fp_index")
    spark.conf.set(IvfLayoutDirKey, s"$tmp/graft_ivf_layout")
  }
}
