package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Scoped caching for multi-pass operators (LSH dedup, cosine banding):
  * the shared base is persisted only for the duration of the operator,
  * never left pinned in the session's CacheManager.
  *
  * Pattern: persist the base, run the body (whose result must be SMALL
  * relative to the base — candidate pairs, top-k lists), eagerly
  * materialize the result with `localCheckpoint`, release the base. After
  * the call returns, the CacheManager holds nothing: checkpoint blocks
  * are RDD-level storage that the ContextCleaner frees on GC, unlike a
  * Dataset persist which pins its plan for the application lifetime.
  *
  * Scale note: local checkpoint blocks are not replicated — on a real
  * cluster, losing an executor during a downstream read forces a retry of
  * the operator. That is the right trade for results orders of magnitude
  * smaller than their base; an operator whose OUTPUT is data-sized should
  * keep lineage instead and accept recompute.
  */
object CacheScope {

  /** Dev-tool hook (`tools.PlanDump`): when on, the formatted physical
    * plan of every `withPersisted` body is buffered BEFORE the terminal
    * `localCheckpoint` replaces it with a bare `Scan ExistingRDD` —
    * otherwise a CacheScope-terminated query's plan dump is vacuous
    * (the r15 audit's evidence-file defect). One volatile read when
    * off; never set on production paths.
    */
  @volatile private[graft] var capturePlans: Boolean = false
  private[graft] val capturedPlans =
    new scala.collection.mutable.ArrayBuffer[String]

  /** Persist `base`, build the result with `body`, materialize it, and
    * release the base before returning. The returned frame is backed by
    * its own (small) checkpoint blocks — no cached plan outlives the call.
    */
  def withPersisted(base: DataFrame)(body: DataFrame => DataFrame): DataFrame = {
    val b = base.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val res = body(b)
      if (capturePlans) {
        val txt = res.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        capturedPlans.synchronized { capturedPlans += txt }
      }
      res.localCheckpoint(eager = true)
    } finally b.unpersist(blocking = false)
  }
}
