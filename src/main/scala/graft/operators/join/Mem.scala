package graft.operators.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** `mem` / `jsn_select` — lookup enrichment against a small static document
  * or flow-memory table (refs: esp_mem.erl:31-138 ETS value store readable
  * from lambdas; esp_jsn_select.erl:33-62 `where` key=field lookup join).
  *
  * Spark-first mapping (SURVEY §7.4): the mem/document becomes a DataFrame
  * and the lambda `mem()` / jsn_select lookup becomes an explicit broadcast
  * hash join — no shuffle of the big side, executor-local lookup, which is
  * the 100 TB-safe form of a per-row dictionary access.
  */
object Mem {

  /** Enrich `df` with columns from the small `lookup` frame on `cond`.
    * `joinType` "left" keeps unmatched rows (jsn_select default-miss).
    */
  def lookup(df: DataFrame, lookupDf: DataFrame, cond: Column,
      joinType: String = "left"): DataFrame =
    df.join(broadcast(lookupDf), cond, joinType)
}
