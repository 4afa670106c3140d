package graft.tools

import graft.core.{Sessions, Tables}
import graft.operators.stateless.GlobalOrder
import org.apache.spark.sql.functions._

/** Dev harness: check GlobalOrder.rowNumber emits exactly 1..N once. */
object DebugGlobal {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32, "debug-global")
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
    val rn = GlobalOrder.rowNumber(ev, Seq(col("ts_ns"), col("event_id")), "rn")
    val n = rn.count()
    val stats = rn.agg(
      countDistinct(col("rn")).as("nd"),
      min(col("rn")).as("mn"), max(col("rn")).as("mx")).head()
    println(s"DBG rows=$n distinct=${stats.getLong(0)} min=${stats.getLong(1)} max=${stats.getLong(2)}")
    val every = rn.filter(col("rn") % 10 === 1).count()
    println(s"DBG everyNth=$every")
    spark.stop()
  }
}
