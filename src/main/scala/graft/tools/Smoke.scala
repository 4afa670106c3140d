package graft.tools

import graft.core.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** Dev-only smoke: schema + ns-timestamp handling over the corpus. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = Sessions.local(8, "smoke")
    for (n <- Tables.names) {
      val df = Tables.load(spark, dir, n)
      println(s"== $n ${df.count()} rows")
      df.printSchema()
    }
    val ev = Tables.events(spark, dir)
    // integral div: ns epochs exceed 2^53, double division corrupts
    // low digits (the codebase-wide ns rule)
    ev.select(col("event_id"), col("ts"), col("ts_ns"),
        col("ts_ms").as("ms")).show(3, false)
    spark.stop()
  }
}
