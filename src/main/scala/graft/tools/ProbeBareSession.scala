package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only probe: run an events-touching query with a session that does NOT
  * pre-set spark.sql.legacy.parquet.nanosAsLong, mimicking a driver-owned
  * session. Tables.events must self-heal via runtime conf.
  */
object ProbeBareSession {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.queries("agg_first_last")(spark, "/root/testdata/sf0.001").count()
    println(s"probe-bare-session rows=$n")
    spark.stop()
  }
}
