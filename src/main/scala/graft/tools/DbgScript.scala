package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: run one reference script and print the full failure stack. */
object DbgScript {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src0 = scala.io.Source.fromFile(
      s"/root/reference/dfs/${args(0)}.dfs", "UTF-8")
    val src = try src0.mkString finally src0.close()
    try {
      val frames = graft.dfs.DfsEngine.run(src, spark, "/root/testdata/sf0.001")
      frames.foreach { case (n, df) =>
        println(s"-- $n: ${df.count()} rows; ${df.columns.mkString(",")}")
        df.show(5, truncate = 60)
      }
    } catch {
      case e: org.apache.spark.sql.AnalysisException =>
        println(s"condition=${e.getCondition} params=${e.getMessageParameters}")
        e.printStackTrace()
      case e: Throwable => e.printStackTrace()
    }
    spark.stop()
  }
}
