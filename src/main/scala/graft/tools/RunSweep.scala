package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only inventory: attempt DfsEngine.run on EVERY reference script that
  * compiles, classify the outcome (ran with rows / ran empty / threw), and
  * print a per-script report. Guides the run-level coverage sweep — not a
  * test (some scripts legitimately need brokered input or env state).
  */
object RunSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val dir = new java.io.File("/root/reference/dfs")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".dfs")) Seq(f) else Nil
    var ok, empty, failed = 0
    walk(dir).sortBy(_.getPath).foreach { f =>
      val name = f.getPath.stripPrefix(dir.getPath + "/")
      val srcIn = scala.io.Source.fromFile(f, "UTF-8")
      val src = try srcIn.mkString finally srcIn.close()
      val compiled =
        try { graft.dfs.DfsEngine.compile(src); true }
        catch { case _: Exception => false }
      if (compiled) {
        try {
          val frames = graft.dfs.DfsEngine.run(src, spark, sf)
          val counts = frames.view.mapValues(df =>
            try df.count() catch { case e: Exception => -1L }).toMap
          if (counts.isEmpty) { println(s"NOCHAIN $name"); empty += 1 }
          else if (counts.valuesIterator.exists(_ < 0)) {
            println(s"COUNTERR $name ${counts}"); failed += 1
          } else if (counts.valuesIterator.forall(_ == 0)) {
            println(s"EMPTY $name"); empty += 1
          } else { println(s"OK $name ${counts.values.sum} rows"); ok += 1 }
        } catch {
          case e: Throwable =>
            println(s"FAIL $name ${e.getClass.getSimpleName}: " +
              s"${Option(e.getMessage).getOrElse("").take(140)}")
            failed += 1
        }
      }
    }
    println(s"== ok=$ok empty=$empty failed=$failed ==")
    spark.stop()
  }
}
