package graft.tools


/** Dev-only: time an inline DFS script over SPARK_GRAFT_SF_DIR (warm-up
  * + min-of-three, full materialization via noop — the Bench protocol for
  * one ad-hoc pipeline). Powers BENCH_NOTES micro-experiments on node
  * options with no registered-query twin, e.g. collect .max_age.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.BenchDfs <script>"
  */
object BenchDfs {
  def main(args: Array[String]): Unit = {
    val script = args.mkString(" ").replace(";", "\n")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.Sessions.local(cpus, "bench-dfs")
    def once(): Double = {
      val t0 = System.nanoTime()
      graft.dfs.DfsEngine.run(script, spark, sfDir).foreach { case (_, df) =>
        df.write.format("noop").mode("overwrite").save()
      }
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm-up
    val runs = (1 to 3).map(_ => once())
    println(f"benchdfs min=${runs.min}%.3f s " +
      f"(all: ${runs.map(r => f"$r%.2f").mkString(", ")}) script=$script")
    spark.stop()
  }
}
