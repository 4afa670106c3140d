package graft.tools


/** Dev-only: time cosineDupPairs at a given (bands, rowsPerBand) over a
  * corpus dir — the BENCH_NOTES knob experiment. LSH banding's candidate
  * count grows ~ n²/2^rowsPerBand per band at fixed signature width, so
  * scale-ups must widen the band (more bits) to keep per-bucket occupancy
  * bounded; this main measures exactly that trade (time + pair count).
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.tools.BenchCosineKnob 4 8"
  */
object BenchCosineKnob {
  def main(args: Array[String]): Unit = {
    val bands = if (args.length > 0) args(0).toInt else 4
    val rpb = if (args.length > 1) args(1).toInt else 4
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.Sessions.local(cpus, "bench-cosine-knob")
    def once(): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = graft.operators.vector.VectorOps.cosineDupPairs(
        graft.core.Tables.embeddings(spark, sfDir), "vec_id", "embedding",
        threshold = 0.4, bands = bands, rowsPerBand = rpb).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    once() // warm-up
    val runs = (1 to 3).map(_ => once())
    val best = runs.minBy(_._1)
    println(f"cosineDupPairs bands=$bands rowsPerBand=$rpb " +
      f"sf=$sfDir time=${best._1}%.3f s pairs=${best._2} " +
      f"(all: ${runs.map(r => f"${r._1}%.2f").mkString(", ")})")
    spark.stop()
  }
}
