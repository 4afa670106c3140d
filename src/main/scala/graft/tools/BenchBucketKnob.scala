package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: time the bucketed BM25 serve lifecycle at a given bucket
  * count over a corpus dir — the SCALE.md bucket-count-law experiment
  * (judge r14 item 4). `0` routes through the autoBuckets occupancy
  * law and prints what it resolved to.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.tools.BenchBucketKnob 0"
  */
object BenchBucketKnob {
  def main(args: Array[String]): Unit = {
    val buckets = if (args.length > 0) args(0).toInt else 0
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.Sessions.local(cpus, "bench-bucket-knob")
    val B = graft.operators.serve.BucketedServe
    val docs = graft.core.Tables.documents(spark, sfDir)
    val postings = graft.operators.text.TextOps
      .bm25Postings(docs, col("text"), col("doc_id")).count()
    val resolved = if (buckets == 0) B.autoBuckets(postings) else buckets
    def once(): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = B.bm25ServeBucketed(docs, col("text"), col("doc_id"),
        docs.filter(col("doc_id") % 101 === 0),
        substring(col("text"), 1, 80), col("doc_id"), k = 5,
        tableName = "graft_bucket_knob", path = B.scratchPath(
          s"graft_bucket_knob_$resolved"), buckets = buckets).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    once() // warm-up
    val runs = (1 to 3).map(_ => once())
    val best = runs.minBy(_._1)
    println(f"bm25ServeBucketed buckets=$buckets (resolved=$resolved) " +
      f"postings=$postings sf=$sfDir time=${best._1}%.3f s " +
      f"rows=${best._2} " +
      f"(all: ${runs.map(r => f"${r._1}%.2f").mkString(", ")})")
    spark.stop()
  }
}
