package graft.tools

import graft.SparkEntry
import graft.core.Sessions

/** Dev harness: dump formatted physical plans for selected queries so the
  * scan pruning / pushdown / broadcast / codegen story is inspectable.
  * Usage: runMain graft.tools.PlanAudit [query ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, "plan-audit")
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q1_agg", "where_filter", "join_asof", "join_mem_lookup",
      "win_time_tumbling", "dedup_near_pairs", "emb_cosine_topk",
      "state_count", "dfs_pipeline")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
