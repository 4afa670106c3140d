package graft.tools

import graft.SparkEntry
import graft.core.Sessions
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import scala.collection.mutable

/** Dev harness: run selected queries with a stage-level listener so the
  * "where do the seconds go" question has data — per run: wall time,
  * job count, stage count, per-stage executor-run/task summaries for
  * the slowest stages. The sf0.1 fixtures are small enough that many
  * registered queries are STAGE-COUNT-bound (the graph_cc_stars
  * lesson), and this tool is how that diagnosis is made per query.
  *
  * Usage: runMain graft.tools.QueryProfile <reps> <query> [query ...]
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryProfile <reps> <query> [query ...]")
    val reps = args(0).toInt
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(cpus, "query-profile")
    spark.sparkContext.setLogLevel("WARN")

    case class StageRow(id: Int, name: String, tasks: Int,
      runMs: Long, wallMs: Long)
    val stages = mutable.ArrayBuffer.empty[StageRow]
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        synchronized {
          val i = s.stageInfo
          val wall = (for {a <- i.completionTime; b <- i.submissionTime}
            yield a - b).getOrElse(0L)
          stages += StageRow(i.stageId, i.name.takeWhile(_ != '\n'),
            i.numTasks, i.taskMetrics.executorRunTime, wall)
        }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to reps).foreach { r =>
        stages.clear(); jobs = 0
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events are async; give the bus a beat to drain
        Thread.sleep(300)
        val (nStages, sumWall, sumRun) = synchronized {
          (stages.size, stages.map(_.wallMs).sum, stages.map(_.runMs).sum)
        }
        println(f"== $n rep $r: wall $wall%.2f s, jobs $jobs, " +
          f"stages $nStages, stage-wall ${sumWall / 1e3}%.2f s, " +
          f"exec-run ${sumRun / 1e3}%.2f s")
        if (r == reps) synchronized {
          stages.sortBy(-_.wallMs).take(18).foreach { s =>
            println(f"   stage ${s.id}%4d wall ${s.wallMs}%6d ms " +
              f"run ${s.runMs}%6d ms tasks ${s.tasks}%4d  ${s.name.take(90)}")
          }
        }
      }
    }
    spark.stop()
  }
}
