package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

import scala.collection.mutable.ArrayBuffer

/** `metrics` / `conn_status` analog (refs: esp_metrics.erl:24,
  * lib/node_metrics.erl — faxe samples per-node items_in/out and
  * processing_time every 5 s): Spark's StreamingQueryListener already
  * carries rows/sec and batch durations per query; this collector turns
  * it into the same queryable shape.
  */
final class Metrics extends StreamingQueryListener {
  final case class Sample(queryId: String, batchId: Long, numInputRows: Long,
      inputRowsPerSecond: Double, processedRowsPerSecond: Double,
      batchDurationMs: Long)

  private val buf = ArrayBuffer.empty[Sample]

  def samples: Seq[Sample] = buf.synchronized(buf.toSeq)

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    buf.synchronized {
      buf += Sample(p.id.toString, p.batchId, p.numInputRows,
        Option(p.inputRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
        Option(p.processedRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
        p.batchDuration)
    }
  }
}

object Metrics {
  /** Attach a collector to the session; returns it for inspection. */
  def attach(spark: SparkSession): Metrics = {
    val m = new Metrics
    spark.streams.addListener(m)
    m
  }
}
