package graft.io

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Sinks (SURVEY §2.7). File formats are native writers; the
  * protocol-sink family (mqtt_publish / http_post / influx_out /
  * crate_out…) shares one Spark shape: `foreachBatch` with a
  * per-partition publisher — [[foreachBatchSink]] is that extension
  * point, taking the publish function as a parameter instead of binding
  * any protocol client (edge I/O stays out of the engine).
  */
object Sinks {

  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def csv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)

  /** log-node analog: JSON lines to a directory (esp_log.erl). */
  def jsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Streaming file sink with checkpointing. */
  def parquetStream(df: DataFrame, path: String, checkpoint: String): StreamingQuery =
    df.writeStream.format("parquet")
      .option("path", path).option("checkpointLocation", checkpoint).start()

  /** The protocol-sink extension point: `publish` runs per micro-batch
    * partition with the rows to deliver (mqtt_publish/http_post pattern,
    * esp_mqtt_publish.erl:46-78 — the client lives in `publish`'s closure,
    * created per partition, exactly where a connection pool belongs).
    */
  def foreachBatchSink(df: DataFrame, checkpoint: String)(
      publish: Iterator[Row] => Unit): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        batch.foreachPartition(publish)
      }.start()
}
