package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 loopback connector — the engine-side skeleton every
  * broker connector in SURVEY §2.7 binds to (refs: esp_mqtt_subscribe.erl:
  * 47-70, esp_mqtt_publish.erl:46-78 topic-from-field `topic_lambda`,
  * esp_amqp_consume.erl:68-103).
  *
  * Read path: batch scan of a topic's log, or a MicroBatchStream whose
  * offsets are the bus log positions — initialOffset resumes from the
  * consumer group's committed mark and commit() acks processed ranges
  * (ack≈offset-commit). Write path: batch + streaming writes publishing
  * each row; the `topic` COLUMN, when present, routes per row
  * (topic-from-column), else the `topic` option applies.
  *
  * Options: topic (required for reads), group (consumer group, default
  * "default"). Registered as `format("graft-loopback")` via
  * DataSourceRegister (META-INF/services).
  */
class Loopback extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-loopback"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Loopback.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new LoopbackTable(properties.getOrDefault("topic", ""),
      properties.getOrDefault("group", "default"))
}

object Loopback {
  /** The message-log schema (mirrors LoopbackBus.Msg + routing topic). */
  val Schema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("topic", StringType, nullable = false),
    StructField("key", StringType, nullable = true),
    StructField("payload", StringType, nullable = true)))

  val FormatName = "graft-loopback"

  /** Publish helper: routes `df` rows into the bus. Columns `key` and
    * `payload` are taken when present (payload falls back to to_json of
    * the full row); a `topic` column overrides the `topic` argument per
    * row — esp_mqtt_publish's topic_lambda.
    */
  def publish(df: DataFrame, topic: String): Unit = {
    val cols = df.columns.toSet
    val topicCol =
      if (cols.contains("topic")) col("topic").cast("string") else lit(topic)
    val keyCol = if (cols.contains("key")) col("key").cast("string")
      else lit(null).cast("string")
    val payloadCol = if (cols.contains("payload"))
      col("payload").cast("string")
    else
      // wire-format parity: flowdata:to_json serializes the point as
      // fields + a top-level "ts" in ms (flowdata_tests.erl
      // json_basic_test) — the engine's ts_ms column takes that key
      // (unless the frame carries its own distinct "ts" field), and the
      // subscribe side consumes the default "ts" back into event time,
      // so a bus round-trip preserves the point exactly
      to_json(struct(df.columns.toIndexedSeq.map {
        case "ts_ms" if !cols.contains("ts") => col("`ts_ms`").as("ts")
        case c => col(s"`$c`")
      }: _*))
    val tsCol = if (cols.contains("ts_ms")) col("ts_ms").cast("long")
      else lit(0L)
    df.select(lit(0L).as("offset"), tsCol.as("ts_ms"),
        topicCol.as("topic"), keyCol.as("key"), payloadCol.as("payload"))
      .write.format(FormatName).option("topic", topic).mode("append").save()
  }

  /** Batch-read a topic's current log. */
  def subscribe(spark: SparkSession, topic: String): DataFrame = {
    LoopbackBus.noteSubscribe(topic)
    spark.read.format(FormatName).option("topic", topic).load()
  }

  /** Stream-read a topic (micro-batch offsets over the bus log). */
  def subscribeStream(spark: SparkSession, topic: String,
      group: String = "default"): DataFrame = {
    LoopbackBus.noteSubscribe(topic)
    ensureAckListener(spark)
    spark.readStream.format(FormatName)
      .option("topic", topic).option("group", group).load()
  }

  /** Consumer-group ack point. Spark's driver-side
    * MicroBatchStream.commit(end) lags one batch and is never invoked for
    * the final batch of a Trigger.AvailableNow run (cleanup only happens
    * when a NEXT batch is constructed), so a drain-style query would never
    * ack at all. QueryProgressEvent fires exactly once per SUCCESSFUL
    * batch with the source's endOffset — ack-after-process with no event
    * on failure, the amqp semantics (esp_amqp_consume.erl:68-103). The
    * group-tagged offset json carries (topic, group) so the listener can
    * route the commit; commit() stays as a second idempotent ack point
    * (LoopbackBus.commit is max-monotonic).
    */
  // weak keys: the listener lives in the session's own bus, so a stopped
  // session (and its listener) must stay GC-able — a strong static set
  // here would pin every session the process ever created
  private val ackInstalled = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  private def ensureAckListener(spark: SparkSession): Unit =
    if (ackInstalled.add(spark))
      spark.streams.addListener(
        new org.apache.spark.sql.streaming.StreamingQueryListener {
          import org.apache.spark.sql.streaming.StreamingQueryListener._
          override def onQueryStarted(e: QueryStartedEvent): Unit = ()
          override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
          override def onQueryProgress(e: QueryProgressEvent): Unit =
            e.progress.sources.foreach { s =>
              LoopbackOffset.parseTagged(s.endOffset).foreach {
                case (topic, group, off) =>
                  if (off >= 0) LoopbackBus.commit(topic, group, off)
              }
            }
        })
}

final class LoopbackTable(topic: String, group: String)
    extends Table with SupportsRead with SupportsWrite {
  import scala.jdk.CollectionConverters._

  override def name(): String = s"loopback:$topic"
  override def schema(): StructType = Loopback.Schema
  override def capabilities(): java.util.Set[TableCapability] = Set(
    TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
    TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
    TableCapability.ACCEPT_ANY_SCHEMA).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LoopbackScan(
        Option(options.get("topic")).filter(_.nonEmpty).getOrElse(topic),
        Option(options.get("group")).getOrElse(group))
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val t = Option(info.options.get("topic")).filter(_.nonEmpty)
      .getOrElse(topic)
    new WriteBuilder {
      override def build(): Write = new LoopbackWrite(t, info.schema())
    }
  }
}

/** One offset range (fromExclusive, untilInclusive] of one topic. The
  * consumer-group ack happens only at the driver-side
  * MicroBatchStream.commit(end) — after the engine has durably
  * processed the batch (amqp ack-after-process,
  * esp_amqp_consume.erl:68-103). Executors never ack: a partially
  * consumed or failed task leaves the committed mark untouched, so an
  * unprocessed range is re-delivered on restart.
  */
final case class LoopbackPartition(topic: String, group: String,
    from: Long, until: Long) extends InputPartition

final case class LoopbackOffset(off: Long, topic: String = "",
    group: String = "") extends Offset {
  // the group-tagged form lets the session ack listener route commits
  // from QueryProgressEvent endOffsets (see Loopback.ensureAckListener)
  override def json(): String =
    if (group.isEmpty) off.toString
    else s"""{"topic":"$topic","group":"$group","off":$off}"""
}

object LoopbackOffset {
  private val Tagged =
    """\{"topic":"(.*)","group":"(.*)","off":(-?\d+)\}""".r

  def fromJson(s: String, topic: String, group: String): LoopbackOffset =
    s.trim match {
      case Tagged(t, g, o) => LoopbackOffset(o.toLong, t, g)
      case plain => LoopbackOffset(plain.toLong, topic, group)
    }

  /** (topic, group, off) when `s` is a group-tagged offset json. */
  def parseTagged(s: String): Option[(String, String, Long)] =
    Option(s).map(_.trim).collect { case Tagged(t, g, o) => (t, g, o.toLong) }
}

final class LoopbackScan(topic: String, group: String) extends Scan {
  require(topic.nonEmpty, "loopback read needs .option(\"topic\", ...)")
  override def readSchema(): StructType = Loopback.Schema
  override def description(): String = s"loopback scan of '$topic'"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      // batch scan, not a subscription: no consumer group, no acks
      Array(LoopbackPartition(topic, "", -1L, LoopbackBus.latest(topic)))
    override def createReaderFactory(): PartitionReaderFactory =
      LoopbackReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream with SupportsTriggerAvailableNow {
      // Trigger.AvailableNow: snapshot the target offset at start so the
      // query drains exactly the data present then terminates (and the
      // final construct-next cycle acks the last batch via commit()).
      private var availableNowTarget: Option[Long] = None
      override def prepareForTriggerAvailableNow(): Unit =
        availableNowTarget = Some(LoopbackBus.latest(topic))
      override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
      private def tag(off: Long) = LoopbackOffset(off, topic, group)
      override def latestOffset(start: Offset, limit: ReadLimit): Offset =
        tag(availableNowTarget.getOrElse(LoopbackBus.latest(topic)))
      override def reportLatestOffset(): Offset =
        tag(LoopbackBus.latest(topic))
      override def initialOffset(): Offset =
        tag(LoopbackBus.committed(topic, group))
      override def latestOffset(): Offset =
        tag(LoopbackBus.latest(topic))
      override def deserializeOffset(json: String): Offset =
        LoopbackOffset.fromJson(json, topic, group)
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
        Array(LoopbackPartition(topic, group,
          start.asInstanceOf[LoopbackOffset].off,
          end.asInstanceOf[LoopbackOffset].off))
      override def createReaderFactory(): PartitionReaderFactory =
        LoopbackReaderFactory
      /** Ack: the processed range is committed for the group — an
        * unprocessed range is re-delivered on restart.
        */
      override def commit(end: Offset): Unit =
        LoopbackBus.commit(topic, group, end.asInstanceOf[LoopbackOffset].off)
      override def stop(): Unit = ()
    }
}

object LoopbackReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[LoopbackPartition]
    val msgs = LoopbackBus.read(part.topic, part.from, part.until).iterator
    new PartitionReader[InternalRow] {
      private var cur: LoopbackBus.Msg = _
      override def next(): Boolean =
        if (msgs.hasNext) { cur = msgs.next(); true }
        else false
      override def get(): InternalRow = InternalRow(
        cur.offset, cur.tsMs, UTF8String.fromString(part.topic),
        if (cur.key == null) null else UTF8String.fromString(cur.key),
        if (cur.payload == null) null else UTF8String.fromString(cur.payload))
      // No executor-side ack: close() also runs on task failure or a
      // partially-consumed scan (limit/early abort), where committing
      // would skip unprocessed messages on restart. The group ack is
      // MicroBatchStream.commit(end) alone.
      override def close(): Unit = ()
    }
  }
}

final case class LoopbackCommit(n: Long) extends WriterCommitMessage

/** Batch + streaming write: each row is published to its topic column
  * (when the input schema has one) or the default topic.
  */
final class LoopbackWrite(topic: String, schema: StructType)
    extends Write with BatchWrite with StreamingWrite {
  override def toBatch: BatchWrite = this
  override def toStreaming: StreamingWrite = this
  override def description(): String = s"loopback write to '$topic'"
  // both parent defaults agree; the explicit override disambiguates
  override def useCommitCoordinator(): Boolean = true

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new LoopbackWriterFactory(topic, schema)
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new LoopbackWriterFactory(topic, schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

final class LoopbackWriterFactory(topic: String, schema: StructType)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    writer()
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    writer()

  private val idx: Map[String, Int] =
    schema.fieldNames.zipWithIndex.toMap

  private def strAt(row: InternalRow, name: String): Option[String] =
    idx.get(name).flatMap { i =>
      if (row.isNullAt(i)) None
      else schema(i).dataType match {
        case StringType => Some(row.getUTF8String(i).toString)
        case _ => None
      }
    }

  private def writer(): DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private var n = 0L
    override def write(row: InternalRow): Unit = {
      val t = strAt(row, "topic").getOrElse(topic)
      require(t.nonEmpty,
        "loopback write needs a topic column or .option(\"topic\", ...)")
      val ts = idx.get("ts_ms")
        .filter(i => !row.isNullAt(i) &&
          schema(idx("ts_ms")).dataType == LongType)
        .map(row.getLong).filter(_ != 0L)
        .getOrElse(System.currentTimeMillis())
      LoopbackBus.publish(t, strAt(row, "key").orNull,
        strAt(row, "payload").orNull, ts)
      n += 1
    }
    override def commit(): WriterCommitMessage = LoopbackCommit(n)
    override def abort(): Unit = ()
    override def close(): Unit = ()
  }
}
