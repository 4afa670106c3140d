package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sources beyond the parquet corpus (SURVEY §2.7).
  *
  * File-shaped sources are native Spark readers (blobstream's CSV /
  * JSON-lines streaming, esp_blobstream.erl:68 — `readStream` on a
  * directory is the cloud-path analog). Test/emitter sources mirror
  * esp_value_emitter.erl:26-66 and esp_json_emitter.erl:37-66 on the rate
  * source. Edge-protocol sources (MQTT/AMQP/Modbus/S7…) are deployment
  * I/O: they plug in as DataSource V2 connectors, not engine operators.
  */
object Sources {

  // ---- batch ----
  def csv(spark: SparkSession, path: String, header: Boolean = true,
      schema: Option[String] = None): DataFrame = {
    val r = spark.read.option("header", header.toString)
    schema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(path)
  }

  def jsonLines(spark: SparkSession, path: String,
      schema: Option[String] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** json_emitter batch analog: literal JSON documents → rows. */
  def jsonEmitter(spark: SparkSession, docs: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.json(docs.toDS())
  }

  /** json_emitter with pinned arrival order: `_seq` is the emission index
    * (the batch analog of the emitter's event time — state/order-sensitive
    * operators downstream order by it). `as` nests the parsed payload
    * under an alias, mirroring the reference's `.as('data')`.
    */
  def jsonEmitterOrdered(spark: SparkSession, docs: Seq[String],
      as: Option[String] = None, everyMs: Long = 1000L): DataFrame = {
    import spark.implicits._
    val schema = spark.read.json(docs.toDS()).schema
    // `ts` mirrors the reference data_point.ts (epoch ms, paced by
    // .every): lambdas read it as an integer ("ts" arithmetic); _seq stays
    // the arrival-order key
    val tsBase = 1577836800000L // 2020-01-01T00:00:00Z
    val base = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toDF("_seq", "_doc")
      .withColumn("ts", lit(tsBase) + col("_seq") * everyMs)
      .withColumn("_p", from_json(col("_doc"), schema, Map.empty[String, String]))
    as match {
      case Some(a) =>
        graft.core.Paths.set(base, a, col("_p")).drop("_doc", "_p")
      case None =>
        // a payload field literally named "ts" wins over the synthetic one
        val tsCols = if (schema.fieldNames.contains("ts")) Nil else Seq(col("ts"))
        base.select((col("_seq") +: tsCols) ++
          schema.fieldNames.toIndexedSeq.map(f => col("_p").getField(f).as(f)): _*)
    }
  }

  // ---- streaming ----
  /** blobstream analog: stream files appearing under a directory. */
  def csvStream(spark: SparkSession, path: String, schemaDdl: String,
      header: Boolean = true): DataFrame =
    spark.readStream.option("header", header.toString)
      .schema(schemaDdl).csv(path)

  def jsonLinesStream(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.readStream.schema(schemaDdl).json(path)

  /** value_emitter analog: `rate` source emitting (ts, value) rows with a
    * deterministic-ish synthetic value column.
    */
  def valueEmitter(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()
      .withColumn("value", pmod(col("value") * 2654435761L, lit(1000L)))

  /** json_emitter streaming analog: rate-clocked rotation through literal
    * JSON docs, parsed by the declared schema.
    */
  def jsonEmitterStream(spark: SparkSession, docs: Seq[String],
      schemaDdl: String, rowsPerSecond: Int = 1): DataFrame = {
    val arr = array(docs.map(lit(_)): _*)
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()
      .withColumn("_doc", element_at(arr, (pmod(col("value"), lit(docs.size)) + 1).cast("int")))
      .withColumn("_parsed", from_json(col("_doc"), schemaDdl, Map.empty[String, String]))
      .select(col("timestamp"), col("_parsed.*"))
  }
}
