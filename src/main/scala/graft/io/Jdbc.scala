package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC bindings for the reference's SQL client nodes
  * (esp_postgre_statement.erl:42-55 one-shot/periodic statement,
  * esp_postgre_out.erl:34-47 field-mapped insert, and the PollSource
  * transport for esp_crate_query_cont-style incremental reads).
  *
  * Spark-first: everything goes through the DataSource V2 JDBC reader, so
  * a statement is executed BY THE DATABASE (Spark wraps it as a derived
  * table) and range predicates land in the remote WHERE clause — the same
  * pushdown shape the parquet binding gets from row-group skipping. No
  * driver-side row loop: fetch parallelism comes from
  * partitionColumn/numPartitions when a split key exists.
  *
  * URL convention: the reference configures host/port/database; a full
  * `jdbc:` URL (tested against in-process Derby) short-circuits that for
  * embedded/engine-test deployments.
  */
object Jdbc {

  def url(host: String, port: Long, database: String): String =
    if (host.startsWith("jdbc:")) host
    else s"jdbc:postgresql://$host:$port/$database"

  /** One-shot statement: the SQL runs remotely as a derived table. */
  def statement(spark: SparkSession, jdbcUrl: String, sql: String,
      props: Map[String, String] = Map.empty): DataFrame =
    props.foldLeft(spark.read.format("jdbc")
        .option("url", jdbcUrl).option("query", sql)) {
      case (r, (k, v)) => r.option(k, v)
    }.load()

  /** One poll window as a remote range scan: the `[from, to)` predicate
    * is part of the pushed-down table expression, so each poll reads only
    * its slice — the JDBC analog of PollSource.poll's pruned parquet scan.
    */
  def poll(spark: SparkSession, jdbcUrl: String, table: String,
      tsExpr: String, w: PollSource.PollWindow): DataFrame =
    spark.read.format("jdbc").option("url", jdbcUrl)
      .option("dbtable",
        s"(SELECT * FROM $table WHERE $tsExpr >= ${w.fromMs}" +
          s" AND $tsExpr < ${w.toMs}) p")
      .load()

  /** Append rows to a remote table (esp_postgre_out's prepared insert);
    * `fieldMap` renames faxe_fields → db_fields before the write.
    */
  def write(df: DataFrame, jdbcUrl: String, table: String,
      fieldMap: Seq[(String, String)] = Nil): Unit = {
    val mapped = fieldMap.foldLeft(df) { case (d, (from, to)) =>
      d.withColumnRenamed(from, to)
    }
    mapped.write.format("jdbc").option("url", jdbcUrl)
      .option("dbtable", table).mode("append").save()
  }
}
