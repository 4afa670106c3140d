package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-verifiable queries.
  *
  * Each entry pairs a Spark query (built from the corpus directory) with an
  * equivalent ANSI SQL statement runnable by DuckDB over the same parquet
  * tables. Column names must match exactly (the driver sorts columns by name
  * before hashing values). Queries with no SQL equivalent register with
  * `oracle = None` and get a rows-only check.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryPack {
  def entries: Map[String, QueryDef]
}

object QueryPack {
  def combine(packs: Seq[QueryPack]): Map[String, QueryDef] = {
    val all = packs.flatMap(_.entries.toSeq)
    val dup = all.groupBy(_._1).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    all.toMap
  }
}
