package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory lives in graft.packs.*; each pack covers one SURVEY §2
  * section and registers (Spark query, DuckDB oracle SQL) pairs.
  */
object SparkEntry {
  private def allPacks: Seq[QueryPack] = Seq(
    graft.packs.TransformPack,
    graft.packs.AggPack,
    graft.packs.WindowPack,
    graft.packs.StatePack,
    graft.packs.RestructurePack,
    graft.packs.JoinPack,
    graft.packs.LlmPack,
    graft.packs.LambdaPack,
    graft.packs.DfsPack,
    graft.packs.SourcePack
  )

  private lazy val all: Map[String, QueryDef] = QueryPack.combine(allPacks)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q1_agg").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, v) => k -> v.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
