package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev inventory: attempt DfsEngine.run on EVERY reference script that
  * compiles, classify the outcome (ran with rows / ran empty / threw), and
  * report per script. Guides the run-level coverage sweep — brokered
  * scripts (mqtt/amqp/http/tcp/udp/s7/modbus endpoints) are legitimately
  * empty until their endpoint topics carry traffic (the reference reads
  * live brokers), so a script whose first run yields no rows is retried
  * once after SEEDING every topic it subscribed to (the planner notes them
  * on LoopbackBus during planning) with a few deterministic JSON messages.
  */
object RunSweep {

  final case class Result(ok: Int, empty: Int, failed: Int,
    lines: Seq[String])

  /** Deterministic seed payloads: enough structure for parsers and
    * field-landing downstream nodes to chew on; timestamps are fixed so
    * repeated sweeps agree.
    */
  private def seed(topics: Set[String]): Unit =
    topics.foreach { t =>
      (1 to 3).foreach { i =>
        graft.sources.LoopbackBus.publish(t, null,
          s"""{"val": $i, "val2": ${i * 2}, "data": {"value": $i, "code": ${100 + i}}}""",
          1577836800000L + i * 1000L)
      }
    }

  /** Foreign-database bindings for the scripts whose tables have no
    * corpus parquet twin — the same seeded-endpoint philosophy as
    * [[seed]], but for DB scripts:
    *  - tr_keepalive (oracle_query_test.dfs) becomes a real table in
    *    in-process Derby, wired through the `graft.jdbc.url` property so
    *    oracle_query executes genuine JDBC SQL;
    *  - `table` (pg_query.dfs) and `inventory` (test/mongo.dfs) become
    *    session catalog views — crate/pg/mongo query nodes resolve
    *    catalog-first (Tables.loadOrView).
    */
  private def seedDatabases(spark: SparkSession): Unit = {
    val url = "jdbc:derby:memory:sweepdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      // "connection" is a Derby reserved word — quote to keep the
      // reference's column names verbatim (and lowercase)
      try st.execute("CREATE TABLE tr_keepalive(" +
        "\"connection\" VARCHAR(64), \"sent\" INT, \"received\" INT)")
      catch { case _: java.sql.SQLException => /* exists from a prior run */ }
      st.execute("DELETE FROM tr_keepalive")
      (1 to 5).foreach(i => st.execute(
        s"INSERT INTO tr_keepalive VALUES('conn$i', ${i * 10}, ${i * 9})"))
      st.close()
    } finally conn.close()
    sys.props("graft.jdbc.url") = url

    // pg_query.dfs: SELECT AVG(data_obj['x']['cur']) ... FROM table
    // WHERE id < 33, bucketed on ts by the crate_query rewrite
    spark.sql(
      """SELECT id,
        |  named_struct('x', named_struct('cur', CAST(id AS DOUBLE) / 7.0))
        |    AS data_obj,
        |  timestamp_millis(1577836800000 + id * 60000) AS ts
        |FROM range(100)""".stripMargin)
      .createOrReplaceTempView("table")
    // test/mongo.dfs: find {"item": "canvas"} on inventory, sizes avg'd
    spark.sql(
      """SELECT element_at(array('canvas', 'journal', 'mat'),
        |    CAST(id % 3 AS INT) + 1) AS item,
        |  named_struct('h', CAST(10 + id AS DOUBLE),
        |    'w', CAST(20 + id AS DOUBLE)) AS size
        |FROM range(30)""".stripMargin)
      .createOrReplaceTempView("inventory")
  }

  def sweep(spark: SparkSession, sf: String,
      refDir: String = "/root/reference/dfs"): Result = try {
    seedDatabases(spark)
    val dir = new java.io.File(refDir)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".dfs")) Seq(f) else Nil
    var ok, empty, failed = 0
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    walk(dir).sortBy(_.getPath).foreach { f =>
      val name = f.getPath.stripPrefix(dir.getPath + "/")
      val srcIn = scala.io.Source.fromFile(f, "UTF-8")
      val src = try srcIn.mkString finally srcIn.close()
      val compiled =
        try { graft.dfs.DfsEngine.compile(src); true }
        catch { case _: Exception => false }
      if (compiled) {
        def attempt(): (Map[String, Long], Option[Throwable]) =
          try {
            val frames = graft.dfs.DfsEngine.run(src, spark, sf)
            (frames.view.mapValues(df =>
              try df.count() catch { case _: Exception => -1L }).toMap, None)
          } catch { case e: Throwable => (Map.empty[String, Long], Some(e)) }
        graft.sources.LoopbackBus.resetSubscribed()
        var (counts, err) = attempt()
        val topics = graft.sources.LoopbackBus.subscribed()
        val needSeed = topics.nonEmpty && (err.isDefined ||
          counts.valuesIterator.forall(_ <= 0))
        if (needSeed) {
          seed(topics)
          val again = attempt()
          counts = again._1
          err = again._2
        }
        (counts, err) match {
          case (_, Some(e)) =>
            lines += s"FAIL $name ${e.getClass.getSimpleName}: " +
              s"${Option(e.getMessage).getOrElse("").take(140)}"
            failed += 1
          case (c, None) if c.isEmpty =>
            lines += s"NOCHAIN $name"; empty += 1
          case (c, None) if c.valuesIterator.exists(_ < 0) =>
            lines += s"COUNTERR $name $c"; failed += 1
          case (c, None) if c.valuesIterator.forall(_ == 0) =>
            lines += s"EMPTY $name"; empty += 1
          case (c, None) =>
            lines += s"OK $name ${c.values.sum} rows"; ok += 1
        }
      }
    }
    Result(ok, empty, failed, lines.toSeq)
  } finally {
    // the JDBC override is sweep-scoped: leaving it set would silently
    // rebind every later-planned oracle_query in this JVM to the
    // sweep's Derby instead of its declared host
    sys.props.remove("graft.jdbc.url")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r = sweep(spark, "/root/testdata/sf0.001")
    r.lines.foreach(println)
    println(s"== ok=${r.ok} empty=${r.empty} failed=${r.failed} ==")
    spark.stop()
  }
}
