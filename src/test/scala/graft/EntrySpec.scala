package graft

import graft.core.{Paths, Sessions, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EntrySpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "test")
  val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"query $name returned no rows")
    }
  }

  test("oracle keys are a subset of query keys") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("paths: 1-based array indexing and deep set/delete") {
    import spark.implicits._
    val df = Seq((1L, Seq(10, 20, 30))).toDF("id", "xs")
      .withColumn("nest", struct(lit("a").as("s"), struct(lit(5L).as("v")).as("inner")))
    // flowdata_tests.erl:26-32 — [n] is 1-based
    assert(df.select(Paths.ref("xs[2]")).head().getInt(0) == 20)
    assert(df.select(Paths.ref("nest.inner.v")).head().getLong(0) == 5L)
    val set = Paths.set(df, "nest.inner.w", lit(7))
    assert(set.select(Paths.ref("nest.inner.w")).head().getInt(0) == 7)
    val del = Paths.delete(set, "nest.inner.v")
    assert(!Paths.has(del, "nest.inner.v") && Paths.has(del, "nest.inner.w"))
    // '*' escapes a literal dot inside ONE key (esp_fields_to_array.erl:60
    // back-replaces * with dots; http_post.dfs 'SHx*OpHrRet' addresses the
    // flat JSON key "SHx.OpHrRet") — NOT an alternate separator
    val flat = df.withColumn("nest.inner.v", lit(7L))
    assert(flat.select(Paths.ref("nest*inner*v")).head().getLong(0) == 7L)
    // array-element write: ONLY the addressed element takes the value;
    // siblings KEEP their existing field (not nulled by the rewrite)
    val arr = df.withColumn("data", struct(array(
      struct(lit(5L).as("ccRdy")), struct(lit(7L).as("ccRdy"))).as("mt")))
    val w = Paths.set(arr, "data.mt[1].ccRdy", lit(9L))
    val r = w.select(
      Paths.ref("data.mt[1].ccRdy"), Paths.ref("data.mt[2].ccRdy")).head()
    assert(r.getLong(0) == 9L && r.getLong(1) == 7L)
  }

  test("events table normalizes ns timestamps") {
    val ev = Tables.events(spark, sf)
    val r = ev.select(col("ts_ns"), col("ts_ms"), unix_micros(col("ts")).as("us")).head()
    assert(r.getLong(0) / 1000000L == r.getLong(1))
    assert(r.getLong(0) / 1000L == r.getLong(2))
  }
}
