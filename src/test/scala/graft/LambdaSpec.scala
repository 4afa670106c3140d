package graft

import graft.core.Sessions
import graft.functions.Lambdas
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics ported from the reference lambda tests
  * (faxe_lambdalib_tests.erl:20-31, lambda_tests.erl:72-80).
  */
class LambdaSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(2, "lambda-test")

  private def eval1(c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("r")).head().get(0)
  }

  test("round_float(125.455679, 3) == 125.456") {
    assert(eval1(Lambdas.roundFloat(lit(125.455679), 3)) == 125.456)
  }

  test("max/min over mixed numerics") {
    assert(eval1(Lambdas.maxOf(lit(1.0), lit(12.0), lit(3.0), lit(6.8))) == 12.0)
    assert(eval1(Lambdas.minOf(lit(1.0), lit(12.0), lit(3.0), lit(6.8))) == 1.0)
  }

  test("map_get returns default on miss") {
    val m = map(lit("k1"), lit("a"), lit("k2"), lit("yes"))
    assert(eval1(Lambdas.mapGet(m, lit("k2"), lit("undefined"))) == "yes")
    assert(eval1(Lambdas.mapGet(m, lit("k8"), lit("undefined"))) == "undefined")
  }

  test("int truncates toward zero (dfs_std_lib:int)") {
    assert(eval1(Lambdas.toInt(lit(6.87994))) == 6L)
    assert(eval1(Lambdas.toInt(lit(-6.87994))) == -6L)
  }

  test("time_align floors to duration boundary") {
    // 2019-11-18T09:51:59.038Z (lambda_tests.erl ts) aligned to 1m
    assert(eval1(Lambdas.timeAlign(lit(1574067119038L), 60000L)) == 1574067060000L)
  }

  test("to_iso8601 formats UTC ms") {
    // the reference test's 09:51 is CET local; engine policy is UTC
    assert(eval1(Lambdas.toIso8601(lit(1574067119038L))) == "2019-11-18T08:51:59.038Z")
  }

  test("member / if / undefined compose") {
    val c = Lambdas.ifThen(
      Lambdas.member(lit("click"), Seq(lit("click"), lit("view"))),
      lit(1), lit(0))
    assert(eval1(c) == 1)
    assert(eval1(Lambdas.undefined(lit(null).cast("string"))) == true)
  }

  test("string family") {
    assert(eval1(Lambdas.strReplace(lit("a.b.c"), ".", "-")) == "a-b-c")
    // Erlang string:slice is 0-based: slice("abcdef", 2, 3) = "cde".
    // This pin previously asserted "bcd" — it had encoded the 1-based
    // fast-path bug fixed in round 16 (DfsSpec pins both paths now).
    assert(eval1(Lambdas.strSlice(lit("abcdef"), 2, 3)) == "cde")
    assert(eval1(Lambdas.strEndsWith(lit("click"), lit("ck"))) == true)
    assert(eval1(Lambdas.strConcat(lit("a"), lit("-"), lit("b"))) == "a-b")
  }
}
