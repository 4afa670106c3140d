package graft

import graft.core.{Paths, Sessions}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the dot-path core — the semantics-densest pure
  * logic in the engine (every DFS lambda and restructuring node rides
  * it). The invariants mirror the reference's flowdata contract
  * (flowdata_tests.erl:26-88): set-then-read returns the value, '*'
  * escapes survive a parse round-trip, and deep writes never disturb
  * sibling fields.
  *
  * Raw ScalaCheck (no scalatest bridge on the offline classpath): each
  * property runs through SCTest.check and the result is asserted.
  */
class PathsPropSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(2, "paths-prop")

  private def checkProp(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val seg: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(4, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private val deepPath: Gen[Seq[String]] = for {
    n <- Gen.choose(1, 4)
    segs <- Gen.listOfN(n, seg)
  } yield segs.distinct

  test("parse: '*' escapes a literal dot and round-trips") {
    checkProp(Prop.forAll(seg, seg) { (a, b) =>
      Paths.parse(s"$a*$b") == Seq(Paths.Seg(s"$a.$b", None)) &&
        Paths.parse(s"$a.$b") ==
          Seq(Paths.Seg(a, None), Paths.Seg(b, None))
    })
  }

  test("parse: 1-based [n] indexing binds to its own segment") {
    checkProp(Prop.forAll(seg, seg, Gen.choose(1, 9)) { (a, b, i) =>
      Paths.parse(s"$a[$i].$b") ==
        Seq(Paths.Seg(a, Some(i)), Paths.Seg(b, None))
    })
  }

  test("set-then-ref returns the value at any depth; siblings untouched") {
    import spark.implicits._
    val df = Seq((1L, "keep")).toDF("id", "anchor")
    // Spark work per case — keep the sample count modest
    checkProp(Prop.forAll(deepPath, Gen.choose(-1000L, 1000L)) { (segs, v) =>
      segs.isEmpty || segs.contains("id") || segs.contains("anchor") || {
        val path = segs.mkString(".")
        val out = Paths.set(df, path, lit(v))
        val row = out.select(Paths.ref(path).as("got"), col("anchor")).head()
        row.getLong(0) == v && row.getString(1) == "keep"
      }
    }, n = 25)
  }

  test("deep write into an existing struct keeps sibling fields") {
    import spark.implicits._
    val base = Seq(1L).toDF("id")
      .withColumn("s", struct(lit(7L).as("a"), lit(8L).as("b")))
    checkProp(Prop.forAll(Gen.choose(-99L, 99L)) { v =>
      val row = Paths.set(base, "s.a", lit(v))
        .select(Paths.ref("s.a").as("a"), Paths.ref("s.b").as("b")).head()
      row.getLong(0) == v && row.getLong(1) == 8L
    }, n = 10)
  }

  test("set through an existing struct creates missing intermediates") {
    // jsn:set (flowdata_tests.erl:73-80): any missing level below an
    // existing root is created, siblings at every level untouched
    import spark.implicits._
    checkProp(Prop.forAll(seg, seg, deepPath, Gen.choose(-1000L, 1000L)) {
      (root, sib, rest, v) =>
        rest.isEmpty || rest.contains(sib) || root == sib || {
          val df = Seq(7L).toDF("x")
            .select(struct(col("x").as(sib)).as(root))
          val path = (root +: rest).mkString(".")
          val row = Paths.set(df, path, lit(v))
            .select(Paths.ref(path).as("got"),
              Paths.ref(s"$root.$sib").as("sib")).head()
          row.getLong(0) == v && row.getLong(1) == 7L
        }
    }, n = 25)
  }
}
