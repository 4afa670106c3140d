package graft

import graft.core.Sessions
import graft.functions.FixedLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the fixed-point integer ln (the environment-proof oracle
  * arithmetic behind nb_classify): the Spark `expr` rendering must
  * replay the plain-Scala reference EXACTLY, and the reference must
  * track true ln(m)·1e9 closely enough for classifier semantics.
  */
class FixedLogSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "fixedlog-test")

  val edgeMs: Seq[Long] = Seq(1L, 2L, 3L, 4L, 7L, 1023L, 1024L, 1025L,
    (1L << 30) - 1, 1L << 30, (1L << 30) + 1, (1L << 31) + 12345,
    (1L << 45) + 987654321L, (1L << 62) - 1, 1L << 62, Long.MaxValue)

  test("native expression == SQL step-list chain == plain-Scala " +
      "reference, 1..4000 + edges (the DuckDB-oracle parity proof)") {
    import spark.implicits._
    val ms = ((1L to 4000L) ++ edgeMs).distinct
    val base = ms.toDF("m")
    val native = FixedLog.withLnNano(base, col("m"), "ln_nano")
      .select("m", "ln_nano").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the chain renders the SAME step list the DuckDB oracle uses
    // (modulo div/shift spelling), so native == chain == ref proves
    // the oracle arithmetic without DuckDB in this JVM
    val chain = FixedLog.withLnNanoChain(base, col("m"), "ln_nano")
      .select("m", "ln_nano").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    ms.foreach { m =>
      assert(native(m) == FixedLog.lnNanoRef(m),
        s"m=$m native=${native(m)} ref=${FixedLog.lnNanoRef(m)}")
      assert(chain(m) == FixedLog.lnNanoRef(m),
        s"m=$m chain=${chain(m)} ref=${FixedLog.lnNanoRef(m)}")
    }
  }

  test("reference tracks true ln within 60 nano over the pin range") {
    (((1L to 4000L) ++ edgeMs)).foreach { m =>
      val err = math.abs(FixedLog.lnNanoRef(m) - math.log(m.toDouble) * 1e9)
      // dominant loss: the 2^-30 msh truncation for huge m (~30 nano
      // worst case on ln) + ≤1-nano per truncating division
      assert(err <= 60.0, s"m=$m err=$err nano")
    }
  }

  test("hand pins: ln(1)=0, ln(2), ln(10) exact fixed-point values") {
    assert(FixedLog.lnNanoRef(1L) == 0L)
    assert(FixedLog.lnNanoRef(2L) == FixedLog.Ln2Nano)
    // ln(10)·1e9 = 2302585092.99…; the fixed recipe may differ from the
    // IEEE rounding by a few nano — pin the actual deterministic value
    val ln10 = FixedLog.lnNanoRef(10L)
    assert(math.abs(ln10 - 2302585093L) <= 5, s"ln10=$ln10")
  }

  test("monotone over 1..4000 (classifier ordering sanity)") {
    var prev = -1L
    (1L to 4000L).foreach { m =>
      val v = FixedLog.lnNanoRef(m)
      assert(v >= prev, s"non-monotone at m=$m")
      prev = v
    }
  }
}
