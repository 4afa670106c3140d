package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Environment-proof fixed-point natural log: `lnNano(m) ≈ ln(m)·1e9`
  * for integer `m ≥ 1`, computed ENTIRELY in 64-bit integer
  * arithmetic (+ − × truncating-division shifts comparisons) so both
  * Spark and any DuckDB build replay it bit-for-bit.
  *
  * Why: round-10 `text_nb_classify` hashed scores built from
  * `round(ln(·)·1e9)`; they were bit-exact against local DuckDB 1.0.0
  * yet hash-failed at the driver — IEEE `ln` is libm territory and NOT
  * part of the SQL standard's determinism contract. This is the same
  * hazard class the unrolled-CTE PCA oracle was built to avoid; here
  * the transcendental itself is restated as a fixed integer recipe.
  *
  * Algorithm (identical step list in every dialect):
  *   p   = Σ_{k=1..62} [m ≥ 2^k]            — floor(log₂ m)
  *   pp  = min(p, 30); msh = m >> (p − pp)  — normalize m to < 2³¹
  *   tw  = 1 << pp                          — so x = msh/tw ∈ [1, 2)
  *   t1  = (msh − tw)·10⁹ div (msh + tw)    — t = (x−1)/(x+1) ∈ [0, ⅓)
  *   t2  = t1² div 10⁹; t_{k+2} = t_k·t2 div 10⁹ for k = 1..19
  *   ln  = p·693147181 + 2·(t1 + Σ_{k=3,5..21} t_k div k)
  * (atanh series ln x = 2·Σ t^{2k+1}/(2k+1); t < ⅓ ⇒ the t²³ tail is
  * < 1e-11·ln-units. 693147181 = round(ln 2·10⁹).)
  *
  * Every operand is nonnegative, so truncation == floor and Spark
  * `div` == DuckDB `//` (both trunc toward zero — verified). Overflow
  * headroom: (msh−tw)·10⁹ ≤ 2³⁰·10⁹ ≈ 1.1e18 < 2⁶³; t1 ≤ 3.34e8 so
  * t1·t2 ≤ 3.7e16. The result is within ~2e-8 relative of true ln
  * (series truncation + ≤1-nano div losses + the 2⁻³⁰ msh shift) —
  * plenty for classifier scores, and EXACTLY reproducible anywhere.
  */
object FixedLog {

  val Ln2Nano = 693147181L

  /** Engine dialect: integral division, shifts. */
  final case class Dialect(
      idiv: (String, String) => String,
      shl: (String, String) => String,
      shr: (String, String) => String)

  /** Spark SQL (`expr`-compatible) dialect. */
  val SparkDialect: Dialect = Dialect(
    idiv = (a, b) => s"($a div $b)",
    shl = (a, b) => s"shiftleft(CAST($a AS BIGINT), CAST($b AS INT))",
    shr = (a, b) => s"shiftright(CAST($a AS BIGINT), CAST($b AS INT))")

  /** DuckDB dialect. */
  val DuckDialect: Dialect = Dialect(
    idiv = (a, b) => s"($a // $b)",
    shl = (a, b) => s"(CAST($a AS BIGINT) << ($b))",
    shr = (a, b) => s"(CAST($a AS BIGINT) >> ($b))")

  private val OddKs = Seq(3, 5, 7, 9, 11, 13, 15, 17, 19, 21)

  /** The shared step list: (columnName, exprText) pairs computing
    * `${pre}ln` from integer column `m`, in dialect `d`. Single source
    * of truth — the Spark chain and the DuckDB oracle both render
    * from here, so the arithmetic cannot drift between engines.
    */
  def steps(m: String, pre: String, d: Dialect): Seq[(String, String)] = {
    val p = (1 to 62)
      .map(k => s"(CASE WHEN $m >= ${1L << k} THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val powers = Seq(
      s"${pre}p" -> s"CAST($p AS BIGINT)",
      s"${pre}pp" -> s"least(${pre}p, 30)",
      s"${pre}msh" -> d.shr(m, s"${pre}p - ${pre}pp"),
      s"${pre}tw" -> d.shl("1", s"${pre}pp"),
      s"${pre}t1" -> d.idiv(s"((${pre}msh - ${pre}tw) * 1000000000)",
        s"(${pre}msh + ${pre}tw)"),
      s"${pre}t2" -> d.idiv(s"(${pre}t1 * ${pre}t1)", "1000000000"))
    val series = OddKs.map { k =>
      val prev = if (k == 3) s"${pre}t1" else s"${pre}t${k - 2}"
      s"${pre}t$k" -> d.idiv(s"($prev * ${pre}t2)", "1000000000")
    }
    val tail = OddKs.map(k => d.idiv(s"${pre}t$k", k.toString))
      .mkString(" + ")
    powers ++ series :+
      (s"${pre}ln" -> s"${pre}p * $Ln2Nano + 2 * (${pre}t1 + $tail)")
  }

  /** Spark side: append `out` = lnNano(`arg`) via a withColumn chain
    * (CollapseProject keeps non-cheap aliases un-inlined, so the step
    * list stays linear in the plan). `arg` must be ≥ 1.
    */
  def withLnNano(df: DataFrame, arg: Column, out: String,
      pre: String = "_lf_"): DataFrame = {
    val withM = df.withColumn(s"${pre}m", arg.cast("long"))
    val stepped = steps(s"${pre}m", pre, SparkDialect)
      .foldLeft(withM) { case (cur, (n, e)) => cur.withColumn(n, expr(e)) }
    val temps = stepped.columns.filter(_.startsWith(pre)).toSeq
    stepped.withColumn(out, col(s"${pre}ln")).drop(temps: _*)
  }

  /** DuckDB side: wrap relation text `src` in nested SELECTs computing
    * `out` = lnNano(`m`), projecting only `keep` + `out`.
    */
  def duckLnNano(src: String, keep: Seq[String], m: String,
      out: String, pre: String = "_lf_"): String = {
    val inner = s"(SELECT ${(keep :+ s"$m AS ${pre}m").mkString(", ")} FROM $src)"
    val stepped = steps(s"${pre}m", pre, DuckDialect)
      .foldLeft(inner) { case (cur, (n, e)) => s"(SELECT *, $e AS $n FROM $cur)" }
    s"(SELECT ${(keep :+ s"${pre}ln AS $out").mkString(", ")} FROM $stepped)"
  }

  /** Plain-Scala reference replay of the identical step list — the
    * unit-pin yardstick for the Spark and DuckDB renderings.
    */
  def lnNanoRef(m: Long): Long = {
    require(m >= 1, s"lnNanoRef: m must be >= 1, got $m")
    var p = 0L
    var k = 1
    while (k <= 62 && m >= (1L << k)) { p += 1; k += 1 }
    val pp = math.min(p, 30L)
    val msh = m >> (p - pp).toInt
    val tw = 1L << pp.toInt
    val t1 = (msh - tw) * 1000000000L / (msh + tw)
    val t2 = t1 * t1 / 1000000000L
    var tk = t1
    var acc = 0L
    OddKs.foreach { kk =>
      tk = tk * t2 / 1000000000L
      acc += tk / kk
    }
    p * Ln2Nano + 2L * (t1 + acc)
  }
}
