package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

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
  *   p   = length(bin(m)) − 1               — floor(log₂ m)
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

  /** The shared step list: PROJECTION GROUPS of (columnName, exprText)
    * computing `${pre}ln` from integer column `m`, in dialect `d` —
    * names within a group never reference each other, so each group is
    * one SELECT. Single source of truth: the Spark chain and the
    * DuckDB oracle both render from here, so the arithmetic cannot
    * drift between engines.
    */
  def steps(m: String, pre: String, d: Dialect): Seq[Seq[(String, String)]] = {
    // Plan-size discipline: every projection step costs optimizer
    // passes, and these chains sit in ~270 registered plans — the
    // first formulation (62-comparison floor-log2 + one step per
    // series term, 17 projections) cost 2× on text_ppl and ~0.9 s of
    // pure planning on a 31-row kl_drift. So: floor(log₂ m) is
    // length(bin(m)) − 1 (both engines' bin() renders a positive
    // integer with no leading zeros — verified equal), and the series
    // inlines three terms per projection. The ARITHMETIC is unchanged
    // — identical multiply/divide order and truncation points — only
    // the step boundaries moved.
    // p is inlined into t1's normalization (no same-SELECT lateral
    // aliases — not portable enough), so group 1 is just (p, t1)
    val p = s"CAST(length(bin($m)) - 1 AS BIGINT)"
    val pp = s"least($p, 30)"
    val msh = d.shr(m, s"($p) - $pp")
    val tw = d.shl("1", pp)
    // t_{k+2} = t_k·t2 div 1e9 hops; up to four inlined per column
    def hop(prev: String) = d.idiv(s"($prev * ${pre}t2)", "1000000000")
    val tail = OddKs.map(k => d.idiv(s"${pre}t$k", k.toString))
      .mkString(" + ")
    Seq(
      Seq(
        s"${pre}p" -> p,
        s"${pre}t1" -> d.idiv(s"(($msh - $tw) * 1000000000)",
          s"($msh + $tw)")),
      Seq(s"${pre}t2" -> d.idiv(s"(${pre}t1 * ${pre}t1)", "1000000000")),
      Seq(
        s"${pre}t3" -> hop(s"${pre}t1"),
        s"${pre}t5" -> hop(hop(s"${pre}t1")),
        s"${pre}t7" -> hop(hop(hop(s"${pre}t1")))),
      Seq(
        s"${pre}t9" -> hop(s"${pre}t7"),
        s"${pre}t11" -> hop(hop(s"${pre}t7")),
        s"${pre}t13" -> hop(hop(hop(s"${pre}t7")))),
      Seq(
        s"${pre}t15" -> hop(s"${pre}t13"),
        s"${pre}t17" -> hop(hop(s"${pre}t13")),
        s"${pre}t19" -> hop(hop(hop(s"${pre}t13"))),
        s"${pre}t21" -> hop(hop(hop(hop(s"${pre}t13"))))),
      Seq(s"${pre}ln" ->
        s"${pre}p * $Ln2Nano + 2 * (${pre}t1 + $tail)"))
  }

  /** Spark side, production path: append `out` = lnNano(`arg`) as ONE
    * native expression node ([[LnNano]]) — a multi-projection SQL
    * chain here cost ~0.1 s of planning + codegen PER CHAIN on every
    * registered plan (measured: kl_drift 0.45 → 1.39 s with four
    * chains); the native node is a single static call inside
    * whole-stage codegen. `arg` must be ≥ 1 (throws per row
    * otherwise — the same guard `lnNanoRef` carries).
    */
  def withLnNano(df: DataFrame, arg: Column, out: String,
      pre: String = "_lf_"): DataFrame =
    df.withColumn(out, lnNano(arg))

  /** `lnNano(m)` as a Column (native [[LnNano]] expression). */
  def lnNano(m: Column): Column =
    ColumnBridge.column(LnNano(ColumnBridge.expression(m.cast("long"))))

  /** The SQL-chain rendering of the step list in the SPARK dialect —
    * kept as the A/B yardstick FixedLogSpec uses to prove the shared
    * step list (the DuckDB oracle's arithmetic) equals the native
    * expression bit-for-bit, without needing DuckDB in the test JVM.
    */
  def withLnNanoChain(df: DataFrame, arg: Column, out: String,
      pre: String = "_lf_"): DataFrame = {
    val withM = df.withColumn(s"${pre}m", arg.cast("long"))
    val stepped = steps(s"${pre}m", pre, SparkDialect)
      .foldLeft(withM) { case (cur, group) =>
        cur.select(col("*") +: group.map { case (n, e) =>
          expr(e).as(n) }: _*)
      }
    val temps = stepped.columns.filter(_.startsWith(pre)).toSeq
    stepped.withColumn(out, col(s"${pre}ln")).drop(temps: _*)
  }

  /** DuckDB side: wrap relation text `src` in nested SELECTs (one per
    * step group) computing `out` = lnNano(`m`), projecting only
    * `keep` + `out`.
    */
  def duckLnNano(src: String, keep: Seq[String], m: String,
      out: String, pre: String = "_lf_"): String = {
    val inner = s"(SELECT ${(keep :+ s"$m AS ${pre}m").mkString(", ")} FROM $src)"
    val stepped = steps(s"${pre}m", pre, DuckDialect)
      .foldLeft(inner) { case (cur, group) =>
        val cols = group.map { case (n, e) => s"$e AS $n" }.mkString(", ")
        s"(SELECT *, $cols FROM $cur)"
      }
    s"(SELECT ${(keep :+ s"${pre}ln AS $out").mkString(", ")} FROM $stepped)"
  }

  /** Plain-Scala reference replay of the identical step list — the
    * unit-pin yardstick for the renderings, AND the runtime kernel the
    * native [[LnNano]] expression calls (allocation-free tight loop;
    * callable from generated Java via the static forwarder).
    */
  def lnNanoRef(m: Long): Long = {
    if (m < 1)
      throw new IllegalArgumentException(
        s"lnNano: argument must be >= 1, got $m")
    val p = 63 - java.lang.Long.numberOfLeadingZeros(m) // digits₂ − 1
    val pp = if (p < 30) p else 30
    val msh = m >> (p - pp)
    val tw = 1L << pp
    val t1 = (msh - tw) * 1000000000L / (msh + tw)
    val t2 = t1 * t1 / 1000000000L
    var tk = t1
    var acc = 0L
    var k = 3
    while (k <= 21) {
      tk = tk * t2 / 1000000000L
      acc += tk / k
      k += 2
    }
    p * Ln2Nano + 2L * (t1 + acc)
  }

  /** `e^x` in nano fixed point over `0 ≤ xNano ≤ 10⁹` (x ∈ [0, 1]):
    * a 13-term Horner evaluation with TRUNCATING integer division at
    * every step — the [[lnNanoRef]] doctrine for the exp direction.
    * Why it exists: libm `exp` differs across engines by an ULP on
    * some inputs, AND `round()` CONVENTIONS differ near decimal
    * boundaries (Spark rounds the double's exact binary expansion via
    * BigDecimal; DuckDB multiplies by 10^d first), so a sigmoid in an
    * oracle-checked data path must be the same exact integer algorithm
    * everywhere — this function IS the contract, not an approximation
    * of libm (agreement ~10⁻⁸ over the domain). Scala `/`, Spark
    * `div` and DuckDB `//` all truncate toward zero, so the chain
    * replays identically in all three ([[expNanoExpr]] renders it).
    */
  def expNanoRef(xNano: Long): Long = {
    require(xNano >= 0 && xNano <= 1000000000L,
      s"expNano: xNano in [0, 1e9], got $xNano")
    var acc = 1000000000L
    var k = 13
    while (k >= 1) {
      acc = 1000000000L + xNano * acc / (k * 1000000000L)
      k -= 1
    }
    acc
  }

  /** Render the [[expNanoRef]] Horner chain over an integer SQL
    * expression; `idiv` is the dialect's truncating integer division
    * (`div` in Spark SQL, `//` in DuckDB). Overflow headroom: the
    * largest intermediate is `xNano · acc ≤ 10⁹ · e·10⁹ < 2.8·10¹⁸`.
    */
  def expNanoExpr(x: String, idiv: String): String =
    (1 to 13).foldRight("1000000000") { (k, acc) =>
      s"(1000000000 + (($x) * $acc) $idiv ${k}000000000)"
    }
}

/** `lnNano(m)`: the [[FixedLog]] fixed-point integer natural log as a
  * native Catalyst expression — one plan node, one static call in
  * whole-stage codegen. Replaces a 7-projection SQL chain per call
  * site (which cost ~0.1 s planning+codegen per chain per query).
  */
case class LnNano(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "ln_nano"

  override def nullSafeEval(m: Any): Any =
    FixedLog.lnNanoRef(m.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FixedLog.lnNanoRef($c)")

  override protected def withNewChildInternal(
      newChild: Expression): LnNano = copy(child = newChild)
}
