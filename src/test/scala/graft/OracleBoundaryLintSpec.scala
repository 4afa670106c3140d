package graft

import graft.core.{Sessions, Tables}
import graft.operators.text.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Boundary-distance lint for the oracle sites that still round an
  * IEEE/libm value to a fixed grain (round-10's nb_classify lesson:
  * a >1-ulp libm difference in the DRIVER's DuckDB flips a rounded
  * value and the hash, invisibly to local runs). The ln-based score
  * sites were migrated to FixedLog (no libm at all); the sites below
  * keep a transcendental because they live inside array folds or
  * 6-dp display rounding — for each, this lint measures the actual
  * sf0.01 corpus values' distance to the nearest rounding boundary
  * and asserts a guard band of ≥ 1e-4 rounding units, ~10⁵× the
  * 1-ulp scale a libm build difference can move a double. If data or
  * formulas ever drift toward a boundary, this fails at build time
  * instead of at the driver.
  */
class OracleBoundaryLintSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(8, "boundary-lint")
  val sf = "/root/testdata/sf0.01"
  val Band = 1e-4

  /** Min distance of `v` (already in rounding units — nano for 1e9
    * scale, micro for round(,6)) to the nearest half-integer boundary.
    */
  def minBoundaryDist(df: DataFrame, v: Column): Double =
    // HALF_UP's decision boundary sits at fractional part 0.5
    df.select(abs(v - floor(v) - lit(0.5)).as("_d"))
      .agg(min(col("_d"))).head().getDouble(0)

  def assertBand(name: String, d: Double): Unit = {
    info(f"$name: min boundary distance $d%.3e rounding units")
    assert(d >= Band, s"$name: value within $d of a rounding boundary" +
      s" — libm-fragile (band $Band); move it to FixedLog")
  }

  test("text_entropy per-run terms −(c/n)·ln(c/n)·1e9 clear the band") {
    // the per-(doc, token) run counts are exactly the fold's completed
    // runs (TextOps.tokenEntropyScaled sorts then folds)
    val docs = Tables.documents(spark, sf)
      .filter(length(trim(col("text"))) >= 1)
    val toks = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("tok"))
    val runs = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val totals = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val p = col("c").cast("double") / col("n")
    val terms = runs.join(totals, "doc_id")
      .select((-p * log(p) * lit(1e9)).as("term"))
      .filter(col("term") =!= 0.0)
    assertBand("entropy terms (nano)", minBoundaryDist(terms, col("term")))
  }

  test("text_ppl's exp(nll) 6-dp rounding clears the band") {
    val ppl = TextOps.withPerplexity(Tables.documents(spark, sf),
      col("text"), col("doc_id"))
    // nll is already rounded (an exact 6-dp double); exp is the libm
    // step whose 6-dp rounding the driver hashes
    assertBand("ppl exp (micro)",
      minBoundaryDist(ppl, exp(col("nll")) * lit(1e6)))
  }

  test("text_bm25 score 6-dp rounding clears the band") {
    // independent recompute of the published formula
    // (TextOps.bm25ScoreWith: k1 = 1.2, b = 0.75, Robertson idf)
    val terms = graft.packs.LlmPack.Bm25Terms
    val docs = Tables.documents(spark, sf)
    val base = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("_t"))
    val dl = base.select(col("doc_id"), size(col("_t")).cast("double").as("dl"))
    val nDocs = docs.count().toDouble
    val avgdl = dl.agg(avg(col("dl"))).head().getDouble(0)
    val (k1, b) = (1.2, 0.75)
    val score = terms.map { t =>
      val tf = size(filter(col("_t"), x => x === lit(t))).cast("double")
      tf.as(s"tf_$t")
    }
    val withTf = base.select(col("doc_id") +: score: _*).join(dl, "doc_id")
    val dfs = terms.map { t =>
      t -> withTf.filter(col(s"tf_$t") > 0).count().toDouble
    }.toMap
    val s = terms.map { t =>
      val tf = col(s"tf_$t")
      val idf = math.log(1.0 + (nDocs - dfs(t) + 0.5) / (dfs(t) + 0.5))
      lit(idf) * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))
    }.reduce(_ + _)
    val scored = withTf.select((s * lit(1e6)).as("sm"))
      .filter(col("sm") =!= 0.0)
    assertBand("bm25 score (micro)", minBoundaryDist(scored, col("sm")))
  }

  test("agg_stats geometric_mean 6-dp rounding clears the band") {
    val gm = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg((exp(avg(log(col("l_quantity")))) * lit(1e6)).as("g"))
    assertBand("geometric_mean (micro)", minBoundaryDist(gm, col("g")))
  }

  test("A-ES selection keys ln(u)/w have no near-ties that a libm " +
      "difference could reorder") {
    // text_sample_weighted selects top-k by key: a flip needs two keys
    // within ~1 ulp; assert the min adjacent gap is astronomically
    // wider than that
    val docs = Tables.documents(spark, sf)
    val w = regexp_extract(col("source"), "(\\d+)", 1).cast("int") % 4 + 1
    val u = (TextOps.hash60(col("doc_id").cast("string")) + lit(0.5)) /
      lit(1152921504606846976.0)
    val keys = docs.select((log(u) / w.cast("double")).as("k"))
    val gap = keys
      .withColumn("_prev", lag(col("k"), 1).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("k"))))
      .filter(col("_prev").isNotNull)
      .select(min(abs(col("k") - col("_prev")))).head().getDouble(0)
    info(f"A-ES min adjacent key gap: $gap%.3e")
    assert(gap >= 1e-12, s"near-tied A-ES keys (gap $gap)")
  }
}
