package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-memory frequency sketching: count-min over token streams,
  * and the heavy-hitter mining built on it.
  *
  * Why a sketch when `groupBy(token).count` exists: the exact
  * frequency table is VOCABULARY-sized — fine for whitespace tokens,
  * hopeless for n-grams at corpus scale (the gram table of a 100 TB
  * corpus dwarfs the corpus). Count-min bounds the state to `depth ×
  * width` cells regardless of input size, never underestimates, and
  * overestimates by at most ~(total occurrences)/width with high
  * probability — so "estimate ≥ threshold" yields a candidate superset
  * of the true heavy hitters with NO false negatives, and the exact
  * pass only ever touches candidate occurrences.
  *
  * All hashing derives from md5 ([[TextOps.hash60]]) so a DuckDB
  * oracle replays every cell and every estimate bit-for-bit.
  */
object Sketches {

  /** The ONE md5 the whole sketch derives from: every row's bucket is
    * a disjoint bit slice of this 60-bit hash — hashing per (token,
    * row) instead was measured 3× the sketch-build cost at sf1 (md5 +
    * hex-conv per occurrence per row dominates everything else).
    */
  def cmHash(tok: Column): Column =
    TextOps.hash60(concat(lit("cm|"), tok))

  /** Sketch row `row`'s bucket from the precomputed [[cmHash]]: bits
    * `[row·log₂width, (row+1)·log₂width)` — md5 bits are uniform and
    * the slices are disjoint, the standard cheap row-family. `width`
    * must be a power of two; `depth · log₂width ≤ 60` so every row
    * gets its own bits.
    */
  def cmBucketFromHash(h: Column, row: Int, width: Int): Column = {
    val bits = java.lang.Integer.numberOfTrailingZeros(width)
    shiftright(h, row * bits).bitwiseAND(lit((width - 1).toLong))
      .cast("int")
  }

  private def checkDims(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= 16,
      s"countMin: depth must be in [1, 16], got $depth")
    require(width >= 2 && (width & (width - 1)) == 0,
      s"countMin: width must be a power of two >= 2, got $width")
    val bits = java.lang.Integer.numberOfTrailingZeros(width)
    require(depth * bits <= 60,
      s"countMin: depth * log2(width) must be <= 60, got ${depth * bits}")
  }

  /** Build the `depth × width` count-min sketch of whitespace-token
    * occurrences: one corpus scan, one map-side-combined aggregate
    * down to at most `depth · width` cells — the only state the
    * frequency pass keeps, at ANY corpus size.
    */
  def countMin(df: DataFrame, text: Column, depth: Int, width: Int)
      : DataFrame = {
    checkDims(depth, width)
    // spread the scan before the md5-per-occurrence kernel
    // (core.Scans): safe here because the sketch aggregate has at most
    // depth·width groups, so extra map partitions cannot inflate the
    // partial-aggregate rows the way vocabulary-keyed aggregates do
    graft.core.Scans.spread(df.select(text.as("_cmtx")), col("_cmtx"))
      .select(explode(TextOps.tokens(col("_cmtx"))).as("tok"))
      .withColumn("_h", cmHash(col("tok")))
      .select(posexplode(array((0 until depth).map(j =>
        cmBucketFromHash(col("_h"), j, width)): _*))
        .as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Heavy hitters: every token whose EXACT occurrence count reaches
    * `threshold`, with the count-min estimate that nominated it —
    * `(token, est, exact)`, `est >= exact` always.
    *
    * Two corpus passes, neither vocabulary-sized: (1) build the
    * sketch; (2) re-scan, look each occurrence up via `depth`
    * broadcast hash joins against the (depth·width)-cell sketch —
    * zero shuffle, the estimate is `least` over the joined counters —
    * and keep occurrences with `est >= threshold`. Because count-min
    * never underestimates, every occurrence of a true heavy hitter
    * survives, so the exact `groupBy(token).count` that follows only
    * shuffles CANDIDATE occurrences (bounded by total/threshold
    * tokens plus the sketch's false positives, which die at the final
    * exact filter). The full vocabulary never shuffles anywhere.
    */
  /** The candidate gate of [[heavyHitters]], separated so a STREAM can
    * probe a static corpus's sketch (the vs_index/mixture-gate split):
    * per token occurrence, look up the count-min estimate via `depth`
    * broadcast joins against `sketch` and keep occurrences whose
    * estimate reaches `threshold`. Stateless past the broadcasts —
    * streams as-is. Emits `(tok, est)` per surviving occurrence.
    */
  def cmCandidates(df: DataFrame, sketch: DataFrame, text: Column,
      threshold: Long, depth: Int, width: Int): DataFrame = {
    checkDims(depth, width)
    // spread before the per-occurrence md5 + broadcast-lookup kernel
    // (the countMin rule): the surviving-candidate exact aggregate is
    // bounded by the heavy-hitter count, so partials cannot inflate
    var probe = graft.core.Scans
      .spread(df.select(text.as("_cmtx")), col("_cmtx"))
      .select(explode(TextOps.tokens(col("_cmtx"))).as("tok"))
      .withColumn("_h", cmHash(col("tok")))
    (0 until depth).foreach { j =>
      val skj = sketch.filter(col("row") === j)
        .select(col("bucket").as(s"_b$j"), col("cnt").as(s"_c$j"))
      probe = probe
        .withColumn(s"_b$j", cmBucketFromHash(col("_h"), j, width))
        .join(broadcast(skj), Seq(s"_b$j"))
    }
    val est = least((0 until depth).map(j => col(s"_c$j")): _*)
    probe.withColumn("est", est)
      .filter(col("est") >= threshold)
      .select(col("tok"), col("est"))
  }

  def heavyHitters(df: DataFrame, text: Column, threshold: Long,
      depth: Int = 4, width: Int = 512): DataFrame = {
    checkDims(depth, width)
    // materialize the (≤ depth·width)-row sketch ONCE: each broadcast
    // join below re-evaluates its build side, so an unmaterialized
    // sketch would re-scan the corpus `depth` times
    val sk = countMin(df, text, depth, width).localCheckpoint()
    cmCandidates(df, sk, text, threshold, depth, width)
      .groupBy(col("tok").as("token"))
      .agg(min(col("est")).as("est"), count(lit(1)).as("exact"))
      .filter(col("exact") >= threshold)
      .select(col("token"), col("est"), col("exact"))
  }

  // ---- HyperLogLog distinct-count sketch ---------------------------------
  //
  // Why a sketch when `count(DISTINCT x)` exists: the exact form
  // shuffles every distinct value — vocabulary-sized state, the same
  // wall count-min exists to avoid. HLL keeps 2^p registers per group
  // (Flajolet et al. 2007), each a max over a per-value rho, so the
  // distinct pass is ONE map-side-combined aggregate whose state is m
  // integers per group at ANY corpus size — the only shape that counts
  // distinct URLs/tokens per domain over 100 TB.
  //
  // Determinism contract: the register is max(rho) — order-free — over
  // the md5-derived [[TextOps.hash60]], and the estimator is restated
  // in 64-bit integer arithmetic (alpha in milli-units, 1/2^M_j sums
  // as 2^(RMax−M_j) longs, truncating division; the small-range
  // linear-counting branch uses [[graft.functions.FixedLog]] instead
  // of IEEE ln) — so a DuckDB oracle replays every register and the
  // final estimate bit-for-bit on any libm.

  /** rho word width: bits of the hash used for the leading-zero count.
    * 25 keeps every estimator intermediate far inside Long: z_inv ≤
    * m·2^26 ≤ 2^38, and alpha·m²·2^26 ≤ 721·2^24·2^26 ≈ 8.1e17 < 2^63
    * at the p ≤ 12 cap.
    */
  val HllWBits = 25
  /** Max register value: rho ∈ [1, 26]. */
  val HllRMax: Int = HllWBits + 1

  /** Bias-correction constant in milli-units (Flajolet et al. 2007:
    * alpha_16=0.673, alpha_32=0.697, alpha_64=0.709, else
    * 0.7213/(1+1.079/m)). Computed ONCE driver-side and embedded as a
    * literal in both engines' plans — never a runtime float.
    */
  def hllAlphaMilli(m: Int): Long = m match {
    case 16 => 673L
    case 32 => 697L
    case 64 => 709L
    case _  => math.round(721.3 / (1.0 + 1.079 / m))
  }

  private def checkP(p: Int): Unit =
    require(p >= 4 && p <= 12,
      s"hll: p must be in [4, 12] (m = 2^p registers), got $p")

  /** The register table: one row per (group, bucket) with
    * `reg = max(rho)` — at most `groups × 2^p` rows regardless of
    * input size, built by one map-side-combined aggregate (max is
    * commutative — partial registers merge by max, the textbook HLL
    * union, so partitioning never changes a register).
    */
  def hllRegisters(df: DataFrame, value: Column,
      groups: Seq[(String, Column)], p: Int): DataFrame = {
    checkP(p)
    val m = 1 << p
    val base = df.select(
      groups.map { case (n, c) => c.as(n) } :+
        TextOps.hash60(concat(lit("hll|"), value)).as("_h"): _*)
      .withColumn("bucket",
        col("_h").bitwiseAND(lit((m - 1).toLong)).cast("int"))
      .withColumn("_w", shiftright(col("_h"), p)
        .bitwiseAND(lit((1L << HllWBits) - 1)))
      // rho = leading zeros of the 25-bit word + 1 = 26 − bitlen(w);
      // bitlen via length(bin(w)) — the FixedLog-verified cross-engine
      // floor-log2 (both engines render minimal binary digits)
      .withColumn("rho", when(col("_w") === 0, lit(HllRMax))
        .otherwise(lit(HllRMax) - length(bin(col("_w")))).cast("int"))
    base.groupBy(groups.map(g => col(g._1)) :+ col("bucket"): _*)
      .agg(max(col("rho")).as("reg"))
  }

  /** Estimate from a register table: raw HLL
    * `alpha·m²/Σ2^(−M_j)` with the linear-counting small-range branch
    * `m·ln(m/V)` when `est_raw ≤ 5m/2` and zero registers exist —
    * both restated in integer arithmetic (see object note). Emits
    * `(group…, n_used, v_zero, est_raw, est)`.
    */
  def hllEstimate(reg: DataFrame, groupCols: Seq[String], p: Int)
      : DataFrame = {
    checkP(p)
    val m = 1 << p
    val am = hllAlphaMilli(m)
    val lnM = graft.functions.FixedLog.lnNanoRef(m.toLong)
    val grouped =
      if (groupCols.isEmpty) reg.groupBy()
      else reg.groupBy(groupCols.map(col): _*)
    grouped
      .agg(count(lit(1)).cast("int").as("n_used"),
        sum(expr(s"shiftleft(1L, $HllRMax - reg)")).as("_z_nz"))
      .withColumn("v_zero", (lit(m) - col("n_used")).cast("int"))
      .withColumn("_z_inv", col("_z_nz") +
        col("v_zero").cast("long") * lit(1L << HllRMax))
      .withColumn("est_raw",
        expr(s"(${(am * m * m) << HllRMax}L div _z_inv) div 1000"))
      .withColumn("_ln_v", graft.functions.FixedLog.lnNano(
        greatest(col("v_zero").cast("long"), lit(1L))))
      .withColumn("est",
        when(col("est_raw") <= lit((5L * m) / 2) && col("v_zero") > 0,
          expr(s"($m" + s"L * (${lnM}L - _ln_v)) div 1000000000"))
          .otherwise(col("est_raw")))
      .drop("_z_nz", "_z_inv", "_ln_v")
  }

  /** Distinct-count estimate of `value` per `groups` (empty = global):
    * [[hllRegisters]] → [[hllEstimate]].
    */
  def hllDistinct(df: DataFrame, value: Column,
      groups: Seq[(String, Column)] = Seq.empty, p: Int = 6): DataFrame =
    hllEstimate(hllRegisters(df, value, groups, p), groups.map(_._1), p)

  // ---- deterministic histogram quantile sketch ---------------------------
  //
  // The DETERMINISTIC approximate percentile: exact percentiles
  // (`AggFunctions.percentile`, `quantileBuckets`) sort full per-group
  // state, and `percentile_approx`'s t-digest is engine-internal — no
  // oracle can replay it. This sketch buckets the micro-quantized value
  // by (binary exponent, top `mantissaBits` mantissa bits) — pure
  // integer arithmetic on length(bin(q)), the FixedLog-verified
  // cross-engine floor-log2 — so per-group state is bounded by
  // ~59·2^mb bucket rows at ANY corpus size, the aggregate is
  // map-side-combined, and every estimate replays bit-for-bit in any
  // engine. Relative error ≤ 2^−mb from the bucket width (uniform
  // interpolation inside the bucket).

  /** Quantile estimates from bucket counts: one row per (group,
    * p_milli) with the sketch total `n` and `est_micro` — the estimated
    * percentile in micro-units (value·1e6, the established
    * micro-quantization). `value` must be ≥ 0 (quantized q ≥ 0 —
    * bucket edges are non-negative powers-of-two slices). The rank rule
    * is `max(1, ceil(n·p))`; inside the nominated bucket the estimate
    * interpolates uniformly: `lo + (hi−lo)·(rank−cumBefore−1) div cnt`.
    * `groups` must be non-empty (the window below partitions on it;
    * for a global quantile pass a constant group) — per-group bucket
    * cardinality is bounded, so the window never sees data-sized input.
    */
  def histQuantiles(df: DataFrame, value: Column,
      groups: Seq[(String, Column)], psMilli: Seq[Int],
      mantissaBits: Int = 4): DataFrame = {
    require(groups.nonEmpty,
      "histQuantiles: groups must be non-empty (use a constant group " +
        "for a global quantile)")
    require(psMilli.nonEmpty && psMilli.forall(p => p >= 0 && p <= 1000),
      s"histQuantiles: p_milli values must be in [0, 1000], got $psMilli")
    require(mantissaBits >= 1 && mantissaBits <= 8,
      s"histQuantiles: mantissaBits in [1, 8], got $mantissaBits")
    val mb = mantissaBits
    val gcols = groups.map(g => col(g._1))
    val base = df.select(groups.map { case (n, c) => c.as(n) } :+
        floor(value.cast("double") * 1000000d).cast("long").as("_q"): _*)
      .withColumn("_sh",
        greatest(length(bin(col("_q"))) - (1 + mb), lit(0)).cast("int"))
      .withColumn("_kh", expr("shiftright(_q, _sh)"))
    val sk = base
      .groupBy(gcols :+ col("_sh") :+ col("_kh"): _*)
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_lo", expr("shiftleft(_kh, _sh)"))
      .withColumn("_hi", expr("shiftleft(_kh + 1, _sh)"))
    // bucket lows are unique (sh ≥ 1 lows live in [2^(mb+sh),
    // 2^(mb+sh+1)), disjoint across sh; sh = 0 covers q < 2^(mb+1)), so
    // the order is total and the cumulative frame unambiguous
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*).orderBy(col("_lo"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*)
    sk.withColumn("_cum", sum(col("_cnt")).over(w))
      .withColumn("_n", sum(col("_cnt")).over(wAll))
      .withColumn("p_milli", explode(array(psMilli.map(lit(_)): _*)))
      .withColumn("_rank",
        greatest(lit(1L), expr("((_n * p_milli) + 999) div 1000")))
      .filter(col("_cum") >= col("_rank") &&
        (col("_cum") - col("_cnt")) < col("_rank"))
      .select(gcols :+ col("p_milli") :+ col("_n").as("n") :+
        (col("_lo") + expr(
          "((_hi - _lo) * (_rank - (_cum - _cnt) - 1)) div _cnt"))
          .as("est_micro"): _*)
  }

  /** Robust per-group outlier flag by the modified z-score
    * (Iglewicz & Hoaglin 1993): `|z| = 0.674489·|x − med| / MAD` with
    * med and MAD both medians — immune to the heavy tails that
    * mean/std z-scores (the `groupZScore` IEEE chain) are themselves
    * distorted by, which is exactly the regime length/quality outlier
    * pruning runs in.
    *
    * Both medians come from [[histQuantiles]] — the REPLAYABLE sketch
    * — so per-group state stays bucket-bounded at any corpus size and
    * every estimate is bit-exact cross-engine. `|z|` is the exact
    * truncating `(674489·dev) div MAD` in micro-units (all operands
    * nonnegative, so Spark `div` == DuckDB `//`). MAD = 0 (over half
    * the group identical) is the documented degenerate: `absz_micro`
    * is null and any nonzero deviation flags.
    *
    * 100 TB shape: two sketch passes (each ONE map-side-combined
    * bucket aggregate) + two group-cardinality broadcast joins back +
    * a pure scan — the input is scope-cached so the corpus is read
    * once. Returns
    * `(groups…, doc_id, x_micro, med_micro, mad_micro, absz_micro,
    * outlier)`.
    */
  def robustZOutliers(df: DataFrame, value: Column, id: Column,
      groups: Seq[(String, Column)], zThresholdMicro: Long = 3500000L,
      mantissaBits: Int = 4): DataFrame = {
    require(groups.nonEmpty, "robustZOutliers: groups must be non-empty")
    require(zThresholdMicro >= 0,
      s"robustZOutliers: threshold must be >= 0, got $zThresholdMicro")
    val gnames = groups.map(_._1)
    val gcols = gnames.map(col)
    // micro-quantization bound (the covarianceFixed convention): the
    // split-identity z below is overflow-proof only while
    // 674489·(dev mod MAD) fits a long, i.e. x_micro < 2^43 (~8.8e6
    // units — generous for length/score signals). Data-dependent, so
    // a runtime guard, not a require.
    val xq = floor(value.cast("double") * 1000000d).cast("long")
    val xg = when(abs(xq) < lit(1L << 43), xq)
      .otherwise(raise_error(concat(
        lit("robustZOutliers: |value| must be < 2^43 micro (~8.8e6 " +
          "units), got "), value.cast("string"))))
    val base = df.select(groups.map { case (n, c) => c.as(n) } :+
      id.as("doc_id") :+ value.cast("double").as("_v") :+
      xg.as("_x"): _*)
    // cache scope covers ONLY the two-sketch stats derivation — its
    // output is the group-cardinality (med, mad) table, which is what
    // CacheScope's eager checkpoint is for; the per-doc rebuild stays
    // on LINEAGE (one more source scan) because a data-sized
    // checkpoint is the contract's named anti-case (the spanTrim rule)
    val stats = graft.core.CacheScope.withPersisted(base) { b =>
      val med = histQuantiles(b, col("_v"),
        gnames.map(n => n -> col(n)), Seq(500), mantissaBits)
        .select(gcols :+ col("est_micro").as("med_micro"): _*)
      val dev = b.join(broadcast(med), gnames)
        .withColumn("_dev", abs(col("_x") - col("med_micro")))
      val mad = histQuantiles(dev, col("_dev") / lit(1000000d),
        gnames.map(n => n -> col(n)), Seq(500), mantissaBits)
        .select(gcols :+ col("est_micro").as("mad_micro"): _*)
      med.join(mad, gnames)
    }
    // exact split identity: (k·dev) div m == k·(dev div m) +
    // (k·(dev mod m)) div m — same value, but the multiply only ever
    // sees (dev mod m) < m, so it cannot overflow under the 2^43
    // input bound (the naive k·dev form overflowed at |x| ~ 1e9)
    base.join(broadcast(stats), gnames)
      .withColumn("_dev", abs(col("_x") - col("med_micro")))
      .withColumn("absz_micro",
        when(col("mad_micro") > 0,
          expr("674489 * (_dev div mad_micro) + " +
            "(674489 * (_dev % mad_micro)) div mad_micro")))
      .withColumn("outlier",
        (col("mad_micro") > 0 &&
          col("absz_micro") > zThresholdMicro) ||
        (col("mad_micro") === 0 && col("_dev") > 0))
      .select(gcols ++ Seq(col("doc_id"), col("_x").as("x_micro"),
        col("med_micro"), col("mad_micro"), col("absz_micro"),
        col("outlier")): _*)
  }
}
