package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native subsequence scan for [[graft.operators.series.Series.bestMatch]].
  *
  * The HOF formulation (an `aggregate` over window starts, each start
  * running three nested `aggregate` folds) is interpreted per element —
  * measured 36 s at sf0.1 (~1500 keys × ~385 windows × ~48 fold steps).
  * This expression runs the IDENTICAL arithmetic as one compiled loop
  * per row: fresh left-to-right window sums (NOT sliding updates — a
  * sliding s1/s2 would differ in the last ulp from the fresh folds the
  * DuckDB oracle replays), the same `(z − q)²` accumulation order, the
  * same strict-&lt; earliest-wins selection. One virtual call per KEY
  * row; the inner loops are plain JIT'd double arithmetic.
  * CodegenFallback is deliberate: rows here are key-cardinality (one
  * per series), so per-row dispatch is noise — unlike FloatDot, which
  * sits inside join loops and needs full codegen.
  *
  * Returns `[best_off, best_d2]` as a 2-element double array (null when
  * the series is shorter than the query).
  */
case class ZNormBestMatch(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType)
  override def prettyName: String = "znorm_best_match"
  override def nullable: Boolean = true

  override def nullSafeEval(s: Any, q: Any): Any = {
    val x = s.asInstanceOf[ArrayData].toDoubleArray()
    val qn = q.asInstanceOf[ArrayData].toDoubleArray()
    val m = qn.length
    val n = x.length
    if (n < m) return null
    var bestOff = 0
    var bestD2 = Double.MaxValue
    var i = 0 // 0-based window start; emitted offset is 1-based
    while (i <= n - m) {
      var s1 = 0.0
      var j = 0
      while (j < m) { s1 += x(i + j); j += 1 }
      var s2 = 0.0
      j = 0
      while (j < m) { s2 += x(i + j) * x(i + j); j += 1 }
      val mean = s1 / m
      val m2 = s2 / m
      val std = math.sqrt(m2 - mean * mean)
      var d2 = 0.0
      j = 0
      while (j < m) {
        val z = if (std == 0) 0.0 else (x(i + j) - mean) / std
        val d = z - qn(j)
        d2 += d * d
        j += 1
      }
      if (d2 < bestD2) { bestD2 = d2; bestOff = i + 1 }
      i += 1
    }
    new GenericArrayData(Array(bestOff.toDouble, bestD2))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZNormBestMatch =
    copy(left = newLeft, right = newRight)
}

object SeriesExpressions {
  def znormBestMatch(series: Column, qNorm: Column): Column =
    ColumnBridge.column(ZNormBestMatch(
      ColumnBridge.expression(series), ColumnBridge.expression(qNorm)))

  def znormDistSq(a: Column, b: Column): Column =
    ColumnBridge.column(ZNormDistSq(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Native hashed-token weight SUM — the inner loop of
  * `TextOps.withQualityLr`. The HOF fold interprets
  * `md5 → conv → %` per token; this runs the identical arithmetic
  * (md5 of the token's UTF-8 bytes, first 15 hex chars as a 60-bit
  * long — i.e. the first 8 digest bytes big-endian `>>> 4` —
  * `% 2001 − 1000`) in one compiled loop per row and returns the
  * EXACT LONG sum of the integer numerators. Returning the integer —
  * not a mean double — is the determinism load-bearer: the weights
  * are exact 1/1000 lattice points, and every downstream rounding
  * (the 6-decimal logit, the fixed-point sigmoid) happens in integer
  * arithmetic that replays identically in any engine. A double fold
  * was an ULP off a sequential engine on some sf1 rows, flipping
  * 1e-6-boundary means. CodegenFallback for the ZNormBestMatch
  * reason: per-row dispatch is noise next to the per-token digest
  * work.
  */
case class HashedWeightSum(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes with CodegenFallback {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hashed_weight_sum"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    var acc = 0L
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      h = h >>> 4 // first 15 hex chars = 60 bits
      acc += h % 2001L - 1000L
      i += 1
    }
    acc
  }

  override protected def withNewChildInternal(
      newChild: Expression): HashedWeightSum = copy(child = newChild)
}

/** Native scaled token-entropy sum — the inner loop of
  * `TextOps.withTokenEntropy`. Mirrors the HOF spec exactly: sort the
  * tokens by Spark's string ordering (UTF8String binary compare), fold
  * run lengths, and per completed run add
  * `round(−(c/n)·ln(c/n)·1e9)` as a long — the rounding goes through
  * BigDecimal HALF_UP, the same path as Spark's `round(double)`, so a
  * `Math.round` tie could never diverge. Returns the scaled long sum.
  */
case class TokenEntropyScaled(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes with CodegenFallback {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "token_entropy_scaled"

  private def term(c: Long, n: Int): Long = {
    val p = c.toDouble / n
    java.math.BigDecimal.valueOf(-p * math.log(p) * 1e9)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return 0L
    val toks = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    java.util.Arrays.sort(toks,
      (x: org.apache.spark.unsafe.types.UTF8String,
       y: org.apache.spark.unsafe.types.UTF8String) => x.compareTo(y))
    var acc = 0L
    var run = 1L
    i = 1
    while (i < n) {
      if (toks(i).equals(toks(i - 1))) run += 1
      else { acc += term(run, n); run = 1L }
      i += 1
    }
    acc + term(run, n)
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenEntropyScaled = copy(child = newChild)
}

/** Native sorted-run duplicate statistics — the inner loop of
  * `TextOps.runStats` (Gopher repetition metrics). Mirrors the HOF
  * spec: sort by UTF8String binary order, fold runs; `dup` = total
  * occurrences of grams appearing more than once, `top` = the longest
  * run. Integer logic end-to-end — no rounding subtleties.
  */
case class SortedRunStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes with CodegenFallback {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("dup", LongType, nullable = false),
    StructField("top", LongType, nullable = false)))
  override def prettyName: String = "sorted_run_stats"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0)
      return new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](0L, 0L))
    val toks = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    java.util.Arrays.sort(toks,
      (x: org.apache.spark.unsafe.types.UTF8String,
       y: org.apache.spark.unsafe.types.UTF8String) => x.compareTo(y))
    var dup = 0L
    var top = 0L
    var run = 1L
    i = 1
    while (i < n) {
      if (toks(i).equals(toks(i - 1))) run += 1
      else { if (run > 1) dup += run; if (run > top) top = run; run = 1L }
      i += 1
    }
    if (run > 1) dup += run
    if (run > top) top = run
    new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(Array[Any](dup, top))
  }

  override protected def withNewChildInternal(
      newChild: Expression): SortedRunStats = copy(child = newChild)
}

/** Native n-gram builder — the inner loop of
  * `TextOps.shinglesFromTokens`. The HOF form allocates an index
  * sequence and runs interpreted `concat_ws(slice(...))` per gram;
  * this builds the identical space-joined gram strings in one loop.
  * Sub-`n` arrays yield an empty array (the HOF's `when` guard).
  */
case class TokenGrams(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes with CodegenFallback {
  require(n >= 1, "gram size must be >= 1")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "token_grams"

  private val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[org.apache.spark.unsafe.types.UTF8String](len)
    var i = 0
    while (i < len) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Any](len - n + 1)
    val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) { parts(j) = toks(i + j); j += 1 }
      out(i) = org.apache.spark.unsafe.types.UTF8String
        .concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenGrams = copy(child = newChild)
}

/** Native pairwise z-normalized Euclidean distance² — the verify step
  * of `Series.saxDupPairs`. Identical arithmetic to the HOF form
  * (fresh left-to-right sums per side, `sqrt(Σv²/m − mean²)` std, the
  * flat-series zero rule, `(za − zb)²` accumulation order); runs once
  * per CANDIDATE PAIR, which is why it must be compiled — skewed SAX
  * buckets put the interpreted fold inside a join (measured 45.7 s at
  * sf0.1; native: sub-second).
  */
case class ZNormDistSq(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "znorm_dist_sq"

  private def meanStd(x: Array[Double]): (Double, Double) = {
    val m = x.length
    var s1 = 0.0
    var i = 0
    while (i < m) { s1 += x(i); i += 1 }
    var s2 = 0.0
    i = 0
    while (i < m) { s2 += x(i) * x(i); i += 1 }
    val mean = s1 / m
    (mean, math.sqrt(s2 / m - mean * mean))
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(x.length, y.length)
    if (n == 0) return 0.0
    // stats over the FULL arrays (zip_with truncates the ELEMENT walk
    // to the shorter side, but each side's mean/std use its own length
    // — the HOF computes them from the whole column value)
    val (ma, sa) = meanStd(x)
    val (mb, sb) = meanStd(y)
    var d2 = 0.0
    var i = 0
    while (i < n) {
      val za = if (sa == 0) 0.0 else (x(i) - ma) / sa
      val zb = if (sb == 0) 0.0 else (y(i) - mb) / sb
      val d = za - zb
      d2 += d * d
      i += 1
    }
    d2
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZNormDistSq =
    copy(left = newLeft, right = newRight)
}

/** Native multi-set membership counter — the inner loop of the
  * stopword-based scores (langId, wordRatio, qualityScore). The HOF
  * form runs `filter(toks, tok.isin(words))` per set — interpreted
  * per token per set; this makes ONE pass over the tokens, testing
  * each against precompiled UTF8String hash sets, returning one hit
  * count per set (same value as `size(filter(...))`).
  */
case class MultiSetHits(child: Expression, sets: Seq[Seq[String]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes with CodegenFallback {
  require(sets.nonEmpty, "at least one word set")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(IntegerType)
  override def prettyName: String = "multi_set_hits"

  @transient private lazy val compiled
      : Array[java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]] =
    sets.map { ws =>
      val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]
      ws.foreach(w =>
        s.add(org.apache.spark.unsafe.types.UTF8String.fromString(w)))
      s
    }.toArray

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](compiled.length)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      var s = 0
      while (s < compiled.length) {
        if (compiled(s).contains(t)) counts(s) += 1
        s += 1
      }
      i += 1
    }
    new GenericArrayData(counts.map(c => c: Any))
  }

  override protected def withNewChildInternal(
      newChild: Expression): MultiSetHits = copy(child = newChild)
}

/** Shared per-row text-hashing kernel for the native dedup
  * expressions: exactly the HOF chain's arithmetic — whitespace
  * tokenize (split(trim, \s+), empties preserved like Spark's split),
  * md5 60-bit token hash (first 15 hex chars) mod p, rolling 3-gram
  * `(((h₁·31 + h₂) mod p)·31 + h₃) mod p`.
  */
private[functions] object HashKernel {
  def tokenHashes(text: String, p: Long): Array[Long] = {
    val toks = text.trim.split("\\s+", -1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      val h = md.digest(toks(i).getBytes("UTF-8"))
      // conv(substring(md5, 1, 15), 16, 10): bytes 0..6 + high nibble
      // of byte 7 — 60 bits, non-negative
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (h(b) & 0xffL); b += 1 }
      v = (v << 4) | ((h(7) & 0xf0L) >>> 4)
      th(i) = v % p
      i += 1
    }
    th
  }

  def rolling3(th: Array[Long], p: Long): Array[Long] = {
    if (th.length < 3) return Array.emptyLongArray
    val m = th.length - 2
    val gh = new Array[Long](m)
    var i = 0
    while (i < m) {
      // th < p = 2³¹−1, so ·31 stays far from overflow — plain %
      gh(i) = ((th(i) * 31 + th(i + 1)) % p * 31 + th(i + 2)) % p
      i += 1
    }
    gh
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Lowercase hex md5 of a UTF-8 string — Spark's `md5` rendering. */
  def md5Hex(s: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((h(i) & 0xf0) >> 4)
      out(2 * i + 1) = HexDigits(h(i) & 0x0f)
      i += 1
    }
    new String(out)
  }
}

/** Native rolling 3-gram shingle hashes over the raw text — the
  * one-pass replacement for the tokenHashes→shingleHashes HOF chain
  * (per-token md5 through interpreted lambdas) that every near-dup
  * operator's base materializes. Bit-identical output (HashKernel ==
  * the Column arithmetic); < 3 tokens → empty array, matching the
  * `when(size >= 3, …).otherwise(empty)` form.
  */
case class ShingleHashes3(child: Expression, p: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes with CodegenFallback {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val gh = HashKernel.rolling3(
      HashKernel.tokenHashes(input.toString, p), p)
    new GenericArrayData(gh.map(g => g: Any))
  }

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashes3 = copy(child = newChild)
}

/** Native LSH band rows from a materialized shingle-hash array: the
  * k = bands·rowsPerBand minhash signatures (min over the array of
  * `(aᵢ·h + bᵢ) mod p`) and the per-band md5 of the comma-joined
  * signature decimals — one pass replacing k interpreted
  * `array_min(transform(…))` lambdas plus the band-hash projection.
  * Empty hash array → every signature null in the Column form, whose
  * `concat_ws` skips nulls → md5("") per band; replicated here, so
  * sub-3-token docs keep bucketing together exactly as before.
  */
case class MinhashBandRows(child: Expression, p: Long,
    as: Seq[Long], bs: Seq[Long], bands: Int, rowsPerBand: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes with CodegenFallback {
  require(as.length >= bands * rowsPerBand &&
    bs.length >= bands * rowsPerBand,
    "MinhashBandRows: not enough hash coefficients")
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("bh", StringType, nullable = false))),
    containsNull = false)

  private val aArr = as.toArray
  private val bArr = bs.toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = bands * rowsPerBand
    val out = new Array[Any](bands)
    if (n == 0) {
      var b = 0
      while (b < bands) {
        out(b) = org.apache.spark.sql.catalyst.InternalRow(b,
          org.apache.spark.unsafe.types.UTF8String
            .fromString(HashKernel.md5Hex("")))
        b += 1
      }
      return new GenericArrayData(out)
    }
    val hs = arr.toLongArray()
    val sigs = new Array[Long](k)
    var j = 0
    while (j < k) {
      val a = aArr(j); val bb = bArr(j)
      var best = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (a * hs(i) + bb) % p
        if (v < best) best = v
        i += 1
      }
      sigs(j) = best
      j += 1
    }
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder(24)
      var r = 0
      while (r < rowsPerBand) {
        if (r > 0) sb.append(',')
        sb.append(sigs(b * rowsPerBand + r))
        r += 1
      }
      out(b) = org.apache.spark.sql.catalyst.InternalRow(b,
        org.apache.spark.unsafe.types.UTF8String
          .fromString(HashKernel.md5Hex(sb.toString)))
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinhashBandRows = copy(child = newChild)
}

/** Native 32-bit SimHash over the raw text — one pass replacing the
  * 32 interpreted `aggregate` bit-folds (each a full array pass) plus
  * the per-token md5 lambda. Identical semantics: DISTINCT tokens
  * (first-occurrence dedup — contribution sums are order-free so only
  * the set matters), hash60 mod 2³², per-bit ±1 majority, bit set iff
  * the contribution is strictly positive.
  */
case class SimHash32(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes with CodegenFallback {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val toks = input.toString.trim.split("\\s+", -1)
    val seen = new java.util.HashSet[String]()
    val md = java.security.MessageDigest.getInstance("MD5")
    val cnt = new Array[Int](32)
    var i = 0
    while (i < toks.length) {
      if (seen.add(toks(i))) {
        val h = md.digest(toks(i).getBytes("UTF-8"))
        var v = 0L
        var b = 0
        while (b < 7) { v = (v << 8) | (h(b) & 0xffL); b += 1 }
        v = (v << 4) | ((h(7) & 0xf0L) >>> 4)
        val h32 = v & 0xffffffffL
        b = 0
        while (b < 32) {
          if (((h32 >>> b) & 1L) == 1L) cnt(b) += 1 else cnt(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 32) { if (cnt(b) > 0) fp |= 1L << b; b += 1 }
    fp
  }

  override protected def withNewChildInternal(
      newChild: Expression): SimHash32 = copy(child = newChild)
}

/** Native 64-bit SimHash — [[SimHash32]] WIDENED, not replaced: per
  * distinct token the vote bits are lo32 = hash60 mod 2³² (bits 0–31 —
  * IDENTICAL to SimHash32's, so `sh64 & 0xffffffff == sh32` by
  * construction) and hi32 = md5 hex chars 16–23 (bits 32–63 — nibbles
  * DISJOINT from hash60's chars 1–15). The point of the width is the
  * BAND KEY SPACE: 32-bit fingerprints block into 4×8-bit keys (256
  * buckets — every bucket holds ~n/256 docs, so candidate pairs grow
  * ~n²/256 and the blocking saturates LONG before the corpus is
  * interesting); 64 bits give 4×16-bit keys, the [[PHash64]] geometry,
  * with the same ≤3-bit pigeonhole. Same distinct-token / ±1-majority /
  * strictly-positive semantics per bit.
  */
case class SimHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes with CodegenFallback {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.toString.trim.split("\\s+", -1)
    val seen = new java.util.HashSet[String]()
    val md = java.security.MessageDigest.getInstance("MD5")
    val cnt = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      if (seen.add(toks(i))) {
        val h = md.digest(toks(i).getBytes("UTF-8"))
        // hash60 (hex chars 1-15): bytes 0..6 + high nibble of byte 7 —
        // tokenHashes' arithmetic verbatim; lo32 = its low 32 bits
        var v = 0L
        var b = 0
        while (b < 7) { v = (v << 8) | (h(b) & 0xffL); b += 1 }
        v = (v << 4) | ((h(7) & 0xf0L) >>> 4)
        val lo = v & 0xffffffffL
        // hi32 (hex chars 16-23): low nibble of byte 7, bytes 8..10,
        // high nibble of byte 11
        val hi = ((h(7) & 0x0fL) << 28) | ((h(8) & 0xffL) << 20) |
          ((h(9) & 0xffL) << 12) | ((h(10) & 0xffL) << 4) |
          ((h(11) & 0xf0L) >>> 4)
        b = 0
        while (b < 32) {
          if (((lo >>> b) & 1L) == 1L) cnt(b) += 1 else cnt(b) -= 1
          if (((hi >>> b) & 1L) == 1L) cnt(b + 32) += 1 else cnt(b + 32) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (cnt(b) > 0) fp |= 1L << b; b += 1 }
    fp
  }

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64 = copy(child = newChild)
}

/** Native winnowing selection (Schleimer et al. 2003) — the whole
  * per-row winnow kernel in one pass: whitespace tokenize → md5-60-bit
  * token hashes mod p → rolling 3-gram hashes → per-window
  * rightmost-min, position-deduped in first-occurrence order. Output
  * rows (pos 1-based, fp) exactly match the let-bound HOF formulation
  * ([[graft.operators.text.Dedup.winnow]]'s former body): same md5
  * prefix (first 15 hex chars = 60 bits), same ·31 + mod-p rolling
  * chain, same `<=` rightmost tie rule, same dedup order — so the
  * DuckDB oracle replay is unchanged. The HOF chain paid per-element
  * interpreted lambda dispatch over O(grams·w) work (8.7 s at sf1);
  * this is a plain JIT'd loop. CodegenFallback for the ZNormBestMatch
  * reason: the loop body dwarfs the per-row dispatch, and the output
  * is array-of-struct.
  */
case class WinnowSelect(child: Expression, w: Int, p: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes with CodegenFallback {
  require(w >= 1, s"WinnowSelect: w must be >= 1, got $w")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val gh = HashKernel.rolling3(
      HashKernel.tokenHashes(input.toString, p), p)
    val m = gh.length
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val nw = math.max(1, m - (w - 1))
    var i = 0
    val seen = new java.util.LinkedHashSet[Integer]()
    i = 0
    while (i < nw) {
      val end = math.min(i + w, m)
      var best = i
      var j = i + 1
      // <= keeps the LAST index of equal minima — the rightmost-min
      // tie rule (array_position over the REVERSED window)
      while (j < end) { if (gh(j) <= gh(best)) best = j; j += 1 }
      seen.add(best)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      val pos0 = it.next().intValue()
      out(k) = org.apache.spark.sql.catalyst.InternalRow(pos0 + 1, gh(pos0))
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WinnowSelect = copy(child = newChild)
}

/** Native content-defined chunking (the LBFS/rsync cut rule over token
  * streams) — the whole per-row CDC kernel in one pass: whitespace
  * tokenize → rolling 3-gram shingle hashes (HashKernel == the HOF
  * chain's arithmetic) → cut after token i+2 whenever the 1-based
  * shingle hash i is ≡ 0 (mod mask) and the cut is interior → one
  * (chunk_idx, n_tok, md5-of-space-joined-tokens) struct per chunk.
  * Bit-identical to the former filter/transform/slice/posexplode HOF
  * formulation in [[graft.operators.text.Dedup.cdcChunks]], which paid
  * interpreted per-element dispatch with the shingle-hash subtree
  * re-evaluated inside the lambdas — measured 146 s for the sf0.1
  * corpus vs ~1 s here. CodegenFallback for the WinnowSelect reason:
  * the loop body dwarfs the per-row dispatch, and the output is
  * array-of-struct.
  */
case class CdcChunkRows(child: Expression, mask: Int, p: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes with CodegenFallback {
  require(mask >= 2 && (mask & (mask - 1)) == 0,
    s"CdcChunkRows: mask must be a power of two >= 2, got $mask")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("n_tok", IntegerType, nullable = false),
    StructField("digest", StringType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    val toks = s.trim.split("\\s+", -1)
    val n = toks.length
    val gh = HashKernel.rolling3(HashKernel.tokenHashes(s, p), p)
    // extended cut list [0, cuts.., n]: cut after token i+2 (1-based
    // shingle i with hash ≡ 0 mod mask), interior cuts only
    val cuts = new scala.collection.mutable.ArrayBuffer[Int]()
    cuts += 0
    var i = 0
    while (i < gh.length) {
      // gh values are mod-p nonnegative, so % == pmod
      if (gh(i) % mask == 0 && (i + 1) + 2 < n) cuts += (i + 1) + 2
      i += 1
    }
    cuts += n
    val out = new Array[Any](cuts.length - 1)
    var k = 1
    while (k < cuts.length) {
      val from = cuts(k - 1)
      val until = cuts(k)
      val sb = new java.lang.StringBuilder()
      var t = from
      while (t < until) {
        if (t > from) sb.append(' ')
        sb.append(toks(t))
        t += 1
      }
      out(k - 1) = org.apache.spark.sql.catalyst.InternalRow(
        k - 1, until - from,
        org.apache.spark.unsafe.types.UTF8String
          .fromString(HashKernel.md5Hex(sb.toString)))
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): CdcChunkRows = copy(child = newChild)
}

/** Native 64-bit DCT perceptual hash — the whole per-row pHash kernel
  * (Zauner 2010) in one pass over the 128-hex-char luma string: 64 luma
  * bytes → separable 2-D integer DCT against the hardcoded fixed-point
  * cosine basis ([[graft.operators.multimodal.Multimodal.DctT]]) → bit
  * u·8+v set when coefficient (u, v) exceeds the 32nd-smallest of the
  * 63 AC coefficients. Bit-identical to the relational formulation
  * ([[graft.operators.multimodal.Multimodal.pHashViaJoins]], kept as
  * the spec twin and replayed by the DuckDB oracle): all products are
  * exact longs (|l·t·t| ≤ 2.7e8, 64-term sums ≤ 1.7e10), so ANY
  * summation order — including this separable row-then-column pass —
  * gives the same integers, and the median is the same rank-32 element.
  * The relational plan fanned every payload into 64 cell rows and paid
  * three corpus-wide shuffles (cell aggregate, median aggregate, join
  * back — 19.1 s for the family at sf0.1); this is a plain JIT'd loop
  * with zero shuffles, the [[CdcChunkRows]] remedy. CodegenFallback for
  * the same reason: the 64×8×8 loop body dwarfs per-row dispatch.
  */
case class PHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes with CodegenFallback {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "phash64"

  override def nullSafeEval(input: Any): Any = {
    val hex = input.toString
    val t = graft.operators.multimodal.Multimodal.DctT
    val l = new Array[Long](64)
    var p = 0
    while (p < 64) {
      l(p) = java.lang.Integer.parseInt(
        hex.substring(2 * p, 2 * p + 2), 16).toLong
      p += 1
    }
    // separable DCT: tmp(u)(y) = Σ_x l(x·8+y)·T(u)(x), then
    // coef(u·8+v) = Σ_y tmp(u)(y)·T(v)(y)
    val tmp = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var s = 0L
        var x = 0
        while (x < 8) { s += l(x * 8 + y) * t(u)(x); x += 1 }
        tmp(u * 8 + y) = s
        y += 1
      }
      u += 1
    }
    val coef = new Array[Long](64)
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0L
        var y = 0
        while (y < 8) { s += tmp(u * 8 + y) * t(v)(y); y += 1 }
        coef(u * 8 + v) = s
        v += 1
      }
      u += 1
    }
    // median = 32nd smallest of the 63 AC coefficients (rank-32, the
    // element_at(array_sort(...), 32) of the relational form)
    val ac = new Array[Long](63)
    System.arraycopy(coef, 1, ac, 0, 63)
    java.util.Arrays.sort(ac)
    val med = ac(31)
    var hash = 0L
    p = 0
    while (p < 64) {
      if (coef(p) > med) hash |= (1L << p)
      p += 1
    }
    hash
  }

  override protected def withNewChildInternal(
      newChild: Expression): PHash64 = copy(child = newChild)
}

/** Native Haitsma–Kalker audio sub-fingerprint stream (the Philips
  * robust hash, Haitsma & Kalker 2002) — the whole per-row kernel in
  * one pass: whitespace tokenize → 16-bit "sample" per token (the
  * deterministic decode stub: md5-60-bit token hash mod 2¹⁶ — a
  * deployment swaps a real PCM decoder emitting the same sample
  * contract) → 50%-overlapped frames of 34 samples (hop 17) → 17
  * band energies per frame (sum of squares over 2 samples each) →
  * per frame n ≥ 1, bit m set when
  * `(E(n,m)−E(n,m+1)) − (E(n−1,m)−E(n−1,m+1)) > 0` — the HK
  * energy-delta sign rule, scaled from 33 bands/32 bits to 17/16.
  * Output: one (frame_idx ≥ 1, 16-bit fp) struct per overlapping
  * frame, in frame order; docs shorter than 51 tokens (< 2 frames)
  * emit nothing.
  *
  * Everything is exact integer arithmetic (s < 2¹⁶, E < 2³³,
  * |diff| < 2³⁵ — long-safe), so the stream is partition-order-exact
  * and the DuckDB oracle replays every band energy and bit.
  * CodegenFallback for the [[CdcChunkRows]] reason: the frames×bands
  * loop dwarfs per-row dispatch, and the output is array-of-struct.
  */
case class HkAudioFp(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes with CodegenFallback {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("fp", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "hk_audio_fp"

  import HkAudioFp.{Frame, Hop, Bands}

  override def nullSafeEval(input: Any): Any = {
    val s = HashKernel.tokenHashes(input.toString, 65536L)
    val n = s.length
    val nf = if (n >= Frame) (n - Frame) / Hop + 1 else 0
    if (nf < 2) return new GenericArrayData(Array.empty[Any])
    // band energies for every frame: e(f)(m) = Σ s² over band m's
    // 2 samples (frame f covers samples [f·17, f·17+33])
    val e = Array.ofDim[Long](nf, Bands)
    var f = 0
    while (f < nf) {
      var m = 0
      while (m < Bands) {
        val i = f * Hop + 2 * m
        e(f)(m) = s(i) * s(i) + s(i + 1) * s(i + 1)
        m += 1
      }
      f += 1
    }
    val out = new Array[Any](nf - 1)
    f = 1
    while (f < nf) {
      var fp = 0
      var m = 0
      while (m < Bands - 1) {
        val d = (e(f)(m) - e(f)(m + 1)) - (e(f - 1)(m) - e(f - 1)(m + 1))
        if (d > 0) fp |= (1 << m)
        m += 1
      }
      out(f - 1) = org.apache.spark.sql.catalyst.InternalRow(f, fp)
      f += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): HkAudioFp = copy(child = newChild)
}

object HkAudioFp {
  /** Samples per frame (2 per band over 17 bands). */
  val Frame = 34
  /** Frame hop — 50% overlap, the HK convention. */
  val Hop = 17
  /** Band count; bits per sub-fingerprint = Bands − 1 = 16. */
  val Bands = 17
}

object TextExpressions {
  def winnowSelect(text: Column, w: Int, p: Long): Column =
    ColumnBridge.column(WinnowSelect(ColumnBridge.expression(text), w, p))

  def cdcChunkRows(text: Column, mask: Int, p: Long): Column =
    ColumnBridge.column(
      CdcChunkRows(ColumnBridge.expression(text), mask, p))

  def pHash64(lumaHex: Column): Column =
    ColumnBridge.column(PHash64(ColumnBridge.expression(lumaHex)))

  def hkAudioFp(text: Column): Column =
    ColumnBridge.column(HkAudioFp(ColumnBridge.expression(text)))

  def simHash32(text: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(text)))

  def simHash64(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))

  def shingleHashes3(text: Column, p: Long): Column =
    ColumnBridge.column(ShingleHashes3(ColumnBridge.expression(text), p))

  def minhashBandRows(hs: Column, p: Long, as: Seq[Long], bs: Seq[Long],
      bands: Int, rowsPerBand: Int): Column =
    ColumnBridge.column(MinhashBandRows(ColumnBridge.expression(hs), p,
      as, bs, bands, rowsPerBand))

  def multiSetHits(tokens: Column, sets: Seq[Seq[String]]): Column =
    ColumnBridge.column(MultiSetHits(ColumnBridge.expression(tokens), sets))

  def tokenGrams(tokens: Column, n: Int): Column =
    ColumnBridge.column(TokenGrams(ColumnBridge.expression(tokens), n))

  def hashedWeightSum(tokens: Column): Column =
    ColumnBridge.column(HashedWeightSum(ColumnBridge.expression(tokens)))

  def tokenEntropyScaled(tokens: Column): Column =
    ColumnBridge.column(TokenEntropyScaled(ColumnBridge.expression(tokens)))

  def sortedRunStats(grams: Column): Column =
    ColumnBridge.column(SortedRunStats(ColumnBridge.expression(grams)))
}
