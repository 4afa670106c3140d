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
    df.select(explode(TextOps.tokens(text)).as("tok"))
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
    var probe = df.select(explode(TextOps.tokens(text)).as("tok"))
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
}
